package graft.connect

import graft.config.Conf

/** Kafka source/sink option builder including the full SASL/SSL security
  * matrix (SURVEY.md §2 A16) — a faithful re-expression of the reference's
  * option construction (…/connectors/kafka_connector.py:46-148):
  *
  *  - `kafka.bootstrap.servers` required (:46-49)
  *  - `security.protocol` default PLAINTEXT, upper-cased (:61-63)
  *  - SASL_PLAINTEXT / SASL_SSL: `sasl_mechanism` default PLAIN (:67-68);
  *    PLAIN/SCRAM-SHA-256/SCRAM-SHA-512 require username +
  *    password_env_var, password resolved through the ENVIRONMENT, never
  *    the config file (:75-84); JAAS login module Plain vs Scram (:86-97)
  *  - SSL options use the `ssl.` prefix for BOTH SSL and SASL_SSL. This
  *    is a DELIBERATE deviation from the reference, which emits
  *    `sasl.ssl.*` keys for SASL_SSL (:99-105) — a namespace the Kafka
  *    client does not recognize, so its truststore/keystore settings are
  *    silently ignored in exactly the configuration that asks for them.
  *    The capability being re-expressed is "secure connection", not the
  *    reference's dropped-option bug.
  *  - truststore/keystore locations copied; their passwords only if the
  *    named env var is actually set (warn-and-skip otherwise, :108-135)
  *  - endpoint identification algorithm defaults to "https"; an explicit
  *    empty string disables it (:137-148)
  *
  * Pure option-string code: unit-testable without a broker, and exactly
  * what `spark.readStream.format("kafka").options(...)` consumes when the
  * connector jar is present.
  */
object KafkaOptions {

  /** Connection + security options common to reader and writer. */
  def common(cfg: Conf, env: String => Option[String] = sys.env.get): Map[String, String] = {
    val bootstrap = cfg.reqStr("bootstrap_servers",
      "Kafka bootstrap_servers is not defined in the configuration.")
    val base = Map("kafka.bootstrap.servers" -> bootstrap)
    val sec = cfg.sub("security").getOrElse(Conf.empty)
    val protocol = sec.str("protocol").getOrElse("PLAINTEXT").toUpperCase
    val withProtocol = base + ("kafka.security.protocol" -> protocol)

    protocol match {
      case "SASL_PLAINTEXT" | "SASL_SSL" =>
        val mechanism = sec.str("sasl_mechanism").getOrElse("PLAIN").toUpperCase
        var opts = withProtocol + ("kafka.sasl.mechanism" -> mechanism)
        if (Set("SCRAM-SHA-256", "SCRAM-SHA-512", "PLAIN").contains(mechanism)) {
          val username = sec.str("username")
          val passEnvVar = sec.str("password_env_var")
          if (username.isEmpty || passEnvVar.isEmpty)
            throw new IllegalArgumentException(
              s"Username and password_env_var must be set for $mechanism.")
          val password = env(passEnvVar.get).getOrElse(
            throw new IllegalArgumentException(
              s"Environment variable ${passEnvVar.get} for Kafka password is not set."))
          val module =
            if (mechanism == "PLAIN")
              "org.apache.kafka.common.security.plain.PlainLoginModule"
            else
              "org.apache.kafka.common.security.scram.ScramLoginModule"
          opts += ("kafka.sasl.jaas.config" ->
            s"""$module required username="${username.get}" password="$password";""")
        }
        if (protocol == "SASL_SSL") opts ++= ssl(sec, env)
        opts
      case "SSL" =>
        withProtocol ++ ssl(sec, env)
      case _ =>
        withProtocol
    }
  }

  private def ssl(sec: Conf,
                  env: String => Option[String]): Map[String, String] = {
    val prefix = "ssl."
    var opts = Map.empty[String, String]
    for (loc <- sec.str("truststore_location")) {
      opts += (s"kafka.${prefix}truststore.location" -> loc)
      for (envVar <- sec.str("truststore_password_env_var"); p <- env(envVar))
        opts += (s"kafka.${prefix}truststore.password" -> p)
    }
    for (loc <- sec.str("keystore_location")) {
      opts += (s"kafka.${prefix}keystore.location" -> loc)
      for (envVar <- sec.str("keystore_password_env_var"); p <- env(envVar))
        opts += (s"kafka.${prefix}keystore.password" -> p)
    }
    // Default "https"; an explicit empty string in config disables
    // endpoint identification (kafka_connector.py:137-148) — so this is
    // the one key where empty-string presence matters, read raw.
    val algo = sec.opt("ssl_endpoint_identification_algorithm")
      .map(_.toString).getOrElse("https")
    opts + (s"kafka.${prefix}endpoint.identification.algorithm" -> algo)
  }

  /** Reader options: subscribe + startingOffsets (kafka_connector.py:168-189;
    * input_topic required at :163-166).
    */
  def reader(cfg: Conf, startingOffsets: String = "latest",
             env: String => Option[String] = sys.env.get): Map[String, String] = {
    val topic = cfg.reqStr("input_topic",
      "Kafka input_topic is not defined in the configuration.")
    common(cfg, env) + ("subscribe" -> topic) + ("startingOffsets" -> startingOffsets)
  }

  /** Batch writer options: topic only (kafka_connector.py:204-208).
    * `checkpointLocation` is a streaming concept — requiring it on a
    * batch write made batch Kafka writes fail validation for a setting
    * they never use (ADVICE r2), so the batch path neither requires nor
    * passes it.
    */
  def writerBatch(cfg: Conf,
                  env: String => Option[String] = sys.env.get): Map[String, String] = {
    val topic = cfg.reqStr("output_topic",
      "Kafka output_topic is not defined in the configuration.")
    common(cfg, env) + ("topic" -> topic)
  }

  /** Streaming writer options: topic + MANDATORY checkpoint location
    * (kafka_connector.py:210-214, 216-254 — checkpoint is the restart
    * story, so the streaming path fails fast without one).
    */
  def writer(cfg: Conf,
             env: String => Option[String] = sys.env.get): Map[String, String] = {
    val checkpoint = cfg.reqStr("checkpoint_location_output",
      "Kafka checkpoint_location_output is not defined for the writer.")
    writerBatch(cfg, env) + ("checkpointLocation" -> checkpoint)
  }
}
