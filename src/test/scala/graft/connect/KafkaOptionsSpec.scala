package graft.connect

import graft.config.Conf
import org.scalatest.funsuite.AnyFunSuite

/** The four security scenarios the reference asserts inline
  * (…/connectors/kafka_connector.py:330-452), as real unit tests — no
  * broker, pure option construction.
  */
class KafkaOptionsSpec extends AnyFunSuite {

  private val env: Map[String, String] = Map(
    "KAFKA_PASSWORD_TEST" -> "test_password",
    "KAFKA_OTHER_PASS_TEST" -> "other_test_password")
  private def lookup(k: String): Option[String] = env.get(k)

  private def scramCfg = Conf(Map(
    "bootstrap_servers" -> "dummy:9092",
    "input_topic" -> "input_test_topic",
    "output_topic" -> "output_test_topic",
    "checkpoint_location_output" -> "/tmp/dummy_checkpoint_output",
    "security" -> Map(
      "protocol" -> "SASL_PLAINTEXT",
      "sasl_mechanism" -> "SCRAM-SHA-512",
      "username" -> "test_user",
      "password_env_var" -> "KAFKA_PASSWORD_TEST")))

  test("SCRAM-SHA-512 reader: JAAS carries user + env-resolved password (kafka_connector.py:399-401)") {
    val opts = KafkaOptions.reader(scramCfg, env = lookup)
    assert(opts("kafka.security.protocol") === "SASL_PLAINTEXT")
    assert(opts("kafka.sasl.mechanism") === "SCRAM-SHA-512")
    val jaas = opts("kafka.sasl.jaas.config")
    assert(jaas.contains("ScramLoginModule"))
    assert(jaas.contains("username=\"test_user\""))
    assert(jaas.contains("password=\"test_password\""))
    assert(opts("subscribe") === "input_test_topic")
    assert(opts("startingOffsets") === "latest")
  }

  test("SCRAM writer: topic + mandatory checkpoint") {
    val opts = KafkaOptions.writer(scramCfg, env = lookup)
    assert(opts("topic") === "output_test_topic")
    assert(opts("checkpointLocation") === "/tmp/dummy_checkpoint_output")
    assert(opts.contains("kafka.sasl.jaas.config"))
  }

  test("PLAIN mechanism uses PlainLoginModule (kafka_connector.py:414-417)") {
    val cfg = Conf(Map(
      "bootstrap_servers" -> "dummy:9092",
      "input_topic" -> "input_test_topic_plain",
      "security" -> Map(
        "protocol" -> "SASL_PLAINTEXT",
        "sasl_mechanism" -> "PLAIN",
        "username" -> "plain_user",
        "password_env_var" -> "KAFKA_OTHER_PASS_TEST")))
    val jaas = KafkaOptions.reader(cfg, env = lookup)("kafka.sasl.jaas.config")
    assert(jaas.contains("PlainLoginModule"))
    assert(jaas.contains("username=\"plain_user\""))
    assert(jaas.contains("password=\"other_test_password\""))
  }

  // Deviation from the reference (documented in KafkaOptions): SSL keys
  // live under kafka.ssl.* for SASL_SSL too — the reference's
  // kafka.sasl.ssl.* namespace is not a Kafka client config and would be
  // silently ignored, dropping the trust store in a security path.
  test("SASL_SSL: ssl.* prefix, stores copied, unset password env vars skipped, empty endpoint algo honored (kafka_connector.py:426-438, corrected namespace)") {
    val cfg = Conf(Map(
      "bootstrap_servers" -> "dummy:9093",
      "input_topic" -> "input_ssl_topic",
      "security" -> Map(
        "protocol" -> "SASL_SSL",
        "sasl_mechanism" -> "SCRAM-SHA-512",
        "username" -> "ssl_user",
        "password_env_var" -> "KAFKA_PASSWORD_TEST",
        "truststore_location" -> "/fake/path/client.truststore.jks",
        "truststore_password_env_var" -> "TSP_ENV_VAR_NOT_SET",
        "keystore_location" -> "/fake/path/client.keystore.jks",
        "keystore_password_env_var" -> "KSP_ENV_VAR_NOT_SET",
        "ssl_endpoint_identification_algorithm" -> "")))
    val opts = KafkaOptions.reader(cfg, env = lookup)
    assert(opts("kafka.ssl.truststore.location") === "/fake/path/client.truststore.jks")
    assert(opts("kafka.ssl.keystore.location") === "/fake/path/client.keystore.jks")
    assert(opts("kafka.ssl.endpoint.identification.algorithm") === "")
    assert(!opts.contains("kafka.ssl.truststore.password"))
    assert(!opts.contains("kafka.ssl.keystore.password"))
    assert(!opts.keys.exists(_.startsWith("kafka.sasl.ssl.")))
  }

  test("no security block defaults to PLAINTEXT with no SASL keys (kafka_connector.py:437-438)") {
    val cfg = Conf(Map(
      "bootstrap_servers" -> "dummy:9094",
      "input_topic" -> "input_plaintext_topic"))
    val opts = KafkaOptions.reader(cfg, env = lookup)
    assert(opts("kafka.security.protocol") === "PLAINTEXT")
    assert(!opts.contains("kafka.sasl.mechanism"))
    assert(!opts.contains("kafka.sasl.jaas.config"))
  }

  test("SSL (non-SASL) uses the ssl.* prefix and defaults endpoint algo to https") {
    val cfg = Conf(Map(
      "bootstrap_servers" -> "dummy:9095",
      "input_topic" -> "t",
      "security" -> Map(
        "protocol" -> "SSL",
        "truststore_location" -> "/ts.jks")))
    val opts = KafkaOptions.reader(cfg, env = lookup)
    assert(opts("kafka.ssl.truststore.location") === "/ts.jks")
    assert(opts("kafka.ssl.endpoint.identification.algorithm") === "https")
  }

  // --- fail-fast validation (kafka_connector.py:46-49, 75-84, 163-166, 204-214) ---

  test("missing bootstrap_servers fails") {
    val e = intercept[IllegalArgumentException] {
      KafkaOptions.common(Conf(Map("input_topic" -> "t")), lookup)
    }
    assert(e.getMessage.contains("bootstrap_servers"))
  }

  test("missing input_topic / output_topic / checkpoint fail") {
    val base = Map[String, Any]("bootstrap_servers" -> "b:9092")
    assert(intercept[IllegalArgumentException] {
      KafkaOptions.reader(Conf(base), env = lookup)
    }.getMessage.contains("input_topic"))
    assert(intercept[IllegalArgumentException] {
      KafkaOptions.writer(Conf(base + ("output_topic" -> "o")), env = lookup)
    }.getMessage.contains("checkpoint_location_output"))
  }

  test("docs/kafka-live-smoke.md contract: the recipe's smoke.yaml and its " +
       "quoted fail-fast message match the builders exactly (keep the " +
       "recipe and this test in lockstep)") {
    // step 4 of the recipe quotes this message verbatim
    val e = intercept[IllegalArgumentException] {
      KafkaOptions.writer(Conf(Map[String, Any](
        "bootstrap_servers" -> "localhost:9094",
        "output_topic" -> "smoke-out")), env = lookup)
    }
    assert(e.getMessage ===
      "Kafka checkpoint_location_output is not defined for the writer.")
    // the recipe's source block resolves to exactly the options
    // spark-submit's .format("kafka") consumes
    val opts = KafkaOptions.reader(Conf(Map[String, Any](
      "bootstrap_servers" -> "localhost:9094",
      "input_topic" -> "smoke-in",
      "security" -> Map(
        "protocol" -> "SASL_PLAINTEXT",
        "sasl_mechanism" -> "SCRAM-SHA-512",
        "username" -> "admin-user",
        "password_env_var" -> "KAFKA_ADMIN_PASSWORD"))),
      env = Map("KAFKA_ADMIN_PASSWORD" -> "pw").get)
    assert(opts("kafka.bootstrap.servers") === "localhost:9094")
    assert(opts("subscribe") === "smoke-in")
    assert(opts("kafka.security.protocol") === "SASL_PLAINTEXT")
    assert(opts("kafka.sasl.mechanism") === "SCRAM-SHA-512")
    assert(opts("kafka.sasl.jaas.config").contains("ScramLoginModule"))
    assert(opts("kafka.sasl.jaas.config").contains("admin-user"))
  }

  test("batch writer: topic only, checkpoint neither required nor passed " +
       "(checkpointLocation is a streaming concept)") {
    val noCkpt = Conf(Map[String, Any](
      "bootstrap_servers" -> "b:9092", "output_topic" -> "out"))
    val opts = KafkaOptions.writerBatch(noCkpt, env = lookup)
    assert(opts("topic") === "out")
    assert(!opts.contains("checkpointLocation"))
    // the streaming writer still fails fast on the same config
    assert(intercept[IllegalArgumentException] {
      KafkaOptions.writer(noCkpt, env = lookup)
    }.getMessage.contains("checkpoint_location_output"))
    // and when checkpoint IS configured, the batch path still omits it
    val withCkpt = Conf(noCkpt.m + ("checkpoint_location_output" -> "/tmp/ck"))
    assert(!KafkaOptions.writerBatch(withCkpt, env = lookup)
      .contains("checkpointLocation"))
  }

  test("SASL without username/password_env_var fails; unset env var fails") {
    def cfg(sec: Map[String, Any]) = Conf(Map(
      "bootstrap_servers" -> "b:9092", "security" -> sec))
    assert(intercept[IllegalArgumentException] {
      KafkaOptions.common(cfg(Map("protocol" -> "SASL_PLAINTEXT")), lookup)
    }.getMessage.contains("Username and password_env_var"))
    assert(intercept[IllegalArgumentException] {
      KafkaOptions.common(cfg(Map(
        "protocol" -> "SASL_PLAINTEXT", "username" -> "u",
        "password_env_var" -> "NOT_SET_VAR")), lookup)
    }.getMessage.contains("NOT_SET_VAR"))
  }
}
