package graft.config

import java.io.FileNotFoundException
import org.scalatest.funsuite.AnyFunSuite

/** Config loading + the pipeline's fail-fast validation matrix
  * (…/config/config_loader.py:19-26; …/pipeline/streaming_pipeline.py:
  * 60-62, 80-82, 117-118, 152-165).
  */
class YamlConfigSpec extends AnyFunSuite {

  /** The reference's flagship YAML, translated
    * (/root/reference/configs/stream_job_pipeline_config.yaml:1-36).
    */
  val translated: String =
    """app_name: "StreamJobRefactored"
      |source:
      |  type: "kafka"
      |  config:
      |    bootstrap_servers: "localhost:9092"
      |    input_topic: "input-topic"
      |    security:
      |      protocol: "SASL_PLAINTEXT"
      |      sasl_mechanism: "SCRAM-SHA-512"
      |      username: "admin-user"
      |      password_env_var: "KAFKA_ADMIN_PASSWORD"
      |processors:
      |  - name: "UppercaseValue"
      |    class: "graft.pipeline.UppercaseValueProcessor"
      |sink:
      |  type: "kafka"
      |  config:
      |    bootstrap_servers: "localhost:9092"
      |    output_topic: "output-topic"
      |    checkpoint_location_output: "/tmp/spark-checkpoints/stream_job_refactored"
      |""".stripMargin

  test("translated reference YAML parses into the typed model") {
    val cfg = YamlConfig.pipeline(YamlConfig.loadString(translated))
    assert(cfg.appName === "StreamJobRefactored")
    assert(cfg.source.componentType === "kafka")
    assert(cfg.source.config.str("input_topic").contains("input-topic"))
    assert(cfg.processors.map(_.className) ===
      List("graft.pipeline.UppercaseValueProcessor"))
    assert(cfg.sink.config.str("checkpoint_location_output")
      .contains("/tmp/spark-checkpoints/stream_job_refactored"))
  }

  test("missing file fails fast (config_loader.py:19-20)") {
    intercept[FileNotFoundException] {
      YamlConfig.loadFile("/no/such/config.yaml")
    }
  }

  test("unparseable YAML fails fast (config_loader.py:22-26)") {
    val e = intercept[IllegalArgumentException] {
      YamlConfig.loadString("source: [unclosed")
    }
    assert(e.getMessage.contains("Error parsing YAML"))
  }

  test("missing source / sink (streaming_pipeline.py:152-165)") {
    val noSource = "app_name: x\nsink: {type: console, config: {}}\n"
    assert(intercept[IllegalArgumentException] {
      YamlConfig.pipeline(YamlConfig.loadString(noSource))
    }.getMessage === "Pipeline 'source' configuration is missing.")

    val noSink = "app_name: x\nsource: {type: parquet, config: {path: /x}}\n"
    assert(intercept[IllegalArgumentException] {
      YamlConfig.pipeline(YamlConfig.loadString(noSink))
    }.getMessage === "Pipeline 'sink' configuration is missing.")
  }

  test("source without type or config (streaming_pipeline.py:60-62)") {
    val bad = "source: {config: {path: /x}}\nsink: {type: console, config: {}}\n"
    assert(intercept[IllegalArgumentException] {
      YamlConfig.pipeline(YamlConfig.loadString(bad))
    }.getMessage === "Reader 'type' or 'config' not specified.")
  }

  test("processor without class (streaming_pipeline.py:117-118)") {
    val bad =
      """source: {type: parquet, config: {path: /x}}
        |processors:
        |  - name: "Broken"
        |sink: {type: console, config: {}}
        |""".stripMargin
    assert(intercept[IllegalArgumentException] {
      YamlConfig.pipeline(YamlConfig.loadString(bad))
    }.getMessage.contains("Processor class not specified for Broken"))
  }

  test("processors default to empty; app_name defaults (streaming_pipeline.py:44)") {
    val minimal =
      "source: {type: parquet, config: {path: /x}}\nsink: {type: console, config: {}}\n"
    val cfg = YamlConfig.pipeline(YamlConfig.loadString(minimal))
    assert(cfg.processors.isEmpty)
    assert(cfg.appName === "StreamingPipeline")
  }

  test("app-level YAML (configs/app_config.yaml twin) parses into AppConfig") {
    // the reference's app_config.yaml shape: app-wide settings alongside a
    // kafka block (which flows through ComponentConfig, not AppConfig)
    val yaml =
      """kafka:
        |  bootstrap_servers: "localhost:9092"
        |  input_topic: "input_topic"
        |app_name: "PySparkStreamingApp"
        |spark_master: "local[*]"
        |""".stripMargin
    val app = YamlConfig.app(YamlConfig.loadString(yaml))
    assert(app.appName === "PySparkStreamingApp")
    assert(app.master === "local[*]")
    assert(app.logLevel.isEmpty)
  }

  test("app config defaults + optional log level") {
    val app = YamlConfig.app(YamlConfig.loadString("log_level: WARN"))
    assert(app.appName === "graft-app")
    assert(app.master === "local[*]")
    assert(app.logLevel.contains("WARN"))
  }
}
