package graft.connect

import graft.SparkSpec
import graft.config.{ComponentConfig, Conf}

/** Source/Sink factory contracts: fail-fast messages, per-mode rules, and
  * the value-column sink contract (kafka_connector.py:234-237).
  */
class ConnectorsSpec extends SparkSpec {

  import spark.implicits._

  private def comp(tpe: String, cfg: (String, Any)*) =
    ComponentConfig(tpe, Conf(cfg.toMap))

  test("unsupported source type carries the reference's message") {
    val e = intercept[IllegalArgumentException] {
      Sources.create(spark, comp("mongodb"), streaming = false)
    }
    assert(e.getMessage === "Unsupported reader type: mongodb")
  }

  test("file sources demand a path; streaming file sources demand a schema") {
    assert(intercept[IllegalArgumentException] {
      Sources.create(spark, comp("csv"), streaming = false)
    }.getMessage.contains("requires a 'path'"))
    assert(intercept[IllegalArgumentException] {
      Sources.create(spark, comp("parquet", "path" -> "/tmp/x"), streaming = true)
    }.getMessage.contains("requires a registered 'schema'"))
  }

  test("rate source is streaming-only") {
    assert(intercept[IllegalArgumentException] {
      Sources.create(spark, comp("rate"), streaming = false)
    }.getMessage.contains("streaming-only"))
  }

  test("batch table view in a streaming pipeline fails fast with a clear message") {
    Seq(1, 2).toDF("n").createOrReplaceTempView("conn_spec_view")
    val df = Sources.create(spark, comp("table", "name" -> "conn_spec_view"),
      streaming = false)
    assert(df.count() === 2)
    val e = intercept[IllegalArgumentException] {
      Sources.create(spark, comp("table", "name" -> "conn_spec_view"),
        streaming = true)
    }
    assert(e.getMessage.contains("needs a streaming source"))
  }

  test("kafka sink enforces the value-column contract before any options are built") {
    val noValue = Seq(1).toDF("n")
    val e = intercept[IllegalArgumentException] {
      Sinks.writeBatch(noValue, comp("kafka"))
    }
    assert(e.getMessage === "DataFrame to write must have a 'value' column.")
  }

  test("memory sink requires a query name; unknown sink type rejected") {
    val df = Seq(("k", "v")).toDF("key", "value")
    assert(intercept[IllegalArgumentException] {
      Sinks.startStream(df, comp("memory"))
    }.getMessage.contains("query_name"))
    assert(intercept[IllegalArgumentException] {
      Sinks.writeBatch(df, comp("elasticsearch"))
    }.getMessage === "Unsupported writer type: elasticsearch")
  }
}
