package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end streaming curation: the funnel's quality features + exact
  * dedup running incrementally over arriving file batches, with the
  * dedup index living in checkpointed state. Pins the three claims the
  * batch gates cannot: (1) the streaming output equals the batch
  * quality-filter + distinct-hash result over everything that has
  * arrived, (2) dedup state SURVIVES a restart — batch-2 documents whose
  * content arrived in batch 1 are rejected by the restored checkpoint,
  * (3) a restart with no new input emits nothing (no replay
  * duplication).
  */
class CurationStreamSpec extends SparkSpec {

  test("streaming curation dedups across restarts from checkpointed state") {
    import spark.implicits._
    val fixtures = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val src = tmpDir("curate-src"); val out = tmpDir("curate-out")
    val ckpt = tmpDir("curate-ckpt")

    // batch 1: docs 0-249. batch 2: docs 200-499 re-keyed to fresh ids —
    // 50 of them carry content already accepted in batch 1, so only the
    // checkpointed hash state can reject them.
    fixtures.where($"doc_id" < 250)
      .write.mode("append").parquet(src)
    val q1 = CurationStream.ingest(spark, src, out, ckpt)
    q1.awaitTermination()

    def accepted() = spark.read.parquet(out)
    val afterB1 = accepted().count()
    val expectB1 = graft.ops.llm.Curation.scoreDocs(
        fixtures.where($"doc_id" < 250))
      .where($"qual").select(md5($"text")).distinct().count()
    assert(afterB1 === expectB1)

    fixtures.where($"doc_id" >= 200)
      .withColumn("doc_id", $"doc_id" + 10000)
      .write.mode("append").parquet(src)
    val q2 = CurationStream.ingest(spark, src, out, ckpt)
    q2.awaitTermination()

    // all-time invariant: one accepted row per distinct quality hash
    // over everything that has arrived, batch boundaries invisible
    val union = fixtures.where($"doc_id" < 250)
      .unionByName(fixtures.where($"doc_id" >= 200))
    val expectAll = graft.ops.llm.Curation.scoreDocs(union)
      .where($"qual").select(md5($"text")).distinct().count()
    assert(accepted().count() === expectAll)
    assert(accepted().select($"content_hash").distinct().count() === expectAll)
    // the batch-1/batch-2 content overlap really exercised the state:
    // batch 2 contributed fewer rows than its own distinct-quality count
    val b2Alone = graft.ops.llm.Curation.scoreDocs(
        fixtures.where($"doc_id" >= 200))
      .where($"qual").select(md5($"text")).distinct().count()
    assert(expectAll - afterB1 < b2Alone)

    // restart with nothing new: no rows added anywhere
    val q3 = CurationStream.ingest(spark, src, out, ckpt)
    q3.awaitTermination()
    assert(accepted().count() === expectAll)
  }
}
