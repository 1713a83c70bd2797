package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming decontamination: the containment-ratio filter running at
  * ingest over arriving file batches against a static benchmark gram
  * set. Pins what the batch gate cannot: (1) per-batch streaming output
  * equals the batch-mode ratio filter over the same documents — one
  * definition, two modes, (2) a replayed/no-new-input restart adds no
  * batch directories (idempotent batch-id sink), (3) a verbatim
  * benchmark document arriving in ANY batch is rejected with ppm
  * 1000000, and too-short documents pass with ppm 0 instead of
  * vanishing.
  */
class DecontamStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("streaming decontamination filters each arriving batch exactly " +
       "like the batch gate, rejects verbatim benchmark text, and " +
       "replays idempotently") {
    import spark.implicits._
    val fixtures = graft.Tables.documents(spark, dir)
    val bench = DecontamStream.benchGrams(spark, dir)
    val src = tmpDir("decon-src"); val out = tmpDir("decon-out")
    val rej = tmpDir("decon-rej"); val ckpt = tmpDir("decon-ckpt")

    // batch 1: clean corpus docs 100-299 plus one VERBATIM benchmark doc
    // re-keyed (the leak) and one too-short doc (no 4-grams at all)
    val leak = fixtures.where($"doc_id" === 3)
      .withColumn("doc_id", lit(90001L))
    val short = Seq((90002L, "two words", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    fixtures.where($"doc_id" >= 100 && $"doc_id" < 300)
      .unionByName(leak).unionByName(short)
      .write.mode("append").parquet(src)
    DecontamStream.ingest(spark, src, bench, out, rej, ckpt)
      .awaitTermination()

    val accepted = spark.read.parquet(out)
    val rejected = spark.read.parquet(rej)
    // the verbatim benchmark doc is fully contained → rejected at 100%
    val leakRow = rejected.where($"doc_id" === 90001L).collect()
    assert(leakRow.length === 1)
    assert(leakRow.head.getAs[Long]("ppm") === 1000000L)
    assert(accepted.where($"doc_id" === 90001L).count() === 0L)
    // the too-short doc passes with ppm 0 (nothing to leak)
    val shortRow = accepted.where($"doc_id" === 90002L).collect()
    assert(shortRow.length === 1)
    assert(shortRow.head.getAs[Long]("ppm") === 0L)
    assert(shortRow.head.getAs[Long]("n_grams") === 0L)

    // streaming == batch: the accepted/rejected split matches the batch
    // transform over the same input
    val batchIn = fixtures.where($"doc_id" >= 100 && $"doc_id" < 300)
      .unionByName(leak).unionByName(short)
    val batchOut = DecontamStream.decontaminate(batchIn, bench)
    assert(accepted.count() === batchOut.where(!$"flagged").count())
    assert(rejected.count() === batchOut.where($"flagged").count())
    val streamPpm = accepted.select($"doc_id", $"ppm")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    batchOut.where(!$"flagged").select($"doc_id", $"ppm").collect()
      .foreach(r => assert(streamPpm(r.getLong(0)) === r.getLong(1)))

    // restart with no new input: no new batch dirs, counts unchanged
    val before = accepted.count()
    DecontamStream.ingest(spark, src, bench, out, rej, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === before)

    // batch 2: another leak — the static bench set still catches it
    fixtures.where($"doc_id" === 7)
      .withColumn("doc_id", lit(90003L))
      .write.mode("append").parquet(src)
    DecontamStream.ingest(spark, src, bench, out, rej, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(rej).where($"doc_id" === 90003L).count() === 1L)
    assert(spark.read.parquet(out).where($"doc_id" === 90003L).count() === 0L)
  }

  test("decontaminate is schema-generic: source columns (including ones " +
       "the fixture never had) pass through verbatim with the ratio " +
       "columns appended") {
    import spark.implicits._
    val bench = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
      .transform(b => graft.ops.llm.Dedup
        .shinglesFrom(b.withColumn("doc_id", lit(0L)), 4, distinct = true)
        .select($"s").distinct())
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "crawl-42", 7),
      (2L, "one two three four five six seven", "crawl-43", 9))
      .toDF("doc_id", "text", "provenance", "extra_score")
    val out = DecontamStream.decontaminate(batch, bench)
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "provenance", "extra_score",
          "n_grams", "n_shared", "ppm", "flagged"))
    val rows = out.orderBy($"doc_id").collect()
    assert(rows(0).getAs[String]("provenance") === "crawl-42")
    assert(rows(0).getAs[Boolean]("flagged"))
    assert(rows(1).getAs[Int]("extra_score") === 9)
    assert(!rows(1).getAs[Boolean]("flagged"))
  }
}
