package graft

import graft.ops.llm.Dedup

/** The property that makes content-defined chunking worth having over
  * fixed-width chunking: boundaries are a function of local content, so
  * a single-character edit invalidates only the chunk(s) overlapping it
  * — every boundary ≥ one window past the edit lands on the same content
  * position and the chunks re-align. (Fixed-width chunking shifts every
  * subsequent boundary; nothing after the edit would match.)
  */
class CdcChunksSpec extends SparkSpec {

  test("CDC boundaries re-synchronize after a single-character insertion") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnop qrstuvw xyz."
    val base = (1 to 4000).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val edited = base.substring(0, 57) + "Z" + base.substring(57)
    val dir = tmpDir("cdc-")
    Seq((0L, base, "en", "synthetic", base.length.toLong),
        (1L, edited, "en", "synthetic", edited.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = Dedup.cdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nBase, dupBase) = rows(0L)
    val (nEdit, dupEdit) = rows(1L)
    // ~4000/64 ≈ 60 chunks; the divisor-64 rule must actually cut
    assert(nBase >= 20, s"expected tens of chunks, got $nBase")
    // edit changes chunk COUNT by at most the one split/merge it sits in
    assert(math.abs(nBase - nEdit) <= 2, s"chunk counts diverged: $nBase vs $nEdit")
    // all but the edit-overlapping chunk(s) re-align across the two docs
    assert(dupBase >= nBase - 3, s"base: only $dupBase of $nBase chunks re-aligned")
    assert(dupEdit >= nEdit - 3, s"edited: only $dupEdit of $nEdit chunks re-aligned")
  }

  test("streaming and batch chunkers implement the same boundary rule") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val stream = canon(Dedup.cdcChunkRows(docs))
    val batch  = canon(Dedup.cdcChunkRowsBatch(docs))
    assert(stream.nonEmpty)
    assert(stream == batch, "chunker twins drifted")
  }
}
