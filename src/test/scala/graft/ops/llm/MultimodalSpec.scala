package graft.ops.llm

import graft.SparkSpec
import graft.ops.llm.Multimodal.{Asset, AssetFeatures}

/** The C40 decode-stub plumbing: typed Dataset in, mapPartitions feature
  * extraction out — verifying schema, determinism, and batch shape (the
  * decoder itself is a documented stub; see Multimodal.decodeStub).
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("frameStub samples frame indices by stride and decodes only those") {
    val bytes = Array.tabulate(250)(i => i.toByte) // 10 "frames" of 25 bytes
    val assets = Seq(Multimodal.Asset("doc://v1", bytes, "video/mp4")).toDS()
    val frames = Multimodal.frameStub(assets, maxFrames = 5)
      .collect().sortBy(_.frameIdx)
    // nFrames = 10, stride = 2 → indices 0, 2, 4, 6, 8
    assert(frames.map(_.frameIdx).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    assert(frames.forall(_.uri == "doc://v1"))
    // deterministic stub value: byte at idx*25
    assert(frames.head.value === (bytes(0) & 0xff).toFloat)
  }

  test("resizeStub bounds payload size, preserves metadata, and is " +
       "deterministic (stride-sampled fake of pixel downsampling)") {
    val big = Asset("doc://big", Array.tabulate(1000)(_.toByte), "image/png")
    val small = Asset("doc://small", Array.tabulate(10)(_.toByte), "image/png")
    val out = Multimodal.resizeStub(Seq(big, small).toDS(), targetBytes = 64)
      .collect().map(a => a.uri -> a).toMap
    assert(out("doc://big").bytes.length === 64)       // capped exactly
    assert(out("doc://small").bytes.length === 10)     // small passes through
    assert(out("doc://big").mime === "image/png")      // metadata preserved
    // deterministic: same input → byte-identical output
    val again = Multimodal.resizeStub(Seq(big).toDS(), 64).collect().head
    assert(again.bytes.toSeq === out("doc://big").bytes.toSeq)
    // stride sampling spans the WHOLE payload, not a prefix
    assert((out("doc://big").bytes.last & 0xff) >= 900 % 256)
  }

  test("decodeStub maps assets to fixed-width features deterministically") {
    val assets = Seq(
      Asset("doc://1", "hello".getBytes("UTF-8"), "text/plain"),
      Asset("doc://2", Array[Byte](0, 127, -1), "image/png"),
      Asset("doc://3", Array.emptyByteArray, "audio/wav")).toDS()
    val out = Multimodal.decodeStub(assets).collect().sortBy(_.uri)
    assert(out.map(_.uri).toSeq === Seq("doc://1", "doc://2", "doc://3"))
    assert(out.forall(_.features.length == 4))
    assert(out(0).nBytes === 5L)
    assert(out(1).nBytes === 3L)
    // max byte of (0, 127, 0xff) is 255 unsigned
    assert(out(1).features(2) === 255.0f)
    // empty payload well-defined
    assert(out(2).features.toSeq === Seq(0.0f, 0.0f, 0.0f, 1.0f))
    // deterministic: second run identical
    val again = Multimodal.decodeStub(assets).collect().sortBy(_.uri)
    assert(again.map(_.features.toSeq).toSeq === out.map(_.features.toSeq).toSeq)
  }

  test("features survive a round-trip through a DataFrame plan") {
    val assets = Seq(Asset("doc://9", "abc".getBytes("UTF-8"), "text/plain")).toDS()
    val df = Multimodal.decodeStub(assets).toDF()
    assert(df.columns.toSeq === Seq("uri", "mime", "nBytes", "features"))
    val row = df.as[AssetFeatures].head()
    assert(row.nBytes === 3L)
  }

  test("magic-byte sniff flags exactly the planted bare-payload assets") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val out = Multimodal.multimodalSniff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // mismatches are (declared media, sniffed text/plain) and only those
    assert(out.keySet.filter { case (d, s) => d != s } ===
      Set(("image/png", "text/plain"), ("audio/wav", "text/plain")))
    // planted arithmetic: a media-declared asset mismatches iff
    // doc_id % 7 == 3; count independently from the assets view
    val expected = Multimodal.assets(spark, dir)
      .select(col("doc_id"), col("m.mime").as("declared"))
      .where(col("declared") =!= "text/plain" && col("doc_id") % 7 === 3)
      .groupBy(col("declared")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(("image/png", "text/plain")) === expected("image/png"))
    assert(out(("audio/wav", "text/plain")) === expected("audio/wav"))
    // conservation: census covers every asset exactly once
    assert(out.values.sum ===
      graft.Tables.documents(spark, dir).count())
  }

  test("phash locality: a length-preserving tail re-encode stays within " +
       "a small Hamming radius for nearly every twin, pair counts follow " +
       "the doc_id % 5 planting, and an identical payload hashes " +
       "identically (min_ham = 0 somewhere)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val out = Multimodal.multimodalPhash(spark, dir)
    val rows = out.collect()
    val nPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val nNear = rows.map(_.getAs[Long]("n_near")).sum
    // one twin per doc_id % 5 == 0
    assert(nPairs ===
      graft.Tables.documents(spark, dir)
        .where(col("doc_id") % 5 === 0).count())
    // locality: ≥ 95% of twins within radius 8 of a 64-bit code —
    // unrelated payloads sit near 32 (binomial mean), so the separation
    // is what makes banding work
    assert(nNear * 100 >= nPairs * 95, s"only $nNear/$nPairs near")
    assert(rows.map(_.getAs[Long]("min_ham")).min === 0L)
    assert(rows.forall(_.getAs[Long]("max_ham") <= 20L))
  }
}
