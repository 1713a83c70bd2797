package graft.ops.llm

import graft.SparkSpec
import graft.ops.llm.Multimodal.{Asset, AssetFeatures}

/** The C40 decode-stub plumbing: typed Dataset in, mapPartitions feature
  * extraction out — verifying schema, determinism, and batch shape (the
  * decoder itself is a documented stub; see Multimodal.decodeStub).
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

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
}
