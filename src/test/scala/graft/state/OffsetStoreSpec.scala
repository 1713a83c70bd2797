package graft.state

import org.scalatest.funsuite.AnyFunSuite

/** The custom-offset store: round-trip, default-0 contract
  * (offset_manager.py:86-88), atomic replace, and the startingOffsets
  * bridge back into a Spark Kafka source (B4).
  */
class OffsetStoreSpec extends AnyFunSuite {

  private def freshStore() = new OffsetStore(
    java.nio.file.Files.createTempDirectory("offsets").toString)

  test("absent offset loads the default 0") {
    assert(freshStore().loadOffset("events", "0") === 0L)
  }

  test("save/load round-trip, last write wins") {
    val s = freshStore()
    s.saveOffset("events", "0", 41L)
    s.saveOffset("events", "0", 42L)
    s.saveOffset("events", "1", 7L)
    assert(s.loadOffset("events", "0") === 42L)
    assert(s.loadOffset("events", "1") === 7L)
    assert(s.offsetsFor("events") === Map("0" -> 42L, "1" -> 7L))
  }

  test("streams are isolated, including prefix-sharing names with underscores") {
    val s = freshStore()
    s.saveOffset("a", "0", 1L)
    s.saveOffset("b", "0", 2L)
    assert(s.offsetsFor("a") === Map("0" -> 1L))
    assert(s.loadOffset("b", "0") === 2L)
    // "a__b" must never leak into offsetsFor("a") ('_' is a legal name char)
    s.saveOffset("a__b", "0", 5L)
    assert(s.offsetsFor("a") === Map("0" -> 1L))
    assert(s.offsetsFor("a__b") === Map("0" -> 5L))
  }

  test("startingOffsets JSON bridge") {
    val s = freshStore()
    s.saveOffset("topic1", "0", 100L)
    s.saveOffset("topic1", "1", 250L)
    assert(s.asStartingOffsetsJson("topic1") ===
      """{"topic1": {"0": 100, "1": 250}}""")
  }

  test("unsafe names are rejected (no path traversal)") {
    val s = freshStore()
    intercept[IllegalArgumentException] { s.saveOffset("../evil", "0", 1L) }
    intercept[IllegalArgumentException] { s.loadOffset("ok", "../0") }
  }

  test("store survives reopen (separate instance, same path)") {
    val dir = java.nio.file.Files.createTempDirectory("offsets2").toString
    new OffsetStore(dir).saveOffset("events", "0", 9L)
    assert(new OffsetStore(dir).loadOffset("events", "0") === 9L)
  }
}
