package graft.ops.llm

import graft.SparkSpec

/** Laws for the snapshot diff: the four statuses partition the union of
  * both snapshots' ids, and each category's count/range matches the
  * construction of the simulated release pair exactly.
  */
class SnapshotDiffSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("snapshot diff: the four statuses partition both snapshots with " +
       "the constructed counts and id ranges") {
    val out = Dedup.snapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // sf0.01 = 500 docs: A = ids 0..449 (100..119 revised), B = 50..499
    assert(out.keySet === Set("added", "removed", "changed", "unchanged"))
    assert(out("removed") === ((50L, 0L, 49L)))
    assert(out("added") === ((50L, 450L, 499L)))
    assert(out("changed") === ((20L, 100L, 119L)))
    assert(out("unchanged") === ((380L, 50L, 449L)))
  }
}
