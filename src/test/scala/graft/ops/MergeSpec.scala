package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE conservation laws — hold for any target table, not just the
  * fixture: row accounting (kept + updated + inserted, deletes gone),
  * key disjointness of synthetic inserts, and value semantics of each
  * routing branch.
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val target = graft.Tables.orders(spark, dir)
  private lazy val merged = Merge.mergeUpsert(spark, dir).cache()

  test("row accounting: |result| = |target| - |deletes| + |inserts|") {
    val nTarget = target.count()
    val nDeletes = target.filter($"o_orderkey" % 10 === 7).count()
    val nInserts = target.filter($"o_orderkey" % 1000 === 0).count()
    assert(merged.count() === nTarget - nDeletes + nInserts)
    val bySrc = merged.groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("delete", 0L) === 0L) // no delete rows survive
    assert(bySrc("insert") === nInserts)
    assert(bySrc("update") === target.filter($"o_orderkey" % 10 === 0).count())
  }

  test("inserted keys are disjoint from the real keyspace (negative keys)") {
    assert(merged.filter($"src" === "insert" && $"o_orderkey" >= 0).isEmpty)
    assert(merged.filter($"src" =!= "insert" && $"o_orderkey" < 0).isEmpty)
  }

  test("updated rows carry price + 100 and status 'U'; kept rows are untouched") {
    val joined = merged.filter($"src" === "update")
      .join(target.select($"o_orderkey", $"o_totalprice".as("orig")), Seq("o_orderkey"))
    assert(joined.filter($"o_totalprice" =!= $"orig" + 100.0).isEmpty)
    assert(merged.filter($"src" === "update" && $"o_orderstatus" =!= "U").isEmpty)
    val kept = merged.filter($"src" === "kept")
      .join(target.select($"o_orderkey", $"o_totalprice".as("orig"),
        $"o_orderstatus".as("ostat")), Seq("o_orderkey"))
    assert(kept.filter($"o_totalprice" =!= $"orig" || $"o_orderstatus" =!= $"ostat").isEmpty)
  }
}
