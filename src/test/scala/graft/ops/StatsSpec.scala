package graft.ops

import graft.SparkSpec

/** Cost-based-optimizer evidence: at 100 TB the planner must run on
  * CATALOG STATISTICS (rowCount, per-column NDV/min/max from ANALYZE
  * TABLE), not on file-size guesses — that is what makes join reordering,
  * selectivity estimation, and broadcast decisions correct on data the
  * driver has never listed. This suite pins that the ANALYZE path works
  * end-to-end on the fixture tables: stats land in the catalog, Catalyst's
  * estimates consume them, and a hint-free dim join broadcasts.
  */
class StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val db  = s"graft_stats_${ProcessHandle.current().pid()}"

  private def withStatsTables(f: => Unit): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      for (t <- Seq("orders", "nation")) {
        spark.read.parquet(s"$dir/$t.parquet")
          .write.mode("overwrite").saveAsTable(s"$db.$t")
      }
      spark.sql(s"ANALYZE TABLE $db.orders COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql(s"ANALYZE TABLE $db.nation COMPUTE STATISTICS FOR ALL COLUMNS")
      f
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("ANALYZE TABLE lands exact rowCount + column NDV in the catalog " +
       "and CBO consumes them for cardinality estimates") {
    withStatsTables {
      val trueRows = spark.table(s"$db.orders").count()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val rel = spark.table(s"$db.orders").queryExecution.optimizedPlan
        val stats = rel.stats
        assert(stats.rowCount.contains(BigInt(trueRows)),
          s"catalog rowCount ${stats.rowCount} != $trueRows")
        val keyStats = stats.attributeStats.find(_._1.name == "o_orderkey")
        assert(keyStats.isDefined, "o_orderkey column stats missing")
        // ANALYZE's NDV is HyperLogLog-approximate: within the sketch's
        // error band of the true count for a unique key column
        val ndv = keyStats.get._2.distinctCount.get.toLong
        assert(math.abs(ndv - trueRows) <= trueRows / 10,
          s"o_orderkey NDV $ndv too far from rowCount $trueRows: ${keyStats.get._2}")

        // selectivity: an equality filter on a 5-value column estimates
        // ~rows/5 from NDV — impossible without column stats
        val filtered = spark.table(s"$db.orders")
          .where("o_orderpriority = '1-URGENT'")
          .queryExecution.optimizedPlan.stats
        assert(filtered.rowCount.isDefined, "no CBO estimate for the filter")
        val est = filtered.rowCount.get.toLong
        assert(est > 0 && est < trueRows,
          s"filter estimate $est should be a strict subset of $trueRows")
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }

  test("hint-free dim join broadcasts off catalog stats (the 100 TB " +
       "deployment never hand-hints every query)") {
    withStatsTables {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        // nation is 5 rows — far under the broadcast threshold; the join
        // carries NO broadcast() hint anywhere
        import org.apache.spark.sql.functions.col
        val plan = spark.table(s"$db.orders")
          .join(spark.table(s"$db.nation"),
                col("o_custkey") % 5 === col("n_nationkey"))
          .queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"), plan)
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }
}
