package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Aggregation operators (SURVEY.md §2 C14–C20).
  *
  * All forms are built-in hash aggregates: Spark plans partial (map-side)
  * + final aggregation automatically, so at 100 TB the shuffle carries one
  * row per (group, partition), not per input row.
  */
object Aggregates extends QueryPack {

  /** C14 flagship: TPC-H Q1-shaped pricing summary over lineitem.
    * groupBy two low-cardinality keys → partial agg collapses ~6k/60k/600k
    * rows to ≤6 groups per task before the shuffle.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Det.dsum($"l_quantity").as("sum_qty"),
        Det.dsum($"l_extendedprice").as("sum_base_price"),
        Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        Det.davg($"l_quantity").as("avg_qty"),
        Det.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Det.sqlAvg("l_quantity")} AS avg_qty,
       |  ${Det.sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1Pricing _)
  )

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSql
  )
}
