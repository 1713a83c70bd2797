package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Slowly-changing-dimension (SCD Type 2) history builder — the standard
  * warehouse operator for effective-dated dimension rows: each key's
  * change events become versioned rows with [effective_from, effective_to)
  * validity ranges and an is_current flag on the open-ended latest row.
  *
  * Scale notes: the whole operator is ONE shuffle (partitionBy key) and a
  * per-key sort — `lead` closes each row's range against the next change
  * without any self-join. The naive form (t1 JOIN t2 ON t1.key = t2.key
  * AND t2.date > t1.date, then a min) is quadratic per hot key; the window
  * form is linear and is what survives a 100 TB change log. Version
  * numbers come from the same window spec, so the sort is paid once.
  */
object Scd extends QueryPack {

  /** Orders-as-changelog: each customer's orders become that customer's
    * type-2 status history, tie-broken by orderkey so versions are total.
    */
  def scd2Q(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .select(
        $"o_custkey", $"o_orderkey",
        $"o_orderstatus".as("status"),
        $"o_totalprice",
        $"o_orderdate".as("effective_from"),
        lead($"o_orderdate", 1).over(w).as("effective_to"),
        lead($"o_orderdate", 1).over(w).isNull.as("is_current"),
        row_number().over(w).cast("long").as("version"))
      .orderBy($"o_custkey", $"version")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_history" -> (scd2Q _)
  )

  def oracle: Map[String, String] = Map(
    "scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus AS status, o_totalprice,
        |  o_orderdate AS effective_from,
        |  LEAD(o_orderdate) OVER w AS effective_to,
        |  (LEAD(o_orderdate) OVER w IS NULL) AS is_current,
        |  ROW_NUMBER() OVER w AS version
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin
  )
}
