package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Reshaping operators: pivot (wide) and unpivot/melt (long) — the
  * DataFrame reshape pair every analytics user reaches for (Spark
  * `groupBy(..).pivot(..)` and `unpivot`). Not reference-invoked but part
  * of the complete query surface a Spark engine owes its users.
  *
  * Scale notes: a pivot with an EXPLICIT value list (as here) is one hash
  * aggregate — Spark needs no extra pass to discover the pivot domain,
  * and each output column is a filtered aggregate. Never call
  * `.pivot(col)` without values at scale: the implicit distinct scan is a
  * full extra job. Unpivot is a Generate (row explosion by a constant
  * factor) followed by a normal aggregate — shuffle only on the group key.
  */
object Reshape extends QueryPack {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Pivot: order counts per status × priority, explicit pivot domain. */
  def pivotQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .toDF("o_orderstatus", "p_urgent", "p_high", "p_medium", "p_notspec", "p_low")
      .select($"o_orderstatus",
        coalesce($"p_urgent", lit(0L)).as("p_urgent"),
        coalesce($"p_high", lit(0L)).as("p_high"),
        coalesce($"p_medium", lit(0L)).as("p_medium"),
        coalesce($"p_notspec", lit(0L)).as("p_notspec"),
        coalesce($"p_low", lit(0L)).as("p_low"))
      .orderBy($"o_orderstatus")
  }

  /** Unpivot/melt: lineitem measures to (metric, value) rows, then a
    * deterministic sum per metric.
    */
  def unpivotQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .unpivot(
        ids = Array($"l_orderkey"),
        values = Array($"l_quantity", $"l_discount", $"l_tax"),
        variableColumnName = "metric",
        valueColumnName = "value")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"), Det.dsum($"value").as("total"))
      .orderBy($"metric")
  }

  /** The SQL `PIVOT` clause through the `spark.sql` entry path — same
    * semantics as the DataFrame pivot above (explicit value domain, no
    * implicit distinct scan), proving the SQL-surface spelling. The
    * oracle is the equivalent conditional aggregation, which is also
    * exactly what Catalyst lowers PIVOT to.
    */
  def pivotSql(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT * FROM (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS DECIMAL(30,6)) AS q
        |  FROM lineitem)
        |PIVOT (CAST(SUM(q) AS DOUBLE)
        |       FOR l_linestatus IN ('O' AS qty_open, 'F' AS qty_filled))
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** The SQL `UNPIVOT` clause (Spark 3.4+) through `spark.sql` — columns
    * to rows with explicit metric labels. NULL cells are excluded by
    * UNPIVOT's default, which the chosen NOT-NULL measures make moot; the
    * oracle is the portable UNION ALL spelling.
    */
  def unpivotSql(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_v,
        |         p_retailprice AS price_v
        |  FROM part)
        |UNPIVOT (val FOR metric IN (size_v AS size, price_v AS price))
        |ORDER BY p_partkey, metric""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_pivot"      -> (pivotSql _),
    "sql_unpivot"    -> (unpivotSql _),
    "reshape_pivot"   -> (pivotQ _),
    "reshape_unpivot" -> (unpivotQ _)
  )

  def oracle: Map[String, String] = Map(
    "sql_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |                THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE)
        |    AS qty_open,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |                THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE)
        |    AS qty_filled
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "sql_unpivot" ->
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'price', p_retailprice FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,
    // portable pivot: filtered aggregates (identical semantics to Spark's
    // explicit-domain pivot)
    "reshape_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "reshape_unpivot" ->
      s"""WITH melted AS (
         |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         |  UNION ALL
         |  SELECT 'l_discount', l_discount FROM lineitem
         |  UNION ALL
         |  SELECT 'l_tax', l_tax FROM lineitem
         |)
         |SELECT metric, COUNT(*) AS n, ${Det.sqlSum("value")} AS total
         |FROM melted GROUP BY metric ORDER BY metric""".stripMargin
  )
}
