package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Window functions (SURVEY.md §2 C21–C24) + per-group top-k.
  *
  * Scale notes: a window spec with partitionBy(k) is one shuffle on k; all
  * functions over the same spec share it. Running/frame sums accumulate in
  * exact decimal (cast back to double) so the result is engine- and
  * order-independent — see [[graft.Det]].
  */
object Windows extends QueryPack {

  private val Dec = DecimalType(30, 6)

  /** C21 per-group top-k: top-3 orders per customer by price (tie-broken
    * by orderkey so row_number is total). Executes as one shuffle + sort
    * per partition; no global sort.
    */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** C21 ranking family: rank / dense_rank over ties, ntile over a total
    * order.
    */
  def rankingFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byPrice = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".desc)
    val total   = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus",
              rank().over(byPrice).cast("long").as("rnk"),
              dense_rank().over(byPrice).cast("long").as("drnk"),
              ntile(4).over(total).cast("long").as("quartile"))
      .orderBy($"o_orderkey")
  }

  /** C22 analytic lag/lead over each user's event sequence (event_id is
    * the monotone offset surrogate).
    */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"value",
              coalesce(lag($"value", 1).over(w), lit(-1.0)).as("prev_value"),
              coalesce(lead($"value", 1).over(w), lit(-1.0)).as("next_value"),
              first($"event_type").over(w).as("first_type"))
      .orderBy($"event_id")
  }

  /** C23/C24 running aggregates: rows-frame cumulative sum/count per
    * customer in order time (decimal accumulation → engine-exact double).
    */
  def runningSums(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
              sum($"o_totalprice".cast(Dec)).over(w).cast("double").as("running_spend"),
              count(lit(1)).over(w).as("running_orders"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** C23 range frame over a numeric key: how many orders fell within the
    * previous 500 orderkeys (range, not rows).
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_orderkey")
      .rangeBetween(-500L, 0L)
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus",
              count(lit(1)).over(w).as("n_recent"))
      .orderBy($"o_orderkey")
  }

  /** C21 distribution family: percent_rank and cume_dist. Both are exact
    * ratios of integers ((rank−1)/(n−1), peers/n — one IEEE division, no
    * rounding divergence), and both give tied rows identical values in
    * every SQL engine, so no tiebreak is needed in the window order.
    */
  def distFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus",
              percent_rank().over(w).as("pr"),
              cume_dist().over(w).as("cd"))
      .orderBy($"o_orderkey")
  }

  /** Window VALUE functions over whole-partition frames: nth_value and
    * last_value need `ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    * FOLLOWING` to mean "of the partition" (the default frame stops at
    * the current row — the classic last_value gotcha this gate pins in
    * both engines at once).
    */
  def valueFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val full = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id",
              coalesce(nth_value($"event_type", 2).over(full), lit("-"))
                .as("second_type"),
              last($"event_type").over(full).as("last_type"))
      .orderBy($"event_id")
  }

  /** Time-interval RANGE frame — rolling 7-day revenue per supplier,
    * through the spark.sql entry path (the DataFrame rangeBetween API is
    * numeric-only; calendar-interval frames are SQL surface). RANGE
    * includes date peers in the frame, so tied ship dates share one
    * value — which is also what makes the output deterministic. One
    * shuffle on suppkey; the frame scan is a per-partition sliding
    * accumulator, never a self-join.
    */
  def rangeInterval(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT l_suppkey, l_shipdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS rev_7d
        |FROM lineitem
        |WHERE l_suppkey < 20
        |ORDER BY l_suppkey, l_shipdate""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_range_interval" -> (rangeInterval _),
    "win_value_family"   -> (valueFamily _),
    "win_dist_family"    -> (distFamily _),
    "win_topk_per_group" -> (topKPerGroup _),
    "win_ranking_family" -> (rankingFamily _),
    "win_lag_lead"       -> (lagLead _),
    "win_running_sums"   -> (runningSums _),
    "win_range_frame"    -> (rangeFrame _)
  )

  def oracle: Map[String, String] = Map(
    "win_range_interval" ->
      """SELECT l_suppkey, l_shipdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS rev_7d
        |FROM lineitem
        |WHERE l_suppkey < 20
        |ORDER BY l_suppkey, l_shipdate""".stripMargin,
    "win_value_family" ->
      """SELECT event_id, user_id,
        |  COALESCE(NTH_VALUE(event_type, 2) OVER w, '-') AS second_type,
        |  LAST_VALUE(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "win_dist_family" ->
      """SELECT o_orderkey, o_orderstatus,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,
    "win_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "win_ranking_family" ->
      """SELECT o_orderkey, o_orderstatus,
        |  RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk,
        |  NTILE(4) OVER (PARTITION BY o_orderstatus
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id, value,
        |  COALESCE(LAG(value, 1) OVER w, -1.0) AS prev_value,
        |  COALESCE(LEAD(value, 1) OVER w, -1.0) AS next_value,
        |  FIRST_VALUE(event_type) OVER w AS first_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,
    "win_running_sums" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS running_spend,
        |  COUNT(*) OVER w AS running_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, COUNT(*) OVER w AS n_recent
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin
  )
}
