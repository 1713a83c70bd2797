package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Global sort / limit / top-k and set operations (SURVEY.md §2 C-sort,
  * C-set).
  *
  * Scale notes: `orderBy(..).limit(k)` plans as TakeOrderedAndProject —
  * each task keeps a k-heap and only k rows per partition reach the driver
  * side of the exchange, so global top-k never materializes a full sort at
  * 100 TB. Set ops are hash-based (shuffle on the whole row).
  */
object SortSetOps extends QueryPack {

  /** Global top-k: 100 priciest lineitems, tie-broken to a total order. */
  def topKGlobal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** Multi-key global sort (mixed directions) over a small dim. */
  def sortMultiKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
      .orderBy($"s_nationkey".desc, $"s_acctbal".asc, $"s_suppkey".asc)
  }

  /** Set union (distinct): rich customers ∪ customers with huge orders. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rich = Tables.customer(spark, dir)
      .filter($"c_acctbal" > 9000.0).select($"c_custkey")
    val big = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 400000.0).select($"o_custkey".as("c_custkey"))
    rich.union(big).distinct().orderBy($"c_custkey")
  }

  /** Set intersect: part keys that are both large-sized and actually sold. */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sold  = Tables.lineitem(spark, dir).select($"l_partkey".as("p_partkey"))
    val large = Tables.part(spark, dir).filter($"p_size" > 40).select($"p_partkey")
    large.intersect(sold).orderBy($"p_partkey")
  }

  /** Set except: parts never sold in bulk (quantity ≥ 45). The quantity
    * band is fixture-side, not operator-side: every part in this data has
    * at least one sale, so an unrestricted EXCEPT returns 0 rows and its
    * hash-match proves nothing (VERDICT r4 #3) — the band leaves ~3%
    * survivors at both test SFs.
    */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all  = Tables.part(spark, dir).select($"p_partkey")
    val sold = Tables.lineitem(spark, dir).filter($"l_quantity" >= 45)
      .select($"l_partkey".as("p_partkey"))
    all.except(sold).orderBy($"p_partkey")
  }

  /** Bag-semantics set ops — EXCEPT ALL / INTERSECT ALL keep
    * multiplicities (the distinct-less forms a dedup pipeline needs when
    * counting how MANY copies survive, not just which values). Spark
    * plans both as a single hash aggregate over tagged counts — one
    * shuffle, no distinct, same shape as the set versions.
    */
  def exceptAllBrands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val small = Tables.part(spark, dir)
      .filter($"p_size" <= 25).select($"p_brand")
    val promo = Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_brand")
    small.exceptAll(promo).orderBy($"p_brand")
  }

  def intersectAllBrands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val small = Tables.part(spark, dir)
      .filter($"p_size" <= 25).select($"p_brand")
    val promo = Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_brand")
    small.intersectAll(promo).orderBy($"p_brand")
  }

  /** C-filter showcase: null-safe / isin / between / like predicates pushed
    * into the parquet scan.
    */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size".between(10, 40) &&
              $"p_brand".isin("Brand#11", "Brand#12", "Brand#13") &&
              $"p_name".like("%bolt%") &&
              !($"p_type" <=> lit("__none__")))
      .select($"p_partkey", $"p_brand", $"p_size")
      .orderBy($"p_partkey")
  }

  /** Stratified fixed-k sampling: exactly k rows per stratum, chosen by
    * a deterministic hash order — the repeatable train/eval sampling a
    * data pipeline needs (same sample on every run, any cluster size, no
    * RNG state). One shuffle on the stratum key; the per-group top-k by
    * hash is a window row_number, which AQE executes as a partial
    * top-k per partition before the exchange. Ranking by
    * [[llm.CrossHash.hex60]] makes the oracle replay the SAME sample —
    * sampling decisions are portable across engines, so a DuckDB-side
    * audit of a Spark-drawn sample agrees row-for-row.
    */
  def sampleStratifiedK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy(col("hv"), $"c_custkey")
    Tables.customer(spark, dir)
      .withColumn("hv", expr(llm.CrossHash.hex60("cast(c_custkey as string)")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 4)
      .select($"c_mktsegment", $"rk", $"c_custkey", $"c_name")
      .orderBy($"c_mktsegment", $"rk")
  }

  /** NULL-ordering parity — the silent cross-engine divergence: Spark
    * defaults to NULLS FIRST on ASC, DuckDB to NULLS LAST, so any
    * limit/top-k over a nullable key silently selects DIFFERENT rows
    * unless the null position is spelled explicitly. Both legs pin an
    * explicit spelling (ASC NULLS FIRST / DESC NULLS LAST) under a
    * LIMIT, where the selected SET — not just its order — depends on
    * null placement. Nulls are injected deterministically (nullif), and
    * the leg tag makes the union's provenance part of the hash.
    */
  def sortNullsOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("st"),
        nullif($"o_orderpriority", lit("3-MEDIUM")).as("pri"))
    val nf = o.orderBy($"st".asc_nulls_first, $"pri".asc_nulls_first,
                       $"o_orderkey")
      .limit(50).withColumn("leg", lit("asc_nulls_first"))
    val nl = o.orderBy($"st".desc_nulls_last, $"pri".desc_nulls_last,
                       $"o_orderkey")
      .limit(50).withColumn("leg", lit("desc_nulls_last"))
    nf.union(nl).orderBy($"leg", $"o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_nulls_order" -> (sortNullsOrder _),
    "sample_stratified_k" -> (sampleStratifiedK _),
    "topk_global"      -> (topKGlobal _),
    "sort_multi_key"   -> (sortMultiKey _),
    "set_union"        -> (unionDistinct _),
    "set_intersect"    -> (intersectKeys _),
    "set_except"       -> (exceptKeys _),
    "set_except_all"   -> (exceptAllBrands _),
    "set_intersect_all" -> (intersectAllBrands _),
    "filter_pushdown"  -> (filterPushdown _)
  )

  def oracle: Map[String, String] = Map(
    "sort_nulls_order" ->
      """WITH o AS (
        |  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st,
        |    NULLIF(o_orderpriority, '3-MEDIUM') AS pri
        |  FROM orders),
        |nf AS (SELECT o_orderkey, st, pri, 'asc_nulls_first' AS leg
        |       FROM o ORDER BY st ASC NULLS FIRST, pri ASC NULLS FIRST,
        |                      o_orderkey LIMIT 50),
        |nl AS (SELECT o_orderkey, st, pri, 'desc_nulls_last' AS leg
        |       FROM o ORDER BY st DESC NULLS LAST, pri DESC NULLS LAST,
        |                      o_orderkey LIMIT 50)
        |SELECT * FROM nf UNION ALL SELECT * FROM nl
        |ORDER BY leg, o_orderkey""".stripMargin,
    "sample_stratified_k" ->
      s"""WITH ranked AS (
         |  SELECT c_mktsegment, c_custkey, c_name,
         |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
         |      ORDER BY ${llm.CrossHash.hex60Sql("CAST(c_custkey AS VARCHAR)")},
         |               c_custkey) AS rk
         |  FROM customer)
         |SELECT c_mktsegment, rk, c_custkey, c_name
         |FROM ranked WHERE rk <= 4
         |ORDER BY c_mktsegment, rk""".stripMargin,
    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "sort_multi_key" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal ASC, s_suppkey ASC""".stripMargin,
    "set_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY c_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT p_partkey FROM part WHERE p_size > 40
        |INTERSECT
        |SELECT l_partkey AS p_partkey FROM lineitem
        |ORDER BY p_partkey""".stripMargin,
    "set_except" ->
      """SELECT p_partkey FROM part
        |EXCEPT
        |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 45
        |ORDER BY p_partkey""".stripMargin,
    "set_except_all" ->
      """SELECT p_brand FROM part WHERE p_size <= 25
        |EXCEPT ALL
        |SELECT p_brand FROM part WHERE p_type = 'PROMO'
        |ORDER BY p_brand""".stripMargin,
    "set_intersect_all" ->
      """SELECT p_brand FROM part WHERE p_size <= 25
        |INTERSECT ALL
        |SELECT p_brand FROM part WHERE p_type = 'PROMO'
        |ORDER BY p_brand""".stripMargin,
    "filter_pushdown" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_size BETWEEN 10 AND 40
        |  AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
        |  AND p_name LIKE '%bolt%'
        |  AND p_type IS DISTINCT FROM '__none__'
        |ORDER BY p_partkey""".stripMargin
  )
}
