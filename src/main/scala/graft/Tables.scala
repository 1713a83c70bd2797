package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Accessors for the driver-generated fixture tables (see TESTDATA.md /
  * FIXTURES.md). Every query in [[SparkEntry.queries]] reads its inputs
  * through these so the scan path (parquet, column-pruned, filter-pushed)
  * is uniform.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is parquet timestamp[ns]; with the nanosAsLong session flag
    * it arrives as a raw ns long, from which `ts_utc` re-derives a standard
    * µs timestamp. The ns→µs conversion MUST be integral division (`div`):
    * `/` casts both sides to double, and 2024-era ns values (~1.7e18)
    * exceed double's 2^53 exact range, silently corrupting the microsecond.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn(
      "ts_utc", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every fixture table as a temp view so plain `spark.sql`
    * works over the catalog — the `spark.sql(...)` entry surface. Views
    * are lazy; registration costs nothing until a query scans one.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}

/** Determinism helpers for DuckDB-oracle hash matching.
  *
  * Floating-point aggregation is order-dependent, and Spark's partial
  * aggregation order differs run-to-run and engine-to-engine. Accumulating
  * in exact decimal arithmetic and casting the final value to double makes
  * the result bit-identical in any engine, in any order (decimal addition
  * is associative and exact; a double can never sit exactly on a decimal
  * half-way rounding boundary at scale <= 6, since 5e-7 has a 5^-7 factor
  * and binary fractions cannot). SURVEY.md §7 risk 2.
  *
  * Residual risk (documented, accepted): the two engines round double →
  * decimal differently — Spark rounds the double's SHORTEST decimal
  * representation (BigDecimal via Double.toString, HALF_UP), DuckDB rounds
  * the exact binary value. For a *derived* double (e.g. price·(1−disc))
  * whose shortest repr terminates in exactly 7 fractional digits ending in
  * 5, the two can disagree by 1e-6 before summation. No fixture value at
  * the verified scale factors hits this (gate is green end-to-end); if a
  * larger SF ever does, round to 6dp in double space on BOTH sides before
  * the decimal cast.
  */
object Det {
  private val Dec = DecimalType(30, 6)

  /** Deterministic double-valued sum: exact decimal accumulation. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Deterministic double-valued average. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(c)

  /** Oracle-SQL (DuckDB) twin of [[dsum]]. */
  def sqlSum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"

  /** Oracle-SQL twin of [[davg]]. */
  def sqlAvg(e: String): String =
    s"(CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / COUNT($e))"
}
