package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data contracts — the expectation layer a curation or
  * warehouse pipeline gates a publish on ("row count in range", "key
  * unique", "column never null", "values in domain"). The design point
  * is COST: every registered expectation folds into ONE aggregate over
  * ONE scan — adding a check never adds a pass over the data, so a
  * 100 TB table pays the same single read for 1 check or 50. The report
  * is data (one row per check), not an exception: callers decide
  * whether a failed contract blocks the publish.
  *
  * Each check reduces to a pair of BIGINT aggregates (observed,
  * reference) compared post-aggregate, so partial aggregation and
  * map-side combine apply as usual. `Unique` uses count-distinct — the
  * one check with an Expand in its plan; the others are plain
  * conditional counts.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    /** (observed aggregate, pass condition over observed+total). */
    private[quality] def agg: Column
    private[quality] def pass(observed: Column, total: Column): Column
  }

  /** Total row count within [lo, hi]. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Expectation {
    val name = s"row_count_between_${lo}_$hi"
    private[quality] def agg: Column = count(lit(1))
    private[quality] def pass(o: Column, t: Column): Column =
      o >= lo && o <= hi
  }

  /** No NULLs in `col`. */
  final case class NotNull(col: String) extends Expectation {
    val name = s"not_null_$col"
    private[quality] def agg: Column = count(expr(col))
    private[quality] def pass(o: Column, t: Column): Column = o === t
  }

  /** `cols` form a unique key. */
  final case class Unique(cols: Seq[String]) extends Expectation {
    val name = s"unique_${cols.mkString("_")}"
    private[quality] def agg: Column =
      countDistinct(expr(cols.head), cols.tail.map(expr): _*)
    private[quality] def pass(o: Column, t: Column): Column = o === t
  }

  /** Every non-NULL value of `col` inside the literal domain. */
  final case class ValuesIn(col: String, domain: Seq[String])
      extends Expectation {
    val name = s"values_in_$col"
    private[quality] def agg: Column =
      sum(when(expr(col).isNull ||
               expr(col).isin(domain.map(lit): _*), 0L).otherwise(1L))
    private[quality] def pass(o: Column, t: Column): Column = o === 0L
  }

  /** Every non-NULL value of `col` satisfies `col >= 0`. */
  final case class NonNegative(col: String) extends Expectation {
    val name = s"non_negative_$col"
    private[quality] def agg: Column =
      sum(when(expr(col).isNull || expr(col) >= 0, 0L).otherwise(1L))
    private[quality] def pass(o: Column, t: Column): Column = o === 0L
  }

  /** Violation count of an arbitrary row predicate (NULL counts as a
    * violation — contracts are three-valued-logic-hostile on purpose).
    */
  final case class Predicate(name: String, holds: Column) extends Expectation {
    private[quality] def agg: Column =
      sum(when(coalesce(holds, lit(false)), 0L).otherwise(1L))
    private[quality] def pass(o: Column, t: Column): Column = o === 0L
  }

  /** One row per expectation: (check, passed, observed, total_rows).
    * `observed` is the check's own aggregate (count, distinct count, or
    * violation count — see each check's Scaladoc).
    */
  def report(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "no expectations given")
    require(checks.map(_.name).distinct.size == checks.size,
            "duplicate expectation names")
    val total = count(lit(1)).as("graft_total")
    val aggs = checks.map(c => c.agg.cast("long").as(s"graft_o_${c.name}"))
    val one = df.agg(total, aggs: _*)
    val t = col("graft_total")
    val rows = checks.map { c =>
      val o = col(s"graft_o_${c.name}")
      struct(lit(c.name).as("check"),
             coalesce(c.pass(o, t), lit(false)).as("passed"),
             coalesce(o, lit(0L)).as("observed"),
             t.as("total_rows")).as("r")
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
