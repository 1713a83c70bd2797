package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch MERGE (upsert/delete apply) — the warehouse "MERGE INTO" /
  * CDC-apply operator: a target table merged with a changeset of
  * updates, inserts, and deletes in ONE pass.
  *
  * Physical form: one full-outer equi-join of target and changeset on
  * the key, then per-row CASE routing — exactly the shape Delta/Iceberg
  * MERGE plans under the hood. One shuffle on the key (or zero with
  * bucketed tables — see SkewSpec's co-located join); never a per-row
  * lookup loop. Deletes drop, updates overwrite, inserts append,
  * untouched target rows pass through.
  *
  * The changeset here is DERIVED deterministically from the fixture
  * (key mod classes) so both engines construct the identical changeset
  * without side files.
  */
object Merge extends QueryPack {

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val target = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    val base = Tables.orders(spark, dir)
    val updates = base.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", ($"o_totalprice" + 100.0).as("price"),
              lit("U").as("status"), lit("update").as("op"))
    // insert keys are NEGATED (-k - 1): provably disjoint from the real
    // keyspace at ANY scale factor, unlike an additive offset which a
    // large-enough fixture would collide with (silently turning inserts
    // into destructive overwrites)
    val inserts = base.filter($"o_orderkey" % 1000 === 0)
      .select((-$"o_orderkey" - 1L).as("o_orderkey"),
              $"o_totalprice".as("price"), lit("N").as("status"),
              lit("insert").as("op"))
    val deletes = base.filter($"o_orderkey" % 10 === 7)
      .select($"o_orderkey", lit(0.0).as("price"), lit("").as("status"),
              lit("delete").as("op"))
    val changes = updates.union(inserts).union(deletes)
    target.join(changes, Seq("o_orderkey"), "full_outer")
      .filter(coalesce($"op", lit("")) =!= "delete")
      .select($"o_orderkey",
        when($"op" === "update", $"price")
          .when($"op" === "insert", $"price")
          .otherwise($"o_totalprice").as("o_totalprice"),
        when($"op" === "update", $"status")
          .when($"op" === "insert", $"status")
          .otherwise($"o_orderstatus").as("o_orderstatus"),
        coalesce($"op", lit("kept")).as("src"))
      .orderBy($"o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> (mergeUpsert _)
  )

  def oracle: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey, o_totalprice + 100.0 AS price,
        |         'U' AS status, 'update' AS op
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1, o_totalprice, 'N', 'insert'
        |  FROM orders WHERE o_orderkey % 1000 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 0.0, '', 'delete'
        |  FROM orders WHERE o_orderkey % 10 = 7)
        |SELECT COALESCE(t.o_orderkey, c.o_orderkey) AS o_orderkey,
        |  CASE WHEN c.op IN ('update', 'insert') THEN c.price
        |       ELSE t.o_totalprice END AS o_totalprice,
        |  CASE WHEN c.op IN ('update', 'insert') THEN c.status
        |       ELSE t.o_orderstatus END AS o_orderstatus,
        |  COALESCE(c.op, 'kept') AS src
        |FROM orders t FULL OUTER JOIN changes c ON t.o_orderkey = c.o_orderkey
        |WHERE COALESCE(c.op, '') <> 'delete'
        |ORDER BY o_orderkey""".stripMargin
  )
}
