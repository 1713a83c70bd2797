package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy string matching: near-identical entity names via a BLOCKED
  * Levenshtein join — the entity-resolution shape (dedup of vendor /
  * product / author names) every curation stack eventually needs.
  *
  * Scale form: edit distance can never run all-pairs at 100 TB; the join
  * is blocked on a cheap equality key (here the 6-char name prefix) so
  * candidate pairs are generated per block — shuffle on the block key,
  * per-block candidates only, then the exact `levenshtein` filter on
  * candidates. Wider recall (typos in the prefix itself) comes from
  * adding more blocking keys (soundex, length band, token sort), each of
  * which is another equi-join — never a cartesian.
  *
  * Entity resolution matches DISTINCT names, never rows: the fixture has
  * 2000 parts over only 64 distinct names, so a row-level fuzzy join
  * would spend its whole budget on exact duplicates (quadratic in the
  * duplicate-group size — the hot-block degeneration). The pipeline
  * therefore canonicalizes first (name → min part key), exactly as a
  * production entity-resolution pass dedupes before pairwise work.
  *
  * The names are distinct color phrases, so the query PLANTS
  * near-matches (one-char-append variants of every 17th part,
  * identically in both engines) and the gate proves the planted pairs —
  * plus any natural ones — are found with exact distances.
  */
object Fuzzy extends QueryPack {

  def fuzzyNameMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir).select($"p_partkey", $"p_name")
    val variants = parts.filter($"p_partkey" % 17 === 0)
      .select(($"p_partkey" + 10000000L).as("p_partkey"),
              concat($"p_name", lit("x")).as("p_name"))
    // canonicalize: one row per distinct name, smallest key as its id
    val names = parts.union(variants)
      .groupBy($"p_name").agg(min($"p_partkey").as("pk"))
      // 6-char prefix block: short enough that the planted end-of-string
      // edits never change the block, long enough to keep blocks small
      .withColumn("blk", substring($"p_name", 1, 6))
    val a = names.select($"blk", $"pk".as("k1"), $"p_name".as("n1"))
    val b = names.select($"blk", $"pk".as("k2"), $"p_name".as("n2"))
    a.join(b, Seq("blk"))
      .filter($"k1" < $"k2")
      .withColumn("lev", levenshtein($"n1", $"n2").cast("long"))
      .filter($"lev" <= 2)
      .select($"k1", $"k2", $"n1", $"n2", $"lev")
      .orderBy($"k1", $"k2")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_name_match" -> (fuzzyNameMatch _)
  )

  def oracle: Map[String, String] = Map(
    "fuzzy_name_match" ->
      """WITH base AS (SELECT p_partkey, p_name FROM part),
        |vars AS (SELECT p_partkey + 10000000 AS p_partkey, p_name || 'x' AS p_name
        |         FROM part WHERE p_partkey % 17 = 0),
        |names AS (SELECT p_name, MIN(p_partkey) AS pk,
        |            substr(p_name, 1, 6) AS blk
        |          FROM (SELECT * FROM base UNION ALL SELECT * FROM vars)
        |          GROUP BY p_name)
        |SELECT x.pk AS k1, y.pk AS k2, x.p_name AS n1, y.p_name AS n2,
        |  levenshtein(x.p_name, y.p_name)::BIGINT AS lev
        |FROM names x JOIN names y ON x.blk = y.blk AND x.pk < y.pk
        |WHERE levenshtein(x.p_name, y.p_name) <= 2
        |ORDER BY k1, k2""".stripMargin
  )
}
