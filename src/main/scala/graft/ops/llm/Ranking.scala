package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.QueryPack

/** Relevance ranking and language-model statistics over the `documents`
  * corpus — the retrieval/statistics half of a training-data pipeline
  * (score documents for mixture selection, rank terms for vocabulary and
  * index construction, estimate n-gram statistics for perplexity-style
  * quality filters).
  *
  * Cross-engine exactness discipline: every floating-point value emitted
  * here is produced by single correctly-rounded IEEE-754 ops (+ − × ÷)
  * over exactly-representable integer inputs, in an identical operand
  * order on both engines — no transcendentals (`ln` differs by ulps
  * between libm implementations, so the classic log-idf is replaced by
  * rational idf forms that rank the same way and replay bit-identically).
  */
object Ranking extends QueryPack {

  /** BM25 probe terms — high-frequency members of the fixture vocabulary. */
  private val bm25Terms = Seq("join", "hash", "row")
  private val k1 = "1.2"
  private val b  = "0.75"

  private def toks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
  }

  /** llm_tfidf — top-3 terms per document by tf × idf with linear idf
    * N/df (rarity weighting; one division + one multiplication, both
    * correctly rounded → bit-identical across engines). The term/document
    * matrix is two shuffles (tf by (doc,term), df by term); df and N are
    * tiny aggregates broadcast back, so the corpus streams once however
    * large it is.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t  = toks(spark, dir)
    val tf = t.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = t.groupBy($"w").agg(countDistinct($"doc_id").as("df"))
    val n  = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val rn = Window.partitionBy($"doc_id").orderBy($"score".desc, $"w")
    tf.join(broadcast(df), "w").crossJoin(broadcast(n))
      .withColumn("score",
        expr("CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"))
      .withColumn("rn", row_number().over(rn).cast("long"))
      .where($"rn" <= 3)
      .select($"doc_id", $"w", $"tf", $"df", $"score", $"rn")
      .orderBy($"doc_id", $"rn")
  }

  /** Shared BM25 per-(doc, term) score expression — written once and
    * rendered into BOTH engines' SQL so the operand order is textually
    * identical. Rational idf (N − df + ½)/(df + ½) replaces log-idf.
    */
  private def bm25Score(dl: String): String =
    s"((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
      s" * ((CAST(tf AS DOUBLE) * ($k1 + 1.0)) / " +
      s"(CAST(tf AS DOUBLE) + $k1 * ((1.0 - $b) + $b * (CAST($dl AS DOUBLE) / avgdl))))"

  /** llm_bm25 — rank the corpus against a fixed term query. Document
    * length normalization uses avgdl = Σdl / N (exact integer sum < 2^53
    * → the double division is a single rounding on both engines). The
    * per-term scores are summed in a FIXED order (one conditional-max per
    * term, added left-to-right), then global top-20 via TakeOrderedAndProject.
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("dl"))
    val t  = toks(spark, dir).where($"w".isin(bm25Terms: _*))
    val tf = t.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = t.groupBy($"w").agg(countDistinct($"doc_id").as("df"))
    val n  = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"), sum(size(split($"text", " ")).cast("long")).as("sum_dl"))
      .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
    val scored = docs.join(tf, "doc_id")
      .join(broadcast(df), "w").crossJoin(broadcast(n))
      .withColumn("s", expr(bm25Score("dl")))
    val terms = bm25Terms.map(w =>
      coalesce(max(when($"w" === w, $"s")), lit(0.0)))
    scored.groupBy($"doc_id")
      .agg(terms.reduceLeft(_ + _).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", $"score")
  }

  /** llm_bigram_lm — bigram counts and conditional next-token probability
    * P(w2|w1) = c(w1,w2)/c(w1·), top-3 continuations per head token.
    * Pure integer counting plus one exact division; the bigram explode is
    * linear in corpus size and the aggregate is two shuffles on small key
    * spaces (vocab², vocab).
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.documents(spark, dir)
      .select(split($"text", " ").as("t"))
      .where(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")).as("p"))
      .select($"p.w1", $"p.w2")
    val c2 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val rn = Window.partitionBy($"w1").orderBy($"c2".desc, $"w2")
    c2.join(broadcast(c1), "w1")
      .withColumn("p", expr("CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)"))
      .withColumn("rn", row_number().over(rn).cast("long"))
      .where($"rn" <= 3)
      .select($"w1", $"w2", $"c2", $"c1", $"p", $"rn")
      .orderBy($"w1", $"rn")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_tfidf"     -> (tfidf _),
    "llm_bm25"      -> (bm25 _),
    "llm_bigram_lm" -> (bigramLm _)
  )

  private val termList = bm25Terms.map(w => s"'$w'").mkString(", ")

  def oracle: Map[String, String] = Map(
    "llm_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY w),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, w, tf, df,
        |    CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |  FROM tf JOIN df USING (w) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score DESC, w) AS rn FROM s)
        |SELECT doc_id, w, tf, df, score, rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "llm_bm25" ->
      s"""WITH docs AS (
         |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
         |t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |q AS (SELECT doc_id, w FROM t WHERE w IN ($termList)),
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM q GROUP BY doc_id, w),
         |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY w),
         |n AS (
         |  SELECT COUNT(*) AS n_docs,
         |    SUM(len(string_split(text, ' ')))::BIGINT AS sum_dl FROM documents),
         |n2 AS (SELECT n_docs, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl FROM n),
         |scored AS (
         |  SELECT d.doc_id, tf.w, ${bm25Score("d.dl")} AS s
         |  FROM docs d JOIN tf ON d.doc_id = tf.doc_id
         |  JOIN df ON tf.w = df.w CROSS JOIN n2),
         |agg AS (
         |  SELECT doc_id,
         |    ${bm25Terms.map(w => s"COALESCE(MAX(CASE WHEN w = '$w' THEN s END), 0.0)")
                        .mkString(" + ")} AS score
         |  FROM scored GROUP BY doc_id)
         |SELECT doc_id, score FROM agg
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "llm_bigram_lm" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT t, generate_subscripts(t, 1) AS i FROM toks),
        |big AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx WHERE i < len(t)),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
        |j AS (
        |  SELECT c2.w1, c2.w2, c2.c2, c1.c1,
        |    CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE) AS p
        |  FROM c2 JOIN c1 ON c2.w1 = c1.w1),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY w1 ORDER BY c2 DESC, w2) AS rn FROM j)
        |SELECT w1, w2, c2, c1, p, rn
        |FROM r WHERE rn <= 3 ORDER BY w1, rn""".stripMargin
  )
}
