package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-8 curation additions: sliding-window chunking with
  * overlap, containment-ratio decontamination, code-switch detection, and
  * incremental IVF index add. The gates hash-match DuckDB replays; these
  * pin the semantic properties the replays can't express — coverage and
  * overlap invariants, ratio bounds, the benchmark-doc planting law, and
  * old-index immutability under an incremental add.
  */
class ChunkContamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("span_corrupt: mask rate lands near 15%, spans never exceed the " +
       "masked count, and the corrupted input reconstructs exactly — " +
       "unmasked tokens in order with one numbered sentinel per span") {
    import spark.implicits._
    val out = TextStats.spanCorrupt(spark, dir)
    assert(out.count() > 0)
    // a span needs ≥1 masked token; ppm is the exact integer ratio
    assert(out.filter($"n_spans" > $"n_masked").count() === 0L)
    assert(out.filter(
      $"ppm_masked" =!= expr("(1000000 * n_masked) div n_tokens"))
      .count() === 0L)
    // corpus-wide mask rate: derandomized 3/20 in expectation, so the
    // realized rate over ~60k tokens must sit well inside [10%, 20%]
    val r = out.agg(sum($"n_masked").cast("double") / sum($"n_tokens"))
      .head().getDouble(0)
    assert(r > 0.10 && r < 0.20, s"mask rate $r outside sanity band")
    // independent reconstruction for a slice of docs: rebuild the input
    // by walking tokens with the same mask rule and compare checksums
    val toks = graft.Tables.documents(spark, dir).filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("masked", expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), '_', " +
          "cast(pos div 3 as string))), 1, 4), 16, 10) as bigint) % 20 < 3"))
      .collect().groupBy(_.getLong(0))
    val rebuilt = toks.map { case (doc, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      val sb = new StringBuilder
      var span = 0; var prevMasked = false
      sorted.foreach { row =>
        val masked = row.getBoolean(3)
        if (!masked) { if (sb.nonEmpty) sb += ' '; sb ++= row.getString(2) }
        else if (!prevMasked) {
          if (sb.nonEmpty) sb += ' '; sb ++= s"<X$span>"; span += 1
        }
        prevMasked = masked
      }
      doc -> java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val gate = out.filter($"doc_id" < 50)
      .select($"doc_id", $"input_checksum").collect()
      .map(row => row.getLong(0) -> row.getString(1)).toMap
    assert(rebuilt.size === gate.size)
    rebuilt.foreach { case (doc, sum) =>
      assert(gate(doc) === sum, s"doc $doc input checksum mismatch")
    }
  }

  test("contamination_ratio flags the planted benchmark docs' own grams " +
       "at 1000000 ppm when a benchmark doc is replayed as corpus, and " +
       "ppm is within [0, 1000000] everywhere") {
    import spark.implicits._
    val out = TextStats.contaminationRatio(spark, dir)
    assert(out.filter($"ppm" < 0 || $"ppm" > 1000000).count() === 0L)
    assert(out.filter($"n_shared" > $"n_grams").count() === 0L)
    // flag threshold is exactly the ppm rule
    assert(out.filter(($"ppm" >= 100000) =!= $"flagged").count() === 0L)
    // a corpus doc that IS a benchmark doc (identical text) must be
    // fully contained: synthesize by running the op's own pieces
    val sh = Dedup.shingles(spark, dir, 4, distinct = true)
    val bench = sh.filter($"doc_id" < 20).select($"s").distinct()
    val self = sh.filter($"doc_id" < 20)
      .join(bench, Seq("s"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("hit"))
    val tot = sh.filter($"doc_id" < 20)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    assert(self.join(tot, Seq("doc_id")).filter($"hit" =!= $"n").count() === 0L)
  }

  test("code_switch: n_langs counts exactly the distinct segment labels, " +
       "langs string agrees with n_langs, and single-segment docs are " +
       "never code-switched") {
    import spark.implicits._
    val out = TextStats.codeSwitch(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(size(split($"langs", ",")) =!= $"n_langs").count() === 0L)
    assert(out.filter($"code_switched" =!= ($"n_langs" >= 2)).count() === 0L)
    assert(out.filter($"n_segments" === 1 && $"code_switched").count() === 0L)
    // segment count follows the 20-token width law
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    assert(out.join(docs, Seq("doc_id"))
      .filter($"n_segments" =!= expr("(n + 19) div 20")).count() === 0L)
  }

  test("ivf_add: old-index census is untouched by the batch (equals the " +
       "direct old-side census), every arrival lands in exactly one " +
       "existing cell, and totals reconcile") {
    import spark.implicits._
    val out = Similarity.ivfAdd(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val nOld = emb.filter($"vec_id" % 10 =!= 0).count()
    val nNew = emb.filter($"vec_id" % 10 === 0).count()
    val sums = out.agg(sum($"n_old").as("o"), sum($"n_added").as("a"))
      .head()
    assert(sums.getLong(0) === nOld)
    assert(sums.getLong(1) === nNew)
    // added ids are exactly the batch ids (each assigned once)
    assert(out.filter($"n_added" > 0)
      .filter($"first_added" % 10 =!= 0 || $"last_added" % 10 =!= 0)
      .count() === 0L)
    // frozen-centroid proof: m_dim0 comes from the TRAINED centroids,
    // which differ from the md5 seed planes for every populated cell
    val seeds = (0 until 4).map { c =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ivf_${c}_0".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16).toDouble / 576460752303423488.0 - 1.0
    }.toSet
    val m0s = out.select($"m_dim0").collect().map(_.getDouble(0)).toSet
    assert(m0s.intersect(seeds).isEmpty)
  }
}
