package graft.pipeline

import graft.SparkSpec
import graft.config.Conf
import org.apache.spark.sql.functions._

/** The round-11 config-drivable curation processors (near_dedup,
  * pii_scrub, lang_id, quality_score, gopher_filter): each wraps a
  * gate-proven operator core shared with the oracle-verified query
  * (TextStats/Dedup `private[graft]` from-frame entries), so these
  * tests pin the PIPELINE contract — params, schema, filter semantics,
  * pass-through of extra columns — not the operator math the gates
  * already hash-match against DuckDB.
  */
class CurationProcessorsSpec extends SparkSpec {

  import spark.implicits._

  private def resolve(id: String, params: Map[String, Any] = Map.empty) =
    ProcessorRegistry.resolve(spark, id, Conf(params))

  // 20 distinct-ish tokens — long enough that a one-word tail edit keeps
  // 3-gram Jaccard ≥ 0.6 (m = 18 shingles, inter = 15, union = 21 ⇒ 5/7)
  private val baseText = (1 to 19).map(i => s"tok$i").mkString(" ")

  test("near_dedup drops every doc with a smaller-id near-duplicate — " +
       "exact copy AND one-word-tail variant — and keeps distinct docs " +
       "with extra columns intact") {
    val in = Seq(
      (10L, baseText + " tail0", "keep"),
      (11L, baseText + " tail0", "copy"),          // exact dup of 10
      (12L, baseText + " CHANGED", "near"),        // near-dup of 10/11
      (13L, (100 to 119).map(i => s"other$i").mkString(" "), "distinct"))
      .toDF("doc_id", "text", "extra")
    val out = resolve("near_dedup").process(in).get
    assert(out.columns.toSeq === Seq("doc_id", "text", "extra"),
      "pass-through schema")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(10L, 13L))
    // the pairwise rule really came from the gate-proven pair pipeline:
    // the variant pair (10,12) must be a verified near-dup pair
    val pairs = graft.ops.llm.Dedup.nearDupPairsFrom(
        in.select($"doc_id", $"text"))
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 12L)), s"expected (10,12) in $pairs")
  }

  test("near_dedup honors id_column/text_column and rejects unknown params") {
    val in = Seq((1L, baseText), (2L, baseText)).toDF("id", "body")
    val out = resolve("near_dedup",
      Map("id_column" -> "id", "text_column" -> "body")).process(in).get
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L))
    val e = intercept[IllegalArgumentException] {
      resolve("near_dedup", Map("txt" -> "body"))
    }
    assert(e.getMessage.contains("unsupported params"))
  }

  test("pii_scrub redacts the gate's email/phone patterns in place and " +
       "counts the redactions") {
    val in = Seq(
      (1L, "reach me at alice9@mail.example.com or call 555-0142 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = resolve("pii_scrub").process(in).get
      .orderBy($"doc_id")
      .select($"text", $"n_pii_redacted").as[(String, Long)].collect()
    assert(out(0)._1 === "reach me at <EMAIL> or call <PHONE> now")
    assert(out(0)._2 === 2L)
    assert(out(1) === (("no pii here at all", 0L)))
  }

  test("lang_id annotates the profile-argmax prediction ('und' when no " +
       "profile word hits) and keep-list filters") {
    val in = Seq(
      (1L, "the a value of things"),       // en profile words
      (2L, "data table row data"),         // de
      (3L, "zzz qqq www")).toDF("doc_id", "text") // no hits -> und
    val tagged = resolve("lang_id").process(in).get
    assert(tagged.columns.toSeq === Seq("doc_id", "text", "predicted_lang"))
    val preds = tagged.select($"doc_id", $"predicted_lang")
      .as[(Long, String)].collect().toMap
    assert(preds === Map(1L -> "en", 2L -> "de", 3L -> "und"))
    val kept = resolve("lang_id", Map("keep" -> List("en")))
      .process(in).get.select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
    // deterministic argmax tie-break: equal scores resolve to the
    // alphabetically smaller language, exactly like the gate
    val tie = Seq((9L, "the data")).toDF("doc_id", "text")
    val t = resolve("lang_id").process(tie).get
      .select("predicted_lang").as[String].head()
    assert(t === "de")
  }

  test("quality_score appends the gate's additive 0-4 score (n_chars " +
       "recomputed from the text column) and min_score filters") {
    val good = (1 to 25).map(i => s"word$i").mkString(" ") // 25 distinct, >100 chars
    val junk = "a a a a a"
    val in = Seq((1L, good), (2L, junk)).toDF("doc_id", "text")
    val scored = resolve("quality_score").process(in).get
    val byDoc = scored.select($"doc_id", $"score")
      .as[(Long, Int)].collect().toMap
    assert(byDoc(1L) === 4, s"good doc: len=${good.length}")
    assert(byDoc(2L) === 0)
    val kept = resolve("quality_score", Map("min_score" -> "3"))
      .process(in).get.select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }

  test("gopher_filter: filter mode keeps passing docs and restores the " +
       "input schema; annotate mode exposes the per-rule booleans") {
    val pass = ((1 to 38).map(i => s"word$i") ++ Seq("the", "of", "the"))
      .mkString(" ") // 41 words, mean wlen in [3,10], all alpha, 3 stopwords
    val fail = "only nine short words here so it fails count"
    val in = Seq((1L, pass, "x"), (2L, fail, "y"))
      .toDF("doc_id", "text", "extra")
    val filtered = resolve("gopher_filter").process(in).get
    assert(filtered.columns.toSeq === Seq("doc_id", "text", "extra"),
      "filter mode restores the input schema")
    assert(filtered.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    val annotated = resolve("gopher_filter", Map("mode" -> "annotate"))
      .process(in).get
    val rows = annotated.select($"doc_id", $"passes", $"r_count")
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(rows === Map(1L -> ((true, true)), 2L -> ((false, false))),
      "annotate mode drops nothing and exposes the rule booleans")
    val e = intercept[IllegalArgumentException] {
      resolve("gopher_filter", Map("mode" -> "nonsense"))
    }
    assert(e.getMessage.contains("unknown mode"))
  }

  test("near_dedup fails FAST on a non-integral id column instead of " +
       "silently no-op'ing (cast-to-null would keep every duplicate)") {
    val in = Seq(("u1", baseText), ("u2", baseText)).toDF("id", "body")
    val e = intercept[IllegalArgumentException] {
      resolve("near_dedup", Map("id_column" -> "id", "text_column" -> "body"))
        .process(in)
    }
    assert(e.getMessage.contains("must be an integral type"))
  }

  test("near_dedup accepts decimal(p<=18,0) ids (exact long cast) and " +
       "case-mismatched id_column configs (analyzer resolution, not a " +
       "raw schema lookup)") {
    val in = Seq((java.math.BigDecimal.valueOf(1L), baseText),
                 (java.math.BigDecimal.valueOf(2L), baseText))
      .toDF("doc_id", "text")
      .select($"doc_id".cast("decimal(18,0)"), $"text")
    val out = resolve("near_dedup").process(in).get
    assert(out.count() === 1L, "decimal(18,0) ids dedup normally")
    val mixed = Seq((1L, baseText), (2L, baseText)).toDF("DocId", "text")
    val out2 = resolve("near_dedup", Map("id_column" -> "docid"))
      .process(mixed).get
    assert(out2.count() === 1L, "case-insensitive id resolution")
  }

  test("near_dedup accepts decimal(p>18,0) ids with in-range values " +
       "(the Oracle NUMBER(19)/unsigned-BIGINT JDBC mappings) but " +
       "raises LOUDLY at execution on a value beyond Long range — " +
       "cast('long') would null it and silently keep its duplicates " +
       "(ADVICE r11 + self-review r12 pass 4)") {
    val in = Seq((java.math.BigDecimal.valueOf(1L), baseText),
                 (java.math.BigDecimal.valueOf(2L), baseText))
      .toDF("doc_id", "text")
      .select($"doc_id".cast("decimal(20,0)"), $"text")
    assert(resolve("near_dedup").process(in).get.count() === 1L,
      "in-range decimal(20,0) ids dedup normally")
    val over = Seq((new java.math.BigDecimal("9300000000000000000"), baseText),
                   (java.math.BigDecimal.valueOf(2L), baseText))
      .toDF("doc_id", "text")
      .select($"doc_id".cast("decimal(20,0)"), $"text")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      resolve("near_dedup").process(over).get.count()
    }
    // under ANSI (Spark 4 default) the cast itself throws CAST_OVERFLOW
    // at any key evaluation; the guard's "exceeds Long range" branch is
    // the non-ANSI defense-in-depth — either way, LOUD, never a silent
    // no-op dedup
    assert(msgs(e).exists(m => m.contains("exceeds Long range") ||
        m.contains("CAST_OVERFLOW") || m.contains("cannot be cast")),
      msgs(e).mkString(";"))
  }

  test("near_dedup fails LOUDLY at execution on duplicate ids (same-id " +
       "rows never pair under d1 < d2 and merged shingles skew Jaccard " +
       "— ADVICE r11)") {
    val in = Seq((1L, baseText), (1L, baseText), (2L, "unrelated short doc"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      resolve("near_dedup").process(in).get.count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be unique")), msgs(e).mkString("; "))
  }

  test("pii_scrub's count equals the redactions actually applied when " +
       "email and phone matches overlap in the raw text") {
    // the email match consumes '555-0123@x.org'... the phone pattern
    // matched the raw text but NOT the post-email text — the count must
    // reflect the sequential replacement, not two independent censuses
    val in = Seq((1L, "ref 555-0123@x.org end")).toDF("doc_id", "text")
    val row = resolve("pii_scrub").process(in).get.head()
    val scrubbed = row.getAs[String]("text")
    val n = row.getAs[Long]("n_pii_redacted")
    val applied = "<EMAIL>|<PHONE>".r.findAllIn(scrubbed).length
    assert(n === applied, s"count $n vs applied $applied in '$scrubbed'")
  }

  test("lang_id tolerates an input that already carries a plang column " +
       "(prior labeler) without an ambiguous-reference failure") {
    val in = Seq((1L, "the a value", "stale")).toDF("doc_id", "text", "plang")
    val out = resolve("lang_id").process(in).get
    assert(out.select("predicted_lang").as[String].head() === "en")
    assert(out.select("plang").as[String].head() === "stale",
      "the user's own plang column passes through untouched")
  }

  test("gopher_filter filter mode is a pure predicate: input columns " +
       "colliding with the rule names survive, and the kept set equals " +
       "annotate-mode rows where passes") {
    val pass = ((1 to 38).map(i => s"word$i") ++ Seq("the", "of", "the"))
      .mkString(" ")
    val fail = "only nine short words here so it fails count"
    // stop_cnt planted on the INPUT — the quality_score stage emits this
    // exact name; filter mode previously clobbered-then-dropped it
    val in = Seq((1L, pass, 99L), (2L, fail, 98L))
      .toDF("doc_id", "text", "stop_cnt")
    val filtered = resolve("gopher_filter").process(in).get
    assert(filtered.columns.toSeq === Seq("doc_id", "text", "stop_cnt"))
    assert(filtered.select($"doc_id", $"stop_cnt").as[(Long, Long)]
      .collect().toSeq === Seq((1L, 99L)),
      "the input's own stop_cnt survives filter mode")
    // predicate/annotation equivalence on a mixed corpus (drop the
    // planted column so annotate's stop_cnt write is collision-free)
    val plain = in.select($"doc_id", $"text")
    val viaFilter = resolve("gopher_filter").process(plain).get
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaFlags = resolve("gopher_filter", Map("mode" -> "annotate"))
      .process(plain).get.where($"passes")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaFilter === viaFlags)
  }

  test("near_dedup law (seeded fuzz): exact copies are ALWAYS dropped " +
       "(identical MinHash signatures collide in every band) and every " +
       "drop is SOUND — a smaller-id partner with true 3-gram Jaccard " +
       ">= 0.6 exists, checked by an independent driver computation") {
    // completeness for NEAR (non-exact) pairs is probabilistic by design
    // (32 bands × 4 rows misses a 0.6-Jaccard pair ~1.2% of the time —
    // the standard LSH trade), so the law asserts the two properties
    // that ARE deterministic: exact-copy recall and drop soundness
    val rnd = new scala.util.Random(0xC0FFEE)
    val vocab = (1 to 40).map(i => s"w$i")
    def doc() = (1 to 8 + rnd.nextInt(20))
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 12).map(i => (i.toLong, doc()))
    val copies = base.take(4).map { case (id, t) => (id + 100L, t) }
    val all = base ++ copies
    val kept = resolve("near_dedup").process(all.toDF("doc_id", "text"))
      .get.select("doc_id").as[Long].collect().toSet
    val dropped = all.map(_._1).toSet -- kept
    assert(copies.map(_._1).toSet.subsetOf(dropped),
      "an exact copy must always be detected and dropped")
    def grams(t: String): Set[Seq[String]] = {
      val ws = t.split(" ").toSeq
      if (ws.size < 3) Set.empty else ws.sliding(3).map(_.toSeq).toSet
    }
    val byId = all.toMap
    dropped.foreach { d =>
      val gd = grams(byId(d))
      val sound = all.exists { case (o, t) =>
        o < d && {
          val go = grams(t)
          val i = gd.intersect(go).size
          val u = gd.union(go).size
          u > 0 && i * 5 >= u * 3
        }
      }
      assert(sound, s"doc $d dropped without a smaller true near-dup partner")
    }
  }

  test("the curation processors compose in one YAML-style fold: " +
       "gopher+quality gate, lang filter, pii scrub, near dedup") {
    val goodBody = ((1 to 40).map(i => s"word$i") ++ Seq("the", "of"))
      .mkString(" ")
    val in = Seq(
      (1L, goodBody + " the a value mail me bob1@x.example.com"),
      (2L, goodBody + " the a value mail me bob1@x.example.com"), // dup of 1
      (3L, "short junk"),                                         // fails gopher
      (4L, goodBody + " data table row data table row"))          // de -> filtered
      .toDF("doc_id", "text")
    val chain = Seq(
      resolve("gopher_filter"),
      resolve("lang_id", Map("keep" -> List("en"))),
      resolve("pii_scrub"),
      resolve("near_dedup"))
    val out = Pipeline.applyProcessors(in, chain).get
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L))
    val survivor = out.head()
    assert(!survivor.getAs[String]("text").contains("@"),
      "pii scrub ran before dedup")
    assert(survivor.getAs[Long]("n_pii_redacted") === 1L)
  }

  // --- r12 embedding-family processors (VERDICT r11 #4) ---

  /** 64-dim unit-ish vector with the given (index, value) components. */
  private def vec(xs: (Int, Double)*): Array[Double] = {
    val a = Array.fill(64)(0.0)
    xs.foreach { case (i, v) => a(i) = v }
    a
  }

  test("sem_dedup drops the MORE-centroid-similar member of each " +
       "semantic pair (exact copy: the tie goes against the higher id), " +
       "keeps isolated vectors, and passes extra columns through") {
    val va = Array.tabulate(64)(i => math.sin(i + 1.0))
    val vd = Array.tabulate(64)(i => math.cos(3.0 * i))
    val in = Seq((1L, va, "keep"), (2L, va, "dup"), (7L, vd, "iso"))
      .toDF("vec_id", "embedding", "tag")
    val out = resolve("sem_dedup", Map("threshold" -> "0.95")).process(in).get
    assert(out.select("vec_id").as[Long].collect().sorted.toSeq === Seq(1L, 7L))
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "tag"))
  }

  test("sem_dedup validates params fail-fast: threshold bounds and " +
       "format, unknown params, non-integral id") {
    val e1 = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("threshold" -> "1.5"))
    }
    assert(e1.getMessage.contains("[-1, 1]"))
    val e2 = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("threshold" -> "high"))
    }
    assert(e2.getMessage.contains("must be a number"))
    val e3 = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("thresh" -> "0.5"))
    }
    assert(e3.getMessage.contains("unsupported params"))
    val in = Seq(("k1", vec(0 -> 1.0))).toDF("vec_id", "embedding")
    val e4 = intercept[IllegalArgumentException] {
      resolve("sem_dedup").process(in)
    }
    assert(e4.getMessage.contains("integral"))
  }

  test("sem_dedup raises LOUDLY at execution on a wrong-dimension " +
       "embedding (the quantizer's cell loop would index past the " +
       "centroid array) and on duplicate ids") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val short = Seq((1L, Array(1.0, 2.0)), (2L, Array(1.0, 2.0)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      resolve("sem_dedup").process(short).get.count()
    }
    assert(msgs(e1).exists(_.contains("64-dimensional")), msgs(e1).mkString(";"))
    val dup = Seq((1L, vec(0 -> 1.0)), (1L, vec(1 -> 1.0)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      resolve("sem_dedup").process(dup).get.count()
    }
    assert(msgs(e2).exists(_.contains("must be unique")), msgs(e2).mkString(";"))
    // null embedding: size(null) is null, so without the explicit isNull
    // the guard would silently pass the row through (self-review r12)
    val nullEmb = Seq((1L, vec(0 -> 1.0)), (2L, null))
      .toDF("vec_id", "embedding")
    // consume the annotation column: a bare count() lets Catalyst
    // eliminate the left-outer join entirely (the aggregated right side
    // has provably unique keys), so the lazy guard would never run —
    // the guard contract is "fires when the stage's output is consumed"
    val e3 = intercept[Exception] {
      resolve("ann_topk").process(nullEmb).get.select(col("ann_topk")).collect()
    }
    assert(msgs(e3).exists(_.contains("64-dimensional")), msgs(e3).mkString(";"))
    // null id: never pairs, so its duplicates would silently survive
    val nullId = Seq((java.lang.Long.valueOf(1L), vec(0 -> 1.0)),
                     (null.asInstanceOf[java.lang.Long], vec(1 -> 1.0)))
      .toDF("vec_id", "embedding")
    val e4 = intercept[Exception] {
      resolve("sem_dedup").process(nullId).get.count()
    }
    assert(msgs(e4).exists(_.contains("must not be null")), msgs(e4).mkString(";"))
    // null ELEMENT inside a correctly-sized embedding: passes a
    // size-only check, folds into nrm as a skipped term, and would die
    // in the pair engine's decode naming no id (self-review r12 pass 2)
    val withNullElem = vec(0 -> 1.0).map(java.lang.Double.valueOf)
    withNullElem(7) = null
    val nullElem = Seq((1L, vec(0 -> 1.0).map(java.lang.Double.valueOf)),
                       (2L, withNullElem)).toDF("vec_id", "embedding")
    val e5 = intercept[Exception] {
      resolve("sem_dedup").process(nullElem).get.count()
    }
    assert(msgs(e5).exists(_.contains("no null elements")), msgs(e5).mkString(";"))
  }

  test("near_dedup raises LOUDLY on null ids even though its consuming " +
       "plan is pure SQL — the inferred isnotnull(doc_id) filters that " +
       "prune null keys below the payload guard now EVALUATE the raise, " +
       "because it rides the key's own definition (self-review r12 " +
       "pass 5)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val in = Seq((java.lang.Long.valueOf(10L), baseText + " a"),
                 (null.asInstanceOf[java.lang.Long], baseText + " b"),
                 (null.asInstanceOf[java.lang.Long], baseText + " b"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      resolve("near_dedup").process(in).get.count()
    }
    assert(msgs(e).exists(_.contains("must not be null")), msgs(e).mkString(";"))
  }

  test("near_dedup's duplicate-id guard fires even when the guilty docs " +
       "are too short to shingle — the raise rides the TEXT column, so " +
       "the shingle builder's minimum-token filter cannot be pushed " +
       "below it (self-review r12 pass 2)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val in = Seq((1L, "hi"), (1L, "hi"), (2L, baseText))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      resolve("near_dedup").process(in).get.count()
    }
    assert(msgs(e).exists(_.contains("must be unique")), msgs(e).mkString(";"))
  }

  test("sem_dedup and ann_topk plans execute the pair-engine reduce " +
       "exactly ONCE (plan pin for the self-review r12 finding: lazy " +
       "DAG sharing re-executes flatMapGroups per reference — the first " +
       "sem_dedup cut ran it 5x)") {
    val in = (0L until 8L).map { i =>
        (i, Array.tabulate(64)(d => math.sin(i * 64 + d + 1.0)))
      }.toDF("vec_id", "embedding")
    // count on the plan STRING: AdaptiveSparkPlanExec hides its input
    // plan from TreeNode.collect, so a node-type collect sees 0 nodes
    def nMapGroups(df: org.apache.spark.sql.DataFrame): Int =
      raw"\bMapGroups\b".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val sem = resolve("sem_dedup").process(in).get
    assert(nMapGroups(sem) === 1,
      s"sem_dedup plan must contain exactly one MapGroups:\n${sem.queryExecution.executedPlan}")
    val ann = resolve("ann_topk").process(in).get
    assert(nMapGroups(ann) === 1,
      s"ann_topk plan must contain exactly one MapGroups:\n${ann.queryExecution.executedPlan}")
  }

  test("the pair engine's withCentroidCos emission is BIT-EQUAL to the " +
       "gate's SQL centroidCosCol spelling (the keep policy must order " +
       "identically on both surfaces)") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 12).map { i =>
        (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.3))
      }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val pairs = graft.ops.llm.Dedup
      .embeddingPairs(corpus, thr = -1.0, sameCellOnly = true,
        withCentroidCos = true)
      .select($"i", $"j", $"ci", $"cj").collect()
    assert(pairs.nonEmpty, "fixture must produce same-cell pairs")
    val sqlCos = graft.ops.llm.Dedup.withIvfCell(corpus)
      .withColumn("cos_c", graft.ops.llm.Dedup.centroidCosCol)
      .select($"vec_id", $"cos_c").as[(Long, Double)].collect().toMap
    pairs.foreach { r =>
      assert(r.getDouble(2) === sqlCos(r.getLong(0)),
        s"ci for ${r.getLong(0)} drifted from the SQL spelling")
      assert(r.getDouble(3) === sqlCos(r.getLong(1)),
        s"cj for ${r.getLong(1)} drifted from the SQL spelling")
    }
  }

  test("ann_topk annotates each row with its rk-sorted same-cell " +
       "neighbors above the threshold; no-neighbor rows get an EMPTY " +
       "array, and k truncates") {
    // a=(e0), b=(e0+0.01 e1), c=(e0+0.1 e1): sims a·b 0.99995 > c·b
    // 0.99598 > c·a 0.99504; d=(e1) is below the 0.9 floor vs all
    val in = Seq(
      (1L, vec(0 -> 1.0)),
      (2L, vec(0 -> 1.0, 1 -> 0.01)),
      (3L, vec(0 -> 1.0, 1 -> 0.1)),
      (9L, vec(1 -> 1.0)))
      .toDF("vec_id", "embedding")
    val out = resolve("ann_topk",
        Map("k" -> "2", "threshold" -> "0.9")).process(in).get
    val got = out.select($"vec_id",
        expr("transform(ann_topk, x -> x.n_id)").as("ids"),
        expr("transform(ann_topk, x -> x.sim)").as("sims"))
      .as[(Long, Seq[Long], Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 === Seq(2L, 3L))
    assert(got(2L)._1 === Seq(1L, 3L))
    assert(got(3L)._1 === Seq(2L, 1L))
    assert(got(9L)._1 === Seq.empty, "below-threshold row gets empty array")
    // sims descend within each row's array (rk order)
    got.values.foreach { case (_, sims) =>
      assert(sims === sims.sorted.reverse)
    }
    val k1 = resolve("ann_topk",
        Map("k" -> "1", "threshold" -> "0.9")).process(in).get
      .where($"vec_id" === 1L)
      .select(expr("transform(ann_topk, x -> x.n_id)")).as[Seq[Long]].head()
    assert(k1 === Seq(2L), "k=1 truncates to the single best neighbor")
  }

  test("ann_topk PROCESSOR recall ladder on the fixture (VERDICT r13 " +
       "#5): recall@5 vs the cell-unrestricted brute force is strictly " +
       "monotone over nprobe 1 -> 2 -> 4 and EXACTLY 1.0 at nprobe = " +
       "IvfCells (all cells probed = exhaustive) — the numbers a YAML " +
       "user chooses breadth on") {
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val k = 5
    // ground truth: driver-side global brute-force top-5 by
    // (cos DESC, n_id ASC) — the same tie order as the engine
    val vecs = embs.select($"vec_id",
        $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val truth: Map[Long, Set[Long]] = vecs.map { case (q, vq) =>
      q -> vecs.filter(_._1 != q)
        .map { case (n, vn) => (n, dot(vq, vn) / (nrm(q) * nrm(n))) }
        .sortBy { case (n, c) => (-c, n) }.take(k).map(_._1).toSet
    }.toMap
    def recallAt(np: Int): Double = {
      val got = resolve("ann_topk",
          Map("k" -> k.toString, "nprobe" -> np.toString))
        .process(embs).get
        .select($"vec_id", expr("transform(ann_topk, x -> x.n_id)").as("ids"))
        .as[(Long, Seq[Long])].collect()
      val hits = got.map { case (q, ids) =>
        ids.toSet.intersect(truth(q)).size
      }.sum
      hits.toDouble / (truth.size * k)
    }
    val ladder = Seq(1, 2, 4).map(np => np -> recallAt(np))
    info("ann_topk processor recall@5 ladder: " +
      ladder.map { case (np, r) => f"nprobe=$np $r%.3f" }.mkString(" -> "))
    val Seq(r1, r2, r4) = ladder.map(_._2)
    assert(r1 < r2 && r2 < r4,
      s"recall must be strictly monotone in probe breadth, got $ladder")
    assert(r4 === 1.0,
      s"nprobe = IvfCells probes every cell — exhaustive, recall 1.0; got $r4")
  }

  test("embedding stages raise LOUDLY on an all-zero embedding (nrm = 0 " +
       "=> NaN cosines, the row silently never pairs) and on NaN/Inf " +
       "elements (they pass the null-element check but poison nrm) — " +
       "ADVICE r12") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val zero = Seq((1L, vec(0 -> 1.0)), (2L, Array.fill(64)(0.0)),
                   (3L, vec(0 -> 1.0)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      resolve("sem_dedup").process(zero).get.count()
    }
    assert(msgs(e1).exists(m => m.contains("positive finite") && m.contains("id 2")),
      msgs(e1).mkString(";"))
    val nan = Seq((1L, vec(0 -> 1.0)), (2L, vec(0 -> 1.0, 5 -> Double.NaN)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      resolve("ann_topk").process(nan).get.select(col("ann_topk")).collect()
    }
    assert(msgs(e2).exists(_.contains("positive finite")), msgs(e2).mkString(";"))
    val inf = Seq((1L, vec(0 -> 1.0)),
                  (2L, vec(0 -> 1.0, 5 -> Double.PositiveInfinity)))
      .toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      resolve("sem_dedup").process(inf).get.count()
    }
    assert(msgs(e3).exists(_.contains("positive finite")), msgs(e3).mkString(";"))
  }

  test("assume_unique_ids skips the duplicate-id census (no second " +
       "upstream execution; duplicate ids become the caller's contract) " +
       "but KEEPS the per-row null-id raise, and the guarded default " +
       "still matches it on healthy input — ADVICE r12 opt-out") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val healthy = Seq((10L, baseText + " a"), (11L, baseText + " a"),
                      (20L, (100 to 119).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val trusted = resolve("near_dedup", Map("assume_unique_ids" -> "true"))
      .process(healthy).get
    assert(trusted.select("doc_id").as[Long].collect().sorted.toSeq ===
      resolve("near_dedup").process(healthy).get
        .select("doc_id").as[Long].collect().sorted.toSeq)
    // the census aggregate is gone from the trusted plan
    assert(!trusted.queryExecution.optimizedPlan.toString.contains("_guilty"),
      s"census join must be skipped:\n${trusted.queryExecution.optimizedPlan}")
    // duplicate ids do NOT raise under the opt-out (documented contract)
    val dup = Seq((1L, baseText + " a"), (1L, baseText + " a"))
      .toDF("doc_id", "text")
    resolve("near_dedup", Map("assume_unique_ids" -> "true"))
      .process(dup).get.count() // must not throw
    // but a NULL id still raises — that guard is per-row, not a census
    val nullId = Seq((java.lang.Long.valueOf(1L), baseText + " a"),
                     (null.asInstanceOf[java.lang.Long], baseText + " b"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      resolve("near_dedup", Map("assume_unique_ids" -> "true"))
        .process(nullId).get.count()
    }
    assert(msgs(e).exists(_.contains("must not be null")), msgs(e).mkString(";"))
    // embedding stages expose the same knob
    val emb = Seq((1L, vec(0 -> 1.0)), (1L, vec(0 -> 1.0)))
      .toDF("vec_id", "embedding")
    resolve("sem_dedup", Map("assume_unique_ids" -> "true"))
      .process(emb).get.count() // duplicate ids tolerated by contract
    // an invalid value fails fast NAMING op and param (Conf.bool's bare
    // String.toBoolean said only "For input string" — r13 pass 2)
    val eBad = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("assume_unique_ids" -> "yes"))
    }
    assert(eBad.getMessage.contains(
      "sem_dedup: assume_unique_ids must be true or false"), eBad.getMessage)
  }

  // --- r13 nprobe (multi-probe) breadth knob (VERDICT r12 #1) ---

  /** Cross-cell near-duplicate fixture ([[EmbeddingFixtures]]): the
    * cell split is ASSERTED in each test, so quantizer drift fails
    * loudly instead of silently weakening the test.
    */
  private def crossCellPair(): (Array[Double], Array[Double]) =
    EmbeddingFixtures.crossCellPair()

  test("ann_topk nprobe=2 finds a cross-cell near-neighbor that the " +
       "single-probe default structurally misses, through the same " +
       "engine/guard cores") {
    val (a, b) = crossCellPair()
    val in = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    // precondition of the scenario: the pair straddles a cell boundary
    val cells = graft.ops.llm.Dedup.withIvfCell(
        in.select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v")))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(cells(1L) !== cells(2L),
      s"fixture must straddle a cell boundary, got $cells")
    def ids(params: Map[String, Any]): Map[Long, Seq[Long]] =
      resolve("ann_topk", params).process(in).get
        .select($"vec_id", expr("transform(ann_topk, x -> x.n_id)").as("ids"))
        .as[(Long, Seq[Long])].collect().toMap
    val single = ids(Map("k" -> "3"))
    assert(single(1L) === Seq.empty && single(2L) === Seq.empty,
      "single-probe must miss the cross-cell pair (else the fixture is wrong)")
    val multi = ids(Map("k" -> "3", "nprobe" -> "2"))
    assert(multi(1L) === Seq(2L) && multi(2L) === Seq(1L),
      s"nprobe=2 must recover the cross-cell neighbor, got $multi")
  }

  test("sem_dedup nprobe=2 drops one member of a cross-cell semantic " +
       "duplicate pair that single-probe keeps intact") {
    val (a, b) = crossCellPair()
    val in = Seq((1L, a, "x"), (2L, b, "y")).toDF("vec_id", "embedding", "tag")
    val single = resolve("sem_dedup", Map("threshold" -> "0.95"))
      .process(in).get.select("vec_id").as[Long].collect().sorted.toSeq
    assert(single === Seq(1L, 2L), "single-probe must keep both (cross-cell)")
    val multi = resolve("sem_dedup", Map("threshold" -> "0.95", "nprobe" -> "2"))
      .process(in).get.select("vec_id").as[Long].collect().sorted.toSeq
    assert(multi.size === 1 && Seq(1L, 2L).contains(multi.head),
      s"nprobe=2 must drop one member of the cross-cell pair, got $multi")
  }

  test("ann_topk at nprobe=2 matches the llm_ann_annotate_mp gate " +
       "bit-exactly on the fixture corpus (the processor IS the gate's " +
       "engine — VERDICT r12 #1 done-criterion), and the plans still " +
       "execute exactly ONE MapGroups reduce per probe stage") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val ann = resolve("ann_topk",
      Map("k" -> "3", "nprobe" -> "2")).process(emb).get
    def nMapGroups(df: org.apache.spark.sql.DataFrame): Int =
      raw"\bMapGroups\b".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(nMapGroups(ann) === 1,
      s"ann_topk nprobe=2 plan must contain exactly one MapGroups:\n${ann.queryExecution.executedPlan}")
    val sem = resolve("sem_dedup", Map("nprobe" -> "2")).process(emb).get
    assert(nMapGroups(sem) === 1,
      s"sem_dedup nprobe=2 plan must contain exactly one MapGroups:\n${sem.queryExecution.executedPlan}")
    val got = ann
      .select($"vec_id", explode($"ann_topk").as("t"))
      .select($"vec_id", $"t.rk", $"t.n_id", $"t.sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val gate = graft.ops.llm.Similarity.annAnnotateMultiProbe(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    // the processor's default threshold IS the gate's -inf floor
    // (self-review r13 pass 2: a -1.0 default could drop a cosine that
    // IEEE-rounds one ulp below -1.0 while the gate ranks it)
    assert(got === gate)
  }

  test("ann_topk and sem_dedup validate nprobe: floor and format " +
       "fail-fast at parse; the cap fails loudly at apply against the " +
       "RESOLVED cell count (K is corpus-scaled since r17, so it does " +
       "not exist at parse time — VERDICT r16 #1)") {
    val e1 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("nprobe" -> "0"))
    }
    assert(e1.getMessage.contains("nprobe must be >= 1"))
    val e3 = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("nprobe" -> "two"))
    }
    assert(e3.getMessage.contains("positive integer"))
    // the fixture corpus resolves the floor K = 4, so breadth 5 must
    // die in the engine naming the resolved cap — never silently run
    // as exhaustive
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val e2 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("k" -> "3", "nprobe" -> "5")).process(emb)
    }
    assert(e2.getMessage.contains("nprobe must be <= 4"), e2.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      resolve("sem_dedup", Map("nprobe" -> "5")).process(emb)
    }
    assert(e4.getMessage.contains("already exhaustive"), e4.getMessage)
  }

  // --- r13 cluster-exact semantic dedup, batch-only (VERDICT r12 #5) ---

  test("sem_dedup_clusters keeps exactly ONE representative of an " +
       "indirect-partner chain a~b~c where pairwise sem_dedup keeps " +
       "BOTH endpoints — the configuration where the two rules differ") {
    // cosθ = 0.9 => pair sims 0.9, indirect sim cos2θ = 0.62; thr 0.8
    // makes (a,b),(b,c) pairs but NOT (a,c); b (on the centroid
    // direction) is the most centroid-similar, so it loses both pairs
    val (a, b, c) = EmbeddingFixtures.indirectChain(0.9)
    val in = Seq((1L, a, "a"), (2L, b, "b"), (3L, c, "c"))
      .toDF("vec_id", "embedding", "tag")
    // precondition: all three share a cell (chain pairs are same-cell)
    val cells = graft.ops.llm.Dedup.withIvfCell(
        in.select($"vec_id",
          expr("transform(embedding, x -> cast(x as double))").as("v")))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(cells.values.toSet.size === 1,
      s"chain must live in one cell, got $cells")
    val pairwise = resolve("sem_dedup", Map("threshold" -> "0.8"))
      .process(in).get.select("vec_id").as[Long].collect().sorted.toSeq
    assert(pairwise === Seq(1L, 3L),
      "pairwise keeps both endpoints (b loses each of its pairs)")
    val out = resolve("sem_dedup_clusters", Map("threshold" -> "0.8"))
      .process(in).get
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "tag"),
      "pass-through schema")
    val cluster = out.select("vec_id").as[Long].collect().toSeq
    assert(cluster.size === 1 && Set(1L, 3L).contains(cluster.head),
      s"cluster-exact keeps ONE least-centroid-similar rep, got $cluster")
  }

  test("sem_dedup_clusters composes with nprobe: a cross-cell pair " +
       "invisible to same-cell candidates is resolved at nprobe=2") {
    val (a, b) = crossCellPair()
    val in = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val single = resolve("sem_dedup_clusters", Map("threshold" -> "0.95"))
      .process(in).get.select("vec_id").as[Long].collect().sorted.toSeq
    assert(single === Seq(1L, 2L), "same-cell candidates miss the pair")
    val multi = resolve("sem_dedup_clusters",
        Map("threshold" -> "0.95", "nprobe" -> "2"))
      .process(in).get.select("vec_id").as[Long].collect().toSeq
    assert(multi.size === 1 && Set(1L, 2L).contains(multi.head),
      s"nprobe=2 must resolve the cross-cell cluster, got $multi")
  }

  test("sem_dedup_clusters enforces the SINGLE-IN-FLIGHT-OUTPUT " +
       "contract (VERDICT r15 #2): one instance, two outputs built " +
       "before either is consumed — BOTH yield correct results (the " +
       "drop pin is released only once consumption is observed), and " +
       "the pins drain after consumption instead of accruing") {
    val (a, b, c) = EmbeddingFixtures.indirectChain(0.9)
    def mk(ids: (Long, Long, Long)) =
      Seq((ids._1, a, "a"), (ids._2, b, "b"), (ids._3, c, "c"))
        .toDF("vec_id", "embedding", "tag")
    val proc = resolve("sem_dedup_clusters", Map("threshold" -> "0.8"))
    def pins() = spark.sparkContext.getPersistentRDDs.keySet
    val base = pins()
    // build TWO outputs from the same instance with neither consumed —
    // pre-r16 the second process() released the first output's drop-set
    // pin and consuming out1 died with missing-block/FileNotFound
    val out1 = proc.process(mk((1L, 2L, 3L))).get
    val out2 = proc.process(mk((10L, 20L, 30L))).get
    val created = pins() -- base // the two invocations' surviving pins
    val r1 = out1.select("vec_id").as[Long].collect().toSeq
    assert(r1.size === 1 && Set(1L, 3L).contains(r1.head),
      s"first in-flight output must stay valid, got $r1")
    val r2 = out2.select("vec_id").as[Long].collect().toSeq
    assert(r2.size === 1 && Set(10L, 30L).contains(r2.head), s"out2: $r2")
    // both consumed: a third invocation observes that and releases both
    // drop pins — the residual stays bounded, same as the sequential
    // foreach_batch path (ReliableFaultSpec's exact-file-count law)
    val out3 = proc.process(mk((100L, 200L, 300L))).get
    val r3 = out3.select("vec_id").as[Long].collect().toSeq
    assert(r3.size === 1 && Set(100L, 300L).contains(r3.head), s"out3: $r3")
    // every pin the first two invocations left behind is gone
    // (unpersist is async — poll briefly)
    def stale() = pins().intersect(created)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (stale().nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(stale().isEmpty,
      s"consumed outputs' drop pins must drain, still resident: ${stale()}")
  }

  test("sem_dedup_clusters is BATCH-ONLY: fails fast on a streaming " +
       "frame (the star contraction runs driver actions), and validates " +
       "params like its pairwise sibling") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value as vec_id",
        "transform(sequence(1, 64), x -> cast(x as float)) as embedding")
    val e = intercept[IllegalArgumentException] {
      resolve("sem_dedup_clusters").process(stream)
    }
    assert(e.getMessage.contains("BATCH-ONLY"), e.getMessage)
    assert(e.getMessage.contains("foreach_batch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      resolve("sem_dedup_clusters", Map("thresh" -> "0.5"))
    }
    assert(e2.getMessage.contains("unsupported params"))
    // the nprobe cap fires at APPLY against the corpus-resolved cell
    // count since r17 (K no longer exists at parse time — VERDICT r16
    // #1); the fixture resolves the K = 4 floor
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val e3 = intercept[IllegalArgumentException] {
      resolve("sem_dedup_clusters", Map("nprobe" -> "9")).process(emb)
    }
    assert(e3.getMessage.contains("already exhaustive"), e3.getMessage)
  }

  test("ann_topk validates params fail-fast: k format and floor, " +
       "threshold bounds, unknown params, output-column collision") {
    val e1 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("k" -> "0"))
    }
    assert(e1.getMessage.contains("k must be >= 1"))
    val e2 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("k" -> "many"))
    }
    assert(e2.getMessage.contains("positive integer"))
    val e3 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("threshold" -> "-2"))
    }
    assert(e3.getMessage.contains("[-1, 1]"))
    val e4 = intercept[IllegalArgumentException] {
      resolve("ann_topk", Map("topk" -> "3"))
    }
    assert(e4.getMessage.contains("unsupported params"))
    val in = Seq((1L, vec(0 -> 1.0), "x"))
      .toDF("vec_id", "embedding", "ANN_TOPK")
    val e5 = intercept[IllegalArgumentException] {
      resolve("ann_topk").process(in)
    }
    assert(e5.getMessage.contains("already exists"))
  }
}
