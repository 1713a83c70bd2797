package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting correctness: salted plans must produce EXACTLY the unsalted
  * results (salting is a physical rewrite, never a semantic one), and the
  * salt must be deterministic (task retries re-salt identically).
  * Also: partition-pruned scans over partitioned layouts.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 1 hot key with 10k rows + 100 cold keys
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toLong)) ++
    (1 to 100).flatMap(k => (1 to 10).map(i => (s"cold_$k", i.toLong)))
  ).toDF("k", "v")

  private lazy val dim =
    (Seq("hot") ++ (1 to 100).map(k => s"cold_$k")).zipWithIndex
      .map { case (k, i) => (k, s"dim_$i") }.toDF("k", "attr")

  test("salted equi-join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).select($"k", $"v", $"attr")
    val salted = Skew.saltedEquiJoin(skewed, dim, "k", saltFactor = 8)
      .select($"k", $"v", $"attr")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted two-phase count equals plain groupBy count") {
    val plain = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(skewed, "k", saltFactor = 8)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("gated salted aggregation equals the plain one-stage aggregate") {
    val dir = "/root/testdata/sf0.001"
    val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
    val plain = graft.Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(Dec)).cast("double").as("total"))
    val salted = Skew.saltedAggQ(spark, dir)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("gated salted join rollup equals the plain join's rollup") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), graft.Det.dsum($"o_totalprice").as("total"))
    val salted = Skew.saltedJoinQ(spark, dir)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val s1 = skewed.select(Skew.saltOf(8, $"k", $"v").as("s")).collect().toSeq
    val s2 = skewed.select(Skew.saltOf(8, $"k", $"v").as("s")).collect().toSeq
    assert(s1 === s2)
    val distinctSalts = skewed.filter($"k" === "hot")
      .select(Skew.saltOf(8, $"k", $"v")).distinct().count()
    assert(distinctSalts === 8L) // the hot key actually spreads
  }

  test("jaccard df-cap: an adversarial hot shingle is dropped from the index, " +
       "similar pairs on cold shingles survive") {
    // 200 docs all share ONE hot shingle (df = 200): uncapped, the
    // inverted-index self-join would generate 200·199/2 = 19900 pairs
    // from that shingle alone. Docs 0 and 1 additionally share 9 of 10
    // cold shingles (J = 9/11 over the capped universe).
    val hot = (0 until 200).map(d => (d.toLong, "the hot stop shingle"))
    val cold = (0 until 200).flatMap { d =>
      (0 until 10).map { i =>
        val shard = if (d <= 1 && i < 9) s"shared_$i" else s"doc${d}_s$i"
        (d.toLong, shard)
      }
    }
    val sh = (hot ++ cold).toDF("doc_id", "s")
    val out = graft.ops.llm.Dedup.jaccardPairs(sh, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the only qualifying pair is (0, 1); inter = 9 shared cold shingles,
    // uni = 10 + 10 - 9 (hot shingle excluded from sizes and intersections)
    assert(out.toSeq === Seq((0L, 1L, 9L, 11L)))
    // and the capped index generates NO candidate pair through the hot
    // shingle: every other doc pair shares only the hot shingle, so with
    // the cap they never meet in the join at all
  }

  test("census-driven df cap (selectDfCap): perturbing the duplicate " +
       "structure 10x keeps candidate-pair fanout within the documented " +
       "budget with NO constant edits, and the cap tightens by itself") {
    import graft.ops.llm.Dedup
    def corpus(copies: Int) =
      (0 until copies).flatMap { c =>
        (0 until 40).flatMap { d =>
          // 10 doc-specific shingles + 3 cross-doc boilerplate shingles
          // per doc; copies REUSE the shingle values, so every document
          // frequency multiplies by `copies` — the duplicate-structure
          // perturbation a fixed cap can't follow
          (0 until 10).map(i => ((c * 1000 + d).toLong, s"doc${d}_s$i")) ++
            (0 until 3).map(i => ((c * 1000 + d).toLong, s"boiler_$i"))
        }
      }.toDF("doc_id", "s")
    val caps = Seq(1, 10).map { m =>
      val sh = corpus(m)
      val cap = Dedup.selectDfCap(sh, col("s"))
      val rows = sh.count()
      val fanout = sh.groupBy($"s").agg(count(lit(1)).as("df"))
        .where($"df" <= cap)
        .agg(coalesce(sum($"df" * $"df"), lit(0L))).head().getLong(0)
      // the budget IS the rule: join output ≤ 32× its input, any corpus
      assert(fanout <= 32L * rows, s"m=$m cap=$cap fanout=$fanout rows=$rows")
      cap
    }
    assert(caps(1) < caps(0),
      s"10x duplication must TIGHTEN the cap (got ${caps(0)} -> ${caps(1)})")
  }

  test("jaccardPairsAuto: the census-chosen cap still finds the planted " +
       "near-dup pair while excluding the corpus-wide hot shingles") {
    import graft.ops.llm.Dedup
    // 3 hot shingles × 200 docs: Σdf² = 120k against a 32×2600 = 83.2k
    // budget, so the census rule must exclude the df=200 bucket — while
    // keeping the df=2 bucket the planted pair lives in
    val hot = (0 until 200).flatMap(d =>
      (0 until 3).map(h => (d.toLong, s"hot stop shingle $h")))
    val cold = (0 until 200).flatMap { d =>
      (0 until 10).map { i =>
        val shard = if (d <= 1 && i < 9) s"shared_$i" else s"doc${d}_s$i"
        (d.toLong, shard)
      }
    }
    val sh = (hot ++ cold).toDF("doc_id", "s")
    val out = Dedup.jaccardPairsAuto(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 1L, 9L, 11L)))
  }

  test("winnowPairsAutoFrom: the census-chosen cap prunes corpus-wide " +
       "boilerplate fingerprints by itself and still reports the " +
       "planted copy pair — no hand-tuned constant in the loop") {
    import graft.ops.llm.TextStats
    // deterministic gibberish so every doc's unique section is unique
    def gib(seed: Long, n: Int): String = {
      var s = seed
      (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ('a' + ((s >>> 33) % 26)).toChar
      }.mkString
    }
    val boiler = gib(999L, 400)  // shared by ALL docs: df = ndocs
    val passage = gib(777L, 400) // shared by docs 0 and 1 only: df = 2
    val docs = (0 until 200).map { d =>
      val text =
        if (d <= 1) boiler + passage + gib(d, 200)
        else boiler + gib(d, 200)
      (d.toLong, text)
    }.toDF("doc_id", "text")
    // the census must tighten the cap BELOW the boilerplate df (200) on
    // its own — and in this corpus below even the pinned gate cap (50)
    val cap = graft.ops.llm.Dedup.selectDfCap(
      TextStats.winnowSelected(docs), col("wmin"))
    assert(cap < 50, s"census cap should undercut the pinned 50, got $cap")
    val out = TextStats.winnowPairsAutoFrom(docs)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L)),
      s"expected exactly the planted pair, got ${out.take(5)}")
  }

  test("bucketed tables join WITHOUT a shuffle (co-located join — the " +
       "pre-partitioning story for repeated 100TB joins)") {
    // Bucketing pays the shuffle ONCE at write time; every subsequent
    // join on the bucket key reads co-located buckets and plans a
    // sort-merge join with NO Exchange on either side.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("bk_orders")
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("bk_lineitem")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_lineitem")
        .join(spark.table("bk_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // the join reads both bucketed sides in place: NO exchange
      // partitions on the join key (the only exchange is the groupBy's)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    }
  }

  test("AQE coalesces oversized shuffle-partition counts at runtime (the " +
       "other half of adaptive sizing: 64 configured -> few actual for a " +
       "tiny aggregate)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val agg = spark.range(10000)
        .groupBy(($"id" % 5).as("k")).count()
      // rdd materializes the FINAL adaptive plan's partitioning
      val n = agg.rdd.getNumPartitions
      assert(n < 64, s"AQE left $n partitions for a 5-group aggregate")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (the automatic " +
       "complement to explicit salting)") {
    // Salting (above) is the deliberate rewrite when skew is known ahead
    // of time; AQE's skew-join handling is the runtime safety net. Pin
    // that it engages on our skew shape once its cluster-sized thresholds
    // (256MB partitions) are scaled down to fixture size.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = skewed.join(dim.hint("merge"), Seq("k"))
        .select($"k", $"v", $"attr")
      // execute THIS dataframe (count() would be a separate QueryExecution)
      // so its adaptive plan finalizes
      assert(joined.collect().length === 10000 + 100 * 10)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join partition:\n$p")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("runtime bloom-filter injection prunes the probe side of a " +
       "selective join (Spark's runtime row filtering)") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creationSideThreshold is a MAXIMUM size for the build side —
      // raise it; applicationSide threshold is a MINIMUM — zero it
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      val ords = graft.Tables.orders(spark, "/root/testdata/sf0.001")
        .filter(col("o_totalprice") > 500000.0) // selective build side
      val joined = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side:\n$p")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("range-partitioned sorted write produces range-disjoint files — " +
       "the globally-ordered output layout for 100TB writes") {
    val dir = tmpDir("layout_range")
    graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(dir)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"o_orderkey").as("lo"), max($"o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(perFile.length >= 3, s"expected >=3 range files, got $perFile")
    // files tile the key space without overlap: each file's max is below
    // the next file's min — a reader with a key-range predicate skips
    // whole files on parquet footer stats alone
    perFile.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, perFile.toString)
      case _ => ()
    }
  }

  test("maxRecordsPerFile bounds output file row counts (file-size control)") {
    val dir = tmpDir("layout_maxrec")
    graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .coalesce(1)
      .write.option("maxRecordsPerFile", 500)
      .mode("overwrite").parquet(dir)
    val counts = spark.read.parquet(dir)
      .groupBy(input_file_name()).count()
      .collect().map(_.getLong(1)).toSeq
    assert(counts.length >= 2, s"expected the writer to roll files: $counts")
    assert(counts.forall(_ <= 500), counts.toString)
    assert(counts.sum === 1500L)
  }

  test("partitioned layout: filters become PartitionFilters and prune directories") {
    val dir = tmpDir("part_layout")
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"l_returnflag" === "A")
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    // only the matching partition's rows are read
    val all = spark.read.parquet(dir).count()
    assert(scan.count() < all)
    // dynamic partition layout on disk: one dir per flag value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet.exists(_.startsWith("l_returnflag=")))
  }
}
