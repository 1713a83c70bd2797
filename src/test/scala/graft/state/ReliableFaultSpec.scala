package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fault injection for `spark.graft.materialize=reliable` (VERDICT r10
  * #2): the r10 reliable-mode sweep proved SEMANTICS parity, but the
  * mode's raison d'être is surviving executor loss — its pins go to
  * reliable checkpoint storage instead of executor block storage. Local
  * mode can simulate the loss: build a pinned iterative pipeline (the
  * suffix index — every round is a [[Materialize.pin]]), then BETWEEN
  * the build and the consumption drop every block the build created
  * (unpersist through the BlockManager master, exactly what executor
  * decommission does to localCheckpoint blocks), and consume.
  *
  *   - reliable: the pins live as checkpoint FILES (the configured
  *     `spark.checkpoint.dir`; HDFS/object store on a real cluster) —
  *     block loss must be a non-event and the result bit-identical;
  *   - local: localCheckpoint TRUNCATES lineage, so the dropped blocks
  *     are not recomputable — consumption must fail loudly (the
  *     documented trade-off, not silent corruption).
  *
  * Block dropping is DIFF-CONFINED to the ids created inside the test
  * (snapshot before / after): the shared session carries other suites'
  * session-lived cache pins, which an indiscriminate sweep would break
  * (the RetainedPinSpec contract).
  */
class ReliableFaultSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = {
    val rnd = new scala.util.Random(17)
    (0 until 30).map { i =>
      val n = 5 + rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    } ++ Seq((30L, "shared duplicated tail across documents"),
             (31L, "prefix and a shared duplicated tail across documents"))
  }

  private def ranksSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long)] =
    df.select($"doc_id", $"sa_pos", $"r").as[(Long, Long, Long)]
      .collect().toSet

  /** Runs the pinned suffix-index pipeline under `mode`, drops every
    * block the build created, then consumes the final frame.
    */
  private def buildDropConsume(mode: String): Set[(Long, Long, Long)] = {
    val sc = spark.sparkContext
    val prev = spark.conf.getOption(Materialize.ModeKey)
    spark.conf.set(Materialize.ModeKey, mode)
    try {
      val before = sc.getPersistentRDDs.keySet
      // build: every round pins; the dense-final conversion pins too
      // (formatSuffixRanks forces it eagerly)
      val out = graft.ops.llm.TextStats
        .suffixRanksGlobalFromIndex(
          graft.ops.llm.SuffixIndex.build(corpus.toDF("doc_id", "text")))
      // fault injection: drop every block the build created — what
      // executor decommission does to executor-storage pins. unpersist
      // routes through the BlockManager master and removes memory AND
      // disk replicas on every executor.
      val created = sc.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      created.values.foreach(_.unpersist(blocking = true))
      ranksSet(out)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Materialize.ModeKey, v)
        case None    => spark.conf.unset(Materialize.ModeKey)
      }
    }
  }

  test("reliable mode survives total executor-block loss between build " +
       "and consumption with bit-identical results") {
    // expected: an undisturbed run (default local mode, no fault)
    val expected = ranksSet(graft.ops.llm.TextStats
      .suffixRanksGlobalFromIndex(
        graft.ops.llm.SuffixIndex.build(corpus.toDF("doc_id", "text"))))
    assert(expected.nonEmpty)
    val got = buildDropConsume("reliable")
    assert(got === expected,
      "reliable-mode pipeline must produce identical ranks after every " +
      "executor block is dropped — its pins live in checkpoint storage")
  }

  test("sem_dedup_clusters under materialize=reliable holds the " +
       "checkpoint-dir file count FLAT across a foreach_batch-style " +
       "loop — one batch's drop-pin residual, not one per batch " +
       "(VERDICT r13 #3)") {
    import spark.implicits._
    // the exact per-micro-batch shape of a foreach_batch sink: the
    // registry processor applied to a bounded frame, output fully
    // materialized (the sink), repeated N times sequentially
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id",
        $"embedding".cast("array<float>").as("embedding"))
    val proc = new graft.pipeline.SemDedupClustersProcessor(
      graft.config.Conf(Map("threshold" -> "0.45")))
    val sc = spark.sparkContext
    val ckDir = tmpDir("relspec_ck")
    sc.setCheckpointDir(ckDir)
    def ckptFiles(): Int = {
      val root = java.nio.file.Paths.get(ckDir)
      if (!java.nio.file.Files.exists(root)) 0
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_)).count().toInt
        finally s.close()
      }
    }
    val prev = spark.conf.getOption(Materialize.ModeKey)
    spark.conf.set(Materialize.ModeKey, "reliable")
    val settled =
      try (1 to 5).map { _ => val n = proc(embs).count(); (n, ckptFiles()) }
      finally prev match {
        case Some(v) => spark.conf.set(Materialize.ModeKey, v)
        case None    => spark.conf.unset(Materialize.ModeKey)
      }
    // semantics unchanged across batches (same input, same survivors)
    assert(settled.map(_._1).distinct.size === 1 && settled.head._1 > 0)
    val counts = settled.map(_._2)
    info(s"settled checkpoint-file counts after each of 5 batches: " +
      s"${counts.mkString(", ")} (pre-round-14: grew by the per-batch " +
      "residual every batch)")
    // BOUNDED: after every batch the dir holds exactly the current
    // drop pin's files (the one residual the next invocation frees) —
    // the pre-round-14 behavior retained 4 checkpoint file-sets per
    // batch (corpus via failed-release paths aside: edge pin, label
    // pin, drop pin) and this count grew linearly with the loop length
    assert(counts.distinct.size === 1,
      s"checkpoint files must stay flat across sequential invocations " +
      s"(one batch's residual), got $counts")
    assert(counts.head > 0,
      "the retained drop pin must actually live in checkpoint storage " +
      s"(zero files means the reliable path was not exercised), got $counts")
  }

  test("local mode fails loudly on the same block loss (truncated " +
       "lineage is not recomputable — the documented trade-off)") {
    val ex = intercept[Exception] { buildDropConsume("local") }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
        m.contains("Checkpoint block") || m.contains("block") ||
        m.contains("BlockNotFound")),
      s"expected a lost-block failure, got: ${ex.getMessage}")
  }
}
