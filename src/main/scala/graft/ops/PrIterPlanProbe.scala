package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Diagnostic main (r18, VERDICT r17 #2): the PageRank gates execute
  * their iteration loops EAGERLY (pin cadence), so [[graft.PlanCapture]]
  * sees only the final pin scan — the per-ITERATION plan, where the
  * exchanges actually live, was never captured. This probe builds one
  * step over a pinned rank frame exactly as the production loop does and
  * writes its `.explain("formatted")`, so the "exchanges per iteration"
  * claim is checkable against a committed artifact.
  *
  *   sbt "runMain graft.ops.PrIterPlanProbe <outDir> <suffix> [sfDir]"
  *
  * Writes `<outDir>/graph_pagerank_iter_<suffix>.txt` and
  * `<outDir>/graph_pagerank_directed_iter_<suffix>.txt`.
  */
object PrIterPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PrIterPlanProbe <outDir> <suffix> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "220")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pin = graft.state.Materialize.pin _

    // undirected: mirror pagerankFrom's loop state exactly
    val e = Graph.edgesAt(spark, sfDir, 45)
    val u = e.select($"a".as("w1"), $"b".as("w2"))
      .union(e.select($"b".as("w1"), $"a".as("w2"))).transform(pin)
    val r0 = u.groupBy($"w1")
      .agg(count(lit(1)).as("out_w"))
      .select($"w1".as("node"), $"out_w", lit(1000000L).as("r"))
      .transform(pin)
    val zeros = r0.select($"node", lit(0L).as("c"), $"out_w".as("ow"))
    val step1 = Graph.prStep(u, zeros, r0)
    Files.writeString(outDir.resolve(s"graph_pagerank_iter_$suffix.txt"),
      step1.queryExecution.explainString(ExplainMode.fromString("formatted")))
    println(s"[pr-iter-plan] graph_pagerank_iter_$suffix.txt")

    // directed: mirror pagerankDirectedFrom's loop state exactly
    val ed = e.select($"a".as("w1"), $"b".as("w2")).transform(pin)
    val outw = ed.groupBy($"w1").agg(count(lit(1)).as("out_w"))
    val nodesD = ed.select($"w1".as("node"))
      .union(ed.select($"w2".as("node"))).distinct().transform(pin)
    val n = nodesD.count()
    val nodesF = Graph.prDirNodesFlagged(nodesD, outw).transform(pin)
    val rd0 = nodesF.withColumn("r", lit(1000000L)).transform(pin)
    val dstep1 = Graph.prDirStep(ed, n, rd0)
    Files.writeString(
      outDir.resolve(s"graph_pagerank_directed_iter_$suffix.txt"),
      dstep1.queryExecution.explainString(ExplainMode.fromString("formatted")))
    println(s"[pr-iter-plan] graph_pagerank_directed_iter_$suffix.txt")
    spark.stop()
  }
}
