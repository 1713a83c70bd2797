package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's JSON out of the LAST 2000 chars of sbt
  * output; `Bench.compactLine` exists to always fit that window. These
  * tests pin the contract without a SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  private val many: Seq[(String, Double)] =
    (1 to 120).map(i => f"query_with_a_long_name_$i%03d" -> (i * 0.037))

  test("compact line fits the budget even with far more queries than today") {
    val line = Bench.compactLine(many, many.map(_._2).sum, "/root/testdata/sf0.1")
    assert(line.length <= 1800, s"len=${line.length}")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.endsWith("\"sf\":0.1}"))
  }

  test("truncated view keeps the slowest queries and reports the omission") {
    val line = Bench.compactLine(many, many.map(_._2).sum, "/root/testdata/sf0.1")
    // slowest entry must survive truncation; fastest must be the one dropped
    assert(line.contains("query_with_a_long_name_120"))
    assert(!line.contains("\"query_with_a_long_name_001\""))
    assert(line.contains("\"queries_omitted\":"))
  }

  test("small result sets render completely, no omission marker") {
    val line = Bench.compactLine(
      Seq("q1" -> 1.23456, "q2" -> 0.5), 1.73456, "/root/testdata/sf0.01")
    assert(line ===
      """{"metric":"total","value":1.73,"unit":"sec","queries":{"q1":1.23,"q2":0.5},"sf":0.01}""")
  }

  test("non-sf dir falls back to quoting the path") {
    val line = Bench.compactLine(Seq("q1" -> 1.0), 1.0, "/some/dir")
    assert(line.endsWith("\"sf\":\"/some/dir\"}"))
  }

  test("fallback path is JSON-escaped (quotes and backslashes)") {
    val line = Bench.compactLine(Seq("q1" -> 1.0), 1.0, """/weird"dir\path""")
    assert(line.endsWith("\"sf\":\"/weird\\\"dir\\\\path\"}"), line)
  }

  // --- baseline picker (VERDICT r11 #1: the regress guard must skip
  // contended snapshots instead of diffing the newest unconditionally) ---

  private def snap(contended: Option[Boolean],
                   loads: Option[(Double, Double)] = None): String = {
    val env = (contended, loads) match {
      case (Some(c), _) =>
        s""""env":{"load_start":0.5,"load_end":1.0,"contended":$c,"reps":3}"""
      case (None, Some((ls, le))) => // pre-r11 shape: loads, no flag
        s""""env":{"load_start":$ls,"load_end":$le,"reps":3}"""
      case _ => "\"env\":{}"
    }
    s"""{"parsed":{"metric":"total","value":100.0,$env,"queries":{"q1":1.0}}}"""
  }

  private def withDir(files: Map[String, String])(
      f: java.nio.file.Path => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("benchspec")
    try {
      files.foreach { case (name, body) =>
        java.nio.file.Files.writeString(dir.resolve(name), body)
      }
      f(dir)
    } finally {
      files.keys.foreach(n =>
        java.nio.file.Files.deleteIfExists(dir.resolve(n)))
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("picker skips a contended newest snapshot for the older clean one") {
    withDir(Map(
      "BENCH_r11.json" -> snap(Some(true)),
      "BENCH_r10.json" -> snap(Some(false)))) { dir =>
      val pick = Bench.pickBaseline(dir).get
      assert(pick.round === 10)
      assert(pick.cleanCertified)
      assert(pick.path.getFileName.toString === "BENCH_r10.json")
    }
  }

  test("picker prefers the clean-adopted artifact within the same round") {
    withDir(Map(
      "BENCH_r11.json"       -> snap(Some(true)),
      "BENCH_clean_r11.json" -> snap(Some(false)),
      "BENCH_r10.json"       -> snap(Some(false)))) { dir =>
      val pick = Bench.pickBaseline(dir).get
      assert(pick.round === 11)
      assert(pick.cleanCertified)
      assert(pick.path.getFileName.toString === "BENCH_clean_r11.json")
    }
  }

  test("pre-r11 snapshot without a flag derives contention from its loads") {
    // r10-shaped: no contended field; load_start 1.74 >= 1.5 ⇒ contended,
    // so the clean r9 wins
    withDir(Map(
      "BENCH_r10.json" -> snap(None, Some((1.74, 2.35))),
      "BENCH_r09.json" -> snap(None, Some((0.3, 1.2))))) { dir =>
      val pick = Bench.pickBaseline(dir).get
      assert(pick.round === 9)
      assert(pick.cleanCertified)
    }
  }

  test("all-contended falls back to the newest, flagged uncertified") {
    withDir(Map(
      "BENCH_r11.json" -> snap(Some(true)),
      "BENCH_r10.json" -> snap(None, Some((1.74, 2.35))))) { dir =>
      val pick = Bench.pickBaseline(dir).get
      assert(pick.round === 11)
      assert(!pick.cleanCertified)
    }
  }

  test("all-contended fallback prefers the newest PARSEABLE snapshot " +
       "over a corrupt newer one (a truncated file would make the " +
       "guard's own read throw and skip the report entirely)") {
    withDir(Map(
      "BENCH_r12.json" -> "{\"parsed\": trunca",
      "BENCH_r11.json" -> snap(Some(true)))) { dir =>
      val pick = Bench.pickBaseline(dir).get
      assert(pick.round === 11)
      assert(!pick.cleanCertified)
    }
  }

  test("snapshotContended reads flag, derives from loads, recovers from tail") {
    assert(Bench.snapshotContended(snap(Some(true))) === Some(true))
    assert(Bench.snapshotContended(snap(Some(false))) === Some(false))
    assert(Bench.snapshotContended(snap(None, Some((3.0, 1.0)))) === Some(true))
    assert(Bench.snapshotContended(snap(None, Some((0.2, 1.0)))) === Some(false))
    // tail-only (driver scrape failed): explicit flag wins
    val tailFlag = """{"parsed":null,"tail":"...\"contended\":true,..."}"""
    assert(Bench.snapshotContended(tailFlag) === Some(true))
    // tail-only, pre-flag shape: derive from the loads in the fragment
    val tailLoads =
      """{"parsed":null,"tail":"\"load_start\":0.11,\"load_end\":0.9,"}"""
    assert(Bench.snapshotContended(tailLoads) === Some(false))
    // nothing recoverable: not certifiable
    assert(Bench.snapshotContended("""{"parsed":null,"tail":"junk"}""") === None)
    assert(Bench.snapshotContended("not json at all") === None)
  }
}
