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
}
