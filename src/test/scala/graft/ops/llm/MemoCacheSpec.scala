package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrency contract of the session-lived memo caches (SuffixIndex
  * `forDir`/`forFrame`, Dedup `spanCache`/`pairsCache`, TextStats
  * `winnowSelCache` — all the same `ConcurrentHashMap.computeIfAbsent`
  * pattern): a cache MISS hit by N threads at once must run the
  * expensive build EXACTLY once, with the other N−1 callers blocking on
  * the bin lock until the single result installs, and every caller
  * receiving the identical instance. Pinned here against the shared
  * suffix index (the costliest build, and the one with a build counter);
  * the other caches reuse the same primitive so the contract transfers.
  *
  * Why it matters at scale: on a long-lived shared session (a Spark
  * Connect server, a notebook gateway) the first two analysts to touch
  * the suffix gates race; a broken memo would double the dominant build
  * cost and — worse — strand one build's retained pins with no owner.
  */
class MemoCacheSpec extends SparkSpec {

  import spark.implicits._

  /** Per-run nonce in every cache fingerprint: the memo cache and the
    * build counter are JVM-global, so a hard-coded key would make a
    * SECOND execution in one test JVM (testQuick rerun, suite retry)
    * hit the already-installed entry and fail the exactly-one-build
    * assertion even though memoization works.
    */
  private val runTag = java.util.UUID.randomUUID().toString.take(8)

  private def corpus(tag: String, n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $tag $i shares the planted dup " +
        s"payload ABCDEFGH-$tag plus unique tail ${i * 7919}"))
      .toDF("doc_id", "text")

  test("8 concurrent forFrame misses on one fingerprint run exactly one " +
       "build and all callers share the identical Index instance") {
    val docs = corpus("memo-a", 12)
    val before = SuffixIndex.buildsStarted.get()
    val idxs = Await.result(
      Future.sequence((1 to 8).map(_ =>
        Future(SuffixIndex.forFrame(docs, s"memo-spec-single-$runTag")))),
      5.minutes)
    assert(SuffixIndex.buildsStarted.get() - before === 1,
      "computeIfAbsent must run the build mapping exactly once per key")
    assert(idxs.forall(_ eq idxs.head),
      "every concurrent caller must receive the same memoized Index")
    // and the shared index is fully consumable: one suffix per byte
    val totalBytes = docs.agg(sum(octet_length($"text"))).head().getLong(0)
    assert(idxs.head.nSuffixes === totalBytes)
    assert(idxs.head.finalRanks.count() === totalBytes)
  }

  test("distinct fingerprints racing on the same cache build " +
       "independently with no cross-talk") {
    val docsB = corpus("memo-b", 6)
    val docsC = corpus("memo-c", 9)
    val before = SuffixIndex.buildsStarted.get()
    val Seq(ib, ic) = Await.result(
      Future.sequence(Seq(
        Future(SuffixIndex.forFrame(docsB, s"memo-spec-b-$runTag")),
        Future(SuffixIndex.forFrame(docsC, s"memo-spec-c-$runTag")))),
      5.minutes)
    assert(SuffixIndex.buildsStarted.get() - before === 2,
      "each distinct key must pay its own build")
    assert(!(ib eq ic), "distinct keys must not alias one Index")
    val bytesB = docsB.agg(sum(octet_length($"text"))).head().getLong(0)
    val bytesC = docsC.agg(sum(octet_length($"text"))).head().getLong(0)
    assert(ib.nSuffixes === bytesB)
    assert(ic.nSuffixes === bytesC)
    // a revisit on either key is a pure hit — no third build
    assert(SuffixIndex.forFrame(docsB, s"memo-spec-b-$runTag") eq ib)
    assert(SuffixIndex.buildsStarted.get() - before === 2)
  }
}
