package graft.ops.llm

import graft.SparkSpec

/** Laws for URL-level crawl dedup: the gate hash-matches a DuckDB replay
  * of the same canonicalization, so this pins the semantic claims the
  * replay shares with the implementation by construction — that every
  * messy spelling of a page collapses to exactly one canonical URL, that
  * the canonical form is actually clean (no ports, tracking params,
  * fragments, case noise), and that the survivor is the lowest crawl id.
  */
class UrlDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("url dedup: one canonical per page, variant counts follow the " +
       "recrawl pattern, survivor is the primary crawl") {
    val out = Dedup.urlDedup(spark, dir).collect()
    // sf0.01 = 500 docs, each a distinct page: 500 canonical URLs even
    // though the crawl frontier saw 500 + 250 + 167 spellings
    assert(out.length === 500)
    out.foreach { r =>
      val (url, keep, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val docId = keep / 10
      // primary spelling (crawl_id = doc_id*10) always wins
      assert(keep % 10 === 0, url)
      val expected = 1L + (if (docId % 2 == 0) 1L else 0L) +
                          (if (docId % 3 == 0) 1L else 0L)
      assert(n === expected, s"$url keep=$keep")
      // canonical form is clean: lowercase host, default port stripped,
      // fragment and tracking params gone, no trailing slash, and the
      // sole surviving query param is lang
      assert(url.startsWith("https://src"), url)
      assert(url.contains(".example.com/docs/"), url)
      assert(!url.contains(":443") && !url.contains("#"), url)
      assert(!url.contains("utm_") && !url.contains("ref="), url)
      assert(!url.endsWith("/"), url)
      assert(url.matches(".*\\?lang=[a-z]{2}$"), url)
    }
  }

  test("canonicalization is idempotent: canonicalizing a canonical URL " +
       "is the identity (safe to re-run the frontier dedup over " +
       "already-clean URLs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = Dedup.urlDedup(spark, dir)
      .select($"canonical_url",
              Dedup.canonicalUrl($"canonical_url").as("again"))
      .filter($"canonical_url" =!= $"again")
      .count()
    assert(n === 0L)
  }
}
