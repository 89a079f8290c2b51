package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed crawl-frontier round — the pipeline the
  * `web_frontier_loop` catalog row pins, packaged as ONE reusable op so
  * the batch loop, the BFS iteration and the streaming twin cannot drift:
  *
  *   fetched pages → [[WebIngest.extractLinks]] (state-machine `<a href>`
  *   + HTML5 `<base>` scoping) → [[TextAnalysis.canonicalizeUrl]] →
  *   candidate `distinct` → [[Dedup.notInCorpusManaged]] vs the VISITED
  *   set (Bloom-prefiltered: the visited corpus never shuffles for
  *   definite misses) → [[Robots.robotsAllowed]] →
  *   [[Robots.politeSchedule]] (per-host slots × effective crawl-delay).
  *
  * Scale shape (SCALE.md §20.10): per-round shuffle is proportional to
  * the round's candidate links, never the visited corpus; the visited
  * side is consulted via one broadcast Bloom probe plus a broadcast
  * semi-join bounded by the maybe set; scheduling is one window exchange
  * keyed on the host. The returned release hook unpersists the round's
  * internal flagged-batch cache — loop callers MUST invoke it once the
  * round's output is materialized (ADVICE r14: without it, every round
  * pins a batch-sized cache block for the session).
  */
object Frontier {

  /** One frontier round over already-fetched pages.
    *
    * @param fetched  pages with `urlCol` (the page URL driving relative
    *                 resolution) and `bodyCol` (decoded HTML)
    * @param visited  single-column frame `u` of already-crawled canonical
    *                 URLs (the standing visited set / corpus snapshot)
    * @param rules    parsed robots rules as produced by
    *                 [[Robots.parseRobots]]: (host, directive, rule_value)
    * @param expectedItems Bloom sizing for the visited set (a real
    *                 frontier knows its visited count)
    * @param bloom    optional PREBUILT Bloom filter over `visited.u` —
    *                 pass it when looping over one visited snapshot so the
    *                 sketch is built once, not once per round
    * @return (scheduled frontier: host, link_url, crawl_delay_s,
    *         fetch_slot, fetch_at_s; release hook for the round's cache)
    */
  def frontierRound(fetched: DataFrame, visited: DataFrame,
      rules: DataFrame, expectedItems: Long,
      defaultDelayS: Double = 1.0,
      urlCol: String = "target_uri", bodyCol: String = "http_body",
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)
      : (DataFrame, () => Unit) = {
    val links = WebIngest.extractLinks(
        fetched.select(col(urlCol), col(bodyCol)), bodyCol, urlCol)
      .select(explode(col("link_urls")).as("u"))
    val cand = TextAnalysis.canonicalizeUrl(links, "u")
      .where(col("url_canonical").isNotNull)
      .select(col("url_canonical").as("u"))
      .distinct()
    val (fresh, release) = bloom match {
      case Some(bf) => Dedup.notInCorpusManagedWith(cand, visited, "u", bf)
      case None =>
        Dedup.notInCorpusManaged(cand, visited, "u", expectedItems)
    }
    val parts = fresh
      // strip userinfo: "user@host" must key the same robots rules and
      // politeness window as "host" (rules frames are keyed by host, and
      // a miss here would coalesce to robots_allowed = TRUE — fetching a
      // Disallow'd URL because of an '@' in the link)
      .withColumn("host", regexp_extract(col("u"),
        "^https?://(?:[^/@]*@)?([^/]+)", 1))
      .withColumn("path", regexp_extract(col("u"), "^https?://[^/]+(/.*)$", 1))
    val gated = Robots.robotsAllowed(parts, "path", rules, Seq("host"))
      .where(col("robots_allowed"))
    val out = Robots.politeSchedule(gated, Seq("host"), "u",
        defaultDelayS = defaultDelayS)
      .select(col("host"), col("u").as("link_url"), col("crawl_delay_s"),
        col("fetch_slot"), col("fetch_at_s"))
    (out, release)
  }

  /** The frontier loop RUN LIVE — the streaming twin of the batch round:
    * `pages` is a STREAMING frame of fetched pages; each micro-batch runs
    * the exact same [[frontierRound]] composition (foreachBatch hands the
    * micro-batch over as a plain DataFrame, so the batch code runs
    * verbatim — zero twin drift by construction) against ONE visited-set
    * snapshot whose Bloom sketch is built once at stream definition, and
    * `emit` receives the round's scheduled frontier. The round's internal
    * cache is released after `emit` returns, so a long-lived query never
    * accumulates per-batch cache blocks.
    *
    * Semantics vs the batch loop: extract → canonicalize → visited-dedup
    * → robots gate are per-row and batch-equivalent; `fetch_slot`s are
    * assigned WITHIN each micro-batch (a live crawler paces each round's
    * discoveries — slots deliberately restart per round, exactly like
    * consecutive calls to the batch round). The visited snapshot is fixed
    * for the query lifetime ([[StreamingOps.streamNotInCorpus]]'s
    * contract); restart the query to adopt a grown snapshot.
    */
  def streamFrontierRounds(pages: DataFrame, visited: DataFrame,
      rules: DataFrame, expectedItems: Long,
      defaultDelayS: Double = 1.0,
      urlCol: String = "target_uri", bodyCol: String = "http_body",
      fpp: Double = 0.01)(emit: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val bf = visited.stat.bloomFilter(col("u"), expectedItems, fpp)
    pages.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val (out, release) = frontierRound(batch, visited, rules,
          expectedItems, defaultDelayS, urlCol, bodyCol, Some(bf))
        try emit(out, batchId) finally release()
    }
  }
}
