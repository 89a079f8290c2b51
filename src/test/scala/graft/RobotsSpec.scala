package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val robots =
    """# crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok$
      |Crawl-delay: 3
      |
      |User-agent: Other
      |User-agent: graftbot
      |Disallow: /extra
      |
      |User-agent: *
      |Disallow: /all
      |Sitemap: https://h.io/sitemap.xml
      |""".stripMargin

  test("parseRobots: group selection, merge of repeated groups, global " +
      "sitemaps, comments; '*' fallback when the token matches nothing") {
    val df = Seq((0L, robots)).toDF("host_id", "robots")
    val got = Robots.parseRobots(df, "robots", "GraftBot")
      .orderBy("rule_idx")
      .collect().map(r => (r.getAs[String]("directive"), r.getAs[String]("rule_value")))
    // both graftbot groups MERGE in file order; the '*' group is ignored;
    // sitemap is global
    assert(got.toSeq == Seq(
      ("disallow", "/private/"), ("allow", "/private/ok$"),
      ("crawl_delay", "3"), ("disallow", "/extra"),
      ("sitemap", "https://h.io/sitemap.xml")))
    val fallback = Robots.parseRobots(df, "robots", "someone-else")
      .orderBy("rule_idx")
      .collect().map(r => (r.getAs[String]("directive"), r.getAs[String]("rule_value")))
    assert(fallback.toSeq == Seq(
      ("disallow", "/all"), ("sitemap", "https://h.io/sitemap.xml")))
    // rule-free file: one null-directive row, the host never vanishes
    val empty = Robots.parseRobots(
      Seq((1L, "# nothing here\n")).toDF("host_id", "robots"), "robots", "x")
      .collect()
    assert(empty.length == 1 &&
      empty.head.isNullAt(empty.head.fieldIndex("directive")))
    assert(Robots.parseRobots(
      Seq((2L, null: String)).toDF("host_id", "robots"), "robots", "x")
      .collect().head.getAs[String]("parse_error") == "null robots.txt")
  }

  test("robotsAllowed: longest-octet match wins, allow beats disallow on " +
      "ties, '$' anchors, '*' wildcards, no match or no rules = allowed") {
    val rules = Robots.parseRobots(
      Seq((0L, robots)).toDF("host_id", "robots"), "robots", "graftbot")
      .select(col("host_id"), col("directive"), col("rule_value"))
    val urls = Seq(
      (0L, 1L, "/private/x"),     // disallowed by /private/
      (0L, 2L, "/private/ok"),    // allowed: longer allow rule, $ matches
      (0L, 3L, "/private/okay"),  // $ does NOT match → disallowed
      (0L, 4L, "/other"),         // no rule matches → allowed
      (9L, 5L, "/private/x"))     // host with no rules at all → allowed
      .toDF("host_id", "url_id", "path")
    val got = Robots.robotsAllowed(urls, "path", rules, Seq("host_id"))
      .collect().map(r => r.getAs[Long]("url_id") ->
        (r.getAs[Boolean]("robots_allowed"), r.getAs[String]("robots_rule"))).toMap
    assert(got(1L) == ((false, "/private/")))
    assert(got(2L) == ((true, "/private/ok$")))
    assert(got(3L) == ((false, "/private/")))
    assert(got(4L)._1 && got(4L)._2 == null)
    assert(got(5L)._1 && got(5L)._2 == null)
    // wildcard form: *.pdf$ blocks exactly pdf paths anywhere
    val wild = Seq((0L, "disallow", "/*.pdf$"), (0L, "allow", "/docs/"))
      .toDF("host_id", "directive", "rule_value")
    val wUrls = Seq((0L, 1L, "/docs/a.pdf"), (0L, 2L, "/docs/a.pdf.html"),
      (0L, 3L, "/docs/a.txt")).toDF("host_id", "url_id", "path")
    val wGot = Robots.robotsAllowed(wUrls, "path", wild, Seq("host_id"))
      .collect().map(r => r.getAs[Long]("url_id") ->
        r.getAs[Boolean]("robots_allowed")).toMap
    // '/*.pdf$' (7 octets) beats '/docs/' (6) on the pdf path; the
    // .html path only matches the allow prefix; the txt path likewise
    assert(wGot == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("robotsAllowed: crawl_delay_s surfaces the host's effective delay " +
      "next to the allow bit — largest wins across merged groups, " +
      "malformed parses to null (ANSI guard), absent is null") {
    val rules = Seq(
      // host 0: two merged-group delays, most conservative (5.5) wins
      (0L, "disallow", "/private/"), (0L, "crawl_delay", "3"),
      (0L, "crawl_delay", "5.5"),
      // host 1: malformed value — the gate must not throw under ANSI
      (1L, "crawl_delay", "fast"), (1L, "disallow", "/x"),
      // host 2: no delay declared
      (2L, "disallow", "/y"))
      .toDF("host_id", "directive", "rule_value")
    val urls = Seq((0L, "/a"), (1L, "/b"), (2L, "/c"), (3L, "/d"))
      .toDF("host_id", "path")
    val got = Robots.robotsAllowed(urls, "path", rules, Seq("host_id"))
      .collect().map { r =>
        r.getAs[Long]("host_id") ->
          (if (r.isNullAt(r.fieldIndex("crawl_delay_s"))) null
           else java.lang.Double.valueOf(r.getAs[Double]("crawl_delay_s")))
      }.toMap
    assert(got(0L) == 5.5)
    assert(got(1L) == null)
    assert(got(2L) == null)
    assert(got(3L) == null) // host absent from rules entirely
    // and the delay rows never leak into the path decision
    val dec = Robots.robotsAllowed(urls, "path", rules, Seq("host_id"))
      .collect().map(r => r.getAs[Long]("host_id") ->
        r.getAs[Boolean]("robots_allowed")).toMap
    assert(dec == Map(0L -> true, 1L -> true, 2L -> true, 3L -> true))
  }

  test("politeSchedule: per-host fetch slots paced by the effective " +
      "delay — declared delay, default fallback, independent hosts") {
    val urls = Seq(
      (0L, "/a", Some(2.5)), (0L, "/b", Some(2.5)), (0L, "/c", Some(2.5)),
      (1L, "/x", None), (1L, "/y", None))
      .map { case (h, p, d) => (h, p, d.map(Double.box).orNull) }
      .toDF("host_id", "path", "crawl_delay_s")
    val got = Robots.politeSchedule(urls, Seq("host_id"), "path",
      defaultDelayS = 1.0)
      .collect().map(r => (r.getAs[Long]("host_id"), r.getAs[String]("path")) ->
        (r.getAs[Long]("fetch_slot"), r.getAs[Double]("fetch_at_s"))).toMap
    assert(got((0L, "/a")) == ((0L, 0.0)))
    assert(got((0L, "/b")) == ((1L, 2.5)))
    assert(got((0L, "/c")) == ((2L, 5.0)))
    assert(got((1L, "/x")) == ((0L, 0.0)))
    assert(got((1L, "/y")) == ((1L, 1.0)))
  }

  test("politeSchedule tieBreakCols: duplicate orderCol values within a " +
      "host get deterministic slots from the tie-breaker, not partitioning") {
    // same priority for every URL of host 0 — a bare orderBy(priority)
    // would leave slot assignment to partition arrival order
    val urls = Seq(
      (0L, 1, "http://h/c", 1.0), (0L, 1, "http://h/a", 1.0),
      (0L, 1, "http://h/b", 1.0))
      .toDF("host_id", "priority", "url", "crawl_delay_s")
    val got = Robots.politeSchedule(urls.repartition(7), Seq("host_id"),
      "priority", tieBreakCols = Seq("url"))
      .collect().map(r => r.getAs[String]("url") ->
        r.getAs[Long]("fetch_slot")).toMap
    assert(got == Map("http://h/a" -> 0L, "http://h/b" -> 1L,
      "http://h/c" -> 2L))
  }
}
