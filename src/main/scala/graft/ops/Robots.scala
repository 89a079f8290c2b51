package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt — the crawl politeness layer (RFC 9309, public spec): a
  * pipeline that ingests crawl dumps must be able to answer "was this
  * fetch allowed, and at what delay?" for audit and re-crawl planning.
  * [[parseRobots]] is the per-host parse (group selection per §2.2.1:
  * exact case-insensitive product-token match, '*' fallback, multiple
  * groups for the same agent MERGE); [[robotsAllowed]] is the per-URL
  * decision (§2.2.2: longest-octet-match rule wins, allow wins ties,
  * no match ⇒ allowed) with the de-facto-standard '*' and '$' pattern
  * forms the RFC adopted.
  *
  * Scale shape: the parse is the family's narrow per-row walk (one
  * robots.txt is ≤ a few hundred KB); the decision pre-aggregates the
  * per-host rules into one array row per key and equi-joins that tiny
  * frame onto the URLs — the corpus side carries no aggregation, so it
  * pays at most the join exchange, and none at all when the rules frame
  * broadcasts (AQE picks that for any realistic rule set).
  */
object Robots {

  private val ruleCols = Seq(
    StructField("rule_idx", IntegerType),
    StructField("directive", StringType),
    StructField("rule_value", StringType),
    StructField("parse_error", StringType))

  /** One row per directive that APPLIES to `userAgent`: the selected
    * group's `allow` / `disallow` / `crawl_delay` rules in file order,
    * plus every `sitemap` (sitemaps are global per §2.3, group
    * membership irrelevant). Group selection per RFC 9309 §2.2.1: the
    * group(s) whose User-agent line equals the product token
    * case-insensitively; if none, the '*' group(s); matching groups
    * merge in file order. Lines that parse as nothing (comments, blanks,
    * unknown directives) are skipped — an entirely rule-free file yields
    * one null-directive row so the host doesn't vanish from the output.
    */
  def parseRobots(df: DataFrame, robotsCol: String,
      userAgent: String): DataFrame = {
    Multimodal.requireFreshColumns(df, "parseRobots", ruleCols.map(_.name))
    val schema = StructType(df.schema.fields ++ ruleCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(robotsCol)
    val agent = userAgent.toLowerCase
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val errRow = (msg: String) =>
          Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null robots.txt")
        else try {
          // BOM before the first line would turn 'user-agent' into an
          // unknown directive and silently drop the first group (the
          // Subtitles parser learned the same lesson); and RFC 9309 §2.1
          // terminates lines with CR, LF, or CRLF — linesIterator misses
          // bare-CR files
          val text = r.getAs[String](idx).stripPrefix("\uFEFF")
          // line model: strip '#' comments, trim; a group is a run of
          // User-agent lines followed by its rules — a User-agent line
          // AFTER rules have started begins a new group (RFC 9309 §2.2.1;
          // blank lines do NOT end groups)
          final case class Group(agents: Seq[String],
              rules: Seq[(String, String)])
          val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
          val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
          var agents = Vector.empty[String]
          var rules = Vector.empty[(String, String)]
          var inRules = false
          def flush(): Unit = {
            if (agents.nonEmpty) groups += Group(agents, rules)
            agents = Vector.empty; rules = Vector.empty; inRules = false
          }
          text.split("\r\n|\r|\n", -1).foreach { raw =>
            val line = raw.takeWhile(_ != '#').trim
            val c = line.indexOf(':')
            if (c > 0) {
              val key = line.substring(0, c).trim.toLowerCase
              val value = line.substring(c + 1).trim
              key match {
                case "user-agent" =>
                  if (inRules) flush()
                  agents :+= value.toLowerCase
                case "allow" | "disallow" =>
                  inRules = true
                  rules :+= (key, value)
                case "crawl-delay" =>
                  inRules = true
                  rules :+= ("crawl_delay", value)
                case "sitemap" => sitemaps += value // global, any position
                case _ => () // unknown directive: skipped per spec
              }
            }
          }
          flush()
          val exact = groups.filter(_.agents.contains(agent))
          val selected =
            if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
          val out = selected.flatMap(_.rules) ++ sitemaps.map("sitemap" -> _)
          if (out.isEmpty) Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null)))
          else out.zipWithIndex.map { case ((d, v), i) =>
            Row.fromSeq(r.toSeq ++ Seq(i, d, v, null))
          }
        } catch { case scala.util.control.NonFatal(e) =>
          errRow(s"robots parse failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** RFC 9309 path pattern → Java regex, as a codegen'd Column chain:
    * regex metacharacters escaped, '*' → '.*', a trailing '$' becomes
    * the end anchor (everything else is a prefix match). Exposed for
    * tests; [[robotsAllowed]] applies it to the rules side of the join.
    */
  private[ops] def patternRegex(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val core = when(anchored,
        pattern.substr(lit(1), length(pattern) - 1)).otherwise(pattern)
    val escaped = regexp_replace(core,
      "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Per-URL allow/disallow decision (RFC 9309 §2.2.2): the host's
    * allow/disallow rules collapse to ONE array row per key (regexes and
    * octet lengths computed rule-side, once per rule), that tiny frame
    * equi-joins onto the URLs, and the winner is picked PER ROW with
    * filter + array_max over (octet_length, is_allow, pattern) struct
    * ordering — longest-octet match wins (§2.2.2 counts octets, not
    * characters — non-ASCII patterns differ), allow breaks ties, a URL
    * matching no rule (or a host with no rules at all) is allowed.
    * Appends `robots_allowed` plus the winning `robots_rule` pattern
    * (null when allowed by default); input cardinality is preserved
    * exactly — no aggregation ever touches the URL side, so the corpus
    * pays at most the one equi-join exchange (none at all when the
    * per-host rules frame broadcasts, which AQE picks for any realistic
    * rule set). `rules` is [[parseRobots]]-shaped:
    * (keyCols…, directive, rule_value); only allow/disallow rows
    * participate in the decision; an empty `Disallow:` means allow-all
    * and is dropped.
    *
    * Also appends `crawl_delay_s` (double) — the host's effective
    * crawl-delay, the datum a frontier scheduler needs NEXT to the
    * allow bit: `crawl_delay` rows ride the SAME per-host aggregation
    * (no extra exchange), a non-numeric value parses to null (the ANSI
    * guard — a malformed directive must not kill the corpus pass), and
    * when merged groups disagree the LARGEST delay wins (crawl-delay is
    * a de-facto extension RFC 9309 leaves undefined; most-conservative
    * politeness is the only defensible merge). Null when the host
    * declares none.
    */
  def robotsAllowed(urls: DataFrame, pathCol: String,
      rules: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "robotsAllowed needs at least one key column")
    Multimodal.requireFreshColumns(urls, "robotsAllowed",
      Seq("robots_allowed", "robots_rule", "crawl_delay_s",
        "__rules", "__m", "__w"))
    val isPathRule = col("directive").isin("allow", "disallow") &&
      col("rule_value") =!= ""
    val delay = when(col("directive") === "crawl_delay" &&
      col("rule_value").rlike("^[0-9]+(\\.[0-9]+)?$"),
      col("rule_value").cast("double"))
    val rl = rules
      .where(col("directive").isin("allow", "disallow", "crawl_delay"))
      .select(keyCols.map(col) ++ Seq(
        when(isPathRule, struct(
          octet_length(col("rule_value")).as("l"),
          (col("directive") === "allow").as("a"),
          col("rule_value").as("p"),
          patternRegex(col("rule_value")).as("rx"))).as("__r"),
        delay.as("__d")): _*)
      .groupBy(keyCols.map(col): _*)
      // collect_list skips nulls: crawl_delay rows never enter the rule
      // array, path rules never enter the delay max
      .agg(collect_list(col("__r")).as("__rules"),
        max(col("__d")).as("crawl_delay_s"))
    urls.join(rl, keyCols, "left")
      .withColumn("__m", filter(col("__rules"),
        r => regexp_like(col(pathCol), r.getField("rx"))))
      .withColumn("__w", array_max(transform(col("__m"), r =>
        struct(r.getField("l").as("l"), r.getField("a").as("a"),
          r.getField("p").as("p")))))
      .withColumn("robots_allowed", coalesce(col("__w.a"), lit(true)))
      .withColumn("robots_rule", col("__w.p"))
      .drop("__rules", "__m", "__w")
  }

  /** Crawl-delay-aware fetch scheduling — the frontier step AFTER
    * [[robotsAllowed]]: within each host (the `keyCols` group), fetches
    * take a deterministic slot in `orderCol` order and
    * `fetch_at_s = fetch_slot × effective delay` (the host's
    * `crawl_delay_s` where declared, `defaultDelayS` otherwise) — the
    * pacing a polite fetcher must obey per RFC 9309's de-facto
    * crawl-delay extension. One window exchange keyed on the host:
    * politeness is a PER-HOST constraint, so scheduling is
    * embarrassingly parallel across hosts at any corpus size, and a
    * host's fan-in is its own URL count, never the corpus's. Appends
    * `fetch_slot` (0-based long) and `fetch_at_s` (double, seconds from
    * the host's first fetch). `tieBreakCols` extend the within-host sort
    * key: when `orderCol` can repeat inside a host (duplicate paths, a
    * constant priority), slots under a bare `orderCol` would be
    * partitioning-dependent — pass a unique column (the URL) to keep
    * `fetch_at_s` bit-reproducible across runs; with no tie-breakers,
    * `orderCol` must be unique per host group.
    */
  def politeSchedule(urls: DataFrame, keyCols: Seq[String], orderCol: String,
      delayCol: String = "crawl_delay_s",
      defaultDelayS: Double = 1.0,
      tieBreakCols: Seq[String] = Nil): DataFrame =
    politeScheduleBy(urls, keyCols,
      (orderCol +: tieBreakCols).map(col), delayCol, defaultDelayS)

  /** [[politeSchedule]] with an arbitrary within-host sort — the shape a
    * real frontier scheduler needs: `ORDER BY priority DESC,
    * discovered_at ASC, url` hands hot pages their host's earliest slots
    * while keeping `fetch_at_s` bit-reproducible. `orderBys` are Spark
    * sort Columns (`.desc`/`.asc` respected); the full key must be
    * unique per host group or slots become partitioning-dependent — end
    * with a unique column (the URL).
    */
  def politeScheduleBy(urls: DataFrame, keyCols: Seq[String],
      orderBys: Seq[org.apache.spark.sql.Column],
      delayCol: String = "crawl_delay_s",
      defaultDelayS: Double = 1.0): DataFrame = {
    require(keyCols.nonEmpty, "politeSchedule needs at least one key column")
    require(orderBys.nonEmpty, "politeSchedule needs at least one sort column")
    Multimodal.requireFreshColumns(urls, "politeSchedule",
      Seq("fetch_slot", "fetch_at_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderBys: _*)
    urls
      .withColumn("fetch_slot", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at_s",
        col("fetch_slot") * coalesce(col(delayCol), lit(defaultDelayS)))
  }
}
