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
  * robots.txt is ≤ a few hundred KB); the decision is a broadcast-ready
  * equi-join on the host key — rules frames are per-host tiny, URL
  * frames are the corpus, so the corpus never shuffles.
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
          val text = r.getAs[String](idx)
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
          text.linesIterator.foreach { raw =>
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

  /** Per-URL allow/disallow decision (RFC 9309 §2.2.2): join URLs to the
    * host's allow/disallow rules on `keyCols`, keep rules whose pattern
    * matches the path, and let the LONGEST pattern win with allow
    * breaking ties; a URL matching no rule (or a host with no rules at
    * all) is allowed. Appends `robots_allowed` plus the winning
    * `robots_rule` pattern (null when allowed by default). `rules` is
    * [[parseRobots]]-shaped: (keyCols…, directive, rule_value); only
    * allow/disallow rows participate. The rules side is per-host tiny —
    * broadcast it when the key space fits, and the URL corpus never
    * shuffles.
    */
  def robotsAllowed(urls: DataFrame, pathCol: String,
      rules: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "robotsAllowed needs at least one key column")
    val rl = rules
      .where(col("directive").isin("allow", "disallow") &&
        col("rule_value") =!= "") // an empty Disallow: means allow-all
      .select(keyCols.map(col) :+ col("directive") :+
        col("rule_value").as("__pat"): _*)
    val joined = urls.join(rl, keyCols, "left")
      .withColumn("__m",
        col("__pat").isNotNull &&
          regexp_like(col(pathCol), patternRegex(col("__pat"))))
    // longest-octet match wins, allow beats disallow on ties: struct
    // ordering (length, is_allow) under max_by does exactly that
    val urlCols = urls.columns.map(col).toSeq
    joined.groupBy(urlCols: _*)
      .agg(max_by(
          struct(col("directive").as("d"), col("__pat").as("p")),
          when(col("__m"),
            struct(length(col("__pat")).as("l"),
              (col("directive") === "allow").as("a")))).as("__w"))
      .withColumn("robots_allowed",
        coalesce(col("__w.d") === "allow", lit(true)))
      .withColumn("robots_rule", col("__w.p"))
      .drop("__w")
  }
}
