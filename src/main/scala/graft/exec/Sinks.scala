package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output serializers (SURVEY §2.2, K1-K4). Input is the engine's quad
  * DataFrame `(s, p, o, g)` with fully-formatted N-Triples terms.
  */
object Sinks {

  /** K1: N-Triples / N-Quads lines. */
  def ntLines(quads: DataFrame): DataFrame = {
    val line = when(col("g").isNotNull,
      concat_ws(" ", col("s"), col("p"), col("o"), col("g"), lit(".")))
      .otherwise(concat_ws(" ", col("s"), col("p"), col("o"), lit(".")))
    quads.select(line.as("line"))
  }

  def writeNt(quads: DataFrame, path: String): Unit =
    ntLines(quads).write.mode("overwrite").text(path)

  /** Named-graph partitioned output (SURVEY §1.4: `partitionBy("graph")` on
    * write): one directory per graph, default graph under g=__default. At
    * scale this gives graph-pruned reads downstream for free.
    */
  def writeNtByGraph(quads: DataFrame, path: String): Unit = {
    val line = concat_ws(" ", col("s"), col("p"), col("o"), lit("."))
    quads.select(line.as("line"),
        coalesce(regexp_replace(col("g"), "[<>:/#]", "_"), lit("__default")).as("g"))
      .write.mode("overwrite").partitionBy("g").text(path)
  }

  /** T13: prefix compaction — `<ns…local>` → `prefix:local` when the IRI's
    * namespace is in the prefix map and the local part is PN_LOCAL-safe
    * (reference: determine_prefix semantify.py:190-209). Longest namespace
    * wins; literals/blank nodes fall through every pattern unchanged. The
    * prefix map is a compile-time constant, so the chain is a plain codegen
    * expression — no lookup table at runtime.
    */
  def compactIri(c: Column, prefixes: Map[String, String]): Column =
    prefixes.toSeq.sortBy(-_._2.length).foldLeft(c) { case (acc, (p, ns)) =>
      // PN_LOCAL-safe: no slashes/hash/colon, must not END with a dot
      regexp_replace(acc,
        "^<" + java.util.regex.Pattern.quote(ns) +
          "([A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)>$",
        p + ":$1")
    }

  /** K2: Turtle-style subject grouping — predicates joined with `;`, objects
    * of the same predicate with `,` (reference: turtle_print
    * functions.py:394-568). Done as two ordered aggregations, no driver
    * state; formatting stays distributed. IRIs are compacted against
    * `prefixes` (T13); `rdf:type` prints as `a`.
    */
  def turtleBlocks(quads: DataFrame, prefixes: Map[String, String] = Map.empty): DataFrame = {
    val rdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    def term(c: Column) = compactIri(c, prefixes)
    val pred = when(col("p") === rdfType, lit("a")).otherwise(term(col("p")))
    val byPred = quads
      .select(term(col("s")).as("s"), pred.as("p"), term(col("o")).as("o"))
      .groupBy(col("s"), col("p"))
      .agg(array_join(array_sort(collect_set(col("o"))), ", ").as("objs"))
      .select(col("s"), concat(col("p"), lit(" "), col("objs")).as("po"))
    byPred
      .groupBy(col("s"))
      .agg(array_join(array_sort(collect_list(col("po"))), " ;\n\t").as("body"))
      .select(concat(col("s"), lit(" "), col("body"), lit(" .")).as("block"))
  }

  /** Turtle prefix header from a prefix map (reference: prefix_extraction
    * semantify.py:168-187).
    */
  def turtleHeader(prefixes: Map[String, String]): String =
    prefixes.toSeq.sortBy(_._1)
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("\n")

  def writeTurtle(quads: DataFrame, prefixes: Map[String, String], path: String): Unit = {
    val blocks = turtleBlocks(quads, prefixes)
    blocks.write.mode("overwrite").text(path)
    val header = turtleHeader(prefixes)
    if (header.nonEmpty) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        blocks.sparkSession.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(path, "_00_prefixes.ttl"))
      out.write((header + "\n").getBytes("UTF-8")); out.close()
    }
  }

  /** K3: logical-target routing — each target gets the quads matching its
    * predicate filter (reference: semantify.py:3346-3400). Returns the routed
    * frame with a `target` column; callers fan out one write per target.
    */
  def routeTargets(quads: DataFrame, targets: Map[String, Column]): DataFrame =
    targets.map { case (name, pred) =>
      quads.where(pred).withColumn("target", lit(name))
    }.reduceLeft(_.unionByName(_))

  /** One logical target: a quad filter routed to its own output path with
    * its own serialization and optional compression codec (reference:
    * logical-target rewrite/compress loop semantify.py:10019-10086;
    * serializations jsonld/n3/rdfjson/ttl, compression gz/zip/tar.*).
    */
  final case class TargetSpec(
      pred: Column,
      path: String,
      serialization: String = "ntriples",
      compression: Option[String] = None)

  /** K3 end-to-end: write each target's matching quads in its requested
    * serialization; compression rides on the Hadoop codec
    * (`option("compression", …)`) instead of the reference's re-read-and-
    * compress loop, so the write stays distributed.
    */
  def writeLogicalTargets(quads: DataFrame, targets: Seq[TargetSpec],
      prefixes: Map[String, String] = Map.empty): Unit =
    targets.foreach { t =>
      val routed = quads.where(t.pred)
      val lines = t.serialization.toLowerCase match {
        case "turtle" | "ttl" => turtleBlocks(routed, prefixes)
        case "jsonld" | "json-ld" => jsonLdLines(routed)
        case "rdfjson" | "json" =>
          rdfJson(routed).select(concat(col("s"), lit(" "), col("json")).as("line"))
        case _ => ntLines(routed)
      }
      val w = lines.write.mode("overwrite")
      t.compression.fold(w)(c => w.option("compression", c)).text(t.path)
    }

  /** K4: flattened JSON-LD — one JSON object per subject per line:
    * `{"@id": s, p: [{"@id"|"@value"…}]}` with `@type`/`@language` for
    * typed/tagged literals. N-Triples escaping (\" \\ \n \r \t) is valid
    * JSON string escaping, so the lexical forms pass through unchanged.
    */
  def jsonLdLines(quads: DataFrame): DataFrame = {
    def iriBody(c: Column): Column =
      when(c.startsWith("<"), regexp_extract(c, "^<(.*)>$", 1)).otherwise(c) // bnode as-is
    val litVal = regexp_extract(col("o"), "^\"(.*)\"", 1)
    val dt = regexp_extract(col("o"), "\\^\\^<(.*)>$", 1)
    val lang = regexp_extract(col("o"), "@([A-Za-z][A-Za-z0-9-]*)$", 1)
    val oJson = when(col("o").startsWith("<") || col("o").startsWith("_:"),
        concat(lit("{\"@id\":\""), iriBody(col("o")), lit("\"}")))
      .otherwise(concat(lit("{\"@value\":\""), litVal, lit("\""),
        when(dt =!= "", concat(lit(",\"@type\":\""), dt, lit("\"")))
          .otherwise(when(lang =!= "", concat(lit(",\"@language\":\""), lang, lit("\"")))
            .otherwise(lit(""))),
        lit("}")))
    quads
      .groupBy(col("s"), col("p"))
      .agg(concat_ws(",", array_sort(collect_set(oJson))).as("vals"))
      .select(col("s"),
        concat(lit("\""), iriBody(col("p")), lit("\":["), col("vals"), lit("]")).as("entry"))
      .groupBy(col("s"))
      .agg(concat_ws(",", array_sort(collect_list(col("entry")))).as("body"))
      .select(concat(lit("{\"@id\":\""), iriBody(col("s")), lit("\","), col("body"), lit("}")).as("line"))
  }

  /** RDF-JSON-shaped grouping `{s: {p: [o…]}}` (reference:
    * functions.py:66-76) as a JSON string per subject.
    */
  def rdfJson(quads: DataFrame): DataFrame =
    quads.groupBy(col("s"), col("p"))
      .agg(array_sort(collect_set(col("o"))).as("objs"))
      .groupBy(col("s"))
      .agg(to_json(map_from_entries(array_sort(collect_list(struct(col("p"), col("objs")))))).as("json"))
}
