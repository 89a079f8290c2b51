package graft.sources

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Reads a [[LogicalSource]] into a DataFrame (SURVEY §2.1, S1-S9).
  *
  * The reference normalizes every source into rows-as-string-dicts
  * (reference: semantify.py:10330-10339 CSV, 4935-4960 JSON, 3901-3956 XML);
  * here each source becomes a DataFrame and the engine treats values as
  * strings at the term boundary (cast in the term compiler), keeping the
  * scan columnar and prunable.
  */
object SourceReader {

  def read(spark: SparkSession, source: LogicalSource): DataFrame = source match {
    case LogicalSource.CsvSource(path0, delim) =>
      val path = resolvePath(path0)
      // dtype=str semantics: read everything as string so downstream term
      // construction is byte-faithful (no float mangling of "007").
      spark.read
        .option("header", "true")
        .option("delimiter", delim)
        .option("inferSchema", "false")
        // standard CSV `""` quote escaping (pandas/RFC4180 semantics —
        // Spark's default escape is backslash)
        .option("escape", "\"")
        .option("mode", "DROPMALFORMED") // ragged-row rejection (SURVEY P6)
        .csv(path)

    case LogicalSource.JsonSource(path, iterator, multiLine) =>
      val p = resolvePath(path)
      val raw = spark.read.option("multiLine", multiLine.toString).json(p)
      val steps = parseIteratorSteps(iterator)
      val nRoot = steps.takeWhile(_ == IterStep.Explode).length
      if (nRoot <= 1) applyIteratorSteps(raw, steps)
      else {
        // ROOT `$[*][*]…`: spark.read.json flattens nested root arrays
        // straight to the LEAF object schema but cannot parse the rows
        // (each top-level element is an array, not an object — every
        // field lands null). Re-parse each document with the inferred
        // leaf schema wrapped in one ArrayType per root level, then
        // explode level by level.
        var tpe: org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StructType(raw.schema)
        (0 until nRoot).foreach(_ => tpe = ArrayType(tpe))
        var cur = spark.read.option("wholetext", multiLine.toString).text(p)
          .select(from_json(col("value"), tpe).as("_v"))
        (0 until nRoot).foreach(_ => cur = cur.select(explode(col("_v")).as("_v")))
        applyIteratorSteps(cur.select(col("_v.*")), steps.drop(nRoot))
      }

    case LogicalSource.XmlSource(path0, iterator, parentAxis) =>
      val path = resolvePath(path0)
      // Spark 4.x ships a built-in XML source; rowTag = last iterator step.
      val steps = iterator.split("/").filter(_.nonEmpty)
      if (!parentAxis || steps.length < 2) {
        val rowTag = steps.lastOption.getOrElse("row")
        spark.read.format("xml").option("rowTag", rowTag).load(path)
      } else {
        // `..` axis (SURVEY T3; reference: functions.py:186-208): read one
        // level up so parent fields survive, then explode the leaf element.
        // Parent fields become __parent_<name>; leaf fields stay top-level.
        val (parentTag, childTag) = (steps(steps.length - 2), steps.last)
        val p = spark.read.format("xml").option("rowTag", parentTag).load(path)
        val parentCols = p.schema.fieldNames.filter(_ != childTag)
        val renamed = parentCols.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"__parent_$c"))
        val childIsArray = p.schema.apply(childTag).dataType.isInstanceOf[ArrayType]
        val exploded =
          if (childIsArray) renamed.withColumn(childTag, explode(col(childTag)))
          else renamed
        exploded.select((col(s"$childTag.*") +:
          parentCols.toIndexedSeq.map(c => col(s"__parent_$c"))): _*)
      }

    case LogicalSource.ParquetSource(path) =>
      spark.read.parquet(path)

    case LogicalSource.OrcSource(path) =>
      // columnar siblings of parquet are first-class Spark sources; the
      // reference has no ORC reader — beyond-parity format breadth
      spark.read.orc(resolvePath(path))

    case LogicalSource.JdbcSource(url, _, query, tableName, user, password) =>
      val r = spark.read.format("jdbc").option("url", url)
        .option("user", user).option("password", password)
      (query, tableName) match {
        case (Some(q), _) => r.option("query", q).load()
        case (_, Some(t)) => r.option("dbtable", t).load()
        case _ => throw new IllegalArgumentException("JDBC source needs query or tableName")
      }

    case LogicalSource.NTriplesSource(path, query) =>
      // Line-parse N-Triples with a regex (SURVEY S7): s p o from each line.
      val lines = spark.read.text(resolvePath(path))
      val pat = "^(\\S+)\\s+(\\S+)\\s+(.*?)\\s*\\.\\s*$"
      val triples = lines
        .select(
          regexp_extract(col("value"), pat, 1).as("subject"),
          regexp_extract(col("value"), pat, 2).as("predicate"),
          regexp_extract(col("value"), pat, 3).as("object"))
        .filter(col("subject") =!= "")
      // a SELECT iterator runs as a SPARQL BGP over the triple frame
      // (reference: rdflib g.query(iterator), semantify.py:9990-10011);
      // otherwise rows are the raw s/p/o tokens
      if (query != null && """(?is).*select\s.*""".r.matches(query.trim))
        SparqlIterator(triples, query)
      else triples

    case LogicalSource.SparqlSource(endpoint, query) =>
      // S6: SPARQL SELECT results land as W3C results-JSON; each binding var
      // flattens to its `value` string (reference: semantify.py:10114-10123).
      // http(s) endpoints are queried live over the SPARQL protocol (GET
      // with `query=`, Accept results+json — reference: semantify.py:
      // 10104-10112); the response lands in a temp file and the
      // distributed scan reads the local copy, same shape as S8 remote
      // file sources. Non-http paths are pre-fetched results-JSON files.
      val path = endpoint.stripPrefix("endpoint:").stripPrefix("file://")
      if (path.startsWith("http://") || path.startsWith("https://"))
        sparqlBindings(spark, fetchSparqlResults(path, query))
      else
        sparqlBindings(spark, path)

    case v: LogicalSource.ViewSource =>
      graft.exec.ViewExec.compile(spark, v)
  }

  // Remote downloads / inflated archives resolved once per JVM per path —
  // repeated reads of the same source (several TMs, parent builds) reuse
  // the local copy instead of re-fetching.
  private val resolvedPaths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Live S6 fetch: one SPARQL-protocol GET per distinct (endpoint, query)
    * per JVM — the bindings file is bounded (a SELECT result set), the
    * distributed scan happens on the local copy.
    */
  private def fetchSparqlResults(endpoint: String, query: String): String =
    resolvedPaths.computeIfAbsent(s"sparql:$endpoint $query", { _ =>
      val sep = if (endpoint.contains("?")) "&" else "?"
      val url = endpoint + sep + "query=" +
        java.net.URLEncoder.encode(query, "UTF-8") + "&format=json"
      val conn = java.net.URI.create(url).toURL.openConnection()
      conn.setRequestProperty("Accept", "application/sparql-results+json")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sparql").resolve("bindings.json")
      val in = try conn.getInputStream
        catch { case e: java.io.IOException =>
          throw new java.io.IOException(
            s"failed to query SPARQL endpoint $endpoint: ${e.getMessage}", e) }
      try java.nio.file.Files.copy(in, tmp)
      finally in.close()
      tmp.toString
    })

  /** S8 + archive sources: make a path spark.read can scan.
    *
    * - `http(s)://` file sources download to a temp file at read time
    *   (reference fetches remote CSV/JSON/XML inline, semantify.py:10225-10235).
    *   This is a bounded driver-side stream — remote dumps are one file, the
    *   distributed scan happens on the local copy.
    * - `.zip` / `.tar.gz` / `.tar.xz` / `.tar` archives inflate into a temp
    *   dir (reference: semantify.py:10577-10626); Spark then scans the
    *   extracted files as a directory. Bare `.gz` stays native (Hadoop codec).
    */
  def resolvePath(path: String): String = {
    val isRemote = path.startsWith("http://") || path.startsWith("https://")
    val lower = path.toLowerCase
    val isArchive = lower.endsWith(".zip") || lower.endsWith(".tar.gz") ||
      lower.endsWith(".tar.xz") || lower.endsWith(".tar")
    if (!isRemote && !isArchive) path
    else resolvedPaths.computeIfAbsent(path, { _ =>
      val local =
        if (isRemote) {
          val name = path.substring(path.lastIndexOf('/') + 1) match {
            case "" => "download"
            case n => n.takeWhile(c => c != '?' && c != '#')
          }
          val tmp = java.nio.file.Files.createTempDirectory("graft_http").resolve(name)
          val in = try java.net.URI.create(path).toURL.openStream()
            catch { case e: java.io.IOException =>
              throw new java.io.IOException(s"failed to fetch remote source $path: ${e.getMessage}", e) }
          try java.nio.file.Files.copy(in, tmp)
          finally in.close()
          tmp.toString
        } else path
      if (isArchive) inflateArchive(local) else local
    })
  }

  /** Extract every entry of a zip / tar[.gz|.xz] archive into a fresh temp
    * dir (streaming, constant memory) and return the dir path.
    */
  private def inflateArchive(file: String): String = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
    val outDir = java.nio.file.Files.createTempDirectory("graft_arch")
    val lower = file.toLowerCase
    val raw = new java.io.BufferedInputStream(new java.io.FileInputStream(file))
    val archIn: org.apache.commons.compress.archivers.ArchiveInputStream[_ <: org.apache.commons.compress.archivers.ArchiveEntry] =
      if (lower.endsWith(".zip")) new ZipArchiveInputStream(raw)
      else if (lower.endsWith(".tar.gz")) new TarArchiveInputStream(new java.util.zip.GZIPInputStream(raw))
      else if (lower.endsWith(".tar.xz")) new TarArchiveInputStream(new org.tukaani.xz.XZInputStream(raw))
      else new TarArchiveInputStream(raw)
    try {
      var e: org.apache.commons.compress.archivers.ArchiveEntry = archIn.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          // Flatten the entry path into the temp dir (Spark's default file
          // listing is non-recursive), keeping it unique: `a/data.csv` and
          // `b/data.csv` become `a__data.csv` / `b__data.csv` instead of
          // silently overwriting each other. Path traversal segments are
          // dropped so entries cannot escape the temp dir.
          val name = e.getName.replace('\\', '/').split('/')
            .filter(s => s.nonEmpty && s != "." && s != "..")
            .mkString("__")
          if (name.isEmpty)
            throw new java.io.IOException(s"archive $file: unextractable entry name '${e.getName}'")
          val dest = outDir.resolve(name)
          if (java.nio.file.Files.exists(dest))
            throw new java.io.IOException(
              s"archive $file: duplicate entry name '${e.getName}' collides at $dest")
          val out = java.nio.file.Files.newOutputStream(dest)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = archIn.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = archIn.read(buf) }
          } finally out.close()
        }
        e = archIn.getNextEntry
      }
    } finally archIn.close()
    outDir.toString
  }

  /** Flatten a W3C SPARQL-results JSON document into one row per binding,
    * one string column per variable (the binding's `value`; type/lang/
    * datatype metadata is dropped, matching the reference).
    */
  def sparqlBindings(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val b = raw.select(explode(col("results.bindings")).as("b"))
    val vars = b.schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    b.select(vars.map(v => col(s"b.$v.value").as(v)): _*)
  }

  /** Apply a JSONPath-subset iterator ($.a.b[*], $[*], nested [*][*]) as a
    * chain of select/explode steps — each [*] is a Spark `explode`, each name
    * step a struct field access (SURVEY S2).
    *
    * The walk is value-based (the current node rides in one column) so
    * consecutive `[*][*]` steps — arrays of arrays, a shape the reference's
    * recursive descent iterates (semantify.py:4952-4960) — explode once per
    * `[*]` instead of looking up a literal field named `a[*]`.
    */
  def applyJsonIterator(df: DataFrame, iterator: String): DataFrame =
    applyIteratorSteps(df, parseIteratorSteps(iterator))

  private def applyIteratorSteps(df: DataFrame,
      steps: List[IterStep]): DataFrame = {
    if (steps.isEmpty) return df
    var cur = df
    // None = still in row-of-columns context (document root)
    var node: Option[org.apache.spark.sql.Column] = None
    var rootExploded = false // first root [*] consumed by spark.read.json
    def nodeType: org.apache.spark.sql.types.DataType =
      cur.select(node.get.as("_v")).schema.head.dataType
    steps.foreach {
      case IterStep.Field(name) =>
        node = Some(node.map(_.getField(name)).getOrElse(col(name)))
      case IterStep.Explode =>
        node match {
          case None if !rootExploded =>
            // root [*]: spark.read.json already yields one row per element
            rootExploded = true
          case None =>
            // `$[*][*]` — root array of arrays: read.json made each inner
            // ARRAY a row; that row is a single array column, which this
            // level explodes (previously both root [*] no-opped and the
            // inner level was never iterated)
            cur.schema.fields match {
              case Array(f) if f.dataType.isInstanceOf[ArrayType] =>
                cur = cur.select(explode(col(f.name)).as("_v"))
                node = Some(col("_v"))
              case _ =>
                // row is already an object (reference walk iterates a
                // non-array node as itself): keep row-of-columns context
                ()
            }
          case Some(c) =>
            // a [*] step over a single object iterates it as one row
            // (reference JSONPath walk tolerates both shapes)
            if (nodeType.isInstanceOf[ArrayType]) {
              cur = cur.select(explode(c).as("_v")); node = Some(col("_v"))
            } else {
              cur = cur.select(c.as("_v")); node = Some(col("_v"))
            }
        }
    }
    node match {
      case None => cur
      case Some(c) => nodeType match {
        case _: org.apache.spark.sql.types.StructType =>
          cur.select(c.as("_v")).select(col("_v.*"))
        case _ =>
          // scalar/array leaf rows (iterator lands on non-objects): keep
          // the single column under a stable name instead of failing `.*`
          cur.select(c.as("value"))
      }
    }
  }

  sealed trait IterStep
  object IterStep {
    final case class Field(name: String) extends IterStep
    case object Explode extends IterStep
  }

  def parseIteratorSteps(iterator: String): List[IterStep] = {
    val it = iterator.trim.stripPrefix("$")
    if (it.isEmpty || it == ".") return Nil
    val tokens = it.split("\\.").filter(_.nonEmpty).toList
    tokens.flatMap { tok =>
      // peel trailing [*] groups: `a[*][*]` → Field(a), Explode, Explode;
      // a bare `[*]`/`[*][*]` token is explode-only (root arrays)
      var base = tok
      var explodes = 0
      while (base.endsWith("[*]")) { base = base.stripSuffix("[*]"); explodes += 1 }
      (if (base.nonEmpty) List(IterStep.Field(base)) else Nil) :::
        List.fill(explodes)(IterStep.Explode)
    }
  }
}
