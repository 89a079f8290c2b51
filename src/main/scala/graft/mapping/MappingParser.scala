package graft.mapping

import graft.model._

/** Extracts the RML mapping IR from a parsed Turtle graph.
  *
  * Covers the constructs the reference extracts with its SPARQL queries over
  * the mapping graph (reference: semantify.py:1844-3899, legacy dialect at
  * 2477-2686): logical sources (rml:source + referenceFormulation + iterator
  * / rr:tableName / rml:query), subject maps (template / reference / constant
  * / function / blank), rr:class, graph maps, predicate-object maps with
  * constant shortcuts, datatype/language (+ dynamic maps), termType,
  * RefObjectMaps with (multi-)join conditions, and FnML function values.
  */
object MappingParser {
  private val RR = "http://www.w3.org/ns/r2rml#"
  private val RML = "http://semweb.mmlab.be/ns/rml#"
  private val RML2 = "http://w3id.org/rml/" // new W3C dialect
  private val QL = "http://semweb.mmlab.be/ns/ql#"
  private val FNML = "http://semweb.mmlab.be/ns/fnml#"
  private val FNO = "https://w3id.org/function/ontology#"
  private val RDF_TYPE = TurtleParser.RDF_TYPE

  /** Predicates/classes of the new W3C dialect (w3id.org/rml/) that map to
    * the legacy rr: namespace; everything else in RML2 maps to the legacy
    * mmlab rml: namespace (the reference parses both dialects with separate
    * SPARQL extractions, semantify.py:1871-2475 vs 2477-2686 — we normalize
    * the graph instead).
    */
  private val toRr = Set(
    "TriplesMap", "subjectMap", "subject", "predicateObjectMap", "predicate",
    "predicateMap", "object", "objectMap", "constant", "template", "termType",
    "class", "graph", "graphMap", "datatype", "language", "parentTriplesMap",
    "joinCondition", "child", "parent", "tableName", "sqlQuery", "column",
    "IRI", "BlankNode", "Literal")

  private def normalizeDialect(g: RdfGraph): RdfGraph = {
    def norm(t: RdfTerm): RdfTerm = t match {
      case Iri(v) if v.startsWith(RML2) =>
        val local = v.substring(RML2.length)
        if (toRr(local)) Iri(RR + local) else Iri(RML + local)
      case other => other
    }
    g.copy(triples = g.triples.map { case (s, p, o) => (norm(s), norm(p), norm(o)) })
  }

  def parse(turtle: String, sourceDir: String = ""): MappingDoc = {
    val g = normalizeDialect(TurtleParser.parse(turtle))
    val tmNodes = (g.subjectsWith(RDF_TYPE, Iri(RR + "TriplesMap")) ++
      g.subjectsWith(RDF_TYPE, Iri(RML + "NonAssertedTriplesMap")) ++
      g.triples.collect { case (s, Iri(p), _) if p == RML + "logicalSource" => s }).distinct
    val tms = tmNodes.map(n => parseTriplesMap(g, n, sourceDir)).toList
    MappingDoc(tms, g.prefixes, g.base)
  }

  private def termId(t: RdfTerm): String = t match {
    case Iri(v) => v
    case BNode(l) => "_:" + l
    case Lit(v, _, _) => v
  }

  private def lex(t: RdfTerm): String = t match {
    case Lit(v, _, _) => v
    case Iri(v) => v
    case BNode(l) => l
  }

  private def parseTriplesMap(g: RdfGraph, node: RdfTerm, sourceDir: String): TriplesMap = {
    val source = parseLogicalSource(g, node, sourceDir)
    val subject = parseSubjectMap(g, node)
    val poms = g.objects(node, RR + "predicateObjectMap").flatMap(parsePom(g, _)).toList
    val nonAsserted = g.objects(node, RDF_TYPE)
      .exists { case Iri(v) => v.endsWith("NonAssertedTriplesMap"); case _ => false }
    // per-TM rml:baseIRI overrides the document @base (reference:
    // semantify.py:2150 parse, 3147-3150 per-TM base_iri_list)
    val tmBase = g.obj(node, RML + "baseIRI").map(lex)
    TriplesMap(termId(node), source, subject, poms, tmBase.orElse(g.base),
      asserted = !nonAsserted)
  }

  private def parseLogicalSource(g: RdfGraph, tm: RdfTerm, sourceDir: String): LogicalSource = {
    val ls = g.obj(tm, RML + "logicalSource")
      .orElse(g.obj(tm, RR + "logicalTable"))
      .getOrElse(throw new IllegalArgumentException(s"TriplesMap ${termId(tm)} has no logical source"))
    val srcNode = g.obj(ls, RML + "source")
    // Structured source descriptors (S8; reference SPARQL:
    // semantify.py:2151-2191): csvw:url (+dialect delimiter),
    // dcat:downloadURL, void:dataDump, rml:path, sd:endpoint, d2rq:Database,
    // WoT Thing Descriptions (td:/hctl:).
    val CSVW = "http://www.w3.org/ns/csvw#"
    val DCAT = "http://www.w3.org/ns/dcat#"
    val VOID = "http://rdfs.org/ns/void#"
    val SD = "http://www.w3.org/ns/sparql-service-description#"
    val D2RQ = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"
    val TD = "https://www.w3.org/2019/wot/td#"
    val HCTL = "https://www.w3.org/2019/wot/hypermedia#"
    // WoT TD form resolution, both reference shapes (semantify.py:2180-2183
    // property-affordance hop, :2526-2527 direct td:hasForm): the form's
    // hctl:hasTarget is the source URL, like csvw:url/dcat:downloadURL.
    def tdForm(n: RdfTerm): Option[RdfTerm] =
      g.obj(n, TD + "hasPropertyAffordance").flatMap(a => g.obj(a, TD + "hasForm"))
        .orElse(g.obj(n, TD + "hasForm"))
    def descPath(n: RdfTerm): Option[String] =
      g.obj(n, CSVW + "url").map(lex)
        .orElse(g.obj(n, DCAT + "downloadURL").map(lex))
        .orElse(g.obj(n, DCAT + "distribution").flatMap(d => g.obj(d, DCAT + "downloadURL")).map(lex))
        .orElse(g.obj(n, VOID + "dataDump").map(lex))
        .orElse(g.obj(n, RML + "path").map(lex))
        .orElse(tdForm(n).flatMap(f => g.obj(f, HCTL + "hasTarget")).map(lex))
    // hctl:forContentType on the TD form picks the formulation when the
    // mapping omits rml:referenceFormulation (a TD names a web API's media
    // type; the mapping often carries no ql: hint of its own)
    val descContentType: Option[String] =
      srcNode.flatMap(tdForm).flatMap(f => g.obj(f, HCTL + "forContentType")).map(lex)
    val descDelimiter: Option[String] = srcNode.flatMap(n =>
      g.obj(n, CSVW + "dialect").flatMap(d => g.obj(d, CSVW + "delimiter")).map(lex))
    val descEndpoint: Option[String] = srcNode.flatMap(n => g.obj(n, SD + "endpoint").map(lex))
    val descJdbc: Option[LogicalSource.JdbcSource] = srcNode.flatMap { n =>
      g.obj(n, D2RQ + "jdbcDSN").map { dsn =>
        LogicalSource.JdbcSource(lex(dsn), "generic",
          g.obj(ls, RML + "query").map(lex), g.obj(ls, RR + "tableName").map(lex),
          g.obj(n, D2RQ + "username").map(lex).getOrElse(""),
          g.obj(n, D2RQ + "password").map(lex).getOrElse(""))
      }
    }
    val sourceVal = srcNode.flatMap {
      case n @ (BNode(_) | Iri(_)) if descPath(n).isDefined => descPath(n)
      case other => Some(lex(other))
    }
    val path = sourceVal.map { p0 =>
      // file:// URIs (the TD/descriptor shape for local dumps) scan as
      // plain paths — reference strips the scheme the same way
      // (semantify.py:3700)
      val p = if (p0.startsWith("file://")) p0.substring(7) else p0
      val cleaned = if (p.startsWith("./")) p.substring(2) else p
      if (cleaned.startsWith("/") || sourceDir.isEmpty) cleaned else s"$sourceDir/$cleaned"
    }
    val formulation = g.obj(ls, RML + "referenceFormulation").map(lex).getOrElse {
      descContentType.map(_.toLowerCase) match {
        case Some(ct) if ct.contains("json") => QL + "JSONPath"
        case Some(ct) if ct.contains("xml") => QL + "XPath"
        case _ => QL + "CSV"
      }
    }
    val iterator = g.obj(ls, RML + "iterator").map(lex)
    val tableName = g.obj(ls, RR + "tableName").map(lex)
    val query = g.obj(ls, RML + "query").map(lex).orElse(g.obj(ls, RR + "sqlQuery").map(lex))

    if (g.obj(ls, RML + "viewOn").isDefined)
      // RML-LV logical view (SURVEY §2.10; reference: semantify.py:2012-2133)
      parseLogicalView(g, ls, sourceDir)
    else if (descJdbc.isDefined)
      descJdbc.get
    else if (descEndpoint.isDefined)
      // the SPARQL query text may arrive as rml:query (sd descriptor
      // mappings) or as the rml:iterator (reference mapping shape)
      LogicalSource.SparqlSource("endpoint:" + descEndpoint.get,
        query.orElse(iterator).getOrElse(""))
    else if (sourceVal.exists(_.startsWith("endpoint:")))
      // S6: "endpoint:…" source + SPARQL iterator query (reference:
      // semantify.py:10104-10123); http(s) endpoints are queried live,
      // anything else is a pre-fetched results-JSON file
      LogicalSource.SparqlSource(sourceVal.get, query.orElse(iterator).getOrElse(""))
    else if (tableName.isDefined || query.isDefined)
      LogicalSource.JdbcSource("", "generic", query, tableName)
    else if (iterator.exists(_.trim.toLowerCase.startsWith("select ")))
      // SQL iterator: the reference treats a SELECT in rml:iterator as the
      // database query (functions.py:888-890)
      LogicalSource.JdbcSource("", "generic", iterator.map(_.trim), None)
    else formulation match {
      case f if f.endsWith("CSV") || f.endsWith("TSV") =>
        val delim = descDelimiter.getOrElse(if (f.endsWith("TSV")) "\t" else ",")
        val p = path.getOrElse(fail(tm, "CSV source without path"))
        if (p.endsWith(".parquet")) LogicalSource.ParquetSource(p)
        else if (p.endsWith(".orc")) LogicalSource.OrcSource(p)
        else if (p.endsWith(".nt")) LogicalSource.NTriplesSource(p, iterator.getOrElse(""))
        else LogicalSource.CsvSource(p, delim)
      case f if f.endsWith("JSONPath") || f.endsWith("JSON") =>
        val p = path.getOrElse(fail(tm, "JSON source without path"))
        // `.jsonl` = JSON-lines (one value per line, the distributed-
        // write-friendly shape): scan splits per line instead of parsing
        // the whole file as one document
        LogicalSource.JsonSource(p, iterator.getOrElse("$"),
          multiLine = !p.endsWith(".jsonl"))
      case f if f.endsWith("XPath") || f.endsWith("XML") =>
        LogicalSource.XmlSource(path.getOrElse(fail(tm, "XML source without path")), iterator.getOrElse("/"))
      case f if f.endsWith("Parquet") =>
        LogicalSource.ParquetSource(path.getOrElse(fail(tm, "parquet source without path")))
      case f if f.endsWith("ORC") || f.endsWith("Orc") =>
        LogicalSource.OrcSource(path.getOrElse(fail(tm, "ORC source without path")))
      case other => fail(tm, s"unsupported referenceFormulation: $other")
    }
  }

  private def fail(tm: RdfTerm, msg: String): Nothing =
    throw new IllegalArgumentException(s"TriplesMap ${termId(tm)}: $msg")

  /** RML-LV logical view: rml:viewOn (a logical-source-shaped node, or
    * another view — V4) + rml:field projections (reference view SPARQL:
    * semantify.py:2012-2060).
    */
  private def parseLogicalView(g: RdfGraph, ls: RdfTerm, sourceDir: String): LogicalSource = {
    val von = g.obj(ls, RML + "viewOn").get
    val base: LogicalSource =
      if (g.obj(von, RML + "viewOn").isDefined) parseLogicalView(g, von, sourceDir)
      else {
        val srcNode = g.obj(von, RML + "source")
        val path0 = srcNode.flatMap(n => g.obj(n, RML + "path").map(lex))
          .orElse(srcNode.map(lex))
          .getOrElse(fail(ls, "logical view base without rml:source"))
        val path =
          if (path0.startsWith("/") || sourceDir.isEmpty) path0.stripPrefix("./")
          else s"$sourceDir/${path0.stripPrefix("./")}"
        val form = g.obj(von, RML + "referenceFormulation").map(lex).getOrElse(QL + "JSONPath")
        val iter = g.obj(von, RML + "iterator").map(lex)
        form match {
          case f if f.endsWith("CSV") || f.endsWith("TSV") =>
            LogicalSource.CsvSource(path, if (f.endsWith("TSV")) "\t" else ",")
          case f if f.endsWith("Parquet") => LogicalSource.ParquetSource(path)
          case f if f.endsWith("XPath") || f.endsWith("XML") =>
            LogicalSource.XmlSource(path, iter.getOrElse("/"))
          case _ => LogicalSource.JsonSource(path, iter.getOrElse("$"))
        }
      }
    val fields = g.objects(ls, RML + "field").map(parseViewField(g, _)).toList
    def parseViewJoin(kind: String)(jn: RdfTerm): ViewJoin = {
      val parentNode = g.obj(jn, RML + "parentLogicalView")
        .getOrElse(fail(ls, s"$kind view join without rml:parentLogicalView"))
      val parentSrc = parseLogicalView(g, parentNode, sourceDir)
      val jc = g.obj(jn, RML + "joinCondition")
      val childAttrs = jc.toList.flatMap(c => g.objects(c, RML + "child").map(lex))
      val parentAttrs = jc.toList.flatMap(c => g.objects(c, RML + "parent").map(lex))
      val jFields = g.objects(jn, RML + "field").map(parseViewField(g, _)).toList
      ViewJoin(kind, termId(parentNode), childAttrs, parentAttrs, Some(parentSrc), jFields)
    }
    val joins = g.objects(ls, RML + "innerJoin").map(parseViewJoin("inner")).toList ++
      g.objects(ls, RML + "leftJoin").map(parseViewJoin("left")).toList
    LogicalSource.ViewSource(termId(ls), base, fields, joins)
  }

  private def parseViewField(g: RdfGraph, node: RdfTerm): ViewField = {
    val name = g.obj(node, RML + "fieldName").map(lex).getOrElse("field")
    val inners = g.objects(node, RML + "field").toList
    // an inner field carrying rml:referenceFormulation declares an EMBEDDED
    // format for this field's cell (CSV-in-JSON etc.,
    // reference: lv_functions.py:293-306); its own children pick columns
    val embedded = inners.find(i => g.obj(i, RML + "referenceFormulation").isDefined)
    val (innerFormulation, innerFields) = embedded match {
      case Some(e) => (g.obj(e, RML + "referenceFormulation").map(lex),
        g.objects(e, RML + "field").map(parseViewField(g, _)).toList)
      case None => (None, inners.map(parseViewField(g, _)))
    }
    ViewField(name,
      g.obj(node, RML + "reference").map(lex),
      g.obj(node, RML + "constant").map(lex),
      g.obj(node, RML + "template").map(lex),
      g.obj(node, RML + "iterator").map(lex),
      innerFields,
      innerFormulation)
  }

  private def parseSubjectMap(g: RdfGraph, tm: RdfTerm): SubjectMap = {
    g.obj(tm, RR + "subject") match {
      case Some(const) =>
        return SubjectMap(TermMap(TermKind.Constant, termId(const), Some(TermType.Iri)))
      case None =>
    }
    val sm = g.obj(tm, RR + "subjectMap")
      .getOrElse(fail(tm, "no subjectMap"))
    val term = parseTermMap(g, sm).getOrElse(TermMap(TermKind.BlankUuid, "", Some(TermType.BlankNode)))
    val classes = g.objects(sm, RR + "class").map(termId).toList
    val graph = g.obj(sm, RR + "graphMap").flatMap(parseTermMap(g, _))
      .orElse(g.obj(sm, RR + "graph").map(c => TermMap(TermKind.Constant, termId(c), Some(TermType.Iri))))
    // P5: rml:condition — an FnO boolean gating the whole subject's rows
    // (reference: parse semantify.py:2475-2481; gate semantify.py:6383-6407)
    val condition = g.obj(sm, RML + "condition").map { c =>
      // the condition is either a functionValue POM list or (new dialect) a
      // node carrying rml:functionExecution (reference: semantify.py:2200-2201)
      g.obj(c, RML + "functionExecution").map(parseFunctionExecution(g, _))
        .getOrElse(parseFunctionValue(g, c))
    }
    SubjectMap(term, classes, graph, condition, parseLogicalTargets(g, sm))
  }

  /** Parse a term map node: template / reference / constant / functionValue /
    * quoted TriplesMap, with termType.
    */
  private def parseTermMap(g: RdfGraph, node: RdfTerm): Option[TermMap] = {
    val termType = g.obj(node, RR + "termType").map(termId).map {
      case t if t.endsWith("IRI") => TermType.Iri
      case t if t.endsWith("BlankNode") => TermType.BlankNode
      case _ => TermType.Literal
    }
    g.obj(node, RR + "template").map(t => TermMap(TermKind.Template, lex(t), termType))
      .orElse(g.obj(node, RML + "reference").map(r => TermMap(TermKind.Reference, lex(r), termType)))
      .orElse(g.obj(node, RR + "column").map(r => TermMap(TermKind.Reference, lex(r), termType)))
      .orElse(g.obj(node, RR + "constant").map(c => TermMap(TermKind.Constant, termId(c),
        termType.orElse(c match { case _: Iri => Some(TermType.Iri); case _ => Some(TermType.Literal) }))))
      .orElse(g.obj(node, FNML + "functionValue").map(fv =>
        TermMap(TermKind.FunctionCall, "", termType,
          function = Some(parseFunctionValue(g, fv).copy(returnKey = parseReturnKey(g, node))))))
      .orElse(g.obj(node, RML + "functionExecution").map(fe =>
        TermMap(TermKind.FunctionCall, "", termType,
          function = Some(parseFunctionExecution(g, fe).copy(returnKey = parseReturnKey(g, node))))))
      .orElse(g.obj(node, RML + "quotedTriplesMap").map(q =>
        TermMap(TermKind.QuotedTriplesMap, "", termType, quotedTm = Some(termId(q)),
          quotedJoin = parseJoinConditions(g, node))))
  }

  /** rr:joinCondition nodes on `node` (RefObjectMaps and quoted-TM term maps
    * share the child/parent + childMap/parentMap grammar — reference:
    * semantify.py:2388-2409).
    */
  private def parseJoinConditions(g: RdfGraph, node: RdfTerm): Option[JoinCondition] = {
    val conds = g.objects(node, RR + "joinCondition")
    def keyMaps(cond: RdfTerm, plain: String, mapped: String): Option[TermMap] =
      g.obj(cond, RR + plain).orElse(g.obj(cond, RML + plain))
        .map(v => TermMap(TermKind.Reference, lex(v)))
        .orElse(g.obj(cond, RML + mapped).orElse(g.obj(cond, RR + mapped))
          .flatMap(parseTermMap(g, _)))
    val childMaps = conds.flatMap(keyMaps(_, "child", "childMap")).toList
    val parentMaps = conds.flatMap(keyMaps(_, "parent", "parentMap")).toList
    if (conds.isEmpty) None else Some(JoinCondition(
      childMaps.collect { case t if t.kind == TermKind.Reference => t.value },
      parentMaps.collect { case t if t.kind == TermKind.Reference => t.value },
      childMaps, parentMaps))
  }

  /** rml:return <out> | rml:returnMap [ rml:constant <out> ] on the term map
    * node — selects a named output of the function result (reference SPARQL:
    * semantify.py:2243-2247; applied at 6501-6505).
    */
  private def parseReturnKey(g: RdfGraph, node: RdfTerm): Option[String] =
    g.obj(node, RML + "return").map(termId)
      .orElse(g.obj(node, RML + "returnMap").flatMap(m => g.obj(m, RR + "constant").map(termId)))

  private def parsePom(g: RdfGraph, pom: RdfTerm): List[PredicateObjectMap] = {
    val predicates: List[TermMap] =
      g.objects(pom, RR + "predicate").map(p => TermMap(TermKind.Constant, termId(p), Some(TermType.Iri))).toList ++
      g.objects(pom, RR + "predicateMap").flatMap(parseTermMap(g, _)).toList
    val graph = g.obj(pom, RR + "graphMap").flatMap(parseTermMap(g, _))
      .orElse(g.obj(pom, RR + "graph").map(c => TermMap(TermKind.Constant, termId(c), Some(TermType.Iri))))

    val objectMaps: List[ObjectMap] =
      g.objects(pom, RR + "object").map(o => ObjectMap(Some(TermMap(TermKind.Constant, termId(o),
        Some(o match { case _: Iri => TermType.Iri; case _ => TermType.Literal }))))).toList ++
      g.objects(pom, RR + "objectMap").map(om => parseObjectMap(g, om)).toList

    // K3: targets declared on the POM's predicate/object maps route this
    // predicate's triples into extra dumps
    val targets = (g.objects(pom, RR + "predicateMap") ++ g.objects(pom, RR + "objectMap"))
      .flatMap(n => parseLogicalTargets(g, n)).toList

    for { p <- predicates; o <- objectMaps } yield PredicateObjectMap(p, o, graph, targets)
  }

  /** rml:logicalTarget [ rml:target [ rml:path | void:dataDump ];
    * rml:serialization ?fmt; rml:encoding ?enc ] (reference:
    * semantify.py:2204-2208, 2296-2303). Serialization falls back to the
    * reference's path-substring dispatch (semantify.py:10059-10086);
    * an explicitly declared but UNKNOWN serialization fails loud instead of
    * silently downgrading to ntriples. Compression (zip / tar.gz / tar.xz /
    * gz) is inferred from the dump path like the reference's compress loop
    * (semantify.py:10089-10106).
    */
  private def parseLogicalTargets(g: RdfGraph, node: RdfTerm): List[LogicalTarget] =
    g.objects(node, RML + "logicalTarget").toList.flatMap { out =>
      g.obj(out, RML + "target").flatMap { dump =>
        g.obj(dump, RML + "path").map(lex)
          .orElse(g.obj(dump, "http://rdfs.org/ns/void#dataDump").map(lex))
          .map { p =>
            val declared = g.obj(out, RML + "serialization").map(termId)
            val ser = declared.map(normalizeSerialization)
              .getOrElse(serializationFromPath(p))
            val enc = g.obj(out, RML + "encoding").map(termId)
              .map(e => if (e.toUpperCase.contains("UTF-16")) "UTF-16" else "UTF-8")
              .getOrElse("UTF-8")
            val lower = p.toLowerCase
            val compression =
              if (lower.endsWith(".tar.gz")) Some("tar.gz")
              else if (lower.endsWith(".tar.xz")) Some("tar.xz")
              else if (lower.endsWith(".zip")) Some("zip")
              else if (lower.endsWith(".gz")) Some("gzip")
              else None
            LogicalTarget(p.stripPrefix("file://"), ser, compression, enc)
          }
      }
    }

  /** Map a declared serialization IRI/name to the engine's writer key;
    * unknown values throw (no silent ntriples downgrade).
    */
  private def normalizeSerialization(s: String): String = {
    val n = s.toLowerCase.replace("-", "").replace("_", "")
    if (n.contains("turtle") || n.endsWith("ttl")) "turtle"
    else if (n.contains("jsonld")) "jsonld"
    else if (n.contains("rdfxml") || n.endsWith("/xml") || n.endsWith("#xml")) "rdfxml"
    else if (n.contains("rdfjson") || n.contains("json")) "rdfjson"
    else if (n.contains("n3") || n.contains("notation3")) "n3"
    else if (n.contains("ntriples") || n.contains("nquads")) "ntriples"
    else throw new IllegalArgumentException(
      s"unsupported rml:serialization <$s> (supported: N-Triples/N-Quads, " +
        "Turtle, JSON-LD, RDF-JSON, RDF_XML, N3)")
  }

  /** The reference dispatches on output-path substrings when no
    * serialization is declared (semantify.py:10059-10086).
    */
  private def serializationFromPath(p: String): String = {
    val n = p.toLowerCase
    if (n.contains("jsonld")) "jsonld"
    else if (n.contains("rdfjson")) "rdfjson"
    else if (n.contains("rdfxml")) "rdfxml"
    else if (n.contains("n3")) "n3"
    else if (n.contains("ttl")) "turtle"
    else "ntriples"
  }

  private def parseObjectMap(g: RdfGraph, om: RdfTerm): ObjectMap = {
    g.obj(om, RR + "parentTriplesMap") match {
      case Some(parent) =>
        ObjectMap(None, refObject =
          Some(RefObjectMap(termId(parent), parseJoinConditions(g, om))))
      case None =>
        val gather = parseGather(g, om)
        val term = parseTermMap(g, om)
        val datatype = g.obj(om, RR + "datatype").map(termId)
        val datatypeMap = g.obj(om, RML + "datatypeMap").flatMap(parseTermMap(g, _))
        val language = g.obj(om, RR + "language").map(lex).map(normalizeLang)
        val languageMap = g.obj(om, RML + "languageMap").flatMap(parseTermMap(g, _))
        ObjectMap(term, gather = gather, datatype = datatype, datatypeMap = datatypeMap,
          language = language, languageMap = languageMap)
    }
  }

  /** RML-CC gather maps (reference: cc_functions.py; parse at
    * semantify.py:1968-2010): rml:gather ( termMap… ); rml:gatherAs
    * rdf:List/Bag/Seq/Alt; rml:strategy append|cartesian;
    * rml:allowEmptyListAndContainer.
    */
  private def parseGather(g: RdfGraph, om: RdfTerm): Option[GatherMap] =
    g.obj(om, RML + "gather").map { head =>
      val items = g.rdfList(head).flatMap(parseTermMap(g, _))
      val gatherAs = g.obj(om, RML + "gatherAs").map(termId).map {
        case t if t.endsWith("List") => GatherAs.RdfList
        case t if t.endsWith("Bag") => GatherAs.Bag
        case t if t.endsWith("Seq") => GatherAs.Seq
        case _ => GatherAs.Alt
      }.getOrElse(GatherAs.RdfList)
      val strategy = g.obj(om, RML + "strategy").map(termId)
        .map(s => if (s.toLowerCase.contains("cartesian")) "cartesian" else "append")
        .getOrElse("append")
      val allowEmpty = g.obj(om, RML + "allowEmptyListAndContainer")
        .map(lex).contains("true")
      GatherMap(gatherAs, items, strategy, allowEmpty)
    }

  /** The reference accepts 'spanish'/'english' aliases and validates 2-letter
    * tags (reference: semantify.py:6843-6883).
    */
  private def normalizeLang(l: String): String = l.toLowerCase match {
    case "spanish" => "es"
    case "english" => "en"
    case other => other
  }

  /** New-dialect function execution: rml:functionExecution [ rml:function
    * <fn> ; rml:input [ rml:parameter <p> ; rml:inputValue v |
    * rml:inputValueMap [...] ] ] (reference SPARQL: semantify.py:1871-1899).
    * Parameters stay keyed by their parameter IRI and ordered by declaration.
    */
  private def parseFunctionExecution(g: RdfGraph, fe: RdfTerm): FunctionCall = {
    val functionIri = g.obj(fe, RML + "function").map(termId).getOrElse("")
    val params = scala.collection.mutable.LinkedHashMap.empty[String, FunctionArg]
    g.objects(fe, RML + "input").foreach { in =>
      val param = g.obj(in, RML + "parameter").map(termId).getOrElse("")
      val argOpt: Option[FunctionArg] =
        g.obj(in, RML + "inputValue").map(v => FunctionArg.Const(lex(v)): FunctionArg)
          .orElse(g.obj(in, RML + "inputValueMap").map { ivm =>
            g.obj(ivm, RML + "reference").map(r => FunctionArg.Ref(lex(r)): FunctionArg)
              .orElse(g.obj(ivm, RR + "template").map(t => FunctionArg.Tpl(lex(t))))
              .orElse(g.obj(ivm, RR + "constant").map(c => FunctionArg.Const(lex(c))))
              .orElse(g.obj(ivm, RML + "functionExecution")
                .map(inner => FunctionArg.Nested(parseFunctionExecution(g, inner))))
              .orElse(g.obj(ivm, FNML + "functionValue")
                .map(inner => FunctionArg.Nested(parseFunctionValue(g, inner))))
              .getOrElse(FunctionArg.Const(""))
          })
      argOpt.foreach { arg =>
        if (param.nonEmpty) params(param) = params.get(param) match {
          case Some(FunctionArg.ListArg(items)) => FunctionArg.ListArg(items :+ arg)
          case Some(existing) => FunctionArg.ListArg(List(existing, arg))
          case None => arg
        }
      }
    }
    FunctionCall(functionIri, scala.collection.immutable.VectorMap(params.toSeq: _*))
  }

  /** FnML function value: a POM list where fno:executes names the function and
    * other predicates bind parameters (reference: fnml_functions.py:234-302).
    */
  private def parseFunctionValue(g: RdfGraph, fv: RdfTerm): FunctionCall = {
    val poms = g.objects(fv, RR + "predicateObjectMap")
    var functionIri = ""
    val params = scala.collection.mutable.LinkedHashMap.empty[String, FunctionArg]
    poms.foreach { pom =>
      val pred = g.obj(pom, RR + "predicate").map(termId)
        .orElse(g.obj(pom, RR + "predicateMap").flatMap(pm => g.obj(pm, RR + "constant")).map(termId))
        .getOrElse("")
      val argOpt: Option[FunctionArg] =
        g.obj(pom, RR + "object").map {
          case Iri(v) => FunctionArg.Const(v)
          case Lit(v, _, _) => FunctionArg.Const(v)
          case BNode(l) => FunctionArg.Const(l)
        }.orElse(g.obj(pom, RR + "objectMap").map { om =>
          g.obj(om, RML + "reference").map(r => FunctionArg.Ref(lex(r)))
            .orElse(g.obj(om, RR + "template").map(t => FunctionArg.Tpl(lex(t))))
            .orElse(g.obj(om, RR + "constant").map(c => FunctionArg.Const(lex(c))))
            .orElse(g.obj(om, FNML + "functionValue").map(inner => FunctionArg.Nested(parseFunctionValue(g, inner))))
            .getOrElse(FunctionArg.Const(""))
        })
      argOpt.foreach { arg =>
        if (pred == FNO + "executes" || pred.endsWith("function/ontology#executes")) {
          functionIri = arg match { case FunctionArg.Const(v) => v; case _ => "" }
        } else if (pred.nonEmpty) {
          params(pred) = params.get(pred) match {
            case Some(FunctionArg.ListArg(items)) => FunctionArg.ListArg(items :+ arg)
            case Some(existing) => FunctionArg.ListArg(List(existing, arg))
            case None => arg
          }
        }
      }
    }
    // VectorMap keeps declaration order for the positional-fallback binding
    // in FnoRegistry (an RDF graph is order-free, but the Turtle parser
    // yields triples in document order — the best available tiebreak)
    FunctionCall(functionIri, scala.collection.immutable.VectorMap(params.toSeq: _*))
  }
}
