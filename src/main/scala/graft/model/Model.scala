package graft.model

/** The RML mapping IR — the Scala analogue of the reference's data model
  * (reference: rdfizer/rdfizer/triples_map/TriplesMap.py:3-201), re-shaped as
  * immutable case classes with ADTs instead of stringly-typed "mapping type"
  * fields.
  */
sealed trait TermKind
object TermKind {
  case object Constant extends TermKind
  case object Template extends TermKind
  case object Reference extends TermKind
  case object FunctionCall extends TermKind
  case object QuotedTriplesMap extends TermKind
  case object BlankUuid extends TermKind // subject with no value → _:uuid
}

sealed trait TermType
object TermType {
  case object Iri extends TermType
  case object BlankNode extends TermType
  case object Literal extends TermType
}

/** A function invocation (FnO/FNML, SURVEY §2.9); parameters may be nested
  * function calls (reference: mapping_functions.py:10-104).
  */
final case class FunctionCall(
    functionIri: String,
    params: Map[String, FunctionArg],
    returnKey: Option[String] = None)

sealed trait FunctionArg
object FunctionArg {
  final case class Const(value: String) extends FunctionArg
  final case class Ref(attr: String) extends FunctionArg
  final case class Tpl(template: String) extends FunctionArg
  final case class Nested(call: FunctionCall) extends FunctionArg
  final case class ListArg(items: List[FunctionArg]) extends FunctionArg
}

/** A generic term map: how to produce one RDF term from a row. */
final case class TermMap(
    kind: TermKind,
    value: String = "",                       // constant value / template / reference attr
    termType: Option[TermType] = None,
    function: Option[FunctionCall] = None,
    quotedTm: Option[String] = None,          // TriplesMap id for RML-star
    /** rr:joinCondition alongside rml:quotedTriplesMap — the quoted parent
      * is evaluated over ITS OWN source and joined on these keys (reference:
      * `inner_hash_maker` keyed "quoted_"+TM+child, inner_functions.py:119-137,
      * semantify.py:7566-7567); None + same source = same-row evaluation.
      */
    quotedJoin: Option[JoinCondition] = None)

/** rr:joinCondition — child/parent key pairs. `childMaps`/`parentMaps` hold
  * the general form (rml:childMap/rml:parentMap: reference, template,
  * constant, or function-valued keys — reference: semantify.py:2388-2409);
  * `childAttrs`/`parentAttrs` are the plain-reference projections used for
  * rewrites and attr pruning.
  */
final case class JoinCondition(
    childAttrs: List[String],
    parentAttrs: List[String],
    childMaps: List[TermMap] = Nil,
    parentMaps: List[TermMap] = Nil) {
  def effectiveChildMaps: List[TermMap] =
    if (childMaps.nonEmpty) childMaps else childAttrs.map(a => TermMap(TermKind.Reference, a))
  def effectiveParentMaps: List[TermMap] =
    if (parentMaps.nonEmpty) parentMaps else parentAttrs.map(a => TermMap(TermKind.Reference, a))
}

/** rr:RefObjectMap — object comes from the parent TM's subjects. */
final case class RefObjectMap(
    parentTriplesMap: String,
    joinCondition: Option[JoinCondition])

/** rml:gather (RML-CC collections; reference: cc_functions.py). */
sealed trait GatherAs
object GatherAs {
  case object RdfList extends GatherAs
  case object Bag extends GatherAs
  case object Seq extends GatherAs
  case object Alt extends GatherAs
}
final case class GatherMap(
    gatherAs: GatherAs,
    items: List[TermMap],
    strategy: String = "append",  // append | cartesian
    allowEmpty: Boolean = false)

final case class ObjectMap(
    term: Option[TermMap],
    refObject: Option[RefObjectMap] = None,
    gather: Option[GatherMap] = None,
    datatype: Option[String] = None,
    datatypeMap: Option[TermMap] = None,
    language: Option[String] = None,
    languageMap: Option[TermMap] = None)

/** rml:logicalTarget — an extra dump file for the triples of a subject map
  * (whole TM) or a predicate/object map (that predicate only); reference:
  * semantify.py:2204-2208, 3340-3400.
  */
final case class LogicalTarget(
    path: String,
    serialization: String = "ntriples",
    /** Hadoop text codec (gzip) or archive post-pack (zip, tar.gz, tar.xz)
      * inferred from the dump path like the reference's compress loop
      * (semantify.py:10089-10106).
      */
    compression: Option[String] = None,
    /** rml:encoding — UTF-16 triggers the reference's re-encode pass
      * (semantify.py:10054-10058); everything else stays UTF-8.
      */
    encoding: String = "UTF-8")

final case class PredicateObjectMap(
    predicate: TermMap,
    objectMap: ObjectMap,
    graph: Option[TermMap] = None,
    targets: List[LogicalTarget] = Nil)

final case class SubjectMap(
    term: TermMap,
    rdfClasses: List[String] = Nil,
    graph: Option[TermMap] = None,
    condition: Option[FunctionCall] = None,
    targets: List[LogicalTarget] = Nil)

/** Where the rows come from (SURVEY §2.1). */
sealed trait LogicalSource { def id: String }
object LogicalSource {
  final case class CsvSource(path: String, delimiter: String = ",") extends LogicalSource { def id = s"csv:$path:$delimiter" }
  /** `multiLine=true` (default): the path is one JSON document (array or
    * object — RML's usual shape); `false`: JSON-lines, one value per line
    * (the distributed-write-friendly shape Spark itself produces).
    */
  final case class JsonSource(path: String, iterator: String,
      multiLine: Boolean = true) extends LogicalSource { def id = s"json:$path:$iterator:$multiLine" }
  /** `parentAxis`: a reference uses `../…`, so the scan reads one level up
    * and explodes the iterator's leaf element (parent fields surface as
    * `__parent_<name>` columns).
    */
  final case class XmlSource(path: String, iterator: String,
      parentAxis: Boolean = false) extends LogicalSource { def id = s"xml:$path:$iterator:$parentAxis" }
  final case class ParquetSource(path: String) extends LogicalSource { def id = s"parquet:$path" }
  final case class OrcSource(path: String) extends LogicalSource { def id = s"orc:$path" }
  final case class JdbcSource(url: String, dbType: String, query: Option[String], tableName: Option[String],
      user: String = "", password: String = "") extends LogicalSource { def id = s"jdbc:$url:${query.getOrElse(tableName.getOrElse(""))}" }
  final case class SparqlSource(endpoint: String, query: String) extends LogicalSource { def id = s"sparql:$endpoint?$query" }
  final case class NTriplesSource(path: String, query: String) extends LogicalSource { def id = s"nt:$path" }
  /** RML-LV logical view: fields projected off a base source (SURVEY §2.10). */
  final case class ViewSource(viewId: String, base: LogicalSource, fields: List[ViewField],
      joins: List[ViewJoin] = Nil) extends LogicalSource { def id = s"view:$viewId" }
}

final case class ViewField(
    name: String,
    reference: Option[String],        // JSONPath / column ref
    constant: Option[String] = None,
    template: Option[String] = None,
    iterator: Option[String] = None,  // iterable field → explode, index col "name.#"
    innerFields: List[ViewField] = Nil,
    innerFormulation: Option[String] = None) // embedded CSV-in-JSON etc.

final case class ViewJoin(
    kind: String, // inner | left
    parentView: String,
    childAttrs: List[String],
    parentAttrs: List[String],
    /** Parent view parsed inline from the mapping (rml:parentLogicalView);
      * when absent the ViewExec registry resolves `parentView` by id.
      */
    parentSource: Option[LogicalSource] = None,
    /** Parent fields this join pulls in (rml:field on the join node);
      * empty = expose all parent view fields.
      */
    fields: List[ViewField] = Nil)

/** One TriplesMap (reference: TriplesMap.py:5-51). `asserted=false` marks an
  * RML-star NonAssertedTriplesMap: usable as a quoted parent, not emitted.
  */
final case class TriplesMap(
    id: String,
    source: LogicalSource,
    subject: SubjectMap,
    poms: List[PredicateObjectMap],
    baseIri: Option[String] = None,
    asserted: Boolean = true)

/** A whole mapping document. */
final case class MappingDoc(
    triplesMaps: List[TriplesMap],
    prefixes: Map[String, String] = Map.empty,
    base: Option[String] = None)
