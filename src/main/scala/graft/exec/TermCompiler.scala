package graft.exec

import graft.functions.{rml, FnoRegistry, TemplateParser}
import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles [[TermMap]]s into Spark Columns (SURVEY §2.4, T1-T13).
  *
  * Each compiled term comes with a guard predicate implementing the
  * reference's per-expression null filtering (reference:
  * functions.py:1882-1918): a term whose referenced attributes are
  * null/empty/nan/N-A/NULL produces no triple, without dropping the whole
  * row for other predicate-object maps.
  */
object TermCompiler {

  final case class CompiledTerm(column: Column, guard: Column)

  private val TRUE = lit(true)

  def colAsString(colFn: String => Column)(attr: String): Column = colFn(attr).cast("string")

  /** Lexical value before RDF wrapping (template expansion / reference /
    * constant / function).
    */
  def lexical(tm: TermMap, colFn: String => Column, encode: Boolean): CompiledTerm = tm.kind match {
    case TermKind.Constant => CompiledTerm(lit(tm.value), TRUE)
    case TermKind.Template =>
      CompiledTerm(rml.template(tm.value, encode, colFn), rml.templateGuard(tm.value, colFn))
    case TermKind.Reference =>
      val c = colAsString(colFn)(tm.value)
      CompiledTerm(c, rml.notRmlNull(c))
    case TermKind.FunctionCall =>
      val c = FnoRegistry.compile(tm.function.get, colFn)
      CompiledTerm(c, c.isNotNull)
    case TermKind.BlankUuid =>
      CompiledTerm(expr("uuid()"), TRUE)
    case TermKind.QuotedTriplesMap =>
      throw new IllegalStateException("quoted TMs are compiled by the MappingCompiler")
  }

  /** A fully-wrapped RDF term (IRI / blank node / literal with datatype or
    * language) ready for N-Triples output.
    */
  def rdfTerm(tm: TermMap, om: Option[ObjectMap], base: Option[String],
      colFn: String => Column, defaultType: TermType): CompiledTerm = {
    val termType = tm.termType.getOrElse(tm.kind match {
      case TermKind.Constant if defaultType == TermType.Iri => TermType.Iri
      // R2RML §7.4 + reference semantics: a template-valued term map
      // without rr:termType is an IRI in ANY position — including object
      // maps, where reference-valued maps default to Literal instead
      // (reference: semantify.py:4297-4298 wraps template objects in <>
      // when no term type is declared)
      case TermKind.Template => TermType.Iri
      case TermKind.BlankUuid => TermType.BlankNode
      case _ => defaultType
    })
    termType match {
      case TermType.Iri =>
        val lex = lexical(tm, colFn, encode = true)
        val withBase = tm.kind match {
          case TermKind.Constant | TermKind.Template | TermKind.Reference =>
            // a template whose leading literal already satisfies the
            // absolute-IRI check makes the runtime contains+rlike branch
            // constant-TRUE for every produced value — fold it here (it
            // was a per-row regex, plus the template concat evaluated
            // three times, on the bench's hottest projection)
            if (staticallyAbsolute(tm)) lex.column
            else resolveBase(lex.column, base)
          case _ => lex.column
        }
        CompiledTerm(rml.iri(withBase), lex.guard)
      case TermType.BlankNode =>
        val lex = lexical(tm, colFn, encode = false)
        CompiledTerm(rml.bnode(lex.column), lex.guard)
      case TermType.Literal =>
        val lex = lexical(tm, colFn, encode = false)
        val o = om
        // dynamic datatype maps base-resolve their values (reference:
        // semantify.py:4313-4316 — "http" in value → used raw, else the
        // base is prepended); constant rr:datatype stays raw (4303-4305)
        val dtCol: Option[Column] =
          o.flatMap(_.datatypeMap).map { dm =>
            val v = lexical(dm, colFn, encode = false).column
            when(v.contains("http"), v)
              .otherwise(concat(lit(base.getOrElse("http://example.com/base/")), v))
          }.orElse(o.flatMap(_.datatype).map(lit(_)))
        val langCol: Option[Column] =
          o.flatMap(_.languageMap).map(lm => lexical(lm, colFn, encode = false).column)
            .orElse(o.flatMap(_.language).map(lit(_)))
        val value = (dtCol, langCol) match {
          case (Some(dt), _) =>
            // xsd:dateTime normalization: space→T (reference: semantify.py:6796-6801)
            val lexNorm = when(dt.endsWith("dateTime"),
              regexp_replace(lex.column, "^(\\d{4}-\\d{2}-\\d{2}) ", "$1T")).otherwise(lex.column)
            rml.typedLiteral(lexNorm, dt)
          case (_, Some(lg)) => rml.langLiteral(lex.column, lg)
          case _ =>
            // bool sniffing for constants (reference: semantify.py:6681-6682)
            if (tm.kind == TermKind.Constant && (tm.value == "true" || tm.value == "false"))
              rml.typedLiteral(lex.column, lit("http://www.w3.org/2001/XMLSchema#boolean"))
            else rml.literal(lex.column)
        }
        CompiledTerm(value, lex.guard)
    }
  }

  /** Runtime relative-IRI resolution on the PRODUCED value, not the
    * template text (reference: semantify.py:6338-6350 — a `{col}` template
    * over absolute-IRI values must NOT get the base prefix): values
    * without "http" get the base; values with "http" keep it only when
    * they parse as scheme://netloc (urlparse check, functions.py:162-167).
    * For constants Catalyst folds this to a literal at plan time.
    */
  def resolveBase(value: Column, base: Option[String]): Column = {
    val b = lit(base.getOrElse("http://example.com/base/"))
    val validUrl = value.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/]+")
    when(value.contains("http") && validUrl, value).otherwise(concat(b, value))
  }

  /** [[resolveBase]]'s runtime test decided at compile time: a TEMPLATE
    * whose leading literal segment contains "http" and already matches the
    * anchored scheme://netloc pattern passes the runtime check for every
    * expansion (the anchored regex matched within the constant prefix
    * keeps matching any extension of it). Only the certain-positive case
    * folds; everything else keeps the per-row check.
    */
  private val AbsIriPrefix =
    java.util.regex.Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/]+")
  private def staticallyAbsolute(tm: TermMap): Boolean = tm.kind match {
    case TermKind.Template => TemplateParser.parse(tm.value) match {
      case TemplateParser.Lit(s) :: _ =>
        s.contains("http") && AbsIriPrefix.matcher(s).find()
      case _ => false
    }
    case _ => false
  }

  /** Attributes a term map references (for projection pruning, SURVEY P1). */
  def referencedAttrs(tm: TermMap): List[String] = tm.kind match {
    case TermKind.Template => TemplateParser.refs(tm.value)
    case TermKind.Reference => List(tm.value)
    case TermKind.FunctionCall => tm.function.map(fnAttrs).getOrElse(Nil)
    case _ => Nil
  }

  private def fnAttrs(f: FunctionCall): List[String] =
    f.params.values.toList.flatMap {
      case FunctionArg.Ref(a) => List(a)
      case FunctionArg.Tpl(t) => TemplateParser.refs(t)
      case FunctionArg.Nested(c) => fnAttrs(c)
      case FunctionArg.ListArg(items) => items.flatMap {
        case FunctionArg.Ref(a) => List(a)
        case FunctionArg.Tpl(t) => TemplateParser.refs(t)
        case FunctionArg.Nested(c) => fnAttrs(c)
        case _ => Nil
      }
      case _ => Nil
    }
}
