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
  * Parameter binding matches the reference: each bound parameter's IRI local
  * name keys the execution dict (reference: execution_dic
  * fnml_functions.py:234-302 — `param = inputs.split("#")[1]`), and each
  * built-in reads its parameters by those names (fnml_functions.py:30-211).
  * [[slotTable]] lists, per function, the accepted local names per positional
  * slot; parameters whose names match no slot fall back to declaration order,
  * so mappings using ad-hoc parameter IRIs still bind sensibly.
  */
object FnoRegistry {

  private def nullStr: Column = lit(null).cast("string")

  /** Function results that are dicts in the reference — `rml:return` selects
    * a field (reference: semantify.py:6501-6505 `func[func_result]`).
    */
  private val structValued = Set("parseURL")

  /** Functions returning a genuine boolean (the reference returns Python
    * bools; everything else returns strings whose truthiness is non-empty).
    */
  private val booleanValued = Set(
    "equal", "notEqual", "isNull", "string_contains", "listContainsElement")

  /** Per-function parameter slots: accepted parameter-IRI local names, in the
    * positional order the implementations consume them (names from the
    * reference's per-function `global_dic` reads, fnml_functions.py:30-211;
    * `inputString` is the GREL-ontology alias used by published mappings).
    */
  private val slotTable: Map[String, List[List[String]]] = {
    val sv = List("valueParam", "valueParameter", "inputString", "str")
    Map(
      "toLowerCase" -> List(sv),
      "toUpperCase" -> List(sv),
      "string_length" -> List(sv),
      "length" -> List(sv),
      "string_substring" -> List(List("valueParam", "valueParameter", "inputString"),
        List("p_int_i_from", "param_int_i_from", "startIndex"),
        List("param_int_i_opt_to", "p_int_i_opt_to", "endIndex")),
      "string_replace" -> List(List("valueParam", "valueParameter", "inputString"),
        List("param_find", "p_string_find"),
        List("param_replace", "p_string_replace")),
      "stringReplace" -> List(List("valueParam", "valueParameter", "inputString"),
        List("param_find", "p_string_find"),
        List("param_replace", "p_string_replace")),
      "string_contains" -> List(List("valueParameter", "valueParam", "inputString"),
        List("string_sub", "p_string_sub")),
      "string_md5" -> List(List("valueParameter", "valueParam", "inputString")),
      "md5" -> List(List("valueParameter", "valueParam", "inputString")),
      "concat2" -> List(List("value1"), List("value2")),
      "string_concat" -> List(List("value1"), List("value2")),
      "array_join" -> List(List("p_array_a"), List("p_string_sep")),
      "listContainsElement" -> List(List("list", "p_array_a"), List("str", "valueParam")),
      "slugify" -> List(sv),
      "escape" -> List(List("valueParam", "valueParameter", "inputString"),
        List("modeParam", "mode")),
      "parseURL" -> List(List("stringParameter", "valueParam", "valueParameter", "inputString")),
      "toUpperCaseURL" -> List(List("str", "valueParam", "valueParameter", "inputString")),
      "schema" -> List(List("stringParameter", "valueParam", "valueParameter", "inputString")),
      "normalizeDate" -> List(List("strDate"), List("pattern")),
      "normalizeDateTime" -> List(List("strDate"), List("pattern")),
      "equal" -> List(List("valueParam", "valueParameter"), List("valueParam2", "valueParameter2")),
      "notEqual" -> List(List("valueParameter", "valueParam"), List("valueParameter2", "valueParam2")),
      "isNull" -> List(List("str", "valueParam", "valueParameter")),
      "trueCondition" -> List(List("strBoolean", "bool_b"), List("str", "valueParam")),
      "controls_if" -> List(List("bool_b"), List("any_true"), List("any_false")))
  }

  /** Bind declared params (local name → arg, in declaration order) onto the
    * function's slots: name matches first, leftovers fill unresolved slots in
    * declaration order, unfilled slots stay absent.
    */
  private def bind(name: String, named: List[(String, FunctionArg)]): List[Option[FunctionArg]] =
    slotTable.get(name) match {
      case None => named.map(p => Some(p._2))
      case Some(slots) =>
        val used = Array.fill(named.size)(false)
        val byName = slots.map { aliases =>
          val idx = named.indices.find(i => !used(i) && aliases.contains(named(i)._1))
          idx.foreach(used(_) = true)
          idx
        }
        val leftover = scala.collection.mutable.Queue(named.indices.filterNot(used): _*)
        byName.map {
          case Some(i) => Some(named(i)._2)
          case None => if (leftover.nonEmpty) Some(named(leftover.dequeue())._2) else None
        }
    }

  /** Resolve a function call into a Column over the current row. */
  def compile(call: FunctionCall, colFn: String => Column): Column = {
    val name = localName(call.functionIri)
    val named = call.params.toList.map { case (iri, arg) => localName(iri) -> arg }
    val raw = bind(name, named)
    val args = raw.map {
      case Some(arg) => compileArg(arg, colFn)
      case None => nullStr
    }
    val res = dispatch(name, args, raw)
    // rml:return named output (reference: semantify.py:6501-6505) — selects a
    // field of a dict-valued result; "unknownOut" yields no value.
    call.returnKey.map(localName) match {
      case Some("unknownOut") => nullStr
      case Some(k) if structValued(name) => res.getField(k)
      case _ => res
    }
  }

  /** Python-truthiness of a condition function's result, for subject/row
    * gating (reference: `if not condition` semantify.py:6406): boolean-valued
    * functions test their bool, anything else is truthy iff non-empty.
    */
  def compileTruthy(call: FunctionCall, colFn: String => Column): Column = {
    val c = compile(call, colFn)
    if (booleanValued(localName(call.functionIri))) lower(c) === "true"
    else c.isNotNull && c.cast("string") =!= ""
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

  /** Positional entry point (catalog/tests): args in slot order. */
  def apply(name: String, args: List[Column]): Column = dispatch(name, args, Nil)

  /** Python html.escape(quote=True): &, <, >, ", ' (fnml_functions.py:189-192). */
  private def htmlEscape(c: Column): Column =
    List("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;", "'" -> "&#x27;")
      .foldLeft(c.cast("string")) { case (acc, (f, t)) => replace(acc, lit(f), lit(t)) }

  /** Dispatch by local name over slot-ordered args. `raw` (when non-empty)
    * carries the bound [[FunctionArg]] per slot, so mapping-time constants
    * (date pattern, escape mode) resolve at compile time; `Nil` = positional
    * call with no argument metadata.
    */
  private def dispatch(name: String, args: List[Column], raw: List[Option[FunctionArg]]): Column = {
    def a(i: Int): Column = if (i < args.length) args(i) else nullStr
    def slotBound(i: Int): Boolean =
      if (raw.nonEmpty) raw.lift(i).flatten.isDefined else i < args.length
    def rawConst(i: Int): Option[String] =
      raw.lift(i).flatten.collect { case FunctionArg.Const(v) => v }

    name match {
      case "toLowerCase" => lower(a(0))
      case "toUpperCase" => upper(a(0))
      case "string_length" | "length" => length(a(0)).cast("string")
      case "string_substring" =>
        val (s, from, to) = (a(0), a(1).cast("int"), a(2).cast("int"))
        if (slotBound(2))
          // 3-arg [from, to) with out-of-range → null, like Python slicing
          // guards (fnml_functions.py:137-140)
          when(from >= 0 && to <= length(s) && from <= to,
            substring(s, from + 1, to - from)).otherwise(lit(null))
        else
          // 2-arg suffix form s[from:] — from == len → "", from > len → null
          // (fnml_functions.py:129-135)
          when(from === length(s), lit(""))
            .when(from > length(s), lit(null))
            .otherwise(substring(s, from + 1, length(s) - from))
      case "string_replace" | "stringReplace" =>
        replace(a(0), a(1), a(2))
      case "string_contains" => a(0).contains(a(1)).cast("string")
      case "string_md5" | "md5" => md5(a(0).cast("binary"))
      case "concat2" | "string_concat" =>
        // "" unless BOTH sides are truthy — Python `bool(value)`, so the
        // empty string is falsy too (fnml_functions.py:172-179)
        val (x, y) = (a(0), a(1))
        when(x.isNull || x === "" || y.isNull || y === "", lit(""))
          .otherwise(concat(x, y))
      case "array_join" =>
        // joins with p_string_sep (fnml_functions.py:120-126); absent → ""
        val sep = if (slotBound(1)) a(1).cast("string") else lit("")
        call_function("array_join", a(0), sep)
      case "listContainsElement" =>
        array_contains(a(0), a(1)).cast("string")
      case "slugify" => rml.slugify(a(0))
      case "escape" =>
        // html vs url mode (fnml_functions.py:189-197); invalid constant
        // mode fails at compile time like the reference's ValueError
        rawConst(1) match {
          case Some("html") => htmlEscape(a(0))
          case Some("url") => rml.encodeIri(a(0))
          case Some(other) =>
            throw new IllegalArgumentException(
              s"escape: invalid mode '$other' (use 'html' or 'url')")
          case None if slotBound(1) =>
            when(a(1) === "html", htmlEscape(a(0))).otherwise(rml.encodeIri(a(0)))
          case None => rml.encodeIri(a(0))
        }
      case "parseURL" =>
        // manual split semantics (fnml_functions.py:160-170): protocol before
        // "://"; with "#": string after it, domain before it; otherwise string
        // = last path segment, domain = rest with "/<last>" removed
        val s = a(0)
        val rest = substring_index(substring_index(s, "://", 2), "://", -1)
        val lastSeg = substring_index(rest, "/", -1)
        // no "://" → the reference's split("://")[1] raises and the term is
        // dropped; a null struct reproduces that (every getField is null)
        // instead of fabricating domain/string outputs from the whole value
        when(s.contains("://"), struct(
          substring_index(s, "://", 1).as("protocolOutput"),
          when(rest.contains("#"), substring_index(rest, "#", 1))
            .otherwise(replace(rest, concat(lit("/"), lastSeg), lit("")))
            .as("domainOutput"),
          when(rest.contains("#"), substring_index(substring_index(rest, "#", 2), "#", -1))
            .otherwise(lastSeg)
            .as("stringOutput")))
      case "toUpperCaseURL" =>
        val u = upper(a(0))
        when(u.startsWith("HTTP://") || u.startsWith("HTTPS://"), u)
          .otherwise(concat(lit("HTTP://"), rml.encodeIri(u)))
      case "schema" => concat(lit("https://schema.org/"), rml.encodeIri(a(0)))
      case "uuid" | "random" => expr("uuid()")
      case "helloworld" => lit("Hello World!")
      case "alwaysReturnsABC" => lit("ABC")
      case "normalizeDate" | "normalizeDateTime" =>
        // the pattern parameter is a mapping-time constant in Python strptime
        // syntax (fnml_functions.py:39-47); translate to a Spark pattern
        val fmtLit = rawConst(1).map(translateStrptimeLiteral).getOrElse("yyyy-MM-dd")
        if (name == "normalizeDate") date_format(to_date(a(0), fmtLit), "yyyy-MM-dd")
        else date_format(to_timestamp(a(0), fmtLit), "yyyy-MM-dd'T'HH:mm:ss")
      case "equal" => (a(0) === a(1)).cast("string")
      case "notEqual" => (a(0) =!= a(1)).cast("string")
      case "isNull" =>
        // the reference tests the literal string "null" or "" (fnml_functions.py:67-71)
        (a(0).isNull || a(0) === "" || a(0) === "null").cast("string")
      case "trueCondition" =>
        // Python truthiness of strBoolean; "None" (failed substitution
        // sentinel) yields no value (fnml_functions.py:73-80)
        val truthy = a(0).isNotNull && a(0).cast("string") =!= ""
        when(truthy && a(1) =!= "None", a(1)).otherwise(nullStr)
      case "controls_if" =>
        // Python truthiness of bool_b (fnml_functions.py:102-118) — any
        // non-empty string is true (including "false"); the "None" sentinel
        // and missing branches yield no value
        val cond = a(0)
        val truthy = cond.isNotNull && cond.cast("string") =!= ""
        val res = when(truthy, a(1)).otherwise(a(2))
        when(res === "None", nullStr).otherwise(res)
      case other =>
        throw new IllegalArgumentException(s"unknown FnO function: $other")
    }
  }

  /** Translate a Python strptime pattern into a Spark datetime pattern. */
  def translateStrptimeLiteral(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      .replace("%y", "yy").replace("%b", "MMM").replace("%B", "MMMM")
}
