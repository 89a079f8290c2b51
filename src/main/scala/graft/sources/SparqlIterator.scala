package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7: the TM's SPARQL iterator query over an N-Triples source.
  *
  * The reference loads the `.nt` file into an rdflib graph and runs the
  * iterator as a SPARQL SELECT (semantify.py:9990-10011); each result row
  * becomes a dict of variable → `str(node)` — IRIs without `<>`, literals
  * as their bare lexical form. Here the graph IS the distributed triple
  * frame: each basic-graph-pattern triple becomes a filtered scan of that
  * frame (constants prune rows before any join), and shared variables bind
  * through equi-joins — the classic SPARQL-BGP-to-relational-algebra
  * compilation, so Catalyst picks join order/strategy and the whole query
  * scales with the triple file instead of an in-memory graph.
  *
  * Supported subset: PREFIX declarations, SELECT ?v… / SELECT *, a WHERE
  * block of dot-separated triple patterns with variables, `<iri>`,
  * `prefix:local`, `a` (rdf:type), and quoted literals (matched on lexical
  * form, as rdflib's str() compare does after the node conversion).
  */
object SparqlIterator {

  sealed trait Term
  final case class Var(name: String) extends Term
  /** Constant in node-string (rdflib `str()`) form. */
  final case class Const(value: String) extends Term

  /** One node token → its rdflib-str() form: `<iri>` → iri, literal → its
    * unescaped lexical body (datatype/lang dropped), blank label as-is.
    */
  def plainNode(c: Column): Column = {
    val lex = regexp_extract(c, "^\"(.*)\"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)?$", 1)
    // N-Triples unescape, \\ first via a sentinel so \\n stays a backslash-n
    val unesc = replace(replace(replace(replace(replace(replace(lex,
      lit("\\\\"), lit("\u0001")), lit("\\\""), lit("\"")),
      lit("\\n"), lit("\n")), lit("\\r"), lit("\r")),
      lit("\\t"), lit("\t")), lit("\u0001"), lit("\\"))
    when(c.startsWith("<"), regexp_extract(c, "^<(.*)>$", 1))
      .when(c.startsWith("\""), unesc)
      .otherwise(c)
  }

  private val TokenRe =
    ("""\?\w+""" +                                    // ?var
      """|<[^>]*>""" +                                // <iri>
      """|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?""" + // literal
      """|[A-Za-z_][\w.-]*:[\w.-]*""" +               // prefixed name
      """|\ba\b""" +                                  // rdf:type shorthand
      """|\.""").r

  /** Parse the SELECT projection and WHERE patterns. Returns (vars, bgp);
    * vars empty ⇔ SELECT * (project every variable in appearance order).
    */
  def parse(query: String): (List[String], List[(Term, Term, Term)]) = {
    val prefixes = """(?i)prefix\s+([\w-]*):\s*<([^>]*)>""".r
      .findAllMatchIn(query).map(m => m.group(1) -> m.group(2)).toMap
    val selectBody = """(?is)select\s+(.*?)\s+where""".r.findFirstMatchIn(query)
      .map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"unsupported SPARQL iterator (no SELECT…WHERE): $query"))
    val vars =
      if (selectBody.trim == "*") Nil
      else """\?(\w+)""".r.findAllMatchIn(selectBody).map(_.group(1)).toList
    val whereBlock = {
      val open = query.indexOf('{'); val close = query.lastIndexOf('}')
      require(open >= 0 && close > open, s"unsupported SPARQL iterator (no WHERE block): $query")
      query.substring(open + 1, close)
    }
    def toTerm(tok: String): Term =
      if (tok.startsWith("?")) Var(tok.tail)
      else if (tok.startsWith("<")) Const(tok.substring(1, tok.length - 1))
      else if (tok.startsWith("\"")) {
        val lexEnd = tok.lastIndexOf('"')
        Const(tok.substring(1, lexEnd)
          .replace("\\\\", "\u0001").replace("\\\"", "\"")
          .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
          .replace("\u0001", "\\"))
      }
      else if (tok == "a") Const("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      else {
        val i = tok.indexOf(':')
        val (pfx, local) = (tok.substring(0, i), tok.substring(i + 1))
        Const(prefixes.getOrElse(pfx,
          throw new IllegalArgumentException(s"undeclared prefix '$pfx:' in iterator: $query")) + local)
      }
    val toks = TokenRe.findAllIn(whereBlock).toList.filter(_ != ".")
    require(toks.nonEmpty && toks.length % 3 == 0,
      s"unsupported SPARQL iterator (patterns are not triples): $query")
    (vars, toks.grouped(3).map { case List(s, p, o) => (toTerm(s), toTerm(p), toTerm(o)) }.toList)
  }

  /** Compile the query over a (subject, predicate, object) token frame. */
  def apply(triples: DataFrame, query: String): DataFrame = {
    val (selectVars, bgp) = parse(query)
    val plain = triples.select(
      plainNode(col("subject")).as("s"),
      plainNode(col("predicate")).as("p"),
      plainNode(col("object")).as("o"))
    // one filtered/projected frame per pattern: constants prune rows,
    // variables become columns named after themselves
    val frames = bgp.map { case (ts, tp, to) =>
      var f = plain
      val slots = Seq("s" -> ts, "p" -> tp, "o" -> to)
      slots.foreach { case (c, t) => t match {
        case Const(v) => f = f.where(col(c) === v)
        case _ => ()
      } }
      // repeated variable inside one pattern (?x ?p ?x) is an equality
      val varSlots = slots.collect { case (c, Var(n)) => c -> n }
      varSlots.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
        dup.map(_._1).sliding(2).foreach {
          case Seq(c1, c2) => f = f.where(col(c1) === col(c2)); case _ => ()
        }
      }
      val slotOf = varSlots.groupBy(_._2).map { case (n, ss) => n -> ss.head._1 }
      f.select(varSlots.map(_._2).distinct.map(n => col(slotOf(n)).as(n)): _*)
    }
    // shared variables join; disjoint patterns are a cartesian product
    // (valid SPARQL semantics — rare in iterators, small by construction)
    val bound = frames.reduceLeft { (acc, next) =>
      val common = acc.columns.toSeq.intersect(next.columns.toSeq)
      if (common.nonEmpty) acc.join(next, common) else acc.crossJoin(next)
    }
    val outVars = if (selectVars.nonEmpty) selectVars
      else bgp.flatMap { case (a, b, c) => Seq(a, b, c) }
        .collect { case Var(n) => n }.distinct
    bound.select(outVars.map(col): _*)
  }
}
