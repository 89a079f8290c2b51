package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** JSON sources: document iterators (S2) and multi-valued array references
  * (T2 — one triple per element).
  */
class JsonSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def writeTmp(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft").toFile
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  private val json = writeTmp("data.json",
    """{"store": {"books": [
      |  {"id": 1, "title": "Dune", "tags": ["scifi", "classic"], "author": {"name": "Herbert"}},
      |  {"id": 2, "title": "Neuromancer", "tags": ["cyberpunk"], "author": {"name": "Gibson"}},
      |  {"id": 3, "title": "Untagged", "tags": [], "author": {"name": "Nobody"}}
      |]}}""".stripMargin)

  private val prefixes =
    """@prefix rr: <http://www.w3.org/ns/r2rml#> .
      |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
      |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
      |@prefix ex: <http://ex/> .
      |""".stripMargin

  test("JSON iterator walks into the document; nested refs + array multi-values") {
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$json"; rml:referenceFormulation ql:JSONPath;
         |                      rml:iterator "$$.store.books[*]" ];
         |  rr:subjectMap [ rr:template "http://ex/book/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:title; rr:objectMap [ rml:reference "title" ] ];
         |  rr:predicateObjectMap [ rr:predicate ex:author; rr:objectMap [ rml:reference "author.name" ] ];
         |  rr:predicateObjectMap [ rr:predicate ex:tag; rr:objectMap [ rml:reference "tags[*]" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    assert(ts.contains(("<http://ex/book/1>", "<http://ex/title>", "\"Dune\"")))
    // nested struct reference
    assert(ts.contains(("<http://ex/book/2>", "<http://ex/author>", "\"Gibson\"")))
    // multi-valued: two tag triples for book 1, one for book 2, none for book 3
    assert(ts.contains(("<http://ex/book/1>", "<http://ex/tag>", "\"scifi\"")))
    assert(ts.contains(("<http://ex/book/1>", "<http://ex/tag>", "\"classic\"")))
    assert(ts.contains(("<http://ex/book/2>", "<http://ex/tag>", "\"cyberpunk\"")))
    assert(!ts.exists(t => t._1 == "<http://ex/book/3>" && t._2 == "<http://ex/tag>"))
    // but book 3 still gets its scalar triples (per-expression null filtering)
    assert(ts.contains(("<http://ex/book/3>", "<http://ex/title>", "\"Untagged\"")))
  }

  private val condJson = writeTmp("people.json",
    """[{"name": "ada", "contacts": [
      |    {"kind": "email", "value": "ada@ex.org"},
      |    {"kind": "phone", "value": "555-1234"}]},
      | {"name": "bob", "contacts": [
      |    {"kind": "phone", "value": "555-9999"}]}]""".stripMargin)

  test("P4: inline template condition filters array elements (==) and drops non-matches") {
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$condJson"; rml:referenceFormulation ql:JSONPath;
         |                      rml:iterator "$$.[*]" ];
         |  rr:subjectMap [ rr:template "http://ex/p/{name}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:email;
         |    rr:objectMap [ rml:reference "contacts[?(@.kind==\\"email\\")].value" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    assert(ts.contains(("<http://ex/p/ada>", "<http://ex/email>", "\"ada@ex.org\"")))
    // bob has no email contact — the condition kills only that triple
    assert(!ts.exists(_._1 == "<http://ex/p/bob>"))
  }

  test("S2: a [*] iterator step over a single object iterates it as one row") {
    val single = writeTmp("single.json",
      """{"store": {"books": {"id": 7, "title": "Solo"}}}""")
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$single"; rml:referenceFormulation ql:JSONPath;
         |                      rml:iterator "$$.store.books[*]" ];
         |  rr:subjectMap [ rr:template "http://ex/book/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:title; rr:objectMap [ rml:reference "title" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ts == Set(("<http://ex/book/7>", "<http://ex/title>", "\"Solo\"")))
  }

  test("S2: nested [*][*] iterator explodes arrays of arrays (one row per leaf object)") {
    val nested = writeTmp("nested.json",
      """{"pages": [
        |  [{"id": 1, "w": "alpha"}, {"id": 2, "w": "beta"}],
        |  [{"id": 3, "w": "gamma"}]
        |]}""".stripMargin)
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$nested"; rml:referenceFormulation ql:JSONPath;
         |                      rml:iterator "$$.pages[*][*]" ];
         |  rr:subjectMap [ rr:template "http://ex/w/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:word; rr:objectMap [ rml:reference "w" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ts == Set(
      ("<http://ex/w/1>", "<http://ex/word>", "\"alpha\""),
      ("<http://ex/w/2>", "<http://ex/word>", "\"beta\""),
      ("<http://ex/w/3>", "<http://ex/word>", "\"gamma\"")))
  }

  test("S2: ROOT-level $[*][*] iterator explodes the inner array level " +
      "(previously both root [*] steps no-opped)") {
    val nested = writeTmp("root_nested.json",
      """[
        |  [{"id": 1, "w": "alpha"}, {"id": 2, "w": "beta"}],
        |  [{"id": 3, "w": "gamma"}]
        |]""".stripMargin)
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$nested"; rml:referenceFormulation ql:JSONPath;
         |                      rml:iterator "$$[*][*]" ];
         |  rr:subjectMap [ rr:template "http://ex/w/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:word; rr:objectMap [ rml:reference "w" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ts == Set(
      ("<http://ex/w/1>", "<http://ex/word>", "\"alpha\""),
      ("<http://ex/w/2>", "<http://ex/word>", "\"beta\""),
      ("<http://ex/w/3>", "<http://ex/word>", "\"gamma\"")))
  }

  private val bindings = writeTmp("bindings.srj",
    """{"head": {"vars": ["city", "pop"]},
      | "results": {"bindings": [
      |   {"city": {"type": "literal", "value": "Berlin"},
      |    "pop":  {"type": "literal", "datatype": "http://www.w3.org/2001/XMLSchema#integer", "value": "3600000"}},
      |   {"city": {"type": "literal", "value": "Paris"},
      |    "pop":  {"type": "literal", "value": "2100000"}}
      |]}}""".stripMargin)

  test("S6: SPARQL results-JSON source flattens bindings to value columns") {
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "endpoint:$bindings";
         |                      rml:iterator "SELECT ?city ?pop WHERE { ?s ?p ?o }" ];
         |  rr:subjectMap [ rr:template "http://ex/city/{city}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:pop; rr:objectMap [ rml:reference "pop" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    assert(ts == Set(
      ("<http://ex/city/Berlin>", "<http://ex/pop>", "\"3600000\""),
      ("<http://ex/city/Paris>", "<http://ex/pop>", "\"2100000\"")))
  }
}
