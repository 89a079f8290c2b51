package graft

import graft.sources.{SourceReader, SparqlIterator}
import graft.model.LogicalSource
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S7 full path: the TM's SPARQL SELECT iterator over an N-Triples source
  * (reference: rdflib g.query(iterator), semantify.py:9990-10011).
  */
class SparqlIteratorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ntFile(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sparqlit")
    java.nio.file.Files.writeString(dir.resolve("data.nt"), lines.mkString("\n") + "\n")
    dir.toString
  }

  private val nt = Seq(
    """<http://ex/p1> <http://ex/v/name> "Alice" .""",
    """<http://ex/p1> <http://ex/v/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .""",
    """<http://ex/p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/v/Person> .""",
    """<http://ex/p2> <http://ex/v/name> "Bob \"B\"@home"@en .""",
    """<http://ex/p2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/v/Person> .""",
    """<http://ex/p3> <http://ex/v/name> "Robot" .""")

  test("two-pattern BGP binds shared variable via join; literal forms are rdflib str()") {
    val dir = ntFile(nt: _*)
    val df = SourceReader.read(spark, LogicalSource.NTriplesSource(dir,
      """PREFIX v: <http://ex/v/>
        |SELECT ?s ?n WHERE { ?s a v:Person . ?s v:name ?n . }""".stripMargin))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // p3 has a name but no type — excluded by the join; datatype/lang and
    // NT escapes are stripped from the bound lexical forms
    assert(rows.toSeq == Seq(
      ("http://ex/p1", "Alice"),
      ("http://ex/p2", "Bob \"B\"@home")))
  }

  test("constant literal and typed-literal objects match on lexical form") {
    val dir = ntFile(nt: _*)
    val df = SourceReader.read(spark, LogicalSource.NTriplesSource(dir,
      """SELECT ?s WHERE { ?s <http://ex/v/age> "30" . }"""))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("http://ex/p1"))
  }

  test("SELECT * projects every variable in appearance order") {
    val dir = ntFile(nt: _*)
    val df = SourceReader.read(spark, LogicalSource.NTriplesSource(dir,
      """SELECT * WHERE { ?who <http://ex/v/name> ?what . }"""))
    assert(df.columns.toSeq == Seq("who", "what"))
    assert(df.count() == 3)
  }

  test("empty iterator keeps raw s/p/o token columns") {
    val dir = ntFile(nt: _*)
    val df = SourceReader.read(spark, LogicalSource.NTriplesSource(dir, ""))
    assert(df.columns.toSeq == Seq("subject", "predicate", "object"))
    assert(df.count() == 6)
  }

  test("parse rejects non-triple patterns loudly") {
    intercept[IllegalArgumentException] {
      SparqlIterator.parse("SELECT ?x WHERE { ?x <http://ex/p> . }")
    }
  }
}
