package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Error paths surface actionable messages: unknown Turtle prefix names the
  * position, a TriplesMap without a subject map names the TM, a template
  * referencing a missing column surfaces Spark's unresolved-column error.
  */
class ErrorPathsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def writeTmp(content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft").toFile
    val f = new java.io.File(dir, "data.csv")
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  private val csv = writeTmp("id,name\n1,ada\n")

  test("unknown prefix errors with the prefix name") {
    val e = intercept[Exception] {
      Engine.materialize(spark,
        """@prefix rr: <http://www.w3.org/ns/r2rml#> .
          |<TM> a rr:TriplesMap; rr:subjectMap [ rr:template "http://ex/{id}" ];
          |  nosuch:predicate "x" .
          |""".stripMargin)
    }
    assert(e.getMessage.contains("nosuch"))
  }

  test("missing subjectMap errors with the TriplesMap id") {
    val e = intercept[Exception] {
      Engine.materialize(spark,
        s"""@prefix rr: <http://www.w3.org/ns/r2rml#> .
           |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
           |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
           |<BadTM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "$csv"; rml:referenceFormulation ql:CSV ].
           |""".stripMargin)
    }
    assert(e.getMessage.contains("BadTM"))
  }

  test("template referencing a missing column raises an unresolved-column error") {
    val e = intercept[Exception] {
      Engine.materialize(spark,
        s"""@prefix rr: <http://www.w3.org/ns/r2rml#> .
           |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
           |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
           |@prefix ex: <http://ex/> .
           |<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "$csv"; rml:referenceFormulation ql:CSV ];
           |  rr:subjectMap [ rr:template "http://ex/{no_such_col}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
           |""".stripMargin).collect()
    }
    assert(e.getMessage.contains("no_such_col"))
  }
}
