package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S4/S5/J5 executed end-to-end against a real JDBC database (embedded
  * Derby, in /opt/spark/jars): the synthesized `SELECT DISTINCT` projection
  * pushdown (P1), type rendering (INT/DATE → string terms), NULL handling
  * through JDBC (null lattice P3), and a DB-backed RefObjectMap parent
  * build (J5). Derby shares the JVM, so local[n] executor threads see the
  * in-memory DB — the same shape as a networked MySQL/Postgres read.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dsn = "jdbc:derby:memory:graftdb"

  private lazy val db: Unit = {
    val c = java.sql.DriverManager.getConnection(dsn + ";create=true")
    val st = c.createStatement()
    // quoted lowercase identifiers: the synthesized projection quotes
    // case-exact (ANSI), like Spark's own JDBC writer does on CREATE
    st.execute("CREATE TABLE people (\"id\" INT, \"name\" VARCHAR(64), \"city\" VARCHAR(64), \"born\" DATE)")
    st.execute("INSERT INTO people VALUES (1, 'ada', 'berlin', DATE('1815-12-10'))")
    st.execute("INSERT INTO people VALUES (1, 'ada', 'berlin', DATE('1815-12-10'))") // dup row
    st.execute("INSERT INTO people VALUES (2, NULL, 'paris', NULL)")
    st.execute("CREATE TABLE cities (\"cname\" VARCHAR(64), \"country\" VARCHAR(8))")
    st.execute("INSERT INTO cities VALUES ('berlin', 'DE')")
    st.execute("INSERT INTO cities VALUES ('paris', 'FR')")
    st.close(); c.close()
  }

  private val prefixes =
    """@prefix rr: <http://www.w3.org/ns/r2rml#> .
      |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
      |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
      |@prefix d2rq: <http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#> .
      |@prefix ex: <http://ex/> .
      |""".stripMargin

  private def dbSource(table: String): String =
    s"""rml:logicalSource [
       |    rml:source [ a d2rq:Database; d2rq:jdbcDSN "$dsn" ];
       |    rr:tableName "$table" ];""".stripMargin

  test("S4/P1: tableName source runs the synthesized SELECT DISTINCT; INT/DATE render as strings; NULL drops the triple") {
    db
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  ${dbSource("people")}
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ];
         |  rr:predicateObjectMap [ rr:predicate ex:born; rr:objectMap [ rml:reference "born" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // SELECT DISTINCT collapses the duplicated ada row (P2 in-database);
    // person 2's NULL name and born emit nothing (P3 through JDBC)
    assert(ts == Set(
      ("<http://ex/p/1>", "<http://ex/name>", "\"ada\""),
      ("<http://ex/p/1>", "<http://ex/born>", "\"1815-12-10\"")))
  }

  test("S4: rml:query source executes verbatim SQL") {
    db
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [
         |    rml:source [ a d2rq:Database; d2rq:jdbcDSN "$dsn" ];
         |    rml:query "SELECT \\"id\\", UPPER(\\"name\\") AS \\"uname\\" FROM people WHERE \\"name\\" IS NOT NULL" ];
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "uname" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(ts == Set(("<http://ex/p/1>", "\"ADA\"")))
  }

  test("J5: RefObjectMap joins a CSV child against a DB-cursor parent") {
    db
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toFile
    val csv = new java.io.File(dir, "emp.csv")
    java.nio.file.Files.writeString(csv.toPath, "eid,home\n10,berlin\n11,paris\n12,nowhere\n")
    val ts = Engine.materialize(spark, prefixes +
      s"""<City> a rr:TriplesMap;
         |  ${dbSource("cities")}
         |  rr:subjectMap [ rr:template "http://ex/city/{cname}" ].
         |<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "${csv.getAbsolutePath}"; rml:referenceFormulation ql:CSV ];
         |  rr:subjectMap [ rr:template "http://ex/e/{eid}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:home;
         |    rr:objectMap [ rr:parentTriplesMap <City>;
         |                   rr:joinCondition [ rr:child "home"; rr:parent "cname" ] ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    // inner-join semantics: e/12 has no matching city → no triple
    assert(ts == Set(
      ("<http://ex/e/10>", "<http://ex/city/berlin>"),
      ("<http://ex/e/11>", "<http://ex/city/paris>")))
  }

  test("S4: tableName-only mapping inherits the dataset-level connection (JdbcDefaults)") {
    db
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rr:tableName "cities" ];
         |  rr:subjectMap [ rr:template "http://ex/city/{cname}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:country; rr:objectMap [ rml:reference "country" ] ].
         |""".stripMargin,
      config = Engine.Config(jdbc = Some(graft.exec.MappingCompiler.JdbcDefaults(dsn))))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(ts == Set(
      ("<http://ex/city/berlin>", "\"DE\""),
      ("<http://ex/city/paris>", "\"FR\"")))
  }

  test("S4: a SQL SELECT in rml:iterator is treated as the database query") {
    db
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:iterator "SELECT \\"cname\\" FROM cities WHERE \\"country\\" = 'DE'" ];
         |  rr:subjectMap [ rr:template "http://ex/city/{cname}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:seen; rr:objectMap [ rr:constant "y" ] ].
         |""".stripMargin,
      config = Engine.Config(jdbc = Some(graft.exec.MappingCompiler.JdbcDefaults(dsn))))
      .collect().map(_.getString(0)).toSet
    assert(ts == Set("<http://ex/city/berlin>"))
  }

  test("S4: table source without any connection fails loud") {
    val ex = intercept[IllegalArgumentException] {
      Engine.materialize(spark, prefixes +
        s"""<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rr:tableName "nope" ];
           |  rr:subjectMap [ rr:template "http://ex/x/{id}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:p; rr:objectMap [ rml:reference "id" ] ].
           |""".stripMargin).collect()
    }
    assert(ex.getMessage.contains("no connection"))
  }

  test("CLI: host/port/db config keys build the dialect's JDBC URL") {
    import graft.cli.Main.buildJdbcUrl
    assert(buildJdbcUrl("mysql", "h", "3306", "d") == "jdbc:mysql://h:3306/d")
    assert(buildJdbcUrl("postgres", "h", "5432", "d") == "jdbc:postgresql://h:5432/d")
    assert(buildJdbcUrl("sqlserver", "h", "1433", "d") == "jdbc:sqlserver://h:1433;databaseName=d")
    intercept[IllegalArgumentException](buildJdbcUrl("oracle", "h", "", "d"))
  }

  test("P1 plan: the JDBC scan ships only the mapped columns (pushdown visible in the plan)") {
    db
    val df = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  ${dbSource("people")}
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
         |""".stripMargin)
    val scan = df.queryExecution.sparkPlan.collectLeaves().map(_.toString).mkString
    // the synthesized query projects exactly the referenced attrs — the
    // relation's schema must not contain the unmapped city/born columns
    assert(scan.toLowerCase.contains("name"))
    assert(!scan.toLowerCase.contains("city"), s"unpruned JDBC scan:\n$scan")
  }
}
