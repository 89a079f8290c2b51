package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S8 remote HTTP sources (served from a loopback HTTP server) and archive
  * source decompression (zip / tar.gz — reference inflates archives inline,
  * semantify.py:10577-10626).
  */
class RemoteSourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val prefixes =
    """@prefix rr: <http://www.w3.org/ns/r2rml#> .
      |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
      |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
      |@prefix ex: <http://ex/> .
      |""".stripMargin

  private def withHttpServer(files: Map[String, String])(body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    files.foreach { case (path, content) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = content.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("S8: http:// CSV source downloads and materializes through a mapping") {
    withHttpServer(Map("/people.csv" -> "id,name\n1,ada\n2,bob\n")) { port =>
      val ts = Engine.materialize(spark, prefixes +
        s"""<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "http://127.0.0.1:$port/people.csv";
           |                      rml:referenceFormulation ql:CSV ];
           |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
           |""".stripMargin).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(ts == Set(
        ("<http://ex/p/1>", "<http://ex/name>", "\"ada\""),
        ("<http://ex/p/2>", "<http://ex/name>", "\"bob\"")))
    }
  }

  test("S8: http:// JSON source with iterator") {
    withHttpServer(Map("/d.json" -> """[{"id":"7","v":"x"}]""")) { port =>
      val ts = Engine.materialize(spark, prefixes +
        s"""<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "http://127.0.0.1:$port/d.json";
           |                      rml:referenceFormulation ql:JSONPath; rml:iterator "$$.[*]" ];
           |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ].
           |""".stripMargin).collect()
      assert(ts.length == 1 && ts.head.getString(2) == "\"x\"")
    }
  }

  test("S8: WoT TD descriptor resolves a web-API source (direct td:hasForm, content-type formulation)") {
    // the IoT shape the reference resolves (semantify.py:2526-2527): the
    // source is a Thing Description whose form names an HTTP target and a
    // media type; no ql: formulation anywhere in the mapping — it must
    // come from hctl:forContentType
    withHttpServer(Map("/props.json" -> """[{"sensor":"t1","unit":"C"}]""")) { port =>
      val ts = Engine.materialize(spark, prefixes +
        s"""@prefix td: <https://www.w3.org/2019/wot/td#> .
           |@prefix hctl: <https://www.w3.org/2019/wot/hypermedia#> .
           |<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source [ a td:Thing;
           |      td:hasForm [ hctl:hasTarget "http://127.0.0.1:$port/props.json";
           |                   hctl:forContentType "application/json" ] ];
           |    rml:iterator "$$.[*]" ];
           |  rr:subjectMap [ rr:template "http://ex/sensor/{sensor}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:unit; rr:objectMap [ rml:reference "unit" ] ].
           |""".stripMargin).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(ts == Set(("<http://ex/sensor/t1>", "<http://ex/unit>", "\"C\"")))
    }
  }

  test("S6: live SPARQL endpoint queried over the protocol") {
    val bindings =
      """{"head":{"vars":["s","name"]},
        |"results":{"bindings":[
        |  {"s":{"type":"uri","value":"http://ex/r/1"},"name":{"type":"literal","value":"ada"}},
        |  {"s":{"type":"uri","value":"http://ex/r/2"},"name":{"type":"literal","value":"bob"}}]}}""".stripMargin
    @volatile var seenQuery: String = null
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenQuery = ex.getRequestURI.getRawQuery
      val bytes = bindings.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/sparql-results+json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val ts = Engine.materialize(spark, prefixes +
        s"""<TM> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "endpoint:http://127.0.0.1:$port/sparql";
           |                      rml:referenceFormulation ql:JSONPath;
           |                      rml:query "SELECT ?s ?name WHERE { ?s <http://ex/name> ?name }" ];
           |  rr:subjectMap [ rr:template "http://ex/p/{name}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:src; rr:objectMap [ rml:reference "s" ] ].
           |""".stripMargin).collect()
        .map(r => (r.getString(0), r.getString(2))).toSet
      assert(ts == Set(
        ("<http://ex/p/ada>", "\"http://ex/r/1\""),
        ("<http://ex/p/bob>", "\"http://ex/r/2\"")))
      assert(seenQuery != null && seenQuery.contains("query=SELECT"),
        s"endpoint must receive the SPARQL query; got: $seenQuery")
    } finally server.stop(0)
  }

  test("S6: two TMs on one endpoint with different queries get different bindings") {
    def bindings(v: String) =
      s"""{"head":{"vars":["x"]},"results":{"bindings":[{"x":{"type":"literal","value":"$v"}}]}}"""
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = ex.getRequestURI.getRawQuery
      val body = (if (q != null && q.contains("QA")) bindings("alpha") else bindings("beta")).getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val ts = Engine.materialize(spark, prefixes +
        s"""<TMA> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "endpoint:http://127.0.0.1:$port/sparql";
           |                      rml:query "SELECT QA" ];
           |  rr:subjectMap [ rr:template "http://ex/a/{x}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "x" ] ].
           |<TMB> a rr:TriplesMap;
           |  rml:logicalSource [ rml:source "endpoint:http://127.0.0.1:$port/sparql";
           |                      rml:query "SELECT QB" ];
           |  rr:subjectMap [ rr:template "http://ex/b/{x}" ];
           |  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "x" ] ].
           |""".stripMargin).collect().map(_.getString(0)).toSet
      // a shared-source cache keyed too coarsely would serve TMB TMA's
      // bindings — both subjects must reflect their OWN query's result
      assert(ts == Set("<http://ex/a/alpha>", "<http://ex/b/beta>"))
    } finally server.stop(0)
  }

  test("S8: a failing remote fetch names the URL in the error") {
    val ex = intercept[java.io.IOException] {
      graft.sources.SourceReader.resolvePath("http://127.0.0.1:1/nope.csv")
    }
    assert(ex.getMessage.contains("http://127.0.0.1:1/nope.csv"))
  }

  test("ORC source materializes through a mapping (extension-detected)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/data.orc"
    import spark.implicits._
    Seq(("1", "ada"), ("2", "bob")).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").orc(dir)
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$dir"; rml:referenceFormulation ql:CSV ];
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
         |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(ts == Set(("<http://ex/p/1>", "\"ada\""), ("<http://ex/p/2>", "\"bob\"")))
  }

  test("zip CSV source inflates and reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zsrc").toFile
    val zipPath = new java.io.File(dir, "data.csv.zip")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    z.putNextEntry(new java.util.zip.ZipEntry("data.csv"))
    z.write("id,name\n1,ada\n".getBytes("UTF-8")); z.closeEntry(); z.close()
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "${zipPath.getAbsolutePath}"; rml:referenceFormulation ql:CSV ];
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
         |""".stripMargin).collect()
    assert(ts.map(r => (r.getString(0), r.getString(2))).toSet ==
      Set(("<http://ex/p/1>", "\"ada\"")))
  }

  test("archive entries with the same basename in different dirs both survive") {
    // a/data.csv and b/data.csv must not silently overwrite each other
    val dir = java.nio.file.Files.createTempDirectory("graft_zdup").toFile
    val zipPath = new java.io.File(dir, "two.zip")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    z.putNextEntry(new java.util.zip.ZipEntry("a/data.csv"))
    z.write("id,name\n1,ada\n".getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("b/data.csv"))
    z.write("id,name\n2,bob\n".getBytes("UTF-8")); z.closeEntry(); z.close()
    val local = graft.sources.SourceReader.resolvePath(zipPath.getAbsolutePath)
    val rows = spark.read.option("header", "true").csv(local).collect()
    assert(rows.map(_.getString(1)).toSet == Set("ada", "bob"))
  }

  test("tar.gz JSON source inflates and reads") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft_tsrc").toFile
    val tarPath = new java.io.File(dir, "data.json.tar.gz")
    val payload = """[{"id":"3","v":"t"}]""".getBytes("UTF-8")
    val t = new TarArchiveOutputStream(
      new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(tarPath)))
    val e = new TarArchiveEntry("data.json"); e.setSize(payload.length)
    t.putArchiveEntry(e); t.write(payload); t.closeArchiveEntry(); t.close()
    val ts = Engine.materialize(spark, prefixes +
      s"""<TM> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "${tarPath.getAbsolutePath}";
         |                      rml:referenceFormulation ql:JSONPath; rml:iterator "$$.[*]" ];
         |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ].
         |""".stripMargin).collect()
    assert(ts.length == 1 && ts.head.getString(0) == "<http://ex/p/3>")
  }
}
