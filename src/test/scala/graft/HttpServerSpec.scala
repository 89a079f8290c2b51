package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HTTP service parity with the reference's Flask app (app.py):
  * GET /graph_creation/<config> runs the config and writes the output.
  */
class HttpServerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def get(url: String): (Int, String) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(in.readAllBytes(), "UTF-8")
    in.close()
    (code, body)
  }

  test("GET /graph_creation/<config> materializes the config's datasets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http").toFile
    def write(name: String, content: String): java.io.File = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.writeString(f.toPath, content)
      f
    }
    write("people.csv", "id,name\n1,ada\n2,bob\n")
    write("mapping.ttl",
      """@prefix rr: <http://www.w3.org/ns/r2rml#> .
        |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        |@prefix ex: <http://ex/> .
        |<TM> a rr:TriplesMap;
        |  rml:logicalSource [ rml:source "people.csv"; rml:referenceFormulation ql:CSV ];
        |  rr:subjectMap [ rr:template "http://ex/p/{id}" ];
        |  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "name" ] ].
        |""".stripMargin)
    val config = write("config.ini",
      s"""[datasets]
         |number_of_datasets: 1
         |output_folder: ${dir.getAbsolutePath}/out
         |[dataset1]
         |name: people
         |mapping: ${dir.getAbsolutePath}/mapping.ttl
         |""".stripMargin)

    val server = graft.http.Server.start(spark, 0) // ephemeral port
    try {
      val port = server.getAddress.getPort
      val (hi, greeting) = get(s"http://127.0.0.1:$port/")
      assert(hi == 200 && greeting.contains("Rdf Graph Service"))
      // reference URL shape: absolute config path minus its leading slash
      val (code, body) = get(s"http://127.0.0.1:$port/graph_creation/" +
        config.getAbsolutePath.stripPrefix("/"))
      assert(code == 200, body)
      assert(body.contains("has been semantified"))
      val lines = spark.read.text(s"${dir.getAbsolutePath}/out/people")
        .collect().map(_.getString(0)).toSet
      assert(lines == Set(
        "<http://ex/p/1> <http://ex/name> \"ada\" .",
        "<http://ex/p/2> <http://ex/name> \"bob\" ."))
      val (missing, _) = get(s"http://127.0.0.1:$port/graph_creation/no/such/config.ini")
      assert(missing == 500)
    } finally server.stop(0)
  }
}
