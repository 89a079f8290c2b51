package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.apache.spark.sql.SparkSession

/** HTTP entry point — parity with the reference's Flask service
  * (reference: app.py:7-17): `GET /` greets, `GET|POST
  * /graph_creation/<config>` runs the named config.ini through the engine
  * and confirms. The config path in the URL is absolute minus its leading
  * slash, exactly as the reference concatenates `"/" + config_file`.
  *
  * One SparkSession serves every request (a session is the expensive
  * per-process resource; configs are cheap jobs on it). Requests run on
  * the server's dispatch thread — the reference's os.system call is
  * equally serial.
  */
object Server {

  def start(spark: SparkSession, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val (code, body) =
          if (path.startsWith("/graph_creation/")) {
            val config = "/" + path.stripPrefix("/graph_creation/")
            try {
              graft.cli.Main.runConfig(spark, config)
              (200, s"The file has been semantified $config\n")
            } catch {
              case e: Throwable => (500, s"graph creation failed for $config: ${e.getMessage}\n")
            }
          } else if (path == "/") (200, "Welcome to the Rdf Graph Service")
          else (404, "not found\n")
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val out = ex.getResponseBody
        try out.write(bytes) finally out.close()
      }
    })
    server.setExecutor(null)
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val port = args.headOption.orElse(sys.env.get("GRAFT_HTTP_PORT"))
      .map(_.toInt).getOrElse(4000) // reference serves on 4000 (app.py:17)
    val (spark, _) = graft.cli.Main.buildSession()
    start(spark, port)
    println(s"graft HTTP service listening on :$port")
    Thread.currentThread.join() // serve until killed
  }
}
