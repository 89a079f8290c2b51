package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: `GraftExtensions.register` puts the codegen
  * expressions in the session function registry so plain `spark.sql` can
  * call them. (The `spark.sql.extensions=graft.GraftExtensions` config
  * path wires the same builders at session build time; it is driven
  * end-to-end via spark-shell in the verify flow, since a suite JVM
  * already holds a session.)
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("registered SQL functions plan the codegen expressions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_cosine(a, a) AS c,
        |  graft_sqdist(a, b, 0, 3) AS s,
        |  graft_encode_iri('a b/c') AS e, graft_nt_escape('x"y') AS n,
        |  graft_slugify('Hello World!') AS sl
        |FROM vecs""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 27.0)
    assert(r.getString(3) == "a%20b%2Fc")
    assert(r.getString(4) == "x\\\"y")
    assert(r.getString(5) == "hello-world")
  }

  test("wrong arity fails with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").head())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("2"))
  }
}
