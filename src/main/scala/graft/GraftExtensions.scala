package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's codegen expressions: register with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) and every custom expression
  * is callable from `spark.sql` / views / the Thrift server — the same
  * Catalyst nodes the Scala API plans, so SQL users get whole-stage codegen,
  * not UDF wrappers:
  *
  *   SELECT graft_cosine(a.vec, b.vec)            -- fused one-pass cosine
  *   SELECT graft_encode_iri(name)                -- RML percent-encoding
  *   SELECT graft_nt_escape(text)                 -- N-Triples literal escape
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def unary(name: String, usage: String, make: Expression => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        make(args.head)
      })

  private def binary(name: String, usage: String,
      make: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        make(args(0), args(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("graft_dot",
      "graft_dot(a, b) - dot product of two double arrays (codegen)", VecDot))
    ext.injectFunction(binary("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two double arrays (codegen, one pass)",
      VecCosine))
    ext.injectFunction((FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist",
        "graft_sqdist(a, b, offset, len) - squared L2 over [offset, offset+len)"),
      (args: Seq[Expression]) => {
        require(args.length == 4, s"graft_sqdist expects 4 arguments, got ${args.length}")
        VecSqDist(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction(unary("graft_encode_iri",
      "graft_encode_iri(s) - RML template percent-encoding (python-quote compatible)",
      RmlEncode))
    ext.injectFunction(unary("graft_nt_escape",
      "graft_nt_escape(s) - N-Triples literal escaping", NtEscape))
    ext.injectFunction(unary("graft_bnode_encode",
      "graft_bnode_encode(s) - blank-node label encoding", BlankNodeEncode))
    ext.injectFunction(unary("graft_slugify",
      "graft_slugify(s) - FnO slugify", Slugify))
    ext.injectFunction(unary("graft_fnv64",
      "graft_fnv64(s) - 64-bit FNV-1a hash", Fnv1a64))
  }
}

object GraftExtensions {
  /** Register the same functions into an ALREADY-RUNNING session (the
    * `spark.sql.extensions` config only applies at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    def arity(name: String, n: Int, args: Seq[Expression]): Unit =
      require(args.length == n, s"$name expects $n arguments, got ${args.length}")
    put("graft_dot", { a => arity("graft_dot", 2, a); VecDot(a(0), a(1)) })
    put("graft_cosine", { a => arity("graft_cosine", 2, a); VecCosine(a(0), a(1)) })
    put("graft_sqdist", { a => arity("graft_sqdist", 4, a); VecSqDist(a(0), a(1), a(2), a(3)) })
    put("graft_encode_iri", { a => arity("graft_encode_iri", 1, a); RmlEncode(a.head) })
    put("graft_nt_escape", { a => arity("graft_nt_escape", 1, a); NtEscape(a.head) })
    put("graft_bnode_encode", { a => arity("graft_bnode_encode", 1, a); BlankNodeEncode(a.head) })
    put("graft_slugify", { a => arity("graft_slugify", 1, a); Slugify(a.head) })
    put("graft_fnv64", { a => arity("graft_fnv64", 1, a); Fnv1a64(a.head) })
  }
}
