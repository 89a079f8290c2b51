package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIM transform ([[Augment]]): the reassembly invariant (prefix +
  * middle + suffix == original for every transformed doc), split-point
  * bounds, determinism, rate behavior, and edge cases.
  */
class AugmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Pre = "<|fim_prefix|>"
  private val Suf = "<|fim_suffix|>"
  private val Mid = "<|fim_middle|>"

  test("PSM: every transformed doc reassembles to the original; " +
      "untransformed pass through; rate ~ requested") {
    val docs = (0L until 400L).map(i => (i, s"doc $i " + ("x" * (i % 37).toInt)))
      .toDF("doc_id", "text")
    val out = Augment.fimTransform(docs, "doc_id", "text", 0.5, seed = 7)
      .collect()
    var applied = 0
    for (r <- out) {
      val orig = r.getAs[String]("text")
      val fim = r.getAs[String]("fim_text")
      if (r.getAs[Boolean]("fim_applied")) {
        applied += 1
        assert(fim.startsWith(Pre), fim)
        val sufAt = fim.indexOf(Suf)
        val midAt = fim.indexOf(Mid)
        assert(sufAt >= Pre.length && midAt > sufAt)
        val p = fim.substring(Pre.length, sufAt)
        val s = fim.substring(sufAt + Suf.length, midAt)
        val m = fim.substring(midAt + Mid.length)
        assert(p + m + s == orig, s"reassembly failed for '$orig'")
      } else assert(fim == orig)
    }
    assert(applied > 120 && applied < 280, s"rate off: $applied/400")
  }

  test("SPM layout, determinism across runs, rate 0 and 1") {
    val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
    val spm = Augment.fimTransform(docs, "doc_id", "text", 1.0, seed = 2,
      psm = false).collect()
    for (r <- spm) {
      val fim = r.getAs[String]("fim_text")
      assert(r.getAs[Boolean]("fim_applied"))
      assert(fim.startsWith(Suf), fim)
      val preAt = fim.indexOf(Pre)
      val midAt = fim.indexOf(Mid)
      val s = fim.substring(Suf.length, preAt)
      val p = fim.substring(preAt + Pre.length, midAt)
      val m = fim.substring(midAt + Mid.length)
      assert(p + m + s == r.getAs[String]("text"))
    }
    val a = Augment.fimTransform(docs, "doc_id", "text", 1.0, seed = 2)
      .collect().map(_.getAs[String]("fim_text"))
    val b = Augment.fimTransform(docs, "doc_id", "text", 1.0, seed = 2)
      .collect().map(_.getAs[String]("fim_text"))
    assert(a.sameElements(b)) // bitwise stable
    val none = Augment.fimTransform(docs, "doc_id", "text", 0.0)
      .collect()
    assert(none.forall(r => !r.getAs[Boolean]("fim_applied") &&
      r.getAs[String]("fim_text") == r.getAs[String]("text")))
    // empty text never transforms (guarded), null text survives
    val edge = Seq((9L, ""), (10L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val e = Augment.fimTransform(edge, "doc_id", "text", 1.0).collect()
    assert(e.forall(r => !r.getAs[Boolean]("fim_applied")))
  }
}
