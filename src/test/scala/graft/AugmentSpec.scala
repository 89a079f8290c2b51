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

  test("spanCorrupt: splicing target spans over their sentinels " +
      "reproduces the original; spans ordered, non-overlapping; short " +
      "and unselected docs pass through") {
    val docs = (0L until 400L).map(i => (i, s"doc $i " + ("ab" * (i % 41).toInt)))
      .toDF("doc_id", "text")
    val out = Augment.spanCorrupt(docs, "doc_id", "text", 0.5,
      nSpans = 3, maxSpanLen = 8, seed = 5).collect()
    var applied = 0
    for (r <- out) {
      val orig = r.getAs[String]("text")
      val in = r.getAs[String]("sc_input")
      val tgt = r.getAs[String]("sc_target")
      if (r.getAs[Boolean]("span_corrupted")) {
        applied += 1
        assert(orig.length >= 3)
        // parse target: <|extra_0|>s0<|extra_1|>s1<|extra_2|>s2<|extra_3|>
        val spans = (0 until 3).map { k =>
          val a = tgt.indexOf(s"<|extra_$k|>")
          val b = tgt.indexOf(s"<|extra_${k + 1}|>")
          assert(a >= 0 && b > a, s"target layout broken: $tgt")
          tgt.substring(a + s"<|extra_$k|>".length, b)
        }
        assert(tgt.endsWith("<|extra_3|>"))
        assert(spans.forall(_.nonEmpty), s"empty span in $tgt")
        // splice each span back over its sentinel in the input
        val rebuilt = (0 until 3).foldLeft(in) { (acc, k) =>
          acc.replace(s"<|extra_$k|>", spans(k))
        }
        assert(rebuilt == orig, s"reassembly failed for '$orig'")
      } else {
        assert(in == orig || (orig == null && in == null))
        assert(tgt == "")
      }
    }
    assert(applied > 100 && applied < 300, s"rate off: $applied of 400")

    // determinism: a second run is byte-identical
    val again = Augment.spanCorrupt(docs, "doc_id", "text", 0.5,
      nSpans = 3, maxSpanLen = 8, seed = 5).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
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
