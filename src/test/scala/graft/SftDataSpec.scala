package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SFT conversation prep ([[SftData]]): both JSONL layouts, role
  * normalization, validation gates, ChatML rendering and the span
  * arithmetic a loss-masked packer consumes.
  */
class SftDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parsed(js: String*) =
    js.toSeq.toDF("conv_json").withColumn("messages",
      SftData.parseConversationJson(col("conv_json")))

  test("parse + normalize: OpenAI and ShareGPT layouts converge") {
    val df = SftData.validateConversations(parsed(
      """{"messages":[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]}""",
      """{"conversations":[{"from":"human","value":"hi"},{"from":"gpt","value":"yo"}]}"""))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Boolean]("sft_valid")))
    val roles = df.select(expr("transform(messages, m -> m.role)"))
      .collect().map(_.getSeq[String](0))
    assert(roles.forall(_.sameElements(Seq("user", "assistant"))))
  }

  test("validation gates: each malformation trips exactly its flag") {
    val df = SftData.validateConversations(parsed(
      // assistant-first
      """{"messages":[{"role":"assistant","content":"a"},{"role":"user","content":"u"}]}""",
      // double user
      """{"messages":[{"role":"user","content":"u"},{"role":"user","content":"u2"},{"role":"assistant","content":"a"}]}""",
      // ends on user
      """{"messages":[{"role":"user","content":"u"},{"role":"assistant","content":"a"},{"role":"user","content":"u2"}]}""",
      // blank content
      """{"messages":[{"role":"user","content":" "},{"role":"assistant","content":"a"}]}""",
      // unknown role
      """{"messages":[{"role":"narrator","content":"x"},{"role":"assistant","content":"a"}]}""",
      // unparseable
      """not json at all""",
      // system-only (too short)
      """{"messages":[{"role":"system","content":"s"}]}"""))
    val r = df.collect()
    assert(r.forall(!_.getAs[Boolean]("sft_valid")))
    assert(!r(0).getAs[Boolean]("alternation_ok"))
    assert(!r(1).getAs[Boolean]("alternation_ok"))
    assert(r(2).getAs[Boolean]("alternation_ok") &&
      !r(2).getAs[Boolean]("ends_assistant"))
    assert(r(3).getAs[Boolean]("alternation_ok") &&
      !r(3).getAs[Boolean]("nonempty_ok"))
    assert(!r(4).getAs[Boolean]("alternation_ok")) // narrator != user
    assert(!r(5).getAs[Boolean]("sft_valid")) // null messages
    assert(r(6).getAs[Boolean]("has_system") && !r(6).getAs[Boolean]("sft_valid"))
  }

  test("renderChatML: exact string, spans index into assistant content") {
    val df = SftData.renderChatML(parsed(
      """{"messages":[{"role":"system","content":"be kind"},{"role":"user","content":"hello"},{"role":"assistant","content":"world!"},{"role":"user","content":"more"},{"role":"assistant","content":"ok"}]}"""))
    val r = df.collect()(0)
    val text = r.getAs[String]("rendered_text")
    assert(text ==
      "<|im_start|>system\nbe kind<|im_end|>\n" +
      "<|im_start|>user\nhello<|im_end|>\n" +
      "<|im_start|>assistant\nworld!<|im_end|>\n" +
      "<|im_start|>user\nmore<|im_end|>\n" +
      "<|im_start|>assistant\nok<|im_end|>\n")
    val spans = r.getAs[String]("assistant_spans").split(",")
    assert(spans.length == 2)
    // every span slices exactly its assistant content out of the text
    val got = spans.map { s =>
      val Array(st, ln) = s.split(":").map(_.toInt)
      text.substring(st, st + ln)
    }
    assert(got.sameElements(Array("world!", "ok")))
    assert(r.getAs[Long]("assistant_chars") == 8L)
  }

  test("packRenderedWithMasks: every pack-relative span slices an " +
      "assistant content out of packed_text; budgets respected") {
    val convs = (0 until 9).map { i =>
      s"""{"messages":[{"role":"user","content":"q$i"},{"role":"assistant","content":"answer-$i"}]}"""
    }
    val df = SftData.renderChatML(parsed(convs: _*))
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("grp", lit("g"))
    val packs = SftData.packRenderedWithMasks(df, "doc_id", "grp",
      length(col("rendered_text")).cast("long"), 150L).collect()
    assert(packs.length > 1) // the budget actually splits
    var total = 0
    for (p <- packs) {
      val text = p.getAs[String]("packed_text")
      val spans = p.getAs[String]("mask_spans").split(",")
      assert(spans.length == p.getAs[Long]("n_docs"))
      total += spans.length
      for (s <- spans) {
        val Array(st, ln) = s.split(":").map(_.toInt)
        val sliced = text.substring(st, st + ln)
        assert(sliced.matches("answer-\\d"), s"sliced '$sliced'")
        // and the slice sits between the assistant header and im_end
        assert(text.regionMatches(st - 10, "assistant\n", 0, 10))
        assert(text.regionMatches(st + ln, "<|im_end|>", 0, 10))
      }
    }
    assert(total == 9) // every conversation's mask survived packing
  }

  // merges chosen so tokenization WOULD straddle assistant boundaries if
  // the text were tokenized whole: "r\n" spans the header/content border
  // ('assistant' + '\n' + content starting who-knows-where is immune, but
  // "t\n" merges the header's final char with the newline), and "er"
  // lands inside "answer". Segment-wise tokenization must keep every
  // span decodable regardless.
  private val straddleMerges = Seq(("t", "\n"), ("e", "r"), ("a", "n"))

  test("tokenizeWithMasks: every token-space span DECODES back to " +
      "exactly its assistant content (nontrivial, boundary-straddling " +
      "merges)") {
    val df = SftData.tokenizeWithMasks(SftData.renderChatML(parsed(
      """{"messages":[{"role":"user","content":"hello there"},{"role":"assistant","content":"answer one\nmore"},{"role":"user","content":"again"},{"role":"assistant","content":"trailer"}]}""")),
      straddleMerges)
    val r = df.collect()(0)
    val ids = r.getAs[scala.collection.Seq[Int]]("token_ids")
    assert(r.getAs[Long]("n_tokens") == ids.length.toLong)
    val spans = r.getAs[String]("token_spans").split(",")
    val decoded = spans.map { s =>
      val Array(st, ln) = s.split(":").map(_.toInt)
      Bpe.decode(ids.slice(st, st + ln).toSeq, straddleMerges)
    }
    assert(decoded.sameElements(Array("answer one\nmore", "trailer")))
    // the merges actually fired (ids are shorter than the byte count)
    assert(ids.length < r.getAs[String]("rendered_text").length)
    // and the whole stream decodes back to the full rendered text
    assert(Bpe.decode(ids.toSeq, straddleMerges) ==
      r.getAs[String]("rendered_text"))
  }

  test("packTokenizedWithMasks: pack-relative token spans decode to " +
      "assistant contents across pack boundaries") {
    val convs = (0 until 9).map { i =>
      s"""{"messages":[{"role":"user","content":"q$i"},{"role":"assistant","content":"answer-$i"}]}"""
    }
    val df = SftData.tokenizeWithMasks(SftData.renderChatML(parsed(convs: _*)),
        straddleMerges)
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("grp", lit("g"))
    val packs = SftData.packTokenizedWithMasks(df, "doc_id", "grp", 120L)
      .collect()
    assert(packs.length > 1) // the budget actually splits
    var total = 0
    for (p <- packs) {
      val ids = p.getAs[scala.collection.Seq[Int]]("token_ids")
      assert(p.getAs[Long]("n_tokens") == ids.length.toLong)
      val spans = p.getAs[String]("mask_spans").split(",")
      assert(spans.length == p.getAs[Long]("n_docs"))
      total += spans.length
      for (s <- spans) {
        val Array(st, ln) = s.split(":").map(_.toInt)
        val dec = Bpe.decode(ids.slice(st, st + ln).toSeq, straddleMerges)
        assert(dec.matches("answer-\\d"), s"decoded '$dec'")
      }
    }
    assert(total == 9) // every conversation's mask survived packing
  }

  test("Bpe.decode: inverse of encode; corrupt ids throw") {
    val text = "the\tquick bröwn\nfox" // multi-byte UTF-8 survives
    assert(Bpe.decode(Bpe.encode(text, straddleMerges).toSeq,
      straddleMerges) == text)
    assert(Bpe.decode(Bpe.encode(text, Nil).toSeq, Nil) == text)
    intercept[IllegalArgumentException](
      Bpe.decode(Seq(256 + straddleMerges.length), straddleMerges))
    intercept[IllegalArgumentException](Bpe.decode(Seq(-1), Nil))
  }

  test("prepareDpoPairs: gates and rendered pair") {
    val rows = Seq(
      // valid
      (Seq(("user", "pick one")), "red", "blue"),
      // prompt ends on assistant (nothing to respond to)
      (Seq(("user", "q"), ("assistant", "a")), "x", "y"),
      // identical pair: no preference signal
      (Seq(("user", "q")), "same", "same"),
      // blank rejected
      (Seq(("user", "q")), "ok", "   "),
      // broken prompt alternation
      (Seq(("assistant", "a"), ("user", "q")), "x", "y"))
    val df = rows.toDF("pm", "chosen", "rejected")
      .withColumn("prompt_messages",
        expr("transform(pm, m -> struct(m._1 as role, m._2 as content))"))
    val out = SftData.prepareDpoPairs(df).collect()
    assert(out(0).getAs[Boolean]("dpo_valid"))
    assert(out(0).getAs[String]("chosen_text") ==
      "<|im_start|>user\npick one<|im_end|>\n" +
      "<|im_start|>assistant\nred<|im_end|>\n")
    assert(out(0).getAs[String]("rejected_text").endsWith("blue<|im_end|>\n"))
    for (i <- 1 until 5) {
      assert(!out(i).getAs[Boolean]("dpo_valid"), s"row $i")
      assert(out(i).isNullAt(out(i).fieldIndex("chosen_text")))
    }
  }

  test("composition: validate → filter → render → exact dedup downstream") {
    val df = SftData.renderChatML(SftData.validateConversations(parsed(
      """{"messages":[{"role":"user","content":"same"},{"role":"assistant","content":"thing"}]}""",
      """{"conversations":[{"from":"human","value":"same"},{"from":"gpt","value":"thing"}]}""",
      """{"messages":[{"role":"assistant","content":"broken"}]}"""))
      .filter(col("sft_valid")))
    // the two layouts render byte-identically → downstream exact dedup
    // collapses them; the invalid row was filtered before rendering
    val texts = df.select("rendered_text").collect().map(_.getString(0))
    assert(texts.length == 2 && texts.distinct.length == 1)
  }
}
