package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Instruction / SFT conversation-data preparation — the post-pretraining
  * side of a training-data pipeline: multi-turn `messages` arrays
  * (role/content structs, the universal fine-tuning JSONL shape) get
  * schema-parsed, role-normalized, structurally VALIDATED, rendered to
  * a chat-template string, and annotated with the assistant-content
  * spans a loss-masked packer needs.
  *
  * Everything is pure Column algebra over higher-order array functions
  * (`transform` with index, `forall`, `aggregate`) — codegen'd, no
  * UDFs, no shuffle: at 100 TB these are scan-side projections exactly
  * like the pretraining quality gates, and compose with the existing
  * dedup/packing operators downstream (dedup on `rendered_text`,
  * [[Packing.packSequences]] on its token count, masks from
  * `assistant_spans`).
  *
  * Reference scope note: SDM-RDFizer has no LLM-data surface; this is
  * the repo's beyond-parity training-data family (COVERAGE.md).
  */
object SftData {

  /** The canonical messages schema: array of (role, content). */
  val MessagesType: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parse a JSON conversation document. Accepts BOTH common layouts —
    * OpenAI-style `{"messages":[{"role","content"}]}` and
    * ShareGPT-style `{"conversations":[{"from","value"}]}` — and
    * normalizes to the canonical schema with [[normalizeRoles]].
    */
  def parseConversationJson(j: Column): Column = {
    val openai = from_json(j, StructType(Seq(
      StructField("messages", MessagesType))))
    val sharegpt = from_json(j, StructType(Seq(
      StructField("conversations", ArrayType(StructType(Seq(
        StructField("from", StringType),
        StructField("value", StringType))))))))
    val fromShare = transform(sharegpt.getField("conversations"),
      m => struct(m.getField("from").as("role"),
        m.getField("value").as("content")))
    normalizeRoles(coalesce(openai.getField("messages"), fromShare))
  }

  /** Map the role-name zoo onto {system, user, assistant}; unknown
    * names pass through (and then fail validation by name). */
  def normalizeRoles(msgs: Column): Column =
    transform(msgs, m => struct(
      when(lower(m.getField("role")).isin("user", "human", "prompter"), "user")
        .when(lower(m.getField("role"))
          .isin("assistant", "gpt", "bot", "model"), "assistant")
        .when(lower(m.getField("role")) === "system", "system")
        .otherwise(lower(m.getField("role"))).as("role"),
      m.getField("content").as("content")))

  /** Structural validation columns:
    *  - `n_turns`, `has_system`
    *  - `alternation_ok`: an optional leading system turn, then strict
    *    user/assistant alternation starting at user
    *  - `ends_assistant`: the conversation is trainable (has a target)
    *  - `nonempty_ok`: no blank contents
    *  - `sft_valid`: the conjunction (≥ 1 user and 1 assistant turn
    *    implied by alternation + ends_assistant)
    */
  def validateConversations(df: DataFrame,
      msgsCol: String = "messages"): DataFrame = {
    val msgs = col(msgsCol)
    val hasSystem = element_at(msgs, 1).getField("role") === "system"
    val offset = when(hasSystem, 1).otherwise(0)
    val alternation = forall(
      transform(msgs, (m, i) => {
        val rel = i - offset
        m.getField("role") === when(rel < 0, "system")
          .when(rel % 2 === 0, "user").otherwise("assistant")
      }), b => b)
    val nTurns = size(msgs)
    df.withColumn("n_turns", nTurns)
      .withColumn("has_system", coalesce(hasSystem, lit(false)))
      .withColumn("alternation_ok", coalesce(alternation, lit(false)))
      .withColumn("ends_assistant", coalesce(
        element_at(msgs, -1).getField("role") === "assistant", lit(false)))
      .withColumn("nonempty_ok", coalesce(forall(msgs,
        m => length(trim(m.getField("content"))) > 0), lit(false)))
      .withColumn("sft_valid",
        col("alternation_ok") && col("ends_assistant") &&
          col("nonempty_ok") && nTurns >= (lit(2) + offset))
  }

  private val Begin = "<|im_start|>"
  private val End = "<|im_end|>\n"

  /** ChatML rendering of a messages array as a single Column. */
  private def renderedExpr(msgs: Column): Column =
    array_join(transform(msgs, m => concat(
      lit(Begin), m.getField("role"), lit("\n"),
      m.getField("content"), lit(End))), "")

  /** DPO / preference-pair preparation: a prompt conversation (canonical
    * messages array, see [[parseConversationJson]]) plus `chosen` and
    * `rejected` response strings become the two fully-rendered
    * conversations a preference trainer scores, with the structural
    * gates: the prompt must alternate correctly and END ON USER
    * (awaiting the response), both responses non-blank, and chosen ≠
    * rejected (identical pairs carry zero preference signal). Adds
    * `dpo_valid`, `chosen_text`, `rejected_text`. Pure Column algebra —
    * same scan-side shape as the rest of the family.
    */
  def prepareDpoPairs(df: DataFrame, promptCol: String = "prompt_messages",
      chosenCol: String = "chosen",
      rejectedCol: String = "rejected"): DataFrame = {
    val msgs = col(promptCol)
    val hasSystem = element_at(msgs, 1).getField("role") === "system"
    val offset = when(hasSystem, 1).otherwise(0)
    val alternation = forall(
      transform(msgs, (m, i) => {
        val rel = i - offset
        m.getField("role") === when(rel < 0, "system")
          .when(rel % 2 === 0, "user").otherwise("assistant")
      }), b => b)
    val endsUser = element_at(msgs, -1).getField("role") === "user"
    def withResponse(r: Column): Column = concat(msgs,
      array(struct(lit("assistant").as("role"), r.as("content"))))
    val valid = coalesce(alternation, lit(false)) &&
      coalesce(endsUser, lit(false)) &&
      length(trim(col(chosenCol))) > 0 &&
      length(trim(col(rejectedCol))) > 0 &&
      col(chosenCol) =!= col(rejectedCol)
    df.withColumn("dpo_valid", coalesce(valid, lit(false)))
      .withColumn("chosen_text",
        when(col("dpo_valid"), renderedExpr(withResponse(col(chosenCol)))))
      .withColumn("rejected_text",
        when(col("dpo_valid"), renderedExpr(withResponse(col(rejectedCol)))))
  }

  /** ChatML-style rendering plus the loss-mask geometry:
    *  - `rendered_text`: `<|im_start|>role\ncontent<|im_end|>\n` per turn
    *  - `assistant_spans`: "start:len" per assistant turn (comma-joined,
    *    offsets into `rendered_text`) — what a loss-masked packer feeds
    *    alongside the tokens
    *  - `assistant_chars`: total assistant characters (a cheap target-
    *    density gate: conversations that are all prompt train nothing)
    */
  def renderChatML(df: DataFrame, msgsCol: String = "messages"): DataFrame = {
    val msgs = col(msgsCol)
    val rendered = renderedExpr(msgs)
    val spans = aggregate(msgs,
      struct(lit(0).as("pos"),
        array().cast(ArrayType(StringType)).as("spans")),
      (acc, m) => {
        val start = acc.getField("pos") + lit(Begin.length) +
          length(m.getField("role")) + lit(1)
        val clen = length(m.getField("content"))
        struct((start + clen + lit(End.length)).as("pos"),
          when(m.getField("role") === "assistant",
            concat(acc.getField("spans"), array(concat_ws(":",
              start.cast("string"), clen.cast("string")))))
            .otherwise(acc.getField("spans")).as("spans"))
      },
      acc => acc.getField("spans"))
    df.withColumn("rendered_text", rendered)
      .withColumn("assistant_spans", array_join(spans, ","))
      .withColumn("assistant_chars", aggregate(msgs, lit(0L),
        (acc, m) => acc + when(m.getField("role") === "assistant",
          length(m.getField("content")).cast("long")).otherwise(0L)))
  }

  /** LOSS-MASKED packing: lay rendered conversations into fixed-budget
    * context windows ([[Packing.packSequences]] decides the layout) and
    * emit, per pack, the concatenated text AND the assistant spans
    * SHIFTED to pack-relative offsets — exactly the (input, mask) pair
    * an SFT trainer consumes. `nTokens` is the budget unit (pass a BPE
    * count column for token budgets, or `length(rendered_text)` for
    * char budgets); texts are joined WITHOUT a separator so offsets stay
    * pure prefix sums. Shape at 100 TB: one shuffle on `groupCol` (the
    * packer's), one window per (group, pack) for the offsets, per-pack
    * state bounded by budget + one straddling document — identical to
    * [[Packing.concatPacked]].
    *
    * Returns (groupCol, pack_id, n_docs, packed_text, mask_spans).
    */
  /** TOKEN-SPACE loss masks — the fusion of [[renderChatML]]'s span
    * geometry with [[Bpe]] tokenization: adds `token_ids` (array<int>),
    * `token_spans` ("start:len" in TOKEN indices, comma-joined, one per
    * assistant turn) and `n_tokens`. Char-space spans are the
    * intermediate; this is what a trainer actually consumes.
    *
    * The text is tokenized SEGMENT-WISE at span boundaries (prompt
    * segment | assistant segment | ...), so no merge ever straddles an
    * assistant-content boundary and the defining invariant holds
    * EXACTLY: `Bpe.decode(token_ids.slice(start, start+len)) ==` that
    * assistant turn's content, for every span (the property the spec
    * pins). Segment-wise ids can differ from whole-text ids only AT the
    * boundaries (a merge that would have crossed one) — the standard
    * per-message tokenization every SFT pipeline does, stated not
    * silent. One UDF per row (the merge loop is imperative by nature),
    * scan-side, no shuffle.
    */
  def tokenizeWithMasks(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "rendered_text",
      spansCol: String = "assistant_spans"): DataFrame = {
    val kernel = Bpe.encoderKernel(merges)
    val tok = udf { (text: String, spans: String) =>
      if (text == null) (Array.emptyIntArray, "", 0L)
      else {
        val bounds = if (spans == null || spans.isEmpty) Array.empty[(Int, Int)]
          else spans.split(",").map { s =>
            val p = s.split(":")
            (p(0).toInt, p(1).toInt)
          }
        val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
        val tokSpans = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        bounds.foreach { case (start, len) =>
          if (start > pos) ids ++= kernel(text.substring(pos, start))
          val seg = kernel(text.substring(start, start + len))
          tokSpans += s"${ids.length}:${seg.length}"
          ids ++= seg
          pos = start + len
        }
        if (pos < text.length) ids ++= kernel(text.substring(pos))
        (ids.toArray, tokSpans.mkString(","), ids.length.toLong)
      }
    }
    val t = tok(col(textCol), col(spansCol))
    df.withColumn("token_ids", t.getField("_1"))
      .withColumn("token_spans", t.getField("_2"))
      .withColumn("n_tokens", t.getField("_3"))
  }

  /** Loss-masked packing in TOKEN space: [[tokenizeWithMasks]] output
    * packed into fixed `budget`-token windows — per pack the
    * concatenated `token_ids` and the assistant `mask_spans` shifted to
    * pack-relative TOKEN offsets, i.e. the literal (input_ids,
    * loss_mask) pair an SFT trainer consumes. Same machinery as
    * [[packRenderedWithMasks]] with tokens as the budget unit and array
    * concat instead of string concat: one group shuffle (the packer's),
    * one window for the offsets, per-pack state bounded by budget + one
    * straddling document.
    *
    * Returns (groupCol, pack_id, n_docs, n_tokens, token_ids,
    * mask_spans).
    */
  def packTokenizedWithMasks(df: DataFrame, idCol: String,
      groupCol: String, budget: Long,
      idsCol: String = "token_ids", spansCol: String = "token_spans",
      nCol: String = "n_tokens"): DataFrame = {
    // packSequences already emits the budget column as `n_tokens`, so
    // the join side must not bring a second copy
    val packed = Packing.packSequences(df, idCol, groupCol,
        col(nCol), budget)
      .withColumnRenamed("n_tokens", nCol)
      .join(df.select(col(idCol), col(idsCol), col(spansCol)), idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("pack_id")).orderBy(col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offset = coalesce(sum(col(nCol)).over(w), lit(0L))
    val shifted = when(col(spansCol) === "" || col(spansCol).isNull,
      array().cast(ArrayType(StringType)))
      .otherwise(transform(split(col(spansCol), ","), s => concat_ws(":",
        (element_at(split(s, ":"), 1).cast("long") + col("tok_off"))
          .cast("string"),
        element_at(split(s, ":"), 2))))
    packed.withColumn("tok_off", offset)
      .withColumn("shifted_spans", shifted)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nCol)).as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col(idCol),
            col(idsCol).as("ids")))),
          s => s.getField("ids"))).as("token_ids"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col(idCol),
            col("shifted_spans").as("sp")))),
          s => s.getField("sp"))), ",").as("mask_spans"))
  }

  def packRenderedWithMasks(df: DataFrame, idCol: String, groupCol: String,
      nTokens: Column, budget: Long,
      textCol: String = "rendered_text",
      spansCol: String = "assistant_spans"): DataFrame = {
    val packed = Packing.packSequences(df, idCol, groupCol, nTokens, budget)
      .join(df.select(col(idCol), col(textCol), col(spansCol)), idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("pack_id")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offset = coalesce(sum(length(col(textCol)).cast("long")).over(w), lit(0L))
    val shifted = when(col(spansCol) === "" || col(spansCol).isNull,
      array().cast(ArrayType(StringType)))
      .otherwise(transform(split(col(spansCol), ","), s => concat_ws(":",
        (element_at(split(s, ":"), 1).cast("long") + col("mask_off"))
          .cast("string"),
        element_at(split(s, ":"), 2))))
    packed.withColumn("mask_off", offset)
      .withColumn("shifted_spans", shifted)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol))).as("packed_text"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col(idCol),
            col("shifted_spans").as("sp")))),
          s => s.getField("sp"))), ",").as("mask_spans"))
  }
}
