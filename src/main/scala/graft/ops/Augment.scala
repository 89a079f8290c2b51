package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data TRANSFORMATIONS applied at scan time — operators that
  * rewrite documents into the shapes modern pretraining recipes feed
  * the model, deterministic and engine-portable (every random choice is
  * an md5-derived hash of the document id, so a SQL oracle reproduces
  * the exact output and a re-run of a 100 TB job is bitwise stable).
  *
  * First resident: FIM — fill-in-the-middle (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle"; the
  * StarCoder/DeepSeek-Coder code-pretraining transform). A hash-chosen
  * fraction of documents is split at two hash-chosen character points
  * and re-laid-out with sentinel tokens in PSM
  * (`⟨pre⟩P⟨suf⟩S⟨mid⟩M`) or SPM (`⟨pre⟩⟨suf⟩S⟨mid⟩PM` reordering —
  * here the common `⟨suf⟩S⟨pre⟩P⟨mid⟩M` joint form) order; the rest
  * pass through untouched. Pure Column algebra — substrings + portable
  * hashes, codegen'd, zero shuffle.
  *
  * Reference scope note: SDM-RDFizer has no LLM-data surface;
  * beyond-parity training-data family (COVERAGE.md).
  */
object Augment {

  private val M = 1000000L

  /** FIM over `textCol`: adds `fim_applied` and `fim_text`.
    *  - selection: h(id, seed) mod 1e6 < rate·1e6
    *  - split points: u = h(id,"u") mod (len+1), v = u + h(id,"v") mod
    *    (len−u+1) — uniform 0 ≤ u ≤ v ≤ len, character-based
    *  - psm = true → prefix sentinel + P + suffix sentinel + S + middle
    *    sentinel + M; psm = false → the SPM layout (suffix block first)
    * Unselected documents keep `fim_text` = the original text, so the
    * output column is directly trainable either way.
    */
  /** T5-style SPAN CORRUPTION (Raffel et al. 2020: mask contiguous spans
    * with sentinel tokens; the model reconstructs them) — FIM's sibling,
    * the other canonical pretraining transform. A hash-chosen fraction of
    * documents gets `nSpans` non-overlapping character spans replaced by
    * `<|extra_k|>` sentinels; `sc_target` is the concatenation of each
    * sentinel + its masked span, closed by the final sentinel
    * `<|extra_nSpans|>` (the T5 target layout).
    *
    * Deterministic like [[fimTransform]]: the text splits into `nSpans`
    * equal segments (b_k = floor(len·k/nSpans)); within segment k the
    * span length is 1 + h(id,"l",k) mod maxSpanLen (clamped to the
    * segment) and its offset h(id,"s",k) mod (slack+1) — every choice a
    * portable md5 hash, so the oracle reproduces exact strings and spans
    * can never overlap (one per segment by construction). Documents
    * shorter than `nSpans` characters (or unselected) pass through:
    * `sc_input` = the original text, `sc_target` = "". Pure Column
    * algebra — substrings + hashes, codegen'd, zero shuffle.
    *
    * Reassembly invariant (spec-pinned like FIM's): splicing each
    * target span back over its sentinel in `sc_input` reproduces the
    * original text byte-for-byte.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      rate: Double, nSpans: Int = 3, maxSpanLen: Int = 8,
      seed: Int = 1): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    require(nSpans >= 1, "nSpans must be >= 1")
    require(maxSpanLen >= 1, "maxSpanLen must be >= 1")
    val id = col(idCol).cast("string")
    val text = col(textCol)
    val len = length(text).cast("long")
    val selected = Sampling.bucket(col(idCol), seed) < (rate * M).toLong &&
      len >= nSpans
    // segment bounds: exact for len·k < 2^53 (double division by a small
    // constant cannot cross an integer boundary at that magnitude — the
    // oracle floors the same IEEE quotient)
    def b(k: Int): Column = floor(len * k / lit(nSpans.toDouble)).cast("int")
    val pieces = (1 to nSpans).map { k =>
      val b0 = b(k - 1)
      val b1 = b(k)
      val segLen = b1 - b0
      val spanLen = least(
        lit(1) + pmod(Dedup.h60(concat(id, lit(s":l:$k")), seed),
          lit(maxSpanLen.toLong)).cast("int"),
        segLen)
      val off = pmod(Dedup.h60(concat(id, lit(s":s:$k")), seed),
        (segLen - spanLen + 1).cast("long")).cast("int")
      val sStart = b0 + 1 + off // 1-based
      val sent = lit(s"<|extra_${k - 1}|>")
      (concat(text.substr(b0 + 1, off), sent,
        text.substr(sStart + spanLen, b1 - (sStart + spanLen) + 1)),
        concat(sent, text.substr(sStart, spanLen)))
    }
    df.withColumn("span_corrupted", coalesce(selected, lit(false)))
      .withColumn("sc_input",
        when(col("span_corrupted"), concat(pieces.map(_._1): _*)).otherwise(text))
      .withColumn("sc_target",
        when(col("span_corrupted"),
          concat(pieces.map(_._2) :+ lit(s"<|extra_$nSpans|>"): _*))
          .otherwise(lit("")))
  }

  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rate: Double, seed: Int = 1, psm: Boolean = true,
      preTok: String = "<|fim_prefix|>", sufTok: String = "<|fim_suffix|>",
      midTok: String = "<|fim_middle|>"): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    val id = col(idCol).cast("string")
    val text = col(textCol)
    val len = length(text)
    val selected = Sampling.bucket(col(idCol), seed) < (rate * M).toLong
    val u = pmod(Dedup.h60(concat(id, lit(":u")), seed), (len + 1).cast("long"))
      .cast("int")
    val v = (u + pmod(Dedup.h60(concat(id, lit(":v")), seed),
      (len - u + 1).cast("long")).cast("int"))
    // 1-based substring arithmetic: prefix [1, u], middle (u, v], suffix (v, len]
    val p = text.substr(lit(1), u)
    val m = text.substr(u + 1, v - u)
    val s = text.substr(v + 1, len - v)
    val fim =
      if (psm) concat(lit(preTok), p, lit(sufTok), s, lit(midTok), m)
      else concat(lit(sufTok), s, lit(preTok), p, lit(midTok), m)
    df.withColumn("fim_applied", coalesce(selected && len > 0, lit(false)))
      .withColumn("fim_text",
        when(col("fim_applied"), fim).otherwise(text))
  }
}
