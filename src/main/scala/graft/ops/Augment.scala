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
