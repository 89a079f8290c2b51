package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard pretraining curation chain composed end-to-end: C4
  * document gates + repetition gate + exact dedup (canonical = min id per
  * content hash) + PII redaction, in ONE call producing per-document
  * signals, the final keep decision, and the redacted text.
  *
  * Plan shape: the quality/repetition/PII columns are scan-side codegen
  * projections (zero shuffle); exact dedup adds one groupBy on the
  * content hash (partial-agg, hash-uniform) and a join back on the hash.
  * Total cost at 100 TB: one scan + one dedup-shaped shuffle — the same
  * envelope as `Dedup.exact` alone; every additional gate rides the scan.
  */
object Curation {

  def curate(df: DataFrame, textCol: String, idCol: String,
      maxDupLineFrac: Double = 0.3): DataFrame = {
    // NULL text must not make rows vanish (md5(NULL) is NULL and an
    // equi-join drops it): hash a coalesced copy, and force the final
    // decision to a real boolean so null-text docs surface as rejected
    val safeText = coalesce(col(textCol), lit(""))
    val safe = df.withColumn(textCol, safeText)
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.c4Signals(safe, textCol), textCol)
    // canonical selection IS exact dedup — share its plan
    val keeper = Dedup.exact(safe, textCol, idCol)
      .select(col("content_hash").as("__h"), col("keep_id").as("__keep_id"))
    sig.withColumn("__h", md5(col(textCol)))
      .join(keeper, "__h")
      .withColumn("is_canonical", col(idCol) === col("__keep_id"))
      .withColumn("redacted_text", TextAnalysis.redactPii(col(textCol)))
      .withColumn("curate_keep", coalesce(
        col("c4_keep") && col("dup_line_frac") <= maxDupLineFrac && col("is_canonical"),
        lit(false)))
      .drop("__h", "__keep_id")
  }
}
