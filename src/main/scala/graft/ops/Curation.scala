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
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.c4Signals(df, textCol), textCol)
    val keeper = df.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as("__keep_id"))
    sig.withColumn("__h", md5(col(textCol)))
      .join(keeper, "__h")
      .withColumn("is_canonical", col(idCol) === col("__keep_id"))
      .withColumn("redacted_text", TextAnalysis.redactPii(col(textCol)))
      .withColumn("curate_keep",
        col("c4_keep") && col("dup_line_frac") <= maxDupLineFrac && col("is_canonical"))
      .drop("__h", "__keep_id")
  }
}
