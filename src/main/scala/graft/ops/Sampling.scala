package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Unlike
  * `df.sample()` (seeded per-partition RNG — resample on repartition,
  * not reproducible across engines), these keep a row iff a portable
  * md5-derived hash of its id falls under the rate: the same row set on
  * every run, every engine, every partitioning — which is what makes a
  * data mix auditable.
  */
object Sampling {

  private val M = 1000000L

  /** Keep `fraction` of rows, decided by hash(id) — stable and portable. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Int = 1): DataFrame =
    df.where(bucket(col(idCol), seed) < (fraction * M).toLong)

  /** Per-stratum rates (e.g. upsample low-resource languages, downsample
    * boilerplate-heavy sources): `fractions` maps stratum value → keep
    * rate; absent strata keep `defaultFraction`. One narrow filter, no
    * shuffle — the mix is re-weighted inside the scan.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Int = 1): DataFrame = {
    val rate = fractions.foldLeft(lit((defaultFraction * M).toLong)) {
      case (els, (k, f)) => when(col(strataCol) === k, lit((f * M).toLong)).otherwise(els)
    }
    df.where(bucket(col(idCol), seed) < rate)
  }

  /** hash(id) uniformly into [0, 1e6) — md5-based like [[Dedup.h60]] so an
    * external SQL engine reproduces the exact row set.
    */
  def bucket(id: Column, seed: Int): Column =
    pmod(Dedup.h60(id.cast("string"), seed), lit(M))
}
