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

  /** Keep each row with its OWN probability — a per-row Column in [0,1]
    * (clamped), e.g. a quality score: the quality-weighted keep step of a
    * curation pipeline ("sample documents proportionally to how good they
    * are"). Same portable md5 bucket as [[deterministicSample]], so the
    * row set is reproducible across engines and partitionings; still one
    * narrow filter riding the scan, no shuffle.
    */
  def weightedSample(df: DataFrame, idCol: String, prob: Column,
      seed: Int = 1): DataFrame =
    // explicit floor: Spark's double→long cast truncates while SQL engines'
    // ::BIGINT rounds — floor on both sides keeps the row set portable.
    // NULL prob → 0 (dropped): least/greatest SKIP nulls, so an unguarded
    // null (a left-join miss, an un-scored doc) would clamp to 1.0 and
    // keep exactly the rows that have no score, silently
    df.where(bucket(col(idCol), seed) <
      floor(greatest(lit(0.0), least(lit(1.0), coalesce(prob, lit(0.0))))
        * M).cast("long"))

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
    // null ids hash DETERMINISTICALLY (empty-string preimage) instead of
    // propagating null through the `<` filter — a null comparison is
    // never true, so null-id rows would silently vanish from EVERY
    // sampler, even at fraction 1.0
    pmod(Dedup.h60(coalesce(id.cast("string"), lit("")), seed), lit(M))

  /** Target-ratio corpus mixing: build the LARGEST corpus whose per-group
    * composition matches `shares` exactly (floored). The binding group
    * determines the mix size `N = min_g(count_g / share_g)`; each group
    * contributes `floor(share_g * N)` rows, chosen in hash order (an
    * unbiased, reproducible sample — the standard "data mix" step that
    * turns raw source counts into a declared training composition). Groups
    * absent from `shares` are dropped.
    *
    * Plan shape: per-group counts are a tiny aggregate joined back
    * (broadcast); selection is one window pass partitioned by group. No
    * driver-side state — the mix size is computed as a one-row frame.
    * Returns the kept rows plus `mix_rank` (1-based position within the
    * group's hash order).
    */
  def targetMix(df: DataFrame, idCol: String, groupCol: String,
      shares: Map[String, Double], seed: Int = 1): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0), "shares must be positive")
    val shareCol = shares.foldLeft(lit(null).cast("double")) {
      case (els, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(els)
    }
    val inMix = df.where(shareCol.isNotNull)
    val counts = inMix.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
      .select(col(groupCol), col("__cnt"), (col("__cnt") / shareCol).as("__cap"))
    val mixSize = counts.agg(floor(min(col("__cap"))).cast("long").as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), seed), col(idCol))
    inMix
      .withColumn("mix_rank", row_number().over(w))
      .join(broadcast(mixSize))
      .where(col("mix_rank") <= floor(shareCol * col("__n")).cast("long"))
      .drop("__n")
  }

  /** Temperature-based mixing weights (the multilingual/multi-source
    * sampling rule popularized by multilingual LM training: p_i ∝ n_i^α,
    * α < 1 upsamples low-resource groups): per-group document counts →
    * normalized sampling weight and the floored per-group target count for
    * a `budget`-document mix. One tiny aggregate plus a one-row broadcast
    * normalizer — no per-row work at all, so the cost is the count
    * aggregation's partial-agg scan regardless of corpus size. Weights and
    * targets are rounded before flooring so external engines reproduce the
    * exact mix. Returns (groupCol, n_docs, weight, target_docs).
    */
  def temperatureWeights(df: DataFrame, groupCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val z = counts.agg(sum(pow(col("n_docs"), lit(alpha))).as("__z"))
    counts.crossJoin(broadcast(z))
      .select(col(groupCol), col("n_docs"),
        round(pow(col("n_docs"), lit(alpha)) / col("__z"), 6).as("weight"),
        floor(round(pow(col("n_docs"), lit(alpha)) / col("__z") * budget, 6))
          .cast("long").as("target_docs"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document of
    * `df` by how much more likely its hashed n-gram features are under a
    * small `target` corpus (the distribution you WANT — e.g. a trusted
    * reference set) than under the raw corpus itself. Resampling `df` with
    * these log-weights (e.g. [[weightedSample]] on the softmaxed weight, or
    * top-k by weight) tilts a 100 TB crawl toward the target domain without
    * training a classifier.
    *
    * Features are the paper's: unigrams plus space-joined bigrams, hashed
    * into `numBuckets` buckets via the engine's md5-derived portable hash
    * (so any engine — the DuckDB oracle included — reproduces the exact
    * weights). Both bucket distributions are add-one smoothed over the
    * bucket space; the per-feature weight is
    * `ln p_target(bucket) − ln p_raw(bucket)`.
    *
    * Plan shape at 100 TB: features are built IN-ROW (token array zipped
    * with its own tail — no position join); the two distribution estimates
    * are partial-agg count shuffles whose OUTPUT is bounded by
    * `numBuckets` rows regardless of corpus size, and join back to the
    * per-document feature stream as broadcasts. The per-doc rollup is the
    * single corpus-wide shuffle. Documents with zero tokens have no
    * features and are absent from the output. Returns
    * (idCol, n_feats, log_weight).
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
      target: DataFrame, targetTextCol: String,
      numBuckets: Int = 1024, seed: Int = 31): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    def buckets(in: DataFrame, textC: String, keep: Seq[String]): DataFrame =
      in.select(keep.map(col) :+ Dedup.tokenize(col(textC)).as("l"): _*)
        .where(size(col("l")) >= 1)
        .select(keep.map(col) :+ explode(concat(
          col("l"),
          zip_with(slice(col("l"), lit(1), size(col("l")) - 1),
            slice(col("l"), lit(2), size(col("l")) - 1),
            (a, b) => concat_ws(" ", a, b)))).as("f"): _*)
        .select(keep.map(col) :+
          pmod(Dedup.h60(col("f"), seed), lit(numBuckets.toLong)).as("b"): _*)
    // persisted: docB feeds BOTH the bucket histogram and the per-doc
    // rollup — unpersisted, the tokenize+bigram+hash featurization of
    // the FULL raw corpus replays once per consumer (the multi-consumer
    // re-scan class Dedup.dedupCorpus persists its bands against).
    // LRU-owned (single-shot op); spills, batch-proportional.
    val docB = buckets(df, textCol, Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCounts = docB.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgtCounts = buckets(target, targetTextCol, Seq.empty)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val stats = rawCounts.agg(sum(col("cr")).as("nr"))
      .crossJoin(tgtCounts.agg(sum(col("ct")).as("nt")))
    val w = log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
        (col("nt") + numBuckets)) -
      log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
        (col("nr") + numBuckets))
    // quantize-then-aggregate (SCALE §22.18): per-feature weights become
    // integer micro-units so the per-doc sum is exact integer arithmetic
    // (order-independent) — a rounded sum() of doubles flips last decimals
    // between engines when the shuffled accumulation order differs
    val w6 = round(w * 1000000.0).cast("long")
    docB
      .join(broadcast(tgtCounts), Seq("b"), "left")
      .join(broadcast(rawCounts), Seq("b"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        (sum(w6).cast("double") / 1000000.0).as("log_weight"))
  }
}
