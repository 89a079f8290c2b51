package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, expressed as
  * shuffle-friendly compositions of existing operators (preference (a) of
  * the custom-operator ladder): an as-of join and a point-in-interval
  * range join. Neither iterates per key and neither builds per-key state
  * on the driver — both are one shuffle + narrow work, so they hold at
  * 100 TB where a naive inequality join degenerates to a per-key cartesian.
  */
object Joins {

  /** As-of join, "last prior match": for every left row, the id of the
    * right row with the greatest timestamp `<=` the left timestamp within
    * the same key (ties on timestamp break to the greatest right id).
    * Left rows with no prior right row get null.
    *
    * Plan shape: both sides are tagged and unioned, then a single window
    * pass per key carries the last non-null right id forward
    * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT).
    * Cost is one shuffle on the key + an in-partition sort — the same
    * exchange profile as a sort-merge join, independent of how many right
    * rows precede each left row. The naive formulation (inequality join +
    * per-left-row argmax) shuffles |L|×|matches| rows; this shuffles
    * |L|+|R| and never materializes the candidate set. Hot keys are a
    * sort skew, not a join blowup: salt the key and merge if one key
    * dominates a partition.
    *
    * `leftIdCol` must uniquely identify left rows; right ids are carried
    * as longs.
    */
  def asofLastPrior(left: DataFrame, leftIdCol: String, leftTsCol: String,
      right: DataFrame, rightIdCol: String, rightTsCol: String,
      keyCols: Seq[String], matchCol: String = "asof_id"): DataFrame = {
    val keyC = keyCols.map(col)
    // schema-adaptive ts image: timestamp columns (LTZ or NTZ) become epoch
    // µs, numeric columns pass through — order and ties preserved either way
    val r = right.select(keyC ++ Seq(
      graft.util.Timestamps.asLong(right, rightTsCol).as("__ts"), lit(0).as("__side"),
      col(rightIdCol).cast("long").as("__pay"), lit(null).cast("long").as("__lid")): _*)
    val l = left.select(keyC ++ Seq(
      graft.util.Timestamps.asLong(left, leftTsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__pay"), col(leftIdCol).cast("long").as("__lid")): _*)
    // right rows sort before left rows at equal ts (side 0 < 1), so the
    // `<=` inclusive semantics falls out of the frame bound; among equal-ts
    // right rows ascending __pay makes "last seen" the greatest id
    val w = Window.partitionBy(keyC: _*)
      .orderBy(col("__ts"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lid").as(leftIdCol), col("__m").as(matchCol))
    left.join(matched, leftIdCol)
  }

  /** Point-in-interval range join: rows of `points` paired with rows of
    * `intervals` where `lo <= p < hi` (long-valued columns, e.g. epoch
    * nanos — long arithmetic throughout, since epoch-nano values exceed
    * the 2^53 exact-double range).
    *
    * Plan shape: intervals explode to the `bucketWidth`-sized buckets they
    * cover, points map to their single bucket, and the inequality becomes
    * an equi-join on the bucket plus a residual filter — the standard
    * bucketed range-join strategy. A point matches an interval in exactly
    * one bucket (its own), so no post-join dedup is needed. Work scales
    * with Σ interval_span/bucketWidth + |points|, not |points|×|intervals|;
    * pick `bucketWidth` near the typical interval span so most intervals
    * explode to ≤2 buckets. Values must be non-negative (DIV truncates
    * toward zero).
    */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals
      .where(col(hiCol) > col(loCol)) // empty intervals match nothing
      .withColumn("__b", explode(sequence(
        expr(s"$loCol DIV ${bucketWidth}L"),
        expr(s"($hiCol - 1) DIV ${bucketWidth}L"))))
    val pt = points.withColumn("__b", expr(s"$pCol DIV ${bucketWidth}L"))
    iv.join(pt, "__b")
      .where(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__b")
  }

  /** KEYED point-in-interval range join — same `lo <= p < hi` semantics
    * as [[pointInInterval]], for the case where both sides share a
    * high-cardinality equi-key (a doc/clip id: subtitle cues × the same
    * clip's keyframe timeline, ASR spans × its sample table). The key IS
    * the distribution: a plain equi-join on it shuffles both sides once
    * and the range becomes a residual predicate evaluated per matched
    * pair, so no bucket explosion is needed — [[pointInInterval]]'s
    * bucket trick exists for the KEYLESS case where there is nothing to
    * hash-partition on. Per-key work is |points_k| × |intervals_k|,
    * bounded by per-clip fan-out (cues × keyframes of ONE clip), which is
    * exactly the degradation unit the structure parsers guarantee.
    */
  def pointInIntervalBy(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "pointInIntervalBy needs at least one key column")
    intervals.where(col(hiCol) > col(loCol))
      .join(points, keys)
      .where(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
  }

  /** Salted inner equi-join for skewed keys: the standard remedy when one
    * join key dominates (a hot user, a null-ish default, a viral
    * document) and a single reducer would receive that key's entire row
    * set. The big side scatters each row into one of `salts` sub-keys by a
    * deterministic hash of `bigIdCol`; the small side replicates `salts`×,
    * once per sub-key; the equi-join on (key, salt) then spreads the hot
    * key over `salts` reducers. Result set is EXACTLY `big ⋈ small` —
    * each big row meets the one replica carrying its salt.
    *
    * Spark's AQE skew-join handles this at runtime by splitting oversized
    * partitions, but only for sort-merge joins it can see; explicit
    * salting is the portable shape when the skew is known ahead of time
    * (and composes with any downstream per-key aggregation). Replication
    * cost is |small|×salts — keep `salts` near the ratio hot-key-rows /
    * average-key-rows.
    *
    * Measured verdict (SCALE.md §16.4, zipf campaign — hot key owning
    * 8.8% of the big side, three decades): with AQE on, the PLAIN
    * equi-join beat this salted form at every scale tested (up to 2.3×
    * at sf10) — the always-paid replication + wider exchange cost more
    * than the skew they insure against. Default to the plain join under
    * AQE; reach for salting in AQE-off environments, for skewed
    * AGGREGATIONS (where AQE's split does not apply), or when a single
    * key is too hot for even a split partition.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigIdCol: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt",
      pmod(Dedup.h60(col(bigIdCol).cast("string"), 5), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }
}
