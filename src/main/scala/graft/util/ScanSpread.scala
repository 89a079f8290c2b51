package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan widening for heavy per-row operators.
  *
  * The small-SF parquet fixtures are written as ONE row group per file, so
  * a scan yields one task no matter how small
  * `spark.sql.files.maxPartitionBytes` is set — Spark assigns a row group
  * to the split holding its midpoint, and extra splits come up empty. Any
  * operator that does expensive per-row work straight off such a scan
  * (payload synthesis, media decode, hashing) runs serial while the other
  * 31 cores idle.
  *
  * [[widen]] fixes the starved case only: when the planned scan carries
  * fewer partitions than the session's `defaultParallelism`, insert one
  * round-robin exchange of the (narrow, pre-payload) rows; a scan that is
  * already at least core-count wide — every real-scale input, where files
  * span many row groups — is returned untouched, so no exchange is added
  * at 100 TB. Callers should widen the *narrow* frame (keys only) and
  * attach heavy columns after, so the exchange moves bytes proportional to
  * the key width, never the payload (optimization guide §8).
  */
object ScanSpread {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
