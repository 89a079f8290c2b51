package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline health checks (the Deequ-style staple):
  * per-column null count, exact distinct count, and min/max — the
  * before/after sanity gate a 100 TB ingest runs around every transform
  * (did the join drop rows? did a column go all-null? did the key space
  * shrink?).
  *
  * One aggregation over one scan computes every column's stats; the exact
  * `count(distinct)` per column makes Catalyst plan an Expand (input rows
  * × profiled columns through the first partial aggregate) — the
  * documented price of exactness, linear in columns (measured 10× decade
  * factor at 100× rows, SCALE.md §15.2). Profile a column SUBSET at
  * scale, run per-column passes at very wide schemas — or pass
  * `approxDistinct = Some(rsd)`: `approx_count_distinct` (HyperLogLog++,
  * the Spark built-in) replaces the exact count, the Expand disappears
  * (one ordinary partial-agg pass, constant sketch memory per column),
  * and `n_distinct` becomes an estimate within ~rsd relative error.
  * Every other stat (n_rows/nulls/min/max) stays exact in both modes.
  * min/max are rendered as strings so the long-format output is
  * type-uniform across heterogeneous columns.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Option[Double] = None): DataFrame = {
    approxDistinct.foreach(rsd => require(rsd > 0 && rsd < 1,
      s"approxDistinct rsd must be in (0, 1), got $rsd"))
    require(cols.nonEmpty, "need at least one column to profile")
    // names are spliced into a stack() SQL expression below — a backtick
    // or quote would escape the literal and mis-parse (fail loudly here
    // rather than profile the wrong thing)
    require(cols.forall(c => !c.exists("`'\"\\".contains(_))),
      s"column names must not contain quotes/backticks/backslashes: ${cols.mkString(", ")}")
    val aggExprs = cols.flatMap { c =>
      Seq(
        F.sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        approxDistinct.fold(countDistinct(col(c)))(rsd =>
          approx_count_distinct(col(c), rsd)).as(s"dist__$c"),
        F.min(col(c)).cast("string").as(s"min__$c"),
        F.max(col(c)).cast("string").as(s"max__$c"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggExprs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    // unpivot the single wide row to one output row per column
    val stackArgs = cols.map(c =>
      s"'$c', `nulls__$c`, `dist__$c`, `min__$c`, `max__$c`").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
