package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities: L2 normalization and symmetric int8
  * quantization (the standard storage/transfer compression before ANN
  * indexing — 4× smaller than float32 at negligible recall cost). Pure
  * array expressions over the row's own vector: zero shuffle, runs at
  * scan speed, so quantizing a 100 TB embedding table is a single narrow
  * pass.
  */
object Embeddings {

  /** L2 norm of a numeric array column (left-to-right fold, matching the
    * sequential accumulation external engines use, so cross-engine
    * comparisons agree to the last ulp).
    */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0), (a, x) => a + x * x))

  /** Unit-normalize then quantize each component to int8 range:
    * `round(x / ||v|| * 127)`. Emitted as a comma-joined string so the
    * quantized vector survives any engine's type system unchanged.
    * Returns (idCol, l2_norm rounded to 6, q_csv).
    *
    * One imperative pass per row: the declarative
    * `transform(v, x -> round(x / l2Norm(v) * 127))` inlines the whole
    * norm AGGREGATE into the lambda, re-summing the vector once per
    * component (no CSE in interpreted HOFs) — O(d²) per row, ruinous at
    * real embedding widths (SCALE.md §14.8). Left-to-right double
    * accumulation and HALF_UP rounding mirror the Column-expression
    * semantics exactly (callers pass double arrays — float inputs widen
    * losslessly), so oracle rows stay hash-identical.
    */
  /** Mean-pool many vectors into one per `keyCol` — the chunk→document
    * aggregation step after a long doc was split ([[graft.ops.TextAnalysis.chunkDocuments]])
    * and each chunk embedded: doc embedding = element-wise mean of its
    * chunk embeddings. Returns (keyCol, n_vecs, mean_vec).
    *
    * Determinism at scale (the §22.21 discipline): a plain per-component
    * `avg` over doubles is partial-aggregation-order dependent, so a
    * re-run (or an oracle in another engine) can differ in the last ulp.
    * Each component is instead quantized to integer `units` at the scan
    * (`round(x·units)` — half away from zero in both engines), summed
    * EXACTLY as longs, and the mean derived by two IEEE divisions
    * (`sum/n/units`) whose operands are identical everywhere — bitwise
    * stable on any cluster size.
    *
    * Plan shape: posexplode to the tall (key, pos) layout, one hash
    * aggregate with map-side partial combine (state = one long per
    * (key, pos) — never a per-group vector buffer), then the per-key
    * reassembly groupBy. Two shuffles, both on keys with bounded state;
    * a doc with millions of chunks is a big GROUP, not a big TASK.
    * Null vectors and null components drop out (per-component `n`
    * counts only vectors that carry that component, so ragged inputs
    * average over what exists); a key whose every vector is null/empty
    * vanishes rather than emitting a fabricated zero vector.
    */
  def meanPool(df: DataFrame, vecCol: String, keyCol: String,
      units: Double = 1e6): DataFrame = {
    val q = transform(col(vecCol), x => round(x * units).cast("long"))
    df.select(col(keyCol), q.as("__q"))
      .select(col(keyCol), posexplode(col("__q")).as(Seq("__pos", "__qv")))
      .groupBy(col(keyCol), col("__pos"))
      .agg(sum(col("__qv")).as("__s"), count(col("__qv")).as("__n"))
      .where(col("__n") > 0)
      .withColumn("__v", col("__s").cast("double") / col("__n") / units)
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_vecs"),
        transform(array_sort(collect_list(struct(col("__pos"), col("__v")))),
          s => s.getField("__v")).as("mean_vec"))
  }

  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val q = udf((v: Seq[Double]) =>
      if (v == null) null
      else {
        var acc = 0.0
        v.foreach(x => acc += x * x)
        val norm = math.sqrt(acc)
        def halfUp(d: Double, scale: Int): Double =
          if (d.isNaN || d.isInfinite) d
          else java.math.BigDecimal.valueOf(d)
            .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
        val csv = v.iterator
          .map(x => halfUp(x / norm * 127.0, 0).toInt.toString)
          .mkString(",")
        (halfUp(norm, 6), csv)
      })
    df.withColumn("__q", q(col(vecCol)))
      .select(col(idCol), col("__q._1").as("l2_norm"), col("__q._2").as("q_csv"))
  }
}
