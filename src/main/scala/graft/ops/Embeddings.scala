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
  /** Element-wise exact-sum pooling buffer: per position, the running
    * long sum of quantized components and the count of vectors that
    * carried a non-null value there. Ragged inputs grow the buffer;
    * the counts make ragged/null positions average over what exists.
    * Integer sums are order-free, so partial aggregation and merge
    * order can never change the result — the §22.21 discipline pushed
    * INTO the aggregation buffer.
    */
  final class QVecPoolAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[java.lang.Long], (Array[Long], Array[Long]), (Array[Long], Array[Long])] {
    private def grown(a: Array[Long], d: Int): Array[Long] =
      if (a.length >= d) a else java.util.Arrays.copyOf(a, d)
    def zero: (Array[Long], Array[Long]) =
      (Array.emptyLongArray, Array.emptyLongArray)
    def reduce(b: (Array[Long], Array[Long]),
        v: Seq[java.lang.Long]): (Array[Long], Array[Long]) =
      if (v == null) b
      else {
        val s = grown(b._1, v.length); val n = grown(b._2, v.length)
        var i = 0
        v.foreach { x =>
          // addExact: a saturated sum must surface as an error, not wrap
          // into a silently-wrong mean (same for the weighted twin)
          if (x != null) { s(i) = Math.addExact(s(i), x.longValue); n(i) += 1 }
          i += 1
        }
        (s, n)
      }
    def merge(a: (Array[Long], Array[Long]),
        c: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
      val s = grown(a._1, c._1.length); val n = grown(a._2, c._2.length)
      var i = 0
      while (i < c._1.length) {
        s(i) = Math.addExact(s(i), c._1(i)); n(i) += c._2(i); i += 1
      }
      (s, n)
    }
    def finish(b: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = b
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long])]()
    def outputEncoder: org.apache.spark.sql.Encoder[(Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long])]()
  }

  /** [[QVecPoolAgg]]'s weighted twin: input rows are (quantized vector,
    * weight); sums accumulate q·w per position and the per-position
    * denominator accumulates w instead of 1. Long sums stay exact, so
    * the same order-free determinism holds. The q·w product and every
    * accumulation run through Math.multiplyExact/addExact — a caller
    * passing weights or magnitudes beyond the documented bound
    * (|x|·units·w summed over a key's vectors must fit a long; at
    * unit-norm embeddings with units = 1e6 and token-count weights
    * ≤ 1e5 that is ≥ 9·10^7 vectors per key) gets an ArithmeticException
    * surfaced by the job instead of silently wrapped sums and corrupt
    * means.
    */
  final class WQVecPoolAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Seq[java.lang.Long], Long), (Array[Long], Array[Long]), (Array[Long], Array[Long])] {
    private def grown(a: Array[Long], d: Int): Array[Long] =
      if (a.length >= d) a else java.util.Arrays.copyOf(a, d)
    def zero: (Array[Long], Array[Long]) =
      (Array.emptyLongArray, Array.emptyLongArray)
    def reduce(b: (Array[Long], Array[Long]),
        v: (Seq[java.lang.Long], Long)): (Array[Long], Array[Long]) =
      if (v == null || v._1 == null) b
      else {
        val s = grown(b._1, v._1.length); val n = grown(b._2, v._1.length)
        var i = 0
        v._1.foreach { x =>
          if (x != null) {
            s(i) = Math.addExact(s(i), Math.multiplyExact(x.longValue, v._2))
            n(i) = Math.addExact(n(i), v._2)
          }
          i += 1
        }
        (s, n)
      }
    def merge(a: (Array[Long], Array[Long]),
        c: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
      val s = grown(a._1, c._1.length); val n = grown(a._2, c._2.length)
      var i = 0
      while (i < c._1.length) {
        s(i) = Math.addExact(s(i), c._1(i))
        n(i) = Math.addExact(n(i), c._2(i))
        i += 1
      }
      (s, n)
    }
    def finish(b: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = b
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long])]()
    def outputEncoder: org.apache.spark.sql.Encoder[(Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long])]()
  }

  /** Mean-pool many vectors into one per `keyCol` — the chunk→document
    * aggregation step after a long doc was split ([[graft.ops.TextAnalysis.chunkDocuments]])
    * and each chunk embedded: doc embedding = element-wise mean of its
    * chunk embeddings. Returns (keyCol, n_vecs, mean_vec).
    *
    * Determinism at scale (the §22.21 discipline): a plain per-component
    * `avg` over doubles is partial-aggregation-order dependent, so a
    * re-run (or an oracle in another engine) can differ in the last ulp.
    * Each component is instead quantized to integer `units` at the scan
    * as `floor(x·units + 0.5)` — pure IEEE double ops that every engine
    * computes bit-identically, so the oracle replays the EXPRESSION, not
    * a library's rounding flavor (Spark's `round()` would also cost a
    * BigDecimal allocation per component: measured 228 s of a 320M-
    * component leg before this op switched away from it, §22.26) —
    * summed EXACTLY as longs inside the aggregation buffer, and the mean
    * derived by two IEEE divisions (`sum/n/units`) whose operands are
    * identical everywhere — bitwise stable on any cluster size.
    *
    * Plan shape: ONE shuffle. [[QVecPoolAgg]] keeps a (sums, counts)
    * long-array buffer per key with true map-side combine, so the
    * exchange carries at most min(input rows, keys × partitions)
    * buffers of d longs — NOT the N×d rows a posexplode +
    * per-dimension groupBy would shuffle (that tall layout measured
    * SUPERLINEAR on this op's own scale leg, 13.9 s → 320 s for 10×:
    * with ~distinct (key, pos) keys per mapper the partial agg combines
    * nothing and the exchange eats 64× the rows; SCALE.md §22.26, same
    * lesson as [[Similarity.VecSumCountAgg]]). A doc with millions of
    * chunks collapses to one buffer per partition before the exchange.
    * Null vectors and null components drop out of the per-component
    * count, so ragged inputs average over what exists; a position that
    * NO vector carried emits null IN PLACE (dimension alignment is
    * preserved — compacting would shift later means to wrong indices);
    * a key whose every vector is null/empty vanishes rather than
    * emitting a fabricated zero vector.
    */
  def meanPool(df: DataFrame, vecCol: String, keyCol: String,
      units: Double = 1e6): DataFrame = {
    val q = transform(col(vecCol), x => floor(x * units + lit(0.5)))
    val pool = org.apache.spark.sql.functions.udaf(new QVecPoolAgg)
    df.select(col(keyCol), q.as("__q"))
      .groupBy(col(keyCol))
      .agg(pool(col("__q")).as("__p"))
      .select(col(keyCol), col("__p._1").as("__s"), col("__p._2").as("__n"))
      .where(size(col("__n")) > 0 && array_max(col("__n")) > 0)
      .select(col(keyCol),
        array_max(col("__n")).as("n_vecs"),
        // a position NO vector carried stays in place as null — filtering
        // it out would shift every later dimension's mean to the wrong
        // index and silently corrupt any downstream dot product
        zip_with(col("__s"), col("__n"),
          (s, n) => when(n > 0, s.cast("double") / n / units)).as("mean_vec"))
  }

  /** [[meanPool]] weighted by a per-row long column — the production
    * doc-embedding shape: chunks weighted by token count so a short tail
    * chunk doesn't dilute the document vector. Identical plan (one
    * shuffle, [[WQVecPoolAgg]] map-side combine) and identical
    * determinism (q·w products and w sums are exact longs; mean =
    * `Σ(q·w) / Σw / units`, two IEEE divisions). Rows with weight ≤ 0 or
    * a null weight are dropped (a zero weight contributes nothing but
    * would make an all-zero-weight position 0/0); returns
    * (keyCol, w_total, mean_vec) where `w_total` is the largest
    * per-position weight sum.
    */
  def weightedMeanPool(df: DataFrame, vecCol: String, weightCol: String,
      keyCol: String, units: Double = 1e6): DataFrame = {
    val w = col(weightCol).cast("long")
    // the q·w multiply happens INSIDE the aggregator (multiplyExact), so
    // an over-bound weight surfaces as an error instead of a Column-level
    // long wrap feeding the buffer a corrupted product
    val q = transform(col(vecCol), x => floor(x * units + lit(0.5)))
    val pool = org.apache.spark.sql.functions.udaf(new WQVecPoolAgg)
    df.where(w.isNotNull && w > 0)
      .select(col(keyCol), q.as("__qw"), w.as("__w"))
      .groupBy(col(keyCol))
      .agg(pool(col("__qw"), col("__w")).as("__p"))
      .select(col(keyCol), col("__p._1").as("__s"), col("__p._2").as("__n"))
      .where(size(col("__n")) > 0 && array_max(col("__n")) > 0)
      .select(col(keyCol),
        array_max(col("__n")).as("w_total"),
        zip_with(col("__s"), col("__n"),
          (s, n) => when(n > 0, s.cast("double") / n / units)).as("mean_vec"))
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
