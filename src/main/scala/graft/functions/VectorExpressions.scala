package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen vector arithmetic for the similarity/ANN hot path.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * never enters whole-stage codegen: higher-order functions evaluate their
  * lambda per element through interpreted `ArrayAggregate.eval`, and a
  * cosine built from three of them walks both arrays three times and
  * allocates an intermediate array per row. These expressions generate one
  * fused primitive loop (no allocation, no virtual calls), which matters
  * because cosine runs once per CANDIDATE PAIR — the N×C assignment frame,
  * the LSH-bucket pairs, the per-cluster pairwise checks — not once per row.
  *
  * Summation is sequential ascending-index, the same order as the
  * higher-order composition AND DuckDB's `list_dot_product`, so swapping
  * implementations moves no result hashes.
  *
  * Both children must be array<double> (callers cast); null elements are
  * not expected (read as 0.0 rather than guarded — the guard would double
  * the loop body for data the pipeline never produces). A length mismatch
  * returns NULL — the same answer the composed `aggregate(zip_with(…))`
  * form gives (zip_with pads the shorter array with nulls), so a malformed
  * vector pair surfaces as a missing score, never a plausible wrong one.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // nullable regardless of child nullability: mismatched lengths → null
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Cosine similarity in ONE pass: dot, |a|² and |b|² accumulate in the same
  * loop; `dot / (sqrt(na) * sqrt(nb))` matches the composed form and the
  * DuckDB oracle term-for-term (same order, same double rounding).
  */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // nullable regardless of child nullability: mismatched lengths → null
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Squared L2 distance over a sub-range of two vectors — the PQ subspace
  * distance — without materializing `slice()` arrays or re-entering
  * interpreted `ArrayAggregate` per (vector, centroid) row. `offset` is
  * 0-based; the loop covers `[offset, offset+len)` clamped to both array
  * lengths, accumulating ascending — the same order as
  * `aggregate(zip_with(slice(a),slice(b),…))` and DuckDB's
  * `list_sum(list_transform(generate_series(…)))`, so hashes don't move.
  */
case class VecSqDist(a: Expression, b: Expression, offset: Expression, len: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = offset
  override def fourth: Expression = len
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(av: Any, bv: Any, ov: Any, lv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val from = ov.asInstanceOf[Int]
    val until = math.min(from + lv.asInstanceOf[Int],
      math.min(x.numElements(), y.numElements()))
    var s = 0.0d
    var i = from
    while (i < until) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, o, l) => {
      val (i, u, s, d) = (ctx.freshName("i"), ctx.freshName("u"),
        ctx.freshName("s"), ctx.freshName("d"))
      s"""
         |int $u = java.lang.Math.min($o + $l,
         |  java.lang.Math.min($x.numElements(), $y.numElements()));
         |double $s = 0.0;
         |for (int $i = $o; $i < $u; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

object vec {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column = column(VecCosine(expression(a), expression(b)))

  /** Squared L2 over `[offset, offset+len)` (0-based), codegen'd. */
  def sqDist(a: Column, b: Column, offset: Column, len: Column): Column =
    column(VecSqDist(expression(a), expression(b),
      expression(offset.cast("int")), expression(len.cast("int"))))
}
