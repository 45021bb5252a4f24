package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnLift
import org.apache.spark.sql.types._

/** Native vector math over `array<float|double>` columns.
  *
  * Why custom expressions: the HOF forms (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) allocate an intermediate array and dispatch a lambda per
  * element OUTSIDE whole-stage codegen — measured ~100 µs per 64-d cosine,
  * which turned the LSH pair-verify join of `Similarity.cosineNearDups`
  * into the benchmark's dominant cost (147 s at sf0.1). These compile to a
  * primitive fused loop inside whole-stage codegen (~100× on the verify
  * path). Arithmetic is kept IDENTICAL to the HOF form — per-element
  * widen-to-double, sequential left-to-right accumulation, `sqrt` per
  * norm — so every DuckDB-oracle row (q_ann_brute etc.) is unchanged.
  *
  * Null elements inside a vector are treated as 0 (the embeddings schema
  * never produces them; the HOF form would poison the whole sum to null).
  */
private[graft] trait VecBinaryBase extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} needs array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  @inline protected final def get(a: ArrayData, i: Int, f: Boolean): Double =
    if (f) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor snippet for one element, widened to double. */
  protected def jGet(v: String, i: String, f: Boolean): String =
    if (f) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ over min(len) elements, double precision. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryBase {

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    val (an, bn) = (elemNullable(left), elemNullable(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      if (!((an && a.isNullAt(i)) || (bn && b.isNullAt(i))))
        dot += get(a, i, af) * get(b, i, bf)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val guard =
        (if (elemNullable(left)) s"!$a.isNullAt($i) && " else "") +
          (if (elemNullable(right)) s"!$b.isNullAt($i) && " else "") + "true"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($guard) {
         |    $dot += (${jGet(a, i, elemIsFloat(left))}) * (${jGet(b, i, elemIsFloat(right))});
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — dot over min(len), each norm over its own full
  * length (matches `dot(a,b)/(norm(a)*norm(b))` on equal-length inputs);
  * 0.0 when either norm is 0. One fused pass, no intermediate arrays. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryBase {

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    val (an, bn) = (elemNullable(left), elemNullable(right))
    val (la, lb) = (a.numElements(), b.numElements())
    val n = math.min(la, lb)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (!((an && a.isNullAt(i)) || (bn && b.isNullAt(i))))
        dot += get(a, i, af) * get(b, i, bf)
      i += 1
    }
    i = 0
    while (i < la) {
      if (!(an && a.isNullAt(i))) { val x = get(a, i, af); na += x * x }
      i += 1
    }
    i = 0
    while (i < lb) {
      if (!(bn && b.isNullAt(i))) { val x = get(b, i, bf); nb += x * x }
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val nn = ctx.freshName("nn")
      val gA = if (elemNullable(left)) s"!$a.isNullAt($i)" else "true"
      val gB = if (elemNullable(right)) s"!$b.isNullAt($i)" else "true"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($gA && $gB) {
         |    $dot += (${jGet(a, i, elemIsFloat(left))}) * (${jGet(b, i, elemIsFloat(right))});
         |  }
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($gA) { double $x = ${jGet(a, i, elemIsFloat(left))}; $na += $x * $x; }
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($gB) { double $x = ${jGet(b, i, elemIsFloat(right))}; $nb += $x * $x; }
         |}
         |double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($nn == 0.0) ? 0.0 : $dot / $nn;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  def dot(a: Column, b: Column): Column =
    ColumnLift.column(VecDot(ColumnLift.expression(a), ColumnLift.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnLift.column(VecCosine(ColumnLift.expression(a), ColumnLift.expression(b)))
}
