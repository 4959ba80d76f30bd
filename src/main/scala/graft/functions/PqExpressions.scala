package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization primitives (graft.ann.Pq) — native codegen
  * expressions so subspace assignment and ADC scoring stay inside
  * whole-stage codegen (a `transform`/`aggregate` formulation would run
  * interpreted per element).
  */

/** `l2_sq(a, b)` — squared Euclidean distance of two float vectors (the
  * k-means assignment metric). Null on null input or length mismatch.
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0; var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
        s += d * d; i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

/** `pq_adc(codes, dot_table, norm_table)` — asymmetric distance computation:
  * the PQ-approximated cosine of a probe against an encoded vector.
  *
  * `codes` is the vector's M subspace codes; the tables are the probe's
  * flattened M×K lookup tables (`dot_table[m*K + c]` = ⟨probe_m, cb[m][c]⟩,
  * `norm_table[m*K + c]` = ‖cb[m][c]‖²). Score = Σdot / √Σnorm — the
  * probe-norm divisor is rank-invariant per probe and omitted. Null when the
  * reconstructed norm is non-positive (degenerate all-zero codebook rows).
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType, el: DataType) = t match {
      case ArrayType(e, _) => e == el
      case _               => false
    }
    if (arr(first.dataType, IntegerType) && arr(second.dataType, DoubleType) &&
      arr(third.dataType, DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int>, array<double>, array<double>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(c: Any, dt: Any, nt: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val dotT = dt.asInstanceOf[ArrayData]
    val normT = nt.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || dotT.numElements() != normT.numElements() ||
      dotT.numElements() % m != 0) null
    else {
      val k = dotT.numElements() / m
      var sd = 0.0; var sn = 0.0; var i = 0
      while (i < m) {
        val idx = i * k + codes.getInt(i)
        sd += dotT.getDouble(idx); sn += normT.getDouble(idx)
        i += 1
      }
      if (sn <= 0.0) null else sd / math.sqrt(sn)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, dt, nt) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val k = ctx.freshName("k"); val idx = ctx.freshName("idx")
      val sd = ctx.freshName("sd"); val sn = ctx.freshName("sn")
      // NB: generated lines must never START with '|' — Spark's code Block
      // interpolator strips pipe margins a second time and would eat a
      // leading '||', producing uncompilable Java (silent interpreter
      // fallback). Boolean operators stay at end-of-line.
      s"""
         |final int $m = $c.numElements();
         |if ($m == 0 || $dt.numElements() != $nt.numElements() ||
         |    $dt.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $k = $dt.numElements() / $m;
         |  double $sd = 0.0; double $sn = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    final int $idx = $i * $k + $c.getInt($i);
         |    $sd += $dt.getDouble($idx); $sn += $nt.getDouble($idx);
         |  }
         |  if ($sn <= 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $sd / java.lang.Math.sqrt($sn); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "pq_adc"
}
