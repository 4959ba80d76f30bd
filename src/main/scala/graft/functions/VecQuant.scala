package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Embedding-quantization primitives for the 100 TB ANN path — native
  * Catalyst expressions with whole-stage codegen (the built-in route via
  * `transform`/`aggregate` lambdas evaluates interpreted and boxes every
  * element).
  *
  * Both widen float32 → double exactly, so every arithmetic step is the
  * identical IEEE operation on identical operands in Spark and the DuckDB
  * oracle — results are bit-identical with no rounding clamp needed.
  */
private[functions] trait FloatVecInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }
}

/** `vec_absmax(v)` — max |vᵢ| as double (the symmetric-quantization range). */
case class VecAbsMax(child: Expression)
    extends UnaryExpression with FloatVecInput {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var mx = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = a.getFloat(i).toDouble
      val av = if (v < 0) -v else v
      if (av > mx) mx = av
      i += 1
    }
    mx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val mx = ctx.freshName("mx"); val v = ctx.freshName("v")
      val av = ctx.freshName("av")
      s"""
         |final int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  final double $av = $v < 0 ? -$v : $v;
         |  if ($av > $mx) $mx = $av;
         |}
         |${ev.value} = $mx;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecAbsMax =
    copy(child = newChild)

  override def prettyName: String = "vec_absmax"
}

/** `quantize_i8(v)` — symmetric int8 quantization, rendered as the
  * comma-joined scalar string (driver-hashable; parquet-ready as a split).
  *
  * qᵢ = clamp(⌊vᵢ · 127/max|v| + 0.5⌋, −127, 127); an all-zero vector
  * quantizes to all zeros. floor(x + 0.5) — not round() — so both engines
  * share one rounding rule for negative values too.
  */
case class QuantizeI8(child: Expression)
    extends UnaryExpression with FloatVecInput {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(QuantizeI8.render(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // single static call keeps the generated method tiny (Janino inlining
      // budget) while staying inside whole-stage codegen
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.QuantizeI8.render($a));"
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)

  override def prettyName: String = "quantize_i8"
}

object QuantizeI8 {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def render(a: ArrayData): String = {
    val n = a.numElements()
    var mx = 0.0; var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      val av = if (v < 0) -v else v
      if (av > mx) mx = av
      i += 1
    }
    val scale = if (mx == 0.0) 0.0 else 127.0 / mx
    val sb = new java.lang.StringBuilder(n * 4)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      var q = if (mx == 0.0) 0L
        else math.floor(a.getFloat(i).toDouble * scale + 0.5).toLong
      if (q > 127L) q = 127L
      if (q < -127L) q = -127L
      sb.append(q)
      i += 1
    }
    sb.toString
  }
}
