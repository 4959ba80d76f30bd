package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `norm_sq(e)` — squared L2 norm of a float vector as a native codegen
  * expression (the [[CosineSimilarity]] discipline for the one-vector
  * case): sequential left-to-right double accumulation over floats widened
  * exactly, bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))` fold — and a
  * fused primitive loop instead of the interpreted, boxing
  * `aggregate(transform(...))` higher-order route a 100 TB embedding-QA
  * scan cannot afford. Null in → null out.
  */
case class NormSq(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm_sq expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0; var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; ss += v * v; i += 1 }
    ss
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $ss += $v * $v;
         |}
         |${ev.value} = $ss;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormSq =
    copy(child = newChild)

  override def prettyName: String = "norm_sq"
}
