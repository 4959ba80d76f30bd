package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native text-op expressions — compiled one-pass replacements for the
  * interpreted higher-order-function folds in a 100 TB document scan
  * (`aggregate`/`filter` lambdas are CodegenFallback in Spark).
  * All md5-based math matches the DuckDB oracles bit-for-bit.
  */
private[functions] object TextExprs {
  def requireStringArray(name: String, t: DataType): TypeCheckResult = t match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<string>, got ${other.simpleString}")
  }
}

/** `md5_chain(tokens)` — the rolling document fingerprint: fold
  * `h := md5(h || ':' || token)` from `h = ''` (equal to DuckDB
  * `list_reduce(list_prepend('', tokens), (a,b) -> md5(a||':'||b))`).
  */
case class Md5Chain(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireStringArray(prettyName, child.dataType)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    Md5Chain.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Chain.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Chain =
    copy(child = newChild)

  override def prettyName: String = "md5_chain"
}

object Md5Chain {

  private val hex = "0123456789abcdef".toCharArray

  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(tokens: ArrayData): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    var acc = ""
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update((acc + ":").getBytes("UTF-8"))
      md.update(tokens.getUTF8String(i).getBytes)
      acc = toHex(md.digest())
      i += 1
    }
    UTF8String.fromString(acc)
  }
}

/** `bpe_cost(tokens)` — Σ ceil(len(token)/4): the subword-token budget
  * (equal to `list_sum(list_transform(ws, w -> (length(w)+3) // 4))`).
  * Lengths are in CODE POINTS to match both engines' length().
  */
case class BpeCost(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireStringArray(prettyName, child.dataType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    BpeCost.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCost.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCost =
    copy(child = newChild)

  override def prettyName: String = "bpe_cost"
}

object BpeCost {
  def compute(tokens: ArrayData): Long = {
    var sum = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      sum += (tokens.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    sum
  }
}

/** `count_in(tokens, lexicon)` — number of token OCCURRENCES that appear in
  * the lexicon (equal to `len(list_filter(ws, w -> list_contains(lex, w)))`;
  * unlike array_intersect it counts duplicates).
  */
case class CountIn(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (TextExprs.requireStringArray(prettyName, left.dataType),
      TextExprs.requireStringArray(prettyName, right.dataType)) match {
      case (TypeCheckResult.TypeCheckSuccess, r) => r
      case (l, _)                                => l
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CountIn.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CountIn.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "count_in"
}

object CountIn {
  def compute(tokens: ArrayData, lexicon: ArrayData): Long = {
    val nl = lexicon.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(4, nl * 2))
    var i = 0
    while (i < nl) { set.add(lexicon.getUTF8String(i)); i += 1 }
    var count = 0L
    val n = tokens.numElements()
    i = 0
    while (i < n) {
      if (set.contains(tokens.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }
}
