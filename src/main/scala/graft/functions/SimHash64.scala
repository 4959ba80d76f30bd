package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** `simhash64(tokens)` — 60-bit SimHash of a token array as one native pass.
  *
  * Per token: the 60-bit hash is the first 15 hex chars of md5(token) (the
  * same portable hash the DuckDB oracle uses); bit i of the signature is set
  * iff a strict majority of token hashes have bit i set.
  *
  * The built-in formulation needs nested higher-order functions (60 ×
  * filter/size over the token array), which run interpreted; this computes
  * the whole signature in one compiled loop with a 60-int vote table —
  * per-doc narrow work, zero shuffle, the shape a 100 TB fingerprint scan
  * needs. Distinct-ness of tokens is the caller's contract (pair with
  * `array_distinct`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  private val hexDigits = "0123456789abcdef".getBytes

  /** 60-bit numeric value of the first 15 hex chars of md5(token) — equal to
    * DuckDB `('0x' || substr(md5(t), 1, 15))::BIGINT` and Spark
    * `conv(substring(md5(t), 1, 15), 16, 10)`.
    */
  def h60(md: MessageDigest, token: UTF8String): Long = {
    md.reset()
    val d = md.digest(token.getBytes)
    // first 15 hex chars = bytes 0..6 fully + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(tokens: ArrayData): Long = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = h60(md, tokens.getUTF8String(t))
      var i = 0
      while (i < 60) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (2 * votes(i) > n) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
