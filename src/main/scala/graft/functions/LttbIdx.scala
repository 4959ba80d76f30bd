package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `lttb_idx(xs, ys, n_out)` — Largest-Triangle-Three-Buckets downsampling
  * (Steinarsson 2013; the ClickHouse largestTriangleThreeBuckets surface)
  * over a SORTED integer series, returning the 0-based positions of the
  * selected points.
  *
  * Exactness contract: x and y are BIGINT (day numbers / cents), and the
  * triangle-area argmax is computed in INTEGER arithmetic — the area
  * against the next bucket's mean point is scaled by that bucket's count
  * (2·cnt·Area = |cnt·x_a·y_b − x_a·Sy + x_b·Sy − cnt·x_b·y_a + Sx·y_a −
  * Sx·y_b|, all Longs), so there is no float tie-breaking anywhere and a
  * SQL oracle in integer arithmetic reproduces the selection bit-for-bit.
  * Ties take the earliest candidate. Magnitude bound: cnt·x·y must fit a
  * Long — day×cents series at any realistic grain qualify (≤ 10^5 · 2·10^4
  * · 10^8 ≈ 2·10^17 < 2^63).
  *
  * The expression is per-GROUP narrow work over the already-collapsed
  * (group, x) grain — the series arrives as one bounded array per group
  * (the ts_downsample_m4 discipline), never as fact rows.
  */
case class LttbIdx(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lttb_idx expects (array<bigint>, array<bigint>, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(xs: Any, ys: Any, n: Any): Any =
    LttbIdx.compute(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (xs, ys, n) => s"graft.functions.LttbIdx.compute($xs, $ys, $n)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): LttbIdx = copy(first = f, second = s, third = t)

  override def prettyName: String = "lttb_idx"
}

object LttbIdx {

  // Bucket k of the nb middle buckets holds positions
  // 1 + ⌊k·nMid/nb⌋ … ⌊(k+1)·nMid/nb⌋ — the equal-split rule; the SQL
  // oracle joins candidates on the SAME floor-division range.
  def compute(xsA: ArrayData, ysA: ArrayData, nOut: Int): ArrayData = {
    val n = xsA.numElements()
    require(ysA.numElements() == n, "lttb_idx: xs/ys length mismatch")
    if (n <= nOut || nOut < 3)
      return new GenericArrayData(Array.tabulate(n)(identity))
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = xsA.getLong(i); ys(i) = ysA.getLong(i); i += 1 }

    val nb = nOut - 2 // middle buckets over middle indices 1..n-2
    val nMid = n - 2
    val out = new Array[Int](nOut)
    out(0) = 0
    var sel = 0 // previously selected position
    var k = 0
    while (k < nb) {
      // bucket k candidate range (positions)
      val lo = 1 + Math.toIntExact(k.toLong * nMid / nb)
      val hi = 1 + Math.toIntExact((k + 1).toLong * nMid / nb) - 1
      // next anchor: mean of bucket k+1 (scaled by cnt), or the last point
      var sx = 0L; var sy = 0L; var cnt = 0L
      if (k + 1 < nb) {
        val nlo = 1 + Math.toIntExact((k + 1).toLong * nMid / nb)
        val nhi = 1 + Math.toIntExact((k + 2).toLong * nMid / nb) - 1
        var j = nlo
        while (j <= nhi) { sx += xs(j); sy += ys(j); cnt += 1; j += 1 }
      } else { sx = xs(n - 1); sy = ys(n - 1); cnt = 1 }
      val xa = xs(sel); val ya = ys(sel)
      var best = lo
      var bestArea = -1L
      var b = lo
      while (b <= hi) {
        val area = Math.abs(
          cnt * xa * ys(b) - xa * sy + xs(b) * sy -
            cnt * xs(b) * ya + sx * ya - sx * ys(b))
        if (area > bestArea) { bestArea = area; best = b }
        b += 1
      }
      out(k + 1) = best
      sel = best
      k += 1
    }
    out(nOut - 1) = n - 1
    new GenericArrayData(out)
  }
}
