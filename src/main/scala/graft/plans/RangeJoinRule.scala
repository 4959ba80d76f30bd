package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule that turns a point-in-interval theta-join — which Spark
  * can only plan as a broadcast-nested-loop / cartesian product — into the
  * bucketed equi-join [[graft.ops.RangeJoin]] builds by hand:
  *
  *   left JOIN right ON p >= lo AND p <= hi
  *     ⇒ left+bucket(p) JOIN explode(seq(bucket(lo), bucket(hi))) ON
  *       bucket-equality AND the ORIGINAL predicate
  *
  * Integer division is monotone, so `lo ≤ p ≤ hi` implies the point's
  * bucket lies in the interval's bucket range — the rewrite loses nothing,
  * and the exact predicate (kept verbatim as the residual join condition)
  * filters false bucket-mates. Join output columns are unchanged (the
  * helper columns are projected away), so the rewrite is transparent to
  * everything above it.
  *
  * Off by default: set `spark.graft.rangeJoin.width` to a positive bucket
  * width (≈ the median interval span) to arm it. Deploy session-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or per session
  * through `spark.experimental.extraOptimizations`. Fires only on an INNER
  * join whose condition is exactly the two range conjuncts over integral
  * columns, point from the left side, bounds from the right.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.width"

  private def width: Long =
    try conf.getConfString(WidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.subsetOf(side.outputSet) && e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))), _)
          if p1.semanticEquals(p2) &&
            Seq(p1, lo, hi).forall(integral) &&
            refsOnly(p1, left) && refsOnly(lo, right) && refsOnly(hi, right) =>
        rewrite(j, left, right, p1, lo, hi, w)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      p: Expression, lo: Expression, hi: Expression, w: Long): LogicalPlan = {
    def bucketOf(e: Expression): Expression =
      IntegralDivide(Cast(e, LongType), Literal(w))
    val pBucket = Alias(bucketOf(p), "_graft_range_pb")()
    val leftB = Project(left.output :+ pBucket, left)
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // counts as unresolved and fails post-analysis plan validation
    val gen = Explode(Sequence(bucketOf(lo), bucketOf(hi), None,
      Some(conf.sessionLocalTimeZone)))
    val iBucket = AttributeReference("_graft_range_ib", LongType,
      nullable = gen.elementSchema.fields.head.nullable)()
    val rightB = Generate(gen, Nil, outer = false, None, Seq(iBucket), right)
    val joined = Join(leftB, rightB, Inner,
      Some(And(EqualTo(pBucket.toAttribute, iBucket), j.condition.get)), j.hint)
    // rewritten condition no longer matches the rule's pattern → converges
    // under the optimizer's fixed-point batch
    Project(j.output, joined)
  }
}
