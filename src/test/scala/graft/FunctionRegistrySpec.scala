package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** GraftFunctions.register is deliberately idempotent — it yields to any
  * name that already exists. That made a Spark 4.x BUILT-IN collision
  * silent: `bitmap_and_agg` resolved to Spark's fixed-4096-byte bitmap
  * aggregate instead of the graft intersection aggregate, swapping
  * SEMANTICS with no error (caught at the sf10 gate, r15). This spec
  * makes the collision class mechanical: every graft name must either be
  * absent before registration or — after registration — build a graft
  * expression, so a future Spark upgrade that claims one of our names
  * fails HERE by name instead of corrupting a query.
  */
class FunctionRegistrySpec extends SparkSpecBase {

  test("every GraftFunctions name resolves to a graft expression class") {
    graft.functions.GraftFunctions.register(spark)
    val reg = spark.sessionState.functionRegistry
    // literal 4 satisfies every builder's k/capacity `require` (k >= 2)
    val args = Seq.fill(4)(
      org.apache.spark.sql.catalyst.expressions.Literal(4L): org.apache.spark.sql.catalyst.expressions.Expression)
    val wrong = graft.functions.GraftFunctions.all.flatMap { case (name, builder) =>
      // building via the REGISTRY must yield the same class our own
      // builder yields — i.e. a class from the graft.functions package
      reg.lookupFunctionBuilder(FunctionIdentifier(name))
        .map(_.apply(args)) match {
        case Some(e) if e.getClass == builder(args).getClass => None
        case Some(e) => Some(s"$name -> ${e.getClass.getName}")
        case None => Some(s"$name -> NOT REGISTERED")
      }
    }
    assert(wrong.isEmpty,
      s"graft names shadowed by non-graft builders (builtin collision): $wrong")
  }
}
