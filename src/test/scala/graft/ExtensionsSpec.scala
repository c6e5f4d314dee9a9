package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.{CosineSim, DotProduct, GraftExtensions}
import graft.plans.{AsofJoinStrategy, PruneAsofJoinRight}

/** The production registration path (`spark.sql.extensions=
  * graft.functions.GraftExtensions`). The extensions config is a STATIC
  * conf read at SparkContext build, so a live-session test is impossible
  * in the shared test JVM — instead this exercises the injection object
  * directly through the same public `build*`/`register*` API the session
  * builder calls.
  */
class ExtensionsSpec extends SparkSpec {

  private def injected: SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ext
  }

  test("injects cosine_sim and dot_product into the function registry") {
    val reg = org.apache.spark.sql.graft.Shim.registerFunctions(
      injected, new SimpleFunctionRegistry)
    val cos = reg.lookupFunction(FunctionIdentifier("cosine_sim"),
      Seq(Literal.create(Array(1.0)), Literal.create(Array(1.0))))
    assert(cos.isInstanceOf[CosineSim])
    val dot = reg.lookupFunction(FunctionIdentifier("dot_product"),
      Seq(Literal.create(Array(1.0)), Literal.create(Array(1.0))))
    assert(dot.isInstanceOf[DotProduct])
  }

  test("injects the asof planner strategy and pruning rule") {
    assert(org.apache.spark.sql.graft.Shim
      .plannerStrategies(injected, spark).contains(AsofJoinStrategy))
    assert(org.apache.spark.sql.graft.Shim
      .optimizerRules(injected, spark).contains(PruneAsofJoinRight))
  }

  test("runtime registration (tune) resolves the same functions in SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) c, " +
        "dot_product(array(3.0D), array(5.0D)) d").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 15.0) < 1e-12)
  }
}
