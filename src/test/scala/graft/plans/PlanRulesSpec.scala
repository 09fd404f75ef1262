package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayExists, ArrayFilter, Size}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected Catalyst optimizer rule: plan shape + value equivalence. */
class PlanRulesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // keep local Seq inputs as real plans — otherwise the optimizer
    // folds the whole projection into a LocalRelation and there is no
    // plan left to assert on
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  private def allExprs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case e => e })

  test("size(filter) > 0 rewrites to exists and short-circuit semantics match") {
    val df = Seq(
      (1L, Seq("aa", "ab", "zz")),
      (2L, Seq("zz", "yy")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "xs")
    val q = df.select(col("id"),
      (size(filter(col("xs"), x => x.startsWith("a"))) > 0).as("has_a"))
    val plan = optimized(q)
    val exprs = allExprs(plan)
    assert(exprs.exists(_.isInstanceOf[ArrayExists]),
      s"expected ArrayExists in:\n$plan")
    assert(!exprs.exists {
      case Size(_: ArrayFilter, _) => true
      case _ => false
    }, s"Size(ArrayFilter) survived:\n$plan")
    val got = q.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(1L) == true && got(2L) == false)
    assert(got(3L) == false && got(4L) == null) // null array propagates
  }

  test("= 0 and <= 0 forms rewrite to NOT exists; WHERE position filters identically") {
    val df = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, 5))).toDF("id", "xs")
    val q = df.where(size(filter(col("xs"), x => x > 2)) === 0)
    val plan = optimized(q)
    assert(allExprs(plan).exists(_.isInstanceOf[ArrayExists]),
      s"no ArrayExists in:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq.empty)
    val q2 = df.where(size(filter(col("xs"), x => x > 4)) === 0)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("guard: other comparisons (size > 1) do NOT rewrite") {
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "xs")
    val q = df.select((size(filter(col("xs"), x => x > 0)) > 1).as("m"))
    val plan = optimized(q)
    assert(!allExprs(plan).exists(_.isInstanceOf[ArrayExists]),
      s"over-eager rewrite:\n$plan")
    assert(q.head().getBoolean(0))
  }
}
