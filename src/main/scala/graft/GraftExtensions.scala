package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions.NativeExpressions._
import graft.ops.Dedup

/**
 * SQL surface for the native expressions: register once, then
 * `SELECT graft_simhash64(...)`, `graft_minhash_sig(hashes, k)`, etc.
 * work from `spark.sql`.
 *
 * Two routes:
 *  - at session build: `.config("spark.sql.extensions", "graft.GraftExtensions")`
 *  - on a live session: `GraftExtensions.register(spark)`
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.NativeExpressions", name),
        b))
    }
    // optimizer rules: run with the operator-optimization batch so
    // later built-in passes (constant folding, predicate pushdown of
    // the rewritten boolean) still apply on the rewritten form
    ext.injectOptimizerRule(_ => graft.plans.ShortCircuitExists)
  }
}

object GraftExtensions {
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(s"$what must be a literal integer")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> (args => SimHash64(args.head)),
    "graft_dot_f" -> (args => DotF(args(0), args(1))),
    "graft_sorted_intersect_count" ->
      (args => SortedIntersectCount(args(0), args(1))),
    "graft_ngram_hashes" ->
      (args => NgramHashes(args(0), litInt(args(1), "n"))),
    "graft_dot_i8" -> (args => DotI8(args(0), args(1))),
    "graft_fingerprint64" -> (args => Fingerprint64(args.head)),
    "graft_token_hash60" -> (args => TokenHash60(args.head)),
    "graft_token_hashes_xx" -> (args => TokenHashesXx(args.head)),
    "graft_token_hashes60" -> (args => TokenHashes60(args.head)),
    "graft_mod_ngram_hashes" ->
      (args => ModNgramHashes(args(0), litInt(args(1), "n"))),
    "graft_text_features" -> (args => TextFeatures(args.head)),
    "graft_jaro_winkler" -> (args => JaroWinkler(args(0), args(1))),
    "graft_minhash_sig" -> (args => {
      val k = litInt(args(1), "k")
      val cs = Dedup.mhCoeffs(k)
      MinHashSig(args.head, cs.map(_._1).toArray, cs.map(_._2).toArray,
        Dedup.MhPrime)
    }))

  /** Register on an already-built session: the `graft_*` SQL functions
    * plus the optimizer rules (via `experimental.extraOptimizations` —
    * the live-session route; `spark.sql.extensions` covers the
    * build-time route). Idempotent. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.ShortCircuitExists))
      spark.experimental.extraOptimizations =
        cur :+ graft.plans.ShortCircuitExists
  }
}
