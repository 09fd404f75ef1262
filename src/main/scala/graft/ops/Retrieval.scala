package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sparse text retrieval over the document corpus — the scoring side of
 * training-data curation (mining documents relevant to a target task,
 * building retrieval-augmented eval sets, seeding topic-targeted
 * subcorpora).
 */
object Retrieval {

  /**
   * Okapi BM25 top-`k` documents per query (the Lucene formulation
   * with the always-positive smoothed idf):
   *
   *   score(q,d) = Σ_{t ∈ q} ln(1 + (N − df + 0.5)/(df + 0.5))
   *                  · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
   *
   * Query terms are de-duplicated (standard bag-of-words query). N and
   * avgdl count ALL documents of `docs` (empty ones contribute length
   * 0). Ranking key is the score ROUNDED to 6 decimals, then doc id —
   * the [[TextOps.tfidfTopTerms]] determinism convention, making ranks
   * stable under cross-engine summation-order differences.
   *
   * Scale shape: the corpus tokenizes ONCE into (doc, term, tf) rows —
   * shuffle ∝ distinct doc-term pairs with map-side combine; document
   * frequency and length reuse that pass (token-keyed and doc-keyed
   * partial aggs). The query term list broadcasts FIRST, so everything
   * downstream of the semi-join is proportional to the matched
   * postings, not the corpus: df and dl join against slim
   * already-filtered rows, the per-(query, doc) sum is one partial agg,
   * and the final top-k is a bounded per-query window. The corpus-wide
   * scalars (N, total tokens) are a 1-row broadcast. Document bodies
   * never shuffle.
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, textCol: String,
               idCol: String, qidCol: String, qtextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // the id/token non-null filters are semantic no-ops (ids are keys,
    // split yields no null tokens) but make every downstream branch's
    // pushed predicates IDENTICAL — without them the token-keyed joins
    // push isnotnull(token) into some tf subplans and the doc-keyed
    // join pushes isnotnull(id) into others, the canonical forms stop
    // matching, and the corpus tokenizes once per branch instead of
    // reusing one tf exchange (the t12 lesson, plan-asserted in OpsSpec)
    val toks = docs.select(col(idCol).cast(LongType).as("__id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .where(col("__id").isNotNull && col("token").isNotNull)
    val tf = toks.groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // same always-true guard as tfidfTopTerms: keeps the df branch
    // canonically equal to the tf subplan so the exchange is reused
    val dfreq = tf.where(col("tf") >= 1)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val dl = tf.where(col("tf") >= 1)
      .groupBy(col("__id")).agg(sum(col("tf")).as("dl"))
    val g = docs.select(TextOps.tokenCount(col(textCol)).as("__n"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
    val qt = queries.select(col(qidCol).cast(LongType).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("token"))
    val avgdl = col("total_tokens").cast(DoubleType) /
      col("n_docs").cast(DoubleType)
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast(DoubleType) + lit(0.5)) /
        (col("df").cast(DoubleType) + lit(0.5)))
    val tfD = col("tf").cast(DoubleType)
    val term = idf * ((tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) +
        (lit(b) * col("dl").cast(DoubleType)) / avgdl)))
    val scored = tf.join(broadcast(qt), Seq("token"))
      .join(dfreq, Seq("token"))
      .join(dl, Seq("__id"))
      .crossJoin(broadcast(g))
      .select(col("query_id"), col("__id"), term.as("__s"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__s")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("__id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("__id").as("doc_id"), col("rank"),
        col("score"))
  }
}
