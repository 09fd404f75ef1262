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

  /**
   * Dirichlet-smoothed query-likelihood top-`k` (Ponte & Croft's LM
   * retrieval with Zhai & Lafferty's Dirichlet prior), the classic
   * complement to [[bm25TopK]]:
   *
   *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf(t,d)·|C| / (μ·cf(t)))
   *                + |q|_eff · ln(μ / (|d| + μ))
   *
   * using the standard sum-over-matched-postings decomposition, so the
   * join shape is IDENTICAL to BM25 (matched postings + slim per-doc /
   * per-query corrections) — no term-complete scoring pass. `cf` is
   * the collection term frequency, |C| total tokens, |q|_eff the
   * query's terms that exist in the collection (OOV terms drop from
   * both parts, the standard convention). Candidates are documents
   * matching ≥ 1 term. Ranking key = score rounded to 6, doc id tie.
   *
   * Scale shape: ONE tokenize pass — cf, dl and the match join all
   * reuse the (doc, term, tf) exchange; the query side broadcasts;
   * corrections are a per-query count (broadcast) and the per-doc
   * length join. Bodies never shuffle.
   */
  def queryLikelihoodTopK(docs: DataFrame, queries: DataFrame,
                          textCol: String, idCol: String, qidCol: String,
                          qtextCol: String, k: Int,
                          mu: Double = 1000.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(mu > 0, s"mu must be positive: $mu")
    val toks = docs.select(col(idCol).cast(LongType).as("__id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .where(col("__id").isNotNull && col("token").isNotNull)
    val tf = toks.groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf >= 1 guard: keeps cf/dl canonically equal to the tf subplan so
    // the exchange is reused (the bm25TopK/t12 lesson)
    val cf = tf.where(col("tf") >= 1)
      .groupBy(col("token")).agg(sum(col("tf")).as("cf"))
    val dl = tf.where(col("tf") >= 1)
      .groupBy(col("__id")).agg(sum(col("tf")).as("dl"))
    val g = docs.select(TextOps.tokenCount(col(textCol)).as("__n"))
      .agg(sum(col("__n")).as("total_tokens"))
    val qt = queries.select(col(qidCol).cast(LongType).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("token"))
    val nq = qt.join(cf, Seq("token"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("__nq"))
    val term = log(lit(1.0) +
      (col("tf").cast(DoubleType) * col("total_tokens").cast(DoubleType)) /
        (lit(mu) * col("cf").cast(DoubleType)))
    val matched = tf.join(broadcast(qt), Seq("token"))
      .join(cf, Seq("token"))
      .crossJoin(broadcast(g))
      .select(col("query_id"), col("__id"), term.as("__s"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__s")).as("__m"))
    val scored = matched.join(dl, Seq("__id"))
      .join(broadcast(nq), Seq("query_id"))
      .select(col("query_id"), col("__id"),
        (col("__m") + col("__nq").cast(DoubleType) *
          log(lit(mu) / (col("dl").cast(DoubleType) + lit(mu))))
          .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("__id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("__id").as("doc_id"), col("rank"),
        col("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack & Clarke, SIGIR 2009) of ranked
   * retrieval runs — the standard score-free way to combine a sparse
   * (BM25) and a dense (ANN) run into one hybrid ranking:
   *
   *   rrf(q,d) = Σ_runs 1 / (rrfK + rank_run(q,d))
   *
   * Each input run carries (query_id, doc_id, rank); a document absent
   * from a run simply contributes nothing (no score normalization
   * needed — that is the point of RRF). Ranking key is the fused score
   * rounded to 9 decimals then doc id (cross-engine-stable under
   * summation-order differences; at most |runs| terms per pair).
   * Output: (query_id, doc_id, rank, rrf_score, n_runs) with
   * rrf_score rounded to 6 decimals and n_runs = how many runs
   * surfaced the document.
   *
   * Scale shape: inputs are already top-k runs (k·|queries| slim rows
   * each), so the union, the (query, doc) partial agg, and the
   * per-query window are all bounded by Σ runs' k·|queries| — nothing
   * touches the corpus. This composes with ANY (query_id, doc_id,
   * rank) producer here: bm25TopK, the ANN family, mmrRerankTopK.
   */
  def rrfFuse(runs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k >= 1, s"k must be >= 1: $k")
    require(rrfK >= 0, s"rrfK must be >= 0: $rrfK")
    val slim = runs.map(_.select(col("query_id").cast(LongType),
      col("doc_id").cast(LongType),
      (lit(1.0) / (lit(rrfK.toDouble) + col("rank").cast(DoubleType)))
        .as("__c")))
    val fused = slim.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_runs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("__s"), 9).desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("__s"), 6).as("rrf_score"), col("n_runs"))
  }

  /**
   * Standard ranked-retrieval quality metrics per query — the eval
   * harness for any (query_id, doc_id, rank) run against a binary
   * relevance set `qrels` (query_id, doc_id; duplicates ignored):
   *
   *   - hits  = |run@k ∩ qrels|
   *   - mrr   = 1 / rank of the first relevant hit (0 if none)
   *   - ndcg  = DCG@k / IDCG@k with binary gains, DCG = Σ 1/log2(r+1)
   *             over relevant hits, IDCG = the same sum over ranks
   *             1..min(n_rel, k)  (0 when the query has no relevant
   *             documents at all)
   *
   * Every query present in the run gets a row, relevant or not.
   * Output: (query_id, n_rel, hits, mrr, ndcg), metrics rounded to 6
   * decimals.
   *
   * Scale shape: the run is k·|queries| slim rows; qrels joins on the
   * composite key with map-side distinct; the IDCG series is computed
   * per ROW with a bounded higher-order `aggregate` over
   * sequence(1, min(n_rel, k)) — no join against a rank table. Run it
   * continuously next to a production index as the relevance canary
   * (the quality twin of [[graft.ops.Similarity.recallAtK]]).
   */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val r = run.where(col("rank") <= k).select(
      col("query_id").cast(LongType), col("doc_id").cast(LongType),
      col("rank").cast(LongType))
    val rel = qrels.select(col("query_id").cast(LongType),
      col("doc_id").cast(LongType)).distinct()
    val nrel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("__nr"))
    val hits = r.join(rel, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__h"),
        max(lit(1.0) / col("rank").cast(DoubleType)).as("__mrr"),
        sum(lit(1.0) / log2(col("rank").cast(DoubleType) + lit(1.0)))
          .as("__dcg"))
    val nRel = coalesce(col("__nr"), lit(0L))
    val idcg = aggregate(
      sequence(lit(1L), least(greatest(nRel, lit(1L)), lit(k.toLong))),
      lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast(DoubleType) + lit(1.0)))
    r.select(col("query_id")).distinct()
      .join(nrel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), nRel.as("n_rel"),
        coalesce(col("__h"), lit(0L)).as("hits"),
        round(coalesce(col("__mrr"), lit(0.0)), 6).as("mrr"),
        round(when(nRel === 0L, lit(0.0))
          .otherwise(coalesce(col("__dcg"), lit(0.0)) / idcg), 6).as("ndcg"))
  }

  /**
   * Pseudo-relevance-feedback expansion terms (RM1 relevance model,
   * Lavrenko & Croft 2001, uniform doc prior over the feedback set):
   * run BM25, take each query's top `kDocs` documents as pseudo-
   * relevant, and weight candidate terms by
   * \u03a3_{d \u2208 top} tf(t,d)/|d| \u2014 the expansion vocabulary a second-pass
   * retrieval or a topic-targeted corpus mining job consumes. The
   * query's own terms are excluded (expansion, not echo); ranking key
   * is the weight rounded to 6 with the term as tie \u2014 the
   * tfidfTopTerms determinism convention.
   *
   * Scale shape: inherits [[bm25TopK]]'s single-tokenize posture; the
   * feedback join touches only the k\u00b7|queries| top rows against the
   * (doc, term, tf) exchange, and the per-(query, term) sum partial-
   * aggregates. Bodies never shuffle.
   */
  def prfExpansionTerms(docs: DataFrame, queries: DataFrame,
                        textCol: String, idCol: String, qidCol: String,
                        qtextCol: String, kDocs: Int,
                        mTerms: Int): DataFrame = {
    require(kDocs > 0 && mTerms > 0, "kDocs and mTerms must be positive")
    val top = bm25TopK(docs, queries, textCol, idCol, qidCol, qtextCol,
        kDocs)
      .select(col("query_id"), col("doc_id"))
    val toks = docs.select(col(idCol).cast(LongType).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .where(col("doc_id").isNotNull && col("token").isNotNull)
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.where(col("tf") >= 1)
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val qt = queries.select(col(qidCol).cast(LongType).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("token"))
    val weights = top.join(tf, Seq("doc_id")).join(dl, Seq("doc_id"))
      .groupBy(col("query_id"), col("token"))
      .agg(sum(col("tf").cast(DoubleType) / col("dl").cast(DoubleType))
        .as("weight"))
      .join(broadcast(qt), Seq("query_id", "token"), "left_anti")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("weight"), 6).desc, col("token"))
    weights.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= mTerms)
      .select(col("query_id"), col("token").as("term"), col("rank"),
        col("weight"))
  }

  // --------------------------------------------- persisted BM25 index

  /** (token, doc, tf, dl, bucket) posting rows of a corpus under the
   *  engine's frozen tokenizer — dl denormalized onto every posting so
   *  a probe never needs a doc-length side table. */
  private def bm25Postings(docs: DataFrame, textCol: String,
      idCol: String, nBuckets: Int): DataFrame = {
    // dl derives from tf, NOT map-side size(tokens): the r16
    // optimization pass MEASURED the map-side variant at 2.0× slower
    // (s40 quiet A/B 2.18 → 4.35 s) — carrying size(tokens) next to
    // explode(tokens) re-evaluates the split per row, and re-splitting
    // the text costs far more than the two slim post-aggregation
    // exchanges it saves. Kept deliberately (guide §1.1: the
    // first-principles "ideal" lost to the empirical loop).
    val toks = docs.select(col(idCol).cast(LongType).as("__id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .where(col("__id").isNotNull && col("token").isNotNull)
    val tf = toks.groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("__id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, Seq("__id"))
      .select(col("token"), col("__id"), col("tf"), col("dl"),
        pmod(hash(col("token")), lit(nBuckets)).as("__bucket"))
  }

  /** Corpus scalars of one doc frame: (n_docs, total_tokens) counting
   *  EVERY document (empty ones contribute length 0 — BM25's N/avgdl
   *  contract). */
  private def bm25Scalars(docs: DataFrame, textCol: String)
      : (Long, Long) = {
    val row = docs.select(TextOps.tokenCount(col(textCol)).as("__n"))
      .agg(count(lit(1)), coalesce(sum(col("__n")), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }

  private def writeBm25Stats(spark: org.apache.spark.sql.SparkSession,
      path: String, nDocs: Long, totalTokens: Long,
      nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((nDocs, totalTokens, nBuckets))
      .toDF("n_docs", "total_tokens", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /**
   * Persist a BM25 postings index (round 16; VERDICT-r15 #6 — the
   * retrieval twin of [[Similarity.writeIvfIndex]]): the corpus
   * tokenized ONCE into (token, doc, tf, dl) posting rows, written as
   * parquet PARTITIONED BY a hash bucket of the token, plus a 1-row
   * stats table (N, total tokens, bucket count). At 100 TB this is
   * the index build — one pass over the bodies; every later probe is
   * a partition-pruned READ of |query-term buckets| / nBuckets of the
   * postings, and the bodies are never read again. A token's postings
   * all land in ONE bucket, so document frequency stays computable
   * exactly from the pruned slice.
   */
  def writeBm25Index(docs: DataFrame, textCol: String, idCol: String,
                     path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // postings write and the scalars+stats table are independent —
    // overlap them (guide §2.6; round 17)
    graft.ops.Hashing.concurrently(
      () => bm25Postings(docs, textCol, idCol, nBuckets)
        .repartition(col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"$path/postings"),
      () => {
        val (n, t) = bm25Scalars(docs, textCol)
        writeBm25Stats(docs.sparkSession, path, n, t, nBuckets)
      })
  }

  /**
   * Incremental index maintenance: append a batch of NEW documents to
   * a persisted BM25 index without rebuilding — the [[Similarity
   * .appendIvfIndex]] shape. The batch tokenizes under the index's
   * FROZEN tokenizer and bucket count (probes must keep seeing one
   * consistent layout), its postings append into the existing bucket
   * directories (untouched buckets' files untouched), and only the
   * corpus scalars recompute as deltas (N += batch docs, total_tokens
   * += batch tokens — df needs no bookkeeping: it is derived from the
   * postings at probe time, and the new rows simply count). Batch doc
   * ids must be new — re-indexing an existing id is a rebuild
   * decision, not an append.
   */
  def appendBm25Index(batch: DataFrame, textCol: String, idCol: String,
                      path: String): Unit = {
    val spark = batch.sparkSession
    val st = spark.read.parquet(s"$path/stats").head()
    val (oldN, oldT, nBuckets) =
      (st.getAs[Long]("n_docs"), st.getAs[Long]("total_tokens"),
        st.getAs[Int]("n_buckets"))
    graft.ops.Hashing.concurrently(
      () => bm25Postings(batch, textCol, idCol, nBuckets)
        .repartition(col("__bucket"))
        .write.mode("append").partitionBy("__bucket")
        .parquet(s"$path/postings"),
      () => {
        val (bn, bt) = bm25Scalars(batch, textCol)
        writeBm25Stats(spark, path, oldN + bn, oldT + bt, nBuckets)
      })
  }

  /**
   * Probe a persisted BM25 index ([[writeBm25Index]] layout): the
   * query terms' bucket ids are collected (≤ |distinct terms| ints —
   * the query side is the small side by contract) and pushed as a
   * STATIC `isin` over the partition column, so Parquet planning
   * prunes every unprobed bucket directory (PartitionFilters, no
   * row-level DataFilters). df aggregates over the pruned slice
   * (exact — a term's postings share one bucket); N/avgdl read from
   * the stats row. Scoring matches [[bm25TopK]] term for term: same
   * smoothed idf, same rounding convention, same (score, doc id)
   * ranking — the in-memory oracle binds the persisted path.
   */
  def bm25ProbeIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, qidCol: String,
      qtextCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val st = spark.read.parquet(s"$path/stats").head()
    val (nDocs, totTokens, nBuckets) =
      (st.getAs[Long]("n_docs"), st.getAs[Long]("total_tokens"),
        st.getAs[Int]("n_buckets"))
    val qt = queries.select(col(qidCol).cast(LongType).as("query_id"),
      explode(array_distinct(TextOps.tokens(col(qtextCol))))
        .as("token"))
    val buckets = qt
      .select(pmod(hash(col("token")), lit(nBuckets)).as("__b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    val post = spark.read.parquet(s"$path/postings")
      .where(col("__bucket").isin(buckets: _*))
    val dfreq = post
      .join(broadcast(qt.select(col("token")).distinct()), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = lit(totTokens.toDouble / nDocs.toDouble)
    val idf = log(lit(1.0) +
      ((lit(nDocs) - col("df")).cast(DoubleType) + lit(0.5)) /
        (col("df").cast(DoubleType) + lit(0.5)))
    val tfD = col("tf").cast(DoubleType)
    val term = idf * ((tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) +
        (lit(b) * col("dl").cast(DoubleType)) / avgdl)))
    val scored = post.join(broadcast(qt), Seq("token"))
      .join(dfreq, Seq("token"))
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
