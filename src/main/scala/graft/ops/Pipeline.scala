package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Composed training-data curation pipeline — the operators of this
 * package wired the way a 100 TB pre-training pass uses them:
 *
 *   quality gate → exact dedup → language ID → per-language token budget
 *
 * Every stage is a narrow map or a hash-key shuffle; text bodies move
 * exactly once (the dedup semi-join streams them). Near-dedup
 * (MinHash/SimHash) slots between dedup and langId when needed — kept
 * out of the oracle-checked path because LSH is probabilistic.
 */
object Pipeline {

  /** Quality-gated, deduplicated corpus (full rows + quality column,
    * plus the fused `__tf` feature array reused by downstream stages —
    * ONE native pass computes what seven regex scans did). */
  def curatedCorpus(docs: DataFrame, minQuality: Double): DataFrame = {
    val scored = docs
      .withColumn("__tf", TextOps.features(col("text")))
      .withColumn("quality", TextOps.qualityScoreF(col("__tf"), col("n_chars")))
      .where(col("quality") >= minQuality)
    Dedup.deduplicate(scored, "text", "doc_id")
  }

  /** Per-language document and token budget of the curated corpus. */
  def curationReport(docs: DataFrame, minQuality: Double): DataFrame =
    curatedCorpus(docs, minQuality)
      .withColumn("lang_pred", TextOps.langIdF(col("__tf")))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum(element_at(col("__tf"), 1)).as("n_tokens"))

  /**
   * Token-budget packing: assign each document to a bin of ~`budget`
   * tokens within its group (the step before batch assembly in a
   * pre-training pipeline). Deterministic running-sum packing: documents
   * are taken in `orderCol` order and a document starting before a
   * budget boundary stays in the earlier bin. One shuffle on the group
   * key; the running sum is a window inside the sorted partition.
   * Groups are independent — at 100 TB parallelism = #groups, so pack
   * within (lang, shard) style composite keys, not one global key.
   */
  def packTokenBins(docs: DataFrame, groupCol: String, orderCol: String,
                    budget: Long): DataFrame = {
    // ROWS frame: the default RANGE frame treats orderCol ties as peers
    // and would sum them into each other's cumulative total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(groupCol), col(orderCol), col("n_tokens"),
        floor((col("__cum") - col("n_tokens")) / lit(budget)).as("bin_id"))
  }

  /**
   * Packed-sequence assembly map: [[packTokenBins]] plus each
   * document's token OFFSET inside its bin — exactly the
   * (sequence, segment offset, segment length) triples a packed-batch
   * loader consumes to build block-diagonal attention masks, emitted
   * as rows instead of collected lists (no per-bin state, loaders
   * range-read their bin's rows). A document straddling the budget
   * boundary stays in its starting bin, so offsets can exceed
   * `budget` on the last segment — the loader's truncate/continue
   * decision, surfaced rather than hidden. Output: (groupCol,
   * orderCol, bin_id, offset, n_tokens).
   *
   * Same scale shape as packTokenBins: ONE group-key Exchange (the
   * (group, bin) window's clustering is satisfied by the group
   * partitioning — subset rule), two in-partition Sort+Window passes,
   * zero additional movement.
   */
  def packOffsets(docs: DataFrame, groupCol: String, orderCol: String,
                  budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, "bin_id").orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    packTokenBins(docs, groupCol, orderCol, budget)
      .withColumn("offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(groupCol), col(orderCol), col("bin_id"), col("offset"),
        col("n_tokens"))
  }

  /**
   * Curation frontier: for each quality-threshold decile, what
   * survives — (threshold, n_docs, n_tokens, doc_frac, token_frac).
   * The planning artifact behind "keep the top X%": it shows where
   * the token budget actually sits on the quality axis BEFORE a
   * threshold is committed (cutting at 0.7 may cost 5% of documents
   * but 30% of tokens if length correlates with quality). Thresholds
   * are `i/10` for i in 1..9; a document counts under every threshold
   * it clears, so rows are cumulative-from-above. All 9 threshold rows
   * are ALWAYS present — a threshold no document clears reports zeros
   * (zero-fill convention, same as thresholdSweep / the histograms),
   * so downstream consumers can rely on the 9-row shape.
   *
   * Scale shape: ONE pass scores quality + token counts (the fused
   * native counter), each slim (quality, n_tokens) row expands
   * IN-ROW to the ≤9 thresholds it clears, and a partial agg
   * finishes; the aggregate left-joins onto a 9-row literal threshold
   * spine (broadcast, negligible). Totals ride the same frame; no
   * second scan, no window.
   */
  def curationFrontier(docs: DataFrame): DataFrame = {
    val scored = docs.select(
      TextOps.qualityScoreF(TextOps.features(col("text")),
        col("n_chars")).as("__q"),
      TextOps.tokenCount(col("text")).as("__t"))
    val expanded = scored.select(col("__q"), col("__t"),
        explode(filter(
          sequence(lit(1), lit(9)),
          i => col("__q") >= i.cast("double") / lit(10.0))).as("__i"))
      .groupBy((col("__i").cast("double") / lit(10.0)).as("threshold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
    val spine = docs.sparkSession.range(1, 10)
      .select((col("id").cast("double") / lit(10.0)).as("threshold"))
    val filled = spine.join(expanded, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    val totals = scored.agg(count(lit(1)).as("__nd"),
      sum(col("__t")).as("__nt"))
    filled.crossJoin(broadcast(totals))
      .select(col("threshold"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("__nd"), 6).as("doc_frac"),
        round(col("n_tokens").cast("double") / col("__nt"), 6)
          .as("token_frac"))
  }

  /**
   * Deterministic per-stratum sample of EXACTLY `perStratum` rows (or
   * all rows of smaller strata): rows ranked inside each stratum by a
   * multiplicative hash of the id (ties by id). Hash order makes the
   * sample stable across runs, partitionings and engines — the DuckDB
   * oracle reproduces it value-for-value.
   *
   * Scale: one shuffle on the stratum key, rank inside the sorted
   * partition. A giant stratum serializes through one partition — when
   * exact-n is not required, prefer [[sampleByHashFraction]] (map-only,
   * no shuffle at all).
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(Hashing.mulHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= perStratum)
      .drop("__rk")
  }

  /** Map-only deterministic ~`fraction` sample: keep rows whose id hash
    * lands under the cut. No shuffle, no sort — the 100 TB sampling
    * path; the sampled fraction concentrates to `fraction` by the law
    * of large numbers but is not exact-n. */
  def sampleByHashFraction(df: DataFrame, idCol: String,
                           fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val cut = (fraction * 1000000007L).toLong
    df.where(Hashing.mulHash(col(idCol)) < cut)
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement (Efraimidis &
   * Spirakis 2006): keep the `n` rows with the largest
   * `key = ln(u) / w`, where u ∈ (0, 1] derives from the id's
   * multiplicative hash — inclusion probability proportional to the
   * weight, reproducible across runs, partitionings, and engines
   * (quality-weighted corpus selection with an auditable sample).
   * The ranking key is ROUNDED to 1e-6 with the id as tie-break:
   * libm ln() may differ from another engine's in the last ulp, and
   * the rounding keeps that noise out of the selection (same contract
   * as the TF-IDF rank keys); a 1-ulp difference only matters if two
   * keys agree to six decimals, where the id decides anyway.
   *
   * Scale: a map stage computing the key + ONE TakeOrdered(n) — no
   * shuffle of the corpus, no per-group serialization; n·partitions
   * candidate rows reach the driver-side merge like any top-k.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val m = 1000000007L
    // u in (0, 1]: (h + 1) / M with h in [0, M)
    val u = (Hashing.mulHash(col(idCol)).cast("double") + lit(1.0)) /
      lit(m.toDouble)
    val w = col(weightCol).cast("double")
    val key = round(log(u) / w, 6)
    df.where(w > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(n)
      .drop("__wkey")
  }

  /**
   * Leakage-safe train/test split: deterministic hash split whose unit
   * is the NEAR-DUP CLUSTER, not the document. A plain per-doc hash
   * split puts near-duplicates of training documents into the test set
   * (the eval-contamination failure mode dedup reports exist to
   * catch); here every doc's split key is its cluster root from
   * `pairs` (its own id when unclustered), so a cluster lands entirely
   * on one side by construction.
   *
   * Scale: [[Dedup.connectedComponents]] over the (small) pair list,
   * one left join of the slim (id, root) map onto the corpus, then the
   * map-only hash cut of [[sampleByHashFraction]] on the split key.
   * Bodies stream through once; nothing about the split re-shuffles
   * the corpus.
   */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                       testFraction: Double): DataFrame = {
    require(testFraction > 0.0 && testFraction < 1.0,
      s"testFraction must be in (0, 1), got $testFraction")
    val cc = graft.ops.Dedup.connectedComponents(pairs).select(
      col("id").as("__ls_id"), col("component").as("__ls_root"))
    val cut = (testFraction * 1000000007L).toLong
    df.join(cc, df(idCol).cast(org.apache.spark.sql.types.LongType)
        === col("__ls_id"), "left")
      .withColumn("__ls_key", coalesce(col("__ls_root"),
        df(idCol).cast(org.apache.spark.sql.types.LongType)))
      .withColumn("split",
        when(Hashing.mulHash(col("__ls_key")) < cut, lit("test"))
          .otherwise(lit("train")))
      .drop("__ls_id", "__ls_root", "__ls_key")
  }

  /**
   * Benchmark decontamination: flag corpus documents sharing at least
   * `threshold` of their distinct word n-grams with a benchmark set —
   * the standard eval-leakage check before pre-training.
   *
   * Scale shape: benchmark n-gram sets are orders of magnitude smaller
   * than the corpus → broadcast the distinct benchmark grams; the
   * corpus-side explode+join is then MAP-ONLY (no shuffle of the
   * exploded grams), and the only shuffle is the per-doc hit count —
   * (id, n_grams) pairs with map-side partial counts. Gram hashing is
   * one native pass ([[graft.functions.NativeExpressions.modNgramHashes]],
   * SQL-mirrorable so the whole report is oracle-checked).
   */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          textCol: String, idCol: String,
                          n: Int = 3, threshold: Double = 0.5): DataFrame = {
    def grams(df: DataFrame): org.apache.spark.sql.Column =
      array_distinct(graft.functions.NativeExpressions
        .modNgramHashes(TextOps.tokens(col(textCol)), n))
    val bench = benchmark.select(explode(grams(benchmark)).as("__g")).distinct()
    corpus
      .select(col(idCol).cast(org.apache.spark.sql.types.LongType).as(idCol),
        grams(corpus).as("__gs"))
      .select(col(idCol), size(col("__gs")).as("n_grams"),
        explode(col("__gs")).as("__g"))
      .join(broadcast(bench), "__g")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
      .where(col("contamination") >= threshold)
  }

  /**
   * [[contaminationReport]]'s Bloom-prefilter twin, for benchmark gram
   * sets too large to broadcast as an exact hash relation. Spark's
   * runtime-filter Bloom aggregate builds a FIXED-SIZE bitset over the
   * benchmark grams (`numBits` bounds the broadcast no matter how many
   * grams — a 10⁹-gram eval suite is ~150 MB of bits at 1% fp vs many
   * GB as an exact set); the corpus side then drops non-member grams
   * MAP-SIDE via `might_contain` before the exact verify join, so only
   * Bloom survivors ever reach a shuffle. The output is IDENTICAL to
   * [[contaminationReport]]: Bloom false positives are eliminated by
   * the verify join, and Bloom has no false negatives — the bitset is
   * purely a pruning device, never a source of truth.
   *
   * The verify join carries NO broadcast hint — that is the point of
   * this twin. When the bench gram set fits under
   * `autoBroadcastJoinThreshold`, Catalyst/AQE broadcasts it anyway;
   * when it doesn't (the motivating 10⁹-gram case), the join degrades
   * to a shuffled hash join whose corpus side is already Bloom-pruned
   * to the survivors, so the shuffle moves hits + false positives, not
   * the corpus. Forcing a broadcast here would re-create exactly the
   * OOM the bitset exists to avoid.
   */
  def contaminationReportBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3, threshold: Double = 0.5,
      expectedGrams: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    def grams(df: DataFrame): org.apache.spark.sql.Column =
      array_distinct(graft.functions.NativeExpressions
        .modNgramHashes(TextOps.tokens(col(textCol)), n))
    val bench = benchmark.select(explode(grams(benchmark)).as("__g")).distinct()
    val bloom = bench.agg(GraftSqlBridge
      .bloomFilterAgg(col("__g"), expectedGrams, numBits).as("__bf"))
    corpus
      .select(col(idCol).cast(org.apache.spark.sql.types.LongType).as(idCol),
        grams(corpus).as("__gs"))
      .select(col(idCol), size(col("__gs")).as("n_grams"),
        explode(col("__gs")).as("__g"))
      .where(GraftSqlBridge.mightContain(
        GraftSqlBridge.scalarSubquery(bloom), col("__g")))
      .join(bench, "__g")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
      .where(col("contamination") >= threshold)
  }

  /**
   * Sliding-window token chunking: split each document into chunks of
   * `chunkSize` whitespace tokens with `overlap` tokens shared between
   * consecutive chunks — the context-window packing step before
   * tokenization in a pre-training pipeline. Chunk starts are
   * 1, 1+stride, 1+2·stride, … (stride = chunkSize − overlap) up to the
   * token count, so the final chunk may be short (and, with overlap,
   * may be a suffix of its predecessor — callers that can't use short
   * tails filter on `n_tokens`). Zero-token documents produce no rows.
   *
   * Scale: map-only — tokenize, explode the (few) starts, slice. No
   * shuffle; output rows ≈ input tokens / stride regardless of document
   * skew, and the token array is built once per document, not per chunk.
   */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = TextOps.tokens(col(textCol))
    val starts = when(size(col("__tk")) === 0,
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)))
      .otherwise(sequence(lit(1), size(col("__tk")), lit(stride)))
    df.select(col(idCol), toks.as("__tk"))
      .select(col(idCol), col("__tk"), posexplode(starts))
      .select(col(idCol),
        col("pos").cast(org.apache.spark.sql.types.LongType).as("chunk_idx"),
        size(slice(col("__tk"), col("col"), lit(chunkSize)))
          .cast(org.apache.spark.sql.types.LongType).as("n_tokens"),
        array_join(slice(col("__tk"), col("col"), lit(chunkSize)), " ")
          .as("chunk"))
  }

  /**
   * Per-group top-k rows (domain quotas, per-source best-documents):
   * rank rows inside each group by `order` (ties MUST be broken by the
   * caller's last order column for deterministic output) and keep
   * `k`. One shuffle on the group key; the rank is a row_number inside
   * the sorted partition.
   *
   * Scale: fine whenever a single group's rows fit one task (the
   * window sorts per group, and with AQE a skewed group still sorts in
   * one partition). For k ≪ group size over degenerate groups, put a
   * cheap pre-filter in front (e.g. a quality floor) — a per-partition
   * partial top-k would need a typed aggregator per row shape, which
   * this generic DataFrame surface deliberately avoids.
   */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[org.apache.spark.sql.Column], k: Int,
                   rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast(
        org.apache.spark.sql.types.LongType))
      .where(col(rankCol) <= k)
  }

  /**
   * Per-group top FRACTION (the relative twin of [[topKPerGroup]]):
   * keep the best `ceil(fraction · groupSize)` rows of each group —
   * "top quartile per language" style gates where group sizes differ
   * by orders of magnitude and a fixed k would over- or under-select.
   * Same single shuffle on the group key; the group size comes from a
   * count window over the already-shuffled partition, not a second
   * aggregate+join pass.
   */
  def topFractionPerGroup(df: DataFrame, groupCols: Seq[String],
                          order: Seq[org.apache.spark.sql.Column],
                          fraction: Double,
                          rankCol: String = "rank"): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    df.withColumn(rankCol, row_number().over(w).cast(
        org.apache.spark.sql.types.LongType))
      .withColumn("__gn", count(lit(1)).over(cw))
      .where(col(rankCol) <= ceil(col("__gn") * lit(fraction)))
      .drop("__gn")
  }

  /**
   * Benchmark decontamination FILTER (the acting twin of
   * [[contaminationReport]]): drop every corpus document whose distinct
   * n-gram overlap with the benchmark meets `threshold`, keep the rest
   * untouched. One left-anti join against the (small) contaminated-id
   * set — document bodies stream through once; the report side only
   * ever shuffles (id, count) pairs.
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String,
                    n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val bad = contaminationReport(corpus, benchmark, textCol, idCol, n,
      threshold).select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /**
   * Sink: write the curated corpus as parquet partitioned by predicted
   * language. `repartition(lang, hash(id))` gives each language
   * `filesPerLang` writer tasks — directory-partitioned output WITHOUT
   * the classic partitionBy small-files explosion (every task would
   * otherwise open a file per language it sees). Readers prune whole
   * language directories; tune `filesPerLang` so files land near the
   * 128-512 MB sweet spot at the target scale.
   */
  def writeCurated(docs: DataFrame, minQuality: Double, path: String,
                   filesPerLang: Int = 4): Unit =
    curatedCorpus(docs, minQuality)
      .withColumn("lang_pred", TextOps.langIdF(col("__tf")))
      .drop("__tf")
      .repartition(col("lang_pred"),
        pmod(xxhash64(col("doc_id")), lit(filesPerLang)))
      .write.mode("overwrite")
      .partitionBy("lang_pred")
      .parquet(path)

  /**
   * DSIR-style importance weights (Xie et al., NeurIPS 2023,
   * arXiv:2302.03169): score each raw-corpus document by the
   * log-likelihood ratio of its token bag under the TARGET unigram
   * distribution vs the RAW distribution — the embedding-free way to
   * steer a 100 TB crawl toward a quality/domain target.
   *
   * `buckets > 0` hashes tokens into that many bins (the paper's
   * hashed-n-gram trick — bounds the feature model at the cost of
   * collisions, and makes the delta map broadcastable by construction);
   * `buckets = 0` keeps exact token identity, the SQL-mirrorable oracle
   * mode (the d04 / d04_prod convention). Laplace (+1) smoothing over
   * the UNION vocabulary keeps target-unseen features finite.
   *
   * Returns (idCol, n_tokens, log_ratio); zero-token documents are
   * absent (no evidence either way — same contract as
   * [[TextOps.unigramLogLikelihood]]).
   *
   * Scale shape: two token-count aggregations (shuffle ∝ vocabulary or
   * `buckets`, map-side combine), one full-outer merge of the two
   * count maps into the per-feature delta, a join of the raw token
   * stream against that map (broadcast-sized when bucketed), and one
   * per-doc partial-agg sum — tokens shuffle once by feature and once
   * by doc id; bodies never move. The three totals are driver scalars,
   * model-sized like the centroid collects.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String, buckets: Int = 0): DataFrame = {
    def feats(df: DataFrame, withId: Boolean): DataFrame = {
      val t = explode(TextOps.tokens(col(textCol))).as("__tok")
      val base = if (withId) df.select(col(idCol), t) else df.select(t)
      if (buckets > 0)
        base.select((if (withId) Seq(col(idCol)) else Seq.empty) :+
          pmod(xxhash64(col("__tok")), lit(buckets.toLong)).as("__f"): _*)
      else base.withColumnRenamed("__tok", "__f")
    }
    val rawToks = feats(raw, withId = true)
    val rawCnt = rawToks.groupBy("__f").agg(count(lit(1)).as("__cr"))
    val tgtCnt = feats(target, withId = false)
      .groupBy("__f").agg(count(lit(1)).as("__ct"))
    val m = rawCnt.join(tgtCnt, Seq("__f"), "full_outer")
      .select(col("__f"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    val g = m.agg(sum("__cr").as("r"), sum("__ct").as("t"),
      count(lit(1)).as("v")).collect()(0)
    val (totR, totT, v) = (g.getLong(0), g.getLong(1), g.getLong(2))
    val delta = m.select(col("__f"),
      (log((col("__ct") + lit(1.0)) / lit((totT + v).toDouble)) -
        log((col("__cr") + lit(1.0)) / lit((totR + v).toDouble))).as("__d"))
    rawToks.join(delta, Seq("__f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__d")).as("log_ratio"))
  }

  /**
   * Mixture plan: given target corpus SHARES per group (language,
   * source, …) and a total token budget, compute per group the
   * available tokens, the token target, the deterministic sampling
   * rate `min(1, target/available)` and a deficit flag (available <
   * target — the group needs upsampling/repetition, a decision left
   * to the caller). Groups absent from `targetShares` get share 0.
   * One partial-agg shuffle of (group, count, tokenSum) cells — the
   * whole plan is groups-sized.
   */
  def mixturePlan(docs: DataFrame, textCol: String, groupCol: String,
                  targetShares: Map[String, Double],
                  budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val shares = typedLit(targetShares)
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol))).as("avail_tokens"))
      .withColumn("target_tokens",
        coalesce(element_at(shares, col(groupCol)), lit(0.0)) *
          lit(budgetTokens.toDouble))
      .withColumn("rate",
        least(lit(1.0), col("target_tokens") / col("avail_tokens")))
      .withColumn("deficit", col("target_tokens") > col("avail_tokens"))
  }

  /**
   * Per-group exact quantile report: for each group, `percentile_disc`
   * of `valueCol` at each requested p — the distribution fingerprint
   * that drives length-outlier gates, shard sizing and SF tuning
   * (p50/p99 doc lengths per source, session lengths per cohort, …).
   * Output: (groupCol, p, q) exploded, one row per group × p.
   *
   * Scale: ONE partially-merged aggregation — the engine
   * `PercentileDisc` buffers (value → count), so a group's state is
   * its distinct-value histogram, never a collect_list; all requested
   * quantiles share that single buffer pass and the explode is in-row
   * on the groups-sized result. Discrete percentiles return an
   * existing value — integer inputs stay exact cross-engine.
   */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"ps must be in (0,1]: $ps")
    import org.apache.spark.sql.GraftSqlBridge
    // percentile_disc returns an EXISTING value, so casting its double
    // back to the input type is lossless — and keeps integer-typed
    // inputs integer-typed in the report (the SQL-standard behavior)
    val vType = df.schema(valueCol).dataType
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      GraftSqlBridge.percentileDisc(col(valueCol), p).cast(vType).as(s"__q$i")
    }
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(ps.zipWithIndex.map {
        case (p, i) => struct(lit(p).as("p"), col(s"__q$i").as("q"))
      }: _*)).as("__pq"))
      .select(col(groupCol), col("__pq.p").as("p"), col("__pq.q").as("q"))
  }

  /**
   * Per-group winsorization: clip `valueCol` to its group's exact
   * [`lo`, `hi`] discrete percentiles — the standard outlier guard
   * before a numeric column feeds features or loss weights (fat-tail
   * values stop dominating sums without dropping rows). Thresholds
   * are EXISTING values from the exact percentile_disc buffer, so the
   * clipped column is bit-exact cross-engine with no rounding.
   *
   * Scale: one [[groupQuantiles]] aggregation (groups-sized result),
   * broadcast back, and a map-side least/greatest — the corpus never
   * re-shuffles for the clip.
   */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo < hi, s"lo ($lo) must be < hi ($hi)")
    val th = groupQuantiles(df, groupCol, valueCol, Seq(lo, hi))
      .groupBy(col(groupCol))
      .agg(min(when(col("p") === lo, col("q"))).as("__lo"),
        min(when(col("p") === hi, col("q"))).as("__hi"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /**
   * Production twin of [[groupQuantiles]]: `percentile_approx`
   * (Greenwald–Khanna sketch) instead of the exact distinct-value
   * histogram. The exact buffer is bounded by the DISTINCT values per
   * group — fine for integer doc lengths, unbounded for continuous
   * scores at 100 TB; the sketch is O(accuracy) per group regardless
   * of cardinality, with rank error ≤ n/accuracy (the returned value's
   * rank is within that of the target rank). Same oracle-mode /
   * production-mode split as d04_simhash vs d04_simhash_prod: oracled
   * entries (t23, e13) keep the exact twin, production pipelines on
   * continuous columns use this one.
   *
   * Output schema matches [[groupQuantiles]] exactly — (groupCol, p, q)
   * with q in the input column's type (the sketch returns an existing
   * value, so the cast is lossless) — so the twins are drop-in
   * interchangeable.
   */
  def groupQuantilesApprox(df: DataFrame, groupCol: String,
                           valueCol: String, ps: Seq[Double],
                           accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"ps must be in (0,1]: $ps")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val vType = df.schema(valueCol).dataType
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("__qs"))
      .select(col(groupCol), explode(array(ps.zipWithIndex.map {
        case (p, i) => struct(lit(p).as("p"),
          element_at(col("__qs"), i + 1).cast(vType).as("q"))
      }: _*)).as("__pq"))
      .select(col(groupCol), col("__pq.p").as("p"), col("__pq.q").as("q"))
  }

  /**
   * Production twin of [[winsorize]] on the [[groupQuantilesApprox]]
   * sketch: identical clip plan (groups-sized threshold broadcast +
   * map-side least/greatest, no corpus re-shuffle), but thresholds
   * come from the GK sketch, so the clipped values can differ from the
   * exact twin by at most the sketch's rank error at the lo/hi ranks.
   * Use when `valueCol` is continuous (scores, ratios) — the exact
   * percentile buffer would grow with distinct-value count there.
   */
  def winsorizeApprox(df: DataFrame, groupCol: String, valueCol: String,
                      lo: Double = 0.01, hi: Double = 0.99,
                      accuracy: Int = 10000): DataFrame = {
    require(lo < hi, s"lo ($lo) must be < hi ($hi)")
    val th = groupQuantilesApprox(df, groupCol, valueCol, Seq(lo, hi),
      accuracy)
      .groupBy(col(groupCol))
      .agg(min(when(col("p") === lo, col("q"))).as("__lo"),
        min(when(col("p") === hi, col("q"))).as("__hi"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /**
   * Temperature-scaled mixture plan (the multilingual-pretraining
   * rebalancing rule, Conneau & Lample '19): instead of hand-set
   * shares, share_g ∝ avail_g^alpha — alpha = 1 reproduces the natural
   * distribution, alpha → 0 approaches uniform, intermediate values
   * (0.3–0.7 in practice) upsample the tail without drowning the head.
   * Same output schema as [[mixturePlan]] (plus the computed `share`),
   * so [[applyMixture]] consumes it unchanged. The normalizer is a
   * 1-row broadcast; everything else is the groups-sized plan.
   */
  def temperatureMixturePlan(docs: DataFrame, textCol: String,
                             groupCol: String, alpha: Double,
                             budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val avail = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol))).as("avail_tokens"))
    val weight = pow(col("avail_tokens").cast("double"), lit(alpha))
    val z = avail.agg(sum(weight).as("__z"))
    avail.crossJoin(broadcast(z))
      .withColumn("share", weight / col("__z"))
      .withColumn("target_tokens", col("share") * lit(budgetTokens.toDouble))
      .withColumn("rate",
        least(lit(1.0), col("target_tokens") / col("avail_tokens")))
      .withColumn("deficit", col("target_tokens") > col("avail_tokens"))
      .drop("__z")
  }

  /**
   * Apply a [[mixturePlan]]: keep each document iff its id hash falls
   * under its group's rate cut — the per-group generalization of
   * [[sampleByHashFraction]]. The plan broadcasts (groups-sized) and
   * the cut is evaluated map-side: sampling 100 TB to a target
   * mixture is one broadcast join + filter, zero corpus shuffles,
   * deterministic across reruns.
   */
  def applyMixture(docs: DataFrame, idCol: String, groupCol: String,
                   plan: DataFrame): DataFrame =
    docs.join(broadcast(plan.select(col(groupCol), col("rate"))),
        Seq(groupCol))
      .where(Hashing.mulHash(col(idCol)) <
        floor(col("rate") * lit(1000000007L)).cast("long"))
      .drop("rate")

  /**
   * Repetition-aware mixture application — the upsampling half that
   * [[applyMixture]]'s rate cap leaves to the caller: each document is
   * emitted `floor(r)` times plus one more iff its id hash falls under
   * the fractional remainder, where r = target/available tokens of its
   * group (r < 1 reproduces the plain hash-cut downsample; r > 1 —
   * deficit groups — turns into whole epochs + a fractional epoch).
   * Expected group tokens ≈ target on both sides of 1. Output one row
   * per (group, id, copy), copy ∈ [1, n_copies] — the exploded form
   * training-shard writers consume directly.
   *
   * Scale: the plan broadcasts (groups-sized), the copy count is a
   * map-side expression and the explode fans out AT the map — zero
   * corpus shuffles, deterministic across reruns, and a doc's copies
   * stay in its partition (shard writers see them together).
   */
  def applyMixtureWithRepetition(docs: DataFrame, idCol: String,
                                 groupCol: String, plan: DataFrame): DataFrame = {
    val r = plan.select(col(groupCol),
      (col("target_tokens") / col("avail_tokens")).as("__r"))
    docs.join(broadcast(r), Seq(groupCol))
      .withColumn("__base", floor(col("__r")).cast("long"))
      .withColumn("__extra",
        (Hashing.mulHash(col(idCol)) <
          floor((col("__r") - floor(col("__r"))) * lit(1000000007L))
            .cast("long")).cast("long"))
      .withColumn("__n", col("__base") + col("__extra"))
      .where(col("__n") > 0)
      .select(col(groupCol), col(idCol),
        explode(sequence(lit(1L), col("__n"))).as("copy"))
  }

  /**
   * Gumbel-top-n selection over [[dsirWeights]] output: sampling
   * WITHOUT replacement with inclusion odds ∝ exp(log_ratio /
   * temperature), derandomized — the Gumbel noise `-ln(-ln u)` draws
   * its uniform from the id's multiplicative hash, so reruns (and SQL
   * oracles) reproduce the identical sample. Global top-n compiles to
   * TakeOrdered (per-partition bounded heaps + driver merge of n×
   * partitions rows), never a full sort. Low temperature → argmax-like
   * (quality skim); high → near-uniform.
   */
  def dsirSelect(weights: DataFrame, idCol: String, n: Int,
                 temperature: Double = 1.0): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    val u = (Hashing.mulHash(col(idCol)).cast("double") + lit(1.0)) /
      lit(1000000008.0)
    weights
      .withColumn("__score", col("log_ratio") / lit(temperature) - log(-log(u)))
      .orderBy(col("__score").desc, col(idCol))
      .limit(n)
      .drop("__score")
  }

  /**
   * Deterministic training-shard layout: assign every row a shard
   * (`hash(id) mod nShards`) and a stable position within its shard
   * (ordered by the id hash, id tie-break) — the "global shuffle" a
   * training run needs (decorrelate neighboring source documents),
   * WITHOUT a global sort. Output: input columns + (`shard`, `pos`),
   * pos 0-based.
   *
   * Scale shape: exactly one hash-partition shuffle on the shard key
   * and a per-shard window — no range exchange, no global ordering
   * ever materializes (each shard is independently ordered, which is
   * what a data-parallel trainer consumes: worker w reads shard w in
   * pos order). The hash-derived order is reproducible across runs,
   * partitionings, and engines; re-sharding with a different seed is a
   * different `nShards`/hash, not a data move of the old layout.
   */
  def shardLayout(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(Hashing.mulHash(col(idCol)), col(idCol))
    df.withColumn("shard", Hashing.mulHash(col(idCol)) % lit(nShards.toLong))
      .withColumn("pos", row_number().over(w).cast("long") - lit(1L))
  }

  /**
   * Sequence-length bucketed batch assembly: band each document by its
   * whitespace token count into the first bucket boundary ≥ count
   * (fixed ladder, the way training stacks pick pad lengths), order
   * within a band by the id hash (deterministic shuffle), and cut
   * batches of `batchSize` rows. Returns one row per BATCH:
   * (`bucket`, `batch_id`, `n_rows`, `max_tokens`, `sum_tokens`,
   * `pad_waste`) where pad_waste = n_rows·max_tokens − sum_tokens —
   * the padding tokens the batch burns, the metric bucketing exists to
   * minimize.
   *
   * Boundaries must be ascending; counts above the last boundary land
   * in a terminal overflow band (bucket = last·2 marker). Scale shape:
   * one narrow map for the token count (no tokens materialized —
   * [[TextOps.features]]' fused counter), one shuffle on the band for
   * the window, one partial-aggregated groupBy per batch. Documents
   * never co-shuffle with their bodies: only (band, hash, count) slim
   * rows move.
   */
  def lengthBucketBatches(docs: DataFrame, idCol: String, textCol: String,
                          boundaries: Seq[Int], batchSize: Int): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, s"bad boundaries $boundaries")
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    val nTok = TextOps.tokenCount(col(textCol))
    val band = boundaries.foldRight(lit(boundaries.last.toLong * 2L): org.apache.spark.sql.Column) {
      (b, rest) => when(nTok <= b, lit(b.toLong)).otherwise(rest)
    }
    val slim = docs.select(col(idCol).as("__id"), nTok.as("n_tokens"),
      band.as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(Hashing.mulHash(col("__id")), col("__id"))
    slim.withColumn("batch_id",
        ((row_number().over(w).cast("long") - lit(1L)) / lit(batchSize.toLong))
          .cast("long"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_rows"), max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_waste",
        col("n_rows") * col("max_tokens") - col("sum_tokens"))
  }

  /**
   * Deterministic rate-controlled interleave of sources into ONE
   * training order (stride scheduling): group g's i-th document (hash
   * order) gets virtual time `(i+1)/w_g`, and the global order sorts
   * by virtual time — so every prefix of the stream contains each
   * group at ≈ its weight's rate (a 0.5-weight group appears twice as
   * often as a 0.25 one), instead of the block-concatenated order that
   * makes early training see one source only. Groups missing from
   * `weights` are excluded; weights need not sum to 1 (rates are
   * relative). Ties (equal virtual time) break by (group, id).
   * Output: input columns + `order_pos` (0-based global position).
   *
   * Scale shape: one hash shuffle per-group window for the in-group
   * position, then ONE range exchange for the global order — the
   * write-time cost of materializing a training order, paid once
   * (same contract as the z-order rewrite). The virtual-time key is
   * exact double division of small ints — engine-portable.
   */
  def interleaveSources(df: DataFrame, idCol: String, groupCol: String,
                        weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      s"weights must be non-empty and positive: $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.toSeq.toDF(groupCol, "__w"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(Hashing.mulHash(col(idCol)), col(idCol))
    val keyed = df.join(wDf, Seq(groupCol))
      .withColumn("__vt",
        row_number().over(wg).cast("double") / col("__w"))
    val wGlob = org.apache.spark.sql.expressions.Window
      .orderBy(col("__vt"), col(groupCol), col(idCol))
    keyed
      .withColumn("order_pos", row_number().over(wGlob).cast("long") - 1L)
      .drop("__w", "__vt")
  }

  /**
   * Curation attrition funnel: apply quality gates IN ORDER and report
   * how many documents/tokens survive after each successive gate —
   * the one table a pipeline owner reads to see which filter eats the
   * corpus (t13's per-gate fractions answer "how strict is gate g";
   * this answers "in the shipped ORDER, where does the mass go").
   * Stage 0 is the raw corpus; stage k applies gates 1..k
   * conjunctively. Output: (stage, gate, n_docs, n_tokens, doc_frac,
   * token_frac) with fractions relative to raw.
   *
   * Scale: ONE pass — every per-gate predicate and the cumulative
   * conjunctions evaluate in-row, a single partial-aggregated global
   * aggregate carries 2·(gates+1) counters, and the stage table
   * explodes from that 1-row frame. The corpus is scanned once and
   * never shuffled.
   */
  def curationAttrition(docs: DataFrame, tokenCol: Column,
                        gates: Seq[(String, Column)]): DataFrame = {
    require(gates.nonEmpty, "need at least one gate")
    val conds = gates.scanLeft(lit(true))((acc, g) => acc && g._2)
    val names = "raw" +: gates.map(_._1)
    val aggs = conds.zipWithIndex.flatMap { case (c, i) => Seq(
      sum(when(c, 1L).otherwise(0L)).as(s"__d$i"),
      sum(when(c, tokenCol).otherwise(lit(0L))).as(s"__t$i")) }
    docs.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(i.toLong).as("stage"), lit(n).as("gate"),
          col(s"__d$i").as("n_docs"), col(s"__t$i").as("n_tokens"),
          (col(s"__d$i").cast("double") / col("__d0")).as("doc_frac"),
          (col(s"__t$i").cast("double") / col("__t0")).as("token_frac"))
      }: _*)).as("__s"))
      .select("__s.*")
  }

  /**
   * Curriculum phase assignment: split the corpus into `nPhases`
   * difficulty tiers by EXACT global percentile cutpoints of
   * `scoreCol` (curriculum learning, Bengio et al. 2009 \u2014 train on
   * easy tiers first). Phase i covers scores in (cut_{i-1}, cut_i];
   * a score equal to a cutpoint lands in the LOWER phase, so the
   * assignment is reproducible across engines with no rank
   * tie-breaking. Cutpoints are discrete percentiles (existing
   * values, no interpolation).
   *
   * Scale: one exact-percentile aggregation (a 1-row, nPhases-wide
   * model-sized frame) broadcast back into a map-side comparison
   * chain \u2014 the corpus is never globally sorted and never
   * re-shuffles, unlike an ntile() window which would single-sort
   * 100 TB through one partition chain.
   */
  def curriculumAssign(df: DataFrame, scoreCol: String,
                       nPhases: Int = 4): DataFrame = {
    require(nPhases >= 2, s"nPhases must be >= 2: $nPhases")
    import org.apache.spark.sql.GraftSqlBridge
    val ps = (1 until nPhases).map(_.toDouble / nPhases)
    val cutAggs = ps.zipWithIndex.map { case (p, i) =>
      GraftSqlBridge.percentileDisc(col(scoreCol), p).as(s"__cut$i")
    }
    val cuts = df.agg(cutAggs.head, cutAggs.tail: _*)
    val phase = ps.indices
      .map(i => when(col(scoreCol) > col(s"__cut$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.crossJoin(broadcast(cuts))
      .withColumn("phase", phase)
      .drop(ps.indices.map(i => s"__cut$i"): _*)
  }

  /**
   * Water-filling token-budget allocation across sources: each source
   * asks for `share \u00d7 budget` tokens (share \u221d avail^alpha \u2014 the
   * mixture-flattening exponent), but no source may repeat more than
   * `maxEpochs` times its available tokens; surplus from capped
   * sources redistributes proportionally among the uncapped ones for
   * `rounds` FIXED passes (the iterative water-fill, unrolled so an
   * engine twin reproduces it exactly). The standard budgeted remix
   * when some sources are too small for their target share
   * (epoching caps from Muennighoff et al. 2023, "Scaling
   * Data-Constrained Language Models").
   *
   * Everything after the one per-source aggregation runs on the
   * sources-sized table (model-sized); each round is a broadcast
   * 1-row total + a map over that table. Output per source:
   * avail_tokens, share, alloc_tokens (post-fill), epochs, capped.
   */
  def tokenBudgetFill(docs: DataFrame, groupCol: String, textCol: String,
                      budget: Double, alpha: Double = 0.5,
                      maxEpochs: Double = 4.0, rounds: Int = 3): DataFrame = {
    require(budget > 0 && maxEpochs > 0 && rounds >= 1, "bad parameters")
    val avail = docs.groupBy(col(groupCol))
      .agg(sum(TextOps.tokenCount(col(textCol))).as("avail_tokens"))
    val z = avail.agg(sum(pow(col("avail_tokens").cast("double"),
      lit(alpha))).as("__z"))
    var alloc = avail.crossJoin(broadcast(z))
      .withColumn("share",
        pow(col("avail_tokens").cast("double"), lit(alpha)) / col("__z"))
      .withColumn("__cap", col("avail_tokens").cast("double") * lit(maxEpochs))
      .withColumn("alloc_tokens",
        least(col("share") * lit(budget), col("__cap")))
      .drop("__z")
    for (_ <- 1 to rounds) {
      // leftover budget and the uncapped share mass, as 1-row scalars
      val tot = alloc.agg(
        (lit(budget) - sum(col("alloc_tokens"))).as("__left"),
        sum(when(col("alloc_tokens") < col("__cap"), col("share"))
          .otherwise(lit(0.0))).as("__mass"))
      alloc = alloc.crossJoin(broadcast(tot))
        .withColumn("alloc_tokens",
          when(col("__mass") > 0 && col("alloc_tokens") < col("__cap"),
            least(col("alloc_tokens") +
              col("__left") * col("share") / col("__mass"), col("__cap")))
            .otherwise(col("alloc_tokens")))
        .drop("__left", "__mass")
    }
    alloc.select(col(groupCol), col("avail_tokens"), col("share"),
      col("alloc_tokens"),
      (col("alloc_tokens") / col("avail_tokens").cast("double")).as("epochs"),
      (col("alloc_tokens") >= col("__cap")).as("capped"))
  }

  /**
   * Median/MAD robust outlier scores per group (Hampel's robust
   * z-score; Leys et al. 2013): `rz = (x \u2212 median) / (1.4826\u00b7MAD)`,
   * flagged when |rz| > `cutoff` (3.5 is the classic Hampel bound).
   * Mean/stddev outlier gates break down exactly when outliers are
   * present (the outliers inflate \u03c3 and mask themselves); the
   * median/MAD pair has a 50 % breakdown point. Thresholds are EXACT
   * discrete percentiles (existing values \u2014 cross-engine
   * reproducible); a zero-MAD group (over half the values identical)
   * scores 0 and never flags, by convention.
   *
   * Scale: two grouped exact-percentile aggregations (group-sized
   * frames, the second over |x \u2212 med| after a broadcast join back)
   * and a map-side score \u2014 the corpus shuffles ZERO times beyond the
   * two slim (group, value) aggregations.
   */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  cutoff: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val med = df.groupBy(col(groupCol))
      .agg(GraftSqlBridge.percentileDisc(col(valueCol), 0.5)
        .as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(GraftSqlBridge.percentileDisc(
        abs(col(valueCol) - col("__med")), 0.5).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        when(col("__mad") === 0.0, lit(0.0))
          .otherwise((col(valueCol) - col("__med")) /
            (lit(1.4826) * col("__mad"))))
      .withColumn("is_outlier", abs(col("robust_z")) > lit(cutoff))
      .drop("__med", "__mad")
  }

  /**
   * Equi-width histogram of a numeric column: `nBins` bins spanning
   * the observed [min, max], empty bins zero-filled \u2014 the
   * profiling/dashboard primitive. The top edge closes (x = max lands
   * in the last bin). Bin assignment is a map-side floor over the
   * broadcast 1-row (min, max) frame; identical IEEE ops on both
   * engines make the cut reproducible.
   *
   * Scale: one 1-row min/max aggregate, one map stage, one
   * partial-aggregated groupBy of at most nBins slim rows, and the
   * zero-fill explodes from the SAME 1-row frame \u2014 a corpus-size
   * scan with O(nBins) state.
   */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 20): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1: $nBins")
    val mm = df.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    val w = (col("__hi") - col("__lo")) / lit(nBins.toDouble)
    val counts = df.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0L)).otherwise(
          least(floor((col(valueCol) - col("__lo")) / w),
            lit(nBins.toLong - 1))))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    mm.select(explode(sequence(lit(0L), lit(nBins.toLong - 1))).as("bin"),
        col("__lo"), col("__hi"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (col("__lo") + col("bin") * (col("__hi") - col("__lo"))
          / lit(nBins.toDouble)).as("bin_lo"),
        (col("__lo") + (col("bin") + 1) * (col("__hi") - col("__lo"))
          / lit(nBins.toDouble)).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n_rows"))
  }

  /**
   * Dataset card: the one-table datasheet (Gebru et al. 2021,
   * "Datasheets for Datasets") a corpus release ships with \u2014 size,
   * composition, duplication, quality and length-shape metrics as
   * (metric, value) rows. Everything derives from ONE featurized
   * pass; the exact-dup rate reuses the d-family's content-key
   * convention (distinct text count), and the token percentiles are
   * exact discrete values.
   *
   * Scale: one scan computing per-row features; one global aggregate
   * carrying all counters (count-distinct on text is the only
   * wide-ish state \u2014 swap in approx_count_distinct at 100 TB, the
   * documented twin convention); metric rows explode from the 1-row
   * aggregate.
   */
  def datasetCard(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val scored = docs.select(col("text"), col("lang"), col("source"),
      col("n_chars"),
      TextOps.tokenCount(col("text")).as("__tok"),
      TextOps.qualityScore(col("text"), col("n_chars")).as("__q"))
    val agg = scored.agg(
      count(lit(1)).as("__n"),
      sum(col("__tok")).as("__toks"),
      countDistinct(col("source")).as("__srcs"),
      countDistinct(col("lang")).as("__langs"),
      countDistinct(col("text")).as("__dtext"),
      avg(col("__q")).as("__mq"),
      GraftSqlBridge.percentileDisc(col("__tok"), 0.5).as("__p50"),
      GraftSqlBridge.percentileDisc(col("__tok"), 0.95).as("__p95"),
      avg(col("n_chars").cast("double")).as("__mc"))
    val metrics: Seq[(String, Column)] = Seq(
      "n_docs" -> col("__n").cast("double"),
      "n_tokens" -> col("__toks").cast("double"),
      "n_sources" -> col("__srcs").cast("double"),
      "n_langs" -> col("__langs").cast("double"),
      "exact_dup_rate" ->
        round(lit(1.0) - col("__dtext").cast("double") / col("__n"), 6),
      "mean_quality" -> round(col("__mq"), 6),
      "p50_tokens" -> col("__p50").cast("double"),
      "p95_tokens" -> col("__p95").cast("double"),
      "mean_chars" -> round(col("__mc"), 6))
    agg.select(explode(array(metrics.map { case (n, c) =>
        struct(lit(n).as("metric"), c.as("value")) }: _*)).as("__m"))
      .select("__m.*")
  }

  /**
   * Budget-bounded tokenizer-training sample: take documents in
   * deterministic hash order until the cumulative token count reaches
   * `tokenBudget` \u2014 the corpus slice a BPE/unigram tokenizer trains
   * on. Hash order makes the sample a reproducible pseudo-random
   * draw (the [[stratifiedSample]] convention); the document that
   * CROSSES the budget boundary is kept (start-before-boundary, the
   * packTokenBins rule), so the sample is never short.
   *
   * Scale note: the exact cumulative cut is a global hash-ordered
   * window \u2014 right for the oracle-checked form; at 100 TB use
   * [[sampleByHashFraction]] with fraction \u2248 budget/corpus_tokens as
   * the map-only production twin and accept \u00b1LLN wobble, or
   * two-pass: hash-bucket histogram \u2192 pick the cutting bucket \u2192
   * window only inside it.
   */
  def tokenizerSample(docs: DataFrame, textCol: String, idCol: String,
                      tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1: $tokenBudget")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Hashing.mulHash(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("n_tokens", TextOps.tokenCount(col(textCol)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") - col("n_tokens") < tokenBudget)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /**
   * Eval-integrity canary harness: plant exact copies of the
   * benchmark into the corpus under offset ids, run the n-gram
   * [[contaminationReport]], and report whether decontamination
   * CATCHES its own plants \u2014 recall on known contamination, the
   * self-test a leakage pipeline ships with (a decontamination stage
   * that cannot find verbatim plants is misconfigured; incidental
   * flags measure the threshold's collateral). Contract: corpus and
   * benchmark ids are < `idOffset`. Output one row: (n_planted,
   * n_caught, n_incidental, recall).
   *
   * Scale: one benchmark-sized plant union + the contamination
   * report's broadcast-gram join; counters reduce to a 1-row frame.
   */
  def canaryRecall(corpus: DataFrame, benchmark: DataFrame,
                   textCol: String, idCol: String, n: Int = 3,
                   threshold: Double = 0.5,
                   idOffset: Long = 900000L): DataFrame = {
    val planted = benchmark.withColumn(idCol, col(idCol) + idOffset)
    val testCorpus = corpus.unionByName(planted)
    val flagged = contaminationReport(testCorpus, benchmark, textCol,
        idCol, n, threshold)
      .select(col(idCol))
    val nPlanted = benchmark.agg(count(lit(1)).as("n_planted"))
    val counts = flagged.agg(
      sum(when(col(idCol) >= idOffset, 1L).otherwise(0L)).as("__c"),
      sum(when(col(idCol) < idOffset, 1L).otherwise(0L)).as("__i"))
    nPlanted.crossJoin(counts)
      .select(col("n_planted"),
        coalesce(col("__c"), lit(0L)).as("n_caught"),
        coalesce(col("__i"), lit(0L)).as("n_incidental"),
        (coalesce(col("__c"), lit(0L)).cast("double") /
          col("n_planted")).as("recall"))
  }

  /**
   * Leave-one-out source valuation: for each source, the change in the
   * corpus's mean quality if that source were removed \u2014 the cheapest
   * member of the data-valuation family (the additive special case of
   * Shapley over the mean-quality utility): value_s = mean(all) \u2212
   * mean(all \u2216 s). Positive = the source LIFTS corpus quality;
   * magnitude scales with both its quality gap and its share. The
   * first-pass ranking before paying for per-source ablation training
   * runs. A source that IS the whole corpus reports 0 by convention.
   *
   * Scale: one scoring scan \u2192 per-source partial-agg sums; totals are
   * a 1-row broadcast; the LOO mean is pure arithmetic on the
   * sources-sized frame \u2014 no per-source re-scan, which is the whole
   * point of the additive shortcut.
   */
  def sourceLooValue(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("source"),
      TextOps.qualityScore(col("text"), col("n_chars")).as("__q"))
    val per = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__q")).as("__sq"))
    val tot = per.agg(sum(col("n_docs")).as("__n"), sum(col("__sq")).as("__s"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        (col("__sq") / col("n_docs")).as("avg_quality"),
        (col("__s") / col("__n")).as("__mean"),
        when(col("__n") === col("n_docs"), lit(0.0))
          .otherwise((col("__s") / col("__n")) -
            (col("__s") - col("__sq")) / (col("__n") - col("n_docs")))
          .as("loo_delta"))
      .drop("__mean")
  }

  /**
   * Per-group Pearson AND Spearman correlation of two numeric
   * columns \u2014 the metric-sanity readout (does length predict
   * quality? does perplexity track dup rate?) with the rank variant
   * robust to monotone-nonlinear relationships. Pearson comes from
   * the five explicit sums (no engine corr() variance-convention
   * surprises \u2014 the degreeAssortativity discipline); Spearman is
   * Pearson over row_number ranks with the id as tie-break \u2014 rank
   * sums are assignment-invariant under ties ONLY for the tied-value
   * averages, so with id tie-break the coefficient is the
   * deterministic "ranked by (value, id)" variant, reproducible
   * cross-engine (documented; the averaged-ties variant needs a
   * second window).
   *
   * Scale: one group-key shuffle shared by both rank windows
   * (groups-sized partitions), one partial-agg reduce per group.
   */
  def groupCorrelation(df: DataFrame, groupCol: String, xCol: String,
                       yCol: String, idCol: String): DataFrame = {
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x"), col(idCol))
    val wy = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__y"), col(idCol))
    val base = df.select(col(groupCol), col(idCol),
        col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .withColumn("__rx", row_number().over(wx).cast("double"))
      .withColumn("__ry", row_number().over(wy).cast("double"))
    def pearson(x: Column, y: Column, n: Column,
                sx: Column, sy: Column, sxy: Column,
                sxx: Column, syy: Column): Column =
      (n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__rx")).as("__srx"), sum(col("__ry")).as("__sry"),
        sum(col("__rx") * col("__ry")).as("__srxy"),
        sum(col("__rx") * col("__rx")).as("__srxx"),
        sum(col("__ry") * col("__ry")).as("__sryy"))
      .select(col(groupCol), col("n_rows"),
        pearson(col("__x"), col("__y"), col("n_rows").cast("double"),
          col("__sx"), col("__sy"), col("__sxy"), col("__sxx"),
          col("__syy")).as("pearson"),
        pearson(col("__rx"), col("__ry"), col("n_rows").cast("double"),
          col("__srx"), col("__sry"), col("__srxy"), col("__srxx"),
          col("__sryy")).as("spearman"))
  }

  /**
   * Filter-cascade funnel report (round 11): the observability tool
   * behind quality-filter tuning. Given ORDERED boolean stages over a
   * corpus, one row per stage with the sequential funnel — `n_in`
   * (rows surviving every PRIOR stage), `n_pass`, `pass_rate` — plus
   * `n_unique_reject`: rows THIS stage alone rejects (they pass every
   * other stage — the stage's marginal value in the cascade) and
   * `standalone_rate`: the stage's pass rate over the WHOLE corpus.
   * A stage whose unique rejections are ~0 is redundant where it
   * stands; a funnel pass rate far above the standalone rate means
   * earlier stages shadow it (they already reject what it would).
   *
   * Scale: ONE pass — every stage's flag computes map-side in a
   * single projection (null predicates count as failures), and the
   * whole report is one aggregate over flag products; the per-stage
   * reshape is a union of projections over the 1-row aggregate.
   * Nothing corpus-sized shuffles, nothing collects.
   */
  def filterCascadeReport(df: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "filterCascadeReport: no stages")
    require(stages.map(_._1).distinct.size == stages.size,
      "filterCascadeReport: duplicate stage names")
    val n = stages.size
    val flags = stages.map { case (_, c) =>
      when(c, lit(1L)).otherwise(lit(0L)) }
    def product(cols: Seq[Column]): Column =
      cols.reduceOption(_ * _).getOrElse(lit(1L))
    val aggExprs =
      // n_in(k) = survivors of stages 0..k-1 (k = 0 → corpus size)
      (0 to n).map(k => sum(product(flags.take(k))).as(s"__in_$k")) ++
      // unique_reject(k) = fails k, passes every other stage
      (0 until n).map(k => sum((lit(1L) - flags(k)) *
        product(flags.zipWithIndex.collect {
          case (f, j) if j != k => f })).as(s"__u_$k")) ++
      // standalone pass count of stage k over the whole corpus
      (0 until n).map(k => sum(flags(k)).as(s"__s_$k"))
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
      .localCheckpoint(false)
    stages.zipWithIndex.map { case ((name, _), k) =>
      one.select(lit(k + 1).as("stage_no"), lit(name).as("stage"),
        coalesce(col(s"__in_$k"), lit(0L)).as("n_in"),
        coalesce(col(s"__in_${k + 1}"), lit(0L)).as("n_pass"),
        when(col(s"__in_$k") > 0,
            col(s"__in_${k + 1}").cast("double") / col(s"__in_$k"))
          .otherwise(lit(null)).as("pass_rate"),
        coalesce(col(s"__u_$k"), lit(0L)).as("n_unique_reject"),
        when(col("__in_0") > 0,
            col(s"__s_$k").cast("double") / col("__in_0"))
          .otherwise(lit(null)).as("standalone_rate"))
    }.reduce(_ unionByName _)
  }
}
