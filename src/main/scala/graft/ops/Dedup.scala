package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines, designed for the
 * 100 TB regime:
 *
 *  - [[exact]]: hash-groupBy. One shuffle on a 64-bit content hash (not
 *    the full text), map-side partial aggregation, then a semi-join back
 *    — the document bodies never shuffle.
 *  - [[ngramJaccardPairs]]: all-pairs n-gram Jaccard *within explicit
 *    blocks* — quadratic, so only ever run inside small buckets.
 *  - [[minhashLshPairs]]: MinHash signatures + LSH banding. Linear scan
 *    to signatures, shuffle only (band, bandHash) buckets, candidate
 *    pairs verified with exact Jaccard. The scale path for near-dedup.
 *  - [[simhashPairs]]: 64-bit SimHash + 4×16-bit block blocking, Hamming
 *    verification (Manku et al., WWW'07 style).
 *  - [[embeddingNearDupPairs]]: cosine near-dup over embeddings, blocked
 *    by a caller-supplied key.
 *
 * All signature computation is built-in higher-order functions (codegen,
 * no UDFs); the only shuffles are the bucket groupings, whose keys are
 * small fixed-width values.
 */
object Dedup {

  // ---------------------------------------------------------------- exact

  /**
   * Exact dedup: keeps the row with the minimum `idCol` per distinct
   * `textCol`. Returns (id, n_dups) per kept row.
   *
   * Scale shape: group on a 128-bit content key (two independently
   * seeded xxhash64 values) so the shuffle carries 16 bytes per row and
   * the bodies never move. 64 bits alone WOULD collide at 100 TB
   * (birthday bound: ~10^11 docs ⇒ hundreds of expected collisions);
   * 128 bits pushes that to ~10^-17.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h1 = xxhash64(col(textCol))
    val h2 = xxhash64(lit(0x5eed), col(textCol)) // independent second hash
    df.select(h1.as("__h1"), h2.as("__h2"),
        col(idCol).cast(LongType).as("__id"))
      .groupBy(col("__h1"), col("__h2"))
      .agg(min("__id").as(idCol), count(lit(1)).as("n_dups"))
      .select(col(idCol), col("n_dups"))
  }

  /**
   * The deduplicated corpus itself: full rows of `df` whose id is the
   * kept (minimum) id per distinct text. Broadcast-friendly semi-join of
   * the kept-id set back onto the corpus — bodies stream once.
   */
  def deduplicate(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val kept = exact(df, textCol, idCol).select(col(idCol))
    df.join(kept,
      df(idCol).cast(LongType) === kept(idCol).cast(LongType), "left_semi")
  }

  /**
   * Incremental ingestion dedup: full rows of `incoming` whose content
   * is NOT already in `existing` AND is the first (minimum-id) copy
   * within the new batch — the shape of a daily crawl landing next to
   * an already-deduplicated corpus, where re-running [[deduplicate]]
   * over corpus+batch would re-shuffle the whole corpus for a 0.1%
   * delta. Here the corpus side is reduced map-side to distinct 16-byte
   * content keys before its (key-only) shuffle, the anti-join carries
   * no bodies, and the batch self-dedups independently.
   *
   * Null text is content-less and never matches the corpus: without
   * the null filter, `xxhash64(null)` collapses to a seed constant on
   * BOTH sides and one null-text corpus row would silently drop every
   * null-text incoming row (SQL text equality never matches nulls).
   * Within the batch itself, nulls follow [[deduplicate]]'s GROUP BY
   * semantics (they group together), matching the d01 oracle.
   */
  def dedupAgainst(incoming: DataFrame, existing: DataFrame,
                   textCol: String, idCol: String): DataFrame = {
    val ex = existing
      .where(col(textCol).isNotNull)
      .select(
        xxhash64(col(textCol)).as("__eh1"),
        xxhash64(lit(0x5eed), col(textCol)).as("__eh2")).distinct()
    deduplicate(incoming, textCol, idCol)
      .withColumn("__h1", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(lit(0x5eed), col(textCol)))
      .join(ex, col("__h1") === col("__eh1") && col("__h2") === col("__eh2"),
        "left_anti")
      .drop("__h1", "__h2")
  }

  /**
   * Streaming exact dedup by content hash: drops re-arrivals of the same
   * text within the watermark horizon (`dropDuplicatesWithinWatermark`
   * keys state on the 8-byte hash, expired by event time — bounded
   * state, unlike an unbounded global dropDuplicates).
   */
  def streamingDedup(stream: DataFrame, textCol: String,
                     tsCol: String, watermarkDelay: String): DataFrame =
    // 128-bit state key, same collision reasoning as [[exact]]
    stream.withColumn("__h1", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(lit(0x5eed), col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__h1", "__h2")
      .drop("__h1", "__h2")

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingle array (distinct shingles, as strings).
   *  Guarded: fewer than n tokens → empty array (`sequence(1, 0)` would
   *  otherwise count DOWN and fabricate shingles). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Jaccard similarity of two distinct-element array columns. Uses
   *  |A∩B| / (|A| + |B| − |A∩B|) — one set operation per pair instead of
   *  two (the arrays come out of [[shingles]] already deduplicated). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(a).cast(DoubleType) + size(b).cast(DoubleType) - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Sorted distinct hashed-shingle set of a document — the pairwise
   *  representation: n-gram hashes are computed straight off the token
   *  array (native codegen, no shingle strings), and the sorted array
   *  makes per-pair intersection a merge walk. */
  def hashedShingleSet(text: Column, n: Int): Column =
    sort_array(array_distinct(
      graft.functions.NativeExpressions.ngramHashes(TextOps.tokens(text), n)))

  /** Jaccard over two sorted distinct long-array columns (native merge
   *  intersection). Same value as [[jaccard]] on the string sets, modulo
   *  a ~2^-64 hash-collision probability. */
  def jaccardHashed(a: Column, b: Column): Column = {
    val inter = graft.functions.NativeExpressions
      .sortedIntersectCount(a, b).cast(DoubleType)
    val uni = size(a).cast(DoubleType) + size(b).cast(DoubleType) - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  // -------------------------------------------------- blocked exact Jaccard

  /**
   * Blocks of size ≤ `maxBlock` (and ≥ 2 — singleton blocks produce no
   * pairs). Counted off the raw rows — slim (block, count) shuffle, no
   * payloads. Oversized blocks are DROPPED, the same documented recall
   * tradeoff as `maxBucket` in [[minhashLshPairs]]/[[simhashPairs]]: a
   * degenerate block key (empty string, dominant source) would
   * otherwise detonate the quadratic pair expansion silently.
   */
  private def boundedBlocks(df: DataFrame, blockCol: String,
                            maxBlock: Int): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    df.groupBy(col(blockCol).as("__blk"))
      .agg(count(lit(1)).as("__bn"))
      .where(col("__bn") >= 2 && col("__bn") <= maxBlock)
      .select(col("__blk"))
  }

  /**
   * All-pairs n-gram Jaccard within blocks. `blockCol` bounds the
   * quadratic blow-up (e.g. a source/partition key, or an LSH bucket);
   * output is (id_a, id_b, jaccard) for pairs ≥ `threshold`, id_a < id_b.
   * Blocks larger than `maxBlock` rows are dropped (see
   * [[boundedBlocks]]) so a degenerate block key cannot go quadratic.
   */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, n: Int, threshold: Double,
                        maxBlock: Int = 10000): DataFrame = {
    val ok = boundedBlocks(df, blockCol, maxBlock)
    val withSh = df.select(
      col(blockCol).as("__blk"),
      col(idCol).cast(LongType).as("__id"),
      hashedShingleSet(col(textCol), n).as("__sh"))
    val l = withSh.join(ok, Seq("__blk"))
      .select(col("__blk"), col("__id").as("id_a"), col("__sh").as("__sha"))
    val r = withSh.select(col("__blk"), col("__id").as("id_b"), col("__sh").as("__shb"))
    l.join(r, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardHashed(col("__sha"), col("__shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * Blocked edit-distance (Levenshtein) near-match pairs over a short
   * key — fuzzy-join for titles, names, and document PREFIXES (typo'd
   * boilerplate, OCR drift) where set-similarity (Jaccard) misses
   * character-level edits. Pairs form only inside `blockCol` blocks
   * (the d02 contract: the quadratic operator is only ever pointed at
   * bounded blocks, `maxBlock` caps runaway ones), and the length-band
   * prefilter `|len(a)−len(b)| ≤ maxDist` — a NECESSARY condition for
   * the distance — prunes most candidates before any DP runs.
   * `prefixLen > 0` compares the first prefixLen chars (0 = whole
   * value). Output: (id_a < id_b, dist ≤ maxDist).
   *
   * Scale: Levenshtein is O(len²) per pair — keep the compared key
   * short (that is what prefixLen is for); the DP cost is confined to
   * length-banded in-block pairs. THE BLOCK IS THE SCALE LEVER: a
   * loose block (language alone) is near-quadratic on any real corpus
   * (3.2M candidate pairs on 5k docs measured) — compose the block
   * from stable discriminating features (language + leading chars +
   * length band), accept the standard ER recall trade (a pair edited
   * inside the blocking key needs a second pass under a different
   * key), and let `maxBlock` cap what remains. Spark's levenshtein()
   * and DuckDB's agree on the standard metric, so the oracle mirrors
   * exactly.
   */
  def editDistancePairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, maxDist: Int,
                        prefixLen: Int = 0,
                        maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val key =
      if (prefixLen > 0) substring(col(textCol), 1, prefixLen)
      else col(textCol)
    val ok = boundedBlocks(df, blockCol, maxBlock)
    val base = df.where(col(textCol).isNotNull)
      .select(col(blockCol).as("__blk"),
        col(idCol).cast(LongType).as("__id"), key.as("__p"))
    val l = base.join(ok, Seq("__blk"))
      .select(col("__blk"), col("__id").as("id_a"), col("__p").as("__pa"))
    val r = base.select(col("__blk"), col("__id").as("id_b"),
      col("__p").as("__pb"))
    l.join(r, Seq("__blk"))
      .where(col("id_a") < col("id_b") &&
        abs(length(col("__pa")) - length(col("__pb"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__pa"), col("__pb")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  // ------------------------------------------------------------- MinHash

  /** Prime modulus > 2^32 for the universal-hash family. */
  val MhPrime = 4294967311L

  /** Deterministic (a, b) coefficients for k universal hash functions —
   *  a simple seeded LCG, reproducible across runs and engines. */
  def mhCoeffs(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % (MhPrime - 1) }
    Seq.fill(k)((next() + 1, next()))
  }

  /** 32-bit shingle hashes (xxhash64 truncated) — materialize this ONCE
   *  as a column before fanning out to k hash functions: Catalyst does
   *  not common-subexpression-eliminate lambda pipelines, so inlining it
   *  into [[minhashSignature]] would recompute xxhash64 k times. */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(4294967296L)))

  /**
   * MinHash signature from a precomputed hash array: for each of k
   * universal hash functions, min over shingles of (a·h + b) mod p.
   * Pure array expressions — one linear pass.
   */
  def minhashSignature(hashCol: Column, k: Int): Column = {
    val sig = mhCoeffs(k).map { case (a, b) =>
      coalesce(
        array_min(transform(hashCol, h =>
          pmod(pmod(h, lit(4294967296L)) * lit(a) + lit(b), lit(MhPrime)))),
        lit(MhPrime)) // empty doc → sentinel
    }
    array(sig: _*)
  }

  /**
   * MinHash + LSH near-duplicate pairs.
   *
   * Pipeline: shingles → k-wide signature → `bands` bands of `k/bands`
   * rows; a candidate pair is any two docs sharing a band hash; verified
   * with exact Jaccard ≥ `threshold` on the shingle sets.
   *
   * Scale shape: the per-doc state that shuffles is (band, bandHash, id)
   * — 24 bytes × bands; the exact-verify join re-reads shingles only for
   * candidate ids (semi-join pattern). Skewed mega-buckets (boilerplate
   * docs) should be salted or capped upstream; we cap candidate bucket
   * size with `maxBucket` to bound the quadratic corner.
   */
  /** (__id, __sh) shingle-set frame for one side of an LSH pipeline. */
  private def shingleBase(df: DataFrame, textCol: String, idCol: String,
                          n: Int): DataFrame =
    df.select(col(idCol).cast(LongType).as("__id"),
      hashedShingleSet(col(textCol), n).as("__sh"))

  /** Slim (__id, band, bh) rows from a shingle-set frame — the ONLY
   *  data an LSH stage shuffles; shingle arrays stay columnar in the
   *  base frame. Same (k, bands) ⇒ same band hashes on any side. */
  private def bandRows(base: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    base.select(col("__id"),
        graft.functions.NativeExpressions
          .minhashSig(col("__sh"), mhCoeffs(k), MhPrime).as("__sig"))
      .select(col("__id"),
        posexplode(graft.functions.NativeExpressions
          .bandHashes(col("__sig"), bands, r)))
      .select(col("__id"), col("pos").as("band"), col("col").as("bh"))
  }

  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3, k: Int = 128, bands: Int = 32,
                      threshold: Double = 0.8,
                      maxBucket: Int = 1000): DataFrame = {
    // hashed shingle sets (native n-gram hashing — no shingle strings),
    // materialized ONCE via a lazy local checkpoint: the banding branch
    // and verifyJaccard's two join-backs would otherwise each re-scan
    // the corpus and re-hash every shingle (3 full text passes). The
    // checkpointed frame is slim — (id, hash array), ~8 B/shingle, no
    // text — so it is bench- and 100 TB-safe to pin.
    val base = shingleBase(df, textCol, idCol, n).localCheckpoint(false)
    val banded = bandRows(base, k, bands)

    // candidate pairs within buckets: ONE shuffle groups a bucket's ids
    // (map-side partial collect), pairs expand in-row from the sorted id
    // list (i<j by construction) — no window pass, no self-join. Bucket
    // size capped for skew safety (degenerate boilerplate bands).
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .where(size(col("__ids")) >= 2 && size(col("__ids")) <= maxBucket)
    val pairStructs = flatten(transform(col("__ids"), (x, i) =>
      transform(slice(col("__ids"), i + 2, size(col("__ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    val cand = buckets
      .select(explode(pairStructs).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact-verify only the candidates: join the (small) pair list back
    // to the shingle sets — the semi-join pattern that scales
    verifyJaccard(cand, base.select(col("__id"), col("__sh")), threshold)
  }

  /**
   * Exact-verify candidate pairs against hashed shingle sets: join the
   * slim (id_a, id_b) list back to `sh` = (__id, __sh) on each side,
   * keep pairs with Jaccard ≥ `threshold`. The join-back of
   * [[minhashLshPairs]], factored out so its skew behavior is testable
   * in isolation.
   *
   * Skew: a hub document (boilerplate that near-matches 10⁴+ others)
   * concentrates its candidate rows on one join key. The pair rows that
   * shuffle are 16 B each, so even a 10⁴-pair hub partition is only
   * ~160 KB of INPUT — and because both joins are plain shuffled
   * equi-joins, AQE's OptimizeSkewedJoin splits any partition that does
   * exceed the skew threshold, replicating the single matching `sh` row
   * per split (asserted by the hub skew test). No salting needed: the
   * heavy side is the slim pair list, never the shingle arrays.
   */
  private[ops] def verifyJaccard(cand: DataFrame, sh: DataFrame,
                                 threshold: Double): DataFrame =
    cand
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardHashed(col("__sha"), col("__shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /**
   * Winnowing-fingerprint near-dup pairs (the MOSS detector at corpus
   * scale): documents sharing at least `minShared` winnowing
   * fingerprints ([[TextOps.winnowFingerprints]] — window-min over
   * token n-gram hashes). Because winnowing guarantees a common
   * fingerprint for any shared token run of length ≥ window + n − 1,
   * this finds PARTIAL overlap — a copied paragraph inside otherwise
   * different documents — that whole-document signatures (MinHash over
   * the full shingle set) dilute away. The complement of
   * [[minhashLshPairs]]: that one ranks whole-document similarity,
   * this one flags shared passages.
   *
   * Scale shape is the LSH-bucket contract: the map-only fingerprint
   * stream groups by fp (ONE shuffle of 16 B rows, map-side partial
   * collect), buckets cap at `maxBucket` ids (a fingerprint shared by
   * half the corpus is boilerplate, not evidence — same recall
   * contract as the capped siblings), pairs expand in-row from the
   * sorted id list, and the (id_a, id_b) count ≥ `minShared` filter is
   * one partially-aggregated groupBy. Nothing quadratic survives
   * outside a capped bucket.
   *
   * Output: (id_a, id_b, n_shared) with id_a < id_b.
   */
  def winnowDupPairs(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 3, window: Int = 4, minShared: Int = 2,
                     maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fps = TextOps.winnowFingerprints(df, textCol, idCol, n, window)
    // pre-filter hot fingerprints with a COUNT pass before collecting:
    // a corpus-wide boilerplate fingerprint must never materialize its
    // full id list in one aggregation buffer just to be discarded by a
    // post-hoc size check. The count aggregate partial-aggregates
    // map-side, and both passes shuffle on `fp`, so the semi-join and
    // the collect reuse the first exchange (no extra shuffle).
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2 && col("__n") <= maxBucket)
      .select(col("fp"))
    val buckets = fps.join(keep, Seq("fp"), "left_semi")
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
    val pairStructs = flatten(transform(col("__ids"), (x, i) =>
      transform(slice(col("__ids"), i + 2, size(col("__ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    buckets
      .select(explode(pairStructs).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /**
   * MinHash-LSH parameter planner: for a signature of `k` hashes,
   * enumerate every (bands, rows) factorization and report the
   * S-curve's operating points — collision probability
   * `1 − (1 − j^rows)^bands` at the target Jaccard and at a
   * `separation` below it, plus the curve's threshold location
   * `(1/bands)^(1/rows)`. Callers pick the row whose `p_at_target` is
   * high and `p_below` low; [[minhashLshPairs]]' defaults (k=128,
   * b=32, r=4) come from exactly this table at τ=0.8. Pure driver-side
   * math — the planning step before committing a 100 TB banding pass.
   */
  def lshPlan(k: Int, targetJaccard: Double,
              separation: Double = 0.2): Seq[LshOperatingPoint] = {
    require(k >= 2, s"k must be >= 2: $k")
    require(targetJaccard > 0 && targetJaccard < 1,
      s"targetJaccard must be in (0,1): $targetJaccard")
    def pCollide(j: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, r), b)
    for {
      r <- (1 to k).filter(k % _ == 0)
      b = k / r
    } yield LshOperatingPoint(b, r,
      math.pow(1.0 / b, 1.0 / r),
      pCollide(targetJaccard, b, r),
      pCollide(math.max(0.0, targetJaccard - separation), b, r))
  }

  /** One (bands, rows) operating point of [[lshPlan]]. */
  final case class LshOperatingPoint(bands: Int, rows: Int,
                                     curveThreshold: Double,
                                     pAtTarget: Double, pBelow: Double)

  /**
   * Per-group duplication report: for each group (source, crawl day,
   * language …), document count, distinct-content count and the
   * duplication rate — the triage that decides WHERE dedup budget goes
   * before any pairwise work runs (a source at 40% dup rate gets the
   * near-dup pass first; one at 0.1% may not need it).
   *
   * Scale: map-side reduction to (group, 128-bit content key), one
   * partially-aggregated distinct count per group — bodies never move,
   * and no pairs are ever formed.
   */
  def dupRateByGroup(df: DataFrame, textCol: String,
                     groupCol: String): DataFrame =
    df.select(col(groupCol), xxhash64(col(textCol)).as("__h1"),
        xxhash64(lit(0x5eed), col(textCol)).as("__h2"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(struct(col("__h1"), col("__h2"))).as("n_distinct"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_distinct").cast(DoubleType) /
          col("n_docs").cast(DoubleType))

  /**
   * Production twin of [[dupRateByGroup]] on HyperLogLog++ distinct
   * counting (`approx_count_distinct`, relative error `rsd`): the
   * exact twin's `countDistinct` keeps every distinct 128-bit key in
   * the aggregation state — fine for oracles, but a trillion-distinct
   * group at 100 TB wants the fixed ~1.5 kB/group HLL sketch instead.
   * Same oracle-mode/production-mode split the simhash and winsorize
   * operators use; an error-bound unit test pins the twin to the
   * exact rate.
   */
  def dupRateByGroupApprox(df: DataFrame, textCol: String,
                           groupCol: String, rsd: Double = 0.02): DataFrame =
    df.select(col(groupCol), xxhash64(col(textCol)).as("__h1"),
        xxhash64(lit(0x5eed), col(textCol)).as("__h2"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(struct(col("__h1"), col("__h2")), rsd)
          .as("n_distinct"))
      .withColumn("dup_rate",
        greatest(lit(0.0),
          lit(1.0) - col("n_distinct").cast(DoubleType) /
            col("n_docs").cast(DoubleType)))

  /**
   * Cross-source duplicate-overlap matrix: for every pair of sources,
   * how many distinct document contents they SHARE, plus the content
   * Jaccard of the two sources — the triage that decides which crawl
   * overlaps which dump before cross-corpus dedup runs (a mirror pair
   * at Jaccard 0.9 wants one side dropped wholesale; two sources at
   * 0.01 want the pairwise pass). Output: (src_a, src_b, n_shared,
   * n_a, n_b, jaccard) with src_a < src_b, jaccard rounded to 6.
   *
   * Scale shape: bodies reduce map-side to distinct (source, 16-byte
   * md5 key) rows — md5 rather than xxhash so SQL engines reproduce
   * the key, and slim either way. One shuffle on the key groups each
   * content's source set, pairs expand IN-ROW from that sorted set
   * (sources-per-content is bounded by the source count, so no
   * key-equality self-join and no row blowup), and a partial agg
   * finishes. Per-source distinct sizes ride the same keys frame.
   */
  def sourceOverlap(df: DataFrame, textCol: String, sourceCol: String,
                    prefixLen: Int = 0): DataFrame = {
    // prefixLen > 0 keys on the document PREFIX (shared boilerplate /
    // mirrored headers — how cross-crawl overlap actually shows up);
    // 0 keys on the whole body
    val content =
      if (prefixLen > 0) substring(col(textCol), 1, prefixLen)
      else col(textCol)
    // materialize the distinct (source, key) frame once: three
    // consumers (pair expansion + both size legs) would otherwise each
    // re-scan the corpus; the keys frame is the slim post-distinct
    // form, exactly what should persist at 100 TB
    val keys = df.where(col(textCol).isNotNull)
      .select(col(sourceCol).cast(StringType).as("__src"),
        md5(content.cast(BinaryType)).as("__k"))
      .distinct()
      .localCheckpoint()
    val sizes = keys.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val srcSet = keys.groupBy(col("__k"))
      .agg(sort_array(collect_set(col("__src"))).as("__ss"))
      .where(size(col("__ss")) >= 2)
    val pairs = srcSet.select(explode(flatten(transform(col("__ss"),
        (x, i) => transform(slice(col("__ss"), i + lit(2),
            size(col("__ss"))),
          y => struct(x.as("src_a"), y.as("src_b")))))).as("__p"))
      .groupBy(col("__p.src_a").as("src_a"), col("__p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("__src").as("src_a"), col("__n").as("n_a")),
        Seq("src_a"))
      .join(sizes.select(col("__src").as("src_b"), col("__n").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        round(col("n_shared").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_shared")).cast(DoubleType), 6)
          .as("jaccard"))
  }

  /**
   * Production twin of [[sourceOverlap]] at shingle granularity: the
   * estimated Jaccard between the SHINGLE SETS of every source pair,
   * from per-source MinHash union sketches. The per-doc signature is
   * the native kernel; a source's sketch is the elementwise MIN of its
   * docs' signatures — exactly the signature of the union of their
   * shingle sets (min is mergeable, so the reduction is one partial
   * agg; fixed k·8 bytes of state per source regardless of corpus
   * size). Pairwise similarity = fraction of equal components,
   * computed over the tiny sources×sources frame.
   * Output: (src_a, src_b, est_jaccard), estimate error ~1/√k.
   *
   * With the default xxhash shingles this is unit-pinned against the
   * exact shingle-set Jaccard (the d04-prod contract); `shingles` is
   * the same oracle hook as [[streamingMinhashMatches]]' — pass the
   * mod-ngram variant for a full cross-engine value oracle (d24 in
   * [[graft.SparkEntry]]).
   */
  def sourceSimilaritySketch(df: DataFrame, textCol: String,
                             sourceCol: String, k: Int = 128,
                             shingleN: Int = 5,
                             shingles: (Column, Int) => Column =
                               hashedShingleSet): DataFrame = {
    val sig = df.where(col(textCol).isNotNull)
      .select(col(sourceCol).cast(StringType).as("__src"),
        graft.functions.NativeExpressions.minhashSig(
          shingles(col(textCol), shingleN), mhCoeffs(k), MhPrime)
          .as("__sig"))
    val perSrc = sig
      .select(col("__src"), posexplode(col("__sig")).as(Seq("__i", "__v")))
      .groupBy(col("__src"), col("__i")).agg(min(col("__v")).as("__mn"))
      .groupBy(col("__src"))
      .agg(transform(array_sort(collect_list(struct(col("__i"), col("__mn")))),
        s => s.getField("__mn")).as("__sk"))
    val a = perSrc.select(col("__src").as("src_a"), col("__sk").as("__ska"))
    val b = perSrc.select(col("__src").as("src_b"), col("__sk").as("__skb"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(aggregate(
          zip_with(col("__ska"), col("__skb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, e) => acc + e).cast(DoubleType) / lit(k.toDouble), 6)
          .as("est_jaccard"))
  }

  /**
   * Corpus snapshot diff: which documents were added, removed, or
   * content-changed between two snapshots of an id-stable corpus (two
   * crawls, two pipeline versions) — the audit that answers "what did
   * this refresh actually do" before committing it downstream. Output
   * rows only for differences: (idCol, status ∈ added|removed|changed);
   * unchanged documents produce nothing.
   *
   * Scale: each side reduces map-side to (id, 128-bit content hash) —
   * bodies never move — and one full-outer join on the id key
   * classifies every difference. 100 TB × 2 snapshots diff in a
   * 24 B/row shuffle.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame, textCol: String,
                   idCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String) =
      df.select(col(idCol).cast(LongType).as(idCol),
        struct(xxhash64(col(textCol)),
          xxhash64(lit(0xd1ff), col(textCol))).as(h))
    keyed(before, "__hb").join(keyed(after, "__ha"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .where(col("status") =!= "unchanged")
  }

  /**
   * ASYMMETRIC containment pairs: candidates from shared winnowing
   * fingerprints ([[winnowDupPairs]]), verified by exact containment
   * over the n-gram shingle sets —
   *
   *   C(A,B) = |A ∩ B| / min(|A|, |B|)
   *
   * ≥ `threshold`. Catches subset duplication (a whole document pasted
   * inside a larger one) that symmetric Jaccard dilutes toward 0 as
   * the host document grows: a 100-gram doc inside a 10^4-gram doc has
   * J ≈ 0.01 but C = 1.0. Winnowing candidates are the right recall
   * source for exactly this case — the embedded copy is a long shared
   * token run, which winnowing guarantees produces common
   * fingerprints. Output: (id_a, id_b, containment), id_a < id_b.
   *
   * Scale: the candidate stage is the capped-bucket winnow shape; the
   * verify joins each side's sorted hashed shingle set back to the
   * slim pair list (the [[verifyJaccard]] semi-join pattern, same AQE
   * skew coverage) and intersects with the native merge walk.
   */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, window: Int = 4, minShared: Int = 2,
                       threshold: Double = 0.8,
                       maxBucket: Int = 1000): DataFrame = {
    val cand = winnowDupPairs(df, textCol, idCol, n, window, minShared,
      maxBucket).select(col("id_a"), col("id_b"))
    val sh = df.select(col(idCol).cast(LongType).as("__id"),
      hashedShingleSet(col(textCol), n).as("__sh"))
    val inter = graft.functions.NativeExpressions
      .sortedIntersectCount(col("__sha"), col("__shb")).cast(DoubleType)
    val minSize = least(size(col("__sha")), size(col("__shb"))).cast(DoubleType)
    cand
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        when(minSize === 0, lit(0.0)).otherwise(inter / minSize)
          .as("containment"))
      .where(col("containment") >= threshold)
  }

  /**
   * EXACT cross-document substring dedup (round 12; Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better" §4.1 —
   * repeated spans across documents, there found with a corpus suffix
   * array, which has no distributed form): candidate pairs come from
   * the winnowing stage ([[winnowDupPairs]] — shared fingerprints
   * bound the pair volume exactly like d12), then each candidate pair
   * gets the EXACT longest common contiguous token run via the
   * codegen'd [[graft.functions.NativeExpressions.LongestCommonRun]]
   * dynamic program. Pairs whose run reaches `minRun` tokens report
   * the span (its text from side a, plus both 0-based token starts) —
   * the deliverable a span-removal pass consumes.
   *
   * Output: (id_a, id_b, run_len, start_a, start_b, span), id_a < id_b.
   *
   * Scale: the quadratic work is per CANDIDATE pair (winnow-bounded),
   * never all-pairs; the DP is O(|a|·|b|) per pair with both sides
   * truncated at `maxTokens` (10k tokens ⇒ ≤10⁸ byte-compare steps
   * worst case, and real candidates share fingerprints, so their runs
   * terminate the scan early in the row cache). Token frames carry
   * (id, tokens) only — bodies never ride the pair join twice.
   */
  def substringDupSpans(df: DataFrame, textCol: String, idCol: String,
                        minRun: Int = 20, n: Int = 3, window: Int = 4,
                        minShared: Int = 2, maxBucket: Int = 1000,
                        maxTokens: Int = 10000): DataFrame = {
    require(minRun >= n,
      s"minRun must be >= the winnow gram size n: minRun=$minRun n=$n")
    val cand = winnowDupPairs(df, textCol, idCol, n, window, minShared,
      maxBucket).select(col("id_a"), col("id_b"))
    val toks = df.select(col(idCol).cast(LongType).as("__id"),
      TextOps.tokens(col(textCol)).as("__t"))
    cand
      .join(toks.select(col("__id").as("id_a"), col("__t").as("__ta")),
        Seq("id_a"))
      .join(toks.select(col("__id").as("id_b"), col("__t").as("__tb")),
        Seq("id_b"))
      .withColumn("__r", graft.functions.NativeExpressions
        .longestCommonRun(col("__ta"), col("__tb"), maxTokens))
      .where(col("__r.len") >= minRun)
      .select(col("id_a"), col("id_b"),
        col("__r.len").as("run_len"),
        col("__r.start_a").as("start_a"),
        col("__r.start_b").as("start_b"),
        array_join(slice(col("__ta"), col("__r.start_a") + 1,
          col("__r.len")), " ").as("span"))
  }

  /**
   * Incremental EXACT substring dedup (round 12): [[substringDupSpans]]
   * between an incoming `batch` and an existing `corpus`, reporting
   * ONLY batch×corpus span pairs — the span-level twin of
   * [[dedupAgainst]] / [[minhashLshPairsAgainst]] (a daily crawl lands
   * next to a deduplicated corpus; re-running the full pass would redo
   * the corpus's own candidate work for a 0.1% delta). Candidates are
   * winnow fingerprints shared ACROSS the sides (each side's hot
   * fingerprints capped at `maxBucket` independently — the sibling's
   * recall contract); the verify is the same codegen'd
   * longest-common-run DP per candidate pair. Id spaces may overlap
   * freely — the sides never join on id.
   *
   * Output: (batch_id, corpus_id, run_len, start_batch, start_corpus,
   * span — text from the batch side).
   */
  def substringDupSpansAgainst(batch: DataFrame, corpus: DataFrame,
                               textCol: String, idCol: String,
                               minRun: Int = 20, n: Int = 3,
                               window: Int = 4, minShared: Int = 2,
                               maxBucket: Int = 1000,
                               maxTokens: Int = 10000): DataFrame = {
    require(minRun >= n,
      s"minRun must be >= the winnow gram size n: minRun=$minRun n=$n")
    def fps(df: DataFrame) =
      TextOps.winnowFingerprints(df, textCol, idCol, n, window)
        .select(col(idCol).cast(LongType).as("__id"), col("fp"))
    def capped(f: DataFrame) = {
      val keep = f.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBucket).select(col("fp"))
      f.join(keep, Seq("fp"), "left_semi")
    }
    val bf = capped(fps(batch))
      .select(col("fp"), col("__id").as("batch_id"))
    val cf = capped(fps(corpus))
      .select(col("fp"), col("__id").as("corpus_id"))
    val cand = bf.join(cf, Seq("fp"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("__shared"))
      .where(col("__shared") >= minShared)
      .select(col("batch_id"), col("corpus_id"))
    def toks(df: DataFrame, out: String, tout: String) =
      df.select(col(idCol).cast(LongType).as(out),
        TextOps.tokens(col(textCol)).as(tout))
    cand
      .join(toks(batch, "batch_id", "__tb"), Seq("batch_id"))
      .join(toks(corpus, "corpus_id", "__tc"), Seq("corpus_id"))
      .withColumn("__r", graft.functions.NativeExpressions
        .longestCommonRun(col("__tb"), col("__tc"), maxTokens))
      .where(col("__r.len") >= minRun)
      .select(col("batch_id"), col("corpus_id"),
        col("__r.len").as("run_len"),
        col("__r.start_a").as("start_batch"),
        col("__r.start_b").as("start_corpus"),
        array_join(slice(col("__tb"), col("__r.start_a") + 1,
          col("__r.len")), " ").as("span"))
  }

  // ------------------------------------------------ span removal (round 13)

  /**
   * Cut token intervals out of documents and reflow (round 13; the
   * removal half of Lee et al. §4.1 — [[substringDupSpans]] REPORTS
   * duplicated spans, this excises them, yielding the deduplicated
   * training corpus). `cuts` carries 0-based half-open token intervals
   * (`id`, `s`, `e`) against the SAME whitespace tokenization
   * [[substringDupSpans]] used ([[TextOps.tokens]]). Overlapping and
   * adjacent intervals per document merge (interval union) before
   * cutting, so stacked reports of one passage cut once. Documents with
   * no cut rows pass through with their original text BYTE-EXACT
   * (join-miss fast path); cut documents reflow as the surviving tokens
   * joined by single spaces.
   *
   * Scale shape: cuts group to one slim (id, intervals) row per touched
   * document (interval lists are report-sized, never corpus-sized); one
   * left join against the corpus (broadcast-able — touched ids are the
   * dup report, a tiny fraction of the corpus); the cut itself is an
   * in-row higher-order filter (codegen, no UDF) — document bodies
   * never shuffle.
   */
  def exciseTokenSpans(df: DataFrame, cuts: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val ivType = ArrayType(StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false))), containsNull = false)
    def last(acc: Column): Column = element_at(acc, -1)
    val merged = cuts
      .select(col("id").cast(LongType).as("__cut_id"),
        struct(col("s").cast(IntegerType).as("s"),
          col("e").cast(IntegerType).as("e")).as("__iv"))
      .groupBy(col("__cut_id"))
      .agg(sort_array(collect_list(col("__iv"))).as("__sorted"))
      .select(col("__cut_id"),
        aggregate(col("__sorted"), array().cast(ivType),
          (acc, iv) => when(size(acc) > 0 &&
              iv.getField("s") <= last(acc).getField("e"),
            concat(slice(acc, lit(1), size(acc) - 1), array(struct(
              last(acc).getField("s").as("s"),
              greatest(last(acc).getField("e"),
                iv.getField("e")).as("e")))))
            .otherwise(concat(acc, array(iv)))).as("__ivs"))
    val kept = filter(TextOps.tokens(col(textCol)), (t, i) =>
      !exists(col("__ivs"), iv =>
        i >= iv.getField("s") && i < iv.getField("e")))
    df.join(merged, df(idCol).cast(LongType) === merged("__cut_id"), "left")
      .withColumn(textCol,
        when(col("__ivs").isNull, col(textCol))
          .otherwise(array_join(kept, " ")))
      .drop("__cut_id", "__ivs")
  }

  /**
   * The deduplicated corpus from a [[substringDupSpans]] report: for
   * each reported pair the span survives in the KEEPER document and is
   * cut from the other; per-document cut intervals union before
   * cutting (see [[exciseTokenSpans]]). Keeper policy: highest
   * `qualityCol` with ties going to the lower id when given (d08's
   * keep-best); lower id otherwise (keep-first — `id_a < id_b` by
   * construction, so no quality join is needed and `id_a` always
   * keeps). Returns `df` with `textCol` rewritten for every document,
   * cut or not — uncut text is byte-exact.
   */
  def removeDupSpans(df: DataFrame, spans: DataFrame, textCol: String,
                     idCol: String,
                     qualityCol: Option[String] = None): DataFrame = {
    val cuts = qualityCol match {
      case None =>
        spans.select(col("id_b").as("id"), col("start_b").as("s"),
          (col("start_b") + col("run_len")).as("e"))
      case Some(q) =>
        // quality joins touch only the reported pairs, not the corpus
        val qual = df.select(col(idCol).cast(LongType).as("__qid"),
          col(q).as("__q"))
        // id_a < id_b, so >= gives ties (and null-vs-null) to the
        // lower id; a null quality on one side loses to a non-null
        val aWins = coalesce(
          col("__qa") >= col("__qb"), col("__qa").isNotNull)
        spans
          .join(qual.select(col("__qid").as("id_a"),
            col("__q").as("__qa")), Seq("id_a"))
          .join(qual.select(col("__qid").as("id_b"),
            col("__q").as("__qb")), Seq("id_b"))
          .select(
            when(aWins, col("id_b")).otherwise(col("id_a")).as("id"),
            when(aWins, col("start_b")).otherwise(col("start_a")).as("s"),
            col("run_len"))
          .select(col("id"), col("s"), (col("s") + col("run_len")).as("e"))
    }
    exciseTokenSpans(df, cuts, textCol, idCol)
  }

  /**
   * One-call exact span dedup: [[substringDupSpans]] composed with
   * [[removeDupSpans]] — the end-to-end Lee et al. §4.1 deliverable
   * (find every cross-document token run of `minRun`+ tokens, keep one
   * occurrence, cut the rest, reflow).
   */
  def dedupSpans(df: DataFrame, textCol: String, idCol: String,
                 minRun: Int = 20, n: Int = 3, window: Int = 4,
                 minShared: Int = 2, maxBucket: Int = 1000,
                 maxTokens: Int = 10000,
                 qualityCol: Option[String] = None): DataFrame =
    removeDupSpans(df,
      substringDupSpans(df, textCol, idCol, minRun, n, window, minShared,
        maxBucket, maxTokens),
      textCol, idCol, qualityCol)

  /**
   * Incremental removal (the [[substringDupSpansAgainst]] composition):
   * spans cut from the BATCH side only — the corpus is the
   * already-deduplicated canonical copy and always keeps. Returns the
   * batch with `textCol` rewritten.
   */
  def removeDupSpansAgainst(batch: DataFrame, spans: DataFrame,
                            textCol: String, idCol: String): DataFrame =
    exciseTokenSpans(batch,
      spans.select(col("batch_id").as("id"), col("start_batch").as("s"),
        (col("start_batch") + col("run_len")).as("e")),
      textCol, idCol)

  /** Output row of [[streamingSpanCutsAgainst]]. */
  final case class SpanCutDoc(doc_id: Long, text: String, n_spans: Int)

  /**
   * STREAMING incremental span removal (round 14) — the ingest twin of
   * [[substringDupSpansAgainst]] ∘ [[removeDupSpansAgainst]]: documents
   * arrive as a stream next to a STATIC deduplicated corpus; the
   * LONGEST ≥ `minRun`-token shared run per (document, corpus-document)
   * candidate pair is cut out (one DP verdict per distinct pair —
   * the batch twin's contract; a second DISJOINT qualifying run
   * against the SAME corpus document survives, though runs against
   * OTHER corpus documents each cut independently) and the reflowed
   * text emits when the document's micro-batch completes. Emits ONLY
   * touched documents —
   * an untouched doc never forms a candidate and passes the operator
   * by (callers union it back unchanged, byte-exact by construction —
   * the batch operator's join-miss fast path, streamed).
   *
   * Shape: the corpus reduces ONCE to two lazily-checkpointed static
   * frames — the `maxBucket`-capped winnow fingerprint index
   * (fp, corpus_id) and the token arrays — reused by every
   * micro-batch instead of re-derived. The stream side is STATELESS
   * until the final per-document regrouping: in-row winnow
   * fingerprints explode to (doc, fp) rows; the stream-static fp join
   * yields candidates (the batch pigeonhole contract: a qualifying
   * run shares ≥ 1 winnow fingerprint — the per-pair `minShared` cost
   * filter is deliberately dropped, the per-doc regroup dedupes
   * repeat candidates before any DP); the stream-static token join
   * attaches each candidate's corpus tokens; and ONE
   * `flatMapGroupsWithState` keyed by document dedupes the candidate
   * pairs, verifies each DISTINCT pair once with the kernel-equivalent
   * longest-common-run DP ([[lcrKernel]]), unions the intervals and
   * reflows. No state is ever carried across triggers (a
   * document's candidate rows all live in its own micro-batch), so
   * state size is zero between triggers; the bounded footprint is the
   * corpus index, capped per fingerprint bucket like the batch
   * operator.
   *
   * Batch equivalence (unit-pinned): any replay's output ==
   * `removeDupSpansAgainst(batch, substringDupSpansAgainst(batch,
   * corpus, …, minShared = 1))` restricted to the touched documents —
   * PROVIDED no stream-side fingerprint exceeds `maxBucket` docs in
   * one micro-batch. The batch twin caps BOTH sides; here only the
   * corpus index caps (a cross-document stream-side frequency count
   * would be a second stateful aggregation on the ingest path), so a
   * hotter-than-maxBucket stream fingerprint still forms candidates.
   * Candidate volume stays bounded by corpusCap × stream fp rows;
   * size `maxBucket` to the deployment's micro-batch width.
   */
  def streamingSpanCutsAgainst(docs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      minRun: Int = 20, n: Int = 3, window: Int = 4,
      maxBucket: Int = 1000, maxTokens: Int = 10000)
      : org.apache.spark.sql.Dataset[SpanCutDoc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(minRun >= n,
      s"minRun must be >= the winnow gram size n: minRun=$minRun n=$n")
    val cf = {
      val f = TextOps.winnowFingerprints(corpus, textCol, idCol, n, window)
        .select(col(idCol).cast(LongType).as("corpus_id"), col("fp"))
      val keep = f.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBucket).select(col("fp"))
      f.join(keep, Seq("fp"), "left_semi").localCheckpoint(false)
    }
    val ct = corpus.select(col(idCol).cast(LongType).as("corpus_id"),
      TextOps.tokens(col(textCol)).as("__tc")).localCheckpoint(false)
    val g = graft.functions.NativeExpressions.modNgramHashes(
      TextOps.tokens(col("__text")), n)
    // candidate rows: one per (doc, corpus doc, shared fp) — the DP
    // runs per DISTINCT pair inside the per-doc function below (the
    // batch operator's candidate-grouping, relocated: a declarative
    // pair-dedup would be a second stateful operator)
    val cand = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).as("__text"))
      .withColumn("fp", explode(when(size(g) > 0,
        graft.functions.NativeExpressions.winnowMins(g, window))))
      .join(cf, Seq("fp"))
      .join(ct, Seq("corpus_id"))
      .select(col("doc_id"), col("__text"), col("corpus_id"),
        col("__tc"))
      .as[(Long, String, Long, Seq[String])]
    def fn(key: Long, rows: Iterator[(Long, String, Long, Seq[String])],
           state: org.apache.spark.sql.streaming.GroupState[Boolean])
        : Iterator[SpanCutDoc] = {
      val rs = rows.toVector
      if (rs.isEmpty) Iterator.empty
      else {
        val text = rs.head._2
        // TextOps.tokens parity: trim + whitespace split, blank → none
        val toks =
          if (text.trim.isEmpty) Array.empty[String]
          else text.trim.split("\\s+")
        // ONE kernel-equivalent DP per distinct candidate pair
        val ivs = rs.iterator.map(r => r._3 -> r._4).toMap.valuesIterator
          .flatMap { tc =>
            val (len, sa) = lcrKernel(toks, tc.toArray, maxTokens)
            if (len >= minRun) Some((sa, sa + len)) else None
          }.toVector.distinct.sorted
        if (ivs.isEmpty) Iterator.empty
        else {
          val merged = ivs.foldLeft(Vector.empty[(Int, Int)]) {
            case (acc, (s0, e0)) =>
              acc.lastOption match {
                case Some((ls, le)) if s0 <= le =>
                  acc.init :+ ((ls, math.max(le, e0)))
                case _ => acc :+ ((s0, e0))
              }
          }
          val kept = toks.iterator.zipWithIndex.collect {
            case (t, i)
                if !merged.exists(iv => i >= iv._1 && i < iv._2) => t
          }
          Iterator.single(SpanCutDoc(key, kept.mkString(" "),
            merged.size))
        }
      }
    }
    cand.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** JVM twin of [[graft.functions.CommonRunKernel]] — same DP, same
    * first-occurrence tie-break, same maxTokens truncation — for the
    * per-document streaming regroup where the expression form would
    * cost one DP per SHARED FINGERPRINT instead of per pair. Returns
    * (len, start_a). */
  private def lcrKernel(a: Array[String], b: Array[String],
                        maxTokens: Int): (Int, Int) = {
    val na = math.min(a.length, maxTokens)
    val nb = math.min(b.length, maxTokens)
    var best = 0; var ba = 0
    var prev = new Array[Int](nb + 1)
    var cur = new Array[Int](nb + 1)
    var i = 0
    while (i < na) {
      var k = 0
      while (k < nb) {
        if (a(i) != null && a(i) == b(k)) {
          val v = prev(k) + 1
          cur(k + 1) = v
          if (v > best) { best = v; ba = i - v + 1 }
        } else cur(k + 1) = 0
        k += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    (best, ba)
  }

  /**
   * Cross-corpus near-duplicate pairs: MinHash+LSH between an incoming
   * `batch` and an existing `corpus`, reporting ONLY batch×corpus pairs
   * (never within-side pairs) — the near-dup twin of [[dedupAgainst]],
   * i.e. the daily-crawl-lands-next-to-a-deduplicated-corpus shape
   * where re-running [[minhashLshPairs]] over corpus+batch would redo
   * the corpus's own quadratic work for a 0.1% delta.
   *
   * Scale shape: both sides reduce to slim (band, bandHash, id) rows
   * with the SAME hash family (identical coefficients ⇒ comparable
   * bands); each side groups its bucket ids once (capped at
   * `maxBucket` per SIDE, same recall contract as the siblings); the
   * bucket join then expands batch×corpus pairs by chained explodes —
   * rows, never a materialized product array, so a 1000×1000 bucket
   * streams through codegen instead of building a 10⁶-element array.
   * Verification joins each side's shingle sets back by its own id —
   * the id spaces of batch and corpus may overlap freely.
   *
   * Output: (batch_id, corpus_id, jaccard) with jaccard ≥ `threshold`.
   */
  def minhashLshPairsAgainst(batch: DataFrame, corpus: DataFrame,
                             textCol: String, idCol: String,
                             n: Int = 3, k: Int = 128, bands: Int = 32,
                             threshold: Double = 0.8,
                             maxBucket: Int = 1000): DataFrame = {
    val bBase = shingleBase(batch, textCol, idCol, n)
    val cBase = shingleBase(corpus, textCol, idCol, n)
    def buckets(base: DataFrame, out: String): DataFrame =
      bandRows(base, k, bands)
        .groupBy(col("band"), col("bh"))
        .agg(sort_array(collect_list(col("__id"))).as(out))
        .where(size(col(out)) <= maxBucket)
    val cand = buckets(bBase, "__bids")
      .join(buckets(cBase, "__cids"), Seq("band", "bh"))
      .select(explode(col("__bids")).as("batch_id"), col("__cids"))
      .select(col("batch_id"), explode(col("__cids")).as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    cand
      .join(bBase.select(col("__id").as("batch_id"), col("__sh").as("__sha")),
        Seq("batch_id"))
      .join(cBase.select(col("__id").as("corpus_id"), col("__sh").as("__shb")),
        Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        jaccardHashed(col("__sha"), col("__shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ------------------------------------------------ persisted LSH index

  /**
   * Persist a MinHash-LSH near-dup index (round 16; the
   * [[graft.ops.Retrieval.writeBm25Index]]/s34 shape for dedup):
   * the corpus's slim (band, bh, id) band rows written as parquet
   * PARTITIONED BY band, its hashed shingle sets written once
   * alongside (probe-time verification needs them), and a 1-row
   * params table freezing (n, k, bands). At 100 TB this is the index
   * build — the corpus tokenizes and signs ONCE; every later probe
   * costs only the BATCH's signatures plus a bucket join against the
   * precomputed rows, where [[minhashLshPairsAgainst]] re-shingles
   * and re-signs the whole corpus per batch.
   */
  def writeLshIndex(corpus: DataFrame, textCol: String, idCol: String,
                    path: String, n: Int = 3, k: Int = 128,
                    bands: Int = 32): Unit = {
    require(k % bands == 0, "bands must divide k")
    val base = shingleBase(corpus, textCol, idCol, n)
      .localCheckpoint(false)
    // materialize the shared tokenize+shingle pass ONCE, then the
    // three independent output writes overlap (guide §2.6; round 17 —
    // the sequential writes left the cluster idle during each commit)
    base.count()
    val spark = corpus.sparkSession
    import spark.implicits._
    Hashing.concurrently(
      () => bandRows(base, k, bands)
        .repartition(col("band"))
        .write.mode("overwrite").partitionBy("band")
        .parquet(s"$path/bands"),
      () => base.write.mode("overwrite").parquet(s"$path/shingles"),
      () => Seq((n, k, bands)).toDF("n", "k", "bands")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/params"))
  }

  /** Append NEW documents to a persisted LSH index under its frozen
   *  (n, k, bands) — one shingle+sign pass over the batch only;
   *  existing band partitions gain files, untouched ones untouched.
   *  Batch ids must be new (re-indexing is a rebuild decision). */
  def appendLshIndex(batch: DataFrame, textCol: String, idCol: String,
                     path: String): Unit = {
    val spark = batch.sparkSession
    val prm = spark.read.parquet(s"$path/params").head()
    val (n, k, bands) =
      (prm.getAs[Int]("n"), prm.getAs[Int]("k"), prm.getAs[Int]("bands"))
    val base = shingleBase(batch, textCol, idCol, n)
      .localCheckpoint(false)
    base.count() // materialize once; the two appends overlap (§2.6)
    Hashing.concurrently(
      () => bandRows(base, k, bands)
        .repartition(col("band"))
        .write.mode("append").partitionBy("band")
        .parquet(s"$path/bands"),
      () => base.write.mode("append").parquet(s"$path/shingles"))
  }

  /**
   * Probe a persisted LSH index with an incoming batch: the batch
   * shingles and signs under the index's frozen params (same hash
   * family ⇒ comparable band hashes), its band rows join the
   * PRECOMPUTED corpus buckets (bucket sizes capped per side — the
   * [[minhashLshPairsAgainst]] recall contract), and candidate pairs
   * verify exact Jaccard against the STORED corpus shingle sets —
   * the corpus text is never re-read. Output (batch_id, corpus_id,
   * jaccard ≥ threshold), value-identical to
   * [[minhashLshPairsAgainst]] over the same sides (tested).
   */
  def lshProbeIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String, batch: DataFrame, textCol: String,
                    idCol: String, threshold: Double = 0.8,
                    maxBucket: Int = 1000): DataFrame = {
    val prm = spark.read.parquet(s"$path/params").head()
    val (n, k, bands) =
      (prm.getAs[Int]("n"), prm.getAs[Int]("k"), prm.getAs[Int]("bands"))
    val bBase = shingleBase(batch, textCol, idCol, n)
      .localCheckpoint(false)
    def buckets(rows: DataFrame, out: String): DataFrame =
      rows.groupBy(col("band"), col("bh"))
        .agg(sort_array(collect_list(col("__id"))).as(out))
        .where(size(col(out)) <= maxBucket)
    val idxRows = spark.read.parquet(s"$path/bands")
      .select(col("band").cast(IntegerType).as("band"), col("bh"),
        col("__id"))
    val cand = buckets(bandRows(bBase, k, bands), "__bids")
      .join(buckets(idxRows, "__cids"), Seq("band", "bh"))
      .select(explode(col("__bids")).as("batch_id"), col("__cids"))
      .select(col("batch_id"), explode(col("__cids")).as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    val cSh = spark.read.parquet(s"$path/shingles")
    cand
      .join(bBase.select(col("__id").as("batch_id"),
        col("__sh").as("__sha")), Seq("batch_id"))
      .join(cSh.select(col("__id").as("corpus_id"),
        col("__sh").as("__shb")), Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        jaccardHashed(col("__sha"), col("__shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * EXACT all-pairs n-gram Jaccard ≥ `threshold` over an unblocked
   * corpus, via prefix filtering (the PPJoin principle, Xiao et al.,
   * WWW'08): under any global token order, two sets with Jaccard ≥ τ
   * must share at least one token among each one's first
   * ⌊(1−τ)·|s|⌋+1 tokens — so an inverted index over just the PREFIX
   * tokens finds every qualifying pair, and exact verification does
   * the rest. Unlike [[minhashLshPairs]] there is no banding miss
   * probability and no τ-dependent tuning: the result provably equals
   * the naive all-pairs scan (tested against it).
   *
   * The global order is (corpus frequency asc, hash) — prefixes are
   * each document's RAREST tokens, so prefix buckets stay small on
   * natural corpora; a length pre-filter (τ·|a| ≤ |b| ≤ |a|/τ, with an
   * epsilon so IEEE rounding can only ADD candidates) prunes the
   * in-bucket pairing further. Shuffles: token counts, per-doc
   * re-sort, one bucket aggregation (pairs expand in-row), verify join
   * — all on slim token/id rows; bodies and shingle arrays never
   * shuffle (verify is the standard
   * join-back). Worst case remains inherently quadratic when the TRUE
   * result is quadratic (an all-identical corpus); `maxBucket` caps
   * that corner at the cost of the exactness guarantee for tokens
   * whose prefix bucket overflows — leave it at the default for the
   * proven-exact contract, lower it for hostile corpora.
   */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 3, threshold: Double = 0.7,
                         maxBucket: Int = Int.MaxValue): DataFrame = {
    // same single-materialization contract as minhashLshPairs: the
    // candidate pipeline and both verify join-backs read the slim
    // checkpointed (id, hash array) frame instead of re-hashing text
    val base = shingleBase(df, textCol, idCol, n).localCheckpoint(false)
    verifyJaccard(prefixJaccardCandidates(base, threshold, maxBucket),
      base, threshold)
  }

  /** Candidate (id_a, id_b) pairs of [[prefixJaccardPairs]], exposed for
   *  the pruning tests. Completeness-preserving filters, applied to the
   *  prefix-token bucket join in order of cost:
   *   - length: τ·|b| ≤ |a| ∧ τ·|a| ≤ |b| (Jaccard ≥ τ forces it);
   *   - positional (PPJoin's second filter): a prefix token shared at
   *     0-based positions (pa, pb) of the globally ordered token lists
   *     bounds the overlap by min(pa, pb) + min(|a|−pa, |b|−pb) — at
   *     most min(pa, pb) shared tokens can precede it on both sides,
   *     and at most min of the remaining suffix lengths can follow
   *     (inclusive). Jaccard ≥ τ needs overlap ≥ τ/(1+τ)·(|a|+|b|), so
   *     a token row whose bound falls short generates no candidate; the
   *     pair survives if ANY shared prefix token's bound suffices (the
   *     bound is valid per token, so dropping only short-bound rows
   *     keeps completeness — each epsilon makes pruning strictly
   *     LESS aggressive under IEEE rounding, never more).
   */
  private[ops] def prefixJaccardCandidates(base: DataFrame, threshold: Double,
                                           maxBucket: Int = Int.MaxValue,
                                           positional: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val toks = base.select(col("__id"), explode(col("__sh")).as("__h"))
    val counts = toks.groupBy(col("__h")).agg(count(lit(1)).as("__cnt"))
    // per-doc token list in global (frequency asc, hash) order
    val ordered = toks.join(counts, Seq("__h"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("__cnt"), col("__h")))),
        x => x.getField("__h")).as("__ord"))
    // prefix length ⌊(1−τ)·len⌋+1, epsilon'd so rounding only widens it
    val pfxLen = (floor(size(col("__ord")) * lit(1.0 - threshold) + lit(1e-9))
      + lit(1)).cast(IntegerType)
    val pfx = ordered.select(col("__id"), size(col("__ord")).as("__len"),
        posexplode(slice(col("__ord"), lit(1), pfxLen)))
      .select(col("__id"), col("__len"), col("col").as("__h"),
        col("pos").as("__p"))
    // Inverted index as ONE aggregation (the minhashLshPairs bucket
    // pattern): group the slim (id, len, p) prefix rows per token,
    // expand pairs in-row with the filters applied inside the bucket —
    // sort_array orders items by __id, so i<j gives id_a < id_b by
    // construction. One pfx evaluation and one shuffle replace the
    // prior okToken-count + two-sided self-join (which re-derived the
    // token-ordering pipeline per consumer: 8 corpus scans → 4).
    // Prefix tokens are each doc's RAREST tokens, so buckets are small
    // by construction on natural corpora; `maxBucket` bounds the
    // hostile corner post-collect, the [[minhashLshPairs]] contract
    // (bucket size here = the prior okToken count: same filter, same
    // exactness statement).
    val buckets = pfx.groupBy(col("__h"))
      .agg(sort_array(collect_list(struct(col("__id"), col("__len"),
        col("__p")))).as("__items"))
      .where(size(col("__items")) >= 2 && size(col("__items")) <= maxBucket)
    def lenOk(a: Column, b: Column): Column =
      b.getField("__len") * lit(threshold) <= a.getField("__len") + lit(1e-9) &&
        a.getField("__len") * lit(threshold) <= b.getField("__len") + lit(1e-9)
    def posOk(a: Column, b: Column): Column = {
      val overlapBound =
        least(a.getField("__p"), b.getField("__p")) +
          least(a.getField("__len") - a.getField("__p"),
            b.getField("__len") - b.getField("__p"))
      val alpha = (a.getField("__len") + b.getField("__len")) *
        lit(threshold / (1.0 + threshold))
      overlapBound >= alpha - lit(1e-9)
    }
    val pairStructs = flatten(transform(col("__items"), (a, i) =>
      transform(
        filter(slice(col("__items"), i + 2, size(col("__items"))),
          b => if (positional) lenOk(a, b) && posOk(a, b) else lenOk(a, b)),
        b => struct(a.getField("__id").as("id_a"),
          b.getField("__id").as("id_b")))))
    buckets.select(explode(pairStructs).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------------------------- SimHash

  /**
   * 64-bit SimHash over word tokens: per bit j, sum +1/-1 votes of
   * xxhash64(token) bit j across tokens; the sign forms the fingerprint
   * bit. Built from higher-order array functions — single pass.
   *
   * NOTE: compute the token-hash array ONCE (e.g.
   * `withColumn("__h", transform(TextOps.tokens(c), xxhash64))` then
   * `simhashFromHashes(col("__h"))`) when fingerprinting a corpus —
   * inlined, the 64 per-bit aggregates would each re-hash every token.
   */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextOps.tokens(text), t => xxhash64(t)))

  /** SimHash from a precomputed token-hash array column. */
  def simhashFromHashes(hashes: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val bits = transform(bitIdx, j =>
      when(aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(getbit(h, j) === 1, lit(1L)).otherwise(lit(-1L))) > 0,
        lit(1L)).otherwise(lit(0L)))
    // fold MSB-first with shift/or (bit 63 would overflow ANSI `*2`)
    aggregate(reverse(bits), lit(0L),
      (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs with Manku-style chunk blocking: the 64-bit
   * fingerprint is split into `maxDist + 1` chunks; by pigeonhole, two
   * fingerprints within Hamming ≤ maxDist agree exactly on at least one
   * chunk, so blocking on (chunkIndex, chunkValue) finds every
   * qualifying pair. Verified with exact Hamming ≤ `maxDist`.
   *
   * Scale shape (mirrors [[minhashLshPairs]]): the only data that
   * shuffles is (chunk, value, id, fp) — 20 B × (maxDist+1) per doc;
   * ONE shuffle groups each bucket, pairs expand in-row from the sorted
   * (id, fp) list, and `maxBucket` caps the quadratic corner (oversized
   * buckets — boilerplate/empty docs hashing identically — are DROPPED,
   * a documented recall tradeoff; raise the cap for exhaustive runs).
   * With maxDist = 3 this is the classic 4×16-bit scheme; larger
   * Hamming budgets get proportionally more, narrower chunks
   * (maxDist ≤ 15 → ≥ 4-bit chunks).
   *
   * `tokenHashes` maps the token ARRAY to its 64-bit hash array —
   * native per-element xxhash64 by default (one compiled loop; a
   * `transform` lambda would run interpreted per token); pass the
   * SQL-expressible [[graft.functions.NativeExpressions.tokenHashes60]]
   * (see [[graft.SparkEntry]]'s d04) when a cross-engine oracle must
   * recompute identical fingerprints.
   */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3,
                   tokenHashes: Column => Column =
                     graft.functions.NativeExpressions.tokenHashesXx(_),
                   maxBucket: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("__fid"),
        tokenHashes(TextOps.tokens(col(textCol))).as("__h"))
      .select(col("__fid"),
        graft.functions.NativeExpressions.simhash64(col("__h")).as("__ffp"))
    fingerprintPairs(base, "__fid", "__ffp", maxDist, maxBucket)
  }

  /**
   * Blocked Hamming-pair join over PRECOMPUTED 64-bit fingerprints —
   * the Manku pigeonhole machinery behind [[simhashPairs]], exposed for
   * non-text fingerprints (payload/perceptual hashes,
   * [[Multimodal.payloadNearDups]]). Identical scale shape: only
   * (chunk, value, id, fp) rows shuffle, ONE grouping shuffle, in-row
   * pair expansion, `maxBucket` caps the quadratic corner.
   */
  def fingerprintPairs(df: DataFrame, idCol: String, fpCol: String,
                       maxDist: Int = 3,
                       maxBucket: Int = 10000): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      s"fingerprintPairs supports maxDist in [0, 15], got $maxDist")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val base = df.select(col(idCol).cast(LongType).as("__id"),
        col(fpCol).cast(LongType).as("__fp"))
    val chunks = chunkRows(base, maxDist)
      .select(col("chunk"), col("ck"),
        struct(col("__id"), col("__fp")).as("__d"))

    // one shuffle to group each (chunk, value) bucket; sorted (id, fp)
    // list (ids unique → sorted by id), capped; pairs expand in-row
    val buckets = chunks.groupBy(col("chunk"), col("ck"))
      .agg(sort_array(collect_list(col("__d"))).as("__ds"))
      .where(size(col("__ds")) >= 2 && size(col("__ds")) <= maxBucket)
    val pairStructs = flatten(transform(col("__ds"), (x, i) =>
      transform(slice(col("__ds"), i + 2, size(col("__ds"))), y =>
        struct(x.getField("__id").as("id_a"), y.getField("__id").as("id_b"),
          x.getField("__fp").as("fpa"), y.getField("__fp").as("fpb")))))
    buckets.select(explode(pairStructs).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"),
        hamming(col("__p.fpa"), col("__p.fpb")).cast(LongType).as("dist"))
      .where(col("dist") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  /** One (chunk, ck, __id, __fp) row per Manku chunk key of each
    * fingerprint — the blocking frame [[fingerprintPairs]] groups and
    * the persisted index stores. */
  private def chunkRows(base: DataFrame, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val baseW = 64 / nChunks
    val widths =
      Array.tabulate(nChunks)(c => if (c < 64 % nChunks) baseW + 1 else baseW)
    val starts = widths.scanLeft(0)(_ + _)
    val chunkArr = array((0 until nChunks).map { c =>
      val mask = if (widths(c) == 64) -1L else (1L << widths(c)) - 1L
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("__fp"), starts(c))
          .bitwiseAND(lit(mask)).as("ck"))
    }: _*)
    base.select(col("__id"), col("__fp"), explode(chunkArr).as("__c"))
      .select(col("__c.chunk").as("chunk"), col("__c.ck").as("ck"),
        col("__id"), col("__fp"))
  }

  /** Text-level SimHash fingerprints under a pluggable per-token hash
    * (the [[simhashPairs]] oracle hook). */
  private def simhashFps(df: DataFrame, textCol: String, idCol: String,
      tokenHashes: Column => Column): DataFrame =
    df.select(col(idCol).cast(LongType).as("__id"),
      graft.functions.NativeExpressions.simhash64(
        tokenHashes(TextOps.tokens(col(textCol)))).as("__fp"))

  /**
   * Persisted SimHash/fingerprint near-dup index (round 17; the
   * [[writeLshIndex]]/[[Retrieval]] persisted-index shape for HAMMING
   * near-dups — today [[simhashPairs]] re-fingerprints the corpus per
   * run): stores one (chunk, ck, id, fp) row per Manku chunk key,
   * parquet PARTITIONED BY chunk, plus the frozen `maxDist` params.
   * Probes fingerprint the BATCH only and join the precomputed
   * buckets — the corpus text is never re-read (fingerprints ride the
   * keys, so Hamming verification is in-row). No partition pruning
   * story here (a probe touches every chunk by construction — the
   * pigeonhole needs all of them); the win is the one-time corpus
   * signing and the slim stored rows. Core functions take
   * PRECOMPUTED (id, fp) frames, so payload/perceptual hashes
   * ([[Multimodal.payloadNearDups]]) persist the same way; the
   * `simhash*` wrappers fingerprint text under the same pluggable
   * token hash as [[simhashPairs]] — pass the SAME `tokenHashes` at
   * build, append and probe time (the function cannot be frozen into
   * parquet).
   */
  def writeFingerprintIndex(df: DataFrame, idCol: String, fpCol: String,
      path: String, maxDist: Int = 3): Unit = {
    val base = df.select(col(idCol).cast(LongType).as("__id"),
      col(fpCol).cast(LongType).as("__fp"))
    val spark = df.sparkSession
    import spark.implicits._
    // the two output tables are independent — overlap them (§2.6)
    Hashing.concurrently(
      () => chunkRows(base, maxDist)
        .repartition(col("chunk"))
        .write.mode("overwrite").partitionBy("chunk")
        .parquet(s"$path/chunks"),
      () => Seq(maxDist).toDF("maxDist")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/params"))
  }

  /** Append NEW fingerprints under the frozen `maxDist` — one chunk
    * pass over the batch; existing chunk partitions gain files. Batch
    * ids must be new (re-indexing is a rebuild decision). */
  def appendFingerprintIndex(df: DataFrame, idCol: String,
      fpCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val maxDist = spark.read.parquet(s"$path/params")
      .head().getAs[Int]("maxDist")
    val base = df.select(col(idCol).cast(LongType).as("__id"),
      col(fpCol).cast(LongType).as("__fp"))
    chunkRows(base, maxDist)
      .repartition(col("chunk"))
      .write.mode("append").partitionBy("chunk")
      .parquet(s"$path/chunks")
  }

  /** Probe a persisted fingerprint index: the batch's chunk rows join
    * the stored buckets (per-side `maxBucket` cap — the
    * [[fingerprintPairs]] skew contract), Hamming verifies in-row.
    * Output (batch_id, index_id, dist ≤ maxDist), one row per
    * cross-side pair. */
  def probeFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, fpCol: String,
      maxBucket: Int = 10000): DataFrame = {
    val maxDist = spark.read.parquet(s"$path/params")
      .head().getAs[Int]("maxDist")
    val base = batch.select(col(idCol).cast(LongType).as("__id"),
      col(fpCol).cast(LongType).as("__fp"))
    def buckets(rows: DataFrame, out: String): DataFrame =
      rows.groupBy(col("chunk"), col("ck"))
        .agg(sort_array(collect_list(struct(col("__id"), col("__fp"))))
          .as(out))
        .where(size(col(out)) <= maxBucket)
    val idx = spark.read.parquet(s"$path/chunks")
      .select(col("chunk").cast(IntegerType).as("chunk"), col("ck"),
        col("__id"), col("__fp"))
    buckets(chunkRows(base, maxDist), "__bs")
      .join(buckets(idx, "__cs"), Seq("chunk", "ck"))
      .select(explode(col("__bs")).as("__b"), col("__cs"))
      .select(col("__b"), explode(col("__cs")).as("__c"))
      .select(col("__b.__id").as("batch_id"),
        col("__c.__id").as("index_id"),
        hamming(col("__b.__fp"), col("__c.__fp"))
          .cast(LongType).as("dist"))
      .where(col("dist") <= maxDist)
      .dropDuplicates("batch_id", "index_id")
  }

  /** Text-level build over [[writeFingerprintIndex]]. */
  def writeSimhashIndex(corpus: DataFrame, textCol: String,
      idCol: String, path: String, maxDist: Int = 3,
      tokenHashes: Column => Column =
        graft.functions.NativeExpressions.tokenHashesXx(_)): Unit =
    writeFingerprintIndex(
      simhashFps(corpus, textCol, idCol, tokenHashes), "__id", "__fp",
      path, maxDist)

  /** Text-level append — same `tokenHashes` as the build. */
  def appendSimhashIndex(batch: DataFrame, textCol: String,
      idCol: String, path: String,
      tokenHashes: Column => Column =
        graft.functions.NativeExpressions.tokenHashesXx(_)): Unit =
    appendFingerprintIndex(
      simhashFps(batch, textCol, idCol, tokenHashes), "__id", "__fp",
      path)

  /** Text-level probe — same `tokenHashes` as the build. */
  def simhashProbeIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, textCol: String, idCol: String,
      tokenHashes: Column => Column =
        graft.functions.NativeExpressions.tokenHashesXx(_),
      maxBucket: Int = 10000): DataFrame =
    probeFingerprintIndex(spark, path,
      simhashFps(batch, textCol, idCol, tokenHashes), "__id", "__fp",
      maxBucket)

  /** State entry / output row for [[streamingSimhashMatches]]. */
  final case class SimhashBucketEntry(id: Long, fp: Long, tsMs: Long)
  final case class NearDupMatch(doc_id: Long, matched_id: Long, dist: Int)

  /**
   * STREAMING near-duplicate detection — the stateful twin of
   * [[simhashPairs]]: for each arriving document, emit a
   * (doc_id, matched_id, dist) row for every earlier document within
   * `horizonMs` of event time whose SimHash is within `maxDist`
   * (ingest-time near-dup flagging for a crawl firehose).
   *
   * Shape: each doc maps to its 64-bit fingerprint and explodes to
   * `maxDist+1` Manku chunk keys (stateless, map-only); state lives
   * per (chunk, value) bucket via `flatMapGroupsWithState` and holds
   * at most `maxBucket` recent (id, fp, ts) entries — 24 B each, the
   * same blocking/capping contract as the batch operator, so state
   * size is bounded by #active buckets × maxBucket. The horizon is
   * enforced on EVENT TIME at match point (|Δts| ≤ horizonMs); the
   * watermark + event-time timeout merely garbage-collect state, so
   * results don't depend on batch boundaries. A qualifying pair
   * collides on ≥1 chunk (pigeonhole, as in batch); pairs colliding
   * on several chunks emit once per chunk — `dropDuplicates`
   * downstream if exact-once flags matter. `tokenHashes` is the same
   * oracle hook as [[simhashPairs]]': pass the SQL-expressible
   * `tokenHashes60` when a cross-engine oracle must recompute
   * identical fingerprints (d22 in [[graft.SparkEntry]]).
   */
  def streamingSimhashMatches(docs: DataFrame, textCol: String,
                              idCol: String, tsCol: String,
                              horizonMs: Long, maxDist: Int = 3,
                              maxBucket: Int = 64,
                              tokenHashes: Column => Column =
                                graft.functions.NativeExpressions.tokenHashesXx(_))
      : org.apache.spark.sql.Dataset[NearDupMatch] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxDist >= 0 && maxDist <= 15, s"maxDist in [0,15], got $maxDist")
    require(horizonMs > 0 && maxBucket >= 1, "positive horizon/maxBucket")
    val nChunks = maxDist + 1
    val baseW = 64 / nChunks
    val widths = Array.tabulate(nChunks)(c => if (c < 64 % nChunks) baseW + 1 else baseW)
    val starts = widths.scanLeft(0)(_ + _)
    val chunkArr = array((0 until nChunks).map { c =>
      val mask = if (widths(c) == 64) -1L else (1L << widths(c)) - 1L
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("__fp"), starts(c)).bitwiseAND(lit(mask)).as("ck"))
    }: _*)
    val chunks = docs
      .withWatermark(tsCol, s"$horizonMs milliseconds")
      .select(col(idCol).cast(LongType).as("__id"),
        unix_millis(col(tsCol)).as("__ts"), col(tsCol).as("__evt"),
        graft.functions.NativeExpressions.simhash64(
          tokenHashes(TextOps.tokens(col(textCol)))).as("__fp"))
      .select(col("__id"), col("__ts"), col("__evt"), col("__fp"),
        explode(chunkArr).as("__c"))
      // the watermarked column (__evt) must survive to the stateful
      // operator or event-time timeout is rejected at analysis
      .select(col("__c.chunk").as("chunk"), col("__c.ck").as("ck"),
        col("__id"), col("__fp"), col("__ts"), col("__evt"))
      .as[(Int, Long, Long, Long, Long, java.sql.Timestamp)]

    def fn(key: (Int, Long),
           rows: Iterator[(Int, Long, Long, Long, Long, java.sql.Timestamp)],
           state: org.apache.spark.sql.streaming.GroupState[List[SimhashBucketEntry]])
        : Iterator[NearDupMatch] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val wm = state.getCurrentWatermarkMs()
        var entries = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm)
        val out = List.newBuilder[NearDupMatch]
        rows.toSeq.sortBy(r => (r._5, r._3)).foreach { case (_, _, id, fp, ts, _) =>
          entries.foreach { e =>
            val d = java.lang.Long.bitCount(e.fp ^ fp)
            if (e.id != id && d <= maxDist && math.abs(ts - e.tsMs) <= horizonMs)
              out += NearDupMatch(id, e.id, d)
          }
          entries = (SimhashBucketEntry(id, fp, ts) :: entries).take(maxBucket)
        }
        if (entries.isEmpty) state.remove()
        else {
          state.update(entries)
          state.setTimeoutTimestamp(entries.map(_.tsMs).max + horizonMs)
        }
        out.result().iterator
      }
    }

    chunks.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** State entry / output row for [[streamingMinhashMatches]]. */
  final case class MinhashBucketEntry(id: Long, sig: Array[Long], tsMs: Long)
  final case class MinhashStreamMatch(doc_id: Long, matched_id: Long,
                                      est_jaccard: Double)

  /**
   * STREAMING near-duplicate detection — the stateful twin of
   * [[minhashLshPairs]]: for each arriving document, emit a
   * (doc_id, matched_id, est_jaccard) row for every earlier document
   * within `horizonMs` of event time that lands in one of its LSH band
   * buckets AND whose signature agreement is ≥ `threshold`.
   *
   * Shape: each doc maps ONCE to its k-wide MinHash signature (the same
   * native one-pass expression and coefficient family as batch — same
   * (n, k, bands) ⇒ identical band hashes, so a stream can even be
   * banded against state bootstrapped from a batch corpus) and explodes
   * to `bands` (band, bandHash) keys; state lives per band bucket via
   * `flatMapGroupsWithState` and holds at most `maxBucket` recent
   * (id, sig, ts) entries. The banding is the candidate generator
   * (pigeonhole over bands, exactly the batch LSH contract); the verify
   * step is the unbiased signature-agreement estimator
   * E[agree/k] = Jaccard (Var = J(1−J)/k), NOT the batch operator's
   * exact shingle-set Jaccard — shingle sets are unbounded per doc, so
   * holding them in streaming state would make state size
   * content-proportional. At k=64 the estimator's σ at J=0.8 is 0.05;
   * callers gating a destructive drop should route matches to a
   * side-output and batch-verify with [[verifyJaccard]].
   *
   * State cost: each doc contributes its signature to `bands` buckets —
   * bands × (8k + 24) B (≈8.5 KB at the streaming defaults k=64,
   * bands=16) per doc in horizon, capped per bucket at `maxBucket`
   * entries and garbage-collected by event-time timeout. The horizon is
   * enforced on EVENT TIME at match point, so results don't depend on
   * batch boundaries; pairs colliding on several bands emit once per
   * band — `dropDuplicates` downstream if exactly-once flags matter.
   * `shingles` overrides the shingle-hash map (default
   * [[hashedShingleSet]], xxhash64-based): pass a mod-arithmetic
   * variant (`modNgramHashes`) when a cross-engine oracle must
   * recompute identical signatures (d23 in [[graft.SparkEntry]] —
   * hash values < 2³⁰ keep every a·h+b product inside signed 64-bit
   * on both engines).
   */
  def streamingMinhashMatches(docs: DataFrame, textCol: String,
                              idCol: String, tsCol: String,
                              horizonMs: Long, n: Int = 3, k: Int = 64,
                              bands: Int = 16, threshold: Double = 0.8,
                              maxBucket: Int = 64,
                              shingles: (Column, Int) => Column =
                                hashedShingleSet)
      : org.apache.spark.sql.Dataset[MinhashStreamMatch] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    require(horizonMs > 0 && maxBucket >= 1, "positive horizon/maxBucket")
    val r = k / bands
    val banded = docs
      .withWatermark(tsCol, s"$horizonMs milliseconds")
      .select(col(idCol).cast(LongType).as("__id"),
        unix_millis(col(tsCol)).as("__ts"), col(tsCol).as("__evt"),
        graft.functions.NativeExpressions.minhashSig(
          shingles(col(textCol), n), mhCoeffs(k), MhPrime).as("__sig"))
      .select(col("__id"), col("__ts"), col("__evt"), col("__sig"),
        posexplode(graft.functions.NativeExpressions
          .bandHashes(col("__sig"), bands, r)))
      // the watermarked column (__evt) must survive to the stateful
      // operator or event-time timeout is rejected at analysis
      .select(col("pos").as("band"), col("col").as("bh"),
        col("__id"), col("__sig"), col("__ts"), col("__evt"))
      .as[(Int, Long, Long, Seq[Long], Long, java.sql.Timestamp)]

    def fn(key: (Int, Long),
           rows: Iterator[(Int, Long, Long, Seq[Long], Long, java.sql.Timestamp)],
           state: org.apache.spark.sql.streaming.GroupState[List[MinhashBucketEntry]])
        : Iterator[MinhashStreamMatch] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val wm = state.getCurrentWatermarkMs()
        var entries = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm)
        val out = List.newBuilder[MinhashStreamMatch]
        rows.toSeq.sortBy(t => (t._5, t._3)).foreach { case (_, _, id, sig, ts, _) =>
          val sa = sig.toArray
          entries.foreach { e =>
            if (e.id != id && math.abs(ts - e.tsMs) <= horizonMs) {
              var agree = 0
              var i = 0
              while (i < sa.length) { if (sa(i) == e.sig(i)) agree += 1; i += 1 }
              val est = agree.toDouble / sa.length
              if (est >= threshold) out += MinhashStreamMatch(id, e.id, est)
            }
          }
          entries = (MinhashBucketEntry(id, sa, ts) :: entries).take(maxBucket)
        }
        if (entries.isEmpty) state.remove()
        else {
          state.update(entries)
          state.setTimeoutTimestamp(entries.map(_.tsMs).max + horizonMs)
        }
        out.result().iterator
      }
    }

    banded.groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  // ------------------------------------------------- connected components

  /**
   * Connected components over an undirected edge list — turns near-dup
   * PAIRS (from [[minhashLshPairs]]/[[simhashPairs]]/…) into CLUSTERS,
   * the step a real corpus dedup needs before deciding which copy to
   * keep (pairs alone over-delete: a∼b, b∼c must collapse to ONE
   * surviving doc, not two independent pair decisions).
   *
   * Algorithm: alternating large-star / small-star (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC'14) —
   * converges in O(log² n) rounds (a handful in practice for the
   * short-diameter cluster graphs dedup produces). Each round is two
   * aggregate+join passes over the EDGE LIST ONLY: no adjacency lists
   * are ever materialized (no collect_list), so a hub with 10⁸
   * neighbors costs nothing beyond its edge rows — the property that
   * matters at 100 TB where boilerplate docs form giant near-dup
   * blobs. Per-round lineage is cut with `localCheckpoint` so plans
   * stay O(1) deep across iterations.
   *
   * Returns (id, component): one row per node that appears in `pairs`,
   * with component = MIN id in its connected component (so the root is
   * itself the canonical "keep" id). Nodes not in any pair are absent —
   * callers union singletons back (see [[nearDeduplicate]]).
   *
   * Small-graph fast path: the distributed loop pays ~6 rounds × (two
   * aggregate+join passes + checkpoint + checksum) of pure
   * job-scheduling overhead, which dominates when the PAIR graph is
   * tiny even though the CORPUS is huge — the common case, since LSH
   * banding already shrank the graph to actual near-dup candidates.
   * When the canonical distinct edge count (known from the first
   * checksum, no extra job) is ≤ `driverEdgeLimit`, the (hi, lo)
   * pairs — 16 bytes each, ≤ 16 MB at the default limit — are
   * collected and solved with driver union-find. This mirrors the
   * model-sized-collect contract used for k-means centroids and PQ
   * codebooks: the collected object is bounded by a documented
   * constant, never by corpus size. Above the limit the distributed
   * loop runs unchanged; pass `driverEdgeLimit = 0` to force it.
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 50,
                          driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    // canonical (hi > lo) edges, self-loops dropped
    var edges = pairs
      .select(col(aCol).cast(LongType).as("__a"), col(bCol).cast(LongType).as("__b"))
      .where(col("__a") =!= col("__b"))
      .select(greatest(col("__a"), col("__b")).as("hi"),
        least(col("__a"), col("__b")).as("lo"))
      .distinct()
      .localCheckpoint(false) // lazy: the checksum below materializes it

    // fixpoint detector: (#edges, order-independent content hash) — one
    // cheap aggregate per round, which doubles as the materializing
    // action for the lazy checkpoint (one job per round, not two)
    def checksum(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent over the distinct edge set, and
      // immune to ANSI sum-overflow on 64-bit hash values
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("hi"), col("lo"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var state = checksum(edges)
    if (state._1 > 0L && state._1 <= driverEdgeLimit)
      return driverUnionFind(edges)
    var iter = 0
    var converged = state._1 == 0L
    while (!converged && iter < maxIter) {
      // ---- large-star: center u over the symmetrized edges; with
      // m(u) = min(Γ(u) ∪ {u}), emit (v, m(u)) for every neighbor
      // v > u. Strictly-smaller neighbors re-appear via their own
      // center, so connectivity is preserved without adjacency lists.
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mn")).as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()

      // ---- small-star on the (hi > lo) canonical form: with
      // m(u) = min of u's smaller neighborhood ∪ {u} (= min(lo) here),
      // link every smaller neighbor and u itself to m(u).
      val mins2 = large.groupBy("hi").agg(min("lo").as("mn"))
      val small = large.join(mins2, "hi")
        .where(col("lo") =!= col("mn"))
        .select(col("lo").as("hi"), col("mn").as("lo")) // lo > mn by minimality
        .union(mins2.select(col("hi"), col("mn").as("lo")))
        .distinct()
        .localCheckpoint(false)

      val next = checksum(small)
      converged = next == state
      state = next
      edges = small
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // star edges (node → root) + the roots themselves
    edges.select(col("hi").as("id"), col("lo").as("component"))
      .union(edges.select(col("lo").as("id"), col("lo").as("component")))
      .distinct()
  }

  /**
   * Driver union-find over a BOUNDED canonical edge list (callers have
   * already verified `count ≤ driverEdgeLimit`). Union-by-min keeps the
   * invariant that every tree root is the minimum id in its tree, so a
   * final find() yields component = MIN id — identical output contract
   * to the distributed large-star/small-star loop (pinned by a unit
   * test that runs both paths on the same graph).
   */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("hi"), col("lo")).collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var i = 0
    while (i < es.length) {
      val ra = find(es(i).getLong(0))
      val rb = find(es(i).getLong(1))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      i += 1
    }
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    es.foreach { r => nodes(r.getLong(0)) = (); nodes(r.getLong(1)) = () }
    nodes.keys.toSeq.map(n => (n, find(n))).toDF("id", "component")
  }

  /**
   * Incremental connected-components maintenance (round 16;
   * VERDICT-r15 #7 — the [[Similarity.appendIvfIndex]]/[[dedupAgainst]]
   * face of clustering): merge a BATCH of near-dup pairs into an
   * existing (id, component) assignment without recomputing the whole
   * graph. Only components a batch pair TOUCHES re-solve: the batch's
   * ids semi-join the assignment to their components, the touched
   * components' STAR EDGES (id → component — connectivity-equivalent
   * to their original pair graphs, and far smaller) union the batch
   * pairs, and [[connectedComponents]] re-runs on that subgraph only.
   * Untouched assignment rows pass through BYTE-EXACT (one anti-join).
   * A batch pair may bridge two existing components, link brand-new
   * ids, or introduce a new minimum — all cases collapse to the star
   * property: min id of a merged set is a member, so the sub-solve's
   * min-id roots equal a from-scratch run's (merged ≡ from-scratch,
   * pinned by the d32 oracle and a unit).
   *
   * Scale shape: cost ∝ batch size + touched-component membership,
   * never the full historical pair graph; the two semi/anti joins
   * broadcast the (small) touched-component id set.
   */
  def componentsAgainst(existing: DataFrame, batchPairs: DataFrame,
                        idCol: String = "id",
                        compCol: String = "component",
                        aCol: String = "id_a", bCol: String = "id_b",
                        maxIter: Int = 50,
                        driverEdgeLimit: Long = 1000000L): DataFrame = {
    val bp = batchPairs
      .select(col(aCol).cast(LongType).as("__a"),
        col(bCol).cast(LongType).as("__b"))
      .where(col("__a") =!= col("__b"))
      .localCheckpoint(false)
    val ex = existing.select(col(idCol).cast(LongType).as("id"),
      col(compCol).cast(LongType).as("component"))
    val touchedIds = bp.select(col("__a").as("id"))
      .unionByName(bp.select(col("__b").as("id"))).distinct()
    val touchedComps = ex.join(touchedIds, Seq("id"), "left_semi")
      .select(col("component")).distinct().localCheckpoint(false)
    val untouched = ex.join(broadcast(touchedComps),
      Seq("component"), "left_anti")
    val touched = ex.join(broadcast(touchedComps),
      Seq("component"), "left_semi")
    val subEdges = bp.select(col("__a").as("id_a"),
        col("__b").as("id_b"))
      .unionByName(touched.select(col("id").as("id_a"),
        col("component").as("id_b")))
    val merged = connectedComponents(subEdges, "id_a", "id_b",
      maxIter, driverEdgeLimit)
    untouched.select(col("id"), col("component"))
      .unionByName(merged.select(col("id"), col("component")))
  }

  /**
   * RETRACTION-aware incremental components (round 17; closes
   * [[componentsAgainst]]'s documented merge-only contract): remove a
   * batch of pairs from the graph behind an existing (id, component)
   * assignment and repair only what the removals touch. A deletion can
   * SPLIT a component, so star edges are NOT connectivity-equivalent
   * here — the touched components re-solve over their REAL remaining
   * edge slice of `allPairs` (minus the retracted rows, orientation-
   * canonicalized). Untouched assignment rows pass through BYTE-EXACT;
   * a touched id whose every edge was retracted becomes its own
   * singleton (the from-scratch convention for pair-less ids kept in
   * the assignment). Result ≡ `connectedComponents(allPairs −
   * removedPairs)` plus those singletons (pinned by the d35 oracle and
   * a unit).
   *
   * Contract: `existing` must be the assignment OF `allPairs` (every
   * edge's endpoints share a component); retracting a pair absent from
   * `allPairs` is a no-op beyond marking its endpoints' components
   * touched. Retraction is pair-level — the edge set is distinct, so
   * multiplicities don't apply.
   *
   * Scale shape: cost ∝ removed batch + the touched components'
   * remaining EDGES (one semi-join against the broadcast touched-id
   * set picks that slice out of `allPairs`), never the whole graph.
   * This is the honest deletion cost — connectivity after a cut is a
   * property of the surviving edges, which no summary smaller than the
   * touched slice can answer.
   */
  def componentsRetract(existing: DataFrame, allPairs: DataFrame,
                        removedPairs: DataFrame, idCol: String = "id",
                        compCol: String = "component",
                        aCol: String = "id_a", bCol: String = "id_b",
                        maxIter: Int = 50,
                        driverEdgeLimit: Long = 1000000L): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(col(aCol).cast(LongType).as("__a"),
        col(bCol).cast(LongType).as("__b"))
      .where(col("__a") =!= col("__b"))
      .select(greatest(col("__a"), col("__b")).as("hi"),
        least(col("__a"), col("__b")).as("lo"))
      .distinct()
    val rm = canon(removedPairs).localCheckpoint(false)
    val ex = existing.select(col(idCol).cast(LongType).as("id"),
      col(compCol).cast(LongType).as("component"))
    val touchedIds = rm.select(col("hi").as("id"))
      .unionByName(rm.select(col("lo").as("id"))).distinct()
    val touchedComps = ex.join(touchedIds, Seq("id"), "left_semi")
      .select(col("component")).distinct().localCheckpoint(false)
    val untouched = ex.join(broadcast(touchedComps),
      Seq("component"), "left_anti")
    val touched = ex.join(broadcast(touchedComps),
      Seq("component"), "left_semi").localCheckpoint(false)
    // the surviving edges of the touched components: an edge never
    // crosses components under the contract, so the hi-endpoint
    // semi-join picks exactly the touched slice
    // no broadcast hint here: the touched-id set scales with the
    // touched components' membership (unlike the component-id set) —
    // AQE picks broadcast when it fits
    val keptEdges = canon(allPairs)
      .join(touched.select(col("id").as("hi")).distinct(),
        Seq("hi"), "left_semi")
      .join(rm, Seq("hi", "lo"), "left_anti")
    val solved = connectedComponents(
      keptEdges.select(col("hi").as("id_a"), col("lo").as("id_b")),
      "id_a", "id_b", maxIter, driverEdgeLimit)
    val singletons = touched.select(col("id"))
      .join(solved.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    untouched.select(col("id"), col("component"))
      .unionByName(solved.select(col("id"), col("component")))
      .unionByName(singletons)
  }

  /**
   * Near-duplicate corpus dedup, end to end: keep exactly one document
   * (the min id) per connected component of the near-dup pair graph,
   * plus every document that is in no pair. One left-anti join of the
   * corpus against the (small) set of non-root cluster members — the
   * document bodies stream through once and never shuffle.
   */
  def nearDeduplicate(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val drop = connectedComponents(pairs)
      .where(col("id") =!= col("component"))
      .select(col("id"))
    df.join(drop, df(idCol).cast(LongType) === drop("id"), "left_anti")
  }

  /**
   * [[nearDeduplicate]] with a caller-chosen keeper: within each
   * near-dup cluster, keep the row ranked FIRST by `pref` (sort
   * expressions over `df`'s columns, e.g. a quality score — ties must
   * end in a unique key for determinism) instead of the min id.
   * `pref` expressions are evaluated AFTER the inner join with the
   * cluster map, i.e. only for clustered rows (a small fraction of the
   * corpus) — pass the scoring expression itself rather than
   * pre-materializing a score column over every document. Bodies still
   * stream through one final anti-join.
   */
  def nearDeduplicateBy(df: DataFrame, pairs: DataFrame, idCol: String,
                        pref: Seq[Column]): DataFrame = {
    // cluster-map columns get reserved names so an idCol literally
    // named "id" (or a df column named "component") stays unambiguous
    val cc = connectedComponents(pairs).select(
      col("id").as("__cc_id"), col("component").as("__cc_comp"))
    val members = df.join(cc, df(idCol).cast(LongType) === col("__cc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cc_comp")).orderBy(pref: _*)
    val drop = members
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") > 1)
      .select(col("__cc_id"))
    df.join(drop, df(idCol).cast(LongType) === drop("__cc_id"), "left_anti")
  }

  // -------------------------------------------------- embedding near-dup

  /**
   * Embedding-cosine near-duplicate pairs within blocks. The block key
   * bounds the pair blow-up (use an LSH bucket from
   * [[Similarity.hyperplaneBucket]] for unblocked corpora). Blocks
   * larger than `maxBlock` rows are dropped (see [[boundedBlocks]]) so
   * a degenerate block key cannot go quadratic.
   */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            blockCol: String, threshold: Double,
                            maxBlock: Int = 10000): DataFrame = {
    val ok = boundedBlocks(df, blockCol, maxBlock)
    val base = df.select(col(blockCol).as("__blk"),
      col(idCol).cast(LongType).as("__id"), col(vecCol).as("__v"),
      Similarity.norm(col(vecCol)).as("__n"))
    val l = base.join(ok, Seq("__blk"))
      .select(col("__blk"), col("__id").as("id_a"),
        col("__v").as("__va"), col("__n").as("__na"))
    val r = base.select(col("__blk"), col("__id").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    l.join(r, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineWithNorms(col("__va"), col("__vb"),
          col("__na"), col("__nb")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /**
   * Blocked Jaro\u2013Winkler near-match pairs over a (short-string) name
   * column \u2014 the entity-resolution scorer tuned for names/titles where
   * edit distance over-penalizes suffix drift ([[fuzzyPairs]]' \u2014 the
   * Levenshtein sibling's \u2014 complement; Winkler's prefix boost is the
   * point). Values dedupe first (score distinct strings, not rows),
   * candidates block on the leading `blockChars` characters \u2014 the d18
   * contract: blocking IS the scale lever, and a prefix block is
   * natural here because Jaro\u2013Winkler \u2265 0.85 without a shared first
   * character is rare by construction (the prefix boost).
   *
   * Scale: distinct names are vocabulary-sized; the block join's
   * fan-out is per-block-quadratic, capped by block granularity
   * (raise `blockChars` for finer blocks). The scorer is the
   * [[graft.functions.NativeExpressions.JaroWinkler]] codegen kernel
   * \u2014 no UDF, no boxing.
   */
  def jaroWinklerPairs(df: DataFrame, nameCol: String, threshold: Double,
                       blockChars: Int = 1): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0 && blockChars >= 1,
      s"bad parameters: threshold=$threshold blockChars=$blockChars")
    val names = df.select(col(nameCol).as("name"))
      .where(col("name").isNotNull).distinct()
      .withColumn("__blk", substring(col("name"), 1, blockChars))
      .localCheckpoint(false)
    names.as("a").join(names.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        graft.functions.NativeExpressions
          .jaroWinkler(col("a.name"), col("b.name")).as("jw"))
      .where(col("jw") >= threshold)
  }

  /**
   * Dedup threshold-sweep ledger: exact near-dup PAIR counts at each
   * candidate Jaccard threshold, measured from ONE [[prefixJaccardPairs]]
   * run at the lowest threshold \u2014 the planning artifact behind "where
   * do we set \u03c4": lshPlan gives the PROBABILISTIC S-curve, this gives
   * the measured pair volume per cut on the actual corpus (cumulative-
   * from-above, like the curation frontier). Thresholds with zero
   * pairs zero-fill.
   *
   * Scale: one PPJoin pass at min(thresholds); each surviving pair
   * expands IN-ROW to the thresholds it clears and partial-aggregates
   * \u2014 no per-threshold re-run.
   */
  def thresholdSweep(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 3,
                     thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    require(thresholds.nonEmpty, "need thresholds")
    val ts = thresholds.sorted
    val pairs = prefixJaccardPairs(df, textCol, idCol, n, ts.head, maxBucket)
    val tArr = array(ts.map(lit): _*)
    val counts = pairs
      .select(explode(filter(tArr, t => col("jaccard") >= t)).as("threshold"))
      .groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    df.sparkSession.range(1)
      .select(explode(tArr).as("threshold"))
      .join(counts, Seq("threshold"), "left")
      .select(col("threshold"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
  }
}
