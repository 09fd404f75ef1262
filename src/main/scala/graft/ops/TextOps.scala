package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language identification, document
 * fingerprinting. Everything is composed from built-in
 * `org.apache.spark.sql.functions` (higher-order array functions +
 * regexes), so every operator stays inside whole-stage codegen and
 * scales linearly with zero shuffle — at 100 TB these run as a single
 * map stage over the parquet scan with full column pruning.
 *
 * Determinism note: all arithmetic is either integer or a fixed
 * per-row sequence of IEEE double ops, so results are bit-identical
 * across partitionings and engines (used by the DuckDB oracle).
 */
object TextOps {

  /** Whitespace tokens of a document; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count as BIGINT (oracle-friendly). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /**
   * A BPE-ish subword count: counts maximal runs of letters, digits, or
   * single punctuation marks — a cheap deterministic proxy for tokenizer
   * load (regex splitting mirrors the GPT-2 pre-tokenizer's
   * letters/digits/other classes).
   */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast(LongType)

  private val EnStopwords = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /** Count of English stopword tokens. */
  def stopwordCount(text: Column): Column = {
    val pat = EnStopwords.mkString("(?i)\\b(", "|", ")\\b")
    size(regexp_extract_all(text, lit(pat), lit(0))).cast(LongType)
  }

  /**
   * Quality score in [0,1]: blends length, punctuation density and
   * stopword ratio — the standard cheap heuristics used to pre-filter
   * web text before training. Fixed double arithmetic per row.
   */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = least(nChars.cast(DoubleType) / lit(400.0), lit(1.0))
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(stopwordCount(text).cast(DoubleType) / nTok.cast(DoubleType))
    val punctRatio = when(nChars === 0, lit(0.0))
      .otherwise(punctCount(text).cast(DoubleType) / nChars.cast(DoubleType))
    // weights sum to 1; punct is a penalty above 10% density
    lenScore * lit(0.5) + least(stopRatio * lit(4.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2)
  }

  /** Alphabetic-run word count: robust to punctuation/whitespace
    * variation, identical under Java regex and RE2 (plain class). */
  def wordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))).cast(LongType)

  /** Sentence count: maximal runs of terminal punctuation. Documents
    * with no terminator at all count as one sentence downstream (the
    * readability guard), not zero. */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast(LongType)

  /** Syllable proxy: vowel-group runs in the lowercased text — the
    * standard cheap estimator (each maximal [aeiouy]+ run ≈ one
    * syllable nucleus). */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast(LongType)

  /**
   * Flesch reading ease (Flesch 1948): 206.835 − 1.015·(words/sentences)
   * − 84.6·(syllables/words), with both denominators floored at 1 so
   * empty/unterminated documents score deterministically instead of
   * NULLing out. Pure per-row double arithmetic — single map stage,
   * whole-stage codegen, zero shuffle at any scale.
   */
  def fleschScore(text: Column): Column = {
    val w = greatest(wordCount(text), lit(1L)).cast(DoubleType)
    val s = greatest(sentenceCount(text), lit(1L)).cast(DoubleType)
    val y = syllableCount(text).cast(DoubleType)
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w)
  }

  /**
   * Code-vs-prose heuristic for corpus routing (send code to the code
   * tokenizer, drop it from prose-only mixes): density of code symbol
   * characters plus indented-line starts, weighted 2:3, per character.
   * `isCode` thresholds the score at 0.06 — tuned so JSON/source blobs
   * trip it while heavily-punctuated prose does not. Deterministic
   * double ops; both regexes are dialect-neutral (plain classes + (?m)).
   */
  def codeScore(text: Column): Column = {
    val sym = size(regexp_extract_all(text,
      lit("[{}();=<>\\[\\]]"), lit(0))).cast(DoubleType)
    val indents = size(regexp_extract_all(text,
      lit("(?m)^(?:    |\\t)"), lit(0))).cast(DoubleType)
    (sym * lit(2.0) + indents * lit(3.0)) /
      (length(text).cast(DoubleType) + lit(1.0))
  }

  def isCode(text: Column): Column = codeScore(text) > lit(0.06)

  /**
   * Gopher-style repetition/format quality gate (Rae et al. 2021,
   * "Scaling Language Models: Methods, Analysis & Insights from
   * Training Gopher", §A1.1): the per-document structural rules used
   * to pre-filter web corpora, each emitted as a metric plus the
   * boolean gate, and the conjunction as `pass`. Rules (defaults are
   * the published bounds, scaled where the published one assumes
   * full-web docs):
   *   - word count within [minWords, maxWords];
   *   - mean word length within [3, 10] chars (alphabetic-run words);
   *   - ≤ 90 % of lines start with a bullet; ≤ 30 % end in an ellipsis;
   *   - symbol-to-word ratio (# or …) ≤ 0.1;
   *   - ≥ 80 % of whitespace tokens contain an alphabetic char;
   *   - at least `minStopwords` DISTINCT members of the 8-stopword set
   *     appear as whole words.
   * Pure per-row regex + higher-order-array arithmetic: single map
   * stage, whole-stage codegen, zero shuffle at any corpus size.
   * Ratios are exact count ratios (IEEE-identical across engines).
   */
  def gopherGate(text: Column, minWords: Int = 10, maxWords: Int = 100000,
                 minStopwords: Int = 2): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast(LongType)
    val words = regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))
    val nWords = size(words).cast(LongType)
    val meanWordLen = when(nWords === 0, lit(0.0)).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w))
        .cast(DoubleType) / nWords.cast(DoubleType))
    val ls = lines(text)
    val nLines = size(ls).cast(DoubleType)
    val bulletRatio = size(filter(ls,
        l => trim(l).rlike("^[-*•]"))).cast(DoubleType) / nLines
    val ellipsisRatio = size(filter(ls,
        l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast(DoubleType) / nLines
    val symbolRatio = when(nWords === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[#…]"), lit(0)))
        .cast(DoubleType) / nWords.cast(DoubleType))
    val alphaRatio = when(nTok === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast(DoubleType) /
        nTok.cast(DoubleType))
    val lowered = lower(text)
    val nStopDistinct = EnStopwords.map(s =>
      when(lowered.rlike("\\b" + s + "\\b"), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val pass =
      nWords.between(minWords, maxWords) &&
      meanWordLen.between(3.0, 10.0) &&
      bulletRatio <= lit(0.9) && ellipsisRatio <= lit(0.3) &&
      symbolRatio <= lit(0.1) && alphaRatio >= lit(0.8) &&
      nStopDistinct >= lit(minStopwords.toLong)
    struct(nWords.as("n_words"), meanWordLen.as("mean_word_len"),
      bulletRatio.as("bullet_ratio"), ellipsisRatio.as("ellipsis_ratio"),
      symbolRatio.as("symbol_ratio"), alphaRatio.as("alpha_ratio"),
      nStopDistinct.as("n_stop_distinct"), pass.as("pass"))
  }

  /**
   * Encoding-damage fingerprint: counts the artifacts that mark a
   * document as mis-decoded somewhere in its ingestion chain —
   * U+FFFD replacement characters (decoder gave up), C0 control
   * characters (binary bleed; tab/newline/CR excluded), and the
   * classic UTF-8-read-as-Latin-1/CP-1252 mojibake digraphs
   * ("â€™", "Ã©", …). `suspect` flags any artifact; non-ASCII ratio is
   * reported (not gated — multilingual text is not damage). One
   * codegen map stage, zero shuffle; all regexes are plain character
   * classes/alternations, identical under Java regex and RE2/DuckDB.
   */
  def mojibakeStats(text: Column): Column = {
    val repl = size(regexp_extract_all(text, lit("\\uFFFD"), lit(0)))
      .cast(LongType)
    val ctrl = size(regexp_extract_all(text,
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit(0))).cast(LongType)
    val moji = size(regexp_extract_all(text,
      lit("\\u00E2\\u20AC[\\u2122\\u0153\\u201C\\u00A6]|" +
        "\\u00C3[\\u00A9\\u00A8\\u00A4\\u00B6\\u00BC\\u00B1]"), lit(0)))
      .cast(LongType)
    val nonAsciiRatio = when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[^\\x00-\\x7F]"), lit(0)))
        .cast(DoubleType) / length(text).cast(DoubleType))
    struct(repl.as("n_replacement"), ctrl.as("n_ctrl"), moji.as("n_mojibake"),
      nonAsciiRatio.as("nonascii_ratio"),
      (repl > 0 || ctrl > 0 || moji > 0).as("suspect"))
  }

  /** Per-language stopword regexes for the n-gram/stopword langid
   *  heuristic. Order matters: ties resolve to the earlier language. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|is|of|to|was|for)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|la|et|les|des|est|une)\\b",
    "es" -> "\\b(el|los|y|las|una|es|que)\\b")

  /**
   * Language-ID heuristic: counts language-marker stopword hits per
   * candidate language, returns the argmax ('und' = undetermined when
   * nothing matches). Deterministic tie-break: first language in
   * [[LangMarkers]] order wins.
   */
  def langId(text: Column): Column = {
    val lower0 = lower(text)
    val hits: Seq[(String, Column)] = LangMarkers.map { case (l, pat) =>
      l -> size(regexp_extract_all(lower0, lit(pat), lit(0))).cast(LongType)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = hits.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (l, h)) => acc.when(h === best, lit(l))
    }
    chain.otherwise(lit("und"))
  }

  /**
   * All per-document counters in ONE native pass (vs seven regex scans):
   * `[n_tok, n_sub, n_punct, n_stop, h_en, h_de, h_fr, h_es]`.
   * Value-identical to the regex-composed functions above (asserted by
   * OpsSpec). Materialize once per document and feed [[qualityScoreF]]/
   * [[langIdF]] — the fused path for corpus-scale curation where the
   * regex passes dominate the map stage.
   */
  def features(text: Column): Column =
    graft.functions.NativeExpressions.textFeatures(text)

  /** [[qualityScore]] reading a [[features]] array (same arithmetic). */
  def qualityScoreF(f: Column, nChars: Column): Column = {
    val nTok = element_at(f, 1)
    val lenScore = least(nChars.cast(DoubleType) / lit(400.0), lit(1.0))
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(element_at(f, 4).cast(DoubleType) / nTok.cast(DoubleType))
    val punctRatio = when(nChars === 0, lit(0.0))
      .otherwise(element_at(f, 3).cast(DoubleType) / nChars.cast(DoubleType))
    lenScore * lit(0.5) + least(stopRatio * lit(4.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2)
  }

  /** [[langId]] reading a [[features]] array (same argmax/tie-break). */
  def langIdF(f: Column): Column = {
    val hits = LangMarkers.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(f, 5 + i)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = hits.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (l, h)) => acc.when(h === best, lit(l))
    }
    chain.otherwise(lit("und"))
  }

  /**
   * Language-ID report with a CONFIDENCE margin: the [[langId]] argmax
   * plus best/second marker-hit counts and the relative margin
   * `(best − second) / best` (0 when nothing matched) — the gate
   * signal for routing ambiguous documents to a heavier classifier
   * instead of trusting a one-hit argmax. Map-only over the fused
   * [[features]] array: the language decision and its confidence cost
   * one byte-walk per document.
   */
  def langIdReport(df: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String): org.apache.spark.sql.DataFrame = {
    val hits = LangMarkers.indices.map(i => element_at(col("__f"), 5 + i))
    val sorted = array_sort(array(hits: _*))
    val k = LangMarkers.size
    val best = element_at(sorted, k)
    val second = element_at(sorted, k - 1)
    df.select(col(idCol), features(col(textCol)).as("__f"))
      .select(col(idCol), langIdF(col("__f")).as("lang_pred"),
        best.as("best_hits"), second.as("second_hits"),
        when(best === 0, lit(0.0))
          .otherwise((best - second).cast(DoubleType) / best.cast(DoubleType))
          .as("margin"))
  }

  /** Lines of a document (regex '\n' split; every empty piece kept,
    * matching both engines' split semantics). */
  def lines(text: Column): Column = split(text, "\n")

  def lineCount(text: Column): Column = size(lines(text)).cast(LongType)

  /** Fraction of duplicated lines — the Gopher-style repeated-line
    * quality signal. 0 for single-line/empty documents. */
  def dupLineFraction(text: Column): Column = {
    val l = lines(text)
    (size(l) - size(array_distinct(l))).cast(DoubleType) /
      size(l).cast(DoubleType)
  }

  /**
   * Fraction of the document's word n-grams taken by the single most
   * frequent n-gram (Gopher-style repetition signal; high values mark
   * boilerplate/looping text). Map-only per row: native n-gram hashes,
   * sort, longest equal run. 0 when the document has no n-grams.
   */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = sort_array(
      graft.functions.NativeExpressions.modNgramHashes(tokens(text), n))
    val best = aggregate(grams,
      struct(lit(-1L).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(grams) === 0, lit(0.0))
      .otherwise(best.cast(DoubleType) / size(grams).cast(DoubleType))
  }

  /**
   * CORPUS-level duplicate n-gram fraction per document: of each doc's
   * distinct word n-grams, the fraction that also appears in at least
   * one OTHER document. The cross-document repetition signal (template
   * boilerplate, mirrored articles) that [[dupLineFraction]]/
   * [[topNgramFraction]] — both within-doc — cannot see; high values
   * flag docs whose content is mostly shared, feeding near-dedup
   * triage and quality gates.
   *
   * Scale shape (the TF-IDF census): distinct 64-bit gram hashes
   * explode per doc, document frequency is one partially-aggregated
   * groupBy (shuffle ∝ distinct grams), the join back is gram-keyed,
   * and the per-doc fraction re-aggregates on doc id. Bodies never
   * shuffle; gram STRINGS never materialize (native n-gram hashing,
   * collision odds ~2⁻⁶⁴). Every input doc gets a row — gram-less
   * (short/empty) docs report 0.
   */
  def dupNgramFraction(df: org.apache.spark.sql.DataFrame, textCol: String,
                       idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val grams = df.select(col(idCol).cast(LongType).as("__id"),
      explode(Dedup.hashedShingleSet(col(textCol), n)).as("__g"))
    val dfreq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val stats = grams.join(dfreq, Seq("__g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("__dup"))
    df.select(col(idCol).cast(LongType).as("__id"))
      .join(stats, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(round(col("__dup").cast(DoubleType) /
          col("n_grams").cast(DoubleType), 6), lit(0.0)).as("dup_gram_fraction"))
  }

  /**
   * Corpus-wide duplicate-line removal (C4/Gopher-style boilerplate
   * scrub): every line that exactly repeats an earlier line ANYWHERE in
   * the corpus is dropped; the first occurrence — ordered by (doc id,
   * position) — survives. Lines shorter than `minLineLen` characters
   * are always kept: deduping blank lines and one-word bullets across
   * a corpus would strip formatting, not boilerplate. Documents whose
   * lines are all removed come out as empty strings (callers gate on
   * [[lineCount]]/length downstream).
   *
   * Scale: short lines never enter the window — they are kept
   * unconditionally, so they route AROUND it and union back before
   * reassembly. That leaves the keyed path's rank filter a pure
   * `__rk = 1` conjunct, the shape Catalyst's `InferWindowGroupLimit`
   * matches, so the plan carries a Partial+Final WindowGroupLimit
   * (plan-asserted in OpsSpec): each map task forwards ONE candidate
   * per line-hash it sees, and a boilerplate line repeated 10^9 times
   * costs the final window partition at most one row per map task —
   * not a single-task 10^9-row sort. Long lines shuffle once keyed on
   * a 128-bit content hash; the two branches mean the source is
   * scanned twice, a map-only cost that is the right trade against
   * the hot-key sort. Reassembly groups by doc id; per-doc state is
   * that document's own kept lines (bounded by document size).
   */
  def dedupLinesAcrossCorpus(df: org.apache.spark.sql.DataFrame,
                             textCol: String, idCol: String,
                             minLineLen: Int = 10): org.apache.spark.sql.DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(lines(col(textCol))).as(Seq("__pos", "__ln")))
    // kept unconditionally → no rank needed → bypasses the window
    val short = exploded.where(length(col("__ln")) < minLineLen)
    // 128-bit line key: same birthday-bound reasoning as Dedup.exact
    val keyed = exploded.where(length(col("__ln")) >= minLineLen)
      .withColumn("__h1", xxhash64(col("__ln")))
      .withColumn("__h2", xxhash64(lit(0x11e5eed), col("__ln")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h1"), col("__h2"))
      .orderBy(col(idCol), col("__pos"))
    // pure rank-1 filter ⇒ InferWindowGroupLimit fires (an OR with the
    // short-line predicate here would defeat it — see scaladoc)
    val firsts = keyed
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col(idCol), col("__pos"), col("__ln"))
    val cleaned = short.unionByName(firsts)
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__ln")))),
        x => x.getField("__ln")), "\n").as("text_clean"))
    // documents whose every line was scrubbed fall out of the groupBy —
    // join the id list back so they surface as empty strings
    df.select(col(idCol)).join(cleaned, Seq(idCol), "left")
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
  }

  /**
   * Corpus boilerplate-line scrub by DOCUMENT FREQUENCY: a line is
   * boilerplate when it appears in at least `minDocFreq` distinct
   * documents, and every copy is dropped — unlike
   * [[dedupLinesAcrossCorpus]] (which keeps the first occurrence),
   * nav-bars/footers/cookie banners carry no information worth keeping
   * once, so the whole equivalence class goes. Lines shorter than
   * `minLineLen` are exempt (formatting, not boilerplate). Documents
   * whose every line is scrubbed come out as empty strings.
   *
   * Scale: long lines shuffle once as 24 B (hash₁, hash₂, doc id) rows
   * to count distinct documents per line (partial-agg over the
   * line-key groupBy; the distinct pass is the same shuffle). The hot
   * set — lines over the threshold — is tiny by construction
   * (boilerplate classes, not the corpus), so the anti-join back is a
   * broadcast under AQE and the line BODIES never move: they stay in
   * the scan that reassembles. A line repeated 10⁹ times costs its
   * partial counts, never a 10⁹-row sort (no window in this plan at
   * all, unlike the keep-first variant which needs one to pick the
   * winner).
   */
  def scrubBoilerplateLines(df: org.apache.spark.sql.DataFrame,
                            textCol: String, idCol: String, minDocFreq: Int,
                            minLineLen: Int = 10): org.apache.spark.sql.DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    val exploded = df
      .select(col(idCol), posexplode(lines(col(textCol))).as(Seq("__pos", "__ln")))
    val short = exploded.where(length(col("__ln")) < minLineLen)
    val keyed = exploded.where(length(col("__ln")) >= minLineLen)
      .withColumn("__h1", xxhash64(col("__ln")))
      .withColumn("__h2", xxhash64(lit(0x11e5eed), col("__ln")))
    val hot = keyed.select(col("__h1"), col("__h2"), col(idCol)).distinct()
      .groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select(col("__h1"), col("__h2"))
    val kept = keyed.join(hot, Seq("__h1", "__h2"), "left_anti")
      .select(col(idCol), col("__pos"), col("__ln"))
    val cleaned = short.unionByName(kept)
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__ln")))),
        x => x.getField("__ln")), "\n").as("text_clean"))
    df.select(col(idCol)).join(cleaned, Seq(idCol), "left")
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
  }

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
   * the MOSS algorithm): slide a window of `window` consecutive token
   * `n`-gram hashes and keep each window's MINIMUM — the selected set
   * is position-independent yet guarantees that any shared run of at
   * least `window + n − 1` tokens between two documents contributes at
   * least one COMMON fingerprint. Documents with fewer than `n` tokens
   * have no grams and produce no rows; with fewer grams than `window`,
   * the single window is the whole gram list (standard boundary).
   * Output: one row per distinct selected hash, `(idCol, fp)`.
   *
   * Map-only: grams come from the native modular n-gram hasher (no
   * gram strings materialize), and the window-min selection is an
   * in-row array expression — zero shuffle, the fingerprint set streams
   * straight to whatever consumes it ([[Dedup.winnowDupPairs]] groups
   * it by fp). The per-row cost is O(grams × window) comparisons,
   * bounded and branch-free. The gram hash is plain modular arithmetic
   * (mod 1e9+7), so SQL oracles reproduce the exact fingerprint sets.
   */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, textCol: String,
                         idCol: String, n: Int = 3,
                         window: Int = 4): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && window >= 1, s"n and window must be >= 1: n=$n window=$window")
    val grams = graft.functions.NativeExpressions
      .modNgramHashes(tokens(col(textCol)), n)
    df.select(col(idCol), grams.as("__g"))
      .where(size(col("__g")) > 0)
      .select(col(idCol), explode(graft.functions.NativeExpressions
        .winnowMins(col("__g"), window)).as("fp"))
  }

  /** Compositional twin of the native window-min selection — a fresh
    * w-element slice per window, O(grams·w) allocations; kept only to
    * pin the native expression's values (bit-equality-tested). */
  private[ops] def winnowMinsComposed(grams: Column, window: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(grams) - lit(window - 1))),
      i => array_min(slice(grams, i, lit(window)))))

  /**
   * Corpus token frequencies: explode → groupBy(token). Map-side partial
   * counts make the shuffle proportional to the vocabulary, not the
   * token stream — the standard first step for stopword mining and
   * frequency-based filtering at corpus scale.
   */
  def tokenFrequencies(df: org.apache.spark.sql.DataFrame,
                       textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /**
   * One-row corpus token-distribution report: total token occurrences,
   * distinct types, type-token ratio, and the fraction of all
   * occurrences covered by the `topK` most frequent tokens (the
   * Zipf-head coverage that drives stopword lists and vocabulary-size
   * decisions before training a tokenizer).
   *
   * Scale: one explode + partially-aggregated count per token (shuffle
   * ∝ vocabulary, the [[tokenFrequencies]] pass), then two global
   * aggregates over the VOCABULARY rows: totals, and a top-K sum where
   * the top-K selection is a TakeOrdered (per-partition bounded heaps,
   * no full sort — ties broken by token for a deterministic boundary).
   * Nothing ever returns to the driver but the single report row.
   */
  def corpusTokenStats(df: org.apache.spark.sql.DataFrame, textCol: String,
                       topK: Int = 100): org.apache.spark.sql.DataFrame = {
    val freq = tokenFrequencies(df, textCol)
    val totals = freq.agg(sum(col("n")).as("n_tokens"),
      count(lit(1)).as("n_types"))
    val top = freq.orderBy(col("n").desc, col("token")).limit(topK)
      .agg(coalesce(sum(col("n")), lit(0L)).as("__topn"))
    totals.crossJoin(top).select(
      col("n_tokens"), col("n_types"),
      round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("type_token_ratio"),
      round(col("__topn").cast(DoubleType) / col("n_tokens"), 6).as(s"top${topK}_coverage"))
  }

  /**
   * Adjacent character-pair counts within tokens — the statistic one
   * BPE training step maximizes (the most frequent pair becomes the
   * next merge). A full BPE train is a driver loop re-running this
   * census on re-segmented text; the census itself is the distributed
   * part and is what a 100 TB corpus contributes. Returns the `topK`
   * pairs by count (ties broken by pair for a deterministic boundary).
   *
   * Scale: explode ∝ characters with map-side partial counts — the
   * shuffle is ∝ distinct pairs (alphabet², tiny), and the top-K is a
   * TakeOrdered. One pass, bodies never shuffle.
   */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, textCol: String,
                    topK: Int = 20): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val tok = col("token")
    df.select(explode(tokens(col(textCol))).as("token"))
      .where(length(tok) >= 2)
      .select(explode(transform(sequence(lit(1), length(tok) - 1),
        i => tok.substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(topK)
  }

  /**
   * Zipf-law fit over the frequency head: least-squares slope and
   * intercept of ln(freq) against ln(rank) for the `topK` most
   * frequent tokens. Natural corpora sit near slope −1; a much
   * flatter slope flags template/boilerplate-dominated text and a
   * much steeper one flags degenerate repetition — a one-row corpus
   * health check to trend per crawl.
   *
   * Scale: one tokenFrequencies pass (shuffle ∝ vocabulary), a
   * TakeOrdered head, and closed-form least-squares sums over topK
   * rows (the post-limit rank window runs on topK rows, not the
   * vocabulary). Output: (n_terms, slope, intercept).
   */
  def zipfFit(df: org.apache.spark.sql.DataFrame, textCol: String,
              topK: Int = 100): org.apache.spark.sql.DataFrame = {
    require(topK >= 2, s"topK must be >= 2: $topK")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    val ranked = tokenFrequencies(df, textCol)
      .orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("__r", row_number().over(w))
      .select(log(col("__r").cast(DoubleType)).as("__x"),
        log(col("n").cast(DoubleType)).as("__y"))
    ranked.agg(count(lit(1)).as("n_terms"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("n_terms"),
        ((col("n_terms") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("n_terms") * col("__sxx") - col("__sx") * col("__sx")))
          .as("slope"),
        ((col("__sy") - ((col("n_terms") * col("__sxy") -
          col("__sx") * col("__sy")) /
          (col("n_terms") * col("__sxx") - col("__sx") * col("__sx"))) *
          col("__sx")) / col("n_terms")).as("intercept"))
  }

  /**
   * Pointwise mutual information over the vocabulary's Zipf head:
   * document-level co-occurrence of the `topK` most frequent tokens,
   *
   *   pmi(a,b) = ln( n_ab · N / (n_a · n_b) )
   *
   * with document-presence counts (multiple occurrences in one doc
   * count once — the collocation convention). Pairs below
   * `minPairCount` co-occurrences are noise and dropped. The standard
   * collocation/phrase-mining signal, and a cheap topic-structure
   * probe before anything embedding-based.
   *
   * Scale: the head list is one TakeOrdered (bounded heaps) collected
   * driver-side — topK strings, model-sized like the centroid
   * collects — and broadcast back as a literal filter. Each document
   * reduces IN-ROW to its sorted head-token subset (≤ topK), then
   * presence rows (token, null) and pair rows (tok_a, tok_b) expand
   * in-row from the SAME reduced array (the capped-bucket pattern —
   * bounded by topK²/2 per doc) into ONE partially-aggregated count
   * over (tok_a, tok_b): the corpus is tokenized once for the census
   * and the shuffle is ∝ distinct head pairs, never the corpus. The
   * aggregated census — ≤ topK·(topK+1)/2 rows, bounded by the
   * `topK ≤ 4096` guard — is collected and the PMI arithmetic
   * finishes driver-side (the model-sized-collect contract; splitting
   * the census in-plan would re-derive the tokenize pipeline per
   * consumer, since grouping-column predicates push below the agg and
   * break exchange reuse).
   */
  def topTokenPmi(df: org.apache.spark.sql.DataFrame, textCol: String,
                  idCol: String, topK: Int = 100,
                  minPairCount: Long = 5L): org.apache.spark.sql.DataFrame = {
    require(topK >= 2 && topK <= 4096,
      s"topK must be in [2, 4096] (census collect is topK²-bounded): $topK")
    val freq = tokenFrequencies(df, textCol)
    val top = freq.orderBy(col("n").desc, col("token")).limit(topK)
      .select(col("token")).collect().map(_.getString(0))
    val topLit = array(top.sorted.map(lit).toIndexedSeq: _*)
    val docs = df
      .select(col(idCol),
        array_sort(array_intersect(array_distinct(tokens(col(textCol))),
          topLit)).as("__ht"))
      .where(size(col("__ht")) > 0)
    // one in-row expansion emits BOTH the pair rows (tok_a, tok_b) and
    // the presence rows (token, null) into one shared count aggregation
    val pairStructs = flatten(transform(col("__ht"), (x, i) =>
      transform(slice(col("__ht"), i + 2, size(col("__ht"))),
        y => struct(x.as("tok_a"), y.as("tok_b")))))
    val singleStructs = transform(col("__ht"),
      x => struct(x.as("tok_a"),
        lit(null).cast(StringType).as("tok_b")))
    val census = docs
      .select(explode(concat(pairStructs, singleStructs)).as("__p"))
      .select(col("__p.tok_a").as("tok_a"), col("__p.tok_b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("__n"))
      .collect()
    val nd = df.where(length(trim(col(textCol))) > 0)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val nTok = census.filter(_.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // same double arithmetic as the prior in-plan form: (n_ab·N) /
    // (n_a·n_b), then java.lang.Math.log — bit-identical to Catalyst's
    // Log over the same product/quotient shape, so oracles are unmoved
    val rows = census.toSeq
      .filter(r => !r.isNullAt(1) && r.getLong(2) >= minPairCount)
      .map { r =>
        val a = r.getString(0); val b = r.getString(1); val nab = r.getLong(2)
        (a, b, nab,
          math.log(nab.toDouble * nd.toDouble /
            (nTok(a).toDouble * nTok(b).toDouble)))
      }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("tok_a", "tok_b", "n_ab", "pmi")
  }

  /**
   * TF-IDF top-`k` terms per document: term frequency within the
   * document × smoothed inverse document frequency
   * `ln((N+1)/(df+1))` over the corpus. Ranking key is the score
   * ROUNDED to 6 decimals (then df asc, token asc): rounding makes
   * mathematically-equal scores compare equal on every engine —
   * raw-double ordering would let 1-ulp libm differences flip the
   * rank of real ties like tf=2/idf=ln x vs tf=1/idf=ln x² — and the
   * deterministic (df, token) tie-break finishes the total order.
   *
   * Scale: explode → partial-agg count per (doc, token) (shuffle ∝
   * distinct doc-term pairs, with map-side combine), df per token
   * (shuffle ∝ vocabulary), broadcast of the 1-row corpus count, then a
   * window per doc. Token strings shuffle once; bodies never do.
   */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val docs = df
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) > 0)
    val tf = docs.select(col(idCol), explode(col("__tk")).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, token) → df = plain count, kept
    // as a partially aggregated count (never a buffered window group,
    // so a stopword in every document costs one long, not 10^10 rows).
    // The always-true `tf >= 1` guard makes this branch consume tf's
    // count column — without it Catalyst rewrites the branch to a
    // distinct-agg, the two subplans stop being canonically equal, and
    // the runtime tokenizes the corpus TWICE instead of reusing the tf
    // shuffle (reuse is plan-asserted in OpsSpec).
    val dfreq = tf.where(col("tf") >= 1)
      .groupBy("token").agg(count(lit(1)).as("df"))
    // non-empty trimmed text ⟺ ≥1 token: counts docs without a third
    // tokenize pass
    val nDocs = df.where(length(trim(col(textCol))) > 0)
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(round(col("tfidf"), 6).desc, col("df").asc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") *
        log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank"),
        col("tfidf"))
  }

  /**
   * Unigram log-likelihood quality score — the cheap statistical-LM
   * filter: mean over a document's tokens of `ln(count(token) /
   * total_tokens)` under the corpus's own unigram distribution. Gibberish
   * and OCR noise score far below fluent text because their tokens are
   * corpus-rare. Returns (id, n_tokens, avg_logprob); zero-token
   * documents are absent (nothing to average).
   *
   * Scale: one token-frequency aggregation (shuffle ∝ vocabulary,
   * map-side combine), then the token stream joins its frequency and
   * partially aggregates (sum, count) per document — tokens shuffle
   * once keyed by token and once keyed by doc id; bodies never move.
   */
  def unigramLogLikelihood(df: org.apache.spark.sql.DataFrame,
                           textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val freqs = toks.groupBy("token").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).as("__t"))
    toks.join(freqs, "token")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("__c").cast(DoubleType) / col("__t").cast(DoubleType)))
          .as("avg_logprob"))
  }

  /** Adjacent-token bigram structs (u, v) from a MATERIALIZED token
   *  array column; fewer than two tokens → empty array (the
   *  [[Dedup.shingles]] guard — an unguarded `sequence(1, 0)` would
   *  count DOWN and fabricate bigrams). The argument must be a real
   *  column, not an inline `tokens(text)` expression: lambda bodies
   *  referencing an outer non-attribute expression get the whole
   *  subtree CLONED into every `element_at`, so an inline split
   *  re-tokenizes the document once per element — O(n²·len) per row
   *  (measured 6× the whole query's runtime before this was fixed). */
  private def bigramsOf(toks: Column): Column =
    when(size(toks) < 2,
      array().cast(ArrayType(new StructType()
        .add("u", StringType).add("v", StringType))))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("u"),
          element_at(toks, i + 1).as("v"))))

  /**
   * Stupid-Backoff bigram LM score (Brants et al., EMNLP'07 — the
   * web-scale LM scoring rule: no normalization, no held-out tuning):
   * each document in `df` is scored under the language model of a
   * `reference` corpus as the mean over its token transitions of
   *
   *   ln S(v|u),  S(v|u) = c(u,v)/c(u)                if c(u,v) > 0
   *               S(v|u) = α · (c(v)+1)/(N+V)          otherwise
   *
   * with α = 0.4 (the paper's constant), reference unigram total N,
   * reference vocabulary size V (Laplace on the backoff keeps OOV
   * tokens finite — the [[Pipeline.dsirWeights]] convention). This is
   * the CCNet-style "perplexity filter" shape: score a crawl against a
   * clean reference corpus and gate on the score. Scoring a corpus
   * against itself degenerates to pure bigram ML (every bigram is
   * seen ≥ once), which is the fluency twin of
   * [[unigramLogLikelihood]].
   *
   * Returns (idCol, n_bigrams, avg_logprob); documents with fewer than
   * two tokens are absent (no transitions to score).
   *
   * Scale shape: reference bigram + unigram counts are two partial-agg
   * shuffles (∝ distinct bigrams / vocabulary); the scored corpus's
   * transition stream left-joins the two count maps keyed by bigram
   * and by token, then partial-aggregates per doc — transitions
   * shuffle once per key family, bodies never move. N and V are
   * driver scalars, model-sized.
   */
  def bigramLogLikelihood(df: org.apache.spark.sql.DataFrame,
                          reference: org.apache.spark.sql.DataFrame,
                          textCol: String, idCol: String,
                          alpha: Double = 0.4): org.apache.spark.sql.DataFrame = {
    val refToks = reference.select(explode(tokens(col(textCol))).as("__w"))
    val uni = refToks.groupBy("__w").agg(count(lit(1)).as("__cu"))
    val g = uni.agg(sum("__cu").as("n"), count(lit(1)).as("v")).collect()(0)
    val (n, v) = (g.getLong(0), g.getLong(1))
    val bi = reference
      .select(tokens(col(textCol)).as("__tk"))
      .select(explode(bigramsOf(col("__tk"))).as("__b"))
      .groupBy(col("__b.u").as("__u"), col("__b.v").as("__v"))
      .agg(count(lit(1)).as("__cb"))
    val trans = df
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(bigramsOf(col("__tk"))).as("__b"))
      .select(col(idCol), col("__b.u").as("__u"), col("__b.v").as("__v"))
    val s = trans
      .join(bi, Seq("__u", "__v"), "left")
      .join(uni.select(col("__w").as("__u"), col("__cu").as("__cuu")),
        Seq("__u"), "left")
      .join(uni.select(col("__w").as("__v"), col("__cu").as("__cuv")),
        Seq("__v"), "left")
      .select(col(idCol),
        when(col("__cb").isNotNull,
          log(col("__cb").cast(DoubleType) / col("__cuu").cast(DoubleType)))
          .otherwise(log(lit(alpha) *
            (coalesce(col("__cuv"), lit(0L)).cast(DoubleType) + lit(1.0)) /
            lit((n + v).toDouble))).as("__lp"))
    s.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_logprob"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al., LREC'20): score
   * every document under the clean-reference bigram LM
   * ([[bigramLogLikelihood]]), then split each language into
   * head / middle / tail at the per-language tertiles — the standard
   * "keep head+middle, drop or downweight tail" curation gate.
   * Thresholds use the exact engine `percentile_disc` aggregate
   * ((value → count) buffer, map-side partial merge — never a
   * collect_list), computed over scores ROUNDED to 6 decimals so both
   * engines rank the identical multiset: thresholds, and therefore
   * every bucket decision, are cross-engine exact. Documents with
   * fewer than two tokens have no score and are absent (the t18
   * contract).
   *
   * Scale: scoring is the [[bigramLogLikelihood]] shape (count-map
   * joins, bodies never move); thresholds are one partial-agg groupBy
   * producing a languages-sized table that broadcasts back. Buckets
   * land as a map-side CASE — no corpus re-shuffle for the decision.
   */
  def perplexityBuckets(df: org.apache.spark.sql.DataFrame,
                        reference: org.apache.spark.sql.DataFrame,
                        textCol: String, idCol: String,
                        langCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val scored = bigramLogLikelihood(df, reference, textCol, idCol)
    val s = df.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("__s", round(col("avg_logprob"), 6))
    val th = s.groupBy(col(langCol)).agg(
      GraftSqlBridge.percentileDisc(col("__s"), 1.0 / 3).as("__t1"),
      GraftSqlBridge.percentileDisc(col("__s"), 2.0 / 3).as("__t2"))
    s.join(broadcast(th), Seq(langCol))
      .select(col(idCol), col(langCol), col("n_bigrams"),
        col("__s").as("avg_logprob"),
        when(col("__s") <= col("__t1"), lit("tail"))
          .when(col("__s") <= col("__t2"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /**
   * Canonical text normalization (the step before exact-dedup hashing /
   * fingerprinting, so trivially-different copies collapse): lowercase,
   * control characters → space, whitespace runs → single space, trim.
   * Control chars are scrubbed FIRST so the later `\s+` collapse sees
   * only plain spaces (Java's `\s` includes \x0B, RE2's does not — this
   * ordering keeps the operator engine-exact). Map-only, zero shuffle.
   */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /**
   * PII scrub patterns, applied in order (SSN before phone — the phone
   * pattern would otherwise eat the dashed SSN form). Heuristic by
   * design: over-matching long digit runs is the accepted tradeoff for
   * a training-corpus scrubber. Every pattern sits in the Java∩RE2
   * common regex subset (ASCII classes, `\b`, bounded repeats — no
   * lookaround, no backrefs), so SQL engines reproduce it exactly.
   */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "<SSN>",
    "\\+?[0-9][0-9\\-\\s()]{6,}[0-9]\\b" -> "<PHONE>")

  /** Redact emails, IPv4s, SSNs and phone-like digit runs. Map-only. */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /**
   * High-entropy token detector — the credential/secret scrub for code
   * and web corpora (API keys, tokens, hashes read as long
   * near-uniform strings; natural words don't): flags DISTINCT
   * (document, token) pairs where the token has at least `minLen`
   * characters and per-character Shannon entropy (in nats)
   *
   *   H = ln(n) − (Σ_c cnt_c · ln(cnt_c)) / n
   *
   * of at least `minEntropy`. The distinct-character sum runs over the
   * SORTED character set on both engines, so the double accumulation
   * order — and therefore the rounded entropy — is engine-identical.
   * Output: (idCol, token, tok_len, entropy), entropy rounded to 6.
   *
   * Scale: map-only — tokenize, length-gate (kills ~all tokens before
   * any entropy math), per-token character work is O(len·distinct)
   * array expressions inside codegen; the distinct (id, token) dedup
   * is in-row (array_distinct on the token list), never a shuffle.
   * Compose with [[scrubPii]]: regexes catch structured PII, entropy
   * catches the unstructured keys regexes can't enumerate.
   */
  def secretTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String, minLen: Int = 12,
                   minEntropy: Double = 2.0): org.apache.spark.sql.DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1: $minLen")
    val longToks = filter(array_distinct(tokens(col(textCol))),
      t => length(t) >= minLen)
    val tok = col("token")
    val n = length(tok).cast(DoubleType)
    val chars = array_sort(array_distinct(split(tok, "")))
    val sumCnt = aggregate(
      transform(chars, c => {
        val cnt = size(filter(split(tok, ""), x => x === c)).cast(DoubleType)
        cnt * log(cnt)
      }),
      lit(0.0), (acc, t) => acc + t)
    val entropy = log(n) - sumCnt / n
    df.select(col(idCol), explode(longToks).as("token"))
      .withColumn("tok_len", length(tok).cast(LongType))
      .withColumn("entropy", round(entropy, 6))
      .where(col("entropy") >= minEntropy)
  }

  /** Positional weights 31^0..31^7, cycled — fits exact int64 math. */
  private val FpWeights: Seq[Long] =
    Iterator.iterate(1L)(_ * 31L).take(8).toSeq
  private val FpMod = 1000000007L

  /**
   * Document fingerprint: position-weighted rolling hash over the
   * character code points, mod 1e9+7. Pure int64 math — exact on any
   * engine, no hash-function mismatch with the oracle. Native one-pass
   * expression ([[graft.functions.NativeExpressions.Fingerprint64]]);
   * [[fingerprintComposed]] keeps the built-in formulation for
   * cross-checking.
   */
  def fingerprint(text: Column): Column =
    graft.functions.NativeExpressions.fingerprint64(text)

  /** Built-in-composed fingerprint — same values as [[fingerprint]],
   *  O(n²) per document (kept for tests only). */
  def fingerprintComposed(text: Column): Column = {
    val w = array(FpWeights.map(lit): _*)
    val idx = sequence(lit(1), length(text))
    val terms = transform(idx, i =>
      ascii(substring(text, i, lit(1))).cast(LongType) *
        element_at(w, pmod(i - 1, lit(8)) + 1))
    when(length(text) === 0, lit(0L))
      .otherwise(pmod(aggregate(terms, lit(0L), (acc, t) => acc + t), lit(FpMod)))
  }

  /**
   * Shannon entropy of a document's token distribution (nats):
   * `H = −Σ_t (c_t/n)·ln(c_t/n)` — low entropy flags repetitive /
   * boilerplate text (keyword stuffing, log spew), high entropy flags
   * hash-like noise; both are standard corpus-quality cut signals next
   * to [[qualityScore]]. Empty docs score 0.
   *
   * Computed ENTIRELY in-row with higher-order functions (distinct
   * tokens → per-token counts → fold): no explode, no shuffle — the
   * histogram a (doc, token) groupBy would shuffle corpus-wide stays
   * inside the row. Cost is O(distinct·len) per document, fine for the
   * natural-language distinct-token counts this targets; the fixed
   * left-to-right fold keeps the double sum engine-portable.
   */
  def tokenEntropy(text: Column): Column = {
    val tk = tokens(text)
    val n = size(tk).cast(DoubleType)
    val counts = transform(array_distinct(tk),
      c => size(filter(tk, x => x === c)).cast(DoubleType))
    when(size(tk) === 0, lit(0.0)).otherwise(
      -aggregate(counts, lit(0.0),
        (acc, c) => acc + (c / n) * log(c / n)))
  }

  /**
   * Exact heavy hitters over the corpus token stream with BOUNDED
   * aggregation state: every token whose exact count exceeds
   * `n / (capacity + 1)` of the `n` total tokens, found by the
   * two-pass Misra–Gries scheme (Misra & Gries 1982, "Finding repeated
   * elements"):
   *
   *   1. a typed `Aggregator` runs the Misra–Gries sketch per
   *      partition and merges sketches — at most `capacity` counters
   *      of state ANYWHERE, regardless of vocabulary size; its
   *      guarantee is that every item above the n/(capacity+1)
   *      frequency threshold survives as a candidate (a superset —
   *      never a miss);
   *   2. an exact recount of the ≤`capacity` candidates: the token
   *      stream is re-scanned with a broadcast-candidate map-side
   *      filter (only candidate occurrences shuffle), and the exact
   *      threshold keeps true heavy hitters only.
   *
   * The sketch's partition-order nondeterminism cannot reach the
   * output: pass 2's exact counts decide membership, the sketch only
   * bounds WHICH tokens get recounted. This is the vocabulary-scale
   * answer to "top tokens" when a full groupBy's state (one counter
   * per DISTINCT token) is the thing that doesn't fit — the same
   * bounded-state contract as the HLL and GK twins. Output: (token,
   * cnt, n_total), exact, threshold-complete.
   */
  def heavyHitters(docs: DataFrame, textCol: String,
                   capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    val spark = docs.sparkSession
    val toks = docs.select(explode(tokens(col(textCol))).as("token"))
    val n = toks.count()
    import org.apache.spark.sql.Encoders
    val cands: Seq[String] =
      if (n == 0L) Seq.empty
      else toks.as(Encoders.STRING)
        .select(new MisraGriesAgg(capacity).toColumn)
        .head()
    // model-sized collect: ≤ capacity candidate tokens, by construction
    val candDf = broadcast(
      spark.createDataset(cands)(Encoders.STRING).toDF("token"))
    toks.join(candDf, Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(capacity.toLong + 1L) > lit(n))
      .withColumn("n_total", lit(n))
  }

  /**
   * Misra–Gries sketch as a typed [[Aggregator]]: buffer = at most
   * `capacity` (token → counter) entries; `reduce` increments a
   * present token, inserts while room, else applies the global
   * decrement; `merge` sums counters then truncates back to the
   * largest `capacity` entries, subtracting the (capacity+1)-th
   * largest value (the standard mergeable-MG reduction — error stays
   * ≤ n/(capacity+1) after any merge tree). `finish` returns the
   * surviving candidate tokens sorted (order is cosmetic; the exact
   * recount decides membership).
   */
  private[ops] class MisraGriesAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, scala.collection.mutable.Map[String, Long], Seq[String]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: scala.collection.mutable.Map[String, Long] =
      scala.collection.mutable.Map.empty
    def reduce(m: scala.collection.mutable.Map[String, Long],
               tok: String): scala.collection.mutable.Map[String, Long] = {
      m.get(tok) match {
        case Some(c) => m.update(tok, c + 1L)
        case None if m.size < capacity => m.update(tok, 1L)
        case None =>
          // global decrement; drop zeroed counters (amortized O(1)/item)
          val dead = m.iterator.flatMap { case (k, c) =>
            if (c == 1L) Some(k) else { None } }.toList
          m.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(m.remove)
          m.filterInPlace((_, c) => c > 0L)
      }
      m
    }
    def merge(a: scala.collection.mutable.Map[String, Long],
              b: scala.collection.mutable.Map[String, Long])
        : scala.collection.mutable.Map[String, Long] = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      if (a.size > capacity) {
        val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        a.mapValuesInPlace((_, c) => c - cut)
        a.filterInPlace((_, c) => c > 0L)
      }
      a
    }
    def finish(m: scala.collection.mutable.Map[String, Long]): Seq[String] =
      m.keys.toSeq.sorted
    def bufferEncoder: Encoder[scala.collection.mutable.Map[String, Long]] =
      Encoders.kryo[scala.collection.mutable.Map[String, Long]]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /**
   * Per-document lexical-diversity profile: token count, type count
   * (distinct tokens), type-token ratio, hapax fraction (types seen
   * once), and Yule's K = 10\u2074\u00b7(\u03a3 f\u1d62\u00b2 \u2212 N)/N\u00b2 (Yule 1944) \u2014 the
   * repetitiveness constant that is length-insensitive where TTR is
   * not. The standard corpus-curation signals for boilerplate and
   * generated-text screening.
   *
   * Scale shape: tokens explode and aggregate per (doc, token) \u2014 the
   * t-family contract (tokens shuffle, bodies never), partial
   * aggregation absorbs in-doc repeats map-side; the second groupBy
   * reduces per-doc histograms to five counters. Empty documents are
   * kept via the left join back to the id spine with zero-fill.
   */
  def lexicalDiversity(df: DataFrame, textCol: String,
                       idCol: String = "doc_id"): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
    val prof = tok.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"),
      sum(col("__c") * col("__c")).as("__sumsq"))
    df.select(col(idCol)).join(prof, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_types").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("ttr"),
        when(coalesce(col("n_types"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_hapax").cast(DoubleType) /
            col("n_types").cast(DoubleType)).as("hapax_frac"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(lit(10000.0) *
            (col("__sumsq") - col("n_tokens")).cast(DoubleType) /
            (col("n_tokens") * col("n_tokens")).cast(DoubleType))
          .as("yule_k"))
  }

  /**
   * N-gram novelty: the fraction of each document's DISTINCT token
   * n-grams never seen in any EARLIER document (doc-id order = corpus
   * arrival order) \u2014 the memorization/freshness signal: a crawl dump
   * whose late documents score near 0 is re-crawling what it already
   * has, and per-source novelty curves rank feeds by marginal value.
   * Documents with fewer than n tokens have no n-grams and score 1.0
   * (vacuously novel), by convention.
   *
   * Scale: distinct HASHED grams explode to slim (hash, doc) rows \u2014
   * the t-family token-shuffle contract at 8 B per gram \u2014 partial-agg
   * min(doc) per gram, then one partial-agg count join back per doc.
   */
  def ngramNovelty(df: DataFrame, textCol: String,
                   idCol: String = "doc_id", n: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    // HASHED grams (the p02 decontamination rolling-mod chain, native
    // one-pass kernel): 8 B per gram instead of ~40 B strings \u2014 the
    // only thing that shuffles here \u2014 while staying SQL-mirrorable
    // (the chain is pure integer arithmetic). Collision rate ~1e-9
    // per pair at the 1e9+7 modulus: novelty is a rate metric, not an
    // exact-match verdict, so that is inside its noise floor.
    val grams = array_distinct(graft.functions.NativeExpressions
      .modNgramHashes(tokens(col(textCol)), n))
    val perDoc = df.select(col(idCol), grams.as("__g"))
      .localCheckpoint(false)
    val exploded = perDoc.select(col(idCol), explode(col("__g")).as("__gram"))
    val firstSeen = exploded.groupBy(col("__gram"))
      .agg(min(col(idCol)).as("__first"))
    val novel = exploded.join(firstSeen, Seq("__gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
    perDoc.select(col(idCol)).join(novel, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(1.0))
          .otherwise(col("n_novel").cast(DoubleType) /
            col("n_grams").cast(DoubleType)).as("novelty"))
  }

  /**
   * Writing-system census: per-document counts and fractions of CJK,
   * Latin and Cyrillic characters plus the dominant script \u2014 the
   * router in front of script-specific tokenizers (whitespace
   * tokenization is WRONG for CJK; a corpus labeled `zh` that is
   * actually Latin-script pinyin needs different handling than han
   * text). `dominant` is the argmax with ties to the earlier class in
   * (cjk, latin, cyrillic) order, `none` for empty/other-only text.
   * Zero shuffle \u2014 one codegen map stage.
   */
  def scriptCensus(text: Column): Column = {
    val nChars = length(text)
    val cjk = size(regexp_extract_all(text,
      lit("[\\u4E00-\\u9FFF]"), lit(0))).cast(LongType)
    val latin = size(regexp_extract_all(text,
      lit("[A-Za-z]"), lit(0))).cast(LongType)
    val cyr = size(regexp_extract_all(text,
      lit("[\\u0400-\\u04FF]"), lit(0))).cast(LongType)
    def frac(c: Column): Column =
      when(nChars === 0, lit(0.0))
        .otherwise(c.cast(DoubleType) / nChars.cast(DoubleType))
    val dominant =
      when(cjk === 0 && latin === 0 && cyr === 0, lit("none"))
        .when(cjk >= latin && cjk >= cyr, lit("cjk"))
        .when(latin >= cyr, lit("latin"))
        .otherwise(lit("cyrillic"))
    struct(cjk.as("n_cjk"), latin.as("n_latin"), cyr.as("n_cyrillic"),
      frac(cjk).as("cjk_frac"), frac(latin).as("latin_frac"),
      frac(cyr).as("cyrillic_frac"), dominant.as("dominant"))
  }
}
