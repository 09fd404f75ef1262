package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the signature/similarity hot paths.
 *
 * Spark's higher-order array functions (`transform`/`aggregate`/
 * `zip_with`) are CodegenFallback — every lambda step is interpreted.
 * For corpus-scale signature computation (k×N multiply-mod per doc for
 * MinHash, 64×N bit votes for SimHash, d multiply-adds per vector pair
 * for dot products) that interpretation dominates the runtime, so these
 * operators get true `doGenCode` implementations: tight JIT-compiled
 * loops inside whole-stage codegen, zero boxing.
 *
 * Each expression has an interpreted `nullSafeEval` that is
 * EXACTLY the same arithmetic as the generated code and as the
 * compositional builders in [[graft.ops]] (asserted by OpsSpec), so
 * results are bit-identical whichever path runs.
 */
object NativeExpressions {

  def col(e: Expression): Column = GraftSqlBridge.column(e)
  def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  private def requireArrayOf(e: Expression, elem: DataType,
                             name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(t, _) if t == elem => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<$elem>, got $other")
    }

  // ------------------------------------------------------------- MinHash

  /**
   * k-wide MinHash signature over a hash array: each input hash is
   * masked to its low 32 bits, then out[j] = min over h of
   * (a_j·h + b_j) mod prime; empty → prime sentinel. One pass over the
   * hashes, k updates per element.
   * Overflow-safe: a < 2^31, masked h < 2^32 ⇒ a·h + b < 2^63.
   */
  final case class MinHashSig(child: Expression, coeffA: Array[Long],
                              coeffB: Array[Long], prime: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val k = coeffA.length
      val out = Array.fill(k)(prime)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = arr.getLong(i) & 0xFFFFFFFFL
        var j = 0
        while (j < k) {
          val v = (coeffA(j) * h + coeffB(j)) % prime
          if (v < out(j)) out(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
      val k = coeffA.length
      // All emitted locals come from ctx.freshName: several native
      // expressions can share one codegen scope (e.g. a projection
      // computing signature + bands), and Janino rejects redefinition.
      val out = ctx.freshName("mhOut")
      val n = ctx.freshName("mhN")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |long[] $out = new long[$k];
           |java.util.Arrays.fill($out, ${prime}L);
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $c.getLong($i) & 0xFFFFFFFFL;
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
           |    if ($v < $out[$j]) $out[$j] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  // ------------------------------------------------------------- SimHash

  /**
   * 64-bit SimHash from a token-hash array: per bit j, the sign of
   * Σ tokens (±1 by bit j of the hash) forms fingerprint bit j.
   * Same arithmetic as [[graft.ops.Dedup.simhashFromHashes]].
   */
  final case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, LongType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Long](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
        i += 1
      }
      var fp = 0L
      var j = 63
      while (j >= 0) {
        fp = (fp << 1) | (if (votes(j) > 0) 1L else 0L)
        j -= 1
      }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val votes = ctx.freshName("shVotes")
      val n = ctx.freshName("shN")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val j2 = ctx.freshName("j")
      val fp = ctx.freshName("shFp")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |long[] $votes = new long[64];
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $c.getLong($i);
           |  for (int $j = 0; $j < 64; $j++) {
           |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1L : -1L;
           |  }
           |}
           |long $fp = 0L;
           |for (int $j2 = 63; $j2 >= 0; $j2--) {
           |  $fp = ($fp << 1) | ($votes[$j2] > 0 ? 1L : 0L);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  // ------------------------------------------------------ band hashing

  /**
   * LSH band hashes from a MinHash signature: the k-wide signature is
   * split into `bands` bands of `r = k/bands` rows; out[b] is a 64-bit
   * mix of band b's values. Replaces an interpreted
   * slice→toString→concat→hash chain with one loop; band hash values
   * are internal bucketing keys (any deterministic mix works).
   */
  final case class BandHashes(child: Expression, bands: Int, r: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_hashes"

    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = b.toLong + 1L
        var j = 0
        while (j < r) {
          acc = (acc ^ sig.getLong(b * r + j)) * -7046029254386353131L
          j += 1
        }
        out(b) = acc
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val out = ctx.freshName("bhOut")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $acc = (long) $b + 1L;
           |  for (int $j = 0; $j < $r; $j++) {
           |    $acc = ($acc ^ $c.getLong($b * $r + $j)) * -7046029254386353131L;
           |  }
           |  $out[$b] = $acc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): BandHashes =
      copy(child = newChild)
  }

  // ---------------------------------------------------- n-gram hashing

  /**
   * Hashes of word n-grams straight from a token array — the shingle
   * strings are never materialized. Each token is xxhash64'd once
   * (O(len) total, not O(len·n)), and an n-gram's hash is a positional
   * polynomial combination of its token hashes (distinct n-grams
   * collide with probability ~2^-64).
   *
   * Near-dup semantics are preserved exactly: Jaccard over these hash
   * sets equals Jaccard over the string shingle sets (modulo that
   * negligible collision probability).
   */
  final case class NgramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val m = len - n + 1
      if (m <= 0) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](len)
      var i = 0
      while (i < len) {
        val s = arr.getUTF8String(i)
        th(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val out = new Array[Long](m)
      i = 0
      while (i < m) {
        var acc = 0L
        var j = 0
        while (j < n) {
          acc = (acc ^ th(i + j)) * -7046029254386353131L // 0x9E3779B97F4A7C15
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val len = ctx.freshName("ngLen")
      val m = ctx.freshName("ngM")
      val out = ctx.freshName("ngOut")
      val th = ctx.freshName("ngTh")
      val i1 = ctx.freshName("i")
      val s1 = ctx.freshName("s")
      val i2 = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |int $len = $c.numElements();
           |int $m = $len - $n + 1;
           |long[] $out;
           |if ($m <= 0) {
           |  $out = new long[0];
           |} else {
           |  long[] $th = new long[$len];
           |  for (int $i1 = 0; $i1 < $len; $i1++) {
           |    org.apache.spark.unsafe.types.UTF8String $s1 = $c.getUTF8String($i1);
           |    $th[$i1] = org.apache.spark.sql.catalyst.expressions.XXH64
           |      .hashUnsafeBytes($s1.getBaseObject(), $s1.getBaseOffset(), $s1.numBytes(), 42L);
           |  }
           |  $out = new long[$m];
           |  for (int $i2 = 0; $i2 < $m; $i2++) {
           |    long $acc = 0L;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $acc = ($acc ^ $th[$i2 + $j]) * -7046029254386353131L;
           |    }
           |    $out[$i2] = $acc;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): NgramHashes =
      copy(child = newChild)
  }

  // ------------------------------------------------- token-array hashing

  /**
   * Per-element xxhash64 of a string array — the native replacement for
   * `transform(tokens, xxhash64)`: `transform` is CodegenFallback, so
   * the lambda runs interpreted per token; this is one compiled loop.
   * Identical values to Spark's `xxhash64` on each element (same
   * default seed 42).
   */
  final case class TokenHashesXx(child: Expression, seed: Long = 42L)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_hashes_xx"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        // null element → seed unchanged, like xxhash64(null) in the
        // transform-lambda formulation this replaces
        out(i) =
          if (arr.isNullAt(i)) seed
          else {
            val s = arr.getUTF8String(i)
            org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
          }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("txN")
      val out = ctx.freshName("txOut")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |int $n = $c.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($c.isNullAt($i)) { $out[$i] = ${seed}L; } else {
           |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
           |    $out[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
           |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): TokenHashesXx =
      copy(child = newChild)
  }

  /** Per-element [[fp60]] packed 60-bit hash of a string array — the
    * SQL-mirrorable twin of [[TokenHashesXx]], one compiled loop. */
  final case class TokenHashes60(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_hashes60"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      // null element hashes like the empty string (0) — documented,
      // never crashes on caller-supplied arrays with null slots
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) 0L else fp60(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("thN")
      val out = ctx.freshName("thOut")
      val i = ctx.freshName("i")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |int $n = $c.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $c.isNullAt($i) ? 0L
           |    : graft.functions.NativeExpressions.fp60($c.getUTF8String($i));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): TokenHashes60 =
      copy(child = newChild)
  }

  /**
   * SQL-mirrorable word n-gram hashes straight from a token array: each
   * token hashes to its 30-bit rolling fingerprint (fp64 mod 1e9+7), and
   * an n-gram combines its token hashes as `acc = (acc·131 + th) mod
   * 1e9+7` — every intermediate stays < 2^38, so a DuckDB oracle
   * reproduces the values with plain BIGINT arithmetic (unlike
   * [[NgramHashes]]' wrap-around xor-multiply). One compiled pass; used
   * by decontamination, where cross-engine verification matters more
   * than the extra collision headroom of 64-bit hashes.
   */
  final case class ModNgramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"n must be >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "mod_ngram_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      new GenericArrayData(modNgrams(arr, n))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.NativeExpressions.modNgrams($c, $n));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): ModNgramHashes =
      copy(child = newChild)
  }

  /**
   * Winnowing fingerprint selection (Schleimer et al., SIGMOD'03) over
   * a gram-hash array: the DISTINCT minima of every length-`w` sliding
   * window, in first-seen order — value-identical to the compositional
   * `array_distinct(transform(sequence(…), i → array_min(slice(…))))`
   * (bit-equality-tested), but one compiled pass with a monotonic
   * deque: O(grams) total instead of a fresh w-element array allocation
   * per window. Fewer grams than `w` → the single whole-list window.
   */
  final case class WinnowMins(child: Expression, w: Int)
      extends UnaryExpression {
    require(w >= 1, s"w must be >= 1, got $w")
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_mins"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      new GenericArrayData(winnowMinsEval(arr, w))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.NativeExpressions.winnowMinsEval($c, $w));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): WinnowMins =
      copy(child = newChild)
  }

  /** Shared eval for [[WinnowMins]]: sliding-window minima via a
    * monotonic index deque (head = current window's min), deduplicated
    * in first-seen order. */
  def winnowMinsEval(arr: ArrayData, w: Int): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.empty[Long]
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { vals(i) = arr.getLong(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    if (n <= w) {
      // single whole-list window
      var m = vals(0)
      i = 1
      while (i < n) { if (vals(i) < m) m = vals(i); i += 1 }
      return Array(m)
    }
    // deque of indices with non-decreasing values; head is the window min
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      while (tail > head && vals(dq(tail - 1)) >= vals(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = vals(dq(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    out.toArray
  }

  /** Shared eval for [[ModNgramHashes]] (interpreted + generated code).
    * Null token slots hash like the empty string (0). */
  def modNgrams(arr: ArrayData, n: Int): Array[Long] = {
    val m = 1000000007L
    val len = arr.numElements()
    val cnt = len - n + 1
    if (cnt <= 0) return Array.empty[Long]
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = if (arr.isNullAt(i)) 0L else fp64(arr.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 131L + th(i + j)) % m; j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  // ----------------------------------------- sorted-array intersection

  /**
   * |A ∩ B| for two SORTED long arrays with distinct elements — a single
   * merge walk, no per-pair hash-set allocation. The workhorse of
   * all-pairs Jaccard verification: sort once per document, merge per
   * pair.
   */
  final case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(requireArrayOf(left, LongType, prettyName),
        requireArrayOf(right, LongType, prettyName))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0; var j = 0; var cnt = 0L
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      cnt
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val na = ctx.freshName("siNa")
      val nb = ctx.freshName("siNb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0, $j = 0;
           |long $cnt = 0L;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $cnt++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /**
   * Longest common contiguous token run between two array<string>
   * columns — struct(len, start_a, start_b), 0-based starts, len 0
   * when disjoint; inputs truncated to `maxTokens` each. The exact
   * verify stage of [[graft.ops.Dedup.substringDupSpans]]; DP in the
   * static [[CommonRunKernel]], invoked directly from codegen.
   */
  final case class LongestCommonRun(left: Expression, right: Expression,
      maxTokens: Int) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(requireArrayOf(left, StringType, prettyName),
        requireArrayOf(right, StringType, prettyName))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    override def dataType: DataType = StructType(Seq(
      StructField("len", IntegerType, nullable = false),
      StructField("start_a", IntegerType, nullable = false),
      StructField("start_b", IntegerType, nullable = false)))
    override def prettyName: String = "longest_common_run"

    override def nullSafeEval(l: Any, r: Any): Any =
      CommonRunKernel.run(l.asInstanceOf[ArrayData],
        r.asInstanceOf[ArrayData], maxTokens)

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |${ev.value} = graft.functions.CommonRunKernel.run(
           |  $a, $b, $maxTokens);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LongestCommonRun =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------- dot product

  /**
   * Dot product of two float-array columns, accumulated left-to-right
   * in double — bit-identical to the `zip_with`+`aggregate`
   * composition in [[graft.ops.Similarity.dotComposed]] and to DuckDB's
   * list_dot_product over DOUBLE[] (used as the oracle). Mismatched
   * lengths yield NULL (matching `zip_with`'s null padding), surfacing
   * malformed embedding rows instead of silently truncating.
   */

  /**
   * Jaro\u2013Winkler similarity in [0, 1] over UTF-16 code units
   * (byte-identical to DuckDB/RapidFuzz on ASCII \u2014 the entity-
   * resolution domain; unit-pinned against the published MARTHA/
   * DWAYNE/DIXON reference values). Winkler boost: prefix \u2264 4,
   * scale 0.1, applied when jaro > 0.7. True codegen: the generated
   * Java calls the static kernel \u2014 no boxing, no virtual dispatch,
   * no interpreted fallback.
   */
  final case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(l: Any, r: Any): Any =
      JaroWinklerKernel.similarity(
        l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |${ev.value} = graft.functions.JaroWinklerKernel.similarity(
           |  $a.toString(), $b.toString());
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  final case class DotF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(requireArrayOf(left, FloatType, prettyName),
        requireArrayOf(right, FloatType, prettyName))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_f"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("dfN")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotF =
      copy(left = newLeft, right = newRight)
  }

  /**
   * Exact integer dot product of two int8 (byte-array) columns — the
   * scoring kernel for quantized similarity search. Products are
   * ≤ 127²·dim (no overflow for any realistic dimension); mismatched
   * lengths yield NULL like [[DotF]].
   */
  final case class DotI8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(requireArrayOf(left, ByteType, prettyName),
        requireArrayOf(right, ByteType, prettyName))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_i8"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0L
      var i = 0
      while (i < n) { acc += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("diN")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotI8 =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------- fingerprint

  /** Shared implementation for [[Fingerprint64]] (called from both the
    * interpreted path and generated code): position-weighted rolling
    * hash over code points, weights 31^(pos mod 8), mod 1e9+7 — the
    * exact arithmetic of the documented formula and its DuckDB oracle.
    * Walks the UTF-8 bytes in place (decoding code points directly);
    * no per-call String materialization. */
  def fp64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val acc = fpWalk(s, Fp64Weights, null)
    acc % 1000000007L
  }

  /** One-pass 60-bit packed token hash: two independent position-weighted
    * rolling hashes (bases 31 and 37, both mod 1e9+7 < 2^30) packed as
    * hi·2^30 + lo. The SQL-mirrorable per-token hash for cross-engine
    * SimHash verification — ONE UTF-8 walk accumulates both sums, no
    * string allocation. */
  def fp60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val m = 1000000007L
    val second = new Array[Long](1)
    val first = fpWalk(s, Fp64Weights, second)
    (first % m) * 1073741824L + (second(0) % m)
  }

  /** Sum of codePoint·weights(pos mod 8) over the string's code points,
    * decoded straight from the UTF-8 bytes; when `acc2` is non-null it
    * simultaneously accumulates the base-37 sum into acc2(0) (fp60's
    * single-walk path). Overflow-free for ASCII-ish content up to
    * ~2.7e6 chars (terms < 2^42; document-scale safe). Truncated or
    * malformed sequences decode to U+FFFD and advance one byte —
    * bounds-safe on invalid UTF-8 (web-crawl bytes), matching Java's
    * replacement-character decoding for the common stray-byte cases. */
  private def fpWalk(s: org.apache.spark.unsafe.types.UTF8String,
                     w: Array[Long], acc2: Array[Long]): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var acc = 0L
    var accB = 0L
    var i = 0
    var pos = 0
    while (i < n) {
      val cp = decodeCp(base, off, n, i)
      val len = cpLen(cp)
      i += len
      val p = pos % 8
      acc += (cp & CpMask).toLong * w(p)
      if (acc2 != null) accB += (cp & CpMask).toLong * Fp37Weights(p)
      pos += 1
    }
    if (acc2 != null) acc2(0) = accB
    acc
  }

  // decodeCp packs (byte length << 24 | code point); cpLen/CpMask unpack.
  // Bounds-checked: a sequence running past the buffer or a stray
  // continuation byte yields U+FFFD with length 1.
  private final val CpMask = 0xFFFFFF
  private def cpLen(packed: Int): Int = packed >>> 24
  private def decodeCp(base: AnyRef, off: Long, n: Int, i: Int): Int = {
    def b(k: Int): Int = org.apache.spark.unsafe.Platform.getByte(base, off + k) & 0xFF
    val b0 = b(i)
    if (b0 < 0x80) (1 << 24) | b0
    else if (b0 < 0xC0) (1 << 24) | 0xFFFD // stray continuation byte
    else if (b0 < 0xE0) {
      if (i + 1 >= n) (1 << 24) | 0xFFFD
      else (2 << 24) | (((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F))
    } else if (b0 < 0xF0) {
      if (i + 2 >= n) (1 << 24) | 0xFFFD
      else (3 << 24) | (((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) |
        (b(i + 2) & 0x3F))
    } else {
      if (i + 3 >= n) (1 << 24) | 0xFFFD
      else (4 << 24) | (((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
        ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F))
    }
  }

  private val Fp64Weights: Array[Long] =
    Iterator.iterate(1L)(_ * 31L).take(8).toArray
  private val Fp37Weights: Array[Long] =
    Iterator.iterate(1L)(_ * 37L).take(8).toArray

  /**
   * Document fingerprint in ONE pass over the string. The
   * `sequence`+`substring(i, 1)` composition is O(n²) per document
   * (each substring walks the UTF8 bytes from the start) — at corpus
   * scale long documents dominate, so the hot path is native.
   */
  final case class Fingerprint64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "fingerprint64"

    override def nullSafeEval(input: Any): Any =
      fp64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.fp64($c);")

    override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
      copy(child = newChild)
  }

  /** Unicode normalization kernel (round 14; Neo4j 5 normalize()). */
  def unormalize(s: org.apache.spark.unsafe.types.UTF8String,
                 form: String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.valueOf(form)))

  /** Unicode normalization (round 14; Neo4j 5.17 normalize()): NFC /
    * NFD / NFKC / NFKD via java.text.Normalizer — static-kernel
    * codegen (no boxing, no interpreted fallback); the form is
    * compile-time constant. */
  final case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        // NullType: a literal null rides through (null in → null out)
        case StringType | NullType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"

    override def nullSafeEval(input: Any): Any =
      NativeExpressions.unormalize(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        form)

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.NativeExpressions.unormalize(
           |  $c, "$form");""".stripMargin)

    override protected def withNewChildInternal(
        newChild: Expression): UnicodeNormalize = copy(child = newChild)
  }

  /** Packed 60-bit token hash (see [[fp60]]): one UTF-8 walk per string,
    * two independent rolling hashes, SQL-mirrorable. */
  final case class TokenHash60(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "token_hash60"

    override def nullSafeEval(input: Any): Any =
      fp60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.fp60($c);")

    override protected def withNewChildInternal(newChild: Expression): TokenHash60 =
      copy(child = newChild)
  }

  // --------------------------------------------------- fused text stats

  /** Marker-word → language bitmask (bit 0 = stopword set, bits 1-4 =
    * en/de/fr/es). Words are ≤ 5 ASCII chars, packed 8 bits/char. */
  private val TextMarkerMask: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer]()
    def add(words: Seq[String], bit: Int): Unit = words.foreach { w =>
      require(w.length <= 5 && w.forall(c => c >= 'a' && c <= 'z'))
      var key = 0L
      w.foreach(c => key = (key << 8) | c.toLong)
      val prev = m.get(key)
      m.put(key, if (prev == null) (1 << bit) else (prev | (1 << bit)))
    }
    add(Seq("the", "a", "an", "and", "of", "to", "in", "is"), 0)   // stopwords
    add(Seq("the", "and", "is", "of", "to", "was", "for"), 1)      // en
    add(Seq("der", "die", "und", "das", "ist", "nicht", "ein"), 2) // de
    add(Seq("le", "la", "et", "les", "des", "est", "une"), 3)      // fr
    add(Seq("el", "los", "y", "las", "una", "es", "que"), 4)       // es
    m
  }

  /**
   * All of [[graft.ops.TextOps]]' per-document counters in ONE pass over
   * the UTF-8 bytes — replaces seven regex scans (token split, subword,
   * punctuation, stopwords, 4 language markers). Semantics replicate
   * the Java-regex formulations exactly (asserted by OpsSpec):
   *
   *  - n_tok: Spark `split(trim(text), "\\s+")` — Java regex split with
   *    limit -1 (every empty piece kept), i.e. whitespace-run count + 1
   *    on the space-trimmed text; blank → 0;
   *  - n_sub: letter runs + digit runs + other non-space code points
   *    (Java regex is code-point aware: an astral char is one match);
   *  - n_punct: chars in [.,;:!?];
   *  - n_stop / h_lang: maximal ASCII word runs ([A-Za-z0-9_], `\b`
   *    semantics) compared case-insensitively against the marker sets.
   *
   * Returns [n_tok, n_sub, n_punct, n_stop, h_en, h_de, h_fr, h_es].
   */
  def textStats(s: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val out = new Array[Long](8)

    // ---- byte walk for n_tok over the space-trimmed span (whitespace
    //      and ' ' are single ASCII bytes; continuation bytes >= 0x80
    //      never collide)
    def b(i: Int): Int = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
    def isWs(c: Int): Boolean = c == 32 || (c >= 9 && c <= 13)
    var ts = 0
    while (ts < n && b(ts) == 32) ts += 1
    var te = n
    while (te > ts && b(te - 1) == 32) te -= 1
    if (te > ts) {
      // Spark's split passes limit -1 (ALL empty pieces kept), so the
      // piece count is (whitespace runs) + 1
      var wsRuns = 0L
      var inWs = false
      var i = ts
      while (i < te) {
        if (isWs(b(i))) { if (!inWs) wsRuns += 1; inWs = true }
        else inWs = false
        i += 1
      }
      out(0) = wsRuns + 1L
    }

    // ---- code-point walk for subword/punct/word-run counters
    var i = 0
    var prevClass = 0 // 1=letter, 2=digit, 3=other/space boundary
    var inWord = false
    var wordKey = 0L
    var wordLen = 0
    def closeWord(): Unit = {
      if (inWord && wordLen >= 1 && wordLen <= 5) {
        val mask = TextMarkerMask.get(wordKey)
        if (mask != null) {
          val mv = mask.intValue()
          var bit = 0
          while (bit < 5) {
            if ((mv & (1 << bit)) != 0) out(3 + bit) += 1
            bit += 1
          }
        }
      }
      inWord = false; wordKey = 0L; wordLen = 0
    }
    while (i < n) {
      val packed = decodeCp(base, off, n, i)
      val cp = packed & CpMask
      i += cpLen(packed)
      val isLetter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val isDigit = cp >= '0' && cp <= '9'
      val isSpace = isWs(cp)
      // subword runs (full text). Java regex is code-point aware, so an
      // astral "other" char is ONE match, like any BMP char.
      if (isLetter) { if (prevClass != 1) out(1) += 1; prevClass = 1 }
      else if (isDigit) { if (prevClass != 2) out(1) += 1; prevClass = 2 }
      else { if (!isSpace) out(1) += 1; prevClass = 3 }
      // punctuation
      if (cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?')
        out(2) += 1
      // \b word runs ([A-Za-z0-9_]) with lowercased ASCII compare
      if (isLetter || isDigit || cp == '_') {
        if (!inWord) { inWord = true; wordKey = 0L; wordLen = 0 }
        if (wordLen < 5) {
          val lc = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
          wordKey = (wordKey << 8) | lc.toLong
        }
        wordLen += 1
        if (wordLen > 5) wordKey = -1L // over-long run can never match
      } else closeWord()
    }
    closeWord()
    out
  }

  /** One-pass fused text counters (see [[textStats]]). */
  final case class TextFeatures(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "text_features"

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(textStats(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.NativeExpressions.textStats($c));""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): TextFeatures =
      copy(child = newChild)
  }

  // ------------------------------------------------- centroid assignment

  /**
   * Indices of the `nProbe` centroids nearest to a vector by cosine
   * (IVF assignment/probing). The centroid matrix rides along as a
   * broadcast-like reference object; assignment is a map-only pass over
   * the corpus — no shuffle, no crossJoin. With nProbe = 1 this is the
   * partition-assignment step; queries probe nProbe > 1 lists.
   */
  final case class NearestCentroids(child: Expression,
                                    centroids: Array[Array[Float]],
                                    nProbe: Int)
      extends UnaryExpression {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(centroids.nonEmpty, "centroid set must be non-empty")
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, FloatType, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    // centroids normalized once at construction → cosine order == dot order
    private lazy val normed: Array[Array[Double]] = centroids.map { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0) c.map(_.toDouble) else c.map(_ / n)
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val scores = normed.map { c =>
        var acc = 0.0
        val n = math.min(dim, c.length)
        var i = 0
        while (i < n) { acc += v.getFloat(i) * c(i); i += 1 }
        if (acc.isNaN) Double.NegativeInfinity else acc // NaN data → last
      }
      val idx = scores.zipWithIndex
        .sortBy { case (s, i) => (-s, i) }
        .take(math.min(nProbe, centroids.length)).map(_._2)
      new GenericArrayData(idx)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("ivfCentroids", normed, "double[][]")
      val nc = centroids.length
      val probes = math.min(nProbe, nc) // more probes than lists = all lists
      val dim = ctx.freshName("ncDim")
      val scores = ctx.freshName("ncScores")
      val ci1 = ctx.freshName("ci")
      val cen = ctx.freshName("cen")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val out = ctx.freshName("ncOut")
      val used = ctx.freshName("ncUsed")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val ci2 = ctx.freshName("ci")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |int $dim = $c.numElements();
           |double[] $scores = new double[$nc];
           |for (int $ci1 = 0; $ci1 < $nc; $ci1++) {
           |  double[] $cen = $cRef[$ci1];
           |  int $n = java.lang.Math.min($dim, $cen.length);
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $acc += $c.getFloat($i) * $cen[$i]; }
           |  $scores[$ci1] = Double.isNaN($acc) ? Double.NEGATIVE_INFINITY : $acc;
           |}
           |int[] $out = new int[$probes];
           |boolean[] $used = new boolean[$nc];
           |for (int $p = 0; $p < $probes; $p++) {
           |  int $best = -1;
           |  for (int $ci2 = 0; $ci2 < $nc; $ci2++) {
           |    if (!$used[$ci2] && ($best < 0 || $scores[$ci2] > $scores[$best])) {
           |      $best = $ci2;
           |    }
           |  }
           |  $used[$best] = true;
           |  $out[$p] = $best;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
      copy(child = newChild)
  }

  // ---------------------------------------------- product-quantization

  /**
   * PQ code of a float vector: for each of the `m` contiguous
   * subspaces, the index of the L2²-nearest codebook entry (first
   * index on exact ties). One compiled loop per row — the
   * compositional form ([[graft.ops.Similarity.pqCodeComposed]])
   * builds m×ksub dot-expression nodes and detonates codegen beyond
   * ~1k codewords; this expression carries the codebooks as one
   * reference object.
   *
   * Arithmetic is BIT-IDENTICAL to the compositional form (asserted in
   * OpsSpec) and therefore to the DuckDB oracle: per-subspace
   * `⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩` with every dot accumulated left-to-right
   * in double and `⟨c,c⟩` folded to a constant.
   */
  final case class PqCode(child: Expression, cb: Array[Array[Array[Float]]])
      extends UnaryExpression {
    require(cb.nonEmpty && cb.head.nonEmpty && cb.head.head.nonEmpty,
      "pq_code: empty codebooks")
    private val m = cb.length
    private val ksub = cb.head.length
    private val dsub = cb.head.head.length
    require(cb.forall(s => s.length == ksub && s.forall(_.length == dsub)),
      "pq_code: ragged codebooks")

    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, FloatType, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_code"

    // cast once; ⟨c,c⟩ folded left-to-right, matching lit-constant folding
    private lazy val cbD: Array[Array[Array[Double]]] =
      cb.map(_.map(_.map(_.toDouble)))
    private lazy val ccD: Array[Array[Double]] = cbD.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * dsub) return null
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        val off = s * dsub
        var dss = 0.0
        var i = 0
        while (i < dsub) {
          val x = v.getFloat(off + i).toDouble; dss += x * x; i += 1
        }
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < ksub) {
          val c = cbD(s)(j)
          var dsc = 0.0
          i = 0
          while (i < dsub) { dsc += v.getFloat(off + i).toDouble * c(i); i += 1 }
          val d = dss - 2.0 * dsc + ccD(s)(j)
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }

    override def nullable: Boolean = true

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCb", cbD, "double[][][]")
      val ccRef = ctx.addReferenceObj("pqCc", ccD, "double[][]")
      val out = ctx.freshName("pqOut")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val dss = ctx.freshName("dss")
      val dsc = ctx.freshName("dsc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      nullSafeCodeGen(ctx, ev, v => {
        s"""
           |if ($v.numElements() != ${m * dsub}) {
           |  ${ev.isNull} = true;
           |} else {
           |  int[] $out = new int[$m];
           |  for (int $s = 0; $s < $m; $s++) {
           |    int $off = $s * $dsub;
           |    double $dss = 0.0;
           |    for (int $i = 0; $i < $dsub; $i++) {
           |      double $x = (double) $v.getFloat($off + $i);
           |      $dss += $x * $x;
           |    }
           |    int $best = 0;
           |    double $bestD = Double.POSITIVE_INFINITY;
           |    for (int $j = 0; $j < $ksub; $j++) {
           |      double[] $c = $cbRef[$s][$j];
           |      double $dsc = 0.0;
           |      for (int $i = 0; $i < $dsub; $i++) {
           |        $dsc += (double) $v.getFloat($off + $i) * $c[$i];
           |      }
           |      double $d = $dss - 2.0 * $dsc + $ccRef[$s][$j];
           |      if ($d < $bestD) { $bestD = $d; $best = $j; }
           |    }
           |    $out[$s] = $best;
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): PqCode =
      copy(child = newChild)
  }

  // -------------------------------------------------------- Column API

  def minhashSig(hashes: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    col(MinHashSig(expr(hashes), coeffs.map(_._1).toArray,
      coeffs.map(_._2).toArray, prime))

  def simhash64(hashes: Column): Column = col(SimHash64(expr(hashes)))

  def fingerprint64(text: Column): Column = col(Fingerprint64(expr(text)))

  def unicodeNormalize(text: Column, form: String): Column =
    col(UnicodeNormalize(expr(text), form))

  def tokenHash60(text: Column): Column = col(TokenHash60(expr(text)))

  def tokenHashesXx(tokens: Column): Column = col(TokenHashesXx(expr(tokens)))

  def modNgramHashes(tokens: Column, n: Int): Column =
    col(ModNgramHashes(expr(tokens), n))

  def winnowMins(grams: Column, w: Int): Column =
    col(WinnowMins(expr(grams), w))

  def textFeatures(text: Column): Column = col(TextFeatures(expr(text)))

  def tokenHashes60(tokens: Column): Column = col(TokenHashes60(expr(tokens)))

  def ngramHashes(tokens: Column, n: Int): Column =
    col(NgramHashes(expr(tokens), n))

  def bandHashes(sig: Column, bands: Int, r: Int): Column =
    col(BandHashes(expr(sig), bands, r))

  def sortedIntersectCount(a: Column, b: Column): Column =
    col(SortedIntersectCount(expr(a), expr(b)))

  def longestCommonRun(a: Column, b: Column,
                       maxTokens: Int = 10000): Column =
    col(LongestCommonRun(expr(a), expr(b), maxTokens))

  def dotF(a: Column, b: Column): Column = col(DotF(expr(a), expr(b)))

  def pqCode(vec: Column, cb: Array[Array[Array[Float]]]): Column =
    col(PqCode(expr(vec), cb))

  def dotI8(a: Column, b: Column): Column = col(DotI8(expr(a), expr(b)))

  def nearestCentroids(vec: Column, centroids: Array[Array[Float]],
                       nProbe: Int): Column =
    col(NearestCentroids(expr(vec), centroids, nProbe))

  def jaroWinkler(a: Column, b: Column): Column =
    col(JaroWinkler(expr(a), expr(b)))
}
