package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeExpressions._

/**
 * Regression tests for whole-stage-codegen compilation of the native
 * expressions.
 *
 * Round-1 bug: `doGenCode` bodies used fixed Java local names, so any
 * projection containing two native expressions (the d02/d03 signature
 * shape) made Janino fail with "Redefinition of local variable" and
 * Spark silently fell back to interpreted eval. These tests call
 * `GenerateUnsafeProjection.generate` DIRECTLY — unlike
 * `UnsafeProjection.create` there is no interpreter fallback, so a
 * codegen failure is a thrown exception, not a silent slowdown — and
 * then assert the compiled results are bit-identical to the
 * interpreted `eval` path.
 */
class NativeCodegenSpec extends AnyFunSuite {

  private val prime = 4294967311L // smallest prime > 2^32
  private val coeffA = Array(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val coeffB = Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)

  private def tokensRow(tokens: Seq[String], hashes: Seq[Long],
                        va: Seq[Float], vb: Seq[Float]): InternalRow =
    InternalRow(
      new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(hashes.toArray),
      new GenericArrayData(va.toArray),
      new GenericArrayData(vb.toArray),
      UTF8String.fromString(tokens.mkString(" ")),
      new GenericArrayData(hashes.map(h => (h % 100).toByte).toArray))

  private val tokCol = BoundReference(0, ArrayType(StringType), nullable = true)
  private val hashCol = BoundReference(1, ArrayType(LongType), nullable = true)
  private val vaCol = BoundReference(2, ArrayType(FloatType), nullable = true)
  private val vbCol = BoundReference(3, ArrayType(FloatType), nullable = true)
  private val strCol = BoundReference(4, StringType, nullable = true)
  private val byteCol = BoundReference(5, ArrayType(ByteType), nullable = true)

  /** Every native expression at least twice in ONE projection — the scope
    * Janino rejected in round 1 whenever locals collided. */
  private def allNatives: Seq[Expression] = {
    val ng1 = NgramHashes(tokCol, 3)
    val ng2 = NgramHashes(tokCol, 2)
    val sig1 = MinHashSig(hashCol, coeffA, coeffB, prime)
    val sig2 = MinHashSig(hashCol, coeffB, coeffA, prime)
    val cents = Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    Seq(
      ng1, ng2,
      SortedIntersectCount(ng1, ng2),
      SortedIntersectCount(ng2, ng1),
      sig1, sig2,
      BandHashes(sig1, 4, 2),
      BandHashes(sig2, 2, 4),
      SimHash64(hashCol),
      SimHash64(sig1),
      DotF(vaCol, vbCol),
      DotF(vbCol, vaCol),
      DotI8(byteCol, byteCol),
      DotI8(byteCol, byteCol),
      Fingerprint64(strCol),
      Fingerprint64(strCol),
      TokenHash60(strCol),
      TokenHash60(strCol),
      TokenHashesXx(tokCol),
      TokenHashesXx(tokCol, seed = 7L),
      TokenHashes60(tokCol),
      TokenHashes60(tokCol),
      ModNgramHashes(tokCol, 3),
      ModNgramHashes(tokCol, 2),
      WinnowMins(hashCol, 4),
      WinnowMins(hashCol, 2),
      NearestCentroids(vaCol, cents, 2),
      NearestCentroids(vbCol, cents, 1))
  }

  test("one projection with every native expression twice compiles (no Janino redefinition)") {
    // Throws CompileException (test failure) if any generated locals collide.
    val proj = GenerateUnsafeProjection.generate(allNatives, subexpressionEliminationEnabled = false)
    val row = tokensRow(
      Seq("the", "quick", "brown", "fox", "jumps"),
      Seq(0x0123456789abcdefL, -1L, 42L, 0L, 0x7fffffffffffffffL),
      Seq(0.5f, -1.25f, 3.0f), Seq(2.0f, 0.5f, -0.75f))
    val out = proj(row)
    assert(out.numFields == allNatives.size)
  }

  test("compiled results are bit-identical to interpreted eval") {
    val exprs = allNatives
    val proj = GenerateUnsafeProjection.generate(exprs, subexpressionEliminationEnabled = false)
    val rows = Seq(
      tokensRow(Seq("a", "b", "c", "d"), Seq(1L, 2L, 3L), Seq(1f, 2f), Seq(3f, 4f)),
      tokensRow(Seq("x"), Seq(-5L), Seq(0f, 0f), Seq(0f, 0f)),
      tokensRow(Seq(), Seq(), Seq(1f), Seq(1f, 2f)), // DotF length mismatch → null
      tokensRow(Seq("the", "the", "the"), Seq(Long.MaxValue, Long.MinValue),
        Seq(1e30f, -1e30f, 1f), Seq(1e30f, 1e30f, 2f)))
    for (row <- rows) {
      val compiled = proj(row).copy()
      exprs.zipWithIndex.foreach { case (e, i) =>
        val interp = e.eval(row)
        val comp: Any =
          if (compiled.isNullAt(i)) null
          else e.dataType match {
            case LongType   => compiled.getLong(i)
            case DoubleType => compiled.getDouble(i)
            case ArrayType(LongType, _)    => compiled.getArray(i).toLongArray.toSeq
            case ArrayType(IntegerType, _) => compiled.getArray(i).toIntArray.toSeq
            case other => fail(s"unhandled type $other")
          }
        val interpNorm: Any = interp match {
          case null => null
          case a: ArrayData => e.dataType match {
            case ArrayType(LongType, _)    => a.toLongArray.toSeq
            case ArrayType(IntegerType, _) => a.toIntArray.toSeq
            case other => fail(s"unhandled type $other")
          }
          case v => v
        }
        assert(comp == interpNorm, s"expr $i (${e.prettyName}) compiled != interpreted")
      }
    }
  }

  test("fp64 UTF-8 byte walk == String/codePoint reference on multibyte input") {
    // the production fp64 decodes code points straight from UTF-8 bytes;
    // this is the original String-based formulation it must match exactly
    def ref(str: String): Long = {
      val w = Iterator.iterate(1L)(_ * 31L).take(8).toArray
      var acc = 0L; var i = 0; var pos = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        acc += cp.toLong * w(pos % 8)
        i += Character.charCount(cp)
        pos += 1
      }
      acc % 1000000007L
    }
    val samples = Seq("", "a", "hello world", "héllo wörld", "日本語テキスト",
      "emoji 😀🎉 mix", "Ā ā Ă ă", "aé中😀")
    for (s <- samples) {
      assert(fp64(UTF8String.fromString(s)) == ref(s), s"fp64('$s')")
      // packed hash: hi 30 bits are fp64, lo 30 bits the base-37 twin
      val packed = fp60(UTF8String.fromString(s))
      assert(packed >>> 30 == ref(s), s"fp60 hi('$s')")
      assert(packed >= 0 && packed < (1L << 60))
    }
  }

  test("fingerprint walkers are bounds-safe on truncated/invalid UTF-8") {
    // web-crawl bytes: truncated multibyte lead bytes at end-of-buffer,
    // stray continuation bytes — must not read out of bounds and must
    // be deterministic
    val bad = Seq(
      Array[Byte](0x61, 0xF0.toByte),                    // "a" + truncated 4-byte lead
      Array[Byte](0xE2.toByte, 0x82.toByte),             // truncated 3-byte seq
      Array[Byte](0xC3.toByte),                          // truncated 2-byte seq
      Array[Byte](0x80.toByte, 0x61),                    // stray continuation + "a"
      Array[Byte](0xF0.toByte, 0x9F.toByte, 0x98.toByte) // truncated emoji
    )
    for (bytes <- bad) {
      val s = UTF8String.fromBytes(bytes)
      val f1 = fp64(s); val f2 = fp64(s)
      assert(f1 == f2 && f1 >= 0)
      val p1 = fp60(s); val p2 = fp60(s)
      assert(p1 == p2 && p1 >= 0)
      val t1 = textStats(s).toSeq; val t2 = textStats(s).toSeq
      assert(t1 == t2)
    }
  }

  test("token-hash arrays tolerate null elements (SQL-facing surface)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("b")))
    val xx = TokenHashesXx(tokCol).nullSafeEval(withNull)
      .asInstanceOf[ArrayData].toLongArray
    assert(xx(1) == 42L) // xxhash64(null) == seed, like the transform form
    val t60 = TokenHashes60(tokCol).nullSafeEval(withNull)
      .asInstanceOf[ArrayData].toLongArray
    assert(t60(1) == 0L) // null slot hashes like empty string
    val ng = modNgrams(withNull, 2)
    assert(ng.length == 2) // no NPE; null treated as empty-string hash
  }

  test("generated code for two same-class instances has no fixed shared locals") {
    // Belt-and-braces: the d02 regression exactly — two NgramHashes in one
    // scope used to emit two `int ng_len` declarations.
    val e = Seq[Expression](
      Alias(NgramHashes(tokCol, 3), "a")(),
      Alias(NgramHashes(tokCol, 4), "b")())
    GenerateUnsafeProjection.generate(e, subexpressionEliminationEnabled = false)
  }

  test("JaroWinkler: compiled == interpreted == the published reference values") {
    val a = BoundReference(0, StringType, nullable = true)
    val b = BoundReference(1, StringType, nullable = true)
    // two instances in one projection: the locals-collision regression
    val exprs = Seq[Expression](JaroWinkler(a, b), JaroWinkler(b, a))
    val proj = GenerateUnsafeProjection.generate(
      exprs, subexpressionEliminationEnabled = false)
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "a", 0.0),
      ("", "", 1.0))
    for ((x, y, want) <- cases) {
      val row = InternalRow(UTF8String.fromString(x), UTF8String.fromString(y))
      val out = proj(row).copy()
      assert(out.getDouble(0) == want, s"$x/$y compiled")
      assert(out.getDouble(0) == out.getDouble(1), s"$x/$y symmetry")
      assert(exprs.head.eval(row) == want, s"$x/$y interpreted")
    }
    // null propagation
    val nr = InternalRow(null, UTF8String.fromString("x"))
    assert(exprs.head.eval(nr) == null)
  }
}
