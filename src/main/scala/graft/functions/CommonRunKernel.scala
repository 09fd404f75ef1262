package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Longest common CONTIGUOUS run between two token arrays — the exact
 * per-pair verify stage of substring-level dedup (Lee et al.,
 * "Deduplicating Training Data Makes Language Models Better": repeated
 * spans across documents; the distributed form anchors candidates with
 * winnowing fingerprints instead of a corpus suffix array, then runs
 * this exact check per candidate pair only).
 *
 * Classic O(n·m) time, O(m) space dynamic program over the run-length
 * table; UTF8String equality is byte equality, so the comparison cost
 * is the token bytes, no decoding. Static kernel shape (the
 * [[JaroWinklerKernel]] pattern) so the codegen'd call is a plain
 * static invoke — no boxing, no interpreted fallback.
 */
object CommonRunKernel {

  /** Returns (len, start_a, start_b) of the LONGEST common contiguous
    * run — first-occurrence tie-break (scan order), 0-based starts,
    * len 0 when the arrays share no token. Inputs are truncated to
    * `maxTokens` elements each to bound the per-pair cost. */
  def run(a: ArrayData, b: ArrayData, maxTokens: Int): InternalRow = {
    val na = math.min(a.numElements(), maxTokens)
    val nb = math.min(b.numElements(), maxTokens)
    // materialize b's tokens once — ArrayData element access re-decodes
    val bt = new Array[UTF8String](nb)
    var j = 0
    while (j < nb) {
      bt(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var best = 0; var ba = 0; var bb = 0
    var prev = new Array[Int](nb + 1)
    var cur = new Array[Int](nb + 1)
    var i = 0
    while (i < na) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      var k = 0
      while (k < nb) {
        if (ai != null && bt(k) != null && ai.equals(bt(k))) {
          val v = prev(k) + 1
          cur(k + 1) = v
          if (v > best) { best = v; ba = i - v + 1; bb = k - v + 1 }
        } else cur(k + 1) = 0
        k += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    new GenericInternalRow(Array[Any](best, ba, bb))
  }
}
