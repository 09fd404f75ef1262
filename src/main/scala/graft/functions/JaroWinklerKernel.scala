package graft.functions

/**
 * Static Jaro–Winkler kernel (Winkler 1990, building on Jaro 1989):
 *
 *   window = max(⌊max(|a|,|b|)/2⌋ − 1, 0);
 *   m = matches within the window; t = out-of-order matched pairs / 2;
 *   jaro = (m/|a| + m/|b| + (m − t)/m) / 3;
 *   jw = jaro + ℓ·0.1·(1 − jaro)  when jaro > 0.7, ℓ = common prefix ≤ 4.
 *
 * Kept as a plain object with static forwarders so generated Janino
 * code calls `graft.functions.JaroWinklerKernel.similarity(...)`
 * directly — no boxing, no reflection. Operates on UTF-16 code units
 * (identical to DuckDB/RapidFuzz on ASCII and the BMP; pinned against
 * the published reference values in NativeCodegenSpec).
 */
object JaroWinklerKernel {

  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both sides in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
