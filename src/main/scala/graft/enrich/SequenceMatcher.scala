package graft.enrich

import scala.collection.mutable

/** Faithful port of CPython difflib.SequenceMatcher.ratio() —
  * Ratcliff–Obershelp similarity: 2·M / (|a|+|b|) where M sums the sizes of
  * recursively-found longest matching blocks.
  *
  * The reference's fuzzy registry join uses
  * `difflib.get_close_matches(key, keys, n=1, cutoff=0.9)`
  * (hospital_enricher.py:151-158); this is NOT Levenshtein — scores differ
  * near the 0.9 cutoff, so the algorithm is ported exactly, including
  * find_longest_match's tie-breaking (strictly-greater size, ascending i/j).
  * The autojunk heuristic only activates for |b| ≥ 200 and is irrelevant for
  * hospital-name keys; implemented without it (equivalent on short strings).
  */
object SequenceMatcher {

  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    // Fast path: Latin-1 inputs use primitive-array structures (CSR char
    // index + int j2len arrays) — same algorithm, same tie-breaking, ~20×
    // less allocation than the map-based general path on short keys.
    if (isLatin1(a) && isLatin1(b)) return ratioLatin1(a, b)
    ratioGeneral(a, b)
  }

  private def isLatin1(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 256) return false; i += 1 }
    true
  }

  private def ratioLatin1(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    // CSR layout of b's positions per char, ascending (difflib b2j order).
    val counts = new Array[Int](257)
    var i = 0
    while (i < lb) { counts(b.charAt(i) + 1) += 1; i += 1 }
    var c = 0
    while (c < 256) { counts(c + 1) += counts(c); c += 1 }
    val starts = counts.clone()
    val positions = new Array[Int](lb)
    i = 0
    while (i < lb) { val ch = b.charAt(i); positions(starts(ch)) = i; starts(ch) += 1; i += 1 }
    // starts now holds END offsets; begin offset for ch is counts(ch).
    var matches = 0
    var j2len = new Array[Int](lb + 1)
    var newj2len = new Array[Int](lb + 1)
    val stack = new Array[Int](4 * (math.min(la, lb) + 2))
    var sp = 0
    def push(alo: Int, ahi: Int, blo: Int, bhi: Int): Unit = {
      stack(sp) = alo; stack(sp + 1) = ahi; stack(sp + 2) = blo; stack(sp + 3) = bhi
      sp += 4
    }
    push(0, la, 0, lb)
    while (sp > 0) {
      sp -= 4
      val alo = stack(sp); val ahi = stack(sp + 1)
      val blo = stack(sp + 2); val bhi = stack(sp + 3)
      var besti = alo
      var bestj = blo
      var bestsize = 0
      java.util.Arrays.fill(j2len, blo, bhi + 1, 0)
      i = alo
      while (i < ahi) {
        java.util.Arrays.fill(newj2len, blo, bhi + 1, 0)
        val ch = a.charAt(i)
        var p = counts(ch)
        val pEnd = starts(ch)
        while (p < pEnd) {
          val j = positions(p)
          if (j >= blo && j < bhi) {
            val kk = if (j > blo) j2len(j - 1) + 1 else 1
            newj2len(j) = kk
            if (kk > bestsize) { besti = i - kk + 1; bestj = j - kk + 1; bestsize = kk }
          }
          p += 1
        }
        val tmp = j2len; j2len = newj2len; newj2len = tmp
        i += 1
      }
      while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      if (bestsize > 0) {
        matches += bestsize
        push(alo, besti, blo, bestj)
        push(besti + bestsize, ahi, bestj + bestsize, bhi)
      }
    }
    2.0 * matches / (la + lb)
  }

  private[enrich] def ratioGeneral(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    // b2j: char → ascending positions in b (difflib __chain_b)
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var bi = 0
    while (bi < b.length) {
      b2j.getOrElseUpdate(b.charAt(bi), mutable.ArrayBuffer.empty) += bi
      bi += 1
    }
    var matches = 0
    val queue = mutable.Stack((0, a.length, 0, b.length))
    val empty = mutable.ArrayBuffer.empty[Int]
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      // find_longest_match(alo, ahi, blo, bhi)
      var besti = alo
      var bestj = blo
      var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        val positions = b2j.getOrElse(a.charAt(i), empty)
        var p = 0
        while (p < positions.length) {
          val j = positions(p)
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len(j) = k
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
          p += 1
        }
        j2len = newj2len
        i += 1
      }
      // extend to adjacent equal elements (no junk in play)
      while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      if (bestsize > 0) {
        matches += bestsize
        queue.push((alo, besti, blo, bestj))
        queue.push((besti + bestsize, ahi, bestj + bestsize, bhi))
      }
    }
    2.0 * matches / total
  }

  /** Sound upper bound used for candidate pruning: the ratio can never exceed
    * 2·min(|a|,|b|) / (|a|+|b|), so pairs failing the bound at a given cutoff
    * are skipped without scoring. */
  def maxPossibleRatio(lenA: Int, lenB: Int): Double = {
    val t = lenA + lenB
    if (t == 0) 1.0 else 2.0 * math.min(lenA, lenB) / t
  }

  /** Character-bag upper bound: matched blocks are a common subsequence, so
    * M ≤ Σ_c min(count_a(c), count_b(c)) and
    * ratio ≤ 2·bagIntersect/(|a|+|b|). O(|a|+|b|) vs the O(|a|·|b|)-ish
    * exact ratio — difflib exposes the same idea as quick_ratio(). */
  private val bagCounts = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](1 << 16)
  }

  def quickRatioBound(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    val counts = bagCounts.get()
    var i = 0
    while (i < b.length) { counts(b.charAt(i)) += 1; i += 1 }
    var m = 0
    i = 0
    while (i < a.length) {
      val ch = a.charAt(i)
      if (counts(ch) > 0) { m += 1; counts(ch) -= 1 }
      i += 1
    }
    // zero the touched slots so the next call's array (thread-local) is clean
    i = 0
    while (i < b.length) { counts(b.charAt(i)) = 0; i += 1 }
    2.0 * m / total
  }

  /** Exact ratio when the quick bound can reach `cutoff`, else -1 (the true
    * ratio is provably below cutoff; -1 keeps it below any cutoff ≥ 0). */
  def ratioIfAtLeast(a: String, b: String, cutoff: Double): Double =
    if (quickRatioBound(a, b) >= cutoff) ratio(a, b) else -1.0
}
