package graft.core

/** Suffix array + Kasai LCP for the verify stage's longest-common-substring
  * pass over long exact overlaps (north rule; no counterpart in the reference
  * — its verify oracle is exact Jaccard only, similarities.jl:230-238).
  *
  * O(n log n) prefix-doubling construction, O(n) LCP. Built per candidate
  * pair inside a typed map on executors — never on the driver — and only for
  * pairs that already passed the cheap Jaccard prefilter (SURVEY.md §7
  * "what's hard"). Callers should cap text length.
  */
object SuffixArray {

  /** Suffix array of s (indices sorted by suffix). Prefix doubling with the
    * (rank, nextRank, index) triple packed into one primitive Long per
    * suffix and sorted via Arrays.sort — no boxing, no comparator closures
    * (this runs per candidate pair on executors; allocation rate matters).
    * Requires n < 2^21 and s values ≥ 0 (callers remap chars to +2). */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    require(n < (1 << 21), s"suffix array input too long: $n")
    val IdxBits = 21
    val IdxMask = (1L << IdxBits) - 1
    val sa = new Array[Int](n)
    var rank = new Array[Int](n)
    var next = new Array[Int](n)
    val keys = new Array[Long](n)

    // initial ranks from character codes (chars ≤ 2^17 < 2^21 fit the pack)
    var i = 0
    while (i < n) { keys(i) = (s(i).toLong << IdxBits) | i; i += 1 }
    java.util.Arrays.sort(keys)
    var r = 0
    i = 0
    while (i < n) {
      if (i > 0 && (keys(i) >>> IdxBits) != (keys(i - 1) >>> IdxBits)) r += 1
      rank((keys(i) & IdxMask).toInt) = r
      i += 1
    }

    var k = 1
    while (k < n && r < n - 1) {
      // key = (rank+1)(21b) ## (rank[i+k]+1)(21b) ## index(21b); ranks < n < 2^21
      i = 0
      while (i < n) {
        val r2 = if (i + k < n) rank(i + k) + 1 else 0
        keys(i) = (((rank(i) + 1).toLong << IdxBits | r2) << IdxBits) | i
        i += 1
      }
      java.util.Arrays.sort(keys)
      r = 0
      next((keys(0) & IdxMask).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> IdxBits) != (keys(i - 1) >>> IdxBits)) r += 1
        next((keys(i) & IdxMask).toInt) = r
        i += 1
      }
      val t = rank; rank = next; next = t
      k <<= 1
    }
    i = 0
    while (i < n) { sa(rank(i)) = i; i += 1 }
    sa
  }

  /** Kasai LCP: lcp(i) = longest common prefix of sa(i) and sa(i-1). */
  def lcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val out = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        out(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  /** Length of the longest common substring of a and b.
    * Classic SA trick: build over a + SEP + b (SEP below any codepoint),
    * answer = max LCP between adjacent suffixes from different halves. */
  def lcsLength(a: String, b: String, maxLen: Int = 20000): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val ta = if (a.length > maxLen) a.substring(0, maxLen) else a
    val tb = if (b.length > maxLen) b.substring(0, maxLen) else b
    val n = ta.length + tb.length + 1
    val s = new Array[Int](n)
    var i = 0
    while (i < ta.length) { s(i) = ta.charAt(i).toInt + 2; i += 1 }
    s(ta.length) = 1 // separator, smaller than any char code
    i = 0
    while (i < tb.length) { s(ta.length + 1 + i) = tb.charAt(i).toInt + 2; i += 1 }
    val sa = build(s)
    val lcps = lcp(s, sa)
    val boundary = ta.length
    var best = 0
    i = 1
    while (i < n) {
      val x = sa(i - 1); val y = sa(i)
      if ((x < boundary) != (y < boundary)) { // suffixes from different halves
        if (lcps(i) > best) best = lcps(i)
      }
      i += 1
    }
    best
  }
}
