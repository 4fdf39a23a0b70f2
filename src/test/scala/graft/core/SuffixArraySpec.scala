package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SuffixArraySpec extends AnyFunSuite {

  /** brute-force oracle */
  private def bruteLcs(a: String, b: String): Int = {
    var best = 0
    for (i <- 0 until a.length; j <- 0 until b.length) {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      if (k > best) best = k
    }
    best
  }

  test("known cases") {
    assert(SuffixArray.lcsLength("banana", "ananas") == 5) // "anana"
    assert(SuffixArray.lcsLength("abc", "xyz") == 0)
    assert(SuffixArray.lcsLength("", "xyz") == 0)
    assert(SuffixArray.lcsLength("same text", "same text") == 9)
    assert(SuffixArray.lcsLength("xabcy", "zabcw") == 3)
  }

  test("matches brute force on 64 random string pairs") {
    val rnd = new scala.util.Random(0)
    for (_ <- 0 until 64) {
      val a = Array.fill(rnd.nextInt(40) + 1)(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Array.fill(rnd.nextInt(40) + 1)(('a' + rnd.nextInt(4)).toChar).mkString
      assert(SuffixArray.lcsLength(a, b) == bruteLcs(a, b), s"a=$a b=$b")
    }
  }

  test("near-duplicate pages share a long exact run") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val mutated = base.replace("tok100", "XXX")
    val lcs = SuffixArray.lcsLength(base, mutated)
    assert(lcs > base.length / 3)
  }

  test("degenerate inputs: ranks stay tied through max doubling rounds") {
    // all-equal characters keep every rank tied until k exceeds the suffix
    // length — the counting-sort rounds run with r ≈ n/k distinct ranks,
    // the radix path's worst case (the comparison-sort version sorted
    // equal-key runs; the radix version must place them stably)
    val a = "a" * 3000
    val b = "a" * 2900
    assert(SuffixArray.lcsLength(a, b) == 2900)
    // periodic text: long tied prefixes with late differentiation
    val p = "abcab" * 600
    val q = "abcab" * 580 + "z"
    assert(SuffixArray.lcsLength(p, q) == 2900)
    // brute-force agreement on longer binary-alphabet strings than the
    // 40-char random suite (tied ranks persist ~log2(500) rounds)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 8) {
      val x = Array.fill(500)(('a' + rnd.nextInt(2)).toChar).mkString
      val y = Array.fill(500)(('a' + rnd.nextInt(2)).toChar).mkString
      assert(SuffixArray.lcsLength(x, y) == bruteLcs(x, y))
    }
  }

  test("caps input length") {
    val big = "ab" * 50000
    assert(SuffixArray.lcsLength(big, big, maxLen = 1000) == 1000)
  }
}
