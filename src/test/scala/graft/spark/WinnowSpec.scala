package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CrossEngine, WinnowKernel}

/** Winnowing fingerprint kernels: modular arithmetic pinned against BigInt,
  * window selection pinned against the brute-force definition, the SIGMOD'03
  * winnowing guarantee, cross-kernel selection agreement, and the engine-wide
  * null/short-text contract. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(7)
  private def u8(s: String): UTF8String = UTF8String.fromString(s)

  // -------------------------------------------------- modular arithmetic

  test("mulmod61 matches BigInt over random 61-bit operands and boundaries") {
    val m = BigInt(WinnowKernel.M61)
    val edge = Seq(0L, 1L, 2L, WinnowKernel.M61 - 1, WinnowKernel.M61 / 2, (1L << 60) + 17)
    val cases = edge.flatMap(a => edge.map(b => (a, b))) ++
      Seq.fill(2000)((math.abs(rnd.nextLong()) % WinnowKernel.M61,
        math.abs(rnd.nextLong()) % WinnowKernel.M61))
    cases.foreach { case (a, b) =>
      assert(BigInt(WinnowKernel.mulmod61(a, b)) == (BigInt(a) * BigInt(b)) % m,
        s"mulmod61($a, $b)")
    }
  }

  test("rolling gram hashes equal the direct polynomial definition") {
    val text = "the quick brown fox jumps over the lazy dog, twice over"
    val k = 5
    val seed = 42L
    val b = BigInt(WinnowKernel.baseFor(seed))
    val m = BigInt(WinnowKernel.M61)
    val cps = text.codePoints().toArray
    // brute-force h(i) = Σ cp(i+j)·b^(k−1−j) mod m, one per gram, w=1 keeps
    // every gram hash so the rolling recurrence is exposed directly
    val expect = (0 to cps.length - k).map { i =>
      (0 until k).foldLeft(BigInt(0))((acc, j) => (acc * b + cps(i + j)) % m).toLong
    }.distinct.sorted
    val got = WinnowKernel.rollingWinnow(u8(text), k, 1, seed).toLongArray().toSeq
    assert(got == expect)
  }

  // -------------------------------------------------- window selection

  test("winnowSelect matches the brute-force window-min definition") {
    for (g <- Seq(1, 2, 5, 16, 17, 100); w <- Seq(1, 2, 4, 16, 50)) {
      val h = Array.fill(g)(rnd.nextInt(40).toLong) // small range forces ties
      val nWin = math.max(1, g - w + 1)
      val expect = (0 until nWin)
        .map(j => h.slice(j, math.min(j + w, g)).min).distinct.sorted
      val got = WinnowKernel.winnowSelect(h, w).toLongArray().toSeq
      assert(got == expect, s"g=$g w=$w h=${h.mkString(",")}")
    }
  }

  test("winnowing guarantee: shared substring of length ≥ w+k−1 shares a fingerprint") {
    val k = 8; val w = 16
    val shared = rnd.alphanumeric.take(w + k - 1).mkString // exactly the bound
    for (trial <- 1 to 20) {
      val a = rnd.alphanumeric.take(rnd.nextInt(120)).mkString + shared +
        rnd.alphanumeric.take(rnd.nextInt(120)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(120)).mkString + shared +
        rnd.alphanumeric.take(rnd.nextInt(120)).mkString
      for (kernel <- Seq(
          (t: String) => WinnowKernel.md5Winnow(u8(t), k, w).toLongArray().toSet,
          (t: String) => WinnowKernel.rollingWinnow(u8(t), k, w, 42L).toLongArray().toSet)) {
        assert(kernel(a).intersect(kernel(b)).nonEmpty, s"trial $trial")
      }
    }
  }

  test("both kernels respect the winnowing density/cardinality bounds") {
    // The kernels are different hash FAMILIES, so the selected positions
    // (each window's argmin) differ — there is deliberately no cross-kernel
    // selection-equality contract. What both must satisfy: at most one
    // fingerprint per window (≤ nWin) and at least one per w consecutive
    // windows (a single hash can be the min of at most w windows).
    val text = rnd.alphanumeric.take(400).mkString
    val k = 8; val w = 16
    val g = text.length - k + 1
    val nWin = g - w + 1
    val md5N = WinnowKernel.md5Winnow(u8(text), k, w).numElements()
    val rolN = WinnowKernel.rollingWinnow(u8(text), k, w, 42L).numElements()
    for (n <- Seq(md5N, rolN)) {
      assert(n <= nWin)
      // one hash covers at most w consecutive windows → ≥ nWin/w selections
      assert(n >= nWin / w)
    }
  }

  test("md5 gram hash equals CrossEngine.md5long of the gram string") {
    val text = "abcdefghij"
    val k = 4
    // w=1 keeps every gram hash
    val got = WinnowKernel.md5Winnow(u8(text), k, 1).toLongArray().toSet
    val expect = (0 to text.length - k).map(i => CrossEngine.md5long(text.substring(i, i + k))).toSet
    assert(got == expect)
  }

  // -------------------------------------------------- contract edges

  test("kernel-level guards: w < 1 and k < 1 fail fast for direct callers") {
    // the expression layer checks k/w at analysis time; the kernels are
    // public and must not crash with an out-of-bounds read or emit a
    // phantom 0L fingerprint when called directly with w=0
    intercept[IllegalArgumentException] { WinnowKernel.winnowSelect(Array(1L), 0) }
    intercept[IllegalArgumentException] { WinnowKernel.md5Winnow(u8("abcdefgh"), 0, 4) }
    intercept[IllegalArgumentException] { WinnowKernel.rollingWinnow(u8("abcdefgh"), 0, 4, 1L) }
  }

  test("null text → empty set; text shorter than k → empty set") {
    assert(WinnowKernel.md5Winnow(null, 8, 16).numElements() == 0)
    assert(WinnowKernel.rollingWinnow(null, 8, 16, 42L).numElements() == 0)
    assert(WinnowKernel.md5Winnow(u8("short"), 8, 16).numElements() == 0)
    assert(WinnowKernel.rollingWinnow(u8("short"), 8, 16, 42L).numElements() == 0)
  }

  test("fewer grams than w → exactly one fingerprint, the global min") {
    val text = "0123456789ab" // 12 cps, k=8 → 5 grams < w=16
    val all = WinnowKernel.md5Winnow(u8(text), 8, 1).toLongArray()
    val one = WinnowKernel.md5Winnow(u8(text), 8, 16).toLongArray()
    assert(one.toSeq == Seq(all.min))
  }

  test("grams are CODE-POINT grams (astral-plane char counts once)") {
    // U+1D11E MUSICAL SYMBOL G CLEF is 2 UTF-16 chars but 1 code point
    val clef = new String(Character.toChars(0x1D11E))
    val text = s"ab${clef}cd"
    // 5 code points, k=4 → 2 grams; a UTF-16-unit kernel would see 6 chars
    // → 3 grams
    assert(WinnowKernel.md5Winnow(u8(text), 4, 1).numElements() == 2)
    assert(WinnowKernel.rollingWinnow(u8(text), 4, 1, 42L).numElements() == 2)
  }

  test("rolling fingerprints are seed-sensitive; md5 form is seed-free") {
    val text = rnd.alphanumeric.take(100).mkString
    val a = WinnowKernel.rollingWinnow(u8(text), 8, 16, 1L).toLongArray().toSet
    val b = WinnowKernel.rollingWinnow(u8(text), 8, 16, 2L).toLongArray().toSet
    assert(a != b)
  }

  // -------------------------------------------------- expression surface

  test("graft_winnow_md5 / graft_winnow match the kernels through the Column API") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val text = "the quick brown fox jumps over the lazy dog"
    val row = Seq(text).toDF("t")
      .select(
        call_function("graft_winnow_md5", col("t"), lit(8), lit(4)).as("m"),
        call_function("graft_winnow", col("t"), lit(8), lit(4), lit(42L)).as("r"))
      .collect().head
    assert(row.getSeq[Long](0) == WinnowKernel.md5Winnow(u8(text), 8, 4).toLongArray().toSeq)
    assert(row.getSeq[Long](1) == WinnowKernel.rollingWinnow(u8(text), 8, 4, 42L).toLongArray().toSeq)
  }

  test("invalid k/w is an analysis-time error, not a per-row crash") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val df = Seq("text").toDF("t")
    intercept[Exception] {
      df.select(call_function("graft_winnow_md5", col("t"), lit(0), lit(4))).collect()
    }
    intercept[Exception] {
      df.select(call_function("graft_winnow", col("t"), lit(8), lit(0), lit(42L))).collect()
    }
  }
}
