package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/hashes/test_minhash.jl (fixed seed, statistical
  * collision-frequency oracle, monotonicity) with the reference's tolerance
  * |freq − J| ≤ 0.01 at 10,000 hashes (test_minhash.jl:97-122). */
class MinHasherSpec extends AnyFunSuite {
  val seed = 0L

  // universe 1..200 shuffled deterministically; A = first 100, B = 75∩A + 25 new,
  // C = 25∩A + 75 new (the reference's exact construction, test_minhash.jl:100-106)
  private val symbols: Array[Long] = {
    val arr = Array.tabulate(200)(i => (i + 1).toLong)
    val rnd = new scala.util.Random(seed)
    rnd.shuffle(arr.toSeq).toArray
  }
  val a: Array[Long] = symbols.slice(0, 100)
  val b: Array[Long] = symbols.slice(0, 75) ++ symbols.slice(100, 125)
  val c: Array[Long] = symbols.slice(0, 25) ++ symbols.slice(100, 175)

  test("collision frequency ≈ jaccard within 0.01 at 10k hashes") {
    val h = MinHasher(10000, seed)
    val (ha, hb, hc) = (h(a), h(b), h(c))
    val simAB = Similarities.jaccard(a.toSet, b.toSet) // 0.6
    val simAC = Similarities.jaccard(a.toSet, c.toSet) // 25/175
    def freq(x: Array[Long], y: Array[Long]): Double =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    assert(math.abs(freq(ha, hb) - simAB) <= 0.01)
    assert(math.abs(freq(ha, hc) - simAC) <= 0.01)
    // monotonicity (test_minhash.jl:76-95): more similar ⇒ more collisions
    assert(freq(ha, hb) > freq(ha, hc))
  }

  test("single-hash collision probability contract: Pr = jaccard") {
    val h = MinHasher(4, seed)
    assert(h.singleHashCollisionProbability(0.37) == 0.37)
    // AND-amplification (LSHBase.jl:130-160)
    assert(h.collisionProbability(0.5, 3) === math.pow(0.5, 3))
    assert(h.collisionProbability(0.5) === math.pow(0.5, 4))
  }

  test("signature invariant under permutation and duplication of input") {
    val h = MinHasher(64, seed)
    val base = Array(3L, 9L, 27L, 81L, 243L)
    val sig = h(base)
    assert(h(base.reverse).sameElements(sig))
    assert(h(base ++ base).sameElements(sig))
  }

  test("deterministic across instances with the same seed; differs across seeds") {
    val s1 = MinHasher(32, 7L)(a)
    val s2 = MinHasher(32, 7L)(a)
    val s3 = MinHasher(32, 8L)(a)
    assert(s1.sameElements(s2))
    assert(!s1.sameElements(s3))
  }

  test("empty set → all unsigned-max sentinel (never beats a real min)") {
    val h = MinHasher(8, seed)
    assert(h(Array.empty[Long]).forall(_ == -1L))
  }

  test("n_hashes must be positive") {
    assertThrows[IllegalArgumentException](MinHasher(0, seed))
  }

  test("fixed-universe mode throws on unknown symbols (minhash.jl:155-158)") {
    val known = Array(1L, 2L, 3L, 4L)
    val h = MinHasher(8, seed, universe = Some(known.toSet))
    // known symbols hash exactly like the unrestricted hasher (same seeds)
    assert(h(known).sameElements(MinHasher(8, seed)(known)))
    val e = intercept[IllegalArgumentException](h(Array(1L, 99L)))
    assert(e.getMessage.contains("Symbol 99 not found"))
  }
}
