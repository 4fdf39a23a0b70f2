package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/hashes/test_simhash.jl: 1024 hashes, 128
  * trials of random 4-dim pairs, per-trial |freq − (1 − arccos(s)/π)| ≤ 0.05
  * (test_simhash.jl:62-76); zero vector hashes to all-true (:25-38). */
class SimHasherSpec extends AnyFunSuite {
  val seed = 0L
  val dim = 4
  val h = SimHasher(1024, dim, seed)

  private def bit(sig: Array[Long], i: Int): Boolean = ((sig(i >>> 6) >>> (i & 63)) & 1L) == 1L

  private def collisionFreq(x: Array[Double], y: Array[Double]): Double = {
    val (sx, sy) = (h(x), h(y))
    (0 until h.nHashes).count(i => bit(sx, i) == bit(sy, i)).toDouble / h.nHashes
  }

  test("collision frequency matches 1 − arccos(sim)/π within 0.05 over 128 trials") {
    val rnd = new scala.util.Random(seed)
    def draw(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    var trial = 0
    while (trial < 128) {
      val (x, y) = (draw(), draw())
      val sim = Similarities.cossim(x, y)
      val prob = h.singleHashCollisionProbability(sim)
      val freq = collisionFreq(x, y)
      assert(math.abs(freq - prob) <= 0.05, s"trial $trial: freq=$freq prob=$prob sim=$sim")
      trial += 1
    }
  }

  test("zero vector hashes to all-true") {
    val sig = h(Array.fill(dim)(0.0))
    assert((0 until h.nHashes).forall(i => bit(sig, i)))
  }

  test("x and 2x hash identically (scale invariance of sign projections)") {
    val x = Array(0.3, -1.2, 0.7, 2.2)
    assert(h(x).sameElements(h(x.map(_ * 2.0))))
  }

  test("collision probability closed form endpoints") {
    assert(math.abs(h.singleHashCollisionProbability(1.0) - 1.0) < 1e-12)
    assert(math.abs(h.singleHashCollisionProbability(-1.0)) < 1e-12)
    assert(math.abs(h.singleHashCollisionProbability(0.0) - 0.5) < 1e-12)
  }

  test("dim mismatch errors") {
    assertThrows[IllegalArgumentException](h(Array(1.0, 2.0)))
  }
}
