package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/hashes/test_lphash.jl: manual recomputation of
  * the floor quantization (:32-53), collision frequency vs the quadrature
  * oracle within 0.05 (:80-88), monotonicity (:68-78), p∉{1,2} error. */
class LpHasherSpec extends AnyFunSuite {
  val seed = 0L

  test("signature equals floor(coeff·x / r + shift) exactly") {
    val h = LpHasher(8, 5, scale = 2.0, power = 2, seed)
    val x = Array(0.5, -1.5, 2.0, 0.1, -0.7)
    val manual = Array.tabulate(8) { i =>
      var dot = 0.0
      for (d <- 0 until 5) dot += h.coeff(i)(d) * x(d)
      math.floor(dot / 2.0 + h.shift(i)).toInt
    }
    assert(h(x).sameElements(manual))
  }

  test("p must be 1 or 2") {
    assertThrows[IllegalArgumentException](LpHasher(4, 4, 1.0, 3, seed))
    assertThrows[IllegalArgumentException](LpHasher(4, 4, 1.0, 0, seed))
  }

  test("L2 collision frequency matches quadrature oracle within 0.05") {
    val dim = 4
    val h = LpHasher(1024, dim, scale = 2.0, power = 2, seed)
    val rnd = new scala.util.Random(seed)
    for (_ <- 0 until 64) {
      val x = Array.fill(dim)(rnd.nextGaussian())
      val y = Array.fill(dim)(rnd.nextGaussian())
      val dist = Similarities.l2Dist(x, y)
      val prob = h.singleHashCollisionProbability(dist)
      val (sx, sy) = (h(x), h(y))
      val freq = sx.zip(sy).count { case (p, q) => p == q }.toDouble / h.nHashes
      assert(math.abs(freq - prob) <= 0.05, s"dist=$dist freq=$freq prob=$prob")
    }
  }

  test("L1 collision frequency matches quadrature oracle within 0.05") {
    val dim = 4
    val h = LpHasher(1024, dim, scale = 4.0, power = 1, seed)
    val rnd = new scala.util.Random(seed + 1)
    for (_ <- 0 until 64) {
      val x = Array.fill(dim)(rnd.nextGaussian())
      val y = Array.fill(dim)(rnd.nextGaussian())
      val dist = Similarities.l1Dist(x, y)
      val prob = h.singleHashCollisionProbability(dist)
      val (sx, sy) = (h(x), h(y))
      val freq = sx.zip(sy).count { case (p, q) => p == q }.toDouble / h.nHashes
      assert(math.abs(freq - prob) <= 0.05, s"dist=$dist freq=$freq prob=$prob")
    }
  }

  test("monotonicity: closer points collide more (test_lphash.jl:68-78)") {
    val dim = 128
    val h = LpHasher(1024, dim, scale = 2.0, power = 2, seed)
    val rnd = new scala.util.Random(seed)
    val x = Array.fill(dim)(rnd.nextGaussian())
    val eps = Array.fill(dim)(rnd.nextGaussian())
    def shifted(scale: Double): Array[Double] = Array.tabulate(dim)(i => x(i) + scale * eps(i))
    def collisions(y: Array[Double]): Int = h(x).zip(h(y)).count { case (p, q) => p == q }
    val (near, mid, far) = (collisions(shifted(0.05)), collisions(shifted(0.5)), collisions(shifted(2.0)))
    assert(near > mid && mid > far, s"$near, $mid, $far")
  }

  test("collision probability is 1 at distance 0 and decreasing") {
    val h = LpHasher(4, 4, scale = 2.0, power = 2, seed)
    assert(h.singleHashCollisionProbability(0.0) == 1.0)
    val ps = Seq(0.1, 0.5, 1.0, 2.0, 4.0).map(h.singleHashCollisionProbability)
    assert(ps.zip(ps.tail).forall { case (a, b) => a > b })
  }
}
