package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/function_hashing/test_monte_carlo.jl:
  * valid-similarity dispatch (:49-60 via monte_carlo.jl:175-182), embedding
  * similarity ≈ function-space similarity, and collision frequencies through
  * the embedded family (:49-110). */
class MonteCarloHashSpec extends AnyFunSuite {
  val seed = 0L
  val iv: Interval = Interval.closed(0.0, 2.0 * math.Pi)

  test("only cosine/L1/L2 similarities are accepted") {
    assertThrows[IllegalArgumentException](
      MonteCarloHash(Similarity.Jaccard, iv, 8, seed = seed))
    assertThrows[IllegalArgumentException](
      MonteCarloHash(Similarity.InnerProd, iv, 8, seed = seed))
    MonteCarloHash(Similarity.Cosine, iv, 8, seed = seed) // ok
  }

  test("embedded cosine similarity approximates function-space cossim") {
    val h = MonteCarloHash(Similarity.Cosine, iv, 8, nSamples = 4096, seed = seed)
    val f = (x: Double) => math.sin(x)
    val g = (x: Double) => math.sin(x + 0.5)
    val exact = Similarities.cossim(f, g, iv) // = cos(0.5)
    val embedded = h.embeddedSimilarity(f, g)
    assert(math.abs(exact - math.cos(0.5)) < 1e-6)
    assert(math.abs(embedded - exact) < 0.05, s"embedded=$embedded exact=$exact")
  }

  test("embedded L2 distance approximates function-space L2") {
    val h = MonteCarloHash(Similarity.L2, iv, 8, nSamples = 8192, seed = seed)
    val f = (x: Double) => math.sin(x)
    val g = (_: Double) => 0.0
    val exact = Similarities.lpDist(f, g, iv, 2) // sqrt(π)
    val embedded = h.embeddedSimilarity(f, g)
    assert(math.abs(embedded - exact) / exact < 0.05, s"embedded=$embedded exact=$exact")
  }

  test("collision frequency through the embedded SimHash matches theory within 0.05") {
    val h = MonteCarloHash(Similarity.Cosine, iv, 1024, nSamples = 1024, seed = seed)
    val f = (x: Double) => math.sin(x)
    val g = (x: Double) => math.sin(x + 0.7)
    val sim = h.embeddedSimilarity(f, g)
    val prob = h.singleHashCollisionProbability(sim)
    val (hf, hg) = (
      h.indexHash(f).asInstanceOf[Array[Long]],
      h.indexHash(g).asInstanceOf[Array[Long]])
    def bit(s: Array[Long], i: Int): Boolean = ((s(i >>> 6) >>> (i & 63)) & 1L) == 1L
    val freq = (0 until 1024).count(i => bit(hf, i) == bit(hg, i)).toDouble / 1024
    assert(math.abs(freq - prob) <= 0.05, s"freq=$freq prob=$prob sim=$sim")
  }

  test("AND-amplification: p(n) == p(1)^n for every family (LSHBase.jl:130-160)") {
    val families: Seq[HashFamily] = Seq(
      MinHasher(8, seed),
      SimHasher(8, 4, seed),
      LpHasher(8, 4, 2.0, 2, seed),
      SignAlsh(8, 4, maxnorm = 5.0, seed = seed),
      MonteCarloHash(Similarity.Cosine, iv, 8, seed = seed))
    for (f <- families; s <- Seq(0.1, 0.5, 0.9)) {
      val p1 = f.singleHashCollisionProbability(s)
      assert(math.abs(f.collisionProbability(s, 8) - math.pow(p1, 8)) < 1e-12)
    }
  }

  test("similarity → family registry (lshfunction.jl:82-90)") {
    assert(HashFamilies.forSimilarity(Similarity.Jaccard, 4).isInstanceOf[MinHasher])
    assert(HashFamilies.forSimilarity(Similarity.Cosine, 4, dim = 3).isInstanceOf[SimHasher])
    assert(HashFamilies.forSimilarity(Similarity.L1, 4, dim = 3).asInstanceOf[LpHasher].power == 1)
    assert(HashFamilies.forSimilarity(Similarity.L2, 4, dim = 3).asInstanceOf[LpHasher].power == 2)
    assert(HashFamilies.forSimilarity(Similarity.InnerProd, 4, dim = 3, maxnorm = 2.0).isInstanceOf[SignAlsh])
  }
}
