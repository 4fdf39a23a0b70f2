package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Mirrors /root/reference/test/test_similarities.jl — conventions, error
  * paths, weighted variants, and function-space integrals vs closed forms —
  * plus the ScalaCheck properties from FIXTURES.md §3. */
class SimilaritiesSpec extends AnyFunSuite {

  /** Run a scalacheck property deterministically (fixed seed, 200 cases). */
  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(Seed(0L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("jaccard on sets: fixtures (test_similarities.jl:204-289)") {
    assert(Similarities.jaccard(Set(1, 2, 3), Set(2, 3, 4)) == 0.5)
    assert(Similarities.jaccard(Set.empty[Int], Set.empty[Int]) == 0.0) // J(∅,∅)=0
    assert(Similarities.jaccard(Set(1), Set.empty[Int]) == 0.0)
    assert(Similarities.jaccard(Set(1, 2), Set(1, 2)) == 1.0)
  }

  test("weighted jaccard on sets: fixture {a,b,c}/{b,c,d} with W → 0.6") {
    val w = Map("a" -> 0.2, "b" -> 2.4, "c" -> 0.6, "d" -> 1.8)
    val j = Similarities.jaccardWeighted(Set("a", "b", "c"), Set("b", "c", "d"), w)
    assert(math.abs(j - 0.6) < 1e-12)
    assertThrows[IllegalArgumentException](
      Similarities.jaccardWeighted(Set("a"), Set("a"), Map("a" -> -1.0)))
  }

  test("weighted jaccard on vectors: Σmin/Σmax fixture → 0.5") {
    val x = Array(0.8, 0.1, 0.3, 0.4, 0.1)
    val y = Array(1.0, 0.6, 0.0, 0.4, 0.5)
    // Σmin = .8+.1+0+.4+.1 = 1.4? no: min = (.8,.1,0,.4,.1)=1.4; max=(1.0,.6,.3,.4,.5)=2.8
    assert(math.abs(Similarities.jaccardWeighted(x, y) - 0.5) < 1e-12)
    assertThrows[IllegalArgumentException](Similarities.jaccardWeighted(Array(1.0), Array(-1.0)))
    assertThrows[IllegalArgumentException](Similarities.jaccardWeighted(Array(1.0), Array(1.0, 2.0)))
    assert(Similarities.jaccardWeighted(Array(0.0), Array(0.0)) == 0.0)
  }

  test("jaccard on bit vectors: [1,0,1,1,0]/[0,0,1,1,1] → 0.5; empty → 0") {
    val a = Array(java.lang.Long.parseLong("01101", 2))
    val b = Array(java.lang.Long.parseLong("11100", 2))
    assert(Similarities.jaccardBits(a, b) == 0.5)
    assert(Similarities.jaccardBits(Array(0L), Array(0L)) == 0.0)
  }

  test("jaccard sorted-array kernel agrees with set kernel") {
    val a = Array(1L, 5L, 9L, 12L)
    val b = Array(5L, 9L, 33L)
    assert(Similarities.jaccardSorted(a, b) == Similarities.jaccard(a.toSet, b.toSet))
    assert(Similarities.jaccardSorted(Array.empty[Long], Array.empty[Long]) == 0.0)
  }

  test("cossim errors on zero vectors; basic values") {
    assertThrows[IllegalArgumentException](Similarities.cossim(Array(0.0, 0.0), Array(1.0, 0.0)))
    assert(math.abs(Similarities.cossim(Array(1.0, 0.0), Array(0.0, 1.0))) < 1e-12)
    assert(math.abs(Similarities.cossim(Array(1.0, 2.0), Array(2.0, 4.0)) - 1.0) < 1e-12)
  }

  test("ℓp distances: dimension mismatch and p guards; known values") {
    assertThrows[IllegalArgumentException](Similarities.lpDist(Array(1.0), Array(1.0, 2.0), 2))
    assertThrows[IllegalArgumentException](Similarities.lpDist(Array(1.0), Array(1.0), -1))
    assert(Similarities.l1Dist(Array(1.0, 2.0), Array(3.0, 0.0)) == 4.0)
    assert(Similarities.l2Dist(Array(0.0, 0.0), Array(3.0, 4.0)) == 5.0)
    assert(math.abs(Similarities.lpDist(Array(0.0), Array(8.0), 3) - 8.0) < 1e-9)
  }

  test("function-space integrals vs closed forms (test_similarities.jl:86-198)") {
    val iv = Interval.closed(0.0, 2.0 * math.Pi)
    // ⟨sin, cos⟩ over a full period = 0 → cossim = 0
    assert(math.abs(Similarities.cossim(math.sin, math.cos, iv)) < 1e-6)
    // ‖sin − sin‖ = 0; L2(sin, 0) = sqrt(π)
    assert(Similarities.lpDist(math.sin, math.sin, iv, 2) < 1e-9)
    assert(math.abs(Similarities.lpDist(math.sin, _ => 0.0, iv, 2) - math.sqrt(math.Pi)) < 1e-6)
    // L1(x, 0) on [0,1] = 1/2
    val unit = Interval.closed(0.0, 1.0)
    assert(math.abs(Similarities.lpDist(x => x, _ => 0.0, unit, 1) - 0.5) < 1e-9)
  }

  // ---- ScalaCheck properties (FIXTURES.md §3) ----
  private val setGen = Gen.containerOf[Set, Long](Gen.choose(0L, 50L))

  test("property: jaccard symmetry, range [0,1], ∅-convention") {
    check(Prop.forAll(setGen, setGen) { (a: Set[Long], b: Set[Long]) =>
      val j = Similarities.jaccard(a, b)
      j >= 0.0 && j <= 1.0 &&
        j == Similarities.jaccard(b, a) &&
        (!(a.isEmpty && b.isEmpty) || j == 0.0) &&
        (!(a == b && a.nonEmpty) || j == 1.0)
    })
  }

  test("property: minhash signature invariant under permutation/duplication") {
    val h = MinHasher(16, 3L)
    val rnd = new scala.util.Random(0)
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))) { xs: List[Long] =>
      val sig = h(xs.toArray)
      h(rnd.shuffle(xs).toArray).sameElements(sig) && h((xs ++ xs).toArray).sameElements(sig)
    })
  }

  test("property: banding candidate probability 1−(1−s^r)^b bounds observed recall") {
    // direct check of the amplification algebra used to size the pipeline
    val cfg = graft.pipeline.DedupConfig(numHashes = 12, bands = 4)
    assert(cfg.rowsPerBand == 3)
    assert(math.abs(cfg.candidateProbability(1.0) - 1.0) < 1e-12)
    assert(cfg.candidateProbability(0.0) == 0.0)
    val p1 = cfg.candidateProbability(0.8)
    val p2 = cfg.candidateProbability(0.5)
    assert(p1 > p2)
    assert(math.abs(p1 - (1 - math.pow(1 - math.pow(0.8, 3), 4))) < 1e-12)
  }

  test("sparse kernels agree with their dense forms and stay O(nnz)") {
    import Similarities.SparseVec
    val x = SparseVec(Array(2, 7, 500000), Array(1.5, -2.0, 3.0), 1000000)
    val y = SparseVec(Array(2, 9, 500000), Array(4.0, 1.0, -1.0), 1000000)
    // values: dot = 1.5*4.0 + 3.0*(-1.0) = 3.0 over shared indices only
    assert(Similarities.innerProd(x, y) == 3.0)
    assert(Similarities.l2Norm(x) == math.sqrt(1.5 * 1.5 + 4.0 + 9.0))
    // dense cross-check on a SMALL logical size (toDense for 10^6 would
    // defeat the point; shrink the same structure)
    val xs = SparseVec(Array(2, 7, 12), Array(1.5, -2.0, 3.0), 16)
    val ys = SparseVec(Array(2, 9, 12), Array(4.0, 1.0, -1.0), 16)
    assert(Similarities.innerProd(xs, ys) ==
      Similarities.innerProd(xs.toDense, ys.toDense))
    assert(Similarities.cossim(xs, ys) ==
      Similarities.cossim(xs.toDense, ys.toDense))
    assert(math.abs(Similarities.l2Dist(xs, ys) -
      Similarities.l2Dist(xs.toDense, ys.toDense)) < 1e-12)
    // contract guards
    assertThrows[IllegalArgumentException](
      SparseVec(Array(3, 2), Array(1.0, 1.0), 10)) // not increasing
    assertThrows[IllegalArgumentException](
      Similarities.innerProd(x, SparseVec(Array(0), Array(1.0), 5)))
    assertThrows[IllegalArgumentException](
      Similarities.cossim(SparseVec(Array.empty[Int], Array.empty[Double], 16), ys))
  }
}
