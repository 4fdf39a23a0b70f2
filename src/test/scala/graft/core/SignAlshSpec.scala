package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/hashes/test_sign_alsh.jl: inner-product order
  * test (:85-120) — for a fixed query, index vectors with larger inner product
  * collide strictly more often — and the maxnorm guards (:11-36,
  * sign_alsh.jl:95-105,165-171). */
class SignAlshSpec extends AnyFunSuite {
  val seed = 0L
  val dim = 5

  test("maxnorm is required positive") {
    assertThrows[IllegalArgumentException](SignAlsh(8, dim, maxnorm = -1.0, seed = seed))
    assertThrows[IllegalArgumentException](SignAlsh(8, dim, maxnorm = 0.0, seed = seed))
  }

  test("index_hash errors when ‖x‖ > maxnorm") {
    val h = SignAlsh(8, dim, maxnorm = 1.0, seed = seed)
    assertThrows[IllegalArgumentException](h.indexHash(Array(2.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("collisions ordered by inner product: 10x > x > 0 > −x at 512 hashes") {
    val h = SignAlsh(512, dim, maxnorm = 40.0, seed = seed)
    val rnd = new scala.util.Random(seed)
    val x = Array.fill(dim)(rnd.nextGaussian())
    val q = h.queryHash(x)
    def coll(y: Array[Double]): Int = {
      val ih = h.indexHash(y)
      var c = 0
      for (i <- 0 until 512)
        if (((ih(i >>> 6) >>> (i & 63)) & 1L) == ((q(i >>> 6) >>> (i & 63)) & 1L)) c += 1
      c
    }
    val c10x = coll(x.map(_ * 10))
    val cx = coll(x)
    val c0 = coll(Array.fill(dim)(0.0))
    val cneg = coll(x.map(-_))
    assert(c10x > cx, s"10x=$c10x x=$cx")
    assert(cx > c0, s"x=$cx 0=$c0")
    assert(c0 > cneg, s"0=$c0 -x=$cneg")
  }

  test("query hash is scale invariant (normalized)") {
    val h = SignAlsh(64, dim, maxnorm = 10.0, seed = seed)
    val x = Array(1.0, -2.0, 0.5, 3.0, -0.2)
    assert(h.queryHash(x).sameElements(h.queryHash(x.map(_ * 5.0))))
  }
}
