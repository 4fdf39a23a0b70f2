package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/test/test_intervals.jl incl. the 128-intersection
  * property loop (:99-108). */
class IntervalSpec extends AnyFunSuite {

  test("membership respects open/closed endpoints") {
    val iv = Interval.closedOpen(0.0, 1.0) // 0 ≤ x < 1
    assert(iv.contains(0.0) && iv.contains(0.5) && !iv.contains(1.0) && !iv.contains(-0.1))
    val ov = Interval.openClosed(0.0, 1.0)
    assert(!ov.contains(0.0) && ov.contains(1.0))
  }

  test("isEmpty / width") {
    assert(Interval.open(1.0, 1.0).isEmpty)
    assert(!Interval.closed(1.0, 1.0).isEmpty)
    assert(Interval.closed(2.0, 1.0).isEmpty)
    assert(Interval.closed(1.0, 3.5).width == 2.5)
    assert(Interval.open(2.0, 1.0).width == 0.0)
  }

  test("empty intervals compare equal (intervals.jl:126-136)") {
    assert(Interval.open(0.0, 0.0).sameAs(Interval.closedOpen(5.0, 5.0)))
    assert(!Interval.closed(0.0, 1.0).sameAs(Interval.open(0.0, 1.0)))
  }

  test("128 random intersections: x ∈ A∩B ⟺ x ∈ A ∧ x ∈ B") {
    val rnd = new scala.util.Random(0)
    for (_ <- 0 until 128) {
      def draw(): Interval =
        Interval(rnd.nextDouble() * 4 - 2, rnd.nextDouble() * 4 - 2, rnd.nextBoolean(), rnd.nextBoolean())
      val (a, b) = (draw(), draw())
      val inter = a.intersect(b)
      for (_ <- 0 until 16) {
        val x = rnd.nextDouble() * 6 - 3
        assert(inter.contains(x) == (a.contains(x) && b.contains(x)), s"$a ∩ $b at $x")
      }
    }
  }
}
