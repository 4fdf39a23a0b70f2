package graft.core

/** Interval of ℝ with open/closed endpoints — the reference's `RealInterval`
  * (/root/reference/src/intervals.jl:35-52; ops :79-136). Used only for
  * function-space integration bounds and similarity-range documentation;
  * no Catalyst analogue is needed.
  */
final case class Interval(lo: Double, hi: Double, loClosed: Boolean, hiClosed: Boolean) {
  def contains(x: Double): Boolean =
    (if (loClosed) x >= lo else x > lo) && (if (hiClosed) x <= hi else x < hi)

  def isEmpty: Boolean =
    lo > hi || (lo == hi && !(loClosed && hiClosed))

  def width: Double = if (isEmpty) 0.0 else hi - lo

  def intersect(o: Interval): Interval = {
    val (nlo, nloC) =
      if (lo > o.lo) (lo, loClosed)
      else if (lo < o.lo) (o.lo, o.loClosed)
      else (lo, loClosed && o.loClosed)
    val (nhi, nhiC) =
      if (hi < o.hi) (hi, hiClosed)
      else if (hi > o.hi) (o.hi, o.hiClosed)
      else (hi, hiClosed && o.hiClosed)
    Interval(nlo, nhi, nloC, nhiC)
  }

  /** The reference defines == so all empty intervals are equal
    * (src/intervals.jl:126-136). */
  def sameAs(o: Interval): Boolean =
    (isEmpty && o.isEmpty) ||
      (lo == o.lo && hi == o.hi && loClosed == o.loClosed && hiClosed == o.hiClosed)
}

object Interval {
  /** Equivalent of `@interval(a ≤ x ≤ b)` etc. (src/intervals.jl:192-254). */
  def closed(a: Double, b: Double): Interval = Interval(a, b, loClosed = true, hiClosed = true)
  def open(a: Double, b: Double): Interval = Interval(a, b, loClosed = false, hiClosed = false)
  def closedOpen(a: Double, b: Double): Interval = Interval(a, b, loClosed = true, hiClosed = false)
  def openClosed(a: Double, b: Double): Interval = Interval(a, b, loClosed = false, hiClosed = true)
}
