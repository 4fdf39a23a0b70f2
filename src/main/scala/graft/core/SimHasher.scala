package graft.core

/** SimHash: sign of Gaussian random projections
  * (/root/reference/src/hashes/simhash.jl:28-36 ctor, :131-140 apply).
  *
  * Coefficients are regenerated deterministically from (seed, hashIdx, dim) —
  * never mutable state (the reference's lazy `resize!` growth, simhash.jl:86-106,
  * cannot distribute). Output bits are packed into 64-bit words, LSB-first:
  * bit i of the signature lives at word i/64, position i%64.
  *
  * Zero vectors hash to all-true (dot = 0 ≥ 0), matching the reference's test
  * (/root/reference/test/hashes/test_simhash.jl:25-38).
  */
final case class SimHasher(nHashes: Int, dim: Int, seed: Long = 0L)
    extends SymmetricHashFamily[Array[Double], Array[Long]] {
  require(nHashes > 0, "n_hashes must be positive")
  require(dim > 0, "dim must be positive")

  override def similarity: Similarity = Similarity.Cosine

  /** Pr = 1 − arccos(sim)/π (simhash.jl:121-122). */
  override def singleHashCollisionProbability(sim: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, sim))) / math.Pi

  /** Gaussian planes, materialized once (driver) and captured by closures /
    * broadcast to executors; row i = plane for hash i. */
  val coeff: Array[Array[Double]] = {
    val s = Rng.derive(seed, 0x53494D48L /* "SIMH" */ )
    Array.tabulate(nHashes)(i => Array.tabulate(dim)(d => Rng.gaussian(s, i.toLong * dim + d)))
  }

  def nWords: Int = (nHashes + 63) >>> 6

  def apply(x: Array[Double]): Array[Long] = {
    require(x.length == dim, s"dim mismatch: got ${x.length}, expected $dim")
    val out = new Array[Long](nWords)
    var i = 0
    while (i < nHashes) {
      val c = coeff(i)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += c(d) * x(d); d += 1 }
      if (dot >= 0.0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Array[Long], b: Array[Long]): Int = Similarities.hammingBits(a, b)
}
