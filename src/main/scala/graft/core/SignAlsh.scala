package graft.core

/** SignALSH: asymmetric LSH for maximum-inner-product search
  * (/root/reference/src/hashes/sign_alsh.jl:90-118 ctor, :153-221 index,
  * :227-253 query).
  *
  * Index transform P(x) = [x/M; ½−‖x/M‖²; ½−‖x/M‖⁴; …; ½−‖x/M‖^(2^m)] with
  * M = maxnorm (required explicit, error if absent/non-positive,
  * sign_alsh.jl:95-105); query transform Q(x) = [x/‖x‖; 0…0]. Hash bits are
  * the SimHash of the transformed vectors under a shared Gaussian matrix
  * [A | B]: we never materialize P(x) — the B·(½−norms) contribution is
  * accumulated directly onto A·u, the same fusion the reference does with
  * BLAS ger! (sign_alsh.jl:180-199).
  */
final case class SignAlsh(nHashes: Int, dim: Int, maxnorm: Double, m: Int = 3, seed: Long = 0L)
    extends AsymmetricHashFamily[Array[Double], Array[Long]] {
  require(nHashes > 0, "n_hashes must be positive")
  require(dim > 0, "dim must be positive")
  require(maxnorm > 0, "SignALSH requires an explicit positive maxnorm") // sign_alsh.jl:95-105
  require(m > 0, "m must be positive")

  override def similarity: Similarity = Similarity.InnerProd

  /** Same closed form as SimHash on the transformed vectors. */
  override def singleHashCollisionProbability(sim: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, sim))) / math.Pi

  val coeffA: Array[Array[Double]] = {
    val s = Rng.derive(seed, 0x414C5348L /* "ALSH" */ )
    Array.tabulate(nHashes)(i => Array.tabulate(dim)(d => Rng.gaussian(s, i.toLong * dim + d)))
  }

  val coeffB: Array[Array[Double]] = {
    val s = Rng.derive(seed, 0x414C5342L /* "ALSB" */ )
    Array.tabulate(nHashes)(i => Array.tabulate(m)(j => Rng.gaussian(s, i.toLong * m + j)))
  }

  def nWords: Int = (nHashes + 63) >>> 6

  def indexHash(x: Array[Double]): Array[Long] = {
    require(x.length == dim, s"dim mismatch: got ${x.length}, expected $dim")
    val norm = Similarities.l2Norm(x)
    require(norm <= maxnorm * (1.0 + 1e-12), s"‖x‖ = $norm exceeds maxnorm $maxnorm") // sign_alsh.jl:165-171
    val inv = 1.0 / maxnorm
    // ‖u‖^{2^j} for j = 1..m
    val normPows = new Array[Double](m)
    var p = norm * inv * norm * inv
    var j = 0
    while (j < m) { normPows(j) = p; p = p * p; j += 1 }
    val out = new Array[Long](nWords)
    var i = 0
    while (i < nHashes) {
      val a = coeffA(i)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += a(d) * x(d) * inv; d += 1 }
      val b = coeffB(i)
      j = 0
      while (j < m) { dot += b(j) * (0.5 - normPows(j)); j += 1 }
      if (dot >= 0.0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  def queryHash(x: Array[Double]): Array[Long] = {
    require(x.length == dim, s"dim mismatch: got ${x.length}, expected $dim")
    val norm = Similarities.l2Norm(x)
    val inv = if (norm > 0) 1.0 / norm else 1.0 // zero query → unnormalized (all dots 0 → all-true)
    val out = new Array[Long](nWords)
    var i = 0
    while (i < nHashes) {
      val a = coeffA(i)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += a(d) * x(d) * inv; d += 1 }
      if (dot >= 0.0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  def hamming(a: Array[Long], b: Array[Long]): Int = Similarities.hammingBits(a, b)
}
