package graft.core

/** p-stable LSH for ℓ1/ℓ2 distance: h(x) = ⌊(a·x)/r + b⌋
  * (/root/reference/src/hashes/lphash.jl:59-85 ctor, :221-231 apply).
  *
  * p ∈ {1, 2} only (error otherwise, lphash.jl:73): coefficients are
  * Cauchy(0,1) for p=1, Normal(0,1) for p=2; shift b ~ U[0,1) per hash;
  * `scale` is the user-chosen bucket width r. Output is Int32 bucket indices
  * (may be negative), matching the reference's hashtype (lphash.jl:181).
  */
final case class LpHasher(nHashes: Int, dim: Int, scale: Double, power: Int, seed: Long = 0L)
    extends SymmetricHashFamily[Array[Double], Array[Int]] {
  require(nHashes > 0, "n_hashes must be positive")
  require(dim > 0, "dim must be positive")
  require(scale > 0, "scale must be positive")
  require(power == 1 || power == 2, s"LpHash only supports p ∈ {1,2}, got $power")

  override def similarity: Similarity = if (power == 1) Similarity.L1 else Similarity.L2

  val coeff: Array[Array[Double]] = {
    val s = Rng.derive(seed, 0x4C504853L /* "LPHS" */ )
    Array.tabulate(nHashes) { i =>
      Array.tabulate(dim) { d =>
        val idx = i.toLong * dim + d
        if (power == 1) Rng.cauchy(s, idx) else Rng.gaussian(s, idx)
      }
    }
  }

  val shift: Array[Double] = {
    val s = Rng.derive(seed, 0x53484654L /* "SHFT" */ )
    Array.tabulate(nHashes)(i => Rng.uniform0Incl(Rng.at(s, i.toLong)))
  }

  def apply(x: Array[Double]): Array[Int] = {
    require(x.length == dim, s"dim mismatch: got ${x.length}, expected $dim")
    val out = new Array[Int](nHashes)
    var i = 0
    while (i < nHashes) {
      val c = coeff(i)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += c(d) * x(d); d += 1 }
      out(i) = math.floor(dot / scale + shift(i)).toInt
      i += 1
    }
    out
  }

  /** Collision probability at distance c: 2·∫₀ʳ pdf(t/c)/c · (1 − t/r) dt,
    * numerically (reference uses QuadGK, lphash.jl:184-203); 1 at c≈0. */
  override def singleHashCollisionProbability(distance: Double): Double = {
    val c = distance
    if (c <= 1e-12) 1.0
    else {
      val pdf: Double => Double =
        if (power == 1) x => 1.0 / (math.Pi * (1.0 + x * x))
        else x => math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)
      Similarities.simpson(t => 2.0 * pdf(t / c) / c * (1.0 - t / scale), 0.0, scale)
    }
  }
}
