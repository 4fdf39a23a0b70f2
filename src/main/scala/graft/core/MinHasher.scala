package graft.core

/** MinHash over sets of 64-bit symbols.
  *
  * The reference draws one random permutation (fixed-universe mode) or a lazy
  * random dictionary per hash function (/root/reference/src/hashes/minhash.jl:82-133)
  * and hashes a set as the min mapped value (:146-170). A permutation over a
  * fixed universe is min-wise independent hashing; the standard distributed
  * realization is 64-bit *seeded hashing* — stateless, coordination-free,
  * preserving Pr[h(A)=h(B)] = J(A,B) (:142) up to ≈2⁻⁶⁴ collision noise.
  *
  * Comparisons are UNSIGNED (Julia UInt64 min); see [[Rng.unsignedKey]].
  *
  * Fixed-universe mode (minhash.jl:155-158): when `universe` is supplied the
  * hasher THROWS on any symbol outside it — the reference's `fixed_symbols`
  * contract. The distributed pipeline deliberately does NOT use this mode (a
  * fixed dictionary cannot be updated coordination-free across executors,
  * and Pr[h(A)=h(B)] = J holds either way); it exists for API parity and for
  * callers that want typo'd symbol streams to fail fast instead of silently
  * hashing garbage.
  */
final case class MinHasher(
    nHashes: Int,
    seed: Long = 0L,
    universe: Option[Set[Long]] = None)
    extends SymmetricHashFamily[Array[Long], Array[Long]] {
  require(nHashes > 0, "n_hashes must be positive")

  override def similarity: Similarity = Similarity.Jaccard

  /** Pr[h(A)=h(B)] = jaccard(A,B) (minhash.jl:142). */
  override def singleHashCollisionProbability(sim: Double): Double = sim

  private val laneSeeds: Array[Long] =
    Array.tabulate(nHashes)(i => Rng.derive(seed, 0x4D494E48L /* "MINH" */ + i.toLong))

  /** Signature of a shingle set. Empty set → all-ones (unsigned max) so empty
    * docs never spuriously beat real minima; the verify stage's J(∅,∅)=0
    * convention rejects empty-empty pairs downstream. */
  def apply(shingles: Array[Long]): Array[Long] = {
    universe.foreach { u =>
      var j = 0
      while (j < shingles.length) {
        if (!u.contains(shingles(j)))
          throw new IllegalArgumentException(
            s"Symbol ${shingles(j)} not found") // minhash.jl:155-158 contract
        j += 1
      }
    }
    val sig = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      val s = laneSeeds(i)
      var best = -1L // unsigned max
      var bestKey = Long.MaxValue // unsignedKey(-1L)
      var j = 0
      while (j < shingles.length) {
        val h = Rng.hash2(s, shingles(j))
        val k = Rng.unsignedKey(h)
        if (k < bestKey) { bestKey = k; best = h }
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }
}
