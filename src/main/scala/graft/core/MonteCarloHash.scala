package graft.core

/** LSH over function spaces Lᵖ(Ω) by Monte-Carlo embedding
  * (/root/reference/src/function_hashing/monte_carlo.jl:39-52 ctor,
  * :189-192 embedding, :220-228 index/query).
  *
  * Draws `nSamples` points from a seeded uniform sampler over the interval
  * once at construction; a function f is embedded as α·f.(points) with
  * α = (volume/nSamples)^(1/p), then hashed by the discrete family for the
  * similarity: cosine→SimHash, L1→L1Hash, L2→L2Hash (anything else errors,
  * monte_carlo.jl:175-182). In the Spark engine this is the `Vectorizer`
  * pattern: project each document's feature function onto fixed seeded sample
  * coordinates, then reuse the vector families.
  */
final case class MonteCarloHash(
    sim: Similarity,
    interval: Interval,
    nHashes: Int,
    nSamples: Int = 1024,
    scale: Double = 1.0,
    seed: Long = 0L)
    extends HashFamily {
  require(
    sim == Similarity.Cosine || sim == Similarity.L1 || sim == Similarity.L2,
    s"MonteCarloHash supports cosine/L1/L2 only, got $sim") // monte_carlo.jl:175-182
  require(nSamples > 0, "n_samples must be positive")

  override def similarity: Similarity = sim

  private val p: Double = if (sim == Similarity.L1) 1.0 else 2.0
  val volume: Double = interval.width
  val alpha: Double = math.pow(volume / nSamples, 1.0 / p)

  /** Sample points ~ U(interval), drawn once, seeded (monte_carlo.jl:41). */
  val samplePoints: Array[Double] = {
    val s = Rng.derive(seed, 0x4D435348L /* "MCSH" */ )
    Array.tabulate(nSamples)(i => interval.lo + Rng.uniform0Incl(Rng.at(s, i.toLong)) * volume)
  }

  val discrete: SymmetricHashFamily[Array[Double], _] = sim match {
    case Similarity.Cosine => SimHasher(nHashes, nSamples, Rng.derive(seed, 1))
    case Similarity.L1 => LpHasher(nHashes, nSamples, scale, 1, Rng.derive(seed, 1))
    case Similarity.L2 => LpHasher(nHashes, nSamples, scale, 2, Rng.derive(seed, 1))
    case other => throw new IllegalArgumentException(other.toString)
  }

  override def singleHashCollisionProbability(s: Double): Double =
    discrete.singleHashCollisionProbability(s)

  /** α·f.(samplePoints) (monte_carlo.jl:189-192). */
  def embed(f: Double => Double): Array[Double] = {
    val out = new Array[Double](nSamples)
    var i = 0
    while (i < nSamples) { out(i) = alpha * f(samplePoints(i)); i += 1 }
    out
  }

  def indexHash(f: Double => Double): Any = discrete.indexHash(embed(f))
  def queryHash(f: Double => Double): Any = discrete.queryHash(embed(f))

  /** Similarity of the two embedded sample vectors — diagnostic
    * (monte_carlo.jl:235-240). */
  def embeddedSimilarity(f: Double => Double, g: Double => Double): Double = {
    val (ef, eg) = (embed(f), embed(g))
    sim match {
      case Similarity.Cosine => Similarities.cossim(ef, eg)
      case Similarity.L1 => Similarities.l1Dist(ef, eg)
      case _ => Similarities.l2Dist(ef, eg)
    }
  }
}
