package graft.core

/** Similarity ADT — the reference's similarity-function registry
  * (`@register_similarity!`, /root/reference/src/hashes/lshfunction.jl:40-90)
  * as a sealed type: no runtime mutability needed.
  */
sealed trait Similarity
object Similarity {
  case object Jaccard extends Similarity
  case object Cosine extends Similarity
  case object L1 extends Similarity
  case object L2 extends Similarity
  case object InnerProd extends Similarity
}

/** Contract of a bundle of `nHashes` hash functions from one LSH family
  * (/root/reference/src/LSHBase.jl:24-50, introspection :232-290).
  *
  * `collisionProbability(sim, n)` = single-hash probability raised to n
  * (AND-amplification, LSHBase.jl:130-160).
  */
trait HashFamily {
  def nHashes: Int
  def similarity: Similarity

  /** Pr[h(x) = h(y)] for ONE hash, given similarity/distance `sim`. */
  def singleHashCollisionProbability(sim: Double): Double

  def collisionProbability(sim: Double, n: Int): Double = {
    require(n >= 0, "n_hashes must be non-negative")
    math.pow(singleHashCollisionProbability(sim), n.toDouble)
  }

  def collisionProbability(sim: Double): Double = collisionProbability(sim, nHashes)
}

/** Symmetric families hash index and query items identically
  * (LSHBase.jl:33, default index/query = apply at :303,312). */
trait SymmetricHashFamily[-In, Sig] extends HashFamily {
  def apply(x: In): Sig
  def indexHash(x: In): Sig = apply(x)
  def queryHash(x: In): Sig = apply(x)
}

/** Asymmetric families (SignALSH): distinct index vs query transforms
  * (LSHBase.jl:42,334,343). */
trait AsymmetricHashFamily[-In, Sig] extends HashFamily {
  def indexHash(x: In): Sig
  def queryHash(x: In): Sig
}

/** similarity → default family factory — the registrations applied at module
  * load in the reference (lshfunction.jl:82-90):
  * cossim→SimHash, ℓ1→L1Hash, ℓ2→L2Hash, jaccard→MinHash, inner_prod→SignALSH.
  */
object HashFamilies {
  val DefaultNHashes = 1 // LSHBase.jl:16

  def forSimilarity(
      sim: Similarity,
      nHashes: Int = DefaultNHashes,
      dim: Int = 0,
      seed: Long = 0L,
      scale: Double = 1.0,
      maxnorm: Double = -1.0): HashFamily = sim match {
    case Similarity.Jaccard => MinHasher(nHashes, seed)
    case Similarity.Cosine => SimHasher(nHashes, dim, seed)
    case Similarity.L1 => LpHasher(nHashes, dim, scale, 1, seed)
    case Similarity.L2 => LpHasher(nHashes, dim, scale, 2, seed)
    case Similarity.InnerProd => SignAlsh(nHashes, dim, maxnorm, seed = seed)
  }
}
