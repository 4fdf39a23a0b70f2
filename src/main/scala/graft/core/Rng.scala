package graft.core

/** Deterministic, stateless, counter-based randomness.
  *
  * The reference draws random state at hash-function construction time and
  * mutates it lazily during hashing (/root/reference/src/hashes/minhash.jl:163-168,
  * simhash.jl:86-106). That design cannot distribute: executors would need to
  * coordinate dictionary updates. We replace it with *counter-based* seeded
  * hashing: every coefficient is a pure function of (seed, indices), so any
  * executor can regenerate any coefficient without communication, and results
  * are reproducible across cluster sizes (the reference's own tests demand a
  * fixed seed, /root/reference/test/utils.jl:7).
  */
object Rng {
  final val Golden = 0x9E3779B97F4A7C15L

  /** SplitMix64 finalizer (public-domain constants, Steele et al. 2014). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Seeded 64-bit hash of a 64-bit value. */
  @inline def hash2(seed: Long, x: Long): Long = mix64(x ^ mix64(seed))

  /** i-th draw of the stream identified by `seed` (counter-based). */
  @inline def at(seed: Long, i: Long): Long = mix64(seed + i * Golden)

  /** Derive an independent sub-stream seed. */
  @inline def derive(seed: Long, tag: Long): Long = mix64(seed ^ mix64(tag))

  /** Uniform in (0, 1]: never 0 so log(u) is safe. */
  @inline def uniform01(bits: Long): Double =
    ((bits >>> 11) + 1).toDouble * 1.1102230246251565e-16 // 2^-53

  /** Uniform in [0, 1). */
  @inline def uniform0Incl(bits: Long): Double =
    (bits >>> 11).toDouble * 1.1102230246251565e-16

  /** Standard normal via Box–Muller from two counter draws. */
  def gaussian(seed: Long, i: Long): Double = {
    val u1 = uniform01(at(seed, 2 * i))
    val u2 = uniform0Incl(at(seed, 2 * i + 1))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Standard Cauchy via inverse CDF (reference uses Cauchy coeffs for p=1,
    * /root/reference/src/hashes/lphash.jl:67-75). */
  def cauchy(seed: Long, i: Long): Double =
    math.tan(math.Pi * (uniform01(at(seed, i)) - 0.5))

  /** 64-bit hash of a UTF-8 string (FNV-1a into splitmix finalizer). */
  def hashString(seed: Long, s: String): Long = {
    var h = 0xCBF29CE484222325L ^ mix64(seed)
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i).toLong) * 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** Unsigned comparison key: flip the sign bit so signed compare == unsigned.
    * Julia's UInt64 `min` in MinHash (/root/reference/src/hashes/minhash.jl:149-169)
    * is unsigned; a silent signed min over Java Long is the classic trap here. */
  @inline def unsignedKey(x: Long): Long = x ^ Long.MinValue
}
