package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{MinHasher, Rng, Similarities}

/** Column-level functions of the engine.
  *
  * Design rule: built-in `org.apache.spark.sql.functions` (codegen'd) wherever
  * the semantics allow; compact Scala UDFs for the per-row signature kernels
  * where the built-in form (explode × k seeds → groupBy(min)) would cost a
  * k-fold shuffle blow-up (see SURVEY.md §2.a op #2). Each UDF does all k
  * lanes in one pass over the row — the same batching the reference gets from
  * BLAS (/root/reference/src/hashes/simhash.jl:131-140).
  */
object GraftFunctions extends Serializable {

  // ---------------------------------------------------------------- shingling

  /** Word n-gram shingles; split on single space KEEPING empty tokens
    * (parity with SQL string_split / Spark split semantics). */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Array.empty
    else Array.tabulate(ws.length - n + 1)(i => ws.slice(i, i + n).mkString(" "))
  }

  def charNgrams(text: String, n: Int): Array[String] = {
    if (text.length < n) Array.empty
    else Array.tabulate(text.length - n + 1)(i => text.substring(i, i + n))
  }

  /** Distinct, unsigned-sorted 64-bit hashes of a doc's shingle set — the
    * MinHash input with SET semantics (/root/reference/src/hashes/minhash.jl:146-170).
    * Sorted so the verify kernel can single-pass merge. */
  def shingleHashSet(shingles: Array[String], seed: Long): Array[Long] = {
    val hs = new Array[Long](shingles.length)
    var i = 0
    while (i < shingles.length) { hs(i) = Rng.hashString(seed, shingles(i)); i += 1 }
    val distinct = hs.distinct
    java.util.Arrays.sort(distinct)
    distinct
  }

  /** Word-n-gram shingle hash set computed WITHOUT materializing n-gram
    * strings: each word is hashed once, n-gram hash = mix-chain of the word
    * hashes. Same set semantics as [[shingleHashSet]]∘[[wordNgrams]] (equal
    * n-grams ⇒ equal hashes; collisions ≈ 2⁻⁶⁴) at a fraction of the
    * allocation rate — this is the hottest per-row loop in the pipeline. */
  def wordNgramHashSet(text: String, n: Int, seed: Long): Array[Long] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) return Array.empty[Long]
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = Rng.hashString(seed, ws(i)); i += 1 }
    val out = new Array[Long](ws.length - n + 1)
    i = 0
    while (i < out.length) {
      // ORDER-SENSITIVE chain: h2 remixes the accumulator before xoring the
      // next word hash. A plain mix64(h ^ w) is symmetric in its inputs, so
      // "a b" and "b a" would collide — caught by the DuckDB string oracle.
      var h = wh(i)
      var j = 1
      while (j < n) { h = Rng.hash2(h, wh(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    val distinct = out.distinct
    java.util.Arrays.sort(distinct)
    distinct
  }

  /** word-n-gram shingle hash set as a Column. */
  def shingleHashesUdf(n: Int, seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) =>
      if (text == null) Array.empty[Long] else wordNgramHashSet(text, n, seed))

  def charShingleHashesUdf(n: Int, seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) =>
      if (text == null) Array.empty[Long] else shingleHashSet(charNgrams(text, n), seed))

  // ------------------------------------------------------------- signatures

  /** MinHash signature: all k lanes in one pass (op #2 of SURVEY §2.a). */
  def minhashSigUdf(k: Int, seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val hasher = MinHasher(k, seed)
    udf((shingles: Array[Long]) => if (shingles == null) null else hasher(shingles))
  }

  /** LSH band hashes: signature (length b·r) → b band keys, each a seeded
    * 64-bit combine of its r rows. OR-amplification across bands, AND within
    * (collision_probability^r per band, /root/reference/src/LSHBase.jl:130-160). */
  def bandHashes(sig: Array[Long], bands: Int, rows: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Rng.derive(seed, 0x42414E44L /* "BAND" */ + b.toLong)
      var r = 0
      while (r < rows) { h = Rng.hash2(h, sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  def bandHashesUdf(bands: Int, rows: Int, seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sig: Array[Long]) => if (sig == null) null else bandHashes(sig, bands, rows, seed))

  /** Exact Jaccard on two sorted-distinct shingle-hash arrays — the
    * verify-stage ground truth (J(∅,∅)=0, similarities.jl:230-238). */
  val jaccardSortedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Long], b: Array[Long]) =>
      if (a == null || b == null) 0.0 else Similarities.jaccardSorted(a, b))

  // ---------------------------------------------------------------- simhash

  /** Classic 64-bit text SimHash: tf-weighted sign of random projections where
    * the projection for token t is the ±1 pattern of hash64(t) — the standard
    * Charikar construction; semantically the reference's SimHash (sign of
    * random projections, simhash.jl:131-140) on a hashed bag-of-words. */
  def simhash64(tokens: Array[String], seed: Long): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = Rng.hashString(seed, tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash64Udf(seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => if (text == null) 0L else simhash64(text.split(" ", -1), seed))

  val hamming64Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))

  // ------------------------------------------------- embedding similarity

  /** Exact int64 dot product of quantized embeddings via built-ins only:
    * order-independent (integer adds), hence bit-reproducible across engines
    * and cluster sizes — floats summed in shuffle order are not. */
  def quantize(col: Column, q: Int = 1000): Column =
    transform(col, e => round(e.cast("double") * q).cast("long"))

  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Deterministic cosine on quantized vectors (exact ints → one sqrt/div). */
  def cosineQuantized(a: Column, b: Column): Column =
    dotLong(a, b).cast("double") /
      (sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")))

  /** Plain double cosine (fast path, not oracle-reproducible bitwise). */
  val cosineDoubleUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Double], b: Array[Double]) => Similarities.cossim(a, b))
}
