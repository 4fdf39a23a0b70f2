package graft.core

/** Similarity / distance kernels with the reference's exact conventions.
  *
  * Semantics preserved from /root/reference/src/similarities.jl:
  *  - jaccard on sets: |A∩B|/|A∪B| with J(∅,∅)=0 (similarities.jl:230-238)
  *  - jaccard on bit vectors: popcount(and)/popcount(or), 0 on empty union
  *    (similarities.jl:260-270)
  *  - weighted jaccard on real vectors: Σmin/Σmax, errors on negative
  *    elements or length mismatch (similarities.jl:292-323)
  *  - weighted jaccard on sets with a weight map, errors on negative weight
  *    (similarities.jl:350-372)
  *  - cossim errors on zero vectors (similarities.jl:47-56)
  *  - ℓp distances require p > 0 and equal lengths (similarities.jl:99-157)
  */
object Similarities {

  def jaccard[T](a: Set[T], b: Set[T]): Double = {
    val union = a.union(b).size
    if (union == 0) 0.0 // J(∅,∅) = 0 by convention
    else a.intersect(b).size.toDouble / union.toDouble
  }

  /** Single-pass merge on sorted-distinct arrays — the verify-stage kernel.
    * Arrays MUST be sorted ascending with no duplicates. */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** Hamming distance on packed bit vectors — the ONE shared kernel
    * (SimHasher.hamming and SignAlsh.hamming delegate here; their former
    * verbatim copies iterated a.length unguarded, silently returning a
    * too-small distance when b was the longer signature and throwing on
    * executors when it was shorter — round-6 review). */
  def hammingBits(a: Array[Long], b: Array[Long]): Int = {
    require(a.length == b.length,
      s"signature length mismatch: ${a.length} vs ${b.length} words — " +
        "hamming is only defined between signatures of the same family")
    var i = 0; var h = 0
    while (i < a.length) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** Jaccard on packed bit vectors (Long words). */
  def jaccardBits(x: Array[Long], y: Array[Long]): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    var i = 0; var inter = 0L; var union = 0L
    while (i < x.length) {
      inter += java.lang.Long.bitCount(x(i) & y(i))
      union += java.lang.Long.bitCount(x(i) | y(i))
      i += 1
    }
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  /** Weighted jaccard on real vectors: Σᵢmin(xᵢ,yᵢ)/Σᵢmax(xᵢ,yᵢ). */
  def jaccardWeighted(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    var i = 0; var num = 0.0; var den = 0.0
    while (i < x.length) {
      val a = x(i); val b = y(i)
      require(a >= 0 && b >= 0, "jaccard requires non-negative elements")
      num += math.min(a, b); den += math.max(a, b)
      i += 1
    }
    if (den == 0.0) 0.0 else num / den
  }

  /** Weighted jaccard on sets: Σ_{A∩B} w / Σ_{A∪B} w. */
  def jaccardWeighted[T](a: Set[T], b: Set[T], w: Map[T, Double]): Double = {
    def wt(t: T): Double = {
      val v = w.getOrElse(t, 0.0)
      require(v >= 0, s"negative weight for $t")
      v
    }
    val den = a.union(b).iterator.map(wt).sum
    if (den == 0.0) 0.0 else a.intersect(b).iterator.map(wt).sum / den
  }

  def innerProd(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    var i = 0; var s = 0.0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  def l2Norm(x: Array[Double]): Double = math.sqrt(innerProd(x, x))

  def lpNorm(x: Array[Double], p: Double): Double = {
    require(p > 0, s"p must be positive, got $p")
    var i = 0; var s = 0.0
    while (i < x.length) { s += math.pow(math.abs(x(i)), p); i += 1 }
    math.pow(s, 1.0 / p)
  }

  /** Cosine similarity; errors on zero vectors like the reference. */
  def cossim(x: Array[Double], y: Array[Double]): Double = {
    val nx = l2Norm(x); val ny = l2Norm(y)
    require(nx > 0, "cossim undefined for zero vector x")
    require(ny > 0, "cossim undefined for zero vector y")
    innerProd(x, y) / (nx * ny)
  }

  def lpDist(x: Array[Double], y: Array[Double], p: Double): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    require(p > 0, s"p must be positive, got $p")
    var i = 0; var s = 0.0
    while (i < x.length) { s += math.pow(math.abs(x(i) - y(i)), p); i += 1 }
    math.pow(s, 1.0 / p)
  }

  def l1Dist(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    var i = 0; var s = 0.0
    while (i < x.length) { s += math.abs(x(i) - y(i)); i += 1 }
    s
  }

  def l2Dist(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length, s"length mismatch: ${x.length} vs ${y.length}")
    var i = 0; var s = 0.0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  // ---------------------------------------------------------------- sparse

  /** Sparse vector: strictly increasing `indices` into a logical vector of
    * length `size`, with the matching non-zero `values` — the reference's
    * SparseVector fast paths (/root/reference/src/utils/vecops.jl:15-29:
    * col_norms touches only nzval) generalized to the similarity kernels.
    * Every operation below is O(nnz), never O(size) — the point of sparse
    * TF-IDF-style features where size ≫ nnz. */
  final case class SparseVec(indices: Array[Int], values: Array[Double], size: Int) {
    require(indices.length == values.length, "indices/values length mismatch")
    locally {
      var i = 1
      while (i < indices.length) {
        require(indices(i - 1) < indices(i), "indices must be strictly increasing")
        i += 1
      }
    }
    require(indices.isEmpty || (indices(0) >= 0 && indices(indices.length - 1) < size),
      "index out of range")
    def nnz: Int = indices.length
    def toDense: Array[Double] = {
      val d = new Array[Double](size)
      var i = 0
      while (i < indices.length) { d(indices(i)) = values(i); i += 1 }
      d
    }
  }

  /** ‖x‖₂ over stored entries only (vecops.jl:15-16). */
  def l2Norm(x: SparseVec): Double = {
    var s = 0.0; var i = 0
    while (i < x.values.length) { s += x.values(i) * x.values(i); i += 1 }
    math.sqrt(s)
  }

  /** ⟨x,y⟩ by two-pointer merge over the sorted index lists — O(nnz_x+nnz_y). */
  def innerProd(x: SparseVec, y: SparseVec): Double = {
    require(x.size == y.size, s"length mismatch: ${x.size} vs ${y.size}")
    var i = 0; var j = 0; var s = 0.0
    while (i < x.indices.length && j < y.indices.length) {
      val xi = x.indices(i); val yj = y.indices(j)
      if (xi == yj) { s += x.values(i) * y.values(j); i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    s
  }

  def cossim(x: SparseVec, y: SparseVec): Double = {
    val nx = l2Norm(x); val ny = l2Norm(y)
    require(nx > 0, "cossim undefined for zero vector x")
    require(ny > 0, "cossim undefined for zero vector y")
    innerProd(x, y) / (nx * ny)
  }

  /** ‖x−y‖₂ without densifying (merge; unmatched entries contribute v²). */
  def l2Dist(x: SparseVec, y: SparseVec): Double = {
    require(x.size == y.size, s"length mismatch: ${x.size} vs ${y.size}")
    var i = 0; var j = 0; var s = 0.0
    while (i < x.indices.length || j < y.indices.length) {
      if (j >= y.indices.length || (i < x.indices.length && x.indices(i) < y.indices(j))) {
        s += x.values(i) * x.values(i); i += 1
      } else if (i >= x.indices.length || y.indices(j) < x.indices(i)) {
        s += y.values(j) * y.values(j); j += 1
      } else {
        val d = x.values(i) - y.values(j); s += d * d; i += 1; j += 1
      }
    }
    math.sqrt(s)
  }

  /** Adaptive-free composite Simpson quadrature — test-oracle only, mirrors
    * the reference's QuadGK use for function-space integrals and the LpHash
    * collision-probability integral (/root/reference/src/hashes/lphash.jl:184-203). */
  def simpson(f: Double => Double, a: Double, b: Double, n: Int = 2048): Double = {
    require(n % 2 == 0)
    val h = (b - a) / n
    var s = f(a) + f(b)
    var i = 1
    while (i < n) {
      s += f(a + i * h) * (if (i % 2 == 1) 4.0 else 2.0)
      i += 1
    }
    s * h / 3.0
  }

  /** Function-space inner product ⟨f,g⟩ = ∫ f·g over the interval. */
  def innerProd(f: Double => Double, g: Double => Double, iv: Interval): Double =
    simpson(x => f(x) * g(x), iv.lo, iv.hi)

  /** Function-space cosine similarity (similarities.jl:58-67). */
  def cossim(f: Double => Double, g: Double => Double, iv: Interval): Double = {
    val nf = math.sqrt(innerProd(f, f, iv))
    val ng = math.sqrt(innerProd(g, g, iv))
    require(nf > 0 && ng > 0, "cossim undefined for zero function")
    innerProd(f, g, iv) / (nf * ng)
  }

  /** Function-space Lp distance (∫|f−g|^p)^{1/p} (similarities.jl:194-201). */
  def lpDist(f: Double => Double, g: Double => Double, iv: Interval, p: Double): Double = {
    require(p > 0, s"p must be positive, got $p")
    math.pow(simpson(x => math.pow(math.abs(f(x) - g(x)), p), iv.lo, iv.hi), 1.0 / p)
  }
}
