package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import graft.core.Rng

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every character k-gram of the text, slide a
  * window of w consecutive gram hashes, keep each window's minimum. The
  * selected set is position-independent and satisfies the winnowing
  * guarantee: any substring shared by two documents of length ≥ w + k − 1
  * contributes at least one IDENTICAL fingerprint to both — the local
  * document-fingerprinting primitive the LLM-data-pipeline op list calls
  * "document fingerprinting (rolling hash)", and a third near-dup candidate
  * family next to MinHash banding and SimHash chunking.
  *
  * Two gram-hash kernels share the window-min selection:
  *  - [[WinnowKernel.md5Winnow]]: gram hash = first 15 md5 hex digits — the
  *    cross-engine gate form (DuckDB recomputes it as
  *    `CAST('0x'||substring(md5(substring(text,i,k)),1,15) AS BIGINT)` +
  *    a `min() OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)` window);
  *  - [[WinnowKernel.rollingWinnow]]: gram hash = seeded Rabin–Karp
  *    polynomial rolling hash mod 2^61−1 — O(1) per position instead of
  *    O(k) (md5 digests the whole gram at every position), the production
  *    kernel for 100 TB corpora. The two kernels share [[winnowSelect]]
  *    but are different hash FAMILIES: each window's argmin depends on the
  *    hash values, so the selected positions — and borderline pair
  *    overlaps — differ across families (QueriesSpec measures 3-5
  *    knife-edge pairs flipping at the 0.2 gate at sf0.001). Both satisfy
  *    the winnowing guarantee and density bounds (WinnowSpec).
  *
  * Contract (both kernels, mirrored by the UDF-era shingle expressions):
  * null text → EMPTY set; fewer than k code points → empty set; fewer grams
  * than w → ONE fingerprint (min over all grams). Output is the sorted
  * distinct fingerprint set (set semantics — winnowing density ≈ 2/(w+1)
  * of gram count before dedup).
  *
  * Grams are CODE-POINT k-grams (DuckDB `substring` counts code points, and
  * so does Spark's — the SyntheticMedia width precedent).
  */
object WinnowKernel {

  private val Empty = new GenericArrayData(Array.empty[Long])

  /** Mersenne prime 2^61 − 1 — the rolling-hash modulus. */
  final val M61 = (1L << 61) - 1

  /** (a * b) mod (2^61 − 1) for 0 ≤ a, b < 2^61, branch-light 128-bit
    * reduction: 2^64 ≡ 8 (mod M61), so hi·2^64 + lo ≡ hi·8 + lo. Pinned
    * against BigInt arithmetic in WinnowSpec. */
  def mulmod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // hi ≤ 2^58, hi·8 + both lo pieces < 2^62 + 2^61 + 2^61 — fold twice
    var r = (hi << 3) + (lo >>> 61) + (lo & M61)
    if (r >= M61) r -= M61
    if (r >= M61) r -= M61
    r
  }

  /** Seed → rolling-hash base in [256, M61): a seeded FAMILY of fingerprint
    * functions, like every other hash family in this engine. */
  def baseFor(seed: Long): Long =
    java.lang.Long.remainderUnsigned(Rng.derive(seed, 0x57494E4EL), M61 - 256L) + 256L

  /** Code-point start offsets (UTF-16 indices); result has cp+1 entries,
    * the last being s.length, so gram i is s.substring(off(i), off(i+k)). */
  private def cpOffsets(s: String): Array[Int] = {
    val offs = new Array[Int](s.codePointCount(0, s.length) + 1)
    var cp = 0
    var i = 0
    while (i < s.length) {
      offs(cp) = i
      i += Character.charCount(s.codePointAt(i))
      cp += 1
    }
    offs(cp) = s.length
    offs
  }

  /** Sliding-window minima over exactly max(1, g−w+1) windows (window j
    * covers grams j..min(j+w−1, g−1)), deduped and sorted ascending.
    * Monotonic-deque: O(g) comparisons total, no per-window rescan. */
  def winnowSelect(h: Array[Long], w: Int): ArrayData = {
    // WinnowExpr checks k/w at analysis time; direct kernel callers need
    // the same guard — w=0 under-evicts the deque into an out-of-bounds
    // read or a phantom 0L fingerprint
    require(w >= 1, s"winnow window must be ≥ 1, got $w")
    val g = h.length
    if (g == 0) return Empty
    val nWin = math.max(1, g - w + 1)
    val out = new Array[Long](nWin)
    val deque = new Array[Int](g) // indices of candidate minima, increasing h
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    var j = 0
    while (i < g) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (head < tail && deque(head) <= i - w) head += 1
      if (i >= w - 1 || i == g - 1) { // full window, or the single short one
        if (j < nWin) { out(j) = h(deque(head)); j += 1 }
      }
      i += 1
    }
    java.util.Arrays.sort(out)
    var n = 0
    var k = 0
    while (k < out.length) {
      if (k == 0 || out(k) != out(k - 1)) { out(n) = out(k); n += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** Gate form: md5 gram hashes (cross-engine, see class doc). */
  def md5Winnow(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1, s"gram length must be ≥ 1, got $k")
    if (text == null) return Empty
    val s = text.toString
    val offs = cpOffsets(s)
    val g = offs.length - 1 - k + 1
    if (g <= 0) return Empty
    val h = new Array[Long](g)
    var i = 0
    while (i < g) {
      h(i) = CrossEngine.md5long15(s.substring(offs(i), offs(i + k)).getBytes("UTF-8"))
      i += 1
    }
    winnowSelect(h, w)
  }

  /** Production form: seeded Rabin–Karp rolling gram hashes mod 2^61−1 over
    * code points — one mulmod + one add per position after the first gram. */
  def rollingWinnow(
      text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int, seed: Long): ArrayData = {
    require(k >= 1, s"gram length must be ≥ 1, got $k")
    if (text == null) return Empty
    val s = text.toString
    val offs = cpOffsets(s)
    val cp = offs.length - 1
    val g = cp - k + 1
    if (g <= 0) return Empty
    val b = baseFor(seed)
    // bk = b^(k-1) mod M61 — the leading-coefficient weight dropped per slide
    var bk = 1L
    var t = 0
    while (t < k - 1) { bk = mulmod61(bk, b); t += 1 }
    val h = new Array[Long](g)
    var acc = 0L
    var i = 0
    while (i < k) { acc = (mulmod61(acc, b) + s.codePointAt(offs(i))) % M61; i += 1 }
    h(0) = acc
    i = 1
    while (i < g) {
      val drop = mulmod61(s.codePointAt(offs(i - 1)).toLong, bk)
      acc = (acc - drop + M61) % M61
      acc = (mulmod61(acc, b) + s.codePointAt(offs(i + k - 1))) % M61
      h(i) = acc
      i += 1
    }
    winnowSelect(h, w)
  }
}

/** graft_winnow_md5(text, k, w) / graft_winnow(text, k, w, seed): winnowing
  * fingerprint set as a native codegen expression. NOT null-propagating:
  * null text → empty set (the engine-wide shingle contract — a null-text doc
  * must produce a row with no fingerprints, not a null that poisons
  * downstream columns). */
case class WinnowExpr(child: Expression, k: Int, w: Int, seed: Long, md5Mode: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 => TypeCheckResult.TypeCheckFailure(s"k must be ≥ 1, got $k")
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(s"w must be ≥ 1, got $w")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    if (md5Mode) WinnowKernel.md5Winnow(t, k, w)
    else WinnowKernel.rollingWinnow(t, k, w, seed)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // exact-arity static calls (a default-arg method has no short-arity
    // overload in bytecode — the graft_lcs_len silent-de-codegen lesson)
    val call =
      if (md5Mode) s"graft.functions.WinnowKernel.md5Winnow(${c.isNull} ? null : ${c.value}, $k, $w)"
      else s"graft.functions.WinnowKernel.rollingWinnow(${c.isNull} ? null : ${c.value}, $k, $w, ${seed}L)"
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
  override def prettyName: String = if (md5Mode) "graft_winnow_md5" else "graft_winnow"
}
