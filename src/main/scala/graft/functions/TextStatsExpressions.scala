package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-gram text kernels backing the sub-document dedup and repetition
  * (Gopher-style) quality queries.
  *
  * Tokenization is the engine-wide split-on-single-space contract
  * (`split(text, ' ', -1)` ≡ DuckDB `string_split(text, ' ')` — empty tokens
  * kept), so every gram/block these kernels emit is reproducible in the SQL
  * oracle from the same `ws` list.
  *
  * Null-text contract (the engine-wide shingle contract): null text → EMPTY
  * output — a null-text doc yields no gram/paragraph rows, never a null that
  * poisons downstream columns. Note the asymmetry with EMPTY text: `""`
  * splits to one empty token (both engines), so it has one (empty) block and
  * no 2-grams.
  */
object GramKernel {

  private val EmptyArr = new GenericArrayData(Array.empty[Any])

  private def tokens(text: UTF8String): Array[String] =
    // java split(" ", -1) == Spark split(text,' ',-1) == DuckDB string_split
    text.toString.split(" ", -1)

  /** Sliding FULL word n-grams joined with ' ' (len−n+1 grams; <n tokens →
    * empty). The string-valued twin of graft_shingle_hashes — q_repetition
    * needs the gram text itself (char mass + lexicographic tie-break). */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    require(n >= 1, s"gram size must be ≥ 1, got $n")
    if (text == null) return EmptyArr
    val ws = tokens(text)
    val g = ws.length - n + 1
    if (g <= 0) return EmptyArr
    val out = new Array[Any](g)
    var i = 0
    while (i < g) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISJOINT word blocks of `block` tokens, final partial block INCLUDED —
    * the deterministic "paragraph" rule for corpora whose text carries no
    * newline structure (the driver's documents table). ⌈len/block⌉ blocks;
    * block i = tokens [i·block, min((i+1)·block, len)) joined with ' '.
    * Production paragraph rules (split on '\n\n') plug into
    * [[graft.SparkEntry.paragraphDedup]] as any array column instead. */
  def wordBlocks(text: UTF8String, block: Int): ArrayData = {
    require(block >= 1, s"block size must be ≥ 1, got $block")
    if (text == null) return EmptyArr
    val ws = tokens(text)
    val nb = (ws.length + block - 1) / block
    val out = new Array[Any](nb)
    var i = 0
    while (i < nb) {
      val from = i * block
      val to = math.min(from + block, ws.length)
      val sb = new java.lang.StringBuilder(ws(from))
      var j = from + 1
      while (j < to) { sb.append(' ').append(ws(j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass per-document repetition statistics (the Gopher repetition
    * filters' raw integers) over word n-grams + word blocks:
    *
    *  - top_gram / top_count: the most frequent n-gram, ties broken to the
    *    LEXICOGRAPHICALLY SMALLEST gram in UTF-8 byte order (≡ Spark
    *    `min(struct(-c, g))` ≡ DuckDB `ORDER BY c DESC, g ASC` — DuckDB
    *    compares strings by UTF-8 bytes, so the tie-break must NOT use
    *    java.lang.String.compareTo, whose UTF-16 code-unit order forks on
    *    supplementary characters);
    *  - mass_all / mass_dup: Σ count·cpLen(gram) over all grams / over grams
    *    with count ≥ 2 (character mass — Spark length() and DuckDB length()
    *    both count code points);
    *  - nb / ndb: total and distinct [[wordBlocks]] counts (the
    *    duplicate-line-fraction numerator at block granularity).
    *
    * All integers — the query layer does the single final divisions. A doc
    * with no n-grams (< n tokens, incl. null text) gets NULL top fields and
    * zero masses; null text additionally gets nb = 0 (no blocks).
    *
    * WHY a fused expression: every field is a per-row reduction, so the
    * natural relational form (explode grams → groupBy(doc_id, gram) →
    * argmax) shuffles the entire token stream of the corpus — at 100 TB
    * that's the full-wordcount exchange for a query that needs NO cross-doc
    * information. This kernel keeps q_repetition a narrow map with zero
    * exchanges; TextStatsSpec pins it against the relational twin. */
  def repStats(text: UTF8String, n: Int, block: Int): InternalRow = {
    require(n >= 1, s"gram size must be ≥ 1, got $n")
    require(block >= 1, s"block size must be ≥ 1, got $block")
    val vals = new Array[Any](6)
    vals(2) = 0L // mass_all
    vals(3) = 0L // mass_dup
    if (text == null) {
      vals(4) = 0L // nb
      vals(5) = 0L // ndb
      return new GenericInternalRow(vals)
    }
    val ws = tokens(text)
    // blocks: count + distinct-count in one pass, same join-string semantics
    // as wordBlocks (TextStatsSpec pins the equivalence)
    val nb = (ws.length + block - 1) / block
    val seen = new java.util.HashSet[String](nb * 2)
    var i = 0
    while (i < nb) {
      val from = i * block
      val to = math.min(from + block, ws.length)
      val sb = new java.lang.StringBuilder(ws(from))
      var j = from + 1
      while (j < to) { sb.append(' ').append(ws(j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    vals(4) = nb.toLong
    vals(5) = seen.size.toLong
    val g = ws.length - n + 1
    if (g > 0) {
      val counts = new java.util.HashMap[String, Long](g * 2)
      i = 0
      while (i < g) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      var topGram: String = null
      var topBytes: Array[Byte] = null
      var topCount = 0L
      var massAll = 0L
      var massDup = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val gram = e.getKey
        val c = e.getValue
        val m = c * gram.codePointCount(0, gram.length)
        massAll += m
        if (c >= 2) massDup += m
        if (c > topCount) { topGram = gram; topBytes = null; topCount = c }
        else if (c == topCount) {
          // tie: smaller gram in UTF-8 byte order (see scaladoc)
          if (topBytes == null) topBytes = topGram.getBytes("UTF-8")
          val gb = gram.getBytes("UTF-8")
          if (java.util.Arrays.compareUnsigned(gb, topBytes) < 0) {
            topGram = gram; topBytes = gb
          }
        }
      }
      vals(0) = UTF8String.fromString(topGram)
      vals(1) = topCount
      vals(2) = massAll
      vals(3) = massDup
    }
    new GenericInternalRow(vals)
  }

  val repStatsType: StructType = StructType(Seq(
    StructField("top_gram", StringType, nullable = true),
    StructField("top_count", LongType, nullable = true),
    StructField("mass_all", LongType, nullable = false),
    StructField("mass_dup", LongType, nullable = false),
    StructField("nb", LongType, nullable = false),
    StructField("ndb", LongType, nullable = false)))
}

/** graft_word_ngrams(text, n) / graft_word_blocks(text, block): string-array
  * word grams — see [[GramKernel]]. Null text → empty array. */
case class WordGramsExpr(child: Expression, n: Int, blockMode: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(s"size must be ≥ 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (blockMode) GramKernel.wordBlocks(t, n) else GramKernel.wordNgrams(t, n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // exact-arity static calls (the graft_lcs_len silent-de-codegen lesson)
    val fn = if (blockMode) "wordBlocks" else "wordNgrams"
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.GramKernel.$fn(${c.isNull} ? null : ${c.value}, $n);
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
  override def prettyName: String = if (blockMode) "graft_word_blocks" else "graft_word_ngrams"
}

/** graft_rep_stats(text, n, block): fused per-row repetition statistics —
  * see [[GramKernel.repStats]]. Never null (null text → zeroed row with null
  * top fields). */
case class RepStatsExpr(child: Expression, n: Int, block: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(s"gram size must be ≥ 1, got $n")
    case _ if block < 1 => TypeCheckResult.TypeCheckFailure(s"block size must be ≥ 1, got $block")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = GramKernel.repStatsType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    GramKernel.repStats(t, n, block)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.GramKernel.repStats(${c.isNull} ? null : ${c.value}, $n, $block);
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_rep_stats"
}
