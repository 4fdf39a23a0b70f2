package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.GramKernel
import graft.SparkEntry

/** Word-gram kernels (graft_word_ngrams / graft_word_blocks /
  * graft_rep_stats) + the paragraph-dedup production entry: kernel contracts,
  * the fused repetition expression pinned against its relational twin, and
  * the UTF-8 tie-break rule. */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u8(s: String): UTF8String = UTF8String.fromString(s)
  private def strArr(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  // ------------------------------------------------------------- kernels

  test("wordNgrams: sliding full grams, split keeps empty tokens") {
    assert(strArr(GramKernel.wordNgrams(u8("a b c d"), 2)) == Seq("a b", "b c", "c d"))
    assert(strArr(GramKernel.wordNgrams(u8("a b c d"), 3)) == Seq("a b c", "b c d"))
    assert(strArr(GramKernel.wordNgrams(u8("solo"), 2)) == Seq.empty)
    // "a  b" splits to ["a", "", "b"] on both engines — empties are tokens
    assert(strArr(GramKernel.wordNgrams(u8("a  b"), 2)) == Seq("a ", " b"))
    assert(strArr(GramKernel.wordNgrams(null, 2)) == Seq.empty)
    // "" splits to [""] → one token → no 2-grams
    assert(strArr(GramKernel.wordNgrams(u8(""), 2)) == Seq.empty)
  }

  test("wordBlocks: disjoint blocks, final partial block included") {
    assert(strArr(GramKernel.wordBlocks(u8("a b c d e"), 2)) == Seq("a b", "c d", "e"))
    assert(strArr(GramKernel.wordBlocks(u8("a b c d"), 2)) == Seq("a b", "c d"))
    assert(strArr(GramKernel.wordBlocks(u8("a"), 10)) == Seq("a"))
    assert(strArr(GramKernel.wordBlocks(u8(""), 10)) == Seq("")) // one empty token
    assert(strArr(GramKernel.wordBlocks(null, 10)) == Seq.empty)
  }

  test("repStats: hand-computed doc") {
    // grams: "x y","y x","x y","y x","x z" → counts {x y:2, y x:2, x z:1}
    // tie at 2 → smallest gram "x y"; masses: all = 2·3+2·3+1·3 = 15, dup = 12
    // blocks(2): "x y","x y","x z" → nb 3, ndb 2
    val r = GramKernel.repStats(u8("x y x y x z"), 2, 2)
    assert(r.getUTF8String(0).toString == "x y")
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 15L)
    assert(r.getLong(3) == 12L)
    assert(r.getLong(4) == 3L)
    assert(r.getLong(5) == 2L)
  }

  test("repStats: no grams / null text") {
    val solo = GramKernel.repStats(u8("solo"), 2, 10)
    assert(solo.isNullAt(0) && solo.isNullAt(1))
    assert(solo.getLong(2) == 0L && solo.getLong(3) == 0L)
    assert(solo.getLong(4) == 1L && solo.getLong(5) == 1L)
    val nul = GramKernel.repStats(null, 2, 10)
    assert(nul.isNullAt(0) && nul.getLong(4) == 0L && nul.getLong(5) == 0L)
  }

  test("repStats tie-break is UTF-8 byte order, not UTF-16 code-unit order") {
    // grams "<U+10400> <U+FFFD>" vs "<U+FFFD> <U+10400>", both count 1:
    // UTF-16 code-unit order puts the surrogate pair (0xD801…) BELOW
    // 0xFFFD, picking the supplementary-first gram; UTF-8 byte order — and
    // DuckDB — sort U+FFFD (ef bf bd) below U+10400 (f0 90 90 80)
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    val text = s"$supp $bmp $supp"
    val r = GramKernel.repStats(u8(text), 2, 10)
    val grams = strArr(GramKernel.wordNgrams(u8(text), 2))
    assert(grams.size == 2 && grams.distinct.size == 2) // both count 1 → tie
    val expect = grams.sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0).head
    assert(r.getUTF8String(0).toString == expect)
    assert(expect == s"$bmp $supp")
    // and the UTF-16 String ordering would have picked the OTHER gram
    assert(grams.min != expect, "test vector no longer exercises the fork")
  }

  test("repStats mass counts code points, not UTF-16 units") {
    // one gram "𐐀 𐐀" (2 supplementary cps + space = 3 code points, 5 UTF-16 units)
    val supp = new String(Character.toChars(0x10400))
    val r = GramKernel.repStats(u8(s"$supp $supp"), 2, 10)
    assert(r.getLong(2) == 3L, "mass_all must be code-point length")
  }

  // --------------------------------------- fused kernel vs relational twin

  test("graft_rep_stats equals the relational explode→groupBy→argmax twin") {
    graft.functions.GraftExpressions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    try {
      val fused = docs
        .select(col("doc_id"),
          call_function("graft_rep_stats", col("text"), lit(2), lit(10)).as("r"))
        .select(col("doc_id"), col("r.top_gram"), col("r.top_count"),
          col("r.mass_all"), col("r.mass_dup"), col("r.nb"), col("r.ndb"))
      val g = docs.select(col("doc_id"),
        explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("g"))
      val cnt = g.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      // argmax (c desc, gram asc) = min(struct(-c, g)) — Spark struct
      // ordering over UTF8String is binary/UTF-8, the kernel's rule
      val top = cnt.groupBy("doc_id").agg(
        min(struct((-col("c")).as("nc"), col("g").as("tg"))).as("t"),
        sum(col("c") * length(col("g")).cast("long")).as("mass_all"),
        sum(when(col("c") >= 2, col("c") * length(col("g")).cast("long"))
          .otherwise(0L)).as("mass_dup"))
      val blocks = call_function("graft_word_blocks", col("text"), lit(10))
      val twin = docs
        .select(col("doc_id"), size(blocks).cast("long").as("nb"),
          size(array_distinct(blocks)).cast("long").as("ndb"))
        .join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("t.tg").as("top_gram"),
          (-col("t.nc")).as("top_count"), col("mass_all"), col("mass_dup"),
          col("nb"), col("ndb"))
      val f = fused.orderBy("doc_id").collect()
      val t = twin.orderBy("doc_id").collect()
      assert(f.length == t.length && f.length == 500)
      f.zip(t).foreach { case (a, b) => assert(a == b, s"fused $a != twin $b") }
    } finally docs.unpersist()
  }

  // --------------------------------------------------- paragraph dedup op

  test("paragraphDedup marks every copy of a duplicated paragraph") {
    graft.functions.GraftExpressions.register(spark)
    val d = Seq(
      (1L, "a b c d x1 x2"), // blocks(2): "a b","c d","x1 x2"
      (2L, "a b e f"),       // "a b","e f"
      (3L, "c d c d")        // "c d","c d" — within-doc dup counts too
    ).toDF("doc_id", "text")
    val out = SparkEntry.paragraphDedup(d,
      call_function("graft_word_blocks", col("text"), lit(2)))
      .orderBy("doc_id", "para_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, true), (1L, 1L, 3L, true), (1L, 2L, 1L, false),
      (2L, 0L, 2L, true), (2L, 1L, 1L, false),
      (3L, 0L, 3L, true), (3L, 1L, 3L, true)))
  }

  test("scrubDupParagraphs: keep-first-occurrence, exact reconstruction, all-dropped → ''") {
    graft.functions.GraftExpressions.register(spark)
    val d = Seq(
      (1L, "a b c d x1 x2"), // blocks(2): "a b","c d","x1 x2" — all first
      (2L, "a b e f"),       // "a b" dup of doc 1 → removed; "e f" kept
      (3L, "c d c d"),       // both blocks dup doc 1's "c d" → all removed
      (4L, "q r s t")        // untouched doc reconstructs byte-identically
    ).toDF("doc_id", "text")
    val out = SparkEntry.scrubDupParagraphs(d,
      call_function("graft_word_blocks", col("text"), lit(2)))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, "a b c d x1 x2"),
      (2L, 2L, 1L, "e f"),
      (3L, 2L, 2L, ""),
      (4L, 2L, 0L, "q r s t")))
  }

  test("scrubDupParagraphs removes within-doc repeats after the first") {
    graft.functions.GraftExpressions.register(spark)
    val d = Seq((1L, "a b a b c d")).toDF("doc_id", "text")
    val out = SparkEntry.scrubDupParagraphs(d,
      call_function("graft_word_blocks", col("text"), lit(2))).collect()
    assert(out.head.getString(3) == "a b c d")
    assert(out.head.getLong(2) == 1L)
  }

  test("paragraphDedup plan: census join stays shuffle-hash (no broadcast flip)") {
    graft.functions.GraftExpressions.register(spark)
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = SparkEntry.paragraphDedup(d,
      call_function("graft_word_blocks", col("text"), lit(2)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("broadcast"), s"census side must not broadcast:\n$plan")
  }
}
