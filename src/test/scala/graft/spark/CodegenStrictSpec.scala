package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CrossEngine, MinHashKernel, PlaneKernel}

/** EVERY graft_* expression must actually compile under whole-stage codegen.
  *
  * Round 2 shipped graft_simhash56 emitting a call to a NESTED Scala object
  * (`CrossEngine.SimHash56.fingerprint`) — nested objects get no static
  * forwarder, Janino rejected the generated class, and Spark logged an ERROR
  * then silently fell back to interpreted evaluation for every stage
  * containing the expression (VERDICT r2, What's wrong #2). With
  * `spark.sql.codegen.fallback=false` that failure is a thrown exception —
  * this suite evaluates each expression under that setting AND checks the
  * codegen value against the kernel's direct (interpreted) result, so a
  * silent fallback or an eval/codegen divergence can never ship again.
  */
class CodegenStrictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Run `body` with codegen failures fatal (no interpreted fallback, and
    * expression-level factories forced to CODEGEN_ONLY).
    *
    * ConvertToLocalRelation is EXCLUDED for the duration: that optimizer
    * rule evaluates Project-over-`Seq(...).toDF` with an explicitly
    * INTERPRETED projection, so a `Seq(...).toDF.select(expr).collect()`
    * test can pass without ever compiling the expression — exactly how the
    * round-5 graft_lcs_len Janino failure (Scala default-arg method has no
    * 2-arg overload for generated Java) slipped past this suite while
    * de-codegening whole production stages. With the rule off, these plans
    * hit WholeStageCodegen for real and fallback=false makes failure loud. */
  private def strictCodegen[T](body: => T): T = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevExcluded = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
      prevExcluded match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
    }
  }

  private val rnd = new scala.util.Random(11)
  private val vecA = Array.fill(64)(rnd.nextInt(2001).toLong - 1000)
  private val vecB = Array.fill(64)(rnd.nextInt(2001).toLong - 1000)
  private val shingles = Array.fill(40)(rnd.nextLong())
  private val grams = Array("tok1 tok2 tok3", "a b c", "ünïcode gram", "x:y")
  private val text = (1 to 30).map(i => s"w${i % 11}").mkString(" ")

  private def arr(a: Array[Long]) = new GenericArrayData(a)

  test("graft_minhash_sig compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(shingles).toDF("sh")
        .select(call_function("graft_minhash_sig", col("sh"), lit(16), lit(42L)))
        .collect().head.getSeq[Long](0)
    }
    assert(got == MinHashKernel.signature(arr(shingles), 16, 42L).toLongArray().toSeq)
  }

  test("graft_band_hashes compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val sig = MinHashKernel.signature(arr(shingles), 12, 42L).toLongArray()
    val got = strictCodegen {
      Seq(sig).toDF("sig")
        .select(call_function("graft_band_hashes", col("sig"), lit(4), lit(3), lit(42L)))
        .collect().head.getSeq[Long](0)
    }
    assert(got == MinHashKernel.bands(arr(sig), 4, 3, 42L).toLongArray().toSeq)
  }

  test("graft_plane_bits compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(vecA).toDF("v")
        .select(call_function("graft_plane_bits", col("v"), lit("ann"), lit(24)))
        .collect().head.getLong(0)
    }
    assert(got == PlaneKernel.bits(arr(vecA), "ann", 24))
  }

  test("graft_plane_dots compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(vecA).toDF("v")
        .select(call_function("graft_plane_dots", col("v"), lit("mips"), lit(16)))
        .collect().head.getSeq[Long](0)
    }
    assert(got == PlaneKernel.dots(arr(vecA), "mips", 16).toLongArray().toSeq)
  }

  test("graft_cosq compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq((vecA, vecB)).toDF("a", "b")
        .select(call_function("graft_cosq", col("a"), col("b")))
        .collect().head.getDouble(0)
    }
    assert(java.lang.Double.doubleToRawLongBits(got) ==
      java.lang.Double.doubleToRawLongBits(PlaneKernel.cosq(arr(vecA), arr(vecB))))
  }

  test("graft_ivf_argmax compiles strictly and matches a hand argmax") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    // 3 cells: vecB, vecA itself, and −vecA — the argmax for query vecA must
    // be its own cell (cid 2); ties can't occur here but the smallest-cid
    // rule is pinned by IvfFusedSpec's full-relation equality
    val cents = Array(vecB, vecA, vecA.map(x => -x))
    val flat = cents.flatten
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    val got = strictCodegen {
      Seq(vecA).toDF("v")
        .select(call_function("graft_ivf_argmax", col("v"), lit(flat), lit(norms)))
        .collect().head.getLong(0)
    }
    // hand replication of the kernel's exact arithmetic: integer dot,
    // toDouble, one division, strictly-greater keeps the earliest winner
    val scores = cents.indices.map { ci =>
      cents(ci).indices.map(i => vecA(i) * cents(ci)(i)).sum.toDouble / norms(ci)
    }
    var best = 0; var ci = 1
    while (ci < scores.length) { if (scores(ci) > scores(best)) best = ci; ci += 1 }
    assert(got == best + 1L)
    assert(got == 2L)
  }

  test("graft_md5_minhash compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(grams).toDF("g")
        .select(call_function("graft_md5_minhash", col("g"), lit(8)))
        .collect().head.getSeq[Long](0)
    }
    val want = CrossEngine.md5MinHash(
      new GenericArrayData(grams.map(UTF8String.fromString).toArray[Any]), 8)
    assert(got == want.toLongArray().toSeq)
  }

  test("graft_md5_minhash_text compiles strictly and matches the kernel") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(text).toDF("t")
        .select(call_function("graft_md5_minhash_text", col("t"), lit(3), lit(16)))
        .collect().head.getSeq[Long](0)
    }
    val want = CrossEngine.md5MinHashText(UTF8String.fromString(text), 3, 16)
    assert(got == want.toLongArray().toSeq)
  }

  test("graft_simhash56 compiles strictly and matches the kernel (r2 regression)") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val got = strictCodegen {
      Seq(text).toDF("t")
        .select(call_function("graft_simhash56", col("t")))
        .collect().head.getLong(0)
    }
    assert(got == CrossEngine.SimHash56.fingerprint(text.split(" ", -1)))
    assert(got == CrossEngine.simhash56(UTF8String.fromString(text)))
  }

  test("graft_quantize compiles strictly and matches Spark's round/cast tree bitwise") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    // adversarial FINITE values: exact .5 boundaries both signs, tiny, big
    // (NaN/±Inf/overflow throw on BOTH paths under ANSI — asserted below)
    val floats = Array(0.0015f, -0.0015f, 0.0004999f, -1.9999f, 123.456f,
      -987.654f, 0f, 1e12f, -1e12f,
      0.9995f, -0.9995f, 3.3333f, 0.0025f)
    val df = Seq(Tuple1(floats)).toDF("v")
    val (kq, tq) = strictCodegen {
      val r = df.select(
        call_function("graft_quantize", col("v")).as("k"),
        graft.functions.GraftFunctions.quantize(col("v")).as("t"))
        .collect().head
      (r.getSeq[Long](0), r.getSeq[Long](1))
    }
    assert(kq == tq) // kernel ≡ transform(round(cast)*q).cast tree, bitwise
    // double input path too
    val doubles = floats.map(_.toDouble)
    val dfd = Seq(Tuple1(doubles)).toDF("v")
    val (kq2, tq2) = strictCodegen {
      val r = dfd.select(
        call_function("graft_quantize", col("v"), lit(1000L)).as("k"),
        graft.functions.GraftFunctions.quantize(col("v")).as("t"))
        .collect().head
      (r.getSeq[Long](0), r.getSeq[Long](1))
    }
    assert(kq2 == tq2)
    // exact Long.MinValue boundary: ANSI cast ACCEPTS −2^63 (it IS
    // Long.MinValue) while 2^63 overflows — the kernel's negative guard
    // must be strict or it throws where the reference tree returns a value
    val edge = Seq(Tuple1(Array(-9.223372036854776e18, 1.5, -1.5))).toDF("v")
    val (ek, et) = strictCodegen {
      val r = edge.select(
        call_function("graft_quantize", col("v"), lit(1L)).as("k"),
        graft.functions.GraftFunctions.quantize(col("v"), 1).as("t"))
        .collect().head
      (r.getSeq[Long](0), r.getSeq[Long](1))
    }
    assert(ek == et && ek.head == Long.MinValue)
    // non-finite input: ANSI casts throw on the tree; the kernel must too
    Seq(Float.NaN, Float.PositiveInfinity, 1e30f).foreach { bad =>
      val e = intercept[Exception] {
        Seq(Tuple1(Array(bad))).toDF("v")
          .select(call_function("graft_quantize", col("v"))).collect()
      }
      assert(e.toString.contains("graft_quantize") ||
        e.getCause != null && e.getCause.toString.contains("graft_quantize"))
    }
  }

  test("graft_dot compiles strictly and matches the zip_with/aggregate tree") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val (k, t) = strictCodegen {
      val r = Seq((vecA, vecB)).toDF("a", "b").select(
        call_function("graft_dot", col("a"), col("b")).as("k"),
        graft.functions.GraftFunctions.dotLong(col("a"), col("b")).as("t"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(k == t)
    assert(k == PlaneKernel.dotLong(arr(vecA), arr(vecB)))
  }

  test("graft_hamming_sum compiles strictly and matches per-table bit_count sum") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val ba = Array.fill(4)(rnd.nextLong())
    val bb = Array.fill(4)(rnd.nextLong())
    val got = strictCodegen {
      Seq((ba, bb)).toDF("a", "b")
        .select(call_function("graft_hamming_sum", col("a"), col("b")))
        .collect().head.getLong(0)
    }
    val want = (0 until 4).map(i => java.lang.Long.bitCount(ba(i) ^ bb(i)).toLong).sum
    assert(got == want)
    assert(got == PlaneKernel.hammingSum(arr(ba), arr(bb)))
  }

  test("graft_lex_count compiles strictly and matches the filter/contains tree") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val lex = Seq("the", "a", "of")
    val texts = Seq(
      "the cat of a the", "", " ", "a  a", "nolex words here", "the", "ünï the ünï")
    val rows = strictCodegen {
      texts.toDF("t").select(
        call_function("graft_lex_count", col("t"), array(lex.map(lit): _*)).as("k"),
        size(filter(split(col("t"), " ", -1),
          w => array_contains(array(lex.map(lit): _*), w))).cast("long").as("ref"))
        .collect()
    }
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("graft_len_sum compiles strictly and matches the transform/aggregate tree") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val arrays: Seq[Array[String]] = Seq(
      Array("abc", "", "déjà", "x"), Array.empty[String], Array("ünïcode"))
    val rows = strictCodegen {
      arrays.toDF("a").select(
        call_function("graft_len_sum", col("a")).as("k"),
        aggregate(transform(col("a"), t => length(t).cast("long")), lit(0L),
          (acc, v) => acc + v).as("ref"))
        .collect()
    }
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // null array and null element both yield NULL, like the HOF tree
    val nulls = strictCodegen {
      Seq(Tuple1(null: Array[String]), Tuple1(Array("x", null)))
        .toDF("a").select(
          call_function("graft_len_sum", col("a")).as("k"),
          aggregate(transform(col("a"), t => length(t).cast("long")), lit(0L),
            (acc, v) => acc + v).as("ref"))
        .collect()
    }
    nulls.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) && r.isNullAt(0), r.toString))
  }

  test("graft_shingle_hashes / graft_char_shingle_hashes compile strictly and match the UDF kernels") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val texts = Seq(text, "", "one two", "a b c d e", "über ünï gram tok", null)
    val rows = strictCodegen {
      texts.toDF("t").select(
        call_function("graft_shingle_hashes", col("t"), lit(3), lit(42L)).as("w"),
        call_function("graft_char_shingle_hashes", col("t"), lit(5), lit(42L)).as("c"),
        col("t"))
        .collect()
    }
    rows.foreach { r =>
      val t = r.getString(2)
      val wantW: Seq[Long] =
        if (t == null) Seq.empty
        else graft.functions.GraftFunctions.wordNgramHashSet(t, 3, 42L).toSeq
      val wantC: Seq[Long] =
        if (t == null) Seq.empty
        else graft.functions.GraftFunctions.shingleHashSet(
          graft.functions.GraftFunctions.charNgrams(t, 5), 42L).toSeq
      // null text → EMPTY set, never a null array (the UDF contract the
      // whole signature pipeline and its checkpoints rely on)
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getSeq[Long](0) == wantW && r.getSeq[Long](1) == wantC, s"text=$t")
    }
  }

  test("graft_jaccard_sorted compiles strictly and matches the UDF kernel incl. null → 0.0") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val a = shingles.distinct.sorted
    val b = (shingles.take(20) ++ Array.fill(15)(rnd.nextLong())).distinct.sorted
    val cases = Seq(
      (a, b), (a, a), (Array.empty[Long], Array.empty[Long]),
      (a, Array.empty[Long]), (null: Array[Long], a), (a, null: Array[Long]))
    val rows = strictCodegen {
      cases.toDF("a", "b")
        .select(call_function("graft_jaccard_sorted", col("a"), col("b")))
        .collect()
    }
    rows.zip(cases).foreach { case (r, (x, y)) =>
      val want =
        if (x == null || y == null) 0.0 else graft.core.Similarities.jaccardSorted(x, y)
      assert(!r.isNullAt(0) && r.getDouble(0) == want, s"case ($x, $y)")
    }
  }

  test("graft_lcs_len compiles strictly and matches SuffixArray.lcsLength") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val cases = Seq(
      ("the quick brown fox", "a quick brown dog"),
      ("", "x"), ("abab", "baba"), ("ünïcode overlap zone", "overlap zone ünïcode"))
    val rows = strictCodegen {
      cases.toDF("a", "b")
        .select(call_function("graft_lcs_len", col("a"), col("b")), col("a"), col("b"))
        .collect()
    }
    rows.foreach(r => assert(
      r.getInt(0) == graft.core.SuffixArray.lcsLength(r.getString(1), r.getString(2))))
  }

  test("graft_url_id / graft_rehash_id compile strictly and match the UDF contract") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val urls = Seq("https://a.example/x?p=1", "", "ünïcode/ürl", "https://b.example/y")
    val rows = strictCodegen {
      urls.map(u => (u, 7L)).toDF("url", "id")
        .select(
          call_function("graft_url_id", col("url"), lit(0x55524C49L)).as("p"),
          call_function("graft_rehash_id", col("id"), col("url")).as("r"),
          col("url"), col("id"))
        .collect()
    }
    rows.foreach { r =>
      // pinned against Rng directly — the ScalaUDF form these expressions
      // replaced computed exactly these values, so ids (and docs
      // checkpoints) are stable across the conversion
      assert(r.getLong(0) == graft.core.Rng.hashString(0x55524C49L, r.getString(2)))
      assert(r.getLong(1) ==
        graft.core.Rng.hash2(r.getLong(3), graft.core.Rng.hashString(0x5345434FL, r.getString(2))))
    }
    // null url propagates (the UDF NPE'd; null → null is the documented form)
    val nullRow = strictCodegen {
      Seq((Option.empty[String], 7L)).toDF("url", "id")
        .select(
          call_function("graft_url_id", col("url"), lit(0x55524C49L)),
          call_function("graft_rehash_id", col("id"), col("url")))
        .collect().head
    }
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }

  test("graft_winnow_md5 / graft_winnow compile strictly and match the kernels") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "", "short", "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams equal
      "ünïcode gräms with ümläuts everywhere here")
    val rows = strictCodegen {
      cases.toDF("t")
        .select(
          call_function("graft_winnow_md5", col("t"), lit(8), lit(4)).as("m"),
          call_function("graft_winnow", col("t"), lit(8), lit(4), lit(42L)).as("r"),
          col("t"))
        .collect()
    }
    rows.foreach { r =>
      val t = UTF8String.fromString(r.getString(2))
      assert(r.getSeq[Long](0) == graft.functions.WinnowKernel.md5Winnow(t, 8, 4).toLongArray().toSeq)
      assert(r.getSeq[Long](1) ==
        graft.functions.WinnowKernel.rollingWinnow(t, 8, 4, 42L).toLongArray().toSeq)
    }
  }

  test("graft_word_ngrams / graft_word_blocks / graft_rep_stats compile strictly and match the kernels") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val cases = Seq(
      "a b c d e f g", "solo", "", "a  b", // double space → empty token kept
      "x y x y x z", "ünïcode wörds ünïcode wörds")
    val rows = strictCodegen {
      cases.toDF("t")
        .select(
          call_function("graft_word_ngrams", col("t"), lit(2)).as("g"),
          call_function("graft_word_blocks", col("t"), lit(3)).as("b"),
          call_function("graft_rep_stats", col("t"), lit(2), lit(3)).as("r"),
          col("t"))
        .collect()
    }
    rows.foreach { r =>
      val t = UTF8String.fromString(r.getString(3))
      def strs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      assert(r.getSeq[String](0) == strs(graft.functions.GramKernel.wordNgrams(t, 2)))
      assert(r.getSeq[String](1) == strs(graft.functions.GramKernel.wordBlocks(t, 3)))
      val k = graft.functions.GramKernel.repStats(t, 2, 3)
      val s = r.getStruct(2)
      assert(Option(s.getAs[String]("top_gram")) ==
        Option(k.getUTF8String(0)).map(_.toString))
      assert(s.getAs[java.lang.Long]("top_count") ==
        (if (k.isNullAt(1)) null else java.lang.Long.valueOf(k.getLong(1))))
      assert(s.getAs[Long]("mass_all") == k.getLong(2))
      assert(s.getAs[Long]("mass_dup") == k.getLong(3))
      assert(s.getAs[Long]("nb") == k.getLong(4))
      assert(s.getAs[Long]("ndb") == k.getLong(5))
    }
  }

  test("graft_lex_count with a NON-LITERAL lexicon is a clear analysis error") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    // a column lexicon used to blow up inside the function builder's eval()
    // with a contextless ClassCastException/NPE (ADVICE r4) — it must be an
    // analysis error naming the function and the literal requirement
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("the cat", Array("the"))).toDF("t", "lex")
        .select(call_function("graft_lex_count", col("t"), col("lex")))
        .collect()
    }
    assert(e.getMessage.contains("graft_lex_count") && e.getMessage.contains("LITERAL"))
    // wrong lexicon type is equally clear
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("t")
        .select(call_function("graft_lex_count", col("t"), array(lit(1L))))
        .collect()
    }
    assert(e2.getMessage.contains("array<string>"))
  }

  test("md5-minhash lane count above MaxLanes fails at PLAN time, not per-row") {
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(text).toDF("t")
        .select(call_function("graft_md5_minhash_text", col("t"), lit(3), lit(65)))
        .collect()
    }
    assert(e.getMessage.contains("k must be in"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(grams).toDF("g")
        .select(call_function("graft_md5_minhash", col("g"), lit(999)))
        .collect()
    }
    assert(e2.getMessage.contains("k must be in"))
  }
}
