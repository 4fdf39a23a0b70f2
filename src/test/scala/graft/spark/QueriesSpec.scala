package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Guard: every SparkEntry query runs and returns rows on the smoke tables,
  * every oracle key has a query, and the flagship entry is non-empty. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = graft.SparkEntry.oracleSql.keySet.diff(graft.SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }

  test("ngramJaccardPairs production default df-caps boilerplate shingles") {
    import spark.implicits._
    // 30 docs share only boilerplate trigrams (df 30); docs 101/102 are
    // genuine near-dups through low-df shingles. The production entry must
    // drop the O(df²) boilerplate bucket but keep the true pair.
    val boiler = "COPYRIGHT FOOTER TEXT"
    val d = ((1L to 30L).map(i => (i, s"unique$i words here $boiler")) :+
      (101L, "alpha beta gamma delta epsilon zeta") :+
      (102L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val capped = graft.SparkEntry.ngramJaccardPairs(d, 0.3, dfCap = 20L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((101L, 102L)))
    // with the cap above every df, the boilerplate pairs flood back in —
    // the capped form really is what removed them
    val uncapped = graft.SparkEntry.ngramJaccardPairs(d, 0.3, dfCap = 1000L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((101L, 102L)))
  }

  test("production rolling winnowPairs finds the md5 gate form's strong pairs") {
    // The two kernels are different hash FAMILIES over the same gram
    // sequence, so fingerprint sets — and borderline overlap values — differ
    // (measured: 3-5 knife-edge pairs near the 0.2 gate flip between
    // families at sf0.001). The planted near-dup pairs sit at overlap ≥ 0.5,
    // far from the gate: each family must report every pair the OTHER
    // family scores ≥ 0.5 (mutual recall of strong pairs).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "overlap").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    try {
      val md5Pairs = run(graft.SparkEntry.queries("q_winnow_pairs")(spark, dir))
      val rolling = run(graft.SparkEntry.winnowPairs(docs))
      def strong(m: Map[(Long, Long), Double]) = m.collect { case (p, ov) if ov >= 0.5 => p }.toSet
      assert(strong(md5Pairs).nonEmpty)
      assert(strong(md5Pairs).subsetOf(rolling.keySet))
      assert(strong(rolling).subsetOf(md5Pairs.keySet))
    } finally spark.catalog.clearCache() // both forms pin their fingerprint relation
  }

  test("q_ivf_ann reranks exactly and recalls a multiple of its scanned fraction") {
    // The sf0.001 probes have NO planted high-cos neighbors (their exact
    // top-10 sits at background cos ≈ 0.3 — the worst case for any ANN), so
    // recall@10 measures pure partition quality: nprobe=2 of ceil(√500)=23
    // cells scans ~8.7% of the corpus; measured recall is 0.26 (a 3× lift).
    // Pin a conservative floor plus the exactness of the rerank: every
    // neighbor IVF returns that the exact query also returns must carry the
    // IDENTICAL cosine (same kernel, bitwise).
    try {
      val ivf = graft.SparkEntry.queries("q_ivf_ann")(spark, dir)
        .select("probe_id", "vec_id", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val exact = graft.SparkEntry.queries("q_embedding_topk")(spark, dir)
        .select("probe_id", "vec_id", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val overlap = ivf.keySet.intersect(exact.keySet)
      assert(overlap.size.toDouble / exact.size >= 0.2,
        s"IVF recall@10 collapsed: ${overlap.size}/${exact.size}")
      overlap.foreach(k => assert(ivf(k) == exact(k), s"rerank cosine differs at $k"))
    } finally spark.catalog.clearCache() // q_ivf_ann pins the quantized corpus
  }
}
