package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions
import graft.pipeline.{Dedup, DedupConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * Every query is a Spark-first DataFrame program over the driver-generated
  * parquet tables; `oracleSql` holds the ANSI-SQL equivalent run by DuckDB.
  * Determinism rules for oracle parity (floats hash-compared bitwise):
  *  - integer/count arithmetic everywhere possible (exact under any
  *    partitioning / execution order);
  *  - ratios only as a single division of exact integers;
  *  - money sums rounded to 2dp (noise ~1e-9 can't cross a rounding boundary
  *    whose true value is a multiple of .01);
  *  - embedding cosine on 1e3-quantized int64 vectors (exact dot products,
  *    one sqrt/div at the end);
  *  - explicit ORDER BY + explicit casts so schemas match (Spark size() is
  *    INT, DuckDB len() is BIGINT — always cast to long).
  */
object SparkEntry {

  /** Default LSH config: k=126 lanes, b=42 bands × r=3 rows. At the verify
    * threshold J=0.5 a true pair is missed with prob (1−0.5³)^42 ≈ 3.6e-3;
    * the planted near-dup pairs in this corpus sit at J ≥ 0.85 where the miss
    * probability is (1−0.614)^42 ≈ 4.8e-18 — recall is 1 up to hash noise. */
  val lshConfig: DedupConfig = DedupConfig(
    shingleWords = 3, numHashes = 126, bands = 42, threshold = 0.5, seed = 42L)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents with the pipeline's (id, text) contract. */
  private def docsAsCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id").as("id"), col("text"))

  /** Exact all-pairs word-trigram Jaccard via a distributed shingle
    * equi-join (no driver-side loops; the |A∩B| count is a groupBy on the
    * pair key, |A| sizes broadcast back in). */
  private def ngramJaccardPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val sh = docs(s, dir)
      .select(
        col("doc_id"),
        explode(GraftFunctions.shingleHashesUdf(3, lshConfig.seed)(col("text"))).as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(broadcast(sz.select(col("doc_id").as("doc_a"), col("n").as("na"))), Seq("doc_a"))
      .join(broadcast(sz.select(col("doc_id").as("doc_b"), col("n").as("nb"))), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Flagship: LSH near-duplicate pairs on the smoke corpus; driver checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Dedup.nearDupPairs(docsAsCorpus(spark, "/root/testdata/sf0.001"), lshConfig)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ dedup / text analytics
    "q_exact_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(md5(col("text")))
      docs(s, dir)
        .select(col("doc_id"), min(col("doc_id")).over(w).as("keep_id"))
        .orderBy("doc_id")
    }),
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .orderBy("doc_id")),
    "q_token_stats" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " ", -1))).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")),
    "q_quality" -> ((s, dir) => {
      val ws = split(col("text"), " ", -1)
      val stop = array(Seq("the", "a", "an", "of", "to", "and", "in", "on", "is", "it").map(lit): _*)
      val nWords = size(ws).cast("long")
      val stopCnt = size(filter(ws, w => array_contains(stop, w))).cast("long")
      val sumLen = aggregate(transform(ws, w => length(w).cast("long")), lit(0L), (acc, v) => acc + v)
      docs(s, dir)
        .select(
          col("doc_id"),
          nWords.as("n_words"),
          (stopCnt.cast("double") / nWords.cast("double")).as("stop_ratio"),
          (sumLen.cast("double") / nWords.cast("double")).as("avg_wlen"))
        .orderBy("doc_id")
    }),
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          when(col("text").contains(" the "), "en")
            .when(col("text").contains(" der "), "de")
            .when(col("text").contains(" le "), "fr")
            .when(col("text").contains(" el "), "es")
            .otherwise("unknown").as("lang_pred"))
        .orderBy("doc_id")),
    "q_ngram_jaccard_pairs" -> ((s, dir) => ngramJaccardPairs(s, dir, 0.05)),
    // ------------------------------------------------------------ LSH dedup
    "q_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(docsAsCorpus(s, dir), lshConfig)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")),
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(docsAsCorpus(s, dir), lshConfig)
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")),
    "q_minhash_signatures" -> ((s, dir) =>
      Dedup.signatures(docsAsCorpus(s, dir), lshConfig)
        .select(col("id").as("doc_id"), col("sig"))
        .orderBy("doc_id")),
    "q_simhash_pairs" -> ((s, dir) => {
      // SimHash near-dup: 64-bit fingerprint, candidates = equal 8-bit chunk
      // in any of 8 bands (catches all pairs at hamming ≤ 7), exact hamming verify.
      val fp = docs(s, dir)
        .select(col("doc_id"), GraftFunctions.simhash64Udf(lshConfig.seed)(col("text")).as("fp"))
      val chunks = fp.select(
        col("doc_id"), col("fp"),
        posexplode(array((0 until 8).map(i => shiftrightunsigned(col("fp"), i * 8).bitwiseAND(lit(255L))): _*))
          .as(Seq("chunk_idx", "chunk")))
      // hamming filter BEFORE the pair-dedup shuffle: shrinks the shuffled
      // relation to true near-dups instead of every bucket collision
      chunks.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("chunk_idx"), col("chunk"))
        .join(
          chunks.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("chunk_idx"), col("chunk")),
          Seq("chunk_idx", "chunk"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          GraftFunctions.hamming64Udf(col("fp_a"), col("fp_b")).cast("long").as("hamming"))
        .where(col("hamming") <= 7)
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    }),
    // ---------------------------------------------------- similarity search
    "q_embedding_topk" -> ((s, dir) => {
      val q = tbl(s, dir, "embeddings")
        .select(col("vec_id"), GraftFunctions.quantize(col("embedding")).as("v"))
      val probes = q.where(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      val scored = broadcast(probes).join(q, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          GraftFunctions.cosineQuantized(col("pv"), col("v")).as("cos_sim"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .select("probe_id", "vec_id", "rnk", "cos_sim")
        .orderBy("probe_id", "rnk")
    }),
    "q_embedding_lsh_ann" -> ((s, dir) => {
      // Multi-table hyperplane LSH for cosine ANN: 8 tables × 4 bits → bucket
      // keys, candidates = same bucket in ANY table (OR-amplification), exact
      // quantized-cosine rerank. This is the scale path: candidate generation
      // is a shuffle on (table, bucket), never an all-pairs join.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).first().getInt(0)
      val tables = 8; val bitsPerTable = 4
      val hasher = graft.core.SimHasher(tables * bitsPerTable, dim, lshConfig.seed)
      val bucketsUdf = udf((v: Seq[Float]) => {
        val sig = hasher(v.map(_.toDouble).toArray)(0) // 32 bits in word 0
        Array.tabulate(tables)(t => (sig >>> (t * bitsPerTable)) & ((1L << bitsPerTable) - 1))
      })
      val q = e.select(col("vec_id"), GraftFunctions.quantize(col("embedding")).as("v"),
        posexplode(bucketsUdf(col("embedding"))).as(Seq("table_idx", "bucket")))
      // dedup pairs BEFORE scoring: the 64-lane quantized dot product costs
      // more than shuffling the collision pairs (measured 2.5x)
      q.select(col("vec_id").as("vec_a"), col("v").as("va"), col("table_idx"), col("bucket"))
        .join(q.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("table_idx"), col("bucket")),
          Seq("table_idx", "bucket"))
        .where(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb")
        .dropDuplicates("vec_a", "vec_b")
        .select(col("vec_a"), col("vec_b"),
          GraftFunctions.cosineQuantized(col("va"), col("vb")).as("cos_sim"))
        .where(col("cos_sim") >= 0.35)
        .orderBy("vec_a", "vec_b")
    }),
    "q_mips_signalsh" -> ((s, dir) => {
      // SignALSH maximum-inner-product retrieval (asymmetric LSH, SURVEY §2.a
      // ops #10-12): corpus side uses index_hash, probe side query_hash; an
      // 8-bit prefix of the sign bits buckets candidates, exact hamming ranks.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).first().getInt(0)
      val maxnorm = e.select(
        max(sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
          lit(0.0), (acc, v) => acc + v)))).first().getDouble(0) * 1.001
      val alsh = graft.core.SignAlsh(64, dim, maxnorm, seed = lshConfig.seed)
      val idxUdf = udf((v: Seq[Float]) => alsh.indexHash(v.map(_.toDouble).toArray)(0))
      val qryUdf = udf((v: Seq[Float]) => alsh.queryHash(v.map(_.toDouble).toArray)(0))
      val corpus = e.select(col("vec_id"), idxUdf(col("embedding")).as("bits"))
        .withColumn("bucket", col("bits").bitwiseAND(lit(255L)))
      val probes = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), qryUdf(col("embedding")).as("qbits"))
        .withColumn("bucket", col("qbits").bitwiseAND(lit(255L)))
      val scored = broadcast(probes).join(corpus, Seq("bucket"))
        .where(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          GraftFunctions.hamming64Udf(col("qbits"), col("bits")).cast("long").as("hamming"))
      val w = Window.partitionBy("probe_id").orderBy(col("hamming").asc, col("vec_id").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .select("probe_id", "vec_id", "rnk", "hamming")
        .orderBy("probe_id", "rnk")
    }),
    "q_lp_bucket" -> ((s, dir) => {
      // p-stable L2 LSH bucketing (SURVEY §2.a ops #7-8): floor-quantized
      // projections group vectors into distance-preserving buckets.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).first().getInt(0)
      val lp = graft.core.LpHasher(4, dim, scale = 2.0, power = 2, seed = lshConfig.seed)
      val sigUdf = udf((v: Seq[Float]) => lp(v.map(_.toDouble).toArray))
      e.select(col("vec_id"), sigUdf(col("embedding")).as("lp_sig"))
        .withColumn("bucket", xxhash64(col("lp_sig").cast("string")))
        .orderBy("vec_id")
    }),
    // ------------------------------------------------------------ relational
    "q1_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          (sum(col("l_quantity")) / count(lit(1)).cast("double")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q_join_agg" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("c_mktsegment")
    }),
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),
    "q_events_daily" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type", "day")),
    // --------------------------------------------------------- multimodal
    "q_multimodal_meta" -> ((s, dir) => {
      // Binary-column plumbing: opaque bytes + typed metadata; the decode
      // step itself is stubbed (no media libs in this env) — see
      // graft.multimodal.Multimodal for the mapPartitions feature extractor.
      val bin = encode(col("text"), "UTF-8")
      docs(s, dir)
        .select(
          col("doc_id"),
          octet_length(bin).cast("long").as("n_bytes"),
          substring(hex(bin), 1, 8).as("magic"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = {
    // shared CTE prefix: word-trigram shingles + sizes + pair intersections
    def pairCtes: String =
      """t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM t, UNNEST(list_transform(range(1, greatest(len(ws)-1, 1)), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) u(s)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b, CAST(c AS DOUBLE)/CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
        |        FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)""".stripMargin
    Map(
      "q_exact_dedup" ->
        "SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM documents ORDER BY doc_id",
      "q_fingerprint" ->
        raw"SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents ORDER BY doc_id",
      "q_token_stats" ->
        """SELECT doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
          |  CAST(length(text) AS BIGINT) AS n_chars
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q_quality" ->
        """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
          |SELECT doc_id,
          |  CAST(len(ws) AS BIGINT) AS n_words,
          |  CAST(len(list_filter(ws, x -> x IN ('the','a','an','of','to','and','in','on','is','it'))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS stop_ratio,
          |  CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS avg_wlen
          |FROM w ORDER BY doc_id""".stripMargin,
      "q_lang_id" ->
        """SELECT doc_id,
          |  CASE WHEN contains(text, ' the ') THEN 'en'
          |       WHEN contains(text, ' der ') THEN 'de'
          |       WHEN contains(text, ' le ') THEN 'fr'
          |       WHEN contains(text, ' el ') THEN 'es'
          |       ELSE 'unknown' END AS lang_pred
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q_ngram_jaccard_pairs" ->
        s"""WITH $pairCtes
           |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.05 ORDER BY doc_a, doc_b""".stripMargin,
      "q_minhash_lsh_pairs" ->
        s"""WITH $pairCtes
           |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
      "q_dedup_clusters" ->
        s"""WITH RECURSIVE $pairCtes,
           |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
           |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
           |reach(a, b) AS (SELECT doc_id, doc_id FROM t UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
           |SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
      "q_embedding_topk" ->
        """WITH q AS (SELECT vec_id, list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000) AS BIGINT)) AS v FROM embeddings),
          |p AS (SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
          |        list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) AS dot,
          |        list_sum(list_transform(a.v, x -> x*x)) AS na,
          |        list_sum(list_transform(b.v, x -> x*x)) AS nb
          |      FROM q a JOIN q b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
          |s AS (SELECT probe_id, vec_id, CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos_sim FROM p),
          |r AS (SELECT probe_id, vec_id, cos_sim, row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS rk FROM s)
          |SELECT probe_id, vec_id, CAST(rk AS BIGINT) AS rnk, cos_sim FROM r WHERE rk <= 10 ORDER BY probe_id, rnk""".stripMargin,
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(l_quantity) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
          |  sum(l_quantity) / CAST(count(*) AS DOUBLE) AS avg_qty,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q_join_agg" ->
        """SELECT c_mktsegment,
          |  count(DISTINCT o_orderkey) AS n_orders,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q_window_topn" ->
        """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
      "q_events_daily" ->
        """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
      "q_multimodal_meta" ->
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  substring(hex(encode(text)), 1, 8) AS magic
          |FROM documents ORDER BY doc_id""".stripMargin
    )
  }
}
