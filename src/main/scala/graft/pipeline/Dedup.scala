package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Job configuration — the analogue of a constructed `LSHFunction` bundle
  * (/root/reference/src/LSHBase.jl:24): immutable, seed-derived, broadcastable.
  * k = bands·rowsPerBand hash lanes; a pair with Jaccard s becomes a candidate
  * with probability 1 − (1 − s^r)^b (banding OR/AND amplification over the
  * reference's single-hash contract Pr[h(A)=h(B)] = J(A,B),
  * /root/reference/src/hashes/minhash.jl:142, LSHBase.jl:130-160).
  */
final case class DedupConfig(
    shingleWords: Int = 3,
    numHashes: Int = 126,
    bands: Int = 42,
    threshold: Double = 0.5,
    seed: Long = 42L,
    /** Buckets larger than this are excluded from pairing and disclosed in
      * metrics — the hot-bucket cap (boilerplate pages at web scale). */
    maxBucket: Int = 2000) {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  def rowsPerBand: Int = numHashes / bands

  /** Probability a pair at similarity s survives banding (recall at s). */
  def candidateProbability(s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)
}

/** The near-duplicate detection pipeline, stage by stage, each a pure
  * DataFrame → DataFrame function so stages can be checkpointed/resumed
  * independently (see [[Checkpoints]]).
  *
  * Input contract: a DataFrame with (id: LONG unique, text: STRING).
  * Scale design (100 TB / 10^12 docs):
  *  - signatures are computed per-row in one narrow pass (no k-fold explode);
  *  - the only shuffles are: bucket groupBy (by band key), pair dropDuplicates
  *    (by pair), verify join (by doc id), and the CC iterations;
  *  - the bucket census runs BEFORE collect_list so no executor ever
  *    materializes a hot bucket (cap + disclosure instead of OOM);
  *  - everything is deterministic under any partitioning (seeded stateless
  *    hashing, min/sort-based kernels) so reruns and different cluster sizes
  *    give identical output.
  */
object Dedup {

  /** Stage SHINGLE+SIGNATURE: id, shingles (sorted distinct hashes), sig. */
  def signatures(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val sh = GraftFunctions.shingleHashesUdf(cfg.shingleWords, cfg.seed)
    val mh = GraftFunctions.minhashSigUdf(cfg.numHashes, cfg.seed)
    docs
      .select(col("id"), sh(col("text")).as("shingles"))
      .withColumn("sig", mh(col("shingles")))
  }

  /** Stage BAND: one row per (doc, band) with the band's combined hash. */
  def bands(signatures: DataFrame, cfg: DedupConfig): DataFrame = {
    val bh = GraftFunctions.bandHashesUdf(cfg.bands, cfg.rowsPerBand, cfg.seed)
    signatures
      .select(col("id"), posexplode(bh(col("sig"))).as(Seq("band_idx", "band_hash")))
  }

  /** Bucket census: size of every (band_idx, band_hash) bucket — used both to
    * prune hot buckets before any collect and for skew metrics. */
  def bucketCensus(bands: DataFrame): DataFrame =
    bands.groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bucket_size"))

  /** Stage CANDIDATES: within-bucket sorted pairs, deduped across bands
    * (OR-amplification = any shared band ⇒ candidate). Buckets above
    * cfg.maxBucket are pruned (skew cap) — callers surface them via
    * [[bucketCensus]]. The census join is on the same keys as the groupBy, so
    * Catalyst reuses one exchange (no extra shuffle).
    */
  def candidates(bands: DataFrame, cfg: DedupConfig): DataFrame = {
    val census = bucketCensus(bands)
    val pruned = bands
      .join(
        census.where(col("bucket_size").between(2, cfg.maxBucket)),
        Seq("band_idx", "band_hash"))
    val spark = bands.sparkSession
    import spark.implicits._
    pruned
      .groupBy("band_idx", "band_hash")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explodePairs(col("ids")).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** All ordered pairs of a sorted id list, as a generator column. */
  private def explodePairs(ids: org.apache.spark.sql.Column) = {
    val pairUdf = udf((ids: Seq[Long]) => {
      val n = ids.length
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { out += ((ids(i), ids(j))); j += 1 }
        i += 1
      }
      out.toSeq
    })
    explode(pairUdf(ids))
  }

  /** Stage VERIFY: exact Jaccard (the reference's ground-truth kernel,
    * similarities.jl:230-238) on the candidate pairs, thresholded. Joins back
    * to the shingle sets by doc id (sort-merge at scale; the shingles relation
    * is reused from the signature stage, so cache/checkpoint it upstream). */
  def verify(candidates: DataFrame, shingles: DataFrame, cfg: DedupConfig): DataFrame = {
    val sa = shingles.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingles.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        GraftFunctions.jaccardSortedUdf(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= cfg.threshold)
  }

  /** End-to-end: docs(id, text) → verified near-dup pairs. */
  def nearDupPairs(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val sigs = signatures(docs, cfg).cache()
    val pairs = candidates(bands(sigs, cfg), cfg)
    verify(pairs, sigs.select("id", "shingles"), cfg)
  }

  /** End-to-end: docs(id, text) → (id, cluster_id) for every doc, cluster_id =
    * min doc id of the duplicate component (singletons map to themselves). */
  def clusters(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val pairs = nearDupPairs(docs, cfg).select("id_a", "id_b")
    ConnectedComponents.run(docs.select("id"), pairs)
  }
}
