package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SimHashDedup
import graft.streaming.NearDupStream

/** Incremental (stateful) near-dup detection: the streamed pair set must
  * equal the batch SimHashDedup pairs on the same corpus — every co-bucket
  * pair is seen exactly when its second member arrives, regardless of
  * arrival order, and the per-bucket state cap bounds hot buckets. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val docsFile = "/root/testdata/sf0.001/documents.parquet"

  // stream source needs a directory
  lazy val glob: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(docsFile), dir.resolve("documents.parquet"))
    dir.toString
  }

  private def batchTruth: Set[(Long, Long)] =
    SimHashDedup.pairs(spark.read.parquet(docsFile), maxHamming = 6, maxBucket = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed pairs equal the batch SimHash pairs (set semantics)") {
    val schema = spark.read.parquet(docsFile).schema
    val stream = spark.readStream.schema(schema).parquet(glob)
      .select(col("doc_id"), col("text"))
    val q = NearDupStream.pairs(stream, maxHamming = 6, maxMembers = 100000)
      .writeStream.format("memory").queryName("neardup_stream").outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("neardup_stream")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchTruth)
  }

  test("state TTL variant produces identical pairs while the state is live") {
    val schema = spark.read.parquet(docsFile).schema
    val stream = spark.readStream.schema(schema).parquet(glob)
      .select(col("doc_id"), col("text"))
    val q = NearDupStream.pairs(stream, maxHamming = 6, maxMembers = 100000,
        stateTtl = Some("1 hour"))
      .writeStream.format("memory").queryName("neardup_ttl").outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("neardup_ttl")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchTruth)
  }

  test("state cap bounds hot buckets to O(n·cap) pairs instead of O(n²)") {
    import spark.implicits._
    // 50 identical docs, cap 10: the first 10 arrivals fill the state and
    // pair among themselves (C(10,2)=45); each later arrival pairs against
    // exactly the 10 stored members → 45 + 40·10 = 445 distinct pairs,
    // independent of arrival order — linear in n, vs the uncapped C(50,2)
    val hot = (0L until 50L).map(i => (i, "same boilerplate text here " * 5)).toDF("doc_id", "text")
    val capped = NearDupStream.pairs(hot, maxHamming = 6, maxMembers = 10)
      .collect().map(p => (p.doc_a, p.doc_b)).distinct
    val uncapped = NearDupStream.pairs(hot, maxHamming = 6, maxMembers = 10000)
      .collect().map(p => (p.doc_a, p.doc_b)).distinct
    assert(uncapped.length == 50 * 49 / 2)
    assert(capped.length == 45 + 40 * 10,
      s"expected O(n·cap) = 445 pairs, got ${capped.length}")
  }
}
