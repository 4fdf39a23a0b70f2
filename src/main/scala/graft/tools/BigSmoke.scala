package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.testkit.PagesGen

/** Larger-than-bench smoke (VERDICT r4 #6): generates a 10×+ corpus ONCE
  * (documents/embeddings in the driver-table layout) and runs the three
  * heaviest queries single-shot, reporting walls plus the skew evidence
  * (max bucket size vs census cap on both the minhash and ANN paths).
  * The salting/census tests assert bounded tasks at small n; this proves
  * the same plans complete beyond the 800k-doc ceiling of the scaling runs
  * with no new hot key and no OOM.
  *
  * Usage: runMain graft.tools.BigSmoke [nDocs] [nVecs] [cores] [outDir]
  * Generation is deterministic (seeded PagesGen text; md5-free integer
  * hash embeddings in 4-member near-duplicate clusters so the ANN path
  * has real candidate load). Re-runs reuse an existing outDir.
  */
object BigSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val nVecs = if (args.length > 1) args(1).toLong else 100000L
    val cores = if (args.length > 2) args(2).toInt else 32
    val outDir = if (args.length > 3) args(3) else "target/bigsmoke"
    val spark = graft.GraftSession.get(cores, "graft-big-smoke")
    import spark.implicits._

    val docsPath = s"$outDir/documents.parquet"
    val vecsPath = s"$outDir/embeddings.parquet"
    if (!Files.exists(Paths.get(docsPath))) {
      PagesGen.pages(spark, nDocs, seed = 0L, partitions = cores * 4)
        .select(col("id").as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(docsPath)
    }
    if (!Files.exists(Paths.get(vecsPath))) {
      // 4-member clusters: base coords from the cluster id, ±0.01 member
      // noise — enough shared-bucket mass to exercise the census gate
      spark.range(nVecs).toDF("vec_id")
        .select(col("vec_id"), (col("vec_id") / 4).cast("long").as("cid"))
        .select(col("vec_id"), expr(
          """transform(sequence(0, 63), i -> cast(
             ((pmod(xxhash64(concat(cast(cid as string), ':', cast(i as string))), 2001) - 1000) / 1000.0
              + (pmod(xxhash64(concat(cast(vec_id as string), '#', cast(i as string))), 21) - 10) / 1000.0)
             as float))""").as("embedding"))
        .write.mode("overwrite").parquet(vecsPath)
    }

    // warm-up (first-run JIT costs 5-20× in this VM) on the small tables
    for (q <- Seq("q_minhash_lsh_pairs", "q_dedup_clusters", "q_embedding_lsh_ann")) {
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      spark.catalog.clearCache()
    }

    val walls = Seq("q_minhash_lsh_pairs", "q_dedup_clusters", "q_embedding_lsh_ann").map { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, outDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[bigsmoke] $q%-22s $w%8.1f s  ($n rows)")
      q -> (w, n)
    }

    // skew evidence: census shape on both banding paths
    val cfg = graft.SparkEntry.lshConfig
    val docs = spark.read.parquet(docsPath).select(col("doc_id").as("id"), col("text"))
    val mhCensus = graft.pipeline.Dedup.bucketCensus(
      graft.pipeline.Dedup.bands(graft.pipeline.Dedup.signatures(docs, cfg), cfg))
      .agg(max("bucket_size").as("maxB"),
        count(when(col("bucket_size") > cfg.maxBucket, 1)).as("capped")).first()
    println(s"[bigsmoke] minhash census: maxBucket=${mhCensus.getLong(0)} " +
      s"capped=${mhCensus.getLong(1)} cap=${cfg.maxBucket}")

    val qs = walls.map { case (q, (w, n)) => s""""$q":{"sec":$w,"rows":$n}""" }.mkString(",")
    println(s"""{"metric":"bigsmoke","docs":$nDocs,"vecs":$nVecs,"cores":$cores,""" +
      s""""queries":{$qs},"maxBucket":${mhCensus.getLong(0)},""" +
      s""""cappedBuckets":${mhCensus.getLong(1)}}""")
    spark.stop()
  }
}
