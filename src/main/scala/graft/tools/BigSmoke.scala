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
  * Usage: runMain graft.tools.BigSmoke [nDocs] [nVecs] [cores] [outDir] [skewDocs]
  * Generation is deterministic (seeded PagesGen text; md5-free integer
  * hash embeddings in 4-member near-duplicate clusters so the ANN path
  * has real candidate load). Re-runs reuse an existing outDir.
  *
  * skewDocs > 0 plants that many BOILERPLATE docs (ids 0..skewDocs-1, one
  * shared template at 1% token mutation — PagesGen.boilerplateText): every
  * band bucket they share is ≫ the census cap, so the run exercises the
  * cap + salted-cell pairing + cross-cell stitching + pointer-jumping-CC
  * path at scale — the one branch the uniform corpus never reaches
  * (VERDICT r4 #6 follow-up). Reports how many clusters the boilerplate
  * group resolves to (salting is W-nearest-neighbor chaining, so ONE
  * connected cluster = the recall evidence).
  */
object BigSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val nVecs = if (args.length > 1) args(1).toLong else 100000L
    val cores = if (args.length > 2) args(2).toInt else 32
    val outDir = if (args.length > 3) args(3) else "target/bigsmoke"
    val skewDocs = if (args.length > 4) args(4).toLong else 0L
    val spark = graft.GraftSession.get(cores, "graft-big-smoke")
    import spark.implicits._

    val docsPath = s"$outDir/documents.parquet"
    val vecsPath = s"$outDir/embeddings.parquet"
    if (!Files.exists(Paths.get(docsPath))) {
      spark.range(0L, nDocs, 1L, cores * 4)
        .mapPartitions(_.map { id =>
          val text =
            if (id < skewDocs) PagesGen.boilerplateText(0L, id)
            else PagesGen.textFor(0L, id)
          (id, text)
        })
        .toDF("doc_id", "text")
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

    var boilerClusters = -1L
    // A mutated-boilerplate group fragments into many band sub-buckets just
    // UNDER the census cap, and every in-cap bucket emits all-pairs — the
    // TRUE near-dup pair set of a k-member group is O(k²), so the default
    // (oracle) cap 2000 yields ~42·cap pairs per boilerplate doc
    // (measured: 50k boilerplate ⇒ ~2G pre-dedup pair rows ⇒ shuffle-spill
    // disk exhaustion on this VM). The oracle-config queries therefore run
    // only at disk-safe skew; the production posture for boilerplate-heavy
    // corpora is the SAME census-cap knob tuned down (tunedClusters below).
    val oracleCfgQueries =
      if (skewDocs > 20000)
        Seq("q_embedding_lsh_ann") // dedup pair mass would exceed local disk
      else Seq("q_minhash_lsh_pairs", "q_dedup_clusters", "q_embedding_lsh_ann")
    val walls = oracleCfgQueries.map { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, outDir)
      val n =
        if (q == "q_dedup_clusters" && skewDocs > 0) {
          // cache the narrow (doc_id, cluster) result so the connectivity
          // stat below doesn't re-run the pipeline (cache cost ≈ 16 B/row,
          // included in the reported wall — disclosed)
          val c = df.cache()
          val n0 = c.count()
          boilerClusters = c.where(col("doc_id") < skewDocs)
            .agg(countDistinct("cluster_id")).first().getLong(0)
          c.unpersist(blocking = false)
          n0
        } else df.count()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[bigsmoke] $q%-22s $w%8.1f s  ($n rows)")
      q -> (w, n)
    }
    if (skewDocs > 0 && boilerClusters >= 0)
      println(s"[bigsmoke] boilerplate (oracle cfg): $skewDocs docs → $boilerClusters cluster(s)")

    // Production boilerplate posture: maxBucket=256 routes every mega-group
    // sub-bucket through salted window chaining (O(n·W) pairs, cells ≤ 256)
    // instead of all-pairs — pair-level recall inside the group degrades to
    // window connectivity (disclosed via the census stats), clusters stay
    // exact for dup cliques. This is a CONFIG, not a code path: the same
    // census cap that bounds task memory bounds the pair mass.
    val tunedWalls =
      if (skewDocs > 0) {
        val tuned = graft.SparkEntry.lshConfig.copy(maxBucket = 256)
        val docsC = spark.read.parquet(docsPath)
          .select(col("doc_id").as("id"), col("text"))
        val t0 = System.nanoTime()
        val c = graft.pipeline.Dedup.clusters(docsC, tuned).cache()
        val n = c.count()
        val w = (System.nanoTime() - t0) / 1e9
        val bc = c.where(col("id") < skewDocs)
          .agg(countDistinct("cluster_id")).first().getLong(0)
        c.unpersist(blocking = false)
        spark.catalog.clearCache()
        println(f"[bigsmoke] tuned_clusters(cap=256) $w%6.1f s  ($n rows)")
        println(s"[bigsmoke] boilerplate (tuned cfg): $skewDocs docs → $bc cluster(s)")
        Some((w, n, bc))
      } else None

    // Asymmetric decontamination at scale: eval slice = every 1000th doc
    // (2k eval docs at 2M). The eval bands broadcast, so the corpus band
    // relation is never shuffled — wall should sit well under the
    // symmetric pair queries' (no self-join, no census stage). In the
    // skew variant the eval slice contains boilerplate docs, so the flag
    // set is genuinely large (each boilerplate eval doc flags the whole
    // mutated group) — output-linear, which is the point.
    val deconWall = {
      val docsC = spark.read.parquet(docsPath).select(col("doc_id").as("id"), col("text"))
      val t0 = System.nanoTime()
      val (flagged, caches) = graft.pipeline.Decontaminate.pairsWithHandle(
        docsC.where(col("id") % 1000 =!= 0), docsC.where(col("id") % 1000 === 0),
        graft.SparkEntry.lshConfig)
      val n = flagged.count()
      val w = (System.nanoTime() - t0) / 1e9
      caches.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      println(f"[bigsmoke] decontaminate(1/1000 eval) $w%6.1f s  ($n pairs)")
      (w, n)
    }

    // Winnowing near-dup pairs at scale (production rolling-hash kernel):
    // the third candidate family's scale leg — fingerprint CPU is O(chars)
    // per doc, the df-cap gate bounds the self-join, and the cached
    // fingerprint relation is ~16 B/row.
    val winnowWall = {
      val docsC = spark.read.parquet(docsPath)
      // JIT warm-up of the rolling kernel + join shape on the small table
      graft.SparkEntry.winnowPairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), k = 8, w = 16).count()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.winnowPairs(docsC, k = 8, w = 16).count()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[bigsmoke] winnow_pairs(k=8,w=16) $w%6.1f s  ($n pairs)")
      (w, n)
    }

    // Paragraph-level dedup at scale (round 6): census groupBy is map-side
    // partial (a mega-duplicated paragraph contributes one partial row per
    // task); the mark join back partitions by the paragraph hash, so a
    // boilerplate block shared by `skewDocs` docs is one hot join key —
    // which AQE's skew-join splitting handles on the hinted shuffle_hash
    // join (the window form this op deliberately avoids cannot be split at
    // all). With skewDocs > 0 the 1%-mutated template leaves ~0.9·skewDocs
    // EXACT copies of each unmutated 10-word block → a genuine hot hash.
    val paraWall = {
      val docsC = spark.read.parquet(docsPath)
      graft.SparkEntry.paragraphDedup(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        call_function("graft_word_blocks", col("text"), lit(10)))
        .where(col("is_dup")).count() // JIT warm-up
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val agg = graft.SparkEntry.paragraphDedup(docsC,
        call_function("graft_word_blocks", col("text"), lit(10)))
        .agg(count(lit(1)).as("paras"),
          count(when(col("is_dup"), 1)).as("dups"),
          max("n_copies").as("hottest")).first()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[bigsmoke] paragraph_dedup $w%6.1f s  (${agg.getLong(0)} paras, " +
        s"${agg.getLong(1)} dups, hottest hash ${agg.getLong(2)} copies)")
      (w, agg.getLong(1), agg.getLong(2))
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
    val skewJson =
      if (skewDocs > 0) {
        val tj = tunedWalls.map { case (w, n, bc) =>
          s""","tunedClusters":{"sec":$w,"rows":$n,"boilerplateClusters":$bc,"maxBucket":256}"""
        }.getOrElse("")
        s""","skewDocs":$skewDocs,"boilerplateClusters":$boilerClusters$tj"""
      } else ""
    println(s"""{"metric":"bigsmoke","docs":$nDocs,"vecs":$nVecs,"cores":$cores,""" +
      s""""queries":{$qs},"maxBucket":${mhCensus.getLong(0)},""" +
      s""""cappedBuckets":${mhCensus.getLong(1)},""" +
      s""""decontaminate":{"sec":${deconWall._1},"pairs":${deconWall._2}},""" +
      s""""winnowPairs":{"sec":${winnowWall._1},"pairs":${winnowWall._2}},""" +
      s""""paragraphDedup":{"sec":${paraWall._1},"dupParas":${paraWall._2},""" +
      s""""hottestCopies":${paraWall._3}}$skewJson}""")
    spark.stop()
  }
}
