package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.{CheckpointedDedup, DedupConfig, IncrementalDedup}
import graft.testkit.PagesGen

/** Measures the incremental-dedup cost claim: ingesting a small increment
  * into a large checkpointed corpus must cost a small fraction of
  * re-running the union from scratch (the text-width stages dominate and
  * are reused). Prints one JSON line.
  * Usage: runMain graft.tools.IncrementalProbe [baseDocs] [incDocs] [cores] [textScale] [split]
  * textScale multiplies document length (10 = web-page-like text width, so
  * the reused text stages dominate the way they do at real scale).
  * split = "cross" (default: increment docs interleave WITHIN dup clusters,
  * so its pairs cross the boundary — 11% of docs carries ~22% of all dup
  * pairs, a stress shape) or "block" (increment = whole trailing blocks —
  * pair share proportional to doc share, the realistic daily-crawl shape).
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 200000L
    val nInc = if (args.length > 1) args(1).toLong else 25000L
    val cores = if (args.length > 2) args(2).toInt else 8
    val textScale = if (args.length > 3) args(3).toInt else 1
    val split = if (args.length > 4) args(4) else "cross"
    val cfg = DedupConfig(seed = 42L)
    val spark = graft.GraftSession.get(cores, "graft-inc-probe")
    val n = nBase + nInc
    val all = PagesGen.pages(spark, n, seed = 0L, partitions = cores * 4, textScale = textScale)
    // "cross": split WITHIN clusters so increment duplicates cross the
    // boundary; "block": trailing whole clusters form the increment
    val incPred =
      if (split == "block") col("id") >= nBase
      else pmod(col("id"), lit(n / nInc)) === 0
    val base = all.where(!incPred).drop("id")
    val inc = all.where(incPred).drop("id")

    // JIT warm-up (this VM's first-run cost is 5-20×)
    val wdir = Files.createTempDirectory("inc-warm").toString
    CheckpointedDedup.run(
      spark,
      PagesGen.pages(spark, math.max(2000, 20000 / textScale), 1L, cores * 4,
        textScale = textScale),
      cfg, wdir)

    val baseDir = Files.createTempDirectory("inc-base").toString
    val t0 = System.nanoTime()
    CheckpointedDedup.run(spark, base, cfg, baseDir)
    val tBase = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val rep = IncrementalDedup.run(spark, inc, cfg, baseDir)
    rep.clusters.count()
    val tInc = (System.nanoTime() - t1) / 1e9

    val fullDir = Files.createTempDirectory("inc-full").toString
    val t2 = System.nanoTime()
    CheckpointedDedup.run(spark, all.drop("id"), cfg, fullDir)
    val tFull = (System.nanoTime() - t2) / 1e9

    val stageMs = Seq("docs", "shingles", "signatures", "candidates", "verified_pairs", "clusters")
      .map(s => s""""$s":${graft.sources.TableIO.readManifest(s"${rep.incDir}/$s").map(_.wallMillis).getOrElse(-1L)}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"incremental_cost_ratio","value":${f"${tInc / tFull}%.4f"},""" +
      s""""base_docs":$nBase,"inc_docs":$nInc,"t_base_sec":${f"$tBase%.1f"},""" +
      s""""t_inc_sec":${f"$tInc%.1f"},"t_full_sec":${f"$tFull%.1f"},""" +
      s""""inc_frac_of_corpus":${f"${nInc.toDouble / n}%.3f"},"text_scale":$textScale,"split":"$split","inc_stage_ms":$stageMs}""")
    spark.stop()
  }
}
