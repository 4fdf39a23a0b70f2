package graft.tools

import org.apache.spark.sql.functions.{col, lit}
import graft.pipeline.{Decontaminate, DedupConfig}
import graft.testkit.PagesGen

/** Two-parallelism scaling evidence for the asymmetric decontamination
  * operator — the north rule's two-cluster-size criterion applied per
  * operator, same sandbox protocol as [[graft.bench.ScalingBench]]: the
  * SAME job on the SAME deterministic input at local[N] and local[4N],
  * fresh session per level, per-session warm-up, efficiency =
  * (T_N / T_4N) / 4, target ≥ 0.8. The timed unit includes corpus
  * generation (as ScalingBench's does) plus the full
  * bands → broadcast-candidates → pair-dedup → pruned-verify plan.
  *
  * The optional 6th arg `ckpt` switches the timed unit to
  * [[Decontaminate.pairsFromCheckpoints]] over a store built ONCE up
  * front (CheckpointedDedup at 4N cores; the store is
  * parallelism-independent data) — the production shape where the scrub
  * reuses the bands/docs checkpoints of an already-deduped corpus. Eval
  * docs are copies of every evalMod-th corpus doc under fresh ids, so the
  * flag set is non-trivial at any size.
  *
  * Usage: runMain graft.tools.DeconProbe [nDocs] [evalMod] [nLow] [nHigh] [reps] [ckpt]
  */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 800000L
    val evalMod = if (args.length > 1) args(1).toLong else 1000L
    val nLow = if (args.length > 2) args(2).toInt else 2
    val nHigh = if (args.length > 3) args(3).toInt else 8
    val reps = if (args.length > 4) args(4).toInt else 2
    val ckptMode = args.length > 5 && args(5) == "ckpt"
    val cfg = DedupConfig(seed = 42L)

    val storeDir =
      if (!ckptMode) ""
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft-decon-store").toString
        val build = graft.GraftSession.get(nHigh, "decon-store-build")
        try {
          val t0 = System.nanoTime()
          graft.pipeline.CheckpointedDedup.run(
            build, PagesGen.pages(build, nDocs, seed = 0L, partitions = nHigh * 4).drop("id"),
            cfg, dir)
          println(f"[decon-probe] store build ($nDocs docs, $nHigh cores): " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s (untimed setup)")
        } finally build.stop()
        dir
      }

    def levelRun(cores: Int): Double = {
      val spark = graft.GraftSession.get(cores, s"decon-probe-$cores")
      try {
        def run(n: Long, mod: Long): Double = {
          import spark.implicits._
          val t0 = System.nanoTime()
          val (flagged, caches) =
            if (ckptMode)
              // ONLY the eval slice is generated (spark.range with step =
              // mod): generating the full n-doc corpus to filter out n/mod
              // docs put ~n page renders inside the timed region, so the
              // "checkpointed scrub" efficiency mostly measured
              // embarrassingly-parallel text generation (round-5 review)
              Decontaminate.pairsFromCheckpoints(spark, storeDir,
                spark.range(0L, n, mod, cores * 4)
                  .mapPartitions(_.map(id => (id + 1000000007L, PagesGen.textFor(0L, id))))
                  .toDF("id", "text"),
                cfg)
            else {
              val corpus = PagesGen.corpus(spark, n, seed = 0L, partitions = cores * 4)
              Decontaminate.pairsWithHandle(
                corpus.where(col("id") % mod =!= 0),
                corpus.where(col("id") % mod === 0), cfg)
            }
          val pairs = flagged.count()
          val w = (System.nanoTime() - t0) / 1e9
          caches.foreach(_.unpersist(blocking = false))
          spark.catalog.clearCache()
          println(f"[decon-probe] cores=$cores docs=$n ckpt=$ckptMode wall=$w%.2f s pairs=$pairs")
          w
        }
        // JIT warm-up (5-20× on iteration 1); in ckpt mode the corpus side
        // is the FULL store both times, so shrink the eval slice instead
        if (ckptMode) { run(nDocs, evalMod * 8); run(nDocs, evalMod * 8) }
        else { run(nDocs / 8, evalMod); run(nDocs / 8, evalMod) }
        (1 to reps).map(_ => run(nDocs, evalMod)).min
      } finally spark.stop()
    }

    val tLow = levelRun(nLow)
    val tHigh = levelRun(nHigh)
    val eff = (tLow / tHigh) / (nHigh.toDouble / nLow)
    println(s"""{"metric":"decon_scaling","docs":$nDocs,"evalMod":$evalMod,""" +
      s""""mode":"${if (ckptMode) "ckpt" else "inmem"}",""" +
      s""""cores":[$nLow,$nHigh],"tN_sec":${f"$tLow%.2f"},"t4N_sec":${f"$tHigh%.2f"},""" +
      s""""efficiency":${f"$eff%.4f"},"docs_per_sec_4N":${f"${nDocs / tHigh}%.1f"}}""")
  }
}
