package graft.tools

import org.apache.spark.sql.functions.col
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
  * Usage: runMain graft.tools.DeconProbe [nDocs] [evalMod] [nLow] [nHigh] [reps]
  */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 800000L
    val evalMod = if (args.length > 1) args(1).toLong else 1000L
    val nLow = if (args.length > 2) args(2).toInt else 2
    val nHigh = if (args.length > 3) args(3).toInt else 8
    val reps = if (args.length > 4) args(4).toInt else 2
    val cfg = DedupConfig(seed = 42L)

    def levelRun(cores: Int): Double = {
      val spark = graft.GraftSession.get(cores, s"decon-probe-$cores")
      try {
        def run(n: Long): Double = {
          val corpus = PagesGen.corpus(spark, n, seed = 0L, partitions = cores * 4)
          val t0 = System.nanoTime()
          val (flagged, caches) = Decontaminate.pairsWithHandle(
            corpus.where(col("id") % evalMod =!= 0),
            corpus.where(col("id") % evalMod === 0), cfg)
          val pairs = flagged.count()
          val w = (System.nanoTime() - t0) / 1e9
          caches.foreach(_.unpersist(blocking = false))
          spark.catalog.clearCache()
          println(f"[decon-probe] cores=$cores docs=$n wall=$w%.2f s pairs=$pairs")
          w
        }
        run(nDocs / 8); run(nDocs / 8) // JIT warm-up (5-20× on iteration 1)
        (1 to reps).map(_ => run(nDocs)).min
      } finally spark.stop()
    }

    val tLow = levelRun(nLow)
    val tHigh = levelRun(nHigh)
    val eff = (tLow / tHigh) / (nHigh.toDouble / nLow)
    println(s"""{"metric":"decon_scaling","docs":$nDocs,"evalMod":$evalMod,""" +
      s""""cores":[$nLow,$nHigh],"tN_sec":${f"$tLow%.2f"},"t4N_sec":${f"$tHigh%.2f"},""" +
      s""""efficiency":${f"$eff%.4f"},"docs_per_sec_4N":${f"${nDocs / tHigh}%.1f"}}""")
  }
}
