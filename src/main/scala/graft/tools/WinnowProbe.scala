package graft.tools

import graft.testkit.PagesGen

/** North-rule scaling evidence for the winnowing near-dup family
  * (SparkEntry.winnowPairs, production Rabin–Karp rolling kernel): same
  * in-memory job at N and 4N local cores over the same deterministic
  * corpus, reporting throughput at both plus the efficiency ratio. The
  * timed unit includes corpus generation (as ScalingBench's does) plus the
  * fingerprint projection, df-cap census gate, fingerprint self-join and
  * size re-joins.
  *
  * Usage: runMain graft.tools.WinnowProbe [nDocs] [nLow] [nHigh] [reps]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 800000L
    val nLow = if (args.length > 1) args(1).toInt else 2
    val nHigh = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 2

    def levelRun(cores: Int): Double = {
      val spark = graft.GraftSession.get(cores, s"winnow-probe-$cores")
      try {
        def run(n: Long): Double = {
          val corpus = PagesGen.corpus(spark, n, seed = 0L, partitions = cores * 4)
            .withColumnRenamed("id", "doc_id")
          val t0 = System.nanoTime()
          val pairs = graft.SparkEntry.winnowPairs(corpus, k = 8, w = 16).count()
          val w = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // winnowPairs pins the fingerprint relation
          println(f"[winnow-probe] cores=$cores docs=$n wall=$w%.2f s pairs=$pairs")
          w
        }
        run(nDocs / 8); run(nDocs / 8) // JIT warm-up (5-20× on iteration 1)
        (1 to reps).map(_ => run(nDocs)).min
      } finally spark.stop()
    }

    val tLow = levelRun(nLow)
    val tHigh = levelRun(nHigh)
    val eff = (tLow / tHigh) / (nHigh.toDouble / nLow)
    println(s"""{"metric":"winnow_scaling","docs":$nDocs,""" +
      s""""cores":[$nLow,$nHigh],"tN_sec":${f"$tLow%.2f"},"t4N_sec":${f"$tHigh%.2f"},""" +
      s""""efficiency":${f"$eff%.4f"},"docs_per_sec_4N":${f"${nDocs / tHigh}%.1f"}}""")
  }
}
