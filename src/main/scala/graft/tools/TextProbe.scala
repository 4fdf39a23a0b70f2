package graft.tools

import org.apache.spark.sql.functions._
import graft.testkit.PagesGen

/** North-rule scaling evidence for the round-6 text operators:
  *
  *  - paragraph-level dedup (SparkEntry.paragraphDedup over 10-word
  *    blocks): paragraph explode → md5 census groupBy (map-side partial)
  *    → shuffle_hash mark join — the one shuffled stage;
  *  - repetition stats (graft_rep_stats): a pure NARROW map — the probe's
  *    aggregate forces the kernel on every row (a bare count() would
  *    column-prune the expression away and time an empty scan).
  *
  * Same job at N and 4N local cores over the same deterministic corpus;
  * reports throughput at both plus the efficiency ratio.
  *
  * Usage: runMain graft.tools.TextProbe [nDocs] [nLow] [nHigh] [reps]
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 800000L
    val nLow = if (args.length > 1) args(1).toInt else 2
    val nHigh = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 2

    def levelRun(cores: Int): (Double, Double) = {
      val spark = graft.GraftSession.get(cores, s"text-probe-$cores")
      try {
        graft.functions.GraftExpressions.register(spark)
        def runPara(n: Long): Double = {
          val corpus = PagesGen.corpus(spark, n, seed = 0L, partitions = cores * 4)
            .withColumnRenamed("id", "doc_id")
          val t0 = System.nanoTime()
          val dups = graft.SparkEntry.paragraphDedup(corpus,
            call_function("graft_word_blocks", col("text"), lit(10)))
            .where(col("is_dup")).count()
          val w = (System.nanoTime() - t0) / 1e9
          println(f"[text-probe] para cores=$cores docs=$n wall=$w%.2f s dup_paras=$dups")
          w
        }
        def runRep(n: Long): Double = {
          val corpus = PagesGen.corpus(spark, n, seed = 0L, partitions = cores * 4)
            .withColumnRenamed("id", "doc_id")
          val t0 = System.nanoTime()
          val r = corpus
            .select(call_function("graft_rep_stats", col("text"), lit(2), lit(10)).as("r"))
            .agg(sum(col("r.mass_all") + col("r.nb")).as("m"), max("r.top_count").as("t"))
            .first()
          val w = (System.nanoTime() - t0) / 1e9
          println(f"[text-probe] rep  cores=$cores docs=$n wall=$w%.2f s " +
            s"mass=${r.getLong(0)} maxTop=${r.getLong(1)}")
          w
        }
        runPara(nDocs / 8); runPara(nDocs / 8) // JIT warm-up (5-20× on iter 1)
        val p = (1 to reps).map(_ => runPara(nDocs)).min
        runRep(nDocs / 8); runRep(nDocs / 8)
        val r = (1 to reps).map(_ => runRep(nDocs)).min
        (p, r)
      } finally spark.stop()
    }

    val (pLow, rLow) = levelRun(nLow)
    val (pHigh, rHigh) = levelRun(nHigh)
    def eff(lo: Double, hi: Double): Double = (lo / hi) / (nHigh.toDouble / nLow)
    println(s"""{"metric":"text_scaling","docs":$nDocs,"cores":[$nLow,$nHigh],""" +
      s""""para_tN_sec":${f"$pLow%.2f"},"para_t4N_sec":${f"$pHigh%.2f"},""" +
      s""""para_efficiency":${f"${eff(pLow, pHigh)}%.4f"},""" +
      s""""rep_tN_sec":${f"$rLow%.2f"},"rep_t4N_sec":${f"$rHigh%.2f"},""" +
      s""""rep_efficiency":${f"${eff(rLow, rHigh)}%.4f"},""" +
      s""""para_docs_per_sec_4N":${f"${nDocs / pHigh}%.1f"},""" +
      s""""rep_docs_per_sec_4N":${f"${nDocs / rHigh}%.1f"}}""")
  }
}
