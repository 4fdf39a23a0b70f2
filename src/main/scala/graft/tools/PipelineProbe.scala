package graft.tools

import graft.pipeline.{Dedup, DedupConfig}
import graft.testkit.PagesGen

/** One-shot in-memory pipeline run with phase timings + the candidates plan —
  * for diagnosing scale/memory behavior without the full ScalingBench loop.
  * Usage: runMain graft.tools.PipelineProbe [nDocs] [cores]
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val cfg = DedupConfig(seed = 42L)
    val spark = graft.GraftSession.get(cores, "pipeline-probe")
    val corpus = PagesGen.corpus(spark, nDocs, seed = 0L, partitions = cores * 4)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = Dedup.signatures(corpus, cfg).cache()
    timed("signatures.count")(sigs.count())
    val bandsDf = Dedup.bands(sigs, cfg)
    val census = Dedup.bucketCensus(bandsDf)
    timed("census.count")(census.count())
    val cand = Dedup.candidatesFromCensus(bandsDf, census, cfg)
    println("[probe] candidates plan:")
    println(cand.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    timed("candidates.count")(cand.count())
    val verified = Dedup.verify(cand, sigs.select("id", "shingles"), cfg)
    timed("verified.count")(verified.count())
    timed("clustersWithLcs.count")(Dedup.clustersWithLcs(corpus, cfg).count())
    spark.stop()
  }
}
