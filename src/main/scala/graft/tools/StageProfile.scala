package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.Files
import graft.pipeline.{CheckpointedDedup, DedupConfig}
import graft.testkit.PagesGen

/** Prints per-stage wall times of one checkpointed pipeline run.
  * Usage: runMain graft.tools.StageProfile [cores] [nDocs]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toLong else 40000L
    val spark = graft.GraftSession.get(cores, "graft-profile")
    val dir = Files.createTempDirectory("graft-prof").toString
    val t0 = System.nanoTime()
    val rep = CheckpointedDedup.run(spark, PagesGen.pages(spark, nDocs, 0L, 64), DedupConfig(seed = 42L), dir)
    val total = (System.nanoTime() - t0) / 1e9
    rep.stages.foreach(s => println(f"[prof] ${s.name}%-16s ${s.millis / 1000.0}%8.2f s"))
    println(f"[prof] TOTAL            $total%8.2f s  (${nDocs / total}%.0f docs/s, cores=$cores)")
    spark.stop()
  }
}
