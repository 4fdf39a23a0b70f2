package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Rng

/** Steady-state check: repeat the anti-scaling probes 5× in one session.
  * Usage: SparkBurn3 <cores> */
object SparkBurn3 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = 128
    val rows = 64L * 1000000
    for (it <- 1 to 5) {
      var t0 = System.nanoTime()
      spark.range(0, rows, 1, tasks).selectExpr("xxhash64(id) as h").selectExpr("max(h)").first()
      val a = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      spark.range(0, rows / 4, 1, tasks).rdd
        .mapPartitions(x => x.map { i => var h = i; var k = 0; while (k < 200) { h = Rng.mix64(h); k += 1 }; h })
        .filter(_ == 42L).count()
      val b = (System.nanoTime() - t0) / 1e9
      println(f"[burn3] cores=$cores%2d iter=$it  sql_xxhash=$a%6.2f s  ds_rdd_map=$b%6.2f s")
    }
    spark.stop()
  }
}
