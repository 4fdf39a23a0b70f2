package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Rng

/** Finer bisect of the Dataset anti-scaling. Usage: SparkBurn2 <cores> */
object SparkBurn2 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tasks = 128
    val rows = 64L * 1000000

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[burn2] $name%-22s cores=$cores%2d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    timed("ds_identity_count") { // encoder path, no work
      spark.range(0, rows, 1, tasks).mapPartitions(it => it).filter(_ == -1L).count()
    }
    timed("ds_rdd_mapPart") { // same work, RDD view of the range
      val n = spark.range(0, rows, 1, tasks).rdd
        .mapPartitions(it => it.map { i => var h = i; var k = 0; while (k < 200) { h = Rng.mix64(h); k += 1 }; h })
        .filter(_ == 42L).count()
      if (n == -1) println("")
    }
    timed("sql_xxhash_agg") { // pure codegen, no scala closures
      spark.range(0, rows, 1, tasks)
        .selectExpr("xxhash64(id) as h").selectExpr("max(h)").first()
    }
    timed("udf_heavy") { // scala UDF per row (boxing) + codegen around it
      val f = org.apache.spark.sql.functions.udf((i: Long) => { var h = i; var k = 0; while (k < 200) { h = Rng.mix64(h); k += 1 }; h })
      spark.range(0, rows / 4, 1, tasks).select(f($"id").as("h")).filter($"h" === -1L).count()
    }
    spark.stop()
  }
}
