package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Rng

/** Spark-layer scaling probe: the same mix64 work through (a) bare RDD
  * foreachPartition (no SQL, no encoders, no allocation), (b) Dataset
  * mapPartitions (encoder per row). Usage: runMain graft.tools.SparkBurn <cores>
  */
object SparkBurn {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val tasks = 128
    val opsPerTask = 12800000000L / tasks

    var t0 = System.nanoTime()
    sc.parallelize(0 until tasks, tasks).foreachPartition { it =>
      val t = it.next()
      var h = t.toLong; var i = 0L
      while (i < opsPerTask) { h = Rng.mix64(h); i += 1 }
      if (h == 42L) println("")
    }
    println(f"[sparkburn] rdd_foreach    cores=$cores%2d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")

    import spark.implicits._
    t0 = System.nanoTime()
    spark.range(0, 64L * 1000000, 1, tasks)
      .mapPartitions(it => it.map { i => var h = i; var k = 0; while (k < 200) { h = Rng.mix64(h); k += 1 }; h })
      .filter(_ == 42L).count()
    println(f"[sparkburn] ds_mapPart     cores=$cores%2d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")

    t0 = System.nanoTime()
    spark.range(0, 64L * 1000000, 1, tasks).selectExpr("sum(xxhash64(id))").first()
    println(f"[sparkburn] sql_xxhash     cores=$cores%2d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")

    spark.stop()
  }
}
