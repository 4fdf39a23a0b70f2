package graft.tools

import org.apache.spark.sql.functions._

/** Build-once/query-many evidence for the two checkpointed retrieval
  * stores ([[graft.pipeline.IvfIndex]], [[graft.pipeline.MipsIndex]]): the
  * measured point is the ratio of a store QUERY wall (probe hashing +
  * candidate join + rerank from checkpoints) to the BUILD wall it avoids
  * re-paying (quantize + O(n·C·d) assignment / O(n·T·P·d) sign bits).
  * Input synthesis is cached untimed (the IvfProbe honesty posture).
  *
  * Usage: runMain graft.tools.StoreProbe [nVecs] [cores]
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 400000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = graft.GraftSession.get(cores, s"store-probe-$cores")
    try {
      val emb = IvfProbe.vectors(spark, nVecs, cores * 4).cache()
      emb.count()
      val root = java.nio.file.Files.createTempDirectory("graft-store-probe").toString
      def secs[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // JIT warm-up at n/8 (first-iteration codegen costs 5-20× here)
      graft.pipeline.IvfIndex.build(spark, emb.where(col("vec_id") < nVecs / 8),
        s"$root/warm-ivf", math.ceil(math.sqrt(nVecs / 8.0)).toInt)
      val nCells = math.ceil(math.sqrt(nVecs.toDouble)).toInt
      val (_, ivfBuild) = secs(
        graft.pipeline.IvfIndex.build(spark, emb, s"$root/ivf", nCells))
      def ivfQuery(): Double = {
        val ((rows, pinned), w) = secs {
          val (df, p) = graft.pipeline.IvfIndex.topKWithHandle(
            spark, s"$root/ivf", col("vec_id") < 32)
          (df.count(), p)
        }
        pinned.foreach(_.unpersist(blocking = false))
        require(rows > 0)
        w
      }
      val ivfQ1 = ivfQuery(); val ivfQ2 = ivfQuery()

      graft.pipeline.MipsIndex.build(spark, emb.where(col("vec_id") < nVecs / 8),
        s"$root/warm-mips")
      val (mipsReport, mipsBuild) = secs(
        graft.pipeline.MipsIndex.build(spark, emb, s"$root/mips"))
      def mipsQuery(): Double = {
        val ((rows, pinned), w) = secs {
          val (df, p) = graft.pipeline.MipsIndex.topKWithHandle(
            spark, s"$root/mips", col("vec_id") < 32)
          (df.count(), p)
        }
        pinned.foreach(_.unpersist(blocking = false))
        require(rows > 0)
        w
      }
      val mipsQ1 = mipsQuery(); val mipsQ2 = mipsQuery()

      println(f"[store-probe] ivf build=$ivfBuild%.2f s query=$ivfQ1%.2f/$ivfQ2%.2f s " +
        f"(cells=$nCells); mips build=$mipsBuild%.2f s query=$mipsQ1%.2f/$mipsQ2%.2f s " +
        s"(plan=${mipsReport.plan})")
      println(s"""{"metric":"store_probe","vecs":$nVecs,"cores":$cores,""" +
        f""""ivf_build_sec":$ivfBuild%.2f,"ivf_query_sec":${math.min(ivfQ1, ivfQ2)}%.2f,""" +
        f""""mips_build_sec":$mipsBuild%.2f,"mips_query_sec":${math.min(mipsQ1, mipsQ2)}%.2f}""")
    } finally spark.stop()
  }
}
