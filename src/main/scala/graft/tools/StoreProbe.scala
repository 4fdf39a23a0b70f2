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

      // append evidence (round 6): a 1/8-size daily drop must cost O(new),
      // not the full O(n) assignment/hashing the store amortizes. Delta
      // vectors REUSE base embeddings under fresh ids so the MIPS frozen-
      // maxnorm guard passes by construction; cached untimed.
      val nDelta = nVecs / 8
      val delta = emb.where(col("vec_id") < nDelta)
        .withColumn("vec_id", col("vec_id") + nVecs).cache()
      delta.count()
      val (ivfRep, ivfAppend) = secs(
        graft.pipeline.IvfIndex.append(spark, delta, s"$root/ivf"))
      require(ivfRep.newVectors == nDelta)
      val ivfQ3 = ivfQuery() // post-append query: union read-back overhead
      val (mipsRep, mipsAppend) = secs(
        graft.pipeline.MipsIndex.append(spark, delta, s"$root/mips"))
      require(mipsRep.newVectors == nDelta)
      val mipsQ3 = mipsQuery()

      println(f"[store-probe] ivf build=$ivfBuild%.2f s query=$ivfQ1%.2f/$ivfQ2%.2f s " +
        f"(cells=$nCells); mips build=$mipsBuild%.2f s query=$mipsQ1%.2f/$mipsQ2%.2f s " +
        s"(plan=${mipsReport.plan})")
      println(f"[store-probe] append (n/8 = $nDelta new): ivf=$ivfAppend%.2f s " +
        f"(build-ratio ${ivfAppend / ivfBuild}%.2f), mips=$mipsAppend%.2f s " +
        f"(build-ratio ${mipsAppend / mipsBuild}%.2f); post-append query " +
        f"ivf=$ivfQ3%.2f s mips=$mipsQ3%.2f s")
      // per-stage walls attribute the append floor: stage millis = full
      // materialization wall of each (now concurrent) stage write
      println(s"[store-probe] append stage walls: " +
        s"ivf={${ivfRep.stages.map(s => s"${s.name}=${s.millis}ms").mkString(", ")}} " +
        s"mips={${mipsRep.stages.map(s => s"${s.name}=${s.millis}ms").mkString(", ")}}")
      println(s"""{"metric":"store_probe","vecs":$nVecs,"cores":$cores,""" +
        f""""ivf_build_sec":$ivfBuild%.2f,"ivf_query_sec":${math.min(ivfQ1, ivfQ2)}%.2f,""" +
        f""""mips_build_sec":$mipsBuild%.2f,"mips_query_sec":${math.min(mipsQ1, mipsQ2)}%.2f,""" +
        f""""ivf_append_sec":$ivfAppend%.2f,"mips_append_sec":$mipsAppend%.2f,""" +
        f""""ivf_postappend_query_sec":$ivfQ3%.2f,"mips_postappend_query_sec":$mipsQ3%.2f}""")
    } finally spark.stop()
  }
}
