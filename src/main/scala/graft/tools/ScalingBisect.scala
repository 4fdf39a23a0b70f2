package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{ConnectedComponents, Dedup, DedupConfig}
import graft.testkit.PagesGen

/** Bisects scaling: times isolated pipeline phases at a given core count,
  * TWICE (reporting both passes; pass 2 is warm/steady-state).
  * Usage: runMain graft.tools.ScalingBisect <cores> <nDocs>
  */
object ScalingBisect {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val shufflePartitions = if (args.length > 2) args(2).toInt else cores * 2
    val compress = if (args.length > 3) args(3).toBoolean else true
    val spark = graft.GraftSession.builder(cores)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.shuffle.compress", compress.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig(seed = 42L)

    for (pass <- 1 to 2) {
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[bisect] pass=$pass cores=$cores%2d $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      }

      val corpus = PagesGen.corpus(spark, nDocs, 0L, cores * 4)
      time("gen_only")(corpus.count())

      val sigsC = Dedup.signatures(corpus, cfg).cache()
      time("shingle_sig_cached")(sigsC.count())

      val bands = Dedup.bands(sigsC, cfg)
      val cands = Dedup.candidates(bands, cfg).cache()
      time("bands_candidates")(cands.count())

      val verified = Dedup.verify(cands, sigsC.select("id", "shingles"), cfg).cache()
      time("verify_jaccard")(verified.count())

      // same verify but reading recomputed (uncached) shingles — isolates
      // InMemoryRelation reader contention from the join+kernel cost
      time("verify_nocache") {
        Dedup.verify(cands, Dedup.signatures(corpus, cfg).select("id", "shingles"), cfg).count()
      }

      val lcsUdf = udf((a: String, b: String) => graft.core.SuffixArray.lcsLength(a, b))
      time("lcs_pass") {
        verified
          .join(corpus.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
          .join(corpus.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
          .select(lcsUdf(col("text_a"), col("text_b")).as("l"))
          .agg(count(lit(1))).first().getLong(0)
      }

      time("connected_components") {
        ConnectedComponents.run(corpus.select("id"), verified.select("id_a", "id_b")).count()
      }

      sigsC.unpersist(); cands.unpersist(); verified.unpersist()
    }
    spark.stop()
  }
}
