package graft.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp
import graft.core.Rng

/** Deterministic Common-Crawl-style `pages` corpus with planted near-duplicate
  * clusters (schema from BASELINE.json input_hint; fixture design FIXTURES.md §1).
  *
  * Every page is a pure function of (seed, id): generation happens inside
  * `mapPartitions` over `spark.range(n)`, so the corpus scales to any size
  * without a driver-side materialization and is byte-identical across runs,
  * partitionings, and cluster sizes (the per-row invariant of the north rule).
  *
  * Layout: docs come in blocks of 4. Block c = cluster c:
  *   slot 0: base text of the cluster
  *   slot 1: light token mutation (word-trigram Jaccard ≈ 0.85-0.95 vs base)
  *   slot 2: heavier mutation (J ≈ 0.65-0.8 vs base, ≈0.6-0.7 vs slot 1)
  *   slot 3: independent singleton (not a duplicate of anything)
  * Planted truth: within a block, pairs among slots {0,1,2} are duplicates.
  */
object PagesGen {
  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  val VocabSize = 5000
  val ClusterSlots = 4

  private def word(idx: Int): String = "tok" + idx

  /** Zipf-ish draw: squaring the uniform skews toward low indices. */
  private def drawWord(seed: Long, j: Long): String = {
    val u = Rng.uniform0Incl(Rng.at(seed, j))
    word((u * u * VocabSize).toInt.min(VocabSize - 1))
  }

  private def baseText(seed: Long, cluster: Long, textScale: Int): Array[String] = {
    val s = Rng.derive(seed, Rng.mix64(cluster) ^ 0x42415345L /* "BASE" */ )
    val len = (150 + (Rng.at(s, -1) & 0xFF).toInt) * textScale // 150..405 words × scale
    Array.tabulate(len)(j => drawWord(s, j.toLong))
  }

  /** Substitute tokens at `rate` with fresh draws, deterministically. */
  private def mutate(words: Array[String], seed: Long, rate: Double): Array[String] = {
    val out = new Array[String](words.length)
    var j = 0
    while (j < words.length) {
      out(j) =
        if (Rng.uniform0Incl(Rng.at(seed, j.toLong)) < rate) drawWord(Rng.derive(seed, 0xA11), j.toLong)
        else words(j)
      j += 1
    }
    out
  }

  /** @param textScale multiplies document length (default 1). The probe
    *        fixtures use 10 so the text-width stages dominate the pipeline
    *        the way they do on real web pages — PagesGen's short docs
    *        under-show text-stage reuse (BENCH/BASELINE.md r3 disclosure). */
  def textFor(seed: Long, id: Long, textScale: Int = 1): String = {
    val cluster = id / ClusterSlots
    val slot = (id % ClusterSlots).toInt
    val words = slot match {
      case 0 => baseText(seed, cluster, textScale)
      case 1 => mutate(baseText(seed, cluster, textScale), Rng.derive(seed, id), 0.02)
      case 2 => mutate(baseText(seed, cluster, textScale), Rng.derive(seed, id), 0.06)
      case _ => baseText(Rng.derive(seed, 0x5149D), id, textScale) // independent singleton
    }
    words.mkString(" ")
  }

  def pageFor(seed: Long, id: Long, textScale: Int = 1): Page = {
    val text = textFor(seed, id, textScale)
    val url = s"https://site-${Rng.mix64(id) & 0xFF}.example/page-$id"
    val ts = new Timestamp(1700000000000L + (Rng.at(seed, id) & 0xFFFFFFFL))
    val lang = (Rng.at(Rng.derive(seed, 0x1A46L), id) & 15L) match {
      case 0 => "de"
      case 1 => "fr"
      case _ => "en"
    }
    Page(url, ts, ("<html><body>" + text + "</body></html>").getBytes("UTF-8"), text, lang)
  }

  /** Distributed corpus: pages(url, warc_ts, html, text, lang) + id column. */
  def pages(spark: SparkSession, n: Long, seed: Long = 0L, partitions: Int = 32,
      textScale: Int = 1): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .mapPartitions(_.map(id => (id, pageFor(seed, id, textScale))))
      .toDF("id", "page")
      .select("id", "page.*")
  }

  /** The pipeline's (id, text) corpus view. */
  def corpus(spark: SparkSession, n: Long, seed: Long = 0L, partitions: Int = 32): DataFrame =
    pages(spark, n, seed, partitions).select("id", "text")

  /** Boilerplate page text for skewed-corpus fixtures: every id renders the
    * SAME template (cluster-0-style draw, textScale× base length) with a 1%
    * per-token mutation — pairwise word-trigram Jaccard ≈ 0.85-0.95, so ALL
    * such docs collide in one giant band bucket per band (the web-scale
    * boilerplate shape: navigation chrome / legal pages / mirrors) and force
    * the census cap + salted-cell pairing path, which no plain PagesGen
    * corpus reaches (its clusters have 3 members). Deterministic in (seed, id). */
  def boilerplateText(seed: Long, id: Long, textScale: Int = 2): String = {
    val template = baseText(Rng.derive(seed, 0xB011E77EL), 0L, textScale)
    mutate(template, Rng.derive(Rng.derive(seed, 0xB011E77EL), id), 0.01).mkString(" ")
  }

  /** Planted duplicate pairs (slots {0,1,2} within a block), id_a < id_b. */
  def plantedPairs(n: Long): Seq[(Long, Long)] =
    (0L until n / ClusterSlots).flatMap { c =>
      val b = c * ClusterSlots
      Seq((b, b + 1), (b, b + 2), (b + 1, b + 2)).filter(_._2 < n)
    }
}
