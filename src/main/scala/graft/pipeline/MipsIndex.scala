package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO

/** Checkpointed SignALSH MIPS index — the persisted form of the hash-table
  * relation [[SignAlshRetrieval.corpusBits]] builds (O(n·T) packed longs;
  * at planFor(10⁹)'s 143 tables that projection is the index, and
  * recomputing it per query re-pays the full P-transform hashing pass).
  * Same store contract as [[IvfIndex]]: TableIO manifest stages with
  * chained config hashes — build-once/query-many, resume recomputes
  * nothing, a banding-plan change invalidates only the bits stage (the
  * quantized vectors stay valid), a partial or mixed-generation store
  * fails fast. Queries hash ONLY their probe rows (the Q-transform needs
  * no maxnorm, so probe bits computed against the store are bitwise the
  * ones the build-time path computes — pinned by MipsIndexSpec equality).
  */
object MipsIndex {
  import SignAlshRetrieval.MipsPlan

  final case class BuildReport(
      stages: Seq[CheckpointedDedup.StageResult], vectors: Long, plan: MipsPlan) {
    def recomputedStages: Seq[String] = stages.filter(_.recomputed).map(_.name)
  }

  private val StageNames = Seq("vectors", "bits")

  private def planSalt(p: MipsPlan): String =
    s"${p.tables}:${p.planesPerTable}:${p.bucketBits}"

  private def bitsHash(h0: String, plan: MipsPlan): String =
    CheckpointedDedup.chainHash(h0, "mips_bits", planSalt(plan))

  /** Build (or resume) the index store at baseDir from a
    * (vec_id, embedding: array<float>) relation. The banding plan defaults
    * to [[SignAlshRetrieval.planFor]] over the corpus row count (taken from
    * the vectors-stage manifest — no extra job). */
  def build(
      spark: SparkSession, emb: DataFrame, baseDir: String,
      plan: Option[MipsPlan] = None): BuildReport = {
    graft.functions.GraftExpressions.register(spark)
    val runner = new StageRunner(spark, baseDir)
    val h0 = CheckpointedDedup.chainHash("root", "mips_vectors",
      s"v1:${StageRunner.inputFingerprint(emb, "vec_id", "embedding")}")
    val vectorsStage = runner.stage("vectors", h0) { IvfIndex.quantized(emb) }
    val nVecs = TableIO.readManifest(s"$baseDir/vectors").map(_.rows).getOrElse(0L)
    val p = plan.getOrElse(SignAlshRetrieval.planFor(nVecs))
    runner.stage("bits", bitsHash(h0, p), Map(
      "tables" -> p.tables.toString,
      "planesPerTable" -> p.planesPerTable.toString,
      "bucketBits" -> p.bucketBits.toString)) {
      SignAlshRetrieval.corpusBits(vectorsStage.df, p)
    }
    runner.writeBasicMetrics()
    BuildReport(runner.stages.toSeq, nVecs, p)
  }

  /** Top-k MIPS for every stored vector matching probeFilter — from the
    * checkpoints alone: the corpus is never re-hashed; only the probe rows
    * pay the Q-transform. */
  def topKWithHandle(
      spark: SparkSession, baseDir: String, probeFilter: Column,
      k: Int = 10): (DataFrame, Seq[DataFrame]) = {
    graft.functions.GraftExpressions.register(spark)
    // fail fast on a missing/partial/mixed-generation store (the IvfIndex
    // validation posture): both manifests must exist, the bits stage must
    // carry its plan tags, and the stored bits hash must chain off the
    // CURRENT vectors hash for exactly that plan
    val manifests = StageNames.map { n =>
      n -> TableIO.readManifest(s"$baseDir/$n").getOrElse(
        throw new IllegalStateException(
          s"MIPS store at $baseDir is incomplete: stage '$n' has no manifest " +
            s"(crashed or never-finished build) — re-run MipsIndex.build"))
    }.toMap
    val extra = manifests("bits").extra
    val p = MipsPlan(
      tables = extra.getOrElse("tables", missingTag(baseDir, "tables")).toInt,
      planesPerTable = extra.getOrElse("planesPerTable", missingTag(baseDir, "planesPerTable")).toInt,
      bucketBits = extra.getOrElse("bucketBits", missingTag(baseDir, "bucketBits")).toInt)
    require(manifests("bits").configHash == bitsHash(manifests("vectors").configHash, p),
      s"MIPS store at $baseDir: the bits stage was written for a different " +
        s"input/plan than the current vectors stage (hash chain broken) — " +
        s"re-run MipsIndex.build")
    val vectors = TableIO.read(spark, s"$baseDir/vectors")
    // the bits read-back feeds two plan branches (bucket join + rerank)
    val corpus = TableIO.read(spark, s"$baseDir/bits").cache()
    val probes = SignAlshRetrieval.probeBits(vectors, p, probeFilter)
    val (out, pinned) = SignAlshRetrieval.bucketRank(corpus, probes, p, k)
    (out, corpus +: pinned)
  }

  private def missingTag(baseDir: String, tag: String): Nothing =
    throw new IllegalStateException(
      s"MIPS store at $baseDir: bits manifest lacks the '$tag' plan tag")
}
