package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}
import java.util.Comparator
import graft.pipeline.{CheckpointedDedup, Dedup, DedupConfig}
import graft.testkit.PagesGen

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion. No real cluster exists in this sandbox, so (per BASELINE.md's
  * sandbox protocol) the SAME job on the SAME deterministic input runs at
  * local[8] and local[32] — N and 4N cores — and we report docs/sec at both
  * plus efficiency = (T_8 / T_32) / 4. Target ≥ 0.8.
  *
  * Protocol details that keep the comparison honest:
  *  - each parallelism level runs in a fresh SparkSession (stop + rebuild);
  *  - a warm-up pipeline runs first in every session so JIT/classloading
  *    doesn't penalize whichever level runs first;
  *  - shuffle partitions scale with cores (as a real cluster's would);
  *  - scratch stays on the disk-backed temp dir (this sandbox's tmpfs writes
  *    at ~10MB/s; see GraftSession for the measured IO pathologies);
  *  - the timed unit is the full in-memory pipeline (shingle → minhash sig →
  *    band → bucket census/cap → candidate pairs → exact-Jaccard + suffix-
  *    array LCS verify → connected components). The checkpointed variant
  *    (adds per-stage parquet write/read + manifests) is timed separately —
  *    its fixed per-stage IO is a constant that the tiny sandbox corpus
  *    over-represents ~1000× relative to a 10^12-doc run.
  *
  * Usage: runMain graft.bench.ScalingBench [nDocs] [outMd]
  */
object ScalingBench {

  private def rmrf(dir: String): Unit = {
    val p = Path.of(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
  }

  private def session(cores: Int): SparkSession =
    graft.GraftSession.get(cores, s"graft-scaling-$cores")

  /** Timed in-memory pipeline run (the scaling unit of work). */
  private def timedInMemory(spark: SparkSession, nDocs: Long, cfg: DedupConfig, cores: Int): Double = {
    val corpus = PagesGen.corpus(spark, nDocs, seed = 0L, partitions = cores * 4)
    val t0 = System.nanoTime()
    Dedup.clustersWithLcs(corpus, cfg).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Timed checkpointed run (adds per-stage parquet + manifest IO). */
  private def timedCheckpointed(spark: SparkSession, nDocs: Long, cfg: DedupConfig, cores: Int): Double = {
    val dir = Files.createTempDirectory("graft-bench").toString
    val pages = PagesGen.pages(spark, nDocs, seed = 0L, partitions = cores * 4)
    val t0 = System.nanoTime()
    CheckpointedDedup.run(spark, pages, cfg, dir)
    val secs = (System.nanoTime() - t0) / 1e9
    rmrf(dir)
    secs
  }

  final case class Level(cores: Int, inMem: Double, ckpt: Double)

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 300000L
    val outMd = if (args.length > 1) args(1) else "BENCH/BASELINE.md"
    val nLow = if (args.length > 2) args(2).toInt else 8
    val nHigh = if (args.length > 3) args(3).toInt else 32
    // measured reps per variant: min-of-reps. 1 is defensible at 2/8 cores
    // (walls stable ±10% there, BENCH/BASELINE.md round-2 evidence) and
    // halves a multi-hour headline run; 32-core levels need ≥2.
    val reps = if (args.length > 4) args(4).toInt else 2
    val cfg = DedupConfig(seed = 42L)

    def levelRun(cores: Int): Level = {
      val spark = session(cores)
      try {
        // warm-up until steady state: JIT of generated code dominates first
        // iterations in this JVM (measured: 5-20× on iteration 1)
        timedInMemory(spark, nDocs / 8, cfg, cores)
        timedInMemory(spark, nDocs / 8, cfg, cores)
        val inMem = (1 to reps).map(_ => timedInMemory(spark, nDocs, cfg, cores)).min
        val ckpt = (1 to reps).map(_ => timedCheckpointed(spark, nDocs, cfg, cores)).min
        Level(cores, inMem, ckpt)
      } finally spark.stop()
    }

    val factor = nHigh.toDouble / nLow
    val l8 = levelRun(nLow)
    val l32 = levelRun(nHigh)
    val eff = (l8.inMem / l32.inMem) / factor
    val effCkpt = (l8.ckpt / l32.ckpt) / factor

    val md =
      s"""# BENCH — scaling evidence (generated ${java.time.Instant.now()})
         |
         |End-to-end near-dup pipeline (shingle → minhash signature → band →
         |bucket census/cap → candidate pairs → exact-Jaccard + suffix-array LCS
         |verify → connected components) on the deterministic PagesGen corpus
         |($nDocs docs, seed 0; config k=${cfg.numHashes}, b=${cfg.bands}, r=${cfg.rowsPerBand},
         |threshold=${cfg.threshold}; ~${3 * nDocs / 4} docs in planted dup clusters).
         |
         |Sandbox protocol (no real cluster, per BASELINE.md): identical job +
         |input at local[$nLow] (N) vs local[$nHigh] (4N); efficiency = (T_N / T_4N) / 4;
         |fresh session per level, per-session warm-up, shuffle partitions scale
         |with cores, RAM-backed scratch (the sandbox's single shared disk does
         |not scale with cores the way a real cluster's per-executor disks do).
         |
         |## In-memory pipeline (scaling unit of work)
         |
         || parallelism | wall (s) | docs/sec |
         ||---|---|---|
         || local[$nLow]  (N)  | ${f"${l8.inMem}%.2f"}  | ${f"${nDocs / l8.inMem}%.0f"} |
         || local[$nHigh] (4N) | ${f"${l32.inMem}%.2f"} | ${f"${nDocs / l32.inMem}%.0f"} |
         |
         |**Scaling efficiency (N→4N): ${f"$eff%.3f"}** (target ≥ 0.8)
         |
         |## Checkpointed pipeline (adds per-stage parquet/manifest IO)
         |
         || parallelism | wall (s) | docs/sec |
         ||---|---|---|
         || local[$nLow]  (N)  | ${f"${l8.ckpt}%.2f"}  | ${f"${nDocs / l8.ckpt}%.0f"} |
         || local[$nHigh] (4N) | ${f"${l32.ckpt}%.2f"} | ${f"${nDocs / l32.ckpt}%.0f"} |
         |
         |Checkpointed efficiency: ${f"$effCkpt%.3f"}. The gap vs in-memory is
         |fixed per-stage job/IO latency (~seconds per stage), which at 10^12
         |docs is amortized to noise but at sandbox scale is a visible constant.
         |""".stripMargin
    Files.createDirectories(Path.of(outMd).toAbsolutePath.getParent)
    Files.writeString(Path.of(outMd), md)
    println(s"""{"metric":"scaling_efficiency","value":${f"$eff%.4f"},"unit":"ratio","docs":$nDocs,"cores":[$nLow,$nHigh],"t8_sec":${f"${l8.inMem}%.2f"},"t32_sec":${f"${l32.inMem}%.2f"},"docs_per_sec_8":${f"${nDocs / l8.inMem}%.1f"},"docs_per_sec_32":${f"${nDocs / l32.inMem}%.1f"},"ckpt_efficiency":${f"$effCkpt%.4f"}}""")
  }
}
