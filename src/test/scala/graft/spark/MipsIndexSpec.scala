package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{MipsIndex, SignAlshRetrieval}
import graft.pipeline.SignAlshRetrieval.MipsPlan
import graft.sources.TableIO

/** The checkpointed MIPS index store: a store query must return exactly
  * what the in-memory operator returns over the same vectors and plan (the
  * Q-transform needs no maxnorm, so probe bits against the store are the
  * build-time bits), resume must recompute nothing, a plan change must
  * invalidate only the bits stage, and partial stores fail fast. */
class MipsIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private val plan = MipsPlan(3, 16, 6)

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-mips-store").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("store query ≡ in-memory query; resume recomputes nothing") {
    val dir = tmpDir()
    val r1 = MipsIndex.build(spark, emb, dir, Some(plan))
    assert(r1.recomputedStages == Seq("vectors", "bits"))
    assert(r1.plan == plan)

    val (store, pinned) = MipsIndex.topKWithHandle(spark, dir, col("vec_id") < 5, k = 10)
    val fromStore = try store.collect().map(_.toSeq).toSeq
      finally pinned.foreach(_.unpersist(blocking = false))
    val e = emb.select(col("vec_id"), GraftFunctions.quantize(col("embedding")).as("v"))
    spark.catalog.clearCache()
    val fromMem = SignAlshRetrieval.topK(e, plan, col("vec_id") < 5, 10)
      .collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(fromStore.nonEmpty)
    assert(fromStore.toSet == fromMem.toSet)

    val snaps = Seq("vectors", "bits").map(n =>
      TableIO.readManifest(s"$dir/$n").get.snapshotId)
    val r2 = MipsIndex.build(spark, emb, dir, Some(plan))
    assert(r2.recomputedStages.isEmpty)
    assert(Seq("vectors", "bits").map(n =>
      TableIO.readManifest(s"$dir/$n").get.snapshotId) == snaps)
  }

  test("a plan change invalidates only the bits stage; default plan comes from planFor") {
    val dir = tmpDir()
    MipsIndex.build(spark, emb, dir, Some(plan))
    val vecSnap = TableIO.readManifest(s"$dir/vectors").get.snapshotId
    val r = MipsIndex.build(spark, emb, dir, Some(MipsPlan(2, 16, 5)))
    assert(r.recomputedStages == Seq("bits"))
    assert(TableIO.readManifest(s"$dir/vectors").get.snapshotId == vecSnap)
    // no-plan build derives planFor(n) from the vectors manifest row count
    val r2 = MipsIndex.build(spark, emb, dir, None)
    assert(r2.plan == SignAlshRetrieval.planFor(emb.count()))
  }

  test("missing stage and broken hash chain fail fast") {
    val dir = tmpDir()
    val ex = intercept[IllegalStateException] {
      MipsIndex.topKWithHandle(spark, dir, col("vec_id") < 5)
    }
    assert(ex.getMessage.contains("no manifest"))

    MipsIndex.build(spark, emb, dir, Some(plan))
    val bDir = s"$dir/bits"
    val m = TableIO.readManifest(bDir).get
    val src = TableIO.read(spark, bDir)
    // materialized to driver rows first: writing a stage from its own lazy
    // read would overwrite the path mid-scan
    val copy = spark.createDataFrame(
      java.util.Arrays.asList(src.collect(): _*), src.schema)
    TableIO.write(copy, bDir, "bits", "deadbeef", 0L, m.extra)
    val ex2 = intercept[IllegalArgumentException] {
      MipsIndex.topKWithHandle(spark, dir, col("vec_id") < 5)
    }
    assert(ex2.getMessage.contains("hash chain broken"))
    spark.catalog.clearCache()
  }
}
