package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.IvfIndex
import graft.sources.TableIO

/** The checkpointed IVF index store: build-once/query-many must return
  * exactly what the in-memory operator returns, a rebuild over unchanged
  * input+config must recompute NOTHING, an nCells change must invalidate
  * only centroids+assignment (the quantized vectors stage — typically the
  * bulk of the bytes — stays valid), an input change must invalidate the
  * whole chain, and a partial/mixed-generation store must fail fast. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivf-store").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("store query ≡ in-memory query; resume recomputes nothing") {
    val dir = tmpDir()
    val r1 = IvfIndex.build(spark, emb, dir, nCells = 23)
    assert(r1.recomputedStages == Seq("vectors", "centroids", "assignment"))
    assert(r1.vectors == emb.count())

    val (store, pinned) = IvfIndex.topKWithHandle(spark, dir, col("vec_id") < 5)
    val fromStore = try collect(store)
      finally pinned.foreach(_.unpersist(blocking = false))
    val (mem, memPinned) = graft.SparkEntry.ivfTopKWithHandle(emb, col("vec_id") < 5, 23)
    val fromMem = try collect(mem)
      finally memPinned.foreach(_.unpersist(blocking = false))
    assert(fromStore.nonEmpty)
    assert(fromStore == fromMem)

    // resume: same input, same nCells → all three manifests keep their
    // snapshot ids (nothing recomputed, nothing rewritten)
    val snaps = Seq("vectors", "centroids", "assignment")
      .map(n => TableIO.readManifest(s"$dir/$n").get.snapshotId)
    val r2 = IvfIndex.build(spark, emb, dir, nCells = 23)
    assert(r2.recomputedStages.isEmpty)
    val snaps2 = Seq("vectors", "centroids", "assignment")
      .map(n => TableIO.readManifest(s"$dir/$n").get.snapshotId)
    assert(snaps == snaps2)
  }

  test("nCells change invalidates centroids+assignment but not vectors") {
    val dir = tmpDir()
    IvfIndex.build(spark, emb, dir, nCells = 23)
    val vecSnap = TableIO.readManifest(s"$dir/vectors").get.snapshotId
    val r = IvfIndex.build(spark, emb, dir, nCells = 11)
    assert(r.recomputedStages == Seq("centroids", "assignment"))
    assert(TableIO.readManifest(s"$dir/vectors").get.snapshotId == vecSnap)
    // and the store still queries consistently under the new config
    val (df, pinned) = IvfIndex.topKWithHandle(spark, dir, col("vec_id") < 3)
    try assert(df.count() > 0L)
    finally pinned.foreach(_.unpersist(blocking = false))
  }

  test("input change invalidates the whole chain") {
    val dir = tmpDir()
    IvfIndex.build(spark, emb, dir, nCells = 23)
    val r = IvfIndex.build(spark, emb.where(col("vec_id") < 400), dir, nCells = 23)
    assert(r.recomputedStages == Seq("vectors", "centroids", "assignment"))
  }

  test("missing stage and broken hash chain fail fast") {
    val dir = tmpDir()
    val ex = intercept[IllegalStateException] {
      IvfIndex.topKWithHandle(spark, dir, col("vec_id") < 5)
    }
    assert(ex.getMessage.contains("no manifest"))

    IvfIndex.build(spark, emb, dir, nCells = 23)
    // simulate a mixed-generation store: the assignment stage rewritten
    // under some other chain (here: just a wrong stored hash). The data is
    // materialized to driver rows first — writing a stage from its own lazy
    // read would overwrite the path mid-scan.
    val aDir = s"$dir/assignment"
    val m = TableIO.readManifest(aDir).get
    val src = TableIO.read(spark, aDir)
    val copy = spark.createDataFrame(
      java.util.Arrays.asList(src.collect(): _*), src.schema)
    TableIO.write(copy, aDir, "assignment", "deadbeef", 0L, m.extra)
    val ex2 = intercept[IllegalArgumentException] {
      IvfIndex.topKWithHandle(spark, dir, col("vec_id") < 5)
    }
    assert(ex2.getMessage.contains("hash chain broken"))
  }
}
