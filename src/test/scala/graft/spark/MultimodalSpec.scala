package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("metadata extraction: schema and values") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val meta = Multimodal.metadata(media.toDF())
    assert(meta.schema.fieldNames.toSeq == Seq("id", "kind", "n_bytes", "magic"))
    val row = meta.orderBy("id").first()
    assert(row.getLong(2) > 0)
    assert(row.getString(3).length == 8)
  }

  test("feature extraction preserves rows, is deterministic, has fixed batch shape") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val f1 = Multimodal.extractFeatures(media, targetSide = 4).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media.repartition(7), targetSide = 4).collect().sortBy(_.id)
    assert(f1.length == media.count())
    assert(f1.forall(f => f.features.length == 16 && f.width == 4 && f.height == 4))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.id == b.id && a.features.sameElements(b.features)
    }) // partitioning-independent
    assert(f1.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("metadata-only plans don't depend on decode (no UDF in plan)") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val plan = Multimodal.metadata(media.toDF()).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("mappartitions"))
  }
}
