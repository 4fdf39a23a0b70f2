package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The IVF assignment has two physically different forms that must pick the
  * bitwise-identical winner per vector: the FUSED narrow map
  * (graft_ivf_argmax over plan-time literal centroids — no join, no
  * exchange) and the relational crossJoin + max(struct(score, −cid))
  * groupBy fallback used above graft.ivf.fusedCellLimit cells. Equality of
  * the full operator output across both paths is the contract that lets the
  * DuckDB oracle (which replicates the relational form's arithmetic via
  * row_number) gate the fused production path. */
class IvfFusedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(): (Seq[Seq[Any]], String) = {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (df, pinned) = graft.SparkEntry.ivfTopKWithHandle(emb, col("vec_id") < 5, 23)
    val rows = df.collect().map(_.toSeq).toSeq
    val plan = df.queryExecution.optimizedPlan.toString
    pinned.foreach(_.unpersist(blocking = false))
    rows -> plan
  }

  test("fused literal-centroid assignment ≡ relational groupBy assignment") {
    val (fused, fusedPlan) = run()
    assert(fused.nonEmpty)
    assert(fusedPlan.contains("graft_ivf_argmax"),
      "default path did not take the fused assignment")
    System.setProperty("graft.ivf.fusedCellLimit", "0")
    val (relational, relationalPlan) =
      try run() finally System.clearProperty("graft.ivf.fusedCellLimit")
    assert(!relationalPlan.contains("graft_ivf_argmax"),
      "fusedCellLimit=0 did not force the relational fallback")
    // collected in the operator's own deterministic orderBy(probe_id, rnk):
    // sequence equality pins ranks AND bitwise cosines across the two paths
    assert(fused == relational)
  }
}
