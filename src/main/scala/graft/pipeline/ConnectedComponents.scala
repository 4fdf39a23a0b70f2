package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components as iterative DataFrame joins — the
  * "union-find over GraphFrames-style iterative DataFrame joins" the north
  * rule demands (no GraphFrames jar in this environment, and Catalyst has no
  * fixpoint operator, so the driver loop IS the idiomatic Spark form).
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with itself;
  * each round every vertex takes the min label over itself and its neighbors;
  * stop at fixpoint. Converges in O(component diameter) rounds — near-dup
  * clusters are shallow (most pages link through one near-exact template), so
  * a handful of rounds suffices even at 10^12 docs. Each round is one shuffle
  * (join by vertex) + one aggregation; `localCheckpoint` truncates the plan
  * lineage so round N doesn't recompute rounds 1..N−1.
  *
  * Determinism: labels are mins over Long ids — independent of partitioning
  * and cluster size, so cluster ids are stable across runs and parallelism
  * levels (required by the determinism tests, SURVEY.md §5).
  */
object ConnectedComponents {

  /** @param vertices single column `id` (may include isolated vertices)
    * @param edges columns `id_a`, `id_b`
    * @return (id, cluster_id) with cluster_id = min id of the component
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = vertices.sparkSession.sparkContext

    // localCheckpoint persists an internal RDD that outlives the returned
    // DataFrame; without explicit release every CC run leaks blocks into the
    // block manager for the session's lifetime. Track the persisted RDD ids
    // via the context registry and drop superseded iterations eagerly.
    def checkpointTracked(df: DataFrame): (DataFrame, Seq[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager = true)
      val added = sc.getPersistentRDDs.keysIterator.filterNot(before).toSeq
      (out, added)
    }
    def release(ids: Seq[Int]): Unit = {
      val reg = sc.getPersistentRDDs
      ids.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
    }

    // Symmetrize once; propagation then only needs one direction per round.
    val (sym, symIds) = checkpointTracked(
      edges
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"))))

    var (labels, labelIds) = checkpointTracked(
      vertices.select(col("id"), col("id").as("cluster_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // label(v) ← min(label(v), min over neighbors u of label(u));
      // one checkpoint materializes both the new labels and the old ones so
      // the convergence probe re-reads cached blocks instead of recomputing
      val fromNeighbors = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("cluster_id").as("nb_min"))
      val (next, nextIds) = checkpointTracked(
        labels
          .join(fromNeighbors, Seq("id"), "left")
          .select(
            col("id"),
            col("cluster_id").as("old"),
            least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id")))
      val changed = next.where(col("cluster_id") =!= col("old")).limit(1).count()
      converged = changed == 0
      iter += 1
      release(labelIds)
      labels = next.select("id", "cluster_id")
      labelIds = nextIds
    }
    release(symIds)
    labels
  }
}
