package graft.tools

import org.apache.spark.sql.functions._

/** Round-7 equivalence evidence for the q_join_agg restructure
  * (aggregate-before-join replacing the joined countDistinct form): runs
  * BOTH formulations over the given sf dir and diffs the result sets. The
  * small SFs are oracle-gated anyway; this check extends the proof to
  * sf0.1, where the driver benches but does not oracle.
  * Usage: runMain graft.tools.JoinAggCheck [sfDir]
  */
object JoinAggCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.plain(16, "joinagg-check")
    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val c = tbl("customer"); val o = tbl("orders"); val l = tbl("lineitem")
    // the pre-round-7 formulation, verbatim
    val old = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c.select("c_custkey", "c_mktsegment").hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val neu = graft.SparkEntry.queries("q_join_agg")(spark, dir)
    val d1 = old.exceptAll(neu).count()
    val d2 = neu.exceptAll(old).count()
    println(s"[joinagg-check] $dir: old\\new=$d1 new\\old=$d2 " +
      (if (d1 == 0 && d2 == 0) "IDENTICAL" else "DIVERGED"))
    // Bitwise dump + rounding-margin evidence for the DuckDB cross-check
    // (r7 review finding #1: the pre-aggregation changes the double-sum
    // association order, so round(,2) parity with the oracle must be
    // shown to have margin, not just hold by luck). `rev_raw` is the
    // UNROUNDED segment sum; its distance to the nearest .005 boundary is
    // the margin an association reorder would have to cross to fork the
    // rounded value.
    val unrounded = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c.select("c_custkey", "c_mktsegment").hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_raw"))
      .orderBy("c_mktsegment")
    unrounded.collect().foreach { r =>
      val v = r.getDouble(1)
      val cents5 = v / 0.005
      val margin = math.abs(cents5 - math.rint(cents5)) * 0.005
      println(f"[joinagg-check] seg=${r.getString(0)} rev_raw=$v%.6f " +
        f"bits=${java.lang.Double.doubleToLongBits(v)}%016x " +
        f"margin_to_.005=$margin%.6f")
    }
    neu.collect().foreach { r =>
      println(f"[joinagg-check] seg=${r.getString(0)} n_orders=${r.getLong(1)} " +
        f"revenue=${r.getDouble(2)} bits=${java.lang.Double.doubleToLongBits(r.getDouble(2))}%016x")
    }
    spark.stop()
    if (d1 != 0 || d2 != 0) sys.exit(1)
  }
}
