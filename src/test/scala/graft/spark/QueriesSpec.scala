package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Guard: every SparkEntry query runs and returns rows on the smoke tables,
  * every oracle key has a query, and the flagship entry is non-empty. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = graft.SparkEntry.oracleSql.keySet.diff(graft.SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }
}
