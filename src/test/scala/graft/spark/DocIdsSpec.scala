package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.DocIds

/** 64-bit id birthday-collision resolution (VERDICT round 1, What's wrong #5):
  * two distinct urls whose primary hash lane collides must still receive
  * distinct ids, deterministically. */
class DocIdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pages(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"https://example.org/p$i", s"text $i")).toDF("url", "text")
  }

  test("colliding primary lanes are rehashed to distinct ids") {
    // force heavy collisions: primary id = url hash mod 8 over 100 urls
    val df = DocIds.assign(pages(100), pmod(xxhash64(col("url")), lit(8)))
    assert(df.count() == 100)
    assert(df.select("id").distinct().count() == 100)
  }

  test("ids are deterministic and partitioning-independent") {
    val a = DocIds.assign(pages(100).repartition(7), pmod(xxhash64(col("url")), lit(16)))
      .select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = DocIds.assign(pages(100).repartition(3), pmod(xxhash64(col("url")), lit(16)))
      .select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("non-colliding inputs keep their primary lane untouched") {
    val df = DocIds.assign(pages(50))
    val direct = pages(50).withColumn("id", DocIds.primaryHash(col("url")))
      .select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct)
  }

  test("duplicate urls (repeat crawls) collapse to one row") {
    val df = DocIds.assign(pages(20).union(pages(5)))
    assert(df.count() == 20)
    assert(df.select("id").distinct().count() == 20)
  }
}
