package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the round-7 fingerprint fusion: IncDirs.appendStages folds the
  * vectors-stage input fingerprint into its count/extraStat aggregation via
  * StageRunner.fingerprintCols + fingerprintString. Those MUST stay
  * string-identical to the standalone inputFingerprint — fingerprint
  * formulas are invalidation-critical (a drift silently invalidates or,
  * worse, fails to invalidate checkpoint chains). */
class FingerprintFusionSpec extends AnyFunSuite {
  private lazy val spark = graft.spark.TestSpark.spark
  import spark.implicits._

  test("fused fingerprintCols ≡ standalone inputFingerprint, incl. empty input") {
    val df = Seq((1L, Seq(1L, 2L)), (2L, Seq(3L, 4L)), (7L, Seq.empty[Long]))
      .toDF("vec_id", "v")
    val (n, x) = StageRunner.fingerprintCols("vec_id", "v")
    val r = df.agg(n.as("n"), x.as("x")).first()
    assert(StageRunner.fingerprintString(r.getLong(0), r.getLong(1)) ==
      StageRunner.inputFingerprint(df, "vec_id", "v"))

    val empty = df.where(lit(false))
    val re = empty.agg(n.as("n"), x.as("x")).first()
    assert(StageRunner.fingerprintString(re.getLong(0), re.getLong(1)) ==
      StageRunner.inputFingerprint(empty, "vec_id", "v"))
    assert(StageRunner.inputFingerprint(empty, "vec_id", "v") == "0:0")
  }

  test("fingerprint is order-independent but content-sensitive") {
    val a = Seq((1L, Seq(1L)), (2L, Seq(2L))).toDF("vec_id", "v")
    val b = Seq((2L, Seq(2L)), (1L, Seq(1L))).toDF("vec_id", "v")
    val c = Seq((1L, Seq(1L)), (2L, Seq(9L))).toDF("vec_id", "v")
    assert(StageRunner.inputFingerprint(a, "vec_id", "v") ==
      StageRunner.inputFingerprint(b, "vec_id", "v"))
    assert(StageRunner.inputFingerprint(a, "vec_id", "v") !=
      StageRunner.inputFingerprint(c, "vec_id", "v"))
  }
}
