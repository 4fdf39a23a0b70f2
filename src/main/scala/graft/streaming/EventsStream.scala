package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming path of the engine.
  *
  * The reference is batch-only (no stream abstraction anywhere — SURVEY.md
  * §1.1), so this module exists for engine completeness: the same windowed
  * aggregation semantics a training-data pipeline needs for event telemetry,
  * expressed as readStream → watermark → window → writeStream. At scale the
  * source would be Kafka/file-arrival; here the parquet file-source drives it.
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming windowed aggregation: hourly counts + value sums per type,
    * 2-hour watermark for late data. */
  def windowedCounts(spark: SparkSession, eventsGlob: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(eventsGlob)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Batch-equivalent of [[windowedCounts]] (the oracle for tests). */
  def batchEquivalent(spark: SparkSession, eventsGlob: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(eventsGlob)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Drain the stream once (AvailableNow-style) into an in-memory table and
    * return it. Complete mode: window aggregates without emit-on-watermark. */
  def runOnce(spark: SparkSession, eventsGlob: String, name: String = "events_stream"): DataFrame = {
    val q = windowedCounts(spark, eventsGlob).writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
