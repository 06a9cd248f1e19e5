package graft.examples

import graft.exact.Rational
import graft.streaming.Streams
import org.apache.spark.sql.streaming.Trigger

/** Differentially private counts over a real micro-batch stream: hourly
  * windowed event counts per event type with two-sided-geometric noise on
  * each released cell, state bounded by a watermark.
  *
  * The events table is staged as a multi-file directory and streamed two
  * files per trigger, so the aggregation genuinely accumulates state
  * across micro-batches (RocksDB state store — the
  * [[graft.streaming.Streams.configureLargeState]] production
  * configuration) before the noisy release. `Trigger.AvailableNow` drains the staged source and
  * stops; a live deployment would use the same code with a real source
  * and a processing-time trigger.
  *
  * alpha = e^(-ε) for a per-cell ε under event-level DP; alpha = 4/5 here
  * (~ε = 0.22 per released cell per trigger). See STREAMING.md for the
  * watermark accuracy/state tradeoff and recovery guarantees.
  */
object StreamingNoisyCountsExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleEnv.session("streaming-noisy-counts-example")
    Streams.configureLargeState(spark, boundedMemoryMb = 256)
    val dir = ExampleEnv.dataDir(args)

    // stage the batch table as an 8-file directory the file source can
    // stream incrementally (2 files per trigger -> 4 micro-batches)
    val staged = java.nio.file.Files
      .createTempDirectory("graft_example_stream").toString
    // event-time watermarks require TIMESTAMP (with local timezone); the
    // fixture stores ts as TIMESTAMP_NTZ, so cast once while staging
    val events = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    events.repartition(8).write.mode("overwrite").parquet(s"$staged/src")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(s"$staged/src")

    val noisy = Streams.noisyWindowedCounts(
      stream, "ts", Seq("event_type"), "1 hour",
      alpha = Rational(4, 5), watermark = "2 hours")

    val query = noisy.writeStream
      .format("memory")
      .queryName("noisy_hourly")
      .outputMode("complete")
      .option("checkpointLocation", s"$staged/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    println("noisy hourly counts per event type (first 20 windows):")
    spark.sql(
      "SELECT * FROM noisy_hourly ORDER BY window_start, event_type")
      .show(20, truncate = false)

    spark.stop()
  }
}
