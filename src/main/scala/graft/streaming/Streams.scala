package graft.streaming

import graft.exact.Rational
import graft.measurements.{AddNoise, GeometricMechanism}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (beyond the reference's batch-only
  * surface): event-time windowed aggregation with watermarks, streaming
  * dedup, sessionization, and a DP-noised streaming count.
  *
  * All transforms are `readStream`-compatible: they only use watermark +
  * window/session aggregations and `dropDuplicates`, so they run
  * incrementally with bounded state on a cluster. The same code paths work
  * on batch DataFrames (Spark's unified API), which is how the specs drive
  * them.
  */
object Streams {

  /** Configure a session for large streaming state: RocksDB state store
    * (spillable, off-heap — state no longer bounded by executor heap, the
    * prerequisite for billions of keys per executor) with changelog
    * checkpointing (per-batch delta upload instead of full snapshots) and
    * bounded block-cache memory. Returns the same session for chaining.
    */
  def configureLargeState(
      spark: org.apache.spark.sql.SparkSession,
      boundedMemoryMb: Long = 1024
  ): org.apache.spark.sql.SparkSession = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
      boundedMemoryMb.toString)
    spark
  }

  /** Tumbling/sliding event-time window counts with a watermark bounding
    * state retention.
    */
  def windowedCounts(
      stream: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      slideDuration: Option[String] = None,
      watermark: String = "10 minutes"
  ): DataFrame = {
    val withWm =
      if (stream.isStreaming) stream.withWatermark(tsCol, watermark)
      else stream
    val win = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None        => window(col(tsCol), windowDuration)
    }
    withWm
      .groupBy(win +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("count"))
      .select(
        col("window.start").as("window_start") +:
          col("window.end").as("window_end") +:
          groupCols.map(col) :+ col("count"): _*
      )
  }

  /** Exact streaming dedup on key columns; the watermark bounds the dedup
    * state (late duplicates beyond it may reappear — documented trade).
    */
  def dedupStream(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermark: String = "10 minutes"
  ): DataFrame = {
    val withWm =
      if (stream.isStreaming) stream.withWatermark(tsCol, watermark)
      else stream
    withWm.dropDuplicates(keyCols :+ tsCol)
  }

  /** Ingestion-time dedup of a stream against a STATIC reference corpus:
    * arriving documents whose content fingerprint (md5 of
    * whitespace-normalized lowercase text, [[graft.ops.TextAnalysis
    * .fingerprint]]) already occurs in `corpus` are dropped via a
    * stream-static left-anti join — STATELESS (no state store, no
    * watermark needed; Spark re-plans the static side per micro-batch, so
    * a corpus refresh is picked up on restart). Within-stream duplicates
    * are NOT collapsed here; chain [[dedupStream]] for that. Unified
    * batch/stream: on a batch frame this is a plain anti-join.
    */
  def dedupStreamAgainstCorpus(
      stream: DataFrame,
      textCol: String,
      corpus: DataFrame,
      corpusTextCol: String
  ): DataFrame = {
    val fps = graft.ops.TextAnalysis
      .fingerprint(corpus.select(col(corpusTextCol).as("__t")), "__t", "__fp")
      .select("__fp").distinct()
    graft.ops.TextAnalysis.fingerprint(stream, textCol, "__fp")
      .join(fps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Session windows per user with an inactivity gap. */
  def sessionize(
      stream: DataFrame,
      tsCol: String,
      userCol: String,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"
  ): DataFrame = {
    val withWm =
      if (stream.isStreaming) stream.withWatermark(tsCol, watermark)
      else stream
    withWm
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(userCol),
        col("events")
      )
  }

  /** Running per-key event counts via arbitrary stateful processing
    * (`mapGroupsWithState`): state survives across micro-batches with a
    * processing-time timeout bounding retention. The custom-state analog of
    * the reference's (batch-only) interactive accumulation.
    */
  def runningCounts(
      stream: DataFrame,
      keyCol: String,
      stateTimeout: Option[String] = None
  ): org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val keyIdx = stream.schema.fieldIndex(keyCol)
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val longEnc = Encoders.scalaLong
    // default NoTimeout: state is bounded by key cardinality; pass a
    // duration to evict idle keys (requires a periodic trigger in prod)
    val mode = if (stateTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout
    stream
      .groupByKey(r => String.valueOf(r.get(keyIdx)))(Encoders.STRING)
      .mapGroupsWithState[Long, (String, Long)](mode) {
        (key: String, rows: Iterator[org.apache.spark.sql.Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val total = state.getOption.getOrElse(0L)
            state.remove()
            (key, total)
          } else {
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            stateTimeout.foreach(state.setTimeoutDuration)
            (key, total)
          }
      }
  }

  /** Stream-stream inner interval join: rows pair when their keys match and
    * their event times lie within ±`within` of each other. Watermarks on
    * BOTH sides bound the join state Spark must retain (state eviction =
    * watermark − interval), which is what keeps this runnable indefinitely
    * on a cluster. Works identically on batch frames.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      keyCols: Seq[String],
      within: String = "15 minutes",
      watermark: String = "30 minutes"
  ): DataFrame = {
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct column names for an interval join")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark)
             else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark)
             else right).alias("r")
    val keyCond = keyCols
      .map(c => col(s"l.$c") === col(s"r.$c"))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val timeCond =
      col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $within") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    val joined = l.join(r, keyCond && timeCond, "inner")
    // project one copy of each key column
    val rightCols = right.columns.filterNot(keyCols.contains)
    joined.select(
      keyCols.map(c => col(s"l.$c")) ++
        left.columns.filterNot(keyCols.contains).map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c")): _*
    )
  }

  /** Windowed counts with two-sided-geometric noise applied to each emitted
    * count — each (window, group) cell is released once per trigger, so a
    * per-cell ε applies under event-level DP.
    */
  def noisyWindowedCounts(
      stream: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      alpha: Rational,
      watermark: String = "10 minutes"
  ): DataFrame =
    windowedCounts(stream, tsCol, groupCols, windowDuration, None, watermark)
      .withColumn("count", AddNoise(col("count"), GeometricMechanism(alpha)))
}
