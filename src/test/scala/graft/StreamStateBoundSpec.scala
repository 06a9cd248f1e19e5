package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Turns the "watermark-bounded state" scaladoc claim into a gate: drive
  * dedupStream and intervalJoin through real micro-batches at a CONSTANT
  * event rate while extending the stream duration 10× (so total input and
  * total keyspace grow 10×, the rate does not), and assert via the
  * StreamingQueryProgress state-operator metrics that peak state rows
  * track the watermark horizon — near-flat across the 10× — rather than
  * the input size. A state store that leaked evicted keys (or a watermark
  * that silently stopped propagating) fails this suite long before it
  * OOMs a cluster. Measured curves are recorded in SCALING.md.
  */
class StreamStateBoundSpec extends SharedSpark
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.concurrent.Signaler
  import org.scalatest.time.{Seconds, Span}

  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  private def guarded(body: => Unit)(
      queries: => Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit =
    try cancelAfter(Span(300, Seconds))(body)
    finally {
      val qs = try queries catch { case _: Throwable => Nil }
      qs.foreach { q =>
        val t = new Thread(() => try q.stop() catch { case _: Throwable => () })
        t.setDaemon(true)
        t.start()
        t.join(10000)
      }
    }

  /** Same session shape as StreamingSpec: RocksDB provider, serialized
    * checkpoint writers (sandbox-local chmod-fork deadlock workaround). */
  private lazy val ss: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "1")
    s.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

  /** minutes → Timestamp relative to the stream epoch. */
  private def at(min: Double): java.sql.Timestamp =
    new java.sql.Timestamp(base + (min * 60000).toLong)

  private val RatePerMin = 200 // constant across scales — only DURATION grows
  private val ChunkMin = 10 // one micro-batch covers 10 minutes of events

  /** Events of one chunk: ids are globally unique (the keyspace grows with
    * the stream), timestamps advance uniformly inside the chunk. */
  private def chunk(c: Int): Seq[(java.sql.Timestamp, Long)] =
    (0 until RatePerMin * ChunkMin).map { i =>
      val id = c.toLong * RatePerMin * ChunkMin + i
      (at(c * ChunkMin + i.toDouble / RatePerMin), id)
    }

  /** (inputRows, peakStateRows, lastBatchStateRows) over `chunks`
    * micro-batches of `makeQuery`'s stream. */
  private def driveDedup(chunks: Int): (Long, Long, Long) = {
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val out = Streams.dedupStream(
      input.toDF().toDF("event_time", "id"), "event_time", Seq("id"),
      watermark = "10 minutes")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    var peak = 0L; var last = 0L
    guarded {
      query = out.writeStream.format("memory")
        .queryName(s"ssb_dedup_$chunks").outputMode("append").start()
      for (c <- 0 until chunks) {
        input.addData(chunk(c))
        query.processAllAvailable()
        val rows = Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        peak = math.max(peak, rows); last = rows
      }
    }(Option(query).toSeq)
    (chunks.toLong * RatePerMin * ChunkMin, peak, last)
  }

  private def driveJoin(chunks: Int): (Long, Long, Long) = {
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df0 = input.toDF().toDF("ts0", "id")
    val l = df0.select(col("ts0").as("l_ts"), col("id"),
      (col("id") % 16).as("k"))
    val r = df0.filter(col("id") % 5 === 0)
      .select(col("ts0").as("r_ts"), col("id").as("r_id"),
        (col("id") % 16).as("k"))
    val out = Streams.intervalJoin(l, r, "l_ts", "r_ts", Seq("k"),
      within = "2 minutes", watermark = "10 minutes")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    var peak = 0L; var last = 0L
    guarded {
      query = out.writeStream.format("memory")
        .queryName(s"ssb_join_$chunks").outputMode("append").start()
      for (c <- 0 until chunks) {
        input.addData(chunk(c))
        query.processAllAvailable()
        val rows = Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        peak = math.max(peak, rows); last = rows
      }
    }(Option(query).toSeq)
    (chunks.toLong * RatePerMin * ChunkMin, peak, last)
  }

  test("dedupStream state tracks the watermark horizon, not input size") {
    val (in1, peak1, last1) = driveDedup(4)
    val (in10, peak10, last10) = driveDedup(40)
    info(s"dedup 1x: input=$in1 peak_state=$peak1 last=$last1")
    info(s"dedup 10x: input=$in10 peak_state=$peak10 last=$last10")
    assert(in10 === in1 * 10)
    // flat across the 10x: rate x watermark bounds state, duration doesn't
    assert(peak10 <= peak1 * 2,
      s"state grew with input (peak $peak1 -> $peak10): watermark eviction broken")
    // and far below total input
    assert(peak10 * 5 <= in10,
      s"peak state $peak10 is not small vs input $in10")
    // sanity: state is real (at least one watermark window's worth)
    assert(peak10 >= RatePerMin * 10)
  }

  test("intervalJoin two-sided state tracks the watermark horizon") {
    val (in1, peak1, last1) = driveJoin(4)
    val (in10, peak10, last10) = driveJoin(40)
    info(s"join 1x: input=$in1 peak_state=$peak1 last=$last1")
    info(s"join 10x: input=$in10 peak_state=$peak10 last=$last10")
    assert(peak10 <= peak1 * 2,
      s"join state grew with input (peak $peak1 -> $peak10)")
    assert(peak10 * 5 <= in10,
      s"peak join state $peak10 is not small vs input $in10")
    assert(peak10 >= RatePerMin * 10)
  }
}
