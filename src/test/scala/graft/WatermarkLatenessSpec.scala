package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Measures the watermark accuracy/state tradeoff for the windowed
  * aggregates and turns its direction into a gate.
  *
  * A watermark is the knob that trades completeness against state: events
  * later than it are dropped from finalized windows (accuracy loss),
  * while everything younger must be retained in the state store (memory
  * cost). This suite drives [[Streams.windowedCounts]] (append mode, the
  * production finalize-once path) over a fixed arrival pattern with a
  * controlled lateness mix — every minute one on-time event plus one
  * event each arriving 2, 22 and 45 minutes late (far from the drop
  * boundaries, see the comment on `Lateness`) — at watermarks 0s, 15m
  * and 40m, and records (events counted in finalized windows, peak
  * state rows) per setting.
  *
  * Gates (direction, not exact values — the exact boundary row depends on
  * per-batch watermark propagation):
  *   - counted events are MONOTONE NONDECREASING in the watermark, and
  *     the 40m watermark loses nothing (every lateness ≤ 45m clears it
  *     once the one-batch watermark lag and window slack are added);
  *   - the 0s watermark drops most late events (< half the late mass
  *     survives);
  *   - peak state rows at 40m exceed peak state at 0s — the memory bill
  *     for the accuracy.
  * The measured sweep is recorded in STREAMING.md.
  */
class WatermarkLatenessSpec extends SharedSpark
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.concurrent.Signaler
  import org.scalatest.time.{Seconds, Span}

  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  private def guarded(body: => Unit)(
      queries: => Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit =
    try cancelAfter(Span(180, Seconds))(body)
    finally {
      val qs = try queries catch { case _: Throwable => Nil }
      qs.foreach { q =>
        val t = new Thread(() => try q.stop() catch { case _: Throwable => () })
        t.setDaemon(true)
        t.start()
        t.join(10000)
      }
    }

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

  private val epoch = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

  private def at(min: Int): java.sql.Timestamp =
    new java.sql.Timestamp(epoch + min.toLong * 60000)

  // Lateness values sit FAR from the drop boundaries: with 5-minute
  // arrival batches the watermark lags one batch (~5 min) and the 5-min
  // window adds up to 5 min of slack, so an event is dropped roughly when
  // its lateness exceeds watermark + 10. L=2 is never late enough to drop
  // at any setting; L=22 drops at watermark ≤ 14 and survives ≥ 15;
  // L=45 survives only the 40m watermark.
  private val Minutes = 60
  private val ChunkMin = 5
  private val Lateness = Seq(2, 22, 45)

  /** Events ARRIVING in minute window [10c, 10c+10): for each arrival
    * minute m, one on-time event (event_time = m) and one event per
    * lateness L (event_time = m - L, floored at 0). Kind "x" separates the
    * payload from the flush nudges.
    */
  private def chunk(c: Int): Seq[(java.sql.Timestamp, String)] =
    (c * ChunkMin until (c + 1) * ChunkMin).flatMap { m =>
      (at(m), "x") +: Lateness.map(l => (at(math.max(m - l, 0)), "x"))
    }

  /** Drive the fixed arrival pattern at one watermark setting; returns
    * (counted events in finalized windows, peak state rows). */
  private def sweep(watermark: String, tag: String): (Long, Long) = {
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = Streams.windowedCounts(
      input.toDF().toDF("event_time", "kind"), "event_time", Seq("kind"),
      "5 minutes", watermark = watermark)
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    var peak = 0L
    guarded {
      query = out.writeStream.format("memory")
        .queryName(s"wls_$tag").outputMode("append").start()
      for (c <- 0 until Minutes / ChunkMin) {
        input.addData(chunk(c))
        query.processAllAvailable()
        val rows = Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        peak = math.max(peak, rows)
      }
      // flush: a far-future event pushes the watermark past every payload
      // window so they all finalize
      input.addData((at(Minutes + 120), "flush"))
      query.processAllAvailable()
      input.addData((at(Minutes + 121), "flush"))
      query.processAllAvailable()
    }(Option(query).toSeq)
    val counted = ss.sql(s"SELECT sum(count) FROM wls_$tag WHERE kind = 'x'")
      .head().getLong(0)
    (counted, peak)
  }

  test("watermark sweep: lateness loss falls, state grows, as watermark widens") {
    val settings = Seq("0 seconds" -> "w0", "15 minutes" -> "w15",
      "40 minutes" -> "w40")
    val results = settings.map { case (wm, tag) =>
      val (counted, peak) = sweep(wm, tag)
      info(f"watermark $wm%-10s counted=$counted%4d peak_state=$peak%3d")
      (wm, counted, peak)
    }
    val total = Minutes.toLong * (1 + Lateness.size)
    val counts = results.map(_._2)
    // monotone: widening the watermark never loses MORE events
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b, s"counted events not monotone in watermark: $results")
    }
    // the 40m watermark covers every lateness in the mix: nothing dropped
    assert(counts.last == total,
      s"40m watermark should lose nothing: ${counts.last} != $total")
    // the 0s watermark keeps only the ~on-time mass (60 on-time + 60 L=2
    // + ~20 early-stream floored stragglers)
    assert(counts.head <= 150,
      s"0s watermark kept too much late mass to be a meaningful floor: $results")
    // the accuracy is paid for in state
    assert(results.last._3 > results.head._3,
      s"peak state did not grow with the watermark: $results")
  }
}
