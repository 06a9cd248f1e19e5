package graft.tools

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Streaming soak: a sustained-rate run (default 60 min) through the two
  * stateful flagship transforms — [[Streams.dedupStream]] (dropDuplicates
  * state) and [[Streams.sessionize]] (session-window state) — on the
  * RocksDB state store with changelog checkpointing, tracking per-batch
  * latency and on-disk checkpoint size over time. The question a soak
  * answers that the recovery/lateness gates cannot: does steady state
  * actually PLATEAU, or do state files / batch durations creep until a
  * multi-day run falls over (compaction debt, changelog accumulation,
  * watermark lag)?
  *
  * Workload shape (rate source, default 2000 rows/s):
  *  - dedup: key = value/2 (a steady 50% duplicate stream), 10-minute
  *    watermark, so dedup state turns over continuously at ~rate·600/2
  *    live keys — the state-churn regime where RocksDB compaction and
  *    changelog truncation must keep up;
  *  - sessionize: 50k rotating users, 30-second gap, 2-minute watermark
  *    — bounded open-session state with constant merge traffic.
  * Both sinks are `noop` (sink cost excluded by design — the soak
  * isolates state-store behavior).
  *
  * Gates (exit 1 on failure), comparing the 2nd quarter of the run to
  * the 4th so warmup is excluded from both sides:
  *  - mean batch duration per query: Q4 ≤ 1.5 × Q2;
  *  - checkpoint bytes on disk: Q4 mean ≤ 1.5 × Q2 mean (changelog +
  *    snapshot maintenance holds the size flat once watermarks turn
  *    state over).
  * Emits one SOAK_JSON line with the full quarter table plus the
  * per-query batch/latency series tail for STREAMING.md.
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val minutes = sys.env.getOrElse("SOAK_MINUTES", "60").toInt
    val rate = sys.env.getOrElse("SOAK_RATE", "2000").toInt
    val base = sys.env.getOrElse("SOAK_DIR", "/tmp/graft_soak")
    val cores = sys.env.getOrElse("SOAK_CORES", "8")

    val dir = new java.io.File(base)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    dir.mkdirs()

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Streams.configureLargeState(spark, boundedMemoryMb = 1024)
    spark.sparkContext.setLogLevel("WARN")

    // (queryName, batchId) -> (epochMs, batchDurationMs, numInputRows,
    //                          stateRowsTotal, stateMemUsedBytes)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, Long, Long, Long)]()
    // RocksDB store custom metrics per batch — the r16 soak's latency
    // drift was unattributable (store-level compaction/read-path debt vs
    // host drift) because only state SIZE was recorded; get/commit
    // latencies, block-cache hit rates, writer stalls and sst totals are
    // what separate the two (a store-debt drift shows rising get latency
    // or falling cache hit rate with flat state rows; host drift shows
    // uniform batch-ms inflation with flat store metrics).
    val rocks = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Map[String, Long])]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        val (srows, smem) = p.stateOperators.headOption
          .map(s => (s.numRowsTotal, s.memoryUsedBytes)).getOrElse((0L, 0L))
        batches.add((p.name, p.batchId, System.currentTimeMillis(), dur,
          p.numInputRows, srows, smem))
        val cm = p.stateOperators.headOption.map { s =>
          s.customMetrics.asScala.collect {
            case (k, v) if k.startsWith("rocksdb") => k -> v.longValue
          }.toMap
        }.getOrElse(Map.empty[String, Long])
        rocks.add((p.name, System.currentTimeMillis(), cm)): Unit
      }
    })

    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load()

    val dedup = Streams.dedupStream(
      src.select(col("timestamp").as("ts"), (col("value") / 2).cast("long").as("k")),
      "ts", Seq("k"), watermark = "10 minutes")
    val q1 = dedup.writeStream.queryName("soak_dedup")
      .format("noop").outputMode("append")
      .option("checkpointLocation", s"$base/ckpt_dedup")
      .trigger(Trigger.ProcessingTime("5 seconds")).start()

    val sess = Streams.sessionize(
      src.select(col("timestamp").as("ts"),
        pmod(col("value"), lit(50000L)).cast("string").as("user")),
      "ts", "user", gap = "30 seconds", watermark = "2 minutes")
    val q2 = sess.writeStream.queryName("soak_sessionize")
      .format("noop").outputMode("append")
      .option("checkpointLocation", s"$base/ckpt_sess")
      .trigger(Trigger.ProcessingTime("5 seconds")).start()

    // checkpoint-size series, sampled every 30 s from the driver
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def duBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(duBytes).sum).getOrElse(0L)
    val deadline = System.currentTimeMillis() + minutes.toLong * 60000
    while (System.currentTimeMillis() < deadline &&
           q1.isActive && q2.isActive) {
      Thread.sleep(30000)
      sizes += ((System.currentTimeMillis(), duBytes(dir)))
      val n = batches.size()
      System.err.println(
        s"soak t+${(minutes * 60000 - (deadline - System.currentTimeMillis())) / 60000}m: " +
        s"$n batches, ckpt ${sizes.last._2 / 1024 / 1024} MB")
    }
    val failed = Seq(q1, q2).filterNot(_.isActive)
    q1.stop(); q2.stop()
    spark.stop()

    // quarter statistics
    import scala.jdk.CollectionConverters._
    val all = batches.asScala.toSeq
    val t0 = all.map(_._3).min
    val span = (all.map(_._3).max - t0).max(1)
    def quarter(ts: Long): Int = (((ts - t0) * 4) / (span + 1)).toInt.min(3)
    def meanDur(name: String, q: Int): Double = {
      val ds = all.filter(b => b._1 == name && quarter(b._3) == q).map(_._4)
      if (ds.isEmpty) 0.0 else ds.sum.toDouble / ds.size
    }
    def meanSize(q: Int): Double = {
      val ss = sizes.filter(s => quarter(s._1) == q).map(_._2)
      if (ss.isEmpty) 0.0 else ss.sum.toDouble / ss.size
    }
    val names = Seq("soak_dedup", "soak_sessionize")
    val durTable = names.map { n =>
      n -> (0 to 3).map(meanDur(n, _))
    }
    val sizeTable = (0 to 3).map(meanSize)
    val stateRows = names.map { n =>
      n -> (0 to 3).map { q =>
        val xs = all.filter(b => b._1 == n && quarter(b._3) == q).map(_._6)
        if (xs.isEmpty) 0L else xs.sum / xs.size
      }
    }

    var ok = failed.isEmpty
    durTable.foreach { case (n, qs) =>
      if (qs(1) > 0 && qs(3) > 1.5 * qs(1)) {
        System.err.println(f"GATE FAIL $n: Q4 mean batch ${qs(3)}%.0f ms > 1.5x Q2 ${qs(1)}%.0f ms")
        ok = false
      }
    }
    if (sizeTable(1) > 0 && sizeTable(3) > 1.5 * sizeTable(1)) {
      System.err.println(f"GATE FAIL checkpoint: Q4 mean ${sizeTable(3) / 1e6}%.1f MB > 1.5x Q2 ${sizeTable(1) / 1e6}%.1f MB")
      ok = false
    }

    // per-quarter means of the attribution-relevant RocksDB metrics
    // (latencies in their native units; sst size in bytes; cache
    // hit/miss as counts — the reader derives the rate)
    val rocksAll = rocks.asScala.toSeq
    val rocksKeysOut = Seq(
      "rocksdbGetLatency", "rocksdbPutLatency",
      "rocksdbReadBlockCacheHitCount", "rocksdbReadBlockCacheMissCount",
      "rocksdbCommitCompactLatency", "rocksdbCommitFlushLatency",
      "rocksdbWriterStallLatencyMs", "rocksdbSstFileSize")
      .filter(k => rocksAll.exists(_._3.contains(k)))
    val rocksJson = names.map { n =>
      val perKey = rocksKeysOut.map { k =>
        val qs = (0 to 3).map { q =>
          val xs = rocksAll
            .filter(r => r._1 == n && quarter(r._2) == q)
            .flatMap(_._3.get(k))
          if (xs.isEmpty) 0L else xs.sum / xs.size
        }
        s""""$k":[${qs.mkString(",")}]"""
      }.mkString(",")
      s""""$n":{$perKey}"""
    }.mkString(",")

    val durJson = durTable.map { case (n, qs) =>
      s""""$n":[${qs.map(d => f"$d%.0f").mkString(",")}]"""
    }.mkString(",")
    val rowsJson = stateRows.map { case (n, qs) =>
      s""""state_rows_$n":[${qs.mkString(",")}]"""
    }.mkString(",")
    println(
      s"""SOAK_JSON {"minutes":$minutes,"rate":$rate,"batches":${all.size},""" +
      s""""mean_batch_ms_by_quarter":{$durJson},$rowsJson,""" +
      s""""ckpt_mb_by_quarter":[${sizeTable.map(s => f"${s / 1e6}%.1f").mkString(",")}],""" +
      s""""rocksdb_by_quarter":{$rocksJson},""" +
      s""""plateau_ok":$ok}""")
    if (!ok) sys.exit(1)
  }
}
