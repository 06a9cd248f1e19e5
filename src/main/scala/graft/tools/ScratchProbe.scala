package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch-disk sizing probe for the document-family heavies — the
  * capacity-planning number the decade-4 wall made concrete (SCALING.md
  * round 15: one 50M-doc q_minhash_dedup accumulates >65 GB of shuffle
  * scratch and ENOSPCs a ~70 GB-free box). Every term in those jobs is
  * linear in corpus bytes, so the per-node provisioning rule a cluster
  * needs is a measured RATIO: scratch bytes per corpus byte. This probe
  * runs the entries at a fixture that FITS (decade 3 by default) with a
  * stage-completion listener summing shuffle-write bytes and disk
  * spill — the two terms that land in `spark.local.dir` — and prints
  * one `SCRATCH_JSON` line per entry with the ratio. The cluster rule
  * is then: per-node scratch ≈ ratio × (corpus bytes / executors),
  * since shuffle files distribute with the tasks that write them.
  *
  * Shuffle-write is summed over ALL stages of the entry's jobs — an
  * upper bound on the PEAK on-disk footprint exactly when nothing is
  * cleaned mid-query, which matches the observed failure mode (the
  * round-15 ENOSPC accumulated in a single job, where the
  * ContextCleaner reclaims nothing until the actions complete).
  *
  * Env: PROBE_DIR (default testdata_sf100 — 5M docs), PROBE_QUERIES
  * (default q_minhash_dedup,q_containment), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTS.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/repo/testdata_sf100")
    val queries = sys.env.getOrElse("PROBE_QUERIES",
      "q_minhash_dedup,q_containment").split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          diskSpill.addAndGet(m.diskBytesSpilled): Unit
          memSpill.addAndGet(m.memoryBytesSpilled): Unit
        }
      }
    })

    def dirBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(path))
    }
    val corpusBytes = dirBytes(s"$dir/documents.parquet")
    // a missing PROBE_DIR or empty corpus would make the ratio divide to
    // Infinity/NaN — not valid JSON, silently breaking downstream parsers
    require(corpusBytes > 0, s"no corpus at $dir/documents.parquet")

    queries.foreach { q =>
      shuffleWrite.set(0); diskSpill.set(0); memSpill.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously (listenerBus is
      // private[spark], so no waitUntilEmpty from here); a generous
      // settle window is fine for a capacity probe
      Thread.sleep(3000)
      val sw = shuffleWrite.get; val ds = diskSpill.get
      println(
        f"""SCRATCH_JSON {"query":"$q","dir":"$dir","corpus_bytes":$corpusBytes,""" +
        f""""shuffle_write_bytes":$sw,"disk_spill_bytes":$ds,""" +
        f""""mem_spill_bytes":${memSpill.get},"wall_sec":$wall%.1f,""" +
        f""""scratch_per_corpus_byte":${(sw + ds).toDouble / corpusBytes}%.2f}""")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
