package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-4 executed proof for the document family (VERDICT r16 missing
  * #3): run the staged minhash dedup (`minHashPairs(bandPasses = k)`) on
  * the 50M-doc fixture — the run that single-pass provably cannot finish
  * on this box (measured rule: 27.7 scratch B per corpus B → ~152 GB for
  * the 5.5 GB corpus vs ~70 GB free) — while a sampler thread records the
  * PEAK on-disk scratch (spark.local.dir + the staged temp spill), and
  * value-check the result against the base fixture: the derived fixture
  * embeds the base corpus as copy 0, so the output restricted to copy-0
  * ids must equal the base single-pass run exactly (the same containment
  * InvariantCheck pins at sf1).
  *
  * Spark setup follows ScaleBench's measured discipline: blocking
  * reference tracking so the staged mode's per-pass System.gc() reclaims
  * each pass's shuffle files synchronously (the async cleaner out-raced
  * into ENOSPC in round 14), and a dedicated spark.local.dir so the du
  * sampler measures exactly the engine's scratch.
  *
  * Env: PROBE_DIR (default testdata_sf1000), PROBE_BASE_DIR (default
  * /root/testdata/sf0.1), PROBE_PASSES (default 4), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE_PARTS, PROBE_SCRATCH (default
  * /tmp/graft_staged_scratch).
  */
object StagedDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/repo/testdata_sf1000")
    val baseDir = sys.env.getOrElse("PROBE_BASE_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("PROBE_PASSES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = sys.env.getOrElse("PROBE_SCRATCH", "/tmp/graft_staged_scratch")
    new java.io.File(scratch).mkdirs()

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", scratch)
      .config("spark.cleaner.referenceTracking.blocking", "true")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      // corpus-sized caches must never pin the storage floor here
      // (measured r15: AGGREGATE_OUT_OF_MEMORY at 64g/32 threads);
      // staged mode only persists the small candidate sets
      .config("spark.memory.storageFraction", "0.2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dirBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(path))
    }
    val corpusBytes = dirBytes(s"$dir/documents.parquet")
    require(corpusBytes > 0, s"no corpus at $dir/documents.parquet")

    // peak-scratch sampler: spark.local.dir plus the staged pass spill
    // (graft_minhash_staged temp dirs land under java.io.tmpdir)
    val tmpRoot = sys.props("java.io.tmpdir")
    @volatile var peak = 0L
    @volatile var done = false
    val sampler = new Thread(() => {
      while (!done) {
        val stagedTmp = Option(new java.io.File(tmpRoot).listFiles())
          .map(_.filter(_.getName.startsWith("graft_minhash_staged"))
            .map(f => dirBytes(f.getAbsolutePath)).sum)
          .getOrElse(0L)
        val cur = dirBytes(scratch) + stagedTmp
        if (cur > peak) peak = cur
        Thread.sleep(5000)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val t0 = System.nanoTime()
    val pairs = Dedup.minHashPairs(d, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5,
      bandPasses = passes)
      .select("left_id", "right_id")
      .persist()
    val nPairs = pairs.count()
    val wall = (System.nanoTime() - t0) / 1e9
    done = true

    // value check: copy-0 restriction equals the base single-pass output
    val dBase = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text")
    val maxDoc = dBase.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val basePairs = Dedup.minHashPairs(dBase, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
      .select("left_id", "right_id")
    val copy0 = pairs.filter(col("left_id") < maxDoc && col("right_id") < maxDoc)
    val missing = basePairs.exceptAll(copy0).count()
    val extra = copy0.exceptAll(basePairs).count()

    println(
      s"""STAGED_JSON {"dir":"$dir","passes":$passes,""" +
      s""""corpus_bytes":$corpusBytes,"pairs":$nPairs,""" +
      f""""wall_sec":$wall%.1f,"peak_scratch_bytes":$peak,""" +
      f""""peak_scratch_per_corpus_byte":${peak.toDouble / corpusBytes}%.2f,""" +
      s""""copy0_missing":$missing,"copy0_extra":$extra,""" +
      s""""value_check":"${if (missing == 0 && extra == 0) "PASS" else "FAIL"}"}""")
    spark.stop()
    if (missing != 0 || extra != 0) sys.exit(1)
  }
}
