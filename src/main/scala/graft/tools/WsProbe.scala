package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase-level timing of the q_write_shards entry — pack,
  * write, read-back+aggregate — so its ~6 s bench cost is attributable.
  */
object WsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"rep $rep")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "n_chars")
      val packed = graft.ops.Pack.packGreedyNextFit(
        docs, "doc_id", "n_chars", budget = 4096L, numShards = 8)
      t("pack only (noop)")(packed.queryExecution.toRdd.count())
      val out = java.nio.file.Files
        .createTempDirectory("graft_wsprobe_").toString + "/epoch0"
      t("writeShards") {
        graft.ops.Pack.writeShards(
          packed.select(col("doc_id"),
            concat_ws("_", col("shard"), col("bin")).as("gbin")),
          "gbin", Seq("doc_id"), out)
      }
      if (sys.env.contains("WS_DUMP")) {
        val dumper = new Thread(() => {
          Thread.sleep(2500)
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            if (st.nonEmpty && (th.getName.contains("Executor task") ||
              th.getName == "main")) {
              println(s"== ${th.getName} ${th.getState}")
              st.take(14).foreach(f => println(s"   $f"))
            }
          }
        })
        dumper.setDaemon(true)
        dumper.start()
      }
      val out2 = java.nio.file.Files
        .createTempDirectory("graft_wsprobe_").toString + "/epoch0"
      t("writeShards json") {
        graft.ops.Pack.writeShards(
          packed.select(col("doc_id"),
            concat_ws("_", col("shard"), col("bin")).as("gbin")),
          "gbin", Seq("doc_id"), out2, format = "json")
      }
      val out3 = java.nio.file.Files
        .createTempDirectory("graft_wsprobe_").toString + "/epoch0"
      t("write nondynamic parquet") {
        packed.select(col("doc_id"),
            concat_ws("_", col("shard"), col("bin")).as("gbin"))
          .repartition(col("gbin"))
          .sortWithinPartitions(col("gbin"), col("doc_id"))
          .write.format("parquet").save(out3)
      }
      val agg = t("read-back agg plan+exec") {
        val d = spark.read.parquet(out)
          .withColumn("__f", input_file_name())
          .groupBy(col("gbin").cast("string").as("gbin"))
          .agg(
            countDistinct(col("__f")).as("n_files"),
            count(lit(1)).as("n_rows"),
            min("doc_id").as("min_id"),
            max("doc_id").as("max_id"))
        d.queryExecution.toRdd.count()
      }
      println(s"  groups=$agg")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
