package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: prints the formatted physical plan and timed execution of the
  * round-6 time-series/retrieval entries at a given SF dir (not part of the
  * driver contract; see ARCHITECTURE.md "probes").
  */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_asof_join", "q_asof_forward", "q_asof_bucketed",
        "q_rolling", "q_chunk_docs", "q_bm25")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      val cnt = df.queryExecution.toRdd.count()
      println(f"$n: $cnt rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
