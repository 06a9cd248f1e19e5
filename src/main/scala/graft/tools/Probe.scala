package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev utility: time any SparkEntry query standalone, outside the bench
  * harness — `Probe q_name /root/testdata/sf0.1 [q_name2 dir2 ...]`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.sliding(2, 2).foreach { case Array(q, dir) =>
      val t0 = System.nanoTime()
      // toRdd so the final projection is materialized, as in Bench
      val n = graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
      println(s"$q rows=$n time=${(System.nanoTime() - t0) / 1e9}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
