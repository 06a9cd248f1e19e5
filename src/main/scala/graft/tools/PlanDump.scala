package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * Streaming entries are skipped (their micro-batch plan is trigger-driven;
  * the batch-equivalent plan is what the *_stream oracle pins).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "args: <outDir> <suffix> <q1,q2,...>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      if (n.endsWith("_stream")) {
        System.err.println(s"skipping streaming entry $n")
      } else {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${n}_$suffix.txt")
        val w = new java.io.FileWriter(f)
        try w.write(plan) finally w.close()
        println(s"wrote ${f.getPath} (${plan.linesIterator.size} lines)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
