package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 measurement probe: where does the bounded-aggregate selection
  * (BoundedTopKAgg) win or lose against the window formulation, by group
  * regime?  Times three plans on the two bench shapes that regressed in
  * the r17 A/B (q_pjoin_uniform: 640k uniform groups x 10 rows, tau 5;
  * q_rows_per_key_per_group: ~3k groups x 200 rows, tau 2) plus the skew
  * shape that improved, with the ObjectHashAggregate sort-based fallback
  * threshold as the variable (default 128 groups forces a map-side sort
  * on every many-group shape).
  *
  * Usage: runMain graft.tools.TopKProbe [scale] [reps]
  * `scale` multiplies every shape's row count (default 1; 10 = the
  * decade check — does the agg path's win GROW with input size as the
  * skew-immunity argument predicts), `reps` repeats (default 2).
  */
object TopKProbe {
  private def time(label: String)(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-52s $s%7.3f s")
    s
  }

  private def consume(df: DataFrame): Unit = {
    df.queryExecution.toRdd.count(): Unit
  }

  def main(args: Array[String]): Unit = {
    val scale = if (args.length >= 1) args(0).toLong else 1L
    val reps = if (args.length >= 2) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.transformations.Truncation

    def shape(groups: Long, rowsPerGroup: Long, skew: Boolean): DataFrame = {
      val g =
        if (skew) when(col("id") % 10 === 0, 0L).otherwise(col("id") % groups)
        else col("id") % groups
      spark.range(groups * rowsPerGroup)
        .select(g.as("G"), (col("id") % 997).as("K"),
          (col("id") * 37 % 1000).as("V"))
    }

    def windowPath(df: DataFrame, tau: Int): DataFrame = {
      val w = Window.partitionBy(col("G"))
        .orderBy(Truncation.rowHash(df) +: df.columns.map(col): _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= tau).drop("__rn")
    }

    val cases = Seq(
      (s"uniform ${640 * scale}k x 10, tau 5",
        shape(640000L * scale, 10L, skew = false), 5),
      (s"groups ${3 * scale}k x 200, tau 2",
        shape(3000L * scale, 200L, skew = false), 2),
      (s"skew ${640 * scale}k x 10 (10% hot), tau 5",
        shape(640000L * scale, 10L, skew = true), 5))

    for (rep <- 1 to reps; (name, df, tau) <- cases) {
      time(s"[$rep] window    $name") {
        consume(windowPath(df, tau))
      }
      // at scale > 1 only the production default runs: fb=1e6 holds a
      // TreeMap buffer per in-flight group and OOMs the probe JVM at 64M
      // rows — the 128-group fallback IS the memory-safety mechanism,
      // which is why the session conf stays at its default
      val fbs = if (scale > 1L) Seq("128") else Seq("128", "4096", "1000000")
      for (fb <- fbs) {
        spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", fb)
        time(s"[$rep] agg fb=$fb  $name") {
          consume(Truncation.truncateLargeGroupsSalted(df, Seq("G"), tau))
        }
      }
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    }
    spark.stop()
  }
}
