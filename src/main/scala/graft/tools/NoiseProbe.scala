package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-mechanism sampling throughput of the AddNoise
  * expression — `NoiseProbe [rows]` prints rows/sec for each mechanism.
  * `SPARK_GRAFT_CPUS` sets the local core count (default 32), so a sweep
  * over 4/8/16/32 yields the rows/s/core capacity-planning table in
  * SCALING.md (samplers are pure per-row CPU — the one family whose
  * cluster cost scales with cores, not transport).
  */
object NoiseProbe {
  def main(args: Array[String]): Unit = {
    import graft.exact.Rational
    import graft.measurements._
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mechs: Seq[(String, NoiseMechanism)] = Seq(
      "geometric" -> GeometricMechanism(Rational(1, 2)),
      "laplace" -> LaplaceMechanism(Rational(2)),
      "discrete_gaussian" -> DiscreteGaussianMechanism(Rational(4)),
      "gaussian" -> GaussianMechanism(Rational(4)))
    mechs.foreach { case (name, m) =>
      // the sum consumes y so column pruning cannot delete the projection
      val df = spark.range(n).select(AddNoise(col("id"), m).as("y"))
      df.agg(expr("sum(cast(y as double))")).collect() // warm codegen
      val t0 = System.nanoTime()
      df.agg(expr("sum(cast(y as double))")).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-18s rows=$n dt=$dt%.2fs rate=${n / dt}%.0f rows/s")
    }
    spark.stop()
  }
}
