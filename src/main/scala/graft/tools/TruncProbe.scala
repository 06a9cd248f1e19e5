package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: decompose the salted-truncation cost on the uniform
  * 640k-group synthetic — eager hot-key probe vs plain window vs hash.
  */
object TruncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val groups = 640000L
    val left = spark.range(groups * 10)
      .select((col("id") % groups).as("K"), (col("id") % 97).as("V"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"$name rows=$n time=${(System.nanoTime() - t0) / 1e9}")
    }
    time("warm")(left.count())
    val hotKeys = left.groupBy(col("K"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 100000L)
      .select(col("K"))
    time("probe1")(hotKeys.count())
    time("probe2")(hotKeys.count())
    // the SAMPLED probe actually used by saltedKeepSmallest (default
    // hotGroupMinRows=100k -> 2% sample): its cost per truncated side is
    // what a PrivateJoin pays on top of the windows
    val sampled = left.sample(withReplacement = false, 0.02, seed = 42L)
      .groupBy(col("K"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 500L)
      .select(col("K"))
    time("sampledProbe1")(sampled.count())
    time("sampledProbe2")(sampled.count())
    time("plainWindow")(
      graft.transformations.Truncation.truncateLargeGroups(left, Seq("K"), 5).count())
    time("salted")(
      graft.transformations.Truncation
        .truncateLargeGroupsSalted(left, Seq("K"), 5).count())
    time("hashOnly")(left.select(
      graft.transformations.Truncation.rowHash(left).as("h"))
      .agg(count(lit(1))).count())
    spark.stop()
  }
}
