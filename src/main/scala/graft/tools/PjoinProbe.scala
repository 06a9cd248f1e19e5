package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the private-join truncation path
  * (plain vs salted windows, join) on the 640k-group synthetic workload.
  */
object PjoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val groups = 640000L
    val left = spark.range(groups * 10).select((col("id") % groups).as("K"), (col("id") % 97).as("V"))
    val right = spark.range(groups).select(col("id").as("K"), (col("id") % 7).as("W"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"$name rows=$n time=${(System.nanoTime() - t0) / 1e9}")
    }
    val skewKey = when(col("id") % 10 === 0, 0L).otherwise(col("id") % groups)
    val leftSkew = spark.range(groups * 10).select(skewKey.as("K"), (col("id") % 97).as("V"))
    time("warm")(left.count() + right.count() + leftSkew.count())
    time("truncL")(graft.transformations.Truncation.truncateLargeGroupsSalted(left, Seq("K"), 5).count())
    time("truncL2")(graft.transformations.Truncation.truncateLargeGroupsSalted(left, Seq("K"), 5).count())
    time("truncPlainL")(graft.transformations.Truncation.truncateLargeGroups(left, Seq("K"), 5).count())
    time("truncR")(graft.transformations.Truncation.truncateLargeGroupsSalted(right, Seq("K"), 5).count())
    time("truncSkew")(graft.transformations.Truncation.truncateLargeGroupsSalted(leftSkew, Seq("K"), 5).count())
    time("truncSkew2")(graft.transformations.Truncation.truncateLargeGroupsSalted(leftSkew, Seq("K"), 5).count())
    val tl = graft.transformations.Truncation.truncateLargeGroupsSalted(left, Seq("K"), 5)
    val tr = graft.transformations.Truncation.truncateLargeGroupsSalted(right, Seq("K"), 5)
    time("join")(graft.transformations.JoinKernel.join(tl, tr, Seq("K"), "inner", true).count())
    val tls = graft.transformations.Truncation.truncateLargeGroupsSalted(leftSkew, Seq("K"), 5)
    time("joinSkew")(graft.transformations.JoinKernel.join(tls, tr, Seq("K"), "inner", true).count())
    // probe-cost A/B: saltBuckets=1 skips the eager hot-key probe entirely
    // and both variants take the identical plain-window path on this
    // uniform corpus, so the interleaved difference IS the two probes' cost
    locally {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.transformations.{PrivateJoin, TruncationStrategy}
      val domL = DataFrameDomain(
        Seq("K" -> ColumnDescriptor.long, "V" -> ColumnDescriptor.long))
      val domR = DataFrameDomain(
        Seq("K" -> ColumnDescriptor.long, "W" -> ColumnDescriptor.long))
      def pj(salt: Int): Long = PrivateJoin(
        domL, domR, on = Seq("K"),
        leftStrategy = TruncationStrategy.Truncate, leftThreshold = 5,
        rightStrategy = TruncationStrategy.Truncate, rightThreshold = 5,
        saltBuckets = salt)(Map("left" -> left, "right" -> right))
        .asInstanceOf[org.apache.spark.sql.DataFrame].count()
      pj(32); pj(1) // codegen warmup for both variants
      (1 to 5).foreach { i =>
        time(s"pjProbed$i")(pj(32))
        time(s"pjNoProbe$i")(pj(1))
      }
    }
    spark.stop()
  }
}
