package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: plan shape of the Bloom-pruned joins (the might_contain
  * probe must sit in the scan-side WholeStageCodegen span, before any
  * exchange). */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hi = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey").as("hk"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    graft.ops.BloomJoin.semiJoin(li, hi, "l_orderkey", "hk", 100000L)
      .explain("formatted")
    spark.stop()
  }
}
