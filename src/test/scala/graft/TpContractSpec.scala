package graft

import org.apache.spark.sql.functions._

/** Pins the `SparkEntry.tp` contract — the conditional rebalance behind the
  * heavy map-side bench entries (minhash, tfidf, cosine, ...):
  *
  *   - a scan that already feeds at least half the cluster's slots passes
  *     through UNCHANGED — no exchange is added, so at real input sizes
  *     (thousands of scan partitions per table) `tp` is a provable no-op
  *     and the 100-TB plan never pays a gratuitous shuffle;
  *   - a single-row-group scan (every driver fixture — parquet cannot split
  *     inside a row group) gets exactly ONE round-robin exchange up to the
  *     cluster's parallelism, so per-row work before the first shuffle uses
  *     every core instead of one.
  *
  * These were previously prose in SCALING.md; this spec makes them
  * explain-string assertions.
  */
class TpContractSpec extends SharedSpark {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    plan.sliding("Exchange".length).count(_ == "Exchange")
  }

  test("tp is a no-op on multi-partition scans (no added exchange)") {
    val slots = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("tp_contract").toString
    // enough files that the scan alone already exceeds half the slots
    spark.range(1000)
      .select(col("id").as("v"))
      .repartition(slots * 2)
      .write.mode("overwrite").parquet(s"$dir/multi.parquet")
    val df = SparkEntry.tp(spark, dir, "multi")
    assert(df.rdd.getNumPartitions * 2 > slots,
      "fixture must scan as a multi-partition read for this test to bite")
    assert(exchanges(df) == 0,
      s"tp added an exchange to an already-parallel scan:\n" +
        df.queryExecution.executedPlan.toString)
    assert(df.count() == 1000)
  }

  test("tp adds exactly one round-robin exchange on single-row-group scans") {
    val slots = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("tp_contract1").toString
    spark.range(1000)
      .select(col("id").as("v"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/single.parquet")
    // read back: one file, one row group → one partition
    val raw = spark.read.parquet(s"$dir/single.parquet")
    assert(raw.rdd.getNumPartitions == 1, "fixture must scan as 1 partition")
    val df = SparkEntry.tp(spark, dir, "single")
    assert(exchanges(df) == 1,
      s"expected exactly one exchange:\n" +
        df.queryExecution.executedPlan.toString)
    assert(df.queryExecution.executedPlan.toString
      .contains("RoundRobinPartitioning"),
      "the rebalance must be a key-free round robin (no skew reintroduced)")
    assert(df.rdd.getNumPartitions == slots)
    assert(df.count() == 1000)
  }
}
