package graft

import graft.domains._
import graft.exact.ExactNum
import graft.measures._
import graft.measurements._
import graft.metrics.SymmetricDifference
import graft.ops.Skew
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SkewSpec extends SharedSpark {

  private def skewed = df(
    "K STRING, X BIGINT",
    (1 to 500).map(i => Row("hot", i.toLong)) ++
      Seq(Row("cold1", 1L), Row("cold2", 2L))
  )

  test("salted count equals plain count") {
    val plain = skewed.groupBy("K").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(skewed, Seq("K"), saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val plain = skewed.groupBy("K").agg(sum("X"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedSum(skewed, Seq("K"), "X", saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val right = df("K STRING, V STRING",
      Seq(Row("hot", "h"), Row("cold1", "c")))
    val plain = sortedRows(skewed.join(right, Seq("K")))
    val salted = sortedRows(Skew.saltedJoin(skewed, right, Seq("K"), 4))
    assert(salted == plain)
  }

  test("AQE skew-join splits the hot partition of a multi-partition join") {
    // how the salted paths compose with cluster-scale machinery: on a
    // multi-partition shuffle join, AQE's runtime skew handling splits the
    // oversized partition into reader chunks — evidence that an UNsalted
    // hot key is re-planned at runtime, while the salted operators remain
    // the static guarantee. Thresholds are lowered so the toy fixture
    // crosses the same trigger a production hot partition would.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 120000).select(
        when(col("id") < 100000, lit("hot"))
          .otherwise(concat(lit("k"), col("id") % 1000)).as("K"),
        col("id").as("X"))
      val right = spark.range(0, 1000)
        .select(concat(lit("k"), col("id")).as("K"))
        .union(spark.range(0, 1).select(lit("hot").as("K")))
      val joined = left.join(right, Seq("K"))
      val qe = joined.queryExecution
      qe.toRdd.count(): Unit // finalize the adaptive plan
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ApproxDP count via pure mechanism spends (eps, 0)") {
    val domain = DataFrameDomain(Seq("K" -> ColumnDescriptor.string(true)))
    val keys = df("K STRING", Seq(Row("hot")))
    val m = Aggregations.withApproxDP(
      ApproxDPBudget(ExactNum(1), ExactNum.zero), NoiseKind.Geometric) { b =>
      Aggregations.createCountMeasurement(
        domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1), b, Some(keys))
    }
    assert(m.outputMeasure == ApproxDP)
    assert(m.privacyFunction(ExactNum(1)) == ApproxDPBudget(ExactNum(1), ExactNum.zero))
  }

  test("ApproxDP count via Gaussian solves rho within the epsilon target") {
    val domain = DataFrameDomain(Seq("K" -> ColumnDescriptor.string(true)))
    val keys = df("K STRING", Seq(Row("hot")))
    val eps = ExactNum(1)
    val delta = ExactNum.fromDouble(1e-6)
    val m = Aggregations.withApproxDP(
      ApproxDPBudget(eps, delta), NoiseKind.DiscreteGaussian) { b =>
      Aggregations.createCountMeasurement(
        domain, SymmetricDifference, NoiseKind.DiscreteGaussian, ExactNum(1), b, Some(keys))
    }
    assert(m.outputMeasure == ApproxDP)
    m.privacyFunction(ExactNum(1)) match {
      case ApproxDPBudget(e, d) =>
        assert(d == delta)
        assert(e <= eps, s"ε=${e.toDouble} exceeds target 1")
        assert(e.toDouble > 0.9, s"ε=${e.toDouble} leaves budget unused")
      case b => fail(s"unexpected $b")
    }
  }
}
