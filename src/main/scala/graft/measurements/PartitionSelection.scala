package graft.measurements

import graft.core.Measurement
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.metrics._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DP key discovery (reference `spark_measurements.py:367-587`):
  * groupBy all columns → count → two-sided-geometric noise → keep rows with
  * noisy count ≥ threshold. Output is safe to release under (ε, δ) with
  * ε = d_in/α and δ bounded by the tail of the geometric CMF at the
  * threshold.
  *
  * Whole pipeline is three narrow Spark stages: partial-agg count (map-side
  * combine), noise expression (JVM, no Arrow), filter — scales linearly in
  * distinct keys.
  */
final case class GeometricPartitionSelection(
    inputDomain: DataFrameDomain,
    alpha: Rational,
    threshold: Long,
    countColumn: String = "count"
) extends Measurement {
  require(alpha.signum >= 0)
  require(!inputDomain.contains(countColumn))

  def inputMetric: Metric = SymmetricDifference
  def outputMeasure: Measure = ApproxDP

  def privacyFunction(dIn: ExactNum): PrivacyBudget = {
    if (dIn.isZero) ApproxDPBudget(ExactNum.zero, ExactNum.zero)
    else if (alpha.isZero) ApproxDPBudget(ExactNum.PosInf, ExactNum.one)
    else {
      val eps = dIn / ExactNum(alpha)
      // δ: chance any individual's ≤ d_in rows survive thresholding — a
      // group holding only their count c ≤ d is released iff noise
      // X ≥ τ − c, worst at c = d. P(X ≥ k) for two-sided geometric,
      // k ≥ 1: p^k/(1+p), p = e^(−1/α); for k ≤ 0 bound by 1.
      // Conservative union bound δ = d_in · P(X ≥ τ − d_in).
      val d = dIn.toRational.toDouble
      val tau = threshold.toDouble
      val p = math.exp(-1.0 / alpha.toDouble)
      val k = tau - d
      val tail = if (k < 1.0) 1.0 else math.pow(p, k) / (1.0 + p)
      // exp/pow/multiply round to nearest, so the computed tail can sit
      // several ulps BELOW the true CMF tail for large k. Widen by a relative
      // 1e-9 margin (same policy as Aggregations.withApproxDP) plus one
      // subnormal step so even an underflowed product stays an upper bound —
      // a single nextUp only compensates one ulp.
      val delta = math.min(
        1.0,
        d * tail * (1.0 + 1e-9) + java.lang.Double.MIN_VALUE)
      ApproxDPBudget(eps, ExactNum.fromDouble(delta))
    }
  }

  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame]
    val cols = df.columns.toSeq
    val counted = df
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as(countColumn))
    val noised = counted.withColumn(
      countColumn,
      AddNoise(col(countColumn), GeometricMechanism(alpha))
    )
    Sanitize(noised.filter(col(countColumn) >= threshold))
  }
}

/** Above-threshold / sparse-vector over per-group prefix sums — the bounds-
  * finding primitive (reference `spark_measurements.py:590-874`): per group,
  * cumulative-sum the per-bin counts in bin order, add geometric noise to a
  * threshold of 0.95·total and to each prefix sum, return the first bin
  * whose noisy prefix crosses the noisy threshold. ε = 4·d_in/α.
  *
  * One Window over (group ordered by bin) — single shuffle; noise is a
  * nondeterministic JVM expression evaluated once per (group, bin).
  */
final case class SparseVectorPrefixSums(
    inputDomain: DataFrameDomain,
    groupColumns: Seq[String],
    rankColumn: String,
    countColumn: String,
    alpha: Rational,
    outputColumn: String = "selected_rank"
) extends Measurement {
  require(alpha.signum >= 0)
  groupColumns.foreach(c => require(inputDomain.contains(c)))
  require(inputDomain.contains(rankColumn))
  require(inputDomain.contains(countColumn))

  def inputMetric: Metric = OnColumn(countColumn, SumOf(AbsoluteDifference))
  def outputMeasure: Measure = PureDP

  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    if (dIn.isZero) PureDPBudget(ExactNum.zero)
    else if (alpha.isZero) PureDPBudget(ExactNum.PosInf)
    else PureDPBudget(ExactNum(4) * dIn / ExactNum(alpha))

  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame]
    val gcols = groupColumns.map(col)
    val wCum = Window
      .partitionBy(gcols: _*)
      .orderBy(col(rankColumn))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val halfAlpha = alpha / Rational(2)
    // One threshold draw per group (SVT requires a single noisy threshold
    // shared by all of the group's comparisons).
    val thresholds = df
      .groupBy(gcols: _*)
      .agg(sum(col(countColumn)).as("__total"))
      .withColumn(
        "__noisy_threshold",
        // floor() explicitly: cast-to-long truncation vs rounding differs
        // across engines, floor is unambiguous
        AddNoise(floor(col("__total") * lit(0.95)).cast("long"), GeometricMechanism(halfAlpha))
      )
      .drop("__total")
    val prefixed = df
      .withColumn("__prefix", sum(col(countColumn)).over(wCum))
      .join(broadcast(thresholds), groupColumns)
      .withColumn(
        "__noisy_prefix",
        AddNoise(col("__prefix"), GeometricMechanism(alpha))
      )
    // First bin (in rank order) whose noisy prefix crosses the group's noisy
    // threshold; fall back to the max rank if none crosses.
    val crossing = prefixed
      .withColumn(
        "__cross_rank",
        when(col("__noisy_prefix") >= col("__noisy_threshold"), col(rankColumn))
      )
      .groupBy(gcols: _*)
      .agg(
        coalesce(min(col("__cross_rank")), max(col(rankColumn)))
          .as(outputColumn)
      )
    Sanitize(crossing)
  }
}
