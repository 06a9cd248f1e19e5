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
    // alpha==0 BEFORE the fractional-d_in guard: the reference answers
    // (inf, 0) for any d_in > 0 when no noise is added
    // (spark_measurements.py:554-555 precedes the d_in<1 raise at :556-557)
    else if (alpha.isZero) ApproxDPBudget(ExactNum.PosInf, ExactNum.zero)
    else if ((dIn - ExactNum.one).signum < 0)
      // Fractional distances: δ₁'s derivation assumes whole added/removed
      // rows; the reference raises NotImplementedError (spark_measurements
      // .py:556-557) rather than claim the linearly-scaled (stronger) ε.
      throw new UnsupportedOperationException(
        s"GeometricPartitionSelection: d_in must be 0 or >= 1, got $dIn")
    else {
      // Reference formula (spark_measurements.py:538-570):
      //   δ₁ = 1 − CMF(τ−2)   (two-sided geometric CMF at scale α)
      //   δ_d = min(1, d·e^{d/α}·δ₁)   for d > 1
      // evaluated at 50 significant digits with an upward pad and a
      // round-up double conversion, so the reported δ equals the
      // reference's exact value printed via to_float(round_up=True).
      val eps = dIn / ExactNum(alpha)
      val delta = GeometricPartitionSelection
        .deltaUpper(dIn.toRational, threshold, alpha)
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

object GeometricPartitionSelection {
  import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

  private val W = 50
  private val mc = new MathContext(W, RoundingMode.HALF_EVEN)
  // relative pad dominating the ~10^-47 arithmetic error of the 50-digit
  // evaluation, far below double precision — keeps the conversion an
  // upper bound without moving any printed digit
  private val pad = new JBD("1." + "0" * 39 + "1")

  private def expBD(q: graft.exact.Rational): JBD =
    graft.random.IvMath.expPoint(q.toBigDecimal(mc), W)

  /** Smallest double ≥ v (v > 0). */
  private def roundUpToDouble(v: JBD): Double = {
    val d = v.doubleValue()
    if (d.isInfinite) Double.MaxValue
    else if (d <= 0.0) java.lang.Double.MIN_VALUE
    else if (new JBD(d).compareTo(v) < 0) Math.nextUp(d) else d
  }

  /** Upper bound on the reference δ — exact to well past double
    * precision inside the representable range, with SOUND clamps (to 1
    * or to the smallest positive double) outside it.
    */
  private[measurements] def deltaUpper(
      d: graft.exact.Rational,
      tau: Long,
      alpha: graft.exact.Rational): Double = {
    import graft.exact.Rational
    val one = JBD.ONE
    val invA = alpha.reciprocal
    val e1d = invA.toDouble
    val k = tau - 2
    val isAmplified = d > Rational(1)
    val m: Rational = if (isAmplified) d else Rational(1) // leading factor
    val lnM = math.log(math.max(m.toDouble, 1.0))
    if (e1d > 1e5) return 1.0 // pathological α → sound clamp at 1
    val v: JBD =
      if (k <= 0) {
        // δ₁ = 1 − e^{(1+k)/α}/(e^{1/α}+1), then ×(d·e^{d/α}) if d > 1
        // Very negative (1+k)/α → δ₁ = 1 to far past double precision;
        // clamp BEFORE calling expBD (whose range guard would throw).
        if ((Rational(1 + k) * invA).toDouble < -1e5) return 1.0
        val u = expBD(Rational(1 + k) * invA)
        val denom = expBD(invA).add(one, mc)
        val d1 = one.subtract(u.divide(denom, mc), mc)
        if (!isAmplified) d1
        else {
          val qd = (d * invA).toDouble
          if (qd > 1e5) return 1.0 // e^{1e5}·δ₁ ≥ 1 (δ₁ ≥ 1/(e^{1/α}+1) here)
          m.toBigDecimal(mc).multiply(expBD(d * invA), mc).multiply(d1, mc)
        }
      } else {
        // δ_d = m·e^{q}/(e^{1/α}+1), q = (d−k)/α for d > 1, −k/α for d = 1:
        // one combined exponent so amplification and tail never over/
        // underflow separately
        val q = (if (isAmplified) (d - Rational(k)) else Rational(-k)) * invA
        val qd = q.toDouble
        if (qd + lnM < -1e5) return java.lang.Double.MIN_VALUE // δ ≪ 2^-1074
        if (qd - e1d >= 1.0) return 1.0 // m·e^q/(e^{1/α}+1) ≥ e^{q−1/α}/2 ≥ e/2
        if (math.abs(qd) > 1e5) return 1.0 // out of expPoint range: sound clamp
        m.toBigDecimal(mc).multiply(expBD(q), mc)
          .divide(expBD(invA).add(one, mc), mc)
      }
    math.min(1.0, roundUpToDouble(v.multiply(pad, mc)))
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
    // null-safe (<=>) join: a NULL group key is a real group (reference
    // nulls_are_equal semantics) and must meet its own threshold draw
    val lhs = df
      .withColumn("__prefix", sum(col(countColumn)).over(wCum))
    val rhs = broadcast(thresholds.select(
      (groupColumns.map(c => col(c).as(s"__t_$c")) :+
        col("__noisy_threshold")): _*))
    val joinCond =
      if (groupColumns.isEmpty) lit(true)
      else groupColumns.map(c => lhs(c) <=> rhs(s"__t_$c")).reduce(_ && _)
    val prefixed = lhs
      .join(rhs, joinCond)
      .drop(groupColumns.map(c => s"__t_$c"): _*)
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
