package graft.measurements

import graft.core._
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Noise-mechanism selection for the factories
  * (reference `measurements/aggregations.py:95-134`).
  */
sealed trait NoiseKind
object NoiseKind {
  case object Laplace extends NoiseKind
  case object Geometric extends NoiseKind
  case object DiscreteGaussian extends NoiseKind
  case object Gaussian extends NoiseKind
}

/** Fully-assembled DP aggregation pipelines
  * (reference `measurements/aggregations.py`, 2332 LoC). Noise scale chosen
  * by `calculateNoiseScale` (`utils/parameters.py:17-124`): b = d_mid/ε for
  * pure DP, σ² = d_mid²/(2ρ) for zCDP.
  */
object Aggregations {

  def calculateScale(
      dMid: ExactNum,
      budget: PrivacyBudget,
      kind: NoiseKind
  ): NoiseMechanism = {
    def pureScale(eps: ExactNum): Rational =
      if (dMid.isZero) Rational.zero
      else {
        require(eps > ExactNum.zero, "ε must be positive")
        if (!eps.isFinite) Rational.zero
        else (dMid / eps).toRational
      }
    def zcdpSigmaSq(rho: ExactNum): Rational =
      if (dMid.isZero) Rational.zero
      else {
        require(rho > ExactNum.zero, "ρ must be positive")
        if (!rho.isFinite) Rational.zero
        else (dMid.pow2 / (ExactNum(2) * rho)).toRational
      }
    (kind, budget) match {
      case (NoiseKind.Laplace, PureDPBudget(e))   => LaplaceMechanism(pureScale(e))
      case (NoiseKind.Geometric, PureDPBudget(e)) => GeometricMechanism(pureScale(e))
      case (NoiseKind.DiscreteGaussian, RhoZCDPBudget(r)) =>
        DiscreteGaussianMechanism(zcdpSigmaSq(r))
      case (NoiseKind.Gaussian, RhoZCDPBudget(r)) =>
        GaussianMechanism(zcdpSigmaSq(r))
      case (k, b) =>
        throw new IllegalArgumentException(s"mechanism $k incompatible with $b")
    }
  }

  /** ApproxDP budgets build through the pure-DP or zCDP mechanism and wrap
    * with the matching converter (reference wraps factories the same way):
    * (ε,δ) with a pure mechanism spends (ε,0); with a Gaussian mechanism the
    * largest ρ with ρ+2√(ρ·ln(1/δ)) ≤ ε is used (rounded down — more noise,
    * privacy-safe).
    */
  /** Opt-in: calibrate Gaussian ApproxDP budgets through the tight CKS
    * zCDP→(ε,δ) conversion ([[TightZcdp]]) instead of the reference-matching
    * Bun–Steinke bound — admits a larger ρ (less noise) for the same
    * (ε, δ). Default false so behavior matches the reference exactly.
    */
  @volatile var tightApproxDPCalibration: Boolean = false

  def withApproxDP(
      budget: PrivacyBudget,
      kind: NoiseKind
  )(build: PrivacyBudget => Measurement): Measurement = budget match {
    case ApproxDPBudget(eps, delta) =>
      kind match {
        case NoiseKind.Laplace | NoiseKind.Geometric =>
          PureDPToApproxDP(build(PureDPBudget(eps)))
        case NoiseKind.Gaussian | NoiseKind.DiscreteGaussian =>
          require(
            delta > ExactNum.zero,
            "Gaussian mechanisms need δ > 0 under approximate DP"
          )
          if (tightApproxDPCalibration && eps.isFinite && delta < ExactNum.one) {
            val rho = TightZcdp.rhoFor(
              eps.toDouble(roundUp = false),
              delta.toDouble(roundUp = false))
            RhoZCDPToApproxDPTight(
              build(RhoZCDPBudget(ExactNum.fromDouble(rho))), delta)
          } else {
            val rho =
              if (!eps.isFinite) ExactNum.PosInf
              else {
                // solve x² + 2bx − ε = 0 for x = √ρ, b = √(ln(1/δ))
                val e = eps.toDouble(roundUp = false)
                val b = math.sqrt(-math.log(delta.toDouble(roundUp = false)))
                // 1e-9 relative margin absorbs the converter's own
                // conservative upward rounding on the way back to ε
                val x = (-b + math.sqrt(b * b + e)) * (1.0 - 1e-9)
                ExactNum.fromDouble(math.max(x * x, 0.0))
              }
            RhoZCDPToApproxDP(build(RhoZCDPBudget(rho)), delta)
          }
      }
    case b => build(b)
  }

  /** Noisy (grouped) count (reference `aggregations.py:136-359`). */
  def createCountMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      groupKeys: Option[DataFrame] = None,
      countColumn: String = "count",
      distinct: Boolean = false
  ): Measurement = groupKeys match {
    case None =>
      val counter =
        if (distinct) CountDistinct(inputDomain, inputMetric)
        else Count(inputDomain, inputMetric)
      val dMid = counter.stabilityFunction(dIn)
      counter | AddNoiseScalar(
        counter.outputDomain.asInstanceOf[ScalarDomain],
        calculateScale(dMid, budget, kind)
      )
    case Some(keys) =>
      val useL2 = kind == NoiseKind.DiscreteGaussian || kind == NoiseKind.Gaussian
      val groupBy = GroupBy(inputDomain, inputMetric, useL2, keys)
      val gDomain = groupBy.outputDomain.asInstanceOf[GroupedDataFrameDomain]
      val counter =
        if (distinct)
          CountDistinctGrouped(gDomain, groupBy.outputMetric, countColumn)
        else CountGrouped(gDomain, groupBy.outputMetric, countColumn)
      val dMid = counter.stabilityFunction(groupBy.stabilityFunction(dIn))
      val noise = AddNoiseToColumn(
        counter.outputDomain.asInstanceOf[DataFrameDomain],
        counter.outputMetric,
        countColumn,
        calculateScale(dMid, budget, kind)
      )
      groupBy | counter | noise
  }

  /** Noisy (grouped) distinct-row count (reference `aggregations.py:361-594`). */
  def createCountDistinctMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      groupKeys: Option[DataFrame] = None,
      countColumn: String = "count"
  ): Measurement =
    createCountMeasurement(
      inputDomain, inputMetric, kind, dIn, budget, groupKeys, countColumn,
      distinct = true)

  /** Noisy (grouped) clipped sum (reference `aggregations.py:595-827`). */
  def createSumMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      lower: Rational,
      upper: Rational,
      groupKeys: Option[DataFrame] = None,
      sumColumn: String = "sum"
  ): Measurement = groupKeys match {
    case None =>
      val summer = Sum(inputDomain, inputMetric, measureColumn, lower, upper)
      val dMid = summer.stabilityFunction(dIn)
      summer | AddNoiseScalar(
        summer.outputDomain.asInstanceOf[ScalarDomain],
        calculateScale(dMid, budget, kind)
      )
    case Some(keys) =>
      val useL2 = kind == NoiseKind.DiscreteGaussian || kind == NoiseKind.Gaussian
      val groupBy = GroupBy(inputDomain, inputMetric, useL2, keys)
      val gDomain = groupBy.outputDomain.asInstanceOf[GroupedDataFrameDomain]
      val summer = SumGrouped(
        gDomain,
        groupBy.outputMetric,
        measureColumn,
        lower,
        upper,
        sumColumn
      )
      val dMid = summer.stabilityFunction(groupBy.stabilityFunction(dIn))
      val noise = AddNoiseToColumn(
        summer.outputDomain.asInstanceOf[DataFrameDomain],
        summer.outputMetric,
        sumColumn,
        calculateScale(dMid, budget, kind)
      )
      groupBy | summer | noise
  }

  /** Noisy (grouped) average = midpoint + noisy-sum-of-deviations /
    * noisy-count, half the budget each (reference `aggregations.py:829-1122`).
    */
  def createAverageMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      countKind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      lower: Rational,
      upper: Rational,
      groupKeys: Option[DataFrame] = None,
      outputColumn: String = "average",
      // reference keep_intermediates (aggregations.py create_average_
      // measurement): grouped output keeps the noisy `sod`/`count`
      // components alongside the average — used by the distribution tests
      // to KS-test each component against its exact noise law
      keepIntermediates: Boolean = false
  ): Measurement = {
    val midpoint = (lower + upper) / Rational.two
    val halfBudget = halve(budget)
    // deviations from the EXACT midpoint as doubles (integer columns are
    // cast: subtracting a truncated integer midpoint while adding back the
    // exact one in post-processing would bias the average by the midpoint's
    // fractional part), clipped to ±(u−l)/2
    val devBound = (upper - lower) / Rational.two
    val shifted = shiftToDeviations(inputDomain, measureColumn, midpoint)
    val sumM = createSumMeasurement(
      shifted.outputDomain.asInstanceOf[DataFrameDomain],
      inputMetric,
      kind,
      dIn,
      halfBudget,
      measureColumn,
      -devBound,
      devBound,
      groupKeys,
      sumColumn = "sod"
    )
    val countM = createCountMeasurement(
      shifted.outputDomain.asInstanceOf[DataFrameDomain],
      inputMetric,
      countKind,
      dIn,
      halfBudget,
      groupKeys,
      countColumn = "count"
    )
    val composed = shifted | Composition(Seq(sumM, countM))
    PostProcess(
      composed,
      { case Seq(sodAny, countAny) =>
        groupKeys match {
          case None =>
            val sod = toD(sodAny); val n = math.max(toD(countAny), 1.0)
            sod / n + midpoint.toDouble
          case Some(_) =>
            val sodDf = sodAny.asInstanceOf[DataFrame]
            val cntDf = countAny.asInstanceOf[DataFrame]
            val keyCols = cntDf.columns.filterNot(_ == "count").toSeq
            val joined = sodDf.join(cntDf, keyCols)
            val withAvg = joined
              .withColumn(
                outputColumn,
                col("sod") / greatest(col("count"), lit(1L)) +
                  lit(midpoint.toDouble)
              )
            if (keepIntermediates) withAvg else withAvg.drop("sod", "count")
        }
      }: Any => Any
    )
  }

  /** Noisy (grouped) variance / stddev via sum-of-deviations, sum of squared
    * deviations and count, a third of the budget each
    * (reference `aggregations.py:1122-1735`). Sample variance (n−1), NaN for
    * noisy count ≤ 1, clamped into [0, (upper−lower)²/4].
    */
  def createVarianceMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      countKind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      lower: Rational,
      upper: Rational,
      groupKeys: Option[DataFrame] = None,
      outputColumn: String = "variance",
      stddev: Boolean = false,
      keepIntermediates: Boolean = false
  ): Measurement = {
    val midpoint = (lower + upper) / Rational.two
    val third = split(budget, 3)
    val devBound = (upper - lower) / Rational.two
    val sqBound = devBound * devBound
    val shifted = shiftToDeviationsWithSquare(inputDomain, measureColumn, midpoint)
    val shiftedDomain = shifted.outputDomain.asInstanceOf[DataFrameDomain]
    val sodM = createSumMeasurement(
      shiftedDomain, inputMetric, kind, dIn, third, "__dev",
      -devBound, devBound, groupKeys, sumColumn = "sod")
    val sosM = createSumMeasurement(
      shiftedDomain, inputMetric, kind, dIn, third, "__dev2",
      Rational.zero, sqBound, groupKeys, sumColumn = "sos")
    val countM = createCountMeasurement(
      shiftedDomain, inputMetric, countKind, dIn, third, groupKeys,
      countColumn = "count")
    val composed = shifted | Composition(Seq(sodM, sosM, countM))
    // Reference semantics (aggregations.py:1348-1386): SAMPLE variance
    // (n−1 denominator), NaN when the noisy count ≤ 1 (sample variance of
    // ≤ 1 points is undefined), clamped into [0, (upper−lower)²/4] (the
    // largest variance attainable inside the clip bounds).
    val clampHi = sqBound.toDouble
    PostProcess(
      composed,
      { case Seq(sodAny, sosAny, countAny) =>
        groupKeys match {
          case None =>
            val sod = toD(sodAny); val sos = toD(sosAny)
            val n = toD(countAny)
            val v =
              if (n <= 1.0) Double.NaN
              else
                math.min(
                  math.max((sos - sod * sod / n) / (n - 1.0), 0.0),
                  clampHi)
            if (stddev) math.sqrt(v) else v
          case Some(_) =>
            val sodDf = sodAny.asInstanceOf[DataFrame]
            val sosDf = sosAny.asInstanceOf[DataFrame]
            val cntDf = countAny.asInstanceOf[DataFrame]
            val keyCols = cntDf.columns.filterNot(_ == "count").toSeq
            val joined = sodDf.join(sosDf, keyCols).join(cntDf, keyCols)
            val n = col("count").cast("double")
            val sampleVar = least(
              greatest(
                (col("sos") - col("sod") * col("sod") / n) / (n - lit(1.0)),
                lit(0.0)),
              lit(clampHi))
            val variance =
              when(col("count") <= 1L, lit(Double.NaN)).otherwise(sampleVar)
            val withVar = joined
              .withColumn(outputColumn, if (stddev) sqrt(variance) else variance)
            if (keepIntermediates) withVar
            else withVar.drop("sod", "sos", "count")
        }
      }: Any => Any
    )
  }

  /** Noisy standard deviation — the reference's separate factory
    * (`aggregations.py:1552-1735`); same pipeline as variance with a final
    * square root.
    */
  def createStandardDeviationMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      kind: NoiseKind,
      countKind: NoiseKind,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      lower: Rational,
      upper: Rational,
      groupKeys: Option[DataFrame] = None,
      outputColumn: String = "stddev",
      keepIntermediates: Boolean = false
  ): Measurement =
    createVarianceMeasurement(
      inputDomain, inputMetric, kind, countKind, dIn, budget, measureColumn,
      lower, upper, groupKeys, outputColumn, stddev = true,
      keepIntermediates = keepIntermediates)

  /** Noisy per-group quantile (reference `aggregations.py:1736-1902`). */
  def createQuantileMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      quantile: Double,
      lower: Double,
      upper: Double,
      groupKeys: DataFrame,
      outputColumn: String = "quantile"
  ): Measurement = {
    val groupBy = GroupBy(inputDomain, inputMetric, useL2 = false, groupKeys)
    val gDomain = groupBy.outputDomain.asInstanceOf[GroupedDataFrameDomain]
    val dMid = groupBy.stabilityFunction(dIn)
    val (eps, measure) = budget match {
      case PureDPBudget(e) =>
        (
          if (e.isFinite)
            Some((e / dMid.max(ExactNum.one)).toDouble)
          else None,
          PureDP: Measure
        )
      case RhoZCDPBudget(r) =>
        // ρ = (ε·d)²/8 → ε = √(8ρ)/d
        (
          if (r.isFinite)
            Some(
              math.sqrt(8.0 * r.toDouble) / dMid.max(ExactNum.one).toDouble
            )
          else None,
          RhoZCDP: Measure
        )
      case b => throw new IllegalArgumentException(s"unsupported budget $b")
    }
    groupBy | NoisyQuantileGrouped(
      gDomain,
      groupBy.outputMetric,
      measureColumn,
      quantile,
      lower,
      upper,
      eps,
      measure,
      outputColumn
    )
  }

  /** DP key discovery (reference `aggregations.py:1993-2058`): α = d_in/ε,
    * threshold τ = inverse-CMF(1 − δ', α) + 2 where δ' = δ (d_in = 1) or
    * δ/(d_in·e^{d_in/α}) (d_in > 1) — the reference's exact inversion
    * (`distributions.py:184-203`). The inverse CMF is decided EXACTLY:
    * δ' and the CMF inequalities live in ExactNum's `c·√s·e^q` closure,
    * so "smallest k with CMF(k) ≥ 1 − δ'" is a handful of exact sign
    * tests around a double-precision log-space candidate — no rounding
    * pad, the ceiling can neither land low (unsound δ) nor high (wasted
    * utility).
    */
  def createPartitionSelectionMeasurement(
      inputDomain: DataFrameDomain,
      epsilon: Double,
      delta: Double,
      dIn: ExactNum,
      countColumn: String = "count"
  ): GeometricPartitionSelection = {
    require(epsilon > 0 && delta > 0 && delta < 1)
    val dR = dIn.toRational
    // Fractional d_in: the reference refuses (NotImplementedError) rather
    // than claim a linearly-scaled ε the δ derivation doesn't support.
    require(dR >= Rational(1), s"d_in must be >= 1, got $dIn")
    // Infinite budget is the deterministic path: α = 0 (no noise),
    // threshold 0 — every key released (reference aggregations.py:2045-2049).
    if (epsilon.isInfinite)
      return GeometricPartitionSelection(inputDomain, Rational.zero, 0L, countColumn)
    val alpha = Rational.fromDouble(dR.toDouble / epsilon)
    val invA = alpha.reciprocal
    val one = ExactNum.one
    val deltaPrime: ExactNum =
      if (dR <= Rational(1)) ExactNum(Rational.fromDouble(delta))
      else ExactNum(Rational.fromDouble(delta) / dR) *
        ExactNum.expOf(-(dR * invA))
    val e1p1 = ExactNum.expOf(invA) + one // e^{1/α} + 1
    // CMF(k) ≥ 1 − δ' exactly (distributions.py:121-142):
    //   k > 0: e^{−k/α} ≤ δ'·(e^{1/α}+1)
    //   k ≤ 0: e^{(k+1)/α} ≥ (1−δ')·(e^{1/α}+1)
    val argHi = deltaPrime * e1p1
    val argLo = (one - deltaPrime) * e1p1
    def ok(k: Long): Boolean =
      if (k > 0) (argHi - ExactNum.expOf(-(Rational(k) * invA))).signum >= 0
      else (ExactNum.expOf(Rational(k + 1) * invA) - argLo).signum >= 0
    // log-space double candidate (underflow-safe) from the reference
    // branch matching δ's regime (distributions.py:184-203): small δ'
    // inverts the k > 0 tail, δ' ≥ 1/2 inverts the k ≤ 0 CMF — then an
    // exact bracket + binary search with ok(k), so a coarse candidate
    // (large α, large δ') can be thousands of steps off and the result
    // is still the exact smallest k.
    val e1d = invA.toDouble
    val lnDeltaPrime = math.log(delta) - math.log(dR.toDouble) -
      (if (dR <= Rational(1)) 0.0 else (dR * invA).toDouble)
    val lnE1p1 = e1d + math.log1p(math.exp(-e1d))
    val deltaPrimeD = math.exp(lnDeltaPrime)
    val k0 =
      if (deltaPrimeD < 0.5)
        math.ceil(-(lnDeltaPrime + lnE1p1) * alpha.toDouble).toLong
      else // k ≤ 0 branch: e^{(k+1)/α} ≥ (1−δ')(e^{1/α}+1)
        math.ceil(
          (math.log1p(-deltaPrimeD) + lnE1p1) * alpha.toDouble - 1.0).toLong
    // bracket [lo, hi] with !ok(lo) && ok(hi) by exponential expansion
    var hi = k0
    var step = 1L
    while (!ok(hi)) { hi += step; step *= 2 }
    var lo = math.min(k0, hi) - 1
    step = 1L
    while (ok(lo)) { lo -= step; step *= 2 }
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      if (ok(mid)) hi = mid else lo = mid
    }
    GeometricPartitionSelection(inputDomain, alpha, hi + 2L, countColumn)
  }

  /** DP bounds finding (reference `aggregations.py:2059-2332`): bin |x| by
    * powers of two, run sparse-vector above-threshold over the per-bin
    * prefix sums, return symmetric bounds ±2^selected per group.
    *
    * Bin index follows the reference exactly (`aggregations.py:2216-2226`):
    * rank = ceil(log2(|x|)) clamped to [0, 100] for integer columns and
    * [-100, 100] for float columns, with x = 0 mapping to the clamp floor.
    * The rank is computed exactly — a log2 candidate with a two-sided
    * power-of-two fix-up — so an exact power 2^k bins to k, never k+1.
    * Before the SVT scan, EVERY bin in the domain's bucket range is
    * materialized with a zero count (the reference's outer-joined bucket
    * group keys, `aggregations.py:2205-2212,2283-2296`): the noisy scan
    * draws noise for empty bins too and can select one, and its fallback
    * is the global top bin. Integer ranks above the bucket range
    * (size-2, e.g. 62 for BIGINT) fall outside the materialized keys and
    * are dropped, as in the reference.
    */
  def createBoundsMeasurement(
      inputDomain: DataFrameDomain,
      inputMetric: Metric,
      dIn: ExactNum,
      budget: PrivacyBudget,
      measureColumn: String,
      groupColumns: Seq[String] = Nil,
      lowerColumn: String = "lower",
      upperColumn: String = "upper"
  ): Measurement = {
    val eps = budget match {
      case PureDPBudget(e) => e
      case b => throw new IllegalArgumentException(s"bounds needs PureDP, got $b")
    }
    val alpha: Rational =
      if (!eps.isFinite) Rational.zero
      else (ExactNum(4) * dIn / eps).toRational
    val svtDomain = DataFrameDomain(
      groupColumns.map(c => c -> inputDomain(c)) ++
        Seq("rank" -> ColumnDescriptor.long, "count" -> ColumnDescriptor.long)
    )
    val svt = SparseVectorPrefixSums(
      svtDomain, groupColumns, "rank", "count", alpha, "__sel")
    val inDomain0: Domain = inputDomain
    val inMetric0: Metric = inputMetric
    // bucket range: integer columns get [0, size-2], floats [-100, 100]
    // (reference aggregations.py:2205-2212)
    val measureType = inputDomain(measureColumn).dataType
    val isIntColumn =
      measureType == org.apache.spark.sql.types.LongType ||
        measureType == org.apache.spark.sql.types.IntegerType
    val (binLo, binHi) =
      if (measureType == org.apache.spark.sql.types.IntegerType) (0L, 30L)
      else if (measureType == org.apache.spark.sql.types.LongType) (0L, 62L)
      else (-100L, 100L)
    val clampLo = if (isIntColumn) 0L else -100L
    val prep = new graft.core.Transformation {
      def inputDomain: Domain = inDomain0
      def outputDomain: Domain = svtDomain
      def inputMetric: Metric = inMetric0
      def outputMetric: Metric = OnColumn("count", SumOf(AbsoluteDifference))
      def stabilityFunction(d: ExactNum): ExactNum = d
      def apply(data: Any): Any = {
        val df = data.asInstanceOf[DataFrame]
        val mag = abs(col(measureColumn).cast("double"))
        // exact ceil(log2(mag)): float log2 candidate, then a two-sided
        // power-of-two fix-up (2^k is exact in doubles for |k| <= 1023)
        val r0 = ceil(log2(mag)).cast("long")
        val rExact = when(pow(lit(2.0), (r0 - 1).cast("double")) >= mag, r0 - 1)
          .when(pow(lit(2.0), r0.cast("double")) < mag, r0 + 1)
          .otherwise(r0)
        val rank = when(mag === 0.0, lit(clampLo))
          .otherwise(least(greatest(rExact, lit(clampLo)), lit(100L)))
        val counts = df
          .withColumn("rank", rank)
          .groupBy((groupColumns.map(col) :+ col("rank")): _*)
          .agg(count(lit(1)).as("count"))
        // materialize the full bucket range per group with zero counts —
        // ranks outside [binLo, binHi] (int ranks above size-2) drop out
        val spark = df.sparkSession
        val bins = spark.range(binLo, binHi + 1L).toDF("rank")
        val full =
          if (groupColumns.isEmpty) {
            bins.join(counts, Seq("rank"), "left")
          } else {
            // null-safe (<=>) on the group columns: a NULL group key must
            // find its own counts, not be zero-filled into a spurious
            // extra bounds row (reference joins with nulls_are_equal=True,
            // aggregations.py:2283-2296)
            val keyed = df.select(groupColumns.map(col): _*).distinct()
              .crossJoin(broadcast(bins))
            val rhs = counts.select(
              (groupColumns.map(c => col(c).as(s"__r_$c")) :+
                col("rank").as("__r_rank") :+ col("count")): _*)
            val cond = groupColumns
              .map(c => keyed(c) <=> rhs(s"__r_$c"))
              .reduce(_ && _) && keyed("rank") === rhs("__r_rank")
            keyed.join(rhs, cond, "left")
              .select((groupColumns.map(keyed(_)) :+ keyed("rank") :+
                rhs("count")): _*)
          }
        full.na.fill(0L, Seq("count"))
      }
    }
    PostProcess(
      prep | svt,
      { any =>
        val df = any.asInstanceOf[DataFrame]
        df.withColumn(upperColumn, pow(lit(2.0), col("__sel")))
          .withColumn(lowerColumn, -col(upperColumn))
          .drop("__sel")
      }: Any => Any
    )
  }

  // ---- helpers ----

  private def toD(v: Any): Double = v match {
    case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
    case other => other.toString.toDouble
  }

  private def halve(b: PrivacyBudget): PrivacyBudget = split(b, 2)

  private def split(b: PrivacyBudget, k: Int): PrivacyBudget = {
    val kE = ExactNum(k.toLong)
    b match {
      case PureDPBudget(e)      => PureDPBudget(if (e.isFinite) e / kE else e)
      case RhoZCDPBudget(r)     => RhoZCDPBudget(if (r.isFinite) r / kE else r)
      case ApproxDPBudget(e, d) =>
        ApproxDPBudget(if (e.isFinite) e / kE else e, d / kE)
    }
  }

  /** Replace the measure column by its double deviation from the exact
    * midpoint (reference `aggregations.py:1934-1990`).
    */
  private def shiftToDeviations(
      domain: DataFrameDomain,
      measureColumn: String,
      midpoint: Rational
  ): Transformation = {
    val outDomain = domain.withColumn(measureColumn, ColumnDescriptor.double())
    new StableDfTransformation {
      def inputDomain: Domain = domain
      def outputDomain: Domain = outDomain
      def inputMetric: Metric = SymmetricDifference
      def outputMetric: Metric = SymmetricDifference
      def applyDf(df: DataFrame): DataFrame =
        df.withColumn(
          measureColumn,
          col(measureColumn).cast("double") - lit(midpoint.toDouble)
        )
    }
  }

  /** Adds __dev and __dev2 (deviation and squared deviation) columns. */
  private def shiftToDeviationsWithSquare(
      domain: DataFrameDomain,
      measureColumn: String,
      midpoint: Rational
  ): Transformation = {
    val outDomain = domain
      .withColumn("__dev", ColumnDescriptor.double())
      .withColumn("__dev2", ColumnDescriptor.double())
    new StableDfTransformation {
      def inputDomain: Domain = domain
      def outputDomain: Domain = outDomain
      def inputMetric: Metric = SymmetricDifference
      def outputMetric: Metric = SymmetricDifference
      def applyDf(df: DataFrame): DataFrame =
        df.withColumn(
            "__dev",
            col(measureColumn).cast("double") - lit(midpoint.toDouble)
          )
          .withColumn("__dev2", pow(col("__dev"), 2))
    }
  }

  private implicit class RationalOps(r: Rational) {
    def floorInt: Rational = Rational(r.num / r.den)
    def ceilInt: Rational =
      if (r.isWhole) r else Rational(r.num / r.den + (if (r.signum > 0) 1 else 0))
  }
}
