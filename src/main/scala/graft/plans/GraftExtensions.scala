package graft.plans

import graft.exact.Rational
import graft.measurements._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** SQL surface for the DP primitives, injected via `SparkSessionExtensions`
  * (`spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  * {{{
  *   SELECT k, dp_noise(count(*), 'geometric', 2.0) AS noisy_count
  *   FROM t GROUP BY k
  * }}}
  *
  * `dp_noise(value, mechanism, scale)` — mechanism ∈ geometric | laplace |
  * gaussian | discrete_gaussian; scale is α / b / σ² per mechanism; scale 0
  * adds no noise. The function lowers to the native [[AddNoise]] expression,
  * so it participates in whole-stage codegen like any built-in. The
  * aggregate forms — dp_count, dp_sum, dp_avg, dp_var, dp_stddev,
  * dp_quantile — lower to the same factory decompositions the programmatic
  * API builds (Aggregations.create*Measurement), one Aggregate node each.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dpNoise)
    ext.injectFunction(GraftFunctions.dpCount)
    ext.injectFunction(GraftFunctions.dpCountDistinct)
    ext.injectFunction(GraftFunctions.dpSum)
    ext.injectFunction(GraftFunctions.dpAvg)
    ext.injectFunction(GraftFunctions.dpVar)
    ext.injectFunction(GraftFunctions.dpStddev)
    ext.injectFunction(GraftFunctions.dpQuantile)
    ext.injectFunction(GraftFunctions.dpPartitionCount)
    ext.injectFunction(GraftFunctions.heavyHitters)
    ext.injectFunction(GraftFunctions.jaroWinklerFn)
    ext.injectFunction(GraftFunctions.dpBounds)
  }
}

object GraftFunctions {

  val dpNoise: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_noise"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_noise",
      "dp_noise(value, mechanism, scale) - adds calibrated DP noise",
      "dp_noise(count(*), 'geometric', 2.0)"
    ),
    (children: Seq[Expression]) => {
      require(
        children.size == 3,
        "dp_noise(value, mechanism, scale) takes exactly 3 arguments"
      )
      val Seq(value, mechExpr, scaleExpr) = children
      require(
        mechExpr.foldable && scaleExpr.foldable,
        "dp_noise mechanism and scale must be literals"
      )
      val mechName = String.valueOf(mechExpr.eval()).toLowerCase
      val scale = scaleExpr.eval() match {
        case d: java.lang.Double  => Rational.fromDouble(d)
        case f: java.lang.Float   => Rational.fromDouble(f.toDouble)
        // BigDecimal IS a java.lang.Number: it must match BEFORE the
        // integral catch-all or a fractional scale would truncate
        case d: java.math.BigDecimal => Rational.fromDouble(d.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => Rational.fromDouble(d.toDouble)
        case n: java.lang.Number  => Rational(n.longValue())
        case other => throw new IllegalArgumentException(s"bad scale: $other")
      }
      val mechanism: NoiseMechanism = mechName match {
        case "geometric"         => GeometricMechanism(scale)
        case "laplace"           => LaplaceMechanism(scale)
        case "gaussian"          => GaussianMechanism(scale)
        case "discrete_gaussian" => DiscreteGaussianMechanism(scale)
        case other =>
          throw new IllegalArgumentException(s"unknown mechanism: $other")
      }
      val cast =
        if (mechanism.isDiscrete) Cast(value, LongType)
        else Cast(value, DoubleType)
      AddNoise(cast, mechanism, graft.random.RandomSource.secureSeed())
    }
  )

  private def parseMechanism(
      name: String,
      mechExpr: Expression,
      scaleExpr: Expression
  ): NoiseMechanism = {
    require(
      mechExpr.foldable && scaleExpr.foldable,
      s"$name mechanism and scale must be literals")
    val mechName = String.valueOf(mechExpr.eval()).toLowerCase
    val scale = scaleExpr.eval() match {
      case d: java.lang.Double     => Rational.fromDouble(d)
      case f: java.lang.Float      => Rational.fromDouble(f.toDouble)
      // BigDecimal IS a java.lang.Number: match before the integral
      // catch-all or a fractional scale would truncate
      case d: java.math.BigDecimal => Rational.fromDouble(d.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Rational.fromDouble(d.toDouble)
      case n: java.lang.Number     => Rational(n.longValue())
      case other => throw new IllegalArgumentException(s"bad scale: $other")
    }
    mechName match {
      case "geometric"         => GeometricMechanism(scale)
      case "laplace"           => LaplaceMechanism(scale)
      case "gaussian"          => GaussianMechanism(scale)
      case "discrete_gaussian" => DiscreteGaussianMechanism(scale)
      case other =>
        throw new IllegalArgumentException(s"unknown mechanism: $other")
    }
  }

  /** `dp_count(mechanism, scale)` — a noisy COUNT(*) aggregate: lowers to the
    * built-in Count wrapped in [[AddNoise]], so `SELECT k, dp_count(
    * 'geometric', 2.0) FROM t GROUP BY k` is a one-expression DP groupby.
    */
  val dpCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_count"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_count",
      "dp_count(mechanism, scale) - noisy COUNT(*)",
      "dp_count('geometric', 2.0)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dp_count(mechanism, scale) takes 2 arguments")
      val Seq(mechExpr, scaleExpr) = children
      val mechanism = parseMechanism("dp_count", mechExpr, scaleExpr)
      require(mechanism.isDiscrete, "dp_count needs a discrete mechanism")
      val agg = aggregate.Count(Seq(expressions.Literal(1)))
        .toAggregateExpression()
      AddNoise(Cast(agg, LongType), mechanism,
        graft.random.RandomSource.secureSeed())
    }
  )

  /** `dp_count_distinct(col, ..., mechanism, scale)` — a noisy null-safe
    * COUNT(DISTINCT ...): the SQL face of createCountDistinctMeasurement
    * (reference `aggregations.py:361`). The columns are wrapped in a struct
    * before the distinct so an all-null tuple still counts as one distinct
    * row, matching [[graft.transformations.CountDistinct]] — plain SQL
    * `count(DISTINCT x)` would silently drop it.
    */
  val dpCountDistinct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_count_distinct"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_count_distinct",
      "dp_count_distinct(col, ..., mechanism, scale) - noisy null-safe COUNT(DISTINCT ...)",
      "dp_count_distinct(x, 'geometric', 2.0)"
    ),
    (children: Seq[Expression]) => {
      require(children.size >= 3,
        "dp_count_distinct(col, ..., mechanism, scale) takes >= 3 arguments")
      val cols = children.dropRight(2)
      val Seq(mechExpr, scaleExpr) = children.takeRight(2)
      val mechanism = parseMechanism("dp_count_distinct", mechExpr, scaleExpr)
      require(mechanism.isDiscrete, "dp_count_distinct needs a discrete mechanism")
      val key = expressions.CreateStruct(cols)
      val agg = aggregate.Count(Seq(key)).toAggregateExpression(isDistinct = true)
      AddNoise(Cast(agg, LongType), mechanism,
        graft.random.RandomSource.secureSeed())
    }
  )

  /** `dp_sum(value, lower, upper, mechanism, scale)` — a noisy clipped SUM:
    * lowers to Sum(clip(value)) wrapped in [[AddNoise]].
    */
  val dpSum: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_sum"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_sum",
      "dp_sum(value, lower, upper, mechanism, scale) - noisy clipped SUM",
      "dp_sum(x, 0.0, 50.0, 'laplace', 25.0)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 5,
        "dp_sum(value, lower, upper, mechanism, scale) takes 5 arguments")
      val Seq(value, loE, hiE, mechExpr, scaleExpr) = children
      require(loE.foldable && hiE.foldable, "dp_sum bounds must be literals")
      val mechanism = parseMechanism("dp_sum", mechExpr, scaleExpr)
      val carrier = if (mechanism.isDiscrete) LongType else DoubleType
      val clipped = expressions.Least(Seq(
        expressions.Greatest(Seq(Cast(value, carrier), Cast(loE, carrier))),
        Cast(hiE, carrier)))
      val agg = aggregate.Sum(clipped).toAggregateExpression()
      AddNoise(Cast(agg, carrier), mechanism,
        graft.random.RandomSource.secureSeed())
    }
  )

  /** `dp_avg(value, lower, upper, sum_mechanism, sum_scale, count_mechanism,
    * count_scale)` — noisy average via the factory decomposition
    * (createAverageMeasurement): noisy sum of midpoint-deviations divided by
    * the noisy count (floored at 1), plus the midpoint. Both aggregates live
    * in one Aggregate node, exactly like writing sum(x)/count(1) by hand.
    */
  val dpAvg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_avg"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_avg",
      "dp_avg(value, lower, upper, sum_mech, sum_scale, count_mech, count_scale) - noisy average",
      "dp_avg(x, 0.0, 50.0, 'laplace', 62.5, 'geometric', 2.5)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 7,
        "dp_avg(value, lower, upper, sum_mech, sum_scale, count_mech, count_scale) takes 7 arguments")
      val Seq(value, loE, hiE, sumMechE, sumScaleE, cntMechE, cntScaleE) = children
      require(loE.foldable && hiE.foldable, "dp_avg bounds must be literals")
      val sumMech = parseMechanism("dp_avg", sumMechE, sumScaleE)
      val cntMech = parseMechanism("dp_avg", cntMechE, cntScaleE)
      require(cntMech.isDiscrete, "dp_avg count mechanism must be discrete")
      def boundToDouble(v: Any): Double = v match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case d: java.math.BigDecimal               => d.doubleValue()
        case n: java.lang.Number                   => n.doubleValue()
        case other => throw new IllegalArgumentException(s"bad bound: $other")
      }
      val lo = boundToDouble(loE.eval())
      val hi = boundToDouble(hiE.eval())
      require(lo <= hi, s"dp_avg needs lower <= upper, got [$lo, $hi]")
      val mid = (lo + hi) / 2
      val devBound = (hi - lo) / 2
      val clippedDev = expressions.Least(Seq(
        expressions.Greatest(Seq(
          expressions.Subtract(Cast(value, DoubleType),
            expressions.Literal(mid)),
          expressions.Literal(-devBound))),
        expressions.Literal(devBound)))
      val noisySod = AddNoise(
        Cast(aggregate.Sum(clippedDev).toAggregateExpression(), DoubleType),
        sumMech, graft.random.RandomSource.secureSeed())
      val noisyCnt = AddNoise(
        Cast(aggregate.Count(Seq(expressions.Literal(1))).toAggregateExpression(),
          LongType),
        cntMech, graft.random.RandomSource.secureSeed())
      expressions.Add(
        expressions.Divide(
          noisySod,
          Cast(expressions.Greatest(Seq(noisyCnt, expressions.Literal(1L))),
            DoubleType)),
        expressions.Literal(mid))
    }
  )

  /** Shared builder for `dp_var` / `dp_stddev`: the factory decomposition
    * of createVarianceMeasurement (reference `aggregations.py:355-`) as one
    * Aggregate node — noisy Σ clip(x−mid, ±dev), noisy Σ clip((x−mid)²,
    * [0, dev²]) and noisy count recombine to the sample variance, clamped
    * to [0, dev²] (NaN under 2 points), optionally √.
    */
  private def varianceBuilder(
      fname: String,
      sqrt: Boolean
  ): Seq[Expression] => Expression = { (children: Seq[Expression]) =>
    require(children.size == 9,
      s"$fname(value, lower, upper, sod_mech, sod_scale, sos_mech, sos_scale, " +
        "count_mech, count_scale) takes 9 arguments")
    val Seq(value, loE, hiE, sodMechE, sodScaleE, sosMechE, sosScaleE,
      cntMechE, cntScaleE) = children
    require(loE.foldable && hiE.foldable, s"$fname bounds must be literals")
    val sodMech = parseMechanism(fname, sodMechE, sodScaleE)
    val sosMech = parseMechanism(fname, sosMechE, sosScaleE)
    val cntMech = parseMechanism(fname, cntMechE, cntScaleE)
    require(cntMech.isDiscrete, s"$fname count mechanism must be discrete")
    def boundToDouble(v: Any): Double = v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case d: java.math.BigDecimal               => d.doubleValue()
      case n: java.lang.Number                   => n.doubleValue()
      case other => throw new IllegalArgumentException(s"bad bound: $other")
    }
    val lo = boundToDouble(loE.eval())
    val hi = boundToDouble(hiE.eval())
    require(lo <= hi, s"$fname needs lower <= upper, got [$lo, $hi]")
    val mid = (lo + hi) / 2
    val dev = (hi - lo) / 2
    val dev2 = dev * dev
    val x = Cast(value, DoubleType)
    val centered = expressions.Subtract(x, expressions.Literal(mid))
    val clippedDev = expressions.Least(Seq(
      expressions.Greatest(Seq(centered, expressions.Literal(-dev))),
      expressions.Literal(dev)))
    val clippedSq = expressions.Least(Seq(
      expressions.Greatest(Seq(
        expressions.Multiply(centered, centered),
        expressions.Literal(0d))),
      expressions.Literal(dev2)))
    val noisySod = AddNoise(
      Cast(aggregate.Sum(clippedDev).toAggregateExpression(), DoubleType),
      sodMech, graft.random.RandomSource.secureSeed())
    val noisySos = AddNoise(
      Cast(aggregate.Sum(clippedSq).toAggregateExpression(), DoubleType),
      sosMech, graft.random.RandomSource.secureSeed())
    val noisyCnt = AddNoise(
      Cast(aggregate.Count(Seq(expressions.Literal(1))).toAggregateExpression(),
        LongType),
      cntMech, graft.random.RandomSource.secureSeed())
    val n = Cast(noisyCnt, DoubleType)
    val rawVar = expressions.Divide(
      expressions.Subtract(
        noisySos,
        expressions.Divide(expressions.Multiply(noisySod, noisySod), n)),
      expressions.Subtract(n, expressions.Literal(1d)))
    val clamped = expressions.Least(Seq(
      expressions.Greatest(Seq(rawVar, expressions.Literal(0d))),
      expressions.Literal(dev2)))
    val guarded = expressions.If(
      expressions.LessThanOrEqual(noisyCnt, expressions.Literal(1L)),
      expressions.Literal(Double.NaN),
      clamped)
    if (sqrt) expressions.Sqrt(guarded) else guarded
  }

  /** `dp_var(value, lower, upper, sod_mech, sod_scale, sos_mech, sos_scale,
    * count_mech, count_scale)` — noisy clamped sample variance.
    */
  val dpVar: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_var"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_var",
      "dp_var(value, lower, upper, sod_mech, sod_scale, sos_mech, sos_scale, count_mech, count_scale) - noisy sample variance",
      "dp_var(x, 0.0, 50.0, 'laplace', 25.0, 'laplace', 625.0, 'geometric', 2.0)"
    ),
    varianceBuilder("dp_var", sqrt = false)
  )

  /** `dp_stddev(...)` — √ of [[dpVar]]'s clamped variance (same 9 args). */
  val dpStddev: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_stddev"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_stddev",
      "dp_stddev(value, lower, upper, sod_mech, sod_scale, sos_mech, sos_scale, count_mech, count_scale) - noisy standard deviation",
      "dp_stddev(x, 0.0, 50.0, 'laplace', 25.0, 'laplace', 625.0, 'geometric', 2.0)"
    ),
    varianceBuilder("dp_stddev", sqrt = true)
  )

  /** `dp_quantile(value, q, lower, upper, epsilon)` — noisy quantile via
    * the exponential mechanism over gaps ([[graft.plans.DpQuantileAgg]],
    * the SQL face of createQuantileMeasurement, reference
    * `aggregations.py:1736`). `epsilon` must be positive; an infinite
    * epsilon (`cast('Infinity' as double)`) selects the noise-free
    * interpolated quantile, matching `quantile_cont` over clipped values.
    */
  val dpQuantile: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_quantile"),
    new ExpressionInfo(
      classOf[DpQuantileAgg].getName,
      null,
      "dp_quantile",
      "dp_quantile(value, q, lower, upper, epsilon) - noisy quantile (exponential mechanism)",
      "dp_quantile(x, 0.5, 0.0, 50.0, 1.0)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 5,
        "dp_quantile(value, q, lower, upper, epsilon) takes 5 arguments")
      val Seq(value, qE, loE, hiE, epsE) = children
      require(qE.foldable && loE.foldable && hiE.foldable && epsE.foldable,
        "dp_quantile q, bounds, and epsilon must be literals")
      def toD(what: String, v: Any): Double = v match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case d: java.math.BigDecimal               => d.doubleValue()
        case n: java.lang.Number                   => n.doubleValue()
        case other => throw new IllegalArgumentException(s"bad $what: $other")
      }
      val eps = toD("epsilon", epsE.eval())
      val epsilon = if (eps.isPosInfinity) None else Some(eps)
      DpQuantileAgg(
        Cast(value, DoubleType),
        toD("q", qE.eval()), toD("lower", loE.eval()), toD("upper", hiE.eval()),
        epsilon, graft.random.RandomSource.secureSeed()
      ).toAggregateExpression()
    }
  )

  /** `dp_bounds(value, epsilon)` — DP magnitude bounds as
    * `STRUCT<lower, upper>` via the power-of-two-bin SVT scan
    * ([[graft.plans.DpBoundsAgg]], the SQL face of
    * createBoundsMeasurement, reference `aggregations.py:2059`).
    * Infinite epsilon selects the deterministic noise-free scan. */
  val dpBounds: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_bounds"),
    new ExpressionInfo(
      classOf[DpBoundsAgg].getName,
      null,
      "dp_bounds",
      "dp_bounds(value, epsilon) - DP magnitude bounds struct(lower, upper)",
      "dp_bounds(x, 1.0)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "dp_bounds(value, epsilon) takes 2 arguments")
      val Seq(value, epsE) = children
      require(epsE.foldable, "dp_bounds epsilon must be a literal")
      val eps = epsE.eval() match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case d: java.math.BigDecimal               => d.doubleValue()
        case n: java.lang.Number                   => n.doubleValue()
        case other => throw new IllegalArgumentException(s"bad epsilon: $other")
      }
      val epsilon = if (eps.isPosInfinity) None else Some(eps)
      DpBoundsAgg(
        Cast(value, DoubleType), epsilon,
        graft.random.RandomSource.secureSeed()
      ).toAggregateExpression()
    }
  )

  /** `dp_partition_count(alpha, threshold)` — the SQL face of
    * createPartitionSelectionMeasurement (reference `aggregations.py:1993`,
    * mechanism `spark_measurements.py:367-587`): a COUNT(*) with two-sided
    * geometric noise at scale `alpha`, released only when the noisy count
    * clears `threshold`, NULL otherwise. The noisy draw is compared and
    * released as ONE evaluation ([[graft.measurements.ThresholdOrNull]]),
    * so the value a caller filters on is the value they publish:
    *
    * {{{
    *   SELECT k, dp_partition_count(2.0, 5) AS n FROM t
    *   GROUP BY k HAVING n IS NOT NULL
    * }}}
    *
    * `alpha = 0` is the deterministic path (count if ≥ threshold).
    */
  val dpPartitionCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dp_partition_count"),
    new ExpressionInfo(
      classOf[AddNoise].getName,
      null,
      "dp_partition_count",
      "dp_partition_count(alpha, threshold) - noisy COUNT(*), NULL below the release threshold",
      "dp_partition_count(2.0, 5)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "dp_partition_count(alpha, threshold) takes 2 arguments")
      val Seq(alphaE, tauE) = children
      require(alphaE.foldable && tauE.foldable,
        "dp_partition_count alpha and threshold must be literals")
      val alpha = alphaE.eval() match {
        case d: java.lang.Double     => Rational.fromDouble(d)
        case f: java.lang.Float      => Rational.fromDouble(f.toDouble)
        case d: java.math.BigDecimal => Rational.fromDouble(d.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => Rational.fromDouble(d.toDouble)
        case n: java.lang.Number     => Rational(n.longValue())
        case other => throw new IllegalArgumentException(s"bad alpha: $other")
      }
      val tau = tauE.eval() match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(s"bad threshold: $other")
      }
      val agg = aggregate.Count(Seq(expressions.Literal(1)))
        .toAggregateExpression()
      ThresholdOrNull(
        AddNoise(Cast(agg, LongType), GeometricMechanism(alpha),
          graft.random.RandomSource.secureSeed()),
        tau)
    }
  )

  /** `heavy_hitters(item, k)` — the mergeable Misra–Gries summary
    * ([[HeavyHittersAgg]]): `array<struct<item, count_min, count_max>>`
    * with O(k) aggregate state. Not a DP primitive — the scale face of
    * top-item counting (explode it for one row per item):
    *
    * {{{
    *   SELECT h.item, h.count_min, h.count_max
    *   FROM (SELECT heavy_hitters(source, 16) AS hs FROM documents),
    *        LATERAL explode(hs) AS t(h)
    * }}}
    */
  val heavyHitters: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("heavy_hitters"),
    new ExpressionInfo(
      classOf[HeavyHittersAgg].getName,
      null,
      "heavy_hitters",
      "heavy_hitters(item, k) - Misra-Gries top-item summary with deterministic count bounds",
      "heavy_hitters(source, 16)"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 2, "heavy_hitters(item, k) takes 2 arguments")
      val Seq(item, kE) = children
      require(kE.foldable, "heavy_hitters k must be a literal")
      val k = kE.eval() match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(s"bad k: $other")
      }
      HeavyHittersAgg(
        Cast(item, org.apache.spark.sql.types.StringType), k
      ).toAggregateExpression()
    }
  )

  /** Register into an existing session (the extensions class does this for
    * sessions built with `spark.sql.extensions`).
    */
  /** `jaro_winkler(s1, s2)` — the native [[JaroWinkler]] expression. */
  val jaroWinklerFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(
      classOf[JaroWinkler].getName,
      null,
      "jaro_winkler",
      "jaro_winkler(s1, s2) - Jaro-Winkler similarity in [0, 1]",
      "jaro_winkler('martha', 'marhta')"
    ),
    (children: Seq[Expression]) => {
      require(children.size == 2, "jaro_winkler(s1, s2) takes 2 arguments")
      JaroWinkler.build(children(0), children(1))
    }
  )

  def register(spark: SparkSession): Unit = {
    Seq(dpNoise, dpCount, dpCountDistinct, dpSum, dpAvg, dpVar, dpStddev,
        dpQuantile, dpPartitionCount, heavyHitters, jaroWinklerFn,
        dpBounds).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }
}
