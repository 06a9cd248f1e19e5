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
  * so it participates in whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dpNoise)
    ext.injectFunction(GraftFunctions.dpCount)
    ext.injectFunction(GraftFunctions.dpSum)
    ext.injectFunction(GraftFunctions.dpAvg)
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
        case n: java.lang.Number  => Rational(n.longValue())
        case d: java.math.BigDecimal => Rational.fromDouble(d.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => Rational.fromDouble(d.toDouble)
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
      case n: java.lang.Number     => Rational(n.longValue())
      case d: java.math.BigDecimal => Rational.fromDouble(d.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Rational.fromDouble(d.toDouble)
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

  /** Register into an existing session (the extensions class does this for
    * sessions built with `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit = {
    Seq(dpNoise, dpCount, dpSum, dpAvg).foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }
}
