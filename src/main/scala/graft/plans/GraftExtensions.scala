package graft.plans

import graft.exact.Rational
import graft.measurements._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
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
  def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.dpNoise)
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

  /** Register into an existing session (the extensions class does this for
    * sessions built with `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = dpNoise
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
