package graft.ops

import graft.exact.Rational
import graft.measurements.{AddNoise, ExpPolylogMechanism, GaussianMechanism, SqrtGaussianMechanism}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-record differential privacy mechanisms (reference `utils/prdp.py`):
  * column-level noise whose magnitude adapts to each record's value via a
  * monotone transformation — T⁻¹(T(x) + N(0, σ²)).
  *
  * Spark-first: the transformation mechanisms are ordinary column arithmetic
  * around the engine's codegen'd [[AddNoise]] Gaussian expression (one
  * whole-stage-codegen span per row, no UDF); the two bespoke distributions
  * (shape-1/2 generalized Gaussian, exponential polylogarithmic) are extra
  * [[graft.measurements.NoiseMechanism]] kinds sampled by inverse CDF in
  * `graft.random.Prdp`. σ = 0 is the exact noise-free path on every
  * mechanism (used by the correctness oracle).
  */
object PerRecordDp {

  private def gaussNoise(c: Column, sigma: Double): Column =
    AddNoise(c, GaussianMechanism(Rational.fromDouble(sigma * sigma)))

  /** (T(x)+N)⁴ − offset with T(x) = (x+offset)^¼ (reference `prdp.py:25-45`). */
  def fourthRootTransformationMechanism(
      x: Column,
      offset: Double,
      sigma: Double
  ): Column =
    pow(gaussNoise(pow(x + lit(offset), lit(0.25)), sigma), 4) - lit(offset)

  /** (T(x)+N)² − offset with T(x) = √(x+offset) (reference `prdp.py:48-66`). */
  def squareRootTransformationMechanism(
      x: Column,
      offset: Double,
      sigma: Double
  ): Column =
    pow(gaussNoise(sqrt(x + lit(offset)), sigma), 2) - lit(offset)

  /** e^{T(x)+N} − offset with T(x) = ln(x+offset) (reference `prdp.py:69-89`). */
  def logTransformationMechanism(
      x: Column,
      offset: Double,
      sigma: Double
  ): Column =
    exp(gaussNoise(log(x + lit(offset)), sigma)) - lit(offset)

  /** x + shape-1/2 generalized-Gaussian noise (reference `prdp.py:151-156`). */
  def squareRootGaussianMechanism(x: Column, sigma: Double): Column =
    AddNoise(x, SqrtGaussianMechanism(Rational.fromDouble(sigma)))

  /** x + exponential-polylogarithmic noise (reference `prdp.py:290-302`). */
  def exponentialPolylogarithmicMechanism(
      x: Column,
      d: Double,
      a: Double,
      sigma: Double
  ): Column =
    AddNoise(
      x,
      ExpPolylogMechanism(
        Rational.fromDouble(d),
        Rational.fromDouble(a),
        Rational.fromDouble(sigma)))
}
