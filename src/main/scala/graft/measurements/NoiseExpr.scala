package graft.measurements

import graft.exact.Rational
import graft.random.{Samplers, SplitMix}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The four noise mechanisms (reference `noise_mechanisms.py`). Scales are
  * exact rationals for the discrete mechanisms; zero scale means "add no
  * noise" (the deterministic path used by the correctness oracle, reference
  * `spark_measurements.py:239-240`).
  */
sealed trait NoiseMechanism extends Serializable {
  def isDiscrete: Boolean
  def addsNoNoise: Boolean
}
final case class GeometricMechanism(alpha: Rational) extends NoiseMechanism {
  require(alpha.signum >= 0)
  def isDiscrete = true
  def addsNoNoise: Boolean = alpha.isZero
}
final case class DiscreteGaussianMechanism(sigmaSquared: Rational)
    extends NoiseMechanism {
  require(sigmaSquared.signum >= 0)
  def isDiscrete = true
  def addsNoNoise: Boolean = sigmaSquared.isZero
}
final case class LaplaceMechanism(scale: Rational) extends NoiseMechanism {
  require(scale.signum >= 0)
  def isDiscrete = false
  def addsNoNoise: Boolean = scale.isZero
}
final case class GaussianMechanism(sigmaSquared: Rational)
    extends NoiseMechanism {
  require(sigmaSquared.signum >= 0)
  def isDiscrete = false
  def addsNoNoise: Boolean = sigmaSquared.isZero
}

/** Nondeterministic Catalyst expression adding mechanism noise to a numeric
  * column — the engine's replacement for the reference's
  * `pandas_udf(...).asNondeterministic()` (`spark_measurements.py:241-245`):
  * no Arrow hop, no Python worker, runs inside the JVM task.
  *
  * Pattern follows `org.apache.spark.sql.catalyst.expressions.Rand`
  * (seed + partition index → per-partition RNG).
  */
case class AddNoise(
    child: Expression,
    mechanism: NoiseMechanism,
    seed: Long
) extends UnaryExpression
    with Nondeterministic
    with CodegenFallback {

  override def dataType: DataType =
    if (mechanism.isDiscrete) LongType else DoubleType
  override def nullable: Boolean = child.nullable

  @transient private var rng: graft.random.RandomSource = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new SplitMix(seed ^ (partitionIndex.toLong * 0x9e3779b97f4a7c15L))

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else
      mechanism match {
        case GeometricMechanism(a) =>
          val x = toLong(v)
          if (a.isZero) x
          else x + Samplers.discreteLaplace(a, rng).toLong
        case DiscreteGaussianMechanism(s2) =>
          val x = toLong(v)
          if (s2.isZero) x
          else x + Samplers.discreteGaussian(s2, rng).toLong
        case LaplaceMechanism(b) =>
          val x = toDouble(v)
          if (b.isZero) x else x + Samplers.laplace(b.toDouble, rng)
        case GaussianMechanism(s2) =>
          val x = toDouble(v)
          if (s2.isZero) x
          else x + Samplers.gaussian(math.sqrt(s2.toDouble), rng)
      }
  }

  private def toLong(v: Any): Long = v match {
    case l: Long   => l
    case i: Int    => i.toLong
    case s: Short  => s.toLong
    case other     => other.toString.toLong
  }
  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case other     => other.toString.toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): AddNoise =
    copy(child = newChild)
}

object AddNoise {
  /** Column wrapper: `noisy(col("count"), GeometricMechanism(alpha))`. */
  def apply(column: Column, mechanism: NoiseMechanism): Column =
    ColumnShim.column(
      AddNoise(
        ColumnShim.expression(column),
        mechanism,
        graft.random.RandomSource.secureSeed()
      )
    )
}
