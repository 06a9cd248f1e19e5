package graft.measurements

import graft.exact.Rational
import graft.random.{RandomSource, Samplers, SplitMix}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

/** Per-record DP additive mechanisms (reference `utils/prdp.py`): shape-1/2
  * generalized Gaussian and exponential-polylogarithmic noise.
  */
final case class SqrtGaussianMechanism(sigma: Rational) extends NoiseMechanism {
  require(sigma.signum >= 0)
  def isDiscrete = false
  def addsNoNoise: Boolean = sigma.isZero
}
final case class ExpPolylogMechanism(d: Rational, a: Rational, sigma: Rational)
    extends NoiseMechanism {
  require(d.signum > 0 && a.signum > 0 && sigma.signum >= 0)
  def isDiscrete = false
  def addsNoNoise: Boolean = sigma.isZero
}

/** Nondeterministic Catalyst expression adding mechanism noise to a numeric
  * column — the engine's replacement for the reference's
  * `pandas_udf(...).asNondeterministic()` (`spark_measurements.py:241-245`):
  * no Arrow hop, no Python worker, runs inside the JVM task.
  *
  * Pattern follows `org.apache.spark.sql.catalyst.expressions.Rand`
  * (seed + partition index → per-partition RNG).
  *
  * Throughput note: Geometric/DiscreteGaussian sample in ~1µs (exact BigInt
  * rejection); continuous Laplace/Gaussian go through the exactly-rounded
  * interval sampler (graft.random.Precise) at ~50µs / ~300µs per draw —
  * reference-parity semantics, so per-row continuous noise over billions of
  * rows costs real CPU. Group-level releases (the normal DP shape) draw once
  * per group and don't notice; for per-row continuous noise where exact
  * rounding is not required, Samplers.laplaceFast/gaussianFast exist but are
  * NOT reference-parity (documented granularity gaps near 0).
  */
case class AddNoise(
    child: Expression,
    mechanism: NoiseMechanism,
    seed: Long
) extends UnaryExpression
    with Nondeterministic {

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
        case SqrtGaussianMechanism(s) =>
          val x = toDouble(v)
          if (s.isZero) x
          else x + graft.random.Prdp.sqrtGaussian(s.toDouble, rng)
        case ExpPolylogMechanism(d, a, s) =>
          val x = toDouble(v)
          if (s.isZero) x
          else
            x + graft.random.Prdp.expPolylog(d.toDouble, a.toDouble, s.toDouble, rng)
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

  /** Codegen keeps the noise inside the whole-stage span (no fallback row
    * conversion): a per-partition RNG is installed via a partition-init
    * statement (pattern: `expressions.Rand`), the sampling itself runs in
    * [[NoiseGen]].
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngClass = classOf[RandomSource].getName
    val rngTerm = ctx.addMutableState(rngClass, "graftNoiseRng")
    ctx.addPartitionInitializationStatement(
      s"$rngTerm = new graft.random.SplitMix(" +
        s"${seed}L ^ (partitionIndex * ${0x9e3779b97f4a7c15L}L));"
    )
    val mechRef =
      ctx.addReferenceObj("graftMech", mechanism, classOf[NoiseMechanism].getName)
    val fn = if (mechanism.isDiscrete) "addLong" else "addDouble"
    defineCodeGen(
      ctx,
      ev,
      input => s"graft.measurements.NoiseGen.$fn($mechRef, $rngTerm, $input)"
    )
  }
}

/** Static sampling kernel shared by the interpreted and generated paths. */
object NoiseGen {
  def addLong(mech: NoiseMechanism, rng: RandomSource, v: Long): Long =
    mech match {
      case GeometricMechanism(a) =>
        if (a.isZero) v else v + Samplers.discreteLaplace(a, rng).toLong
      case DiscreteGaussianMechanism(s2) =>
        if (s2.isZero) v else v + Samplers.discreteGaussian(s2, rng).toLong
      case m => throw new IllegalArgumentException(s"not discrete: $m")
    }

  def addDouble(mech: NoiseMechanism, rng: RandomSource, v: Double): Double =
    mech match {
      case LaplaceMechanism(b) =>
        if (b.isZero) v else v + Samplers.laplace(b.toDouble, rng)
      case GaussianMechanism(s2) =>
        if (s2.isZero) v else v + Samplers.gaussian(math.sqrt(s2.toDouble), rng)
      case SqrtGaussianMechanism(s) =>
        if (s.isZero) v else v + graft.random.Prdp.sqrtGaussian(s.toDouble, rng)
      case ExpPolylogMechanism(d, a, s) =>
        if (s.isZero) v
        else v + graft.random.Prdp.expPolylog(d.toDouble, a.toDouble, s.toDouble, rng)
      case m => throw new IllegalArgumentException(s"not continuous: $m")
    }
}

object AddNoise {
  /** Column wrapper: `noisy(col("count"), GeometricMechanism(alpha))`.
    * Casts the input to the mechanism's carrier type so the generated code
    * is a straight primitive call.
    */
  def apply(column: Column, mechanism: NoiseMechanism): Column = {
    val cast = if (mechanism.isDiscrete) column.cast("long")
               else column.cast("double")
    ColumnShim.column(
      AddNoise(
        ColumnShim.expression(cast),
        mechanism,
        graft.random.RandomSource.secureSeed()
      )
    )
  }
}

/** Partition-selection release gate (reference `spark_measurements.py:
  * 367-587` keeps rows whose noisy count clears the threshold): passes the
  * child value through when ≥ `threshold`, nulls it otherwise. The point of
  * making this ONE expression rather than a SQL CASE is single evaluation —
  * the child is the nondeterministic noisy count, and the released value
  * must be the same draw that was compared, never a second one.
  */
case class ThresholdOrNull(child: Expression, threshold: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "threshold_or_null"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val l = v.asInstanceOf[Long]
      if (l >= threshold) l else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c >= ${threshold}L) { ${ev.value} = $c; }
         |else { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ThresholdOrNull =
    copy(child = newChild)
}
