package graft.measurements

import graft.core.Measurement
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.metrics._
import graft.random.{RandomSource, Samplers}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object NoisePrivacy {
  /** Privacy loss of one mechanism invocation at sensitivity dIn
    * (reference `noise_mechanisms.py` privacy functions and
    * `utils/parameters.py:17-124`).
    */
  def privacyFunction(mechanism: NoiseMechanism, dIn: ExactNum): PrivacyBudget =
    mechanism match {
      case LaplaceMechanism(b) =>
        if (b.isZero)
          PureDPBudget(if (dIn.isZero) ExactNum.zero else ExactNum.PosInf)
        else PureDPBudget(dIn / ExactNum(b))
      case GeometricMechanism(a) =>
        if (a.isZero)
          PureDPBudget(if (dIn.isZero) ExactNum.zero else ExactNum.PosInf)
        else PureDPBudget(dIn / ExactNum(a))
      case DiscreteGaussianMechanism(s2) =>
        if (s2.isZero)
          RhoZCDPBudget(if (dIn.isZero) ExactNum.zero else ExactNum.PosInf)
        else RhoZCDPBudget(dIn.pow2 / (ExactNum(2) * ExactNum(s2)))
      case GaussianMechanism(s2) =>
        if (s2.isZero)
          RhoZCDPBudget(if (dIn.isZero) ExactNum.zero else ExactNum.PosInf)
        else RhoZCDPBudget(dIn.pow2 / (ExactNum(2) * ExactNum(s2)))
      case m @ (_: SqrtGaussianMechanism | _: ExpPolylogMechanism) =>
        // Per-record mechanisms (reference utils/prdp.py) carry a per-record
        // guarantee, not a worst-case one; the reference likewise keeps them
        // out of noise_mechanisms' privacy functions.
        throw new IllegalArgumentException(
          s"$m has no standalone worst-case DP accounting; " +
            "use it through a per-record-DP accountant")
    }

  def outputMeasure(mechanism: NoiseMechanism): Measure = mechanism match {
    case _: LaplaceMechanism | _: GeometricMechanism => PureDP
    case _                                           => RhoZCDP
  }
}

/** Scalar noise measurement: value + mechanism noise
  * (reference `noise_mechanisms.py:38-572`). Runs on the driver — used for
  * single-aggregate outputs (total count/sum).
  */
final case class AddNoiseScalar(
    inputDomain: ScalarDomain,
    mechanism: NoiseMechanism,
    rng: RandomSource = RandomSource.default()
) extends Measurement {
  def inputMetric: Metric = AbsoluteDifference
  def outputMeasure: Measure = NoisePrivacy.outputMeasure(mechanism)
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisePrivacy.privacyFunction(mechanism, dIn)
  def apply(data: Any): Any = {
    def asLong(v: Any): Long = v match {
      case l: Long => l; case i: Int => i.toLong; case d: Double => d.toLong
      case other => other.toString.toLong
    }
    def asDouble(v: Any): Double = v match {
      case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
      case other => other.toString.toDouble
    }
    mechanism match {
      case GeometricMechanism(a) =>
        if (a.isZero) asLong(data)
        else asLong(data) + Samplers.discreteLaplace(a, rng).toLong
      case DiscreteGaussianMechanism(s2) =>
        if (s2.isZero) asLong(data)
        else asLong(data) + Samplers.discreteGaussian(s2, rng).toLong
      case LaplaceMechanism(b) =>
        if (b.isZero) asDouble(data)
        else asDouble(data) + Samplers.laplace(b.toDouble, rng)
      case GaussianMechanism(s2) =>
        if (s2.isZero) asDouble(data)
        else asDouble(data) + Samplers.gaussian(math.sqrt(s2.toDouble), rng)
      case m =>
        NoiseGen.addDouble(m, rng, asDouble(data))
    }
  }
}

/** DataFrame materialization that freezes randomness and hides row-order /
  * partitioning side channels (reference `spark_measurements.py:877-894` +
  * `utils/misc.py:88`): repartition by a random key, sort within partitions,
  * then write to a session-temp parquet dir and read back. A
  * `Nondeterministic` expression alone would re-sample on every action.
  */
object Sanitize {
  /** When true, freeze via a temp-parquet round trip (survives executor
    * loss — the reference's temp-Hive-table behavior). Default uses
    * `localCheckpoint(eager = true)`: the lineage is truncated so the noise
    * CANNOT be recomputed differently (a lost block fails the job rather
    * than silently re-sampling), at a fraction of the cost.
    */
  @volatile var durable: Boolean = false

  def apply(df: DataFrame): DataFrame = {
    val shuffled = df
      .withColumn("__rand", rand())
      .repartition(col("__rand"))
      .drop("__rand")
      .sortWithinPartitions(df.columns.toIndexedSeq.map(col): _*)
    if (durable) {
      val spark = df.sparkSession
      val dir = java.nio.file.Files
        .createTempDirectory("graft_materialized_")
      dir.toFile.deleteOnExit()
      shuffled.write.mode("overwrite").parquet(dir.toString)
      spark.read.parquet(dir.toString)
    } else {
      shuffled.localCheckpoint(true)
    }
  }
}

/** Apply mechanism noise to one column of a DataFrame and materialize
  * (reference `spark_measurements.py:79-245`). The noise is a native
  * Catalyst expression — no Python/Arrow boundary.
  */
final case class AddNoiseToColumn(
    inputDomain: DataFrameDomain,
    inputMetric: Metric, // OnColumn(col, SumOf/RootSumOfSquared(AbsoluteDifference))
    measureColumn: String,
    mechanism: NoiseMechanism
) extends Measurement {
  require(inputDomain.contains(measureColumn))
  inputMetric match {
    case OnColumn(c, SumOf(AbsoluteDifference)) =>
      require(c == measureColumn, s"metric column $c != $measureColumn")
      require(
        NoisePrivacy.outputMeasure(mechanism) == PureDP,
        "L1 metric requires a pure-DP mechanism (Laplace/Geometric)"
      )
    case OnColumn(c, RootSumOfSquared(AbsoluteDifference)) =>
      require(c == measureColumn, s"metric column $c != $measureColumn")
      require(
        NoisePrivacy.outputMeasure(mechanism) == RhoZCDP,
        "L2 metric requires a zCDP mechanism ((discrete) Gaussian)"
      )
    case m => throw new IllegalArgumentException(s"unsupported metric $m")
  }

  def outputMeasure: Measure = NoisePrivacy.outputMeasure(mechanism)
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisePrivacy.privacyFunction(mechanism, dIn)

  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame]
    val noised = df.withColumn(
      measureColumn,
      AddNoise(col(measureColumn), mechanism)
    )
    Sanitize(noised)
  }
}
