package graft.measurements

import graft.core.Measurement
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.metrics._
import graft.random.{RandomSource, SplitMix}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Exponential-mechanism quantile (Smith 2011; reference
  * `pandas_measurements/series.py:90-484`).
  *
  * Values are clipped to [lower, upper]; the mechanism scores each gap
  * interval between consecutive sorted values by how close its ranks are to
  * the target rank, samples an interval ∝ length·exp(−ε/2·score), then a
  * uniform point inside it. PureDP: ε·d_in; zCDP: (ε·d_in)²/8.
  *
  * ε = ∞ (epsilon = None here) is the noise-free oracle path: returns the
  * linearly-interpolated empirical quantile (matching SQL `quantile_cont`).
  */
object NoisyQuantileCore {
  def compute(
      values0: Iterable[Double],
      quantile: Double,
      lower: Double,
      upper: Double,
      epsilon: Option[Double],
      rng: RandomSource
  ): Double = {
    require(quantile >= 0 && quantile <= 1)
    require(lower <= upper)
    val values = values0.iterator
      .map(v => math.min(math.max(v, lower), upper))
      .toArray
    java.util.Arrays.sort(values)
    val n = values.length
    epsilon match {
      case None =>
        // noise-free: continuous (interpolated) quantile over clipped values
        if (n == 0) (lower + upper) / 2
        else {
          val pos = quantile * (n - 1)
          val i = pos.toInt
          val frac = pos - i
          if (i + 1 < n) values(i) * (1 - frac) + values(i + 1) * frac
          else values(n - 1)
        }
      case Some(eps) =>
        // intervals I_k = (v_{k-1}, v_k), k = 0..n with sentinels
        val target = quantile * n
        var totalWeight = 0.0
        val weights = new Array[Double](n + 1)
        var k = 0
        while (k <= n) {
          val lo = if (k == 0) lower else values(k - 1)
          val hi = if (k == n) upper else values(k)
          val len = math.max(hi - lo, 0.0)
          val score = -math.abs(k - target)
          weights(k) = len * math.exp(eps * score / 2.0)
          totalWeight += weights(k)
          k += 1
        }
        if (totalWeight <= 0.0 || totalWeight.isNaN) return (lower + upper) / 2
        var u = rng.nextDouble() * totalWeight
        var chosen = 0
        while (chosen < n && u > weights(chosen)) {
          u -= weights(chosen)
          chosen += 1
        }
        val lo = if (chosen == 0) lower else values(chosen - 1)
        val hi = if (chosen == n) upper else values(chosen)
        lo + rng.nextDouble() * (hi - lo)
    }
  }

  def privacy(
      epsilon: Option[Double],
      outputMeasure: Measure,
      dIn: ExactNum
  ): PrivacyBudget = {
    val e = epsilon match {
      case None      => ExactNum.PosInf
      case Some(eps) => ExactNum.fromDouble(eps)
    }
    if (dIn.isZero)
      return outputMeasure match {
        case PureDP  => PureDPBudget(ExactNum.zero)
        case RhoZCDP => RhoZCDPBudget(ExactNum.zero)
        case _       => ApproxDPBudget(ExactNum.zero, ExactNum.zero)
      }
    outputMeasure match {
      case PureDP => PureDPBudget(if (e.isInfinite) ExactNum.PosInf else e * dIn)
      case RhoZCDP =>
        RhoZCDPBudget(
          if (e.isInfinite) ExactNum.PosInf
          else (e * dIn).pow2 / ExactNum(8)
        )
      case m => throw new IllegalArgumentException(s"unsupported measure $m")
    }
  }
}

/** Per-group noisy quantile over a GroupedDataFrame: one `flatMapGroups`
  * pass (sorted within each group in memory), group-complete via null-safe
  * left join against the public key table — no pandas/Arrow boundary
  * (reference `spark_measurements.py:248-364` + `dataframe.py`).
  */
final case class NoisyQuantileGrouped(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric, // SumOf(SymmetricDifference)
    measureColumn: String,
    quantile: Double,
    lower: Double,
    upper: Double,
    epsilon: Option[Double],
    outputMeasure: Measure = PureDP,
    outputColumn: String = "quantile"
) extends Measurement {
  require(inputDomain.inner.contains(measureColumn))

  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, outputMeasure, dIn)

  def apply(data: Any): Any = {
    val g = data.asInstanceOf[graft.transformations.GroupedDataFrame]
    val keyCols = g.groupColumns
    val df = g.df
    val mIdx = df.schema.fieldIndex(measureColumn)
    val keyIdxs = keyCols.map(df.schema.fieldIndex)
    val outSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => df.schema(c)) :+
        org.apache.spark.sql.types
          .StructField(outputColumn, org.apache.spark.sql.types.DoubleType, false)
    )
    val enc = Encoders.row(outSchema)
    val (q, lo, hi, eps) = (quantile, lower, upper, epsilon)
    val seed = RandomSource.secureSeed()
    val perGroup = df
      .groupByKey(r => graft.transformations.GroupKeys.encode(r, keyIdxs))(
        Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        val it = rows.buffered
        val first = it.head
        val keyVals = keyIdxs.map(first.get)
        val vals = it.map { r =>
          if (r.isNullAt(mIdx)) Double.NaN
          else
            r.get(mIdx) match {
              case d: Double => d
              case f: Float  => f.toDouble
              case l: Long   => l.toDouble
              case i: Int    => i.toDouble
              case other     => other.toString.toDouble
            }
        }.filterNot(_.isNaN).toSeq
        val rng = new SplitMix(seed ^ keyVals.hashCode().toLong)
        val result = NoisyQuantileCore.compute(vals, q, lo, hi, eps, rng)
        Iterator.single(Row.fromSeq(keyVals :+ result))
      }(enc)
    // Group-complete: empty groups get the mechanism's empty-input
    // distribution — with noise that is an INDEPENDENT Uniform(lower, upper)
    // draw per group (the exponential mechanism over a single gap interval);
    // a shared constant would correlate empty groups and break the per-group
    // guarantee. The noise-free path's midpoint is deterministic by design.
    val fill: org.apache.spark.sql.Column = epsilon match {
      case Some(_) => lit(lo) + rand() * lit(hi - lo)
      case None    => lit((lo + hi) / 2)
    }
    val cond = keyCols.map(c => g.groupKeys(c) <=> perGroup(c)).reduce(_ && _)
    val joined = g.groupKeys.join(perGroup, cond, "left")
    val out = joined.select(
      keyCols.map(c => g.groupKeys(c).as(c)) :+
        coalesce(joined(outputColumn), fill).as(outputColumn): _*
    )
    Sanitize(out)
  }
}
