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

  /** Exponential mechanism over pre-binned equal-rank intervals: interval k
    * spans [bounds(k), bounds(k+1)] and holds ≈ n/(bounds.length−1) values,
    * so the rank score of its left edge is k·n/(len−1).
    */
  def computeFromBins(
      bounds: Array[Double],
      n: Long,
      quantile: Double,
      lower: Double,
      upper: Double,
      epsilon: Option[Double],
      rng: RandomSource
  ): Double = {
    if (bounds == null || bounds.length < 2 || n <= 0)
      return epsilon match {
        case None    => (lower + upper) / 2
        case Some(_) => lower + rng.nextDouble() * (upper - lower)
      }
    val k = bounds.length - 1
    val perBin = n.toDouble / k
    epsilon match {
      case None =>
        // deterministic: the boundary nearest the target rank
        val pos = quantile * k
        val i = math.min(math.max(math.round(pos).toInt, 0), k)
        bounds(i)
      case Some(eps) =>
        val target = quantile * n
        val weights = new Array[Double](k)
        var total = 0.0
        var i = 0
        while (i < k) {
          val len = math.max(bounds(i + 1) - bounds(i), 0.0)
          // rank distance from the interval to the target, in rows
          val loRank = i * perBin
          val hiRank = (i + 1) * perBin
          val dist =
            if (target < loRank) loRank - target
            else if (target > hiRank) target - hiRank
            else 0.0
          weights(i) = len * math.exp(-eps * dist / 2.0)
          total += weights(i)
          i += 1
        }
        if (total <= 0.0 || total.isNaN) return (lower + upper) / 2
        var u = rng.nextDouble() * total
        var chosen = 0
        while (chosen < k - 1 && u > weights(chosen)) {
          u -= weights(chosen)
          chosen += 1
        }
        bounds(chosen) + rng.nextDouble() * (bounds(chosen + 1) - bounds(chosen))
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

/** Sketch-backed noisy quantile for groups too large to materialize: the
  * per-group distribution is compressed to `numBins` equal-rank boundaries
  * with `approx_percentile` (KLL-style mergeable sketch — one aggregation,
  * map-side combined, nothing collected per group), then the exponential
  * mechanism runs over the compressed rank intervals.
  *
  * Rank scores are exact up to the sketch's rank error (± accuracyRank);
  * the privacy analysis is unchanged — the mechanism still selects among
  * data-dependent intervals with the same score sensitivity, the sketch
  * only coarsens WHICH intervals exist (post-processing of a deterministic
  * summary does not change the exponential mechanism's ε accounting over
  * the coarsened candidate set; utility, not privacy, absorbs the sketch
  * error).
  */
final case class NoisyQuantileSketch(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric,
    measureColumn: String,
    quantile: Double,
    lower: Double,
    upper: Double,
    epsilon: Option[Double],
    outputMeasure: Measure = PureDP,
    numBins: Int = 128,
    outputColumn: String = "quantile"
) extends Measurement {
  require(inputDomain.inner.contains(measureColumn))
  require(numBins >= 2)

  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, outputMeasure, dIn)

  def apply(data: Any): Any = {
    val g = data.asInstanceOf[graft.transformations.GroupedDataFrame]
    val keyCols = g.groupColumns
    val clipped = least(
      greatest(col(measureColumn).cast("double"), lit(lower)),
      lit(upper)
    )
    val percentiles = (0 to numBins).map(_.toDouble / numBins)
    val sketched = g.df
      .groupBy(keyCols.map(col): _*)
      .agg(
        percentile_approx(
          clipped,
          array(percentiles.map(lit): _*),
          lit(10000)
        ).as("__bounds"),
        count(lit(1)).as("__n")
      )
    val (q, lo, hi, eps, bins) = (quantile, lower, upper, epsilon, numBins)
    val seed = RandomSource.secureSeed()
    val outSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => g.df.schema(c)) :+
        org.apache.spark.sql.types
          .StructField(outputColumn, org.apache.spark.sql.types.DoubleType, false)
    )
    val enc = Encoders.row(outSchema)
    val keyIdxs = keyCols.indices
    val perGroup = sketched.map { r =>
      val bounds = r.getSeq[Double](keyCols.size)
      val n = r.getLong(keyCols.size + 1)
      val keyVals = keyIdxs.map(r.get)
      val rng = new SplitMix(seed ^ keyVals.hashCode().toLong)
      val result = NoisyQuantileCore.computeFromBins(
        bounds.toArray, n, q, lo, hi, eps, rng)
      Row.fromSeq(keyVals :+ result)
    }(enc)
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
