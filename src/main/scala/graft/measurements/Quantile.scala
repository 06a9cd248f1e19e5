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
    require(!lower.isNaN && !upper.isNaN && !lower.isInfinite && !upper.isInfinite,
      s"bounds must be finite, got [$lower, $upper]")
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
        // intervals I_k = (v_{k-1}, v_k), k = 0..n with sentinels.
        // Subtract the best score before exponentiating (logsumexp shift, a
        // constant factor that cancels in the normalized distribution) so the
        // best non-empty interval always has weight len·1 — without it, large
        // ε or distant gaps underflow every weight to 0 and the fallback
        // becomes a data-dependent deterministic output outside the EM proof.
        val target = quantile * n
        var bestScore = Double.NegativeInfinity
        var k = 0
        while (k <= n) {
          val lo = if (k == 0) lower else values(k - 1)
          val hi = if (k == n) upper else values(k)
          if (hi - lo > 0.0) {
            val score = -math.abs(k - target)
            if (score > bestScore) bestScore = score
          }
          k += 1
        }
        var totalWeight = 0.0
        val weights = new Array[Double](n + 1)
        k = 0
        while (k <= n) {
          val lo = if (k == 0) lower else values(k - 1)
          val hi = if (k == n) upper else values(k)
          val len = math.max(hi - lo, 0.0)
          // guard: a zero-length interval can out-score bestScore (which only
          // ranges over non-empty ones), and 0·exp(+big) = 0·Inf = NaN
          weights(k) =
            if (len <= 0.0) 0.0
            else {
              val score = -math.abs(k - target)
              len * math.exp(eps * (score - bestScore) / 2.0)
            }
          totalWeight += weights(k)
          k += 1
        }
        // Only reachable when every interval has zero length (lower == upper
        // after clipping) — then the midpoint IS the whole support.
        if (totalWeight <= 0.0 || totalWeight.isNaN) return (lower + upper) / 2
        var u = rng.nextDouble() * totalWeight
        var chosen = 0
        while (chosen < n && u > weights(chosen)) {
          u -= weights(chosen)
          chosen += 1
        }
        val lo = if (chosen == 0) lower else values(chosen - 1)
        val hi = if (chosen == n) upper else values(chosen)
        // exactly-rounded uniform within the chosen interval, matching the
        // reference's arb-backed uniform (random/uniform.py:10-31)
        graft.random.Precise.uniform(lo, hi, rng)
    }
  }

  /** Exponential mechanism over a DATA-INDEPENDENT equal-width grid: bin k
    * spans [lower + k·w, lower + (k+1)·w] with w = (upper−lower)/numBins, and
    * `counts(k)` rows fall in it. The bin's rank interval is
    * [cum(k), cum(k)+counts(k)]; its utility is −(rank distance to the target
    * rank q·n). Because the grid does not depend on the data, a neighboring
    * dataset changes each cumulative count by ≤ d_in and n by ≤ d_in — the
    * same score sensitivity as the materialized gap-interval mechanism — so
    * the ε accounting in [[privacy]] carries over unchanged. (This replaces
    * an earlier approx_percentile-sketch variant whose data-dependent
    * boundaries had unbounded score sensitivity.)
    */
  def computeFromHistogram(
      counts: Array[Long],
      quantile: Double,
      lower: Double,
      upper: Double,
      epsilon: Option[Double],
      rng: RandomSource
  ): Double = {
    // Empty input (no bins, degenerate range, or zero total count): the
    // noisy path draws the EXACTLY-ROUNDED uniform on (lower, upper) from
    // the group's own seeded stream — the same draw the join-side fill in
    // [[NoisyQuantileSketch]] makes for groups absent from the data, so
    // "empty" means one distribution regardless of which path detected it.
    val k = if (counts == null) 0 else counts.length
    if (k == 0 || upper <= lower)
      return epsilon match {
        case None    => (lower + upper) / 2
        case Some(_) =>
          if (upper > lower) graft.random.Precise.uniform(lower, upper, rng)
          else (lower + upper) / 2
      }
    val w = (upper - lower) / k
    var n = 0L
    var i = 0
    while (i < k) { n += counts(i); i += 1 }
    if (n <= 0)
      return epsilon match {
        case None    => (lower + upper) / 2
        case Some(_) => graft.random.Precise.uniform(lower, upper, rng)
      }
    epsilon match {
      case None =>
        // deterministic: linear interpolation at rank q·(n−1) assuming a
        // uniform spread inside the target bin (quantile_cont on the grid)
        val target = quantile * (n - 1)
        var cum = 0L
        var i = 0
        while (i < k && cum + counts(i) <= target) { cum += counts(i); i += 1 }
        if (i >= k) upper
        else {
          val within = if (counts(i) <= 0) 0.0 else (target - cum) / counts(i)
          lower + (i + within) * w
        }
      case Some(eps) =>
        val target = quantile * n
        // max-score shift (see compute()): keeps the best bin at weight w·1
        var bestScore = Double.NegativeInfinity
        val dist = new Array[Double](k)
        var cum = 0L
        var i = 0
        while (i < k) {
          val loRank = cum.toDouble
          val hiRank = (cum + counts(i)).toDouble
          dist(i) =
            if (target < loRank) loRank - target
            else if (target > hiRank) target - hiRank
            else 0.0
          if (-dist(i) > bestScore) bestScore = -dist(i)
          cum += counts(i)
          i += 1
        }
        val weights = new Array[Double](k)
        var total = 0.0
        i = 0
        while (i < k) {
          weights(i) = math.exp(eps * (-dist(i) - bestScore) / 2.0)
          total += weights(i)
          i += 1
        }
        if (total <= 0.0 || total.isNaN)
          return lower + rng.nextDouble() * (upper - lower)
        var u = rng.nextDouble() * total
        var chosen = 0
        while (chosen < k - 1 && u > weights(chosen)) {
          u -= weights(chosen)
          chosen += 1
        }
        lower + (chosen + rng.nextDouble()) * w
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

/** Histogram-backed noisy quantile for groups too large to materialize: each
  * group is compressed to `numBins` per-bin counts over a FIXED equal-width
  * grid spanning [lower, upper] (one map-side-combined aggregation, nothing
  * collected per group), then the exponential mechanism runs over the bins'
  * rank intervals ([[NoisyQuantileCore.computeFromHistogram]]).
  *
  * The grid is data-independent, so the rank-score sensitivity is identical
  * to the materialized mechanism's (each neighboring row moves one count by
  * one) and the ε accounting in `privacyFunction` is sound as-is. An earlier
  * variant ran the mechanism over approx_percentile (KLL) boundaries; those
  * boundaries are PRE-processing of private data — between neighbors they
  * can shift a score by the sketch's rank error, not 1 — so that path was
  * replaced by this one. Utility absorbs the grid resolution
  * ((upper−lower)/numBins) instead.
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
    outputColumn: String = "quantile",
    seedOverride: Option[Long] = None
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
    // Fixed equal-width grid: bin = clamp(floor((x−lower)/w), 0, numBins−1).
    // One hash aggregation (map-side combined) producing numBins Long counts
    // per group — no per-group materialization, no sketch.
    val width = (upper - lower) / numBins
    val binCol =
      if (width > 0)
        least(
          greatest(floor((clipped - lit(lower)) / lit(width)), lit(0d)),
          lit((numBins - 1).toDouble)
        ).cast("int")
      else lit(0)
    val binned = g.df.withColumn("__bin", binCol)
    val countCols = (0 until numBins).map(k =>
      sum(when(col("__bin") === k, 1L).otherwise(0L)).as(s"__c$k"))
    val counted = binned
      .groupBy(keyCols.map(col): _*)
      .agg(countCols.head, countCols.tail: _*)
    val (q, lo, hi, eps, bins) = (quantile, lower, upper, epsilon, numBins)
    val seed = seedOverride.getOrElse(RandomSource.secureSeed())
    val outSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => g.df.schema(c)) :+
        org.apache.spark.sql.types
          .StructField(outputColumn, org.apache.spark.sql.types.DoubleType, false)
    )
    val enc = Encoders.row(outSchema)
    val keyIdxs = keyCols.indices
    val perGroup = counted.map { r =>
      val counts = Array.tabulate(bins)(k => r.getLong(keyIdxs.size + k))
      val keyVals = keyIdxs.map(r.get)
      val rng = new SplitMix(
        RandomSource.groupSeed(
          seed,
          graft.transformations.GroupKeys.encode(r, keyIdxs)))
      val result = NoisyQuantileCore.computeFromHistogram(
        counts, q, lo, hi, eps, rng)
      Row.fromSeq(keyVals :+ result)
    }(enc)
    // Group-complete: groups absent from the data get the mechanism's
    // empty-input distribution from their OWN seeded stream — the same
    // groupSeed scheme and exactly-rounded uniform as every in-histogram
    // draw (mirrors NoisyQuantileGrouped's refill; reference
    // `utils/grouped_dataframe.py:133-186`, `random/uniform.py:10-31`).
    val cond = keyCols.map(c => g.groupKeys(c) <=> perGroup(c)).reduce(_ && _)
    val joined = g.groupKeys.join(perGroup, cond, "left")
    val withKeys = joined.select(
      keyCols.map(c => g.groupKeys(c).as(c)) :+
        joined(outputColumn).as(outputColumn): _*
    )
    val out = epsilon match {
      case None =>
        withKeys.select(
          keyCols.map(col) :+
            coalesce(col(outputColumn), lit((lo + hi) / 2))
              .as(outputColumn): _*)
      case Some(_) =>
        val qIdx = keyCols.size
        withKeys.mapPartitions { it =>
          it.map { r =>
            if (!r.isNullAt(qIdx)) r
            else {
              val encKey = graft.transformations.GroupKeys.encode(r, keyIdxs)
              val rng = new SplitMix(RandomSource.groupSeed(seed, encKey))
              val v =
                if (hi > lo) graft.random.Precise.uniform(lo, hi, rng)
                else (lo + hi) / 2
              Row.fromSeq(keyIdxs.map(r.get) :+ v)
            }
          }
        }(enc)
    }
    Sanitize(out)
  }
}

/** Per-group noisy quantile over a GroupedDataFrame, group-complete via
  * null-safe left join against the public key table — no pandas/Arrow
  * boundary (reference `spark_measurements.py:248-364` + `dataframe.py`).
  *
  * Scale design: no per-group materialization anywhere. A window count
  * supplies n per group (one hash-partitioning shuffle, spill-backed), a
  * partition-local sort orders each group's values (Spark's external sorter
  * spills), and the exponential mechanism over gap intervals runs as a
  * SINGLE STREAMING PASS per group using the Gumbel-argmax identity:
  * P(argmax_i(ln w_i + G_i) = i) = w_i / Σw for i.i.d. standard Gumbel G_i,
  * so tracking the running argmax (and its interval bounds) samples the EM
  * exactly in O(1) memory. A 100M-row group costs a sort, not a task OOM.
  *
  * Note on the obvious alternative — routing big groups to
  * [[NoisyQuantileSketch]] at runtime: a group's size is private data, so
  * picking a DIFFERENT mechanism above a row-count threshold is
  * data-dependent mechanism selection. A neighboring dataset can flip a
  * group across the threshold, and the gap-EM's output density (spiky at
  * data clusters) is not within e^ε of the histogram EM's (uniform within a
  * fixed bin) — the privacy ratio is unbounded. Hence one mechanism for all
  * sizes, made scale-safe, and the sketch stays a caller-level (public,
  * data-independent) choice.
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
    outputColumn: String = "quantile",
    // test hook: pin the session seed so the per-group draws (including
    // empty-group fills) are reproducible; production callers leave None
    seedOverride: Option[Long] = None
) extends Measurement {
  require(inputDomain.inner.contains(measureColumn))

  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, outputMeasure, dIn)

  def apply(data: Any): Any = {
    val g = data.asInstanceOf[graft.transformations.GroupedDataFrame]
    val keyCols = g.groupColumns
    val df = g.df
    val outSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(c => df.schema(c)) :+
        org.apache.spark.sql.types
          .StructField(outputColumn, org.apache.spark.sql.types.DoubleType, false)
    )
    val enc = Encoders.row(outSchema)
    val (q, lo, hi, eps) = (quantile, lower, upper, epsilon)
    val seed = seedOverride.getOrElse(RandomSource.secureSeed())
    // layout after select: keys (0..k-1), __v (k), __n (k+1); NaN/null rows
    // are excluded before the count so n matches the value stream. The
    // per-group count is attached via a map-side-combinable aggregation and
    // a null-safe co-partitioned join, NOT a count window: WindowExec
    // buffers each partition-key group before emitting (spilling a hot
    // group to disk on one task), while the join streams — the group rows
    // stay unbuffered all the way into the sorted-run consumer below, which
    // reads n from the run's first row.
    val valCol = col(measureColumn).cast("double")
    val base = df
      .filter(valCol.isNotNull && !isnan(valCol))
      .select(
        (keyCols.map(col) :+
          least(greatest(valCol, lit(lo)), lit(hi)).as("__v")): _*)
    val counts = base
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // explicit dataset aliases: counts derives from base, so unqualified
    // key references would trip the ambiguous-self-join check
    val joinCond = keyCols
      .map(c => col(s"__qb.`$c`") <=> col(s"__qc.`$c`"))
      .reduce(_ && _)
    // The sorted-run consumer needs every group's rows in ONE partition.
    // That guarantee comes from the EXPLICIT repartition below, not from the
    // join: a join's own clustering is not safe to rely on — AQE's skew-join
    // optimization (on by default) may SPLIT a sort-merge join's oversized
    // partition into reader chunks, which would hand the consumer a hot
    // group in pieces. AQE never splits a user repartition (coalescing only
    // merges whole hash partitions, which preserves group contiguity), and
    // leaving the join unhinted lets Catalyst broadcast the (usually small)
    // counts side.
    val prepared = base.as("__qb")
      .join(counts.as("__qc"), joinCond)
      .select(
        (keyCols.map(c => col(s"__qb.`$c`")) :+
          col("__qb.__v") :+ col("__qc.__n")): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col("__v")): _*)
    val keyIdxs = keyCols.indices.toSeq
    val vIdx = keyCols.size
    val nIdx = keyCols.size + 1
    val perGroup = prepared.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val first = buf.head
          val encKey =
            graft.transformations.GroupKeys.encode(first, keyIdxs)
          val keyVals = keyIdxs.map(first.get)
          val n = first.getLong(nIdx)
          val rng = new SplitMix(RandomSource.groupSeed(seed, encKey))
          val result = eps match {
            case None =>
              // noise-free interpolated quantile, streaming over the sorted
              // run: capture the values at ranks floor(pos) and floor(pos)+1
              val pos = q * (n - 1)
              val i = math.floor(pos).toLong // Long: groups can exceed 2^31 rows
              val frac = pos - i
              var idx = 0L
              var vi = 0.0
              var vi1 = 0.0
              var last = 0.0
              while (buf.hasNext &&
                graft.transformations.GroupKeys.encode(buf.head, keyIdxs) == encKey) {
                val v = buf.next().getDouble(vIdx)
                if (idx == i) vi = v
                if (idx == i + 1) vi1 = v
                last = v
                idx += 1
              }
              if (n == 0) (lo + hi) / 2
              else if (i + 1 < n) vi * (1 - frac) + vi1 * frac
              else last
            case Some(e) =>
              // streaming exponential mechanism over gap intervals: for gap
              // k with length len, ln-weight = ln(len) − e·|k − q·n|/2; the
              // Gumbel-argmax of ln-weights samples ∝ weight exactly, so
              // only the current best interval is retained
              val target = q * n
              var k = 0L
              var prev = lo
              var bestKey = Double.NegativeInfinity
              var bestLo = 0.0
              var bestHi = 0.0
              def consider(gLo: Double, gHi: Double, rank: Long): Unit = {
                val len = gHi - gLo
                if (len > 0.0) {
                  val u = rng.nextDouble()
                  val gumbel = -math.log(-math.log(u))
                  val key = math.log(len) - e * math.abs(rank - target) / 2.0 + gumbel
                  if (key > bestKey) { bestKey = key; bestLo = gLo; bestHi = gHi }
                }
              }
              while (buf.hasNext &&
                graft.transformations.GroupKeys.encode(buf.head, keyIdxs) == encKey) {
                val v = buf.next().getDouble(vIdx)
                consider(prev, v, k)
                prev = v
                k += 1
              }
              consider(prev, hi, k)
              // every interval empty ⇔ lower == upper after clipping
              if (bestKey.isNegInfinity) (lo + hi) / 2
              // exactly-rounded uniform within the winning interval
              // (reference random/uniform.py:10-31)
              else graft.random.Precise.uniform(bestLo, bestHi, rng)
          }
          Row.fromSeq(keyVals :+ result)
        }
      }
    }(enc)
    // Group-complete: empty groups get the mechanism's empty-input
    // distribution — the SAME exponential mechanism run on the empty series
    // (reference `utils/grouped_dataframe.py:133-186`): one gap interval
    // (lower, upper), whose Gumbel draw and then EXACTLY-ROUNDED uniform
    // (reference `random/uniform.py:10-31`) come from the group's own
    // seeded stream. Empty groups thus stay mutually independent (a shared
    // constant would correlate them) AND carry the same exactness and
    // groupSeed reproducibility as every non-empty draw. The noise-free
    // path's midpoint is deterministic by design.
    val cond = keyCols.map(c => g.groupKeys(c) <=> perGroup(c)).reduce(_ && _)
    val joined = g.groupKeys.join(perGroup, cond, "left")
    val withKeys = joined.select(
      keyCols.map(c => g.groupKeys(c).as(c)) :+
        joined(outputColumn).as(outputColumn): _*
    )
    val out = eps match {
      case None =>
        withKeys.select(
          keyCols.map(col) :+
            coalesce(col(outputColumn), lit((lo + hi) / 2)).as(outputColumn): _*)
      case Some(_) =>
        val qIdx = keyCols.size
        withKeys.mapPartitions { it =>
          it.map { r =>
            if (!r.isNullAt(qIdx)) r
            else {
              val encKey = graft.transformations.GroupKeys.encode(r, keyIdxs)
              val rng = new SplitMix(RandomSource.groupSeed(seed, encKey))
              val v =
                if (hi > lo) {
                  // the single (lower, upper) interval's Gumbel draw, then
                  // the exactly-rounded uniform inside it — mirroring the
                  // non-empty path's consider() + Precise.uniform
                  rng.nextDouble()
                  graft.random.Precise.uniform(lo, hi, rng)
                } else (lo + hi) / 2
              Row.fromSeq(keyIdxs.map(r.get) :+ v)
            }
          }
        }(enc)
    }
    Sanitize(out)
  }
}
