package graft.measurements

import graft.core.Measurement
import graft.domains._
import graft.exact.ExactNum
import graft.measures._
import graft.metrics._
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.random.{RandomSource, SplitMix}

/** Per-column series measurement: one group's column values → one released
  * scalar (reference `pandas_measurements/series.py:52-87` — the abstract
  * `Aggregate` over a pandas Series). Implementations must be value-pure
  * given `(values, rng)` so the grouped executor can replay a group from its
  * seed.
  */
trait SeriesAggregate extends Serializable {
  def inputMetric: Metric
  def outputMeasure: Measure
  def outputType: DataType
  def privacyFunction(dIn: ExactNum): PrivacyBudget

  /** One group's column values (nulls and NaNs already filtered) → the
    * released scalar. Must consume `rng` deterministically given the same
    * values, so per-group seeding keeps draws reproducible and independent.
    */
  def compute(values: Iterable[Double], rng: RandomSource): Any
}

/** The reference's one concrete series measurement: the gap-interval
  * exponential-mechanism quantile (`pandas_measurements/series.py:90-238`).
  * Thin shell over [[NoisyQuantileCore]] — identical mechanism (logsumexp
  * shift, exactly-rounded uniform within the winning interval) to the
  * dedicated [[NoisyQuantileGrouped]] scale path.
  */
final case class NoisyQuantileSeries(
    quantile: Double,
    lower: Double,
    upper: Double,
    epsilon: Option[Double],
    outputMeasure: Measure = PureDP
) extends SeriesAggregate {
  require(quantile >= 0 && quantile <= 1)
  require(lower <= upper)
  def inputMetric: Metric = SymmetricDifference
  def outputType: DataType = DoubleType
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, outputMeasure, dIn)
  def compute(values: Iterable[Double], rng: RandomSource): Any =
    NoisyQuantileCore.compute(values, quantile, lower, upper, epsilon, rng)
}

/** Series count with two-sided geometric noise — the natural companion
  * aggregate for one-pass "quantile + n" releases (ε = d_in·epsilon; the
  * ε = ∞ path is exact, used by deterministic oracles).
  */
final case class NoisyCountSeries(
    epsilon: Option[Double]
) extends SeriesAggregate {
  epsilon.foreach(e => require(e > 0))
  def inputMetric: Metric = SymmetricDifference
  def outputMeasure: Measure = PureDP
  def outputType: DataType = LongType
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, PureDP, dIn)
  def compute(values: Iterable[Double], rng: RandomSource): Any = {
    val n = values.size.toLong
    epsilon match {
      case None => n
      case Some(e) =>
        val alpha = graft.exact.Rational.fromDouble(1.0 / e)
        n + graft.random.Samplers
          .discreteLaplace(alpha, rng).toLong
    }
  }
}

/** Series sum, clamped to [lower, upper], with Laplace noise at scale
  * max(|lower|, upper)/ε — per-row sensitivity times the budget (the
  * `create_sum_measurement` decomposition, restated as a series aggregate).
  */
final case class NoisySumSeries(
    lower: Double,
    upper: Double,
    epsilon: Option[Double]
) extends SeriesAggregate {
  require(lower <= upper && !lower.isInfinite && !upper.isInfinite)
  epsilon.foreach(e => require(e > 0))
  def inputMetric: Metric = SymmetricDifference
  def outputMeasure: Measure = PureDP
  def outputType: DataType = DoubleType
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    NoisyQuantileCore.privacy(epsilon, PureDP, dIn)
  def compute(values: Iterable[Double], rng: RandomSource): Any = {
    var s = 0.0
    values.foreach(v => s += math.min(math.max(v, lower), upper))
    epsilon match {
      case None => s
      case Some(e) =>
        val sens = math.max(math.abs(lower), math.abs(upper))
        s + graft.random.Samplers.laplace(sens / e, rng)
    }
  }
}

/** Apply a map of per-column series measurements to every group of a
  * [[graft.transformations.GroupedDataFrame]] in ONE pass — the reference's
  * `AggregateByColumn` (`pandas_measurements/dataframe.py:78-240`) run
  * through `ApplyInPandas` (`spark_measurements.py:248-364`), without the
  * Arrow/pandas boundary.
  *
  * Semantics carried over from the reference:
  *   - all aggregations must share one input metric and one output measure
  *     (checked at construction, same errors);
  *   - the privacy function is SEQUENTIAL composition across columns — the
  *     sum of each aggregation's budget at `d_in`;
  *   - output is group-complete: keys come from the public key table, and a
  *     key with no rows runs every aggregation on the EMPTY series with the
  *     group's own seeded stream (reference `utils/grouped_dataframe
  *     .py:133-186`), so empty groups stay mutually independent;
  *   - output columns keep the measured columns' names, in map order.
  *
  * Scale shape: one hash repartition on the group keys, a key-sorted
  * partition-local pass that buffers ONE group's measured columns at a time
  * (the reference's ApplyInPandas buffers the same group in pandas — this is
  * the parity path; route million-row groups to [[NoisyQuantileGrouped]] /
  * [[NoisyQuantileSketch]], which never materialize a group), and a
  * broadcast-size null-safe join against the key table for completion.
  */
final case class AggregateByColumn(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric, // SumOf/RootSumOfSquared over SymmetricDifference
    columnToAggregation: Seq[(String, SeriesAggregate)],
    seedOverride: Option[Long] = None
) extends Measurement {
  require(columnToAggregation.nonEmpty, "No aggregations provided.")
  require(
    columnToAggregation.map(_._1).distinct.size == columnToAggregation.size,
    "Each column may appear once.")
  columnToAggregation.foreach { case (c, _) =>
    require(inputDomain.inner.contains(c), s"Column '$c' is not in the input schema.")
    require(!inputDomain.groupColumns.contains(c), s"Column '$c' is a grouping column.")
  }
  // "__pg_hit" is the internal presence marker added during group
  // completion; a measured or grouping column with that name would be
  // silently overwritten by the marker.
  require(
    !columnToAggregation.exists(_._1 == "__pg_hit") &&
      !inputDomain.groupColumns.contains("__pg_hit"),
    "Column name '__pg_hit' is reserved.")
  require(
    columnToAggregation.map(_._2.inputMetric).distinct.size == 1,
    "All of the aggregation functions must have the same input metric.")
  require(
    columnToAggregation.map(_._2.outputMeasure).distinct.size == 1,
    "All of the aggregation functions must have the same output measure.")
  inputMetric match {
    case SumOf(SymmetricDifference) | RootSumOfSquared(SymmetricDifference) => ()
    case m => throw new IllegalArgumentException(
      s"Input metric must be SumOf/RootSumOfSquared(SymmetricDifference), got $m")
  }

  def outputMeasure: Measure = columnToAggregation.head._2.outputMeasure

  /** Sequential composition: the sum of the per-column budgets at d_in. */
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    columnToAggregation.map(_._2.privacyFunction(dIn)).reduce(_ + _)

  def apply(data: Any): Any = {
    val g = data.asInstanceOf[graft.transformations.GroupedDataFrame]
    val keyCols = g.groupColumns
    val df = g.df
    val aggCols = columnToAggregation.map(_._1)
    val aggs = columnToAggregation.map(_._2).toArray
    val seed = seedOverride.getOrElse(RandomSource.secureSeed())
    val outSchema = StructType(
      keyCols.map(c => df.schema(c)) ++
        columnToAggregation.map { case (c, a) => StructField(c, a.outputType, true) })
    val enc = Encoders.row(outSchema)
    val keyIdxs = keyCols.indices.toSeq
    val nAggs = aggs.length
    // keys + measured columns as nullable doubles; one shuffle clusters each
    // group into one partition (explicit repartition — a join's or sort's
    // own clustering is not AQE-stable, see NoisyQuantileGrouped)
    val projected = df.select(
      (keyCols.map(col) ++
        aggCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__a$i")
        }): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val perGroup = projected.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val first = buf.head
          val encKey = graft.transformations.GroupKeys.encode(first, keyIdxs)
          val keyVals = keyIdxs.map(first.get)
          val cols = Array.fill(nAggs)(
            scala.collection.mutable.ArrayBuffer.empty[Double])
          while (buf.hasNext &&
            graft.transformations.GroupKeys.encode(buf.head, keyIdxs) == encKey) {
            val r = buf.next()
            var i = 0
            while (i < nAggs) {
              val idx = keyIdxs.size + i
              if (!r.isNullAt(idx)) {
                val v = r.getDouble(idx)
                if (!v.isNaN) cols(i) += v
              }
              i += 1
            }
          }
          // one seeded stream per group, aggregations applied in map order —
          // the group's draws replay from (seed, key) alone
          val rng = new SplitMix(RandomSource.groupSeed(seed, encKey))
          val outs = (0 until nAggs).map(i => aggs(i).compute(cols(i), rng))
          Row.fromSeq(keyVals ++ outs)
        }
      }
    }(enc)
    // group-complete via the public key table (null-safe: NULL is a key).
    // Presence is an explicit marker column, not inferred from the first
    // aggregation output — a SeriesAggregate that legitimately returns null
    // must not re-run its group as absent.
    val marked = perGroup.withColumn("__pg_hit", lit(true))
    val cond = keyCols.map(c => g.groupKeys(c) <=> marked(c)).reduce(_ && _)
    val joined = g.groupKeys.join(marked, cond, "left")
    val present = joined.select(
      (keyCols.map(c => g.groupKeys(c).as(c)) :+
        coalesce(marked("__pg_hit"), lit(false)).as("__hit")) ++
        aggCols.map(c => marked(c).as(c)): _*)
    val hitIdx = keyCols.size
    val out = present.mapPartitions { it =>
      it.map { r =>
        if (r.getBoolean(hitIdx))
          Row.fromSeq(keyIdxs.map(r.get) ++
            (0 until nAggs).map(i => r.get(hitIdx + 1 + i)))
        else {
          // absent group: the SAME aggregations on the empty series, from
          // the group's own seeded stream
          val encKey = graft.transformations.GroupKeys.encode(r, keyIdxs)
          val rng = new SplitMix(RandomSource.groupSeed(seed, encKey))
          Row.fromSeq(keyIdxs.map(r.get) ++
            (0 until nAggs).map(i => aggs(i).compute(Nil, rng)))
        }
      }
    }(enc)
    Sanitize(out)
  }
}
