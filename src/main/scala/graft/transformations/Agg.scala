package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.metrics._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bind a public group-keys DataFrame to the data
  * (reference `groupby.py:41-206`). Output metric is the L1 (`SumOf`) or L2
  * (`RootSumOfSquared`) combination over groups; stability ×2 under
  * HammingDistance (changing a row can move it between two groups).
  */
final case class GroupBy(
    inputDomain: DataFrameDomain,
    inputMetric: Metric,
    useL2: Boolean,
    groupKeys: DataFrame
) extends Transformation {
  val groupColumns: Seq[String] = groupKeys.columns.toSeq
  groupColumns.foreach { c =>
    require(inputDomain.contains(c), s"no group column $c in domain")
    require(!inputDomain(c).isFloat, s"float group key not allowed: $c")
  }

  def outputDomain: Domain =
    GroupedDataFrameDomain(inputDomain.schema, groupColumns)
  def outputMetric: Metric =
    if (useL2) RootSumOfSquared(SymmetricDifference)
    else SumOf(SymmetricDifference)
  def stabilityFunction(dIn: ExactNum): ExactNum = inputMetric match {
    case SymmetricDifference => dIn
    case HammingDistance     => dIn * ExactNum(2)
    // only sound when the grouped column is one of the groupby keys AND the
    // inner combination is L1 (an L2 bound does not bound the L1 distance)
    case IfGroupedBy(c, SumOf(SymmetricDifference))
        if groupColumns.contains(c) =>
      dIn
    case m => throw new IllegalArgumentException(s"unsupported metric $m")
  }
  def apply(data: Any): Any =
    GroupedDataFrame(data.asInstanceOf[DataFrame], groupKeys)
}

/** Total row count → Long; stability 1 (×2 under Hamming)
  * (reference `agg.py:45-147`).
  */
final case class Count(
    inputDomain: DataFrameDomain,
    inputMetric: Metric
) extends Transformation {
  def outputDomain: Domain = ScalarDomain(ColumnDescriptor.long)
  def outputMetric: Metric = AbsoluteDifference
  def stabilityFunction(dIn: ExactNum): ExactNum = inputMetric match {
    case HammingDistance => dIn * ExactNum(2)
    case _               => dIn
  }
  def apply(data: Any): Any = data.asInstanceOf[DataFrame].count()
}

/** Count distinct rows, null-safe — deliberately `distinct().count()`, not
  * `count_distinct` which drops nulls (reference `agg.py:150-257`).
  */
final case class CountDistinct(
    inputDomain: DataFrameDomain,
    inputMetric: Metric
) extends Transformation {
  def outputDomain: Domain = ScalarDomain(ColumnDescriptor.long)
  def outputMetric: Metric = AbsoluteDifference
  def stabilityFunction(dIn: ExactNum): ExactNum = inputMetric match {
    case HammingDistance => dIn * ExactNum(2)
    case _               => dIn
  }
  def apply(data: Any): Any = data.asInstanceOf[DataFrame].distinct().count()
}

/** Per-group count with fill 0 for empty groups
  * (reference `agg.py:259-431`).
  */
final case class CountGrouped(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric, // SumOf or RootSumOfSquared over SymmetricDifference
    countColumn: String = "count"
) extends Transformation {
  require(!inputDomain.inner.contains(countColumn), s"$countColumn exists")
  def outputDomain: Domain = DataFrameDomain(
    inputDomain.groupColumns.map(c => c -> inputDomain.inner(c)) :+
      (countColumn -> ColumnDescriptor.long)
  )
  def outputMetric: Metric = inputMetric match {
    case RootSumOfSquared(_) => OnColumn(countColumn, RootSumOfSquared(AbsoluteDifference))
    case _                   => OnColumn(countColumn, SumOf(AbsoluteDifference))
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any =
    data
      .asInstanceOf[GroupedDataFrame]
      .agg(Seq((countColumn, count(lit(1)), lit(0L))))
}

/** Per-group distinct-row count, null-safe via distinct-before-group
  * (reference `agg.py:434-617` uses size(collect_set(struct(*)))).
  */
final case class CountDistinctGrouped(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric,
    countColumn: String = "count"
) extends Transformation {
  require(!inputDomain.inner.contains(countColumn), s"$countColumn exists")
  def outputDomain: Domain = DataFrameDomain(
    inputDomain.groupColumns.map(c => c -> inputDomain.inner(c)) :+
      (countColumn -> ColumnDescriptor.long)
  )
  def outputMetric: Metric = inputMetric match {
    case RootSumOfSquared(_) => OnColumn(countColumn, RootSumOfSquared(AbsoluteDifference))
    case _                   => OnColumn(countColumn, SumOf(AbsoluteDifference))
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = {
    val g = data.asInstanceOf[GroupedDataFrame]
    // distinct() before grouping: null-safe (struct equality treats nulls as
    // equal) and lets Catalyst plan a partial-aggregate on both stages.
    GroupedDataFrame(g.df.distinct(), g.groupKeys)
      .agg(Seq((countColumn, count(lit(1)), lit(0L))))
  }
}

object ClipBounds {
  /** Spark's float sum overflows silently near Double.MaxValue; the reference
    * caps clip bounds at ±2^970 so ~2^53 rows cannot overflow
    * (reference `agg.py:743-760`).
    */
  val cap: Rational = Rational(BigInt(2).pow(970))

  /** Conservative double clip bounds: rounded inward so the claimed exact
    * sensitivity remains an upper bound (reference `agg.py:803-817`).
    */
  def doubles(lower: Rational, upper: Rational): (Double, Double) = {
    require(lower <= upper, s"lower $lower > upper $upper")
    require(lower.abs <= cap && upper.abs <= cap, "clip bound beyond ±2^970")
    (lower.toDouble(roundUp = true), upper.toDouble(roundUp = false))
  }

  def sensitivity(
      lower: Rational,
      upper: Rational,
      metric: Metric
  ): ExactNum = metric match {
    // add/remove one row: contributes at most max(|l|,|u|)
    case SymmetricDifference | SumOf(_) | RootSumOfSquared(_) =>
      ExactNum(lower.abs.max(upper.abs))
    // change one row: at most u−l
    case HammingDistance => ExactNum(upper - lower)
    case m => throw new IllegalArgumentException(s"unsupported metric $m")
  }
}

/** Clip the measure column to [lower, upper], then sum
  * (reference `agg.py:620-817`).
  */
final case class Sum(
    inputDomain: DataFrameDomain,
    inputMetric: Metric,
    measureColumn: String,
    lower: Rational,
    upper: Rational
) extends Transformation {
  private val desc = inputDomain(measureColumn)
  require(desc.isNumeric, s"$measureColumn is not numeric")
  require(!desc.allowNull && !desc.allowNaN, s"$measureColumn admits null/NaN")
  private val isFloat = desc.isFloat

  def outputDomain: Domain = ScalarDomain(
    if (isFloat) ColumnDescriptor.double() else ColumnDescriptor.long
  )
  def outputMetric: Metric = AbsoluteDifference
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn * ClipBounds.sensitivity(lower, upper, inputMetric)
  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame]
    val c = Sum.clipped(measureColumn, lower, upper, isFloat)
    val row = df.agg(coalesce(sum(c), lit(0)).as("sum")).head()
    if (isFloat) row.getDouble(0) else row.getLong(0)
  }
}

object Sum {
  def clipped(
      column: String,
      lower: Rational,
      upper: Rational,
      isFloat: Boolean
  ): org.apache.spark.sql.Column = {
    if (isFloat) {
      val (lo, hi) = ClipBounds.doubles(lower, upper)
      least(greatest(col(column), lit(lo)), lit(hi))
    } else {
      require(lower.isWhole && upper.isWhole, "integer clip bounds required")
      least(
        greatest(col(column).cast(LongType), lit(lower.num.toLong)),
        lit(upper.num.toLong)
      )
    }
  }
}

/** Per-group clipped sum with fill 0; result cast back to the measure
  * column's type (reference `agg.py:826-1103`).
  */
final case class SumGrouped(
    inputDomain: GroupedDataFrameDomain,
    inputMetric: Metric,
    measureColumn: String,
    lower: Rational,
    upper: Rational,
    sumColumn: String = "sum"
) extends Transformation {
  private val desc = inputDomain.inner(measureColumn)
  require(desc.isNumeric, s"$measureColumn is not numeric")
  require(!desc.allowNull && !desc.allowNaN, s"$measureColumn admits null/NaN")
  private val isFloat = desc.isFloat

  def outputDomain: Domain = DataFrameDomain(
    inputDomain.groupColumns.map(c => c -> inputDomain.inner(c)) :+
      (sumColumn -> (if (isFloat) ColumnDescriptor.double()
                     else ColumnDescriptor.long))
  )
  def outputMetric: Metric = inputMetric match {
    case RootSumOfSquared(_) => OnColumn(sumColumn, RootSumOfSquared(AbsoluteDifference))
    case _                   => OnColumn(sumColumn, SumOf(AbsoluteDifference))
  }
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn * ClipBounds.sensitivity(lower, upper, SymmetricDifference)
  def apply(data: Any): Any = {
    val g = data.asInstanceOf[GroupedDataFrame]
    val c = Sum.clipped(measureColumn, lower, upper, isFloat)
    val outType: DataType = if (isFloat) DoubleType else LongType
    g.agg(Seq((sumColumn, sum(c).cast(outType), lit(0).cast(outType))))
  }
}
