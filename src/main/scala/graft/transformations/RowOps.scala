package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.ExactNum
import graft.metrics._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Base for 1-stable DataFrame→DataFrame transformations. */
abstract class StableDfTransformation extends Transformation {
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  final def apply(data: Any): Any = applyDf(data.asInstanceOf[DataFrame])
  def applyDf(df: DataFrame): DataFrame
}

/** Keep rows matching a SQL predicate; stability 1
  * (reference `transformations/spark_transformations/filter.py:24-167`).
  * The predicate is parsed by Catalyst, so pushdown/codegen apply.
  */
final case class Filter(
    inputDomain: DataFrameDomain,
    metric: Metric,
    filterExpr: String
) extends StableDfTransformation {
  def outputDomain: Domain = inputDomain
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = df.filter(expr(filterExpr))
}

/** Project a subset of columns (no expressions, no renames;
  * reference `select.py:30-179`).
  */
final case class Select(
    inputDomain: DataFrameDomain,
    metric: Metric,
    columns: Seq[String]
) extends StableDfTransformation {
  columns.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  metric match {
    case IfGroupedBy(c, _) =>
      require(columns.contains(c), s"cannot select away grouping column $c")
    case _ => ()
  }
  def outputDomain: Domain = inputDomain.select(columns)
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = df.select(columns.map(col): _*)
}

/** Rename columns; remaps an `IfGroupedBy` metric column too
  * (reference `rename.py:32-199`).
  *
  * Deliberate relaxation vs the reference: `rename.py:132-134` rejects
  * renaming onto ANY existing input column name, which forbids swaps
  * ({A→X, X→A}) and chained renames ({A→B, B→C}) outright. Here only the
  * FINAL mapping must be collision-free — all renames apply simultaneously,
  * so a swap is unambiguous and sound (domain, metric, and AddRemoveKeys
  * key tracking all follow the mapping); two sources landing on one output
  * name are still rejected below.
  */
final case class Rename(
    inputDomain: DataFrameDomain,
    metric: Metric,
    mapping: Map[String, String]
) extends StableDfTransformation {
  mapping.keys.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  // Two sources mapping onto one output name would make the result
  // ambiguous (and could silently redefine a grouping/key column).
  private val outNames = inputDomain.schema.map { case (n, _) => mapping.getOrElse(n, n) }
  require(outNames.distinct.size == outNames.size,
    s"rename produces duplicate column names: ${outNames.diff(outNames.distinct).distinct.mkString(", ")}")
  def outputDomain: Domain = inputDomain.rename(mapping)
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric match {
    case IfGroupedBy(c, inner) if mapping.contains(c) =>
      IfGroupedBy(mapping(c), inner)
    case m => m
  }
  def applyDf(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(mapping.getOrElse(c, c))): _*)
}

object SpecialValues {
  /** Columns eligible for NaN/inf handling must be float-typed. */
  def requireFloat(domain: DataFrameDomain, columns: Seq[String]): Unit =
    columns.foreach { c =>
      require(domain.contains(c), s"no column $c")
      require(domain(c).isFloat, s"column $c is not float-typed")
    }
}

/** Drop rows with ±inf in the given columns (reference `nan.py:37-210`). */
final case class DropInfs(
    inputDomain: DataFrameDomain,
    metric: Metric,
    columns: Seq[String]
) extends StableDfTransformation {
  SpecialValues.requireFloat(inputDomain, columns)
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if columns.contains(n) => n -> d.copy(allowInf = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame =
    df.filter(
      columns
        .map(c =>
          col(c).isNull || isnan(col(c)) ||
            (col(c) =!= lit(Double.PositiveInfinity) &&
              col(c) =!= lit(Double.NegativeInfinity))
        )
        .reduce(_ && _)
    )
}

/** Drop rows with NaN in the given columns (reference `nan.py:213-385`). */
final case class DropNaNs(
    inputDomain: DataFrameDomain,
    metric: Metric,
    columns: Seq[String]
) extends StableDfTransformation {
  SpecialValues.requireFloat(inputDomain, columns)
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if columns.contains(n) => n -> d.copy(allowNaN = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame =
    df.filter(columns.map(c => col(c).isNull || !isnan(col(c))).reduce(_ && _))
}

/** Drop rows with null in the given columns (reference `nan.py:388-553`). */
final case class DropNulls(
    inputDomain: DataFrameDomain,
    metric: Metric,
    columns: Seq[String]
) extends StableDfTransformation {
  columns.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if columns.contains(n) => n -> d.copy(allowNull = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = df.na.drop("any", columns)
}

/** Replace ±inf by constants (reference `nan.py:556-749`). */
final case class ReplaceInfs(
    inputDomain: DataFrameDomain,
    metric: Metric,
    replace: Map[String, (Double, Double)] // col -> (negReplacement, posReplacement)
) extends StableDfTransformation {
  SpecialValues.requireFloat(inputDomain, replace.keys.toSeq)
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if replace.contains(n) => n -> d.copy(allowInf = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame =
    replace.foldLeft(df) { case (acc, (c, (neg, pos))) =>
      acc.withColumn(
        c,
        when(col(c) === lit(Double.NegativeInfinity), lit(neg))
          .when(col(c) === lit(Double.PositiveInfinity), lit(pos))
          .otherwise(col(c))
      )
    }
}

/** Replace NaN by constants (reference `nan.py:752-929`). */
final case class ReplaceNaNs(
    inputDomain: DataFrameDomain,
    metric: Metric,
    replace: Map[String, Double]
) extends StableDfTransformation {
  SpecialValues.requireFloat(inputDomain, replace.keys.toSeq)
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if replace.contains(n) => n -> d.copy(allowNaN = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame =
    replace.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, when(isnan(col(c)), lit(v)).otherwise(col(c)))
    }
}

/** Replace null by constants (reference `nan.py:932-1109`). */
final case class ReplaceNulls(
    inputDomain: DataFrameDomain,
    metric: Metric,
    replace: Map[String, Any]
) extends StableDfTransformation {
  replace.keys.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  def outputDomain: Domain = DataFrameDomain(inputDomain.schema.map {
    case (n, d) if replace.contains(n) => n -> d.copy(allowNull = false)
    case other                         => other
  })
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame =
    replace.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, coalesce(col(c), lit(v)))
    }
}

/** Add a column unique per (row-content, duplicate-index), converting
  * row-level to id-level distance (reference `id.py:28-153`).
  *
  * Uses sha2 over a canonical JSON of all columns plus a duplicate index from
  * a window over identical rows. One shuffle on all columns — unavoidable for
  * exact duplicate indexing. The id SET is deterministic: a class of G
  * identical rows always gets indices {1..G}, whichever physical row draws
  * which index.
  *
  * Skew: a class of identical rows cannot be split by any content-derived
  * key, so the plain window serializes a table holding millions of copies of
  * one row onto a single task. Classes above `hotClassMinRows` are therefore
  * routed through a two-phase salted indexing (same eager-probe pattern as
  * `Truncation.saltedKeepSmallest`): rows are ranked within (class, salt)
  * buckets — `saltBuckets`-way parallel — and each bucket's rank is shifted
  * by the total count of lower salts, computed from a map-side-combinable
  * (class, salt) count and a window over the ≤ `saltBuckets` bucket rows per
  * class. The index set per class is still exactly {1..G}.
  */
final case class AddUniqueColumn(
    inputDomain: DataFrameDomain,
    column: String,
    saltBuckets: Int = 32,
    hotClassMinRows: Long = 100000L
) extends StableDfTransformation {
  require(!inputDomain.contains(column), s"column $column already exists")
  require(saltBuckets > 0, "saltBuckets must be positive")
  def outputDomain: Domain =
    inputDomain.withColumn(column, ColumnDescriptor.string())
  def inputMetric: Metric = SymmetricDifference
  def outputMetric: Metric = IfGroupedBy(column, SymmetricDifference)
  def applyDf(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // to_json over a struct is injective for a fixed schema (JSON escaping),
    // unlike concat_ws whose separator can be forged by field contents
    def idFromIndex(d: DataFrame, rn: Column): DataFrame =
      d.withColumn(
        column,
        sha2(
          to_json(
            struct(
              (cols.zipWithIndex.map { case (c, i) => col(c).cast("string").as(s"c$i") } :+
                rn.cast("string").as("rn")): _*
            )
          ),
          256
        )
      )
    def plain(d: DataFrame): DataFrame = {
      val w = Window.partitionBy(cols.map(col): _*).orderBy(lit(1))
      idFromIndex(d, row_number().over(w))
    }
    // Eager probe: in the common no-hot-class case, collapse back to the
    // single-window plan instead of paying the routed plan's extra scans.
    // Same shape as Truncation.saltedKeepSmallest's probe: a seeded
    // ~2000/hotClassMinRows sample flags candidate classes (missing a
    // class big enough to matter is vanishingly unlikely, and a miss only
    // demotes it to the row-identical plain window), flagged candidates are
    // re-counted exactly, and the non-empty result is localCheckpointed so
    // the routing joins' broadcasts do not re-run the probe's scans.
    val sampleFraction = 2000.0 / hotClassMinRows.toDouble
    def exactHot(d: DataFrame): DataFrame = d
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotClassMinRows)
      .select(cols.map(col): _*)
    val hotClasses =
      if (sampleFraction >= 1.0) exactHot(df).localCheckpoint()
      else {
        val candidates = df
          .sample(withReplacement = false, sampleFraction, seed = 42L)
          .groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") >= (hotClassMinRows * sampleFraction / 4.0).toLong)
          .select(cols.map(col): _*)
          .localCheckpoint()
        if (candidates.isEmpty) return plain(df)
        val candCond = cols.map(c => df(c) <=> candidates(c)).reduce(_ && _)
        exactHot(df.join(broadcast(candidates), candCond, "left_semi"))
          .localCheckpoint()
      }
    if (hotClasses.isEmpty) return plain(df)
    val nullSafeOn = cols.map(c => df(c) <=> hotClasses(c)).reduce(_ && _)
    val coldOut = plain(df.join(broadcast(hotClasses), nullSafeOn, "left_anti"))
    // The salt is physical (partition id), the only thing that can split
    // identical rows; localCheckpoint freezes it so the two readers below
    // (rank window, bucket counts) see the SAME salt per row.
    val hot = df
      .join(broadcast(hotClasses), nullSafeOn, "left_semi")
      .withColumn("__h", Truncation.colsHash(cols))
      .withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
      .localCheckpoint()
    val w1 = Window.partitionBy(col("__h"), col("__salt")).orderBy(lit(1))
    val ranked = hot.withColumn("__rn", row_number().over(w1))
    // offset(class, salt) = rows of the class in lower salt buckets
    val wOff = Window
      .partitionBy(col("__h"))
      .orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hot
      .groupBy(col("__h"), col("__salt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__h"), col("__salt"), col("__off"))
    val hotOut = idFromIndex(
      ranked.join(offsets, Seq("__h", "__salt")),
      col("__off") + col("__rn")
    ).select((cols :+ column).map(col): _*)
    coldOut.unionByName(hotOut)
  }
}

/** Caching control (reference `persist.py:22-139`). */
final case class Persist(inputDomain: DataFrameDomain, metric: Metric)
    extends StableDfTransformation {
  def outputDomain: Domain = inputDomain
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = df.persist()
}

final case class Unpersist(inputDomain: DataFrameDomain, metric: Metric)
    extends StableDfTransformation {
  def outputDomain: Domain = inputDomain
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = df.unpersist()
}

/** Force evaluation (reference `persist.py:103-139`). */
final case class SparkAction(inputDomain: DataFrameDomain, metric: Metric)
    extends StableDfTransformation {
  def outputDomain: Domain = inputDomain
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def applyDf(df: DataFrame): DataFrame = { df.count(); df }
}
