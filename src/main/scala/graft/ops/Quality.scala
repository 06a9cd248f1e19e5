package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, evaluated in ONE aggregation pass
  * regardless of how many are declared (the Deequ idea re-expressed as a
  * single `agg(...)`: every constraint compiles to a violation-counting
  * aggregate, so a 100 TB audit costs exactly one scan + one 1-row
  * reduce). The result is a long-format verdict table — gate a pipeline
  * on `passed`, or diff `violations` across snapshots to watch drift.
  */
object Quality {

  sealed trait Constraint { def name: String }

  /** `column` must never be null. */
  final case class NotNull(column: String) extends Constraint {
    val name = s"not_null:$column"
  }

  /** The tuple of `columns` must be unique across rows (null-safe: two
    * all-null tuples count as duplicates of each other). */
  final case class Unique(columns: Seq[String]) extends Constraint {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Non-null values of `column` must lie in `[lo, hi]`. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"in_range:$column"
  }

  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Constraint {
    val name = s"accepted:$column"
  }

  /** At-most-`maxFraction` of rows may have a null `column`. */
  final case class MaxNullFraction(column: String, maxFraction: Double)
      extends Constraint {
    val name = s"max_null_frac:$column"
  }

  /** Every row must satisfy an arbitrary boolean expression (cross-column
    * comparisons, arithmetic invariants). A row whose predicate evaluates
    * to null counts as a violation — an invariant that cannot be
    * established is not held. */
  final case class Satisfies(label: String, predicate: Column)
      extends Constraint {
    val name = s"satisfies:$label"
  }

  /** Evaluate every constraint in one pass:
    * `(check_name, violations, passed)` — one row per constraint, ordered
    * as declared. `violations` counts offending rows (for [[Unique]]: rows
    * beyond the first of each duplicated tuple; for [[MaxNullFraction]]:
    * nulls beyond the allowed budget).
    */
  private def violationsOf(c: Constraint): Column = {
    val total = count(lit(1))
    c match {
      case NotNull(col0) =>
        sum(when(col(col0).isNull, 1L).otherwise(0L))
      case Unique(cols) =>
        total - count_distinct(struct(cols.map(col): _*))
      case InRange(col0, lo, hi) =>
        sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
      case AcceptedValues(col0, vals) =>
        sum(when(col(col0).isNotNull &&
          !col(col0).isin(vals: _*), 1L).otherwise(0L))
      case MaxNullFraction(col0, f) =>
        greatest(
          sum(when(col(col0).isNull, 1L).otherwise(0L)) -
            floor(lit(f) * total),
          lit(0L))
      case Satisfies(_, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
    }
  }

  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraints must be non-empty")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(violationsOf(c), lit(0L)).as(s"__v$i")
    }
    val out = constraints.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__v$i").as("violations"),
        (col(s"__v$i") === 0L).as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(out: _*)).as("__r"))
      .select("__r.*")
  }

  /** Per-group [[check]]: the same one-pass audit fanned out by
    * `groupCols` — `(groupCols..., check_name, violations, passed)`, one
    * row per (group, constraint). The per-source / per-language drift
    * monitor: one hash aggregate regardless of constraint count, then a
    * narrow explode. */
  def checkBy(
      df: DataFrame,
      groupCols: Seq[String],
      constraints: Seq[Constraint]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(constraints.nonEmpty, "constraints must be non-empty")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(violationsOf(c), lit(0L)).as(s"__v$i")
    }
    val out = constraints.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__v$i").as("violations"),
        (col(s"__v$i") === 0L).as("passed"))
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+ explode(array(out: _*)).as("__r"): _*)
      .select(groupCols.map(col) :+ col("__r.check_name") :+
        col("__r.violations") :+ col("__r.passed"): _*)
  }

  /** Groups violating the functional dependency `lhs → rhs`: one row per
    * lhs tuple that maps to more than one distinct rhs tuple, with the
    * distinct-rhs and row counts. Empty result = the dependency holds.
    * One hash aggregate on lhs (map-side combinable); no joins.
    */
  def functionalDependencyViolations(
      df: DataFrame,
      lhs: Seq[String],
      rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty, "lhs and rhs must be non-empty")
    require(lhs.intersect(rhs).isEmpty, "lhs and rhs must be disjoint")
    df.groupBy(lhs.map(col): _*)
      .agg(
        count_distinct(struct(rhs.map(col): _*)).as("n_rhs"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_rhs") > 1)
  }

  /** Label consolidation by majority vote: one row per key with the most
    * frequent `labelCol` value (ties broken by smallest label — fully
    * deterministic), its count, and the key's total row count. The
    * standard reconciliation step for multiply-annotated training data.
    * Shape: one map-side-combinable count aggregation, a key-local total
    * window over the (key, label)-sized counts, and a two-phase
    * WindowGroupLimit argmax — no task touches a full key's raw rows.
    */
  def majorityLabel(
      df: DataFrame,
      keyCols: Seq[String],
      labelCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy((keyCols :+ labelCol).map(col): _*)
      .agg(count(lit(1)).as("n_votes"))
    val keyW = Window.partitionBy(keyCols.map(col): _*)
    val pick = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("n_votes").desc, col(labelCol).asc)
    counts
      .withColumn("n_total", sum(col("n_votes")).over(
        keyW.orderBy(col(labelCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .drop("__r")
  }

  /** Minimal top-mass (nucleus) selection per group: the smallest prefix
    * of rows — ordered by (`weightCol` desc, `tieCol` asc) — whose weight
    * sum reaches `p` of the group total. The corpus-curation move "keep
    * the docs carrying 90% of the quality mass per source". Exact with
    * integral weights: the threshold is ceil(p·W) computed once per group
    * from exact integer W, and a row is kept while the EXCLUSIVE running
    * sum is below it. Emits the kept rows with `cum_weight` (inclusive).
    * Shape: one window pass per group ordered by weight; state bounded by
    * group size.
    */
  def topMassPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      weightCol: String,
      p: Double,
      tieCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(p > 0 && p <= 1, "p must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = col(weightCol).cast("long")
    val keyW = Window.partitionBy(groupCols.map(col): _*)
    val order = keyW.orderBy(col(weightCol).desc, col(tieCol).asc)
    df
      .withColumn("__w", w)
      .withColumn("__tot", sum(col("__w")).over(
        keyW.orderBy(col(tieCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__cumBefore",
        coalesce(sum(col("__w")).over(order.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__cumBefore") <
        ceil(lit(p) * col("__tot").cast("double")))
      .withColumn("cum_weight", col("__cumBefore") + col("__w"))
      .drop("__w", "__tot", "__cumBefore")
  }

  /** Benford's-law first-digit audit: the distribution of leading
    * significant digits of `value` against the Benford expectation —
    * the standard screen for fabricated or synthetically generated
    * numeric columns. Values are quantized to an integer grid
    * (`scale` units per 1.0) and the leading digit read from the
    * integer's decimal representation, so digit extraction is exact and
    * engine-independent (no log10 at the data path). Zeros and nulls
    * are excluded; all nine digits are emitted even at count 0.
    *
    * Output: (digit, n, share_ppm, benford_ppm, dev_ppm) with
    * share_ppm = round(1e6·n/total), benford_ppm the constant
    * round(1e6·log10(1+1/d)) table (it sums to exactly 1e6), and
    * dev_ppm = share_ppm − benford_ppm in exact integer arithmetic.
    *
    * One narrow map + one 9-row aggregate: nothing here shuffles more
    * than the digit counts.
    */
  def benfordAudit(
      df: DataFrame,
      value: Column,
      scale: Int = 100): DataFrame = {
    // round(1e6 * log10(1 + 1/d)) for d = 1..9; sums to exactly 1e6
    val benfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    // persisted: the 9-row digit-count table is read twice (the total
    // and the digit join) — uncached, each read is a full input scan
    val counts = df.filter(value.isNotNull)
      .select(round(abs(value) * lit(scale)).cast("long").as("__c"))
      .filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .persist()
    val tot = counts.agg(sum(col("n")).as("__tot"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"),
        element_at(
          array(benfordPpm.map(lit): _*), col("id").cast("int"))
          .as("benford_ppm"))
    digits.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(lit(1000000.0) * col("n") / col("__tot"))
          .cast("long").as("share_ppm"),
        col("benford_ppm"),
        (round(lit(1000000.0) * col("n") / col("__tot")).cast("long")
          - col("benford_ppm")).as("dev_ppm"))
  }
}
