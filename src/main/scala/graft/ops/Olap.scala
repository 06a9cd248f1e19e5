package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional OLAP aggregation and grouped exact statistics.
  *
  * Mirrors the reference's grouped-aggregation surface (tmlt.core
  * transformations/spark_transformations/groupby.py) extended with the
  * standard warehouse shapes — ROLLUP / CUBE subtotal lattices, pivot /
  * unpivot reshaping, order-statistic and arg-max aggregates — that a
  * data-card or quality-dashboard pass runs over a 100 TB corpus.
  *
  * Scale notes. ROLLUP/CUBE in Spark are a single `Expand` + one hash
  * aggregate: each input row is replicated once per grouping set map-side,
  * partially aggregated, and only the (tiny) per-set aggregate states
  * shuffle — no per-set scan, no union of N groupBys. Pivot with an
  * explicit value list is one conditional hash aggregate (no extra pass to
  * discover values, which at 100 TB would be a full scan). Unpivot is an
  * `Expand` too — rows × values, but columnar input and no shuffle at all.
  * The arg-max aggregate uses `max(struct(ord..., payload...))` — a plain
  * partial-merge hash aggregate with a total order from the tie-break
  * columns, so the answer is deterministic and costs one shuffle of
  * per-group states rather than a window sort of the full input.
  */
object Olap {

  private def aggAll(aggs: Seq[Column]): (Column, Seq[Column]) =
    (aggs.head, aggs.tail)

  /** ROLLUP over `dims` (hierarchical subtotals: (d1..dk), (d1..dk-1), …,
    * ()). Emits `grouping_id()` as `gidName` so subtotal rows are
    * distinguishable from genuine NULL dimension values — the same bit
    * encoding (leftmost dim = most significant bit) as ANSI `GROUPING`. */
  def rollupAgg(
      df: DataFrame,
      dims: Seq[String],
      aggs: Seq[Column],
      gidName: String = "gid"): DataFrame = {
    val (h, rest) = aggAll(aggs)
    df.rollup(dims.map(col): _*)
      .agg(h, (rest :+ grouping_id().cast(LongType).as(gidName)): _*)
  }

  /** CUBE over `dims` — every subset of the dimensions, one Expand + one
    * hash aggregate (2^k grouping sets; keep k small by design). */
  def cubeAgg(
      df: DataFrame,
      dims: Seq[String],
      aggs: Seq[Column],
      gidName: String = "gid"): DataFrame = {
    val (h, rest) = aggAll(aggs)
    df.cube(dims.map(col): _*)
      .agg(h, (rest :+ grouping_id().cast(LongType).as(gidName)): _*)
  }

  /** Pivot `pivotCol` into one output column per entry of `values`,
    * renamed to `names` (same order). The explicit value list keeps this a
    * single conditional aggregate — Spark never scans to enumerate values.
    * `agg` is evaluated per (group, value) cell. */
  def pivotAgg(
      df: DataFrame,
      groupCols: Seq[String],
      pivotCol: String,
      values: Seq[String],
      names: Seq[String],
      agg: Column): DataFrame = {
    require(values.size == names.size, "values and names must align")
    val wide = df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(agg)
    values.zip(names).foldLeft(wide) { case (d, (v, n)) =>
      d.withColumnRenamed(v, n)
    }
  }

  /** Unpivot `valueCols` (shared type) into long format: one row per
    * (id, column). Pure Expand — narrow, no shuffle; the inverse of
    * [[pivotAgg]] for melt-style reshaping before a grouped pass. */
  def unpivotLong(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)

  /** Exact per-group percentiles of `value` — one partial-merge hash
    * aggregate (Spark's exact `percentile` buffers per-group value counts;
    * bounded by per-group distinct values, not rows). Linear interpolation,
    * matching ANSI `quantile_cont`. */
  def percentilesByGroup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      ps: Seq[(Double, String)]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        percentile(value, lit(ps.head._1)).as(ps.head._2),
        ps.tail.map { case (p, n) => percentile(value, lit(p)).as(n) }: _*)

  /** Deterministic arg-max: for each group, the `payload` columns of the
    * row maximal under `(ordCols..., payload...)` lexicographic order.
    * The payload participates in the order, so ties break totally and the
    * result is reproducible run-to-run — required for engine-replayable
    * curation decisions. One hash aggregate, no window. */
  def argMax(
      df: DataFrame,
      keys: Seq[String],
      ordCols: Seq[Column],
      payload: Seq[(String, Column)]): DataFrame = {
    val packed = struct(
      ordCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") } ++
        payload.map { case (n, c) => c.as(n) }: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__m"))
      .select(keys.map(col) ++ payload.map { case (n, _) =>
        col(s"__m.$n").as(n)
      }: _*)
  }

  /** Ordered string aggregation per group: values sorted, joined with
    * `sep`. Sorting inside the aggregate (array_sort of the collected
    * list) keeps the result independent of partitioning / merge order —
    * collect_list alone is nondeterministic under shuffle. Group size must
    * be bounded (it is an in-memory list per group). */
  def stringAgg(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      sep: String,
      name: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(concat_ws(sep, array_sort(collect_list(value))).as(name))

  /** Fixed-bound equal-width histogram: `bins` buckets over `[lo, hi)`,
    * out-of-range values clamped into the edge bins. Fixed bounds keep it
    * one pass + one tiny shuffle (bins rows); data-dependent bounds would
    * need a min/max pre-pass — see Layout.equiDepthBins for that shape.
    * Returns (bin, bin_lo, n) with empty bins absent. */
  def histogramFixed(
      df: DataFrame,
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val bin = least(
      greatest(floor((value.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast(LongType)
    df.filter(value.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin").cast("double") * lit(w))
      .select(col("bin"), col("bin_lo"), col("n"))
  }

  /** Exact lower weighted median per group: the smallest `value` whose
    * cumulative weight reaches half the group's total weight. The
    * quality-weighted analog of a plain median — token-weighted document
    * length cut-offs, quantity-weighted price points.
    *
    * Weights are cast to BIGINT (caller supplies integral weights), so
    * the running and total sums are exact integers and the selection is
    * independent of partitioning and of tie order within equal values:
    * whichever permutation the sort produces among equal values, the
    * first row whose doubled cumulative weight reaches the total lies at
    * the same `value`. One shuffle + one in-partition sort (a single
    * WindowExec computes both the running and the total sum over the
    * same partition layout), then a combinable min — no second pass.
    */
  def weightedMedianByGroup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      weight: Column,
      name: String = "weighted_median"): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val run = part.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(value.isNotNull)
      .select(keys.map(col) :+ value.as("__v") :+
        weight.cast(LongType).as("__w"): _*)
      .withColumn("__cw", sum(col("__w")).over(run))
      .withColumn("__tw", sum(col("__w")).over(part))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("__v")).as(name))
  }
}
