package graft.ops

import graft.plans.HeavyHittersAgg
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Mergeable-sketch aggregations: fixed-size state per partition, one
  * partial-aggregate pass, no shuffle of raw rows — the operators that keep
  * "what are the top domains / sources / tokens in 100 TB" a map-side
  * problem. See [[graft.plans.HeavyHittersAgg]] for the bound contract.
  */
object Sketches {

  /** The Misra–Gries summary as a Column aggregate:
    * `array<struct<item, count_min, count_max>>` sorted by
    * (count_min desc, item). Usable in any `agg(...)` alongside other
    * aggregates. */
  def heavyHittersAgg(item: Column, k: Int): Column =
    ColumnShim.column(
      HeavyHittersAgg(ColumnShim.expression(item.cast(StringType)), k)
        .toAggregateExpression())

  /** Global heavy hitters over `itemCol`: one row per surviving counter,
    * `(item, count_min, count_max)` with `count_min <= f <= count_max`.
    * When `itemCol` has at most `k` distinct values every count is exact
    * and `count_min = count_max`. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame =
    explodeSummary(df.agg(heavyHittersAgg(col(itemCol), k).as("hh")), Nil)

  /** Per-group heavy hitters: `(groupCols..., item, count_min, count_max)`.
    * The sketch state is O(k) per group, so unlike a
    * `GROUP BY group, item` this never shuffles the item dimension —
    * only the (group, summary) pairs move. */
  def heavyHittersBy(
      df: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      k: Int): DataFrame =
    explodeSummary(
      df.groupBy(groupCols.map(col): _*)
        .agg(heavyHittersAgg(col(itemCol), k).as("hh")),
      groupCols)

  private def explodeSummary(aggd: DataFrame, groupCols: Seq[String]): DataFrame =
    aggd
      .select(groupCols.map(col) :+ explode(col("hh")).as("h"): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("h.item").as("item"),
          col("h.count_min").as("count_min"),
          col("h.count_max").as("count_max")): _*)
}
