package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators: multi-dimensional clustering and equi-depth
  * binning. At 100 TB the layout IS the optimization — a z-ordered table
  * lets min/max zone maps prune multi-predicate scans that a single-column
  * sort cannot, and equi-depth bins drive skew-free range partitioning and
  * length-bucketed training batches.
  */
object Layout {

  /** Morton (z-order) value of `cols`, each already gridded to
    * `[0, 2^bits)`: bit `i` of column `j` lands at output bit
    * `i * cols.size + j`. Pure integer shift/mask arithmetic — codegen'd,
    * no UDF. `bits * cols.size` must fit a long (≤ 63). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * ${cols.size} columns must be <= 63")
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast(LongType), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ + _)
  }

  /** Clamp-and-scale `c` from `[lo, hi]` onto the `[0, 2^bits)` grid —
    * the usual preparation for [[zValue]] over non-integer or wide-range
    * columns. */
  def grid(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "need hi > lo")
    val maxCell = (1L << bits) - 1
    floor(
      (least(greatest(c.cast("double"), lit(lo)), lit(hi)) - lit(lo)) /
        lit(hi - lo) * lit(maxCell.toDouble)).cast(LongType)
  }

  /** Re-cluster `df` by the z-order of `gridCols` (already gridded, see
    * [[grid]]): range-partition on the z-value, sort within partitions.
    * Each output file then covers a compact z-range, so min/max column
    * statistics prune scans on ANY prefix-free combination of the
    * clustered dimensions — the layout behind multi-dimensional data
    * skipping. One range-exchange (sampled boundaries, skew-balanced by
    * construction); the per-partition sort never spills more than a
    * partition. */
  def zOrder(
      df: DataFrame,
      gridCols: Seq[Column],
      bits: Int,
      numPartitions: Int): DataFrame = {
    val zc = zValue(gridCols, bits).as("__z")
    df.withColumn("__z", zc)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Equi-depth bin ids over `valueCol`: all rows sharing a value land in
    * one bin, and bin of value v = `floor(rank_before(v) * numBins / n)`
    * where `rank_before` counts rows with strictly smaller values —
    * integer arithmetic only, so the assignment replays identically on
    * any engine. Adds `binCol` (0 .. numBins-1, possibly fewer when ties
    * dominate).
    *
    * Physical shape: one hash aggregate collapses the data to its value
    * histogram (the only pass over the full input besides the final
    * assignment join), one single-partition window computes the exact
    * cumulative ranks over DISTINCT values — the caller contract is that
    * the value domain is distinct-bounded (bin token lengths or price
    * cents, not raw ids; pre-round to a grid otherwise) — and the
    * bin map joins back onto the input (AQE broadcasts it when small).
    */
  def equiDepthBins(
      df: DataFrame,
      valueCol: String,
      numBins: Int,
      binCol: String = "bin"): DataFrame = {
    require(numBins > 0, "numBins must be positive")
    val hist = df
      .filter(col(valueCol).isNotNull)
      .groupBy(valueCol)
      .agg(count(lit(1)).as("__c"))
    val cumBefore =
      sum(col("__c")).over(Window.orderBy(col(valueCol))) - col("__c")
    val total = sum(col("__c")).over(
      Window.orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val bins = hist
      .select(col(valueCol), cumBefore.as("__cb"), total.as("__n"))
      // integer div keeps the assignment exact past 2^53 rows (a double
      // `/` would round the quotient at petabyte-scale counts)
      .select(col(valueCol),
        expr(s"(__cb * $numBins) div __n").as(binCol))
    df.join(bins, Seq(valueCol), "left")
  }

  /** Write `df` as a bucketed + sorted table: `buckets` hash buckets on
    * `keys`, rows sorted by `keys` inside each bucket file. Joins and
    * aggregations between tables bucketed the same way on the same keys
    * then run WITHOUT a shuffle (and without a sort, when the sort
    * columns match) — the pre-partitioning strategy for the fact tables
    * a pipeline joins repeatedly at 100 TB, where re-shuffling the big
    * side per query is the dominant cost. LayoutSpec pins the contract:
    * a bucketed-bucketed equi-join plans zero exchanges.
    *
    * Bucketed output requires the table catalog (`saveAsTable`): plain
    * `.parquet(path)` writes carry no bucket metadata Spark can trust.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(buckets > 0, "buckets must be positive")
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
