package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * Spark's AQE handles moderate skew (split oversized shuffle partitions);
  * these helpers are for *pathological* keys — one key holding a double-digit
  * percentage of a 100 TB table — where pre-salting beats any runtime split
  * because it parallelizes the map-side combine too.
  */
object Skew {

  /** Two-stage salted aggregation for algebraic aggregates: stage 1
    * aggregates on (keys, salt) — spreading each hot key over `saltBuckets`
    * reducers — stage 2 merges the partials. Correct for any commutative,
    * associative aggregate expressed as (partial, merge) pairs.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      partials: Seq[(String, Column)],
      merges: Seq[(String, Column)],
      saltBuckets: Int = 64
  ): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn(
      "__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
    )
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, e) => e.as(n) }: _*
      )
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(
        merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, e) => e.as(n) }: _*
      )
  }

  /** Salted count per key. */
  def saltedCount(
      df: DataFrame,
      keyCols: Seq[String],
      out: String = "count",
      saltBuckets: Int = 64
  ): DataFrame =
    saltedAgg(
      df,
      keyCols,
      Seq(("__c", count(lit(1)))),
      Seq((out, sum(col("__c")))),
      saltBuckets
    )

  /** Salted sum of a column per key. */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      out: String = "sum",
      saltBuckets: Int = 64
  ): DataFrame =
    saltedAgg(
      df,
      keyCols,
      Seq(("__s", sum(col(valueCol)))),
      Seq((out, sum(col("__s")))),
      saltBuckets
    )

  /** Skew join: salt the (large, skewed) left side with a random bucket and
    * replicate each right-side row across all buckets, so one hot key's rows
    * spread over `saltBuckets` reducers. Use when the right side is too big
    * to broadcast but small enough to replicate `saltBuckets`×.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      saltBuckets: Int = 16
  ): DataFrame = {
    require(saltBuckets > 0)
    val l = left.withColumn(
      "__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
        .cast("int")
    )
    val r = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)))
    )
    l.join(r, on :+ "__salt").drop("__salt")
  }
}
