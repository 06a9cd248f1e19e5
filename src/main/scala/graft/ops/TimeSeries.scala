package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators over event tables: backward as-of join (each
  * left row picks up the latest right row at-or-before its timestamp) in
  * two physical shapes — a sort-based general form and a bucketized
  * aggregation form for bounded-lookback joins on skewed keys.
  *
  * The reference engine has no time-series join surface; these are the
  * batch complement of [[graft.streaming.Streams.intervalJoin]] (reference
  * analog for the join kernel: spark/dataframes.py joins; semantics follow
  * the well-known pandas `merge_asof` / DuckDB `ASOF JOIN` contract).
  *
  * Scale notes (100 TB lens):
  *   - [[asofJoin]] is ONE shuffle of `left ∪ right` on the key columns
  *     plus an in-partition sort on (ts, side) — exactly the cost shape of
  *     a sort-merge join on the same keys; no per-row lookups, no
  *     broadcast, no state. Each key's rows must fit one task's sort
  *     spill budget (they spill to disk, not OOM), but a single hot key
  *     still serializes into one task — for that regime use
  *     [[asofJoinBucketed]].
  *   - [[asofJoinBucketed]] requires a finite lookback `tolerance` and
  *     trades the per-key sort for an equi-join on (key, time bucket):
  *     each right row is replicated into the ≤ 2 buckets it can serve, so
  *     a hot key's work is spread across `spanNs / tolerance` buckets and
  *     the per-left-row argmax is a map-side-combinable aggregation. Same
  *     output contract as [[asofJoin]] with the same tolerance.
  */
object TimeSeries {

  /** Internal: one deterministic right row per (keys, ts) — the max of the
    * payload struct. DuckDB's ASOF join (the oracle) leaves the choice
    * among equal-timestamp right rows unspecified, and so would a
    * nondeterministic Spark pick; collapsing ties up front makes both
    * engines see the same right relation. Map-side-combinable aggregation.
    */
  private def dedupRight(
      right: DataFrame,
      rightTs: String,
      keyCols: Seq[String],
      rightValueCols: Seq[String]
  ): DataFrame =
    right
      // a null right timestamp can never satisfy ts <= left ts; dropping it
      // here also keeps it out of the fill-forward window order
      .filter(col(rightTs).isNotNull)
      .groupBy((keyCols :+ rightTs).map(col): _*)
      .agg(max(struct(rightValueCols.map(col): _*)).as("__rv"))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("__ts"),
          struct(
            (col(rightTs).as("__rts") +:
              rightValueCols.map(c => col(s"__rv.$c").as(c))): _*
          ).as("__r")
        ): _*
      )

  /** Backward as-of join: every left row gains `rightValueCols` from the
    * latest right row with the same `keyCols` and right ts <= left ts
    * (< if `allowExactMatches` is false), or nulls when no such row exists
    * (left-outer semantics; left multiplicity is always preserved).
    *
    * `tolerance`, when set, voids matches older than `tolerance` (in the
    * units of the timestamp columns, which must be numeric — cast
    * timestamps to epoch first; a long nanos column works as-is).
    *
    * Right rows tied on (keys, ts) are first collapsed to the maximum
    * payload struct so the result is deterministic. Null timestamps never
    * match: a null-ts right row is dropped, a null-ts left row is kept
    * unmatched. `rightValueCols` must be disjoint from left's columns.
    *
    * Physical shape: union-by-name of the two tagged sides, then
    * `last(payload, ignoreNulls) over (partition by keys order by ts,
    * side rows unbounded preceding)` — the classic fill-forward
    * formulation, one shuffle + one sort, no join node at all.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      keyCols: Seq[String],
      rightValueCols: Seq[String],
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(rightValueCols.nonEmpty, "rightValueCols must be non-empty")
    require(
      rightValueCols.intersect(left.columns.toSeq).isEmpty,
      s"rightValueCols ${rightValueCols.mkString(",")} must not clash with left columns")
    val rightSide = if (allowExactMatches) 0 else 1
    val leftSide = 1 - rightSide
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
    val r = dedupRight(right, rightTs, keyCols, rightValueCols)
      .withColumn("__side", lit(rightSide))
    // right rows sort before (allowExactMatches) or after (!allow) left
    // rows at equal ts, so the running last(__r) at a left row has seen
    // exactly the right rows that may match it
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l
      .unionByName(r, allowMissingColumns = true)
      // a null-ts left row sorts to the partition head where only other
      // null rows precede it, so its fill-forward result is already null —
      // left-outer semantics (kept, unmatched) fall out of the order
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      // left rows are the ones without their own right payload
      .filter(col("__r").isNull)
    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn(
          "__m",
          when(col("__ts") - col("__m.__rts") <= lit(tol), col("__m")))
      case None => matched
    }
    withinTol.select(
      left.columns.map(col) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*
    )
  }

  /** [[asofJoin]] restricted to a finite lookback window, restructured for
    * hot keys: instead of sorting each key's full history in one task,
    * rows are routed to (key, floor(ts / tolerance)) buckets — each right
    * row serves its own bucket and the next, which together cover every
    * left ts within `tolerance` — and the per-left-row winner is a
    * map-side-combinable `max(struct(ts, payload))` aggregation keyed by a
    * per-partition row id, so no single task ever holds more than one
    * bucket of one key. Output contract identical to
    * `asofJoin(..., tolerance = Some(tolerance))`.
    */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      keyCols: Seq[String],
      rightValueCols: Seq[String],
      tolerance: Long,
      allowExactMatches: Boolean = true
  ): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    require(rightValueCols.nonEmpty, "rightValueCols must be non-empty")
    require(
      rightValueCols.intersect(left.columns.toSeq).isEmpty,
      s"rightValueCols ${rightValueCols.mkString(",")} must not clash with left columns")
    // monotonically_increasing_id is stable for a deterministic source plan
    // (same rows land in the same partitions on retry); it exists only
    // inside this operator and never escapes to the output
    val l = left
      .withColumn("__lid", monotonically_increasing_id())
      .withColumn("__bucket", floor(col(leftTs) / lit(tolerance)))
    val r = dedupRight(right, rightTs, keyCols, rightValueCols)
      // a right row at bucket b can match left ts in [r.ts, r.ts+tol],
      // which spans at most buckets b and b+1
      .withColumn("__bucket", explode(array(
        floor(col("__ts") / lit(tolerance)),
        floor(col("__ts") / lit(tolerance)) + 1)))
    val joinKeys = keyCols :+ "__bucket"
    val timeOk =
      (if (allowExactMatches) col("__r.__rts") <= col(leftTs)
       else col("__r.__rts") < col(leftTs)) &&
        col(leftTs) - col("__r.__rts") <= lit(tolerance)
    // max over candidates picks the latest in-window right row; the struct
    // leads with __rts so ordering is by timestamp (ties impossible: right
    // is unique per (keys, ts) after dedupRight)
    val picked = l
      .join(r.select((joinKeys :+ "__r").map(col): _*), joinKeys, "left_outer")
      .withColumn("__cand", when(timeOk, col("__r")))
      .groupBy(col("__lid"))
      .agg(
        max(struct(left.columns.map(col): _*)).as("__l"),
        max(col("__cand")).as("__m"))
    picked.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*
    )
  }
}
