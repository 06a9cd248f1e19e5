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
      rightValueCols: Seq[String],
      assumeUnique: Boolean = false
  ): DataFrame = {
    // a null right timestamp can never satisfy ts <= left ts; dropping it
    // here also keeps it out of the fill-forward window order
    val nonNull = right.filter(col(rightTs).isNotNull)
    if (assumeUnique)
      // caller-guaranteed one row per (keys, ts): skip the collapse and its
      // shuffle — the right side reaches the window with a narrow project
      nonNull.select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("__ts"),
          struct(
            (col(rightTs).as("__rts") +: rightValueCols.map(col)): _*
          ).as("__r")
        ): _*
      )
    else
      nonNull
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
  }

  /** As-of join: every left row gains `rightValueCols` from the nearest
    * right row with the same `keyCols` in the requested `direction` —
    * `"backward"` (latest right ts <= left ts, the default), `"forward"`
    * (earliest right ts >= left ts), or `"nearest"` (smaller absolute ts
    * gap of the two, ties to the backward match). With
    * `allowExactMatches = false` the inequalities become strict. Unmatched
    * left rows survive with nulls (left-outer; left multiplicity is always
    * preserved).
    *
    * `tolerance`, when set, voids matches further than `tolerance` ts
    * units away. Timestamp columns must be integral (cast timestamps to
    * epoch first; a long nanos column works as-is).
    *
    * Right rows tied on (keys, ts) are first collapsed to the maximum
    * payload struct so the result is deterministic; when the caller
    * guarantees at most one right row per (keys, ts) — typical for event
    * logs — `assumeRightUnique = true` skips that collapse and its
    * shuffle, leaving ONE exchange in the whole plan (if the guarantee is
    * violated, which tied payload wins becomes unspecified). Null
    * timestamps never match: a null-ts right row is dropped, a null-ts
    * left row is kept unmatched. `rightValueCols` must be disjoint from
    * left's columns.
    *
    * Physical shape: union-by-name of the two sides, then
    * `last(payload, ignoreNulls)` over a RANGE frame ending at the left
    * row's ts (and/or `first` over the mirrored following frame) —
    * the classic fill-forward formulation, one shuffle + one sort shared
    * by both directions, no join node at all. Range frames make exact-match
    * exclusion an arithmetic bound (end at ts−1) instead of a tie-breaking
    * sort column, and `nearest` prices in at zero extra passes. Since each
    * (keys, ts) tie-group holds at most one right row after the collapse,
    * frame-order ambiguity within a tie-group cannot change which payload
    * `last`/`first` observes.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      keyCols: Seq[String],
      rightValueCols: Seq[String],
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None,
      direction: String = "backward",
      assumeRightUnique: Boolean = false
  ): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(rightValueCols.nonEmpty, "rightValueCols must be non-empty")
    require(
      rightValueCols.intersect(left.columns.toSeq).isEmpty,
      s"rightValueCols ${rightValueCols.mkString(",")} must not clash with left columns")
    val l = left.withColumn("__ts", col(leftTs))
    val r = dedupRight(right, rightTs, keyCols, rightValueCols,
      assumeRightUnique)
    val base = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc)
    val strict = if (allowExactMatches) 0L else 1L
    val wBack = base.rangeBetween(Window.unboundedPreceding, -strict)
    val wFwd = base.rangeBetween(strict, Window.unboundedFollowing)
    val needBack = direction != "forward"
    val needFwd = direction != "backward"
    // null-ts left rows must stay unmatched: their backward frame holds
    // only fellow null rows, but the FOLLOWING frame of a nulls-first sort
    // spans the whole partition (and a null `+strict` bound degenerates),
    // so the forward candidate needs the explicit guard
    val raw = l
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__mb",
        if (needBack)
          when(col("__ts").isNotNull,
            last(col("__r"), ignoreNulls = true).over(wBack))
        else lit(null))
      .withColumn("__mf",
        if (needFwd)
          when(col("__ts").isNotNull,
            first(col("__r"), ignoreNulls = true).over(wFwd))
        else lit(null))
      // left rows are the ones without their own right payload
      .filter(col("__r").isNull)
    // void each candidate inside its own direction BEFORE `nearest` picks,
    // so an out-of-window closer match can never shadow an in-window
    // farther one
    val matched = tolerance.fold(raw) { tol =>
      val b =
        if (needBack)
          raw.withColumn("__mb",
            when(col("__ts") - col("__mb.__rts") <= lit(tol), col("__mb")))
        else raw
      if (needFwd)
        b.withColumn("__mf",
          when(col("__mf.__rts") - col("__ts") <= lit(tol), col("__mf")))
      else b
    }
    val withM = direction match {
      case "backward" => matched.withColumn("__m", col("__mb"))
      case "forward"  => matched.withColumn("__m", col("__mf"))
      case "nearest" =>
        matched.withColumn("__m",
          when(col("__mb").isNull, col("__mf"))
            .when(col("__mf").isNull, col("__mb"))
            .when(col("__ts") - col("__mb.__rts") <=
              col("__mf.__rts") - col("__ts"), col("__mb"))
            .otherwise(col("__mf")))
    }
    withM.select(
      left.columns.map(col) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*
    )
  }

  /** Ordered funnel analysis: for each entity, the earliest time it
    * completed each step of `steps` IN ORDER — step k counts only at a
    * strictly later timestamp than the entity's earliest completion of
    * step k−1 (the standard product-analytics funnel; `within` bounds the
    * whole funnel: step k must land within `within` ts units of step 0).
    * Emits one row per entity that completed step 0: the entity columns,
    * `ts_0 … ts_{n-1}` (null once a step is missed — later steps are null
    * too by construction), and `steps_completed`.
    *
    * Deterministic: each step time is a min-aggregation, no row choice.
    * Scale shape: one filtered pass + groupBy per step, chained by
    * broadcast-friendly equi-joins on the entity key (AQE picks the
    * strategy; every aggregation is map-side combinable, every join key is
    * the entity — no windows, no per-entity event lists, k shuffles for a
    * k-step funnel).
    */
  def funnel(
      events: DataFrame,
      entityCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String],
      within: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val key = entityCols.map(col)
    val s0 = events
      .filter(col(stepCol) === steps.head && col(tsCol).isNotNull)
      .groupBy(key: _*)
      .agg(min(col(tsCol)).as("ts_0"))
    val chained = steps.zipWithIndex.tail.foldLeft(s0) {
      case (acc, (step, i)) =>
        val prev = s"ts_${i - 1}"
        val cur = s"ts_$i"
        val deadlineOk = within match {
          case Some(w) => col(tsCol) - col("ts_0") <= lit(w)
          case None    => lit(true)
        }
        val nexts = events
          .filter(col(stepCol) === step && col(tsCol).isNotNull)
          .join(acc.select((entityCols :+ prev :+ "ts_0").distinct.map(col): _*),
            entityCols)
          .filter(col(tsCol) > col(prev) && deadlineOk)
          .groupBy(key: _*)
          .agg(min(col(tsCol)).as(cur))
        acc.join(nexts, entityCols, "left_outer")
    }
    chained.withColumn("steps_completed",
      steps.indices
        .map(i => when(col(s"ts_$i").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Cohort retention matrix: entities are assigned to the cohort of their
    * first-ever activity bucket (`ts div bucket`, integral ts — floor for
    * the non-negative timestamps this targets), and each (cohort, offset)
    * cell counts the entities from that cohort active `offset` buckets
    * later. Offset 0 is the cohort size; cells with no active entities are
    * absent (a reader outer-joins the full grid if it wants zeros).
    *
    * Scale shape: three map-side-combinable aggregations — first-seen per
    * entity, distinct (entity, bucket) activity, and the final cell count —
    * joined on the entity key; no windows, no event lists.
    */
  def retention(
      events: DataFrame,
      entityCols: Seq[String],
      tsCol: String,
      bucket: Long
  ): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val key = entityCols.map(col)
    val b = expr(s"`$tsCol` div ${bucket}L")
    val e = events.filter(col(tsCol).isNotNull)
    val firstSeen = e
      .groupBy(key: _*)
      .agg(min(b).as("__cohort"))
    val active = e
      .select((key :+ b.as("__b")): _*)
      .distinct()
    active
      .join(firstSeen, entityCols)
      .groupBy(col("__cohort").as("cohort"),
        (col("__b") - col("__cohort")).as("offset"))
      .agg(countDistinct(struct(key: _*)).as("n_active"))
  }

  /** Per-key trailing-window rolling aggregates: each row gains the count,
    * min, max, and sum of `valueCol` over same-key rows with ts in
    * `(ts − window, ts]` — the event-rate / spend-velocity shape every
    * behavioral pipeline computes. The sum is emitted twice: `roll_sum`
    * (double, convenient) and `roll_sum_c100` (the exact integer sum of
    * per-row `round(value·100)` — order-free, replayable by any engine;
    * float window sums are frame-order-sensitive and DuckDB/Spark disagree
    * in the last ulp; same discipline as TextAnalysis.corpusStats).
    *
    * `tsCol` must be integral. One shuffle on the keys + one sort on ts —
    * Spark evaluates all four aggregates in a single WindowExec pass over
    * a sliding RANGE frame. A hot key serializes into one task (window
    * semantics need the key's full order); shard upstream if a key exceeds
    * a task's sort budget.
    */
  def rollingAgg(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      window: Long
  ): DataFrame = {
    require(window > 0, "window must be positive")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc)
      .rangeBetween(-(window - 1), 0)
    df.withColumn("roll_count", count(col(valueCol)).over(w))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_sum_c100",
        sum(round(col(valueCol) * 100, 0).cast("long")).over(w))
  }

  /** [[asofJoin]] restricted to a finite lookback window, restructured for
    * hot keys: instead of sorting each key's full history in one task,
    * rows are routed to (key, floor(ts / tolerance)) buckets — each right
    * row serves its own bucket and the next, which together cover every
    * left ts within `tolerance` — and the per-left-row winner is a
    * map-side-combinable `max(struct(ts, payload))` aggregation keyed by a
    * per-partition row id, so no single task ever holds more than one
    * bucket of one key. Output contract identical to
    * `asofJoin(..., tolerance = Some(tolerance))`, including null keys
    * matching null keys (the window form's groupBy-style partitioning),
    * with one representational limit: left columns ride through a
    * max(struct(...)) re-assembly, so they must be orderable types (no
    * maps — stringify such columns first).
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
    // integer floor-division bucketing: `floor(ts / tol)` on longs goes
    // through doubles, which at epoch-nanos magnitude (> 2^53) round the
    // operands by up to 128 ns and can mis-bucket boundary rows (dropping
    // a valid match). `div` truncates toward zero, so non-exact negative
    // quotients step down one.
    def withBucket(df: DataFrame, src: Column): DataFrame =
      df.withColumn("__tsl", src.cast("long"))
        .withColumn("__bq", expr(s"__tsl div ${tolerance}L"))
        .withColumn("__bucket",
          col("__bq") - when(
            col("__tsl") % lit(tolerance) =!= 0 && col("__tsl") < 0,
            1).otherwise(0))
        .drop("__tsl", "__bq")
    // monotonically_increasing_id is stable for a deterministic source plan
    // (same rows land in the same partitions on retry); it exists only
    // inside this operator and never escapes to the output
    val l = withBucket(
      left.withColumn("__lid", monotonically_increasing_id()),
      col(leftTs))
    // a right row at bucket b can match left ts in [r.ts, r.ts+tol], which
    // spans at most buckets b and b+1
    val r = withBucket(dedupRight(right, rightTs, keyCols, rightValueCols),
      col("__ts"))
      .withColumn("__bucket",
        explode(array(col("__bucket"), col("__bucket") + 1)))
      .select(
        (keyCols.map(c => col(c).as(s"__rk_$c")) ++
          Seq(col("__bucket").as("__rb"), col("__r"))): _*)
    // `<=>` on the keys: the general form's window partitioning groups
    // null keys together (groupBy semantics), so the bucketized form must
    // match null to null as well; buckets are non-null whenever ts is
    val joinCond = keyCols
      .map(c => col(c) <=> col(s"__rk_$c"))
      .reduceOption(_ && _)
      .getOrElse(lit(true)) && col("__bucket") === col("__rb")
    val timeOk =
      (if (allowExactMatches) col("__r.__rts") <= col(leftTs)
       else col("__r.__rts") < col(leftTs)) &&
        col(leftTs) - col("__r.__rts") <= lit(tolerance)
    // max over candidates picks the latest in-window right row; the struct
    // leads with __rts so ordering is by timestamp (ties impossible: right
    // is unique per (keys, ts) after dedupRight)
    val picked = l
      .join(r, joinCond, "left_outer")
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

  /** Regular-grid resampling with gap fill: buckets each row to
    * `floor(ts / interval)`, reduces every (keys, bucket) group to a
    * deterministic observation, then emits ONE row per bucket on each
    * key's [min, max] bucket range — gap buckets included — with three
    * fills: the raw per-bucket value (null in gaps), last-observation-
    * carried-forward, and linear interpolation between the surrounding
    * observations.
    *
    * Determinism across engines: the per-bucket reduction is
    * `max(round(value·100))` as an integer (cents) — order-free, exact —
    * and the interpolation is a single fixed-shape IEEE expression over
    * exact integer inputs (`pv + (nv−pv)·(b−pb)/(nb−pb)`, every operand
    * cast to double first), so any engine replays it bit-for-bit. `v_interp`
    * is null before a key's first / after its last observation (LOCF covers
    * the trailing edge); both fills are null only for keys with no
    * observations at all, which cannot occur by construction.
    *
    * Scale shape: one map-side-combinable aggregation on (keys, bucket),
    * one per-key min/max aggregation whose fan-out is `span / interval`
    * rows per key (bound it by choosing `interval`), one broadcast-or-SMJ
    * left join back, and one window pass per key ordered by bucket. The
    * grid explode is `sequence()` — generated, never collected. A key's
    * grid must fit a task's sort budget for the fill window (same caveat
    * as [[rollingAgg]]).
    */
  def resample(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      interval: Long
  ): DataFrame = {
    require(interval > 0, "interval must be positive")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val key = keyCols.map(col)
    val bucketed = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__tsl", col(tsCol).cast("long"))
      .withColumn("__bq", expr(s"__tsl div ${interval}L"))
      .withColumn("__b",
        col("__bq") - when(
          col("__tsl") % lit(interval) =!= 0 && col("__tsl") < 0,
          1).otherwise(0))
    val perBucket = bucketed
      .groupBy((key :+ col("__b")): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        max(round(col(valueCol) * 100, 0).cast("long")).as("v_c100"))
    val grid = bucketed
      .groupBy(key: _*)
      .agg(min(col("__b")).as("__bmin"), max(col("__b")).as("__bmax"))
      .select((key :+ explode(sequence(col("__bmin"), col("__bmax"))).as("__b")): _*)
    val joined = grid.join(perBucket, keyCols :+ "__b", "left_outer")
    val wPrev = Window.partitionBy(key: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(key: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = col("v_c100").isNotNull
    joined
      .withColumn("__pb", last(when(obs, col("__b")), ignoreNulls = true).over(wPrev))
      .withColumn("__pv", last(when(obs, col("v_c100")), ignoreNulls = true).over(wPrev))
      .withColumn("__nb", first(when(obs, col("__b")), ignoreNulls = true).over(wNext))
      .withColumn("__nv", first(when(obs, col("v_c100")), ignoreNulls = true).over(wNext))
      .withColumn("v_locf_c100", col("__pv"))
      .withColumn("v_interp",
        when(obs, col("v_c100").cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv").cast("double") +
              (col("__nv") - col("__pv")).cast("double") *
              (col("__b") - col("__pb")).cast("double") /
              (col("__nb") - col("__pb")).cast("double")))
      .withColumn("bucket_start", col("__b") * lit(interval))
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .select((key ++ Seq(col("bucket_start"), col("n_rows"), col("v_c100"),
        col("v_locf_c100"), col("v_interp"))): _*)
  }

  /** Per-key exponentially-weighted moving average, truncated to the last
    * `lookback` rows: row t gets the fold `s ← (1−α)·s + α·x` over the
    * frame's values in (ts, tie) order, seeded with the frame's first
    * value — the standard recursive EWMA restricted to a bounded window so
    * the per-row cost is O(lookback), not O(history).
    *
    * Determinism across engines: `collect_list` over a row-frame window
    * preserves frame order, the ordering (`tsCol`, `tieCol`) must be
    * unique per key, and the fold is a fixed left-to-right chain of IEEE
    * double ops — DuckDB's `list(x) OVER w` + `list_reduce` replays it
    * bit-for-bit. Pick α with an exact binary representation (0.25, 0.5)
    * when an external engine must reproduce the stream.
    *
    * Scale shape: one shuffle on the keys + one in-partition sort; the
    * window materializes `lookback` doubles per row (bound it by choosing
    * `lookback`). A hot key serializes into one task — shard upstream if a
    * key exceeds the sort budget.
    */
  def ewma(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      alpha: Double,
      lookback: Int,
      tieCol: String
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(lookback > 0, "lookback must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    df.withColumn("__arr", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn("ewma",
        aggregate(
          expr("slice(__arr, 2, size(__arr) - 1)"),
          element_at(col("__arr"), 1),
          (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha)))
      .drop("__arr")
  }

  /** Per-key trailing-window z-score anomaly flags, exact by construction:
    * values are reduced to integer cents, the frame's Σ and Σ² are exact
    * integer window sums, and the flag compares
    * `(c·n − Σ)² > t²·(n·Σsq − Σ²)` in pure integer arithmetic — no
    * engine-dependent float summation anywhere in the decision. The
    * reported `z = (c·n − Σ) / sqrt(n·Σsq − Σ²)` is a fixed-shape IEEE
    * expression over those exact integers (sqrt is correctly rounded on
    * every IEEE engine), so it also replays bit-for-bit; z is 0 when the
    * frame variance is 0 (all values equal ⇒ the row cannot deviate).
    *
    * Integer bounds: |cents| ≤ C requires n·Σsq ≤ n²·C² < 2^63 — e.g.
    * C = 10^6 (values to $10k) allows windows to ~3000 rows. The window is
    * row-based over a total order, so (`tsCol`, `tieCol`) must be unique
    * per key.
    *
    * Scale shape: identical to [[rollingAgg]] — one shuffle on the keys,
    * one sort, every aggregate in a single WindowExec pass.
    */
  def rollingZScore(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      window: Int,
      threshold: Int,
      tieCol: String
  ): DataFrame = {
    require(window > 1, "window must be > 1")
    require(threshold > 0, "threshold must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn("__c", round(col(valueCol) * 100, 0).cast("long"))
      .withColumn("__n", count(col("__c")).over(w))
      .withColumn("__s", sum(col("__c")).over(w))
      .withColumn("__ss", sum(col("__c") * col("__c")).over(w))
      .withColumn("__num", col("__c") * col("__n") - col("__s"))
      .withColumn("__den2", col("__n") * col("__ss") - col("__s") * col("__s"))
      .withColumn("z",
        when(col("__den2") === 0, lit(0.0))
          .otherwise(col("__num").cast("double") / sqrt(col("__den2").cast("double"))))
      .withColumn("is_anomaly",
        col("__num") * col("__num") > lit(threshold.toLong * threshold) * col("__den2"))
      .drop("__c", "__n", "__s", "__ss", "__num", "__den2")
  }

  /** Batch range (interval containment) join: each left row with
    * `ltsCol ∈ [startCol, endCol]` of a right interval row, matched on
    * `keyCols` equality (empty for pure time overlap). Inner-join
    * semantics — one output row per qualifying (left, interval) pair,
    * carrying the left columns plus `rightValueCols`.
    *
    * Never plans the O(|L|·|R|) theta-join Spark would produce from a raw
    * BETWEEN predicate: both sides bucket to `bucketWidth`-sized time
    * cells — each interval replicates into the `(end−start)/W + 1` cells
    * it spans — and the join is a plain equi-join on (keys, cell) with the
    * containment predicate as a post-filter. Choose `bucketWidth` near the
    * typical interval length: replication stays O(1) per interval while
    * each left row meets only the intervals in its own cell.
    *
    * `rightValueCols` must be disjoint from left's columns; null
    * timestamps / null endpoints never match; intervals with end < start
    * are empty (no rows). Timestamp columns must be integral.
    */
  def rangeJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      ltsCol: String,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      rightValueCols: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(rightValueCols.nonEmpty, "rightValueCols must be non-empty")
    require(
      rightValueCols.intersect(left.columns.toSeq).isEmpty,
      s"rightValueCols ${rightValueCols.mkString(",")} must not clash with left columns")
    def cellOf(df: DataFrame, src: Column, out: String): DataFrame =
      df.withColumn("__tsl", src.cast("long"))
        .withColumn("__bq", expr(s"__tsl div ${bucketWidth}L"))
        .withColumn(out,
          col("__bq") - when(
            col("__tsl") % lit(bucketWidth) =!= 0 && col("__tsl") < 0,
            1).otherwise(0))
        .drop("__tsl", "__bq")
    val l = cellOf(left.filter(col(ltsCol).isNotNull), col(ltsCol), "__cell")
    val r0 = cellOf(
      cellOf(
        right.filter(col(startCol).isNotNull && col(endCol).isNotNull &&
          col(endCol) >= col(startCol)),
        col(startCol), "__c0"),
      col(endCol), "__c1")
    val r = r0
      .withColumn("__cell", explode(sequence(col("__c0"), col("__c1"))))
      .select(
        (keyCols.map(c => col(c).as(s"__rk_$c")) ++
          Seq(col("__cell").as("__rcell"),
            col(startCol).as("__rs"), col(endCol).as("__re")) ++
          rightValueCols.map(col)): _*)
    val joinCond = keyCols
      .map(c => col(c) <=> col(s"__rk_$c"))
      .reduceOption(_ && _)
      .getOrElse(lit(true)) && col("__cell") === col("__rcell")
    l.join(r, joinCond, "inner")
      .filter(col(ltsCol) >= col("__rs") && col(ltsCol) <= col("__re"))
      .select(left.columns.map(col) ++ rightValueCols.map(col): _*)
  }

  /** Slowly-changing-dimension (SCD Type-2) history builder: collapse an
    * observation log `(id, ts, values...)` into validity intervals — one
    * row per maximal run of consecutive equal value tuples per id, with
    * `valid_from` (run's first ts), `valid_to` (next run's first ts, NULL
    * for the current run) and `is_current`. The warehouse-standard
    * change-capture shape for entity state over corpus snapshots (which
    * doc versions existed when) or dimension feeds.
    *
    * Duplicate `(id, ts)` observations are collapsed to one deterministic
    * row first (max of the value struct — the [[dedupRight]] rule), so the
    * output is engine-replayable even over nondeterministically-ordered
    * input.
    *
    * Scale shape: one shuffle on `(id, ts)` for the dedup aggregation
    * (map-side combinable), then ONE exchange + sort on id for both window
    * passes — change flags and next-change timestamps share the same
    * partitioning and ordering, so Catalyst plans them over a single sort
    * without a second exchange. No join, no per-segment re-aggregation: a
    * change row IS its segment's output row. A hot id serializes into one
    * task (window semantics); ids are entity keys, so hot ids mean an
    * upstream modeling problem, not a plan problem.
    *
    * Reference counterpart: none — the reference has no temporal
    * collapse; public semantics follow the standard SCD2 contract (half-
    * open intervals `[valid_from, valid_to)`).
    */
  def buildHistory(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val id = col(idCol)
    val one = df
      .filter(id.isNotNull && col(tsCol).isNotNull)
      .groupBy(id, col(tsCol))
      .agg(max(struct(valueCols.map(col): _*)).as("__v"))
    val w = Window.partitionBy(id).orderBy(col(tsCol).asc)
    val flagged = one
      // null-safe: the first row of an id (lag NULL) is always a change
      .withColumn("__chg", !(lag(col("__v"), 1).over(w) <=> col("__v")))
    val withNext = flagged
      .withColumn("__next_from",
        first(when(col("__chg"), col(tsCol)), ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
    withNext
      .filter(col("__chg"))
      .select(
        Seq(id) ++
          valueCols.map(c => col(s"__v.$c").as(c)) ++
          Seq(
            col(tsCol).as("valid_from"),
            col("__next_from").as("valid_to"),
            col("__next_from").isNull.as("is_current")): _*)
  }

  /** Time-travel over a [[buildHistory]] result: the table as of `ts`
    * (each id's row whose `[valid_from, valid_to)` interval covers `ts`;
    * ids first seen after `ts` are absent). A narrow filter — on a
    * `valid_from`-partitioned or z-ordered history the scan prunes to the
    * files whose interval stats straddle `ts`, so reconstructing an old
    * training snapshot never reads the full history. */
  def snapshotAt(history: DataFrame, ts: Column): DataFrame =
    history
      .filter(col("valid_from") <= ts &&
        (col("valid_to").isNull || ts < col("valid_to")))
      .drop("valid_from", "valid_to", "is_current")

  /** First-order Markov transition matrix over per-entity event
    * sequences: for each entity (`key`), order its events by `orderBy`
    * (include a unique tiebreak column — timestamps alone may collide)
    * and count consecutive state transitions. Output
    * (from_state, to_state, n_trans, n_from, prob_ppm) where prob is the
    * row-normalized transition probability as round(1e6·n/n_from).
    *
    * The behavioral-cloning / funnel-mining companion to `sessionize`:
    * the transition table is the input to next-event prediction
    * baselines and to detecting bot-like deterministic loops.
    *
    * One window pass laid out by (key, order) — the same shuffle a
    * sessionization already pays — then counts-to-counts aggregation;
    * the state-pair table is tiny (|states|²) so the normalizing join
    * is a broadcast at any scale.
    */
  def transitionMatrix(
      df: DataFrame,
      key: Column,
      state: Column,
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(
      (0 until orderBy.size).map(i => col(s"__o$i")): _*)
    val seq0 = df.select(
      key.as("__k") +: state.as("to_state") +:
        orderBy.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val pairs = seq0
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull)
    // persisted: the |states|²-sized transition table is read twice (the
    // row normalizer and the final join); uncached, the second read
    // re-runs the full window + aggregate over the input
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n_trans"))
      .persist()
    val fromTot = counts.groupBy(col("from_state"))
      .agg(sum(col("n_trans")).as("n_from"))
    counts.join(fromTot, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n_trans"),
        col("n_from"),
        round(lit(1000000.0) * col("n_trans") / col("n_from"))
          .cast("long").as("prob_ppm"))
  }

  /** Per-entity inter-event gap statistics: order each entity's events
    * by (`tsMicros`, `tie`) — the unique tiebreak pins equal timestamps
    * — difference consecutive microsecond stamps, and report
    * (key, n_gaps, min_gap_us, max_gap_us, mean_gap_us). The cadence
    * profile behind bot detection (impossibly regular gaps) and session
    * tuning (the gap histogram picks the sessionization threshold).
    * Entities with a single event are dropped (no gaps).
    *
    * Gaps are exact microsecond longs, so the sums are order-free and
    * `mean_gap_us` (the one double) derives from them deterministically.
    * One window pass + one combinable aggregate on the same layout.
    */
  def interEventStats(
      df: DataFrame,
      key: Column,
      tsMicros: Column,
      tie: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__t"))
    df.select(key.as("__k"), tsMicros.cast("long").as("__ts"),
        tie.as("__t"))
      .filter(col("__ts").isNotNull) // null stamps would sort
      // differently across engines (Spark NULLS FIRST vs ANSI LAST)
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__k"), (col("__ts") - col("__prev")).as("__gap"))
      .groupBy(col("__k").as("key"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"),
        (sum(col("__gap")).cast("double") / count(lit(1)))
          .as("mean_gap_us"))
  }

  /** Top initial event paths: each entity's first `depth` states in
    * (`orderBy`) order joined with ">", counted across entities and
    * reported with exact ppm shares — the where-do-users-go-first table
    * behind onboarding and bot triage. The per-entity collect is bounded
    * by `depth` (the WindowGroupLimit filter prunes before the
    * aggregate), and the path table is at most |states|^depth rows.
    */
  def topPaths(
      df: DataFrame,
      key: Column,
      state: Column,
      orderBy: Seq[Column],
      depth: Int = 3): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    val w = Window.partitionBy(col("__k")).orderBy(
      (0 until orderBy.size).map(i => col(s"__o$i")): _*)
    val seq0 = df.select(
      key.as("__k") +: state.as("__s") +:
        orderBy.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val paths = seq0
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy(col("__k"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn").as("r"),
            col("__s").as("s")))),
          x => x.getField("s")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .persist() // read twice: the total and the final share projection
    val tot = paths.agg(sum(col("n")).as("__tot"))
    paths.crossJoin(broadcast(tot))
      .select(col("path"), col("n"),
        round(lit(1000000.0) * col("n") / col("__tot"))
          .cast("long").as("share_ppm"))
  }

  /** New-vs-returning entity report per period: for each `period` (the
    * caller truncates the timestamp — day, week), the distinct active
    * entities, how many were seen for the FIRST time, the returning
    * remainder, and the running total of distinct entities to date.
    * The growth-accounting table every ingestion/engagement dashboard
    * opens with; cumulative distinct counts fall out exactly because
    * Σ first-seen = distinct-to-date — no distinct-over-window needed.
    *
    * Shape: one distinct on (entity, period), one min-aggregate per
    * entity (both combinable), two period-sized aggregates and one
    * window over the period table (periods-count rows — tiny). Exact
    * integers throughout.
    */
  def newVsReturning(
      df: DataFrame,
      entity: Column,
      period: Column): DataFrame = {
    val pairs = df
      .filter(entity.isNotNull && period.isNotNull)
      .select(entity.as("__e"), period.as("period"))
      .distinct()
      .persist() // read twice: activity counts + first-seen aggregate
    val active = pairs.groupBy(col("period"))
      .agg(count(lit(1)).as("n_active"))
    val firstSeen = pairs.groupBy(col("__e"))
      .agg(min(col("period")).as("period"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(firstSeen, Seq("period"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("cum_entities", sum(col("n_new")).over(w))
  }

  /** Time-weighted average of a step series per entity: each observation
    * holds its value until the next one, so the mean weights each value
    * by its holding duration — the correct average for sampled gauges
    * (sensor readings, account balances, prices), where the arithmetic
    * mean over-weights bursts.
    *
    * twa = Σ cᵢ·gapᵢ / Σ gapᵢ / scale over consecutive (ts, tie)-ordered
    * segments, with cᵢ the value on the `scale` integer grid and gapᵢ
    * exact microseconds — the weighted sum is exact in decimal(38,0)
    * and rounded once to double (with µs gaps even one year-long
    * segment at c ≈ 10⁵ sits near 2^63 as a long), so the one double
    * still replays identically against the oracle's HUGEINT sum. The final
    * observation carries no duration and is excluded, as are entities
    * with a single observation or zero total span.
    */
  def timeWeightedAvg(
      df: DataFrame,
      key: Column,
      tsMicros: Column,
      value: Column,
      tie: Column,
      scale: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__t"))
    df.select(key.as("__k"), tsMicros.cast("long").as("__ts"),
        tie.as("__t"),
        round(value * lit(scale)).cast("long").as("__c"))
      .filter(col("__ts").isNotNull && col("__c").isNotNull)
      .withColumn("__next", lead(col("__ts"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col("__k"), col("__c"),
        (col("__next") - col("__ts")).as("__gap"))
      .groupBy(col("__k").as("key"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__gap")).as("span_us"),
        // Σ c·gap in exact decimal, one rounding to double: with µs gaps
        // a single year-long segment at c ≈ 10⁵ already sits near 2^63,
        // so even the PER-ROW product widens first (DuckDB mirrors with
        // a HUGEINT sum cast to double)
        sum(col("__c").cast("decimal(38,0)") * col("__gap"))
          .cast("double").as("__sw"))
      .filter(col("span_us") > 0)
      .select(col("key"), col("n_segments"), col("span_us"),
        (col("__sw") / col("span_us")
          / lit(scale.toDouble)).as("twa"))
  }
}
