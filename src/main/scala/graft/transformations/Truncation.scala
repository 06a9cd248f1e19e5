package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.ExactNum
import graft.metrics._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic-random truncation kernels
  * (reference `utils/truncation.py:41-313`): order rows within a group by a
  * SHA-256 hash of the whole row so the kept subset is stable but
  * data-independent, then keep the hash-smallest rows/keys. Hot groups are
  * routed through a two-phase salted selection so a power-law group key
  * cannot serialize the per-group sort into a single task.
  */
object Truncation {

  /** Stable hash of `columns`: sha2 over a canonical JSON object whose
    * values are the columns cast to string under positional field names.
    * JSON escaping makes the encoding injective for a fixed schema — a
    * separator join collides on embedded separator characters, and skips
    * NULLs so ("a", NULL) and (NULL, "a") would merge; here a NULL field is
    * omitted TOGETHER with its positional name, so distinct rows keep
    * distinct encodings. Same scheme as AddUniqueColumn (RowOps.scala).
    */
  def colsHash(columns: Seq[String]): Column =
    sha2(
      to_json(struct(columns.zipWithIndex.map { case (c, i) =>
        col(c).cast("string").as(s"c$i")
      }: _*)),
      256)

  /** Stable per-row hash over all columns. */
  def rowHash(df: DataFrame): Column = colsHash(df.columns.toSeq)

  /** Thresholds at or below this take the bounded-aggregate selection
    * (BoundedTopKAgg) instead of a window / the salted two-phase windows:
    * one map-side-combined exchange whose partial buffers hold ≤ threshold
    * rows per group, so a hot group contributes ≤ threshold rows per map
    * partition — skew-immune WITHOUT the sampling probe, the hot-key
    * routing joins, or the full-input window shuffle. Above the bound
    * (per-group buffers would no longer be small) the window paths stay.
    */
  private val aggPathMaxThreshold = 1024

  /** `sha2` emits lowercase hex; `unhex` halves the ordering key's bytes
    * in the aggregate buffers and shuffle while preserving the EXACT
    * selection — hex chars 0-9a-f are ascending in ASCII, two chars per
    * byte, so unsigned byte order equals hex-string order.
    */
  private def hashKey(hash: Column): Column = unhex(hash)

  /** Bounded-aggregate keepSmallest: per group, keep the `threshold`
    * rows smallest under (`sortPrefix`, every df column) — row-identical
    * to `keepSmallest` whenever `sortPrefix` alone is already a total
    * order on the group's rows (the rowHash orderings) or ties are
    * interchangeable; appending the full row makes the refined order
    * deterministic either way. */
  private def keepSmallestAgg(
      df: DataFrame,
      groupColumns: Seq[String],
      sortPrefix: Seq[Column],
      threshold: Int
  ): DataFrame = {
    val cols = df.columns.toSeq
    val pre = sortPrefix.length
    df.groupBy(groupColumns.map(col): _*)
      .agg(graft.plans.BoundedTopKAgg
        .column(sortPrefix ++ cols.map(col), threshold, distinct = false)
        .as("__top"))
      .select(explode(col("__top")).as("__r"))
      .select(cols.zipWithIndex.map { case (c, i) =>
        col(s"__r._o${pre + i}").as(c)
      }: _*)
  }

  /** Single-window top-τ: rank rows within each group by `order`, keep the
    * first `threshold`.
    */
  private def keepSmallest(
      df: DataFrame,
      groupColumns: Seq[String],
      order: Seq[Column],
      threshold: Int
  ): DataFrame = {
    val w = Window.partitionBy(groupColumns.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= threshold)
      .drop("__rn")
  }

  /** Keep at most `threshold` rows per group (reference `truncation.py:91-162`). */
  def truncateLargeGroups(
      df: DataFrame,
      groupColumns: Seq[String],
      threshold: Int
  ): DataFrame =
    keepSmallest(
      df, groupColumns, rowHash(df) +: df.columns.map(col).toSeq, threshold)

  /** Hot/cold-routed two-phase top-τ selection, generic over the ordering
    * (`hash` first, then `tieBreak`): stage 1 keeps each (group, salt)
    * bucket's τ smallest rows, stage 2 re-selects the τ smallest among the
    * ≤ saltBuckets·τ survivors. Row-identical to the single-window version —
    * each of the global top-τ rows is by definition within its own bucket's
    * top-τ — but a group holding 10% of a 100 TB table sorts on
    * `saltBuckets` tasks instead of one. The salt derives from the row's
    * hash, so selection stays deterministic under task retries (unlike
    * partition-id-based salting). Stage 1 shuffles the same bytes the plain
    * window would; stage 2 only moves ≤ saltBuckets·τ rows per group.
    */
  private def saltedKeepSmallest(
      df: DataFrame,
      groupColumns: Seq[String],
      hash: Column,
      tieBreak: Seq[Column],
      threshold: Int,
      saltBuckets: Int,
      hotGroupMinRows: Long,
      // stage-1 bucketing hash; defaults to xxhash64 of the primary order
      // column, which spreads only when that column is near-unique per row
      // (true for rowHash ordering; a LOW-cardinality order column — e.g. a
      // quality score — must pass its own row-spreading expression here)
      saltExpr: Option[Column] = None
  ): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val cols = df.columns.toSeq
    val gcols = groupColumns.map(col)
    def plain(d: DataFrame): DataFrame =
      keepSmallest(d, groupColumns, hash +: tieBreak, threshold)
    if (saltBuckets == 1) return plain(df)
    // Hot/cold routing: salting every group would explode the number of
    // window partitions (groups × saltBuckets near-empty sorts dominated a
    // 640k-uniform-group benchmark), so only groups whose row count would
    // serialize a single task go through the two-phase path. The count
    // aggregation is map-side combined (skew-immune) and the hot-key table
    // is tiny, so both routing joins broadcast.
    //
    // Eager probe (same pattern as PublicJoin's multiplicity probe): in the
    // common no-hot-group case the routed plan would still scan the input
    // three more times (anti, semi, and the count); one small driver action
    // collapses it back to the single-window plan. The probe itself runs on
    // a seeded ~0.2% SAMPLE when the hot threshold is large enough for
    // sampling to be reliable: a threshold-sized group expects ~2000 sampled
    // rows and is flagged at ≥ 500, so a group large enough to matter
    // (serialization starts at millions of rows, 10× the flag bar's safety
    // margin) is missed with probability ~e^-1000 — and a miss only means
    // that group takes the plain window, which is still row-identical, just
    // slower. Flagged candidates are re-counted EXACTLY, so which groups
    // actually route through the salted path never depends on the sample.
    val sampleFraction = 2000.0 / hotGroupMinRows.toDouble
    def exactHotKeys(d: DataFrame): DataFrame = d
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotGroupMinRows)
      .select(gcols: _*)
    // The non-empty hot-key table is localCheckpointed (it is tiny): the
    // routing anti/semi joins each broadcast it, and without
    // materialization every broadcast would re-run the probe's scan.
    val hotKeys =
      if (sampleFraction >= 1.0) {
        val hk = exactHotKeys(df).localCheckpoint()
        if (hk.isEmpty) return plain(df)
        hk
      } else {
        val candidates = df
          .sample(withReplacement = false, sampleFraction, seed = 42L)
          .groupBy(gcols: _*)
          .agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") >= (hotGroupMinRows * sampleFraction / 4.0).toLong)
          .select(gcols: _*)
          .localCheckpoint()
        if (candidates.isEmpty) return plain(df)
        val candCond = groupColumns.map(c => df(c) <=> candidates(c)).reduce(_ && _)
        val hk = exactHotKeys(df.join(broadcast(candidates), candCond, "left_semi"))
          .localCheckpoint()
        if (hk.isEmpty) return plain(df)
        hk
      }
    val nullSafeOn = groupColumns.map(c => df(c) <=> hotKeys(c)).reduce(_ && _)
    val cold = df.join(broadcast(hotKeys), nullSafeOn, "left_anti")
    val coldOut = plain(cold)
    val hot = df.join(broadcast(hotKeys), nullSafeOn, "left_semi")
    val hashed = hot.withColumn("__h", hash)
    val order = col("__h") +: tieBreak
    val saltCol = saltExpr.getOrElse(xxhash64(col("__h")))
    val w1 = Window
      .partitionBy((gcols :+ pmod(saltCol, lit(saltBuckets))): _*)
      .orderBy(order: _*)
    val stage1 = hashed
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= threshold)
      .drop("__rn")
    val w2 = Window.partitionBy(gcols: _*).orderBy(order: _*)
    val hotOut = stage1
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= threshold)
      .select(cols.map(col): _*)
    coldOut.unionByName(hotOut)
  }

  /** truncateLargeGroups with the two-phase salted top-τ selection for hot
    * groups (see [[saltedKeepSmallest]]).
    */
  def truncateLargeGroupsSalted(
      df: DataFrame,
      groupColumns: Seq[String],
      threshold: Int,
      saltBuckets: Int = 32,
      hotGroupMinRows: Long = 100000L
  ): DataFrame =
    // small thresholds (the DP-truncation regime) take the bounded
    // aggregate: selection is by (rowHash, full row) exactly as below,
    // with one exchange and no probe (see aggPathMaxThreshold)
    if (threshold <= aggPathMaxThreshold)
      keepSmallestAgg(df, groupColumns, Seq(hashKey(rowHash(df))), threshold)
    else
      saltedKeepSmallest(df, groupColumns, rowHash(df),
        df.columns.map(col).toSeq, threshold, saltBuckets, hotGroupMinRows)

  /** Keep the `k` HIGHEST-`scoreCol` rows per group, ties broken by the
    * ascending `tieBreak` columns (pass a unique id for a deterministic
    * result). NULL scores rank below every real score (and NaN below
    * those). This is the per-source/per-domain quota of training-data
    * curation — cap documents per registrable domain, keeping the
    * highest-quality copies — so the hot path matters: a domain owning
    * 10% of a crawl routes through the same two-phase salted selection as
    * [[truncateLargeGroupsSalted]], with the stage-1 salt drawn from the
    * full row content (a low-cardinality score would otherwise collapse
    * the salt spread).
    */
  def topKPerGroupByScore(
      df: DataFrame,
      groupColumns: Seq[String],
      scoreCol: String,
      tieBreak: Seq[String],
      k: Int,
      saltBuckets: Int = 32,
      hotGroupMinRows: Long = 100000L
  ): DataFrame = {
    require(tieBreak.nonEmpty, "pass at least one tie-break column")
    // ascending sort on -score == descending on score; NULL -> -inf so
    // null scores lose to every real one, and -NaN = NaN sorts last
    val negScore = negate(coalesce(col(scoreCol).cast("double"),
      lit(Double.NegativeInfinity)))
    // bounded-aggregate path (see aggPathMaxThreshold): identical row set
    // whenever (score, tieBreak) is unique per row — the documented
    // determinism contract; with ambiguous ties the window picked an
    // arbitrary row, the aggregate picks the full-row-smallest one
    if (k <= aggPathMaxThreshold)
      keepSmallestAgg(df, groupColumns, negScore +: tieBreak.map(col), k)
    else
      saltedKeepSmallest(
        df,
        groupColumns,
        negScore,
        tieBreak.map(col),
        k,
        saltBuckets,
        hotGroupMinRows,
        saltExpr = Some(xxhash64(colsHash(df.columns.toSeq)))
      )
  }

  /** Drop groups with more than `threshold` rows (reference `truncation.py:165-225`).
    *
    * Implemented as a map-side-combined count plus an anti-join against the
    * (typically tiny) set of over-threshold keys rather than a count window:
    * a count window shuffles every row of a hot key to one reducer, while
    * the partial aggregation reduces each input partition to one running
    * count per key before the shuffle — immune to key skew at 100 TB. The
    * anti-join's right side holds only the over-threshold keys — usually a
    * tiny fraction — and AQE broadcasts it when it is (falling back to a
    * shuffled anti-join when a small threshold makes it large).
    */
  def dropLargeGroups(
      df: DataFrame,
      groupColumns: Seq[String],
      threshold: Int
  ): DataFrame = {
    val gcols = groupColumns.map(col)
    val bigKeys = df
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > threshold)
      .select(gcols: _*)
    // null-safe anti-join condition: groups keyed by NULL must also honor
    // the threshold, and a plain equi-join would never match them
    val cond = groupColumns.map(c => df(c) <=> bigKeys(c)).reduce(_ && _)
    df.join(bigKeys, cond, "left_anti")
  }

  /** Keep at most `threshold` distinct keys per group
    * (reference `truncation.py:228-313`).
    *
    * Skew-proof restructuring of the obvious `dense_rank` window over the
    * raw rows (which ships every row of a hot group to one task): first
    * aggregate to the distinct (group, key) pairs — map-side combinable, so
    * a key holding 10% of all rows contributes ONE pair past the shuffle —
    * then rank each group's keys by hash over that much smaller set
    * (groups with a huge number of DISTINCT keys additionally route through
    * the salted two-phase selection), and finally null-safe semi-join the
    * kept keys back against the input. The kept key set is identical to the
    * single-window `dense_rank` selection.
    */
  def limitKeysPerGroup(
      df: DataFrame,
      groupColumns: Seq[String],
      keyColumns: Seq[String],
      threshold: Int,
      saltBuckets: Int = 32,
      hotGroupMinKeys: Long = 100000L
  ): DataFrame = {
    val pairCols = groupColumns ++ keyColumns
    if (threshold <= aggPathMaxThreshold) {
      // Bounded-aggregate path: ONE map-side-combined exchange computes,
      // per group, the `threshold` distinct keys smallest by
      // (keyHash, keyColumns) — identical to ranking the distinct pairs.
      // Replaces the previous cascade (dropDuplicates exchange +
      // localCheckpoint materialization + hot-group sampling probe + rank
      // window exchange) with partial buffers capped at `threshold`
      // distinct keys per group, so a key holding 10% of all rows
      // contributes one buffer entry per map partition — skew-immune by
      // construction.
      val ordered = hashKey(colsHash(keyColumns)) +: keyColumns.map(col)
      val kept = df
        .groupBy(groupColumns.map(col): _*)
        .agg(graft.plans.BoundedTopKAgg
          .column(ordered, threshold, distinct = true).as("__top"))
        .select(groupColumns.map(col) :+ explode(col("__top")).as("__r"): _*)
        .select(groupColumns.map(col) ++ keyColumns.zipWithIndex.map {
          case (c, i) => col(s"__r._o${i + 1}").as(c)
        }: _*)
      val cond = pairCols.map(c => df(c) <=> kept(c)).reduce(_ && _)
      return df.join(kept, cond, "left_semi")
    }
    // The distinct aggregation is the expensive stage (a full shuffle of
    // the projected input); materialize its result once, because the salted
    // selection's eager hot-group probe is a separate action from the rank
    // window — without this the aggregation runs twice. localCheckpoint
    // rather than persist: the function is already eager (the probe), the
    // blocks are freed by the ContextCleaner when the plan is GC'd, and
    // nothing lands in the CacheManager for callers to clear.
    val pairs = df.select(pairCols.map(col): _*).dropDuplicates(pairCols)
      .localCheckpoint()
    val kept = saltedKeepSmallest(pairs, groupColumns, colsHash(keyColumns),
      keyColumns.map(col), threshold, saltBuckets, hotGroupMinKeys)
    val cond = pairCols.map(c => df(c) <=> kept(c)).reduce(_ && _)
    df.join(kept, cond, "left_semi")
  }
}

/** Transformation wrapper: ≤ k rows per group under IfGroupedBy; converts
  * grouped distance to row distance with stability k
  * (reference `truncation.py:18-176`).
  */
final case class LimitRowsPerGroup(
    inputDomain: DataFrameDomain,
    groupColumn: String,
    threshold: Int
) extends Transformation {
  require(threshold >= 0)
  def inputMetric: Metric = IfGroupedBy(groupColumn, SymmetricDifference)
  def outputMetric: Metric = SymmetricDifference
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn * ExactNum(threshold.toLong)
  def apply(data: Any): Any =
    Truncation.truncateLargeGroupsSalted(
      data.asInstanceOf[DataFrame],
      Seq(groupColumn),
      threshold
    )
}

/** ≤ k distinct keys per group; stability k (L1) or √k (L2)
  * (reference `truncation.py:179-375`).
  */
final case class LimitKeysPerGroup(
    inputDomain: DataFrameDomain,
    groupColumn: String,
    keyColumn: String,
    threshold: Int,
    useL2: Boolean
) extends Transformation {
  require(threshold >= 0)
  def inputMetric: Metric =
    IfGroupedBy(keyColumn, SymmetricDifference)
  def outputMetric: Metric =
    if (useL2) IfGroupedBy(groupColumn, RootSumOfSquared(SymmetricDifference))
    else IfGroupedBy(groupColumn, SumOf(SymmetricDifference))
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum =
    if (useL2) dIn * ExactNum(threshold.toLong).sqrt
    else dIn * ExactNum(threshold.toLong)
  def apply(data: Any): Any =
    Truncation.limitKeysPerGroup(
      data.asInstanceOf[DataFrame],
      Seq(groupColumn),
      Seq(keyColumn),
      threshold
    )
}

/** Two-level truncation: ≤ k rows per (key, group) pair
  * (reference `truncation.py:378-576`).
  */
final case class LimitRowsPerKeyPerGroup(
    inputDomain: DataFrameDomain,
    groupColumn: String,
    keyColumn: String,
    threshold: Int
) extends Transformation {
  require(threshold >= 0)
  def inputMetric: Metric = IfGroupedBy(keyColumn, SymmetricDifference)
  def outputMetric: Metric = IfGroupedBy(keyColumn, SymmetricDifference)
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn * ExactNum(threshold.toLong)
  def apply(data: Any): Any =
    Truncation.truncateLargeGroupsSalted(
      data.asInstanceOf[DataFrame],
      Seq(keyColumn, groupColumn),
      threshold
    )
}
