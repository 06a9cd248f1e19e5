package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Incremental maintenance of snapshots and aggregates — the operators
  * that keep a 100 TB corpus refresh from rescanning the corpus. Both
  * follow the delta-maintenance discipline of the reference's
  * re-execution-free pipelines (cf. reference `docs/source/tutorials`
  * incremental-session guidance): the big input appears in exactly one
  * shuffle, and the carried state is keys-sized, never corpus-sized.
  */
object Incremental {

  /** Apply a CDC changelog to a keyed snapshot.
    *
    * `changes` carries one row per change event: the key columns, a
    * monotonically increasing `seqCol` (commit LSN / offset; `(keys, seq)`
    * must be unique — the usual changelog contract — otherwise which tied
    * change wins is unspecified), an `opCol` in {"I","U","D"}
    * (insert / update / delete; I and U are both upserts), and the new
    * payload values. The result is the post-image: snapshot rows with no
    * change survive unchanged, the latest I/U per key upserts its payload,
    * and keys whose latest change is D disappear (a D on an absent key is
    * a no-op).
    *
    * Physical shape: the changelog collapses to its per-key latest row
    * with one `max_by(struct(op, payload), seq)` hash aggregate (map-side
    * partial combine bounds the shuffle by distinct keys, not change
    * volume), then one full-outer join against the snapshot on the keys.
    * The snapshot — the 100 TB side — is touched by exactly that one
    * join; no windows, no sorts.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(
      (keyCols ++ payloadCols).toSet.subsetOf(snapshot.columns.toSet),
      "snapshot must carry every key and payload column")
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct(col(opCol).as("op") +: payloadCols.map(col): _*),
        col(seqCol)).as("__chg"))
    val keyEq = keyCols
      .map(k => snapshot(k) <=> latest(k))
      .reduce(_ && _)
    val joined = snapshot.join(latest, keyEq, "full_outer")
    // __chg is non-null exactly on rows a latest change matched
    val deleted = col("__chg").isNotNull && col("__chg.op") === "D"
    val outKeys = keyCols.map(k =>
      coalesce(snapshot(k), latest(k)).as(k))
    val outPayload = payloadCols.map(p =>
      when(col("__chg").isNotNull, col(s"__chg.$p"))
        .otherwise(snapshot(p)).as(p))
    joined
      .filter(!coalesce(deleted, lit(false)))
      .select(outKeys ++ outPayload: _*)
  }

  /** Build the mergeable aggregate state of `valueCol` per key:
    * `(keys..., cnt, sum, min, max)`. `sum` is exact integer arithmetic —
    * pass an integral column (scale doubles to cents first) so re-merging
    * is replayable in any order. One hash-aggregate pass. */
  def aggStates(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val v = col(valueCol).cast(LongType)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        // row count, not non-null-value count — cnt must mean "rows this
        // state summarizes" for the view-maintenance contract to hold
        count(lit(1)).as("cnt"),
        sum(v).as("sum"),
        min(v).as("min"),
        max(v).as("max"))
  }

  /** Mergeable distinct-count states per key: `(keys..., nd_sketch)` where
    * the sketch is a DataSketches HLL binary. Below the sketch's coupon
    * threshold (hundreds of values at the default lgK=12) the estimate is
    * EXACT; beyond it the standard ~1.6% HLL error applies. Unlike
    * `count_distinct`, states from disjoint batches union losslessly —
    * the incremental counterpart of the exact [[aggStates]]. */
  def distinctStates(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("nd_sketch"))
  }

  /** Fold a delta's distinct-count states into saved ones (sketch union —
    * exact in coupon mode, never double-counts re-seen values). */
  def mergeDistinctStates(
      base: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame =
    distinctStates(delta, keyCols, valueCol, lgK)
      .unionByName(base.select((keyCols :+ "nd_sketch").map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("nd_sketch"), lit(true)).as("nd_sketch"))

  /** Readout of [[distinctStates]]: `(keys..., n_distinct)`. */
  def estimateDistinct(states: DataFrame, keyCols: Seq[String]): DataFrame =
    states.select(
      keyCols.map(col) :+
        hll_sketch_estimate(col("nd_sketch"))
          .cast(LongType).as("n_distinct"): _*)

  /** Fold a batch of new raw rows into an existing aggregate state without
    * touching the rows the state already summarizes: the classic
    * self-maintainable-view update for the distributive aggregates
    * (count/sum/min/max — Gray et al., "Data Cube", ICDE'96 taxonomy).
    * `base` is a previous [[aggStates]] output; `delta` is raw. The result
    * equals `aggStates(old rows ∪ delta)` exactly (integer sums), at the
    * cost of one shuffle of `delta`'s partial states plus the keys-sized
    * `base` — the corpus that produced `base` is not read at all.
    */
  def mergeAggStates(
      base: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val expected = keyCols ++ Seq("cnt", "sum", "min", "max")
    require(
      expected.toSet.subsetOf(base.columns.toSet),
      s"base must be an aggStates output carrying ${expected.mkString(",")}")
    aggStates(delta, keyCols, valueCol)
      .unionByName(base.select(expected.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }

  /** Mergeable bottom-k sample states per key: the `k` distinct values of
    * `idCol` in each group whose portable 60-bit SHA-256 hash is smallest,
    * as `(keys..., id, h, rank)`. A bottom-k (KMV) sketch is three tools
    * in one: (a) a uniform without-replacement sample of the group's
    * distinct ids, (b) a distinct-count estimator ([[estimateDistinctKmv]]
    * — and unlike the HLL of [[distinctStates]] it replays EXACTLY in any
    * engine with SHA-256), and (c) losslessly mergeable across batches —
    * bottom-k of a union equals bottom-k of the unioned bottom-k states
    * ([[mergeSampleStates]]), so a corpus refresh touches only the delta.
    *
    * Shape: distinct on (keys, id) is one map-side-combinable shuffle; the
    * bottom-k is `row_number() <= k`, planned as Partial + Final
    * WindowGroupLimit — each task forwards at most k rows per group.
    */
  def sampleStates(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      k: Int,
      salt: Long = 9L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val dist = df.select((keyCols :+ idCol).map(col): _*).distinct()
      .withColumn("h", Dedup.portableHash(col(idCol), salt))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("h").asc, col(idCol).asc)
    dist.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Fold a delta of raw rows into saved bottom-k states: sketch the delta,
    * union the (keys, id) rows of both sketches, re-take the bottom k.
    * Exactly equals [[sampleStates]] over the full history. */
  def mergeSampleStates(
      base: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      k: Int,
      salt: Long = 9L): DataFrame = {
    val cols = (keyCols :+ idCol).map(col)
    sampleStates(
      base.select(cols: _*)
        .unionByName(sampleStates(delta, keyCols, idCol, k, salt)
          .select(cols: _*)),
      keyCols, idCol, k, salt)
  }

  /** KMV readout of [[sampleStates]]: `(keys..., n_distinct_est)`. For a
    * group whose sketch is saturated (rank k exists), the classic
    * estimator (k−1)·2^60/h_k; below k distinct ids the count is exact.
    * Every number is a fixed arithmetic tree over exact integers, so the
    * estimate itself replays bit-for-bit across engines.
    */
  def estimateDistinctKmv(states: DataFrame, keyCols: Seq[String], k: Int): DataFrame =
    states.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), max(when(col("rank") === k, col("h"))).as("__hk"))
      .select(keyCols.map(col) :+
        when(col("__hk").isNull, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
            col("__hk").cast("double"))
          .as("n_distinct_est"): _*)

  /** Mergeable MinHash signature states: per key, `numHashes` rows
    * (keys..., hash_id, min_hash) where min_hash is the minimum portable
    * 60-bit SHA-derived hash of the key's elements under that hash
    * index. min is associative, commutative, AND idempotent, so folding
    * deltas in any order — even with overlapping or duplicate elements —
    * equals the from-scratch signature exactly: the streaming near-dup
    * index maintenance primitive (LSH banding reads straight off these
    * states; signature Jaccard estimates set Jaccard).
    *
    * Lane batching: a SHA-256 digest carries 64 hex chars — four
    * independent 60-bit lanes — so hash index i reads lane i%4 of the
    * digest keyed by i/4: hash_i(x) = hex[1+15·(i%4) .. +15] of
    * sha256(salt|i/4|x). One digest feeds FOUR hash functions, cutting
    * the dominant per-element digest count 4× versus one-digest-per-
    * index, and the recipe stays engine-replayable bit-for-bit (the
    * DuckDB oracles spell the same substring arithmetic).
    *
    * Plan: one narrow explode (×⌈numHashes/4⌉ digests, each fanned to
    * its 4 lanes in-row; no pre-distinct — the min aggregate absorbs
    * duplicates map-side, which beats paying a distinct shuffle first)
    * and one combinable aggregate of keys×numHashes rows. Because ALL
    * the digest work is map-side of the first shuffle, the stage's
    * parallelism is the SCAN's — a small single-row-group parquet input
    * would serialize the whole hashing on one core (measured 4.4 s vs
    * 1.4 s on the bench fixture) — so when the input has fewer than half
    * the cluster's slots in partitions, a cheap pre-explode rebalance of
    * the raw (keys, element) rows spreads it; at real input sizes the
    * scan already exceeds the slot count and no exchange is added.
    */
  def minhashStates(
      df: DataFrame,
      keyCols: Seq[String],
      elementCol: String,
      numHashes: Int,
      salt: Long = 7L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(numHashes >= 1, "numHashes must be >= 1")
    val numDigests = (numHashes + 3) / 4
    // 60-bit lanes straight off the digest bytes (graft.plans.Sha2Lanes)
    // instead of sha2-hex → 4×substring → 4×conv: value-identical (the
    // recipe is pinned cross-engine: lane i = hex digits [15i, 15i+15)
    // of sha256("salt|digest_id|element") as a base-16 long), but ~10
    // short-lived allocations per (key, element, digest) fewer — the
    // churn that pushed the sf10 decade factor past linear (SCALING.md
    // round-13 RCA).
    val lanes = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.Sha2Lanes(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          concat_ws("|", lit(salt.toString),
            col("digest_id").cast("string"),
            col(elementCol).cast("string"))),
        numLanes = 4))
    val in = df.select((keyCols :+ elementCol).map(col): _*)
      .filter(col(elementCol).isNotNull)
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (in.rdd.getNumPartitions * 2 <= slots) in.repartition(slots) else in
    balanced
      .withColumn("digest_id",
        explode(sequence(lit(0L), lit((numDigests - 1).toLong))))
      .select(keyCols.map(col) :+ col("digest_id") :+
        posexplode(lanes).as(Seq("__lane", "__h")): _*)
      .withColumn("hash_id", col("digest_id") * 4 + col("__lane"))
      .filter(col("hash_id") < numHashes)
      .groupBy((keyCols :+ "hash_id").map(col): _*)
      .agg(min(col("__h")).as("min_hash"))
  }

  /** Fold a delta of raw rows into saved MinHash states: sketch the
    * delta and take the per-(key, hash_id) min of both. Exactly equals
    * [[minhashStates]] over the full history, regardless of how the
    * history was split. */
  def mergeMinhashStates(
      states: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      elementCol: String,
      numHashes: Int,
      salt: Long = 7L): DataFrame =
    states
      .select((keyCols :+ "hash_id" :+ "min_hash").map(col): _*)
      .unionByName(
        minhashStates(delta, keyCols, elementCol, numHashes, salt))
      .groupBy((keyCols :+ "hash_id").map(col): _*)
      .agg(min(col("min_hash")).as("min_hash"))

  /** Mergeable fixed-grid histogram states for incremental quantile
    * maintenance: per key, bin counts over `bins` equal-width buckets on
    * `[lo, hi)` (out-of-range values clamped into the edge bins, the
    * `Olap.histogramFixed` convention). Merge is count addition, so
    * folding DISJOINT deltas in any order (counts add — unlike the
    * idempotent min-merge, an overlapping delta double-counts) equals
    * the from-scratch histogram and
    * the grid quantiles read off it ([[quantileFromHist]]) are exact
    * functions of the union — the self-maintainable quantile monitor
    * for streaming/batch ingestion (the state is `keys × bins` rows,
    * never data-sized).
    */
  def histStates(
      df: DataFrame,
      keyCols: Seq[String],
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val bin = least(
      greatest(floor((value.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(value.isNotNull)
      .groupBy(keyCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Fold a delta of raw rows into saved histogram states; exactly
    * equals [[histStates]] over the full history. */
  def mergeHistStates(
      states: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame =
    states.select((keyCols :+ "bin" :+ "n").map(col): _*)
      .unionByName(histStates(delta, keyCols, value, lo, hi, bins))
      .groupBy((keyCols :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Grid quantiles from histogram states: for each requested
    * (p, name), the LOWER EDGE of the smallest bin whose cumulative
    * count reaches ⌈p·n⌉ — a discrete, integer-decided statistic (no
    * interpolation), deterministic on any engine. One window over the
    * (keys × bins)-sized state table, then a combinable aggregate. */
  def quantileFromHist(
      states: DataFrame,
      keyCols: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int,
      ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    val w = (hi - lo) / bins
    val win = Window.partitionBy(keyCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(keyCols.map(col): _*)
    val cum = states
      .withColumn("__cum", sum(col("n")).over(win))
      .withColumn("__tot", sum(col("n")).over(tot))
    val aggs = ps.map { case (p, name) =>
      (lit(lo) + min(when(
        col("__cum") >= ceil(lit(p) * col("__tot")), col("bin")))
        .cast("double") * lit(w)).as(name)
    }
    cum.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
