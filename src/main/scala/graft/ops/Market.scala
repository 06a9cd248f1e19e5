package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: frequent item pairs and
  * support/confidence/lift association rules.
  *
  * The reference engine has no co-occurrence surface (its operator set
  * stops at DP aggregation — SURVEY.md §2.7); this layer serves the
  * training-data side of the house: co-occurrence statistics over
  * (document, entity) or (session, item) tables are the standard raw
  * material for negative-sampling tables, related-item retrieval, and
  * curriculum mixing.
  *
  * Scale design. The only quadratic step is the per-basket pair
  * explosion, and it is bounded BEFORE it happens: baskets are capped at
  * `maxBasketSize` items (deterministically — the k smallest item ids
  * survive, so reruns and engine replays agree), which bounds the
  * per-basket fan-out at k(k-1)/2 regardless of skew. The cap itself is
  * a bounded map-side-combinable aggregate (one exchange whose partial
  * buffers hold ≤ k items per basket, skew-immune), pairs explode in
  * place from the per-basket sorted arrays (no self-join), and pair and
  * item counts are ordinary combinable aggregations. Nothing is
  * collected to the driver except the single basket-count scalar, which
  * rides a broadcast cross join.
  *
  * Determinism discipline (the DuckDB-oracle contract used across this
  * repo): all ratios are emitted as integer ppm computed by the exact
  * same left-associated double expression in both engines, from exact
  * integer counts — so the driver's hash compare is bit-stable.
  */
object Market {

  /** Distinct unordered item pairs per basket with co-occurrence counts.
    * Output: (item_a, item_b, pair_n) with item_a < item_b,
    * pair_n >= minPairCount. `maxBasketSize <= 0` disables the cap.
    */
  def frequentPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketSize: Int = 64): DataFrame =
    pairsOf(cappedBasketArrays(df, basketCol, itemCol, maxBasketSize))
      .filter(col("pair_n") >= minPairCount)

  /** Association rules in both directions from the frequent pairs:
    * (antecedent, consequent, pair_n, n_ante, n_cons,
    *  support_ppm, conf_ppm, lift_ppm).
    *
    * support = pair_n / n_baskets, confidence = pair_n / n_ante,
    * lift = pair_n * n_baskets / (n_ante * n_cons); each reported as
    * round(1e6 * ratio) in a BIGINT column.
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketSize: Int = 64): DataFrame = {
    // persisted because four branches consume it (both self-join legs,
    // the item counts, the basket count); the cache fills on the first
    // action and is shared by the rest of the same DAG. Deliberately NOT
    // unpersisted here — the returned frame is lazy, so an eager
    // unpersist at build time would silently defeat the cache; callers
    // (and the verify/bench harnesses) clear caches between queries.
    val baskets = cappedBasketArrays(df, basketCol, itemCol, maxBasketSize)
      .persist()
    val pairs = pairsOf(baskets).filter(col("pair_n") >= minPairCount)
    // per-item basket count and the global basket count; rows are
    // (item, count) — tiny next to the pair table, broadcast-friendly.
    // baskets is one array row per basket, so item counts explode it and
    // the basket count is a plain count of rows.
    val itemN = baskets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val nB = baskets.select(count(lit(1)).as("n_baskets"))
    // one scan of the pair aggregate: explode both rule directions from
    // each pair row (a two-branch union would re-run the self-join agg)
    val directed = pairs.select(explode(array(
        struct(col("item_a").as("antecedent"),
          col("item_b").as("consequent"), col("pair_n")),
        struct(col("item_b").as("antecedent"),
          col("item_a").as("consequent"), col("pair_n")))).as("__d"))
      .select(col("__d.antecedent").as("antecedent"),
        col("__d.consequent").as("consequent"),
        col("__d.pair_n").as("pair_n"))
    val joined = directed
      .join(itemN.select(col("item").as("antecedent"),
        col("n_item").as("n_ante")), Seq("antecedent"))
      .join(itemN.select(col("item").as("consequent"),
        col("n_item").as("n_cons")), Seq("consequent"))
      .crossJoin(broadcast(nB))
    val out = joined.select(
      col("antecedent"), col("consequent"), col("pair_n"),
      col("n_ante"), col("n_cons"),
      round(lit(1000000.0) * col("pair_n") / col("n_baskets"))
        .cast("long").as("support_ppm"),
      round(lit(1000000.0) * col("pair_n") / col("n_ante"))
        .cast("long").as("conf_ppm"),
      round(lit(1000000.0) * col("pair_n") * col("n_baskets")
        // the denominator squares item counts — multiply in double
        // (exact below 2^53), not long (2^63 at ~3e9 baskets)
        / (col("n_ante").cast("double") * col("n_cons").cast("double")))
        .cast("long").as("lift_ppm"))
    out
  }

  /** Observability for the basket cap (the repo's drops-observable
    * discipline): one row — (n_baskets, n_capped_baskets,
    * n_items_dropped) — quantifying what `maxBasketSize` excluded from
    * pair mining. Run it alongside [[frequentPairs]] whenever the cap is
    * active; a non-trivial n_items_dropped means support counts
    * undercount the capped baskets. */
  def basketCapReport(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int): DataFrame = {
    require(maxBasketSize > 0, "maxBasketSize must be positive")
    df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .groupBy(col("basket"))
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("n_baskets"),
        sum(when(col("__n") > maxBasketSize, 1L).otherwise(0L))
          .as("n_capped_baskets"),
        sum(when(col("__n") > maxBasketSize,
          col("__n") - maxBasketSize).otherwise(0L))
          .as("n_items_dropped"))
  }

  /** Per-basket sorted array of the k smallest distinct items —
    * `(basket, items array<itemType>)`, ascending, NULL item first when
    * present (a NULL occupies a cap slot exactly as the rank-window
    * formulation counted it, though it never pairs).
    *
    * NULL-item divergence between the branches, documented (round-17
    * ADVICE): the capped path keeps a NULL in a cap slot (it counts
    * toward k, never pairs); the uncapped path's `collect_list` silently
    * drops NULLs. Outputs agree because [[pairsOf]] filters NULLs before
    * pairing and no declared caller feeds NULL items with maxBasketSize
    * <= 0; filtering NULLs in the capped branch instead would CHANGE the
    * cap semantics q_assoc_rules replays (a NULL would stop occupying a
    * slot), so the divergence is kept and pinned in MarketSpec.
    *
    * One bounded aggregation replaces the previous distinct + rank window
    * (two exchanges + a sort): partial buffers are capped at k items, so
    * a degenerate basket with millions of distinct items contributes ≤ k
    * entries per map partition instead of shipping every row to one
    * reducer (the window sorted the whole basket on one task). The array
    * form also lets [[pairsOf]] explode pairs in place — the previous
    * basket self-join evaluated the capping subtree once per join leg.
    */
  private def cappedBasketArrays(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int): DataFrame = {
    val b0 = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
    if (maxBasketSize <= 0)
      b0.distinct()
        .groupBy(col("basket"))
        .agg(sort_array(collect_list(col("item"))).as("items"))
    else
      b0.groupBy(col("basket"))
        .agg(graft.plans.BoundedTopKAgg
          .column(Seq(col("item")), maxBasketSize, distinct = true)
          .as("__top"))
        .select(col("basket"),
          transform(col("__top"), r => r.getField("_o0")).as("items"))
  }

  /** Unordered in-basket item pairs with co-occurrence counts, exploded
    * directly from the sorted per-basket arrays: element i pairs with
    * every later element, so `item_a < item_b` by construction (arrays
    * ascending, distinct) and no basket self-join is needed. NULL items
    * sort first and are skipped — the join formulation's `a.item <
    * b.item` never matched them either. */
  private def pairsOf(basketArrays: DataFrame): DataFrame =
    basketArrays
      // nulls sort first, so dropping them up front (type-generically)
      // keeps the remaining array sorted; the join formulation's
      // `a.item < b.item` never matched a NULL either
      .select(filter(col("items"), x => x.isNotNull).as("__it"))
      .select(explode(flatten(transform(col("__it"), (x, i) =>
        transform(slice(col("__it"), i + lit(2),
          greatest(size(col("__it")) - i - lit(1), lit(0))),
          y => struct(x.as("item_a"), y.as("item_b")))))).as("__p"))
      .groupBy(col("__p.item_a").as("item_a"), col("__p.item_b").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
}
