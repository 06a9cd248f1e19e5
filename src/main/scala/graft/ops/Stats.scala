package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inferential and evaluation statistics over grouped data: Welch's
  * unequal-variance t-test for A/B comparisons; chi-square /
  * mutual-information / Cramér's-V categorical association and one-way
  * ANOVA (η², F) for category→numeric; exact rank-sum ROC-AUC,
  * precision/recall@k and NDCG@k for ranking evaluation; Gini and
  * Herfindahl concentration indices; and per-group OLS trends.
  *
  * The reference engine's statistical surface is DP aggregation only
  * (SURVEY.md §2.5-2.6); these are the non-private companions an
  * experimentation or data-drift pipeline runs next to it. Everything
  * is built from hash aggregates over exact integer sums plus at most
  * one group-layout window (AUC's ranks, the top-k cuts) — no
  * driver-side math, no unbounded collects (the one collect_list, in
  * [[anovaEta]], is category-cardinality-bounded).
  *
  * Determinism discipline (the repo's DuckDB-oracle contract): all
  * floating-point statistics are derived from EXACT integer sums — the
  * metric is quantized to an integer grid (`scale` units per 1.0) before
  * summation, so the partial-merge sums are order-free, and every double
  * is then computed by the same left-associated expression the oracle
  * SQL spells, making results bit-stable across engines and partitioned
  * re-runs.
  */
object Stats {

  /** Welch's two-sample t-test of `value` between `variantA` and
    * `variantB` rows, per `keys` group. Output per key:
    * (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, dof) — unbiased
    * sample variances, Welch-Satterthwaite degrees of freedom. Keys
    * where either side has < 2 observations are dropped (the statistic
    * is undefined there).
    *
    * `scale`: integer quantization grid for exactness — value counts in
    * units of 1/scale (e.g. 100 = cents for currency-like metrics).
    */
  def welchT(
      df: DataFrame,
      keys: Seq[String],
      variant: Column,
      value: Column,
      variantA: String,
      variantB: String,
      scale: Int = 100): DataFrame = {
    val c = round(value * lit(scale)).cast("long")
    def side(v: String, tag: String) = Seq(
      sum(when(variant === lit(v), lit(1L)).otherwise(lit(0L)))
        .as(s"n_$tag"),
      sum(when(variant === lit(v), c).otherwise(lit(0L))).as(s"s1_$tag"),
      // Σc² in exact decimal, one rounding to double (2^63 at ~4e9 rows
      // with the 100-grid; DuckDB replays via its HUGEINT sum)
      sum(when(variant === lit(v), (c * c).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).cast("double")
        .as(s"s2_$tag"))
    val aggs = side(variantA, "a") ++ side(variantB, "b")
    // null metric rows carry no information: without this filter they
    // would count toward n_a/n_b while contributing nothing to the sums,
    // silently biasing every derived moment
    val sums = df.filter(variant.isin(variantA, variantB) && value.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
    val sc = lit(scale.toDouble)
    def mean(tag: String) = col(s"s1_$tag") / sc / col(s"n_$tag")
    // unbiased: (sum(x^2) - sum(x)^2/n) / (n-1), in metric units
    def variance(tag: String) =
      ((col(s"s2_$tag") / sc / sc
        - col(s"s1_$tag") / sc * (col(s"s1_$tag") / sc) / col(s"n_$tag"))
        / (col(s"n_$tag") - lit(1L)))
    val withMoments = sums.select(
      keys.map(col) ++ Seq(
        col("n_a"), col("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        variance("a").as("var_a"), variance("b").as("var_b")): _*)
    val sea = col("var_a") / col("n_a")
    val seb = col("var_b") / col("n_b")
    val se2 = sea + seb
    withMoments.select(
      keys.map(col) ++ Seq(
        col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("var_a"), col("var_b"),
        ((col("mean_a") - col("mean_b")) / sqrt(se2)).as("t_stat"),
        (se2 * se2 / (sea * sea / (col("n_a") - lit(1L))
          + seb * seb / (col("n_b") - lit(1L)))).as("dof")): _*)
  }

  /** Per-cell chi-square contribution table for the `rowLabel` ×
    * `colLabel` contingency: (row_label, col_label, n_obs, expected_m,
    * chi2_contrib_ppm). The full cross product of observed labels is
    * emitted — zero-observed cells included, since they still contribute
    * their expected mass. `expected_m` is round(1000·expected) and
    * `chi2_contrib_ppm` is round(1e6·(obs-e)²/e), both BIGINT, so the
    * statistic (sum of contributions / 1e6) reassembles exactly from
    * integer addition in any order.
    *
    * Plan: one count aggregate over the data, margins reduced from the
    * (label-sized) cell table, full cross of the two margin tables —
    * every post-aggregation relation is label-cardinality-sized, so the
    * crosses and joins are broadcasts at any data scale.
    */
  def chi2Contingency(
      df: DataFrame,
      rowLabel: Column,
      colLabel: Column): DataFrame = {
    // persisted: the label²-sized cell table feeds four consumers (both
    // margins, the total, the final join); uncached, each one re-scans
    // the full input. Lazily filled on first action; callers/harnesses
    // clear caches (the lazy-return contract, see Market).
    val cells = df
      .filter(rowLabel.isNotNull && colLabel.isNotNull)
      .groupBy(rowLabel.as("row_label"), colLabel.as("col_label"))
      .agg(count(lit(1)).as("n_obs"))
      .persist()
    val rowTot = cells.groupBy("row_label").agg(sum("n_obs").as("rt"))
    val colTot = cells.groupBy("col_label").agg(sum("n_obs").as("ct"))
    val total = cells.select(sum("n_obs").as("n"))
    val full = rowTot.crossJoin(colTot).crossJoin(broadcast(total))
      .join(cells, Seq("row_label", "col_label"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    // rt·ct squares the row count — multiply in double (both factors are
    // exact doubles below 2^53 rows), not long, which overflows near 3e9
    // total rows; the oracle casts the first factor identically
    val e = col("rt").cast("double") * col("ct") / col("n")
    full.select(
      col("row_label"), col("col_label"), col("n_obs"),
      round(lit(1000.0) * col("rt") * col("ct") / col("n"))
        .cast("long").as("expected_m"),
      round(lit(1000000.0)
        * ((col("n_obs") - e) * (col("n_obs") - e)) / e)
        .cast("long").as("chi2_contrib_ppm"))
  }

  /** The chi-square statistic itself (ppm-scaled BIGINT) with its
    * degrees of freedom, reassembled from the per-cell table by exact
    * integer summation. */
  def chi2Statistic(
      df: DataFrame,
      rowLabel: Column,
      colLabel: Column): DataFrame =
    chi2Contingency(df, rowLabel, colLabel)
      .agg(
        sum(col("chi2_contrib_ppm")).as("chi2_ppm"),
        ((countDistinct(col("row_label")) - lit(1L))
          * (countDistinct(col("col_label")) - lit(1L))).as("dof"))

  /** Per-cell mutual-information contributions for the `rowLabel` ×
    * `colLabel` contingency: (row_label, col_label, n_obs,
    * mi_contrib_ppm) with contrib = (c/n)·ln(c/e) in nats, e the
    * expected count rt·ct/n. Only observed cells are emitted — an empty
    * cell's contribution is 0 by the p·ln p convention. The feature-
    * selection companion to [[chi2Contingency]], same one-aggregate
    * plan; the ln guard band is suite-pinned on the entry fixture.
    */
  def miContingency(
      df: DataFrame,
      rowLabel: Column,
      colLabel: Column): DataFrame = {
    // persisted for the same four-consumer reason as [[chi2Contingency]]
    val cells = df
      .filter(rowLabel.isNotNull && colLabel.isNotNull)
      .groupBy(rowLabel.as("row_label"), colLabel.as("col_label"))
      .agg(count(lit(1)).as("n_obs"))
      .persist()
    val rowTot = cells.groupBy("row_label").agg(sum("n_obs").as("rt"))
    val colTot = cells.groupBy("col_label").agg(sum("n_obs").as("ct"))
    val total = cells.select(sum("n_obs").as("n"))
    // rt·ct squares the row count — multiply in double (both factors are
    // exact doubles below 2^53 rows), not long, which overflows near 3e9
    // total rows; the oracle casts the first factor identically
    val e = col("rt").cast("double") * col("ct") / col("n")
    cells
      .join(rowTot, Seq("row_label"))
      .join(colTot, Seq("col_label"))
      .crossJoin(broadcast(total))
      .select(
        col("row_label"), col("col_label"), col("n_obs"),
        round(lit(1000000.0)
          * (col("n_obs").cast("double") / col("n"))
          * log(col("n_obs").cast("double") / e))
          .cast("long").as("mi_contrib_ppm"))
  }

  /** Total mutual information (ppm nats) between two categorical
    * columns, reassembled from [[miContingency]] by exact integer
    * summation. */
  def miStatistic(
      df: DataFrame,
      rowLabel: Column,
      colLabel: Column): DataFrame =
    miContingency(df, rowLabel, colLabel)
      .agg(sum(col("mi_contrib_ppm")).as("mi_ppm"))

  /** Cramér's V — the [0, 1]-normalized effect size of the chi-square
    * association: V = sqrt(chi2 / (n·min(r−1, c−1))). Single row
    * (chi2_ppm, dof, n, v_ppm); derived from the exact per-cell ppm sum
    * so it replays bit-identically.
    */
  def cramersV(
      df: DataFrame,
      rowLabel: Column,
      colLabel: Column): DataFrame = {
    val base = chi2Contingency(df, rowLabel, colLabel)
    base.agg(
      sum(col("chi2_contrib_ppm")).as("chi2_ppm"),
      ((countDistinct(col("row_label")) - lit(1L))
        * (countDistinct(col("col_label")) - lit(1L))).as("dof"),
      sum(col("n_obs")).as("n"),
      least(countDistinct(col("row_label")) - lit(1L),
        countDistinct(col("col_label")) - lit(1L)).as("__m"))
      .select(col("chi2_ppm"), col("dof"), col("n"),
        round(lit(1000000.0) * sqrt(
          col("chi2_ppm") / lit(1000000.0) / (col("n") * col("__m"))))
          .cast("long").as("v_ppm"))
  }

  /** Exact ROC-AUC per group via the rank-sum (Mann-Whitney) identity
    * with average-rank tie correction: AUC = (R⁺ − n⁺(n⁺+1)/2) /
    * (n⁺·n⁻), where R⁺ sums the ascending average ranks of the
    * positives. Doubled ranks (2·rank + tieCount − 1) keep every
    * intermediate an exact integer, so auc_ppm replays bit-identically.
    * Rows with a null label are excluded BEFORE ranking (they must not
    * shift the ranks of labeled rows). Groups with no positives or no
    * negatives are dropped (AUC undefined).
    *
    * One shuffle + in-partition sort (both windows share the group
    * layout), then a combinable aggregate — the standard way to get
    * exact AUC without collecting scores.
    */
  def aucByGroup(
      df: DataFrame,
      keys: Seq[String],
      score: Column,
      positive: Column): DataFrame = {
    val base = df
      .filter(score.isNotNull && positive.isNotNull)
      .select(keys.map(col) :+ score.as("__s") :+
        positive.cast("boolean").as("__p"): _*)
    val wRank = Window.partitionBy(keys.map(col): _*).orderBy(col("__s"))
    val wTie = Window.partitionBy((keys :+ "__s").map(col): _*)
    val ranked = base
      .withColumn("__r", rank().over(wRank))
      .withColumn("__c", count(lit(1)).over(wTie))
    ranked.groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("__p"), lit(1L)).otherwise(lit(0L))).as("n_pos"),
        sum(when(!col("__p"), lit(1L)).otherwise(lit(0L))).as("n_neg"),
        // the doubled-rank sum is ~n² — exact decimal, one rounding to
        // double (2^63 at ~2e9 rows per group otherwise; DuckDB mirrors
        // via its HUGEINT sum), and the n_pos(n_pos+1) / 2·n_pos·n_neg
        // terms square in double for the same reason
        sum(when(col("__p"),
          (lit(2L) * col("__r") + col("__c") - lit(1L))
            .cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).cast("double")
          .as("__s2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(keys.map(col) ++ Seq(
        col("n_pos"), col("n_neg"),
        round(lit(1000000.0)
          * (col("__s2") - col("n_pos").cast("double")
            * (col("n_pos").cast("double") + lit(1.0)))
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double")))
          .cast("long").as("auc_ppm")): _*)
  }

  /** Precision and recall at k per group: rank by (score desc, tie asc)
    * — the tiebreak column makes the cut deterministic — and report the
    * positive fraction of the top k against the group's positive total.
    * Output (keys..., n_top, n_pos_top, n_pos_all, prec_ppm,
    * recall_ppm); groups with no positives are dropped. The row_number
    * filter is a Partial WindowGroupLimit — per-partition top-k
    * pre-pruning, no full per-group sort at scale.
    */
  def precisionAtK(
      df: DataFrame,
      keys: Seq[String],
      score: Column,
      positive: Column,
      k: Int,
      tie: Column): DataFrame = {
    require(k > 0, "k must be positive")
    val base = df
      .filter(score.isNotNull && positive.isNotNull)
      .select(keys.map(col) :+ score.as("__s") :+ tie.as("__t") :+
        positive.cast("boolean").as("__p"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s").desc, col("__t").asc)
    val top = base
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_top"),
        sum(when(col("__p"), lit(1L)).otherwise(lit(0L)))
          .as("n_pos_top"))
    val allPos = base.groupBy(keys.map(col): _*)
      .agg(sum(when(col("__p"), lit(1L)).otherwise(lit(0L)))
        .as("n_pos_all"))
      .filter(col("n_pos_all") > 0)
    top.join(allPos, keys)
      .select(keys.map(col) ++ Seq(
        col("n_top"), col("n_pos_top"), col("n_pos_all"),
        round(lit(1000000.0) * col("n_pos_top") / col("n_top"))
          .cast("long").as("prec_ppm"),
        round(lit(1000000.0) * col("n_pos_top") / col("n_pos_all"))
          .cast("long").as("recall_ppm")): _*)
  }

  /** One-way ANOVA of `value` across the categories of `cat`: a single
    * row (n, k, eta2, f_stat) where eta² = SS_between/SS_total is the
    * variance explained by the category and F its significance
    * statistic. All sums-of-squares derive from exact integer sums on
    * the `scale` grid; the one cross-group reduction of per-category
    * double terms (Σ s_g²/n_g) is folded in CATEGORY ORDER over a
    * sorted collected array — the order-pinned-fold discipline
    * (`bigramLogProb`) — so the doubles replay bit-identically. The
    * per-category table is category-cardinality-sized; its collect_list
    * is bounded by construction.
    *
    * The cat→numeric association lens completing chi2/MI (cat→cat) and
    * the correlation matrix (numeric→numeric).
    */
  def anovaEta(
      df: DataFrame,
      cat: Column,
      value: Column,
      scale: Int = 100): DataFrame = {
    val c = round(value * lit(scale)).cast("long")
    val base = df.filter(cat.isNotNull && value.isNotNull)
    // ssq: per-row c·c fits a long, but the SUM crosses 2^63 well before
    // cluster scale — sum exactly in decimal, round ONCE to double (DuckDB
    // mirrors via its exact HUGEINT sum cast to double). The squares of
    // the long sums likewise overflow at ~10^9.5 rows (found by the sf1
    // gate), so square in double: the sums are < 2^53, hence exact in
    // double, and fl(s)·fl(s) rounds identically in both engines.
    val tot = base.agg(
      count(lit(1)).as("n"),
      sum(c).as("__s"),
      sum((c * c).cast("decimal(20,0)")).cast("double").as("__ssq"))
    val groups = base
      .groupBy(cat.as("__g"))
      .agg(count(lit(1)).as("__ng"), sum(c).as("__sg"))
      .select(col("__g"),
        (col("__sg").cast("double") * col("__sg").cast("double")
          / col("__ng")).as("__t"))
    val folded = groups.agg(
      count(lit(1)).as("k"),
      aggregate(
        array_sort(collect_list(struct(col("__g").as("g"),
          col("__t").as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t")).as("__a"))
    val x = col("__s").cast("double") * col("__s").cast("double") / col("n")
    val ssb = col("__a") - x
    val sst = col("__ssq") - x
    folded.crossJoin(broadcast(tot))
      .filter(col("k") >= 2 && col("n") > col("k"))
      .select(col("n"), col("k"),
        (ssb / sst).as("eta2"),
        (ssb / (col("k") - lit(1L))
          / ((sst - ssb) / (col("n") - col("k")))).as("f_stat"))
  }

  /** Position-discount weight table for [[ndcgAtK]]: w(i) =
    * round(1e6 / log2(i+1)), computed ONCE on the JVM and embedded as
    * literals in both the Spark plan and (via the entry builder) the
    * oracle SQL — no runtime libm call can diverge. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.round(1000000.0 * math.log(2.0) / math.log(i + 1.0)))

  /** NDCG@k per group with binary relevance: rank by (score desc, tie
    * asc), DCG = Σ w(i) over the positive rows of the top k with the
    * [[ndcgWeights]] ppm table, IDCG = the weight prefix sum at
    * min(n_pos, k) (all positives ranked first), and
    * ndcg_ppm = round(1e6·DCG/IDCG). DCG and IDCG are exact integer
    * sums of shared literals, so the statistic replays bit-identically
    * with no guard bands. Groups without positives are dropped. Same
    * two-scan shape as [[precisionAtK]] (WindowGroupLimit top-k + one
    * combinable aggregate).
    */
  def ndcgAtK(
      df: DataFrame,
      keys: Seq[String],
      score: Column,
      positive: Column,
      k: Int,
      tie: Column): DataFrame = {
    require(k > 0, "k must be positive")
    val w = ndcgWeights(k)
    val cum = w.scanLeft(0L)(_ + _).tail // cum(j) = w(1)+..+w(j)
    val base = df
      .filter(score.isNotNull && positive.isNotNull)
      .select(keys.map(col) :+ score.as("__s") :+ tie.as("__t") :+
        positive.cast("boolean").as("__p"): _*)
    val win = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s").desc, col("__t").asc)
    val dcg = base
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(sum(when(col("__p"),
        element_at(array(w.map(lit): _*), col("__rn").cast("int")))
        .otherwise(lit(0L))).as("dcg_ppm"))
    val allPos = base.groupBy(keys.map(col): _*)
      .agg(sum(when(col("__p"), lit(1L)).otherwise(lit(0L)))
        .as("n_pos_all"))
      .filter(col("n_pos_all") > 0)
    allPos.join(dcg, keys, "left")
      .withColumn("dcg_ppm", coalesce(col("dcg_ppm"), lit(0L)))
      .withColumn("idcg_ppm",
        element_at(array(cum.map(lit): _*),
          least(col("n_pos_all"), lit(k.toLong)).cast("int")))
      .select(keys.map(col) ++ Seq(
        col("n_pos_all"), col("dcg_ppm"), col("idcg_ppm"),
        round(lit(1000000.0) * col("dcg_ppm") / col("idcg_ppm"))
          .cast("long").as("ndcg_ppm")): _*)
  }

  /** Per-group distribution moments — mean, population variance,
    * skewness, excess kurtosis — from four exact integer power sums in
    * ONE hash aggregate. The shape detector behind drift triage (a
    * mean-stable feature whose skew flips is still drifting).
    *
    * Σc³/Σc⁴ are summed in exact decimal(38,0) and rounded once to
    * double (DuckDB replays via its HUGEINT sums), so the contract is
    * |c| ≲ 3·10⁹ (the long c² per-row product) and Σc⁴ < 10³⁸ — far
    * beyond any realistic grid, where the old all-long sums crossed
    * 2^63 at |c| ≈ 310 for 10⁹-row groups. Skewness uses m₃/(m₂·√m₂) — sqrt,
    * not pow(·, 1.5), because IEEE sqrt is exactly rounded on every
    * engine while pow is not. Degenerate groups (n < 2 or zero
    * variance) are dropped.
    */
  def momentsByGroup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      scale: Int = 1): DataFrame = {
    val c = round(value * lit(scale)).cast("long")
    // power sums in exact decimal — Σc⁴ crosses 2^63 at |c| ≈ 310,
    // n = 10⁹ (and the per-row long product at |c| > 55108), far inside
    // realistic grids. c² stays a long (safe to |c| ≈ 3·10⁹); the cubes
    // and quartics widen to decimal(38,0), summed exactly and rounded
    // ONCE to double — DuckDB mirrors with HUGEINT sums cast to double.
    val c2 = c * c
    val c2d = c2.cast("decimal(38,0)")
    val sums = df.filter(value.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(c).as("__s1"),
        sum(c2d).cast("double").as("__s2"),
        sum(c2d * c).cast("double").as("__s3"),
        sum(c2d * c2).cast("double").as("__s4"))
      .filter(col("n") >= 2)
    val sc = lit(scale.toDouble)
    val withMu = sums.withColumn("__mu",
      col("__s1").cast("double") / col("n"))
    def p(s: String) = col(s).cast("double") / col("n")
    val mu = col("__mu")
    val withM = withMu
      .withColumn("__m2", p("__s2") - mu * mu)
      .withColumn("__m3",
        p("__s3") - lit(3.0) * mu * p("__s2") + lit(2.0) * mu * mu * mu)
      .withColumn("__m4",
        p("__s4") - lit(4.0) * mu * p("__s3")
          + lit(6.0) * mu * mu * p("__s2")
          - lit(3.0) * mu * mu * mu * mu)
      .filter(col("__m2") > 0)
    withM.select(
      keys.map(col) ++ Seq(
        col("n"),
        (mu / sc).as("mean"),
        (col("__m2") / sc / sc).as("variance"),
        (col("__m3") / (col("__m2") * sqrt(col("__m2"))))
          .as("skewness"),
        (col("__m4") / (col("__m2") * col("__m2")) - lit(3.0))
          .as("kurtosis")): _*)
  }

  /** Exact Gini coefficient per group over an integer-quantized value:
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with x ascending and i the
    * 1-based rank. Within a tie block every permutation yields the same
    * Σ i·xᵢ (equal x), so the statistic is deterministic without a
    * tiebreak; all terms are exact integers and gini_ppm replays
    * bit-identically. Rows with null or negative values are excluded
    * (Gini is defined on non-negative quantities); groups with zero
    * total are dropped. One window + one combinable aggregate.
    *
    * The inequality lens on corpus/source concentration: revenue
    * concentration per market, token-mass concentration per source.
    */
  def giniByGroup(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      scale: Int = 100): DataFrame = {
    val c = round(value * lit(scale)).cast("long")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__c"))
    df.filter(value.isNotNull)
      .select(keys.map(col) :+ c.as("__c"): _*)
      .filter(col("__c") >= 0)
      .withColumn("__i", row_number().over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__c")).as("__sx"),
        // Σ i·c crosses 2^63 near 10^6.5 rows·10^6-grid values (found by
        // the sf1 gate): sum exactly in decimal — DuckDB mirrors with its
        // HUGEINT sum — and round the exact numerator ONCE to double
        sum((col("__i") * col("__c")).cast("decimal(20,0)")).as("__six"))
      .filter(col("__sx") > 0)
      .select(keys.map(col) ++ Seq(
        col("n"),
        col("__sx").as("sum_c"),
        round(lit(1000000.0)
          * (lit(2L).cast("decimal(38,0)") * col("__six")
            - (col("n") + lit(1L)).cast("decimal(38,0)") * col("__sx"))
            .cast("double")
          / (col("n").cast("double") * col("__sx").cast("double")))
          .cast("long").as("gini_ppm")): _*)
  }

  /** Exact Herfindahl-Hirschman concentration index per group:
    * HHI = Σ sᵢ² over entity shares sᵢ = cᵢ/Σc, reported as
    * round(1e6·Σcᵢ²/(Σc)²) from exact integer counts — 1e6/k for k
    * equal entities, 1e6 for a monopoly. Two combinable aggregates
    * (entity counts, then share squares); nothing scans the data twice.
    */
  def herfindahlByGroup(
      df: DataFrame,
      keys: Seq[String],
      entity: Column): DataFrame =
    df.filter(entity.isNotNull)
      .groupBy(keys.map(col) :+ entity.as("__e"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("__c")).as("n_rows"),
        // Σc² exact in decimal, rounded once to double; the n_rows²
        // denominator squares in double too — both cross 2^63 near
        // 3e9 rows/group otherwise (DuckDB replays via HUGEINT)
        sum((col("__c") * col("__c")).cast("decimal(38,0)"))
          .cast("double").as("__c2"))
      .select(keys.map(col) ++ Seq(
        col("n_entities"), col("n_rows"),
        round(lit(1000000.0) * col("__c2")
          / (col("n_rows").cast("double") * col("n_rows").cast("double")))
          .cast("long").as("hhi_ppm")): _*)

  /** Per-group ordinary-least-squares trend of `value` against an
    * integer regressor `x` (e.g. seconds since a fixed origin): output
    * (keys..., n, slope, intercept, r2) with slope in metric units per
    * x-unit. The drift detector for metrics-over-time — one conditional
    * hash aggregate computing six exact integer sums, no window, no
    * second pass.
    *
    * Exactness: `x` must already be integral; `value` is quantized to
    * the `scale` grid. Keep |x| ≤ ~2.6e6 and |value·scale| ≤ ~5e4 at
    * ~1e4 rows per group so x², x·y and y² sums stay inside Long (the
    * caller picks the x origin to make that true — the point of the
    * `x` contract). The double-typed outputs are then derived from
    * those exact sums by fixed expression trees, so results replay
    * bit-identically across engines and partitionings.
    *
    * Groups with n < 2 or zero x-variance are dropped (undefined
    * slope).
    */
  def linearTrendByGroup(
      df: DataFrame,
      keys: Seq[String],
      x: Column,
      value: Column,
      scale: Int = 100): DataFrame = {
    val xi = x.cast("long")
    val c = round(value * lit(scale)).cast("long")
    val sums = df.filter(value.isNotNull && x.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xi).as("sx"), sum(c).as("sy"),
        // second-order sums in exact decimal, one rounding to double —
        // relaxes the old all-long |x| contract by ~2^63/2 of headroom
        // (DuckDB replays via HUGEINT sums cast to double)
        sum((xi * xi).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((xi * c).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((c * c).cast("decimal(38,0)")).cast("double").as("syy"))
    // NB: each expression stays inside one set of parentheses — a bare
    // leading `-` on a continuation line is a separate statement to the
    // Scala parser and silently drops the subtrahend
    val cov = (col("n") * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy"))
    val varx = (col("n") * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx"))
    val vary = (col("n") * col("syy").cast("double")
      - col("sy").cast("double") * col("sy"))
    val withSlope = sums
      .filter(col("n") >= 2)
      .filter(varx > lit(0.0) && vary > lit(0.0))
      .withColumn("slope", cov / varx / lit(scale.toDouble))
      .withColumn("r2", cov * cov / (varx * vary))
    withSlope.select(
      keys.map(col) ++ Seq(
        col("n"), col("slope"),
        (col("sy").cast("double") / lit(scale.toDouble) / col("n")
          - col("slope") * (col("sx").cast("double") / col("n")))
          .as("intercept"),
        col("r2")): _*)
  }
}
