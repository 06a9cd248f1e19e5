package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the schema-quality rollup a curation run
  * records next to its corpus stats (reference analog: none; the shape
  * follows the classic `DESCRIBE`-plus-null/distinct profile).
  */
object Profile {

  /** One output row per profiled column: `column, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str`. Numeric columns
    * report min/max cast to double, string columns report them verbatim
    * (binary ordering in both Spark and DuckDB); other types profile
    * counts only, and unorderable types (maps, or structs/arrays holding
    * them) also skip `n_distinct` (null) since distinct-counting needs an
    * ordering. Null-handling follows SQL: `n_distinct` excludes nulls.
    *
    * Scale shape: ONE aggregation pass emitting every measure, then a
    * narrow unpivot of the single result row. `exactDistinct = true`
    * (the oracle path) plans n distinct aggregates via Expand — the input
    * is replicated once per profiled column, the exact-count price; at
    * 100 TB pass `exactDistinct = false` for one-pass mergeable HLL
    * sketches (rsd 0.02, ±2%) with no Expand.
    */
  def describe(
      df: DataFrame,
      cols: Seq[String] = Nil,
      exactDistinct: Boolean = true
  ): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    def numeric(c: String) = types(c).isInstanceOf[NumericType]
    def stringy(c: String) = types(c) == StringType
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType      => false
      case s: StructType   => s.fields.forall(f => orderable(f.dataType))
      case a: ArrayType    => orderable(a.elementType)
      case _               => true
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: targets.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (!orderable(types(c))) lit(null).cast("long")
         else if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        (if (numeric(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (stringy(c)) min(col(c))
         else lit(null).cast("string")).as(s"__mins_$c"),
        (if (stringy(c)) max(col(c))
         else lit(null).cast("string")).as(s"__maxs_$c")
      )
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(targets.map(c =>
        struct(
          lit(c).as("column"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__minn_$c").as("min_num"),
          col(s"__maxn_$c").as("max_num"),
          col(s"__mins_$c").as("min_str"),
          col(s"__maxs_$c").as("max_str"))): _*)).as("__p"))
      .select("__p.*")
  }

  /** Pairwise Pearson correlation matrix in ONE aggregation pass:
    * `(col_x, col_y, n, corr)` for every unordered column pair, computed
    * from exact fixed-point moment sums. Each input column is scaled to an
    * integer (`decimals(c)` decimal digits, default 0 — pass 2 for a cents
    * column) and summed as `DECIMAL(38,0)`, so the k(k+1)/2 moment sums
    * are EXACT integers independent of partitioning and merge order; the
    * final correlation is one fixed double-expression over those sums —
    * fully deterministic and replayable in any engine with 128-bit sums
    * (DuckDB: `sum(BIGINT) → HUGEINT`). A zero-variance column yields NULL
    * against every partner (0/0 guarded), and rows with a NULL in any
    * profiled column are excluded up front (complete-case, the classical
    * contract).
    *
    * Scale shape: one partial-aggregated pass — k + k(k+1)/2 + 1 combinable
    * sums, one exchange of a single summary row, then a narrow unpivot.
    * Compare Spark's own `corr`, which is per-pair (k² passes or a
    * k²-column agg of NON-replayable float moments). The decimal sums cost
    * ~2× a double sum in the hot loop; that is the price of a
    * partition-count-independent answer.
    *
    * Numerics: the textbook `n·Σxy − Σx·Σy` form cancels catastrophically
    * only when |corr| ≫ data spread / mean (constant-ish columns); with
    * exact integer sums the subtraction itself is exact until the double
    * cast, so the usual one-pass instability does not apply — only the
    * final 53-bit rounding does.
    *
    * Reference counterpart: none (the reference profiles single columns);
    * the measurement shape matches any standard covariance rollup.
    */
  def corrMatrix(
      df: DataFrame,
      cols: Seq[String],
      decimals: Map[String, Int] = Map.empty
  ): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, "corrMatrix columns must be distinct")
    decimals.foreach { case (c, d) =>
      require(d >= 0 && d <= 9, s"decimals($c) must be in [0, 9], got $d")
    }
    val dec = DecimalType(38, 0)
    val fixed: Seq[(String, Column)] = cols.map { c =>
      val d = decimals.getOrElse(c, 0)
      val scaled = if (d == 0) col(c) else col(c) * lit(math.pow(10, d))
      c -> round(scaled, 0).cast(dec)
    }
    val complete = cols.map(col(_).isNotNull).reduce(_ && _)
    val sums = fixed.map { case (c, e) => sum(e).as(s"__s_$c") }
    val prodPairs = for {
      i <- fixed.indices
      j <- i until fixed.size
    } yield (i, j)
    val prods = prodPairs.map { case (i, j) =>
      sum((fixed(i)._2 * fixed(j)._2).cast(dec)).as(s"__p_${i}_$j")
    }
    val aggs = count(lit(1)).as("__n") +: (sums ++ prods)
    val nD = col("__n").cast("double")
    def sD(i: Int) = col(s"__s_${cols(i)}").cast("double")
    def pD(i: Int, j: Int) = col(s"__p_${i}_$j").cast("double")
    val outPairs = for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield {
      val num = nD * pD(i, j) - sD(i) * sD(j)
      val varX = nD * pD(i, i) - sD(i) * sD(i)
      val varY = nD * pD(j, j) - sD(j) * sD(j)
      val den = sqrt(varX) * sqrt(varY)
      struct(
        lit(cols(i)).as("col_x"),
        lit(cols(j)).as("col_y"),
        col("__n").as("n"),
        when(den === 0d, lit(null).cast("double"))
          .otherwise(num / den).as("corr"))
    }
    df.filter(complete)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(outPairs: _*)).as("__c"))
      .select("__c.*")
  }

  /** Percent-rank of `valueCol` within each group — SQL
    * `percent_rank()` semantics ((rows strictly smaller) / (n − 1), ties
    * share the rank of their first row, 0 for singleton groups) — WITHOUT
    * a per-row window sort: the rank comes from the per-group value
    * histogram, so the window walks DISTINCT values only and the full
    * input is never sorted. The standard rank-gaussianization front half
    * for feature columns. Null values get a null rank.
    */
  def rankNormalize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String = "pct"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val hist = df
      .filter(v.isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(v)
    val ranked = hist
      .withColumn("__cb", sum(col("__c")).over(w) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(v)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pct = round(
      col("__cb").cast(DoubleType) /
        greatest(col("__n") - 1L, lit(1L)).cast(DoubleType), 6)
    val keyed = ranked.select(
      (groupCols :+ valueCol).map(k => col(k).as(s"__rk_$k")) :+
        pct.as(outCol): _*)
    val keyEq = (groupCols :+ valueCol)
      .map(k => df(k) <=> keyed(s"__rk_$k"))
      .reduce(_ && _)
    df.join(keyed, keyEq, "left")
      .select(df.columns.map(df(_)) :+ col(outCol): _*)
  }

  /** Population-stability drift report between two snapshots of a numeric
    * column — the standard monitor for "did my corpus mix shift": fixed
    * equi-width bins on [lo, hi) plus under/overflow bins, Laplace-
    * smoothed shares p, q = (n + 1)/(N + B), and the per-bin PSI term
    * (p − q)·ln(p/q) in ppm (sum the column for the total PSI·1e6;
    * < 0.1 stable, > 0.25 shifted by the usual rule of thumb).
    *
    * Every number replays across engines: bin ids are floor() of
    * deterministic IEEE arithmetic, shares are divisions of exact
    * integers, and the single `ln` per bin is ppm-rounded with bins few
    * enough that rounding boundaries stay far away (the BM25 discipline).
    * Shape: one narrow bin map + count aggregate per side, a union, and a
    * 1-row broadcast of the totals — the snapshots are scanned once each.
    */
  def psiDrift(
      base: DataFrame,
      current: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(lo < hi, "need lo < hi")
    val width = (hi - lo) / bins
    // bin −1 = underflow, `bins` = overflow; nulls are excluded
    def binOf(c: Column): Column =
      least(greatest(floor((c.cast("double") - lit(lo)) / lit(width))
        .cast("long"), lit(-1L)), lit(bins.toLong))
    def sideCounts(df: DataFrame, out: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .groupBy(binOf(col(valueCol)).as("bin"))
      .agg(count(lit(1)).as(out))
    val joined = sideCounts(base, "n_base")
      .join(sideCounts(current, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = joined.agg(sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val b = lit((bins + 2).toDouble) // smoothing denominator: all bins
    val p = (col("n_base").cast("double") + lit(1.0)) /
      (col("__tb").cast("double") + b)
    val q = (col("n_cur").cast("double") + lit(1.0)) /
      (col("__tc").cast("double") + b)
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(lit(1000000.0) * p, 0).cast("long").as("p_ppm"),
        round(lit(1000000.0) * q, 0).cast("long").as("q_ppm"),
        round(lit(1000000.0) * (p - q) * log(p / q), 0).cast("long")
          .as("psi_term_ppm"))
  }

  /** Categorical counterpart of [[psiDrift]]: one row per observed
    * category of `valueCol` (a null category is matched null-safely, not
    * split) with the same Laplace smoothing over B = observed categories
    * + 1 — the +1 plays the role of the numeric version's overflow bins,
    * keeping an unseen category's share well-defined. Same determinism
    * discipline: integer counts, exact-int divisions, one ppm-rounded
    * `ln` per category.
    */
  def psiDriftCategorical(
      base: DataFrame,
      current: DataFrame,
      valueCol: String): DataFrame = {
    val b = base.groupBy(col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n_base"))
    val c = current.groupBy(col(valueCol).cast("string").as("__cv"))
      .agg(count(lit(1)).as("n_cur"))
    val joined = b.join(c, b("value") <=> c("__cv"), "full_outer")
      .select(coalesce(b("value"), c("__cv")).as("value"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_base")).as("__tb"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__ncat"))
    val bs = col("__ncat").cast("double") + lit(1.0)
    val p = (col("n_base").cast("double") + lit(1.0)) /
      (col("__tb").cast("double") + bs)
    val q = (col("n_cur").cast("double") + lit(1.0)) /
      (col("__tc").cast("double") + bs)
    joined.crossJoin(broadcast(tot))
      .select(col("value"), col("n_base"), col("n_cur"),
        round(lit(1000000.0) * p, 0).cast("long").as("p_ppm"),
        round(lit(1000000.0) * q, 0).cast("long").as("q_ppm"),
        round(lit(1000000.0) * (p - q) * log(p / q), 0).cast("long")
          .as("psi_term_ppm"))
  }

  /** Exact two-sample Kolmogorov-Smirnov drift statistic between two
    * snapshots of `valueCol`: D = max over values of |F_base − F_cur|,
    * emitted as a single row (n_base, n_cur, ks_num, ks_ppm) where
    * ks_num = max |cumBase·n_cur − cumCur·n_base| is the EXACT integer
    * numerator (D = ks_num / (n_base·n_cur)) and ks_ppm its ppm
    * rounding. Unlike the binned [[psiDrift]], KS is binning-free and
    * integer-exact end to end — no ln, no guard bands.
    *
    * Shape: per-side value-count aggregates collapse the data to its
    * distinct-value histograms; the merged histogram takes ONE
    * single-partition window for the cumulative sums — the same
    * distinct-bounded caller contract as `Layout.equiDepthBins`
    * (pre-round raw ids to a grid first). Both snapshots are scanned
    * once.
    */
  def ksDrift(
      base: DataFrame,
      current: DataFrame,
      valueCol: String): DataFrame = {
    def sideCounts(df: DataFrame, out: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as(out))
    val joined = sideCounts(base, "__a")
      .join(sideCounts(current, "__b"), Seq("__v"), "full_outer")
      .na.fill(0L, Seq("__a", "__b"))
    val wRun = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__ca", sum(col("__a")).over(wRun))
      .withColumn("__cb", sum(col("__b")).over(wRun))
      .withColumn("__na", sum(col("__a")).over(wAll))
      .withColumn("__nb", sum(col("__b")).over(wAll))
      .agg(
        max(col("__na")).as("n_base"),
        max(col("__nb")).as("n_cur"),
        // the cross products are ~n² — exact in decimal (2^63 at ~3e9
        // rows otherwise), max'd exactly, output cast once to double
        // (oracle mirrors via HUGEINT)
        max(abs(col("__ca").cast("decimal(38,0)") * col("__nb")
          - col("__cb").cast("decimal(38,0)") * col("__na")))
          .cast("double").as("ks_num"))
      .filter(col("n_base") > 0 && col("n_cur") > 0)
      .select(col("n_base"), col("n_cur"), col("ks_num"),
        round(lit(1000000.0) * col("ks_num")
          / (col("n_base").cast("double") * col("n_cur").cast("double")))
          .cast("long").as("ks_ppm"))
  }

  /** Per-group [[ksDrift]]: one row (keys..., n_base, n_cur, ks_num,
    * ks_ppm) per key — the per-feature / per-segment drift monitor.
    * Unlike the global variant there is no single-partition window at
    * all: the cumulative sums partition by the keys, so the op scales
    * with the keyed distinct-value histograms. Keys present in only one
    * snapshot are dropped (KS undefined).
    */
  def ksDriftByGroup(
      base: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    def sideCounts(df: DataFrame, out: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(out))
    val joined = sideCounts(base, "__a")
      .join(sideCounts(current, "__b"), keys :+ valueCol, "full_outer")
      .na.fill(0L, Seq("__a", "__b"))
    val kcols = keys.map(col)
    val wRun = Window.partitionBy(kcols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kcols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__ca", sum(col("__a")).over(wRun))
      .withColumn("__cb", sum(col("__b")).over(wRun))
      .withColumn("__na", sum(col("__a")).over(wAll))
      .withColumn("__nb", sum(col("__b")).over(wAll))
      .groupBy(kcols: _*)
      .agg(
        max(col("__na")).as("n_base"),
        max(col("__nb")).as("n_cur"),
        // the cross products are ~n² — exact in decimal (2^63 at ~3e9
        // rows otherwise), max'd exactly, output cast once to double
        // (oracle mirrors via HUGEINT)
        max(abs(col("__ca").cast("decimal(38,0)") * col("__nb")
          - col("__cb").cast("decimal(38,0)") * col("__na")))
          .cast("double").as("ks_num"))
      .filter(col("n_base") > 0 && col("n_cur") > 0)
      .select(kcols ++ Seq(col("n_base"), col("n_cur"), col("ks_num"),
        round(lit(1000000.0) * col("ks_num")
          / (col("n_base").cast("double") * col("n_cur").cast("double")))
          .cast("long").as("ks_ppm")): _*)
  }

  /** Per-group robust outlier flagging by median absolute deviation: a row
    * is an outlier when |x − median| > k · MAD, with both the median and
    * the MAD taken as exact DISCRETE medians (the smallest value whose
    * cumulative count reaches ⌈n/2⌉ — for p = 0.5 this is exactly the
    * element at 0-based index ⌊(n−1)/2⌋, i.e. `quantile_disc(0.5)`).
    * Discrete medians are actual data values and |x − m| is a single IEEE
    * subtraction, so every emitted number replays bit-for-bit on any
    * engine — no interpolation and no mean/stddev accumulation order to
    * disagree about, and unlike z-scores the flag is immune to the
    * outliers' own magnitude. Null values keep null med/mad/flag.
    *
    * Shape: two histogram collapses (values, then deviations — state per
    * group bounded by DISTINCT values, never rows), each followed by a
    * group-partitioned window walk and a join back that AQE broadcasts.
    * The input is touched three times, all embarrassingly parallel.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0,
      medOut: String = "med",
      madOut: String = "mad",
      flagOut: String = "is_outlier"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k >= 0, "k must be >= 0")
    val med = discreteMedian(df, groupCols, col(valueCol))
    val medEq = groupCols.map(c => df(c) <=> med(s"__mk_$c")).reduce(_ && _)
    val withMed = df.join(med, medEq, "left")
      .select(df.columns.map(df(_)) :+ col("__m").as(medOut): _*)
    val dev = abs(col(valueCol) - col(medOut))
    val mad = discreteMedian(withMed.withColumn("__dev", dev),
      groupCols, col("__dev"))
    val madEq = groupCols.map(c => withMed(c) <=> mad(s"__mk_$c")).reduce(_ && _)
    withMed.join(mad, madEq, "left")
      .select(withMed.columns.map(withMed(_)) :+ col("__m").as(madOut): _*)
      .withColumn(flagOut,
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .otherwise(abs(col(valueCol) - col(medOut)) > lit(k) * col(madOut)))
  }

  /** One row per group: renamed keys `__mk_<k>` plus `__m`, the exact
    * discrete median of `value` (nulls excluded) — the histogram/window
    * shape of [[clipToQuantiles]] at p = 0.5.
    */
  private def discreteMedian(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .filter(value.isNotNull)
      .groupBy(groupCols.map(col) :+ value.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
    val cw = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cw.groupBy(groupCols.map(col): _*)
      .agg(min(when(col("__cum") >= ceil(lit(0.5) * col("__n")), col("__v")))
        .as("__m"))
      .select(groupCols.map(c => col(c).as(s"__mk_$c")) :+ col("__m"): _*)
  }

  /** Winsorize `valueCol` per group at the exact discrete
    * `[pLo, pHi]` quantiles: the boundary for p is the smallest value
    * whose cumulative count reaches `ceil(p·n)` — always an actual data
    * value, so the clip replays exactly on any engine (no interpolation
    * arithmetic to disagree about). Null values pass through unclipped.
    *
    * Shape: one hash aggregate collapses the input to its per-group value
    * histogram, a group-partitioned window walks each group's DISTINCT
    * values (state bounded by distinct values per group, never rows), and
    * the two boundaries join back onto the input — AQE broadcasts the
    * per-group bounds. The full input is touched twice (histogram +
    * clip), both times embarrassingly parallel.
    */
  def clipToQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
    require(0 <= pLo && pLo <= pHi && pHi <= 1, "need 0 <= pLo <= pHi <= 1")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val hist = df
      .filter(v.isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(v)
    val cw = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(v)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val bounds = cw
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("__cum") >= ceil(lit(pLo) * col("__n")), v)).as("__lo"),
        min(when(col("__cum") >= ceil(lit(pHi) * col("__n")), v)).as("__hi"))
    // null-safe key match so a null group still meets its own bounds row
    // (a plain equi-join would leave the whole null group unclipped);
    // bounds keys are renamed first — groupBy preserves grouping exprIds,
    // so joining back on the original names would be an ambiguous self-join
    val boundsR = bounds.select(
      groupCols.map(k => col(k).as(s"__bk_$k")) ++
        Seq(col("__lo"), col("__hi")): _*)
    val keyEq = groupCols.map(k => df(k) <=> boundsR(s"__bk_$k")).reduce(_ && _)
    val clipped = when(df(valueCol).isNull, df(valueCol))
      .otherwise(least(greatest(df(valueCol), col("__lo")), col("__hi")))
    df.join(boundsR, keyEq, "left")
      .select(df.columns.map(c =>
        if (c == valueCol) clipped.as(valueCol) else df(c)): _*)
  }
}
