package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpora.
  *
  * Scale design: every pipeline is expressed as joins/aggregations on
  * pre-bucketed keys so Catalyst can choose shuffle strategies, and every
  * candidate-generation step bounds bucket sizes (frequent-shingle and
  * bucket-size caps) so no reducer sees an unbounded group at 100 TB.
  */
object Dedup {

  /** Shared compiled whitespace pattern: `String.split(regex)` recompiles
    * the pattern on EVERY call, which at corpus scale is a per-row
    * allocation+compile in the hottest loop.
    */
  private[ops] val Whitespace: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Exact dedup: one representative row (min id) per distinct value of
    * `cols`. Hash-based aggregate — single shuffle on the dedup key.
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(idCol, cols: _*)

  /** The engine-portable hash every deterministic sampler shares: the
    * first 15 hex chars of sha256("<salt>|<key>") read as a base-16 long.
    * This exact recipe is a cross-engine replay contract (the DuckDB
    * oracles and any external consumer reconstruct it in SQL) — change it
    * here and NOWHERE else.
    */
  private[ops] def portableHash(key: Column, salt: Long): Column =
    conv(
      substring(
        sha2(concat_ws("|", lit(salt.toString), key.cast("string")), 256),
        1, 15),
      16, 10).cast("long")

  /** Deterministic hash-based sampling: keep a row iff
    * pmod(xxhash64(salt, key), den) < num. Unlike `df.sample`, the decision
    * is a pure function of the key, so (a) re-runs and retries select the
    * SAME rows, (b) sampling by a document/user id keeps or drops all of an
    * entity's rows together (no partial entities in the corpus), and (c)
    * train/holdout splits from disjoint (num, den) ranges never overlap.
    * Narrow (no shuffle), codegen'd.
    */
  def sampleByHash(
      df: DataFrame,
      keyCol: String,
      num: Int,
      den: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(den > 0 && num >= 0 && num <= den, "need 0 <= num <= den, den > 0")
    df.filter(pmod(xxhash64(lit(salt), col(keyCol)), lit(den)) < num)
  }

  /** Engine-portable variant of [[sampleByHash]]: the keep decision is
    * `int(first 15 hex chars of sha256("salt|key")) % den < num` — 60 bits
    * of SHA-256, computable bit-for-bit in any engine that has SHA-256
    * (DuckDB: `('0x' || substr(sha256('salt|' || key), 1, 15))::BIGINT`).
    * Use when a sample must be reproduced OUTSIDE Spark — handing a
    * train/holdout split to a different engine, or auditing membership of
    * a row without rerunning the pipeline. xxhash64 [[sampleByHash]] is
    * the fast default when the sample never leaves Spark.
    */
  def sampleByHashPortable(
      df: DataFrame,
      keyCol: String,
      num: Int,
      den: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(den > 0 && num >= 0 && num <= den, "need 0 <= num <= den, den > 0")
    val h = portableHash(col(keyCol), salt)
    df.filter(pmod(h, lit(den.toLong)) < num)
  }

  /** Deterministic disjoint train/val/test split: bucket i gets the rows
    * whose portable hash lands in its basis-point range —
    * `bps = Seq(8000, 1000, 1000)` is the usual 80/10/10. Adds an integer
    * `split` column (0-based bucket index). Splitting by a document/user
    * id keeps all of an entity's rows in ONE bucket, buckets never
    * overlap by construction, and membership replays in any engine from
    * `(salt, key)` alone (same SHA-256 recipe as [[sampleByHashPortable]]).
    * Narrow, codegen'd, no shuffle. */
  def splitByHash(
      df: DataFrame,
      keyCol: String,
      bps: Seq[Int],
      salt: Long = 0L,
      splitCol: String = "split"
  ): DataFrame = {
    require(bps.nonEmpty && bps.forall(_ > 0) && bps.sum == 10000,
      s"bps must be positive and sum to 10000, got $bps")
    val h = pmod(portableHash(col(keyCol), salt), lit(10000L))
    val cums = bps.scanLeft(0)(_ + _).tail
    val expr0: Column = cums.init.zipWithIndex.reverse.foldLeft(
      lit(bps.size - 1)) { case (acc, (cum, i)) =>
      when(h < cum, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, expr0)
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws the exponential key
    * `-ln(u) / w` from the portable hash of its id
    * (`u = (sha60(id) + 0.5) / 2^60`) and the `k` smallest keys win —
    * inclusion probability proportional to `weightCol` at every prefix,
    * and the whole sample replays from `(salt, id, weight)` alone, in any
    * engine. Weights must be strictly positive.
    *
    * Scale shape: the key is a narrow codegen'd expression and the
    * `orderBy(key).limit(k)` plans as TakeOrderedAndProject — per-task
    * top-k heaps, one k-row merge at the driver, no global sort. Ties
    * cannot occur (distinct hashes give distinct keys), so the result is
    * a deterministic set.
    */
  def sampleByWeightPortable(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (portableHash(col(keyCol), salt).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val key = -log(u) / col(weightCol).cast("double")
    // non-positive/null weights would sort FIRST (null/negative keys) and
    // silently fill the sample — exclude them so the positive-weight
    // contract fails soft (row simply not sampled), never corrupts
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey"), col(keyCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Per-group [[sampleByWeightPortable]]: k weighted winners per group —
    * the fixed-budget quota whose inclusion odds follow `weightCol`
    * inside each group (per-language corpora weighted by length or
    * quality). Same A-ES keys, same engine-replayable contract; the
    * rank-≤-k filter plans as a Partial WindowGroupLimit, so each task
    * forwards at most k rows per group into the single exchange. */
  def sampleByWeightPerGroup(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      groupCols: Seq[String],
      k: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val u = (portableHash(col(keyCol), salt).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val key = -log(u) / col(weightCol).cast("double")
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__wkey"), col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__wkey", "__rn")
  }

  /** Exact-size deterministic sample per group: ranks each group's rows by
    * the portable SHA-256-prefix hash of `keyCol` (hash ties broken by the
    * key itself) and keeps the first `k` — the fixed-budget counterpart of
    * rate-based [[sampleByHashStratifiedPortable]] (carving a 1000-doc
    * eval set per language, capping a scraped source at N documents). The
    * keep-set is reproducible in any engine from (salt, key, group) alone
    * and is nested across k: raising a group's budget only ADDS rows.
    *
    * Scale shape: the rank-≤-k filter plans as a Partial WindowGroupLimit,
    * so each task forwards at most k rows per group into the single
    * exchange — a group's full membership is never sorted in one task.
    */
  def sampleKPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      k: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val h = portableHash(col(keyCol), salt)
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Max-volume proportional downsampling — the corpus-mixing quota
    * solver: given integer target weights w_s per source (proportions
    * w_s/ΣW), keep the LARGEST total T the corpus can supply at those
    * proportions and exactly k_s = ⌊w_s·T/W⌋ rows per source, chosen by
    * portable hash rank (engine-replayable, entity-stable).
    *
    * T = min_s ⌊n_s·W/w_s⌋ — the binding source is the one that runs
    * out first — and every quota is integer division of exact counts,
    * so the sample replays bit-identically on any engine. Sources
    * absent from `weights` are dropped; a weighted source absent from
    * the DATA binds the min at n_s = 0, so T = 0 and the output is
    * empty — the corpus genuinely cannot supply those proportions (the
    * weight map is left-joined against the per-source counts, never
    * silently dropped from the constraint). The feasibility computation
    * is one |sources|-sized aggregate cross-joined back (broadcast);
    * the selection is the [[sampleKPerGroup]] rank window.
    *
    * Unlike [[repeatByWeightPortable]] (epoch UPsampling by repeats)
    * this is the downsampling face of mixing: no duplication, exact
    * proportions, maximal volume.
    */
  def sampleToProportions(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Map[String, Long],
      salt: Long = 0L
  ): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val bigW = weights.values.sum
    val wExpr = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val in = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .withColumn("__w", wExpr)
      .persist() // read twice: quota aggregate + ranked selection
    // the weight map is the left side of the quota constraint: a weighted
    // source with zero data rows must still bind the min (n = 0 -> T = 0)
    val wdf = df.sparkSession
      .createDataFrame(weights.toSeq)
      .toDF("__src", "__w")
    val counts = in.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
    val quotas = wdf
      .join(counts, Seq("__src"), "left")
      .na.fill(0L, Seq("__n"))
    val t = quotas
      .select(expr(s"min(__n * $bigW div __w)").as("__t"))
    val ks = quotas.crossJoin(broadcast(t))
      .select(col("__src"),
        expr(s"__w * __t div $bigW").as("__k"))
    val h = portableHash(col(keyCol), salt)
    val win = Window.partitionBy(col(sourceCol))
      .orderBy(h.asc, col(keyCol).asc)
    in.withColumn("__rk", row_number().over(win))
      .join(broadcast(ks), col(sourceCol) === col("__src"))
      .filter(col("__rk") <= col("__k"))
      .drop("__rk", "__src", "__k", "__w")
  }

  /** Corpus version diff — the dataset-versioning primitive: classify
    * every id across two corpus snapshots as `added` (only in `next`),
    * `removed` (only in `prev`), `changed` (both, different normalized
    * fingerprint), or `unchanged`. Emits (idCol, status) — join back on
    * the id for payloads. Comparison uses the whitespace/case-insensitive
    * [[graft.ops.TextAnalysis.fingerprint]] so formatting churn doesn't
    * read as a content change.
    *
    * Scale shape: two narrow fingerprint maps and ONE full-outer
    * sort-merge join on the id (near-unique key, no skew); no windows, no
    * collects.
    */
  def corpusDiff(
      prev: DataFrame,
      next: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // presence travels as an explicit marker: a null text has a null
    // fingerprint, which must read as "present with empty content", not
    // "row absent"
    val p = graft.ops.TextAnalysis.fingerprint(prev, textCol, "__fp_prev")
      .select(col(idCol), col("__fp_prev"), lit(true).as("__in_prev"))
    val n = graft.ops.TextAnalysis.fingerprint(next, textCol, "__fp_next")
      .select(col(idCol), col("__fp_next"), lit(true).as("__in_next"))
    p.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("__in_prev").isNull, "added")
          .when(col("__in_next").isNull, "removed")
          .when(col("__fp_prev") <=> col("__fp_next"), "unchanged")
          .otherwise("changed")
          .as("status"))
  }

  /** Stratified deterministic sampling — the training-mix curation step:
    * each stratum (language, source, domain bucket) keeps its own
    * `rates(stratum)/den` fraction of rows, decided by the SAME portable
    * SHA-256-prefix recipe as [[sampleByHashPortable]], so the split is
    * reproducible in any engine, entity-stable (a key keeps or loses ALL
    * its rows), and nested across rates (raising a stratum's rate only
    * ADDS rows). Strata absent from `rates` keep `defaultNum/den`.
    *
    * Scale shape: one narrow map — the rate lookup folds to a literal
    * when-chain, no join, no shuffle.
    */
  def sampleByHashStratifiedPortable(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Int],
      den: Int,
      defaultNum: Int = 0,
      salt: Long = 0L
  ): DataFrame = {
    require(den > 0, "den must be positive")
    (rates.values ++ Seq(defaultNum)).foreach(n =>
      require(n >= 0 && n <= den, s"need 0 <= num <= $den, got $n"))
    val h = portableHash(col(keyCol), salt)
    // sorted fold for a deterministic plan; keys are distinct so the
    // chain order cannot change semantics
    val num = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultNum)) {
      case (acc, (k, n)) => when(col(strataCol) === k, lit(n)).otherwise(acc)
    }
    df.filter(pmod(h, lit(den.toLong)) < num)
  }

  /** Training-mix epoch weighting (the Pile/LLaMA-style source reweighting,
    * upsampling included): every document in stratum `s` appears
    * `weights(s)/den` times in expectation — the integer part repeats EVERY
    * document, and the fractional remainder repeats one extra time exactly
    * the deterministic [[sampleByHashPortable]] sub-sample (SHA-256-prefix
    * recipe), so the realized mix is reproducible in any engine,
    * entity-stable, and monotone in the weight (raising a weight only adds
    * copies). Emits `out` (0-based copy index, long); documents whose
    * stratum resolves to weight 0 — or that fall outside a sub-1.0
    * weight's keep set — are dropped, making this a superset of stratified
    * downsampling. Strata absent from `weights` get `defaultNum/den`
    * (default: exactly one copy).
    *
    * Scale shape: one narrow map (the weight lookup folds to a literal
    * when-chain) followed by an in-place generate — no shuffle, output
    * size = Σ weights; downstream training layout typically feeds this
    * into [[Pack.packChunkedShuffled]] keyed on (id, epoch).
    */
  def repeatByWeightPortable(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      weights: Map[String, Int],
      den: Int,
      defaultNum: Int = -1,
      salt: Long = 0L,
      out: String = "epoch"
  ): DataFrame = {
    require(den > 0, "den must be positive")
    val dflt = if (defaultNum < 0) den else defaultNum
    (weights.values ++ Seq(dflt)).foreach(n =>
      require(n >= 0, s"weights must be non-negative, got $n"))
    val h = portableHash(col(keyCol), salt)
    val num = weights.toSeq.sortBy(_._1).foldLeft(lit(dflt)) {
      case (acc, (k, n)) => when(col(strataCol) === k, lit(n)).otherwise(acc)
    }
    val copies = (num.cast("long") / den).cast("long") +
      when(pmod(h, lit(den.toLong)) < pmod(num.cast("long"), lit(den.toLong)), 1L)
        .otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1)
      .withColumn(out, explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Temperature-scaled source mixing (the multilingual / multi-corpus
    * rebalancing shape: sampling a source proportionally to n^(1/T)
    * flattens the size distribution for T > 1, up-weighting small sources):
    * each stratum of `strataCol` with n rows gets a quota
    * `min(n, max(minQuota, round(scale · n^invTemp)))` and contributes its
    * quota of rows chosen by the portable SHA-256-prefix rank (ties by
    * `keyCol`) — the same deterministic carve-out as [[sampleKPerGroup]],
    * so the realized mix is engine-reproducible and stable under reruns.
    *
    * `invTemp = 0.5` (T = 2) is computed with `sqrt`, which IEEE requires
    * to be correctly rounded — the quota then replays bit-for-bit in any
    * engine; other exponents go through `pow`, whose last-ulp behavior is
    * libm-specific (quotas could differ by 1 near rounding boundaries —
    * fine for training mixes, not for cross-engine replay contracts).
    *
    * Scale shape: one map-side-combinable count per stratum (a tiny
    * broadcast relation joined back), then one shuffle on the stratum and
    * an in-partition sort for the rank. The quota is data-dependent, so
    * Spark's WindowGroupLimit pruning (literal k only) does NOT apply —
    * a hot stratum pays its full sort; when quotas are known up front,
    * [[sampleKPerGroup]] with literal k is the cheaper path.
    */
  def mixByTemperature(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      invTemp: Double,
      scale: Double,
      minQuota: Int = 1,
      salt: Long = 0L
  ): DataFrame = {
    require(invTemp > 0 && invTemp <= 1, "invTemp must be in (0, 1]")
    require(scale > 0, "scale must be positive")
    require(minQuota >= 0, "minQuota must be non-negative")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val raised =
      if (invTemp == 0.5) sqrt(col("__n").cast("double"))
      else pow(col("__n").cast("double"), lit(invTemp))
    val quotas = counts.withColumn("__quota",
      least(col("__n"),
        greatest(lit(minQuota.toLong),
          round(lit(scale) * raised, 0).cast("long"))))
    val h = portableHash(col(keyCol), salt)
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .join(broadcast(quotas.select(col(strataCol), col("__quota"))), Seq(strataCol))
      .filter(col("__rk") <= col("__quota"))
      .select(df.columns.map(col): _*)
  }

  /** Cross-document boilerplate removal (C4/RefinedWeb-style): drop every
    * line that occurs — after whitespace-normalized lowercasing — in more
    * than `maxDocFreq` distinct documents (navigation chrome, cookie
    * banners, license footers), then reassemble each document from its
    * surviving lines in order.
    *
    * Scale shape: explode to (doc, position, line), one map-side-combined
    * distinct-count per normalized line, broadcast-anti-join the (tiny)
    * boilerplate line set, and one groupBy(doc) to reassemble — two
    * shuffles, no window over unbounded groups. The boilerplate set is the
    * frequency head of the line distribution, so it stays broadcastable at
    * any corpus size for sane thresholds.
    */
  def dropBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Int = 10,
      out: String = "clean_text"
  ): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = df
      .select(
        col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn(
        "__norm",
        regexp_replace(lower(trim(col("__line"))), "\\s+", " "))
    // Blank/whitespace-only lines are paragraph structure, not boilerplate:
    // they are excluded from the doc-frequency count (and can thus never be
    // dropped) but stay in `lines` so reassembly preserves them verbatim.
    val boilerplate = lines
      .filter(col("__norm") =!= "")
      .groupBy(col("__norm"))
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select(col("__norm"))
    val kept = lines.join(broadcast(boilerplate), Seq("__norm"), "left_anti")
    val rebuilt = kept
      .groupBy(col("__id"))
      .agg(
        concat_ws(
          "\n",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line"))).as(out))
    df.join(
        rebuilt.select(col("__id").as(idCol), col(out)),
        Seq(idCol), "left")
      .withColumn(out, coalesce(col(out), lit("")))
  }

  /** Exact dedup by content fingerprint (whitespace/case-insensitive): keeps
    * the min-`idCol` row of each fingerprint class. `idCol` must be unique
    * and non-null.
    *
    * Skew shape: a duplicate-heavy corpus is this operator's expected input,
    * so a window over the fingerprint would ship a viral document's entire
    * class to one task. Instead the representative ids come from a map-side
    * combinable min-aggregation (a class of any size reduces to one (fp, id)
    * pair per input partition before the shuffle), and the semi-join back
    * distributes by each row's OWN (fp, id) — unique ids, no hot key.
    */
  def exactByFingerprint(
      df: DataFrame,
      textCol: String,
      idCol: String
  ): DataFrame = {
    val fp = TextAnalysis.fingerprint(df, textCol, "__fp")
    val reps = fp
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__rid"))
    // null-safe on the fingerprint (null text → null md5) so the null class
    // keeps a representative too
    fp.join(
        reps,
        fp("__fp") <=> reps("__fp") && fp(idCol) === reps("__rid"),
        "left_semi")
      .drop("__fp")
  }

  /** Word-level shingles of size k, distinct per document (column-expression
    * variant of [[shingleRows]] with identical semantics: documents shorter
    * than k tokens produce NO shingles).
    */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = split(trim(lower(textCol)), "\\s+")
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      array_distinct(
        filter(
          transform(
            sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))
          ),
          s => length(s) > 0
        )
      )
    )
  }

  /** Exploded distinct (id, shingle) pairs via a typed flatMap — one
    * deserialization and plain string ops, ~5× faster than the nested
    * higher-order-function expression for long texts. Narrow (no shuffle).
    */
  private[ops] def shingleRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.Encoders
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      idField.copy(name = "__id"),
      org.apache.spark.sql.types.StructField("__sh",
        org.apache.spark.sql.types.StringType, nullable = false)
    ))
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.flatMap { r =>
      val id = r.get(idIdx)
      val text = if (r.isNullAt(tIdx)) "" else r.getString(tIdx)
      val toks = Whitespace.split(text.toLowerCase.trim).filter(_.nonEmpty)
      val set = scala.collection.mutable.LinkedHashSet.empty[String]
      if (toks.length >= k) {
        var i = 0
        while (i + k <= toks.length) {
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
          set += sb.result()
          i += 1
        }
      }
      set.iterator.map(sh => org.apache.spark.sql.Row(id, sh))
    }(Encoders.row(outSchema))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline (one standard LSH pass):
    *  1. explode distinct word-k-shingles per doc
    *  2. signature: per doc, min of xxhash64(seed_i, shingle) for each of
    *     `numHashes` hash functions — one aggregation, map-side combined
    *  3. band the signature into `bands` groups, hash each band, explode
    *  4. candidate pairs = docs sharing a (band, bandHash) bucket
    *     (bucket size capped to guard against degenerate skew)
    *  5. verify exact shingle-set Jaccard ≥ threshold via a join on shingles
    *
    * Returns (left_id, right_id, jaccard) with left_id < right_id.
    *
    * `observeDropped`: optional [[org.apache.spark.sql.Observation]] that
    * surfaces what the bucket cap silently discarded — after any action on
    * the result, `obs.get` carries `dropped_buckets` and
    * `rows_in_dropped_buckets` (bucket memberships, not distinct docs). At
    * 100 TB this is the recall-loss monitor for degenerate skew (e.g. a
    * boilerplate shingle family collapsing a corpus slice into one
    * bucket); the cost is one broadcast-mark null-check per banded row
    * (see [[boundedBuckets]]) — the default plan is untouched.
    */
  def minHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      observeDropped: Option[org.apache.spark.sql.Observation] = None,
      bandPasses: Int = 1,
      verifyBroadcastMaxPairs: Long = 4000000L,
      verifyRestrictMinInputBytes: Long = 2L << 30
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(bandPasses >= 1 && bands % bandPasses == 0,
      "bandPasses must divide bands")
    require(observeDropped.isEmpty || bandPasses == 1,
      "observeDropped is single-query; staged band passes run several")

    // Scale gate for the candidate-restricted verify: the restriction's
    // payoff is the CORPUS-SIZED verify exchanges it removes, and its cost
    // (an up-front pair count, a candidate-id broadcast, a narrow semi-join
    // pass) is roughly input-independent — so below a couple of GB of
    // input the old unrestricted plan is strictly cheaper (measured round
    // 17 at sf0.1: restrict cost +1.2–2.4 s per entry while saving
    // nothing). The gate reads the optimizer's size estimate (actual file
    // bytes for parquet scans) — no job — so toy inputs keep the r16 plan
    // bit-for-bit and 100 TB inputs always qualify.
    if (bandPasses > 1)
      return minHashPairsStaged(df, idCol, textCol, shingleSize, numHashes,
        bands, jaccardThreshold, maxBucketSize, bandPasses,
        verifyBroadcastMaxPairs, verifyRestrictMinInputBytes)

    val restrictEligible = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes)
      .map(_ >= verifyRestrictMinInputBytes).getOrElse(true)

    val shingleSets = shingleRows(df, idCol, textCol, shingleSize).persist()

    // persisted: boundedBuckets reads this twice (once counting bucket
    // sizes, once collecting members) and the minhash signature aggregation
    // upstream is the expensive part of the pipeline
    val banded = bandedSignatures(shingleSets, numHashes, bands).persist()

    // 4. candidates within buckets: ONE aggregation collects each bucket's
    // members, then pairs are exploded in place — replaces a window count
    // (shuffle) + two-sided self-join (two shuffles) + distinct. Oversized
    // buckets are removed BEFORE the array aggregation (boundedBuckets), so
    // no task ever materializes more than maxBucketSize elements or
    // C(maxBucketSize, 2) pairs.
    val candidates0 = pairsFromBuckets(
      boundedBuckets(banded, Seq("__band", "__bh"), col("__id"), maxBucketSize,
        observeDropped),
      "__ids"
    ).distinct()
    if (!restrictEligible)
      return verifyCandidates(shingleSets, candidates0,
        restrict = false, jaccardThreshold)
    // one action up front: the pair count decides whether the verify can
    // broadcast-restrict the shingle table (see verifyCandidates) — for a
    // dedup corpus candidates cover a small fraction of docs, and the
    // count is what the adaptive choice needs. The candidate pipeline
    // materializes into the cache exactly once either way (the verify
    // below would have evaluated it anyway); observeDropped metrics are
    // delivered by this count.
    val candidates = candidates0.persist()
    val nPairs = candidates.count()
    verifyCandidates(shingleSets, candidates,
      restrict = nPairs <= verifyBroadcastMaxPairs, jaccardThreshold)
  }

  /** Exact shingle-set Jaccard verification of candidate pairs: equi-join
    * on (id, shingle-hash) so the shared-shingle count IS the join
    * cardinality per pair. The join key is xxhash64 of the shingle, not
    * the string: equality is all the join tests, and the exchanges here
    * carry 8-byte keys instead of ~30-byte shingle text — measured round
    * 15, these exchanges were the operator's scale wall (the 50M-doc
    * decade-4 probe ENOSPC'd >70 GB of shuffle spill on string keys).
    * Collisions: 64-bit, ~n²/2⁶⁵ expected across the corpus — a collision
    * inflates one pair's intersection by 1 only if it lands inside that
    * compared pair, vanishing risk traded for ~4× less verify shuffle.
    *
    * `restrict` is the round-17 scale fix for the OTHER half of that
    * wall: even with 8-byte keys the verify exchanged the WHOLE corpus's
    * shingle hashes on both sides, though only candidate docs matter.
    * When the candidate set is small (the normal dedup regime — dup rate
    * × corpus, known from the caller's pair count), the shingle table is
    * first cut down to candidate docs with a broadcast left-semi join —
    * a NARROW operation, no corpus-wide exchange — so the verify
    * exchanges shrink from corpus-sized to candidate-sized (scratch-rule
    * effect measured in SCALING.md round 17). A pathological all-dup
    * corpus falls back to the full exchange.
    */
  private def verifyCandidates(
      shingleSets: DataFrame,
      candidates: DataFrame,
      restrict: Boolean,
      jaccardThreshold: Double
  ): DataFrame = {
    val base =
      if (restrict) {
        // one explode pass over the (persisted, small) candidate pairs,
        // materialized eagerly: the verify plan references `base` three
        // times (sizes, left shh, right shh) — without the checkpoint each
        // reference would re-run the distinct aggregation and re-build the
        // broadcast
        val candIds = candidates
          .select(explode(array(col("left_id"), col("right_id"))).as("__id"))
          .distinct()
          .localCheckpoint()
        shingleSets.join(broadcast(candIds), Seq("__id"), "left_semi")
      } else shingleSets
    val sizes = base.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val shh = base.select(col("__id"), xxhash64(col("__sh")).as("__shh"))
    val inter = candidates
      .join(shh.select(col("__id").as("left_id"), col("__shh")), "left_id")
      .join(
        shh.select(col("__id").as("right_id"), col("__shh")),
        Seq("right_id", "__shh")
      )
      .groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col("__id").as("left_id"), col("__n").as("__nl")), "left_id")
      .join(sizes.select(col("__id").as("right_id"), col("__n").as("__nr")), "right_id")
      .withColumn(
        "jaccard",
        col("__inter").cast("double") /
          (col("__nl") + col("__nr") - col("__inter"))
      )
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** Staged execution of [[minHashPairs]] for scratch-disk-constrained
    * boxes (VERDICT r15 #7 option (b)): the `bands` LSH bands are
    * processed in `bandPasses` sequential groups, each pass running the
    * full candidate + verify pipeline over only its band subset and
    * landing its verified pairs in a temp directory; passes are separate
    * Spark actions whose shuffle references are dropped (and the driver
    * GC nudged) before the next starts, so the ContextCleaner reclaims
    * each pass's shuffle files instead of accumulating all of them into
    * one job's peak — on-disk scratch falls to ~1/passes of the measured
    * 27.7 B-per-corpus-byte rule. The wall overhead vs single-pass is the
    * per-pass corpus-wide verify plus duplicate-candidate
    * re-verification; the signature aggregation is shared across passes
    * (below), so it is no longer pass-proportional.
    *
    * Result-identical to the single-pass run: each band's hash functions
    * and band hash are the same seeds as the full run (bandedSignatures'
    * subset path indexes the same hash family), so the union of per-group
    * candidate sets IS the full candidate set, verification is exact
    * either way, and the final distinct collapses pairs found by several
    * groups (jaccard is deterministic, so triples are identical).
    *
    * The shingle table is shared across passes at MEMORY_ONLY — never
    * disk, so the cache cannot spill into the very scratch the staging
    * protects (measured round 15: the pinned MEMORY_AND_DISK storage
    * floor OOM'd the 64g box). Each pass's plan references the shingle
    * table ~4× (banding plus the verify's three reads); without the
    * cache a 4-pass run re-ran the narrow shingle explosion ~16× — at
    * sf0.1 that was 14.7 s vs 2.8 s single-pass (round 17 A/B). When the
    * corpus outgrows executor memory, MEMORY_ONLY partitions evict and
    * those reads recompute narrowly — graceful, still zero scratch.
    *
    * Shuffle-file reclamation between passes is ASYNC by default; on a
    * scratch-critical box set `spark.cleaner.referenceTracking.blocking
    * .shuffle=true` so the per-pass GC nudge reclaims synchronously
    * before the next pass writes (the async cleaner lost that race into
    * ENOSPC in round 14's back-to-back decade runs).
    */
  private def minHashPairsStaged(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int,
      bands: Int,
      jaccardThreshold: Double,
      maxBucketSize: Int,
      bandPasses: Int,
      verifyBroadcastMaxPairs: Long,
      verifyRestrictMinInputBytes: Long
  ): DataFrame = {
    val spark = df.sparkSession
    val groups = (0 until bands).grouped(bands / bandPasses).toList
    val tmpDir = java.nio.file.Files
      .createTempDirectory("graft_minhash_staged").toFile
    tmpDir.deleteOnExit()
    // same scale gate as the single-pass path: below a couple of GB the
    // corpus-wide verify exchanges are cheaper than the restriction pass
    val restrictEligible = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes)
      .map(_ >= verifyRestrictMinInputBytes).getOrElse(true)
    val sh = shingleRows(df, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // Full signature table computed ONCE and shared across passes (round-18
    // fix for the pass-proportional recompute): each pass previously ran its
    // own quarter-width signature aggregation, which still scans the whole
    // shingle table and shuffles one row per doc — 4 passes paid the
    // pipeline's most expensive aggregation 4 times. One row of 64 longs
    // per doc is tiny next to the corpus, so MEMORY_ONLY keeps the staged
    // mode's zero-scratch property (eviction recomputes from the cached
    // shingle table, never spills to disk). Band slices read only their 4
    // signature columns from the cache.
    val sigs = minhashSignatures(sh, 0 until numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val passDirs = groups.zipWithIndex.map { case (g, i) =>
      val out = new java.io.File(tmpDir, s"pass_$i").getAbsolutePath
      val banded = bandsFromSignatures(sigs, numHashes, bands, g)
      val cand0 = pairsFromBuckets(
        boundedBuckets(banded, Seq("__band", "__bh"), col("__id"),
          maxBucketSize),
        "__ids"
      ).distinct()
      if (restrictEligible) {
        val cand = cand0.persist()
        val nPairs = cand.count()
        verifyCandidates(sh, cand,
          restrict = nPairs <= verifyBroadcastMaxPairs, jaccardThreshold)
          .write.mode("overwrite").parquet(out)
        cand.unpersist(blocking = true)
      } else {
        verifyCandidates(sh, cand0, restrict = false, jaccardThreshold)
          .write.mode("overwrite").parquet(out)
      }
      // this pass's shuffle dependencies are unreachable now; a driver GC
      // lets the ContextCleaner's weak references fire so the pass's
      // shuffle files are reclaimed before the next pass piles on
      System.gc()
      out
    }
    sigs.unpersist()
    sh.unpersist()
    spark.read.parquet(passDirs: _*).distinct()
  }

  /** MinHash signature → LSH bands for a shingle table: per doc, numHashes
    * min-aggregates in ONE map-side-combined pass, banded into
    * (band index, band hash) rows. Shared by [[minHashPairs]] (self-dedup)
    * and [[contaminatedIdsFuzzy]] (cross-table overlap).
    */
  private def bandedSignatures(
      shingleSets: DataFrame,
      numHashes: Int,
      bands: Int,
      bandSubset: Option[Seq[Int]] = None
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    // a subset run (staged band passes) indexes the SAME hash family by
    // the band's global position, so band b's bucket keys are identical
    // whether computed alone or in the full run — the staged union is
    // then result-identical to single-pass. Only the subset's hashes are
    // aggregated: a pass pays 1/passes of the min-agg width.
    val bandIdx = bandSubset.getOrElse(0 until bands)
    val hashIdx =
      bandIdx.flatMap(b => (0 until rowsPerBand).map(r => b * rowsPerBand + r))
    bandsFromSignatures(
      minhashSignatures(shingleSets, hashIdx), numHashes, bands, bandIdx)
  }

  /** Per-doc MinHash signature columns `__h<i>` for the given hash-family
    * indices: one map-side-combined aggregation over the shingle table.
    * Split out of [[bandedSignatures]] so the staged runner can compute
    * the FULL signature table once and slice bands from it per pass. */
  private def minhashSignatures(
      shingleSets: DataFrame,
      hashIdx: Seq[Int]
  ): DataFrame = {
    val sigAggs = hashIdx.map { i =>
      min(xxhash64(lit(i), col("__sh"))).as(s"__h$i")
    }
    shingleSets.groupBy(col("__id")).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** LSH band rows from a signature table: band b hashes signature slots
    * [b·rowsPerBand, (b+1)·rowsPerBand) — indices are GLOBAL positions in
    * the hash family, so a band's bucket keys are identical whether the
    * signature table was computed for that band alone or for all bands. */
  private def bandsFromSignatures(
      sigs: DataFrame,
      numHashes: Int,
      bands: Int,
      bandIdx: Seq[Int]
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = bandIdx.map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"__h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    sigs
      .select(col("__id"), explode(array(bandCols.toSeq: _*)).as("b"))
      .select(col("__id"), col("b.band").as("__band"), col("b.bh").as("__bh"))
  }

  /** Fuzzy benchmark decontamination — the near-duplicate strengthening of
    * [[contaminatedIds]]' exact n-gram rule: a corpus document is flagged
    * when its word-shingle set reaches Jaccard `jaccardThreshold` against
    * ANY benchmark text. Candidates come from a cross-table MinHash-LSH
    * band equi-join (both sides signed with the same hash family), then
    * exact shingle-set verification — so at threshold 1.0 (equal sets:
    * case/whitespace/duplication-invariant copies) recall is exactly 1,
    * equal sets forcing equal signatures in every band.
    *
    * Scale shape: the benchmark side (an eval set) is small, so its banded
    * signatures and sizes BROADCAST; the corpus pays one shingle pass, one
    * signature aggregation and a broadcast band join — never a corpus
    * self-join. Candidate fan-out is linear in matching corpus docs
    * (corpus × small-bench, not corpus × corpus), so no bucket cap is
    * needed. Documents shorter than `shingleSize` tokens have no shingles
    * and can never be flagged.
    */
  def contaminatedIdsFuzzy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val corpusSh =
      shingleRows(corpus.select(col(idCol), col(textCol)), idCol, textCol,
        shingleSize).persist()
    val bench = benchmark
      .select(monotonically_increasing_id().as("__bid"), col(benchTextCol))
    val benchSh = shingleRows(bench, "__bid", benchTextCol, shingleSize).persist()
    val candidates = bandedSignatures(corpusSh, numHashes, bands)
      .join(
        broadcast(bandedSignatures(benchSh, numHashes, bands)
          .select(col("__id").as("__bid"), col("__band"), col("__bh"))),
        Seq("__band", "__bh"))
      .select(col("__id"), col("__bid"))
      .distinct()
    val corpusSizes = corpusSh.groupBy(col("__id")).agg(count(lit(1)).as("__nc"))
    val benchSizes = benchSh.groupBy(col("__id")).agg(count(lit(1)).as("__nb"))
      .select(col("__id").as("__bid"), col("__nb"))
    candidates
      .join(corpusSh, Seq("__id"))
      .join(benchSh.select(col("__id").as("__bid"), col("__sh")),
        Seq("__bid", "__sh"))
      .groupBy(col("__id"), col("__bid"))
      .agg(count(lit(1)).as("__i"))
      .join(corpusSizes, Seq("__id"))
      .join(broadcast(benchSizes), Seq("__bid"))
      .filter(
        col("__i").cast("double") / (col("__nc") + col("__nb") - col("__i"))
          >= jaccardThreshold)
      .select(col("__id").as(idCol))
      .distinct()
  }

  /** [[contaminatedIdsFuzzy]]' complement: the corpus minus every fuzzily
    * contaminated document (null-safe anti-join on the id).
    */
  def dropContaminatedFuzzy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8
  ): DataFrame = {
    val flagged = contaminatedIdsFuzzy(corpus, idCol, textCol, benchmark,
      benchTextCol, shingleSize, numHashes, bands, jaccardThreshold)
    corpus.join(flagged, corpus(idCol) <=> flagged(idCol), "left_anti")
  }

  /** Bucket membership arrays, computed skew-proof: bucket cardinalities are
    * counted first (a map-side-combinable count, no arrays), keys over `cap`
    * are removed with a broadcast anti-join, and only then are member arrays
    * collected. A post-aggregation size filter would OOM materializing the
    * very array it is about to drop (one degenerate key — e.g. every empty
    * document hashing to the same signature — puts the whole corpus into a
    * single aggregation buffer); counting first bounds every task at `cap`
    * members. The dropped keys are observable via [[oversizedBucketKeys]],
    * or in-flight (no second job) via `observeDropped`, which reports
    * `rows_in_dropped_buckets` (memberships removed by the cap) and
    * `dropped_buckets` (distinct capped keys, HLL — exact at diagnostic
    * cardinalities) after any action on the result. Plan note: Spark only
    * delivers observed metrics from the MAIN lineage — a CollectMetrics
    * node on a join's build side reports nothing (measured on 4.1) — so
    * the observed variant marks oversized keys with a broadcast LEFT
    * OUTER join, observes the probe stream, and filters the marks back
    * out: row-identical to the anti join, same broadcast build, one
    * extra null-check per row, and only when observation is requested —
    * the default plan keeps the pure anti join. One more measured 4.1
    * edge: if the cap drops EVERY bucket (pathological corpus), AQE's
    * empty-relation propagation replaces the downstream aggregation —
    * and the observed node with it — so the metrics come back empty;
    * any surviving bucket keeps them intact. Read with `getOrEmpty` if
    * the corpus could be fully degenerate.
    */
  private[ops] def boundedBuckets(
      rows: DataFrame,
      keyCols: Seq[String],
      value: Column,
      cap: Int,
      observeDropped: Option[org.apache.spark.sql.Observation] = None
  ): DataFrame = {
    val keys = keyCols.map(col)
    val over = oversizedBucketKeys(rows, keyCols, cap)
    val pruned = observeDropped match {
      case None =>
        rows.join(broadcast(over.select(keys: _*)), keyCols, "left_anti")
      case Some(o) =>
        val mark = "__graft_over"
        rows
          .join(
            broadcast(over.select(keys :+ lit(true).as(mark): _*)),
            keyCols, "left")
          .observe(o,
            coalesce(sum(when(col(mark), 1L)), lit(0L))
              .as("rows_in_dropped_buckets"),
            coalesce(approx_count_distinct(when(col(mark),
              concat_ws(" ", keys.map(_.cast("string")): _*))), lit(0L))
              .as("dropped_buckets"))
          .filter(col(mark).isNull)
          .drop(mark)
    }
    pruned
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(value)).as("__ids"))
      .filter(size(col("__ids")) >= 2)
  }

  /** The bucket keys (with sizes) that [[boundedBuckets]] drops — count this
    * to monitor recall loss from the cap on skewed corpora.
    */
  private[ops] def oversizedBucketKeys(
      rows: DataFrame,
      keyCols: Seq[String],
      cap: Int
  ): DataFrame =
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > cap)

  /** All ordered pairs (arr(i), arr(j)), i < j, from a sorted-array column —
    * two chained generators (posexplode + explode over a slice), fully
    * codegen'd, no typed serialization and no self-join. Because the array
    * is sorted and its elements distinct, left < right holds by construction.
    */
  private[ops] def pairsFromBuckets(buckets: DataFrame, arrCol: String): DataFrame =
    buckets
      .select(posexplode(col(arrCol)).as(Seq("__i", "left_id")), col(arrCol))
      .select(
        col("left_id"),
        explode(slice(col(arrCol), col("__i") + lit(2), size(col(arrCol))))
          .as("right_id")
      )

  /** Connected components over near-duplicate pairs: every document gets a
    * cluster id = the minimum doc id reachable through the pair graph
    * (hash-min label propagation, converges in O(graph diameter) rounds —
    * near-dup graphs are shallow, so a small `maxIterations` suffices).
    *
    * Each round is one shuffle on ids; intermediate labels are persisted
    * and the loop stops early when no label changes.
    */
  /** Edge count below which connected components run as driver-side
    * union-find instead of distributed label propagation. Near-dup edge sets
    * are tiny relative to the corpus (dup rate × docs), so even at 100 TB
    * most runs stay under this; the distributed loop remains the fallback
    * for genuinely huge graphs.
    */
  val SmallGraphMaxEdges: Long = 2000000L

  def duplicateClusters(
      ids: DataFrame, // one column: the id universe
      pairs: DataFrame, // columns left_id, right_id
      idCol: String,
      maxIterations: Int = 20,
      smallGraphMaxEdges: Long = SmallGraphMaxEdges
  ): DataFrame = {
    val spark = ids.sparkSession
    val pairsP = pairs.select(col("left_id"), col("right_id")).persist()
    val pairCount = pairsP.count()

    // measurement hook (never set by the driver): force the distributed
    // path to time/verify it at fixture scales where union-find would win
    val effMaxEdges =
      if (sys.env.contains("GRAFT_CC_FORCE_DISTRIBUTED")) -1L
      else smallGraphMaxEdges
    if (pairCount <= effMaxEdges) {
      // Small-graph fast path: union-find on the driver (one collect of the
      // bounded pair list), result broadcast back — one job + one broadcast
      // join instead of O(diameter) shuffle rounds.
      val edgeRows = pairsP.collect()
      pairsP.unpersist()
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var root = x
        while (parent.getOrDefault(root, root) != root)
          root = parent.getOrDefault(root, root)
        var cur = x // path compression
        while (parent.getOrDefault(cur, cur) != root) {
          val nxt = parent.getOrDefault(cur, cur)
          parent.put(cur, root)
          cur = nxt
        }
        root
      }
      edgeRows.foreach { r =>
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) parent.put(ra, rb)
      }
      // min id per component is the cluster label
      val minOf = new java.util.HashMap[Any, Any]()
      val lt: (Any, Any) => Boolean =
        (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
      val nodes = new java.util.HashSet[Any]()
      edgeRows.foreach { r => nodes.add(r.get(0)); nodes.add(r.get(1)) }
      nodes.forEach { n =>
        val root = find(n)
        val cur = minOf.get(root)
        if (cur == null || lt(n, cur)) minOf.put(root, n)
      }
      val idField = ids.schema(ids.schema.fieldIndex(idCol))
      val mapSchema = org.apache.spark.sql.types.StructType(Seq(
        idField.copy(name = "a"), idField.copy(name = "cluster_id")))
      val mapRows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](nodes.size)
      nodes.forEach(n => mapRows += org.apache.spark.sql.Row(n, minOf.get(find(n))))
      val mapping = spark.createDataFrame(
        spark.sparkContext.parallelize(mapRows.toSeq, 1), mapSchema)
      ids
        .select(col(idCol).as("a"))
        .join(broadcast(mapping).withColumnRenamed("cluster_id", "__c"),
          Seq("a"), "left")
        .select(col("a").as(idCol), coalesce(col("__c"), col("a")).as("cluster_id"))
    } else {
      // Distributed hash-min label propagation, restricted to edge-incident
      // nodes (isolated ids are their own cluster and never enter the loop).
      // Converges in O(graph diameter) rounds; eager localCheckpoint per
      // round truncates the growing iteration lineage.
      val edges = pairsP
        .select(col("left_id").as("a"), col("right_id").as("b"))
        .union(pairsP.select(col("right_id").as("a"), col("left_id").as("b")))
        .persist()
      val active = edges.select(col("a")).distinct()
      var labels = active
        .select(col("a"), col("a").as("cluster_id"))
        .localCheckpoint(true)
      // Shiloach–Vishkin: each outer round HOOKS every tree's ROOT onto
      // the smallest neighboring tree's label (one edge-sized join), then
      // pointer-JUMPS the label forest to closure (node-sized self-joins).
      // Converges in O(log n) outer rounds — the earlier per-node
      // neighbor-min propagation was O(component diameter) and silently
      // returned unconverged labels past maxIterations on chain-of-chains
      // graphs (caught by the union-find equivalence spec; 100 merged
      // 150-chains: 250 rounds neighbor-min vs 4 hooks here).
      var converged = false
      var i = 0
      while (!converged && i < maxIterations) {
        // per-root candidate: the smallest label on the other side of any
        // edge leaving the root's tree
        val cands = edges
          .join(labels.select(col("a"), col("cluster_id").as("__la")), "a")
          .join(labels.select(col("a").as("b"), col("cluster_id").as("__lb")), "b")
          .filter(col("__la") =!= col("__lb"))
          .groupBy(col("__la").as("a"))
          .agg(min(col("__lb")).as("__cand"))
          .filter(col("__cand") < col("a"))
          .localCheckpoint(true)
        val hookChanged = cands.limit(1).count() > 0
        if (!hookChanged) converged = true
        else {
          // only the ROOT row (label(r) == r after closure) adopts the
          // candidate; everyone else keeps its parent pointer
          var cur = labels.join(cands, Seq("a"), "left")
            .select(col("a"),
              when(col("cluster_id") === col("a") && col("__cand").isNotNull,
                col("__cand")).otherwise(col("cluster_id")).as("cluster_id"))
            .localCheckpoint(true)
          // pointer-jump to closure: l := l∘l until idempotent (halves the
          // pointer depth each pass — a handful of node-sized joins)
          var jStable = false
          var j = 0
          while (!jStable && j < 64) {
            val jumped = cur.as("__x")
              .join(
                cur.select(col("a").as("cluster_id"),
                  col("cluster_id").as("__cc")).as("__y"),
                Seq("cluster_id"), "left")
              .select(col("a"),
                coalesce(col("__cc"), col("cluster_id")).as("cluster_id"))
              .localCheckpoint(true)
            jStable = jumped
              .join(cur.withColumnRenamed("cluster_id", "__old"), "a")
              .filter(col("cluster_id") =!= col("__old"))
              .limit(1).count() == 0
            cur = jumped
            j += 1
          }
          labels = cur
        }
        i += 1
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round $i hookChanged=$hookChanged")
      }
      require(converged,
        s"duplicateClusters: hooking did not converge in " +
          s"$maxIterations rounds — raise maxIterations")
      edges.unpersist()
      pairsP.unpersist()
      ids
        .select(col(idCol).as("a"))
        .join(labels.withColumnRenamed("cluster_id", "__c"), Seq("a"), "left")
        .select(col("a").as(idCol), coalesce(col("__c"), col("a")).as("cluster_id"))
    }
  }

  /** End-to-end near-duplicate removal: keep one representative (the
    * cluster-minimum id) per MinHash near-dup cluster. `bandPasses > 1`
    * selects [[minHashPairs]]' scratch-constrained staged mode
    * (result-identical, ~1/passes peak scratch, ~2× wall).
    */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      bandPasses: Int = 1
  ): DataFrame = {
    val pairs =
      minHashPairs(df, idCol, textCol, shingleSize, numHashes, bands,
        jaccardThreshold, bandPasses = bandPasses)
    val clusters =
      duplicateClusters(df.select(idCol), pairs, idCol)
    df.join(
      clusters.filter(col(idCol) === col("cluster_id")).select(idCol),
      Seq(idCol),
      "left_semi"
    )
  }

  /** Quality-aware near-dup representative selection: keep, per cluster of
    * `clusters` (columns `idCol`, `cluster_id` as produced by
    * [[duplicateClusters]]), the row of `df` with the highest `scoreCol`
    * (ties → smallest id). This is the selection real training-data
    * pipelines want — dropping near-duplicates should keep the BEST copy
    * (longest, cleanest, highest quality score), not the min-id one.
    *
    * Rows of `df` absent from `clusters` are treated as their own singleton
    * cluster (kept) rather than silently dropped — a clusters table built
    * from pair output alone, without singletons, would otherwise discard
    * every unique document. Singletons are grouped under a TAGGED key
    * (struct of a marker + the id), never the raw id, so a caller whose
    * `cluster_id` values are not drawn from member doc ids (the
    * [[duplicateClusters]] min-id convention) cannot have an unclustered
    * doc absorbed into — and dropped from — a same-valued cluster.
    *
    * Skew shape: two map-side-combinable aggregations (max score per
    * cluster; min id over the tied rows) and semi-joins — no windows, so a
    * viral million-member cluster never lands on one task. The tie filter
    * is null-safe: a cluster whose scores are all NULL still keeps its
    * min-id row. The (narrow) id/score/cluster projection is materialized
    * once — it feeds both the max-score aggregation and the tie filter.
    */
  def keepBestPerCluster(
      df: DataFrame,
      clusters: DataFrame,
      idCol: String,
      scoreCol: String
  ): DataFrame = {
    val withC = df
      .select(col(idCol), col(scoreCol))
      .join(clusters.select(col(idCol), col("cluster_id")), Seq(idCol), "left")
      .withColumn("__ck",
        when(col("cluster_id").isNotNull,
          struct(lit(0).as("t"), col("cluster_id").as("v")))
          .otherwise(struct(lit(1).as("t"), col(idCol).as("v"))))
      .localCheckpoint()
    val best = withC
      .groupBy(col("__ck"))
      .agg(max(col(scoreCol)).as("__best"))
    val reps = withC
      .join(best, Seq("__ck"))
      .filter(col(scoreCol) <=> col("__best"))
      .groupBy(col("__ck"))
      .agg(min(col(idCol)).as(idCol))
    df.join(reps.select(idCol), Seq(idCol), "left_semi")
  }

  /** 64-bit SimHash per document over whitespace tokens — computed in a
    * single narrow map (no shuffle): per token a 64-bit hash votes ±1 on
    * each bit, the sign of each bit's tally forms the fingerprint.
    */
  def simHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      out: String = "simhash"
  ): DataFrame = {
    import org.apache.spark.sql.Encoders
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        out,
        org.apache.spark.sql.types.LongType,
        false
      )
    )
    val textIdx = df.schema.fieldIndex(textCol)
    df.map { row =>
      val text = if (row.isNullAt(textIdx)) "" else row.getString(textIdx)
      val counts = new Array[Int](64)
      Whitespace.split(text.toLowerCase).foreach { tok =>
        if (tok.nonEmpty) {
          val h = scala.util.hashing.MurmurHash3.stringHash(tok).toLong &
            0xffffffffL | (scala.util.hashing.MurmurHash3
              .stringHash(tok.reverse)
              .toLong << 32)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ sig)
    }(Encoders.row(schema))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDistance, using
    * block LSH with maxDistance+1 blocks (pigeonhole: ≤ maxDistance
    * differing bits cannot touch every block, so some block matches
    * exactly). maxDistance ≤ 15 keeps blocks ≥ 4 bits.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    // buckets over the cap are removed before any array materializes (the
    // degenerate case is real: every empty/whitespace doc has simhash 0, so
    // a web corpus puts millions of rows into one (block, 0) bucket);
    // monitor the loss with simHashDroppedBuckets
    val buckets = boundedBuckets(
      // persisted: read twice by boundedBuckets; upstream simhash is a full
      // text-tokenizing pass
      simHashBanded(df, idCol, textCol, maxDistance).persist(),
      Seq("__blk", "__bv"),
      struct(col("__id"), col("simhash")),
      maxBucketSize
    )
    // in-place pair explosion (sorted by id, so left < right by
    // construction) — replaces the two-sided self-join; same candidate set
    buckets
      .select(posexplode(col("__ids")).as(Seq("__i", "__l")), col("__ids"))
      .select(
        col("__l"),
        explode(slice(col("__ids"), col("__i") + lit(2), size(col("__ids")))).as("__r"))
      .select(col("__l.__id").as("left_id"), col("__r.__id").as("right_id"),
        bit_count(col("__l.simhash").bitwiseXOR(col("__r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Order-insensitive exact duplicate pairs: SimHash bucketing generates
    * candidates, exact token-multiset equality verifies them. The SimHash
    * signature is a pure function of the token multiset (each occurrence
    * votes ±1 per bit, summed — order never enters), so two documents with
    * equal lowercased token multisets ALWAYS share a signature and land in
    * the same bucket. Recall is exactly 1 — unconditionally: signature
    * buckets under `maxBucketSize` go through the cheap id+signature
    * pair-explosion path, and rows from OVERSIZED buckets (e.g. >cap
    * empty/whitespace docs all at simhash 0, or >cap copies of viral
    * boilerplate) are routed to an exact self-join keyed on the sorted
    * token array itself — never dropped, unlike the distance>0
    * [[simHashPairs]] whose cap loss is observable via
    * [[simHashDroppedBuckets]]. With maxDistance=0 every doc is in exactly
    * one signature bucket, so the two paths are disjoint and the union is
    * duplicate-free. Output size is inherently C(m,2) per m-duplicate set
    * — callers collapsing duplicates (rather than listing pairs) should
    * use exactDedup/keepBestPerCluster instead.
    */
  def simHashVerifiedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    val banded =
      simHashBanded(df.select(col(idCol), col(textCol)), idCol, textCol, 0)
        .persist()
    // sort_array is the multiset's canonical form
    val toks = df.select(
      col(idCol),
      sort_array(
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))
      ).as("__tk"))
    // under-cap buckets: in-place pair explosion over (id, signature) only
    // — the token arrays join in just for the final verification of the
    // small candidate set (a 64-bit collision of unequal multisets)
    val cand = pairsFromStructBuckets(
      boundedBuckets(banded, Seq("__blk", "__bv"),
        struct(col("__id"), col("simhash")), maxBucketSize))
    val verified = cand
      .join(toks.select(col(idCol).as("left_id"), col("__tk").as("__lt")), "left_id")
      .join(toks.select(col(idCol).as("right_id"), col("__tk").as("__rt")), "right_id")
      .filter(col("__lt") === col("__rt"))
      .select("left_id", "right_id")
    // oversized buckets: exact sort-merge self-join on the canonical token
    // array, restricted to the rows of those buckets. Equal multisets
    // co-locate by necessity; the join streams the C(m,2) output without
    // materializing any per-group array (no collect_list on a hot bucket).
    val hotIds = banded
      .join(
        broadcast(oversizedBucketKeys(banded, Seq("__blk", "__bv"), maxBucketSize)
          .select(col("__blk"), col("__bv"))),
        Seq("__blk", "__bv"), "left_semi")
      .select(col("__id").as(idCol))
    val hotToks = toks.join(hotIds, Seq(idCol), "left_semi")
    val hotPairs = hotToks.select(col(idCol).as("left_id"), col("__tk"))
      .join(hotToks.select(col(idCol).as("right_id"), col("__tk")), Seq("__tk"))
      .filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id")
    verified.union(hotPairs)
  }

  /** [[pairsFromBuckets]] for buckets of (__id, simhash) structs: all
    * ordered struct pairs projected to their id fields.
    */
  private def pairsFromStructBuckets(buckets: DataFrame): DataFrame =
    buckets
      .select(posexplode(col("__ids")).as(Seq("__i", "__l")), col("__ids"))
      .select(
        col("__l"),
        explode(slice(col("__ids"), col("__i") + lit(2), size(col("__ids"))))
          .as("__r"))
      .select(col("__l.__id").as("left_id"), col("__r.__id").as("right_id"))
      .distinct()

  /** The (block, value) buckets simHashPairs drops under its cap, with their
    * sizes — count/inspect to see what the cap costs on a given corpus.
    */
  def simHashDroppedBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame =
    oversizedBucketKeys(
      simHashBanded(df, idCol, textCol, maxDistance),
      Seq("__blk", "__bv"),
      maxBucketSize)

  /** Block-LSH rows (id, simhash, block index, block value) shared by
    * simHashPairs and simHashDroppedBuckets.
    */
  private def simHashBanded(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int
  ): DataFrame = {
    require(
      maxDistance >= 0 && maxDistance <= 15,
      "maxDistance must be in [0, 15] for 64-bit block LSH recall"
    )
    val nBlocks = maxDistance + 1
    val width = 64 / nBlocks
    val sigs = simHash(df.select(col(idCol), col(textCol)), idCol, textCol)
      .select(col(idCol).as("__id"), col("simhash"))
    val blocks = (0 until nBlocks).map { b =>
      // last block absorbs the remainder bits
      val w = if (b == nBlocks - 1) 64 - width * (nBlocks - 1) else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(
        lit(b).as("blk"),
        (shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask))).as("bv")
      )
    }
    sigs
      .select(col("__id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("__id"), col("simhash"), col("b.blk").as("__blk"), col("b.bv").as("__bv"))
  }

  /** Exact n-gram Jaccard pairs: candidates share at least one k-shingle
    * (document frequency of the shingle capped at `maxDocFreq` to bound the
    * join fan-out), verified by exact Jaccard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      jaccardThreshold: Double = 0.8,
      maxDocFreq: Int = 100
  ): DataFrame =
    ngramPairStats(df, idCol, textCol, shingleSize, maxDocFreq,
      prune = (imax, nl, nr) =>
        imax.cast("double") / (nl + nr - imax) >= jaccardThreshold)
      .withColumn(
        "jaccard",
        col("__inter").cast("double") / (col("__nl") + col("__nr") - col("__inter"))
      )
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))

  /** Asymmetric n-gram containment pairs (Broder 1997's containment; the
    * quote/subset-detection signal of modern corpus curation): over distinct
    * k-shingle sets, containment(A→B) = |S(A) ∩ S(B)| / |S(A)|. A short
    * document embedded verbatim in a long one has containment ≈ 1 while its
    * Jaccard is tiny — invisible to symmetric near-dup passes. Emits one row
    * per unordered candidate pair with BOTH directions (`contain_left` =
    * share of the left doc's shingles that the right doc also has), kept
    * when either direction reaches `threshold`.
    *
    * Scale shape identical to [[ngramJaccardPairs]] (shared core): bucketed
    * rare-shingle candidates, Imax pruning bound containment ≤
    * Imax/min(nl, nr), exact verification join. Scores are single IEEE
    * divisions of exact integers — engine-independent.
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      maxDocFreq: Int = 100
  ): DataFrame =
    ngramPairStats(df, idCol, textCol, shingleSize, maxDocFreq,
      prune = (imax, nl, nr) =>
        imax.cast("double") / least(nl, nr) >= threshold)
      .withColumn("contain_left", col("__inter").cast("double") / col("__nl"))
      .withColumn("contain_right", col("__inter").cast("double") / col("__nr"))
      .filter(greatest(col("contain_left"), col("contain_right")) >= threshold)
      .select(col("left_id"), col("right_id"),
        col("contain_left"), col("contain_right"))

  /** Deterministic negative sampling for contrastive training: `k`
    * pseudo-random pool rows per anchor, chosen by the engine-portable
    * SHA-256 hash of `"<anchor>#<j>"` modulo the pool size — re-runs,
    * retries, and external replicas pick the SAME negatives, and a fresh
    * `salt` is a fresh reproducible draw. Accidental positives (a negative
    * equal to its own anchor) are dropped when `excludeSelf`, so an anchor
    * can yield fewer than `k` rows — by contract, not silently.
    *
    * Scale shape: the pool is dense-indexed by the packers' hierarchical
    * global rank (no single global-sort task), the pool SIZE rides a 1-row
    * broadcast, and each anchor explodes into exactly k probe rows that
    * EQUI-join the index — no sampling scan of the pool per anchor.
    */
  def negativeSamples(
      anchors: DataFrame,
      anchorIdCol: String,
      pool: DataFrame,
      poolIdCol: String,
      k: Int,
      salt: Long = 11L,
      excludeSelf: Boolean = true
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // persisted: the index is read by both the size aggregate and the
    // probe join (globalRank's checkpoint already cut the pool scan)
    val ranked = Pack.globalRank(
      pool.select(col(poolIdCol).as("__poolId")), Seq(col("__poolId")))
      .withColumnRenamed("__rank", "__tr")
      .persist()
    val n = ranked.agg(count(lit(1)).as("__n"))
    val probes = anchors.select(col(anchorIdCol).as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), col("__n"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__tr",
        pmod(
          portableHash(
            concat_ws("#", col("anchor_id").cast("string"),
              col("j").cast("string")), salt),
          col("__n")))
    val joined = probes.join(ranked, Seq("__tr"))
    (if (excludeSelf) joined.filter(!(col("__poolId") <=> col("anchor_id")))
     else joined)
      .select(col("anchor_id"), col("j").cast("long").as("j"),
        col("__poolId").as("neg_id"))
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995, the
    * merge/purge blocking method): rows are totally ordered by
    * (`sortCol`, `idCol`) and every pair at most `window` positions apart
    * is emitted as `(left_id, right_id, left_key, right_key, gap)` (left =
    * lower rank). The complement of the hash/LSH blockers: neighbors in a
    * domain sort key (length, normalized title, zip code) become
    * candidates even when they share no token or shingle. Chain with an
    * exact verifier ([[ngramJaccardPairs]]-style) downstream.
    *
    * Scale shape: the global rank comes from the packers' hierarchical
    * prefix scan (range partition + per-partition window + a one-row-per-
    * partition driver prefix — no single global-sort task); pair
    * generation is a `window`-way explode plus an EQUI-join on rank, so
    * the output is exactly n·window bounded with no range-join fallback.
    */
  def sortedNeighborPairs(
      df: DataFrame,
      idCol: String,
      sortCol: String,
      window: Int = 3
  ): DataFrame = {
    require(window >= 1, "window must be >= 1")
    // ranked feeds both join legs; persist so the rank window runs once
    // (globalRank's internal checkpoint already cut the scan lineage)
    val ranked = Pack.globalRank(
      df.select(col(idCol).as("__id"), col(sortCol).as("__k")),
      Seq(col("__k"), col("__id"))).persist()
    val probes = ranked.select(
      col("__id").as("left_id"), col("__k").as("left_key"),
      col("__rank"),
      explode(sequence(lit(1), lit(window))).as("gap"))
      .select(col("left_id"), col("left_key"),
        (col("__rank") + col("gap")).as("__tr"), col("gap").cast("long").as("gap"))
    val targets = ranked.select(
      col("__id").as("right_id"), col("__k").as("right_key"),
      col("__rank").as("__tr"))
    probes.join(targets, Seq("__tr"))
      .select(col("left_id"), col("right_id"),
        col("left_key"), col("right_key"), col("gap"))
  }

  /** Shared candidate-generation + exact-verification core of the n-gram
    * pair operators: returns (left_id, right_id, __inter, __nl, __nr) for
    * every unordered pair sharing ≥ 1 rare shingle that survives `prune`
    * (an upper-bound test on (Imax, nl, nr) — must be monotone in the true
    * intersection so pruning never loses a qualifying pair).
    */
  private def ngramPairStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      maxDocFreq: Int,
      prune: (Column, Column, Column) => Column
  ): DataFrame = {
    // Every consumer below tests shingle IDENTITY only (df grouping, set
    // sizes, intersection joins) — never the text — so shingles are
    // replaced by their xxhash64 at the source: the persisted cache and
    // every corpus-sized exchange (the by-shingle grouping and the two
    // verify joins) carry 8-byte keys instead of shingle strings. Same
    // ~n²/2⁶⁵ collision probability as in [[minHashPairs]] step 5 (and
    // the same round-15 decade-4 scale wall), but a DIFFERENT failure
    // mode: here the hashed keys also drive CANDIDATE GENERATION, so a
    // cross-shingle collision merges two shingles' id lists — which can
    // push a genuinely rare shared shingle past maxDocFreq and silently
    // lose a qualifying pair (a false-NEGATIVE channel the exact
    // verification below cannot recover, because the pair never becomes
    // a candidate), or conjure a spurious candidate (harmless — exact
    // verification removes it). In minHashPairs only the verify count is
    // affected. The sf1 large-cardinality gate covers this join shape.
    val sh = shingleRows(df, idCol, textCol, shingleSize)
      .select(col("__id"), xxhash64(col("__sh")).as("__sh"))
      .persist()
    // Candidate pairs share ≥ 1 rare shingle (doc frequency ≤ maxDocFreq):
    // group ids per shingle in ONE aggregation and explode pairs in place
    // (≤ C(maxDocFreq, 2) per shingle) — no self-join. Counting a pair's
    // occurrences across shingles gives its rare-intersection size. Because
    // the doc-frequency cap can hide shared-but-frequent shingles from the
    // intersection, survivors are re-verified exactly below.
    val grouped = sh
      .groupBy(col("__sh"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .persist()
    val candidates = pairsFromBuckets(
      grouped.filter(size(col("__ids")).between(2, maxDocFreq)),
      "__ids"
    ).groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("__rareInter"))
    // Prune before the expensive intersection join with an upper bound on
    // the achievable intersection: a shared shingle is either rare (df in
    // [2, maxDocFreq] — counted exactly by __rareInter), or frequent (df >
    // maxDocFreq — at most min of the docs' frequent-shingle counts __f);
    // df = 1 shingles can never be shared. The caller's `prune` tests its
    // similarity bound at intersection = Imax.
    val freqCounts = grouped
      .filter(size(col("__ids")) > maxDocFreq)
      .select(explode(col("__ids")).as("__id"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__f"))
    val stats = sh
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"))
      .join(freqCounts, Seq("__id"), "left")
      .na.fill(0L, Seq("__f"))
    val sized = candidates
      .join(
        stats.select(col("__id").as("left_id"), col("__n").as("__nl"),
          col("__f").as("__fl")), "left_id")
      .join(
        stats.select(col("__id").as("right_id"), col("__n").as("__nr"),
          col("__f").as("__fr")), "right_id")
      .withColumn("__imax", col("__rareInter") + least(col("__fl"), col("__fr")))
      .filter(prune(col("__imax"), col("__nl"), col("__nr")))
      .drop("__imax", "__fl", "__fr")
    // exact verification on the (small) candidate set, over ALL shingles:
    // equi-join on (id, shingle) so shared-shingle count = join cardinality
    sized
      .join(sh.select(col("__id").as("left_id"), col("__sh")), "left_id")
      .join(sh.select(col("__id").as("right_id"), col("__sh")), Seq("right_id", "__sh"))
      .groupBy(col("left_id"), col("right_id"), col("__nl"), col("__nr"))
      .agg(count(lit(1)).as("__inter"))
  }

  /** Exact duplicated-span detection (the substring-dedup pass of
    * large-scale training pipelines, after Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): every n-token span whose
    * lowercased token sequence occurs more than once ANYWHERE in the corpus
    * (another document or a repeat within the same one) is marked, and
    * overlapping/adjacent marked spans are merged per document. Returns
    * (idCol, span_start, span_end) in token indices, 0-based inclusive.
    *
    * Scale shape: shingles are column expressions (no per-token row
    * explosion until posexplode of the n-gram array), the duplicate test is
    * ONE map-side-combined count per distinct shingle text, and marking is
    * a left-semi join (1:1, no fan-out — a boilerplate span occurring in a
    * million documents inflates nothing). The merge window partitions by
    * document and its input is only each doc's marked positions. Exact and
    * engine-independent — no hashing in the dedup decision, so the output
    * oracles bit-for-bit.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8
  ): DataFrame = {
    require(n >= 1, "span length must be >= 1")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))
    // sequence(a, b) DESCENDS when b < a — guard short documents to an
    // empty position list instead
    val positions = when(size(col("__t")) >= n,
      sequence(lit(0), size(col("__t")) - n)
    ).otherwise(array().cast("array<int>"))
    val grams = df
      .select(col(idCol).as("__id"), toks.as("__t"))
      .select(
        col("__id"),
        explode(transform(positions,
          i => struct(i.as("pos"),
            concat_ws(" ", slice(col("__t"), i + 1, lit(n))).as("s")))).as("__g"))
      .select(col("__id"), col("__g.pos").as("__pos"), col("__g.s").as("__s"))
    // one count window over the gram key instead of a count aggregate +
    // semi-join: the gram table is exploded and shuffled ONCE (measured
    // ~2x at sf0.1 — the agg+join shape re-explodes the corpus and
    // shuffles gram volume twice). WindowExec's partition buffer spills
    // via ExternalAppendOnlyUnsafeRowArray, so a pathologically hot gram
    // degrades to disk, not OOM; gram groups are near-unique in real
    // corpora.
    val wDup = Window.partitionBy(col("__s"))
    val marked = grams
      .withColumn("__c", count(lit(1)).over(wDup))
      .filter(col("__c") > 1)
      .drop("__c")
    // gaps-and-islands merge: spans are all length n, positions sorted, so
    // two marks coalesce iff the later start is within n of the earlier
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    marked
      .withColumn("__brk",
        when(col("__pos") <= lag(col("__pos"), 1).over(w) + n, 0).otherwise(1))
      .withColumn("__isl", sum(col("__brk")).over(
        Window.partitionBy(col("__id")).orderBy(col("__pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__isl"))
      .agg(min(col("__pos")).as("span_start"),
        (max(col("__pos")) + n - 1).as("span_end"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Benchmark decontamination (the GPT-3 appendix-C discipline): corpus
    * documents sharing at least one word n-gram — lowercased, whitespace
    * tokenization, the same normalization as [[minHashPairs]] — with any
    * text in `benchmark` are contaminated and must be dropped from training
    * data, or eval scores on that benchmark are inflated.
    *
    * Returns the contaminated ids (one column, `idCol`). Scale shape: the
    * benchmark gram set is one distinct-aggregation of the (small) benchmark
    * corpus; corpus grams are a narrow flatMap feeding a semi-join on the
    * gram string (broadcast when the benchmark side is small, shuffled
    * otherwise — either way no skew: gram keys are near-unique) and a
    * distinct over the flagged ids. Documents shorter than n tokens can
    * never be flagged.
    */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13
  ): DataFrame = {
    val benchGrams = shingleRows(
      benchmark.select(lit(0L).as("__bid"), col(benchTextCol)),
      "__bid", benchTextCol, n
    ).select(col("__sh")).distinct()
    shingleRows(corpus, idCol, textCol, n)
      .join(benchGrams, Seq("__sh"), "left_semi")
      .select(col("__id").as(idCol))
      .distinct()
  }

  /** [[contaminatedIds]]' complement: the corpus with every contaminated
    * document removed (null-safe anti-join on the id).
    */
  def dropContaminated(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13
  ): DataFrame = {
    val flagged = contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n)
    corpus.join(flagged, corpus(idCol) <=> flagged(idCol), "left_anti")
  }

  /** Remove every duplicated n-token span from each document: the
    * complement of [[duplicatedSpans]] applied to the token stream, then
    * reassembled (tokens outside any marked span, in order). The dedup
    * DECISION is case-folded (duplicatedSpans lowercases), but reassembly
    * keeps the ORIGINAL-case tokens — whitespace tokenization is
    * case-independent, so span indices over the lowercased stream align
    * 1:1 with the original tokens. Documents with no duplicated spans pass
    * through with whitespace-normalized, case-preserved text.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      out: String = "clean_text"
  ): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    df.select(col(idCol), toks.as("__t"))
      .join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          filter(
            transform(col("__t"),
              (t, i) => when(
                col("__spans").isNull ||
                  !exists(col("__spans"),
                    s => i >= s("span_start") && i <= s("span_end")),
                t).otherwise(lit(null))),
            t => t.isNotNull)).as(out))
  }

  /** Incremental ingestion dedup: the batch ids whose shingle set
    * duplicates SOME document already in `corpus` — exactly (equal
    * lowercased word-shingle sets: case/whitespace/duplication-invariant
    * copies) or fuzzily (exact Jaccard ≥ `jaccardThreshold`, candidates
    * from a cross-table MinHash-LSH band join). Unlike
    * [[contaminatedIdsFuzzy]] (whose benchmark side broadcasts), BOTH
    * sides here can be arbitrarily large: the band join shuffles on the
    * (band, bandHash) key with oversized buckets counted first and
    * dropped per side (the [[boundedBuckets]] discipline, drops
    * observable), and equal-set copies can NEVER be lost to that cap —
    * they are caught by a separate equi-join on a sorted-shingle-set hash
    * (one near-unique-key join), so recall for set-identical copies is
    * exactly 1 at any threshold. Documents with fewer than `shingleSize`
    * tokens have no shingles and are never flagged.
    *
    * Scale shape: one shingle pass + one signature aggregation + one
    * set-hash aggregation per side; the corpus-side artifacts depend only
    * on the corpus, so a standing ingestion pipeline can persist them as
    * an index and pay only the batch side per increment.
    */
  def duplicateOfCorpusIds(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      corpus: DataFrame,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val bSh = shingleRows(batch.select(col(idCol), col(textCol)), idCol,
      textCol, shingleSize).persist()
    val cSh = shingleRows(corpus.select(col(idCol), col(textCol)), idCol,
      textCol, shingleSize).persist()
    // "\n" separator: tokens are \s+-split so neither tokens nor the
    // space-joined shingles can contain a newline — no separator collision
    def setHash(sh: DataFrame): DataFrame = sh
      .groupBy(col("__id"))
      .agg(md5(concat_ws("\n", sort_array(collect_list(col("__sh"))))).as("__seth"))
    val exactHits = setHash(bSh)
      .join(setHash(cSh).select(col("__seth")).distinct(), Seq("__seth"), "left_semi")
      .select(col("__id"))
    def bounded(b: DataFrame): DataFrame = b.join(
      broadcast(oversizedBucketKeys(b, Seq("__band", "__bh"), maxBucketSize)
        .select(col("__band"), col("__bh"))),
      Seq("__band", "__bh"), "left_anti")
    val candidates = bounded(bandedSignatures(bSh, numHashes, bands))
      .join(
        bounded(bandedSignatures(cSh, numHashes, bands))
          .select(col("__id").as("__cid"), col("__band"), col("__bh")),
        Seq("__band", "__bh"))
      .select(col("__id"), col("__cid"))
      .distinct()
    val bSizes = bSh.groupBy(col("__id")).agg(count(lit(1)).as("__nb"))
    val cSizes = cSh.groupBy(col("__id")).agg(count(lit(1)).as("__ncs"))
      .select(col("__id").as("__cid"), col("__ncs"))
    val lshHits = candidates
      .join(bSh, Seq("__id"))
      .join(cSh.select(col("__id").as("__cid"), col("__sh")), Seq("__cid", "__sh"))
      .groupBy(col("__id"), col("__cid"))
      .agg(count(lit(1)).as("__i"))
      .join(bSizes, Seq("__id"))
      .join(cSizes, Seq("__cid"))
      .filter(
        col("__i").cast("double") / (col("__nb") + col("__ncs") - col("__i"))
          >= jaccardThreshold)
      .select(col("__id"))
    exactHits.union(lshHits).distinct().select(col("__id").as(idCol))
  }

  /** [[duplicateOfCorpusIds]]' complement — the ingestion admit step: the
    * batch minus every document already present in the corpus (null-safe
    * anti-join on the id). Intra-batch duplicates are NOT collapsed here;
    * compose with [[exactByFingerprint]] / [[dropNearDuplicates]] on the
    * admitted batch for that.
    */
  def dedupNewBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      corpus: DataFrame,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    val flagged = duplicateOfCorpusIds(batch, idCol, textCol, corpus,
      shingleSize, numHashes, bands, jaccardThreshold, maxBucketSize)
    batch.join(flagged, batch(idCol) <=> flagged(idCol), "left_anti")
  }

  /** Corpus-wide paragraph-level dedup (the discipline CCNet applies to
    * CommonCrawl — Wenzek et al. 2020 — and the reference has no analog
    * for): every paragraph whose normalized form (lowercased, whitespace
    * collapsed) occurs elsewhere in the corpus is kept ONLY at its first
    * occurrence — the lexicographically smallest `(idCol, position)` —
    * and removed everywhere else, including repeats inside one document.
    * Documents are then reassembled from their surviving paragraphs in
    * order, joined by blank lines; a document whose every paragraph was
    * deduplicated away comes back with empty `out` (the row is kept, so a
    * caller can drop or count the fully-gutted documents).
    *
    * Paragraph = a `\n{2,}`-separated block; whitespace-only blocks
    * (leading/trailing separators, or interior blocks that contain only
    * spaces) are structure, not content: they are excluded from dedup and
    * dropped from the reassembly, which joins surviving paragraphs with
    * exactly one blank line.
    *
    * Scale shape: first-occurrence selection is a map-side-combinable
    * `min(struct(id, pos))` per normalized paragraph — a viral paragraph's
    * class collapses to one candidate per input partition before the
    * shuffle — and the keep decision is a semi-join of paragraphs against
    * that (near-unique) first-occurrence set on `(norm, id, pos)`, so no
    * reducer ever materializes a hot paragraph's full class. The only
    * window-free reassembly is a per-document `collect_list` bounded by
    * document length.
    */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      out: String = "clean_text"
  ): DataFrame = {
    val paras = df
      .select(
        col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n{2,}")).as(Seq("__pos", "__par")))
      .withColumn(
        "__norm",
        regexp_replace(lower(trim(col("__par"))), "\\s+", " "))
      .filter(col("__norm") =!= "")
    val firsts = paras
      .groupBy(col("__norm"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
      .select(
        col("__norm"),
        col("__first.__id").as("__id"),
        col("__first.__pos").as("__pos"))
    val kept = paras.join(firsts, Seq("__norm", "__id", "__pos"), "left_semi")
    val rebuilt = kept
      .groupBy(col("__id"))
      .agg(
        concat_ws(
          "\n\n",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__par")))),
            s => s.getField("__par"))).as(out))
    df.join(
        rebuilt.select(col("__id").as(idCol), col(out)),
        Seq(idCol), "left")
      .withColumn(out, coalesce(col(out), lit("")))
  }
}
