package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines. All are
  * single-pass narrow transformations (no shuffle): pure Catalyst
  * expressions, codegen-friendly, scale linearly with input size.
  */
object TextAnalysis {

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(
      df: DataFrame,
      textCol: String,
      out: String = "n_tokens"
  ): DataFrame =
    df.withColumn(out, size(tokens(col(textCol))).cast("long"))

  /** BPE-ish subword count estimate: whitespace tokens plus extra units for
    * long words and digit/punctuation runs (a cheap, deterministic proxy for
    * tokenizer cost accounting).
    */
  def subwordCountEstimate(
      df: DataFrame,
      textCol: String,
      out: String = "n_subwords"
  ): DataFrame = {
    val c = col(textCol)
    // every ~4 characters of a word ≈ one subword; punctuation counts alone
    val wordChars = length(regexp_replace(c, "\\s+", ""))
    val punct = length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", ""))
    df.withColumn(out, (ceil(wordChars / lit(4.0)) + punct).cast("long"))
  }

  /** Canonical document fingerprint: md5 of whitespace-normalized lowercase
    * text. Two documents share a fingerprint iff they are equal modulo
    * whitespace/case.
    */
  def fingerprint(
      df: DataFrame,
      textCol: String,
      out: String = "fingerprint"
  ): DataFrame =
    df.withColumn(
      out,
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
    )

  /** Heuristic quality score in [0,1]:
    * 0.5·min(tokens/100, 1) + 0.5·(alpha+space chars / length).
    */
  def qualityScore(
      df: DataFrame,
      textCol: String,
      out: String = "quality"
  ): DataFrame =
    df.withColumn(out, qualityCol(col(textCol)))

  private[ops] def qualityCol(c: Column): Column = {
    val tokenScore = least(size(tokens(c)).cast("double") / lit(100.0), lit(1.0))
    val alphaRatio = when(length(c) === 0, lit(0.0)).otherwise(
      least(
        length(regexp_replace(c, "[^a-zA-Z ]", "")).cast("double") / length(c),
        lit(1.0)
      )
    )
    tokenScore * 0.5 + alphaRatio * 0.5
  }

  /** Gopher's "must contain two of" stop words (Rae et al. 2021, A1.1). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher's document-level quality rules (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A1.1) over a plain-text column — the standard web-corpus
    * quality gate alongside C4's line rules
    * ([[Extraction.boilerplateFilter]]). Pairs with [[repetitionSignals]],
    * which implements the paper's A1.2 repetition rules — together they
    * are the full Gopher document gate. Emits the per-document signals
    * plus `gopher_ok`, true when the document passes ALL rules:
    *
    *   1. `n_words` in [minWords, maxWords]              (paper: 50..100,000)
    *   2. `mean_word_len` in [minMeanLen, maxMeanLen]    (paper: 3..10)
    *   3. `symbol_ratio` ≤ maxSymbolRatio — `#` and `...`/`…` occurrences
    *      per word                                       (paper: 0.1)
    *   4. `bullet_frac` ≤ maxBulletFrac — lines starting `-` `*` `•`
    *                                                     (paper: 0.90)
    *   5. `ellipsis_frac` ≤ maxEllipsisFrac — lines ending `...`/`…`
    *                                                     (paper: 0.30)
    *   6. `alpha_frac` ≥ minAlphaFrac — words with ≥1 ASCII letter
    *                                                     (paper: 0.80)
    *   7. `stop_hits` ≥ minStopHits of [[GopherStopWords]] (paper: 2)
    *
    * The signals are kept so every drop is auditable (same shape as the
    * C4 filter's page flags). Pure per-row column expressions — one
    * narrow projection fused onto the (column-pruned) scan, zero
    * shuffles, one pass per row at any corpus size. The array lambdas
    * evaluate as interpreted Catalyst higher-order functions (Spark HOFs
    * don't participate in whole-stage codegen), which costs per-row eval
    * overhead but never changes the plan shape — pinned by the spec's
    * plan contract. Whitespace is the explicit `[ \t\n\f\r]` class and the
    * alphabetic test is ASCII `[A-Za-z]` so a SQL oracle replays
    * byte-for-byte (Java and RE2 disagree on `\s`'s `\x0B` and on
    * `\p{L}`); for non-Latin corpora gate per-language upstream
    * ([[languageId]]) and pass language-specific thresholds. All ratios
    * are quotients of exact integers, so the rule comparisons are
    * IEEE-identical across engines; 0-word documents emit 0.0 ratios and
    * fail rule 1.
    */
  def gopherFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords, "word bounds")
    // Staged projections (the repetitionSignals pattern): interpreted
    // projections do NOT share common subexpressions, so binding `words`
    // and `lines` to their own aliases makes each array compute ONCE per
    // row instead of once per signal (Catalyst keeps the stages separate
    // because CollapseProject never re-inlines a non-cheap alias consumed
    // more than once). Measured 1.5x on the whole op at 200k docs.
    val t = col(textCol)
    val staged = df.select(
      col(idCol), t.as("__g_t"),
      filter(split(trim(t), "[ \\t\\n\\f\\r]+"), w => w =!= "").as("__g_w"),
      // split() never returns an empty array, so nLines >= 1 always
      transform(split(t, "\n"), l => trim(l)).as("__g_l"))
    val tc = col("__g_t")
    val words = col("__g_w")
    val lines = col("__g_l")
    val nWords = size(words).cast("long")
    val meanLen = when(nWords === 0, lit(0.0)).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        nWords.cast("double"))
    def occurrences(needle: String, width: Int): Column =
      (length(tc) - length(replace(tc, lit(needle), lit("")))) / lit(width)
    val symbols =
      occurrences("#", 1) + occurrences("...", 3) + occurrences("…", 1)
    val symbolRatio = when(nWords === 0, lit(0.0))
      .otherwise(symbols.cast("double") / nWords.cast("double"))
    val nLines = size(lines).cast("long")
    val bulletFrac =
      size(filter(lines, l => l.rlike("^[-*•]"))).cast("double") /
        nLines.cast("double")
    val ellipsisFrac =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") /
        nLines.cast("double")
    val alphaFrac = when(nWords === 0, lit(0.0)).otherwise(
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        nWords.cast("double"))
    val lowered = transform(words, w => lower(w))
    val stopHits = GopherStopWords
      .map(w => array_contains(lowered, w).cast("long"))
      .reduce(_ + _)
    // second stage: each signal expression computes once, then the public
    // columns and gopher_ok read the signal ALIASES
    val signals = staged.select(
      col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"))
    signals.select(
      col(idCol),
      col("n_words"), col("mean_word_len"), col("symbol_ratio"),
      col("bullet_frac"), col("ellipsis_frac"), col("alpha_frac"),
      col("stop_hits"),
      (col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("stop_hits") >= minStopHits).as("gopher_ok"))
  }

  /** Stopword lists for the language-ID heuristic (top function words). */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人")
  )

  /** N-gram/stopword language ID: picks the language with the most stopword
    * hits among whitespace tokens; deterministic tie-break by language code;
    * "und" (undetermined) when no stopword matches.
    */
  def languageId(
      df: DataFrame,
      textCol: String,
      out: String = "lang_pred"
  ): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    // score per language, tie-broken by reverse-alphabetical code so the
    // greatest() over (score, code) structs picks the alphabetically-first
    // language among equals.
    val scored = stopwords.map { case (lang, words) =>
      val score = size(array_intersect(toks, array(words.map(lit): _*)))
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // greatest over structs compares score first, then lang (string order).
    // To make ties resolve to the first list entry, iterate with when():
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }
    df.withColumn(
      out,
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    )
  }

  /** PII redaction for training corpora: emails, IPv4 addresses, then
    * phone-like digit runs are replaced with fixed tokens, in that order
    * (order matters — a phone pattern could otherwise eat into an IP). The
    * patterns are deliberately RE2-safe (no backtracking constructs), so the
    * same regexes run identically under Java regex (Spark, codegen'd
    * regexp_replace) and RE2 (DuckDB oracle).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // phone shapes need >= 10 digits (optional country code + 3-3-4), so ISO
  // dates (8 digits) and dotted versions never match
  val PhonePattern =
    "(?:\\+?\\d{1,2}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b"

  def redactPii(
      df: DataFrame,
      textCol: String,
      out: String = "redacted"
  ): DataFrame =
    df.withColumn(
      out,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>"))

  /** Non-empty whitespace-trimmed tokens (case preserved — repetition is
    * case-sensitive, unlike the fingerprint/jaccard normalizations).
    */
  private def cleanTokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  /** Word n-grams joined by single spaces; empty array when the document has
    * fewer than n tokens (guarded — `sequence(0, -1)` would count DOWN).
    */
  private def wordGrams(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*))
    ).otherwise(array().cast("array<string>"))

  /** Max over all distinct grams of occurrences × gram length, computed as a
    * single run-length pass over the sorted gram array — O(d log d) per
    * document instead of the O(d²) count-each-distinct formulation.
    */
  private def topRunCover(grams: Column): Column = {
    val init = struct(
      lit(null).cast("string").as("prev"),
      lit(0L).as("run"),
      lit(0L).as("best"))
    aggregate(
      array_sort(grams),
      init,
      (acc, x) => {
        val same = acc.getField("prev") <=> x
        val run = when(same, acc.getField("run") + 1).otherwise(lit(1L))
        struct(
          x.as("prev"),
          run.as("run"),
          greatest(acc.getField("best"), run * length(x).cast("long")).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Sum over distinct grams occurring ≥ 2 times of occurrences × gram
    * length (total characters inside repeated grams, occurrences counted
    * with multiplicity). Same sorted-run pass as [[topRunCover]]: a run
    * reaching length 2 contributes both its rows at once, each further
    * repeat adds one gram length.
    */
  private def dupRunChars(grams: Column): Column = {
    val init = struct(
      lit(null).cast("string").as("prev"),
      lit(0L).as("run"),
      lit(0L).as("acc"))
    aggregate(
      array_sort(grams),
      init,
      (acc, x) => {
        val same = acc.getField("prev") <=> x
        val run = when(same, acc.getField("run") + 1).otherwise(lit(1L))
        val add = when(same && acc.getField("run") === 1, length(x).cast("long") * 2)
          .when(same, length(x).cast("long"))
          .otherwise(lit(0L))
        struct(
          x.as("prev"),
          run.as("run"),
          (acc.getField("acc") + add).as("acc"))
      },
      acc => acc.getField("acc"))
  }

  /** Intra-document repetition signals in the style of the Gopher quality
    * filters (Rae et al. 2021, "Scaling Language Models", table A1):
    * documents dominated by repeated lines or n-grams are low-quality
    * training data. Adds five double columns:
    *
    *   - `rep_dup_line_frac`      fraction of non-empty lines that are
    *     repeats of an earlier line
    *   - `rep_dup_line_char_frac` fraction of line characters inside those
    *     repeated lines
    *   - `rep_top2_char_frac`     characters covered by the single most
    *     repeated word 2-gram / total token characters
    *   - `rep_top3_char_frac`     same for 3-grams
    *   - `rep_dup5_char_frac`     characters inside ALL word 5-grams that
    *     occur more than once
    *
    * Gram occurrences are counted with multiplicity and overlap (the doc
    * "a a a a" has three occurrences of "a a"), so every gram score —
    * including top2/top3 — can exceed 1 on degenerate repetition: they are
    * repetition scores, not coverage measures. The line fractions are
    * always in [0, 1].
    *
    * All five are pure per-row array computations (no shuffle, no UDF):
    * grams are ranked by one run-length pass over the sorted gram array, so
    * the per-document cost is O(d log d) in token count — safe for
    * arbitrarily large corpora and bounded by the longest single document.
    */
  def repetitionSignals(
      df: DataFrame,
      textCol: String
  ): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val toks = cleanTokens(text)
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    def charLen(arr: Column): Column =
      aggregate(arr, lit(0L), (a, x) => a + length(x).cast("long"))
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    val out = df
      .withColumn("__toks", toks)
      .withColumn("__lines", lines)
      // total token characters as laid out in grams: token lengths plus one
      // joiner space between adjacent tokens
      .withColumn("__nchars",
        charLen(col("__toks")) + greatest(size(col("__toks")).cast("long") - 1, lit(0L)))
    out
      .withColumn("rep_dup_line_frac",
        frac(size(col("__lines")) - size(array_distinct(col("__lines"))), size(col("__lines"))))
      .withColumn("rep_dup_line_char_frac",
        frac(charLen(col("__lines")) - charLen(array_distinct(col("__lines"))), charLen(col("__lines"))))
      .withColumn("rep_top2_char_frac",
        frac(topRunCover(wordGrams(col("__toks"), 2)), col("__nchars")))
      .withColumn("rep_top3_char_frac",
        frac(topRunCover(wordGrams(col("__toks"), 3)), col("__nchars")))
      .withColumn("rep_dup5_char_frac",
        frac(dupRunChars(wordGrams(col("__toks"), 5)), col("__nchars")))
      .drop("__toks", "__lines", "__nchars")
  }

  /** Corpus-trained bigram language-model quality score — the cheap,
    * self-contained analog of CCNet's perplexity filter (Wenzek et al.
    * 2020): train add-one-smoothed bigram counts on the corpus itself, then
    * score each document by its mean per-bigram log-probability
    *
    *   score(d) = (1/|d|) · Σ_i ln( (c(wᵢ₋₁wᵢ) + 1) / (c(wᵢ₋₁·) + V) )
    *
    * over lowercased whitespace tokens, where c(wᵢ₋₁·) counts wᵢ₋₁'s
    * occurrences as a bigram context and V is corpus vocabulary size.
    * Documents far below the corpus mean are gibberish/boilerplate
    * candidates; documents with fewer than two tokens get a null score.
    *
    * Determinism: the per-document sum folds the per-bigram terms in token
    * order (an `aggregate` over the position-sorted collected array), not
    * in whatever order the aggregation delivers rows — so an external
    * replica that sums in the same order reproduces the double bit-for-bit
    * up to its own ln() rounding (≤1 ulp per term).
    *
    * Scale shape: the bigram count table is one map-side-combinable
    * aggregation and the context counts roll up from IT (not from another
    * pass over the exploded corpus); the vocabulary size is a 1-row
    * broadcast; the model
    * (term per distinct bigram) is assembled counts-to-counts BEFORE
    * touching per-occurrence rows, so the only big join is occurrences →
    * model on the bigram key — near-unique build side, probe-side key skew
    * (stopword pairs) handled by AQE skew-join, no group ever materializes
    * a hot bigram's occurrence list. The final per-document collect is
    * bounded by document length.
    */
  /** Per-group corpus statistics — the data-card rollup a curation run
    * reports: document count, token and character totals, exact-duplicate
    * count (documents whose whitespace/case fingerprint occurs more than
    * once ANYWHERE in the corpus — the class is global, the count
    * per-group), and mean quality score.
    *
    * Quality is reported twice: `mean_quality` (double, convenient) and
    * `sum_quality_ppm` (the exact integer sum of per-document quality in
    * parts-per-million). The ppm sum is ORDER-FREE — float means differ in
    * the last ulp with aggregation order, which an external replica cannot
    * reproduce when the true mean sits on a rounding boundary; the integer
    * path rounds per document (deterministic in any engine) and sums
    * exactly.
    *
    * Scale shape: one fingerprint-class count (map-side combinable,
    * near-unique md5 keys) joined back on each row's own fingerprint, then
    * a single per-group aggregation. No windows, no skew: the fingerprint
    * join's build side is the aggregated class table.
    */
  /** Corpus composition report — the input to epoch-mix design: one row
    * per `groupCol` value with document and size counts, exact ppm shares,
    * and the group's Shannon-entropy contribution −p·ln(p) in ppm (sum the
    * column for the corpus mix entropy in nats·1e6). Shares are single
    * divisions of exact integers and the one `ln` is rounded per group
    * (the [[bm25TopK]] ppm discipline; group counts are few, so rounding
    * boundaries stay far away), making the report engine-replayable.
    * Shape: one map-side-combinable aggregation plus a 1-row broadcast.
    */
  def corpusComposition(
      df: DataFrame,
      groupCol: String,
      sizeCol: String
  ): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("n_size"))
    val tot = g.agg(sum(col("n_docs")).as("__td"), sum(col("n_size")).as("__ts"))
    val p = col("n_docs").cast("double") / col("__td").cast("double")
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("n_size"),
        round(lit(1000000.0) * col("n_docs").cast("double") /
          col("__td").cast("double"), 0).cast("long").as("doc_share_ppm"),
        round(lit(1000000.0) * col("n_size").cast("double") /
          col("__ts").cast("double"), 0).cast("long").as("size_share_ppm"),
        round(lit(-1000000.0) * p * log(p), 0).cast("long")
          .as("doc_entropy_term_ppm"))
  }

  def corpusStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val fp = fingerprint(df, textCol, "__fp")
    val classes = fp.groupBy(col("__fp")).agg(count(lit(1)).as("__cls"))
    fp.join(classes, fp("__fp") <=> classes("__fp"))
      .drop("__fp")
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum(when(col("__cls") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        avg(qualityCol(col(textCol))).as("mean_quality"),
        sum(round(qualityCol(col(textCol)) * 1000000, 0).cast("long"))
          .as("sum_quality_ppm"))
  }

  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      out: String = "lm_score"
  ): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")
    val base = df.select(col(idCol).as("__id"), toks.as("__t"))
    val bigrams = base
      .filter(size(col("__t")) >= 2)
      .select(
        col("__id"),
        posexplode(transform(
          sequence(lit(0), size(col("__t")) - 2),
          i => struct(
            element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2")))).as(Seq("__pos", "__bg")))
      .select(
        col("__id"), col("__pos"),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    val c2 = bigrams.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c2"))
    // context counts roll up from the aggregated bigram table — NOT from a
    // second pass over the exploded corpus: c(w·) = Σ_w2 c(w,w2)
    val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val vocab = base
      .select(explode(col("__t")).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    // counts-to-counts first: the per-bigram term is a function of the
    // bigram alone, so compute it once per DISTINCT bigram…
    val model = c2
      .join(c1, Seq("__w1"))
      .crossJoin(broadcast(vocab))
      .select(
        col("__w1"), col("__w2"),
        (log((col("__c2") + 1).cast("double")) -
          log((col("__c1") + col("__v")).cast("double"))).as("__term"))
    // …and only then join the per-occurrence rows against it
    val scores = bigrams
      .join(model, Seq("__w1", "__w2"))
      .groupBy(col("__id"))
      .agg(
        (aggregate(
          array_sort(collect_list(struct(col("__pos"), col("__term")))),
          lit(0.0),
          (a, x) => a + x.getField("__term")) / count(lit(1))).as(out))
    df.join(scores.select(col("__id").as(idCol), col(out)), Seq(idCol), "left")
  }

  /** Blocklist gate (the C4 banned-word discipline): drop documents
    * whose lowercased whitespace tokens intersect `words`. A narrow
    * per-row filter — the blocklist rides the closure as a literal
    * array, no join, no shuffle; pair with [[blocklistReport]] so the
    * removals stay observable.
    */
  def dropBlocklisted(
      df: DataFrame,
      textCol: String,
      words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "blocklist must be non-empty")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= "")
    val bad = array(words.map(w => lit(w.toLowerCase)): _*)
    df.filter(col(textCol).isNull ||
      size(array_intersect(toks, bad)) === 0)
  }

  /** Drops-observable companion of [[dropBlocklisted]]: per blocklist
    * word, how many documents it matches and how many tokens it
    * accounts for — the evidence table for tuning a banned-word list
    * (overly broad words surface immediately). One narrow explode of
    * matching tokens only, one |words|-sized aggregate; words with no
    * matches are emitted at zero. */
  def blocklistReport(
      df: DataFrame,
      textCol: String,
      words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "blocklist must be non-empty")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= "")
    val bad = array(words.map(w => lit(w.toLowerCase)): _*)
    val matches = df
      .filter(col(textCol).isNotNull)
      .select(explode(array_intersect(toks, bad)).as("word"),
        toks.as("__t"))
      .select(col("word"),
        size(filter(col("__t"), t => t === col("word")))
          .cast("long").as("__n"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
    val all = df.sparkSession.createDataFrame(
      words.map(w => Tuple1(w.toLowerCase)).distinct).toDF("word")
    all.join(matches, Seq("word"), "left")
      .select(col("word"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** PMI collocations: adjacent-bigram pointwise mutual information over
    * the whole corpus — the classic collocation-extraction statistic
    * (Church & Hanks 1990), used in curation to find boilerplate phrases
    * and template artifacts that per-document signals miss.
    *
    * pmi = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p(w1,w2) from adjacent
    * bigram counts (N2 total bigrams) and p(w) from unigram counts (N1
    * total tokens). Output (w1, w2, pair_n, n_w1, n_w2, pmi_ppm) for
    * pairs with pair_n >= minPairCount.
    *
    * Scale: counts-to-counts throughout — bigram and unigram tables are
    * aggregated before any join, the two corpus totals ride broadcast
    * cross joins, and the per-distinct-pair PMI is one codegen'd
    * expression. The ppm quantization is hash-stable across engines
    * provided values keep a guard band from rounding boundaries (a 1-ulp
    * `ln` difference moves the ppm value by ~1e-9); the suite pins the
    * band on the entry fixture, as with BM25.
    */
  def collocations(
      df: DataFrame,
      textCol: String,
      minPairCount: Long = 5L
  ): DataFrame = {
    val toks =
      filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")
    val base = df.select(toks.as("__t"))
    val bigrams = base
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("__t")) - 2),
        i => struct(
          element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    // persisted: the bigram-count table is read twice (total + filtered
    // join) and the unigram table three times (total + both word joins)
    // — uncached, every extra read re-tokenizes the corpus
    val c2 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))
      .persist()
    val uni = base.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
      .persist()
    val n1 = uni.agg(sum(col("__cu")).as("n1"))
    val n2 = c2.agg(sum(col("pair_n")).as("n2"))
    c2.filter(col("pair_n") >= minPairCount)
      .join(uni.select(col("__w").as("w1"), col("__cu").as("n_w1")),
        Seq("w1"))
      .join(uni.select(col("__w").as("w2"), col("__cu").as("n_w2")),
        Seq("w2"))
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select(col("w1"), col("w2"), col("pair_n"), col("n_w1"),
        col("n_w2"),
        round(lit(1000000.0) * log(
          (col("pair_n").cast("double") / col("n2"))
            / (col("n_w1").cast("double") / col("n1")
              * (col("n_w2").cast("double") / col("n1")))))
          .cast("long").as("pmi_ppm"))
  }

  /** Split documents into fixed-size whitespace-token chunks with overlap
    * — the context-window packing precursor (and the RAG indexing shape):
    * chunk i covers tokens `[i·stride, i·stride + maxTokens)` with
    * `stride = maxTokens − overlap`, and the chunk count is
    * `1 + ⌈max(0, n − maxTokens) / stride⌉` so the final token is always
    * covered and no chunk starts beyond the text. Original token case and
    * order are preserved; chunks are rejoined with single spaces (interior
    * whitespace runs are normalized). Token-less documents produce no
    * chunks.
    *
    * Emits (idCol, chunk_id, chunk_text, n_tokens). Pure narrow per-row
    * expressions (split → sequence → slice → array_join): no shuffle, and
    * the explode fan-out is bounded by each document's own length.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val base = df
      .select(col(idCol), cleanTokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
    // integer chunk count: both engines replay (g + stride − 1) div stride
    // exactly (the double division of small ints is exact, floor recovers
    // the integer quotient)
    val extra = greatest(lit(0), col("__n") - lit(maxTokens))
    val numChunks =
      (lit(1) + floor((extra + lit(stride - 1)) / lit(stride))).cast("int")
    base
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), numChunks - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(
          slice(col("__t"), col("chunk_id") * stride + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        size(slice(col("__t"), col("chunk_id") * stride + 1, lit(maxTokens)))
          .cast("long").as("n_tokens"))
  }

  /** Okapi BM25 top-k retrieval: for each query (a row of `queries` with an
    * id and free-text terms), the k highest-scoring documents under
    *
    *   score(q,d) = Σ_{t ∈ q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    *                · tf_{t,d}(k1+1) / (tf_{t,d} + k1(1 − b + b·dl_d/avgdl))
    *
    * over lowercased alphanumeric tokens (duplicate query terms count
    * once). Returns (queryIdCol, idCol, score_ppm, rank): scores are
    * reported as the exact integer sum of per-term contributions rounded
    * to parts-per-million — per-term rounding is engine-deterministic and
    * integer sums are order-free, so ranking on (score_ppm desc, id asc)
    * is reproducible bit-for-bit by any external replica (same discipline
    * as [[corpusStats]]'s quality totals).
    *
    * Scale shape: the postings table (one map-side-combinable aggregation
    * over the exploded corpus) is cut to the query vocabulary by a
    * broadcast join BEFORE document frequencies are counted (df per term
    * is unchanged by the cut), so nothing global is computed over
    * non-query terms; corpus size and total length ride a 1-row broadcast.
    * Top-k is the plain `row_number() <= k` filter: Spark plans it as a
    * Partial WindowGroupLimit before the exchange (each task forwards at
    * most k rows per query) plus a Final one after, so no single task
    * ever sorts a query's full candidate set — the two-phase top-k is the
    * optimizer's job, not hand-rolled sharding.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String = "query_id",
      queryTextCol: String = "query_text",
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val tok: Column => Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    val base = docs.select(col(idCol).as("__id"), tok(col(textCol)).as("__t"))
    val lens = base.select(col("__id"), size(col("__t")).cast("long").as("__dl"))
    val stats = lens.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val postings = base
      .select(col("__id"), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("__term"))
      .groupBy(col("__id"), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val qt = queries
      .select(col(queryIdCol).as("__qid"),
        explode(tok(col(queryTextCol))).as("__term"))
      .distinct()
    val relevant = postings
      .join(broadcast(qt.select(col("__term")).distinct()), Seq("__term"))
    val dfs = relevant.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    // association mirrors the documented formula exactly — an external SQL
    // replica with the same parenthesization reproduces each double
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df") + lit(0.5)) /
        (col("__df") + lit(0.5)))
    val weight = (col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / avgdl))
    val scored = relevant
      .join(broadcast(dfs), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col("__term"), col("__id"),
        round(lit(1000000.0) * idf * weight, 0).cast("long").as("__ppm"))
    val scores = scored
      .join(broadcast(qt), Seq("__term"))
      .groupBy(col("__qid"), col("__id"))
      .agg(sum(col("__ppm")).as("score_ppm"))
    val wFinal = Window
      .partitionBy(col("__qid"))
      .orderBy(col("score_ppm").desc, col("__id").asc)
    scores
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("__qid").as(queryIdCol), col("__id").as(idCol),
        col("score_ppm"), col("rank"))
  }

  /** TF-IDF keyword extraction: the `k` highest-scoring terms of each
    * document under the smoothed formula
    *
    *   score(t,d) = tf_{t,d} · (ln((N + 1)/(df_t + 1)) + 1)
    *
    * over the same lowercased alphanumeric tokens as [[bm25TopK]]. Returns
    * (idCol, term, tf, doc_freq, score_ppm, rank): the score is rounded to
    * integer parts-per-million once per (doc, term) — the [[bm25TopK]]
    * discipline — so ranking on (score_ppm desc, term asc) replays
    * bit-for-bit in any engine whose `ln` agrees within the rounding guard
    * band (score_ppm is positive because df_t ≤ N keeps the ln ≥ 0).
    *
    * Scale shape: term frequencies are one map-side-combinable aggregation
    * over the exploded corpus; document frequencies are a second
    * aggregation OF THAT RESULT (rows = distinct (doc, term), never
    * re-reading the corpus), joined back on the term key — vocabulary-sized,
    * so a shuffle join, not a broadcast; N rides a 1-row broadcast. Top-k
    * is `row_number() <= k`, planned as Partial + Final WindowGroupLimit:
    * each task forwards at most k rows per document before the exchange.
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tok: Column => Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    val base = df.select(col(idCol).as("__id"), tok(col(textCol)).as("__t"))
    val n = base.agg(count(lit(1)).as("__n"))
    // tf feeds both the doc-frequency aggregate and the score join —
    // persist it so the corpus is tokenized once, not twice
    val tf = base
      .select(col("__id"), explode(col("__t")).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val scored = tf
      .join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("__id"), col("term"), col("tf"), col("doc_freq"),
        round(lit(1000000.0) * col("tf") *
            (log((col("__n").cast("double") + lit(1.0)) /
              (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0)), 0)
          .cast("long").as("score_ppm"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score_ppm").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("term"), col("tf"),
        col("doc_freq"), col("score_ppm"), col("rank"))
  }

  /** Hashed-linear text classifier inference (the fastText / Vowpal-Wabbit
    * "hashing trick" shape): each lowercase whitespace token maps to one of
    * `dim` buckets by the engine-portable SHA-256-prefix hash, the bucket's
    * weight is looked up, and the document's score is the integer sum of
    * its tokens' weights (plus `bias`) with `label = score > 0`.
    *
    * The weight table here is a deterministic pseudorandom stand-in — the
    * bucket id is re-hashed with `weightSalt` and mapped to an integer in
    * [−range, range] — because a real trained model cannot ship in this
    * library; swapping it for learned weights is a broadcast-join on
    * `bucket` against a (bucket, weight) table, and nothing else changes.
    * Integer weights make the score EXACT: no float summation, so any
    * engine with SHA-256 replays score and label bit-for-bit.
    *
    * Scale shape: one narrow map — tokenize, per-token hash chain, and an
    * in-row `aggregate` fold, all native Catalyst builtins (the HOF fold
    * evaluates interpreted, outside whole-stage codegen); no explode,
    * no shuffle, output rows = input rows. Per-row cost is O(tokens ·
    * sha256); for throughput-critical paths reduce `dim` cost by
    * pre-hashing a vocabulary table and broadcast-joining instead.
    */
  def scoreHashedLinear(
      df: DataFrame,
      textCol: String,
      dim: Int = 4096,
      range: Int = 1000,
      bucketSalt: Long = 3L,
      weightSalt: Long = 7L,
      bias: Long = 0L,
      out: String = "score"
  ): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(range > 0, "range must be positive")
    val toks = filter(
      split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")
    // per-token weight: token → bucket (hash mod dim) → weight (re-hash of
    // the bucket id, mod 2·range+1, shifted to [−range, range]); both
    // hashes are the Dedup.portableHash 60-bit SHA-256 prefix, so the
    // whole chain is replayable in any engine with SHA-256
    val weightOf: Column => Column = t => {
      val bucket = pmod(Dedup.portableHash(t, bucketSalt), lit(dim.toLong))
      pmod(Dedup.portableHash(bucket, weightSalt), lit(2L * range + 1)) -
        lit(range.toLong)
    }
    df.withColumn(out,
        aggregate(toks, lit(bias), (acc, t) => acc + weightOf(t)))
      .withColumn(s"${out}_label", col(out) > 0)
  }

  /** Top-`topV` token vocabulary with corpus coverage — the tokenizer-
    * training precursor: `(rank, token, n_occ, n_docs, cum_frac)` where
    * `cum_frac` is the fraction of all token occurrences covered by ranks
    * `1..rank`. Tokens are lowercased whitespace tokens (the same contract
    * as [[tokenCount]]); rank ties break lexicographically so the listing
    * is fully deterministic.
    *
    * Scale shape: explode is narrow; the term-frequency aggregation is the
    * one real shuffle (map-side combinable — partial counts per partition,
    * so the shuffle carries distinct-tokens-per-partition rows, not token
    * occurrences); the top-V cut is `TakeOrderedAndProject` (per-partition
    * heap + driver merge of V-row heads, never a global sort); the ranking
    * window then runs over only V rows, so its single-partition frame is
    * bounded by the parameter, not the data. The corpus total rides along
    * as a broadcast scalar.
    */
  def vocabulary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topV: Int
  ): DataFrame = {
    require(topV >= 1 && topV <= 10000000, s"topV out of range: $topV")
    val toks = df
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val tf = toks
      .groupBy("token")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(idCol)).as("n_docs"))
    val total = tf.agg(sum("n_occ").as("__total"))
    val ord = Seq(col("n_occ").desc, col("token").asc)
    val w = Window.orderBy(ord: _*)
    tf.orderBy(ord: _*)
      .limit(topV)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_frac",
        sum("n_occ")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total").cast("double"))
      .select("rank", "token", "n_occ", "n_docs", "cum_frac")
  }

  /** Per-document n-gram novelty: the share of each document's distinct
    * word n-grams that occur in NO other document —
    * `(idCol, n_grams, novel_grams, novelty)`, novelty null for documents
    * shorter than n tokens. A high score marks content the corpus has not
    * seen elsewhere (diversity weighting, dedup triage); a near-zero
    * score marks boilerplate reassembled from common phrases.
    *
    * Shape: distinct grams explode per doc (bounded by doc length), one
    * shuffle builds the corpus gram→doc-frequency table, one shuffle
    * aggregates back per doc — the inverted-index pattern of [[bm25TopK]];
    * no pairwise comparisons anywhere, so cost is linear in corpus grams.
    */
  def ngramNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // typed-flatMap shingle explosion (Dedup.shingleRows): same semantics
    // as the expression variant, ~5× faster on long texts
    val grams = Dedup.shingleRows(df, idCol, textCol, n)
      .withColumnRenamed("__id", idCol)
      .withColumnRenamed("__sh", "__gram")
    val dfreq = grams.groupBy("__gram").agg(count(lit(1)).as("__df"))
    val perDoc = grams
      .join(dfreq, "__gram")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("novel_grams"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        round(col("novel_grams").cast("double") / col("n_grams"), 6)
          .as("novelty"))
  }
}
