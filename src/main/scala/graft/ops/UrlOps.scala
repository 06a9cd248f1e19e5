package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host-level curation over web-style corpora.
  *
  * Web-scale training-data pipelines (C4, CCNet, RefinedWeb) begin with
  * URL hygiene: canonicalize each document's URL, drop exact re-crawls of
  * the same canonical URL, and roll quality statistics up to the
  * registrable domain so whole hosts can be kept or dropped as a unit.
  * These are the Spark-native versions of that stage.
  *
  * Scale notes. Every function here is a native expression with no UDFs
  * and no shuffles of its own. [[normalizeUrl]] is ONE codegen'd
  * expression ([[graft.plans.NormalizeUrlExpr]]) doing one regex match
  * per row — the previous column formulation paid 7 matches of the same
  * pattern plus an interpreted higher-order parameter filter, because
  * interpreted projections share no subexpressions. The rest are
  * regexp/split/concat column chains inside whole-stage codegen.
  * The only shuffles are the ones the caller's groupBy/dedup
  * semantics require (one hash exchange on the canonical key), so the
  * stage costs exactly one pass over the corpus at any scale.
  */
object UrlOps {

  /** One regex, RFC-3986-shaped, shared by every extractor. Capture
    * groups: 1 scheme, 2 userinfo, 3 host, 4 port, 5 path, 6 query
    * (fragment is matched but never captured). Unmatched optional groups
    * extract as "" in both Spark and DuckDB, which the normalizer relies
    * on.
    */
  private val UrlRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]+)(?::([0-9]+))?" +
      "([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  private def part(url: Column, group: Int): Column =
    regexp_extract(url, UrlRe, group)

  /** Lowercased host with any trailing dot stripped; "" for strings that
    * do not parse as absolute URLs. */
  def hostOf(url: Column): Column =
    regexp_replace(lower(part(url, 3)), "\\.$", "")

  /** Query-parameter prefixes/names that identify tracking rather than
    * content — dropped by [[normalizeUrl]]. Matches C4/CCNet practice of
    * treating utm_* and click identifiers as noise. */
  private val TrackingParam: Column => Column = p =>
    p.startsWith("utm_") || p.startsWith("gclid=") ||
      p.startsWith("fbclid=") || p.startsWith("msclkid=") ||
      p.startsWith("ref=") || (p === "")

  /** Canonical form of an absolute URL:
    *
    *   - scheme and host lowercased, trailing host dot stripped
    *   - userinfo and fragment dropped
    *   - default ports removed (http:80, https:443); others kept
    *   - empty path becomes "/"
    *   - tracking parameters (utm_*, gclid, fbclid, msclkid, ref)
    *     removed; surviving parameters sorted byte-lexicographically and
    *     re-joined, the "?" dropped when none survive
    *
    * Deterministic, idempotent (UrlOpsSpec pins both), and expressible
    * in ANSI SQL — the DuckDB oracle replays it exactly. Rows that do
    * not parse normalize to NULL so callers can route them to a reject
    * lane instead of silently keeping malformed keys.
    */
  def normalizeUrl(url: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.NormalizeUrlExpr(
        org.apache.spark.sql.graftshim.ColumnShim.expression(url)))

  /** The original column-expression formulation of [[normalizeUrl]] —
    * 7 `regexp_extract` matches plus a higher-order parameter filter per
    * row, which interpreted projections neither share nor codegen. Kept
    * (test-only) as the parity reference [[graft.plans.NormalizeUrlExpr]]
    * is pinned against; the public operator now evaluates one regex match
    * in one codegen'd kernel. */
  private[graft] def normalizeUrlColumns(url: Column): Column = {
    val scheme = lower(part(url, 1))
    val host = regexp_replace(lower(part(url, 3)), "\\.$", "")
    val port = part(url, 4)
    val path = part(url, 5)
    val query = part(url, 6)
    val keptPort = when(
      (port === "") ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val normPath = when(path === "", lit("/")).otherwise(path)
    val keptParams = array_join(
      array_sort(filter(split(query, "&"), p => !TrackingParam(p))), "&")
    val normQuery =
      when(keptParams === "", lit("")).otherwise(concat(lit("?"), keptParams))
    when(part(url, 1) === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, keptPort, normPath,
        normQuery))
  }

  /** Second-level public suffixes common enough to matter for grouping;
    * hosts ending in one keep three labels instead of two. A full public
    * suffix list is data the caller can join in; this covers the
    * high-traffic cases so host rollups don't collapse every *.co.uk
    * site into "co.uk". */
  private val TwoLevelSuffixes = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tw", "com.sg", "com.ar")

  /** Registrable domain (eTLD+1 heuristic) of a lowercase host: the last
    * two labels, or three when the host ends in a known two-level public
    * suffix; hosts with a single label (or "") pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val nLab = size(labels)
    val lastTwo = when(nLab >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(host)
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    val isTwoLevel = TwoLevelSuffixes
      .map(s => lastTwo === s)
      .reduce(_ || _)
    when(nLab >= 3 && isTwoLevel, lastThree).otherwise(lastTwo)
  }

  /** Keep exactly one row per canonical URL — the re-crawl/mirror dedup
    * that precedes content-level dedup in web pipelines. The keeper is
    * the row with the smallest `idCol` (deterministic; `idCol` must be
    * non-null and unique, as a document id is — rows with a NULL id are
    * dropped up front, since `min_by` skips NULL ordering keys and an
    * all-NULL-id group would otherwise surface as one all-NULL row).
    * Rows whose URL does not parse keep themselves (NULL canonical key
    * ⇒ keyed by their own id).
    *
    * `nullIds` selects what a NULL `idCol` means: `"drop"` (default) is
    * the documented silent drop above; `"fail"` makes a NULL id a hard
    * error raised inside the scan itself (`raise_error` in the id
    * projection — still one pass, no pre-count job), for callers who
    * want an upstream data problem to surface instead of vanishing.
    * `observeDrops` makes the `"drop"` path observable without a second
    * job: pass an [[org.apache.spark.sql.Observation]] and, after any
    * action on the result, `obs.get("null_id_rows_dropped")` reports how
    * many rows the null-id filter discarded. The observation node sits
    * between scan and filter (it must see the dropped rows to count
    * them), which blocks the not-null predicate from pushing into the
    * scan — opt-in, so the default plan is unchanged.
    *
    * Single pass, single shuffle: one hash exchange on the canonical
    * URL with a `min_by(struct(*), id)` aggregate, so the keeper row
    * rides the aggregation itself — no second scan of `df` and no
    * join back. The map-side partial aggregate bounds the exchange at
    * one candidate row per (canonical, partition).
    */
  def dedupByUrl(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      nullIds: String = "drop",
      observeDrops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(nullIds == "drop" || nullIds == "fail",
      s"dedupByUrl: nullIds must be 'drop' or 'fail' (got '$nullIds')")
    // internal names carry a graft-reserved prefix so a user column can't
    // collide; still guarded because the select-by-name below would
    // silently prefer the user's column if it did
    val (canonCol, keepCol) = ("__graft_url_canon", "__graft_url_keep")
    require(!df.columns.contains(canonCol) && !df.columns.contains(keepCol),
      s"dedupByUrl: input must not contain reserved columns $canonCol/$keepCol")
    val canon = coalesce(normalizeUrl(col(urlCol)),
      concat(lit("__unparsed__"), col(idCol).cast("string")))
    val outCols = df.columns
    val base =
      if (nullIds == "fail")
        df.withColumn(idCol,
          when(col(idCol).isNull, raise_error(lit(
            s"dedupByUrl: NULL value in id column '$idCol' (nullIds=fail)")))
            .otherwise(col(idCol)))
      else observeDrops
        .map(o => df.observe(o,
          coalesce(sum(when(col(idCol).isNull, 1L)), lit(0L))
            .as("null_id_rows_dropped")))
        .getOrElse(df)
        .filter(col(idCol).isNotNull)
    base
      .groupBy(canon.as(canonCol))
      .agg(min_by(struct(outCols.map(col).toIndexedSeq: _*), col(idCol))
        .as(keepCol))
      .select(outCols.map(c => col(keepCol).getField(c).as(c)).toIndexedSeq: _*)
  }

  /** Data-driven registrable domain (eTLD+1) against a caller-supplied
    * public-suffix table — the full-fidelity alternative to the
    * zero-dependency [[registrableDomain]] heuristic. `psl` has one row
    * per PSL rule, in the list's own syntax (no leading dot):
    *   - `"com"`, `"co.uk"`     — plain public-suffix rules;
    *   - `"*.ck"`               — wildcard: every `<label>.ck` is a
    *     public suffix (for host `a.foo.ck` the public suffix is
    *     `foo.ck`, so the registrable domain is `a.foo.ck`);
    *   - `"!www.ck"`            — exception: `www.ck` is NOT a public
    *     suffix despite `*.ck`; it is itself registrable.
    * The ~9.5k-rule list at publicsuffix.org is the usual source (the
    * bundled snapshot loads via [[loadPsl]]), but any policy table
    * works; plain-suffix tables behave as before. Matching is
    * case-insensitive (both sides lowercased; the returned domain is
    * lowercase).
    *
    * Prevailing-rule semantics per the PSL algorithm: an exception rule
    * beats everything (public suffix = the exception minus its leftmost
    * label); otherwise the longest matching rule wins, where a wildcard
    * `*.T` matches `<label>.T` only when that extra label exists; if no
    * rule matches, the implicit `*` rule makes the bare TLD the suffix.
    * The registrable domain is the public suffix plus one more host
    * label; a host that IS a public suffix yields NULL.
    *
    * Scale shape: NO explode and NO re-aggregation. Longest-match is a
    * chain of `maxSuffixLabels` broadcast hash joins (suffix tables are
    * tiny), one per candidate suffix length, each matching the host's
    * last-i-labels string against that length's rules; per-length rule
    * kinds (exact / wildcard-tail / exception) are pre-aggregated into
    * ONE key-unique row per match string, so a string that is both an
    * exact rule and a wildcard tail (`kawasaki.jp` under
    * `*.kawasaki.jp`) cannot duplicate corpus rows. Ascending order
    * means the last hit is the longest. The corpus side never shuffles —
    * the only exchanges are the rule table's own tiny aggregation and
    * its broadcasts — so the lookup fuses into whatever pass the caller
    * is already making.
    *
    * `maxSuffixLabels` bounds the rule length considered: exact and
    * exception rules of up to `maxSuffixLabels` labels, wildcard rules
    * of up to `maxSuffixLabels + 1` (their tails join at length − 1).
    * The default 5 covers the full public list (its deepest rules are
    * 5 labels).
    *
    * @return `df` with `outCol` appended (internal `__psl_*` columns are
    *         consumed internally and not emitted; the input must not
    *         already contain any `__psl_`-prefixed column — `withColumn`
    *         would silently replace and then drop it).
    */
  def registrableDomainPsl(
      df: DataFrame,
      hostCol: String,
      psl: DataFrame,
      suffixCol: String = "suffix",
      outCol: String = "domain",
      maxSuffixLabels: Int = 5): DataFrame = {
    require(maxSuffixLabels >= 1, "maxSuffixLabels must be >= 1")
    // same contract dedupByUrl enforces for its reserved names: refuse
    // rather than silently overwrite-and-drop a caller's column
    val pslClash = df.columns.filter(_.startsWith("__psl_"))
    require(pslClash.isEmpty,
      "registrableDomainPsl: input must not contain reserved __psl_* " +
        s"columns (found: ${pslClash.mkString(", ")})")
    // normalize + classify the rule table once; aggregate kind flags per
    // match string so every per-length join side is key-unique
    val raw = lower(trim(col(suffixCol)))
    val rules = psl
      .select(raw.as("__r"))
      .filter(col("__r") =!= "" && !col("__r").startsWith("//"))
      .select(
        when(col("__r").startsWith("!"), substring(col("__r"), 2, 1 << 20))
          .when(col("__r").startsWith("*."), substring(col("__r"), 3, 1 << 20))
          .otherwise(col("__r")).as("__s"),
        col("__r").startsWith("*.").as("__w0"),
        col("__r").startsWith("!").as("__x0"))
      .groupBy("__s")
      .agg(
        max(!col("__w0") && !col("__x0")).as("__e"),
        max(col("__w0")).as("__w"),
        max(col("__x0")).as("__x"))
      .withColumn("__n", size(split(col("__s"), "\\.")))
    val labs = split(lower(col(hostCol)), "\\.")
    val nl = size(col("__psl_labs"))
    val start = df.withColumn("__psl_labs", labs)
      .withColumn("__psl_len", lit(0))
      .withColumn("__psl_exc", lit(null).cast("int"))
    val joined = (1 to maxSuffixLabels).foldLeft(start) { (acc, i) =>
      // candidate suffix of exactly i labels: the host's last i labels
      val cand = when(nl >= i, array_join(slice(col("__psl_labs"), -i, i), "."))
      val side = broadcast(rules.filter(col("__n") === i).select(
        col("__s").as(s"__psl_s$i"), col("__e").as(s"__psl_e$i"),
        col("__w").as(s"__psl_w$i"), col("__x").as(s"__psl_x$i")))
      acc.withColumn(s"__psl_c$i", cand)
        .join(side, col(s"__psl_c$i") === col(s"__psl_s$i"), "left")
        // exact rule of i labels: match length i (monotone in i, so a
        // plain overwrite keeps the longest)
        .withColumn("__psl_len",
          when(col(s"__psl_e$i"), i).otherwise(col("__psl_len")))
        // wildcard tail of i labels: the suffix is tail + one more label,
        // which must actually exist on the host
        .withColumn("__psl_len",
          when(col(s"__psl_w$i") && nl >= i + 1, i + 1)
            .otherwise(col("__psl_len")))
        // exception rule: the matched domain is itself registrable, so
        // the effective public suffix is one label shorter; prevails
        // over every non-exception match
        .withColumn("__psl_exc",
          when(col(s"__psl_x$i"), i - 1).otherwise(col("__psl_exc")))
        .drop(s"__psl_c$i", s"__psl_s$i", s"__psl_e$i", s"__psl_w$i",
          s"__psl_x$i")
    }
    // exception prevails; no listed rule -> implicit "*": bare TLD
    val effLen = coalesce(col("__psl_exc"),
      when(col("__psl_len") === 0, 1).otherwise(col("__psl_len")))
    val domain = when(nl > effLen,
      array_join(slice(col("__psl_labs"), -(effLen + lit(1)), effLen + lit(1)),
        "."))
    joined.withColumn(outCol, domain)
      .drop("__psl_labs", "__psl_len", "__psl_exc")
  }

  /** The bundled snapshot of the Public Suffix List (publicsuffix.org,
    * MPL 2.0 — shipped verbatim at `graft/public_suffix_list.dat` on the
    * classpath, comments and provenance header included) as a one-column
    * `suffix` DataFrame of raw rules (`"com"`, `"*.ck"`, `"!www.ck"`)
    * ready for [[registrableDomainPsl]]. Comment/blank lines are dropped
    * at load. The table is ~9.5k rows — driver-side parse is trivial and
    * every consumer broadcasts it.
    */
  def loadPsl(
      spark: org.apache.spark.sql.SparkSession,
      resource: String = "graft/public_suffix_list.dat"): DataFrame = {
    val in = Thread.currentThread.getContextClassLoader
      .getResourceAsStream(resource)
    require(in != null, s"classpath resource not found: $resource")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toArray
      finally in.close()
    import spark.implicits._
    spark.createDataset(lines.toIndexedSeq).toDF("suffix")
  }

  /** Host-level curation rollup: per registrable domain, the page count,
    * distinct canonical URLs, and mean of a caller-supplied quality
    * column — the table a pipeline thresholds to drop entire hosts.
    * Single shuffle on the (low-cardinality) domain key; count_distinct
    * expands to a two-phase aggregate Spark handles without a second
    * full-data exchange.
    */
  def hostAggregate(
      df: DataFrame, urlCol: String, qualityCol: String): DataFrame =
    df.select(
      registrableDomain(hostOf(col(urlCol))).as("domain"),
      normalizeUrl(col(urlCol)).as("canon"),
      col(qualityCol).cast("double").as("q"))
      .filter(col("domain") =!= "")
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("canon")).as("n_urls"),
        avg(col("q")).as("mean_quality"))
}
