package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup-to-text extraction — the stage of a web-corpus pipeline that
  * turns crawled HTML into trainable text (C4 / CCNet / RefinedWeb all
  * open with it): strip script/style/tags, decode entities, pull the
  * title and outbound links, then apply C4's line-level boilerplate
  * rules (Raffel et al. 2020, §2.2) before content-level dedup.
  *
  * Scale notes. Everything here is a pure column-expression chain over
  * `org.apache.spark.sql.functions` (regexp_replace / regexp_extract /
  * split / filter / array ops) — zero UDFs, zero shuffles of its own, so
  * extraction fuses into the scan stage and costs one pass over the
  * corpus at any scale. The regex chains (stripHtml/extractTitle) run
  * inside whole-stage codegen; [[boilerplateFilter]]'s line lambdas are
  * Catalyst higher-order functions, which Spark evaluates interpreted
  * (outside codegen) but still as the same narrow per-row projection. Link extraction's only
  * explode is line-local (bounded by hrefs-per-page), and the domain
  * rollup shuffles one (domain, count) pair per partition after the
  * map-side partial aggregate. Regexes stay inside the Java∩RE2 common
  * subset (no lookaround, no backreferences) so the DuckDB oracle can
  * replay them literally; whitespace classes are spelled out as
  * `[ \t\n\f\r]` rather than `\s` because the engines disagree on the
  * one remaining character — Java's `\s` includes `\x0B` (vertical tab)
  * while RE2's does not — and crawled text can contain it.
  */
object Extraction {

  /** Visible text of an HTML fragment:
    *
    *   1. `<script>…</script>` and `<style>…</style>` blocks removed
    *      (case-insensitive, dot-matches-newline)
    *   2. `<!-- … -->` comments removed
    *   3. remaining tags replaced by a space (so `a</p><p>b` keeps its
    *      word boundary)
    *   4. the five named entities that dominate crawled text decoded —
    *      `&lt; &gt; &quot; &#39; &nbsp;` — then `&amp;` LAST, the
    *      standard order that keeps `&amp;lt;` literal
    *   5. whitespace collapsed to single spaces, ends trimmed
    */
  def stripHtml(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // explicit class, not \s: Java would also collapse \x0B, RE2 would not
    trim(regexp_replace(decodeEntities(noTags), "[ \\t\\n\\f\\r]+", " "))
  }

  /** The five named entities that dominate crawled text, decoded in the
    * standard order — `&amp;` LAST, so `&amp;lt;` stays literal
    * `&lt;`. Shared by [[stripHtml]] and [[extractLinks]] (attribute
    * values entity-encode `&` as `&amp;`). */
  def decodeEntities(c: Column): Column =
    Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(c) { case (acc, (ent, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(ent),
        java.util.regex.Matcher.quoteReplacement(ch))
    }

  /** Contents of the first `<title>` element, entity-decoded and
    * whitespace-collapsed; "" when the document has none. */
  def extractTitle(html: Column): Column =
    stripHtml(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** One row per double-quoted `href` attribute value, entity-decoded:
    * (idCol, link). The explode is bounded by links-per-page, so output
    * scales with the corpus's edge count — this is the edge list a link
    * graph ([[Graph]] PageRank, [[UrlOps.hostAggregate]]) starts from.
    * Pages with no links emit nothing; relative links come out as-is
    * (downstream [[UrlOps.normalizeUrl]] maps them to NULL, the reject
    * lane).
    */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(
      col(idCol),
      explode(regexp_extract_all(col(htmlCol),
        lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))).as("__raw"))
      .select(col(idCol), decodeEntities(col("__raw")).as("link"))

  /** C4's line-level boilerplate rules over a newline-separated text
    * column (Raffel et al. 2020 §2.2). A line SURVIVES when, after
    * trimming, it
    *
    *   - ends in a terminal punctuation mark (`. ! ? "`),
    *   - has at least `minWords` whitespace-separated words (the paper's
    *     5-word line rule), and
    *   - does not mention "javascript" (case-insensitive) — the classic
    *     enable-JS boilerplate marker.
    *
    * Emits idCol, `clean_text` (surviving lines re-joined with \n),
    * `n_lines` / `n_kept`, and `page_ok`: false when the PAGE trips a
    * whole-document rule — fewer than `minLines` surviving lines
    * (standing in for the paper's 3-*sentence* page rule: lines are the
    * unit this operator sees, so a multi-sentence line counts once), a
    * curly brace anywhere (code), or "lorem ipsum" (filler). Callers
    * filter on `page_ok` to drop pages; the flags are kept so the
    * drop is auditable. Pure per-row expressions — no shuffle.
    */
  def boilerplateFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 5,
      minLines: Int = 3): DataFrame = {
    require(minWords >= 1 && minLines >= 1)
    // staged projection: `kept` is consumed three times below, and
    // interpreted projections (the line lambdas are HOFs) re-evaluate a
    // repeated subexpression per consumer — bind the arrays once
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "[ \\t\\n\\f\\r]+")) >= minWords &&
        !lower(l).contains("javascript"))
    df.select(col(idCol), col(textCol),
        lines.as("__c4_lines"), kept.as("__c4_kept"))
      .select(
        col(idCol),
        array_join(col("__c4_kept"), "\n").as("clean_text"),
        size(col("__c4_lines")).cast("long").as("n_lines"),
        size(col("__c4_kept")).cast("long").as("n_kept"),
        (size(col("__c4_kept")) >= minLines &&
          !col(textCol).contains("{") &&
          !lower(col(textCol)).contains("lorem ipsum")).as("page_ok"))
  }
}
