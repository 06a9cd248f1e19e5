package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  ): DataFrame = {
    val c = col(textCol)
    val tokenScore = least(size(tokens(c)).cast("double") / lit(100.0), lit(1.0))
    val alphaRatio = when(length(c) === 0, lit(0.0)).otherwise(
      least(
        length(regexp_replace(c, "[^a-zA-Z ]", "")).cast("double") / length(c),
        lit(1.0)
      )
    )
    df.withColumn(out, tokenScore * 0.5 + alphaRatio * 0.5)
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
}
