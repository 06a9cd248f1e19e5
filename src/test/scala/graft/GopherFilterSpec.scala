package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.Row

class GopherFilterSpec extends SharedSpark {

  private def signals(text: String): Row =
    TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, text))), "id", "text",
      // tight thresholds so short hand-written docs can pass rule 1/7
      minWords = 3, minStopHits = 1).head()

  private val pass =
    "the quick brown fox jumps over the lazy dog near the riverbank today"

  test("a plain prose document passes every rule") {
    val r = signals(pass)
    assert(r.getAs[Long]("n_words") === 13L)
    assert(r.getAs[Boolean]("gopher_ok"))
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(r.getAs[Double]("bullet_frac") === 0.0)
    assert(r.getAs[Double]("alpha_frac") === 1.0)
  }

  test("word-count bounds (rule 1) fail short and enormous documents") {
    assert(!signals("too few").getAs[Boolean]("gopher_ok"))
    val long = Seq.fill(50)("the word mill keeps on turning").mkString(" ")
    val r = TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, long))), "id", "text",
      minWords = 3, maxWords = 100, minStopHits = 1).head()
    assert(r.getAs[Long]("n_words") === 300L)
    assert(!r.getAs[Boolean]("gopher_ok"))
  }

  test("mean word length bounds (rule 2)") {
    val short = signals("a b c d e f g h i j k l the") // mean ≈ 1.2
    assert(short.getAs[Double]("mean_word_len") < 3.0)
    assert(!short.getAs[Boolean]("gopher_ok"))
    val lng = signals("extraordinarily incomprehensible the characteristically")
    assert(lng.getAs[Double]("mean_word_len") > 10.0)
    assert(!lng.getAs[Boolean]("gopher_ok"))
  }

  test("symbol-to-word ratio (rule 3) counts #, ... and … per word") {
    val r = signals("the #tag and more... text … here #x ## now")
    // symbols: 4 hashes + 1 "..." + 1 "…" = 6 over 10 words
    assert(r.getAs[Double]("symbol_ratio") === 0.6)
    assert(!r.getAs[Boolean]("gopher_ok"))
  }

  test("bullet and ellipsis line fractions (rules 4-5)") {
    // attached bullets so the marker token still contains letters (a
    // detached "-" token would fail the alpha-fraction rule instead)
    val bullets = signals(
      "-the first item of all\n-the second item here\n-third\n-fourth\n" +
        "the plain prose line")
    assert(bullets.getAs[Double]("bullet_frac") === 0.8)
    assert(bullets.getAs[Boolean]("gopher_ok")) // 0.8 <= 0.9 passes
    val ell = signals("the story begins...\nit continues…\nand ends here")
    assert(ell.getAs[Double]("ellipsis_frac") === 2.0 / 3.0)
    assert(!ell.getAs[Boolean]("gopher_ok"))
  }

  test("alpha-word fraction (rule 6)") {
    val r = signals("the 123 456 789 000 111 222 333 444 word")
    assert(r.getAs[Double]("alpha_frac") === 0.2)
    assert(!r.getAs[Boolean]("gopher_ok"))
  }

  test("stop-word hits (rule 7) are case-insensitive presence, not counts") {
    val r = TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING",
        Seq(Row(1L, "The wall THE wall the wall paint dries quick"))),
      "id", "text", minWords = 3).head()
    assert(r.getAs[Long]("stop_hits") === 1L) // "the" once, however many times
    assert(!r.getAs[Boolean]("gopher_ok"))    // needs 2 distinct stop words
    val two = TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING",
        Seq(Row(1L, "the paint with some water dries quick today"))),
      "id", "text", minWords = 3).head()
    assert(two.getAs[Long]("stop_hits") === 2L)
    assert(two.getAs[Boolean]("gopher_ok"))
  }

  test("empty and whitespace-only documents fail closed with 0.0 signals") {
    for (t <- Seq("", "   ", "\n\n")) {
      val r = signals(t)
      assert(r.getAs[Long]("n_words") === 0L)
      assert(r.getAs[Double]("mean_word_len") === 0.0)
      assert(r.getAs[Double]("alpha_frac") === 0.0)
      assert(!r.getAs[Boolean]("gopher_ok"))
    }
  }

  test("plan contract: shuffle-free projection over a column-pruned scan") {
    // the gate must fuse into the corpus scan — a shuffle or an unpruned
    // scan here would be paid on every row of a 100 TB corpus. A parquet
    // scan, not a local relation: local literal inputs get
    // constant-folded into a LocalTableScan and prove nothing. (No
    // WholeStageCodegen assertion: array higher-order functions are
    // interpreted in Spark — the contract is plan SHAPE, one narrow
    // projection, nothing else.)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    // only the two consumed columns reach the reader, not all five
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan.linesIterator.toSeq.lastOption.getOrElse("").take(400))
  }

  test("paper defaults: 50-word floor and 2 stop words") {
    val doc = (Seq.fill(12)("the water flows and that is fine with everyone")
      ).mkString(" ") // 108 words, mean len ~4, 4 stop words present
    val r = TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, doc))), "id", "text").head()
    assert(r.getAs[Long]("n_words") === 108L)
    assert(r.getAs[Long]("stop_hits") === 4L) // the, and, that, with
    assert(r.getAs[Boolean]("gopher_ok"))
  }

  // ---------------------------------------------------------------------
  // Fuzz block (the NormalizeUrlExprSpec discipline): every signal is
  // re-derived by a straightforward plain-Scala reformulation of the
  // documented rules and compared EXACTLY (the ratios are quotients of
  // exact integers, so doubles must match bit-for-bit). The reformulation
  // mirrors the column formulation's published semantics, which a naive
  // java.lang.String port gets wrong in three places:
  //   - length() counts CODE POINTS (String.length counts UTF-16 units,
  //     splitting every beyond-BMP char in two);
  //   - trim() strips ' ' (0x20) ONLY (String.trim strips all <= 0x20,
  //     eating \r from CRLF line ends — so "x...\r" is NOT an ellipsis
  //     line and "\tx" keeps its tab);
  //   - split keeps trailing empty strings (String.split drops them).
  // ---------------------------------------------------------------------

  /** Independent plain-Scala re-derivation of the 7 Gopher signals. */
  private object Ref {
    private def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    private def trimSp(s: String): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j)
    }
    private def splitKeepTrailing(s: String, sep: String): Seq[String] =
      s.split(sep, -1).toSeq
    private def occ(t: String, needle: String, width: Int): Double =
      (cp(t) - cp(t.replace(needle, ""))).toDouble / width
    private val bulletRe = java.util.regex.Pattern.compile("^[-*•]")
    private val ellipsisRe = java.util.regex.Pattern.compile("(\\.\\.\\.|…)$")
    private val alphaRe = java.util.regex.Pattern.compile("[A-Za-z]")

    def signals(t: String): (Long, Double, Double, Double, Double, Double, Long) = {
      val words = splitKeepTrailing(trimSp(t), "[ \\t\\n\\f\\r]+")
        .filter(_.nonEmpty)
      val nWords = words.size.toLong
      val meanLen =
        if (nWords == 0) 0.0
        else words.map(cp).sum.toDouble / nWords.toDouble
      val symbols = occ(t, "#", 1) + occ(t, "...", 3) + occ(t, "…", 1)
      val symbolRatio = if (nWords == 0) 0.0 else symbols / nWords.toDouble
      val lines = splitKeepTrailing(t, "\n").map(trimSp)
      val nLines = lines.size.toLong
      val bulletFrac =
        lines.count(l => bulletRe.matcher(l).find()).toDouble / nLines
      val ellipsisFrac =
        lines.count(l => ellipsisRe.matcher(l).find()).toDouble / nLines
      val alphaFrac =
        if (nWords == 0) 0.0
        else words.count(w => alphaRe.matcher(w).find()).toDouble / nWords
      val lowered = words.map(_.toLowerCase)
      val stopHits =
        TextAnalysis.GopherStopWords.count(lowered.contains).toLong
      (nWords, meanLen, symbolRatio, bulletFrac, ellipsisFrac, alphaFrac,
        stopHits)
    }
  }

  private def assertParity(docs: Seq[String]): Unit = {
    val rows = TextAnalysis.gopherFilter(
      df("id BIGINT, text STRING",
        docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      "id", "text").collect()
    assert(rows.length === docs.size)
    for (r <- rows) {
      val t = docs(r.getAs[Long]("id").toInt)
      val (nw, ml, sr, bf, ef, af, sh) = Ref.signals(t)
      val tag = t.take(60).replace("\n", "\\n")
      assert(r.getAs[Long]("n_words") === nw, s"n_words on <$tag>")
      assert(r.getAs[Double]("mean_word_len") === ml, s"mean_word_len on <$tag>")
      assert(r.getAs[Double]("symbol_ratio") === sr, s"symbol_ratio on <$tag>")
      assert(r.getAs[Double]("bullet_frac") === bf, s"bullet_frac on <$tag>")
      assert(r.getAs[Double]("ellipsis_frac") === ef, s"ellipsis_frac on <$tag>")
      assert(r.getAs[Double]("alpha_frac") === af, s"alpha_frac on <$tag>")
      assert(r.getAs[Long]("stop_hits") === sh, s"stop_hits on <$tag>")
    }
  }

  test("fuzz: adversarial unicode, whitespace and glyph corners") {
    assertParity(Seq(
      // combining marks: 'e' + U+0301 is 2 code points, é precomposed is 1
      "café and the crème with brûlée that",
      // zero-width space / joiner / BOM are NOT in the whitespace class:
      // they glue words together and count toward word length
      "the​zero‍width﻿glued and that be with",
      // CJK no-space text: one enormous "word" with no ASCII letter
      "的是了在我有和就不人" * 40,
      // beyond-BMP (surrogate pairs): 𝒜 is 1 code point, 2 UTF-16 units
      "𝒜𝒝 and the 𝒵 that be",
      // CRLF: split is on \n alone and trim strips ' ' only, so the \r
      // survives — "x...\r" must NOT count as an ellipsis line
      "the first line...\r\nthe second line\r\n- bullet\r",
      // tabs/newlines inside: word split includes \t\n\f\r, trim does not
      "\tthe\tand\fthat\rbe\nwith ",
      // vertical tab \x0B is NOT whitespace here: it glues two words
      "the andthat be with",
      // bullet glyph edges: •/-/* match; −(U+2212) ‣ · must NOT
      "• bullet\n- dash\n* star\n− minus\n‣ tri\n· dot\nplain the and",
      // ellipsis edges: "....", ". . .", "…" + trailing space, ".." and
      // lone "." — only true ... / … suffixes (post-trim) count
      "ends....\nends ...\nends .. \nends . . .\nends … \nends .\nthe and",
      // '#' inside words, '...' spanning a '…', interleaved symbols
      "C# and F# the ....... x…y.z.. that #hash#tag be",
      // empty / single char / only separators
      "", " ", "\n", "#", "…", "the", "\n\n\n")) }

  test("fuzz: 500 pseudo-random adversarial documents") {
    val rng = new scala.util.Random(0x60b8e5L)
    val atoms = Array(
      "the", "and", "that", "be", "with", "of", "to", "have",
      "word", "x", "C#", "...", "…", "•", "-", "*", "−",
      "的是了", "𝒜", "é", "​", "﻿",
      " ", "  ", "\t", "\n", "\r\n", "\f", "", ".", "..",
      "....", ". ", "#", "##", "a" * 40, "lòng")
    val docs = (1 to 500).map { _ =>
      val n = rng.nextInt(120)
      (1 to n).map(_ => atoms(rng.nextInt(atoms.length))).mkString
    }
    assertParity(docs)
  }

  test("fuzz: a 10MB single-line document stays exact") {
    // ~10 MB of text on ONE line: stresses the per-row array machinery
    // (1.4M words, one lines entry) without overflowing anything; also
    // plants beyond-BMP chars and symbols so every signal is non-trivial
    val unit = "the quick brown fox and that with... 𝒜# "
    val doc = unit * 262144 // 42 ASCII-ish chars -> ~10.5 MB, no newline
    assert(doc.length > 10 * 1024 * 1024)
    assertParity(Seq(doc))
  }
}
