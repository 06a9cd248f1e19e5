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
}
