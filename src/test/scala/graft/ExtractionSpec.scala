package graft

import graft.ops.Extraction
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ExtractionSpec extends SharedSpark {

  private def strip(h: String): String =
    df("html STRING", Seq(Row(h)))
      .select(Extraction.stripHtml(col("html")).as("t"))
      .head().getString(0)

  test("stripHtml removes script/style blocks including their content") {
    assert(strip("a<script>var x = 1 < 2;</script>b") === "a b")
    assert(strip("a<SCRIPT type=\"x\">multi\nline</SCRIPT>b") === "a b")
    assert(strip("a<style>p { color: red }</style>b") === "a b")
  }

  test("stripHtml removes comments and tags, keeping word boundaries") {
    assert(strip("a<!-- hidden\nnote -->b") === "a b")
    assert(strip("one</p><p>two") === "one two")
    assert(strip("<div class=\"x\">inner</div>") === "inner")
  }

  test("stripHtml decodes entities with &amp; last") {
    assert(strip("x &lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;y &amp; z") ===
      "x <b> \"q\" 'a' y & z")
    // &amp;lt; decodes to literal &lt;, not <
    assert(strip("&amp;lt;") === "&lt;")
  }

  test("stripHtml collapses whitespace and is identity on plain prose") {
    assert(strip("  a \n\t b   c ") === "a b c")
    assert(strip("plain words stay put.") === "plain words stay put.")
  }

  test("extractTitle takes the first title, cleaned; empty when absent") {
    val rows = df("html STRING", Seq(
      Row("<html><title> A &amp; B </title><title>second</title></html>"),
      Row("<html><body>no title</body></html>")))
      .select(Extraction.extractTitle(col("html")).as("t"))
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("A & B", ""))
  }

  test("extractLinks emits decoded hrefs; no-link pages emit nothing") {
    val d = df("id BIGINT, html STRING", Seq(
      Row(1L, "<a href=\"https://a.com/x?p=1&amp;q=2\">x</a>" +
        "<a HREF=\"/rel\">y</a>"),
      Row(2L, "<p>nothing here</p>")))
    val out = Extraction.extractLinks(d, "id", "html")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((1L, "https://a.com/x?p=1&q=2"), (1L, "/rel")))
  }

  test("boilerplateFilter applies the C4 line rules") {
    val text = Seq(
      "A proper first sentence lives here.", // kept
      "menu",                                // too short, no punctuation
      "Please enable JavaScript to proceed.", // javascript marker
      "Is this a real question?",            // kept (exactly 5 words)
      "ends without punctuation at all",     // no terminal punctuation
      "A closing sentence rounds out the page." // kept
    ).mkString("\n")
    val out = Extraction.boilerplateFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, text))), "id", "text").head()
    assert(out.getAs[String]("clean_text") ===
      "A proper first sentence lives here.\nIs this a real question?" +
        "\nA closing sentence rounds out the page.")
    assert(out.getAs[Long]("n_lines") === 6L)
    assert(out.getAs[Long]("n_kept") === 3L)
    assert(out.getAs[Boolean]("page_ok"))
  }

  test("boilerplateFilter page rules: minLines, braces, lorem ipsum") {
    // three surviving lines satisfy the minLines=3 default, so rows 2/3
    // fail ONLY on their page-level rule (brace, lorem); row 4 is the
    // all-rules-pass control
    val good = "Good line number one stays put.\nGood line two stays put." +
      "\nGood line three stays put."
    val rows = df("id BIGINT, text STRING", Seq(
      Row(1L, "Only one good line survives here."),
      Row(2L, good + "\nvar f = () => { x }"),
      Row(3L, good + "\nLorem Ipsum dolor sit amet."),
      Row(4L, good)))
    val out = Extraction.boilerplateFilter(df = rows, idCol = "id",
      textCol = "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("page_ok")).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("boilerplateFilter respects minWords and minLines knobs") {
    val text = "Tiny line.\nAnother tiny line."
    val strictRow = Extraction.boilerplateFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, text))), "id", "text").head()
    assert(strictRow.getAs[Long]("n_kept") === 0L) // both lines < 5 words
    val lax = Extraction.boilerplateFilter(
      df("id BIGINT, text STRING", Seq(Row(1L, text))), "id", "text",
      minWords = 2, minLines = 2).head()
    assert(lax.getAs[Long]("n_kept") === 2L)
    assert(lax.getAs[Boolean]("page_ok"))
  }

  test("entry fixture: q_html_strip matches a hand-stripped sample row") {
    val s = spark
    val out = SparkEntry.queries("q_html_strip")(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") === 12L).head()
    assert(out.getAs[String]("title") === "Doc 12 & notes")
    val txt = out.getAs[String]("text_clean")
    // id 12: script (12%2=0), style (12%3=0), comment (12%4=0) all present
    // and all stripped; entities decoded
    assert(txt.startsWith("Doc 12 & notes"))
    assert(txt.contains("<tagged> \"quoted\" 'x' end"))
    assert(!txt.contains("track();") && !txt.contains("color") &&
      !txt.contains("hint"))
  }

  test("entry fixture: q_link_domains rolls news hosts into example.com") {
    val s = spark
    val out = SparkEntry.queries("q_link_domains")(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("domain") ->
        r.getAs[Long]("n_links")).toMap
    // every doc links one site{k}.co.uk page and one news{k}.example.com
    // page; relative links are rejected
    assert(out.keySet.filter(_.endsWith("co.uk")).forall(_.startsWith("site")))
    assert(out.contains("example.com"))
    val total = out.values.sum
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(total === 2L * nDocs)
  }
}
