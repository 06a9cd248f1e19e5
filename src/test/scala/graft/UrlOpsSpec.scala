package graft

import graft.ops.UrlOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SharedSpark {

  private def norm(u: String): String = {
    val r = df("url STRING", Seq(Row(u)))
      .select(UrlOps.normalizeUrl(col("url")).as("c"))
      .head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("normalizeUrl lowercases scheme/host, drops userinfo and fragment") {
    assert(norm("HTTPS://User:pw@WWW.Example.COM/A/b#frag") ===
      "https://www.example.com/A/b")
  }

  test("normalizeUrl strips default ports only") {
    assert(norm("http://a.com:80/x") === "http://a.com/x")
    assert(norm("https://a.com:443/x") === "https://a.com/x")
    assert(norm("http://a.com:443/x") === "http://a.com:443/x")
    assert(norm("https://a.com:8080/x") === "https://a.com:8080/x")
  }

  test("normalizeUrl fills empty path, strips trailing host dot") {
    assert(norm("https://a.com.") === "https://a.com/")
    assert(norm("https://a.com?x=1") === "https://a.com/?x=1")
  }

  test("normalizeUrl drops tracking params and sorts the rest") {
    assert(norm("https://a.com/p?utm_source=x&b=2&a=1&fbclid=z&gclid=1" +
      "&msclkid=2&ref=home") === "https://a.com/p?a=1&b=2")
    assert(norm("https://a.com/p?utm_campaign=only") === "https://a.com/p")
  }

  test("normalizeUrl is idempotent and NULL on unparsable input") {
    val messy = Seq(
      "HTTP://A.B.Co.UK:80/x?z=1&utm_a=2#f",
      "https://h.example.com:443?b=1&a=2",
      "ftp://files.example.org:21/pub")
    messy.foreach { u =>
      val once = norm(u)
      assert(norm(once) === once, s"not idempotent for $u")
    }
    assert(norm("not a url") === null)
    assert(norm("//proto-relative.example.com/x") === null)
  }

  test("registrableDomain keeps three labels on two-level public suffixes") {
    val d = df("h STRING", Seq(
      Row("news.bbc.co.uk"), Row("a.b.example.com"), Row("example.com"),
      Row("co.uk"), Row("localhost"), Row("shop.example.com.au")))
      .select(col("h"), UrlOps.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("news.bbc.co.uk") === "bbc.co.uk")
    assert(d("a.b.example.com") === "example.com")
    assert(d("example.com") === "example.com")
    assert(d("co.uk") === "co.uk") // suffix alone: nothing registrable above it
    assert(d("localhost") === "localhost")
    assert(d("shop.example.com.au") === "example.com.au")
  }

  test("dedupByUrl keeps the min-id row per canonical URL; unparsable rows survive") {
    val d = df("id BIGINT, url STRING", Seq(
      Row(3L, "https://a.com/p?b=2&a=1"),
      Row(1L, "HTTPS://A.COM:443/p?a=1&utm_x=9&b=2#frag"), // same canonical
      Row(2L, "https://a.com/q"),
      Row(4L, "garbage one"),
      Row(5L, "garbage two")))
    val kept = UrlOps.dedupByUrl(d, "url", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L, 5L))
    // the single-pass min_by keeps the WHOLE keeper row (its own url,
    // not another cluster member's), with the input column order
    val full = UrlOps.dedupByUrl(d, "url", "id")
    assert(full.columns.toSeq === Seq("id", "url"))
    val byId = full.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) === "HTTPS://A.COM:443/p?a=1&utm_x=9&b=2#frag")
  }

  test("dedupByUrl nullIds: 'drop' silently drops, 'fail' raises in-plan") {
    val d = df("id BIGINT, url STRING", Seq(
      Row(1L, "https://a.com/p"),
      Row(null, "https://a.com/p"),
      Row(null, "https://b.com/q"))) // all-NULL-id group: must NOT surface
    // default drop: null-id rows vanish, no all-NULL row for b.com
    val kept = UrlOps.dedupByUrl(d, "url", "id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
    // fail: the same plan raises instead of dropping
    val ex = intercept[Exception] {
      UrlOps.dedupByUrl(d, "url", "id", nullIds = "fail").collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("dedupByUrl")), msgs.mkString(" | "))
    // and a clean input passes through fail mode unchanged
    val clean = df("id BIGINT, url STRING", Seq(
      Row(1L, "https://a.com/p"), Row(2L, "https://a.com/p")))
    assert(UrlOps.dedupByUrl(clean, "url", "id", nullIds = "fail")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    val bad = intercept[IllegalArgumentException] {
      UrlOps.dedupByUrl(clean, "url", "id", nullIds = "keep")
    }
    assert(bad.getMessage.contains("nullIds"))
  }

  test("registrableDomainPsl rejects reserved __psl_* input columns") {
    val spark0 = spark
    import spark0.implicits._
    val psl = Seq("com").toDF("suffix")
    val hosts = df("h STRING, __psl_len INT", Seq(Row("a.com", 7)))
    val ex = intercept[IllegalArgumentException] {
      UrlOps.registrableDomainPsl(hosts, "h", psl)
    }
    assert(ex.getMessage.contains("__psl_len"))
  }

  test("registrableDomainPsl: longest match, suffix-only NULL, implicit *") {
    val spark0 = spark
    import spark0.implicits._
    val psl = Seq("io", "github.io", "uk", "co.uk", "blogspot.co.uk", "com")
      .toDF("suffix")
    val hosts = df("h STRING", Seq(
      Row("user.github.io"),      // 2-label suffix beats "io"
      Row("deep.user.github.io"), // domain is suffix+1, not host
      Row("x.blogspot.co.uk"),    // 3-label suffix beats "co.uk"
      Row("www.bar.co.uk"),       // plain 2-level suffix
      Row("github.io"),           // host IS a suffix -> NULL
      Row("a.b.example"),         // unlisted TLD -> implicit * rule
      Row("localhost"),           // single label -> NULL
      Row("shop.example.com")))   // 1-label suffix
    val out = UrlOps.registrableDomainPsl(hosts, "h", psl)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out("user.github.io") === "user.github.io")
    assert(out("deep.user.github.io") === "user.github.io")
    assert(out("x.blogspot.co.uk") === "x.blogspot.co.uk")
    assert(out("www.bar.co.uk") === "bar.co.uk")
    assert(out("github.io") === null)
    assert(out("a.b.example") === "b.example")
    assert(out("localhost") === null)
    assert(out("shop.example.com") === "example.com")
    // the lookup never shuffles the corpus: every join is a broadcast
    // hash join (the only exchanges are the tiny suffix table's own
    // dedup + broadcast)
    val plan = UrlOps.registrableDomainPsl(hosts, "h", psl)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin") &&
      plan.contains("BroadcastHashJoin"),
      s"PSL lookup must resolve as broadcast joins:\n$plan")
  }

  test("registrableDomainPsl: wildcard and exception rules (PSL algorithm)") {
    val spark0 = spark
    import spark0.implicits._
    // *.ck: every <label>.ck is a public suffix; !www.ck carves www.ck
    // back out as registrable. The kawasaki.jp family additionally has
    // the wildcard TAIL ("kawasaki.jp") under a plain TLD rule ("jp"),
    // the shape that must not duplicate corpus rows in the per-length
    // join and must resolve the tail host itself via the shorter rule.
    val psl = Seq("ck", "*.ck", "!www.ck",
      "jp", "*.kawasaki.jp", "!city.kawasaki.jp").toDF("suffix")
    val hosts = df("h STRING", Seq(
      Row("ck"),                  // bare TLD -> NULL
      Row("foo.ck"),              // matches *.ck -> IS a suffix -> NULL
      Row("a.foo.ck"),            // suffix foo.ck + 1
      Row("b.a.foo.ck"),          // still a.foo.ck
      Row("www.ck"),              // exception: itself registrable
      Row("sub.www.ck"),          // rolls to the exception domain
      Row("kawasaki.jp"),         // wildcard tail itself: plain "jp" rule
      Row("x.kawasaki.jp"),       // wildcard -> IS a suffix -> NULL
      Row("y.x.kawasaki.jp"),     // suffix x.kawasaki.jp + 1
      Row("city.kawasaki.jp"),    // exception beats the wildcard
      Row("z.city.kawasaki.jp"))) // rolls to the exception domain
    val out = UrlOps.registrableDomainPsl(hosts, "h", psl)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out("ck") === null)
    assert(out("foo.ck") === null)
    assert(out("a.foo.ck") === "a.foo.ck")
    assert(out("b.a.foo.ck") === "a.foo.ck")
    assert(out("www.ck") === "www.ck")
    assert(out("sub.www.ck") === "www.ck")
    assert(out("kawasaki.jp") === "kawasaki.jp")
    assert(out("x.kawasaki.jp") === null)
    assert(out("y.x.kawasaki.jp") === "y.x.kawasaki.jp")
    assert(out("city.kawasaki.jp") === "city.kawasaki.jp")
    assert(out("z.city.kawasaki.jp") === "city.kawasaki.jp")
    // row-count preservation: the kind-aggregated join sides are
    // key-unique even though the string "ck" is simultaneously an exact
    // rule and a wildcard tail (of "*.ck") — a naive two-row side table
    // would duplicate every *.ck host
    assert(UrlOps.registrableDomainPsl(hosts, "h", psl).count() === 11L)
  }

  test("registrableDomainPsl: case-insensitive host matching") {
    val spark0 = spark
    import spark0.implicits._
    val psl = Seq("com", "co.uk", "*.ck").toDF("suffix")
    val hosts = df("h STRING", Seq(
      Row("Shop.Example.COM"), Row("WWW.BAR.CO.UK"), Row("A.Foo.CK")))
    val out = UrlOps.registrableDomainPsl(hosts, "h", psl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("Shop.Example.COM") === "example.com")
    assert(out("WWW.BAR.CO.UK") === "bar.co.uk")
    assert(out("A.Foo.CK") === "a.foo.ck")
  }

  test("loadPsl: bundled full-width list, real-world spot checks") {
    val psl = UrlOps.loadPsl(spark)
    val n = psl.count()
    assert(n >= 9000L, s"bundled PSL unexpectedly small: $n rules")
    val hosts = df("h STRING", Seq(
      Row("www.bbc.co.uk"),      // classic 2-level suffix
      Row("foo.github.io"),      // private-section rule
      Row("foo.bar.ck"),         // real *.ck wildcard
      Row("www.ck"),             // real !www.ck exception
      Row("city.kawasaki.jp"),   // real exception under *.kawasaki.jp
      // 5-label host under the *.compute.amazonaws.com wildcard: the
      // public suffix is 4 labels, the whole host is registrable
      Row("proj.region1.compute.amazonaws.com"),
      Row("example.unknowntld"), // implicit * fallback
      Row("shop.example.com")))
    val out = UrlOps.registrableDomainPsl(hosts, "h", psl)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out("www.bbc.co.uk") === "bbc.co.uk")
    assert(out("foo.github.io") === "foo.github.io")
    assert(out("foo.bar.ck") === "foo.bar.ck")
    assert(out("www.ck") === "www.ck")
    assert(out("city.kawasaki.jp") === "city.kawasaki.jp")
    assert(out("proj.region1.compute.amazonaws.com") ===
      "proj.region1.compute.amazonaws.com")
    assert(out("example.unknowntld") === "example.unknowntld")
    assert(out("shop.example.com") === "example.com")
  }

  test("hostAggregate rolls pages up to the registrable domain") {
    val d = df("id BIGINT, url STRING, q DOUBLE", Seq(
      Row(1L, "https://x.site.co.uk/a", 1.0),
      Row(2L, "https://y.site.co.uk/a?utm_s=1", 3.0),
      Row(3L, "https://y.site.co.uk/a", 5.0), // same canonical as row 2
      Row(4L, "https://other.com/z", 7.0)))
    val rows = UrlOps.hostAggregate(d, "url", "q")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("site.co.uk") === ((3L, 2L, 3.0)))
    assert(rows("other.com") === ((1L, 1L, 7.0)))
  }

  test("url entry matches a hand-normalized sample row") {
    // doc_id=6: scheme HTTP (6%3=0), host upper(source).CO.UK (even),
    // port 8080 (6%4=2, kept), path /docs/6, params b=0,a=0 sorted,
    // tracking dropped, no fragment (even)
    val spark0 = spark
    import spark0.implicits._
    val d = Seq((6L, "src6")).toDF("doc_id", "source")
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(col("doc_id") % 2 === 0,
        concat(upper(col("source")), lit(".CO.UK")))
        .otherwise(concat(col("source"), lit(".example.com"))),
      when(col("doc_id") % 4 === 0, lit(":443"))
        .when(col("doc_id") % 4 === 1, lit(":80"))
        .when(col("doc_id") % 4 === 2, lit(":8080"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(""))
        .otherwise(concat(lit("/docs/"), (col("doc_id") % 10).cast("string"))),
      concat(lit("?utm_source=feed&b="), (col("doc_id") % 2).cast("string"),
        lit("&a="), (col("doc_id") % 3).cast("string")),
      when(col("doc_id") % 2 === 1, lit("#sec")).otherwise(lit("")))
    val out = d.select(UrlOps.normalizeUrl(url)).head().getString(0)
    assert(out === "http://src6.co.uk:8080/docs/6?a=0&b=0")
  }
}
