package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SharedSpark {

  // trades (left) pick up the latest quote (right) at-or-before their ts
  private def trades = df(
    "sym STRING, t BIGINT, qty BIGINT",
    Seq(
      Row("A", 10L, 1L),
      Row("A", 20L, 2L),
      Row("A", 20L, 3L), // duplicate left ts: both rows must survive
      Row("B", 15L, 4L),
      Row("B", 5L, 5L), // before any quote
      Row("C", 30L, 6L) // key with no quotes at all
    )
  )

  private def quotes = df(
    "sym STRING, qt BIGINT, px DOUBLE",
    Seq(
      Row("A", 8L, 1.0),
      Row("A", 20L, 2.0),
      Row("B", 10L, 3.0),
      Row("B", 14L, 4.0)
    )
  )

  private def matches(out: Seq[Row]): Map[(String, Long, Long), Option[Double]] =
    out.map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toMap

  test("asofJoin picks latest at-or-before quote, keeps unmatched lefts") {
    val out = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"))
    assert(out.count() == 6) // left multiplicity preserved
    val m = matches(out.collect().toSeq)
    assert(m(("A", 10L, 1L)).contains(1.0))
    assert(m(("A", 20L, 2L)).contains(2.0)) // exact match allowed
    assert(m(("A", 20L, 3L)).contains(2.0))
    assert(m(("B", 15L, 4L)).contains(4.0)) // latest of the two B quotes
    assert(m(("B", 5L, 5L)).isEmpty) // before any quote
    assert(m(("C", 30L, 6L)).isEmpty) // key absent from right
  }

  test("asofJoin with allowExactMatches=false takes strictly-earlier quote") {
    val out = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      allowExactMatches = false)
    val m = matches(out.collect().toSeq)
    assert(m(("A", 20L, 2L)).contains(1.0)) // the t=20 quote is excluded
    assert(m(("A", 10L, 1L)).contains(1.0))
  }

  test("asofJoin tolerance voids stale matches") {
    val out = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      tolerance = Some(2L))
    val m = matches(out.collect().toSeq)
    assert(m(("A", 10L, 1L)).contains(1.0)) // 10-8=2 <= 2 → kept (boundary)
    assert(m(("B", 15L, 4L)).contains(4.0)) // 15-14=1
    assert(m(("A", 20L, 2L)).contains(2.0)) // exact
  }

  test("asofJoin collapses right ties on (key, ts) to the max payload") {
    val q = df(
      "sym STRING, qt BIGINT, px DOUBLE",
      Seq(Row("A", 8L, 1.0), Row("A", 8L, 9.0)))
    val out = TimeSeries.asofJoin(
      trades.filter(col("sym") === "A"), q, "t", "qt", Seq("sym"), Seq("px"))
    val m = matches(out.collect().toSeq)
    assert(m(("A", 10L, 1L)).contains(9.0))
  }

  test("asofJoin ignores null timestamps on both sides") {
    val l = df("sym STRING, t BIGINT, qty BIGINT",
      Seq(Row("A", null, 1L), Row("A", 10L, 2L)))
    val q = df("sym STRING, qt BIGINT, px DOUBLE",
      Seq(Row("A", null, 99.0), Row("A", 7L, 1.0)))
    val out = TimeSeries.asofJoin(l, q, "t", "qt", Seq("sym"), Seq("px"))
    val got = out.collect().toSeq
    assert(got.size == 2) // null-ts left row kept (left-outer), unmatched
    val byQty = got.map(r => r.getLong(2) -> r).toMap
    assert(byQty(1L).isNullAt(3)) // null-ts left row: no match
    assert(byQty(2L).getDouble(3) == 1.0) // null-ts quote never matches
  }

  test("asofJoinBucketed equals asofJoin with the same tolerance") {
    val tol = 7L
    val general = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      tolerance = Some(tol))
    val bucketed = TimeSeries.asofJoinBucketed(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"), tolerance = tol)
    // bucketed keeps null-ts left rows too (left-outer); general drops them
    // only when ts is null — none here, so outputs must agree exactly
    assertSameRows(bucketed, general)
  }

  test("asofJoinBucketed strict variant matches general strict") {
    val tol = 100L
    val general = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      allowExactMatches = false, tolerance = Some(tol))
    val bucketed = TimeSeries.asofJoinBucketed(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      tolerance = tol, allowExactMatches = false)
    assertSameRows(bucketed, general)
  }

  test("asofJoinBucketed on a larger synthetic series agrees with general") {
    // 3 keys x 200 left rows, right rows every 5 ticks — crosses many
    // bucket boundaries including the replicate-into-next-bucket path
    val ls = (0 until 600).map(i =>
      Row(s"k${i % 3}", (i * 7 % 997).toLong, i.toLong))
    val rs = (0 until 120).map(i =>
      Row(s"k${i % 3}", (i * 5 % 499).toLong, i.toDouble))
    val l = df("sym STRING, t BIGINT, qty BIGINT", ls)
    val r = df("sym STRING, qt BIGINT, px DOUBLE", rs)
    val tol = 13L
    val general = TimeSeries.asofJoin(
      l, r, "t", "qt", Seq("sym"), Seq("px"), tolerance = Some(tol))
    val bucketed = TimeSeries.asofJoinBucketed(
      l, r, "t", "qt", Seq("sym"), Seq("px"), tolerance = tol)
    assertSameRows(bucketed, general)
  }
}
