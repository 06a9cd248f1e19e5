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

  test("asofJoin forward picks the earliest at-or-after quote") {
    val out = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      direction = "forward")
    val m = matches(out.collect().toSeq)
    assert(m(("B", 5L, 5L)).contains(3.0)) // next quote at 10
    assert(m(("A", 20L, 2L)).contains(2.0)) // exact match allowed
    assert(m(("B", 15L, 4L)).isEmpty) // no later quote for B
    assert(m(("C", 30L, 6L)).isEmpty)
    val strict = matches(TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      allowExactMatches = false, direction = "forward").collect().toSeq)
    assert(strict(("A", 20L, 2L)).isEmpty) // t=20 quote now excluded
  }

  test("asofJoin nearest picks the smaller gap, ties to backward") {
    val m = matches(TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      direction = "nearest").collect().toSeq)
    assert(m(("A", 10L, 1L)).contains(1.0)) // gap 2 back beats 10 fwd
    assert(m(("B", 5L, 5L)).contains(3.0)) // only a forward match exists
    assert(m(("B", 15L, 4L)).contains(4.0)) // gap 1 back beats none fwd
    // forward-only case: left t=9 precedes both B quotes (10, 14)
    val fwd = df("sym STRING, t BIGINT, qty BIGINT", Seq(Row("B", 9L, 9L)))
    val mf = matches(TimeSeries.asofJoin(
      fwd, quotes, "t", "qt", Seq("sym"), Seq("px"),
      direction = "nearest").collect().toSeq)
    assert(mf(("B", 9L, 9L)).contains(3.0)) // nearest is the t=10 quote
  }

  test("asofJoin nearest voids per-direction before choosing") {
    val l = df("sym STRING, t BIGINT, qty BIGINT", Seq(Row("B", 12L, 1L)))
    // quotes for B at 10 (gap 2 back) and 14 (gap 2 fwd): tie → backward
    val m0 = matches(TimeSeries.asofJoin(
      l, quotes, "t", "qt", Seq("sym"), Seq("px"),
      direction = "nearest").collect().toSeq)
    assert(m0(("B", 12L, 1L)).contains(3.0))
    // tolerance 1 voids both
    val m1 = matches(TimeSeries.asofJoin(
      l, quotes, "t", "qt", Seq("sym"), Seq("px"),
      direction = "nearest", tolerance = Some(1L)).collect().toSeq)
    assert(m1(("B", 12L, 1L)).isEmpty)
  }

  test("asofJoin forward/nearest keep null-ts left rows unmatched") {
    // the FOLLOWING frame of a nulls-first sort spans the whole partition,
    // so without the explicit guard a null-ts left row would match the
    // earliest right row
    val l = df("sym STRING, t BIGINT, qty BIGINT",
      Seq(Row("A", null, 1L), Row("A", 10L, 2L)))
    val q = df("sym STRING, qt BIGINT, px DOUBLE",
      Seq(Row("A", 7L, 1.0), Row("A", 12L, 2.0)))
    for (dir <- Seq("forward", "nearest", "backward")) {
      val got = TimeSeries.asofJoin(
        l, q, "t", "qt", Seq("sym"), Seq("px"), direction = dir)
        .collect().toSeq
      assert(got.size == 2, dir)
      val nullTsRow = got.find(_.getLong(2) == 1L).get
      assert(nullTsRow.isNullAt(3), dir) // null-ts left row stays unmatched
      val realRow = got.find(_.getLong(2) == 2L).get
      assert(!realRow.isNullAt(3), dir) // t=10 matches a real quote
    }
  }

  test("asofJoinBucketed matches null keys to null keys like the general form") {
    val l = df("sym STRING, t BIGINT, qty BIGINT",
      Seq(Row(null, 10L, 1L), Row("A", 10L, 2L)))
    val q = df("sym STRING, qt BIGINT, px DOUBLE",
      Seq(Row(null, 8L, 5.0), Row("A", 8L, 1.0)))
    val general = TimeSeries.asofJoin(
      l, q, "t", "qt", Seq("sym"), Seq("px"), tolerance = Some(7L))
    val bucketed = TimeSeries.asofJoinBucketed(
      l, q, "t", "qt", Seq("sym"), Seq("px"), tolerance = 7L)
    assertSameRows(bucketed, general)
    // and both actually matched the null-key pair
    val got = bucketed.collect().find(r => r.isNullAt(0)).get
    assert(got.getDouble(3) == 5.0)
  }

  test("asofJoinBucketed buckets epoch-nanos timestamps exactly") {
    // doubles round these longs by up to 128 ns (> 2^53); with an odd
    // tolerance the boundary rows must still bucket exactly
    val base = 1704067207179575000L
    val tol = 3600000000001L // odd: not divisible by any power of two
    val l = df("sym STRING, t BIGINT, qty BIGINT",
      (0 until 50).map(i => Row("A", base + i.toLong * 777777777L, i.toLong)))
    val q = df("sym STRING, qt BIGINT, px DOUBLE",
      (0 until 50).map(i => Row("A", base - 1L + i.toLong * 999999999L, i.toDouble)))
    val general = TimeSeries.asofJoin(
      l, q, "t", "qt", Seq("sym"), Seq("px"), tolerance = Some(tol))
    val bucketed = TimeSeries.asofJoinBucketed(
      l, q, "t", "qt", Seq("sym"), Seq("px"), tolerance = tol)
    assertSameRows(bucketed, general)
    // negative timestamps floor-divide, not truncate-toward-zero
    val ln = df("sym STRING, t BIGINT, qty BIGINT",
      Seq(Row("A", -5L, 1L), Row("A", 3L, 2L)))
    val qn = df("sym STRING, qt BIGINT, px DOUBLE",
      Seq(Row("A", -9L, 1.0), Row("A", -6L, 2.0)))
    val g2 = TimeSeries.asofJoin(
      ln, qn, "t", "qt", Seq("sym"), Seq("px"), tolerance = Some(10L))
    val b2 = TimeSeries.asofJoinBucketed(
      ln, qn, "t", "qt", Seq("sym"), Seq("px"), tolerance = 10L)
    assertSameRows(b2, g2)
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

  test("asofJoin assumeRightUnique matches the default on unique rights") {
    for (dir <- Seq("backward", "forward", "nearest")) {
      val dedup = TimeSeries.asofJoin(
        trades, quotes, "t", "qt", Seq("sym"), Seq("px"), direction = dir)
      val fast = TimeSeries.asofJoin(
        trades, quotes, "t", "qt", Seq("sym"), Seq("px"), direction = dir,
        assumeRightUnique = true)
      assertSameRows(fast, dedup)
    }
    // the fast path must drop the right-side collapse: exactly one
    // shuffle (the window exchange) in the whole plan
    val fast = TimeSeries.asofJoin(
      trades, quotes, "t", "qt", Seq("sym"), Seq("px"),
      assumeRightUnique = true)
    val nShuffles = "Exchange hashpartitioning".r
      .findAllIn(fast.queryExecution.executedPlan.toString).size
    assert(nShuffles == 1)
  }

  test("retention assigns cohorts from first activity and counts offsets") {
    val e = df("u BIGINT, t BIGINT", Seq(
      Row(1L, 0L), Row(1L, 5L), Row(1L, 25L), // cohort 0, offsets 0 and 2
      Row(2L, 3L), Row(2L, 13L), // cohort 0, offsets 0 and 1
      Row(3L, 12L), // cohort 1, offset 0 only
      Row(4L, null))) // null ts ignored entirely
    val out = TimeSeries.retention(e, Seq("u"), "t", bucket = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // users 1 and 2 start in bucket 0
      (0L, 1L) -> 1L, // user 2 active in bucket 1
      (0L, 2L) -> 1L, // user 1 active in bucket 2
      (1L, 0L) -> 1L)) // user 3's own cohort
  }

  test("funnel requires ordered steps and respects the within bound") {
    val e = df("u BIGINT, t BIGINT, ev STRING", Seq(
      // u1: full ordered funnel
      Row(1L, 10L, "view"), Row(1L, 20L, "click"), Row(1L, 30L, "buy"),
      // u2: click BEFORE view — click must not count; no click after
      Row(2L, 10L, "click"), Row(2L, 20L, "view"), Row(2L, 30L, "buy"),
      // u3: view+click, no buy
      Row(3L, 10L, "view"), Row(3L, 15L, "click"),
      // u4: never viewed → not in output
      Row(4L, 10L, "buy"),
      // u5: full funnel but buy outside within=15
      Row(5L, 10L, "view"), Row(5L, 12L, "click"), Row(5L, 40L, "buy"),
      // u6: same-ts click (ties are NOT later) then a later one
      Row(6L, 10L, "view"), Row(6L, 10L, "click"), Row(6L, 11L, "click")))
    val out = TimeSeries.funnel(e, Seq("u"), "t", "ev",
        Seq("view", "click", "buy"), within = Some(15L))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getInt(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L))
    assert(out(1L) == ((Some(20L), None, 2))) // buy at 30 > within
    assert(out(2L) == ((None, None, 1))) // pre-view click doesn't count
    assert(out(3L) == ((Some(15L), None, 2)))
    assert(out(5L) == ((Some(12L), None, 2))) // buy at 40 outside window
    assert(out(6L) == ((Some(11L), None, 2))) // same-ts click skipped
    // without the bound, u1 completes all three steps
    val free = TimeSeries.funnel(e, Seq("u"), "t", "ev",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(free(1L) == 3 && free(2L) == 1 && free(5L) == 3)
  }

  test("rollingAgg computes trailing-window count/min/max/sums per key") {
    val d = df("k STRING, t BIGINT, v DOUBLE",
      Seq(
        Row("a", 1L, 1.0), Row("a", 3L, 2.0), Row("a", 4L, 4.0),
        Row("a", 10L, 8.0), Row("b", 3L, 16.0)))
    val out = TimeSeries.rollingAgg(d, "t", Seq("k"), "v", window = 3L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
      .toMap
    // window (t-2, t]: at a/4 rows t=3,4 are in; t=1 is out
    assert(out(("a", 1L)) == ((1L, 1.0, 1.0, 1.0, 100L)))
    assert(out(("a", 3L)) == ((2L, 1.0, 2.0, 3.0, 300L)))
    assert(out(("a", 4L)) == ((2L, 2.0, 4.0, 6.0, 600L)))
    assert(out(("a", 10L)) == ((1L, 8.0, 8.0, 8.0, 800L)))
    assert(out(("b", 3L)) == ((1L, 16.0, 16.0, 16.0, 1600L)))
  }

  test("resample fills gaps with LOCF and linear interpolation") {
    // key a: observations at buckets 0 (v=100c) and 3 (v=400c), gap at 1,2
    val d = df("k STRING, t BIGINT, v DOUBLE",
      Seq(
        Row("a", 0L, 1.0), Row("a", 5L, 1.5), // both bucket 0 → max 150c
        Row("a", 31L, 4.0), // bucket 3
        Row("b", 12L, 2.0))) // single-observation key: 1-bucket grid
    val out = TimeSeries.resample(d, "t", Seq("k"), "v", interval = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(out.size == 5)
    assert(out(("a", 0L)) == ((2L, Some(150L), Some(150L), Some(150.0))))
    // gaps: LOCF carries 150c; interp walks 150→400 over 3 buckets
    assert(out(("a", 10L)) == ((0L, None, Some(150L),
      Some(150.0 + 250.0 * 1.0 / 3.0))))
    assert(out(("a", 20L)) == ((0L, None, Some(150L),
      Some(150.0 + 250.0 * 2.0 / 3.0))))
    assert(out(("a", 30L)) == ((1L, Some(400L), Some(400L), Some(400.0))))
    assert(out(("b", 10L)) == ((1L, Some(200L), Some(200L), Some(200.0))))
  }

  test("resample floor-divides negative timestamps into the right buckets") {
    val d = df("k STRING, t BIGINT, v DOUBLE",
      Seq(Row("a", -15L, 1.0), Row("a", -10L, 2.0), Row("a", 5L, 3.0)))
    val starts = TimeSeries.resample(d, "t", Seq("k"), "v", interval = 10L)
      .collect().map(_.getLong(1)).sorted
    // -15 → bucket -2 (start -20), -10 → bucket -1 (start -10), 5 → bucket 0
    assert(starts.toSeq == Seq(-20L, -10L, 0L))
  }

  test("ewma folds s←(1−α)s+αx over the trailing frame in (ts, tie) order") {
    val d = df("k STRING, t BIGINT, id BIGINT, v DOUBLE",
      Seq(
        Row("a", 1L, 1L, 10.0), Row("a", 2L, 2L, 20.0),
        Row("a", 2L, 3L, 40.0), Row("a", 9L, 4L, 80.0),
        Row("b", 1L, 5L, 7.0)))
    val out = TimeSeries.ewma(d, "t", Seq("k"), "v",
        alpha = 0.5, lookback = 3, tieCol = "id")
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(out(1L) == 10.0)
    assert(out(2L) == 15.0) // 10·.5 + 20·.5
    assert(out(3L) == 27.5) // (15)·.5 + 40·.5 with seed 10: ((10·.5+20·.5)·.5+40·.5)
    // lookback 3 drops t=1: seed 20 → 20·.5+40·.5=30 → 30·.5+80·.5=55
    assert(out(4L) == 55.0)
    assert(out(5L) == 7.0)
  }

  test("rollingZScore flags deviations by exact integer arithmetic") {
    // window 4, threshold 2: constant 10.0 then a spike
    val d = df("k STRING, t BIGINT, id BIGINT, v DOUBLE",
      Seq(
        Row("a", 1L, 1L, 10.0), Row("a", 2L, 2L, 10.0),
        Row("a", 3L, 3L, 10.0), Row("a", 4L, 4L, 50.0),
        Row("b", 1L, 5L, 3.0)))
    val out = TimeSeries.rollingZScore(d, "t", Seq("k"), "v",
        window = 4, threshold = 2, tieCol = "id")
      .collect().map(r => r.getLong(2) -> ((r.getDouble(4), r.getBoolean(5))))
      .toMap
    // constant frames: variance 0 → z 0, never anomalous
    assert(out(1L) == ((0.0, false)))
    assert(out(2L) == ((0.0, false)))
    assert(out(3L) == ((0.0, false)))
    // frame cents (1000,1000,1000,5000): n=4 Σ=8000 Σsq=28e6
    // num = 5000·4−8000 = 12000; den² = 4·28e6−64e6 = 48e6
    // z = 12000/√(48e6) ≈ 1.732; flag: 144e6 > 4·48e6=192e6 → false
    assert(math.abs(out(4L)._1 - 12000.0 / math.sqrt(48e6)) < 1e-12)
    assert(!out(4L)._2)
    assert(out(5L) == ((0.0, false)))
    // threshold 1 flips the spike to anomalous: 144e6 > 48e6
    val strict = TimeSeries.rollingZScore(d, "t", Seq("k"), "v",
        window = 4, threshold = 1, tieCol = "id")
      .collect().map(r => r.getLong(2) -> r.getBoolean(5)).toMap
    assert(strict(4L) && !strict(3L))
  }

  test("rangeJoinBucketed equals the naive BETWEEN join") {
    val ls = (0 until 400).map(i => Row((i * 13 % 1009).toLong, i.toLong))
    val rs = (0 until 40).map(i =>
      Row(i.toLong, (i * 29 % 997).toLong, (i * 29 % 997 + i % 50).toLong))
    val l = df("t BIGINT, lid BIGINT", ls)
    val r = df("iid BIGINT, s BIGINT, e BIGINT", rs)
    val got = TimeSeries.rangeJoinBucketed(
      l, r, "t", "s", "e", Nil, Seq("iid"), bucketWidth = 37L)
    val want = l.join(r, col("t") >= col("s") && col("t") <= col("e"))
      .select("t", "lid", "iid")
    assertSameRows(got, want)
  }

  test("rangeJoinBucketed respects keys and drops empty/null intervals") {
    val l = df("k STRING, t BIGINT, lid BIGINT",
      Seq(Row("a", 10L, 1L), Row("b", 10L, 2L), Row("a", 99L, 3L)))
    val r = df("k STRING, s BIGINT, e BIGINT, iid BIGINT",
      Seq(
        Row("a", 5L, 15L, 10L), // matches lid 1 only (key a)
        Row("b", 20L, 5L, 11L), // end < start: empty
        Row("b", null, 15L, 12L))) // null start: dropped
    val out = TimeSeries.rangeJoinBucketed(
        l, r, "t", "s", "e", Seq("k"), Seq("iid"), bucketWidth = 10L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 10L)))
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

  test("buildHistory collapses runs into half-open validity intervals") {
    val obs = df("id BIGINT, t BIGINT, s STRING", Seq(
      Row(1L, 10L, "a"), Row(1L, 20L, "a"), Row(1L, 30L, "b"),
      Row(1L, 40L, "b"), Row(1L, 50L, "a"),
      Row(2L, 5L, "x")))
    val h = TimeSeries.buildHistory(obs, "id", "t", Seq("s"))
    val expected = df(
      "id BIGINT, s STRING, valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN",
      Seq(
        Row(1L, "a", 10L, 30L, false),
        Row(1L, "b", 30L, 50L, false),
        Row(1L, "a", 50L, null, true),
        Row(2L, "x", 5L, null, true)))
    assertSameRows(h, expected)
  }

  test("snapshotAt reconstructs the table as of an instant") {
    val obs = df("id BIGINT, t BIGINT, s STRING", Seq(
      Row(1L, 10L, "a"), Row(1L, 30L, "b"), Row(1L, 50L, "a"),
      Row(2L, 5L, "x"), Row(3L, 40L, "y")))
    val h = TimeSeries.buildHistory(obs, "id", "t", Seq("s"))
    // at t=35: id 1 is in its [30,50) "b" interval, id 3 not yet born
    assertSameRows(
      TimeSeries.snapshotAt(h, lit(35L)),
      df("id BIGINT, s STRING", Seq(Row(1L, "b"), Row(2L, "x"))))
    // at t=50 (boundary): the new interval owns its valid_from
    assertSameRows(
      TimeSeries.snapshotAt(h, lit(50L)),
      df("id BIGINT, s STRING",
        Seq(Row(1L, "a"), Row(2L, "x"), Row(3L, "y"))))
  }

  test("buildHistory dedups equal (id, ts) observations deterministically") {
    // two conflicting observations at t=10 → the max value struct wins,
    // regardless of input order or partitioning
    val obs = df("id BIGINT, t BIGINT, s STRING", Seq(
      Row(1L, 10L, "a"), Row(1L, 10L, "z"), Row(1L, 20L, "z")))
    for (parts <- Seq(1, 4)) {
      val h = TimeSeries.buildHistory(obs.repartition(parts), "id", "t", Seq("s"))
      val expected = df(
        "id BIGINT, s STRING, valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN",
        Seq(Row(1L, "z", 10L, null, true)))
      assertSameRows(h, expected)
    }
  }

  test("buildHistory tracks multi-column value tuples and null values") {
    val obs = df("id BIGINT, t BIGINT, a STRING, b BIGINT", Seq(
      Row(7L, 1L, "p", 1L), Row(7L, 2L, "p", null),
      Row(7L, 3L, "p", null), Row(7L, 4L, "p", 1L)))
    val h = TimeSeries.buildHistory(obs, "id", "t", Seq("a", "b"))
    val expected = df(
      "id BIGINT, a STRING, b BIGINT, valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN",
      Seq(
        Row(7L, "p", 1L, 1L, 2L, false),
        Row(7L, "p", null, 2L, 4L, false),
        Row(7L, "p", 1L, 4L, null, true)))
    assertSameRows(h, expected)
  }

  test("buildHistory plans one exchange for both window passes") {
    val obs = df("id BIGINT, t BIGINT, s STRING",
      (0 until 100).map(i => Row((i % 5).toLong, i.toLong, s"v${i % 3}")))
    val plan = TimeSeries.buildHistory(obs, "id", "t", Seq("s"))
      .queryExecution.executedPlan.toString
    // dedup agg exchanges on (id, t); the two windows share ONE exchange
    // on id — three total would mean the second window re-shuffled
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("transitionMatrix counts consecutive per-entity transitions") {
    val d = df("u STRING, s STRING, t BIGINT, id BIGINT", Seq(
      Row("u1", "A", 1L, 1L), Row("u1", "B", 2L, 2L),
      Row("u1", "A", 3L, 3L), Row("u1", "B", 4L, 4L),
      Row("u2", "A", 1L, 5L), Row("u2", "A", 2L, 6L)))
    val out = TimeSeries.transitionMatrix(
      d, col("u"), col("s"), Seq(col("t"), col("id")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(("A", "B")) == ((2L, 3L, 666667L)))
    assert(out(("A", "A")) == ((1L, 3L, 333333L)))
    assert(out(("B", "A")) == ((1L, 1L, 1000000L)))
    assert(out.size == 3)
  }

  test("interEventStats computes exact microsecond gap profiles") {
    val d = df("u STRING, t BIGINT, id BIGINT", Seq(
      Row("u", 100L, 1L), Row("u", 300L, 2L), Row("u", 1000L, 3L),
      Row("solo", 5L, 4L))) // single event: no gaps, dropped
    val out = TimeSeries.interEventStats(
      d, col("u"), col("t"), col("id")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "u" && r.getLong(1) == 2L)
    assert(r.getLong(2) == 200L && r.getLong(3) == 700L)
    assert(r.getDouble(4) == 450.0)
  }

  test("interEventStats breaks timestamp ties by the tie column") {
    val d = df("u STRING, t BIGINT, id BIGINT", Seq(
      Row("u", 100L, 2L), Row("u", 100L, 1L), Row("u", 150L, 3L)))
    val r = TimeSeries.interEventStats(
      d, col("u"), col("t"), col("id")).collect().head
    // order (100,1) (100,2) (150,3): gaps 0 and 50
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 50L)
  }

  test("topPaths joins each entity's first events deterministically") {
    val d = df("u STRING, s STRING, t BIGINT, id BIGINT", Seq(
      Row("u1", "a", 1L, 1L), Row("u1", "b", 2L, 2L),
      Row("u1", "c", 3L, 3L), Row("u1", "d", 4L, 4L),
      Row("u2", "a", 1L, 5L), Row("u2", "b", 2L, 6L)))
    val out = TimeSeries.topPaths(
      d, col("u"), col("s"), Seq(col("t"), col("id")), depth = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("a>b>c") == ((1L, 500000L)))
    assert(out("a>b") == ((1L, 500000L)))
    assert(out.size == 2)
  }

  test("newVsReturning: growth accounting with exact cumulative distinct") {
    val d = df("u STRING, p BIGINT", Seq(
      Row("u1", 1L), Row("u1", 2L), Row("u1", 2L), // dup activity row
      Row("u2", 2L), Row("u3", 3L)))
    val out = TimeSeries.newVsReturning(d, col("u"), col("p"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((1L, 1L, 0L, 1L)))
    assert(out(2L) == ((2L, 1L, 1L, 2L))) // u1 returns, u2 new
    assert(out(3L) == ((1L, 1L, 0L, 3L)))
  }

  test("timeWeightedAvg weights each value by its holding duration") {
    val d = df("u STRING, t BIGINT, id BIGINT, v DOUBLE", Seq(
      Row("u", 0L, 1L, 1.0), Row("u", 100L, 2L, 3.0),
      Row("u", 300L, 3L, 5.0), // final observation: no duration
      Row("solo", 9L, 4L, 7.0), // one event: dropped
      Row("z", 5L, 5L, 1.0), Row("z", 5L, 6L, 2.0))) // zero span: dropped
    val out = TimeSeries.timeWeightedAvg(
      d, col("u"), col("t"), col("v"), col("id")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "u" && r.getLong(1) == 2L
      && r.getLong(2) == 300L)
    // (100·100 + 300·200) / 300 / 100 = 7/3
    assert(math.abs(r.getDouble(3) - 7.0 / 3.0) < 1e-12)
  }

  test("transitionMatrix uses the tiebreak column on equal timestamps") {
    val d = df("u STRING, s STRING, t BIGINT, id BIGINT", Seq(
      Row("u", "X", 1L, 2L), Row("u", "Y", 1L, 1L)))
    val out = TimeSeries.transitionMatrix(
      d, col("u"), col("s"), Seq(col("t"), col("id"))).collect()
    // id order makes the sequence Y -> X deterministically
    assert(out.length == 1)
    assert(out.head.getString(0) == "Y" && out.head.getString(1) == "X")
  }
}
