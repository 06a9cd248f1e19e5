package graft

import graft.ops.{BloomJoin, Incremental}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

class IncrementalSpec extends SharedSpark {

  private def snapshot = df(
    "k BIGINT, v BIGINT, w STRING",
    Seq(Row(1L, 10L, "a"), Row(2L, 20L, "b"), Row(3L, 30L, "c")))

  // per key 2: two changes out of order — seq 7 (U, 25) must win over
  // seq 5 (U, 22); key 3 deleted; key 4 inserted; key 9 deleted while
  // absent (no-op)
  private def changes = df(
    "k BIGINT, seq BIGINT, op STRING, v BIGINT, w STRING",
    Seq(
      Row(2L, 5L, "U", 22L, "b5"),
      Row(2L, 7L, "U", 25L, "b7"),
      Row(3L, 6L, "D", null, null),
      Row(4L, 1L, "I", 40L, "d"),
      Row(9L, 2L, "D", null, null)))

  test("applyChangelog upserts the latest change, deletes, and keeps the rest") {
    val out = Incremental.applyChangelog(
      snapshot, changes, Seq("k"), "seq", "op", Seq("v", "w"))
    assertSameRows(out, df(
      "k BIGINT, v BIGINT, w STRING",
      Seq(Row(1L, 10L, "a"), Row(2L, 25L, "b7"), Row(4L, 40L, "d"))))
  }

  test("applyChangelog with an empty changelog is the identity") {
    val out = Incremental.applyChangelog(
      snapshot, changes.limit(0), Seq("k"), "seq", "op", Seq("v", "w"))
    assertSameRows(out, snapshot)
  }

  test("a re-inserted key after delete takes the later change") {
    val c = df(
      "k BIGINT, seq BIGINT, op STRING, v BIGINT, w STRING",
      Seq(Row(3L, 6L, "D", null, null), Row(3L, 8L, "I", 33L, "c8")))
    val out = Incremental.applyChangelog(
      snapshot, c, Seq("k"), "seq", "op", Seq("v", "w"))
    assert(out.filter(col("k") === 3L && col("v") === 33L).count() == 1)
  }

  test("applyChangelog handles composite keys and null key parts") {
    val snap = df("a BIGINT, b STRING, v BIGINT",
      Seq(Row(1L, "x", 10L), Row(1L, null, 11L), Row(2L, "x", 20L)))
    val c = df("a BIGINT, b STRING, seq BIGINT, op STRING, v BIGINT",
      Seq(
        Row(1L, null, 3L, "U", 99L),   // null-safe key match
        Row(2L, "x", 4L, "D", null)))
    val out = Incremental.applyChangelog(
      snap, c, Seq("a", "b"), "seq", "op", Seq("v"))
    assertSameRows(out, df("a BIGINT, b STRING, v BIGINT",
      Seq(Row(1L, "x", 10L), Row(1L, null, 99L))))
  }

  test("distinct states union losslessly in the HLL coupon regime") {
    val old = df("g STRING, v STRING",
      Seq(Row("a", "x"), Row("a", "y"), Row("b", "x")))
    // delta re-sees "x" in group a — the union must not double-count
    val delta = df("g STRING, v STRING",
      Seq(Row("a", "x"), Row("a", "z"), Row("c", "q")))
    val merged = Incremental.mergeDistinctStates(
      Incremental.distinctStates(old, Seq("g"), "v"), delta, Seq("g"), "v")
    val got = Incremental.estimateDistinct(merged, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("mergeAggStates equals a from-scratch aggregation of all rows") {
    val old = df("g STRING, x BIGINT",
      Seq(Row("a", 1L), Row("a", 5L), Row("b", -2L)))
    val delta = df("g STRING, x BIGINT",
      Seq(Row("a", 7L), Row("c", 4L), Row("b", 0L)))
    val merged = Incremental.mergeAggStates(
      Incremental.aggStates(old, Seq("g"), "x"), delta, Seq("g"), "x")
    assertSameRows(merged,
      Incremental.aggStates(old.unionByName(delta), Seq("g"), "x"))
  }

  test("bottom-k sample states merge losslessly and estimate distincts") {
    val rows = df("g STRING, id BIGINT",
      (1L to 300L).map(i => Row(if (i % 3 == 0) "a" else "b", i)) ++
        Seq(Row("c", 1L), Row("c", 1L), Row("c", 2L))) // dupes collapse
    val full = Incremental.sampleStates(rows, Seq("g"), "id", k = 16)
    // merging any split equals the from-scratch sketch
    val merged = Incremental.mergeSampleStates(
      Incremental.sampleStates(rows.filter(col("id") % 2 === 0), Seq("g"), "id", 16),
      rows.filter(col("id") % 2 =!= 0), Seq("g"), "id", 16)
    assertSameRows(merged, full)
    // per-group sizes: min(k, distinct ids)
    val sizes = full.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 16L, "b" -> 16L, "c" -> 2L))
    // unsaturated group counts exactly; saturated estimates are sane
    val est = Incremental.estimateDistinctKmv(full, Seq("g"), 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("c") == 2.0)
    assert(est("a") > 20.0 && est("a") < 500.0, s"a est ${est("a")}")
    assert(est("b") > 40.0 && est("b") < 1000.0, s"b est ${est("b")}")
  }

  private lazy val leftRows = df("lk BIGINT, payload STRING",
    (1L to 200L).map(i => Row(i, s"p$i")) :+ Row(null, "pnull"))
  private lazy val rightRows = df("rk BIGINT",
    Seq(Row(3L), Row(50L), Row(199L), Row(999L), Row(null)))

  test("bloom semi join is bit-identical to the plain semi join") {
    val out = BloomJoin.semiJoin(leftRows, rightRows, "lk", "rk",
      expectedItems = 16)
    val exact = leftRows.join(
      rightRows, leftRows("lk") === rightRows("rk"), "left_semi")
    assertSameRows(out, exact)
    assert(out.count() == 3)
  }

  test("bloom anti join is bit-identical to the plain anti join, nulls kept") {
    val out = BloomJoin.antiJoin(leftRows, rightRows, "lk", "rk",
      expectedItems = 16)
    val exact = leftRows.join(
      rightRows, leftRows("lk") === rightRows("rk"), "left_anti")
    assertSameRows(out, exact)
    assert(out.filter(col("lk").isNull).count() == 1)
  }

  test("bloom joins fall back to the plain join on an empty build side") {
    val empty = rightRows.filter(col("rk") === -1L)
    // anti join against nothing keeps EVERY left row
    assert(BloomJoin.antiJoin(leftRows, empty, "lk", "rk", 16).count()
      == leftRows.count())
    assert(BloomJoin.semiJoin(leftRows, empty, "lk", "rk", 16).count() == 0)
  }

  test("bloom filter probe admits every present key (no false negatives)") {
    val bf = BloomJoin.buildFilter(rightRows, "rk", expectedItems = 16)
    val present = rightRows.filter(col("rk").isNotNull)
      .filter(BloomJoin.mightContain(bf, col("rk")))
    assert(present.count() == 4)
  }

  test("driver testdata contract: events.ts is a microsecond TIMESTAMP_NTZ") {
    // the round-7 driver regenerated events.parquet as timestamp[us] (it
    // was int64 nanos before); every event-time entry derives epoch micros
    // via unix_micros on the UTC-session cast, so a schema flip must fail
    // HERE, not as 18 opaque driver-gate failures
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists)
    val e = spark.read.parquet(s"$dir/events.parquet")
    assert(e.schema("ts").dataType == TimestampNTZType)
    val us = e.select(unix_micros(col("ts").cast("timestamp")).as("us"))
    assert(us.filter(col("us").isNull).count() == 0)
  }

  test("histogram states: grid quantiles and disjoint merge") {
    val rows = (1 to 10).map(i => Row("g", i.toDouble))
    val all = df("k STRING, v DOUBLE", rows)
    val scratch = Incremental.histStates(all, Seq("k"), col("v"), 0.0, 10.0, 10)
    val q = Incremental.quantileFromHist(
      scratch, Seq("k"), 0.0, 10.0, 10,
      Seq((0.5, "p50"), (0.9, "p90"))).collect().head
    // bins = floor(v) clamped to 9 (10 joins 9): p50 -> bin 5, p90 -> bin 9
    assert(q.getDouble(1) == 5.0 && q.getDouble(2) == 9.0)
    val merged = Incremental.mergeHistStates(
      Incremental.histStates(
        df("k STRING, v DOUBLE", rows.take(4)), Seq("k"), col("v"),
        0.0, 10.0, 10),
      df("k STRING, v DOUBLE", rows.drop(4)), Seq("k"), col("v"),
      0.0, 10.0, 10)
    assertSameRows(merged, scratch)
  }

  test("minhash states merge equals from-scratch on any split") {
    val rows = (1 to 60).map(i =>
      Row(s"k${i % 4}", s"el${i % 17}"))
    val all = df("k STRING, e STRING", rows)
    val scratch = Incremental.minhashStates(all, Seq("k"), "e", 8)
    // split unevenly AND overlap the delta with the base — min is
    // idempotent, so overlap must not perturb the signature
    val base = df("k STRING, e STRING", rows.take(40))
    val delta = df("k STRING, e STRING", rows.drop(25))
    val merged = Incremental.mergeMinhashStates(
      Incremental.minhashStates(base, Seq("k"), "e", 8),
      delta, Seq("k"), "e", 8)
    assertSameRows(merged, scratch)
    assert(scratch.count() == 4 * 8)
  }

  test("minhash lane recipe matches an independent digest computation") {
    // pins the portable contract: hash_i(x) = 60-bit lane i%4 of
    // sha256("salt|i/4|x") — the DuckDB oracles spell this exact
    // substring arithmetic, so a recipe drift must fail here first
    val rows = Seq(Row("k", "alpha"), Row("k", "beta"), Row("k", "gamma"))
    val st = Incremental.minhashStates(
      df("k STRING, e STRING", rows), Seq("k"), "e", 8, salt = 7L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hash(i: Long, e: String): Long = {
      val hex = md.digest(s"7|${i / 4}|$e".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val off = (15 * (i % 4)).toInt
      java.lang.Long.parseLong(hex.substring(off, off + 15), 16)
    }
    assert(st.size == 8)
    for (i <- 0L to 7L)
      assert(st(i) == Seq("alpha", "beta", "gamma").map(hash(i, _)).min)
  }

  test("signatureSimilarity reads Jaccard estimates off the states") {
    val a = (1 to 30).map(i => Row("a", s"x$i"))
    val b = (1 to 30).map(i => Row("b", s"x$i")) // identical to a
    val c = (1 to 30).map(i => Row("c", s"y$i")) // disjoint
    val st = Incremental.minhashStates(
      df("k STRING, e STRING", a ++ b ++ c), Seq("k"), "e", 8)
    val sim = graft.ops.Similarity.signatureSimilarity(st, "k", 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(sim(("a", "b")) == ((8L, 1000000L)))
    assert(sim(("a", "c"))._1 <= 2L)
    assert(sim.size == 3)
  }

  test("minhash signature similarity tracks set similarity") {
    // identical element sets -> identical signatures; disjoint sets ->
    // (overwhelmingly) different signatures
    val a = (1 to 30).map(i => Row("a", s"x$i"))
    val b = (1 to 30).map(i => Row("b", s"x$i"))
    val c = (1 to 30).map(i => Row("c", s"y$i"))
    val st = Incremental.minhashStates(
      df("k STRING, e STRING", a ++ b ++ c), Seq("k"), "e", 8)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap)
      .toMap
    assert(st("a") == st("b"))
    assert((0L to 7L).count(i => st("a")(i) == st("c")(i)) <= 2)
  }
}
