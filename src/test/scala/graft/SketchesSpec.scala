package graft

import graft.ops.Sketches
import graft.plans.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters ([[graft.plans.HeavyHittersAgg]]): the exact
  * path (distinct ≤ k) must equal GROUP BY counts bit-for-bit and be
  * partition-layout-independent; the eviction path's counter values are
  * arrival-order-dependent by design, so it is pinned on its
  * order-independent CONTRACT: `count_min <= f <= count_max`,
  * `count_max - count_min <= n/(k+1)`, and every item with
  * `f > n/(k+1)` survives.
  */
class SketchesSpec extends SharedSpark {

  private def skewed(n: Int) = {
    // item "hot" ~ n/2 occurrences, "warm" ~ n/4, tail of singletons
    import spark.implicits._
    spark.sparkContext
      .parallelize(0 until n, 8)
      .map { i =>
        if (i % 2 == 0) "hot"
        else if (i % 4 == 1) "warm"
        else s"tail_$i"
      }
      .toDF("item")
  }

  test("exact path: distinct <= k reproduces GROUP BY counts exactly") {
    val d = df("s STRING", (0 until 1000).map(i => Row(s"v${i % 7}")))
      .repartition(8)
    val hh = Sketches.heavyHitters(d, "s", k = 16)
    val expected = d.groupBy(col("s").as("item"))
      .agg(count(lit(1)).as("count_min"), count(lit(1)).as("count_max"))
    assertSameRows(hh, expected)
    // exactness is visible in the output: zero error width
    assert(hh.filter(col("count_min") =!= col("count_max")).count() == 0)
  }

  test("exact path is independent of partition layout") {
    val base = df("s STRING", (0 until 500).map(i => Row(s"v${i % 5}")))
    val a = Sketches.heavyHitters(base.repartition(1), "s", 8)
    val b = Sketches.heavyHitters(base.repartition(13), "s", 8)
    assertSameRows(a, b)
  }

  test("eviction path: bounds contain true counts and heavy items survive") {
    val n = 4000
    val d = skewed(n)
    val k = 10
    val truth = d.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val res = Sketches.heavyHitters(d, "item", k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxErr = n.toDouble / (k + 1)
    res.foreach { case (item, lo, hi) =>
      val f = truth.getOrElse(item, 0L)
      assert(lo <= f && f <= hi, s"$item: [$lo,$hi] should contain $f")
      assert(hi - lo <= maxErr, s"$item err ${hi - lo} > n/(k+1)=$maxErr")
    }
    // anything above the error bound is guaranteed present
    val present = res.map(_._1).toSet
    truth.filter(_._2 > maxErr).keys.foreach { heavy =>
      assert(present.contains(heavy), s"heavy item $heavy evicted")
    }
    assert(res.length <= k)
  }

  test("eviction-path contract holds across different partition layouts") {
    val n = 3000
    for (parts <- Seq(1, 4, 17)) {
      val d = skewed(n).repartition(parts)
      val truth = d.groupBy("item").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val res = Sketches.heavyHitters(d, "item", 8).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      res.foreach { case (item, lo, hi) =>
        val f = truth.getOrElse(item, 0L)
        assert(lo <= f && f <= hi, s"parts=$parts $item: [$lo,$hi] ∌ $f")
      }
      assert(res.map(_._1).contains("hot"))
    }
  }

  test("per-group summaries are independent") {
    val rows = (0 until 600).map { i =>
      Row(if (i % 2 == 0) "g1" else "g2", s"v${i % 3}")
    }
    val d = df("g STRING, s STRING", rows).repartition(5)
    val hh = Sketches.heavyHittersBy(d, Seq("g"), "s", 8)
    val expected = d.groupBy(col("g"), col("s").as("item"))
      .agg(count(lit(1)).as("count_min"), count(lit(1)).as("count_max"))
    assertSameRows(hh, expected)
  }

  test("null items are ignored, not counted") {
    val d = df("s STRING", Seq(Row("a"), Row(null), Row("a"), Row(null), Row("b")))
    val res = Sketches.heavyHitters(d, "s", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == Map("a" -> 2L, "b" -> 1L))
  }

  test("heavy_hitters is callable from SQL") {
    GraftFunctions.register(spark)
    df("s STRING", (0 until 90).map(i => Row(s"x${i % 3}")))
      .createOrReplaceTempView("hh_t")
    val rows = spark.sql(
      """SELECT h.item AS item, h.count_min AS c
        |FROM (SELECT heavy_hitters(s, 8) AS hs FROM hh_t)
        |LATERAL VIEW explode(hs) t AS h""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("x0" -> 30L, "x1" -> 30L, "x2" -> 30L))
  }

  test("summary array is sorted by (count_min desc, item)") {
    val rows = (0 until 100).map(i => Row(s"v${i % 4}")) ++
      (0 until 50).map(_ => Row("v0"))
    val d = df("s STRING", rows)
    val arr = d.agg(Sketches.heavyHittersAgg(col("s"), 8).as("hs"))
      .select(col("hs")).head().getSeq[Row](0)
    val pairs = arr.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs == pairs.sortBy { case (c, i) => (-c, i) })
    assert(pairs.head._2 == "v0")
  }
}
