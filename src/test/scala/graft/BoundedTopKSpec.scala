package graft

import graft.transformations.Truncation
import graft.ops.Market
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence gates for the bounded-aggregate selection path
  * (BoundedTopKAgg): every routed operator must return EXACTLY the row
  * set the window formulation returns, on data with duplicate rows, NULL
  * groups/keys, a hot group, and enough partitions that the aggregate's
  * partial/merge/serialize path actually runs.
  */
class BoundedTopKSpec extends SharedSpark {

  private def fixture: DataFrame = {
    val rng = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val g: java.lang.Long =
        if (i % 97 == 0) null
        else if (rng.nextInt(10) < 4) 0L // hot group: ~40% of rows
        else (rng.nextInt(40) + 1).toLong
      val k: java.lang.Long =
        if (i % 131 == 0) null else rng.nextInt(25).toLong
      val v = s"payload_${rng.nextInt(50)}"
      Row(g, k, v)
    } ++ Seq.fill(30)(Row(5L, 3L, "dup_row")) // exact duplicate rows
    df("G BIGINT, K BIGINT, V STRING", rows).repartition(13)
  }

  test("truncateLargeGroupsSalted (agg path) == single-window selection") {
    val data = fixture
    for (tau <- Seq(0, 1, 3, 17)) {
      val got = Truncation.truncateLargeGroupsSalted(data, Seq("G"), tau)
      val w = Window.partitionBy(col("G"))
        .orderBy(Truncation.rowHash(data) +: data.columns.map(col): _*)
      val want = data.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= tau).drop("__rn")
      assertSameRows(got, want)
    }
  }

  test("limitKeysPerGroup (agg path) == distinct-pair rank selection") {
    val data = fixture
    for (tau <- Seq(1, 4, 11)) {
      val got = Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), tau)
      val pairs = data.select(col("G"), col("K")).distinct()
      val w = Window.partitionBy(col("G"))
        .orderBy(Truncation.colsHash(Seq("K")), col("K"))
      val kept = pairs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= tau).drop("__rn")
      val cond = Seq("G", "K").map(c => data(c) <=> kept(c)).reduce(_ && _)
      val want = data.join(kept, cond, "left_semi")
      assertSameRows(got, want)
    }
  }

  test("topKPerGroupByScore (agg path) == score window on unique tiebreak") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 3000).map { i =>
      val g = (i % 23).toLong
      val score: java.lang.Double =
        if (i % 57 == 0) null else rng.nextInt(12).toDouble
      Row(g, i.toLong, score)
    }
    val data = df("G BIGINT, ID BIGINT, S DOUBLE", rows).repartition(9)
    for (k <- Seq(1, 5)) {
      val got = Truncation.topKPerGroupByScore(data, Seq("G"), "S", Seq("ID"), k)
      val w = Window.partitionBy(col("G")).orderBy(
        negate(coalesce(col("S").cast("double"),
          lit(Double.NegativeInfinity))), col("ID"))
      val want = data.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
      assertSameRows(got, want)
    }
  }

  test("frequentPairs capped baskets == distinct + rank-window capping") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 4000).map { i =>
      val b = (i % 150).toLong
      val item: java.lang.Long =
        if (i % 301 == 0) null
        else if (b == 0) rng.nextInt(500).toLong // hot basket, many items
        else rng.nextInt(12).toLong
      Row(b, item)
    }
    val data = df("B BIGINT, I BIGINT", rows).repartition(7)
    val got = Market.frequentPairs(data, "B", "I",
      minPairCount = 1L, maxBasketSize = 6)
    val b0 = data.select(col("B").as("basket"), col("I").as("item")).distinct()
    val w = Window.partitionBy(col("basket")).orderBy(col("item"))
    val capped = b0.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 6).drop("__rn")
    val want = capped.as("a")
      .join(capped.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 1)
    assertSameRows(got, want)
  }

  test("large-threshold window path still in force above the agg bound") {
    // thresholds above aggPathMaxThreshold must keep returning the same
    // selection through the salted-window machinery
    val data = fixture
    val got = Truncation.truncateLargeGroupsSalted(data, Seq("G"), 2000)
    assert(got.count() == data.count()) // tau > every group size: keep all
  }
}
