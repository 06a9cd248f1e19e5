package graft

import graft.ops.Market
import org.apache.spark.sql.Row

/** Market-basket mining: pair counts, the deterministic basket cap, and
  * the ppm rule arithmetic on a hand-computed example. */
class MarketSpec extends SharedSpark {

  private def baskets(rows: (Long, Long)*) =
    df("basket BIGINT, item BIGINT", rows.map(r => Row(r._1, r._2)))

  // b1:{1,2,3} b2:{1,2} b3:{1,2,4} b4:{3}
  private val fixture = baskets(
    1L -> 1L, 1L -> 2L, 1L -> 3L,
    2L -> 1L, 2L -> 2L,
    3L -> 1L, 3L -> 2L, 3L -> 4L,
    4L -> 3L)

  test("frequentPairs counts distinct co-occurrences above threshold") {
    val out = Market.frequentPairs(fixture, "basket", "item",
      minPairCount = 2L, maxBasketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)))
    val all = Market.frequentPairs(fixture, "basket", "item",
      minPairCount = 1L, maxBasketSize = 0).collect()
    assert(all.length == 5) // (1,2) (1,3) (2,3) (1,4) (2,4)
  }

  test("duplicate (basket, item) rows do not inflate pair counts") {
    val dup = baskets(1L -> 1L, 1L -> 1L, 1L -> 2L, 1L -> 2L)
    val out = Market.frequentPairs(dup, "basket", "item",
      minPairCount = 1L, maxBasketSize = 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 2L, 1L)))
  }

  test("basket cap keeps the k smallest items — bounded and deterministic") {
    val wide = baskets((1L to 5L).map(i => 1L -> i): _*)
    val out = Market.frequentPairs(wide, "basket", "item",
      minPairCount = 1L, maxBasketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // only items {1,2,3} survive the cap -> exactly their 3 pairs
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("capped path: a NULL item occupies a cap slot but never pairs " +
    "(pinned NULL divergence vs the uncapped collect_list branch)") {
    // basket 1 = {NULL, 1, 2, 3}; cap 3 keeps the 3 smallest slots with
    // NULL first -> {NULL, 1, 2}, so the only emitted pair is (1, 2).
    val withNull = df("basket BIGINT, item BIGINT",
      Seq(Row(1L, null), Row(1L, 1L), Row(1L, 2L), Row(1L, 3L)))
    val capped = Market.frequentPairs(withNull, "basket", "item",
      minPairCount = 1L, maxBasketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(capped.toSeq == Seq((1L, 2L)))
    // the uncapped branch drops the NULL entirely: all 3 real pairs emit
    val uncapped = Market.frequentPairs(withNull, "basket", "item",
      minPairCount = 1L, maxBasketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(uncapped.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("basketCapReport quantifies what the cap excludes") {
    val wide = baskets(
      (1L to 5L).map(i => 1L -> i) ++ Seq(2L -> 1L, 2L -> 2L): _*)
    val r = Market.basketCapReport(wide, "basket", "item", 3)
      .collect().head
    assert(r.getLong(0) == 2L) // baskets
    assert(r.getLong(1) == 1L) // only the 5-item basket is capped
    assert(r.getLong(2) == 2L) // it loses 5 - 3 items
  }

  test("sampleToProportions: binding source caps the max-volume mix") {
    val d = df("id BIGINT, src STRING",
      (1L to 6L).map(i => Row(i, "A")) ++
        Seq(Row(7L, "B"), Row(8L, "B")) ++
        Seq(Row(9L, "C"))) // C not in weights: dropped
    val out = graft.ops.Dedup.sampleToProportions(
      d, "src", "id", Map("A" -> 1L, "B" -> 1L))
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    // W=2; T = min(6*2/1, 2*2/1) = 4; k_A = k_B = 4/2 = 2
    assert(out == Map("A" -> 2, "B" -> 2))
    // determinism: same selection on re-run and repartition
    val a = graft.ops.Dedup.sampleToProportions(
      d.repartition(1), "src", "id", Map("A" -> 1L, "B" -> 1L))
    val b = graft.ops.Dedup.sampleToProportions(
      d.repartition(5), "src", "id", Map("A" -> 1L, "B" -> 1L))
    assertSameRows(a, b)
  }

  test("sampleToProportions: a weighted source absent from the data binds T = 0") {
    val d = df("id BIGINT, src STRING",
      (1L to 6L).map(i => Row(i, "A")))
    // B is in the weight map but supplies zero rows: the corpus cannot
    // realize a 1:1 A:B mix at any volume, so the output must be empty
    // (not "A at full quota")
    assert(graft.ops.Dedup.sampleToProportions(
      d, "src", "id", Map("A" -> 1L, "B" -> 1L)).count() == 0L)
  }

  test("associationRules ppm arithmetic on the hand-computed example") {
    val out = Market.associationRules(fixture, "basket", "item",
      minPairCount = 2L, maxBasketSize = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
      .toMap
    // pair (1,2): n=3 of 4 baskets; item counts 3 and 3
    // support = 3/4, conf = 3/3, lift = 3*4/(3*3) = 4/3
    val expect = (3L, 3L, 3L, 750000L, 1000000L, 1333333L)
    assert(out((1L, 2L)) == expect)
    assert(out((2L, 1L)) == expect)
    assert(out.size == 2)
  }
}
