package graft

import graft.exact.ExactNum
import graft.metrics._
import org.apache.spark.sql.Row

class MetricDistanceSpec extends SharedSpark {

  private def d1 = df("A STRING", Seq(Row("x"), Row("x"), Row("y")))
  private def d2 = df("A STRING", Seq(Row("x"), Row("y"), Row("z")))

  test("symmetric difference counts multiset changes") {
    assert(MetricDistance.compute(SymmetricDifference, d1, d2) == ExactNum(2))
    assert(MetricDistance.compute(SymmetricDifference, d1, d1) == ExactNum.zero)
  }

  test("hamming distance counts changed rows") {
    assert(MetricDistance.compute(HammingDistance, d1, d2) == ExactNum(1))
  }

  test("absolute difference on scalars") {
    assert(MetricDistance.compute(AbsoluteDifference, 7L, 10L) == ExactNum(3))
  }

  test("L1/L2 combinations") {
    val xs = Seq(1L, 5L)
    val ys = Seq(4L, 9L)
    assert(
      MetricDistance.compute(SumOf(AbsoluteDifference), xs, ys) == ExactNum(7)
    )
    assert(
      MetricDistance.compute(RootSumOfSquared(AbsoluteDifference), xs, ys) ==
        ExactNum(25).sqrt
    )
  }

  test("OnColumn applies the inner metric to one column") {
    val a = df("K STRING, count BIGINT", Seq(Row("a", 3L)))
    val b = df("K STRING, count BIGINT", Seq(Row("a", 5L)))
    assert(
      MetricDistance.compute(
        OnColumn("count", SumOf(AbsoluteDifference)), a, b) == ExactNum(2)
    )
  }

  test("IfGroupedBy combines per-group distances") {
    val a = df("G STRING, X BIGINT", Seq(Row("g1", 1L), Row("g1", 2L), Row("g2", 3L)))
    val b = df("G STRING, X BIGINT", Seq(Row("g1", 1L), Row("g2", 3L), Row("g2", 4L)))
    // g1: symdiff 1 (removed (g1,2)); g2: symdiff 1 (added (g2,4))
    assert(
      MetricDistance.compute(
        IfGroupedBy("G", SumOf(SymmetricDifference)), a, b) == ExactNum(2)
    )
    assert(
      MetricDistance.compute(
        IfGroupedBy("G", RootSumOfSquared(SymmetricDifference)), a, b) ==
        ExactNum(2).sqrt
    )
  }

  test("AddRemoveKeys counts key changes across tables") {
    val a = Map(
      "t1" -> df("K BIGINT", Seq(Row(1L), Row(2L))),
      "t2" -> df("K BIGINT", Seq(Row(2L)))
    )
    val b = Map(
      "t1" -> df("K BIGINT", Seq(Row(1L))),
      "t2" -> df("K BIGINT", Seq(Row(2L), Row(3L)))
    )
    val m = AddRemoveKeys(Map("t1" -> "K", "t2" -> "K"))
    assert(MetricDistance.compute(m, a, b) == ExactNum(1)) // key 3 added... key 2 still present via t2
  }
}
