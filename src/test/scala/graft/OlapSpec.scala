package graft

import graft.ops.Olap
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** OLAP lattice aggregation, reshaping, and grouped exact statistics. */
class OlapSpec extends SharedSpark {

  private def sales = df("region STRING, nation STRING, amt DOUBLE",
    Seq(Row("EU", "FR", 10.0), Row("EU", "FR", 5.0), Row("EU", "DE", 7.0),
      Row("AS", "JP", 3.0)))

  test("rollupAgg emits the hierarchical subtotal lattice with grouping ids") {
    val out = Olap.rollupAgg(sales, Seq("region", "nation"),
      Seq(sum(col("amt")).as("total"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("EU", "FR", 15.0, 0L), ("EU", "DE", 7.0, 0L), ("AS", "JP", 3.0, 0L),
      ("EU", null, 22.0, 1L), ("AS", null, 3.0, 1L),
      (null, null, 25.0, 3L)))
  }

  test("cubeAgg adds the per-nation marginal the rollup lacks") {
    val out = Olap.cubeAgg(sales, Seq("region", "nation"),
      Seq(sum(col("amt")).as("total"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // gid=2: region aggregated away, nation kept
    assert(out.contains((null, "FR", 15.0, 2L)))
    // 3 pairs + 2 region marginals + 3 nation marginals + 1 grand total
    assert(out.size == 9)
  }

  test("grouping id disambiguates genuine NULL dimension values") {
    val withNull = sales.union(df("region STRING, nation STRING, amt DOUBLE",
      Seq(Row("EU", null, 100.0))))
    val out = Olap.rollupAgg(withNull, Seq("region", "nation"),
      Seq(sum(col("amt")).as("total"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // data NULL keeps gid=0; the subtotal row over EU now includes it
    assert(out.contains(("EU", null, 100.0, 0L)))
    assert(out.contains(("EU", null, 122.0, 1L)))
  }

  test("pivotAgg renames explicit pivot values and fills absent cells null") {
    val out = Olap.pivotAgg(sales, Seq("region"), "nation",
      values = Seq("FR", "DE", "JP"), names = Seq("fr", "de", "jp"),
      agg = sum(col("amt")))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.get(1), r.get(2), r.get(3))).toMap
    assert(rows("EU") == ((15.0, 7.0, null)))
    assert(rows("AS") == ((null, null, 3.0)))
  }

  test("unpivotLong is the inverse reshape of a wide aggregate") {
    val wide = df("k STRING, a DOUBLE, b DOUBLE", Seq(Row("x", 1.0, 2.0)))
    val out = Olap.unpivotLong(wide, Seq("k"), Seq("a", "b"), "metric", "val")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out == Set(("x", "a", 1.0), ("x", "b", 2.0)))
  }

  test("percentilesByGroup matches quantile_cont linear interpolation") {
    val d = df("g STRING, v DOUBLE",
      Seq(Row("a", 1.0), Row("a", 2.0), Row("a", 3.0), Row("a", 4.0)))
    val out = Olap.percentilesByGroup(d, Seq("g"), col("v"),
      Seq(0.5 -> "p50", 0.25 -> "p25")).collect().head
    assert(out.getDouble(1) == 2.5) // (2+3)/2
    assert(out.getDouble(2) == 1.75) // 1 + 0.75
  }

  test("argMax is deterministic under ties via the payload order") {
    val d = df("g STRING, score DOUBLE, id BIGINT",
      Seq(Row("a", 1.0, 10L), Row("a", 1.0, 20L), Row("a", 0.5, 99L)))
    val out = Olap.argMax(d, Seq("g"), Seq(col("score")),
      Seq("id" -> col("id"))).collect().head
    assert(out.getLong(1) == 20L) // tie on score broken by larger id
  }

  test("stringAgg is partition-order independent (sorted inside the group)") {
    val d = df("g STRING, v STRING",
      Seq(Row("a", "z"), Row("a", "m"), Row("a", "b"))).repartition(3)
    val out = Olap.stringAgg(d, Seq("g"), col("v"), ",", "vs").collect().head
    assert(out.getString(1) == "b,m,z")
  }

  test("histogramFixed clamps out-of-range values into the edge bins") {
    val d = df("v DOUBLE",
      Seq(Row(-5.0), Row(0.0), Row(9.9), Row(10.0), Row(25.0), Row(99.0),
        Row(null)))
    val out = Olap.histogramFixed(d, col("v"), 0.0, 30.0, 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(0L) == ((0.0, 3L))) // -5 clamped, 0, 9.9
    assert(out(1L) == ((10.0, 1L)))
    assert(out(2L) == ((20.0, 2L))) // 25, 99 clamped; null dropped
  }

  test("weightedMedianByGroup picks the lower weighted median") {
    val d = df("g STRING, v DOUBLE, w DOUBLE", Seq(
      // unit weights: plain lower median of {1,2,3} = 2
      Row("u", 1.0, 1.0), Row("u", 2.0, 1.0), Row("u", 3.0, 1.0),
      // heavy small value dominates: {1 w5, 10 w1} -> 1
      Row("h", 1.0, 5.0), Row("h", 10.0, 1.0),
      // even split takes the lower value: {1 w1, 2 w1} -> 1
      Row("e", 1.0, 1.0), Row("e", 2.0, 1.0)))
    val out = Olap.weightedMedianByGroup(d, Seq("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("u" -> 2.0, "h" -> 1.0, "e" -> 1.0))
  }

  test("weightedMedianByGroup plans one exchange for windows and agg") {
    val rows = (1 to 200).map(i =>
      Row(s"g${i % 3}", (i % 25).toDouble, (i % 7 + 1).toDouble))
    val plan = Olap.weightedMedianByGroup(
      df("g STRING, v DOUBLE, w DOUBLE", rows), Seq("g"), col("v"),
      col("w")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("weightedMedianByGroup is invariant to partitioning and ties") {
    val rows = (1 to 500).map { i =>
      Row("g", (i % 25).toDouble, (i % 7 + 1).toDouble)
    }
    val base = df("g STRING, v DOUBLE, w DOUBLE", rows)
    val a = Olap.weightedMedianByGroup(
      base.repartition(1), Seq("g"), col("v"), col("w"))
    val b = Olap.weightedMedianByGroup(
      base.repartition(13), Seq("g"), col("v"), col("w"))
    assertSameRows(a, b)
  }
}
