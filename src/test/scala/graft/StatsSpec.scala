package graft

import graft.ops.Stats
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Inferential statistics: Welch t on a hand-computed example, the
  * chi-square contingency table including zero-observed cells, and the
  * independence (all-zero) case. */
class StatsSpec extends SharedSpark {

  test("welchT matches the hand computation") {
    val data = df("k STRING, v STRING, x DOUBLE", Seq(
      Row("g", "A", 1.0), Row("g", "A", 2.0), Row("g", "A", 3.0),
      Row("g", "B", 2.0), Row("g", "B", 4.0),
      Row("g", "C", 99.0))) // other variants are ignored
    val r = Stats.welchT(data, Seq("k"), col("v"), col("x"), "A", "B")
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(row.getDouble(3) == 2.0 && row.getDouble(4) == 3.0)
    assert(row.getDouble(5) == 1.0 && row.getDouble(6) == 2.0)
    // t = (2-3)/sqrt(1/3 + 1) = -sqrt(3)/2; dof = 32/19
    assert(math.abs(row.getDouble(7) - (-math.sqrt(3.0) / 2)) < 1e-12)
    assert(math.abs(row.getDouble(8) - 32.0 / 19.0) < 1e-12)
  }

  test("welchT drops keys with fewer than two observations per side") {
    val data = df("k STRING, v STRING, x DOUBLE", Seq(
      Row("one", "A", 1.0), Row("one", "B", 2.0), Row("one", "B", 3.0)))
    assert(Stats.welchT(data, Seq("k"), col("v"), col("x"), "A", "B")
      .count() == 0)
  }

  test("chi2 contributions vanish on an independent table") {
    // obs [[10,20],[30,60]] has expected == observed everywhere
    val rows = Seq(
      ("r1", "c1", 10), ("r1", "c2", 20), ("r2", "c1", 30),
      ("r2", "c2", 60)).flatMap { case (r, c, n) =>
      Seq.fill(n)(Row(r, c))
    }
    val out = Stats.chi2Contingency(
      df("r STRING, c STRING", rows), col("r"), col("c")).collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(4) == 0L))
  }

  test("chi2 emits zero-observed cells and reassembles the statistic") {
    // r1 only in c1 (5 rows), r2 only in c2 (5 rows): chi2 = n = 10
    val rows = Seq.fill(5)(Row("r1", "c1")) ++ Seq.fill(5)(Row("r2", "c2"))
    val data = df("r STRING, c STRING", rows)
    val cells = Stats.chi2Contingency(data, col("r"), col("c")).collect()
    assert(cells.length == 4)
    val zeros = cells.filter(_.getLong(2) == 0L)
    assert(zeros.length == 2 && zeros.forall(_.getLong(3) == 2500L))
    val stat = Stats.chi2Statistic(data, col("r"), col("c")).collect().head
    assert(stat.getLong(0) == 10000000L && stat.getLong(1) == 1L)
  }

  test("linearTrendByGroup recovers an exact line and drops degenerates") {
    val rows =
      // g: y = 2 + 0.5x at x = 0..4 (exact on the cents grid)
      (0 to 4).map(i => Row("g", i.toLong, 2.0 + 0.5 * i)) ++ Seq(
        Row("single", 1L, 5.0), // n < 2: dropped
        Row("flat", 1L, 3.0), Row("flat", 2L, 3.0), // vary = 0: dropped
        Row("novar", 5L, 1.0), Row("novar", 5L, 2.0)) // varx = 0: dropped
    val out = Stats.linearTrendByGroup(
      df("k STRING, x BIGINT, y DOUBLE", rows), Seq("k"), col("x"),
      col("y")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "g" && r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("welchT sums are partition-order independent") {
    val rows = (1 to 400).map { i =>
      Row("g", if (i % 2 == 0) "A" else "B", i * 0.37)
    }
    val base = df("k STRING, v STRING, x DOUBLE", rows)
    val a = Stats.welchT(base.repartition(1), Seq("k"),
      col("v"), col("x"), "A", "B")
    val b = Stats.welchT(base.repartition(7), Seq("k"),
      col("v"), col("x"), "A", "B")
    assertSameRows(a, b)
  }
}
