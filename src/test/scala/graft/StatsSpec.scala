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

  test("welchT ignores null metric rows entirely (counts and moments)") {
    val data = df("k STRING, v STRING, x DOUBLE", Seq(
      Row("g", "A", 1.0), Row("g", "A", 2.0), Row("g", "A", 3.0),
      Row("g", "A", null), // must not count toward n_a or shift moments
      Row("g", "B", 2.0), Row("g", "B", 4.0), Row("g", "B", null)))
    val row = Stats.welchT(data, Seq("k"), col("v"), col("x"), "A", "B")
      .collect().head
    assert(row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(row.getDouble(3) == 2.0 && row.getDouble(4) == 3.0)
    assert(row.getDouble(5) == 1.0 && row.getDouble(6) == 2.0)
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

  test("miContingency: ln2 on perfect association, zero on independence") {
    val perfect = df("r STRING, c STRING",
      Seq.fill(5)(Row("r1", "c1")) ++ Seq.fill(5)(Row("r2", "c2")))
    val cells = Stats.miContingency(perfect, col("r"), col("c"))
      .collect()
    // each cell: (5/10)·ln(5/2.5) = 0.5·ln2 -> 346574 ppm
    assert(cells.length == 2 && cells.forall(_.getLong(3) == 346574L))
    val mi = Stats.miStatistic(perfect, col("r"), col("c"))
      .collect().head.getLong(0)
    assert(mi == 693148L) // 2·346574, = ln 2 ppm up to per-cell rounding
    val indep = df("r STRING, c STRING",
      Seq(("r1", "c1", 10), ("r1", "c2", 20), ("r2", "c1", 30),
        ("r2", "c2", 60)).flatMap { case (r, c, n) =>
        Seq.fill(n)(Row(r, c))
      })
    assert(Stats.miContingency(indep, col("r"), col("c")).collect()
      .forall(_.getLong(3) == 0L))
  }

  test("cramersV is 1 on perfect association") {
    val perfect = df("r STRING, c STRING",
      Seq.fill(5)(Row("r1", "c1")) ++ Seq.fill(5)(Row("r2", "c2")))
    val v = Stats.cramersV(perfect, col("r"), col("c")).collect().head
    assert(v.getLong(0) == 10000000L) // chi2 = n
    assert(v.getLong(1) == 1L && v.getLong(2) == 10L)
    assert(v.getLong(3) == 1000000L)
  }

  test("aucByGroup: separation, inversion mix, ties, null exclusion") {
    def auc(rows: Seq[Row]): Long =
      Stats.aucByGroup(df("g STRING, s DOUBLE, p BOOLEAN", rows),
        Seq("g"), col("s"), col("p")).collect().head.getLong(3)
    val sep = Seq(Row("g", 1.0, false), Row("g", 2.0, false),
      Row("g", 3.0, true), Row("g", 4.0, true))
    assert(auc(sep) == 1000000L)
    val mix = Seq(Row("g", 1.0, true), Row("g", 2.0, false),
      Row("g", 3.0, true), Row("g", 4.0, false))
    assert(auc(mix) == 250000L)
    val tie = Seq(Row("g", 2.0, true), Row("g", 2.0, false))
    assert(auc(tie) == 500000L)
    // a null-label row must not shift the ranks of labeled rows
    val withNull = sep :+ Row("g", 10.0, null)
    assert(auc(withNull) == 1000000L)
    // one-class groups are dropped
    val oneClass = Seq(Row("h", 1.0, true), Row("h", 2.0, true))
    assert(Stats.aucByGroup(
      df("g STRING, s DOUBLE, p BOOLEAN", oneClass),
      Seq("g"), col("s"), col("p")).count() == 0)
  }

  test("precisionAtK reports the deterministic top-k cut") {
    val rows = Seq(
      Row("g", 5.0, 1L, true), Row("g", 4.0, 2L, false),
      Row("g", 3.0, 3L, true), Row("g", 2.0, 4L, false),
      Row("g", 1.0, 5L, true))
    val r = Stats.precisionAtK(
      df("g STRING, s DOUBLE, id BIGINT, p BOOLEAN", rows),
      Seq("g"), col("s"), col("p"), k = 2, tie = col("id"))
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 500000L && r.getLong(5) == 333333L)
    // tie on score: the smaller tie column wins the cut
    val tied = Seq(
      Row("g", 5.0, 2L, false), Row("g", 5.0, 1L, true))
    val r2 = Stats.precisionAtK(
      df("g STRING, s DOUBLE, id BIGINT, p BOOLEAN", tied),
      Seq("g"), col("s"), col("p"), k = 1, tie = col("id"))
      .collect().head
    assert(r2.getLong(2) == 1L) // the id=1 positive row made the top-1
  }

  test("q_mi_assoc fixture preserves its ppm hash guard band") {
    // raw 1e6·(c/n)·ln(c/e) must sit far from .5 boundaries (1-ulp ln
    // drift is ~1e-10 at this magnitude)
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cells = docs
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .groupBy(col("lang").as("row_label"), col("source").as("col_label"))
      .agg(count(lit(1)).as("n_obs"))
    val rt = cells.groupBy("row_label").agg(sum("n_obs").as("rt"))
    val ct = cells.groupBy("col_label").agg(sum("n_obs").as("ct"))
    val tot = cells.select(sum("n_obs").as("n"))
    val e = (col("rt") * col("ct")).cast("double") / col("n")
    val raw = cells.join(rt, Seq("row_label")).join(ct, Seq("col_label"))
      .crossJoin(broadcast(tot))
      .select((lit(1000000.0) * (col("n_obs").cast("double") / col("n"))
        * log(col("n_obs").cast("double") / e)).as("raw"))
    val margin = raw
      .select(min(abs(col("raw") - floor(col("raw")) - lit(0.5))).as("m"))
      .head().getDouble(0)
    assert(margin > 1e-4,
      f"mi ppm margin $margin%.2e too tight for the hash gate")
  }

  test("momentsByGroup: symmetric flat, right-skewed, degenerate drops") {
    val d = df("g STRING, v DOUBLE", Seq(
      // uniform {1..4}: mean 2.5, var 1.25, skew 0, kurt -1.36
      Row("u", 1.0), Row("u", 2.0), Row("u", 3.0), Row("u", 4.0),
      // right-skewed {0,0,0,4}
      Row("r", 0.0), Row("r", 0.0), Row("r", 0.0), Row("r", 4.0),
      Row("flat", 7.0), Row("flat", 7.0), // zero variance: dropped
      Row("one", 3.0))) // n < 2: dropped
    val out = Stats.momentsByGroup(d, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set("u", "r"))
    val (mu, v2, sk, ku) = out("u")
    assert(mu == 2.5 && v2 == 1.25)
    assert(math.abs(sk) < 1e-12)
    assert(math.abs(ku - (-1.36)) < 1e-12)
    // {0,0,0,4}: mu 1, m2 3, m3 6/sqrt(27)... skew = 2/sqrt(3)
    val (mur, v2r, skr, _) = out("r")
    assert(mur == 1.0 && v2r == 3.0)
    assert(math.abs(skr - 2.0 / math.sqrt(3.0)) < 1e-12)
  }

  test("anovaEta matches the hand computation and is fold-order pinned") {
    val d = df("g STRING, v DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 5.0), Row("B", 7.0)))
    val r = Stats.anovaEta(d, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    // SSB = 160000 c², SST = 200000 c² -> eta² = 0.8, F = 8
    assert(math.abs(r.getDouble(2) - 0.8) < 1e-12)
    assert(math.abs(r.getDouble(3) - 8.0) < 1e-12)
    // partitioning must not move the folded doubles
    val rows = (1 to 300).map(i => Row(s"g${i % 4}", i * 0.73))
    val big = df("g STRING, v DOUBLE", rows)
    assertSameRows(
      Stats.anovaEta(big.repartition(1), col("g"), col("v")),
      Stats.anovaEta(big.repartition(13), col("g"), col("v")))
  }

  test("ndcgAtK: hand case with shared literal discount table") {
    val w = Stats.ndcgWeights(3)
    assert(w == Seq(1000000L, 630930L, 500000L))
    val rows = Seq(
      Row("g", 4.0, 1L, true), Row("g", 3.0, 2L, false),
      Row("g", 2.0, 3L, true), Row("g", 1.0, 4L, true))
    val r = Stats.ndcgAtK(
      df("g STRING, s DOUBLE, id BIGINT, p BOOLEAN", rows),
      Seq("g"), col("s"), col("p"), k = 3, tie = col("id"))
      .collect().head
    assert(r.getLong(1) == 3L) // positives overall
    assert(r.getLong(2) == 1500000L) // ranks 1 and 3 in the top-3
    assert(r.getLong(3) == 2130930L) // ideal: w1+w2+w3 (3 positives)
    assert(r.getLong(4) ==
      math.round(1000000.0 * 1500000L / 2130930L))
    // perfect ranking scores exactly 1e6
    val perfect = Seq(
      Row("h", 4.0, 1L, true), Row("h", 3.0, 2L, true),
      Row("h", 2.0, 3L, false))
    val rp = Stats.ndcgAtK(
      df("g STRING, s DOUBLE, id BIGINT, p BOOLEAN", perfect),
      Seq("g"), col("s"), col("p"), k = 3, tie = col("id"))
      .collect().head
    assert(rp.getLong(4) == 1000000L)
  }

  test("giniByGroup: equality, concentration, tie invariance") {
    val d = df("g STRING, v DOUBLE", Seq(
      Row("eq", 1.0), Row("eq", 1.0), Row("eq", 1.0), Row("eq", 1.0),
      Row("top", 0.0), Row("top", 0.0), Row("top", 0.0), Row("top", 4.0),
      Row("neg", -1.0), Row("neg", 2.0))) // negative row excluded
    val out = Stats.giniByGroup(d, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("eq") == 0L)
    assert(out("top") == 750000L) // (2·16 − 5·4)/(4·4)
    assert(out("neg") == 0L) // single remaining row
    // equal values: any tie permutation gives the same rank sum
    val ties = df("g STRING, v DOUBLE",
      (1 to 100).map(i => Row("t", (i % 5).toDouble)))
    val a = Stats.giniByGroup(ties.repartition(1), Seq("g"), col("v"))
    val b = Stats.giniByGroup(ties.repartition(11), Seq("g"), col("v"))
    assertSameRows(a, b)
  }

  test("herfindahlByGroup: monopoly 1e6, k equal entities 1e6/k") {
    val d = df("g STRING, e STRING", Seq(
      Row("mono", "a"), Row("mono", "a"), Row("mono", "a"),
      Row("uni", "a"), Row("uni", "b"), Row("uni", "c")))
    val out = Stats.herfindahlByGroup(d, Seq("g"), col("e"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("mono") == ((1L, 3L, 1000000L)))
    assert(out("uni") == ((3L, 3L, 333333L)))
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

  test("aucByGroup plans one exchange: windows and aggregate share it") {
    val rows = (1 to 200).map(i =>
      Row(s"g${i % 3}", i * 0.7, i % 2 == 0))
    val plan = Stats.aucByGroup(
      df("g STRING, s DOUBLE, p BOOLEAN", rows),
      Seq("g"), col("s"), col("p"))
      .queryExecution.executedPlan.toString
    // hashpartitioning(g) satisfies the (g, s) tie window's clustering
    // and the final aggregate's distribution — one shuffle total
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("precisionAtK plans a WindowGroupLimit top-k pre-prune") {
    val rows = (1 to 200).map(i =>
      Row(s"g${i % 3}", i * 0.7, i.toLong, i % 2 == 0))
    val plan = Stats.precisionAtK(
      df("g STRING, s DOUBLE, id BIGINT, p BOOLEAN", rows),
      Seq("g"), col("s"), col("p"), k = 5, tie = col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number top-k filter should pre-prune per partition:\n$plan")
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
