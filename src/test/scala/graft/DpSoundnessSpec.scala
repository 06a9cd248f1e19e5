package graft

import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.interactive._
import graft.measures._
import graft.measurements._
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Adversarial regression tests for privacy-accounting soundness — each of
  * these once failed (bugs found in review, not by the oracle gate, which
  * only sees noise-free paths).
  */
class DpSoundnessSpec extends SharedSpark {

  test("empty groups draw independent quantile noise") {
    import spark.implicits._
    val data = Seq(("x", 5.0)).toDF("G", "V") // a, b, c all empty
    val keys = Seq("a", "b", "c").toDF("G")
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "V" -> ColumnDescriptor.double()),
      Seq("G"))
    val m = NoisyQuantileGrouped(gdom, SumOf(SymmetricDifference),
      "V", 0.5, 0.0, 100.0, Some(1.0))
    val out = m(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
    val vals = out.filter(col("G") =!= "x").collect().map(_.getDouble(1))
    // three independent uniform draws: collision probability ~0
    assert(vals.toSet.size == 3, s"correlated empty-group draws: ${vals.toSeq}")
    // still frozen across actions
    assert(out.collect().toSeq.map(_.toSeq) == out.collect().toSeq.map(_.toSeq))
  }

  test("empty-group quantile fill follows the groupSeed scheme, exactly rounded") {
    import spark.implicits._
    val data = Seq(("x", 5.0)).toDF("G", "V")
    val keys = Seq("a", "b", "x").toDF("G")
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "V" -> ColumnDescriptor.double()),
      Seq("G"))
    val (lo, hi) = (0.0, 100.0)
    def run(seed: Long): Map[String, Double] =
      NoisyQuantileGrouped(gdom, SumOf(SymmetricDifference),
        "V", 0.5, lo, hi, Some(1.0), seedOverride = Some(seed))(
        GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = run(42L)
    // pinned to the same per-group stream every other draw uses: one Gumbel
    // uniform for the single (lo, hi) gap interval, then Precise.uniform —
    // NOT Spark's rand(), which lived outside the seeding scheme
    for (g <- Seq("a", "b")) {
      val rng = new graft.random.SplitMix(
        graft.random.RandomSource.groupSeed(
          42L, graft.transformations.GroupKeys.encode(Row(g), Seq(0))))
      rng.nextDouble()
      val expected = graft.random.Precise.uniform(lo, hi, rng)
      assert(out(g) == expected, s"group $g: ${out(g)} != $expected")
    }
    // reproducible under the pinned seed, distinct across groups
    assert(run(42L) == out)
    assert(out("a") != out("b"))
  }

  test("sketch empty-group fill follows the groupSeed scheme, exactly rounded") {
    import spark.implicits._
    val data = Seq(("x", 5.0)).toDF("G", "V")
    val keys = Seq("a", "b", "x").toDF("G")
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "V" -> ColumnDescriptor.double()),
      Seq("G"))
    val (lo, hi) = (0.0, 100.0)
    def run(seed: Long): Map[String, Double] =
      NoisyQuantileSketch(gdom, SumOf(SymmetricDifference),
        "V", 0.5, lo, hi, Some(1.0), PureDP, numBins = 16, "quantile",
        seedOverride = Some(seed))(GroupedDataFrame(data, keys))
        .asInstanceOf[DataFrame]
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = run(42L)
    // the empty-input branch consumes exactly one Precise.uniform from the
    // group's seeded stream (no Gumbel pre-draw — the histogram EM's empty
    // branch has no interval competition), so the fill is pinnable:
    for (g <- Seq("a", "b")) {
      val rng = new graft.random.SplitMix(
        graft.random.RandomSource.groupSeed(
          42L, graft.transformations.GroupKeys.encode(Row(g), Seq(0))))
      val expected = graft.random.Precise.uniform(lo, hi, rng)
      assert(out(g) == expected, s"group $g: ${out(g)} != $expected")
    }
    // reproducible under the pinned seed, distinct across groups
    assert(run(42L) == out)
    assert(out("a") != out("b"))
  }

  test("parallel queryable meters repeated queries to the same index") {
    val domain = DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true)))
    val part = df("A STRING", Seq(Row("a")))
    def m(eps: Long) = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum(eps)), Some(df("A STRING", Seq(Row("a")))))
    val comp = ParallelComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(2)), numElements = 2)
    val q = comp(Seq[Any](part, part)).asInstanceOf[ParallelQueryable]
    q.answer(IndexQuery(0, MeasurementQuery(m(2))))
    // second full-budget query against the SAME element must be refused
    assertThrows[IllegalStateException](
      q.answer(IndexQuery(0, MeasurementQuery(m(1)))))
    // the next element still has its own fresh budget
    q.answer(IndexQuery(1, MeasurementQuery(m(2))))
  }

  test("partition selection delta accounts for the tau - d survival event") {
    val d = DataFrameDomain(Seq("U" -> ColumnDescriptor.long))
    def deltaAt(tau: Long): Double =
      GeometricPartitionSelection(d, Rational(1), tau)
        .privacyFunction(ExactNum(1)) match {
        case ApproxDPBudget(_, dd) => dd.toDouble
        case b                     => fail(s"unexpected $b")
      }
    // an individual with 1 row forming a group of count 1 is released iff
    // noise >= tau - 1; at tau = 1 that is noise >= 0, probability > 1/2
    assert(deltaAt(1) == 1.0 || deltaAt(1) > 0.5)
    // requested delta must be an upper bound after threshold inversion
    for (eps <- Seq(0.5, 1.0, 3.0); target <- Seq(1e-3, 1e-6, 1e-9)) {
      val m = Aggregations.createPartitionSelectionMeasurement(
        d, eps, target, ExactNum(1))
      m.privacyFunction(ExactNum(1)) match {
        case ApproxDPBudget(e, dd) =>
          assert(dd.toDouble <= target * 1.0000001,
            s"eps=$eps target=$target got delta=${dd.toDouble}")
          assert(e.toDouble <= eps * 1.0000001)
        case b => fail(s"unexpected $b")
      }
    }
  }

  test("partition selection: empirical single-user survival calibrates declared delta") {
    // Statistical calibration of the privacy function, in the reference's
    // noise_distribution_tests accept/reject discipline: a user whose ONE
    // row forms an otherwise-empty group survives selection iff
    // 1 + noise >= tau — exactly the delta_1 event the privacy function
    // prices (delta_1 = P(Y >= tau-1) = 1 - CMF(tau-2)). Run 200k
    // independent single-user groups in ONE pass (each group draws its own
    // noise) and hold the empirical survival rate to the declared delta
    // within a 4.5-sigma binomial band (false-trigger odds ~7e-6; an alpha
    // miscalibration of 5% sits ~10 sigma out, so the band is diagnostic,
    // not decorative).
    val N = 200000L
    val d = DataFrameDomain(Seq("U" -> ColumnDescriptor.long))
    val m = GeometricPartitionSelection(d, Rational(1), 5L)
    val declared = m.privacyFunction(ExactNum(1)) match {
      case ApproxDPBudget(_, dd) => dd.toDouble
      case b                     => fail(s"unexpected $b")
    }
    // the declared delta must be the analytic survival probability itself
    // (round-up to double, so equal to ~1e-16 relative): for the two-sided
    // geometric at scale 1, P(Y >= 4) = e^-4 / (1 + e^-1)
    val p = math.exp(-4.0) / (1.0 + math.exp(-1.0))
    assert(math.abs(declared - p) / p < 1e-12, s"declared=$declared analytic=$p")
    val singles = spark.range(N).select(col("id").as("U"))
    val survivors = m(singles).asInstanceOf[DataFrame].count()
    val rate = survivors.toDouble / N
    val band = 4.5 * math.sqrt(p * (1 - p) / N)
    assert(rate <= declared + band,
      s"survival $rate exceeds declared delta $declared + $band — the " +
        "mechanism releases sparse groups more often than it claims")
    assert(rate >= declared - band,
      s"survival $rate below declared delta $declared - $band — noise " +
        "wider than priced (utility bug or CMF drift)")
  }

  test("GroupBy rejects L2-grouped input distances") {
    val dom = DataFrameDomain(
      Seq("A" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor.long))
    val keys = df("A STRING", Seq(Row("a")))
    val gb = GroupBy(dom, IfGroupedBy("A", RootSumOfSquared(SymmetricDifference)),
      useL2 = true, keys)
    assertThrows[IllegalArgumentException](gb.stabilityFunction(ExactNum(1)))
    // non-key grouped column is also rejected
    val gb2 = GroupBy(dom, IfGroupedBy("X", SumOf(SymmetricDifference)),
      useL2 = false, keys)
    assertThrows[IllegalArgumentException](gb2.stabilityFunction(ExactNum(1)))
    // the sound case passes
    val gb3 = GroupBy(dom, IfGroupedBy("A", SumOf(SymmetricDifference)),
      useL2 = false, keys)
    assert(gb3.stabilityFunction(ExactNum(2)) == ExactNum(2))
  }

  test("integer-column average is unbiased for fractional midpoints") {
    import spark.implicits._
    // values 1..4 in one group; bounds [1, 4] -> midpoint 2.5 (fractional)
    val data = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)).toDF("G", "X")
    val keys = Seq("g").toDF("G")
    val dom = DataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor.long))
    val m = Aggregations.createAverageMeasurement(
      dom, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.PosInf), "X",
      Rational(1), Rational(4), Some(keys))
    val avg = m(data).asInstanceOf[DataFrame].select("average").head().getDouble(0)
    assert(math.abs(avg - 2.5) < 1e-9, s"biased average: $avg")
  }

  test("UnwrapIfGroupedBy only unwraps SumOf/RootSumOfSquared inner metrics") {
    val dom = DataFrameDomain(
      Seq("A" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor.long))
    // the unsound chain: AddRemoveKeys-style group-level SymmetricDifference
    // must NOT pass through as a row-level distance
    assertThrows[IllegalArgumentException](
      UnwrapIfGroupedBy(dom, "A", SymmetricDifference))
    val l1 = UnwrapIfGroupedBy(dom, "A", SumOf(SymmetricDifference))
    assert(l1.outputMetric == SymmetricDifference)
    assert(l1.stabilityFunction(ExactNum(3)) == ExactNum(3))
    val l2 = UnwrapIfGroupedBy(dom, "A", RootSumOfSquared(SymmetricDifference))
    assert(l2.outputMetric == SymmetricDifference)
    assert(l2.stabilityFunction(ExactNum(3)) == ExactNum(9))
  }

  test("per-group noise seeds survive 32-bit hash collisions") {
    // "Aa" and "BB" share a Java hashCode; their noise streams must differ
    assert("Aa".hashCode == "BB".hashCode)
    val seed = 12345L
    assert(graft.random.RandomSource.groupSeed(seed, "Aa") !=
      graft.random.RandomSource.groupSeed(seed, "BB"))
  }

  test("duplicate key-table rows release each group once, not twice") {
    import spark.implicits._
    // a duplicated key row must NOT produce two (independently noised)
    // releases of the same group — reference dedups keys at construction
    val data = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("G", "X")
    val keys = Seq("a", "a", "b").toDF("G") // "a" duplicated
    val dom = DataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor.long))
    val m = Aggregations.createCountMeasurement(
      dom, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum.PosInf), Some(keys))
    val out = m(data).asInstanceOf[DataFrame].collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(out == Seq(("a", 2L), ("b", 1L)), s"got $out")
  }

  test("tight CKS zCDP conversion dominates the classic bound and stays sound") {
    import graft.measurements.TightZcdp
    for (rho <- Seq(0.01, 0.1, 0.5, 2.0); delta <- Seq(1e-3, 1e-6, 1e-9)) {
      val epsStd = rho + 2.0 * math.sqrt(rho * -math.log(delta))
      val epsTight = TightZcdp.epsFor(rho, delta)
      // never worse than the classic bound...
      assert(epsTight <= epsStd + 1e-9, s"rho=$rho delta=$delta: $epsTight > $epsStd")
      // ...and the claimed (ε, δ) is actually satisfied per the δ(ε) curve
      assert(TightZcdp.deltaFor(rho, epsTight) <= delta * (1 + 1e-6),
        s"rho=$rho delta=$delta eps=$epsTight")
      // strictly better in the typical regime
      if (delta <= 1e-6) assert(epsTight < epsStd * 0.999,
        s"no improvement at rho=$rho delta=$delta: $epsTight vs $epsStd")
    }
    for (eps <- Seq(0.5, 1.0, 4.0); delta <- Seq(1e-3, 1e-6)) {
      val b = math.sqrt(-math.log(delta))
      val x = -b + math.sqrt(b * b + eps)
      val rhoStd = x * x
      val rhoTight = TightZcdp.rhoFor(eps, delta)
      assert(rhoTight >= rhoStd * (1 - 1e-6),
        s"calibration regressed: $rhoTight < $rhoStd")
      assert(TightZcdp.deltaFor(rhoTight, eps) <= delta * (1 + 1e-6),
        s"unsound rho at eps=$eps delta=$delta")
    }
    // delta is monotone increasing in rho (more privacy loss, bigger tail)
    assert(TightZcdp.deltaFor(0.1, 2.0) < TightZcdp.deltaFor(0.3, 2.0))
  }

  test("exponential mechanism survives weight underflow at extreme epsilon") {
    // all mass at 10 inside [0, 1000]: without the max-score shift every
    // weight underflows at eps=5000 and the old code fell back to the
    // deterministic midpoint 500 — a data-dependent output outside the proof
    // at q=0.25 the interval [0,10] (rank distance 250) strictly dominates
    // [10,1000] (rank distance 750): every draw must land in it
    val vals = Seq.fill(1000)(10.0)
    val rs = (1 to 50).map { i =>
      NoisyQuantileCore.compute(vals, 0.25, 0.0, 1000.0, Some(5000.0),
        new graft.random.SplitMix(i.toLong))
    }
    assert(rs.forall(v => v >= 0.0 && v <= 10.0), s"draws far from mass: $rs")
    // histogram path: same property
    val counts = Array.tabulate(100)(k => if (k == 1) 1000L else 0L)
    val hs = (1 to 50).map { i =>
      NoisyQuantileCore.computeFromHistogram(counts, 0.5, 0.0, 1000.0,
        Some(5000.0), new graft.random.SplitMix(i.toLong))
    }
    assert(hs.count(v => v >= 10.0 && v < 20.0) >= 45, s"hist draws: $hs")
  }
}
