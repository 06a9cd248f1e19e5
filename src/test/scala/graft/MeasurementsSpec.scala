package graft

import graft.core._
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.measurements._
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

class MeasurementsSpec extends SharedSpark {

  private val longCol = ColumnDescriptor.long

  test("noise mechanism privacy functions") {
    assert(
      NoisePrivacy.privacyFunction(LaplaceMechanism(Rational(2)), ExactNum(1)) ==
        PureDPBudget(ExactNum.ratio(1, 2))
    )
    assert(
      NoisePrivacy.privacyFunction(GeometricMechanism(Rational(1, 2)), ExactNum(1)) ==
        PureDPBudget(ExactNum(2))
    )
    assert(
      NoisePrivacy.privacyFunction(DiscreteGaussianMechanism(Rational(2)), ExactNum(2)) ==
        RhoZCDPBudget(ExactNum(1))
    )
    // zero scale + nonzero distance → infinite loss
    assert(
      NoisePrivacy.privacyFunction(LaplaceMechanism(Rational.zero), ExactNum(1)) ==
        PureDPBudget(ExactNum.PosInf)
    )
  }

  test("AddNoise expression: scale 0 is the identity") {
    val data = df("K STRING, count BIGINT", Seq(Row("a", 5L), Row("b", 7L)))
    val out = data.withColumn("count",
      AddNoise(col("count"), GeometricMechanism(Rational.zero)))
    assert(sortedRows(out) == Seq(Seq("a", "5"), Seq("b", "7")))
  }

  test("AddNoise expression: geometric noise has the right spread") {
    val n = 20000
    val data = spark.range(n).withColumnRenamed("id", "v")
    val alpha = Rational(2)
    val noised = data
      .withColumn("noisy", AddNoise(col("v"), GeometricMechanism(alpha)))
      .withColumn("noise", col("noisy") - col("v"))
    val stats = noised.agg(
      avg(col("noise")).as("mean"),
      variance(col("noise")).as("var")
    ).head()
    val e = math.exp(1.0 / alpha.toDouble)
    val expectedVar = 2 * e / math.pow(e - 1, 2)
    assert(math.abs(stats.getDouble(0)) < 0.15, s"mean=${stats.getDouble(0)}")
    assert(
      math.abs(stats.getDouble(1) - expectedVar) / expectedVar < 0.1,
      s"var=${stats.getDouble(1)} expected=$expectedVar"
    )
  }

  test("AddNoise discrete Gaussian through codegen has variance ≈ sigma^2") {
    val n = 20000
    val data = spark.range(n).withColumnRenamed("id", "v")
    val sigmaSq = graft.exact.Rational(9)
    val stats = data
      .withColumn("noisy", AddNoise(col("v"), DiscreteGaussianMechanism(sigmaSq)))
      .select((col("noisy") - col("v")).as("e"))
      .agg(avg(col("e")), variance(col("e")))
      .head()
    assert(math.abs(stats.getDouble(0)) < 0.15, s"mean=${stats.getDouble(0)}")
    assert(
      math.abs(stats.getDouble(1) - 9.0) / 9.0 < 0.1,
      s"var=${stats.getDouble(1)}"
    )
  }

  test("AddNoiseToColumn materializes (stable across actions)") {
    val data = df("K STRING, count BIGINT", Seq(Row("a", 100L), Row("b", 200L)))
    val m = AddNoiseToColumn(
      DataFrameDomain(Seq("K" -> ColumnDescriptor.string(true), "count" -> longCol)),
      OnColumn("count", SumOf(AbsoluteDifference)),
      "count",
      GeometricMechanism(Rational(5))
    )
    val out = m(data).asInstanceOf[DataFrame]
    // materialized: two collects see identical noise
    assert(sortedRows(out) == sortedRows(out))
    val again = out.collect().toSeq.map(_.toSeq)
    assert(again == out.collect().toSeq.map(_.toSeq))
  }

  test("end-to-end noisy count: per-group noise matches the geometric law") {
    // 2000 groups with known count 3 each; noisy counts − 3 are iid
    // two-sided-geometric(α = d/ε = 1) samples through the FULL pipeline
    // (groupBy + key join + noise expression + sanitize).
    import spark.implicits._
    val n = 2000
    val data = (0 until n).flatMap(g => Seq.fill(3)(g.toLong)).toDF("G")
    val keys = (0 until n).map(_.toLong).toDF("G")
    val domain = DataFrameDomain(Seq("G" -> longCol))
    val m = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum(1)), Some(keys))
    val out = m(data).asInstanceOf[DataFrame]
    val noise = out.select((col("count") - lit(3L)).as("e"))
      .agg(avg(col("e")), variance(col("e"))).head()
    val alpha = 1.0
    val e = math.exp(1.0 / alpha)
    val expectedVar = 2 * e / math.pow(e - 1, 2)
    assert(math.abs(noise.getDouble(0)) < 0.2, s"mean=${noise.getDouble(0)}")
    assert(
      math.abs(noise.getDouble(1) - expectedVar) / expectedVar < 0.25,
      s"var=${noise.getDouble(1)} expected=$expectedVar"
    )
  }

  test("end-to-end noisy sum with Laplace matches the Laplace law") {
    import spark.implicits._
    val n = 2000
    val data = (0 until n).map(g => (g.toLong, 1.0d)).toDF("G", "X")
    val keys = (0 until n).map(_.toLong).toDF("G")
    val domain = DataFrameDomain(
      Seq("G" -> longCol, "X" -> ColumnDescriptor.double()))
    // sensitivity 2, ε = 1 → b = 2
    val m = Aggregations.createSumMeasurement(
      domain, SymmetricDifference, NoiseKind.Laplace, ExactNum(1),
      PureDPBudget(ExactNum(1)), "X", graft.exact.Rational(0),
      graft.exact.Rational(2), Some(keys))
    val out = m(data).asInstanceOf[DataFrame]
    val noise = out.select((col("sum") - lit(1.0d)).as("e"))
      .agg(avg(col("e")), variance(col("e"))).head()
    val b = 2.0
    assert(math.abs(noise.getDouble(0)) < 0.3, s"mean=${noise.getDouble(0)}")
    assert(
      math.abs(noise.getDouble(1) - 2 * b * b) / (2 * b * b) < 0.25,
      s"var=${noise.getDouble(1)} expected=${2 * b * b}"
    )
  }

  test("sketch quantile matches the exact path at high epsilon and scales") {
    import spark.implicits._
    val data = (0 until 3).flatMap(g => (1 to 999).map(v => (g.toLong, (v % 100).toDouble + 1)))
      .toDF("G", "X")
    val keys = (0 until 4).map(_.toLong).toDF("G") // group 3 is empty
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> longCol, "X" -> ColumnDescriptor.double()), Seq("G"))
    val m = NoisyQuantileSketch(gdom, SumOf(SymmetricDifference),
      "X", 0.5, 0.0, 200.0, Some(8.0), PureDP, numBins = 64, "median")
    val out = m(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
    val medians = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(medians.size == 4)
    (0L until 3L).foreach { g =>
      assert(math.abs(medians(g) - 50.0) < 15.0, s"group $g median=${medians(g)}")
    }
    assert(medians(3L) >= 0.0 && medians(3L) <= 200.0) // empty-group draw
    // noise-free sketch path lands on the near-median boundary
    val m0 = NoisyQuantileSketch(gdom, SumOf(SymmetricDifference),
      "X", 0.5, 0.0, 200.0, None, PureDP, numBins = 64, "median")
    val exact = m0(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
      .filter(col("G") < 3).collect().map(_.getDouble(1))
    exact.foreach(v => assert(math.abs(v - 50.0) < 3.0, s"median=$v"))
  }

  test("variance is the sample variance, NaN under 2 points, clamped to range²/4") {
    import spark.implicits._
    val data = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L)).toDF("G", "X")
    val keys = Seq("a", "b", "c").toDF("G")
    val dom = DataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor.long))
    val m = Aggregations.createVarianceMeasurement(
      dom, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.PosInf), "X",
      graft.exact.Rational(0), graft.exact.Rational(40), Some(keys))
    val out = m(data).asInstanceOf[DataFrame].collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    // sample variance of {10,20,30} = 100; "b" has 1 point, "c" none → NaN
    assert(math.abs(out("a") - 100.0) < 1e-9, s"a=${out("a")}")
    assert(out("b").isNaN && out("c").isNaN, s"$out")
    // clamp: two points at the bounds give sample var (u−l)²/2 > (u−l)²/4
    val extreme = Seq(("a", 0L), ("a", 40L)).toDF("G", "X")
    val m2 = Aggregations.createVarianceMeasurement(
      dom, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.PosInf), "X",
      graft.exact.Rational(0), graft.exact.Rational(40),
      Some(Seq("a").toDF("G")))
    val v = m2(extreme).asInstanceOf[DataFrame].head().getDouble(1)
    assert(v == 400.0, s"clamp failed: $v") // (40−0)²/4
    // the dedicated stddev factory is sqrt of the same pipeline
    val m3 = Aggregations.createStandardDeviationMeasurement(
      dom, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.PosInf), "X",
      graft.exact.Rational(0), graft.exact.Rational(40), Some(keys))
    val sd = m3(data).asInstanceOf[DataFrame].collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(sd("a") - 10.0) < 1e-9, s"stddev=${sd("a")}")
    assert(sd("b").isNaN && sd("c").isNaN)
  }

  test("noisy grouped quantile stays in bounds and near the target") {
    import spark.implicits._
    val data = (0 until 3).flatMap(g => (1 to 99).map(v => (g.toLong, v.toDouble)))
      .toDF("G", "X")
    val keys = (0 until 3).map(_.toLong).toDF("G")
    val domain = DataFrameDomain(
      Seq("G" -> longCol, "X" -> ColumnDescriptor.double()))
    val m = Aggregations.createQuantileMeasurement(
      domain, SymmetricDifference, ExactNum(1), PureDPBudget(ExactNum(5)),
      "X", 0.5, 0.0, 100.0, keys, "median")
    val out = m(data).asInstanceOf[DataFrame]
    val medians = out.select("median").collect().map(_.getDouble(0))
    medians.foreach(v => assert(v >= 0.0 && v <= 100.0))
    medians.foreach(v => assert(math.abs(v - 50.0) < 25.0, s"median=$v"))
  }

  test("grouped quantile streams huge groups without materializing them") {
    import spark.implicits._
    // one 4M-row group beside two small ones: the streaming Gumbel-argmax
    // EM and the window count never hold a group in task memory, so this
    // completes where a per-group materializing flatMapGroups would buffer
    // 4M doubles in one task. Noise-free path must equal the interpolated
    // quantile; the noisy path must stay within the mechanism's bounds.
    val big = spark.range(4000000L).select(
      lit(0L).as("G"), (col("id") % 1001).cast("double").as("X"))
    val small = Seq((1L, 10.0), (1L, 20.0), (2L, 70.0)).toDF("G", "X")
    val data = big.unionByName(small)
    val keys = Seq(0L, 1L, 2L, 3L).toDF("G")
    val domain = DataFrameDomain(
      Seq("G" -> longCol, "X" -> ColumnDescriptor.double()))
    val exact = Aggregations.createQuantileMeasurement(
      domain, SymmetricDifference, ExactNum(1), PureDPBudget(ExactNum.PosInf),
      "X", 0.5, 0.0, 1000.0, keys, "median")
    val got = exact(data).asInstanceOf[DataFrame].collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(0L) - 500.0) < 1.0, s"big-group median=${got(0L)}")
    assert(got(1L) == 15.0 && got(2L) == 70.0)
    assert(got(3L) == 500.0) // empty group: midpoint fill on the exact path
    val noisy = Aggregations.createQuantileMeasurement(
      domain, SymmetricDifference, ExactNum(1), PureDPBudget(ExactNum(5)),
      "X", 0.5, 0.0, 1000.0, keys, "median")
    val nv = noisy(data).asInstanceOf[DataFrame].collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(nv(0L) >= 0.0 && nv(0L) <= 1000.0)
    assert(math.abs(nv(0L) - 500.0) < 100.0, s"noisy big-group median=${nv(0L)}")
  }

  test("count measurement with infinite budget is exact and group-complete") {
    val data = df("A STRING", Seq(Row("a"), Row("a"), Row("b")))
    val keys = df("A STRING", Seq(Row("a"), Row("c")))
    val m = Aggregations.createCountMeasurement(
      DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true))),
      SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum.PosInf), Some(keys))
    val out = m(data).asInstanceOf[DataFrame]
    assert(sortedRows(out) == Seq(Seq("a", "2"), Seq("c", "0")))
  }

  test("count measurement privacy function: eps = d_in/alpha via scale calc") {
    val domain = DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true)))
    val keys = df("A STRING", Seq(Row("a")))
    val m = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum(1)), Some(keys))
    // built for eps=1 at d_in=1 → privacyFunction(1) == 1
    assert(m.privacyFunction(ExactNum(1)) == PureDPBudget(ExactNum(1)))
    // at d_in=2 → eps doubles
    assert(m.privacyFunction(ExactNum(2)) == PureDPBudget(ExactNum(2)))
  }

  test("zCDP sum measurement privacy function") {
    val domain = DataFrameDomain(
      Seq("A" -> ColumnDescriptor.string(true), "X" -> longCol))
    val keys = df("A STRING", Seq(Row("a")))
    val m = Aggregations.createSumMeasurement(
      domain, SymmetricDifference, NoiseKind.DiscreteGaussian, ExactNum(1),
      RhoZCDPBudget(ExactNum(1)), "X", Rational(0), Rational(2), Some(keys))
    // sensitivity 2, rho target 1 → sigma^2 = 4/2 = 2; at d_in=1:
    // rho = sens^2/(2 sigma^2) = 4/4 = 1
    assert(m.privacyFunction(ExactNum(1)) == RhoZCDPBudget(ExactNum(1)))
  }

  test("composition adds budgets") {
    val domain = ScalarDomain(longCol)
    val m1 = AddNoiseScalar(domain, GeometricMechanism(Rational(1)))
    val m2 = AddNoiseScalar(domain, GeometricMechanism(Rational(2)))
    val c = Composition(Seq(m1, m2))
    assert(
      c.privacyFunction(ExactNum(1)) ==
        PureDPBudget(ExactNum.one + ExactNum.ratio(1, 2))
    )
    val outs = c(5L).asInstanceOf[Seq[Any]]
    assert(outs.size == 2)
  }

  test("converters: PureDP to zCDP squares epsilon over two") {
    val m = AddNoiseScalar(ScalarDomain(longCol), GeometricMechanism(Rational(1, 2)))
    val conv = PureDPToRhoZCDP(m)
    assert(conv.privacyFunction(ExactNum(1)) == RhoZCDPBudget(ExactNum(2)))
  }

  test("quantile noise-free path interpolates like quantile_cont") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0)
    val r = new graft.random.SplitMix(1)
    val q50 = NoisyQuantileCore.compute(vals, 0.5, 0.0, 10.0, None, r)
    assert(q50 == 2.5)
    val q25 = NoisyQuantileCore.compute(vals, 0.25, 0.0, 10.0, None, r)
    assert(q25 == 1.75)
    // empty group → midpoint of bounds
    assert(NoisyQuantileCore.compute(Nil, 0.5, 0.0, 10.0, None, r) == 5.0)
  }

  test("noisy quantile lands in-range and near the target at high epsilon") {
    val vals = (1 to 99).map(_.toDouble)
    val r = new graft.random.SplitMix(42)
    val estimates = (1 to 50).map(_ =>
      NoisyQuantileCore.compute(vals, 0.5, 0.0, 100.0, Some(5.0), r))
    estimates.foreach(e => assert(e >= 0.0 && e <= 100.0))
    val mean = estimates.sum / estimates.size
    assert(math.abs(mean - 50.0) < 5.0, s"mean=$mean")
  }

  test("partition selection with zero alpha keeps counts >= threshold") {
    val data = df("U BIGINT",
      (1 to 10).map(_ => Row(1L)) ++ Seq(Row(2L), Row(2L), Row(3L)))
    val m = GeometricPartitionSelection(
      DataFrameDomain(Seq("U" -> longCol)), Rational.zero, 2L)
    val out = m(data).asInstanceOf[DataFrame]
    assert(sortedRows(out) == Seq(Seq("1", "10"), Seq("2", "2")))
  }

  test("partition selection delta decreases with threshold") {
    val d = DataFrameDomain(Seq("U" -> longCol))
    def delta(tau: Long): Double = {
      val m = GeometricPartitionSelection(d, Rational(1), tau)
      m.privacyFunction(ExactNum(1)) match {
        case ApproxDPBudget(_, dd) => dd.toDouble
        case b                     => fail(s"unexpected $b")
      }
    }
    assert(delta(20) < delta(5))
    assert(delta(5) < 1.0)
  }

  test("partition selection delta matches the reference exact CMF to printed precision") {
    // reference: δ₁ = 1 − CMF(τ−2) with the exact two-sided geometric
    // CMF, δ_d = d·e^{d/α}·δ₁; pinned against the doubles the reference
    // prints via to_float(round_up=True)
    val d = DataFrameDomain(Seq("U" -> longCol))
    def budget(alpha: Rational, tau: Long, dIn: Long): (Double, Double) =
      GeometricPartitionSelection(d, alpha, tau)
        .privacyFunction(ExactNum(dIn)) match {
        case ApproxDPBudget(e, dd) => (e.toDouble, dd.toDouble)
        case b                     => fail(s"unexpected $b")
      }
    // reference doctest (spark_measurements.py:448-466): alpha=1, tau=50
    assert(budget(Rational(1), 50L, 1L) == ((1.0, 3.8328565409781243e-22)))
    assert(budget(Rational(1), 50L, 2L)._2 == 5.664238400088129e-21)
    // reference unit test (test_spark_measurements.py:386-404): alpha=3,
    // tau=100 — base and the amplified d_in = 3
    assert(budget(Rational(3), 100L, 1L)._2 == 2.7141282634373037e-15)
    val (e3, dd3) = budget(Rational(3), 100L, 3L)
    assert(e3 == 1.0 && dd3 == 2.213329661582618e-14)
    // the k <= 0 branch: tau = 1 leaves better-than-even survival odds
    assert(budget(Rational(1), 1L, 1L)._2 > 0.5)
  }

  test("partition selection threshold inversion matches the exact inverse CMF") {
    // reference: tau = ceil(-alpha*ln((e^{1/alpha}+1)*delta')) + 2 with
    // delta' = delta/(d*e^eps) for d > 1; expected values computed with a
    // 60-digit decimal replica of the reference's symbolic inversion
    val d = DataFrameDomain(Seq("U" -> longCol))
    def tau(eps: Double, delta: Double, dIn: Long): Long =
      Aggregations.createPartitionSelectionMeasurement(
        d, eps, delta, ExactNum(dIn)).threshold
    assert(tau(1.0, 1e-10, 1L) == 24L)
    assert(tau(0.5, 1e-6, 1L) == 28L)
    assert(tau(3.0, 1e-9, 2L) == 18L)
    // large delta drives the inverse into the k <= 0 CMF branch
    assert(tau(1.0, 0.9, 1L) == 1L)
    assert(tau(1.0, 0.5, 1L) == 2L)
    assert(tau(2.0, 0.75, 1L) == 2L)
    // large alpha AND delta' >= 0.5: the true k sits far below the
    // small-delta candidate — the exact bracket + binary search must
    // land it (60-digit replica values; a bounded linear walk cannot)
    assert(tau(0.001, 0.9, 1L) == -1607L)
    assert(tau(0.01, 0.6, 1L) == -20L)
    // soundness half: the measurement's own delta at the chosen tau must
    // not exceed the request (already swept in DpSoundnessSpec; spot-pin)
    val m = Aggregations.createPartitionSelectionMeasurement(
      d, 1.0, 1e-10, ExactNum.one)
    m.privacyFunction(ExactNum.one) match {
      case ApproxDPBudget(_, dd) => assert(dd.toDouble <= 1e-10)
      case b                     => fail(s"unexpected $b")
    }
    // and tightness: one bin lower would overshoot the requested delta
    GeometricPartitionSelection(d, m.alpha, m.threshold - 1)
      .privacyFunction(ExactNum.one) match {
      case ApproxDPBudget(_, dd) => assert(dd.toDouble > 1e-10)
      case b                     => fail(s"unexpected $b")
    }
  }

  test("partition selection: infinite budget, fractional d_in, deep k<=0 tail") {
    val d = DataFrameDomain(Seq("U" -> longCol))
    // infinite epsilon is the deterministic path: alpha = 0, threshold 0,
    // every key released (reference aggregations.py:2045-2049)
    val inf = Aggregations.createPartitionSelectionMeasurement(
      d, Double.PositiveInfinity, 1e-6, ExactNum.one)
    assert(inf.alpha.isZero && inf.threshold == 0L)
    inf.privacyFunction(ExactNum.one) match {
      case ApproxDPBudget(e, dd) =>
        assert(!e.isFinite && dd.isZero)
      case b => fail(s"unexpected $b")
    }
    // fractional 0 < d_in < 1 is refused, as in the reference
    // (NotImplementedError): the delta derivation is per whole row
    intercept[IllegalArgumentException] {
      Aggregations.createPartitionSelectionMeasurement(
        d, 1.0, 1e-6, ExactNum(Rational(1, 2)))
    }
    intercept[UnsupportedOperationException] {
      GeometricPartitionSelection(d, Rational(1), 10L)
        .privacyFunction(ExactNum(Rational(1, 2)))
    }
    // a very negative threshold with small alpha lands delta at the
    // sound clamp 1.0 instead of throwing from the exp range guard
    GeometricPartitionSelection(d, Rational(1, 20), -100000L)
      .privacyFunction(ExactNum.one) match {
      case ApproxDPBudget(_, dd) => assert(dd.toDouble == 1.0)
      case b                     => fail(s"unexpected $b")
    }
  }

  test("AggregateByColumn: two columns, different measurements, one pass") {
    import graft.transformations.GroupedDataFrame
    val data = df("G STRING, x DOUBLE, y DOUBLE",
      Seq(Row("a", 1.0, 1.0), Row("a", 2.0, 2.0), Row("a", 3.0, 3.0),
        Row("b", 10.0, 10.0)))
    val keys = df("G STRING", Seq(Row("a"), Row("b"), Row("c")))
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true),
        "x" -> ColumnDescriptor.double(), "y" -> ColumnDescriptor.double()),
      Seq("G"))
    val m = AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
      "x" -> NoisyQuantileSeries(0.5, 0.0, 20.0, None),
      "y" -> NoisyCountSeries(None)))
    val out = m(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
    // group-complete: absent "c" gets the empty-series answers
    // (quantile midpoint 10.0, count 0)
    assert(sortedRows(out) == Seq(
      Seq("a", "2.000000000", "3"),
      Seq("b", "10.000000000", "1"),
      Seq("c", "10.000000000", "0")))
    // privacy function is sequential composition across columns
    val noisy = AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
      "x" -> NoisyQuantileSeries(0.5, 0.0, 20.0, Some(1.0)),
      "y" -> NoisyCountSeries(Some(0.5))))
    assert(noisy.privacyFunction(ExactNum.one) ==
      PureDPBudget(ExactNum.fromDouble(1.5)))
    // seeded noisy runs replay exactly; quantile stays within the bounds
    val run1 = sortedRows(noisy.copy(seedOverride = Some(7L))(
      GroupedDataFrame(data, keys)).asInstanceOf[DataFrame])
    val run2 = sortedRows(noisy.copy(seedOverride = Some(7L))(
      GroupedDataFrame(data, keys)).asInstanceOf[DataFrame])
    assert(run1 == run2)
    run1.foreach { r =>
      val q = r(1).toDouble
      assert(q >= 0.0 && q <= 20.0, s"quantile $q out of bounds")
    }
    // mixed output measures are refused, as in the reference
    intercept[IllegalArgumentException] {
      AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
        "x" -> NoisyQuantileSeries(0.5, 0.0, 20.0, Some(1.0), RhoZCDP),
        "y" -> NoisyCountSeries(Some(1.0))))
    }
  }

  test("AggregateByColumn: null-returning aggregate keeps its group present") {
    import graft.transformations.GroupedDataFrame
    // Regression for the presence-marker fix: a SeriesAggregate that
    // legitimately answers NULL for a non-empty group must not make that
    // group look absent (and so re-run on the empty series). Presence is the
    // explicit __pg_hit marker, never the null-ness of the first output.
    val data = df("G STRING, x DOUBLE",
      Seq(Row("a", 1.0), Row("a", 2.0), Row("b", 5.0)))
    val keys = df("G STRING", Seq(Row("a"), Row("b"), Row("c")))
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true),
        "x" -> ColumnDescriptor.double()),
      Seq("G"))
    val m = AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
      "x" -> NullForNonEmptySeries()))
    val out = m(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
    // present groups a, b → NULL (the aggregate's real answer);
    // absent group c → the empty-series sentinel -1.0
    assert(sortedRows(out) == Seq(
      Seq("a", "∅"),
      Seq("b", "∅"),
      Seq("c", "-1.000000000")))
    // the marker's name is reserved: a measured or grouping column named
    // __pg_hit would be overwritten by it
    intercept[IllegalArgumentException] {
      AggregateByColumn(
        GroupedDataFrameDomain(
          Seq("G" -> ColumnDescriptor.string(true),
            "__pg_hit" -> ColumnDescriptor.double()),
          Seq("G")),
        SumOf(SymmetricDifference),
        Seq("__pg_hit" -> NoisyCountSeries(None)))
    }
    intercept[IllegalArgumentException] {
      AggregateByColumn(
        GroupedDataFrameDomain(
          Seq("__pg_hit" -> ColumnDescriptor.string(true),
            "x" -> ColumnDescriptor.double()),
          Seq("__pg_hit")),
        SumOf(SymmetricDifference),
        Seq("x" -> NoisyCountSeries(None)))
    }
  }

  test("AggregateByColumn: a data column named __hit does not collide") {
    import graft.transformations.GroupedDataFrame
    // __pg_hit is the ONLY reserved name. The completion path also uses an
    // internal alias literally named __hit (AggregateByColumn.scala:234),
    // which is resolved positionally — so a MEASURED column with that
    // exact name must flow through unharmed: present groups answer their
    // real aggregate, absent groups re-run on the empty series. This pins
    // that no internal marker beyond the reserved one can collide.
    val data = df("G STRING, __hit DOUBLE",
      Seq(Row("a", 1.0), Row("a", 2.0), Row("b", 5.0)))
    val keys = df("G STRING", Seq(Row("a"), Row("b"), Row("c")))
    val gdom = GroupedDataFrameDomain(
      Seq("G" -> ColumnDescriptor.string(true),
        "__hit" -> ColumnDescriptor.double()),
      Seq("G"))
    val m = AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
      "__hit" -> NoisyCountSeries(None))) // no noise: exact counts
    val out = m(GroupedDataFrame(data, keys)).asInstanceOf[DataFrame]
    assert(out.columns.toSeq == Seq("G", "__hit"))
    assert(sortedRows(out) == Seq(
      Seq("a", "2"), Seq("b", "1"), Seq("c", "0")))
    // grouping column named __hit: same guarantee on the key side
    val gdom2 = GroupedDataFrameDomain(
      Seq("__hit" -> ColumnDescriptor.string(true),
        "x" -> ColumnDescriptor.double()),
      Seq("__hit"))
    val data2 = df("__hit STRING, x DOUBLE",
      Seq(Row("a", 1.0), Row("b", 5.0)))
    val keys2 = df("__hit STRING", Seq(Row("a"), Row("b"), Row("c")))
    val out2 = AggregateByColumn(gdom2, SumOf(SymmetricDifference), Seq(
      "x" -> NoisyCountSeries(None)))(GroupedDataFrame(data2, keys2))
      .asInstanceOf[DataFrame]
    assert(sortedRows(out2) == Seq(
      Seq("a", "1"), Seq("b", "1"), Seq("c", "0")))
  }

  test("partition selection: alpha=0 answers (inf, 0) even at fractional d_in") {
    // Regression for the guard-order fix: the alpha==0 branch precedes the
    // fractional-d_in raise (reference spark_measurements.py:554-557), so
    // the no-noise measurement reports (inf, 0) instead of throwing.
    val d = DataFrameDomain(Seq("U" -> longCol))
    GeometricPartitionSelection(d, Rational.zero, 0L)
      .privacyFunction(ExactNum(Rational(1, 2))) match {
      case ApproxDPBudget(e, dd) => assert(!e.isFinite && dd.isZero)
      case b                     => fail(s"unexpected $b")
    }
    // d_in = 0 still dominates: (0, 0) regardless of alpha
    GeometricPartitionSelection(d, Rational.zero, 0L)
      .privacyFunction(ExactNum.zero) match {
      case ApproxDPBudget(e, dd) => assert(e.isZero && dd.isZero)
      case b                     => fail(s"unexpected $b")
    }
    // and with noise, the fractional raise still fires (unchanged behavior)
    intercept[UnsupportedOperationException] {
      GeometricPartitionSelection(d, Rational(1), 10L)
        .privacyFunction(ExactNum(Rational(1, 2)))
    }
  }

  test("bounds measurement: NULL group key joins to its own counts") {
    // a NULL group's histogram must flow through the bin materialization
    // (null-safe join), not be zero-filled into a spurious fallback row
    val rows = Seq(
      Row("a", 8.0), Row("a", 8.0), Row("a", 8.0),
      Row(null, 100.0), Row(null, 100.0), Row(null, 100.0))
    val data = df("G STRING, value DOUBLE", rows)
    val m = Aggregations.createBoundsMeasurement(
      DataFrameDomain(Seq("G" -> ColumnDescriptor.string(true),
        "value" -> ColumnDescriptor.double(false))),
      SymmetricDifference, ExactNum.one,
      PureDPBudget(ExactNum.PosInf), "value", Seq("G"))
    val out = m(data).asInstanceOf[DataFrame]
    val got = out.collect().map(r =>
      (Option(r.get(0)).map(_.toString).orNull,
        r.getDouble(out.columns.indexOf("upper")))).toMap
    // |8| bins to rank 3 (2^3), |100| to rank 7 (2^7); noise-free SVT
    // picks each group's own 95th-percentile bin
    assert(got == Map("a" -> 8.0, (null: String) -> 128.0), s"got $got")
  }

  test("SparseVectorPrefixSums noise-free picks the 95th-percentile bin") {
    // one group, bins 1..10 with count 10 each; total 100, threshold 95
    val rows = (1 to 10).map(b => Row("g", b.toLong, 10L))
    val data = df("G STRING, rank BIGINT, count BIGINT", rows)
    val m = SparseVectorPrefixSums(
      DataFrameDomain(Seq("G" -> ColumnDescriptor.string(true),
        "rank" -> longCol, "count" -> longCol)),
      Seq("G"), "rank", "count", Rational.zero)
    val out = m(data).asInstanceOf[DataFrame]
    assert(sortedRows(out) == Seq(Seq("g", "10")))
  }
}

/** Test aggregate: NULL for any non-empty series, -1.0 for the empty one —
  * top-level so the grouped executor's closure doesn't drag the suite in.
  */
private[graft] final case class NullForNonEmptySeries() extends SeriesAggregate {
  def inputMetric: Metric = SymmetricDifference
  def outputMeasure: Measure = PureDP
  def outputType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  def privacyFunction(dIn: ExactNum): PrivacyBudget = PureDPBudget(ExactNum.zero)
  def compute(values: Iterable[Double], rng: graft.random.RandomSource): Any =
    if (values.isEmpty) -1.0 else null
}
