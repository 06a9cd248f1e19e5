package graft

import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.measurements._
import graft.metrics._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Factory-output-level noise distribution tests, following the reference's
  * discipline (`test/system/noise_distribution_tests/__init__.py:7-18`):
  * every statistic must ACCEPT the true noise scale and REJECT the scale
  * perturbed by ±30% (`NOISE_SCALE_FUDGE_FACTOR`). One measurement run over
  * many identical groups yields the i.i.d. sample (the reference's
  * FixedGroupDataSet pattern) — no per-sample job overhead.
  *
  * Accept bands are ≥ 5 standard errors at these sample sizes, so the
  * secure-seeded (unseeded) mechanisms stay deterministic-in-practice.
  */
class NoiseDistributionSpec extends SharedSpark {

  private val Fudge = 0.3
  private val Groups = 20000

  private def gxDomain = DataFrameDomain(
    Seq("G" -> ColumnDescriptor.long, "X" -> ColumnDescriptor.double()))

  private def keys = spark.range(Groups.toLong).select(col("id").as("G"))

  /** Groups 0..Groups-1, each holding the same multiset {value(0)..value(per-1)}. */
  private def fixedGroups(per: Int, value: org.apache.spark.sql.Column): DataFrame =
    spark.range(Groups.toLong * per).select(
      (col("id") % Groups).as("G"),
      value.as("X"))

  private def idx = floor(col("id") / Groups) // within-group position

  private def collectOut(m: graft.core.Measurement, data: DataFrame, outCol: String): Array[Double] =
    m(data).asInstanceOf[DataFrame].select(col(outCol).cast("double")).collect()
      .map(_.getDouble(0))

  private def varOf(xs: Array[Double], center: Double): Double =
    xs.map(x => (x - center) * (x - center)).sum / xs.length -
      math.pow(xs.map(_ - center).sum / xs.length, 2)

  /** Two-sided geometric variance at scale t: 2e^(1/t)/(e^(1/t)-1)^2. */
  private def geoVar(t: Double): Double = {
    val e = math.exp(1.0 / t)
    2 * e / ((e - 1) * (e - 1))
  }

  /** The accept/reject discipline: the sample variance matches the true
    * scale's variance and is incompatible with ±30% mis-scaled noise.
    */
  private def acceptRejectVar(
      varHat: Double, varTrue: Double, varUp: Double, varDown: Double,
      band: Double, what: String): Unit = {
    assert(math.abs(varHat / varTrue - 1) < band,
      s"$what: varHat=$varHat varTrue=$varTrue")
    assert(math.abs(varHat / varUp - 1) > band,
      s"$what must reject +30% scale: varHat=$varHat varUp=$varUp")
    assert(math.abs(varHat / varDown - 1) > band,
      s"$what must reject -30% scale: varHat=$varHat varDown=$varDown")
  }

  /** Kolmogorov–Smirnov statistic of a sample against a CDF. */
  private def ksD(sample: Array[Double], cdf: Double => Double): Double = {
    val s = sample.sorted
    val n = s.length
    var d = 0.0
    var i = 0
    while (i < n) {
      val f = cdf(s(i))
      d = math.max(d, math.max(
        math.abs((i + 1).toDouble / n - f), math.abs(i.toDouble / n - f)))
      i += 1
    }
    d
  }

  private def lapCdf(mu: Double, b: Double)(x: Double): Double =
    if (x < mu) 0.5 * math.exp((x - mu) / b)
    else 1 - 0.5 * math.exp(-(x - mu) / b)

  /** KS accept/reject at n = 20000: the true scale's D sits near the
    * 1.36/√n ≈ 0.0096 critical value (0.02 ≈ p = 2e-7, far above the
    * reference's 1e-20 accept floor), while a ±30% Laplace mis-scale has a
    * deterministic CDF gap ≥ 0.048 — cleanly above the 0.03 reject bar.
    */
  private def ksAcceptReject(
      sample: Array[Double], mu: Double, b: Double, what: String): Unit = {
    val dTrue = ksD(sample, lapCdf(mu, b))
    val dUp = ksD(sample, lapCdf(mu, b * (1 + Fudge)))
    val dDown = ksD(sample, lapCdf(mu, b * (1 - Fudge)))
    assert(dTrue < 0.02, s"$what KS accept failed: D=$dTrue")
    assert(dUp > 0.03, s"$what KS must reject +30% scale: D=$dUp")
    assert(dDown > 0.03, s"$what KS must reject -30% scale: D=$dDown")
  }

  test("count factory: geometric noise at alpha = d_in/eps") {
    val eps = 0.8
    val m = Aggregations.createCountMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum.fromDouble(eps)), Some(keys))
    val out = collectOut(m, fixedGroups(1, lit(0.0)).limit(0), "count")
    assert(out.length == Groups)
    val t = 1.0 / eps
    acceptRejectVar(
      varOf(out, 0.0), geoVar(t), geoVar(t * (1 + Fudge)), geoVar(t * (1 - Fudge)),
      0.15, "count")
  }

  test("sum factory: Laplace noise at b = max(|lo|,|hi|)·d_in/eps") {
    val eps = 0.8
    val m = Aggregations.createSumMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, ExactNum(1),
      PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys))
    val out = collectOut(m, fixedGroups(8, lit(13.0)), "sum")
    val b = 20.0 / eps
    def lapVar(s: Double) = 2 * s * s
    acceptRejectVar(
      varOf(out, 8 * 13.0), lapVar(b), lapVar(b * (1 + Fudge)), lapVar(b * (1 - Fudge)),
      0.15, "sum")
  }

  test("average factory: half budget each to sum-of-deviations and count") {
    val eps = 0.8
    val m = Aggregations.createAverageMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys))
    // 200 values symmetric around the midpoint: sod = 0, count dominates out
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = collectOut(m, data, "average")
    // avg = L_sod/(n + L_cnt) + 10 with n = 200: var ≈ sigma_sod^2 / n^2
    val bS = 10.0 / (eps / 2)
    def predicted(scale: Double) = 2 * scale * scale / (200.0 * 200.0)
    acceptRejectVar(
      varOf(out, 10.0), predicted(bS), predicted(bS * (1 + Fudge)),
      predicted(bS * (1 - Fudge)), 0.15, "average")
  }

  test("variance factory: a third of the budget per component") {
    val eps = 0.8
    val m = Aggregations.createVarianceMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys))
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = collectOut(m, data, "variance")
    // v = (sos + L_sos − (L_sod)²/n)/(n−1) with n = 200 + L_cnt; to first
    // order Var(v) = sigma_sos²/(n−1)² + (ssd/(n−1)²)²·var_cnt
    val n = 200.0
    val ssd = 200 * 25.0
    val vTrue = ssd / (n - 1)
    def predicted(f: Double) = {
      val bSos = 100.0 / (eps / 3) * f
      val tCnt = 3.0 / eps * f
      2 * bSos * bSos / ((n - 1) * (n - 1)) +
        math.pow(ssd / ((n - 1) * (n - 1)), 2) * geoVar(tCnt)
    }
    assert(math.abs(out.sum / out.length - vTrue) < 0.5, s"mean=${out.sum / out.length}")
    acceptRejectVar(
      varOf(out, vTrue), predicted(1.0), predicted(1 + Fudge), predicted(1 - Fudge),
      0.2, "variance")
  }

  test("stddev factory: delta-method spread of sqrt(variance)") {
    val eps = 0.8
    val m = Aggregations.createStandardDeviationMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys))
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = collectOut(m, data, "stddev")
    val n = 200.0
    val ssd = 200 * 25.0
    val vTrue = ssd / (n - 1)
    def predictedVarOfV(f: Double) = {
      val bSos = 100.0 / (eps / 3) * f
      val tCnt = 3.0 / eps * f
      2 * bSos * bSos / ((n - 1) * (n - 1)) +
        math.pow(ssd / ((n - 1) * (n - 1)), 2) * geoVar(tCnt)
    }
    def predicted(f: Double) = predictedVarOfV(f) / (4 * vTrue) // Var(sqrt(v))
    acceptRejectVar(
      varOf(out, math.sqrt(vTrue)), predicted(1.0), predicted(1 + Fudge),
      predicted(1 - Fudge), 0.2, "stddev")
  }

  test("average factory intermediates: KS on the Laplace sod component") {
    // keep_intermediates exposes the noisy sum-of-deviations — KS-test it
    // against the EXACT Laplace law at b = devBound·d_in/(ε/2), the
    // reference's test_average.py discipline (component CDFs, not just
    // the composite's variance)
    val eps = 0.8
    val m = Aggregations.createAverageMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys), keepIntermediates = true)
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = m(data).asInstanceOf[DataFrame]
    assert(out.columns.contains("average")) // composite still present
    val sod = out.select(col("sod").cast("double")).collect().map(_.getDouble(0))
    assert(sod.length == Groups)
    ksAcceptReject(sod, 0.0, 10.0 / (eps / 2), "average sod")
  }

  test("variance factory intermediates: KS on the Laplace sod and sos") {
    val eps = 0.8
    val m = Aggregations.createVarianceMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys), keepIntermediates = true)
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = m(data).asInstanceOf[DataFrame]
      .select(col("sod").cast("double"), col("sos").cast("double")).collect()
    val sod = out.map(_.getDouble(0))
    val sos = out.map(_.getDouble(1))
    // a third of ε each: sod at b = 10/(ε/3) around 0 (symmetric data),
    // sos at b = 100/(ε/3) around Σdev² = 200·25
    ksAcceptReject(sod, 0.0, 10.0 / (eps / 3), "variance sod")
    ksAcceptReject(sos, 5000.0, 100.0 / (eps / 3), "variance sos")
  }

  test("stddev factory intermediates: same component laws as variance") {
    val eps = 0.8
    val m = Aggregations.createStandardDeviationMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
      ExactNum(1), PureDPBudget(ExactNum.fromDouble(eps)), "X",
      Rational(0), Rational(20), Some(keys), keepIntermediates = true)
    val data = fixedGroups(200, when(idx % 2 === 0, 5.0).otherwise(15.0))
    val out = m(data).asInstanceOf[DataFrame]
    assert(out.columns.contains("stddev"))
    val sos = out.select(col("sos").cast("double")).collect().map(_.getDouble(0))
    ksAcceptReject(sos, 5000.0, 100.0 / (eps / 3), "stddev sos")
  }

  test("zCDP count factory: discrete Gaussian at sigma^2 = d_in^2/(2 rho)") {
    val rho = 0.125
    val m = Aggregations.createCountMeasurement(
      gxDomain, SymmetricDifference, NoiseKind.DiscreteGaussian, ExactNum(1),
      RhoZCDPBudget(ExactNum.fromDouble(rho)), Some(keys))
    val out = collectOut(m, fixedGroups(1, lit(0.0)).limit(0), "count")
    val s2 = 1.0 / (2 * rho) // = 4
    // discrete Gaussian variance is within ~1% of sigma^2 at sigma >= 2
    acceptRejectVar(
      varOf(out, 0.0), s2, s2 * math.pow(1 + Fudge, 2), s2 * math.pow(1 - Fudge, 2),
      0.15, "zCDP count")
  }

  test("quantile factory: exponential-mechanism gap distribution at eps") {
    val eps = 2.0
    val m = Aggregations.createQuantileMeasurement(
      gxDomain, SymmetricDifference, ExactNum(1),
      PureDPBudget(ExactNum.fromDouble(eps)), "X", 0.5, 0.0, 100.0,
      keys, "median")
    // every group holds {10,20,...,90} in [0,100]: ten decade-wide gaps,
    // gap k has score −|k − 4.5| and the output bucket is floor(x/10)
    val data = fixedGroups(9, ((idx % 9 + 1) * 10).cast("double"))
    val out = collectOut(m, data, "median")
    def pmf(e: Double): Array[Double] = {
      val w = (0 to 9).map(k => math.exp(-e * math.abs(k - 4.5) / 2)).toArray
      val tot = w.sum
      w.map(_ / tot)
    }
    val freq = new Array[Double](10)
    out.foreach { x => freq(math.min(math.max((x / 10).toInt, 0), 9)) += 1.0 / out.length }
    def maxDev(p: Array[Double]) = (0 to 9).map(k => math.abs(freq(k) - p(k))).max
    val sep = (0 to 9).map(k => math.abs(pmf(eps)(k) - pmf(eps * (1 + Fudge))(k))).max
    assert(sep > 0.045, s"test setup must separate the hypotheses, sep=$sep")
    assert(maxDev(pmf(eps)) < 0.015, s"quantile EM pmf deviation ${maxDev(pmf(eps))}")
    assert(maxDev(pmf(eps * (1 + Fudge))) > 0.015, "must reject +30% eps")
    assert(maxDev(pmf(eps * (1 - Fudge))) > 0.015, "must reject -30% eps")
  }
}
