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
