package graft

import graft.exact.Rational
import graft.random.{Samplers, SplitMix}
import org.scalatest.funsuite.AnyFunSuite

/** Statistical tests for the exact samplers (reference
  * `test/system/noise_distribution_tests`): accept the true scale, reject
  * grossly wrong ones, via moment checks at large sample sizes.
  */
class SamplersSpec extends AnyFunSuite {
  private val N = 200000
  private def rng = new SplitMix(0xC0FFEE)

  test("bernoulliExp(gamma) matches exp(-gamma)") {
    val r = rng
    for (gamma <- Seq(Rational(1, 4), Rational(1), Rational(3, 2))) {
      val p = (1 to 50000).count(_ => Samplers.bernoulliExp(gamma, r)) / 50000.0
      val expected = math.exp(-gamma.toDouble)
      assert(math.abs(p - expected) < 0.01, s"gamma=$gamma p=$p exp=$expected")
    }
  }

  test("discrete Laplace has mean 0 and the right spread") {
    val r = rng
    val t = Rational(3) // scale
    val samples = Array.fill(N)(Samplers.discreteLaplace(t, r).toDouble)
    val mean = samples.sum / N
    val variance = samples.map(x => x * x).sum / N - mean * mean
    // Var of discrete Laplace scale t: 2e^(1/t)/(e^(1/t)-1)^2
    val e = math.exp(1.0 / t.toDouble)
    val expectedVar = 2 * e / math.pow(e - 1, 2)
    assert(math.abs(mean) < 0.1, s"mean=$mean")
    assert(
      math.abs(variance - expectedVar) / expectedVar < 0.05,
      s"var=$variance expected=$expectedVar"
    )
  }

  test("discrete Gaussian has mean 0 and variance ≈ sigma^2") {
    val r = rng
    val sigmaSq = Rational(9)
    val samples = Array.fill(N)(Samplers.discreteGaussian(sigmaSq, r).toDouble)
    val mean = samples.sum / N
    val variance = samples.map(x => x * x).sum / N - mean * mean
    assert(math.abs(mean) < 0.1, s"mean=$mean")
    // discrete Gaussian variance is slightly below sigma^2; 5% tolerance
    assert(
      math.abs(variance - sigmaSq.toDouble) / sigmaSq.toDouble < 0.05,
      s"var=$variance"
    )
  }

  test("geometricExp matches the geometric distribution") {
    val r = rng
    val x = Rational(1, 2)
    val samples = Array.fill(N)(Samplers.geometricExp(x, r).toDouble)
    val mean = samples.sum / N
    // E[Geom(1-e^-x)] (support 0,1,...) = e^-x/(1-e^-x)
    val p = math.exp(-x.toDouble)
    val expected = p / (1 - p)
    assert(math.abs(mean - expected) / expected < 0.05, s"mean=$mean exp=$expected")
  }

  test("continuous Laplace moments") {
    val r = rng
    val b = 2.5
    // exactly-rounded sampling is ~50us/sample; 40k keeps the check sharp
    val samples = Array.fill(40000)(Samplers.laplace(b, r))
    val mean = samples.sum / samples.length
    val variance = samples.map(x => x * x).sum / samples.length - mean * mean
    assert(math.abs(mean) < 0.06)
    assert(math.abs(variance - 2 * b * b) / (2 * b * b) < 0.05)
  }

  test("gaussian moments") {
    val r = rng
    val sigma = 1.5
    // erfinv-based exact sampling is the slow path; 10k at a fixed seed
    val samples = Array.fill(10000)(Samplers.gaussian(sigma, r))
    val mean = samples.sum / samples.length
    val variance = samples.map(x => x * x).sum / samples.length - mean * mean
    assert(math.abs(mean) < 0.05)
    assert(math.abs(variance - sigma * sigma) / (sigma * sigma) < 0.06)
  }

  test("nextBigInt is unbiased over small bounds") {
    val r = rng
    val counts = new Array[Int](7)
    (1 to 70000).foreach(_ => counts(Samplers.geometricExp(Rational(100), r).toInt.min(6)) += 0)
    // uniformity of nextBigInt itself
    val c2 = new Array[Int](7)
    (1 to 70000).foreach(_ => c2(r.nextBigInt(BigInt(7)).toInt) += 1)
    c2.foreach(c => assert(math.abs(c - 10000) < 500, c2.mkString(",")))
  }

  test("Lambert W round-trips on both real branches") {
    import graft.random.Prdp.lambertW
    for (z <- Seq(-0.367, -0.3, -0.1, -0.01, -1e-6, 0.0, 1e-6, 0.5, 1.0, 10.0, 1e6)) {
      val w = lambertW(z, 0)
      assert(math.abs(w * math.exp(w) - z) <= 1e-10 * (1 + math.abs(z)),
        s"W0($z)=$w")
    }
    for (z <- Seq(-0.3678, -0.36, -0.3, -0.1, -0.01, -1e-4, -1e-8)) {
      val w = lambertW(z, -1)
      assert(w <= -1.0 + 1e-9, s"W-1($z)=$w above -1")
      assert(math.abs(w * math.exp(w) - z) <= 1e-9 * (1 + math.abs(w)),
        s"W-1($z)=$w")
    }
    assert(math.abs(lambertW(-1.0 / math.E, 0) + 1.0) < 1e-6)
  }

  test("sqrt-Gaussian inverse CDF inverts the closed-form CDF") {
    import graft.random.Prdp.sqrtGaussianInverseCdf
    // GG(shape 1/2, scale σ) CDF: 1/2 + sign(y)·(1 − e^{−u}(1+u))/2, u=√(|y|/σ)
    def cdf(y: Double, sigma: Double): Double = {
      val u = math.sqrt(math.abs(y) / sigma)
      0.5 + math.signum(y) * 0.5 * (1.0 - math.exp(-u) * (1.0 + u))
    }
    for (sigma <- Seq(1.0, 10.0); p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val y = sqrtGaussianInverseCdf(p, sigma)
      assert(math.abs(cdf(y, sigma) - p) < 1e-9, s"p=$p sigma=$sigma y=$y")
    }
    // antisymmetry
    assert(sqrtGaussianInverseCdf(0.5, 3.0) == 0.0)
    assert(math.abs(
      sqrtGaussianInverseCdf(0.8, 2.0) + sqrtGaussianInverseCdf(0.2, 2.0)) < 1e-9)
  }

  test("sqrt-Gaussian samples match GG(1/2) moments") {
    import graft.random.Prdp
    val rng = new SplitMix(42L)
    val n = 200000
    val sigma = 1.0
    var s = 0.0; var s2 = 0.0
    (1 to n).foreach { _ =>
      val x = Prdp.sqrtGaussian(sigma, rng); s += x; s2 += x * x
    }
    val mean = s / n
    val v = s2 / n - mean * mean
    // Var = σ²·Γ(6)/Γ(2) = 120σ²; kurtosis is high so allow 10%
    assert(math.abs(mean) < 0.2, s"mean=$mean")
    assert(math.abs(v - 120.0) / 120.0 < 0.10, s"var=$v")
  }

  test("exponential polylogarithmic inverse CDF matches reference vectors") {
    import graft.random.Prdp.expPolylogInverseCdf
    // expected values from the reference's test suite (test_prdp.py:245-256)
    // at d=1, a=4, σ=1
    val vectors = Seq(
      0.09728810883531885 -> -3.0,
      0.16120949170524884 -> -2.0,
      0.2776681067903467 -> -1.0,
      0.5 -> 0.0,
      0.7223318932096533 -> 1.0,
      0.8387905082947511 -> 2.0,
      0.9027118911646812 -> 3.0
    )
    vectors.foreach { case (p, expected) =>
      val y = expPolylogInverseCdf(p, 1.0, 4.0, 1.0)
      assert(math.abs(y - expected) < 1e-6, s"p=$p got $y expected $expected")
    }
  }

  test("transformation mechanisms hit reference mean/variance formulas") {
    import graft.random.Prdp
    val rng = new SplitMix(7L)
    val n = 200000
    val (x, offset, sigma) = (100.0, 1.0, 1.0)
    // sqrt transform: E[y − σ²] = x, Var[y] = 2σ⁴ + 4σ²(x+offset)
    var s = 0.0; var s2 = 0.0
    (1 to n).foreach { _ =>
      val g = math.sqrt(x + offset) + sigma * rng.nextGaussianStd()
      val y = g * g - offset
      s += y; s2 += y * y
    }
    val mean = s / n
    val v = s2 / n - mean * mean
    val expVar = 2 * math.pow(sigma, 4) + 4 * sigma * sigma * (x + offset)
    assert(math.abs(mean - sigma * sigma - x) / x < 0.05, s"mean=$mean")
    assert(math.abs(v - expVar) / expVar < 0.10, s"var=$v exp=$expVar")
  }
}
