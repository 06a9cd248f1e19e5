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
    val samples = Array.fill(N)(Samplers.laplace(b, r))
    val mean = samples.sum / N
    val variance = samples.map(x => x * x).sum / N - mean * mean
    assert(math.abs(mean) < 0.05)
    assert(math.abs(variance - 2 * b * b) / (2 * b * b) < 0.05)
  }

  test("gaussian moments") {
    val r = rng
    val sigma = 1.5
    val samples = Array.fill(N)(Samplers.gaussian(sigma, r))
    val mean = samples.sum / N
    val variance = samples.map(x => x * x).sum / N - mean * mean
    assert(math.abs(mean) < 0.02)
    assert(math.abs(variance - sigma * sigma) / (sigma * sigma) < 0.05)
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
}
