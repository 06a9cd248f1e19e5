package graft

import java.math.{BigDecimal => JBD}

import graft.random.{Iv, IvMath, Precise, RandomSource, SplitMix}
import org.scalatest.funsuite.AnyFunSuite

/** Rigor tests for the exactly-rounded interval samplers (reference
  * `random/laplace.py`, `random/continuous_gaussian.py`, `utils/arb.py`):
  * point-transcendental accuracy against published constants, deterministic
  * correct-rounding with scripted uniform bits (including the near-zero
  * granularity case a double-precision inverse CDF cannot produce), and
  * moment sanity.
  */
class PreciseSpec extends AnyFunSuite {

  /** RandomSource whose nextLong() plays a script (top bit cleared by the
    * sampler's >>> 1, so script values are the 63-bit payloads shifted left).
    */
  private final class Scripted(payloads63: Seq[Long]) extends RandomSource {
    private var i = 0
    def nextLong(): Long = {
      val v = if (i < payloads63.length) payloads63(i) else 0L
      i += 1
      v << 1 // sampler does >>> 1
    }
    def nextDouble(): Double = fail("not used")
    def nextGaussianStd(): Double = fail("not used")
  }

  private def assertDigits(v: JBD, expected: String, tolExp: Int): Unit = {
    val diff = v.subtract(new JBD(expected)).abs()
    assert(diff.compareTo(new JBD(s"1E-$tolExp")) < 0, s"got $v want $expected")
  }

  test("lnPoint matches published digits") {
    assertDigits(IvMath.lnPoint(new JBD(2), 40), "0.6931471805599453094172321214581765680755", 35)
    assertDigits(IvMath.lnPoint(new JBD("0.1"), 40), "-2.302585092994045684017991454684364207601", 34)
    // tiny argument: ln(1e-300) = -300·ln(10)
    assertDigits(IvMath.lnPoint(new JBD("1E-300"), 40), "-690.7755278982137052053974364053092622804", 31)
    // near-1 argument keeps full relative accuracy: ln(1+2^-80)
    val x = JBD.ONE.add(new JBD(math.pow(2, -80)))
    val got = IvMath.lnPoint(x, 40)
    // ln(1+e) = e - e^2/2 + ...; e = 2^-80 ≈ 8.2718e-25
    val expectedLead = new JBD(math.pow(2, -80))
    val relErr = got.subtract(expectedLead).abs().divide(expectedLead, new java.math.MathContext(10))
    assert(relErr.doubleValue() < 1e-24, s"relErr=$relErr")
  }

  test("lnPoint keeps the enclosure margin for x just below 1") {
    // Regression: for x in [0.75,1) the old exponent reduction doubled m
    // (rounding to w digits) then halved it back, so num = m - 1 carried
    // ~10^-w ABSOLUTE error — up to 8 orders of magnitude beyond the
    // 10^-(d+4) widening margin for x = 1-δ with δ in (2.8e-17, 1e-8).
    // Now x in [0.75,1.5) takes the exact branch (m never rounded).
    val mc60 = new java.math.MathContext(60)
    for (xs <- Seq(
        "0.999999999999",                                       // 1 - 1e-12
        "0.9999999999990000000000000000000000000000001234567890123", // >40 digits
        "0.99999999999999990000000000000000000000000000000007",
        "0.750000000000000000000000000000000000000000000001",
        "1.499999999999999999999999999999999999999999999999")) {
      val x = new JBD(xs)
      val u = x.subtract(JBD.ONE) // exact
      // ln(1+u) = u - u²/2 + u³/3 - ... ; |u| ≤ 0.25 so 200 terms is plenty
      var expected = JBD.ZERO
      var pow = JBD.ONE
      for (k <- 1 to 200) {
        pow = pow.multiply(u, mc60)
        val term = pow.divide(JBD.valueOf(k.toLong), mc60)
        expected = if (k % 2 == 1) expected.add(term, mc60) else expected.subtract(term, mc60)
      }
      for (w <- Seq(34, 40)) {
        val got = IvMath.lnPoint(x, w)
        val relErr = got.subtract(expected).abs()
          .divide(expected.abs(), new java.math.MathContext(10)).doubleValue()
        // ln() widens lnPoint by 10^-(d+4) with w = d+12; demand the point
        // value sit two orders inside that margin.
        assert(relErr < math.pow(10, -(w - 12 + 6)), s"x=$xs w=$w relErr=$relErr")
      }
    }
  }

  test("expPoint and erfPoint match published digits") {
    assertDigits(IvMath.expPoint(JBD.ONE, 40), "2.718281828459045235360287471352662497757", 35)
    assertDigits(IvMath.expPoint(new JBD(-10), 40), "0.00004539992976248485153559151556055061023791", 40)
    assertDigits(IvMath.erfPoint(JBD.ONE, 40), "0.8427007929497148693412206350826092592961", 36)
    assertDigits(IvMath.erfPoint(new JBD("0.5"), 40), "0.5204998778130465376827466538919645287365", 36)
    assertDigits(IvMath.erfPoint(new JBD(3), 40), "0.9999779095030014145586272238704176796202", 36)
    assertDigits(IvMath.erfPoint(new JBD(-1), 40), "-0.8427007929497148693412206350826092592961", 36)
  }

  test("erfinvPoint inverts erf with a honored error bound") {
    for (y <- Seq("0.5", "0.9", "-0.3", "0.999999", "0.99999999999999999999")) {
      val (z, bound) = IvMath.erfinvPoint(new JBD(y), 30)
      val back = IvMath.erfPoint(z, 45)
      val resid = back.subtract(new JBD(y)).abs()
      // residual consistent with the claimed bound via the derivative at z
      val zd = z.doubleValue()
      val deriv = 2.0 / math.sqrt(math.Pi) * math.exp(-zd * zd)
      assert(resid.doubleValue() <= bound.doubleValue() * deriv * 1.01 + 1e-40,
        s"y=$y resid=$resid bound=$bound")
      assert(bound.doubleValue() < 1e-25, s"bound too wide for y=$y: $bound")
    }
    // known value: erfinv(0.5) = 0.4769362762044698733814...
    val (z, _) = IvMath.erfinvPoint(new JBD("0.5"), 35)
    assertDigits(z, "0.4769362762044698733814183536431714177847", 30)
  }

  test("scripted Laplace sample near zero is exactly rounded (gap-free)") {
    // p = [1/2 + 2^-126, 1/2 + 2^-126 + 2^-189]: first two rounds cannot
    // certify, third does. True value -ln(1-2·2^-126) = 2^-125 + O(2^-251),
    // whose nearest double is exactly 2^-125 — unreachable for the legacy
    // double sampler (its smallest positive output is ~2^-52·b).
    val src = new Scripted(Seq(1L << 62, 1L, 0L))
    val x = Precise.laplace(1.0, src)
    assert(x == math.pow(2, -125), s"got $x")
  }

  test("scripted Laplace typical value is exactly rounded") {
    // single round: p = [v/2^63, (v+1)/2^63] with v = 3·2^61 → p ≈ 3/4,
    // x* = -ln(1 - 2·1/4) = -ln(1/2) = ln 2
    val src = new Scripted(Seq(3L << 61))
    val x = Precise.laplace(1.0, src)
    assert(math.abs(x - 0.6931471805599453) < 1e-15, s"got $x")
  }

  test("scripted Gaussian matches the published 75th-percentile quantile") {
    // p ≈ 3/4 → z = Φ^{-1}(0.75) = 0.674489750196081743202227014...
    val src = new Scripted(Seq(3L << 61))
    val x = Precise.gaussian(1.0, src)
    assert(math.abs(x - 0.6744897501960817) < 2e-16, s"got $x")
  }

  test("scripted uniform midpoint") {
    val src = new Scripted(Seq(1L << 62))
    val x = Precise.uniform(-3.0, 5.0, src)
    assert(math.abs(x - 1.0) < 1e-15, s"got $x")
  }

  test("gaussian tail sample certifies (p extremely close to 1)") {
    // 63 one-bits: p = [1 - 2^-63, 1): first round cannot certify (erfinv
    // upper endpoint is the +inf sentinel); later rounds pin the tail.
    val src = new Scripted(Seq((1L << 63) - 1, 3L << 61, 0L, 0L, 0L))
    val x = Precise.gaussian(1.0, src)
    assert(x > 8.5 && x < 10.0, s"got $x") // Φ^{-1}(1-2^-65) ≈ 9.16
  }

  test("moments: Laplace and Gaussian at modest N") {
    val r = new SplitMix(0xBEEF)
    val n = 20000
    val b = 2.5
    var sum = 0.0; var sumSq = 0.0
    var i = 0
    while (i < n) { val x = Precise.laplace(b, r); sum += x; sumSq += x * x; i += 1 }
    val mean = sum / n
    val varL = sumSq / n - mean * mean
    assert(math.abs(mean) < 0.12, s"laplace mean=$mean")
    assert(math.abs(varL - 2 * b * b) / (2 * b * b) < 0.1, s"laplace var=$varL")

    var gs = 0.0; var gss = 0.0
    i = 0
    while (i < n) { val x = Precise.gaussian(2.25, r); gs += x; gss += x * x; i += 1 }
    val gMean = gs / n
    val gVar = gss / n - gMean * gMean
    assert(math.abs(gMean) < 0.08, s"gaussian mean=$gMean")
    assert(math.abs(gVar - 2.25) / 2.25 < 0.1, s"gaussian var=$gVar")
  }

  test("interval nesting: refining the uniform narrows, never shifts") {
    // soundness invariant of the whole interval layer: if p' ⊂ p (more
    // uniform bits), then invCdf(p') ⊆ invCdf(p) up to each level's widening
    // margin. A violation would mean some interval fails to contain the true
    // value — exactly the bug class that breaks exact rounding.
    val rnd = new java.util.Random(99)
    val eps = new java.math.BigDecimal(java.math.BigInteger.ONE, 18) // inter-level slack
    for (trial <- 0 until 60) {
      var bits = java.math.BigInteger.ZERO
      var n = 0
      var prevL: Iv = null
      var prevG: Iv = null
      for (round <- 0 until 3) {
        n += 63
        bits = bits.shiftLeft(63).or(java.math.BigInteger.valueOf(rnd.nextLong() >>> 1))
        val sc = new java.math.BigDecimal(java.math.BigInteger.valueOf(5).pow(n), n)
        val p = Iv(
          new java.math.BigDecimal(bits).multiply(sc),
          new java.math.BigDecimal(bits.add(java.math.BigInteger.ONE)).multiply(sc))
        val l = Precise.laplaceInvCdf(0.0, 2.5)(p, n)
        val g = Precise.gaussianInvCdf(0.0, 4.0)(p, n)
        if (prevL != null) {
          assert(l.lo.compareTo(prevL.lo.subtract(eps)) >= 0 &&
            l.hi.compareTo(prevL.hi.add(eps)) <= 0,
            s"trial $trial round $round laplace: $l not within $prevL")
          assert(g.lo.compareTo(prevG.lo.subtract(eps)) >= 0 &&
            g.hi.compareTo(prevG.hi.add(eps)) <= 0,
            s"trial $trial round $round gaussian: $g not within $prevG")
        }
        prevL = l
        prevG = g
      }
    }
  }

  test("uniform moments and bounds") {
    val r = new SplitMix(0xD1CE)
    val (lo, hi) = (-2.0, 6.0)
    var sum = 0.0; var sumSq = 0.0
    var i = 0
    while (i < 20000) {
      val x = Precise.uniform(lo, hi, r)
      assert(x >= lo && x <= hi)
      sum += x; sumSq += x * x; i += 1
    }
    val mean = sum / 20000
    val v = sumSq / 20000 - mean * mean
    assert(math.abs(mean - 2.0) < 0.06, s"mean=$mean")
    assert(math.abs(v - 64.0 / 12) / (64.0 / 12) < 0.05, s"var=$v")
    assert(Precise.uniform(3.5, 3.5, r) == 3.5)
    assertThrows[IllegalArgumentException](
      Precise.uniform(Double.NegativeInfinity, 0.0, r))
  }

  test("overflowing tail certifies as infinity rather than refining forever") {
    // scale so large that a typical draw exceeds Double.MaxValue: the
    // certified answer is the correctly-rounded infinity (reference float
    // overflow semantics), not a convergence failure
    val src = new Scripted(Seq(3L << 61)) // p ≈ 3/4 → x* ≈ ln(2)·b
    val x = Precise.laplace(1.0e308, src)
    assert(x.isPosInfinity || (x > 0 && x < Double.MaxValue), s"got $x")
    val src2 = new Scripted(Seq((1L << 63) - 1, (1L << 63) - 1, 0L, 0L))
    val y = Precise.laplace(1.0e308, src2) // p → 1: far tail
    assert(y.isPosInfinity, s"got $y")
  }

  test("Kolmogorov-Smirnov against analytic CDFs, accept true / reject ±30%") {
    // sharper than moment checks: the empirical CDF of the exactly-rounded
    // sampler must track the analytic CDF uniformly. n = 20000 puts the
    // 1e-12-significance KS critical value at ~0.027 while a ±30% scale
    // error shifts the CDF by ≥ 0.04 — cleanly separated.
    val n = 20000
    def ks(samples: Array[Double], cdf: Double => Double): Double = {
      java.util.Arrays.sort(samples)
      var d = 0.0
      var i = 0
      while (i < n) {
        val f = cdf(samples(i))
        d = math.max(d, math.max(math.abs(f - i.toDouble / n),
          math.abs(f - (i + 1).toDouble / n)))
        i += 1
      }
      d
    }
    val crit = math.sqrt(math.log(2.0 / 1e-12) / (2.0 * n)) // ~0.0266
    def lapCdf(b: Double)(x: Double): Double =
      if (x < 0) 0.5 * math.exp(x / b) else 1 - 0.5 * math.exp(-x / b)
    def gausCdf(s: Double)(x: Double): Double = {
      // Φ via erf series is overkill here; use the complementary bound-free
      // approximation from Zelen & Severo (abs err < 7.5e-8)
      val z = x / s
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      val tail = math.exp(-z * z / 2) / math.sqrt(2 * math.Pi) * poly
      if (z >= 0) 1 - tail else tail
    }
    val r = new SplitMix(0xFACADE)
    val lap = Array.fill(n)(Precise.laplace(2.0, r))
    val dL = ks(lap.clone(), lapCdf(2.0))
    assert(dL < crit, s"laplace KS=$dL crit=$crit")
    assert(ks(lap.clone(), lapCdf(2.0 * 1.3)) > crit, "must reject +30% scale")
    assert(ks(lap.clone(), lapCdf(2.0 * 0.7)) > crit, "must reject -30% scale")
    val gau = Array.fill(n)(Precise.gaussian(2.25, r))
    val dG = ks(gau.clone(), gausCdf(1.5))
    assert(dG < crit, s"gaussian KS=$dG crit=$crit")
    assert(ks(gau.clone(), gausCdf(1.5 * 1.3)) > crit, "must reject +30% sigma")
    assert(ks(gau.clone(), gausCdf(1.5 * 0.7)) > crit, "must reject -30% sigma")
  }

  test("throughput smoke: samples per second") {
    val r = new SplitMix(42)
    var i = 0
    val t0 = System.nanoTime()
    while (i < 2000) { Precise.laplace(1.0, r); i += 1 }
    val lapUs = (System.nanoTime() - t0) / 2000 / 1000.0
    i = 0
    val t1 = System.nanoTime()
    while (i < 2000) { Precise.gaussian(1.0, r); i += 1 }
    val gausUs = (System.nanoTime() - t1) / 2000 / 1000.0
    info(s"laplace ${lapUs}us/sample, gaussian ${gausUs}us/sample")
    assert(lapUs < 500 && gausUs < 2000, s"laplace=$lapUs gaussian=$gausUs")
  }
}
