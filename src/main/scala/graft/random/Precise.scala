package graft.random

import java.math.{BigDecimal => JBD, BigInteger, MathContext, RoundingMode}

/** Directed-rounding interval ("ball") arithmetic over `java.math.BigDecimal`,
  * and exactly-rounded inverse-CDF samplers built on it.
  *
  * This is the Spark-side analog of the reference's MPFR/Arb layer
  * (`/root/reference/src/tmlt/core/utils/arb.py:65-659`) and its
  * inverse-transform samplers (`random/inverse_cdf.py:12-47`,
  * `random/laplace.py:12-49`, `random/continuous_gaussian.py:13-76`,
  * `random/uniform.py:10-31`). The probability p is an exact dyadic interval
  * of width 2^-n, the inverse CDF is evaluated in interval arithmetic, and a
  * sample is emitted only once the whole interval rounds (round-to-nearest)
  * to a single IEEE double — so every representable double is reachable with
  * its exact probability, closing the double-precision inverse-CDF
  * granularity pathologies (Mironov, CCS 2012) that a plain
  * `-b*log(u)`-style sampler has.
  *
  * Transcendental point evaluations run at `digits + 12` working digits and
  * the interval endpoints are widened by a relative `10^-(digits+4)` margin,
  * which dominates the crudely-bounded accumulation error of the series
  * (same-sign atanh/exp/erf series, bounded condition numbers — see the
  * per-function notes).
  */
final case class Iv(lo: JBD, hi: JBD) {
  def negate: Iv = Iv(hi.negate(), lo.negate())
  def containsZero: Boolean = lo.signum() <= 0 && hi.signum() >= 0
}

object Iv {
  /** Exact point interval. `new JBD(d)` is the exact binary-to-decimal value
    * of the double, matching the reference's `Arb.from_float`.
    */
  def point(x: Double): Iv = { val v = new JBD(x); Iv(v, v) }
  def point(x: JBD): Iv = Iv(x, x)
}

object IvMath {
  private val ONE = JBD.ONE
  private val TWO = JBD.valueOf(2)
  private val NEG_ONE = ONE.negate()
  private val THREE_HALVES = new JBD("1.5")
  private val THREE_QUARTERS = new JBD("0.75")

  /** Sentinels standing in for ±infinity endpoints (an interval touching one
    * can never certify a unique double, so the sampler just refines).
    */
  val HugeNeg: JBD = new JBD("-1E+200")
  val HugePos: JBD = new JBD("1E+200")

  def digitsFor(bits: Int): Int = (bits * 0.30103).toInt + 4

  private def mcF(d: Int) = new MathContext(d, RoundingMode.FLOOR)
  private def mcC(d: Int) = new MathContext(d, RoundingMode.CEILING)
  private def mcN(d: Int) = new MathContext(d, RoundingMode.HALF_EVEN)

  def add(a: Iv, b: Iv, d: Int): Iv =
    Iv(a.lo.add(b.lo, mcF(d)), a.hi.add(b.hi, mcC(d)))

  def sub(a: Iv, b: Iv, d: Int): Iv =
    Iv(a.lo.subtract(b.hi, mcF(d)), a.hi.subtract(b.lo, mcC(d)))

  def mul(a: Iv, b: Iv, d: Int): Iv = {
    val f = mcF(d); val c = mcC(d)
    // Sign-determined fast paths compute the two extreme products
    // directly — VALUE-IDENTICAL to the 4-way min/max below (directed
    // rounding is monotone: x ≤ y ⟹ round_F(x) ≤ round_F(y), so the
    // rounded min IS the min of the rounded), skipping 6 of 8
    // full-precision multiplies on the sampler's hot path.
    if (a.lo.signum() >= 0 && b.lo.signum() >= 0)
      Iv(a.lo.multiply(b.lo, f), a.hi.multiply(b.hi, c))
    else if (a.hi.signum() <= 0 && b.hi.signum() <= 0)
      Iv(a.hi.multiply(b.hi, f), a.lo.multiply(b.lo, c))
    else if (a.lo.signum() >= 0 && b.hi.signum() <= 0)
      Iv(a.hi.multiply(b.lo, f), a.lo.multiply(b.hi, c))
    else if (a.hi.signum() <= 0 && b.lo.signum() >= 0)
      Iv(a.lo.multiply(b.hi, f), a.hi.multiply(b.lo, c))
    else {
      def min4(x1: JBD, x2: JBD, x3: JBD, x4: JBD) = x1.min(x2).min(x3).min(x4)
      def max4(x1: JBD, x2: JBD, x3: JBD, x4: JBD) = x1.max(x2).max(x3).max(x4)
      Iv(
        min4(a.lo.multiply(b.lo, f), a.lo.multiply(b.hi, f), a.hi.multiply(b.lo, f), a.hi.multiply(b.hi, f)),
        max4(a.lo.multiply(b.lo, c), a.lo.multiply(b.hi, c), a.hi.multiply(b.lo, c), a.hi.multiply(b.hi, c))
      )
    }
  }

  /** abs is exact (negation and max introduce no rounding). */
  def abs(a: Iv): Iv =
    if (a.lo.signum() >= 0) a
    else if (a.hi.signum() <= 0) a.negate
    else Iv(JBD.ZERO, a.lo.negate().max(a.hi))

  /** sgn of an interval: {-1}, {0}, {1}, or [-1,1] when the sign is not yet
    * determined (the sampler refines until it is).
    */
  def sgn(a: Iv): Iv =
    if (a.lo.signum() > 0) Iv.point(ONE)
    else if (a.hi.signum() < 0) Iv.point(NEG_ONE)
    else if (a.lo.signum() == 0 && a.hi.signum() == 0) Iv.point(JBD.ZERO)
    else Iv(NEG_ONE, ONE)

  def sqrt(a: Iv, bits: Int): Iv = {
    val d = digitsFor(bits)
    val lo = if (a.lo.signum() <= 0) JBD.ZERO else a.lo.sqrt(mcF(d))
    val hi = a.hi.sqrt(mcC(d))
    Iv(lo, hi)
  }

  /** Natural log of an interval with positive upper endpoint; a nonpositive
    * lower endpoint maps to the -inf sentinel.
    */
  def ln(a: Iv, bits: Int): Iv = {
    require(a.hi.signum() > 0, "ln of a nonpositive interval")
    val d = digitsFor(bits)
    val w = d + 12
    val hi = widenUp(lnPoint(a.hi, w), d + 4)
    val lo = if (a.lo.signum() <= 0) HugeNeg else widenDown(lnPoint(a.lo, w), d + 4)
    Iv(lo, hi)
  }

  // erf(30) > 1 − 1e-392; beyond this erfPoint loses resolution, so such
  // endpoints go straight to the infinity sentinels (they can never certify).
  private val NearOne = JBD.ONE.subtract(new JBD("1E-390"))

  def erfinv(y: Iv, bits: Int): Iv = {
    val d = digitsFor(bits)
    var seedZ: JBD = null
    val lo =
      if (y.lo.compareTo(NearOne.negate()) <= 0) HugeNeg
      else { val (z, e) = erfinvPoint(y.lo, d + 2); seedZ = z; z.subtract(e) }
    val hi =
      if (y.hi.compareTo(NearOne) >= 0) HugePos
      // the endpoints are ~2^-bits apart, so the lo root seeds hi's Newton
      else { val (z, e) = erfinvPoint(y.hi, d + 2, seedZ); z.add(e) }
    Iv(lo, hi)
  }

  /** Unique-double certification: BigDecimal.doubleValue is the correctly
    * (nearest-even) rounded double, and rounding is monotone, so if both
    * endpoints round to the same finite double, every real in the interval
    * does.
    */
  def toDoubleExact(a: Iv): Option[Double] = {
    val d1 = a.lo.doubleValue(); val d2 = a.hi.doubleValue()
    // same-sign infinities are a certified result too: the whole interval
    // overflows the double range, and the correctly-rounded value IS the
    // infinity (a huge Laplace scale would otherwise refine forever)
    if (d1 == d2 && !d1.isNaN) Some(d1) else None
  }

  // ---- widening helpers: relative 10^-k margin around a point value ----

  private def widenUp(v: JBD, k: Int): JBD =
    if (v.signum() == 0) v else v.add(v.abs().movePointLeft(k))

  private def widenDown(v: JBD, k: Int): JBD =
    if (v.signum() == 0) v else v.subtract(v.abs().movePointLeft(k))

  // ---- cached constants ----

  private val ln2Cache = new java.util.concurrent.ConcurrentHashMap[Int, JBD]()
  private val piCache = new java.util.concurrent.ConcurrentHashMap[Int, JBD]()
  private val twoOverSqrtPiCache = new java.util.concurrent.ConcurrentHashMap[Int, JBD]()

  /** ln 2 = 2·atanh(1/3), same-sign series, to ~w digits. */
  private def ln2Const(w: Int): JBD = {
    var v = ln2Cache.get(w)
    if (v == null) {
      val mc = mcN(w + 5)
      val third = ONE.divide(JBD.valueOf(3), mc)
      val tsq = third.multiply(third, mc)
      var c = third
      var sum = third
      var k = 1
      val tol = new JBD(BigInteger.ONE, w + 3)
      var go = true
      while (go) {
        c = c.multiply(tsq, mc)
        val contrib = c.divide(JBD.valueOf(2L * k + 1), mc)
        sum = sum.add(contrib, mc)
        k += 1
        go = contrib.compareTo(tol) > 0
      }
      v = sum.multiply(TWO, mc)
      ln2Cache.put(w, v)
    }
    v
  }

  /** π by Machin's formula: π = 16·atan(1/5) − 4·atan(1/239). */
  private def piConst(w: Int): JBD = {
    var v = piCache.get(w)
    if (v == null) {
      val mc = mcN(w + 5)
      def atanInv(x: Long): JBD = {
        val invX = ONE.divide(JBD.valueOf(x), mc)
        val negInvX2 = invX.multiply(invX, mc).negate()
        var c = invX
        var sum = invX
        var k = 1
        val tol = new JBD(BigInteger.ONE, w + 3)
        var go = true
        while (go) {
          c = c.multiply(negInvX2, mc)
          val contrib = c.divide(JBD.valueOf(2L * k + 1), mc)
          sum = sum.add(contrib, mc)
          k += 1
          go = contrib.abs().compareTo(tol) > 0
        }
        sum
      }
      v = atanInv(5).multiply(JBD.valueOf(16), mc)
        .subtract(atanInv(239).multiply(JBD.valueOf(4), mc), mc)
      piCache.put(w, v)
    }
    v
  }

  private def twoOverSqrtPi(w: Int): JBD = {
    var v = twoOverSqrtPiCache.get(w)
    if (v == null) {
      val mc = mcN(w + 5)
      v = TWO.divide(piConst(w).sqrt(mc), mc)
      twoOverSqrtPiCache.put(w, v)
    }
    v
  }

  // ---- point transcendentals (value at ~w digits, relative error well
  //      inside the caller's widening margin) ----

  /** x · 2^k, exactly (2^-k = 5^k·10^-k is an exact decimal), then rounded. */
  private def mulPow2(x: JBD, k: Int, mc: MathContext): JBD =
    if (k == 0) x
    else if (k > 0) x.multiply(new JBD(BigInteger.ONE.shiftLeft(k)), mc)
    else x.multiply(new JBD(BigInteger.valueOf(5).pow(-k), -k), mc)

  /** ln x for x > 0 via x = m·2^e reduction (m in [0.75,1.5)) and the
    * atanh series ln m = 2·Σ t^(2k+1)/(2k+1), t = (m-1)/(m+1), |t| ≤ 1/5.
    * All series terms share t's sign (no cancellation); when e = 0 the
    * reduction performs no rounding so tiny results keep full relative
    * accuracy; when e ≠ 0, |ln x| ≥ ln(4/3) bounds the cancellation in
    * 2s + e·ln2 to a small constant factor.
    */
  private[graft] def lnPoint(x: JBD, w: Int): JBD = {
    require(x.signum() > 0, "lnPoint needs a positive argument")
    val mc = mcN(w)
    var e = 0
    var m = x
    // The e = 0 case is decided by direct BigDecimal comparison, NOT via
    // Math.getExponent of the rounded double: for x in [0.75,1)
    // getExponent gives -1, and a double-then-halve round trip through
    // mulPow2 rounds m to w digits, silently voiding the "num is exact"
    // claim below exactly where it matters (x = 1-δ, tiny |ln x|).
    if (x.compareTo(THREE_QUARTERS) >= 0 && x.compareTo(THREE_HALVES) < 0) {
      // e = 0, m = x untouched: num = m - 1 below is exact.
    } else {
      val xd = x.doubleValue()
      if (xd > 0.0 && !xd.isInfinity) e = Math.getExponent(xd)
      else e = ((x.precision().toLong - x.scale()) * 3.321928).toInt
      if (e != 0) m = mulPow2(x, -e, mc)
      while (m.compareTo(THREE_HALVES) >= 0) { m = mulPow2(m, -1, mc); e += 1 }
      while (m.compareTo(THREE_QUARTERS) < 0) { m = mulPow2(m, 1, mc); e -= 1 }
      // This branch cannot land on e == 0 with a rounded m except when a
      // boundary value (x just below 0.75 or 1.5 at w digits) rounds onto
      // it; there |ln m| ≥ ln(4/3) - 10^-w, so the relative error stays
      // inside the series' own tolerance. The cancellation-critical
      // near-1 inputs always take the exact branch above.
    }
    val num = m.subtract(ONE) // exact when e == 0 (m never rounded)
    val t = num.divide(m.add(ONE), mc)
    var result: JBD = null
    if (t.signum() == 0) result = JBD.ZERO
    else {
      val tsq = t.multiply(t, mc)
      var c = t
      var sum = t
      var k = 1
      val tol = t.abs().movePointLeft(w)
      var go = true
      while (go) {
        c = c.multiply(tsq, mc)
        val contrib = c.divide(JBD.valueOf(2L * k + 1), mc)
        sum = sum.add(contrib, mc)
        k += 1
        go = contrib.abs().compareTo(tol) > 0
      }
      result = sum.multiply(TWO, mc)
    }
    if (e == 0) result
    else result.add(JBD.valueOf(e).multiply(ln2Const(w), mc), mc)
  }

  /** e^x via r = x − k·ln2 reduction (|r| ≤ 0.35) and the Taylor series. */
  private[graft] def expPoint(x: JBD, w: Int): JBD = {
    val xd = x.doubleValue()
    require(math.abs(xd) < 1e6, "expPoint argument out of supported range")
    val mc = mcN(w)
    val k = Math.round(xd / 0.6931471805599453).toInt
    val r = x.subtract(JBD.valueOf(k).multiply(ln2Const(w), mc), mc)
    var term = ONE
    var sum = ONE
    var i = 1
    val tol = new JBD(BigInteger.ONE, w)
    while (term.abs().compareTo(tol) > 0) {
      term = term.multiply(r, mc).divide(JBD.valueOf(i), mc)
      sum = sum.add(term, mc)
      i += 1
    }
    mulPow2(sum, k, mc)
  }

  /** erf z to ABSOLUTE error ≤ 10^-A. The Maclaurin series alternates with
    * intermediate terms peaking near e^(z²), so the working precision adds
    * z²·log10(e) digits to keep the cancellation harmless.
    */
  private[graft] def erfPoint(z: JBD, A: Int): JBD = {
    val zd = z.doubleValue()
    val az = math.abs(zd)
    if (az > 30.0) return if (zd > 0) ONE else NEG_ONE // |erfc(30)| < 1e-391
    val w = A + (az * az * 0.4343).toInt + 10
    val mc = mcN(w)
    val negZsq = z.multiply(z, mc).negate()
    var c = z
    var sum = z
    var k = 1
    val tol = new JBD(BigInteger.ONE, A + 4)
    var go = true
    while (go) {
      c = c.multiply(negZsq, mc).divide(JBD.valueOf(k), mc)
      val contrib = c.divide(JBD.valueOf(2L * k + 1), mc)
      sum = sum.add(contrib, mc)
      k += 1
      go = contrib.abs().compareTo(tol) > 0
    }
    sum.multiply(twoOverSqrtPi(w), mc)
  }

  /** Acklam's rational approximation to the standard normal quantile
    * (public domain; |relative error| < 1.2e-9 across (0,1)).
    */
  private def probitDouble(p: Double): Double = {
    val a0 = -3.969683028665376e+01; val a1 = 2.209460984245205e+02
    val a2 = -2.759285104469687e+02; val a3 = 1.383577518672690e+02
    val a4 = -3.066479806614716e+01; val a5 = 2.506628277459239e+00
    val b0 = -5.447609879822406e+01; val b1 = 1.615858368580409e+02
    val b2 = -1.556989798598866e+02; val b3 = 6.680131188771972e+01
    val b4 = -1.328068155288572e+01
    val c0 = -7.784894002430293e-03; val c1 = -3.223964580411365e-01
    val c2 = -2.400758277161838e+00; val c3 = -2.549732539343734e+00
    val c4 = 4.374664141464968e+00; val c5 = 2.938163982698783e+00
    val d0 = 7.784695709041462e-03; val d1 = 3.224671290700398e-01
    val d2 = 2.445134137142996e+00; val d3 = 3.754408661907416e+00
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c0 * q + c1) * q + c2) * q + c3) * q + c4) * q + c5) /
        ((((d0 * q + d1) * q + d2) * q + d3) * q + 1.0)
    } else if (p <= 1.0 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a0 * r + a1) * r + a2) * r + a3) * r + a4) * r + a5) * q /
        (((((b0 * r + b1) * r + b2) * r + b3) * r + b4) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c0 * q + c1) * q + c2) * q + c3) * q + c4) * q + c5) /
        ((((d0 * q + d1) * q + d2) * q + d3) * q + 1.0)
    }
  }

  /** Initial erfinv guess: Acklam in double range; asymptotic
    * z ≈ sqrt(L − ln(πL)/2), L = −ln(1−|y|), once 1−|y| underflows double.
    */
  private def erfinvSeed(y: JBD, w: Int): JBD = {
    val yd = y.doubleValue()
    val p = (yd + 1.0) / 2.0
    if (p > 0.0 && p < 1.0 && math.abs(yd) < 0.9999999)
      new JBD(probitDouble(p) / math.sqrt(2.0))
    else {
      val mc = mcN(w)
      val delta = ONE.subtract(y.abs())
      val bigL = lnPoint(delta, w).negate()
      val inner = bigL.subtract(
        lnPoint(bigL.multiply(piConst(w), mc), w).divide(TWO, mc), mc)
      val z = inner.max(ONE).sqrt(mc)
      if (y.signum() < 0) z.negate() else z
    }
  }

  private val HalfFactor = new JBD("0.5")
  private val Centi = new JBD("0.01")

  /** erfinv(y) for y strictly inside (−erf(30), erf(30)): Newton against the
    * rigorous erf, with a mean-value-theorem error bound derived from the
    * in-loop residual. With Δ = 0.01: if |erf(z) − y| ≤ erf'(z)·0.5·Δ then
    * the root is within Δ of z (0.5 ≤ exp(−(2|z|+Δ)Δ) for |z| ≤ 30 lower-
    * bounds min erf' over [z−Δ, z+Δ] relative to erf'(z)), so
    * |z − erfinv(y)| ≤ |erf(z) − y| / (erf'(z)·0.5).
    */
  private[graft] def erfinvPoint(y: JBD, d: Int, seed: JBD = null): (JBD, JBD) = {
    var z = if (seed != null) seed else erfinvSeed(y, d + 12)
    var iter = 0
    val target = new JBD(BigInteger.ONE, d + 2)
    while (iter < 60) {
      val zd = z.doubleValue()
      val A = d + (zd * zd * 0.4343).toInt + 8
      val mc = mcN(A + 5)
      val r = erfPoint(z, A).subtract(y).round(mc)
      val deriv = twoOverSqrtPi(A).multiply(expPoint(z.multiply(z, mc).negate(), A + 5), mc)
      val rTotal = r.abs().add(new JBD(BigInteger.ONE, A)) // + erf eval error
      val bound = rTotal.divide(deriv.multiply(HalfFactor, mc), mc)
      if (bound.compareTo(Centi) <= 0 && bound.compareTo(target) <= 0)
        return (z, bound)
      var step = r.divide(deriv, mc)
      if (step.abs().compareTo(ONE) > 0)
        step = if (step.signum() > 0) ONE else NEG_ONE
      z = z.subtract(step, mc)
      iter += 1
    }
    throw new IllegalStateException("erfinv Newton did not converge")
  }
}

/** Exactly-rounded continuous samplers, mirroring the reference's
  * `construct_inverse_sampler` (`random/inverse_cdf.py:12-47`): draw 63 bits
  * of the uniform at a time, evaluate the inverse CDF on the dyadic interval
  * [bits·2^-n, (bits+1)·2^-n], and emit once the interval certifies a unique
  * double.
  *
  * Privacy: the emitted value equals round-to-nearest-double of an IDEAL
  * real-valued draw (the uniform bit stream defines a real u; the output is
  * the correct rounding of F⁻¹(u)). Rounding is a data-independent
  * post-processing of the ideal mechanism, so the DP guarantee of the
  * real-valued Laplace/Gaussian carries over exactly — which is precisely
  * what a naive floating-point sampler loses (its output set depends on the
  * location in a simulatable way; Mironov, CCS 2012).
  */
object Precise {
  private val StepBits = 63
  private val MaxBits = 16065 // 255 rounds; P(reaching this) < 2^-1000

  /** 2^-n as an exact BigDecimal; memoized — n is a multiple of StepBits
    * and 5^63 alone is a 45-digit BigInteger pow per draw otherwise. */
  private val pow2NegCache = new java.util.concurrent.ConcurrentHashMap[Int, JBD]()
  private def pow2Neg(n: Int): JBD = {
    var v = pow2NegCache.get(n)
    if (v == null) {
      v = new JBD(BigInteger.valueOf(5).pow(n), n)
      pow2NegCache.put(n, v)
    }
    v
  }

  def inverseSample(invCdf: (Iv, Int) => Iv, rng: RandomSource): Double = {
    var n = 0
    var bits = BigInteger.ZERO
    var out = 0.0
    var done = false
    while (!done) {
      n += StepBits
      if (n > MaxBits) throw new IllegalStateException("inverse sampler did not converge")
      bits = bits.shiftLeft(StepBits).or(BigInteger.valueOf(rng.nextLong() >>> 1))
      val sc = pow2Neg(n)
      val p = Iv(new JBD(bits).multiply(sc), new JBD(bits.add(BigInteger.ONE)).multiply(sc))
      IvMath.toDoubleExact(invCdf(p, n)) match {
        case Some(v) => out = v; done = true
        case None => ()
      }
    }
    out
  }

  private val Half = new JBD("0.5")

  /** Inverse CDF of Laplace(u, b): u − b·sgn(p−1/2)·ln(1 − 2|p−1/2|)
    * (`random/laplace.py:12-49`).
    */
  def laplaceInvCdf(u: Double, b: Double): (Iv, Int) => Iv = {
    // the exact decimal expansions of u and b are loop constants of the
    // refinement (new JBD(double) re-derives them otherwise)
    val bPt = Iv.point(b)
    val uPt = Iv.point(u)
    (p: Iv, bits: Int) => {
      val d = IvMath.digitsFor(bits)
      val pmh = Iv(p.lo.subtract(Half), p.hi.subtract(Half)) // exact
      val s = IvMath.sgn(pmh)
      val a = IvMath.abs(pmh)
      // 1 − 2|p−1/2|, exact dyadic arithmetic
      val arg = Iv(
        JBD.ONE.subtract(a.hi.add(a.hi)),
        JBD.ONE.subtract(a.lo.add(a.lo)))
      val l = IvMath.ln(arg, bits)
      val term = IvMath.mul(IvMath.mul(bPt, s, d), l, d)
      IvMath.sub(uPt, term, d)
    }
  }

  /** Inverse CDF of N(u, σ²): u + σ·√2·erfinv(2p−1)
    * (`random/continuous_gaussian.py:13-76`).
    */
  def gaussianInvCdf(u: Double, sigmaSquared: Double)(p: Iv, bits: Int): Iv = {
    val d = IvMath.digitsFor(bits)
    val y = Iv(
      p.lo.add(p.lo).subtract(JBD.ONE),
      p.hi.add(p.hi).subtract(JBD.ONE)) // exact
    val z = IvMath.erfinv(y, bits)
    val sigma = IvMath.sqrt(Iv.point(sigmaSquared), bits + 8)
    val sqrt2 = IvMath.sqrt(Iv.point(2.0), bits + 8)
    IvMath.add(Iv.point(u), IvMath.mul(IvMath.mul(sigma, sqrt2, d), z, d), d)
  }

  /** Inverse CDF of Uniform(l, u): l·(1−p) + p·u (`random/uniform.py:10-31`). */
  def uniformInvCdf(l: Double, u: Double)(p: Iv, bits: Int): Iv = {
    val d = IvMath.digitsFor(bits)
    val oneMinusP = Iv(JBD.ONE.subtract(p.hi), JBD.ONE.subtract(p.lo)) // exact
    IvMath.add(
      IvMath.mul(Iv.point(l), oneMinusP, d),
      IvMath.mul(p, Iv.point(u), d), d)
  }

  def laplace(b: Double, rng: RandomSource, u: Double = 0.0): Double = {
    require(b > 0 && !b.isInfinity && !b.isNaN, s"scale must be positive and finite, got $b")
    require(!u.isInfinity && !u.isNaN, s"location must be finite, got $u")
    inverseSample(laplaceInvCdf(u, b), rng)
  }

  def gaussian(sigmaSquared: Double, rng: RandomSource, u: Double = 0.0): Double = {
    require(sigmaSquared > 0 && !sigmaSquared.isInfinity && !sigmaSquared.isNaN,
      s"variance must be positive and finite, got $sigmaSquared")
    require(!u.isInfinity && !u.isNaN, s"location must be finite, got $u")
    inverseSample(gaussianInvCdf(u, sigmaSquared), rng)
  }

  def uniform(lower: Double, upper: Double, rng: RandomSource): Double = {
    require(!lower.isNaN && !upper.isNaN && !lower.isInfinity && !upper.isInfinity,
      s"bounds must be finite, got [$lower, $upper]")
    require(lower <= upper, s"lower $lower must not exceed upper $upper")
    if (lower == upper) lower
    else inverseSample(uniformInvCdf(lower, upper), rng)
  }
}
