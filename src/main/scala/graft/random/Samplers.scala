package graft.random

import graft.exact.Rational

/** Pluggable randomness source. Default: SplittableRandom seeded from
  * SecureRandom (one per partition in distributed use; the reference uses
  * numpy PCG64, `random/rng.py:23-28`).
  */
trait RandomSource extends Serializable {
  def nextLong(): Long
  def nextDouble(): Double // uniform [0, 1)
  def nextGaussianStd(): Double

  /** Uniform BigInt in [0, bound), exactly (rejection sampling, no modulo
    * bias).
    */
  def nextBigInt(bound: BigInt): BigInt = {
    require(bound > 0)
    if (bound.isValidLong) {
      val b = bound.toLong
      val limit = (Long.MaxValue / b) * b
      var x = nextLong() >>> 1
      while (x >= limit) x = nextLong() >>> 1
      BigInt(x % b)
    } else {
      val bits = bound.bitLength
      val nBytes = (bits + 7) / 8
      val excessBits = nBytes * 8 - bits
      var r: BigInt = null
      do {
        val bytes = new Array[Byte](nBytes)
        var i = 0
        var buf = 0L
        var have = 0
        while (i < nBytes) {
          if (have == 0) { buf = nextLong(); have = 8 }
          bytes(i) = (buf & 0xff).toByte
          buf >>>= 8
          have -= 1
          i += 1
        }
        r = BigInt(1, bytes) >> excessBits
      } while (r >= bound)
      r
    }
  }

  /** Bernoulli(p) with exact rational p. */
  def bernoulli(p: Rational): Boolean = {
    if (p.num <= 0) false
    else if (p.num >= p.den) true
    else nextBigInt(p.den) < p.num
  }
}

final class SplitMix(seed: Long) extends RandomSource {
  private val rng = new java.util.SplittableRandom(seed)
  private var haveSpare = false
  private var spare = 0.0
  def nextLong(): Long = rng.nextLong()
  def nextDouble(): Double = rng.nextDouble()
  def nextGaussianStd(): Double = {
    // Marsaglia polar method
    if (haveSpare) { haveSpare = false; spare }
    else {
      var u = 0.0; var v = 0.0; var s = 0.0
      do {
        u = 2.0 * rng.nextDouble() - 1.0
        v = 2.0 * rng.nextDouble() - 1.0
        s = u * u + v * v
      } while (s >= 1.0 || s == 0.0)
      val m = math.sqrt(-2.0 * math.log(s) / s)
      spare = v * m
      haveSpare = true
      u * m
    }
  }
}

object RandomSource {
  def secureSeed(): Long = new java.security.SecureRandom().nextLong()
  def default(): RandomSource = new SplitMix(secureSeed())

  /** Per-group seed: first 8 bytes of SHA-256 of the encoded group key, XORed
    * with the session seed. A 32-bit `hashCode` collides deterministically
    * beyond ~2^16 groups, which would give distinct groups an identical noise
    * stream; 64 bits of a cryptographic hash keeps per-group streams
    * independent out to ~2^32 groups.
    */
  def groupSeed(sessionSeed: Long, encodedKey: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h = md.digest(encodedKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (h(i) & 0xffL); i += 1 }
    x ^ sessionSeed
  }
}

/** Exact discrete samplers over BigInt/rational arithmetic — no floating
  * point in the guarantee-critical path.
  *
  * Algorithms from Canonne, Kamath & Steinke, "The Discrete Gaussian for
  * Differential Privacy" (NeurIPS 2020, arXiv:2004.00010): exact
  * Bernoulli(exp(−γ)), geometric, discrete Laplace, discrete Gaussian.
  * (The reference ports the same paper: `random/discrete_gaussian.py:22-172`.)
  */
object Samplers {

  /** Bernoulli(exp(−γ)) for rational γ ∈ [0,1]. */
  private def bernoulliExp1(gamma: Rational, rng: RandomSource): Boolean = {
    var k = BigInt(1)
    var accept = true
    while (accept) {
      // Bernoulli(γ/k)
      if (rng.bernoulli(Rational(gamma.num, gamma.den * k))) k += 1
      else accept = false
    }
    (k % 2) == 1
  }

  /** Bernoulli(exp(−γ)) for any rational γ ≥ 0. */
  def bernoulliExp(gamma: Rational, rng: RandomSource): Boolean = {
    require(gamma.signum >= 0)
    var g = gamma
    while (g > Rational.one) {
      if (!bernoulliExp1(Rational.one, rng)) return false
      g = g - Rational.one
    }
    bernoulliExp1(g, rng)
  }

  /** Geometric with P(k) = (1−e^(−x))·e^(−kx), k ≥ 0, for rational x > 0. */
  def geometricExp(x: Rational, rng: RandomSource): BigInt = {
    require(x.signum > 0)
    val (n, d) = (x.num, x.den)
    // Sample U uniform in {0..d−1} accepted with prob e^(−U/d);
    // then V ~ Geom(e^(−1)); result = (U + d·V) / n  (integer division).
    var u = rng.nextBigInt(d)
    while (!bernoulliExp(Rational(u, d), rng)) u = rng.nextBigInt(d)
    var v = BigInt(0)
    while (bernoulliExp1(Rational.one, rng)) v += 1
    (u + d * v) / n
  }

  /** Two-sided geometric / discrete Laplace with scale t:
    * P(z) ∝ exp(−|z|/t). This is the reference's AddGeometricNoise
    * (`noise_mechanisms.py:173-323`): ε = d_in/t.
    */
  def discreteLaplace(scale: Rational, rng: RandomSource): BigInt = {
    require(scale.signum > 0)
    val invScale = scale.reciprocal
    while (true) {
      val negative = rng.bernoulli(Rational.half)
      val magnitude = geometricExp(invScale, rng)
      if (!(negative && magnitude == 0))
        return if (negative) -magnitude else magnitude
    }
    BigInt(0) // unreachable
  }

  /** Discrete Gaussian with parameter σ² (rational):
    * P(z) ∝ exp(−z²/(2σ²)). ρ-zCDP: ρ = d_in²/(2σ²).
    */
  def discreteGaussian(sigmaSquared: Rational, rng: RandomSource): BigInt = {
    require(sigmaSquared.signum > 0)
    // t = floor(σ) + 1
    val sigmaFloor = isqrtRational(sigmaSquared)
    val t = sigmaFloor + 1
    val tR = Rational(t)
    while (true) {
      val y = discreteLaplace(tR, rng)
      // accept with prob exp(−(|y| − σ²/t)² / (2σ²))
      val absY = Rational(y.abs)
      val dev = absY - sigmaSquared / tR
      val gamma = (dev * dev) / (Rational.two * sigmaSquared)
      if (bernoulliExp(gamma, rng)) return y
    }
    BigInt(0) // unreachable
  }

  /** floor(sqrt(q)) for rational q ≥ 0. */
  private def isqrtRational(q: Rational): BigInt = {
    // floor(sqrt(n/d)) = isqrt(floor(n/d)) adjusted; use isqrt(n*d)/d lower bound.
    val s = BigInt((q.num * q.den).bigInteger.sqrt()) / q.den
    // correct potential off-by-one
    var r = s
    while ((r + 1) * (r + 1) * q.den <= q.num) r += 1
    while (r > 0 && r * r * q.den > q.num) r -= 1
    r
  }

  /** Continuous Laplace(b): exactly-rounded interval inverse-CDF sampling
    * (Precise.laplace), matching the reference's MPFR/Arb path
    * (`random/laplace.py:12-49`) — every representable double reachable, no
    * double-granularity gaps near 0.
    */
  def laplace(scale: Double, rng: RandomSource): Double =
    if (scale == 0.0) 0.0 else Precise.laplace(scale, rng)

  /** Continuous Gaussian N(0, σ²), exactly-rounded interval inverse-CDF
    * (`random/continuous_gaussian.py:13-76`).
    */
  def gaussian(sigma: Double, rng: RandomSource): Double =
    if (sigma == 0.0) 0.0 else Precise.gaussian(sigma * sigma, rng)

  /** Double-precision fast variants, NOT reference-parity: granularity
    * ~2^-52·scale near 0. Kept for non-guarantee uses (simulation harnesses).
    */
  def laplaceFast(scale: Double, rng: RandomSource): Double = {
    val u = rng.nextDouble() - 0.5
    -scale * math.signum(u) * math.log1p(-2.0 * math.abs(u))
  }

  def gaussianFast(sigma: Double, rng: RandomSource): Double =
    sigma * rng.nextGaussianStd()
}
