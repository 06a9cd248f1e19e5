package graft.random

import org.apache.commons.math3.special.Erf

/** Per-record differential-privacy samplers (reference `utils/prdp.py`).
  *
  * The reference evaluates these inverse CDFs in arbitrary-precision interval
  * arithmetic (Arb) and retries at higher precision until the interval rounds
  * to one float. Here the same closed forms are evaluated directly in double
  * precision: the inverse CDFs are monotone and smooth away from p = 1/2, so
  * double evaluation yields a sample whose distribution differs from the
  * ideal by at most a few ulps of CDF mass — the distributional error is
  * absorbed into the mechanisms' (documented) floating-point slack rather
  * than iterated away.
  */
object Prdp {

  private val InvE = -1.0 / math.E

  /** Lambert W on the two real branches: `branch = 0` (principal, z ≥ −1/e)
    * and `branch = -1` (lower, −1/e ≤ z < 0). Halley iteration from a
    * branch-point / asymptotic initial guess; converges in < 10 steps over
    * the full domain.
    */
  def lambertW(z: Double, branch: Int): Double = {
    require(branch == 0 || branch == -1, s"no real branch $branch")
    if (z.isNaN) return Double.NaN
    if (z < InvE) {
      // allow tiny negative excursions from rounding at the branch point
      if (z > InvE - 1e-12) return -1.0
      return Double.NaN
    }
    if (z == 0.0) return if (branch == 0) 0.0 else Double.NegativeInfinity
    var w =
      if (branch == 0) {
        if (z < 0.0) {
          // branch-point series: W ≈ −1 + p − p²/3, p = √(2(e·z+1))
          val p = math.sqrt(2.0 * (math.E * z + 1.0))
          -1.0 + p - p * p / 3.0
        } else if (z < 3.0) z / (1.0 + z) // small-z rational guess
        else { // asymptotic L1 − L2 + L2/L1
          val l1 = math.log(z); val l2 = math.log(l1)
          l1 - l2 + l2 / l1
        }
      } else {
        require(z < 0.0, s"W_{-1} needs z in [-1/e, 0), got $z")
        if (z < -0.1) {
          val p = -math.sqrt(2.0 * (math.E * z + 1.0))
          -1.0 + p - p * p / 3.0
        } else { // z → 0⁻ asymptotic: ln(−z) − ln(−ln(−z))
          val l1 = math.log(-z); val l2 = math.log(-l1)
          l1 - l2 + l2 / l1
        }
      }
    var i = 0
    while (i < 50) {
      val ew = math.exp(w)
      val f = w * ew - z
      val wp1 = w + 1.0
      if (wp1 == 0.0) return -1.0
      // Halley step
      val dw = f / (ew * wp1 - (w + 2.0) * f / (2.0 * wp1))
      w -= dw
      if (math.abs(dw) <= 1e-15 * (1.0 + math.abs(w))) i = 50 else i += 1
    }
    w
  }

  /** Φ: unit-Gaussian CDF. */
  def phi(x: Double): Double = 0.5 * (1.0 + Erf.erf(x / math.sqrt(2.0)))

  /** Φ⁻¹: unit-Gaussian inverse CDF. */
  def phiInv(p: Double): Double = math.sqrt(2.0) * Erf.erfInv(2.0 * p - 1.0)

  /** Inverse CDF of the generalized Gaussian with shape 1/2 (reference
    * `prdp.py:92-148`):
    * 0 at p = 1/2; ±σ·(W(∓(2p−2∨−2p)/e) + 1)² on the two sides, with the
    * lower Lambert branch for negative arguments.
    */
  def sqrtGaussianInverseCdf(p: Double, sigma: Double): Double = {
    require(p >= 0.0 && p <= 1.0)
    if (p == 0.5) return 0.0
    if (p > 0.5) {
      val z = (2.0 * p - 2.0) / math.E
      val w = lambertW(z, if (z >= 0) 0 else -1)
      sigma * (w + 1.0) * (w + 1.0)
    } else {
      val z = -2.0 * p / math.E
      val w = lambertW(z, if (z >= 0) 0 else -1)
      -sigma * (w + 1.0) * (w + 1.0)
    }
  }

  /** One sample from the shape-1/2 generalized Gaussian. */
  def sqrtGaussian(sigma: Double, rng: RandomSource): Double =
    sqrtGaussianInverseCdf(rng.nextDouble(), sigma)

  /** Inverse CDF of the exponential polylogarithmic distribution (reference
    * `prdp.py:182-287`): symmetric about 0; for p above 1/2,
    * σ·exp((2d)^{-1/2}·Φ⁻¹((1−Φ(t))(2p−1) + Φ(t)) + (2d)^{-1}) − σ·a with
    * t = (ln a − (2d)^{-1})·√(2d), mirrored below 1/2.
    */
  def expPolylogInverseCdf(p: Double, d: Double, a: Double, sigma: Double): Double = {
    require(p >= 0.0 && p <= 1.0)
    require(d > 0.0 && a > 0.0)
    if (p == 0.5) return 0.0
    val twoD = 2.0 * d
    val invSqrt2d = 1.0 / math.sqrt(twoD)
    val inv2d = 1.0 / twoD
    val t = (math.log(a) - inv2d) / invSqrt2d
    val phiT = phi(t)
    val mass = 1.0 - phiT
    if (p > 0.5) {
      sigma * math.exp(invSqrt2d * phiInv(mass * (2.0 * p - 1.0) + phiT) + inv2d) -
        sigma * a
    } else {
      -sigma * math.exp(invSqrt2d * phiInv(mass * (1.0 - 2.0 * p) + phiT) + inv2d) +
        sigma * a
    }
  }

  /** One sample from the exponential polylogarithmic distribution. */
  def expPolylog(d: Double, a: Double, sigma: Double, rng: RandomSource): Double =
    expPolylogInverseCdf(rng.nextDouble(), d, a, sigma)
}
