package graft.measurements

import graft.core.Measurement
import graft.domains.Domain
import graft.exact.ExactNum
import graft.measures._
import graft.metrics.Metric

/** Tight ρ-zCDP → (ε, δ)-DP conversion (Canonne–Kamath–Steinke, "The
  * Discrete Gaussian for Differential Privacy", arXiv:2004.00010,
  * Proposition 7): a ρ-zCDP mechanism is (ε, δ(ε))-DP with
  *
  *   δ(ε) = inf_{α>1} exp((α−1)(αρ−ε)) · (1−1/α)^α / (α−1).
  *
  * This is strictly tighter than the classic Bun–Steinke bound
  * ε = ρ + 2√(ρ·ln(1/δ)) that the reference uses (`converters.py:164-250`),
  * so for the same (ε, δ) budget a larger ρ — i.e. less noise — is
  * admissible. Opt-in: the default calibration path keeps the
  * reference-matching bound.
  *
  * In the stable form used here the exponent is
  *   g(α) = (α−1)(αρ−ε) + (α−1)·ln(α−1) − α·ln(α),   δ = exp(min_α g)
  * with g''(α) = 2ρ + 1/(α−1) − 1/α > 0, so g is strictly convex and
  * ternary search finds the global minimum.
  */
object TightZcdp {

  /** Conservative (upward-biased) δ(ε; ρ). */
  def deltaFor(rho: Double, eps: Double): Double = {
    require(rho > 0 && eps >= 0)
    def g(a: Double): Double =
      (a - 1.0) * (a * rho - eps) + (a - 1.0) * math.log(a - 1.0) -
        a * math.log(a)
    // the unconstrained optimum of the quadratic part sits near
    // α ≈ (ε+ρ)/(2ρ); bracket it generously
    var lo = 1.0 + 1e-12
    var hi = math.max(4.0, (eps + rho) / rho + 4.0)
    var i = 0
    while (i < 200) {
      val m1 = lo + (hi - lo) / 3.0
      val m2 = hi - (hi - lo) / 3.0
      if (g(m1) <= g(m2)) hi = m2 else lo = m1
      i += 1
    }
    val dMin = math.exp(g((lo + hi) / 2.0))
    // widen by a relative margin so the reported δ upper-bounds the true
    // infimum despite double rounding in g and the search tolerance
    math.min(1.0, dMin * (1.0 + 1e-9) + java.lang.Double.MIN_VALUE)
  }

  /** Smallest ε (up to a conservative margin) with δ(ε; ρ) ≤ delta. Never
    * exceeds the classic bound ρ + 2√(ρ·ln(1/δ)).
    */
  def epsFor(rho: Double, delta: Double): Double = {
    require(rho > 0 && delta > 0 && delta < 1)
    val epsStd = rho + 2.0 * math.sqrt(rho * (-math.log(delta)))
    var lo = 0.0
    var hi = epsStd
    if (deltaFor(rho, hi) > delta) return epsStd // numeric guard
    var i = 0
    while (i < 100) {
      val mid = 0.5 * (lo + hi)
      if (deltaFor(rho, mid) <= delta) hi = mid else lo = mid
      i += 1
    }
    // hi is feasible by construction; nudge up one ulp for safety
    Math.nextUp(hi)
  }

  /** Largest ρ (up to a conservative margin) whose tight conversion stays
    * within (eps, delta). At least the classic calibration's ρ.
    */
  def rhoFor(eps: Double, delta: Double): Double = {
    require(eps > 0 && delta > 0 && delta < 1)
    // classic calibration (solve x² + 2bx − ε = 0 for x = √ρ) is feasible
    val b = math.sqrt(-math.log(delta))
    val x = -b + math.sqrt(b * b + eps)
    val rhoStd = math.max(x * x * (1.0 - 1e-9), java.lang.Double.MIN_VALUE)
    var lo = rhoStd
    var hi = eps // δ(ε; ρ=ε) ≥ inf exp((α−1)²ε)/(α−1)·(1−1/α)^α → not ≤ δ for small δ
    if (deltaFor(hi, eps) <= delta) return hi
    var i = 0
    while (i < 100) {
      val mid = 0.5 * (lo + hi)
      if (deltaFor(mid, eps) <= delta) lo = mid else hi = mid
      i += 1
    }
    // lo is feasible; shave a margin so downstream double ops stay inside
    math.max(rhoStd, lo * (1.0 - 1e-9))
  }
}

/** ρ-zCDP ⇒ (ε, δ) via the tight CKS conversion — the opt-in counterpart of
  * [[RhoZCDPToApproxDP]].
  */
final case class RhoZCDPToApproxDPTight(inner: Measurement, delta: ExactNum)
    extends Measurement {
  require(inner.outputMeasure == RhoZCDP)
  require(delta > ExactNum.zero && delta < ExactNum.one)
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = ApproxDP
  override def isInteractive: Boolean = inner.isInteractive
  def privacyFunction(dIn: ExactNum): PrivacyBudget = {
    val RhoZCDPBudget(rho) = inner.privacyFunction(dIn)
    if (rho.isInfinite) ApproxDPBudget(ExactNum.PosInf, delta)
    else if (rho.isZero) ApproxDPBudget(ExactNum.zero, delta)
    else {
      val eps = TightZcdp.epsFor(
        rho.toDouble(roundUp = true),
        delta.toDouble(roundUp = false))
      ApproxDPBudget(ExactNum.fromDouble(eps), delta)
    }
  }
  def apply(data: Any): Any = inner(data)
}
