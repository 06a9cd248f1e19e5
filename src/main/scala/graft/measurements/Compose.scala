package graft.measurements

import graft.core.Measurement
import graft.domains.Domain
import graft.exact.ExactNum
import graft.measures._
import graft.metrics.Metric

/** Apply a post-processing function to a measurement's output; privacy-free
  * by the post-processing theorem (reference `measurements/postprocess.py`).
  */
final case class PostProcess(inner: Measurement, f: Any => Any)
    extends Measurement {
  require(!inner.isInteractive, "cannot post-process an interactive measurement")
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = inner.outputMeasure
  def privacyFunction(dIn: ExactNum): PrivacyBudget = inner.privacyFunction(dIn)
  def apply(data: Any): Any = f(inner(data))
}

/** Run k measurements on the same input; budgets add
  * (reference `measurements/composition.py:20-177`).
  */
final case class Composition(measurements: Seq[Measurement])
    extends Measurement {
  require(measurements.nonEmpty)
  require(
    measurements.forall(_.inputDomain == measurements.head.inputDomain),
    "all measurements must share an input domain"
  )
  require(
    measurements.forall(_.inputMetric == measurements.head.inputMetric),
    "all measurements must share an input metric"
  )
  require(
    measurements.forall(_.outputMeasure == measurements.head.outputMeasure),
    "all measurements must share an output measure"
  )
  require(measurements.forall(!_.isInteractive))
  def inputDomain: Domain = measurements.head.inputDomain
  def inputMetric: Metric = measurements.head.inputMetric
  def outputMeasure: Measure = measurements.head.outputMeasure
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    measurements.map(_.privacyFunction(dIn)).reduce(_ + _)
  def apply(data: Any): Any = measurements.map(_(data))
}

/** Measure converters (reference `measurements/converters.py`). */

/** ε-DP ⇒ (ε²/2)-zCDP. */
final case class PureDPToRhoZCDP(inner: Measurement) extends Measurement {
  require(inner.outputMeasure == PureDP)
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = RhoZCDP
  override def isInteractive: Boolean = inner.isInteractive
  def privacyFunction(dIn: ExactNum): PrivacyBudget = {
    val PureDPBudget(eps) = inner.privacyFunction(dIn)
    RhoZCDPBudget(
      if (eps.isInfinite) ExactNum.PosInf else eps.pow2 / ExactNum(2)
    )
  }
  def apply(data: Any): Any = inner(data)
}

/** ε-DP ⇒ (ε, 0)-approxDP. */
final case class PureDPToApproxDP(inner: Measurement) extends Measurement {
  require(inner.outputMeasure == PureDP)
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = ApproxDP
  override def isInteractive: Boolean = inner.isInteractive
  def privacyFunction(dIn: ExactNum): PrivacyBudget = {
    val PureDPBudget(eps) = inner.privacyFunction(dIn)
    ApproxDPBudget(eps, ExactNum.zero)
  }
  def apply(data: Any): Any = inner(data)
}

/** ρ-zCDP ⇒ (ρ + 2√(ρ·ln(1/δ)), δ)-approxDP for caller-chosen δ
  * (Bun-Steinke; reference `converters.py:164-250`). The √ln term is not in
  * the exact closure, so it is computed with conservatively-rounded
  * high-precision decimals and re-entered as an exact dyadic upper bound.
  */
final case class RhoZCDPToApproxDP(inner: Measurement, delta: ExactNum)
    extends Measurement {
  require(inner.outputMeasure == RhoZCDP)
  require(delta > ExactNum.zero && delta <= ExactNum.one)
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = ApproxDP
  override def isInteractive: Boolean = inner.isInteractive
  def privacyFunction(dIn: ExactNum): PrivacyBudget = {
    val RhoZCDPBudget(rho) = inner.privacyFunction(dIn)
    if (rho.isInfinite) ApproxDPBudget(ExactNum.PosInf, delta)
    else if (rho.isZero) ApproxDPBudget(ExactNum.zero, delta)
    else {
      val rhoD = rho.toDouble(roundUp = true)
      val lnInvDelta = -math.log(delta.toDouble(roundUp = false))
      val epsUpper = rhoD + 2.0 * math.sqrt(rhoD * lnInvDelta)
      // nextUp twice: guard the two float operations' rounding
      ApproxDPBudget(
        ExactNum.fromDouble(Math.nextUp(Math.nextUp(epsUpper))),
        delta
      )
    }
  }
  def apply(data: Any): Any = inner(data)
}
