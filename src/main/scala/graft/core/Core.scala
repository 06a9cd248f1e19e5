package graft.core

import graft.domains.Domain
import graft.exact.ExactNum
import graft.measures.{Measure, PrivacyBudget}
import graft.metrics.Metric

/** A deterministic dataflow component with a stability guarantee: if inputs
  * are at distance ≤ dIn (under inputMetric), outputs are at distance
  * ≤ stabilityFunction(dIn) (under outputMetric).
  * Reference `transformations/base.py:18-100`.
  */
trait Transformation extends Serializable {
  def inputDomain: Domain
  def outputDomain: Domain
  def inputMetric: Metric
  def outputMetric: Metric

  def stabilityFunction(dIn: ExactNum): ExactNum

  def stabilityRelation(dIn: ExactNum, dOut: ExactNum): Boolean =
    stabilityFunction(dIn) <= dOut

  /** Execute. Values are DataFrames, GroupedDataFrames, Maps or scalars
    * depending on the domain (dynamically typed like the reference).
    */
  def apply(data: Any): Any

  def andThen(next: Transformation): ChainTT = ChainTT(this, next)
  def |(next: Transformation): ChainTT = ChainTT(this, next)
  def |(next: Measurement): ChainTM = ChainTM(this, next)
}

/** A randomized component with a privacy guarantee: on inputs at distance
  * ≤ dIn, outputs are privacyFunction(dIn)-indistinguishable under
  * outputMeasure. Reference `measurements/base.py:15-100`.
  */
trait Measurement extends Serializable {
  def inputDomain: Domain
  def inputMetric: Metric
  def outputMeasure: Measure

  def privacyFunction(dIn: ExactNum): PrivacyBudget

  def privacyRelation(dIn: ExactNum, dOut: PrivacyBudget): Boolean =
    dOut.covers(privacyFunction(dIn))

  /** True when the output is a stateful Queryable rather than a value. */
  def isInteractive: Boolean = false

  def apply(data: Any): Any
}

/** Sequential composition of transformations
  * (reference `transformations/chaining.py:14-128`).
  */
final case class ChainTT(first: Transformation, second: Transformation)
    extends Transformation {
  require(
    first.outputDomain == second.inputDomain,
    s"domain mismatch in chain: ${first.outputDomain} vs ${second.inputDomain}"
  )
  require(
    first.outputMetric == second.inputMetric,
    s"metric mismatch in chain: ${first.outputMetric} vs ${second.inputMetric}"
  )
  def inputDomain: Domain = first.inputDomain
  def outputDomain: Domain = second.outputDomain
  def inputMetric: Metric = first.inputMetric
  def outputMetric: Metric = second.outputMetric
  def stabilityFunction(dIn: ExactNum): ExactNum =
    second.stabilityFunction(first.stabilityFunction(dIn))
  def apply(data: Any): Any = second(first(data))
}

/** Transformation-then-measurement
  * (reference `measurements/chaining.py:15-160`).
  */
final case class ChainTM(transformation: Transformation, measurement: Measurement)
    extends Measurement {
  require(
    transformation.outputDomain == measurement.inputDomain,
    s"domain mismatch in chain: ${transformation.outputDomain} vs ${measurement.inputDomain}"
  )
  require(
    transformation.outputMetric == measurement.inputMetric,
    s"metric mismatch in chain: ${transformation.outputMetric} vs ${measurement.inputMetric}"
  )
  def inputDomain: Domain = transformation.inputDomain
  def inputMetric: Metric = transformation.inputMetric
  def outputMeasure: Measure = measurement.outputMeasure
  override def isInteractive: Boolean = measurement.isInteractive
  def privacyFunction(dIn: ExactNum): PrivacyBudget =
    measurement.privacyFunction(transformation.stabilityFunction(dIn))
  def apply(data: Any): Any = measurement(transformation(data))
}

/** No-op transformation (reference `transformations/identity.py:15`). */
final case class Identity(domain: Domain, metric: Metric)
    extends Transformation {
  def inputDomain: Domain = domain
  def outputDomain: Domain = domain
  def inputMetric: Metric = metric
  def outputMetric: Metric = metric
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = data
}
