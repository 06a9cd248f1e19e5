package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.ExactNum
import graft.metrics._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Split a DataFrame into one DataFrame per key tuple via null-safe filters;
  * output metric SumOf/RootSumOfSquared enables parallel composition
  * (reference `partition.py:27-270`).
  *
  * Scale note: the reference's per-key `filter` scan is O(keys) jobs over the
  * same input; we `persist` the parent once so each partition filter reads
  * the cached plan, and the filters push down when the parent is a file scan.
  * For very many keys, prefer `df.write.partitionBy` + per-key reads.
  */
final case class PartitionByKeys(
    inputDomain: DataFrameDomain,
    inputMetric: Metric, // SymmetricDifference (or IfGroupedBy for grouped)
    keyColumns: Seq[String],
    keys: Seq[Seq[Any]],
    useL2: Boolean = false
) extends Transformation {
  keyColumns.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  require(keys.forall(_.size == keyColumns.size), "key arity mismatch")
  require(keys.distinct.size == keys.size, "duplicate partition keys")

  def outputDomain: Domain = ListDomain(Seq.fill(keys.size)(inputDomain))
  def outputMetric: Metric =
    if (useL2) RootSumOfSquared(SymmetricDifference)
    else SumOf(SymmetricDifference)
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame].persist()
    keys.map { tuple =>
      val cond = keyColumns
        .zip(tuple)
        .map { case (c, v) => col(c) <=> lit(v) }
        .reduce(_ && _)
      df.filter(cond)
    }
  }
}

/** Dictionary (multi-table) plumbing (reference `dictionary.py`). */

final case class CreateDictFromValue(
    inputDomain: Domain,
    inputMetric: Metric,
    key: String
) extends Transformation {
  def outputDomain: Domain = DictDomain(Map(key -> inputDomain))
  def outputMetric: Metric = DictMetric(Map(key -> inputMetric))
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = Map(key -> data)
}

final case class Subset(
    inputDomain: DictDomain,
    inputMetric: DictMetric,
    keys: Seq[String]
) extends Transformation {
  keys.foreach(k => require(inputDomain.elements.contains(k), s"no key $k"))
  def outputDomain: Domain =
    DictDomain(inputDomain.elements.view.filterKeys(keys.contains).toMap)
  def outputMetric: Metric =
    DictMetric(inputMetric.metrics.view.filterKeys(keys.contains).toMap)
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any =
    data.asInstanceOf[Map[String, Any]].view.filterKeys(keys.contains).toMap
}

final case class GetValue(
    inputDomain: DictDomain,
    inputMetric: Metric, // DictMetric or AddRemoveKeys
    key: String
) extends Transformation {
  require(inputDomain.elements.contains(key), s"no key $key")
  def outputDomain: Domain = inputDomain.elements(key)
  def outputMetric: Metric = inputMetric match {
    case DictMetric(m)      => m(key)
    case _: AddRemoveKeys   => IfGroupedBy(
      inputMetric.asInstanceOf[AddRemoveKeys].keyColumns(key),
      SymmetricDifference
    )
    case m => m
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = data.asInstanceOf[Map[String, Any]](key)
}

/** Run an inner transformation on one dict value, adding the result under a
  * new key (reference `dictionary.py:109-220` and the `TransformValue`
  * family, `add_remove_keys.py:159-1009`).
  */
final case class TransformValue(
    inputDomain: DictDomain,
    inputMetric: Metric, // DictMetric or AddRemoveKeys
    key: String,
    newKey: String,
    inner: Transformation
) extends Transformation {
  require(inputDomain.elements.contains(key), s"no key $key")
  require(!inputDomain.elements.contains(newKey), s"$newKey already present")
  require(
    inner.inputDomain == inputDomain.elements(key),
    "inner transformation domain mismatch"
  )

  def outputDomain: Domain =
    DictDomain(inputDomain.elements + (newKey -> inner.outputDomain))
  def outputMetric: Metric = inputMetric match {
    case DictMetric(m) =>
      DictMetric(m + (newKey -> inner.outputMetric))
    case ark: AddRemoveKeys =>
      // Only 1-stable inner transformations preserve AddRemoveKeys
      // (reference add_remove_keys.py:1-107).
      require(
        inner.stabilityFunction(ExactNum.one) <= ExactNum.one,
        "AddRemoveKeys requires a 1-stable inner transformation"
      )
      AddRemoveKeys(ark.keyColumns + (newKey -> ark.keyColumns(key)))
    case m => m
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = inputMetric match {
    case _: AddRemoveKeys => dIn
    case _                => dIn.max(inner.stabilityFunction(dIn))
  }
  def apply(data: Any): Any = {
    val m = data.asInstanceOf[Map[String, Any]]
    m + (newKey -> inner(m(key)))
  }
}

/** Metric casts (reference `transformations/converters.py`). */

final case class UnwrapIfGroupedBy(
    inputDomain: DataFrameDomain,
    column: String,
    innerMetric: Metric
) extends Transformation {
  // Mirrors reference converters.py:24-78 (UnwrapIfGroupedBy): the inner
  // metric must be SumOf(...) or RootSumOfSquared(...); the output metric is
  // the inner's inner metric, and the L2 case squares the distance. Accepting
  // arbitrary inner metrics (e.g. the group-level SymmetricDifference produced
  // by AddRemoveKeys chains) would let a user-level distance pass through as a
  // row-level distance 1 with no truncation — silently under-noised.
  private val unwrapped: Metric = innerMetric match {
    case SumOf(m)            => m
    case RootSumOfSquared(m) => m
    case other =>
      throw new IllegalArgumentException(
        s"UnwrapIfGroupedBy requires inner metric SumOf(...) or " +
          s"RootSumOfSquared(...), got $other"
      )
  }
  private val isL2: Boolean = innerMetric.isInstanceOf[RootSumOfSquared]
  def inputMetric: Metric = IfGroupedBy(column, innerMetric)
  def outputMetric: Metric = unwrapped
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum =
    if (isL2) dIn * dIn else dIn
  def apply(data: Any): Any = data
}

final case class HammingToSymmetricDifference(inputDomain: DataFrameDomain)
    extends Transformation {
  def inputMetric: Metric = HammingDistance
  def outputMetric: Metric = SymmetricDifference
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn * ExactNum(2)
  def apply(data: Any): Any = data
}
