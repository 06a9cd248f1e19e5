package graft.metrics

import graft.domains._

/** Dataset distance metrics (reference `src/tmlt/core/metrics.py:92-1493`).
  *
  * A metric defines what "neighboring datasets at distance d" means; every
  * transformation declares input/output metrics and a stability bound between
  * them.
  */
sealed trait Metric extends Serializable {
  /** Whether this metric can be attached to the given domain. */
  def validates(domain: Domain): Boolean
}

/** Count of rows in the multiset symmetric difference (add/remove rows). */
case object SymmetricDifference extends Metric {
  def validates(d: Domain): Boolean = d match {
    case _: DataFrameDomain | _: GroupedDataFrameDomain => true
    case _                                              => false
  }
}

/** Count of changed rows (replace a row). d(Hamming)=k ⇒ d(SymDiff)≤2k. */
case object HammingDistance extends Metric {
  def validates(d: Domain): Boolean = d.isInstanceOf[DataFrameDomain]
}

/** |a − b| on scalars (aggregation outputs). */
case object AbsoluteDifference extends Metric {
  def validates(d: Domain): Boolean = d.isInstanceOf[ScalarDomain]
}

/** L1 combination of a per-element inner metric (lists/partitions). */
final case class SumOf(inner: Metric) extends Metric {
  def validates(d: Domain): Boolean = true
}

/** L2 combination of a per-element inner metric. */
final case class RootSumOfSquared(inner: Metric) extends Metric {
  def validates(d: Domain): Boolean = true
}

/** Inner metric applied to one column of a DataFrame
  * (reference `metrics.py:774-925`).
  */
final case class OnColumn(column: String, inner: Metric) extends Metric {
  def validates(d: Domain): Boolean = d match {
    case t: DataFrameDomain => t.contains(column)
    case _                  => false
  }
}

final case class OnColumns(metrics: Seq[OnColumn]) extends Metric {
  def validates(d: Domain): Boolean = metrics.forall(_.validates(d))
}

/** Distance = inner metric applied grouping rows by `column`; the metric of
  * grouped data (reference `metrics.py:926-1085`).
  */
final case class IfGroupedBy(column: String, inner: Metric) extends Metric {
  def validates(d: Domain): Boolean = d match {
    case t: DataFrameDomain => t.contains(column)
    case _                  => false
  }
}

/** Per-key metrics for dict inputs. */
final case class DictMetric(metrics: Map[String, Metric]) extends Metric {
  def validates(d: Domain): Boolean = d match {
    case DictDomain(e) => e.keySet == metrics.keySet
    case _             => false
  }
}

/** Distance = number of keys added/removed across all tables sharing a key
  * column (user-level DP; reference `metrics.py:1271-1493`).
  */
final case class AddRemoveKeys(keyColumns: Map[String, String]) extends Metric {
  def validates(d: Domain): Boolean = d match {
    case DictDomain(e) => keyColumns.keySet == e.keySet
    case _             => false
  }
}

/** Degenerate metric for outputs with no meaningful distance. */
case object NullMetric extends Metric {
  def validates(d: Domain): Boolean = true
}
