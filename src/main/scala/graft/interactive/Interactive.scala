package graft.interactive

import graft.core.{Measurement, Transformation}
import graft.domains.Domain
import graft.exact.ExactNum
import graft.measures.{Measure, PrivacyBudget}
import graft.metrics.{Metric, SumOf, RootSumOfSquared}

import scala.collection.mutable

/** Interactive mechanisms (reference
  * `measurements/interactive_measurements.py`): measurements whose output is
  * a stateful Queryable that adaptively answers further queries while a
  * budget lasts. Driver-side only — Spark jobs run when queued measurements
  * execute.
  */
trait Queryable {
  def answer(query: Any): Any
}

final case class MeasurementQuery(
    measurement: Measurement,
    dOut: Option[PrivacyBudget] = None
)
final case class TransformationQuery(transformation: Transformation)
final case class IndexQuery(index: Int, inner: Any)

/** Wrap a non-interactive measurement as an interactive one whose queryable
  * answers exactly one `MeasurementQuery`-free fetch (reference
  * `MakeInteractive`, `interactive_measurements.py:724`).
  */
final case class MakeInteractive(inner: Measurement) extends Measurement {
  require(!inner.isInteractive, "already interactive")
  def inputDomain: Domain = inner.inputDomain
  def inputMetric: Metric = inner.inputMetric
  def outputMeasure: Measure = inner.outputMeasure
  override def isInteractive: Boolean = true
  def privacyFunction(dIn: ExactNum): PrivacyBudget = inner.privacyFunction(dIn)
  def apply(data: Any): Any = new Queryable {
    private var answered = false
    def answer(query: Any): Any = {
      require(!answered, "result already fetched")
      answered = true
      inner(data)
    }
  }
}

/** Apply a transformation to every answer of an inner queryable (reference
  * `DecorateQueryable`, `interactive_measurements.py:413`): post-processing
  * for interactive mechanisms, privacy-free.
  */
final class DecorateQueryable(inner: Queryable, decorate: Any => Any)
    extends Queryable {
  def answer(query: Any): Any = decorate(inner.answer(query))
}

/** Retire this queryable and every descendant (reference `RetireQuery`,
  * `interactive_measurements.py:128-133`).
  */
final case class RetireQuery()

/** Wraps a Queryable so the whole descendant tree can be retired at once
  * (reference `RetirableQueryable`, `interactive_measurements.py:135-198`):
  * any answer that is itself a Queryable is wrapped before being returned
  * and remembered as a child; a [[RetireQuery]] propagates to all children,
  * flips this queryable to retired, and returns null; any other query on a
  * retired queryable raises.
  */
final class RetirableQueryable(inner: Queryable) extends Queryable {
  private var retired = false
  private val children = scala.collection.mutable.ListBuffer.empty[RetirableQueryable]

  def isRetired: Boolean = retired

  def answer(query: Any): Any = query match {
    case RetireQuery() =>
      if (!retired) {
        children.foreach(_.answer(RetireQuery()))
        retired = true
      }
      null
    case q =>
      require(!retired, "Queryable already retired")
      inner.answer(q) match {
        case child: Queryable =>
          val wrapped = new RetirableQueryable(child)
          children += wrapped
          wrapped
        case plain => plain
      }
  }
}

/** Adaptive sequential composition (reference `:478`, queryable `:199`):
  * answers measurement queries on fixed data until the budget is exhausted.
  */
final case class SequentialComposition(
    inputDomain: Domain,
    inputMetric: Metric,
    outputMeasure: Measure,
    dIn: ExactNum,
    budget: PrivacyBudget
) extends Measurement {
  override def isInteractive: Boolean = true
  def privacyFunction(d: ExactNum): PrivacyBudget = {
    require(d <= dIn, s"d_in $d exceeds declared $dIn")
    budget
  }
  def apply(data: Any): Any = new SequentialQueryable(this, data)
}

final class SequentialQueryable(
    comp: SequentialComposition,
    private var data: Any
) extends Queryable {
  private var remaining: PrivacyBudget = comp.budget
  private var domain: Domain = comp.inputDomain
  private var metric: Metric = comp.inputMetric
  private var dIn: ExactNum = comp.dIn

  def remainingBudget: PrivacyBudget = remaining

  def answer(query: Any): Any = query match {
    case MeasurementQuery(m, _) =>
      require(m.inputDomain == domain, "measurement domain mismatch")
      require(m.inputMetric == metric, "measurement metric mismatch")
      require(m.outputMeasure == comp.outputMeasure, "measure mismatch")
      val loss = m.privacyFunction(dIn)
      remaining.minus(loss) match {
        case Some(rest) =>
          remaining = rest
          m(data)
        case None =>
          throw new IllegalStateException(
            s"insufficient budget: need $loss, have $remaining"
          )
      }
    case TransformationQuery(t) =>
      require(t.inputDomain == domain, "transformation domain mismatch")
      require(t.inputMetric == metric, "transformation metric mismatch")
      data = t(data)
      domain = t.outputDomain
      metric = t.outputMetric
      dIn = t.stabilityFunction(dIn)
      this
    case q => throw new IllegalArgumentException(s"unknown query $q")
  }
}

/** Parallel composition over disjoint partition elements, answered in index
  * order (reference `:559`, queryable `:329`): the whole list costs only the
  * max element budget.
  */
final case class ParallelComposition(
    elementDomain: Domain,
    elementMetric: Metric,
    outputMeasure: Measure,
    dIn: ExactNum,
    budget: PrivacyBudget,
    numElements: Int
) extends Measurement {
  def inputDomain: Domain =
    graft.domains.ListDomain(Seq.fill(numElements)(elementDomain))
  def inputMetric: Metric = elementMetric match {
    case m => SumOf(m)
  }
  override def isInteractive: Boolean = true
  def privacyFunction(d: ExactNum): PrivacyBudget = {
    require(d <= dIn)
    budget
  }
  def apply(data: Any): Any = {
    val elements = data.asInstanceOf[Seq[Any]]
    new ParallelQueryable(this, elements)
  }
}

final class ParallelQueryable(
    comp: ParallelComposition,
    elements: Seq[Any]
) extends Queryable {
  private var current = 0
  // one metered queryable per element, created on first touch and REUSED on
  // repeat queries — a fresh queryable per query would reset the element's
  // budget and make per-element spend unbounded
  private val subQueryables =
    scala.collection.mutable.Map.empty[Int, SequentialQueryable]
  def currentIndex: Int = current
  def answer(query: Any): Any = query match {
    case IndexQuery(i, inner) =>
      require(i >= current, s"partition $i already retired (at $current)")
      require(i < elements.size, s"no partition $i")
      current = i
      val q = subQueryables.getOrElseUpdate(
        i,
        new SequentialQueryable(
          SequentialComposition(
            comp.elementDomain,
            comp.elementMetric,
            comp.outputMeasure,
            comp.dIn,
            comp.budget
          ),
          elements(i)
        )
      )
      q.answer(inner)
    case q => throw new IllegalArgumentException(s"unknown query $q")
  }
}

object AccountantState extends Enumeration {
  val Active, WaitingForSibling, WaitingForChildren, Retired = Value
}

/** User-facing privacy-budget ledger (reference
  * `interactive_measurements.py:860-1855`): tracks (domain, metric, d_in,
  * data, remaining budget); `transformInPlace` rebinds through a
  * transformation's stability function, `measure` spends budget, `split`
  * creates child accountants over a partition (parallel composition:
  * children consumed in order, parent inactive until all retire).
  */
final class PrivacyAccountant private (
    private var domain: Domain,
    private var metric: Metric,
    private var dIn: ExactNum,
    val outputMeasure: Measure,
    private var data: Any,
    private var remaining: PrivacyBudget,
    val parent: Option[PrivacyAccountant]
) {
  import AccountantState._

  private var state: AccountantState.Value = Active
  private val children = mutable.Buffer.empty[PrivacyAccountant]
  private val queuedTransformations = mutable.Queue.empty[Transformation]

  def currentState: AccountantState.Value = state
  def remainingBudget: PrivacyBudget = remaining
  def inputDomain: Domain = domain
  def inputMetric: Metric = metric
  def distance: ExactNum = dIn

  private def requireActive(): Unit = state match {
    case Active => ()
    case s => throw new IllegalStateException(s"accountant is $s, not ACTIVE")
  }

  private def flushQueued(): Unit =
    while (queuedTransformations.nonEmpty) {
      val t = queuedTransformations.dequeue()
      data = t(data)
    }

  def transformInPlace(t: Transformation): Unit = {
    requireActive()
    queueTransformation(t)
  }

  /** Queue a transformation to run when the accountant next touches its data
    * (reference `:1700-1778`): allowed in any state except RETIRED — a
    * WAITING accountant updates its visible (domain, metric, d_in)
    * immediately and applies the data transformation lazily on activation.
    * `transformInPlace` is the ACTIVE-only strict variant.
    */
  def queueTransformation(t: Transformation): Unit = {
    if (state == Retired)
      throw new IllegalStateException(
        "cannot queue transformations on a RETIRED accountant")
    require(t.inputDomain == domain, "domain mismatch")
    require(t.inputMetric == metric, "metric mismatch")
    domain = t.outputDomain
    metric = t.outputMetric
    dIn = t.stabilityFunction(dIn)
    queuedTransformations.enqueue(t)
  }

  def measure(m: Measurement): Any = {
    requireActive()
    require(m.inputDomain == domain, s"domain mismatch")
    require(m.inputMetric == metric, s"metric mismatch")
    require(m.outputMeasure == outputMeasure, "measure mismatch")
    val loss = m.privacyFunction(dIn)
    remaining.minus(loss) match {
      case Some(rest) =>
        flushQueued()
        val result = m(data)
        remaining = rest
        result
      case None =>
        throw new IllegalStateException(
          s"insufficient budget: need $loss, have $remaining"
        )
    }
  }

  /** Split over a partition transformation: one child accountant per
    * partition element, consumed in order (reference `:1331`).
    */
  def split(partition: graft.transformations.PartitionByKeys): Seq[PrivacyAccountant] = {
    requireActive()
    require(partition.inputDomain == domain, "domain mismatch")
    require(partition.inputMetric == metric, "metric mismatch")
    flushQueued()
    val parts = partition(data).asInstanceOf[Seq[Any]]
    val childDin = partition.stabilityFunction(dIn)
    state = WaitingForChildren
    val kids = parts.map { p =>
      new PrivacyAccountant(
        partition.inputDomain, // element domain = input table domain
        partition.outputMetric match {
          case SumOf(inner)            => inner
          case RootSumOfSquared(inner) => inner
          case m                       => m
        },
        childDin,
        outputMeasure,
        p,
        remaining,
        Some(this)
      )
    }
    kids.zipWithIndex.foreach { case (k, i) =>
      if (i != 0) k.state = WaitingForSibling
    }
    children ++= kids
    kids
  }

  /** Reference `interactive_measurements.py:1615-1643`: make this
    * accountant ACTIVE. WAITING_FOR_SIBLING retires every preceding
    * sibling (and their descendants); WAITING_FOR_CHILDREN retires all
    * of this accountant's descendants (via the last child's forced
    * retire, which cascades left); RETIRED refuses. Any transformations
    * queued while waiting are applied on activation.
    */
  def forceActivate(): Unit = state match {
    case Active => ()
    case Retired =>
      throw new IllegalStateException("cannot activate a RETIRED accountant")
    case WaitingForChildren =>
      children.last.retire(force = true) // cascades: activateNext flips us
    case WaitingForSibling =>
      parent.foreach(_.retirePrecedingSiblings(this))
      state = Active
      flushQueued()
  }

  /** Reference `interactive_measurements.py:1645-1698`: RETIRED is
    * terminal and idempotent. A WAITING_FOR_CHILDREN accountant refuses
    * unless `force` (retiring a parent out from under live children must
    * be explicit); a WAITING_FOR_SIBLING accountant first retires all
    * PRECEDING siblings and their descendants (its turn never comes, so
    * theirs is over); then the parent activates the next unretired
    * sibling, or itself when this was the last.
    */
  def retire(force: Boolean = false): Unit = {
    if (state == Retired) return
    if (state == WaitingForChildren && !force)
      throw new IllegalStateException(
        "cannot retire a WAITING_FOR_CHILDREN accountant; " +
          "retire(force = true) retires it and all its descendants")
    if (state != Active) forceActivate()
    state = Retired
    parent.foreach(_.activateNext(this))
  }

  /** Retire this subtree without the activation chaining — used when an
    * out-of-turn sibling takes over and the skipped siblings' turns are
    * simply over. Budgets resolve BOTTOM-UP: a WAITING_FOR_CHILDREN node
    * never reactivated, so its `remaining` is still the stale pre-split
    * value; it must fold to the meet of its (recursively folded)
    * children's remainders before retiring, or a descendant's spend
    * would vanish from the ledger and the ancestor's reactivation meet
    * (activateNext) would refund budget that was actually spent — a
    * privacy-soundness bug (r16 AccountantProps divergence: impl
    * PureDPBudget(3) vs model eps 0). A node in any other state already
    * folded (or spent) through its own reactivation, so only
    * WaitingForChildren folds here. The reference avoids the issue by
    * deducting the split budget up-front (interactive_measurements.py:
    * 1368-1389); graft's refund-the-meet design requires this fold.
    */
  private def retireSubtree(): Unit = {
    if (state == Retired) return
    children.foreach(_.retireSubtree())
    if (state == WaitingForChildren && children.nonEmpty)
      remaining = children.map(_.remaining).reduce(PrivacyAccountant.meet)
    state = Retired
  }

  private def retirePrecedingSiblings(child: PrivacyAccountant): Unit = {
    val idx = children.indexOf(child)
    children.take(math.max(idx, 0)).foreach(_.retireSubtree())
  }

  private def activateNext(child: PrivacyAccountant): Unit = {
    // activate the next unretired sibling, or reactivate this parent when
    // all children are retired
    if (children.forall(_.state == Retired)) {
      // parallel composition: the parent keeps the componentwise minimum of
      // the children's remaining budgets (covers() is not a total order for
      // (ε,δ) pairs, so take the meet explicitly)
      remaining = children.map(_.remaining).reduce(PrivacyAccountant.meet)
      state = Active
      flushQueued()
    } else {
      val idx = children.indexOf(child)
      children.drop(math.max(idx + 1, 0)).find(_.state != Retired).foreach {
        next =>
          next.state = Active
          next.flushQueued()
      }
    }
  }
}

object PrivacyAccountant {
  /** Componentwise minimum of two budgets of the same measure. */
  private[interactive] def meet(
      a: graft.measures.PrivacyBudget,
      b: graft.measures.PrivacyBudget
  ): graft.measures.PrivacyBudget = {
    import graft.measures._
    (a, b) match {
      case (PureDPBudget(x), PureDPBudget(y))   => PureDPBudget(x.min(y))
      case (RhoZCDPBudget(x), RhoZCDPBudget(y)) => RhoZCDPBudget(x.min(y))
      case (ApproxDPBudget(e1, d1), ApproxDPBudget(e2, d2)) =>
        ApproxDPBudget(e1.min(e2), d1.min(d2))
      case _ =>
        throw new IllegalArgumentException(s"measure mismatch: $a vs $b")
    }
  }

  /** Launch from a SequentialComposition over the source data
    * (reference `:991`).
    */
  def launch(comp: SequentialComposition, data: Any): PrivacyAccountant =
    new PrivacyAccountant(
      comp.inputDomain,
      comp.inputMetric,
      comp.dIn,
      comp.outputMeasure,
      data,
      comp.budget,
      None
    )
}

/** Convenience wrapper (reference `create_adaptive_composition`, `:1856`):
  * an adaptive-composition accountant over a DataFrame input.
  */
object AdaptiveComposition {
  def create(
      inputDomain: Domain,
      inputMetric: Metric,
      dIn: ExactNum,
      budget: PrivacyBudget,
      outputMeasure: Measure,
      data: Any
  ): PrivacyAccountant =
    PrivacyAccountant.launch(
      SequentialComposition(inputDomain, inputMetric, outputMeasure, dIn, budget),
      data
    )
}
