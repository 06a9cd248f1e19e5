package graft

import graft.domains.{ColumnDescriptor, DataFrameDomain}
import graft.exact.ExactNum
import graft.interactive.{AccountantState, PrivacyAccountant, SequentialComposition}
import graft.measures.{Measure, PrivacyBudget, PureDP, PureDPBudget}
import graft.metrics.{Metric, SymmetricDifference}
import graft.transformations.{Filter, PartitionByKeys}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property test of the PrivacyAccountant 4-state machine
  * (ACTIVE / WAITING_FOR_SIBLING / WAITING_FOR_CHILDREN / RETIRED).
  *
  * The model below is written from the REFERENCE's documented transition
  * semantics (`interactive_measurements.py:769-851` state docstrings,
  * `:1615-1698` force_activate/retire), not from our implementation, so a
  * divergence between the two fails the property. Each generated session
  * interleaves measure / transform_in_place / queue_transformation /
  * split / retire / retire(force) / force_activate against RANDOM nodes
  * of the accountant tree (including illegal targets, whose rejects must
  * leave both trees untouched), then compares the full tree — states AND
  * per-node remaining budgets — after every step.
  *
  * Invariants asserted at every step, across ≥500 generated sessions:
  *   - exactly one ACTIVE node, unless the root is RETIRED (then zero);
  *   - no budget ledger ever goes negative: every successful measure
  *     decrements exactly by its cost, an overdraft throws and changes
  *     NOTHING, and a reactivated parent holds the meet (componentwise
  *     min) of its children's remainders;
  *   - RETIRED is terminal (ops on a retired node throw or no-op, and
  *     never resurrect it);
  *   - split children activate strictly in sibling order.
  *
  * The measurements/transformations are toy components (constant-cost
  * measure that never touches the data, identity-stability filter), so a
  * session is pure JVM work — no Spark job runs, which is what makes 500+
  * sessions cheap. The DataFrame plumbing in split() still executes for
  * real (lazy plans only).
  */
object AccountantProps extends Properties("accountant") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  // -------------------------------------------------------------------
  // Toy components: constant-cost measurement, identity-stability filter
  // -------------------------------------------------------------------

  private lazy val spark = SharedSpark.session
  private lazy val domain = DataFrameDomain(
    Seq("A" -> ColumnDescriptor.string(true), "K" -> ColumnDescriptor.long))
  private lazy val data = {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(Row("a", 0L), Row("a", 1L), Row("b", 2L)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("A STRING, K BIGINT"))
  }

  private final case class ToyMeasurement(cost: Int)
      extends graft.core.Measurement {
    def inputDomain: graft.domains.Domain = domain
    def inputMetric: Metric = SymmetricDifference
    def outputMeasure: Measure = PureDP
    def privacyFunction(dIn: ExactNum): PrivacyBudget =
      PureDPBudget(ExactNum(cost))
    def apply(d: Any): Any = 42
  }

  private def toyFilter = Filter(domain, SymmetricDifference, "A = 'a'")
  private def toyPartition(k: Int) = PartitionByKeys(
    domain, SymmetricDifference, Seq("K"), (0 until k).map(i => Seq(i.toLong)))

  // -------------------------------------------------------------------
  // Reference-semantics model
  // -------------------------------------------------------------------

  /** Model node; state chars: A(ctive), S(= waiting for sibling),
    * C(= waiting for children), R(etired). */
  private final class MNode(var eps: Int, val parent: Option[MNode]) {
    var state: Char = 'A'
    var kids: Vector[MNode] = Vector.empty
    def depth: Int = parent.map(_.depth + 1).getOrElse(0)
    /** Retire this node and its descendants, resolving budgets BOTTOM-UP:
      * a WAITING_FOR_CHILDREN node's remainder is the meet of its
      * children's (now folded) remainders — the meet must recurse through
      * nested splits, or a grandchild's spend would vanish from the
      * ledger (the accountant retires a C node by force-activating it
      * first, which folds the meet, then retiring; a non-recursive model
      * here is UNSOUND — it overstates the refund after force-retiring a
      * nested split — and scalacheck found exactly that divergence).
      * A node that already reactivated from its children folded at that
      * moment and may have spent since, so only state 'C' folds here. */
    def retireSubtree(): Unit = {
      kids.foreach(_.retireSubtree())
      if (state == 'C') eps = kids.map(_.eps).min
      state = 'R'
    }
    /** Retire all descendants, then become ACTIVE holding the meet of the
      * children's remainders (parallel composition). */
    def forceUpFromChildren(): Unit = {
      kids.foreach(_.retireSubtree())
      eps = kids.map(_.eps).min
      state = 'A'
    }
  }

  /** Apply `retire` to a model node per the reference semantics. Caller
    * guarantees state is A or S ('C' without force and 'R' are handled at
    * the op level). */
  private def mRetire(n: MNode): Unit = {
    if (n.state == 'S') // its turn never comes: preceding turns are over
      n.parent.foreach { p =>
        p.kids.takeWhile(_ ne n).foreach(_.retireSubtree())
      }
    n.state = 'R'
    n.parent.foreach { p =>
      if (p.kids.forall(_.state == 'R')) {
        p.eps = p.kids.map(_.eps).min
        p.state = 'A'
      } else {
        val after = p.kids.dropWhile(_ ne n).drop(1)
        after.find(_.state != 'R').foreach(_.state = 'A')
      }
    }
  }

  // -------------------------------------------------------------------
  // Session runner
  // -------------------------------------------------------------------

  private final case class Op(kind: Int, sel: Int, amt: Int)

  private val opGen: Gen[Op] = for {
    k <- Gen.frequency(
      4 -> 0, // measure
      2 -> 1, // transformInPlace
      2 -> 2, // queueTransformation
      3 -> 3, // split
      3 -> 4, // retire
      2 -> 5, // retire(force = true)
      2 -> 6) // forceActivate
    s <- Gen.chooseNum(0, 10000)
    a <- Gen.chooseNum(1, 4)
  } yield Op(k, s, a)

  private val sessionGen: Gen[(Int, List[Op])] = for {
    budget <- Gen.chooseNum(3, 15)
    n <- Gen.chooseNum(5, 25)
    ops <- Gen.listOfN(n, opGen)
  } yield (budget, ops)

  private def stateChar(s: AccountantState.Value): Char = s match {
    case AccountantState.Active             => 'A'
    case AccountantState.WaitingForSibling  => 'S'
    case AccountantState.WaitingForChildren => 'C'
    case AccountantState.Retired            => 'R'
  }

  private def runSession(budget: Int, ops: List[Op]): Prop = Prop.secure {
    val root = PrivacyAccountant.launch(
      SequentialComposition(domain, SymmetricDifference, PureDP,
        ExactNum(1), PureDPBudget(ExactNum(budget))),
      data)
    val mRoot = new MNode(budget, None)
    // real and model nodes paired in creation order
    val nodes = scala.collection.mutable.ArrayBuffer((root, mRoot))

    def checkTrees(step: Int): Unit = {
      var active = 0
      for (((r, m), i) <- nodes.zipWithIndex) {
        val rs = stateChar(r.currentState)
        assert(rs == m.state,
          s"step $step node $i: impl state $rs, model ${m.state}")
        assert(r.remainingBudget == PureDPBudget(ExactNum(m.eps)),
          s"step $step node $i: impl ${r.remainingBudget}, model eps ${m.eps}")
        assert(m.eps >= 0, s"step $step node $i: NEGATIVE model budget")
        if (rs == 'A') active += 1
      }
      val expected = if (stateChar(root.currentState) == 'R') 0 else 1
      assert(active == expected,
        s"step $step: $active ACTIVE nodes, expected $expected")
    }

    for ((op, step) <- ops.zipWithIndex) {
      val (r, m) = nodes(op.sel % nodes.size)
      op.kind match {
        case 0 => // measure
          val legal = m.state == 'A' && op.amt <= m.eps
          val res = scala.util.Try(r.measure(ToyMeasurement(op.amt)))
          assert(res.isSuccess == legal, s"step $step measure: $res")
          if (legal) { assert(res.get == 42); m.eps -= op.amt }
        case 1 => // transformInPlace: strict, ACTIVE only
          val legal = m.state == 'A'
          assert(scala.util.Try(r.transformInPlace(toyFilter)).isSuccess
            == legal, s"step $step transformInPlace")
        case 2 => // queueTransformation: any state but RETIRED
          val legal = m.state != 'R'
          assert(scala.util.Try(r.queueTransformation(toyFilter)).isSuccess
            == legal, s"step $step queueTransformation")
        case 3 => // split (depth-capped to keep trees small)
          if (m.state != 'A' || m.depth < 3) {
            val legal = m.state == 'A'
            val k = 2 + op.amt % 2
            val res = scala.util.Try(r.split(toyPartition(k)))
            assert(res.isSuccess == legal, s"step $step split: $res")
            if (legal) {
              m.state = 'C'
              m.kids = Vector.tabulate(k) { i =>
                val kid = new MNode(m.eps, Some(m))
                kid.state = if (i == 0) 'A' else 'S'
                kid
              }
              nodes ++= res.get.zip(m.kids)
            }
          }
        case 4 => // retire (no force): refuses on C, idempotent on R
          m.state match {
            case 'R' => r.retire() // no-op
            case 'C' =>
              assert(scala.util.Try(r.retire()).isFailure,
                s"step $step retire on WAITING_FOR_CHILDREN must refuse")
            case _ => r.retire(); mRetire(m)
          }
        case 5 => // retire(force = true): any state; subtree goes with it
          m.state match {
            case 'R' => r.retire(force = true) // no-op
            case 'C' =>
              r.retire(force = true)
              // descendants retired; then retire as if ACTIVE
              m.kids.foreach(_.retireSubtree())
              m.eps = m.kids.map(_.eps).min
              mRetire(m)
            case _ => r.retire(force = true); mRetire(m)
          }
        case 6 => // forceActivate
          m.state match {
            case 'R' =>
              assert(scala.util.Try(r.forceActivate()).isFailure,
                s"step $step forceActivate on RETIRED must refuse")
            case 'A' => r.forceActivate() // no-op
            case 'S' =>
              r.forceActivate()
              m.parent.foreach { p =>
                p.kids.takeWhile(_ ne m).foreach(_.retireSubtree())
              }
              m.state = 'A'
            case 'C' =>
              r.forceActivate()
              m.forceUpFromChildren()
          }
      }
      checkTrees(step)
    }
    spark.catalog.clearCache()
    true
  }

  property("random interleavings match the reference state machine") =
    forAll(sessionGen) { case (budget, ops) => runSession(budget, ops) }

  /** The minimized divergence scalacheck found in round 16 (generator
    * luck made it a ~1-in-3 full-suite flake before): split the root,
    * force-retire the first child, split the second child, spend the
    * whole budget in a grandchild, then forceActivate the root. The
    * root's remainder must fold the grandchild's spend through the
    * nested split (recursive meet → 0); the old model skipped the inner
    * fold and expected 1. Replayed deterministically so the nested-split
    * fold is pinned regardless of what the generator draws. */
  property("nested split: force-activated root folds grandchild spend") =
    runSession(1, List(
      Op(3, 0, 4), Op(5, 10000, 3), Op(3, 1274, 1), Op(0, 1371, 1),
      Op(6, 0, 4)))

  /** The round-16 post-commit divergence (impl PureDPBudget(3) vs model
    * eps 0 at the root), pinned: an out-of-turn sibling takeover
    * (forceActivate on a WAITING_FOR_SIBLING node) retires the preceding
    * sibling's subtree via retireSubtree — NOT via the forced-retire
    * cascade, which folds — so that sibling, itself WAITING_FOR_CHILDREN
    * with a grandchild that spent the whole budget, must fold the
    * grandchild's spend bottom-up before retiring. The unfixed
    * implementation kept its stale pre-split remainder (3), and the
    * root's reactivation meet then refunded 3ε of spent budget — a
    * privacy-soundness bug. Sequence: split root (k=2), split child 0
    * (k=2), grandchild 0 measures the full budget, forceActivate child 1
    * (sibling takeover retires child 0's subtree), retire child 1 (root
    * reactivates holding the meet, which must be 0). */
  property("sibling takeover folds a skipped nested split's spend") =
    runSession(3, List(
      Op(3, 0, 4), Op(3, 1, 4), Op(0, 3, 3), Op(6, 2, 1), Op(4, 2, 1)))
}
