package graft

import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.interactive._
import graft.measures._
import graft.measurements._
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.Row

class InteractiveSpec extends SharedSpark {

  private val domain = DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true)))
  private def data = df("A STRING", Seq(Row("a"), Row("a"), Row("b")))

  private def countM(eps: Long) = Aggregations.createCountMeasurement(
    domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
    PureDPBudget(ExactNum(eps)),
    Some(df("A STRING", Seq(Row("a"), Row("b")))))

  test("accountant meters budget and refuses overdraft") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(3)))
    val acct = PrivacyAccountant.launch(comp, data)
    acct.measure(countM(2))
    assert(acct.remainingBudget == PureDPBudget(ExactNum(1)))
    assertThrows[IllegalStateException](acct.measure(countM(2)))
    acct.measure(countM(1))
    assert(acct.remainingBudget == PureDPBudget(ExactNum.zero))
  }

  test("transformInPlace rebinds distance through stability") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(10)))
    val acct = PrivacyAccountant.launch(comp, data)
    acct.transformInPlace(Filter(domain, SymmetricDifference, "A = 'a'"))
    assert(acct.distance == ExactNum(1))
    assert(acct.inputDomain == domain)
    // a measurement built for the post-filter state runs fine
    acct.measure(countM(1))
  }

  test("RetirableQueryable retires the whole descendant tree") {
    // root sequential queryable wrapped Retirable; an interactive answer
    // (MakeInteractive) comes back wrapped as a child RetirableQueryable;
    // retiring the root retires the child too (reference
    // interactive_measurements.py:135-198)
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(5)))
    val root = new RetirableQueryable(comp(data).asInstanceOf[Queryable])
    val plain = root.answer(MeasurementQuery(countM(1)))
    assert(!plain.isInstanceOf[Queryable]) // non-queryable answers pass through
    val child = root.answer(MeasurementQuery(MakeInteractive(countM(1))))
    assert(child.isInstanceOf[RetirableQueryable])
    assert(root.answer(RetireQuery()) == null)
    assert(root.isRetired)
    assertThrows[IllegalArgumentException](root.answer(MeasurementQuery(countM(1))))
    assertThrows[IllegalArgumentException](
      child.asInstanceOf[RetirableQueryable].answer(null))
    // retiring twice is a no-op, not an error
    assert(root.answer(RetireQuery()) == null)
  }

  test("sequential queryable answers until budget runs out") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(2)))
    val q = comp(data).asInstanceOf[SequentialQueryable]
    q.answer(MeasurementQuery(countM(2)))
    assertThrows[IllegalStateException](q.answer(MeasurementQuery(countM(1))))
  }

  test("DecorateQueryable post-processes answers") {
    val m = MakeInteractive(countM(1))
    val q = new DecorateQueryable(
      m(data).asInstanceOf[Queryable],
      out => out.asInstanceOf[org.apache.spark.sql.DataFrame].count())
    assert(q.answer(null) == 2L)
  }

  test("keysFromList builds a typed key table") {
    val keys = graft.transformations.GroupedDataFrame.keysFromList(
      spark, Seq("A", "B"), Seq(Seq("x", 1L), Seq("y", 2L), Seq(null, 3L)))
    assert(keys.schema.map(_.dataType.simpleString) == Seq("string", "bigint"))
    assert(keys.count() == 3)
  }

  test("MakeInteractive answers exactly once") {
    val m = MakeInteractive(countM(1))
    assert(m.isInteractive)
    assert(m.privacyFunction(ExactNum(1)) == PureDPBudget(ExactNum(1)))
    val q = m(data).asInstanceOf[Queryable]
    val out = q.answer(null)
    assert(out.asInstanceOf[org.apache.spark.sql.DataFrame].count() == 2)
    assertThrows[IllegalArgumentException](q.answer(null))
  }

  test("split creates in-order children; parent reactivates after retire") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum(4)))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"), Seq(Seq("a"), Seq("b")))
    val kids = acct.split(partition)
    assert(kids.size == 2)
    assert(acct.currentState == AccountantState.WaitingForChildren)
    assert(kids(0).currentState == AccountantState.Active)
    assert(kids(1).currentState == AccountantState.WaitingForSibling)
    kids(0).measure(countM(2))
    kids(0).retire()
    assert(kids(1).currentState == AccountantState.Active)
    kids(1).retire()
    assert(acct.currentState == AccountantState.Active)
    // parallel composition: only the max child spend is charged
    assert(acct.remainingBudget == PureDPBudget(ExactNum(2)))
  }

  test("nested split-within-split: retirement cascades level by level") {
    // reference system/unit scenarios: a child accountant splits again;
    // grandchildren retire in order to reactivate the child, children
    // retire in order to reactivate the root
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum.PosInf))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"), Seq(Seq("a"), Seq("b")))
    val kids = acct.split(partition)
    assert(acct.currentState == AccountantState.WaitingForChildren)
    val grandkids = kids(0).split(partition)
    assert(kids(0).currentState == AccountantState.WaitingForChildren)
    assert(kids(1).currentState == AccountantState.WaitingForSibling)
    assert(grandkids(0).currentState == AccountantState.Active)
    grandkids(0).measure(countM(1))
    grandkids(0).retire()
    assert(grandkids(1).currentState == AccountantState.Active)
    grandkids(1).retire()
    // all grandchildren retired -> the CHILD reactivates, root still waits
    assert(kids(0).currentState == AccountantState.Active)
    assert(acct.currentState == AccountantState.WaitingForChildren)
    kids(0).retire()
    assert(kids(1).currentState == AccountantState.Active)
    kids(1).retire()
    assert(acct.currentState == AccountantState.Active)
  }

  test("out-of-order access is rejected; out-of-turn retire skips prior siblings") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum.PosInf))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"),
      Seq(Seq("a"), Seq("b"), Seq("c"), Seq("d")))
    val kids = acct.split(partition)
    // measuring a WAITING_FOR_SIBLING child out of order is refused
    assertThrows[IllegalStateException](kids(1).measure(countM(1)))
    // a WAITING_FOR_CHILDREN parent refuses a plain retire (force required)
    assertThrows[IllegalStateException](acct.retire())
    // retiring an unused later sibling retires ALL prior siblings (their
    // turn is over) and activates the NEXT one
    // (reference test_retire_accountant_waiting_for_sibling)
    kids(2).retire()
    assert(kids.take(3).forall(_.currentState == AccountantState.Retired))
    assert(kids(3).currentState == AccountantState.Active)
    // prior siblings are terminally retired
    assertThrows[IllegalStateException](kids(0).measure(countM(1)))
    kids(3).retire()
    assert(acct.currentState == AccountantState.Active)
  }

  test("forceActivate: waiting sibling takes over; parent force-retires descendants") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum.PosInf))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"),
      Seq(Seq("a"), Seq("b"), Seq("c"), Seq("d")))
    val kids = acct.split(partition)
    // reference test_force_activate_waiting_for_siblings: child 2 takes
    // over -> 0,1 retired, 2 active, 3 still waiting, parent still waiting
    kids(2).forceActivate()
    assert(kids(0).currentState == AccountantState.Retired)
    assert(kids(1).currentState == AccountantState.Retired)
    assert(kids(2).currentState == AccountantState.Active)
    assert(kids(3).currentState == AccountantState.WaitingForSibling)
    assert(acct.currentState == AccountantState.WaitingForChildren)
    // parent force-activates: remaining descendants retire, parent active
    acct.forceActivate()
    assert(kids.forall(_.currentState == AccountantState.Retired))
    assert(acct.currentState == AccountantState.Active)
    // RETIRED accountants refuse activation
    assertThrows[IllegalStateException](kids(0).forceActivate())
  }

  test("queue-flush ordering: queued transformations apply on reactivation") {
    // reference system test test_queue_transformation_on_inactive_accountant:
    // queue on a WAITING parent updates visible metadata immediately; when
    // the last child retires the parent reactivates with the
    // transformation applied (observable through the next measurement)
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum.PosInf))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"), Seq(Seq("a"), Seq("b")))
    val kids = acct.split(partition)
    val f1 = Filter(domain, SymmetricDifference, "A = 'a'")
    val f2 = Filter(domain, SymmetricDifference, "A IS NOT NULL")
    acct.queueTransformation(f1)
    acct.queueTransformation(f2) // queue ORDER must be preserved on flush
    assert(acct.distance == ExactNum(1))
    // an out-of-turn sibling retire flushes the whole chain on reactivation
    kids(1).retire()
    assert(acct.currentState == AccountantState.Active)
    val counts = acct.measure(countM(1000))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // noisy at eps=1000 -> within ±1 of (a -> 2, b -> 0) with prob ~1
    assert(math.abs(counts("a") - 2L) <= 1L && math.abs(counts("b")) <= 1L)
  }

  test("queueTransformation is allowed while WAITING; transformInPlace is not") {
    val comp = SequentialComposition(
      domain, SymmetricDifference, PureDP, ExactNum(1),
      PureDPBudget(ExactNum.PosInf))
    val acct = PrivacyAccountant.launch(comp, data)
    val partition = PartitionByKeys(
      domain, SymmetricDifference, Seq("A"), Seq(Seq("a"), Seq("b")))
    val kids = acct.split(partition)
    assert(acct.currentState == AccountantState.WaitingForChildren)
    // reference :1700-1778: queueing on a WAITING accountant updates the
    // visible metadata immediately and applies the data lazily
    val filter = Filter(domain, SymmetricDifference, "A = 'a'")
    acct.queueTransformation(filter)
    assert(acct.inputDomain == filter.outputDomain)
    assertThrows[IllegalStateException](acct.transformInPlace(filter))
    kids.foreach(_.retire())
    assert(acct.currentState == AccountantState.Active)
    // the queued filter applies before the next measurement: b drops to 0
    val infCount = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum.PosInf),
      Some(df("A STRING", Seq(Row("a"), Row("b")))))
    val counts = acct.measure(infCount)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("a" -> 2L, "b" -> 0L), s"got $counts")
    // RETIRED accountants refuse queued transformations
    acct.retire()
    assertThrows[IllegalStateException](
      acct.queueTransformation(Filter(domain, SymmetricDifference, "A = 'a'")))
  }
}
