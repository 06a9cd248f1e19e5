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
