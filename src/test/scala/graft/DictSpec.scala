package graft

import graft.core.Identity
import graft.domains._
import graft.exact.ExactNum
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Dictionary pipeline factories (reference `dictionary.py:370-798`) and the
  * AddRemoveKeys augmentation hazard (`add_remove_keys.py:1-107`).
  */
class DictSpec extends SharedSpark {

  private def abDomain = DataFrameDomain(
    Seq("A" -> ColumnDescriptor.string(), "B" -> ColumnDescriptor.string()))

  private def abDf = df("A STRING, B STRING",
    Seq(Row("a", "1"), Row("b", "2"), Row("c", "3")))

  test("createCopyAndTransformValue keeps the original and adds the new key") {
    val d = DictDomain(Map("t" -> abDomain))
    val m = DictMetric(Map("t" -> SymmetricDifference))
    val op = Dict.createCopyAndTransformValue(
      d, m, "t", "f",
      Filter(abDomain, SymmetricDifference, "A <> 'a'"))
    assert(op.outputDomain.asInstanceOf[DictDomain].elements.keySet == Set("t", "f"))
    assert(op.stabilityFunction(ExactNum(2)) == ExactNum(2))
    val out = op(Map("t" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(out("t").count() == 3 && out("f").count() == 2)
  }

  test("createRename moves a value to a new key") {
    val d = DictDomain(Map("x" -> abDomain, "y" -> abDomain))
    val m = DictMetric(Map("x" -> SymmetricDifference, "y" -> SymmetricDifference))
    val op = Dict.createRename(d, m, "x", "z")
    assert(op.outputDomain.asInstanceOf[DictDomain].elements.keySet == Set("y", "z"))
    val out = op(Map("x" -> abDf, "y" -> abDf.limit(1)))
      .asInstanceOf[Map[String, DataFrame]]
    assert(out("z").count() == 3 && out("y").count() == 1)
  }

  test("createApplyDictOfTransformations fans one value into a dict") {
    val op = Dict.createApplyDictOfTransformations(Seq(
      "all" -> Identity(abDomain, SymmetricDifference),
      "noA" -> Filter(abDomain, SymmetricDifference, "A <> 'a'")))
    assert(op.inputDomain == abDomain)
    assert(op.outputDomain.asInstanceOf[DictDomain].elements.keySet == Set("all", "noA"))
    val out = op(abDf).asInstanceOf[Map[String, DataFrame]]
    assert(out("all").count() == 3 && out("noA").count() == 2)
  }

  test("createTransformAllValues transforms each value in place") {
    val op = Dict.createTransformAllValues(Seq(
      "p" -> Filter(abDomain, SymmetricDifference, "A = 'a'"),
      "q" -> Select(abDomain, SymmetricDifference, Seq("B"))))
    val out = op(Map("p" -> abDf, "q" -> abDf))
      .asInstanceOf[Map[String, DataFrame]]
    assert(out("p").count() == 1)
    assert(out("q").columns.toSeq == Seq("B") && out("q").count() == 3)
    assert(op.outputDomain.asInstanceOf[DictDomain].elements("q")
      .asInstanceOf[DataFrameDomain].columnNames == Seq("B"))
  }

  test("AugmentDict applies a whole-dict inner transformation") {
    val d = DictDomain(Map("t" -> abDomain))
    val m = DictMetric(Map("t" -> SymmetricDifference))
    val inner = new graft.core.Transformation {
      def inputDomain: Domain = d
      def inputMetric: Metric = m
      def outputDomain: Domain = DictDomain(Map("n" -> abDomain))
      def outputMetric: Metric = DictMetric(Map("n" -> SymmetricDifference))
      def stabilityFunction(dIn: ExactNum): ExactNum = dIn
      def apply(data: Any): Any = {
        val in = data.asInstanceOf[Map[String, DataFrame]]
        Map("n" -> in("t").filter(col("A") =!= "a"))
      }
    }
    val op = AugmentDict(inner)
    val out = op(Map("t" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(out.keySet == Set("t", "n"))
    assert(out("n").count() == 2)
  }

  test("worked example: key-redefining chains double the ARK distance and are rejected") {
    // Port of the reference add_remove_keys.py:1-107 doctest: the chain
    // truncate → rename(A→C,B→D) → AddUniqueColumn("A") is 1-stable under
    // row metrics, but its output "A" is a NEW key column: removing key "a"
    // from the input removes key "a" AND its derived unique value from the
    // augmented dict — AddRemoveKeys distance 2, not 1.
    val x1 = abDf
    val x2 = df("A STRING, B STRING", Seq(Row("b", "2"), Row("c", "3")))
    val truncate = LimitRowsPerGroup(abDomain, "A", 1)
    val renamed = DataFrameDomain(
      Seq("C" -> ColumnDescriptor.string(), "D" -> ColumnDescriptor.string()))
    val rename = Rename(abDomain, SymmetricDifference, Map("A" -> "C", "B" -> "D"))
    val unique = AddUniqueColumn(renamed, "A")
    val chain = truncate | rename | unique
    assert(chain.stabilityFunction(ExactNum.one) == ExactNum.one)
    val y1 = chain(x1).asInstanceOf[DataFrame]
    val y2 = chain(x2).asInstanceOf[DataFrame]
    // the augmented dicts are at ARK distance 2 although the inputs are at 1
    val inDist = MetricDistance.compute(
      AddRemoveKeys(Map("start" -> "A")),
      Map("start" -> x1), Map("start" -> x2))
    val outDist = MetricDistance.compute(
      AddRemoveKeys(Map("start" -> "A", "end" -> "A")),
      Map("start" -> x1, "end" -> y1), Map("start" -> x2, "end" -> y2))
    assert(inDist == ExactNum.one)
    assert(outDist == ExactNum(2))
    // ...which is exactly why TransformValue must refuse the chain
    val dictDom = DictDomain(Map("start" -> abDomain))
    val ark = AddRemoveKeys(Map("start" -> "A"))
    val err = intercept[IllegalArgumentException] {
      TransformValue(dictDom, ark, "start", "end", chain).outputMetric
    }
    assert(err.getMessage.contains("key-preserving"))
  }

  test("named ARK wrappers build admitted TransformValues (reference named API)") {
    // the reference's FilterValue / PublicJoinValue / LimitRowsPerGroupValue
    // named classes (add_remove_keys.py:159-1009), as thin constructors
    // over the generic TransformValue + ArkSafety check
    val dictDom = DictDomain(Map("start" -> abDomain))
    val ark = AddRemoveKeys(Map("start" -> "A"))

    val filt = Ark.filterValue(dictDom, ark, "start", "f", "B <> '2'")
    assert(filt.outputMetric == AddRemoveKeys(Map("start" -> "A", "f" -> "A")))
    assert(filt.stabilityFunction(ExactNum.one) == ExactNum.one)
    val fOut = filt(Map("start" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(fOut("f").count() == 2)

    val ren = Ark.renameValue(dictDom, ark, "start", "r", Map("A" -> "C"))
    assert(ren.outputMetric == AddRemoveKeys(Map("start" -> "A", "r" -> "C")))

    val pub = df("A STRING, P STRING", Seq(Row("a", "x"), Row("b", "y")))
    val pj = Ark.publicJoinValue(dictDom, ark, "start", "j", pub, Seq("A"))
    assert(pj.outputMetric == AddRemoveKeys(Map("start" -> "A", "j" -> "A")))
    val jOut = pj(Map("start" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(jOut("j").columns.contains("P") && jOut("j").count() == 2)

    val lim = Ark.limitRowsPerGroupValue(dictDom, ark, "start", "t", 1)
    assert(lim.outputMetric == AddRemoveKeys(Map("start" -> "A", "t" -> "A")))
    assert(lim(Map("start" -> abDf))
      .asInstanceOf[Map[String, DataFrame]]("t").count() == 3)

    // a join NOT on the key column is a key fan-out: must be refused
    val bad = df("B STRING, P STRING", Seq(Row("1", "x")))
    val err = intercept[IllegalArgumentException] {
      Ark.publicJoinValue(dictDom, ark, "start", "bad", bad, Seq("B"))
        .outputMetric
    }
    assert(err.getMessage.contains("key-preserving"))
  }

  test("ARK map/flatMap wrappers: augmenting passes, key-rewriting rejected") {
    val dictDom = DictDomain(Map("start" -> abDomain))
    val ark = AddRemoveKeys(Map("start" -> "A"))
    val lenDom = DataFrameDomain(Seq("blen" -> ColumnDescriptor.int))
    // augmenting map: output row = input row ++ produced columns, so the
    // key column survives structurally — the reference MapValue claim
    val aug = RowToRowTransformation(abDomain, lenDom,
      r => Row(r.getString(1).length), augment = true)
    val mv = Ark.mapValue(dictDom, ark, "start", "m", aug)
    assert(mv.outputMetric == AddRemoveKeys(Map("start" -> "A", "m" -> "A")))
    val out = mv(Map("start" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(out("m").columns.toSeq == Seq("A", "B", "blen"))
    assert(out("m").count() == 3)
    // flatMap with a row cap, augmenting: admitted, stability still d_in
    val augN = RowToRowsTransformation(abDomain, lenDom,
      r => Seq(Row(1), Row(2)), augment = true)
    val fv = Ark.flatMapValue(dictDom, ark, "start", "f", augN, Some(2))
    assert(fv.outputMetric == AddRemoveKeys(Map("start" -> "A", "f" -> "A")))
    assert(fv.stabilityFunction(ExactNum.one) == ExactNum.one)
    // a NON-augmenting map rewrites rows wholesale (could redefine the
    // key): the wrapper must refuse — MapTransformation's own
    // IfGroupedBy-requires-augment guard fires at construction
    val bare = RowToRowTransformation(abDomain, abDomain,
      r => Row("x", r.getString(1)), augment = false)
    assertThrows[IllegalArgumentException](
      Ark.mapValue(dictDom, ark, "start", "bad", bare))
    // replacing nulls IN the key column is a key redefinition: rejected
    val err = intercept[IllegalArgumentException] {
      Ark.replaceNullsValue(dictDom, ark, "start", "bad",
        Map("A" -> "filled")).outputMetric
    }
    assert(err.getMessage.contains("key-preserving"))
    // replace on a NON-key column is admitted
    assert(Ark.replaceNullsValue(dictDom, ark, "start", "ok",
      Map("B" -> "filled")).outputMetric ==
      AddRemoveKeys(Map("start" -> "A", "ok" -> "A")))
    // the no-op wrappers track the key unchanged
    assert(Ark.persistValue(dictDom, ark, "start", "p").outputMetric ==
      AddRemoveKeys(Map("start" -> "A", "p" -> "A")))
  }

  test("TransformValue under ARK tracks a renamed key column") {
    val dictDom = DictDomain(Map("start" -> abDomain))
    val ark = AddRemoveKeys(Map("start" -> "A"))
    val inner = LimitRowsPerGroup(abDomain, "A", 1) |
      Rename(abDomain, SymmetricDifference, Map("A" -> "C"))
    val op = TransformValue(dictDom, ark, "start", "end", inner)
    assert(op.outputMetric == AddRemoveKeys(Map("start" -> "A", "end" -> "C")))
    val out = op(Map("start" -> abDf)).asInstanceOf[Map[String, DataFrame]]
    assert(out("end").columns.toSeq == Seq("C", "B"))
  }
}
