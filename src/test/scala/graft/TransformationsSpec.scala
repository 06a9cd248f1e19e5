package graft

import graft.core._
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

class TransformationsSpec extends SharedSpark {

  private def abDf: DataFrame = df(
    "A STRING, X BIGINT",
    Seq(Row("a1", 2L), Row("a1", 3L), Row("a2", 5L), Row("a2", -1L))
  )
  private def abDomain: DataFrameDomain = DataFrameDomain(
    Seq("A" -> ColumnDescriptor.string(true), "X" -> ColumnDescriptor(
      org.apache.spark.sql.types.LongType, allowNull = true))
  )

  test("group-complete aggregation: key table defines the output row set") {
    val keys = df("A STRING", Seq(Row("a0"), Row("a1")))
    val g = GroupedDataFrame(abDf, keys)
    val out = g.agg(Seq(("count", count(lit(1)), lit(0L))))
    // a0 absent from data → fill 0; a2 in data but not in keys → dropped
    assert(
      sortedRows(out) == Seq(Seq("a0", "0"), Seq("a1", "2"))
    )
  }

  test("group-complete aggregation matches null keys null-safely") {
    val data = df("A STRING, X BIGINT", Seq(Row(null, 7L), Row("a1", 1L)))
    val keys = df("A STRING", Seq(Row(null), Row("a1")))
    val out = GroupedDataFrame(data, keys)
      .agg(Seq(("count", count(lit(1)), lit(0L))))
    assert(sortedRows(out) == Seq(Seq("a1", "1"), Seq("∅", "1")))
  }

  test("Filter keeps schema and is 1-stable") {
    val op = Filter(abDomain, SymmetricDifference, "X > 2")
    val out = op(abDf).asInstanceOf[DataFrame]
    assert(sortedRows(out) == Seq(Seq("a1", "3"), Seq("a2", "5")))
    assert(op.stabilityFunction(ExactNum(3)) == ExactNum(3))
  }

  test("Rename remaps IfGroupedBy metric column") {
    val op = Rename(abDomain, IfGroupedBy("A", SymmetricDifference), Map("A" -> "B"))
    assert(op.outputMetric == IfGroupedBy("B", SymmetricDifference))
  }

  test("Rename rejects duplicate output column names") {
    // Renaming another column onto an existing name would redefine it —
    // the exact hole that would let a key redefinition slip past the
    // AddRemoveKeys key-preservation whitelist.
    val e1 = intercept[IllegalArgumentException] {
      Rename(abDomain, SymmetricDifference, Map("X" -> "A"))
    }
    assert(e1.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      Rename(abDomain, SymmetricDifference, Map("A" -> "C", "X" -> "C"))
    }
    assert(e2.getMessage.contains("duplicate"))
    // swap via a fresh name is still fine
    Rename(abDomain, SymmetricDifference, Map("A" -> "X", "X" -> "A"))
  }

  test("FlatMap stability multiplies by the row cap") {
    val rt = RowToRowsTransformation(
      abDomain,
      DataFrameDomain(Seq("Y" -> ColumnDescriptor(
        org.apache.spark.sql.types.LongType, allowNull = true))),
      r => Seq(Row(1L), Row(2L), Row(3L)),
      augment = false
    )
    val op = FlatMapTransformation(SymmetricDifference, rt, Some(2))
    assert(op.stabilityFunction(ExactNum(1)) == ExactNum(2))
    val out = op(abDf).asInstanceOf[DataFrame]
    assert(out.count() == 8) // 4 rows × cap 2
    // no cap → infinite stability
    val unbounded = FlatMapTransformation(SymmetricDifference, rt, None)
    assert(unbounded.stabilityFunction(ExactNum(1)) == ExactNum.PosInf)
  }

  test("GroupingFlatMap dedups the new group column and has sqrt(k) L2 stability") {
    val rt = RowToRowsTransformation(
      abDomain,
      DataFrameDomain(abDomain.schema :+
        ("G" -> ColumnDescriptor.string(true))),
      r => Seq(
        Row(r.get(0), r.get(1), "g1"),
        Row(r.get(0), r.get(1), "g1"), // duplicate group → dropped
        Row(r.get(0), r.get(1), "g2")
      ),
      augment = false
    )
    val op = GroupingFlatMap(RootSumOfSquared(SymmetricDifference), rt, 4)
    assert(op.stabilityFunction(ExactNum(1)) == ExactNum(4).sqrt)
    val out = op(abDf).asInstanceOf[DataFrame]
    assert(out.count() == 8) // 2 distinct groups per input row
  }

  test("clip bounds round inward so the claimed sensitivity stays sound") {
    import graft.exact.Rational
    val third = Rational(1, 3)
    val (lo, hi) = ClipBounds.doubles(third, Rational(2, 3))
    // lower rounded up, upper rounded down: the float interval is inside
    // the exact interval
    assert(lo >= 1.0 / 3.0 - 1e-15 && lo * 3 >= 1.0)
    assert(hi <= 2.0 / 3.0 + 1e-15 && hi * 3 <= 2.0)
    assert(lo <= hi)
    assertThrows[IllegalArgumentException](
      ClipBounds.doubles(Rational(1), Rational(0)))
  }

  test("Sum clips before summing; sensitivity max(|l|,|u|)") {
    val op = Sum(
      DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true),
        "X" -> ColumnDescriptor.long)),
      SymmetricDifference, "X", Rational(0), Rational(3))
    // clip: 2,3,3,0 → 8
    assert(op(abDf) == 8L)
    assert(op.stabilityFunction(ExactNum(1)) == ExactNum(3))
    // Hamming: u − l
    val opH = op.copy(inputMetric = HammingDistance)
    assert(opH.stabilityFunction(ExactNum(1)) == ExactNum(3))
  }

  test("CountDistinct counts null-containing rows") {
    val data = df("A STRING, X BIGINT",
      Seq(Row(null, 1L), Row(null, 1L), Row("a", 1L)))
    val op = CountDistinct(abDomain, SymmetricDifference)
    assert(op(data) == 2L)
    // Hamming doubles
    assert(CountDistinct(abDomain, HammingDistance)
      .stabilityFunction(ExactNum(2)) == ExactNum(4))
  }

  test("truncation is deterministic and respects thresholds") {
    val data = df("A STRING, X BIGINT",
      (1 to 10).map(i => Row("g", i.toLong)) :+ Row("h", 99L))
    val out1 = Truncation.truncateLargeGroups(data, Seq("A"), 3)
    val out2 = Truncation.truncateLargeGroups(data, Seq("A"), 3)
    assertSameRows(out1, out2)
    assert(out1.filter(col("A") === "g").count() == 3)
    assert(out1.filter(col("A") === "h").count() == 1)
    val dropped = Truncation.dropLargeGroups(data, Seq("A"), 3)
    assert(sortedRows(dropped) == Seq(Seq("h", "99")))
  }

  test("salted truncation selects exactly the same rows as the single window") {
    // 400 rows over 3 groups with duplicates; every salt level must agree
    // with the plain window (the global top-τ is in each bucket's top-τ)
    val data = df("A STRING, X BIGINT",
      (1 to 400).map(i => Row(s"g${i % 3}", (i % 37).toLong)))
    val plain = Truncation.truncateLargeGroups(data, Seq("A"), 7)
    for (salts <- Seq(2, 8, 32)) {
      // hotGroupMinRows = 0 forces every group through the two-phase path;
      // the default routes these tiny groups through the plain window
      val salted = Truncation.truncateLargeGroupsSalted(data, Seq("A"), 7, salts,
        hotGroupMinRows = 0L)
      assertSameRows(plain, salted)
      val routed = Truncation.truncateLargeGroupsSalted(data, Seq("A"), 7, salts,
        hotGroupMinRows = 50L)
      assertSameRows(plain, routed)
    }
  }

  test("sampled hot-group probe routes a hot group and stays row-identical") {
    // hotGroupMinRows = 4000 → the probe samples 50% (2000/4000); the
    // 10k-row hot group is flagged by the sample and re-counted exactly,
    // the 200-row group stays cold — selection matches the plain window
    val rows = (1 to 10000).map(i => Row("hot", (i % 97).toLong)) ++
      (1 to 200).map(i => Row("cold", (i % 23).toLong))
    val data = df("A STRING, X BIGINT", rows)
    val plain = Truncation.truncateLargeGroups(data, Seq("A"), 5)
    val salted = Truncation.truncateLargeGroupsSalted(data, Seq("A"), 5,
      saltBuckets = 8, hotGroupMinRows = 4000L)
    assertSameRows(plain, salted)
  }

  test("limitKeysPerGroup keeps at most k distinct keys") {
    val data = df("G STRING, K BIGINT",
      (1 to 6).flatMap(k => Seq(Row("g", k.toLong), Row("g", k.toLong))))
    val out = Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), 2)
    assert(out.select("K").distinct().count() == 2)
    assert(out.count() == 4) // both duplicate rows of each kept key survive
  }

  test("limitKeysPerGroup matches the single-window dense_rank selection") {
    // row-identity vs the pre-restructure implementation (dense_rank over
    // every raw row): the distinct-pairs + semi-join path must keep exactly
    // the same keys, on the plain and the forced-salt routes alike
    val data = df("G STRING, K BIGINT, V BIGINT",
      (1 to 500).map(i => Row(s"g${i % 4}", (i % 23).toLong, (i % 7).toLong)) :+
        Row(null, null, 0L) :+ Row(null, 3L, 1L))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("G"))
      .orderBy(Truncation.colsHash(Seq("K")), col("K"))
    val ref = data.withColumn("__dr", dense_rank().over(w))
      .filter(col("__dr") <= 5).drop("__dr")
    val out = Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), 5)
    assertSameRows(out, ref)
    val salted = Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), 5,
      saltBuckets = 8, hotGroupMinKeys = 0L)
    assertSameRows(salted, ref)
  }

  test("rowHash distinguishes null positions and embedded separators") {
    // ("a", NULL) vs (NULL, "a") and ("a|b", "c") vs ("a", "b|c") collided
    // under the old concat_ws encoding; the JSON encoding keeps them apart
    val data = df("A STRING, B STRING",
      Seq(Row("a", null), Row(null, "a"), Row("a|b", "c"), Row("a", "b|c")))
    val hashes = data.select(Truncation.rowHash(data).as("h"))
      .collect().map(_.getString(0))
    assert(hashes.distinct.length == 4)
  }

  test("PublicJoin stability is the public side's max key multiplicity") {
    val priv = df("K BIGINT, V STRING", Seq(Row(1L, "x"), Row(2L, "y")))
    val pub = df("K BIGINT, W STRING",
      Seq(Row(1L, "a"), Row(1L, "b"), Row(1L, "c"), Row(2L, "d")))
    val op = PublicJoin(
      DataFrameDomain(Seq("K" -> ColumnDescriptor.long,
        "V" -> ColumnDescriptor.string(true))),
      SymmetricDifference, pub, Seq("K"))
    assert(op.maxMultiplicity == 3L)
    assert(op.stabilityFunction(ExactNum(2)) == ExactNum(6))
    assert(op(priv).asInstanceOf[DataFrame].count() == 4)
  }

  test("PrivateJoin stability formula") {
    val d = DataFrameDomain(Seq("K" -> ColumnDescriptor.long))
    val op = PrivateJoin(d, d, "left", "right", Seq("K"),
      TruncationStrategy.Truncate, 2, TruncationStrategy.Drop, 3)
    // τ_l·s_r·d_r + τ_r·s_l·d_l = 2·3·1 + 3·2·1 = 12
    assert(op.stabilityFunction(ExactNum(1)) == ExactNum(12))
  }

  test("null-safe join kernel merges keys under outer join") {
    val l = df("K BIGINT, V STRING", Seq(Row(null, "ln"), Row(1L, "l1")))
    val r = df("K BIGINT, W STRING", Seq(Row(null, "rn"), Row(2L, "r2")))
    val inner = JoinKernel.join(l, r, Seq("K"), "inner", nullsAreEqual = true)
    assert(sortedRows(inner) == Seq(Seq("∅", "ln", "rn")))
    val noNulls = JoinKernel.join(l, r, Seq("K"), "inner", nullsAreEqual = false)
    assert(noNulls.count() == 0)
  }

  test("PartitionByKeys splits with null-safe filters") {
    val data = df("A STRING, X BIGINT",
      Seq(Row("a", 1L), Row(null, 2L), Row("b", 3L)))
    val op = PartitionByKeys(abDomain, SymmetricDifference, Seq("A"),
      Seq(Seq("a"), Seq(null)))
    val parts = op(data).asInstanceOf[Seq[DataFrame]]
    assert(parts.size == 2)
    assert(parts(0).count() == 1)
    assert(parts(1).count() == 1) // null key matched null-safely
  }

  test("chaining composes stability and validates domains") {
    val f1 = Filter(abDomain, SymmetricDifference, "X > 0")
    val f2 = Filter(abDomain, SymmetricDifference, "X < 10")
    val chained = f1 | f2
    assert(chained.stabilityFunction(ExactNum(5)) == ExactNum(5))
    val sel = Select(abDomain, SymmetricDifference, Seq("A"))
    assertThrows[IllegalArgumentException](sel | f1) // domain mismatch
  }

  test("AddUniqueColumn produces distinct values even for identical rows") {
    val data = df("A STRING", Seq(Row("x"), Row("x"), Row("x")))
    val op = AddUniqueColumn(
      DataFrameDomain(Seq("A" -> ColumnDescriptor.string(true))), "id")
    val out = op(data).asInstanceOf[DataFrame]
    assert(out.select("id").distinct().count() == 3)
    assert(op.outputMetric == IfGroupedBy("id", SymmetricDifference))
  }

  test("AddUniqueColumn salted hot-class path emits the same id set as the plain window") {
    // 40 copies of one row (hot), 3 of another (cold), 1 unique; the id of
    // row (content, duplicate-index) is a pure content hash, so plain and
    // salted selection must produce the IDENTICAL id set — indices {1..G}
    // per class regardless of bucketing
    val rows = Seq.fill(40)(Row("hot", 1L)) ++
      Seq.fill(3)(Row("cold", 2L)) :+ Row("one", 3L)
    val data = df("A STRING, B BIGINT", rows)
    val dom = DataFrameDomain(
      Seq("A" -> ColumnDescriptor.string(true), "B" -> ColumnDescriptor.long))
    val plainOp = AddUniqueColumn(dom, "id", saltBuckets = 1)
    val saltedOp = AddUniqueColumn(dom, "id", saltBuckets = 4, hotClassMinRows = 10)
    val plainIds = plainOp(data).asInstanceOf[DataFrame]
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    val saltedIds = saltedOp(data).asInstanceOf[DataFrame]
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(plainIds.distinct.size == 44)
    assert(saltedIds == plainIds)
  }

  test("AddUniqueColumn SAMPLED probe branch (sampleFraction < 1) routes the hot class") {
    // hotClassMinRows = 2500 → sampleFraction = 0.8 < 1, exercising the
    // sampled candidate scan + exact recount (the default-config branch,
    // which the test above skips by forcing hotClassMinRows = 10). The
    // 3000-copy class must be flagged by the sample, survive the exact
    // recount, and still produce the identical id set as the plain window.
    val rows = Seq.fill(3000)(Row("hot", 1L)) ++
      Seq.fill(3)(Row("cold", 2L)) :+ Row("one", 3L)
    val data = df("A STRING, B BIGINT", rows)
    val dom = DataFrameDomain(
      Seq("A" -> ColumnDescriptor.string(true), "B" -> ColumnDescriptor.long))
    val plainOp = AddUniqueColumn(dom, "id", saltBuckets = 1)
    val sampledOp = AddUniqueColumn(dom, "id", saltBuckets = 4,
      hotClassMinRows = 2500L)
    val plainIds = plainOp(data).asInstanceOf[DataFrame]
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    val sampledIds = sampledOp(data).asInstanceOf[DataFrame]
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(plainIds.distinct.size == 3004)
    assert(sampledIds == plainIds)
  }

  test("topKPerGroupByScore keeps the k best, null scores lose, hot path row-identical") {
    // group "a": scores 5,5,3,null,1 with ids 1..5 — top-3 = {1,2,3}
    // (tie at 5 -> smaller ids first, null ranks worst)
    val rows = Seq(
      Row("a", 1L, java.lang.Double.valueOf(5.0)),
      Row("a", 2L, java.lang.Double.valueOf(5.0)),
      Row("a", 3L, java.lang.Double.valueOf(3.0)),
      Row("a", 4L, null),
      Row("a", 5L, java.lang.Double.valueOf(1.0)),
      Row("b", 6L, java.lang.Double.valueOf(0.0)))
    val d = df("G STRING, id BIGINT, s DOUBLE", rows)
    val kept = graft.transformations.Truncation
      .topKPerGroupByScore(d, Seq("G"), "s", Seq("id"), 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 6L))
    // hot-group routing (hotGroupMinRows=10 forces the salted path) must
    // select the IDENTICAL rows as the plain window — low-cardinality
    // scores included (all ties -> id order decides)
    val hot = (0 until 200).map(i => Row("h", i.toLong,
      java.lang.Double.valueOf((i % 3).toDouble)))
    val dh = df("G STRING, id BIGINT, s DOUBLE", hot)
    val plain = graft.transformations.Truncation
      .topKPerGroupByScore(dh, Seq("G"), "s", Seq("id"), 7, saltBuckets = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    val salted = graft.transformations.Truncation
      .topKPerGroupByScore(dh, Seq("G"), "s", Seq("id"), 7,
        saltBuckets = 4, hotGroupMinRows = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(salted == plain)
    assert(plain == Set(2L, 5L, 8L, 11L, 14L, 17L, 20L)) // score 2 ties, min ids
  }
}
