package graft

import graft.ops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins graft.plans.LshSignature (one codegen'd kernel per row) bit-for-bit
  * against the higher-order formulation it replaced
  * (Similarity.lshSignatureHof, kept as the parity reference) — identical
  * signatures mean identical buckets, candidates, and recall.
  */
class LshSignatureSpec extends SharedSpark {

  private val schema = "id BIGINT, v ARRAY<DOUBLE>"

  private def assertParity(rows: Seq[Row], first: Int, planes: Int): Unit = {
    val got = df(schema, rows).select(
      Similarity.lshSignatureFrom(col("v"), first, planes).as("fast"),
      Similarity.lshSignatureHof(col("v"), first, planes).as("ref"))
      .collect()
    for (r <- got)
      assert(r.getLong(0) === r.getLong(1), s"family($first,$planes)")
  }

  private def vec(seed: Long, n: Int): Seq[java.lang.Double] =
    (0 until n).map { i =>
      val h = seed * 6364136223846793005L + i * 1442695040888963407L
      java.lang.Double.valueOf((h % 1000003).toDouble / 997.0)
    }

  test("bit-identical signatures across plane families and dimensions") {
    for ((first, planes) <- Seq((0, 1), (0, 16), (16, 16), (48, 15), (5, 63))) {
      val rows = (1L to 40L).map(i => Row(i, vec(i * 7 + first, 32)))
      assertParity(rows, first, planes)
    }
  }

  test("signatures are non-trivial (not all equal, not all zero)") {
    val rows = (1L to 64L).map(i => Row(i, vec(i, 16)))
    val sigs = df(schema, rows)
      .select(Similarity.lshSignatureFrom(col("v"), 0, 16).as("s"))
      .collect().map(_.getLong(0)).toSet
    assert(sigs.size > 8 && !(sigs == Set(0L)))
  }

  test("NULL vector and NULL element both give 0L, as the HOF chain did") {
    val rows = Seq(
      Row(1L, null),
      Row(2L, Seq[java.lang.Double](1.0, null, 3.0)),
      Row(3L, Seq[java.lang.Double](1.0, 2.0, 3.0)))
    val got = df(schema, rows).select(col("id"),
      Similarity.lshSignatureFrom(col("v"), 0, 12).as("fast"),
      Similarity.lshSignatureHof(col("v"), 0, 12).as("ref"))
      .orderBy("id").collect()
    for (r <- got) assert(r.getLong(1) === r.getLong(2))
    assert(got(0).getLong(1) === 0L)
    assert(got(1).getLong(1) === 0L)
    assert(got(2).getLong(1) !== 0L)
  }

  test("NaN elements: NaN projections clear their bits identically") {
    val rows = Seq(Row(1L,
      Seq[java.lang.Double](Double.NaN, 1.0, -2.0)))
    assertParity(rows, 0, 20)
  }

  test("float arrays match the cast-to-double path") {
    val fd = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.5f, -2.25f, 3.125f, 0.5f))))
    val direct = fd.select(
      Similarity.lshSignatureFrom(col("v"), 3, 24).as("s")).head().getLong(0)
    val cast = fd.select(Similarity.lshSignatureFrom(
      col("v").cast("array<double>"), 3, 24).as("s")).head().getLong(0)
    assert(direct === cast)
  }

  test("plan contract: corpus-side signature projection is codegen'd") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = e.select(
        Similarity.lshSignatureFrom(col("embedding"), 0, 16).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(300))
  }

  test("empty vector: signature parity with the HOF chain") {
    // zip_with pads the empty array against the [0, -1] index sequence
    // (sequence(0, size-1) DESCENDS when size = 0), so every HOF
    // projection is NULL -> signature 0L; the kernel must agree, not
    // fold an empty sum to +0.0 >= 0 on every plane
    assertParity(Seq(Row(1L, Seq.empty[java.lang.Double])), 0, 16)
  }

  // ------------------------------------------------------------------
  // LshProbeOrder: the query-side multi-probe order kernel, pinned
  // against the retired HOF chain (lshProbeOrderHof).
  // ------------------------------------------------------------------

  private def assertOrderParity(rows: Seq[Row], first: Int, planes: Int): Unit = {
    val got = df(schema, rows).select(col("id"),
      Similarity.lshProbeOrderFrom(col("v"), first, planes).as("fast"),
      Similarity.lshProbeOrderHof(col("v"), first, planes).as("ref"))
      .collect()
    for (r <- got)
      assert(r.getSeq[Int](1) === r.getSeq[Int](2),
        s"id=${r.getLong(0)} family($first,$planes)")
  }

  test("probe order parity across plane families and dimensions") {
    for ((first, planes) <- Seq((0, 1), (0, 5), (0, 16), (16, 16), (5, 63))) {
      val rows = (1L to 40L).map(i => Row(i, vec(i * 13 + first, 24)))
      assertOrderParity(rows, first, planes)
    }
  }

  test("probe order parity on IEEE specials and degenerate vectors") {
    assertOrderParity(Seq(
      Row(1L, Seq[java.lang.Double](Double.NaN, 1.0, -2.0)),   // NaN margins sort last
      Row(2L, Seq[java.lang.Double](Double.PositiveInfinity, 1.0)),
      Row(3L, Seq[java.lang.Double](Double.NegativeInfinity,
        Double.PositiveInfinity)),                             // Inf-Inf = NaN margins
      Row(4L, Seq[java.lang.Double](0.0, -0.0)),               // zero margins: index ties
      Row(5L, null),                                           // NULL vector -> identity
      Row(6L, Seq[java.lang.Double](1.0, null, 3.0)),          // NULL element -> identity
      Row(7L, Seq.empty[java.lang.Double]),                    // empty -> identity
      Row(8L, Seq[java.lang.Double](4.0))), 0, 8)
  }

  test("probe order is a permutation ordered by |projection|") {
    val rows = (1L to 20L).map(i => Row(i, vec(i * 3, 16)))
    val got = df(schema, rows).select(
      Similarity.lshProbeOrderFrom(col("v"), 0, 12).as("o")).collect()
    for (r <- got) {
      val o = r.getSeq[Int](0)
      assert(o.sorted === (0 until 12))
    }
  }

  test("plan contract: probe-order projection is codegen'd") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = e.select(
        Similarity.lshProbeOrderFrom(col("embedding"), 0, 16).as("o"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(300))
  }
}
