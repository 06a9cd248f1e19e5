package graft

import graft.ops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DotProductSpec extends SharedSpark {

  /** The previous higher-order formulation, kept as the parity reference:
    * index-order IEEE fold from 0.0, zip_with padding on length mismatch. */
  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private val schema = "id BIGINT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"

  test("bit-identical to the HOF fold on dense vectors") {
    // deterministic pseudo-random doubles, including negatives and values
    // whose sum order matters at the last ulp
    def vec(seed: Long, n: Int): Seq[java.lang.Double] =
      (0 until n).map { i =>
        val h = (seed * 6364136223846793005L + i * 1442695040888963407L)
        java.lang.Double.valueOf((h % 1000003).toDouble / 997.0)
      }
    val rows = (1L to 50L).map(i =>
      Row(i, vec(i, 64), vec(i * 31 + 7, 64)))
    val d = df(schema, rows)
    val cmp = d.select(
      Similarity.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref"))
    // exact equality, not tolerance: the kernel folds in the same order
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
    assert(cmp.filter(col("fast").isNull).count() === 0)
  }

  test("bit-identical to the HOF fold on IEEE specials") {
    // NaN, infinities, signed zeros, subnormals, and magnitudes whose
    // products overflow: the kernel must propagate exactly as the fold did
    val specials = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      1e-300, -1e308, 3.141592653589793)
    val rng = new scala.util.Random(42)
    def vec(n: Int): Seq[java.lang.Double] =
      (0 until n).map(_ => java.lang.Double.valueOf(
        specials(rng.nextInt(specials.size))))
    val rows = (1L to 200L).map(i => Row(i, vec(8), vec(8)))
    val got = df(schema, rows).select(
      Similarity.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    // compare raw bits so ±0.0 can't hide behind SQL equality — EXCEPT
    // among NaNs: Spark semantics treat all NaNs as one value, and the
    // codegen path's UnsafeRow write canonicalizes NaN to 0x7FF8… while
    // the interpreted fold can surface the hardware QNaN (0xFFF8…), a
    // storage quirk with no SQL-visible effect (grouping/compare/oracle
    // all see "NaN")
    for (r <- got) {
      val (f, g) = (r.getDouble(0), r.getDouble(1))
      if (f.isNaN || g.isNaN) assert(f.isNaN && g.isNaN)
      else assert(java.lang.Double.doubleToRawLongBits(f) ===
        java.lang.Double.doubleToRawLongBits(g))
    }
  }

  test("null semantics mirror zip_with/aggregate exactly") {
    val rows = Seq(
      Row(1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      Row(2L, null, Seq[java.lang.Double](1.0)),                  // null array
      Row(3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)), // null elem
      Row(4L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 1.0)), // len mismatch
      Row(5L, Seq[java.lang.Double](), Seq[java.lang.Double]()))  // empty -> 0.0
    val d = df(schema, rows)
    val got = d.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("ref"))
      .orderBy("id").collect()
    for (r <- got) {
      assert(r.isNullAt(1) === r.isNullAt(2), s"row ${r.getLong(0)}: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) === r.getDouble(2))
    }
    assert(got(0).getDouble(1) === 11.0)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1) && got(3).isNullAt(1))
    assert(got(4).getDouble(1) === 0.0)
  }

  test("float arrays widen per element == cast-to-double-array first") {
    val d = df("id BIGINT, a ARRAY<FLOAT>, b ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.75f, -1.625f))))
    val direct = d.select(
      Similarity.dot(col("a"), col("b")).as("v")).head().getDouble(0)
    val cast = d.select(Similarity.dot(
      col("a").cast("array<double>"),
      col("b").cast("array<double>")).as("v")).head().getDouble(0)
    assert(direct === cast)
    assert(direct === (1.5 * 0.5) + (-2.25 * 4.75) + (3.125 * -1.625))
  }

  test("plan contract: cosine projection stays inside whole-stage codegen") {
    // the point of the expression: the HOF fold forced the projection out
    // of codegen (interpreted eval per element). `*` is the codegen marker
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = e.select(Similarity.cosine(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(300))
    assert(!plan.contains("Exchange"), plan.take(300))
  }
}
