package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Pins graft.plans.Sha2Lanes (digest-byte lane extraction, one
  * thread-local SHA-256 per row) bit-for-bit against the column
  * formulation it replaced — sha2-hex → substring → conv — which remains
  * the cross-engine recipe the DuckDB oracles replay. Identical lanes
  * mean identical MinHash states, sample keeps, and split assignments.
  */
class Sha2LanesSpec extends SharedSpark {

  private def fast(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.Sha2Lanes(
        org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))

  private def ref(c: Column, n: Int): Column =
    array((0 until n).map { lane =>
      conv(substring(sha2(c, 256), 1 + 15 * lane, 15), 16, 10).cast("long")
    }: _*)

  private def assertParity(inputs: Seq[String], n: Int = 4): Unit = {
    val rows = df("s STRING", inputs.map(Row(_)))
      .select(fast(col("s"), n).as("fast"), ref(col("s"), n).as("ref"),
        col("s"))
      .collect()
    for (r <- rows)
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        s"lanes diverge on <${Option(r.getString(2)).map(_.take(50))}>")
  }

  test("lane parity on representative minhash inputs") {
    assertParity(Seq(
      "7|0|the quick brown",
      "7|1|the quick brown",
      "7|0|", "", "|", "0|0|x",
      "7|0|" + ("long shingle " * 50)))
  }

  test("lane parity on unicode and binary-ish strings") {
    assertParity(Seq(
      "7|0|café crème",
      "7|0|的是了在我有",
      "7|0|𝒜𝒝𝒵",            // beyond-BMP: multi-byte UTF-8
      "7|0|a\u0000b",          // embedded NUL survives UTF-8
      "7|0|​zero‍width"))
  }

  test("lane parity on 2000 pseudo-random strings, all lane counts") {
    val rng = new scala.util.Random(0xd16e57L)
    val pool = "ab cd|ef\n𝒜é的#…"
    val inputs = (1 to 2000).map { _ =>
      val n = rng.nextInt(40)
      (1 to n).map(_ => pool(rng.nextInt(pool.length))).mkString
    }
    for (n <- 1 to 4) assertParity(inputs, n)
  }

  test("NULL input stays NULL; plan is codegen'd") {
    val out = df("s STRING", Seq(Row(null)))
      .select(fast(col("s"), 4).as("l")).head()
    assert(out.isNullAt(0))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(fast(col("text"), 4).as("l"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(300))
  }
}
