package graft

import graft.ops.Graph
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Link-graph analytics: PageRank fixed points, mass conservation,
  * degree profiles, and the hash-gate guard band for the quantized
  * cross-engine replay mode. */
class GraphSpec extends SharedSpark {

  private def edges(pairs: (String, String)*) =
    df("src STRING, dst STRING", pairs.map(p => Row(p._1, p._2)))

  test("two-node cycle is a PageRank fixed point at uniform rank") {
    val out = Graph.pageRank(edges("a" -> "b", "b" -> "a"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.5 && out("b") == 0.5)
  }

  test("symmetrized star concentrates rank on the hub, mass conserved") {
    val out = Graph.pageRank(
      edges("a" -> "b", "a" -> "c", "b" -> "a", "c" -> "a"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // contrib(a) = r(b)+r(c) = 2/3; contrib(b) = contrib(c) = r(a)/2
    assert(math.abs(out("a") - (0.05 + 0.85 * 2.0 / 3.0)) < 1e-15)
    assert(out("b") == out("c"))
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }

  test("dangling node leaks mass (classic formulation)") {
    // b has no out-edges: total mass drops below 1 after one iteration
    val out = Graph.pageRank(edges("a" -> "b"), iters = 1)
      .collect().map(_.getDouble(1)).sum
    assert(out < 1.0 - 1e-3)
  }

  test("degrees profiles both sides with zero-fill") {
    val out = Graph.degrees(edges("a" -> "b", "a" -> "c", "b" -> "c"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((2L, 0L)))
    assert(out("b") == ((1L, 1L)))
    assert(out("c") == ((0L, 2L)))
  }

  test("degrees merges NULL endpoints into ONE null-id row (pinned: the " +
    "pre-r17 full-outer-join shape emitted two separate NULL rows)") {
    // No declared caller emits NULL node ids; this pins the contract so a
    // future caller with NULL ids gets the documented merged shape, not a
    // silent change (round-17 ADVICE item).
    val out = Graph.degrees(edges("a" -> null, null.asInstanceOf[String] -> "a"))
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2))))
    val nullRows = out.filter(_._1.isEmpty)
    assert(nullRows.length == 1, s"expected one merged NULL row, got $out")
    assert(nullRows.head._2 == ((1L, 1L))) // out-deg from (null->a), in-deg from (a->null)
    assert(out.filter(_._1.contains("a")).head._2 == ((1L, 1L)))
  }

  test("q_pagerank guard band: every pre-round iterate sits far from a " +
    "1e-9 grid boundary") {
    // The driver gate hashes values, and per-node contribution sums are
    // order-dependent across engines in their last ulps (~1e-17 observed,
    // i.e. ~1e-8 of a grid cell). The quantized replay is only hash-stable
    // if no pre-round value sits within that drift of a *.5e-9 rounding
    // boundary. Measured minima on this fixture: 8.3e-5 grid cells
    // (iteration 2) — ~3600× the drift; pin at 1e-5 so fixture drift
    // fails here, not flakily at the gate.
    val dir = "/root/testdata/sf0.01"
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    val sym = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    def boundaryMargin(ranks: org.apache.spark.sql.DataFrame): Double =
      ranks.select(min(abs(
        col("r") * 1e9 - floor(col("r") * 1e9) - lit(0.5))).as("m"))
        .head().getDouble(0)
    var rounded: Option[org.apache.spark.sql.DataFrame] = None
    for (k <- 1 to 3) {
      val raw = Graph.pageRank(sym, 1, 0.85, initial = rounded)
      assert(boundaryMargin(raw) > 1e-5,
        s"iteration $k pre-round margin too tight for the hash gate")
      rounded = Some(
        Graph.pageRank(sym, 1, 0.85, roundDigits = 9, initial = rounded))
    }
  }

  private def triangles(pairs: (String, String)*): Long =
    Graph.triangleCount(edges(pairs: _*)).collect().head.getLong(0)

  test("triangleCount on canonical small graphs") {
    assert(triangles("a" -> "b", "b" -> "c", "a" -> "c") == 1L)
    // K4 has 4 triangles
    assert(triangles("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d") == 4L)
    // star and path have none
    assert(triangles("a" -> "b", "a" -> "c", "a" -> "d") == 0L)
    assert(triangles("a" -> "b", "b" -> "c", "c" -> "d") == 0L)
    // bowtie: two triangles sharing a node
    assert(triangles("a" -> "b", "a" -> "c", "b" -> "c",
      "a" -> "d", "a" -> "e", "d" -> "e") == 2L)
  }

  test("triangleCount ignores self-loops, multi-edges, and direction") {
    assert(triangles("a" -> "b", "b" -> "c", "a" -> "c",
      "a" -> "a", "b" -> "a", "c" -> "a", "a" -> "b") == 1L)
  }
}
