package graft

import graft.ops.Layout
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class LayoutSpec extends SharedSpark {

  test("zValue interleaves bits: (x=0b11, y=0b01, 2 bits) -> 0b0111") {
    val d = df("x BIGINT, y BIGINT", Seq(Row(3L, 1L)))
    val z = d.select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    // x bits at positions 0,2; y bits at 1,3: 1 + 2 + 4 + 0 = 7
    assert(z == 7L)
  }

  test("zValue orders a 2D grid along the Morton curve") {
    val pts = for (x <- 0L to 3L; y <- 0L to 3L) yield Row(x, y)
    val d = df("x BIGINT, y BIGINT", pts)
    val zs = d.select(col("x"), col("y"),
      Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // the canonical first four cells of the curve
    assert(zs((0L, 0L)) == 0L && zs((1L, 0L)) == 1L)
    assert(zs((0L, 1L)) == 2L && zs((1L, 1L)) == 3L)
    // all 16 z-values distinct and within [0, 16)
    assert(zs.values.toSet.size == 16 && zs.values.forall(z => z >= 0 && z < 16))
  }

  test("grid clamps and scales onto the bit range") {
    val d = df("v DOUBLE", Seq(Row(-5.0), Row(0.0), Row(50.0), Row(100.0), Row(140.0)))
    val out = d.select(Layout.grid(col("v"), 0.0, 100.0, bits = 4).as("g"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 0L, 7L, 15L, 15L))
  }

  test("zOrder preserves the exact multiset of rows") {
    val d = df("x BIGINT, y BIGINT, p STRING",
      (1L to 100L).map(i => Row(i % 7, i % 11, s"r$i")))
    val out = Layout.zOrder(d, Seq(col("x"), col("y")), bits = 4,
      numPartitions = 3)
    assertSameRows(out, d)
    assert(out.columns.toSeq == Seq("x", "y", "p"))
  }

  test("zOrder partitions cover disjoint z-ranges (zone maps prune)") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield Row(x, y)
    val d = df("x BIGINT, y BIGINT", pts).repartition(8)
    val out = Layout.zOrder(d, Seq(col("x"), col("y")), bits = 5,
      numPartitions = 4)
    // recompute each row's z and observe the per-partition [min,max]
    // ranges: range partitioning on z makes them non-overlapping, which
    // is exactly the property file-level min/max stats prune on
    val ranges = out
      .select(spark_partition_id().as("pid"),
        Layout.zValue(Seq(col("x"), col("y")), bits = 5).as("z"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.nonEmpty)
    assert(ranges.sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 <= lo2
      case _ => true
    })
  }

  test("equiDepthBins: bins are contiguous in value and balanced on distinct data") {
    val d = df("id BIGINT, v BIGINT", (1L to 160L).map(i => Row(i, 1000L - i)))
    val out = Layout.equiDepthBins(d, "v", numBins = 8)
    val byBin = out.groupBy("bin").agg(
      count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(byBin.keySet == (0L to 7L).toSet)
    assert(byBin.values.forall(_._1 == 20L)) // perfectly balanced: 160/8
    // value ranges must not overlap across bins
    val sorted = byBin.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.sliding(2).forall {
      case Seq((_, _, hi), (_, lo, _)) => hi < lo
      case _ => true
    })
  }

  test("equiDepthBins keeps ties in one bin") {
    val d = df("id BIGINT, v BIGINT",
      (1L to 90L).map(i => Row(i, 5L)) ++ (91L to 100L).map(i => Row(i, 9L)))
    val out = Layout.equiDepthBins(d, "v", numBins = 4)
    assert(out.filter(col("v") === 5L).select("bin").distinct().count() == 1)
    assert(out.filter(col("v") === 9L).head().getAs[Long]("bin") == 3L) // 90*4/100
  }

  test("parquet scans carry pushed filters and pruned read schemas") {
    // the 100-TB contract for every entry reading the fixtures: a
    // predicate on a scanned column must reach the parquet reader
    // (PushedFilters) and the scan must read ONLY the projected columns
    // (ReadSchema) — a scan fetching all columns for a 2-column
    // projection re-reads the corpus for nothing
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists)
    val plan = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 10.0)
      .select(col("l_orderkey"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"),
      s"filter did not reach the scan:\n$plan")
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(schema.contains("l_orderkey") && schema.contains("l_quantity")
      && !schema.contains("l_extendedprice"),
      s"scan reads more than the projection: $schema")
  }

  test("bucketed-bucketed equi-join plans zero exchanges") {
    val left = df("k BIGINT, v BIGINT",
      (1L to 500L).map(i => Row(i % 50, i)))
    val right = df("k BIGINT, w BIGINT",
      (1L to 200L).map(i => Row(i % 50, i * 7)))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so the test proves BUCKETING (a
      // broadcast join has no exchange either, trivially)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Layout.writeBucketed(left, "lay_bkt_l", buckets = 4, keys = Seq("k"))
      Layout.writeBucketed(right, "lay_bkt_r", buckets = 4, keys = Seq("k"))
      val joined = spark.table("lay_bkt_l")
        .join(spark.table("lay_bkt_r"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result is still the plain join result
      assert(joined.count() ==
        left.join(right, Seq("k")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS lay_bkt_l")
      spark.sql("DROP TABLE IF EXISTS lay_bkt_r")
    }
  }
}
