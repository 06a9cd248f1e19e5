package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (untimed): force a full read of every table (xxhash64 over all
    // columns defeats the parquet count-from-metadata shortcut) plus one
    // representative query, so the timed loop measures steady-state execution
    // instead of first-touch page-cache misses and JIT compilation.
    import org.apache.spark.sql.functions.{expr, lit}
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try
        spark.read.parquet(s"$sfDir/$t.parquet")
          .select(expr("sum(xxhash64(struct(*)))")).collect()
      catch { case _: Throwable => () }
    }
    // JIT/codegen warmup: run EVERY query once at the smallest SF so each
    // plan's generated code is compiled before it is timed — otherwise the
    // (hash-ordered) first few queries absorb the whole JVM warmup cost and
    // per-query numbers shift across rounds as the query set grows.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    var warmFailures = 0
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => warmFailures += 1 }
      spark.catalog.clearCache()
    }
    if (warmFailures == SparkEntry.queries.size)
      System.err.println(s"WARNING: warmup found no data at $warmDir; timed queries will absorb JIT cost")
    System.gc()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent; don't let one query's persisted
      // intermediates distort the next one's timing. localCheckpoint
      // blocks are only released when their RDDs are GC'd (the
      // ContextCleaner works off weak references), so prompt a GC too.
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    // Reference-envelope sweep (BASELINE.md / benchmark/count_sum.py
    // workload shapes): noisy grouped count+sum over 2 Long columns at the
    // reference's smallest/middle/largest CI domain sizes, on both the
    // empty-df and 1-row-per-group datasets. The reference's CI budget for
    // the full sweep is 25 minutes; each shape here is one timed entry.
    val sweepResults: Map[String, Double] = {
      import org.apache.spark.sql.functions.col
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.exact.{ExactNum, Rational}
      import graft.measures.PureDPBudget
      import graft.measurements.{Aggregations, NoiseKind}
      import graft.metrics.SymmetricDifference
      Seq(100, 10000, 640000).flatMap { n =>
        Seq(false, true).map { empty =>
          val name = s"q_countsum_${n}g${if (empty) "_empty" else ""}"
          val t0 = System.nanoTime()
          try {
            val keys = spark.range(n.toLong).select(col("id").as("A"))
            val data = spark.range(if (empty) 0L else n.toLong)
              .select(col("id").as("A"), (col("id") % 97).as("X"))
            val dom = DataFrameDomain(
              Seq("A" -> ColumnDescriptor.long, "X" -> ColumnDescriptor.long))
            val mCount = Aggregations.createCountMeasurement(
              dom, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
              PureDPBudget(ExactNum(1)), Some(keys))
            mCount(data).asInstanceOf[org.apache.spark.sql.DataFrame].count()
            val mSum = Aggregations.createSumMeasurement(
              dom, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
              PureDPBudget(ExactNum(1)), "X", Rational(0), Rational(97),
              Some(keys))
            mSum(data).asInstanceOf[org.apache.spark.sql.DataFrame].count()
          } catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          name -> dt
        }
      }.toMap
    }
    // Reference quantile benchmark shape (benchmark/quantile.py, CI budget
    // 84 min for its sweep): per-group noisy median over many small groups
    // and few huge groups.
    val quantileSweep: Map[String, Double] = {
      import org.apache.spark.sql.functions.col
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.exact.{ExactNum, Rational}
      import graft.measures.PureDPBudget
      import graft.measurements.Aggregations
      import graft.metrics.SymmetricDifference
      Seq(("q_quantile_10000g", 10000, 10), ("q_quantile_10g", 10, 100000))
        .map { case (name, groups, perGroup) =>
          val t0 = System.nanoTime()
          try {
            val keys = spark.range(groups.toLong).select(col("id").as("A"))
            val data = spark.range(groups.toLong * perGroup)
              .select((col("id") % groups).as("A"), (col("id") % 97).cast("double").as("X"))
            val dom = DataFrameDomain(
              Seq("A" -> ColumnDescriptor.long, "X" -> ColumnDescriptor.double()))
            val m = Aggregations.createQuantileMeasurement(
              dom, SymmetricDifference, ExactNum(1), PureDPBudget(ExactNum(1)),
              "X", 0.5, 0.0, 97.0, keys, "median")
            m(data).asInstanceOf[org.apache.spark.sql.DataFrame].count()
          } catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          name -> dt
        }.toMap
    }
    // Private-join truncation under key skew (reference envelope
    // benchmark/private_join.py): 6.4M rows over 640k join keys, uniform
    // vs power-law (one key owning 10% of all rows). The two-phase salted
    // truncation must keep the skewed run within ~2× of the uniform one.
    val pjoinSweep: Map[String, Double] = {
      import org.apache.spark.sql.functions.{col, when}
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.transformations.{PrivateJoin, TruncationStrategy}
      Seq(("q_pjoin_uniform", false), ("q_pjoin_skew", true)).map {
        case (name, skew) =>
          val t0 = System.nanoTime()
          try {
            val groups = 640000L
            val key =
              if (skew) when(col("id") % 10 === 0, 0L).otherwise(col("id") % groups)
              else col("id") % groups
            val left = spark.range(groups * 10)
              .select(key.as("K"), (col("id") % 97).as("V"))
            val right = spark.range(groups)
              .select(col("id").as("K"), (col("id") % 7).as("W"))
            val domL = DataFrameDomain(
              Seq("K" -> ColumnDescriptor.long, "V" -> ColumnDescriptor.long))
            val domR = DataFrameDomain(
              Seq("K" -> ColumnDescriptor.long, "W" -> ColumnDescriptor.long))
            val pj = PrivateJoin(
              domL, domR, on = Seq("K"),
              leftStrategy = TruncationStrategy.Truncate, leftThreshold = 5,
              rightStrategy = TruncationStrategy.Truncate, rightThreshold = 5)
            pj(Map("left" -> left, "right" -> right))
              .asInstanceOf[org.apache.spark.sql.DataFrame].count()
          } catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          name -> dt
      }.toMap
    }
    val all = results.toMap ++ sweepResults ++ quantileSweep ++ pjoinSweep
    val qs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
