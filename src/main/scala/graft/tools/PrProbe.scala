package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase-level timing of the q_pagerank entry — attributes
  * its wall between edge derivation, the pageRank preamble (deg/nodes/ed
  * materialization) and the per-iteration cost, so a bench delta can be
  * blamed on a specific stage instead of the whole entry.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"rep $rep")
      def tab(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      val e0 = t("edge derivation plan") {
        val slots = spark.sparkContext.defaultParallelism
        def tp(n: String) = {
          val df = tab(n)
          if (df.rdd.getNumPartitions * 2 <= slots) df.repartition(slots) else df
        }
        tp("orders").join(tp("lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
          .distinct()
      }
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      t("edges noop count")(edges.queryExecution.toRdd.count())
      // phases of Graph.pageRank, inlined
      import org.apache.spark.storage.StorageLevel
      val parts = 32
      val e = edges.select(col("src"), col("dst"))
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val nodes = t("nodes distinct+persist") {
        val n = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id")))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        n.count()
        n
      }
      val nCnt = nodes.count()
      val ed = t("ed join+repartition+persist") {
        val x = e.join(deg, "src").repartition(parts, col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        x.count()
        x
      }
      val teleport = (1.0 - 0.85) / nCnt
      var rank = nodes.withColumn("r", lit(1.0 / nCnt))
      var prev: org.apache.spark.sql.DataFrame = null
      for (i <- 1 to 3) {
        t(s"iteration $i") {
          val contrib = ed.join(rank, ed("src") === rank("id"))
            .groupBy(ed("dst").as("id"))
            .agg(sum(col("r") / col("outdeg")).as("c"))
          val raw = lit(teleport) + lit(0.85) * coalesce(col("c"), lit(0.0))
          val next = nodes.join(contrib, Seq("id"), "left")
            .select(col("id"), round(raw, 9).as("r"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count(): Unit
          if (prev != null) prev.unpersist()
          prev = next
          rank = next
        }
      }
      t("final consume")(rank.queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
