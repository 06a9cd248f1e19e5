package graft

import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.measures._
import graft.measurements._
import graft.metrics._
import graft.transformations._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each entry in [[queries]] exercises one operator of the engine (SURVEY §2
  * inventory + scale extensions) against the driver-generated parquet
  * fixtures; the matching [[oracleSql]] is ANSI SQL run by DuckDB over the
  * same files. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing). Noisy
  * measurements are exercised on their deterministic infinite-budget path
  * (noise scale 0); the statistical behavior of the noisy paths is covered
  * by the ScalaTest suites.
  */
object SparkEntry {

  // Memoized per (session, path): spark.read.parquet re-lists files and
  // re-reads footers on every call (~100 ms); the logical plan is immutable
  // and safely shared across queries in the same session.
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.computeIfAbsent(
      (spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  /** `t` plus a conditional rebalance for entries whose heavy per-row work
    * (shingling, hashing, vector math, pair explosion) is MAP-SIDE of the
    * first shuffle: a single-row-group parquet file scans as ONE partition
    * — parquet cannot split inside a row group — which serializes that
    * whole stage on one core (the driver fixtures are single-row-group;
    * q_minhash_states measured 4.4 s single-threaded vs 1.4 s spread). The
    * exchange is only inserted when the scan cannot feed half the
    * cluster's slots; at real input sizes (thousands of row groups) this
    * is a no-op, so the rebalance never costs a shuffle at scale.
    */
  private[graft] def tp(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    // RCA hook: SPARK_GRAFT_NO_TP=1 measures an entry without the
    // rebalance, to attribute toy-scale cost of the exchange in bench
    // regression analyses. Never set by the driver.
    if (sys.env.contains("SPARK_GRAFT_NO_TP")) return df
    val slots = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= slots) df.repartition(slots) else df
  }

  /** Deterministic messy URL per document row — the fixture for the
    * UrlOps entries. Mixes upper/lower case, default and explicit ports,
    * empty paths, tracking parameters, and fragments so every
    * normalization rule fires; the modular structure (period 60 in
    * doc_id, joint with the 20 sources) yields ~8× canonical-URL
    * duplication at sf0.01 for the dedup entry. The oracle SQL builds
    * the identical string in DuckDB.
    */
  private def docUrl: Column = {
    val id = col("doc_id")
    val scheme = when(id % 3 === 0, lit("HTTP")).otherwise(lit("https"))
    val host = when(id % 2 === 0, concat(upper(col("source")), lit(".CO.UK")))
      .otherwise(concat(col("source"), lit(".example.com")))
    val port = when(id % 4 === 0, lit(":443"))
      .when(id % 4 === 1, lit(":80"))
      .when(id % 4 === 2, lit(":8080"))
      .otherwise(lit(""))
    val path = when(id % 5 === 0, lit(""))
      .otherwise(concat(lit("/docs/"), (id % 10).cast("string")))
    val query = concat(lit("?utm_source=feed&b="), (id % 2).cast("string"),
      lit("&a="), (id % 3).cast("string"))
    val frag = when(id % 2 === 1, lit("#sec")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** Deterministic crawled-HTML page per document row — the fixture for
    * the Extraction entries. Exercises every strip rule: script blocks
    * (with `<` and `{` inside), style blocks, multi-line comments, the
    * five named entities plus `&amp;`-last ordering, mixed-case
    * attribute quoting, absolute links with tracking params and an
    * entity-encoded `&`, and a relative link for the reject lane. The
    * oracle SQL builds the identical string in DuckDB.
    */
  private def docHtml: Column = {
    val id = col("doc_id")
    val sc = when(id % 2 === 0,
      lit("<script type=\"text/javascript\">if (1 < 2) { track(); }</script>"))
      .otherwise(lit(""))
    val st = when(id % 3 === 0, lit("<style>p { color: #333; }</style>"))
      .otherwise(lit(""))
    val cm = when(id % 4 === 0, lit("<!-- render\nhint -->")).otherwise(lit(""))
    val a1 = concat(lit("<a href=\"https://site"), (id % 7).cast("string"),
      lit(".co.uk/p/"), ((id * 3) % 11).cast("string"), lit("\">more</a>"))
    val a2 = concat(lit("<a HREF=\"HTTP://News"), (id % 5).cast("string"),
      lit(".example.com:80/a?utm_source=x&amp;id="), (id % 4).cast("string"),
      lit("\">news</a>"))
    val a3 = when(id % 3 === 1, lit("<a href=\"/relative/skip\">rel</a>"))
      .otherwise(lit(""))
    concat(
      lit("<html><head><title> Doc "), id.cast("string"),
      lit(" &amp; notes </title>"), sc, st, lit("</head><body>"), cm,
      lit("<h1>Doc "), id.cast("string"), lit("</h1><p>"), col("text"),
      lit(" &lt;tagged&gt; &quot;quoted&quot; &#39;x&#39;&nbsp;end</p>"),
      a1, a2, a3, lit("</body></html>"))
  }

  /** Deterministic five-line page text per document row — the fixture
    * for the C4 boilerplate-filter entry. Line variants hit each rule:
    * always-kept prose, a too-short line, an enable-JavaScript banner,
    * a curly-brace code line (page-level drop), and a lorem-ipsum
    * filler line (kept at line level, drops the page). */
  private def docLines: Column = {
    val id = col("doc_id")
    val l1 = concat(lit("This document number "), id.cast("string"),
      lit(" begins with a proper sentence."))
    val l2 = lit("menu")
    val l3 = when(id % 3 === 0,
      lit("Please enable JavaScript to continue viewing."))
      .otherwise(lit("Another perfectly fine sentence follows here."))
    val l4 = when(id % 5 === 0, lit("function() { return 42; }"))
      .otherwise(lit("Does the final line end with a question?"))
    val l5 = when(id % 7 === 0, lit("Lorem ipsum dolor sit amet."))
      .otherwise(lit(""))
    concat_ws("\n", l1, l2, l3, l4, l5)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered.
    * Stateful streaming queries create one state-store instance per
    * shuffle partition PER stateful operator PER micro-batch (a
    * stream-stream join keeps four stores per partition), so at bench
    * state volumes (hundreds of keys) the session's 32 partitions are
    * almost entirely store-commit overhead. The override is scoped to the
    * entry and restored afterwards; checkpoints are recreated per run, so
    * the state partitioning is self-consistent. At real state volumes the
    * session default (or a larger explicit setting) governs — this knob
    * sizes state partitions to state, the same decision a production job
    * makes via config.
    */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body
    finally s.conf.set(key, old)
  }

  private def dom(df: DataFrame): DataFrameDomain =
    DataFrameDomain.fromSparkSchema(df.schema)

  private def oneRow(spark: SparkSession, name: String, v: Any): DataFrame = {
    val (dt, value) = v match {
      case l: Long   => (LongType, l)
      case d: Double => (DoubleType, d)
      case other     => (StringType, String.valueOf(other))
    }
    spark.createDataFrame(
      java.util.List.of(Row(value)),
      StructType(Seq(StructField(name, dt, nullable = false)))
    )
  }

  private def keysDf(
      spark: SparkSession,
      cols: Seq[String],
      rows: Seq[Seq[Any]]
  ): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(cols.map(c => StructField(c, StringType, true)))
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  /** (l_returnflag, l_linestatus) key table incl. a combination absent from
    * the data ("X","Y") — group-complete aggregation must emit it with the
    * fill value.
    */
  private def rfLsKeys(spark: SparkSession): DataFrame =
    keysDf(
      spark,
      Seq("l_returnflag", "l_linestatus"),
      Seq(
        Seq("A", "F"), Seq("N", "F"), Seq("N", "O"), Seq("R", "F"),
        Seq("X", "Y")
      )
    )

  private val rfLsKeysSql =
    "(VALUES ('A','F'),('N','F'),('N','O'),('R','F'),('X','Y')) AS ks(l_returnflag, l_linestatus)"

  private val inf = PureDPBudget(ExactNum.PosInf)
  private val infRho = RhoZCDPBudget(ExactNum.PosInf)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- plain relational (Spark SQL surface) ----------
    "q1_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          count(lit(1)).as("count_order")
        )
    },

    "q3_revenue" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
    },
    "q5_nation_revenue" -> { (s, dir) =>
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
    },
    "q6_discount_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"))
    },
    "q18_large_orders" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 150)
      val o = t(s, dir, "orders")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("qty"), 2).as("qty"))
    },

    // ---------- §2.1 row-level transformations ----------
    "q_filter" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val op = Filter(dom(li), SymmetricDifference,
        "l_quantity > 25 AND l_discount < 0.05")
      op(li).asInstanceOf[DataFrame]
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"))
    },
    "q_select" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val op = Select(dom(c), SymmetricDifference,
        Seq("c_custkey", "c_mktsegment"))
      op(c).asInstanceOf[DataFrame]
    },
    "q_rename" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val op = Rename(dom(c), SymmetricDifference,
        Map("c_custkey" -> "id", "c_mktsegment" -> "segment"))
      op(c).asInstanceOf[DataFrame].select(col("id"), col("segment"))
    },
    "q_map" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      val inDom = dom(li)
      val outDom = DataFrameDomain(Seq(
        "revenue" -> ColumnDescriptor.double(allowNull = true)))
      val rt = RowToRowTransformation(inDom, outDom,
        r => Row(r.getDouble(2) * (1.0 - r.getDouble(3))),
        augment = true)
      val op = MapTransformation(SymmetricDifference, rt)
      op(li).asInstanceOf[DataFrame]
        .select("l_orderkey", "l_linenumber", "revenue")
    },
    "q_flatmap" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val inDom = dom(o)
      val outDom = DataFrameDomain(Seq(
        "g" -> ColumnDescriptor(LongType, allowNull = true)))
      val rt = RowToRowsTransformation(inDom, outDom,
        r => (1L to (1L + r.getLong(0) % 3)).map(g => Row(g)),
        augment = true)
      val op = FlatMapTransformation(SymmetricDifference, rt, maxNumRows = Some(2))
      op(o).asInstanceOf[DataFrame]
    },
    "q_flatmap_bykey" -> { (s, dir) =>
      // per-order running index over sorted line numbers
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber")
      val inDom = dom(li)
      val outDom = DataFrameDomain(Seq(
        "l_orderkey" -> inDom("l_orderkey"),
        "n_lines" -> ColumnDescriptor(LongType, allowNull = true)))
      val rt = RowsToRowsTransformation(inDom, outDom,
        rows => Seq(Row(rows.head.getLong(0), rows.size.toLong)))
      val op = FlatMapByKey(IfGroupedBy("l_orderkey", SymmetricDifference), rt)
      op(li).asInstanceOf[DataFrame]
    },
    "q_dropnulls" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value")).as("value"))
      val op = DropNulls(dom(e), SymmetricDifference, Seq("value"))
      op(e).asInstanceOf[DataFrame]
    },
    "q_replacenulls" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value")).as("value"))
      val op = ReplaceNulls(dom(e), SymmetricDifference, Map("value" -> -1.0d))
      op(e).asInstanceOf[DataFrame]
    },
    "q_dropnans" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value"))
            .otherwise(lit(Double.NaN)).as("value"))
      val op = DropNaNs(dom(e), SymmetricDifference, Seq("value"))
      op(e).asInstanceOf[DataFrame]
    },
    "q_replacenans" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value"))
            .otherwise(lit(Double.NaN)).as("value"))
      val op = ReplaceNaNs(dom(e), SymmetricDifference, Map("value" -> -1.0d))
      op(e).asInstanceOf[DataFrame]
    },
    "q_dropinfs" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value"))
            .otherwise(lit(Double.PositiveInfinity)).as("value"))
      val op = DropInfs(dom(e), SymmetricDifference, Seq("value"))
      op(e).asInstanceOf[DataFrame]
    },
    "q_replaceinfs" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 100.0, col("value"))
            .otherwise(lit(Double.PositiveInfinity)).as("value"))
      val op = ReplaceInfs(dom(e), SymmetricDifference,
        Map("value" -> ((-999.0d, 999.0d))))
      op(e).asInstanceOf[DataFrame]
    },

    // ---------- §2.2 groupby + aggregations ----------
    "q_count" -> { (s, dir) =>
      val op = Count(dom(t(s, dir, "lineitem")), SymmetricDifference)
      oneRow(s, "count", op(t(s, dir, "lineitem")).asInstanceOf[Long])
    },
    "q_count_distinct" -> { (s, dir) =>
      val df = t(s, dir, "orders").select("o_orderstatus", "o_orderpriority")
      val op = CountDistinct(dom(df), SymmetricDifference)
      oneRow(s, "count", op(df).asInstanceOf[Long])
    },
    "q_sum_clipped" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_quantity")
      val op = Sum(dom2(li), SymmetricDifference, "l_quantity",
        Rational(5), Rational(30))
      oneRow(s, "sum", op(li).asInstanceOf[Double])
    },
    "q_groupby_count" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
      val gb = GroupBy(dom(li), SymmetricDifference, useL2 = false, rfLsKeys(s))
      val cnt = CountGrouped(
        gb.outputDomain.asInstanceOf[GroupedDataFrameDomain],
        gb.outputMetric, "count")
      (gb | cnt)(li).asInstanceOf[DataFrame]
    },
    "q_groupby_sum" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
      val gb = GroupBy(dom2(li), SymmetricDifference, useL2 = false, rfLsKeys(s))
      val sm = SumGrouped(
        gb.outputDomain.asInstanceOf[GroupedDataFrameDomain],
        gb.outputMetric, "l_quantity", Rational(5), Rational(30), "sum")
      (gb | sm)(li).asInstanceOf[DataFrame]
        .withColumn("sum", round(col("sum"), 4))
    },
    "q_groupby_domains" -> { (s, dir) =>
      // key table = Cartesian product of declared per-column domains
      // (reference groupby.py:212-302); 5 segments x 25 nations = 125 keys
      val c = t(s, dir, "customer").select("c_mktsegment", "c_nationkey")
      val keys = GroupedDataFrame.keysFromColumnDomains(s, Seq(
        "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"),
        "c_nationkey" -> (0 until 25).map(i => i: Any)
      ))
      val gb = GroupBy(dom(c), SymmetricDifference, useL2 = false, keys)
      val cnt = CountGrouped(
        gb.outputDomain.asInstanceOf[GroupedDataFrameDomain],
        gb.outputMetric, "count")
      (gb | cnt)(c).asInstanceOf[DataFrame]
    },
    "q_count_distinct_grouped" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderstatus", "o_orderpriority")
      val keys = keysDf(s, Seq("o_orderstatus"),
        Seq(Seq("F"), Seq("O"), Seq("P"), Seq("Z")))
      val gb = GroupBy(dom(o), SymmetricDifference, useL2 = false, keys)
      val cnt = CountDistinctGrouped(
        gb.outputDomain.asInstanceOf[GroupedDataFrameDomain],
        gb.outputMetric, "count")
      (gb | cnt)(o).asInstanceOf[DataFrame]
    },

    // ---------- §2.3 joins ----------
    "q_public_join" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("o_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val op = PublicJoin(dom(o), SymmetricDifference, c, Seq("o_custkey"))
      op(o).asInstanceOf[DataFrame]
    },
    "q_public_join_left" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val big = t(s, dir, "customer")
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val op = PublicJoin(dom(o), SymmetricDifference, big, Seq("o_custkey"), how = "left")
      op(o).asInstanceOf[DataFrame]
    },
    "q_join_nullsafe" -> { (s, dir) =>
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_custkey") % 7 === 0, null).otherwise(col("o_custkey")).as("k"))
      val c = t(s, dir, "customer").select(
        when(col("c_custkey") % 7 === 0, null).otherwise(col("c_custkey")).as("k"),
        col("c_nationkey"))
      JoinKernel.join(o, c, Seq("k"), "inner", nullsAreEqual = true)
    },
    "q_private_join" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_custkey", "o_orderkey")
        .withColumnRenamed("o_custkey", "custkey")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val op = PrivateJoin(
        dom(o), dom(l), "left", "right", Seq("o_orderkey"),
        TruncationStrategy.Truncate, 2, TruncationStrategy.Truncate, 3)
      op(Map("left" -> o, "right" -> l)).asInstanceOf[DataFrame]
    },

    // ---------- §2.4 truncation ----------
    "q_truncate_rows" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_custkey", "o_orderkey")
      val op = LimitRowsPerGroup(dom(o), "o_custkey", 2)
      op(o).asInstanceOf[DataFrame]
    },
    "q_drop_large_groups" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_custkey", "o_orderkey")
      Truncation.dropLargeGroups(o, Seq("o_custkey"), 10)
    },
    "q_limit_keys" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_suppkey", "l_orderkey")
      val op = LimitKeysPerGroup(dom(li), "l_suppkey", "l_orderkey", 5, useL2 = false)
      op(li).asInstanceOf[DataFrame]
    },

    // ---------- §2.5/2.6 measurements (deterministic ∞-budget path) ----------
    "q_noisy_count" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
      val m = Aggregations.createCountMeasurement(
        dom(li), SymmetricDifference, NoiseKind.Geometric,
        ExactNum(1), inf, Some(rfLsKeys(s)))
      m(li).asInstanceOf[DataFrame]
    },
    "q_noisy_sum" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
      val m = Aggregations.createSumMeasurement(
        dom2(li), SymmetricDifference, NoiseKind.Laplace,
        ExactNum(1), inf, "l_quantity", Rational(0), Rational(50),
        Some(rfLsKeys(s)))
      m(li).asInstanceOf[DataFrame].withColumn("sum", round(col("sum"), 4))
    },
    "q_noisy_avg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
      val m = Aggregations.createAverageMeasurement(
        dom2(li), SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
        ExactNum(1), inf, "l_quantity", Rational(1), Rational(50),
        Some(rfLsKeys(s)))
      m(li).asInstanceOf[DataFrame]
        .withColumn("average", round(col("average"), 6))
    },
    "q_noisy_var" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
      val m = Aggregations.createVarianceMeasurement(
        dom2(li), SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
        ExactNum(1), inf, "l_quantity", Rational(1), Rational(50),
        Some(rfLsKeys(s)))
      m(li).asInstanceOf[DataFrame]
        .withColumn("variance", round(col("variance"), 6))
    },
    "q_noisy_stddev" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
      val m = Aggregations.createVarianceMeasurement(
        dom2(li), SymmetricDifference, NoiseKind.Laplace, NoiseKind.Geometric,
        ExactNum(1), inf, "l_quantity", Rational(1), Rational(50),
        Some(rfLsKeys(s)), outputColumn = "stddev", stddev = true)
      m(li).asInstanceOf[DataFrame]
        .withColumn("stddev", round(col("stddev"), 6))
    },
    // ---------- SQL surface (GraftExtensions; deterministic scale-0 path) ----------
    "q_sql_dp" -> { (s, dir) =>
      // The one user-facing entry point not reachable through the factory
      // layer: SQL text → injected function builders → the codegen'd
      // AddNoise expression. Scale 0 adds no noise, so DuckDB can replay
      // the clip/aggregate/recombine arithmetic literally.
      graft.plans.GraftFunctions.register(s)
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .createOrReplaceTempView("lineitem_sql_dp")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               dp_count('geometric', 0.0) AS noisy_count,
               dp_count_distinct(l_quantity, 'geometric', 0.0)
                 AS noisy_distinct,
               dp_noise(count(*), 'geometric', 0.0) AS noise_passthrough,
               round(dp_sum(l_quantity, 0.0, 50.0, 'laplace', 0.0), 4)
                 AS noisy_sum,
               round(dp_avg(l_quantity, 1.0, 50.0,
                            'laplace', 0.0, 'geometric', 0.0), 6) AS noisy_avg,
               round(dp_var(l_quantity, 1.0, 50.0, 'laplace', 0.0,
                            'laplace', 0.0, 'geometric', 0.0), 6) AS noisy_var,
               round(dp_stddev(l_quantity, 1.0, 50.0, 'laplace', 0.0,
                            'laplace', 0.0, 'geometric', 0.0), 6) AS noisy_stddev
        FROM lineitem_sql_dp
        GROUP BY l_returnflag, l_linestatus
      """)
    },
    "q_sql_quantile" -> { (s, dir) =>
      // dp_quantile's infinite-epsilon path is the deterministic
      // interpolated quantile over clipped values, which DuckDB's
      // quantile_cont replays exactly; q ∈ {.25,.5,.75} keeps every
      // interpolation fraction binary-exact in both engines
      graft.plans.GraftFunctions.register(s)
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .createOrReplaceTempView("lineitem_sql_q")
      s.sql("""
        SELECT l_returnflag,
               round(dp_quantile(l_quantity, 0.25, 1.0, 50.0,
                                 cast('Infinity' as double)), 6) AS p25,
               round(dp_quantile(l_quantity, 0.5, 1.0, 50.0,
                                 cast('Infinity' as double)), 6) AS p50,
               round(dp_quantile(l_quantity, 0.75, 1.0, 50.0,
                                 cast('Infinity' as double)), 6) AS p75
        FROM lineitem_sql_q
        GROUP BY l_returnflag
      """)
    },

    "q_quantile" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_quantity")
      val keys = keysDf(s, Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")))
      val m = Aggregations.createQuantileMeasurement(
        dom2(li), SymmetricDifference, ExactNum(1), inf,
        "l_quantity", 0.5, 1.0, 50.0, keys, "median")
      m(li).asInstanceOf[DataFrame]
        .withColumn("median", round(col("median"), 6))
    },
    "q_quantile_sketch" -> { (s, dir) =>
      // histogram-backed quantile over a fixed equal-width grid — the
      // noise-free path interpolates deterministically, so DuckDB replicates
      // the binning + interpolation exactly
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_quantity")
      val keys = keysDf(s, Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")))
      val gdom = GroupedDataFrameDomain(
        Seq("l_returnflag" -> ColumnDescriptor.string(true),
          "l_quantity" -> ColumnDescriptor.double()),
        Seq("l_returnflag"))
      val m = NoisyQuantileSketch(gdom, SumOf(SymmetricDifference),
        "l_quantity", 0.5, 1.0, 50.0, None, PureDP, numBins = 64, "median")
      m(GroupedDataFrame(li, keys)).asInstanceOf[DataFrame]
        .withColumn("median", round(col("median"), 6))
    },
    "q_agg_by_column" -> { (s, dir) =>
      // the AggregateByColumn combinator: per-group median AND count in ONE
      // keyed pass — two series measurements composed sequentially, group-
      // complete against a key table with one absent key ('refund')
      val e = t(s, dir, "events").select(
        col("event_type"), col("value").as("v_med"), col("value").as("v_n"))
      val keys = keysDf(s, Seq("event_type"),
        Seq(Seq("click"), Seq("error"), Seq("purchase"), Seq("refund"),
          Seq("signup"), Seq("view")))
      val gdom = GroupedDataFrameDomain(
        Seq("event_type" -> ColumnDescriptor.string(true),
          "v_med" -> ColumnDescriptor.double(),
          "v_n" -> ColumnDescriptor.double()),
        Seq("event_type"))
      val m = AggregateByColumn(gdom, SumOf(SymmetricDifference), Seq(
        "v_med" -> NoisyQuantileSeries(0.5, 0.0, 400.0, None),
        "v_n" -> NoisyCountSeries(None)))
      m(GroupedDataFrame(e, keys)).asInstanceOf[DataFrame]
        .withColumn("v_med", round(col("v_med"), 6))
    },
    "q_partition_selection" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id").cast(LongType))
      val m = GeometricPartitionSelection(dom(e), Rational.zero, 5L)
      m(e).asInstanceOf[DataFrame]
    },
    "q_sql_partition" -> { (s, dir) =>
      // dp_partition_count at alpha=0 is the deterministic release path:
      // count if >= threshold, NULL (filtered) otherwise — the SQL face of
      // the q_partition_selection fixture
      graft.plans.GraftFunctions.register(s)
      t(s, dir, "events").select(col("user_id").cast(LongType))
        .createOrReplaceTempView("events_sql_ps")
      s.sql("""
        SELECT user_id, dp_partition_count(0.0, 5) AS count
        FROM events_sql_ps GROUP BY user_id
        HAVING count IS NOT NULL
      """)
    },

    // ---------- scale extensions: text analysis ----------
    "q_dedup_exact" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      graft.ops.Dedup.exact(d, Seq("text"), "doc_id")
        .select("doc_id", "text")
    },
    "q_token_count" -> { (s, dir) =>
      graft.ops.TextAnalysis.tokenCount(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens")
    },
    "q_url_normalize" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), docUrl.as("url"))
      d.select(col("doc_id"), col("url"),
        graft.ops.UrlOps.normalizeUrl(col("url")).as("canon"))
    },
    "q_url_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), docUrl.as("url"))
      graft.ops.UrlOps.dedupByUrl(d, "url", "doc_id").select("doc_id")
    },
    "q_host_agg" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), docUrl.as("url"), col("n_chars"))
      graft.ops.UrlOps.hostAggregate(d, "url", "n_chars")
        .select(col("domain"), col("n_pages"), col("n_urls"),
          round(col("mean_quality"), 6).as("mean_quality"))
    },
    "q_host_agg_psl" -> { (s, dir) =>
      // data-driven eTLD+1 at full PSL width: the same host rollup, but
      // grouping by the longest match against the bundled ~9.5k-rule
      // Public Suffix List (loadPsl). A slice of the corpus is rehosted
      // under a wildcard rule (*.ck -> web.<source>.ck stays whole) and
      // an exception rule (!www.ck -> sub.www.ck rolls to www.ck) so all
      // three PSL rule kinds are live in the entry, not just unit-tested.
      val psl = graft.ops.UrlOps.loadPsl(s)
      val id = col("doc_id")
      val host = when(id % 7 === 3,
        concat(lit("web."), col("source"), lit(".ck")))
        .when(id % 11 === 5, lit("sub.www.ck"))
        .otherwise(graft.ops.UrlOps.hostOf(docUrl))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), host.as("host"),
          graft.ops.UrlOps.normalizeUrl(docUrl).as("canon"),
          col("n_chars"))
      graft.ops.UrlOps.registrableDomainPsl(d, "host", psl)
        .filter(col("domain").isNotNull)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_pages"),
          countDistinct(col("canon")).as("n_urls"),
          avg(col("n_chars").cast("double")).as("__mq"))
        .select(col("domain"), col("n_pages"), col("n_urls"),
          round(col("__mq"), 6).as("mean_quality"))
    },
    "q_html_strip" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), docHtml.as("html"))
      d.select(col("doc_id"),
        graft.ops.Extraction.extractTitle(col("html")).as("title"),
        graft.ops.Extraction.stripHtml(col("html")).as("text_clean"))
    },
    "q_extract_links" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), docHtml.as("html"))
      graft.ops.Extraction.extractLinks(d, "doc_id", "html")
    },
    "q_link_domains" -> { (s, dir) =>
      // extraction -> URL hygiene -> host rollup: the in-link table a
      // host-curation pass thresholds. Relative links normalize to NULL
      // and are excluded (the reject lane).
      val d = t(s, dir, "documents").select(col("doc_id"), docHtml.as("html"))
      val links = graft.ops.Extraction.extractLinks(d, "doc_id", "html")
      val canon = graft.ops.UrlOps.normalizeUrl(col("link"))
      links
        .select(col("doc_id"),
          graft.ops.UrlOps.registrableDomain(
            graft.ops.UrlOps.hostOf(col("link"))).as("domain"),
          canon.as("canon"))
        // domain != '' already implies the URL parsed (unparsable rows get
        // host "" and so domain ""), and countDistinct skips NULLs — an
        // explicit canon.isNotNull here would be pushed below the Project
        // and evaluate the whole normalization kernel a SECOND time per
        // link row (NormalizeUrlExpr is opaque to the isnotnull
        // simplifier, unlike the old when()-shaped column)
        .filter(col("domain") =!= "")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_links"),
          countDistinct(col("canon")).as("n_targets"),
          countDistinct(col("doc_id")).as("n_sources"))
    },
    "q_c4_filter" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), docLines.as("text"))
      graft.ops.Extraction.boilerplateFilter(d, "doc_id", "text")
    },
    "q_gopher_filter" -> { (s, dir) =>
      // Gopher A1.1 rules at paper defaults over a mixed fixture: the raw
      // text plus deterministic bullet / ellipsis / hashtag line variants
      // keyed off doc_id, so every signal varies at sf0.01 (62/500 pass).
      // concat (not concat_ws) so NULL propagation matches the oracle's ||
      val id = col("doc_id")
      val mixed = t(s, dir, "documents").select(id,
        concat(col("text"), lit("\n"),
          when(id % 4 === 0,
            lit("-first bullet line\n-second bullet line"))
            .otherwise(lit("A plain closing line.")), lit("\n"),
          when(id % 5 === 0, lit("to be continued..."))
            .otherwise(lit("The end is here.")), lit("\n"),
          when(id % 6 === 0, lit("#tag #spam ### extra"))
            .otherwise(lit("clean"))).as("text"))
      graft.ops.TextAnalysis.gopherFilter(mixed, "doc_id", "text")
        .select(col("doc_id"), col("n_words"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          round(col("symbol_ratio"), 6).as("symbol_ratio"),
          round(col("bullet_frac"), 6).as("bullet_frac"),
          round(col("ellipsis_frac"), 6).as("ellipsis_frac"),
          round(col("alpha_frac"), 6).as("alpha_frac"),
          col("stop_hits"), col("gopher_ok"))
    },
    "q_fingerprint" -> { (s, dir) =>
      graft.ops.TextAnalysis.fingerprint(t(s, dir, "documents"), "text")
        .select("doc_id", "fingerprint")
    },
    "q_quality" -> { (s, dir) =>
      graft.ops.TextAnalysis.qualityScore(t(s, dir, "documents"), "text")
        .select(col("doc_id"), round(col("quality"), 6).as("quality"))
    },
    "q_lang_id" -> { (s, dir) =>
      graft.ops.TextAnalysis.languageId(t(s, dir, "documents"), "text")
        .select("doc_id", "lang_pred")
    },
    "q_bigram_lm" -> { (s, dir) =>
      // corpus-trained add-one bigram LM, per-doc mean log-prob; the
      // per-doc sum folds terms in token order on BOTH engines, so
      // round(4) absorbs only the per-term ln() ulp differences
      graft.ops.TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), round(col("lm_score"), 4).as("lm_score"))
    },
    "q_bm25" -> { (s, dir) =>
      // BM25 top-5 per query; scores are integer ppm sums (order-free) and
      // the oracle SQL parenthesizes each double exactly as the operator.
      // Hash-stability guard bands (measured at sf0.01, pinned by the
      // "BM25 entry fixture preserves its ppm hash guard bands" suite
      // test): every per-term 1e6·idf·weight sits ≥4.3e-4 from a .5
      // rounding boundary, adjacent-rank score gaps are ≥88 ppm — a
      // fixture/tokenizer change eroding them fails the suite, not the
      // driver gate
      val qs = keysDf(s, Seq("query_id", "query_text"), Seq(
        Seq("q1", "Spark JOIN merge"),
        Seq("q2", "customer order value"),
        Seq("q3", "vector hash scan zzzabsent")))
      graft.ops.TextAnalysis.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text", qs, k = 5)
    },
    "q_composition" -> { (s, dir) =>
      // corpus mix report by source: counts, exact ppm shares, and
      // per-source entropy terms (the epoch-mix design input)
      graft.ops.TextAnalysis.corpusComposition(
        t(s, dir, "documents"), "source", "n_chars")
    },
    "q_tfidf" -> { (s, dir) =>
      // top-5 TF-IDF keywords per document; same ppm discipline as q_bm25
      // (one round per (doc, term), integer ranking afterwards)
      graft.ops.TextAnalysis.tfidfTopTerms(
        tp(s, dir, "documents"), "doc_id", "text", k = 5)
    },
    "q_cosine_text" -> { (s, dir) =>
      // exact all-pairs TF-IDF cosine join (lossless prefix filtering);
      // the oracle replays it brute-force — losslessness means the two
      // must agree pair-for-pair, cosine-for-cosine. The synthetic corpus
      // is pathologically self-similar (a shared small vocabulary puts
      // ~80% of ALL pairs above cosine 0.5), so the entry runs a 10%
      // doc_id slice — the suite's sf0.01 losslessness test covers the
      // full corpus
      graft.ops.Similarity.tfidfCosinePairs(
        tp(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text", threshold = 0.7)
    },
    "q_paragraph_dedup" -> { (s, dir) =>
      // plant a 7-way-shared paragraph plus a per-doc unique one: the
      // shared paragraph must survive only in the min doc_id of its class,
      // the unique one everywhere — DuckDB replays the construction
      // coalesce(text,'') on BOTH sides: concat_ws would silently skip a
      // null text (no separator) while DuckDB's || nulls the whole string;
      // pinning '' makes the fixture null-robust and engine-identical
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws("\n\n",
          coalesce(col("text"), lit("")),
          concat(lit("shared passage "), pmod(col("doc_id"), lit(7))),
          concat(lit("unique note "), col("doc_id"))).as("text"))
      graft.ops.Dedup.paragraphDedup(d, "doc_id", "text")
        .select("doc_id", "clean_text")
    },
    "q_pack_chunked" -> { (s, dir) =>
      // concat-and-split packing of the whole corpus into 4096-char bins,
      // in doc_id order — hierarchical prefix sums inside, a single window
      // cumsum in the oracle
      graft.ops.Pack.packChunked(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", budget = 4096L)
    },
    "q_pack_greedy" -> { (s, dir) =>
      // next-fit packing, 8 shards by doc_id % 8 — the oracle replays the
      // sequential scan as a recursive CTE per shard
      graft.ops.Pack.packGreedyNextFit(
        t(s, dir, "documents"), "doc_id", "n_chars",
        budget = 4096L, numShards = 8)
    },
    "q_pack_shuffled" -> { (s, dir) =>
      // epoch layout: portable SHA-256 shuffle rank, then concat-and-split
      // packing in shuffled order — DuckDB replays rank, order, and bins
      graft.ops.Pack.packChunkedShuffled(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", budget = 4096L, salt = 1L)
    },
    "q_write_shards" -> { (s, dir) =>
      // writeShards is side-effecting; this entry lifts it to a hard
      // signal (the q_dedup_stream pattern): pack greedily into per-shard
      // bins, write one file per (shard, bin) directory into a fresh temp
      // dir, then read the LAYOUT back — the file count per bin pins the
      // writer's one-file-per-directory contract, and the row-set hash is
      // the portable SHA-256 recipe DuckDB replays from the packing
      // recursion alone (no filesystem on the oracle side)
      val packed = graft.ops.Pack.packGreedyNextFit(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", budget = 4096L, numShards = 8)
      val out = java.nio.file.Files
        .createTempDirectory("graft_shards_").toString + "/epoch0"
      graft.ops.Pack.writeShards(
        packed.select(col("doc_id"),
          concat_ws("_", col("shard"), col("bin")).as("gbin")),
        "gbin", Seq("doc_id"), out)
      s.read.parquet(out)
        .withColumn("__f", input_file_name())
        .groupBy(col("gbin").cast("string").as("gbin"))
        .agg(
          countDistinct(col("__f")).as("n_files"),
          count(lit(1)).as("n_rows"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"),
          expr("bit_xor(cast(conv(substring(sha2(concat_ws('|', '0', " +
            "cast(doc_id as string)), 256), 1, 15), 16, 10) as bigint))")
            .as("row_hash"))
    },
    "q_dedup_batch" -> { (s, dir) =>
      // incremental ingestion: docs split 7/3 into corpus/batch by id; every
      // third batch doc is replaced by a CASE-SHIFTED copy of its corpus
      // partner (id rounded down to a multiple of 10), so its lowercased
      // shingle set equals the original's. At threshold 1.0 the admitted
      // set is the engine-independent equal-shingle-set relation, which
      // DuckDB replays literally (recall through the set-hash path is 1)
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 7)
        .select("doc_id", "text")
      val partner = corpus
        .select(col("doc_id").as("__pid"), col("text").as("__ptext"))
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 7)
        .join(partner,
          col("doc_id") - pmod(col("doc_id"), lit(10)) === col("__pid"), "left")
        .select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0 && col("__ptext").isNotNull,
            upper(col("__ptext"))).otherwise(col("text")).as("text"))
      graft.ops.Dedup.dedupNewBatch(
        batch, "doc_id", "text", corpus,
        shingleSize = 5, numHashes = 64, bands = 16, jaccardThreshold = 1.0)
        .select("doc_id")
    },
    "q_dedup_stream_corpus" -> { (s, dir) => withShufflePartitions(s, 8) {
      // batch path of the stream-vs-static-corpus ingestion dedup: same
      // 7/3 split; planted copies are whitespace+case shifted so their
      // normalized md5 fingerprints equal the corpus partner's
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 7)
        .select("doc_id", "text")
      val partner = corpus
        .select(col("doc_id").as("__pid"), col("text").as("__ptext"))
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 7)
        .join(partner,
          col("doc_id") - pmod(col("doc_id"), lit(10)) === col("__pid"), "left")
        .select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0 && col("__ptext").isNotNull,
            concat(lit("  "), upper(col("__ptext")))).otherwise(col("text"))
            .as("text"))
      graft.streaming.Streams
        .dedupStreamAgainstCorpus(batch, "text", corpus, "text")
        .select("doc_id")
    }},
    "q_mix_epochs" -> { (s, dir) =>
      // training-mix weighting: en 2.5 epochs, de 1.0, zh 1.2, others 0.5 —
      // integer part repeats every doc, the fractional remainder repeats
      // the portable-hash sub-sample once more; DuckDB replays the recipe
      graft.ops.Dedup.repeatByWeightPortable(
        t(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 25, "de" -> 10, "zh" -> 12), den = 10, defaultNum = 5)
        .select("doc_id", "lang", "epoch")
    },
    "q_corpus_stats" -> { (s, dir) =>
      // the data-card rollup per (source, lang); duplicates planted by
      // unioning a copy of every 25th doc under shifted ids
      val d = t(s, dir, "documents")
      val copies = d.filter(col("doc_id") % 25 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.ops.TextAnalysis
        .corpusStats(d.unionByName(copies), "doc_id", "text",
          Seq("source", "lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_dup_docs"), col("sum_quality_ppm"))
    },
    "q_pipeline_curate" -> { (s, dir) =>
      // the flagship curation chain: quality gate -> per-language
      // stratified sample -> epoch weighting -> shuffled packing; every
      // stage is the deterministic portable recipe, so DuckDB replays the
      // whole pipeline end-to-end
      val d = t(s, dir, "documents")
      val gated = graft.ops.TextAnalysis.qualityScore(d, "text")
        .filter(col("quality") >= 0.5)
      val sampled = graft.ops.Dedup.sampleByHashStratifiedPortable(
        gated, "doc_id", "lang", Map("en" -> 9, "de" -> 6), den = 10,
        defaultNum = 3)
      val mixed = graft.ops.Dedup.repeatByWeightPortable(
        sampled.select("doc_id", "lang", "n_chars"), "doc_id", "lang",
        Map("en" -> 15), den = 10, salt = 2L)
      // unique packing key per (doc, epoch): ids are far below 1e8
      val keyed = mixed.withColumn(
        "pack_id", col("doc_id") * 4 + col("epoch"))
      graft.ops.Pack.packChunkedShuffled(
        keyed.select("pack_id", "n_chars"), "pack_id", "n_chars",
        budget = 4096L, salt = 3L)
        .select("pack_id", "offset_global", "bin_start")
    },
    "q_semdedup" -> { (s, dir) =>
      // SemDeDup on the q_cosine_dup planted construction: collinear
      // copies assign to their original's k-means cell and every split
      // signature, so at threshold 0.95 (natural max cosine ~0.49) the
      // surviving set provably equals the global earlier-neighbor rule
      // DuckDB replays — independent of the clustering
      val e = tp(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e
        .filter(col("vec_id") % 40 === 0)
        .select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      graft.ops.Similarity.semDeDup(
        e.unionByName(planted), "vec_id", "embedding",
        threshold = 0.95, nlist = 0, refineIterations = 2)
        .select("vec_id")
    },
    "q_semdedup_probes" -> { (s, dir) =>
      // the multi-probe opt-in on the SAME provably-exact construction:
      // collinear duplicates collide in every bucket at any probes
      // setting and probing can only ADD exact-verified pairs, so the
      // survivor set must still equal the global earlier-neighbor rule —
      // this pins "no false drops, no lost exact dups" value-level
      // against DuckDB (recall on near-threshold geometry is measured
      // separately: SemDedupSplitRecallSpec + SCALING.md round 15)
      val e = tp(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e
        .filter(col("vec_id") % 40 === 0)
        .select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      graft.ops.Similarity.semDeDup(
        e.unionByName(planted), "vec_id", "embedding",
        threshold = 0.95, nlist = 0, refineIterations = 2, probes = 2)
        .select("vec_id")
    },
    "q_repetition" -> { (s, dir) =>
      // documents are single-line, so plant a repeated line plus a
      // 3-way-shared note to exercise the line-level signals; the token
      // n-gram signals are nontrivial on the natural word-soup text
      val d = tp(s, dir, "documents").select(
        col("doc_id"),
        concat_ws("\n",
          col("text"),
          lit("repeat me"), lit("repeat me"),
          concat(lit("note "), (col("doc_id") % 3).cast("string"))).as("text"))
      graft.ops.TextAnalysis.repetitionSignals(d, "text")
        .select(
          col("doc_id"),
          round(col("rep_dup_line_frac"), 6).as("rep_dup_line_frac"),
          round(col("rep_dup_line_char_frac"), 6).as("rep_dup_line_char_frac"),
          round(col("rep_top2_char_frac"), 6).as("rep_top2_char_frac"),
          round(col("rep_top3_char_frac"), 6).as("rep_top3_char_frac"),
          round(col("rep_dup5_char_frac"), 6).as("rep_dup5_char_frac"))
    },
    "q_prdp_transform" -> { (s, dir) =>
      // per-record DP mechanisms on the σ=0 noise-free path: every
      // transformation round-trips to the input value exactly
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        round(graft.ops.PerRecordDp.logTransformationMechanism(
          col("l_quantity"), 1.0, 0.0), 6).as("log_t"),
        round(graft.ops.PerRecordDp.squareRootTransformationMechanism(
          col("l_quantity"), 1.0, 0.0), 6).as("sqrt_t"),
        round(graft.ops.PerRecordDp.fourthRootTransformationMechanism(
          col("l_quantity"), 1.0, 0.0), 6).as("fourth_t"),
        round(graft.ops.PerRecordDp.squareRootGaussianMechanism(
          col("l_quantity"), 0.0), 6).as("sg_t"),
        round(graft.ops.PerRecordDp.exponentialPolylogarithmicMechanism(
          col("l_quantity"), 1.0, 4.0, 0.0), 6).as("ep_t"))
    },

    // ---------- scale extensions: similarity / dedup ----------
    "q_ann_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val queriesDf = e.filter(col("vec_id") < 5)
      graft.ops.Similarity.bruteForceTopK(
        queriesDf, e, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id")
    },
    "q_quantize" -> { (s, dir) =>
      // per-vector symmetric int8 quantization, exploded to scalar rows;
      // the floor(x·127/amax + 0.5) chain is a fixed IEEE expression both
      // engines evaluate identically
      val e = t(s, dir, "embeddings")
      graft.ops.Similarity.quantizeInt8(e, "embedding")
        .select(col("vec_id"), col("qscale"),
          posexplode(col("qvec")).as(Seq("pos", "qv")))
        .select(col("vec_id"), col("pos").cast("long").as("idx"),
          col("qv").cast("long").as("qval"), col("qscale"))
    },
    "q_quant_ann" -> { (s, dir) =>
      // top-3 neighbors ranked on the dequantized int8 dot product; qdot
      // is exact integer arithmetic so the ranking replays engine-free
      val e = t(s, dir, "embeddings")
      graft.ops.Similarity.quantizedTopK(
        e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id", "qdot")
    },
    "q_minhash_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      graft.ops.Dedup.minHashPairs(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
        .select("left_id", "right_id")
    },
    "q_minhash_staged" -> { (s, dir) =>
      // scratch-constrained staged mode (bandPasses > 1): result-identical
      // to q_minhash_dedup by construction (same hash family per band,
      // union over band groups, exact verify) — so it shares that entry's
      // exact-Jaccard oracle. 4 sequential passes of 4 bands each.
      val d = t(s, dir, "documents")
      graft.ops.Dedup.minHashPairs(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5,
        bandPasses = 4)
        .select("left_id", "right_id")
    },
    "q_dedup_cluster" -> { (s, dir) =>
      val d = tp(s, dir, "documents")
      graft.ops.Dedup.dropNearDuplicates(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
        .select("doc_id")
    },
    "q_decontaminate" -> { (s, dir) =>
      // benchmark decontamination: every 50th doc plays the benchmark set;
      // docs sharing an 8-gram with it (including the benchmark docs
      // themselves) are dropped from the training corpus
      val d = t(s, dir, "documents")
      val bench = d.filter(col("doc_id") % 50 === 0)
        .select(col("text").as("bench_text"))
      graft.ops.Dedup
        .dropContaminated(d, "doc_id", "text", bench, "bench_text", n = 8)
        .select("doc_id")
    },
    "q_decontaminate_fuzzy" -> { (s, dir) =>
      // near-dup eval-overlap removal at threshold 1.0: benchmark texts
      // are CASE-SHIFTED copies of every 50th doc, so their lowercased
      // shingle sets equal the originals' — recall through LSH is exactly
      // 1 (equal sets -> equal signatures in every band) and the flagged
      // set is the engine-independent equal-shingle-set relation DuckDB
      // replays literally
      val d = t(s, dir, "documents")
      val bench = d.filter(col("doc_id") % 50 === 0)
        .select(upper(col("text")).as("bench_text"))
      graft.ops.Dedup.contaminatedIdsFuzzy(
        d, "doc_id", "text", bench, "bench_text",
        shingleSize = 5, numHashes = 64, bands = 16, jaccardThreshold = 1.0)
        .select("doc_id")
    },
    "q_keep_best" -> { (s, dir) =>
      // quality-aware representative per near-dup cluster: same verified
      // LSH pairs + connected components as q_dedup_cluster, but the kept
      // doc maximizes the quality score (ties -> min doc_id)
      val d = t(s, dir, "documents")
      val scored = graft.ops.TextAnalysis.qualityScore(d, "text", "__q")
      val pairs = graft.ops.Dedup.minHashPairs(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
      val clusters = graft.ops.Dedup
        .duplicateClusters(d.select("doc_id"), pairs, "doc_id")
      graft.ops.Dedup.keepBestPerCluster(scored, clusters, "doc_id", "__q")
        .select("doc_id")
    },

    // ---------- §2.4 remaining: two-level truncation, partition, dict ----------
    "q_rows_per_key_per_group" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_suppkey", "l_returnflag")
      val op = LimitRowsPerKeyPerGroup(dom(li), "l_returnflag", "l_suppkey", 2)
      op(li).asInstanceOf[DataFrame]
    },
    "q_grouping_flatmap" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      val inDom = dom2(li)
      val outDom = DataFrameDomain(inDom.schema :+
        ("bucket" -> ColumnDescriptor.string()))
      val rt = RowToRowsTransformation(inDom, outDom,
        r => {
          val q = r.getDouble(2)
          val sized = if (q < 25.0) "lo" else "hi"
          Seq(Row(r.get(0), r.get(1), r.get(2), "all"),
              Row(r.get(0), r.get(1), r.get(2), sized),
              Row(r.get(0), r.get(1), r.get(2), "all")) // dup group dropped
        },
        augment = false)
      val op = GroupingFlatMap(RootSumOfSquared(SymmetricDifference), rt, 2)
      op(li).asInstanceOf[DataFrame].select("l_orderkey", "l_linenumber", "bucket")
    },
    "q_partition" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderstatus", "o_orderkey")
      val op = PartitionByKeys(dom(o), SymmetricDifference,
        Seq("o_orderstatus"), Seq(Seq("F"), Seq("O")))
      val parts = op(o).asInstanceOf[Seq[DataFrame]]
      parts.reduce(_ union _)
    },
    "q_dict_pipeline" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val d = dom(o)
      val pipeline =
        CreateDictFromValue(d, SymmetricDifference, "t") |
          TransformValue(
            DictDomain(Map("t" -> d)),
            DictMetric(Map("t" -> SymmetricDifference)),
            "t", "f",
            Filter(d, SymmetricDifference, "o_totalprice > 100000")) |
          GetValue(
            DictDomain(Map("t" -> d,
              "f" -> d)),
            DictMetric(Map("t" -> SymmetricDifference,
              "f" -> SymmetricDifference)),
            "f")
      pipeline(o).asInstanceOf[DataFrame]
    },
    "q_dict_multi" -> { (s, dir) =>
      // multi-value dict pipeline through the reference's factory surface:
      // fan one table into a dict, transform all values in place, rename a
      // key (dictionary.py:370-798)
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val d = dom(o)
      val keyOnly = DataFrameDomain(Seq("o_orderkey" -> d.schema.toMap.apply("o_orderkey")))
      val fan = Dict.createApplyDictOfTransformations(Seq(
        "hi" -> Filter(d, SymmetricDifference, "o_totalprice > 150000"),
        "lo" -> Filter(d, SymmetricDifference, "o_totalprice <= 150000")))
      val slim = Dict.createTransformAllValues(Seq(
        "hi" -> Select(d, SymmetricDifference, Seq("o_orderkey")),
        "lo" -> Select(d, SymmetricDifference, Seq("o_orderkey"))))
      val ren = Dict.createRename(
        DictDomain(Map("hi" -> keyOnly, "lo" -> keyOnly)),
        DictMetric(Map("hi" -> SymmetricDifference, "lo" -> SymmetricDifference)),
        "hi", "big")
      val out = (fan | slim | ren)(o).asInstanceOf[Map[String, DataFrame]]
      out("big").withColumn("bucket", lit("hi"))
        .unionByName(out("lo").withColumn("bucket", lit("lo")))
    },
    "q_private_join_onkey" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_orderkey"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_nationkey"))
      val dd = DictDomain(Map("orders" -> dom(o), "customer" -> dom(c)))
      val ark = AddRemoveKeys(Map("orders" -> "custkey", "customer" -> "custkey"))
      val op = PrivateJoinOnKey(dd, ark, "orders", "customer", "joined", Seq("custkey"))
      op(Map("orders" -> o, "customer" -> c))
        .asInstanceOf[Map[String, DataFrame]]("joined")
    },
    "q_noisy_count_total" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_returnflag")
      val m = Aggregations.createCountMeasurement(
        dom(li), SymmetricDifference, NoiseKind.Geometric, ExactNum(1), inf)
      oneRow(s, "count", m(li).asInstanceOf[Long])
    },
    "q_persist_identity" -> { (s, dir) =>
      val r = t(s, dir, "region")
      val d = dom(r)
      val chain = Persist(d, SymmetricDifference) |
        graft.core.Identity(d, SymmetricDifference) |
        SparkAction(d, SymmetricDifference) |
        Unpersist(d, SymmetricDifference)
      chain(r).asInstanceOf[DataFrame]
    },
    "q_bounds" -> { (s, dir) =>
      val e = t(s, dir, "events").select("event_type", "value")
      val m = Aggregations.createBoundsMeasurement(
        dom2(e), SymmetricDifference, ExactNum(1), inf, "value",
        Seq("event_type"))
      m(e).asInstanceOf[DataFrame]
    },
    "q_add_unique" -> { (s, dir) =>
      val n = t(s, dir, "nation").select("n_regionkey")
      val op = AddUniqueColumn(dom(n), "uid")
      op(n).asInstanceOf[DataFrame]
    },

    // ---------- streaming surface (unified batch path) ----------
    "q_window_counts" -> { (s, dir) =>
      val e = t(s, dir, "events").withColumn(
        "event_time",
        date_trunc("second", col("ts").cast("timestamp")))
      graft.streaming.Streams
        .windowedCounts(e, "event_time", Seq("event_type"), "1 hour")
        .select(
          col("window_start").cast(LongType).as("ws"),
          col("event_type"), col("count"))
    },

    "q_boilerplate" -> { (s, dir) =>
      // plant a corpus-wide footer plus a per-doc unique line: the footer's
      // doc frequency exceeds the threshold and must vanish, the unique
      // line must survive — verified against the DuckDB replica
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws("\n",
          col("text"),
          lit("All rights reserved. Cookie policy applies."),
          concat(lit("doc note "), col("doc_id"))).as("text"))
      graft.ops.Dedup
        .dropBoilerplateLines(d, "doc_id", "text", maxDocFreq = 10)
        .select("doc_id", "clean_text")
    },
    "q_redact_pii" -> { (s, dir) =>
      graft.ops.TextAnalysis
        .redactPii(t(s, dir, "documents"), "text")
        .select("doc_id", "redacted")
    },
    "q_sample_hash" -> { (s, dir) =>
      // deterministic 3/10 split by doc id — same rows on every run; the
      // portable (SHA-256 prefix) variant so DuckDB replays the exact hash
      graft.ops.Dedup
        .sampleByHashPortable(t(s, dir, "documents"), "doc_id", 3, 10)
        .select("doc_id")
    },
    "q_sample_stratified" -> { (s, dir) =>
      // training-mix curation: per-language keep rates over the same
      // portable hash (en 7/10, de 5/10, zh 2/10, others 1/10)
      graft.ops.Dedup.sampleByHashStratifiedPortable(
        t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 7, "de" -> 5, "zh" -> 2), den = 10, defaultNum = 1)
        .select("doc_id", "lang")
    },
    "q_top_per_source" -> { (s, dir) =>
      // per-source quality quota: keep the 5 longest docs per source,
      // ties -> smallest doc_id; deterministic, so DuckDB replays it as a
      // row_number window
      graft.transformations.Truncation.topKPerGroupByScore(
        t(s, dir, "documents"), Seq("source"), "n_chars", Seq("doc_id"), 5)
        .select("doc_id", "source", "n_chars")
    },
    "q_sessionize" -> { (s, dir) =>
      // unified batch path of the session-window aggregation
      val e = t(s, dir, "events").withColumn(
        "event_time",
        date_trunc("second", col("ts").cast("timestamp")))
      graft.streaming.Streams
        .sessionize(e, "event_time", "user_id", gap = "30 minutes")
        .select(
          col("user_id"),
          col("session_start").cast(LongType).as("ss"),
          col("events"))
    },
    "q_running_counts" -> { (s, dir) =>
      val e = t(s, dir, "events")
      graft.streaming.Streams.runningCounts(e, "event_type")
        .toDF("event_type", "cnt")
    },
    "q_interval_join" -> { (s, dir) =>
      // purchases joined to any same-user event within ±15 minutes
      val e = t(s, dir, "events").withColumn(
        "event_time",
        date_trunc("second", col("ts").cast("timestamp")))
      val l = e.select(col("user_id"), col("event_time").as("l_ts"),
        col("event_id").as("l_id"))
      val r = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_time").as("r_ts"),
          col("event_id").as("r_id"))
      graft.streaming.Streams
        .intervalJoin(l, r, "l_ts", "r_ts", Seq("user_id"), within = "15 minutes")
        .select(col("user_id"), col("l_id"), col("r_id"))
    },
    "q_asof_join" -> { (s, dir) =>
      // each click picks up the latest at-or-before purchase value of the
      // same user (events.ts is parquet timestamp[us]; unix_micros on the
      // UTC-session cast equals DuckDB's epoch_us exactly); unmatched
      // clicks survive with a null p_val
      val e = t(s, dir, "events")
      val l = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("lns"), col("event_id").as("l_id"))
      val r = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("rns"), col("value").as("p_val"))
      graft.ops.TimeSeries
        .asofJoin(l, r, "lns", "rns", Seq("user_id"), Seq("p_val"))
        .select(col("user_id"), col("l_id"), col("p_val"))
    },
    "q_profile" -> { (s, dir) =>
      graft.ops.Profile.describe(t(s, dir, "documents"))
    },
    "q_heavy_hitters" -> { (s, dir) =>
      // per-lang top sources via the mergeable Misra-Gries summary; the
      // corpus has 20 distinct sources per lang < k = 32, so the sketch is
      // provably on its exact path (no decrement ever fires) and the
      // counts replay as plain GROUP BY counts with count_min = count_max
      graft.ops.Sketches.heavyHittersBy(
        t(s, dir, "documents"), Seq("lang"), "source", k = 32)
    },
    "q_scd2" -> { (s, dir) =>
      // SCD Type-2 history of each user's coarse activity band; the band
      // is pure integer-cents arithmetic ((user_id, µs) is unique in the
      // fixture, so the dedup rule never has to break a tie)
      val e = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tsu"),
          expr("CAST(round(value * 100, 0) AS BIGINT) div 10000").as("band"))
      graft.ops.TimeSeries.buildHistory(e, "user_id", "tsu", Seq("band"))
    },
    "q_vocab" -> { (s, dir) =>
      // top-100 token vocabulary with cumulative corpus coverage; ranks
      // tie-break lexicographically so the cut is deterministic
      graft.ops.TextAnalysis.vocabulary(
        t(s, dir, "documents"), "doc_id", "text", topV = 100)
    },
    "q_corr_matrix" -> { (s, dir) =>
      // one-pass correlation matrix over fixed-point lineitem measures;
      // every moment sum is an exact DECIMAL(38,0) so the six pairwise
      // correlations are partition-order-free and replay in DuckDB from
      // HUGEINT sums
      graft.ops.Profile.corrMatrix(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        decimals = Map(
          "l_extendedprice" -> 2, "l_discount" -> 2, "l_tax" -> 2))
    },
    "q_corpus_diff" -> { (s, dir) =>
      // planted second snapshot: every 11th doc removed, every 7th
      // surviving doc edited, 20 new ids appended — the diff must label
      // each id exactly
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionAll(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
      graft.ops.Dedup.corpusDiff(d, next, "doc_id", "text")
    },
    "q_sample_k" -> { (s, dir) =>
      // fixed 7-doc budget per source, engine-reproducible from the
      // portable SHA-256-prefix rank
      graft.ops.Dedup.sampleKPerGroup(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", Seq("source"), k = 7)
    },
    "q_rolling" -> { (s, dir) =>
      // per-user trailing 1-hour event stats; the replayable sum is the
      // integer cents path (float window sums are frame-order-sensitive)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("ns"))
      graft.ops.TimeSeries
        .rollingAgg(e, "ns", Seq("user_id"), "value",
          window = 3600000000L)
        .select("user_id", "event_id", "roll_count", "roll_min", "roll_max",
          "roll_sum_c100")
    },
    "q_resample" -> { (s, dir) =>
      // per-user 6-hour grid over the event month with LOCF + linear
      // interpolation; per-bucket value = max integer cents (order-free),
      // interp = one fixed-shape IEEE expression over exact ints
      val e = t(s, dir, "events")
        .select(col("user_id"), col("value"), unix_micros(col("ts").cast("timestamp")).as("tsu"))
      graft.ops.TimeSeries
        .resample(e, "tsu", Seq("user_id"), "value",
          interval = 21600000000L)
    },
    "q_ewma" -> { (s, dir) =>
      // per-user EWMA (α=0.25, exact binary) truncated to 8 rows; the fold
      // is a fixed left-to-right chain of IEEE ops over a (ts, event_id)-
      // ordered frame, replayed in DuckDB by list() OVER + list_reduce
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("tsu"))
      graft.ops.TimeSeries
        .ewma(e, "tsu", Seq("user_id"), "value",
          alpha = 0.25, lookback = 8, tieCol = "event_id")
        .select("user_id", "event_id", "ewma")
    },
    "q_zscore" -> { (s, dir) =>
      // per-user trailing-16-row z-score; the anomaly decision is pure
      // integer arithmetic over exact cent sums — no float summation in
      // the flag, and z itself is replayable (correctly-rounded sqrt)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("tsu"))
      graft.ops.TimeSeries
        .rollingZScore(e, "tsu", Seq("user_id"), "value",
          window = 16, threshold = 3, tieCol = "event_id")
        .select("user_id", "event_id", "z", "is_anomaly")
    },
    "q_psi_drift" -> { (s, dir) =>
      // distribution drift between the even- and odd-event halves of
      // events.value: 20 bins on [0, 500) plus under/overflow; the
      // Laplace-smoothed shares make every bin's ln well-defined
      val e = t(s, dir, "events").select("event_id", "value")
      graft.ops.Profile.psiDrift(
        e.filter(col("event_id") % 2 === 0),
        e.filter(col("event_id") % 2 =!= 0),
        "value", lo = 0.0, hi = 500.0, bins = 20)
    },
    "q_psi_drift_cat" -> { (s, dir) =>
      // language-mix drift between document halves (categorical PSI)
      val d = t(s, dir, "documents").select("doc_id", "lang")
      graft.ops.Profile.psiDriftCategorical(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 =!= 0), "lang")
    },
    "q_mad_outliers" -> { (s, dir) =>
      // per-event-type robust outliers: discrete medians are actual data
      // values and the deviations single IEEE subtractions, so every
      // double here hashes bit-for-bit (no mean/stddev accumulation)
      graft.ops.Profile.madOutliers(
        t(s, dir, "events").select("event_id", "event_type", "value"),
        Seq("event_type"), "value", k = 3.0)
    },
    "q_range_join" -> { (s, dir) =>
      // every 97th event opens a 10-minute interval; the bucketed range
      // join emits each (event, interval) containment pair without ever
      // planning the O(L·R) theta-join
      val e = t(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("tsu"))
      val iv = e.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("interval_id"),
          col("tsu").as("t_start"),
          (col("tsu") + lit(600000000L)).as("t_end"))
      graft.ops.TimeSeries
        .rangeJoinBucketed(e, iv, "tsu", "t_start", "t_end",
          Nil, Seq("interval_id"), bucketWidth = 600000000L)
        .select("event_id", "interval_id")
    },
    "q_score_linear" -> { (s, dir) =>
      // hashed-linear classifier inference: integer weights from the
      // portable hash chain make score and label exact on any engine
      graft.ops.TextAnalysis.scoreHashedLinear(
        tp(s, dir, "documents").select("doc_id", "text"),
        "text", dim = 4096, range = 1000,
        bucketSalt = 3L, weightSalt = 7L)
        .select("doc_id", "score", "score_label")
    },
    "q_mix_temperature" -> { (s, dir) =>
      // T=2 source rebalancing: quota = min(n, max(1, round(3·√n))) per
      // source, members by portable SHA-256 rank — sqrt is correctly
      // rounded, so the whole mix replays in DuckDB
      graft.ops.Dedup.mixByTemperature(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", invTemp = 0.5, scale = 3.0, salt = 5L)
    },
    "q_chunk_docs" -> { (s, dir) =>
      graft.ops.TextAnalysis.chunkDocuments(
        t(s, dir, "documents"), "doc_id", "text",
        maxTokens = 64, overlap = 16)
    },
    "q_retention" -> { (s, dir) =>
      // daily cohort retention over the event month (bucket = 1 day in µs)
      val e = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"))
      graft.ops.TimeSeries.retention(e, Seq("user_id"), "t",
        bucket = 86400000000L)
    },
    "q_funnel" -> { (s, dir) =>
      // view → click → purchase per user within 7 days, chained
      // min-aggregations (strictly-later step ordering)
      val e = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"), col("event_type"))
      graft.ops.TimeSeries.funnel(e, Seq("user_id"), "t", "event_type",
        Seq("view", "click", "purchase"), within = Some(604800000000L))
    },
    "q_asof_unique" -> { (s, dir) =>
      // the single-shuffle fast path: (user_id, ts) is unique in events,
      // so skipping the tie-collapse must reproduce q_asof_join exactly
      val e = t(s, dir, "events")
      val l = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("lns"), col("event_id").as("l_id"))
      val r = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("rns"), col("value").as("p_val"))
      graft.ops.TimeSeries
        .asofJoin(l, r, "lns", "rns", Seq("user_id"), Seq("p_val"),
          assumeRightUnique = true)
        .select(col("user_id"), col("l_id"), col("p_val"))
    },
    "q_asof_forward" -> { (s, dir) =>
      // forward direction: each click picks up the EARLIEST at-or-after
      // purchase — DuckDB expresses it as ASOF with the inequality flipped
      val e = t(s, dir, "events")
      val l = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("lns"), col("event_id").as("l_id"))
      val r = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("rns"), col("value").as("p_val"))
      graft.ops.TimeSeries
        .asofJoin(l, r, "lns", "rns", Seq("user_id"), Seq("p_val"),
          direction = "forward")
        .select(col("user_id"), col("l_id"), col("p_val"))
    },
    "q_asof_bucketed" -> { (s, dir) =>
      // the skew-proof bucketized shape under a 6-hour lookback must agree
      // with DuckDB's ASOF join filtered to the same tolerance
      val e = t(s, dir, "events")
      val l = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("lns"), col("event_id").as("l_id"))
      val r = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("rns"), col("value").as("p_val"))
      graft.ops.TimeSeries
        .asofJoinBucketed(l, r, "lns", "rns", Seq("user_id"), Seq("p_val"),
          tolerance = 21600000000L)
        .select(col("user_id"), col("l_id"), col("p_val"))
    },
    "q_noisy_window" -> { (s, dir) =>
      // alpha = 0 is the noise-free path of the DP streaming release — the
      // driver oracle checks the full window/group/count plumbing
      val e = t(s, dir, "events").withColumn(
        "event_time",
        date_trunc("second", col("ts").cast("timestamp")))
      graft.streaming.Streams
        .noisyWindowedCounts(e, "event_time", Seq("event_type"), "1 hour",
          graft.exact.Rational(0))
        .select(
          col("window_start").cast(LongType).as("ws"),
          col("event_type"), col("count"))
    },
    "q_noisy_window_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // TRUE micro-batch execution of the same DP streaming release: the
      // events table is staged as an 8-file directory, streamed 2 files
      // per trigger (4 micro-batches accumulating windowed state), through
      // noisyWindowedCounts (alpha = 0) into a memory sink in complete
      // mode. Trigger.AvailableNow drains the source and terminates, so
      // the sink's final content is the full aggregation — identical to
      // the batch path and to the DuckDB oracle.
      import org.apache.spark.sql.streaming.Trigger
      // the staging cache key covers the SOURCE SCHEMA too: a driver-side
      // testdata regeneration that changes types (r7 flipped ts from
      // int64 nanos to timestamp[us]) must invalidate the staged copy,
      // not feed the new schema to old files
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          dir + "|" + t(s, dir, "events").schema.catalogString))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_$stamp"
      // The checkpoint is cleared EVERY run (a stale one would make a
      // restarted query skip the already-committed input files); the
      // staged source is reused when present — its content is a
      // deterministic restaging of the events table, and rewriting it per
      // run would bill the timed streaming entry for a parquet write.
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rmrf)
        p.delete(): Unit
      }
      rmrf(new java.io.File(s"$base/chk"))
      val srcDone = new java.io.File(s"$base/src/_SUCCESS")
      if (!srcDone.isFile) {
        rmrf(new java.io.File(s"$base/src"))
        t(s, dir, "events").repartition(8).write.parquet(s"$base/src")
      }
      val src = s.readStream
        .schema(t(s, dir, "events").schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$base/src")
      val withTs = src.withColumn(
        "event_time",
        date_trunc("second", col("ts").cast("timestamp")))
      val sinkName = s"graft_noisy_window_stream_$stamp"
      val q = graft.streaming.Streams
        .noisyWindowedCounts(withTs, "event_time", Seq("event_type"), "1 hour",
          graft.exact.Rational(0))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sinkName)
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
        .select(
          col("window_start").cast(LongType).as("ws"),
          col("event_type"), col("count"))
    }},

    // ---------- scale extensions: remaining ----------
    "q_subword_count" -> { (s, dir) =>
      graft.ops.TextAnalysis
        .subwordCountEstimate(t(s, dir, "documents"), "text")
        .select("doc_id", "n_subwords")
    },
    "q_dedup_fingerprint" -> { (s, dir) =>
      graft.ops.Dedup
        .exactByFingerprint(t(s, dir, "documents"), "text", "doc_id")
        .select("doc_id")
    },
    "q_simhash_pairs" -> { (s, dir) =>
      // plant token-REVERSED copies: a permutation leaves the token
      // multiset (hence the SimHash signature) unchanged, so recall for
      // the planted pairs is exactly 1 and the verified output equals the
      // engine-independent equal-multiset pair set — the DuckDB oracle
      val d = tp(s, dir, "documents").select("doc_id", "text")
      val planted = d
        .filter(col("doc_id") % 40 === 0)
        .select(
          (col("doc_id") + lit(1000000L)).as("doc_id"),
          concat_ws(
            " ",
            reverse(filter(split(col("text"), "\\s+"), x => x =!= lit(""))))
            .as("text"))
      graft.ops.Dedup
        .simHashVerifiedPairs(d.unionByName(planted), "doc_id", "text")
        .select("left_id", "right_id")
    },
    "q_ngram_jaccard" -> { (s, dir) =>
      graft.ops.Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, jaccardThreshold = 0.5, maxDocFreq = 20)
        .select("left_id", "right_id")
    },
    "q_bucket_batches" -> { (s, dir) =>
      // padding-efficient batching: length buckets at 200/500/1000 chars,
      // 16 docs per batch, ranks and batches fully deterministic
      graft.ops.Pack.bucketBatches(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", Seq(200L, 500L, 1000L), batchSize = 16)
    },
    "q_majority_label" -> { (s, dir) =>
      // annotation reconciliation shape: each user's most frequent event
      // type, ties to the lexicographically smallest
      graft.ops.Quality.majorityLabel(
        t(s, dir, "events").select("user_id", "event_type"),
        Seq("user_id"), "event_type")
    },
    "q_top_mass" -> { (s, dir) =>
      // nucleus selection: per source, the minimal doc prefix (by chars
      // desc) carrying half the source's character mass
      graft.ops.Quality.topMassPerGroup(
        t(s, dir, "documents").select("source", "doc_id", "n_chars"),
        Seq("source"), "n_chars", p = 0.5, tieCol = "doc_id")
    },
    "q_negative_samples" -> { (s, dir) =>
      // 4 deterministic contrastive negatives per anchor from the full
      // embedding pool; the portable SHA recipe lets the oracle replay
      // the exact draw (self-collisions dropped by contract)
      val emb = t(s, dir, "embeddings").select("vec_id")
      graft.ops.Dedup.negativeSamples(
        emb.filter(col("vec_id") < 100), "vec_id", emb, "vec_id", k = 4)
    },
    "q_sorted_neighbors" -> { (s, dir) =>
      // merge/purge blocking: candidate pairs within 3 positions in the
      // (n_chars, doc_id) total order — the sort-key complement of the
      // hash/LSH blockers
      graft.ops.Dedup.sortedNeighborPairs(
        t(s, dir, "documents"), "doc_id", "n_chars", window = 3)
    },
    "q_jaro_pairs" -> { (s, dir) =>
      // entity-resolution verify: Jaro-Winkler (native codegen'd
      // expression) over the name-sorted neighborhood of parts; scores
      // verified bitwise against DuckDB's jaro_winkler_similarity
      val pairs = graft.ops.Dedup.sortedNeighborPairs(
        t(s, dir, "part").select("p_partkey", "p_name"),
        "p_partkey", "p_name", window = 3)
      pairs.select(col("left_id"), col("right_id"),
        graft.plans.JaroWinkler.jaroWinkler(
          col("left_key"), col("right_key")).as("jw"))
    },
    "q_containment" -> { (s, dir) =>
      // asymmetric quote/subset detection: a doc whose shingles are mostly
      // inside another doc (containment scores are exact-integer divisions,
      // so the doubles hash bit-for-bit across engines)
      graft.ops.Dedup.ngramContainmentPairs(t(s, dir, "documents"), "doc_id",
        "text", shingleSize = 3, threshold = 0.4, maxDocFreq = 20)
    },
    "q_dup_spans" -> { (s, dir) =>
      // exact substring-level dedup signal (Lee et al. 2022): merged token
      // ranges of every 8-token span occurring more than once in the corpus
      graft.ops.Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text", 8)
        .select("doc_id", "span_start", "span_end")
    },
    "q_remove_spans" -> { (s, dir) =>
      graft.ops.Dedup
        .removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text", 8)
        .select("doc_id", "clean_text")
    },
    "q_cosine_dup" -> { (s, dir) =>
      // plant exactly-collinear duplicates (×2-scaled vectors, cosine = 1,
      // same LSH bucket in every band by construction) so the DuckDB exact
      // all-pairs oracle and the LSH output provably coincide: natural max
      // cosine in the fixture is ~0.49 << 0.95
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e
        .filter(col("vec_id") % 40 === 0)
        .select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      graft.ops.Similarity.cosineDupPairs(
        e.unionByName(planted), "vec_id", "embedding", 0.95)
        .select("left_id", "right_id")
    },
    // q_lsh_topk / q_ivf_topk oracle recipe (same idea as q_cosine_dup):
    // plant 3 EXACT duplicates of each query vector (identical floats, ids
    // 1000000 + 10·qid + j). Identical vectors share every LSH bucket and
    // every centroid assignment, so recall is 1, and each engine computes
    // the SAME cosine for all four identical candidates (self + 3 copies),
    // so ties break purely on neighbor_id in Spark and DuckDB alike. The
    // natural max cosine in the fixture is ~0.49, far below the tie group —
    // the ANN output provably equals the brute-force top-k.
    "q_lsh_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val q = e.filter(col("vec_id") < 5)
      val planted = q
        .select(explode(array(lit(0L), lit(1L), lit(2L))).as("__j"),
          col("vec_id"), col("embedding"))
        .select((col("vec_id") * 10 + col("__j") + 1000000L).as("vec_id"),
          col("embedding"))
      graft.ops.Similarity.lshTopK(
        q, e.unionByName(planted), "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id")
    },
    "q_ivf_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val q = e.filter(col("vec_id") < 5)
      val planted = q
        .select(explode(array(lit(0L), lit(1L), lit(2L))).as("__j"),
          col("vec_id"), col("embedding"))
        .select((col("vec_id") * 10 + col("__j") + 1000000L).as("vec_id"),
          col("embedding"))
      graft.ops.Similarity.ivfTopK(
        q, e.unionByName(planted), "vec_id", "embedding", 3,
        nlist = 16, nprobe = 4, refineIterations = 2)
        .select("query_id", "neighbor_id")
    },
    "q_dedup_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // batch path of the streaming dedup: plant duplicates by unioning the
      // events table with itself — dropDuplicates over (keys, ts) must
      // return exactly the distinct (user, type, ts) set
      val e = t(s, dir, "events").select("user_id", "event_type", "ts")
      graft.streaming.Streams
        .dedupStream(e.unionByName(e), "ts", Seq("user_id", "event_type"))
        // dedup runs on the native µs timestamps; the comparison column is
        // epoch micros, the exact stored precision on both engines
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    }},
    "q_interactive" -> { (s, dir) =>
      // end-to-end PrivacyAccountant session on the ∞-budget deterministic
      // path (reference test/system/measurements/test_interactive_measurements.py):
      // launch → queue a Filter → measure a count → split over a partition →
      // measure each child in order → retire children (parent reactivates
      // with the budget meet) → measure the reactivated parent again.
      import graft.interactive._
      val o = t(s, dir, "orders").select("o_orderstatus", "o_orderkey")
      val d = dom(o)
      val acct = AdaptiveComposition.create(
        d, SymmetricDifference, ExactNum(1), inf, PureDP, o)
      acct.transformInPlace(Filter(d, SymmetricDifference, "o_orderkey % 2 = 0"))
      val mCount = Aggregations.createCountMeasurement(
        d, SymmetricDifference, NoiseKind.Geometric, ExactNum(1), inf)
      val total = acct.measure(mCount).asInstanceOf[Long]
      val part = PartitionByKeys(d, SymmetricDifference,
        Seq("o_orderstatus"), Seq(Seq("F"), Seq("O"), Seq("P")))
      val kids = acct.split(part)
      val perStatus = Seq("F", "O", "P").zip(kids).map { case (k, a) =>
        val c = a.measure(mCount).asInstanceOf[Long]
        a.retire()
        (k, c)
      }
      val afterSplit = acct.measure(mCount).asInstanceOf[Long]
      val rows = ((("total", total) +: perStatus) :+ ("after_split", afterSplit))
        .map { case (k, v) => Row(k, v) }
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, StructType(Seq(
        StructField("part", StringType, nullable = false),
        StructField("count", LongType, nullable = false))))
    },
    "q_multimodal" -> { (s, dir) =>
      // synthesize binary assets from document text bytes (testdata has no
      // binary column); exercises the full decode/feature/frame plumbing
      val assets = t(s, dir, "documents").select(
        col("doc_id").as("asset_id"), lit("image").as("modality"),
        encode(col("text"), "UTF-8").as("content"), lit(null).cast("string").as("uri"))
      val decodable = graft.ops.Multimodal.filterDecodable(assets)
      val decoded = graft.ops.Multimodal.decodeMetadata(decodable)
      val featured = graft.ops.Multimodal.extractFeatures(decoded, dim = 4)
      featured
        .filter(size(col("features")) === 4)
        .select(col("asset_id"), col("metadata.n_bytes").as("n_bytes"))
    },
    "q_cdc_apply" -> { (s, dir) =>
      // CDC post-image: the customer snapshot under an orders-derived
      // changelog (seq = o_orderkey, unique per key by construction;
      // F→update, O→insert, P→delete); payloads in integer cents
      val snap = t(s, dir, "customer").select(
        col("c_custkey"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_c"),
        col("c_mktsegment").as("seg"))
      val chg = t(s, dir, "orders").select(
        col("o_custkey").as("c_custkey"),
        col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", "U")
          .when(col("o_orderstatus") === "O", "I")
          .otherwise("D").as("op"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("bal_c"),
        col("o_orderpriority").as("seg"))
      graft.ops.Incremental.applyChangelog(
        snap, chg, Seq("c_custkey"), "seq", "op", Seq("bal_c", "seg"))
    },
    "q_incr_agg" -> { (s, dir) =>
      // incremental view maintenance: fold the odd-orderkey half of orders
      // into the even half's saved aggregate states — must equal the
      // from-scratch GROUP BY over all of orders (integer-cents sums)
      val o = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("v"))
      val base = graft.ops.Incremental.aggStates(
        o.filter(col("o_orderkey") % 2 === 0), Seq("o_custkey"), "v")
      graft.ops.Incremental
        .mergeAggStates(base,
          o.filter(col("o_orderkey") % 2 =!= 0), Seq("o_custkey"), "v")
        .select(col("o_custkey"), col("cnt"), col("sum").as("sum_v"),
          col("min").as("min_v"), col("max").as("max_v"))
    },
    "q_sample_bottomk" -> { (s, dir) =>
      // mergeable bottom-k (KMV) sample per event type, built by folding
      // the odd-event half into the even half's saved states — merge
      // losslessness means this must equal the from-scratch sketch the
      // oracle computes over all of events
      val e = t(s, dir, "events").select("event_type", "event_id")
      val base = graft.ops.Incremental.sampleStates(
        e.filter(col("event_id") % 2 === 0), Seq("event_type"), "event_id", 32)
      graft.ops.Incremental.mergeSampleStates(base,
        e.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "event_id", 32)
    },
    "q_bloom_semijoin" -> { (s, dir) =>
      // Bloom-pruned semi join: lineitem rows of high-value orders; must
      // be bit-identical to the plain IN-subquery (FPs removed exactly)
      val hi = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_orderkey").as("hk"))
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber")
      graft.ops.BloomJoin.semiJoin(li, hi, "l_orderkey", "hk",
        expectedItems = 100000L)
    },
    "q_bloom_anti" -> { (s, dir) =>
      // Bloom-routed anti join: definite misses bypass the join on the
      // narrow path; must equal the plain NOT-IN over the same keys
      val hi = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_orderkey").as("hk"))
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber")
      graft.ops.BloomJoin.antiJoin(li, hi, "l_orderkey", "hk",
        expectedItems = 100000L)
    },
    "q_zorder" -> { (s, dir) =>
      // Morton key of the (partkey, suppkey) grid — the checkable core of
      // the z-order clustering path (zOrder itself only re-arranges rows);
      // modulo gridding keeps the oracle pure integer bit arithmetic
      val li = t(s, dir, "lineitem")
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        graft.ops.Layout.zValue(
          Seq(col("l_partkey") % 1024, col("l_suppkey") % 1024),
          bits = 10).as("zv"))
    },
    "q_equidepth" -> { (s, dir) =>
      // 16 equi-depth price bands over orders; bin ids replay as pure
      // integer rank arithmetic on the value histogram
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("v"))
      graft.ops.Layout.equiDepthBins(o, "v", numBins = 16)
        .select(col("o_orderkey"), col("bin"))
    },
    "q_interval_join_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // TRUE micro-batch stream-stream interval join: both sides stream
      // the staged 8-file events directory 2 files per trigger and
      // inner-join on (user_id, ±15 min). The staged files are NOT
      // time-ordered, so the watermark is set beyond the staged span —
      // arrival order then cannot age state out under a legitimate match,
      // and the appended matches must equal the batch join bit-for-bit
      // (the production path would keep the 30-minute default and rely on
      // approximately ordered arrival).
      import org.apache.spark.sql.streaming.Trigger
      // schema-aware cache key — see q_noisy_window_stream
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          dir + "|" + t(s, dir, "events").schema.catalogString))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_ssjoin_$stamp"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rmrf)
        p.delete(): Unit
      }
      rmrf(new java.io.File(s"$base/chk"))
      val srcDone = new java.io.File(s"$base/src/_SUCCESS")
      if (!srcDone.isFile) {
        rmrf(new java.io.File(s"$base/src"))
        t(s, dir, "events").repartition(8).write.parquet(s"$base/src")
      }
      def src() = s.readStream
        .schema(t(s, dir, "events").schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$base/src")
        .withColumn("event_time",
          date_trunc("second", col("ts").cast("timestamp")))
      val l = src().select(col("user_id"), col("event_time").as("l_ts"),
        col("event_id").as("l_id"))
      val r = src().filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_time").as("r_ts"),
          col("event_id").as("r_id"))
      val sinkName = s"graft_ssjoin_sink_$stamp"
      val q = graft.streaming.Streams
        .intervalJoin(l, r, "l_ts", "r_ts", Seq("user_id"),
          within = "15 minutes", watermark = "60 days")
        .select(col("user_id"), col("l_id"), col("r_id"))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(sinkName)
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
    }},
    "q_scd2_snapshot" -> { (s, dir) =>
      // time-travel: the SCD2 history of q_scd2 reconstructed as of
      // 2024-01-16T00:00:00Z — equals the per-user latest band at that
      // instant replayed directly from the events
      val e = t(s, dir, "events")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tsu"),
          expr("CAST(round(value * 100, 0) AS BIGINT) div 10000").as("band"))
      val hist = graft.ops.TimeSeries.buildHistory(
        e, "user_id", "tsu", Seq("band"))
      graft.ops.TimeSeries.snapshotAt(hist, lit(1705363200000000L))
    },
    "q_sample_weighted" -> { (s, dir) =>
      // 500 documents drawn without replacement with probability
      // proportional to length (A-ES keys from the portable 60-bit hash);
      // the keep-set replays bit-for-bit from (salt, doc_id, n_chars)
      graft.ops.Dedup
        .sampleByWeightPortable(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 500, salt = 7L)
        .select(col("doc_id"), col("source"))
    },
    "q_novelty" -> { (s, dir) =>
      // corpus-unique share of each doc's distinct 3-grams (novelty —
      // the diversity dual of the duplication signals)
      graft.ops.TextAnalysis.ngramNovelty(
        t(s, dir, "documents"), "doc_id", "text", n = 3)
    },
    "q_clip_quantiles" -> { (s, dir) =>
      // per-returnflag winsorization of price cents at the exact discrete
      // [p5, p95] — boundaries are actual data values, so the clip
      // replays exactly
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("v"))
      graft.ops.Profile
        .clipToQuantiles(li, Seq("l_returnflag"), "v", pLo = 0.05, pHi = 0.95)
        .select(col("l_orderkey"), col("l_linenumber"), col("v").as("v_clip"))
    },
    "q_quality_check" -> { (s, dir) =>
      // five declarative constraints audited in ONE aggregation pass;
      // maybe_pri plants real nulls so the null-budget check has teeth
      val o = t(s, dir, "orders").withColumn("maybe_pri",
        when(col("o_totalprice") >= 100000.0, col("o_orderpriority")))
      graft.ops.Quality.check(o, Seq(
        graft.ops.Quality.NotNull("o_custkey"),
        graft.ops.Quality.Unique(Seq("o_orderkey")),
        graft.ops.Quality.InRange("o_totalprice", 0.0, 600000.0),
        graft.ops.Quality.AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
        graft.ops.Quality.MaxNullFraction("maybe_pri", 0.25)))
    },
    "q_pipeline_curate2" -> { (s, dir) =>
      // second end-to-end curation chain, this time over the round-7
      // layer: per-language length winsorization -> novelty scoring ->
      // novelty-boosted weighted sampling. The A-ES weight is raw double
      // arithmetic over exact integers (no rounding step), so every
      // engine derives identical keys and the same 400 winners.
      val d = t(s, dir, "documents")
      val lenW = graft.ops.Profile.clipToQuantiles(
        d.select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        Seq("lang"), "n_chars", pLo = 0.05, pHi = 0.95)
      val nov = graft.ops.TextAnalysis
        .ngramNovelty(d, "doc_id", "text", n = 3)
        .filter(col("n_grams") > 0)
      val scored = lenW
        .join(nov, Seq("doc_id"))
        .withColumn("w",
          col("n_chars").cast("double") *
            (lit(1.0) +
              col("novel_grams").cast("double") / col("n_grams")))
      graft.ops.Dedup
        .sampleByWeightPortable(scored, "doc_id", "w", k = 400, salt = 11L)
        .select(col("doc_id"), col("lang"), col("source"))
    },
    "q_split_hash" -> { (s, dir) =>
      // disjoint 80/10/10 train/val/test split, engine-replayable from
      // (salt, doc_id); buckets partition the corpus by construction
      graft.ops.Dedup
        .splitByHash(t(s, dir, "documents"), "doc_id",
          bps = Seq(8000, 1000, 1000))
        .select(col("doc_id"), col("split"))
    },
    "q_rank_normalize" -> { (s, dir) =>
      // percent_rank per returnflag from the value HISTOGRAM — the window
      // walks 50 distinct quantities, never the 60k rows
      val li = t(s, dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      graft.ops.Profile
        .rankNormalize(li, Seq("l_returnflag"), "l_quantity")
        .select(col("l_orderkey"), col("l_linenumber"), col("pct"))
    },
    "q_fd_check" -> { (s, dir) =>
      // orders violating "an order has one supplier": the FD audit
      // returns each violating lhs group with its distinct-rhs count
      graft.ops.Quality.functionalDependencyViolations(
        t(s, dir, "lineitem"), Seq("l_orderkey"), Seq("l_suppkey"))
    },
    "q_quality_by" -> { (s, dir) =>
      // the per-source drift monitor: same one-pass audit, fanned out
      graft.ops.Quality.checkBy(t(s, dir, "documents"), Seq("source"), Seq(
        graft.ops.Quality.NotNull("text"),
        graft.ops.Quality.Satisfies("text_nonempty", length(col("text")) > 0),
        graft.ops.Quality.InRange("n_chars", 1.0, 100000.0),
        graft.ops.Quality.Unique(Seq("doc_id"))))
    },
    "q_sample_weighted_group" -> { (s, dir) =>
      // 100 weighted winners PER LANGUAGE (A-ES quota per group)
      graft.ops.Dedup
        .sampleByWeightPerGroup(
          t(s, dir, "documents"), "doc_id", "n_chars", Seq("lang"),
          k = 100, salt = 7L)
        .select(col("doc_id"), col("lang"))
    },
    "q_quality_rows" -> { (s, dir) =>
      // row-level invariants (cross-column Satisfies predicates) audited
      // in the same one-pass harness; qty_cap_30 is deliberately violated
      val li = t(s, dir, "lineitem")
      graft.ops.Quality.check(li, Seq(
        graft.ops.Quality.Satisfies("price_at_least_qty",
          col("l_extendedprice") >= col("l_quantity")),
        graft.ops.Quality.Satisfies("qty_cap_30", col("l_quantity") <= 30.0),
        graft.ops.Quality.InRange("l_discount", 0.0, 0.1),
        graft.ops.Quality.NotNull("l_shipdate")))
    },
    "q_incr_distinct" -> { (s, dir) =>
      // incremental distinct maintenance: union the two halves' HLL
      // states; per-customer priority cardinality is <= 5, far inside the
      // sketch's exact (coupon) regime, so the estimate IS the exact
      // count and the DuckDB COUNT(DISTINCT) oracles it
      val o = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
      val base = graft.ops.Incremental.distinctStates(
        o.filter(col("o_orderkey") % 2 === 0),
        Seq("o_custkey"), "o_orderpriority")
      val merged = graft.ops.Incremental.mergeDistinctStates(
        base, o.filter(col("o_orderkey") % 2 =!= 0),
        Seq("o_custkey"), "o_orderpriority")
      graft.ops.Incremental.estimateDistinct(merged, Seq("o_custkey"))
    },
    "q_running_counts_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // TRUE micro-batch execution of the mapGroupsWithState running
      // counter: 4 AvailableNow triggers over the staged source, update
      // mode into a memory sink. Counts per key are monotone across
      // triggers, so max(cnt) per key is the drained total — equal to the
      // batch GROUP BY whatever the file arrival order.
      import org.apache.spark.sql.streaming.Trigger
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          dir + "|" + t(s, dir, "events").schema.catalogString))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_rcs_$stamp"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rmrf)
        p.delete(): Unit
      }
      rmrf(new java.io.File(s"$base/chk"))
      val srcDone = new java.io.File(s"$base/src/_SUCCESS")
      if (!srcDone.isFile) {
        rmrf(new java.io.File(s"$base/src"))
        t(s, dir, "events").repartition(8).write.parquet(s"$base/src")
      }
      val src = s.readStream
        .schema(t(s, dir, "events").schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$base/src")
      val sinkName = s"graft_rcs_sink_$stamp"
      val q = graft.streaming.Streams
        .runningCounts(src, "event_type")
        .toDF("event_type", "cnt")
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(sinkName)
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
        .groupBy("event_type")
        .agg(max(col("cnt")).as("cnt"))
    }},

    "q_sample_bottomk_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // TRUE micro-batch maintenance of the bottom-k (KMV) sample states:
      // foreachBatch folds each trigger's files into the carried states
      // via mergeSampleStates. Bottom-k merge is lossless and
      // order-insensitive, so the drained states must equal the
      // from-scratch sketch over all of events — the q_sample_bottomk
      // oracle verbatim — whatever the file arrival order.
      import org.apache.spark.sql.streaming.Trigger
      val ev = t(s, dir, "events").select("event_type", "event_id")
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          dir + "|" + ev.schema.catalogString))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_kmv_$stamp"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rmrf)
        p.delete(): Unit
      }
      rmrf(new java.io.File(s"$base/chk"))
      val srcDone = new java.io.File(s"$base/src/_SUCCESS")
      if (!srcDone.isFile) {
        rmrf(new java.io.File(s"$base/src"))
        ev.repartition(8).write.parquet(s"$base/src")
      }
      var state: DataFrame = null
      val q = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$base/src")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.select("event_type", "event_id")
          state =
            (if (state == null)
               graft.ops.Incremental.sampleStates(
                 b, Seq("event_type"), "event_id", 32)
             else
               graft.ops.Incremental.mergeSampleStates(
                 state, b, Seq("event_type"), "event_id", 32))
              .localCheckpoint() // keys-sized; cut lineage across triggers
          ()
        }
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state
    }},

    // ---------- scale extensions: OLAP / warehouse reshaping ----------
    "q_rollup" -> { (s, dir) =>
      // region -> nation subtotal lattice in ONE Expand + hash aggregate;
      // grouping_id disambiguates subtotal NULLs from data NULLs
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
      graft.ops.Olap.rollupAgg(base, Seq("r_name", "n_name"),
        Seq(round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n_orders")))
    },
    "q_cube" -> { (s, dir) =>
      graft.ops.Olap.cubeAgg(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority"),
        Seq(round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n_orders")))
    },
    "q_pivot" -> { (s, dir) =>
      // explicit value list => one conditional hash aggregate, no
      // value-discovery scan
      graft.ops.Olap.pivotAgg(t(s, dir, "orders"),
        Seq("o_orderstatus"), "o_orderpriority",
        values = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW"),
        names = Seq("urgent", "high", "medium", "notspec", "low"),
        agg = count(lit(1)))
    },
    "q_unpivot" -> { (s, dir) =>
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
      graft.ops.Olap.unpivotLong(wide, Seq("l_returnflag"),
        Seq("sum_qty", "sum_price"), "metric", "val")
    },
    "q_grouped_percentiles" -> { (s, dir) =>
      // dyadic percentiles over integral quantities: interpolation
      // arithmetic is exact in double, so the oracle matches bit-for-bit
      graft.ops.Olap.percentilesByGroup(t(s, dir, "lineitem"),
        Seq("l_returnflag"), col("l_quantity"),
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
    },
    "q_argmax" -> { (s, dir) =>
      // deterministic arg-max: single hash aggregate, payload in the
      // struct order breaks ties totally
      graft.ops.Olap.argMax(t(s, dir, "customer"),
        Seq("c_nationkey"), Seq(col("c_acctbal")),
        Seq("c_custkey" -> col("c_custkey"),
          "top_bal" -> col("c_acctbal")))
    },
    "q_string_agg" -> { (s, dir) =>
      graft.ops.Olap.stringAgg(
        t(s, dir, "nation").join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey")),
        Seq("r_name"), col("n_name"), ",", "nations")
    },
    "q_histogram" -> { (s, dir) =>
      // fixed-bound equal-width histogram: one pass, bins-row shuffle
      graft.ops.Olap.histogramFixed(t(s, dir, "events"),
        col("value"), 0.0, 500.0, 25)
    },
    "q_json_extract" -> { (s, dir) =>
      // JSON property extraction stays inside codegen (get_json_object);
      // no UDF, predicate-safe for pushdown on the outer columns
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
    },
    "q_edit_join" -> { (s, dir) =>
      // PassJoin segment-pigeonhole candidates over the DISTINCT
      // vocabulary; the DuckDB oracle is the exact all-pairs filter
      val names = t(s, dir, "part").select(col("p_name")).distinct()
      graft.ops.Similarity.editDistanceJoin(
        names.select(col("p_name").as("name_a")), "name_a",
        names.select(col("p_name").as("name_b")), "name_b",
        maxDist = 2)
        .filter(col("name_a") < col("name_b"))
    },
    "q_pagerank" -> { (s, dir) =>
      // symmetrized customer<->supplier interaction graph (no dangling
      // mass); 3 damped iterations from uniform — deterministic, so the
      // DuckDB CTE-chain oracle replays it exactly
      val e0 = tp(s, dir, "orders")
        .join(tp(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
        // both legs of the symmetrizing union read e0; without the cache
        // the join+distinct runs twice inside pageRank's one edge
        // materialization (same persist discipline as Market; the
        // harnesses clear caches between queries)
        .persist()
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      // roundDigits=9 snaps each iterate to a 1e-9 grid: contribution
      // sums are order-dependent in their last ulps across engines, and
      // the quantization (guard-band pinned in GraphSpec) makes the
      // DuckDB replay bit-identical
      graft.ops.Graph.pageRank(edges, iters = 3, damping = 0.85,
        roundDigits = 9)
    },
    "q_graph_degrees" -> { (s, dir) =>
      val e0 = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
      graft.ops.Graph.degrees(e0)
    },
    "q_assoc_rules" -> { (s, dir) =>
      // support/confidence/lift over (order, part) baskets; the pair
      // explosion is bounded by the deterministic basket cap before the
      // self-join, and all ratios are integer ppm from exact counts
      graft.ops.Market.associationRules(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 3L, maxBasketSize = 16)
    },
    "q_triangles" -> { (s, dir) =>
      // co-purchase graph (part pairs sharing >= 2 orders), triangle
      // count under degree-ordered orientation — the wedge join is
      // bounded by orientation out-degree, not hub degree
      val edges = graft.ops.Market.frequentPairs(
        tp(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 2L, maxBasketSize = 16)
        .select(col("item_a").as("src"), col("item_b").as("dst"))
      graft.ops.Graph.triangleCount(edges)
    },
    "q_weighted_median" -> { (s, dir) =>
      // quantity-weighted price median per flag/status; weights are
      // integral so the cumulative sums are exact BIGINTs
      graft.ops.Olap.weightedMedianByGroup(
        t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        col("l_extendedprice"), col("l_quantity"))
    },
    "q_ab_welch" -> { (s, dir) =>
      // daily Welch t between click and view on value; every double is
      // derived from exact integer cent sums by the same expression
      // tree the oracle spells, so the stats replay bit-identically
      graft.ops.Stats.welchT(
        t(s, dir, "events").withColumn("day", col("ts").cast("date")),
        Seq("day"), col("event_type"), col("value"),
        variantA = "click", variantB = "view")
    },
    "q_chi2_assoc" -> { (s, dir) =>
      // lang x source contingency with per-cell ppm contributions;
      // zero-observed cells of the label cross emitted too
      graft.ops.Stats.chi2Contingency(
        t(s, dir, "documents"), col("lang"), col("source"))
    },
    "q_collocations" -> { (s, dir) =>
      // corpus-wide PMI collocations; counts-to-counts, ln guard band
      // pinned in the suite (same discipline as q_bm25)
      graft.ops.TextAnalysis.collocations(
        t(s, dir, "documents"), "text", minPairCount = 10L)
    },
    "q_transitions" -> { (s, dir) =>
      // per-user first-order event transitions ordered by (ts,
      // event_id) — the unique tiebreak makes the lag deterministic
      graft.ops.TimeSeries.transitionMatrix(
        t(s, dir, "events"), col("user_id"), col("event_type"),
        Seq(col("ts"), col("event_id")))
    },
    "q_benford" -> { (s, dir) =>
      // leading-digit audit of prices on the integer-cents grid; digit
      // extraction is string-based, no log10 on the data path
      graft.ops.Quality.benfordAudit(
        t(s, dir, "lineitem"), col("l_extendedprice"))
    },
    "q_trend" -> { (s, dir) =>
      // per-type OLS drift of value over seconds-since-2024-01-01;
      // six exact integer sums, doubles derived by the oracle's trees
      graft.ops.Stats.linearTrendByGroup(
        t(s, dir, "events"),
        Seq("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
          - lit(1704067200L),
        col("value"))
    },
    "q_mi_assoc" -> { (s, dir) =>
      // per-cell mutual information of lang x source (nats, ppm);
      // observed cells only — empty cells contribute 0 by convention
      graft.ops.Stats.miContingency(
        t(s, dir, "documents"), col("lang"), col("source"))
    },
    "q_cramers_v" -> { (s, dir) =>
      // effect size of the q_chi2_assoc association, from the exact
      // per-cell ppm sum
      graft.ops.Stats.cramersV(
        t(s, dir, "documents"), col("lang"), col("source"))
    },
    "q_auc" -> { (s, dir) =>
      // daily exact ROC-AUC of value predicting purchase via the
      // rank-sum identity; doubled ranks keep every term integral
      graft.ops.Stats.aucByGroup(
        t(s, dir, "events").withColumn("day", col("ts").cast("date")),
        Seq("day"), col("value"), col("event_type") === "purchase")
    },
    "q_prec_at_k" -> { (s, dir) =>
      // daily precision/recall of the top-20 by value, event_id
      // tiebreak pins the cut deterministically
      graft.ops.Stats.precisionAtK(
        t(s, dir, "events").withColumn("day", col("ts").cast("date")),
        Seq("day"), col("value"), col("event_type") === "purchase",
        k = 20, tie = col("event_id"))
    },
    "q_overlap" -> { (s, dir) =>
      // audience-overlap matrix: which event streams share users; the
      // self-join explodes per element by label-degree only
      graft.ops.Similarity.setOverlapMatrix(
        t(s, dir, "events"), col("event_type"), col("user_id"))
    },
    "q_event_gaps" -> { (s, dir) =>
      // per-user cadence profile on exact microsecond gaps
      graft.ops.TimeSeries.interEventStats(
        t(s, dir, "events"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), col("event_id"))
    },
    "q_twa" -> { (s, dir) =>
      // duration-weighted mean of the value gauge per user; exact
      // cent·µs products, one window + one combinable aggregate
      graft.ops.TimeSeries.timeWeightedAvg(
        t(s, dir, "events"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), col("value"),
        col("event_id"))
    },
    "q_minhash_states" -> { (s, dir) =>
      // incremental per-source MinHash signatures: states built from
      // the 4/5 corpus, then the 1/5 delta folded in — min is
      // idempotent, so the merge must equal from-scratch (the oracle)
      val docs = tp(s, dir, "documents")
      val sh = docs.select(col("doc_id"), col("source"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
      val base = graft.ops.Incremental.minhashStates(
        sh.filter(col("doc_id") % 5 =!= 0).select("source", "sh"),
        Seq("source"), "sh", numHashes = 8)
      graft.ops.Incremental.mergeMinhashStates(
        base,
        sh.filter(col("doc_id") % 5 === 0).select("source", "sh"),
        Seq("source"), "sh", numHashes = 8)
    },
    "q_pack_report" -> { (s, dir) =>
      // per-bin fill/waste KPIs over the greedy next-fit packing
      val docs = t(s, dir, "documents").select("doc_id", "n_chars")
      val packed = graft.ops.Pack.packGreedyNextFit(
        docs, "doc_id", "n_chars", budget = 4096L, numShards = 8)
      graft.ops.Pack.packingReport(
        packed, docs, "doc_id", "n_chars", budget = 4096L)
    },
    "q_moments" -> { (s, dir) =>
      // distribution-shape profile per stream from four exact power
      // sums; sqrt (exactly rounded) instead of pow(x, 1.5)
      graft.ops.Stats.momentsByGroup(
        t(s, dir, "events"), Seq("event_type"), col("value"), scale = 1)
    },
    "q_mix_proportions" -> { (s, dir) =>
      // max-volume 3:2:1 mix over three sources; quotas are integer
      // divisions of exact counts, selection by portable hash rank
      graft.ops.Dedup.sampleToProportions(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id",
        Map("src0" -> 3L, "src1" -> 2L, "src2" -> 1L))
    },
    "q_ks_drift_by" -> { (s, dir) =>
      // per-stream KS between the month's halves — keyed windows, no
      // single-partition stage at all
      val ev = t(s, dir, "events")
        .withColumn("c", round(col("value") * lit(100)).cast("long"))
        .withColumn("d", dayofmonth(col("ts")))
      graft.ops.Profile.ksDriftByGroup(
        ev.filter(col("d") <= 15).select("event_type", "c"),
        ev.filter(col("d") > 15).select("event_type", "c"),
        Seq("event_type"), "c")
    },
    "q_blocklist" -> { (s, dir) =>
      // C4-style banned-word gate; narrow literal-array filter
      graft.ops.TextAnalysis.dropBlocklisted(
        t(s, dir, "documents"), "text", Seq("slow", "merge", "vector"))
        .select("doc_id", "n_chars")
    },
    "q_blocklist_report" -> { (s, dir) =>
      // drops-observable evidence per banned word (zero rows included)
      graft.ops.TextAnalysis.blocklistReport(
        t(s, dir, "documents"), "text",
        Seq("slow", "merge", "vector", "zzznevermatches"))
    },
    "q_anova" -> { (s, dir) =>
      // variance in value explained by event type; the one cross-group
      // double reduction is folded in category order (order-pinned)
      graft.ops.Stats.anovaEta(
        t(s, dir, "events"), col("event_type"), col("value"))
    },
    "q_source_sim" -> { (s, dir) =>
      // source-pair similarity read off the MinHash signature STATES
      // (not the corpus): agreeing hash slots -> Jaccard estimate;
      // the index-driven companion to the exact q_overlap matrix
      val docs = tp(s, dir, "documents")
      val sh = docs.select(col("source"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
      val states = graft.ops.Incremental.minhashStates(
        sh, Seq("source"), "sh", numHashes = 8)
      graft.ops.Similarity.signatureSimilarity(states, "source", 8)
    },
    "q_ks_drift" -> { (s, dir) =>
      // exact binning-free KS between the month's halves on the cents
      // grid — integer numerator end to end, no ln, no guard bands
      val ev = t(s, dir, "events")
        .withColumn("c", round(col("value") * lit(100)).cast("long"))
        .withColumn("d", dayofmonth(col("ts")))
      graft.ops.Profile.ksDrift(
        ev.filter(col("d") <= 15).select("c"),
        ev.filter(col("d") > 15).select("c"), "c")
    },
    "q_bucketed_join" -> { (s, dir) =>
      // end-to-end bucketed-layout path (the q_write_shards pattern:
      // side effect inside, deterministic relation out): write both
      // sides bucketed+sorted on the join key as external tables under
      // tmp, then join THROUGH the catalog — co-located scan-to-scan,
      // no exchange on either side (plan pinned in LayoutSpec) — and
      // aggregate revenue per priority; the oracle replays the plain
      // join + aggregate
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_bkt_$stamp"
      def save(df: DataFrame, name: String): Unit =
        df.write.mode("overwrite").format("parquet")
          .option("path", s"$base/$name")
          .bucketBy(8, "o_orderkey")
          .sortBy("o_orderkey")
          .saveAsTable(name)
      save(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        s"bkt_orders_$stamp")
      save(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount")),
        s"bkt_lineitem_$stamp")
      s.table(s"bkt_orders_$stamp")
        .join(s.table(s"bkt_lineitem_$stamp"), Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice")
            * (lit(1.0) - col("l_discount")) * lit(100))
            .cast("long")).as("revenue_c"))
    },
    "q_gini" -> { (s, dir) =>
      // price-mass inequality per return flag; every term an exact
      // integer, tie permutations provably don't move the rank sum
      graft.ops.Stats.giniByGroup(
        t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_extendedprice"))
    },
    "q_minhash_stream" -> { (s, dir) => withShufflePartitions(s, 8) {
      // TRUE micro-batch maintenance of the per-source MinHash
      // signature states: foreachBatch folds each trigger's shingle
      // files via mergeMinhashStates. min-merge is idempotent and
      // order-insensitive, so the drained states must equal the
      // from-scratch signature over all documents — the q_minhash_states
      // oracle verbatim — whatever the file arrival order.
      import org.apache.spark.sql.streaming.Trigger
      val sh = t(s, dir, "documents").select(col("source"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
      val stamp = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          dir + "|" + sh.schema.catalogString))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_mhs_$stamp"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rmrf)
        p.delete(): Unit
      }
      rmrf(new java.io.File(s"$base/chk"))
      val srcDone = new java.io.File(s"$base/src/_SUCCESS")
      if (!srcDone.isFile) {
        rmrf(new java.io.File(s"$base/src"))
        sh.repartition(8).write.parquet(s"$base/src")
      }
      var state: DataFrame = null
      val q = s.readStream
        .schema(sh.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$base/src")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.select("source", "sh")
          state =
            (if (state == null)
               graft.ops.Incremental.minhashStates(
                 b, Seq("source"), "sh", numHashes = 8)
             else
               graft.ops.Incremental.mergeMinhashStates(
                 state, b, Seq("source"), "sh", numHashes = 8))
              .localCheckpoint() // keys×hashes-sized; cut lineage
          ()
        }
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state
    }},
    "q_hhi" -> { (s, dir) =>
      // user-concentration index per event stream; two combinable aggs
      graft.ops.Stats.herfindahlByGroup(
        t(s, dir, "events"), Seq("event_type"), col("user_id"))
    },
    "q_new_users" -> { (s, dir) =>
      // daily growth accounting: active/new/returning users and the
      // exact cumulative distinct-to-date (= running sum of first-seen)
      graft.ops.TimeSeries.newVsReturning(
        t(s, dir, "events"), col("user_id"), col("ts").cast("date"))
    },
    "q_ndcg" -> { (s, dir) =>
      // daily NDCG@20 of ranking by value against purchase relevance;
      // the position-discount table is one JVM computation shared as
      // literals by this plan AND the oracle SQL — no runtime log2
      graft.ops.Stats.ndcgAtK(
        t(s, dir, "events").withColumn("day", col("ts").cast("date")),
        Seq("day"), col("value"), col("event_type") === "purchase",
        k = 20, tie = col("event_id"))
    },
    "q_top_paths" -> { (s, dir) =>
      // first-3-event paths per user with exact ppm shares
      graft.ops.TimeSeries.topPaths(
        t(s, dir, "events"), col("user_id"), col("event_type"),
        Seq(col("ts"), col("event_id")), depth = 3)
    },
    "q_incr_quantile" -> { (s, dir) =>
      // self-maintainable grid quantiles: histogram states from the
      // first half of the month, second half folded in — the disjoint
      // count-merge must read off the same p50/p90/p99 as from-scratch
      val ev = t(s, dir, "events")
        .withColumn("d", dayofmonth(col("ts")))
      val base = graft.ops.Incremental.histStates(
        ev.filter(col("d") <= 15), Seq("event_type"), col("value"),
        0.0, 500.0, 1000)
      val merged = graft.ops.Incremental.mergeHistStates(
        base, ev.filter(col("d") > 15), Seq("event_type"),
        col("value"), 0.0, 500.0, 1000)
      graft.ops.Incremental.quantileFromHist(
        merged, Seq("event_type"), 0.0, 500.0, 1000,
        Seq((0.5, "p50"), (0.9, "p90"), (0.99, "p99")))
    },
    "q_sql_bounds" -> { (s, dir) =>
      // the SQL face of the bounds measurement at the deterministic
      // epsilon=inf path: power-of-two-bin SVT scan, DuckDB-replayable
      graft.plans.GraftFunctions.register(s)
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .createOrReplaceTempView("lineitem_sql_bounds")
      s.sql("""
        SELECT l_returnflag, b.lower AS lo, b.upper AS hi FROM (
          SELECT l_returnflag,
            dp_bounds(l_quantity, CAST('Infinity' AS DOUBLE)) AS b
          FROM lineitem_sql_bounds GROUP BY 1)
      """)
    }
  )

  /** DataFrameDomain with float columns marked clean (no null/NaN/inf) —
    * the DP aggregation operators require a clean measure column, and the
    * fixture columns are in fact clean.
    */
  private def dom2(df: DataFrame): DataFrameDomain =
    DataFrameDomain(df.schema.fields.toSeq.map { f =>
      f.name -> ColumnDescriptor(f.dataType)
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a rows-only check for those).
    */
  /** Absolute path the q_host_agg_psl oracle reads the PSL snapshot
    * from: the classpath resource `loadPsl` itself uses, materialized
    * byte-for-byte to a stable file under `java.io.tmpdir` (atomic
    * replace, so a concurrent reader never sees a torn file). Keeps the
    * oracle independent of where the repo is checked out AND provably
    * reading the same bytes as the engine — a path into `src/main/
    * resources` could drift from the jar/classpath copy.
    */
  private lazy val pslOraclePath: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val res = "graft/public_suffix_list.dat"
    val in = Thread.currentThread.getContextClassLoader
      .getResourceAsStream(res)
    require(in != null, s"classpath resource not found: $res")
    val bytes = try in.readAllBytes() finally in.close()
    val dir = Paths.get(System.getProperty("java.io.tmpdir"))
    val target = dir.resolve("graft_psl_snapshot.dat")
    val tmp = Files.createTempFile(dir, "graft_psl_", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    target.toString
  }

  /** Shared CTE chain for the q_url_* oracles: `u` rebuilds [[docUrl]]'s
    * messy URL in SQL, `p` parses it with the same regex UrlOps uses,
    * and `c` applies the same canonicalization rules; `body` selects from
    * `c` (columns: doc_id, n_chars, url, host, canon).
    */
  private def urlOracle(body: String): String = {
    val re = "^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]+)" +
      "(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
    s"""WITH u AS (
       |  SELECT doc_id, n_chars,
       |    (CASE WHEN doc_id%3=0 THEN 'HTTP' ELSE 'https' END) || '://' ||
       |    (CASE WHEN doc_id%2=0 THEN upper(source) || '.CO.UK'
       |          ELSE source || '.example.com' END) ||
       |    (CASE WHEN doc_id%4=0 THEN ':443' WHEN doc_id%4=1 THEN ':80'
       |          WHEN doc_id%4=2 THEN ':8080' ELSE '' END) ||
       |    (CASE WHEN doc_id%5=0 THEN ''
       |          ELSE '/docs/' || CAST(doc_id%10 AS VARCHAR) END) ||
       |    '?utm_source=feed&b=' || CAST(doc_id%2 AS VARCHAR) ||
       |    '&a=' || CAST(doc_id%3 AS VARCHAR) ||
       |    (CASE WHEN doc_id%2=1 THEN '#sec' ELSE '' END) AS url
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, n_chars, url,
       |    lower(regexp_extract(url, '$re', 1)) AS scheme,
       |    regexp_replace(lower(regexp_extract(url, '$re', 3)), '\\.$$', '')
       |      AS host,
       |    regexp_extract(url, '$re', 4) AS port,
       |    regexp_extract(url, '$re', 5) AS path,
       |    regexp_extract(url, '$re', 6) AS query
       |  FROM u
       |), k AS (
       |  SELECT *, coalesce(list_aggregate(list_sort(list_filter(
       |      str_split(query, '&'),
       |      q -> NOT (starts_with(q, 'utm_') OR starts_with(q, 'gclid=')
       |        OR starts_with(q, 'fbclid=') OR starts_with(q, 'msclkid=')
       |        OR starts_with(q, 'ref=') OR q = ''))),
       |      'string_agg', '&'), '') AS kept
       |  FROM p
       |), c AS (
       |  SELECT doc_id, n_chars, url, host,
       |    scheme || '://' || host ||
       |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |          OR (scheme = 'https' AND port = '443')
       |          THEN '' ELSE ':' || port END) ||
       |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
       |    (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS canon
       |  FROM k
       |)
       |$body""".stripMargin
  }

  /** DuckDB replica of [[graft.ops.Extraction.decodeEntities]]: the same
    * six replacements in the same order (`&amp;` last). */
  private def sqlEntities(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(e) { case (c, (a, b)) => s"replace($c, '$a', '$b')" }

  /** DuckDB replica of [[graft.ops.Extraction.stripHtml]]: the identical
    * regex chain (Java∩RE2 common subset) with the 'g' option standing
    * in for Java's replace-all default. */
  private def sqlStrip(e: String): String = {
    val noScript =
      s"regexp_replace($e, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noCom = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noCom, '(?s)<[^>]*>', ' ', 'g')"
    // [ \t\n\f\r], not \s: Java's \s includes \x0B, RE2's does not
    "trim(regexp_replace(" + sqlEntities(noTags) +
      ", '[ \\t\\n\\f\\r]+', ' ', 'g'))"
  }

  /** Shared CTE for the q_html_strip / q_extract_links / q_link_domains
    * oracles: `h` rebuilds [[docHtml]]'s page string in DuckDB (columns:
    * doc_id, html); `body` selects from it. (q_c4_filter builds its own
    * self-contained CTE over [[docLines]] instead.) */
  private def htmlOracle(body: String): String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    '<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) ||
       |    ' &amp; notes </title>' ||
       |    (CASE WHEN doc_id%2=0 THEN
       |      '<script type="text/javascript">if (1 < 2) { track(); }</script>'
       |      ELSE '' END) ||
       |    (CASE WHEN doc_id%3=0 THEN '<style>p { color: #333; }</style>'
       |      ELSE '' END) ||
       |    '</head><body>' ||
       |    (CASE WHEN doc_id%4=0 THEN '<!-- render' || chr(10) || 'hint -->'
       |      ELSE '' END) ||
       |    '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
       |    ' &lt;tagged&gt; &quot;quoted&quot; &#39;x&#39;&nbsp;end</p>' ||
       |    '<a href="https://site' || CAST(doc_id%7 AS VARCHAR) || '.co.uk/p/'
       |      || CAST((doc_id*3)%11 AS VARCHAR) || '">more</a>' ||
       |    '<a HREF="HTTP://News' || CAST(doc_id%5 AS VARCHAR) ||
       |      '.example.com:80/a?utm_source=x&amp;id=' ||
       |      CAST(doc_id%4 AS VARCHAR) || '">news</a>' ||
       |    (CASE WHEN doc_id%3=1 THEN '<a href="/relative/skip">rel</a>'
       |      ELSE '' END) ||
       |    '</body></html>' AS html
       |  FROM documents
       |)
       |$body""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q3_revenue" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,
    "q6_discount_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q18_large_orders" ->
      """SELECT o_orderkey, o_custkey, round(qty, 2) AS qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) b
        |ON o_orderkey = b.l_orderkey""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 25 AND l_discount < 0.05""".stripMargin,
    "q_select" -> "SELECT c_custkey, c_mktsegment FROM customer",
    "q_rename" -> "SELECT c_custkey AS id, c_mktsegment AS segment FROM customer",
    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem""".stripMargin,
    "q_flatmap" ->
      """SELECT o_orderkey, o_custkey, g
        |FROM orders, generate_series(1, 2) AS t(g)
        |WHERE g <= least(1 + o_orderkey % 3, 2)""".stripMargin,
    "q_flatmap_bykey" ->
      """SELECT l_orderkey, count(*) AS n_lines
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_dropnulls" ->
      """SELECT event_id, value FROM events WHERE value < 100.0""".stripMargin,
    "q_replacenulls" ->
      """SELECT event_id,
        |  CASE WHEN value < 100.0 THEN value ELSE -1.0 END AS value
        |FROM events""".stripMargin,
    "q_dropnans" ->
      "SELECT event_id, value FROM events WHERE value < 100.0",
    "q_replacenans" ->
      """SELECT event_id,
        |  CASE WHEN value < 100.0 THEN value ELSE -1.0 END AS value
        |FROM events""".stripMargin,
    "q_dropinfs" ->
      "SELECT event_id, value FROM events WHERE value < 100.0",
    "q_replaceinfs" ->
      """SELECT event_id,
        |  CASE WHEN value < 100.0 THEN value ELSE 999.0 END AS value
        |FROM events""".stripMargin,
    "q_count" -> "SELECT count(*) AS count FROM lineitem",
    "q_count_distinct" ->
      "SELECT count(*) AS count FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)",
    "q_sum_clipped" ->
      "SELECT sum(least(greatest(l_quantity, 5), 30)) AS sum FROM lineitem",
    "q_groupby_count" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus, coalesce(c.count, 0) AS count
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus, count(*) AS count
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_groupby_sum" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus,
        |  round(coalesce(c.sum, 0), 4) AS sum
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus,
        |             sum(least(greatest(l_quantity, 5), 30)) AS sum
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_groupby_domains" ->
      """SELECT ks.c_mktsegment, ks.c_nationkey, coalesce(c.count, 0) AS count
        |FROM (SELECT s.c_mktsegment, CAST(n.g AS INTEGER) AS c_nationkey
        |      FROM (VALUES ('AUTOMOBILE'),('BUILDING'),('FURNITURE'),
        |                   ('HOUSEHOLD'),('MACHINERY')) s(c_mktsegment)
        |      CROSS JOIN generate_series(0, 24) n(g)) ks
        |LEFT JOIN (SELECT c_mktsegment, c_nationkey, count(*) AS count
        |           FROM customer GROUP BY 1, 2) c
        |USING (c_mktsegment, c_nationkey)""".stripMargin,
    "q_count_distinct_grouped" ->
      """SELECT ks.o_orderstatus, coalesce(c.count, 0) AS count
        |FROM (VALUES ('F'),('O'),('P'),('Z')) AS ks(o_orderstatus)
        |LEFT JOIN (SELECT o_orderstatus, count(*) AS count
        |           FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
        |           GROUP BY 1) c
        |USING (o_orderstatus)""".stripMargin,
    "q_public_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_nationkey, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_public_join_left" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment
        |FROM orders LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
        |                       WHERE c_custkey % 2 = 0) c
        |ON o_custkey = c_custkey""".stripMargin,
    "q_join_nullsafe" ->
      """WITH o AS (SELECT o_orderkey,
        |             CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
        |           FROM orders),
        |     c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END AS k,
        |             c_nationkey
        |           FROM customer)
        |SELECT o.k AS k, o_orderkey, c_nationkey
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k""".stripMargin,
    // truncation hashes mirror Truncation.colsHash: sha256 over Spark's
    // to_json(struct(c0 := CAST(col AS STRING), ...)) — replicated here with
    // DuckDB's to_json(struct_pack(...)) (same canonical {"c0":"v",...} text,
    // parity established by q_add_unique)
    "q_private_join" ->
      """WITH l AS (
        |  SELECT custkey, o_orderkey FROM (
        |    SELECT o_custkey AS custkey, o_orderkey,
        |      row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY sha256(to_json(struct_pack(
        |                   c0 := CAST(o_custkey AS VARCHAR),
        |                   c1 := CAST(o_orderkey AS VARCHAR)))::VARCHAR),
        |                 custkey, o_orderkey) AS rn
        |    FROM orders) WHERE rn <= 2),
        |r AS (
        |  SELECT o_orderkey, l_linenumber FROM (
        |    SELECT l_orderkey AS o_orderkey, l_linenumber,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY sha256(to_json(struct_pack(
        |                   c0 := CAST(l_orderkey AS VARCHAR),
        |                   c1 := CAST(l_linenumber AS VARCHAR)))::VARCHAR),
        |                 o_orderkey, l_linenumber) AS rn
        |    FROM lineitem) WHERE rn <= 3)
        |SELECT o_orderkey, custkey, l_linenumber FROM l JOIN r USING (o_orderkey)""".stripMargin,
    "q_truncate_rows" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY sha256(to_json(struct_pack(
        |                 c0 := CAST(o_custkey AS VARCHAR),
        |                 c1 := CAST(o_orderkey AS VARCHAR)))::VARCHAR),
        |               o_custkey, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin,
    "q_drop_large_groups" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders) WHERE cnt <= 10""".stripMargin,
    "q_limit_keys" ->
      """SELECT l_suppkey, l_orderkey FROM (
        |  SELECT l_suppkey, l_orderkey,
        |    dense_rank() OVER (PARTITION BY l_suppkey
        |      ORDER BY sha256(to_json(struct_pack(
        |                 c0 := CAST(l_orderkey AS VARCHAR)))::VARCHAR),
        |               l_orderkey) AS dr
        |  FROM lineitem) WHERE dr <= 5""".stripMargin,
    "q_noisy_count" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus, coalesce(c.count, 0) AS count
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus, count(*) AS count
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_noisy_sum" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus,
        |  round(coalesce(c.sum, 0), 4) AS sum
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus,
        |             sum(least(greatest(l_quantity, 0), 50)) AS sum
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_noisy_avg" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus,
        |  round(coalesce(c.sod, 0) / greatest(coalesce(c.count, 0), 1) + 25.5, 6) AS average
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus,
        |             sum(least(greatest(l_quantity, 1), 50) - 25.5) AS sod,
        |             count(*) AS count
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_noisy_var" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus,
        |  CASE WHEN coalesce(c.count, 0) <= 1 THEN 'NaN'::DOUBLE
        |    ELSE round(least(greatest(
        |      (c.sos - c.sod * c.sod / c.count) / (c.count - 1), 0), 600.25), 6)
        |  END AS variance
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus,
        |             sum(least(greatest(l_quantity - 25.5, -24.5), 24.5)) AS sod,
        |             sum(least(greatest(pow(l_quantity - 25.5, 2), 0), 600.25)) AS sos,
        |             count(*) AS count
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_noisy_stddev" ->
      s"""SELECT ks.l_returnflag, ks.l_linestatus,
        |  CASE WHEN coalesce(c.count, 0) <= 1 THEN 'NaN'::DOUBLE
        |    ELSE round(sqrt(least(greatest(
        |      (c.sos - c.sod * c.sod / c.count) / (c.count - 1), 0), 600.25)), 6)
        |  END AS stddev
        |FROM $rfLsKeysSql
        |LEFT JOIN (SELECT l_returnflag, l_linestatus,
        |             sum(least(greatest(l_quantity - 25.5, -24.5), 24.5)) AS sod,
        |             sum(least(greatest(pow(l_quantity - 25.5, 2), 0), 600.25)) AS sos,
        |             count(*) AS count
        |           FROM lineitem GROUP BY 1, 2) c
        |USING (l_returnflag, l_linestatus)""".stripMargin,
    "q_sql_dp" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS noisy_count,
        |  count(DISTINCT l_quantity) AS noisy_distinct,
        |  count(*) AS noise_passthrough,
        |  round(sum(least(greatest(l_quantity, 0.0), 50.0)), 4) AS noisy_sum,
        |  round(sum(least(greatest(l_quantity - 25.5, -24.5), 24.5))
        |          / greatest(count(*), 1) + 25.5, 6) AS noisy_avg,
        |  CASE WHEN count(*) <= 1 THEN 'NaN'::DOUBLE ELSE
        |    round(least(greatest(
        |      (sum(least(greatest(pow(l_quantity - 25.5, 2), 0), 600.25))
        |         - pow(sum(least(greatest(l_quantity - 25.5, -24.5), 24.5)), 2)
        |             / count(*))
        |        / (count(*) - 1), 0), 600.25), 6) END AS noisy_var,
        |  CASE WHEN count(*) <= 1 THEN 'NaN'::DOUBLE ELSE
        |    round(sqrt(least(greatest(
        |      (sum(least(greatest(pow(l_quantity - 25.5, 2), 0), 600.25))
        |         - pow(sum(least(greatest(l_quantity - 25.5, -24.5), 24.5)), 2)
        |             / count(*))
        |        / (count(*) - 1), 0), 600.25)), 6) END AS noisy_stddev
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // q_sql_quantile: dp_quantile at infinite epsilon = interpolated
    // quantile over clipped values = DuckDB quantile_cont (both R-7)
    "q_sql_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(least(greatest(l_quantity, 1.0), 50.0), 0.25), 6) AS p25,
        |  round(quantile_cont(least(greatest(l_quantity, 1.0), 50.0), 0.5), 6) AS p50,
        |  round(quantile_cont(least(greatest(l_quantity, 1.0), 50.0), 0.75), 6) AS p75
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_quantile" ->
      """SELECT ks.l_returnflag,
        |  round(coalesce(c.median, 25.5), 6) AS median
        |FROM (VALUES ('A'),('N'),('R')) AS ks(l_returnflag)
        |LEFT JOIN (SELECT l_returnflag,
        |             quantile_cont(least(greatest(l_quantity, 1), 50), 0.5) AS median
        |           FROM lineitem GROUP BY 1) c
        |USING (l_returnflag)""".stripMargin,
    "q_agg_by_column" ->
      """SELECT ks.event_type,
        |  round(coalesce(c.v_med, 200.0), 6) AS v_med,
        |  coalesce(c.v_n, 0) AS v_n
        |FROM (VALUES ('click'),('error'),('purchase'),('refund'),('signup'),('view'))
        |  AS ks(event_type)
        |LEFT JOIN (SELECT event_type,
        |             quantile_cont(least(greatest(value, 0), 400), 0.5) AS v_med,
        |             count(value) AS v_n
        |           FROM events GROUP BY 1) c
        |USING (event_type)""".stripMargin,
    "q_partition_selection" ->
      """SELECT user_id, count(*) AS count
        |FROM events GROUP BY 1 HAVING count(*) >= 5""".stripMargin,
    "q_sql_partition" ->
      """SELECT user_id, count(*) AS count
        |FROM events GROUP BY 1 HAVING count(*) >= 5""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,
    // q_url_*: the oracle rebuilds the identical messy URL, then replays
    // the normalizer rule-for-rule (same regex, same tracking-param
    // filter, same byte-lexicographic param sort) — an independent SQL
    // implementation, not a shortcut to the expected output
    "q_url_normalize" -> urlOracle("SELECT doc_id, url, canon FROM c"),
    "q_url_dedup" ->
      urlOracle("SELECT min(doc_id) AS doc_id FROM c GROUP BY canon"),
    "q_host_agg" -> urlOracle(
      """SELECT domain, count(*) AS n_pages, count(DISTINCT canon) AS n_urls,
        |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_quality
        |FROM (
        |  SELECT CASE
        |      WHEN len(labs) >= 3 AND (labs[-2] || '.' || labs[-1]) IN
        |        ('co.uk','ac.uk','gov.uk','org.uk','co.jp','ne.jp','or.jp',
        |         'com.au','net.au','org.au','com.br','com.cn','com.mx',
        |         'co.in','co.kr','co.za','com.tw','com.sg','com.ar')
        |        THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
        |      WHEN len(labs) >= 2 THEN labs[-2] || '.' || labs[-1]
        |      ELSE host END AS domain,
        |    canon, n_chars
        |  FROM (SELECT *, str_split(host, '.') AS labs FROM c)
        |) WHERE domain <> '' GROUP BY domain""".stripMargin),
    // q_host_agg_psl: independent replica of the full-width PSL
    // longest-match (read straight from the bundled MPL-licensed
    // snapshot; candidate suffixes of 1..5 labels equi-joined against
    // the rule table; wildcard tails match one label longer when that
    // label exists; exception rules prevail at their length minus one;
    // unlisted TLD falls back to the implicit '*' rule), the eTLD+1
    // slice, then the same rollup. The host rewrite mirrors the entry's
    // wildcard/exception rehosting.
    "q_host_agg_psl" -> urlOracle(
      s""", praw AS (
        |  SELECT trim(rule) AS rule FROM read_csv(
        |    '$pslOraclePath',
        |    header=false, columns={'rule':'VARCHAR'}, delim='\\t', quote='')
        |), prules AS (
        |  SELECT CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
        |              WHEN rule LIKE '*.%' THEN substr(rule, 3)
        |              ELSE rule END AS s,
        |         CASE WHEN rule LIKE '!%' THEN 'x'
        |              WHEN rule LIKE '*.%' THEN 'w' ELSE 'e' END AS kind
        |  FROM praw WHERE rule <> '' AND rule NOT LIKE '//%'
        |), ch AS (
        |  SELECT c.doc_id, c.canon, c.n_chars,
        |    CASE WHEN c.doc_id % 7 = 3 THEN 'web.' || d0.source || '.ck'
        |         WHEN c.doc_id % 11 = 5 THEN 'sub.www.ck'
        |         ELSE c.host END AS host
        |  FROM c JOIN documents d0 ON c.doc_id = d0.doc_id
        |), hl AS (
        |  SELECT doc_id, canon, n_chars, host,
        |    str_split(lower(host), '.') AS labs,
        |    len(str_split(host, '.')) AS n
        |  FROM ch
        |), cand AS (
        |  SELECT doc_id, n, i, array_to_string(labs[n-i+1:], '.') AS cs
        |  FROM hl, range(1, 6) t(i) WHERE n >= i
        |), m AS (
        |  SELECT doc_id,
        |    max(CASE WHEN r.kind = 'e' THEN i
        |             WHEN r.kind = 'w' AND cand.n > i THEN i + 1 END) AS mlen,
        |    max(CASE WHEN r.kind = 'x' THEN i - 1 END) AS exc
        |  FROM cand JOIN prules r ON cand.cs = lower(r.s)
        |  GROUP BY doc_id
        |), d AS (
        |  SELECT canon, n_chars,
        |    CASE WHEN n > el
        |         THEN array_to_string(labs[n-el:], '.') END AS domain
        |  FROM (SELECT hl.canon, hl.n_chars, hl.n, hl.labs,
        |          coalesce(m.exc, m.mlen, 1) AS el
        |        FROM hl LEFT JOIN m ON hl.doc_id = m.doc_id)
        |)
        |SELECT domain, count(*) AS n_pages, count(DISTINCT canon) AS n_urls,
        |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_quality
        |FROM d WHERE domain IS NOT NULL GROUP BY domain""".stripMargin),
    // q_html_strip: rule-for-rule replica of the strip chain (script,
    // style, comment, tag, entities with &amp; last, whitespace)
    "q_html_strip" -> htmlOracle(
      "SELECT doc_id, " +
        sqlStrip("regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)") +
        " AS title, " + sqlStrip("html") + " AS text_clean FROM h"),
    "q_extract_links" -> htmlOracle(
      s"""SELECT doc_id, ${sqlEntities("raw")} AS link FROM (
         |  SELECT doc_id, unnest(regexp_extract_all(html,
         |    '(?i)href\\s*=\\s*"([^"]*)"', 1)) AS raw
         |  FROM h)""".stripMargin),
    "q_link_domains" -> {
      val re = "^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]+)" +
        "(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
      htmlOracle(
        s""", l AS (
           |  SELECT doc_id, ${sqlEntities("raw")} AS link FROM (
           |    SELECT doc_id, unnest(regexp_extract_all(html,
           |      '(?i)href\\s*=\\s*"([^"]*)"', 1)) AS raw
           |    FROM h)
           |), p AS (
           |  SELECT doc_id, link,
           |    lower(regexp_extract(link, '$re', 1)) AS scheme,
           |    regexp_replace(lower(regexp_extract(link, '$re', 3)),
           |      '\\.$$', '') AS host,
           |    regexp_extract(link, '$re', 4) AS port,
           |    regexp_extract(link, '$re', 5) AS path,
           |    regexp_extract(link, '$re', 6) AS query
           |  FROM l
           |), k AS (
           |  SELECT *, coalesce(list_aggregate(list_sort(list_filter(
           |      str_split(query, '&'),
           |      q -> NOT (starts_with(q, 'utm_') OR starts_with(q, 'gclid=')
           |        OR starts_with(q, 'fbclid=') OR starts_with(q, 'msclkid=')
           |        OR starts_with(q, 'ref=') OR q = ''))),
           |      'string_agg', '&'), '') AS kept
           |  FROM p WHERE regexp_extract(link, '$re', 1) <> ''
           |), c AS (
           |  SELECT doc_id, host,
           |    scheme || '://' || host ||
           |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
           |          OR (scheme = 'https' AND port = '443')
           |          THEN '' ELSE ':' || port END) ||
           |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
           |    (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS canon
           |  FROM k
           |)
           |SELECT domain, count(*) AS n_links,
           |  count(DISTINCT canon) AS n_targets,
           |  count(DISTINCT doc_id) AS n_sources
           |FROM (
           |  SELECT doc_id, canon, CASE
           |      WHEN len(labs) >= 3 AND (labs[-2] || '.' || labs[-1]) IN
           |        ('co.uk','ac.uk','gov.uk','org.uk','co.jp','ne.jp','or.jp',
           |         'com.au','net.au','org.au','com.br','com.cn','com.mx',
           |         'co.in','co.kr','co.za','com.tw','com.sg','com.ar')
           |        THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
           |      WHEN len(labs) >= 2 THEN labs[-2] || '.' || labs[-1]
           |      ELSE host END AS domain
           |  FROM (SELECT *, str_split(host, '.') AS labs FROM c)
           |) WHERE domain <> '' GROUP BY domain""".stripMargin)
    },
    // q_c4_filter: C4 line rules replayed with DuckDB list lambdas;
    // string_agg over an empty list is NULL -> coalesce to '' to match
    // Spark's array_join
    "q_c4_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'This document number ' || CAST(doc_id AS VARCHAR) ||
        |      ' begins with a proper sentence.' || chr(10) ||
        |    'menu' || chr(10) ||
        |    (CASE WHEN doc_id%3=0
        |      THEN 'Please enable JavaScript to continue viewing.'
        |      ELSE 'Another perfectly fine sentence follows here.' END)
        |      || chr(10) ||
        |    (CASE WHEN doc_id%5=0 THEN 'function() { return 42; }'
        |      ELSE 'Does the final line end with a question?' END)
        |      || chr(10) ||
        |    (CASE WHEN doc_id%7=0 THEN 'Lorem ipsum dolor sit amet.'
        |      ELSE '' END) AS text
        |  FROM documents
        |), y AS (
        |  SELECT doc_id, text,
        |    list_transform(str_split(text, chr(10)), l -> trim(l)) AS lines,
        |    list_filter(list_transform(str_split(text, chr(10)), l -> trim(l)),
        |      l -> regexp_matches(l, '[.!?"]$')
        |        AND len(regexp_split_to_array(l, '[ \t\n\f\r]+')) >= 5
        |        AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM d
        |)
        |SELECT doc_id,
        |  coalesce(list_aggregate(kept, 'string_agg', chr(10)), '')
        |    AS clean_text,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  (len(kept) >= 3 AND NOT contains(text, '{')
        |    AND NOT contains(lower(text), 'lorem ipsum')) AS page_ok
        |FROM y""".stripMargin,
    // q_gopher_filter: Gopher A1.1 rules replayed with DuckDB list
    // lambdas; every ratio is the same quotient of exact integers the
    // Spark expressions compute, so the rule booleans are IEEE-identical
    "q_gopher_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) ||
        |    (CASE WHEN doc_id%4=0
        |      THEN '-first bullet line' || chr(10) || '-second bullet line'
        |      ELSE 'A plain closing line.' END) || chr(10) ||
        |    (CASE WHEN doc_id%5=0 THEN 'to be continued...'
        |      ELSE 'The end is here.' END) || chr(10) ||
        |    (CASE WHEN doc_id%6=0 THEN '#tag #spam ### extra' ELSE 'clean' END)
        |      AS text
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '[ \t\n\f\r]+'),
        |      x -> x <> '') AS words,
        |    list_transform(str_split(text, chr(10)), l -> trim(l)) AS lines
        |  FROM d
        |), s AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CASE WHEN len(words)=0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
        |        / CAST(len(words) AS DOUBLE) END AS mean_word_len,
        |    CASE WHEN len(words)=0 THEN 0.0 ELSE
        |      ((len(text) - len(replace(text,'#','')))
        |        + (len(text) - len(replace(text,'...','')))/3
        |        + (len(text) - len(replace(text,'…',''))))
        |      / CAST(len(words) AS DOUBLE) END AS symbol_ratio,
        |    len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))
        |      / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |    len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$')))
        |      / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |    CASE WHEN len(words)=0 THEN 0.0 ELSE
        |      len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
        |      / CAST(len(words) AS DOUBLE) END AS alpha_frac,
        |    (CAST(list_contains(list_transform(words, x -> lower(x)), 'the') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'be') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'to') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'of') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'and') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'that') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'have') AS BIGINT)
        |     + CAST(list_contains(list_transform(words, x -> lower(x)), 'with') AS BIGINT)
        |    ) AS stop_hits
        |  FROM w
        |)
        |SELECT doc_id, n_words,
        |  round(mean_word_len, 6) AS mean_word_len,
        |  round(symbol_ratio, 6) AS symbol_ratio,
        |  round(bullet_frac, 6) AS bullet_frac,
        |  round(ellipsis_frac, 6) AS ellipsis_frac,
        |  round(alpha_frac, 6) AS alpha_frac,
        |  stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1
        |    AND bullet_frac <= 0.9
        |    AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8
        |    AND stop_hits >= 2) AS gopher_ok
        |FROM s""".stripMargin,
    // q_bm25: full Okapi BM25 replica; every double is parenthesized to
    // associate exactly as the Spark expressions (idf product first, then
    // the tf weight as one parenthesized quotient), and per-term scores
    // are rounded to integer ppm before the order-free sum
    "q_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        |      x -> x <> '') AS t
        |  FROM documents
        |), lens AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d
        |), stats AS (
        |  SELECT count(*) AS n, sum(dl) AS sumdl FROM lens
        |), posts AS (
        |  SELECT doc_id, w AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS w FROM d) GROUP BY 1, 2
        |), q AS (
        |  SELECT * FROM (VALUES ('q1', 'Spark JOIN merge'),
        |                        ('q2', 'customer order value'),
        |                        ('q3', 'vector hash scan zzzabsent')) AS q(query_id, query_text)
        |), qt AS (
        |  SELECT DISTINCT query_id, w AS term FROM (
        |    SELECT query_id,
        |      unnest(list_filter(string_split(regexp_replace(lower(query_text), '[^a-z0-9]+', ' ', 'g'), ' '),
        |        x -> x <> '')) AS w
        |    FROM q)
        |), dfs AS (
        |  SELECT term, count(*) AS df FROM posts
        |  WHERE term IN (SELECT term FROM qt) GROUP BY 1
        |), sc AS (
        |  SELECT qt.query_id, p.doc_id,
        |    CAST(round(1000000.0 * ln(1 + (CAST(s.n AS DOUBLE) - df + 0.5) / (df + 0.5))
        |      * ((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / (CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE)))))) AS BIGINT) AS ppm
        |  FROM qt JOIN posts p USING (term) JOIN dfs USING (term)
        |    JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN stats s
        |), agg AS (
        |  SELECT query_id, doc_id, CAST(sum(ppm) AS BIGINT) AS score_ppm FROM sc GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, score_ppm, rank FROM (
        |  SELECT query_id, doc_id, score_ppm,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS rank
        |  FROM agg
        |) WHERE rank <= 5""".stripMargin,
    // q_composition: shares are divisions of exact integers; the entropy
    // term parenthesizes (−1e6 · p) · ln(p) exactly as the operator
    "q_composition" ->
      """WITH g AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS n_size
        |  FROM documents GROUP BY 1
        |), t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
        |                CAST(sum(n_size) AS BIGINT) AS ts FROM g)
        |SELECT source, n_docs, n_size,
        |  CAST(round(1000000.0 * CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 0) AS BIGINT)
        |    AS doc_share_ppm,
        |  CAST(round(1000000.0 * CAST(n_size AS DOUBLE) / CAST(ts AS DOUBLE), 0) AS BIGINT)
        |    AS size_share_ppm,
        |  CAST(round(-1000000.0 * (CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE))
        |    * ln(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE)), 0) AS BIGINT)
        |    AS doc_entropy_term_ppm
        |FROM g CROSS JOIN t""".stripMargin,
    // q_tfidf: same tokenizer and ppm-rounding discipline as q_bm25; the
    // smoothed idf ln((N+1)/(df+1)) + 1 is parenthesized exactly as the
    // operator computes it
    "q_tfidf" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        |      x -> x <> '') AS t
        |  FROM documents
        |), n AS (SELECT count(*) AS n FROM d),
        |tfc AS (
        |  SELECT doc_id, w AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS w FROM d) GROUP BY 1, 2
        |), dfc AS (
        |  SELECT term, count(*) AS doc_freq FROM tfc GROUP BY 1
        |), scored AS (
        |  SELECT doc_id, term, tf, doc_freq,
        |    CAST(round(1000000.0 * tf *
        |      (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0), 0) AS BIGINT)
        |      AS score_ppm
        |  FROM tfc JOIN dfc USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, tf, doc_freq, score_ppm, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_ppm DESC, term) AS rank
        |  FROM scored
        |) WHERE rank <= 5""".stripMargin,
    // q_cosine_text: brute-force replay of the prefix-filtered all-pairs
    // cosine join — same ppm tf-idf weights as q_tfidf, L2-requantized to
    // integer ppm, exact integer dots (DuckDB widens the sums to HUGEINT
    // internally; outputs are cast), cosine as the identical IEEE tree
    "q_cosine_text" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        |      x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 10 = 0
        |), n AS (SELECT count(*) AS n FROM d),
        |tfc AS (
        |  SELECT doc_id, w AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS w FROM d) GROUP BY 1, 2
        |), dfc AS (
        |  SELECT term, count(*) AS doc_freq FROM tfc GROUP BY 1
        |), wt AS (
        |  SELECT doc_id, term,
        |    CAST(round(1000000.0 * tf *
        |      (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0), 0) AS BIGINT)
        |      AS w
        |  FROM tfc JOIN dfc USING (term) CROSS JOIN n
        |), wf AS (SELECT * FROM wt WHERE w > 0),
        |n2 AS (SELECT doc_id, sum(w * w) AS n2 FROM wf GROUP BY 1),
        |q AS (
        |  SELECT wf.doc_id, term,
        |    CAST(round(1000000.0 * CAST(w AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)), 0) AS BIGINT) AS q
        |  FROM wf JOIN n2 USING (doc_id)
        |), qf AS (SELECT * FROM q WHERE q > 0),
        |qn AS (SELECT doc_id, sum(q * q) AS qn2 FROM qf GROUP BY 1),
        |dots AS (
        |  SELECT a.doc_id AS l, b.doc_id AS r, sum(a.q * b.q) AS dot
        |  FROM qf a JOIN qf b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT l AS left_id, r AS right_id,
        |  CAST(dot AS DOUBLE) / (sqrt(CAST(x.qn2 AS DOUBLE)) * sqrt(CAST(y.qn2 AS DOUBLE))) AS cosine
        |FROM dots JOIN qn x ON x.doc_id = l JOIN qn y ON y.doc_id = r
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.qn2 AS DOUBLE)) * sqrt(CAST(y.qn2 AS DOUBLE))) >= 0.7""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,
    "q_quality" ->
      """SELECT doc_id, round(
        |  least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
        |  + CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |      least(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
        |        / length(text), 1.0) * 0.5 END, 6) AS quality
        |FROM documents""".stripMargin,
    // q_repetition: DuckDB replays the same planted-line construction, then
    // computes identical formulas — the Spark side ranks grams by a sorted
    // run-length pass, the oracle by count-per-distinct-gram; both equal
    // occurrences × gram length
    "q_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'repeat me' || chr(10) || 'repeat me' || chr(10)
        |      || 'note ' || CAST(doc_id % 3 AS VARCHAR) AS text
        |  FROM documents
        |), t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
        |                l -> l <> '') AS lines
        |  FROM d
        |), g AS (
        |  SELECT doc_id, lines,
        |    coalesce(list_aggregate(list_transform(toks, x -> length(x)), 'sum'), 0)
        |      + greatest(len(toks) - 1, 0) AS nchars,
        |    CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS g3,
        |    CASE WHEN len(toks) >= 5 THEN list_transform(generate_series(1, len(toks)-4),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |                || toks[i+3] || ' ' || toks[i+4]) ELSE [] END AS g5
        |  FROM t
        |), c AS (
        |  SELECT doc_id, lines, nchars,
        |    coalesce(list_aggregate(list_transform(list_distinct(g2),
        |      x -> len(list_filter(g2, y -> y = x)) * length(x)), 'max'), 0) AS top2,
        |    coalesce(list_aggregate(list_transform(list_distinct(g3),
        |      x -> len(list_filter(g3, y -> y = x)) * length(x)), 'max'), 0) AS top3,
        |    coalesce(list_aggregate(list_transform(
        |      list_filter(list_distinct(g5), x -> len(list_filter(g5, y -> y = x)) >= 2),
        |      x -> len(list_filter(g5, y -> y = x)) * length(x)), 'sum'), 0) AS dup5,
        |    coalesce(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0) AS lc_all,
        |    coalesce(list_aggregate(list_transform(list_distinct(lines), x -> length(x)), 'sum'), 0) AS lc_dist
        |  FROM g
        |)
        |SELECT doc_id,
        |  round(CASE WHEN len(lines) = 0 THEN 0.0
        |    ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
        |         / CAST(len(lines) AS DOUBLE) END, 6) AS rep_dup_line_frac,
        |  round(CASE WHEN lc_all = 0 THEN 0.0
        |    ELSE CAST(lc_all - lc_dist AS DOUBLE) / CAST(lc_all AS DOUBLE) END, 6)
        |    AS rep_dup_line_char_frac,
        |  round(CASE WHEN nchars = 0 THEN 0.0
        |    ELSE CAST(top2 AS DOUBLE) / CAST(nchars AS DOUBLE) END, 6) AS rep_top2_char_frac,
        |  round(CASE WHEN nchars = 0 THEN 0.0
        |    ELSE CAST(top3 AS DOUBLE) / CAST(nchars AS DOUBLE) END, 6) AS rep_top3_char_frac,
        |  round(CASE WHEN nchars = 0 THEN 0.0
        |    ELSE CAST(dup5 AS DOUBLE) / CAST(nchars AS DOUBLE) END, 6) AS rep_dup5_char_frac
        |FROM c""".stripMargin,
    "q_rows_per_key_per_group" ->
      """SELECT l_suppkey, l_returnflag FROM (
        |  SELECT l_suppkey, l_returnflag,
        |    row_number() OVER (PARTITION BY l_suppkey, l_returnflag
        |      ORDER BY l_suppkey) AS rn
        |  FROM lineitem) WHERE rn <= 2""".stripMargin,
    "q_grouping_flatmap" ->
      """SELECT l_orderkey, l_linenumber, 'all' AS bucket FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 25 THEN 'lo' ELSE 'hi' END AS bucket
        |FROM lineitem""".stripMargin,
    "q_partition" ->
      """SELECT o_orderstatus, o_orderkey FROM orders
        |WHERE o_orderstatus IN ('F', 'O')""".stripMargin,
    "q_dict_pipeline" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
    "q_private_join_onkey" ->
      """SELECT o_custkey AS custkey, o_orderkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_noisy_count_total" -> "SELECT count(*) AS count FROM lineitem",
    "q_persist_identity" -> "SELECT r_regionkey, r_name FROM region",
    // q_bounds: reference binning — rank = clamp(ceil(log2(|x|)), -100, 100)
    // with x=0 -> -100 (float domain); exact via a two-sided power-of-two
    // fix-up on the log2 candidate. All 201 bins are materialized, so a
    // threshold of 0 (tiny groups) selects bin -100; otherwise the first
    // occupied bin whose cumulative count crosses floor(0.95 n).
    "q_bounds" ->
      """WITH v AS (
        |  SELECT event_type, abs(value) AS mag,
        |    CASE WHEN abs(value) > 0
        |      THEN CAST(ceil(log2(abs(value))) AS BIGINT) END AS r0
        |  FROM events WHERE value IS NOT NULL),
        |rk AS (
        |  SELECT event_type,
        |    CASE WHEN mag = 0 THEN -100
        |      ELSE least(greatest(
        |        CASE WHEN power(2.0, r0 - 1) >= mag THEN r0 - 1
        |             WHEN power(2.0, r0) < mag THEN r0 + 1
        |             ELSE r0 END, -100), 100) END AS rank
        |  FROM v),
        |c AS (SELECT event_type, rank, count(*) AS n FROM rk GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(floor(sum(n) * 0.95) AS BIGINT) AS thr
        |      FROM c GROUP BY 1),
        |p AS (SELECT c.event_type, rank,
        |        sum(n) OVER (PARTITION BY c.event_type ORDER BY rank) AS cum,
        |        thr
        |      FROM c JOIN t USING (event_type)),
        |sel AS (SELECT event_type,
        |          CASE WHEN max(thr) <= 0 THEN -100
        |            ELSE min(CASE WHEN cum >= thr THEN rank END) END AS r
        |        FROM p GROUP BY 1)
        |SELECT event_type, power(2.0, r) AS upper, -power(2.0, r) AS lower
        |FROM sel""".stripMargin,
    "q_window_counts" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
        |  event_type, count(*) AS count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_add_unique" ->
      """SELECT n_regionkey,
        |  sha256(to_json(struct_pack(
        |    c0 := CAST(n_regionkey AS VARCHAR),
        |    rn := CAST(row_number() OVER (PARTITION BY n_regionkey) AS VARCHAR)))::VARCHAR) AS uid
        |FROM nation""".stripMargin,
    "q_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'All rights reserved. Cookie policy applies.'
        |         || chr(10) || 'doc note ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents
        |), l AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS ln,
        |    unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
        |  FROM d
        |), n AS (
        |  SELECT doc_id, pos, ln,
        |    regexp_replace(lower(trim(ln)), '\s+', ' ', 'g') AS norm
        |  FROM l
        |), bp AS (
        |  SELECT norm FROM n WHERE norm <> ''
        |  GROUP BY norm HAVING count(DISTINCT doc_id) > 10
        |), kept AS (
        |  SELECT n.doc_id, n.pos, n.ln FROM n ANTI JOIN bp USING (norm)
        |)
        |SELECT d.doc_id,
        |  coalesce(r.t, '') AS clean_text
        |FROM d LEFT JOIN (
        |  SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS t
        |  FROM kept GROUP BY doc_id
        |) r USING (doc_id)""".stripMargin,
    "q_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM documents""".stripMargin,
    // q_sample_hash: the portable sampler is 60 bits of SHA-256 over
    // "salt|key" — DuckDB computes the identical integer from the identical
    // hex prefix, so membership matches bit-for-bit
    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 10 < 3""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 10 < CASE lang WHEN 'en' THEN 7 WHEN 'de' THEN 5
        |                       WHEN 'zh' THEN 2 ELSE 1 END""".stripMargin,
    "q_top_per_source" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) t WHERE rn <= 5""".stripMargin,
    // q_simhash_pairs: verified output = pairs with equal lowercased token
    // multisets (SimHash is a pure function of the multiset, so recall for
    // such pairs is 1 — see Dedup.simHashVerifiedPairs). The planted rows
    // reuse the original text: reversing token order changes neither the
    // multiset nor the signature.
    "q_simhash_pairs" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 40 = 0
        |), tk AS (
        |  SELECT doc_id,
        |    list_sort(list_filter(string_split_regex(lower(text), '\s+'),
        |              x -> x <> '')) AS tk
        |  FROM base
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id
        |FROM tk a JOIN tk b ON a.tk = b.tk AND a.doc_id < b.doc_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS t
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, t,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |              > INTERVAL '30 minutes'
        |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |), ids AS (
        |  SELECT user_id, t,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, CAST(epoch(min(t)) AS BIGINT) AS ss,
        |  count(*) AS events
        |FROM ids GROUP BY user_id, sid""".stripMargin,
    "q_running_counts" ->
      """SELECT event_type, count(*) AS cnt FROM events GROUP BY 1""".stripMargin,
    "q_dedup_stream" ->
      """SELECT DISTINCT user_id, event_type,
        |  CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |FROM events""".stripMargin,
    "q_interactive" ->
      """SELECT 'total' AS part, count(*) AS count
        |  FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL SELECT 'F', count(*) FROM orders
        |  WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F'
        |UNION ALL SELECT 'O', count(*) FROM orders
        |  WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'O'
        |UNION ALL SELECT 'P', count(*) FROM orders
        |  WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'P'
        |UNION ALL SELECT 'after_split', count(*) FROM orders
        |  WHERE o_orderkey % 2 = 0""".stripMargin,
    "q_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS t, event_id, event_type
        |  FROM events
        |)
        |SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id
        |FROM e l JOIN e r
        |  ON l.user_id = r.user_id AND r.event_type = 'purchase'
        | AND r.t >= l.t - INTERVAL '15 minutes'
        | AND r.t <= l.t + INTERVAL '15 minutes'""".stripMargin,
    // q_asof_join / q_asof_bucketed: DuckDB's native ASOF JOIN is the
    // oracle; the bucketed variant adds the tolerance as a post-filter on
    // the matched row (nearest-prior then age-voided — same contract)
    "q_asof_join" ->
      """WITH l AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS lns, event_id AS l_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS rns, value AS p_val
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.user_id, l.l_id, r.p_val
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lns >= r.rns""".stripMargin,
    // q_heavy_hitters: the sketch's exact path (distinct sources < k) is
    // the GROUP BY relation with the error width pinned to zero
    "q_heavy_hitters" ->
      """SELECT lang, source AS item, count(*) AS count_min,
        |  count(*) AS count_max
        |FROM documents GROUP BY lang, source""".stripMargin,
    // q_scd2: change rows carry their own interval — the lead of the next
    // change's valid_from replays Spark's forward-looking first() window
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
        |    CAST(round(value * 100, 0) AS BIGINT) // 10000 AS band
        |  FROM events
        |), f AS (
        |  SELECT user_id, tsu, band,
        |    (lag(band) OVER (PARTITION BY user_id ORDER BY tsu)
        |      IS DISTINCT FROM band) AS chg
        |  FROM o
        |)
        |SELECT user_id, band, tsu AS valid_from,
        |  lead(tsu) OVER w AS valid_to,
        |  (lead(tsu) OVER w IS NULL) AS is_current
        |FROM f WHERE chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsu)""".stripMargin,
    // q_vocab: the coverage fraction is one double division of two exact
    // integers (HUGEINT sums cast to DOUBLE before the divide)
    "q_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT token, count(*) AS n_occ,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM toks WHERE token <> '' GROUP BY token
        |), tot AS (SELECT CAST(sum(n_occ) AS DOUBLE) AS total FROM tf),
        |top AS (
        |  SELECT token, n_occ, n_docs FROM tf
        |  ORDER BY n_occ DESC, token LIMIT 100
        |)
        |SELECT CAST(row_number() OVER w AS BIGINT) AS rank, token, n_occ,
        |  n_docs,
        |  CAST(sum(n_occ) OVER (ORDER BY n_occ DESC, token
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / (SELECT total FROM tot) AS cum_frac
        |FROM top
        |WINDOW w AS (ORDER BY n_occ DESC, token)""".stripMargin,
    // q_corr_matrix: exact HUGEINT moment sums cast to DOUBLE, then the
    // identical double expression tree as the Spark side — (n·Σxy − Σx·Σy)
    // over the product of per-column sqrt spreads, NULL-guarded on a zero
    // denominator
    "q_corr_matrix" ->
      """WITH c AS (
        |  SELECT CAST(round(l_quantity, 0) AS BIGINT) AS x0,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS x1,
        |    CAST(round(l_discount * 100, 0) AS BIGINT) AS x2,
        |    CAST(round(l_tax * 100, 0) AS BIGINT) AS x3
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(CAST(x0 AS HUGEINT)) AS DOUBLE) AS s0,
        |    CAST(sum(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(x3 AS HUGEINT)) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(x0 AS HUGEINT) * x0) AS DOUBLE) AS p00,
        |    CAST(sum(CAST(x0 AS HUGEINT) * x1) AS DOUBLE) AS p01,
        |    CAST(sum(CAST(x0 AS HUGEINT) * x2) AS DOUBLE) AS p02,
        |    CAST(sum(CAST(x0 AS HUGEINT) * x3) AS DOUBLE) AS p03,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS p11,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS p12,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x3) AS DOUBLE) AS p13,
        |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS p22,
        |    CAST(sum(CAST(x2 AS HUGEINT) * x3) AS DOUBLE) AS p23,
        |    CAST(sum(CAST(x3 AS HUGEINT) * x3) AS DOUBLE) AS p33
        |  FROM c
        |)
        |SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, n,
        |  CASE WHEN sqrt(nd*p00 - s0*s0) * sqrt(nd*p11 - s1*s1) = 0 THEN NULL
        |    ELSE (nd*p01 - s0*s1)
        |      / (sqrt(nd*p00 - s0*s0) * sqrt(nd*p11 - s1*s1)) END AS corr
        |FROM s
        |UNION ALL
        |SELECT 'l_quantity', 'l_discount', n,
        |  CASE WHEN sqrt(nd*p00 - s0*s0) * sqrt(nd*p22 - s2*s2) = 0 THEN NULL
        |    ELSE (nd*p02 - s0*s2)
        |      / (sqrt(nd*p00 - s0*s0) * sqrt(nd*p22 - s2*s2)) END
        |FROM s
        |UNION ALL
        |SELECT 'l_quantity', 'l_tax', n,
        |  CASE WHEN sqrt(nd*p00 - s0*s0) * sqrt(nd*p33 - s3*s3) = 0 THEN NULL
        |    ELSE (nd*p03 - s0*s3)
        |      / (sqrt(nd*p00 - s0*s0) * sqrt(nd*p33 - s3*s3)) END
        |FROM s
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_discount', n,
        |  CASE WHEN sqrt(nd*p11 - s1*s1) * sqrt(nd*p22 - s2*s2) = 0 THEN NULL
        |    ELSE (nd*p12 - s1*s2)
        |      / (sqrt(nd*p11 - s1*s1) * sqrt(nd*p22 - s2*s2)) END
        |FROM s
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_tax', n,
        |  CASE WHEN sqrt(nd*p11 - s1*s1) * sqrt(nd*p33 - s3*s3) = 0 THEN NULL
        |    ELSE (nd*p13 - s1*s3)
        |      / (sqrt(nd*p11 - s1*s1) * sqrt(nd*p33 - s3*s3)) END
        |FROM s
        |UNION ALL
        |SELECT 'l_discount', 'l_tax', n,
        |  CASE WHEN sqrt(nd*p22 - s2*s2) * sqrt(nd*p33 - s3*s3) = 0 THEN NULL
        |    ELSE (nd*p23 - s2*s3)
        |      / (sqrt(nd*p22 - s2*s2) * sqrt(nd*p33 - s3*s3)) END
        |FROM s""".stripMargin,
    // q_profile: per-column profile replayed as one UNION ALL branch per
    // column; string min/max compare bytewise in both engines
    "q_profile" ->
      """SELECT 'doc_id' AS "column", count(*) AS n_rows,
        |  count(*) - count(doc_id) AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  CAST(min(doc_id) AS DOUBLE) AS min_num,
        |  CAST(max(doc_id) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM documents
        |UNION ALL
        |SELECT 'text', count(*), count(*) - count(text),
        |  count(DISTINCT text), NULL, NULL, min(text), max(text)
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(*) - count(lang),
        |  count(DISTINCT lang), NULL, NULL, min(lang), max(lang)
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source), NULL, NULL, min(source), max(source)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars), CAST(min(n_chars) AS DOUBLE),
        |  CAST(max(n_chars) AS DOUBLE), NULL, NULL
        |FROM documents""".stripMargin,
    "q_corpus_diff" ->
      """WITH prev AS (SELECT doc_id, text FROM documents),
        |nxt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' new' FROM documents WHERE doc_id < 20
        |), fp AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |  FROM prev
        |), fn AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |  FROM nxt
        |)
        |SELECT COALESCE(fp.doc_id, fn.doc_id) AS doc_id,
        |  CASE WHEN fp.doc_id IS NULL THEN 'added'
        |       WHEN fn.doc_id IS NULL THEN 'removed'
        |       WHEN fp.f IS NOT DISTINCT FROM fn.f THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM fp FULL OUTER JOIN fn ON fp.doc_id = fn.doc_id""".stripMargin,
    "q_sample_k" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |             doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 7""".stripMargin,
    "q_rolling" ->
      """SELECT user_id, event_id,
        |  count(value) OVER w AS roll_count,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS roll_sum_c100
        |FROM (SELECT user_id, event_id, value,
        |        CAST(epoch_us(ts) AS BIGINT) AS ns FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ns
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)""".stripMargin,
    // q_resample: per-bucket max-of-cents is order-free; LOCF/next markers
    // via IGNORE NULLS windows over the generate_series grid; the interp
    // expression is shape-identical to the Spark side (exact int inputs,
    // double cast per operand), so doubles match bit-for-bit
    "q_resample" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(epoch_us(ts) AS BIGINT) // 21600000000 AS b,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |), pb AS (
        |  SELECT user_id, b, CAST(count(*) AS BIGINT) AS n_rows,
        |    max(c) AS v_c100
        |  FROM e GROUP BY user_id, b
        |), grid AS (
        |  SELECT user_id, unnest(generate_series(min(b), max(b))) AS b
        |  FROM e GROUP BY user_id
        |), f AS (
        |  SELECT g.user_id, g.b,
        |    coalesce(p.n_rows, 0) AS n_rows, p.v_c100,
        |    last_value(p.v_c100 IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN p.v_c100 IS NOT NULL THEN g.b END
        |               IGNORE NULLS) OVER wp AS pb,
        |    first_value(p.v_c100 IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN p.v_c100 IS NOT NULL THEN g.b END
        |                IGNORE NULLS) OVER wn AS nb
        |  FROM grid g LEFT JOIN pb p ON g.user_id = p.user_id AND g.b = p.b
        |  WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY g.user_id ORDER BY g.b
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, b * 21600000000 AS bucket_start, n_rows, v_c100,
        |  pv AS v_locf_c100,
        |  CASE WHEN v_c100 IS NOT NULL THEN CAST(v_c100 AS DOUBLE)
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
        |           * CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)
        |  END AS v_interp
        |FROM f""".stripMargin,
    // q_ewma: list() OVER preserves frame order, list_reduce seeds with the
    // first element and folds left — the identical IEEE op chain as the
    // Spark aggregate() fold (0.75/0.25 are exact binary)
    "q_ewma" ->
      """SELECT user_id, event_id,
        |  list_reduce(
        |    list(CAST(value AS DOUBLE)) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
        |    (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)
        |  ) AS ewma
        |FROM events""".stripMargin,
    // q_zscore: the flag is pure integer arithmetic over exact cent sums
    // (sums cast back from DuckDB's HUGEINT widening); z divides two exact
    // ints under a correctly-rounded sqrt — replayable on any IEEE engine
    "q_zscore" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events
        |), w AS (
        |  SELECT user_id, event_id, c,
        |    CAST(count(c) OVER win AS BIGINT) AS n,
        |    CAST(sum(c) OVER win AS BIGINT) AS s,
        |    CAST(sum(c * c) OVER win AS BIGINT) AS ss
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, event_id,
        |  CASE WHEN n * ss - s * s = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(c * n - s AS DOUBLE)
        |            / sqrt(CAST(n * ss - s * s AS DOUBLE)) END AS z,
        |  (c * n - s) * (c * n - s) > 9 * (n * ss - s * s) AS is_anomaly
        |FROM w""".stripMargin,
    // q_psi_drift: bin = floor((value−lo)/width) clamped; shares Laplace-
    // smoothed by (n+1)/(N+22); psi term parenthesized exactly as the
    // operator: (1e6 · (p−q)) · ln(p/q)
    "q_psi_drift" ->
      """WITH b AS (
        |  SELECT CAST(least(greatest(floor((value - 0.0) / 25.0), -1), 20) AS BIGINT) AS bin,
        |    count(*) AS n_base
        |  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1
        |), c AS (
        |  SELECT CAST(least(greatest(floor((value - 0.0) / 25.0), -1), 20) AS BIGINT) AS bin,
        |    count(*) AS n_cur
        |  FROM events WHERE event_id % 2 <> 0 AND value IS NOT NULL GROUP BY 1
        |), j AS (
        |  SELECT coalesce(b.bin, c.bin) AS bin,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM b FULL OUTER JOIN c ON b.bin = c.bin
        |), t AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |         CAST(sum(n_cur) AS BIGINT) AS tc FROM j
        |), s AS (
        |  SELECT bin, n_base, n_cur,
        |    (CAST(n_base AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + 22.0) AS p,
        |    (CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + 22.0) AS q
        |  FROM j CROSS JOIN t
        |)
        |SELECT bin, n_base, n_cur,
        |  CAST(round(1000000.0 * p, 0) AS BIGINT) AS p_ppm,
        |  CAST(round(1000000.0 * q, 0) AS BIGINT) AS q_ppm,
        |  CAST(round(1000000.0 * (p - q) * ln(p / q), 0) AS BIGINT) AS psi_term_ppm
        |FROM s""".stripMargin,
    // q_psi_drift_cat: B = observed categories + 1 in the smoothing
    "q_psi_drift_cat" ->
      """WITH b AS (
        |  SELECT CAST(lang AS VARCHAR) AS value, count(*) AS n_base
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
        |), c AS (
        |  SELECT CAST(lang AS VARCHAR) AS value, count(*) AS n_cur
        |  FROM documents WHERE doc_id % 2 <> 0 GROUP BY 1
        |), j AS (
        |  SELECT coalesce(b.value, c.value) AS value,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM b FULL OUTER JOIN c ON b.value IS NOT DISTINCT FROM c.value
        |), t AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |         CAST(sum(n_cur) AS BIGINT) AS tc,
        |         count(*) AS ncat FROM j
        |), s AS (
        |  SELECT value, n_base, n_cur,
        |    (CAST(n_base AS DOUBLE) + 1.0)
        |      / (CAST(tb AS DOUBLE) + (CAST(ncat AS DOUBLE) + 1.0)) AS p,
        |    (CAST(n_cur AS DOUBLE) + 1.0)
        |      / (CAST(tc AS DOUBLE) + (CAST(ncat AS DOUBLE) + 1.0)) AS q
        |  FROM j CROSS JOIN t
        |)
        |SELECT value, n_base, n_cur,
        |  CAST(round(1000000.0 * p, 0) AS BIGINT) AS p_ppm,
        |  CAST(round(1000000.0 * q, 0) AS BIGINT) AS q_ppm,
        |  CAST(round(1000000.0 * (p - q) * ln(p / q), 0) AS BIGINT) AS psi_term_ppm
        |FROM s""".stripMargin,
    // q_mad_outliers: quantile_disc(0.5) is exactly the operator's
    // discrete median (smallest value with cumulative count >= ceil(n/2))
    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_disc(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM dev GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
        |  abs(d.value - d.med) > 3.0 * m.mad AS is_outlier
        |FROM dev d JOIN mad m USING (event_type)""".stripMargin,
    "q_range_join" ->
      """WITH e AS (
        |  SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
        |  FROM events WHERE ts IS NOT NULL
        |), iv AS (
        |  SELECT event_id AS interval_id, tsu AS t_start,
        |    tsu + 600000000 AS t_end
        |  FROM e WHERE event_id % 97 = 0
        |)
        |SELECT e.event_id, iv.interval_id
        |FROM e JOIN iv ON e.tsu BETWEEN iv.t_start AND iv.t_end""".stripMargin,
    // q_score_linear: the token→bucket→weight chain is two portable
    // SHA-256-prefix hashes and integer mods; list_sum over the weights
    // (cast back from HUGEINT) replays the aggregate fold exactly
    "q_score_linear" ->
      """SELECT doc_id,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> x <> ''),
        |    t -> ('0x' || substr(sha256('7|' ||
        |           CAST(('0x' || substr(sha256('3|' || t), 1, 15))::BIGINT
        |                % 4096 AS VARCHAR)), 1, 15))::BIGINT
        |         % 2001 - 1000)), 0) AS BIGINT) AS score,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                x -> x <> ''),
        |    t -> ('0x' || substr(sha256('7|' ||
        |           CAST(('0x' || substr(sha256('3|' || t), 1, 15))::BIGINT
        |                % 4096 AS VARCHAR)), 1, 15))::BIGINT
        |         % 2001 - 1000)), 0) AS BIGINT) > 0 AS score_label
        |FROM documents""".stripMargin,
    // q_mix_temperature: per-source quota from a correctly-rounded sqrt,
    // members by the portable SHA-256-prefix rank (ties by doc_id)
    "q_mix_temperature" ->
      """WITH cnt AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY source
        |), q AS (
        |  SELECT source,
        |    least(n, greatest(1,
        |      CAST(round(3.0 * sqrt(CAST(n AS DOUBLE)), 0) AS BIGINT)))
        |      AS quota
        |  FROM cnt
        |), r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ('0x' || substr(sha256('5|' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents
        |)
        |SELECT r.doc_id, r.source
        |FROM r JOIN q ON r.source = q.source WHERE r.rk <= q.quota""".stripMargin,
    // q_chunk_docs: integer chunk-count arithmetic ((g + stride−1) // stride)
    // and 1-based inclusive token slices replay the operator exactly
    "q_chunk_docs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, t, len(t) AS n FROM d WHERE len(t) > 0
        |), c AS (
        |  SELECT doc_id, t,
        |    unnest(range(1 + (greatest(0, n - 64) + 47) // 48)) AS chunk_id
        |  FROM n
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  array_to_string(t[(chunk_id*48+1):(chunk_id*48+64)], ' ') AS chunk_text,
        |  CAST(len(t[(chunk_id*48+1):(chunk_id*48+64)]) AS BIGINT) AS n_tokens
        |FROM c""".stripMargin,
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS b
        |  FROM events
        |), f AS (
        |  SELECT user_id, min(b) AS cohort FROM e GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, b FROM e
        |)
        |SELECT cohort, b - cohort AS "offset",
        |  count(DISTINCT user_id) AS n_active
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
        |  FROM events
        |), s0 AS (
        |  SELECT user_id, min(t) AS ts_0 FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT e.user_id, min(t) AS ts_1 FROM e JOIN s0 USING (user_id)
        |  WHERE event_type = 'click' AND t > ts_0
        |    AND t - ts_0 <= 604800000000 GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(t) AS ts_2
        |  FROM e JOIN s1 USING (user_id) JOIN s0 USING (user_id)
        |  WHERE event_type = 'purchase' AND t > ts_1
        |    AND t - ts_0 <= 604800000000 GROUP BY 1
        |)
        |SELECT s0.user_id, s0.ts_0, s1.ts_1, s2.ts_2,
        |  CASE WHEN ts_0 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN ts_1 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN ts_2 IS NOT NULL THEN 1 ELSE 0 END AS steps_completed
        |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)""".stripMargin,
    // q_asof_unique: identical contract to q_asof_join — the fast path is
    // an internal plan change only
    "q_asof_unique" ->
      """WITH l AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS lns, event_id AS l_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS rns, value AS p_val
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.user_id, l.l_id, r.p_val
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lns >= r.rns""".stripMargin,
    "q_asof_forward" ->
      """WITH l AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS lns, event_id AS l_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS rns, value AS p_val
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.user_id, l.l_id, r.p_val
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lns <= r.rns""".stripMargin,
    "q_asof_bucketed" ->
      """WITH l AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS lns, event_id AS l_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS rns, value AS p_val
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.user_id, l.l_id,
        |  CASE WHEN l.lns - r.rns <= 21600000000 THEN r.p_val END AS p_val
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.lns >= r.rns""".stripMargin,
    "q_noisy_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
        |  event_type, count(*) AS count
        |FROM events GROUP BY 1, 2""".stripMargin,
    // q_noisy_window_stream: the micro-batch execution must converge to
    // exactly the batch aggregation (complete mode, source drained)
    "q_noisy_window_stream" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
        |  event_type, count(*) AS count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_subword_count" ->
      """SELECT doc_id,
        |  CAST(ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT)
        |    + length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS n_subwords
        |FROM documents""".stripMargin,
    "q_dedup_fingerprint" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE octet_length(encode(text)) >= 12""".stripMargin,
    "q_dict_multi" ->
      """SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 150000
        |UNION ALL
        |SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice <= 150000""".stripMargin,
    "q_cosine_dup" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> x * 2) AS embedding
        |  FROM base WHERE vec_id % 40 = 0),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id AS left_id, b.vec_id AS right_id
        |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""".stripMargin,
    // q_quantize: the absmax scale and the rounded lanes replay via DuckDB
    // list lambdas over the same double-cast floats
    "q_quantize" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
        |  FROM embeddings
        |), z AS (
        |  SELECT vec_id, fv,
        |    list_max(list_transform(fv, x -> abs(x))) AS amax
        |  FROM v
        |)
        |SELECT vec_id, CAST(i - 1 AS BIGINT) AS idx,
        |  CAST(CASE WHEN amax = 0 THEN 0
        |    ELSE floor(fv[i] * 127.0 / amax + 0.5) END AS BIGINT) AS qval,
        |  amax AS qscale
        |FROM z, unnest(range(1, len(fv) + 1)) AS t(i)""".stripMargin,
    // q_quant_ann: integer qdot plus the identical dequantized ranking
    // expression; ties break on neighbor_id in both engines
    "q_quant_ann" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
        |  FROM embeddings
        |), z AS (
        |  SELECT vec_id,
        |    list_max(list_transform(fv, x -> abs(x))) AS amax,
        |    CASE WHEN list_max(list_transform(fv, x -> abs(x))) = 0
        |      THEN list_transform(fv, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(fv, x -> CAST(floor(
        |        x * 127.0 / list_max(list_transform(fv, y -> abs(y))) + 0.5)
        |        AS BIGINT)) END AS qv
        |  FROM v
        |), q AS (
        |  SELECT vec_id AS query_id, qv AS qq, amax AS qs
        |  FROM z WHERE vec_id < 5
        |), sc AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, len(q.qq) + 1),
        |      i -> q.qq[i] * c.qv[i])) AS BIGINT) AS qdot,
        |    q.qs AS qs, c.amax AS cs
        |  FROM q, z c
        |)
        |SELECT query_id, neighbor_id, qdot FROM (
        |  SELECT query_id, neighbor_id, qdot,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY (CAST(qdot AS DOUBLE) * (qs * cs)) / 16129.0 DESC,
        |               neighbor_id) AS rk
        |  FROM sc
        |) WHERE rk <= 3""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(q.qv, c.embedding) DESC,
        |                    c.vec_id) AS rk
        |  FROM q, embeddings c
        |) WHERE rk <= 3""".stripMargin,
    // brute-force top-k over the planted corpus: the ANN paths provably
    // coincide with it (see the q_lsh_topk comment in `queries`)
    "q_lsh_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |planted AS (
        |  SELECT query_id * 10 + j + 1000000 AS vec_id, qv AS embedding
        |  FROM q CROSS JOIN (VALUES (0),(1),(2)) t(j)),
        |allv AS (SELECT vec_id, embedding FROM embeddings
        |         UNION ALL SELECT vec_id, embedding FROM planted)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(q.qv, c.embedding) DESC,
        |                    c.vec_id) AS rk
        |  FROM q, allv c
        |) WHERE rk <= 3""".stripMargin,
    "q_ivf_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |planted AS (
        |  SELECT query_id * 10 + j + 1000000 AS vec_id, qv AS embedding
        |  FROM q CROSS JOIN (VALUES (0),(1),(2)) t(j)),
        |allv AS (SELECT vec_id, embedding FROM embeddings
        |         UNION ALL SELECT vec_id, embedding FROM planted)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(q.qv, c.embedding) DESC,
        |                    c.vec_id) AS rk
        |  FROM q, allv c
        |) WHERE rk <= 3""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    len(list_intersect(toks, ['the','and','of','to','a','in','is','that','it','for'])) AS s_en,
        |    len(list_intersect(toks, ['el','la','de','que','y','en','un','por','con','los'])) AS s_es,
        |    len(list_intersect(toks, ['le','la','de','et','les','des','en','un','du','une'])) AS s_fr,
        |    len(list_intersect(toks, ['der','die','und','das','ist','von','mit','den','ein','zu'])) AS s_de,
        |    len(list_intersect(toks, ['的','是','了','在','我','有','和','就','不','人'])) AS s_zh
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_en,s_es,s_fr,s_de,s_zh) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'en'
        |    WHEN s_es = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'fr'
        |    WHEN s_de = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'de'
        |    ELSE 'zh' END AS lang_pred
        |FROM s""".stripMargin,
    // q_bigram_lm: identical model (add-one bigram counts over the corpus,
    // context counts, vocab size) and an IDENTICAL summation order — both
    // engines fold the per-bigram terms in token order, so only ln() ulp
    // noise separates them, absorbed by round(4)
    "q_bigram_lm" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, unnest(range(len(t) - 1)) AS pos, t
        |  FROM tk WHERE len(t) >= 2
        |), b AS (
        |  SELECT doc_id, pos, t[pos+1] AS w1, t[pos+2] AS w2 FROM bg
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS c2 FROM b GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM b GROUP BY w1
        |), v AS (
        |  SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(t) AS w FROM tk)
        |), term AS (
        |  SELECT b.doc_id, b.pos,
        |    ln(CAST(c2.c2 + 1 AS DOUBLE)) - ln(CAST(c1.c1 + v.v AS DOUBLE)) AS term
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |), s AS (
        |  SELECT doc_id,
        |    round(list_aggregate(list(term ORDER BY pos), 'sum') / count(*), 4)
        |      AS lm_score
        |  FROM term GROUP BY doc_id
        |)
        |SELECT d.doc_id, s.lm_score FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    // q_paragraph_dedup: DuckDB replays the planted construction, then
    // keeps each normalized paragraph only at its first (doc_id, pos)
    // occurrence and reassembles survivors with blank lines
    "q_paragraph_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || chr(10)
        |      || 'shared passage ' || CAST(doc_id % 7 AS VARCHAR)
        |      || chr(10) || chr(10)
        |      || 'unique note ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents
        |), p0 AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\n{2,}') AS arr FROM d
        |), p AS (
        |  SELECT doc_id, unnest(range(len(arr))) AS pos, arr FROM p0
        |), q AS (
        |  SELECT doc_id, pos, arr[pos+1] AS par,
        |    regexp_replace(lower(trim(arr[pos+1])), '\s+', ' ', 'g') AS norm
        |  FROM p
        |), nb AS (
        |  SELECT doc_id, pos, par,
        |    row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
        |  FROM q WHERE norm <> ''
        |), rb AS (
        |  SELECT doc_id, string_agg(par, chr(10) || chr(10) ORDER BY pos) AS clean_text
        |  FROM nb WHERE rn = 1 GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(rb.clean_text, '') AS clean_text
        |FROM d LEFT JOIN rb USING (doc_id)""".stripMargin,
    // q_pack_chunked: the hierarchical prefix scan collapses to one window
    // cumsum at oracle scale; `//` keeps the bin arithmetic integral
    "q_pack_chunked" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
        |    CAST(coalesce(sum(n_chars) OVER (
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS off
        |  FROM documents
        |)
        |SELECT doc_id,
        |  off AS offset_global,
        |  off // 4096 AS bin_start,
        |  off % 4096 AS bin_offset,
        |  CASE WHEN len > 0 THEN (off + len - 1) // 4096
        |       ELSE off // 4096 END AS bin_end
        |FROM s""".stripMargin,
    // q_pack_greedy: the per-shard sequential next-fit scan, replayed as a
    // recursive CTE advancing one row per shard per iteration
    "q_pack_greedy" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
        |    CAST(doc_id % 8 AS BIGINT) AS shard,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec AS (
        |  SELECT doc_id, shard, rn, CAST(0 AS BIGINT) AS bin, len AS fill
        |  FROM p WHERE rn = 1
        |  UNION ALL
        |  SELECT p.doc_id, p.shard, p.rn,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.bin ELSE rec.bin + 1 END,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.fill + p.len ELSE p.len END
        |  FROM rec JOIN p ON p.shard = rec.shard AND p.rn = rec.rn + 1
        |)
        |SELECT doc_id, shard, bin FROM rec""".stripMargin,
    // q_pack_shuffled: the portable 60-bit SHA-256 rank (the q_sample_hash
    // recipe, salt 1) orders the stream; bins replay as in q_pack_chunked
    "q_pack_shuffled" ->
      """WITH r AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
        |    ('0x' || substr(sha256('1|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      AS shuffle_rank
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, shuffle_rank, len,
        |    CAST(coalesce(sum(len) OVER (
        |      ORDER BY shuffle_rank, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS off
        |  FROM r
        |)
        |SELECT doc_id, shuffle_rank,
        |  off AS offset_global,
        |  off // 4096 AS bin_start,
        |  off % 4096 AS bin_offset,
        |  CASE WHEN len > 0 THEN (off + len - 1) // 4096
        |       ELSE off // 4096 END AS bin_end
        |FROM s""".stripMargin,
    // q_write_shards: the greedy packing recursion (the q_pack_greedy
    // replay at budget 4096) aggregated per (shard, bin) directory;
    // n_files is the literal 1 the one-file-per-bin contract promises,
    // row_hash the portable SHA-256 xor of the bin's doc ids
    "q_write_shards" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
        |    CAST(doc_id % 8 AS BIGINT) AS shard,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec AS (
        |  SELECT doc_id, shard, rn, CAST(0 AS BIGINT) AS bin, len AS fill
        |  FROM p WHERE rn = 1
        |  UNION ALL
        |  SELECT p.doc_id, p.shard, p.rn,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.bin ELSE rec.bin + 1 END,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.fill + p.len ELSE p.len END
        |  FROM rec JOIN p ON p.shard = rec.shard AND p.rn = rec.rn + 1
        |)
        |SELECT CAST(shard AS VARCHAR) || '_' || CAST(bin AS VARCHAR) AS gbin,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(doc_id) AS min_id,
        |  max(doc_id) AS max_id,
        |  bit_xor(('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT)
        |    AS row_hash
        |FROM rec GROUP BY 1""".stripMargin,
    // q_dedup_batch: DuckDB replays the corpus/batch split + planted
    // case-shifted copies, then admits batch docs with NO equal-shingle-set
    // partner in the corpus (i = nb = nc ⟺ equal sets)
    "q_dedup_batch" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 7
        |), batch AS (
        |  SELECT b.doc_id,
        |    CASE WHEN b.doc_id % 3 = 0 AND c.text IS NOT NULL
        |         THEN upper(c.text) ELSE b.text END AS text
        |  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 7) b
        |  LEFT JOIN corpus c ON c.doc_id = b.doc_id - (b.doc_id % 10)
        |), shb AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        |    THEN list_transform(generate_series(1, len(toks)-4),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                || ' ' || toks[i+3] || ' ' || toks[i+4])
        |    ELSE [] END)) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                      x -> x <> '') AS toks
        |        FROM batch)
        |), shc AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        |    THEN list_transform(generate_series(1, len(toks)-4),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                || ' ' || toks[i+3] || ' ' || toks[i+4])
        |    ELSE [] END)) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                      x -> x <> '') AS toks
        |        FROM corpus)
        |), bsizes AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY 1),
        |csizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
        |inter AS (
        |  SELECT shb.doc_id, shc.doc_id AS cid, count(*) AS i
        |  FROM shb JOIN shc ON shb.sh = shc.sh GROUP BY 1, 2
        |), flagged AS (
        |  SELECT DISTINCT inter.doc_id
        |  FROM inter
        |  JOIN bsizes ON bsizes.doc_id = inter.doc_id
        |  JOIN csizes ON csizes.doc_id = inter.cid
        |  WHERE inter.i = bsizes.n AND inter.i = csizes.n
        |)
        |SELECT doc_id FROM batch
        |WHERE doc_id NOT IN (SELECT doc_id FROM flagged)""".stripMargin,
    // q_dedup_stream_corpus: the stateless fingerprint anti-join replayed
    // on the same planted construction (md5 of the normalized text).
    // NOT EXISTS with `=` (not NOT IN): a null-text batch row has a null
    // fingerprint, which Spark's left-anti equi-join keeps but DuckDB's
    // three-valued NOT IN would silently drop
    "q_dedup_stream_corpus" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 7
        |), batch AS (
        |  SELECT b.doc_id,
        |    CASE WHEN b.doc_id % 3 = 0 AND c.text IS NOT NULL
        |         THEN '  ' || upper(c.text) ELSE b.text END AS text
        |  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 7) b
        |  LEFT JOIN corpus c ON c.doc_id = b.doc_id - (b.doc_id % 10)
        |), cf AS (
        |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    AS fp
        |  FROM corpus
        |)
        |SELECT doc_id FROM batch b2
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM cf
        |  WHERE cf.fp = md5(regexp_replace(lower(trim(b2.text)), '\s+', ' ', 'g'))
        |)""".stripMargin,
    // q_mix_epochs: copies = num//10 + (sha-prefix % 10 < num % 10), epochs
    // unnested 0..copies-1 — the exact published recipe
    "q_mix_epochs" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 10 WHEN 'zh' THEN 12
        |         ELSE 5 END AS num
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang,
        |    num // 10 + CASE WHEN
        |      ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |        % 10 < num % 10 THEN 1 ELSE 0 END AS copies
        |  FROM w
        |)
        |SELECT doc_id, lang, CAST(unnest(range(copies)) AS BIGINT) AS epoch
        |FROM c WHERE copies >= 1""".stripMargin,
    // q_corpus_stats: the data-card rollup replayed literally; the
    // fingerprint class is global, the rollup per (source, lang)
    "q_corpus_stats" ->
      """WITH d0 AS (SELECT doc_id, text, source, lang FROM documents),
        |copies AS (
        |  SELECT doc_id + 1000000 AS doc_id, text, source, lang
        |  FROM d0 WHERE doc_id % 25 = 0),
        |d AS (SELECT * FROM d0 UNION ALL SELECT * FROM copies),
        |fp AS (
        |  SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |  FROM d),
        |cls AS (SELECT f, count(*) AS c FROM fp GROUP BY f)
        |SELECT source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(CASE WHEN cls.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(sum(CAST(round((
        |    least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
        |      / 100.0, 1.0) * 0.5
        |    + CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |        least(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
        |          AS DOUBLE) / length(text), 1.0) * 0.5 END) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS sum_quality_ppm
        |FROM fp JOIN cls ON fp.f = cls.f
        |GROUP BY source, lang""".stripMargin,
    // q_pipeline_curate: the whole curation chain — quality gate,
    // stratified sample, epoch weighting, shuffled packing — each stage
    // the published portable recipe, composed end-to-end
    "q_pipeline_curate" ->
      """WITH q AS (
        |  SELECT doc_id, lang, n_chars,
        |    least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
        |      / 100.0, 1.0) * 0.5
        |    + CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |        least(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
        |          AS DOUBLE) / length(text), 1.0) * 0.5 END AS quality
        |  FROM documents
        |), gated AS (SELECT * FROM q WHERE quality >= 0.5),
        |sampled AS (
        |  SELECT * FROM gated
        |  WHERE ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |        % 10 < CASE lang WHEN 'en' THEN 9 WHEN 'de' THEN 6 ELSE 3 END
        |), mixed AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(unnest(range(copies)) AS BIGINT) AS epoch
        |  FROM (
        |    SELECT doc_id, lang, n_chars,
        |      num // 10 + CASE WHEN
        |        ('0x' || substr(sha256('2|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |          % 10 < num % 10 THEN 1 ELSE 0 END AS copies
        |    FROM (SELECT *, CASE lang WHEN 'en' THEN 15 ELSE 10 END AS num
        |          FROM sampled)
        |  ) WHERE copies >= 1
        |), keyed AS (
        |  SELECT doc_id * 4 + epoch AS pack_id, CAST(n_chars AS BIGINT) AS len
        |  FROM mixed
        |), r AS (
        |  SELECT pack_id, len,
        |    ('0x' || substr(sha256('3|' || pack_id::VARCHAR), 1, 15))::BIGINT
        |      AS rank
        |  FROM keyed
        |), s AS (
        |  SELECT pack_id,
        |    CAST(coalesce(sum(len) OVER (
        |      ORDER BY rank, pack_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS off
        |  FROM r
        |)
        |SELECT pack_id, off AS offset_global, off // 4096 AS bin_start
        |FROM s""".stripMargin,
    // q_semdedup: survivors = vectors with NO smaller-id cosine-0.95
    // neighbor (all such pairs are planted collinear copies, same cell by
    // construction, so the cluster structure cannot change the answer)
    "q_semdedup" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> x * 2) AS embedding
        |  FROM base WHERE vec_id % 40 = 0),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id FROM allv a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM allv b WHERE b.vec_id < a.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95)""".stripMargin,
    // multi-probe setting: same global earlier-neighbor oracle — probing
    // only adds exact-verified candidate pairs, and on this construction
    // every qualifying pair is collinear (found at any setting)
    "q_semdedup_probes" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> x * 2) AS embedding
        |  FROM base WHERE vec_id % 40 = 0),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.vec_id FROM allv a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM allv b WHERE b.vec_id < a.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95)""".stripMargin,
    // q_minhash_dedup / q_dedup_cluster: the LSH output is exact-Jaccard
    // VERIFIED, so it is always a subset of the exact all-pairs set; on the
    // fixtures every qualifying pair has jaccard ≥ 0.8, where 16-band×4-row
    // banding recall is 1 − (1−j^4)^16 ≥ 0.9998 per pair — the sets coincide
    // (checked at sf0.01 and sf0.1), making the exact set a valid oracle.
    "q_minhash_dedup" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r FROM sh a JOIN sh b USING (sh)
        |  WHERE a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |)
        |SELECT l AS left_id, r AS right_id
        |FROM inter JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |WHERE CAST(i AS DOUBLE)/(sl.n + sr.n - i) >= 0.5""".stripMargin,
    // staged band passes are result-identical to the single-pass run
    // (same per-band hash family; exact verify; distinct over the union),
    // so the staged entry replays the same exact-Jaccard oracle
    "q_minhash_staged" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r FROM sh a JOIN sh b USING (sh)
        |  WHERE a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |)
        |SELECT l AS left_id, r AS right_id
        |FROM inter JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |WHERE CAST(i AS DOUBLE)/(sl.n + sr.n - i) >= 0.5""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r FROM sh a JOIN sh b USING (sh)
        |  WHERE a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT l, r
        |  FROM inter JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |  WHERE CAST(i AS DOUBLE)/(sl.n + sr.n - i) >= 0.5
        |), edges AS (
        |  SELECT l, r FROM pairs UNION ALL SELECT r AS l, l AS r FROM pairs
        |), reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.a, edges.r FROM reach JOIN edges ON edges.l = reach.b
        |)
        |SELECT a AS doc_id FROM reach GROUP BY a HAVING a = min(b)""".stripMargin,
    // q_decontaminate_fuzzy: at threshold 1.0 the flagged relation is
    // shingle-set EQUALITY (i = |corpus set| = |bench set|), which DuckDB
    // computes literally — the benchmark's case shift vanishes under the
    // lowercased tokenization, so bench sets are the source docs' own
    "q_decontaminate_fuzzy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        |    THEN list_transform(generate_series(1, len(toks)-4),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                || ' ' || toks[i+3] || ' ' || toks[i+4])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), b AS (SELECT doc_id AS bid FROM documents WHERE doc_id % 50 = 0),
        |bsh AS (SELECT b.bid, sh.sh FROM sh JOIN b ON sh.doc_id = b.bid),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |bsizes AS (SELECT bid, count(*) AS n FROM bsh GROUP BY 1),
        |inter AS (
        |  SELECT sh.doc_id, bsh.bid, count(*) AS i
        |  FROM sh JOIN bsh ON sh.sh = bsh.sh GROUP BY 1, 2
        |)
        |SELECT DISTINCT inter.doc_id
        |FROM inter JOIN sizes ON sizes.doc_id = inter.doc_id
        |JOIN bsizes ON bsizes.bid = inter.bid
        |WHERE inter.i = sizes.n AND inter.i = bsizes.n""".stripMargin,
    // q_decontaminate: literal replica — the decision is on the gram TEXT
    // (no engine hash), same tokenization as the minhash oracle
    "q_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |    THEN list_transform(generate_series(1, len(toks)-7),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |                || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
        |                || ' ' || toks[i+6] || ' ' || toks[i+7])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), bench AS (
        |  SELECT DISTINCT sh FROM gr WHERE doc_id % 50 = 0
        |), flagged AS (
        |  SELECT DISTINCT gr.doc_id FROM gr JOIN bench USING (sh)
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM flagged)""".stripMargin,
    // q_keep_best: q_dedup_cluster's recursive-CTE components + the
    // q_quality score formula; representative = max quality, ties min id
    "q_keep_best" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r FROM sh a JOIN sh b USING (sh)
        |  WHERE a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT l, r
        |  FROM inter JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |  WHERE CAST(i AS DOUBLE)/(sl.n + sr.n - i) >= 0.5
        |), edges AS (
        |  SELECT l, r FROM pairs UNION ALL SELECT r AS l, l AS r FROM pairs
        |), reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.a, edges.r FROM reach JOIN edges ON edges.l = reach.b
        |), cl AS (
        |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        |), q AS (
        |  SELECT doc_id,
        |    least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
        |    + CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |        least(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
        |          / length(text), 1.0) * 0.5 END AS q
        |  FROM documents
        |), best AS (
        |  SELECT cl.cluster_id, max(q.q) AS bq
        |  FROM cl JOIN q USING (doc_id) GROUP BY 1
        |)
        |SELECT min(cl.doc_id) AS doc_id
        |FROM cl JOIN q USING (doc_id)
        |JOIN best ON best.cluster_id = cl.cluster_id AND q.q = best.bq
        |GROUP BY cl.cluster_id""".stripMargin,
    // q_dup_spans: exact duplicated 8-token spans, merged per document —
    // the dedup decision is on the shingle TEXT (no engine hash), so the
    // replica is literal
    "q_dup_spans" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(range(greatest(len(t) - 7, 0))) AS pos, t
        |  FROM tk
        |), g AS (
        |  SELECT doc_id, pos, array_to_string(t[pos+1:pos+8], ' ') AS s FROM sh
        |), dup AS (
        |  SELECT s FROM g GROUP BY s HAVING count(*) > 1
        |), m AS (
        |  SELECT doc_id, pos FROM g WHERE s IN (SELECT s FROM dup)
        |), brk AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |         THEN 0 ELSE 1 END AS b
        |  FROM m
        |), isl AS (
        |  SELECT doc_id, pos,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS UNBOUNDED PRECEDING) AS island
        |  FROM brk
        |)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
        |FROM isl GROUP BY doc_id, island""".stripMargin,
    // q_remove_spans: a token survives iff no duplicated 8-gram span covers
    // its index; docs whose every token is covered come back as ''. The
    // dedup decision is case-folded but reassembly keeps ORIGINAL-case
    // tokens (whitespace tokenization is case-independent, so indices
    // align between the lowercased and original token streams).
    "q_remove_spans" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), tko AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(range(greatest(len(t) - 7, 0))) AS pos, t
        |  FROM tk
        |), g AS (
        |  SELECT doc_id, pos, array_to_string(t[pos+1:pos+8], ' ') AS s FROM sh
        |), dup AS (
        |  SELECT s FROM g GROUP BY s HAVING count(*) > 1
        |), m AS (
        |  SELECT doc_id, pos FROM g WHERE s IN (SELECT s FROM dup)
        |), tok AS (
        |  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS i FROM tko
        |), keep AS (
        |  SELECT tok.doc_id, tok.w, tok.i FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM m
        |    WHERE m.doc_id = tok.doc_id AND tok.i BETWEEN m.pos AND m.pos + 7)
        |), agg AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text
        |  FROM keep GROUP BY doc_id
        |)
        |SELECT tk.doc_id, coalesce(agg.clean_text, '') AS clean_text
        |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), dfreq AS (SELECT sh, count(*) AS c FROM sh GROUP BY 1),
        |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r
        |  FROM sh a JOIN sh b USING (sh) JOIN dfreq USING (sh)
        |  WHERE dfreq.c BETWEEN 2 AND 20 AND a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |)
        |SELECT l AS left_id, r AS right_id FROM inter
        |JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |WHERE CAST(i AS DOUBLE) / (sl.n + sr.n - i) >= 0.5""".stripMargin,
    "q_bucket_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST((CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |       + (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END)
        |       + (CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, bucket,
        |    CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS BIGINT)
        |      AS rank_in_bucket
        |  FROM t
        |)
        |SELECT doc_id, bucket, rank_in_bucket,
        |  rank_in_bucket // 16 AS batch
        |FROM r""".stripMargin,
    "q_majority_label" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n_votes
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT user_id, CAST(sum(n_votes) AS BIGINT) AS n_total
        |  FROM c GROUP BY 1
        |)
        |SELECT user_id, event_type, n_votes, n_total FROM (
        |  SELECT c.user_id, c.event_type, c.n_votes, t.n_total,
        |    row_number() OVER (PARTITION BY c.user_id
        |      ORDER BY n_votes DESC, event_type) AS r
        |  FROM c JOIN t USING (user_id)
        |) WHERE r = 1""".stripMargin,
    // q_top_mass: the keep test compares the EXCLUSIVE integer running
    // sum against ceil(p·W) of the exact group total
    "q_top_mass" ->
      """WITH w AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS tot,
        |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM documents)
        |SELECT source, doc_id, n_chars,
        |  CAST(cb + n_chars AS BIGINT) AS cum_weight
        |FROM w
        |WHERE cb < CAST(ceil(0.5 * CAST(tot AS DOUBLE)) AS BIGINT)""".stripMargin,
    // q_negative_samples: the pool index is the dense 0-based vec_id rank;
    // the draw is the shared portable SHA-256 recipe over "anchor#j"
    // (salt 11) mod pool size
    "q_negative_samples" ->
      """WITH pool AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS idx
        |  FROM embeddings
        |), n AS (SELECT count(*) AS n FROM pool),
        |probes AS (
        |  SELECT a.vec_id AS anchor_id, j,
        |    ('0x' || substr(sha256('11|' || a.vec_id::VARCHAR || '#' || j::VARCHAR), 1, 15))::BIGINT
        |      % n.n AS idx
        |  FROM embeddings a CROSS JOIN n
        |    CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j)
        |  WHERE a.vec_id < 100
        |)
        |SELECT anchor_id, CAST(j AS BIGINT) AS j, p.vec_id AS neg_id
        |FROM probes JOIN pool p USING (idx)
        |WHERE p.vec_id <> anchor_id""".stripMargin,
    // q_jaro_pairs: DuckDB's jaro_winkler_similarity is value-identical
    // to the native expression (integer-halved transpositions, 0.7 boost
    // threshold, prefix cap 4) — pinned bitwise over this entry's corpus
    "q_jaro_pairs" ->
      """WITH r AS (
        |  SELECT p_partkey, p_name,
        |    row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS rank
        |  FROM part
        |)
        |SELECT a.p_partkey AS left_id, b.p_partkey AS right_id,
        |  jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |FROM r a JOIN r b ON b.rank BETWEEN a.rank + 1 AND a.rank + 3""".stripMargin,
    "q_sorted_neighbors" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rank
        |  FROM documents
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |  a.n_chars AS left_key, b.n_chars AS right_key,
        |  CAST(b.rank - a.rank AS BIGINT) AS gap
        |FROM r a JOIN r b ON b.rank BETWEEN a.rank + 1 AND a.rank + 3""".stripMargin,
    // q_containment: same shingle space as q_ngram_jaccard (k=3, df ≤ 20);
    // containment scores are single divisions of exact integers, so the
    // DOUBLE outputs are bit-identical across engines (no ln/round).
    "q_containment" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), dfreq AS (SELECT sh, count(*) AS c FROM sh GROUP BY 1),
        |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS l, b.id AS r
        |  FROM sh a JOIN sh b USING (sh) JOIN dfreq USING (sh)
        |  WHERE dfreq.c BETWEEN 2 AND 20 AND a.id < b.id GROUP BY 1, 2
        |), inter AS (
        |  SELECT c.l, c.r, count(*) AS i FROM cand c
        |  JOIN sh x ON x.id = c.l JOIN sh y ON y.id = c.r AND y.sh = x.sh
        |  GROUP BY 1, 2
        |)
        |SELECT l AS left_id, r AS right_id,
        |  CAST(i AS DOUBLE) / sl.n AS contain_left,
        |  CAST(i AS DOUBLE) / sr.n AS contain_right
        |FROM inter
        |JOIN sizes sl ON sl.id = l JOIN sizes sr ON sr.id = r
        |WHERE greatest(CAST(i AS DOUBLE) / sl.n, CAST(i AS DOUBLE) / sr.n)
        |      >= 0.4""".stripMargin,
    "q_prdp_transform" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(CAST(l_quantity AS DOUBLE), 6) AS log_t,
        |  round(CAST(l_quantity AS DOUBLE), 6) AS sqrt_t,
        |  round(CAST(l_quantity AS DOUBLE), 6) AS fourth_t,
        |  round(CAST(l_quantity AS DOUBLE), 6) AS sg_t,
        |  round(CAST(l_quantity AS DOUBLE), 6) AS ep_t
        |FROM lineitem""".stripMargin,
    "q_quantile_sketch" ->
      """WITH clipped AS (
        |  SELECT l_returnflag,
        |    least(greatest(CAST(l_quantity AS DOUBLE), 1.0), 50.0) AS v
        |  FROM lineitem WHERE l_returnflag IN ('A','N','R')
        |), b AS (
        |  SELECT l_returnflag,
        |    CAST(least(greatest(floor((v - 1.0) / (49.0/64)), 0), 63) AS INT) AS bin,
        |    count(*) AS c
        |  FROM clipped GROUP BY 1, 2
        |), agg AS (
        |  SELECT l_returnflag, bin, c,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin) - c AS cumb,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM b
        |)
        |SELECT l_returnflag,
        |  round(1.0 + (bin + (0.5*(n-1) - cumb)/c) * (49.0/64), 6) AS median
        |FROM agg WHERE cumb <= 0.5*(n-1) AND 0.5*(n-1) < cumb + c""".stripMargin,
    // q_cdc_apply: arg_max replays the per-key latest change (seq =
    // o_orderkey is unique per key, so every arg_max picks the same row)
    "q_cdc_apply" ->
      """WITH chg AS (
        |  SELECT o_custkey AS k, o_orderkey AS seq,
        |    CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I'
        |      ELSE 'D' END AS op,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS bal_c,
        |    o_orderpriority AS seg
        |  FROM orders
        |), latest AS (
        |  SELECT k, arg_max(op, seq) AS op, arg_max(bal_c, seq) AS bal_c,
        |    arg_max(seg, seq) AS seg
        |  FROM chg GROUP BY k
        |), snap AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c,
        |    c_mktsegment AS seg
        |  FROM customer
        |)
        |SELECT COALESCE(s.c_custkey, l.k) AS c_custkey,
        |  CASE WHEN l.k IS NOT NULL THEN l.bal_c ELSE s.bal_c END AS bal_c,
        |  CASE WHEN l.k IS NOT NULL THEN l.seg ELSE s.seg END AS seg
        |FROM snap s FULL OUTER JOIN latest l ON s.c_custkey = l.k
        |WHERE l.k IS NULL OR l.op <> 'D'""".stripMargin,
    "q_incr_agg" ->
      """SELECT o_custkey, count(*) AS cnt, CAST(sum(v) AS BIGINT) AS sum_v,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM (SELECT o_custkey,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        |      FROM orders)
        |GROUP BY o_custkey""".stripMargin,
    // q_sample_bottomk: the oracle sketches ALL of events from scratch —
    // equality with the entry's two-batch merge is the losslessness proof;
    // the hash is the shared portable SHA-256 recipe (salt 9)
    "q_sample_bottomk" ->
      """WITH h AS (
        |  SELECT event_type, event_id,
        |    ('0x' || substr(sha256('9|' || event_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM (SELECT DISTINCT event_type, event_id FROM events)
        |)
        |SELECT event_type, event_id, h, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY h, event_id) AS rank
        |  FROM h
        |) WHERE rank <= 32""".stripMargin,
    // q_sample_bottomk_stream: identical oracle — the drained streaming
    // states must equal the from-scratch sketch (lossless merge)
    "q_sample_bottomk_stream" ->
      """WITH h AS (
        |  SELECT event_type, event_id,
        |    ('0x' || substr(sha256('9|' || event_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM (SELECT DISTINCT event_type, event_id FROM events)
        |)
        |SELECT event_type, event_id, h, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY h, event_id) AS rank
        |  FROM h
        |) WHERE rank <= 32""".stripMargin,
    "q_bloom_semijoin" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)""".stripMargin,
    "q_bloom_anti" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)""".stripMargin,
    // q_zorder: bit i of column j lands at output bit i*2+j (partkey grid
    // at j=0, suppkey grid at j=1)
    "q_zorder" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(list_sum(list_transform(generate_series(0, 9), i ->
        |    ((((l_partkey % 1024) >> i) & 1) << (2*i)) +
        |    ((((l_suppkey % 1024) >> i) & 1) << (2*i + 1))))
        |  AS BIGINT) AS zv
        |FROM lineitem""".stripMargin,
    "q_equidepth" ->
      """WITH v AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        |  FROM orders
        |), h AS (
        |  SELECT v, count(*) AS c FROM v GROUP BY v
        |), b AS (
        |  SELECT v, CAST(
        |    ((sum(c) OVER (ORDER BY v) - c) * 16) //
        |      (SELECT count(*) FROM v) AS BIGINT) AS bin
        |  FROM h
        |)
        |SELECT o_orderkey, bin FROM v JOIN b USING (v)""".stripMargin,
    // q_scd2_snapshot: the history row covering T is the per-user latest
    // band at or before T, replayed directly from the events
    "q_scd2_snapshot" ->
      """WITH o AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
        |    CAST(round(value * 100, 0) AS BIGINT) // 10000 AS band
        |  FROM events
        |)
        |SELECT user_id, arg_max(band, tsu) AS band
        |FROM o WHERE tsu <= 1705363200000000
        |GROUP BY user_id""".stripMargin,
    // q_sample_weighted: A-ES keys from the identical 60-bit SHA-256
    // integer; the k-th/k+1-th key gap is a continuous-hash guard band,
    // so a 1-ulp ln() difference cannot flip membership
    "q_sample_weighted" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ('0x' || substr(sha256('7|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h,
        |    n_chars
        |  FROM documents
        |)
        |ORDER BY -ln((h + 0.5) / 1152921504606846976.0) / n_chars, doc_id
        |LIMIT 500""".stripMargin,
    // q_novelty: identical tokenization to q_ngram_jaccard; a gram is
    // novel iff its corpus doc-frequency is exactly 1
    "q_novelty" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS gram
        |  FROM t
        |), dfreq AS (SELECT gram, count(*) AS c FROM sh GROUP BY 1),
        |agg AS (
        |  SELECT sh.doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN dfreq.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS novel_grams
        |  FROM sh JOIN dfreq USING (gram) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.novel_grams, 0) AS novel_grams,
        |  round(CAST(a.novel_grams AS DOUBLE) / a.n_grams, 6) AS novelty
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // q_clip_quantiles: the p-boundary is the smallest value whose
    // cumulative count reaches ceil(p*n) within its group
    "q_clip_quantiles" ->
      """WITH v AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
        |  FROM lineitem
        |), h AS (
        |  SELECT g, v, count(*) AS c FROM v GROUP BY 1, 2
        |), cw AS (
        |  SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h
        |), b AS (
        |  SELECT g,
        |    min(CASE WHEN cum >= ceil(0.05 * n) THEN v END) AS lo,
        |    min(CASE WHEN cum >= ceil(0.95 * n) THEN v END) AS hi
        |  FROM cw GROUP BY g
        |)
        |SELECT l_orderkey, l_linenumber,
        |  least(greatest(v.v, b.lo), b.hi) AS v_clip
        |FROM v JOIN b USING (g)""".stripMargin,
    "q_quality_check" ->
      """WITH o AS (
        |  SELECT *, CASE WHEN o_totalprice >= 100000.0
        |    THEN o_orderpriority END AS maybe_pri FROM orders
        |), m AS (
        |  SELECT count(*) AS total,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v0,
        |    count(*) - count(DISTINCT o_orderkey) AS v1,
        |    sum(CASE WHEN o_totalprice IS NOT NULL AND
        |      (o_totalprice < 0.0 OR o_totalprice > 600000.0)
        |      THEN 1 ELSE 0 END) AS v2,
        |    sum(CASE WHEN o_orderstatus IS NOT NULL AND
        |      o_orderstatus NOT IN ('F', 'O', 'P')
        |      THEN 1 ELSE 0 END) AS v3,
        |    greatest(
        |      sum(CASE WHEN maybe_pri IS NULL THEN 1 ELSE 0 END)
        |        - floor(0.25 * count(*)), 0) AS v4
        |  FROM o
        |)
        |SELECT 'not_null:o_custkey' AS check_name,
        |  CAST(v0 AS BIGINT) AS violations, v0 = 0 AS passed FROM m
        |UNION ALL SELECT 'unique:o_orderkey', CAST(v1 AS BIGINT), v1 = 0 FROM m
        |UNION ALL SELECT 'in_range:o_totalprice', CAST(v2 AS BIGINT), v2 = 0 FROM m
        |UNION ALL SELECT 'accepted:o_orderstatus', CAST(v3 AS BIGINT), v3 = 0 FROM m
        |UNION ALL SELECT 'max_null_frac:maybe_pri', CAST(v4 AS BIGINT), v4 = 0 FROM m""".stripMargin,
    // q_pipeline_curate2: winsorized length × (1 + novelty) feeds the
    // same portable A-ES order; DuckDB replays every stage
    "q_pipeline_curate2" ->
      """WITH h AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
        |), cw AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h
        |), bnd AS (
        |  SELECT lang,
        |    min(CASE WHEN cum >= ceil(0.05 * n) THEN n_chars END) AS lo,
        |    min(CASE WHEN cum >= ceil(0.95 * n) THEN n_chars END) AS hi
        |  FROM cw GROUP BY lang
        |), lw AS (
        |  SELECT d.doc_id, d.lang, d.source,
        |    least(greatest(d.n_chars, bnd.lo), bnd.hi) AS n_clip
        |  FROM documents d JOIN bnd USING (lang)
        |), t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS gram
        |  FROM t
        |), dfreq AS (SELECT gram, count(*) AS c FROM sh GROUP BY 1),
        |nov AS (
        |  SELECT sh.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN dfreq.c = 1 THEN 1 ELSE 0 END) AS novel
        |  FROM sh JOIN dfreq USING (gram) GROUP BY 1
        |), scored AS (
        |  SELECT lw.doc_id, lw.lang, lw.source,
        |    CAST(lw.n_clip AS DOUBLE) *
        |      (1.0 + CAST(nov.novel AS DOUBLE) / nov.n_grams) AS w,
        |    ('0x' || substr(sha256('11|' || lw.doc_id::VARCHAR), 1, 15))::BIGINT
        |      AS hsh
        |  FROM lw JOIN nov USING (doc_id) WHERE nov.n_grams > 0
        |)
        |SELECT doc_id, lang, source FROM scored
        |ORDER BY -ln((hsh + 0.5) / 1152921504606846976.0) / w, doc_id
        |LIMIT 400""".stripMargin,
    "q_split_hash" ->
      """SELECT doc_id,
        |  CASE WHEN h < 8000 THEN 0 WHEN h < 9000 THEN 1 ELSE 2 END AS split
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(sha256('0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 10000 AS h
        |  FROM documents
        |)""".stripMargin,
    // q_rank_normalize: the histogram rank equals SQL percent_rank (ties
    // share their first row's rank)
    "q_rank_normalize" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(percent_rank() OVER (
        |    PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS pct
        |FROM lineitem""".stripMargin,
    "q_fd_check" ->
      """SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_rhs,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1
        |HAVING count(DISTINCT l_suppkey) > 1""".stripMargin,
    "q_quality_by" ->
      """WITH m AS (
        |  SELECT source,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS v0,
        |    sum(CASE WHEN length(text) > 0 THEN 0 ELSE 1 END) AS v1,
        |    sum(CASE WHEN n_chars IS NOT NULL AND
        |      (n_chars < 1.0 OR n_chars > 100000.0) THEN 1 ELSE 0 END) AS v2,
        |    count(*) - count(DISTINCT doc_id) AS v3
        |  FROM documents GROUP BY source
        |)
        |SELECT source, 'not_null:text' AS check_name,
        |  CAST(v0 AS BIGINT) AS violations, v0 = 0 AS passed FROM m
        |UNION ALL SELECT source, 'satisfies:text_nonempty',
        |  CAST(v1 AS BIGINT), v1 = 0 FROM m
        |UNION ALL SELECT source, 'in_range:n_chars',
        |  CAST(v2 AS BIGINT), v2 = 0 FROM m
        |UNION ALL SELECT source, 'unique:doc_id',
        |  CAST(v3 AS BIGINT), v3 = 0 FROM m""".stripMargin,
    "q_sample_weighted_group" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      -ln((('0x' || substr(sha256('7|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |           + 0.5) / 1152921504606846976.0) / n_chars,
        |      doc_id) AS rn
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |)
        |WHERE rn <= 100""".stripMargin,
    "q_quality_rows" ->
      """WITH m AS (
        |  SELECT
        |    sum(CASE WHEN l_extendedprice >= l_quantity
        |      THEN 0 ELSE 1 END) AS v0,
        |    sum(CASE WHEN l_quantity <= 30.0 THEN 0 ELSE 1 END) AS v1,
        |    sum(CASE WHEN l_discount IS NOT NULL AND
        |      (l_discount < 0.0 OR l_discount > 0.1)
        |      THEN 1 ELSE 0 END) AS v2,
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v3
        |  FROM lineitem
        |)
        |SELECT 'satisfies:price_at_least_qty' AS check_name,
        |  CAST(v0 AS BIGINT) AS violations, v0 = 0 AS passed FROM m
        |UNION ALL SELECT 'satisfies:qty_cap_30', CAST(v1 AS BIGINT), v1 = 0 FROM m
        |UNION ALL SELECT 'in_range:l_discount', CAST(v2 AS BIGINT), v2 = 0 FROM m
        |UNION ALL SELECT 'not_null:l_shipdate', CAST(v3 AS BIGINT), v3 = 0 FROM m""".stripMargin,
    // q_incr_distinct: cardinalities <= 5 keep the HLL in its exact
    // coupon regime, so the sketch union replays as plain COUNT(DISTINCT)
    "q_incr_distinct" ->
      """SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_distinct
        |FROM orders GROUP BY 1""".stripMargin,
    // q_running_counts_stream: the drained update-mode state must equal
    // the batch GROUP BY
    "q_running_counts_stream" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    // q_interval_join_stream: the drained micro-batch join must converge
    // to exactly the batch interval join
    "q_interval_join_stream" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('second', ts) AS t, event_id, event_type
        |  FROM events
        |)
        |SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id
        |FROM e l JOIN e r
        |  ON l.user_id = r.user_id AND r.event_type = 'purchase'
        | AND r.t >= l.t - INTERVAL '15 minutes'
        | AND r.t <= l.t + INTERVAL '15 minutes'""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS total,
        |  count(*) AS n_orders, GROUPING(r_name, n_name) AS gid
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS total, count(*) AS n_orders,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
        |    AS notspec,
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w""".stripMargin,
    // dyadic percentiles over integral l_quantity: quantile_cont's linear
    // interpolation is exact in double, matching Spark's percentile
    "q_grouped_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_argmax" ->
      """SELECT c_nationkey, c_custkey, top_bal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal AS top_bal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |  FROM customer
        |) WHERE rn = 1""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "q_histogram" ->
      """SELECT bin, 0.0 + CAST(bin AS DOUBLE) * 20.0 AS bin_lo, n FROM (
        |  SELECT CAST(least(greatest(floor((value - 0.0) / 20.0), 0.0),
        |    24.0) AS BIGINT) AS bin, count(*) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |)""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_edit_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,
    // q_pagerank: constants written as the same double ops Spark executes
    // ((1.0 - 0.85)/n, 1.0/n) so every iterate matches bit-for-bit
    "q_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |    's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS r
        |       FROM nodes CROSS JOIN nn),
        |r1 AS (SELECT nodes.id,
        |         round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |         + CAST(0.85 AS DOUBLE) * coalesce(c.c, CAST(0.0 AS DOUBLE)), 9) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT e.dst AS id, sum(p.r / d.outdeg) AS c
        |         FROM edges e JOIN r0 p ON e.src = p.id
        |         JOIN deg d ON d.src = e.src GROUP BY 1) c
        |       ON nodes.id = c.id),
        |r2 AS (SELECT nodes.id,
        |         round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |         + CAST(0.85 AS DOUBLE) * coalesce(c.c, CAST(0.0 AS DOUBLE)), 9) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT e.dst AS id, sum(p.r / d.outdeg) AS c
        |         FROM edges e JOIN r1 p ON e.src = p.id
        |         JOIN deg d ON d.src = e.src GROUP BY 1) c
        |       ON nodes.id = c.id),
        |r3 AS (SELECT nodes.id,
        |         round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |         + CAST(0.85 AS DOUBLE) * coalesce(c.c, CAST(0.0 AS DOUBLE)), 9) AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT e.dst AS id, sum(p.r / d.outdeg) AS c
        |         FROM edges e JOIN r2 p ON e.src = p.id
        |         JOIN deg d ON d.src = e.src GROUP BY 1) c
        |       ON nodes.id = c.id)
        |SELECT id, r FROM r3""".stripMargin,
    "q_graph_degrees" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |    's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |)
        |SELECT coalesce(o.id, i.id) AS id,
        |  coalesce(o.out_deg, 0) AS out_deg,
        |  coalesce(i.in_deg, 0) AS in_deg
        |FROM (SELECT src AS id, count(*) AS out_deg FROM e0 GROUP BY 1) o
        |FULL OUTER JOIN
        |  (SELECT dst AS id, count(*) AS in_deg FROM e0 GROUP BY 1) i
        |ON o.id = i.id""".stripMargin,
    // q_assoc_rules: ppm ratios written as the same left-associated
    // double expressions the Scala operator builds, from exact counts.
    // The rn <= 16 CTE replays Market.cappedBaskets(maxBasketSize = 16)
    // — k smallest item ids survive — so the cap is an explicit part of
    // the contract (TPC-H baskets are smaller, but a fixture or cap
    // change must not silently diverge).
    "q_assoc_rules" ->
      """WITH b0 AS (SELECT DISTINCT l_orderkey AS basket,
        |    l_partkey AS item FROM lineitem),
        |b AS (SELECT basket, item FROM (
        |    SELECT basket, item,
        |      row_number() OVER (PARTITION BY basket ORDER BY item) AS rn
        |    FROM b0) WHERE rn <= 16),
        |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
        |itn AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
        |p AS (SELECT a.item AS item_a, c.item AS item_b,
        |    count(*) AS pair_n
        |  FROM b a JOIN b c
        |    ON a.basket = c.basket AND a.item < c.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |d AS (SELECT item_a AS antecedent, item_b AS consequent, pair_n
        |    FROM p
        |  UNION ALL
        |  SELECT item_b, item_a, pair_n FROM p)
        |SELECT d.antecedent, d.consequent, d.pair_n,
        |  ia.n_item AS n_ante, ic.n_item AS n_cons,
        |  CAST(round(1000000.0 * d.pair_n / nb.n_baskets) AS BIGINT)
        |    AS support_ppm,
        |  CAST(round(1000000.0 * d.pair_n / ia.n_item) AS BIGINT)
        |    AS conf_ppm,
        |  CAST(round(1000000.0 * d.pair_n * nb.n_baskets
        |    / (CAST(ia.n_item AS DOUBLE) * CAST(ic.n_item AS DOUBLE)))
        |    AS BIGINT) AS lift_ppm
        |FROM d JOIN itn ia ON d.antecedent = ia.item
        |JOIN itn ic ON d.consequent = ic.item
        |CROSS JOIN nb""".stripMargin,
    // q_triangles: same degree-ordered orientation as Graph.triangleCount
    // (u < v always, so du <= dv encodes the (deg, id) tiebreak). The
    // rn <= 16 CTE replays Market.cappedBaskets(maxBasketSize = 16) so
    // the cap is explicit in the oracle contract.
    "q_triangles" ->
      """WITH b0 AS (SELECT DISTINCT l_orderkey AS basket,
        |    l_partkey AS item FROM lineitem),
        |b AS (SELECT basket, item FROM (
        |    SELECT basket, item,
        |      row_number() OVER (PARTITION BY basket ORDER BY item) AS rn
        |    FROM b0) WHERE rn <= 16),
        |p AS (SELECT a.item AS u, c.item AS v, count(*) AS pair_n
        |  FROM b a JOIN b c
        |    ON a.basket = c.basket AND a.item < c.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT id, count(*) AS deg FROM (
        |    SELECT u AS id FROM p UNION ALL SELECT v FROM p)
        |  GROUP BY 1),
        |e AS (SELECT
        |    CASE WHEN du.deg <= dv.deg THEN p.u ELSE p.v END AS src,
        |    CASE WHEN du.deg <= dv.deg THEN p.v ELSE p.u END AS dst,
        |    CASE WHEN du.deg <= dv.deg THEN dv.deg ELSE du.deg END AS ddeg
        |  FROM p JOIN deg du ON p.u = du.id JOIN deg dv ON p.v = dv.id)
        |SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |FROM e x JOIN e y ON x.src = y.src
        |  AND (x.ddeg < y.ddeg OR (x.ddeg = y.ddeg AND x.dst < y.dst))
        |JOIN e z ON z.src = x.dst AND z.dst = y.dst""".stripMargin,
    // q_weighted_median: integral quantities -> exact BIGINT cumulative
    // weights; ties in price cannot move the selected value
    "q_weighted_median" ->
      """WITH t AS (SELECT l_returnflag, l_linestatus,
        |    l_extendedprice AS v,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag, l_linestatus) AS tw
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus, min(v) AS weighted_median
        |FROM t WHERE cw * 2 >= tw GROUP BY 1, 2""".stripMargin,
    // q_ab_welch: all doubles derived from exact integer cent sums by
    // the identical expression trees Stats.welchT builds
    "q_ab_welch" ->
      """WITH q AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |s AS (SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END)
        |      AS BIGINT) AS s1_a,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN c * c ELSE 0 END)
        |      AS DOUBLE) AS s2_a,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN c ELSE 0 END)
        |      AS BIGINT) AS s1_b,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN c * c ELSE 0 END)
        |      AS DOUBLE) AS s2_b
        |  FROM q GROUP BY 1),
        |f AS (SELECT * FROM s WHERE n_a >= 2 AND n_b >= 2),
        |mo AS (SELECT day, n_a, n_b,
        |    s1_a / 100.0 / n_a AS mean_a,
        |    s1_b / 100.0 / n_b AS mean_b,
        |    (s2_a / 100.0 / 100.0
        |      - s1_a / 100.0 * (s1_a / 100.0) / n_a) / (n_a - 1) AS var_a,
        |    (s2_b / 100.0 / 100.0
        |      - s1_b / 100.0 * (s1_b / 100.0) / n_b) / (n_b - 1) AS var_b
        |  FROM f)
        |SELECT day, n_a, n_b, mean_a, mean_b, var_a, var_b,
        |  (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
        |  (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
        |    / (var_a / n_a * (var_a / n_a) / (n_a - 1)
        |      + var_b / n_b * (var_b / n_b) / (n_b - 1)) AS dof
        |FROM mo""".stripMargin,
    // q_chi2_assoc: expected_m is exactly integral here (n divides
    // 1000*rt*ct), contributions replay from the same double tree
    "q_chi2_assoc" ->
      """WITH cells AS (SELECT lang AS row_label, source AS col_label,
        |    count(*) AS n_obs
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT row_label, CAST(sum(n_obs) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT col_label, CAST(sum(n_obs) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells),
        |fl AS (SELECT r.row_label, c.col_label, r.rt, c.ct, tot.n,
        |    coalesce(cells.n_obs, 0) AS n_obs
        |  FROM rt r CROSS JOIN ct c CROSS JOIN tot
        |  LEFT JOIN cells ON cells.row_label = r.row_label
        |    AND cells.col_label = c.col_label)
        |SELECT row_label, col_label, n_obs,
        |  CAST(round(1000.0 * rt * ct / n) AS BIGINT) AS expected_m,
        |  CAST(round(1000000.0
        |    * ((n_obs - CAST(rt AS DOUBLE) * ct / n)
        |      * (n_obs - CAST(rt AS DOUBLE) * ct / n))
        |    / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT)
        |    AS chi2_contrib_ppm
        |FROM fl""".stripMargin,
    // q_collocations: same tokenizer as q_bigram_lm; PMI from the same
    // single ln expression tree Spark builds
    "q_collocations" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)),
        |    '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), b AS (
        |  SELECT t[pos+1] AS w1, t[pos+2] AS w2
        |  FROM (SELECT unnest(range(len(t) - 1)) AS pos, t
        |    FROM tk WHERE len(t) >= 2)
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS pair_n FROM b GROUP BY 1, 2
        |), uni AS (
        |  SELECT w, count(*) AS cu
        |  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1
        |), n1 AS (SELECT CAST(sum(cu) AS BIGINT) AS n1 FROM uni),
        |n2 AS (SELECT CAST(sum(pair_n) AS BIGINT) AS n2 FROM c2)
        |SELECT c2.w1, c2.w2, c2.pair_n,
        |  u1.cu AS n_w1, u2.cu AS n_w2,
        |  CAST(round(1000000.0 * ln(
        |    (CAST(c2.pair_n AS DOUBLE) / n2.n2)
        |    / (CAST(u1.cu AS DOUBLE) / n1.n1
        |      * (CAST(u2.cu AS DOUBLE) / n1.n1)))) AS BIGINT) AS pmi_ppm
        |FROM c2 JOIN uni u1 ON c2.w1 = u1.w
        |JOIN uni u2 ON c2.w2 = u2.w
        |CROSS JOIN n1 CROSS JOIN n2
        |WHERE c2.pair_n >= 10""".stripMargin,
    "q_transitions" ->
      """WITH sq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS from_state
        |  FROM events),
        |c AS (SELECT from_state, event_type AS to_state,
        |    count(*) AS n_trans
        |  FROM sq WHERE from_state IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_state, CAST(sum(n_trans) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n_trans, f.n_from,
        |  CAST(round(1000000.0 * c.n_trans / f.n_from) AS BIGINT)
        |    AS prob_ppm
        |FROM c JOIN f USING (from_state)""".stripMargin,
    // q_benford: digit via integer-cents string head — exact in both
    // engines; the Benford table is the shared literal constant set
    "q_benford" ->
      """WITH c AS (SELECT
        |    CAST(round(abs(l_extendedprice) * 100) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit
        |  FROM c WHERE c > 0),
        |cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cnt),
        |ben(digit, benford_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910),
        |  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |fl AS (SELECT CAST(b.digit AS BIGINT) AS digit,
        |    coalesce(cnt.n, 0) AS n,
        |    CAST(b.benford_ppm AS BIGINT) AS benford_ppm
        |  FROM ben b LEFT JOIN cnt ON b.digit = cnt.digit)
        |SELECT digit, n,
        |  CAST(round(1000000.0 * n / tot.tot) AS BIGINT) AS share_ppm,
        |  benford_ppm,
        |  CAST(round(1000000.0 * n / tot.tot) AS BIGINT) - benford_ppm
        |    AS dev_ppm
        |FROM fl CROSS JOIN tot""".stripMargin,
    // q_trend: x = epoch seconds since 2024-01-01 by exact integer
    // division; every double from the six exact sums
    "q_trend" ->
      """WITH q AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(x * c) AS DOUBLE) AS sxy,
        |    CAST(sum(c * c) AS DOUBLE) AS syy
        |  FROM q GROUP BY 1),
        |f AS (SELECT * FROM s WHERE n >= 2
        |  AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0.0
        |  AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0.0),
        |g AS (SELECT event_type, n, sx, sy,
        |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
        |      / 100.0 AS slope,
        |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |      * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |      / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
        |        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
        |      AS r2
        |  FROM f)
        |SELECT event_type, n, slope,
        |  CAST(sy AS DOUBLE) / 100.0 / n - slope
        |    * (CAST(sx AS DOUBLE) / n) AS intercept,
        |  r2
        |FROM g""".stripMargin,
    // q_mi_assoc: (c/n)·ln(c/e) per observed cell, same tree as Spark
    "q_mi_assoc" ->
      """WITH cells AS (SELECT lang AS row_label, source AS col_label,
        |    count(*) AS n_obs
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT row_label, CAST(sum(n_obs) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT col_label, CAST(sum(n_obs) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells)
        |SELECT c.row_label, c.col_label, c.n_obs,
        |  CAST(round(1000000.0
        |    * (CAST(c.n_obs AS DOUBLE) / tot.n)
        |    * ln(CAST(c.n_obs AS DOUBLE)
        |      / (CAST(r.rt AS DOUBLE) * t2.ct / tot.n))) AS BIGINT)
        |    AS mi_contrib_ppm
        |FROM cells c JOIN rt r USING (row_label)
        |JOIN ct t2 USING (col_label) CROSS JOIN tot""".stripMargin,
    // q_cramers_v: aggregates over the full chi2 per-cell cross
    "q_cramers_v" ->
      """WITH cells AS (SELECT lang AS row_label, source AS col_label,
        |    count(*) AS n_obs
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT row_label, CAST(sum(n_obs) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT col_label, CAST(sum(n_obs) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells),
        |fl AS (SELECT r.row_label, c.col_label, r.rt, c.ct, tot.n,
        |    coalesce(cells.n_obs, 0) AS n_obs
        |  FROM rt r CROSS JOIN ct c CROSS JOIN tot
        |  LEFT JOIN cells ON cells.row_label = r.row_label
        |    AND cells.col_label = c.col_label),
        |pc AS (SELECT row_label, col_label, n_obs,
        |    CAST(round(1000000.0
        |      * ((n_obs - CAST(rt AS DOUBLE) * ct / n)
        |        * (n_obs - CAST(rt AS DOUBLE) * ct / n))
        |      / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT)
        |      AS chi2_contrib_ppm
        |  FROM fl),
        |ag AS (SELECT
        |    CAST(sum(chi2_contrib_ppm) AS BIGINT) AS chi2_ppm,
        |    CAST((count(DISTINCT row_label) - 1)
        |      * (count(DISTINCT col_label) - 1) AS BIGINT) AS dof,
        |    CAST(sum(n_obs) AS BIGINT) AS n,
        |    CAST(least(count(DISTINCT row_label) - 1,
        |      count(DISTINCT col_label) - 1) AS BIGINT) AS m
        |  FROM pc)
        |SELECT chi2_ppm, dof, n,
        |  CAST(round(1000000.0 * sqrt(
        |    chi2_ppm / 1000000.0 / (n * m))) AS BIGINT) AS v_ppm
        |FROM ag""".stripMargin,
    // q_auc: Mann-Whitney rank-sum with doubled-rank tie correction —
    // the ~n² rank sum is exact (HUGEINT here, decimal in Spark) and
    // rounded once to double, so the statistic still replays exactly
    "q_auc" ->
      """WITH b AS (SELECT CAST(ts AS DATE) AS day, value AS s,
        |    (event_type = 'purchase') AS p
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT day, p,
        |    rank() OVER (PARTITION BY day ORDER BY s) AS rk,
        |    count(*) OVER (PARTITION BY day, s) AS tc
        |  FROM b),
        |s AS (SELECT day,
        |    CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN NOT p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(sum(CASE WHEN p THEN 2 * rk + tc - 1 ELSE 0 END)
        |      AS DOUBLE) AS s2
        |  FROM r GROUP BY 1)
        |SELECT day, n_pos, n_neg,
        |  CAST(round(1000000.0 * (s2 - CAST(n_pos AS DOUBLE)
        |      * (CAST(n_pos AS DOUBLE) + 1.0))
        |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
        |    AS BIGINT) AS auc_ppm
        |FROM s WHERE n_pos > 0 AND n_neg > 0""".stripMargin,
    "q_prec_at_k" ->
      """WITH b AS (SELECT CAST(ts AS DATE) AS day, value AS s,
        |    event_id AS t, (event_type = 'purchase') AS p
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |tk AS (SELECT day, CAST(count(*) AS BIGINT) AS n_top,
        |    CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos_top
        |  FROM (SELECT day, p, row_number() OVER (
        |      PARTITION BY day ORDER BY s DESC, t ASC) AS rn FROM b)
        |  WHERE rn <= 20 GROUP BY 1),
        |ap AS (SELECT day,
        |    CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos_all
        |  FROM b GROUP BY 1
        |  HAVING sum(CASE WHEN p THEN 1 ELSE 0 END) > 0)
        |SELECT tk.day, tk.n_top, tk.n_pos_top, ap.n_pos_all,
        |  CAST(round(1000000.0 * n_pos_top / n_top) AS BIGINT)
        |    AS prec_ppm,
        |  CAST(round(1000000.0 * n_pos_top / n_pos_all) AS BIGINT)
        |    AS recall_ppm
        |FROM tk JOIN ap USING (day)""".stripMargin,
    "q_overlap" ->
      """WITH b AS (SELECT DISTINCT event_type AS label, user_id AS el
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |sz AS (SELECT label, count(*) AS n FROM b GROUP BY 1),
        |p AS (SELECT a.label AS label_a, c.label AS label_b,
        |    count(*) AS n_common
        |  FROM b a JOIN b c ON a.el = c.el AND a.label < c.label
        |  GROUP BY 1, 2)
        |SELECT p.label_a, p.label_b, sa.n AS n_a, sb.n AS n_b,
        |  p.n_common,
        |  CAST(round(1000000.0 * p.n_common
        |    / (sa.n + sb.n - p.n_common)) AS BIGINT) AS jaccard_ppm,
        |  CAST(round(1000000.0 * p.n_common / least(sa.n, sb.n))
        |    AS BIGINT) AS containment_ppm
        |FROM p JOIN sz sa ON p.label_a = sa.label
        |JOIN sz sb ON p.label_b = sb.label""".stripMargin,
    "q_event_gaps" ->
      """WITH b AS (SELECT user_id AS "key", epoch_us(ts) AS t,
        |    event_id AS tie
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT "key",
        |    t - lag(t) OVER (PARTITION BY "key" ORDER BY t, tie) AS gap
        |  FROM b)
        |SELECT "key", CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS min_gap_us,
        |  CAST(max(gap) AS BIGINT) AS max_gap_us,
        |  CAST(sum(gap) AS DOUBLE) / count(*) AS mean_gap_us
        |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin,
    "q_twa" ->
      """WITH b AS (SELECT user_id AS "key", epoch_us(ts) AS t,
        |    event_id AS tie,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT "key", c,
        |    lead(t) OVER (PARTITION BY "key" ORDER BY t, tie) - t AS gap
        |  FROM b),
        |s AS (SELECT "key", CAST(count(*) AS BIGINT) AS n_segments,
        |    CAST(sum(gap) AS BIGINT) AS span_us,
        |    CAST(sum(CAST(c AS HUGEINT) * gap) AS DOUBLE) AS sw
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1
        |  HAVING CAST(sum(gap) AS BIGINT) > 0)
        |SELECT "key", n_segments, span_us,
        |  sw / span_us / 100.0 AS twa
        |FROM s""".stripMargin,
    // q_minhash_stream: the drained micro-batch states must equal the
    // same from-scratch signatures as q_minhash_states
    "q_minhash_stream" ->
      """WITH t AS (
        |  SELECT source,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT source, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), e AS (
        |  SELECT source, sh, unnest(range(8)) AS hash_id FROM sh
        |)
        |SELECT source, CAST(hash_id AS BIGINT) AS hash_id,
        |  min(('0x' || substr(sha256(
        |    '7|' || CAST(hash_id // 4 AS VARCHAR) || '|' || sh),
        |    1 + 15 * (hash_id % 4), 15))::BIGINT)
        |    AS min_hash
        |FROM e GROUP BY 1, 2""".stripMargin,
    // q_minhash_states: from-scratch signatures over ALL documents —
    // the entry's incremental merge must land on exactly these
    "q_minhash_states" ->
      """WITH t AS (
        |  SELECT source,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT source, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), e AS (
        |  SELECT source, sh, unnest(range(8)) AS hash_id FROM sh
        |)
        |SELECT source, CAST(hash_id AS BIGINT) AS hash_id,
        |  min(('0x' || substr(sha256(
        |    '7|' || CAST(hash_id // 4 AS VARCHAR) || '|' || sh),
        |    1 + 15 * (hash_id % 4), 15))::BIGINT)
        |    AS min_hash
        |FROM e GROUP BY 1, 2""".stripMargin,
    // q_pack_report: the q_pack_greedy recursive replay, aggregated to
    // per-bin fill/waste KPIs
    "q_pack_report" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
        |    CAST(doc_id % 8 AS BIGINT) AS shard,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |      AS rn
        |  FROM documents
        |), rec AS (
        |  SELECT doc_id, shard, rn, CAST(0 AS BIGINT) AS bin,
        |    len AS fill
        |  FROM p WHERE rn = 1
        |  UNION ALL
        |  SELECT p.doc_id, p.shard, p.rn,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.bin ELSE rec.bin + 1 END,
        |    CASE WHEN rec.fill > 0 AND rec.fill + p.len <= 4096
        |         THEN rec.fill + p.len ELSE p.len END
        |  FROM rec JOIN p ON p.shard = rec.shard AND p.rn = rec.rn + 1
        |), g AS (
        |  SELECT rec.shard, rec.bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(p.len) AS BIGINT) AS used
        |  FROM rec JOIN p ON p.doc_id = rec.doc_id GROUP BY 1, 2
        |)
        |SELECT shard, bin, n_docs, used, 4096 - used AS waste,
        |  CAST(round(1000000.0 * used / 4096) AS BIGINT) AS fill_ppm
        |FROM g""".stripMargin,
    // q_moments: mu and the central moments defined once (CTE) so both
    // engines evaluate the identical double trees from exact sums
    "q_moments" ->
      """WITH q AS (SELECT event_type,
        |    CAST(round(value * 1) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(c * c AS HUGEINT) * c) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(c * c AS HUGEINT) * (c * c)) AS DOUBLE) AS s4
        |  FROM q GROUP BY 1 HAVING count(*) >= 2),
        |m0 AS (SELECT event_type, n, s2, s3, s4,
        |    CAST(s1 AS DOUBLE) / n AS mu
        |  FROM s),
        |m AS (SELECT event_type, n, mu,
        |    CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
        |    CAST(s3 AS DOUBLE) / n - 3.0 * mu * (CAST(s2 AS DOUBLE) / n)
        |      + 2.0 * mu * mu * mu AS m3,
        |    CAST(s4 AS DOUBLE) / n - 4.0 * mu * (CAST(s3 AS DOUBLE) / n)
        |      + 6.0 * mu * mu * (CAST(s2 AS DOUBLE) / n)
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m0)
        |SELECT event_type, n, mu / 1.0 AS mean,
        |  m2 / 1.0 / 1.0 AS variance,
        |  m3 / (m2 * sqrt(m2)) AS skewness,
        |  m4 / (m2 * m2) - 3.0 AS kurtosis
        |FROM m WHERE m2 > 0""".stripMargin,
    "q_mix_proportions" ->
      """WITH w(src, wt) AS (VALUES ('src0', 3), ('src1', 2),
        |  ('src2', 1)),
        |d AS (SELECT doc_id, source FROM documents
        |  JOIN w ON source = w.src),
        |q AS (SELECT d.source, w.wt, count(*) AS n
        |  FROM d JOIN w ON d.source = w.src GROUP BY 1, 2),
        |t AS (SELECT min(n * 6 // wt) AS t FROM q),
        |k AS (SELECT q.source, q.wt * t.t // 6 AS k
        |  FROM q CROSS JOIN t),
        |r AS (SELECT d.doc_id, d.source,
        |    row_number() OVER (PARTITION BY d.source ORDER BY
        |      ('0x' || substr(sha256('0|' || CAST(d.doc_id AS VARCHAR)),
        |        1, 15))::BIGINT ASC, d.doc_id ASC) AS rk
        |  FROM d)
        |SELECT r.doc_id, r.source
        |FROM r JOIN k ON r.source = k.source WHERE r.rk <= k.k""".stripMargin,
    "q_ks_drift_by" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c, day(ts) AS d
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT event_type, c AS v, count(*) AS na FROM e
        |  WHERE d <= 15 GROUP BY 1, 2),
        |b AS (SELECT event_type, c AS v, count(*) AS nb FROM e
        |  WHERE d > 15 GROUP BY 1, 2),
        |j AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
        |    coalesce(a.v, b.v) AS v,
        |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM a FULL OUTER JOIN b
        |    ON a.event_type = b.event_type AND a.v = b.v),
        |r AS (SELECT event_type, v,
        |    sum(na) OVER w AS ca, sum(nb) OVER w AS cb,
        |    sum(na) OVER (PARTITION BY event_type) AS ta,
        |    sum(nb) OVER (PARTITION BY event_type) AS tb
        |  FROM j WINDOW w AS (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, CAST(max(ta) AS BIGINT) AS n_base,
        |    CAST(max(tb) AS BIGINT) AS n_cur,
        |    CAST(max(abs(CAST(ca AS HUGEINT) * tb
        |      - CAST(cb AS HUGEINT) * ta)) AS DOUBLE) AS ks_num
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_base, n_cur, ks_num,
        |  CAST(round(1000000.0 * ks_num
        |    / (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE))) AS BIGINT)
        |    AS ks_ppm
        |FROM s WHERE n_base > 0 AND n_cur > 0""".stripMargin,
    "q_blocklist" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE text IS NULL OR len(list_intersect(
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> ''),
        |  ['slow', 'merge', 'vector'])) = 0""".stripMargin,
    "q_blocklist_report" ->
      """WITH w(word) AS (VALUES ('slow'), ('merge'), ('vector'),
        |  ('zzznevermatches')),
        |tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT w.word, tk.doc_id,
        |    len(list_filter(tk.t, x -> x = w.word)) AS n
        |  FROM w JOIN tk ON list_contains(tk.t, w.word)),
        |c AS (SELECT word, count(*) AS n_docs, sum(n) AS n_tokens
        |  FROM m GROUP BY 1)
        |SELECT w.word, CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
        |  CAST(coalesce(c.n_tokens, 0) AS BIGINT) AS n_tokens
        |FROM w LEFT JOIN c USING (word)""".stripMargin,
    "q_anova" ->
      """WITH q AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c * c) AS DOUBLE) AS ssq FROM q),
        |gg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(c) AS BIGINT) AS sg FROM q GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list_aggregate(
        |      list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng ORDER BY g),
        |      'sum') AS aa
        |  FROM gg)
        |SELECT t.n, a.k,
        |  (a.aa - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n)
        |    / (t.ssq - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n) AS eta2,
        |  (a.aa - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n) / (a.k - 1)
        |    / ((t.ssq - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n
        |      - (a.aa - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n))
        |      / (t.n - a.k)) AS f_stat
        |FROM a CROSS JOIN t
        |WHERE a.k >= 2 AND t.n > a.k""".stripMargin,
    "q_source_sim" ->
      """WITH t AS (
        |  SELECT source,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT source, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END)) AS sh
        |  FROM t
        |), e AS (
        |  SELECT source, sh, unnest(range(8)) AS hash_id FROM sh
        |), st AS (
        |  SELECT source, hash_id,
        |    min(('0x' || substr(sha256(
        |      '7|' || CAST(hash_id // 4 AS VARCHAR) || '|' || sh),
        |      1 + 15 * (hash_id % 4), 15))::BIGINT)
        |      AS min_hash
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT a.source AS key_a, b.source AS key_b,
        |  CAST(sum(CASE WHEN a.min_hash = b.min_hash THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_match,
        |  CAST(round(1000000.0
        |    * sum(CASE WHEN a.min_hash = b.min_hash THEN 1 ELSE 0 END)
        |    / 8) AS BIGINT) AS est_jaccard_ppm
        |FROM st a JOIN st b
        |  ON a.hash_id = b.hash_id AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "q_ks_drift" ->
      """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    day(ts) AS d
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT c AS v, count(*) AS na FROM e WHERE d <= 15
        |  GROUP BY 1),
        |b AS (SELECT c AS v, count(*) AS nb FROM e WHERE d > 15
        |  GROUP BY 1),
        |j AS (SELECT coalesce(a.v, b.v) AS v, coalesce(na, 0) AS na,
        |    coalesce(nb, 0) AS nb
        |  FROM a FULL OUTER JOIN b ON a.v = b.v),
        |r AS (SELECT v, sum(na) OVER w AS ca, sum(nb) OVER w AS cb,
        |    sum(na) OVER () AS ta, sum(nb) OVER () AS tb
        |  FROM j WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT CAST(max(ta) AS BIGINT) AS n_base,
        |    CAST(max(tb) AS BIGINT) AS n_cur,
        |    CAST(max(abs(CAST(ca AS HUGEINT) * tb
        |      - CAST(cb AS HUGEINT) * ta)) AS DOUBLE) AS ks_num
        |  FROM r)
        |SELECT n_base, n_cur, ks_num,
        |  CAST(round(1000000.0 * ks_num
        |    / (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE))) AS BIGINT)
        |    AS ks_ppm
        |FROM s WHERE n_base > 0 AND n_cur > 0""".stripMargin,
    // q_bucketed_join: the bucketed catalog round-trip must produce the
    // plain join + aggregate, bit-for-bit (integer cents)
    "q_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(
        |    l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_c
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,
    "q_gini" ->
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |f AS (SELECT g, c FROM v WHERE c >= 0),
        |r AS (SELECT g, c,
        |    row_number() OVER (PARTITION BY g ORDER BY c) AS i FROM f),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(c) AS sx,
        |    sum(i * c) AS six
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, n, CAST(sx AS BIGINT) AS sum_c,
        |  CAST(round(1000000.0 * CAST(2 * six - (n + 1) * sx AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)))
        |    AS BIGINT) AS gini_ppm
        |FROM s WHERE sx > 0""".stripMargin,
    // q_ndcg: the discount table is interpolated from the SAME
    // Stats.ndcgWeights computation the Spark plan embeds as literals
    "q_ndcg" -> {
      val k = 20
      val w = graft.ops.Stats.ndcgWeights(k)
      val cum = w.scanLeft(0L)(_ + _).tail
      val wtRows = (1 to k).map(i => s"($i, ${w(i - 1)})").mkString(", ")
      val cwRows = (1 to k).map(j => s"($j, ${cum(j - 1)})").mkString(", ")
      s"""WITH b AS (SELECT CAST(ts AS DATE) AS day, value AS s,
         |    event_id AS t, (event_type = 'purchase') AS p
         |  FROM events
         |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
         |r AS (SELECT day, p, row_number() OVER (
         |    PARTITION BY day ORDER BY s DESC, t ASC) AS rn FROM b),
         |wt(i, w) AS (VALUES $wtRows),
         |cw(j, c) AS (VALUES $cwRows),
         |d AS (SELECT day,
         |    CAST(sum(CASE WHEN p THEN wt.w ELSE 0 END) AS BIGINT)
         |      AS dcg_ppm
         |  FROM r JOIN wt ON r.rn = wt.i WHERE r.rn <= $k GROUP BY 1),
         |ap AS (SELECT day,
         |    CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos_all
         |  FROM b GROUP BY 1
         |  HAVING sum(CASE WHEN p THEN 1 ELSE 0 END) > 0),
         |j AS (SELECT ap.day, ap.n_pos_all,
         |    CAST(coalesce(d.dcg_ppm, 0) AS BIGINT) AS dcg_ppm
         |  FROM ap LEFT JOIN d USING (day)),
         |f AS (SELECT j.day, j.n_pos_all, j.dcg_ppm,
         |    CAST(cw.c AS BIGINT) AS idcg_ppm
         |  FROM j JOIN cw ON cw.j = least(j.n_pos_all, $k))
         |SELECT day, n_pos_all, dcg_ppm, idcg_ppm,
         |  CAST(round(1000000.0 * dcg_ppm / idcg_ppm) AS BIGINT)
         |    AS ndcg_ppm
         |FROM f""".stripMargin
    },
    "q_top_paths" ->
      """WITH r AS (SELECT user_id AS k, event_type AS s,
        |    row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT k, string_agg(s, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1),
        |c AS (SELECT path, count(*) AS n FROM p GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT path, n,
        |  CAST(round(1000000.0 * n / tot.tot) AS BIGINT) AS share_ppm
        |FROM c CROSS JOIN tot""".stripMargin,
    "q_new_users" ->
      """WITH p AS (SELECT DISTINCT user_id AS e, CAST(ts AS DATE)
        |    AS period
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT period, count(*) AS n_active FROM p GROUP BY 1),
        |fs AS (SELECT period, count(*) AS n_new FROM (
        |    SELECT e, min(period) AS period FROM p GROUP BY 1)
        |  GROUP BY 1),
        |j AS (SELECT a.period, CAST(a.n_active AS BIGINT) AS n_active,
        |    CAST(coalesce(fs.n_new, 0) AS BIGINT) AS n_new
        |  FROM a LEFT JOIN fs USING (period))
        |SELECT period, n_active, n_new,
        |  n_active - n_new AS n_returning,
        |  CAST(sum(n_new) OVER (ORDER BY period
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_entities
        |FROM j""".stripMargin,
    // q_incr_quantile: from-scratch grid quantiles over the whole month
    "q_incr_quantile" ->
      """WITH b AS (SELECT event_type,
        |    CAST(least(greatest(floor((value - 0.0) / 0.5), 0.0), 999.0)
        |      AS BIGINT) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
        |r AS (SELECT event_type, bin,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS tot
        |  FROM c)
        |SELECT event_type,
        |  0.0 + CAST(min(CASE WHEN cum >= ceil(0.5 * tot) THEN bin END)
        |    AS DOUBLE) * 0.5 AS p50,
        |  0.0 + CAST(min(CASE WHEN cum >= ceil(0.9 * tot) THEN bin END)
        |    AS DOUBLE) * 0.5 AS p90,
        |  0.0 + CAST(min(CASE WHEN cum >= ceil(0.99 * tot) THEN bin END)
        |    AS DOUBLE) * 0.5 AS p99
        |FROM r GROUP BY 1""".stripMargin,
    "q_hhi" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_entities,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(c * c) AS DOUBLE) AS c2
        |  FROM c GROUP BY 1)
        |SELECT event_type, n_entities, n_rows,
        |  CAST(round(1000000.0 * c2
        |    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))) AS BIGINT)
        |    AS hhi_ppm
        |FROM s""".stripMargin,
    // q_sql_bounds: deterministic SVT replay with the reference binning —
    // rank = clamp(ceil(log2(|x|)), -100, 100), exact via the two-sided
    // power-of-two fix-up; all 201 bins materialized so threshold 0 picks
    // bin -100, else the first crossing of floor(0.95 n) in rank order
    "q_sql_bounds" ->
      """WITH v AS (SELECT l_returnflag AS g, abs(l_quantity) AS mag,
        |    CASE WHEN abs(l_quantity) > 0
        |      THEN CAST(ceil(log2(abs(l_quantity))) AS BIGINT) END AS r0
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |rk AS (SELECT g,
        |    CASE WHEN mag = 0 THEN -100
        |      ELSE least(greatest(
        |        CASE WHEN power(2.0, r0 - 1) >= mag THEN r0 - 1
        |             WHEN power(2.0, r0) < mag THEN r0 + 1
        |             ELSE r0 END, -100), 100) END AS b
        |  FROM v),
        |c AS (SELECT g, b, count(*) AS n FROM rk GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(floor(sum(n) * 0.95) AS BIGINT) AS thr
        |  FROM c GROUP BY 1),
        |r AS (SELECT c.g, c.b,
        |    sum(c.n) OVER (PARTITION BY c.g ORDER BY c.b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    thr
        |  FROM c JOIN tot ON c.g = tot.g),
        |sel AS (SELECT g,
        |    CASE WHEN max(thr) <= 0 THEN -100
        |      ELSE min(CASE WHEN cum >= thr THEN b END) END AS s
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, -power(2.0, s) AS lo,
        |  power(2.0, s) AS hi
        |FROM sel""".stripMargin
  )
}
