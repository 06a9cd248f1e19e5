package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query plus the reference-envelope
  * workload sweeps (BASELINE.md shapes) at SPARK_GRAFT_SF_DIR.
  *
  * Each query is timed `SPARK_GRAFT_BENCH_RUNS` times (default 3) after a
  * full warmup pass, and the TRIMMED MEDIAN is reported (drop the single
  * worst run, median of the rest — ScaleBench's discipline) — single-run
  * timings carried a ±20% machine-variance band, and the r11 window showed
  * a plain median-of-3 has no defense against machine contention (one
  * 120.7 s outlier run on a 200k-row noise query dragged a whole round's
  * record). Two further defenses: any query whose max/min run spread
  * exceeds 3× gets ONE bounded re-run round (same run count again) so a
  * contention burst doesn't own its statistic, and every run records the
  * host 1-min /proc/loadavg alongside its JVM GC seconds in the full dump,
  * so contamination is self-diagnosing after the fact. The per-query
  * minima are also written (`mins` in the full dump, `total_entry_min` on
  * the summary line): the min is the statistic least sensitive to load
  * and the honest floor for cross-round comparison.
  * The two skew-vs-uniform sweep pairs are additionally
  * INTERLEAVED (u,s,u,s,...) at >= 5 runs and report a `_ratio_max` entry:
  * the max per-pairing skew/uniform ratio, computed within one machine-load
  * regime — the statistic the ~2x skew acceptance bar is judged on — plus
  * `_ratio_max_trim` (worst pairing dropped) and per-run JVM GC seconds in
  * the full dump, so a one-off collection storm is attributable. The
  * printed JSON line keeps the per-query medians sorted name-first and
  * appends the sweep entries and totals LAST (downstream tooling stores
  * only the tail of the line); the complete per-run data (including the
  * per-pairing ratio series) is also written to SPARK_GRAFT_BENCH_FULL
  * (default bench_full.json).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // SPARK_GRAFT_MASTER: same contract as Verify — point the bench at a
    // real multi-JVM standalone cluster (scripts/cluster_bench.sh) so the
    // timed path includes executor-JVM serialization and netty
    // shuffle/broadcast transport instead of local[n] in-process moves.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Dev convenience: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times only those
    // entries (others report 0.0 without running). The driver never sets
    // it, so its runs always time everything.
    val benchOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def enabled(name: String): Boolean = benchOnly.forall(_.contains(name))

    // median-of-N timing: every run clears the cache and prompts a GC so one
    // run's persisted intermediates / localCheckpoint blocks cannot distort
    // the next (the ContextCleaner works off weak references)
    val allRuns = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // per-run JVM GC seconds (delta of the collector MXBean totals over the
    // timed body): distinguishes an operator regression from a collection
    // storm when a run in a spread like [3.9, 4.2, 16.2] needs attribution
    val allGc = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // per-run host 1-min load average, read just before the timed body:
    // the one signal that attributes an outlier to EXTERNAL machine load
    // (the r11 bench window was contaminated by exactly that and had no
    // on-disk evidence of it)
    val allLoad = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def loadAvg1m(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // trimmed median (ScaleBench's discipline): drop the single worst run
    // as machine debris, median of the rest — reported NEXT TO the per-run
    // samples and minima in the full dump, never instead of them
    def trimmedMedian(ts: Seq[Double]): Double = {
      val t = ts.sorted.dropRight(if (ts.size >= 3) 1 else 0)
      if (t.size % 2 == 1) t(t.size / 2)
      else (t(t.size / 2 - 1) + t(t.size / 2)) / 2
    }
    def timeOnce(body: => Unit): (Double, Double, Double) = {
      val load = loadAvg1m()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      val gcDt = (gcMillis() - gc0) / 1e3
      // cache clear + System.gc happen AFTER the gc delta is read, so the
      // inter-run housekeeping collection is not charged to the run
      spark.catalog.clearCache()
      System.gc()
      (dt, gcDt, load)
    }
    def record(name: String, runs: Seq[(Double, Double, Double)]): Unit = {
      allRuns(name) = runs.map(_._1)
      allGc(name) = runs.map(_._2)
      allLoad(name) = runs.map(_._3)
    }
    def timeMedian(name: String, runs: Int = runsPerQuery)(
        body: => Unit): (String, Double) = {
      if (!enabled(name)) return name -> 0.0
      var ts = (1 to runs).map(_ => timeOnce(body))
      // contention guard: a >3x max/min spread within one query's runs is
      // external load, not the plan — take ONE more round of runs so the
      // burst can't own the statistic (bounded: at most 2x the run count)
      if (ts.map(_._1).max / ts.map(_._1).min.max(1e-9) > 3.0)
        ts = ts ++ (1 to runs).map(_ => timeOnce(body))
      record(name, ts)
      name -> trimmedMedian(ts.map(_._1))
    }
    // Interleaved pair timing (a,b,a,b,...): both bodies alternate within
    // ONE timing block so each pairing shares a machine-load regime. The
    // big-sweep runs spread 3-5x across separately-timed blocks, which made
    // a skew/uniform ratio of medians a single-regime sample; the honest
    // statistic is the per-pairing ratio, reported as its MAX alongside the
    // two medians (as `<nameB>_ratio_max`) plus a `_ratio_max_trim` that
    // drops the single worst pairing — one GC- or load-spiked pairing in 5
    // otherwise drives the max alone (r6: ratios [1.1, 1.0, 1.2, 3.0, 1.1]
    // graded 3.0 while every other pairing sat near 1).
    def timeMedianPair(nameA: String, nameB: String, runs: Int)(
        bodyA: => Unit)(bodyB: => Unit): Seq[(String, Double)] = {
      if (!enabled(nameA) || !enabled(nameB))
        return Seq(timeMedian(nameA)(bodyA), timeMedian(nameB)(bodyB))
      // one untimed warmup pairing: these synthetic plans are built fresh
      // per run, so their first execution carries the plan's whole-stage
      // codegen compile — measured ~3x on the 6.4M-row pair — which would
      // land entirely on the first pairing's A side and corrupt its ratio
      timeOnce(bodyA)
      timeOnce(bodyB)
      val pairs = (1 to runs).map(_ => (timeOnce(bodyA), timeOnce(bodyB)))
      record(nameA, pairs.map(_._1))
      record(nameB, pairs.map(_._2))
      val ratios = pairs.map { case (a, b) => b._1 / a._1 }
      allRuns(s"${nameB}_ratio") = ratios
      val trimmed = if (ratios.size >= 2) ratios.sorted.dropRight(1) else ratios
      Seq(nameA -> trimmedMedian(pairs.map(_._1._1)),
        nameB -> trimmedMedian(pairs.map(_._2._1)),
        s"${nameB}_ratio_max" -> ratios.max,
        s"${nameB}_ratio_max_trim" -> trimmed.max)
    }

    // Warmup (untimed): force a full read of every table (xxhash64 over all
    // columns defeats the parquet count-from-metadata shortcut), so the
    // timed loop measures steady-state execution instead of first-touch
    // page-cache misses.
    import org.apache.spark.sql.functions.{col, expr, when}
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try
        // bit_xor, not sum: ANSI mode makes a long-overflowing sum abort
        // the scan mid-table, silently leaving the tail of the file cold
        spark.read.parquet(s"$sfDir/$t.parquet")
          .select(expr("bit_xor(xxhash64(struct(*)))")).collect()
      catch { case _: Throwable => () }
    }
    // JIT/codegen warmup: run EVERY query once at the smallest SF so each
    // plan's generated code is compiled before it is timed — otherwise the
    // (hash-ordered) first few queries absorb the whole JVM warmup cost and
    // per-query numbers shift across rounds as the query set grows.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    var warmFailures = 0
    SparkEntry.queries.filter(kv => enabled(kv._1)).foreach { case (_, fn) =>
      // toRdd so warmup compiles the same generated code the timed run uses
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch { case _: Throwable => warmFailures += 1 }
      spark.catalog.clearCache()
    }
    if (warmFailures == SparkEntry.queries.size)
      System.err.println(s"WARNING: warmup found no data at $warmDir; timed queries will absorb JIT cost")
    System.gc()

    // toRdd, not count(): under count() the optimizer prunes every column
    // of the final projection — and for row-preserving plans (a left join
    // to a unique-keyed aggregate, a pure per-row rewrite) eliminates the
    // whole computation, timing just the scan. toRdd materializes each
    // output row, so the timed work is what a consumer of the query pays.
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      timeMedian(name) { consume(fn(spark, sfDir)) }
    }

    // Reference-envelope sweep (BASELINE.md / benchmark/count_sum.py
    // workload shapes): noisy grouped count+sum over 2 Long columns at the
    // reference's smallest/middle/largest CI domain sizes, on both the
    // empty-df and 1-row-per-group datasets. The reference's CI budget for
    // the full sweep is 25 minutes; each shape here is one timed entry.
    val sweepResults: Seq[(String, Double)] = {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.exact.{ExactNum, Rational}
      import graft.measures.PureDPBudget
      import graft.measurements.{Aggregations, NoiseKind}
      import graft.metrics.SymmetricDifference
      Seq(100, 10000, 640000).flatMap { n =>
        Seq(false, true).map { empty =>
          val name = s"q_countsum_${n}g${if (empty) "_empty" else ""}"
          // the 640k-group entry runs >= 5 times: its first timed run
          // compiles the largest countsum plan's codegen (~2x the
          // steady-state 3.3 s), and at 3 runs the median sat adjacent to
          // that warmup — the r5 "drift" [5.60, 4.49, 3.12] was warmup
          // order, not a plan regression (steady state matches r4's 3.31 s)
          val runs = if (n == 640000) runsPerQuery.max(5) else runsPerQuery
          timeMedian(name, runs) {
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
            mSum(data).asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
          }
        }
      }
    }
    // Reference quantile benchmark shape (benchmark/quantile.py, CI budget
    // 84 min for its sweep): per-group noisy median over many small groups
    // and few huge groups.
    val quantileSweep: Seq[(String, Double)] = {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.exact.ExactNum
      import graft.measures.PureDPBudget
      import graft.measurements.Aggregations
      import graft.metrics.SymmetricDifference
      Seq(("q_quantile_10000g", 10000, 10), ("q_quantile_10g", 10, 100000))
        .map { case (name, groups, perGroup) =>
          timeMedian(name) {
            val keys = spark.range(groups.toLong).select(col("id").as("A"))
            val data = spark.range(groups.toLong * perGroup)
              .select((col("id") % groups).as("A"), (col("id") % 97).cast("double").as("X"))
            val dom = DataFrameDomain(
              Seq("A" -> ColumnDescriptor.long, "X" -> ColumnDescriptor.double()))
            val m = Aggregations.createQuantileMeasurement(
              dom, SymmetricDifference, ExactNum(1), PureDPBudget(ExactNum(1)),
              "X", 0.5, 0.0, 97.0, keys, "median")
            m(data).asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
          }
        }
    }
    // Private-join truncation sweep (reference envelope
    // benchmark/private_join.py, the largest CI budget at 35 min):
    // τ ∈ {1, 10, 100} × both strategies on a uniform 1.6M-row dataset,
    // plus the headline pair at 6.4M rows / 640k join keys: uniform vs
    // power-law (one key owning 10% of all rows — 640k rows, well past
    // hotGroupMinRows, so the salted two-phase truncation hot path is the
    // code under test; it must keep the skewed run within ~2× of the
    // uniform one).
    val pjoinSweep: Seq[(String, Double)] = {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.transformations.{PrivateJoin, TruncationStrategy}
      def pjoinBody(skew: Boolean, tau: Int,
                    strategy: TruncationStrategy, groups: Long): Unit = {
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
          leftStrategy = strategy, leftThreshold = tau,
          rightStrategy = strategy, rightThreshold = tau)
        pj(Map("left" -> left, "right" -> right))
          .asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
      }
      Seq(1, 10, 100).flatMap { tau =>
        Seq(
          timeMedian(s"q_pjoin_t${tau}_trunc")(pjoinBody(
            skew = false, tau, TruncationStrategy.Truncate, groups = 160000L)),
          timeMedian(s"q_pjoin_t${tau}_drop")(pjoinBody(
            skew = false, tau, TruncationStrategy.Drop, groups = 160000L)))
      } ++
        // the headline 6.4M-row pair is interleaved (u,s,u,s,...) at >= 5
        // runs: its single runs spread 3-5x with machine load, so only
        // per-pairing ratios say anything about the salted hot path's cost
        timeMedianPair("q_pjoin_uniform", "q_pjoin_skew",
          runs = runsPerQuery.max(5))(
          pjoinBody(skew = false, 5, TruncationStrategy.Truncate, 640000L))(
          pjoinBody(skew = true, 5, TruncationStrategy.Truncate, 640000L))
    }
    // Key-limiting under group skew: 6.4M rows, 64k groups; the skewed
    // variant gives one group 10% of all rows. The distinct-pairs
    // restructure of limitKeysPerGroup must keep the skewed run within ~2×
    // of the uniform one (the old full-row window serialized it on one task).
    val limitKeysSweep: Seq[(String, Double)] = {
      import graft.transformations.Truncation
      def body(skew: Boolean): Unit = {
        val groups = 64000L
        val g =
          if (skew) when(col("id") % 10 === 0, 0L).otherwise(col("id") % groups)
          else col("id") % groups
        val data = spark.range(groups * 100)
          .select(g.as("G"), (col("id") % 997).as("K"))
        Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), 5)
          .count(): Unit
      }
      timeMedianPair("q_limitkeys_uniform", "q_limitkeys_skew",
        runs = runsPerQuery.max(5))(body(skew = false))(body(skew = true))
    }

    // Noise-mechanism sampling throughput (reference envelope
    // benchmark/noise_mechanism.py, CI budget 7 min): 10M draws through the
    // codegen'd AddNoise expression per mechanism. The reference samples
    // scalar-at-a-time through ctypes into vendored C; here the per-row cost
    // is a JVM expression inside whole-stage codegen — this entry is the
    // direct measurement of BASELINE.md's "expected structural advantage".
    val noiseSweep: Seq[(String, Double)] = {
      import graft.exact.Rational
      import graft.measurements._
      // Row counts are sized per mechanism so each entry lands in the
      // seconds range: the integer mechanisms sample at ~6M rows/s, the
      // exactly-rounded continuous ones at ~500k (Laplace) and ~90k
      // (Gaussian — interval-refined erf⁻¹ per draw) rows/s.
      val mechs: Seq[(String, NoiseMechanism, Long)] = Seq(
        ("q_noise_geometric_10m", GeometricMechanism(Rational(1, 2)), 10000000L),
        ("q_noise_dgauss_10m", DiscreteGaussianMechanism(Rational(4)), 10000000L),
        ("q_noise_laplace_2m", LaplaceMechanism(Rational(2)), 2000000L),
        ("q_noise_gauss_200k", GaussianMechanism(Rational(4)), 200000L))
      mechs.map { case (name, m, rows) =>
        timeMedian(name) {
          // the aggregate CONSUMES y — count(1) would let column pruning
          // delete the (unused) noise projection and time nothing; double
          // sum saturates instead of raising ANSI overflow
          spark.range(rows)
            .select(AddNoise(col("id"), m).as("y"))
            .agg(expr("sum(cast(y as double))")).collect(): Unit
        }
      }
    }
    // Map/FlatMap row throughput (reference envelope benchmark/sparkmap.py
    // 28-min and sparkflatmap.py 12-min budgets): the §2 Map operator is a
    // typed Dataset.map under Tungsten encoders where the reference pays
    // rdd + pickle per row; FlatMap fans 1→2.
    val mapSweep: Seq[(String, Double)] = {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.metrics.SymmetricDifference
      import graft.transformations._
      import org.apache.spark.sql.Row
      val domX = DataFrameDomain(Seq("X" -> ColumnDescriptor.long))
      val domY = DataFrameDomain(Seq("Y" -> ColumnDescriptor.long))
      Seq(
        timeMedian("q_map_5m") {
          val mt = MapTransformation(
            SymmetricDifference,
            RowToRowTransformation(domX, domY,
              r => Row(r.getLong(0) * 2 + 1), augment = false))
          mt(spark.range(5000000L).select(col("id").as("X")))
            .asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
        },
        timeMedian("q_flatmap_5m") {
          val ft = FlatMapTransformation(
            SymmetricDifference,
            RowToRowsTransformation(domX, domY,
              r => Seq(Row(r.getLong(0)), Row(-r.getLong(0))), augment = false),
            maxNumRows = Some(2))
          ft(spark.range(5000000L).select(col("id").as("X")))
            .asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
        })
    }
    // PublicJoin envelope (benchmark/public_join.py, CI budget 14 min):
    // 1.6M private rows joined to a 10k-key public table, eager
    // multiplicity probe included in the timing.
    val publicJoinSweep: Seq[(String, Double)] = {
      import graft.domains.{ColumnDescriptor, DataFrameDomain}
      import graft.metrics.SymmetricDifference
      import graft.transformations.PublicJoin
      Seq(timeMedian("q_pubjoin_1600k") {
        val priv = spark.range(1600000L)
          .select((col("id") % 10000).as("K"), (col("id") % 97).as("V"))
        val pub = spark.range(20000L)
          .select((col("id") % 10000).as("K"), (col("id") % 7).as("W"))
        val dom = DataFrameDomain(
          Seq("K" -> ColumnDescriptor.long, "V" -> ColumnDescriptor.long))
        PublicJoin(dom, SymmetricDifference, pub, on = Seq("K"))(priv)
          .asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
      })
    }

    // per-query medians first (sorted), reference sweeps + total LAST so
    // they survive tail-truncated captures of the (single-line) output
    val ordered: Seq[(String, Double)] =
      results ++ sweepResults ++ quantileSweep ++ pjoinSweep ++
        limitKeysSweep ++ noiseSweep ++ mapSweep ++ publicJoinSweep
    val total = results.map(_._2).sum
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // minimal JSON string escape for embedded paths
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c    => c.toString
      } + "\""
    val qs = (ordered.map { case (k, v) => s"\"$k\":${fmt(v)}" } :+
      s"\"total_entry_queries\":${fmt(total)}").mkString("{", ",", "}")
    // complete per-run data for offline analysis (the printed line only
    // carries medians)
    // mirror paths default next to the working directory (the repo root
    // when launched by sbt or the driver); env vars override
    val cwd = sys.props.getOrElse("user.dir", ".")
    // per-run-unique default path: round 17's 8-core companion run clobbered
    // the 32-core run's dump (both wrote bench_full.json), leaving the
    // contaminated 32-core window with no auditable load series. The default
    // now keys on (cpus, runs); the legacy path is still mirrored below so
    // existing tooling keeps working. An explicit SPARK_GRAFT_BENCH_FULL is
    // honored verbatim (single path, no mirror).
    val fullPathEnv = sys.env.get("SPARK_GRAFT_BENCH_FULL")
    val fullPath = fullPathEnv.getOrElse(
      s"$cwd/bench_full_c${cpus}_r$runsPerQuery.json")
    // per-query minima: the load-insensitive floor (a min can only be
    // slowed by contention, never helped), summed over the entry queries
    val totalMin = results.collect {
      case (name, _) if allRuns.contains(name) => allRuns(name).min
    }.sum
    // Contamination self-diagnosis (round-17 verdict item: the driver's
    // 32-core window carried a poisoned stretch that PERF ingested blind).
    // A query is SUSPECT when, even after the bounded re-run round, either
    //  - its max/min run spread exceeds 3x (a burst owned the statistic), or
    //  - the 1-min loadavg at EVERY run start exceeded cpus + 4: the bench's
    //    own load never reaches the core count at a run start (clean r17
    //    8-core record: max per-query min-loadavg 7.37 on 8 cores), so a
    //    floor persistently above it is sustained external load.
    val loadGate = scala.util.Try(cpus.toDouble).getOrElse(1e9) + 4.0
    val suspects = allRuns.keys.toSeq.filterNot(_.endsWith("_ratio")).filter {
      k =>
        val ts = allRuns(k)
        val spread = ts.max / ts.min.max(1e-9)
        val loadFloor = allLoad.get(k).map(_.min).getOrElse(-1.0)
        spread > 3.0 || loadFloor > loadGate
    }.sorted
    try {
      val runsJson = allRuns.map { case (k, ts) =>
        s"\"$k\":[${ts.map(fmt).mkString(",")}]"
      }.mkString("{", ",", "}")
      val gcJson = allGc.map { case (k, ts) =>
        s"\"$k\":[${ts.map(fmt).mkString(",")}]"
      }.mkString("{", ",", "}")
      val loadJson = allLoad.map { case (k, ts) =>
        s"\"$k\":[${ts.map(fmt).mkString(",")}]"
      }.mkString("{", ",", "}")
      // the `<name>_ratio` series are dimensionless pairing ratios, not
      // per-run seconds — keep them in `runs` (their home) but out of the
      // seconds-denominated `mins` map
      val minsJson = allRuns.collect { case (k, ts) if !k.endsWith("_ratio") =>
        s"\"$k\":${fmt(ts.min)}"
      }.mkString("{", ",", "}")
      // the complete median map, machine-parseable (the stdout summary line
      // is byte-bounded by the driver's 2000-char tail capture and can only
      // carry the costliest entries; THIS is the full record)
      val mediansJson = (ordered.map { case (k, v) => s"\"$k\":${fmt(v)}" })
        .mkString("{", ",", "}")
      val suspectJson = suspects.map(jstr).mkString("[", ",", "]")
      val fullLine = s"""{"sf":"$sfDir","cpus":${jstr(cpus)},"runs_per_query":$runsPerQuery,"value_stat":"trimmed_median","total_entry_queries":${fmt(total)},"total_entry_min":${fmt(totalMin)},"suspect":$suspectJson,"medians":$mediansJson,"runs":$runsJson,"gc_sec":$gcJson,"loadavg_1m":$loadJson,"mins":$minsJson}""" + "\n"
      val fw = new java.io.FileWriter(fullPath)
      fw.write(fullLine)
      fw.close()
      // mirror to the legacy fixed path so pre-r18 tooling keeps working
      // (the unique path above is the one the summary line references)
      if (fullPathEnv.isEmpty) {
        val lw = new java.io.FileWriter(s"$cwd/bench_full.json")
        lw.write(fullLine)
        lw.close()
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench_full write failed ($fullPath): $e")
    }
    // complete per-query line first (archival; also mirrored on disk in
    // bench_full.json with per-run samples and GC seconds)
    println(s"""BENCH_FULL_JSON {"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // the LAST stdout line is a complete, COMPACT JSON object — the
    // driver's capture keeps only a bounded tail of stdout, and the full
    // ~260-entry map overflows it (BENCH_r07 "parsed": null). Keep the
    // costliest entries plus every skew/ratio statistic so the headline
    // numbers always arrive machine-parseable; the full map is one line
    // up and in bench_full.json.
    val ratioEntries = ordered.filter(_._1.contains("ratio"))
    // ADAPTIVE top-N (round-17 verdict: fixed top-40 churns entries in and
    // out of the line each round, which PERF misreads as dropped queries).
    // Entries are admitted in descending cost until the whole summary line
    // would exceed the byte budget — the driver's tail capture is 2000
    // chars (measured from BENCH_r17.json) and the line must survive it
    // whole, so the budget leaves ~10% slack. This is a strict superset of
    // the old top-40 (which measured ~1385 bytes); typical capacity is
    // ~60 entries, covering everything >= ~1.1 s at sf0.1.
    val lineBudget = 1800
    val byCost = ordered.filterNot(_._1.contains("ratio")).sortBy(-_._2)
    val fixedTail = (ratioEntries.map { case (k, v) => s"\"$k\":${fmt(v)}" } :+
      s"\"total_entry_queries\":${fmt(total)}").mkString(",")
    val suspectField =
      s""","n_suspect":${suspects.size},"suspect":${
        suspects.take(12).map(jstr).mkString("[", ",", "]")}"""
    def lineFor(entries: Seq[(String, Double)]): String = {
      val compact = (entries.sortBy(_._1).map { case (k, v) =>
        s"\"$k\":${fmt(v)}"
      } :+ fixedTail).mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","value_stat":"trimmed_median","total_entry_min":${fmt(totalMin)},"queries":$compact,"sf":"$sfDir","n_queries":${ordered.size}$suspectField,"full":${jstr(fullPath)}}"""
    }
    var nTop = 40.min(byCost.size) // never below the historical floor
    while (nTop < byCost.size &&
      lineFor(byCost.take(nTop + 1)).length <= lineBudget) nTop += 1
    val summaryLine = lineFor(byCost.take(nTop))
    // The driver's parser has missed the bare tail line two rounds in a
    // row (BENCH_r07/r08 "parsed": null) — emit the compact summary with
    // the same marker discipline as BENCH_FULL_JSON, mirror it to a file,
    // and STILL finish with the bare JSON as the very last stdout line so
    // a tail-line parser also succeeds.
    val summaryPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY",
      s"$cwd/bench_summary.json")
    try {
      val sw = new java.io.FileWriter(summaryPath)
      sw.write(summaryLine + "\n")
      sw.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench_summary write failed ($summaryPath): $e")
    }
    println(s"BENCH_JSON $summaryLine")
    spark.stop()
    // the bare compact JSON is the FINAL stdout line: spark.stop() above
    // (its shutdown logging goes to stderr), and build.sbt suppresses
    // sbt's own framing (showSuccess := false, StdoutOutput strategy)
    println(summaryLine)
    Console.out.flush()
  }
}
