package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof bench: measures the most expensive entries at the bench SF
  * AND at a 10× fixture, and reports per-query scaling factors — the
  * direct evidence for "this plan survives a scale-up" (a near-linear
  * factor means the work grows with the data; a super-linear one names a
  * plan that would melt first on a real cluster).
  *
  * The 10× fixture is DERIVED deterministically from the bench fixture
  * (seeded column hashes, no RNG) into SPARK_GRAFT_SCALE_DIR, once:
  *  - documents ×10: copies with shifted doc_id; every copy > 0 has ~20%
  *    of tokens rewritten by a hash draw from the SAME 31-word vocabulary,
  *    so copies are NOT near-duplicates (3-shingle survival 0.8³ ≈ 0.5 ⇒
  *    Jaccard ≈ 0.34, far under the 0.8 dedup threshold) and the
  *    duplicate RATE stays at the base fixture's, while the vocabulary —
  *    which drives the tfidf/cosine candidate structure — is unchanged.
  *  - embeddings ×10: shifted vec_id, each component perturbed ±0.025 by
  *    a hash draw — cluster geometry (label centers) is preserved.
  *  - orders/lineitem ×10: shifted order/customer/supplier keys — ten
  *    disjoint copies of the interaction graph, the same node/edge growth
  *    a larger TPC-H SF produces.
  * The three synthetic sweep shapes (countsum 640k groups, private-join
  * skew, limit-keys skew) scale by parameter: ×10 rows and groups.
  *
  * Output: a markdown table on stdout plus one `SCALE_JSON {...}` line
  * (base/big seconds = min of SPARK_GRAFT_SCALE_RUNS runs — min, not
  * median, because the question here is intrinsic plan cost, not
  * machine-load variance). Results are committed to SCALING.md.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // prefer a driver-provided sf1 fixture when one exists; else derive one
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      if (new java.io.File("/root/testdata/sf1/lineitem.parquet").exists())
        "/root/testdata/sf1"
      else "/root/repo/testdata_sf1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    // second-decade support: when base is itself a scaled fixture (sf1 ->
    // sf10), the synthetic sweep shapes must start from the matching
    // larger base count (e.g. 6.4M groups, not 640k)
    val baseMult = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE_MULT", "1").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // On a cluster, shuffle partitions scale with the data (AQE
      // right-sizes from a high initialPartitionNum); local[n] pins them
      // to the slot count by default, which at the 256M-row second-decade
      // point concentrates whole-shuffle sorts into 32 heap-sharing tasks
      // — override to model the cluster's partitioning (SCALING.md r13).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Shuffle files of a finished run are cleaned ASYNCHRONOUSLY by the
      // ContextCleaner; at the sf100 point a single q_semdedup run leaves
      // ~20 GB of shuffle spill, and three back-to-back timed runs
      // out-raced the async cleaner into ENOSPC (measured round 14, 68 GB
      // free). Blocking mode makes the per-run System.gc() in timeOnce
      // reclaim shuffle files synchronously — outside the timed window,
      // so the measurement is unchanged; only the accumulation is gone.
      .config("spark.cleaner.referenceTracking.blocking", "true")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ensureFixture(spark, base, big, scale)

    def consume(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }
    def timeOnce(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }
    def samples(body: => Unit): Seq[Double] = (1 to runs).map(_ => timeOnce(body))
    // trimmed median: drop the single worst run (machine debris), take the
    // median of the rest — reported NEXT TO min, never instead of it
    def trimmedMedian(ts: Seq[Double]): Double = {
      val t = ts.sorted.dropRight(if (ts.size >= 3) 1 else 0)
      if (t.size % 2 == 1) t(t.size / 2)
      else (t(t.size / 2 - 1) + t(t.size / 2)) / 2
    }
    def best(body: => Unit): Double = samples(body).min

    // dev convenience: SPARK_GRAFT_SCALE_ONLY=q_a,q_b restricts the set
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def enabled(name: String): Boolean = only.forall(_.contains(name))

    if (enabled("recall")) recallReport(spark, big)

    // cheap-to-heavy order: the 10x runs of the memory-heavy queries
    // (semdedup's verify join, cosine's pair explosion) leave enough JVM
    // debris to inflate whatever runs after them by 3-4x (measured on
    // q_minhash_states: 2.4s clean vs 10.6s after a 50s semdedup run), so
    // they go LAST
    val entryQueries = Seq("q_tfidf", "q_minhash_states", "q_source_sim",
      "q_repetition", "q_ngram_jaccard", "q_keep_best", "q_minhash_dedup",
      "q_assoc_rules", "q_dedup_cluster", "q_join_nullsafe", "q_triangles",
      "q_pagerank", "q_containment", "q_cosine_text", "q_lsh_topk",
      "q_semdedup")
      .filter(enabled)

    // codegen warmup at the smallest SF so neither side absorbs JIT cost
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    entryQueries.foreach { q =>
      try consume(SparkEntry.queries(q)(spark, warmDir))
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // page-cache warm of both fixtures
    Seq(base, big).foreach { dir =>
      Seq("orders", "lineitem", "documents", "embeddings", "customer",
        "events").foreach { t =>
        try spark.read.parquet(s"$dir/$t.parquet")
          .select(expr("bit_xor(xxhash64(struct(*)))")).collect()
        catch { case _: Throwable => () }
      }
    }
    System.gc()

    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double, Double, Double)]
    entryQueries.foreach { q =>
      val fn = SparkEntry.queries(q)
      val sBase = samples(consume(fn(spark, base)))
      val sBig = samples(consume(fn(spark, big)))
      val (tBase, tBig) = (sBase.min, sBig.min)
      rows += ((q, tBase, tBig, trimmedMedian(sBase), trimmedMedian(sBig)))
      System.err.println(f"done $q%-18s base=$tBase%7.2fs big=$tBig%7.2fs x${tBig / tBase}%5.2f")
    }

    // synthetic sweep shapes ×1 and ×scale (bodies mirror Bench.scala)
    syntheticShapes(spark, scale, baseMult).filter(s => enabled(s._1)).foreach {
      case (name, bodyBase, bodyBig) =>
      // fresh plans: one untimed warmup each so codegen compile lands
      // outside the timed runs (same discipline as Bench.timeMedianPair)
      timeOnce(bodyBase()); timeOnce(bodyBig())
      val sBase = samples(bodyBase())
      val sBig = samples(bodyBig())
      val (tBase, tBig) = (sBase.min, sBig.min)
      rows += ((name, tBase, tBig, trimmedMedian(sBase), trimmedMedian(sBig)))
      System.err.println(f"done $name%-18s base=$tBase%7.2fs big=$tBig%7.2fs x${tBig / tBase}%5.2f")
    }

    println(s"| query | min base (s) | min ${scale}x (s) | factor | tmed base | tmed ${scale}x | tmed factor |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (q, a, b, ta, tb) =>
      println(f"| $q | $a%.2f | $b%.2f | ${b / a}%.2f | $ta%.2f | $tb%.2f | ${tb / ta}%.2f |")
    }
    val qs = rows.map { case (q, a, b, ta, tb) =>
      f""""$q":{"base":$a%.3f,"big":$b%.3f,"factor":${b / a}%.2f,"tmed_base":$ta%.3f,"tmed_big":$tb%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""SCALE_JSON {"scale":$scale,"runs":$runs,"queries":$qs}""")
    spark.stop()
  }

  /** Retrieval quality at the 10× fixture — the regime the base-fixture
    * recall pins (OpsSpec) cannot see: the embeddings scan is MULTI-FILE,
    * so the plan-statistics auto-sizing (lshTopK's plane count) runs on
    * real Catalyst stats, and the perturbed copies create genuinely hard
    * near-neighbors instead of planted collinear ones. This is the exact
    * blind spot that hid lshTopK's 0.105 recall for several rounds.
    *
    * Reports recall@10 vs bruteForceTopK for each approximate path at its
    * entry parameters, and cosineDupPairs pair-recall vs the exact
    * all-pairs truth at threshold 0.95. Prints one `RECALL_JSON {...}`
    * line; floors are PINNED in Sf1RecallSpec and recorded in SCALING.md —
    * this stage is the measurement, the spec is the gate.
    */
  private def recallReport(spark: SparkSession, big: String): Unit = {
    import graft.ops.Similarity
    val t0 = System.nanoTime()
    val e = spark.read.parquet(s"$big/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // ~1/10 of the corpus as queries, hash-chosen so the sample is
    // deterministic and uncorrelated with the copy structure
    val q = e.filter(pmod(xxhash64(col("vec_id")), lit(10)) === 0)
    val k = 10
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k))
    def recall(approx: Set[(Long, Long)]): Double =
      (approx & exact).size.toDouble / exact.size
    // entry parameters: lsh auto planes, ivf nlist=16 nprobe=4/8 refine=2,
    // int8 quantized rerank
    val rLsh = recall(pairSet(Similarity.lshTopK(
      q, e, "vec_id", "embedding", k)))
    val rIvf4 = recall(pairSet(Similarity.ivfTopK(
      q, e, "vec_id", "embedding", k, nlist = 16, nprobe = 4,
      refineIterations = 2)))
    val rIvf8 = recall(pairSet(Similarity.ivfTopK(
      q, e, "vec_id", "embedding", k, nlist = 16, nprobe = 8,
      refineIterations = 2)))
    val rQuant = recall(pairSet(Similarity.quantizedTopK(
      q, e, "vec_id", "embedding", k)))

    // cosineDupPairs vs the exact all-pairs truth (broadcast cross join:
    // the corpus side is ~5 MB; 2·10⁸ codegen'd cosines, one pass)
    val l = e.select(col("vec_id").as("left_id"), col("embedding").as("__vl"))
    val r = e.select(col("vec_id").as("right_id"), col("embedding").as("__vr"))
    val truth = l.crossJoin(broadcast(r))
      .filter(col("left_id") < col("right_id"))
      .withColumn("cosine", Similarity.cosine(
        col("__vl").cast("array<double>"), col("__vr").cast("array<double>")))
      .filter(col("cosine") >= 0.95)
      .select("left_id", "right_id")
      .persist()
    val truthN = truth.count()
    val found = Similarity.cosineDupPairs(e, "vec_id", "embedding",
      threshold = 0.95)
      .select(least(col("left_id"), col("right_id")).as("left_id"),
        greatest(col("left_id"), col("right_id")).as("right_id"))
      .distinct()
    val hitN = found.join(truth, Seq("left_id", "right_id"), "inner").count()
    truth.unpersist()
    val rDup = hitN.toDouble / math.max(truthN, 1L)
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(f"recall stage done in $dt%.1fs")
    println(f"| recall@10 sf1 | lsh ${rLsh}%.3f | ivf4 ${rIvf4}%.3f | " +
      f"ivf8 ${rIvf8}%.3f | quant ${rQuant}%.3f | dup_pairs ${rDup}%.4f " +
      f"(${hitN}/${truthN}) |")
    println(f"""RECALL_JSON {"queries":${exact.size / k},"lsh":$rLsh%.4f,""" +
      f""""ivf_nprobe4":$rIvf4%.4f,"ivf_nprobe8":$rIvf8%.4f,""" +
      f""""quant":$rQuant%.4f,"dup_pairs":$rDup%.4f,""" +
      f""""dup_truth":$truthN,"dup_found":$hitN}""")
    spark.catalog.clearCache()
    System.gc()
  }

  /** The three synthetic reference-envelope shapes, parameterized by scale:
    * (name, base body, scaled body). Bodies rebuild their plans per run
    * exactly like Bench.scala's sweeps.
    */
  private def syntheticShapes(
      spark: SparkSession, scale: Int, baseMult: Int = 1)
      : Seq[(String, () => Unit, () => Unit)] = {
    import graft.domains.{ColumnDescriptor, DataFrameDomain}
    import graft.exact.{ExactNum, Rational}
    import graft.measures.PureDPBudget
    import graft.measurements.{Aggregations, NoiseKind}
    import graft.metrics.SymmetricDifference
    import graft.transformations.{PrivateJoin, TruncationStrategy, Truncation}

    def countsum(n: Long): Unit = {
      val keys = spark.range(n).select(col("id").as("A"))
      val data = spark.range(n)
        .select(col("id").as("A"), (col("id") % 97).as("X"))
      val dom = DataFrameDomain(
        Seq("A" -> ColumnDescriptor.long, "X" -> ColumnDescriptor.long))
      val mCount = Aggregations.createCountMeasurement(
        dom, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
        PureDPBudget(ExactNum(1)), Some(keys))
      mCount(data).asInstanceOf[DataFrame].count()
      val mSum = Aggregations.createSumMeasurement(
        dom, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
        PureDPBudget(ExactNum(1)), "X", Rational(0), Rational(97),
        Some(keys))
      mSum(data).asInstanceOf[DataFrame].count(): Unit
    }
    // hotMod picks the hot-key fraction: every id divisible by hotMod lands
    // on key 0 (hotMod=10 → 10% hot, the r8 shape; hotMod=2 → 50% hot, the
    // adversarial half-the-table-is-one-key regime)
    def pjoinSkew(groups: Long, hotMod: Long = 10L): Unit = {
      val key = when(col("id") % hotMod === 0, 0L).otherwise(col("id") % groups)
      val left = spark.range(groups * 10)
        .select(key.as("K"), (col("id") % 97).as("V"))
      val right = spark.range(groups)
        .select(col("id").as("K"), (col("id") % 7).as("W"))
      val domL = DataFrameDomain(
        Seq("K" -> ColumnDescriptor.long, "V" -> ColumnDescriptor.long))
      val domR = DataFrameDomain(
        Seq("K" -> ColumnDescriptor.long, "W" -> ColumnDescriptor.long))
      PrivateJoin(domL, domR, on = Seq("K"),
        leftStrategy = TruncationStrategy.Truncate, leftThreshold = 5,
        rightStrategy = TruncationStrategy.Truncate, rightThreshold = 5)(
        Map("left" -> left, "right" -> right))
        .asInstanceOf[DataFrame].count(): Unit
    }
    def limitKeysSkew(groups: Long, hotMod: Long = 10L): Unit = {
      val g = when(col("id") % hotMod === 0, 0L).otherwise(col("id") % groups)
      val data = spark.range(groups * 100)
        .select(g.as("G"), (col("id") % 997).as("K"))
      Truncation.limitKeysPerGroup(data, Seq("G"), Seq("K"), 5).count(): Unit
    }
    // hotMod > 10·groups means the only "hot" id is 0: a uniform key
    // distribution through the same PrivateJoin body as the skew shapes
    def pjoinUniform(groups: Long): Unit = pjoinSkew(groups, groups * 100L)
    val b = baseMult.toLong
    Seq(
      ("q_countsum_640000g",
        () => countsum(640000L * b), () => countsum(640000L * b * scale)),
      ("q_pjoin_uniform",
        () => pjoinUniform(640000L * b),
        () => pjoinUniform(640000L * b * scale)),
      ("q_pjoin_skew",
        () => pjoinSkew(640000L * b), () => pjoinSkew(640000L * b * scale)),
      ("q_pjoin_skew50",
        () => pjoinSkew(640000L * b, 2L),
        () => pjoinSkew(640000L * b * scale, 2L)),
      ("q_limitkeys_skew",
        () => limitKeysSkew(64000L * b), () => limitKeysSkew(64000L * b * scale)),
      ("q_limitkeys_skew50",
        () => limitKeysSkew(64000L * b, 2L),
        () => limitKeysSkew(64000L * b * scale, 2L)))
  }

  /** Derive the scaled fixture once (skipped when the last-written
    * table's `_SUCCESS` marker exists).
    */
  /** Dimension tables for the derived fixture — needed by the full-suite
    * sf1 correctness gate (every oracle view must resolve). region/nation/
    * part are SF-invariant here (lineitem copies do NOT shift l_partkey),
    * so they copy verbatim; supplier scales with the SAME i·maxSupp shift
    * the lineitem copies use, keeping the FK consistent. Runs even when
    * the fact tables already exist, so older fixtures get backfilled.
    */
  private def ensureDims(
      spark: SparkSession, base: String, big: String, scale: Int): Unit = {
    if (new java.io.File(s"$big/supplier.parquet/_SUCCESS").isFile) return
    System.err.println(s"backfilling dimension tables at $big ...")
    Seq("region", "nation", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$big/$t.parquet")
    }
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val supp = spark.read.parquet(s"$base/supplier.parquet")
    val baseMaxL = li.agg(max(col("l_suppkey"))).head().getLong(0)
    // shift spans BOTH key ranges: suppliers with no lineitems sit above
    // the lineitem max, and an l_suppkey-only shift would overlap copies
    val combinedStride = math.max(
      baseMaxL, supp.agg(max(col("s_suppkey"))).head().getLong(0)) + 1L
    // When BACKFILLING into a fixture whose lineitem copies already exist,
    // the supplier shift must match whatever stride those copies were
    // actually written with (an older fixture may predate the combined-
    // range rule) — derive it from the big fixture's own key spread
    // instead of recomputing from base, so FK consistency can't drift.
    val maxSupp =
      if (scale > 1 &&
        new java.io.File(s"$big/lineitem.parquet/_SUCCESS").isFile) {
        val bigMaxL = spark.read.parquet(s"$big/lineitem.parquet")
          .agg(max(col("l_suppkey"))).head().getLong(0)
        val span = bigMaxL - baseMaxL
        if (span > 0 && span % (scale - 1) == 0) span / (scale - 1)
        else combinedStride
      } else combinedStride
    (0 until scale).map { i =>
      supp.withColumn("s_suppkey", col("s_suppkey") + lit(i.toLong * maxSupp))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/supplier.parquet")
  }

  private def ensureFixture(
      spark: SparkSession, base: String, big: String, scale: Int): Unit = {
    // SPARK_GRAFT_SCALE_TABLES=documents,embeddings derives a PARTIAL
    // fixture — only the tables a targeted run reads. The third-decade
    // sf100 spot-check needs just the dedup/ANN inputs (~1 GB) where the
    // full fixture would spend ~17 GB on lineitem/orders/events no query
    // in the run touches. Resume is per-table (_SUCCESS marker), so an
    // interrupted derivation picks up where it stopped.
    val tables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(t: String): Boolean =
      tables.forall(_.contains(t)) &&
        !new java.io.File(s"$big/$t.parquet/_SUCCESS").isFile
    if (tables.isEmpty) {
      ensureDims(spark, base, big, scale)
      if (new java.io.File(s"$big/events.parquet/_SUCCESS").isFile) return
    } else if (!Seq("documents", "embeddings", "orders", "lineitem",
        "customer", "events").exists(want)) return
    System.err.println(s"generating ${scale}x fixture at $big ..." +
      tables.fold("")(t => s" (tables: ${t.toSeq.sorted.mkString(",")})"))

    if (want("documents")) {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0)).sorted
    val vocabArr = array(vocab.toIndexedSeq.map(lit(_)): _*)
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docCopies = (0 until scale).map { i =>
      if (i == 0) docs
      else {
        val shifted = docs
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * maxDoc))
        val mutated = concat_ws(" ",
          transform(split(col("text"), " "), (w, pos) =>
            when(pmod(hash(col("doc_id"), pos, lit(i)), lit(5)) === 0,
              element_at(vocabArr,
                (pmod(hash(col("doc_id"), pos, lit(i + 7919)),
                  lit(vocab.length)) + 1).cast("int")))
              .otherwise(w)))
        shifted
          .withColumn("text", mutated)
          .withColumn("n_chars", length(col("text")))
      }
    }.reduce(_ unionByName _)
    docCopies.repartition(32)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    }

    if (want("embeddings")) {
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val embCopies = (0 until scale).map { i =>
      if (i == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * maxVec))
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x + (pmod(hash(col("vec_id"), j, lit(i)), lit(1000))
              .cast("double") / 1000.0 - 0.5) * 0.05).cast("float")))
    }.reduce(_ unionByName _)
    embCopies.repartition(32)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }

    if (want("orders") || want("lineitem") || want("customer")) {
    val orders = spark.read.parquet(s"$base/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val maxOrder = orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    // the CUSTOMER dimension defines the custkey shift so the orders FK
    // stays consistent across copies (c_custkey range ⊇ o_custkey range)
    val maxCust = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1L
    // same combined-range shift as ensureDims, so supplier copies and
    // lineitem copies stay FK-consistent
    val maxSupp = math.max(
      li.agg(max(col("l_suppkey"))).head().getLong(0),
      spark.read.parquet(s"$base/supplier.parquet")
        .agg(max(col("s_suppkey"))).head().getLong(0)) + 1L
    if (want("orders")) {
      val orderCopies = (0 until scale).map { i =>
        orders
          .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * maxOrder))
          .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * maxCust))
      }.reduce(_ unionByName _)
      orderCopies.repartition(32)
        .write.mode("overwrite").parquet(s"$big/orders.parquet")
    }
    if (want("lineitem")) {
      val liCopies = (0 until scale).map { i =>
        li
          .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * maxOrder))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * maxSupp))
      }.reduce(_ unionByName _)
      liCopies.repartition(32)
        .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    }
    if (want("customer")) {
      val custCopies = (0 until scale).map { i =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(i.toLong * maxCust))
      }.reduce(_ unionByName _)
      custCopies.repartition(32)
        .write.mode("overwrite").parquet(s"$big/customer.parquet")
    }
    }

    if (want("events")) {
    val ev = spark.read.parquet(s"$base/events.parquet")
    val maxEvent = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
    val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
    val evCopies = (0 until scale).map { i =>
      ev
        .withColumn("event_id", col("event_id") + lit(i.toLong * maxEvent))
        .withColumn("user_id", col("user_id") + lit(i.toLong * maxUser))
    }.reduce(_ unionByName _)
    evCopies.repartition(32)
      .write.mode("overwrite").parquet(s"$big/events.parquet")
    }
    System.err.println("fixture ready")
  }
}
