package graft

import graft.ops._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class OpsSpec extends SharedSpark {

  private def docs = df(
    "doc_id BIGINT, text STRING",
    Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      Row(2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      Row(3L, "completely different content about spark query engines and distributed joins"),
      Row(4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      Row(5L, "unrelated short text")
    )
  )

  test("exact dedup keeps one representative per text") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() == 4) // docs 1 and 4 merge
    assert(out.filter(col("doc_id") === 4L).count() == 0)
  }

  test("fingerprint dedup is whitespace/case-insensitive") {
    val d = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, "Hello  World"), Row(2L, "hello world"), Row(3L, "bye")))
    val out = Dedup.exactByFingerprint(d, "text", "doc_id")
    assert(out.count() == 2)
  }

  test("minhash LSH finds planted near-duplicates and skips distinct docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5)
    val found = pairs.select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 4L))) // identical
    assert(found.contains((1L, 2L)) || found.contains((2L, 4L))) // near-dup
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L)) // distinct doc
    // jaccard of identical docs is 1
    val j14 = pairs.filter(col("left_id") === 1L && col("right_id") === 4L)
      .select("jaccard").head().getDouble(0)
    assert(j14 == 1.0)
  }

  test("duplicateClusters propagates the min id through chains") {
    val ids = df("doc_id BIGINT", (1L to 6L).map(Row(_)))
    // chain 1-2-3, pair 4-5, singleton 6
    val pairs = df("left_id BIGINT, right_id BIGINT",
      Seq(Row(1L, 2L), Row(2L, 3L), Row(4L, 5L)))
    val out = Dedup.duplicateClusters(ids, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // distributed label-propagation path (forced by a zero fast-path budget)
    // must agree with the driver union-find fast path
    val dist = Dedup.duplicateClusters(ids, pairs, "doc_id",
        smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == out)
  }

  test("duplicateClusters: driver union-find == distributed propagation at scale shape") {
    // the sf1 gate's partition-dependent hazard: the two component paths
    // must agree on a graph with long chains (stresses O(diameter)
    // convergence), many components, and multi-partition edges
    import org.apache.spark.sql.functions.{col => c}
    val n = 20000L
    val ids = spark.range(0L, n).select(c("id").as("doc_id"))
    // 100 chains of length 150 (nodes i*150..i*150+149), plus hash-derived
    // cross edges that merge some chains deterministically
    val chains = spark.range(0L, 15000L)
      .filter(c("id") % 150 =!= 149)
      .select(c("id").as("left_id"), (c("id") + 1L).as("right_id"))
    val cross = spark.range(0L, 200L)
      .select((pmod(xxhash64(c("id")), lit(15000L))).as("left_id"),
        (pmod(xxhash64(c("id") + 7919L), lit(15000L))).as("right_id"))
      .filter(c("left_id") =!= c("right_id"))
    val pairs = chains.unionByName(cross).repartition(16)
    val local = Dedup.duplicateClusters(ids, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val dist = Dedup.duplicateClusters(ids, pairs, "doc_id",
        smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(local.length == n)
    assert(local.sameElements(dist))
  }

  test("dropNearDuplicates keeps one representative per cluster") {
    val out = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // 1,2,4 cluster together → keep 1; 3 and 5 survive alone
    assert(kept == Set(1L, 3L, 5L))
  }

  test("per-record DP mechanisms: sigma=0 is identity, noisy stays unbiased-ish") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val zero = df.select(
      col("x"),
      graft.ops.PerRecordDp.logTransformationMechanism(col("x"), 1.0, 0.0).as("lg"),
      graft.ops.PerRecordDp.squareRootTransformationMechanism(col("x"), 1.0, 0.0).as("sq"),
      graft.ops.PerRecordDp.fourthRootTransformationMechanism(col("x"), 1.0, 0.0).as("fr"),
      graft.ops.PerRecordDp.squareRootGaussianMechanism(col("x"), 0.0).as("sg"),
      graft.ops.PerRecordDp.exponentialPolylogarithmicMechanism(col("x"), 1.0, 4.0, 0.0).as("ep")
    ).collect()
    zero.foreach { r =>
      val x = r.getDouble(0)
      Seq(1, 2, 3, 4, 5).foreach(i =>
        assert(math.abs(r.getDouble(i) - x) < 1e-6, s"col $i of x=$x: ${r.getDouble(i)}"))
    }
    // noisy sqrt-transform: mean of (y − σ²) ≈ x over many draws (σ=1, x=50)
    val many = Seq.fill(20000)(50.0).toDF("x")
    val noisy = many.select(
      graft.ops.PerRecordDp.squareRootTransformationMechanism(col("x"), 1.0, 1.0).as("y"))
    val m = noisy.agg(avg(col("y") - lit(1.0))).head().getDouble(0)
    assert(math.abs(m - 50.0) < 1.0, s"mean=$m")
  }

  test("simhash of identical docs is equal; near-dups within distance") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDistance = 8)
    val found = pairs.select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 4L)))
    val h14 = pairs.filter(col("left_id") === 1L && col("right_id") === 4L)
      .select("hamming").head().getAs[Number](0).longValue()
    assert(h14 == 0L)
  }

  test("ngram jaccard pairs verify exactly") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, jaccardThreshold = 0.9)
    val found = pairs.select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 4L)))
    assert(!found.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngram containment finds an embedded doc that jaccard misses") {
    // doc 20 is a strict prefix of doc 21: every shingle of 20 is in 21,
    // so containment(20→21) = 1.0 while jaccard = n20/n21 is small
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val planted = df("doc_id BIGINT, text STRING",
      Seq(Row(20L, short), Row(21L, long)))
    val pairs = Dedup.ngramContainmentPairs(planted, "doc_id", "text",
      shingleSize = 3, threshold = 0.9)
    val rows = pairs.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("left_id") == 20L && r.getAs[Long]("right_id") == 21L)
    assert(r.getAs[Double]("contain_left") == 1.0)
    assert(r.getAs[Double]("contain_right") < 0.11)
    val jac = Dedup.ngramJaccardPairs(planted, "doc_id", "text",
      shingleSize = 3, jaccardThreshold = 0.9)
    assert(jac.count() == 0L)
  }

  test("brute-force ANN returns self first, in cosine order") {
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      Seq(
        Row(0L, Seq(1.0f, 0.0f, 0.0f)),
        Row(1L, Seq(0.9f, 0.1f, 0.0f)),
        Row(2L, Seq(0.0f, 1.0f, 0.0f)),
        Row(3L, Seq(0.0f, 0.0f, 1.0f))
      ))
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0L), vecs, "vec_id", "embedding", k = 2)
    val neighbors = out.orderBy(desc("cosine")).collect()
      .map(r => r.getAs[Long]("neighbor_id")).toSeq
    assert(neighbors == Seq(0L, 1L))
  }

  test("LSH ANN agrees with brute force on easy neighbors") {
    val base = (0 until 50).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)
      Row(i.toLong, v.toSeq)
    }
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", base)
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 1,
      numPlanes = 8, numProbes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // self is always its own nearest neighbor and shares its own bucket
    assert(brute == Set((0L, 0L), (1L, 1L), (2L, 2L)))
    assert(lsh == brute)
  }

  test("IVF ANN finds self and close neighbors") {
    val base = (0 until 60).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)
      Row(i.toLong, v.toSeq)
    }
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", base)
    val queries = vecs.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 1,
      nlist = 8, nprobe = 8) // probe all cells → exact for top-1
    val top1 = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 == Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("k-means refinement improves the spherical objective and keeps IVF exact") {
    // 4 tight clusters around orthogonal axes + noise
    val rnd = new scala.util.Random(3)
    val base = (0 until 200).map { i =>
      val axis = i % 4
      val v = Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else 0.0) + 0.05 * rnd.nextGaussian()).map(_.toFloat)
      Row(i.toLong, v.toSeq)
    }
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", base)
    val sample = vecs.limit(4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def objective(cs: Array[Array[Double]]): Double = {
      // mean max-dot over normalized vectors — higher is tighter
      val all = vecs.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
      all.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        val u = v.map(_ / n)
        cs.map(c => c.zip(u).map { case (a, b) => a * b }.sum).max
      }.sum / all.length
    }
    val refined = Similarity.kMeansCentroids(vecs, "embedding", sample, 3)
    assert(refined.length == 4)
    // initial sample is 4 near-collinear-with-axis vectors but noisy; Lloyd
    // rounds must not make the objective worse and should tighten it
    val before = objective(sample.map(v => {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }))
    val after = objective(refined)
    assert(after >= before - 1e-9, s"objective worsened: $before -> $after")
    assert(after > 0.95, s"refined objective too low: $after")
    // refined IVF with full probing stays exact on top-1
    val queries = vecs.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 1,
      nlist = 4, nprobe = 4, refineIterations = 2)
    val top1 = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 == Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("cosineDupPairs finds duplicate embeddings") {
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      Seq(
        Row(0L, Seq(1.0f, 0.0f)),
        Row(1L, Seq(2.0f, 0.0f)), // same direction
        Row(2L, Seq(0.0f, 1.0f))
      ))
    val out = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.99,
      numPlanes = 4)
    val found = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L)))
  }

  test("cosineDupPairs splits oversize buckets instead of dropping them") {
    // 120 random-ish 4-d vectors + 10 planted collinear dups; numPlanes = 1
    // forces at most two primary buckets per band, far over the cap of 12,
    // so every pair found proves the split path (a dropping implementation
    // would return nothing from the over-cap buckets)
    val rnd = new scala.util.Random(7)
    val naturals = (0 until 120).map { i =>
      Row(i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat))
    }
    val planted = (0 until 10).map { i =>
      val base = naturals(i * 7).getSeq[Float](1)
      Row(1000L + i * 7, base.map(x => x * 2.0f))
    }
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", naturals ++ planted)
    val out = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.999,
      numPlanes = 1, bands = 2, splitPlanes = 10, maxBucketSize = 12)
    val found = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(found.contains((i * 7L, 1000L + i * 7)), s"missing planted pair $i")
    }
  }

  test("cosineDupPairs drops only irreducible near-identical sets, observably") {
    // 60 copies of one direction: splitting cannot separate them (collinear
    // vectors share every signature), so the bucket is dropped and reported
    val copies = (0 until 60).map(i => Row(i.toLong, Seq(1.0f, 1.0f, (i % 3).toFloat * 1e-7f)))
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>", copies)
    val out = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.99,
      numPlanes = 4, maxBucketSize = 10)
    assert(out.count() == 0)
    val dropped = Similarity.cosineDupDroppedBuckets(vecs, "vec_id", "embedding",
      numPlanes = 4, maxBucketSize = 10)
    assert(dropped.count() > 0)
  }

  test("semDeDup keeps the smallest-id vector of each semantic-dup set") {
    // ids 0/1/5 collinear (cos 1); 2/3 near-identical; 4 orthogonal
    val vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      Seq(
        Row(0L, Seq(1.0f, 0.0f, 0.0f)),
        Row(1L, Seq(2.0f, 0.0f, 0.0f)),
        Row(2L, Seq(0.0f, 1.0f, 0.02f)),
        Row(3L, Seq(0.0f, 1.0f, 0.0f)),
        Row(4L, Seq(0.0f, 0.0f, 1.0f)),
        Row(5L, Seq(0.5f, 0.0f, 0.0f))
      ))
    val out = Similarity.semDeDup(vecs, "vec_id", "embedding",
        threshold = 0.99, nlist = 3, refineIterations = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 2L, 4L))
  }

  test("semDeDup and ivfTopK accept ARRAY<DOUBLE> embeddings") {
    // the cell-assignment row read must not assume float elements
    val vecs = df("vec_id BIGINT, embedding ARRAY<DOUBLE>",
      Seq(
        Row(0L, Seq(1.0, 0.0, 0.0)),
        Row(1L, Seq(2.0, 0.0, 0.0)),
        Row(2L, Seq(0.0, 1.0, 0.0)),
        Row(3L, Seq(0.0, 0.0, 1.0))
      ))
    val kept = Similarity.semDeDup(vecs, "vec_id", "embedding",
        threshold = 0.99, nlist = 2, refineIterations = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L))
    val queries = vecs.filter(col("vec_id") < 2)
    val top1 = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 1,
        nlist = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0 and 1 are collinear: top-1 by (cosine desc, id) is id 0 for both
    assert(top1 == Set((0L, 0L), (1L, 0L)))
  }

  test("ANN recall@10 vs brute force stays pinned on the embeddings fixture") {
    // retrieval-quality floor: a parameter or bucketing change that stays
    // hash-green on its own oracle can still silently degrade recall —
    // pin recall@10 against the exact answer for all three approximate
    // paths at their entry parameters
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 20)
    val k = 10
    def pairs(out: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      out.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k))
    def recall(approx: Set[(Long, Long)]): Double =
      (approx & exact).size.toDouble / exact.size
    val rLsh = recall(pairs(Similarity.lshTopK(
      q, e, "vec_id", "embedding", k))) // auto planes + margin-ordered probes
    val rIvf4 = recall(pairs(Similarity.ivfTopK(
      q, e, "vec_id", "embedding", k, nlist = 16, nprobe = 4,
      refineIterations = 2)))
    val rIvf8 = recall(pairs(Similarity.ivfTopK(
      q, e, "vec_id", "embedding", k, nlist = 16, nprobe = 8,
      refineIterations = 2)))
    info(s"recall@10: ivf nprobe=4 $rIvf4, nprobe=8 $rIvf8")
    val rQuant = recall(pairs(Similarity.quantizedTopK(
      q, e, "vec_id", "embedding", k)))
    info(s"recall@10: lsh $rLsh, quant $rQuant")
    assert(rLsh >= 0.9, s"lshTopK recall@10 = $rLsh")
    assert(rIvf4 >= 0.75, s"ivfTopK nprobe=4 recall@10 = $rIvf4")
    assert(rIvf8 >= 0.9, s"ivfTopK nprobe=8 recall@10 = $rIvf8")
    assert(rQuant >= 0.9, s"quantizedTopK recall@10 = $rQuant")
  }

  test("BM25 entry fixture preserves its ppm hash guard bands") {
    // the q_bm25 driver hash is stable because (a) every per-term
    // 1e6·idf·weight double sits far from a .5 rounding boundary (a 1-ulp
    // ln() difference moves it ~1e-9, measured min distance 4.3e-4 at
    // sf0.01) and (b) adjacent-rank integer scores are well separated
    // (measured min gap 88 ppm). A fixture or tokenizer change that erodes
    // either band should fail HERE, not flakily at the driver gate.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val queries = df("query_id STRING, query_text STRING", Seq(
      Row("q1", "Spark JOIN merge"),
      Row("q2", "customer order value"),
      Row("q3", "vector hash scan zzzabsent")))
    // replicate bm25TopK's per-term score WITHOUT the round(): the same
    // tokenization, idf, and weight association as TextAnalysis.bm25TopK
    val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    val base = docs.select(col("doc_id").as("__id"), tok(col("text")).as("__t"))
    val stats = base.select(size(col("__t")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val postings = base
      .select(col("__id"), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("__term"))
      .groupBy(col("__id"), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val qterms = queries
      .select(explode(tok(col("query_text"))).as("__term")).distinct()
    val relevant = postings.join(broadcast(qterms), Seq("__term"))
    val dfs = relevant.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df") + lit(0.5)) /
        (col("__df") + lit(0.5)))
    val weight = (col("__tf") * lit(1.2 + 1)) /
      (col("__tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("__dl") / avgdl))
    val raw = relevant
      .join(broadcast(dfs), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select((lit(1000000.0) * idf * weight).as("__raw"))
    val minBoundaryDist = raw
      .select(min(abs(col("__raw") - floor(col("__raw")) - lit(0.5))))
      .head().getDouble(0)
    assert(minBoundaryDist >= 1e-4,
      s"per-term ppm score within $minBoundaryDist of a rounding boundary")
    // adjacent-rank separation on the entry's own output
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 5)
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val minGap = out
      .withColumn("__gap", lag(col("score_ppm"), 1).over(w) - col("score_ppm"))
      .filter(col("__gap").isNotNull)
      .agg(min(col("__gap"))).head().getLong(0)
    assert(minGap >= 10L, s"adjacent-rank scores only $minGap ppm apart")
  }

  test("round-7 additions keep their scale-plan contracts") {
    val docs = df("doc_id BIGINT, text STRING",
      (1L to 20L).map(i => Row(i, s"alpha beta w$i gamma")))
    // tfidf top-k and bottom-k states: two-phase WindowGroupLimit, so no
    // task ever sorts a full group
    val tp = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(tp).size >= 2, tp.take(400))
    val sp = Incremental.sampleStates(
      docs.select(col("doc_id"), lit("g").as("g")), Seq("g"), "doc_id", 4)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(sp).size >= 2, sp.take(400))
    // the all-pairs cosine join must never fall back to a cartesian or
    // non-equi broadcast nested loop — candidates come from equi-joins
    val cp = Similarity.tfidfCosinePairs(docs, "doc_id", "text", 0.7)
      .queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct"), "cosine join went cartesian")
    // the shared weight/postings stages MUST be cache-scanned — without
    // the persists every one of q's five consumers re-scans the corpus
    // (the only nested-loop joins are the broadcast 1-row corpus-size
    // aggregate, printed inside the cached subtree descriptions)
    assert(cp.contains("InMemoryTableScan"),
      "cosine shared stages are not cached")
    // sorted-neighborhood pairs join on rank EQUALITY (explode + equi),
    // not a rank range condition
    val np = Dedup.sortedNeighborPairs(docs, "doc_id", "doc_id", 2)
      .queryExecution.executedPlan.toString
    assert(!np.contains("CartesianProduct") &&
      !np.contains("BroadcastNestedLoopJoin"), "neighbor join not equi")
  }

  test("negativeSamples draws deterministically and never its own anchor") {
    val pool = df("id BIGINT", (0L until 50L).map(Row(_)))
    val anchors = pool.filter(col("id") < 5)
    val a = Dedup.negativeSamples(anchors, "id", pool, "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.negativeSamples(anchors, "id", pool, "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)                      // same draw on re-run
    assert(a.forall(t => t._1 != t._3)) // no self-negatives
    assert(a.forall(t => t._3 >= 0L && t._3 < 50L))
    assert(a.size >= 5 * 3 - 5)         // at most one self drop per (a, j)
    // a fresh salt is a different (but still deterministic) draw
    val c = Dedup.negativeSamples(anchors, "id", pool, "id", k = 3, salt = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c != a)
  }

  test("sortedNeighborPairs emits exactly the window-bounded rank pairs") {
    // sort by (k, id): order is 10/a, 20/b, 20/c, 30/d, 40/e
    val d = df("id STRING, k BIGINT", Seq(
      Row("a", 10L), Row("b", 20L), Row("c", 20L),
      Row("d", 30L), Row("e", 40L)))
    val out = Dedup.sortedNeighborPairs(d, "id", "k", window = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("gap"))).toSet
    assert(out == Set(
      ("a", "b", 1L), ("a", "c", 2L),
      ("b", "c", 1L), ("b", "d", 2L),
      ("c", "d", 1L), ("c", "e", 2L),
      ("d", "e", 1L)))
  }

  test("corpusComposition reports exact shares and entropy terms") {
    val d = df("src STRING, sz BIGINT", Seq(
      Row("web", 100L), Row("web", 300L), Row("web", 100L),
      Row("book", 500L)))
    val out = TextAnalysis.corpusComposition(d, "src", "sz")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_size"),
          r.getAs[Long]("doc_share_ppm"), r.getAs[Long]("size_share_ppm"),
          r.getAs[Long]("doc_entropy_term_ppm"))).toMap
    val webEnt = math.round(-1e6 * 0.75 * math.log(0.75))
    val bookEnt = math.round(-1e6 * 0.25 * math.log(0.25))
    assert(out("web") == (3L, 500L, 750000L, 500000L, webEnt))
    assert(out("book") == (1L, 500L, 250000L, 500000L, bookEnt))
  }

  test("tfidfTopTerms ranks by the smoothed formula and keeps top-k") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "apple banana apple"),
      Row(2L, "banana cherry"),
      Row(3L, "cherry dog cherry")))
    val out = TextAnalysis.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"),
          r.getAs[Long]("doc_freq"), r.getAs[Long]("score_ppm")))
      .toMap
    def ppm(tf: Long, docFreq: Long): Long =
      math.round(1e6 * tf * (math.log(4.0 / (docFreq + 1.0)) + 1.0))
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert(out((1L, 1)) == ("apple", 2L, 1L, ppm(2, 1)))
    assert(out((1L, 2)) == ("banana", 1L, 2L, ppm(1, 2)))
    // doc 3: cherry tf=2 df=2 beats dog tf=1 df=1
    assert(out((3L, 1)) == ("cherry", 2L, 2L, ppm(2, 2)))
    assert(out((3L, 2)) == ("dog", 1L, 1L, ppm(1, 1)))
    // doc 2 has only 2 terms, both emitted; nothing beyond k anywhere
    assert(out.size == 6)
  }

  test("TF-IDF entry fixture preserves its ppm hash guard band") {
    // same discipline as the BM25 guard-band test: every distinct raw
    // 1e6·tf·idf value must sit far from a .5 rounding boundary relative
    // to the ~1e-9 absolute drift a 1-ulp ln() difference can cause, so
    // the driver hash of q_tfidf cannot flip on an engine's libm.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    val base = docs.select(col("doc_id").as("__id"), tok(col("text")).as("__t"))
    val n = base.agg(count(lit(1)).as("__n"))
    val tf = base.select(col("__id"), explode(col("__t")).as("term"))
      .groupBy(col("__id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val raw = tf.join(dfs, Seq("term")).crossJoin(broadcast(n))
      .select((lit(1000000.0) * col("tf") *
        (log((col("__n").cast("double") + lit(1.0)) /
          (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0))).as("__raw"))
      .distinct()
    val minBoundaryDist = raw
      .select(min(abs(col("__raw") - floor(col("__raw")) - lit(0.5))))
      .head().getDouble(0)
    assert(minBoundaryDist >= 1e-6,
      s"distinct ppm score within $minBoundaryDist of a rounding boundary")
  }

  test("simHashPairs survives degenerate skew (identical docs) under the cap") {
    // 5000 identical docs: one bucket per block holds the whole corpus; the
    // cap removes them before any aggregation buffer materializes, so this
    // completes without the quadratic 12.5M-pair explosion
    val many = (0 until 5000).map(i => Row(i.toLong, "same text for every single document"))
    val d = df("doc_id BIGINT, text STRING", many)
    val out = Dedup.simHashPairs(d, "doc_id", "text", maxDistance = 3, maxBucketSize = 100)
    assert(out.count() == 0)
    val dropped = Dedup.simHashDroppedBuckets(d, "doc_id", "text",
      maxDistance = 3, maxBucketSize = 100)
    assert(dropped.agg(max(col("bucket_size"))).head().getLong(0) == 5000L)
  }

  test("dropBoilerplateLines removes high-doc-frequency lines, keeps order") {
    val rows = (1 to 8).map { i =>
      Row(i.toLong, s"unique opening $i\nAccept our  cookies\nbody text $i\nCopyright 2026")
    } :+ Row(9L, "accept our cookies") // normalization matches case/space
    val d = df("doc_id BIGINT, text STRING", rows)
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", maxDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(1L) == "unique opening 1\nbody text 1") // both boilerplate lines gone
    assert(out(9L) == "") // document that was pure boilerplate
    // below the threshold nothing is removed
    val keep = Dedup.dropBoilerplateLines(d, "doc_id", "text", maxDocFreq = 20)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(keep(1L) == "unique opening 1\nAccept our  cookies\nbody text 1\nCopyright 2026")
  }

  test("redactPii masks emails, IPs and phone numbers") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "mail me at jo.doe+x@example.co.uk or call +1 (555) 123-4567 now"),
      Row(2L, "server 10.0.255.3 responded; backup at 192.168.1.1"),
      Row(3L, "no pii here"),
      Row(4L, "tel 555-123-9999."),
      Row(5L, "released 2026-08-12, build 1.2.3.45678, order 20260812")))
    val out = TextAnalysis.redactPii(d, "text").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(1L) == "mail me at <EMAIL> or call <PHONE> now", out(1L))
    assert(out(2L) == "server <IP> responded; backup at <IP>")
    assert(out(3L) == "no pii here")
    assert(out(4L) == "tel <PHONE>.")
    // dates, versions and short numeric ids are NOT phones
    assert(out(5L) == "released 2026-08-12, build 1.2.3.45678, order 20260812")
  }

  test("sampleByHash is deterministic, entity-complete and disjoint across ranges") {
    val d = df("doc_id BIGINT, part BIGINT",
      (0 until 2000).map(i => Row((i / 2).toLong, (i % 2).toLong)))
    val a = Dedup.sampleByHash(d, "doc_id", 3, 10)
    val b = Dedup.sampleByHash(d, "doc_id", 3, 10)
    assert(a.collect().toSet == b.collect().toSet) // same rows every run
    // both rows of each sampled doc survive (entity-complete)
    val perDoc = a.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq == Seq(2L))
    val n = a.select("doc_id").distinct().count()
    assert(n > 200 && n < 400, s"3/10 of 1000 docs, got $n") // rate ~ 0.3
    // monotone nesting: a larger rate strictly contains a smaller one
    val bigger = Dedup.sampleByHash(d, "doc_id", 7, 10)
    val small = a.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val large = bigger.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && large.size > small.size)
  }

  test("sampleByHashStratifiedPortable: per-stratum rates, nested, recipe-exact") {
    val d = df("doc_id BIGINT, lang STRING",
      (0 until 600).map(i => Row(i.toLong, Seq("en", "de", "zh")(i % 3))))
    val out = Dedup.sampleByHashStratifiedPortable(
      d, "doc_id", "lang", Map("en" -> 8, "de" -> 4), den = 10, defaultNum = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // independent replication: 60-bit SHA-256 prefix of "0|id" mod 10
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"0|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val expected = (0 until 600).map(_.toLong).flatMap { id =>
      val lang = Seq("en", "de", "zh")(id.toInt % 3)
      val num = lang match { case "en" => 8; case "de" => 4; case _ => 1 }
      if (bucket(id) < num) Some((id, lang)) else None
    }.toSet
    assert(out == expected)
    // nesting: raising every rate only ADDS rows
    val bigger = Dedup.sampleByHashStratifiedPortable(
      d, "doc_id", "lang", Map("en" -> 10, "de" -> 7), den = 10, defaultNum = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.subsetOf(bigger) && bigger.size > out.size)
  }

  test("sampleByHashPortable matches the published SHA-256 recipe") {
    val d = df("doc_id BIGINT, v BIGINT",
      (0 until 500).map(i => Row(i.toLong, i.toLong)))
    val out = Dedup.sampleByHashPortable(d, "doc_id", 3, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent replication of the recipe: first 15 hex chars of
    // sha256("0|id") as a 60-bit int, mod 10 < 3
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expected = (0 until 500).map(_.toLong).filter { id =>
      val hex = md.digest(s"0|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10 < 3
    }.toSet
    assert(out == expected)
    assert(out.nonEmpty && out.size < 500)
  }

  test("simHashVerifiedPairs: recall 1 for token permutations, exact verify kills collisions") {
    val d = df("doc_id BIGINT, text STRING",
      Seq(
        Row(1L, "alpha beta gamma delta epsilon zeta"),
        Row(2L, "zeta epsilon delta gamma beta ALPHA"), // permutation + case
        Row(3L, "alpha beta gamma delta epsilon zeta eta"), // superset: no pair
        Row(4L, "totally different words here entirely"),
        Row(5L, "alpha  beta\tgamma delta epsilon zeta") // whitespace variant
      ))
    val pairs = Dedup.simHashVerifiedPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("simHashVerifiedPairs keeps recall 1 through OVERSIZED signature buckets") {
    // 150 identical docs blow past maxBucketSize=100: simHashPairs would
    // drop the whole bucket, but the verified mode routes its rows to the
    // exact token-array self-join — all C(150,2) pairs survive, alongside
    // the under-cap permutation pair.
    val hot = (0 until 150).map(i => Row(i.toLong, "same viral boilerplate text"))
    val cold = Seq(
      Row(1000L, "one two three four"),
      Row(1001L, "four three two one"), // permutation: under-cap pair
      Row(1002L, "something else entirely distinct"))
    val d = df("doc_id BIGINT, text STRING", hot ++ cold)
    val pairs = Dedup.simHashVerifiedPairs(d, "doc_id", "text", maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1000L, 1001L)))
    val hotPairs = pairs.filter(_._1 < 1000L)
    assert(hotPairs.size == 150 * 149 / 2, s"got ${hotPairs.size}")
    // every pair ordered, no self-pairs
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("duplicatedSpans marks repeated 8-grams and merges overlaps") {
    val d = df("doc_id BIGINT, text STRING",
      Seq(
        Row(1L, "a b c d e f g h i j"),
        Row(2L, "x X A B c d e f g h q R"), // same 8-gram, case-shifted, at pos 2
        Row(3L, "Unique WORDS only here Nothing repeated at all"),
        Row(4L, "p q r s t u v w p q r s t u v w") // self-repeat at pos 0 and 8
      ))
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc4's two marks (0 and 8) coalesce into one span covering the doc
    assert(spans == Set((1L, 0, 7), (2L, 2, 9), (4L, 0, 15)))
    // reassembly preserves ORIGINAL case; only the decision is folded
    val cleaned = Dedup.removeDuplicatedSpans(d, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleaned(1L) == "i j")
    assert(cleaned(2L) == "x X q R")
    assert(cleaned(3L) == "Unique WORDS only here Nothing repeated at all")
    assert(cleaned(4L) == "")
  }

  test("text analysis columns") {
    val d = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, "Hello   world  foo"), Row(2L, "")))
    val tc = TextAnalysis.tokenCount(d, "text").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(tc(1L) == 3L)
    val fp = TextAnalysis.fingerprint(d, "text")
    assert(fp.select("fingerprint").distinct().count() == 2)
    val lang = TextAnalysis.languageId(
      df("doc_id BIGINT, text STRING",
        Seq(Row(1L, "the cat and the dog of it is that"),
            Row(2L, "el gato y la casa de los perros"),
            Row(3L, "zzz qqq"))), "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(lang(1L) == "en")
    assert(lang(2L) == "es")
    assert(lang(3L) == "und")
  }

  test("keepBestPerCluster keeps the highest-score doc; ties and all-null scores fall back to min id") {
    val d = df("doc_id BIGINT, score DOUBLE",
      Seq(Row(1L, 0.2), Row(2L, 0.9), Row(3L, 0.9), // cluster 1: tie at 0.9 → id 2
          Row(4L, null), Row(5L, null),             // cluster 4: all null → id 4
          Row(6L, 0.5)))                            // singleton
    // doc 6 is deliberately ABSENT from the clusters table: unclustered
    // rows must be kept as their own singleton cluster, not dropped
    val clusters = df("doc_id BIGINT, cluster_id BIGINT",
      Seq(Row(1L, 1L), Row(2L, 1L), Row(3L, 1L),
          Row(4L, 4L), Row(5L, 4L)))
    val kept = Dedup.keepBestPerCluster(d, clusters, "doc_id", "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("keepBestPerCluster singleton whose id collides with a foreign cluster_id survives") {
    // cluster ids NOT drawn from member doc ids (synthetic 100): doc 100 is
    // unclustered, shares its value with that cluster_id, and scores lower
    // than the cluster's best — the tagged singleton key keeps it anyway
    val d = df("doc_id BIGINT, score DOUBLE",
      Seq(Row(1L, 0.9), Row(2L, 0.5), Row(100L, 0.1)))
    val clusters = df("doc_id BIGINT, cluster_id BIGINT",
      Seq(Row(1L, 100L), Row(2L, 100L)))
    val kept = Dedup.keepBestPerCluster(d, clusters, "doc_id", "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 100L))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "alpha beta gamma delta epsilon zeta"), // shares a 4-gram
      Row(2L, "one two three four five six"),         // clean
      Row(3L, "alpha beta gamma")))                   // < n tokens: can never flag
    val bench = df("btext STRING", Seq(Row("xx ALPHA beta gamma delta yy")))
    val flagged = Dedup
      .contaminatedIds(corpus, "doc_id", "text", bench, "btext", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L)) // case-insensitive: ALPHA matches alpha
    val clean = Dedup
      .dropContaminated(corpus, "doc_id", "text", bench, "btext", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("fuzzy decontamination flags near-dup eval overlap, exact at threshold 1") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog tonight"),
      Row(2L, "THE  QUICK brown fox jumps over the lazy dog tonight"), // case/ws copy
      Row(3L, "the quick brown fox jumps over the lazy cat tonight"), // near miss
      Row(4L, "completely unrelated words forming another document here"),
      Row(5L, "too short")))
    val bench = df("btext STRING",
      Seq(Row("the quick brown fox jumps over the lazy dog tonight")))
    // threshold 1.0: only the exact (case/whitespace-invariant) copies
    val exact = Dedup.contaminatedIdsFuzzy(
      corpus, "doc_id", "text", bench, "btext",
      shingleSize = 5, numHashes = 64, bands = 16, jaccardThreshold = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 2L))
    // a lower threshold additionally catches the one-token edit (its
    // shingle sets overlap heavily with the benchmark's)
    val fuzzy = Dedup.contaminatedIdsFuzzy(
      corpus, "doc_id", "text", bench, "btext",
      shingleSize = 5, numHashes = 64, bands = 64, jaccardThreshold = 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(fuzzy == Set(1L, 2L, 3L))
    val clean = Dedup.dropContaminatedFuzzy(
      corpus, "doc_id", "text", bench, "btext",
      shingleSize = 5, numHashes = 64, bands = 16, jaccardThreshold = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L, 5L))
  }

  test("repetition signals (Gopher-style)") {
    // doc1: lines {a b, x y, x y, c c c c c c} (blank/space-only dropped);
    // tokens a b x y x y c c c c c c → nchars = 12 + 11 joiners = 23;
    // top 2-gram "c c" ×5 (15 chars), top 3-gram "c c c" ×4 (20), repeated
    // 5-gram "c c c c c" ×2 (18)
    val d = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, "a b\nx y\nx y\n\n  \nc c c c c c"),
          Row(2L, ""),
          Row(3L, "one two three")))
    val rows = TextAnalysis.repetitionSignals(d, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    def v(id: Long, c: String): Double = rows(id).getAs[Double](c)
    assert(math.abs(v(1L, "rep_dup_line_frac") - 0.25) < 1e-12)
    assert(math.abs(v(1L, "rep_dup_line_char_frac") - 3.0 / 20) < 1e-12)
    assert(math.abs(v(1L, "rep_top2_char_frac") - 15.0 / 23) < 1e-12)
    assert(math.abs(v(1L, "rep_top3_char_frac") - 20.0 / 23) < 1e-12)
    assert(math.abs(v(1L, "rep_dup5_char_frac") - 18.0 / 23) < 1e-12)
    Seq("rep_dup_line_frac", "rep_dup_line_char_frac", "rep_top2_char_frac",
      "rep_top3_char_frac", "rep_dup5_char_frac").foreach { c =>
      assert(v(2L, c) == 0.0, c)
    }
    // doc3: no repetition — top singleton 2-gram "two three" covers 9/13,
    // the lone 3-gram covers everything, no 5-grams at 3 tokens
    assert(math.abs(v(3L, "rep_top2_char_frac") - 9.0 / 13) < 1e-12)
    assert(v(3L, "rep_top3_char_frac") == 1.0)
    assert(v(3L, "rep_dup5_char_frac") == 0.0)
  }

  test("corpusStats: per-group rollup with global duplicate classes") {
    val d = df("doc_id BIGINT, source STRING, text STRING", Seq(
      Row(1L, "a", "Hello  World"),
      Row(2L, "a", "hello world"), // dup of 1 across normalization
      Row(3L, "a", "three tokens here!"),
      Row(4L, "b", "hello world") // dup class member in ANOTHER group
    ))
    val out = TextAnalysis.corpusStats(d, "doc_id", "text", Seq("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_docs") == 3L)
    assert(out("a").getAs[Long]("n_tokens") == 2 + 2 + 3)
    assert(out("a").getAs[Long]("n_chars") == 12 + 11 + 18)
    assert(out("a").getAs[Long]("n_dup_docs") == 2L) // docs 1 and 2
    assert(out("b").getAs[Long]("n_dup_docs") == 1L) // doc 4, class size 3
    val q3 = (math.min(3 / 100.0, 1.0) * 0.5
      + math.min(17.0 / 18.0, 1.0) * 0.5) // "three tokens here!": 17 alpha+space
    val q12 = math.min(2 / 100.0, 1.0) * 0.5 + 0.5
    assert(math.abs(out("a").getAs[Double]("mean_quality") - (q12 * 2 + q3) / 3) < 1e-9)
    val ppm = Seq(q12, q12, q3).map(q => math.round(q * 1e6)).sum
    assert(out("a").getAs[Long]("sum_quality_ppm") == ppm)
  }

  test("repeatByWeightPortable: integer epochs for all, fractional for the hash sample") {
    val d = df("doc_id BIGINT, lang STRING",
      (1L to 200L).map(i => Row(i, if (i % 2 == 0) "en" else "xx")))
    val out = Dedup.repeatByWeightPortable(d, "doc_id", "lang",
        Map("en" -> 25), den = 10, defaultNum = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("epoch")))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    def keep(id: Long, num: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"0|$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 10 < num
    }
    (1L to 200L).foreach { i =>
      val copies =
        if (i % 2 == 0) 2 + (if (keep(i, 5)) 1 else 0) // en: 2.5 epochs
        else (if (keep(i, 5)) 1 else 0) // default: 0.5 epochs
      assert(byDoc.getOrElse(i, Seq()) == (0L until copies.toLong), s"doc $i")
    }
    // the fractional keep set matches sampleByHashPortable exactly (nested)
    val sampled = Dedup.sampleByHashPortable(d, "doc_id", 5, 10)
      .collect().map(_.getLong(0)).toSet
    assert(byDoc.keySet.filter(_ % 2 == 1) == sampled.filter(_ % 2 == 1))
  }

  test("dedupNewBatch admits only batch docs absent from the corpus") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog near the river"),
      Row(2L, "completely different content about spark query engines today"),
      Row(3L, "short doc")
    ))
    val batch = df("doc_id BIGINT, text STRING", Seq(
      Row(101L, "THE QUICK  brown fox jumps over the lazy dog near the river"), // case/ws copy of 1
      Row(102L, "the quick brown fox jumps over the lazy dog near the creek"), // near-dup of 1
      Row(103L, "entirely novel text with no counterpart in the corpus here"), // new
      Row(104L, "short doc"), // < 5 tokens: never flagged
      Row(105L, "completely different content about spark query engines today") // exact copy of 2
    ))
    // threshold 1.0: only set-identical copies flagged
    val strict = Dedup.dedupNewBatch(batch, "doc_id", "text", corpus,
        shingleSize = 5, numHashes = 64, bands = 16, jaccardThreshold = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(102L, 103L, 104L))
    // threshold 0.5: the near-dup is flagged too (shares 9-of-11ish shingles)
    val fuzzy = Dedup.dedupNewBatch(batch, "doc_id", "text", corpus,
        shingleSize = 3, numHashes = 64, bands = 32, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fuzzy == Set(103L, 104L))
  }

  test("paragraphDedup keeps only the first occurrence corpus-wide") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "alpha one\n\nSHARED para\n\ntail one"),
      Row(2L, "shared   PARA\n\nbeta two"), // normalized dup of doc 1's
      Row(3L, "gamma\n\ngamma"), // intra-document repeat
      Row(4L, "shared para") // fully gutted document
    ))
    val out = Dedup.paragraphDedup(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("clean_text"))).toMap
    assert(out(1L) == "alpha one\n\nSHARED para\n\ntail one")
    assert(out(2L) == "beta two")
    assert(out(3L) == "gamma")
    assert(out(4L) == "")
  }

  test("bigramLogProb: add-one bigram LM scores, short docs null") {
    // corpus: c2(a,b)=2 (docs 1,2), c2(b,a)=1; contexts c1(a)=2, c1(b)=1;
    // vocab {a,b,x} so V=3 → term(a,b)=ln(3/5), term(b,a)=ln(2/4)
    val d = df("doc_id BIGINT, text STRING",
      Seq(Row(1L, "a b a"), Row(2L, "A  b"), Row(3L, "x")))
    val out = TextAnalysis.bigramLogProb(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("lm_score"))).toMap
    val tAB = math.log(3.0 / 5.0)
    val tBA = math.log(2.0 / 4.0)
    assert(math.abs(out(1L).get - (tAB + tBA) / 2) < 1e-12)
    assert(math.abs(out(2L).get - tAB) < 1e-12)
    assert(out(3L).isEmpty)
  }

  test("packChunked equals a sequential prefix scan across range partitions") {
    val lens = (1L to 100L).map(i => i -> (if (i == 50L) 1000L else (i * 37 % 190) + 1))
    val d = df("id BIGINT, len BIGINT", lens.map { case (i, l) => Row(i, l) })
    // partitions = 7 forces the hierarchical path (several range partitions)
    val out = Pack.packChunked(d, "id", "len", budget = 256, partitions = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.length == 100)
    var cum = 0L
    lens.zip(out).foreach { case ((id, len), (oid, off, bs, bo, be)) =>
      assert(oid == id && off == cum, s"doc $id offset")
      assert(bs == cum / 256 && bo == cum % 256, s"doc $id bin start")
      assert(be == (cum + len - 1) / 256, s"doc $id bin end")
      cum += len
    }
    // the planted 1000-char doc must straddle several bins
    val big = out.find(_._1 == 50L).get
    assert(big._5 > big._3 + 1)
  }

  test("packChunkedShuffled: portable rank order, exact offsets, fresh epoch per salt") {
    val lens = (1L to 80L).map(i => i -> ((i * 53 % 300) + 1))
    val d = df("id BIGINT, len BIGINT", lens.map { case (i, l) => Row(i, l) })
    def localRank(salt: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$salt|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val out = Pack.packChunkedShuffled(d, "id", "len", budget = 256, salt = 9L,
        partitions = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // replay: sort by (rank, id), exclusive cumsum
    var cum = 0L
    val expected = lens
      .map { case (i, l) => (i, localRank(9L, i), l) }
      .sortBy(t => (t._2, t._1))
      .map { case (i, rk, l) => val off = cum; cum += l; (i, rk, off) }
      .sortBy(_._1)
    assert(out.toSeq == expected)
    // a different salt yields a different permutation
    val out2 = Pack.packChunkedShuffled(d, "id", "len", budget = 256, salt = 10L,
        partitions = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(out2.toSeq != out.map(t => (t._1, t._3)).toSeq)
  }

  test("packGreedyNextFit: per-shard next-fit, oversize docs take their own bin") {
    val lens = (1L to 60L).map(i => i -> (if (i == 7L) 500L else (i % 10) * 13 + 1))
    val d = df("id BIGINT, len BIGINT", lens.map { case (i, l) => Row(i, l) })
    val out = Pack.packGreedyNextFit(d, "id", "len", budget = 100, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val state = scala.collection.mutable.Map[Long, (Long, Long)]()
    val exp = lens.map { case (i, len) =>
      val shard = i % 4
      val (fill, bin) = state.getOrElse(shard, (0L, -1L))
      val (nf, nb) =
        if (fill > 0 && fill + len <= 100) (fill + len, bin) else (len, bin + 1)
      state(shard) = (nf, nb)
      (i, shard, nb)
    }
    assert(out.toSeq == exp)
  }

  test("clipToQuantiles winsorizes at exact discrete per-group boundaries") {
    // group a: values 1..100 once each → p10 boundary = 10 (cum 10 >= 10),
    // p90 boundary = 90; group b: constant → clip is the identity
    val d = df("g STRING, v BIGINT",
      (1L to 100L).map(Row("a", _)) ++ (1L to 20L).map(_ => Row("b", 7L)))
    val out = Profile.clipToQuantiles(d, Seq("g"), "v", 0.10, 0.90)
    val a = out.filter(col("g") === "a").select("v")
      .collect().map(_.getLong(0))
    assert(a.min == 10L && a.max == 90L)
    assert(a.count(_ == 10L) == 10 && a.count(_ == 90L) == 11)
    assert(out.filter(col("g") === "b").select("v")
      .collect().map(_.getLong(0)).forall(_ == 7L))
    // nulls pass through unclipped
    val dn = df("g STRING, v BIGINT", Seq(Row("a", 1L), Row("a", null)))
    assert(Profile.clipToQuantiles(dn, Seq("g"), "v", 0.1, 0.9)
      .filter(col("v").isNull).count() == 1)
    // a NULL group key is a group like any other (null-safe bounds join)
    val gn = df("g STRING, v BIGINT",
      (1L to 10L).map(i => Row(null, i)) :+ Row("a", 5L))
    val gnOut = Profile.clipToQuantiles(gn, Seq("g"), "v", 0.2, 0.8)
      .filter(col("g").isNull).select("v").collect().map(_.getLong(0))
    assert(gnOut.min == 2L && gnOut.max == 8L)
  }

  test("tfidfCosinePairs finds duplicates and respects the threshold") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog"),
      Row(2L, "the quick brown fox jumps over the lazy dog"),
      Row(3L, "the quick brown fox naps beside a calm dog"),
      Row(4L, "completely unrelated treatise on monetary policy")))
    val out = Similarity.tfidfCosinePairs(d, "doc_id", "text", threshold = 0.4)
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")) ->
        r.getAs[Double]("cosine")).toMap
    // identical docs: all quantized weights equal → cosine exactly 1
    assert(out((1L, 2L)) == 1.0)
    // doc 3 shares "the quick brown fox … dog" (idf-downweighted) ≈ 0.44
    assert(out.keySet.contains((1L, 3L)) && out.keySet.contains((2L, 3L)))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    assert(out.values.forall(c => c >= 0.4 && c <= 1.0))
  }

  test("prefix filtering is lossless against the unfiltered join at sf0.01") {
    // the candidate prefix join must find EXACTLY the pairs the full
    // postings self-join finds — run both over the real corpus and diff
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fast = Similarity.tfidfCosinePairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: same weight pipeline, candidates = every pair sharing
    // ANY term (no prefix restriction)
    val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val base = docs.select(col("doc_id").as("__id"), tok(col("text")).as("__t"))
    val n = base.agg(count(lit(1)).as("__n"))
    val tf = base.select(col("__id"), explode(col("__t")).as("term"))
      .groupBy(col("__id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = tf.join(dfs, Seq("term")).crossJoin(broadcast(n))
      .select(col("__id"), col("term"),
        round(lit(1000000.0) * col("tf") *
          (log((col("__n").cast("double") + lit(1.0)) /
            (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0)), 0)
          .cast("long").as("w"))
      .filter(col("w") > 0)
    val rawNorm = w.groupBy(col("__id"))
      .agg(sum((col("w") * col("w")).cast(dec)).as("__n2"))
    val q = w.join(rawNorm, Seq("__id"))
      .select(col("__id"), col("term"),
        round(lit(1000000.0) * col("w").cast("double") /
          sqrt(col("__n2").cast("double")), 0).cast("long").as("q"))
      .filter(col("q") > 0).persist()
    val qn = q.groupBy(col("__id")).agg(sum((col("q") * col("q")).cast(dec)).as("__qn2"))
    val slow = q.select(col("__id").as("l"), col("term"), col("q").as("ql"))
      .join(q.select(col("__id").as("r"), col("term"), col("q").as("qr")), Seq("term"))
      .filter(col("l") < col("r"))
      .groupBy(col("l"), col("r"))
      .agg(sum((col("ql") * col("qr")).cast(dec)).as("dot"))
      .join(qn.select(col("__id").as("l"), col("__qn2").as("a2")), Seq("l"))
      .join(qn.select(col("__id").as("r"), col("__qn2").as("b2")), Seq("r"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("a2").cast("double")) * sqrt(col("b2").cast("double"))))
      .filter(col("cosine") >= 0.5)
      .select(col("l"), col("r"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.unpersist()
    assert(fast == slow, s"prefix filter lost ${(slow -- fast).size} pairs, " +
      s"invented ${(fast -- slow).size}")
    assert(fast.nonEmpty)
  }

  test("bucketBatches assigns deterministic per-bucket ranks and batches") {
    val d = df("id BIGINT, len BIGINT",
      Seq(Row(1L, 50L), Row(2L, 250L), Row(3L, 40L), Row(4L, 900L),
        Row(5L, 210L), Row(6L, 1500L)))
    val out = Pack.bucketBatches(d, "id", "len", Seq(200L, 500L, 1000L), 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("rank_in_bucket"),
          r.getAs[Long]("batch"))).toMap
    assert(out(1L) == (0L, 0L, 0L) && out(3L) == (0L, 1L, 0L))
    assert(out(2L) == (1L, 0L, 0L) && out(5L) == (1L, 1L, 0L))
    assert(out(4L) == (2L, 0L, 0L))
    assert(out(6L) == (3L, 0L, 0L))
    // a third member of a bucket opens batch 1
    val more = df("id BIGINT, len BIGINT", Seq(Row(7L, 60L)))
    val out2 = Pack.bucketBatches(d.unionByName(more), "id", "len",
      Seq(200L, 500L, 1000L), 2)
      .filter(col("bucket") === 0L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("batch")).toMap
    assert(out2 == Map(1L -> 0L, 3L -> 0L, 7L -> 1L))
  }

  test("psiDrift bins, smooths, and reports near-zero for identical sides") {
    val side = df("v DOUBLE",
      (0 until 100).map(i => Row(i.toDouble)) :+ Row(null) :+ Row(-5.0)
        :+ Row(999.0))
    val out = Profile.psiDrift(side, side, "v", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("psi_term_ppm"))).toMap
    // identical sides → every psi term exactly 0; null excluded, the
    // -5 underflows to bin -1 and 999 overflows to bin 10
    assert(out.values.forall(t => t._1 == t._2 && t._3 == 0L))
    assert(out(-1L)._1 == 1L && out(10L)._1 == 1L)
    assert((0L until 10L).forall(b => out(b)._1 == 10L))
    // a shifted current side produces a positive total PSI
    val shifted = df("v DOUBLE", (0 until 100).map(i => Row(i / 2.0)))
    val psi = Profile.psiDrift(side, shifted, "v", 0.0, 100.0, 10)
      .agg(sum(col("psi_term_ppm"))).head().getLong(0)
    assert(psi > 250000L, s"psi=$psi") // >0.25: clearly shifted
  }

  test("psiDriftCategorical tracks category swings, null-safe") {
    val b = df("v STRING", Seq(Row("en"), Row("en"), Row("de"), Row(null)))
    val c = df("v STRING", Seq(Row("en"), Row("zh"), Row(null), Row(null)))
    val out = Profile.psiDriftCategorical(b, c, "v")
      .collect().map(r => Option(r.getString(0)) ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_cur"))).toMap
    // null is ONE category; de and zh appear with a zero side
    assert(out == Map(
      Some("en") -> (2L, 1L), Some("de") -> (1L, 0L),
      Some("zh") -> (0L, 1L), None -> (1L, 2L)))
    // identical sides → all psi terms zero
    val same = Profile.psiDriftCategorical(b, b, "v")
      .agg(sum(abs(col("psi_term_ppm")))).head().getLong(0)
    assert(same == 0L)
  }

  test("madOutliers flags by discrete median absolute deviation") {
    // group a: 1..9 plus a wild 1000 → med = 5 (10 values, index 4),
    // devs sorted [0,1,1,2,2,3,3,4,4,995] → MAD = 2 (index 4);
    // outliers: |x − 5| > 6 → only 1000. group b: constants → MAD 0,
    // every distinct value is an outlier, the constant never.
    val d = df("g STRING, v DOUBLE",
      ((1 to 9).map(i => Row("a", i.toDouble)) :+ Row("a", 1000.0)) ++
        Seq(Row("b", 2.0), Row("b", 2.0), Row("b", 2.0), Row("b", 9.0),
          Row("a", null)))
    val out = Profile.madOutliers(d, Seq("g"), "v", k = 3.0)
    val a = out.filter(col("g") === "a" && col("v").isNotNull).collect()
    assert(a.forall(r => r.getAs[Double]("med") == 5.0 &&
      r.getAs[Double]("mad") == 2.0))
    assert(a.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Double]("v"))
      .toSeq == Seq(1000.0))
    val b = out.filter(col("g") === "b").collect()
    assert(b.forall(r => r.getAs[Double]("med") == 2.0 &&
      r.getAs[Double]("mad") == 0.0))
    assert(b.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Double]("v"))
      .toSeq == Seq(9.0))
    // null value keeps null med join result in the flag
    assert(out.filter(col("v").isNull).head().isNullAt(
      out.columns.indexOf("is_outlier")))
  }

  test("ngramNovelty scores corpus-unique grams and keeps short docs") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c d"),      // grams: "a b c", "b c d"
      Row(2L, "a b c x"),      // shares "a b c" with doc 1
      Row(3L, "zz yy")))       // too short for 3-grams
    val out = TextAnalysis.ngramNovelty(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1) // "b c d" unique, "a b c" shared
    assert(out(2L)._1 == 2 && out(2L)._2 == 1)
    assert(out(3L) == ((0L, 0L, None)))
    assert(out(1L)._3.contains(0.5d))
  }

  test("majorityLabel picks the modal label with deterministic ties") {
    val d = df("k BIGINT, lab STRING", Seq(
      Row(1L, "b"), Row(1L, "b"), Row(1L, "a"),
      Row(2L, "z"), Row(2L, "a"),          // tie → smallest label
      Row(3L, "x")))
    val out = Quality.majorityLabel(d, Seq("k"), "lab")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Long]("n_votes"), r.getAs[Long]("n_total")))
      .toMap
    assert(out == Map(
      1L -> ("b", 2L, 3L), 2L -> ("a", 1L, 2L), 3L -> ("x", 1L, 1L)))
  }

  test("topMassPerGroup keeps the minimal prefix reaching p of the mass") {
    // group g: weights 50, 30, 20 (total 100): p=.5 → ceil 50 → keep 50
    // only (exclusive cum 0 < 50; next row cum 50 not < 50); p=.51 → 50+30
    val d = df("g STRING, id BIGINT, w BIGINT", Seq(
      Row("g", 1L, 30L), Row("g", 2L, 50L), Row("g", 3L, 20L),
      Row("h", 4L, 1L)))
    def kept(p: Double) =
      Quality.topMassPerGroup(d, Seq("g"), "w", p, "id")
        .filter(col("g") === "g")
        .collect().map(r => (r.getLong(1), r.getAs[Long]("cum_weight"))).toSet
    assert(kept(0.5) == Set((2L, 50L)))
    assert(kept(0.51) == Set((2L, 50L), (1L, 80L)))
    assert(kept(1.0) == Set((2L, 50L), (1L, 80L), (3L, 100L)))
    // singleton group always keeps its row
    assert(Quality.topMassPerGroup(d, Seq("g"), "w", 0.5, "id")
      .filter(col("g") === "h").count() == 1L)
  }

  test("Quality.check evaluates all constraints in one pass") {
    val d = df("id BIGINT, s STRING, x DOUBLE", Seq(
      Row(1L, "ok", 5.0), Row(1L, "ok", 50.0), Row(2L, null, -1.0),
      Row(3L, "bad", null), Row(4L, "ok", 7.0)))
    val out = Quality.check(d, Seq(
      Quality.NotNull("s"),
      Quality.Unique(Seq("id")),
      Quality.InRange("x", 0.0, 10.0),
      Quality.AcceptedValues("s", Seq("ok")),
      Quality.MaxNullFraction("s", 0.5)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("not_null:s") == ((1L, false)))
    assert(out("unique:id") == ((1L, false)))    // id 1 twice
    assert(out("in_range:x") == ((2L, false)))   // -1 and 50; null skipped
    assert(out("accepted:s") == ((1L, false)))   // "bad"; null skipped
    assert(out("max_null_frac:s") == ((0L, true))) // 1 null <= floor(0.5*5)
    // Satisfies: a null predicate is a violation (invariant not held)
    val sat = Quality.check(d, Seq(
      Quality.Satisfies("x_lt_100", col("x") < 100.0)))
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).head
    assert(sat == ((1L, false))) // the null-x row fails the invariant
  }

  test("checkBy fans the one-pass audit out per group") {
    val d = df("src STRING, x BIGINT", Seq(
      Row("a", 1L), Row("a", null), Row("b", 2L), Row("b", 3L)))
    val out = Quality.checkBy(d, Seq("src"), Seq(Quality.NotNull("x")))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out == Map("a" -> ((1L, false)), "b" -> ((0L, true))))
  }

  test("sampleByWeightPerGroup takes k per group, nested across k") {
    val d = df("id BIGINT, g STRING, w BIGINT",
      (1L to 90L).map(i => Row(i, s"g${i % 3}", 1L + i % 5)))
    val k10 = Dedup.sampleByWeightPerGroup(d, "id", "w", Seq("g"), 10)
    val counts = k10.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10L) && counts.size == 3)
    // nested: the k=5 quota is a prefix of the k=10 one
    val k5 = Dedup.sampleByWeightPerGroup(d, "id", "w", Seq("g"), 5)
      .collect().map(_.getLong(0)).toSet
    assert(k5.subsetOf(k10.collect().map(_.getLong(0)).toSet) && k5.size == 15)
    // rank filter plans as a partial WindowGroupLimit
    assert(k10.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("functionalDependencyViolations finds only multi-valued lhs groups") {
    val d = df("a BIGINT, b STRING", Seq(
      Row(1L, "x"), Row(1L, "x"), Row(2L, "x"), Row(2L, "y"),
      Row(3L, null), Row(3L, "z")))
    val out = Quality.functionalDependencyViolations(d, Seq("a"), Seq("b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // key 1 maps to one rhs (holds); key 2 to two; key 3's null is a
    // distinct struct value, so it violates too
    assert(out == Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))))
  }

  test("Profile.describe reports exact per-column stats in long format") {
    val d = df("id BIGINT, name STRING, score DOUBLE", Seq(
      Row(1L, "b", 2.5), Row(2L, "a", null), Row(3L, null, 1.0),
      Row(3L, "a", 4.0)))
    val out = Profile.describe(d)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 3)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val name = out("name")
    assert(name.getLong(2) == 1 && name.getLong(3) == 2)
    assert(name.getString(6) == "a" && name.getString(7) == "b")
    assert(name.isNullAt(4) && name.isNullAt(5))
    val score = out("score")
    assert(score.getLong(2) == 1 && score.getLong(3) == 3)
    assert(score.getDouble(4) == 1.0 && score.getDouble(5) == 4.0)
    // approx path: same shape, distinct counts within HLL tolerance
    val approx = Profile.describe(d, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("id") >= 2 && approx("id") <= 4)
    // unorderable (map) columns profile counts only instead of throwing
    val withMap = d.withColumn("m", map(lit("k"), col("id")))
    val mrow = Profile.describe(withMap).collect()
      .find(_.getString(0) == "m").get
    assert(mrow.getLong(1) == 4 && mrow.getLong(2) == 0)
    assert(mrow.isNullAt(3)) // n_distinct skipped for unorderable types
  }

  test("writeShards emits one sorted file per bin and round-trips") {
    val d = df("id BIGINT, len BIGINT",
      (1L to 40L).map(i => Row(i, 10L)))
    val packed = Pack.packGreedyNextFit(d, "id", "len", budget = 30L,
      numShards = 2)
    val root = java.nio.file.Files.createTempDirectory("shards_").toString
    val tmp = s"$root/out" // default errorifexists mode needs a fresh path
    try {
      Pack.writeShards(packed.withColumn("b",
          concat(col("shard"), lit("_"), col("bin"))),
        "b", Seq("id"), tmp)
      val back = spark.read.parquet(tmp)
      assertSameRows(
        back.select("id", "shard", "bin"),
        packed.select("id", "shard", "bin"))
      // exactly one data file inside each bin directory
      val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory)
      assert(dirs.nonEmpty)
      dirs.foreach { dir =>
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, dir.getName)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("corpusDiff classifies added/removed/changed/unchanged ids") {
    val prev = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "same text"), Row(2L, "old text"), Row(3L, "gone"),
      Row(4L, "Spaced   Text"),
      Row(6L, null), Row(7L, null))) // null text is PRESENT, not absent
    val next = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "same text"), Row(2L, "new text"),
      Row(4L, "spaced text"), // equal modulo whitespace/case → unchanged
      Row(5L, "brand new"),
      Row(6L, "filled in"), Row(7L, null)))
    val out = Dedup.corpusDiff(prev, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added", 6L -> "changed", 7L -> "unchanged"))
  }

  test("sampleByWeightPortable is deterministic and weight-proportional") {
    // ids 1..400 with weight 1, ids 401..500 with weight 50: the heavy
    // 20% should dominate a k=100 A-ES sample (E[heavy] ≈ 95)
    val d = df("id BIGINT, w BIGINT",
      (1L to 400L).map(Row(_, 1L)) ++ (401L to 500L).map(Row(_, 50L)))
    val s1 = Dedup.sampleByWeightPortable(d, "id", "w", k = 100, salt = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 100)
    val heavy = s1.count(_ > 400L)
    assert(heavy >= 80, s"expected the heavy ids to dominate, got $heavy")
    // replayable: same (salt, id, weight) → same set, any partitioning
    val s2 = Dedup.sampleByWeightPortable(
      d.repartition(7), "id", "w", k = 100, salt = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // a different salt draws a different set
    val s3 = Dedup.sampleByWeightPortable(d, "id", "w", k = 100, salt = 4L)
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s3)
    // top-k plans as TakeOrderedAndProject, not a global sort
    val plan = Dedup.sampleByWeightPortable(d, "id", "w", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    // null/zero/negative weights are excluded, never sample-dominating
    val bad = df("id BIGINT, w BIGINT",
      Seq(Row(900L, null), Row(901L, 0L), Row(902L, -5L), Row(903L, 1L)))
    val picked = Dedup.sampleByWeightPortable(bad, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(903L))
  }

  test("splitByHash partitions rows into disjoint exhaustive buckets") {
    val d = df("id BIGINT", (1L to 1000L).map(Row(_)))
    val out = Dedup.splitByHash(d, "id", Seq(8000, 1000, 1000))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2))
    assert(counts.values.sum == 1000L)
    assert(counts(0) > 700L && counts(1) < 200L && counts(2) < 200L)
    // deterministic and identical to the rate-based sampler's carve-outs:
    // bucket 0 is exactly the num=8000/den=10000 keep set
    val b0 = out.filter(col("split") === 0).select("id")
      .collect().map(_.getLong(0)).toSet
    val rate = Dedup.sampleByHashPortable(d, "id", 8000, 10000)
      .collect().map(_.getLong(0)).toSet
    assert(b0 == rate)
  }

  test("rankNormalize matches percent_rank semantics without sorting rows") {
    val d = df("g STRING, v BIGINT",
      Seq(Row("a", 10L), Row("a", 20L), Row("a", 20L), Row("a", 30L),
        Row("b", 5L), Row("a", null)))
    val out = Profile.rankNormalize(d, Seq("g"), "v")
    val got = out.collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // a: n=4 → ranks 0, 1/3 (tie), 1/3, 1; b singleton → 0; null → null
    assert(got == Set(
      ("a", Some(10L), Some(0.0)), ("a", Some(20L), Some(0.333333)),
      ("a", Some(30L), Some(1.0)), ("b", Some(5L), Some(0.0)),
      ("a", None, None)))
  }

  test("sampleKPerGroup keeps exactly k per group, nested across k") {
    val d = df("id BIGINT, g STRING",
      (1L to 60L).map(i => Row(i, s"g${i % 3}")))
    val k5 = Dedup.sampleKPerGroup(d, "id", Seq("g"), 5)
    val counts = k5.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L))
    // nested: the k=3 carve-out is a subset of the k=5 one
    val k3 = Dedup.sampleKPerGroup(d, "id", Seq("g"), 3)
      .collect().map(_.getLong(0)).toSet
    val k5ids = k5.collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(k5ids) && k3.size == 9)
    // deterministic across runs
    assert(Dedup.sampleKPerGroup(d, "id", Seq("g"), 5)
      .collect().map(_.getLong(0)).toSet == k5ids)
    // a group smaller than k survives whole
    val small = df("id BIGINT, g STRING", Seq(Row(1L, "x"), Row(2L, "x")))
    assert(Dedup.sampleKPerGroup(small, "id", Seq("g"), 5).count() == 2)
    // partial WindowGroupLimit bounds per-task fan-in at scale
    assert(k5.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("chunkDocuments covers every token with overlapping windows") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, (1 to 13).map(i => s"w$i").mkString(" ")), // 13 tokens
      Row(2L, "short  doc"), // interior double space normalizes away
      Row(3L, "   "))) // token-less: no chunks
    val out = TextAnalysis.chunkDocuments(d, "doc_id", "text",
        maxTokens = 8, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // 13 tokens, stride 4 → chunks at 0,4,8: [1..8],[5..12],[9..13]
    assert(out.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    assert(out((1L, 0)) == (((1 to 8).map(i => s"w$i").mkString(" "), 8L)))
    assert(out((1L, 1)) == (((5 to 12).map(i => s"w$i").mkString(" "), 8L)))
    assert(out((1L, 2)) == (((9 to 13).map(i => s"w$i").mkString(" "), 5L)))
    assert(out((2L, 0)) == (("short doc", 2L)))
  }

  test("bm25TopK ranks exact-term docs above partial matches, caps at k") {
    val d = df(
      "doc_id BIGINT, text STRING",
      Seq(
        Row(1L, "spark joins and spark shuffles"), // both terms, tf(spark)=2
        Row(2L, "spark streaming pipelines here"), // one term
        Row(3L, "joins joins joins everywhere now"), // one term, tf=3
        Row(4L, "nothing relevant whatsoever here"),
        Row(5L, "spark joins once"))) // both terms, shorter doc
    val q = df("query_id STRING, query_text STRING",
      Seq(Row("q1", "Spark JOINS"), Row("q2", "streaming")))
    val out = TextAnalysis
      .bm25TopK(d, "doc_id", "text", q, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q1 = out.filter(_._1 == "q1").sortBy(_._4).map(_._2)
    assert(q1.length == 3)
    // docs with both query terms outrank single-term docs; doc 5's shorter
    // length (b-normalization) beats doc 1's extra tf on the same terms
    assert(q1.toSet.subsetOf(Set(1L, 3L, 5L)) && q1.take(2).toSet == Set(1L, 5L))
    val q2 = out.filter(_._1 == "q2")
    assert(q2.map(_._2).toSeq == Seq(2L)) // only doc 2 contains 'streaming'
    assert(out.forall(_._3 > 0)) // all reported scores positive ppm
  }

  test("bm25TopK ranks unique-term matches first, drops unknown terms") {
    val d = df(
      "doc_id BIGINT, text STRING",
      (1L to 40L).map(i =>
        Row(i, s"token$i common ${if (i % 2 == 0) "even" else "odd"} filler")))
    val q = df("query_id STRING, query_text STRING",
      Seq(Row("qa", "even token4 zzz_absent_term")))
    val a = TextAnalysis.bm25TopK(d, "doc_id", "text", q, k = 5)
    // doc 4 matches both 'even' and its unique 'token4' → rank 1; the
    // absent term contributes nothing (and must not null the scores)
    assert(a.count() == 5)
    assert(a.filter(col("rank") === 1).collect().head.getLong(1) == 4L)
    // the top-k filter plans as a Partial WindowGroupLimit before the
    // exchange — the property the scale story rests on
    assert(a.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("scoreHashedLinear sums per-token hash weights exactly") {
    val d = df("id BIGINT, text STRING",
      Seq(
        Row(1L, "alpha beta alpha"),
        Row(2L, "ALPHA  beta\talpha"), // case/whitespace-normalized: same
        Row(3L, ""), // empty → bias only
        Row(4L, "alpha")))
    val out = TextAnalysis.scoreHashedLinear(d, "text",
        dim = 64, range = 10, bias = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    // exactness: recompute the weight chain on the driver
    def h(salt: Long, key: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$salt|$key".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
    def w(tok: String): Long = h(7L, (h(3L, tok) % 64).toString) % 21 - 10
    val expect1 = 2L + 2 * w("alpha") + w("beta")
    assert(out(1L) == ((expect1, expect1 > 0)))
    assert(out(2L) == out(1L)) // normalization-invariant
    assert(out(3L) == ((2L, true))) // bias only
    assert(out(4L) == ((2L + w("alpha"), 2L + w("alpha") > 0)))
  }

  test("mixByTemperature carves round(scale·√n) per source, capped at n") {
    // sources: a has 9 rows, b has 4, c has 1
    val rows = (0 until 9).map(i => Row(s"a$i", "a")) ++
      (0 until 4).map(i => Row(s"b$i", "b")) ++ Seq(Row("c0", "c"))
    val d = df("k STRING, src STRING", rows)
    val out = Dedup.mixByTemperature(d, "k", "src",
        invTemp = 0.5, scale = 1.0)
      .collect().map(_.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap // column order preserved: (k, src)
    // quotas: a → round(√9)=3, b → round(√4)=2, c → max(1, round(1))=1
    assert(out == Map("a" -> 3, "b" -> 2, "c" -> 1))
    // scale beyond n caps at n; selection is deterministic across reruns
    val all = Dedup.mixByTemperature(d, "k", "src",
      invTemp = 0.5, scale = 100.0)
    assert(all.count() == 14)
    val r1 = Dedup.mixByTemperature(d, "k", "src", invTemp = 0.5, scale = 1.0)
    assertSameRows(r1, Dedup.mixByTemperature(d, "k", "src",
      invTemp = 0.5, scale = 1.0))
  }

  test("quantizeInt8: absmax scale, half-up lanes, zero-vector safe") {
    val d = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.5f, -1.0f, 0.25f)),
      Row(2L, Seq(0.0f, 0.0f, 0.0f))))
    val out = Similarity.quantizeInt8(d, "v").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getSeq[Byte](3))).toMap
    // amax 1.0: 0.5·127+0.5 → floor(64.0)=64; -127 exact; 0.25·127=31.75+0.5 → 32
    assert(out(1L)._1 == 1.0)
    assert(out(1L)._2 == Seq[Byte](64, -127, 32))
    assert(out(2L)._1 == 0.0 && out(2L)._2 == Seq[Byte](0, 0, 0))
  }

  test("quantizeInt8 round-trip error is within half a quantization step") {
    val vecs = (0 until 20).map { i =>
      Row(i.toLong, (0 until 8).map(j =>
        math.sin(i * 8 + j + 1).toFloat))
    }
    val d = df("id BIGINT, v ARRAY<FLOAT>", vecs)
    val rows = Similarity.quantizeInt8(d, "v").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val s = r.getDouble(2)
      val q = r.getSeq[Byte](3)
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi * s / 127.0 - x) <= s / 254.0 + 1e-12)
      }
    }
  }

  test("quantizedTopK returns self first with the exact integer self-dot") {
    val vecs = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      Row(1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      Row(2L, Seq(0.7f, 0.7f, 0.1f, 0.0f)),
      Row(3L, Seq(-1.0f, 0.2f, 0.0f, 0.4f)))
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", vecs)
    val top = Similarity.quantizedTopK(
      d.filter(col("vec_id") === 0L), d, "vec_id", "embedding", k = 2)
      .orderBy("query_id", "neighbor_id").collect()
    // self neighbor ranks first: qdot(self) = 127² = 16129
    val self = top.find(r => r.getLong(1) == 0L).get
    assert(self.getLong(2) == 16129L)
    assert(top.length == 2)
  }

  test("corrMatrix: exact fixed-point moments reproduce known correlations") {
    val rows = (1 to 50).map { i =>
      Row(i.toDouble, 2.0 * i, 51.0 - i, 7.0)
    }
    val d = df("a DOUBLE, b DOUBLE, c DOUBLE, k DOUBLE", rows).repartition(7)
    val m = Profile.corrMatrix(d, Seq("a", "b", "c", "k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(math.abs(m(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(m(("a", "c")).get + 1.0) < 1e-12)
    // constant column: zero variance → NULL against every partner
    assert(m(("a", "k")).isEmpty && m(("b", "k")).isEmpty && m(("c", "k")).isEmpty)
  }

  test("corrMatrix matches Spark's corr and is partition-independent") {
    val rows = (0 until 200).map { i =>
      Row(((i * 37) % 101).toDouble, ((i * i) % 89).toDouble)
    }
    val d = df("x DOUBLE, y DOUBLE", rows)
    val expected = d.agg(corr("x", "y")).head().getDouble(0)
    val got = Seq(1, 8).map { parts =>
      Profile.corrMatrix(d.repartition(parts), Seq("x", "y"))
        .head().getDouble(3)
    }
    assert(math.abs(got.head - expected) < 1e-9)
    // exact sums: the two layouts agree to the BIT, not within tolerance
    assert(got.head == got(1))
  }

  test("corrMatrix excludes incomplete rows and scales cents columns") {
    val d = df("p DOUBLE, q DOUBLE", Seq(
      Row(1.25, 10.0), Row(2.50, 20.0), Row(null, 99.0), Row(3.75, 30.0)))
    val r = Profile.corrMatrix(d, Seq("p", "q"), decimals = Map("p" -> 2)).head()
    assert(r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("vocabulary ranks by frequency with lexicographic ties and coverage") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the cat sat"), Row(2L, "the dog SAT"), Row(3L, "THE the")))
    // counts: the=4, sat=2, cat=1, dog=1 (total 8)
    val v = TextAnalysis.vocabulary(d, "doc_id", "text", topV = 3)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
    assert(v.toSeq == Seq(
      (1L, "the", 4L, 3L, 0.5),
      (2L, "sat", 2L, 2L, 0.75),
      (3L, "cat", 1L, 1L, 0.875)))
  }

  test("vocabulary ignores empty-token artifacts and respects topV cut") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "  a  b   a "), Row(2L, ""), Row(3L, "   ")))
    val v = TextAnalysis.vocabulary(d, "doc_id", "text", topV = 1)
    assert(v.count() == 1)
    val top = v.head()
    assert(top.getString(1) == "a" && top.getLong(2) == 2L)
    assert(top.getDouble(4) == 2.0 / 3.0)
  }

  test("editDistanceJoin finds all pairs within the threshold (vs brute)") {
    val words = Seq("kitten", "sitten", "sitting", "mitten", "cat", "cart",
      "care", "bare", "band", "bend", "", "a", "ab")
    val l = df("w STRING", words.map(Row(_)))
    val r = df("v STRING", words.map(Row(_)))
    val got = Similarity.editDistanceJoin(l, "w", r, "v", maxDist = 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- words; b <- words
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd.toLong)).toSet
    assert(got == want)
  }

  test("editDistanceJoin candidate volume stays within the pigeonhole bound") {
    // expansion per left string is at most (τ+1)(2τ+1)² probes; verify the
    // join emits each qualifying pair exactly once (distinct-ed)
    val l = df("w STRING", Seq(Row("aaaa")))
    val r = df("v STRING", Seq(Row("aaab")))
    val got = Similarity.editDistanceJoin(l, "w", r, "v", maxDist = 2)
      .collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("collocations computes adjacent-bigram PMI over the corpus") {
    val d = df("text STRING", Seq(Row("a b a b"), Row("a b")))
    val out = TextAnalysis.collocations(d, "text", minPairCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // unigrams a:3 b:3 (N1=6); bigrams (a,b):3 (b,a):1 (N2=4)
    // PMI(a,b) = ln((3/4)/(1/4)) = ln 3; PMI(b,a) = ln 1 = 0
    assert(out(("a", "b")) == ((3L, 3L, 3L, 1098612L)))
    assert(out(("b", "a")) == ((1L, 3L, 3L, 0L)))
    assert(out.size == 2)
  }

  test("collocations normalizes case/whitespace and applies the threshold") {
    val d = df("text STRING",
      Seq(Row("  Foo   BAR  "), Row("foo bar"), Row(null), Row("solo")))
    val out = TextAnalysis.collocations(d, "text", minPairCount = 2L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "foo" && out.head.getString(1) == "bar")
    assert(out.head.getLong(2) == 2L)
  }

  test("collocations entry fixture preserves its ppm hash guard band") {
    // same discipline as the BM25/TF-IDF guard-band tests: every raw
    // 1e6·pmi value must sit far from a .5 rounding boundary relative to
    // the ~1e-9 drift a 1-ulp ln() difference can cause, so the driver
    // hash of q_collocations cannot flip on an engine's libm.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => t =!= "")
    val base = docs.select(toks.as("__t"))
    val bigrams = base.filter(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c2 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))
    val uni = base.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
    val n1 = uni.agg(sum(col("__cu")).as("n1"))
    val n2 = c2.agg(sum(col("pair_n")).as("n2"))
    val raw = c2.filter(col("pair_n") >= 10)
      .join(uni.select(col("__w").as("w1"), col("__cu").as("n_w1")),
        Seq("w1"))
      .join(uni.select(col("__w").as("w2"), col("__cu").as("n_w2")),
        Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select((lit(1000000.0) * log(
        (col("pair_n").cast("double") / col("n2"))
          / (col("n_w1").cast("double") / col("n1")
            * (col("n_w2").cast("double") / col("n1"))))).as("raw"))
    val margin = raw
      .select(min(abs(col("raw") - floor(col("raw")) - lit(0.5))).as("m"))
      .head().getDouble(0)
    // 1-ulp ln drift is ~1e-9 on this magnitude; demand 1e5× headroom
    assert(margin > 1e-4,
      f"collocation ppm margin $margin%.2e too tight for the hash gate")
  }

  test("ksDrift is integer-exact: hand case, identity, empty side") {
    def d(vs: Long*) = df("c BIGINT", vs.map(Row(_)))
    val r = Profile.ksDrift(d(1L, 2L, 3L), d(3L, 4L, 5L), "c")
      .collect().head
    // D peaks at 2/3 (after v=2: F_base=2/3, F_cur=0): num = 6 of 9
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    // ks_num is the once-rounded double of the exact decimal cross sum
    assert(r.getDouble(2) == 6.0 && r.getLong(3) == 666667L)
    val same = Profile.ksDrift(d(1L, 2L, 2L), d(2L, 1L, 2L), "c")
      .collect().head
    assert(same.getDouble(2) == 0.0 && same.getLong(3) == 0L)
    assert(Profile.ksDrift(d(), d(1L), "c").count() == 0)
  }

  test("packingReport accounts every bin's fill and waste") {
    val docs = df("id BIGINT, len BIGINT", Seq(
      Row(0L, 6L), Row(2L, 3L), Row(4L, 5L))) // one shard, budget 8
    val packed = Pack.packGreedyNextFit(docs, "id", "len",
      budget = 8L, numShards = 2)
    val rep = Pack.packingReport(packed, docs, "id", "len", 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // shard 0 in id order: 6 -> bin0; 3 doesn't fit -> bin1; 5 fits
    // with 3 (8) -> bin1
    assert(rep((0L, 0L)) == ((1L, 6L, 2L, 750000L)))
    assert(rep((0L, 1L)) == ((2L, 8L, 0L, 1000000L)))
    // totals reconcile: used sums to the corpus length
    assert(rep.values.map(_._2).sum == 14L)
  }

  test("ksDriftByGroup: per-key statistic, one-sided keys dropped") {
    val base = df("g STRING, c BIGINT", Seq(
      Row("x", 1L), Row("x", 2L), Row("x", 3L), // vs disjoint
      Row("y", 5L), Row("y", 5L), // vs identical
      Row("only", 9L)))
    val cur = df("g STRING, c BIGINT", Seq(
      Row("x", 3L), Row("x", 4L), Row("x", 5L),
      Row("y", 5L), Row("y", 5L)))
    val out = Profile.ksDriftByGroup(base, cur, Seq("g"), "c")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getLong(4))).toMap
    assert(out("x") == ((6.0, 666667L)))
    assert(out("y") == ((0.0, 0L)))
    assert(!out.contains("only"))
  }

  test("blocklist gate drops matching docs; report stays observable") {
    val d = df("id BIGINT, text STRING", Seq(
      Row(1L, "clean words only"),
      Row(2L, "the BAD word"),
      Row(3L, "bad bad again"),
      Row(4L, null)))
    val kept = TextAnalysis.dropBlocklisted(d, "text", Seq("bad"))
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L)) // null text passes the gate
    val rep = TextAnalysis.blocklistReport(
      d, "text", Seq("bad", "absent"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rep("bad") == ((2L, 3L))) // 2 docs, 3 token occurrences
    assert(rep("absent") == ((0L, 0L)))
  }

  test("setOverlapMatrix computes exact Jaccard/containment per pair") {
    val d = df("l STRING, e BIGINT", Seq(
      Row("A", 1L), Row("A", 2L), Row("A", 3L), Row("A", 3L), // dup
      Row("B", 2L), Row("B", 3L), Row("B", 4L),
      Row("C", 9L))) // disjoint: no row against A or B
    val out = Similarity.setOverlapMatrix(d, col("l"), col("e"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(r.getLong(5) == 500000L) // 2 / (3+3-2)
    assert(r.getLong(6) == 666667L) // 2 / 3
  }

  test("benfordAudit emits all nine digits with exact ppm shares") {
    val d = df("v DOUBLE", Seq(
      Row(1.0), Row(1.5), Row(-2.0), // |.|: digits 1, 1, 2
      Row(0.0), Row(null))) // excluded
    val out = Quality.benfordAudit(d, col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.size == 9)
    assert(out(1L) == ((2L, 666667L, 301030L, 365637L)))
    assert(out(2L) == ((1L, 333333L, 176091L, 157242L)))
    (3L to 9L).foreach { dgt =>
      val (n, share, ben, dev) = out(dgt)
      assert(n == 0L && share == 0L && dev == -ben)
    }
    // the Benford table itself sums to exactly one million ppm
    assert(out.values.map(_._3).sum == 1000000L)
  }

  test("benfordAudit reads the leading digit from the cents grid") {
    // 0.95 -> 95 cents -> digit 9 (not 0.95's integer part)
    val d = df("v DOUBLE", Seq(Row(0.95)))
    val out = Quality.benfordAudit(d, col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(9L) == 1L && out(1L) == 0L)
  }
}
