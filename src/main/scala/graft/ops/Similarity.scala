package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — embarrassingly parallel, no corpus shuffle. The
  * LSH path buckets the corpus by random-hyperplane signs so each probe
  * touches only matching buckets; bucket construction is a single narrow
  * pass and the bucket join shuffles only bucket keys.
  */
object Similarity {

  /** dot(a, b) via the codegen'd [[graft.plans.DotProduct]] expression —
    * no UDF, no serialization hop, and unlike the previous higher-order
    * `aggregate(zip_with(...))` formulation it keeps the projection inside
    * whole-stage codegen with one primitive loop per pair. Null semantics
    * match the HOF fold exactly (NULL on null input/element or length
    * mismatch). Numerics: bit-identical to the HOF fold for
    * `ARRAY<DOUBLE>` inputs (same index-order IEEE sum). For raw
    * `ARRAY<FLOAT>` inputs the kernel widens each element to double
    * BEFORE multiplying (identical to casting the arrays to
    * `array<double>` first, which is what every internal call site does),
    * whereas the old HOF multiplied in float precision and then widened —
    * the two can differ in the last ulp of a product. The float path is
    * parity-tested against the cast-first formulation, not the old HOF. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.graftshim.ColumnShim.expression(a),
        org.apache.spark.sql.graftshim.ColumnShim.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (baseline).
    * Queries are broadcast; the corpus is scanned once; per-query top-k via
    * window over (query, sim desc) with deterministic id tie-break.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv")
    )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv")
    )
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn(
        "cosine",
        cosine(col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane: hash(dim index, plane index)
    * mapped to ±1 — keeps the plane matrix out of the driver entirely.
    */
  private def planeSign(plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(plane), dimIdx), lit(2)) === 0, lit(1.0d))
      .otherwise(lit(-1.0d))

  /** LSH bucket signature: sign pattern of `numPlanes` pseudo-random
    * hyperplane projections, packed into a long.
    */
  def lshSignature(vecCol: Column, numPlanes: Int): Column =
    lshSignatureFrom(vecCol, 0, numPlanes)

  /** Signature over the plane family [firstPlane, firstPlane + numPlanes) —
    * disjoint offsets give independent hash bands. One codegen'd kernel
    * ([[graft.plans.LshSignature]]) replacing numPlanes interpreted HOF
    * folds per row; bit-identical output (parity pinned by
    * LshSignatureSpec against [[lshSignatureHof]]).
    */
  def lshSignatureFrom(vecCol: Column, firstPlane: Int, numPlanes: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.LshSignature(
        org.apache.spark.sql.graftshim.ColumnShim.expression(vecCol),
        firstPlane, numPlanes))

  /** The original higher-order formulation — numPlanes separate
    * aggregate(zip_with) folds, each re-walking the vector with an
    * interpreted lambda. Kept (test-only) as the parity reference the
    * codegen kernel is pinned against. */
  private[graft] def lshSignatureHof(
      vecCol: Column, firstPlane: Int, numPlanes: Int): Column = {
    require(numPlanes > 0 && numPlanes <= 63, "numPlanes must be in [1, 63]")
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(
          vecCol.cast("array<double>"),
          sequence(lit(0), size(vecCol) - 1),
          (x, i) => x * planeSign(firstPlane + p, i)
        ),
        lit(0.0d),
        (acc, x) => acc + x
      )
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-probe plane order over [firstPlane, firstPlane + numPlanes) —
    * ARRAY<INT> of plane indices sorted by |projection| ascending, via the
    * codegen'd [[graft.plans.LshProbeOrder]] kernel (the query-side
    * companion of [[lshSignatureFrom]]). */
  def lshProbeOrderFrom(
      vecCol: Column, firstPlane: Int, numPlanes: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.plans.LshProbeOrder(
        org.apache.spark.sql.graftshim.ColumnShim.expression(vecCol),
        firstPlane, numPlanes))

  /** The original higher-order probe-order formulation — numPlanes
    * aggregate(zip_with) folds plus an array_sort/transform pair, all
    * interpreted. Kept (test-only) as the parity reference the codegen
    * kernel is pinned against. */
  private[graft] def lshProbeOrderHof(
      vecCol: Column, firstPlane: Int, numPlanes: Int): Column = {
    require(numPlanes > 0 && numPlanes <= 63, "numPlanes must be in [1, 63]")
    val projArr = array((0 until numPlanes).map { p =>
      aggregate(
        zip_with(
          vecCol.cast("array<double>"),
          sequence(lit(0), size(vecCol) - 1),
          (x, i) => x * planeSign(firstPlane + p, i)
        ),
        lit(0.0d),
        (acc, x) => acc + x
      )
    }: _*)
    transform(
      array_sort(zip_with(
        projArr,
        sequence(lit(0), lit(numPlanes - 1)),
        (x, p) => struct(abs(x).as("m"), p.as("p")))),
      s => s.getField("p"))
  }

  /** ANN top-k via random-hyperplane LSH: `numTables` independent hash
    * tables (disjoint plane families), each searched with query-directed
    * multi-probe (Lv et al., VLDB'07 — after the original bucket, flip the
    * signature bits with the smallest hyperplane margin |proj|, the buckets
    * a near neighbor most likely fell into). Candidates are verified by
    * exact cosine; recall@10 on the embeddings fixture moved 0.105 → ≥0.9
    * from the single-table fixed-bit-flip design at the same verify cost
    * class. Falls back to fewer results when the probed buckets lack k
    * members — raise numProbes/numTables for recall.
    *
    * Scale shape: per-table bucket sizes are held ~constant by the auto
    * plane count, so each query touches ~numTables·numProbes·32 candidates
    * regardless of corpus size; the corpus side carries numTables rows per
    * vector through ONE equi-join on (table, bucket).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 0,
      numProbes: Int = 8,
      numTables: Int = 4
  ): DataFrame = {
    require(numProbes >= 1 && numTables >= 1)
    // numPlanes <= 0 = auto: size buckets to ~32 corpus vectors, the same
    // auto-sizing discipline as SemDeDup's nlist — candidate volume per
    // probe stays constant as the corpus grows. The row count comes from
    // Catalyst plan STATISTICS (no job — at 100 TB a count() is a full
    // scan), assuming ~256 B/row (embedding arrays dominate); a factor-k
    // width error shifts the plane count by log2(k), i.e. bucket sizes
    // stay within a small constant of the target, which recall tolerates.
    // count() remains the fallback when the plan carries no usable stats.
    val planes =
      if (numPlanes > 0) numPlanes
      else {
        val sz = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
        val approxRows =
          if (sz > 0 && sz < BigInt(Long.MaxValue) / 4) (sz / 256).toLong
          else corpus.count()
        // the byte-based estimate runs high (encoding overhead), so the
        // estimate path targets ~64-vector buckets — erring toward LARGER
        // buckets trades linear verify work for recall, the right side of
        // the trade for a dedup/retrieval engine
        math.min(20, math.max(4,
          math.ceil(math.log(math.max(approxRows, 2L) / 64.0)
            / math.log(2)).toInt))
      }
    val effProbes = math.min(numProbes, planes + 1)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"),
      explode(array((0 until numTables).map { tb =>
        struct(lit(tb).as("t"),
          lshSignatureFrom(col(vecCol), tb * planes, planes).as("b"))
      }: _*)).as("__e")
    ).select(col("neighbor_id"), col("__cv"),
      col("__e.t").as("__tbl"), col("__e.b").as("__bucket"))
    def probesFor(tb: Int): Seq[Column] = {
      val first = tb * planes
      val sig = lshSignatureFrom(col(vecCol), first, planes)
      // plane indices of this table, ordered by |margin| ascending — one
      // codegen kernel (graft.plans.LshProbeOrder) instead of `planes`
      // interpreted aggregate(zip_with) folds + an array_sort/transform
      // lambda pair per table (parity pinned in LshSignatureSpec against
      // the retained HOF formulation lshProbeOrderHof)
      val order = lshProbeOrderFrom(col(vecCol), first, planes)
      (0 until effProbes).map { j =>
        val b =
          if (j == 0) sig
          else sig.bitwiseXOR(
            pow(lit(2.0), element_at(order, j).cast("double")).cast("long"))
        struct(lit(tb).as("t"), b.as("b"))
      }
    }
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      explode(array((0 until numTables).flatMap(probesFor): _*)).as("__e")
    ).select(col("query_id"), col("__qv"),
      col("__e.t").as("__tbl"), col("__e.b").as("__bucket"))
    val scored = c
      .join(broadcast(q), Seq("__tbl", "__bucket"))
      .withColumn(
        "cosine",
        cosine(col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** IVF (inverted-file) ANN: corpus bucketed by nearest of `nlist`
    * deterministic sample centroids; each query probes its `nprobe` nearest
    * centroid buckets and verifies exact cosine inside them.
    *
    * Scale path: centroid assignment is one narrow mapPartitions over the
    * corpus (nlist small dot products per row, centroids broadcast by
    * closure); the probe join shuffles only on centroid id, so each query
    * touches ~nprobe/nlist of the corpus. A k-means refinement would drop in
    * where the centroid sample is taken.
    */
  /** Spherical k-means (Lloyd) refinement of IVF centroids: `iterations`
    * rounds of assign-to-nearest (narrow per-partition pass, centroids in
    * the task closure) followed by a per-cell mean. The mean is computed by
    * `posexplode` over vector components + one `groupBy(cell, dim)` sum —
    * map-side combined, a single shuffle of nlist·dim running sums per
    * round, nothing per-row ever collected. Only the nlist·dim centroid
    * matrix itself returns to the driver.
    */
  def kMeansCentroids(
      corpus: DataFrame,
      vecCol: String,
      init: Array[Array[Double]],
      iterations: Int
  ): Array[Array[Double]] = {
    var centroids = init.map(normalized)
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .filter(size(col("__v")) > 0)
      .as[Seq[Double]]
    (0 until iterations).foreach { _ =>
      val cs = centroids // stable reference for the closure
      val sums = vecs
        .map(v => (nearestIdx(cs, v.toArray), v))
        .toDF("__cell", "__v")
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(col("__x")).as("__s"))
        .collect()
      val dim = centroids.head.length
      val acc = Array.fill(centroids.length)(new Array[Double](dim))
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        if (c >= 0 && c < acc.length && d < dim) acc(c)(d) = r.getDouble(2)
      }
      // empty cells keep their previous centroid (standard Lloyd fallback)
      centroids = acc.zip(centroids).map { case (s, prev) =>
        if (s.forall(_ == 0.0)) prev else normalized(s)
      }
    }
    centroids
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  /** Nearest centroid by dot product (centroids pre-normalized). */
  private def nearestIdx(cs: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val cen = cs(c)
      var dot = 0.0; var i = 0
      val len = math.min(v.length, cen.length)
      while (i < len) { dot += v(i) * cen(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      refineIterations: Int = 0,
      // multiple assignment (Jégou et al.): index each corpus vector in its
      // `assignReplicas` nearest cells — a boundary-vector's cell no longer
      // has to be among the query's nprobe probes for it to be found.
      // Index size scales by the replica count; recall@10 on the embeddings
      // fixture moved 0.635 -> ~0.9 at nprobe=4 for replicas 1 -> 2.
      assignReplicas: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    require(nprobe >= 1 && nprobe <= nlist)
    // deterministic centroid sample: nlist corpus vectors with the smallest
    // xxhash64(id) — stable, data-independent of vector values; optionally
    // refined by spherical k-means
    val sampled: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sampled.nonEmpty, "empty corpus")
    val centroids =
      if (refineIterations > 0)
        kMeansCentroids(corpus, vecCol, sampled, refineIterations)
      else sampled

    def nearest(v: Array[Double], n: Int): Array[Int] = {
      val sims = centroids.zipWithIndex.map { case (c, i) =>
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        var j = 0
        val len = math.min(v.length, c.length)
        while (j < len) { dot += v(j) * c(j); nv += v(j) * v(j); nc += c(j) * c(j); j += 1 }
        (if (nv == 0 || nc == 0) -1.0 else dot / math.sqrt(nv * nc), i)
      }
      sims.sortBy(-_._1).take(n).map(_._2)
    }

    // vec columns are cast to array<double> before assign, so the row read
    // is type-agnostic (float or double embeddings both work)
    def assign(df: DataFrame, vc: String, outCol: String, n: Int): DataFrame = {
      val schema = StructType(df.schema.fields :+
        StructField(outCol, ArrayType(IntegerType, false), false))
      val vIdx = df.schema.fieldIndex(vc)
      df.mapPartitions { rows =>
        rows.map { r =>
          val v = r.getSeq[Double](vIdx).toArray
          Row.fromSeq(r.toSeq :+ nearest(v, n).toSeq)
        }
      }(Encoders.row(schema))
    }

    val bucketed = assign(
      corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv")),
      "__cv", "__cells", math.max(1, math.min(assignReplicas, nlist))
    ).withColumn("__cell", explode(col("__cells"))).drop("__cells")
    val probed = assign(
      queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv")),
      "__qv", "__cells", nprobe
    ).withColumn("__cell", explode(col("__cells"))).drop("__cells")

    val scored = bucketed
      .join(broadcast(probed), "__cell")
      .withColumn(
        "cosine",
        cosine(col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, verified exactly.
    *
    * Candidates come from `bands` independent random-hyperplane signature
    * families (union of bands — multi-band recall like MinHash banding): a
    * pair at cosine c collides in one band with probability
    * (1 − arccos(c)/π)^numPlanes, so its miss probability is
    * (1 − p_band)^bands. The defaults (8 planes × 4 bands) put a c = 0.99
    * near-dup's miss at ~0.9%; the old 12 × 2 left it at ~18%, measured as
    * a 21% pair miss on the sf1 perturbed-copy fixture. Exactly-collinear
    * duplicates share every signature, so they are found with probability 1;
    * pairs near the threshold retain the banded miss rate — approximate by
    * design on non-collinear near-dups.
    *
    * Scale path: a bucket over `maxBucketSize` is first SPLIT by
    * `splitPlanes` additional hyperplanes (near-identical vectors keep
    * colliding — a split never separates collinear dups); only sub-buckets
    * still over the cap — an irreducible set of (near-)identical vectors
    * whose true pair set is itself quadratic — are dropped, observable via
    * [[cosineDupDroppedBuckets]]. Bucket arrays are collected only after the
    * oversize keys are anti-joined out (Dedup.boundedBuckets), so no task
    * materializes an unbounded aggregation buffer, and pairs explode
    * in place (Dedup.pairsFromBuckets) — no self-join.
    */
  def cosineDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      numPlanes: Int = 8,
      bands: Int = 4,
      splitPlanes: Int = 10,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val routed = routedBuckets(base, numPlanes, bands, splitPlanes, maxBucketSize)
    val candidates = Dedup
      .pairsFromBuckets(
        Dedup.boundedBuckets(routed, Seq("__band", "__bkt"), col("__id"), maxBucketSize),
        "__ids")
      .distinct()
    candidates
      .join(base.select(col("__id").as("left_id"), col("__v").as("__vl")), "left_id")
      .join(base.select(col("__id").as("right_id"), col("__v").as("__vr")), "right_id")
      .withColumn(
        "cosine",
        cosine(col("__vl").cast("array<double>"), col("__vr").cast("array<double>"))
      )
      .filter(col("cosine") >= threshold)
      .select(col("left_id"), col("right_id"), col("cosine"))
  }

  /** The (band, bucket) keys cosineDupPairs drops even after splitting, with
    * sizes — each is a set of ≥ maxBucketSize near-identical vectors.
    */
  def cosineDupDroppedBuckets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 8,
      bands: Int = 4,
      splitPlanes: Int = 10,
      maxBucketSize: Int = 10000
  ): DataFrame =
    Dedup.oversizedBucketKeys(
      routedBuckets(
        df.select(col(idCol).as("__id"), col(vecCol).as("__v")),
        numPlanes, bands, splitPlanes, maxBucketSize),
      Seq("__band", "__bkt"),
      maxBucketSize)

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic dedup of an
    * embedding corpus — cluster with spherical k-means (deterministic
    * hash-sampled init, optionally Lloyd-refined, as in [[ivfTopK]]), then
    * inside each cluster drop every vector that has a SMALLER-id vector
    * within cosine `threshold`. (The deterministic one-pass keep rule; the
    * paper's greedy per-cluster sweep differs only on chains a~b~c with
    * a≁c, where this rule is strictly more aggressive.) Returns the
    * surviving corpus rows.
    *
    * Scale shape: centroid refinement moves only nlist·dim partial sums to
    * the driver; assignment is a narrow mapPartitions against broadcast
    * centroids; within-cluster pair generation follows the
    * [[cosineDupPairs]] discipline — oversized clusters are SPLIT by extra
    * hyperplanes first (collinear duplicates keep colliding, so exact
    * duplicates are never lost to a split), member arrays are collected
    * only after oversize keys are anti-joined out, pairs explode in place,
    * and every candidate is verified with the exact cosine. Only
    * irreducible near-identical sets larger than `maxBucketSize` are
    * dropped from PAIR GENERATION (their members then all survive —
    * conservative), observably via the same bucket diagnostics.
    *
    * `probes` (default 0 = off) is the RECALL-PRESERVING opt-in for the
    * adaptive split: each vector in a split cell is additionally assigned
    * to the `probes` neighbor sub-buckets reached by flipping its least
    * confident signature bits (smallest |projection| first, the
    * [[lshProbeOrderFrom]] order restricted to the cell's active planes) —
    * classic multi-probe LSH on the split signature. A near-threshold
    * pair separated by ONE disagreeing plane is recovered whenever either
    * member probes that plane, and the disagreeing plane is, with high
    * probability, a low-|projection| one for at least one member (a big
    * margin on both sides means the pair's angle rarely crosses the
    * plane). Collinear duplicates never needed it (bit-equal signatures).
    * Cost, stated for capacity planning: bucket-grouping shuffle bytes and
    * per-bucket membership grow by ≤ (probes+1)× FOR SPLIT CELLS ONLY
    * (unsplit cells are untouched), and the within-bucket verify loop is
    * quadratic in membership, so verify work grows ≤ (probes+1)². The
    * `maxBucketSize` cap counts probed membership — but a bucket pushed
    * over the cap ONLY by probe copies is trimmed back to its base
    * membership rather than dropped (probe rows removed; the trim is
    * fused into the count-before-collect pass bounded bucketing runs
    * anyway, so the probed plan has the same exchange count as
    * probes = 0), so the bucket drops are EXACTLY the buckets
    * probes = 0 would drop and the probes = 0 drop set is a true lower
    * bound. Dropped-id duplicates across probed buckets
    * collapse in the existing distinct; pair semantics are unchanged
    * (every candidate still exact-cosine verified), so probing can only
    * ADD true drops, never a false one.
    *
    * `maxBucketBytes` (default 0 = off) derives the bucket cap from a
    * byte budget at the corpus's ACTUAL embedding width — effective cap
    * = min(maxBucketSize, max(16, maxBucketBytes / (8·dim))) — the
    * [[graft.plans.EarlierNeighborIds]] sizing rule lifted into the API:
    * one bucket struct is ~8·dim bytes and the bucket-grouping
    * collect_list buffer holds a full bucket per in-flight key, so a
    * row-count cap alone lets per-bucket memory scale with dim (the
    * default 10000-row cap is ~80 MB per bucket at dim 1000 but ~320 MB
    * at dim 4096). With a byte budget the memory profile is
    * dim-independent and large-dim users stop hand-deriving the cap.
    */
  def semDeDup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nlist: Int = 16,
      refineIterations: Int = 2,
      splitPlanes: Int = 10,
      maxBucketSize: Int = 10000,
      probes: Int = 0,
      maxBucketBytes: Long = 0L
  ): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // cast once up front so every row read below is type-agnostic
    // (float or double embeddings both work). Persisted: read by the
    // auto-nlist count, the centroid sample, each k-means refinement
    // pass, the cell assignment, and both sides of the verify join —
    // without the cache every one of those re-evaluates the caller's
    // upstream (scan + any rebalance) per job. Deliberately NOT
    // unpersisted here (lazy result; harnesses clear caches between
    // queries).
    val base = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .persist()
    // nlist <= 0 requests AUTO sizing: within-cell pairing is quadratic in
    // cell size, so a FIXED nlist makes candidate volume grow as n²/nlist
    // (measured 8-11× wall-clock at a 10× corpus). Auto targets a constant
    // ~250-vector cell — pair volume then grows LINEARLY in n — clamped to
    // [16, 4096]; past the clamp the oversize-cell hyperplane split below
    // takes over as the scale path (cells above maxBucketSize re-bucket by
    // signature), so no regime pairs a cell quadratically unbounded.
    // Row count for auto-sizing comes from Catalyst plan statistics, the
    // same no-job discipline as the LSH plane sizing above — at 100 TB an
    // unconditional count() is a full scan just to pick a cell count. The
    // byte estimate assumes ~256 B/row (embedding arrays dominate); a
    // factor-k error moves nlist by the same factor inside the [16, 4096]
    // clamp, which only shifts cell sizes around the ~250 target — the
    // oversize-cell hyperplane split still bounds the quadratic regime.
    // count() (on the persisted base) remains the fallback when the plan
    // carries no usable stats.
    val nlistEff =
      if (nlist > 0) nlist
      else {
        val sz = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
        val approxRows =
          if (sz > 0 && sz < BigInt(Long.MaxValue) / 4) (sz / 256).toLong
          else base.count()
        math.max(16, math.min(4096, (approxRows / 250L).toInt))
      }
    val sampled: Array[Array[Double]] = base
      .select(col("__id"), col("__v").as("__vd"))
      .withColumn("__h", xxhash64(col("__id")))
      .orderBy(col("__h"))
      .limit(nlistEff)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sampled.nonEmpty, "empty corpus")
    val centroids =
      if (refineIterations > 0)
        kMeansCentroids(base.select(col("__v").as("__kv")), "__kv",
          sampled, refineIterations)
      else sampled
    // Byte-budget cap (scaladoc): dim is known for free here — the
    // centroid sample already crossed the driver — so the derivation
    // costs no job. Floored at 16: a budget below 16 structs degenerates
    // to drop-every-bucket, which silently disables the operator.
    val capEff =
      if (maxBucketBytes <= 0L) maxBucketSize
      else {
        val dim = math.max(1, centroids(0).length)
        math.min(maxBucketSize.toLong,
          math.max(16L, maxBucketBytes / (8L * dim))).toInt
      }
    def nearestCell(v: Array[Double]): Int = {
      var best = 0; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val cen = centroids(c)
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        var i = 0
        val len = math.min(v.length, cen.length)
        while (i < len) {
          dot += v(i) * cen(i); nv += v(i) * v(i); nc += cen(i) * cen(i); i += 1
        }
        val sim = if (nv == 0 || nc == 0) -1.0 else dot / math.sqrt(nv * nc)
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      best
    }
    val schema = StructType(base.schema.fields :+
      StructField("__cell", IntegerType, false))
    val vIdx = base.schema.fieldIndex("__v")
    val celled = base.mapPartitions { rows =>
      rows.map { r =>
        val v = r.getSeq[Double](vIdx).toArray
        Row.fromSeq(r.toSeq :+ nearestCell(v))
      }
    }(Encoders.row(schema)).persist()
    // Oversized cells switch to (cell, hyperplane-signature) sub-buckets;
    // collinear duplicates share every signature bit, so a split never
    // loses them. The split is ADAPTIVE: any cell above 4× the ~250-row
    // design target splits with JUST ENOUGH planes to restore the target
    // (p = ceil(log2(n / target)), capped at splitPlanes). A fixed
    // threshold left a dead zone once auto-nlist hit its 4096 clamp
    // (cells grew with the corpus until the old 10000-row trigger, so
    // pair volume grew as n²/nlist — the sf100 spot-check measured that
    // regime at >63 GB of verify-join spill, SCALING.md round 14). Each
    // extra plane costs recall only for pairs NEAR the threshold
    // (P[same bit | cos 0.95] ≈ 0.9 per plane) and nothing for the
    // collinear/exact duplicates the operator targets.
    val targetCell = 250
    val over = celled
      .groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 4L * targetCell || col("__n") > capEff)
      .select(col("__cell"),
        // Clamped to [1, splitPlanes]: a cell can enter this set with
        // n <= targetCell when the cap < 4*targetCell, where
        // ceil(log2(n/target)) <= 0 would build an empty bit mask (no
        // split at all) and boundedBuckets would then silently drop the
        // still-oversized bucket. One plane is the minimum useful split.
        greatest(lit(1),
          least(lit(splitPlanes),
            ceil(log(2.0, col("__n").cast("double") / targetCell)).cast("int")))
          .as("__p"))
    val joined = celled.join(broadcast(over), Seq("__cell"), "left")
    val maskedSig = lshSignatureFrom(col("__v"), 0, splitPlanes)
      .bitwiseAND(expr("shiftleft(1L, __p) - 1L"))
    // Verify WITHIN the bucket row (plans/VerifyExpr.scala): buckets carry
    // (id, vector) structs and a codegen'd kernel emits the dropped ids
    // directly — no pair materialization, no pair shuffle, no re-attach
    // joins. The only exchange in the verify stage is the bucket grouping
    // itself; everything after it is narrow. At probes = 0 membership is
    // single-bucket (one cell, one signature), so pairs cannot repeat
    // across buckets; with probing a pair can co-occur in up to two
    // buckets, and the dropped-id distinct below already collapses that.
    val buckets =
      if (probes <= 0)
        Dedup.boundedBuckets(
          joined.select(
            col("__id"), col("__v"),
            when(col("__p").isNotNull,
              concat_ws(":", col("__cell"), maskedSig))
              .otherwise(col("__cell").cast("string"))
              .as("__bkt")),
          Seq("__bkt"), struct(col("__id"), col("__v")), capEff)
      else {
        // Multi-probe (see scaladoc): in split cells, also land in the
        // `probes` sub-buckets reached by flipping the lowest-|projection|
        // ACTIVE planes (probe order is computed over all splitPlanes,
        // then restricted to the cell's [0, __p) range — the kernel takes
        // static plane counts, the active count is per-cell data). Flip
        // keys are distinct from the base by construction (xor of a live
        // bit), so a bucket holds each id at most once.
        val probePlanes = slice(
          filter(lshProbeOrderFrom(col("__v"), 0, splitPlanes),
            k => k < col("__p")),
          1, probes)
        val probeSigs = transform(probePlanes,
          k => maskedSig.bitwiseXOR(call_function("shiftleft", lit(1L), k)))
        // The base signature is element 0 of the exploded array, so the
        // position IS the probe flag — no struct packing needed.
        val probed = joined.select(
          col("__id"), col("__v"),
          posexplode(
            when(col("__p").isNotNull,
              transform(
                array_prepend(probeSigs, maskedSig),
                s => concat_ws(":", col("__cell"), s)))
              .otherwise(array(col("__cell").cast("string")))))
          .select(col("__id"), col("__v"), col("col").as("__bkt"),
            (col("pos") > 0).as("__probe"))
        // Near-cap monotonicity (ADVICE r15): probed membership counts
        // toward the cap, so a bucket under the cap at probes = 0 could
        // be pushed OVER it by probe copies alone and then be dropped
        // whole — losing drops the base run finds. Over-cap buckets are
        // therefore trimmed back to their BASE membership instead, and
        // only buckets whose base count exceeds the cap drop whole —
        // exactly the buckets probes = 0 drops — so the probes = 0 drop
        // set is a true lower bound and every surviving bucket stays
        // within the byte budget. The trim is FUSED into the
        // count-before-collect pass [[Dedup.boundedBuckets]] performs
        // anyway (one aggregation computes total AND base counts; one
        // broadcast of the pathological few over-cap keys marks both
        // "trim probes" and "drop whole"), so the probed plan has the
        // same exchange count as probes = 0. The skew-proof discipline
        // is preserved: counts first (no arrays), member arrays
        // collected only after the prune, every collect buffer ≤ cap.
        val stats = probed.groupBy(col("__bkt")).agg(
          count(lit(1)).as("__tot"),
          count(when(!col("__probe"), 1)).as("__base"))
        val marks = stats
          .filter(col("__tot") > capEff)
          .select(col("__bkt"), (col("__base") > capEff).as("__dropall"))
        probed
          .join(broadcast(marks), Seq("__bkt"), "left")
          .filter(col("__dropall").isNull ||
            (!col("__dropall") && !col("__probe")))
          .groupBy(col("__bkt"))
          .agg(sort_array(collect_list(struct(col("__id"), col("__v"))))
            .as("__ids"))
          .filter(size(col("__ids")) >= 2)
      }
    val dropped = buckets
      .select(explode(org.apache.spark.sql.graftshim.ColumnShim.column(
        graft.plans.EarlierNeighborIds(
          org.apache.spark.sql.graftshim.ColumnShim.expression(col("__ids")),
          threshold))).as("__did"))
      .distinct()
    corpus.join(dropped, corpus(idCol) <=> dropped("__did"), "left_anti")
  }

  /** Per-band bucket assignment with oversize splitting: rows carry a short
    * signature and a longer one; keys whose short-signature bucket exceeds
    * the cap (found by a count-only aggregation, broadcast back) switch to
    * the long signature.
    */
  private def routedBuckets(
      base: DataFrame,
      numPlanes: Int,
      bands: Int,
      splitPlanes: Int,
      maxBucketSize: Int
  ): DataFrame = {
    require(bands >= 1, "bands must be >= 1")
    val sigs = (0 until bands)
      .map { b =>
        // disjoint plane families per band and for the split refinement
        val off = b * (numPlanes + splitPlanes)
        base.select(
          col("__id"),
          lit(b).as("__band"),
          lshSignatureFrom(col("__v"), off, numPlanes).as("__s"),
          lshSignatureFrom(col("__v"), off + numPlanes, splitPlanes).as("__x"))
      }
      .reduce(_ unionByName _)
      // persisted: read for the oversize count, the routing join, and (via
      // routed) the bucket aggregation — the hyperplane projections are the
      // expensive part
      .persist()
    val over = sigs
      .groupBy(col("__band"), col("__s"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("__band"), col("__s"), lit(true).as("__over"))
    sigs
      .join(broadcast(over), Seq("__band", "__s"), "left")
      .select(
        col("__id"),
        col("__band"),
        when(col("__over").isNotNull,
          concat_ws(":", col("__s"), col("__x")))
          .otherwise(col("__s").cast("string"))
          .as("__bkt"))
  }

  /** Symmetric per-vector int8 quantization: `qscale = max_i |v_i|`,
    * `q_i = floor(v_i · 127 / qscale + 0.5)` (half-up, exact IEEE chain —
    * replayable in any engine), stored as `array<tinyint>`. 4× smaller
    * than float32 — at 100 TB of embeddings that is 4× less scan I/O,
    * broadcast size, and shuffle volume for every downstream ANN pass,
    * with the scale kept per vector for dequantization. An all-zero
    * vector quantizes to zeros with `qscale = 0`.
    *
    * Reference counterpart: none; the scheme is the standard symmetric
    * absmax int8 quantization used by every major inference runtime.
    */
  def quantizeInt8(
      df: DataFrame,
      vecCol: String,
      qvecCol: String = "qvec",
      scaleCol: String = "qscale"
  ): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn(scaleCol, array_max(transform(v, x => abs(x))))
      .withColumn(qvecCol,
        when(col(scaleCol) === 0d,
          transform(v, _ => lit(0).cast("tinyint")))
          .otherwise(transform(v,
            x => floor(x * lit(127.0) / col(scaleCol) + lit(0.5))
              .cast("tinyint"))))
  }

  /** Top-k neighbors ranked on the QUANTIZED integer dot product,
    * dequantized to an approximate float dot score
    * (`qdot · qscale_q · qscale_c / 127²`): the scale path where the
    * exact per-pair float dot is too expensive — the inner loop is an
    * int8 multiply-accumulate (`qdot` is exact integer arithmetic, so
    * ranking is partition-order-free; ties break on neighbor id).
    * Queries are broadcast, the corpus is scanned once, and per-query
    * top-k goes through the rank window Spark rewrites to
    * WindowGroupLimit (per-partition heap, no full per-query sort).
    */
  def quantizedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be positive")
    val q = quantizeInt8(
      queries.select(col(idCol).as("query_id"), col(vecCol)),
      vecCol, "__qq", "__qs")
      .select("query_id", "__qq", "__qs")
    val c = quantizeInt8(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol)),
      vecCol, "__cq", "__cs")
      .select("neighbor_id", "__cq", "__cs")
    val idot = aggregate(
      zip_with(col("__qq"), col("__cq"),
        (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("qdot", idot)
      .withColumn("score",
        (col("qdot").cast("double") * (col("__qs") * col("__cs")))
          / lit(16129.0))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select("query_id", "neighbor_id", "qdot", "score")
  }

  /** Edit-distance similarity join, PassJoin-style segment pigeonhole
    * (Li, Deng, Feng 2011). Returns (`leftCol`, `rightCol`, `dist`) for
    * every pair with `levenshtein <= maxDist`. Feed DISTINCT strings and
    * re-attach ids afterwards — candidate volume then scales with the
    * vocabulary, not the corpus.
    *
    * Pruning: each right string of length m splits into maxDist+1 even
    * segments; by pigeonhole, any left string within distance τ contains
    * at least one segment EXACTLY, starting within τ of the segment's
    * home position. The left side emits the substrings at those
    * positions for each candidate right length in [len-τ, len+τ]; the
    * candidate join is an equi-join on (segment index, substring, right
    * length) — selective keys, where a bare length band would shuffle
    * whole length classes together. Left expansion is bounded by
    * (τ+1)(2τ+1)²; candidates dedup on the pair before the exact verify,
    * which uses Spark's banded `levenshtein(_, _, threshold)` (O(τ·n)
    * per pair, not O(n²)). All codegen'd — no UDF anywhere.
    */
  def editDistanceJoin(
      left: DataFrame,
      leftCol: String,
      right: DataFrame,
      rightCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(leftCol != rightCol, "left and right column names must differ")
    val tau = maxDist
    val segs = tau + 1

    // right: (i, seg, m) per segment of each string
    val m = length(col(rightCol))
    val base = (m / segs).cast("int")
    val rem = (m % segs).cast("int")
    val rightSegs = right
      .select(col(rightCol))
      .withColumn("__i", explode(sequence(lit(0), lit(tau))))
      .withColumn("__m", m)
      .withColumn("__seg",
        col(rightCol).substr(
          col("__i") * base + least(col("__i"), rem) + lit(1),
          base + when(col("__i") < rem, 1).otherwise(0)))

    // left: probe substrings for each candidate right length and segment
    val llen = length(col(leftCol))
    val probes = left
      .select(col(leftCol))
      .withColumn("__m",
        explode(sequence(greatest(llen - tau, lit(0)), llen + tau)))
      .withColumn("__i", explode(sequence(lit(0), lit(tau))))
      .withColumn("__base", (col("__m") / segs).cast("int"))
      .withColumn("__rem", (col("__m") % segs).cast("int"))
      .withColumn("__slen",
        col("__base") + when(col("__i") < col("__rem"), 1).otherwise(0))
      .withColumn("__home",
        col("__i") * col("__base") + least(col("__i"), col("__rem")))
      .withColumn("__p",
        explode(when(
          least(col("__home") + tau, llen - col("__slen")) >=
            greatest(col("__home") - tau, lit(0)),
          sequence(greatest(col("__home") - tau, lit(0)),
            least(col("__home") + tau, llen - col("__slen"))))
          .otherwise(array().cast("array<int>"))))
      .withColumn("__seg",
        col(leftCol).substr(col("__p") + lit(1), col("__slen")))
      .select(col(leftCol), col("__m"), col("__i"), col("__seg"))

    probes
      .join(rightSegs, Seq("__m", "__i", "__seg"))
      .select(col(leftCol), col(rightCol))
      .distinct()
      .withColumn("dist",
        levenshtein(col(leftCol), col(rightCol), tau).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= tau)
  }

  /** Exact all-pairs document similarity over quantized TF-IDF vectors
    * with LOSSLESS prefix filtering (Bayardo, Ma & Srikant 2007, "Scaling
    * Up All Pairs Similarity Search"): every unordered pair whose cosine
    * reaches `threshold`, with no embedding model required.
    *
    * Number discipline, chosen so every emitted double replays bit-for-bit
    * on any engine: term weights are the ppm-rounded smoothed TF-IDF of
    * [[TextAnalysis.tfidfTopTerms]] (integers; the one `ln` is covered by
    * that entry's guard-band class); each document's weights are then
    * L2-normalized and re-quantized to integer ppm — the division and
    * `sqrt` are IEEE-correctly-rounded, so unlike `ln` they carry no libm
    * variance. Dot products and norms of the quantized vectors are EXACT
    * integer sums (accumulated in Decimal(38,0), immune to both overflow
    * and float ordering), and the final cosine is a fixed expression tree
    * of deterministic IEEE ops over those integers.
    *
    * Scale shape: candidates come from prefix filtering, not a doc-freq
    * cap — each document's terms are sorted by (quantized weight desc,
    * term), and a term is in the prefix while the REMAINING suffix still
    * has enough norm to reach `threshold` on its own (suffix² ≥ t²·norm²).
    * A qualifying pair must share a prefix term of at least one side
    * (sharing only suffix terms bounds cosine by the suffix norm fraction
    * < t), so joining prefix postings against full postings loses nothing;
    * tf-idf weighting pushes stopwords out of prefixes, keeping posting
    * fan-out to rare terms. The exact verify touches only candidates.
    * Everything is aggregations, windows, and equi-joins — no explosion
    * beyond the prefix postings join.
    */
  def tfidfCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val tok: Column => Column = c =>
      filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
        t => t =!= "")
    val base = df.select(col(idCol).as("__id"), tok(col(textCol)).as("__t"))
    val n = base.agg(count(lit(1)).as("__n"))
    // q feeds FIVE consumers (norms, prefix, full postings, both verify
    // legs) and w/tf two each — persist the shared stages or every reuse
    // re-scans the corpus (MEMORY_AND_DISK, so 100-TB postings spill,
    // never recompute)
    val tf = base
      .select(col("__id"), explode(col("__t")).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = tf
      .join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("__id"), col("term"),
        round(lit(1000000.0) * col("tf") *
            (log((col("__n").cast("double") + lit(1.0)) /
              (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0)), 0)
          .cast("long").as("w"))
      .filter(col("w") > 0)
      .persist()
    // exact raw norm² (w ≤ ~2^31 keeps w·w inside long; the SUM is decimal)
    val rawNorm = w.groupBy(col("__id"))
      .agg(sum((col("w") * col("w")).cast(dec)).as("__n2"))
    // unit-normalize and requantize to ppm: (1e6·w)/norm is a division of
    // exacts by a correctly-rounded sqrt — deterministic across engines
    val q = w
      .join(rawNorm, Seq("__id"))
      .select(col("__id"), col("term"),
        round(lit(1000000.0) * col("w").cast("double") /
            sqrt(col("__n2").cast("double")), 0)
          .cast("long").as("q"))
      .filter(col("q") > 0)
      .persist()
    val qNorm = q.groupBy(col("__id"))
      .agg(sum((col("q") * col("q")).cast(dec)).as("__qn2"))
      .persist()
    // prefix marking: sorted by weight, a term stays in the prefix while
    // the suffix STARTING AT IT could still reach t·‖d‖ alone
    val byWeight = Window.partitionBy(col("__id"))
      .orderBy(col("q").desc, col("term").asc)
    val prefix = q
      .join(qNorm, Seq("__id"))
      .withColumn("__cumBefore",
        coalesce(
          sum((col("q") * col("q")).cast(dec))
            .over(byWeight.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast(dec)))
      .filter(
        (col("__qn2") - col("__cumBefore")).cast("double") >=
          lit(threshold * threshold) * col("__qn2").cast("double"))
      .select(col("term"), col("__id").as("__pid"))
    val full = q.select(col("term"), col("__id").as("__fid"))
    val cand = prefix
      .join(full, Seq("term"))
      .filter(col("__pid") =!= col("__fid"))
      .select(
        least(col("__pid"), col("__fid")).as("left_id"),
        greatest(col("__pid"), col("__fid")).as("right_id"))
      .distinct()
    val ql = q.select(col("__id").as("left_id"), col("term"), col("q").as("__ql"))
    val qr = q.select(col("__id").as("right_id"), col("term"), col("q").as("__qr"))
    cand
      .join(ql, Seq("left_id"))
      .join(qr, Seq("right_id", "term"))
      .groupBy(col("left_id"), col("right_id"))
      .agg(sum((col("__ql") * col("__qr")).cast(dec)).as("__dot"))
      .join(qNorm.select(col("__id").as("left_id"), col("__qn2").as("__a2")),
        Seq("left_id"))
      .join(qNorm.select(col("__id").as("right_id"), col("__qn2").as("__b2")),
        Seq("right_id"))
      .withColumn("cosine",
        col("__dot").cast("double") /
          (sqrt(col("__a2").cast("double")) * sqrt(col("__b2").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select(col("left_id"), col("right_id"), col("cosine"))
  }

  /** Pairwise signature similarity from MinHash states
    * (`Incremental.minhashStates` rows: keys, hash_id, min_hash): for
    * every unordered key pair, the number of agreeing hash slots and
    * the implied Jaccard estimate n_match/numHashes as ppm. The
    * standing-index companion to [[setOverlapMatrix]]: the exact matrix
    * re-scans both element sets, this one reads only the
    * |keys|·numHashes state table — the point of maintaining the states
    * incrementally. Output size is |keys|²·numHashes/2 intermediate
    * rows — bounded by key cardinality, never by corpus size.
    */
  def signatureSimilarity(
      states: DataFrame,
      keyCol: String,
      numHashes: Int): DataFrame = {
    require(numHashes >= 1, "numHashes must be >= 1")
    val a = states.select(col(keyCol).as("key_a"),
      col("hash_id"), col("min_hash").as("__ha"))
    val b = states.select(col(keyCol).as("key_b"),
      col("hash_id"), col("min_hash").as("__hb"))
    a.join(b, Seq("hash_id"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(sum(when(col("__ha") === col("__hb"), lit(1L))
        .otherwise(lit(0L))).as("n_match"))
      .select(col("key_a"), col("key_b"), col("n_match"),
        round(lit(1000000.0) * col("n_match") / lit(numHashes))
          .cast("long").as("est_jaccard_ppm"))
  }

  /** Pairwise exact set overlap between labeled element sets: for every
    * unordered label pair (a < b), the Jaccard and containment of their
    * distinct-element sets as integer ppm. The audience-overlap /
    * cross-source-contamination matrix — e.g. how many users two event
    * streams share, or how many shingles two corpus sources share.
    *
    * Plan: one distinct on (label, element), then a self-equi-join on
    * the ELEMENT — the explosion per element is its label-degree
    * squared, bounded by the (small) label count, never by data volume;
    * the per-label sizes re-join on the label-pair table, which has at
    * most |labels|² rows. No label-side cross join, no collect.
    */
  def setOverlapMatrix(
      df: DataFrame,
      label: Column,
      element: Column): DataFrame = {
    // persisted: the distinct (label, element) set feeds the size
    // aggregate and both self-join legs — three scans uncached
    val b = df.filter(label.isNotNull && element.isNotNull)
      .select(label.as("label"), element.as("el")).distinct()
      .persist()
    val sizes = b.groupBy("label").agg(count(lit(1)).as("n"))
    val pairs = b.as("a")
      .join(b.as("b"),
        col("a.el") === col("b.el") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("label").as("label_a"), col("n").as("n_a")),
        Seq("label_a"))
      .join(sizes.select(col("label").as("label_b"), col("n").as("n_b")),
        Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(lit(1000000.0) * col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")))
          .cast("long").as("jaccard_ppm"),
        round(lit(1000000.0) * col("n_common")
          / least(col("n_a"), col("n_b")))
          .cast("long").as("containment_ppm"))
  }
}
