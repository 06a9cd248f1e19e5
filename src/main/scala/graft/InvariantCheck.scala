package graft

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Invariant-class correctness gate for the three LSH-cluster entries whose
  * DuckDB oracle replicas are intractable at the 10× fixture (the banded
  * bucket self-joins are quadratic in DuckDB: >70 GB of spill at sf1, see
  * SF1_CORRECTNESS.md). Instead of a row-for-row replica, every claim each
  * entry makes is re-derived through an INDEPENDENT formulation inside
  * Spark and checked exactly:
  *
  *  q_minhash_dedup  — emitted pairs are canonical (left < right, distinct),
  *                     every pair re-verifies against an exact 3-shingle
  *                     Jaccard computed via a DIFFERENT route (SQL array
  *                     expressions: split → sequence → array_distinct →
  *                     array_intersect, vs the operator's equi-join counts),
  *                     and the output restricted to copy-0 ids equals the
  *                     sf0.1 output — which the DuckDB oracle verified
  *                     exactly at sf0.1 (a copy-0 doc is byte-identical to
  *                     its sf0.1 original, so its signatures and buckets
  *                     are too; crowding can only EVICT pairs, making
  *                     equality a real bucket-integrity check).
  *  q_dedup_cluster  — the driver union-find components equal the
  *                     distributed Shiloach–Vishkin/hash-min path run on
  *                     the same pairs (smallGraphMaxEdges = -1 forces it);
  *                     every cluster representative is the minimum member
  *                     id; the entry's survivor set is exactly
  *                     {id : cluster(id) = id}; and |survivors| =
  *                     |docs| − |edge-incident nodes| + |components|.
  *  q_keep_best      — the kept set equals an independent argmax replica
  *                     (max(struct(score, −id)) per effective cluster —
  *                     max score, ties to min id, singletons self-keyed)
  *                     and has exactly one representative per effective
  *                     cluster.
  *
  * Usage: runMain graft.InvariantCheck <sfDir> [verifyOutDir]
  * When verifyOutDir is given, each entry's parquet dump from a prior
  * `graft.Verify` run must also equal the in-process recomputation (the
  * entries are deterministic). Exits nonzero on any FAIL. Wired into
  * `SELFCHECK_SF1=1 scripts/selfcheck.sh`.
  */
object InvariantCheck {
  private var failures = 0

  private def check(name: String, cond: Boolean, detail: => String): Unit = {
    if (cond) println(s"INVARIANT PASS $name: $detail")
    else { failures += 1; println(s"INVARIANT FAIL $name: $detail") }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val dumpDir = args.lift(1)
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val total = d.count()

    // the entry parameter set (q_minhash_dedup / q_dedup_cluster / q_keep_best)
    val pairs = Dedup.minHashPairs(d, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
      .persist()
    val nPairs = pairs.count()

    // ---------- q_minhash_dedup ----------
    val nonCanon = pairs.filter(col("left_id") >= col("right_id")).count()
    val dup = nPairs - pairs.select("left_id", "right_id").distinct().count()
    check("q_minhash_dedup canonical",
      nonCanon == 0 && dup == 0,
      s"$nPairs pairs, $nonCanon non-canonical, $dup duplicates")

    // independent exact-Jaccard replica via SQL array expressions
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val sh = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3), i =>
          concat_ws(" ",
            element_at(toks, i + 1),
            element_at(toks, i + 2),
            element_at(toks, i + 3))))
        .otherwise(array().cast("array<string>")))
    val docSh = d.select(col("doc_id"), sh.as("__sh")).persist()
    val reJac = pairs
      .join(docSh.select(col("doc_id").as("left_id"), col("__sh").as("__l")), "left_id")
      .join(docSh.select(col("doc_id").as("right_id"), col("__sh").as("__r")), "right_id")
      .withColumn("__j2",
        size(array_intersect(col("__l"), col("__r"))).cast("double") /
          size(array_union(col("__l"), col("__r"))))
    val badJac = reJac
      .filter(col("__j2") < 0.5 || abs(col("__j2") - col("jaccard")) > 1e-9)
      .count()
    check("q_minhash_dedup pair validity",
      badJac == 0,
      s"all $nPairs emitted pairs re-verify (independent array-expression " +
        s"Jaccard >= 0.5 and equal to the operator's), $badJac violations")
    docSh.unpersist()

    // copy-0 restriction equals the sf0.1 output (oracle-exact there)
    val dBase = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text")
    val maxDoc = dBase.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val basePairs = Dedup.minHashPairs(dBase, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
      .select("left_id", "right_id")
    val copy0 = pairs
      .filter(col("left_id") < maxDoc && col("right_id") < maxDoc)
      .select("left_id", "right_id")
    val missing = basePairs.exceptAll(copy0).count()
    val extra = copy0.exceptAll(basePairs).count()
    check("q_minhash_dedup copy-0 containment",
      missing == 0 && extra == 0,
      s"sf1 output restricted to copy-0 ids == sf0.1 oracle-exact output " +
        s"(${copy0.count()} pairs; $missing missing, $extra extra)")

    // ---------- q_minhash_staged ----------
    // the scratch-constrained staged mode claims exact result identity
    // with the single-pass run (same per-band hash family, exact verify,
    // distinct over the union) — checked here at sf1 scale, where band
    // groups genuinely overlap on the derived duplicate families
    val stagedPairs = Dedup.minHashPairs(d, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5,
      bandPasses = 4).select("left_id", "right_id")
    val singleLR = pairs.select("left_id", "right_id")
    val stMissing = singleLR.exceptAll(stagedPairs).count()
    val stExtra = stagedPairs.exceptAll(singleLR).count()
    check("q_minhash_staged identity",
      stMissing == 0 && stExtra == 0,
      s"bandPasses=4 output == single-pass output " +
        s"($stMissing missing, $stExtra extra)")

    // ---------- q_dedup_cluster ----------
    val ids = d.select("doc_id")
    val mapUF = Dedup.duplicateClusters(ids, pairs, "doc_id").persist()
    val mapSV = Dedup.duplicateClusters(ids, pairs, "doc_id",
      smallGraphMaxEdges = -1L).persist()
    val diffs = mapUF.exceptAll(mapSV).count() + mapSV.exceptAll(mapUF).count()
    check("q_dedup_cluster components cross-check",
      diffs == 0,
      s"driver union-find mapping == distributed hash-min mapping " +
        s"($total rows, $diffs diffs)")
    val badRep = mapUF.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("__m"))
      .filter(col("cluster_id") =!= col("__m")).count()
    check("q_dedup_cluster representative minimality",
      badRep == 0,
      s"every cluster_id is the min member id ($badRep violations)")
    val survivors = SparkEntry.queries("q_dedup_cluster")(spark, sfDir)
      .persist()
    val expectSurv = mapUF.filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")
    val sMissing = expectSurv.exceptAll(survivors).count()
    val sExtra = survivors.exceptAll(expectSurv).count()
    check("q_dedup_cluster survivor set",
      sMissing == 0 && sExtra == 0,
      s"entry output == {id : cluster(id) = id} ($sMissing missing, $sExtra extra)")
    val nodes = pairs.select(col("left_id").as("doc_id"))
      .unionByName(pairs.select(col("right_id").as("doc_id")))
      .distinct().count()
    val comps = mapUF
      .join(pairs.select(col("left_id").as("doc_id"))
        .unionByName(pairs.select(col("right_id").as("doc_id"))).distinct(),
        Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct().count()
    val nSurv = survivors.count()
    check("q_dedup_cluster count invariant",
      nSurv == total - nodes + comps,
      s"|survivors| $nSurv == |docs| $total - |incident nodes| $nodes " +
        s"+ |components| $comps")

    // ---------- q_keep_best ----------
    val kept = SparkEntry.queries("q_keep_best")(spark, sfDir).persist()
    val scored = graft.ops.TextAnalysis.qualityScore(d, "text", "__q")
      .select(col("doc_id"), col("__q"))
    // independent argmax replica: effective cluster key (cluster for
    // members, tagged self for singletons), then ONE max over
    // struct(score, -id) — max score, ties resolved to the smallest id
    val eff = scored
      .join(mapUF, Seq("doc_id"), "left")
      .withColumn("__ck",
        when(col("cluster_id").isNotNull,
          struct(lit(0).as("t"), col("cluster_id").as("v")))
          .otherwise(struct(lit(1).as("t"), col("doc_id").as("v"))))
    val expectKept = eff
      .groupBy(col("__ck"))
      .agg(max(struct(col("__q").as("s"), (-col("doc_id")).as("negid"))).as("__b"))
      .select((-col("__b.negid")).as("doc_id"))
    val kMissing = expectKept.exceptAll(kept).count()
    val kExtra = kept.exceptAll(expectKept).count()
    check("q_keep_best argmax replica",
      kMissing == 0 && kExtra == 0,
      s"entry output == independent per-cluster argmax " +
        s"($kMissing missing, $kExtra extra)")
    val nKept = kept.count()
    check("q_keep_best count invariant",
      nKept == total - nodes + comps,
      s"|kept| $nKept == one representative per effective cluster " +
        s"(${total - nodes + comps})")

    // ---------- optional: prior Verify dumps must match ----------
    dumpDir.foreach { out =>
      Seq(
        ("q_minhash_dedup", pairs.select("left_id", "right_id")),
        ("q_dedup_cluster", survivors),
        ("q_keep_best", kept)
      ).foreach { case (name, recomputed) =>
        val p = s"$out/$name"
        if (new java.io.File(p).isDirectory) {
          val dumped = spark.read.parquet(p)
          val dd = dumped.exceptAll(recomputed).count() +
            recomputed.exceptAll(dumped).count()
          check(s"$name dump determinism",
            dd == 0, s"Verify dump == in-process recomputation ($dd diffs)")
        } else println(s"INVARIANT SKIP $name dump (no $p)")
      }
    }

    println(if (failures == 0) "== invariant gate green =="
    else s"== invariant gate: $failures FAILURES ==")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
