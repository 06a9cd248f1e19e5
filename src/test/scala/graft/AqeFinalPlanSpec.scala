package graft

import scala.collection.immutable.SortedMap

/** AQE-side plan-regression CI (ROADMAP #2, second half): pins the FINAL
  * adaptive plans of the headline entries — the plans AQE actually ran
  * after its runtime re-optimizations — complementing
  * PlanFingerprintSpec, which pins the DECLARED (AQE-off) shapes of all
  * 211 batch entries.
  *
  * The static pin cannot see runtime decisions: a sort-merge join AQE
  * converts to broadcast once it sees the real build-side size, shuffle
  * reads coalesced below the advisory size, skew splits. Those decisions
  * ARE the plan at scale, so a curated set of the most expensive entries
  * (the VERDICT plan-audit set plus one per shuffle-heavy family) is
  * EXECUTED here (sf0.001, noop-consumed via the same toRdd path Bench
  * times) and the finalized AdaptiveSparkPlan is fingerprinted: the
  * static counters plus AQE read nodes and their coalesced markers.
  *
  * Baseline: `src/test/resources/aqe_fingerprints.json`; re-baseline an
  * intended change with `GRAFT_REGEN_FP=1 sbt "testOnly
  * graft.AqeFinalPlanSpec"` and review the JSON diff. Fingerprints are
  * node counts (not partition numbers), so they are deterministic for a
  * fixed fixture + session shape while still catching a lost broadcast
  * conversion or a vanished coalesce.
  */
class AqeFinalPlanSpec extends SharedSpark {

  private val sfDir = "/root/testdata/sf0.001"
  private val fpFile = new java.io.File(
    sys.env.getOrElse("GRAFT_AQE_FP_FILE",
      "src/test/resources/aqe_fingerprints.json"))

  /** The plan-audit set: most expensive entries per VERDICT + one
    * representative per shuffle-heavy family (join, agg, dedup, ANN,
    * packing/layout, truncation). Deliberately EXCLUDED: entries whose
    * construction persists multi-use intermediates (q_pagerank,
    * q_triangles, q_tfidf, q_semdedup) — their finalized plan STRINGS
    * embed the persisted/reused subtrees, and whether a repeat prints as
    * InMemoryTableScan / ReusedExchange or as its full recomputation
    * lineage depends on cache state and stage-materialization timing, so
    * their node counts are not a stable pin (observed ±30–150% across
    * identical runs). Their declared shapes are still pinned by the
    * AQE-off PlanFingerprintSpec, which never executes.
    */
  private val entries = Seq(
    "q_write_shards", "q_minhash_dedup",
    "q_dedup_cluster", "q_lsh_topk", "q_containment",
    "q_join_nullsafe", "q_public_join", "q_private_join",
    "q_groupby_sum", "q_bucketed_join", "q_zorder", "q_keep_best",
    "q_truncate_rows", "q_equidepth")

  private[graft] def fingerprint(plan: String): String = {
    val lines = plan.linesIterator.toVector
    def starts(name: String): Int =
      lines.count(_.dropWhile(c => !c.isLetter).startsWith(name))
    val agg = starts("HashAggregate") + starts("ObjectHashAggregate") +
      starts("SortAggregate")
    Seq(
      "x" -> starts("Exchange"),
      "bx" -> starts("BroadcastExchange"),
      "smj" -> starts("SortMergeJoin"),
      "bhj" -> starts("BroadcastHashJoin"),
      "shj" -> starts("ShuffledHashJoin"),
      "ag" -> agg,
      // AQE runtime artifacts: adaptive shuffle reads and how many of
      // them coalesced partitions below the advisory size
      "aqr" -> starts("AQEShuffleRead"),
      "coal" -> lines.count(l =>
        l.contains("AQEShuffleRead") && l.contains("coalesced"))
    ).map { case (k, v) => s"$k$v" }.mkString(" ")
  }

  private def readBaseline(): Map[String, String] = {
    val src = scala.io.Source.fromFile(fpFile, "UTF-8")
    val text = try src.mkString finally src.close()
    raw""""(q[a-z0-9_]+)"\s*:\s*"([^"]*)"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
  }

  private def writeBaseline(fps: SortedMap[String, String]): Unit = {
    fpFile.getParentFile.mkdirs()
    val body = fps.map { case (k, v) => s"""  "$k": "$v"""" }
      .mkString("{\n", ",\n", "\n}\n")
    val w = new java.io.FileWriter(fpFile)
    try w.write(body) finally w.close()
  }

  test("headline entries' FINAL adaptive plans match the committed pin") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val fps = SortedMap(entries.map { n =>
      val qe = SparkEntry.queries(n)(s, sfDir).queryExecution
      qe.toRdd.count(): Unit // finalize the adaptive plan (same consume path Bench times)
      val planStr = qe.executedPlan.toString
      assert(!planStr.contains("isFinalPlan=false"),
        s"$n: adaptive plan did not finalize")
      n -> fingerprint(planStr)
    }: _*)

    if (!fpFile.exists || sys.env.get("GRAFT_REGEN_FP").contains("1")) {
      writeBaseline(fps)
      info(s"baseline (re)written: ${fpFile.getPath} (${fps.size} entries)")
    } else {
      val base = readBaseline()
      val missing = fps.keySet.diff(base.keySet)
      val stale = base.keySet.diff(fps.keySet)
      val moved = fps.collect {
        case (n, fp) if base.contains(n) && base(n) != fp =>
          s"$n: pinned[${base(n)}] now[$fp]"
      }
      val problems =
        (if (missing.nonEmpty) Seq(s"unpinned new entries: ${missing.mkString(", ")}") else Nil) ++
        (if (stale.nonEmpty) Seq(s"stale pins (entry gone): ${stale.mkString(", ")}") else Nil) ++
        moved
      assert(problems.isEmpty,
        problems.mkString(
          "\nAQE final-plan drift (if intended, re-baseline with " +
            "GRAFT_REGEN_FP=1 and review the JSON diff):\n  ", "\n  ", ""))
    }
  }
}
