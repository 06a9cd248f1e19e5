package graft

import scala.collection.immutable.SortedMap

/** Plan-regression CI (ROADMAP #2): pins a compact physical-plan
  * fingerprint for EVERY batch driver entry — counts of shuffle
  * exchanges, broadcast exchanges, sorts, each join strategy, aggregate
  * nodes, and whole-stage-codegen spans — against a committed baseline
  * (`src/test/resources/plan_fingerprints.json`). A refactor that
  * silently adds a shuffle, drops a broadcast to a sort-merge join, or
  * breaks a codegen span then fails HERE, immediately, instead of
  * surfacing rounds later as a bench regression.
  *
  * Method: plans are built on the sf0.001 fixture in a `newSession()`
  * with AQE disabled, so `executedPlan` is the final static plan —
  * codegen collapse applied, `*(n)` span markers present — without
  * executing anything (planning only; entries whose CONSTRUCTION runs
  * bounded jobs, e.g. the union-find collect or eager multiplicity
  * probes, stay cheap at this SF). AQE-off keeps the pin deterministic:
  * it records the DECLARED shape; AQE's runtime improvements (skew
  * split, broadcast conversion) are strictly additive on top and are
  * covered by their own specs.
  *
  * Counts, not full plan text, so benign changes (column order, alias
  * names, partition counts) do not churn the pin. To re-baseline after
  * an INTENDED shape change: `GRAFT_REGEN_FP=1 sbt "testOnly
  * graft.PlanFingerprintSpec"`, then review the JSON diff in git — the
  * diff IS the review artifact (one line per entry whose shape moved).
  *
  * Streaming entries (`*_stream`) are excluded: their batch-equivalent
  * semantics are gated by the stream≡batch oracles and their state
  * bounds by StreamStateBoundSpec; a micro-batch's physical plan is
  * driven by the trigger, not by `queries()`.
  */
class PlanFingerprintSpec extends SharedSpark {

  private val sfDir = "/root/testdata/sf0.001"
  private val fpFile = new java.io.File(
    sys.env.getOrElse("GRAFT_FP_FILE",
      "src/test/resources/plan_fingerprints.json"))

  /** Node-count fingerprint of a physical plan string. Tree art, the
    * `*(n)` codegen markers, and `:- `/`+- ` connectors precede the node
    * name on each line; the name is the first letter-run. `ReusedExchange`
    * / `BroadcastExchange` start with their own letters, so plain
    * `Exchange` counts only real shuffles (a ReusedExchange is free — it
    * reads a sibling's files).
    */
  private[graft] def fingerprint(plan: String): String = {
    val lines = plan.linesIterator.toVector
    def starts(name: String): Int =
      lines.count(_.dropWhile(c => !c.isLetter).startsWith(name))
    val spans = raw"\*\((\d+)\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet.size
    val agg = starts("HashAggregate") + starts("ObjectHashAggregate") +
      starts("SortAggregate")
    Seq(
      "x" -> starts("Exchange"),
      "bx" -> starts("BroadcastExchange"),
      "st" -> starts("Sort ["),
      "smj" -> starts("SortMergeJoin"),
      "bhj" -> starts("BroadcastHashJoin"),
      "shj" -> starts("ShuffledHashJoin"),
      "bnl" -> starts("BroadcastNestedLoopJoin"),
      "cp" -> starts("CartesianProduct"),
      "ag" -> agg,
      "cg" -> spans
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

  test("every batch entry's physical-plan shape matches the committed pin") {
    val fpSpark = spark.newSession()
    fpSpark.conf.set("spark.sql.adaptive.enabled", "false")
    val names = SparkEntry.queries.keys.toSeq
      .filterNot(_.endsWith("_stream")).sorted
    val fps = SortedMap(names.map { n =>
      val plan = SparkEntry.queries(n)(fpSpark, sfDir)
        .queryExecution.executedPlan.toString
      n -> fingerprint(plan)
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
          "\nplan-shape drift (if intended, re-baseline with " +
            "GRAFT_REGEN_FP=1 and review the JSON diff):\n  ", "\n  ", ""))
    }
  }
}
