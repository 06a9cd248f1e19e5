package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Compiles and runs the docs/WALKTHROUGH.md code snippets VERBATIM
  * (the ReadmeExamplesSpec discipline): if an API signature a snippet
  * uses changes, this file stops compiling and the walkthrough must be
  * updated with it. Context lines (the fixture frames around each
  * snippet) are the minimal setup the doc's prose assumes.
  */
class WalkthroughSnippetsSpec extends SharedSpark {

  test("walkthrough §2: sequential + parallel composition via the accountant") {
    val docs = df("lang STRING", Seq(
      Row("en"), Row("en"), Row("de"), Row("fr")))
    val publicLangs = df("lang STRING", Seq(Row("en"), Row("de")))
    // --- verbatim from docs/WALKTHROUGH.md §2 ---
    import graft.domains.{ColumnDescriptor, DataFrameDomain}
    import graft.exact.ExactNum
    import graft.interactive.{PrivacyAccountant, SequentialComposition}
    import graft.measures.{PureDP, PureDPBudget}
    import graft.measurements.{Aggregations, NoiseKind}
    import graft.metrics.SymmetricDifference
    import graft.transformations.PartitionByKeys

    val domain = DataFrameDomain(Seq("lang" -> ColumnDescriptor.string(true)))
    def countAt(eps: Long) = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric, ExactNum(1),
      PureDPBudget(ExactNum(eps)), groupKeys = Some(publicLangs))

    // total budget ε = 4, declared once
    val acct = PrivacyAccountant.launch(
      SequentialComposition(domain, SymmetricDifference, PureDP,
        ExactNum(1), PureDPBudget(ExactNum(4))), docs)

    acct.measure(countAt(1))               // sequential: spends 1, 3 left

    // parallel: one child per disjoint key list; the whole split will
    // charge the parent only max(child spends) = 2, not 2 + 2
    val kids = acct.split(PartitionByKeys(
      domain, SymmetricDifference, Seq("lang"), Seq(Seq("en"), Seq("de"))))
    kids(0).measure(countAt(2)); kids(0).retire()
    kids(1).measure(countAt(2)); kids(1).retire()
    // parent active again: 4 − 1 (sequential) − 2 (max of children) = 1
    assert(acct.remainingBudget == PureDPBudget(ExactNum(1)))
    // --- end verbatim ---
  }

  test("walkthrough §3: truncation bounds per-group contribution") {
    val events = df("user_id BIGINT, v BIGINT",
      (0L until 100L).map(i => Row(i % 3, i)))
    // --- verbatim from docs/WALKTHROUGH.md §3 ---
    import graft.transformations.Truncation

    val bounded = Truncation.truncateLargeGroups(events, Seq("user_id"), 16)
    // --- end verbatim ---
    val sizes = bounded.groupBy("user_id").count().collect()
    assert(sizes.forall(_.getLong(1) <= 16), "a group exceeds the threshold")
    assert(sizes.map(_.getLong(1)).sum == 48, "3 groups of 33-34 -> 16 each")
    // stable under replay: the hash-ranked selection is deterministic
    val again = Truncation.truncateLargeGroups(events, Seq("user_id"), 16)
      .collect().toSet
    assert(bounded.collect().toSet == again)
  }

  test("walkthrough §5: windowed counts with a watermark") {
    val events = df("ts TIMESTAMP, user_id BIGINT", (0 until 60).map { m =>
      Row(java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"), (m % 2).toLong)
    })
    // --- verbatim from docs/WALKTHROUGH.md §5 ---
    import graft.streaming.Streams

    val counts = Streams.windowedCounts(
      events, tsCol = "ts", groupCols = Seq("user_id"),
      windowDuration = "10 minutes", watermark = "15 minutes")
    // --- end verbatim ---
    val rows = counts.collect()
    assert(rows.length == 12, "6 windows x 2 users")
    assert(rows.map(_.getLong(3)).sum == 60)
  }
}
