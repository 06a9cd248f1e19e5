package graft

import graft.ops.{Dedup, UrlOps}
import org.apache.spark.sql.{Observation, Row}

/** The silent-drop paths made observable (round 15): hygiene operators
  * that discard rows by documented design — dedupByUrl's
  * nullIds = "drop" and the bucket-cap overflow inside the LSH family —
  * now surface what they discarded through an opt-in
  * [[org.apache.spark.sql.Observation]], the Spark-native metric channel
  * (metrics ride the query itself; no second job, no accumulator
  * double-count on retries). A 100-TB operator needs these numbers to
  * distinguish "dedup removed duplicates" from "dedup ate the corpus".
  */
class DropObservabilitySpec extends SharedSpark {

  test("dedupByUrl nullIds=drop reports null_id_rows_dropped via Observation") {
    val docs = df("url STRING, id BIGINT", Seq(
      Row("https://a.example.com/x", 1L),
      Row("https://a.example.com/x", 2L),   // dup of 1, dropped by dedup
      Row("https://b.example.com/y", null), // NULL id: silently dropped
      Row(null, null),                      // NULL id too
      Row("https://c.example.com/z", 5L)))
    val obs = Observation("url-drops")
    val out = UrlOps.dedupByUrl(docs, "url", "id", observeDrops = Some(obs))
    assert(out.count() == 2, "one keeper per canonical URL, null ids gone")
    assert(obs.get("null_id_rows_dropped") == 2L,
      s"expected 2 null-id drops, observation said ${obs.get}")
  }

  test("minHashPairs bucket cap reports dropped_buckets / rows_in_dropped_buckets") {
    // 40 identical boilerplate docs: every (band, hash) bucket holds all
    // 40 members, far over cap 10 -> all 16 of their band buckets are
    // dropped (the documented conservative behavior) and the observation
    // counts exactly what vanished: 16 buckets x 40 memberships. Plus one
    // legitimate near-dup pair (40 tokens, last replaced -> shingle
    // Jaccard 35/41 = 0.854) whose small buckets survive the cap — it
    // both pins that the cap didn't eat the signal and keeps the
    // observed stream non-empty (a fully-degenerate corpus loses the
    // metrics to AQE empty-relation propagation; see boundedBuckets).
    val boiler = (0L until 40L).map(i =>
      Row(i, "the same boilerplate text repeated verbatim here"))
    val baseToks = (0 until 40).map(i => s"w$i")
    val legit = Seq(
      Row(100L, baseToks.mkString(" ")),
      Row(101L, (baseToks.dropRight(1) :+ "changed").mkString(" ")))
    val docs = df("doc_id BIGINT, text STRING", boiler ++ legit)
    val obs = Observation("bucket-drops")
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16,
      jaccardThreshold = 0.8, maxBucketSize = 10,
      observeDropped = Some(obs))
    val found = pairs.collect()
    assert(found.length == 1 && found.head.getLong(0) == 100L &&
      found.head.getLong(1) == 101L,
      s"expected exactly the planted surviving pair, got ${found.toSeq}")
    assert(obs.get("dropped_buckets") == 16L, s"observation: ${obs.get}")
    assert(obs.get("rows_in_dropped_buckets") == 640L, s"observation: ${obs.get}")
  }
}
