package graft.examples

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Near-duplicate removal over a document corpus with MinHash + LSH —
  * the scale path for web-corpus dedup (no all-pairs comparison).
  *
  * Pipeline: 3-word shingles → 64 MinHash lanes → 16 LSH bands → only
  * documents sharing a band bucket are verified against the Jaccard
  * threshold → connected components cluster the verified pairs → one
  * representative survives per cluster. Work is bounded by bucket sizes,
  * not corpus², which is what keeps the same code viable at billions of
  * documents (measured linear two decades up in SCALING.md).
  */
object MinHashDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleEnv.session("minhash-dedup-example")
    val dir = ExampleEnv.dataDir(args)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val before = docs.count()

    // candidate pairs with verified Jaccard >= 0.5 — inspect a few
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
    println("sample verified near-duplicate pairs (jaccard >= 0.5):")
    pairs.orderBy(desc("jaccard")).show(5, truncate = false)

    // the actual dedup: keep one representative per duplicate cluster
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
    val after = kept.count()
    println(s"documents: $before -> $after " +
      f"(removed ${before - after} near-duplicates, ${100.0 * (before - after) / before}%.1f%%)")

    spark.stop()
  }
}
