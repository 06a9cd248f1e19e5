package graft.examples

import graft.ops.{Dedup, Pack, TextAnalysis}
import org.apache.spark.sql.functions._

/** A training-data curation pipeline end to end: quality gate →
  * per-language stratified sampling → epoch weighting (data mixing) →
  * shuffled sequence packing.
  *
  * Every stage is a deterministic portable recipe (seeded hash draws, no
  * RNG state), so the pipeline is exactly replayable — rerunning it on
  * the same inputs, on any cluster size, yields byte-identical output.
  * That is the property that makes a 100 TB curation run debuggable: any
  * single document's fate can be re-derived from its id.
  *
  *   1. gate: heuristic quality score (length/punctuation/stopword
  *      signals), keep documents scoring >= 0.5;
  *   2. sample: keep 90% of English, 60% of German, 30% of everything
  *      else — by seeded hash of the document id, not a random draw;
  *   3. mix: English documents repeat 1.5 epochs (Pile-style up-weighting)
  *      — each copy tagged with its epoch number;
  *   4. pack: greedy chunked packing of (id, length) into 4096-char
  *      budget bins after a seeded shuffle, emitting (bin, offset) layout
  *      ready for a sharded write.
  */
object CurationPipelineExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleEnv.session("curation-pipeline-example")
    val dir = ExampleEnv.dataDir(args)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()

    val gated = TextAnalysis.qualityScore(docs, "text")
      .filter(col("quality") >= 0.5)
    val nGated = gated.count()

    val sampled = Dedup.sampleByHashStratifiedPortable(
      gated, "doc_id", "lang", Map("en" -> 9, "de" -> 6),
      den = 10, defaultNum = 3)
    val nSampled = sampled.count()

    val mixed = Dedup.repeatByWeightPortable(
      sampled.select("doc_id", "lang", "n_chars"), "doc_id", "lang",
      Map("en" -> 15), den = 10, salt = 2L)
    val nMixed = mixed.count()

    val keyed = mixed.withColumn("pack_id", col("doc_id") * 4 + col("epoch"))
    val packed = Pack.packChunkedShuffled(
      keyed.select("pack_id", "n_chars"), "pack_id", "n_chars",
      budget = 4096L, salt = 3L)
    val nBins = packed.select("bin_start").distinct().count()

    println(s"curation funnel: $total docs -> $nGated quality-gated -> " +
      s"$nSampled sampled -> $nMixed after epoch mixing -> $nBins packed bins")
    println("packed layout sample:")
    packed.orderBy("bin_start", "offset_global").show(10)

    spark.stop()
  }
}
