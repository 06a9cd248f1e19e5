package graft

/** Compiles and runs the README "Quickstart" examples VERBATIM (same code,
  * same fixture tables) so the public-facing documentation cannot rot —
  * the doctest-everywhere discipline of the reference's CI. If an API
  * signature in either example changes, this file stops compiling and the
  * README must be updated with it.
  */
class ReadmeExamplesSpec extends SharedSpark {

  private val data = "/root/testdata/sf0.001"

  test("README quickstart: group-complete DP count") {
    assume(new java.io.File(s"$data/documents.parquet").exists)
    // --- verbatim from README.md (Quickstart, example 1) ---
    import graft.domains.{ColumnDescriptor, DataFrameDomain}
    import graft.exact.ExactNum
    import graft.measures.PureDPBudget
    import graft.measurements.{Aggregations, NoiseKind}
    import graft.metrics.SymmetricDifference
    import org.apache.spark.sql.DataFrame

    val docs = spark.read.parquet(s"$data/documents.parquet")
      .select("lang", "doc_id")
    val publicLangs = spark.createDataFrame(
      Seq(Tuple1("en"), Tuple1("de"), Tuple1("fr"), Tuple1("klingon")))
      .toDF("lang")

    val dom = DataFrameDomain(Seq(
      "lang"   -> ColumnDescriptor.string(true),
      "doc_id" -> ColumnDescriptor.long))
    val m = Aggregations.createCountMeasurement(
      dom, SymmetricDifference, NoiseKind.Geometric,
      dIn = ExactNum(1),                  // neighboring datasets differ by 1 row
      budget = PureDPBudget(ExactNum(1)), // ε = 1
      groupKeys = Some(publicLangs))

    val released = m(docs).asInstanceOf[DataFrame] // (lang, count), group-complete
    assert(m.privacyFunction(ExactNum(1)) == PureDPBudget(ExactNum(1)))
    // --- end verbatim ---
    val rows = released.collect()
    assert(rows.length == 4, "group-complete: one row per public key")
    assert(rows.map(_.getString(0)).toSet ==
      Set("en", "de", "fr", "klingon"),
      "keys come from the public table, including absent 'klingon'")
  }

  test("README quickstart: keep-best near-dup dedup pipeline") {
    assume(new java.io.File(s"$data/documents.parquet").exists)
    // --- verbatim from README.md (Quickstart, example 2) ---
    import graft.ops.{Dedup, TextAnalysis}

    val corpus = spark.read.parquet(s"$data/documents.parquet")
    val scored = TextAnalysis.qualityScore(corpus, "text", "quality")
    val pairs = Dedup.minHashPairs(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
    val clusters = Dedup.duplicateClusters(corpus.select("doc_id"), pairs, "doc_id")
    val keep = Dedup.keepBestPerCluster(scored, clusters, "doc_id", "quality")
    // --- end verbatim ---
    val total = corpus.count()
    val kept = keep.count()
    assert(kept > 0 && kept <= total)
    // every kept id is a real document, and the kept set is duplicate-free
    assert(keep.select("doc_id").distinct().count() == kept)
    assert(keep.join(corpus, Seq("doc_id"), "left_anti").count() == 0)
  }
}
