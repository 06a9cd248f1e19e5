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

  test("README quickstart: interactive session under one budget") {
    assume(new java.io.File(s"$data/documents.parquet").exists)
    // --- verbatim from README.md (Quickstart, example 3) ---
    import graft.domains.{ColumnDescriptor, DataFrameDomain}
    import graft.exact.ExactNum
    import graft.interactive.{PrivacyAccountant, SequentialComposition}
    import graft.measures.{PureDP, PureDPBudget}
    import graft.measurements.{Aggregations, NoiseKind}
    import graft.metrics.SymmetricDifference
    import graft.transformations.{Filter, PartitionByKeys}

    val sess = spark.read.parquet(s"$data/documents.parquet")
      .select("lang", "n_chars")
    val dom = DataFrameDomain(Seq(
      "lang"    -> ColumnDescriptor.string(true),
      "n_chars" -> ColumnDescriptor.long))

    // the whole session answers to this one accountant: ε = 3 total
    val acct = PrivacyAccountant.launch(
      SequentialComposition(dom, SymmetricDifference, PureDP,
        dIn = ExactNum(1), budget = PureDPBudget(ExactNum(3))),
      sess)

    // transformations spend nothing — they rebind the source in place
    acct.transformInPlace(Filter(dom, SymmetricDifference, "n_chars >= 0"))

    def count(eps: Long) = Aggregations.createCountMeasurement(
      dom, SymmetricDifference, NoiseKind.Geometric,
      dIn = ExactNum(1), budget = PureDPBudget(ExactNum(eps)))

    // per-language children, activated in order; parallel composition
    // charges the parent only the MAX child spend
    val kids = acct.split(PartitionByKeys(
      dom, SymmetricDifference, Seq("lang"), Seq(Seq("en"), Seq("de"))))
    val enCount = kids(0).measure(count(1)).asInstanceOf[Long] // ε=1 on en
    kids(0).retire()                                           // activates de
    val deCount = kids(1).measure(count(1)).asInstanceOf[Long] // ε=1 on de
    kids(1).retire()                                           // root reactivates

    assert(acct.remainingBudget == PureDPBudget(ExactNum(2))) // max(1,1) spent
    val total = acct.measure(count(2)).asInstanceOf[Long] // the rest, on a total
    acct.retire() // session closed: any further measure() throws
    // --- end verbatim ---
    // the geometric mechanism at these ε keeps single draws within a few
    // hundred of the truth with overwhelming probability; the fixture has
    // thousands of docs, so sanity bounds are safe to assert
    val n = sess.count()
    assert(enCount >= -1000 && enCount <= n + 1000)
    assert(deCount >= -1000 && deCount <= n + 1000)
    assert(total >= n - 1000 && total <= n + 1000)
    assertThrows[IllegalStateException](acct.measure(count(1)))
    assert(acct.remainingBudget == PureDPBudget(ExactNum.zero))
  }
}
