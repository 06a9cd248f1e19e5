package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpora.
  *
  * Scale design: every pipeline is expressed as joins/aggregations on
  * pre-bucketed keys so Catalyst can choose shuffle strategies, and every
  * candidate-generation step bounds bucket sizes (frequent-shingle and
  * bucket-size caps) so no reducer sees an unbounded group at 100 TB.
  */
object Dedup {

  /** Exact dedup: one representative row (min id) per distinct value of
    * `cols`. Hash-based aggregate — single shuffle on the dedup key.
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(idCol, cols: _*)

  /** Exact dedup by content fingerprint (whitespace/case-insensitive). */
  def exactByFingerprint(
      df: DataFrame,
      textCol: String,
      idCol: String
  ): DataFrame = {
    val fp = TextAnalysis.fingerprint(df, textCol, "__fp")
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Word-level shingles of size k, distinct per document (column-expression
    * variant of [[shingleRows]] with identical semantics: documents shorter
    * than k tokens produce NO shingles).
    */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = split(trim(lower(textCol)), "\\s+")
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      array_distinct(
        filter(
          transform(
            sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))
          ),
          s => length(s) > 0
        )
      )
    )
  }

  /** Exploded distinct (id, shingle) pairs via a typed flatMap — one
    * deserialization and plain string ops, ~5× faster than the nested
    * higher-order-function expression for long texts. Narrow (no shuffle).
    */
  private def shingleRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.Encoders
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      idField.copy(name = "__id"),
      org.apache.spark.sql.types.StructField("__sh",
        org.apache.spark.sql.types.StringType, nullable = false)
    ))
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.flatMap { r =>
      val id = r.get(idIdx)
      val text = if (r.isNullAt(tIdx)) "" else r.getString(tIdx)
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val set = scala.collection.mutable.LinkedHashSet.empty[String]
      if (toks.length >= k) {
        var i = 0
        while (i + k <= toks.length) {
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
          set += sb.result()
          i += 1
        }
      }
      set.iterator.map(sh => org.apache.spark.sql.Row(id, sh))
    }(Encoders.row(outSchema))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline (one standard LSH pass):
    *  1. explode distinct word-k-shingles per doc
    *  2. signature: per doc, min of xxhash64(seed_i, shingle) for each of
    *     `numHashes` hash functions — one aggregation, map-side combined
    *  3. band the signature into `bands` groups, hash each band, explode
    *  4. candidate pairs = docs sharing a (band, bandHash) bucket
    *     (bucket size capped to guard against degenerate skew)
    *  5. verify exact shingle-set Jaccard ≥ threshold via a join on shingles
    *
    * Returns (left_id, right_id, jaccard) with left_id < right_id.
    */
  def minHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val spark = df.sparkSession

    val shingleSets = shingleRows(df, idCol, textCol, shingleSize).persist()

    // 2. minhash signature: numHashes min-aggregates in one pass
    val sigAggs = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("__sh"))).as(s"__h$i")
    }
    val sigs = shingleSets.groupBy(col("__id")).agg(sigAggs.head, sigAggs.tail: _*)

    // 3. bands → (band index, band hash)
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"__h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    val banded = sigs
      .select(col("__id"), explode(array(bandCols: _*)).as("b"))
      .select(col("__id"), col("b.band").as("__band"), col("b.bh").as("__bh"))

    // 4. candidates within buckets; cap pathological buckets
    val bucketed = banded
      .withColumn(
        "__bs",
        count(lit(1)).over(Window.partitionBy(col("__band"), col("__bh")))
      )
      .filter(col("__bs") <= maxBucketSize)
      .drop("__bs")
    val l = bucketed.select(col("__band"), col("__bh"), col("__id").as("left_id"))
    val r = bucketed.select(col("__band"), col("__bh"), col("__id").as("right_id"))
    val candidates = l
      .join(r, Seq("__band", "__bh"))
      .filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id")
      .distinct()

    // 5. exact verification on shingle sets
    val sizes = shingleSets.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val inter = candidates
      .join(shingleSets.select(col("__id").as("left_id"), col("__sh")), "left_id")
      .join(
        shingleSets.select(col("__id").as("right_id"), col("__sh").as("__sh2")),
        Seq("right_id")
      )
      .filter(col("__sh") === col("__sh2"))
      .groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col("__id").as("left_id"), col("__n").as("__nl")), "left_id")
      .join(sizes.select(col("__id").as("right_id"), col("__n").as("__nr")), "right_id")
      .withColumn(
        "jaccard",
        col("__inter").cast("double") /
          (col("__nl") + col("__nr") - col("__inter"))
      )
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** Connected components over near-duplicate pairs: every document gets a
    * cluster id = the minimum doc id reachable through the pair graph
    * (hash-min label propagation, converges in O(graph diameter) rounds —
    * near-dup graphs are shallow, so a small `maxIterations` suffices).
    *
    * Each round is one shuffle on ids; intermediate labels are persisted
    * and the loop stops early when no label changes.
    */
  def duplicateClusters(
      ids: DataFrame, // one column: the id universe
      pairs: DataFrame, // columns left_id, right_id
      idCol: String,
      maxIterations: Int = 20
  ): DataFrame = {
    val edges = pairs
      .select(col("left_id").as("a"), col("right_id").as("b"))
      .union(pairs.select(col("right_id").as("a"), col("left_id").as("b")))
      .persist()
    // eager localCheckpoint per round: truncates the growing iteration
    // lineage so round N's plan doesn't re-analyze rounds 1..N-1
    var labels = ids
      .select(col(idCol).as("a"), col(idCol).as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // candidate label per node: min of own and neighbors' labels
      val neighborLabels = edges
        .join(labels.select(col("a").as("b"), col("cluster_id")), "b")
        .select(col("a"), col("cluster_id"))
      val next = labels
        .select(col("a"), col("cluster_id"))
        .union(neighborLabels)
        .groupBy(col("a"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.withColumnRenamed("cluster_id", "__old"), "a")
        .filter(col("cluster_id") =!= col("__old"))
        .limit(1)
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.select(col("a").as(idCol), col("cluster_id"))
  }

  /** End-to-end near-duplicate removal: keep one representative (the
    * cluster-minimum id) per MinHash near-dup cluster.
    */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8
  ): DataFrame = {
    val pairs =
      minHashPairs(df, idCol, textCol, shingleSize, numHashes, bands, jaccardThreshold)
    val clusters =
      duplicateClusters(df.select(idCol), pairs, idCol)
    df.join(
      clusters.filter(col(idCol) === col("cluster_id")).select(idCol),
      Seq(idCol),
      "left_semi"
    )
  }

  /** 64-bit SimHash per document over whitespace tokens — computed in a
    * single narrow map (no shuffle): per token a 64-bit hash votes ±1 on
    * each bit, the sign of each bit's tally forms the fingerprint.
    */
  def simHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      out: String = "simhash"
  ): DataFrame = {
    import org.apache.spark.sql.Encoders
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        out,
        org.apache.spark.sql.types.LongType,
        false
      )
    )
    val textIdx = df.schema.fieldIndex(textCol)
    df.map { row =>
      val text = if (row.isNullAt(textIdx)) "" else row.getString(textIdx)
      val counts = new Array[Int](64)
      text.toLowerCase.split("\\s+").foreach { tok =>
        if (tok.nonEmpty) {
          val h = scala.util.hashing.MurmurHash3.stringHash(tok).toLong &
            0xffffffffL | (scala.util.hashing.MurmurHash3
              .stringHash(tok.reverse)
              .toLong << 32)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ sig)
    }(Encoders.row(schema))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDistance, using
    * block LSH with maxDistance+1 blocks (pigeonhole: ≤ maxDistance
    * differing bits cannot touch every block, so some block matches
    * exactly). maxDistance ≤ 15 keeps blocks ≥ 4 bits.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3
  ): DataFrame = {
    require(
      maxDistance >= 0 && maxDistance <= 15,
      "maxDistance must be in [0, 15] for 64-bit block LSH recall"
    )
    val nBlocks = maxDistance + 1
    val width = 64 / nBlocks
    val sigs = simHash(df.select(col(idCol), col(textCol)), idCol, textCol)
      .select(col(idCol).as("__id"), col("simhash"))
    val blocks = (0 until nBlocks).map { b =>
      // last block absorbs the remainder bits
      val w = if (b == nBlocks - 1) 64 - width * (nBlocks - 1) else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(
        lit(b).as("blk"),
        (shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask))).as("bv")
      )
    }
    val banded = sigs
      .select(col("__id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("__id"), col("simhash"), col("b.blk").as("__blk"), col("b.bv").as("__bv"))
    val l = banded.select(col("__blk"), col("__bv"),
      col("__id").as("left_id"), col("simhash").as("__sl"))
    val r = banded.select(col("__blk"), col("__bv"),
      col("__id").as("right_id"), col("simhash").as("__sr"))
    l.join(r, Seq("__blk", "__bv"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        bit_count(col("__sl").bitwiseXOR(col("__sr"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Exact n-gram Jaccard pairs: candidates share at least one k-shingle
    * (document frequency of the shingle capped at `maxDocFreq` to bound the
    * join fan-out), verified by exact Jaccard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      jaccardThreshold: Double = 0.8,
      maxDocFreq: Int = 100
  ): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleSize).persist()
    val rare = sh
      .groupBy(col("__sh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("__sh")
    val filtered = sh.join(rare, "__sh")
    // One fused pass: the self-join on shared shingles IS the candidate set,
    // and counting join hits per pair IS the intersection size over rare
    // shingles. Because the doc-frequency cap can hide shared-but-frequent
    // shingles from the intersection, re-verify survivors exactly below.
    val sizes = sh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val candidates = filtered
      .select(col("__sh"), col("__id").as("left_id"))
      .join(filtered.select(col("__sh"), col("__id").as("right_id")), "__sh")
      .filter(col("left_id") < col("right_id"))
      .groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("__rareInter"))
    // exact verification on the (small) candidate set, over ALL shingles
    candidates
      .join(sh.select(col("__id").as("left_id"), col("__sh")), "left_id")
      .join(sh.select(col("__id").as("right_id"), col("__sh").as("__sh2")), Seq("right_id"))
      .filter(col("__sh") === col("__sh2"))
      .groupBy(col("left_id"), col("right_id"))
      .agg(count(lit(1)).as("__inter"))
      .join(sizes.select(col("__id").as("left_id"), col("__n").as("__nl")), "left_id")
      .join(sizes.select(col("__id").as("right_id"), col("__n").as("__nr")), "right_id")
      .withColumn(
        "jaccard",
        col("__inter").cast("double") / (col("__nl") + col("__nr") - col("__inter"))
      )
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }
}
