package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — embarrassingly parallel, no corpus shuffle. The
  * LSH path buckets the corpus by random-hyperplane signs so each probe
  * touches only matching buckets; bucket construction is a single narrow
  * pass and the bucket join shuffles only bucket keys.
  */
object Similarity {

  /** dot(a, b) via codegen'd higher-order functions — no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x * y),
      lit(0.0d),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (baseline).
    * Queries are broadcast; the corpus is scanned once; per-query top-k via
    * window over (query, sim desc) with deterministic id tie-break.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv")
    )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv")
    )
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn(
        "cosine",
        cosine(col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane: hash(dim index, plane index)
    * mapped to ±1 — keeps the plane matrix out of the driver entirely.
    */
  private def planeSign(plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(plane), dimIdx), lit(2)) === 0, lit(1.0d))
      .otherwise(lit(-1.0d))

  /** LSH bucket signature: sign pattern of `numPlanes` pseudo-random
    * hyperplane projections, packed into a long.
    */
  def lshSignature(vecCol: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(
          vecCol.cast("array<double>"),
          sequence(lit(0), size(vecCol) - 1),
          (x, i) => x * planeSign(p, i)
        ),
        lit(0.0d),
        (acc, x) => acc + x
      )
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via random-hyperplane LSH: candidates share the query's
    * bucket (or a 1-bit-flip probe bucket), verified by exact cosine.
    * Falls back to fewer results when a bucket lacks k members — standard
    * recall/latency trade; raise numProbes for recall.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 12,
      numProbes: Int = 4
  ): DataFrame = {
    require(numProbes >= 1 && numProbes <= numPlanes + 1)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"),
      lshSignature(col(vecCol), numPlanes).as("__bucket")
    )
    // multi-probe: original bucket + single-bit flips
    val probes = (0 until numProbes).map { p =>
      if (p == 0) col("__qsig")
      else col("__qsig").bitwiseXOR(lit(1L << (p - 1)))
    }
    val q = queries
      .select(
        col(idCol).as("query_id"),
        col(vecCol).as("__qv"),
        lshSignature(col(vecCol), numPlanes).as("__qsig")
      )
      .withColumn("__bucket", explode(array(probes: _*)))
      .drop("__qsig")
    val scored = c
      .join(broadcast(q), "__bucket")
      .withColumn(
        "cosine",
        cosine(col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates via LSH
    * buckets (all-pairs within bucket), verified exactly.
    */
  def cosineDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      numPlanes: Int = 12,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    val sigs = df.select(
      col(idCol).as("__id"),
      col(vecCol).as("__v"),
      lshSignature(col(vecCol), numPlanes).as("__bucket")
    )
    val bounded = sigs
      .withColumn(
        "__bs",
        count(lit(1)).over(Window.partitionBy(col("__bucket")))
      )
      .filter(col("__bs") <= maxBucketSize)
      .drop("__bs")
    val l = bounded.select(col("__bucket"), col("__id").as("left_id"), col("__v").as("__vl"))
    val r = bounded.select(col("__bucket"), col("__id").as("right_id"), col("__v").as("__vr"))
    l.join(r, "__bucket")
      .filter(col("left_id") < col("right_id"))
      .withColumn(
        "cosine",
        cosine(col("__vl").cast("array<double>"), col("__vr").cast("array<double>"))
      )
      .filter(col("cosine") >= threshold)
      .select(col("left_id"), col("right_id"), col("cosine"))
      .distinct()
  }
}
