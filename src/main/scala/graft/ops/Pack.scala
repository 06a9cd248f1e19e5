package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data preparation: assign documents to
  * fixed-size token/character-budget bins so a training job can read one
  * bin per sample. Both packers are deterministic functions of the data
  * (no RNG, no partition-count dependence in the OUTPUT), so an external
  * replica can reproduce the exact assignment.
  *
  * The reference engine has no packing analog; the semantics follow the
  * two shapes used by LLM data pipelines: concat-and-split (every training
  * sequence full, documents may straddle boundaries) and greedy next-fit
  * (no document split, some slack per bin).
  */
object Pack {

  /** Concat-and-split packing (the GPT-style layout): documents are laid
    * end-to-end in ascending `idCol` order and the stream is cut every
    * `budget` length units. Emits, per document:
    *
    *   - `offset_global` — the document's start offset in the concatenated
    *     stream
    *   - `bin_start` / `bin_offset` — the bin containing that start and the
    *     offset within it
    *   - `bin_end` — the bin containing the document's LAST unit (equal to
    *     `bin_start` when the document fits; a document longer than
    *     `budget` spans several bins)
    *
    * Scale shape: a global running sum is inherently sequential, so it is
    * computed hierarchically — range-partition by id, one local cumulative
    * sum per partition (a window PARTITIONED BY the physical partition id,
    * bounded by partition size, never a single global-ordering task), plus
    * a driver-side prefix over the per-partition totals (one row per
    * partition, broadcast back). The input is locally checkpointed once so
    * the per-partition totals and the final pass see the identical
    * partitioning.
    */
  def packChunked(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      partitions: Int = 0
  ): DataFrame =
    binColumns(
      globalCumBefore(
        df.select(col(idCol).cast("long").as("__id"),
          col(lenCol).cast("long").as("__len")),
        Seq(col("__id")), partitions),
      budget)
      .select(col("__id").as(idCol), col("offset_global"),
        col("bin_start"), col("bin_offset"), col("bin_end"))

  /** [[packChunked]] over a deterministically SHUFFLED document order — the
    * epoch layout an LLM training job actually consumes: documents are
    * permuted by the engine-portable 60-bit SHA-256 rank
    * `int(hex[0:15](sha256("salt|id")))` (the [[Dedup.sampleByHashPortable]]
    * recipe, ties broken by id), then laid end-to-end and cut every
    * `budget` units. Different `salt` = a fresh, reproducible epoch
    * permutation; any engine with SHA-256 can replay both the order and
    * the resulting bin boundaries. Emits `shuffle_rank` alongside the
    * [[packChunked]] columns.
    */
  def packChunkedShuffled(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      salt: Long = 0L,
      partitions: Int = 0
  ): DataFrame = {
    val rank = conv(
      substring(
        sha2(concat_ws("|", lit(salt.toString), col("__id").cast("string")), 256),
        1, 15),
      16, 10).cast("long")
    binColumns(
      globalCumBefore(
        df.select(col(idCol).cast("long").as("__id"),
            col(lenCol).cast("long").as("__len"))
          .withColumn("__rank", rank),
        Seq(col("__rank"), col("__id")), partitions),
      budget)
      .select(col("__id").as(idCol), col("__rank").as("shuffle_rank"),
        col("offset_global"), col("bin_start"), col("bin_offset"),
        col("bin_end"))
  }

  /** The hierarchical global prefix scan shared by the chunked packers:
    * range-partition by `orderCols` (a total order), one local EXCLUSIVE
    * cumulative sum of `__len` per partition (a window PARTITIONED BY the
    * physical partition id — bounded by partition size, never a single
    * global-ordering task), plus a driver-side prefix over the
    * per-partition totals (one row per partition, broadcast back). The
    * input is locally checkpointed once so the totals pass and the final
    * pass see the identical partitioning. Adds `offset_global`.
    */
  private def globalCumBefore(
      df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column],
      partitions: Int
  ): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // physical partition ids follow the range order (range bucket i lands
    // in partition i), so the driver prefix runs over ascending __pid
    val partTotals = ranged
      .groupBy(col("__pid"))
      .agg(sum(col("__len")).as("__total"))
      .collect()
      .map(r => (r.getAs[Int]("__pid"), r.getAs[Long]("__total")))
      .sortBy(_._1)
    val offsets = partTotals
      .scanLeft((0, 0L)) { case ((_, acc), (pid, total)) => (pid, acc + total) }
      .sliding(2)
      .collect { case Array((_, before), (pid, _)) => (pid, before) }
      .toMap
    val offsetTable = spark.createDataFrame(
      offsets.toSeq.map { case (pid, off) => PackOffset(pid, off) })
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__local", coalesce(sum(col("__len")).over(w), lit(0L)))
      .join(broadcast(offsetTable), Seq("__pid"))
      .withColumn("offset_global", col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Length-bucketed batch assignment — the batching layout that keeps
    * padding waste down when sequences of similar length train together:
    * rows fall into the bucket counting how many ascending `bounds` their
    * `lenCol` reaches (bucket 0 = below the first bound), are ranked
    * 0-based inside their bucket by `idCol`, and grouped `batchSize` at a
    * time. Emits `(idCol, bucket, rank_in_bucket, batch)` — deterministic,
    * so every epoch and every engine derives the same batches.
    *
    * Scale shape: ONE [[globalRank]] over the (bucket, id) total order
    * (range partition + per-partition window + one-row-per-partition
    * driver prefix — a huge bucket never becomes a single sort task);
    * per-bucket ranks subtract the bucket's start offset, recovered as
    * min(global rank) per bucket and broadcast back (buckets are few).
    */
  def bucketBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      bounds: Seq[Long],
      batchSize: Int
  ): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      "bounds must be non-empty, ascending, distinct")
    val bucket = bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col("__len0") >= b, lit(1L)).otherwise(lit(0L))
    }
    val ranked = globalRank(
      df.select(col(idCol).as("__id"), col(lenCol).as("__len0"))
        .withColumn("bucket", bucket),
      Seq(col("bucket"), col("__id"))).persist()
    val starts = ranked.groupBy(col("bucket"))
      .agg(min(col("__rank")).as("__b0"))
    ranked.join(broadcast(starts), Seq("bucket"))
      .withColumn("rank_in_bucket", col("__rank") - col("__b0"))
      .select(col("__id").as(idCol), col("bucket"), col("rank_in_bucket"),
        expr(s"rank_in_bucket div ${batchSize}L").as("batch"))
  }

  /** Exact global 0-based rank under `orderCols` (a total order):
    * [[globalCumBefore]] with unit lengths — a row's rank is the count of
    * rows before it, computed without any single global-sort task.
    * Returns the input columns plus `__rank`.
    */
  private[ops] def globalRank(
      df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column],
      partitions: Int = 0
  ): DataFrame =
    globalCumBefore(df.withColumn("__len", lit(1L)), orderCols, partitions)
      .withColumnRenamed("offset_global", "__rank")
      .drop("__len")

  /** Bin columns from `offset_global`/`__len`. `div` (integer division),
    * not `/` (double division): offsets in a 100-TB stream exceed 2^53 and
    * must not round through a double.
    */
  private def binColumns(df: DataFrame, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    df
      .withColumn("bin_start", expr(s"offset_global div ${budget}L"))
      .withColumn("bin_offset", pmod(col("offset_global"), lit(budget)))
      .withColumn("bin_end",
        when(col("__len") > 0,
          expr(s"(offset_global + __len - 1) div ${budget}L"))
          .otherwise(col("bin_start")))
  }

  /** Greedy next-fit packing: within each shard (`idCol % numShards`),
    * documents are visited in ascending id order and appended to the
    * current bin while they fit; a document that would overflow — or any
    * document arriving at an empty fill, including one longer than the
    * whole budget — opens a new bin. No document is split; bins carry
    * slack. Emits `(idCol, shard, bin)` with bins numbered from 0 per
    * shard.
    *
    * Scale shape: next-fit is sequential BY DEFINITION, so the
    * sequentiality is confined to a shard: `numShards` independent scans,
    * each a single pass over its shard's sorted rows inside one task
    * (`repartition(numShards, shard)` + partition-local sort + a stateful
    * `mapPartitions` that resets at shard changes). Choose `numShards`
    * proportional to cluster parallelism; the id-modulo shape keeps shard
    * sizes balanced for dense ids.
    */
  def packGreedyNextFit(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      numShards: Int
  ): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(numShards >= 1, "numShards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"),
        pmod(col(idCol), lit(numShards)).cast("long").as("shard"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var fill = 0L
        var bin = -1L
        it.map { case (id, len, shard) =>
          if (shard != curShard) { curShard = shard; fill = 0L; bin = -1L }
          if (fill > 0 && fill + len <= budget) fill += len
          else { bin += 1; fill = len }
          (id, shard, bin)
        }
      }
      .toDF(idCol, "shard", "bin")
  }

  /** Packing-efficiency report for a non-splitting packer
    * ([[packGreedyNextFit]] output): per (shard, bin) — document count,
    * used units, tail waste against `budget`, and fill ppm. The KPI
    * table that decides whether a packer or a bigger budget is worth
    * it; bins are budget-bounded so the report is bins-sized. */
  def packingReport(
      packed: DataFrame,
      lens: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long): DataFrame =
    packed
      .join(lens.select(col(idCol),
        col(lenCol).cast("long").as("__len")), Seq(idCol))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("used"))
      .select(col("shard"), col("bin"), col("n_docs"), col("used"),
        (lit(budget) - col("used")).as("waste"),
        round(lit(1000000.0) * col("used") / lit(budget))
          .cast("long").as("fill_ppm"))

  /** Materialize a packed corpus as training shard files: one
    * `<binCol>=<v>/` directory per bin, exactly ONE file inside each, rows
    * sorted by `sortCols` within the file — the layout a training reader
    * consumes sequentially (sample i = file i, no cross-file reads).
    *
    * Scale shape: `repartition(binCol)` routes each bin to one task (bins
    * are budget-bounded by construction, so tasks are balanced) and the
    * dynamic-partition write then emits a single file per directory. The
    * in-file sort rides `sortWithinPartitions` — no extra exchange beyond
    * the one repartition.
    *
    * `mode` follows `DataFrameWriter`: the default `"errorifexists"`
    * refuses a non-empty `outDir`; pass `"overwrite"` deliberately to
    * replace a previous epoch's shards.
    */
  def writeShards(
      df: DataFrame,
      binCol: String,
      sortCols: Seq[String],
      outDir: String,
      format: String = "parquet",
      mode: String = "errorifexists"
  ): Unit = {
    // Explicit partition count: a keyless `repartition(col)` is an AQE
    // coalescible exchange, and a many-small-bins write coalesces to ONE
    // task that creates every bin directory+file sequentially (measured
    // round 17: 383 bins at sf0.1 wrote serially at ~15 ms/file, 6.0 s vs
    // 0.3 s for the same rows written wide). Pinning the count to the
    // session's shuffle width keeps file creation spread across the
    // cluster; each bin still lands in exactly one task (hash on binCol),
    // preserving the one-file-per-directory contract.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(parts, col(binCol))
      .sortWithinPartitions((binCol +: sortCols).map(col): _*)
      .write
      .partitionBy(binCol)
      .format(format)
      .mode(mode)
      .save(outDir)
  }
}

/** Row shape for [[Pack.packChunked]]'s broadcast prefix-offset table. */
private[ops] case class PackOffset(__pid: Int, __off: Long)
