package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-pruned semi/anti joins.
  *
  * The 100 TB shape these exist for: filtering a corpus against a keyed
  * reference set (decontamination ids, already-ingested fingerprints,
  * high-value orders) with a plain semi/anti join shuffles the ENTIRE
  * corpus on the key. Building a Bloom filter over the reference keys and
  * probing it in the scan stage drops almost every non-matching corpus row
  * before the exchange, so the shuffle carries only (matches + the fpp
  * share of misses). This is Spark's own runtime-filter trick
  * (`InjectRuntimeFilter`, which fires only under narrow plan conditions)
  * made explicit and unconditional; the exact join afterwards removes the
  * false positives, so results are bit-identical to the plain join.
  *
  * The filter is one aggregated value (`numBits/8` bytes, ~1.2 MiB at 1M
  * keys / 1% fpp) collected to the driver and re-embedded as a literal —
  * a bounded, O(sketch)-sized collect, never O(rows) — and the probe
  * (`might_contain(xxhash64(key))`) is a codegen'd bit test inside the
  * scan's WholeStageCodegen span.
  */
object BloomJoin {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (standard Bloom sizing: m = −n·ln p / ln²2). */
  private def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0 and 0 < fpp < 1")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** The serialized Bloom filter of `xxhash64(keyCol)` over `df` — usable
    * directly with [[mightContain]] against any other frame. Null keys
    * hash to the xxhash64 seed and at worst cost one false positive.
    * Returns null when `df` is empty (Spark's BloomFilterAggregate yields
    * null at cardinality 0) — [[semiJoin]]/[[antiJoin]] fall back to the
    * plain join in that case. */
  def buildFilter(
      df: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val agg = ColumnShim.column(
      new BloomFilterAggregate(
        ColumnShim.expression(xxhash64(col(keyCol))),
        Literal(expectedItems),
        Literal(optimalNumBits(expectedItems, fpp)))
        .toAggregateExpression())
    df.select(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd Bloom probe of `keyCol` against a [[buildFilter]] result. */
  def mightContain(filter: Array[Byte], keyCol: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnShim.expression(xxhash64(keyCol))))

  /** `left SEMI JOIN right` on `leftKey = rightKey`, with the left scan
    * pre-pruned by a Bloom filter of the right keys. Bit-identical to the
    * plain semi join (the join itself removes false positives); the
    * shuffle of `left` shrinks from |left| rows to roughly
    * |matches| + fpp·|non-matches|. */
  def semiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(right, rightKey, expectedItems, fpp)
    if (bf == null) {
      // empty build side: nothing can match, but route through the real
      // join so the result shape/semantics stay those of the plain join
      left.join(right, left(leftKey) === right(rightKey), "left_semi")
    } else {
      val pruned = left.filter(mightContain(bf, col(leftKey)))
      pruned.join(right, pruned(leftKey) === right(rightKey), "left_semi")
    }
  }

  /** `left ANTI JOIN right` on `leftKey = rightKey` with Bloom routing:
    * rows whose key the filter rules out are definite non-matches and
    * bypass the join entirely (narrow path, no shuffle); only the
    * might-contain minority takes the exact anti join. Null left keys
    * never match and are kept on whichever path they land. Bit-identical
    * to the plain anti join. */
  def antiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(right, rightKey, expectedItems, fpp)
    if (bf == null) {
      // empty build side: an anti join keeps EVERY left row; probing a
      // null filter would instead null out both branches and silently
      // drop them all
      left.join(right, left(leftKey) === right(rightKey), "left_anti")
    } else {
      val probe = mightContain(bf, col(leftKey))
      val definiteMiss = left.filter(!probe || col(leftKey).isNull)
      val maybe = left.filter(probe && col(leftKey).isNotNull)
      val candidates =
        maybe.join(right, maybe(leftKey) === right(rightKey), "left_anti")
      definiteMiss.unionByName(candidates)
    }
  }
}
