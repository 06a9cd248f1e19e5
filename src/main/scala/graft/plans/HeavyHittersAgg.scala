package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary over a string column.
  *
  * The sketch keeps at most `k` counters; its state is O(k) regardless of
  * input size, and two summaries merge by adding counters and then
  * subtracting the (k+1)-th largest combined count from every counter —
  * the classic mergeable-summaries result (Agarwal et al., PODS'12). That
  * makes it the 100 TB answer to "top sources / domains / tokens": a single
  * partial-aggregate pass with constant-size state per partition and one
  * O(k) merge per partition at the driver or reducer, versus a full
  * `GROUP BY item` shuffle of every distinct item.
  *
  * Guarantees (deterministic, order-independent):
  *   - every surviving counter `c` satisfies `c <= f <= c + err` where `f`
  *     is the item's true count and `err` is the summary-wide decrement
  *     total (exposed per row as `count_max - count_min`);
  *   - `err <= n / (k + 1)`, so any item with `f > n / (k + 1)` is present;
  *   - when the column has at most `k` distinct values no decrement ever
  *     happens: `err = 0` and every count is EXACT — the path the driver
  *     oracle pins, while the eviction path's bounds are suite-pinned
  *     (its exact counter values are arrival-order-dependent by design).
  *
  * Reference counterpart: none — tumult-core's GroupBy/Count
  * (`transformations/spark_transformations/groupby.py`) always keys the
  * full domain; this sketch is the scale path the reference lacks.
  *
  * Output: `array<struct<item string, count_min bigint, count_max bigint>>`
  * sorted by (count_min desc, item) so the array itself is deterministic
  * whenever the counter multiset is.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[HeavyHittersAgg.Summary]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 100000, s"heavy_hitters k must be in [1, 100000], got $k")

  override def dataType: DataType = HeavyHittersAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersAgg.Summary =
    new HeavyHittersAgg.Summary(new java.util.HashMap[String, Long](), 0L)

  override def update(
      buffer: HeavyHittersAgg.Summary,
      input: InternalRow): HeavyHittersAgg.Summary = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused scan buffer; materialize a JVM copy
      HeavyHittersAgg.offer(buffer, v.asInstanceOf[UTF8String].toString, 1L, k)
    }
    buffer
  }

  override def merge(
      buffer: HeavyHittersAgg.Summary,
      other: HeavyHittersAgg.Summary): HeavyHittersAgg.Summary = {
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.counters.put(
        e.getKey, buffer.counters.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    buffer.err += other.err
    HeavyHittersAgg.shrink(buffer, k)
    buffer
  }

  override def eval(buffer: HeavyHittersAgg.Summary): Any = {
    import scala.jdk.CollectionConverters._
    val rows = buffer.counters.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
      .map { e =>
        InternalRow(
          UTF8String.fromString(e.getKey),
          e.getValue,
          e.getValue + buffer.err)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: HeavyHittersAgg.Summary): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val entries = buffer.counters.entrySet().asScala.toArray
    val keyBytes = entries.map(e => e.getKey.getBytes("UTF-8"))
    var size = 8 + 4
    keyBytes.foreach(b => size += 4 + b.length + 8)
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(buffer.err)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(keyBytes(i).length)
      bb.put(keyBytes(i))
      bb.putLong(entries(i).getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersAgg.Summary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val err = bb.getLong()
    val n = bb.getInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, "UTF-8"), bb.getLong())
      i += 1
    }
    new HeavyHittersAgg.Summary(m, err)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  /** Mutable MG state: `counters` (≤ k live entries after shrink) plus the
    * cumulative decrement `err` that widens every count's upper bound. */
  final class Summary(
      val counters: java.util.HashMap[String, Long],
      var err: Long)

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_min", LongType, nullable = false),
      StructField("count_max", LongType, nullable = false))),
    containsNull = false)

  /** Add `weight` to `item`'s counter, evicting by the MG decrement rule if
    * the counter table would exceed `k` entries. */
  def offer(s: Summary, item: String, weight: Long, k: Int): Unit = {
    if (s.counters.containsKey(item)) {
      s.counters.put(item, s.counters.get(item) + weight)
    } else if (s.counters.size() < k) {
      s.counters.put(item, weight)
    } else {
      // no free counter: decrement all by the largest amount that keeps the
      // new item out — min(weight, smallest live counter) per MG round,
      // applied in one batched step so a heavy incoming weight (from a
      // merge) needs no loop
      var minC = Long.MaxValue
      val it = s.counters.values().iterator()
      while (it.hasNext) minC = math.min(minC, it.next())
      val dec = math.min(weight, minC)
      decrementAll(s, dec)
      if (weight > dec) {
        s.counters.put(item, weight - dec)
        shrink(s, k)
      }
    }
  }

  /** Subtract `dec` from every counter, dropping non-positive ones, and add
    * `dec` to the summary-wide error. */
  private def decrementAll(s: Summary, dec: Long): Unit = {
    if (dec <= 0) return
    val it = s.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
    s.err += dec
  }

  /** Restore the ≤ k-counters invariant after a merge: subtract the
    * (k+1)-th largest count from all (Agarwal et al. merge rule). */
  def shrink(s: Summary, k: Int): Unit = {
    if (s.counters.size() <= k) return
    import scala.jdk.CollectionConverters._
    val counts = s.counters.values().asScala.toArray.sorted(Ordering[Long].reverse)
    decrementAll(s, counts(k))
    // ties at the pivot can leave > k entries at equal counts; drop the
    // lexicographically-largest extras deterministically
    if (s.counters.size() > k) {
      val extra = s.counters.entrySet().asScala.toArray
        .sortBy(e => (e.getValue, e.getKey))(
          Ordering.Tuple2(Ordering[Long], Ordering[String].reverse))
        .take(s.counters.size() - k)
      extra.foreach(e => s.counters.remove(e.getKey))
    }
  }
}
