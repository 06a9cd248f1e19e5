package graft.plans

import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k smallest aggregate over a struct column: keeps, per
  * group, the `k` smallest struct values under Spark's natural ascending
  * (nulls-first) field-by-field ordering, and evaluates to the kept
  * values as a sorted `array<struct>`.
  *
  * This is the map-side-combinable replacement for the
  * "`row_number()` window ≤ k" selection idiom: the window ships EVERY
  * row of a group to one reducer and sorts there (a hot group serializes
  * a task, and the exchange carries the whole input), while this
  * aggregate's partial buffers are capped at `k` entries, so the shuffle
  * carries at most `k · groups-per-partition` rows and a group holding
  * 10% of a 100 TB table contributes ≤ k rows per map partition. The
  * selection is identical to the window's because the struct embeds the
  * full ordering key (callers put the deterministic hash first and the
  * tie-break columns after it).
  *
  * `distinct = true` collapses exact-equal structs before counting
  * toward `k` (the "≤ k distinct keys" semantics of
  * `limit_keys_per_group` and basket capping); `distinct = false` keeps
  * a multiset (the "≤ k rows" semantics of `truncate_large_groups`,
  * where duplicate rows are legitimate distinct data and must each count).
  *
  * State is O(k) per group; merge is the same bounded insert. Reference
  * counterpart: none — the reference's truncation utilities
  * (`utils/truncation.py`) are window-based; this is the scale path.
  *
  * Memory safety: buffers are per-group object trees of up to k boxed
  * (row, count) entries, so peak map-side memory is bounded by
  * ObjectHashAggregate's sort-based fallback, which caps in-flight groups
  * at `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128). Sessions running these operators MUST NOT raise that
  * threshold toward unbounded values: the round-17 decade probe
  * (TopKProbe, 64M rows) OOM'd a 48g JVM at fallbackThreshold=1e6 while
  * the default completed — the fallback IS the memory-safety mechanism.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedTopKAgg.Buffer]
    with UnaryLike[Expression] {

  require(k >= 0 && k <= (1 << 22),
    s"bounded_top_k k must be in [0, ${1 << 22}], got $k")

  private def structType: StructType =
    child.dataType.asInstanceOf[StructType]

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_top_k needs an orderable struct child, got $other")
    }

  @transient private lazy val ordering: Comparator[InternalRow] = {
    val ord = RowOrdering.createNaturalAscendingOrdering(
      structType.fields.map(_.dataType).toIndexedSeq)
    new Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(a, b)
    }
  }

  override def createAggregationBuffer(): BoundedTopKAgg.Buffer =
    new BoundedTopKAgg.Buffer(
      new java.util.TreeMap[InternalRow, Long](ordering))

  // The ordering struct the callers pass embeds the selection hash
  // (unhex(sha2(to_json(...)))): evaluated per input row. A bare
  // `child.eval(input)` walks that expression tree INTERPRETED — measured
  // round 18 as the dominant per-row cost of the agg path vs the window
  // path it replaced (whose sort keys were computed by whole-stage
  // codegen). Routing the update through a generated UnsafeProjection
  // compiles the same tree once per task; falls back to the interpreted
  // projection automatically if codegen fails.
  @transient private lazy val childProj: UnsafeProjection =
    UnsafeProjection.create(Seq(child))

  override def update(
      buffer: BoundedTopKAgg.Buffer,
      input: InternalRow): BoundedTopKAgg.Buffer = {
    val projected = childProj(input)
    if (!projected.isNullAt(0)) {
      val v = projected.getStruct(0, structType.fields.length)
      BoundedTopKAgg.offer(
        buffer, v, 1L, k, distinct,
        copyOnInsert = true)
    }
    buffer
  }

  override def merge(
      buffer: BoundedTopKAgg.Buffer,
      other: BoundedTopKAgg.Buffer): BoundedTopKAgg.Buffer = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // rows in a deserialized buffer are already private copies
      BoundedTopKAgg.offer(
        buffer, e.getKey, e.getValue, k, distinct, copyOnInsert = false)
    }
    buffer
  }

  override def eval(buffer: BoundedTopKAgg.Buffer): Any = {
    val out = new Array[Any](buffer.total.toInt)
    var i = 0
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey; i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType.fields.map(_.dataType))

  override def serialize(buffer: BoundedTopKAgg.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.map.size())
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val u = toUnsafe(e.getKey)
      val rowBytes = u.getBytes
      out.writeLong(e.getValue)
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Buffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val fields = structType.fields.length
    var i = 0
    while (i < n) {
      val cnt = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(fields)
      row.pointTo(rowBytes, len)
      buf.map.put(row, cnt)
      buf.total += cnt
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
}

object BoundedTopKAgg {
  /** Sorted multiset of ≤ k struct rows: TreeMap value = multiplicity
    * (always 1 in distinct mode), `total` = Σ multiplicities ≤ k. */
  final class Buffer(val map: java.util.TreeMap[InternalRow, Long]) {
    var total: Long = 0L
  }

  /** Aggregate Column over `order` as positionally-named struct fields
    * `_o0.._oN` — the caller reconstructs its columns from those names
    * after `explode`. */
  def column(
      order: Seq[org.apache.spark.sql.Column],
      k: Int,
      distinct: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.struct
    val named = order.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    org.apache.spark.sql.graftshim.ColumnShim.column(
      BoundedTopKAgg(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          struct(named: _*)),
        k, distinct).toAggregateExpression())
  }

  /** Insert `row` with multiplicity `cnt`, keeping only the k smallest.
    * `copyOnInsert` materializes a private copy before storing (an update
    * path row aliases the scan's reused buffer; merge rows are already
    * private). */
  def offer(
      b: Buffer,
      row: InternalRow,
      cnt: Long,
      k: Int,
      distinct: Boolean,
      copyOnInsert: Boolean): Unit = {
    if (k == 0) return
    if (distinct) {
      if (b.map.containsKey(row)) return
      if (b.map.size() >= k) {
        val last = b.map.lastKey()
        if (b.map.comparator().compare(row, last) >= 0) return
        b.map.remove(last)
        b.total -= 1
      }
      b.map.put(if (copyOnInsert) row.copy() else row, 1L)
      b.total += 1
    } else {
      if (b.total >= k) {
        val last = b.map.lastKey()
        if (b.map.comparator().compare(row, last) >= 0) return
      }
      if (b.map.containsKey(row)) {
        // the stored key equal to `row` under the comparator
        val key = b.map.ceilingKey(row)
        b.map.put(key, b.map.get(key) + cnt)
      } else {
        b.map.put(if (copyOnInsert) row.copy() else row, cnt)
      }
      b.total += cnt
      // trim the largest entries back to k total
      while (b.total > k) {
        val last = b.map.lastEntry()
        val excess = b.total - k
        if (last.getValue <= excess) {
          b.total -= last.getValue
          b.map.remove(last.getKey)
        } else {
          b.map.put(last.getKey, last.getValue - excess)
          b.total -= excess
        }
      }
    }
  }
}
