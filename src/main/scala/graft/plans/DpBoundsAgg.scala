package graft.plans

import graft.exact.Rational
import graft.measurements.{GeometricMechanism, NoiseGen}
import graft.random.{RandomSource, SplitMix}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** SQL aggregate behind `dp_bounds(value, epsilon)`: the group's DP
  * magnitude bounds as a `STRUCT<lower DOUBLE, upper DOUBLE>`, the SQL
  * face of `Aggregations.createBoundsMeasurement` (reference
  * `aggregations.py:2059`, mechanism `spark_measurements.py:590-874`).
  *
  * Semantics mirror the factory's float-domain path: each value lands in
  * bin b = clamp(ceil(log2(|x|)), -100, 100), with x = 0 mapping to bin
  * -100 (reference `aggregations.py:2216-2226`); the SVT scan takes one
  * noisy threshold ⌊0.95·n⌋ + Geom(α/2) per group, adds Geom(α) to
  * EVERY bin's prefix count in bin order — empty bins included, exactly
  * as the reference materializes all 201 bins through the outer-joined
  * bucket group keys — and selects the first crossing, falling back to
  * the TOP bin (+100) when nothing crosses. The released bounds are
  * ±2^selected. α = 4/ε as in the factory at d_in = 1; an infinite ε is
  * the deterministic noise-free path (the DuckDB-oracled contract). Note
  * that under a tiny group (n = 1 ⇒ threshold 0) the noise-free scan
  * legitimately selects bin -100 — prefix 0 ≥ threshold 0 at the very
  * first bin — matching the reference mechanism's output exactly.
  *
  * ceil(log2(|x|)) is computed exactly from the IEEE exponent (not via a
  * float log), so binning never drifts at exact powers of two; the
  * DuckDB oracle replays it with a log2 + two-sided power-of-two fix-up
  * that is likewise exact.
  *
  * The state is a FIXED 201-slot bin-count array — merge is elementwise
  * addition — so the aggregate is safe for unbounded groups at 100 TB:
  * partial aggregation combines map-side and only 201 longs per group
  * shuffle.
  *
  * Noise independence across groups follows the [[DpQuantileAgg]]
  * pattern: one SplitMix stream per (plan seed, task partition),
  * advanced by each group eval.
  */
case class DpBoundsAgg(
    child: Expression,
    epsilon: Option[Double],
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  epsilon.foreach(e =>
    require(e > 0, s"dp_bounds epsilon must be positive (or infinite), got $e"))

  // ranks -100..100 inclusive; slot i holds rank i - 100
  private val MinRank = -100
  private val MaxRank = 100
  private val NumBins = MaxRank - MinRank + 1

  override def dataType: DataType = StructType(Seq(
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false)))
  override def nullable: Boolean = true // empty group -> NULL
  override def prettyName: String = "dp_bounds"

  @transient private lazy val rng: RandomSource = {
    val pid = Option(org.apache.spark.TaskContext.get())
      .map(_.partitionId()).getOrElse(0)
    new SplitMix(seed ^ (pid.toLong * 0x9e3779b97f4a7c15L))
  }

  @transient private lazy val alpha: Rational =
    epsilon match {
      case Some(e) => Rational(4) / Rational.fromDouble(e)
      case None    => Rational.zero
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](NumBins)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val mag = math.abs(v.asInstanceOf[Double])
      buffer(DpBoundsAgg.rankOf(mag) - MinRank) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumBins) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var total = 0L
    var i = 0
    while (i < NumBins) { total += buffer(i); i += 1 }
    if (total == 0L) null // all-null group: reference domain forbids nulls
    else {
      val halfAlpha = alpha / Rational(2)
      val threshold = NoiseGen.addLong(
        GeometricMechanism(halfAlpha), rng,
        math.floor(0.95 * total).toLong)
      // every bin gets a noise draw and a crossing test, empty or not —
      // the reference adds Geom(alpha) to all materialized bins and an
      // empty bin CAN be selected (spark_measurements.py:843-874)
      var prefix = 0L
      var selected = Int.MinValue
      i = 0
      while (i < NumBins && selected == Int.MinValue) {
        prefix += buffer(i)
        val noisyPrefix =
          NoiseGen.addLong(GeometricMechanism(alpha), rng, prefix)
        if (noisyPrefix >= threshold) selected = i + MinRank
        i += 1
      }
      if (selected == Int.MinValue) selected = MaxRank // reference: max rank
      val upper = math.pow(2.0, selected)
      InternalRow(-upper, upper)
    }
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * NumBins)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](NumBins)
    var i = 0
    while (i < NumBins && bb.remaining() >= 8) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DpBoundsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DpBoundsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DpBoundsAgg =
    copy(child = newChild)
}

object DpBoundsAgg {
  /** Exact clamp(ceil(log2(mag)), -100, 100) for mag > 0: the IEEE
    * exponent is floor(log2) for normal doubles, bumped unless mag is an
    * exact power of two. Subnormals mis-report the exponent but clamp to
    * -100 regardless (2^-100 is far above the subnormal range). Exposed
    * for the property suite (pinned against a BigDecimal replay).
    */
  private[graft] def rankOf(mag: Double): Int = {
    if (mag == 0.0) -100
    else {
      val e = java.lang.Math.getExponent(mag)
      val r = if (mag == math.pow(2.0, e)) e else e + 1
      math.max(-100, math.min(100, r))
    }
  }
}
