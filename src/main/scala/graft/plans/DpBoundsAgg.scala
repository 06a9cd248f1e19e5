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
  * Semantics mirror the factory exactly: each |value| (clamped to ≥ 1)
  * lands in power-of-two bin b = bitlength(⌊max(|x|,1)⌋); the SVT scan
  * takes one noisy threshold ⌊0.95·n⌋ + Geom(α/2) per group, adds
  * Geom(α) to each OCCUPIED bin's prefix count in bin order, and selects
  * the first crossing (falling back to the largest occupied bin); the
  * released bounds are ±2^selected. α = 4/ε as in the factory at
  * d_in = 1; an infinite ε is the deterministic noise-free path (the
  * DuckDB-oracled contract).
  *
  * Unlike the value-buffering quantile aggregate, the state here is a
  * FIXED 64-slot bin-count array — merge is elementwise addition — so
  * the aggregate is safe for unbounded groups at 100 TB: partial
  * aggregation combines map-side and only 64 longs per group shuffle.
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

  // bins 1..64 used; slot 0 unused (|x| clamped to >= 1 so bitlength >= 1)
  private val NumBins = 65

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
      val mag = math.max(math.abs(v.asInstanceOf[Double]), 1.0)
      val f = math.floor(mag)
      val bin =
        if (f >= Long.MaxValue.toDouble) 63
        else 64 - java.lang.Long.numberOfLeadingZeros(f.toLong)
      buffer(bin) += 1L
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
    var maxOccupied = -1
    var i = 0
    while (i < NumBins) {
      if (buffer(i) > 0) { total += buffer(i); maxOccupied = i }
      i += 1
    }
    if (maxOccupied < 0) null
    else {
      val halfAlpha = alpha / Rational(2)
      val threshold = NoiseGen.addLong(
        GeometricMechanism(halfAlpha), rng,
        math.floor(0.95 * total).toLong)
      var prefix = 0L
      var selected = -1
      i = 0
      while (i < NumBins && selected < 0) {
        if (buffer(i) > 0) {
          prefix += buffer(i)
          val noisyPrefix =
            NoiseGen.addLong(GeometricMechanism(alpha), rng, prefix)
          if (noisyPrefix >= threshold) selected = i
        }
        i += 1
      }
      if (selected < 0) selected = maxOccupied
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
