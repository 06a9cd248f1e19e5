package graft.plans

import graft.measurements.NoisyQuantileCore
import graft.random.{RandomSource, SplitMix}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** SQL aggregate behind `dp_quantile(value, q, lower, upper, epsilon)`:
  * buffers the group's values (the same memory profile as Spark's built-in
  * `percentile`, which also materializes per-group values) and applies the
  * exponential-mechanism-over-gaps noisy quantile at eval — the identical
  * [[NoisyQuantileCore.compute]] the programmatic factory
  * (`Aggregations.createQuantileMeasurement`, reference
  * `aggregations.py:1736`) runs per group. An infinite `epsilon` selects the
  * noise-free path: the linearly-interpolated empirical quantile over
  * clipped values, bit-identical to SQL `quantile_cont` on
  * `least(greatest(value, lower), upper)`.
  *
  * Noise independence across groups follows the [[graft.measurements.AddNoise]]
  * pattern: one SplitMix stream per (plan seed, task partition), advanced by
  * each group eval on that task — two groups never share a draw. At 100 TB
  * the buffered exact path is for moderate group cardinalities; unbounded
  * groups should use the histogram-sketch factory
  * (`NoisyQuantileSketch`), whose state is a fixed-width bin array.
  */
case class DpQuantileAgg(
    child: Expression,
    quantile: Double,
    lower: Double,
    upper: Double,
    epsilon: Option[Double],
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Double]]
    with UnaryLike[Expression] {

  require(quantile >= 0 && quantile <= 1,
    s"dp_quantile q must be in [0,1], got $quantile")
  require(lower <= upper, s"dp_quantile needs lower <= upper, got [$lower, $upper]")
  epsilon.foreach(e =>
    require(e > 0, s"dp_quantile epsilon must be positive (or infinite), got $e"))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "dp_quantile"

  // one stream per (seed, task): group evals on a task consume successive
  // draws, so per-group noise is independent without per-group seeding
  @transient private lazy val rng: RandomSource = {
    val pid = Option(org.apache.spark.TaskContext.get())
      .map(_.partitionId()).getOrElse(0)
    new SplitMix(seed ^ (pid.toLong * 0x9e3779b97f4a7c15L))
  }

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Double] =
    scala.collection.mutable.ArrayBuffer.empty[Double]

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Double],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buffer += v.asInstanceOf[Double]
    buffer
  }

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Double],
      other: scala.collection.mutable.ArrayBuffer[Double])
      : scala.collection.mutable.ArrayBuffer[Double] = {
    buffer ++= other
    buffer
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Double]): Any =
    NoisyQuantileCore.compute(buffer, quantile, lower, upper, epsilon, rng)

  override def serialize(
      buffer: scala.collection.mutable.ArrayBuffer[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Double](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getDouble()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DpQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DpQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DpQuantileAgg =
    copy(child = newChild)
}
