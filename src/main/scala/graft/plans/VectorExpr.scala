package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two array columns — the inner loop of every
  * embedding-similarity operator ([[graft.ops.Similarity]]: brute-force /
  * LSH / IVF top-k, cosine dup pairs, SemDeDup).
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order
  * formulation: Spark evaluates HOF lambdas interpreted (one expression-tree
  * walk per ELEMENT) and excludes the enclosing projection from whole-stage
  * codegen. This expression keeps the projection inside the codegen span
  * and evaluates the pair through one JIT-compiled primitive loop
  * ([[VectorKernel.dot]]) shared by the interpreted and generated paths —
  * the NoiseExpr static-kernel pattern.
  *
  * Numeric parity is exact: the kernel folds `0.0 + a(0)·b(0) + …` in index
  * order, the same IEEE sequence the HOF fold performed, so every
  * similarity entry hashes identically against its oracle. Null semantics
  * likewise mirror the HOF chain: NULL input array, NULL element, or
  * mismatched lengths (zip_with pads with NULL) all yield NULL. FLOAT
  * arrays widen per element — bit-identical to casting the whole array to
  * ARRAY<DOUBLE> first, without materializing the cast copy.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch / null element, even for non-null inputs
  override def nullable: Boolean = true

  private def elementOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot expects ARRAY<DOUBLE> or ARRAY<FLOAT> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(
      a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.plans.VectorKernel.dot(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static loop kernel shared by DotProduct's interpreted and generated
  * paths. Returns a boxed Double so NULL (length mismatch / null element)
  * travels in-band; one box per ROW is noise next to the per-element work.
  */
object VectorKernel {
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean)
      : java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
