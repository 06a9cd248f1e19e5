package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

/** Codegen'd random-hyperplane LSH signature over the plane family
  * [firstPlane, firstPlane + planes) — the corpus-side hot loop of
  * [[graft.ops.Similarity.lshTopK]] and the banded cosine dedup.
  *
  * Replaces `planes` separate `aggregate(zip_with(...))` higher-order
  * folds per row (each walking the vector with an interpreted lambda that
  * itself evaluates an `xxhash64` expression per element) with one
  * JIT-compiled double loop. Bit-identical by construction: the sign of
  * plane p at dimension i is `pmod(xxhash64(p, i), 2) == 0 ? +1 : -1`
  * where xxhash64 folds seed 42 → hashInt(p) → hashInt(i) — reproduced
  * here through the same `XXH64.hashInt` statics Spark's expression
  * calls; projections fold `0.0 + x(0)·s₀ + …` in index order (same IEEE
  * sequence); a NaN projection SETS its bit (Spark SQL orders NaN above
  * every double, so the HOF chain's `proj >= 0` was true — Java's
  * comparison would say false, a trap the parity spec caught). NULL
  * handling mirrors the HOF chain's CaseWhen exactly: a NULL vector or a
  * NULL element made every per-plane `when(proj >= 0, bit)` fall to its
  * `otherwise(0L)`, so the signature was 0L, never NULL — this expression
  * is therefore non-nullable and returns 0L on those inputs. FLOAT arrays
  * widen per element, bit-identical to a prior ARRAY<DOUBLE> cast.
  */
case class LshSignature(child: Expression, firstPlane: Int, planes: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 63, "planes must be in [1, 63]")

  override def dataType: DataType = LongType
  // NULL input/element folded to bit 0 in the HOF chain -> always a long
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh signature expects ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val vec = child.eval(input)
    if (vec == null) 0L
    else VectorKernel.lshSignature(
      vec.asInstanceOf[ArrayData], isFloat, firstPlane, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = ${c.isNull}
        |  ? 0L
        |  : graft.plans.VectorKernel.lshSignature(
        |      ${c.value}, $isFloat, $firstPlane, $planes);
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** Codegen'd multi-probe order for one LSH table: the plane indices of
  * [firstPlane, firstPlane + planes), as ARRAY<INT>, sorted by
  * |projection| ascending — which bit the query flips first/second/…
  * when probing neighbor buckets.
  *
  * Replaces the last interpreted stretch of lshTopK's query side: `planes`
  * aggregate(zip_with(...)) folds PLUS an array_sort/transform lambda pair
  * per table, all evaluated per query row outside whole-stage codegen.
  * Output parity with that chain (tie, NaN, NULL semantics) is documented
  * on [[VectorKernel.lshProbeOrder]] and pinned by LshSignatureSpec.
  */
case class LshProbeOrder(child: Expression, firstPlane: Int, planes: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 63, "planes must be in [1, 63]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // NULL input degrades to identity order, mirroring the HOF chain
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh probe order expects ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any =
    new GenericArrayData(VectorKernel.lshProbeOrder(
      child.eval(input).asInstanceOf[ArrayData], isFloat, firstPlane, planes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |    graft.plans.VectorKernel.lshProbeOrder(
        |      ${c.isNull} ? null : ${c.value}, $isFloat, $firstPlane, $planes));
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshProbeOrder =
    copy(child = newChild)
}

/** Static loop kernels shared by the vector expressions' interpreted and
  * generated paths. Boxed returns carry NULL (null element / length
  * mismatch) in-band; one box per ROW is noise next to the per-element
  * work.
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

  /** Signature of the plane family [firstPlane, firstPlane + planes) for
    * one vector; 0L when any element is null (the HOF chain's CaseWhen
    * folded a NULL projection to bit 0 on every plane). Sign replication:
    * xxhash64(plane: INT, i: INT) with Spark's default seed 42 folds
    * hashInt(plane, 42) then hashInt(i, previous) — the exact sequence
    * the XxHash64 expression evaluates.
    */
  def lshSignature(vec: ArrayData, isFloat: Boolean,
      firstPlane: Int, planes: Int): Long = {
    val n = vec.numElements()
    // empty vector: zip_with pads the empty side against the DESCENDING
    // [0, -1] sequence that sequence(0, size-1) yields at size = 0, so
    // every HOF projection was NULL -> bit 0; an empty fold here would
    // instead give +0.0 >= 0 on every plane (all bits SET)
    if (n == 0) return 0L
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val planeHash =
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(firstPlane + p, 42L)
      var proj = 0.0
      i = 0
      while (i < n) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, planeHash)
        // pmod(h, 2) == 0  <=>  h is even
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        proj += x * sign
        i += 1
      }
      // Spark SQL orders NaN ABOVE every double, so `proj >= 0` is TRUE
      // for a NaN projection — unlike Java's comparison
      if (proj >= 0 || java.lang.Double.isNaN(proj)) sig += (1L << p)
      p += 1
    }
    sig
  }

  /** Plane indices [0, planes) of the family [firstPlane, firstPlane +
    * planes), ordered by |projection| ascending — the multi-probe order of
    * [[graft.ops.Similarity.lshTopK]]'s query side (flip the lowest-margin
    * plane first). Mirrors the retired HOF chain
    * `transform(array_sort(zip_with(projArr, sequence, struct(abs, p))), p)`
    * exactly:
    *   - ties on equal |margin| break by plane index ascending (the struct
    *     sort's second field);
    *   - a NaN projection sorts ABOVE every non-NaN (Spark double order),
    *     with index tie-break among NaNs — `java.lang.Double.compare`
    *     agrees on both counts;
    *   - a NULL vector or any NULL element made every per-plane projection
    *     NULL, so the struct sort fell through to the index tie-break:
    *     identity order.
    */
  def lshProbeOrder(vec: ArrayData, isFloat: Boolean,
      firstPlane: Int, planes: Int): Array[Int] = {
    val order = Array.tabulate(planes)(identity)
    if (vec == null) return order
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return order
      i += 1
    }
    val margins = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val planeHash =
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(firstPlane + p, 42L)
      var proj = 0.0
      i = 0
      while (i < n) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, planeHash)
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        proj += x * sign
        i += 1
      }
      margins(p) = math.abs(proj)
      p += 1
    }
    // insertion sort by (margin, index): planes <= 63, and stability gives
    // the index tie-break for free since the input order IS index order
    var a = 1
    while (a < planes) {
      val op = order(a); val om = margins(op)
      var b = a - 1
      while (b >= 0 && java.lang.Double.compare(margins(order(b)), om) > 0) {
        order(b + 1) = order(b); b -= 1
      }
      order(b + 1) = op
      a += 1
    }
    order
  }
}
