package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Within-bucket dedup verification: given one candidate bucket as a
  * sorted `array<struct<id, v array<double>>>`, returns the ids that
  * have an EARLIER (smaller-id) neighbor in the bucket at
  * `cosine >= threshold` — i.e. the rows SemDeDup drops.
  *
  * This replaces the materialize-then-join verify pipeline
  * (explode all i<j candidate pairs → shuffle-distinct them → two
  * shuffle joins re-attaching both embeddings → cosine filter). That
  * pipeline's exchanges carry every candidate pair plus two full
  * vectors; at the sf100 spot-check (20M vectors) it spilled >63 GB of
  * shuffle scratch and DNF'd on disk, while the information that leaves
  * a bucket is only "which ids drop". Evaluating the cosines inside the
  * bucket row turns the verify stage into a narrow per-row pass: the
  * only exchange left in SemDeDup's verify is the bucket-grouping
  * aggregation itself (one corpus-sized shuffle), and the output is the
  * dropped-id stream. Per-bucket work is the same i<j cosine loop the
  * join pipeline evaluated, minus pair materialization; buckets are
  * capped at maxBucketSize structs, so a row's working set is bounded —
  * but the BYTE bound scales with embedding width (one struct ≈ 8·dim
  * bytes, and the bucket-grouping collect_list buffer holds
  * maxBucketSize of them per in-flight bucket): the default cap of 500
  * is ~5 MB only near the test fixture's dim≈1000; at dim 4096 the
  * same cap is ~16 MB per bucket row, a memory profile the old
  * ids-only collection never had. For large dims, derive the cap from
  * a byte budget instead of a row count: maxBucketSize ≈
  * bytesBudget / (8 · dim), e.g. a 5 MB budget at dim 4096 → cap ≈ 160.
  *
  * Value parity with the join formulation (pinned by OpsSpec +
  * the q_semdedup oracle):
  *   - cosine = dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) with the
  *     same in-order double summation as [[VectorKernel.dot]];
  *   - a NULL cosine (null element / length mismatch) never qualifies —
  *     the SQL filter folded NULL to false;
  *   - a NaN cosine (zero-norm vector) QUALIFIES — Spark's ordering
  *     places NaN above every double, so `cosine >= t` was TRUE;
  *   - a NULL id neither drops nor is dropped — the old re-attach joins
  *     were equi-joins on the id, which a null key never matches;
  *   - any qualifying pair (i, j), i < j, drops id j, whether or not i
  *     was itself dropped — matching the pair-filter semantics.
  */
case class EarlierNeighborIds(child: Expression, threshold: Double)
    extends UnaryExpression {

  private lazy val idType: DataType = child.dataType match {
    case ArrayType(StructType(fields), _) => fields(0).dataType
    case _ => NullType
  }

  override def dataType: DataType = ArrayType(idType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 &&
          fields(1).dataType.isInstanceOf[ArrayType] &&
          fields(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "earlier-neighbor ids expects ARRAY<STRUCT<id, v ARRAY<DOUBLE>>>, " +
        s"got ${t.catalogString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    VerifyKernel.earlierNeighborIds(
      arr.asInstanceOf[ArrayData], idType, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idTypeRef = ctx.addReferenceObj("idType", idType)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.plans.VerifyKernel.earlierNeighborIds(" +
        s"$a, $idTypeRef, $threshold);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): EarlierNeighborIds =
    copy(child = newChild)
}

object VerifyKernel {

  /** Dropped ids of one bucket; see [[EarlierNeighborIds]] for the exact
    * parity contract. The inner loop early-exits per j on the first
    * qualifying earlier neighbor.
    */
  def earlierNeighborIds(
      bucket: ArrayData, idType: DataType, threshold: Double): ArrayData = {
    val n = bucket.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Any](n) // null = id unusable (null key never joins)
    val vecs = new Array[Array[Double]](n) // null entry = vector unusable
    val norms = new Array[Double](n)
    var k = 0
    while (k < n) {
      if (!bucket.isNullAt(k)) {
        val row = bucket.getStruct(k, 2)
        if (!row.isNullAt(0)) ids(k) = row.get(0, idType)
        if (!row.isNullAt(1)) {
          val v = row.getArray(1)
          val len = v.numElements()
          var ok = true
          val d = new Array[Double](len)
          var i = 0
          while (ok && i < len) {
            if (v.isNullAt(i)) ok = false
            else { d(i) = v.getDouble(i); i += 1 }
          }
          if (ok) {
            vecs(k) = d
            // same in-order double summation as VectorKernel.dot
            var s = 0.0
            i = 0
            while (i < len) { s += d(i) * d(i); i += 1 }
            norms(k) = math.sqrt(s)
          }
        }
      }
      k += 1
    }
    val dropped = new Array[Any](n)
    var nd = 0
    var j = 1
    while (j < n) {
      val vj = vecs(j)
      if (vj != null && ids(j) != null) {
        var i = 0
        var hit = false
        while (!hit && i < j) {
          val vi = vecs(i)
          // null id or length mismatch => the old join/dot was NULL =>
          // the pair never qualified
          if (vi != null && ids(i) != null && vi.length == vj.length) {
            var dot = 0.0
            var t = 0
            while (t < vi.length) { dot += vi(t) * vj(t); t += 1 }
            val cos = dot / (norms(i) * norms(j))
            // NaN qualifies (Spark orders NaN above every double)
            if (cos >= threshold || java.lang.Double.isNaN(cos)) hit = true
          }
          i += 1
        }
        if (hit) { dropped(nd) = ids(j); nd += 1 }
      }
      j += 1
    }
    val out = new Array[Any](nd)
    System.arraycopy(dropped, 0, out, 0, nd)
    new GenericArrayData(out)
  }
}
