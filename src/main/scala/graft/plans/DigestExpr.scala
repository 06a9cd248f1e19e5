package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd SHA-256 lane extraction: the 60-bit lanes
  * `conv(substring(sha2(s, 256), 1 + 15·lane, 15), 16, 10)` for
  * lane = 0 … numLanes−1, computed straight from the digest BYTES.
  *
  * The column formulation round-trips every row through a 64-char hex
  * string, `numLanes` substring copies, and `numLanes` conv() base
  * conversions that each build another string before the long parse —
  * ~10 short-lived allocations per row on a path that runs once per
  * (key, element) of a corpus-sized explode
  * ([[graft.ops.Incremental.minhashStates]]). Measured at the sf10
  * fixture this allocation churn is what pushed q_minhash_states past
  * the linear envelope. This expression digests the UTF-8 bytes once
  * (thread-local MessageDigest, zero per-row lookups) and assembles each
  * lane from the nibbles directly — VALUE-IDENTICAL by construction: hex
  * char j of sha2's output is nibble j of the digest, and 15 hex digits
  * parse to the same non-negative long conv() returns.
  */
case class Sha2Lanes(child: Expression, numLanes: Int)
    extends UnaryExpression {
  require(numLanes >= 1 && numLanes <= 4,
    "a SHA-256 digest holds at most 4 disjoint 60-bit lanes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sha2 lanes expects STRING input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    DigestKernel.sha2Lanes(s.asInstanceOf[UTF8String], numLanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.plans.DigestKernel.sha2Lanes($s, $numLanes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Sha2Lanes =
    copy(child = newChild)
}

object DigestKernel {
  private val sha256 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** 60-bit lanes of sha256(s): lane i = hex digits [15i, 15i+15) of the
    * digest, as a long. Matches conv(substring(hex, 1+15i, 15), 16, 10)
    * exactly (hex digit j = nibble j; 15 nibbles = 60 bits, always
    * non-negative in a long).
    */
  def sha2Lanes(s: UTF8String, numLanes: Int): ArrayData = {
    val md = sha256.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    val lanes = new Array[Long](numLanes)
    var lane = 0
    while (lane < numLanes) {
      var v = 0L
      var k = 15 * lane
      val end = k + 15
      while (k < end) {
        val b = dig(k >> 1) & 0xff
        val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
        v = (v << 4) | nib
        k += 1
      }
      lanes(lane) = v
      lane += 1
    }
    new GenericArrayData(lanes)
  }
}
