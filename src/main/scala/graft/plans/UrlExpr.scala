package graft.plans

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd URL canonicalization — the whole of
  * [[graft.ops.UrlOps.normalizeUrl]] as ONE expression with ONE regex
  * match per row.
  *
  * The column formulation ran `regexp_extract(url, UrlRe, g)` once per
  * component (7 full matches of the same pattern over the same string):
  * interpreted projections share no common subexpressions, and the
  * query-parameter lambda (a higher-order `filter`) excluded the
  * projection from whole-stage codegen, so nothing was ever fused or
  * deduplicated. This expression matches once and derives every component
  * from the groups inside one JIT-compiled kernel.
  *
  * Exact-parity notes (the DuckDB oracle and UrlOpsSpec pin the output):
  *   - the SAME `java.util.regex` pattern the column version compiled, via
  *     `Matcher.find()` — precisely what Spark's `regexp_extract` does —
  *     with null groups mapped to "" the same way;
  *   - lowercase through `UTF8String.toLowerCase`, the exact
  *     transformation Spark's `lower()` applies;
  *   - parameter split by `String.split("&", -1)` (keeps trailing
  *     empties, like Spark's three-arg split with limit −1), tracking
  *     params dropped by the same prefix tests, survivors sorted by
  *     UTF-8 byte order — `array_sort`'s binary string ordering — and
  *     re-joined;
  *   - unparsable rows (no match) return NULL, the reject-lane contract.
  *
  * Pushdown caveat: a caller-side `normalizeUrl(u).isNotNull` filter gets
  * pushed below the projection and evaluates this WHOLE kernel a second
  * time per row — the optimizer cannot see through an opaque expression
  * the way it simplified the old when()-shaped column to a one-extract
  * null test. Filter on the cheap equivalent instead (`hostOf(u) =!= ""`,
  * or a downstream `domain =!= ""`), which pushes as a single
  * regexp_extract.
  */
case class NormalizeUrlExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  // NULL for unparsable input even when the input itself is non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(url: Any): Any =
    UrlKernel.normalize(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, url => {
      val r = ctx.freshName("normUrl")
      s"""
         |UTF8String $r = graft.plans.UrlKernel.normalize($url);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeUrlExpr =
    copy(child = newChild)
}

/** Static kernel shared by NormalizeUrlExpr's interpreted and generated
  * paths. One compiled pattern per JVM, one `find()` per row.
  */
object UrlKernel {

  /** RFC-3986-shaped, identical to UrlOps.UrlRe — groups: 1 scheme,
    * 2 userinfo, 3 host, 4 port, 5 path, 6 query. */
  private val UrlPattern: Pattern = Pattern.compile(
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^/@?#]*)@)?([^/:?#]+)(?::([0-9]+))?" +
      "([^?#]*)(?:\\?([^#]*))?(?:#.*)?$")

  private val TrailingDot: Pattern = Pattern.compile("\\.$")

  private def group(m: java.util.regex.Matcher, i: Int): String = {
    val g = m.group(i)
    if (g == null) "" else g
  }

  /** Spark's lower(): UTF8String.toLowerCase, not locale-dependent
    * String.toLowerCase. */
  private def sparkLower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  private def isTracking(p: String): Boolean =
    p.isEmpty || p.startsWith("utm_") || p.startsWith("gclid=") ||
      p.startsWith("fbclid=") || p.startsWith("msclkid=") ||
      p.startsWith("ref=")

  /** array_sort's string order: unsigned UTF-8 byte lexicographic. */
  private val Utf8ByteOrder: java.util.Comparator[String] =
    (a: String, b: String) => {
      val x = a.getBytes(StandardCharsets.UTF_8)
      val y = b.getBytes(StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) {
        c = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (c != 0) c else x.length - y.length
    }

  def normalize(url: UTF8String): UTF8String = {
    val m = UrlPattern.matcher(url.toString)
    if (!m.find()) return null
    val scheme = sparkLower(group(m, 1))
    val host = TrailingDot.matcher(sparkLower(group(m, 3))).replaceAll("")
    val port = group(m, 4)
    val keptPort =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port
    val path = group(m, 5)
    val normPath = if (path.isEmpty) "/" else path
    val params = group(m, 6).split("&", -1).filterNot(isTracking)
    java.util.Arrays.sort(params.asInstanceOf[Array[AnyRef]],
      Utf8ByteOrder.asInstanceOf[java.util.Comparator[AnyRef]])
    val normQuery = if (params.isEmpty) "" else "?" + params.mkString("&")
    UTF8String.fromString(
      scheme + "://" + host + keptPort + normPath + normQuery)
  }
}
