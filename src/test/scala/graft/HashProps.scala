package graft.ops

import org.apache.spark.sql.functions.lit
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The engine-portability contract every oracle rank depends on:
  * portableHash(key, salt) must equal
  * int(hex[0:15](sha256("salt|key"))) — pinned here against an
  * INDEPENDENT JVM MessageDigest implementation so any refactor of the
  * column expression (separator, slice width, radix) fails loudly
  * rather than as dozens of silently re-ranked oracle rows.
  */
object HashProps extends Properties("portableHash") {

  // fewer cases than the default 100: each evaluates a 1-row Spark job
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  property("matches the documented sha256 recipe and 60-bit range") =
    forAll(Gen.chooseNum(-1000000L, 1000000L),
      Gen.chooseNum(0L, 99L)) { (key, salt) =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$salt|$key".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val expected = java.lang.Long.parseLong(hex.take(15), 16)
      val got = graft.SharedSpark.session.range(1)
        .select(Dedup.portableHash(lit(key), salt).as("h"))
        .head().getLong(0)
      Prop(got == expected && got >= 0L && got < (1L << 60))
    }
}
