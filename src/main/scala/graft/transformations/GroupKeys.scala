package graft.transformations

import org.apache.spark.sql.Row

/** Collision-free string encoding of group-key tuples for `groupByKey`:
  * type tag + length framing per component, so `("a|b" as one token)` can never
  * collide with `("a","b")` and Long 1 never collides with String "1".
  */
private[graft] object GroupKeys {
  def encode(r: Row, idxs: Seq[Int]): String = {
    val sb = new StringBuilder
    idxs.foreach { i =>
      if (r.isNullAt(i)) sb.append("N;")
      else {
        val v = r.get(i)
        val tag = v match {
          case _: String            => 'S'
          case _: java.lang.Long    => 'L'
          case _: java.lang.Integer => 'I'
          case _: java.lang.Double  => 'D'
          case _: java.lang.Float   => 'F'
          case _: java.sql.Timestamp => 'T'
          case _: java.time.LocalDateTime => 'T'
          case _: java.sql.Date     => 'A'
          case _                    => 'O'
        }
        val s = v.toString
        sb.append(tag).append(s.length).append(':').append(s)
      }
    }
    sb.result()
  }
}
