package graft.metrics

import graft.exact.{ExactNum, Rational}
import org.apache.spark.sql.DataFrame

/** Distance computation for test tooling (reference `metrics.py` `.distance`
  * methods, e.g. `SymmetricDifference.distance` via `exceptAll`,
  * `metrics.py:324-329`). Positional metrics collect to the driver — use on
  * test-sized data only; production code never computes distances, it only
  * *bounds* them through stability functions.
  */
object MetricDistance {

  def compute(metric: Metric, a: Any, b: Any): ExactNum = metric match {
    case SymmetricDifference =>
      val (da, db) = (a.asInstanceOf[DataFrame], b.asInstanceOf[DataFrame])
      ExactNum(da.exceptAll(db).count() + db.exceptAll(da).count())

    case HammingDistance =>
      val (da, db) = (a.asInstanceOf[DataFrame], b.asInstanceOf[DataFrame])
      require(da.count() == db.count(), "Hamming requires equal sizes")
      ExactNum(da.exceptAll(db).count() max db.exceptAll(da).count())

    case AbsoluteDifference =>
      (ExactNum.fromDouble(toDouble(a)) - ExactNum.fromDouble(toDouble(b))).abs

    case SumOf(inner) =>
      val (xs, ys) = (a.asInstanceOf[Seq[Any]], b.asInstanceOf[Seq[Any]])
      require(xs.size == ys.size)
      xs.zip(ys)
        .map { case (x, y) => compute(inner, x, y) }
        .foldLeft(ExactNum.zero)(_ + _)

    case RootSumOfSquared(inner) =>
      val (xs, ys) = (a.asInstanceOf[Seq[Any]], b.asInstanceOf[Seq[Any]])
      require(xs.size == ys.size)
      val sumSq = xs
        .zip(ys)
        .map { case (x, y) => compute(inner, x, y).pow2 }
        .foldLeft(ExactNum.zero)(_ + _)
      sumSq.sqrt

    case OnColumn(column, inner) =>
      val da = a.asInstanceOf[DataFrame].select(column).collect().map(_.get(0))
      val db = b.asInstanceOf[DataFrame].select(column).collect().map(_.get(0))
      compute(inner, da.toSeq, db.toSeq)

    case OnColumns(ms) =>
      ms.map(m => compute(m, a, b)).foldLeft(ExactNum.zero)(_ + _)

    case IfGroupedBy(column, inner) =>
      val da = a.asInstanceOf[DataFrame]
      val db = b.asInstanceOf[DataFrame]
      val keys = (da.select(column).distinct().collect() ++
        db.select(column).distinct().collect()).map(_.get(0)).distinct
      val perGroup = keys.toSeq.map { k =>
        import org.apache.spark.sql.functions.col
        val fa = da.filter(col(column) <=> org.apache.spark.sql.functions.lit(k))
        val fb = db.filter(col(column) <=> org.apache.spark.sql.functions.lit(k))
        inner match {
          case SumOf(m)            => compute(m, fa, fb)
          case RootSumOfSquared(m) => compute(m, fa, fb)
          case m                   => compute(m, fa, fb)
        }
      }
      inner match {
        case RootSumOfSquared(_) =>
          perGroup.map(_.pow2).foldLeft(ExactNum.zero)(_ + _).sqrt
        case _ => perGroup.foldLeft(ExactNum.zero)(_ + _)
      }

    case DictMetric(ms) =>
      val (ma, mb) =
        (a.asInstanceOf[Map[String, Any]], b.asInstanceOf[Map[String, Any]])
      ms.map { case (k, m) => compute(m, ma(k), mb(k)) }
        .foldLeft(ExactNum.zero)(_ + _)

    case AddRemoveKeys(keyColumns) =>
      // number of key values added or removed across all tables
      val (ma, mb) = (
        a.asInstanceOf[Map[String, DataFrame]],
        b.asInstanceOf[Map[String, DataFrame]]
      )
      val keysOf = (m: Map[String, DataFrame]) =>
        keyColumns.toSeq.flatMap { case (table, kc) =>
          m(table).select(kc).distinct().collect().toSeq.map(_.get(0))
        }.toSet
      val (ka, kb) = (keysOf(ma), keysOf(mb))
      ExactNum(((ka diff kb) ++ (kb diff ka)).size.toLong)

    case NullMetric =>
      throw new UnsupportedOperationException("NullMetric has no distance")
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case f: Float  => f.toDouble
    case other     => other.toString.toDouble
  }
}
