package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One local Spark session per suite (reference `utils/testing.py:430-516`
  * PySparkTest analog) with order-insensitive DataFrame comparison.
  */
trait SharedSpark extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SharedSpark.session

  def sortedRows(df: DataFrame): Seq[Seq[String]] =
    df.collect()
      .toSeq
      .map(_.toSeq.map {
        case null      => "∅"
        case d: Double => f"$d%.9f"
        case f: Float  => f"$f%.6f"
        case v         => v.toString
      })
      .sortBy(_.mkString("|"))

  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit =
    assert(sortedRows(actual) == sortedRows(expected))

  def df(schema: String, rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema)
    )
  }
}

object SharedSpark {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
