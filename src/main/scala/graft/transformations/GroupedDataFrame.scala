package graft.transformations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A DataFrame bound to an explicit, public group-keys DataFrame.
  *
  * Group keys are data, not metadata: aggregation emits exactly one row per
  * key-table row — keys absent from the data appear with the fill value, data
  * keys absent from the key table are dropped. This is what makes grouped DP
  * outputs safe (reference `utils/grouped_dataframe.py:19-186`).
  *
  * Scale notes: the key table is typically small → Catalyst broadcasts the
  * aggregated side or the key side automatically; with billions of groups the
  * join degrades gracefully to sort-merge on the (already shuffled-by-key)
  * aggregate output.
  */
final case class GroupedDataFrame(df: DataFrame, rawGroupKeys: DataFrame) {
  // The reference dedups the key table unconditionally at construction
  // (grouped_dataframe.py:43): with duplicate key rows a grouped noisy
  // measurement would release the same group twice with independent noise
  // draws — an unaccounted double spend. Mirror that here — but when the key
  // table is driver-local (the overwhelmingly common literal key list),
  // dedup eagerly into a new local relation instead of adding a
  // Deduplicate (shuffle) stage to every grouped query's plan.
  val groupKeys: DataFrame =
    if (rawGroupKeys.isLocal) {
      import scala.jdk.CollectionConverters._
      val rows = rawGroupKeys.collect()
      val distinct = new java.util.LinkedHashSet[org.apache.spark.sql.Row]()
      rows.foreach(distinct.add)
      if (distinct.size == rows.length) rawGroupKeys
      else
        rawGroupKeys.sparkSession.createDataFrame(
          distinct.asScala.toSeq.asJava, rawGroupKeys.schema)
    } else rawGroupKeys.dropDuplicates()
  val groupColumns: Seq[String] = rawGroupKeys.columns.toSeq
  require(groupColumns.nonEmpty, "at least one group column required")
  require(
    groupColumns.forall(df.columns.contains),
    s"group columns $groupColumns not all present in ${df.columns.toSeq}"
  )

  /** Group-complete aggregation: one output row per DISTINCT key-table row.
    *
    * @param aggs (outputName, aggregate expression, fill value for empty
    *             groups) triples.
    */
  def agg(aggs: Seq[(String, Column, Column)]): DataFrame = {
    val aggregated = df
      .groupBy(groupColumns.map(col): _*)
      .agg(
        aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, e, _) => e.as(n) }: _*
      )
    // Null-safe equality so null group keys match their key-table rows.
    val cond = groupColumns
      .map(c => groupKeys(c) <=> aggregated(c))
      .reduce(_ && _)
    val out = groupKeys.join(aggregated, cond, "left")
    out.select(
      groupColumns.map(c => groupKeys(c).as(c)) ++
        aggs.map { case (n, _, fill) => coalesce(out(n), fill).as(n) }: _*
    )
  }

  /** Rows of one group in a local Seq, for per-group measurement paths
    * (quantile). Returns (keys ++ agg columns) via flatMapGroups downstream.
    */
  def withKeysDistinct: GroupedDataFrame =
    GroupedDataFrame(df, groupKeys.dropDuplicates())
}

object GroupedDataFrame {

  /** Keys = Cartesian product of per-column value lists
    * (reference `groupby.py:212-302`). Built with chained crossJoin so it
    * stays a Spark plan at any size.
    */
  def keysFromColumnDomains(
      spark: org.apache.spark.sql.SparkSession,
      domains: Seq[(String, Seq[Any])]
  ): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(domains.nonEmpty)
    val dfs = domains.map { case (name, values) =>
      val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
      spark.createDataFrame(
        rows,
        org.apache.spark.sql.types.StructType(
          Seq(
            org.apache.spark.sql.types
              .StructField(name, inferType(values), nullable = values.contains(null))
          )
        )
      )
    }
    dfs.reduce(_.crossJoin(_))
  }

  /** Keys from an explicit tuple list (reference `groupby.py:304-386`). */
  def keysFromList(
      spark: org.apache.spark.sql.SparkSession,
      columns: Seq[String],
      keys: Seq[Seq[Any]]
  ): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(columns.nonEmpty)
    require(keys.forall(_.size == columns.size), "key arity mismatch")
    val types = columns.indices.map(i => inferType(keys.map(_(i))))
    val schema = org.apache.spark.sql.types.StructType(
      columns.zip(types).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true)
      }
    )
    spark.createDataFrame(
      keys.map(k => org.apache.spark.sql.Row(k: _*)).asJava,
      schema
    )
  }

  private def inferType(values: Seq[Any]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    values.collectFirst {
      case _: String            => StringType
      case _: Long              => LongType
      case _: Int               => IntegerType
      case _: java.sql.Date     => DateType
      case _: java.sql.Timestamp => TimestampType
    }.getOrElse(StringType)
  }
}
