package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the schema-quality rollup a curation run
  * records next to its corpus stats (reference analog: none; the shape
  * follows the classic `DESCRIBE`-plus-null/distinct profile).
  */
object Profile {

  /** One output row per profiled column: `column, n_rows, n_nulls,
    * n_distinct, min_num, max_num, min_str, max_str`. Numeric columns
    * report min/max cast to double, string columns report them verbatim
    * (binary ordering in both Spark and DuckDB); other types profile
    * counts only, and unorderable types (maps, or structs/arrays holding
    * them) also skip `n_distinct` (null) since distinct-counting needs an
    * ordering. Null-handling follows SQL: `n_distinct` excludes nulls.
    *
    * Scale shape: ONE aggregation pass emitting every measure, then a
    * narrow unpivot of the single result row. `exactDistinct = true`
    * (the oracle path) plans n distinct aggregates via Expand — the input
    * is replicated once per profiled column, the exact-count price; at
    * 100 TB pass `exactDistinct = false` for one-pass mergeable HLL
    * sketches (rsd 0.02, ±2%) with no Expand.
    */
  def describe(
      df: DataFrame,
      cols: Seq[String] = Nil,
      exactDistinct: Boolean = true
  ): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    def numeric(c: String) = types(c).isInstanceOf[NumericType]
    def stringy(c: String) = types(c) == StringType
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType      => false
      case s: StructType   => s.fields.forall(f => orderable(f.dataType))
      case a: ArrayType    => orderable(a.elementType)
      case _               => true
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: targets.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (!orderable(types(c))) lit(null).cast("long")
         else if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        (if (numeric(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (stringy(c)) min(col(c))
         else lit(null).cast("string")).as(s"__mins_$c"),
        (if (stringy(c)) max(col(c))
         else lit(null).cast("string")).as(s"__maxs_$c")
      )
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(targets.map(c =>
        struct(
          lit(c).as("column"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__minn_$c").as("min_num"),
          col(s"__maxn_$c").as("max_num"),
          col(s"__mins_$c").as("min_str"),
          col(s"__maxs_$c").as("max_str"))): _*)).as("__p"))
      .select("__p.*")
  }
}
