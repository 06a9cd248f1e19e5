package graft.domains

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Domains: sets of possible values, used to type-check every operator's
  * input/output at construction time (reference `domains/spark_domains.py`).
  */
sealed trait Domain extends Serializable {
  /** Throws IllegalArgumentException when `value` is not a member. */
  def validate(value: Any): Unit
}

/** Column type + special-value admissibility
  * (reference `domains/spark_domains.py:41-299`). Only the five primitive
  * types of the reference are DP-typed; the wider engine (scale ops) works on
  * arbitrary Spark types outside the DP surface.
  */
final case class ColumnDescriptor(
    dataType: DataType,
    allowNull: Boolean = false,
    allowNaN: Boolean = false,
    allowInf: Boolean = false
) extends Serializable {
  require(
    ColumnDescriptor.supported(dataType),
    s"unsupported DP column type: $dataType"
  )
  def isFloat: Boolean =
    dataType == DoubleType || dataType == FloatType
  def isNumeric: Boolean =
    isFloat || dataType == LongType || dataType == IntegerType

  /** Membership predicate for a named column (null/NaN/inf checks). */
  def violations(name: String): org.apache.spark.sql.Column = {
    var cond = lit(false)
    if (!allowNull) cond = cond || col(name).isNull
    if (isFloat) {
      if (!allowNaN) cond = cond || isnan(col(name))
      if (!allowInf)
        cond = cond || col(name) === lit(Double.PositiveInfinity) ||
          col(name) === lit(Double.NegativeInfinity)
    }
    cond
  }
}

object ColumnDescriptor {
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
        DateType | TimestampType | TimestampNTZType =>
      true
    case _ => false
  }
  def long: ColumnDescriptor = ColumnDescriptor(LongType)
  def int: ColumnDescriptor = ColumnDescriptor(IntegerType)
  def double(allowNull: Boolean = false, allowNaN: Boolean = false, allowInf: Boolean = false): ColumnDescriptor =
    ColumnDescriptor(DoubleType, allowNull, allowNaN, allowInf)
  def string(allowNull: Boolean = false): ColumnDescriptor =
    ColumnDescriptor(StringType, allowNull)
}

/** Scalar output domains (aggregation results). */
final case class ScalarDomain(descriptor: ColumnDescriptor) extends Domain {
  def validate(value: Any): Unit = value match {
    case null => require(descriptor.allowNull, "null not allowed")
    case _    => ()
  }
}

/** Ordered table domain — column order is significant
  * (reference `spark_domains.py:371-403`).
  */
final case class DataFrameDomain(schema: Seq[(String, ColumnDescriptor)])
    extends Domain {
  require(
    schema.map(_._1).distinct.size == schema.size,
    "duplicate column names"
  )
  def columnNames: Seq[String] = schema.map(_._1)
  def apply(name: String): ColumnDescriptor =
    schema.find(_._1 == name).getOrElse(
      throw new IllegalArgumentException(s"no such column: $name")
    )._2
  def contains(name: String): Boolean = schema.exists(_._1 == name)

  def toStructType: StructType = StructType(schema.map { case (n, d) =>
    StructField(n, d.dataType, nullable = d.allowNull)
  })

  def withColumn(name: String, d: ColumnDescriptor): DataFrameDomain =
    DataFrameDomain(schema.filterNot(_._1 == name) :+ (name -> d))
  def drop(names: Seq[String]): DataFrameDomain =
    DataFrameDomain(schema.filterNot(c => names.contains(c._1)))
  def select(names: Seq[String]): DataFrameDomain =
    DataFrameDomain(names.map(n => n -> apply(n)))
  def rename(mapping: Map[String, String]): DataFrameDomain =
    DataFrameDomain(schema.map { case (n, d) =>
      mapping.getOrElse(n, n) -> d
    })

  /** Schema check (names, types, order) + data scan for disallowed
    * null/NaN/inf (reference `spark_domains.py:54-70,172-190`).
    */
  def validate(value: Any): Unit = value match {
    case df: DataFrame =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      val expected = schema.map { case (n, d) => n -> d.dataType }
      require(
        actual == expected,
        s"schema mismatch: expected $expected, got $actual"
      )
      val probes = schema.map { case (n, d) => d.violations(n) }
      val bad = probes.reduceOption(_ || _).getOrElse(lit(false))
      require(
        df.filter(bad).isEmpty,
        "data contains disallowed null/NaN/inf values"
      )
    case other =>
      throw new IllegalArgumentException(s"expected DataFrame, got $other")
  }
}

object DataFrameDomain {
  /** Conservative inference from a Spark schema: floats admit NaN/inf
    * (reference `spark_domains.py:420-431`).
    */
  def fromSparkSchema(st: StructType): DataFrameDomain =
    DataFrameDomain(st.fields.toSeq.map { f =>
      val float = f.dataType == DoubleType || f.dataType == FloatType
      f.name -> ColumnDescriptor(
        f.dataType,
        allowNull = f.nullable,
        allowNaN = float,
        allowInf = float
      )
    })
}

/** Table + groupby columns (floats forbidden as keys,
  * reference `spark_domains.py:494-513`).
  */
final case class GroupedDataFrameDomain(
    schema: Seq[(String, ColumnDescriptor)],
    groupColumns: Seq[String]
) extends Domain {
  val inner: DataFrameDomain = DataFrameDomain(schema)
  groupColumns.foreach { c =>
    require(inner.contains(c), s"group column $c not in schema")
    require(!inner(c).isFloat, s"float group key not allowed: $c")
  }
  def validate(value: Any): Unit = value match {
    case g: graft.transformations.GroupedDataFrame =>
      inner.validate(g.df)
      require(
        g.groupKeys.columns.toSeq == groupColumns,
        s"group keys ${g.groupKeys.columns.toSeq} != $groupColumns"
      )
    case other =>
      throw new IllegalArgumentException(
        s"expected GroupedDataFrame, got $other"
      )
  }
}

/** Product domains for multi-table inputs (reference `domains/collections.py`). */
final case class ListDomain(elements: Seq[Domain]) extends Domain {
  def validate(value: Any): Unit = value match {
    case xs: Seq[_] =>
      require(xs.size == elements.size, "list size mismatch")
      xs.zip(elements).foreach { case (v, d) => d.validate(v) }
    case other => throw new IllegalArgumentException(s"expected Seq, got $other")
  }
}

final case class DictDomain(elements: Map[String, Domain]) extends Domain {
  def validate(value: Any): Unit = value match {
    case m: Map[_, _] =>
      require(
        m.keySet == elements.keySet,
        s"keys ${m.keySet} != ${elements.keySet}"
      )
      m.foreach { case (k, v) => elements(k.asInstanceOf[String]).validate(v) }
    case other => throw new IllegalArgumentException(s"expected Map, got $other")
  }
}
