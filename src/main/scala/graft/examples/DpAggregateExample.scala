package graft.examples

import graft.domains.{ColumnDescriptor, DataFrameDomain}
import graft.exact.{ExactNum, Rational}
import graft.measures.PureDPBudget
import graft.measurements.{Aggregations, NoiseKind}
import graft.metrics.SymmetricDifference
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** End-to-end differentially private aggregation: a noisy grouped count
  * and a noisy clipped sum over `lineitem`, each at ε = 1 under pure DP
  * (total spend ε = 2 by sequential composition).
  *
  * The walkthrough mirrors how the factories are meant to be used:
  *
  *   1. declare the input's DOMAIN (schema as the engine verifies it) and
  *      METRIC (symmetric difference: neighboring inputs differ by one
  *      row — "add/remove one record");
  *   2. supply the PUBLIC group-key table. Group keys must not depend on
  *      the private data (revealing which keys exist would itself leak),
  *      so the key list is an explicit constant here — including a
  *      combination absent from the data, which the group-complete
  *      aggregation still emits (with noise around 0/fill);
  *   3. for sums, give the clipping bounds [lower, upper]; sensitivity —
  *      and therefore the noise scale — follows from them, NOT from the
  *      data;
  *   4. apply the measurement: one DataFrame in, one noisy DataFrame out.
  *      The noise is added by a codegen'd Catalyst expression inside the
  *      same plan as the aggregation — no extra pass, no driver hop.
  */
object DpAggregateExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleEnv.session("dp-aggregate-example")
    val dir = ExampleEnv.dataDir(args)

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_quantity")

    // 1. domain: the engine's typed view of the input schema
    val domain = DataFrameDomain(li.schema.fields.toSeq.map { f =>
      f.name -> ColumnDescriptor(f.dataType)
    })

    // 2. public group keys — a constant list, never derived from `li`;
    //    ("X","Y") does not occur in the data and must still be released
    val keys = publicKeys(spark)

    // 3+4. ε = 1 noisy count per group (two-sided geometric noise: counts
    //      are integers, so the discrete mechanism is the right one)
    val noisyCount = Aggregations.createCountMeasurement(
      domain, SymmetricDifference, NoiseKind.Geometric,
      dIn = ExactNum(1), budget = PureDPBudget(ExactNum(1)),
      groupKeys = Some(keys))

    // ε = 1 noisy sum of l_quantity clipped into [0, 50]: sensitivity 50
    val noisySum = Aggregations.createSumMeasurement(
      domain, SymmetricDifference, NoiseKind.Laplace,
      dIn = ExactNum(1), budget = PureDPBudget(ExactNum(1)),
      measureColumn = "l_quantity",
      lower = Rational(0), upper = Rational(50),
      groupKeys = Some(keys))

    println("noisy count per (returnflag, linestatus), eps = 1:")
    noisyCount(li).asInstanceOf[DataFrame].orderBy("l_returnflag", "l_linestatus").show()
    println("noisy clipped sum of l_quantity, eps = 1 (clip [0,50] => sensitivity 50):")
    noisySum(li).asInstanceOf[DataFrame].orderBy("l_returnflag", "l_linestatus").show()
    println("total privacy spend: eps = 2 (sequential composition)")

    spark.stop()
  }

  private def publicKeys(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType, true),
      StructField("l_linestatus", StringType, true)))
    val rows = Seq(
      Row("A", "F"), Row("N", "F"), Row("N", "O"), Row("R", "F"),
      Row("X", "Y"))
    spark.createDataFrame(rows.asJava, schema)
  }
}
