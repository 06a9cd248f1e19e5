package graft.examples

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the runnable examples: one local session shaped
  * like the production recommendation (AQE on, sensible shuffle
  * parallelism) and the fixture directory convention.
  *
  * Run any example with
  * {{{
  *   sbt "runMain graft.examples.<Name> [dataDir]"
  * }}}
  * where `dataDir` holds the parquet tables (`documents.parquet`,
  * `lineitem.parquet`, ...); defaults to the smallest test fixture.
  */
private[examples] object ExampleEnv {
  def dataDir(args: Array[String]): String =
    args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")

  def session(app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName(app)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
