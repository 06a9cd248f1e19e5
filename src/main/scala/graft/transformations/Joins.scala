package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.{ExactNum, Rational}
import graft.metrics._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared join kernel (reference `utils/join.py:27-565`): natural-join
  * column inference, `_left`/`_right` disambiguation of non-join common
  * columns, and optional null-safe key equality (`<=>` + key-column merge).
  * Catalyst picks broadcast/sort-merge/shuffled-hash; the private-join
  * callers pre-truncate so no side is unboundedly skewed.
  */
object JoinKernel {

  def commonColumns(left: DataFrame, right: DataFrame): Seq[String] =
    left.columns.filter(right.columns.contains).toSeq

  /** @param on join columns (natural join over common columns when empty)
    * @param how inner | left | right | outer | left_anti
    * @param nullsAreEqual when true, null keys match null keys
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String,
      nullsAreEqual: Boolean
  ): DataFrame = {
    val joinCols = if (on.nonEmpty) on else commonColumns(left, right)
    require(joinCols.nonEmpty, "no join columns")
    joinCols.foreach { c =>
      require(left.columns.contains(c), s"left side missing $c")
      require(right.columns.contains(c), s"right side missing $c")
    }
    // Disambiguate non-join common columns as <name>_left / <name>_right.
    val overlap = commonColumns(left, right).filterNot(joinCols.contains)
    val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"${c}_left"))
    val r = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_right"))

    if (!nullsAreEqual) {
      l.join(r, joinCols, how)
    } else {
      // Null-safe equality: rename right keys, join on <=>, merge key cols.
      val rTmp = joinCols.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
      val cond = joinCols.map(c => l(c) <=> rTmp(s"__r_$c")).reduce(_ && _)
      val joined = l.join(rTmp, cond, how)
      val mergedKeys = joinCols.map { c =>
        // outer joins: take whichever side is present
        coalesce(joined(c), joined(s"__r_$c")).as(c)
      }
      val lCols = l.columns.filterNot(joinCols.contains).map(joined(_))
      val rCols = rTmp.columns.filterNot(c => c.startsWith("__r_")).map(joined(_))
      joined.select(mergedKeys ++ lCols ++ rCols: _*)
    }
  }

  /** Output-domain calculus (reference `utils/join.py:205-346`): join
    * columns stay nullable only if both sides allow null (and nulls compare
    * equal); non-join columns of the opposite side become nullable under
    * outer joins.
    */
  def domainAfterJoin(
      left: DataFrameDomain,
      right: DataFrameDomain,
      on: Seq[String],
      how: String,
      nullsAreEqual: Boolean
  ): DataFrameDomain = {
    val joinCols =
      if (on.nonEmpty) on
      else left.columnNames.filter(right.columnNames.contains)
    val overlap =
      left.columnNames.filter(right.columnNames.contains).filterNot(joinCols.contains)
    def dis(side: String, n: String): String =
      if (overlap.contains(n)) s"${n}_$side" else n

    val keyDescs = joinCols.map { c =>
      val ld = left(c); val rd = right(c)
      val dt = ld.dataType
      val allowNull =
        (ld.allowNull && rd.allowNull && nullsAreEqual) ||
          (how == "outer") // outer join can emit one-sided nulls... keys merged
      c -> ColumnDescriptor(
        dt,
        allowNull,
        ld.allowNaN || rd.allowNaN,
        ld.allowInf || rd.allowInf
      )
    }
    val leftNullable = how == "right" || how == "outer"
    val rightNullable = how == "left" || how == "outer"
    val lDescs = left.schema.filterNot(c => joinCols.contains(c._1)).map {
      case (n, d) =>
        dis("left", n) -> (if (leftNullable) d.copy(allowNull = true) else d)
    }
    val rDescs = right.schema.filterNot(c => joinCols.contains(c._1)).map {
      case (n, d) =>
        dis("right", n) -> (if (rightNullable) d.copy(allowNull = true) else d)
    }
    if (how == "left_anti") DataFrameDomain(left.schema)
    else DataFrameDomain(keyDescs ++ lDescs ++ rDescs)
  }
}

/** Private ⋈ public table (reference `join.py:43-423`): stability is the max
  * multiplicity of any join-key combination in the public table, computed by
  * an eager aggregate over the public side (it is public data — no privacy
  * cost). Small public sides are broadcast by Catalyst automatically.
  */
final case class PublicJoin(
    inputDomain: DataFrameDomain,
    inputMetric: Metric,
    publicDf: DataFrame,
    on: Seq[String],
    how: String = "inner",
    nullsAreEqual: Boolean = true
) extends Transformation {
  require(how == "inner" || how == "left", s"unsupported join type $how")
  private val joinCols =
    if (on.nonEmpty) on
    else inputDomain.columnNames.filter(publicDf.columns.contains)

  /** Max join-key multiplicity in the public table (eager, data-independent
    * stability probe; reference `join.py:335-351`).
    */
  val maxMultiplicity: Long = {
    val counts = publicDf.groupBy(joinCols.map(col): _*).agg(count(lit(1)).as("n"))
    val m = counts.agg(max(col("n"))).head()
    if (m.isNullAt(0)) (if (how == "left") 1L else 0L).max(1L)
    else math.max(m.getLong(0), if (how == "left") 1L else 0L)
  }

  def outputDomain: Domain =
    JoinKernel.domainAfterJoin(
      inputDomain,
      DataFrameDomain.fromSparkSchema(publicDf.schema),
      joinCols,
      how,
      nullsAreEqual
    )
  def outputMetric: Metric = inputMetric
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn * ExactNum(maxMultiplicity)
  def apply(data: Any): Any =
    JoinKernel.join(
      data.asInstanceOf[DataFrame],
      publicDf,
      joinCols,
      how,
      nullsAreEqual
    )
}

sealed trait TruncationStrategy
object TruncationStrategy {
  /** keep ≤ τ hash-chosen rows per key; stability factor 2 per changed key */
  case object Truncate extends TruncationStrategy
  /** drop keys with > τ rows; stability factor τ per changed key */
  case object Drop extends TruncationStrategy
  case object NoTruncation extends TruncationStrategy
}

/** Private ⋈ private inner join (reference `join.py:440-805`): both sides
  * truncated per key first, then joined. Stability
  * τ_l·s_r·d_r + τ_r·s_l·d_l with s = 2 for TRUNCATE, τ for DROP
  * (`join.py:740-770`).
  */
final case class PrivateJoin(
    leftDomain: DataFrameDomain,
    rightDomain: DataFrameDomain,
    leftKey: String = "left",
    rightKey: String = "right",
    on: Seq[String],
    leftStrategy: TruncationStrategy,
    leftThreshold: Int,
    rightStrategy: TruncationStrategy,
    rightThreshold: Int,
    nullsAreEqual: Boolean = true,
    saltBuckets: Int = 32
) extends Transformation {
  import TruncationStrategy._

  def inputDomain: Domain =
    DictDomain(Map(leftKey -> leftDomain, rightKey -> rightDomain))
  def inputMetric: Metric = DictMetric(
    Map(leftKey -> SymmetricDifference, rightKey -> SymmetricDifference)
  )
  def outputDomain: Domain =
    JoinKernel.domainAfterJoin(
      truncatedDomain(leftDomain, leftStrategy),
      truncatedDomain(rightDomain, rightStrategy),
      on,
      "inner",
      nullsAreEqual
    )
  def outputMetric: Metric = SymmetricDifference

  private def truncatedDomain(
      d: DataFrameDomain,
      s: TruncationStrategy
  ): DataFrameDomain = d

  private def stabilityFactor(s: TruncationStrategy, tau: Int): ExactNum =
    s match {
      case Truncate     => ExactNum(2)
      case Drop         => ExactNum(tau.toLong)
      case NoTruncation => ExactNum.PosInf
    }

  /** d_out = τ_l·s_r·d_r + τ_r·s_l·d_l (per-side distances equal d_in each
    * under the dict metric's sum).
    */
  def stabilityFunction(dIn: ExactNum): ExactNum = stabilityFunction(dIn, dIn)

  def stabilityFunction(dLeft: ExactNum, dRight: ExactNum): ExactNum = {
    val tl = ExactNum(leftThreshold.toLong)
    val tr = ExactNum(rightThreshold.toLong)
    val sl = stabilityFactor(leftStrategy, leftThreshold)
    val sr = stabilityFactor(rightStrategy, rightThreshold)
    def prod(a: ExactNum, b: ExactNum, c: ExactNum): ExactNum =
      if (c.isZero) ExactNum.zero else a * b * c
    prod(tl, sr, dRight) + prod(tr, sl, dLeft)
  }

  private def truncate(
      df: DataFrame,
      s: TruncationStrategy,
      tau: Int
  ): DataFrame = s match {
    // two-phase salted top-τ: row-identical to the single window, immune
    // to a power-law join key serializing the truncation into one task
    case Truncate     => Truncation.truncateLargeGroupsSalted(df, on, tau, saltBuckets)
    case Drop         => Truncation.dropLargeGroups(df, on, tau)
    case NoTruncation => df
  }

  def apply(data: Any): Any = {
    val m = data.asInstanceOf[Map[String, DataFrame]]
    // The two truncations are built concurrently: each salted truncation
    // runs an eager hot-key probe (a small driver action, ~one narrow scan
    // of its side — measured ~14% of the 6.4M-row uniform sweep), and
    // Spark schedules concurrent jobs from separate threads, so the
    // smaller side's probe hides entirely behind the larger one's.
    // The probe runs on the caller's thread plus one dedicated thread —
    // never the shared global fork-join pool, where blocking a Spark
    // action could starve unrelated users of the same JVM. The spawned
    // thread inherits the caller's SparkContext local properties (job
    // group, scheduler pool) because InheritableThreadLocal carries them.
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "private-join-truncate")
      t.setDaemon(true)
      t
    }
    try {
      val rf = pool.submit(new java.util.concurrent.Callable[DataFrame] {
        def call(): DataFrame = truncate(m(rightKey), rightStrategy, rightThreshold)
      })
      val l = truncate(m(leftKey), leftStrategy, leftThreshold)
      val r = rf.get()
      JoinKernel.join(l, r, on, "inner", nullsAreEqual)
    } finally pool.shutdown()
  }
}

/** Private join under AddRemoveKeys: key column must be a join column;
  * appends the joined table to the dict; stability 1
  * (reference `join.py:808-1106`).
  */
final case class PrivateJoinOnKey(
    inputDomain: DictDomain,
    inputMetric: AddRemoveKeys,
    leftKey: String,
    rightKey: String,
    newKey: String,
    on: Seq[String],
    nullsAreEqual: Boolean = true
) extends Transformation {
  require(!inputDomain.elements.contains(newKey), s"$newKey already in dict")
  require(
    on.contains(inputMetric.keyColumns(leftKey)),
    "AddRemoveKeys key column must be a join column"
  )

  def outputDomain: Domain = {
    val l = inputDomain.elements(leftKey).asInstanceOf[DataFrameDomain]
    val r = inputDomain.elements(rightKey).asInstanceOf[DataFrameDomain]
    DictDomain(
      inputDomain.elements +
        (newKey -> JoinKernel.domainAfterJoin(l, r, on, "inner", nullsAreEqual))
    )
  }
  def outputMetric: Metric = AddRemoveKeys(
    inputMetric.keyColumns + (newKey -> inputMetric.keyColumns(leftKey))
  )
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = {
    val m = data.asInstanceOf[Map[String, DataFrame]]
    m + (newKey -> JoinKernel.join(m(leftKey), m(rightKey), on, "inner", nullsAreEqual))
  }
}
