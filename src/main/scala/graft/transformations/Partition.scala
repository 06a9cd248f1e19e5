package graft.transformations

import graft.core.Transformation
import graft.domains._
import graft.exact.ExactNum
import graft.metrics._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Split a DataFrame into one DataFrame per key tuple via null-safe filters;
  * output metric SumOf/RootSumOfSquared enables parallel composition
  * (reference `partition.py:27-270`).
  *
  * Scale note: the reference's per-key `filter` scan is O(keys) jobs over the
  * same input; we `persist` the parent once so each partition filter reads
  * the cached plan, and the filters push down when the parent is a file scan.
  * For very many keys, prefer `df.write.partitionBy` + per-key reads.
  */
final case class PartitionByKeys(
    inputDomain: DataFrameDomain,
    inputMetric: Metric, // SymmetricDifference (or IfGroupedBy for grouped)
    keyColumns: Seq[String],
    keys: Seq[Seq[Any]],
    useL2: Boolean = false
) extends Transformation {
  keyColumns.foreach(c => require(inputDomain.contains(c), s"no column $c"))
  require(keys.forall(_.size == keyColumns.size), "key arity mismatch")
  require(keys.distinct.size == keys.size, "duplicate partition keys")

  def outputDomain: Domain = ListDomain(Seq.fill(keys.size)(inputDomain))
  def outputMetric: Metric =
    if (useL2) RootSumOfSquared(SymmetricDifference)
    else SumOf(SymmetricDifference)
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = {
    val df = data.asInstanceOf[DataFrame].persist()
    keys.map { tuple =>
      val cond = keyColumns
        .zip(tuple)
        .map { case (c, v) => col(c) <=> lit(v) }
        .reduce(_ && _)
      df.filter(cond)
    }
  }
}

/** Dictionary (multi-table) plumbing (reference `dictionary.py`). */

final case class CreateDictFromValue(
    inputDomain: Domain,
    inputMetric: Metric,
    key: String
) extends Transformation {
  def outputDomain: Domain = DictDomain(Map(key -> inputDomain))
  def outputMetric: Metric = DictMetric(Map(key -> inputMetric))
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = Map(key -> data)
}

final case class Subset(
    inputDomain: DictDomain,
    inputMetric: DictMetric,
    keys: Seq[String]
) extends Transformation {
  keys.foreach(k => require(inputDomain.elements.contains(k), s"no key $k"))
  def outputDomain: Domain =
    DictDomain(inputDomain.elements.view.filterKeys(keys.contains).toMap)
  def outputMetric: Metric =
    DictMetric(inputMetric.metrics.view.filterKeys(keys.contains).toMap)
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any =
    data.asInstanceOf[Map[String, Any]].view.filterKeys(keys.contains).toMap
}

final case class GetValue(
    inputDomain: DictDomain,
    inputMetric: Metric, // DictMetric or AddRemoveKeys
    key: String
) extends Transformation {
  require(inputDomain.elements.contains(key), s"no key $key")
  def outputDomain: Domain = inputDomain.elements(key)
  def outputMetric: Metric = inputMetric match {
    case DictMetric(m)      => m(key)
    case _: AddRemoveKeys   => IfGroupedBy(
      inputMetric.asInstanceOf[AddRemoveKeys].keyColumns(key),
      SymmetricDifference
    )
    case m => m
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn
  def apply(data: Any): Any = data.asInstanceOf[Map[String, Any]](key)
}

/** Key-column preservation check for AddRemoveKeys dict metrics.
  *
  * The reference's `add_remove_keys.py:1-107` worked example shows why
  * 1-stability alone is NOT enough to augment a dict under AddRemoveKeys: a
  * truncate→rename→AddUniqueColumn chain is 1-stable row-wise, yet it
  * redefines the key column's meaning, so removing one key in the input
  * removes TWO key values across the augmented dict (distance doubles). The
  * reference solves this with named wrapper classes
  * (`add_remove_keys.py:159-1009`) that only admit transformations which
  * keep each entity's key value intact; this predicate expresses the same
  * whitelist structurally: given the key column name on the input, it
  * returns the key column name on the output iff every row the
  * transformation emits keeps its source row's key value (row filters,
  * truncations, value edits to non-key columns, renames with the mapping
  * applied, public joins on the key). Anything that can write the key
  * column — generic maps, AddUniqueColumn — is rejected.
  */
object ArkSafety {
  def keyPreserving(t: Transformation, key: String): Option[String] = t match {
    case graft.core.Identity(_, _)  => Some(key)
    case graft.core.ChainTT(a, b)   => keyPreserving(a, key).flatMap(keyPreserving(b, _))
    case Filter(_, _, _)            => Some(key)
    case Select(_, _, columns)      => if (columns.contains(key)) Some(key) else None
    case Rename(_, _, mapping) =>
      // Reject when some OTHER column is renamed onto the key's output
      // name — that is a key redefinition even though the key's own values
      // survive (Rename itself also rejects duplicate output names, but
      // this whitelist must not depend on that).
      val out = mapping.getOrElse(key, key)
      if (mapping.exists { case (from, to) => from != key && to == out }) None
      else Some(out)
    case DropInfs(_, _, _)          => Some(key)
    case DropNaNs(_, _, _)          => Some(key)
    case DropNulls(_, _, _)         => Some(key)
    case ReplaceInfs(_, _, replace) => if (replace.contains(key)) None else Some(key)
    case ReplaceNaNs(_, _, replace) => if (replace.contains(key)) None else Some(key)
    case ReplaceNulls(_, _, replace) => if (replace.contains(key)) None else Some(key)
    case Persist(_, _)              => Some(key)
    case Unpersist(_, _)            => Some(key)
    case SparkAction(_, _)          => Some(key)
    case LimitRowsPerGroup(_, _, _) => Some(key)
    case LimitKeysPerGroup(_, _, _, _, _)       => Some(key)
    case LimitRowsPerKeyPerGroup(_, _, _, _)    => Some(key)
    case PublicJoin(_, _, _, on, _, _) => if (on.contains(key)) Some(key) else None
    // augmenting maps append produced columns to the UNCHANGED input row,
    // so every output row carries its source row's key value — exactly the
    // claim the reference's MapValue/FlatMapValue wrappers make
    // (add_remove_keys.py:543-618, which construct Map/FlatMap under
    // IfGroupedBy(keyColumn) and therefore force augment)
    case MapTransformation(_, rt) if rt.augment     => Some(key)
    case FlatMapTransformation(_, rt, _) if rt.augment => Some(key)
    // FlatMapByKey regroups by its metric column and re-attaches it; key
    // values pass through iff that column IS the key
    case FlatMapByKey(IfGroupedBy(c, _), _) if c == key => Some(key)
    case _                          => None
  }
}

/** Named [[TransformValue]] wrappers mirroring the reference's
  * `add_remove_keys.py:159-1009` classes (`FilterValue`,
  * `PublicJoinValue`, `LimitRowsPerGroupValue`, ...): each builds the
  * generic [[TransformValue]] with the matching key-preserving inner
  * transformation, so the [[ArkSafety]] allowlist admits it by
  * construction and the AddRemoveKeys key-column mapping on the output
  * dict is tracked automatically. Every named class the reference ships
  * has a constructor here (Filter/Select/Rename/PublicJoin/Map/FlatMap/
  * FlatMapByKey/LimitRowsPerGroup/LimitKeysPerGroup/
  * LimitRowsPerKeyPerGroup/DropInfs/DropNaNs/DropNulls/ReplaceInfs/
  * ReplaceNaNs/ReplaceNulls/Persist/Unpersist/SparkAction `...Value`);
  * any other key-preserving inner goes through `TransformValue` directly
  * (same functional surface, checked structurally instead of nominally).
  */
object Ark {
  private def dfDomain(d: DictDomain, key: String): DataFrameDomain =
    d.elements(key) match {
      case dd: DataFrameDomain => dd
      case other => throw new IllegalArgumentException(
        s"value at $key is not a DataFrame domain: $other")
    }
  private def keyCol(m: AddRemoveKeys, key: String): String = m.keyColumns(key)

  /** reference `FilterValue` */
  def filterValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, filterExpr: String): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      Filter(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), filterExpr))

  /** reference `SelectValue` — the key column must survive the projection */
  def selectValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, columns: Seq[String]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      Select(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), columns))

  /** reference `RenameValue` — the output key column is tracked through
    * the mapping */
  def renameValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, mapping: Map[String, String]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      Rename(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), mapping))

  /** reference `PublicJoinValue` — the join must be ON the key column,
    * otherwise one entity's rows could fan across join keys */
  def publicJoinValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, publicDf: DataFrame,
      on: Seq[String], how: String = "inner"): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      PublicJoin(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference),
        publicDf, on, how))

  /** reference `LimitRowsPerGroupValue` — truncation grouped on the key
    * column itself */
  def limitRowsPerGroupValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, threshold: Int): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      LimitRowsPerGroup(dfDomain(inputDomain, key),
        keyCol(metric, key), threshold))

  /** reference `LimitKeysPerGroupValue` */
  def limitKeysPerGroupValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, groupColumn: String, threshold: Int,
      useL2: Boolean = false): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      LimitKeysPerGroup(dfDomain(inputDomain, key), groupColumn,
        keyCol(metric, key), threshold, useL2))

  /** reference `LimitRowsPerKeyPerGroupValue` */
  def limitRowsPerKeyPerGroupValue(inputDomain: DictDomain,
      metric: AddRemoveKeys, key: String, newKey: String,
      groupColumn: String, threshold: Int): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      LimitRowsPerKeyPerGroup(dfDomain(inputDomain, key), groupColumn,
        keyCol(metric, key), threshold))

  /** reference `MapValue` — the row transformer must AUGMENT (output rows
    * carry the unchanged input row, key column included) */
  def mapValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, rowTransformer: RowToRowTransformation)
      : TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      MapTransformation(
        IfGroupedBy(keyCol(metric, key), SymmetricDifference),
        rowTransformer))

  /** reference `FlatMapValue` — augmenting row transformer, row cap */
  def flatMapValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, rowTransformer: RowToRowsTransformation,
      maxNumRows: Option[Int]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      FlatMapTransformation(
        IfGroupedBy(keyCol(metric, key), SymmetricDifference),
        rowTransformer, maxNumRows))

  /** reference `FlatMapByKeyValue` — per-key rows→rows on the key column */
  def flatMapByKeyValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, rowTransformer: RowsToRowsTransformation)
      : TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      FlatMapByKey(
        IfGroupedBy(keyCol(metric, key), SymmetricDifference),
        rowTransformer))

  /** reference `DropInfsValue` / `DropNaNsValue` / `DropNullsValue` */
  def dropInfsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, columns: Seq[String]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      DropInfs(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), columns))
  def dropNaNsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, columns: Seq[String]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      DropNaNs(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), columns))
  def dropNullsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, columns: Seq[String]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      DropNulls(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), columns))

  /** reference `ReplaceInfsValue` / `ReplaceNaNsValue` / `ReplaceNullsValue`
    * — replacing IN the key column is a key redefinition and is rejected
    * by the ArkSafety check, as in the reference */
  def replaceInfsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String,
      replace: Map[String, (Double, Double)]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      ReplaceInfs(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), replace))
  def replaceNaNsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, replace: Map[String, Double]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      ReplaceNaNs(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), replace))
  def replaceNullsValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String, replace: Map[String, Any]): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      ReplaceNulls(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference), replace))

  /** reference `PersistValue` / `UnpersistValue` / `SparkActionValue` */
  def persistValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      Persist(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference)))
  def unpersistValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      Unpersist(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference)))
  def sparkActionValue(inputDomain: DictDomain, metric: AddRemoveKeys,
      key: String, newKey: String): TransformValue =
    TransformValue(inputDomain, metric, key, newKey,
      SparkAction(dfDomain(inputDomain, key),
        IfGroupedBy(keyCol(metric, key), SymmetricDifference)))
}

/** Run an inner transformation on one dict value, adding the result under a
  * new key (reference `dictionary.py:109-220` and the `TransformValue`
  * family, `add_remove_keys.py:159-1009`).
  */
final case class TransformValue(
    inputDomain: DictDomain,
    inputMetric: Metric, // DictMetric or AddRemoveKeys
    key: String,
    newKey: String,
    inner: Transformation
) extends Transformation {
  require(inputDomain.elements.contains(key), s"no key $key")
  require(!inputDomain.elements.contains(newKey), s"$newKey already present")
  require(
    inner.inputDomain == inputDomain.elements(key),
    "inner transformation domain mismatch"
  )

  def outputDomain: Domain =
    DictDomain(inputDomain.elements + (newKey -> inner.outputDomain))
  def outputMetric: Metric = inputMetric match {
    case DictMetric(m) =>
      DictMetric(m + (newKey -> inner.outputMetric))
    case ark: AddRemoveKeys =>
      // 1-stability alone is insufficient (reference add_remove_keys.py:1-107
      // worked example: a 1-stable chain that redefines the key column
      // doubles the AddRemoveKeys distance). The inner transformation must
      // provably carry each row's key value through — the structural
      // equivalent of the reference's named TransformValue wrappers.
      val outKeyCol = ArkSafety.keyPreserving(inner, ark.keyColumns(key))
      require(
        outKeyCol.isDefined,
        s"AddRemoveKeys requires a key-preserving inner transformation " +
          s"(filters, truncations, renames, non-key value edits, joins on " +
          s"the key); ${inner.getClass.getSimpleName} may redefine key " +
          s"column ${ark.keyColumns(key)}"
      )
      AddRemoveKeys(ark.keyColumns + (newKey -> outKeyCol.get))
    case m => m
  }
  def stabilityFunction(dIn: ExactNum): ExactNum = inputMetric match {
    case _: AddRemoveKeys => dIn
    case _                => dIn.max(inner.stabilityFunction(dIn))
  }
  def apply(data: Any): Any = {
    val m = data.asInstanceOf[Map[String, Any]]
    m + (newKey -> inner(m(key)))
  }
}

/** Whole-dict-input inner transformation whose output dict augments the
  * input dict (reference `dictionary.py:109-220`). The inner transformation
  * maps a DictDomain to a DictDomain with keys disjoint from its input's.
  *
  * Distance convention: as with [[TransformValue]], the scalar dict distance
  * bounds every key's distance, so the augmented dict is bounded by
  * max(dIn, inner(dIn)) — the reference's per-key {**d_in, **d_out} merge
  * scalarized as a uniform per-key bound.
  */
final case class AugmentDict(inner: Transformation) extends Transformation {
  private val inDom = inner.inputDomain match {
    case d: DictDomain => d
    case other =>
      throw new IllegalArgumentException(s"inner input must be a dict, got $other")
  }
  private val addedDom = inner.outputDomain match {
    case d: DictDomain => d
    case other =>
      throw new IllegalArgumentException(s"inner output must be a dict, got $other")
  }
  require(
    addedDom.elements.keySet.intersect(inDom.elements.keySet).isEmpty,
    "inner transformation output keys overlap the input dict")

  def inputDomain: Domain = inDom
  def inputMetric: Metric = inner.inputMetric
  def outputDomain: Domain = DictDomain(inDom.elements ++ addedDom.elements)
  def outputMetric: Metric = (inner.inputMetric, inner.outputMetric) match {
    case (DictMetric(a), DictMetric(b)) => DictMetric(a ++ b)
    case (_: AddRemoveKeys, _) =>
      // Deliberately unsupported, mirroring the reference: augmentation is
      // not stable under AddRemoveKeys for arbitrary inner transformations
      // (`add_remove_keys.py:1-107` worked example — a 1-stable chain that
      // redefines the key column doubles the distance). Use TransformValue,
      // whose ArkSafety check admits only key-preserving inners.
      throw new IllegalArgumentException(
        "AugmentDict does not support AddRemoveKeys; use TransformValue")
    case (a, b) =>
      throw new IllegalArgumentException(s"unsupported dict metrics $a / $b")
  }
  def stabilityFunction(dIn: ExactNum): ExactNum =
    dIn.max(inner.stabilityFunction(dIn))
  def apply(data: Any): Any = {
    val m = data.asInstanceOf[Map[String, Any]]
    m ++ inner(m).asInstanceOf[Map[String, Any]]
  }
}

/** The reference's dictionary pipeline factories (`dictionary.py:370-798`),
  * built by composition exactly as there: GetValue / CreateDictFromValue /
  * Subset / AugmentDict / ChainTT.
  */
object Dict {
  import graft.core.{ChainTT, Identity}

  /** data(newKey) = inner(data(key)), original value kept
    * (reference `dictionary.py:370-434`).
    */
  def createCopyAndTransformValue(
      inputDomain: DictDomain,
      inputMetric: DictMetric,
      key: String,
      newKey: String,
      inner: Transformation
  ): Transformation = {
    require(!inputDomain.elements.contains(newKey), s"$newKey already present")
    AugmentDict(
      ChainTT(
        ChainTT(GetValue(inputDomain, inputMetric, key), inner),
        CreateDictFromValue(inner.outputDomain, inner.outputMetric, newKey)))
  }

  /** data(newKey) = data.remove(key) (reference `dictionary.py:436-496`). */
  def createRename(
      inputDomain: DictDomain,
      inputMetric: DictMetric,
      key: String,
      newKey: String
  ): Transformation = {
    val copied = createCopyAndTransformValue(
      inputDomain, inputMetric, key, newKey,
      Identity(inputDomain.elements(key), inputMetric.metrics(key)))
    val keep = (inputDomain.elements.keySet - key).toSeq :+ newKey
    ChainTT(
      copied,
      Subset(
        copied.outputDomain.asInstanceOf[DictDomain],
        copied.outputMetric.asInstanceOf[DictMetric],
        keep))
  }

  /** One input value fanned out through a dict of transformations:
    * out(k) = ts(k)(data) (reference `dictionary.py:498-621`). All
    * transformations must share the input domain and metric.
    */
  def createApplyDictOfTransformations(
      ts: Seq[(String, Transformation)]
  ): Transformation = {
    require(ts.nonEmpty, "transformation dict cannot be empty")
    require(ts.map(_._1).distinct.size == ts.size, "duplicate output keys")
    val inDom = ts.head._2.inputDomain
    val inMet = ts.head._2.inputMetric
    require(
      ts.forall(t => t._2.inputDomain == inDom && t._2.inputMetric == inMet),
      "transformations must share input domain and metric")
    var baseKey = "__base"
    while (ts.exists(_._1 == baseKey)) baseKey += "_"
    var acc: Transformation = CreateDictFromValue(inDom, inMet, baseKey)
    ts.foreach { case (k, t) =>
      acc = ChainTT(
        acc,
        createCopyAndTransformValue(
          acc.outputDomain.asInstanceOf[DictDomain],
          acc.outputMetric.asInstanceOf[DictMetric],
          baseKey, k, t))
    }
    ChainTT(
      acc,
      Subset(
        acc.outputDomain.asInstanceOf[DictDomain],
        acc.outputMetric.asInstanceOf[DictMetric],
        ts.map(_._1)))
  }

  /** In-place transform of one dict value (reference `dictionary.py:622-726`):
    * copy through a temporary key, drop the original, rename back.
    */
  def createTransformValue(
      inputDomain: DictDomain,
      inputMetric: DictMetric,
      key: String,
      inner: Transformation
  ): Transformation = {
    var tmp = key + "__tmp"
    while (inputDomain.elements.contains(tmp)) tmp += "_"
    val copied =
      createCopyAndTransformValue(inputDomain, inputMetric, key, tmp, inner)
    val withoutOriginal = Subset(
      copied.outputDomain.asInstanceOf[DictDomain],
      copied.outputMetric.asInstanceOf[DictMetric],
      (inputDomain.elements.keySet - key).toSeq :+ tmp)
    val chained = ChainTT(copied, withoutOriginal)
    ChainTT(
      chained,
      createRename(
        chained.outputDomain.asInstanceOf[DictDomain],
        chained.outputMetric.asInstanceOf[DictMetric],
        tmp, key))
  }

  /** Every dict value transformed in place: out(k) = ts(k)(data(k))
    * (reference `dictionary.py:728-798`).
    */
  def createTransformAllValues(
      ts: Seq[(String, Transformation)]
  ): Transformation = {
    require(ts.nonEmpty, "transformation dict cannot be empty")
    require(ts.map(_._1).distinct.size == ts.size, "duplicate keys")
    val start: Transformation = Identity(
      DictDomain(ts.map { case (k, t) => k -> t.inputDomain }.toMap),
      DictMetric(ts.map { case (k, t) => k -> t.inputMetric }.toMap))
    ts.foldLeft(start) { case (acc, (k, t)) =>
      ChainTT(
        acc,
        createTransformValue(
          acc.outputDomain.asInstanceOf[DictDomain],
          acc.outputMetric.asInstanceOf[DictMetric],
          k, t))
    }
  }
}

/** Metric casts (reference `transformations/converters.py`). */

final case class UnwrapIfGroupedBy(
    inputDomain: DataFrameDomain,
    column: String,
    innerMetric: Metric
) extends Transformation {
  // Mirrors reference converters.py:24-78 (UnwrapIfGroupedBy): the inner
  // metric must be SumOf(...) or RootSumOfSquared(...); the output metric is
  // the inner's inner metric, and the L2 case squares the distance. Accepting
  // arbitrary inner metrics (e.g. the group-level SymmetricDifference produced
  // by AddRemoveKeys chains) would let a user-level distance pass through as a
  // row-level distance 1 with no truncation — silently under-noised.
  private val unwrapped: Metric = innerMetric match {
    case SumOf(m)            => m
    case RootSumOfSquared(m) => m
    case other =>
      throw new IllegalArgumentException(
        s"UnwrapIfGroupedBy requires inner metric SumOf(...) or " +
          s"RootSumOfSquared(...), got $other"
      )
  }
  private val isL2: Boolean = innerMetric.isInstanceOf[RootSumOfSquared]
  def inputMetric: Metric = IfGroupedBy(column, innerMetric)
  def outputMetric: Metric = unwrapped
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum =
    if (isL2) dIn * dIn else dIn
  def apply(data: Any): Any = data
}

final case class HammingToSymmetricDifference(inputDomain: DataFrameDomain)
    extends Transformation {
  def inputMetric: Metric = HammingDistance
  def outputMetric: Metric = SymmetricDifference
  def outputDomain: Domain = inputDomain
  def stabilityFunction(dIn: ExactNum): ExactNum = dIn * ExactNum(2)
  def apply(data: Any): Any = data
}
