package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics over edge tables. Web-scale corpus curation ranks
  * sources by link structure (Common Crawl releases harmonic-centrality /
  * PageRank host rankings precisely for this); the same shapes serve
  * user-item interaction graphs.
  *
  * Scale notes. Ranks and degrees are one row per node — tiny next to the
  * edge table, which is the thing that must not be re-shuffled per
  * iteration. Edges are therefore joined to the out-degree ONCE and
  * persisted pre-partitioned on `src`; every iteration then shuffles only
  * the rank table (nodes rows) into that layout, aggregates contributions
  * map-side, and produces the next rank. Lineage is truncated by
  * persisting each iterate and unpersisting its predecessor, so the plan
  * does not grow with the iteration count.
  */
object Graph {

  /** Fixed-iteration damped PageRank without dangling redistribution
    * (nodes with no out-edges leak mass, as in the classic formulation;
    * feed a symmetrized edge set if every node should retain mass).
    *
    * Input `edges` must have columns (`src`, `dst`); multi-edges count
    * multiply. Returns (`id`, `r`) after `iters` rounds of
    * r' = (1-d)/N + d * Σ_in r/outdeg from uniform initialization.
    * Deterministic given the edge set.
    *
    * `roundDigits > 0` quantizes each iterate to that many decimal
    * digits — the engine-replayable mode: per-node contribution sums are
    * order-dependent in their last few ulps (~1e-17 here), so replaying
    * the recurrence on another engine drifts unless every iterate is
    * snapped to a grid much coarser than the drift. GraphSpec pins the
    * guard band (every pre-round iterate sits far from a grid boundary).
    *
    * `initial` overrides the uniform start — single-iteration callers use
    * it to step the recurrence explicitly (see the guard-band test).
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      numPartitions: Int = 0,
      roundDigits: Int = 0,
      initial: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val parts =
      if (numPartitions > 0) numPartitions
      else edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // The caller's edge derivation can be arbitrarily expensive (q_pagerank
    // joins two tables and distincts), and the preamble below reads it from
    // FIVE subtrees across SEPARATE actions (deg + the e side of ed, both
    // nodes union legs, the nodes.count). Persist it once: without this the
    // derivation re-executed per action — ~2× the whole entry at sf0.1
    // (round-17 phase probe: nodes 2.3 s + ed 3.0 s vs 2.8 s for all three
    // iterations), and 3–4 redundant full input passes at scale.
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // nodes and ed are LINEAGE-TRUNCATED, not merely persisted: the fused
    // multi-iteration action below references nodes 4x and ed 3x, and with
    // plain persist every reference re-embeds the caller's whole edge
    // derivation in the logical plan (the round-17 q_pagerank explain was
    // 13k lines of nested InMemoryRelation subtrees — per-materialization
    // analyzer/optimizer work that is driver-side and core-count-
    // independent). localCheckpoint materializes the same blocks (eager,
    // MEMORY_AND_DISK) but replaces the subtree with a LogicalRDD leaf, so
    // every downstream plan is iteration-sized. Trade-off, documented: a
    // lost executor can no longer recompute a checkpointed block from
    // lineage — acceptable for an iterative operator that re-runs from the
    // caller's edges on failure.
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // one driver-side long — bounded by construction
    // edge×degree joined once, laid out by src for every later rank join
    val ed = e.join(deg, "src")
      .repartition(parts, col("src"))
      .localCheckpoint()
    // ed is materialized from the cached e by the checkpoint; drop e —
    // iterations only read ed and nodes, and holding a second edge-sized
    // cache would double the operator's storage footprint at scale
    e.unpersist()
    val teleport = (1.0 - damping) / n
    var rank = initial.getOrElse(nodes.withColumn("r", lit(1.0 / n)))
    // Iterations are chained LAZILY and only materialized every few rounds:
    // each materialization is a full Spark action (broadcast build + shuffle
    // + cache write + count), so running one per iteration serialized the
    // recurrence into iters jobs — measured round 17 at sf0.1, the three
    // per-iteration jobs were ~1 s each while the same three rounds fused
    // into one job share scheduling, codegen and the ed cache scan. The
    // interval still bounds plan depth (lineage never exceeds
    // materializeEvery rounds), which is the reason the per-iteration
    // persist existed — long PageRank runs must not grow an unbounded plan.
    val materializeEvery = 4
    var sinceMat = 0
    for (i <- 1 to iters) {
      val contrib = ed.join(rank, ed("src") === rank("id"))
        .groupBy(ed("dst").as("id"))
        .agg(sum(col("r") / col("outdeg")).as("c"))
      val raw =
        lit(teleport) + lit(damping) * coalesce(col("c"), lit(0.0))
      rank = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (if (roundDigits > 0) round(raw, roundDigits) else raw).as("r"))
      sinceMat += 1
      if (sinceMat == materializeEvery || i == iters) {
        // localCheckpoint (eager): materializes the iterate AND truncates
        // its lineage to a LogicalRDD leaf, so the next chain's plan starts
        // iteration-sized instead of stacking materializeEvery more rounds
        // on top of the previous chain's full plan. The predecessor's
        // blocks are reclaimed by the ContextCleaner once the old Dataset
        // is unreachable (each checkpoint is one nodes-sized table — tiny
        // next to the edge cache, so no explicit unpersist is needed).
        rank = rank.localCheckpoint()
        sinceMat = 0
      }
    }
    rank
  }

  /** Exact triangle count over an undirected graph, single-row output
    * (`n_triangles` BIGINT). Triangle density separates organic link
    * neighborhoods from spam link farms, and is the classic
    * worst-case-quadratic graph statistic that must be oriented to
    * survive scale.
    *
    * Plan: the node-iterator++ scheme — each undirected edge is oriented
    * from its (degree, id)-smaller endpoint toward the larger, so every
    * node's out-degree is O(sqrt(|E|)) on skewed (power-law) graphs and
    * the wedge self-join explodes at the orientation-bounded rate rather
    * than the hub-degree rate. Wedges (a→b, a→c) are enumerated once in
    * canonical ((deg,id) of b) < ((deg,id) of c) order and closed by one
    * equi-join back to the oriented edge list, which holds b→c under
    * exactly that order — three shuffles total, no driver-side state.
    * Multi-edges and self-loops are dropped first (distinct + u<v).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // persisted: the canonical edge set is read three times (degree
    // aggregate + both endpoint joins) and the oriented table three
    // times (wedge legs x/y + closure z). Without the caches the whole
    // upstream — including the caller's edge derivation — re-executes
    // per leg (a probed entry plan carried 122 exchanges; with the
    // caches it is one). Deliberately not unpersisted here (the result
    // is lazy); callers / harnesses clear caches after their action.
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one scan: explode both endpoints instead of a two-scan union
    val deg = und
      .select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    // u < v always holds, so (du < dv) OR (du == dv) orients toward the
    // (deg, id)-larger endpoint with id as the tiebreak
    val fwd = col("du") < col("dv") || col("du") === col("dv")
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedgeOrder =
      col("x.ddeg") < col("y.ddeg") ||
        (col("x.ddeg") === col("y.ddeg") && col("x.dst") < col("y.dst"))
    oriented.as("x")
      .join(oriented.as("y"),
        col("x.src") === col("y.src") && wedgeOrder)
      .join(oriented.as("z"),
        col("z.src") === col("x.dst") && col("z.dst") === col("y.dst"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** In/out degree profile per node — the first quality signal over a link
    * graph (spam hosts are out-degree outliers). One scan and ONE
    * map-side-combined aggregation: each edge explodes to an (endpoint,
    * is-out) pair and both degrees are conditional sums — the previous
    * two-aggregate + full-outer-join shape read the caller's edge
    * derivation twice and paid three exchanges. A NULL endpoint now
    * yields one merged NULL-id row (the outer join kept the two sides'
    * NULL groups as separate rows — null keys never join); no declared
    * caller emits NULL node ids. */
  def degrees(edges: DataFrame): DataFrame =
    edges
      .select(explode(array(
        struct(col("src").as("id"), lit(1L).as("__o")),
        struct(col("dst").as("id"), lit(0L).as("__o")))).as("__e"))
      .groupBy(col("__e.id").as("id"))
      .agg(sum(col("__e.__o")).as("out_deg"),
        sum(lit(1L) - col("__e.__o")).as("in_deg"))
}
