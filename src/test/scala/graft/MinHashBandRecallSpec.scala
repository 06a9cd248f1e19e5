package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Jaccard-threshold recall gate for the MinHash banding constants — the
  * quality guardrail the decade-scale constant tuning runs against
  * (VERDICT r14 #6): any change to the default (numHashes, bands) must
  * keep the planted-pair recall row here green, and the knob SEMANTICS
  * are pinned the Sf1RecallSpec way (a coarser banding can only LOSE
  * candidates — a silent inversion of the band knob keeps the default
  * floor green while wrecking off-default users).
  *
  * Construction (deterministic, seeded): token-set documents at
  * shingleSize = 1, so the exact shingle-set Jaccard is controlled BY
  * CONSTRUCTION — 150 planted pairs at J = 92/108 ≈ 0.852 (100 tokens,
  * 8 replaced), each pair drawn from its own disjoint vocabulary slice so
  * no cross-pair similarity exists; 500 noise docs from a separate slice.
  *
  * Theory (one-sided banding s-curve, candidate P = 1 − (1 − s^r)^b with
  * r = numHashes/bands): at s = 0.852 —
  *   default 128/32 (r = 4):  P ≈ 1 − (1 − 0.527)^32 ≈ 1.0
  *   coarse  128/8  (r = 16): P ≈ 1 − (1 − 0.077)^8  ≈ 0.47
  * Precision needs no gate: minHashPairs verifies every candidate with
  * the exact shingle-set Jaccard, so a reported pair below the threshold
  * is impossible (asserted anyway — it would mean the verify broke).
  */
class MinHashBandRecallSpec extends SharedSpark {

  private val nPairs = 150
  private val tokensPerDoc = 100
  private val replaced = 8 // J = (100-8)/(100+8) = 0.8518
  private val threshold = 0.8

  private lazy val (docs, plantedPairs) = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    // per-pair disjoint vocab: tokens "p<k>_t<i>"; replacement tokens
    // "p<k>_r<i>" keep the pair's vocab private, so the ONLY >threshold
    // similarity in the corpus is within a planted pair
    (0 until nPairs).foreach { k =>
      val base = (0 until tokensPerDoc).map(i => s"p${k}_t$i")
      val partner =
        base.take(tokensPerDoc - replaced) ++
          (0 until replaced).map(i => s"p${k}_r$i")
      rows += ((id, base.mkString(" "))); val ia = id; id += 1
      rows += ((id, partner.mkString(" "))); pairs += ((ia, id)); id += 1
    }
    // noise docs: their own slices, zero overlap with anything
    (0 until 500).foreach { k =>
      rows += ((id, (0 until tokensPerDoc).map(i => s"n${k}_t$i").mkString(" ")))
      id += 1
    }
    (rows.toSeq, pairs.toSeq)
  }

  private def recallAt(numHashes: Int, bands: Int): Double = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val found = Dedup.minHashPairs(df, "doc_id", "text",
      shingleSize = 1, numHashes = numHashes, bands = bands,
      jaccardThreshold = threshold)
      .select(col("left_id").cast("long"), col("right_id").cast("long"),
        col("jaccard"))
      .collect()
    // precision is structural: exact-verify means nothing below threshold
    found.foreach { r =>
      assert(r.getDouble(2) >= threshold,
        s"verified pair below threshold: $r — exact verify broken")
    }
    val foundSet = found.map(r => (r.getLong(0), r.getLong(1))).toSet
    plantedPairs.count { case (a, b) =>
      foundSet.contains((a, b)) || foundSet.contains((b, a))
    }.toDouble / plantedPairs.size
  }

  test("default banding (128/32) recalls planted J=0.852 pairs; coarse banding degrades as the s-curve predicts") {
    val rDefault = recallAt(128, 32)
    val rCoarse = recallAt(128, 8)
    info(f"recall at J=0.852: default 128/32 = $rDefault%.3f " +
      f"(theory ≈ 1.0), coarse 128/8 = $rCoarse%.3f (theory ≈ 0.47)")
    assert(rDefault >= 0.95,
      f"default banding recall $rDefault%.3f under the 0.95 floor " +
        "(theory ≈ 1.0) — banding constants regressed")
    // knob semantics: coarser bands (longer rows-per-band) can only lose
    // candidates; and at r=16 the s-curve predicts a visible drop, so a
    // coarse run matching the default would mean the knob is dead
    assert(rCoarse <= rDefault + 1e-9,
      f"coarse banding ($rCoarse%.3f) beat default ($rDefault%.3f): band knob inverted?")
    assert(rCoarse >= 0.20 && rCoarse <= 0.80,
      f"coarse-band recall $rCoarse%.3f outside the s-curve window " +
        "[0.20, 0.80] (theory 0.47 ± binomial noise on 150 pairs)")
  }

  test("staged band passes are result-identical to the single-pass run") {
    // the scratch-constrained mode (bandPasses > 1) claims exact result
    // identity — same per-band hash family, exact verify, distinct over
    // the union — so compare full (left, right, jaccard) triples, not
    // just recall. Run two pass counts, the second with a broadcast
    // threshold of 0 to force the unrestricted verify fallback (both
    // verify paths must agree). verifyRestrictMinInputBytes = 0 defeats
    // the input-size gate so the restricted verify actually runs on this
    // toy corpus (in production the gate keeps small inputs on the
    // unrestricted plan).
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    def run(passes: Int, bcastMax: Long): Set[(Long, Long, Double)] =
      Dedup.minHashPairs(df, "doc_id", "text",
        shingleSize = 1, numHashes = 128, bands = 32,
        jaccardThreshold = threshold, bandPasses = passes,
        verifyBroadcastMaxPairs = bcastMax,
        verifyRestrictMinInputBytes = 0L)
        .select(col("left_id").cast("long"), col("right_id").cast("long"),
          col("jaccard"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val single = run(1, 4000000L)
    val staged4 = run(4, 4000000L)
    val staged8NoBcast = run(8, 0L)
    assert(staged4 == single,
      s"bandPasses=4 diverged: only-staged ${staged4 -- single}, " +
        s"only-single ${single -- staged4}")
    assert(staged8NoBcast == single,
      s"bandPasses=8 (unrestricted verify) diverged: " +
        s"only-staged ${staged8NoBcast -- single}, " +
        s"only-single ${single -- staged8NoBcast}")
    assert(single.nonEmpty, "equivalence vacuous: no pairs found")
  }
}
