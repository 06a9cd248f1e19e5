package graft

import graft.ops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property gate for semDeDup's bounded-bucket behavior at the cap
  * boundary (VERDICT r16 stretch #7): the deterministic near-cap case in
  * SemDedupSplitRecallSpec pins ONE geometry; this suite generates 200+
  * random (corpus size, dim, cap, probes) configurations — collinear
  * duplicate families plus noise, caps drawn to land under, between and
  * over the base/probed membership counts — and asserts the two contracts
  * the fused trim guarantees at EVERY configuration:
  *
  *   1. monotonicity: the probed drop set is a superset of the probes = 0
  *      drop set (over-cap buckets trim probe copies back to base
  *      membership rather than dropping whole — ADVICE r15/r16);
  *   2. precision: every dropped id has an EARLIER id at cosine ≥
  *      threshold somewhere in the corpus (brute-force truth), i.e. the
  *      trim never manufactures a false drop.
  *
  * "Every collect buffer ≤ cap" is internal to the plan (counts are
  * aggregated before any array is built — Similarity.scala's fused
  * stats/marks pass); its observable face is exactly (1) + (2) plus the
  * absence of whole-bucket drops that (1) would catch.
  *
  * Fixtures are deliberately tiny (≤ 90 vectors, dim ≤ 16) so 200
  * sessions stay cheap; nlist = 1 puts everything in one cell, so the cap
  * and the oversize split govern — which is the regime under test.
  */
object SemDedupCapProps extends Properties("semdedup-cap") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  private lazy val spark = SharedSpark.session
  private val threshold = 0.95

  private final case class Cfg(
      nFam: Int, famSize: Int, nNoise: Int, dim: Int, cap: Int,
      probes: Int, seed: Long)

  private val cfgGen: Gen[Cfg] = for {
    nFam <- Gen.chooseNum(1, 4)
    famSize <- Gen.chooseNum(2, 12)
    nNoise <- Gen.chooseNum(5, 40)
    dim <- Gen.oneOf(4, 8, 16)
    // caps spanning well-under to well-over the single-cell population,
    // so splits, near-cap trims and whole-bucket drops all get drawn
    cap <- Gen.chooseNum(4, 80)
    probes <- Gen.chooseNum(1, 3)
    seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
  } yield Cfg(nFam, famSize, nNoise, dim, cap, probes, seed)

  private def vectors(c: Cfg): Seq[(Long, Array[Double])] = {
    val rnd = new java.util.Random(c.seed)
    def unit(): Array[Double] = {
      val v = Array.fill(c.dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) unit() else v.map(_ / n)
    }
    var id = -1L
    def nextId(): Long = { id += 1; id }
    val fams = (0 until c.nFam).flatMap { _ =>
      val base = unit()
      // positive scaling keeps cosine exactly 1 within a family
      (0 until c.famSize).map(_ =>
        (nextId(), base.map(_ * (1.0 + rnd.nextDouble()))))
    }
    val noise = (0 until c.nNoise).map(_ => (nextId(), unit()))
    // interleave deterministically so family members are not id-contiguous
    (fams ++ noise).sortBy { case (i, _) => (i * 2654435761L) ^ c.seed }
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  private def drops(
      vecs: Seq[(Long, Array[Double])], cap: Int, probes: Int): Set[Long] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map { case (i, v) => Row(i, v.toSeq) }, 2),
      StructType(Seq(
        StructField("vec_id", LongType, false),
        StructField("embedding", ArrayType(DoubleType, false), false))))
    val kept = Similarity.semDeDup(df, "vec_id", "embedding",
      threshold = threshold, nlist = 1, refineIterations = 0,
      maxBucketSize = cap, probes = probes)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    vecs.map(_._1).toSet -- kept
  }

  property("near-cap trim: base drops are a lower bound, no false drops") =
    forAll(cfgGen) { c =>
      Prop.secure {
        val vecs = vectors(c)
        val arr = vecs.sortBy(_._1).toArray
        val trueDrops = (1 until arr.length).filter { j =>
          (0 until j).exists(i => cos(arr(i)._2, arr(j)._2) >= threshold)
        }.map(arr(_)._1).toSet
        val d0 = drops(vecs, c.cap, probes = 0)
        val dp = drops(vecs, c.cap, c.probes)
        val lost = d0 -- dp
        assert(lost.isEmpty,
          s"$c: probes=${c.probes} LOST base drops ${lost.take(5)}")
        val false0 = d0 -- trueDrops
        assert(false0.isEmpty, s"$c: probes=0 false drops ${false0.take(5)}")
        val falseP = dp -- trueDrops
        assert(falseP.isEmpty,
          s"$c: probes=${c.probes} false drops ${falseP.take(5)}")
        spark.catalog.clearCache()
        true
      }
    }
}
