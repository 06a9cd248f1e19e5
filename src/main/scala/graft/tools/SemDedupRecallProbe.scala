package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-scale recall measurement for semDeDup's adaptive oversize-cell
  * split and its multi-probe opt-in (`probes`) — the production-shaped
  * companion to SemDedupSplitRecallSpec's single-cell fixture.
  *
  * Why a separate probe: the CI fixture forces ONE artificial 3000-vector
  * cell; the regime the round-14 verdict flagged is a REAL k-means cell
  * population at a corpus size where auto-nlist has hit its 4096 clamp
  * (rows > ~1M) and cells cross the 4×targetCell split trigger with
  * whatever skew the data actually has. This probe measures drop recall
  * of PLANTED near-threshold pairs against that population.
  *
  * Method (deterministic, seeded):
  *  1. read `embeddings.parquet` from SPARK_GRAFT_SF_DIR (derive a 10×
  *     fixture first via ScaleBench + SPARK_GRAFT_SCALE_TABLES=embeddings
  *     to reach the clamp regime: 2M vectors from the committed 200k);
  *  2. hash-sample PROBE_PAIRS base vectors (collect — N·dim doubles,
  *     driver-trivial), synthesize for each a partner at exact cosine
  *     PROBE_COS with an id ABOVE every corpus id, so the partner is
  *     dropped iff semDeDup finds it an earlier qualifying neighbor
  *     (its base, or — in the scaled fixture, which carries ±0.025
  *     component-perturbed copies — any copy of its base: either way a
  *     true drop by the earlier-neighbor rule);
  *  3. run semDeDup(auto nlist) at each PROBE_PROBES setting and report
  *     planted-partner recall + wall-clock as one RECALL_JSON line.
  *
  * Recall here is a LOWER bound on overall drop recall restricted to
  * near-threshold geometry (cos ≈ PROBE_COS): collinear/exact duplicates
  * are unaffected by the split by construction (bit-equal signatures),
  * so planting only the hard geometry measures exactly the term the
  * split trades away and `probes` buys back.
  */
object SemDedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_emb2m")
    val nPairs = sys.env.getOrElse("PROBE_PAIRS", "500").toInt
    val cosTarget = sys.env.getOrElse("PROBE_COS", "0.96").toDouble
    val threshold = sys.env.getOrElse("PROBE_THRESHOLD", "0.95").toDouble
    val probeSettings = sys.env.getOrElse("PROBE_PROBES", "0,1,2")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking", "true")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
    val (maxId, corpusN) = {
      val r = emb.agg(max("vec_id"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }

    // hash-chosen planted bases: deterministic, spread across the corpus
    val bases: Array[(Long, Array[Double])] = emb
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h").limit(nPairs)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    // partner at EXACT cosine cosTarget: b = cos·â + sin·(unit ⊥ jitter)
    val rnd = new java.util.Random(20260816L)
    def partnerOf(a: Array[Double]): Array[Double] = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val ah = a.map(_ / na)
      val j = Array.fill(a.length)(rnd.nextGaussian())
      val dotAJ = ah.zip(j).map { case (x, y) => x * y }.sum
      val orth = j.zip(ah).map { case (y, x) => y - dotAJ * x }
      val on = math.sqrt(orth.map(x => x * x).sum)
      val s = math.sqrt(1 - cosTarget * cosTarget) / on
      ah.zip(orth).map { case (x, o) => cosTarget * x + s * o }
    }
    val partners = bases.zipWithIndex.map { case ((_, v), k) =>
      (maxId + 1L + k, partnerOf(v))
    }
    val partnerIds = partners.map(_._1).toSet
    val partnerDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        partners.toSeq.map { case (i, v) => Row(i, v.toSeq) }, 4),
      StructType(Seq(
        StructField("vec_id", LongType, false),
        StructField("embedding", ArrayType(DoubleType, false), false))))
    val corpus = emb.unionByName(partnerDf)

    val results = probeSettings.map { p =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val keptPartners = Similarity.semDeDup(
        corpus, "vec_id", "embedding",
        threshold = threshold, nlist = 0, probes = p)
        .filter(col("vec_id") > maxId)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val dropped = partnerIds.size - keptPartners.size
      val recall = dropped.toDouble / partnerIds.size
      System.err.println(
        f"probes=$p planted recall $dropped/${partnerIds.size} = $recall%.4f wall $dt%.1f s")
      (p, dropped, recall, dt)
    }

    val body = results.map { case (p, d, r, t) =>
      f""""probes_$p":{"dropped":$d,"recall":$r%.4f,"wall_s":$t%.2f}"""
    }.mkString(",")
    println(
      s"""RECALL_JSON {"corpus":$corpusN,"planted":${partnerIds.size},""" +
      s""""cos":$cosTarget,"threshold":$threshold,$body}""")
    spark.stop()
  }
}
