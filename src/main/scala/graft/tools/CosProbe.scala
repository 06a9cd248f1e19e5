package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Dev utility: phase-level timing of the q_cosine_text entry
  * (Similarity.tfidfCosinePairs inlined) — attributes its wall between
  * tokenize+tf, tf-idf weighting, L2 requantization, prefix marking
  * (window), the prefix-postings candidate join, and the exact verify
  * join, so the entry's cost can be blamed on a stage. Mirrors PrProbe.
  */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    val dec = DecimalType(38, 0)
    val threshold = 0.7
    for (rep <- 1 to reps) {
      println(s"rep $rep")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(10)) === 0)
      val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
          x => x =!= "")
      val base = docs.select(col("doc_id").as("__id"), tok(col("text")).as("__t"))
      val n = base.agg(count(lit(1)).as("__n"))
      val tf = base
        .select(col("__id"), explode(col("__t")).as("term"))
        .groupBy(col("__id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist()
      t("tf (tokenize+agg)")(noop(tf))
      val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
      val w = tf
        .join(dfs, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("__id"), col("term"),
          round(lit(1000000.0) * col("tf") *
              (log((col("__n").cast("double") + lit(1.0)) /
                (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0)), 0)
            .cast("long").as("w"))
        .filter(col("w") > 0)
        .persist()
      t("w (tfidf weights)")(noop(w))
      val rawNorm = w.groupBy(col("__id"))
        .agg(sum((col("w") * col("w")).cast(dec)).as("__n2"))
      val q = w
        .join(rawNorm, Seq("__id"))
        .select(col("__id"), col("term"),
          round(lit(1000000.0) * col("w").cast("double") /
              sqrt(col("__n2").cast("double")), 0)
            .cast("long").as("q"))
        .filter(col("q") > 0)
        .persist()
      t("q (requantize)")(noop(q))
      val qNorm = q.groupBy(col("__id"))
        .agg(sum((col("q") * col("q")).cast(dec)).as("__qn2"))
        .persist()
      t("qNorm")(noop(qNorm))
      val byWeight = Window.partitionBy(col("__id"))
        .orderBy(col("q").desc, col("term").asc)
      val prefix = q
        .join(qNorm, Seq("__id"))
        .withColumn("__cumBefore",
          coalesce(
            sum((col("q") * col("q")).cast(dec))
              .over(byWeight.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0).cast(dec)))
        .filter(
          (col("__qn2") - col("__cumBefore")).cast("double") >=
            lit(threshold * threshold) * col("__qn2").cast("double"))
        .select(col("term"), col("__id").as("__pid"))
        .persist()
      t("prefix (window)")(noop(prefix))
      val full = q.select(col("term"), col("__id").as("__fid"))
      val cand = prefix
        .join(full, Seq("term"))
        .filter(col("__pid") =!= col("__fid"))
        .select(
          least(col("__pid"), col("__fid")).as("left_id"),
          greatest(col("__pid"), col("__fid")).as("right_id"))
        .distinct()
        .persist()
      t("cand (postings join)")(noop(cand))
      println(s"  cand rows: ${cand.count()}")
      val ql = q.select(col("__id").as("left_id"), col("term"), col("q").as("__ql"))
      val qr = q.select(col("__id").as("right_id"), col("term"), col("q").as("__qr"))
      val out = cand
        .join(ql, Seq("left_id"))
        .join(qr, Seq("right_id", "term"))
        .groupBy(col("left_id"), col("right_id"))
        .agg(sum((col("__ql") * col("__qr")).cast(dec)).as("__dot"))
        .join(qNorm.select(col("__id").as("left_id"), col("__qn2").as("__a2")),
          Seq("left_id"))
        .join(qNorm.select(col("__id").as("right_id"), col("__qn2").as("__b2")),
          Seq("right_id"))
        .withColumn("cosine",
          col("__dot").cast("double") /
            (sqrt(col("__a2").cast("double")) * sqrt(col("__b2").cast("double"))))
        .filter(col("cosine") >= threshold)
        .select(col("left_id"), col("right_id"), col("cosine"))
      t("verify (dot+cosine)")(noop(out))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
