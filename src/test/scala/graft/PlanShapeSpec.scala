package graft

/** Pins the physical-plan shape of the three round-12 codegen kernels
  * (DotProduct, LshSignature, NormalizeUrlExpr) inside the ACTUAL driver
  * entries that motivated them — not just isolated projections. The
  * regression this guards: an edit that reformulates one of these ops via
  * `aggregate`/`zip_with`/`transform` lambdas silently reverts the hot
  * path to interpreted evaluation (Spark HOFs never enter whole-stage
  * codegen and share no subexpressions), which r12 measured at 2.6x on
  * lshTopK. `lambdafunction` is the definitive explain-string marker of
  * an interpreted HOF; the kernel node names are counted EXACTLY so a
  * duplicated (re-computed) kernel projection also fails the pin.
  */
class PlanShapeSpec extends SharedSpark {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan.toLowerCase).size

  private def describe(plan: String): String =
    Seq("lshsignature", "dotproduct", "normalizeurl", "lambdafunction",
      "zip_with")
      .map(n => s"$n=${count(plan, n)}").mkString(", ")

  /** Lambda lines whose lambda is NOT the entry fixture's planted-dup
    * `transform(embedding, x -> x * 2.0)` scaling (a collinear-duplicate
    * construction in SparkEntry, not operator code — scaling an array by
    * a scalar has no lambda-free builtin). Anything else interpreted in
    * these plans is a kernel regression.
    */
  private def foreignLambdaLines(plan: String): Seq[String] =
    plan.linesIterator
      .filter(_.toLowerCase.contains("lambdafunction"))
      .filterNot(_.contains("* 2.0"))
      .map(_.trim.take(200)).toSeq

  test("q_lsh_topk: signature/probe/dot kernels, zero interpreted lambdas") {
    val p = planOf("q_lsh_topk")
    assert(count(p, "lambdafunction") === 0, describe(p))
    assert(count(p, "zip_with") === 0, describe(p))
    assert(count(p, "lshsignature") >= 1, describe(p))
    assert(count(p, "lshprobeorder") >= 1, describe(p))
    assert(count(p, "dotproduct") >= 1, describe(p))
  }

  test("q_cosine_dup: dot kernel, no interpreted lambdas beyond the fixture") {
    val p = planOf("q_cosine_dup")
    assert(foreignLambdaLines(p) === Seq.empty)
    assert(count(p, "zip_with") === 0, describe(p))
    assert(count(p, "lshsignature") >= 1, describe(p))
    assert(count(p, "dotproduct") >= 1, describe(p))
  }

  test("q_url_normalize/q_url_dedup: one-match kernel, no lambdas") {
    val pn = planOf("q_url_normalize")
    assert(count(pn, "lambdafunction") === 0, describe(pn))
    assert(count(pn, "normalizeurl") >= 1, describe(pn))
    val pd = planOf("q_url_dedup")
    assert(count(pd, "lambdafunction") === 0, describe(pd))
    assert(count(pd, "normalizeurl") >= 1, describe(pd))
  }

  test("q_ann_topk and q_semdedup: dot kernel, no foreign lambdas") {
    val pa = planOf("q_ann_topk")
    assert(count(pa, "lambdafunction") === 0, describe(pa))
    assert(count(pa, "dotproduct") >= 1, describe(pa))
    val ps = planOf("q_semdedup")
    assert(foreignLambdaLines(ps) === Seq.empty)
    // since the round-14 verify rework, semDeDup's cosines run inside the
    // within-bucket EarlierNeighborIds kernel (plans/VerifyExpr.scala)
    // instead of a DotProduct column expression over materialized pairs
    assert(count(ps, "earlierneighborids") >= 1, describe(ps))
  }
}
