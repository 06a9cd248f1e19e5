package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs each `graft.examples.*` main in its OWN forked JVM — exactly the
  * external-user experience (`sbt "runMain graft.examples.X dir"`), and
  * the only honest way to test mains that own their SparkSession
  * lifecycle (they call spark.stop(), which must not kill the shared
  * test session). A marker line from each example's output is asserted
  * so a main that silently did nothing still fails.
  */
class ExamplesSpec extends AnyFunSuite {

  private val data = "/root/testdata/sf0.001"

  // same module openings build.sbt forks with (Spark 4 on JDK 17)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runExample(mainClass: String): String = {
    import scala.sys.process._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val out = new StringBuilder
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, mainClass, data)
    val exit = Process(cmd).!(
      ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(exit == 0, s"$mainClass exited $exit; output:\n$out")
    out.toString
  }

  test("DpAggregateExample runs end-to-end") {
    assume(new java.io.File(s"$data/lineitem.parquet").exists)
    val out = runExample("graft.examples.DpAggregateExample")
    assert(out.contains("total privacy spend: eps = 2"), out.take(2000))
    // group-complete: the absent public key is still released
    assert(out.contains("X"), "absent public key (X,Y) not in output")
  }

  test("MinHashDedupExample runs end-to-end") {
    assume(new java.io.File(s"$data/documents.parquet").exists)
    val out = runExample("graft.examples.MinHashDedupExample")
    assert(out.contains("near-duplicates"), out.take(2000))
  }

  test("StreamingNoisyCountsExample runs end-to-end") {
    assume(new java.io.File(s"$data/events.parquet").exists)
    val out = runExample("graft.examples.StreamingNoisyCountsExample")
    assert(out.contains("noisy hourly counts"), out.take(2000))
  }

  test("CurationPipelineExample runs end-to-end") {
    assume(new java.io.File(s"$data/documents.parquet").exists)
    val out = runExample("graft.examples.CurationPipelineExample")
    assert(out.contains("curation funnel:"), out.take(2000))
  }
}
