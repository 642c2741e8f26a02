package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"queries":{…}}.
  *
  * The line also carries:
  *  - `loadavg_start`/`loadavg_end` (1-min /proc/loadavg): a run polluted
  *    by box contention is self-identifying instead of masquerading as a
  *    code regression (the r4 snapshot measured 27.9 s under end-of-round
  *    load for a build whose idle-box time was 12.0 s);
  *  - `h_total` + `h_queries`: the 22-query TPC-H-adapted relational suite,
  *    so relational-core regressions are caught round-over-round. `value`
  *    stays the 14 headline queries ONLY — its series is comparable across
  *    rounds and against BASELINE.md.
  */
object Bench {
  private def loadavg1m: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      // signature/verification frames at bench scale are tens of MB; let
      // them broadcast instead of paying two shuffle-join sorts (at real
      // scale they exceed this and AQE falls back to sort-merge)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadavg1m
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // warm the JVM/parquet footers once with the cheapest query
    try SparkEntry.queries(names.head)(spark, sfDir).count() catch { case _: Throwable => () }

    /** Min-of-`runs` wall time per query; a failed run must NOT feed its
     * wall time into the min — a query that throws fast would otherwise
     * report as a fast success. */
    def time(qs: Seq[String], runs: Int): Seq[(String, Option[Double])] =
      qs.map { name =>
        val fn = SparkEntry.queries(name)
        val times = (1 to runs).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case t: Throwable =>
            System.err.println(s"BENCH ERROR $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
            None
          }
        }
        name -> times.minOption
      }

    def fmt(rs: Seq[(String, Option[Double])]): String = rs.map {
      case (k, Some(v)) => "\"" + k + f"""\":$v%.3f"""
      case (k, None) => "\"" + k + "\":\"error\""
    }.mkString("{", ",", "}")

    // steady-state throughput: 3 runs per query, report the min (first run
    // pays one-off whole-stage-codegen JIT compilation, ~6s on the heavy
    // dedup pipelines; a third run tightens the min against background
    // noise on a shared box — measured run-to-run spread is ~1.5x)
    val results = time(names, runs = 3)
    // TPC-H-adapted relational suite: 2 runs (22 queries; the min still
    // sheds the per-plan codegen cost, and the suite is ~1 s/query)
    val hNames = TpchSuite.sql.keys.toSeq.sorted.map(n => s"${n}_tpch")
      .filter(SparkEntry.queries.contains)
    val hResults = time(hNames, runs = 2)
    val loadEnd = loadavg1m

    val errs = results.count(_._2.isEmpty)
    val hErrs = hResults.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    val hTotal = hResults.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":3,"agg":"min","errors":$errs,"queries":${fmt(results)},"h_total":$hTotal%.3f,"h_runs":2,"h_errors":$hErrs,"h_queries":${fmt(hResults)},"loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
