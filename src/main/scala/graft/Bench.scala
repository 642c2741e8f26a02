package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"queries":{…}}. */
object Bench {
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
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // warm the JVM/parquet footers once with the cheapest query
    try SparkEntry.queries(names.head)(spark, sfDir).count() catch { case _: Throwable => () }
    // steady-state throughput: 3 runs per query, report the min (first run
    // pays one-off whole-stage-codegen JIT compilation, ~6s on the heavy
    // dedup pipelines; a third run tightens the min against background
    // noise on a shared box — measured run-to-run spread is ~1.5x)
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // a failed run must NOT feed its wall time into the min — a query
      // that throws fast would otherwise report as a fast success
      val times = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case t: Throwable =>
          System.err.println(s"BENCH ERROR $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          None
        }
      }
      name -> times.minOption
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + f"""\":$v%.3f"""
      case (k, None) => "\"" + k + "\":\"error\""
    }.mkString("{", ",", "}")
    val errs = results.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":3,"agg":"min","errors":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
