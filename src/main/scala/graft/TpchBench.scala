package graft

/** Wall-clock for the TPC-H-adapted suite (SCALE.md): each h-query end to
  * end (plan + execute + collect) on SPARK_GRAFT_SF_DIR (default sf0.1),
  * min of `runs`. */
object TpchBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = 2
    var total = 0.0
    val times = TpchSuite.sql.keys.toSeq.sorted.map { n =>
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime
        SparkEntry.queries(s"${n}_tpch")(spark, dir).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      total += t
      f"$n=$t%.2f"
    }
    println(f"TPCHBENCH total=$total%.1f " + times.mkString(" "))
    spark.stop()
  }
}
