package graft

import org.apache.spark.sql.functions._

/** Stress the mergeable-sketch path (SCALE.md): 20M rows → per-(key, shard)
  * HLL partials → sketch-space merge, vs the exact expand-and-count plan. */
object SketchStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(20000000L).select(
      (col("id") % 16).as("k"), pmod(col("id"), lit(64)).as("shard"),
      (col("id") % 1000000).as("u")).localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var est: Array[Long] = Array.empty
    val tMerge = time { est = graft.functions.Sketches.hllMergeEstimate(
      graft.functions.Sketches.hllPartial(df, Seq("k", "shard"), "u"),
      Seq("k")).collect().map(_.getLong(1)).sorted }
    val tExact = time { df.groupBy("k").agg(countDistinct(col("u"))).collect() }
    println(f"SKSTRESS merge=$tMerge%.1f exact=$tExact%.1f " +
      s"estMin=${est.head} estMax=${est.last}")
    spark.stop()
  }
}
