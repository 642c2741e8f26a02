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

    // Misra-Gries heavy hitters: Zipf-ish item stream (cubed uniform over
    // 50k distinct items), 16 keys. The exact plan's exchange keys on
    // (k, item) — it grows with the distinct population; MG's exchange is
    // numPartitions × (k+1) counter rows regardless of corpus size.
    val zipf = spark.range(20000000L).select((col("id") % 16).as("k"),
      concat(lit("w"), floor(pow(pmod(col("id") * 2654435761L, lit(100000L))
        .cast("double") / 100000.0, 3.0) * 50000).cast("long")).as("w"))
      .localCheckpoint(true)
    var nHH = 0L
    val tMg = time { nHH = graft.functions.Sketches
      .frequentItems(zipf, Seq("k"), "w", k = 50).count() }
    val tTop = time { zipf.groupBy("k", "w").count()
      .filter(col("count") > 20000000L / 51 / 16).collect() }
    println(f"MGSTRESS mg=$tMg%.1f exactTop=$tTop%.1f candidates=$nHH")

    // Count-Min: 64 shard partials, driver merge, probe 20 items
    val tCms = time {
      val m = graft.functions.Sketches.cmsMerge(
        graft.functions.Sketches.cmsPartial(
          zipf.withColumn("shard", pmod(xxhash64(col("w"), col("k")), lit(64))),
          Seq("shard"), "w")
          .collect().map(_.getAs[Array[Byte]](1)))
      (0 until 20).foreach(i =>
        graft.functions.Sketches.cmsEstimate(m, s"w$i"))
    }
    println(f"CMSSTRESS build+merge+probe=$tCms%.1f")
    spark.stop()
  }
}
