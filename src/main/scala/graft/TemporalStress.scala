package graft

import org.apache.spark.sql.functions._

/** Stress the temporal/product-analytics family (SCALE.md): 20M synthetic
  * events over 500k users across a 30-day horizon, with 10 planted hub
  * users carrying 0.05% of all events EACH — the adversarial shape for the
  * re-entry funnel, whose per-user (anchor × candidate) join is the
  * documented quadratic hazard (a hub's thousands of step-1 anchors each
  * scan its thousands of step-2/3 events). Readouts: wall time for greedy
  * funnel, re-entry funnel, weekly retention, and per-user interval
  * merging of 10M half-open activity windows over 200k keys.
  */
object TemporalStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nEvents = 20000000L
    val nUsers = 500000L
    val horizon = 30L * 86400
    // 10 hub users get 0.05% of events EACH (1/200 of all events split
    // across 10 hubs = 10k events apiece); the rest hash-scatter.
    // Event mix: 30% s1 / 30% s2 / 20% s3 / 20% noise.
    val ev = spark.range(nEvents).select(
      when(pmod(xxhash64(col("id"), lit(1)), lit(200L)) === 0,
        pmod(xxhash64(col("id"), lit(2)), lit(10L)))
        .otherwise(pmod(xxhash64(col("id"), lit(3)), lit(nUsers)))
        .cast("string").as("user_id"),
      timestamp_seconds(pmod(xxhash64(col("id"), lit(4)), lit(horizon)))
        .as("ts"),
      element_at(
        array(lit("s1"), lit("s1"), lit("s1"), lit("s2"), lit("s2"),
          lit("s2"), lit("s3"), lit("s3"), lit("zz"), lit("zz")),
        (pmod(xxhash64(col("id"), lit(5)), lit(10L)) + 1).cast("int"))
        .as("event_type"))
      .localCheckpoint(true)
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime
      val n = f
      ((System.nanoTime - t0) / 1e9, n)
    }
    val steps = Seq("s1", "s2", "s3")
    val (tG, nG) = time {
      graft.operators.TemporalOps.funnel(
        ev, "user_id", "ts", "event_type", steps, 86400L).count()
    }
    println(f"TEMPORALSTRESS funnel_greedy events=$nEvents users=$nUsers " +
      f"time=$tG%.1f rows=$nG")
    val (tR, nR) = time {
      graft.operators.TemporalOps.funnel(
        ev, "user_id", "ts", "event_type", steps, 3600L, restart = true)
        .count()
    }
    println(f"TEMPORALSTRESS funnel_restart events=$nEvents users=$nUsers " +
      f"window=3600 time=$tR%.1f rows=$nR")
    val (tRet, nRet) = time {
      graft.operators.TemporalOps.retention(ev, "user_id", "ts", 604800L)
        .count()
    }
    println(f"TEMPORALSTRESS retention events=$nEvents time=$tRet%.1f rows=$nRet")
    // 10M activity intervals over 200k keys (~50 per key), 30-min spans:
    // the per-key sweep sorts ~50 rows per key, parallel across keys
    val iv = spark.range(10000000L).select(
      pmod(xxhash64(col("id"), lit(7)), lit(200000L)).as("k"),
      pmod(xxhash64(col("id"), lit(8)), lit(horizon)).as("s"))
      .withColumn("e", col("s") + 1800)
      .localCheckpoint(true)
    val (tM, nM) = time {
      graft.operators.TemporalOps.mergeIntervals(
        iv, Seq("k"), "s", "e", validate = true).count()
    }
    println(f"TEMPORALSTRESS merge_intervals n=10000000 keys=200000 " +
      f"time=$tM%.1f merged=$nM")
    spark.stop()
  }
}
