package graft

import org.apache.spark.sql.functions._

/** Stress the skew-join advisor path (SCALE.md): a 10M-row probe frame
  * where ONE key carries 50% of all rows (the stubborn-hot-key corpus the
  * salted join exists for), joined to a 1k-key dimension. Readouts: the
  * advisor's wall time (one groupBy-count + scalar agg), the factor it
  * picks, salted-vs-plain join wall time, and row-count equality.
  * `runMain graft.SkewStress`. */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nRows = 10000000L
    val nKeys = 1000L
    // key 0 takes 50% of the probe; the rest hash-scatter over 1k keys
    val probe = spark.range(nRows).select(
      when(pmod(xxhash64(col("id"), lit(1)), lit(2L)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nKeys))).as("k"),
      col("id").as("v"))
      .localCheckpoint(true)
    val dim = spark.range(nKeys).select(col("id").as("k"),
      (col("id") * 10).as("w")).localCheckpoint(true)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val a = f; (a, (System.nanoTime - t0) / 1e9)
    }
    val (factor, tAdvise) = time {
      graft.operators.SkewJoin.suggestSalt(probe, Seq("k"),
        targetRowsPerTask = 500000L)
    }
    // regime 1: dim under the broadcast threshold — plain wins, salting
    // is pure overhead (that's WHY the advisor exists; don't salt blindly)
    val (nPlainB, tPlainB) = time {
      probe.join(dim, Seq("k"), "inner").count()
    }
    val (nSaltedB, tSaltedB) = time {
      graft.operators.SkewJoin.saltedJoin(probe, dim, Seq("k"), "inner",
        factor = factor).count()
    }
    // regime 2: the target case — a shuffle join where AQE's runtime skew
    // split cannot apply (here: disabled, as when the skewed side feeds
    // an aggregation or the join is not sort-merge); the hot key's rows
    // all land in ONE task unless salted
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (nPlainS, tPlainS) = time {
      probe.join(dim, Seq("k"), "inner").count()
    }
    val (nSaltedS, tSaltedS) = time {
      graft.operators.SkewJoin.saltedJoin(probe, dim, Seq("k"), "inner",
        factor = factor).count()
    }
    println(f"SKEWSTRESS rows=$nRows hot_frac=0.5 advise=$tAdvise%.1fs " +
      f"factor=$factor broadcast[plain=$tPlainB%.1fs salted=$tSaltedB%.1fs] " +
      f"shuffle_noskewfix[plain=$tPlainS%.1fs salted=$tSaltedS%.1fs] " +
      f"rows_equal=${nPlainB == nSaltedB && nPlainS == nSaltedS && nPlainB == nPlainS}")
    spark.stop()
  }
}
