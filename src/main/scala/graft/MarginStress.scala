package graft

import org.apache.spark.sql.functions._

/** Margin-mining stress: hash-generated embedding corpora, exact vs the
  * annJoin-routed approx path. The exact leg (broadcast cross scoring)
  * runs at the sf1-gate scale (10k × 10k) where it is the adjudicated
  * baseline; the approx leg then runs at 10× that on BOTH sides — the
  * regime where the exact form's |src|·|tgt| cosine matrix is no longer
  * computable — and the printed pair-agreement at the common scale keeps
  * the speed claim honest. Prints one line; numbers recorded in
  * SCALE.md. */
object MarginStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    // unit-scale deterministic vectors: coordinate j of row id draws from
    // xxhash64(id, j) mapped into [-1, 1] — non-degenerate, seed-free
    def corpus(n: Long, salt: Int) = {
      val vec = transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id"), j + lit(salt)), lit(2001L))
          .cast("double") - lit(1000.0)) / lit(1000.0))
      spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
        .localCheckpoint(true)
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    import graft.functions.Similarity
    // common scale: exact is feasible — measure both and their agreement
    val srcS = corpus(10000, 1)
    val tgtS = corpus(10000, 2)
    // localCheckpoint inside the timed region: each leg computes ONCE
    // (the agreement join below reuses the materialized pairs)
    var exactPairs: org.apache.spark.sql.DataFrame = null
    val tExact = time {
      exactPairs = Similarity.marginMine(srcS, tgtS, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity)
        .select("src_id", "tgt_id").localCheckpoint(true)
    }
    val exactRows = exactPairs.count()
    // one mined pair per src: zero means the exact leg regressed (or the
    // corpus degenerated) — fail loudly instead of printing a NaN
    // agreement line into SCALE.md
    require(exactRows > 0,
      "exact marginMine leg emitted zero pairs; agreement is undefined")
    var approxPairsS: org.apache.spark.sql.DataFrame = null
    val tApproxS = time {
      approxPairsS = Similarity.marginMine(srcS, tgtS, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity, approx = true,
        nTables = 16, nBits = 10, probes = 2)
        .select("src_id", "tgt_id").localCheckpoint(true)
    }
    val approxRowsS = approxPairsS.count()
    val agree = exactPairs.join(approxPairsS, Seq("src_id", "tgt_id"),
      "left_semi").count().toDouble / exactRows
    // 10x on BOTH sides: 100x the exact leg's pair count — approx only
    val srcL = corpus(100000, 3)
    val tgtL = corpus(100000, 4)
    var approxRowsL = 0L
    val tApproxL = time {
      approxRowsL = Similarity.marginMine(srcL, tgtL, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity, approx = true,
        nTables = 8, nBits = 14, probes = 2).count()
    }
    println(f"MARGINSTRESS dim=$dim exact_10kx10k=$tExact%.1f s " +
      f"(rows=$exactRows) approx_10kx10k=$tApproxS%.1f s " +
      f"(rows=$approxRowsS, pair_agreement=$agree%.3f) " +
      f"approx_100kx100k=$tApproxL%.1f s (rows=$approxRowsL)")
    spark.stop()
  }
}
