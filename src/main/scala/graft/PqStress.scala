package graft

import org.apache.spark.sql.functions._

/** Stress the IVF-PQ ANN path (SCALE.md): 1M synthetic 64-dim vectors —
  * codebook training, full-corpus encode, ADC search with exact rerank,
  * vs brute-force cosine top-k over the same queries. */
object PqStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 1000000L
    val dim = 64
    // deterministic pseudo-random unit-ish vectors, plan-generated
    val vec = array((0 until dim).map(i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(2000L)).cast("double") / 1000.0
        - 1.0)): _*)
    val corpus = spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
      .localCheckpoint(true)
    val queries = corpus.filter(col("vec_id") < 50).localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var cents: Array[Array[Double]] = null
    var books: Array[Array[Array[Double]]] = null
    val tTrain = time {
      cents = graft.functions.Similarity.trainIvfCentroids(
        corpus, "embedding", k = 64, iterations = 2, sampleSize = 20000,
        totalRows = Some(n))
      books = graft.functions.Similarity.trainPqCodebooks(
        corpus, "embedding", numSubspaces = 8, codebookSize = 256,
        iterations = 6, sampleSize = 20000, totalRows = Some(n))
    }
    val tEncode = time {
      corpus.select(graft.functions.Similarity.pqEncode(
        graft.functions.Similarity.l2normalize(col("embedding")), books)
        .as("codes")).agg(count(lit(1))).collect()
    }
    var brute: org.apache.spark.sql.DataFrame = null
    var bruteRows = 0L
    val tBrute = time {
      brute = graft.functions.Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", k = 10).localCheckpoint(true)
      bruteRows = brute.count()
    }
    // the recall/cost dial, measured on the ANN worst case (i.i.d.
    // uniform vectors — no cluster structure for IVF to exploit):
    // recall@10 at two probe/refine budgets
    val results = Seq((8, 4), (32, 20)).map { case (nProbe, refine) =>
      var pq: org.apache.spark.sql.DataFrame = null
      val t = time {
        pq = graft.functions.Similarity.ivfPqTopK(
          corpus, queries, "vec_id", "embedding", k = 10, cents, books,
          nProbe = nProbe, refine = refine).localCheckpoint(true)
        pq.count()
      }
      val hits = brute.select("query_id", "neighbor_id")
        .join(pq.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
      f"probe$nProbe/refine$refine: t=$t%.1f recall=${
        hits.toDouble / math.max(1L, bruteRows)}%.3f"
    }
    println(f"PQSTRESS n=$n train=$tTrain%.1f encode=$tEncode%.1f " +
      f"brute=$tBrute%.1f bruteRows=$bruteRows ${results.mkString(" | ")}")
    spark.stop()
  }
}
