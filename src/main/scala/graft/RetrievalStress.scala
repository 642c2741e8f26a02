package graft

import org.apache.spark.sql.functions._

/** BM25 stress: 1M synthetic documents (hash-generated token streams over
  * a 50k-term vocabulary with a Zipf-ish skew) × 1k queries, top-10 —
  * measures the posting-aggregate + broadcast-query-join + windowed-top-k
  * pipeline at retrieval scale. Prints one line; numbers recorded in
  * SCALE.md. */
object RetrievalStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nDocs = 1000000L
    val docLen = 40
    // skewed vocabulary: 20% of positions draw from the 100 hottest
    // tokens, the rest spread over 50k — a web-ish Zipf head without
    // overflow-prone arithmetic (ANSI mode is on)
    val tok = (i: Int) => concat(lit("t"),
      when(pmod(xxhash64(col("id"), lit(i * 2)), lit(5L)) === 0,
        pmod(xxhash64(col("id"), lit(i * 2 + 1)), lit(100L)))
        .otherwise(pmod(xxhash64(col("id"), lit(i * 2 + 1)), lit(50000L)))
        .cast("string"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to docLen).map(tok): _*).as("text"))
      .localCheckpoint(true)
    val queries = spark.range(1000).select(col("id").as("query_id"),
      concat_ws(" ", (1 to 4).map(tok): _*).as("qtext"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var rows = 0L
    val t = time {
      rows = graft.functions.TextFunctions.bm25TopK(
        docs, "doc_id", "text", queries, "query_id", "qtext", topK = 10)
        .count()
    }
    var rowsCut = 0L
    val tCut = time {
      rowsCut = graft.functions.TextFunctions.bm25TopK(
        docs, "doc_id", "text", queries, "query_id", "qtext", topK = 10,
        maxDfFraction = 0.01).count()
    }
    println(f"RETRIEVALSTRESS docs=$nDocs doclen=$docLen queries=1000 " +
      f"topk=10 time=$t%.1f result_rows=$rows " +
      f"dfcut_time=$tCut%.1f dfcut_rows=$rowsCut")
    spark.stop()
  }
}
