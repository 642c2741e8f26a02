package graft

import org.apache.spark.sql.functions._

/** Stress the exact-substring pipeline (SCALE.md): 200k synthetic docs ×
  * 100 tokens (20M tokens, ~10M span positions at spanTokens=50) with a
  * heavily duplicated vocabulary, through both the diagnostic
  * (duplicateSpanStats) and the rewrite (removeDuplicateSpans). */
object SpanStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // token t(d, i) = w_{(d*31 + i*7) % 5000}: within-corpus 50-grams
    // repeat heavily (5000 token values), docs are pairwise distinct
    val docs = spark.range(200000L).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(100)),
        i => concat(lit("w"),
          pmod(col("id") * 31L + i.cast("long") * 7L, lit(5000L)))))
        .as("text")).localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var stats: Array[org.apache.spark.sql.Row] = Array.empty
    val tStats = time { stats = graft.functions.Dedup
      .duplicateSpanStats(docs, "doc_id", "text", spanTokens = 50)
      .agg(sum("n_spans"), sum("n_dup_spans")).collect() }
    var removed = 0L
    val tRewrite = time { removed = graft.functions.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", spanTokens = 50)
      .agg(sum("n_removed_tokens")).collect().head.getLong(0) }
    println(f"SPANSTRESS stats=$tStats%.1f rewrite=$tRewrite%.1f " +
      s"spans=${stats.head.getLong(0)} dup=${stats.head.getLong(1)} " +
      s"removedTokens=$removed")
    spark.stop()
  }
}
