package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast => sparkBroadcast, _}

/**
 * Similarity search over embedding columns (`array<float>`):
 * brute-force cosine top-k as the exact baseline, and a random-hyperplane
 * LSH-bucketed variant as the 100 TB scale path.
 *
 * Scale design: the query set is broadcast (queries ≪ corpus); the corpus
 * is scanned once. Brute force emits |corpus|·|queries| scored rows and
 * window-sorts per query — exact but quadratic-shuffle; the LSH variant
 * shuffles only bucket-colliding pairs. Both return deterministic results
 * (ties broken by neighbor id).
 */
object Similarity {

  /** Cosine-normalized copy of a float/double-array column (double
   * precision) — native Catalyst expression, no per-element boxing. */
  def l2normalize(vec: Column): Column =
    graft.functions.expressions.VectorExpressions.l2normalize(vec)

  /** Dot product of two array<double> columns — whole-stage-codegen'd
   * primitive loop ([[graft.functions.expressions.DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dot(a, b)

  /**
   * Exact brute-force cosine top-k: for every row of `queries`, the k
   * nearest rows of `corpus` by cosine similarity.
   * Output: (query_id, neighbor_id, rank, cosine), rank 1..k,
   * ties broken by neighbor id ascending.
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = Dedup.spreadForCompute(corpus)
      .select(col(idCol).as("neighbor_id"), l2normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), l2normalize(col(vecCol)).as("qv"))
    val scored = c.crossJoin(sparkBroadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Embedding dimensionality probe (one small job). Empty/null-leading
   * corpora get a clear error instead of `next on empty iterator`. */
  private def inferDim(df: DataFrame, vecCol: String): Int = {
    val row = df.select(size(col(vecCol)).as("d")).filter(col("d") > 0).head(1)
    require(row.nonEmpty,
      s"cannot infer embedding dimension: no non-empty '$vecCol' values")
    row.head.getInt(0)
  }

  /** Random hyperplane sign-bucket key(s) for a normalized vector: `nBits`
   * sign bits per table, `nTables` independent tables (seeded). */
  private def hyperplaneKeys(
      dim: Int, nTables: Int, nBits: Int, seed: Long): Column => Column = {
    val rnd = new java.util.Random(seed)
    // fixed gaussian planes shipped to executors via closure (tiny)
    val planes = Array.fill(nTables, nBits, dim)(rnd.nextGaussian())
    val f = udf { v: Seq[Double] =>
      if (v == null) null
      else planes.indices.map { t =>
        var key = 0L
        var b = 0
        while (b < nBits) {
          var s = 0.0
          val p = planes(t)(b)
          var i = 0
          val n = math.min(dim, v.length)
          while (i < n) { s += p(i) * v(i); i += 1 }
          if (s >= 0) key |= (1L << b)
          b += 1
        }
        (t.toLong << 32) | key
      }
    }
    (c: Column) => f(c)
  }

  /**
   * LSH-bucketed approximate top-k: queries and corpus are bucketed by
   * random-hyperplane sign keys in `nTables` tables; scoring happens only
   * within colliding buckets. Recall grows with nTables, cost shrinks with
   * nBits. Deterministic for a fixed seed.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nTables: Int = 8, nBits: Int = 12, seed: Long = 42L): DataFrame = {
    val dim = inferDim(corpus, vecCol)
    val keys = hyperplaneKeys(dim, nTables, nBits, seed)
    val c = Dedup.spreadForCompute(corpus)
      .select(col(idCol).as("neighbor_id"), l2normalize(col(vecCol)).as("cv"))
      .withColumn("bk", explode(keys(col("cv"))))
    val q = queries.select(col(idCol).as("query_id"), l2normalize(col(vecCol)).as("qv"))
      .withColumn("bk", explode(keys(col("qv"))))
    val scored = c.join(sparkBroadcast(q), "bk")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("cv"), col("qv"))
      .distinct() // a pair may collide in several tables
      .withColumn("cosine", dot(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /**
   * LSH cosine near-pair search over one corpus (self-join flavor of
   * [[lshTopK]]): pairs whose vectors collide in any table and whose exact
   * cosine ≥ threshold. The scale path for [[Dedup.embeddingNearDupPairs]].
   */
  def lshCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nTables: Int = 8, nBits: Int = 10,
      seed: Long = 42L, maxBucketSize: Int = 2000): DataFrame = {
    val dim = inferDim(df, vecCol)
    val keys = hyperplaneKeys(dim, nTables, nBits, seed)
    val v = Dedup.spreadForCompute(df)
      .select(col(idCol).as("id"), l2normalize(col(vecCol)).as("v"))
      .localCheckpoint(true) // not .persist(): the columnar cache writes array cols element-wise (~20x slower); localCheckpoint serializes rows. Tradeoff: no lineage recompute on executor loss.
    val banded = v.withColumn("bk", explode(keys(col("v"))))
    val pairIds = Dedup.bucketPairs(banded, Seq("bk"), maxBucketSize)
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"))
    pairIds.join(a, "id_a").join(b, "id_b")
      .withColumn("cosine", dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

}
