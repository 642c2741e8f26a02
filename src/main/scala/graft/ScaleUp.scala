package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from a driver-generated directory by
  * unioning F key-shifted replicas: `runMain graft.ScaleUp <srcDir>
  * <outDir> <factor>`. Used for the sf1.0 correctness gate (the driver
  * ships sf0.001/0.01/0.1 only) — every 10× jump so far surfaced bugs the
  * small gates missed, so the gate re-runs the scale-sensitive query
  * families on 10× data with the same DuckDB differential.
  *
  * Replication scheme: replica r shifts every 64-bit KEY column by
  * r * (max(key) + 1), the same shift on both sides of each foreign-key
  * edge, so the result is F disjoint copies with intact join structure
  * (TPC-H-ish distributions preserved; dims region/nation stay single).
  * Timestamps/dates are untouched — the time RANGE stays constant and
  * density grows F×, which is how real corpora scale. Embeddings get a
  * deterministic per-replica per-element micro-perturbation (±5e-5,
  * xxhash64-derived) — exact copies would make every cosine top-k a
  * 10-way tie and the ANN gate would measure tie-breaking, not recall.
  * Document text is intentionally copied VERBATIM: exact replicas are
  * precisely what the dedup family must collapse at scale.
  *
  * Embedding perturbation sizing (embeddings are unit-norm 64-dim; true
  * nearest-neighbor sims ≤ ~0.5): replica r moves each element by
  * u·r·3e-3 with u ∈ [-0.5, 0.5] hash-derived, so cos(original,
  * replica_r) ≈ 1 − 2.67·(3e-3)²·r² — replicas of a query are its
  * strict top neighbors, ORDERED BY r, with consecutive gaps ≥ ~7e-5.
  * That is far above DuckDB's float32 cosine noise (~2e-6) and far
  * below the true inter-vector gaps, so ANN conformance at sf1.0 stays
  * deterministic instead of measuring 10-way tie-breaking.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, "factor must be >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      // match the driver layout exactly: <dir>/<table>.parquet is a FILE
      // (DuckDB's read_parquet takes a file path, not a Spark output
      // directory) — write a 1-part directory, then promote the part file
      val tmp = s"$out/_gen_$name"
      // r17: bounded row-group size. coalesce(1) used to write ONE row
      // group per table (sf1 lineitem: a single 108 MB group), and a scan
      // split can never be finer than a row group — so every sf1 scan
      // stage ran in ONE task regardless of core count, and the c8/c32
      // scaling series measured the fixture layout, not the engine
      // (h21 inverted to 0.60). 4 MB groups keep the single-FILE layout
      // the DuckDB oracle needs while giving Spark ~27 splits on the
      // largest table. Row content and order are unchanged.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val fs = tmpPath.getFileSystem(conf)
      val part = fs.listStatus(tmpPath)
        .map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written under $tmp — " +
          s"source table '$name' produced an empty write"))
      val dst = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      fs.delete(dst, false)
      require(fs.rename(part, dst), s"rename $part -> $dst failed")
      fs.delete(tmpPath, true)
      println(s"[scaleup] $name: ${spark.read.parquet(dst.toString).count()} rows")
    }
    /** max(key)+1 — the per-replica shift stride for one key domain.
      * Long-cast (non-integral key columns fail the cast with a pointed
      * AnalysisException, not a ClassCastException mid-collect); an empty
      * source table yields a null max → fail with a named message. */
    def stride(df: DataFrame, c: String): Long = {
      val m = df.agg(max(col(c).cast("long"))).head.getAs[java.lang.Long](0)
      require(m != null, s"key column '$c' has no rows — source table is empty")
      m.longValue() + 1L
    }

    /** F copies with the listed long keys shifted by r*stride(key). */
    def replicate(df: DataFrame, keys: Map[String, Long]): DataFrame =
      (0 until factor).map { r =>
        keys.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(r * s))
        }
      }.reduce(_ unionAll _)

    // dims stay single-copy: scale grows facts, not countries
    write(read("region"), "region")
    write(read("nation"), "nation")

    val customer = read("customer")
    val orders = read("orders")
    val lineitem = read("lineitem")
    val part = read("part")
    val supplier = read("supplier")
    val cK = stride(customer, "c_custkey")
    val oK = stride(orders, "o_orderkey")
    val pK = stride(part, "p_partkey")
    val sK = stride(supplier, "s_suppkey")
    write(replicate(customer, Map("c_custkey" -> cK)), "customer")
    write(replicate(part, Map("p_partkey" -> pK)), "part")
    write(replicate(supplier, Map("s_suppkey" -> sK)), "supplier")
    // the SAME strides on the referencing side keep every FK edge intact
    write(replicate(orders, Map("o_orderkey" -> oK, "o_custkey" -> cK)),
      "orders")
    write(replicate(lineitem, Map("l_orderkey" -> oK, "l_partkey" -> pK,
      "l_suppkey" -> sK)), "lineitem")

    val events = read("events")
    val eK = stride(events, "event_id")
    val uK = stride(events, "user_id")
    write(replicate(events, Map("event_id" -> eK, "user_id" -> uK)),
      "events")

    val documents = read("documents")
    write(replicate(documents, Map("doc_id" -> stride(documents, "doc_id"))),
      "documents")

    val emb = read("embeddings")
    val vK = stride(emb, "vec_id")
    val perturbed = (0 until factor).map { r =>
      if (r == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(r * vK))
        // deterministic micro-noise scaled by the replica index (see the
        // scaladoc sizing note), float-cast so the stored type stays
        // list<float>
        .withColumn("embedding",
          expr("transform(embedding, (x, i) -> CAST(x + " +
            s"(pmod(xxhash64(vec_id, i, $r), 1001) - 500) / 1000.0 " +
            s"* $r * 3e-3 AS FLOAT))"))
    }.reduce(_ unionAll _)
    write(perturbed, "embeddings")
    spark.stop()
  }
}
