package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton-curve) clustering, the
 * `OPTIMIZE ZORDER` pattern for making parquet row-group min/max skipping
 * effective on SEVERAL filter columns at once. A single-column sort gives
 * perfect pruning on one dimension and none on the others; interleaving
 * the rank bits of each dimension gives every dimension locality
 * proportional to 2^(-bits/dims) per output partition, so selective
 * predicates on ANY clustered column skip most of a 100 TB table's files.
 *
 * Scale shape: per-column quantile boundaries are the ONLY driver state
 * (2^bits doubles per column, from `approxQuantile`); ranking and bit
 * interleave are literal-array expressions inside whole-stage codegen (no
 * UDFs), and the placement is one `repartitionByRange` + local sort on
 * the z-value — exactly the cost of a global sort by one column.
 */
object Layout {

  /** Rank of `v` among sorted `bounds` (= #bounds ≤ v) as a BINARY-SEARCH
   * `when` tree: evaluation touches log2(n) comparisons per row, not n —
   * the difference between a layout pass that keeps up with the write and
   * one that dominates it. Nulls take every `otherwise` branch → rank 0. */
  private def searchRank(v: Column, bounds: Array[Double],
      lo: Int, hi: Int): Column =
    if (lo >= hi) lit(lo)
    else {
      val mid = (lo + hi) / 2
      when(v >= lit(bounds(mid)), searchRank(v, bounds, mid + 1, hi))
        .otherwise(searchRank(v, bounds, lo, mid))
    }

  /**
   * Cluster `df` on the Morton curve over `cols` (1–3 numeric columns,
   * `bits` rank bits each): range-partition + locally sort by the
   * interleaved z-value. Content-preserving — same rows, new placement.
   * Write the result with `save`/`write.parquet` to get multi-column
   * data skipping from ordinary parquet statistics.
   */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty && cols.size <= 3,
      s"zorderBy clusters 1-3 columns, got ${cols.size}")
    // 12 caps the quantile request (2^12-1 probabilities) and the rank
    // tree size; it also keeps bits*dims <= 36 inside a long
    require(bits >= 1 && bits <= 12, s"bits must be in 1..12, got $bits")
    require(!df.columns.contains("__zorder"),
      "df already has a __zorder column — rename it before clustering")
    val dims = cols.size
    // ONE stats pass for every clustered column (multi-column
    // approxQuantile); boundaries are the only driver state
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val allBounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    // rank bit i of dimension d lands at z bit i*dims + d; the spread is
    // precomputed per dimension and looked up from ONE literal array, so
    // each rank tree appears exactly once in the plan (not once per bit)
    def spread(d: Int): Array[Long] = Array.tabulate(n) { r =>
      var v = 0L
      var i = 0
      while (i < bits) { v |= ((r.toLong >> i) & 1L) << (i * dims + d); i += 1 }
      v
    }
    val z = cols.zip(allBounds).zipWithIndex.map { case ((c, bounds), d) =>
      val rank =
        if (bounds.isEmpty) lit(0)
        else searchRank(col(c).cast("double"), bounds, 0, bounds.length)
      element_at(lit(spread(d)), rank + lit(1))
    }.reduce(_ bitwiseOR _)
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    df.withColumn("__zorder", z)
      .repartitionByRange(parts, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }

  /**
   * Size-targeted compaction — the OPTIMIZE half of small-file
   * maintenance. Output partition count = ceil(estimated bytes /
   * `targetBytes`), clamped to [1, current partitions]: a fragmented
   * table (thousands of streaming-ingest or over-parallel files) coalesces
   * toward `targetBytes` outputs, while an already-compact table is left
   * alone rather than exploded. The size estimate is Catalyst's plan
   * statistic (parquet footer totals for file scans — no data pass);
   * `keyCols` optionally co-locates rows (hash repartition on the keys)
   * so compaction doubles as clustering for later joins.
   *
   * Content-preserving: same rows, new file placement. A shrink with no
   * keys uses `coalesce` — narrow, NO shuffle: each output just reads
   * several inputs, which is exactly what compacting small files should
   * cost; with keys (or when growing the file count) it pays the one
   * hash/round-robin shuffle that placement requires.
   */
  def compact(df: DataFrame, targetBytes: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val estBytes =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (estBytes + targetBytes - 1) / targetBytes
    val cur = df.rdd.getNumPartitions.max(1)
    val parts = want.min(BigInt(cur)).max(BigInt(1)).toInt
    if (keyCols.nonEmpty) df.repartition(parts, keyCols.map(col): _*)
    else if (parts < cur) df.coalesce(parts)
    else df
  }

  /**
   * Export a frame as `nShards` content-addressed training shards with an
   * integrity manifest — the handoff format between a curation pipeline
   * and a training job: shard assignment is a pure function of the key
   * (`pmod(xxhash64(keys), n)` — stable across cluster sizes and reruns),
   * and `_manifest.json` records per-shard row counts plus an
   * ORDER-INDEPENDENT content checksum (exact decimal sum of per-row
   * xxhash64 over all columns) so a training job can cheaply prove it
   * read exactly what curation wrote, shard by shard.
   *
   * Scale: one hash exchange on the shard id for the write; the manifest
   * aggregates over a RE-READ of the files just written (never over the
   * source plan — a nondeterministic source, or one that changes between
   * the write action and the manifest action, would otherwise produce a
   * manifest describing rows the files do not contain). [[verifyShards]]
   * recomputes the same aggregation later.
   */
  def exportShards(df: DataFrame, path: String, nShards: Int,
      keyCols: Seq[String] = Nil): Seq[(Int, Long, String)] = {
    require(nShards >= 1, "nShards must be >= 1")
    require(!df.columns.contains("__shard"),
      "input already has a __shard column — rename or drop it first")
    val keys = if (keyCols.nonEmpty) keyCols else df.columns.toSeq
    val shard = pmod(xxhash64(keys.map(col): _*), lit(nShards)).cast("int")
    df.withColumn("__shard", shard)
      .repartition(nShards, col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(path)
    val manifest = readManifestFromFiles(df.sparkSession, path, df.columns.toSeq)
    val json = manifest.map { case (s, n, h) =>
      s"""{"shard": $s, "rows": $n, "checksum": "$h"}"""
    }.mkString("[\n  ", ",\n  ", "\n]")
    // (checksum = exact decimal sum of per-row hashes — a LongType sum
    // would hit the ANSI overflow error after a handful of random 64-bit
    // hashes; decimal(38,0) holds ~10^19 rows without wrapping)
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    manifest
  }

  /** Recompute (shard, rows, checksum) from the written shards and
   * compare with `_manifest.json`; returns the mismatching shard ids
   * (empty = intact). */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val entry = """\{"shard": (\d+), "rows": (\d+), "checksum": "(-?\d+)"\}""".r
    val want = entry.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> (m.group(2).toLong, m.group(3))).toMap
    // an all-rows-filtered export writes no parquet files (manifest []) —
    // schema inference then fails, but that is an intact empty export
    val got = try {
      val back = spark.read.parquet(path)
      val dataCols = back.columns.filterNot(_ == "__shard").toSeq
      readBackManifest(back, dataCols).map(t => t._1 -> (t._2, t._3)).toMap
    } catch {
      case _: org.apache.spark.sql.AnalysisException => Map.empty[Int, (Long, String)]
    }
    (want.keySet ++ got.keySet).toSeq.sorted
      .filter(s => got.get(s) != want.get(s))
  }

  /** Manifest from the files at `path` (empty export → empty manifest). */
  private def readManifestFromFiles(
      spark: org.apache.spark.sql.SparkSession, path: String,
      dataCols: Seq[String]): Seq[(Int, Long, String)] =
    try readBackManifest(spark.read.parquet(path), dataCols)
    catch {
      case _: org.apache.spark.sql.AnalysisException => Seq.empty
    }

  /** (shard, rows, exact-decimal-sum-of-row-hashes) per shard, one agg
   * pass over a read-back frame. The row hash covers `dataCols` in the
   * given order; the shard id is cast explicitly so the result does not
   * depend on spark.sql.sources.partitionColumnTypeInference. */
  private def readBackManifest(back: DataFrame,
      dataCols: Seq[String]): Seq[(Int, Long, String)] = {
    back
      .groupBy(col("__shard").cast("int").as("__shard"))
      .agg(count(lit(1)).as("n"),
        sum(xxhash64(dataCols.map(col): _*).cast("decimal(38,0)")).as("h"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getDecimal(2).toBigInteger.toString))
      .sortBy(_._1).toSeq
  }
}
