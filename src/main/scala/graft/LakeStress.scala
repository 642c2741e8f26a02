package graft

import org.apache.spark.sql.functions._

/** Stress the r16 lake-format value/metadata walks (SCALE.md):
  *
  *   - m50 parquet data-page VALUE decode: an N-row two-column table is
  *     written by Spark under v1/snappy and v2/zstd, then decoded from
  *     RAW BYTES through the page-skip path (OffsetIndex locators,
  *     per-page decompression, dictionary/delta/plain value decode,
  *     def-level null assembly) — reported as rows/s beside Spark's
  *     own vectorized reader over the same files, the honest yardstick;
  *   - m51 ORC stripe-footer census: the same table as many-file ORC,
  *     tails + stripe footers walked (files/s — each file costs O(tail
  *     + footerLength), no stream bytes).
  *
  * Both paths are narrow mapPartitions plans — cluster scale-out is
  * linear in executors.
  */
object LakeStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val out = java.nio.file.Files.createTempDirectory("graft_lakestress").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    try {
      val docs = spark.range(n).selectExpr("id AS doc_id",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('lang_', CAST(id % 23 AS STRING)) END AS lang_n")
        .repartition(32)
      val results = Seq("v1" -> "snappy", "v2" -> "zstd").map { case (ver, codec) =>
        val p = s"$out/${ver}_$codec"
        docs.write.option("parquet.writer.version", ver)
          .option("compression", codec).mode("overwrite").parquet(p)
        val bin = graft.functions.Multimodal.loadBinaryFiles(spark, p, "*.parquet")
          .selectExpr("monotonically_increasing_id() AS fid", "payload")
          .localCheckpoint(true)
        var rows = 0L
        val tDecode = time {
          rows = graft.functions.ParquetFooter
            .parquetDecodeLongStr(bin, "fid", "payload", "doc_id", "lang_n")
            .count()
        }
        var sparkRows = 0L
        val tSpark = time {
          sparkRows = spark.read.parquet(p)
            .select("doc_id", "lang_n").filter(col("doc_id") >= 0).count()
        }
        (ver, codec, rows, tDecode, sparkRows, tSpark)
      }
      // ORC: many files, stripe footers walked per file
      val orcP = s"$out/orc_zstd"
      docs.repartition(64).write.option("compression", "zstd")
        .mode("overwrite").orc(orcP)
      val orcBin = graft.functions.Multimodal.loadBinaryFiles(spark, orcP, "*.orc")
        .selectExpr("monotonically_increasing_id() AS doc_id", "payload")
        .localCheckpoint(true)
      val nFiles = orcBin.count()
      var nStripes = 0L
      val tStripes = time {
        nStripes = graft.functions.Orc
          .orcStripeFooters(orcBin, "doc_id", "payload").count()
      }
      // ORC data-stream VALUE decode (m53) vs Spark's ORC reader
      var orcRows = 0L
      val tOrcDecode = time {
        orcRows = graft.functions.Orc
          .orcDecodeLongStr(orcBin, "doc_id", "payload", "doc_id", "lang_n")
          .count()
      }
      var orcSparkRows = 0L
      val tOrcSpark = time {
        orcSparkRows = spark.read.orc(orcP)
          .select("doc_id", "lang_n").filter(col("doc_id") >= 0).count()
      }
      // m55: full-scalar ORC value decode — five typed columns
      // (long/double/float/boolean/string) zipped per row
      val scal = spark.range(n).selectExpr("id AS doc_id",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id % 100 AS DOUBLE) * 0.25 END AS score",
        "CAST(CAST(id % 16 AS DOUBLE) / 4.0 AS FLOAT) AS ratio",
        "id % 3 = 0 AS ok",
        "CASE WHEN id % 5 = 2 THEN NULL ELSE concat('lang_', CAST(id % 23 AS STRING)) END AS lang_n")
        .repartition(32)
      val scalP = s"$out/orc_scalars"
      scal.write.option("compression", "zlib").mode("overwrite").orc(scalP)
      val scalBin = graft.functions.Multimodal
        .loadBinaryFiles(spark, scalP, "*.orc")
        .selectExpr("monotonically_increasing_id() AS doc_id", "payload")
        .localCheckpoint(true)
      var scalRows = 0L
      val tScal = time {
        scalRows = graft.functions.Orc.orcDecodeScalars(scalBin,
          "doc_id", "payload", "doc_id", "score", "ratio", "ok", "lang_n")
          .count()
      }
      // m57: nested-list decode (Dremel reassembly) vs Spark's reader
      val listDocs = spark.range(n / 4).selectExpr("id AS doc_id",
        "CASE WHEN id % 7 = 0 THEN NULL " +
          "WHEN id % 7 = 1 THEN CAST(array() AS ARRAY<BIGINT>) " +
          "ELSE transform(sequence(0, CAST(id % 5 AS INT)), " +
          "i -> CASE WHEN (id + i) % 11 = 3 THEN NULL ELSE id * 10 + i END) " +
          "END AS nums",
        "CASE WHEN id % 9 = 2 THEN NULL " +
          "ELSE transform(sequence(0, CAST(id % 4 AS INT)), " +
          "i -> concat('t', CAST((id + i) % 13 AS STRING))) END AS tags")
        .repartition(32)
      val listP = s"$out/pq_lists"
      listDocs.write.option("compression", "snappy")
        .mode("overwrite").parquet(listP)
      val listBin = graft.functions.Multimodal
        .loadBinaryFiles(spark, listP, "*.parquet")
        .selectExpr("monotonically_increasing_id() AS fid", "payload")
        .localCheckpoint(true)
      var listRows = 0L
      val tLists = time {
        listRows = graft.functions.ParquetFooter.parquetDecodeLists(
          listBin, "fid", "payload", "doc_id",
          "nums.list.element", "tags.list.element").count()
      }
      var listSparkRows = 0L
      val tListSpark = time {
        listSparkRows = spark.read.parquet(listP)
          .select("doc_id", "nums", "tags").filter(col("doc_id") >= 0).count()
      }
      // m56: Delta-log snapshot reconstruction over a many-table lake
      // (the shuffle carries action projections only)
      val nTables = math.max(1000L, n / 200)
      var liveFiles = 0L
      val tDelta = time {
        liveFiles = graft.functions.DeltaLog.deltaSnapshot(
          graft.functions.DeltaLog.syntheticDeltaLogs(
            spark.range(nTables).selectExpr("id AS doc_id"), "doc_id"),
          "table_id", "file_name", "content").count()
      }
      // m58: Iceberg manifest-chain census over the same table count
      var icebergFiles = 0L
      val tIceberg = time {
        icebergFiles = graft.functions.Iceberg.icebergSnapshot(
          graft.functions.Iceberg.syntheticIcebergTables(
            spark.range(nTables).selectExpr("id AS doc_id"), "doc_id"),
          "table_id", "file_name", "payload").count()
      }
      // m63: Hudi timeline census — the trio's third leg
      var hudiCommits = 0L
      val tHudi = time {
        hudiCommits = graft.functions.Hudi.hudiTimeline(
          graft.functions.Hudi.syntheticHudiTables(
            spark.range(nTables).selectExpr("id AS doc_id"), "doc_id"),
          "table_id", "file_name", "content").count()
      }
      val lines = results.map { case (ver, codec, rows, tD, sRows, tS) =>
        f"pq_${ver}_$codec: decoded=$rows rows in $tD%.1f s " +
          f"(${rows / tD}%.0f rows/s) vs sparkRead=$sRows in $tS%.1f s " +
          f"(${sRows / tS}%.0f rows/s) ratio=${tD / tS}%.2fx"
      }
      println(s"LAKESTRESS n=$n ${lines.mkString(" | ")} | " +
        f"orcStripeFooters: files=$nFiles stripes=$nStripes " +
        f"wall=$tStripes%.1f s (${nFiles / tStripes}%.0f files/s) | " +
        f"orc_zstd_values: decoded=$orcRows rows in $tOrcDecode%.1f s " +
        f"(${orcRows / tOrcDecode}%.0f rows/s) vs sparkRead=$orcSparkRows " +
        f"in $tOrcSpark%.1f s (${orcSparkRows / tOrcSpark}%.0f rows/s) " +
        f"ratio=${tOrcDecode / tOrcSpark}%.2fx | " +
        f"orc_scalars: decoded=$scalRows rows in $tScal%.1f s " +
        f"(${scalRows / tScal}%.0f rows/s) | " +
        f"pq_lists: decoded=$listRows rows in $tLists%.1f s " +
        f"(${listRows / tLists}%.0f rows/s) vs sparkRead=$listSparkRows " +
        f"in $tListSpark%.1f s (${listSparkRows / tListSpark}%.0f rows/s) " +
        f"ratio=${tLists / tListSpark}%.2fx | " +
        f"delta_snapshot: tables=$nTables liveFiles=$liveFiles " +
        f"wall=$tDelta%.1f s (${nTables / tDelta}%.0f tables/s) | " +
        f"iceberg_snapshot: tables=$nTables liveFiles=$icebergFiles " +
        f"wall=$tIceberg%.1f s (${nTables / tIceberg}%.0f tables/s) | " +
        f"hudi_timeline: tables=$nTables commits=$hudiCommits " +
        f"wall=$tHudi%.1f s (${nTables / tHudi}%.0f tables/s)")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
        .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
    }
    spark.stop()
  }
}
