package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/**
 * WARC (Web ARChive, ISO 28500) ingestion — the container format web-scale
 * text corpora actually arrive in (Common Crawl WARC/WET). The reference
 * engine has generic file loaders (`fugue/dataframe/...` load_df); a
 * training-data pipeline additionally needs the archive container itself.
 *
 * Grain and scale: one WARC file is one work unit (the format is designed
 * for ~1 GB member files, and the common `.warc.gz` form is NOT
 * block-splittable — per-file parallelism is the production norm). A
 * 100 TB crawl is ~100k files; `readWarc` lists them through Spark's
 * `binaryFile` source, so distribution, locality, and retries are the
 * scan's problem, and parsing is a narrow per-file map with no shuffle.
 * Header fields and payload bytes flow straight out of the scan — filters
 * on `warc_type`/`content_type` are codegen'd column predicates applied
 * before any payload-sized data moves.
 */
object Warc {

  /** Output schema of [[parseWarc]]: one row per WARC record. */
  val recordSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))

  private val HeaderEnd = "\r\n\r\n".getBytes(UTF_8)
  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Serialize one WARC 1.0 record (header block + payload + record
   * separator). Content-Length counts payload BYTES, per the spec. */
  def buildRecord(
      recordId: String, targetUri: String, payload: Array[Byte],
      warcType: String = "conversion",
      contentType: String = "text/plain"): Array[Byte] = {
    val header =
      s"WARC/1.0\r\n" +
        s"WARC-Type: $warcType\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        s"WARC-Target-URI: $targetUri\r\n" +
        s"Content-Type: $contentType\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
    val hb = header.getBytes(UTF_8)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /**
   * Parse a DataFrame of whole WARC files — `(fileCol: string, bytesCol:
   * binary)` — into one row per record ([[recordSchema]]). Gzipped files
   * (magic `1f 8b`, including the standard per-record-member `.warc.gz`
   * concatenation, which the JDK's `GZIPInputStream` reads through) are
   * decompressed transparently. Malformed input raises with file + byte
   * offset rather than silently dropping records: at 100 TB a quiet
   * parser bug is unfindable, a loud one is a stack trace with a path.
   */
  def parseWarc(df: DataFrame, fileCol: String, bytesCol: String): DataFrame = {
    val fi = df.schema.fieldIndex(fileCol)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        parseFile(r.getString(fi), gunzipIfNeeded(r.getAs[Array[Byte]](bi)))
      }
    }(Encoders.row(recordSchema))
  }

  /** List `dir` through Spark's binaryFile source and parse every matched
   * archive. The production entry point: `readWarc(spark, "s3a://crawl/",
   * "*.warc.gz")`-shaped calls scan straight into record rows. */
  def readWarc(
      spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame =
    parseWarc(
      spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
        .select(col("path").as("file"), col("content").as("bytes")),
      "file", "bytes")

  /**
   * Deterministic WARC fixture: pack `(idCol, textCol)` rows into
   * `nFiles` archive blobs — `(file_name, content)` — bucketed by
   * `id % nFiles`, records ordered by id within a file, target URI
   * `https://corpus.example.org/doc/<id>`. Built distributively (one
   * shuffle to co-locate each bucket); the conformance oracle recomputes
   * every field from the same id formula.
   */
  def syntheticWarcFiles(
      df: DataFrame, idCol: String, textCol: String,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val schema = StructType(Seq(
      StructField("file_name", StringType),
      StructField("content", BinaryType)))
    val grouped = df
      .select(col(idCol).cast("long").as("__id"),
        coalesce(col(textCol), lit("")).as("__text"))
      .withColumn("__bucket", pmod(col("__id"), lit(nFiles.toLong)))
      .repartition(math.min(nFiles, 64), col("__bucket"))
      .sortWithinPartitions("__bucket", "__id")
    grouped.mapPartitions { it =>
      val byBucket = scala.collection.mutable.LinkedHashMap
        .empty[Long, ArrayBuffer[Array[Byte]]]
      it.foreach { r =>
        val id = r.getLong(0)
        byBucket.getOrElseUpdate(r.getLong(2), ArrayBuffer.empty) +=
          buildRecord(s"<urn:uuid:$id>",
            s"https://corpus.example.org/doc/$id",
            r.getString(1).getBytes(UTF_8))
      }
      byBucket.iterator.map { case (bucket, recs) =>
        Row(f"part_$bucket%05d.warc", recs.toArray.flatten)
      }
    }(Encoders.row(schema))
  }

  /**
   * Like [[syntheticWarcFiles]] but in the wire form crawls actually
   * ship: `.warc.gz` with EACH record compressed as an independent gzip
   * member (ISO 28500 annex: the member boundary IS the record
   * boundary — that's what makes (offset, size) random access
   * possible). Encoded with the real `GZIPOutputStream`.
   */
  def syntheticWarcGzFiles(
      df: DataFrame, idCol: String, textCol: String,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val schema = StructType(Seq(
      StructField("file_name", StringType),
      StructField("content", BinaryType)))
    val grouped = df
      .select(col(idCol).cast("long").as("__id"),
        coalesce(col(textCol), lit("")).as("__text"))
      .withColumn("__bucket", pmod(col("__id"), lit(nFiles.toLong)))
      .repartition(math.min(nFiles, 64), col("__bucket"))
      .sortWithinPartitions("__bucket", "__id")
    grouped.mapPartitions { it =>
      val byBucket = scala.collection.mutable.LinkedHashMap
        .empty[Long, ArrayBuffer[Array[Byte]]]
      it.foreach { r =>
        val id = r.getLong(0)
        val rec = buildRecord(s"<urn:uuid:$id>",
          s"https://corpus.example.org/doc/$id",
          r.getString(1).getBytes(UTF_8))
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(rec); gz.close()
        byBucket.getOrElseUpdate(r.getLong(2), ArrayBuffer.empty) +=
          bo.toByteArray
      }
      byBucket.iterator.map { case (bucket, recs) =>
        Row(f"part_$bucket%05d.warc.gz", recs.toArray.flatten)
      }
    }(Encoders.row(schema))
  }

  /** Output schema of [[locateWarcGzRecords]]: the member locator
   * columns followed by the record fields recovered through RANDOM
   * ACCESS into that member alone. */
  val locatedSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("member_no", IntegerType),
    StructField("offset", LongType),
    StructField("comp_bytes", LongType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))

  /**
   * The Common Crawl access pattern, end-to-end: walk the gzip member
   * table of a `.warc.gz` ([[graft.functions.Gzip.gzipMembers]] is the
   * same walk), then re-extract each record through
   * [[graft.functions.Gzip.inflateMemberAt]] USING ONLY its
   * (offset, comp_bytes) locator — never a whole-file inflate — and
   * parse the single record the member holds. One record per member is
   * the spec shape; a member holding zero or several records raises
   * loudly (same posture as [[parseWarc]]: at 100 TB a quiet locator
   * bug is unfindable).
   *
   * At scale the slice step is a ranged GET against object storage;
   * here the file bytes are already in hand, so the slice is an
   * in-memory copy — the LOCATOR ARITHMETIC is what this exercises,
   * and the conformance query hash-matches it against the whole-file
   * parse. Narrow mapPartitions, zero exchanges.
   */
  def locateWarcGzRecords(df: DataFrame, fileCol: String,
      bytesCol: String): DataFrame = {
    val fi = df.schema.fieldIndex(fileCol)
    val bi = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val file = r.getString(fi)
        val bytes = r.getAs[Array[Byte]](bi)
        val members = graft.functions.Gzip.parseMembers(bytes).getOrElse(
          throw new IllegalArgumentException(
            s"not a clean multi-member gzip: $file"))
        members.iterator.zipWithIndex.map { case (m, i) =>
          val body = graft.functions.Gzip
            .inflateMemberAt(bytes, m.offset, m.compBytes)
            .getOrElse(throw new IllegalArgumentException(
              s"member $i of $file did not re-extract at " +
                s"(${m.offset}, ${m.compBytes})"))
          val recs = parseFile(file, body).toIndexedSeq
          require(recs.size == 1,
            s"member $i of $file holds ${recs.size} records (want 1)")
          val rec = recs.head
          Row(file, i, m.offset, m.compBytes,
            rec.getString(1), rec.getString(2), rec.getString(3),
            rec.getString(4), rec.getLong(5), rec.getAs[Array[Byte]](6))
        }
      }
    }(Encoders.row(locatedSchema))
  }

  // ---- parser internals ----

  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1) {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  private def parseFile(file: String, bytes: Array[Byte]): Iterator[Row] = {
    val out = ArrayBuffer.empty[Row]
    var pos = 0
    while (pos < bytes.length) {
      // tolerate extra record separators / trailing newlines between records
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        require(regionMatches(bytes, pos, "WARC/"),
          s"malformed WARC (no record header) at $file:$pos")
        val hdrEnd = indexOfSeq(bytes, HeaderEnd, pos)
        require(hdrEnd >= 0, s"unterminated WARC header at $file:$pos")
        val lines = new String(bytes, pos, hdrEnd - pos, UTF_8).split("\r\n")
        val headers = lines.iterator.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
        }.toMap
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"WARC record without Content-Length at $file:$pos")).toLong
        val payloadStart = hdrEnd + HeaderEnd.length
        require(payloadStart + len <= bytes.length,
          s"truncated WARC payload at $file:$pos (need $len bytes)")
        out += Row(file,
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("warc-type", null),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("content-type", null),
          len,
          java.util.Arrays.copyOfRange(bytes, payloadStart.toInt,
            (payloadStart + len).toInt))
        pos = (payloadStart + len).toInt
      }
    }
    out.iterator
  }

  private def regionMatches(bytes: Array[Byte], pos: Int, s: String): Boolean = {
    val t = s.getBytes(UTF_8)
    pos + t.length <= bytes.length &&
      t.indices.forall(i => bytes(pos + i) == t(i))
  }

  private def indexOfSeq(bytes: Array[Byte], target: Array[Byte], from: Int): Int = {
    var i = from
    val limit = bytes.length - target.length
    while (i <= limit) {
      var j = 0
      while (j < target.length && bytes(i + j) == target(j)) j += 1
      if (j == target.length) return i
      i += 1
    }
    -1
  }
}
