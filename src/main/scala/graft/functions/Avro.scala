package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Avro Object Container File (OCF) block census: schema + codec from the
 * file-metadata map and per-block row counts / byte sizes / offsets from
 * the block headers — NO row decode, no codec involved (block payloads
 * are strided whether null/deflate/snappy-coded). Avro OCF is a standard
 * data-lake interchange format; the lake census needs "how many rows,
 * how are they chunked, what schema/codec" — all of which the container
 * format exposes without touching the data, exactly like the
 * [[Zstd]]/[[Zip]] members of the family.
 *
 * Format facts the walk honors (Avro 1.11 spec, container file):
 *   - magic `Obj\x01`;
 *   - file metadata: an Avro `map<bytes>` — repeated blocks of
 *     (zigzag-varint long count, then |count| key/value pairs of
 *     length-prefixed UTF-8 string key and length-prefixed bytes value),
 *     terminated by a count of 0; a NEGATIVE count is followed by a
 *     long byte size of the block (legal per the map encoding — honored
 *     here by reading and striding the size field);
 *   - a 16-byte sync marker;
 *   - data blocks: zigzag-varint long row count, zigzag-varint long
 *     byte size, the (possibly compressed) payload, then the 16-byte
 *     sync marker which must EQUAL the file's — a mismatch is
 *     lost-bytes/splice evidence;
 *   - the last block's sync must close the payload exactly.
 *
 * Strict posture like the family: bad magic, varint overrun (> 10
 * bytes), negative row count/size, anything overrunning the payload,
 * sync mismatch, trailing bytes → None.
 *
 * Narrow mapPartitions — O(headers) per block, zero exchanges.
 */
object Avro {

  /** File-level metadata plus one entry per data block. `sync` is the
   * file's 16-byte marker — part of the census row a ranged reader
   * needs to re-validate a block it fetched by (offset, size). */
  final case class Ocf(schema: Option[String], codec: String,
      blocks: IndexedSeq[(Long, Long, Long)], // (offset, nRows, nBytes)
      sync: IndexedSeq[Byte] = IndexedSeq.empty)

  /** Zigzag-varint long at `pos`: (value, next position), or null on
   * overrun/malformation (> 10 bytes or running past `end`). */
  private def varlong(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (p < end && shift <= 63) {
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) {
        // zigzag decode
        return ((v >>> 1) ^ -(v & 1), p)
      }
      shift += 7
    }
    null
  }

  /**
   * Parse the container structure. None unless the payload is a
   * structurally clean OCF as documented above. The codec defaults to
   * `"null"` when the `avro.codec` key is absent (per spec); the schema
   * is None when `avro.schema` is absent (spec-mandatory, but this is a
   * census — absence is reported, the structure still walks).
   */
  def parseOcf(payload: Array[Byte]): Option[Ocf] = {
    val b = payload
    if (b == null || b.length < 4 + 1 + 16) return None
    if (b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1) return None
    var pos = 4
    var schema: Option[String] = None
    var codec = "null"
    // metadata map blocks
    var done = false
    while (!done) {
      val c = varlong(b, pos, b.length)
      if (c == null) return None
      pos = c._2
      var n = c._1
      if (n == 0L) done = true
      else {
        if (n < 0) { // block-size prelude form: read and ignore the size
          n = -n
          val sz = varlong(b, pos, b.length)
          if (sz == null || sz._1 < 0) return None
          pos = sz._2
        }
        var k = 0L
        while (k < n) {
          // compare without addition: `kl._2 + kl._1` wraps negative for a
          // crafted length near Long.MaxValue and would pass the check
          val kl = varlong(b, pos, b.length)
          if (kl == null || kl._1 < 0 || kl._1 > b.length - kl._2) return None
          val key = new String(b, kl._2, kl._1.toInt, "UTF-8")
          pos = kl._2 + kl._1.toInt
          val vl = varlong(b, pos, b.length)
          if (vl == null || vl._1 < 0 || vl._1 > b.length - vl._2) return None
          val value = new String(b, vl._2, vl._1.toInt, "UTF-8")
          pos = vl._2 + vl._1.toInt
          if (key == "avro.schema") schema = Some(value)
          else if (key == "avro.codec") codec = value
          k += 1
        }
      }
    }
    if (pos + 16 > b.length) return None
    val syncOff = pos
    pos += 16
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    while (pos < b.length) {
      val off = pos.toLong
      val rc = varlong(b, pos, b.length)
      if (rc == null || rc._1 <= 0) return None
      val bs = varlong(b, rc._2, b.length)
      // overflow-safe bound: `bs._2 + bs._1 + 16` wraps negative for a
      // crafted byte size near Long.MaxValue; subtract instead
      if (bs == null || bs._1 < 0 || bs._1 > b.length - bs._2 - 16) return None
      val dataEnd = bs._2 + bs._1.toInt
      var j = 0
      while (j < 16) {
        if (b(dataEnd + j) != b(syncOff + j)) return None
        j += 1
      }
      blocks += ((off, rc._1, bs._1))
      pos = dataEnd + 16
    }
    // the loop exits exactly at end-of-payload by construction (the last
    // sync check bounds it); zero data blocks is a clean empty file
    Some(Ocf(schema, codec, blocks.toIndexedSeq,
      java.util.Arrays.copyOfRange(b, syncOff, syncOff + 16).toIndexedSeq))
  }

  /**
   * Random-access extraction of ONE data block located by its census
   * row — the (offset, nRows, nBytes) triple [[avroBlocks]] reports,
   * plus the file codec and sync marker. Re-reads the block header at
   * `offset` (BOTH varints must match the locator), slices the block
   * payload, decodes it per codec (`null` raw; `deflate` raw-inflate,
   * the Avro DeflateCodec form; `snappy` with the spec's trailing
   * 4-byte big-endian CRC32 of the UNCOMPRESSED data verified), and
   * requires the 16 bytes after the payload to equal `sync`. None on
   * any disagreement — a slip means the locator row was stale. This is
   * the ranged-GET access pattern for Avro lakes: fetch one block
   * range from object storage, decode one block, never the file.
   */
  def extractBlockAt(payload: Array[Byte], offset: Long, nRows: Long,
      nBytes: Long, codec: String, sync: Array[Byte]): Option[Array[Byte]] = {
    val b = payload
    if (b == null || sync == null || sync.length != 16) return None
    if (offset < 0 || offset >= b.length || nRows <= 0 || nBytes < 0) return None
    val rc = varlong(b, offset.toInt, b.length)
    if (rc == null || rc._1 != nRows) return None
    val bs = varlong(b, rc._2, b.length)
    if (bs == null || bs._1 != nBytes) return None
    // subtractive bound: data + trailing sync must fit
    if (nBytes > b.length - bs._2 - 16) return None
    val dataStart = bs._2
    val dataEnd = dataStart + nBytes.toInt
    var j = 0
    while (j < 16) {
      if (b(dataEnd + j) != sync(j)) return None
      j += 1
    }
    codec match {
      case "null" =>
        Some(java.util.Arrays.copyOfRange(b, dataStart, dataEnd))
      case "deflate" => // raw deflate (Avro DeflateCodec uses nowrap)
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, dataStart, nBytes.toInt)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val k =
              try inf.inflate(buf)
              catch { case _: java.util.zip.DataFormatException => return None }
            if (k > 0) out.write(buf, 0, k)
            else if (!inf.finished()) return None // truncated / needs dict
          }
          if (inf.getBytesRead != nBytes) return None // trailing garbage
          Some(out.toByteArray)
        } finally inf.end()
      case "snappy" => // snappy block + 4-byte BE CRC32 of the raw data
        if (nBytes < 4) return None
        val compLen = nBytes.toInt - 4
        try {
          val raw = org.xerial.snappy.Snappy.uncompress(
            java.util.Arrays.copyOfRange(b, dataStart, dataStart + compLen))
          val crc = new java.util.zip.CRC32
          crc.update(raw, 0, raw.length)
          val want = ((b(dataEnd - 4) & 0xffL) << 24) |
            ((b(dataEnd - 3) & 0xffL) << 16) |
            ((b(dataEnd - 2) & 0xffL) << 8) | (b(dataEnd - 1) & 0xffL)
          if ((crc.getValue & 0xffffffffL) != want) None else Some(raw)
        } catch { case _: java.io.IOException => None }
      case "zstandard" => // zstd frame(s), no trailing CRC (the frame's
        // own integrity machinery applies) — the modern lake codec,
        // decoded through the same public zstd-jni stream decoder as
        // ORC zstd tails, with the same zero-progress guard
        streamDecode(new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(b, dataStart, nBytes.toInt)))
      case "xz" => // one XZ stream (its own CRC64/CRC32 checks apply)
        streamDecode(
          try new org.tukaani.xz.XZInputStream(
            new java.io.ByteArrayInputStream(b, dataStart, nBytes.toInt),
            64 << 10) // memory cap: a forged header cannot balloon
          catch { case _: java.io.IOException => return None })
      case "bzip2" => // one bzip2 stream (block CRCs apply)
        streamDecode(
          try new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(
              new java.io.ByteArrayInputStream(b, dataStart, nBytes.toInt))
          catch { case _: java.io.IOException => return None })
      case _ => None // unknown codec: recognized, refused
    }
  }

  /** Drain a decoding stream fully; None on any IO/format error or a
   * zero-progress stall (the repo-wide decode posture). */
  private def streamDecode(in: java.io.InputStream): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = 1
      while (n >= 0) {
        n = try in.read(buf, 0, buf.length)
        catch { case _: java.io.IOException => return None }
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0) return None // zero-progress guard
      }
      Some(out.toByteArray)
    } finally in.close()

  /** Decode a block of `"string"`-schema records: each record is a
   * zigzag-varint byte length + UTF-8 bytes. The walk must yield
   * EXACTLY `expected` records and consume the block exactly; invalid
   * UTF-8 in any record refuses the block (strict REPORT-mode decode,
   * the repo-wide posture — an Avro `string` is UTF-8 by spec, so a
   * malformed sequence is corruption evidence, not a U+FFFD); None
   * otherwise. */
  def decodeStringRecords(data: Array[Byte],
      expected: Long): Option[IndexedSeq[String]] = {
    if (data == null || expected < 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < data.length) {
      val l = varlong(data, pos, data.length)
      if (l == null || l._1 < 0 || l._1 > data.length - l._2) return None
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try out += dec.decode(
        java.nio.ByteBuffer.wrap(data, l._2, l._1.toInt)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
      pos = l._2 + l._1.toInt
    }
    if (out.size.toLong != expected) return None
    Some(out.toIndexedSeq)
  }

  /** All `"string"` records of every block, extracted block-by-block
   * through [[extractBlockAt]] — strict: if ANY block fails to
   * re-extract or decode, the whole payload refuses. */
  def extractAllStringRecords(payload: Array[Byte]):
      Option[IndexedSeq[(Int, Int, String, String)]] = {
    parseOcf(payload) match {
      case Some(o) =>
        val syncArr = o.sync.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String)]
        var bi = 0
        while (bi < o.blocks.size) {
          val (off, nr, nb) = o.blocks(bi)
          extractBlockAt(payload, off, nr, nb, o.codec, syncArr)
            .flatMap(decodeStringRecords(_, nr)) match {
            case Some(strs) =>
              var ri = 0
              while (ri < strs.size) {
                out += ((bi, ri, o.codec, strs(ri)))
                ri += 1
              }
            case None => return None
          }
          bi += 1
        }
        Some(out.toIndexedSeq)
      case None => None
    }
  }

  /** Output schema of [[extractStringRecords]]. */
  val stringRecordSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("block_no", IntegerType),
    StructField("rec_no", IntegerType),
    StructField("codec", StringType),
    StructField("content", StringType)))

  /** One row per decoded `"string"` record (block then record order),
   * every block re-extracted from its locator alone and CRC/sync
   * verified; payloads that are not clean string-schema OCFs
   * contribute nothing. Narrow mapPartitions. */
  def extractStringRecords(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        extractAllStringRecords(r.getAs[Array[Byte]](pIdx)) match {
          case Some(rs) => rs.iterator.map { case (bi, ri, codec, s) =>
            Row(id, bi, ri, codec, s)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(stringRecordSchema))
  }

  /** Output schema of [[avroBlocks]]. */
  val blockSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("block_no", IntegerType),
    StructField("schema_json", StringType),
    StructField("codec", StringType),
    StructField("offset", LongType),
    StructField("n_rows", LongType),
    StructField("block_bytes", LongType)))

  /** One row per data block (file order) with the file-level
   * schema/codec repeated; non-OCF / structurally unclean payloads
   * contribute nothing. Narrow mapPartitions. */
  def avroBlocks(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseOcf(r.getAs[Array[Byte]](pIdx)) match {
          case Some(o) => o.blocks.iterator.zipWithIndex.map {
            case ((off, nr, nb), i) =>
              Row(id, i, o.schema.orNull, o.codec, off, nr, nb)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(blockSchema))
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Deterministic OCF fixture shared by the writer, the m35 oracle and
   * the spec. Every varint-carried length/count stays < 64 so each
   * zigzag varint is EXACTLY one byte and all offsets are closed-form
   * in id:
   *
   *   - schema `{"type":"record","name":"r<id%10>","fields":[]}`
   *     (42 bytes), codec `null`/`deflate`/`snappy` by `id%3`, plus a
   *     third key `user.k` → `v<id%10>` when `id%4 == 1`, all in ONE
   *     positive-count map block; terminator 0;
   *   - sync marker byte j is `(id*17 + j) & 0xff`;
   *   - `1 + id%4` data blocks; block k carries
   *     `n_rows = 1 + (id + k*3) % 30` and
   *     `block_bytes = 10 + (id*5 + k*7) % 50` opaque payload bytes
   *     (byte j is `(id + k*19 + j) & 0xff`), then the sync;
   *   - header length = 4 + 1 + (1+11+1+42) + (1+10+1+C) [+ (1+6+1+L)]
   *     + 1 + 16 with C = len(codec), L = len(`v<id%10>`) = 2 — the m35
   *     oracle replays this arithmetic with LENGTH().
   */
  def syntheticAvro(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def v1(v: Long): Unit = { // single-byte zigzag varint (v < 64)
      val z = zigzag(v)
      require(z < 0x80, s"fixture varint out of single-byte range: $v")
      bo.write(z.toInt)
    }
    def strField(s: String): Unit = {
      val x = s.getBytes("UTF-8"); v1(x.length.toLong)
      bo.write(x, 0, x.length)
    }
    bo.write('O'); bo.write('b'); bo.write('j'); bo.write(1)
    val codec = Seq("null", "deflate", "snappy")((id % 3).toInt)
    val extra = id % 4 == 1
    v1(if (extra) 3L else 2L)
    strField("avro.schema")
    strField(s"""{"type":"record","name":"r${id % 10}","fields":[]}""")
    strField("avro.codec")
    strField(codec)
    if (extra) { strField("user.k"); strField(s"v${id % 10}") }
    v1(0L) // map terminator
    val sync = Array.tabulate(16)(j => ((id * 17 + j) & 0xff).toByte)
    bo.write(sync, 0, 16)
    val n = (1 + id % 4).toInt
    (0 until n).foreach { k =>
      val rows = 1 + (id + k * 3) % 30
      val bytes = (10 + (id * 5 + k * 7) % 50).toInt
      v1(rows); v1(bytes.toLong)
      (0 until bytes).foreach(j => bo.write(((id + k * 19 + j) & 0xff).toInt))
      bo.write(sync, 0, 16)
    }
    bo.toByteArray
  }

  /** Executor-side OCF fixtures — the m35 oracle replays the block and
   * offset formulas. */
  def syntheticAvros(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticAvro)

  /** Deterministic REAL-encoder OCF fixture (the m42 analog for Avro):
   * written by the Avro library's own `DataFileWriter` over schema
   * `"string"` with a deterministic sync marker (byte j =
   * `(id*31 + j*7) & 0xff`), codec rotating null/deflate/snappy/
   * zstandard/xz/bzip2 by `id%6` (r16: the COMPLETE public Avro codec
   * set — every codec the spec names now both writes, via the real
   * CodecFactory, and re-extracts). `1 + id%3` data blocks forced by
   * `writer.sync()`; block k holds `1 + (id+k)%4` records
   * `avro_<id>_<k>_<j>` + `"x" * ((id+j)%20)`. `id%8 == 5` payloads
   * have a byte of the FINAL sync flipped — [[parseOcf]] refuses
   * (splice evidence), zero rows. Compressed block sizes are
   * encoder-owned; the extraction re-reads them from the block
   * headers, so the oracle replays only the DECODED record contents
   * (the m42 posture). */
  def syntheticRealAvro(id: Long): Array[Byte] = {
    val schema = org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)
    val w = new org.apache.avro.file.DataFileWriter[CharSequence](
      new org.apache.avro.generic.GenericDatumWriter[CharSequence](schema))
    (id % 6) match {
      case 0 => w.setCodec(org.apache.avro.file.CodecFactory.nullCodec())
      case 1 => w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      case 2 => w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      case 3 => w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
      case 4 => w.setCodec(org.apache.avro.file.CodecFactory.xzCodec(3))
      case _ => w.setCodec(org.apache.avro.file.CodecFactory.bzip2Codec())
    }
    val bo = new java.io.ByteArrayOutputStream()
    val sync = Array.tabulate(16)(j => ((id * 31 + j * 7) & 0xff).toByte)
    w.create(schema, bo, sync)
    val nBlocks = (1 + id % 3).toInt
    (0 until nBlocks).foreach { k =>
      (0 until (1 + (id + k) % 4).toInt).foreach { j =>
        w.append(s"avro_${id}_${k}_$j" + "x" * ((id + j) % 20).toInt)
      }
      w.sync() // force the block boundary
    }
    w.close()
    val bytes = bo.toByteArray
    if (id % 8 == 5) // flip a final-sync byte: splice evidence
      bytes(bytes.length - 3) = (bytes(bytes.length - 3) ^ 0x11).toByte
    bytes
  }

  /** Executor-side real-encoder OCF fixtures — the m49 oracle replays
   * the decoded record contents. */
  def syntheticRealAvros(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticRealAvro)
}
