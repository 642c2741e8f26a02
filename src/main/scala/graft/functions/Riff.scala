package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * RIFF chunk walk + LIST/INFO tag extraction — the WAV member of the
 * audio-tag family ([[Mp3.parseId3TextFrames]] for MP3, [[Ogg.parseComments]]
 * for .ogg/.opus, [[Flac.parseComments]] for FLAC, [[Mp4.ilstTags]] for
 * MP4): `INAM`/`IART`/`ICRD`/… tags carried in a `LIST` chunk of form
 * type `INFO`, each tag a null-terminated string padded to even length
 * (the RIFF word-alignment rule — every odd-sized chunk is followed by
 * one pad byte that is NOT counted in the chunk size; a walker that
 * forgets the pad desyncs on the next chunk id).
 *
 * Reference semantics: binary media columns are opaque payloads to
 * census and project typed metadata from (`/root/reference` multimodal
 * suite). Narrow mapPartitions — header-only reads, zero exchanges.
 */
object Riff {

  /** One decoded INFO tag. */
  final case class InfoTag(key: String, value: String)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourCC(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "ISO-8859-1")

  /** Walk the top-level chunks of a RIFF/WAVE payload and decode every
   * `LIST`-`INFO` tag, in file order. None unless the payload is a
   * structurally clean RIFF: `RIFF <size> WAVE` whose declared size ends
   * within the payload, every chunk (with its odd-size pad byte) fitting
   * inside the RIFF body. Tagless clean files return Some(empty) —
   * absence is not corruption. Tag values are trimmed at the first NUL
   * (the stored size includes the terminator and any writer junk after
   * it); keys must be 4 printable-ASCII bytes.
   *
   * The walk is top-level-only by design: a `LIST INFO` nested inside
   * another `LIST` is not standard WAV and is deliberately not searched
   * for (strict-structure posture, matching the other media walkers). */
  def parseInfoTags(payload: Array[Byte]): Option[IndexedSeq[InfoTag]] = {
    if (payload == null || payload.length < 12) return None
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "WAVE") return None
    val riffSize = u32le(payload, 4)
    // RIFF size counts everything after the size field (incl. "WAVE")
    if (8L + riffSize > payload.length || riffSize < 4) return None
    val end = 8 + riffSize.toInt
    val tags = scala.collection.mutable.ArrayBuffer.empty[InfoTag]
    var pos = 12
    var sawFmt = false
    while (pos < end) {
      if (pos + 8 > end) return None
      val cid = fourCC(payload, pos)
      val csz = u32le(payload, pos + 4)
      val body = pos + 8
      if (body + csz > end) return None
      if (cid == "fmt ") sawFmt = true
      if (cid == "LIST" && csz >= 4 && fourCC(payload, body) == "INFO") {
        // sub-chunks of the INFO list: <4cc key> <u32 size> <value bytes>
        // with the same odd-size pad rule as top-level chunks
        var sp = body + 4
        val send = body + csz.toInt
        while (sp < send) {
          if (sp + 8 > send) return None
          val key = fourCC(payload, sp)
          val vsz = u32le(payload, sp + 4)
          if (sp + 8 + vsz > send) return None
          if (!key.forall(c => c >= 0x20 && c <= 0x7e)) return None
          val raw = new String(payload, sp + 8, vsz.toInt, "UTF-8")
          val nul = raw.indexOf('\u0000')
          tags += InfoTag(key, if (nul >= 0) raw.substring(0, nul) else raw)
          sp += 8 + vsz.toInt + (vsz & 1L).toInt
        }
      }
      pos = body + csz.toInt + (csz & 1L).toInt
    }
    if (!sawFmt) None else Some(tags.toIndexedSeq)
  }

  /** Output schema of [[riffInfoTags]]. */
  val tagSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("tag_no", IntegerType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** One row per INFO tag (file order); payloads that are not clean
   * RIFF/WAVE — or clean but tagless — contribute nothing. Narrow
   * mapPartitions, the same scale posture as every media walk. */
  def riffInfoTags(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseInfoTags(r.getAs[Array[Byte]](pIdx)) match {
          case Some(ts) => ts.iterator.zipWithIndex.map {
            case (t, i) => Row(id, i, t.key, t.value)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(tagSchema))
  }

  /** Deterministic tagged-WAV fixture shared by the writer, the m28
   * oracle and the spec: `RIFF/WAVE` with a 16-byte PCM `fmt ` chunk
   * (rate 8000/16000 by id parity, channels `1 + id%2`), a `data` chunk
   * of `101 + id%50` bytes — ODD by construction when `id%2 == 0`
   * (`101 + even` is odd), so half the sweep exercises the pad-byte
   * rule between `data` and the tag list — and, for `id%5 != 3`, a
   * `LIST INFO` chunk carrying `INAM=title_<id*7 % 1000>`,
   * `IART=artist_<id % 50>`, `ICRD=<1970 + id%55>`,
   * `ICMT=cömment_<id % 10>` (multi-byte UTF-8 on the value path),
   * each value NUL-terminated and even-padded; ids with `id%5 == 3`
   * carry no LIST (tagless absence, not corruption); `id%3 == 0` files
   * append a trailing `junk` chunk of `7 + id%9` bytes after the LIST
   * (odd-size pad again, proving the walk survives chunks AFTER the
   * tags). */
  def syntheticTaggedWav(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def cc(s: String): Unit = bo.write(s.getBytes("ISO-8859-1"), 0, 4)
    def chunk(id4: String, body: Array[Byte]): Unit = {
      cc(id4); u32(body.length.toLong)
      bo.write(body, 0, body.length)
      if ((body.length & 1) == 1) bo.write(0)
    }
    val rate = if (id % 2 == 0) 8000 else 16000
    val channels = (1 + id % 2).toInt
    // fmt body: PCM16
    val fmt = new java.io.ByteArrayOutputStream()
    def fu16(v: Int): Unit = { fmt.write(v & 0xff); fmt.write((v >> 8) & 0xff) }
    def fu32(v: Long): Unit = {
      fmt.write((v & 0xff).toInt); fmt.write(((v >> 8) & 0xff).toInt)
      fmt.write(((v >> 16) & 0xff).toInt); fmt.write(((v >> 24) & 0xff).toInt)
    }
    fu16(1); fu16(channels); fu32(rate.toLong)
    fu32(rate.toLong * channels * 2); fu16(channels * 2); fu16(16)
    val data = Array.tabulate((101 + id % 50).toInt)(j =>
      Multimodal.syntheticPcmByte(id, j))
    def infoValue(s: String): Array[Byte] = {
      val b = (s + "\u0000").getBytes("UTF-8")
      b
    }
    cc("RIFF"); u32(0) // placeholder, patched below
    cc("WAVE")
    chunk("fmt ", fmt.toByteArray)
    chunk("data", data)
    if (id % 5 != 3) {
      val li = new java.io.ByteArrayOutputStream()
      li.write("INFO".getBytes("ISO-8859-1"), 0, 4)
      def tag(key: String, value: String): Unit = {
        val v = infoValue(value)
        li.write(key.getBytes("ISO-8859-1"), 0, 4)
        li.write(v.length & 0xff); li.write((v.length >> 8) & 0xff)
        li.write((v.length >> 16) & 0xff); li.write((v.length >> 24) & 0xff)
        li.write(v, 0, v.length)
        if ((v.length & 1) == 1) li.write(0)
      }
      tag("INAM", s"title_${id * 7 % 1000}")
      tag("IART", s"artist_${id % 50}")
      tag("ICRD", s"${1970 + id % 55}")
      tag("ICMT", s"cömment_${id % 10}")
      chunk("LIST", li.toByteArray)
    }
    if (id % 3 == 0)
      chunk("junk", Array.tabulate((7 + id % 9).toInt)(j =>
        ((id * 5 + j) & 0xff).toByte))
    val out = bo.toByteArray
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    out
  }

  /** Executor-side tagged-WAV fixtures — the m28 oracle replays the tag
   * formulas. */
  def syntheticTaggedWavs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTaggedWav)
}
