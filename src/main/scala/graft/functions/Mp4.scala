package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Pure-JVM ISO-BMFF (MP4) demux: a real `moov`/`trak`/`stbl` box walk that
 * resolves every video sample's exact byte range in `mdat`, its keyframe
 * flag and its duration — no native decoder, no third-party jar. This is
 * the container math a 100 TB video-training pipeline needs for frame
 * EXTRACTION and sampling (decode stays a downstream concern): with
 * (offset, size, keyframe) a cluster job can slice sync frames out of
 * object-store ranged reads without ever shipping whole videos.
 *
 * Parsing scope (the tables that define sample placement, per ISO/IEC
 * 14496-12): `stsz`/`stz2`-style fixed size, `stsc` (sample→chunk runs,
 * including the implicit open-ended last run), `stco`/`co64` (32/64-bit
 * chunk offsets), `stss` (sync table; absent ⇒ every sample is a sync
 * sample, per spec), `stts` (decode-delta runs), `mdhd` timescale and
 * `tkhd` 16.16 fixed-point dimensions, both in version 0 and version 1
 * forms. Truncated/malformed payloads return None — callers fall back,
 * they never see a half-parsed track.
 *
 * Reference behavior anchor: fugue treats binary media columns as opaque
 * payloads transformed per-partition (fugue/execution/execution_engine.py
 * map-style extensions); the box walk itself is engine-added capability
 * (SURVEY §2 "beyond-reference pipeline operators").
 */
object Mp4 {

  /** One video sample resolved to its absolute byte range. `duration` is
   * in `timescale` ticks (the caller converts to wall time if needed). */
  final case class Sample(no: Int, offset: Long, size: Long,
      keyframe: Boolean, duration: Long)

  final case class Track(width: Int, height: Int, timescale: Long,
      samples: IndexedSeq[Sample])

  // ---- big-endian readers (bounds-checked: malformed sizes must surface
  // as None, not ArrayIndexOutOfBounds on an executor) ----
  private def u32(b: Array[Byte], p: Long): Long = {
    require(p >= 0 && p + 4 <= b.length, "u32 out of bounds")
    ((b(p.toInt) & 0xffL) << 24) | ((b(p.toInt + 1) & 0xffL) << 16) |
      ((b(p.toInt + 2) & 0xffL) << 8) | (b(p.toInt + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], p: Long): Long = {
    require(p >= 0 && p + 8 <= b.length, "u64 out of bounds")
    (u32(b, p) << 32) | u32(b, p + 4)
  }
  private def fourcc(b: Array[Byte], p: Long): String = {
    require(p >= 0 && p + 4 <= b.length, "fourcc out of bounds")
    new String(b, p.toInt, 4, "ISO-8859-1")
  }

  /** (type, payloadStart, payloadEnd) for each box in [start, end). */
  private def boxes(b: Array[Byte], start: Long, end: Long): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Long, Long) = {
        val size0 = u32(b, pos)
        val typ = fourcc(b, pos + 4)
        // size==1: 64-bit largesize follows the type; size==0: to EOF
        val (hdr, size) =
          if (size0 == 1L) (16L, u64(b, pos + 8))
          else if (size0 == 0L) (8L, end - pos)
          else (8L, size0)
        require(size >= hdr && pos + size <= end, s"box '$typ' overruns")
        val r = (typ, pos + hdr, pos + size)
        pos += size
        r
      }
    }

  private def child(b: Array[Byte], s: Long, e: Long,
      typ: String): Option[(Long, Long)] =
    boxes(b, s, e).collectFirst { case (t, cs, ce) if t == typ => (cs, ce) }

  /**
   * Parse the FIRST video track (`hdlr` handler `vide`). None when the
   * payload is not ISO-BMFF, carries no video track, or any table is
   * truncated/inconsistent (a corrupted file must take the caller's
   * fallback path, never throw on an executor).
   */
  def parseVideoTrack(payload: Array[Byte]): Option[Track] = {
    if (payload == null || payload.length < 16) return None
    try {
      val end = payload.length.toLong
      // cheap sniff before any walk: the first box must be well-formed and
      // a known top-level type (ftyp usually first; be liberal)
      val first = fourcc(payload, 4)
      if (!Set("ftyp", "moov", "mdat", "free", "skip", "wide", "styp")
        .contains(first)) return None
      val (moovS, moovE) = child(payload, 0, end, "moov").getOrElse(return None)
      boxes(payload, moovS, moovE).collect { case ("trak", ts, te) => (ts, te) }
        .flatMap { case (ts, te) => parseTrak(payload, ts, te) }
        .nextOption()
    } catch {
      // require() failures from truncated tables / lying sizes
      case _: IllegalArgumentException => None
    }
  }

  private def parseTrak(b: Array[Byte], ts: Long, te: Long): Option[Track] = {
    val (mdiaS, mdiaE) = child(b, ts, te, "mdia").getOrElse(return None)
    // handler first: skip audio/hint tracks without touching their tables
    val (hdS, _) = child(b, mdiaS, mdiaE, "hdlr").getOrElse(return None)
    if (fourcc(b, hdS + 8) != "vide") return None

    val (tkS, _) = child(b, ts, te, "tkhd").getOrElse(return None)
    val tkVer = b(tkS.toInt) & 0xff
    // width/height: 16.16 fixed at the end of tkhd (after times, ids,
    // layer/volume words and the 36-byte matrix) — v1 widens the three
    // time fields from 4 to 8 bytes
    val whOff = if (tkVer == 1) 88L else 76L
    val width = (u32(b, tkS + whOff) >> 16).toInt
    val height = (u32(b, tkS + whOff + 4) >> 16).toInt

    val (mdhS, _) = child(b, mdiaS, mdiaE, "mdhd").getOrElse(return None)
    val mdVer = b(mdhS.toInt) & 0xff
    val timescale = if (mdVer == 1) u32(b, mdhS + 20) else u32(b, mdhS + 12)

    val (minfS, minfE) = child(b, mdiaS, mdiaE, "minf").getOrElse(return None)
    val (stblS, stblE) = child(b, minfS, minfE, "stbl").getOrElse(return None)

    // ---- stsz: per-sample sizes (fixed-size form: sample_size != 0) ----
    val (szS, _) = child(b, stblS, stblE, "stsz").getOrElse(return None)
    val fixedSize = u32(b, szS + 4)
    val nSamples = u32(b, szS + 8).toInt
    if (nSamples <= 0) return None
    val sizes: Int => Long =
      if (fixedSize != 0) _ => fixedSize
      else { val base = szS + 12; i => u32(b, base + 4L * i) }

    // ---- stco / co64: chunk offsets ----
    val chunkOffsets: IndexedSeq[Long] =
      child(b, stblS, stblE, "stco") match {
        case Some((cS, _)) =>
          val n = u32(b, cS + 4).toInt
          (0 until n).map(i => u32(b, cS + 8 + 4L * i))
        case None =>
          val (cS, _) = child(b, stblS, stblE, "co64").getOrElse(return None)
          val n = u32(b, cS + 4).toInt
          (0 until n).map(i => u64(b, cS + 8 + 8L * i))
      }
    if (chunkOffsets.isEmpty) return None

    // ---- stsc: chunk run table → samples-per-chunk for every chunk.
    // Each entry applies from its first_chunk (1-based) until the next
    // entry's; the LAST run is open-ended through the final chunk. ----
    val (scS, _) = child(b, stblS, stblE, "stsc").getOrElse(return None)
    val scN = u32(b, scS + 4).toInt
    val scRuns = (0 until scN).map { i =>
      val e = scS + 8 + 12L * i
      (u32(b, e).toInt, u32(b, e + 4).toInt) // (first_chunk, samples_per_chunk)
    }
    if (scRuns.isEmpty || scRuns.head._1 != 1) return None
    val perChunk = new Array[Int](chunkOffsets.length)
    var run = 0
    var c = 0
    while (c < chunkOffsets.length) {
      while (run + 1 < scRuns.length && scRuns(run + 1)._1 <= c + 1) run += 1
      perChunk(c) = scRuns(run)._2
      c += 1
    }

    // ---- stts: decode-delta runs → per-sample duration ----
    val (ttS, _) = child(b, stblS, stblE, "stts").getOrElse(return None)
    val ttN = u32(b, ttS + 4).toInt
    val durations = new Array[Long](nSamples)
    var di = 0
    var t = 0
    while (t < ttN && di < nSamples) {
      val cnt = u32(b, ttS + 8 + 8L * t).toInt
      val delta = u32(b, ttS + 12 + 8L * t)
      var k = 0
      while (k < cnt && di < nSamples) { durations(di) = delta; di += 1; k += 1 }
      t += 1
    }
    if (di != nSamples) return None

    // ---- stss: sync samples (1-based); ABSENT means all-sync per spec ----
    val keyframes: Int => Boolean = child(b, stblS, stblE, "stss") match {
      case None => _ => true
      case Some((ssS, _)) =>
        val n = u32(b, ssS + 4).toInt
        val set = (0 until n).map(i => u32(b, ssS + 8 + 4L * i).toInt).toSet
        i => set.contains(i + 1)
    }

    // ---- resolve: walk chunks, accumulate intra-chunk offsets ----
    val out = new scala.collection.mutable.ArrayBuffer[Sample](nSamples)
    var sample = 0
    var chunk = 0
    while (sample < nSamples && chunk < chunkOffsets.length) {
      var within = 0L
      var k = 0
      while (k < perChunk(chunk) && sample < nSamples) {
        val sz = sizes(sample)
        out += Sample(sample, chunkOffsets(chunk) + within, sz,
          keyframes(sample), durations(sample))
        within += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (out.length != nSamples) return None
    Some(Track(width, height, timescale, out.toIndexedSeq))
  }

  // =====================================================================
  // Synthetic fixture: a VALID minimal MP4 whose stbl arithmetic is a
  // pure function of the seed, so a SQL oracle can recompute every
  // sample's offset/size/keyframe/duration from first principles.
  // Layout: [ftyp][mdat: chunks of frames, 4 zero pad bytes BETWEEN
  // chunks][moov]. The padding is load-bearing for the differential: a
  // demuxer that cum-sums sizes instead of honoring stco reads shifted
  // bytes and the head/tail probes catch it.
  // =====================================================================

  /** Deterministic shape shared by the writer, the demux oracle SQL and
   * the spec: frames `2 + id%7`, size(i) `50 + ((id*31 + i*17) % 64)`,
   * chunking 2-then-3 samples, keyframe iff `i % 4 == 0`, duration
   * `1000 + (id%5)*100` for the first n/2 samples then `1200`, dims
   * `16*(1+id%4) × 16*(1+id%3)`, timescale `12800`, frame byte j
   * `(id + i*131 + j) & 0xff`. */
  def syntheticShape(id: Long): (Int, Int => Int, Int, Int) = {
    val n = (2 + id % 7).toInt
    val size = (i: Int) => (50 + ((id * 31 + i * 17) % 64)).toInt
    (n, size, (16 * (1 + id % 4)).toInt, (16 * (1 + id % 3)).toInt)
  }

  /** `co64`/`v1` emit the 64-bit chunk-offset box and version-1
   * tkhd/mdhd respectively — spec-only knobs proving the parser handles
   * the large-file forms real corpora contain. */
  def syntheticMp4(id: Long, co64: Boolean = false,
      v1: Boolean = false): Array[Byte] = {
    val (n, size, width, height) = syntheticShape(id)
    val d1 = 1000L + (id % 5) * 100
    val d2 = 1200L
    val half = n / 2
    // chunk sample counts: 2, then 3 per chunk, last chunk the remainder
    val chunkCounts = {
      val buf = scala.collection.mutable.ArrayBuffer(math.min(2, n))
      var left = n - buf.head
      while (left > 0) { val c = math.min(3, left); buf += c; left -= c }
      buf.toSeq
    }
    val bo = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
      bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
    }
    def wStr(s: String): Unit = bo.write(s.getBytes("ISO-8859-1"))
    def box(typ: String)(body: => Unit): Unit = {
      val mark = bo.size()
      w32(0); wStr(typ); body
      val bytes = bo.toByteArray
      val sz = bytes.length - mark
      bytes(mark) = ((sz >> 24) & 0xff).toByte
      bytes(mark + 1) = ((sz >> 16) & 0xff).toByte
      bytes(mark + 2) = ((sz >> 8) & 0xff).toByte
      bytes(mark + 3) = (sz & 0xff).toByte
      bo.reset(); bo.write(bytes, 0, bytes.length)
    }

    box("ftyp") { wStr("isom"); w32(0x200); wStr("isom") }

    // mdat + record each chunk's absolute offset as it is written
    val chunkOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    box("mdat") {
      var i = 0
      chunkCounts.zipWithIndex.foreach { case (cnt, ci) =>
        if (ci > 0) { bo.write(0); bo.write(0); bo.write(0); bo.write(0) }
        chunkOffsets += bo.size().toLong
        var k = 0
        while (k < cnt) {
          val sz = size(i)
          var j = 0
          while (j < sz) { bo.write(((id + i * 131L + j) & 0xff).toInt); j += 1 }
          i += 1; k += 1
        }
      }
    }

    box("moov") {
      box("mvhd") { w32(0); w32(0); w32(0); w32(12800); w32(0); w32(0x00010000)
        w32(0x01000000); w32(0); w32(0); w32(0x00010000); w32(0); w32(0)
        w32(0); w32(0x00010000); w32(0); w32(0); w32(0); w32(0x40000000)
        (0 until 6).foreach(_ => w32(0)); w32(2) }
      box("trak") {
        box("tkhd") {
          if (v1) {
            w32(0x01000007) // v1, flags enabled
            w32(0); w32(0); w32(0); w32(0) // ctime/mtime (64-bit each)
            w32(1); w32(0) // track id, reserved
            w32(0); w32(0) // duration (64-bit)
          } else {
            w32(0x00000007) // v0, flags enabled
            w32(0); w32(0); w32(1); w32(0); w32(0) // times, id, rsvd, duration
          }
          w32(0); w32(0) // reserved[2]
          w32(0); w32(0) // layer/alt, volume/rsvd
          // unity matrix
          w32(0x00010000); w32(0); w32(0); w32(0); w32(0x00010000); w32(0)
          w32(0); w32(0); w32(0x40000000)
          w32(width.toLong << 16); w32(height.toLong << 16)
        }
        box("mdia") {
          box("mdhd") {
            if (v1) { w32(0x01000000); w32(0); w32(0); w32(0); w32(0)
              w32(12800); w32(0); w32(0); w32(0x55c40000) }
            else { w32(0); w32(0); w32(0); w32(12800); w32(0); w32(0x55c40000) }
          }
          box("hdlr") { w32(0); w32(0); wStr("vide"); w32(0); w32(0); w32(0); bo.write(0) }
          box("minf") {
            box("vmhd") { w32(0x00000001); w32(0); w32(0) }
            box("dinf") { box("dref") { w32(0); w32(1)
              box("url ") { w32(0x00000001) } } }
            box("stbl") {
              box("stsd") { w32(0); w32(1)
                box("avc1") { (0 until 6).foreach(_ => bo.write(0)); w32(1)
                  w32(0); w32(0); w32(0); w32(0); w32(0)
                  bo.write((width >> 8) & 0xff); bo.write(width & 0xff)
                  bo.write((height >> 8) & 0xff); bo.write(height & 0xff)
                  w32(0x00480000); w32(0x00480000); w32(0)
                  bo.write(0); bo.write(1)
                  (0 until 32).foreach(_ => bo.write(0))
                  bo.write(0); bo.write(0x18); bo.write(0xff); bo.write(0xff) } }
              box("stts") {
                w32(0)
                if (half > 0 && half < n) { w32(2); w32(half); w32(d1)
                  w32(n - half); w32(d2) }
                else { w32(1); w32(n); w32(if (half == 0) d2 else d1) }
              }
              box("stsc") {
                w32(0)
                // runs: chunk 1 carries 2 samples, chunks 2.. carry 3;
                // a short LAST chunk needs its own run (stsc runs are
                // open-ended, so the remainder must be stated)
                val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
                chunkCounts.zipWithIndex.foreach { case (cnt, ci) =>
                  if (runs.isEmpty || runs.last._2 != cnt) runs += ((ci + 1, cnt))
                }
                w32(runs.length)
                runs.foreach { case (fc, cnt) => w32(fc); w32(cnt); w32(1) }
              }
              box("stsz") { w32(0); w32(0); w32(n)
                (0 until n).foreach(i => w32(size(i))) }
              if (co64) box("co64") { w32(0); w32(chunkOffsets.length)
                chunkOffsets.foreach { o => w32(o >> 32); w32(o & 0xffffffffL) } }
              else box("stco") { w32(0); w32(chunkOffsets.length)
                chunkOffsets.foreach(w32) }
              box("stss") { w32(0)
                val sync = (0 until n).filter(_ % 4 == 0)
                w32(sync.length); sync.foreach(i => w32(i + 1)) }
            }
          }
        }
      }
    }
    bo.toByteArray
  }

  /** Executor-side synthetic-MP4 fixtures with id-derived shape — the m13
   * oracle recomputes the full stbl arithmetic in SQL. */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map(r => Row(r.getLong(idIdx), syntheticMp4(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Output schema of [[demuxMp4Frames]]. */
  val mp4FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("offset", LongType),
    StructField("size", LongType),
    StructField("keyframe", IntegerType),
    StructField("dur_ticks", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame_bytes", BinaryType)))

  /**
   * Demux MP4 payloads to one row per video sample with its RESOLVED byte
   * range, sync flag, duration ticks, container dims, and the extracted
   * sample bytes (sliced straight out of `mdat` by the stco/stsc/stsz
   * walk — extraction, not estimation). Non-MP4 / corrupt payloads are
   * dropped (callers that need a fallback use [[Multimodal.demuxFrames]],
   * which routes through this walk before its byte-window fallback).
   *
   * Scale: per-row linear in the moov tables + emitted bytes; narrow
   * (mapPartitions, no shuffle). At cluster scale the natural upstream is
   * a binary-file scan; sample slicing here is the step that turns one
   * whole-file read into per-frame rows for downstream decode fan-out.
   */
  def demuxMp4Frames(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        parseVideoTrack(payload) match {
          case Some(tr) => tr.samples.iterator.map { s =>
            val bytes = java.util.Arrays.copyOfRange(
              payload, s.offset.toInt, (s.offset + s.size).toInt)
            Row(id, s.no, s.offset, s.size, if (s.keyframe) 1 else 0,
              s.duration, tr.width, tr.height, bytes)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(mp4FrameSchema))
  }
}
