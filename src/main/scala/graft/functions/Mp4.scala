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

  /** (type, boxStart, payloadStart, payloadEnd) for each box in
   * [start, end) — boxStart included because fragmented base-data-offset
   * resolution is relative to the first byte of the `moof` BOX, not its
   * payload (ISO 14496-12 §8.8.7). */
  private def boxesFull(b: Array[Byte], start: Long,
      end: Long): Iterator[(String, Long, Long, Long)] =
    new Iterator[(String, Long, Long, Long)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Long, Long, Long) = {
        val size0 = u32(b, pos)
        val typ = fourcc(b, pos + 4)
        // size==1: 64-bit largesize follows the type; size==0: to EOF
        val (hdr, size) =
          if (size0 == 1L) (16L, u64(b, pos + 8))
          else if (size0 == 0L) (8L, end - pos)
          else (8L, size0)
        require(size >= hdr && pos + size <= end, s"box '$typ' overruns")
        val r = (typ, pos, pos + hdr, pos + size)
        pos += size
        r
      }
    }

  /** (type, payloadStart, payloadEnd) for each box in [start, end). */
  private def boxes(b: Array[Byte], start: Long, end: Long): Iterator[(String, Long, Long)] =
    boxesFull(b, start, end).map { case (t, _, ps, pe) => (t, ps, pe) }

  private def child(b: Array[Byte], s: Long, e: Long,
      typ: String): Option[(Long, Long)] =
    boxes(b, s, e).collectFirst { case (t, cs, ce) if t == typ => (cs, ce) }

  /** First-box type names that identify a payload as ISO-BMFF. `moof` and
   * `sidx` lead DASH media segments; `styp` leads CMAF segments. */
  private val TopLevelTypes = Set("ftyp", "moov", "mdat", "free", "skip",
    "wide", "styp", "sidx", "moof", "mfra", "pdin", "meta")

  /** True when the payload LOOKS like ISO-BMFF (well-formed first box of a
   * known top-level type). Callers use this to distinguish "not a video
   * container at all" (byte-window fallback is fine) from "an MP4 we could
   * not demux" (byte-windowing coded video bytes would emit garbage rows —
   * drop instead). */
  def sniffIsoBmff(payload: Array[Byte]): Boolean = {
    if (payload == null || payload.length < 16) return false
    try {
      if (!TopLevelTypes.contains(fourcc(payload, 4))) return false
      val size0 = u32(payload, 0)
      size0 == 0L || (size0 >= 8L && size0 <= payload.length) ||
        (size0 == 1L && u64(payload, 8) <= payload.length)
    } catch { case _: IllegalArgumentException => false }
  }

  /** Per-track header info shared by the progressive and fragmented
   * paths; (stblS, stblE) so the progressive path can walk the tables. */
  private final case class TrakHeader(trackId: Long, width: Int,
      height: Int, timescale: Long, stblS: Long, stblE: Long)

  /**
   * Parse the FIRST video track (`hdlr` handler `vide`). Handles both
   * progressive MP4 (populated `stbl` sample tables) and fragmented
   * MP4 / CMAF (`mvex`/`trex` defaults + `moof`/`tfhd`/`trun` runs —
   * the DASH form; samples resolve against moof-relative or explicit
   * base data offsets per ISO 14496-12 §8.8). None when the payload is
   * not ISO-BMFF, carries no video track, or any table is truncated/
   * inconsistent (a corrupted file must take the caller's fallback
   * path, never throw on an executor).
   */
  def parseVideoTrack(payload: Array[Byte]): Option[Track] = {
    if (payload == null || payload.length < 16) return None
    try {
      val end = payload.length.toLong
      // cheap sniff before any walk: the first box must be well-formed and
      // a known top-level type (ftyp usually first; be liberal)
      if (!TopLevelTypes.contains(fourcc(payload, 4))) return None
      val (moovS, moovE) = child(payload, 0, end, "moov").getOrElse(return None)
      val hdr = boxes(payload, moovS, moovE)
        .collect { case ("trak", ts, te) => (ts, te) }
        .flatMap { case (ts, te) => parseTrakHeader(payload, ts, te) }
        .nextOption().getOrElse(return None)
      val progressive = parseStblSamples(payload, hdr.stblS, hdr.stblE)
      val samples = progressive match {
        case Some(s) => s
        case None =>
          // empty/absent sample tables: fragmented movie — resolve the
          // sample runs from the moof sequence
          parseFragmentSamples(payload, moovS, moovE, end, hdr)
            .getOrElse(return None)
      }
      if (samples.isEmpty) return None
      // Range validation: a corrupt-but-parseable file (truncated
      // mid-mdat, lying stco/co64/base offsets, 64-bit offsets past
      // Int.MaxValue that would wrap negative through .toInt in the
      // slicers) must return None and take the caller's fallback path —
      // never throw on an executor.
      val ok = samples.forall(s => s.offset >= 0 && s.size >= 0 &&
        s.offset + s.size <= payload.length && s.offset + s.size <= Int.MaxValue)
      if (!ok) return None
      Some(Track(hdr.width, hdr.height, hdr.timescale, samples))
    } catch {
      // require() failures from truncated tables / lying sizes
      case _: IllegalArgumentException => None
    }
  }

  private def parseTrakHeader(b: Array[Byte], ts: Long,
      te: Long): Option[TrakHeader] = {
    val (mdiaS, mdiaE) = child(b, ts, te, "mdia").getOrElse(return None)
    // handler first: skip audio/hint tracks without touching their tables
    val (hdS, _) = child(b, mdiaS, mdiaE, "hdlr").getOrElse(return None)
    if (fourcc(b, hdS + 8) != "vide") return None

    val (tkS, _) = child(b, ts, te, "tkhd").getOrElse(return None)
    val tkVer = b(tkS.toInt) & 0xff
    // track_ID follows ver/flags + creation/modification times (which v1
    // widens from 4 to 8 bytes each); width/height: 16.16 fixed at the
    // end of tkhd (after times, ids, layer/volume words and the 36-byte
    // matrix)
    val trackId = u32(b, tkS + (if (tkVer == 1) 20L else 12L))
    val whOff = if (tkVer == 1) 88L else 76L
    val width = (u32(b, tkS + whOff) >> 16).toInt
    val height = (u32(b, tkS + whOff + 4) >> 16).toInt

    val (mdhS, _) = child(b, mdiaS, mdiaE, "mdhd").getOrElse(return None)
    val mdVer = b(mdhS.toInt) & 0xff
    val timescale = if (mdVer == 1) u32(b, mdhS + 20) else u32(b, mdhS + 12)

    val (minfS, minfE) = child(b, mdiaS, mdiaE, "minf").getOrElse(return None)
    val (stblS, stblE) = child(b, minfS, minfE, "stbl").getOrElse(return None)
    Some(TrakHeader(trackId, width, height, timescale, stblS, stblE))
  }

  private def parseStblSamples(b: Array[Byte], stblS: Long,
      stblE: Long): Option[IndexedSeq[Sample]] = {
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
    Some(out.toIndexedSeq)
  }

  // =====================================================================
  // Fragmented MP4 (DASH/CMAF): moov carries only defaults (mvex/trex);
  // every sample lives in a moof/traf/trun run. ISO 14496-12 §8.8.
  // =====================================================================

  /** mvex/trex per-track defaults (0 when the box is absent — the spec
   * requires trex for fragmented files, but a missing default only
   * matters if a trun/tfhd actually falls through to it, so stay
   * liberal and fail at use-site via range validation instead). */
  private final case class TrexDefaults(dur: Long, size: Long, flags: Long)

  /** Resolve every video sample from the top-level `moof` sequence.
   * Offset resolution per §8.8.7: explicit tfhd base_data_offset wins;
   * else default-base-is-moof (flag 0x20000); else the spec default —
   * the enclosing moof's first byte for the FIRST traf, the end of the
   * previous traf's data for later trafs. Tracking the chain requires
   * walking EVERY traf (including other tracks') to know where its data
   * ends; when a preceding traf's extent is unknowable (its sizes need a
   * trex this init segment lacks) a later implicit base is unresolvable
   * and the whole parse returns None — the caller's fallback path fires
   * instead of emitting silently wrong byte slices (multi-traf muxed
   * audio+video DASH is the common shape here). Each trun's optional
   * data_offset is relative to the traf base; absent, runs are
   * contiguous. Also returns None when no moof contributes a sample (an
   * init-only segment or a non-video fragment stream). */
  private def parseFragmentSamples(b: Array[Byte], moovS: Long, moovE: Long,
      end: Long, hdr: TrakHeader): Option[IndexedSeq[Sample]] = {
    // per-track trex defaults — later trafs' implicit bases depend on
    // sibling tracks' extents, so keep ALL tracks' defaults
    val trexMap: Map[Long, TrexDefaults] =
      child(b, moovS, moovE, "mvex").map { case (mvS, mvE) =>
        boxes(b, mvS, mvE).collect {
          case ("trex", s, _) =>
            u32(b, s + 4) ->
              TrexDefaults(u32(b, s + 12), u32(b, s + 16), u32(b, s + 20))
        }.toMap
      }.getOrElse(Map.empty)

    val out = scala.collection.mutable.ArrayBuffer.empty[Sample]
    var no = 0
    var unresolvable = false
    boxesFull(b, 0, end).foreach {
      case ("moof", moofStart, ms, me) if !unresolvable =>
        // end of the previous traf's data within THIS moof (None = unknown)
        var prevEnd: Option[Long] = None
        var firstTraf = true
        boxes(b, ms, me).foreach {
          case ("traf", tfS, tfE) if !unresolvable =>
            val (thS, _) = child(b, tfS, tfE, "tfhd").getOrElse(
              throw new IllegalArgumentException("traf without tfhd"))
            val thFlags = u32(b, thS) & 0xffffffL
            val trackId = u32(b, thS + 4)
            val mine = trackId == hdr.trackId
            val trexT = trexMap.get(trackId)
            // tfhd optional fields, in spec order
            var p = thS + 8
            val baseExplicit =
              if ((thFlags & 0x1) != 0) { val v = u64(b, p); p += 8; Some(v) }
              else None
            if ((thFlags & 0x2) != 0) p += 4 // sample_description_index
            val defDur =
              if ((thFlags & 0x8) != 0) { val v = u32(b, p); p += 4; Some(v) }
              else None
            val defSize =
              if ((thFlags & 0x10) != 0) { val v = u32(b, p); p += 4; Some(v) }
              else None
            val defFlags =
              if ((thFlags & 0x20) != 0) { val v = u32(b, p); p += 4; Some(v) }
              else None
            // §8.8.7 base resolution: explicit > default-base-is-moof
            // (0x20000) > moof start for the first traf > end of the
            // previous traf's data for later ones
            val baseOpt: Option[Long] = baseExplicit.orElse {
              if ((thFlags & 0x20000) != 0) Some(moofStart)
              else if (firstTraf) Some(moofStart)
              else prevEnd
            }
            firstTraf = false
            baseOpt match {
              case None =>
                if (mine) unresolvable = true // our samples can't be placed
                prevEnd = None                // nor can anything after it
              case Some(base) =>
                var cursor = base
                // sizes are "known" when every sample resolves them from
                // the trun itself, a tfhd default, or a present trex —
                // the liberal zero fallback would silently corrupt the
                // implicit-base chain for trafs after this one
                var sizesKnown = true
                boxes(b, tfS, tfE).foreach {
                  case ("trun", trS, trE) =>
                    val trFlags = u32(b, trS) & 0xffffffL
                    val count0 = u32(b, trS + 4)
                    var q = trS + 8
                    if ((trFlags & 0x1) != 0) {
                      cursor = base + u32(b, q).toInt // signed data_offset
                      q += 4
                    }
                    val firstFlags =
                      if ((trFlags & 0x4) != 0) { val v = u32(b, q); q += 4; Some(v) }
                      else None
                    // a lying sample_count must fail parse, not spin: with
                    // per-sample fields the trun box itself must hold them;
                    // without, bound by what the payload could possibly fit
                    val perSample = 4L * java.lang.Long.bitCount(
                      trFlags & 0xf00L)
                    require(
                      if (perSample > 0) q + count0 * perSample <= trE
                      else count0 <= b.length,
                      "trun sample_count overruns its box")
                    if ((trFlags & 0x200) == 0 && defSize.isEmpty &&
                        trexT.isEmpty) sizesKnown = false
                    val count = count0.toInt
                    var k = 0
                    while (k < count) {
                      val dur =
                        if ((trFlags & 0x100) != 0) { val v = u32(b, q); q += 4; v }
                        else defDur.getOrElse(trexT.fold(0L)(_.dur))
                      val size =
                        if ((trFlags & 0x200) != 0) { val v = u32(b, q); q += 4; v }
                        else defSize.getOrElse(trexT.fold(0L)(_.size))
                      val flags =
                        if ((trFlags & 0x400) != 0) { val v = u32(b, q); q += 4; v }
                        else if (k == 0 && firstFlags.isDefined) firstFlags.get
                        else defFlags.getOrElse(trexT.fold(0L)(_.flags))
                      if ((trFlags & 0x800) != 0) q += 4 // composition offset
                      if (mine) {
                        // sample_is_non_sync_sample is bit 16 of sample flags
                        out += Sample(no, cursor, size,
                          (flags & 0x10000L) == 0L, dur)
                        no += 1
                      }
                      cursor += size
                      k += 1
                    }
                  case _ => ()
                }
                prevEnd = if (sizesKnown) Some(cursor) else None
            }
          case _ => ()
        }
      case _ => ()
    }
    if (unresolvable || out.isEmpty) None else Some(out.toIndexedSeq)
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

  /** Shared fixture box writer: big-endian words, 4cc strings, and
   * size-prefixed boxes patched after the body runs — ONE copy for the
   * m13/m14/m26 writers (the fold-duplicated-writers lesson from the
   * Ogg page writer). */
  private final class BoxOut {
    val bo = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
      bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
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
  }

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
    val out = new BoxOut()
    import out.{bo, w32, wStr, box}

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

  // =====================================================================
  // Synthetic FRAGMENTED fixture (DASH/CMAF layout): [ftyp][moov with
  // empty stbl + mvex/trex][sidx][moof+mdat]... — every sample placement
  // fact lives in the moof sequence, so the m14 oracle recomputes the
  // full tfhd/trun arithmetic from first principles. Three per-fragment
  // flag schemes (f % 3) cover the resolution paths that differ on real
  // corpora:
  //   A (f%3==0): default-base-is-moof + trun data_offset + per-sample
  //     sizes; durations and non-first sync flags fall through to trex.
  //   B (f%3==1): EXPLICIT 64-bit base_data_offset + tfhd default
  //     size/duration/flags + a tfdt box the walker must skip; trun
  //     carries only data_offset 0 + first_sample_flags.
  //   C (f%3==2): NO base flags (implicit first-traf moof-start base) +
  //     fully per-sample trun rows incl. composition offsets the walker
  //     must stride over; sync iff k % 3 == 0. When the fragment carries
  //     ≥2 samples the traf is SPLIT IN TWO: the second traf has no base
  //     flags either, so its base is the end of the first traf's data
  //     (§8.8.7's multi-traf default) — a walker that reuses moof-start
  //     there lands its cursor on the moof's own bytes (in range!) and
  //     only the byte probes expose it.
  // A demuxer that cum-sums mdat bytes, ignores tfhd defaults, misreads
  // the 64-bit base, mis-strides trun rows, or mis-bases a later traf
  // produces shifted offsets — the m14 head/tail byte probes catch all
  // of those.
  // =====================================================================

  /** Deterministic fragmented shape shared by the writer, the m14 oracle
   * SQL and the spec: fragments `2 + id%3`, fragment f carries
   * `1 + (id+f)%4` samples; per-sample size `40 + ((id*37 + f*19 + k*13)
   * % 50)` for schemes A/C, the k=0 value fragment-wide for B; duration
   * 800 (trex) for A, `900 + ((id + 7f) % 5)*50` for B, that formula
   * plus `3k` inside the mod for C; scheme-C fragments with ≥2 samples
   * split into two trafs ((k+1)/2 then the rest, the second on the
   * implicit end-of-previous base), growing the moof to `108 + 16k`
   * bytes (vs `68 + 16k` single-traf); sync: k==0 (A/B), k%3==0 (C); dims
   * `16*(1+id%3) × 16*(1+id%4)`; timescale 25600; track id 2; frame
   * byte j of global sample i is `(id + i*131 + j) & 0xff`. */
  def syntheticFmp4Shape(id: Long): (Int, Int => Int, (Int, Int) => Int) = {
    val nFrags = (2 + id % 3).toInt
    val kOf = (f: Int) => (1 + ((id + f) % 4)).toInt
    val size = (f: Int, k: Int) =>
      if (f % 3 == 1) (40 + ((id * 37 + f * 19) % 50)).toInt
      else (40 + ((id * 37 + f * 19 + k * 13) % 50)).toInt
    (nFrags, kOf, size)
  }

  /** The fixture's constant init-segment length: ftyp + moov(empty stbl,
   * mvex/trex) + sidx. Asserted by Mp4Spec so the m14 oracle's literal
   * stays pinned to the writer. */
  val FMp4DataStart: Int = 641

  def syntheticFmp4(id: Long): Array[Byte] = {
    val (nFrags, kOf, size) = syntheticFmp4Shape(id)
    val width = (16 * (1 + id % 3)).toInt
    val height = (16 * (1 + id % 4)).toInt
    val durB = (f: Int) => 900L + ((id + 7L * f) % 5) * 50
    val durC = (f: Int, k: Int) => 900L + ((id + 7L * f + 3L * k) % 5) * 50
    val out = new BoxOut()
    import out.{bo, w32, w64, wStr, box}
    val SyncFlags = 0x02000000L    // sample_depends_on=2, sync
    val NonSyncFlags = 0x00010000L // sample_is_non_sync_sample

    box("ftyp") { wStr("isom"); w32(0x200); wStr("cmfc") }
    box("moov") {
      box("mvhd") { w32(0); w32(0); w32(0); w32(25600); w32(0); w32(0x00010000)
        w32(0x01000000); w32(0); w32(0); w32(0x00010000); w32(0); w32(0)
        w32(0); w32(0x00010000); w32(0); w32(0); w32(0); w32(0x40000000)
        (0 until 6).foreach(_ => w32(0)); w32(3) }
      box("trak") {
        box("tkhd") {
          w32(0x00000007) // v0, flags enabled
          w32(0); w32(0); w32(2); w32(0); w32(0) // times, TRACK ID 2, rsvd, dur
          w32(0); w32(0); w32(0); w32(0)
          w32(0x00010000); w32(0); w32(0); w32(0); w32(0x00010000); w32(0)
          w32(0); w32(0); w32(0x40000000)
          w32(width.toLong << 16); w32(height.toLong << 16)
        }
        box("mdia") {
          box("mdhd") { w32(0); w32(0); w32(0); w32(25600); w32(0); w32(0x55c40000) }
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
              // fragmented init: the sample tables exist but are EMPTY
              box("stts") { w32(0); w32(0) }
              box("stsc") { w32(0); w32(0) }
              box("stsz") { w32(0); w32(0); w32(0) }
              box("stco") { w32(0); w32(0) }
            }
          }
        }
      }
      box("mvex") {
        box("trex") { w32(0); w32(2) // track id 2
          w32(1)    // default_sample_description_index
          w32(800)  // default_sample_duration — scheme A falls through here
          w32(0)    // default_sample_size (never used: A/C per-sample, B tfhd)
          w32(NonSyncFlags) } // default flags — A's non-first samples
      }
    }
    // a plausible sidx the walker must SKIP (v0, one reference)
    box("sidx") { w32(0); w32(2); w32(25600); w32(0); w32(0)
      bo.write(0); bo.write(0); bo.write(0); bo.write(1)
      w32(0); w32(0); w32(0x90000000L) }
    require(bo.size() == FMp4DataStart,
      s"fixture init segment drifted: ${bo.size()} != $FMp4DataStart")

    var globalIdx = 0
    (0 until nFrags).foreach { f =>
      val k = kOf(f)
      val fragStart = bo.size().toLong
      val moofSize = (f % 3: @unchecked) match {
        case 0 => 72 + 4 * k
        case 1 => 112
        case 2 => if (k >= 2) 108 + 16 * k else 68 + 16 * k
      }
      box("moof") {
        box("mfhd") { w32(0); w32(f + 1L) }
        box("traf") {
          (f % 3: @unchecked) match {
            case 0 => // scheme A: default-base-is-moof, per-sample sizes
              box("tfhd") { w32(0x020000); w32(2) }
              box("trun") { w32(0x1 | 0x4 | 0x200); w32(k)
                w32(moofSize + 8L)   // data_offset → mdat payload
                w32(SyncFlags)       // first_sample_flags
                (0 until k).foreach(i => w32(size(f, i).toLong)) }
            case 1 => // scheme B: explicit 64-bit base + tfhd defaults
              box("tfhd") { w32(0x1 | 0x8 | 0x10 | 0x20); w32(2)
                w64(fragStart + moofSize + 8) // base_data_offset (absolute)
                w32(durB(f)); w32(size(f, 0).toLong); w32(NonSyncFlags) }
              box("tfdt") { w32(0x01000000); w64(f * 100000L) }
              box("trun") { w32(0x1 | 0x4); w32(k)
                w32(0)               // data_offset relative to explicit base
                w32(SyncFlags) }
            case 2 => // scheme C: implicit bases, fully per-sample. k>=2
              // splits into two trafs; the second has NO base flags so
              // its base is the end of the first's data (§8.8.7)
              val k1 = if (k >= 2) (k + 1) / 2 else k
              box("tfhd") { w32(0); w32(2) }
              box("trun") { w32(0x1 | 0x100 | 0x200 | 0x400 | 0x800); w32(k1)
                w32(moofSize + 8L)
                (0 until k1).foreach { i =>
                  w32(durC(f, i))
                  w32(size(f, i).toLong)
                  w32(if (i % 3 == 0) SyncFlags else NonSyncFlags)
                  w32(i * 10L) // composition offset — demux must stride over
                } }
          }
        }
        if (f % 3 == 2 && k >= 2) {
          val k1 = (k + 1) / 2
          box("traf") { // continuation traf: implicit end-of-previous base
            box("tfhd") { w32(0); w32(2) }
            box("trun") { w32(0x100 | 0x200 | 0x400 | 0x800)
              w32((k - k1).toLong)
              (k1 until k).foreach { i =>
                w32(durC(f, i))
                w32(size(f, i).toLong)
                w32(if (i % 3 == 0) SyncFlags else NonSyncFlags)
                w32(i * 10L)
              } }
          }
        }
      }
      require(bo.size() - fragStart == moofSize,
        s"moof size drifted for scheme ${f % 3}: ${bo.size() - fragStart} != $moofSize")
      box("mdat") {
        (0 until k).foreach { i =>
          val sz = size(f, i)
          var j = 0
          while (j < sz) {
            bo.write(((id + globalIdx * 131L + j) & 0xff).toInt); j += 1
          }
          globalIdx += 1
        }
      }
    }
    bo.toByteArray
  }

  /** Executor-side synthetic fragmented-MP4 fixtures — the m14 oracle
   * recomputes the full moof/tfhd/trun arithmetic in SQL. */
  def syntheticFmp4s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticFmp4)

  /** Executor-side synthetic-MP4 fixtures with id-derived shape — the m13
   * oracle recomputes the full stbl arithmetic in SQL. */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMp4(_))

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

  // =====================================================================
  // iTunes-style tag extraction (moov/udta/meta/ilst) — the MP4 member
  // of the audio/video tag family (ID3 for MP3, VorbisComment for
  // Ogg/FLAC).
  // =====================================================================

  /**
   * Extract iTunes-style text tags from the `moov/udta/meta/ilst` list —
   * the MP4 analog of [[Mp3.parseId3TextFrames]] and the Vorbis comment
   * extractors ([[Ogg.parseComments]], [[Flac.parseComments]]): where
   * title/artist/album live in .m4a/.m4v crawls. `meta` is a FullBox
   * (ISO 14496-12 §8.11.1 — 4 version/flags bytes precede its children,
   * required zero here); each `ilst` child box's 4cc is the tag key,
   * decoded ISO-8859-1 so the classic iTunes 0xA9 prefix renders as
   * `©nam`/`©ART`/…, emitted RAW (extraction, not key-mapping policy);
   * the item's `data` atom carries a 4-byte well-known-type indicator
   * and a 4-byte locale before the value (QuickTime metadata layout).
   * Only type 1 (UTF-8 text) values are emitted, in list order; binary
   * atoms (`trkn`'s type-0 pairs, `covr` JPEG type 13, …) and items
   * without a `data` child are strided over structurally.
   *
   * None when the payload is not clean ISO-BMFF, has no
   * moov/udta/meta/ilst path or no text tag (tagless is an absence,
   * not corruption), the `meta` version/flags are nonzero, a `data`
   * atom is shorter than its 8-byte prelude, or a type-1 value is
   * invalid UTF-8 (strict decode — the tag family's never-garbage
   * contract; lenient U+FFFD replacement would emit plausible mojibake
   * rows).
   */
  def parseIlstTags(payload: Array[Byte]): Option[IndexedSeq[(String, String)]] = {
    if (payload == null || payload.length < 16) return None
    try {
      val end = payload.length.toLong
      if (!TopLevelTypes.contains(fourcc(payload, 4))) return None
      val ilst = for {
        (ms, me) <- child(payload, 0, end, "moov")
        (us, ue) <- child(payload, ms, me, "udta")
        (mts, mte) <- child(payload, us, ue, "meta")
        // FullBox prelude: version 0, flags 0 — anything else is a layout
        // this walk does not understand, poison rather than misparse
        if mte - mts >= 4 && u32(payload, mts) == 0L
        r <- child(payload, mts + 4, mte, "ilst")
      } yield r
      ilst match {
        case None => None
        case Some((is, ie)) =>
          val tags = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var bad = false
          val items = boxes(payload, is, ie)
          while (!bad && items.hasNext) {
            val (key, s, e) = items.next()
            child(payload, s, e, "data") match {
              case Some((ds, de)) if de - ds < 8 => bad = true
              case Some((ds, de)) if u32(payload, ds) == 1L =>
                Ogg.utf8Strict(payload, (ds + 8).toInt, (de - ds - 8).toInt) match {
                  case Some(v) => tags += ((key, v))
                  case None => bad = true
                }
              case _ => () // non-text data atom or data-less item: stride
            }
          }
          if (bad || tags.isEmpty) None else Some(tags.toIndexedSeq)
      }
    } catch {
      // require() failures from truncated/lying box sizes
      case _: IllegalArgumentException => None
    }
  }

  /** Output schema of [[ilstTags]]. */
  val ilstSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("tag_no", IntegerType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** One row per UTF-8 text tag (list order); payloads without a clean
   * tagged `ilst` contribute nothing. Narrow mapPartitions — header-only
   * reads, zero exchanges, the family's scale posture. */
  def ilstTags(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseIlstTags(r.getAs[Array[Byte]](pIdx)) match {
          case Some(ts) => ts.iterator.zipWithIndex.map {
            case ((k, v), i) => Row(id, i, k, v)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(ilstSchema))
  }

  /** Deterministic TAGGED-MP4 fixture shared by the writer, the m26
   * oracle and the spec: ftyp + moov{udta{meta{hdlr + ilst}}} + free,
   * where ilst carries `©nam`=`title_<id*7 % 1000>`,
   * `©ART`=`artist_<id % 50>`, a BINARY `trkn` (type 0 — strided),
   * `©alb`=`album_<id % 20>`, a `covr` JPEG atom (type 13, `8 + id%24`
   * opaque bytes, only when `id%3 == 0` — strided), `©day`=`<1970 +
   * id%55>` and `©cmt`=`cömment_<id%10>` (multi-byte UTF-8 on the
   * strict decode path); ids with `id%5 == 2` carry udta+meta but NO
   * ilst (tagless absence, not corruption). The hdlr box inside meta
   * and the trailing free box are strided structurally. */
  def syntheticTaggedMp4(id: Long): Array[Byte] = {
    val out = new BoxOut()
    import out.{bo, w32, wStr, box}
    box("ftyp") { wStr("M4A "); w32(0x200); wStr("isom") }
    box("moov") {
      box("udta") {
        box("meta") {
          w32(0) // FullBox version/flags
          box("hdlr") { w32(0); w32(0); wStr("mdir"); wStr("appl")
            w32(0); w32(0); bo.write(0) }
          if (id % 5 != 2) box("ilst") {
            def text(key: String, value: String): Unit =
              box(key) { box("data") { w32(1); w32(0)
                bo.write(value.getBytes("UTF-8")) } }
            text("©nam", s"title_${id * 7 % 1000}")
            text("©ART", s"artist_${id % 50}")
            box("trkn") { box("data") { w32(0); w32(0) // binary pairs
              w32((1 + id % 12) << 16); w32(12L << 16) } }
            text("©alb", s"album_${id % 20}")
            if (id % 3 == 0) box("covr") { box("data") { w32(13); w32(0)
              (0 until (8 + id % 24).toInt).foreach(j =>
                bo.write(((id * 9 + j) & 0xff).toInt)) } }
            text("©day", s"${1970 + id % 55}")
            text("©cmt", s"cömment_${id % 10}")
          }
        }
      }
    }
    box("free") { (0 until (4 + id % 12).toInt).foreach(_ => bo.write(0)) }
    bo.toByteArray
  }

  /** Executor-side tagged-MP4 fixtures — the m26 oracle replays the tag
   * formulas. */
  def syntheticTaggedMp4s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTaggedMp4)
}
