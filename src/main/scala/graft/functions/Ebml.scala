package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Matroska / WebM EBML walk: DocType, segment Info (timestamp scale,
 * duration, muxing app) and per-track metadata (codec, video dims,
 * audio channels/rate) straight from the element tree — the
 * web-video member of the container family ([[Mp4]] ISO-BMFF,
 * [[Ogg]] pages, [[Mp3]] frames, [[Flac]] blocks, [[Riff]] chunks).
 * WebM is the dominant `<video>` format in a web crawl; a video lake
 * census that can't read EBML misses it entirely.
 *
 * EBML facts the walk must honor (RFC 8794):
 *   - element IDs are variable-width (1–4 bytes) and KEEP their
 *     length-descriptor marker bit;
 *   - data sizes are variable-width (1–8 bytes) and STRIP the marker
 *     bit; a size whose value bits are all ones means UNKNOWN size —
 *     legal (and ubiquitous for live-muxed files) on Segment, which
 *     then runs to end-of-payload;
 *   - integers are big-endian with 0–8 data bytes (0 bytes = 0);
 *     floats are exactly 4 or 8 bytes;
 *   - unknown elements (Void, CRC-32, SeekHead, Cues, Clusters, …) are
 *     strided by their declared size, never decoded.
 *
 * Header-only reads — Clusters (the frame data, ~all of the file) are
 * skipped by size. Narrow mapPartitions, zero exchanges.
 */
object Ebml {

  /** One decoded track with the file-level context it belongs to. */
  final case class Track(trackNo: Long, trackType: String, codecId: String,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      sampleRate: Option[Int])

  /** Decoded file-level + per-track metadata. */
  final case class MkvMeta(docType: String, timestampScale: Long,
      durationMs: Option[Long], muxingApp: Option[String],
      tracks: IndexedSeq[Track])

  // ---- EBML primitives -------------------------------------------------

  /** Read an element ID at `pos` (marker bit kept). Returns (id, width)
   * or null on malformation/overrun. IDs are 1–4 bytes. */
  private def readId(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    if (pos >= end) return null
    val first = b(pos) & 0xff
    if (first == 0) return null
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width < 1 || width > 4 || pos + width > end) return null
    var v = first.toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    (v, width)
  }

  /** Read a data size at `pos` (marker bit stripped). Returns
   * (size, width) with size = -1 for the all-ones UNKNOWN size, or null
   * on malformation/overrun. Sizes are 1–8 bytes. */
  private def readSize(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    if (pos >= end) return null
    val first = b(pos) & 0xff
    if (first == 0) return null
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width < 1 || width > 8 || pos + width > end) return null
    var v = (first & (0xff >>> width)).toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    // all value bits set = unknown
    val allOnes = (1L << (7 * width)) - 1
    if (v == allOnes) (-1L, width) else (v, width)
  }

  private def readUint(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    v
  }

  /** 4-byte float or 8-byte double, big-endian; NaN on illegal length
   * (callers treat NaN as malformation). */
  private def readFloat(b: Array[Byte], pos: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(readUint(b, pos, 4).toInt)
    else if (len == 8) java.lang.Double.longBitsToDouble(readUint(b, pos, 8))
    else Double.NaN

  /** Iterate the child elements of [start, end). Calls `f(id, bodyStart,
   * bodyLen)` per child; returns false on any structural malformation
   * (truncated id/size, child overrunning the parent, unknown-size child
   * anywhere below Segment level). */
  private def walkChildren(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Boolean): Boolean = {
    var pos = start
    while (pos < end) {
      val id = readId(b, pos, end)
      if (id == null) return false
      val sz = readSize(b, pos + id._2, end)
      if (sz == null || sz._1 < 0) return false
      val body = pos + id._2 + sz._2
      if (body + sz._1 > end) return false
      if (!f(id._1, body, sz._1.toInt)) return false
      pos = body + sz._1.toInt
    }
    pos == end
  }

  // ---- the walk --------------------------------------------------------

  /**
   * Parse DocType, Info and Tracks. None unless the payload is
   * structurally clean: an EBML header (0x1A45DFA3) with a DocType,
   * then a Segment (0x18538067, known or unknown size) whose children
   * all parse; every master's children must exactly fill it. Clusters,
   * SeekHead, Cues, Void, CRC-32 and any unrecognized element are
   * strided by size. A file with no Tracks element yields zero tracks
   * only if the Segment also carries no Info — in practice both are
   * mandatory, so missing Tracks with present Info is accepted as a
   * metadata-only stream head (the common remux prefix), zero rows.
   */
  def parseMkv(payload: Array[Byte]): Option[MkvMeta] = {
    val b = payload
    if (b == null || b.length < 8) return None
    val hid = readId(b, 0, b.length)
    if (hid == null || hid._1 != 0x1A45DFA3L) return None
    val hsz = readSize(b, hid._2, b.length)
    if (hsz == null || hsz._1 < 0) return None
    val hbody = hid._2 + hsz._2
    if (hbody + hsz._1 > b.length) return None
    var docType: String = null
    if (!walkChildren(b, hbody, hbody + hsz._1.toInt) { (id, off, len) =>
      if (id == 0x4282L) docType = new String(b, off, len, "UTF-8")
      true
    }) return None
    if (docType == null) return None

    // Segment
    var pos = hbody + hsz._1.toInt
    val sid = readId(b, pos, b.length)
    if (sid == null || sid._1 != 0x18538067L) return None
    val ssz = readSize(b, pos + sid._2, b.length)
    if (ssz == null) return None
    val sbody = pos + sid._2 + ssz._2
    val send =
      if (ssz._1 < 0) b.length // unknown size: runs to end of payload
      else {
        if (sbody + ssz._1 > b.length) return None
        // strict posture: the Segment must close the payload exactly —
        // trailing bytes are corruption, not a second stream (multi-
        // segment files are out of scope like multi-disk ZIPs)
        if (sbody + ssz._1 != b.length) return None
        sbody + ssz._1.toInt
      }

    var tsScale = 1000000L // Matroska default
    var durationUnits = Double.NaN
    var sawDuration = false
    var badFloat = false
    var muxingApp: Option[String] = None
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]

    def parseTrackEntry(off: Int, len: Int): Boolean = {
      var no = -1L
      var tpe = -1L
      var codec: String = null
      var w, h, ch, rate: Option[Int] = None
      // EBML uints carry 0–8 data bytes; a longer one is malformed, and
      // a dimension/channel count outside positive-Int range is corrupt
      def dim(o: Int, l: Int): Option[Int] =
        if (l > 8) None
        else {
          val v = readUint(b, o, l)
          if (v <= 0 || v > Int.MaxValue) None else Some(v.toInt)
        }
      val ok = walkChildren(b, off, off + len) { (id, o, l) =>
        id match {
          case 0xD7L =>
            if (l > 8) false else { no = readUint(b, o, l); true }
          case 0x83L =>
            if (l > 8) false else { tpe = readUint(b, o, l); true }
          case 0x86L => codec = new String(b, o, l, "UTF-8"); true
          case 0xE0L => // Video master
            walkChildren(b, o, o + l) { (vid, vo, vl) =>
              vid match {
                case 0xB0L => w = dim(vo, vl); w.isDefined
                case 0xBAL => h = dim(vo, vl); h.isDefined
                case _ => true
              }
            }
          case 0xE1L => // Audio master
            walkChildren(b, o, o + l) { (aid, ao, al) =>
              aid match {
                case 0xB5L =>
                  val f = readFloat(b, ao, al)
                  if (f.isNaN || f <= 0) false
                  else { rate = Some(math.round(f).toInt); true }
                case 0x9FL => ch = dim(ao, al); ch.isDefined
                case _ => true
              }
            }
          case _ => true
        }
      }
      if (!ok || no < 0 || tpe < 0 || codec == null) return false
      val tname = tpe match {
        case 1 => "video"
        case 2 => "audio"
        case 17 => "subtitle"
        case _ => "other"
      }
      tracks += Track(no, tname, codec, w, h, ch, rate)
      true
    }

    if (!walkChildren(b, sbody, send) { (id, off, len) =>
      id match {
        case 0x1549A966L => // Info
          walkChildren(b, off, off + len) { (iid, io, il) =>
            iid match {
              case 0x2AD7B1L =>
                if (il > 8) false else { tsScale = readUint(b, io, il); true }
              case 0x4489L =>
                val f = readFloat(b, io, il)
                if (f.isNaN || f < 0) { badFloat = true; false }
                else { durationUnits = f; sawDuration = true; true }
              case 0x4D80L =>
                muxingApp = Some(new String(b, io, il, "UTF-8")); true
              case _ => true
            }
          }
        case 0x1654AE6BL => // Tracks
          walkChildren(b, off, off + len) { (tid, to, tl) =>
            if (tid == 0xAEL) parseTrackEntry(to, tl)
            else true // Void/CRC between entries
          }
        case _ => true // Cluster/SeekHead/Cues/Void/CRC/…: stride
      }
    }) return None
    if (badFloat || tsScale <= 0) return None
    val durMs =
      if (!sawDuration) None
      else Some(math.round(durationUnits * tsScale / 1e6))
    Some(MkvMeta(docType, tsScale, durMs, muxingApp, tracks.toIndexedSeq))
  }

  /** Output schema of [[mkvTracks]]. */
  val trackSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("doc_type", StringType),
    StructField("timestamp_scale", LongType),
    StructField("duration_ms", LongType),
    StructField("muxing_app", StringType),
    StructField("track_no", LongType),
    StructField("track_type", StringType),
    StructField("codec_id", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** One row per track (file order) with the file-level fields repeated;
   * non-EBML / structurally unclean payloads contribute nothing. Narrow
   * mapPartitions — Clusters are strided, O(metadata) per row. */
  def mkvTracks(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseMkv(r.getAs[Array[Byte]](pIdx)) match {
          case Some(m) => m.tracks.iterator.map { t =>
            Row(id, m.docType, m.timestampScale,
              m.durationMs.map(Long.box).orNull, m.muxingApp.orNull,
              t.trackNo, t.trackType, t.codecId,
              t.width.map(Int.box).orNull, t.height.map(Int.box).orNull,
              t.channels.map(Int.box).orNull,
              t.sampleRate.map(Int.box).orNull)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(trackSchema))
  }

  // ---- Cues / Cluster census (m52) ------------------------------------
  //
  // The Cues element is Matroska's SEEK INDEX: CuePoint(CueTime,
  // CueTrackPositions(CueTrack, CueClusterPosition)) rows, where
  // CueClusterPosition is the target Cluster's first byte relative to
  // the SEGMENT data start. That is the random-access locator for
  // video lakes — "give me the cluster at timestamp T" is one census
  // row plus one ranged read. The census here parses the Cues, then
  // REPLAYS each locator independently: seek segment-start + position,
  // require a Cluster element there, decode its Timestamp, and report
  // agreement with the CueTime — a stale or forged index row surfaces
  // as found=0 / time_agree=0, never as a silent mis-seek.

  /** One cue row: (cueTime, cueTrack, clusterPos rel. segment data). */
  final case class Cue(time: Long, track: Long, clusterPos: Long)

  /** Parse the Cues element (strict). Returns the segment data start
   * and the cue rows in file order; None on structural malformation,
   * a CuePoint missing any of its three mandatory fields, or more
   * than one Cues element. A file WITHOUT a Cues element (live-muxed
   * stream shape) yields an empty cue list — absence, not corruption. */
  def parseMkvCues(payload: Array[Byte]): Option[(Int, IndexedSeq[Cue])] = {
    val b = payload
    if (b == null || b.length < 8) return None
    val hid = readId(b, 0, b.length)
    if (hid == null || hid._1 != 0x1A45DFA3L) return None
    val hsz = readSize(b, hid._2, b.length)
    if (hsz == null || hsz._1 < 0) return None
    val hbody = hid._2 + hsz._2
    if (hbody + hsz._1 > b.length) return None
    var docType: String = null
    if (!walkChildren(b, hbody, hbody + hsz._1.toInt) { (id, off, len) =>
      if (id == 0x4282L) docType = new String(b, off, len, "UTF-8")
      true
    }) return None
    if (docType == null) return None
    var pos = hbody + hsz._1.toInt
    val sid = readId(b, pos, b.length)
    if (sid == null || sid._1 != 0x18538067L) return None
    val ssz = readSize(b, pos + sid._2, b.length)
    if (ssz == null) return None
    val sbody = pos + sid._2 + ssz._2
    val send =
      if (ssz._1 < 0) b.length
      else {
        if (sbody + ssz._1 != b.length) return None
        sbody + ssz._1.toInt
      }
    val cues = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var sawCues = false
    var bad = false
    if (!walkChildren(b, sbody, send) { (id, off, len) =>
      if (id == 0x1C53BB6BL) { // Cues
        if (sawCues) { bad = true; false } // a second index is corruption
        else {
          sawCues = true
          walkChildren(b, off, off + len) { (cid, co, cl) =>
            if (cid == 0xBBL) { // CuePoint
              var time = -1L
              var track = -1L
              var cpos = -1L
              val ok = walkChildren(b, co, co + cl) { (pid, po, pl) =>
                pid match {
                  case 0xB3L => // CueTime
                    if (pl > 8) false else { time = readUint(b, po, pl); true }
                  case 0xB7L => // CueTrackPositions
                    walkChildren(b, po, po + pl) { (tid, to, tl) =>
                      tid match {
                        case 0xF7L =>
                          if (tl > 8) false
                          else { track = readUint(b, to, tl); true }
                        case 0xF1L =>
                          if (tl > 8) false
                          else { cpos = readUint(b, to, tl); true }
                        case _ => true
                      }
                    }
                  case _ => true
                }
              }
              if (!ok || time < 0 || track < 0 || cpos < 0) false
              else { cues += Cue(time, track, cpos); true }
            } else true // Void/CRC between cue points
          }
        }
      } else true // Cluster/Info/Tracks/…: stride
    }) return None
    if (bad) return None
    Some((sbody, cues.toIndexedSeq))
  }

  /** Replay ONE cue locator: seek `sbody + clusterPos`, require a
   * Cluster element, decode its Timestamp. (found, timestamp) —
   * found=false on anything but a clean Cluster at that exact byte. */
  def replayCueLocator(b: Array[Byte], sbody: Int,
      clusterPos: Long): (Boolean, Option[Long]) = {
    if (clusterPos < 0 || sbody.toLong + clusterPos >= b.length)
      return (false, None)
    val at = (sbody + clusterPos).toInt
    val cid = readId(b, at, b.length)
    if (cid == null || cid._1 != 0x1F43B675L) return (false, None)
    val csz = readSize(b, at + cid._2, b.length)
    if (csz == null || csz._1 < 0) return (false, None)
    val cbody = at + cid._2 + csz._2
    if (cbody + csz._1 > b.length) return (false, None)
    var ts: Option[Long] = None
    val ok = walkChildren(b, cbody, cbody + csz._1.toInt) { (id, off, len) =>
      if (id == 0xE7L) { // Timestamp
        if (len > 8) false else { ts = Some(readUint(b, off, len)); true }
      } else true // SimpleBlock/BlockGroup/…: stride
    }
    if (!ok) (false, None) else (true, ts)
  }

  /** Output schema of [[mkvCues]]. */
  val cueSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("cue_no", IntegerType),
    StructField("cue_time", LongType),
    StructField("cue_track", LongType),
    StructField("cluster_pos", LongType),
    StructField("found", IntegerType),
    StructField("time_agree", IntegerType)))

  /** One row per CuePoint (file order) with the locator replay
   * verdicts; files without a Cues element (or structurally unclean
   * files) contribute nothing. Narrow mapPartitions — the replay
   * touches only the addressed cluster's header bytes. */
  def mkvCues(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val b = r.getAs[Array[Byte]](pIdx)
        parseMkvCues(b) match {
          case Some((sbody, cues)) => cues.iterator.zipWithIndex.map {
            case (c, i) =>
              val (found, ts) = replayCueLocator(b, sbody, c.clusterPos)
              Row(id, i, c.time, c.track, c.clusterPos,
                if (found) 1 else 0,
                if (found && ts.contains(c.time)) 1 else 0)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(cueSchema))
  }

  // ---- frame extraction at cue locators (m60) -------------------------
  //
  // The m52 census proves the seek index points at real clusters;
  // this is the READ it enables: seek the cued cluster, walk its
  // SimpleBlocks, and extract the FRAMES — the m42/m49 "fetch the
  // addressed bytes" pattern for video lakes. A SimpleBlock is
  // (track vint, 2-byte BE SIGNED relative timestamp, flags, frame
  // bytes); flags bit 0x80 marks a keyframe, bits 0x06 select lacing.
  // Lacing is refused FILE-wide (a half-extracted cluster is a wrong
  // sample set, and the fixture never laces) — scope, not corruption.

  /** One extracted frame: (track, relTime, keyframe, frame bytes). */
  final case class MkvFrame(track: Long, relTime: Int, keyframe: Boolean,
      bytes: Array[Byte])

  /** Parse one SimpleBlock body; None on malformation or lacing. */
  def parseSimpleBlock(b: Array[Byte], off: Int, len: Int): Option[MkvFrame] = {
    if (len < 4) return None
    val end = off + len
    val tr = readSize(b, off, end) // track vint shares the size coding
    if (tr == null || tr._1 < 0) return None
    var p = off + tr._2 // (value, width) — advance past the vint
    if (p + 3 > end) return None
    val rel = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)).toShort.toInt
    val flags = b(p + 2) & 0xff
    p += 3
    if ((flags & 0x06) != 0) return None // laced: refused
    Some(MkvFrame(tr._1, rel, (flags & 0x80) != 0,
      java.util.Arrays.copyOfRange(b, p, end)))
  }

  /** Output schema of [[mkvFrames]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("cue_no", IntegerType),
    StructField("block_no", IntegerType),
    StructField("track", LongType),
    StructField("abs_time", LongType),
    StructField("keyframe", BooleanType),
    StructField("frame", BinaryType)))

  /** All frames of every CUED cluster: for each cue row, the locator
   * replays (cluster at that exact byte, Timestamp EQUAL to the
   * CueTime — a forged/stale cue contributes nothing for that cue),
   * then every SimpleBlock extracts with `abs_time = cluster
   * timestamp + relative time` (signedness honored). A file whose
   * cued clusters contain a laced or malformed SimpleBlock refuses
   * whole. Narrow mapPartitions — only cued clusters are touched. */
  def mkvFrames(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val b = r.getAs[Array[Byte]](pIdx)
        extractCuedFrames(b) match {
          case Some(rows) => rows.iterator.map {
            case (cueNo, blockNo, track, absTime, key, frame) =>
              Row(id, cueNo, blockNo, track, absTime, key, frame)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(frameSchema))
  }

  /** The per-file walk behind [[mkvFrames]], exposed for the spec. */
  def extractCuedFrames(b: Array[Byte]):
      Option[IndexedSeq[(Int, Int, Long, Long, Boolean, Array[Byte])]] = {
    parseMkvCues(b) match {
      case None => None
      case Some((sbody, cues)) =>
        val out = IndexedSeq.newBuilder[(Int, Int, Long, Long, Boolean,
          Array[Byte])]
        var cueNo = 0
        while (cueNo < cues.size) {
          val c = cues(cueNo)
          val (found, ts) = replayCueLocator(b, sbody, c.clusterPos)
          if (found && ts.contains(c.time)) {
            // walk the cluster's SimpleBlocks at the replayed position
            val at = (sbody + c.clusterPos).toInt
            val cid = readId(b, at, b.length)
            val csz = readSize(b, at + cid._2, b.length)
            val cbody = at + cid._2 + csz._2
            var blockNo = 0
            var badBlock = false
            walkChildren(b, cbody, cbody + csz._1.toInt) { (id, off, len) =>
              if (id == 0xA3L) { // SimpleBlock
                parseSimpleBlock(b, off, len) match {
                  case Some(f) =>
                    out += ((cueNo, blockNo, f.track, c.time + f.relTime,
                      f.keyframe, f.bytes))
                    blockNo += 1
                    true
                  case None => badBlock = true; false
                }
              } else true // Timestamp/Void/BlockGroup: stride
            }
            if (badBlock) return None // laced/malformed: file refuses
          } // forged/stale cue: zero rows for this cue, file survives
          cueNo += 1
        }
        Some(out.result())
    }
  }

  // ---- fixture writer --------------------------------------------------

  private final class W {
    val bo = new java.io.ByteArrayOutputStream()
    def id(v: Long): Unit = {
      // element IDs are written verbatim (marker bit included)
      val width =
        if (v <= 0xffL) 1 else if (v <= 0xffffL) 2
        else if (v <= 0xffffffL) 3 else 4
      var i = width - 1
      while (i >= 0) { bo.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    /** Size vint at a chosen width (non-minimal widths are legal EBML
     * and exercise the multi-byte path); width 0 picks minimal. */
    def size(v: Long, forceWidth: Int = 0): Unit = {
      var width = forceWidth
      if (width == 0) {
        width = 1
        while (width < 8 && v >= (1L << (7 * width)) - 1) width += 1
      }
      val first = (0x80 >> (width - 1)) | ((v >> (8 * (width - 1))) & (0x7f >>> (width - 1))).toInt
      bo.write(first)
      var i = width - 2
      while (i >= 0) { bo.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def unknownSize(width: Int): Unit = {
      bo.write((0x80 >> (width - 1)) | (0x7f >>> (width - 1)))
      (1 until width).foreach(_ => bo.write(0xff))
    }
    def uintEl(eid: Long, v: Long, szWidth: Int = 0): Unit = {
      var len = 1
      while (len < 8 && (v >>> (8 * len)) != 0) len += 1
      id(eid); size(len.toLong, szWidth)
      var i = len - 1
      while (i >= 0) { bo.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def strEl(eid: Long, s: String): Unit = {
      val bb = s.getBytes("UTF-8")
      id(eid); size(bb.length.toLong); bo.write(bb, 0, bb.length)
    }
    def floatEl(eid: Long, v: Double, double: Boolean): Unit = {
      id(eid)
      if (double) {
        size(8)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 7
        while (i >= 0) { bo.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      } else {
        size(4)
        val bits = java.lang.Float.floatToIntBits(v.toFloat)
        var i = 3
        while (i >= 0) { bo.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
    }
    def binEl(eid: Long, body: Array[Byte]): Unit = {
      id(eid); size(body.length.toLong); bo.write(body, 0, body.length)
    }
    def master(eid: Long, szWidth: Int = 0)(f: W => Unit): Unit = {
      val inner = new W
      f(inner)
      val body = inner.bo.toByteArray
      id(eid); size(body.length.toLong, szWidth); bo.write(body, 0, body.length)
    }
  }

  /** Deterministic Matroska/WebM fixture shared by the writer, the m30
   * oracle and the spec:
   *
   *   - EBML header with DocType `webm` (even id) / `matroska` (odd),
   *     plus version elements to stride;
   *   - Segment of KNOWN size, except `id%3 == 0` files which use the
   *     UNKNOWN (all-ones) size and run to end-of-payload — the
   *     live-muxed shape every real crawl contains;
   *   - a Void element (`id%4 == 1`) before Info;
   *   - Info: TimestampScale 1000000 written with a NON-minimal 2-byte
   *     size vint (multi-byte size path), Duration `30000 + id%10000`
   *     as 4-byte float (even id) / 8-byte double (odd), OMITTED when
   *     `id%5 == 2` (duration_ms null — absence, not corruption);
   *     MuxingApp `graft_mux <id%7>`;
   *   - Tracks: a video TrackEntry (track 1, codec `V_VP9` even /
   *     `V_MPEG4/ISO/AVC` odd, `w = 160 + (id*7)%1760`,
   *     `h = 120 + (id*3)%960`) unless `id%5 == 4` (audio-only file),
   *     then an audio TrackEntry (track 2, codec `A_OPUS` even /
   *     `A_VORBIS` odd, channels `1 + id%2`, rate 48000 even / 44100
   *     odd as 4-byte float);
   *   - two Clusters of `40 + id%60` / `30 + id%50` opaque bytes.
   */
  def syntheticMkv(id: Long): Array[Byte] = {
    val w = new W
    w.master(0x1A45DFA3L) { h =>
      h.uintEl(0x4286L, 1) // EBMLVersion
      h.uintEl(0x42F7L, 1) // EBMLReadVersion
      h.uintEl(0x42F2L, 4) // EBMLMaxIDLength
      h.uintEl(0x42F3L, 8) // EBMLMaxSizeLength
      h.strEl(0x4282L, if (id % 2 == 0) "webm" else "matroska")
      h.uintEl(0x4287L, 4) // DocTypeVersion
      h.uintEl(0x4285L, 2) // DocTypeReadVersion
    }
    val seg = new W
    if (id % 4 == 1)
      seg.binEl(0xECL, new Array[Byte]((3 + id % 10).toInt)) // Void
    seg.master(0x1549A966L) { i =>
      i.uintEl(0x2AD7B1L, 1000000L, szWidth = 2) // non-minimal size vint
      if (id % 5 != 2)
        i.floatEl(0x4489L, (30000 + id % 10000).toDouble, double = id % 2 == 1)
      i.strEl(0x4D80L, s"graft_mux ${id % 7}")
      i.strEl(0x5741L, "graft_writer")
    }
    seg.master(0x1654AE6BL) { t =>
      if (id % 5 != 4) t.master(0xAEL) { v =>
        v.uintEl(0xD7L, 1)
        v.uintEl(0x83L, 1)
        v.strEl(0x86L, if (id % 2 == 0) "V_VP9" else "V_MPEG4/ISO/AVC")
        v.master(0xE0L) { vd =>
          vd.uintEl(0xB0L, 160 + (id * 7) % 1760)
          vd.uintEl(0xBAL, 120 + (id * 3) % 960)
        }
      }
      t.master(0xAEL) { a =>
        a.uintEl(0xD7L, 2)
        a.uintEl(0x83L, 2)
        a.strEl(0x86L, if (id % 2 == 0) "A_OPUS" else "A_VORBIS")
        a.master(0xE1L) { au =>
          au.floatEl(0xB5L, if (id % 2 == 0) 48000.0 else 44100.0,
            double = false)
          au.uintEl(0x9FL, 1 + id % 2)
        }
      }
    }
    seg.binEl(0x1F43B675L,
      Array.tabulate((40 + id % 60).toInt)(j => ((id + j) & 0xff).toByte))
    seg.binEl(0x1F43B675L,
      Array.tabulate((30 + id % 50).toInt)(j => ((id * 3 + j) & 0xff).toByte))
    val segBody = seg.bo.toByteArray
    w.id(0x18538067L)
    if (id % 3 == 0) w.unknownSize(8) else w.size(segBody.length.toLong)
    w.bo.write(segBody, 0, segBody.length)
    w.bo.toByteArray
  }

  /** Executor-side Matroska fixtures — the m30 oracle replays the track
   * and info formulas. */
  def syntheticMkvs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMkv)

  /** Deterministic Matroska fixture with REAL Clusters and a Cues seek
   * index (the m52 shape — [[syntheticMkv]] keeps its opaque clusters
   * so the m30 oracle is untouched):
   *
   *   - EBML header, DocType `webm` (even id) / `matroska` (odd);
   *   - Segment (known size) holding Info, one video track,
   *     `1 + id%4` Clusters — cluster k carries Timestamp
   *     `k*1000 + id%997` and one SimpleBlock of `20 + (id+k)%30`
   *     opaque bytes — then (cues at END, the non-seekable-write
   *     layout) a Cues element with one CuePoint per cluster:
   *     CueTime = the cluster's timestamp, CueTrack 1,
   *     CueClusterPosition = the cluster's first byte relative to the
   *     segment data start;
   *   - `id%5 == 3` files have NO Cues (live-muxed shape — zero rows);
   *   - `id%9 == 7` files carry cue 0's position FORGED (+1 byte): the
   *     locator replay must report found=0/time_agree=0 for exactly
   *     that row — a stale seek index is detected, never mis-seeked.
   */
  def syntheticMkvCues(id: Long): Array[Byte] = {
    val w = new W
    w.master(0x1A45DFA3L) { h =>
      h.uintEl(0x4286L, 1)
      h.strEl(0x4282L, if (id % 2 == 0) "webm" else "matroska")
    }
    val seg = new W
    seg.master(0x1549A966L) { i =>
      i.uintEl(0x2AD7B1L, 1000000L)
      i.strEl(0x4D80L, s"graft_mux ${id % 7}")
    }
    seg.master(0x1654AE6BL) { t =>
      t.master(0xAEL) { v =>
        v.uintEl(0xD7L, 1)
        v.uintEl(0x83L, 1)
        v.strEl(0x86L, if (id % 2 == 0) "V_VP9" else "V_MPEG4/ISO/AVC")
      }
    }
    val n = (1 + id % 4).toInt
    val positions = new Array[Long](n)
    val times = new Array[Long](n)
    (0 until n).foreach { k =>
      positions(k) = seg.bo.size().toLong
      times(k) = k * 1000L + id % 997
      seg.master(0x1F43B675L) { c =>
        c.uintEl(0xE7L, times(k))
        c.binEl(0xA3L, Array.tabulate((20 + (id + k) % 30).toInt)(
          j => ((id * 7 + k * 13 + j) & 0xff).toByte))
      }
    }
    if (id % 5 != 3) {
      seg.master(0x1C53BB6BL) { cu =>
        (0 until n).foreach { k =>
          val pos = if (id % 9 == 7 && k == 0) positions(k) + 1
            else positions(k)
          cu.master(0xBBL) { cp =>
            cp.uintEl(0xB3L, times(k))
            cp.master(0xB7L) { tp =>
              tp.uintEl(0xF7L, 1L)
              tp.uintEl(0xF1L, pos)
            }
          }
        }
      }
    }
    val segBody = seg.bo.toByteArray
    w.id(0x18538067L)
    w.size(segBody.length.toLong)
    w.bo.write(segBody, 0, segBody.length)
    w.bo.toByteArray
  }

  /** Executor-side cue fixtures — the m52 oracle replays the cue
   * formulas and the forged-locator verdicts. */
  def syntheticMkvCueFiles(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMkvCues)

  /** Deterministic Matroska fixture with REAL SimpleBlocks (the m60
   * shape — [[syntheticMkvCues]] keeps its opaque blocks so the m52
   * oracle is untouched): `1 + id%4` clusters, cluster k at Timestamp
   * `k*1000 + id%997` holding `1 + (id+k)%3` SimpleBlocks; block m:
   * track 1, relative time `m*40` (MINUS 20 when `id%3 == 1` — block
   * 0 then has a NEGATIVE relative time, pinning int16 signedness),
   * keyframe iff `m == 0`, frame of `10 + (id+k+m)%20` bytes, byte
   * j = `(id*3 + k*7 + m*11 + j) & 0xff`. Cues as in m52 (CueTime =
   * cluster timestamp, one CuePoint per cluster); `id%5 == 3` files
   * have no Cues (zero rows), `id%9 == 7` files forge cue 0's
   * position (+1 — that cue extracts nothing), and `id%8 == 5` files
   * set a LACING flag bit on the LAST cluster's first block — the
   * whole file must refuse. */
  def syntheticMkvFrames(id: Long): Array[Byte] = {
    val w = new W
    w.master(0x1A45DFA3L) { h =>
      h.uintEl(0x4286L, 1)
      h.strEl(0x4282L, if (id % 2 == 0) "webm" else "matroska")
    }
    val seg = new W
    seg.master(0x1549A966L) { i =>
      i.uintEl(0x2AD7B1L, 1000000L)
      i.strEl(0x4D80L, s"graft_mux ${id % 7}")
    }
    seg.master(0x1654AE6BL) { t =>
      t.master(0xAEL) { v =>
        v.uintEl(0xD7L, 1)
        v.uintEl(0x83L, 1)
        v.strEl(0x86L, if (id % 2 == 0) "V_VP9" else "V_MPEG4/ISO/AVC")
      }
    }
    val n = (1 + id % 4).toInt
    val positions = new Array[Long](n)
    val times = new Array[Long](n)
    (0 until n).foreach { k =>
      positions(k) = seg.bo.size().toLong
      times(k) = k * 1000L + id % 997
      seg.master(0x1F43B675L) { c =>
        c.uintEl(0xE7L, times(k))
        (0 until (1 + (id + k) % 3).toInt).foreach { m =>
          val rel = m * 40 - (if (id % 3 == 1) 20 else 0)
          var flags = if (m == 0) 0x80 else 0x00
          // lacing on the LAST cluster: never the (possibly forged and
          // therefore skipped) cue-0 cluster, so the refusal always fires
          if (id % 8 == 5 && k == n - 1 && m == 0) flags |= 0x02
          val frame = Array.tabulate((10 + (id + k + m) % 20).toInt)(
            j => ((id * 3 + k * 7 + m * 11 + j) & 0xff).toByte)
          c.binEl(0xA3L, Array[Byte](0x81.toByte,
            ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
            flags.toByte) ++ frame)
        }
      }
    }
    if (id % 5 != 3) {
      seg.master(0x1C53BB6BL) { cu =>
        (0 until n).foreach { k =>
          val pos = if (id % 9 == 7 && k == 0) positions(k) + 1
            else positions(k)
          cu.master(0xBBL) { cp =>
            cp.uintEl(0xB3L, times(k))
            cp.master(0xB7L) { tp =>
              tp.uintEl(0xF7L, 1L)
              tp.uintEl(0xF1L, pos)
            }
          }
        }
      }
    }
    val segBody = seg.bo.toByteArray
    w.id(0x18538067L)
    w.size(segBody.length.toLong)
    w.bo.write(segBody, 0, segBody.length)
    w.bo.toByteArray
  }

  /** Executor-side frame fixtures — the m60 oracle replays every
   * frame byte by hex. */
  def syntheticMkvFrameFiles(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMkvFrames)
}
