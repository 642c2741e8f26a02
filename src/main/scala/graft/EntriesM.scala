package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.EntryHelpers._

/** multimodal / media (m*) conformance queries and their DuckDB oracles — split out
 * of SparkEntry by family so the registries stay reviewable (the
 * assembled maps are behavior-identical; entries were moved verbatim).
 * Shared fixtures/loaders live in [[EntryHelpers]]. */
private[graft] object EntriesM {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // WebDataset-style tar shard export (the multimodal training-export
    // container): samples shard by key hash, write as <key>.<ext> tar
    // entries (null field → no entry), manifest + verify + byte-determinism
    // + full content round trip through loadTarShards. FULL oracle on the
    // counts (recomputed by DuckDB from the same null rule) and verdict
    // flags
    // real ISO-BMFF (MP4) demux, FULL oracle: synthetic one-track MP4s
    // whose stbl tables are pure functions of doc_id; DuckDB recomputes
    // every sample's offset (cum-sum of sizes + 4-byte inter-chunk pads
    // resolved via stco), size, sync flag, duration run, and dims from
    // first principles. head/tail probe bytes prove the EXTRACTION reads
    // the true stco-resolved ranges (a naive size cum-sum that ignores
    // chunk padding reads shifted bytes and fails the probes).
    "m13_mp4_demux" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticMp4s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("keyframe"), col("dur_ticks"), col("width"), col("height"),
          expr("cast(conv(hex(substring(frame_bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    // mixed-media-lake census: magic-byte type sniffing over a column
    // that interleaves all SIXTEEN payload families (PNG/GIF/
    // progressive MP4/fragmented MP4/MP3/WAV/Ogg/FLAC/plain text/WebP/
    // TIFF/Matroska/ZIP/zstd/gzip/Avro — the r13 walkers' formats join
    // the sweep)
    // — the "what is actually in this bucket" pass a 100 TB binary
    // column gets before any decode fan-out. Narrow map, O(1) header
    // reads; exact oracle
    "m17_media_census" -> ((s, dir) => {
      import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
      val ids = t(s, dir, "documents").select("doc_id")
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val mixed = ids.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = (id % 16) match {
            case 0 => graft.functions.Multimodal.syntheticPng(16, 8, id)
            case 1 => graft.functions.Multimodal.syntheticGif(8, 8, 3, id)
            case 2 => graft.functions.Mp4.syntheticMp4(id)
            case 3 => graft.functions.Mp4.syntheticFmp4(id)
            case 4 => graft.functions.Mp3.syntheticMp3(id)
            case 5 => graft.functions.Multimodal.syntheticWav(8000, 1, 64, id)
            case 6 => graft.functions.Ogg.syntheticOgg(id)
            case 7 => graft.functions.Flac.syntheticFlac(id)
            case 8 => s"plain text payload $id".getBytes("UTF-8")
            case 9 => graft.functions.Imaging.syntheticWebp(24, 16,
              (id % 3).toInt, id)
            case 10 => graft.functions.Imaging.syntheticTiff(24, 16, 8,
              None, le = id % 2 == 0, id)
            case 11 => graft.functions.Ebml.syntheticMkv(id)
            case 12 => graft.functions.Zip.syntheticZip(id)
            case 13 => graft.functions.Zstd.syntheticZstd(id)
            case 14 => graft.functions.Gzip.syntheticGzip(id)
            case _ => graft.functions.Avro.syntheticAvro(id)
          }
          org.apache.spark.sql.Row(id, payload)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      graft.functions.Multimodal.mediaCensus(mixed, "doc_id", "payload")
        .select("doc_id", "media_type")
    }),


    // MPEG-audio frame walk conformance (the audio analog of m13): every
    // frame's offset/size/VBR-bitrate resolved from the headers alone;
    // the oracle recomputes the full frame arithmetic — per-version
    // bitrate table, padding bits, ID3v2 skip — and byte probes into the
    // frame DATA catch CBR assumptions and padding slips
    "m16_mp3_frames" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp3.mp3Frames(
        graft.functions.Mp3.syntheticMp3s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("bitrate_kbps"), col("hz"), col("n_samples"),
          expr("cast(conv(hex(substring(frame_bytes, 5, 1)), 16, 10) as int)")
            .as("data_head"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("data_tail"))
    }),


    // Ogg page-walk conformance (the container analog of m13/m16 for the
    // Vorbis/Opus share of an audio corpus): every page's offset, header
    // and body length, granule, serial, flags and completed-packet count
    // resolved from headers alone with the REAL page CRC verified; the
    // oracle recomputes the full lacing arithmetic — including packets
    // that span the 255-lacing boundary — and byte probes into the page
    // BODY catch any walk slip
    "m18_ogg_pages" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPages(
        graft.functions.Ogg.syntheticOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("page_no"), col("offset"),
          col("header_bytes"), col("body_bytes"), col("granule"),
          col("serial"), col("bos"), col("eos"), col("n_packets"),
          expr("cast(conv(hex(substring(body, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(body, cast(body_bytes as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    // Ogg PACKET reassembly conformance: logical packets rebuilt from the
    // lacing tables across page boundaries (every non-final fixture page
    // opens a packet of one or TWO 255 lacings the next page closes under
    // the continued flag — the sweep includes ≥3-segment >510-byte
    // packets and exact-510 packets ended by a terminating 0 lacing) —
    // sizes, page spans and completion order recomputed by the oracle
    // from the chained closed form, with head/tail probes into the
    // REASSEMBLED bytes spanning the page seam
    "m19_ogg_packets" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPackets(
        graft.functions.Ogg.syntheticChainedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("packet_no"), col("serial"), col("size"),
          col("n_pages"), col("end_page"),
          expr("cast(conv(hex(substring(bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    // MULTIPLEXED Ogg reassembly conformance: two serials whose pages
    // strictly interleave in file order while BOTH streams hold a packet
    // open across their page seams — per-serial partial tracking is the
    // thing under test (a shared or file-ordered buffer concatenates
    // bytes across streams); sizes, page spans, completion order and
    // seam-spanning byte probes recomputed from the muxed closed form
    "m23_ogg_muxed" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPackets(
        graft.functions.Ogg.syntheticMuxedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("packet_no"), col("serial"), col("size"),
          col("n_pages"), col("end_page"),
          expr("cast(conv(hex(substring(bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    // FLAC STREAMINFO decode: rate/channels/bits/total-samples (and the
    // derived duration) from the mandatory first metadata block, with a
    // VORBIS_COMMENT block to stride over — the lossless-audio member of
    // the typed-metadata family; bit-packed-field oracle
    "m22_flac_info" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Flac.flacInfo(
        graft.functions.Flac.syntheticFlacs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // ID3v2 text-frame extraction (title/artist/album/track) across tag
    // versions (v2.4 synchsafe / v2.3 plain / v2.2 24-bit frame sizes),
    // the three common text encodings, tag-level UNSYNCHRONISATION on
    // odd v2.2/v2.3 ids (real 0xff 0x00 stuffing through the UTF-16
    // BOMs), and a non-text PRIV/CNT frame to stride over — the
    // tag-metadata side of an audio corpus; exact string oracle
    "m21_id3_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp3.id3TextFrames(
        graft.functions.Mp3.syntheticTaggedMp3s(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // VorbisComment / OpusTags extraction (Vorbis I §5 / RFC 7845 §5.2):
    // the tag-metadata side of Ogg audio — vendor + KEY=value comments
    // decoded from the reassembled SECOND packet (the fixture's PAD
    // comment pushes it across a 255-lacing chain), the exact
    // counterpart of m21's ID3 walk; the oracle replays the comment
    // formulas, with the magic/framing variation the engine's to erase
    "m24_ogg_comments" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggComments(
        graft.functions.Ogg.syntheticCommentedOggs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // FLAC VORBIS_COMMENT extraction: the identical vendor + KEY=value
    // structure Ogg carries (m24), embedded raw inside a FLAC metadata
    // block — no magic, no framing bit — decoded by the SAME body
    // decoder; multi-block fixtures (PADDING before / APPLICATION after
    // on rotating ids) exercise the walk on both sides of the tag, and
    // id%5==4 files are tagless (absence, not corruption); exact string
    // oracle incl. a multi-byte-UTF-8 DESCRIPTION
    "m25_flac_comments" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Flac.flacComments(
        graft.functions.Flac.syntheticCommentedFlacs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // iTunes-style MP4 tag extraction (moov/udta/meta/ilst): ©-prefixed
    // 4cc keys with UTF-8 data atoms, binary trkn/covr atoms strided,
    // hdlr inside the meta FullBox strided, id%5==2 files tagless —
    // the MP4 analog of m21's ID3 walk; exact string oracle incl. the
    // 0xA9 key prefix and a multi-byte-UTF-8 comment
    "m26_mp4_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.ilstTags(
        graft.functions.Mp4.syntheticTaggedMp4s(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // RFC 3533 CHAINED bitstream (EOS→BOS reuse of one serial): the page
    // census must walk cleanly across the seam where per-link sequence
    // numbers restart at 0 — a walker that counts sequence numbers across
    // links (or rejects the restart) drops every chained .ogg; the
    // oracle replays both links' page arithmetic with byte probes
    "m27_ogg_chained" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPages(
        graft.functions.Ogg.syntheticLinkedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("page_no"), col("offset"),
          col("header_bytes"), col("body_bytes"), col("granule"),
          col("serial"), col("bos"), col("eos"), col("n_packets"),
          expr("cast(conv(hex(substring(body, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(body, cast(body_bytes as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    // RIFF LIST/INFO tag extraction (the WAV member of the tag family,
    // completing ID3/Vorbis/FLAC/ilst): odd-size chunks exercise the
    // word-alignment pad rule on both sides of the tag list; id%5==3
    // files are tagless (absence, not corruption); exact string oracle
    // incl. a multi-byte-UTF-8 ICMT
    "m28_riff_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Riff.riffInfoTags(
        graft.functions.Riff.syntheticTaggedWavs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // image HEADER census: dims/bit-depth/EXIF-orientation from raw
    // headers (JPEG SOF + APP1 TIFF IFD both endians, PNG IHDR, GIF
    // screen descriptor, BMP info header incl. top-down, WebP
    // VP8/VP8L/VP8X, TIFF IFD0 with the count-3 BitsPerSample
    // indirection) — NO pixel decode, the only affordable dims pass at
    // corpus scale; PNG/GIF legs go through the REAL ImageIO encoders
    "m29_image_meta" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Imaging.imageMeta(
        graft.functions.Imaging.syntheticImages(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // Matroska/WebM EBML walk: DocType + segment Info + per-track
    // codec/dims/audio metadata from the element tree — unknown-size
    // segments (the live-muxed shape), multi-byte and non-minimal size
    // vints, 4- and 8-byte duration floats, Clusters strided by size;
    // id%5==2 files omit Duration (null), id%5==4 are audio-only
    "m30_mkv_tracks" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ebml.mkvTracks(
        graft.functions.Ebml.syntheticMkvs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // ZIP central-directory walk: member name/method/sizes/CRC/offset
    // from EOCD + CD with exact-walk strictness, no inflation — the
    // epub/docx/jar census; the oracle replays the entry formulas incl.
    // the running local-header offsets, and the EOCD back-scan is
    // exercised by rotating ZIP comments
    "m31_zip_entries" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Zip.zipEntries(
        graft.functions.Zip.syntheticZips(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // zstd FRAME census: per-frame content size / window / dict id /
    // checksum / block count by striding 3-byte block headers — the
    // compressed-shard census with zero decompression; multi-frame
    // payloads with skippable frames, single-segment frames, 1/2/4-byte
    // dict ids and absent/4B/8B content-size fields all rotate; the
    // oracle replays the full header-size arithmetic incl. offsets
    "m32_zstd_frames" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Zstd.zstdFrames(
        graft.functions.Zstd.syntheticZstds(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // ID3v1 trailing-TAG extraction: the LEGACY 128-byte fixed-width tag
    // still carried (often exclusively) by a large share of crawled
    // MP3s — completes the MP3 tag surface next to m21's ID3v2 frames;
    // NUL- and space-padding both trimmed, v1.1 track byte decoded,
    // id%4==3 files untagged (absence); exact string oracle
    "m33_id3v1_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp3.id3v1Tags(
        graft.functions.Mp3.syntheticV1TaggedMp3s(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // gzip MEMBER walk (RFC 1952): per-member header fields + sizes with
    // CRC32/ISIZE verified against the streaming inflate — the pass that
    // locates records in .warc.gz, the format crawls actually ship. The
    // fixture's deflate streams use STORED blocks so every size is
    // closed-form; FNAME/FCOMMENT/FEXTRA/FHCRC/FTEXT all rotate and the
    // oracle replays the full header arithmetic incl. running offsets
    "m34_gzip_members" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Gzip.gzipMembers(
        graft.functions.Gzip.syntheticGzips(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // Avro OCF block census: schema/codec from the file-metadata map and
    // per-block row counts / byte sizes / offsets from block headers —
    // zero row decode, codec never touched; sync-marker continuity
    // checked on every block; fixture varints are single-byte by
    // construction so the oracle replays offsets with LENGTH() arithmetic
    "m35_avro_blocks" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Avro.avroBlocks(
        graft.functions.Avro.syntheticAvros(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // EXIF deep walk: IFD0 → Exif sub-IFD (DateTimeOriginal, pixel
    // dims) → GPS sub-IFD (lat/lon from count-3 rationals, S/W
    // negation) — the photo-provenance census (capture-time clustering,
    // geo fencing) with zero pixel decode; byte order rotates II/MM,
    // id%7==4 files have no GPS IFD (absent fields, still one row),
    // id%11==6 files have no APP1 at all (no chain — zero rows); the
    // oracle replays the decimal-degree arithmetic in the documented
    // IEEE op order, so the doubles compare EXACTLY
    "m38_exif_gps" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Imaging.exifMeta(
        graft.functions.Imaging.syntheticExifJpegs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // .warc.gz RECORD LOCATOR composition (m34 ∘ m09): the gzip member
    // walk yields (offset, comp_bytes) locator rows; each record is then
    // RE-EXTRACTED through inflateMemberAt using only its locator — the
    // Common Crawl ranged-GET access pattern, never a whole-file
    // inflate — parsed as a single WARC record, and hash-compared
    // field-by-field against the whole-file parse (`agree`); the oracle
    // replays every record field and the member ordinal from the
    // bucket/order closed form
    "m40_warcgz_locate" -> ((s, dir) => {
      val files = graft.sources.Warc.syntheticWarcGzFiles(
        t(s, dir, "documents"), "doc_id", "text", nFiles = 8)
        .localCheckpoint(true)
      val located = graft.sources.Warc.locateWarcGzRecords(
        files, "file_name", "content")
      val whole = graft.sources.Warc.parseWarc(files, "file_name", "content")
      located.select(
          expr("CAST(regexp_extract(target_uri, 'doc/(\\\\d+)$', 1) AS BIGINT)")
            .as("doc_id"),
          col("member_no"), col("warc_type"), col("content_length"),
          col("payload").cast("string").as("text"), col("target_uri"))
        .join(whole.select(col("target_uri"),
          col("warc_type").as("w_type"),
          col("content_length").as("w_len"),
          md5(col("payload")).as("w_md5")), Seq("target_uri"))
        .select(col("doc_id"), col("member_no"), col("warc_type"),
          col("content_length"), col("text"),
          (col("warc_type") === col("w_type") &&
            col("content_length") === col("w_len") &&
            md5(encode(col("text"), "UTF-8")) === col("w_md5"))
            .cast("int").as("agree"))
    }),


    // format-dispatch AGREEMENT census at gate scale (the
    // CensusAgreementSpec property promoted to a correctness family):
    // over a 16-family mixed corpus, (a) the magic-byte census must
    // sniff every payload as its constructed family, (b) the family's
    // OWN walker must accept it, and (c) a rotating FOREIGN container
    // walker (zstd/gzip/avro/mkv/parquet — all strong-magic) must
    // refuse it. A census that disagrees with the walkers makes any
    // decode fan-out scheduled from census output silently lossy.
    // Narrow map + a ≤16-key aggregate; per-format counts close in
    // doc_id%16 arithmetic
    "m41_census_agreement" -> ((s, dir) => {
      import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
      val ids = t(s, dir, "documents").select("doc_id")
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("media_type", StringType),
        StructField("own_ok", IntegerType),
        StructField("cross_refused", IntegerType)))
      val graded = ids.mapPartitions { it =>
        import graft.functions._
        it.map { r =>
          val id = r.getLong(0)
          val cls = (id % 16).toInt
          val payload = cls match {
            case 0 => Png.syntheticTextPng(id)
            case 1 => Multimodal.syntheticGif(8, 8, 3, id)
            case 2 => Mp4.syntheticMp4(id)
            case 3 => Mp4.syntheticFmp4(id)
            case 4 => Mp3.syntheticMp3(id)
            case 5 => Riff.syntheticTaggedWav(id)
            case 6 => Ogg.syntheticOgg(id)
            case 7 => Flac.syntheticCommentedFlac(id)
            case 8 => s"plain text payload $id".getBytes("UTF-8")
            case 9 => Imaging.syntheticWebp(24, 16, (id % 3).toInt, id)
            case 10 => Imaging.syntheticTiff(24, 16, 8, None,
              le = id % 2 == 0, id)
            case 11 => Ebml.syntheticMkv(id)
            case 12 => Zip.syntheticZip(id)
            case 13 => Zstd.syntheticZstd(id)
            case 14 => Gzip.syntheticGzip(id)
            case _ => Avro.syntheticAvro(id)
          }
          val ownOk = cls match {
            case 0 => Png.parseTextChunks(payload).isDefined
            case 1 | 9 | 10 => Imaging.parseImageMeta(payload).isDefined
            case 2 | 3 => Mp4.parseVideoTrack(payload).isDefined
            case 4 => Mp3.parseFrames(payload).isDefined
            case 5 => Riff.parseInfoTags(payload).isDefined
            case 6 => Ogg.parsePages(payload).isDefined
            // StreamInfo, not comments: id%5==4 fixtures carry no
            // VORBIS_COMMENT block by design (absent metadata, not
            // corruption) — the structural chain walk is the format check
            case 7 => Flac.parseStreamInfo(payload).isDefined
            case 8 => true // plain text: no walker, sniff-only family
            case 11 => Ebml.parseMkv(payload).isDefined
            case 12 => Zip.parseCentralDirectory(payload).isDefined
            case 13 => Zstd.parseFrames(payload).isDefined
            case 14 => Gzip.parseMembers(payload).isDefined
            case _ => Avro.parseOcf(payload).isDefined
          }
          // cls%5 never selects the payload's own format (zstd=13→mkv,
          // gzip=14→parquet, avro=15→zstd, mkv=11→gzip), so refusal is
          // always the correct verdict
          val crossRefused = (cls % 5) match {
            case 0 => Zstd.parseFrames(payload).isEmpty
            case 1 => Gzip.parseMembers(payload).isEmpty
            case 2 => Avro.parseOcf(payload).isEmpty
            case 3 => Ebml.parseMkv(payload).isEmpty
            case _ => ParquetFooter.parseFooter(payload).isEmpty
          }
          org.apache.spark.sql.Row(id,
            Multimodal.sniffMediaType(payload),
            if (ownOk) 1 else 0, if (crossRefused) 1 else 0)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      graded.groupBy("media_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("own_ok").cast("long").as("n_own_ok"),
          sum("cross_refused").cast("long").as("n_cross_refused"))
    }),


    // parquet FOOTER census: rows / leaf columns / row groups / writer
    // read from the FileMetaData thrift of REAL files Spark just wrote
    // (the m12 temp-dir pattern) — the walker's verdict columns compare
    // its projection against what was written, and the oracle replays
    // the closed form; the same walk is cross-checked file-by-file
    // against Spark's own reader over the sf0.001 tables in
    // ParquetFooterSpec
    "m37_parquet_footer" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val out = java.nio.file.Files.createTempDirectory("graft_m37").toString
      // the verdict is one row — materialize it eagerly so the temp dir
      // can be deleted before returning (repeated gate/bench runs used
      // to leak one dataset per invocation)
      try {
        docs.repartition(2).write.mode("overwrite").parquet(s"$out/p")
        val bin = graft.functions.Multimodal
          .loadBinaryFiles(s, s"$out/p", "*.parquet")
          .selectExpr("monotonically_increasing_id() AS doc_id", "payload")
        val footers = graft.functions.ParquetFooter.parquetFooters(
          bin, "doc_id", "payload")
        val r = footers.groupBy("doc_id", "num_rows", "n_leaf_columns", "created_by")
          .agg(sum("rg_rows").as("rg_sum"))
          .agg(
            sum("num_rows").cast("long").as("total_rows"),
            count(lit(1)).cast("long").as("n_files"),
            max("n_leaf_columns").cast("int").as("n_leaf_cols"),
            min(when(col("rg_sum") === col("num_rows"), 1)
              .otherwise(0)).cast("int").as("rows_agree"),
            min(when(col("created_by").startsWith("parquet-mr"), 1)
              .otherwise(0)).cast("int").as("writer_known"))
          .collect()(0)
        eng(s).toDF(Seq(Seq(r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getInt(4))),
          "total_rows:long,n_files:long,n_leaf_cols:int,rows_agree:int,writer_known:int")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
      }
    }),


    // parquet COLUMN-CHUNK census (the m37 walk one level deeper):
    // codec, encodings and Statistics (null_count, decoded INT64 /
    // BYTE_ARRAY min-max) per column chunk from the ColumnMetaData
    // thrift — the metadata that powers scan pruning and lake capacity
    // planning. The aggregate is SPLIT-INVARIANT (sums/mins over
    // chunks), so the oracle is closed-form no matter how Spark chunks
    // the write; per-file stats equality vs parquet-mr's own reader is
    // pinned in ParquetFooterSpec
    "m39_parquet_chunks" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 =!= 0, col("lang")).as("lang_n"))
      val out = java.nio.file.Files.createTempDirectory("graft_m39").toString
      try {
        docs.repartition(2).write.mode("overwrite").parquet(s"$out/p")
        val bin = graft.functions.Multimodal
          .loadBinaryFiles(s, s"$out/p", "*.parquet")
          .selectExpr("monotonically_increasing_id() AS doc_id", "payload")
        val rows = graft.functions.ParquetFooter
          .parquetColumnChunks(bin, "doc_id", "payload")
          .groupBy("path", "ptype")
          .agg(
            sum("n_values").cast("long").as("n_values"),
            sum("null_count").cast("long").as("nulls"),
            min("min_long").cast("long").as("min_long"),
            max("max_long").cast("long").as("max_long"),
            min("min_str").as("min_str"),
            max("max_str").as("max_str"),
            min(when(col("codec") === "snappy", 1).otherwise(0))
              .cast("int").as("codec_ok"),
            min(when(length(col("encodings")) > 0, 1).otherwise(0))
              .cast("int").as("enc_ok"),
            min(when(col("comp_bytes") > 0 && col("uncomp_bytes") > 0, 1)
              .otherwise(0)).cast("int").as("bytes_ok"))
          .collect()
        eng(s).toDF(rows.toSeq.map(r => (0 until 11).map(i => r.get(i))),
          "path:str,ptype:str,n_values:long,nulls:long,min_long:long," +
            "max_long:long,min_str:str,max_str:str,codec_ok:int," +
            "enc_ok:int,bytes_ok:int")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
      }
    }),


    // PNG textual-metadata extraction (tEXt/zTXt/iTXt) with every chunk
    // CRC verified — where image provenance strings live; zTXt/iTXt
    // decode REAL zlib streams (the oracle replays the decoded text, so
    // encoder byte choices don't matter), iTXt is strict-UTF-8 with
    // language tags; id%5==4 files are clean but textless (zero rows)
    "m36_png_text" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Png.pngTextChunks(
        graft.functions.Png.syntheticTextPngs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // typed audio metadata from the Ogg identification header (RFC 7845
    // OpusHead / Vorbis I id header): codec, channels, sample rate,
    // pre-skip decoded from the reassembled FIRST packet — the audio
    // analog of the MP4 dims; the oracle replays the header formulas
    "m20_audio_meta" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggAudioMeta(
        graft.functions.Ogg.syntheticAudioOggs(ids, "doc_id"),
        "doc_id", "payload")
    }),


    // STREAMING media demux: the m13 box walk running unchanged inside a
    // Structured Streaming query (mapPartitions is stateless-narrow, so
    // the demux composes with readStream exactly like the q61 curation
    // ops) — per-sample rows append to the sink, the per-doc census is
    // computed over the materialized table and checked against the
    // fixture's closed form. At 100 TB this is the shape of a continuous
    // video-ingest pipeline: demux at ingest, decode fan-out downstream.
    "m15_stream_demux" -> ((s, dir) => {
      val batchSchema = t(s, dir, "documents").schema
      val stream = graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "documents.parquet"))
        .select(col("doc_id"))
      val frames = graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticMp4s(stream, "doc_id"),
        "doc_id", "payload")
        .select("doc_id", "frame_no", "size", "keyframe", "dur_ticks",
          "width", "height")
      val name = "graft_m15_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(frames, name,
        outputMode = "append")
      s.table(name).groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_frames"),
        sum("keyframe").cast("long").as("n_sync"),
        sum("size").cast("long").as("total_bytes"),
        sum("dur_ticks").cast("long").as("dur_total"),
        max("width").cast("int").as("width"),
        max("height").cast("int").as("height"))
    }),


    // fragmented-MP4 (DASH/CMAF moof/tfhd/trun) demux conformance: the
    // oracle recomputes every sample's offset from the fixture's closed
    // form — explicit vs moof-relative base offsets, tfhd vs trex
    // defaults, per-sample trun rows with composition-offset stride —
    // plus head/tail byte probes that catch any resolution slip
    "m14_fmp4_demux" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticFmp4s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("keyframe"), col("dur_ticks"), col("width"), col("height"),
          expr("cast(conv(hex(substring(frame_bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),


    "m12_tar_shards" -> ((s, dir) => {
      import graft.operators.Layout
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"),
        when(col("doc_id") % 7 =!= 0, encode(col("text"), "UTF-8"))
          .as("img"))
      val out = java.nio.file.Files.createTempDirectory("graft_m12").toString
      try {
        val m1 = Layout.exportTarShards(docs, s"$out/a", "doc_id",
          Seq("text" -> "txt", "img" -> "bin"), nShards = 8)
        val m2 = Layout.exportTarShards(docs, s"$out/b", "doc_id",
          Seq("text" -> "txt", "img" -> "bin"), nShards = 8)
        val verifyOk = Layout.verifyTarShards(s, s"$out/a").isEmpty
        val back = Layout.loadTarShards(s, s"$out/a")
        val txtBack = back.filter(col("ext") === "txt")
          .select(col("key").cast("long").as("doc_id"),
            decode(col("content"), "UTF-8").as("text"))
        val roundtripOk = graft.api.DfUtils.dfEq(
          txtBack, docs.select("doc_id", "text"))
        eng(s).toDF(Seq(Seq(m1.map(_._2).sum, m1.map(_._3).sum,
          if (verifyOk) 1L else 0L, if (roundtripOk) 1L else 0L,
          if (m1 == m2) 1L else 0L)),
          "n_samples:long,n_entries:long,verify_ok:long,roundtrip_ok:long,det_ok:long")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
      }
    }),


    // ---- beyond-reference: multimodal plumbing ------------------------
    "m01_multimodal_decode" -> ((s, dir) => {
      // REAL decode conformance: deterministic PNGs with doc_id-derived
      // dims are generated on executors, decoded by the real ImageIO
      // header parse, and the DuckDB oracle recomputes the expected dims
      // from the same id formula (syntheticImages' contract)
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeImages(pngs, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),


    "m02_multimodal_ann" -> ((s, dir) => {
      // full multimodal pipeline: real PNG payload → decoded-pixel
      // luminance-grid featurizer → ANN top-3 (FP ranking → rows-only)
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      val emb = Multimodal.extractFeatures(pngs, "doc_id", "payload")
      Similarity.bruteForceTopK(emb, emb.filter(col("doc_id") < 5),
        "doc_id", "embedding", k = 3)
        .select("query_id", "rank", "neighbor_id")
    }),

    // closed-form cross-check pinning the rows-only m02 pipeline: the
    // synthetic PNG's pixel (x, y) color is (id*2654435761 + 131x + 31y)
    // & 0xffffff, so the 8×8 luminance-grid embedding the REAL
    // PNG-encode → ImageIO-decode → featurize path produces is
    // recomputable in plain SQL arithmetic; features must match
    // element-wise (≤1e-5), and the ANN stage must be internally
    // consistent (ranks exactly 1..3 per query, cosine non-increasing)
    "m02x_feature_differential" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select("doc_id")
      val pngs = Multimodal.syntheticImages(docs, "doc_id")
      val emb = Multimodal.extractFeatures(pngs, "doc_id", "payload")
      val ref = docs
        .withColumn("w", expr("CAST(8 + doc_id % 57 AS INT)"))
        .withColumn("h", expr("CAST(8 + doc_id % 31 AS INT)"))
        .withColumn("p", explode(expr("sequence(0, w * h - 1)")))
        .withColumn("x", expr("p % w"))
        .withColumn("y", expr("p DIV w"))
        .withColumn("rgb",
          expr("(doc_id * 2654435761 + x * 131 + y * 31) & 16777215"))
        .withColumn("lum", expr(
          "(299 * ((rgb DIV 65536) % 256) + 587 * ((rgb DIV 256) % 256)" +
            " + 114 * (rgb % 256)) / 1000.0"))
        // integer cell mapping mirrors luminanceGrid: (y*8 div h)*8 + x*8 div w
        .withColumn("cell", expr(
          "(CAST(y AS BIGINT) * 8 DIV h) * 8 + CAST(x AS BIGINT) * 8 DIV w"))
        .groupBy(col("doc_id"), col("cell"))
        .agg(avg(col("lum")).cast("float").as("m"))
        .groupBy("doc_id")
        .agg(expr("transform(array_sort(collect_list(struct(cell, m))), e -> e.m)")
          .as("v"))
        .withColumn("inv", expr(
          "CAST(1.0 / sqrt(aggregate(v, CAST(0 AS DOUBLE)," +
            " (acc, e) -> acc + CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS FLOAT)"))
        .select(col("doc_id"), expr("transform(v, e -> e * inv)").as("ref"))
      val featOk = emb.join(ref, "doc_id")
        .select(expr(
          "aggregate(zip_with(embedding, ref," +
            " (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))," +
            " CAST(0 AS DOUBLE), (acc, d) -> greatest(acc, d))").as("mx"))
        .agg(max(col("mx")).as("maxdiff"), count(lit(1)).as("ndocs"))
      val ann = Similarity.bruteForceTopK(emb, emb.filter(col("doc_id") < 5),
        "doc_id", "embedding", k = 3)
      val annOk = ann
        .withColumn("nxt", lead(col("cosine"), 1).over(
          Window.partitionBy(col("query_id")).orderBy(col("rank"))))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n"), min(col("rank")).as("rmin"),
          max(col("rank")).as("rmax"),
          min(when(col("nxt").isNull ||
            col("cosine") >= col("nxt") - lit(1e-9), 1).otherwise(0)).as("mono"))
        .agg(min(when(col("n") === 3 && col("rmin") === 1 &&
          col("rmax") === 3 && col("mono") === 1, 1).otherwise(0)).as("shape_ok"),
          count(lit(1)).as("nq"))
      featOk.crossJoin(annOk)
        .select((col("maxdiff") < 1e-5 && col("ndocs") > 0 &&
          col("shape_ok") === 1 && col("nq") === 5)
          .cast("bigint").as("m02_ok"))
    }),

    "m05_audio_decode" -> ((s, dir) => {
      // REAL audio decode conformance: WAV fixtures with id-derived
      // header fields, parsed by javax.sound.sampled; the oracle
      // recomputes the fields from the same formula (syntheticAudio)
      val wavs = Multimodal.syntheticAudio(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeAudioBatch(wavs, "doc_id", "payload")
        .select("doc_id", "sample_rate", "channels", "bits", "n_frames")
    }),

    "m08_binary_ingest" -> ((s, dir) => {
      // real file ingestion: fixture PNGs written as ACTUAL files on
      // executors, listed and read back through Spark's binaryFile
      // source, ids recovered from filenames, decoded by the real
      // ImageIO parse — the m01 dims oracle applies end-to-end
      val base = java.nio.file.Files.createTempDirectory("graft_m08_").toString
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      pngs.foreachPartition { it: Iterator[Row] =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(base, f"img_${r.getLong(0)}%06d.png"),
            r.getAs[Array[Byte]](1))
        }
      }
      val files = Multimodal.loadBinaryFiles(s, base, "*.png")
        .select(expr("CAST(regexp_extract(path, 'img_(\\\\d+)\\\\.png', 1) AS BIGINT)")
          .as("doc_id"), col("payload"))
      Multimodal.decodeImages(files, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),

    "m09_warc_ingest" -> ((s, dir) => {
      // WARC container ingestion: the corpus packed into 8 archive blobs
      // (records bucketed by doc_id, spec-exact headers), parsed back by
      // the per-file record parser; ids recovered from WARC-Target-URI.
      // The DuckDB oracle recomputes every field from the fixture's id
      // formula — Content-Length is payload BYTES (DuckDB strlen)
      val files = graft.sources.Warc.syntheticWarcFiles(
        t(s, dir, "documents"), "doc_id", "text", nFiles = 8)
      graft.sources.Warc.parseWarc(files, "file_name", "content")
        .select(
          expr("CAST(regexp_extract(target_uri, 'doc/(\\\\d+)$', 1) AS BIGINT)")
            .as("doc_id"),
          col("target_uri"), col("warc_type"), col("content_length"),
          col("payload").cast("string").as("text"))
    }),

    // image near-dup end-to-end (the d09 pattern for pixels): structured
    // PNGs in 10 pattern groups with per-image noise → REAL ImageIO
    // decode → dHash → pigeonhole banding → verify, cross-checked against
    // a brute-force over the same hashes (zero-signature guard mirrored).
    // Exactness differential: banding prunes, never drops, so the two
    // pair sets must be identical — and non-empty, or the query is vacuous
    "m10_image_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val pngs = Multimodal.syntheticStructuredImages(docs, "doc_id",
        nPatterns = 10, noisePixels = 4)
      val banded = Multimodal.imageNearDupPairs(pngs, "doc_id", "payload",
        maxHamming = 10, maxBucketSize = Int.MaxValue)
      val sigs = Multimodal.imageDHash(pngs, "doc_id", "payload")
        .filter(col("img_ok") && col("dhash") =!= 0L)
        .select(col("doc_id").as("id"), col("dhash").as("sig"))
        .localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 10)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute) && banded.count() > 0) 1L
        else 0L)), "image_dedup_ok:long")
    }),

    // audio near-dup differential (m10's shape for the third modality):
    // banded energy-delta fingerprint pairs must equal the brute-force
    // hash cross-join exactly, and must find the planted variant groups
    "m11_audio_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = Multimodal.syntheticEnvelopeWavs(docs, "doc_id", nGroups = 10)
      val banded = Multimodal.audioNearDupPairs(wavs, "doc_id", "payload",
        maxHamming = 6, maxBucketSize = Int.MaxValue)
      val sigs = Multimodal.audioFingerprint(wavs, "doc_id", "payload")
        .filter(col("audio_ok") && col("afp") =!= 0L)
        .select(col("doc_id").as("id"), col("afp").as("sig"))
        .localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute) && banded.count() > 0) 1L
        else 0L)), "audio_dedup_ok:long")
    }),

    "m07_audio_features" -> ((s, dir) => {
      // REAL sample-level audio decode: waveform features (RMS, zero
      // crossings, peak) computed from the PCM samples the JDK decoder
      // extracts from real WAV payloads must match features computed
      // straight from the synthetic byte formula with no container —
      // pinning that the encode→decode roundtrip is sample-transparent
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = Multimodal.syntheticAudio(docs, "doc_id")
      val feats = Multimodal.audioFeatures(wavs, "doc_id", "payload")
      val expected = Multimodal.expectedSyntheticAudioFeatures(docs, "doc_id")
      feats.join(expected, "doc_id")
        .agg(min(when(col("n_samples") === col("e_n") &&
          col("zero_crossings") === col("e_zc") &&
          col("peak") === col("e_peak") &&
          abs(col("rms") - col("e_rms")) < 1e-12, 1).otherwise(0)).as("ok"),
          count(lit(1)).as("nd"))
        .select(col("ok").cast("bigint").as("feat_ok"),
          col("nd").cast("bigint").as("n_docs"))
    }),

    "m04_multimodal_resize" -> ((s, dir) => {
      // resize → decode roundtrip: a REAL raster resample re-encoded as
      // PNG must decode to exactly the target dims on every row
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      val resized = Multimodal.resizeImages(pngs, "doc_id", "payload", 17, 11)
        .select(col("doc_id"), col("payload"))
      Multimodal.decodeImages(resized, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),

    "m06_video_demux" -> ((s, dir) => {
      // REAL container demux: animated GIFs (the one multi-frame format
      // the JDK ships a decoder for) with id-derived frame counts/dims
      // are written by the real GIF encoder, demuxed by the real ImageIO
      // multi-frame reader at stride 2; the oracle recomputes the frame
      // arithmetic from the same id formulas (syntheticVideos' contract)
      val gifs = Multimodal.syntheticVideos(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.demuxFrames(gifs, "doc_id", "payload", stride = 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_no")).as("last_frame"),
          min(col("width")).as("width"), min(col("height")).as("height"))
    }),

    "m03_frame_sampling" -> ((s, dir) => {
      // frame-sampling plumbing: payload → every 4th 64-byte window,
      // then per-frame metadata (count oracle-able per doc via SQL)
      val payloads = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(payloads, "doc_id", "payload",
        frameSize = 64, stride = 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_no")).as("last_frame"))
    }))

  val oracles: Map[String, String] = Map(

    // real-decoder oracles: syntheticImages encodes PNGs whose dims are a
    // pure function of doc_id (w = 8 + id % 57, h = 8 + id % 31, RGB);
    // DuckDB recomputes the expectation the ImageIO header parse must hit
    "m01_multimodal_decode" ->
      """SELECT doc_id, CAST(8 + doc_id % 57 AS INTEGER) AS width,
        | CAST(8 + doc_id % 31 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,

    "m08_binary_ingest" ->
      """SELECT doc_id, CAST(8 + doc_id % 57 AS INTEGER) AS width,
        | CAST(8 + doc_id % 31 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,

    "m10_image_near_dup" -> "SELECT CAST(1 AS BIGINT) AS image_dedup_ok",

    "m11_audio_near_dup" -> "SELECT CAST(1 AS BIGINT) AS audio_dedup_ok",

    "m09_warc_ingest" ->
      """SELECT doc_id,
        | concat('https://corpus.example.org/doc/', CAST(doc_id AS VARCHAR))
        |  AS target_uri,
        | 'conversion' AS warc_type,
        | CAST(strlen(coalesce(text, '')) AS BIGINT) AS content_length,
        | coalesce(text, '') AS text
        |FROM documents""".stripMargin,

    "m04_multimodal_resize" ->
      """SELECT doc_id, CAST(17 AS INTEGER) AS width,
        | CAST(11 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,

    "m05_audio_decode" ->
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS INTEGER) AS sample_rate,
        | CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        | CAST(16 AS INTEGER) AS bits,
        | CAST(100 + doc_id % 50 AS BIGINT) AS n_frames FROM documents""".stripMargin,

    // m06: frames = 2 + id % 7, demux stride 2 → sampled = ceil(frames/2),
    // last sampled index = 2*(sampled-1); dims from the same id formulas
    "m06_video_demux" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 7 AS nf FROM documents)
        |SELECT doc_id,
        | CAST(ceil(nf / 2.0) AS BIGINT) AS n_frames,
        | CAST(2 * (ceil(nf / 2.0) - 1) AS INTEGER) AS last_frame,
        | CAST(8 + doc_id % 23 AS INTEGER) AS width,
        | CAST(8 + doc_id % 13 AS INTEGER) AS height
        |FROM f""".stripMargin,

    "m03_frame_sampling" ->
      """WITH w AS (
        | SELECT doc_id, CAST(ceil(octet_length(encode(text))/64.0) AS BIGINT) AS nw
        | FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT doc_id, CAST(ceil(nw/4.0) AS BIGINT) AS n_frames,
        | CAST(4*(ceil(nw/4.0)-1) AS INTEGER) AS last_frame FROM w""".stripMargin,

    "m02x_feature_differential" -> "SELECT CAST(1 AS BIGINT) AS m02_ok",

    "m07_audio_features" ->
      """SELECT CAST(1 AS BIGINT) AS feat_ok,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs""".stripMargin,

    "m12_tar_shards" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(count(*) + sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_entries,
        | CAST(1 AS BIGINT) AS verify_ok, CAST(1 AS BIGINT) AS roundtrip_ok,
        | CAST(1 AS BIGINT) AS det_ok
        |FROM documents""".stripMargin,

    // full stbl arithmetic from first principles: sizes, 2-then-3-sample
    // chunking with 4-byte inter-chunk pads, stss sync flags, two-run
    // stts durations, tkhd dims, and the head/tail extraction probes
    "m17_media_census" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 16 AS INTEGER)
        |  WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'mp4'
        |  WHEN 3 THEN 'mp4' WHEN 4 THEN 'mp3' WHEN 5 THEN 'wav'
        |  WHEN 6 THEN 'ogg' WHEN 7 THEN 'flac' WHEN 8 THEN 'unknown'
        |  WHEN 9 THEN 'webp' WHEN 10 THEN 'tiff'
        |  WHEN 11 THEN 'matroska' WHEN 12 THEN 'zip'
        |  WHEN 13 THEN 'zstd' WHEN 14 THEN 'gzip'
        |  ELSE 'avro' END AS media_type
        |FROM documents""".stripMargin,

    // agreement is the CLAIM: every per-format count must equal its
    // own-walker-accepted and foreign-walker-refused counts — the
    // closed form is pure doc_id%16 arithmetic
    "m41_census_agreement" ->
      """WITH c AS (
        | SELECT CASE CAST(doc_id % 16 AS INTEGER)
        |  WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'mp4'
        |  WHEN 3 THEN 'mp4' WHEN 4 THEN 'mp3' WHEN 5 THEN 'wav'
        |  WHEN 6 THEN 'ogg' WHEN 7 THEN 'flac' WHEN 8 THEN 'unknown'
        |  WHEN 9 THEN 'webp' WHEN 10 THEN 'tiff'
        |  WHEN 11 THEN 'matroska' WHEN 12 THEN 'zip'
        |  WHEN 13 THEN 'zstd' WHEN 14 THEN 'gzip'
        |  ELSE 'avro' END AS media_type
        | FROM documents)
        |SELECT media_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) AS BIGINT) AS n_own_ok,
        | CAST(count(*) AS BIGINT) AS n_cross_refused
        |FROM c GROUP BY 1""".stripMargin,

    // first-principles MP3 oracle: replays Mp3.syntheticShape — MPEG-1
    // Layer III frame size is 144000·kbps // hz + pad; data starts after
    // the optional ID3v2 block (10-byte header + synchsafe size)
    "m16_mp3_frames" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 6 AS INTEGER) AS n,
        |  CAST(doc_id % 3 AS INTEGER) AS sri FROM documents),
        |f AS (SELECT doc_id, n, sri,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS i FROM d),
        |s AS (SELECT doc_id, i,
        |  CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS hz,
        |  [32,40,48,56,64,80,96,112,128,160,192,224,256,320][
        |    CAST(1 + (doc_id + 5*i) % 14 AS INTEGER)] AS kbps,
        |  CAST((doc_id + i) % 2 AS INTEGER) AS pad FROM f),
        |z AS (SELECT doc_id, i, kbps, hz,
        |  144000 * kbps // hz + pad AS size FROM s),
        |o AS (SELECT doc_id, i, kbps, hz, size,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 27 + doc_id % 23 ELSE 0 END
        |    + COALESCE(SUM(size) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS off
        | FROM z)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_no, off AS "offset",
        | CAST(size AS INTEGER) AS size, CAST(kbps AS INTEGER) AS bitrate_kbps,
        | CAST(hz AS INTEGER) AS hz, CAST(1152 AS INTEGER) AS n_samples,
        | CAST((doc_id + i*131 + 4) % 256 AS INTEGER) AS data_head,
        | CAST((doc_id + i*131 + size - 1) % 256 AS INTEGER) AS data_tail
        |FROM o""".stripMargin,

    // replay of Flac.syntheticFlac's shape formulas; duration is integer
    // millisecond floor division in both engines
    "m22_flac_info" ->
      """WITH s AS (SELECT doc_id,
        | CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |   WHEN 2 THEN 96000 ELSE 22050 END AS rate,
        | CAST(1 + doc_id % 3 AS INTEGER) AS channels,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 16 WHEN 1 THEN 24
        |   ELSE 8 END AS bits,
        | CAST(1000 + doc_id % 9999 AS BIGINT) AS total
        |FROM documents)
        |SELECT doc_id, CAST(rate AS INTEGER) AS sample_rate, channels,
        | CAST(bits AS INTEGER) AS bits_per_sample, total AS total_samples,
        | CAST(total * 1000 // rate AS BIGINT) AS duration_ms
        |FROM s""".stripMargin,

    // replay of Mp3.syntheticTaggedMp3's frame formulas — encoding and
    // frame-SIZE encoding variation is the ENGINE's to erase; decoded
    // text is encoding-independent, but v2.2 tags (doc_id%3 = 2) carry
    // the 3-char frame-id vocabulary, emitted raw
    "m21_id3_tags" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TT2' ELSE 'TIT2' END AS frame_id,
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS text
        | FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TP1' ELSE 'TPE1' END,
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TAL' ELSE 'TALB' END,
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TRK' ELSE 'TRCK' END,
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM documents""".stripMargin,

    // replay of Ogg.syntheticCommentedOgg's comment formulas (the m21
    // vocabulary re-keyed VorbisComment-style); magic/framing variation
    // between OpusTags and the Vorbis type-3 header is the engine's
    "m24_ogg_comments" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(5000 + doc_id % 100 AS BIGINT) AS serial,
        |  'graft ' || CAST(doc_id % 7 AS VARCHAR) AS vendor
        | FROM documents)
        |SELECT doc_id, serial, vendor, CAST(0 AS INTEGER) AS comment_no,
        |  'TITLE' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 1, 'ARTIST',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 2, 'ALBUM',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 3, 'TRACKNUMBER',
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 4, 'PAD',
        |  repeat('x', CAST(200 + doc_id % 200 AS INTEGER)) FROM d""".stripMargin,

    // replay of Flac.syntheticCommentedFlac's comment formulas; the
    // PADDING/APPLICATION neighbors and the missing-tag ids (doc_id%5=4)
    // are structural, so the oracle only filters and formats
    "m25_flac_comments" ->
      """WITH d AS (SELECT doc_id,
        |  'graft ' || CAST(doc_id % 7 AS VARCHAR) AS vendor
        | FROM documents WHERE doc_id % 5 <> 4)
        |SELECT doc_id, vendor, CAST(0 AS INTEGER) AS comment_no,
        |  'TITLE' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, vendor, 1, 'ARTIST',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 2, 'ALBUM',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 3, 'TRACKNUMBER',
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 4, 'DESCRIPTION',
        |  'ünïcode_' || CAST(doc_id % 10 AS VARCHAR) FROM d""".stripMargin,

    // replay of Mp4.syntheticTaggedMp4's tag formulas: the five UTF-8
    // text atoms in list order (binary trkn/covr strided by the engine);
    // keys carry the literal 0xA9 iTunes prefix (U+00A9 '©')
    "m26_mp4_tags" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 2)
        |SELECT doc_id, CAST(0 AS INTEGER) AS tag_no, '©nam' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, 1, '©ART',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 2, '©alb',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 3, '©day',
        |  CAST(1970 + doc_id % 55 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 4, '©cmt',
        |  'cömment_' || CAST(doc_id % 10 AS VARCHAR) FROM d""".stripMargin,

    // replay of Ogg.syntheticLinkedOgg's two-link page arithmetic: file
    // page_no runs across both links, offsets cumulate 28-byte headers +
    // bodies in (link, page) order, bos/eos bracket each link, and the
    // body probes derive from the per-link byte formula
    "m27_ogg_chained" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |l AS (SELECT doc_id, 0 AS lk FROM d
        |  UNION ALL SELECT doc_id, 1 FROM d),
        |lp AS (SELECT doc_id, lk,
        |  CAST(2 + (doc_id + lk) % 2 AS INTEGER) AS np FROM l),
        |p AS (SELECT doc_id, lk, np,
        |  CAST(unnest(range(0, np)) AS INTEGER) AS pg FROM lp),
        |b AS (SELECT doc_id, lk, np, pg,
        |  CAST(45 + ((doc_id*7 + lk*29 + pg*13) % 90) AS BIGINT) AS a,
        |  CAST(2 + doc_id % 2 AS INTEGER) AS np0
        | FROM p),
        |o AS (SELECT doc_id, lk, np, pg, a, np0,
        |  COALESCE(SUM(28 + a) OVER (PARTITION BY doc_id
        |    ORDER BY lk, pg ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING), 0) AS off
        | FROM b)
        |SELECT doc_id,
        | CAST(CASE WHEN lk = 0 THEN pg ELSE np0 + pg END AS INTEGER)
        |   AS page_no,
        | CAST(off AS BIGINT) AS "offset",
        | CAST(28 AS INTEGER) AS header_bytes,
        | a AS body_bytes,
        | CAST((pg + 1) * (10 + lk) AS BIGINT) AS granule,
        | CAST(4000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(CASE WHEN pg = 0 THEN 1 ELSE 0 END AS INTEGER) AS bos,
        | CAST(CASE WHEN pg = np - 1 THEN 1 ELSE 0 END AS INTEGER) AS eos,
        | CAST(1 AS INTEGER) AS n_packets,
        | CAST((doc_id + lk*37 + pg*11) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + lk*37 + pg*11 + a - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,

    // replay of Riff.syntheticTaggedWav's tag formulas; the odd-chunk
    // pads, the trailing junk chunk and the NUL terminators are
    // structural (the engine's to erase); doc_id%5=3 files are tagless
    "m28_riff_tags" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 3)
        |SELECT doc_id, CAST(0 AS INTEGER) AS tag_no, 'INAM' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, 1, 'IART',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 2, 'ICRD',
        |  CAST(1970 + doc_id % 55 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 3, 'ICMT',
        |  'cömment_' || CAST(doc_id % 10 AS VARCHAR) FROM d""".stripMargin,

    // replay of Imaging.syntheticImage's family rotation and dim
    // formulas; container encoding differences (marker walks, IFD
    // endianness, WebP variant bit packing, ImageIO's real PNG/GIF
    // encoders) are the engine's to erase
    "m29_image_meta" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 7 AS INTEGER) WHEN 0 THEN 'jpeg'
        |   WHEN 1 THEN 'jpeg' WHEN 2 THEN 'png' WHEN 3 THEN 'gif'
        |   WHEN 4 THEN 'bmp' WHEN 5 THEN 'webp' ELSE 'tiff' END AS format,
        | CAST(16 + (doc_id*7) % 240 AS INTEGER) AS width,
        | CAST(16 + (doc_id*3) % 240 AS INTEGER) AS height,
        | CAST(CASE WHEN doc_id % 7 = 0
        |     OR (doc_id % 7 = 6 AND (doc_id // 7) % 2 = 0)
        |   THEN 1 + doc_id % 8 ELSE NULL END AS INTEGER) AS orientation,
        | CAST(CASE WHEN doc_id % 7 IN (0, 1, 2, 6) THEN 8
        |   WHEN doc_id % 7 = 4 THEN
        |     CASE CAST((doc_id // 7) % 3 AS INTEGER)
        |       WHEN 0 THEN 24 WHEN 1 THEN 8 ELSE 32 END
        |   ELSE NULL END AS INTEGER) AS bit_depth
        |FROM documents""".stripMargin,

    // replay of Ebml.syntheticMkv's info and track formulas; EBML
    // encoding variation (vint widths, unknown-size segments, float
    // widths) is the engine's to erase
    "m30_mkv_tracks" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska' END
        |    AS doc_type,
        |  CAST(1000000 AS BIGINT) AS timestamp_scale,
        |  CASE WHEN doc_id % 5 = 2 THEN NULL
        |    ELSE CAST(30000 + doc_id % 10000 AS BIGINT) END AS duration_ms,
        |  'graft_mux ' || CAST(doc_id % 7 AS VARCHAR) AS muxing_app
        | FROM documents)
        |SELECT doc_id, doc_type, timestamp_scale, duration_ms, muxing_app,
        | CAST(1 AS BIGINT) AS track_no, 'video' AS track_type,
        | CASE WHEN doc_id % 2 = 0 THEN 'V_VP9'
        |   ELSE 'V_MPEG4/ISO/AVC' END AS codec_id,
        | CAST(160 + (doc_id*7) % 1760 AS INTEGER) AS width,
        | CAST(120 + (doc_id*3) % 960 AS INTEGER) AS height,
        | CAST(NULL AS INTEGER) AS channels,
        | CAST(NULL AS INTEGER) AS sample_rate
        |FROM d WHERE doc_id % 5 <> 4
        |UNION ALL
        |SELECT doc_id, doc_type, timestamp_scale, duration_ms, muxing_app,
        | 2, 'audio',
        | CASE WHEN doc_id % 2 = 0 THEN 'A_OPUS' ELSE 'A_VORBIS' END,
        | NULL, NULL, CAST(1 + doc_id % 2 AS INTEGER),
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 48000 ELSE 44100 END AS INTEGER)
        |FROM d""".stripMargin,

    // replay of Zip.syntheticZip's entry formulas; local_offset is the
    // running sum of 30-byte local headers + name + data, and the crc
    // field replay proves extraction (nothing decompresses, so the crc
    // is a stored field, not a recomputation)
    "m31_zip_entries" ->
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INTEGER) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, CAST(unnest(range(0, n)) AS INTEGER) AS j
        |  FROM d),
        |s AS (SELECT doc_id, j,
        |  'f' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)
        |    || '.txt' AS name,
        |  CASE WHEN j % 2 = 0 THEN 'stored' ELSE 'deflated' END AS method,
        |  CAST(CASE WHEN j % 2 = 0 THEN 20 + (doc_id + j) % 30
        |       ELSE 10 + (doc_id + j * 7) % 40 END AS BIGINT) AS comp_size,
        |  CAST(CASE WHEN j % 2 = 0 THEN 20 + (doc_id + j) % 30
        |       ELSE 50 + (doc_id * 3 + j) % 100 END AS BIGINT)
        |    AS uncomp_size,
        |  CAST((doc_id * 2654435761 + j * 40503) % 4294967296 AS BIGINT)
        |    AS crc32
        | FROM e)
        |SELECT doc_id, j AS entry_no, name, method, comp_size,
        |  uncomp_size, crc32,
        |  CAST(COALESCE(SUM(30 + length(name) + comp_size) OVER (
        |    PARTITION BY doc_id ORDER BY j
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS local_offset,
        |  CAST(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS INTEGER)
        |    AS zip64
        |FROM s""".stripMargin,

    // replay of Zstd.syntheticZstd's frame formulas: per-frame header
    // byte accounting (magic + descriptor + window + dict + fcs +
    // per-block 3-byte headers + checksum) drives the offset cumsum,
    // so any stride slip in the walk shifts every later offset
    "m32_zstd_frames" ->
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INTEGER) AS n,
        |   (doc_id % 4 = 1) AS skip FROM documents),
        |zf AS (SELECT doc_id, n, skip,
        |   CAST(unnest(range(0, n)) AS INTEGER) AS f FROM d),
        |z AS (SELECT doc_id, n, skip, f,
        |   CAST(1 + (doc_id + f) % 2 AS INTEGER) AS nb,
        |   ((doc_id + f) % 5 = 0) AS ss,
        |   CAST((doc_id + f) % 4 AS INTEGER) AS dictflag,
        |   ((doc_id + f) % 3 = 0) AS cksum,
        |   CAST((doc_id + f) % 3 AS INTEGER) AS fcssel,
        |   CAST((doc_id + f) % 10 AS INTEGER) AS exp,
        |   CAST((doc_id * 3 + f) % 8 AS INTEGER) AS man
        | FROM zf),
        |zb AS (SELECT *,
        |   CAST(CASE WHEN (doc_id + f) % 2 = 0
        |        THEN 10 + (doc_id*3 + f*7) % 30
        |        ELSE 5 + (doc_id + f) % 20 END AS BIGINT) AS r0,
        |   CAST(CASE WHEN nb = 2 THEN 10 + (doc_id*3 + f*7 + 1) % 30
        |     ELSE 0 END AS BIGINT) AS r1
        | FROM z),
        |zc AS (SELECT *, r0 + r1 AS total,
        |   (3 + CASE WHEN (doc_id + f) % 2 = 0 THEN r0 ELSE 1 END)
        |   + CASE WHEN nb = 2 THEN 3 + r1 ELSE 0 END AS blockbytes,
        |   CASE WHEN dictflag = 0 THEN 0 WHEN dictflag = 1 THEN 1
        |        WHEN dictflag = 2 THEN 2 ELSE 4 END AS dictlen,
        |   CASE WHEN ss THEN 1 WHEN fcssel = 0 THEN 0
        |        WHEN fcssel = 1 THEN 4 ELSE 8 END AS fcslen
        | FROM zb),
        |zd AS (SELECT doc_id, f, skip, nb, ss, cksum, exp, man,
        |   dictflag, total,
        |   CAST(4 + 1 + CASE WHEN ss THEN 0 ELSE 1 END + dictlen + fcslen
        |     + blockbytes + CASE WHEN cksum THEN 4 ELSE 0 END AS BIGINT)
        |     AS fbytes,
        |   CASE WHEN ss OR fcssel <> 0 THEN total ELSE NULL END
        |     AS content_size,
        |   CASE WHEN ss THEN NULL ELSE (CAST(1 AS BIGINT) << (10 + exp))
        |     + ((CAST(1 AS BIGINT) << (10 + exp)) // 8) * man END
        |     AS window_size,
        |   CASE WHEN dictflag = 0 THEN NULL
        |        WHEN dictflag = 1 THEN 1 + doc_id % 200
        |        WHEN dictflag = 2 THEN 300 + doc_id % 60000
        |        ELSE 70000 + doc_id % 100000 END AS dict_id
        | FROM zc),
        |allf AS (
        |  SELECT doc_id, CAST(f + CASE WHEN skip AND f >= 1 THEN 1
        |      ELSE 0 END AS INTEGER) AS frame_no,
        |    'zstd' AS kind, fbytes AS frame_bytes, content_size,
        |    window_size, dict_id,
        |    CASE WHEN cksum THEN 1 ELSE 0 END AS has_checksum,
        |    nb AS n_blocks
        |  FROM zd
        |  UNION ALL
        |  SELECT doc_id, 1, 'skippable', CAST(16 + doc_id % 16 AS BIGINT),
        |    NULL, NULL, NULL, 0, 0
        |  FROM d WHERE skip
        |)
        |SELECT doc_id, frame_no, kind,
        |  CAST(COALESCE(SUM(frame_bytes) OVER (PARTITION BY doc_id
        |    ORDER BY frame_no
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset",
        |  CAST(frame_bytes AS BIGINT) AS frame_bytes,
        |  CAST(content_size AS BIGINT) AS content_size,
        |  CAST(window_size AS BIGINT) AS window_size,
        |  CAST(dict_id AS BIGINT) AS dict_id,
        |  CAST(has_checksum AS INTEGER) AS has_checksum,
        |  CAST(n_blocks AS INTEGER) AS n_blocks
        |FROM allf""".stripMargin,

    // replay of Mp3.syntheticV1TaggedMp3's field formulas; the fixed-
    // width padding (NUL for most fields, space for artist) is the
    // engine's to trim; v1.1 ids (doc_id%3=0) carry the track byte
    "m33_id3v1_tags" ->
      """SELECT doc_id,
        | 'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS title,
        | 'artist_' || CAST(doc_id % 50 AS VARCHAR) AS artist,
        | 'album_' || CAST(doc_id % 20 AS VARCHAR) AS album,
        | CAST(1970 + doc_id % 55 AS VARCHAR) AS "year",
        | 'c_' || CAST(doc_id % 100 AS VARCHAR) AS comment,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 30
        |      ELSE NULL END AS INTEGER) AS track,
        | CAST(doc_id % 80 AS INTEGER) AS genre
        |FROM documents WHERE doc_id % 4 <> 3""".stripMargin,

    // first-principles replay of Gzip.syntheticGzip's member arithmetic:
    // stored-block deflate makes comp = ceil(len/40)*5 + len exact;
    // header = 10 + extra(2+xlen) + fname(9) + comment(4) + hcrc(2);
    // offsets are the running member-size sum
    "m34_gzip_members" ->
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INTEGER) AS n
        |  FROM documents),
        |m AS (SELECT doc_id, n, CAST(unnest(range(0, n)) AS INTEGER) AS mm
        |  FROM d),
        |f AS (SELECT doc_id, mm,
        |   CAST(30 + (doc_id*3 + mm*11) % 70 AS BIGINT) AS len,
        |   ((doc_id + mm) % 2 = 0) AS has_name,
        |   ((doc_id + mm) % 5 = 1) AS has_comment,
        |   ((doc_id + mm) % 3 = 0) AS has_extra,
        |   ((doc_id + mm) % 4 = 2) AS has_hcrc,
        |   CASE WHEN (doc_id + mm) % 7 = 3 THEN 1 ELSE 0 END AS ftext,
        |   CAST(4 + (doc_id + mm) % 10 AS BIGINT) AS xlen
        |  FROM m),
        |g AS (SELECT doc_id, mm, len, ftext,
        |   CASE WHEN has_name THEN 'f' || CAST(doc_id % 10 AS VARCHAR)
        |     || '_' || CAST(mm AS VARCHAR) || '.txt' END AS fname,
        |   CASE WHEN has_comment
        |     THEN 'gc' || CAST(doc_id % 10 AS VARCHAR) END AS comment,
        |   10 + CASE WHEN has_extra THEN 2 + xlen ELSE 0 END
        |     + CASE WHEN has_name THEN 9 ELSE 0 END
        |     + CASE WHEN has_comment THEN 4 ELSE 0 END
        |     + CASE WHEN has_hcrc THEN 2 ELSE 0 END
        |     + CAST(CEIL(len / 40.0) AS BIGINT) * 5 + len + 8 AS mbytes
        |  FROM f)
        |SELECT doc_id, CAST(mm AS INTEGER) AS member_no,
        |  CAST(COALESCE(SUM(mbytes) OVER (PARTITION BY doc_id ORDER BY mm
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset",
        |  CAST(mbytes AS BIGINT) AS comp_bytes,
        |  CAST(len AS BIGINT) AS uncomp_bytes,
        |  fname, comment,
        |  CAST((doc_id*1000 + mm) % 4294967296 AS BIGINT) AS mtime,
        |  CAST((doc_id + mm) % 14 AS INTEGER) AS os,
        |  CAST(ftext AS INTEGER) AS ftext
        |FROM g""".stripMargin,

    // replay of Avro.syntheticAvro: single-byte varints by construction,
    // so header/offset arithmetic is LENGTH()-exact; blocks carry
    // formula row counts and byte sizes with a 16-byte sync each
    "m35_avro_blocks" ->
      """WITH d AS (SELECT doc_id,
        |   CAST(1 + doc_id % 4 AS INTEGER) AS n,
        |   '{"type":"record","name":"r' || CAST(doc_id % 10 AS VARCHAR)
        |     || '","fields":[]}' AS schema_json,
        |   CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'null'
        |     WHEN 1 THEN 'deflate' ELSE 'snappy' END AS codec,
        |   (doc_id % 4 = 1) AS extra
        |  FROM documents),
        |h AS (SELECT doc_id, n, schema_json, codec,
        |   4 + 1 + (1 + 11 + 1 + LENGTH(schema_json))
        |     + (1 + 10 + 1 + LENGTH(codec))
        |     + CASE WHEN extra THEN 1 + 6 + 1 + 2 ELSE 0 END
        |     + 1 + 16 AS header_len
        |  FROM d),
        |b AS (SELECT doc_id, schema_json, codec, header_len,
        |   CAST(unnest(range(0, n)) AS INTEGER) AS k
        |  FROM h),
        |c AS (SELECT doc_id, schema_json, codec, header_len, k,
        |   CAST(1 + (doc_id + k*3) % 30 AS BIGINT) AS n_rows,
        |   CAST(10 + (doc_id*5 + k*7) % 50 AS BIGINT) AS bbytes
        |  FROM b)
        |SELECT doc_id, CAST(k AS INTEGER) AS block_no,
        |  schema_json, codec,
        |  CAST(header_len + COALESCE(SUM(2 + bbytes + 16) OVER (
        |    PARTITION BY doc_id ORDER BY k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset",
        |  n_rows, CAST(bbytes AS BIGINT) AS block_bytes
        |FROM c""".stripMargin,

    // replay of Imaging.syntheticExifJpeg: the datetime string
    // formula and the lat/lon decimal-degree arithmetic in the SAME
    // IEEE op order as the parser (deg + min/60.0 + (sec100/100.0)
    // /3600.0, then sign) — doubles compare exactly
    "m38_exif_gps" ->
      """SELECT doc_id,
        | CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
        | '20' || CAST(10 + doc_id % 30 AS VARCHAR) || ':0'
        |   || CAST(1 + doc_id % 9 AS VARCHAR) || ':'
        |   || CAST(10 + doc_id % 19 AS VARCHAR) || ' 0'
        |   || CAST(doc_id % 10 AS VARCHAR) || ':5'
        |   || CAST(doc_id % 10 AS VARCHAR) || ':3'
        |   || CAST(doc_id % 6 AS VARCHAR) AS dt_original,
        | CAST(640 + doc_id % 1280 AS BIGINT) AS pixel_x,
        | CAST(480 + doc_id % 960 AS BIGINT) AS pixel_y,
        | CASE WHEN doc_id % 7 = 4 THEN NULL ELSE
        |   (CASE WHEN doc_id % 3 = 0 THEN -1.0 ELSE 1.0 END) *
        |   ((doc_id % 90) + (doc_id % 60) / 60.0
        |     + ((doc_id * 37 % 6000) / 100.0) / 3600.0)
        | END AS lat,
        | CASE WHEN doc_id % 7 = 4 THEN NULL ELSE
        |   (CASE WHEN doc_id % 5 < 2 THEN -1.0 ELSE 1.0 END) *
        |   ((doc_id % 180) + (doc_id * 3 % 60) / 60.0
        |     + ((doc_id * 53 % 6000) / 100.0) / 3600.0)
        | END AS lon,
        | CAST(CASE WHEN doc_id % 6 = 1 THEN 1 ELSE 0 END AS INTEGER)
        |   AS has_thumbnail
        |FROM documents WHERE doc_id % 11 <> 6""".stripMargin,

    // closed-form replay of the m37 write: Spark wrote count(documents)
    // rows into 2 files of 3 leaf columns; the verdict columns assert
    // the walker's internal consistency (rg sums, known writer)
    "m37_parquet_footer" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        | CAST(2 AS BIGINT) AS n_files,
        | CAST(3 AS INTEGER) AS n_leaf_cols,
        | CAST(1 AS INTEGER) AS rows_agree,
        | CAST(1 AS INTEGER) AS writer_known
        |FROM documents""".stripMargin,

    // replay of the m40 record fields (the m09 closed form) plus the
    // member ordinal: records are bucketed by doc_id%8 and ordered by
    // doc_id within a file, one gzip member per record; `agree` asserts
    // the random-access extraction byte-matches the whole-file parse
    "m40_warcgz_locate" ->
      """SELECT doc_id,
        | CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |   - 1 AS INTEGER) AS member_no,
        | 'conversion' AS warc_type,
        | CAST(strlen(coalesce(text, '')) AS BIGINT) AS content_length,
        | coalesce(text, '') AS text,
        | CAST(1 AS INTEGER) AS agree
        |FROM documents""".stripMargin,

    // split-invariant closed form of the m39 chunk census: whatever the
    // file/row-group chunking, value counts and null counts SUM to the
    // table totals and the chunk min/max envelopes equal the column
    // min/max; doc_id is INT64, lang_n BYTE_ARRAY with nulls planted at
    // doc_id%7=0
    "m39_parquet_chunks" ->
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(doc_id) AS BIGINT) AS mn,
        |  CAST(max(doc_id) AS BIGINT) AS mx,
        |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nnull,
        |  min(CASE WHEN doc_id % 7 <> 0 THEN lang END) AS lmin,
        |  max(CASE WHEN doc_id % 7 <> 0 THEN lang END) AS lmax
        | FROM documents)
        |SELECT 'doc_id' AS path, 'int64' AS ptype, cnt AS n_values,
        |  CAST(0 AS BIGINT) AS nulls, mn AS min_long, mx AS max_long,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |  CAST(1 AS INTEGER) AS codec_ok, CAST(1 AS INTEGER) AS enc_ok,
        |  CAST(1 AS INTEGER) AS bytes_ok
        |FROM s
        |UNION ALL
        |SELECT 'lang_n', 'byte_array', cnt, nnull,
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), lmin, lmax, 1, 1, 1
        |FROM s""".stripMargin,

    // replay of Png.syntheticTextPng's text-chunk formulas: tEXt Title
    // always (for tagged ids), zTXt Description unless id%4==2, iTXt
    // Comment with per-parity language; chunk_no counts TEXT chunks
    // only (sRGB/IDAT are strided); id%5==4 files are textless
    "m36_png_text" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 4),
        |rows_ AS (
        |  SELECT doc_id, 0 AS chunk_no, 'text' AS kind,
        |    'Title' AS keyword, CAST(NULL AS VARCHAR) AS lang,
        |    'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS text
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, 1, 'ztxt', 'Description', NULL,
        |    'desc_' || CAST(doc_id % 100 AS VARCHAR)
        |  FROM d WHERE doc_id % 4 <> 2
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 <> 2 THEN 2 ELSE 1 END, 'itxt', 'Comment',
        |    CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de-DE' END,
        |    'cömment_' || CAST(doc_id % 50 AS VARCHAR)
        |  FROM d)
        |SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no, kind,
        |  keyword, lang, text
        |FROM rows_""".stripMargin,

    // replay of Ogg.syntheticAudioOgg's header formulas: even ids Opus,
    // odd ids Vorbis, per-codec channel/rate/preskip derivations
    "m20_audio_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
        | CAST(1 + (doc_id // 2) % 2 AS INTEGER) AS channels,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 48000
        |      WHEN 1 THEN 24000 ELSE 16000 END
        |   ELSE
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 44100
        |      WHEN 1 THEN 32000 ELSE 22050 END
        |   END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 312 + doc_id % 100
        |   ELSE 0 END AS INTEGER) AS preskip
        |FROM documents""".stripMargin,

    // first-principles chained-Ogg packet oracle: replays
    // Ogg.syntheticChainedShape — shorts A(p) are packet 2p (1 page),
    // longs L(p) = open(p)·255-opening + rem(p)-closing are packet 2p+1
    // (2 pages, ending on page p+1), where open(p) = 1 + (id+p)%2 and
    // rem(p) is 0 on the exact-510 shape (open 2, (id+p)%5 = 0 — the
    // terminating-0 lacing) and 40 + ((id*5+p*7)%200) otherwise;
    // head/tail probe bytes derive from the page body formulas on either
    // side of the seam — a rem-0 long's LAST byte sits on the OPENING
    // page, not the closing one
    "m19_ogg_packets" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 4 AS INTEGER) AS np
        |  FROM documents),
        |p AS (SELECT doc_id, np, CAST(unnest(range(0, np)) AS INTEGER) AS pg
        |  FROM d),
        |base AS (SELECT doc_id, np, pg,
        |  CAST(60 + ((doc_id*11 + pg*17) % 90) AS BIGINT) AS a,
        |  CAST(1 + (doc_id + pg) % 2 AS BIGINT) AS opn,
        |  CAST(CASE WHEN (doc_id + pg) % 10 = 5 THEN 0
        |    ELSE 40 + ((doc_id*5 + pg*7) % 200) END AS BIGINT) AS r,
        |  CAST(CASE WHEN pg = 0 THEN 0
        |    WHEN (doc_id + pg - 1) % 10 = 5 THEN 0
        |    ELSE 40 + ((doc_id*5 + (pg-1)*7) % 200) END AS BIGINT) AS rprev
        | FROM p),
        |shorts AS (SELECT doc_id, CAST(2*pg AS INTEGER) AS packet_no,
        |  a AS psize, 1 AS n_pages, pg AS end_page,
        |  (doc_id + pg*131 + rprev) % 256 AS head_byte,
        |  (doc_id + pg*131 + rprev + a - 1) % 256 AS tail_byte FROM base),
        |longs AS (SELECT doc_id, CAST(2*pg + 1 AS INTEGER) AS packet_no,
        |  255*opn + r AS psize, 2 AS n_pages, pg + 1 AS end_page,
        |  (doc_id + pg*131 + rprev + a) % 256 AS head_byte,
        |  CASE WHEN r > 0 THEN (doc_id + (pg+1)*131 + r - 1) % 256
        |    ELSE (doc_id + pg*131 + rprev + a + 255*opn - 1) % 256
        |  END AS tail_byte
        | FROM base WHERE pg < np - 1)
        |SELECT doc_id, packet_no,
        | CAST(2000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(psize AS BIGINT) AS size,
        | CAST(n_pages AS INTEGER) AS n_pages,
        | CAST(end_page AS INTEGER) AS end_page,
        | CAST(head_byte AS INTEGER) AS head_byte,
        | CAST(tail_byte AS INTEGER) AS tail_byte
        |FROM (SELECT * FROM shorts UNION ALL SELECT * FROM longs)""".stripMargin,

    // first-principles muxed-Ogg oracle: replays Ogg.syntheticMuxedShape —
    // file page q = 2p+s (stream s, stream-page p); page 0/1 complete
    // the first shorts (packets 0/1), every later page q completes the
    // stream's long L_s(p-1) (packet 2q−2, spanning 2 stream pages) then
    // its short A_s(p) (packet 2q−1); body probes use the FILE page
    // number, so bytes wrongly pulled from the other stream's interleaved
    // page hash differently
    "m23_ogg_muxed" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS n
        |  FROM documents),
        |ds AS (SELECT doc_id, n, 0 AS s FROM d
        |  UNION ALL SELECT doc_id, n, 1 AS s FROM d),
        |sp AS (SELECT doc_id, n, s,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS pg
        | FROM ds),
        |base AS (SELECT doc_id, n, s, pg, 2*pg + s AS q,
        |  CAST(CASE WHEN s = 0 THEN 50 + ((doc_id*7 + pg*13) % 80)
        |    ELSE 55 + ((doc_id*9 + pg*19) % 70) END AS BIGINT) AS a,
        |  CAST(CASE WHEN s = 0 THEN 30 + ((doc_id*3 + pg*11) % 100)
        |    ELSE 35 + ((doc_id*13 + pg*5) % 90) END AS BIGINT) AS r,
        |  CAST(CASE WHEN pg = 0 THEN 0
        |    WHEN s = 0 THEN 30 + ((doc_id*3 + (pg-1)*11) % 100)
        |    ELSE 35 + ((doc_id*13 + (pg-1)*5) % 90) END AS BIGINT) AS rprev
        | FROM sp),
        |shorts AS (SELECT doc_id, s,
        |  CASE WHEN q < 2 THEN q ELSE 2*q - 1 END AS packet_no,
        |  a AS psize, 1 AS n_pages, q AS end_page,
        |  (doc_id + q*131 + rprev) % 256 AS head_byte,
        |  (doc_id + q*131 + rprev + a - 1) % 256 AS tail_byte FROM base),
        |longs AS (SELECT doc_id, s,
        |  2*(q + 2) - 2 AS packet_no,
        |  255 + r AS psize, 2 AS n_pages, q + 2 AS end_page,
        |  (doc_id + q*131 + rprev + a) % 256 AS head_byte,
        |  (doc_id + (q + 2)*131 + r - 1) % 256 AS tail_byte
        | FROM base WHERE pg < n - 1)
        |SELECT doc_id, CAST(packet_no AS INTEGER) AS packet_no,
        | CAST(4000 + 100*s + doc_id % 100 AS BIGINT) AS serial,
        | CAST(psize AS BIGINT) AS size,
        | CAST(n_pages AS INTEGER) AS n_pages,
        | CAST(end_page AS INTEGER) AS end_page,
        | CAST(head_byte AS INTEGER) AS head_byte,
        | CAST(tail_byte AS INTEGER) AS tail_byte
        |FROM (SELECT * FROM shorts UNION ALL SELECT * FROM longs)""".stripMargin,

    // first-principles Ogg oracle: replays Ogg.syntheticShape — header is
    // 27 + n_segments where each packet contributes 1 lacing below 255
    // and 2 at/above; offsets accumulate page-by-page
    "m18_ogg_pages" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 5 AS INTEGER) AS np
        |  FROM documents),
        |p AS (SELECT doc_id, np, CAST(unnest(range(0, np)) AS INTEGER) AS pg
        |  FROM d),
        |k AS (SELECT doc_id, np, pg,
        |  CAST(1 + (doc_id + pg) % 3 AS INTEGER) AS nk FROM p),
        |pk AS (SELECT doc_id, np, pg, nk,
        |  CAST(unnest(range(0, nk)) AS INTEGER) AS kk FROM k),
        |sz AS (SELECT doc_id, np, pg, kk,
        |  CAST(50 + ((doc_id*31 + pg*17 + kk*7) % 230) AS BIGINT) AS psz
        | FROM pk),
        |pagg AS (SELECT doc_id, np, pg,
        |  CAST(count(*) AS INTEGER) AS n_packets,
        |  sum(psz) AS body,
        |  sum(1 + CASE WHEN psz >= 255 THEN 1 ELSE 0 END) AS nseg
        | FROM sz GROUP BY doc_id, np, pg),
        |o AS (SELECT doc_id, np, pg, n_packets, body, 27 + nseg AS hdr,
        |  COALESCE(SUM(27 + nseg + body) OVER (PARTITION BY doc_id
        |    ORDER BY pg ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS off
        | FROM pagg)
        |SELECT doc_id, CAST(pg AS INTEGER) AS page_no,
        | CAST(off AS BIGINT) AS "offset",
        | CAST(hdr AS INTEGER) AS header_bytes,
        | CAST(body AS BIGINT) AS body_bytes,
        | CAST((pg+1) * (100 + doc_id % 50) AS BIGINT) AS granule,
        | CAST(1000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(CASE WHEN pg = 0 THEN 1 ELSE 0 END AS INTEGER) AS bos,
        | CAST(CASE WHEN pg = np - 1 THEN 1 ELSE 0 END AS INTEGER) AS eos,
        | n_packets,
        | CAST((doc_id + pg*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + pg*131 + body - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,

    // per-doc demux census from the m13 fixture's closed form — the
    // streaming path must land exactly the batch walk's sample rows
    "m15_stream_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 7 AS INTEGER) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, n, CAST(unnest(range(0, n)) AS INTEGER) AS i
        |  FROM d),
        |s AS (SELECT doc_id, n, i,
        |  CAST(50 + ((doc_id*31 + i*17) % 64) AS BIGINT) AS size,
        |  CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END AS kf,
        |  CAST(CASE WHEN i < n // 2 THEN 1000 + (doc_id % 5)*100
        |    ELSE 1200 END AS BIGINT) AS dur
        | FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        | CAST(sum(kf) AS BIGINT) AS n_sync,
        | CAST(sum(size) AS BIGINT) AS total_bytes,
        | CAST(sum(dur) AS BIGINT) AS dur_total,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS height
        |FROM s GROUP BY doc_id""".stripMargin,

    // first-principles fMP4 oracle: replays the fixture's closed-form
    // layout (Mp4.syntheticFmp4Shape). 641 = ftyp(20) + moov(577:
    // fixed-size init section with empty stbl + mvex/trex) + sidx(44) —
    // constants of the fixed-layout init segment, pinned by the writer's
    // own require() and by Mp4Spec. Fragment f: moof(72+4k | 112 |
    // 108+16k two-traf / 68+16k single by scheme f%3, k>=2) + mdat(8 + Σ
    // sizes); sample offsets accumulate inside the fragment (scheme C's
    // second traf continues on the implicit end-of-previous-traf base,
    // so the split moves no bytes); frame_no is the running index.
    "m14_fmp4_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS nf
        |  FROM documents),
        |fr AS (SELECT doc_id, CAST(unnest(range(0, nf)) AS INTEGER) AS f
        |  FROM d),
        |fk AS (SELECT doc_id, f,
        |  CAST(1 + (doc_id + f) % 4 AS INTEGER) AS k FROM fr),
        |sm AS (SELECT doc_id, f, k,
        |  CAST(unnest(range(0, k)) AS INTEGER) AS i FROM fk),
        |sz AS (SELECT doc_id, f, k, i,
        |  CAST(CASE WHEN f % 3 = 1 THEN 40 + ((doc_id*37 + f*19) % 50)
        |    ELSE 40 + ((doc_id*37 + f*19 + i*13) % 50) END AS BIGINT)
        |   AS size FROM sm),
        |fragagg AS (SELECT doc_id, f, k,
        |  CAST(CASE f % 3 WHEN 0 THEN 72 + 4*k WHEN 1 THEN 112
        |    ELSE CASE WHEN k >= 2 THEN 108 + 16*k
        |      ELSE 68 + 16*k END END AS BIGINT) AS moof_size,
        |  sum(size) AS mdat_payload
        | FROM sz GROUP BY doc_id, f, k),
        |fragpos AS (SELECT doc_id, f, moof_size,
        |  641 + COALESCE(SUM(moof_size + 8 + mdat_payload) OVER (
        |    PARTITION BY doc_id ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS frag_start,
        |  COALESCE(SUM(k) OVER (PARTITION BY doc_id ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS idx_base
        | FROM fragagg),
        |o AS (SELECT sz.doc_id, sz.f, sz.i, sz.size,
        |  p.frag_start + p.moof_size + 8 + COALESCE(SUM(sz.size) OVER (
        |    PARTITION BY sz.doc_id, sz.f ORDER BY sz.i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS off,
        |  p.idx_base + sz.i AS gi
        | FROM sz JOIN fragpos p ON sz.doc_id = p.doc_id AND sz.f = p.f)
        |SELECT doc_id, CAST(gi AS INTEGER) AS frame_no,
        | CAST(off AS BIGINT) AS "offset", size,
        | CAST(CASE WHEN f % 3 = 2
        |   THEN CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END
        |   ELSE CASE WHEN i = 0 THEN 1 ELSE 0 END END AS INTEGER)
        |  AS keyframe,
        | CAST(CASE f % 3 WHEN 0 THEN 800
        |   WHEN 1 THEN 900 + ((doc_id + 7*f) % 5)*50
        |   ELSE 900 + ((doc_id + 7*f + 3*i) % 5)*50 END AS BIGINT)
        |  AS dur_ticks,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS height,
        | CAST((doc_id + gi*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + gi*131 + size - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,

    "m13_mp4_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 7 AS INTEGER) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, n,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS frame_no FROM d),
        |s AS (SELECT doc_id, n, frame_no,
        |  CAST(50 + ((doc_id*31 + frame_no*17) % 64) AS BIGINT) AS size,
        |  CASE WHEN frame_no < 2 THEN 0
        |    ELSE 1 + (frame_no - 2) // 3 END AS chunk FROM f),
        |o AS (SELECT doc_id, n, frame_no, size,
        |  CAST(28 + COALESCE(SUM(size) OVER (PARTITION BY doc_id
        |      ORDER BY frame_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + 4*chunk AS BIGINT) AS "offset" FROM s)
        |SELECT doc_id, frame_no, "offset", size,
        | CAST(CASE WHEN frame_no % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
        |   AS keyframe,
        | CAST(CASE WHEN frame_no < n // 2 THEN 1000 + (doc_id % 5)*100
        |   ELSE 1200 END AS BIGINT) AS dur_ticks,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS height,
        | CAST((doc_id + frame_no*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + frame_no*131 + size - 1) % 256 AS INTEGER)
        |   AS tail_byte
        |FROM o""".stripMargin)
}
