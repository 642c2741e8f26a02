package graft

import org.apache.spark.sql.functions._

/** Stress the Ogg container walks (SCALE.md): 200k synthetic payloads
  * through the CRC-verified page census and 200k chained payloads through
  * the cross-page packet reassembly. Both are narrow mapPartitions plans
  * (zero exchanges), so the numbers here ARE the per-executor scan cost —
  * cluster scale-out is linear in executors. */
object MediaStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val ids = spark.range(n).select(col("id").as("doc_id"))
      .repartition(32).localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var nPages = 0L
    var pageBytes = 0L
    val tPages = time {
      val agg = graft.functions.Ogg.oggPages(
        graft.functions.Ogg.syntheticOggs(ids, "doc_id"),
        "doc_id", "payload")
        .agg(count(lit(1)), sum(col("header_bytes") + col("body_bytes")))
        .collect().head
      nPages = agg.getLong(0); pageBytes = agg.getLong(1)
    }
    var nPackets = 0L
    var packetBytes = 0L
    val tPackets = time {
      val agg = graft.functions.Ogg.oggPackets(
        graft.functions.Ogg.syntheticChainedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .agg(count(lit(1)), sum("size")).collect().head
      nPackets = agg.getLong(0); packetBytes = agg.getLong(1)
    }
    var nTags = 0L
    val tTags = time {
      nTags = graft.functions.Flac.flacComments(
        graft.functions.Flac.syntheticCommentedFlacs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    // r13 walkers — all narrow maps like the above, so docs/s here is
    // the per-executor cost a 1000-executor census would see per core
    var nImages = 0L
    val tImages = time {
      nImages = graft.functions.Imaging.imageMeta(
        graft.functions.Imaging.syntheticImages(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nTracks = 0L
    val tTracks = time {
      nTracks = graft.functions.Ebml.mkvTracks(
        graft.functions.Ebml.syntheticMkvs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nEntries = 0L
    val tEntries = time {
      nEntries = graft.functions.Zip.zipEntries(
        graft.functions.Zip.syntheticZips(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nFrames = 0L
    val tFrames = time {
      nFrames = graft.functions.Zstd.zstdFrames(
        graft.functions.Zstd.syntheticZstds(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    // second r13 batch: the gzip leg is the interesting one — unlike
    // every other walker it must INFLATE (deflate has no length field),
    // so its docs/s is the true .warc.gz record-locator cost
    var nMembers = 0L
    val tMembers = time {
      nMembers = graft.functions.Gzip.gzipMembers(
        graft.functions.Gzip.syntheticGzips(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nBlocks = 0L
    val tBlocks = time {
      nBlocks = graft.functions.Avro.avroBlocks(
        graft.functions.Avro.syntheticAvros(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nPngText = 0L
    val tPngText = time {
      nPngText = graft.functions.Png.pngTextChunks(
        graft.functions.Png.syntheticTextPngs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nRobots = 0L
    val tRobots = time {
      nRobots = graft.functions.Robots.robotsRules(
        graft.functions.Robots.syntheticRobotsFiles(ids, "doc_id"),
        "doc_id", "robots_text").count()
    }
    var nEml = 0L
    val tEml = time {
      nEml = graft.functions.Eml.emailHeaders(
        graft.functions.Eml.syntheticEmls(ids, "doc_id"),
        "doc_id", "eml_text").count()
    }
    // r14 batch: the MIME body census, and the warc.gz RANDOM-ACCESS
    // cost — per-member inflateMemberAt over locator rows vs the
    // sequential whole-file member walk. Random access re-slices and
    // re-inflates each member independently (the ranged-GET pattern),
    // so its docs/s bounds the per-record cost of a Common Crawl
    // locator-driven fetch pipeline.
    var nParts = 0L
    val tParts = time {
      nParts = graft.functions.Mime.mimeParts(
        graft.functions.Mime.syntheticMimes(ids, "doc_id"),
        "doc_id", "mime_text").count()
    }
    var nRandom = 0L
    val tRandom = time {
      import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("ok", IntegerType)))
      val extracted = ids.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val gz = graft.functions.Gzip.syntheticGzip(id)
          graft.functions.Gzip.parseMembers(gz).toSeq.flatten.map { m =>
            val body = graft.functions.Gzip.inflateMemberAt(
              gz, m.offset, m.compBytes)
            org.apache.spark.sql.Row(id, if (body.isDefined) 1 else 0)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      val agg = extracted.agg(count(lit(1)), sum("ok")).collect().head
      nRandom = agg.getLong(0)
      require(agg.getLong(1) == nRandom, "random-access extraction failed")
    }
    // second r14 batch: the new shard-container walks (all narrow maps)
    var nZipX = 0L
    val tZipX = time {
      nZipX = graft.functions.Zip.extractEntries(
        graft.functions.Zip.syntheticRealZips(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nTarGz = 0L
    val tTarGz = time {
      nTarGz = graft.functions.Tar.tarGzEntries(
        graft.functions.Tar.syntheticTarGzs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nTfr = 0L
    val tTfr = time {
      nTfr = graft.functions.TfRecord.tfRecords(
        graft.functions.TfRecord.syntheticTfRecords(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nXz = 0L
    val tXz = time {
      nXz = graft.functions.Xz.xzBlocks(
        graft.functions.Xz.syntheticXzs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nSm = 0L
    val tSm = time {
      nSm = graft.functions.Sitemap.sitemapItems(
        graft.functions.Sitemap.syntheticSitemaps(ids, "doc_id"),
        "doc_id", "sitemap_text").count()
    }
    var nCsv = 0L
    val tCsv = time {
      nCsv = graft.functions.Csv.csvSniff(
        graft.functions.Csv.syntheticCsvs(ids, "doc_id"),
        "doc_id", "csv_text").count()
    }
    // r15 batch: the gzip-composed shard walks (each pays the inflate
    // the locator path pays at 100 TB) and the locator-driven Avro
    // block extraction with per-codec decode + CRC/sync verification
    var nTfrGz = 0L
    val tTfrGz = time {
      nTfrGz = graft.functions.TfRecord.tfRecordsGz(
        graft.functions.TfRecord.syntheticTfRecordGzs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nSmGz = 0L
    val tSmGz = time {
      nSmGz = graft.functions.Sitemap.sitemapGzItems(
        graft.functions.Sitemap.syntheticSitemapGzs(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    var nAvroX = 0L
    val tAvroX = time {
      nAvroX = graft.functions.Avro.extractStringRecords(
        graft.functions.Avro.syntheticRealAvros(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    // r16b: full-type-system Avro record decode (m54) — the value
    // rung; fixture ENCODE (six real codecs) dominates the wall, the
    // decode itself is a narrow map over located blocks
    var nAvroR = 0L
    val tAvroR = time {
      nAvroR = graft.functions.AvroRecord.decodeRecords(
        graft.functions.AvroRecord.syntheticRecordAvros(ids, "doc_id"),
        "doc_id", "payload",
        graft.functions.AvroRecord.docSchemaJson).count()
    }
    var nCsvB = 0L
    val tCsvB = time {
      nCsvB = graft.functions.Csv.csvSniffBytes(
        graft.functions.Csv.syntheticCsvPayloads(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    // r16: MKV Cues census + per-cue locator replay (the seek-index
    // walk for video lakes — parse the index, then re-seek every
    // cluster it names and verify the timestamp)
    var nCues = 0L
    val tCues = time {
      nCues = graft.functions.Ebml.mkvCues(
        graft.functions.Ebml.syntheticMkvCueFiles(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    // r16b: frame extraction at the cue locators (m60)
    var nMkvFrames = 0L
    val tMkvFrames = time {
      nMkvFrames = graft.functions.Ebml.mkvFrames(
        graft.functions.Ebml.syntheticMkvFrameFiles(ids, "doc_id"),
        "doc_id", "payload").count()
    }
    println(f"MEDIASTRESS docs=$n pages=$nPages pageWall=$tPages%.1f " +
      f"pagesPerSec=${nPages / tPages}%.0f pageMB=${pageBytes / 1e6}%.0f " +
      f"packets=$nPackets packetWall=$tPackets%.1f " +
      f"packetsPerSec=${nPackets / tPackets}%.0f " +
      f"packetMB=${packetBytes / 1e6}%.0f " +
      f"flacTags=$nTags tagWall=$tTags%.1f " +
      f"tagDocsPerSec=${n / tTags}%.0f " +
      f"images=$nImages imageWall=$tImages%.1f " +
      f"imageDocsPerSec=${n / tImages}%.0f " +
      f"mkvTracks=$nTracks mkvWall=$tTracks%.1f " +
      f"mkvDocsPerSec=${n / tTracks}%.0f " +
      f"zipEntries=$nEntries zipWall=$tEntries%.1f " +
      f"zipDocsPerSec=${n / tEntries}%.0f " +
      f"zstdFrames=$nFrames zstdWall=$tFrames%.1f " +
      f"zstdDocsPerSec=${n / tFrames}%.0f " +
      f"gzipMembers=$nMembers gzipWall=$tMembers%.1f " +
      f"gzipDocsPerSec=${n / tMembers}%.0f " +
      f"avroBlocks=$nBlocks avroWall=$tBlocks%.1f " +
      f"avroDocsPerSec=${n / tBlocks}%.0f " +
      f"pngText=$nPngText pngTextWall=$tPngText%.1f " +
      f"pngTextDocsPerSec=${n / tPngText}%.0f " +
      f"robotsItems=$nRobots robotsWall=$tRobots%.1f " +
      f"robotsDocsPerSec=${n / tRobots}%.0f " +
      f"emlHeaders=$nEml emlWall=$tEml%.1f " +
      f"emlDocsPerSec=${n / tEml}%.0f " +
      f"mimeParts=$nParts mimeWall=$tParts%.1f " +
      f"mimeDocsPerSec=${n / tParts}%.0f " +
      f"randomMembers=$nRandom randomWall=$tRandom%.1f " +
      f"randomMembersPerSec=${nRandom / tRandom}%.0f " +
      f"seqMembersPerSec=${nMembers / tMembers}%.0f " +
      f"zipExtract=$nZipX zipXWall=$tZipX%.1f " +
      f"zipXDocsPerSec=${n / tZipX}%.0f " +
      f"targzEntries=$nTarGz targzWall=$tTarGz%.1f " +
      f"targzDocsPerSec=${n / tTarGz}%.0f " +
      f"tfRecords=$nTfr tfrWall=$tTfr%.1f " +
      f"tfrDocsPerSec=${n / tTfr}%.0f " +
      f"xzBlocks=$nXz xzWall=$tXz%.1f " +
      f"xzDocsPerSec=${n / tXz}%.0f " +
      f"sitemapItems=$nSm sitemapWall=$tSm%.1f " +
      f"sitemapDocsPerSec=${n / tSm}%.0f " +
      f"csvSniffs=$nCsv csvWall=$tCsv%.1f " +
      f"csvDocsPerSec=${n / tCsv}%.0f " +
      f"tfrGzRecords=$nTfrGz tfrGzWall=$tTfrGz%.1f " +
      f"tfrGzDocsPerSec=${n / tTfrGz}%.0f " +
      f"sitemapGzItems=$nSmGz sitemapGzWall=$tSmGz%.1f " +
      f"sitemapGzDocsPerSec=${n / tSmGz}%.0f " +
      f"avroExtract=$nAvroX avroXWall=$tAvroX%.1f " +
      f"avroXDocsPerSec=${n / tAvroX}%.0f " +
      f"avroRecords=$nAvroR avroRecWall=$tAvroR%.1f " +
      f"avroRecDocsPerSec=${n / tAvroR}%.0f " +
      f"csvBytesSniffs=$nCsvB csvBytesWall=$tCsvB%.1f " +
      f"csvBytesDocsPerSec=${n / tCsvB}%.0f " +
      f"mkvCues=$nCues mkvCuesWall=$tCues%.1f " +
      f"mkvCuesDocsPerSec=${n / tCues}%.0f " +
      f"mkvFrames=$nMkvFrames mkvFramesWall=$tMkvFrames%.1f " +
      f"mkvFramesDocsPerSec=${n / tMkvFrames}%.0f")
    spark.stop()
  }
}
