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
      f"zstdDocsPerSec=${n / tFrames}%.0f")
    spark.stop()
  }
}
