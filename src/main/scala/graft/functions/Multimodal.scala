package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata structs; decode / feature-extract /
 * resize / frame-sample run as per-partition batch functions over the
 * binary payloads.
 *
 * The Spark-side contract (schema, partition flow, batch iteration) is real
 * and tested; the actual media decode is STUBBED (no image/audio libraries
 * in this environment) behind [[decodeImageStub]] — a deterministic fake
 * that derives pseudo-metadata from the byte stream. Swap the stub for a
 * real codec (e.g. javax.imageio / ffmpeg bindings) without touching the
 * pipeline: batches arrive partition-wise, never driver-side.
 */
object Multimodal {

  /** Output schema of the image decode stage. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("checksum", LongType)))

  /**
   * STUB decode: derives deterministic pseudo image properties from the
   * payload bytes. A real implementation would parse the container header
   * and hand pixel buffers to the feature extractor — the surrounding
   * dataflow (binary column in, metadata struct out, partition-batched)
   * is exactly what a real codec needs.
   */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val n = if (payload == null) 0 else payload.length
    var checksum = 1469598103934665603L // FNV-1a over the payload
    var i = 0
    while (i < n) { checksum = (checksum ^ (payload(i) & 0xff)) * 1099511628211L; i += 1 }
    val width = 64 + (n % 577)
    val height = 64 + ((n / 7) % 433)
    (width, height, 3, checksum)
  }

  /**
   * Decode a binary payload column into image metadata — one pass per
   * partition over the payload batches (the `mapInPandas`-shaped stage of a
   * Python pipeline, here a JVM `mapPartitions` that keeps rows streaming).
   */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        val (w, h, c, sum) = decodeImageStub(payload)
        Row(id, if (payload == null) 0 else payload.length, w, h, c, sum)
      }
    }(Encoders.row(imageMetaSchema))
  }

  /**
   * Feature extraction plumbing: payload bytes → fixed-dimension embedding
   * (`array<float>`). The featurizer is a deterministic STUB (byte n-gram
   * hashing into `dim` buckets, L2-normalized) standing in for a real
   * vision/audio encoder; its output composes directly with
   * [[Similarity.bruteForceTopK]] / [[Similarity.lshTopK]], which is the
   * point: multimodal → embedding → ANN as one declarative pipeline.
   */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val v = new Array[Float](dim)
        if (payload != null && payload.length > 0) {
          var h = 1469598103934665603L
          var i = 0
          while (i < payload.length) {
            h = (h ^ (payload(i) & 0xff)) * 1099511628211L
            v(((h >>> 1) % dim).toInt) += 1f
            i += 1
          }
          var s = 0.0
          var j = 0
          while (j < dim) { s += v(j).toDouble * v(j); j += 1 }
          if (s > 0) {
            val inv = (1.0 / math.sqrt(s)).toFloat
            j = 0
            while (j < dim) { v(j) *= inv; j += 1 }
          }
        }
        Row(r.getLong(idIdx), v.toSeq)
      }
    }(Encoders.row(schema))
  }

  /**
   * Resize plumbing: payload in → payload out with target dimensions. The
   * resample is a deterministic STUB (stride-sampling the byte stream to
   * the target-area byte budget — a real implementation decodes, resamples
   * pixels, re-encodes); the dataflow contract (binary in, binary +
   * dimensions out, partition-batched, output size proportional to target
   * area not source area) is the real one. Output:
   * (doc_id, width, height, payload).
   */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
      targetWidth: Int, targetHeight: Int): DataFrame = {
    require(targetWidth > 0 && targetHeight > 0, "target dims must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val n = if (payload == null) 0 else payload.length
        val (w, h, _, _) = decodeImageStub(payload)
        // target byte budget scales with target area over source area —
        // computed in double: the integer product n*tw*th overflows Long
        // for large payloads x large target dims (and would silently
        // collapse the budget to 1 byte)
        val ratio = targetWidth.toDouble * targetHeight /
          (math.max(1L, w.toLong * h)).toDouble
        val budget = math.max(1L, math.min(n.toLong, math.round(n * ratio))).toInt
        val out =
          if (n == 0) Array.emptyByteArray
          else {
            val b = new Array[Byte](budget)
            var i = 0
            while (i < budget) { b(i) = payload((i.toLong * n / budget).toInt); i += 1 }
            b
          }
        Row(r.getLong(idIdx), targetWidth, targetHeight, out)
      }
    }(Encoders.row(schema))
  }

  /**
   * Frame sampling plumbing for video-like payloads: emits every `stride`-th
   * fixed-size window of the payload as a frame row (deterministic stub for
   * a real demuxer). Output: (doc_id, frame_no, frame_bytes).
   */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int = 1024, stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) Iterator.empty
        else payload.grouped(frameSize).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => Row(id, i, frame)
        }
      }
    }(Encoders.row(schema))
  }
}
