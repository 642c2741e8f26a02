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
 * Image decode, feature extraction, and resize are REAL for any format a
 * stock-JDK `javax.imageio` reader recognizes (PNG/JPEG/GIF/BMP): decode
 * parses the actual container header for width/height/channels, features
 * are a grid-pooled luminance vector over the decoded pixels, and resize
 * rasterizes to the target dimensions and re-encodes PNG. Payloads no
 * reader recognizes (arbitrary binary, or audio/video containers — no
 * demuxer ships with the JDK) fall back to the deterministic
 * [[decodeImageStub]] pseudo-metadata path so mixed-media frames still
 * flow; frame sampling remains a byte-window stub for the same reason.
 */
object Multimodal {

  // keep ImageIO off the scratch-disk cache: per-row temp files would be
  // an executor-local I/O storm at scale, and the payloads are in memory
  javax.imageio.ImageIO.setUseCache(false)

  /** Output schema of the image decode stage. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("checksum", LongType)))

  /**
   * FALLBACK decode for payloads no ImageIO reader recognizes: derives
   * deterministic pseudo image properties from the payload bytes, so
   * non-image binaries (or audio/video containers) still produce rows
   * instead of poisoning the batch. Disclosed fake — real formats never
   * reach this path (see [[decodeImage]]).
   */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val n = if (payload == null) 0 else payload.length
    val width = 64 + (n % 577)
    val height = 64 + ((n / 7) % 433)
    (width, height, 3, fnv1a(payload))
  }

  /** FNV-1a over the raw payload bytes — the content checksum attached to
   * every decode row (real or fallback). */
  def fnv1a(payload: Array[Byte]): Long = {
    val n = if (payload == null) 0 else payload.length
    var checksum = 1469598103934665603L
    var i = 0
    while (i < n) { checksum = (checksum ^ (payload(i) & 0xff)) * 1099511628211L; i += 1 }
    checksum
  }

  /**
   * REAL image decode (JDK `javax.imageio`, no extra dependency): parses
   * the container header — width/height from the reader, channels from the
   * declared color model — without decoding pixel buffers, which is the
   * right cost model for a metadata pass over billions of images.
   * Unrecognized or corrupt payloads fall back to [[decodeImageStub]].
   */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Long) = {
    if (payload == null || payload.length == 0) return decodeImageStub(payload)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // createImageInputStream returns null (not an exception) when no
    // ImageInputStreamSpi claims the input — the finally would NPE
    if (iis == null) return decodeImageStub(payload)
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) decodeImageStub(payload)
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          val types = reader.getImageTypes(0)
          val channels =
            if (types.hasNext) types.next().getColorModel.getNumComponents else 3
          (w, h, channels, fnv1a(payload))
        } finally reader.dispose()
      }
    } catch {
      case _: Exception => decodeImageStub(payload)
    } finally iis.close()
  }

  /**
   * Executor-side deterministic PNG fixtures: (doc_id, payload) rows where
   * payload = [[syntheticPng]] with width `8 + id % 57`, height
   * `8 + id % 31`, seed `id`. The dims are a pure SQL-expressible function
   * of the id, which is what gives the REAL decoder an exact cross-engine
   * oracle (conformance m01/m04 recompute them in DuckDB).
   */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticPng((8 + id % 57).toInt, (8 + id % 31).toInt, id))
      }
    }(Encoders.row(schema))
  }

  /** splitmix64 — the fixture-generation bit mixer (public-domain
   * constant set; full-avalanche, so adjacent seeds give independent
   * patterns). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * Deterministic STRUCTURED grayscale PNG for perceptual-hash fixtures:
   * a 9×8 block pattern (each block one constant gray drawn from
   * (patternSeed, block)) plus `noisePixels` deterministic single-pixel
   * perturbations drawn from noiseSeed. Same patternSeed ⇒ dHashes a few
   * bits apart under different noise; independent patternSeeds ⇒
   * independent gradient signs (~32 bits apart) — exactly the
   * near-dup/far-pair geometry image dedup must separate. Unlike
   * [[syntheticPng]] (per-pixel noise, the WRONG shape for perceptual
   * hashing — every cell mean collapses to the global mean), the block
   * structure gives dHash real gradients to latch onto.
   */
  def syntheticStructuredPng(
      width: Int, height: Int, patternSeed: Long,
      noiseSeed: Long = 0L, noisePixels: Int = 0): Array[Byte] = {
    require(width >= 9 && height >= 8,
      s"structured fixture needs at least 9x8, got ${width}x$height")
    require(noisePixels >= 0, "noisePixels must be >= 0")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val block = (y.toLong * 8 / height) * 9 + (x.toLong * 9 / width)
        val g = (mix64(patternSeed * 73 + block) & 0xff).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < noisePixels) {
      // modulo on the positive LONG, then narrow — .toInt first would
      // truncate to a possibly-negative 32-bit value
      val px = ((mix64(noiseSeed * 131 + 2 * i) >>> 1) % width).toInt
      val py = ((mix64(noiseSeed * 131 + 2 * i + 1) >>> 1) % height).toInt
      img.setRGB(px, py, 0x808080)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed [[syntheticStructuredPng]] corpus: pattern = id %
   * nPatterns (ids sharing a pattern are near-duplicates), per-doc noise
   * seeded by the id itself. Payloads generate ON EXECUTORS — the driver
   * never holds an image. */
  def syntheticStructuredImages(
      df: DataFrame, idCol: String, nPatterns: Int,
      noisePixels: Int = 4): DataFrame = {
    require(nPatterns > 0, "nPatterns must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticStructuredPng(90, 80, patternSeed = id % nPatterns,
          noiseSeed = id, noisePixels = noisePixels))
      }
    }(Encoders.row(schema))
  }

  /** Output schema of the audio decode stage. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("checksum", LongType)))

  /**
   * REAL audio container decode (JDK `javax.sound.sampled`, no extra
   * dependency): WAV/AIFF/AU headers parse to sample rate, channel count,
   * bit depth, and frame length without reading sample data. Payloads no
   * provider recognizes fall back to deterministic pseudo-metadata
   * (rate/channels/bits derived from the byte count — the disclosed
   * non-audio path, mirroring [[decodeImageStub]]).
   */
  def decodeAudio(payload: Array[Byte]): (Int, Int, Int, Long, Long) = {
    def stub = {
      val n = if (payload == null) 0 else payload.length
      (8000 + (n % 3) * 4000, 1 + n % 2, 16, n.toLong / 2, fnv1a(payload))
    }
    if (payload == null || payload.length == 0) return stub
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val af = fmt.getFormat
      (af.getSampleRate.toInt, af.getChannels, af.getSampleSizeInBits,
        fmt.getFrameLength.toLong, fnv1a(payload))
    } catch {
      // ALL Exception, not just UnsupportedAudioFile/IO: the JDK header
      // parsers throw unchecked exceptions (ArrayIndexOutOfBounds,
      // NegativeArraySize) on recognized-magic-but-corrupt headers — one
      // such payload must take the fallback, not fail the job
      case _: Exception => stub
    }
  }

  /** Distributed audio-metadata pass — the audio sibling of
   * [[decodeImages]]. Output: [[audioMetaSchema]]. */
  def decodeAudioBatch(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val (rate, ch, bits, frames, sum) = decodeAudio(payload)
        Row(r.getLong(idIdx), if (payload == null) 0 else payload.length,
          rate, ch, bits, frames, sum)
      }
    }(Encoders.row(audioMetaSchema))
  }

  /**
   * Deterministic PCM-16 WAV fixture: `frames` frames of `channels`
   * channels at `sampleRate`, samples a pure function of (seed, i) —
   * the audio sibling of [[syntheticPng]] (real container, oracle-able
   * header fields).
   */
  /** Byte i of the synthetic PCM stream for `seed` — the ONE definition
   * of the fixture waveform, shared by [[syntheticWav]] and the m07
   * expected-feature recomputation so they cannot drift. */
  def syntheticPcmByte(seed: Long, i: Int): Byte =
    ((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 32).toByte

  def syntheticWav(
      sampleRate: Int, channels: Int, frames: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0, "bad wav dims")
    val bytes = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = syntheticPcmByte(seed, i)
      i += 1
    }
    val af = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), af, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Executor-side WAV fixtures with id-derived header fields
   * (rate 8000/16000 by id parity, channels `1 + id % 2`, frames
   * `100 + id % 50`) — the m05 oracle recomputes these in SQL. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticWav(
          if (id % 2 == 0) 8000 else 16000,
          (1 + id % 2).toInt, (100 + id % 50).toInt, id))
      }
    }(Encoders.row(schema))
  }

  /** REAL PCM sample decode (JDK `javax.sound.sampled`): the 16-bit
   * signed little-endian samples of a recognized uncompressed payload,
   * None for unrecognized containers or non-PCM16 encodings. This is the
   * sample-data sibling of [[decodeAudio]]'s header parse — the JDK ships
   * a real WAV/AIFF/AU PCM reader, so waveform analysis runs on true
   * samples, not header metadata. */
  def decodePcm16(payload: Array[Byte]): Option[Array[Short]] = {
    if (payload == null || payload.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val af = ais.getFormat
        if (af.getSampleSizeInBits != 16 || af.isBigEndian ||
          af.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          None
        else {
          val bytes = ais.readAllBytes()
          val out = new Array[Short]((bytes.length / 2).toInt)
          var i = 0
          while (i < out.length) {
            out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(out)
        }
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Output schema of the audio feature stage. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("rms", DoubleType),
    StructField("zero_crossings", LongType),
    StructField("peak", IntegerType)))

  /** Waveform features over a PCM16 sample array: sample count, RMS of
   * the [-1, 1)-normalized signal, sign-change count over the interleaved
   * stream, and absolute peak. One definition shared by the distributed
   * stage and any expected-value recomputation (m07). */
  def waveformFeatures(samples: Array[Short]): (Int, Double, Long, Int) = {
    var sumSq = 0.0
    var zc = 0L
    var peak = 0
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toInt
      val x = s / 32768.0
      sumSq += x * x
      if (i > 0 && ((samples(i - 1) < 0) != (s < 0))) zc += 1
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val rms = if (samples.length > 0) math.sqrt(sumSq / samples.length) else 0.0
    (samples.length, rms, zc, peak)
  }

  /**
   * Distributed audio feature extraction over REAL decoded samples —
   * the waveform sibling of [[extractFeatures]]. Unrecognized or
   * compressed payloads fall back to byte-stream pseudo-samples (each
   * byte sign-extended — disclosed non-audio path), so mixed media
   * columns still flow. Output: [[audioFeatureSchema]].
   */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val samples = decodePcm16(payload).getOrElse {
          if (payload == null) Array.emptyShortArray
          else payload.map(_.toShort)
        }
        val (n, rms, zc, peak) = waveformFeatures(samples)
        Row(r.getLong(idIdx), n, rms, zc, peak)
      }
    }(Encoders.row(audioFeatureSchema))
  }

  /**
   * 64-bit energy-delta audio fingerprint (Haitsma–Kalker-shaped but
   * FFT-free, so it stays deterministic with zero native deps): the PCM
   * stream is cut into 65 equal frames and bit i = [E(i+1) > E(i)] over
   * the mean frame energies. Energy COMPARISONS are gain-invariant (a
   * volume change scales every frame equally) and small noise flips only
   * bits near energy ties, so re-encoded / re-leveled copies of a
   * recording land within a few hamming bits. Streams shorter than 65
   * samples, silence, and constant tones yield 0 — the degenerate class
   * [[audioNearDupPairs]] excludes, mirroring image dHash's flat-image
   * exclusion.
   */
  def audioFingerprint64(samples: Array[Short]): Long = {
    val frames = 65
    if (samples.length < frames) return 0L
    val energies = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      val s = (samples.length.toLong * f / frames).toInt
      val e = (samples.length.toLong * (f + 1) / frames).toInt
      var sum = 0.0
      var i = s
      while (i < e) { val x = samples(i) / 32768.0; sum += x * x; i += 1 }
      energies(f) = sum / math.max(1, e - s)
      f += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (energies(b + 1) > energies(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Distributed fingerprint stage: (idCol, afp, audio_ok) — afp null on
   * undecodable payloads (decode failures must not hash, same contract
   * as [[imageDHash]]'s img_ok). */
  def audioFingerprint(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    Seq("afp", "audio_ok")
      .foreach(c => require(c != idCol, s"idCol collides with output column '$c'"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("afp", LongType),
      StructField("audio_ok", BooleanType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        decodePcm16(r.getAs[Array[Byte]](pIdx)) match {
          case Some(samples) => Row(r.getLong(idIdx), audioFingerprint64(samples), true)
          case None => Row(r.getLong(idIdx), null, false)
        }
      }
    }(Encoders.row(schema)).withColumnRenamed("id", idCol)
  }

  /**
   * Audio near-duplicate pairs: decodable recordings with a
   * non-degenerate fingerprint whose [[audioFingerprint64]]s differ in
   * ≤ maxHamming bits — closing the multimodal dedup triangle (text
   * SimHash / image dHash / audio energy-delta all share
   * [[graft.functions.Dedup.hamming64Pairs]]'s pigeonhole banding, which
   * prunes but never drops a qualifying pair). Decode + 8-byte hash is
   * the only per-recording work; the exchange carries (band, hash, id),
   * never samples. Output: (id_a, id_b, hamming) with id_a < id_b.
   */
  def audioNearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 6, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = audioFingerprint(df, idCol, payloadCol)
      .filter(col("audio_ok") && col("afp") =!= 0L)
      .select(col(idCol).as("id"), col("afp").as("sig"))
    graft.functions.Dedup.hamming64Pairs(sigs, maxHamming, maxBucketSize)
  }

  /** Mono 16-bit little-endian WAV container around a PCM sample array. */
  def wavFromPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val af = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), af, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * Executor-side WAV fixtures in `nGroups` amplitude-envelope families:
   * group = id % nGroups fixes a 65-frame amplitude envelope (hash-
   * derived, gap-separated levels); each member applies its own gain
   * (±~3%) and per-frame jitter (±2% of the amplitude), so same-group
   * fingerprints differ by only a few bits while cross-group envelopes
   * are unrelated. The m11 differential runs the banded near-dup
   * operator against a brute-force hash cross-join over these.
   */
  def syntheticEnvelopeWavs(df: DataFrame, idCol: String,
      nGroups: Int = 10, samplesPerFrame: Int = 40): DataFrame = {
    require(nGroups >= 1 && samplesPerFrame >= 1, "bad fixture dims")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val group = java.lang.Math.floorMod(id, nGroups.toLong)
        val gain = 1.0 + java.lang.Math.floorMod(id / nGroups, 7L) * 0.01
        val n = 65 * samplesPerFrame
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          val f = i / samplesPerFrame
          // envelope levels 2000..12000 in coarse steps -> adjacent-frame
          // energy gaps dwarf the ±2% jitter below
          val base = 2000 + java.lang.Math.floorMod(
            mix64(group * 1000003L + f * 7919L), 11L) * 1000L
          val jitter = 1.0 + (java.lang.Math.floorMod(
            mix64(id * 31L + i), 41L) - 20L) / 1000.0
          val amp = (base * gain * jitter).toInt.min(Short.MaxValue.toInt)
          samples(i) = (if (i % 2 == 0) amp else -amp).toShort
          i += 1
        }
        Row(id, wavFromPcm16(samples))
      }
    }(Encoders.row(schema)).withColumnRenamed("id", idCol)
  }

  /** Expected waveform features of [[syntheticAudio]] payloads computed
   * straight from the PCM byte formula — NO container involved. The m07
   * differential joins this against [[audioFeatures]] over the real
   * WAV payloads, pinning that the encode→decode roundtrip is
   * sample-transparent. */
  def expectedSyntheticAudioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("e_n", IntegerType),
      StructField("e_rms", DoubleType),
      StructField("e_zc", LongType),
      StructField("e_peak", IntegerType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val nBytes = (100 + id % 50).toInt * (1 + id % 2).toInt * 2
        val samples = new Array[Short](nBytes / 2)
        var j = 0
        while (j < samples.length) {
          samples(j) = ((syntheticPcmByte(id, 2 * j) & 0xff) |
            (syntheticPcmByte(id, 2 * j + 1) << 8)).toShort
          j += 1
        }
        val (n, rms, zc, peak) = waveformFeatures(samples)
        Row(id, n, rms, zc, peak)
      }
    }(Encoders.row(schema))
  }

  /** Real binary-file ingestion for multimodal columns: every file under
   * `dir` matching `glob` becomes one (path, n_bytes, payload) row via
   * Spark's native `binaryFile` source — the production path from a
   * bucket of images/audio/video files into the decode/featurize stages
   * (distributed listing, partition-parallel reads, pushdown on path). */
  def loadBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("length").cast("int").as("n_bytes"),
        col("content").as("payload"))

  /** Decoded pixels of a recognized image payload, None otherwise. */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: Exception => None }

  /**
   * Deterministic RGB PNG fixture: a width×height image whose pixel
   * (x, y) color is a pure function of (seed, x, y), PNG-encoded. Gives
   * the REAL decoder a real oracle in tests and the m-series conformance
   * queries — expected dims are computable in plain SQL from the seed.
   */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 2654435761L + x * 131L + y * 31L) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
        val (w, h, c, sum) = decodeImage(payload)
        Row(id, if (payload == null) 0 else payload.length, w, h, c, sum)
      }
    }(Encoders.row(imageMetaSchema))
  }

  /**
   * Feature extraction: payload bytes → fixed-dimension embedding
   * (`array<float>`, L2-normalized). Recognized images decode to pixels
   * and pool mean luminance over a ⌊√dim⌋×⌊√dim⌋ grid — a real (if
   * simple) visual feature in the pHash family, stable under re-encoding.
   * Unrecognized payloads hash byte n-grams into `dim` buckets (content
   * fingerprint, not a visual feature — the disclosed non-image fallback).
   * Either way the output composes directly with
   * [[Similarity.bruteForceTopK]] / [[Similarity.lshTopK]], which is the
   * point: multimodal → embedding → ANN as one declarative pipeline.
   */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 64): DataFrame = {
    require(dim > 0, "dim must be positive")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val v = readImage(payload) match {
          case Some(img) => luminanceGrid(img, dim)
          case None => byteNgramHash(payload, dim)
        }
        l2normalize(v)
        Row(r.getLong(idIdx), v.toSeq)
      }
    }(Encoders.row(schema))
  }

  /**
   * 64-bit difference hash (dHash) of a decoded image — the standard
   * perceptual fingerprint for image near-duplicate detection: pool luma
   * over a 9×8 grid (area average, not point sampling, so the hash is
   * stable under resizing and mild noise), then bit (y*8+x) = 1 iff
   * cell(x+1, y) > cell(x, y). Horizontal gradients survive brightness/
   * contrast shifts and re-encoding; unrelated images land ~32 bits
   * apart (each bit is an independent-ish gradient sign).
   *
   * Integer Rec.601 luma and integer cell mapping keep the hash
   * platform-stable (no FP resampling). Flat images (no gradient
   * anywhere) hash to 0 — structurally identical by definition of this
   * signal, callers wanting to distinguish them should pair the hash
   * with a luminance feature.
   */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff) // Rec.601 ×1000, exact integers
        val cell = (y.toLong * gh / h).toInt * gw + (x.toLong * gw / w).toInt
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    // cell means as exact rationals: compare sums cross-multiplied by
    // counts so no division rounding enters the bit decisions
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val l = gy * gw + gx
        val r = l + 1
        // mean(r) > mean(l)  ⇔  sums(r)·counts(l) > sums(l)·counts(r)
        if (counts(l) > 0 && counts(r) > 0 &&
          sums(r) * counts(l) > sums(l) * counts(r))
          bits |= 1L << (gy * (gw - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Per-row perceptual hashes for a binary image column:
   * (idCol, dhash: long, img_ok: boolean) — img_ok false (dhash null)
   * when no ImageIO reader recognizes the payload. Narrow mapPartitions,
   * no shuffle; compose with [[imageNearDupPairs]] or store alongside the
   * corpus for incremental dedup. */
  def imageDHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    Seq("dhash", "img_ok")
      .foreach(c => require(c != idCol, s"idCol collides with output column '$c'"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("dhash", LongType),
      StructField("img_ok", BooleanType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        readImage(r.getAs[Array[Byte]](pIdx)) match {
          case Some(img) => Row(r.getLong(idIdx), dHash64(img), true)
          case None => Row(r.getLong(idIdx), null, false)
        }
      }
    }(Encoders.row(schema)).withColumnRenamed("id", idCol)
  }

  /**
   * Image near-duplicate pairs: all decodable pairs with a non-degenerate
   * gradient signature whose dHashes differ in ≤ `maxHamming` bits (the
   * LAION-style image-dedup step). EXACT over the hash space for those
   * images — [[graft.functions.Dedup.hamming64Pairs]]'s pigeonhole
   * banding only prunes, never drops a qualifying pair. Flat/monochrome
   * images dHash to 0 (zero gradient everywhere) and carry no perceptual
   * signal — unrelated blank images would all pairwise report as
   * hamming-0 dups and blow past maxBucketSize — so sig==0 rows are
   * excluded up front, mirroring the SimHash path's empty-shingle
   * exclusion. Decode + 8-byte hash is the ONLY per-image work; the
   * exchange carries (band, hash, id), never pixels, so the quadratic
   * step is bucket-local over 64-bit keys — the same scale shape as text
   * SimHash dedup. Output: (id_a, id_b, hamming) with id_a < id_b.
   */
  def imageNearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = imageDHash(df, idCol, payloadCol)
      .filter(col("img_ok") && col("dhash") =!= 0L)
      .select(col(idCol).as("id"), col("dhash").as("sig"))
    graft.functions.Dedup.hamming64Pairs(sigs, maxHamming, maxBucketSize)
  }

  /** Mean luminance pooled over a ⌊√dim⌋×⌊√dim⌋ grid of the decoded
   * pixels (trailing vector entries stay 0 when dim is not a square). */
  private def luminanceGrid(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val grid = math.max(1, math.sqrt(dim.toDouble).toInt)
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luma — exact, so features are platform-stable
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000.0
        val cell = (y.toLong * grid / h).toInt * grid + (x.toLong * grid / w).toInt
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val v = new Array[Float](dim)
    var i = 0
    while (i < grid * grid) {
      if (counts(i) > 0) v(i) = (sums(i) / counts(i)).toFloat
      i += 1
    }
    v
  }

  private def byteNgramHash(payload: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (payload != null && payload.length > 0) {
      var h = 1469598103934665603L
      var i = 0
      while (i < payload.length) {
        h = (h ^ (payload(i) & 0xff)) * 1099511628211L
        v(((h >>> 1) % dim).toInt) += 1f
        i += 1
      }
    }
    v
  }

  private def l2normalize(v: Array[Float]): Unit = {
    var s = 0.0
    var j = 0
    while (j < v.length) { s += v(j).toDouble * v(j); j += 1 }
    if (s > 0) {
      val inv = (1.0 / math.sqrt(s)).toFloat
      j = 0
      while (j < v.length) { v(j) *= inv; j += 1 }
    }
  }

  /**
   * Resize: payload in → payload out with target dimensions. Recognized
   * images are REALLY resampled — decode, raster to targetWidth×targetHeight
   * (nearest-neighbor via Graphics2D, deterministic), re-encode PNG — so a
   * decode of the output reports exactly the target dims. Unrecognized
   * payloads keep the deterministic byte-budget stub (output size
   * proportional to target area, not source area) so mixed binary columns
   * still flow. Output: (doc_id, width, height, payload).
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
        val out = readImage(payload) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(
              targetWidth, targetHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try g.drawImage(img, 0, 0, targetWidth, targetHeight, null)
            finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          case None => resizeByteStub(payload, targetWidth, targetHeight)
        }
        Row(r.getLong(idIdx), targetWidth, targetHeight, out)
      }
    }(Encoders.row(schema))
  }

  /** Non-image fallback resample: stride-sample the byte stream down to a
   * target-area-proportional byte budget. */
  private def resizeByteStub(
      payload: Array[Byte], targetWidth: Int, targetHeight: Int): Array[Byte] = {
    val n = if (payload == null) 0 else payload.length
    if (n == 0) return Array.emptyByteArray
    val (w, h, _, _) = decodeImageStub(payload)
    // double, not integer: n*tw*th overflows Long for large payloads ×
    // large target dims (and would silently collapse the budget to 1 byte)
    val ratio = targetWidth.toDouble * targetHeight /
      (math.max(1L, w.toLong * h)).toDouble
    val budget = math.max(1L, math.min(n.toLong, math.round(n * ratio))).toInt
    val b = new Array[Byte](budget)
    var i = 0
    while (i < budget) { b(i) = payload((i.toLong * n / budget).toInt); i += 1 }
    b
  }

  /**
   * Deterministic animated-GIF fixture: `frames` frames of width×height
   * whose pixel (f, x, y) color is a pure function of (seed, f, x, y),
   * written through the JDK's real GIF encoder (`writeToSequence`). The
   * video sibling of [[syntheticPng]]: frame count and dims are
   * SQL-expressible functions of the seed, giving the real demuxer an
   * exact cross-engine oracle (m06).
   */
  def syntheticGif(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0, "bad gif dims")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "JDK GIF writer missing")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            img.setRGB(x, y,
              (((seed + f) * 2654435761L + x * 131L + y * 31L) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Executor-side animated-GIF fixtures with id-derived shape (frames
   * `2 + id % 7`, width `8 + id % 23`, height `8 + id % 13`) — the m06
   * oracle recomputes these in SQL. */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticGif((8 + id % 23).toInt, (8 + id % 13).toInt,
          (2 + id % 7).toInt, id))
      }
    }(Encoders.row(schema))
  }

  /** Output schema of the real frame demux stage. */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame_bytes", BinaryType)))

  /**
   * REAL frame demux for containers an ImageIO reader can enumerate — the
   * JDK ships an actual multi-frame GIF decoder, so animated GIFs demux to
   * their true frames (every `stride`-th one, re-encoded PNG; width/height
   * from the decoded raster). Single-frame images yield frame 0. MP4
   * payloads take the [[Mp4]] ISO-BMFF box walk: every `stride`-th video
   * SAMPLE is sliced out of `mdat` by its stsz/stsc/stco-resolved byte
   * range, with width/height from `tkhd` (raw coded samples — decode is
   * downstream). Anything else falls back to the byte-window sampler with
   * width/height −1, so mixed media columns still flow.
   * Output: [[frameSchema]].
   */
  def demuxFrames(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 1, frameSize: Int = 1024): DataFrame = {
    require(stride > 0 && frameSize > 0, "stride and frameSize must be positive")
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        decodedFrames(payload, stride) match {
          case Some(frames) =>
            frames.iterator.map { case (i, w, h, b) => Row(id, i, w, h, b) }
          case None => Mp4.parseVideoTrack(payload) match {
            case Some(tr) =>
              tr.samples.iterator.filter(_.no % stride == 0).map { sm =>
                Row(id, sm.no, tr.width, tr.height,
                  java.util.Arrays.copyOfRange(payload, sm.offset.toInt,
                    (sm.offset + sm.size).toInt))
              }
            // an ISO-BMFF payload we could NOT demux (truncated tables,
            // init-only segment, unknown layout) must be DROPPED, not
            // byte-windowed: windows over coded video bytes are garbage
            // rows that read as data downstream (r9 verdict task 2)
            case None if Mp4.sniffIsoBmff(payload) => Iterator.empty
            case None =>
              byteWindows(payload, frameSize, stride)
                .map { case (i, fb) => Row(id, i, -1, -1, fb) }
          }
        }
      }
    }(Encoders.row(frameSchema))
  }

  /**
   * Magic-byte media-type sniff for a binary payload — the census
   * primitive for a MIXED media lake (at 100 TB the first question about
   * a binary column is "what is actually in it", answered without
   * decoding anything): png / jpeg / gif / bmp / mp4 (any ISO-BMFF) /
   * mp3 (ID3v2 or a valid MPEG-audio frame header) / wav / ogg / flac /
   * webp / tiff / matroska (any EBML incl. WebM) / zip / zstd (frame or
   * skippable) / avro (OCF) / gzip / tar (ustar) / warc / empty /
   * unknown. Pure header reads — O(1) per row.
   */
  def sniffMediaType(payload: Array[Byte]): String = {
    if (payload == null || payload.isEmpty) return "empty"
    def at(i: Int) = if (i < payload.length) payload(i) & 0xff else -1
    def str(off: Int, s: String): Boolean =
      off + s.length <= payload.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    if (at(0) == 0x89 && str(1, "PNG")) "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (str(0, "GIF8")) "gif"
    else if (str(0, "BM") && payload.length >= 26 && {
      // 'BM' alone false-positives on text ("BMW manual...") — require a
      // known DIB header size in the little-endian u32 at offset 14
      val dib = at(14) | (at(15) << 8) | (at(16) << 16) | (at(17) << 24)
      Set(12, 40, 52, 56, 64, 108, 124).contains(dib)
    }) "bmp"
    else if (str(0, "RIFF") && str(8, "WAVE")) "wav"
    else if (str(0, "RIFF") && str(8, "WEBP")) "webp"
    else if (Mp4.sniffIsoBmff(payload)) "mp4"
    else if (str(0, "ID3") ||
      (at(0) == 0xff && (at(1) & 0xe0) == 0xe0 &&
        ((at(1) >> 3) & 0x3) != 1 && ((at(1) >> 1) & 0x3) != 0 &&
        ((at(2) >> 4) & 0xf) != 15 && ((at(2) >> 2) & 0x3) != 3)) "mp3"
    else if (str(0, "OggS")) "ogg"
    else if (str(0, "fLaC")) "flac"
    else if (at(0) == 0x1f && at(1) == 0x8b) "gzip"
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 0x2a && at(3) == 0) ||
      (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 0x2a)) "tiff"
    else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf &&
      at(3) == 0xa3) "matroska"
    else if (at(0) == 'P' && at(1) == 'K' &&
      ((at(2) == 3 && at(3) == 4) || (at(2) == 5 && at(3) == 6))) "zip"
    else if (at(0) == 0x28 && at(1) == 0xb5 && at(2) == 0x2f &&
      at(3) == 0xfd) "zstd"
    else if ((at(0) & 0xf0) == 0x50 && at(1) == 0x2a && at(2) == 0x4d &&
      at(3) == 0x18) "zstd" // skippable frame
    else if (str(0, "Obj") && at(3) == 1) "avro"
    else if (str(257, "ustar")) "tar"
    else if (str(0, "WARC/")) "warc"
    else "unknown"
  }

  /** One row per payload with its sniffed media type and byte size —
   * narrow, no shuffle; the downstream groupBy(media_type) census is one
   * partial-aggregated exchange over a handful of rows. */
  def mediaCensus(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("n_bytes", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        Row(r.getLong(idIdx), sniffMediaType(payload),
          if (payload == null) 0L else payload.length.toLong)
      }
    }(Encoders.row(schema))
  }

  /** Every `stride`-th `frameSize`-byte window of a payload — the ONE
   * definition of byte-window frame semantics, shared by [[sampleFrames]]
   * and [[demuxFrames]]' non-media fallback. */
  private def byteWindows(payload: Array[Byte], frameSize: Int,
      stride: Int): Iterator[(Int, Array[Byte])] =
    if (payload == null) Iterator.empty
    else payload.grouped(frameSize).zipWithIndex.collect {
      case (fb, i) if i % stride == 0 => (i, fb)
    }

  /** Decoded (frame_no, width, height, png_bytes) of every `stride`-th
   * frame, or None when no ImageIO reader claims the payload (or a frame
   * fails mid-decode — the whole payload then takes the fallback, never a
   * half-demuxed row set). */
  private def decodedFrames(
      payload: Array[Byte], stride: Int): Option[Seq[(Int, Int, Int, Array[Byte])]] = {
    if (payload == null || payload.length == 0) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n by stride).map { i =>
            val img = reader.read(i)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (i, img.getWidth, img.getHeight, bos.toByteArray)
          })
        } finally reader.dispose()
      }
    } catch {
      case _: Exception => None
    } finally iis.close()
  }

  /**
   * Frame sampling plumbing for video-like payloads: emits every `stride`-th
   * fixed-size window of the payload as a frame row (deterministic stub for
   * a real demuxer; [[demuxFrames]] is the real path for containers the
   * JDK can decode). Output: (doc_id, frame_no, frame_bytes).
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
        byteWindows(r.getAs[Array[Byte]](pIdx), frameSize, stride)
          .map { case (i, frame) => Row(id, i, frame) }
      }
    }(Encoders.row(schema))
  }
}
