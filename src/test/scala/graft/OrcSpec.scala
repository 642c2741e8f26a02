package graft

import graft.functions.Orc
import org.scalatest.funsuite.AnyFunSuite

/** ORC tail walk: differential against Spark's own ORC writer/reader
 * across all five supported compression kinds (none / zlib / snappy /
 * zstd / lz4 — the snappy leg exercises the from-spec block decoder,
 * the zstd/lz4 legs the public zstd-jni / lz4-java decoders), plus the
 * refusal boundary (lzo) and the corrupt contract. */
class OrcSpec extends AnyFunSuite with SparkTestBase {

  private def writeOrc(codec: String, n: Int): Seq[Array[Byte]] = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_orcspec")
    try {
      (0 until n).map(i => (i.toLong, s"text_$i" * (1 + i % 7), s"l${i % 5}"))
        .toDF("doc_id", "text", "lang")
        .repartition(2)
        .write.option("compression", codec).mode("overwrite")
        .orc(out.resolve("d").toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(out.resolve("d")).iterator().asScala
        .filter(_.toString.endsWith(".orc")).toSeq.sortBy(_.toString)
        .map(java.nio.file.Files.readAllBytes)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => p.toFile.delete())
    }
  }

  test("Spark-written tails parse across none/zlib/snappy/zstd/lz4") {
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val files = writeOrc(codec, 500)
      assert(files.size === 2, s"$codec file count")
      var rows = 0L
      files.foreach { bytes =>
        val t = Orc.parseTail(bytes)
          .getOrElse(fail(s"$codec tail did not parse"))
        assert(t.compression === codec, s"$codec kind")
        assert(t.nTypes === 4, s"$codec types (root + 3 children)")
        assert(t.nRootFields === 3, s"$codec root fields")
        assert(t.stripeRows.sum === t.numRows, s"$codec stripe row sum")
        assert(t.stripeRows.nonEmpty && t.stripeDataBytes.forall(_ > 0),
          s"$codec stripes")
        assert(t.contentBytes > 0 && t.footerBytes > 0, s"$codec sizes")
        rows += t.numRows
      }
      assert(rows === 500L, s"$codec total rows")
    }
  }

  test("tails agree with ORC's own reader, file-by-file, all five codecs") {
    // the from-spec tail walk vs org.apache.orc's real reader over the
    // same files: rows, codec, stripe count, per-stripe rows and the
    // root field count must all match (test-only dependency — the
    // product path never touches the Hadoop reader)
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val out = java.nio.file.Files.createTempDirectory("graft_orcdiff")
      try {
        import spark.implicits._
        (0 until 300).map(i => (i.toLong, s"t_$i" * (1 + i % 5), s"l${i % 4}"))
          .toDF("doc_id", "text", "lang")
          .repartition(2)
          .write.option("compression", codec).mode("overwrite")
          .orc(out.resolve("d").toString)
        import scala.jdk.CollectionConverters._
        val files = java.nio.file.Files.list(out.resolve("d")).iterator()
          .asScala.filter(_.toString.endsWith(".orc")).toSeq
        assert(files.nonEmpty)
        files.foreach { f =>
          val mine = Orc.parseTail(java.nio.file.Files.readAllBytes(f))
            .getOrElse(fail(s"$codec tail did not parse"))
          val conf = new org.apache.hadoop.conf.Configuration()
          val reader = org.apache.orc.OrcFile.createReader(
            new org.apache.hadoop.fs.Path(f.toString),
            org.apache.orc.OrcFile.readerOptions(conf))
          try {
            assert(mine.numRows === reader.getNumberOfRows, s"$codec rows")
            assert(mine.compression.toUpperCase ===
              reader.getCompressionKind.name(), s"$codec kind")
            val stripes = reader.getStripes.asScala.toSeq
            assert(mine.stripeRows.size === stripes.size, s"$codec stripes")
            mine.stripeRows.zip(stripes).foreach { case (r, s) =>
              assert(r === s.getNumberOfRows, s"$codec stripe rows")
            }
            mine.stripeDataBytes.zip(stripes).foreach { case (d, s) =>
              assert(d === s.getDataLength, s"$codec stripe data bytes")
            }
            assert(mine.nRootFields ===
              reader.getSchema.getChildren.size(), s"$codec root fields")
          } finally reader.close()
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
          .foreach(p => p.toFile.delete())
      }
    }
  }

  test("stripe footers: locators match ORC's reader, sums close, corrupt refuses") {
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val out = java.nio.file.Files.createTempDirectory("graft_orcsf")
      try {
        import spark.implicits._
        (0 until 300).map(i => (i.toLong, s"t_$i" * (1 + i % 5), s"l${i % 4}"))
          .toDF("doc_id", "text", "lang")
          .repartition(2)
          .write.option("compression", codec).mode("overwrite")
          .orc(out.resolve("d").toString)
        import scala.jdk.CollectionConverters._
        val files = java.nio.file.Files.list(out.resolve("d")).iterator()
          .asScala.filter(_.toString.endsWith(".orc")).toSeq
        assert(files.nonEmpty)
        files.foreach { f =>
          val bytes = java.nio.file.Files.readAllBytes(f)
          val mine = Orc.parseTail(bytes).getOrElse(fail(s"$codec no tail"))
          // stripe locator five-tuple vs orc-core's own reader
          val conf = new org.apache.hadoop.conf.Configuration()
          val reader = org.apache.orc.OrcFile.createReader(
            new org.apache.hadoop.fs.Path(f.toString),
            org.apache.orc.OrcFile.readerOptions(conf))
          try {
            val ref = reader.getStripes.asScala.toSeq
            assert(mine.stripes.size === ref.size, s"$codec stripe count")
            mine.stripes.zip(ref).foreach { case ((o, i2, d, fl, r), s) =>
              assert(o === s.getOffset, s"$codec offset")
              assert(i2 === s.getIndexLength, s"$codec indexLength")
              assert(d === s.getDataLength, s"$codec dataLength")
              assert(fl === s.getFooterLength, s"$codec footerLength")
              assert(r === s.getNumberOfRows, s"$codec rows")
            }
            // census verdicts over the same file through the DataFrame API
            val df = spark.createDataset(Seq((0L, bytes)))
              .toDF("doc_id", "payload")
            val rows = Orc.orcStripeFooters(df, "doc_id", "payload").collect()
            assert(rows.length === mine.stripes.size, s"$codec census rows")
            rows.foreach { row =>
              assert(row.getAs[Int]("index_agree") === 1, s"$codec index sum")
              assert(row.getAs[Int]("data_agree") === 1, s"$codec data sum")
              assert(row.getAs[Int]("n_encodings") ===
                reader.getSchema.getMaximumId + 1, s"$codec encodings/types")
              assert(row.getAs[Int]("n_types") === mine.nTypes)
              val kinds = row.getAs[String]("stream_kinds")
              assert(!kinds.contains("kind_"), s"$codec unknown stream kind")
              assert(kinds.contains("row_index"), s"$codec has row index")
              assert(!row.getAs[String]("enc_kinds").contains("enc_"))
            }
          } finally reader.close()
          // a corrupt stripe footer refuses the FILE (strict): flip a
          // byte inside the first stripe's footer region
          val (o, i2, d, fl, _) = mine.stripes.head
          val fs = (o + i2 + d).toInt
          val mut = bytes.clone()
          (fs until math.min(fs + fl.toInt, fs + 8)).foreach { k =>
            mut(k) = (mut(k) ^ 0x3c).toByte
          }
          val mdf = spark.createDataset(Seq((0L, mut))).toDF("doc_id", "payload")
          val got = try Orc.orcStripeFooters(mdf, "doc_id", "payload").collect()
          catch { case e: Throwable => fail(s"$codec threw on corrupt footer: $e") }
          // the tail itself is untouched, so parseTail still passes; the
          // stripe-footer walk must refuse (either structurally or via
          // the sum verdicts going false — never a throw). For chunked
          // codecs the decode refuses outright; for NONE the protobuf
          // walk may still parse garbage, so accept verdict failure too.
          assert(got.isEmpty ||
            got.exists(r => r.getAs[Int]("index_agree") == 0 ||
              r.getAs[Int]("data_agree") == 0 ||
              r.getAs[Int]("n_encodings") != mine.nTypes),
            s"$codec corrupt stripe footer must not census cleanly")
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
          .foreach(p => p.toFile.delete())
      }
    }
  }

  test("RLEv2 sub-encodings decode the ORC spec's own worked examples") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // SHORT_REPEAT: 10000 repeated 5 times
    assert(Orc.decodeRleV2(bytes(0x0a, 0x27, 0x10), 5, signed = false)
      .toSeq === Seq.fill(5)(10000L))
    // DIRECT: [23713, 43806, 57005, 48879]
    assert(Orc.decodeRleV2(
      bytes(0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef),
      4, signed = false).toSeq === Seq(23713L, 43806L, 57005L, 48879L))
    // PATCHED_BASE: [2030, 2000, 2020, 1000000, 2040..2090 by 10] —
    // base 2000 (2 bytes), 8-bit deltas, one 12-bit patch at gap 3
    // raising 112 to 998000, patch entries at closest-fixed 14 bits
    val pbWant = Seq(2030L, 2000L, 2020L, 1000000L) ++ (2040L to 2090L by 10L)
    assert(Orc.decodeRleV2(
      bytes(0x8e, 0x09, 0x2b, 0x21, 0x07, 0xd0, 0x1e, 0x00, 0x14, 0x70,
        0x28, 0x32, 0x3c, 0x46, 0x50, 0x5a, 0xfc, 0xe8),
      10, signed = false).toSeq === pbWant)
    // DELTA: [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    assert(Orc.decodeRleV2(
      bytes(0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46),
      10, signed = false).toSeq ===
      Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L))
    // byte RLE (spec examples): a run and a literal group
    assert(Orc.decodeByteRle(bytes(0x61, 0x00), 100).toSeq ===
      Seq.fill(100)(0x00.toByte))
    assert(Orc.decodeByteRle(bytes(0xfe, 0x44, 0x45), 2).toSeq ===
      Seq(0x44.toByte, 0x45.toByte))
    // corrupt/truncated runs refuse, never throw beyond Option
    assert(Orc.decodeFlatColumns(null).isEmpty)
  }

  test("data streams decode and match Spark's reader, all five codecs") {
    import spark.implicits._
    val df = (0 until 1200).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"l${i % 23}")
    }.toDF("doc_id", "lang_n")
    val want = df.collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(x => (x._1, Option(x._2).getOrElse("")))
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val out = java.nio.file.Files.createTempDirectory("graft_orcval")
      try {
        df.repartition(2).write.option("compression", codec)
          .mode("overwrite").orc(out.resolve("d").toString)
        val bin = graft.functions.Multimodal.loadBinaryFiles(spark,
          out.resolve("d").toString, "*.orc")
          .selectExpr("monotonically_increasing_id() AS fid", "payload")
        val got = Orc.orcDecodeLongStr(bin, "fid", "payload",
          "doc_id", "lang_n")
          .select("long_val", "str_val").collect().toSeq
          .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
          .sortBy(x => (x._1, Option(x._2).getOrElse("")))
        assert(got === want, s"$codec value differential")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
          .foreach(p => p.toFile.delete())
      }
    }
    // DIRECT_V2 strings (high NDV defeats the dictionary) and
    // outlier-heavy longs (the PATCHED_BASE-shaped distribution)
    val hard = (0 until 2000).map { i =>
      (if (i % 90 == 0) (1L << 40) + i else 1000L + i * 3 % 997,
        s"u_${i}_" + "q" * (i % 11))
    }.toDF("v", "s")
    val wantHard = hard.collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
      .sorted
    val out2 = java.nio.file.Files.createTempDirectory("graft_orcval2")
    try {
      hard.coalesce(1).write.option("compression", "zlib")
        .mode("overwrite").orc(out2.resolve("d").toString)
      val bin2 = graft.functions.Multimodal.loadBinaryFiles(spark,
        out2.resolve("d").toString, "*.orc")
        .selectExpr("monotonically_increasing_id() AS fid", "payload")
      val got2 = Orc.orcDecodeLongStr(bin2, "fid", "payload", "v", "s")
        .select("long_val", "str_val").collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got2 === wantHard, "direct-v2 / outlier differential")
      // corrupt a data-region byte: the decode must refuse the file
      // (None per row), never throw
      val raw = java.nio.file.Files.list(out2.resolve("d")).toArray
        .map(_.toString).filter(_.endsWith(".orc")).head
      val fb = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(raw))
      val tail = Orc.parseTail(fb).get
      val mut = fb.clone()
      val dataStart = (tail.stripes.head._1 + tail.stripes.head._2).toInt
      (dataStart until dataStart + 8).foreach { i =>
        mut(i) = (mut(i) ^ 0x7f).toByte
      }
      val r = try Orc.decodeFlatColumns(mut)
      catch { case e: Throwable => fail(s"threw on corrupt stream: $e") }
      r.foreach { cols =>
        // if it structurally survived, the values must NOT silently
        // equal the originals
        val got3 = cols.filter(_.name == "v").flatMap(_.values)
          .map(_.asInstanceOf[java.lang.Long].longValue).sorted
        assert(got3 !== wantHard.map(_._1).sorted,
          "corrupt stream decoded to the original values")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out2).iterator().asScala.toSeq.reverse
        .foreach(p => p.toFile.delete())
    }
  }

  test("m61: timestamp/date/binary/decimal decode matches Spark's reader") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_m61spec")
    // pre-2015 seconds are NEGATIVE relative to the ORC timestamp base
    // (sign + the negative-nanos rounding rule pinned); micros exercise
    // the trailing-zero nanos scheme; every column carries nulls
    val docs = spark.range(400).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE " +
        "timestamp_micros((id - 200) * 86400000000 + id * 1001) END AS ts",
      "CASE WHEN id % 11 = 3 THEN NULL ELSE " +
        "date_add(DATE'1970-01-01', CAST(id * 37 % 25000 AS INT)) END AS d",
      "CASE WHEN id % 5 = 2 THEN NULL ELSE " +
        "CAST(concat('b', id) AS BINARY) END AS bin",
      "CASE WHEN id % 13 = 6 THEN NULL ELSE " +
        "CAST(id AS DECIMAL(12,2)) / 4 - 500.25 END AS dec")
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val p = out.resolve(codec).toString
      docs.coalesce(1).write.option("compression", codec)
        .mode("overwrite").orc(p)
      val bin = graft.functions.Multimodal.loadBinaryFiles(spark, p, "*.orc")
        .selectExpr("monotonically_increasing_id() AS fid", "payload")
      val got = graft.functions.Orc.orcDecodeTemporal(bin, "fid", "payload",
        "doc_id", "ts", "d", "bin", "dec")
        .select("long_val", "ts_micros", "date_days", "bin", "dec_str")
        .collect().toSeq.map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
          if (r.isNullAt(2)) null else Int.box(r.getInt(2)),
          if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3).toSeq,
          r.getString(4))).sortBy(_._1)
      val want = spark.read.orc(p).selectExpr("doc_id",
        "unix_micros(ts)", "datediff(d, DATE'1970-01-01')", "bin",
        "CAST(dec AS STRING)")
        .collect().toSeq.map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
          if (r.isNullAt(2)) null else Int.box(r.getInt(2)),
          if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3).toSeq,
          if (r.isNullAt(4)) null else r.getString(4))).sortBy(_._1)
      assert(got.size === want.size, s"$codec rows")
      got.zip(want).foreach { case (g, w) =>
        assert((g._1, g._2, g._3, g._4) === (w._1, w._2, w._3, w._4), s"$codec")
        // ORC stores decimals with per-value trailing zeros stripped
        // (the writer's normalization); Spark re-applies the declared
        // scale — numerically equal, textually scale-differing
        (g._5, w._5) match {
          case (null, null) => ()
          case (a: String, b: String) =>
            assert(new java.math.BigDecimal(a)
              .compareTo(new java.math.BigDecimal(b)) == 0, s"$codec $a $b")
          case other => fail(s"$codec decimal null mismatch: $other")
        }
      }
    }
  }

  test("m64: list decode matches Spark's reader, all five codecs") {
    val out = java.nio.file.Files.createTempDirectory("graft_m64spec")
    val docs = spark.range(400).selectExpr(
      "id",
      "CASE WHEN id % 7 = 0 THEN NULL " +
        "WHEN id % 7 = 1 THEN CAST(array() AS ARRAY<BIGINT>) " +
        "ELSE transform(sequence(0, CAST(id % 5 AS INT)), " +
        "i -> CASE WHEN (id + i) % 11 = 3 THEN NULL ELSE id * 10 + i END) " +
        "END AS nums",
      "CASE WHEN id % 9 = 2 THEN NULL " +
        "WHEN id % 9 = 3 THEN CAST(array() AS ARRAY<STRING>) " +
        "ELSE transform(sequence(0, CAST(id % 4 AS INT)), " +
        "i -> CASE WHEN (id + i) % 17 = 5 THEN NULL " +
        "ELSE concat('t', CAST((id + i) % 13 AS STRING)) END) END AS tags")
    Seq("none", "zlib", "snappy", "zstd", "lz4").foreach { codec =>
      val p = out.resolve(codec).toString
      docs.coalesce(1).write.option("compression", codec)
        .mode("overwrite").orc(p)
      val bin = graft.functions.Multimodal.loadBinaryFiles(spark, p, "*.orc")
        .selectExpr("monotonically_increasing_id() AS fid", "payload")
      def norm(df: org.apache.spark.sql.DataFrame, idc: String, n: String,
          t2: String) = df.selectExpr(idc, n, t2).collect().toSeq
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getSeq[Any](1).toList,
          if (r.isNullAt(2)) null else r.getSeq[Any](2).toList))
        .sortBy(_._1)
      val got = norm(graft.functions.Orc.orcDecodeLists(bin, "fid",
        "payload", "id", "nums", "tags"), "long_val", "nums", "tags")
      val want = norm(spark.read.orc(p), "id", "nums", "tags")
      assert(got === want, s"$codec")
      assert(got.exists(_._2 == null) && got.exists(_._2 == List()) &&
        got.exists(g => g._2 != null && g._2.contains(null)), s"$codec bands")
    }
  }

  test("lzo tails are recognized but refused (census-only boundary)") {
    val files = writeOrc("lzo", 60)
    files.foreach { bytes =>
      assert(Orc.parseTail(bytes) === None)
      // ...while the file is genuinely ORC (header magic present)
      assert(bytes(0) === 'O'.toByte && bytes(1) === 'R'.toByte)
    }
  }

  test("an isOriginal chunk (stored-uncompressed) footer parses") {
    // hand-rebuild a none-codec file's tail as a ZLIB stream whose one
    // chunk is ORIGINAL (header = len<<1 | 1) — the stored-chunk branch
    // a compressible-footer writer never exercises
    val none = writeOrc("none", 200).head
    val ref = Orc.parseTail(none).get
    val psLen = none(none.length - 1) & 0xff
    val psStart = none.length - 1 - psLen
    val footerStart = psStart - ref.footerBytes.toInt
    val footer = java.util.Arrays.copyOfRange(none, footerStart, psStart)
    val chunk = Array[Byte](
      ((footer.length << 1) | 1).toByte,
      (((footer.length << 1) | 1) >> 8).toByte,
      (((footer.length << 1) | 1) >> 16).toByte) ++ footer
    // fresh postscript: footerLength(1)=chunk len, compression(2)=1,
    // magic(8000)="ORC" — hand-encoded protobuf
    def pvarint(v: Long): Array[Byte] = {
      var x = v
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
      out.toArray
    }
    val ps = Array[Byte](0x08) ++ pvarint(chunk.length.toLong) ++
      Array[Byte](0x10, 0x01) ++
      pvarint((8000L << 3) | 2) ++ Array[Byte](3, 'O', 'R', 'C')
    val rebuilt = java.util.Arrays.copyOfRange(none, 0, footerStart) ++
      chunk ++ ps ++ Array[Byte](ps.length.toByte)
    val got = Orc.parseTail(rebuilt)
      .getOrElse(fail("original-chunk tail did not parse"))
    assert(got.compression === "zlib")
    assert(got.numRows === ref.numRows)
    assert(got.nTypes === ref.nTypes)
    assert(got.stripeRows === ref.stripeRows)
  }

  test("corrupt tails return None, never throw") {
    assert(Orc.parseTail(null) === None)
    assert(Orc.parseTail(Array.emptyByteArray) === None)
    assert(Orc.parseTail("ORC but not really".getBytes("US-ASCII")) === None)
    val ok = writeOrc("zlib", 100).head
    // truncated: postscript length byte gone
    assert(Orc.parseTail(ok.take(ok.length - 1)) === None)
    // postscript length mangled to overshoot the file
    val badLen = ok.clone()
    badLen(ok.length - 1) = 0xff.toByte
    assert(Orc.parseTail(badLen) === None)
    // header magic mangled
    val badMagic = ok.clone()
    badMagic(0) = 'X'
    assert(Orc.parseTail(badMagic) === None)
    // a byte inside the compressed footer flipped: chunk walk or
    // protobuf parse must refuse, never throw — swept for every
    // compressed codec path (zlib chunks, snappy blocks, lz4 blocks,
    // zstd frames each have their own decoder to harden)
    val rnd = new scala.util.Random(7L)
    Seq(ok, writeOrc("snappy", 100).head, writeOrc("zstd", 100).head,
      writeOrc("lz4", 100).head).foreach { f =>
      val psl = f(f.length - 1) & 0xff
      (0 until 200).foreach { _ =>
        val m = f.clone()
        val i = f.length - 1 - psl - 1 - rnd.nextInt(60)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        try Orc.parseTail(m)
        catch { case e: Throwable => fail(s"threw on mutated tail: $e") }
      }
      // truncation sweep over the tail region
      (1 until 40).foreach { cut =>
        try Orc.parseTail(java.util.Arrays.copyOfRange(f, 0, f.length - cut))
        catch { case e: Throwable => fail(s"threw on truncated tail: $e") }
      }
    }
    // random garbage sweep
    (0 until 300).foreach { _ =>
      val g = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      try Orc.parseTail(g)
      catch { case e: Throwable => fail(s"threw on garbage: $e") }
    }
  }
}
