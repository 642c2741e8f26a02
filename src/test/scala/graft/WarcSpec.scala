package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {

  test("build -> parse round-trips records with exact payload bytes") {
    val docs = Seq((1L, "hello world"), (2L, "second doc\nwith a newline"),
      (3L, ""), (4L, "payload with \r\n\r\n inside"))
    val blob = docs.flatMap { case (id, text) =>
      Warc.buildRecord(s"<urn:uuid:$id>", s"https://x.example.org/$id",
        text.getBytes(UTF_8))
    }.toArray
    val parsed = Warc.parseWarc(
      df(Seq(Seq("f.warc", blob)), "file:str,bytes:binary"), "file", "bytes")
      .collect().sortBy(_.getAs[String]("target_uri"))
    assert(parsed.length == 4)
    docs.zip(parsed.sortBy(_.getAs[String]("record_id"))).foreach {
      case ((id, text), r) =>
        assert(r.getAs[String]("record_id") == s"<urn:uuid:$id>")
        assert(r.getAs[String]("warc_type") == "conversion")
        assert(r.getAs[String]("target_uri") == s"https://x.example.org/$id")
        assert(r.getAs[String]("content_type") == "text/plain")
        assert(r.getAs[Long]("content_length") == text.getBytes(UTF_8).length.toLong)
        assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) == text)
    }
  }

  test("readWarc ingests real files, plain and gzipped (multi-member)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_").toString
    val recA = Warc.buildRecord("<urn:uuid:a>", "https://e.org/a", "aaa".getBytes(UTF_8))
    val recB = Warc.buildRecord("<urn:uuid:b>", "https://e.org/b", "bbbb".getBytes(UTF_8))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "one.warc"),
      recA ++ recB)
    // .warc.gz in its standard shape: one gzip MEMBER per record
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "two.warc.gz"),
      gz(recA) ++ gz(recB))
    val rows = Warc.readWarc(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.count(_.getAs[String]("file").endsWith("one.warc")) == 2)
    assert(rows.count(_.getAs[String]("file").endsWith("two.warc.gz")) == 2)
    assert(rows.filter(_.getAs[String]("record_id") == "<urn:uuid:b>")
      .forall(r => new String(r.getAs[Array[Byte]]("payload"), UTF_8) == "bbbb"))
  }

  test("malformed archives raise loudly with file and offset") {
    def parseBlob(b: Array[Byte]) = Warc.parseWarc(
      df(Seq(Seq("bad.warc", b)), "file:str,bytes:binary"), "file", "bytes")
      .collect()
    val truncated = Warc.buildRecord("<urn:uuid:t>", "u", "0123456789".getBytes(UTF_8))
      .dropRight(8) // cuts into the payload
    val e1 = intercept[Exception](parseBlob(truncated))
    assert(Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .take(6).exists(t => Option(t.getMessage).exists(_.contains("bad.warc"))))
    val notWarc = "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)
    val e2 = intercept[Exception](parseBlob(notWarc))
    assert(Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .take(6).exists(t => Option(t.getMessage).exists(_.contains("malformed"))))
    val noLen = ("WARC/1.0\r\nWARC-Type: x\r\n\r\n" + "abc\r\n\r\n").getBytes(UTF_8)
    val e3 = intercept[Exception](parseBlob(noLen))
    assert(Iterator.iterate(e3: Throwable)(_.getCause).takeWhile(_ != null)
      .take(6).exists(t => Option(t.getMessage).exists(_.contains("Content-Length"))))
  }

  test("warc.gz random-access locator agrees with the whole-file parse") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"doc body $i " + ("x" * (i % 40).toInt)))
      .toDF("doc_id", "text")
    val files = Warc.syntheticWarcGzFiles(docs, "doc_id", "text", nFiles = 4)
      .localCheckpoint(true)
    val located = Warc.locateWarcGzRecords(files, "file_name", "content")
      .select("file", "record_id", "warc_type", "target_uri",
        "content_type", "content_length", "payload")
    val whole = Warc.parseWarc(files, "file_name", "content")
    assert(graft.api.DfUtils.dfEq(located, whole))
    // member ordinals follow id order within each bucket
    val ords = Warc.locateWarcGzRecords(files, "file_name", "content")
      .select(expr("CAST(regexp_extract(target_uri, 'doc/(\\\\d+)$', 1) AS BIGINT)")
        .as("id"), col("member_no"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    (0L until 60L).foreach { id =>
      assert(ords(id) === (id / 4).toInt, s"id=$id")
    }
  }

  test("syntheticWarcFiles buckets by id and parses back to the corpus") {
    val docs = df((0L until 40L).map(i => Seq(i, s"doc $i body")),
      "doc_id:long,text:str")
    val files = Warc.syntheticWarcFiles(docs, "doc_id", "text", nFiles = 4)
    val names = files.select("file_name").collect().map(_.getString(0)).sorted
    assert(names.toSeq == (0 until 4).map(b => f"part_$b%05d.warc"))
    val back = Warc.parseWarc(files, "file_name", "content")
      .select(
        expr("CAST(regexp_extract(target_uri, 'doc/(\\\\d+)$', 1) AS BIGINT)")
          .as("doc_id"),
        col("payload").cast("string").as("text"))
    assertDfEq(back, (0L until 40L).map(i => Seq(i, s"doc $i body")))
  }
}
