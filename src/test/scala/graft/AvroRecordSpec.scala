package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Avro, AvroRecord}
import graft.functions.AvroRecord._

/** m54 — schema-driven Avro record decode: closed-form replay AND a
 * real-decoder differential (Avro's own GenericDatumReader over the
 * same bytes), schema-parser contracts, and datum-level fuzz. */
class AvroRecordSpec extends AnyFunSuite {

  private val reader = AvroRecord.parseSchema(AvroRecord.docSchemaJson)
    .get.asInstanceOf[ARecord]

  test("schema parser: full type system, named refs, refusals") {
    // the doc schema parses and round-trips its structure
    assert(reader.fields.map(_._1) === Vector("rid", "ver", "lang", "score",
      "ratio", "flag", "cat", "blob", "fp", "fp2", "tags", "props", "pos"))
    assert(reader.fields(2)._2 === AUnion(Vector(ANull, AString)))
    assert(reader.fields(8)._2 === AFixed("Fp", 8))
    assert(reader.fields(9)._2 === AFixed("Fp", 8), "named reference resolves")
    assert(reader.fields(10)._2 === AArray(AString))
    assert(reader.fields(11)._2 === AMap(ALong))
    assert(reader.fields(12)._2 ===
      ARecord("Pos", Vector(("x", ALong), ("y", ALong))))
    // namespace-qualified reference
    val ns = parseSchema(
      """{"type":"record","name":"R","namespace":"g","fields":[
        |{"name":"a","type":{"type":"fixed","name":"F","size":2}},
        |{"name":"b","type":"g.F"}]}""".stripMargin)
    assert(ns.get.asInstanceOf[ARecord].fields(1)._2 === AFixed("F", 2))
    // logical-type wrapper form decodes as the underlying type
    assert(parseSchema("""{"type":"long","logicalType":"timestamp-millis"}""")
      === Some(ALong))
    // refusals: malformed JSON, unknown type, unresolved ref, empty
    // enum, negative fixed size, recursive record (a self-reference
    // cannot resolve before registration — refused, not looped)
    assert(parseSchema("{").isEmpty)
    assert(parseSchema("\"frobnicate\"").isEmpty)
    assert(parseSchema(
      """{"type":"record","name":"R","fields":[{"name":"a","type":"Nope"}]}""")
      .isEmpty)
    assert(parseSchema(
      """{"type":"enum","name":"E","symbols":[]}""").isEmpty)
    assert(parseSchema(
      """{"type":"fixed","name":"F","size":-1}""").isEmpty)
    assert(parseSchema(
      """{"type":"record","name":"L","fields":[
        |{"name":"v","type":"long"},{"name":"next","type":["null","L"]}
        |]}""".stripMargin).isEmpty)
  }

  test("sparkTypeOf: faithful projections only") {
    import org.apache.spark.sql.types._
    assert(sparkTypeOf(reader).get.asInstanceOf[StructType].fieldNames.length === 13)
    assert(sparkTypeOf(AUnion(Vector(ANull, ALong))) === Some(LongType))
    assert(sparkTypeOf(AUnion(Vector(ALong, AString))).isEmpty,
      "a general union has no faithful relational type")
    assert(sparkTypeOf(ANull).isEmpty)
  }

  test("closed-form + real-decoder differential (IDs 0-99)") {
    import org.apache.avro.generic.{GenericRecord, GenericDatumReader}
    (0L until 100L).foreach { id =>
      val payload = AvroRecord.syntheticRecordAvro(id)
      val got = AvroRecord.decodeFile(payload, reader)
      if (id % 9 == 4) assert(got.isEmpty, s"id=$id flipped sync must refuse")
      else if (id % 11 == 6)
        assert(got.isEmpty, s"id=$id schema drift must refuse")
      else {
        val (codec, recs) = got.getOrElse(fail(s"id=$id did not decode"))
        assert(codec === Seq("null", "deflate", "snappy", "zstandard", "xz",
          "bzip2")((id % 6).toInt), s"id=$id")
        val want = for {
          k <- 0 until (1 + id % 3).toInt
          j <- 0 until (1 + (id + k) % 3).toInt
        } yield (k, j)
        assert(recs.map(r => (r._1, r._2)) === want.toIndexedSeq, s"id=$id")
        recs.foreach { case (k, j, fs) =>
          val f = fs.toMap
          assert(f("rid") === id * 1000 + k * 100 + j, s"id=$id rid")
          assert(f("ver") === (id % 1000).toInt - 500 + j, s"id=$id ver")
          assert(f("lang") ===
            (if ((id + j) % 3 == 2) null else s"l${(id + j) % 7}"), s"id=$id lang")
          assert(f("score") === (id % 100).toDouble + j * 0.25, s"id=$id score")
          assert(f("ratio") === ((id + j) % 16).toFloat / 4.0f, s"id=$id ratio")
          assert(f("flag") === ((id + k + j) % 2 == 0), s"id=$id flag")
          assert(f("cat") === s"c${(id + j) % 5}", s"id=$id cat")
          assert(f("blob").asInstanceOf[Array[Byte]].toSeq ===
            Seq.tabulate((id % 5 + j % 3).toInt)(n => ((id + n * 13) & 0xff).toByte),
            s"id=$id blob")
          assert(f("fp").asInstanceOf[Array[Byte]].toSeq ===
            Seq.tabulate(8)(n => ((id * 7 + j + n) & 0xff).toByte), s"id=$id fp")
          assert(f("fp2").asInstanceOf[Array[Byte]].toSeq ===
            Seq.tabulate(8)(n => ((id + j * 3 + n * 5) & 0xff).toByte), s"id=$id fp2")
          assert(f("tags") ===
            Vector.tabulate(j % 3)(n => s"t${(id + n) % 9}"), s"id=$id tags")
          assert(f("props") === Vector.tabulate(((id + j) % 3).toInt)(n =>
            (s"p$n", id % 50 + n * 7L)), s"id=$id props")
          assert(f("pos") === Vector(("x", id + j), ("y", id - j)), s"id=$id pos")
        }
        // differential: the real Avro reader over the same bytes
        val rdr = new org.apache.avro.file.DataFileReader[GenericRecord](
          new org.apache.avro.file.SeekableByteArrayInput(payload),
          new GenericDatumReader[GenericRecord]())
        try {
          var i = 0
          while (rdr.hasNext) {
            val ref = rdr.next()
            val (_, _, fs) = recs(i)
            val f = fs.toMap
            assert(f("rid") === ref.get("rid"), s"id=$id rid vs avro")
            assert(f("ver") === ref.get("ver"), s"id=$id ver vs avro")
            assert(Option(f("lang")).map(_.toString) ===
              Option(ref.get("lang")).map(_.toString), s"id=$id lang vs avro")
            assert(f("score") === ref.get("score"), s"id=$id score vs avro")
            assert(f("ratio") === ref.get("ratio"), s"id=$id ratio vs avro")
            assert(f("flag") === ref.get("flag"), s"id=$id flag vs avro")
            assert(f("cat") === ref.get("cat").toString, s"id=$id cat vs avro")
            val refBlob = ref.get("blob").asInstanceOf[java.nio.ByteBuffer]
            val rb = new Array[Byte](refBlob.remaining()); refBlob.get(rb)
            assert(f("blob").asInstanceOf[Array[Byte]].toSeq === rb.toSeq,
              s"id=$id blob vs avro")
            assert(f("fp").asInstanceOf[Array[Byte]].toSeq ===
              ref.get("fp").asInstanceOf[org.apache.avro.generic.GenericData.Fixed]
                .bytes().toSeq, s"id=$id fp vs avro")
            import scala.jdk.CollectionConverters._
            assert(f("tags").asInstanceOf[Vector[Any]].map(_.toString) ===
              ref.get("tags").asInstanceOf[java.util.List[AnyRef]].asScala
                .map(_.toString).toVector, s"id=$id tags vs avro")
            assert(f("props").asInstanceOf[Vector[(String, Any)]]
              .map { case (k2, v2) => (k2, v2) }.toMap ===
              ref.get("props").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
                .asScala.map { case (k2, v2) => (k2.toString, v2) }.toMap,
              s"id=$id props vs avro")
            val refPos = ref.get("pos").asInstanceOf[GenericRecord]
            assert(f("pos") === Vector(("x", refPos.get("x")),
              ("y", refPos.get("y"))), s"id=$id pos vs avro")
            i += 1
          }
          assert(i === recs.size, s"id=$id record count vs avro")
        } finally rdr.close()
      }
    }
  }

  test("datum fuzz: truncation sweep, bad indices, forged counts") {
    // a null-codec file's first block: every strict prefix refuses
    val payload = AvroRecord.syntheticRecordAvro(0L)
    val o = Avro.parseOcf(payload).get
    val (off, nr, nb) = o.blocks.head
    val block = Avro.extractBlockAt(payload, off, nr, nb, o.codec,
      o.sync.toArray).get
    assert(decodeRecordBlock(block, nr, reader).isDefined)
    (0 until block.length).foreach { cut =>
      assert(decodeRecordBlock(block.take(cut), nr, reader).isEmpty,
        s"prefix $cut must refuse")
    }
    // trailing garbage refuses (must consume exactly)
    assert(decodeRecordBlock(block :+ 0.toByte, nr, reader).isEmpty)
    // wrong expected count refuses
    assert(decodeRecordBlock(block, nr + 1, reader).isEmpty)
    // enum index out of range: zigzag(7) = 14
    val enum5 = AEnum("E", Vector("a", "b", "c", "d", "e"))
    assert(decodeDatum(Array[Byte](14), 0, 1, enum5) == null)
    assert(decodeDatum(Array[Byte](4), 0, 1, enum5)._1 === "c")
    // union branch out of range: zigzag(2) = 4 against 2 branches
    val u = AUnion(Vector(ANull, AString))
    assert(decodeDatum(Array[Byte](4), 0, 1, u) == null)
    assert(decodeDatum(Array[Byte](0), 0, 1, u)._1 === null)
    // boolean bytes other than 0/1 are corruption
    assert(decodeDatum(Array[Byte](2), 0, 1, ABool) == null)
    // invalid UTF-8 in a string refuses (never U+FFFD)
    assert(decodeDatum(Array[Byte](4, 0xc3.toByte, 0x28), 0, 3, AString) == null)
    // forged array count: zigzag(1000) varint with 3 bytes left
    val bigCount = Array[Byte](0xd0.toByte, 0x0f, 1, 2, 3)
    assert(decodeDatum(bigCount, 0, bigCount.length, AArray(ALong)) == null)
    // int datum outside 32-bit range refuses under "int"
    val big = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x20) // zigzag varint of 2^32
    assert(decodeDatum(big, 0, big.length, AInt) == null)
    assert(decodeDatum(big, 0, big.length, ALong)._1 === (1L << 32))
  }

  test("array/map block forms: negative-count + zero-size-item cap") {
    // hand-encoded array<long> in the NEGATIVE-count block-size form:
    // count -2 (zigzag 3), byte size 2, items 7 and -3 (zigzag 14, 5),
    // terminator 0
    val neg = Array[Byte](3, 4, 14, 5, 0)
    val d = decodeDatum(neg, 0, neg.length, AArray(ALong))
    assert(d._1 === Vector(7L, -3L) && d._2 === neg.length)
    // array<null>: items occupy zero bytes — count 3 then terminator
    val nulls = Array[Byte](6, 0)
    assert(decodeDatum(nulls, 0, nulls.length, AArray(ANull))._1 ===
      Vector(null, null, null))
    // a crafted count beyond the zero-size-item cap refuses: zigzag
    // varint of 2^21 (> 1<<20 cap)
    val capped = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 2, 0)
    assert(decodeDatum(capped, 0, capped.length, AArray(ANull)) == null)
    // map encounter order is preserved (p0 before p1) and keys decode
    val payload = AvroRecord.syntheticRecordAvro(1L) // deflate, 2 blocks
    val recs = AvroRecord.decodeFile(payload, reader).get._2
    val withProps = recs.map(_._3.toMap).find(f =>
      f("props").asInstanceOf[Vector[_]].size == 2).get
    assert(withProps("props") === Vector(("p0", 1L), ("p1", 8L)))
  }
}
