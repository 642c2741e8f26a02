package graft

import graft.functions.Avro
import org.scalatest.funsuite.AnyFunSuite

/** Avro OCF block census: the fixture against its closed form, the
 * negative-count metadata-map encoding, multi-byte varints, and the
 * corrupt contract (sync mismatch, truncation, trailing bytes, varint
 * overrun). */
class AvroSpec extends AnyFunSuite {

  test("fixture decodes to the closed block form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val o = Avro.parseOcf(Avro.syntheticAvro(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(o.schema ===
        Some(s"""{"type":"record","name":"r${id % 10}","fields":[]}"""))
      assert(o.codec === Seq("null", "deflate", "snappy")((id % 3).toInt))
      val n = (1 + id % 4).toInt
      assert(o.blocks.size === n, s"id=$id")
      val schemaLen = o.schema.get.getBytes("UTF-8").length
      val headerLen = 4 + 1 + (1 + 11 + 1 + schemaLen) +
        (1 + 10 + 1 + o.codec.length) +
        (if (id % 4 == 1) 1 + 6 + 1 + 2 else 0) + 1 + 16
      var off = headerLen.toLong
      o.blocks.zipWithIndex.foreach { case ((boff, rows, bytes), k) =>
        assert(boff === off, s"id=$id k=$k")
        assert(rows === 1 + (id + k * 3) % 30, s"id=$id k=$k")
        assert(bytes === 10 + (id * 5 + k * 7) % 50, s"id=$id k=$k")
        off += 2 + bytes + 16
      }
    }
  }

  /** Hand-build an OCF exercising what the fixture can't: a
   * negative-count metadata map block (with byte-size prelude) and
   * multi-byte varints (row count and block size > 63). */
  test("negative-count map blocks and multi-byte varints parse") {
    val bo = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = { // zigzag varint, any width
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { bo.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      bo.write(z.toInt)
    }
    def strf(s: String): Unit = {
      val b = s.getBytes("UTF-8"); varint(b.length.toLong)
      bo.write(b, 0, b.length)
    }
    bo.write('O'); bo.write('b'); bo.write('j'); bo.write(1)
    // negative count: |count|=1 entries, preceded by the block byte size
    val entry = { // measure the single entry's bytes for the size field
      val t = new java.io.ByteArrayOutputStream()
      def tv(v: Long): Unit = {
        var z = (v << 1) ^ (v >> 63)
        while ((z & ~0x7fL) != 0) { t.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
        t.write(z.toInt)
      }
      def ts(s: String): Unit = {
        val b = s.getBytes("UTF-8"); tv(b.length.toLong); t.write(b, 0, b.length)
      }
      ts("avro.schema"); ts("\"long\"")
      t.toByteArray
    }
    varint(-1L)
    varint(entry.length.toLong)
    bo.write(entry, 0, entry.length)
    // a second, positive-count block for the codec
    varint(1L); strf("avro.codec"); strf("deflate")
    varint(0L)
    val sync = Array.tabulate(16)(j => (j * 11).toByte)
    bo.write(sync, 0, 16)
    // one block with multi-byte varints: 1000 rows, 300 bytes
    varint(1000L); varint(300L)
    (0 until 300).foreach(j => bo.write(j & 0xff))
    bo.write(sync, 0, 16)
    val o = Avro.parseOcf(bo.toByteArray).getOrElse(fail("did not parse"))
    assert(o.schema === Some("\"long\""))
    assert(o.codec === "deflate")
    assert(o.blocks === IndexedSeq(
      ((4 + 1 + 1 + entry.length + 1 + 11 + 8 + 1 + 16).toLong, 1000L, 300L)))
  }

  test("real-encoder extraction: every block re-extracts by locator (IDs 0-99)") {
    (0L until 100L).foreach { id =>
      val payload = Avro.syntheticRealAvro(id)
      val got = Avro.extractAllStringRecords(payload)
      if (id % 8 == 5) {
        assert(got.isEmpty, s"id=$id flipped sync must refuse")
      } else {
        val rs = got.getOrElse(fail(s"id=$id did not extract"))
        // closed form: 1+id%3 blocks, block k holds 1+(id+k)%4 records
        val want = for {
          k <- 0 until (1 + id % 3).toInt
          j <- 0 until (1 + (id + k) % 4).toInt
        } yield (k, j,
          Seq("null", "deflate", "snappy", "zstandard", "xz", "bzip2")(
            (id % 6).toInt),
          s"avro_${id}_${k}_$j" + "x" * ((id + j) % 20).toInt)
        assert(rs === want.toIndexedSeq, s"id=$id")
        // real-decoder differential: Avro's own DataFileReader over the
        // same bytes must read the identical record sequence
        val reader = new org.apache.avro.file.DataFileReader[CharSequence](
          new org.apache.avro.file.SeekableByteArrayInput(payload),
          new org.apache.avro.generic.GenericDatumReader[CharSequence](
            org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)))
        try {
          val ref = scala.collection.mutable.ArrayBuffer.empty[String]
          while (reader.hasNext) ref += reader.next().toString
          assert(rs.map(_._4) === ref.toIndexedSeq, s"id=$id vs DataFileReader")
        } finally reader.close()
      }
    }
  }

  test("a stale or forged block locator is refused, never mis-extracted") {
    val payload = Avro.syntheticRealAvro(19L) // deflate codec (19 % 6 == 1)
    val o = Avro.parseOcf(payload).get
    val sync = o.sync.toArray
    val (off, nr, nb) = o.blocks.head
    assert(Avro.extractBlockAt(payload, off, nr, nb, o.codec, sync).isDefined)
    // wrong row count / byte size / offset: header re-read must refuse
    assert(Avro.extractBlockAt(payload, off, nr + 1, nb, o.codec, sync).isEmpty)
    assert(Avro.extractBlockAt(payload, off, nr, nb + 1, o.codec, sync).isEmpty)
    assert(Avro.extractBlockAt(payload, off + 1, nr, nb, o.codec, sync).isEmpty)
    assert(Avro.extractBlockAt(payload, -1L, nr, nb, o.codec, sync).isEmpty)
    assert(Avro.extractBlockAt(payload, payload.length.toLong, nr, nb,
      o.codec, sync).isEmpty)
    // wrong sync marker: the block must not validate
    val badSync = sync.clone(); badSync(0) = (badSync(0) ^ 1).toByte
    assert(Avro.extractBlockAt(payload, off, nr, nb, o.codec, badSync).isEmpty)
    // wrong codec label: deflate bytes are not a clean snappy+crc block
    assert(Avro.extractBlockAt(payload, off, nr, nb, "snappy", sync).isEmpty)
    // a flipped byte inside a DEFLATE block payload must not decode
    // (or must decode to a different record count — never a throw)
    val m = payload.clone()
    m(off.toInt + 3) = (m(off.toInt + 3) ^ 0x40).toByte
    val res = try Avro.extractBlockAt(m, off, nr, nb, o.codec, sync)
      .flatMap(Avro.decodeStringRecords(_, nr))
    catch { case e: Throwable => fail(s"threw on mutated block: $e") }
    res.foreach { strs =>
      val want = (0 until (1 + (19 + 0) % 4)).map(j =>
        s"avro_19_0_$j" + "x" * ((19 + j) % 20))
      assert(strs != want, "mutated block decoded to the original records")
    }
  }

  test("zstandard blocks extract and a corrupt zstd frame refuses") {
    // 3 % 6 == 3 → zstandard codec; 3 % 8 != 5 → clean file
    val payload = Avro.syntheticRealAvro(3L)
    val o = Avro.parseOcf(payload).getOrElse(fail("did not parse"))
    assert(o.codec === "zstandard")
    val (off, nr, nb) = o.blocks.head
    val raw = Avro.extractBlockAt(payload, off, nr, nb, o.codec, o.sync.toArray)
    assert(raw.isDefined, "clean zstd block must extract")
    // flip a byte inside the zstd frame body: the decoder must refuse
    // (None), never throw and never return plausible bytes silently —
    // the frame's own magic/structure checks catch it
    val m = payload.clone()
    m(off.toInt + 4) = (m(off.toInt + 4) ^ 0x20).toByte
    val res = try Avro.extractBlockAt(m, off, nr, nb, o.codec, o.sync.toArray)
      .flatMap(Avro.decodeStringRecords(_, nr))
    catch { case e: Throwable => fail(s"threw on mutated zstd block: $e") }
    res.foreach { strs =>
      val want = (0 until (1 + 3 % 4)).map(j =>
        s"avro_3_0_$j" + "x" * ((3 + j) % 20))
      assert(strs != want, "mutated zstd block decoded to the original records")
    }
  }

  test("invalid UTF-8 in a string record refuses the block (strict decode)") {
    // hand-build a "block" of one record whose bytes are not UTF-8:
    // length 2, bytes 0xC3 0x28 (truncated 2-byte sequence)
    val bad = Array[Byte](0x04, 0xc3.toByte, 0x28)
    assert(Avro.decodeStringRecords(bad, 1L).isEmpty,
      "malformed UTF-8 must refuse, not U+FFFD")
    // the same length with valid UTF-8 decodes
    val good = Array[Byte](0x04, 'o'.toByte, 'k'.toByte)
    assert(Avro.decodeStringRecords(good, 1L) === Some(IndexedSeq("ok")))
  }

  test("corrupt contract: sync, truncation, trailing bytes, bad magic") {
    val good = Avro.syntheticAvro(5L)
    assert(Avro.parseOcf(good).isDefined)
    // flip a byte of the LAST block's sync marker
    val syncBad = good.clone()
    syncBad(syncBad.length - 1) = (syncBad(syncBad.length - 1) ^ 0x01).toByte
    assert(Avro.parseOcf(syncBad).isEmpty, "sync continuity must be checked")
    // truncations never parse, never throw — except at block boundaries
    // (incl. the header end), where the prefix is a complete shorter
    // file (an OCF with fewer/zero data blocks is clean per spec)
    val parsed = Avro.parseOcf(good).get
    val boundaries = parsed.blocks.map(_._1.toInt).toSet +
      (parsed.blocks.last._1 + 2 + parsed.blocks.last._3 + 16).toInt
    (1 until good.length).filterNot(boundaries).foreach { cut =>
      assert(Avro.parseOcf(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // trailing bytes after the last sync
    assert(Avro.parseOcf(good ++ Array[Byte](1)).isEmpty)
    // bad magic
    val magicBad = good.clone(); magicBad(3) = 2
    assert(Avro.parseOcf(magicBad).isEmpty)
    // a varint that never terminates (11 continuation bytes at the map
    // count position)
    val overrun = Array[Byte]('O', 'b', 'j', 1) ++
      Array.fill(11)(0x80.toByte) ++ Array.fill(20)(0.toByte)
    assert(Avro.parseOcf(overrun).isEmpty, "varint overrun must poison")
    assert(Avro.parseOcf(null).isEmpty)
  }
}
