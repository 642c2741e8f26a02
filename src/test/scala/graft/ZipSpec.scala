package graft

import graft.functions.Zip
import org.scalatest.funsuite.AnyFunSuite

/** ZIP central-directory walk: the fixture against its closed form,
 * comment back-scan, and the strict-structure contract. */
class ZipSpec extends AnyFunSuite {

  test("fixture decodes to the closed entry form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val es = Zip.parseCentralDirectory(Zip.syntheticZip(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(es.size === (1 + id % 4).toInt, s"id=$id")
      var off = 0L
      es.zipWithIndex.foreach { case (e, j) =>
        assert(e.name === s"f${id}_$j.txt", s"id=$id j=$j")
        val stored = j % 2 == 0
        val csize = if (stored) 20 + (id + j) % 30 else 10 + (id + j * 7) % 40
        val usize = if (stored) csize else 50 + (id * 3 + j) % 100
        assert(e.method === (if (stored) 0 else 8), s"id=$id j=$j")
        assert(e.compSize === csize, s"id=$id j=$j")
        assert(e.uncompSize === usize, s"id=$id j=$j")
        assert(e.crc32 === ((id * 2654435761L + j * 40503L) & 0xffffffffL))
        assert(e.localOffset === off, s"id=$id j=$j")
        assert(e.zip64 === (id % 5 == 4), s"id=$id j=$j")
        off += 30 + e.name.length + csize
      }
    }
  }

  test("zip64 archives resolve sentinels through EOCD64 + 0x0001 extras") {
    // id%5==4 fixtures: even-j entries promote usize/csize/offset, odd-j
    // promote only the offset; EOCD count/size/offset are all sentinels
    val es = Zip.parseCentralDirectory(Zip.syntheticZip(4L))
      .getOrElse(fail("zip64 fixture did not parse"))
    assert(es.nonEmpty && es.forall(_.zip64))
    // values equal the plain closed form — promotion is transparent
    var off = 0L
    es.zipWithIndex.foreach { case (e, j) =>
      assert(e.localOffset === off, s"j=$j")
      off += 30 + e.name.length + e.compSize
    }
  }

  test("a real JDK-written ZIP64 archive parses (>65,535 entries)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val n = 65_600
    val payload = "x".getBytes("UTF-8")
    (0 until n).foreach { i =>
      zos.putNextEntry(new java.util.zip.ZipEntry(s"e$i"))
      zos.write(payload)
      zos.closeEntry()
    }
    zos.close()
    val es = Zip.parseCentralDirectory(bos.toByteArray)
      .getOrElse(fail("JDK zip64 archive did not parse"))
    assert(es.size === n)
    assert(es.head.name === "e0" && es.last.name === s"e${n - 1}")
  }

  test("zip64 corruption returns None, never throws") {
    val ok = Zip.syntheticZip(4L)
    // EOCD64 locator signature mangled: sentinels then have no resolver
    val locPos = ok.length - 22 - (if (4L % 3 == 0) 3 else 0) - 20
    val badLoc = ok.clone()
    badLoc(locPos) = 'Q'
    assert(Zip.parseCentralDirectory(badLoc) === None)
    // locator's record offset mangled: EOCD64 signature check fails
    val badRec = ok.clone()
    badRec(locPos + 8) = (badRec(locPos + 8) + 1).toByte
    assert(Zip.parseCentralDirectory(badRec) === None)
    // 0x0001 extra data size mangled: the exact-promoted-width check
    // fails (entry 0 of id=4 is promote-all: name "f4_0.txt", so the
    // block's size field sits at cd + 46 + 8 + 2)
    val es = Zip.parseCentralDirectory(ok).get
    val cdStart = ok.indexOfSlice(Array[Byte]('P', 'K', 1, 2))
    assert(cdStart > 0)
    val badExtra = ok.clone()
    badExtra(cdStart + 46 + 8 + 2) = 16 // was 24
    assert(Zip.parseCentralDirectory(badExtra) === None)
    assert(es.nonEmpty) // the uncorrupted form parsed
    // total-disks field in the locator != 1 → multi-disk reject
    val badDisks = ok.clone()
    badDisks(locPos + 16) = 2
    assert(Zip.parseCentralDirectory(badDisks) === None)
  }

  test("EOCD back-scan handles both comment and no-comment files") {
    assert(Zip.parseCentralDirectory(Zip.syntheticZip(3L)).isDefined) // zc
    assert(Zip.parseCentralDirectory(Zip.syntheticZip(1L)).isDefined) // none
  }

  test("a real JDK-written ZIP parses (cross-writer sanity)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("a/b.txt"))
    zos.write("hello graft".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("c.bin"))
    zos.write(Array.tabulate[Byte](100)(_.toByte))
    zos.closeEntry()
    zos.close()
    val es = Zip.parseCentralDirectory(bos.toByteArray)
      .getOrElse(fail("JDK zip did not parse"))
    assert(es.map(_.name) === Seq("a/b.txt", "c.bin"))
    assert(es.forall(_.method == 8))
    // JDK computes real CRCs; ours must match java.util.zip's
    val crc = new java.util.zip.CRC32()
    crc.update("hello graft".getBytes("UTF-8"))
    assert(es.head.crc32 === crc.getValue)
  }

  test("a coincidental PK\\6\\7 in the last entry comment does not force ZIP64") {
    // A valid NON-zip64 archive whose last CD entry's 20-byte comment
    // begins with the EOCD64-locator signature: the signature alone must
    // not route the parse down the EOCD64 path and refuse (r14 advisory)
    // — with no EOCD field at a sentinel, a failed EOCD64 validation
    // falls back to the plain-EOCD read.
    val bo = new java.io.ByteArrayOutputStream()
    def u16w(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def u32w(v: Long): Unit = (0 until 4).foreach(i => bo.write(((v >> (8 * i)) & 0xff).toInt))
    val data = "hi".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(data)
    // local header
    bo.write(Array[Byte]('P', 'K', 3, 4)); u16w(20); u16w(0); u16w(0)
    u16w(0); u16w(0); u32w(crc.getValue); u32w(2); u32w(2); u16w(5); u16w(0)
    bo.write("a.txt".getBytes("US-ASCII")); bo.write(data)
    val cdOff = bo.size()
    // central-directory entry with a 20-byte comment opening PK\6\7;
    // the fake "locator" fields are junk (disk byte 1), so the EOCD64
    // chain cannot validate — only the fallback can accept this file
    bo.write(Array[Byte]('P', 'K', 1, 2)); u16w(20); u16w(20); u16w(0); u16w(0)
    u16w(0); u16w(0); u32w(crc.getValue); u32w(2); u32w(2)
    u16w(5); u16w(0); u16w(20); u16w(0); u16w(0); u32w(0); u32w(0)
    bo.write("a.txt".getBytes("US-ASCII"))
    bo.write(Array[Byte]('P', 'K', 6, 7)) // the coincidence
    bo.write(Array.fill[Byte](16)(1)) // junk locator fields
    val cdSize = bo.size() - cdOff
    bo.write(Array[Byte]('P', 'K', 5, 6)); u16w(0); u16w(0); u16w(1); u16w(1)
    u32w(cdSize.toLong); u32w(cdOff.toLong); u16w(0)
    val es = Zip.parseCentralDirectory(bo.toByteArray)
      .getOrElse(fail("coincidental locator signature refused a valid archive"))
    assert(es.map(_.name) === Seq("a.txt"))
    assert(es.head.crc32 === crc.getValue && !es.head.zip64)
    // but an EOCD field AT a sentinel still demands a VALID chain: the
    // same bytes with the entry count at 0xffff must refuse
    val demanded = bo.toByteArray
    val eocdPos = demanded.length - 22
    demanded(eocdPos + 10) = 0xff.toByte; demanded(eocdPos + 11) = 0xff.toByte
    assert(Zip.parseCentralDirectory(demanded) === None)
  }

  test("corrupt forms return None, never throw") {
    assert(Zip.parseCentralDirectory(null) === None)
    assert(Zip.parseCentralDirectory(Array.emptyByteArray) === None)
    assert(Zip.parseCentralDirectory("PK but not really a zip".getBytes) === None)
    val ok = Zip.syntheticZip(2L)
    // truncated: EOCD gone
    assert(Zip.parseCentralDirectory(ok.take(ok.length - 5)) === None)
    // CD offset mangled → CD no longer abuts EOCD
    val badOff = ok.clone()
    badOff(ok.length - 6) = (badOff(ok.length - 6) + 1).toByte
    assert(Zip.parseCentralDirectory(badOff) === None)
    // entry count mangled → walk does not consume cdSize exactly
    val badCount = ok.clone()
    badCount(ok.length - 12) = (badCount(ok.length - 12) + 1).toByte
    assert(Zip.parseCentralDirectory(badCount) === None)
    // multi-disk is rejected
    val badDisk = ok.clone()
    badDisk(ok.length - 18) = 1
    assert(Zip.parseCentralDirectory(badDisk) === None)
    // a local-header signature mangled → entry's offset check fails
    val badLocal = ok.clone()
    badLocal(0) = 'Q'
    assert(Zip.parseCentralDirectory(badLocal) === None)
  }

  test("extraction by locator round-trips a real-encoder archive (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val zip = Zip.syntheticRealZip(id)
      val es = Zip.parseCentralDirectory(zip)
        .getOrElse(fail(s"id=$id did not parse"))
      assert(es.size === (1 + id % 4).toInt, s"id=$id")
      es.zipWithIndex.foreach { case (e, j) =>
        val want = s"zip_${id}_${j}_" + "ab" * ((id + j) % 50).toInt
        assert(e.name === s"e${id}_$j.txt", s"id=$id j=$j")
        assert(e.method === (if (j % 2 == 0) 0 else 8), s"id=$id j=$j")
        val got = Zip.extractEntryAt(zip, e.localOffset, e.compSize,
          e.method, e.crc32, e.uncompSize)
          .getOrElse(fail(s"id=$id j=$j extraction failed"))
        assert(new String(got, "US-ASCII") === want, s"id=$id j=$j")
      }
    }
  }

  test("a stale or forged locator is refused, never mis-extracted") {
    val zip = Zip.syntheticRealZip(3L) // entries: stored j=0 .. deflated j=3
    val es = Zip.parseCentralDirectory(zip).get
    val st = es(0) // stored
    val df = es(1) // deflated
    // wrong offset (points at another entry's local header)
    assert(Zip.extractEntryAt(zip, df.localOffset, st.compSize, st.method,
      st.crc32, st.uncompSize) === None)
    // wrong CRC
    assert(Zip.extractEntryAt(zip, st.localOffset, st.compSize, st.method,
      st.crc32 ^ 1L, st.uncompSize) === None)
    // wrong lengths: short and long, both refused for the deflated entry
    assert(Zip.extractEntryAt(zip, df.localOffset, df.compSize, df.method,
      df.crc32, df.uncompSize - 1) === None)
    assert(Zip.extractEntryAt(zip, df.localOffset, df.compSize, df.method,
      df.crc32, df.uncompSize + 1) === None)
    // truncated compressed stream
    assert(Zip.extractEntryAt(zip, df.localOffset, df.compSize - 1,
      df.method, df.crc32, df.uncompSize) === None)
    // census-only method
    assert(Zip.extractEntryAt(zip, st.localOffset, st.compSize, 93,
      st.crc32, st.uncompSize) === None)
    // stored size disagreement
    assert(Zip.extractEntryAt(zip, st.localOffset, st.compSize + 1, 0,
      st.crc32, st.uncompSize) === None)
    // out-of-range and overflow-shaped locators never throw
    assert(Zip.extractEntryAt(zip, -1L, 4L, 0, 0L, 4L) === None)
    assert(Zip.extractEntryAt(zip, zip.length.toLong, 4L, 0, 0L, 4L) === None)
    assert(Zip.extractEntryAt(zip, st.localOffset, Long.MaxValue - 2, 0,
      st.crc32, Long.MaxValue - 2) === None)
    assert(Zip.extractEntryAt(null, 0L, 0L, 0, 0L, 0L) === None)
  }
}
