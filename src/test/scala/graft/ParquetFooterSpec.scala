package graft

import graft.functions.ParquetFooter
import org.scalatest.funsuite.AnyFunSuite

/** Parquet footer walk: cross-checked file-by-file against Spark's own
 * reader over the REAL sf0.001 testdata tables (row counts, leaf-column
 * counts, row-group sums), plus the corrupt contract. */
class ParquetFooterSpec extends AnyFunSuite with SparkTestBase {

  private def leaves(dt: org.apache.spark.sql.types.DataType): Int = dt match {
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.map(f => leaves(f.dataType)).sum
    case a: org.apache.spark.sql.types.ArrayType => leaves(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      leaves(m.keyType) + leaves(m.valueType)
    case _ => 1
  }

  test("real testdata footers agree with Spark's reader") {
    val dir = java.nio.file.Paths.get("/root/testdata/sf0.001")
    // every sf0.001 table except events (its TIMESTAMP(NANOS) needs the
    // legacy reader conf for the ROW count cross-check — the footer walk
    // itself doesn't care about logical types)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(s"$t.parquet"))
      val f = ParquetFooter.parseFooter(bytes)
        .getOrElse(fail(s"$t footer did not parse"))
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      assert(f.numRows === df.count(), s"$t rows")
      assert(f.numLeafColumns === leaves(df.schema), s"$t leaf columns")
      assert(f.rowGroups.map(_._1).sum === f.numRows, s"$t rg row sum")
      assert(f.rowGroups.forall(_._2 > 0), s"$t rg byte sizes")
      assert(f.createdBy.isDefined, s"$t created_by")
    }
  }

  test("a Spark-written file round-trips through the walk") {
    val out = java.nio.file.Files.createTempDirectory("graft_pqspec")
    val df = spark.range(1000).selectExpr("id", "CAST(id AS STRING) AS s",
      "id * 1.5 AS d")
    df.coalesce(1).write.mode("overwrite").parquet(out.resolve("p").toString)
    val file = java.nio.file.Files.list(out.resolve("p")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val f = ParquetFooter.parseFooter(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))).get
    assert(f.numRows === 1000L)
    assert(f.numLeafColumns === 3)
    assert(f.createdBy.exists(_.startsWith("parquet-mr")))
    assert(f.rowGroups.map(_._1).sum === 1000L)
  }

  test("column-chunk stats agree with parquet-mr's own reader, file-by-file") {
    // a Spark-written file with known value distribution and nulls
    val out = java.nio.file.Files.createTempDirectory("graft_pqchunk")
    val df = spark.range(2000).selectExpr("id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('v', lpad(CAST(id AS STRING), 6, '0')) END AS s")
    df.repartition(3).write.mode("overwrite").parquet(out.resolve("p").toString)
    val files = java.nio.file.Files.list(out.resolve("p")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length === 3)
    files.foreach { file =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(file))
      val chunks = ParquetFooter.parseColumnChunks(bytes)
        .getOrElse(fail(s"$file chunks did not parse"))
      // parquet-mr's reader over the same file (test-only dependency —
      // the product path never touches Hadoop classes)
      val conf = new org.apache.hadoop.conf.Configuration()
      val inFile = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(inFile)
      try {
        val md = reader.getFooter
        import scala.jdk.CollectionConverters._
        val refChunks = md.getBlocks.asScala.flatMap(_.getColumns.asScala)
        assert(chunks.size === refChunks.size, s"$file chunk count")
        chunks.zip(refChunks).foreach { case (mine, ref) =>
          assert(mine.path === ref.getPath.toDotString, s"$file path")
          assert(mine.numValues === ref.getValueCount, s"$file n_values")
          assert(mine.compBytes === ref.getTotalSize, s"$file comp")
          assert(mine.uncompBytes === ref.getTotalUncompressedSize,
            s"$file uncomp")
          assert(codecNamePublic(mine.codec).toUpperCase ===
            ref.getCodec.name(), s"$file codec")
          val st = ref.getStatistics
          assert(mine.nullCount === Some(st.getNumNulls), s"$file nulls")
          if (mine.path == "id") {
            assert(mine.minLong === Some(st.genericGetMin
              .asInstanceOf[java.lang.Long].longValue()), s"$file min")
            assert(mine.maxLong === Some(st.genericGetMax
              .asInstanceOf[java.lang.Long].longValue()), s"$file max")
          } else {
            assert(mine.minStr ===
              Some(st.minAsString()), s"$file min_str")
            assert(mine.maxStr ===
              Some(st.maxAsString()), s"$file max_str")
          }
        }
      } finally reader.close()
    }
    // the split-invariant envelope over all files equals the table truth
    val all = files.flatMap(f => ParquetFooter.parseColumnChunks(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))).get)
    val idChunks = all.filter(_.path == "id")
    assert(idChunks.map(_.numValues).sum === 2000L)
    assert(idChunks.flatMap(_.minLong).min === 0L)
    assert(idChunks.flatMap(_.maxLong).max === 1999L)
    val sChunks = all.filter(_.path == "s")
    assert(sChunks.flatMap(_.nullCount).sum === 400L)
  }

  test("page indexes agree with parquet-mr's own index readers, chunk-by-chunk") {
    // a Spark-written file with a 40-row page limit (forces a real page
    // split), nulls, a per-chunk sorted long column (forces ASCENDING
    // boundary order) and a bloom filter on one column only
    val out = java.nio.file.Files.createTempDirectory("graft_pqpage")
    val df = spark.range(2000).selectExpr("id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('v', lpad(CAST(id AS STRING), 6, '0')) END AS s")
    df.repartition(2).sortWithinPartitions("id").write
      .option("parquet.page.row.count.limit", "40")
      .option("parquet.bloom.filter.enabled#s", "true")
      .mode("overwrite").parquet(out.resolve("p").toString)
    val files = java.nio.file.Files.list(out.resolve("p")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length === 2)
    files.foreach { file =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(file))
      val mine = ParquetFooter.parsePageIndexes(bytes)
        .getOrElse(fail(s"$file page indexes did not parse"))
      val conf = new org.apache.hadoop.conf.Configuration()
      val inFile = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(inFile)
      try {
        import scala.jdk.CollectionConverters._
        val refChunks = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala).toSeq
        assert(mine.size === refChunks.size, s"$file chunk count")
        mine.zip(refChunks).foreach { case (m, ref) =>
          assert(m.path === ref.getPath.toDotString, s"$file path")
          val ci = reader.readColumnIndex(ref)
          val oi = reader.readOffsetIndex(ref)
          assert(ci != null && oi != null, s"$file ${m.path} indexes exist")
          assert(m.nPages === oi.getPageCount, s"$file ${m.path} pages")
          assert(m.nPages >= 2, s"$file ${m.path} page split happened")
          assert(m.nullPages ===
            ci.getNullPages.asScala.count(_.booleanValue), s"$file nullPages")
          if (ci.getNullCounts != null)
            assert(m.nullCountSum ===
              Some(ci.getNullCounts.asScala.map(_.longValue).sum),
              s"$file ${m.path} nullCounts")
          val orderName = Seq("UNORDERED", "ASCENDING", "DESCENDING")(m.boundaryOrder)
          assert(orderName === ci.getBoundaryOrder.name(),
            s"$file ${m.path} boundary order")
          // decoded envelope vs parquet-mr's raw page min/max buffers
          val nullFlags = ci.getNullPages.asScala.map(_.booleanValue).toSeq
          if (m.path == "id") {
            assert(m.boundaryOrder === 1, s"$file id sorted → ascending")
            val mins = ci.getMinValues.asScala.zip(nullFlags)
              .collect { case (bb, false) =>
                bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong }
            val maxs = ci.getMaxValues.asScala.zip(nullFlags)
              .collect { case (bb, false) =>
                bb.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong }
            assert(m.minLong === Some(mins.min), s"$file id min")
            assert(m.maxLong === Some(maxs.max), s"$file id max")
          } else {
            def str(bb: java.nio.ByteBuffer): String = {
              val d = bb.duplicate()
              val a = new Array[Byte](d.remaining()); d.get(a)
              new String(a, "UTF-8")
            }
            val mins = ci.getMinValues.asScala.zip(nullFlags)
              .collect { case (bb, false) => str(bb) }
            val maxs = ci.getMaxValues.asScala.zip(nullFlags)
              .collect { case (bb, false) => str(bb) }
            assert(m.minStr === Some(mins.min), s"$file s min")
            assert(m.maxStr === Some(maxs.max), s"$file s max")
          }
          assert(m.statsAgree, s"$file ${m.path} envelope == chunk stats")
          assert(m.oiOk, s"$file ${m.path} offset index monotonic/in-bounds")
          // bloom: present for s only, with the header's numBytes
          // matching parquet-mr's materialized bitset size
          val bf = reader.readBloomFilter(ref)
          if (m.path == "s") {
            assert(bf != null && m.bloomBytes === Some(bf.getBitsetSize.toLong),
              s"$file s bloom bytes")
            assert(m.bloomOk, s"$file s bloom header")
          } else {
            assert(bf == null && m.bloomBytes.isEmpty, s"$file id no bloom")
          }
        }
      } finally reader.close()
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
      .foreach(p => p.toFile.delete())
  }

  private def codecNamePublic(c: Int): String = c match {
    case 0 => "uncompressed"; case 1 => "snappy"; case 2 => "gzip"
    case 6 => "zstd"; case other => s"codec_$other"
  }

  test("corrupt contract: magic, footer length, truncation") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/testdata/sf0.001/region.parquet"))
    assert(ParquetFooter.parseFooter(bytes).isDefined)
    val headBad = bytes.clone(); headBad(0) = 'X'
    assert(ParquetFooter.parseFooter(headBad).isEmpty)
    val tailBad = bytes.clone(); tailBad(bytes.length - 1) = 'X'
    assert(ParquetFooter.parseFooter(tailBad).isEmpty)
    // footer length larger than the file
    val lenBad = bytes.clone()
    lenBad(bytes.length - 5) = 0x7f
    assert(ParquetFooter.parseFooter(lenBad).isEmpty)
    // truncation from the front desyncs the thrift walk or the length
    assert(ParquetFooter.parseFooter(
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2)).isEmpty)
    assert(ParquetFooter.parseFooter(null).isEmpty)
    assert(ParquetFooter.parseFooter(Array.emptyByteArray).isEmpty)
  }
}
