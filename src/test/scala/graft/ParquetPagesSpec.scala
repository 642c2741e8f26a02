package graft

import graft.functions.ParquetFooter
import org.scalatest.funsuite.AnyFunSuite

/** Parquet data-page VALUE decode (m50): differential against Spark's
 * own reader across writer versions and codecs (page-skip path), the
 * sequential path against pyarrow-written testdata (no page index),
 * null handling, and the corrupt/refusal contract. */
class ParquetPagesSpec extends AnyFunSuite with SparkTestBase {

  private def decodePairs(dir: String, longPath: String,
      strPath: String): Seq[(Long, String)] = {
    val bin = graft.functions.Multimodal.loadBinaryFiles(spark, dir, "*.parquet")
      .selectExpr("monotonically_increasing_id() AS fid", "payload")
    ParquetFooter.parquetDecodeLongStr(bin, "fid", "payload", longPath, strPath)
      .select("long_val", "str_val").collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
  }

  test("decoded values match Spark's reader across versions and codecs") {
    val out = java.nio.file.Files.createTempDirectory("graft_m50spec")
    val df = spark.range(1000).selectExpr("id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('s', CAST(id % 37 AS STRING)) END AS s")
      .repartition(2).sortWithinPartitions("id")
    val want = df.collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    for (ver <- Seq("v1", "v2");
         codec <- Seq("snappy", "zstd", "gzip", "lz4_raw", "uncompressed")) {
      val p = out.resolve(s"${ver}_$codec").toString
      df.write.option("parquet.writer.version", ver)
        .option("parquet.page.row.count.limit", "40")
        .option("compression", codec)
        .mode("overwrite").parquet(p)
      assert(decodePairs(p, "id", "s") === want, s"$ver/$codec")
    }
    // dictionary disabled: v1 falls back to PLAIN strings, v2 to
    // DELTA_BYTE_ARRAY — the non-dictionary string paths
    for (ver <- Seq("v1", "v2")) {
      val p = out.resolve(s"${ver}_nodict").toString
      df.write.option("parquet.writer.version", ver)
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "40")
        .option("compression", "snappy")
        .mode("overwrite").parquet(p)
      assert(decodePairs(p, "id", "s") === want, s"$ver/nodict")
    }
  }

  test("an all-null string column decodes (def levels carry every row)") {
    val out = java.nio.file.Files.createTempDirectory("graft_m50null")
    val df = spark.range(200).selectExpr("id", "CAST(NULL AS STRING) AS s")
    for (ver <- Seq("v1", "v2")) {
      val p = out.resolve(ver).toString
      df.coalesce(1).write.option("parquet.writer.version", ver)
        .option("parquet.page.row.count.limit", "40")
        .mode("overwrite").parquet(p)
      val got = decodePairs(p, "id", "s")
      assert(got === (0L until 200L).map(i => (i, null)), ver)
    }
  }

  test("the sequential path decodes pyarrow-written testdata (no page index)") {
    // the driver's tables carry no OffsetIndex (pyarrow default), so
    // this exercises the total_compressed_size-tiled sequential walk
    // against an INDEPENDENT writer implementation
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"))
    val chunks = ParquetFooter.decodeFlatColumns(bytes)
      .getOrElse(fail("testdata documents did not decode"))
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = ref.schema.fields.map(_.name).toSet
    // every INT64/BYTE_ARRAY chunk decoded; check two columns end-to-end
    assert(chunks.map(_.path).toSet.subsetOf(cols))
    val docIds = chunks.filter(_.path == "doc_id").flatMap(_.values)
      .map(_.asInstanceOf[java.lang.Long].longValue).sorted
    assert(docIds === ref.select("doc_id").collect()
      .map(_.getLong(0)).toIndexedSeq.sorted, "doc_id values")
    val langs = chunks.filter(_.path == "lang").flatMap(_.values)
      .map(v => if (v == null) null else v.asInstanceOf[String])
    val refLangs = ref.select("lang").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toIndexedSeq
    assert(langs.sortBy(v => if (v == null) "" else v) ===
      refLangs.sortBy(v => if (v == null) "" else v), "lang values")
  }

  test("all six physical types round-trip a Spark-written table, v1 and v2") {
    val out = java.nio.file.Files.createTempDirectory("graft_m50types")
    val df = spark.range(700).selectExpr("id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('s', CAST(id % 37 AS STRING)) END AS s",
      "CAST(id % 1000 - 500 AS INT) AS i",
      "CAST(id AS DOUBLE) / 7.0 AS d",
      "CAST(CAST(id AS FLOAT) / 3.0 AS FLOAT) AS f",
      "id % 3 = 0 AS bl")
      .repartition(2)
    val want = df.collect().toSeq.map(_.toSeq).map(_.map {
      case null => "null"
      case v => v.toString
    }.mkString("|")).sorted
    for (ver <- Seq("v1", "v2")) {
      val p = out.resolve(ver).toString
      df.write.option("parquet.writer.version", ver)
        .option("parquet.page.row.count.limit", "40")
        .mode("overwrite").parquet(p)
      val cols = df.schema.fieldNames.toSeq
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      java.nio.file.Files.list(java.nio.file.Paths.get(p)).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).foreach { f =>
          val chunks = ParquetFooter.decodeFlatColumns(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
            .getOrElse(fail(s"$ver $f did not decode"))
          chunks.groupBy(_.rgNo).foreach { case (_, cs) =>
            val byPath = cs.map(c => c.path -> c.values).toMap
            assert(byPath.keySet === cols.toSet, s"$ver all columns decoded")
            val n = byPath(cols.head).size
            (0 until n).foreach { r =>
              got += cols.map(c => byPath(c)(r) match {
                case null => "null"
                case v => v.toString
              }).mkString("|")
            }
          }
        }
      assert(got.sorted.toSeq === want, s"$ver whole-table round-trip")
    }
  }

  test("whole TPC-H tables decode from raw bytes and match Spark's reader") {
    // pyarrow-written (sequential path), all four physical type families
    Seq(
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS l_shipdate")),
      ("customer", Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"))
    ).foreach { case (table, sel) =>
      val path = s"/root/testdata/sf0.001/$table.parquet"
      val want = spark.read.parquet(path).selectExpr(sel: _*)
        .collect().toSeq.map(_.toSeq.map {
          case null => "null"
          case v => v.toString
        }.mkString("|")).sorted
      val chunks = ParquetFooter.decodeFlatColumns(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
        .getOrElse(fail(s"$table did not decode"))
      val cols = sel.map(_.split(" AS ").last.split("\\(").head.trim)
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      chunks.groupBy(_.rgNo).foreach { case (_, cs) =>
        val byPath = cs.map(c => c.path -> c.values).toMap
        assert(cols.forall(byPath.contains), s"$table all columns decoded")
        val n = byPath(cols.head).size
        (0 until n).foreach { r =>
          got += cols.map(c => byPath(c)(r) match {
            case null => "null"
            case v => v.toString
          }).mkString("|")
        }
      }
      assert(got.sorted.toSeq === want, s"$table whole-table differential")
    }
  }

  test("m57: Dremel list reassembly matches Spark's reader, v1 and v2") {
    val out = java.nio.file.Files.createTempDirectory("graft_m57spec")
    Seq("v1" -> "snappy", "v2" -> "zstd").foreach { case (ver, codec) =>
      val p = out.resolve(ver).toString
      spark.range(500).selectExpr(
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
        .coalesce(1).write.option("parquet.writer.version", ver)
        .option("parquet.page.row.count.limit", "40")
        .option("compression", codec).mode("overwrite").parquet(p)
      val cols = ParquetFooter.decodeFlatColumns(firstParquet(p))
        .getOrElse(fail(s"$ver did not decode"))
      def flat(path: String): IndexedSeq[AnyRef] =
        cols.filter(_.path == path).flatMap(_.values)
      val got = flat("id").zip(flat("nums.list.element").zip(
        flat("tags.list.element")))
        .map { case (idv, (nv, tv)) =>
          (idv.asInstanceOf[Long],
            if (nv == null) null else nv.asInstanceOf[Vector[_]].toList,
            if (tv == null) null else tv.asInstanceOf[Vector[_]].toList)
        }.sortBy(_._1)
      val want = spark.read.parquet(p).selectExpr("id", "nums", "tags")
        .collect().toSeq.map { r =>
          (r.getLong(0),
            if (r.isNullAt(1)) null else r.getSeq[Any](1).toList,
            if (r.isNullAt(2)) null else r.getSeq[Any](2).toList)
        }.sortBy(_._1)
      assert(got.size === want.size, s"$ver row count")
      got.zip(want).foreach { case (g, w) => assert(g === w, s"$ver") }
      // all four Dremel bands really occurred
      assert(got.exists(_._2 == null) && got.exists(_._2 == List()) &&
        got.exists(g => g._2 != null && g._2.contains(null)) &&
        got.exists(g => g._2 != null && g._2.exists(_ != null)), s"$ver bands")
    }
  }

  test("m62: map reassembly matches Spark's reader, v1 and v2") {
    val out = java.nio.file.Files.createTempDirectory("graft_m62spec")
    Seq("v1" -> "snappy", "v2" -> "zstd").foreach { case (ver, codec) =>
      val p = out.resolve(ver).toString
      spark.range(400).selectExpr(
        "id",
        "CASE WHEN id % 7 = 0 THEN NULL " +
          "WHEN id % 7 = 1 THEN CAST(map() AS MAP<STRING,BIGINT>) " +
          "ELSE map_from_arrays(" +
          "transform(sequence(0, CAST(id % 4 AS INT)), " +
          "i -> concat('k', CAST((id + i) % 9 AS STRING))), " +
          "transform(sequence(0, CAST(id % 4 AS INT)), " +
          "i -> CASE WHEN (id + i) % 13 = 5 THEN NULL " +
          "ELSE id * 10 + i END)) END AS m")
        .coalesce(1).write.option("parquet.writer.version", ver)
        .option("parquet.page.row.count.limit", "40")
        .option("compression", codec).mode("overwrite").parquet(p)
      val bin = graft.functions.Multimodal.loadBinaryFiles(spark, p, "*.parquet")
        .selectExpr("monotonically_increasing_id() AS fid", "payload")
      val got = graft.functions.ParquetFooter
        .parquetDecodeMap(bin, "fid", "payload", "id",
          "m.key_value.key", "m.key_value.value")
        .select("long_val", "m").collect().toSeq
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getMap[String, Any](1).toMap))
        .sortBy(_._1)
      val want = spark.read.parquet(p).select("id", "m").collect().toSeq
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getMap[String, Any](1).toMap))
        .sortBy(_._1)
      assert(got === want, s"$ver")
      assert(got.exists(_._2 == null) && got.exists(_._2 == Map()) &&
        got.exists(g => g._2 != null && g._2.values.exists(_ == null)),
        s"$ver bands")
    }
  }

  test("refusal contract: nested schemas, unsupported-only leaves, corruption") {
    val out = java.nio.file.Files.createTempDirectory("graft_m50bad")
    // single-level lists DECODE since m57 (Dremel reassembly) ...
    val nested = out.resolve("nested").toString
    spark.range(50).selectExpr("id", "array(id, id + 1) AS a")
      .coalesce(1).write.mode("overwrite").parquet(nested)
    val nb = firstParquet(nested)
    val ncols = ParquetFooter.decodeFlatColumns(nb)
      .getOrElse(fail("single-level list must decode"))
    val ac = ncols.filter(_.path == "a.list.element")
    assert(ac.nonEmpty && ac.head.values(3) === Vector(3L, 4L))
    // ... but repetition depth 2 (list of lists) is out of scope and a
    // file with no other decodable leaf refuses
    val deep = out.resolve("deep").toString
    spark.range(50).selectExpr("array(array(id)) AS aa")
      .coalesce(1).write.mode("overwrite").parquet(deep)
    assert(ParquetFooter.decodeFlatColumns(firstParquet(deep)).isEmpty,
      "rep depth 2 must refuse")
    // a table with no decodable leaf refuses (wide decimals are
    // FIXED_LEN_BYTE_ARRAY — censused, not valued)
    val dec = out.resolve("dec").toString
    spark.range(50).selectExpr("CAST(id AS DECIMAL(25, 2)) AS d")
      .coalesce(1).write.mode("overwrite").parquet(dec)
    assert(ParquetFooter.decodeFlatColumns(firstParquet(dec)).isEmpty,
      "no supported leaves must refuse")
    // a good file decodes; truncations never throw
    val good = out.resolve("good").toString
    spark.range(300).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
      .coalesce(1).write.option("parquet.page.row.count.limit", "40")
      .mode("overwrite").parquet(good)
    val gb = firstParquet(good)
    assert(ParquetFooter.decodeFlatColumns(gb).isDefined)
    Seq(4, 100, gb.length / 2, gb.length - 9, gb.length - 1).foreach { cut =>
      val r = try ParquetFooter.decodeFlatColumns(gb.take(cut))
      catch { case e: Throwable => fail(s"threw at cut=$cut: $e") }
      assert(r.isEmpty, s"cut=$cut")
    }
    // a flipped byte inside a SNAPPY-compressed page refuses (the
    // codec's own structure breaks) — locate a data page by diffing
    // against the footer region: flip early-file bytes past the magic
    val snap = out.resolve("snap").toString
    spark.range(300).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
      .coalesce(1).write.option("compression", "snappy")
      .option("parquet.page.row.count.limit", "40")
      .mode("overwrite").parquet(snap)
    val sb = firstParquet(snap)
    assert(ParquetFooter.decodeFlatColumns(sb).isDefined)
    val mut = sb.clone()
    // corrupt a run of page-body bytes well before the footer
    (40 until 60).foreach(i => mut(i) = (mut(i) ^ 0x5a).toByte)
    val r = try ParquetFooter.decodeFlatColumns(mut)
    catch { case e: Throwable => fail(s"threw on corrupt page: $e") }
    assert(r.isEmpty, "corrupt page body must refuse")
    // on an UNCOMPRESSED file a flipped value byte is structurally
    // invisible — the page CRC (parquet-mr writes one by default) must
    // catch exactly this silent-bit-rot case
    val unc = out.resolve("unc").toString
    spark.range(300).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
      .coalesce(1).write.option("compression", "uncompressed")
      .option("parquet.page.row.count.limit", "40")
      .mode("overwrite").parquet(unc)
    val ub = firstParquet(unc)
    assert(ParquetFooter.decodeFlatColumns(ub).isDefined)
    val um = ub.clone()
    um(50) = (um(50) ^ 0x01).toByte // one bit, mid page body
    assert(ParquetFooter.decodeFlatColumns(um).isEmpty,
      "page CRC must refuse a silent bit flip in an uncompressed page")
  }

  private def firstParquet(dir: String): Array[Byte] = {
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
  }
}
