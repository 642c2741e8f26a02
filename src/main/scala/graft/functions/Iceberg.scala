package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Apache Iceberg table-metadata census (m58) — the second table
 * format beside [[DeltaLog]] (m56), and the payoff of the m54 Avro
 * record decoder: Iceberg's planning metadata IS Avro. Per the public
 * Iceberg table spec (iceberg.apache.org/spec), a table directory
 * carries `metadata/v<N>.metadata.json` (table metadata: snapshots,
 * `current-snapshot-id`, each snapshot's `manifest-list`), Avro
 * MANIFEST-LIST files (one `manifest_file` record per manifest:
 * path, length, partition spec, added/existing/deleted counts) and
 * Avro MANIFEST files (one `manifest_entry` per data file: status
 * EXISTING/ADDED/DELETED and the nested `data_file` record with
 * path, format, row count, byte size). Scan planning at 100 TB reads
 * exactly this chain and never a data file — the census walks it:
 *
 *   1. the highest-versioned metadata JSON wins (the spec's
 *      version-hint behavior);
 *   2. its CURRENT snapshot's manifest list is decoded through
 *      [[AvroRecord.decodeFile]] under the declared reader schema
 *      (the spec's core projection of `manifest_file`);
 *   3. every listed manifest must be present, its byte length must
 *      EQUAL the list's `manifest_length` (locator re-validation,
 *      the family posture), and its entries decode the same way;
 *   4. live data files are the entries with status != DELETED(2) —
 *      one output row each. Older snapshots' manifest lists may
 *      exist on disk; only the current chain is reported.
 *
 * STRICT per table: a refused Avro payload, a dangling manifest
 * pointer, a length mismatch, an unparseable metadata JSON, or a
 * missing current snapshot withholds the WHOLE table — a partial
 * manifest chain is a wrong scan plan. The walk groups per table on
 * METADATA bytes only (a few KB per table); data files never move.
 *
 * Schema note: real Iceberg manifests carry field-ids and many more
 * optional fields; the fixtures write, and the reader declares, the
 * spec's required core projection — the reader-schema contract of
 * m54 applied to the manifest schemas.
 */
object Iceberg {

  /** Reader schema for manifest-list entries (`manifest_file`, core
   * projection). */
  val manifestFileSchema: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_files_count","type":"int"},
      |{"name":"existing_files_count","type":"int"},
      |{"name":"deleted_files_count","type":"int"}
      |]}""".stripMargin

  /** Reader schema for manifest entries (`manifest_entry` with the
   * nested `data_file`, core projection). */
  val manifestEntrySchema: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"]},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}
      |]}}]}""".stripMargin

  private lazy val manifestFileReader =
    AvroRecord.parseSchema(manifestFileSchema).get
      .asInstanceOf[AvroRecord.ARecord]
  private lazy val manifestEntryReader =
    AvroRecord.parseSchema(manifestEntrySchema).get
      .asInstanceOf[AvroRecord.ARecord]

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `metadata/v<N>.metadata.json` → N. */
  def metadataVersion(name: String): Option[Int] = {
    if (name == null) return None
    "^metadata/v(\\d{1,9})\\.metadata\\.json$".r.findFirstMatchIn(name)
      .map(_.group(1).toInt)
  }

  /** Output schema of [[icebergSnapshot]]. */
  val snapshotSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("path", StringType),
    StructField("file_rows", LongType),
    StructField("file_bytes", LongType),
    StructField("snapshot_id", LongType),
    StructField("spec_id", IntegerType),
    StructField("n_manifests", IntegerType)))

  /** Resolve one table's live data files from its metadata file set,
   * or None per the strict contract. Exposed for the spec. */
  def resolveTable(files: Seq[(String, Array[Byte])]):
      Option[IndexedSeq[(String, Long, Long, Long, Int, Int)]] = {
    // 1. highest metadata version wins
    val metas = files.flatMap { case (n, b) =>
      metadataVersion(n).map(v => (v, b)) }
    if (metas.isEmpty) return None
    val metaBytes = metas.maxBy(_._1)._2
    val root =
      try mapper.readTree(new String(metaBytes,
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: com.fasterxml.jackson.core.JacksonException =>
        return None }
    if (root == null || !root.isObject) return None
    val fv = Option(root.get("format-version")).filter(_.canConvertToInt)
      .map(_.asInt()).getOrElse(return None)
    if (fv != 1 && fv != 2) return None
    val current = Option(root.get("current-snapshot-id"))
      .filter(_.canConvertToLong).map(_.asLong()).getOrElse(return None)
    val snaps = Option(root.get("snapshots")).filter(_.isArray)
      .getOrElse(return None)
    var listName: String = null
    val it = snaps.elements()
    while (it.hasNext) {
      val s = it.next()
      val sid = Option(s.get("snapshot-id")).filter(_.canConvertToLong)
        .map(_.asLong())
      if (sid.contains(current)) {
        listName = Option(s.get("manifest-list")).filter(_.isTextual)
          .map(_.asText()).getOrElse(return None)
      }
    }
    if (listName == null) return None // current snapshot not listed
    val byName = files.toMap
    // 2. decode the current manifest list
    val listBytes = byName.getOrElse(listName, return None)
    val manifests = AvroRecord.decodeFile(listBytes, manifestFileReader)
      .getOrElse(return None)._2
    val out = IndexedSeq.newBuilder[(String, Long, Long, Long, Int, Int)]
    val nManifests = manifests.size
    // 3. walk every manifest; 4. emit live entries
    manifests.foreach { case (_, _, mfields) =>
      val mf = mfields.toMap
      val mPath = mf("manifest_path").asInstanceOf[String]
      val mLen = mf("manifest_length").asInstanceOf[Long]
      val specId = mf("partition_spec_id").asInstanceOf[Int]
      val mBytes = byName.getOrElse(mPath, return None) // dangling pointer
      if (mBytes.length.toLong != mLen) return None // stale locator
      val entries = AvroRecord.decodeFile(mBytes, manifestEntryReader)
        .getOrElse(return None)._2
      entries.foreach { case (_, _, efields) =>
        val e = efields.toMap
        val status = e("status").asInstanceOf[Int]
        if (status < 0 || status > 2) return None
        if (status != 2) { // not DELETED
          val df = e("data_file").asInstanceOf[Vector[(String, Any)]].toMap
          out += ((df("file_path").asInstanceOf[String],
            df("record_count").asInstanceOf[Long],
            df("file_size_in_bytes").asInstanceOf[Long],
            current, specId, nManifests))
        }
      }
    }
    Some(out.result())
  }

  /**
   * One row per LIVE data file of each table's current snapshot:
   * `(table_id, path, file_rows, file_bytes, snapshot_id, spec_id,
   * n_manifests)`. Input one row per `(table_id, file_name,
   * payload)` metadata file. Tables violating any chain invariant
   * vanish entirely. The groupBy moves metadata bytes only.
   */
  def icebergSnapshot(df: DataFrame, tableCol: String, nameCol: String,
      payloadCol: String): DataFrame = {
    val tIdx = df.schema.fieldIndex(tableCol)
    val nIdx = df.schema.fieldIndex(nameCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.groupByKey(r => r.getLong(tIdx))(Encoders.scalaLong)
      .flatMapGroups { (tid: Long, rows: Iterator[Row]) =>
        val files = rows.map { r =>
          (if (r.isNullAt(nIdx)) null else r.getString(nIdx),
            if (r.isNullAt(pIdx)) null
            else r.get(pIdx).asInstanceOf[Array[Byte]])
        }.toSeq
        resolveTable(files) match {
          case Some(live) => live.iterator.map { case (p, nr, sz, sid, sp, nm) =>
            Row(tid, p, nr, sz, sid, sp, nm)
          }
          case None => Iterator.empty
        }
      }(Encoders.row(snapshotSchema))
  }

  // ---------------------------------------------------------------
  // Fixture (real Avro writer — the m54/m49 differential posture)
  // ---------------------------------------------------------------

  private def writeAvro(schemaJson: String, sync: Array[Byte],
      records: Seq[Map[String, Any]]): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    val bo = new java.io.ByteArrayOutputStream()
    w.create(schema, bo, sync)
    records.foreach { m =>
      val rec = new GenericData.Record(schema)
      m.foreach { case (k, v) =>
        val fs = schema.getField(k).schema()
        val value: AnyRef = v match {
          case sub: Map[_, _] =>
            val rs = if (fs.getType == org.apache.avro.Schema.Type.UNION)
              fs.getTypes.get(1) else fs
            val sr = new GenericData.Record(rs)
            sub.asInstanceOf[Map[String, Any]].foreach { case (k2, v2) =>
              sr.put(k2, v2.asInstanceOf[AnyRef]) }
            sr
          case other => other.asInstanceOf[AnyRef]
        }
        rec.put(k, value)
      }
      w.append(rec)
    }
    w.close()
    bo.toByteArray
  }

  /**
   * Deterministic per-table metadata file set, replayed by the m58
   * oracle. Current snapshot `S = t*100 + 1`:
   *
   *   - `1 + t%2` manifests; manifest k holds `1 + (t+k)%3` entries;
   *     entry j: status DELETED(2) when `(t+k+j)%4 == 3`, else
   *     ADDED(1); data file `data/f-<t>-<k>-<j>.parquet` with
   *     `record_count = 10 + (t + 3*k + j) % 20` and
   *     `file_size_in_bytes = 1000 + 10*k + j`;
   *   - the manifest list records each manifest's REAL byte length;
   *   - `t%3 == 0` tables also carry an OLDER snapshot `t*100` with
   *     its own manifest list and a manifest adding
   *     `data/old-<t>.parquet` — plus a v1 metadata JSON that still
   *     points at it; the v2 JSON points at S. Only S's files may
   *     appear (metadata-version precedence + current-snapshot
   *     resolution pinned together);
   *   - negatives: `t%9 == 4` flips a byte of the current manifest
   *     LIST's final sync (Avro refuses); `t%11 == 6` references a
   *     manifest `data/missing-<t>.avro` that does not exist
   *     (dangling pointer) — either way the table vanishes.
   */
  def syntheticIcebergTable(t: Long): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    val s1 = t * 100 + 1
    def sync(seed: Long): Array[Byte] =
      Array.tabulate(16)(j => ((seed * 29 + j * 13) & 0xff).toByte)
    // manifests of the current snapshot
    val nManifests = (1 + t % 2).toInt
    val manifestNames = (0 until nManifests).map(k => s"metadata/m-$t-$k.avro")
    val manifestBytes = (0 until nManifests).map { k =>
      val entries = (0 until (1 + (t + k) % 3).toInt).map { j =>
        Map[String, Any](
          "status" -> (if ((t + k + j) % 4 == 3) 2 else 1),
          "snapshot_id" -> s1,
          "data_file" -> Map[String, Any](
            "content" -> 0,
            "file_path" -> s"data/f-$t-$k-$j.parquet",
            "file_format" -> "PARQUET",
            "record_count" -> (10 + (t + 3 * k + j) % 20),
            "file_size_in_bytes" -> (1000L + 10 * k + j)))
      }
      writeAvro(manifestEntrySchema, sync(t * 7 + k), entries)
    }
    manifestNames.zip(manifestBytes).foreach(out += _)
    // the current manifest list (REAL lengths; t%11==6 dangles)
    val listRecords = (0 until nManifests).map { k =>
      Map[String, Any](
        "manifest_path" ->
          (if (t % 11 == 6 && k == 0) s"data/missing-$t.avro"
           else manifestNames(k)),
        "manifest_length" -> manifestBytes(k).length.toLong,
        "partition_spec_id" -> 0,
        "added_files_count" -> (1 + (t + k) % 3).toInt,
        "existing_files_count" -> 0,
        "deleted_files_count" -> 0)
    }
    var listBytes = writeAvro(manifestFileSchema, sync(t * 11 + 5), listRecords)
    if (t % 9 == 4) { // splice evidence on the manifest list itself
      listBytes = listBytes.clone()
      listBytes(listBytes.length - 4) =
        (listBytes(listBytes.length - 4) ^ 0x44).toByte
    }
    val listName = s"metadata/snap-$s1.avro"
    out += ((listName, listBytes))
    // an older snapshot chain for t%3==0 (must NOT be reported)
    val snapsJson = new scala.collection.mutable.ArrayBuffer[String]
    if (t % 3 == 0) {
      val s0 = t * 100
      val oldManifest = writeAvro(manifestEntrySchema, sync(t * 3 + 1), Seq(
        Map[String, Any]("status" -> 1, "snapshot_id" -> s0,
          "data_file" -> Map[String, Any]("content" -> 0,
            "file_path" -> s"data/old-$t.parquet",
            "file_format" -> "PARQUET", "record_count" -> 5L,
            "file_size_in_bytes" -> 500L))))
      out += ((s"metadata/m-$t-old.avro", oldManifest))
      val oldList = writeAvro(manifestFileSchema, sync(t * 5 + 2), Seq(
        Map[String, Any]("manifest_path" -> s"metadata/m-$t-old.avro",
          "manifest_length" -> oldManifest.length.toLong,
          "partition_spec_id" -> 0, "added_files_count" -> 1,
          "existing_files_count" -> 0, "deleted_files_count" -> 0)))
      out += ((s"metadata/snap-$s0.avro", oldList))
      snapsJson += s"""{"snapshot-id":$s0,"sequence-number":1,"timestamp-ms":1700000000000,"manifest-list":"metadata/snap-$s0.avro"}"""
      // a v1 metadata file still pointing at the OLD snapshot
      val v1 = s"""{"format-version":2,"table-uuid":"tbl-$t","current-snapshot-id":$s0,"snapshots":[${snapsJson.mkString(",")}]}"""
      out += (("metadata/v1.metadata.json",
        v1.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    snapsJson += s"""{"snapshot-id":$s1,"sequence-number":2,"timestamp-ms":1700000001000,"manifest-list":"$listName"}"""
    val vN = if (t % 3 == 0) 2 else 1
    val metaJson = s"""{"format-version":2,"table-uuid":"tbl-$t","current-snapshot-id":$s1,"snapshots":[${snapsJson.mkString(",")}]}"""
    out += ((s"metadata/v$vN.metadata.json",
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    out.result()
  }

  /** Output schema of [[syntheticIcebergTables]]. */
  private val tableFileSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("file_name", StringType),
    StructField("payload", BinaryType)))

  /** One row per (table, metadata file) over the id column of `df`. */
  def syntheticIcebergTables(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val t = r.getLong(idIdx)
        syntheticIcebergTable(t).iterator.map { case (name, bytes) =>
          Row(t, name, bytes)
        }
      }
    }(Encoders.row(tableFileSchema))
  }
}
