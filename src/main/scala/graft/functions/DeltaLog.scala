package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Delta Lake `_delta_log` census (m56) — the TABLE-FORMAT metadata
 * walk for the modern lake, composing the family's ladder one level
 * up: where m37/m48/m50 walk one parquet FILE's metadata and values,
 * this walks the transaction log that decides WHICH parquet files are
 * live. At 100 TB the log is the query planner's entry point: live
 * file set, per-file row counts (from `add.stats`), schema width and
 * partition columns, protocol gates — all without touching a single
 * data file.
 *
 * Format facts honored (the public Delta Lake transaction protocol —
 * delta.io PROTOCOL.md): a commit is `_delta_log/<20-digit
 * zero-padded version>.json`, a JSON-LINES file of single-key action
 * objects (`protocol` / `metaData` / `add` / `remove` / `commitInfo`
 * / `txn`); table state at version V is the replay of all commits
 * `<= V` — an `add` makes a path live, a later `remove` tombstones
 * it, the LATEST action per path wins, and the latest `metaData` /
 * `protocol` define schema and reader gates. `add.stats` is itself a
 * JSON string whose `numRecords` is the per-file row count.
 *
 * Census shape, Spark-first: the per-file PARSE is a narrow map (one
 * row per action, O(bytes), Jackson streaming precedent of [[Json]]);
 * the STATE RECONSTRUCTION is declarative — a window over (table,
 * path) ordered by version picks each path's final action, a second
 * window picks the latest metaData, and the verdict aggregation is an
 * ordinary Catalyst groupBy. The shuffle carries action projections
 * (a few dozen bytes per action), never data bytes — the only shape
 * that survives a million-table lake.
 *
 * Strict posture: a commit file that is not EXACTLY one JSON object
 * per non-empty line, an action object without exactly one known
 * action key, a malformed `stats` string, a non-`<digits>.json`
 * file name, or a missing field the protocol requires (`add.path`,
 * `remove.path`, `metaData.schemaString`) poisons the WHOLE TABLE —
 * every row of that table is withheld (an anti-join on the bad
 * marker), because a half-replayed log is a wrong live set, not a
 * partial one.
 */
object DeltaLog {

  import com.fasterxml.jackson.databind.JsonNode

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One parsed action (projected). kind: add / remove / meta /
   * protocol / info / txn / bad. */
  final case class Action(kind: String, path: String, size: Long,
      numRecords: java.lang.Long, nFields: Int, nPartCols: Int,
      minReader: Int, minWriter: Int)

  /** Parse one commit file's JSON lines into projected actions; None
   * on any malformation (the table-poisoning contract above). */
  def parseCommit(content: String): Option[IndexedSeq[Action]] = {
    if (content == null) return None
    val out = IndexedSeq.newBuilder[Action]
    content.split("\n", -1).foreach { line =>
      if (line.trim.nonEmpty) {
        val node =
          try mapper.readTree(line)
          catch { case _: com.fasterxml.jackson.core.JacksonException =>
            return None }
        if (node == null || !node.isObject || node.size() != 1) return None
        val key = node.fieldNames().next()
        val body = node.get(key)
        if (!body.isObject) return None
        key match {
          case "add" =>
            val path = textField(body, "path").getOrElse(return None)
            val size = Option(body.get("size")).filter(_.canConvertToLong)
              .map(_.asLong()).getOrElse(-1L)
            // stats is a JSON STRING; absent is legal (rows unknown),
            // malformed is not
            val nr: java.lang.Long = Option(body.get("stats")) match {
              case Some(s) if s.isTextual =>
                val sn =
                  try mapper.readTree(s.asText())
                  catch { case _: com.fasterxml.jackson.core.JacksonException =>
                    return None }
                if (sn == null || !sn.isObject) return None
                Option(sn.get("numRecords")).filter(_.canConvertToLong)
                  .map(v => Long.box(v.asLong())).orNull
              case Some(_) => return None
              case None => null
            }
            out += Action("add", path, size, nr, 0, 0, 0, 0)
          case "remove" =>
            val path = textField(body, "path").getOrElse(return None)
            out += Action("remove", path, 0L, null, 0, 0, 0, 0)
          case "metaData" =>
            val ss = textField(body, "schemaString").getOrElse(return None)
            val sn =
              try mapper.readTree(ss)
              catch { case _: com.fasterxml.jackson.core.JacksonException =>
                return None }
            if (sn == null || !sn.isObject) return None
            val fields = Option(sn.get("fields")).filter(_.isArray)
              .map(_.size()).getOrElse(return None)
            val pc = Option(body.get("partitionColumns")).filter(_.isArray)
              .map(_.size()).getOrElse(0)
            out += Action("meta", null, 0L, null, fields, pc, 0, 0)
          case "protocol" =>
            val mr = Option(body.get("minReaderVersion"))
              .filter(_.canConvertToInt).map(_.asInt()).getOrElse(return None)
            val mw = Option(body.get("minWriterVersion"))
              .filter(_.canConvertToInt).map(_.asInt()).getOrElse(return None)
            out += Action("protocol", null, 0L, null, 0, 0, mr, mw)
          case "commitInfo" => out += Action("info", null, 0L, null, 0, 0, 0, 0)
          case "txn" => out += Action("txn", null, 0L, null, 0, 0, 0, 0)
          case _ => return None // protocol drift: an unknown action
        }
      }
    }
    Some(out.result())
  }

  private def textField(n: JsonNode, name: String): Option[String] =
    Option(n.get(name)).filter(_.isTextual).map(_.asText())

  /** `<20-digit>.json` → version, else None. */
  def commitVersion(fileName: String): Option[Long] = {
    if (fileName == null) return None
    val m = "^(\\d{1,20})\\.json$".r.findFirstMatchIn(fileName)
    m.flatMap(mm => try Some(mm.group(1).toLong)
      catch { case _: NumberFormatException => None })
  }

  private val actionSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("version", LongType),
    StructField("kind", StringType),
    StructField("path", StringType),
    StructField("size", LongType),
    StructField("num_records", LongType),
    StructField("n_fields", IntegerType),
    StructField("n_part_cols", IntegerType),
    StructField("min_reader", IntegerType),
    StructField("min_writer", IntegerType)))

  /**
   * Snapshot reconstruction over a corpus of commit files: input one
   * row per `(table_id, file_name, content)`; output one row per LIVE
   * data file at each table's latest version —
   * `(table_id, path, file_rows, file_bytes, latest_version,
   * n_commits, n_fields, n_part_cols, min_reader, min_writer)` —
   * with any table carrying one malformed commit withheld entirely.
   */
  def deltaSnapshot(df: DataFrame, tableCol: String, nameCol: String,
      contentCol: String): DataFrame = {
    val tIdx = df.schema.fieldIndex(tableCol)
    val nIdx = df.schema.fieldIndex(nameCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val actions = df.mapPartitions { it =>
      it.flatMap { r =>
        val tid = r.getLong(tIdx)
        val name = if (r.isNullAt(nIdx)) null else r.getString(nIdx)
        val content = if (r.isNullAt(cIdx)) null else r.getString(cIdx)
        commitVersion(name).flatMap(v =>
          parseCommit(content).map(as => (v, as))) match {
          case Some((v, as)) =>
            as.iterator.map(a => Row(tid, v, a.kind, a.path, a.size,
              a.numRecords, a.nFields, a.nPartCols, a.minReader, a.minWriter))
          case None =>
            Iterator.single(Row(tid, -1L, "bad", null, 0L, null,
              0, 0, 0, 0))
        }
      }
    }(Encoders.row(actionSchema))

    // tables with any malformed commit are withheld entirely
    val bad = actions.filter(col("kind") === "bad")
      .select(col("table_id")).distinct()
    val ok = actions.join(broadcast(bad), Seq("table_id"), "left_anti")

    // each path's FINAL action decides liveness (latest version wins)
    val byPath = Window.partitionBy("table_id", "path")
      .orderBy(col("version").desc)
    val live = ok.filter(col("kind").isin("add", "remove"))
      .withColumn("rn", row_number().over(byPath))
      .filter(col("rn") === 1 && col("kind") === "add")
      .select(col("table_id"), col("path"),
        col("num_records").as("file_rows"), col("size").as("file_bytes"))

    // latest metaData / protocol + commit count per table
    val byTable = Window.partitionBy("table_id")
      .orderBy(col("version").desc)
    val meta = ok.filter(col("kind") === "meta")
      .withColumn("rn", row_number().over(byTable)).filter(col("rn") === 1)
      .select(col("table_id"), col("n_fields"), col("n_part_cols"))
    val proto = ok.filter(col("kind") === "protocol")
      .withColumn("rn", row_number().over(byTable)).filter(col("rn") === 1)
      .select(col("table_id"), col("min_reader"), col("min_writer"))
    val commits = ok.groupBy("table_id").agg(
      max(col("version")).as("latest_version"),
      countDistinct(col("version")).cast("long").as("n_commits"))

    live.join(commits, Seq("table_id"))
      .join(broadcast(meta), Seq("table_id"))
      .join(broadcast(proto), Seq("table_id"))
      .select(col("table_id"), col("path"), col("file_rows"),
        col("file_bytes"), col("latest_version"), col("n_commits"),
        col("n_fields"), col("n_part_cols"),
        col("min_reader"), col("min_writer"))
  }

  // ---------------------------------------------------------------
  // Fixture
  // ---------------------------------------------------------------

  /** Output schema of [[syntheticDeltaLogs]]. */
  private val logFileSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("file_name", StringType),
    StructField("content", StringType)))

  // ---------------------------------------------------------------
  // Checkpointed snapshot reconstruction (m59) — where the Delta
  // ladder meets the parquet decoder: `_last_checkpoint` names a
  // checkpoint PARQUET holding the replayed state at version C, and
  // the census reads it through the repo's OWN page-level decoder
  // (m50/m57 — including the struct-nested leaves and the
  // partitionColumns LIST), then applies only the JSON commits with
  // version > C. Commits at or before C are never parsed — a
  // corrupted pre-checkpoint log is invisible, exactly the skip a
  // 100 TB reader relies on.
  // ---------------------------------------------------------------

  /** Output schema of [[deltaSnapshotCheckpointed]]. */
  val checkpointedSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("path", StringType),
    StructField("file_rows", LongType),
    StructField("file_bytes", LongType),
    StructField("latest_version", LongType),
    StructField("n_commits", LongType),
    StructField("n_fields", IntegerType),
    StructField("n_part_cols", IntegerType),
    StructField("min_reader", IntegerType),
    StructField("min_writer", IntegerType),
    StructField("checkpoint_version", LongType)))

  /** Resolve one table's live set from its `_delta_log` file set —
   * checkpoint-based when `_last_checkpoint` is present, pure JSON
   * replay otherwise. None per the strict table-poisoning contract
   * (now including: dangling or undecodable checkpoint, checkpoint
   * row count disagreeing with `_last_checkpoint.size`,
   * non-contiguous commit versions, malformed POST-checkpoint
   * commit). Exposed for the spec. */
  def resolveCheckpointed(files: Seq[(String, Array[Byte])]):
      Option[IndexedSeq[(String, java.lang.Long, Long, Long, Long, Int,
        Int, Int, Int, Long)]] = {
    val commits = files.flatMap { case (n, b) =>
      commitVersion(n).map(v => (v, b)) }.sortBy(_._1)
    if (commits.isEmpty) return None
    val nv = commits.last._1
    if (commits.map(_._1) != (0L to nv)) return None // must be contiguous
    val byName = files.toMap
    val utf8 = java.nio.charset.StandardCharsets.UTF_8

    var cVersion = -1L
    // state: path -> (numRecords nullable, size)
    val base = scala.collection.mutable.LinkedHashMap
      .empty[String, (java.lang.Long, Long)]
    var nFields = -1
    var nPartCols = -1
    var minReader = -1
    var minWriter = -1

    byName.get("_last_checkpoint") match {
      case Some(lcBytes) =>
        val lc =
          try mapper.readTree(new String(lcBytes, utf8))
          catch { case _: com.fasterxml.jackson.core.JacksonException =>
            return None }
        if (lc == null || !lc.isObject) return None
        cVersion = Option(lc.get("version")).filter(_.canConvertToLong)
          .map(_.asLong()).getOrElse(return None)
        val cSize = Option(lc.get("size")).filter(_.canConvertToLong)
          .map(_.asLong()).getOrElse(return None)
        if (cVersion < 0 || cVersion > nv) return None
        val cName = f"$cVersion%020d.checkpoint.parquet"
        val cBytes = byName.getOrElse(cName, return None) // dangling
        val chunks = ParquetFooter.decodeFlatColumns(cBytes)
          .getOrElse(return None)
        // flatten row-group chunks into whole-file columns by path
        val cols = chunks.groupBy(_.path).map { case (p, cs) =>
          p -> cs.sortBy(_.rgNo).flatMap(_.values) }
        val n = cols.values.headOption.map(_.size).getOrElse(0)
        if (cols.values.exists(_.size != n)) return None
        if (n.toLong != cSize) return None // size is a locator too
        def colAt(p: String, i: Int): AnyRef =
          cols.get(p).map(_(i)).orNull
        var i = 0
        while (i < n) {
          val addPath = colAt("add.path", i)
          val removePath = colAt("remove.path", i)
          val schemaStr = colAt("metaData.schemaString", i)
          val protoMin = colAt("protocol.minReaderVersion", i)
          if (addPath != null) {
            val stats = colAt("add.stats", i)
            val nr: java.lang.Long =
              if (stats == null) null
              else {
                val sn =
                  try mapper.readTree(stats.asInstanceOf[String])
                  catch {
                    case _: com.fasterxml.jackson.core.JacksonException =>
                      return None }
                if (sn == null || !sn.isObject) return None
                Option(sn.get("numRecords")).filter(_.canConvertToLong)
                  .map(v => Long.box(v.asLong())).orNull
              }
            val size = colAt("add.size", i) match {
              case l: java.lang.Long => l.longValue()
              case _ => -1L
            }
            base(addPath.asInstanceOf[String]) = (nr, size)
          } else if (removePath != null) {
            base.remove(removePath.asInstanceOf[String])
          } else if (schemaStr != null) {
            val sn =
              try mapper.readTree(schemaStr.asInstanceOf[String])
              catch { case _: com.fasterxml.jackson.core.JacksonException =>
                return None }
            if (sn == null || !sn.isObject) return None
            nFields = Option(sn.get("fields")).filter(_.isArray)
              .map(_.size()).getOrElse(return None)
            colAt("metaData.partitionColumns.list.element", i) match {
              case v: Vector[_] => nPartCols = v.size
              case null => nPartCols = 0
              case _ => return None
            }
          } else if (protoMin != null) {
            minReader = protoMin.asInstanceOf[java.lang.Integer].intValue()
            minWriter = colAt("protocol.minWriterVersion", i) match {
              case w: java.lang.Integer => w.intValue()
              case _ => return None
            }
          } else return None // a checkpoint row carrying no action
          i += 1
        }
      case None => () // no checkpoint: pure replay from version 0
    }

    // apply the JSON commits AFTER the checkpoint (or all of them)
    commits.foreach { case (v, bytes) =>
      if (v > cVersion) {
        val as = parseCommit(new String(bytes, utf8))
          .getOrElse(return None)
        as.foreach { a =>
          a.kind match {
            case "add" => base(a.path) = (a.numRecords, a.size)
            case "remove" => base.remove(a.path)
            case "meta" => nFields = a.nFields; nPartCols = a.nPartCols
            case "protocol" =>
              minReader = a.minReader; minWriter = a.minWriter
            case _ => ()
          }
        }
      }
    }
    if (nFields < 0 || minReader < 0) return None // metadata never seen
    val out = IndexedSeq.newBuilder[(String, java.lang.Long, Long, Long,
      Long, Int, Int, Int, Int, Long)]
    base.foreach { case (p, (nr, sz)) =>
      out += ((p, nr, sz, nv, commits.size.toLong, nFields, nPartCols,
        minReader, minWriter, cVersion))
    }
    Some(out.result())
  }

  /** [[resolveCheckpointed]] over a corpus: input one row per
   * `(table_id, file_name, payload)`; output the m56 columns plus
   * `checkpoint_version` (−1 for tables replayed without one). The
   * groupBy moves log metadata bytes only. */
  def deltaSnapshotCheckpointed(df: DataFrame, tableCol: String,
      nameCol: String, payloadCol: String): DataFrame = {
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
        resolveCheckpointed(files) match {
          case Some(live) => live.iterator.map {
            case (p, nr, sz, lv, nc, nf, npc, mr, mw, cv) =>
              Row(tid, p, nr, sz, lv, nc, nf, npc, mr, mw, cv)
          }
          case None => Iterator.empty
        }
      }(Encoders.row(checkpointedSchema))
  }

  /**
   * Deterministic per-table commit files, replayed by the m56 oracle:
   *
   *   - v0: `commitInfo` + `protocol` (minReader 1, minWriter 2) +
   *     `metaData` (schema of `2 + t%3` fields, `t%2` partition
   *     columns) + `1 + t%3` adds `part-0-<i>.parquet`;
   *   - commits v = 1 .. t%4: `commitInfo` + one add
   *     `part-<v>-0.parquet`; ODD v also removes `part-<v-1>-0
   *     .parquet` (so the final live set exercises real tombstoning);
   *   - add (v,i): `size = 100 + 3*v + i`; `stats.numRecords =
   *     10 + (t + 7*v + i) % 20`, except `(t+v+i)%5 == 4` adds OMIT
   *     stats (rows unknown — the nullable path);
   *   - negatives: `t%9 == 4` truncates one JSON line mid-object in
   *     the LAST commit; `t%11 == 6` carries an unknown action
   *     (`futureAction`) — either way the whole table must vanish
   *     from the snapshot.
   */
  def syntheticDeltaLog(t: Long,
      negatives: Boolean = true): Seq[(String, String)] = {
    def addJson(v: Long, i: Long): String = {
      val stats =
        if ((t + v + i) % 5 == 4) ""
        else ","+"\"stats\":" + mapper.writeValueAsString(
          s"""{"numRecords":${10 + (t + 7 * v + i) % 20}}""")
      s"""{"add":{"path":"part-$v-$i.parquet","partitionValues":{},""" +
        s""""size":${100 + 3 * v + i},"modificationTime":${1700000000000L + v},""" +
        s""""dataChange":true$stats}}"""
    }
    val nv = (t % 4).toInt
    (0 to nv).map { v =>
      val name = f"$v%020d.json"
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      lines += s"""{"commitInfo":{"operation":"${if (v == 0) "CREATE TABLE" else "WRITE"}","timestamp":${1700000000000L + v}}}"""
      if (v == 0) {
        lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
        // schemaString is a JSON document nested INSIDE a JSON string —
        // built as real JSON, then escaped through Jackson like any
        // conformant writer would
        val fieldsJson = (0 until (2 + t % 3).toInt).map(i =>
          s"""{"name":"c$i","type":"long","nullable":true,"metadata":{}}""")
          .mkString(",")
        val schemaString = mapper.writeValueAsString(
          s"""{"type":"struct","fields":[$fieldsJson]}""")
        val parts = if (t % 2 == 1) "\"c0\"" else ""
        lines += s"""{"metaData":{"id":"tbl-$t","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$schemaString,"partitionColumns":[$parts],""" +
          s""""configuration":{},"createdTime":1700000000000}}"""
        (0 until (1 + t % 3).toInt).foreach(i => lines += addJson(0, i))
      } else {
        lines += addJson(v, 0)
        if (v % 2 == 1)
          lines += s"""{"remove":{"path":"part-${v - 1}-0.parquet","deletionTimestamp":${1700000000500L + v},"dataChange":true}}"""
      }
      if (negatives && v == nv && t % 11 == 6)
        lines += """{"futureAction":{"x":1}}"""
      var content = lines.mkString("\n") + "\n"
      if (negatives && v == nv && t % 9 == 4)
        content = content.dropRight(8) // truncate mid-object
      (name, content)
    }
  }

  // ---- m59 fixture: checkpointed tables -------------------------

  private val checkpointMessageType: String =
    """message delta_checkpoint {
      |  optional group add {
      |    optional binary path (STRING);
      |    optional int64 size;
      |    optional binary stats (STRING);
      |  }
      |  optional group remove { optional binary path (STRING); }
      |  optional group metaData {
      |    optional binary schemaString (STRING);
      |    optional group partitionColumns (LIST) {
      |      repeated group list { optional binary element (STRING); }
      |    }
      |  }
      |  optional group protocol {
      |    optional int32 minReaderVersion;
      |    optional int32 minWriterVersion;
      |  }
      |}""".stripMargin

  /** A parquet OutputFile over a heap buffer (the public parquet-mr
   * OutputFile SPI — no filesystem involved). */
  private class BytesOutputFile(bo: java.io.ByteArrayOutputStream)
      extends org.apache.parquet.io.OutputFile {
    private def stream() = new org.apache.parquet.io.PositionOutputStream {
      private var p = 0L
      override def getPos: Long = p
      override def write(b: Int): Unit = { bo.write(b); p += 1 }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        bo.write(b, off, len); p += len
      }
    }
    override def create(hint: Long) = stream()
    override def createOrOverwrite(hint: Long) = stream()
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
  }

  /** Write checkpoint rows with the REAL parquet-mr Group writer
   * (v1 pages, snappy, page CRCs — the m42/m49 real-encoder posture:
   * the fixture is written by the reference implementation, the
   * census decodes it from raw bytes). */
  private def writeCheckpointParquet(t: Long, cVersion: Long,
      liveAtC: Seq[(Long, Long)]): Array[Byte] = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = org.apache.parquet.schema.MessageTypeParser
      .parseMessageType(checkpointMessageType)
    val bo = new java.io.ByteArrayOutputStream()
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new BytesOutputFile(bo))
      .withType(schema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val f = new SimpleGroupFactory(schema)
    val proto = f.newGroup()
    proto.addGroup("protocol").append("minReaderVersion", 1)
      .append("minWriterVersion", 2)
    writer.write(proto)
    val meta = f.newGroup()
    val mg = meta.addGroup("metaData")
    val fieldsJson = (0 until (2 + t % 3).toInt).map(i =>
      s"""{"name":"c$i","type":"long","nullable":true,"metadata":{}}""")
      .mkString(",")
    mg.append("schemaString", s"""{"type":"struct","fields":[$fieldsJson]}""")
    val pc = mg.addGroup("partitionColumns")
    if (t % 2 == 1) pc.addGroup("list").append("element", "c0")
    writer.write(meta)
    liveAtC.foreach { case (v, i) =>
      val g = f.newGroup()
      val add = g.addGroup("add")
      add.append("path", s"part-$v-$i.parquet")
      add.append("size", 100L + 3 * v + i)
      if ((t + v + i) % 5 != 4)
        add.append("stats", s"""{"numRecords":${10 + (t + 7 * v + i) % 20}}""")
      writer.write(g)
    }
    writer.close()
    bo.toByteArray
  }

  /** The m56 replay formulas as pure code: live (v, i) adds at
   * version `upTo`. */
  private def liveAdds(t: Long, upTo: Long): Seq[(Long, Long)] = {
    val adds = (0L until (1 + t % 3)).map(i => (0L, i)) ++
      (1L to upTo).map(v => (v, 0L))
    val removed = (1L to upTo).filter(_ % 2 == 1).map(v => (v - 1, 0L)).toSet
    adds.filterNot(removed.contains)
  }

  /**
   * Deterministic CHECKPOINTED table file sets (m59), built on the
   * m56 commit formulas with `negatives = false` there:
   *
   *   - every table carries its full contiguous commit history
   *     `0 .. t%4` as JSON;
   *   - tables with `t%5 != 1` also carry a parquet CHECKPOINT at
   *     `C = max(0, nv-1)` holding the REPLAYED state (protocol +
   *     metaData + live adds, written by parquet-mr itself) and the
   *     `_last_checkpoint` pointer `{version, size}`;
   *   - `t%7 == 2` tables have commit 0 TRUNCATED mid-object: with a
   *     checkpoint the commit is at-or-before C and must be skipped
   *     unread (the table still resolves); without one (`t%5 == 1`)
   *     the replay must refuse — the same byte damage, opposite
   *     verdicts, pinning that the checkpoint path really skips;
   *   - negatives for checkpointed tables: `t%9 == 4` truncates the
   *     checkpoint parquet's last byte (footer magic breaks — the
   *     decode refuses); `t%11 == 6` keeps `_last_checkpoint` but the
   *     checkpoint file itself is missing (dangling pointer).
   */
  def syntheticDeltaTable(t: Long): Seq[(String, Array[Byte])] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val nv = t % 4
    val out = Seq.newBuilder[(String, Array[Byte])]
    syntheticDeltaLog(t, negatives = false).foreach { case (name, content) =>
      val c2 =
        if (t % 7 == 2 && name == f"${0L}%020d.json")
          content.dropRight(8) // truncate commit 0 mid-object
        else content
      out += ((name, c2.getBytes(utf8)))
    }
    if (t % 5 != 1) {
      val c = math.max(0L, nv - 1)
      val live = liveAdds(t, c)
      var cp = writeCheckpointParquet(t, c, live)
      if (t % 9 == 4) cp = cp.dropRight(1) // footer magic broken
      // t%11==6: _last_checkpoint points at a checkpoint that is NOT
      // on disk (dangling pointer) — the file itself is withheld
      if (t % 11 != 6) out += ((f"$c%020d.checkpoint.parquet", cp))
      val size = 2 + live.size // protocol + metaData + adds
      out += (("_last_checkpoint",
        s"""{"version":$c,"size":$size}""".getBytes(utf8)))
    }
    out.result()
  }

  /** Output schema of [[syntheticDeltaTables]]. */
  private val tableFileSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("file_name", StringType),
    StructField("payload", BinaryType)))

  /** One row per (table, log file) over the id column of `df`. */
  def syntheticDeltaTables(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val t = r.getLong(idIdx)
        syntheticDeltaTable(t).iterator.map { case (name, bytes) =>
          Row(t, name, bytes)
        }
      }
    }(Encoders.row(tableFileSchema))
  }

  /** One row per (table, commit file) over the id column of `df`. */
  def syntheticDeltaLogs(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val t = r.getLong(idIdx)
        syntheticDeltaLog(t).iterator.map { case (name, content) =>
          Row(t, name, content)
        }
      }
    }(Encoders.row(logFileSchema))
  }
}
