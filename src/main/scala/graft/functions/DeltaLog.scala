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
  def syntheticDeltaLog(t: Long): Seq[(String, String)] = {
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
      if (v == nv && t % 11 == 6)
        lines += """{"futureAction":{"x":1}}"""
      var content = lines.mkString("\n") + "\n"
      if (v == nv && t % 9 == 4)
        content = content.dropRight(8) // truncate mid-object
      (name, content)
    }
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
