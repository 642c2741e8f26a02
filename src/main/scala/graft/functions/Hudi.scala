package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Apache Hudi timeline census (m63) — the third table format beside
 * [[DeltaLog]] (m56/m59) and [[Iceberg]] (m58), completing the trio a
 * 100 TB lake actually runs. Per the public Hudi table spec
 * (hudi.apache.org — table layout & timeline), a table's `.hoodie/`
 * directory carries:
 *
 *   - `hoodie.properties`: java-properties metadata
 *     (`hoodie.table.name`, `hoodie.table.type`
 *     COPY_ON_WRITE / MERGE_ON_READ, versions);
 *   - the TIMELINE: one file per instant state, named
 *     `<14-digit instant time>.<action>[.<state>]` — `requested` and
 *     `inflight` transitional states plus the bare completed file;
 *     actions include `commit`, `deltacommit`, `clean`, `rollback`,
 *     `replacecommit`;
 *   - completed commit/deltacommit files hold HoodieCommitMetadata
 *     JSON: `partitionToWriteStats` mapping partition →
 *     write-stat records (`fileId`, `path`, `numWrites`,
 *     `numDeletes`, `totalWriteBytes`).
 *
 * The census emits one row per COMPLETED commit/deltacommit with its
 * write-stat aggregates plus the table constants — the planning
 * signal ("which commits exist, how much did each write, what is
 * still pending") that precedes any file-group read.
 *
 * STRICT per table: missing/malformed `hoodie.properties`, an
 * unparseable instant file name in the timeline, malformed commit
 * JSON, a completed instant missing its `requested`/`inflight`
 * transition files, or an `inflight` without its `requested`
 * (lifecycle violation) withholds the WHOLE table. The walk groups
 * per table on timeline metadata only — data files never move.
 */
object Hudi {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val instantRe =
    "^(\\d{14})\\.(commit|deltacommit|clean|rollback|replacecommit)(?:\\.(requested|inflight))?$".r

  /** Parse `hoodie.properties` (java-properties subset: `k=v` lines,
   * `#` comments). None without the mandatory name and type keys. */
  def parseProperties(content: String): Option[Map[String, String]] = {
    if (content == null) return None
    val out = scala.collection.mutable.Map.empty[String, String]
    content.split("\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val eq = line.indexOf('=')
        if (eq <= 0) return None
        out(line.substring(0, eq).trim) = line.substring(eq + 1).trim
      }
    }
    if (!out.contains("hoodie.table.name") ||
      !out.contains("hoodie.table.type")) None
    else Some(out.toMap)
  }

  /** Output schema of [[hudiTimeline]]. */
  val timelineSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("instant_time", StringType),
    StructField("action", StringType),
    StructField("n_partitions", IntegerType),
    StructField("n_files", IntegerType),
    StructField("total_writes", LongType),
    StructField("total_deletes", LongType),
    StructField("total_bytes", LongType),
    StructField("table_type", StringType),
    StructField("n_pending", IntegerType)))

  /** Resolve one table's completed-commit rows, or None per the
   * strict contract. Exposed for the spec. */
  def resolveTable(files: Seq[(String, String)]):
      Option[IndexedSeq[(String, String, Int, Int, Long, Long, Long,
        String, Int)]] = {
    val byName = files.toMap
    val props = byName.get("hoodie.properties")
      .flatMap(parseProperties).getOrElse(return None)
    val tableType = props("hoodie.table.type")
    // classify every timeline file (everything but the properties)
    // state per (time, action): bit 1 requested, 2 inflight, 4 completed
    val states = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Int]
    files.foreach { case (name, _) =>
      if (name != "hoodie.properties") {
        name match {
          case instantRe(time, action, state) =>
            val bit = state match {
              case "requested" => 1
              case "inflight" => 2
              case null => 4
              case _ => return None
            }
            val k = (time, action)
            states(k) = states.getOrElse(k, 0) | bit
          case _ => return None // foreign file in the timeline
        }
      }
    }
    // lifecycle: completed ⇒ requested+inflight present;
    // inflight ⇒ requested present
    var pending = 0
    states.foreach { case (_, bits) =>
      if ((bits & 4) != 0 && bits != 7) return None
      if ((bits & 2) != 0 && (bits & 1) == 0) return None
      if ((bits & 4) == 0) pending += 1
    }
    val out = IndexedSeq.newBuilder[(String, String, Int, Int, Long, Long,
      Long, String, Int)]
    states.toSeq.sortBy(_._1._1).foreach { case ((time, action), bits) =>
      if ((bits & 4) != 0 && (action == "commit" || action == "deltacommit")) {
        val body = byName.getOrElse(s"$time.$action", return None)
        val root =
          try mapper.readTree(body)
          catch { case _: com.fasterxml.jackson.core.JacksonException =>
            return None }
        if (root == null || !root.isObject) return None
        val p2s = Option(root.get("partitionToWriteStats"))
          .filter(_.isObject).getOrElse(return None)
        var nParts = 0
        var nFiles = 0
        var writes = 0L
        var deletes = 0L
        var bytes = 0L
        val it = p2s.fields()
        while (it.hasNext) {
          val e = it.next()
          nParts += 1
          val arr = e.getValue
          if (!arr.isArray) return None
          val sit = arr.elements()
          while (sit.hasNext) {
            val st = sit.next()
            if (!st.isObject) return None
            nFiles += 1
            writes += Option(st.get("numWrites")).filter(_.canConvertToLong)
              .map(_.asLong()).getOrElse(return None)
            deletes += Option(st.get("numDeletes")).filter(_.canConvertToLong)
              .map(_.asLong()).getOrElse(0L)
            bytes += Option(st.get("totalWriteBytes"))
              .filter(_.canConvertToLong).map(_.asLong()).getOrElse(0L)
          }
        }
        out += ((time, action, nParts, nFiles, writes, deletes, bytes,
          tableType, pending))
      }
    }
    Some(out.result())
  }

  /** [[resolveTable]] over a corpus: input one row per
   * `(table_id, file_name, content)`; one output row per completed
   * commit/deltacommit. Tables violating any timeline invariant
   * vanish entirely. */
  def hudiTimeline(df: DataFrame, tableCol: String, nameCol: String,
      contentCol: String): DataFrame = {
    val tIdx = df.schema.fieldIndex(tableCol)
    val nIdx = df.schema.fieldIndex(nameCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.groupByKey(r => r.getLong(tIdx))(Encoders.scalaLong)
      .flatMapGroups { (tid: Long, rows: Iterator[Row]) =>
        val files = rows.map { r =>
          (if (r.isNullAt(nIdx)) null else r.getString(nIdx),
            if (r.isNullAt(cIdx)) null else r.getString(cIdx))
        }.toSeq
        resolveTable(files) match {
          case Some(commits) => commits.iterator.map {
            case (time, action, np, nf, w, del, by, tt, pend) =>
              Row(tid, time, action, np, nf, w, del, by, tt, pend)
          }
          case None => Iterator.empty
        }
      }(Encoders.row(timelineSchema))
  }

  // ---------------------------------------------------------------
  // Fixture
  // ---------------------------------------------------------------

  /**
   * Deterministic per-table `.hoodie` timeline, replayed by the m63
   * oracle:
   *
   *   - `hoodie.properties`: name `tbl_<t>`, type COPY_ON_WRITE for
   *     even t (action `commit`) / MERGE_ON_READ for odd (action
   *     `deltacommit`);
   *   - `1 + t%3` completed instants at times `202401010000<i,
   *      2 digits>`, each with all three lifecycle files; commit i
   *     writes `1 + (t+i)%2` partitions `p<q>`, partition q holding
   *     `1 + (t+i+q)%2` stats: fileId `f-<t>-<i>-<q>-<j>`,
   *     `numWrites = 10 + (t+i+q+j)%20`, `numDeletes = (t+i)%3`,
   *     `totalWriteBytes = 1000 + i*10 + q*5 + j`;
   *   - `t%4 == 1` tables carry ONE pending instant (requested +
   *     inflight, no completed) — `n_pending` must report it;
   *   - negatives: `t%9 == 4` truncates `hoodie.properties` to a
   *     key without `=`; `t%11 == 6` writes an `inflight` with no
   *     `requested` (lifecycle violation) — the table vanishes.
   */
  def syntheticHudiTable(t: Long): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    val tableType = if (t % 2 == 0) "COPY_ON_WRITE" else "MERGE_ON_READ"
    val action = if (t % 2 == 0) "commit" else "deltacommit"
    val props =
      s"""#Properties saved on write
         |hoodie.table.name=tbl_$t
         |hoodie.table.type=$tableType
         |hoodie.table.version=6
         |hoodie.timeline.layout.version=1
         |""".stripMargin
    out += (("hoodie.properties",
      if (t % 9 == 4) props + "brokenline\n" else props))
    (0 until (1 + t % 3).toInt).foreach { i =>
      val time = f"202401010000$i%02d"
      out += ((s"$time.$action.requested", ""))
      out += ((s"$time.$action.inflight", "{}"))
      val parts = (0 until (1 + (t + i) % 2).toInt).map { q =>
        val stats = (0 until (1 + (t + i + q) % 2).toInt).map { j =>
          s"""{"fileId":"f-$t-$i-$q-$j","path":"p$q/f-$t-$i-$q-$j.parquet",""" +
            s""""numWrites":${10 + (t + i + q + j) % 20},""" +
            s""""numDeletes":${(t + i) % 3},""" +
            s""""totalWriteBytes":${1000 + i * 10 + q * 5 + j}}"""
        }.mkString(",")
        s""""p$q":[$stats]"""
      }.mkString(",")
      out += ((s"$time.$action",
        s"""{"partitionToWriteStats":{$parts},"operationType":"UPSERT"}"""))
    }
    if (t % 4 == 1) { // a pending instant
      val time = "20240101000099"
      out += ((s"$time.$action.requested", ""))
      out += ((s"$time.$action.inflight", "{}"))
    }
    if (t % 11 == 6) // lifecycle violation: inflight sans requested
      out += ((s"20240101000098.$action.inflight", "{}"))
    out.result()
  }

  /** Output schema of [[syntheticHudiTables]]. */
  private val tableFileSchema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("file_name", StringType),
    StructField("content", StringType)))

  /** One row per (table, timeline file) over the id column of `df`. */
  def syntheticHudiTables(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val t = r.getLong(idIdx)
        syntheticHudiTable(t).iterator.map { case (name, content) =>
          Row(t, name, content)
        }
      }
    }(Encoders.row(tableFileSchema))
  }
}
