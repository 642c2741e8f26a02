package graft

import graft.functions.DeltaLog
import org.apache.spark.sql.functions._

/** m56 — Delta `_delta_log` census: action-parser contracts, a pure
 * closed-form replay of the fixtures, and the Spark snapshot
 * reconstruction end-to-end (live set, tombstones, nullable stats,
 * table-poisoning negatives). */
class DeltaLogSpec extends SparkTestBase {

  test("parseCommit: action projections and strict refusals") {
    val good =
      """{"commitInfo":{"operation":"WRITE","timestamp":1}}
        |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
        |{"metaData":{"id":"x","schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"a\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":["a"]}}
        |{"add":{"path":"p1.parquet","size":10,"stats":"{\"numRecords\":7}"}}
        |{"add":{"path":"p2.parquet","size":11}}
        |{"remove":{"path":"p0.parquet","deletionTimestamp":5}}
        |""".stripMargin
    val as = DeltaLog.parseCommit(good).get
    assert(as.map(_.kind) ===
      Vector("info", "protocol", "meta", "add", "add", "remove"))
    assert(as(1).minReader === 1 && as(1).minWriter === 2)
    assert(as(2).nFields === 1 && as(2).nPartCols === 1)
    assert(as(3).path === "p1.parquet" && as(3).size === 10 &&
      as(3).numRecords === 7L)
    assert(as(4).numRecords == null, "absent stats is legal: rows unknown")
    assert(as(5).path === "p0.parquet")
    // refusals: truncated line, unknown action, two keys in one
    // object, non-object line, malformed nested stats, add sans path
    assert(DeltaLog.parseCommit(good.dropRight(10)).isEmpty)
    assert(DeltaLog.parseCommit("""{"futureAction":{}}""").isEmpty)
    assert(DeltaLog.parseCommit(
      """{"add":{"path":"p"},"remove":{"path":"q"}}""").isEmpty)
    assert(DeltaLog.parseCommit("""[1,2]""").isEmpty)
    assert(DeltaLog.parseCommit(
      """{"add":{"path":"p","stats":"{oops"}}""").isEmpty)
    assert(DeltaLog.parseCommit("""{"add":{"size":3}}""").isEmpty)
    // empty lines are fine (trailing newline convention)
    assert(DeltaLog.parseCommit("\n\n").get.isEmpty)
  }

  test("commitVersion: name contract") {
    assert(DeltaLog.commitVersion("00000000000000000007.json") === Some(7L))
    assert(DeltaLog.commitVersion("0.json") === Some(0L))
    assert(DeltaLog.commitVersion("7.json.tmp").isEmpty)
    assert(DeltaLog.commitVersion("00000000000000000007.checkpoint.parquet").isEmpty)
    assert(DeltaLog.commitVersion("_last_checkpoint").isEmpty)
    assert(DeltaLog.commitVersion(null).isEmpty)
  }

  test("fixture replay: pure parse agrees with the closed form (IDs 0-59)") {
    (0L until 60L).foreach { t =>
      val files = DeltaLog.syntheticDeltaLog(t)
      assert(files.size === (1 + t % 4).toInt, s"t=$t commit count")
      val parsed = files.map { case (name, content) =>
        (DeltaLog.commitVersion(name), DeltaLog.parseCommit(content))
      }
      if (t % 9 == 4 || t % 11 == 6) {
        assert(parsed.last._2.isEmpty, s"t=$t last commit must refuse")
      } else {
        assert(parsed.forall(p => p._1.isDefined && p._2.isDefined), s"t=$t")
        // replay: final action per path must yield the closed-form live set
        val actions = parsed.flatMap { case (v, as) =>
          as.get.map(a => (v.get, a)) }
        val byPath = actions.filter(a =>
          a._2.kind == "add" || a._2.kind == "remove")
          .groupBy(_._2.path).map { case (p, acts) =>
            (p, acts.maxBy(_._1)._2.kind) }
        val live = byPath.filter(_._2 == "add").keySet
        val nv = t % 4
        val want = ((0L until (1 + t % 3)).map(i => s"part-0-$i.parquet").toSet
          ++ (1L to nv).map(v => s"part-$v-0.parquet").toSet
          -- (if (nv >= 1) Set("part-0-0.parquet") else Set.empty)
          -- (if (nv == 3) Set("part-2-0.parquet") else Set.empty))
        assert(live === want, s"t=$t live set")
      }
    }
  }

  test("m59: checkpointed resolution agrees with pure replay (IDs 0-79)") {
    (0L until 80L).foreach { t =>
      val files = DeltaLog.syntheticDeltaTable(t)
      val got = DeltaLog.resolveCheckpointed(files)
      val withheld = (t % 5 == 1 && t % 7 == 2) ||
        (t % 5 != 1 && (t % 9 == 4 || t % 11 == 6))
      if (withheld) assert(got.isEmpty, s"t=$t must be withheld")
      else {
        val live = got.getOrElse(fail(s"t=$t did not resolve"))
        val nv = t % 4
        val cv = if (t % 5 == 1) -1L else math.max(0L, nv - 1)
        val wantPaths = ((0L until (1 + t % 3)).map(i => (0L, i)) ++
          (1L to nv).map(v => (v, 0L)))
          .filterNot(p => (1L to nv).filter(_ % 2 == 1)
            .map(v => (v - 1, 0L)).contains(p))
        assert(live.map(_._1).sorted ===
          wantPaths.map(p => s"part-${p._1}-${p._2}.parquet").sorted, s"t=$t")
        live.foreach { r =>
          assert(r._4 === nv && r._5 === nv + 1 &&
            r._6 === (2 + t % 3).toInt && r._7 === (t % 2).toInt &&
            r._8 === 1 && r._9 === 2 && r._10 === cv, s"t=$t constants")
        }
        // nullable stats carried through the checkpoint too
        val (v0, i0) = wantPaths.head
        val row = live.find(_._1 == s"part-$v0-$i0.parquet").get
        if ((t + v0 + i0) % 5 == 4) assert(row._2 == null, s"t=$t null rows")
        else assert(row._2 === 10 + (t + 7 * v0 + i0) % 20, s"t=$t rows")
      }
    }
    // the skip is real: the same truncated commit 0 refuses WITHOUT a
    // checkpoint (t=37: 37%5=2 has one, 37%7=2 truncated, resolves —
    // covered above; t=16: 16%5=1 no checkpoint, 16%7=2, refused)
    assert(DeltaLog.resolveCheckpointed(
      DeltaLog.syntheticDeltaTable(16L)).isEmpty)
    assert(DeltaLog.resolveCheckpointed(
      DeltaLog.syntheticDeltaTable(37L)).isDefined)
    // _last_checkpoint.size is a locator: tampering refuses
    val f2 = DeltaLog.syntheticDeltaTable(2L).map { case (n, b) =>
      if (n == "_last_checkpoint")
        (n, new String(b, "UTF-8").replace("\"size\":", "\"size\":9")
          .getBytes("UTF-8"))
      else (n, b)
    }
    assert(DeltaLog.resolveCheckpointed(f2).isEmpty, "size mismatch")
  }

  test("deltaSnapshot end-to-end: live rows, tombstones, poisoned tables") {
    import spark.implicits._
    val ids = spark.range(0, 60).select(col("id").as("doc_id"))
    val out = DeltaLog.deltaSnapshot(
      DeltaLog.syntheticDeltaLogs(ids, "doc_id"),
      "table_id", "file_name", "content").cache()
    // poisoned tables vanish entirely
    assert(out.filter(col("table_id") % 9 === 4 ||
      col("table_id") % 11 === 6).count() === 0)
    // t=5: nv=1 → live = part-0-1, part-0-2 (part-0-0 tombstoned), part-1-0
    val t5 = out.filter(col("table_id") === 5)
      .collect().map(r => (r.getString(1), r.get(2))).toMap
    assert(t5.keySet === Set("part-0-1.parquet", "part-0-2.parquet",
      "part-1-0.parquet"))
    // (t+v+i)%5==4 adds omit stats → null file_rows: t=5,v=0,i=2 wait
    // (5+0+2)%5=2 → present; check formula rows instead
    assert(t5("part-0-1.parquet") === 10 + (5 + 0 + 1) % 20)
    // t=3: nv=3 → live = part-0-1..2? (t%3=0 → only part-0-0, tombstoned),
    // part-1-0, part-3-0 (part-2-0 tombstoned)
    val t3 = out.filter(col("table_id") === 3)
      .collect().map(_.getString(1)).toSet
    assert(t3 === Set("part-1-0.parquet", "part-3-0.parquet"))
    // nullable stats: (t+v+i)%5==4 → t=8, v=0, i=1 (t=13 would also
    // qualify but 13%9=4 poisons it): part-0-1 of table 8 has null rows
    val t8 = out.filter(col("table_id") === 8 &&
      col("path") === "part-0-1.parquet").collect()
    assert(t8.length === 1 && t8(0).isNullAt(2))
    // metadata constants
    val t7 = out.filter(col("table_id") === 7).collect()
    assert(t7.forall(r => r.getLong(4) === 3L && r.getLong(5) === 4L &&
      r.getInt(6) === 2 + 7 % 3 && r.getInt(7) === 1 &&
      r.getInt(8) === 1 && r.getInt(9) === 2))
    out.unpersist()
  }
}
