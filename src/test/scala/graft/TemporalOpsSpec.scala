package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkTestBase {

  test("asofJoin picks the latest right row at or before each left ts") {
    val l = df(Seq(
      Seq(1L, "u1", "2024-01-01 10:00:00"),
      Seq(2L, "u1", "2024-01-01 12:00:00"),
      Seq(3L, "u2", "2024-01-01 09:00:00")), "id:long,k:str,ts:datetime")
    val r = df(Seq(
      Seq("u1", "2024-01-01 09:30:00", 100L),
      Seq("u1", "2024-01-01 11:00:00", 200L),
      Seq("u2", "2024-01-01 09:00:00", 300L), // equal ts → matches (<=)
      Seq("u2", "2024-01-01 10:00:00", 400L)), "k:str,ts:datetime,rid:long")
    val out = TemporalOps.asofJoin(l, r, Seq("k"), "ts", tieBreak = Seq("rid"))
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out === Set((1L, 100L), (2L, 200L), (3L, 300L)))
  }

  test("asofJoin: left rows before any right row get null payload") {
    val l = df(Seq(Seq(1L, "u1", "2024-01-01 08:00:00")), "id:long,k:str,ts:datetime")
    val r = df(Seq(Seq("u1", "2024-01-01 09:00:00", 7L)), "k:str,ts:datetime,rid:long")
    val out = TemporalOps.asofJoin(l, r, Seq("k"), "ts").collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("rid")))
  }

  test("asofJoin: right rows with null timestamps never match") {
    val l = df(Seq(Seq(1L, "u1", "2024-01-01 08:00:00")), "id:long,k:str,ts:datetime")
    val r = df(Seq(
      Seq("u1", null, 7L), // null ts: <= is false against everything
      Seq("u1", "2024-01-01 09:00:00", 8L)), "k:str,ts:datetime,rid:long")
    val out = TemporalOps.asofJoin(l, r, Seq("k"), "ts").collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("rid")))
  }

  test("sessionize splits on gaps and numbers sessions per key") {
    val d = df(Seq(
      Seq("u1", 1L, "2024-01-01 10:00:00"),
      Seq("u1", 2L, "2024-01-01 10:10:00"),
      Seq("u1", 3L, "2024-01-01 11:30:00"), // > 30 min gap → new session
      Seq("u2", 4L, "2024-01-01 10:00:00")), "k:str,id:long,ts:datetime")
    val out = TemporalOps.sessionize(d, Seq("k"), "ts", "30 minutes",
      tieBreak = Seq("id"))
      .select("id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 0L), (2L, 0L), (3L, 1L), (4L, 0L)))
  }
}
