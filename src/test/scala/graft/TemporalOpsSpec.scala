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

  test("rangeJoin matches the naive cross-join filter, inclusive bounds") {
    // deterministic pseudo-random points/intervals, several per bin and
    // intervals straddling bin boundaries
    val pts = (0 until 200).map(i => Seq(i.toLong, (i * 37 % 101).toDouble))
    val ivs = (0 until 40).map { j =>
      val s = (j * 53 % 90).toDouble
      Seq(j.toLong, s, s + (j % 7) * 3.0)
    }
    val l = df(pts, "pid:long,p:double")
    val r = df(ivs, "iid:long,s:double,e:double")
    val got = TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 10.0)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.crossJoin(r)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // boundary inclusivity is actually exercised: some point sits exactly
    // on an interval endpoint
    val boundary = l.crossJoin(r)
      .filter(col("p") === col("s") || col("p") === col("e"))
    assert(boundary.count() > 0)
  }

  test("rangeJoin: null bounds and empty intervals match nothing; no dup pairs") {
    val l = df(Seq(Seq(1L, 5.0), Seq(2L, 15.0)), "pid:long,p:double")
    val r = df(Seq(
      Seq(10L, 0.0, 20.0), // spans 3 bins at width 8 → must not duplicate
      Seq(11L, null, 20.0),
      Seq(12L, 0.0, null),
      Seq(13L, 9.0, 3.0)), "iid:long,s:double,e:double") // end < start
    val rows = TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 8.0)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.length === rows.toSet.size) // one bin per point → no dups
    assert(rows.toSet === Set((1L, 10L), (2L, 10L)))
  }

  test("rangeJoin: long intervals route through the broadcast path, same result") {
    val l = df((0 until 50).map(i => Seq(i.toLong, i.toDouble)), "pid:long,p:double")
    val r = df(Seq(
      Seq(1L, 10.0, 12.0), // short
      Seq(2L, 0.0, 49.0)), "iid:long,s:double,e:double") // 50 bins at width 1
    val got = TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 1.0,
      maxBinsPerInterval = 4)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.crossJoin(r)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want)
  }

  test("rangeJoin/intervalJoin reject inputs using reserved internal names") {
    val l = df(Seq(Seq(1L, 5.0, 3L)), "pid:long,p:double,__bin:long")
    val r = df(Seq(Seq(10L, 0.0, 9.0)), "iid:long,s:double,e:double")
    intercept[IllegalArgumentException] {
      TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 2.0)
    }
    val l2 = df(Seq(Seq(1L, 0.0, 1.0)), "lid:long,ls:double,le:double")
    val r2 = df(Seq(Seq(10L, 0.0, 9.0, 1L)), "rid:long,rs:double,re:double,__sb:long")
    intercept[IllegalArgumentException] {
      TemporalOps.intervalJoin(l2, r2, "ls", "le", "rs", "re", binWidth = 2.0)
    }
  }

  test("rangeJoin with equi-keys only pairs within the key") {
    val l = df(Seq(
      Seq(1L, "a", 5.0), Seq(2L, "b", 5.0)), "pid:long,k:str,p:double")
    val r = df(Seq(
      Seq(10L, "a", 0.0, 10.0)), "iid:long,k:str,s:double,e:double")
    val got = TemporalOps.rangeJoin(l, r, "p", "s", "e", binWidth = 4.0,
      keys = Seq("k"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("rangeJoin on timestamps (epoch-second binning)") {
    val l = df(Seq(
      Seq(1L, "2024-01-01 10:15:00"),
      Seq(2L, "2024-01-01 12:00:00")), "pid:long,ts:datetime")
    val r = df(Seq(
      Seq(10L, "2024-01-01 10:00:00", "2024-01-01 10:30:00")),
      "iid:long,s:datetime,e:datetime")
    val got = TemporalOps.rangeJoin(l, r, "ts", "s", "e", binWidth = 600.0)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("intervalJoin matches the naive overlap filter, no duplicate pairs") {
    val ls = (0 until 60).map { i =>
      val s = (i * 41 % 97).toDouble
      Seq(i.toLong, s, s + (i % 9) * 2.5)
    }
    val rs = (0 until 45).map { j =>
      val s = (j * 29 % 90).toDouble
      Seq(j.toLong, s, s + (j % 6) * 4.0)
    }
    val l = df(ls, "lid:long,ls:double,le:double")
    val r = df(rs, "rid:long,rs:double,re:double")
    val got = TemporalOps.intervalJoin(l, r, "ls", "le", "rs", "re",
      binWidth = 7.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val want = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === want)
    assert(want.nonEmpty)
  }

  test("intervalJoin: long intervals on either side route through broadcast") {
    val l = df(Seq(
      Seq(1L, 0.0, 100.0),   // long at width 1
      Seq(2L, 5.0, 6.0)), "lid:long,ls:double,le:double")
    val r = df(Seq(
      Seq(10L, 50.0, 200.0), // long
      Seq(11L, 5.5, 7.0),    // short, overlaps both left rows
      Seq(12L, null, 3.0)), "rid:long,rs:double,re:double")
    val got = TemporalOps.intervalJoin(l, r, "ls", "le", "rs", "re",
      binWidth = 1.0, maxBinsPerInterval = 8)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length === got.toSet.size)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("intervalJoin with equi-keys") {
    val l = df(Seq(
      Seq(1L, "a", 0.0, 10.0), Seq(2L, "b", 0.0, 10.0)),
      "lid:long,k:str,ls:double,le:double")
    val r = df(Seq(Seq(10L, "a", 5.0, 15.0)),
      "rid:long,k:str,rs:double,re:double")
    val got = TemporalOps.intervalJoin(l, r, "ls", "le", "rs", "re",
      binWidth = 4.0, keys = Seq("k"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
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

  test("resample: epoch-aligned buckets, one agg pass") {
    import org.apache.spark.sql.functions._
    val d = df(Seq(
      Seq("a", "2024-01-01 00:03:00", 1.0),
      Seq("a", "2024-01-01 00:12:00", 2.0),
      Seq("a", "2024-01-01 00:16:00", 4.0),
      Seq("b", "2024-01-01 00:59:59", 8.0),
      Seq("b", "2024-01-01 01:00:00", 16.0)), "k:str,ts:datetime,v:double")
    val out = TemporalOps.resample(d, "ts", 900, Seq("k"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("total")))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(out === Set(
      ("a", "2024-01-01 00:00:00.0", 2L, 3.0),
      ("a", "2024-01-01 00:15:00.0", 1L, 4.0),
      ("b", "2024-01-01 00:45:00.0", 1L, 8.0),
      ("b", "2024-01-01 01:00:00.0", 1L, 16.0)))
    intercept[IllegalArgumentException] {
      TemporalOps.resample(d, "ts", 0, Seq("k"), Seq(count(lit(1)).as("n")))
    }
  }

  test("rollingAggregate: trailing time window per group, peers included") {
    import org.apache.spark.sql.functions._
    val d = df(Seq(
      Seq("u1", 1L, "2024-01-01 10:00:00", 1.0),
      Seq("u1", 2L, "2024-01-01 10:30:00", 2.0),
      Seq("u1", 3L, "2024-01-01 11:00:00", 4.0),  // includes 10:00 (inclusive bound)
      Seq("u1", 4L, "2024-01-01 12:30:00", 8.0),  // alone
      Seq("u2", 5L, "2024-01-01 10:15:00", 16.0)), // other group
      "u:str,id:long,ts:datetime,v:double")
    val out = TemporalOps.rollingAggregate(d, "ts", 3600, Seq("u"),
      Seq("n_1h" -> count(lit(1)), "sum_1h" -> sum(col("v"))))
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(out(1L) === ((1L, 1.0)))
    assert(out(2L) === ((2L, 3.0)))
    assert(out(3L) === ((3L, 7.0)))
    assert(out(4L) === ((1L, 8.0)))
    assert(out(5L) === ((1L, 16.0)))
    intercept[IllegalArgumentException] {
      TemporalOps.rollingAggregate(d, "ts", 3600, Seq.empty,
        Seq("n" -> count(lit(1))))
    }
  }

  test("gapFill linear: synthesized buckets interpolate between neighbors") {
    // group a at 15-min step: 00:00 and 00:10 share the first bucket
    // (mean (0+4)/2 = 2), 00:45 is observed at 8, and the two missing
    // buckets interpolate linearly between 2 and 8 → 4 and 6
    val d = df(Seq(
      Seq("a", "2024-01-01 00:00:00", 0.0),
      Seq("a", "2024-01-01 00:10:00", 4.0), // same bucket as 00:00 → mean 2.0
      Seq("a", "2024-01-01 00:45:00", 8.0),
      Seq("b", "2024-01-01 02:00:00", 5.0)), "k:str,ts:datetime,v:double")
    val out = TemporalOps.gapFill(d, "ts", "v", 900, Seq("k"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out === Set(
      ("a", "2024-01-01 00:00:00.0", 2.0, false),
      ("a", "2024-01-01 00:15:00.0", 4.0, true),
      ("a", "2024-01-01 00:30:00.0", 6.0, true),
      ("a", "2024-01-01 00:45:00.0", 8.0, false),
      ("b", "2024-01-01 02:00:00.0", 5.0, false)))
  }

  test("gapFill ffill/zero methods; null values are gaps; intercepts") {
    val d = df(Seq(
      Seq("a", "2024-01-01 00:00:00", 3.0),
      Seq("a", "2024-01-01 00:15:00", null), // null value = absent
      Seq("a", "2024-01-01 00:30:00", 9.0)), "k:str,ts:datetime,v:double")
    val ff = TemporalOps.gapFill(d, "ts", "v", 900, Seq("k"), method = "ffill")
      .collect().map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(ff("2024-01-01 00:15:00.0") === 3.0)
    val zf = TemporalOps.gapFill(d, "ts", "v", 900, Seq("k"), method = "zero")
      .collect().map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(zf("2024-01-01 00:15:00.0") === 0.0)
    intercept[IllegalArgumentException] {
      TemporalOps.gapFill(d, "ts", "v", 900, Seq("k"), method = "cubic")
    }
    intercept[IllegalArgumentException] {
      TemporalOps.gapFill(d, "ts", "v", 0, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TemporalOps.gapFill(d, "ts", "v", 900, Seq.empty)
    }
  }

  test("funnel: ordered steps, window bound, no restart, missing steps null") {
    val e = df(Seq(
      // u1: full funnel in order within window
      Seq("u1", "2024-01-01 00:00:00", "signup"),
      Seq("u1", "2024-01-01 01:00:00", "view"),
      Seq("u1", "2024-01-01 02:00:00", "purchase"),
      // u2: purchase BEFORE view -> step 3 null (order matters)
      Seq("u2", "2024-01-01 00:00:00", "signup"),
      Seq("u2", "2024-01-01 02:00:00", "purchase"),
      Seq("u2", "2024-01-01 03:00:00", "view"),
      // u3: view outside the 1h window -> steps 2,3 null
      Seq("u3", "2024-01-01 00:00:00", "signup"),
      Seq("u3", "2024-01-01 05:00:00", "view"),
      // u4: never signed up -> no row
      Seq("u4", "2024-01-01 00:00:00", "view"),
      // u5: pre-signup view ignored; the post-signup one counts
      Seq("u5", "2024-01-01 00:00:00", "view"),
      Seq("u5", "2024-01-01 01:00:00", "signup"),
      Seq("u5", "2024-01-01 01:30:00", "purchase"),
      Seq("u5", "2024-01-01 01:10:00", "view")),
      "u:str,ts:datetime,ev:str")
    val got = TemporalOps.funnel(e, "u", "ts", "ev",
      Seq("signup", "view", "purchase"), 3600L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // u2's view lands at +3h, outside the 1h window -> only step 1
    assert(got === Map("u1" -> 2L, "u2" -> 1L, "u3" -> 1L, "u5" -> 3L))
    // u1's window is 1h: purchase at +2h is outside -> 2 steps. widen:
    val wide = TemporalOps.funnel(e, "u", "ts", "ev",
      Seq("signup", "view", "purchase"), 86400L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(wide("u1") === 3L)
    assert(wide("u2") === 2L) // order still wrong for u2
    intercept[IllegalArgumentException] {
      TemporalOps.funnel(e, "u", "ts", "ev", Seq("signup"), 3600L)
    }
    intercept[IllegalArgumentException] {
      TemporalOps.funnel(e, "u", "ts", "ev", Seq("a", "a"), 3600L)
    }
  }

  test("retention: weekly cohorts, sparse offsets, rate exact") {
    // week seconds = 604800; epoch week boundaries
    val w0 = "2024-01-04 00:00:00" // all within one epoch-week bucket
    val w1 = "2024-01-11 00:00:00"
    val w2 = "2024-01-18 00:00:00"
    val e = df(Seq(
      Seq("a", w0), Seq("b", w0), Seq("c", w0), Seq("d", w0), // cohort of 4
      Seq("a", w1), Seq("b", w1),                             // 2 retained
      Seq("a", w2),                                           // 1 retained
      Seq("z", w1)),                                          // later cohort
      "u:str,ts:datetime")
    val got = TemporalOps.retention(e, "u", "ts", 604800L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    val byOffset = got.map { case (k, v) => k -> v.head }
    assert(byOffset(0L)._4 === 1.0)
    // cohort of 4: offset1 = 2/4 (the 'z' cohort has its own offset-0 row)
    val rows = TemporalOps.retention(e, "u", "ts", 604800L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    val cohortA = rows.keys.map(_._1).min // earliest cohort
    assert(rows((cohortA, 1L)) === ((2L, 0.5)))
    assert(rows((cohortA, 2L)) === ((1L, 0.25)))
    intercept[IllegalArgumentException] {
      TemporalOps.retention(e, "u", "ts", 0L)
    }
  }

  test("mergeIntervals: chains merge, touching merge, gaps split, per key") {
    val d = df(Seq(
      Seq("a", 1L, 5L), Seq("a", 3L, 8L), Seq("a", 8L, 10L), // chain + touch
      Seq("a", 12L, 13L),                                    // gap → new
      Seq("b", 1L, 2L)), "k:str,s:long,e:long")
    val got = TemporalOps.mergeIntervals(d, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(("a", 1L, 10L, 3L), ("a", 12L, 13L, 1L),
      ("b", 1L, 2L, 1L)))
    // containment: an interval inside another does not extend it
    val c = df(Seq(Seq("a", 1L, 10L), Seq("a", 2L, 3L), Seq("a", 11L, 12L)),
      "k:str,s:long,e:long")
    val got2 = TemporalOps.mergeIntervals(c, Seq("k"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got2 === Set((1L, 10L), (11L, 12L)))
    // the per-row guard is evaluated in the single pass, so bad rows
    // surface at action time (raise_error), not at plan-construction time
    val badRev = intercept[Exception] {
      TemporalOps.mergeIntervals(
        df(Seq(Seq("a", 5L, 1L)), "k:str,s:long,e:long"), Seq("k"), "s", "e")
        .collect()
    }
    assert(stackMessages(badRev).contains("mergeIntervals"), badRev.toString)
    val badNull = intercept[Exception] {
      TemporalOps.mergeIntervals(
        df(Seq(Seq("a", null, 2L)), "k:str,s:long,e:long"), Seq("k"), "s", "e")
        .collect()
    }
    assert(stackMessages(badNull).contains("mergeIntervals"), badNull.toString)
    // validate=false skips the guard: the bad row flows through unmerged
    val skipped = TemporalOps.mergeIntervals(
      df(Seq(Seq("a", 5L, 1L)), "k:str,s:long,e:long"), Seq("k"), "s", "e",
      validate = false).collect()
    assert(skipped.length === 1)
    intercept[IllegalArgumentException] {
      TemporalOps.mergeIntervals(d, Seq.empty, "s", "e")
    }
  }

  test("funnel restart=true matches a dense reference model (3 seeds)") {
    // windowed re-entry: every distinct step-1 timestamp anchors an
    // attempt; the user's row is the best attempt (most steps, earliest
    // anchor). Brute-forced per user against the distributed chain.
    val steps = Seq("s1", "s2", "s3")
    val w = 50L
    for (seed <- Seq(7L, 19L, 53L)) {
      val rnd = new scala.util.Random(seed)
      val evs = (1 to 400).map { _ =>
        (s"u${rnd.nextInt(12)}", rnd.nextInt(500).toLong,
          Seq("s1", "s2", "s3", "zz")(rnd.nextInt(4)))
      }
      val rows = evs.map { case (u, t, e) =>
        Seq(u, java.time.Instant.ofEpochSecond(t).toString
          .replace("T", " ").replace("Z", ""), e)
      }
      val got = TemporalOps.funnel(
        df(rows, "u:str,ts:datetime,ev:str"), "u", "ts", "ev", steps, w,
        restart = true).collect()
        .map(r => r.getString(0) -> (((1 to 3).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))).toSeq,
          r.getLong(4)))).toMap
      // brute force
      val byUser = evs.groupBy(_._1)
      val expected = byUser.flatMap { case (u, g) =>
        val anchors = g.filter(_._3 == "s1").map(_._2).distinct.sorted
        if (anchors.isEmpty) None else {
          val attempts = anchors.map { a =>
            val s2 = g.filter(e => e._3 == "s2" && e._2 >= a && e._2 <= a + w)
              .map(_._2).sorted.headOption
            val s3 = s2.flatMap(p => g.filter(e =>
              e._3 == "s3" && e._2 >= p && e._2 <= a + w)
              .map(_._2).sorted.headOption)
            val c = 1L + s2.size + s3.size
            (Seq(Some(a), s2, s3), c, a)
          }
          val best = attempts.minBy { case (_, c, a) => (-c, a) }
          Some(u -> ((best._1, best._2)))
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("gapFill: grid endpoints are always observed (no extrapolation)") {
    // single observation → grid is exactly one bucket, nothing synthesized
    val d = df(Seq(Seq("a", "2024-01-01 00:07:00", 5.0)),
      "k:str,ts:datetime,v:double")
    val out = TemporalOps.gapFill(d, "ts", "v", 900, Seq("k")).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 5.0 && !out.head.getBoolean(3))
  }
}
