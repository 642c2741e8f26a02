package graft

import graft.functions.Dedup
import graft.operators.SkewJoin
import graft.schema.SchemaExpr
import graft.streaming.Streaming
import graft.transform.{CallbackChannel, Transform}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkTestBase {

  test("bloom semi/anti joins are exact vs plain joins (long and string keys)") {
    import graft.operators.BloomJoin
    val probe = df((1 to 500).map(i => Seq(i.toLong, s"p$i")) :+
      Seq(null, "pnull"), "k:long,p:str")
    val build = df((1 to 500).filter(_ % 7 == 0).map(i => Seq(i.toLong, s"b$i")),
      "k:long,b:str")
    assert(graft.api.DfUtils.dfEq(
      BloomJoin.semiJoin(probe, build, "k"),
      probe.join(build.select("k"), Seq("k"), "left_semi")))
    assert(graft.api.DfUtils.dfEq(
      BloomJoin.antiJoin(probe, build, "k"),
      probe.join(build.select("k"), Seq("k"), "left_anti")))
    // string keys: encoding compatibility with stat.bloomFilter is load-
    // bearing (UTF-8 bytes on both the put and the probe side)
    val probeS = df((1 to 300).map(i => Seq(s"key-$i", i)), "k:str,v:int")
    val buildS = df((1 to 300).filter(_ % 5 == 0).map(i => Seq(s"key-$i")), "k:str")
    assert(graft.api.DfUtils.dfEq(
      BloomJoin.semiJoin(probeS, buildS, "k"),
      probeS.join(buildS, Seq("k"), "left_semi")))
    assert(graft.api.DfUtils.dfEq(
      BloomJoin.antiJoin(probeS, buildS, "k"),
      probeS.join(buildS, Seq("k"), "left_anti")))
    // empty build side: semi → empty, anti → whole probe
    val empty = build.filter(lit(false))
    assert(BloomJoin.semiJoin(probe, empty, "k").isEmpty)
    assert(graft.api.DfUtils.dfEq(BloomJoin.antiJoin(probe, empty, "k"), probe))
  }

  test("coMapN: 3-way cogroup with empty sides") {
    val a = df(Seq(Seq(1, "a1"), Seq(2, "a2")), "k:int,x:str")
    val b = df(Seq(Seq(2, 20.0)), "k:int,y:double")
    val c = df(Seq(Seq(2, true), Seq(3, false)), "k:int,z:bool")
    val out = Transform.coMapN(Seq(a, b, c), Seq("k"),
      SchemaExpr.parse("k:int,na:long,nb:long,nc:long")) { (key, groups) =>
      Iterator.single(Row(key.head, groups(0).size.toLong,
        groups(1).size.toLong, groups(2).size.toLong))
    }
    assertDfEq(out, Seq(
      Seq(1, 1L, 0L, 0L), Seq(2, 1L, 1L, 1L), Seq(3, 0L, 0L, 1L)))
  }

  test("coMapN payload rows carry the right columns") {
    val a = df(Seq(Seq(1, "hello", 9)), "k:int,s:str,v:int")
    val b = df(Seq(Seq(1, 5.5)), "k:int,d:double")
    val out = Transform.coMapN(Seq(a, b), Seq("k"),
      SchemaExpr.parse("k:int,s:str,d:double")) { (key, groups) =>
      Iterator.single(Row(key.head,
        groups(0).head.getAs[String]("s"), groups(1).head.getAs[Double]("d")))
    }
    assertDfEq(out, Seq(Seq(1, "hello", 5.5)))
  }

  test("alterColumns / rename / dropColumns engine ops") {
    val d = df(Seq(Seq(1, "x", 2.5)), "a:int,b:str,c:double")
    val alt = engine.alterColumns(d, "a:long,c:str")
    assert(alt.schema.map(_.dataType.typeName) === Seq("long", "string", "string"))
    assert(alt.columns.toSeq === Seq("a", "b", "c"))
    val ren = engine.rename(d, Map("a" -> "aa", "b" -> "bb"))
    assert(ren.columns.toSeq === Seq("aa", "bb", "c"))
    assert(engine.dropColumns(d, Seq("b")).columns.toSeq === Seq("a", "c"))
    assert(engine.dropColumns(d, Seq("zz"), ifExists = true).columns.length === 3)
    intercept[IllegalArgumentException](engine.dropColumns(d, Seq("zz")))
  }

  test("salted join preserves inner and left_outer multiplicity") {
    val left = df(Seq(Seq(1, "r1"), Seq(1, "r2"), Seq(1, "r3"), Seq(2, "r4"),
      Seq(3, "r5")), "k:int,v:str")
    val right = df(Seq(Seq(1, 100.0), Seq(2, 200.0)), "k:int,w:double")
    val inner = SkewJoin.saltedJoin(left, right, Seq("k"), "inner", factor = 4)
    assertDfEq(inner.select("k", "v", "w"), Seq(
      Seq(1, "r1", 100.0), Seq(1, "r2", 100.0), Seq(1, "r3", 100.0),
      Seq(2, "r4", 200.0)))
    val louter = SkewJoin.saltedJoin(left, right, Seq("k"), "left_outer", factor = 4)
    assert(louter.count() === 5)
    assert(louter.filter(col("w").isNull).count() === 1)
  }

  test("suggestSalt maps the measured histogram to a factor; suggested join == plain join") {
    // skewed probe: key 0 carries 60 rows, keys 1..5 carry 8 each
    val skewed = df(
      ((1 to 60).map(i => Seq(0, s"h$i")) ++
        (1 to 40).map(i => Seq(1 + (i % 5), s"t$i"))), "k:int,v:str")
    val dim = df((0 to 5).map(k => Seq(k, k * 10.0)), "k:int,w:double")
    // hottest key 60 rows / 10 per task -> ceil = 6
    assert(SkewJoin.suggestSalt(skewed, Seq("k"), targetRowsPerTask = 10L) === 6)
    // no key exceeds the target -> 1 (don't salt)
    assert(SkewJoin.suggestSalt(skewed, Seq("k"), targetRowsPerTask = 100L) === 1)
    // clamp respected
    assert(SkewJoin.suggestSalt(skewed, Seq("k"), targetRowsPerTask = 1L,
      maxFactor = 8) === 8)
    // empty probe -> 1
    assert(SkewJoin.suggestSalt(skewed.filter(col("k") > 99), Seq("k")) === 1)
    // q49 pin: join with the SUGGESTED factor equals the plain join
    val f = SkewJoin.suggestSalt(skewed, Seq("k"), targetRowsPerTask = 10L)
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), "inner", factor = f)
      .select("k", "v", "w")
    val plain = skewed.join(dim, Seq("k"), "inner").select("k", "v", "w")
    assert(graft.api.DfUtils.dfEq(salted, plain))
    intercept[IllegalArgumentException](SkewJoin.suggestSalt(skewed, Seq.empty))
    intercept[IllegalArgumentException](
      SkewJoin.suggestSalt(skewed, Seq("k"), targetRowsPerTask = 0L))
  }

  test("callback channel collects executor-side messages") {
    val ch = CallbackChannel(spark)
    val d = df((1 to 10).map(i => Seq(i)), "x:int").repartition(4)
    val out = Transform.mapPartitions(d, PartitionSpec.empty,
      SchemaExpr.parse("x:int")) { (cursor, rows) =>
      ch.post("partition_done", cursor.physicalPartitionNo.toString)
      rows
    }
    assert(out.count() === 10)
    assert(ch.messages("partition_done").nonEmpty)
  }

  test("callback monitor delivers live messages and drives early stop") {
    import graft.transform.CallbackMonitor
    val ch = CallbackChannel(spark)
    val group = s"graft-earlystop-${java.util.UUID.randomUUID().toString.take(8)}"
    val delivered = new java.util.concurrent.atomic.AtomicInteger(0)
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val monitor = CallbackMonitor.start(ch, intervalMs = 25) { (topic, _) =>
      if (topic == "progress") {
        delivered.incrementAndGet()
        // stop condition: cancel the group as soon as progress arrives
        if (!cancelled.getAndSet(true)) spark.sparkContext.cancelJobGroup(group)
      }
    }
    try {
      spark.sparkContext.setJobGroup(group, "early-stop test", interruptOnCancel = true)
      // 3 waves over default parallelism: wave-1 completions post progress,
      // the monitor cancels, later waves never finish
      val nParts = spark.sparkContext.defaultParallelism * 3
      val thrown = intercept[Exception] {
        spark.range(nParts).repartition(nParts).rdd.foreachPartition { _ =>
          ch.post("progress", "1")
          Thread.sleep(500)
        }
      }
      assert(thrown.getMessage.toLowerCase.contains("cancel"))
      assert(cancelled.get())
    } finally {
      spark.sparkContext.clearJobGroup()
      monitor.stop()
    }
    assert(delivered.get() > 0)
    // not every task completed before the cancel landed
    assert(delivered.get() < spark.sparkContext.defaultParallelism * 3)
  }

  test("HTTP callback endpoint: executor posts arrive mid-task; dead endpoint raises") {
    import graft.transform.HttpCallbacks
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val srv = HttpCallbacks.start() { (topic, msg) => seen.add(s"$topic=$msg") }
    try {
      val ch = srv.channel
      val d = df((1 to 8).map(i => Seq(i)), "x:int").repartition(4)
      val out = Transform.mapPartitions(d, PartitionSpec.empty,
        SchemaExpr.parse("x:int")) { (cursor, rows) =>
        ch.post("part", cursor.physicalPartitionNo.toString)
        rows
      }
      assert(out.count() === 8)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.exists(_.startsWith("part=")))
    } finally srv.stop()
    // a stopped endpoint must raise on post, never drop silently (a lost
    // stop-vote would turn early-stop into run-to-completion)
    intercept[Exception](srv.channel.post("part", "late"))
  }

  test("HTTP callback endpoint rejects posts without the shared-secret token") {
    import graft.transform.HttpCallbacks
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = HttpCallbacks.start() { (_, _) => seen.incrementAndGet(); () }
    try {
      // a raw POST (what a network peer without the channel can send) is
      // refused with 403 and never reaches the handler — an injected
      // message would otherwise become query output or a stop vote
      val conn = new java.net.URI(s"http://${srv.address}/cb").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("X-Graft-Topic", "forged")
      val body = "evil".getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
      assert(conn.getResponseCode === 403)
      assert(seen.get() === 0)
      // the channel's own token still authenticates
      srv.channel.post("ok", "1")
      assert(seen.get() === 1)
    } finally srv.stop()
  }

  test("HTTP callback early stop cancels BEFORE any task completes") {
    import graft.transform.HttpCallbacks
    val group = s"graft-http-stop-${java.util.UUID.randomUUID().toString.take(8)}"
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sc = spark.sparkContext
    val srv = HttpCallbacks.start() { (topic, _) =>
      // immediate mid-task delivery: the FIRST progress post cancels the
      // group while every task is still sleeping — the accumulator
      // channel structurally cannot do this (posts surface at task
      // completion), which is this endpoint's reason to exist
      if (topic == "progress" && !cancelled.getAndSet(true))
        sc.cancelJobGroup(group)
    }
    val completed = sc.collectionAccumulator[Int]("http_stop_completed")
    try {
      val ch = srv.channel
      sc.setJobGroup(group, "http early-stop test", interruptOnCancel = true)
      val nParts = sc.defaultParallelism
      val thrown = intercept[Exception] {
        spark.range(nParts).repartition(nParts).rdd.foreachPartition { _ =>
          ch.post("progress", "1")
          Thread.sleep(30000) // interrupted by the cancel, never served out
          completed.add(1)
        }
      }
      assert(thrown.getMessage.toLowerCase.contains("cancel"))
      assert(cancelled.get())
      // no task slept through to completion: the cancel landed mid-task
      assert(completed.value.isEmpty)
    } finally {
      sc.clearJobGroup()
      srv.stop()
    }
  }

  test("streaming: windowed aggregation over bounded file source") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream").toString
    val batch = df(Seq(
      Seq("2024-01-01 00:00:10", "a", 1.0),
      Seq("2024-01-01 00:00:50", "a", 2.0),
      Seq("2024-01-01 00:05:10", "b", 5.0)), "ts:datetime,k:str,v:double")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streaming.loadStream(spark, s"$dir/in", batch.schema)
    val agg = Streaming.windowedAgg(stream, "ts", "10 minutes", "5 minutes",
      None, Seq("k"), Seq(sum(col("v")).as("total"), count(lit(1)).as("n")))
    // append mode only emits a window after the watermark passes its end;
    // a bounded AvailableNow run never advances past the last event, so use
    // complete mode to observe the windows
    Streaming.runToMemory(agg, "win_out", outputMode = "complete")
    val got = spark.table("win_out")
      .select(col("k"), col("total"), col("n")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === Set(("a", 3.0, 2L), ("b", 5.0, 1L)))
  }

  test("streaming: stateful sessionize with flatMapGroupsWithState") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream2").toString
    val batch = df(Seq(
      Seq("u1", 1L), Seq("u1", 2L), Seq("u2", 7L)), "user:str,n:long")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streaming.loadStream(spark, s"$dir/in", batch.schema)
      .as[(String, Long)]
    val out = Streaming.statefulTransform[(String, Long), String, Long, (String, Long)](
      stream, _._1) { (user, rows, state: org.apache.spark.sql.streaming.GroupState[Long]) =>
      val sum = state.getOption.getOrElse(0L) + rows.map(_._2).sum
      state.update(sum)
      Iterator.single((user, sum))
    }
    Streaming.runToMemory(out.toDF("user", "running"), "sess_out")
    val got = spark.table("sess_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("u1", 3L), ("u2", 7L)))
  }

  test("streaming: stream-static enrichment join and foreachBatch sink") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream3").toString
    val batch = df(Seq(
      Seq(1L, "click"), Seq(2L, "view"), Seq(3L, "unknown_type")),
      "id:long,etype:str")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val dim = df(Seq(Seq("click", "engagement"), Seq("view", "engagement")),
      "etype:str,category:str")
    val stream = Streaming.loadStream(spark, s"$dir/in", batch.schema)
    val joined = Streaming.enrichWithStatic(stream, dim, Seq("etype"), "left")
      .select("id", "etype", "category")
    Streaming.runToMemory(joined, "enrich_out")
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "click", "engagement"), (2L, "view", "engagement"),
      (3L, "unknown_type", null)))
    // foreachBatch: arbitrary batch action per micro-batch
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    Streaming.foreachBatchSink(stream, s"$dir/ckpt") { (b, _) =>
      seen.addAndGet(b.count())
    }
    assert(seen.get() === 3L)
  }

  test("streaming: stream-stream interval join (inner + outer with watermark close)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream4").toString
    val clicksB = df(Seq(
      Seq("2024-01-01 00:00:00", "u1", 101L),
      Seq("2024-01-01 00:00:00", "u2", 102L),
      Seq("2024-01-01 01:00:00", "u3", 103L)), // watermark anchor
      "click_ts:datetime,user:str,click_id:long")
    val purchB = df(Seq(
      Seq("2024-01-01 00:05:00", "u1", 201L), // inside u1's 10-min window
      Seq("2024-01-01 00:20:00", "u1", 202L), // outside the window
      Seq("2024-01-01 01:00:00", "u4", 204L)), // watermark anchor
      "purch_ts:datetime,user:str,purch_id:long")
    clicksB.write.mode("overwrite").parquet(s"$dir/c")
    purchB.write.mode("overwrite").parquet(s"$dir/p")
    val c = Streaming.loadStream(spark, s"$dir/c", clicksB.schema)
    val p = Streaming.loadStream(spark, s"$dir/p", purchB.schema)
    val inner = Streaming.streamStreamJoin(c, p, Seq("user"),
      "click_ts", "purch_ts", "0 seconds", "10 minutes")
    // schema layout: left columns in place (key coalesced at its left
    // position), then right non-key columns — positional consumers of
    // the inner join see the same order the drop-right-keys form gave
    assert(inner.columns.toSeq ===
      Seq("click_ts", "user", "click_id", "purch_ts", "purch_id"))
    Streaming.runToMemory(inner.select("click_id", "purch_id"), "ss_inner")
    val gotInner = spark.table("ss_inner").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotInner === Set((101L, 201L)))
    // left_outer: clicks whose match window closed under the watermark
    // emit a null purchase; the 01:00 anchor click's window is still open
    val outer = Streaming.streamStreamJoin(
      Streaming.loadStream(spark, s"$dir/c", clicksB.schema),
      Streaming.loadStream(spark, s"$dir/p", purchB.schema),
      Seq("user"), "click_ts", "purch_ts", "0 seconds", "10 minutes",
      joinType = "left_outer")
      .select(col("click_id"), col("purch_id"))
    Streaming.runToMemory(outer, "ss_outer")
    val gotOuter = spark.table("ss_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(gotOuter.contains((101L, 201L)))
    assert(gotOuter.contains((102L, -1L)), "closed-window click must emit null match")
    // right_outer: an unmatched right row keeps its KEY (coalesced from
    // the right side — dropping r(key) here would erase the identity of
    // the unattributed purchase)
    val ro = Streaming.streamStreamJoin(
      Streaming.loadStream(spark, s"$dir/c", clicksB.schema),
      Streaming.loadStream(spark, s"$dir/p", purchB.schema),
      Seq("user"), "click_ts", "purch_ts", "0 seconds", "10 minutes",
      joinType = "right_outer")
      .select(col("user"), col("click_id"), col("purch_id"))
    Streaming.runToMemory(ro, "ss_right")
    val gotRight = spark.table("ss_right").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2))).toSet
    assert(gotRight.contains(("u1", 101L, 201L)))
    assert(gotRight.contains(("u1", -1L, 202L)),
      "out-of-window purchase keeps user key with null click")
    // guard rails: shared non-key columns and identical time names rejected
    intercept[IllegalArgumentException] {
      Streaming.streamStreamJoin(c, c, Seq("user"),
        "click_ts", "click_ts", "0 seconds", "10 minutes")
    }
    intercept[IllegalArgumentException] {
      val p2 = p.withColumnRenamed("purch_ts", "click_ts2")
        .withColumnRenamed("purch_id", "click_id")
      Streaming.streamStreamJoin(c, p2, Seq("user"),
        "click_ts", "click_ts2", "0 seconds", "10 minutes")
    }
  }

  test("streaming: per-batch quality monitor reports every micro-batch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream5").toString
    val batch = df(Seq(
      Seq(1L, 10.0), Seq(2L, 20.0), Seq(3L, -5.0)), "id:long,v:double")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streaming.loadStream(spark, s"$dir/in", batch.schema)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[org.apache.spark.sql.Row])]
    Streaming.qualityMonitorSink(stream, s"$dir/ckpt", Seq(
      graft.functions.Checks.notNull("id"),
      graft.functions.Checks.minValue("v", 0.0))) { (id, rep) =>
      reports.synchronized { reports += ((id, rep)) }
    }
    assert(reports.nonEmpty)
    val rep = reports.head._2
    assert(rep.length === 2)
    assert(rep(0).getBoolean(3), "not_null passes")
    assert(!rep(1).getBoolean(3), "the -5.0 row fails min>=0")
    assert(rep(1).getDouble(2) === -5.0)
  }

  test("streaming: drift monitor flags a shifted micro-batch against the reference") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream6").toString
    // batch shifted to the top of the reference range → large PSI
    val batch = df((1 to 100).map(i => Seq(i.toLong, 80.0 + (i % 20))),
      "id:long,v:double")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val reference = df((1 to 1000).map(i => Seq(i.toLong, (i % 100).toDouble)),
      "id:long,v:double")
    val stream = Streaming.loadStream(spark, s"$dir/in", batch.schema)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Int)]
    Streaming.driftMonitorSink(stream, s"$dir/ckpt", reference, "v",
      bins = 10) { (id, psi, rows) =>
      reports.synchronized { reports += ((id, psi, rows.length)) }
    }
    assert(reports.nonEmpty)
    assert(reports.head._2 > 0.25, s"shifted batch must flag, psi=${reports.head._2}")
    assert(reports.head._3 === 10)
  }

  test("conform: reorder, cast, NaN->null for fractional->int") {
    val d = df(Seq(Seq(1.5, "7"), Seq(Double.NaN, "8")), "a:double,b:str")
    val out = engine.conform(d, "b:int,a:long")
    assert(out.columns.toSeq === Seq("b", "a"))
    assertDfEq(out, Seq(Seq(7, 1L), Seq(8, null)))
  }

  test("dropNearDuplicates: star and chain components keep only min id") {
    val docs = df((1L to 8L).map(i => Seq(i, s"d$$i")), "doc_id:long,t:str")
    // component {1,2,5} via star on 5; chain {3,4}; {6,7,8} chain; singleton none
    val pairs = df(Seq(
      Seq(1L, 5L), Seq(2L, 5L),          // star: hub 5 links 1 and 2
      Seq(3L, 4L),
      Seq(6L, 7L), Seq(7L, 8L)), "id_a:long,id_b:long")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L, 6L))
    // distributed min-label path (driverMaxEdges=0 disables the driver
    // union-find) must agree exactly
    val keptDist = Dedup.dropNearDuplicates(docs, "doc_id", pairs,
      driverMaxEdges = 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptDist === kept)
  }

  test("nearDupComponents and dropNearDuplicatesBy: quality-aware representatives") {
    // components {1,2,5}, {3,4}, {6,7,8}; 9 unpaired
    val docs = df(Seq(
      Seq(1L, 10), Seq(2L, 90), Seq(3L, 50), Seq(4L, 50), Seq(5L, 20),
      Seq(6L, 5), Seq(7L, 99), Seq(8L, 40), Seq(9L, 1)), "doc_id:long,q:int")
    val pairs = df(Seq(
      Seq(1L, 5L), Seq(2L, 5L), Seq(3L, 4L), Seq(6L, 7L), Seq(7L, 8L)),
      "id_a:long,id_b:long")
    for (dme <- Seq(1 << 18, 0)) { // driver and distributed paths
      val comps = Dedup.nearDupComponents(docs, "doc_id", pairs, driverMaxEdges = dme)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(comps === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 3L,
        6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L), s"driverMaxEdges=$dme")
      // best quality wins per component (2: q=90; ties 3/4 -> min id 3; 7: q=99)
      val best = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "q",
        driverMaxEdges = dme)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(best === Seq(2L, 3L, 7L, 9L), s"driverMaxEdges=$dme")
      // ascending on the id column reproduces the min-id convention
      val minId = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "doc_id",
        descending = false, driverMaxEdges = dme)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val reference = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(minId === reference, s"driverMaxEdges=$dme")
    }
    // empty pair list: everything is its own component, nothing dropped
    val noPairs = df(Seq.empty[Seq[Any]], "id_a:long,id_b:long")
    assert(Dedup.nearDupComponents(docs, "doc_id", noPairs)
      .filter(col("doc_id") =!= col("component")).count() === 0)
    assert(Dedup.dropNearDuplicatesBy(docs, "doc_id", noPairs, "q").count() === 9)
  }

  test("dropNearDuplicates: driver path matches Spark string order on supplementary chars") {
    // UTF-16 code-unit order says U+1F600 < U+FFFF; UTF-8 binary order
    // (Spark's) says the opposite — both paths must agree on the survivor
    val emoji = new String(Character.toChars(0x1F600))
    val ids = Seq("￿", emoji, "b")
    val docs = df(ids.map(i => Seq(i, "x")), "doc_id:str,t:str")
    val pairs = df(Seq(Seq(ids(0), ids(1)), Seq(ids(1), ids(2))),
      "id_a:str,id_b:str")
    val driver = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    val dist = Dedup.dropNearDuplicates(docs, "doc_id", pairs, driverMaxEdges = 0)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(driver === dist)
    assert(driver === Seq("b")) // 0x62 is the UTF-8 minimum of the component
  }

  test("dropNearDuplicates: binary ids route to the distributed path") {
    val docs = df(Seq(Seq("aa"), Seq("bb"), Seq("cc")), "s:str")
      .select(encode(col("s"), "UTF-8").as("doc_id"), col("s"))
    val pairs = df(Seq(Seq("aa", "bb")), "a:str,b:str")
      .select(encode(col("a"), "UTF-8").as("id_a"),
        encode(col("b"), "UTF-8").as("id_b"))
    // would ClassCastException in a naive driver union-find (byte arrays
    // neither hash nor compare); the type gate must fall back
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("s").collect().map(_.getString(0)).sorted.toSeq
    assert(kept === Seq("aa", "cc"))
  }
}
