package graft

import graft.api._
import graft.engine.GraftEngine
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, sum}

/** Eager functional API facade — the reference's fa.* entry points. */
class ApiSpec extends SparkTestBase {
  implicit lazy val e: GraftEngine = engine

  test("end-to-end through the eager api") {
    val events = toDF(Seq(
      Seq(1L, "a", 3), Seq(2L, "a", 1), Seq(3L, "b", 9), Seq(4L, "b", 2)),
      "id:long,k:str,v:int")
    val top = take(events, 1,
      PartitionSpec(by = Seq("k"), presort = Seq("v" -> false)))
    assertDfEq(top, Seq(Seq(1L, "a", 3), Seq(3L, "b", 9)))

    val agg = aggregate(events, Seq("k"), Seq(sum(col("v")).cast("long").as("s")))
    assertDfEq(agg, Seq(Seq("a", 4L), Seq("b", 11L)))

    val dim = toDF(Seq(Seq("a", "alpha"), Seq("b", "beta")), "k:str,name:str")
    val joined = innerJoin(agg, broadcast(dim))
    assertDfEq(joined, Seq(Seq("a", 4L, "alpha"), Seq("b", 11L, "beta")))

    val tr = transform(events, "k:str,n:long", PartitionSpec(by = Seq("k"))) {
      (cursor, rows) => Iterator.single(Row(cursor.keyValues.head, rows.size.toLong))
    }
    assertDfEq(tr, Seq(Seq("a", 2L), Seq("b", 2L)))

    val ct = cotransform(events, dim, Seq("k"), "inner", "k:str,n:long") {
      (key, l, r) => { r.size; Iterator.single(Row(key.head, l.size.toLong)) }
    }
    assertDfEq(ct, Seq(Seq("a", 2L), Seq("b", 2L)))

    val seen = spark.sparkContext.longAccumulator
    outTransform(events, PartitionSpec(by = Seq("k"))) { (_, rows) =>
      rows.foreach(_ => seen.add(1))
    }
    assert(seen.value === 4)

    val sql = rawSql("SELECT k FROM t WHERE v > 5", "t" -> events)
    val sql2 = rawSqlParts("SELECT k FROM", events, "WHERE v > 5")
    assertDfEq(sql2, Seq(Seq("b")))
    assertDfEq(sql, Seq(Seq("b")))

    val fs = fugueSql("TAKE 1 ROWS FROM ev PRESORT v DESC\nYIELD AS best",
      Map("ev" -> events))
    assertDfEq(fs.yields("best"), Seq(Seq(3L, "b", 9)))
  }

  test("normalizeColumnNames follows the reference rules incl. collisions") {
    val d = spark.range(1).selectExpr("id as `*a`", "id as `-a`",
      "id as `1a`", "id as ok")
    val (out, undo) = normalizeColumnNames(d)
    assert(out.columns.toSeq === Seq("_a", "_a_1", "_1a", "ok"))
    assert(undo === Map("_a" -> "*a", "_a_1" -> "-a", "_1a" -> "1a"))
    // already-valid names: identity, empty undo map
    val clean = toDF(Seq(Seq(1)), "x:int")
    val (same, none) = normalizeColumnNames(clean)
    assert((same eq clean) && none.isEmpty)
    // duplicate invalid names each get a unique result (post-join frames
    // legally carry duplicates; withColumnRenamed would rename both)
    val dup = spark.range(1).selectExpr("id as `*a`", "id as `*a`")
    val (dOut, dUndo) = normalizeColumnNames(dup)
    assert(dOut.columns.toSeq === Seq("_a", "_a_1"))
    assert(dUndo === Map("_a" -> "*a", "_a_1" -> "*a"))
    // non-ASCII letters are NOT valid identifiers — they normalize too
    val uni = spark.range(1).selectExpr("id as `naïve`")
    assert(normalizeColumnNames(uni)._1.columns.toSeq === Seq("na_ve"))
    // collision detection is case-INSENSITIVE (Spark's default resolver
    // is): "_A" exists, so "*a" must not normalize to the ambiguous "_a"
    val ci = spark.range(1).selectExpr("id as `_A`", "id as `*a`")
    assert(normalizeColumnNames(ci)._1.columns.toSeq === Seq("_A", "_a_1"))
  }

  test("Engines global/context management") {
    Engines.clearGlobal()
    intercept[IllegalStateException](Engines.current)
    Engines.withEngine(e) {
      assert(Engines.current eq e)
      Engines.withEngine(e) { assert(Engines.current eq e) }
    }
    intercept[IllegalStateException](Engines.current) // restored
    Engines.setGlobal(e)
    assert(Engines.current eq e)
    // concurrent sibling contexts are isolated (thread-local, not a
    // shared global): each thread sees its own engine throughout, and
    // neither leaks after both exit. (A thread SPAWNED inside a context
    // inherits it at spawn time — InheritableThreadLocal semantics.)
    val e2 = engineOf(spark)
    val e3 = engineOf(spark)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def worker(mine: GraftEngine) = new Thread(() =>
      Engines.withEngine(mine) {
        barrier.await() // both threads inside their contexts simultaneously
        seen.add(Engines.current eq mine)
        barrier.await()
        seen.add(Engines.current eq mine)
      })
    val (t1, t2) = (worker(e2), worker(e3))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(seen.size === 4 && seen.toArray.forall(_ == true),
      "concurrent contexts corrupted each other")
    assert(Engines.current eq e, "global must survive context exits")
    Engines.clearGlobal()
  }

  test("GraftFrame dataset-surface parity: bounded/local/partitions") {
    val f = GraftFrame(spark.range(2).selectExpr("CAST(id AS INT) AS x"))
    assert(f.isBounded)
    assert(!f.isLocal) // lazy computed plan, not materialized on this JVM
    assert(f.numPartitions >= 1)
    val loc = f.asLocal
    assert(loc.isLocal)
    assert(loc.count === 2)
  }

  test("multi-df folds: join/union/subtract/intersect over N frames") {
    val a = df(Seq(Seq(1, "x"), Seq(2, "y")), "k:int,a:str")
    val b = df(Seq(Seq(1, 10.0), Seq(2, 20.0)), "k:int,b:double")
    val c = df(Seq(Seq(1, true), Seq(3, false)), "k:int,c:bool")
    // 3-way join: keys inferred pairwise; schema folds left
    assertDfEq(engine.join(Seq(a, b, c), "inner"),
      Seq(Seq(1, "x", 10.0, true)))
    val u1 = df(Seq(Seq(1), Seq(2)), "x:int")
    val u2 = df(Seq(Seq(2), Seq(3)), "x:int")
    val u3 = df(Seq(Seq(3), Seq(4)), "x:int")
    assertDfEq(engine.union(Seq(u1, u2, u3), distinct = true),
      Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    assertDfEq(engine.subtract(Seq(u1, u2, u3), distinct = true), Seq(Seq(1)))
    val i1 = df(Seq(Seq(1), Seq(2), Seq(3)), "x:int")
    assertDfEq(engine.intersect(Seq(i1, u2, u3), distinct = true), Seq(Seq(3)))
    intercept[IllegalArgumentException](engine.join(Seq(a), "inner"))
  }

  test("DfUtils.withRowIndex / runningTotal: contiguous, order-correct, null-safe") {
    val d = df((1 to 103).map(i => Seq((104 - i).toLong, i.toLong)), "k:long,v:long")
    val idx = graft.api.DfUtils.withRowIndex(d, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(idx.map(_._2).toSeq === (0L until 103L)) // contiguous in k order
    assert(idx.head === ((1L, 0L)) && idx.last === ((103L, 102L)))
    // weighted: exclusive running total of v in k order
    val rt = graft.api.DfUtils.runningTotal(d, Seq("k"),
      org.apache.spark.sql.functions.col("v"), "rt")
      .orderBy("k").collect().map(_.getLong(2))
    // k ascending corresponds to v descending (v = 104 - k)
    val vsInKOrder = (1 to 103).map(k => (104 - k).toLong)
    assert(rt.toSeq === vsInKOrder.scanLeft(0L)(_ + _).init)
    intercept[IllegalArgumentException] {
      graft.api.DfUtils.withRowIndex(d, Seq("k"), indexCol = "v")
    }
    // fractional weights would silently truncate — rejected
    val dd = df(Seq(Seq(1L, 0.5)), "k:long,w:double")
    intercept[IllegalArgumentException] {
      graft.api.DfUtils.runningTotal(dd, Seq("k"),
        org.apache.spark.sql.functions.col("w"), "rt")
    }
    // internal working names are reserved
    val dl = df(Seq(Seq(1L, 2L)), "k:long,__loc:long")
    intercept[IllegalArgumentException] {
      graft.api.DfUtils.withRowIndex(dl, Seq("k"))
    }
  }

  test("column-surgery facade: alter/rename/drop/select columns, head, introspection") {
    val d = toDF(Seq(Seq(1L, "x", 1.5), Seq(2L, "y", 2.5)), "id:long,k:str,v:double")
    assert(alterColumns(d, "v:int").schema("v").dataType.typeName === "integer")
    assert(renameColumns(d, Map("k" -> "key")).columns.toSeq ===
      Seq("id", "key", "v"))
    assert(dropColumns(d, Seq("v")).columns.toSeq === Seq("id", "k"))
    assert(dropColumns(d, Seq("nope"), ifExists = true).columns.toSeq ===
      d.columns.toSeq)
    assert(selectColumns(d, Seq("v", "id")).columns.toSeq === Seq("v", "id"))
    assert(head(d, 1).map(_.getLong(0)) === Seq(1L))
    assert(getColumnNames(d) === Seq("id", "k", "v"))
    assert(getNumPartitions(d) >= 1)
    assert(!isEmpty(d) && isEmpty(d.filter(col("id") > 10)))
  }

  test("DfUtils.ntile: equals the window ntile for every (count, n) shape") {
    import org.apache.spark.sql.functions.{col, ntile => wntile}
    import org.apache.spark.sql.expressions.Window
    // counts exercising c % n = 0, c < n, and ragged remainders
    for ((c, n) <- Seq((103, 4), (8, 3), (3, 7), (100, 10), (1, 1))) {
      val d = df((1 to c).map(i => Seq(((i * 37) % c).toLong, i.toLong)),
        "k:long,id:long")
      val got = graft.api.DfUtils.ntile(d, n, Seq("k", "id"), "b")
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = d.withColumn("b",
          wntile(n).over(Window.orderBy(col("k"), col("id"))))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want, s"c=$c n=$n")
    }
    // the point of the primitive: no global window in the plan — use the
    // AQE-unwrapping collector (a plain collect over an adaptive plan sees
    // only the AdaptiveSparkPlanExec leaf and would pass vacuously)
    val big = df((1 to 50).map(i => Seq(i.toLong)), "k:long")
    val plan = graft.api.DfUtils.ntile(big, 4, Seq("k"), "b")
      .queryExecution.executedPlan
    assert(PlanLint.collectUnwrapped(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }.isEmpty, "distributed ntile must not plan a global window")
    // the collector itself must see inner nodes: a deliberately global
    // window must be FOUND (guards against the vacuous-collect regression)
    val globalPlan = big.withColumn("r",
        org.apache.spark.sql.functions.row_number().over(Window.orderBy("k")))
      .queryExecution.executedPlan
    assert(PlanLint.collectUnwrapped(globalPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }.nonEmpty, "collector failed to find a known global window")
  }

  test("DfUtils.profile: dotted names and nested-map columns") {
    import org.apache.spark.sql.functions.{col, map, lit, array, struct}
    val base = df(Seq(Seq("a", 1), Seq("b", 2)), "k:str,v:int")
    val d = base.select(col("k").as("a.b"),
      array(map(lit("x"), col("v"))).as("am"),
      struct(col("v").as("i"), map(lit("y"), col("v")).as("m")).as("sm"))
    val p = graft.api.DfUtils.profile(d).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("a.b") === Seq(2L, 0L, 2L, "a", "b"))
    // nested maps: profiled without min/max instead of throwing
    assert(p("am")(2) === 2L && p("am")(3) == null && p("am")(4) == null)
    assert(p("sm")(3) == null && p("sm")(4) == null)
  }

  test("Upsert: delete/update/insert, pass-through, version election") {
    import graft.operators.Upsert
    val base = df(Seq(
      Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d")),
      "id:long,v:str")
    val changes = df(Seq(
      Seq(1L, "x", "U", 1L),   // stale update, superseded by the delete
      Seq(1L, "y", "D", 2L),   // delete id=1
      Seq(2L, "B", "U", 1L),   // update id=2
      Seq(5L, "E", "U", 1L)),  // insert id=5
      "id:long,v:str,op:str,version:long")
    assertDfEq(
      Upsert.upsert(base, changes, Seq("id"), versionCol = Some("version")),
      Seq(Seq(2L, "B"), Seq(3L, "c"), Seq(4L, "d"), Seq(5L, "E")))
    // same-version delete+upsert race resolves toward the delete
    val race = df(Seq(
      Seq(3L, "z", "U", 7L), Seq(3L, "w", "D", 7L)),
      "id:long,v:str,op:str,version:long")
    assertDfEq(
      Upsert.upsert(base, race, Seq("id"), versionCol = Some("version")),
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(4L, "d")))
    // guards: missing op column, key not in base
    intercept[IllegalArgumentException] {
      Upsert.upsert(base, changes.drop("op"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Upsert.upsert(base, changes, Seq("nope"))
    }
  }

  test("Layout.exportShards: manifest integrity, determinism, tamper detection") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val d = toDF((1L to 200L).map(i => Seq(i, s"doc$i", (i % 7).toDouble)),
      "id:long,text:str,score:double")
    val manifest = Layout.exportShards(d, s"$dir/out", nShards = 8, keyCols = Seq("id"))
    assert(manifest.map(_._1).toSet === (0 until 8).toSet)
    assert(manifest.map(_._2).sum === 200L, "row conservation across shards")
    // round trip: content identical, verification clean
    val back = spark.read.parquet(s"$dir/out")
    assert(back.drop("__shard").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      (1L to 200L))
    assert(Layout.verifyShards(spark, s"$dir/out") === Seq.empty)
    // deterministic: re-export produces the identical manifest
    val manifest2 = Layout.exportShards(d, s"$dir/out2", nShards = 8, keyCols = Seq("id"))
    assert(manifest2 === manifest)
    // tamper: drop one shard's files -> that shard (and only it) flagged
    val shard0 = new java.io.File(s"$dir/out/__shard=0")
    shard0.listFiles().foreach(_.delete()); shard0.delete()
    assert(Layout.verifyShards(spark, s"$dir/out") === Seq(0))
    intercept[IllegalArgumentException] {
      Layout.exportShards(d, s"$dir/out3", nShards = 0)
    }
    // pre-existing __shard column would be silently consumed by the write
    intercept[IllegalArgumentException] {
      Layout.exportShards(d.withColumn("__shard", col("id")), s"$dir/out4", 4)
    }
    // empty export: manifest [], verify returns clean instead of crashing
    val empty = Layout.exportShards(d.filter(col("id") < 0), s"$dir/out5", 4)
    assert(empty === Seq.empty)
    assert(Layout.verifyShards(spark, s"$dir/out5") === Seq.empty)
  }

  test("DfUtils.keySkew: heavy keys, ties by key, summary ratios, multi-col") {
    import graft.api.DfUtils
    // k0 x6, k1 x2, k2 x2, k3 x1 -> n_keys 4, total 11, max 6,
    // skew = 6*4/11; tie between k1/k2 breaks by key asc
    val d = toDF(
      ((1 to 6).map(_ => "k0") ++ Seq("k1", "k1", "k2", "k2", "k3"))
        .map(Seq(_)), "k:str")
    val got = DfUtils.keySkew(d, Seq("k"), topK = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.length === 3)
    assert(got(0) === ((1L, "k0", 6L, 6.0 / 11, 4L, 11L, 24.0 / 11)))
    assert(got(1)._2 === "k1" && got(2)._2 === "k2")
    // multi-column keys render '|'-joined; uniform keys -> skew 1.0
    val u = toDF(Seq(Seq("a", 1L), Seq("a", 2L), Seq("b", 1L), Seq("b", 2L)),
      "g:str,i:long")
    val us = DfUtils.keySkew(u, Seq("g", "i"), topK = 10).collect()
    assert(us.length === 4 && us.forall(_.getDouble(6) === 1.0))
    assert(us.map(_.getString(1)).toSet ===
      Set("a|1", "a|2", "b|1", "b|2"))
    intercept[IllegalArgumentException](DfUtils.keySkew(d, Seq.empty))
    intercept[IllegalArgumentException](DfUtils.keySkew(d, Seq("k"), 0))
    // null key components render as U+2400 so distinct keys like
    // (x, null) and (null, x) stay distinct display strings — and a
    // genuine "NULL" string value cannot collide with a real null
    val n = toDF(Seq(Seq("x", null), Seq(null, "x"), Seq("NULL", "x")),
      "a:str,b:str")
    assert(DfUtils.keySkew(n, Seq("a", "b")).collect()
      .map(_.getString(1)).toSet === Set("x|␀", "␀|x", "NULL|x"))
  }

  test("Layout tar shards: WebDataset round trip, determinism, null fields, tamper") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toString
    val d = toDF((1L to 120L).map(i => Seq(i, s"text $i",
      if (i % 5 == 0) null else s"m$i".getBytes("UTF-8"))),
      "id:long,txt:str,img:bytes")
    val m = Layout.exportTarShards(d, s"$dir/a", "id",
      Seq("txt" -> "txt", "img" -> "jpg"), nShards = 4)
    assert(m.map(_._1).toSet === (0 until 4).toSet)
    assert(m.map(_._2).sum === 120L, "sample conservation")
    // every sample has a txt entry; img missing on every 5th (null field)
    assert(m.map(_._3).sum === 120L + 96L, "entry count (null fields skipped)")
    assert(Layout.verifyTarShards(spark, s"$dir/a") === Seq.empty)
    // byte-determinism: identical data re-exports to identical checksums
    val m2 = Layout.exportTarShards(d, s"$dir/b", "id",
      Seq("txt" -> "txt", "img" -> "jpg"), nShards = 4)
    assert(m2 === m)
    // round trip: reassemble samples and compare content
    val back = Layout.loadTarShards(spark, s"$dir/a")
    assert(back.count() === 216L)
    val byKey = back.collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        new String(r.getAs[Array[Byte]](3), "UTF-8")).toMap
    assert(byKey(("7", "txt")) === "text 7")
    assert(byKey(("7", "jpg")) === "m7")
    assert(!byKey.contains(("5", "jpg")))
    // shard in the frame matches the file the entry came from
    assert(back.select("shard").distinct().count() === 4)
    // tamper: flip a content byte in one shard -> only that shard flagged
    // (tars end in zero padding, so a truncation-only tamper can be
    // invisible to the parse — corrupt the data region instead)
    val f = new java.io.File(s"$dir/a/shard-00002.tar")
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.seek(f.length() / 2)
    val b0 = raf.read(); raf.seek(f.length() / 2); raf.write(b0 ^ 0xff)
    raf.close()
    assert(Layout.verifyTarShards(spark, s"$dir/a") === Seq(2))
    // guards: null id raises in-pass; bad extension/type/config raise
    val withNull = toDF(Seq(Seq(null, "x", "y".getBytes("UTF-8"))),
      "id:long,txt:str,img:bytes")
    val err = intercept[Exception] {
      Layout.exportTarShards(withNull, s"$dir/c", "id",
        Seq("txt" -> "txt"), nShards = 2)
    }
    assert(stackMessages(err).contains("NULL sample id"), err.toString)
    intercept[IllegalArgumentException] {
      Layout.exportTarShards(d, s"$dir/d", "id", Seq("txt" -> "a.b"), 2)
    }
    intercept[IllegalArgumentException] {
      Layout.exportTarShards(d, s"$dir/e", "id",
        Seq("txt" -> "txt", "img" -> "txt"), 2)
    }
    intercept[IllegalArgumentException] {
      Layout.exportTarShards(d.withColumn("f", col("id")), s"$dir/f", "id",
        Seq("f" -> "bin"), 2)
    }
    // overwrite semantics: a smaller re-export removes orphan shards so
    // loadTarShards cannot serve stale samples
    val small = toDF(Seq(Seq(1L, "only")), "id:long,txt:str")
    Layout.exportTarShards(small, s"$dir/a", "id", Seq("txt" -> "txt"), 1)
    assert(Layout.loadTarShards(spark, s"$dir/a").count() === 1L)
    assert(Layout.verifyTarShards(spark, s"$dir/a") === Seq.empty)
    // duplicate sample ids with DISJOINT non-null fields merge into one
    // sample; census counts keys-with-entries, verify agrees, and the
    // byte-determinism contract holds (hash-ordered ties); a row whose
    // fields are ALL null contributes no sample at all
    val dup = toDF(Seq(
      Seq(1L, "a", null), Seq(1L, null, "p".getBytes("UTF-8")),
      Seq(2L, "c", null), Seq(3L, null, null)),
      "id:long,txt:str,img:bytes")
    val md1 = Layout.exportTarShards(dup, s"$dir/g", "id",
      Seq("txt" -> "txt", "img" -> "bin"), 1)
    val md2 = Layout.exportTarShards(dup, s"$dir/h", "id",
      Seq("txt" -> "txt", "img" -> "bin"), 1)
    assert(md1.head._2 === 2L && md1.head._3 === 3L) // id=3 is no sample
    assert(md1 === md2)
    assert(Layout.verifyTarShards(spark, s"$dir/g") === Seq.empty)
    // a duplicate (id, extension) pair would crash real WebDataset
    // readers at train time — it must fail at WRITE time
    val clash = toDF(Seq(Seq(1L, "b"), Seq(1L, "a")), "id:long,txt:str")
    val dupErr = intercept[Exception] {
      Layout.exportTarShards(clash, s"$dir/i", "id", Seq("txt" -> "txt"), 1)
    }
    assert(stackMessages(dupErr).contains("duplicate entry"), dupErr.toString)
    // loadTarShards refuses a manifest-less (interrupted) export
    val orphanDir = java.nio.file.Files.createTempDirectory("graft_orphan")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/g/shard-00000.tar"),
      orphanDir.resolve("shard-00000.tar"))
    intercept[java.io.FileNotFoundException] {
      Layout.loadTarShards(spark, orphanDir.toString)
    }
  }

  test("Layout tar shards: commit race and corrupt-first-header verdicts") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_race").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def put(p: Path, bytes: Array[Byte]): Unit = {
      val os = fs.create(p, true)
      try os.write(bytes) finally os.close()
    }
    // losing attempt: a competing attempt already committed the final
    // shard (byte-identical by the deterministic-sort contract) — the
    // commit must drop the temp copy, keep the winner's file, not throw
    val bytes = "identical shard bytes".getBytes("UTF-8")
    val tmp = new Path(s"$dir/_tmp/shard-00000.tar.attempt-7")
    val dst = new Path(s"$dir/shard-00000.tar")
    put(tmp, bytes); put(dst, bytes)
    Layout.commitShardFile(fs, tmp, dst)
    assert(!fs.exists(tmp), "losing attempt's temp file must be cleaned")
    assert(fs.exists(dst))
    val in = fs.open(dst)
    val kept = try in.readAllBytes() finally in.close()
    assert(kept.toSeq === bytes.toSeq, "winner's committed bytes intact")
    // a rename failure with NO competing commit is a real task error
    intercept[java.io.IOException] {
      Layout.commitShardFile(fs,
        new Path(s"$dir/_tmp/shard-00001.tar.attempt-9"),
        new Path(s"$dir/shard-00001.tar"))
    }
    // winning attempt: plain rename commits and the manifest a real
    // export writes verifies clean end-to-end
    val d = toDF((1L to 40L).map(i => Seq(i, s"t$i")), "id:long,txt:str")
    Layout.exportTarShards(d, s"$dir/e", "id", Seq("txt" -> "txt"), 2)
    assert(Layout.verifyTarShards(spark, s"$dir/e") === Seq.empty)
    // corrupt FIRST header: TarEntryIterator's header read is lazy, so
    // the parse failure maps to this shard's (-1,-1,'corrupt') mismatch
    // verdict instead of failing the whole verify job (and the opened
    // stream is still closed via the finally)
    val raf = new java.io.RandomAccessFile(s"$dir/e/shard-00000.tar", "rw")
    raf.seek(0); (0 until 128).foreach(_ => raf.write(0xff)); raf.close()
    assert(Layout.verifyTarShards(spark, s"$dir/e") === Seq(0))
  }

  test("Layout.compact: fragmented shrinks toward target, compact untouched") {
    // parquet-backed: footer totals give Catalyst a REAL size estimate
    // (an RDD-backed local frame has no stats -> compact conservatively
    // keeps the current layout; that path is covered below via coalesce)
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    df((1 to 5000).map(i => Seq(i.toLong, s"payload_$i" * 8)),
      "id:long,payload:str").repartition(64)
      .write.mode("overwrite").parquet(tmp)
    val d = spark.read.parquet(tmp)
    // big target -> far fewer partitions; identical content
    val compacted = graft.operators.Layout.compact(d, targetBytes = 64L << 20)
    assert(compacted.rdd.getNumPartitions < 64)
    assert(compacted.count() === 5000L)
    assert(compacted.agg(org.apache.spark.sql.functions.sum("id"))
      .first().getLong(0) === (1 to 5000).map(_.toLong).sum)
    // already-compact input is left alone (never exploded)
    val small = d.repartition(2)
    assert(graft.operators.Layout.compact(small, targetBytes = 1L)
      .rdd.getNumPartitions === 2)
    // key-clustered compaction co-locates keys in one partition
    val keyed = graft.operators.Layout.compact(
      d.withColumn("k", col("id") % 4), targetBytes = 64L << 20,
      keyCols = Seq("k"))
    val spreadCount = keyed
      .select(col("k"), org.apache.spark.sql.functions
        .spark_partition_id().as("p"))
      .distinct().groupBy("k").count().collect()
    assert(spreadCount.forall(_.getLong(1) === 1L))
    intercept[IllegalArgumentException] {
      graft.operators.Layout.compact(d, targetBytes = 0L)
    }
  }

  test("DfUtils.profile: exact per-column nulls/distincts/min/max") {
    val d = df(Seq(
      Seq("a", 1, 2.5),
      Seq("b", null, 1.0),
      Seq("a", 3, null)), "k:str,v:int,x:double")
    val p = graft.api.DfUtils.profile(d).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("k") === Seq(3L, 0L, 2L, "a", "b"))
    assert(p("v") === Seq(3L, 1L, 2L, "1", "3"))
    assert(p("x")(0) === 3L && p("x")(1) === 1L && p("x")(2) === 2L)
  }
}
