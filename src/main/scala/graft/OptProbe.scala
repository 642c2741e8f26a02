package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness for the r16 optimization round — NOT part
  * of the conformance/bench surface. Times sub-stages of the heavy bench
  * queries and A/B-tests planner configs, with the noop sink (guide §1.4).
  * Delete or ignore after the round; nothing depends on it.
  */
object OptProbe {
  private def sess(extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private def clearState(s: SparkSession): Unit = {
    graft.functions.Dedup.clearSignatureCache()
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "d04"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode match {
      case "d04" => profileD04(dir)
      case "comapab" => coMapAB(dir)
      case "d04ab" => d04AB(dir)
      case "cteab" => cteAB(dir)
      case "hplan" =>
        val s = sess()
        for (q <- args.drop(1)) {
          val d = SparkEntry.queries(q)(s, dir)
          d.count()
          println(s"===== $q executed plan =====")
          println(d.queryExecution.executedPlan.toString.split("\n")
            .filter(l => l.contains("Exchange") || l.contains("Reused") ||
              l.contains("Scan parquet") || l.contains("HashAggregate") ||
              l.contains("Join")).mkString("\n"))
        }
        s.stop()
      case "hconf" => hConf(dir, args.drop(1))
      case "q24" => profileQ24(dir)
      case "head" => headline(dir, args.drop(1))
      case other => sys.error(s"unknown probe mode $other")
    }
  }

  /** Stage breakdown of d04_dedup_ngram at the bench scale. */
  private def profileD04(dir: String): Unit = {
    val s = sess()
    import graft.functions.Dedup
    val docs = s.read.parquet(s"$dir/documents.parquet")
    // warm JVM/codegen once
    time("warmup full d04")(SparkEntry.queries("d04_dedup_ngram")(s, dir).count())
    clearState(s)
    (1 to 2).foreach { i =>
      val sigs = time(s"r$i shingleStage (checkpoint)")(
        Dedup.shingleStage(docs, "doc_id", "text", 3))
      val inverted = sigs.select(col("id"), explode(col("sh")).as("s"))
      val dfs = time(s"r$i dfs agg + checkpoint")(
        inverted.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2).localCheckpoint(true))
      time(s"r$i probe first()")(
        dfs.select(sum(col("df").cast("double")).as("occ"),
          sum(col("df").cast("double") * col("df")).as("occ2")).first())
      val co = time(s"r$i cooccur join+agg (noop)") {
        val pruned = inverted.join(dfs.select(col("s")), "s")
        val l = pruned.select(col("s"), col("id").as("id_a"))
        val r = pruned.select(col("s"), col("id").as("id_b"))
        val c = l.join(r, "s").filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        noop(c); c
      }
      time(s"r$i full d04 (count)")(
        SparkEntry.queries("d04_dedup_ngram")(s, dir).count())
      clearState(s)
    }
    // d02 + d06 full timings for reference
    (1 to 2).foreach { i =>
      time(s"r$i full d02 (count)")(
        SparkEntry.queries("d02_dedup_minhash")(s, dir).count())
      clearState(s)
      time(s"r$i full d06 (count)")(
        SparkEntry.queries("d06_dedup_pipeline")(s, dir).count())
      clearState(s)
    }
    s.stop()
  }

  // pairab / ivfab: the candidate-pair generator A/B harnesses were
  // removed together with the SortedPairs experiment they measured (the
  // generator lost: wash on the banded shape at sf0.1 AND sf1, ~9x slower
  // on the few-large-buckets ivfCosinePairs shape — 162-194 s vs 18-22 s —
  // because AQE coalesces the tiny-in-bytes bucket frame to ~1 partition
  // and per-bucket generation cannot be split the way AQE skew-join
  // splitting divides the self-join's quadratic work). Numbers and the
  // full narrative live in OPTIMIZATION_r16.md, experiment A/A2.

  /** Upper-bound measurement for engine-side CTE materialization: h02 and
    * h20 as-written (multi-referenced CTE evaluated twice) vs the same
    * query with the CTE pre-materialized (localCheckpoint) and referenced
    * as a view. Results must be identical; only time differs. */
  private def cteAB(dir: String): Unit = {
    val s = sess()
    val eng = graft.engine.SparkGraftEngine(s)
    def tb(n: String) = s.read.parquet(s"$dir/$n.parquet")
    val h02tabs = Map("lineitem" -> tb("lineitem"), "part" -> tb("part"),
      "supplier" -> tb("supplier"), "nation" -> tb("nation"),
      "region" -> tb("region"))
    def asIs(): Long = eng.sqlSelect(TpchSuite.sql("h02"), h02tabs).count()
    def mat(): Long = {
      val ps = eng.sqlSelect(
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
        Map("lineitem" -> h02tabs("lineitem"))).localCheckpoint(true)
      val rest = TpchSuite.sql("h02").replaceFirst(
        "(?s)WITH ps AS \\(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem\\),",
        "WITH")
      val n = eng.sqlSelect(rest, h02tabs + ("ps" -> ps)).count()
      org.apache.spark.sql.graftshim.ColumnBridge.unpersistCheckpointed(ps)
      n
    }
    val a0 = asIs(); val b0 = mat()
    require(a0 == b0, s"row counts differ: $a0 vs $b0")
    (1 to 3).foreach { i =>
      time(s"r$i h02 as-written")(asIs())
      time(s"r$i h02 materialized-ps")(mat())
    }
    s.stop()
  }

  /** A/B the d04 auto-probe variants: V0 = current (eager dfs checkpoint +
    * probe over it + chain reusing the checkpoint); V1 = lazy dfs (probe as
    * one un-materialized aggregate; chain re-aggregates inline); V2 =
    * sampled probe (deterministic 1/8 of docs) + lazy chain. All three end
    * in the identical cooccur chain to the noop sink. */
  private def d04AB(dir: String): Unit = {
    val s = sess()
    import graft.functions.Dedup
    val docs = s.read.parquet(s"$dir/documents.parquet")
    def v0(): Unit = noop(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    def sigsF() = Dedup.shingleStage(docs, "doc_id", "text", 3)
    def v1(): Unit = {
      val sigs = sigsF()
      val inverted = sigs.select(col("id"), explode(col("sh")).as("s"))
      val r = inverted.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .select(sum(col("df").cast("double")).as("occ"),
          sum(col("df").cast("double") * col("df")).as("occ2")).first()
      val amp = if (r.isNullAt(0) || r.getDouble(0) == 0.0) 0.0
        else r.getDouble(1) / r.getDouble(0)
      require(amp <= 64.0, s"unexpected routing amp=$amp")
      noop(Dedup.ngramJaccardCooccur(sigs, 0.5, Int.MaxValue))
    }
    def v2(): Unit = {
      val sigs = sigsF()
      val sampled = sigs.filter(abs(xxhash64(col("id"))) % 8 === 0)
      val inverted = sampled.select(col("id"), explode(col("sh")).as("s"))
      val r = inverted.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .select(sum(col("df").cast("double")).as("occ"),
          sum(col("df").cast("double") * col("df")).as("occ2")).first()
      val amp = if (r.isNullAt(0) || r.getDouble(0) == 0.0) 0.0
        else 8.0 * r.getDouble(1) / r.getDouble(0) // de-bias for sampling
      println(f"PROBE v2 est amp $amp%.1f")
      noop(Dedup.ngramJaccardCooccur(sigs, 0.5, Int.MaxValue))
    }
    def clear(): Unit = clearState(s)
    v0(); clear(); v1(); clear(); v2(); clear() // warm all three
    (1 to 3).foreach { i =>
      time(s"r$i d04 V0 current")(v0()); clear()
      time(s"r$i d04 V1 lazy-probe")(v1()); clear()
      time(s"r$i d04 V2 sampled-probe")(v2()); clear()
    }
    s.stop()
  }

  /** A/B the q24 cogroup under closure-keyed groupByKey vs column-based
    * groupBy(...).as, interleaved in one warm JVM. */
  private def coMapAB(dir: String): Unit = {
    val s = sess()
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.types.StructType
    val o = s.read.parquet(s"$dir/orders.parquet").select("o_orderkey")
    val l = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"))
    val keys = Seq("o_orderkey")
    val outSchema = graft.schema.SchemaExpr.parse(
      "o_orderkey:long,n_orders:long,n_items:long")
    val keySchema = StructType(keys.map(k => o.schema(o.schema.fieldIndex(k))))
    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    def fn(k: Row, ls: Iterator[Row], rs: Iterator[Row]): Iterator[Row] =
      Iterator.single(Row(k.get(0), ls.size.toLong, rs.size.toLong))
    def viaClosure(): Unit = {
      val lg = o.groupByKey(r => Row.fromSeq(keys.map(k => r.getAs[Any](k))))(keyEnc)
      val rg = l.groupByKey(r => Row.fromSeq(keys.map(k => r.getAs[Any](k))))(keyEnc)
      noop(lg.cogroup(rg)((k, a, b) => fn(k, a, b))(outEnc))
    }
    def viaAs(): Unit = {
      val lg = o.groupBy(keys.map(col): _*).as(keyEnc, Encoders.row(o.schema))
      val rg = l.groupBy(keys.map(col): _*).as(keyEnc, Encoders.row(l.schema))
      noop(lg.cogroup(rg)((k, a, b) => fn(k, a, b))(outEnc))
    }
    viaClosure(); viaAs() // warm both
    (1 to 3).foreach { i =>
      time(s"r$i coMap CLOSURE")(viaClosure())
      time(s"r$i coMap GROUPBY.AS")(viaAs())
    }
    s.stop()
  }

  /** A/B h-suite under runtime planner-config variants, ALTERNATED within
    * one warm JVM so box noise hits both arms equally.
    * args: conf k=v pairs forming the B arm (A arm = session defaults). */
  private def hConf(dir: String, kvs: Array[String]): Unit = {
    val extra = kvs.map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val s = sess()
    println(s"PROBE B-arm confs: $extra")
    val hNames = TpchSuite.sql.keys.toSeq.sorted
    val defaults = extra.keys.map(k => k -> s.conf.getOption(k)).toMap
    def setB(): Unit = extra.foreach { case (k, v) => s.conf.set(k, v) }
    def setA(): Unit = defaults.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    def run(tag: String): (Double, Map[String, Double]) = {
      var tot = 0.0
      val per = hNames.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(s"${n}_tpch")(s, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        tot += dt
        n -> dt
      }.toMap
      println(f"PROBE $tag TOTAL $tot%.3f")
      (tot, per)
    }
    setA(); run("warmA")
    setB(); run("warmB")
    val results = (1 to 3).flatMap { i =>
      setA(); val a = run(s"A$i")
      setB(); val b = run(s"B$i")
      Seq(("A", a), ("B", b))
    }
    def minPer(arm: String): Map[String, Double] =
      results.filter(_._1 == arm).map(_._2._2)
        .reduce((x, y) => x.map { case (k, v) => k -> math.min(v, y(k)) })
    val mA = minPer("A"); val mB = minPer("B")
    println(f"PROBE MIN A TOTAL ${mA.values.sum}%.3f  B TOTAL ${mB.values.sum}%.3f")
    hNames.foreach { n =>
      println(f"PROBE MIN $n A ${mA(n)}%.3f B ${mB(n)}%.3f  ${(mB(n) / mA(n) - 1) * 100}%+.1f%%")
    }
    s.stop()
  }

  /** q24 comap timing at bench scale (count, like the bench). */
  private def profileQ24(dir: String): Unit = {
    val s = sess()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q24_comap")(s, dir).count()
      println(f"PROBE r$i q24 ${(System.nanoTime() - t0) / 1e9}%.3f s")
      clearState(s)
    }
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q23_transform")(s, dir).count()
      println(f"PROBE r$i q23 ${(System.nanoTime() - t0) / 1e9}%.3f s")
      clearState(s)
    }
    s.stop()
  }

  /** min-of-3 for a subset of headline queries under optional confs:
    * args: q1,q2,... [k=v ...] */
  private def headline(dir: String, rest: Array[String]): Unit = {
    val qs = rest.head.split(",").toSeq
    val extra = rest.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val s = sess(extra)
    println(s"PROBE confs: $extra")
    try SparkEntry.queries(qs.head)(s, dir).count() catch { case _: Throwable => () }
    clearState(s)
    qs.foreach { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(s, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      clearState(s)
      println(f"PROBE $q min ${times.min}%.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    s.stop()
  }
}
