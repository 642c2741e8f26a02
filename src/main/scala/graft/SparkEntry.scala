package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Driver contract: one query per implemented operator (SURVEY.md §2), each
 * with an equivalent DuckDB oracle where SQL-expressible. Queries run
 * through the graft engine/operator APIs — they are the conformance surface
 * of the library, not hand-written Spark one-offs.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped in two generations: ts as TIMESTAMP(NANOS)
   * (Spark's vectorized reader rejects it — read nanos-as-long via the
   * legacy conf and truncate to microseconds) and as plain timestamp[us]
   * (reads natively as TIMESTAMP_NTZ). Normalize BOTH to session-zone
   * TIMESTAMP at microsecond grain — the session zone is UTC, so the
   * NTZ cast is wall-clock identity, and the DuckDB oracle's
   * CAST(ts AS TIMESTAMP) is the same floor-to-us conversion. Works on
   * batch and streaming frames alike (schema-driven, no data peek). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(s, dir, "events"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def eng(s: SparkSession) = SparkGraftEngine(s)

  /** Drop a managed table AND its warehouse directory: a fresh session has
   * an empty catalog but the previous run's directory survives, and
   * saveAsTable refuses to reuse the location (LOCATION_ALREADY_EXISTS). */
  private def dropTableAndLocation(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(s"$wh/$name")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** decimal-exact sum rendered as double: deterministic across engines
   * regardless of aggregation order (FP sums are order-dependent; decimal
   * sums are not). */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  // customer with the key renamed to the orders key, so the engine's
  // "join on common column names" contract applies
  private def custK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ TpchSuite.sql.map { case (n, q) =>
      // TPC-H-adapted suite: the engine's SQL surface against DuckDB
      // running the identical text (dialect-intersection SQL; TpchSuite)
      s"${n}_tpch" -> ((s: SparkSession, dir: String) =>
        eng(s).sqlSelect(q,
          TpchSuite.tables(n).map(tb => tb -> t(s, dir, tb)).toMap))
    }

  private lazy val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregate / select / filter / assign -------------------------
    "q01_agg" -> ((s, dir) => {
      eng(s).aggregate(t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"), Seq(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")))
    }),
    "q02_filter" -> ((s, dir) => {
      eng(s).filter(t(s, dir, "lineitem"),
        col("l_shipdate") < lit("1995-01-01").cast(TimestampType) && col("l_quantity") > 30)
    }),
    "q03_select_having" -> ((s, dir) => {
      eng(s).select(t(s, dir, "lineitem"),
        Seq(col("l_returnflag"), dsum("l_quantity").as("sum_qty")),
        where = Some(col("l_shipdate") <= lit("1996-12-31").cast(TimestampType)),
        having = Some(col("sum_qty") > 1000.0))
    }),
    "q04_assign" -> ((s, dir) => {
      eng(s).assign(t(s, dir, "lineitem"), Map(
        "revenue" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        "l_returnflag" -> lower(col("l_returnflag"))))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "revenue")
    }),
    "q05_distinct" -> ((s, dir) => {
      eng(s).distinct(t(s, dir, "lineitem").select("l_returnflag", "l_linestatus"))
    }),

    // ---- joins (keys inferred from common column names) ---------------
    "q06_join_inner" -> ((s, dir) =>
      eng(s).join(t(s, dir, "orders"), custK(s, dir), "inner")),
    "q07_join_left" -> ((s, dir) =>
      eng(s).join(t(s, dir, "orders"),
        custK(s, dir).filter(col("c_acctbal") > 5000), "left_outer")),
    "q08_join_right" -> ((s, dir) =>
      eng(s).join(t(s, dir, "orders").filter(col("o_totalprice") > 200000),
        custK(s, dir), "right_outer")),
    "q09_join_full" -> ((s, dir) =>
      eng(s).join(t(s, dir, "orders").filter(col("o_totalprice") > 200000),
        custK(s, dir).filter(col("c_acctbal") > 5000), "full_outer")),
    "q10_join_semi" -> ((s, dir) =>
      eng(s).join(custK(s, dir), t(s, dir, "orders").select("o_custkey"), "semi")),
    "q11_join_anti" -> ((s, dir) =>
      eng(s).join(custK(s, dir), t(s, dir, "orders").select("o_custkey"), "anti")),
    "q12_join_cross" -> ((s, dir) =>
      eng(s).join(t(s, dir, "region"), t(s, dir, "nation"), "cross")),
    // 3-way fold: orders ⋈ customer ⋈ nation in one call
    "q45_join_multi" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      eng(s).join(Seq(t(s, dir, "orders"), custK(s, dir), nat), "inner")
    }),

    // persist (eager) feeding an aggregate — oracle-checked materialization
    "q46_persist" -> ((s, dir) => {
      val e = eng(s)
      val cached = e.persist(
        t(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        lazyPersist = false)
      val out = e.aggregate(cached, Seq("l_returnflag"),
        Seq(dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n")))
      out
    }),
    // explicit broadcast hint on the dimension side of a join
    "q47_broadcast" -> ((s, dir) => {
      val e = eng(s)
      e.join(t(s, dir, "orders"), e.broadcast(custK(s, dir)), "inner")
    }),

    // bucketed co-located join: write-side bucketing, shuffle-free read join
    "q48_bucketed_join" -> ((s, dir) => {
      val e = eng(s)
      dropTableAndLocation(s, "graft_q48_orders")
      dropTableAndLocation(s, "graft_q48_customer")
      graft.operators.Bucketing.saveBucketed(t(s, dir, "orders"),
        "graft_q48_orders", Seq("o_custkey"), 8)
      graft.operators.Bucketing.saveBucketed(custK(s, dir),
        "graft_q48_customer", Seq("o_custkey"), 8)
      e.join(e.loadTable("graft_q48_orders"),
        e.loadTable("graft_q48_customer"), "inner")
    }),
    // salted skew join must equal the plain join exactly
    "q49_skew_join" -> ((s, dir) =>
      graft.operators.SkewJoin.saltedJoin(t(s, dir, "orders"), custK(s, dir),
        Seq("o_custkey"), "inner", factor = 4)),

    // ---- set ops ------------------------------------------------------
    "q13_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      eng(s).union(
        c.filter(col("c_acctbal") > 3000).select("c_custkey", "c_mktsegment"),
        c.filter(col("c_acctbal") < 7000).select("c_custkey", "c_mktsegment"),
        distinct = true)
    }),
    "q14_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      eng(s).union(
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey", "c_acctbal"),
        c.filter(col("c_acctbal") > 8000).select("c_custkey", "c_acctbal"),
        distinct = false)
    }),
    "q15_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      eng(s).subtract(
        c.filter(col("c_acctbal") > 3000).select("c_custkey", "c_nationkey"),
        c.filter(col("c_acctbal") > 7000).select("c_custkey", "c_nationkey"),
        distinct = true)
    }),
    "q16_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      eng(s).intersect(
        c.filter(col("c_acctbal") > 3000).select("c_custkey", "c_nationkey"),
        c.filter(col("c_acctbal") < 7000).select("c_custkey", "c_nationkey"),
        distinct = true)
    }),

    // ---- null handling ------------------------------------------------
    "q17_dropna" -> ((s, dir) => {
      val e = withNulls(events(s, dir))
      eng(s).dropna(e, how = "any")
    }),
    "q18_fillna" -> ((s, dir) => {
      val e = withNulls(events(s, dir))
      eng(s).fillna(e, Map("etype" -> "unknown", "val" -> 0.0))
    }),

    // ---- sample / take ------------------------------------------------
    "q19_take_global" -> ((s, dir) =>
      eng(s).take(events(s, dir), 10,
        PartitionSpec(presort = Seq("ts" -> false, "event_id" -> true)))),
    "q20_take_per_key" -> ((s, dir) =>
      eng(s).take(events(s, dir), 3,
        PartitionSpec(by = Seq("user_id"),
          presort = Seq("ts" -> false, "event_id" -> true)))),
    "q21_sample" -> ((s, dir) =>
      eng(s).sample(events(s, dir), frac = Some(0.2), seed = Some(42L))),

    // ---- SQL passthrough ---------------------------------------------
    "q22_sql" -> ((s, dir) =>
      eng(s).sqlSelect(SqlRevenuePerNation, Map(
        "orders" -> t(s, dir, "orders"),
        "customer" -> t(s, dir, "customer"),
        "nation" -> t(s, dir, "nation")))),
    "q31_sql_window" -> ((s, dir) =>
      eng(s).sqlSelect(SqlTopOrders, Map("orders" -> t(s, dir, "orders")))),

    // ---- transform (per-logical-partition map) ------------------------
    "q23_transform" -> ((s, dir) => {
      val e = events(s, dir)
      val evIdx = e.schema.fieldIndex("event_id")
      val etIdx = e.schema.fieldIndex("event_type")
      Transform.mapPartitions(e,
        PartitionSpec(by = Seq("user_id"),
          presort = Seq("ts" -> true, "event_id" -> true)),
        graft.schema.SchemaExpr.parse(
          "user_id:long,n_events:long,first_event_id:long,last_event_type:str")) {
        (cursor, rows) =>
          var n = 0L
          var firstId = -1L
          var lastType: String = null
          rows.foreach { r =>
            if (n == 0) firstId = r.getLong(evIdx)
            lastType = r.getString(etIdx)
            n += 1
          }
          Iterator.single(Row(cursor.keyValues.head, n, firstId, lastType))
      }
    }),

    // ---- zip / comap (cogroup) ----------------------------------------
    "q24_comap" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey")
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"))
      Transform.coMap(o, l, Seq("o_orderkey"), "full_outer",
        graft.schema.SchemaExpr.parse("o_orderkey:long,n_orders:long,n_items:long")) {
        (k, ls, rs) => Iterator.single(Row(k.head, ls.size.toLong, rs.size.toLong))
      }
    }),

    // ---- schema ops ---------------------------------------------------
    "q25_alter" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.select(col("c_custkey").cast("int").as("c_custkey"),
        col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    }),
    "q26_rename_drop" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumnRenamed("l_returnflag", "flag")
        .drop("l_tax", "l_discount", "l_shipdate", "l_extendedprice",
          "l_partkey", "l_suppkey", "l_quantity", "l_linestatus")),

    // ---- IO round-trips -----------------------------------------------
    "q27_csv_roundtrip" -> ((s, dir) => {
      val tmp = s"/root/repo/target/tmp/csv_nation"
      val e = eng(s)
      e.save(t(s, dir, "nation"), tmp, format = "csv", singleFile = true,
        options = Map("header" -> "true"))
      e.load(tmp, format = "csv",
        columns = Seq("n_nationkey:int", "n_name:str", "n_regionkey:int"))
    }),
    "q28_json_roundtrip" -> ((s, dir) => {
      val tmp = s"/root/repo/target/tmp/json_region"
      val e = eng(s)
      e.save(t(s, dir, "region"), tmp, format = "json", singleFile = true)
      e.load(tmp, format = "json", columns = Seq("r_regionkey:int", "r_name:str"))
    }),
    "q58_orc_roundtrip" -> ((s, dir) => {
      // ORC preserves the parquet types exactly — no cast list needed
      val tmp = s"/root/repo/target/tmp/orc_supplier"
      val e = eng(s)
      e.save(t(s, dir, "supplier"), tmp, format = "orc")
      e.load(tmp, format = "orc")
    }),
    // deterministic-shuffle differential: the hash order must be a
    // permutation, identical across two independent invocations (pure
    // function of data+seed), and decorrelated from the id order
    "q57_shuffle_det" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val e = events(s, dir).select("event_id")
      def pos(d: DataFrame): DataFrame = {
        // zipWithIndex preserves the sorted order → global position
        val rdd = d.rdd.zipWithIndex().map { case (r, i) => Row(r.getLong(0), i) }
        s.createDataFrame(rdd, StructType(Seq(
          StructField("event_id", LongType), StructField("p", LongType))))
      }
      val p1 = pos(graft.functions.Sampling.deterministicShuffle(e, Seq("event_id"), 7L))
      val p2 = pos(graft.functions.Sampling.deterministicShuffle(e, Seq("event_id"), 7L))
        .withColumnRenamed("p", "p2")
      val pid = pos(e.orderBy("event_id")).withColumnRenamed("p", "pid")
      val n = e.count()
      val j = p1.join(p2, "event_id").join(pid, "event_id")
      val stats = j.agg(count(lit(1)).as("n"),
        sum(when(col("p") === col("p2"), 0L).otherwise(1L)).as("nondet"),
        avg(when(col("p") === col("pid"), 1.0).otherwise(0.0)).as("fixed_frac"))
      stats.select((col("n") === n && col("nondet") === 0L &&
        col("fixed_frac") < 0.1).cast("bigint").as("shuffle_ok"))
    }),
    // seeded-sample differential: per-engine RNGs differ (q21 stays
    // rows-only) but the LAWS of the sample are oracle-able — size within
    // ±5σ of Binomial(n, frac), subset of the source, deterministic per seed
    "q21x_sample_bounds" -> ((s, dir) => {
      val e = events(s, dir).select("event_id")
      val s1 = eng(s).sample(e, frac = Some(0.2), seed = Some(42L))
      val s2 = eng(s).sample(e, frac = Some(0.2), seed = Some(42L))
      val nTotal = e.count().toDouble
      val n1 = s1.count().toDouble
      val sigma = math.sqrt(nTotal * 0.2 * 0.8)
      val boundsOk = math.abs(n1 - 0.2 * nTotal) <= 5 * sigma
      val subsetOk = s1.join(e, Seq("event_id"), "left_anti").isEmpty
      val detOk = graft.api.DfUtils.dfEq(s1, s2)
      eng(s).toDF(Seq(Seq(
        if (boundsOk && subsetOk && detOk) 1L else 0L)), "sample_ok:long")
    }),

    // ---- repartitioning ----------------------------------------------
    "q29_repartition" -> ((s, dir) =>
      eng(s).repartition(t(s, dir, "lineitem"),
        PartitionSpec(algo = "hash", num = "8", by = Seq("l_orderkey"),
          presort = Seq("l_linenumber" -> true)))),
    "q30_even_repartition" -> ((s, dir) =>
      eng(s).repartition(events(s, dir),
        PartitionSpec(algo = "even", num = "16"))),
    // per_row PartitionSpec alias (partition.py:95,115-117): every row its
    // own logical partition (even ROWCOUNT repartition). The transform
    // proves the grain by emitting each partition's row count — the oracle
    // pins it to 1 for every row, so a mis-aliased spec hash-mismatches.
    "q88_per_row" -> ((s, dir) => {
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
      Transform.mapPartitions(n, PartitionSpec("per_row"),
        graft.schema.SchemaExpr.parse(
          "n_nationkey:long,n_name:str,rows_in_partition:long")) { (_, rows) =>
        val buf = rows.toArray
        buf.iterator.map(r => Row(r.getLong(0), r.getString(1), buf.length.toLong))
      }
    }),

    // Deequ-style declarative data-quality gate: 11 constraints compiled
    // into one aggregation pass; report rows (constraint, column, metric,
    // passed) are oracled value-for-value against DuckDB recomputing
    // every metric with the same decimal bridging / 9-digit rounding.
    "q89_quality_checks" -> ((s, dir) => {
      import graft.functions.Checks
      val o = t(s, dir, "orders")
      Checks.validate(o, Seq(
        Checks.rowCountBetween(1L, 1000000000L),
        Checks.notNull("o_orderkey"),
        Checks.unique("o_orderkey"),
        Checks.completeness("o_orderpriority", 0.95),
        Checks.minValue("o_totalprice", 0.0),
        Checks.maxValue("o_totalprice", 1000000.0),
        Checks.meanBetween("o_totalprice", 1000.0, 500000.0),
        Checks.inSet("o_orderstatus", Seq("F", "O", "P"), 1.0),
        Checks.matchesRegex("o_orderpriority", "^[1-5]-", 1.0),
        Checks.distinctCountBetween("o_orderstatus", 1L, 5L),
        Checks.satisfies(col("o_totalprice") > 1000.0, "totalprice_gt_1000", 0.5)))
    }),

    // Per-group z-score outlier gate, oracled row-for-row: decimal-
    // bridged mean/stddev at declared 9-digit precision, z at 6 digits —
    // every double the oracle recomputes is bit-identical.
    "q90_outliers" -> ((s, dir) => {
      import graft.functions.Outliers
      Outliers.zscoreOutliers(t(s, dir, "orders"), Seq("o_orderstatus"),
        "o_totalprice", threshold = 2.5)
        .select(col("o_orderkey"), col("o_orderstatus"), col("zscore"),
          col("is_outlier"))
    }),

    // Watermarked stream-stream interval join (click -> purchase within
    // 10 minutes), oracled against the equivalent batch join in DuckDB —
    // inner interval joins emit every match exactly once, so stream and
    // batch answers must coincide on bounded input.
    "q91_stream_stream_join" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = t(s, dir, "events").schema
      def src() = normalizeEventTs(graft.streaming.Streaming.loadStream(
        s, dir, schema, options = Map("pathGlobFilter" -> "events.parquet")))
      val clicks = src().filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val purchases = src().filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
      val joined = graft.streaming.Streaming.streamStreamJoin(
        clicks, purchases, Seq("user_id"), "click_ts", "purchase_ts",
        watermarkDelay = "1 minute", maxLag = "10 minutes")
        .select("user_id", "click_id", "purchase_id")
      val name = "graft_q91_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(joined, name)
      s.table(name)
    }),

    // Snapshot diff in hash-only mode (the 100 TB path: 8-byte content
    // hash through the full-outer join), oracled against DuckDB doing
    // the semantic FULL JOIN + IS DISTINCT FROM — the classifications
    // must coincide unless xxhash64 collides.
    "q92_snapshot_diff" -> ((s, dir) => {
      import graft.operators.Diff
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val after = o.filter(col("o_orderkey") % 100 =!= 0)
        .withColumn("o_totalprice",
          col("o_totalprice") +
            when(col("o_orderkey") % 7 === 0, 1.0).otherwise(0.0))
        .unionAll(o.filter(col("o_orderkey") % 500 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit(1.0).as("o_totalprice")))
      Diff.snapshotDiff(o, after, Seq("o_orderkey"), hashOnly = true)
    }),

    // Equi-width histogram (two bounded jobs: 2-double min/max probe +
    // bucket groupBy), oracled bucket-for-bucket including empty buckets
    "q94_histogram" -> ((s, dir) =>
      graft.functions.Stats.histogram(t(s, dir, "orders"), "o_totalprice", 20)),
    // Single-pass pairwise Pearson matrix (decimal-bridged sums, declared
    // 9-digit precision) — all 6 pairs from one corpus scan
    "q95_correlation" -> ((s, dir) =>
      graft.functions.Stats.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // training-shard export differential: manifest-verified round trip,
    // row conservation, deterministic re-export, content identity
    "q98_export_shards" -> ((s, dir) => {
      import graft.operators.Layout
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val out = java.nio.file.Files.createTempDirectory("graft_q98").toString
      try {
        val m1 = Layout.exportShards(o, s"$out/a", nShards = 16,
          keyCols = Seq("o_orderkey"))
        val m2 = Layout.exportShards(o, s"$out/b", nShards = 16,
          keyCols = Seq("o_orderkey"))
        val verifyOk = Layout.verifyShards(s, s"$out/a").isEmpty
        val rowsOk = m1.map(_._2).sum == o.count()
        val detOk = m1 == m2
        val contentOk = graft.api.DfUtils.dfEq(
          s.read.parquet(s"$out/a").drop("__shard"), o)
        eng(s).toDF(Seq(Seq(if (verifyOk) 1L else 0L, if (rowsOk) 1L else 0L,
          if (detOk) 1L else 0L, if (contentOk) 1L else 0L)),
          "verify_ok:long,rows_ok:long,det_ok:long,content_ok:long")
      } finally {
        // repeated gate runs must not accumulate orders-sized /tmp garbage
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
      }
    }),

    // WebDataset-style tar shard export (the multimodal training-export
    // container): samples shard by key hash, write as <key>.<ext> tar
    // entries (null field → no entry), manifest + verify + byte-determinism
    // + full content round trip through loadTarShards. FULL oracle on the
    // counts (recomputed by DuckDB from the same null rule) and verdict
    // flags
    // real ISO-BMFF (MP4) demux, FULL oracle: synthetic one-track MP4s
    // whose stbl tables are pure functions of doc_id; DuckDB recomputes
    // every sample's offset (cum-sum of sizes + 4-byte inter-chunk pads
    // resolved via stco), size, sync flag, duration run, and dims from
    // first principles. head/tail probe bytes prove the EXTRACTION reads
    // the true stco-resolved ranges (a naive size cum-sum that ignores
    // chunk padding reads shifted bytes and fails the probes).
    "m13_mp4_demux" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticMp4s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("keyframe"), col("dur_ticks"), col("width"), col("height"),
          expr("cast(conv(hex(substring(frame_bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    // get_current_parallelism under the ORACLE (was spec-only): the probe
    // itself is environment-dependent (cores), so the checked facts are
    // its LAWS — positive, stable across calls, and honored by the
    // CONCURRENCY partition-count expression (reference
    // execution_engine.py get_current_parallelism + partition.py's
    // ROWCOUNT/CONCURRENCY num expressions)
    "q119_parallelism" -> ((s, dir) => {
      val e = eng(s)
      val p1 = e.getCurrentParallelism
      val p2 = e.getCurrentParallelism
      val conc = e.repartition(t(s, dir, "orders"),
        graft.PartitionSpec(algo = "hash", num = "CONCURRENCY"))
        .rdd.getNumPartitions
      e.toDF(Seq(Seq(
        if (p1 > 0 && p1 == p2 && conc == p1) 1L else 0L)),
        "parallelism_ok:long")
    }),

    // callbacks/RPC surface under the ORACLE (was spec-only): executor-
    // side transformers post one message per logical group over the
    // CollectionAccumulator channel, and the query's RESULT is built from
    // the drained channel — so the driver gate checks the whole
    // worker→driver path (post → accumulate → drain → parse) against the
    // plain GROUP BY oracle. distinct absorbs task-retry duplicate posts
    // (message content is deterministic per group). Scale note: posts are
    // per GROUP (bounded by key cardinality), never per row — the RPC
    // discipline that keeps the channel O(keys) at 100 TB.
    "q118_callback_census" -> ((s, dir) => {
      val ch = graft.transform.CallbackChannel(s)
      val src = t(s, dir, "orders")
        .select((col("o_custkey") % 50).as("k"), col("o_orderkey"))
      val spec = graft.PartitionSpec(by = Seq("k"))
      val out = graft.transform.Transform.mapPartitions(src, spec,
        graft.schema.SchemaExpr.parse("k:long,n:long")) { (cursor, rows) =>
        val n = rows.size.toLong
        val k = cursor.keyValues.head.asInstanceOf[Long]
        ch.post("census", s"$k:$n")
        Iterator(org.apache.spark.sql.Row(k, n))
      }
      out.foreach(_ => ()) // drive the action; posts land on completion
      val msgs = ch.messages("census").distinct.map { m =>
        val Array(k, n) = m.split(":")
        Seq[Any](k.toLong, n.toLong)
      }
      eng(s).toDF(msgs, "k:long,n:long")
    }),

    // the same census through the DISTRIBUTED RPC channel (the
    // reference's Flask-server surface): a driver-hosted HTTP endpoint
    // executors post to mid-task — immediate delivery, unlike the
    // accumulator channel's task-completion granularity; dedup by
    // message (Spark may re-run tasks), census checked by the q118
    // oracle
    "q118b_http_callback" -> ((s, dir) => {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      // bind to the driver host so executors on OTHER machines reach the
      // endpoint too (falls back to loopback for bare local runs)
      val srv = graft.transform.HttpCallbacks.start(
        host = s.conf.getOption("spark.driver.host")
          .getOrElse("127.0.0.1")) { (topic, msg) =>
        if (topic == "census") seen.add(msg)
      }
      try {
        val ch = srv.channel
        val src = t(s, dir, "orders")
          .select((col("o_custkey") % 50).as("k"), col("o_orderkey"))
        val spec = graft.PartitionSpec(by = Seq("k"))
        val out = graft.transform.Transform.mapPartitions(src, spec,
          graft.schema.SchemaExpr.parse("k:long,n:long")) { (cursor, rows) =>
          val n = rows.size.toLong
          val k = cursor.keyValues.head.asInstanceOf[Long]
          ch.post("census", s"$k:$n")
          Iterator(org.apache.spark.sql.Row(k, n))
        }
        out.foreach(_ => ()) // drive the action; posts arrive mid-task
        import scala.jdk.CollectionConverters._
        val msgs = seen.asScala.toSeq.map { m =>
          val Array(k, n) = m.split(":")
          Seq[Any](k.toLong, n.toLong)
        }
        eng(s).toDF(msgs, "k:long,n:long")
      } finally srv.stop()
    }),

    // mixed-media-lake census: magic-byte type sniffing over a column
    // that interleaves all nine payload families (PNG/GIF/progressive
    // MP4/fragmented MP4/MP3/WAV/Ogg/FLAC/plain text) — the "what is
    // actually in this bucket" pass a 100 TB binary column gets before
    // any decode fan-out. Narrow map, O(1) header reads; exact oracle
    "m17_media_census" -> ((s, dir) => {
      import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
      val ids = t(s, dir, "documents").select("doc_id")
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val mixed = ids.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = (id % 9) match {
            case 0 => graft.functions.Multimodal.syntheticPng(16, 8, id)
            case 1 => graft.functions.Multimodal.syntheticGif(8, 8, 3, id)
            case 2 => graft.functions.Mp4.syntheticMp4(id)
            case 3 => graft.functions.Mp4.syntheticFmp4(id)
            case 4 => graft.functions.Mp3.syntheticMp3(id)
            case 5 => graft.functions.Multimodal.syntheticWav(8000, 1, 64, id)
            case 6 => graft.functions.Ogg.syntheticOgg(id)
            case 7 => graft.functions.Flac.syntheticFlac(id)
            case _ => s"plain text payload $id".getBytes("UTF-8")
          }
          org.apache.spark.sql.Row(id, payload)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      graft.functions.Multimodal.mediaCensus(mixed, "doc_id", "payload")
        .select("doc_id", "media_type")
    }),

    // MPEG-audio frame walk conformance (the audio analog of m13): every
    // frame's offset/size/VBR-bitrate resolved from the headers alone;
    // the oracle recomputes the full frame arithmetic — per-version
    // bitrate table, padding bits, ID3v2 skip — and byte probes into the
    // frame DATA catch CBR assumptions and padding slips
    "m16_mp3_frames" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp3.mp3Frames(
        graft.functions.Mp3.syntheticMp3s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("bitrate_kbps"), col("hz"), col("n_samples"),
          expr("cast(conv(hex(substring(frame_bytes, 5, 1)), 16, 10) as int)")
            .as("data_head"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("data_tail"))
    }),

    // Ogg page-walk conformance (the container analog of m13/m16 for the
    // Vorbis/Opus share of an audio corpus): every page's offset, header
    // and body length, granule, serial, flags and completed-packet count
    // resolved from headers alone with the REAL page CRC verified; the
    // oracle recomputes the full lacing arithmetic — including packets
    // that span the 255-lacing boundary — and byte probes into the page
    // BODY catch any walk slip
    "m18_ogg_pages" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPages(
        graft.functions.Ogg.syntheticOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("page_no"), col("offset"),
          col("header_bytes"), col("body_bytes"), col("granule"),
          col("serial"), col("bos"), col("eos"), col("n_packets"),
          expr("cast(conv(hex(substring(body, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(body, cast(body_bytes as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    // Ogg PACKET reassembly conformance: logical packets rebuilt from the
    // lacing tables across page boundaries (every non-final fixture page
    // opens a packet of one or TWO 255 lacings the next page closes under
    // the continued flag — the sweep includes ≥3-segment >510-byte
    // packets and exact-510 packets ended by a terminating 0 lacing) —
    // sizes, page spans and completion order recomputed by the oracle
    // from the chained closed form, with head/tail probes into the
    // REASSEMBLED bytes spanning the page seam
    "m19_ogg_packets" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPackets(
        graft.functions.Ogg.syntheticChainedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("packet_no"), col("serial"), col("size"),
          col("n_pages"), col("end_page"),
          expr("cast(conv(hex(substring(bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    // MULTIPLEXED Ogg reassembly conformance: two serials whose pages
    // strictly interleave in file order while BOTH streams hold a packet
    // open across their page seams — per-serial partial tracking is the
    // thing under test (a shared or file-ordered buffer concatenates
    // bytes across streams); sizes, page spans, completion order and
    // seam-spanning byte probes recomputed from the muxed closed form
    "m23_ogg_muxed" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPackets(
        graft.functions.Ogg.syntheticMuxedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("packet_no"), col("serial"), col("size"),
          col("n_pages"), col("end_page"),
          expr("cast(conv(hex(substring(bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    // FLAC STREAMINFO decode: rate/channels/bits/total-samples (and the
    // derived duration) from the mandatory first metadata block, with a
    // VORBIS_COMMENT block to stride over — the lossless-audio member of
    // the typed-metadata family; bit-packed-field oracle
    "m22_flac_info" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Flac.flacInfo(
        graft.functions.Flac.syntheticFlacs(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // ID3v2 text-frame extraction (title/artist/album/track) across tag
    // versions (v2.4 synchsafe / v2.3 plain / v2.2 24-bit frame sizes),
    // the three common text encodings, tag-level UNSYNCHRONISATION on
    // odd v2.2/v2.3 ids (real 0xff 0x00 stuffing through the UTF-16
    // BOMs), and a non-text PRIV/CNT frame to stride over — the
    // tag-metadata side of an audio corpus; exact string oracle
    "m21_id3_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp3.id3TextFrames(
        graft.functions.Mp3.syntheticTaggedMp3s(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // VorbisComment / OpusTags extraction (Vorbis I §5 / RFC 7845 §5.2):
    // the tag-metadata side of Ogg audio — vendor + KEY=value comments
    // decoded from the reassembled SECOND packet (the fixture's PAD
    // comment pushes it across a 255-lacing chain), the exact
    // counterpart of m21's ID3 walk; the oracle replays the comment
    // formulas, with the magic/framing variation the engine's to erase
    "m24_ogg_comments" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggComments(
        graft.functions.Ogg.syntheticCommentedOggs(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // FLAC VORBIS_COMMENT extraction: the identical vendor + KEY=value
    // structure Ogg carries (m24), embedded raw inside a FLAC metadata
    // block — no magic, no framing bit — decoded by the SAME body
    // decoder; multi-block fixtures (PADDING before / APPLICATION after
    // on rotating ids) exercise the walk on both sides of the tag, and
    // id%5==4 files are tagless (absence, not corruption); exact string
    // oracle incl. a multi-byte-UTF-8 DESCRIPTION
    "m25_flac_comments" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Flac.flacComments(
        graft.functions.Flac.syntheticCommentedFlacs(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // iTunes-style MP4 tag extraction (moov/udta/meta/ilst): ©-prefixed
    // 4cc keys with UTF-8 data atoms, binary trkn/covr atoms strided,
    // hdlr inside the meta FullBox strided, id%5==2 files tagless —
    // the MP4 analog of m21's ID3 walk; exact string oracle incl. the
    // 0xA9 key prefix and a multi-byte-UTF-8 comment
    "m26_mp4_tags" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.ilstTags(
        graft.functions.Mp4.syntheticTaggedMp4s(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // RFC 3533 CHAINED bitstream (EOS→BOS reuse of one serial): the page
    // census must walk cleanly across the seam where per-link sequence
    // numbers restart at 0 — a walker that counts sequence numbers across
    // links (or rejects the restart) drops every chained .ogg; the
    // oracle replays both links' page arithmetic with byte probes
    "m27_ogg_chained" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggPages(
        graft.functions.Ogg.syntheticLinkedOggs(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("page_no"), col("offset"),
          col("header_bytes"), col("body_bytes"), col("granule"),
          col("serial"), col("bos"), col("eos"), col("n_packets"),
          expr("cast(conv(hex(substring(body, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(body, cast(body_bytes as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    // typed audio metadata from the Ogg identification header (RFC 7845
    // OpusHead / Vorbis I id header): codec, channels, sample rate,
    // pre-skip decoded from the reassembled FIRST packet — the audio
    // analog of the MP4 dims; the oracle replays the header formulas
    "m20_audio_meta" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Ogg.oggAudioMeta(
        graft.functions.Ogg.syntheticAudioOggs(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // STREAMING media demux: the m13 box walk running unchanged inside a
    // Structured Streaming query (mapPartitions is stateless-narrow, so
    // the demux composes with readStream exactly like the q61 curation
    // ops) — per-sample rows append to the sink, the per-doc census is
    // computed over the materialized table and checked against the
    // fixture's closed form. At 100 TB this is the shape of a continuous
    // video-ingest pipeline: demux at ingest, decode fan-out downstream.
    "m15_stream_demux" -> ((s, dir) => {
      val batchSchema = t(s, dir, "documents").schema
      val stream = graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "documents.parquet"))
        .select(col("doc_id"))
      val frames = graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticMp4s(stream, "doc_id"),
        "doc_id", "payload")
        .select("doc_id", "frame_no", "size", "keyframe", "dur_ticks",
          "width", "height")
      val name = "graft_m15_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(frames, name,
        outputMode = "append")
      s.table(name).groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_frames"),
        sum("keyframe").cast("long").as("n_sync"),
        sum("size").cast("long").as("total_bytes"),
        sum("dur_ticks").cast("long").as("dur_total"),
        max("width").cast("int").as("width"),
        max("height").cast("int").as("height"))
    }),

    // fragmented-MP4 (DASH/CMAF moof/tfhd/trun) demux conformance: the
    // oracle recomputes every sample's offset from the fixture's closed
    // form — explicit vs moof-relative base offsets, tfhd vs trex
    // defaults, per-sample trun rows with composition-offset stride —
    // plus head/tail byte probes that catch any resolution slip
    "m14_fmp4_demux" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mp4.demuxMp4Frames(
        graft.functions.Mp4.syntheticFmp4s(ids, "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("frame_no"), col("offset"), col("size"),
          col("keyframe"), col("dur_ticks"), col("width"), col("height"),
          expr("cast(conv(hex(substring(frame_bytes, 1, 1)), 16, 10) as int)")
            .as("head_byte"),
          expr("cast(conv(hex(substring(frame_bytes, cast(size as int), 1)), 16, 10) as int)")
            .as("tail_byte"))
    }),

    "m12_tar_shards" -> ((s, dir) => {
      import graft.operators.Layout
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"),
        when(col("doc_id") % 7 =!= 0, encode(col("text"), "UTF-8"))
          .as("img"))
      val out = java.nio.file.Files.createTempDirectory("graft_m12").toString
      try {
        val m1 = Layout.exportTarShards(docs, s"$out/a", "doc_id",
          Seq("text" -> "txt", "img" -> "bin"), nShards = 8)
        val m2 = Layout.exportTarShards(docs, s"$out/b", "doc_id",
          Seq("text" -> "txt", "img" -> "bin"), nShards = 8)
        val verifyOk = Layout.verifyTarShards(s, s"$out/a").isEmpty
        val back = Layout.loadTarShards(s, s"$out/a")
        val txtBack = back.filter(col("ext") === "txt")
          .select(col("key").cast("long").as("doc_id"),
            decode(col("content"), "UTF-8").as("text"))
        val roundtripOk = graft.api.DfUtils.dfEq(
          txtBack, docs.select("doc_id", "text"))
        eng(s).toDF(Seq(Seq(m1.map(_._2).sum, m1.map(_._3).sum,
          if (verifyOk) 1L else 0L, if (roundtripOk) 1L else 0L,
          if (m1 == m2) 1L else 0L)),
          "n_samples:long,n_entries:long,verify_ok:long,roundtrip_ok:long,det_ok:long")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse.foreach(p => p.toFile.delete())
      }
    }),

    // budget-bounded selection, FULL oracle: quality-ranked prefix whose
    // running token total fits the budget — a plain SQL window on the
    // DuckDB side, the distributed prefix sum (range sort + per-partition
    // offsets, never a single-partition window) on ours. The synthetic
    // score is a Knuth-hash of doc_id: deterministic, integer-exact in
    // both engines, and uncorrelated with n_chars
    "t34_budget_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          ((col("doc_id") * lit(2654435761L)) % 1000).as("score"))
      graft.functions.Sampling.selectByBudget(docs, col("n_chars"), "score",
        Seq("doc_id"), budget = 100000L)
    }),

    // corpus-overlap estimation: exact distinct/union/intersection counts
    // (FULL oracle) alongside an est_ok flag pinning the HLL
    // inclusion–exclusion estimates to the exact values within the lgK=12
    // error envelope (3×RSE ≈ 5%; the derived intersection within 5% of
    // the union, since its error compounds three sketches)
    "q99_corpus_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 3 =!= 0).select("text")
      val b = docs.filter(col("doc_id") % 2 =!= 0).select("text")
      val est = Sketches.overlapEstimate(a, b, "text").collect()(0)
      val na = a.distinct().count()
      val nb = b.distinct().count()
      val nu = a.union(b).distinct().count()
      val ni = a.intersect(b).count()
      def ok(got: Long, want: Long, tol: Long): Boolean =
        math.abs(got - want) <= math.max(2L, (tol * 0.05).toLong)
      val estOk = ok(est.getLong(0), na, na) && ok(est.getLong(1), nb, nb) &&
        ok(est.getLong(2), nu, nu) && ok(est.getLong(3), ni, nu)
      eng(s).toDF(Seq(Seq(na, nb, nu, ni, if (estOk) 1L else 0L)),
        "n_a:long,n_b:long,n_union:long,n_inter:long,est_ok:long")
    }),

    // distribution drift between snapshots, FULL oracle: PSI buckets from
    // the before-side range, both proportions eps-floored, psi at the
    // declared 9-decimal precision (integer inputs → the bucket
    // arithmetic is identical IEEE on both engines)
    "q100_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.functions.Stats.populationStability(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "n_chars", bins = 10)
    }),

    // categorical drift, FULL oracle: per-category PSI over the union of
    // both snapshots' category sets, nulls a real category — proportions
    // eps-floored, psi at the declared 9-decimal precision
    "q102_cat_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.functions.Stats.categoricalDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "lang")
    }),

    // BM25 corpus retrieval, FULL oracle: every 23rd document's first 4
    // tokens as the query set, Okapi BM25 (Lucene +1 idf) top-10 per
    // query — per-token contributions rounded to the declared 9-decimal
    // precision BEFORE the exact decimal sum (the t13 transcendental
    // policy), rank ties broken by doc id on both engines
    "t35_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(split(trim(lower(col("text"))), "\\s+"), 1, 4)).as("qtext"))
      TextFunctions.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", topK = 10, scoreDigits = Some(9))
    }),

    // directional n-gram containment join (quote/excerpt detection),
    // FULL oracle: |A ∩ B|/|A| over distinct trigram shingles — the
    // asymmetric complement of d04's symmetric Jaccard, same
    // inverted-index machinery, DuckDB recomputes with string list ops
    "d17_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)),

    // time-series gap fill with linear interpolation, FULL oracle: events
    // averaged onto a 30-min grid per event type (decimal-bridged mean),
    // missing buckets synthesized between each group's first and last
    // observation and interpolated between nearest observed neighbors —
    // identical IEEE scalar arithmetic on both engines
    "q103_gap_fill" -> ((s, dir) =>
      graft.operators.TemporalOps.gapFill(events(s, dir), "ts", "value",
        1800L, Seq("event_type"), method = "linear")),

    // interpolated trigram-LM cross-entropy (Jelinek–Mercer over
    // self-trained trigram/bigram/Laplace-unigram models), FULL oracle:
    // per-position log-probs at the declared 9-decimal precision, decimal
    // bridged sums; lambda1 = 1 − λ3 − λ2 computed in DOUBLE arithmetic
    // on both engines (a decimal-literal 0.1 would diverge in the ulps)
    "t36_trigram_ce" -> ((s, dir) =>
      TextFunctions.trigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text")),

    // link-graph centrality differential: distributed PageRank over a
    // deterministic synthetic domain graph vs a dense driver-side power
    // iteration with identical semantics (multigraph contributions,
    // uniform dangling redistribution); plus conservation (Σrank = 1)
    "q101_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select((col("doc_id") % 53).as("src"),
        ((col("doc_id") * 7 + 11) % 53).as("dst"))
      val got = graft.operators.Graph.pageRank(edges, "src", "dst",
        iterations = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the dense reference is the SHARED Graph.densePageRank — one
      // model pinned by both this gate and GraphSpec, so they cannot
      // drift apart semantically
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = graft.operators.Graph.densePageRank(es, iterations = 8)
      val agree = want.forall { case (v, r) => math.abs(got(v) - r) < 1e-10 }
      val conserved = math.abs(got.values.sum - 1.0) < 1e-9
      eng(s).toDF(Seq(Seq(want.size.toLong,
        if (agree && conserved) 1L else 0L)), "n_nodes:long,pr_ok:long")
    }),

    // synchronous label-propagation communities: distributed ≡ the SHARED
    // dense driver reference (deterministic tie order, undirected votes),
    // plus a component-isolation law — labels never leak between the two
    // edge-disjoint planted sides
    "q104_label_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // two planted communities (0..25, 26..51) + sparse random edges
      // WITHIN each side from the doc table — no cross edges
      val half = docs.select((col("doc_id") % 26).as("src"),
        ((col("doc_id") * 5 + 7) % 26).as("dst"))
      val edges = half.union(
        half.select((col("src") + 26).as("src"), (col("dst") + 26).as("dst")))
      val got = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        iterations = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = graft.operators.Graph.denseLabelPropagation(es, iterations = 6)
      val agree = want.forall { case (v, l) => got(v) == l }
      val sidesDisjoint = got.filter(_._1 < 26).values.toSet
        .intersect(got.filter(_._1 >= 26).values.toSet).isEmpty
      eng(s).toDF(Seq(Seq(want.size.toLong,
        if (agree && sidesDisjoint) 1L else 0L)), "n_nodes:long,lpa_ok:long")
    }),

    // per-node degree statistics (crawl-graph audit), FULL oracle: out/in
    // edge counts + distinct-neighbor counts recomputed by DuckDB over
    // the identical synthetic multigraph
    "q105_degree_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select((col("doc_id") % 53).as("src"),
        ((col("doc_id") * 7 + 11) % 53).as("dst"))
      graft.operators.Graph.degreeStats(edges, "src", "dst")
    }),

    // local clustering coefficient, FULL oracle: triangles normalized by
    // simple-graph neighbor pairs — DuckDB recomputes wedge counts,
    // distinct degrees, and the exact 2T/k(k−1) division
    "q114_clustering_coeff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select((col("doc_id") % 53).as("src"),
        ((col("doc_id") * 7 + 11) % 53).as("dst"))
      graft.operators.Graph.clusteringCoefficient(edges, "src", "dst")
    }),

    // personalized PageRank differential: distributed ≡ the SHARED dense
    // reference (teleport + dangling mass to the seed distribution) at
    // 1e-10, Σrank = 1, and non-seed-reachable mass stays 0
    "q113_ppr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select((col("doc_id") % 53).as("src"),
        ((col("doc_id") * 7 + 11) % 53).as("dst"))
      val seeds = eng(s).toDF(Seq(Seq(0L), Seq(1L), Seq(2L), Seq(999L)),
        "node:long") // 999 absent from the graph → ignored
      val got = graft.operators.Graph.personalizedPageRank(
        edges, "src", "dst", seeds, iterations = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = graft.operators.Graph.densePersonalizedPageRank(
        es, Set(0L, 1L, 2L, 999L), iterations = 8)
      val agree = want.forall { case (v, r) => math.abs(got(v) - r) < 1e-10 }
      val conserved = math.abs(got.values.sum - 1.0) < 1e-9
      eng(s).toDF(Seq(Seq(want.size.toLong,
        if (agree && conserved) 1L else 0L)), "n_nodes:long,ppr_ok:long")
    }),

    // exact per-node triangle counts (undirected simple graph), FULL
    // oracle: DuckDB replays the identical ordered-wedge joins over the
    // same synthetic 53-node multigraph (parallel edges/self-loops
    // dropped on both engines)
    "q112_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select((col("doc_id") % 53).as("src"),
        ((col("doc_id") * 7 + 11) % 53).as("dst"))
      graft.operators.Graph.triangleCount(edges, "src", "dst")
    }),

    // key-skew diagnostic over a deliberately skewed key (clerk id mod 11
    // gives 11 heavy buckets on top of the per-clerk spread), FULL
    // oracle: top-10 heavy keys + distribution summary, ties broken by
    // rendered key, frac/skew as single exact-long divisions
    "q116_key_skew" -> ((s, dir) =>
      graft.api.DfUtils.keySkew(
        t(s, dir, "orders").select(
          when(col("o_custkey") % 4 === 0, lit(0L))
            .otherwise(col("o_custkey") % 11).as("bucket")),
        Seq("bucket"), topK = 10)),

    // odd column names end-to-end through the DIALECT (reference
    // fugue_test/builtin_suite.py:1743 test_any_column_name): frames with
    // `a b`, ` ` (single space), a reserved word and a unicode name flow
    // through SELECT-join, TRANSFORM (custom transformer appending
    // `c *`), alias/rename, parquet SAVE, and projected LOAD — names with
    // spaces/stars/keywords must survive every hop including the parquet
    // round trip (Spark dropped its parquet field-name restrictions in
    // 3.3, so nothing re-mangles them)
    "q117_odd_columns" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField}
      val n = t(s, dir, "nation")
      val df1 = n.select(col("n_nationkey").cast("long").as("a b"),
        col("n_regionkey").cast("long").as(" "))
      val df2 = n.filter(col("n_nationkey") % 2 === 0).select(
        col("n_nationkey").cast("long").as("a b"),
        (col("n_regionkey") + 10).cast("long").as("d"),
        lower(col("n_name")).as("select"),
        col("n_name").as("naçãö"))
      val addC = graft.sql.GraftSql.TransformerDef(
        outputSchema = (in, _) =>
          org.apache.spark.sql.types.StructType(
            in.fields :+ StructField("c *", LongType)),
        fn = (_, rows, _) => rows.map(r =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ 2L)))
      val tmp = "/root/repo/target/tmp/q117_odd"
      graft.sql.GraftSql.runWith(eng(s),
        s"""j = SELECT df1.`a b`, df1.` `, df2.d, df2.`select`, df2.`naçãö` FROM df1 INNER JOIN df2 ON df1.`a b` = df2.`a b`
           |t = TRANSFORM j USING add_c
           |a = SELECT `a b` AS `a b `, ` ` AS `x y`, d, `select`, `naçãö`, `c *` FROM t
           |SAVE a OVERWRITE PARQUET "$tmp"
           |out = LOAD PARQUET "$tmp" COLUMNS `x y`, d, `select`, `naçãö`, `c *`
           |YIELD out AS out
           |""".stripMargin,
        inputs = Map("df1" -> df1, "df2" -> df2),
        extensions = graft.sql.GraftSql.Extensions(
          transformers = Map("add_c" -> addC))).yields("out")
    }),

    // distributed connected components (hash-min + pointer jump) over a
    // deterministic block-local graph (every edge stays inside its
    // 10-node block → ≥30 separate components at any sf), FULL oracle:
    // DuckDB recomputes min-reachable-id labels with a recursive CTE
    "q115_connected_components" -> ((s, dir) => {
      val base = col("doc_id") % 300
      val edges = t(s, dir, "documents").select(base.as("src"),
        (base - (base % 10) + ((col("doc_id") * 7 + 3) % 10)).as("dst"))
      graft.operators.Graph.connectedComponents(edges, "src", "dst")
        .select(col("node").cast("long").as("node"),
          col("comp").cast("long").as("comp"))
    }),

    // ordered-funnel analysis (signup → view → purchase within a day),
    // FULL oracle: per-user first-attempt step timestamps + completion
    // depth; DuckDB replays the identical conditional-min chain
    "q110_funnel" -> ((s, dir) =>
      graft.operators.TemporalOps.funnel(events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "purchase"), 86400L)),

    // windowed-re-entry funnel (restart = true): every distinct signup
    // timestamp anchors an attempt, best attempt (most steps, earliest
    // anchor) wins. FULL oracle: DuckDB replays the per-anchor chain and
    // the same row_number pick; the 1 h window (vs q110's 24 h) makes
    // first attempts fail often enough that re-entry actually changes
    // user verdicts
    "q110b_funnel_restart" -> ((s, dir) =>
      graft.operators.TemporalOps.funnel(events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "purchase"), 3600L,
        restart = true)),

    // weekly cohort retention, FULL oracle: cohort = first-activity week,
    // per-offset active fractions — exact integer bucket arithmetic and
    // one double division on both engines
    "q111_retention" -> ((s, dir) =>
      graft.operators.TemporalOps.retention(events(s, dir), "user_id",
        "ts", 604800L)),

    // Spearman rank correlation, FULL oracle: exact average ranks (the
    // distributed prefix sum over distinct-value counts) → the q95
    // Pearson machinery; l_quantity's 50 integer levels exercise the
    // tie-averaging path hard; DuckDB recomputes via rank windows
    "q109_spearman" -> ((s, dir) =>
      graft.functions.Stats.spearmanMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // per-key interval union (coalesce overlapping/touching intervals),
    // FULL oracle: each event spawns a 30-min window per user; DuckDB
    // replays the identical sweep (running-max-end window + flag prefix
    // sum) — exact integer epoch arithmetic on both engines
    "q106_merge_intervals" -> ((s, dir) => {
      val iv = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("start_s"),
        (unix_timestamp(col("ts")) + 1800).as("end_s"))
      graft.operators.TemporalOps.mergeIntervals(
        iv, Seq("user_id"), "start_s", "end_s")
    }),

    // rank/quantile normalization on the distributed prefix sum, FULL
    // oracle: (rank − 0.5)/n Hazen positions over (n_chars, doc_id) —
    // DuckDB's row_number window recomputes the identical quantiles
    "q107_rank_normalize" -> ((s, dir) =>
      graft.functions.Sampling.rankNormalize(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", Seq("doc_id"))),

    // two-sample KS drift over bucketed CDFs, FULL oracle: combined-range
    // equi-width grid, exact cumulative counts, sup displacement + the
    // asymptotic 5% critical value, all at the declared 9-decimal
    // precision — DuckDB recomputes bucket-for-bucket
    "q108_ks_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.functions.Stats.ksTest(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "n_chars", bins = 20)
    }),

    // Gopher quality-rule bundle over a corpus deterministically salted
    // with rule triggers (short docs, #-runs, bullet lines, ellipses),
    // FULL oracle: every metric and every rule verdict recomputed by
    // DuckDB from identical scalar/list arithmetic
    "t38_gopher_rules" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0, substring(tcol, 1, 60)).otherwise(tcol),
          when(col("doc_id") % 4 === 1, lit(" ### ## #")).otherwise(lit("")),
          when(col("doc_id") % 4 === 2,
            lit("\n- item one\n- item two\n• third")).otherwise(lit("")),
          when(col("doc_id") % 4 === 3, lit(" wait... more..."))
            .otherwise(lit(""))).as("text"))
      TextFunctions.gopherRules(injected, "doc_id", "text", minWords = 20)
    }),

    // C4-style line retention + document verdict over a deterministically
    // multi-lined corpus (unterminated lines, a javascript line, brace /
    // lorem-ipsum pages), FULL oracle: cleaned text byte-identical,
    // verdicts replayed by DuckDB
    "t39_c4_clean" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("."),
          lit("\nshort line\n"),
          lit("This middle line has some javascript code in it.\n"),
          lit("This is a good second sentence with enough words!"),
          when(col("doc_id") % 7 === 0, lit("\nbad { brace }"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit("\nLorem Ipsum dolor sit amet."))
            .otherwise(lit(""))).as("text"))
      TextFunctions.c4Clean(injected, "doc_id", "text")
    }),

    // host-level link-graph extraction (the WARC→HTML→graph bridge),
    // FULL oracle: per-doc source hosts + injected outbound URLs → edge
    // list with link counts; mixed-case hosts on both sides pin the
    // lowercasing; DuckDB replays the identical UrlRegex host group
    "t37_link_graph" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(
        concat(lit("Host"), (col("doc_id") % 11).cast("string"),
          lit(".Example.COM")).as("host"),
        concat(coalesce(col("text"), lit("")),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://CDN.example.net/x"),
          when(col("doc_id") % 3 === 0,
            lit(" plus https://host1.example.com/self"))
            .otherwise(lit(""))).as("text"))
      TextFunctions.linkGraph(injected, "host", "text")
    }),

    // ---- beyond-reference: dedup --------------------------------------
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), Seq("text"), "doc_id")),
    "d02_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.5)
        .select("id_a", "id_b", "jaccard")),
    "d03_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),
    "d04_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)),
    // scale path by default: hyperplane-LSH bucketing, never a cartesian
    "d05_dedup_embed" -> ((s, dir) =>
      Similarity.lshCosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, nTables = 16, nBits = 8, probes = 1)
        .select("id_a", "id_b")),
    // exact all-pairs variant (opt-in at scale) — full DuckDB oracle
    "d05x_dedup_embed_exact" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4).select("id_a", "id_b")),
    // differential conformance: LSH pair recall vs the exact path ≥ 0.9
    // (single-row result; oracle is the constant the differential must hit)
    "d07_embed_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b")
      val lsh = Similarity.lshCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.4, nTables = 16, nBits = 8, probes = 1).select("id_a", "id_b")
      val found = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select((col("n_found").cast("double") / col("n_exact") >= 0.9)
          .cast("bigint").as("recall_ok"))
    }),

    // simhash banding exactness: by pigeonhole, 4×16-bit banding finds
    // EVERY pair with hamming ≤ 3 — the banded result must equal the
    // all-pairs brute force over the same signatures exactly
    "d09_simhash_exactness" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // uncapped buckets: the exactness claim holds only without the skew
      // cap (a >maxBucketSize band bucket would silently drop pairs)
      val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucketSize = Int.MaxValue)
        .select("id_a", "id_b", "hamming")
      val sigs = docs.select(col("doc_id").as("id"),
        Dedup.simhash(col("text")).as("sig")).localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute)) 1L else 0L)), "exact_ok:long")
    }),
    // minhash-LSH precision differential: every LSH-found pair must appear
    // in the exact n-gram result with the identical jaccard (the verify
    // step computes exact jaccard, so LSH pairs ⊆ exact pairs always)
    "d08_minhash_precision" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val spurious = lsh.join(exact, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_spurious"))
      val found = lsh.agg(count(lit(1)).as("n_found"))
      spurious.crossJoin(found)
        .select((col("n_spurious") === 0 && col("n_found") > 0)
          .cast("bigint").as("precision_ok"))
    }),

    // ---- beyond-reference: similarity search --------------------------
    "s01_knn_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .select("query_id", "rank", "neighbor_id")
    }),
    "s02_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nTables = 16, nBits = 8, probes = 2)
    }),
    // IVF full-probe differential: probing ALL cells must equal brute force
    // exactly (cells partition the corpus), which checks assignment,
    // probing, and scoring end-to-end with a deterministic answer
    "s04_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k = 8,
        iterations = 2, sampleSize = 2000)
      // the quadratic brute-force result feeds dfEq (2 scans), the recall
      // join, and a count — materialize once
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val ivfFull = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, nProbe = 8).select("query_id", "neighbor_id")
      // near-uniform embeddings: recall ~ nProbe/k; 6-of-8 is the stable
      // >=0.8 operating point on this data
      val ivfProbe = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, nProbe = 6).select("query_id", "neighbor_id")
      val fullOk = graft.api.DfUtils.dfEq(ivfFull, exact)
      val found = exact.join(ivfProbe, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val probeOk = found / exact.count() >= 0.8
      eng(s).toDF(Seq(Seq(if (fullOk) 1L else 0L, if (probeOk) 1L else 0L)),
        "full_probe_exact:long,probe_recall_ok:long")
    }),
    // IVF-PQ differential: (a) probing every cell with a shortlist
    // covering the corpus reproduces brute force EXACTLY (pins coarse
    // routing + ADC + exact rerank end-to-end); (b) at a modest budget
    // (shortlist = k·refine candidates) recall beats a same-budget
    // RANDOM shortlist's expectation 3× — the scale-portable phrasing
    // (see s05's rationale: i.i.d. embeddings mean absolute recall
    // decays with corpus size, relative-to-random does not).
    "s08_knn_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val n = emb.count()
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k = 8,
        iterations = 2, sampleSize = 2000, totalRows = Some(n))
      val books = Similarity.trainPqCodebooks(emb, "embedding",
        numSubspaces = 8, codebookSize = 16, iterations = 6,
        sampleSize = 2000, totalRows = Some(n))
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val fullBudget = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
        k = 5, cents, books, nProbe = 8,
        refine = ((n - 1) / 5 + 1).toInt)
        .select("query_id", "neighbor_id")
      val fullOk = graft.api.DfUtils.dfEq(fullBudget, exact)
      val pq = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, books, nProbe = 8, refine = 4).select("query_id", "neighbor_id")
      val found = exact.join(pq, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val recall = found / exact.count()
      val randomExpect = math.min(1.0, 5.0 * 4 / math.max(1L, n - 1))
      val signalOk = recall >= math.min(0.95, 3.0 * randomExpect)
      eng(s).toDF(Seq(Seq(if (fullOk) 1L else 0L, if (signalOk) 1L else 0L)),
        "full_budget_exact:long,adc_signal_ok:long")
    }),

    // large-x-large ANN join differential: EVERY corpus row is a query
    // (the shape lshTopK's broadcast-queries design cannot serve);
    // recall vs brute force >= 0.9 and full left coverage
    "s09_ann_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val joined = Similarity.annJoin(emb, emb, "vec_id", "embedding", k = 5,
        nTables = 16, nBits = 8, probes = 2, excludeSameId = true)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val found = exact.join(joined, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val recallOk = found / exact.count() >= 0.9
      val coverageOk = joined.select("query_id").distinct().count() == emb.count()
      eng(s).toDF(Seq(Seq(if (recallOk) 1L else 0L, if (coverageOk) 1L else 0L)),
        "recall_ok:long,coverage_ok:long")
    }),

    // semantic decontamination, FULL oracle: DuckDB recomputes the exact
    // corpus x eval cosine screen with list_cosine_similarity (0.99
    // threshold; self-matches at cosine 1.0, random pairs ~0 — no
    // boundary sensitivity)
    "s10_semantic_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticDecontaminate(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "embedding", threshold = 0.99)
        .select("vec_id")
    }),

    // hard-negative mining, FULL oracle: DuckDB recomputes the exact
    // different-label top-k with the identical (cosine desc, id asc)
    // tie-break — the d05x precedent shows the cosine doubles agree
    "s11_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", "label", k = 3)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("neighbor_id"))
    }),

    // int8 scalar quantization, FULL oracle: the affine code mapping is
    // deterministic double arithmetic ((x−min)/scale positive, so Spark
    // HALF_UP and DuckDB half-away round identically) — DuckDB recomputes
    // every code byte-for-byte via list_transform
    // margin-based bitext mining (Artetxe & Schwenk ratio margin): the
    // even/odd embedding halves play src/tgt corpora; the oracle
    // recomputes both directions' top-4 neighborhoods, the hubness-
    // normalizing denominators and the argmax-margin match per src
    "s15_bitext_margin" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.marginMine(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4)
    }),

    // the SCALE path of s15: both kNN directions routed through annJoin
    // (LSH-bucketed candidates, NEITHER side broadcast) feeding the same
    // margin arithmetic — the verdict pins approx-vs-exact mined-PAIR
    // agreement on the s15 fixture at the declared ≥0.9 bound (like
    // s03/s05 pin brute-vs-LSH kNN recall); minMargin = -∞ so the
    // comparison covers every src, not just positive-margin ones
    "s15x_margin_approx" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      val exact = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity)
        .select("src_id", "tgt_id")
      val approx = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity, approx = true,
        nTables = 16, nBits = 8, probes = 2)
        .select("src_id", "tgt_id")
      val agree = exact.join(approx, Seq("src_id", "tgt_id"), "left_semi")
        .agg(count(lit(1)).as("n_agree"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(agree)
        .select(col("n_exact"),
          (col("n_agree").cast("double") / col("n_exact") >= 0.9)
            .cast("bigint").as("pair_agreement_ok"))
    }),

    // hybrid retrieval fusion: BM25 (lexical, over documents.text) and
    // brute-force cosine (dense, over embeddings) top-20 lists fused by
    // reciprocal rank — the calibration-free combiner curation pipelines
    // use for decontamination / hard-negative retrieval. The oracle
    // recomputes BOTH rankings and the fusion from first principles
    "s14_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(split(trim(lower(col("text"))), "\\s+"), 1, 4)).as("qtext"))
      val lexical = TextFunctions.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", topK = 20, scoreDigits = Some(9))
        .select(col("query_id"), col("rank"), col("doc_id"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 23 === 0), "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Similarity.rrfFuse(Seq(lexical, dense), "query_id", "doc_id", topK = 10)
    }),

    "s13_quantize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      emb.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), col("q.qmin").as("qmin"),
          col("q.qscale").as("qscale"),
          // CSV projection, not array<int>: the driver's pandas-based
          // canonicalizer cannot sort list-valued columns (r06 gate err)
          concat_ws(",",
            transform(col("q.codes"), c => c.cast("int"))).as("codes"))
    }),

    // distributed PCA invariant differential: one treeAggregate moment
    // pass + driver Jacobi. Floats wobble across layouts, so the pins are
    // the algebraic laws — components orthonormal, eigenvalues
    // descending and ≤ trace, per-axis projection variance ≡ eigenvalue
    // (the defining property), projections centered, and top-1
    // eigenvalue ≥ every coordinate variance (axes are candidate
    // directions, so the optimum cannot do worse)
    "s12_pca" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 4
      val (proj, model) = graft.functions.Pca.fitTransform(
        emb, "vec_id", "embedding", k, "p")
      def dotv(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum
      val ortho = (0 until k).forall { i =>
        (i until k).forall { j =>
          val want = if (i == j) 1.0 else 0.0
          math.abs(dotv(model.components(i), model.components(j)) - want) < 1e-8
        }
      }
      val descending = model.explainedVariance.sliding(2)
        .forall(w => w.length < 2 || w(0) >= w(1) - 1e-9)
      val bounded = model.explainedVariance.sum <= model.totalVariance + 1e-6
      // per-axis variance of the projections must equal the eigenvalues
      val stats = proj.select(posexplode(col("p")).as(Seq("axis", "x")))
        .groupBy("axis")
        .agg(avg(col("x")).as("m"), var_samp(col("x")).as("v"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val centered = (0 until k).forall(a => math.abs(stats(a)._1) < 1e-6)
      val varMatch = (0 until k).forall { a =>
        math.abs(stats(a)._2 - model.explainedVariance(a)) <=
          0.01 * math.max(1e-9, model.explainedVariance(a))
      }
      val coordVar = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("i").agg(var_samp(col("x")).as("v"))
        .agg(max(col("v"))).collect()(0).getDouble(0)
      val optimal = model.explainedVariance(0) >= coordVar - 1e-9
      eng(s).toDF(Seq(Seq(
        if (ortho && descending && bounded && centered && varMatch && optimal) 1L
        else 0L)), "pca_ok:long")
    }),

    // differential conformance: LSH top-k recall vs brute force ≥ 0.9
    "s03_knn_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5,
        nTables = 16, nBits = 8, probes = 2).select("query_id", "neighbor_id")
      val found = exact.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select(col("n_exact"),
          (col("n_found").cast("double") / col("n_exact") >= 0.9)
            .cast("bigint").as("recall_ok"))
    }),

    // reduce–shortlist–rescore signal differential: the synthetic
    // embeddings are i.i.d. random (no neighbor structure — the
    // worst case for ANY dimensionality reduction; measured recall@5
    // decays with corpus size: 0.42 at 500 rows, projDim=32,
    // shortlist 10%), so an absolute recall bound is not
    // scale-portable. The conformance instead asserts the projection
    // carries real signal — recall ≥ 3× a same-budget RANDOM
    // shortlist's expectation (= the shortlist fraction) — which
    // holds with wide margin at every sf. Exactness of the pipeline
    // (full shortlist ⇒ identical to brute force; rescored cosines
    // are true cosines) is pinned by FunctionsSpec.
    "s05_knn_projected" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val k = 5
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id")
      val proj = Similarity.projectedTopK(emb, q, "vec_id", "embedding", k,
        projDim = 32, overFetch = 10).select("query_id", "neighbor_id")
      val frac = math.min(1.0, (k * 10) / t(s, dir, "embeddings").count().toDouble)
      val found = exact.join(proj, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select(col("n_exact"),
          (col("n_found").cast("double") / col("n_exact") >=
            math.min(0.95, 3 * frac)).cast("bigint").as("recall_ok"))
    }),

    // embedding k-means clustering differential: the plan-embedded
    // NearestCells assignment must equal an INDEPENDENT argmax computed
    // through a different code path — centroids exploded to a broadcast
    // k-row frame, per-(row,centroid) DotProduct, per-row min-index argmax
    // (matching the expression's lowest-index tie resolution; both dot
    // loops accumulate ascending, so FP results are bit-identical). Plus
    // coverage laws: every row assigned, clusters within [0, k), >1
    // cluster used (k=8 over 500+ vectors — a collapsed clustering fails)
    "s07_kmeans_cluster" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 8
      val (assigned, cents) = Similarity.clusterEmbeddingsWithCentroids(
        emb, "vec_id", "embedding", k, iterations = 2, sampleSize = 2000)
      val centRows = cents.zipWithIndex.map { case (v, i) =>
        Row(i, v.toSeq)
      }.toSeq
      val centDf = s.createDataFrame(
        s.sparkContext.parallelize(centRows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false)))))
      val independent = emb
        .select(col("vec_id"), Similarity.l2normalize(col("embedding")).as("v"))
        .crossJoin(broadcast(centDf))
        .withColumn("score", Similarity.dot(col("v"), col("cv")))
        .groupBy("vec_id")
        .agg(max_by(col("c"), struct(col("score"), -col("c"))).as("cluster"))
      val agree = graft.api.DfUtils.dfEq(
        assigned.select("vec_id", "cluster"),
        independent.select("vec_id", "cluster"))
      val stats = assigned.agg(
        count(lit(1)).as("n"),
        countDistinct(col("cluster")).as("n_clusters"),
        min(col("cluster")).as("mn"), max(col("cluster")).as("mx")).head()
      val lawsOk = stats.getLong(0) == emb.count() &&
        stats.getLong(1) > 1 && stats.getInt(2) >= 0 && stats.getInt(3) < k
      eng(s).toDF(Seq(Seq(if (agree && lawsOk) 1L else 0L)), "cluster_ok:long")
    }),

    // ---- beyond-reference: text analysis ------------------------------
    "t01_text_analyze" -> ((s, dir) =>
      TextFunctions.analyze(t(s, dir, "documents"), "doc_id", "text")),
    "t02_tokens_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(Seq(col("doc_id")) ++
        TextFunctions.qualityMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
    }),
    "t03_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))),
    // token-budget packing: deterministic shard assignment, exact oracle
    "t04_pack" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      TextFunctions.packByTokenBudget(d, "n_tokens", budget = 2000, orderCol = "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
    }),
    // rebalance differential: uniform targets over a skewed lang mix —
    // the scarcest lang must be kept in full and the mix must flatten
    "t06_rebalance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val langs = Seq("de", "en", "es", "fr", "zh")
      val r = graft.functions.Sampling.rebalance(docs, "lang",
        langs.map(_ -> 1.0).toMap, seed = 7L)
      val outStats = r.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("mn"), max(col("n")).as("mx"))
      val inMin = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("imn"))
      // per-lang counts concentrate around imn (the feasible uniform
      // share); Bernoulli variance bounds rather than equality
      outStats.crossJoin(inMin)
        .select((col("mn") >= col("imn") * 0.8 &&
          col("mx") <= col("imn") * 1.35).cast("bigint").as("rebalance_ok"))
    }),
    // quality filter: bounds over the oracle-able metrics
    "t05_quality_filter" -> ((s, dir) =>
      TextFunctions.qualityFilter(t(s, dir, "documents"), "text",
        minTokens = 30, maxStopwordRatio = 0.4)
        .select("doc_id", "lang")),
    // PII redaction: inject deterministic synthetic PII (the corpus has
    // none), scrub it, and match the oracle's byte-identical RE2 rewrites
    "t07_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.redactPii(piiInjected).as("redacted"))),
    // the dialect drives the curation pipeline end-to-end: built-in
    // PROCESS extensions (redact_pii then quality_filter) over a
    // PII-injected corpus, oracled by the composed DuckDB rewrite+filter
    "q60_sql_curation" -> ((s, dir) => {
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), piiInjected.as("text"))
      graft.sql.GraftSql.run(eng(s),
        """clean = PROCESS docs USING redact_pii
          |kept = PROCESS clean USING quality_filter(min_tokens:30, max_stopword_ratio:0.4)
          |YIELD kept AS out
          |""".stripMargin, Map("docs" -> injected)).yields("out")
    }),
    // data-quality gate driven from the SQL dialect (quality_report rule
    // DSL end-to-end); oracle recomputes each metric in DuckDB
    "q93_sql_quality" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        """r = PROCESS ord USING quality_report(rules:"not_null:o_orderkey,unique:o_orderkey,in_set:o_orderstatus:F|O|P,distinct:o_orderstatus:1:5,min:o_totalprice:0")
          |YIELD r AS out
          |""".stripMargin, Map("ord" -> t(s, dir, "orders"))).yields("out")
    }),
    // overlapping token-window chunking (50-token chunks, 10-token overlap)
    "t08_chunking" -> ((s, dir) =>
      TextFunctions.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 50, overlapTokens = 10)),
    // connected-components differential: the driver union-find fast path
    // and the distributed min-label loop must keep the identical id set
    "d10_cc_paths_agree" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialize once: both CC paths below consume the pair list, and
      // each would otherwise re-run the whole candidate/verify pipeline
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .localCheckpoint(true)
      val a = Dedup.dropNearDuplicates(docs, "doc_id", pairs).select("doc_id")
      val b = Dedup.dropNearDuplicates(docs, "doc_id", pairs,
        driverMaxEdges = 0).select("doc_id")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(a, b)) 1L else 0L)), "cc_ok:long")
    }),
    // quality-aware dedup differential: (a) ascending-id quality reproduces
    // the min-id convention exactly; (b) best-quality keeps one rep per
    // component (same survivor COUNT as min-id) and drops the same ids
    // (survivor sets agree on membership of each component)
    "d11_dedup_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialized once — four CC invocations below read the pair list
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .localCheckpoint(true)
      val minId = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      val viaBy = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "doc_id",
        descending = false)
      val best = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "n_chars")
      val sameAsMinId = graft.api.DfUtils.dfEq(
        minId.select("doc_id"), viaBy.select("doc_id"))
      val oneRepPerComponent = best.count() == minId.count()
      // every best-quality survivor's component representative maps back to
      // a min-id survivor (same components survived)
      val comps = Dedup.nearDupComponents(docs, "doc_id", pairs)
      val sameComponents = graft.api.DfUtils.dfEq(
        comps.join(best.select("doc_id"), "doc_id").select("component"),
        comps.join(minId.select("doc_id"), "doc_id").select("component"))
      eng(s).toDF(Seq(Seq(
        if (sameAsMinId && oneRepPerComponent && sameComponents) 1L else 0L)),
        "best_ok:long")
    }),

    // group-aware split differential: every group's rows land in exactly
    // one split, splits cover the data, realized proportions are within
    // 5σ at the GROUP count, and assignment is deterministic per seed
    "q63_group_split" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val s1 = graft.functions.Sampling.splitByGroup(o, "o_custkey", w, seed = 7L)
      val s2 = graft.functions.Sampling.splitByGroup(o, "o_custkey", w, seed = 7L)
      val atomicOk = s1.groupBy("o_custkey")
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") =!= 1).isEmpty
      val coverOk = s1.filter(!col("split").isin("train", "val", "test")).isEmpty &&
        s1.count() == o.count()
      val groups = s1.select("o_custkey", "split").distinct()
      val nG = groups.count().toDouble
      val bySplit = groups.groupBy("split").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val propOk = w.forall { case (name, wt) =>
        val n = bySplit.getOrElse(name, 0L).toDouble
        math.abs(n - wt * nG) <= 5 * math.sqrt(nG * wt * (1 - wt))
      }
      val detOk = graft.api.DfUtils.dfEq(s1, s2)
      eng(s).toDF(Seq(Seq(
        if (atomicOk && coverOk && propOk && detOk) 1L else 0L)),
        "split_ok:long")
    }),

    // Bloom-prefiltered exact semi-join: the selective-join scale pattern
    // (probe rows drop at the scan, before the exchange); composition with
    // the exact join keeps plain semi-join semantics — full DuckDB oracle
    "q62_bloom_semi" -> ((s, dir) => {
      val build = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey").as("l_orderkey"))
      graft.operators.BloomJoin.semiJoin(
        t(s, dir, "lineitem"), build, "l_orderkey")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // exact edit-distance fuzzy join (record linkage): all customer-name
    // pairs within levenshtein 1, via deletion-neighborhood blocking +
    // exact verify — full DuckDB levenshtein oracle
    "d12_fuzzy_join" -> ((s, dir) =>
      Dedup.editDistanceJoin(t(s, dir, "customer"), "c_custkey", "c_name",
        maxDist = 1)
        .select(col("id_a"), col("id_b"), col("dist"))),

    // vocabulary encoding: corpus tokens -> ids against the corpus's own
    // top-200 vocabulary (t14), OOV -> -1; exact DuckDB oracle
    "t19_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextFunctions.buildVocab(docs, "text", size = 200, minCount = 2L)
      // ids rendered as a space-joined string: the driver's pandas
      // comparator cannot sort raw array cells (r3 gate err), and the
      // canonical scalar rendering is hash-comparable across engines
      TextFunctions.encodeWithVocab(docs, "doc_id", "text", vocab)
        .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"),
          col("n_tokens"), col("n_unk"))
    }),
    // URL/domain source analysis over a deterministically URL-injected
    // corpus (the corpus itself has none) — exact DuckDB oracle
    "t22_url_domains" -> ((s, dir) => {
      // coalesce: Spark concat is null-on-any-null, DuckDB concat skips
      // nulls — guard both sides identically
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://cdn.example.net/img.jpg")).as("text"))
      TextFunctions.urlDomainStats(injected, "doc_id", "text")
    }),
    // Dolma/CCNet-style line-level boilerplate dedup over a
    // deterministically multi-lined corpus (the synthetic text is
    // single-line, so inject: a universal boilerplate line, the doc's
    // 40-char prefix as a semi-shared line, and a parity-gated footer) —
    // exact DuckDB oracle recomputes doc-frequencies and the rebuild
    "t23_line_dedup" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("\nsubscribe to our newsletter\n"),
          substring(tcol, 1, 40),
          when(col("doc_id") % 2 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))).as("mtext"))
      Dedup.lineDedup(multi, "doc_id", "mtext", maxDocFrequency = 5)
        .select(col("doc_id"), col("dedup_text"),
          col("n_lines").cast("long").as("n_lines"),
          col("n_kept").cast("long").as("n_kept"))
    }),
    // Bloom-filter line dedup differential vs the exact path, on the
    // same injected corpus as t23: (1) one-sided error — every line the
    // exact dedup drops, the Bloom dedup drops (per-doc Bloom-kept ⊆
    // exact-kept, checked positionally after removing exact-dropped
    // lines); (2) the false-positive overdrop stays under 5× fpp of the
    // exact-kept line mass; (3) line/blank accounting identical;
    // (4) deterministic across two independent evaluations
    "d16_bloom_line_dedup" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("\nsubscribe to our newsletter\n"),
          substring(tcol, 1, 40),
          when(col("doc_id") % 2 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))).as("mtext"))
      val fpp = 0.01
      val exact = Dedup.lineDedup(multi, "doc_id", "mtext",
        maxDocFrequency = 5)
      def bloom() = Dedup.bloomLineDedup(multi, "doc_id", "mtext",
        maxDocFrequency = 5, fpp = fpp)
      val b1 = bloom()
      val j = exact.select(col("doc_id"), col("dedup_text").as("e_text"),
          col("n_lines").as("e_lines"), col("n_kept").as("e_kept"))
        .join(b1.select(col("doc_id"), col("dedup_text").as("b_text"),
          col("n_lines").as("b_lines"), col("n_kept").as("b_kept")),
          Seq("doc_id"))
      // sequence containment: both outputs are subsequences of the SAME
      // original line sequence, and removal is all-or-nothing per line
      // VALUE (hash-keyed), so "Bloom-kept ⊆ exact-kept as a (doc, line,
      // occurrence#) multiset" already implies b_text is e_text with
      // whole value-classes removed, in order — no positional check
      // needed on top
      val eL = posexplode(split(col("e_text"), "\n", -1))
      val bL = posexplode(split(col("b_text"), "\n", -1))
      // n_kept == 0 renders as "" whose split yields a PHANTOM empty
      // line — at sf0.1 a false positive can legitimately empty a whole
      // document, and the phantom would fail the subset check against
      // an exact side that kept real lines. Skip emptied docs on each
      // side (n_kept counts blanks, so n_kept == 0 iff text == "").
      val eRows = j.filter(col("e_kept") > 0)
        .select(col("doc_id"), eL.as(Seq("e_pos", "line")))
        .withColumn("occ", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("line"))
            .orderBy(col("e_pos"))))
      val bRows = j.filter(col("b_kept") > 0)
        .select(col("doc_id"), bL.as(Seq("b_pos", "line")))
        .withColumn("occ", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("line"))
            .orderBy(col("b_pos"))))
      val matched = bRows.join(eRows, Seq("doc_id", "line", "occ"))
      val subsetOk = bRows.count() == matched.count()
      val agg = j.agg(
        sum(col("e_kept") - col("b_kept")).cast("double").as("dropped"),
        sum(col("e_kept")).cast("double").as("kept"),
        max((col("e_lines") =!= col("b_lines")).cast("int")).as("mismatch"))
        .collect().head
      val fpOk = agg.getDouble(0) <= math.max(5 * fpp * agg.getDouble(1), 8.0)
      val shapeOk = agg.getInt(2) == 0
      val det = graft.api.DfUtils.dfEq(b1, bloom())
      eng(s).toDF(Seq(Seq(
        if (subsetOk && fpOk && shapeOk && det) 1L else 0L)),
        "bloom_dedup_ok:long")
    }),
    // contiguous global row index via the distributed prefix sum (what
    // monotonically_increasing_id is not) — full DuckDB oracle
    "q69_row_index" -> ((s, dir) =>
      graft.api.DfUtils.withRowIndex(
        t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"))),
    // column-level data profile (Deequ-style): exact distincts, null
    // counts, min/max — one aggregation pass; full DuckDB oracle over the
    // non-FP orders columns (FP/timestamp string rendering differs across
    // engines, so the conformance subset sticks to exact-rendering types)
    "q66_profile" -> ((s, dir) =>
      graft.api.DfUtils.profile(t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))),
    // BPE tokenizer training differential: deterministic across runs, the
    // first merge equals the SQL-brute-forced max adjacent pair of the
    // initial character state, merge table well-formed, and applying the
    // merges is lossless (subword concat == whitespace-stripped text)
    "t21_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m1 = TextFunctions.learnBpe(docs, "text", numMerges = 40)
      val m2 = TextFunctions.learnBpe(docs, "text", numMerges = 40)
      val det = graft.api.DfUtils.dfEq(m1, m2)
      // SQL brute force of round 1: adjacent pairs of (chars :+ </w>)
      val words = docs
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"),
          concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      val top = words
        .select(col("cnt"), posexplode(slice(col("syms"), lit(1),
          size(col("syms")) - 1)).as(Seq("i", "l")),
          col("syms"))
        .select(col("cnt"), col("l"),
          element_at(col("syms"), col("i") + 2).as("r"))
        .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect().head
      val first = m1.orderBy("rank").limit(1).collect().head
      val firstOk = first.getString(1) == top.getString(0) &&
        first.getString(2) == top.getString(1) &&
        first.getLong(4) == top.getLong(2)
      val rows = m1.collect()
      val wellformed = rows.length == 40 &&
        rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)) &&
        rows.map(_.getLong(0)).sorted.toSeq == (1L to 40L)
      val mergeList = rows.sortBy(_.getLong(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val lossless = docs.select(
        array_join(TextFunctions.applyBpe(col("text"), mergeList), "").as("a"),
        regexp_replace(trim(lower(col("text"))), "\\s+", "").as("b"))
        .filter(col("a") =!= col("b")).isEmpty
      eng(s).toDF(Seq(Seq(
        if (det && firstOk && wellformed && lossless) 1L else 0L)), "bpe_ok:long")
    }),
    // sequence packing: the tokenized corpus sliced into 128-token
    // training examples via the distributed prefix sum; exact oracle
    "t20_pack_sequences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextFunctions.buildVocab(docs, "text", size = 200, minCount = 2L)
      val enc = TextFunctions.encodeWithVocab(docs, "doc_id", "text", vocab)
        .select("doc_id", "ids")
      // same scalar rendering as t19 — see the comment there
      TextFunctions.packSequences(enc, "doc_id", "ids", seqLen = 128)
        .select(col("example_id"), array_join(col("ids"), " ").as("ids_str"),
          col("n_tokens"))
    }),
    // raw-text cleanup: zero-width/control/unicode-space scrub over a
    // deterministically dirtied corpus, byte-identical RE2 chain both sides
    "t18_clean_text" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.cleanText(dirtyInjected).as("cleaned"))),
    // SemDeDup differential: (a) with full probing the cluster-then-dedup
    // composition must EQUAL dedup over the exact all-pairs graph; (b) at
    // the practical nProbe=4, candidate pairs are a subset of exact pairs
    // (precision 1 by construction) with recall >= 0.8
    "s06_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 16
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k)
      val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4).select("id_a", "id_b").localCheckpoint(true)
      val semFull = Dedup.semanticDedup(emb, "vec_id", "embedding", 0.4,
        cents, nProbe = k, maxBucketSize = 100000)
      val exactDedup = Dedup.dropNearDuplicates(emb, "vec_id", exactPairs)
      val fullOk = graft.api.DfUtils.dfEq(
        semFull.select("vec_id"), exactDedup.select("vec_id"))
      val p2 = Similarity.ivfCosinePairs(emb, "vec_id", "embedding", 0.4,
        cents, nProbe = 4).select("id_a", "id_b").localCheckpoint(true)
      val subsetOk = p2.join(exactPairs, Seq("id_a", "id_b"), "left_anti").isEmpty
      val nExact = exactPairs.count()
      val nFound = exactPairs.join(p2, Seq("id_a", "id_b"), "left_semi").count()
      val recallOk = nExact == 0 || nFound.toDouble / nExact >= 0.8
      eng(s).toDF(Seq(Seq(
        if (fullOk && subsetOk && recallOk) 1L else 0L)), "sem_ok:long")
    }),
    // DSIR-style data selection: importance = mean log-likelihood ratio of
    // a target LM (docs 0-19) vs the raw corpus LM, exact DuckDB oracle
    // (integer ln arguments — see the t12 cross-libm note)
    "t17_importance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextFunctions.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
    }),
    // domain-mixture plan: token-budget sampling rates per source toward
    // target weights (binary-fraction weights → FP-exact both engines)
    "t16_mixture_plan" -> ((s, dir) =>
      graft.functions.Sampling.mixturePlan(t(s, dir, "documents"), "source",
        TextFunctions.tokenCount(col("text")),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
        budget = 50000L)),
    // Gopher-style repetition stats: most-frequent-2-gram char coverage
    // and duplicate-2-gram char fraction, exact vs the DuckDB oracle
    "t15_ngram_stats" -> ((s, dir) =>
      TextFunctions.ngramRepetitionStats(t(s, dir, "documents"),
        "doc_id", "text", n = 2)),
    // minhash recall differential: at jaccard >= 0.9, 16-band/128-hash
    // LSH misses a pair with probability (1-j^8)^16 ~ 1e-12 — the banded
    // result must contain EVERY exact pair (computed by the oracle-exact
    // inverted-index algorithm), and verification keeps precision exact
    "d15_minhash_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
        .select("id_a", "id_b").localCheckpoint(true)
      val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.9)
        .select("id_a", "id_b").localCheckpoint(true)
      val missed = exact.join(lsh, Seq("id_a", "id_b"), "left_anti").count()
      val extra = lsh.join(exact, Seq("id_a", "id_b"), "left_anti").count()
      val nExact = exact.count()
      eng(s).toDF(Seq(Seq(nExact,
        if (missed == 0 && extra == 0 && nExact > 0) 1L else 0L)),
        "n_exact:long,recall_ok:long")
    }),
    // cross-corpus dedup join: new batch (doc_id >= 100) vs existing
    // corpus (doc_id < 100), exact 3-gram jaccard — full DuckDB oracle
    "d14_dedup_against" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramJaccardJoin(
        docs.filter(col("doc_id") >= 100), "doc_id", "text",
        docs.filter(col("doc_id") < 100), "doc_id", "text",
        shingleK = 3, threshold = 0.5)
    }),
    // corpus-level exact segment dedup (RefinedWeb-style): 20-token
    // blocks, first occurrence wins corpus-wide, documents reassembled
    "d13_segment_dedup" -> ((s, dir) =>
      Dedup.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
        segmentTokens = 20)),
    // repetition quality signal: duplicate-3-gram fraction per document
    "t10_repetition" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.repetitionRatio(col("text"), k = 3).as("rep_ratio"))),
    // benchmark decontamination: 5-gram overlap of every document with the
    // "eval set" (docs 0-19), exact scores vs the DuckDB list-ops oracle
    "t11_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") < 20)
      Dedup.contaminationScores(docs, "doc_id", "text", evalSet, "text",
        shingleK = 5)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_matched"),
          col("contamination"))
    }),
    // unigram-LM cross-entropy (CCNet-style self-trained LM filter):
    // exact per-doc scores vs the DuckDB oracle (decimal-bridged log-prob
    // sums make the FP result order-independent on both engines)
    // NOTE on cross-libm FP: t12/t17 compare EXACTLY — their ln arguments
    // are integers (token counts), which java.lang.Math.log and DuckDB's
    // libm round identically (verified at sf0.01 and sf0.1). Rounding the
    // output instead INTRODUCES boundary-straddle risk (a 9th-decimal
    // half boundary between two ulp-equal values — observed at sf0.1).
    // t13 is the opposite case: its idf ln takes a RATIO, where the two
    // libms genuinely disagree, so there the declared-precision rounding
    // is required.
    "t12_lm_score" -> ((s, dir) =>
      TextFunctions.unigramCrossEntropy(t(s, dir, "documents"), "doc_id", "text")),
    // TF-IDF keyword extraction: top-5 tokens per document against the
    // corpus's own document frequencies, exact scores vs the DuckDB oracle
    // scores rounded to 9 decimals BEFORE ranking on BOTH engines: the
    // idf ln is a transcendental whose last ulp differs between
    // java.lang.Math.log and DuckDB's libm for some arguments (caught by
    // the sf0.1 gate — the sf0.01 arguments happen to agree)
    "t13_tfidf" -> ((s, dir) =>
      TextFunctions.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text",
        topK = 5, scoreDigits = Some(9))),
    // vocabulary construction: top-200 tokens with >=2 support, dense ids
    // by descending frequency — exact vs the DuckDB oracle
    "t14_vocab" -> ((s, dir) =>
      TextFunctions.buildVocab(t(s, dir, "documents"), "text",
        size = 200, minCount = 2L)),
    // fingerprint differential: fingerprint-equality classes must coincide
    // with normalized-text-equality classes on the (ASCII) corpus — i.e. a
    // bijection between distinct fingerprints and distinct normalized texts
    "t09_fingerprint_consistency" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(TextFunctions.fingerprint(col("text")).as("fp"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("nt"))
        .distinct()
      g.agg(countDistinct(col("fp")).as("nfp"),
          countDistinct(col("nt")).as("nnt"), count(lit(1)).as("npair"))
        .select((col("nfp") === col("nnt") && col("nfp") === col("npair"))
          .cast("bigint").as("fp_ok"))
    }),

    // ---- beyond-reference: multimodal plumbing ------------------------
    "m01_multimodal_decode" -> ((s, dir) => {
      // REAL decode conformance: deterministic PNGs with doc_id-derived
      // dims are generated on executors, decoded by the real ImageIO
      // header parse, and the DuckDB oracle recomputes the expected dims
      // from the same id formula (syntheticImages' contract)
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeImages(pngs, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),

    "m02_multimodal_ann" -> ((s, dir) => {
      // full multimodal pipeline: real PNG payload → decoded-pixel
      // luminance-grid featurizer → ANN top-3 (FP ranking → rows-only)
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      val emb = Multimodal.extractFeatures(pngs, "doc_id", "payload")
      Similarity.bruteForceTopK(emb, emb.filter(col("doc_id") < 5),
        "doc_id", "embedding", k = 3)
        .select("query_id", "rank", "neighbor_id")
    }),
    // closed-form cross-check pinning the rows-only m02 pipeline: the
    // synthetic PNG's pixel (x, y) color is (id*2654435761 + 131x + 31y)
    // & 0xffffff, so the 8×8 luminance-grid embedding the REAL
    // PNG-encode → ImageIO-decode → featurize path produces is
    // recomputable in plain SQL arithmetic; features must match
    // element-wise (≤1e-5), and the ANN stage must be internally
    // consistent (ranks exactly 1..3 per query, cosine non-increasing)
    "m02x_feature_differential" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select("doc_id")
      val pngs = Multimodal.syntheticImages(docs, "doc_id")
      val emb = Multimodal.extractFeatures(pngs, "doc_id", "payload")
      val ref = docs
        .withColumn("w", expr("CAST(8 + doc_id % 57 AS INT)"))
        .withColumn("h", expr("CAST(8 + doc_id % 31 AS INT)"))
        .withColumn("p", explode(expr("sequence(0, w * h - 1)")))
        .withColumn("x", expr("p % w"))
        .withColumn("y", expr("p DIV w"))
        .withColumn("rgb",
          expr("(doc_id * 2654435761 + x * 131 + y * 31) & 16777215"))
        .withColumn("lum", expr(
          "(299 * ((rgb DIV 65536) % 256) + 587 * ((rgb DIV 256) % 256)" +
            " + 114 * (rgb % 256)) / 1000.0"))
        // integer cell mapping mirrors luminanceGrid: (y*8 div h)*8 + x*8 div w
        .withColumn("cell", expr(
          "(CAST(y AS BIGINT) * 8 DIV h) * 8 + CAST(x AS BIGINT) * 8 DIV w"))
        .groupBy(col("doc_id"), col("cell"))
        .agg(avg(col("lum")).cast("float").as("m"))
        .groupBy("doc_id")
        .agg(expr("transform(array_sort(collect_list(struct(cell, m))), e -> e.m)")
          .as("v"))
        .withColumn("inv", expr(
          "CAST(1.0 / sqrt(aggregate(v, CAST(0 AS DOUBLE)," +
            " (acc, e) -> acc + CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS FLOAT)"))
        .select(col("doc_id"), expr("transform(v, e -> e * inv)").as("ref"))
      val featOk = emb.join(ref, "doc_id")
        .select(expr(
          "aggregate(zip_with(embedding, ref," +
            " (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))," +
            " CAST(0 AS DOUBLE), (acc, d) -> greatest(acc, d))").as("mx"))
        .agg(max(col("mx")).as("maxdiff"), count(lit(1)).as("ndocs"))
      val ann = Similarity.bruteForceTopK(emb, emb.filter(col("doc_id") < 5),
        "doc_id", "embedding", k = 3)
      val annOk = ann
        .withColumn("nxt", lead(col("cosine"), 1).over(
          Window.partitionBy(col("query_id")).orderBy(col("rank"))))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n"), min(col("rank")).as("rmin"),
          max(col("rank")).as("rmax"),
          min(when(col("nxt").isNull ||
            col("cosine") >= col("nxt") - lit(1e-9), 1).otherwise(0)).as("mono"))
        .agg(min(when(col("n") === 3 && col("rmin") === 1 &&
          col("rmax") === 3 && col("mono") === 1, 1).otherwise(0)).as("shape_ok"),
          count(lit(1)).as("nq"))
      featOk.crossJoin(annOk)
        .select((col("maxdiff") < 1e-5 && col("ndocs") > 0 &&
          col("shape_ok") === 1 && col("nq") === 5)
          .cast("bigint").as("m02_ok"))
    }),
    "m05_audio_decode" -> ((s, dir) => {
      // REAL audio decode conformance: WAV fixtures with id-derived
      // header fields, parsed by javax.sound.sampled; the oracle
      // recomputes the fields from the same formula (syntheticAudio)
      val wavs = Multimodal.syntheticAudio(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.decodeAudioBatch(wavs, "doc_id", "payload")
        .select("doc_id", "sample_rate", "channels", "bits", "n_frames")
    }),
    "m08_binary_ingest" -> ((s, dir) => {
      // real file ingestion: fixture PNGs written as ACTUAL files on
      // executors, listed and read back through Spark's binaryFile
      // source, ids recovered from filenames, decoded by the real
      // ImageIO parse — the m01 dims oracle applies end-to-end
      val base = java.nio.file.Files.createTempDirectory("graft_m08_").toString
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      pngs.foreachPartition { it: Iterator[Row] =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(base, f"img_${r.getLong(0)}%06d.png"),
            r.getAs[Array[Byte]](1))
        }
      }
      val files = Multimodal.loadBinaryFiles(s, base, "*.png")
        .select(expr("CAST(regexp_extract(path, 'img_(\\\\d+)\\\\.png', 1) AS BIGINT)")
          .as("doc_id"), col("payload"))
      Multimodal.decodeImages(files, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),
    "m09_warc_ingest" -> ((s, dir) => {
      // WARC container ingestion: the corpus packed into 8 archive blobs
      // (records bucketed by doc_id, spec-exact headers), parsed back by
      // the per-file record parser; ids recovered from WARC-Target-URI.
      // The DuckDB oracle recomputes every field from the fixture's id
      // formula — Content-Length is payload BYTES (DuckDB strlen)
      val files = graft.sources.Warc.syntheticWarcFiles(
        t(s, dir, "documents"), "doc_id", "text", nFiles = 8)
      graft.sources.Warc.parseWarc(files, "file_name", "content")
        .select(
          expr("CAST(regexp_extract(target_uri, 'doc/(\\\\d+)$', 1) AS BIGINT)")
            .as("doc_id"),
          col("target_uri"), col("warc_type"), col("content_length"),
          col("payload").cast("string").as("text"))
    }),
    // image near-dup end-to-end (the d09 pattern for pixels): structured
    // PNGs in 10 pattern groups with per-image noise → REAL ImageIO
    // decode → dHash → pigeonhole banding → verify, cross-checked against
    // a brute-force over the same hashes (zero-signature guard mirrored).
    // Exactness differential: banding prunes, never drops, so the two
    // pair sets must be identical — and non-empty, or the query is vacuous
    "m10_image_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val pngs = Multimodal.syntheticStructuredImages(docs, "doc_id",
        nPatterns = 10, noisePixels = 4)
      val banded = Multimodal.imageNearDupPairs(pngs, "doc_id", "payload",
        maxHamming = 10, maxBucketSize = Int.MaxValue)
      val sigs = Multimodal.imageDHash(pngs, "doc_id", "payload")
        .filter(col("img_ok") && col("dhash") =!= 0L)
        .select(col("doc_id").as("id"), col("dhash").as("sig"))
        .localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 10)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute) && banded.count() > 0) 1L
        else 0L)), "image_dedup_ok:long")
    }),
    // audio near-dup differential (m10's shape for the third modality):
    // banded energy-delta fingerprint pairs must equal the brute-force
    // hash cross-join exactly, and must find the planted variant groups
    "m11_audio_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = Multimodal.syntheticEnvelopeWavs(docs, "doc_id", nGroups = 10)
      val banded = Multimodal.audioNearDupPairs(wavs, "doc_id", "payload",
        maxHamming = 6, maxBucketSize = Int.MaxValue)
      val sigs = Multimodal.audioFingerprint(wavs, "doc_id", "payload")
        .filter(col("audio_ok") && col("afp") =!= 0L)
        .select(col("doc_id").as("id"), col("afp").as("sig"))
        .localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute) && banded.count() > 0) 1L
        else 0L)), "audio_dedup_ok:long")
    }),
    "m07_audio_features" -> ((s, dir) => {
      // REAL sample-level audio decode: waveform features (RMS, zero
      // crossings, peak) computed from the PCM samples the JDK decoder
      // extracts from real WAV payloads must match features computed
      // straight from the synthetic byte formula with no container —
      // pinning that the encode→decode roundtrip is sample-transparent
      val docs = t(s, dir, "documents").select("doc_id")
      val wavs = Multimodal.syntheticAudio(docs, "doc_id")
      val feats = Multimodal.audioFeatures(wavs, "doc_id", "payload")
      val expected = Multimodal.expectedSyntheticAudioFeatures(docs, "doc_id")
      feats.join(expected, "doc_id")
        .agg(min(when(col("n_samples") === col("e_n") &&
          col("zero_crossings") === col("e_zc") &&
          col("peak") === col("e_peak") &&
          abs(col("rms") - col("e_rms")) < 1e-12, 1).otherwise(0)).as("ok"),
          count(lit(1)).as("nd"))
        .select(col("ok").cast("bigint").as("feat_ok"),
          col("nd").cast("bigint").as("n_docs"))
    }),
    "m04_multimodal_resize" -> ((s, dir) => {
      // resize → decode roundtrip: a REAL raster resample re-encoded as
      // PNG must decode to exactly the target dims on every row
      val pngs = Multimodal.syntheticImages(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      val resized = Multimodal.resizeImages(pngs, "doc_id", "payload", 17, 11)
        .select(col("doc_id"), col("payload"))
      Multimodal.decodeImages(resized, "doc_id", "payload")
        .select("doc_id", "width", "height", "channels")
    }),
    "m06_video_demux" -> ((s, dir) => {
      // REAL container demux: animated GIFs (the one multi-frame format
      // the JDK ships a decoder for) with id-derived frame counts/dims
      // are written by the real GIF encoder, demuxed by the real ImageIO
      // multi-frame reader at stride 2; the oracle recomputes the frame
      // arithmetic from the same id formulas (syntheticVideos' contract)
      val gifs = Multimodal.syntheticVideos(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      Multimodal.demuxFrames(gifs, "doc_id", "payload", stride = 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_no")).as("last_frame"),
          min(col("width")).as("width"), min(col("height")).as("height"))
    }),
    "m03_frame_sampling" -> ((s, dir) => {
      // frame-sampling plumbing: payload → every 4th 64-byte window,
      // then per-frame metadata (count oracle-able per doc via SQL)
      val payloads = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(payloads, "doc_id", "payload",
        frameSize = 64, stride = 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_no")).as("last_frame"))
    }),
    "q37_sketch" -> ((s, dir) =>
      // HLL sketch vs exact cardinality per event type (sketch impls differ
      // per engine → rows-only)
      eng(s).aggregate(events(s, dir), Seq("event_type"), Seq(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n")))),
    // sketch-error differential: the HLL estimate must be within 2×rsd
    // (default rsd 0.05) of the exact count on every group
    "q37x_sketch_error" -> ((s, dir) => {
      val agg = eng(s).aggregate(events(s, dir), Seq("event_type"), Seq(
        approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("x")))
      agg.agg(max(abs(col("a") - col("x")).cast("double") /
          col("x").cast("double")).as("err"))
        .select((col("err") <= 0.10).cast("bigint").as("sketch_ok"))
    }),

    // ---- streaming (bounded AvailableNow run, oracle-checked) ----------
    "q50_stream_window" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = t(s, dir, "events").schema
      // streaming file sources need a DIRECTORY: point at the sf dir and
      // glob-filter to the events file
      val stream = normalizeEventTs(graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "events.parquet")))
      val agg = graft.streaming.Streaming.windowedAgg(stream, "ts",
        watermarkDelay = "1 minute", windowDuration = "1 hour",
        slideDuration = None, groupBy = Seq("event_type"),
        aggs = Seq(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total")))
      val name = "graft_q50_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(agg, name, outputMode = "complete")
      s.table(name).select(col("window.start").as("win_start"),
        col("event_type"), col("n"), col("total"))
    }),

    // stream-static enrichment join: events stream vs a broadcast dimension
    "q59_stream_static_join" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = t(s, dir, "events").schema
      val stream = graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "events.parquet"))
      val dim = eng(s).toDF(Seq(
        Seq("click", "engagement"), Seq("view", "engagement"),
        Seq("purchase", "revenue"), Seq("error", "ops")),
        "event_type:str,category:str")
      val joined = graft.streaming.Streaming
        .enrichWithStatic(stream, dim, Seq("event_type"), "left")
        .select("event_id", "event_type", "category")
      val name = "graft_q59_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(joined, name)
      s.table(name)
    }),

    // SQL-function registry differential: every injected function must
    // agree with its API-level expression on real data
    "q51_sql_functions" -> ((s, dir) => {
      GraftSession.registerFunctions(s)
      val e = eng(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val viaSql = e.sqlSelect(
        """SELECT doc_id, fingerprint64(text) AS fp,
          | simhash64(array(xxhash64(text))) AS sh,
          | shingle_hashes(text, 3) AS sg FROM documents""".stripMargin,
        Map("documents" -> docs))
      val viaApi = docs.select(col("doc_id"),
        graft.functions.expressions.VectorExpressions.fingerprint64(col("text")).as("fp"),
        graft.functions.expressions.VectorExpressions
          .simhash64(array(xxhash64(col("text")))).as("sh"),
        Dedup.shingleHashes(col("text"), 3).as("sg"))
      val dotSql = e.sqlSelect(
        """SELECT vec_id, vec_dot(vec_l2_normalize(embedding), vec_l2_normalize(embedding)) AS d
          |FROM embeddings""".stripMargin, Map("embeddings" -> emb))
      val dotApi = emb.select(col("vec_id"),
        graft.functions.Similarity.dot(
          graft.functions.Similarity.l2normalize(col("embedding")),
          graft.functions.Similarity.l2normalize(col("embedding"))).as("d"))
      val ok = graft.api.DfUtils.dfEq(viaSql, viaApi) &&
        graft.api.DfUtils.dfEq(dotSql, dotApi)
      e.toDF(Seq(Seq(if (ok) 1L else 0L)), "fns_ok:long")
    }),

    // streaming exact dedup: distinct-key output is order-independent, so
    // keep-first-arrival semantics still oracle against DISTINCT
    "q54_stream_dedup" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = t(s, dir, "events").schema
      val stream = graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "events.parquet"))
        .select("user_id", "event_type")
      val dd = graft.streaming.Streaming.dropDuplicatesStream(
        stream, Seq("user_id", "event_type"))
      val name = "graft_q54_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(dd, name, outputMode = "append")
      s.table(name)
    }),

    // streaming curation: PII redaction + quality filtering are pure
    // narrow expressions, so the SAME operators run unchanged over a
    // stream (no state, no watermark) — oracled by the q60 batch SQL
    "q61_stream_curation" -> ((s, dir) => {
      val batchSchema = t(s, dir, "documents").schema
      val stream = graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "documents.parquet"))
        .select(col("doc_id"), piiInjected.as("text"))
        .withColumn("text", TextFunctions.redactPii(col("text")))
      val kept = TextFunctions.qualityFilter(stream, "text",
        minTokens = 30, maxStopwordRatio = 0.4)
      val name = "graft_q61_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(kept, name, outputMode = "append")
      s.table(name)
    }),

    // exact join-size pre-flight: the count-aggregate computation must
    // equal the materialized join's cardinality — DuckDB materializes the
    // (skew-amplified) self-join to check, the Spark side never does
    "q79_join_size" -> ((s, dir) => {
      val e = events(s, dir)
      val size = graft.api.DfUtils.equiJoinSize(e, e, Seq("user_id"))
      eng(s).toDF(Seq(Seq(size)), "join_size:long")
    }),
    // duplicated-span diagnostic (exact-substring dedup family): stride-1
    // 3-token windows, corpus-wide occurrence counts — exact DuckDB
    // oracle regroups by the span STRING (Spark groups by its 64-bit
    // hash; identical modulo collisions)
    "t24_span_dedup" -> ((s, dir) =>
      Dedup.duplicateSpanStats(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 3, minCount = 2)),
    // exact-substring span REMOVAL (rewrite half of t24's diagnostic):
    // winner occurrence = lexicographically least (doc_id, pos), every
    // other occurrence masked — exact DuckDB oracle replays the whole
    // rewrite (frequency election, winner election, interval-union mask)
    // grouping by span STRING where Spark groups by its 64-bit hash
    "t25_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 3, minCount = 2)),
    // learned quality filter: logistic regression (MLlib LBFGS,
    // treeAggregate gradient passes) over the t01/t02 feature set, on a
    // margin-separated synthetic labeling (stopword_ratio vs 0.06 with a
    // 0.01 dead zone) — separable-with-margin data must train to >= 95%
    // accuracy on the training corpus; n_train is oracle-exact (DuckDB
    // recomputes the ratio and the margin filter bit-identically)
    "t26_quality_model" -> ((s, dir) => {
      import graft.functions.QualityModel
      val feats = QualityModel.withFeatures(
        t(s, dir, "documents").select("doc_id", "text"), "text")
      val labeled = feats
        .filter(abs(col("stopword_ratio") - 0.06) > 0.01)
        .withColumn("label", (col("stopword_ratio") > 0.06).cast("double"))
      val model = QualityModel.train(labeled)
      val scored = QualityModel.score(labeled, model)
      scored.agg(
        count(lit(1)).as("n_train"),
        (avg(when(col("quality_pred") === col("label"), 1.0).otherwise(0.0))
          >= 0.95).as("acc_ok"),
        min(col("quality_prob")).between(0.0, 1.0).as("prob_in_range"))
    }),
    // Unicode normalization over a deterministically decomposed corpus
    // (combining acute / ring appended to every doc) — DuckDB's
    // nfc_normalize oracles the NFC path exactly; the NFD and NFKC forms
    // are pinned per-row by round-trip (NFC∘NFD ≡ NFC) and a known
    // compatibility fold (U+FB01 'ﬁ' → "fi")
    "t27_normalize_unicode" -> ((s, dir) => {
      val dirty = concat(coalesce(col("text"), lit("")),
        lit(" cafe\u0301 A\u030A caf\u00E9"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalizeUnicode(dirty).as("norm_text"),
        (TextFunctions.normalizeUnicode(
          TextFunctions.normalizeUnicode(dirty, "NFD")) ===
          TextFunctions.normalizeUnicode(dirty)).as("nfd_roundtrip_ok"),
        (TextFunctions.normalizeUnicode(lit("\uFB01ne"), "NFKC") === "fine")
          .as("nfkc_ok"))
    }),
    // URL canonicalization over deterministically injected URLs covering
    // every branch: uppercase scheme/host + default port + mid-query
    // tracking param + fragment; first-position tracking param leaving an
    // empty path; non-http(s) scheme; no-scheme pass-through — exact
    // DuckDB oracle replays the identical anchored-RE2 chain
    "t28_url_canon" -> ((s, dir) => {
      val d = col("doc_id")
      val url = when(d % 4 === 0,
        concat(lit("HTTP://Site"), (d % 5).cast("string"),
          lit(".Example.ORG:80/a/b?utm_campaign=x&q="), d.cast("string"),
          lit("#top")))
        .when(d % 4 === 1, lit("https://cdn.example.net:443/?utm_source=a"))
        .when(d % 4 === 2,
          concat(lit("ftp://Files.example.com/data/"), d.cast("string")))
        .otherwise(concat(lit("  not a url "), d.cast("string"), lit("  ")))
      t(s, dir, "documents").select(col("doc_id"), url.as("url"),
        TextFunctions.canonicalizeUrl(url).as("canon_url"))
    }),
    // domain blocklist with suffix semantics (entry blocks host + every
    // subdomain, never a same-suffix lookalike) via the keyed double
    // anti-join — exact DuckDB oracle writes the predicate directly
    "t29_domain_blocklist" -> ((s, dir) => {
      val d = col("doc_id")
      val url = when(d % 4 === 0,
        concat(lit("https://site"), (d % 7).cast("string"),
          lit(".example.org/p/"), d.cast("string")))
        .when(d % 4 === 1, lit("http://cdn.example.net/img.jpg"))
        .when(d % 4 === 2, lit("https://keep.example.com/ok"))
        .otherwise(lit("https://notexample.net/a"))
      val docs = t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      val blocked = eng(s).toDF(
        Seq(Seq("example.net"), Seq("site3.example.org")), "domain:str")
      TextFunctions.filterBlockedDomains(docs, "url", blocked)
    }),
    // bigram LM cross-entropy (Laplace-smoothed conditional, self-trained)
    // — exact DuckDB oracle via the t12 decimal-bridge policy
    "t30_bigram_ce" -> ((s, dir) =>
      TextFunctions.bigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text")),
    // mojibake repair over a corpus corrupted end-to-end IN the query
    // (UTF-8 bytes re-read as Latin-1 via Spark's encode/decode, plus a
    // literal cp1252-class "â€™" artifact) — repair∘corrupt ≡ identity
    // gives a full DuckDB oracle: the expected output is just the
    // uncorrupted construction
    "t31_fix_mojibake" -> ((s, dir) => {
      val dirty = concat(coalesce(col("text"), lit("")),
        lit(" café ’quote’ €9"))
      val corrupted = concat(
        decode(encode(dirty, "UTF-8"), "ISO-8859-1"),
        lit(" â€™"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.fixMojibake(corrupted).as("repaired"),
        (corrupted =!= TextFunctions.fixMojibake(corrupted))
          .as("was_corrupted"))
    }),
    // HTML text extraction + link-density boilerplate stats over a
    // deterministically HTML-wrapped corpus: script/style subtrees with
    // bare `<`/`>` in code, comments, per-doc-varying nav anchors, the
    // `&amp;lt;` single-decode case, and an unknown `&copy;` passthrough —
    // exact DuckDB oracle replays the identical RE2 chain
    "t32_html_extract" -> ((s, dir) => {
      val d = col("doc_id")
      val html = concat(
        lit("<!DOCTYPE html><html><head><title>Doc "), d.cast("string"),
        lit("</title><style type=\"text/css\">body { color: #fff; }</style>" +
          "<script>var x = 1; if (x < 2) { x = \"a > b\"; }</script></head>" +
          "<body><nav class=\"menu\"><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About us</a>"),
        when(d % 3 === 0,
          lit(" <a href=\"/archive\">Archive of older posts</a>"))
          .otherwise(lit("")),
        lit("</nav><h1>Title &amp; intro &amp;lt;escaped&amp;gt;</h1><p>"),
        coalesce(col("text"), lit("")),
        lit("</p><!-- tracking --><div class=\"footer\">&copy; Example" +
          "&nbsp;Co &#39;quoted&#39; <a href=\"/contact\">Contact</a></div>" +
          "</body></html>"))
      TextFunctions.htmlTextStats(
        t(s, dir, "documents").select(d, html.as("html")), "doc_id", "html")
    }),
    // compression-ratio quality signal: DuckDB has no zlib, so the gate is
    // a law differential over the whole corpus — (1) natural text of
    // >=100 chars lands in (0, 1.1]; (2) a highly repetitive string
    // compresses strictly better than same-corpus hex noise; (3) self-
    // concatenation at least quarters off the ratio (the second copy is
    // one window back-reference); (4) the expression is deterministic
    // across two independent evaluations
    "t33_compression_ratio" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val docs = t(s, dir, "documents").filter(length(tcol) >= 100)
      def ratios(df: DataFrame) = df.select(col("doc_id"),
        TextFunctions.compressionRatio(tcol).as("r_text"),
        TextFunctions.compressionRatio(repeat(substring(tcol, 1, 10), 30))
          .as("r_rep"),
        TextFunctions.compressionRatio(concat(sha2(tcol, 256),
          sha2(concat(tcol, lit("1")), 256),
          sha2(concat(tcol, lit("2")), 256))).as("r_rnd"),
        TextFunctions.compressionRatio(concat(tcol, tcol)).as("r_dup"))
      val base = ratios(docs)
      val laws = base.agg(
        min((col("r_text") > 0 && col("r_text") <= 1.1 &&
          col("r_rep") < col("r_rnd") &&
          col("r_dup") < col("r_text") * 0.75).cast("long")).as("all_ok"),
        count(lit(1)).as("n")).collect().head
      val det = graft.api.DfUtils.dfEq(base, ratios(docs))
      eng(s).toDF(Seq(Seq(
        if (laws.getLong(0) == 1L && laws.getLong(1) > 0 && det) 1L else 0L)),
        "comp_ok:long")
    }),
    // CDC merge/upsert: deterministic change feed derived from orders —
    // deletes (%10=0), updates (%10 in 1,2), inserts (%10=3 under shifted
    // keys), with a same-key V1/V2 version race the election must resolve
    // toward the latest version — exact DuckDB oracle
    "q80_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val changes = base.filter(col("o_orderkey") % 10 <= 3)
        .select(
          when(col("o_orderkey") % 10 === 3, col("o_orderkey") + 10000000L)
            .otherwise(col("o_orderkey")).as("o_orderkey"),
          col("o_custkey"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
          lit("X").as("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, lit("D")).otherwise(lit("U")).as("op"),
          lit(2L).as("version"))
      // a stale V1 row per changed key that the election must discard
      val stale = changes.withColumn("version", lit(1L))
        .withColumn("o_totalprice", lit(-1.0))
      graft.operators.Upsert.upsert(base, changes.unionByName(stale),
        Seq("o_orderkey"), versionCol = Some("version"))
    }),
    // mergeable Misra-Gries heavy hitters over the per-language word
    // stream, self-verified against exact counts computed distributively:
    // the oracle pins the two guarantee counters at zero (heavy items
    // with count > err_bound missed by the sketch; estimate bounds
    // est <= count <= est + err_bound broken) and independently recomputes
    // the exact stream size and top word (ties -> min word)
    "q81_heavy_hitters" -> ((s, dir) => {
      import graft.functions.{Sketches, TextFunctions}
      val words = t(s, dir, "documents")
        .select(col("lang"),
          explode(TextFunctions.tokensOrEmpty(col("text"))).as("w"))
      val hh = Sketches.frequentItems(words, Seq("lang"), "w", k = 20)
      val exact = words.groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      val joined = exact.join(
        hh.select(col("lang"), col("item").as("w"), col("estimate"),
          col("err_bound")), Seq("lang", "w"), "left")
      val errByLang = hh.groupBy("lang").agg(
        max("err_bound").as("err"), max("n_rows").as("n_sketch"))
      joined.join(errByLang, "lang")
        .groupBy("lang").agg(
          sum("cnt").as("n_words"),
          min_by(col("w"), struct((col("cnt") * -1).as("nc"), col("w")))
            .as("top_w"),
          max("cnt").as("top_cnt"),
          sum(when(col("cnt") > col("err") && col("estimate").isNull, 1L)
            .otherwise(0L)).as("missed"),
          sum(when(col("estimate").isNotNull &&
              (col("estimate") > col("cnt") ||
                col("estimate") + col("err") < col("cnt")), 1L)
            .otherwise(0L)).as("violations"),
          (max("n_sketch") === sum("cnt")).as("n_consistent"))
    }),
    // Count-Min sketch: 8 per-shard partials merged on the driver (the
    // bounded sketch-space pattern, like IVF training) must (a) never
    // underestimate any exact count — CMS's deterministic one-sided
    // guarantee — and (b) agree EXACTLY with a direct whole-stream sketch
    // (counter addition is lossless, the CMS analogue of q73's HLL union)
    "q82_cms" -> ((s, dir) => {
      import graft.functions.Sketches
      val ev = events(s, dir)
        .filter(col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"))
      def sketchOf(partials: DataFrame) = Sketches.cmsMerge(
        partials.select("cms_sketch").collect().map(_.getAs[Array[Byte]](0)))
      val merged = sketchOf(Sketches.cmsPartial(
        ev.withColumn("shard", pmod(col("user_id"), lit(8))),
        Seq("shard"), "event_type"))
      val direct = sketchOf(Sketches.cmsPartial(
        ev.withColumn("g", lit(1)), Seq("g"), "event_type"))
      val rows = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .collect().toSeq.map { r =>
          val et = r.getString(0); val cnt = r.getLong(1)
          val est = Sketches.cmsEstimate(merged, et)
          Seq(et, cnt, est >= cnt, est == Sketches.cmsEstimate(direct, et))
        }
      eng(s).toDF(rows,
        "event_type:str,cnt:long,over_ok:bool,merge_agrees:bool")
    }),
    // weighted-sample law differential (Efraimidis–Spirakis): with 10% of
    // docs carrying 1000× weight, the top-20-per-lang sample must (a) be
    // seed-deterministic, (b) be a subset with exact per-key sizes
    // min(20, group size), (c) cover ≥80% of the heavy rows per lang —
    // a uniform sample would include heavy rows at ~their 10% base rate
    "q78_weighted_sample" -> ((s, dir) => {
      import graft.functions.Sampling
      val docs = t(s, dir, "documents")
        .withColumn("w", when(col("doc_id") % 10 === 0, 1000.0).otherwise(1.0))
      val s1 = Sampling.weightedTake(docs, Seq("lang"), Seq("doc_id"), "w",
        n = 20, seed = 7L)
      val s2 = Sampling.weightedTake(docs, Seq("lang"), Seq("doc_id"), "w",
        n = 20, seed = 7L)
      val det = graft.api.DfUtils.dfEq(s1, s2)
      val subset = s1.select("doc_id")
        .join(docs.select("doc_id"), "doc_id").count() == s1.count()
      val sizes = s1.groupBy("lang").agg(count(lit(1)).as("c"))
        .join(docs.groupBy("lang").agg(count(lit(1)).as("tot")), "lang")
        .agg(min(when(col("c") === least(lit(20), col("tot")), 1)
          .otherwise(0)).as("ok")).first().getInt(0) == 1
      val heavy = s1.filter(col("w") === 1000.0)
        .groupBy("lang").agg(count(lit(1)).as("h"))
        .join(docs.filter(col("w") === 1000.0)
          .groupBy("lang").agg(count(lit(1)).as("ht")), "lang")
        .agg(min(when(col("h") >= ceil(least(col("ht"), lit(20)) * 0.8), 1)
          .otherwise(0)).as("ok")).first().getInt(0) == 1
      eng(s).toDF(Seq(Seq(if (det && subset && sizes && heavy) 1L else 0L)),
        "sample_ok:long")
    }),
    // streaming session windows: native session_window aggregation over
    // the event stream, oracled by the SAME gap-sessionization SQL the
    // batch q39 uses (boundary: Spark opens a NEW session at
    // ts >= prev + gap, so the oracle marks with >=, not >)
    "q77_stream_session" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = t(s, dir, "events").schema
      val stream = normalizeEventTs(graft.streaming.Streaming
        .loadStream(s, dir, batchSchema,
          options = Map("pathGlobFilter" -> "events.parquet")))
      val agg = graft.streaming.Streaming.sessionAgg(stream, "ts",
        watermarkDelay = "1 minute", gap = "30 minutes",
        groupBy = Seq("user_id"),
        aggs = Seq(count(lit(1)).as("n_events")))
      val name = "graft_q77_" + java.util.UUID.randomUUID().toString.take(8)
      graft.streaming.Streaming.runToMemory(agg, name, outputMode = "complete")
      s.table(name).select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))
    }),

    // ---- temporal operators -------------------------------------------
    // batch resample: 15-minute epoch-aligned buckets per event type —
    // bucket identity is integer epoch arithmetic, reproduced exactly
    "q96_resample" -> ((s, dir) =>
      graft.operators.TemporalOps.resample(events(s, dir), "ts", 900,
        Seq("event_type"),
        Seq(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total")))),
    // rolling trailing-hour aggregate per user, RANGE frame over truncated
    // epoch seconds on both engines (peers at the same second included)
    "q97_rolling" -> ((s, dir) =>
      graft.operators.TemporalOps.rollingAggregate(events(s, dir), "ts", 3600,
        Seq("user_id"),
        Seq("n_1h" -> count(lit(1)),
          "total_1h" -> sum(col("value").cast("decimal(18,2)"))))
        .select(col("event_id"), col("user_id"), col("n_1h"),
          col("total_1h").cast("double").as("total_1h"))),
    "q38_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("prior_purchase_id"),
          col("value").as("prior_purchase_value"))
      graft.operators.TemporalOps.asofJoin(clicks, purchases,
        keys = Seq("user_id"), tsCol = "ts",
        tieBreak = Seq("prior_purchase_id"))
        .select("event_id", "user_id", "prior_purchase_id", "prior_purchase_value")
    }),
    "q39_sessionize" -> ((s, dir) => {
      val e = events(s, dir)
      graft.operators.TemporalOps.sessionize(e, Seq("user_id"), "ts",
        "30 minutes", tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
    }),
    // binned interval-overlap join: purchase windows × error windows with
    // bin-ownership dedup (each overlapping pair joins in exactly one bin)
    "q65_interval_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("ps"),
          (col("ts") + expr("INTERVAL 20 MINUTES")).as("pe"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts").as("es"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("ee"))
      graft.operators.TemporalOps.intervalJoin(purchases, errors,
        "ps", "pe", "es", "ee", binWidth = 900.0)
        .select("p_id", "e_id")
    }),
    // binned point-in-interval range join (NO equi-key: the bin keys alone
    // carry the join, where bare Spark would nested-loop) — every event
    // paired with every 30-minute purchase window containing it
    "q64_range_join" -> ((s, dir) => {
      val e = events(s, dir)
      val pts = e.select(col("event_id"), col("ts"))
      val wins = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("win_end"))
      graft.operators.TemporalOps.rangeJoin(pts, wins, "ts", "win_start",
        "win_end", binWidth = 1800.0)
        .select("event_id", "win_id")
    }),

    // semi-structured parsing: JSON props column → typed field, grouped
    "q67_json_props" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))),
    // pivot: per-user event counts spread across event-type columns
    "q68_pivot" -> ((s, dir) =>
      events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        // scoped fill: an unqualified na.fill would also rewrite a null
        // GROUP KEY to 0, silently merging it with the real user 0
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))),

    // unpivot (melt): the inverse of q68 — event-type count columns back
    // to (user_id, event_type, n) long format via the Dataset unpivot API
    "q72_unpivot" -> ((s, dir) => {
      val wide = events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
      wide.unpivot(Array(col("user_id")),
        Array(col("click"), col("view"), col("purchase"), col("signup"),
          col("error")),
        "event_type", "n")
    }),

    // mergeable cardinality summaries: per-(key, ingest shard) HLL
    // partials merged WITHOUT rescanning — the incremental pattern for
    // distinct-user tracking at 100 TB. Differentials: (a) the union is
    // ASSOCIATIVE — a hierarchical rollup (shards → halves → corpus)
    // yields the IDENTICAL estimate to the flat merge, so any ingest
    // grouping agrees (byte-equality vs a direct whole-table sketch is
    // deliberately NOT asserted: past the sparse→dense transition the
    // direct sketch takes a different promotion path and may differ
    // inside the error envelope — caught by the sf0.1 full gate),
    // (b) every merged estimate is within 5% of the exact distinct
    // count (rsd ≈ 1.6% at lgK=12); n_keys is oracle-exact
    "q73_sketch_merge" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("shard", pmod(col("event_id"), lit(8)))
      val partials = Sketches.hllPartial(ev, Seq("event_type", "shard"), "user_id")
      val flat = Sketches.hllMergeEstimate(partials, Seq("event_type"))
      val hier = Sketches.hllMergeEstimate(
        Sketches.hllMergePartial(
          partials.withColumn("half", pmod(col("shard"), lit(2))),
          Seq("event_type", "half")),
        Seq("event_type")).withColumnRenamed("estimate", "hier")
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact"))
      flat.join(exact, "event_type").join(hier, "event_type")
        .agg(
          min(when(col("estimate") === col("hier"), 1).otherwise(0))
            .as("ma"),
          min(when(abs(col("estimate") - col("exact")) <=
            col("exact") * 0.05, 1).otherwise(0)).as("bo"),
          count(lit(1)).as("nk"))
        .select(col("ma").cast("bigint").as("merge_agrees"),
          col("bo").cast("bigint").as("bound_ok"),
          col("nk").cast("bigint").as("n_keys"))
    }),
    // streaming incremental sketch maintenance: the input is pre-sharded
    // (a simulated multi-day ingest), each micro-batch appends its HLL
    // partials to a sketch store via foreachBatch. Laws: merging the
    // stored per-batch partials is ASSOCIATIVE (batch-parity rollup ==
    // flat merge — any maintenance schedule agrees) and the incremental
    // estimate stays within the lgK accuracy bound of the exact distinct
    // count. (Byte-equality vs a direct batch sketch is NOT asserted —
    // see q73.) The only driver-side value is the micro-batch count
    "q75_stream_sketch" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = events(s, dir).select("event_type", "user_id")
      val base = java.nio.file.Files.createTempDirectory("graft_q75_").toString
      val (inDir, outDir, ck) = (s"$base/in", s"$base/out", s"$base/ck")
      ev.repartition(6).write.mode("overwrite").parquet(inDir)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      graft.streaming.Streaming.foreachBatchSink(stream, ck) { (batch, id) =>
        if (!batch.isEmpty)
          Sketches.hllPartial(batch, Seq("event_type"), "user_id")
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
      }
      val partials = s.read.parquet(outDir)
      val merged = Sketches.hllMergeEstimate(partials, Seq("event_type"))
      val hier = Sketches.hllMergeEstimate(
        Sketches.hllMergePartial(
          partials.withColumn("par", pmod(col("batch_id"), lit(2))),
          Seq("event_type", "par")),
        Seq("event_type")).withColumnRenamed("estimate", "hier")
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact"))
      val nBatches = partials.select(countDistinct(col("batch_id")))
        .first().getLong(0)
      merged.join(hier, "event_type").join(exact, "event_type")
        .agg(min(when(col("estimate") === col("hier") &&
            abs(col("estimate") - col("exact")) <= col("exact") * 0.05, 1)
          .otherwise(0)).as("ma"), count(lit(1)).as("nk"))
        .select(col("ma").cast("bigint").as("merge_agrees"),
          (lit(nBatches) >= 2).cast("bigint").as("multi_batch"),
          col("nk").cast("bigint").as("n_keys"))
    }),
    // streaming incremental heavy hitters: per-micro-batch Misra-Gries
    // partials appended by foreachBatch, merged sketch-space at read time
    // (the q75 pattern for MG). The merged result must keep MG's
    // deterministic guarantees vs exact counts computed over the SAME
    // stream: zero heavy items (count > err_bound) missed, zero estimate
    // bounds broken, exact n_rows per key — all oracle-pinned
    "q83_stream_heavy_hitters" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = events(s, dir).select("event_type", "user_id")
        .withColumn("user_id", col("user_id").cast("string"))
      val base = java.nio.file.Files.createTempDirectory("graft_q83_").toString
      val (inDir, outDir, ck) = (s"$base/in", s"$base/out", s"$base/ck")
      ev.repartition(6).write.mode("overwrite").parquet(inDir)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      graft.streaming.Streaming.foreachBatchSink(stream, ck) { (batch, id) =>
        if (!batch.isEmpty)
          Sketches.frequentItemsPartial(batch, Seq("event_type"), "user_id",
            k = 30)
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
      }
      val partials = s.read.parquet(outDir)
      val nBatches = partials.select(countDistinct(col("batch_id")))
        .first().getLong(0)
      val hh = Sketches.frequentItems(partials.drop("batch_id"),
        Seq("event_type"))
      val exact = ev.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
      val joined = exact.join(
        hh.select(col("event_type"), col("item").as("user_id"),
          col("estimate"), col("err_bound")), Seq("event_type", "user_id"),
        "left")
      val errByKey = hh.groupBy("event_type").agg(
        max("err_bound").as("err"), max("n_rows").as("n_sketch"))
      joined.join(errByKey, "event_type")
        .groupBy("event_type").agg(
          sum("cnt").as("n_rows"),
          sum(when(col("cnt") > col("err") && col("estimate").isNull, 1L)
            .otherwise(0L)).as("missed"),
          sum(when(col("estimate").isNotNull &&
              (col("estimate") > col("cnt") ||
                col("estimate") + col("err") < col("cnt")), 1L)
            .otherwise(0L)).as("violations"),
          (max("n_sketch") === sum("cnt")).as("n_consistent"),
          lit(nBatches >= 2).as("multi_batch"))
    }),
    // streaming ingestion dedup: micro-batches are deduplicated
    // within-batch (exact n-gram jaccard components) then against the
    // accumulated survivor index before appending — d14's incremental
    // pattern under continuous arrival. The oracle pins the
    // order-INDEPENDENT laws: survivors are pairwise clean (no >= 0.5
    // jaccard pair survives), every dropped doc has a near-dup partner in
    // the corpus (it was dropped FOR something), and the exact corpus size
    "q84_stream_ingest_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_q84_").toString
      val (inDir, outDir, ck) = (s"$base/in", s"$base/out", s"$base/ck")
      docs.repartition(5).write.mode("overwrite").parquet(inDir)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val outPath = new org.apache.hadoop.fs.Path(outDir)
      graft.streaming.Streaming.foreachBatchSink(stream, ck) { (batch, _) =>
        if (!batch.isEmpty) {
          val pairs = Dedup.ngramJaccardJoin(batch, "doc_id", "text",
            batch, "doc_id", "text", shingleK = 3, threshold = 0.5)
            .filter(col("id_a") < col("id_b"))
          val internal = Dedup.dropNearDuplicates(batch, "doc_id", pairs)
          val survivors =
            if (fs.exists(outPath))
              Dedup.dropNearDuplicatesAgainst(internal, "doc_id", "text",
                s.read.parquet(outDir), "doc_id", "text",
                shingleK = 3, threshold = 0.5)
            else internal
          survivors.write.mode("append").parquet(outDir)
        }
      }
      val surv = s.read.parquet(outDir)
      val dropped = docs.join(surv.select("doc_id"), Seq("doc_id"),
        "left_anti")
      val survDirty = Dedup.ngramJaccardJoin(surv, "doc_id", "text",
        surv, "doc_id", "text", shingleK = 3, threshold = 0.5)
        .filter(col("id_a") =!= col("id_b")).limit(1).count() > 0
      val uncovered = dropped.join(
        Dedup.ngramJaccardJoin(dropped, "doc_id", "text",
          docs, "doc_id", "text", shingleK = 3, threshold = 0.5)
          .filter(col("id_a") =!= col("id_b"))
          .select(col("id_a").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").limit(1).count() > 0
      eng(s).toDF(Seq(Seq(docs.count(), !survDirty, !uncovered)),
        "n_docs:long,survivors_clean:bool,dropped_covered:bool")
    }),
    // schema-evolution read: two parquet batches with DIFFERENT schemas
    // (v2 adds columns) reconciled by the engine's load with
    // mergeSchema — v1 rows surface NULLs for the added columns; exact
    // DuckDB oracle recomputes the reconciled aggregate from the split
    "q85_schema_evolution" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_q85_").toString
      val orders = t(s, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/d")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .write.mode("append").parquet(s"$base/d")
      eng(s).load(s"$base/d", "parquet",
          options = Map("mergeSchema" -> "true"))
        .groupBy(coalesce(col("o_orderstatus"), lit("<v1>"))
          .as("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
    }),
    // size-targeted compaction: content identity is the oracle; the file
    // count law (fragmented shrinks toward target, compact left alone)
    // is asserted in ApiSpec
    "q86_compact" -> ((s, dir) => {
      val frag = t(s, dir, "orders").repartition(64)
      graft.operators.Layout.compact(frag, targetBytes = 8L << 20)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    }),
    // jinja-class templating end-to-end: {% for %} builds the IN list,
    // {% if %} gates the extra predicate — the RENDERED pipeline runs
    // through the full dialect and is oracled as plain SQL (the reference
    // renders FugueSQL through jinja2, fugue/sql/_utils.py:13-41)
    "q87_sql_template" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        """res = SELECT r_regionkey, r_name FROM region
          | WHERE r_name IN ({% for n in names %}'{{ n }}'{% if not loop.last %}, {% endif %}{% endfor %})
          | {%- if min_key >= 0 %} AND r_regionkey >= {{ min_key }}{% endif %}
          |YIELD res AS out
          |""".stripMargin,
        Map("region" -> t(s, dir, "region")),
        vars = Map("names" -> Seq("ASIA", "EUROPE", "AFRICA"),
          "min_key" -> 1L)).yields("out")
    }),
    // the r10 template surface end-to-end through the FugueSQL front end
    // (the q87 pattern, widened): a for-if loop over dicts selects the
    // enabled bands, a macro renders each aggregate, a namespace counts
    // what was emitted, a filter block shapes an alias, and an is-defined
    // ternary gates the default band — all rendering to STATIC SQL, so
    // the oracle is the fully-expanded DuckDB text
    "q120_template_advanced" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        """{% macro band(lo, hi) %}sum(CASE WHEN o_totalprice >= {{ lo }} AND o_totalprice < {{ hi }} THEN 1 ELSE 0 END) AS {% filter trim %} band_{{ lo }} {% endfilter %}{% endmacro %}
          |{% set ns = namespace(k=0) %}
          |res = SELECT o_orderpriority,
          | {% for b in bands if b.on %}{{ band(b.lo, b.hi) }}, {% set ns.k = ns.k + 1 %}{% endfor %}
          | {{ band(0, fallback_hi if fallback_hi is defined else 50000) }},
          | CAST({{ ns.k }} AS BIGINT) AS n_bands,
          | count(*) AS n
          |FROM orders GROUP BY o_orderpriority
          |YIELD res AS out
          |""".stripMargin,
        Map("orders" -> t(s, dir, "orders")),
        vars = Map("bands" -> Seq(
          Map("lo" -> 100000L, "hi" -> 200000L, "on" -> true),
          Map("lo" -> 200000L, "hi" -> 300000L, "on" -> false),
          Map("lo" -> 300000L, "hi" -> 400000L, "on" -> true)))).yields("out")
    }),

    // {% set %} + {% macro %} templating through the FugueSQL front end
    // (the jinja construct classes round 6 lacked): a macro builds the
    // projection, a set-assembled predicate gates the WHERE. FULL oracle:
    // the rendered SQL is static
    "q87b_sql_template_set" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        """{% macro proj(key, name) %}{{ key }}, {{ name }}{% endmacro %}
          |{% set lo = base_key + 1 %}
          |{% set hi = lo * 2 %}
          |res = SELECT {{ proj('n_nationkey', 'n_name') }} FROM nation
          | WHERE n_nationkey >= {{ lo }} AND n_nationkey < {{ hi }}
          |YIELD res AS out
          |""".stripMargin,
        Map("nation" -> t(s, dir, "nation")),
        vars = Map("base_key" -> 4L)).yields("out")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"))
    }),
    // mergeable quantile summary: percentile_approx (KLL-style, bounded
    // rank error ≤ n/accuracy). Differential: the ACTUAL rank of each
    // reported p50/p95 must sit within twice the guarantee of the target
    // rank per event_type (2× absorbs boundary ties); n_keys oracle-exact
    "q74_quantile_sketch" -> ((s, dir) => {
      val acc = 1000
      val ev = events(s, dir)
      val qs = ev.groupBy("event_type").agg(
        percentile_approx(col("value"), lit(0.5), lit(acc)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(acc)).as("p95"),
        count(lit(1)).as("n"))
      ev.join(qs, "event_type")
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("r95"),
          first(col("n")).as("n"))
        .agg(min(when(
          abs(col("r50") - col("n") * 0.5) <= col("n") * 2.0 / acc + 2 &&
            abs(col("r95") - col("n") * 0.95) <= col("n") * 2.0 / acc + 2,
          1).otherwise(0)).as("qo"), count(lit(1)).as("nk"))
        .select(col("qo").cast("bigint").as("quantile_ok"),
          col("nk").cast("bigint").as("n_keys"))
    }),

    // Z-order layout: Morton clustering over (user_id, value) — content
    // must be EXACTLY preserved (the oracle is the identity projection;
    // the checker's order-insensitive compare proves reordering lost and
    // invented nothing). Locality itself is pinned by the spec's
    // per-partition span assertion and the SCALE.md skipping measurement
    "q76_zorder_layout" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "value")
      graft.operators.Layout.zorderBy(ev, Seq("user_id", "value"),
        bits = 6, numPartitions = Some(16))
    }),

    // ---- SQL passthrough breadth (same text on Spark and DuckDB) ------
    "q32_rollup" -> ((s, dir) =>
      eng(s).sqlSelect(SqlRollup, Map("orders" -> t(s, dir, "orders")))),
    "q33_running_window" -> ((s, dir) =>
      eng(s).sqlSelect(SqlRunning, Map("lineitem" -> t(s, dir, "lineitem")))),
    "q34_exists_subquery" -> ((s, dir) =>
      eng(s).sqlSelect(SqlExists, Map(
        "customer" -> t(s, dir, "customer"), "orders" -> t(s, dir, "orders")))),
    "q35_string_date_fns" -> ((s, dir) =>
      eng(s).sqlSelect(SqlStringDate, Map("orders" -> t(s, dir, "orders")))),
    "q36_case_in" -> ((s, dir) =>
      eng(s).sqlSelect(SqlCaseIn, Map("part" -> t(s, dir, "part")))),
    "q55_percentile" -> ((s, dir) =>
      eng(s).sqlSelect(SqlPercentile, Map("orders" -> t(s, dir, "orders")))),
    "q70_window_suite" -> ((s, dir) =>
      eng(s).sqlSelect(SqlWindowSuite, Map("orders" -> t(s, dir, "orders")))),
    "q71_cube" -> ((s, dir) =>
      eng(s).sqlSelect(SqlCube, Map("orders" -> t(s, dir, "orders")))),
    "q56_ntile" -> ((s, dir) =>
      // DfUtils.ntile: identical output to `ntile(4) OVER (ORDER BY ...)`
      // (the DuckDB oracle) but via the distributed prefix sum — no
      // single-partition window exchange (100 TB path; the window form
      // remains available through plain Spark SQL for small frames)
      graft.api.DfUtils.ntile(
        t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        4, Seq("o_totalprice", "o_orderkey"), outCol = "quartile")
        .select("o_orderkey", "quartile")),

    // ---- FugueSQL dialect statement families --------------------------
    // ZIP + TRANSFORM-on-zipped (cotransformer) — same semantics as q24
    "q40_sql_zip" -> ((s, dir) => {
      import graft.sql.GraftSql
      val exts = GraftSql.Extensions(cotransformers = Map(
        "pair_counts" -> GraftSql.CoTransformerDef(
          outputSchema = (_, _, _) => graft.schema.SchemaExpr.parse(
            "o_orderkey:long,n_orders:long,n_items:long"),
          fn = (k, ls, rs, _) =>
            Iterator.single(Row(k.head, ls.size.toLong, rs.size.toLong)))))
      GraftSql.runWith(eng(s),
        """o = SELECT o_orderkey FROM orders
          |l = SELECT l_orderkey AS o_orderkey FROM lineitem
          |z = ZIP o, l FULL OUTER BY o_orderkey
          |TRANSFORM z USING pair_counts
          |YIELD AS out
          |""".stripMargin,
        Map("orders" -> t(s, dir, "orders"), "lineitem" -> t(s, dir, "lineitem")),
        exts).yields("out")
    }),
    // CREATE literal data
    "q41_sql_create" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        """CREATE [[0, "x"], [1, "y"], [2, NULL]] SCHEMA a:long,b:str
          |YIELD AS out
          |""".stripMargin).yields("out")
    }),
    // catalog table IO round-trip
    "q42_table_io" -> ((s, dir) => {
      val e = eng(s)
      dropTableAndLocation(s, "graft_q42_nation")
      e.saveTable(t(s, dir, "nation"), "graft_q42_nation")
      require(e.tableExists("graft_q42_nation"))
      e.loadTable("graft_q42_nation")
    }),
    // SAVE AND USE + LOAD with params
    "q43_sql_save_use" -> ((s, dir) => {
      graft.sql.GraftSql.run(eng(s),
        s"""LOAD PARQUET "$dir/nation.parquet"
           |n2 = SAVE AND USE OVERWRITE PARQUET "/root/repo/target/tmp/q43_nation"
           |YIELD n2 AS out
           |""".stripMargin).yields("out")
    }),
    // checkpoint keywords + YIELD FILE. The checkpoint namespace carries a
    // cheap data fingerprint (file length): deterministic checkpoints are
    // content-addressed by PLAN, so a regenerated-but-differently-sized
    // input must not be served a stale round's parquet.
    "q44_sql_checkpoint" -> ((s, dir) => {
      val fp = new java.io.File(s"$dir/orders.parquet").length()
      graft.sql.GraftSql.run(eng(s),
        s"""SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000
           |WEAK CHECKPOINT LAZY
           |DETERMINISTIC CHECKPOINT "q44_$fp"
           |YIELD FILE AS out
           |""".stripMargin,
        Map("orders" -> t(s, dir, "orders"))).yields("out")
    }),
    // workflow DAG end-to-end: nodes + deterministic checkpoint, oracled
    "q53_workflow" -> ((s, dir) => {
      val e = eng(s)
      val fp = new java.io.File(s"$dir/orders.parquet").length()
      val w = new graft.workflow.Workflow(e,
        checkpointDir = s"/tmp/graft_checkpoints/q53_$fp")
      w.load(s"$dir/orders.parquet")
        .filter(col("o_totalprice") > 150000)
        .aggregate(Seq("o_orderstatus"), Seq(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
          count(lit(1)).as("n")))
        .deterministicCheckpoint()
        .yield_("out")
      w.run()("out")
    }),

    // ---- beyond-reference: full dedup pipeline ------------------------
    "d06_dedup_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // shared signature stage: the shingle+minhash pass materializes once
      // per session and is reused by d02 (and any other dedup flavor)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val pairs = Dedup.minhashNearDupPairsFromSigs(sigs, threshold = 0.5)
      Dedup.dropNearDuplicates(docs, "doc_id", pairs).select("doc_id", "lang")
    }),
  )

  private def withNulls(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
      nullif(col("event_type"), lit("error")).as("etype"),
      when(col("value") < 5, lit(null)).otherwise(col("value")).as("val"))

  private val SqlRevenuePerNation =
    """SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      | CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  private val SqlRollup =
    """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  // window-function breadth in one pass: rank family, offsets with
  // defaults, distribution functions, frame-bounded min. The decimal
  // bridge keeps the single SUM deterministic; percent_rank/cume_dist
  // are exact rationals of counts (identical on both engines).
  private val SqlWindowSuite =
    """SELECT o_orderkey,
      | CAST(row_number() OVER w AS BIGINT) AS rn,
      | CAST(rank() OVER w AS BIGINT) AS rnk,
      | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      | CAST(lag(o_orderkey, 1, -1) OVER w AS BIGINT) AS prev_key,
      | CAST(lead(o_orderkey, 2, -1) OVER w AS BIGINT) AS next2_key,
      | first_value(o_orderstatus) OVER w AS first_status,
      | percent_rank() OVER w AS pr,
      | cume_dist() OVER w AS cd,
      | CAST(min(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS min3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin

  // grouping-sets breadth: CUBE with grouping() disambiguation of real
  // NULL keys vs subtotal rows
  private val SqlCube =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
      | CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ORDER BY includes l_quantity: the synthetic lineitem has duplicate
  // (l_orderkey, l_linenumber) rows (observed at sf0.1: two rows sharing
  // suppkey+orderkey+linenumber+shipdate with different quantities), so
  // the shorter key is not total and the running sum would be
  // tie-arbitrary ON BOTH ENGINES (DuckDB itself flips between
  // evaluations). With l_quantity as the final tiebreak, any remaining
  // ties have equal quantities and identical prefix sums either way.
  private val SqlRunning =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |   PARTITION BY l_suppkey
      |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem""".stripMargin

  private val SqlExists =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      | WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin

  private val SqlStringDate =
    """SELECT o_orderkey, upper(o_orderstatus) AS status_u,
      | substr(o_orderpriority, 1, 1) AS prio1,
      | CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      | CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start
      |FROM orders""".stripMargin

  private val SqlCaseIn =
    """SELECT p_partkey,
      | CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium'
      |  ELSE 'large' END AS size_class,
      | p_brand IN ('Brand#1', 'Brand#2') AS is_top
      |FROM part""".stripMargin

  private val SqlPercentile =
    """SELECT o_orderstatus,
      | CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS median_price,
      | CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p90_price
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  private val SqlNtile =
    """SELECT o_orderkey,
      | CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
      |FROM orders""".stripMargin

  private val SqlTopOrders =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
      | FROM orders) x WHERE rk <= 2""".stripMargin

  // -------------------------------------------------------------------
  // DuckDB oracles. Column names/types must match the Spark results:
  // count(*)→BIGINT matches Spark long; len/length are cast to INTEGER to
  // match Spark's int; decimal-sums cast to DOUBLE are order-independent.
  // -------------------------------------------------------------------
  /** Deterministic synthetic PII injection (the corpus has none) — shared
   * by the t07/q60 queries; [[SqlInjectedPii]] is its DuckDB twin. */
  private def piiInjected: org.apache.spark.sql.Column =
    concat(col("text"),
      lit(" reach user"), col("doc_id").cast("string"),
      lit("@mail.example.com or 192.168."),
      (col("doc_id") % 200).cast("string"),
      lit(".7 ssn 123-45-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" card 4111 1111 1111 1111 tel 555-867-5309"))

  /** Deterministic dirty-text injection (zero-widths, control chars, CRLF,
   * NBSP runs, BOM) for the t18 cleaning conformance query;
   * [[SqlInjectedDirty]] is its chr()-built DuckDB twin. */
  private def dirtyInjected: org.apache.spark.sql.Column =
    // coalesce mirrors t22: Spark concat is null-on-any-null while DuckDB
    // concat skips NULLs, so a NULL text row would diverge otherwise
    concat(lit("\u200B \u00A0"), coalesce(col("text"), lit("")),
      lit("\u0007 tail\u00A0\u00A0mid\r\nend \t\t x\uFEFF"))

  private val SqlInjectedDirty =
    "concat(chr(8203), ' ', chr(160), coalesce(text, ''), chr(7), ' tail', chr(160)," +
      " chr(160), 'mid', chr(13), chr(10), 'end ', chr(9), chr(9)," +
      " ' x', chr(65279))"

  private def sqlCleaned(expr: String): String =
    "trim(" + graft.functions.TextFunctions.CleanPatterns.foldLeft(expr) {
      case (e, (re, repl)) => s"regexp_replace($e, '$re', '$repl', 'g')"
    } + ")"

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** DuckDB twin of [[graft.functions.TextFunctions.extractHtmlText]]:
   * folds the shared [[graft.functions.TextFunctions.HtmlPatterns]] chain,
   * then whitespace-collapses and trims — byte-identical by construction. */
  private def sqlHtmlText(expr: String): String = {
    val folded = graft.functions.TextFunctions.HtmlPatterns.foldLeft(expr) {
      case (e, (re, repl)) =>
        s"regexp_replace($e, '${sqlQuote(re)}', '${sqlQuote(repl)}', 'g')"
    }
    s"trim(regexp_replace($folded, '\\s+', ' ', 'g'))"
  }

  private val SqlInjectedPii =
    "concat(text, ' reach user', CAST(doc_id AS VARCHAR)," +
      " '@mail.example.com or 192.168.', CAST(doc_id % 200 AS VARCHAR)," +
      " '.7 ssn 123-45-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')," +
      " ' card 4111 1111 1111 1111 tel 555-867-5309')"

  private def sqlRedacted(expr: String): String =
    graft.functions.TextFunctions.PiiPatterns.foldLeft(expr) {
      case (e, (re, repl)) => s"regexp_replace($e, '$re', '$repl', 'g')"
    }

  /** One oracle for the curation pipeline, shared by its batch (q60) and
   * streaming (q61) conformance queries so they cannot drift. Defined
   * lazily: it interpolates [[SqlNTokens]]/[[SqlStopwordRatio]] below. */
  private lazy val SqlCurationOracle =
    s"""WITH base AS (
      | SELECT doc_id, ${sqlRedacted(SqlInjectedPii)} AS text FROM documents)
      |SELECT doc_id, text FROM base
      |WHERE ($SqlNTokens) >= 30 AND ($SqlStopwordRatio) <= 0.4""".stripMargin

  // shared oracle fragments: tokenization and stopword-ratio SQL used by
  // several text-metric oracles — one definition so they cannot drift
  private val SqlNTokens =
    """CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
      |   ELSE len(string_split_regex(trim(text), '\s+')) END""".stripMargin
  private val SqlStopwordRatio =
    """CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
      |   THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |     t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'))) AS DOUBLE)
      |     / len(string_split_regex(trim(text), '\s+'))
      |   ELSE 0.0 END""".stripMargin

  def oracleSql: Map[String, String] =
    baseOracleSql ++ TpchSuite.sql.map { case (n, q) => s"${n}_tpch" -> q }

  private lazy val baseOracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter" ->
      "SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01' AND l_quantity > 30",
    "q03_select_having" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1996-12-31'
        |GROUP BY l_returnflag
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 1000""".stripMargin,
    "q04_assign" ->
      """SELECT l_orderkey, l_linenumber, lower(l_returnflag) AS l_returnflag,
        | l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem""".stripMargin,
    "q05_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q06_join_inner" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q07_join_left" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        | ON o.o_custkey = c.c_custkey""".stripMargin,
    "q08_join_right" ->
      """SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey,
        | o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        | c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
        | RIGHT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q09_join_full" ->
      """SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey,
        | o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        | c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
        | FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        | ON o.o_custkey = c.c_custkey""".stripMargin,
    "q10_join_semi" ->
      """SELECT c_custkey AS o_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q11_join_anti" ->
      """SELECT c_custkey AS o_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q12_join_cross" ->
      "SELECT * FROM region CROSS JOIN nation",
    "q45_join_multi" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment, n.n_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "q48_bucketed_join" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q49_skew_join" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q46_persist" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q47_broadcast" ->
      """SELECT o.*, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "q13_union" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 3000
        |UNION
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 7000""".stripMargin,
    "q14_union_all" ->
      """SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000""".stripMargin,
    "q15_except" ->
      """SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 3000
        |EXCEPT
        |SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 7000""".stripMargin,
    "q16_intersect" ->
      """SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 3000
        |INTERSECT
        |SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal < 7000""".stripMargin,
    "q17_dropna" ->
      """SELECT * FROM (
        | SELECT event_id, user_id, nullif(event_type,'error') AS etype,
        |  CASE WHEN value < 5 THEN NULL ELSE value END AS val FROM events) x
        |WHERE etype IS NOT NULL AND val IS NOT NULL""".stripMargin,
    "q18_fillna" ->
      """SELECT event_id, user_id,
        | COALESCE(nullif(event_type,'error'), 'unknown') AS etype,
        | COALESCE(CASE WHEN value < 5 THEN NULL ELSE value END, 0.0) AS val
        |FROM events""".stripMargin,
    "q19_take_global" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events ORDER BY ts DESC, event_id LIMIT 10""".stripMargin,
    "q20_take_per_key" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
        | FROM events) x WHERE rn <= 3""".stripMargin,
    "q22_sql" -> SqlRevenuePerNation,
    "q31_sql_window" -> SqlTopOrders,
    "q23_transform" ->
      """SELECT DISTINCT user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_events,
        | first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event_id,
        | last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event_type
        |FROM events WINDOW w AS (PARTITION BY user_id)""".stripMargin,
    "q24_comap" ->
      """SELECT COALESCE(o.k, l.k) AS o_orderkey, COALESCE(o.n, 0) AS n_orders,
        | COALESCE(l.n, 0) AS n_items
        |FROM (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) l
        | ON o.k = l.k""".stripMargin,
    "q25_alter" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name,
        | CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,
    "q26_rename_drop" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag AS flag FROM lineitem",
    "q27_csv_roundtrip" -> "SELECT * FROM nation",
    "q28_json_roundtrip" -> "SELECT * FROM region",
    "q29_repartition" -> "SELECT * FROM lineitem",
    "q30_even_repartition" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events",
    "d01_dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
        | SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        | FROM documents) x WHERE rn = 1""".stripMargin,
    "d04_dedup_ngram" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/(sa+sb-inter) AS jaccard
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.5""".stripMargin,
    "s01_knn_brute" ->
      """SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
        | FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 10) q
        | WHERE e.vec_id <> q.vec_id) x WHERE rank <= 5""".stripMargin,
    "t02_tokens_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS n_chars,
        | CAST(CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
        |   ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS n_tokens,
        | CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS INTEGER) AS n_punct,
        | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits,
        | CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |   t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'))) AS INTEGER) AS n_stopwords,
        | CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
        |   THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |     t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'))) AS DOUBLE)
        |     / len(string_split_regex(trim(text), '\s+'))
        |   ELSE 0.0 END AS stopword_ratio,
        | CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
        |   THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |     / len(string_split_regex(trim(text), '\s+'))
        |   ELSE 0.0 END AS mean_word_len
        |FROM documents""".stripMargin,
    "q54_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q50_stream_window" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
        | event_type, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "t04_pack" ->
      s"""WITH d AS (
        | SELECT doc_id, CAST($SqlNTokens AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT doc_id, n_tokens,
        | CAST(floor(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard_id
        |FROM d""".stripMargin,
    "t05_quality_filter" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE ($SqlNTokens) >= 30
        | AND ($SqlStopwordRatio) <= 0.4""".stripMargin,
    "q38_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, ts, event_id AS prior_purchase_id,
        |  value AS prior_purchase_value FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, p.prior_purchase_id, p.prior_purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        | ON c.user_id = p.user_id AND p.ts <= c.ts""".stripMargin,
    "q39_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |marked AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_id
        | FROM marked)
        |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        | MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q65_interval_join" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |p AS (SELECT event_id AS p_id, ts AS ps,
        |  ts + INTERVAL 20 MINUTE AS pe FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT event_id AS e_id, ts AS es,
        |  ts + INTERVAL 15 MINUTE AS ee FROM e WHERE event_type = 'error')
        |SELECT p.p_id, r.e_id
        |FROM p, r WHERE p.ps <= r.ee AND r.es <= p.pe""".stripMargin,
    "q72_unpivot" ->
      """WITH wide AS (
        | SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        | FROM events GROUP BY user_id)
        |SELECT user_id, 'click' AS event_type, click AS n FROM wide
        |UNION ALL SELECT user_id, 'view', view FROM wide
        |UNION ALL SELECT user_id, 'purchase', purchase FROM wide
        |UNION ALL SELECT user_id, 'signup', signup FROM wide
        |UNION ALL SELECT user_id, 'error', error FROM wide""".stripMargin,
    "q67_json_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q68_pivot" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q64_range_join" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |p AS (SELECT event_id AS win_id, ts AS ws,
        |  ts + INTERVAL 30 MINUTE AS we FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, p.win_id
        |FROM e, p WHERE e.ts >= p.ws AND e.ts <= p.we""".stripMargin,
    "q40_sql_zip" ->
      """SELECT COALESCE(o.k, l.k) AS o_orderkey, COALESCE(o.n, 0) AS n_orders,
        | COALESCE(l.n, 0) AS n_items
        |FROM (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) l
        | ON o.k = l.k""".stripMargin,
    "q41_sql_create" ->
      """SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'x'), (CAST(1 AS BIGINT), 'y'),
        | (CAST(2 AS BIGINT), NULL)) AS t(a, b)""".stripMargin,
    "q42_table_io" -> "SELECT * FROM nation",
    "q43_sql_save_use" -> "SELECT * FROM nation",
    "q44_sql_checkpoint" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
    "q53_workflow" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders WHERE o_totalprice > 150000 GROUP BY o_orderstatus""".stripMargin,
    // real-decoder oracles: syntheticImages encodes PNGs whose dims are a
    // pure function of doc_id (w = 8 + id % 57, h = 8 + id % 31, RGB);
    // DuckDB recomputes the expectation the ImageIO header parse must hit
    "m01_multimodal_decode" ->
      """SELECT doc_id, CAST(8 + doc_id % 57 AS INTEGER) AS width,
        | CAST(8 + doc_id % 31 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,
    "m08_binary_ingest" ->
      """SELECT doc_id, CAST(8 + doc_id % 57 AS INTEGER) AS width,
        | CAST(8 + doc_id % 31 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,
    "m10_image_near_dup" -> "SELECT CAST(1 AS BIGINT) AS image_dedup_ok",
    "m11_audio_near_dup" -> "SELECT CAST(1 AS BIGINT) AS audio_dedup_ok",
    "m09_warc_ingest" ->
      """SELECT doc_id,
        | concat('https://corpus.example.org/doc/', CAST(doc_id AS VARCHAR))
        |  AS target_uri,
        | 'conversion' AS warc_type,
        | CAST(strlen(coalesce(text, '')) AS BIGINT) AS content_length,
        | coalesce(text, '') AS text
        |FROM documents""".stripMargin,
    "m04_multimodal_resize" ->
      """SELECT doc_id, CAST(17 AS INTEGER) AS width,
        | CAST(11 AS INTEGER) AS height,
        | CAST(3 AS INTEGER) AS channels FROM documents""".stripMargin,
    "m05_audio_decode" ->
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS INTEGER) AS sample_rate,
        | CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        | CAST(16 AS INTEGER) AS bits,
        | CAST(100 + doc_id % 50 AS BIGINT) AS n_frames FROM documents""".stripMargin,
    // m06: frames = 2 + id % 7, demux stride 2 → sampled = ceil(frames/2),
    // last sampled index = 2*(sampled-1); dims from the same id formulas
    "m06_video_demux" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 7 AS nf FROM documents)
        |SELECT doc_id,
        | CAST(ceil(nf / 2.0) AS BIGINT) AS n_frames,
        | CAST(2 * (ceil(nf / 2.0) - 1) AS INTEGER) AS last_frame,
        | CAST(8 + doc_id % 23 AS INTEGER) AS width,
        | CAST(8 + doc_id % 13 AS INTEGER) AS height
        |FROM f""".stripMargin,
    "m03_frame_sampling" ->
      """WITH w AS (
        | SELECT doc_id, CAST(ceil(octet_length(encode(text))/64.0) AS BIGINT) AS nw
        | FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT doc_id, CAST(ceil(nw/4.0) AS BIGINT) AS n_frames,
        | CAST(4*(ceil(nw/4.0)-1) AS INTEGER) AS last_frame FROM w""".stripMargin,
    "d05x_dedup_embed_exact" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""".stripMargin,
    // differential entries: the Spark side computes LSH-vs-exact recall and
    // emits 1 iff recall ≥ 0.9; the oracle is the constant it must hit
    "d07_embed_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "m02x_feature_differential" -> "SELECT CAST(1 AS BIGINT) AS m02_ok",
    "m07_audio_features" ->
      """SELECT CAST(1 AS BIGINT) AS feat_ok,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs""".stripMargin,
    "q51_sql_functions" -> "SELECT CAST(1 AS BIGINT) AS fns_ok",
    "t33_compression_ratio" -> "SELECT CAST(1 AS BIGINT) AS comp_ok",
    "d16_bloom_line_dedup" -> "SELECT CAST(1 AS BIGINT) AS bloom_dedup_ok",
    "d08_minhash_precision" -> "SELECT CAST(1 AS BIGINT) AS precision_ok",
    "s04_knn_ivf" ->
      "SELECT CAST(1 AS BIGINT) AS full_probe_exact, CAST(1 AS BIGINT) AS probe_recall_ok",
    "d09_simhash_exactness" -> "SELECT CAST(1 AS BIGINT) AS exact_ok",
    "t06_rebalance" -> "SELECT CAST(1 AS BIGINT) AS rebalance_ok",
    "s03_knn_lsh_recall" ->
      """SELECT CAST(5 * COUNT(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "s05_knn_projected" ->
      """SELECT CAST(5 * COUNT(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "q58_orc_roundtrip" -> "SELECT * FROM supplier",
    "q59_stream_static_join" ->
      """SELECT e.event_id, e.event_type, d.category
        |FROM events e LEFT JOIN (VALUES
        |  ('click', 'engagement'), ('view', 'engagement'),
        |  ('purchase', 'revenue'), ('error', 'ops')) AS d(event_type, category)
        |ON e.event_type = d.event_type""".stripMargin,
    "q57_shuffle_det" -> "SELECT CAST(1 AS BIGINT) AS shuffle_ok",
    "q21x_sample_bounds" -> "SELECT CAST(1 AS BIGINT) AS sample_ok",
    "q78_weighted_sample" -> "SELECT CAST(1 AS BIGINT) AS sample_ok",
    "q79_join_size" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS join_size
        |FROM events a JOIN events b ON a.user_id = b.user_id""".stripMargin,
    "t24_span_dedup" ->
      """WITH w AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN []
        |   ELSE string_split_regex(trim(text), '\s+') END AS toks
        | FROM documents),
        |idx AS (SELECT doc_id, toks,
        |  unnest(range(1, len(toks) - 1)) AS i FROM w),
        |spans AS (SELECT doc_id,
        |  array_to_string(toks[i:i+2], ' ') AS span FROM idx),
        |freq AS (SELECT span FROM spans GROUP BY span HAVING count(*) >= 2),
        |dup AS (SELECT s.doc_id, count(*) AS n_dup
        | FROM spans s JOIN freq f USING (span) GROUP BY 1),
        |ns AS (SELECT doc_id, greatest(len(toks) - 2, 0) AS n_spans FROM w)
        |SELECT n.doc_id, CAST(n.n_spans AS BIGINT) AS n_spans,
        | CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
        | CASE WHEN n.n_spans > 0
        |  THEN CAST(coalesce(d.n_dup, 0) AS DOUBLE) / n.n_spans
        |  ELSE 0.0 END AS dup_ratio
        |FROM ns n LEFT JOIN dup d USING (doc_id)""".stripMargin,
    "t25_span_removal" ->
      """WITH w AS (
        | SELECT doc_id, text,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN []
        |   ELSE string_split_regex(trim(text), '\s+') END AS toks
        | FROM documents),
        |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM w),
        |spans AS (SELECT doc_id, i, array_to_string(toks[i:i+2], ' ') AS span
        | FROM idx),
        |freq AS (SELECT span FROM spans GROUP BY 1 HAVING count(*) >= 2),
        |dup AS (SELECT s.doc_id, s.i, s.span FROM spans s JOIN freq USING (span)),
        |win AS (SELECT doc_id, i,
        |  row_number() OVER (PARTITION BY span ORDER BY doc_id, i) AS rk
        | FROM dup),
        |kills AS (SELECT doc_id, list(i) AS ks FROM win WHERE rk > 1 GROUP BY 1),
        |kept AS (
        | SELECT w.doc_id, w.text, w.toks, k.ks,
        |  CASE WHEN k.ks IS NULL THEN NULL
        |   ELSE list_filter(range(1, len(w.toks) + 1),
        |     ti -> len(list_filter(k.ks, p -> ti >= p AND ti < p + 3)) = 0)
        |  END AS keep
        | FROM w LEFT JOIN kills k USING (doc_id))
        |SELECT doc_id,
        | CASE WHEN ks IS NULL THEN text
        |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
        |  ELSE coalesce(
        |   array_to_string(list_transform(keep, ti -> toks[ti]), ' '), '')
        | END AS dedup_text,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(CASE WHEN ks IS NULL THEN 0 ELSE len(toks) - len(keep) END
        |  AS BIGINT) AS n_removed_tokens
        |FROM kept""".stripMargin,
    "q80_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |  o_orderstatus FROM orders),
        |changes AS (
        | SELECT CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey + 10000000
        |   ELSE o_orderkey END AS o_orderkey,
        |  o_custkey, o_totalprice + 1000.0 AS o_totalprice,
        |  'X' AS o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
        | FROM base WHERE o_orderkey % 10 <= 3)
        |SELECT b.o_orderkey, b.o_custkey, b.o_totalprice, b.o_orderstatus
        |FROM base b LEFT JOIN changes c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM changes WHERE op <> 'D'""".stripMargin,
    "q81_heavy_hitters" ->
      """WITH words AS (
        | SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        | FROM documents
        | WHERE length(regexp_replace(text, '\s', '', 'g')) > 0),
        |counts AS (SELECT lang, w, count(*) AS cnt FROM words GROUP BY 1, 2),
        |ranked AS (SELECT lang, w, cnt,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rk
        | FROM counts)
        |SELECT c.lang, CAST(sum(c.cnt) AS BIGINT) AS n_words,
        | max(CASE WHEN r.rk = 1 THEN r.w END) AS top_w,
        | CAST(max(c.cnt) AS BIGINT) AS top_cnt,
        | CAST(0 AS BIGINT) AS missed, CAST(0 AS BIGINT) AS violations,
        | TRUE AS n_consistent
        |FROM counts c LEFT JOIN ranked r ON c.lang = r.lang AND c.w = r.w
        |GROUP BY 1""".stripMargin,
    "q82_cms" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        | TRUE AS over_ok, TRUE AS merge_agrees
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q37x_sketch_error" -> "SELECT CAST(1 AS BIGINT) AS sketch_ok",
    // sketch differentials: booleans the Spark side must hit; n_keys is
    // the one externally-checkable value (distinct group count)
    "q73_sketch_merge" ->
      """SELECT CAST(1 AS BIGINT) AS merge_agrees, CAST(1 AS BIGINT) AS bound_ok,
        | (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events) AS n_keys""".stripMargin,
    "q74_quantile_sketch" ->
      """SELECT CAST(1 AS BIGINT) AS quantile_ok,
        | (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events) AS n_keys""".stripMargin,
    "q75_stream_sketch" ->
      """SELECT CAST(1 AS BIGINT) AS merge_agrees, CAST(1 AS BIGINT) AS multi_batch,
        | (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events) AS n_keys""".stripMargin,
    "q83_stream_heavy_hitters" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(0 AS BIGINT) AS missed, CAST(0 AS BIGINT) AS violations,
        | TRUE AS n_consistent, TRUE AS multi_batch
        |FROM events GROUP BY 1""".stripMargin,
    "t26_quality_model" ->
      """WITH b AS (
        | SELECT string_split_regex(trim(lower(text)), '\s+') AS ltoks,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0
        |   THEN CAST(0 AS INTEGER)
        |   ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
        |  END AS n_tok
        | FROM documents),
        |s AS (SELECT CASE WHEN n_tok > 0
        |  THEN CAST(len(list_filter(ltoks, t -> list_contains(
        |   ['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'],
        |   t))) AS DOUBLE) / n_tok ELSE 0.0 END AS r FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_train, TRUE AS acc_ok,
        | TRUE AS prob_in_range
        |FROM s WHERE abs(r - 0.06) > 0.01""".stripMargin,
    "q84_stream_ingest_dedup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | TRUE AS survivors_clean, TRUE AS dropped_covered
        |FROM documents""".stripMargin,
    "q85_schema_evolution" ->
      """SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END,
        |  '<v1>') AS o_orderstatus,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q86_compact" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders""".stripMargin,
    "q87_sql_template" ->
      """SELECT r_regionkey, r_name FROM region
        |WHERE r_name IN ('ASIA', 'EUROPE', 'AFRICA') AND r_regionkey >= 1""".stripMargin,
    "q87b_sql_template_set" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        |FROM nation WHERE n_nationkey >= 5 AND n_nationkey < 10""".stripMargin,
    // the fully-expanded static render of q120's template
    "q120_template_advanced" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS band_100000,
        | CAST(sum(CASE WHEN o_totalprice >= 300000 AND o_totalprice < 400000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS band_300000,
        | CAST(sum(CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS band_0,
        | CAST(2 AS BIGINT) AS n_bands,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q88_per_row" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(1 AS BIGINT) AS rows_in_partition
        |FROM nation""".stripMargin,
    "q89_quality_checks" ->
      """SELECT 'row_count[1,1000000000]' AS "constraint", '*' AS "column",
        | CAST(count(*) AS DOUBLE) AS metric,
        | count(*) >= 1 AND count(*) <= 1000000000 AS passed FROM orders
        |UNION ALL SELECT 'not_null', 'o_orderkey',
        | CAST(count(*) - count(o_orderkey) AS DOUBLE),
        | count(*) = count(o_orderkey) FROM orders
        |UNION ALL SELECT 'unique', 'o_orderkey',
        | CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS DOUBLE),
        | count(o_orderkey) = count(DISTINCT o_orderkey) FROM orders
        |UNION ALL SELECT 'completeness>=0.95', 'o_orderpriority',
        | round(CAST(count(o_orderpriority) AS DOUBLE) / count(*), 9),
        | round(CAST(count(o_orderpriority) AS DOUBLE) / count(*), 9) >= 0.95
        | FROM orders
        |UNION ALL SELECT 'min>=0.0', 'o_totalprice',
        | CAST(min(o_totalprice) AS DOUBLE), min(o_totalprice) >= 0.0 FROM orders
        |UNION ALL SELECT 'max<=1000000.0', 'o_totalprice',
        | CAST(max(o_totalprice) AS DOUBLE), max(o_totalprice) <= 1000000.0
        | FROM orders
        |UNION ALL SELECT 'mean[1000.0,500000.0]', 'o_totalprice',
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |   / count(o_totalprice), 9),
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |   / count(o_totalprice), 9) BETWEEN 1000.0 AND 500000.0 FROM orders
        |UNION ALL SELECT 'in_set>=1.0', 'o_orderstatus',
        | round(CAST(count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END)
        |   AS DOUBLE) / count(o_orderstatus), 9),
        | round(CAST(count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END)
        |   AS DOUBLE) / count(o_orderstatus), 9) >= 1.0 FROM orders
        |UNION ALL SELECT 'regex>=1.0', 'o_orderpriority',
        | round(CAST(count(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
        |   THEN 1 END) AS DOUBLE) / count(o_orderpriority), 9),
        | round(CAST(count(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
        |   THEN 1 END) AS DOUBLE) / count(o_orderpriority), 9) >= 1.0
        | FROM orders
        |UNION ALL SELECT 'distinct[1,5]', 'o_orderstatus',
        | CAST(count(DISTINCT o_orderstatus) AS DOUBLE),
        | count(DISTINCT o_orderstatus) BETWEEN 1 AND 5 FROM orders
        |UNION ALL SELECT 'satisfies(totalprice_gt_1000)>=0.5', '*',
        | round(CAST(count(CASE WHEN o_totalprice > 1000.0 THEN 1 END)
        |   AS DOUBLE) / count(*), 9),
        | round(CAST(count(CASE WHEN o_totalprice > 1000.0 THEN 1 END)
        |   AS DOUBLE) / count(*), 9) >= 0.5 FROM orders""".stripMargin,
    "q98_export_shards" ->
      """SELECT CAST(1 AS BIGINT) AS verify_ok, CAST(1 AS BIGINT) AS rows_ok,
        | CAST(1 AS BIGINT) AS det_ok, CAST(1 AS BIGINT) AS content_ok""".stripMargin,
    "m12_tar_shards" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(count(*) + sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_entries,
        | CAST(1 AS BIGINT) AS verify_ok, CAST(1 AS BIGINT) AS roundtrip_ok,
        | CAST(1 AS BIGINT) AS det_ok
        |FROM documents""".stripMargin,
    // full stbl arithmetic from first principles: sizes, 2-then-3-sample
    // chunking with 4-byte inter-chunk pads, stss sync flags, two-run
    // stts durations, tkhd dims, and the head/tail extraction probes
    "m17_media_census" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 9 AS INTEGER)
        |  WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'mp4'
        |  WHEN 3 THEN 'mp4' WHEN 4 THEN 'mp3' WHEN 5 THEN 'wav'
        |  WHEN 6 THEN 'ogg' WHEN 7 THEN 'flac'
        |  ELSE 'unknown' END AS media_type
        |FROM documents""".stripMargin,
    // first-principles MP3 oracle: replays Mp3.syntheticShape — MPEG-1
    // Layer III frame size is 144000·kbps // hz + pad; data starts after
    // the optional ID3v2 block (10-byte header + synchsafe size)
    "m16_mp3_frames" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 6 AS INTEGER) AS n,
        |  CAST(doc_id % 3 AS INTEGER) AS sri FROM documents),
        |f AS (SELECT doc_id, n, sri,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS i FROM d),
        |s AS (SELECT doc_id, i,
        |  CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS hz,
        |  [32,40,48,56,64,80,96,112,128,160,192,224,256,320][
        |    CAST(1 + (doc_id + 5*i) % 14 AS INTEGER)] AS kbps,
        |  CAST((doc_id + i) % 2 AS INTEGER) AS pad FROM f),
        |z AS (SELECT doc_id, i, kbps, hz,
        |  144000 * kbps // hz + pad AS size FROM s),
        |o AS (SELECT doc_id, i, kbps, hz, size,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 27 + doc_id % 23 ELSE 0 END
        |    + COALESCE(SUM(size) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS off
        | FROM z)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_no, off AS "offset",
        | CAST(size AS INTEGER) AS size, CAST(kbps AS INTEGER) AS bitrate_kbps,
        | CAST(hz AS INTEGER) AS hz, CAST(1152 AS INTEGER) AS n_samples,
        | CAST((doc_id + i*131 + 4) % 256 AS INTEGER) AS data_head,
        | CAST((doc_id + i*131 + size - 1) % 256 AS INTEGER) AS data_tail
        |FROM o""".stripMargin,
    // replay of Flac.syntheticFlac's shape formulas; duration is integer
    // millisecond floor division in both engines
    "m22_flac_info" ->
      """WITH s AS (SELECT doc_id,
        | CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |   WHEN 2 THEN 96000 ELSE 22050 END AS rate,
        | CAST(1 + doc_id % 3 AS INTEGER) AS channels,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 16 WHEN 1 THEN 24
        |   ELSE 8 END AS bits,
        | CAST(1000 + doc_id % 9999 AS BIGINT) AS total
        |FROM documents)
        |SELECT doc_id, CAST(rate AS INTEGER) AS sample_rate, channels,
        | CAST(bits AS INTEGER) AS bits_per_sample, total AS total_samples,
        | CAST(total * 1000 // rate AS BIGINT) AS duration_ms
        |FROM s""".stripMargin,
    // replay of Mp3.syntheticTaggedMp3's frame formulas — encoding and
    // frame-SIZE encoding variation is the ENGINE's to erase; decoded
    // text is encoding-independent, but v2.2 tags (doc_id%3 = 2) carry
    // the 3-char frame-id vocabulary, emitted raw
    "m21_id3_tags" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TT2' ELSE 'TIT2' END AS frame_id,
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS text
        | FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TP1' ELSE 'TPE1' END,
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TAL' ELSE 'TALB' END,
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM documents
        |UNION ALL SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'TRK' ELSE 'TRCK' END,
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM documents""".stripMargin,
    // replay of Ogg.syntheticCommentedOgg's comment formulas (the m21
    // vocabulary re-keyed VorbisComment-style); magic/framing variation
    // between OpusTags and the Vorbis type-3 header is the engine's
    "m24_ogg_comments" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(5000 + doc_id % 100 AS BIGINT) AS serial,
        |  'graft ' || CAST(doc_id % 7 AS VARCHAR) AS vendor
        | FROM documents)
        |SELECT doc_id, serial, vendor, CAST(0 AS INTEGER) AS comment_no,
        |  'TITLE' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 1, 'ARTIST',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 2, 'ALBUM',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 3, 'TRACKNUMBER',
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, serial, vendor, 4, 'PAD',
        |  repeat('x', CAST(200 + doc_id % 200 AS INTEGER)) FROM d""".stripMargin,
    // replay of Flac.syntheticCommentedFlac's comment formulas; the
    // PADDING/APPLICATION neighbors and the missing-tag ids (doc_id%5=4)
    // are structural, so the oracle only filters and formats
    "m25_flac_comments" ->
      """WITH d AS (SELECT doc_id,
        |  'graft ' || CAST(doc_id % 7 AS VARCHAR) AS vendor
        | FROM documents WHERE doc_id % 5 <> 4)
        |SELECT doc_id, vendor, CAST(0 AS INTEGER) AS comment_no,
        |  'TITLE' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, vendor, 1, 'ARTIST',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 2, 'ALBUM',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 3, 'TRACKNUMBER',
        |  CAST(1 + doc_id % 12 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, vendor, 4, 'DESCRIPTION',
        |  'ünïcode_' || CAST(doc_id % 10 AS VARCHAR) FROM d""".stripMargin,
    // replay of Mp4.syntheticTaggedMp4's tag formulas: the five UTF-8
    // text atoms in list order (binary trkn/covr strided by the engine);
    // keys carry the literal 0xA9 iTunes prefix (U+00A9 '©')
    "m26_mp4_tags" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 2)
        |SELECT doc_id, CAST(0 AS INTEGER) AS tag_no, '©nam' AS "key",
        |  'title_' || CAST((doc_id*7) % 1000 AS VARCHAR) AS "value" FROM d
        |UNION ALL SELECT doc_id, 1, '©ART',
        |  'artist_' || CAST(doc_id % 50 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 2, '©alb',
        |  'album_' || CAST(doc_id % 20 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 3, '©day',
        |  CAST(1970 + doc_id % 55 AS VARCHAR) FROM d
        |UNION ALL SELECT doc_id, 4, '©cmt',
        |  'cömment_' || CAST(doc_id % 10 AS VARCHAR) FROM d""".stripMargin,
    // replay of Ogg.syntheticLinkedOgg's two-link page arithmetic: file
    // page_no runs across both links, offsets cumulate 28-byte headers +
    // bodies in (link, page) order, bos/eos bracket each link, and the
    // body probes derive from the per-link byte formula
    "m27_ogg_chained" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |l AS (SELECT doc_id, 0 AS lk FROM d
        |  UNION ALL SELECT doc_id, 1 FROM d),
        |lp AS (SELECT doc_id, lk,
        |  CAST(2 + (doc_id + lk) % 2 AS INTEGER) AS np FROM l),
        |p AS (SELECT doc_id, lk, np,
        |  CAST(unnest(range(0, np)) AS INTEGER) AS pg FROM lp),
        |b AS (SELECT doc_id, lk, np, pg,
        |  CAST(45 + ((doc_id*7 + lk*29 + pg*13) % 90) AS BIGINT) AS a,
        |  CAST(2 + doc_id % 2 AS INTEGER) AS np0
        | FROM p),
        |o AS (SELECT doc_id, lk, np, pg, a, np0,
        |  COALESCE(SUM(28 + a) OVER (PARTITION BY doc_id
        |    ORDER BY lk, pg ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING), 0) AS off
        | FROM b)
        |SELECT doc_id,
        | CAST(CASE WHEN lk = 0 THEN pg ELSE np0 + pg END AS INTEGER)
        |   AS page_no,
        | CAST(off AS BIGINT) AS "offset",
        | CAST(28 AS INTEGER) AS header_bytes,
        | a AS body_bytes,
        | CAST((pg + 1) * (10 + lk) AS BIGINT) AS granule,
        | CAST(4000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(CASE WHEN pg = 0 THEN 1 ELSE 0 END AS INTEGER) AS bos,
        | CAST(CASE WHEN pg = np - 1 THEN 1 ELSE 0 END AS INTEGER) AS eos,
        | CAST(1 AS INTEGER) AS n_packets,
        | CAST((doc_id + lk*37 + pg*11) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + lk*37 + pg*11 + a - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,
    // replay of Ogg.syntheticAudioOgg's header formulas: even ids Opus,
    // odd ids Vorbis, per-codec channel/rate/preskip derivations
    "m20_audio_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
        | CAST(1 + (doc_id // 2) % 2 AS INTEGER) AS channels,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 48000
        |      WHEN 1 THEN 24000 ELSE 16000 END
        |   ELSE
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 44100
        |      WHEN 1 THEN 32000 ELSE 22050 END
        |   END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 312 + doc_id % 100
        |   ELSE 0 END AS INTEGER) AS preskip
        |FROM documents""".stripMargin,
    // first-principles chained-Ogg packet oracle: replays
    // Ogg.syntheticChainedShape — shorts A(p) are packet 2p (1 page),
    // longs L(p) = open(p)·255-opening + rem(p)-closing are packet 2p+1
    // (2 pages, ending on page p+1), where open(p) = 1 + (id+p)%2 and
    // rem(p) is 0 on the exact-510 shape (open 2, (id+p)%5 = 0 — the
    // terminating-0 lacing) and 40 + ((id*5+p*7)%200) otherwise;
    // head/tail probe bytes derive from the page body formulas on either
    // side of the seam — a rem-0 long's LAST byte sits on the OPENING
    // page, not the closing one
    "m19_ogg_packets" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 4 AS INTEGER) AS np
        |  FROM documents),
        |p AS (SELECT doc_id, np, CAST(unnest(range(0, np)) AS INTEGER) AS pg
        |  FROM d),
        |base AS (SELECT doc_id, np, pg,
        |  CAST(60 + ((doc_id*11 + pg*17) % 90) AS BIGINT) AS a,
        |  CAST(1 + (doc_id + pg) % 2 AS BIGINT) AS opn,
        |  CAST(CASE WHEN (doc_id + pg) % 10 = 5 THEN 0
        |    ELSE 40 + ((doc_id*5 + pg*7) % 200) END AS BIGINT) AS r,
        |  CAST(CASE WHEN pg = 0 THEN 0
        |    WHEN (doc_id + pg - 1) % 10 = 5 THEN 0
        |    ELSE 40 + ((doc_id*5 + (pg-1)*7) % 200) END AS BIGINT) AS rprev
        | FROM p),
        |shorts AS (SELECT doc_id, CAST(2*pg AS INTEGER) AS packet_no,
        |  a AS psize, 1 AS n_pages, pg AS end_page,
        |  (doc_id + pg*131 + rprev) % 256 AS head_byte,
        |  (doc_id + pg*131 + rprev + a - 1) % 256 AS tail_byte FROM base),
        |longs AS (SELECT doc_id, CAST(2*pg + 1 AS INTEGER) AS packet_no,
        |  255*opn + r AS psize, 2 AS n_pages, pg + 1 AS end_page,
        |  (doc_id + pg*131 + rprev + a) % 256 AS head_byte,
        |  CASE WHEN r > 0 THEN (doc_id + (pg+1)*131 + r - 1) % 256
        |    ELSE (doc_id + pg*131 + rprev + a + 255*opn - 1) % 256
        |  END AS tail_byte
        | FROM base WHERE pg < np - 1)
        |SELECT doc_id, packet_no,
        | CAST(2000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(psize AS BIGINT) AS size,
        | CAST(n_pages AS INTEGER) AS n_pages,
        | CAST(end_page AS INTEGER) AS end_page,
        | CAST(head_byte AS INTEGER) AS head_byte,
        | CAST(tail_byte AS INTEGER) AS tail_byte
        |FROM (SELECT * FROM shorts UNION ALL SELECT * FROM longs)""".stripMargin,
    // first-principles muxed-Ogg oracle: replays Ogg.syntheticMuxedShape —
    // file page q = 2p+s (stream s, stream-page p); page 0/1 complete
    // the first shorts (packets 0/1), every later page q completes the
    // stream's long L_s(p-1) (packet 2q−2, spanning 2 stream pages) then
    // its short A_s(p) (packet 2q−1); body probes use the FILE page
    // number, so bytes wrongly pulled from the other stream's interleaved
    // page hash differently
    "m23_ogg_muxed" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS n
        |  FROM documents),
        |ds AS (SELECT doc_id, n, 0 AS s FROM d
        |  UNION ALL SELECT doc_id, n, 1 AS s FROM d),
        |sp AS (SELECT doc_id, n, s,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS pg
        | FROM ds),
        |base AS (SELECT doc_id, n, s, pg, 2*pg + s AS q,
        |  CAST(CASE WHEN s = 0 THEN 50 + ((doc_id*7 + pg*13) % 80)
        |    ELSE 55 + ((doc_id*9 + pg*19) % 70) END AS BIGINT) AS a,
        |  CAST(CASE WHEN s = 0 THEN 30 + ((doc_id*3 + pg*11) % 100)
        |    ELSE 35 + ((doc_id*13 + pg*5) % 90) END AS BIGINT) AS r,
        |  CAST(CASE WHEN pg = 0 THEN 0
        |    WHEN s = 0 THEN 30 + ((doc_id*3 + (pg-1)*11) % 100)
        |    ELSE 35 + ((doc_id*13 + (pg-1)*5) % 90) END AS BIGINT) AS rprev
        | FROM sp),
        |shorts AS (SELECT doc_id, s,
        |  CASE WHEN q < 2 THEN q ELSE 2*q - 1 END AS packet_no,
        |  a AS psize, 1 AS n_pages, q AS end_page,
        |  (doc_id + q*131 + rprev) % 256 AS head_byte,
        |  (doc_id + q*131 + rprev + a - 1) % 256 AS tail_byte FROM base),
        |longs AS (SELECT doc_id, s,
        |  2*(q + 2) - 2 AS packet_no,
        |  255 + r AS psize, 2 AS n_pages, q + 2 AS end_page,
        |  (doc_id + q*131 + rprev + a) % 256 AS head_byte,
        |  (doc_id + (q + 2)*131 + r - 1) % 256 AS tail_byte
        | FROM base WHERE pg < n - 1)
        |SELECT doc_id, CAST(packet_no AS INTEGER) AS packet_no,
        | CAST(4000 + 100*s + doc_id % 100 AS BIGINT) AS serial,
        | CAST(psize AS BIGINT) AS size,
        | CAST(n_pages AS INTEGER) AS n_pages,
        | CAST(end_page AS INTEGER) AS end_page,
        | CAST(head_byte AS INTEGER) AS head_byte,
        | CAST(tail_byte AS INTEGER) AS tail_byte
        |FROM (SELECT * FROM shorts UNION ALL SELECT * FROM longs)""".stripMargin,
    // first-principles Ogg oracle: replays Ogg.syntheticShape — header is
    // 27 + n_segments where each packet contributes 1 lacing below 255
    // and 2 at/above; offsets accumulate page-by-page
    "m18_ogg_pages" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 5 AS INTEGER) AS np
        |  FROM documents),
        |p AS (SELECT doc_id, np, CAST(unnest(range(0, np)) AS INTEGER) AS pg
        |  FROM d),
        |k AS (SELECT doc_id, np, pg,
        |  CAST(1 + (doc_id + pg) % 3 AS INTEGER) AS nk FROM p),
        |pk AS (SELECT doc_id, np, pg, nk,
        |  CAST(unnest(range(0, nk)) AS INTEGER) AS kk FROM k),
        |sz AS (SELECT doc_id, np, pg, kk,
        |  CAST(50 + ((doc_id*31 + pg*17 + kk*7) % 230) AS BIGINT) AS psz
        | FROM pk),
        |pagg AS (SELECT doc_id, np, pg,
        |  CAST(count(*) AS INTEGER) AS n_packets,
        |  sum(psz) AS body,
        |  sum(1 + CASE WHEN psz >= 255 THEN 1 ELSE 0 END) AS nseg
        | FROM sz GROUP BY doc_id, np, pg),
        |o AS (SELECT doc_id, np, pg, n_packets, body, 27 + nseg AS hdr,
        |  COALESCE(SUM(27 + nseg + body) OVER (PARTITION BY doc_id
        |    ORDER BY pg ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS off
        | FROM pagg)
        |SELECT doc_id, CAST(pg AS INTEGER) AS page_no,
        | CAST(off AS BIGINT) AS "offset",
        | CAST(hdr AS INTEGER) AS header_bytes,
        | CAST(body AS BIGINT) AS body_bytes,
        | CAST((pg+1) * (100 + doc_id % 50) AS BIGINT) AS granule,
        | CAST(1000 + doc_id % 100 AS BIGINT) AS serial,
        | CAST(CASE WHEN pg = 0 THEN 1 ELSE 0 END AS INTEGER) AS bos,
        | CAST(CASE WHEN pg = np - 1 THEN 1 ELSE 0 END AS INTEGER) AS eos,
        | n_packets,
        | CAST((doc_id + pg*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + pg*131 + body - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,
    "q118_callback_census" ->
      """SELECT CAST(o_custkey % 50 AS BIGINT) AS k,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    // identical census, delivered over the driver-hosted HTTP endpoint
    "q118b_http_callback" ->
      """SELECT CAST(o_custkey % 50 AS BIGINT) AS k,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q119_parallelism" -> "SELECT CAST(1 AS BIGINT) AS parallelism_ok",
    // per-doc demux census from the m13 fixture's closed form — the
    // streaming path must land exactly the batch walk's sample rows
    "m15_stream_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 7 AS INTEGER) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, n, CAST(unnest(range(0, n)) AS INTEGER) AS i
        |  FROM d),
        |s AS (SELECT doc_id, n, i,
        |  CAST(50 + ((doc_id*31 + i*17) % 64) AS BIGINT) AS size,
        |  CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END AS kf,
        |  CAST(CASE WHEN i < n // 2 THEN 1000 + (doc_id % 5)*100
        |    ELSE 1200 END AS BIGINT) AS dur
        | FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        | CAST(sum(kf) AS BIGINT) AS n_sync,
        | CAST(sum(size) AS BIGINT) AS total_bytes,
        | CAST(sum(dur) AS BIGINT) AS dur_total,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS height
        |FROM s GROUP BY doc_id""".stripMargin,
    // first-principles fMP4 oracle: replays the fixture's closed-form
    // layout (Mp4.syntheticFmp4Shape). 641 = ftyp(20) + moov(577:
    // fixed-size init section with empty stbl + mvex/trex) + sidx(44) —
    // constants of the fixed-layout init segment, pinned by the writer's
    // own require() and by Mp4Spec. Fragment f: moof(72+4k | 112 |
    // 108+16k two-traf / 68+16k single by scheme f%3, k>=2) + mdat(8 + Σ
    // sizes); sample offsets accumulate inside the fragment (scheme C's
    // second traf continues on the implicit end-of-previous-traf base,
    // so the split moves no bytes); frame_no is the running index.
    "m14_fmp4_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS nf
        |  FROM documents),
        |fr AS (SELECT doc_id, CAST(unnest(range(0, nf)) AS INTEGER) AS f
        |  FROM d),
        |fk AS (SELECT doc_id, f,
        |  CAST(1 + (doc_id + f) % 4 AS INTEGER) AS k FROM fr),
        |sm AS (SELECT doc_id, f, k,
        |  CAST(unnest(range(0, k)) AS INTEGER) AS i FROM fk),
        |sz AS (SELECT doc_id, f, k, i,
        |  CAST(CASE WHEN f % 3 = 1 THEN 40 + ((doc_id*37 + f*19) % 50)
        |    ELSE 40 + ((doc_id*37 + f*19 + i*13) % 50) END AS BIGINT)
        |   AS size FROM sm),
        |fragagg AS (SELECT doc_id, f, k,
        |  CAST(CASE f % 3 WHEN 0 THEN 72 + 4*k WHEN 1 THEN 112
        |    ELSE CASE WHEN k >= 2 THEN 108 + 16*k
        |      ELSE 68 + 16*k END END AS BIGINT) AS moof_size,
        |  sum(size) AS mdat_payload
        | FROM sz GROUP BY doc_id, f, k),
        |fragpos AS (SELECT doc_id, f, moof_size,
        |  641 + COALESCE(SUM(moof_size + 8 + mdat_payload) OVER (
        |    PARTITION BY doc_id ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS frag_start,
        |  COALESCE(SUM(k) OVER (PARTITION BY doc_id ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS idx_base
        | FROM fragagg),
        |o AS (SELECT sz.doc_id, sz.f, sz.i, sz.size,
        |  p.frag_start + p.moof_size + 8 + COALESCE(SUM(sz.size) OVER (
        |    PARTITION BY sz.doc_id, sz.f ORDER BY sz.i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS off,
        |  p.idx_base + sz.i AS gi
        | FROM sz JOIN fragpos p ON sz.doc_id = p.doc_id AND sz.f = p.f)
        |SELECT doc_id, CAST(gi AS INTEGER) AS frame_no,
        | CAST(off AS BIGINT) AS "offset", size,
        | CAST(CASE WHEN f % 3 = 2
        |   THEN CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END
        |   ELSE CASE WHEN i = 0 THEN 1 ELSE 0 END END AS INTEGER)
        |  AS keyframe,
        | CAST(CASE f % 3 WHEN 0 THEN 800
        |   WHEN 1 THEN 900 + ((doc_id + 7*f) % 5)*50
        |   ELSE 900 + ((doc_id + 7*f + 3*i) % 5)*50 END AS BIGINT)
        |  AS dur_ticks,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS height,
        | CAST((doc_id + gi*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + gi*131 + size - 1) % 256 AS INTEGER) AS tail_byte
        |FROM o""".stripMargin,
    "m13_mp4_demux" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 7 AS INTEGER) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, n,
        |  CAST(unnest(range(0, n)) AS INTEGER) AS frame_no FROM d),
        |s AS (SELECT doc_id, n, frame_no,
        |  CAST(50 + ((doc_id*31 + frame_no*17) % 64) AS BIGINT) AS size,
        |  CASE WHEN frame_no < 2 THEN 0
        |    ELSE 1 + (frame_no - 2) // 3 END AS chunk FROM f),
        |o AS (SELECT doc_id, n, frame_no, size,
        |  CAST(28 + COALESCE(SUM(size) OVER (PARTITION BY doc_id
        |      ORDER BY frame_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + 4*chunk AS BIGINT) AS "offset" FROM s)
        |SELECT doc_id, frame_no, "offset", size,
        | CAST(CASE WHEN frame_no % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
        |   AS keyframe,
        | CAST(CASE WHEN frame_no < n // 2 THEN 1000 + (doc_id % 5)*100
        |   ELSE 1200 END AS BIGINT) AS dur_ticks,
        | CAST(16*(1 + doc_id % 4) AS INTEGER) AS width,
        | CAST(16*(1 + doc_id % 3) AS INTEGER) AS height,
        | CAST((doc_id + frame_no*131) % 256 AS INTEGER) AS head_byte,
        | CAST((doc_id + frame_no*131 + size - 1) % 256 AS INTEGER)
        |   AS tail_byte
        |FROM o""".stripMargin,
    "t34_budget_select" ->
      """WITH s AS (
        | SELECT doc_id, n_chars,
        |  CAST((doc_id * 2654435761) % 1000 AS BIGINT) AS score
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_chars, score,
        |  CAST(sum(n_chars) OVER (ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_size
        | FROM s)
        |SELECT doc_id, n_chars, score, cum_size
        |FROM c WHERE cum_size <= 100000""".stripMargin,
    "q100_drift" ->
      """WITH b AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 = 0),
        |a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 <> 0),
        |p AS (SELECT min(v) AS mn,
        |  CASE WHEN max(v) <= min(v) THEN CAST(1.0 AS DOUBLE)
        |   ELSE (max(v) - min(v)) / 10 END AS w,
        |  CASE WHEN max(v) <= min(v) THEN 1 ELSE 10 END AS nb FROM b),
        |bb AS (SELECT CAST(greatest(0, least(CAST(floor((v - p.mn) / p.w)
        |    AS BIGINT), CAST(p.nb - 1 AS BIGINT))) AS INTEGER) AS bucket,
        |   CAST(count(*) AS BIGINT) AS n
        |  FROM b, p GROUP BY 1),
        |ab AS (SELECT CAST(greatest(0, least(CAST(floor((v - p.mn) / p.w)
        |    AS BIGINT), CAST(p.nb - 1 AS BIGINT))) AS INTEGER) AS bucket,
        |   CAST(count(*) AS BIGINT) AS n
        |  FROM a, p GROUP BY 1),
        |f AS (SELECT CAST(range AS INTEGER) AS bucket FROM range(10)
        |  WHERE range < (SELECT nb FROM p)),
        |base AS (SELECT f.bucket, p.mn + f.bucket * p.w AS lo,
        |   p.mn + (f.bucket + 1) * p.w AS hi,
        |   COALESCE(bb.n, 0) AS n_before, COALESCE(ab.n, 0) AS n_after
        |  FROM f CROSS JOIN p
        |  LEFT JOIN bb ON f.bucket = bb.bucket
        |  LEFT JOIN ab ON f.bucket = ab.bucket),
        |t AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM b) AS tb,
        |  (SELECT CAST(count(*) AS DOUBLE) FROM a) AS ta)
        |SELECT bucket, lo, hi,
        | CAST(n_before AS BIGINT) AS n_before,
        | CAST(n_after AS BIGINT) AS n_after,
        | round((greatest(n_after / ta, 1e-6) - greatest(n_before / tb, 1e-6))
        |   * ln(greatest(n_after / ta, 1e-6) / greatest(n_before / tb, 1e-6)),
        |   9) AS psi
        |FROM base CROSS JOIN t""".stripMargin,
    "q101_pagerank" ->
      "SELECT CAST(53 AS BIGINT) AS n_nodes, CAST(1 AS BIGINT) AS pr_ok",
    "q104_label_prop" ->
      "SELECT CAST(52 AS BIGINT) AS n_nodes, CAST(1 AS BIGINT) AS lpa_ok",
    "q113_ppr" ->
      "SELECT CAST(53 AS BIGINT) AS n_nodes, CAST(1 AS BIGINT) AS ppr_ok",
    "q114_clustering_coeff" ->
      """WITH raw AS (SELECT doc_id % 53 AS a, (doc_id * 7 + 11) % 53 AS b
        | FROM documents),
        |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        | FROM raw WHERE a <> b),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |  SELECT u AS node FROM e UNION ALL SELECT v FROM e) x GROUP BY node),
        |tri AS (
        | SELECT e1.u AS u, e1.v AS v, e2.v AS w
        | FROM e e1 JOIN e e2 ON e1.v = e2.u
        | JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |  SELECT u AS node FROM tri
        |  UNION ALL SELECT v FROM tri
        |  UNION ALL SELECT w FROM tri) x GROUP BY node)
        |SELECT deg.node, deg.degree,
        | COALESCE(pn.triangles, 0) AS triangles,
        | CASE WHEN deg.degree >= 2 THEN
        |   CAST(COALESCE(pn.triangles, 0) * 2 AS DOUBLE)
        |     / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
        |  ELSE 0.0 END AS cc
        |FROM deg LEFT JOIN pn ON deg.node = pn.node""".stripMargin,
    "q112_triangles" ->
      """WITH raw AS (SELECT doc_id % 53 AS a, (doc_id * 7 + 11) % 53 AS b
        | FROM documents),
        |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        | FROM raw WHERE a <> b),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
        |tri AS (
        | SELECT e1.u AS u, e1.v AS v, e2.v AS w
        | FROM e e1 JOIN e e2 ON e1.v = e2.u
        | JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |  SELECT u AS node FROM tri
        |  UNION ALL SELECT v FROM tri
        |  UNION ALL SELECT w FROM tri) x GROUP BY node)
        |SELECT nodes.node, COALESCE(pn.triangles, 0) AS triangles
        |FROM nodes LEFT JOIN pn ON nodes.node = pn.node""".stripMargin,
    "q110_funnel" ->
      """WITH e AS (SELECT user_id AS u,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
        |  event_type AS ev FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT u, min(t) AS step_1 FROM e
        |  WHERE ev = 'signup' GROUP BY u),
        |s2 AS (SELECT s1.u, s1.step_1,
        |  min(CASE WHEN e.t >= s1.step_1 AND e.t <= s1.step_1 + 86400
        |    THEN e.t END) AS step_2
        | FROM s1 LEFT JOIN e ON s1.u = e.u AND e.ev = 'view'
        | GROUP BY s1.u, s1.step_1),
        |s3 AS (SELECT s2.u, s2.step_1, s2.step_2,
        |  min(CASE WHEN e.t >= s2.step_2 AND e.t <= s2.step_1 + 86400
        |    THEN e.t END) AS step_3
        | FROM s2 LEFT JOIN e ON s2.u = e.u AND e.ev = 'purchase'
        | GROUP BY s2.u, s2.step_1, s2.step_2)
        |SELECT u AS user_id, step_1, step_2, step_3,
        | CAST((CASE WHEN step_1 IS NOT NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN step_2 IS NOT NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN step_3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS steps_completed
        |FROM s3""".stripMargin,
    "q116_key_skew" ->
      """WITH b AS (SELECT CASE WHEN o_custkey % 4 = 0 THEN 0
        |  ELSE o_custkey % 11 END AS bucket FROM orders),
        |c AS (SELECT CAST(bucket AS VARCHAR) AS key, count(*) AS n
        | FROM b GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n) AS BIGINT) AS total,
        |  CAST(max(n) AS BIGINT) AS max_n FROM c),
        |r AS (SELECT key, CAST(n AS BIGINT) AS n,
        |  row_number() OVER (ORDER BY n DESC, key ASC) AS rank FROM c)
        |SELECT CAST(r.rank AS BIGINT) AS rank, r.key, r.n,
        | CAST(r.n AS DOUBLE) / s.total AS frac,
        | s.n_keys, s.total,
        | (CAST(s.max_n AS DOUBLE) * CAST(s.n_keys AS DOUBLE))
        |   / s.total AS skew
        |FROM r CROSS JOIN s WHERE r.rank <= 10""".stripMargin,
    "q117_odd_columns" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS "x y",
        | CAST(n_regionkey + 10 AS BIGINT) AS d,
        | lower(n_name) AS "select",
        | n_name AS "naçãö",
        | CAST(2 AS BIGINT) AS "c *"
        |FROM nation WHERE n_nationkey % 2 = 0""".stripMargin,
    "q115_connected_components" ->
      """WITH RECURSIVE raw AS (
        | SELECT doc_id % 300 AS a,
        |  (doc_id % 300) - ((doc_id % 300) % 10)
        |    + ((doc_id * 7 + 3) % 10) AS b
        | FROM documents),
        |e0 AS (SELECT a AS u, b AS v FROM raw
        | UNION SELECT b AS u, a AS v FROM raw),
        |e AS (SELECT u, v FROM e0 WHERE u <> v),
        |nodes AS (SELECT a AS node FROM raw UNION SELECT b FROM raw),
        |walk(node, comp) AS (
        | SELECT node, node FROM nodes
        | UNION
        | SELECT e.v, w.comp FROM walk w JOIN e ON e.u = w.node)
        |SELECT CAST(node AS BIGINT) AS node,
        | CAST(min(comp) AS BIGINT) AS comp
        |FROM walk GROUP BY node""".stripMargin,
    "q110b_funnel_restart" ->
      """WITH e AS (SELECT user_id AS u,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
        |  event_type AS ev FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT DISTINCT u, t AS step_1 FROM e WHERE ev = 'signup'),
        |s2 AS (SELECT s1.u, s1.step_1,
        |  min(CASE WHEN e.t >= s1.step_1 AND e.t <= s1.step_1 + 3600
        |    THEN e.t END) AS step_2
        | FROM s1 LEFT JOIN e ON s1.u = e.u AND e.ev = 'view'
        | GROUP BY s1.u, s1.step_1),
        |s3 AS (SELECT s2.u, s2.step_1, s2.step_2,
        |  min(CASE WHEN e.t >= s2.step_2 AND e.t <= s2.step_1 + 3600
        |    THEN e.t END) AS step_3
        | FROM s2 LEFT JOIN e ON s2.u = e.u AND e.ev = 'purchase'
        | GROUP BY s2.u, s2.step_1, s2.step_2),
        |sc AS (SELECT u, step_1, step_2, step_3,
        | CAST((CASE WHEN step_1 IS NOT NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN step_2 IS NOT NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN step_3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS steps_completed
        | FROM s3),
        |r AS (SELECT sc.*, row_number() OVER (PARTITION BY u
        |  ORDER BY steps_completed DESC, step_1 ASC) AS rn FROM sc)
        |SELECT u AS user_id, step_1, step_2, step_3, steps_completed
        |FROM r WHERE rn = 1""".stripMargin,
    "q111_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT)
        |    * 604800 AS p
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT u, min(p) AS c FROM a GROUP BY u),
        |cnt AS (SELECT c AS cohort_start,
        |  CAST((p - c) / 604800 AS BIGINT) AS period_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        | FROM a JOIN f USING (u) GROUP BY 1, 2),
        |sz AS (SELECT cohort_start, n_active AS n_cohort FROM cnt
        | WHERE period_offset = 0)
        |SELECT cohort_start, period_offset, n_active, n_cohort,
        | CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
        |FROM cnt JOIN sz USING (cohort_start)""".stripMargin,
    "q109_spearman" ->
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
        |  CAST(l_extendedprice AS DOUBLE) AS e,
        |  CAST(l_discount AS DOUBLE) AS d FROM lineitem),
        |r AS (SELECT
        |  rank() OVER (ORDER BY q)
        |    + (count(*) OVER (PARTITION BY q) - 1) / 2.0 AS rq,
        |  rank() OVER (ORDER BY e)
        |    + (count(*) OVER (PARTITION BY e) - 1) / 2.0 AS re,
        |  rank() OVER (ORDER BY d)
        |    + (count(*) OVER (PARTITION BY d) - 1) / 2.0 AS rd
        | FROM b),
        |s AS (SELECT
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(rq AS DECIMAL(28,6))) AS DOUBLE) AS s_q,
        |  CAST(sum(CAST(re AS DECIMAL(28,6))) AS DOUBLE) AS s_e,
        |  CAST(sum(CAST(rd AS DECIMAL(28,6))) AS DOUBLE) AS s_d,
        |  CAST(sum(CAST(rq * rq AS DECIMAL(28,6))) AS DOUBLE) AS s_qq,
        |  CAST(sum(CAST(re * re AS DECIMAL(28,6))) AS DOUBLE) AS s_ee,
        |  CAST(sum(CAST(rd * rd AS DECIMAL(28,6))) AS DOUBLE) AS s_dd,
        |  CAST(sum(CAST(rq * re AS DECIMAL(28,6))) AS DOUBLE) AS s_qe,
        |  CAST(sum(CAST(rq * rd AS DECIMAL(28,6))) AS DOUBLE) AS s_qd,
        |  CAST(sum(CAST(re * rd AS DECIMAL(28,6))) AS DOUBLE) AS s_ed
        | FROM r)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |  CASE WHEN (n*s_qq - s_q*s_q) > 0 AND (n*s_ee - s_e*s_e) > 0 THEN
        |    least(greatest(round((n*s_qe - s_q*s_e)
        |      / sqrt((n*s_qq - s_q*s_q) * (n*s_ee - s_e*s_e)), 9), -1.0), 1.0)
        |  END AS spearman FROM s
        |UNION ALL SELECT 'l_quantity', 'l_discount',
        |  CASE WHEN (n*s_qq - s_q*s_q) > 0 AND (n*s_dd - s_d*s_d) > 0 THEN
        |    least(greatest(round((n*s_qd - s_q*s_d)
        |      / sqrt((n*s_qq - s_q*s_q) * (n*s_dd - s_d*s_d)), 9), -1.0), 1.0)
        |  END FROM s
        |UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |  CASE WHEN (n*s_ee - s_e*s_e) > 0 AND (n*s_dd - s_d*s_d) > 0 THEN
        |    least(greatest(round((n*s_ed - s_e*s_d)
        |      / sqrt((n*s_ee - s_e*s_e) * (n*s_dd - s_d*s_d)), 9), -1.0), 1.0)
        |  END FROM s""".stripMargin,
    "q106_merge_intervals" ->
      """WITH iv AS (
        | SELECT user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 1800 AS e
        | FROM events),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        | FROM iv),
        |g AS (SELECT user_id, s, e,
        |  sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        | FROM m)
        |SELECT user_id, min(s) AS start_s, max(e) AS end_s,
        | CAST(count(*) AS BIGINT) AS n_merged
        |FROM g GROUP BY user_id, grp""".stripMargin,
    "q107_rank_normalize" ->
      """WITH r AS (
        | SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER () AS n
        | FROM documents)
        |SELECT doc_id, n_chars,
        | (CAST(rn AS DOUBLE) - 0.5) / CAST(n AS DOUBLE) AS quantile
        |FROM r""".stripMargin,
    "q108_ks_drift" ->
      """WITH b AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 = 0),
        |a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 <> 0),
        |p AS (SELECT least((SELECT min(v) FROM b), (SELECT min(v) FROM a)) AS mn,
        |  greatest((SELECT max(v) FROM b), (SELECT max(v) FROM a)) AS mx),
        |pp AS (SELECT mn,
        |  CASE WHEN mx <= mn THEN CAST(1.0 AS DOUBLE) ELSE (mx - mn) / 20 END AS w,
        |  CASE WHEN mx <= mn THEN 1 ELSE 20 END AS nb FROM p),
        |bb AS (SELECT CAST(greatest(0, least(CAST(floor((v - pp.mn) / pp.w)
        |    AS BIGINT), CAST(pp.nb - 1 AS BIGINT))) AS INTEGER) AS bucket,
        |   count(*) AS n FROM b, pp GROUP BY 1),
        |ab AS (SELECT CAST(greatest(0, least(CAST(floor((v - pp.mn) / pp.w)
        |    AS BIGINT), CAST(pp.nb - 1 AS BIGINT))) AS INTEGER) AS bucket,
        |   count(*) AS n FROM a, pp GROUP BY 1),
        |f AS (SELECT CAST(range AS INTEGER) AS bucket FROM range(20)
        |  WHERE range < (SELECT nb FROM pp)),
        |t AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM b) AS tb,
        |  (SELECT CAST(count(*) AS DOUBLE) FROM a) AS ta),
        |c AS (SELECT f.bucket, COALESCE(bb.n, 0) AS cb, COALESCE(ab.n, 0) AS ca
        | FROM f LEFT JOIN bb USING (bucket) LEFT JOIN ab USING (bucket)),
        |cum AS (SELECT bucket,
        |  sum(cb) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS accb,
        |  sum(ca) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acca
        | FROM c),
        |d AS (SELECT max(abs(CAST(acca AS DOUBLE) / ta
        |   - CAST(accb AS DOUBLE) / tb)) AS ks FROM cum, t)
        |SELECT CAST(tb AS BIGINT) AS n_before, CAST(ta AS BIGINT) AS n_after,
        | round(ks, 9) AS ks_d,
        | round(CAST(1.3581 AS DOUBLE) * sqrt((tb + ta) / (tb * ta)), 9)
        |   AS critical_95,
        | round(ks, 9) > round(CAST(1.3581 AS DOUBLE)
        |   * sqrt((tb + ta) / (tb * ta)), 9) AS drifted
        |FROM d, t""".stripMargin,
    "q105_degree_stats" ->
      """WITH e AS (SELECT doc_id % 53 AS src, (doc_id * 7 + 11) % 53 AS dst
        | FROM documents),
        |tagged AS (
        | SELECT src AS node, dst AS o, 1 AS is_out FROM e
        | UNION ALL
        | SELECT dst AS node, src AS o, 0 AS is_out FROM e)
        |SELECT node,
        | CAST(sum(is_out) AS BIGINT) AS out_deg,
        | CAST(sum(1 - is_out) AS BIGINT) AS in_deg,
        | CAST(count(DISTINCT CASE WHEN is_out = 1 THEN o END) AS BIGINT)
        |   AS out_neighbors,
        | CAST(count(DISTINCT CASE WHEN is_out = 0 THEN o END) AS BIGINT)
        |   AS in_neighbors
        |FROM tagged GROUP BY node""".stripMargin,
    "t38_gopher_rules" ->
      """WITH injected AS (
        | SELECT doc_id,
        |  concat(
        |   CASE WHEN doc_id % 5 = 0 THEN substr(coalesce(text, ''), 1, 60)
        |        ELSE coalesce(text, '') END,
        |   CASE WHEN doc_id % 4 = 1 THEN ' ### ## #' ELSE '' END,
        |   CASE WHEN doc_id % 4 = 2
        |        THEN chr(10) || '- item one' || chr(10) || '- item two'
        |          || chr(10) || '• third' ELSE '' END,
        |   CASE WHEN doc_id % 4 = 3 THEN ' wait... more...' ELSE '' END) AS text
        | FROM documents),
        |m AS (
        | SELECT doc_id, text,
        |  list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> length(w) > 0) AS words,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> length(l) > 0) AS lines
        | FROM injected),
        |m2 AS (
        | SELECT doc_id, text, words, lines, len(words) AS nw, len(lines) AS nl,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |     / len(words) ELSE 0.0 END AS mean_word_len,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
        |     / len(words) ELSE 0.0 END AS symbol_ratio,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST((length(text) - length(regexp_replace(text, '\.\.\.', '', 'g')))
        |     / 3 AS DOUBLE) / len(words) ELSE 0.0 END AS ellipsis_ratio,
        |  CASE WHEN len(lines) > 0 THEN
        |   CAST(len(list_filter(lines, l -> starts_with(l, '•')
        |     OR starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE)
        |     / len(lines) ELSE 0.0 END AS bullet_line_frac,
        |  CASE WHEN len(lines) > 0 THEN
        |   CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
        |     / len(lines) ELSE 0.0 END AS ellipsis_line_frac,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}')))
        |     AS DOUBLE) / len(words) ELSE 0.0 END AS alpha_word_frac,
        |  len(list_intersect(list_transform(words, w -> lower(w)),
        |   ['the','be','to','of','and','that','have','with'])) AS n_stop_hits
        | FROM m)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, mean_word_len,
        | symbol_ratio, ellipsis_ratio, bullet_line_frac, ellipsis_line_frac,
        | alpha_word_frac, CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
        | (nw >= 20 AND nw <= 100000) AS rule_words,
        | (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_word_len,
        | (symbol_ratio <= 0.1) AS rule_symbols,
        | (ellipsis_ratio <= 0.1) AS rule_ellipsis,
        | (bullet_line_frac <= 0.9) AS rule_bullets,
        | (ellipsis_line_frac <= 0.3) AS rule_line_ellipsis,
        | (alpha_word_frac >= 0.8) AS rule_alpha,
        | (n_stop_hits >= 2) AS rule_stopwords,
        | ((nw >= 20 AND nw <= 100000)
        |  AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |  AND symbol_ratio <= 0.1 AND ellipsis_ratio <= 0.1
        |  AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        |  AND alpha_word_frac >= 0.8 AND n_stop_hits >= 2) AS passes
        |FROM m2""".stripMargin,
    "t39_c4_clean" ->
      """WITH injected AS (
        | SELECT doc_id,
        |  concat(coalesce(text, ''), '.',
        |   chr(10) || 'short line' || chr(10),
        |   'This middle line has some javascript code in it.' || chr(10),
        |   'This is a good second sentence with enough words!',
        |   CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'bad { brace }'
        |        ELSE '' END,
        |   CASE WHEN doc_id % 11 = 0
        |        THEN chr(10) || 'Lorem Ipsum dolor sit amet.'
        |        ELSE '' END) AS text
        | FROM documents),
        |m AS (
        | SELECT doc_id, text,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> length(l) > 0) AS nonblank
        | FROM injected),
        |m2 AS (
        | SELECT doc_id, text, nonblank,
        |  list_filter(nonblank, l ->
        |   substr(l, -1, 1) IN ('.', '!', '?', '"')
        |   AND len(list_filter(string_split_regex(l, '\s+'),
        |     w -> length(w) > 0)) >= 3
        |   AND NOT contains(lower(l), 'javascript')) AS kept_lines
        | FROM m),
        |m3 AS (
        | SELECT doc_id, text, nonblank, kept_lines,
        |  array_to_string(kept_lines, chr(10)) AS cleaned
        | FROM m2)
        |SELECT doc_id, cleaned AS text,
        | CAST(len(kept_lines) AS BIGINT) AS n_lines_kept,
        | CAST(len(nonblank) - len(kept_lines) AS BIGINT) AS n_lines_dropped,
        | (NOT contains(text, '{') AND NOT contains(text, '}')
        |  AND NOT contains(lower(text), 'lorem ipsum')
        |  AND length(cleaned) - length(regexp_replace(cleaned, '[.!?]', '', 'g'))
        |    >= 3) AS kept
        |FROM m3""".stripMargin,
    "t37_link_graph" ->
      (s"""WITH injected AS (
        | SELECT lower(concat('Host', CAST(doc_id % 11 AS VARCHAR),
        |   '.Example.COM')) AS src,
        |  concat(coalesce(text, ''), ' see https://site',
        |   CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |   CAST(doc_id AS VARCHAR), ' and http://CDN.example.net/x',
        |   CASE WHEN doc_id % 3 = 0
        |     THEN ' plus https://host1.example.com/self' ELSE '' END) AS text
        | FROM documents),
        |hits AS (
        | SELECT src, lower(unnest(regexp_extract_all(text,
        |  '${graft.functions.TextFunctions.UrlRegex}', 1))) AS dst
        | FROM injected)
        |SELECT src, dst, CAST(count(*) AS BIGINT) AS n_links
        |FROM hits GROUP BY 1, 2""").stripMargin,
    "q102_cat_drift" ->
      """WITH b AS (SELECT CAST(lang AS VARCHAR) AS cat
        |  FROM documents WHERE doc_id % 2 = 0),
        |a AS (SELECT CAST(lang AS VARCHAR) AS cat
        |  FROM documents WHERE doc_id % 2 <> 0),
        |bc AS (SELECT cat, CAST(count(*) AS BIGINT) AS nb FROM b GROUP BY 1),
        |ac AS (SELECT cat, CAST(count(*) AS BIGINT) AS na FROM a GROUP BY 1),
        |cats AS (SELECT cat FROM bc UNION SELECT cat FROM ac),
        |t AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM b) AS tb,
        |  (SELECT CAST(count(*) AS DOUBLE) FROM a) AS ta)
        |SELECT cats.cat AS category,
        | CAST(COALESCE(bc.nb, 0) AS BIGINT) AS n_before,
        | CAST(COALESCE(ac.na, 0) AS BIGINT) AS n_after,
        | round((greatest(COALESCE(ac.na, 0) / ta, 1e-6)
        |    - greatest(COALESCE(bc.nb, 0) / tb, 1e-6))
        |  * ln(greatest(COALESCE(ac.na, 0) / ta, 1e-6)
        |    / greatest(COALESCE(bc.nb, 0) / tb, 1e-6)), 9) AS psi
        |FROM cats
        |LEFT JOIN bc ON cats.cat IS NOT DISTINCT FROM bc.cat
        |LEFT JOIN ac ON cats.cat IS NOT DISTINCT FROM ac.cat
        |CROSS JOIN t""".stripMargin,
    "t35_bm25" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        | FROM documents),
        |toks AS (SELECT doc_id, tok FROM toks0 WHERE length(tok) > 0),
        |postings AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
        |dfreq AS (SELECT tok, count(*) AS df FROM postings GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |qt0 AS (
        | SELECT doc_id AS query_id,
        |  unnest(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1, 4)) AS tok
        | FROM documents WHERE doc_id % 23 = 0),
        |qt AS (SELECT query_id, tok, count(*) AS qtf FROM qt0
        | WHERE length(tok) > 0 GROUP BY 1, 2),
        |contrib AS (
        | SELECT q.query_id, p.doc_id,
        |  round(CAST(q.qtf AS DOUBLE)
        |   * ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |   * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |   / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |      * (1.0 - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / s.avgdl)), 9) AS c
        | FROM postings p
        | JOIN qt q USING (tok)
        | JOIN dfreq USING (tok)
        | JOIN dl d ON p.doc_id = d.doc_id
        | CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(c AS DECIMAL(25,10))) AS DOUBLE) AS score
        | FROM contrib GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY score DESC, doc_id ASC) AS rank
        | FROM scored) x WHERE rank <= 10""".stripMargin,
    "d17_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa
        | FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/sa AS containment
        |FROM pairs WHERE CAST(inter AS DOUBLE)/sa >= 0.5""".stripMargin,
    "q103_gap_fill" ->
      """WITH obs AS (
        | SELECT event_type,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 AS e,
        |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS v
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |spans AS (SELECT event_type, min(e) AS lo, max(e) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT event_type, unnest(range(lo, hi + 1, 1800)) AS e FROM spans),
        |j AS (SELECT g.event_type, g.e, o.v
        | FROM grid g LEFT JOIN obs o ON g.event_type = o.event_type AND g.e = o.e),
        |f AS (SELECT event_type, e, v,
        |  last_value(v IGNORE NULLS) OVER w AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS) OVER w AS pe,
        |  first_value(v IGNORE NULLS) OVER w2 AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS) OVER w2 AS ne
        | FROM j WINDOW
        |  w AS (PARTITION BY event_type ORDER BY e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY event_type ORDER BY e
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type,
        | CAST(to_timestamp(e) AS TIMESTAMP) AS bucket_start,
        | coalesce(v, pv + (nv - pv)
        |   * (CAST(e - pe AS DOUBLE) / CAST(ne - pe AS DOUBLE))) AS value,
        | (v IS NULL) AS filled
        |FROM f""".stripMargin,
    "t36_trigram_ce" ->
      """WITH base AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> length(x) > 0) AS w
        | FROM documents),
        |tri AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |   i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) AS t
        | FROM base WHERE len(w) >= 3),
        |trips AS (SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3 FROM tri),
        |pairs AS (
        | SELECT unnest(list_transform(range(1, len(w)),
        |   i -> {'p1': w[i], 'p2': w[i+1]})) AS p
        | FROM base WHERE len(w) >= 2),
        |c12 AS (SELECT p.p1 AS p1, p.p2 AS p2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |c12ctx AS (SELECT w1, w2, count(*) AS c12a FROM trips GROUP BY 1, 2),
        |ctx1 AS (SELECT p.p1 AS p1, count(*) AS c2 FROM pairs GROUP BY 1),
        |toks AS (SELECT unnest(w) AS tok FROM base),
        |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
        |nv AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM toks),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM trips GROUP BY 1, 2, 3),
        |scored AS (
        | SELECT trips.doc_id,
        |  round(ln(
        |    CAST(0.7 AS DOUBLE)
        |      * (CAST(c123.c123 AS DOUBLE) / CAST(b12.c12a AS DOUBLE))
        |    + CAST(0.2 AS DOUBLE)
        |      * (CAST(coalesce(b23.c12, 0) AS DOUBLE) / CAST(x2.c2 AS DOUBLE))
        |    + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE) - CAST(0.2 AS DOUBLE))
        |      * (CAST(u3.c1 + 1 AS DOUBLE) / CAST(nv.n + nv.v AS DOUBLE))), 9) AS lp
        | FROM trips
        | JOIN c123 ON trips.w1 = c123.w1 AND trips.w2 = c123.w2 AND trips.w3 = c123.w3
        | JOIN c12ctx b12 ON trips.w1 = b12.w1 AND trips.w2 = b12.w2
        | LEFT JOIN c12 b23 ON trips.w2 = b23.p1 AND trips.w3 = b23.p2
        | JOIN ctx1 x2 ON trips.w2 = x2.p1
        | JOIN uni u3 ON trips.w3 = u3.tok
        | CROSS JOIN nv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        | -CAST(sum(CAST(lp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS trigram_ce
        |FROM scored GROUP BY doc_id""".stripMargin,
    "q99_corpus_overlap" ->
      """WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0),
        |b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 <> 0)
        |SELECT
        | (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
        | (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT text FROM a UNION SELECT text FROM b)) AS n_union,
        | (SELECT CAST(count(*) AS BIGINT) FROM
        |   (SELECT text FROM a INTERSECT SELECT text FROM b)) AS n_inter,
        | CAST(1 AS BIGINT) AS est_ok""".stripMargin,
    "q96_resample" ->
      """SELECT event_type,
        |  CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900)
        |    AS BIGINT) * 900) AS TIMESTAMP) AS bucket_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q97_rolling" ->
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS total_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q90_outliers" ->
      """WITH s AS (
        |  SELECT o_orderstatus,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |      / count(o_totalprice), 9) AS m,
        |    round(sqrt(greatest(
        |      CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(28,6)))
        |        AS DOUBLE) / count(o_totalprice)
        |      - (CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |          / count(o_totalprice))
        |        * (CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        |          / count(o_totalprice)),
        |      0.0)), 9) AS sd
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.o_orderstatus,
        |  CASE WHEN s.sd > 0 THEN round((o.o_totalprice - s.m) / s.sd, 6)
        |       ELSE 0.0 END AS zscore,
        |  CASE WHEN s.sd > 0
        |       THEN abs(round((o.o_totalprice - s.m) / s.sd, 6)) > 2.5
        |       ELSE FALSE END AS is_outlier
        |FROM orders o JOIN s USING (o_orderstatus)""".stripMargin,
    "q91_stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |  AND CAST(p.ts AS TIMESTAMP)
        |      <= CAST(c.ts AS TIMESTAMP) + INTERVAL 10 MINUTE""".stripMargin,
    "q93_sql_quality" ->
      """SELECT 'not_null' AS "constraint", 'o_orderkey' AS "column",
        | CAST(count(*) - count(o_orderkey) AS DOUBLE) AS metric,
        | count(*) = count(o_orderkey) AS passed FROM orders
        |UNION ALL SELECT 'unique', 'o_orderkey',
        | CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS DOUBLE),
        | count(o_orderkey) = count(DISTINCT o_orderkey) FROM orders
        |UNION ALL SELECT 'in_set>=1.0', 'o_orderstatus',
        | round(CAST(count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END)
        |   AS DOUBLE) / count(o_orderstatus), 9),
        | round(CAST(count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END)
        |   AS DOUBLE) / count(o_orderstatus), 9) >= 1.0 FROM orders
        |UNION ALL SELECT 'distinct[1,5]', 'o_orderstatus',
        | CAST(count(DISTINCT o_orderstatus) AS DOUBLE),
        | count(DISTINCT o_orderstatus) BETWEEN 1 AND 5 FROM orders
        |UNION ALL SELECT 'min>=0.0', 'o_totalprice',
        | CAST(min(o_totalprice) AS DOUBLE), min(o_totalprice) >= 0.0
        | FROM orders""".stripMargin,
    "q94_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |            FROM orders),
        |b AS (SELECT CAST(least(CAST(floor((o_totalprice - mn)
        |        / ((mx - mn) / 20)) AS INTEGER), 19) AS INTEGER) AS bucket
        |      FROM orders, mm WHERE o_totalprice IS NOT NULL),
        |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
        |g AS (SELECT CAST(r.range AS INTEGER) AS bucket, mn, mx
        |      FROM range(20) r CROSS JOIN mm)
        |SELECT g.bucket,
        |  mn + g.bucket * ((mx - mn) / 20) AS lo,
        |  mn + (g.bucket + 1) * ((mx - mn) / 20) AS hi,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM g LEFT JOIN c ON c.bucket = g.bucket""".stripMargin,
    "q95_correlation" ->
      """WITH s AS (SELECT
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s_q,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s_e,
        |  CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s_d,
        |  CAST(sum(CAST(l_tax AS DECIMAL(28,6))) AS DOUBLE) AS s_t,
        |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s_qq,
        |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s_ee,
        |  CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s_dd,
        |  CAST(sum(CAST(l_tax * l_tax AS DECIMAL(28,6))) AS DOUBLE) AS s_tt,
        |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s_qe,
        |  CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s_qd,
        |  CAST(sum(CAST(l_quantity * l_tax AS DECIMAL(28,6))) AS DOUBLE) AS s_qt,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s_ed,
        |  CAST(sum(CAST(l_extendedprice * l_tax AS DECIMAL(28,6))) AS DOUBLE) AS s_et,
        |  CAST(sum(CAST(l_discount * l_tax AS DECIMAL(28,6))) AS DOUBLE) AS s_dt
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |  CASE WHEN (n*s_qq - s_q*s_q) > 0 AND (n*s_ee - s_e*s_e) > 0 THEN
        |    least(greatest(round((n*s_qe - s_q*s_e)
        |      / sqrt((n*s_qq - s_q*s_q) * (n*s_ee - s_e*s_e)), 9), -1.0), 1.0) END AS corr
        |FROM s
        |UNION ALL SELECT 'l_quantity', 'l_discount',
        |  CASE WHEN (n*s_qq - s_q*s_q) > 0 AND (n*s_dd - s_d*s_d) > 0 THEN
        |    least(greatest(round((n*s_qd - s_q*s_d)
        |      / sqrt((n*s_qq - s_q*s_q) * (n*s_dd - s_d*s_d)), 9), -1.0), 1.0) END FROM s
        |UNION ALL SELECT 'l_quantity', 'l_tax',
        |  CASE WHEN (n*s_qq - s_q*s_q) > 0 AND (n*s_tt - s_t*s_t) > 0 THEN
        |    least(greatest(round((n*s_qt - s_q*s_t)
        |      / sqrt((n*s_qq - s_q*s_q) * (n*s_tt - s_t*s_t)), 9), -1.0), 1.0) END FROM s
        |UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |  CASE WHEN (n*s_ee - s_e*s_e) > 0 AND (n*s_dd - s_d*s_d) > 0 THEN
        |    least(greatest(round((n*s_ed - s_e*s_d)
        |      / sqrt((n*s_ee - s_e*s_e) * (n*s_dd - s_d*s_d)), 9), -1.0), 1.0) END FROM s
        |UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |  CASE WHEN (n*s_ee - s_e*s_e) > 0 AND (n*s_tt - s_t*s_t) > 0 THEN
        |    least(greatest(round((n*s_et - s_e*s_t)
        |      / sqrt((n*s_ee - s_e*s_e) * (n*s_tt - s_t*s_t)), 9), -1.0), 1.0) END FROM s
        |UNION ALL SELECT 'l_discount', 'l_tax',
        |  CASE WHEN (n*s_dd - s_d*s_d) > 0 AND (n*s_tt - s_t*s_t) > 0 THEN
        |    least(greatest(round((n*s_dt - s_d*s_t)
        |      / sqrt((n*s_dd - s_d*s_d) * (n*s_tt - s_t*s_t)), 9), -1.0), 1.0) END FROM s""".stripMargin,
    "q92_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        |a AS (
        |  SELECT o_orderkey,
        |    o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 1.0 ELSE 0.0 END
        |      AS o_totalprice
        |  FROM o WHERE o_orderkey % 100 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 1.0 FROM o WHERE o_orderkey % 500 = 0)
        |SELECT coalesce(o.o_orderkey, a.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN a.o_orderkey IS NULL THEN 'removed'
        |       WHEN o.o_totalprice IS DISTINCT FROM a.o_totalprice
        |         THEN 'changed'
        |       ELSE 'unchanged' END AS change
        |FROM o FULL JOIN a ON o.o_orderkey = a.o_orderkey
        |WHERE NOT (o.o_orderkey IS NOT NULL AND a.o_orderkey IS NOT NULL
        |           AND o.o_totalprice IS NOT DISTINCT FROM a.o_totalprice)""".stripMargin,
    "q76_zorder_layout" ->
      "SELECT event_id, user_id, value FROM events",
    "q77_stream_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |marked AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        | SELECT user_id, ts,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    "t09_fingerprint_consistency" -> "SELECT CAST(1 AS BIGINT) AS fp_ok",
    "d10_cc_paths_agree" -> "SELECT CAST(1 AS BIGINT) AS cc_ok",
    "d11_dedup_best" -> "SELECT CAST(1 AS BIGINT) AS best_ok",
    // the oracle applies the SAME patterns (generated from PiiPatterns —
    // RE2-safe by construction) to the same injected text
    "t07_pii_redact" ->
      s"SELECT doc_id, ${sqlRedacted(SqlInjectedPii)} AS redacted FROM documents",
    "q60_sql_curation" -> SqlCurationOracle,
    "q61_stream_curation" -> SqlCurationOracle,
    "t08_chunking" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        | FROM documents WHERE length(regexp_replace(text, '\s', '', 'g')) > 0),
        |c AS (
        | SELECT doc_id, w,
        |  greatest(1, CAST(ceil((len(w) - 10) / 40.0) AS INT)) AS m
        | FROM t),
        |j AS (
        | SELECT doc_id, w, unnest(generate_series(0, m - 1)) AS cid FROM c)
        |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        | array_to_string(w[cid*40+1 : cid*40+50], ' ') AS chunk_text,
        | CAST(len(w[cid*40+1 : cid*40+50]) AS INTEGER) AS n_tokens
        |FROM j""".stripMargin,
    "s06_semantic_dedup" -> "SELECT CAST(1 AS BIGINT) AS sem_ok",
    "s07_kmeans_cluster" -> "SELECT CAST(1 AS BIGINT) AS cluster_ok",
    "s08_knn_ivfpq" ->
      "SELECT CAST(1 AS BIGINT) AS full_budget_exact, CAST(1 AS BIGINT) AS adc_signal_ok",
    "s09_ann_join" ->
      "SELECT CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS coverage_ok",
    "s12_pca" -> "SELECT CAST(1 AS BIGINT) AS pca_ok",
    // first-principles margin-mining oracle: full cosine matrix over the
    // halves, top-4 neighborhoods by raw cosine (tie: id), cosines
    // rounded to 7 digits before the decimal-bridged 4-average (the
    // engine's declared precision), margin quantized by the engine's
    // exact IEEE recipe floor(x*1e5 + 0.5)/1e5 (library round()s
    // disagree on .5-boundary doubles), argmax per src
    "s15_bitext_margin" ->
      """WITH a AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings WHERE vec_id % 2 = 1),
        |ab0 AS (SELECT a.vec_id AS qa, b.vec_id AS nb,
        |  round(list_cosine_similarity(a.v, b.v), 7) AS c7,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |      b.vec_id ASC) AS rk
        | FROM a, b),
        |ab AS (SELECT * FROM ab0 WHERE rk <= 4),
        |ba0 AS (SELECT b.vec_id AS qb, a.vec_id AS na,
        |  round(list_cosine_similarity(b.v, a.v), 7) AS c7,
        |  row_number() OVER (PARTITION BY b.vec_id
        |    ORDER BY list_cosine_similarity(b.v, a.v) DESC,
        |      a.vec_id ASC) AS rk
        | FROM a, b),
        |ba AS (SELECT * FROM ba0 WHERE rk <= 4),
        |aavg AS (SELECT qa,
        |  CAST(sum(CAST(c7 AS DECIMAL(25,10))) AS DOUBLE)/4.0 AS a_avg
        | FROM ab GROUP BY qa),
        |bavg AS (SELECT qb,
        |  CAST(sum(CAST(c7 AS DECIMAL(25,10))) AS DOUBLE)/4.0 AS b_avg
        | FROM ba GROUP BY qb),
        |sc AS (SELECT ab.qa, ab.nb,
        |  floor(ab.c7 / (0.5*(aavg.a_avg + bavg.b_avg)) * 100000.0 + 0.5)
        |    / 100000.0 AS margin
        | FROM ab JOIN aavg USING (qa) JOIN bavg ON ab.nb = bavg.qb)
        |SELECT qa AS src_id, nb AS tgt_id, margin FROM (
        | SELECT *, row_number() OVER (PARTITION BY qa
        |   ORDER BY margin DESC, nb ASC) AS mr FROM sc) z
        |WHERE mr = 1""".stripMargin,
    // the exact side mines one pair per src (minMargin -inf keeps every
    // src); the approx-vs-exact agreement verdict is the engine's to
    // earn — the oracle pins the exact-pair count and the declared bound
    "s15x_margin_approx" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        | CAST(1 AS BIGINT) AS pair_agreement_ok
        |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin,
    // first-principles hybrid-RRF oracle: recompute the BM25 top-20 (the
    // t35 formulation, k1=1.2 b=0.75, contributions rounded to 9 digits
    // and decimal-summed), the dense cosine top-20 (the s01 formulation,
    // self excluded), then fuse with round(1/(60+rank), 12) summed
    // through decimal(25,12) — the engine's declared determinism bridge
    "s14_hybrid_rrf" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        | FROM documents),
        |toks AS (SELECT doc_id, tok FROM toks0 WHERE length(tok) > 0),
        |postings AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
        |dfreq AS (SELECT tok, count(*) AS df FROM postings GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |qt0 AS (
        | SELECT doc_id AS query_id,
        |  unnest(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1, 4)) AS tok
        | FROM documents WHERE doc_id % 23 = 0),
        |qt AS (SELECT query_id, tok, count(*) AS qtf FROM qt0
        | WHERE length(tok) > 0 GROUP BY 1, 2),
        |contrib AS (
        | SELECT q.query_id, p.doc_id,
        |  round(CAST(q.qtf AS DOUBLE)
        |   * ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |   * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |   / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |      * (1.0 - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / s.avgdl)), 9) AS c
        | FROM postings p
        | JOIN qt q USING (tok)
        | JOIN dfreq USING (tok)
        | JOIN dl d ON p.doc_id = d.doc_id
        | CROSS JOIN stats s),
        |bscored AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(c AS DECIMAL(25,10))) AS DOUBLE) AS score
        | FROM contrib GROUP BY 1, 2),
        |lexical AS (SELECT query_id, rank, doc_id FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY score DESC, doc_id ASC) AS rank
        | FROM bscored) x WHERE rank <= 20),
        |dense AS (SELECT query_id, rank, doc_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
        |      e.vec_id) AS rank
        | FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id % 23 = 0) q
        | WHERE e.vec_id <> q.vec_id) y WHERE rank <= 20),
        |fused AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(round(1.0/(60 + rank), 12) AS DECIMAL(25,12)))
        |    AS DOUBLE) AS rrf
        | FROM (SELECT * FROM lexical UNION ALL SELECT * FROM dense)
        | GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, rrf FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY rrf DESC, doc_id ASC) AS rank
        | FROM fused) z WHERE rank <= 10""".stripMargin,
    "s13_quantize" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |q AS (SELECT vec_id, v, list_min(v) AS qmin,
        |  (list_max(v) - list_min(v)) / 255.0 AS qscale FROM e)
        |SELECT vec_id, qmin, qscale,
        | array_to_string(CASE WHEN qscale = 0
        |  THEN list_transform(v, x -> CAST(-128 AS INTEGER))
        |  ELSE list_transform(v,
        |   x -> CAST(round((x - qmin) / qscale) - 128 AS INTEGER)) END,
        |  ',') AS codes
        |FROM q""".stripMargin,
    "s11_hard_negatives" ->
      """WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 50),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding, b.embedding) AS cosine
        |  FROM sub a JOIN sub b
        |    ON a.vec_id <> b.vec_id AND a.label IS DISTINCT FROM b.label),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""".stripMargin,
    "s10_semantic_decontaminate" ->
      """SELECT e.vec_id FROM embeddings e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings v
        |  WHERE v.vec_id % 50 = 0
        |    AND list_cosine_similarity(e.embedding, v.embedding) >= 0.99)""".stripMargin,
    "t21_bpe" -> "SELECT CAST(1 AS BIGINT) AS bpe_ok",
    "t22_url_domains" ->
      (s"""WITH injected AS (
        | SELECT doc_id, concat(coalesce(text, ''), ' see https://site',
        |  CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |  CAST(doc_id AS VARCHAR), ' and http://cdn.example.net/img.jpg') AS text
        | FROM documents),
        |hits AS (
        | SELECT doc_id,
        |  unnest(regexp_extract_all(text, '${graft.functions.TextFunctions.UrlRegex}', 1)) AS domain
        | FROM injected),
        |per_doc AS (SELECT domain, doc_id, count(*) AS n FROM hits GROUP BY 1, 2)
        |SELECT domain, CAST(sum(n) AS BIGINT) AS n_urls,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM per_doc GROUP BY domain""").stripMargin,
    "t23_line_dedup" ->
      """WITH docs AS (
        | SELECT doc_id, concat(coalesce(text, ''), chr(10),
        |  'subscribe to our newsletter', chr(10),
        |  substr(coalesce(text, ''), 1, 40),
        |  CASE WHEN doc_id % 2 = 0 THEN concat(chr(10), 'all rights reserved')
        |   ELSE '' END) AS mtext
        | FROM documents),
        |sp AS (SELECT doc_id, string_split(mtext, chr(10)) AS ls FROM docs),
        |lines AS (SELECT doc_id, unnest(ls) AS l,
        |  generate_subscripts(ls, 1) AS pos FROM sp),
        |banned AS (
        | SELECT trim(l) AS nl FROM lines WHERE length(trim(l)) > 0
        | GROUP BY 1 HAVING count(DISTINCT doc_id) > 5),
        |kept AS (
        | SELECT doc_id, pos, l FROM lines
        | WHERE length(trim(l)) = 0 OR trim(l) NOT IN (SELECT nl FROM banned))
        |SELECT s.doc_id,
        | coalesce(k.dedup_text, '') AS dedup_text,
        | CAST(len(s.ls) AS BIGINT) AS n_lines,
        | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
        |FROM sp s LEFT JOIN (
        | SELECT doc_id, string_agg(l, chr(10) ORDER BY pos) AS dedup_text,
        |  count(*) AS n_kept FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin,
    // chr(769)=U+0301 combining acute, chr(778)=U+030A combining ring,
    // chr(233)=U+00E9 composed é — mirrors the Spark-side injected escapes
    "t27_normalize_unicode" ->
      """SELECT doc_id,
        | nfc_normalize(concat(coalesce(text, ''), ' cafe', chr(769), ' A',
        |  chr(778), ' caf', chr(233))) AS norm_text,
        | TRUE AS nfd_roundtrip_ok, TRUE AS nfkc_ok
        |FROM documents""".stripMargin,
    "t28_url_canon" ->
      s"""WITH injected AS (
        | SELECT doc_id, CASE
        |  WHEN doc_id % 4 = 0 THEN concat('HTTP://Site',
        |   CAST(doc_id % 5 AS VARCHAR),
        |   '.Example.ORG:80/a/b?utm_campaign=x&q=', CAST(doc_id AS VARCHAR),
        |   '#top')
        |  WHEN doc_id % 4 = 1 THEN 'https://cdn.example.net:443/?utm_source=a'
        |  WHEN doc_id % 4 = 2 THEN concat('ftp://Files.example.com/data/',
        |   CAST(doc_id AS VARCHAR))
        |  ELSE concat('  not a url ', CAST(doc_id AS VARCHAR), '  ') END AS url
        | FROM documents),
        |c1 AS (SELECT doc_id, url, trim(url) AS u FROM injected),
        |c2 AS (SELECT *,
        |  lower(regexp_extract(u, '${TextFunctions.UrlSchemeRegex}', 1)) AS scheme,
        |  lower(regexp_extract(u, '${TextFunctions.UrlHostPortRegex}', 1)) AS hostport,
        |  regexp_extract(u, '${TextFunctions.UrlRestRegex}', 1) AS rest0 FROM c1),
        |c3 AS (SELECT *,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
        |   WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
        |   ELSE hostport END AS host,
        |  regexp_replace(regexp_replace(rest0,
        |    '${TextFunctions.TrackAmpRegex}', '', 'g'),
        |   '${TextFunctions.TrackFirstRegex}', '?', 'g') AS rest2 FROM c2),
        |c4 AS (SELECT *, regexp_replace(regexp_replace(rest2, '\\?&', '?', 'g'),
        |  '[?&]$$', '') AS rest4 FROM c3)
        |SELECT doc_id, url, CASE WHEN scheme = '' THEN u
        | ELSE concat(scheme, '://', host,
        |  CASE WHEN rest4 = '' THEN '/' ELSE rest4 END) END AS canon_url
        |FROM c4""".stripMargin,
    "t29_domain_blocklist" ->
      s"""WITH injected AS (
        | SELECT doc_id, CASE
        |  WHEN doc_id % 4 = 0 THEN concat('https://site',
        |   CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |   CAST(doc_id AS VARCHAR))
        |  WHEN doc_id % 4 = 1 THEN 'http://cdn.example.net/img.jpg'
        |  WHEN doc_id % 4 = 2 THEN 'https://keep.example.com/ok'
        |  ELSE 'https://notexample.net/a' END AS url
        | FROM documents),
        |h AS (SELECT doc_id, url,
        |  lower(regexp_extract(trim(url), '${TextFunctions.UrlHostRegex}', 1)) AS host
        | FROM injected)
        |SELECT doc_id, url FROM h
        |WHERE NOT (host = 'example.net' OR host LIKE '%.example.net'
        |  OR host = 'site3.example.org' OR host LIKE '%.site3.example.org')""".stripMargin,
    // chr(233)=é, chr(8217)=', chr(8364)=€ — the uncorrupted construction;
    // the corruption+repair happen Spark-side and must invert exactly
    "t31_fix_mojibake" ->
      """SELECT doc_id,
        | concat(coalesce(text, ''), ' caf', chr(233), ' ', chr(8217),
        |  'quote', chr(8217), ' ', chr(8364), '9', ' ', chr(8217))
        |  AS repaired,
        | TRUE AS was_corrupted
        |FROM documents""".stripMargin,
    "t32_html_extract" ->
      s"""WITH h AS (SELECT doc_id,
        | concat('<!DOCTYPE html><html><head><title>Doc ',
        |  CAST(doc_id AS VARCHAR),
        |  '</title><style type="text/css">body { color: #fff; }</style>',
        |  '<script>var x = 1; if (x < 2) { x = "a > b"; }</script></head>',
        |  '<body><nav class="menu"><a href="/">Home</a> ',
        |  '<a href="/about">About us</a>',
        |  CASE WHEN doc_id % 3 = 0
        |   THEN ' <a href="/archive">Archive of older posts</a>'
        |   ELSE '' END,
        |  '</nav><h1>Title &amp; intro &amp;lt;escaped&amp;gt;</h1><p>',
        |  coalesce(text, ''),
        |  '</p><!-- tracking --><div class="footer">&copy; Example',
        |  '&nbsp;Co &#39;quoted&#39; <a href="/contact">Contact</a></div>',
        |  '</body></html>') AS html
        | FROM documents),
        |x AS (SELECT doc_id,
        |  ${sqlHtmlText("html")} AS text,
        |  ${sqlHtmlText(
             "array_to_string(regexp_extract_all(html, '" +
               graft.functions.TextFunctions.HtmlAnchorRegex + "', 1), ' ')")}
        |   AS atext,
        |  len(regexp_extract_all(html,
        |   '${graft.functions.TextFunctions.HtmlAnchorRegex}', 0)) AS n_links
        | FROM h)
        |SELECT doc_id, text,
        | CAST(n_links AS BIGINT) AS n_links,
        | CAST(length(atext) AS BIGINT) AS link_chars,
        | CAST(length(text) AS BIGINT) AS text_chars,
        | CASE WHEN length(text) > 0
        |  THEN CAST(length(atext) AS DOUBLE) / length(text)
        |  ELSE 0.0 END AS link_density
        |FROM x""".stripMargin,
    "t30_bigram_ce" ->
      """WITH toks0 AS (
        | SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |   x -> length(x) > 0) AS w
        | FROM documents),
        |b AS (SELECT doc_id, w FROM toks0 WHERE len(w) >= 2),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM b),
        |pr AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM ix),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pr GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> length(x) > 0)) AS tok FROM documents)),
        |lp AS (
        | SELECT doc_id,
        |  ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)) - ln(CAST(c1 + v AS DOUBLE)) AS lp
        | FROM pr JOIN c1 USING (w1) LEFT JOIN c12 USING (w1, w2), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        | -CAST(sum(CAST(lp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS bigram_ce
        |FROM lp GROUP BY doc_id""".stripMargin,
    "q69_row_index" ->
      """SELECT o_orderkey, o_totalprice,
        | CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_index
        |FROM orders""".stripMargin,
    "q66_profile" ->
      """WITH p AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_orderpriority FROM orders)
        |SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        | CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        | CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM p
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        | CAST(count(*) - count(o_custkey) AS BIGINT),
        | CAST(count(DISTINCT o_custkey) AS BIGINT),
        | CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM p
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        | CAST(count(*) - count(o_orderstatus) AS BIGINT),
        | CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        | min(o_orderstatus), max(o_orderstatus) FROM p
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        | CAST(count(*) - count(o_orderpriority) AS BIGINT),
        | CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        | min(o_orderpriority), max(o_orderpriority) FROM p""".stripMargin,
    "t18_clean_text" ->
      s"SELECT doc_id, ${sqlCleaned(SqlInjectedDirty)} AS cleaned FROM documents",
    "t19_encode" ->
      """WITH vt AS (
        | SELECT unnest(string_split_regex(trim(lower(text)),'\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM vt
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2),
        |vocab AS (SELECT token, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS w
        | FROM documents),
        |tk0 AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w FROM t),
        |tk AS (SELECT doc_id, pos, w[pos] AS tok FROM tk0 WHERE length(w[pos]) > 0)
        |SELECT doc_id,
        | array_to_string(
        |   list(CAST(coalesce(v.token_id, -1) AS BIGINT) ORDER BY pos),
        |   ' ') AS ids_str,
        | CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM tk LEFT JOIN vocab v ON tk.tok = v.token
        |GROUP BY doc_id""".stripMargin,
    "t20_pack_sequences" ->
      """WITH vt AS (
        | SELECT unnest(string_split_regex(trim(lower(text)),'\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM vt
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2),
        |vocab AS (SELECT token, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS w
        | FROM documents),
        |tk0 AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w FROM t),
        |tk AS (SELECT doc_id, pos, w[pos] AS tok FROM tk0 WHERE length(w[pos]) > 0),
        |enc AS (SELECT doc_id, pos,
        |  CAST(coalesce(v.token_id, -1) AS BIGINT) AS tid
        | FROM tk LEFT JOIN vocab v ON tk.tok = v.token),
        |g AS (SELECT tid,
        |  row_number() OVER (ORDER BY doc_id, pos) - 1 AS gpos FROM enc)
        |SELECT CAST(gpos // 128 AS BIGINT) AS example_id,
        | array_to_string(list(tid ORDER BY gpos), ' ') AS ids_str,
        | CAST(count(*) AS BIGINT) AS n_tokens
        |FROM g GROUP BY 1""".stripMargin,
    "t17_importance" ->
      """WITH rt AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)),'\s+')) AS tok
        | FROM documents),
        |rtoks AS (SELECT doc_id, tok FROM rt WHERE length(tok) > 0),
        |rc AS (SELECT tok, count(*) AS cnt_r FROM rtoks GROUP BY tok),
        |tc AS (SELECT tok, count(*) AS cnt_t FROM rtoks
        | WHERE doc_id < 20 GROUP BY tok),
        |v AS (SELECT coalesce(rc.tok, tc.tok) AS tok,
        |  coalesce(cnt_r, 0) AS cnt_r, coalesce(cnt_t, 0) AS cnt_t
        | FROM rc FULL JOIN tc ON rc.tok = tc.tok),
        |tot AS (SELECT sum(cnt_r) AS nr, sum(cnt_t) AS nt, count(*) AS v FROM v),
        |llr AS (SELECT tok,
        |  ln(CAST(cnt_t + 1 AS DOUBLE)) - ln(CAST(nt + v AS DOUBLE))
        |   - ln(CAST(cnt_r + 1 AS DOUBLE)) + ln(CAST(nr + v AS DOUBLE)) AS llr
        | FROM v, tot)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CAST(llr AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS importance
        |FROM rtoks JOIN llr USING (tok)
        |GROUP BY doc_id""".stripMargin,
    "t16_mixture_plan" ->
      """WITH szs AS (
        | SELECT source AS domain,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN len(string_split_regex(trim(text),'\s+')) ELSE 0 END AS sz
        | FROM documents),
        |agg AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(sz) AS BIGINT) AS available FROM szs GROUP BY domain),
        |w AS (SELECT domain, n_rows, available,
        |  CASE domain WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |   WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
        |   WHEN 'src2' THEN CAST(0.125 AS DOUBLE)
        |   WHEN 'src3' THEN CAST(0.125 AS DOUBLE)
        |   ELSE CAST(0.0 AS DOUBLE) END AS wt
        | FROM agg)
        |SELECT domain, n_rows, available,
        | wt * 50000 AS target_size,
        | CASE WHEN available > 0
        |   THEN least(CAST(1.0 AS DOUBLE), wt * 50000 / available)
        |   ELSE 0.0 END AS sampling_rate,
        | CASE WHEN available > 0 THEN wt * 50000 / available
        |   ELSE 0.0 END AS epochs
        |FROM w""".stripMargin,
    "t15_ngram_stats" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN string_split_regex(trim(text),'\s+')
        |    ELSE [] END AS w
        | FROM documents),
        |b2 AS (SELECT doc_id, w, length(array_to_string(w,' ')) AS nchars FROM base),
        |grams AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |   i -> w[i] || ' ' || w[i+1])) AS gram
        | FROM b2 WHERE len(w) >= 2),
        |counts AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |ranked AS (SELECT doc_id, gram, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
        | FROM counts),
        |tops AS (SELECT doc_id, gram AS top_gram, cnt AS top_cnt
        | FROM ranked WHERE rn = 1),
        |aggd AS (SELECT doc_id,
        |  sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dupw,
        |  sum(cnt * length(gram)) AS totw
        | FROM counts GROUP BY doc_id)
        |SELECT b2.doc_id, coalesce(top_gram, '') AS top_ngram,
        | CASE WHEN nchars > 0 AND top_cnt IS NOT NULL
        |   THEN CAST(top_cnt * length(top_gram) AS DOUBLE) / nchars
        |   ELSE 0.0 END AS top_ngram_char_frac,
        | CASE WHEN totw > 0 THEN CAST(dupw AS DOUBLE) / totw
        |   ELSE 0.0 END AS dup_ngram_char_frac
        |FROM b2 LEFT JOIN tops USING (doc_id) LEFT JOIN aggd USING (doc_id)""".stripMargin,
    // BOUNDED oracle (r9 verdict task 1): the old all-pairs form is O(n²)
    // list-intersects and wedges at sf1.0 (50k docs). This one is
    // prefix-filtered (Chaudhuri SSJoin / Bayardo all-pairs): under a
    // global token order (here rarest-first by corpus frequency, ties by
    // the token itself), any two sets with J >= t=0.9 must share a token
    // within each set's first len - ceil(t*len) + 1 tokens — because
    // J >= t forces |a ∩ b| >= t·|a|, and missing the whole prefix leaves
    // at most ceil(t*len) - 1 shared tokens. Candidates come from the
    // prefix self-join, then EXACT Jaccard verifies each candidate, so
    // the result is provably identical to all-pairs (differentially
    // confirmed vs the quadratic form at sf0.01 and sf0.1).
    // Cost: sf0.01 0.2s, sf0.1 5s, sf1.0 minutes (vs never-finishes).
    "d15_minhash_recall" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
        |freq AS (SELECT g, count(*) AS f FROM ex GROUP BY g),
        |rk AS (SELECT doc_id, ex.g, n,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY f, ex.g) AS r
        | FROM ex JOIN freq USING (g)),
        |pref AS (SELECT doc_id, g FROM rk
        | WHERE r <= n - CAST(ceil(0.9 * n) AS INT) + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        | FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id),
        |pairs AS (
        | SELECT len(list_intersect(x.s, y.s)) AS inter,
        |  len(x.s) AS sa, len(y.s) AS sb
        | FROM cand JOIN sh x ON x.doc_id = cand.ida
        |  JOIN sh y ON y.doc_id = cand.idb)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.9""".stripMargin,
    // COST NOTE (r9 verdict task 6): this oracle is new-batch × corpus
    // shingle intersects — bounded (the new batch is a fixed doc_id slice,
    // not the whole table) but ~10 min of DuckDB at sf1.0 (100 replicated
    // new-batch names × 50k docs). Acceptable once per gate; keep it OUT
    // of any repeated-iteration path (same discipline as the d04/d06/d17/
    // t36 quadratic-oracle exclusion list in the gate scripts).
    "d14_dedup_against" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        | FROM sh a JOIN sh b ON a.doc_id >= 100 AND b.doc_id < 100)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/(sa+sb-inter) AS jaccard
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.5""".stripMargin,
    "d13_segment_dedup" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN string_split_regex(trim(text),'\s+')
        |    ELSE [] END AS w
        | FROM documents),
        |c AS (SELECT doc_id, w, CAST(ceil(len(w)/20.0) AS INT) AS m FROM base),
        |segs AS (
        | SELECT doc_id, unnest(generate_series(0, m-1)) AS pos, w
        | FROM c WHERE m > 0),
        |s2 AS (SELECT doc_id, pos,
        |  array_to_string(w[pos*20+1 : pos*20+20],' ') AS seg FROM segs),
        |kept AS (
        | SELECT doc_id, pos, seg FROM (
        |  SELECT doc_id, pos, seg,
        |   row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM s2) x
        | WHERE rn = 1),
        |agg AS (
        | SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS dedup_text,
        |  count(*) AS n_kept
        | FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.dedup_text, '') AS dedup_text,
        | CAST(c.m AS INTEGER) AS n_segments,
        | CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
        |FROM c LEFT JOIN agg a ON c.doc_id = a.doc_id""".stripMargin,
    "t10_repetition" ->
      """WITH toks AS (
        | SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id,
        | CASE WHEN len(w) >= 3 AND length(trim(text)) > 0
        |   THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)-1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE) / (len(w)-2)
        |   ELSE 0.0 END AS rep_ratio
        |FROM toks""".stripMargin,
    "t11_decontaminate" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |   i -> array_to_string(w[i:i+4], ' '))) AS s
        | FROM toks WHERE len(w) >= 5),
        |ev AS (SELECT list_distinct(flatten(list(s))) AS es FROM sh WHERE doc_id < 20)
        |SELECT doc_id, CAST(len(s) AS INTEGER) AS n_shingles,
        | CAST(len(list_intersect(s, es)) AS BIGINT) AS n_matched,
        | CAST(len(list_intersect(s, es)) AS DOUBLE) / len(s) AS contamination
        |FROM sh, ev""".stripMargin,
    "t12_lm_score" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        | FROM documents),
        |toks AS (SELECT doc_id, tok FROM toks0 WHERE length(tok) > 0),
        |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |total AS (SELECT sum(cnt) AS n FROM vocab),
        |logp AS (SELECT tok, ln(CAST(cnt AS DOUBLE)) - ln(CAST(n AS DOUBLE)) AS logp
        | FROM vocab, total)
        |SELECT doc_id, count(*) AS n_tokens,
        | -CAST(sum(CAST(logp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS cross_entropy
        |FROM toks JOIN logp USING (tok)
        |GROUP BY doc_id""".stripMargin,
    "q63_group_split" -> "SELECT CAST(1 AS BIGINT) AS split_ok",
    "q62_bloom_semi" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        | WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 450000)""".stripMargin,
    // BOUNDED oracle (r9 verdict task 1): all-pairs levenshtein is 11G
    // comparisons at sf1.0 (150k customers) and never finishes. Deletion-
    // neighborhood blocking is provably lossless for dist <= 1: if
    // lev(a,b) <= 1 then N(a) ∩ N(b) != ∅ where N(s) = {s} ∪ {s minus one
    // char} — equal strings share s itself; a substitution at position i
    // shares both-minus-i; an insert/delete shares the shorter string.
    // Candidates from the key join, then exact levenshtein verifies, so
    // the result is identical to all-pairs (differentially confirmed at
    // sf0.01: 19,500 pairs both forms). Cost: sf1.0 ~6 min (26.9M output
    // pairs — each sf0.1 pair lifts 100x under ScaleUp's verbatim-name
    // replicas), vs never-finishes quadratic.
    "d12_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
        |keys AS (
        | SELECT c_custkey, c_name, c_name AS k FROM c
        | UNION ALL
        | SELECT c_custkey, c_name,
        |   substr(c_name, 1, CAST(i AS INT) - 1) ||
        |   substr(c_name, CAST(i AS INT) + 1) AS k
        | FROM (SELECT c_custkey, c_name,
        |        unnest(range(1, length(c_name) + 1)) AS i FROM c)),
        |cand AS (
        | SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |   a.c_name AS na, b.c_name AS nb
        | FROM keys a JOIN keys b ON a.k = b.k AND a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INTEGER) AS dist
        |FROM cand WHERE levenshtein(na, nb) <= 1""".stripMargin,
    "t13_tfidf" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        | FROM documents),
        |toks AS (SELECT doc_id, token FROM toks0 WHERE length(token) > 0),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |scored AS (
        | SELECT doc_id, token, tf,
        |  round((ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0)
        |    * CAST(tf AS DOUBLE), 9) AS score
        | FROM tf JOIN dfreq USING (token), nd)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, score FROM (
        | SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, token ASC) AS rank
        | FROM scored) x WHERE rank <= 5""".stripMargin,
    "t14_vocab" ->
      """WITH toks0 AS (
        | SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM toks0
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2)
        |SELECT token, cnt, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200""".stripMargin,
    "q32_rollup" -> SqlRollup,
    "q70_window_suite" -> SqlWindowSuite,
    "q71_cube" -> SqlCube,
    "q33_running_window" -> SqlRunning,
    "q34_exists_subquery" -> SqlExists,
    "q35_string_date_fns" -> SqlStringDate,
    "q36_case_in" -> SqlCaseIn,
    "q55_percentile" -> SqlPercentile,
    "q56_ntile" -> SqlNtile,
    // full text-analysis oracle: langid (stopword-type argmax, ties to
    // en<es<de<fr, CJK-density zh gate), the EXACT base-31 rolling
    // fingerprint (HUGEINT modular arithmetic reproduces the JVM's 64-bit
    // wraparound), and the quality-metric bundle — all per-row scalar
    // arithmetic, no FP-order hazards. Stopword lists mirror
    // TextFunctions.StopwordsEn / LangStopwords.
    // norm mirrors Fingerprint64.hash's Character.isWhitespace set, not
    // RE2 \s: collapse EVERY Java-whitespace run (incl. U+2000-series and
    // the \x1C-\x1F separators; NBSP is NOT Java whitespace) to one
    // space, then strip the single leading/trailing space the collapse
    // leaves — plain trim() would miss a trailing '\n'. Known residual
    // divergence: astral chars (JVM hashes UTF-16 units) and
    // locale-special lowercasing — absent from this corpus.
    "t01_text_analyze" ->
      s"""WITH base AS (
        | SELECT doc_id, text,
        |  lower(trim(regexp_replace(text,
        |    '[\\t-\\r\\x{1c}-\\x{1f} \\x{1680}\\x{2000}-\\x{2006}\\x{2008}-\\x{200a}\\x{2028}\\x{2029}\\x{205f}\\x{3000}]+',
        |    ' ', 'g'), ' ')) AS norm,
        |  string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
        |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0
        |   THEN CAST(0 AS INTEGER)
        |   ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
        |  END AS n_tok
        | FROM documents),
        |scored AS (
        | SELECT *, $SqlLangScores FROM base),
        |fp AS (
        | SELECT doc_id,
        |  CASE WHEN text IS NULL THEN CAST(0 AS BIGINT) ELSE (
        |   SELECT CASE WHEN m >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN CAST(m - CAST('18446744073709551616' AS HUGEINT) AS BIGINT)
        |    ELSE CAST(m AS BIGINT) END
        |   FROM (SELECT list_reduce(
        |     list_prepend(CAST(1125899906842597 AS HUGEINT),
        |       list_transform(range(1, length(norm)+1),
        |         i -> CAST(unicode(norm[i]) AS HUGEINT))),
        |     (a, b) -> (a * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS m)
        |  ) END AS fingerprint
        | FROM base)
        |SELECT s.doc_id, $SqlLangCase AS lang_pred, f.fingerprint,
        | CAST(length(s.text) AS INTEGER) AS n_chars,
        | s.n_tok AS n_tokens,
        | CAST(length(s.text) - length(regexp_replace(s.text, '[[:punct:]]', '', 'g')) AS INTEGER) AS n_punct,
        | CAST(length(s.text) - length(regexp_replace(s.text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits,
        | CAST(len(list_filter(s.ltoks, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'], t))) AS INTEGER) AS n_stopwords,
        | CASE WHEN s.n_tok > 0 THEN CAST(len(list_filter(s.ltoks, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'], t))) AS DOUBLE) / s.n_tok ELSE 0.0 END AS stopword_ratio,
        | CASE WHEN s.n_tok > 0 THEN CAST(length(regexp_replace(s.text, '\\s+', '', 'g')) AS DOUBLE) / s.n_tok ELSE 0.0 END AS mean_word_len
        |FROM scored s JOIN fp f ON s.doc_id = f.doc_id""".stripMargin,
    "t03_langid" ->
      s"""WITH base AS (
        | SELECT doc_id, lang, text,
        |  string_split_regex(trim(lower(text)), '\\s+') AS ltoks
        | FROM documents),
        |scored AS (SELECT *, $SqlLangScores FROM base)
        |SELECT doc_id, lang, $SqlLangCase AS lang_pred FROM scored""".stripMargin,
    // composed dedup-pipeline oracle: exact 3-gram jaccard pairs (the
    // LSH candidate stage finds every >= 0.5 pair on this corpus — recall
    // pinned by d15; verification is exact either way), connected
    // components via recursive min-label reachability, keep each
    // component's min id
    "d06_dedup_pipeline" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |       (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
        |edges AS (
        | SELECT id_a AS u, id_b AS v FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(u, l) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
        |comp AS (SELECT u, min(l) AS rep FROM reach GROUP BY u)
        |SELECT d.doc_id, d.lang FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
        |WHERE c.u IS NULL OR c.rep = d.doc_id""".stripMargin,
    // d02/d03/d05 / s02 / m02 / q21: not SQL-expressible (LSH bucket sets,
    // FP ANN rankings, seeded sampling) → rows-only, each pinned by a
    // green boolean differential (d08/d15, d09, d05x+d07, s03, q21x).
  )

  /** DuckDB per-language stopword-type scores — mirrors
   * TextFunctions.LangStopwords; used by the t01/t03 oracles. */
  private val SqlLangScores: String = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "den", "von"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "dans", "une", "que", "pour"),
  ).map { case (lang, words) =>
    s"len(list_intersect(list_distinct(ltoks), [${words.map(w => s"'$w'").mkString(",")}])) AS s_$lang"
  }.mkString(", ")

  /** DuckDB argmax-with-ties-to-earlier over the s_* scores plus the CJK
   * density gate — the langId CASE (fold order en, es, de, fr). NULL text
   * pins to 'en' explicitly: with NULL scores every comparison is NULL and
   * the CASE would otherwise fall through to 'fr', while the Spark fold's
   * when() chain keeps its ('en', -1) seed. */
  private val SqlLangCase: String =
    """CASE WHEN text IS NULL THEN 'en'
      | WHEN length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) > length(text) * 0.3 THEN 'zh'
      | WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      | WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      | WHEN s_de >= s_fr THEN 'de'
      | ELSE 'fr' END""".stripMargin

  /** Headline subset for the per-round benchmark (heavy/representative). */
  def benchQueries: Seq[String] = Seq(
    "q01_agg", "q02_filter", "q06_join_inner", "q20_take_per_key",
    "q22_sql", "q23_transform", "q24_comap",
    "d01_dedup_exact", "d02_dedup_minhash", "d04_dedup_ngram",
    "d06_dedup_pipeline",
    "s01_knn_brute", "t01_text_analyze", "t03_langid")
}
