package graft

import graft.engine.{GraftEngine, SparkGraftEngine}
import graft.schema.SchemaExpr
import graft.transform.{PartitionCursor, Transform}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Eager functional API — the reference's `fugue.api` (fa.*) surface
 * (/root/reference/fugue/execution/api.py): one function per operator,
 * engine resolved from an implicit context. Thin by design: planning and
 * optimization stay with Catalyst; this layer only fixes the operator
 * vocabulary and semantics.
 *
 * {{{
 *   import graft.api._
 *   implicit val engine: GraftEngine = engineOf(spark)
 *   val top = take(events, 3,
 *     PartitionSpec(by = Seq("user_id"), presort = Seq("ts" -> false)))
 *   val out = transform(top, "user_id:long,n:long",
 *     PartitionSpec(by = Seq("user_id"))) { (cursor, rows) =>
 *     Iterator.single(Row(cursor.keyValues.head, rows.size.toLong))
 *   }
 * }}}
 */
package object api {

  def engineOf(spark: SparkSession): GraftEngine = new SparkGraftEngine(spark)

  /** Engine-context management (the reference's engine_context /
   * set_global_engine / clear_global_engine, execution/api.py). The
   * Scala-idiomatic context IS the implicit parameter; these helpers add
   * the reference's explicit global fallback for applications that prefer
   * set-once wiring: `implicit def e: GraftEngine = Engines.current`. */
  object Engines {
    @volatile private var global: Option[GraftEngine] = None
    def setGlobal(e: GraftEngine): Unit = global = Some(e)
    def clearGlobal(): Unit = global = None
    def current: GraftEngine = global.getOrElse(
      throw new IllegalStateException(
        "no global engine set — Engines.setGlobal(engineOf(spark)) first"))
    /** Run `body` with `e` as the global engine, restoring the previous
     * one after (the reference's `with engine_context(e):`). */
    def withEngine[T](e: GraftEngine)(body: => T): T = {
      val prev = global
      global = Some(e)
      try body finally global = prev
    }
  }

  /**
   * Normalize arbitrary column names to valid identifiers
   * (`[A-Za-z_][A-Za-z0-9_]*`) following the reference's rules
   * (fugue/dataframe/api.py:301 — `normalize_column_names`): invalid
   * characters become `_`, a leading digit or empty result gets a `_`
   * prefix, and collisions take `_1`, `_2`, … suffixes. Returns the
   * renamed frame and the UNDO map (new name → original) — empty when
   * nothing needed renaming.
   */
  def normalizeColumnNames(df: DataFrame): (DataFrame, Map[String, String]) = {
    def valid(n: String): Boolean =
      n.nonEmpty && (n.head.isLetter || n.head == '_') &&
        n.forall(c => c.isLetterOrDigit || c == '_')
    val taken = scala.collection.mutable.Set[String]() ++
      df.columns.filter(valid)
    val renames = scala.collection.mutable.LinkedHashMap[String, String]()
    df.columns.filterNot(valid).foreach { orig =>
      val cleaned = orig.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
      val based = if (cleaned.isEmpty || cleaned.head.isDigit) "_" + cleaned else cleaned
      var candidate = based
      var i = 0
      while (taken.contains(candidate)) { i += 1; candidate = s"${based}_$i" }
      taken += candidate
      renames += orig -> candidate
    }
    if (renames.isEmpty) (df, Map.empty)
    else {
      val out = renames.foldLeft(df) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
      (out, renames.map(_.swap).toMap)
    }
  }

  def load(path: String, format: String = "", columns: Seq[String] = Nil)(
      implicit e: GraftEngine): DataFrame = e.load(path, format, columns)

  def save(df: DataFrame, path: String, format: String = "",
      mode: String = "overwrite", partitionBy: Seq[String] = Nil,
      singleFile: Boolean = false)(implicit e: GraftEngine): Unit =
    e.save(df, path, format, mode, partitionBy, singleFile)

  def toDF(rows: Seq[Seq[Any]], schema: String)(implicit e: GraftEngine): DataFrame =
    e.toDF(rows, schema)

  def repartition(df: DataFrame, spec: PartitionSpec)(
      implicit e: GraftEngine): DataFrame = e.repartition(df, spec)

  def broadcast(df: DataFrame)(implicit e: GraftEngine): DataFrame = e.broadcast(df)

  def persist(df: DataFrame, lazyPersist: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.persist(df, lazyPersist)

  def join(df1: DataFrame, df2: DataFrame, how: String, on: Seq[String] = Nil)(
      implicit e: GraftEngine): DataFrame = e.join(df1, df2, how, on)

  def innerJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "inner")
  def leftOuterJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "left_outer")
  def rightOuterJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "right_outer")
  def fullOuterJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "full_outer")
  def crossJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "cross")
  def semiJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "semi")
  def antiJoin(df1: DataFrame, df2: DataFrame)(implicit e: GraftEngine): DataFrame =
    e.join(df1, df2, "anti")

  // multi-df folds (reference fa.join/union/... accept N frames)
  def joinAll(dfs: Seq[DataFrame], how: String)(implicit e: GraftEngine): DataFrame =
    e.join(dfs, how)
  def unionAll(dfs: Seq[DataFrame], distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.union(dfs, distinct)
  def subtractAll(dfs: Seq[DataFrame], distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.subtract(dfs, distinct)
  def intersectAll(dfs: Seq[DataFrame], distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.intersect(dfs, distinct)

  /** ZIP frames into key + per-side struct arrays (feeds cotransform). */
  def zip(frames: Seq[DataFrame], keys: Seq[String], how: String = "inner",
      presort: Seq[(String, Boolean)] = Nil): DataFrame =
    Transform.zipFrames(frames, keys, how, presort)

  def union(df1: DataFrame, df2: DataFrame, distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.union(df1, df2, distinct)
  def subtract(df1: DataFrame, df2: DataFrame, distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.subtract(df1, df2, distinct)
  def intersect(df1: DataFrame, df2: DataFrame, distinct: Boolean = true)(
      implicit e: GraftEngine): DataFrame = e.intersect(df1, df2, distinct)
  def distinct(df: DataFrame)(implicit e: GraftEngine): DataFrame = e.distinct(df)

  def dropna(df: DataFrame, how: String = "any", thresh: Option[Int] = None,
      subset: Seq[String] = Nil)(implicit e: GraftEngine): DataFrame =
    e.dropna(df, how, thresh, subset)
  def fillna(df: DataFrame, value: Any, subset: Seq[String] = Nil)(
      implicit e: GraftEngine): DataFrame = e.fillna(df, value, subset)

  def sample(df: DataFrame, n: Option[Long] = None, frac: Option[Double] = None,
      replace: Boolean = false, seed: Option[Long] = None)(
      implicit e: GraftEngine): DataFrame = e.sample(df, n, frac, replace, seed)

  def take(df: DataFrame, n: Int, spec: PartitionSpec = PartitionSpec.empty,
      naPosition: String = "last")(implicit e: GraftEngine): DataFrame =
    e.take(df, n, spec, naPosition)

  def select(df: DataFrame, cols: Seq[Column], where: Option[Column] = None,
      having: Option[Column] = None)(implicit e: GraftEngine): DataFrame =
    e.select(df, cols, where, having)
  def filter(df: DataFrame, cond: Column)(implicit e: GraftEngine): DataFrame =
    e.filter(df, cond)
  def assign(df: DataFrame, cols: Map[String, Column])(
      implicit e: GraftEngine): DataFrame = e.assign(df, cols)
  def aggregate(df: DataFrame, partitionBy: Seq[String], aggs: Seq[Column])(
      implicit e: GraftEngine): DataFrame = e.aggregate(df, partitionBy, aggs)

  def rawSql(sql: String, dfs: (String, DataFrame)*)(
      implicit e: GraftEngine): DataFrame = e.sqlSelect(sql, dfs.toMap)

  /** Interleaved raw SQL (reference `fa.raw_sql("SELECT * FROM", df,
   * "WHERE x > 1")`, fugue/workflow/api.py:253-307): String fragments and
   * DataFrames alternate; each frame splices in as a generated view name. */
  def rawSqlParts(parts: Any*)(implicit e: GraftEngine): DataFrame = {
    val sb = new StringBuilder
    val dfs = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    parts.foreach {
      case s: String => sb ++= s; sb += ' '
      case d: DataFrame =>
        val name = s"__raw_${dfs.size}"
        dfs(name) = d
        sb ++= name; sb += ' '
      case other => throw new IllegalArgumentException(
        s"rawSqlParts accepts String and DataFrame fragments, got: ${other.getClass}")
    }
    e.sqlSelect(sb.toString.trim, dfs.toMap)
  }

  def fugueSql(sql: String, inputs: Map[String, DataFrame] = Map.empty,
      transformers: Map[String, graft.sql.GraftSql.TransformerDef] = Map.empty)(
      implicit e: GraftEngine): graft.sql.GraftSql.Result =
    graft.sql.GraftSql.run(e, sql, inputs, transformers)

  /** Per-logical-partition transform with a schema expression output. */
  def transform(df: DataFrame, outputSchema: String, spec: PartitionSpec)(
      f: (PartitionCursor, Iterator[Row]) => Iterator[Row]): DataFrame =
    Transform.mapPartitions(df, spec, SchemaExpr.parse(outputSchema))(f)

  /** Per-logical-partition transform run for side effects only (the
   * reference's out_transform): forces the action, discards rows. */
  def outTransform(df: DataFrame, spec: PartitionSpec)(
      f: (PartitionCursor, Iterator[Row]) => Unit): Unit =
    Transform.mapPartitions(df, spec, df.schema) { (c, rows) =>
      f(c, rows); Iterator.empty
    }.foreach(_ => ())

  /** Cogroup two frames by key columns and map each key group. */
  def cotransform(left: DataFrame, right: DataFrame, keys: Seq[String],
      how: String, outputSchema: String)(
      f: (Seq[Any], Iterator[Row], Iterator[Row]) => Iterator[Row]): DataFrame =
    Transform.coMap(left, right, keys, how, SchemaExpr.parse(outputSchema))(f)

  def schema(expr: String): StructType = SchemaExpr.parse(expr)
}
