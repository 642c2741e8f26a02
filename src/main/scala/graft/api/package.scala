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
   * the reference's explicit wiring for applications that prefer it:
   * `implicit def e: GraftEngine = Engines.current`. Resolution order
   * matches the reference: thread-scoped context > global. The scoped
   * context is thread-local (like the reference's ContextVar-based
   * engine_context — concurrent contexts must not see each other); a
   * thread spawned INSIDE a context inherits the spawn-time value
   * (InheritableThreadLocal semantics, mirroring ContextVar task
   * inheritance). */
  object Engines {
    @volatile private var global: Option[GraftEngine] = None
    private val context = new scala.util.DynamicVariable[Option[GraftEngine]](None)
    def setGlobal(e: GraftEngine): Unit = global = Some(e)
    def clearGlobal(): Unit = global = None
    def current: GraftEngine = context.value.orElse(global).getOrElse(
      throw new IllegalStateException(
        "no engine in context — Engines.setGlobal(engineOf(spark)) or " +
          "Engines.withEngine(...){...} first"))
    /** Run `body` with `e` as this thread's context engine (the
     * reference's `with engine_context(e):`); restores on exit and never
     * touches the global or other threads. */
    def withEngine[T](e: GraftEngine)(body: => T): T =
      context.withValue(Some(e))(body)
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
    // ASCII identifier rule, deliberately NOT unicode-aware isLetter —
    // normalized names must be plain [A-Za-z_][A-Za-z0-9_]* identifiers
    // (safe unquoted in SQL), matching the reference's character class
    def okChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    def valid(n: String): Boolean =
      n.nonEmpty && !(n.head >= '0' && n.head <= '9') && n.forall(okChar)
    val cols = df.columns
    if (cols.forall(valid)) return (df, Map.empty)
    // collision set is CASE-INSENSITIVE: Spark's default resolver is, so
    // emitting "_a" next to an existing "_A" would make both ambiguous
    val taken = scala.collection.mutable.Set[String]() ++
      cols.filter(valid).map(_.toLowerCase)
    // positional processing: duplicate invalid names each get their own
    // collision-suffixed result (withColumnRenamed would rename ALL
    // matching columns at once, leaving the output still colliding)
    var changed = List.empty[(String, String)]
    val newNames = cols.map { orig =>
      if (valid(orig)) orig
      else {
        val cleaned = orig.map(c => if (okChar(c)) c else '_')
        val based =
          if (cleaned.isEmpty || (cleaned.head >= '0' && cleaned.head <= '9'))
            "_" + cleaned
          else cleaned
        var candidate = based
        var i = 0
        while (taken.contains(candidate.toLowerCase)) {
          i += 1; candidate = s"${based}_$i"
        }
        taken += candidate.toLowerCase
        changed ::= (candidate -> orig)
        candidate
      }
    }
    (df.toDF(newNames.toIndexedSeq: _*), changed.toMap)
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
  // column-surgery facade (reference fugue/dataframe/api.py: alter_columns,
  // rename, drop_columns, select_columns, head — same eager shape as fa.*)
  def alterColumns(df: DataFrame, schemaExpr: String)(
      implicit e: GraftEngine): DataFrame = e.alterColumns(df, schemaExpr)
  def renameColumns(df: DataFrame, mapping: Map[String, String])(
      implicit e: GraftEngine): DataFrame = e.rename(df, mapping)
  def dropColumns(df: DataFrame, cols: Seq[String], ifExists: Boolean = false)(
      implicit e: GraftEngine): DataFrame = e.dropColumns(df, cols, ifExists)
  def selectColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => df(s"`${c.replace("`", "``")}`")): _*)
  def head(df: DataFrame, n: Int): Seq[org.apache.spark.sql.Row] =
    df.take(n).toSeq
  def show(df: DataFrame, n: Int = 10): Unit = df.show(n, truncate = false)
  def getColumnNames(df: DataFrame): Seq[String] = df.columns.toSeq
  def getNumPartitions(df: DataFrame): Int = df.rdd.getNumPartitions
  def isEmpty(df: DataFrame): Boolean = df.isEmpty
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
      case d: org.apache.spark.sql.Dataset[_] =>
        val name = s"__raw_${dfs.size}"
        dfs(name) = d.toDF()
        sb ++= name; sb += ' '
      case other => throw new IllegalArgumentException(
        "rawSqlParts accepts String and Dataset fragments, got: " +
          (if (other == null) "null" else other.getClass.toString))
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
