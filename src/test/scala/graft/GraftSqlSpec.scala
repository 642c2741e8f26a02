package graft

import graft.sql.GraftSql
import graft.sql.GraftSql.TransformerDef
import org.apache.spark.sql.Row
import java.nio.file.Files

class GraftSqlSpec extends SparkTestBase {

  private def d1 = df(Seq(Seq("a", 3), Seq("a", 1), Seq("b", 9), Seq("b", 2)), "k:str,v:int")

  test("statement splitting tolerates multi-line SELECT and comments") {
    val stmts = GraftSql.splitStatements(
      """-- a comment
        |x = SELECT k, v
        |  WHERE v > 1
        |TAKE 2 ROWS FROM x PRESORT v DESC
        |""".stripMargin)
    assert(stmts.length === 2)
    assert(stmts.head.startsWith("x = SELECT"))
  }

  test("SELECT passthrough with named refs and implicit FROM") {
    val res = GraftSql.run(engine,
      """big = SELECT k, v FROM input WHERE v > 1
        |SELECT k, v
        |YIELD AS out
        |""".stripMargin, Map("input" -> d1))
    assertDfEq(res.yields("out"), Seq(Seq("a", 3), Seq("b", 9), Seq("b", 2)))
  }

  test("TAKE with prepartition/presort; SAMPLE; DISTINCT") {
    val res = GraftSql.run(engine,
      """top = TAKE 1 ROWS FROM input PREPARTITION BY k PRESORT v DESC
        |YIELD top AS top
        |""".stripMargin, Map("input" -> d1))
    assertDfEq(res.yields("top"), Seq(Seq("a", 3), Seq("b", 9)))
    val s = GraftSql.run(engine,
      "SAMPLE 50 PERCENT SEED 42 FROM input", Map("input" -> d1))
    assert(s.last.get.count() <= 4)
  }

  test("DROPNA / FILLNA / RENAME / ALTER / DROP COLUMNS") {
    val withNull = df(Seq(Seq("a", 1.0), Seq(null, 2.0)), "k:str,v:double")
    val res = GraftSql.run(engine,
      """clean = DROPNA ANY FROM input
        |YIELD clean AS clean
        |filled = FILLNA PARAMS k:zz FROM input
        |YIELD filled AS filled
        |ren = RENAME COLUMNS k:key FROM input
        |YIELD ren AS ren
        |alt = ALTER COLUMNS v:int FROM input
        |YIELD alt AS alt
        |dropped = DROP COLUMNS v FROM input
        |YIELD dropped AS dropped
        |""".stripMargin, Map("input" -> withNull))
    assertDfEq(res.yields("clean"), Seq(Seq("a", 1.0)))
    assertDfEq(res.yields("filled"), Seq(Seq("a", 1.0), Seq("zz", 2.0)))
    assert(res.yields("ren").columns.toSeq === Seq("key", "v"))
    assert(res.yields("alt").schema("v").dataType.typeName === "integer")
    assert(res.yields("dropped").columns.toSeq === Seq("k"))
  }

  test("LOAD and SAVE round-trip") {
    val dir = Files.createTempDirectory("graftsql").toString
    GraftSql.run(engine,
      s"""SELECT k, v FROM input
         |SAVE OVERWRITE PARQUET "$dir/t"
         |""".stripMargin, Map("input" -> d1))
    val res = GraftSql.run(engine, s"""LOAD PARQUET "$dir/t"""")
    assert(res.last.get.count() === 4)
  }

  test("TRANSFORM ... USING registered transformer with PREPARTITION") {
    val sumT = TransformerDef(
      outputSchema = (_, _) => graft.schema.SchemaExpr.parse("k:str,total:long"),
      fn = (cursor, rows, _) =>
        Iterator.single(Row(cursor.keyValues.head, rows.map(_.getInt(1).toLong).sum)))
    val res = GraftSql.run(engine,
      """TRANSFORM input PREPARTITION BY k USING sum_v
        |YIELD AS out
        |""".stripMargin,
      Map("input" -> d1), Map("sum_v" -> sumT))
    assertDfEq(res.yields("out"), Seq(Seq("a", 4L), Seq("b", 11L)))
  }

  test("unknown statement and unknown df raise") {
    intercept[IllegalArgumentException](GraftSql.run(engine, "FROBNICATE x"))
    intercept[IllegalArgumentException](
      GraftSql.run(engine, "TAKE 1 ROWS FROM missing"))
  }

  test("{{var}} template substitution") {
    val res = GraftSql.run(engine,
      """TAKE {{n}} ROWS FROM input PRESORT v DESC
        |YIELD AS out
        |""".stripMargin, Map("input" -> d1), Map.empty,
      vars = Map("n" -> "2"))
    assert(res.yields("out").count() === 2)
    intercept[IllegalArgumentException](
      GraftSql.run(engine, "TAKE {{missing}} ROWS FROM input",
        Map("input" -> d1)))
  }

  test("TRANSFORM SCHEMA hint with wildcard ops") {
    val upperT = TransformerDef(
      outputSchema = (in, _) => in, // overridden by the SCHEMA hint
      fn = (_, rows, _) => rows.map(r => Row(r.getString(0).toUpperCase, r.getInt(1), r.getInt(1) * 2L)))
    val res = GraftSql.run(engine,
      "TRANSFORM input USING up SCHEMA *,+twice:long\nYIELD AS out",
      Map("input" -> d1), Map("up" -> upperT))
    assert(res.yields("out").columns.toSeq === Seq("k", "v", "twice"))
    assert(res.yields("out").filter(org.apache.spark.sql.functions.col("k") === "A").count() === 2)
  }

  test("COTRANSFORM / PROCESS / OUTPUT with registered extensions") {
    import graft.sql.GraftSql.{CoTransformerDef, Extensions, OutputterDef, ProcessorDef}
    val l = df(Seq(Seq(1, "x"), Seq(1, "y"), Seq(2, "z")), "k:int,a:str")
    val r = df(Seq(Seq(1, 10.0), Seq(3, 30.0)), "k:int,b:double")
    var outputSeen = -1L
    val exts = Extensions(
      cotransformers = Map("counts" -> CoTransformerDef(
        outputSchema = (_, _, _) => graft.schema.SchemaExpr.parse("k:int,nl:long,nr:long"),
        fn = (key, ls, rs, _) =>
          Iterator.single(Row(key.head, ls.size.toLong, rs.size.toLong)))),
      processors = Map("concat" -> ProcessorDef(
        fn = (e, dfs, _) => e.union(dfs(0), dfs(1), distinct = false))),
      outputters = Map("record" -> OutputterDef(
        fn = (dfs, _) => outputSeen = dfs.head.count())))
    val res = GraftSql.runWith(engine,
      """z = COTRANSFORM l, r BY k FULL_OUTER USING counts
        |YIELD z AS zipped
        |p = PROCESS l, l USING concat
        |YIELD p AS doubled
        |OUTPUT p USING record
        |""".stripMargin, Map("l" -> l, "r" -> r), exts)
    assertDfEq(res.yields("zipped"),
      Seq(Seq(1, 2L, 1L), Seq(2, 1L, 0L), Seq(3, 0L, 1L)))
    assert(res.yields("doubled").count() === 6)
    assert(outputSeen === 6L)
  }
}
