package graft

import graft.api.GraftFrame
import org.apache.spark.sql.Row

/** Local-frame accessors + nested/binary/map type round-trips — the graft
 * equivalent of the reference's dataframe conformance suite
 * (fugue_test/dataframe_suite.py:219-253). */
class DataFrameSuiteSpec extends SparkTestBase {

  private def frame = GraftFrame(
    df(Seq(Seq("a", 1), Seq("b", 2), Seq("c", 3)), "k:str,v:int"))

  test("asArray / asArrayIterable / asDicts / head / peek") {
    val f = frame
    assert(f.asArray.map(_.toList).sortBy(_.head.toString) ===
      Seq(List("a", 1), List("b", 2), List("c", 3)))
    assert(f.asArrayIterable.size === 3)
    assert(f.asDicts.map(d => (d("k"), d("v"))).toSet ===
      Set(("a", 1), ("b", 2), ("c", 3)))
    assert(f.head(2).length === 2)
    assert(f.peekArray.length === 2)
    assert(f.peekDict.keySet === Set("k", "v"))
    assert(f.count === 3)
    assert(!f.isEmpty)
  }

  test("peek on empty frame raises a clear error") {
    val empty = GraftFrame(frame.native.filter("v > 99"))
    assert(empty.isEmpty)
    intercept[NoSuchElementException](empty.peekArray)
  }

  test("metadata carries functionally") {
    val f = frame.withMetadata("source" -> "unit", "n" -> 3)
    assert(f.hasMetadata)
    assert(f.metadata("source") === "unit")
    // transformations preserve metadata through copy
    val g = f.copy(native = f.native.filter("v > 1"))
    assert(g.metadata("n") === 3)
    assert(!frame.hasMetadata)
  }

  test("asLocal materializes and breaks lineage") {
    val f = frame.asLocal
    assert(f.count === 3)
    assert(f.native.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("round-trip: array column") {
    val d = engine.toDF(Seq(Seq(1L, Seq(1, 2, 3)), Seq(2L, Nil)), "id:long,xs:[int]")
    val got = GraftFrame(d).asArray.sortBy(_.head.toString)
    assert(got(0)(1).asInstanceOf[scala.collection.Seq[Int]].toSeq === Seq(1, 2, 3))
    assert(got(1)(1).asInstanceOf[scala.collection.Seq[Int]].toSeq === Nil)
  }

  test("round-trip: map column") {
    val d = engine.toDF(Seq(Seq(1L, Map("a" -> 1, "b" -> 2))), "id:long,m:<str,int>")
    val got = GraftFrame(d).peekArray
    assert(got(1).asInstanceOf[Map[String, Int]] === Map("a" -> 1, "b" -> 2))
  }

  test("round-trip: struct and nested list-of-struct columns") {
    val d = engine.toDF(
      Seq(Seq(1L, Row("x", 9), Seq(Row("y", 1), Row("z", 2)))),
      "id:long,s:{n:str,v:int},xs:[{n:str,v:int}]")
    val got = GraftFrame(d).peekArray
    assert(got(1).asInstanceOf[Row].toSeq === Seq("x", 9))
    assert(got(2).asInstanceOf[scala.collection.Seq[Row]].toSeq.map(_.toSeq) ===
      Seq(Seq("y", 1), Seq("z", 2)))
  }

  test("round-trip: binary column") {
    val bytes = Array[Byte](1, 2, 3)
    val d = engine.toDF(Seq(Seq(1L, bytes)), "id:long,b:bytes")
    val got = GraftFrame(d).peekArray
    assert(got(1).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3))
  }

  test("asArrowBatches round-trips nested/binary/map columns exactly") {
    import org.apache.spark.sql.functions._
    val d = engine.toDF(
      Seq(
        Seq(1L, "x", Seq(1, 2, 3), Map("a" -> 1), null),
        Seq(2L, null, Seq.empty[Int], Map.empty[String, Int], Map("k" -> 9L)),
        Seq(3L, "z", null, null, null)),
      "id:long,s:str,xs:[int],m:<str,int>,m2:<str,long>")
      .withColumn("st", struct(col("id").as("i"), col("s").as("t")))
      .withColumn("b", when(col("s").isNotNull, encode(col("s"), "UTF-8")))
    val f = GraftFrame(d)
    val batches = f.asArrowBatches(maxRecordsPerBatch = 2).toSeq
    assert(batches.nonEmpty && batches.forall(_.nonEmpty))
    val back = GraftFrame.fromArrowBatches(
      spark, batches.iterator, d.schema.json)
    assert(back.schema === d.schema)
    def canon(g: GraftFrame): Seq[String] =
      g.native.selectExpr("id", "s", "xs", "map_entries(m)",
        "map_entries(m2)", "st", "b").collect()
        .map(r => (r.toSeq.dropRight(1) :+
          Option(r.getAs[Array[Byte]](6)).map(_.toSeq)).mkString("|"))
        .sorted.toSeq
    assert(canon(back) === canon(f))
    // field metadata never affects row layout and is dropped by Arrow —
    // a metadata-bearing schema must still round-trip (regression: the
    // import's schema check must not compare metadata)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("comment", "annotated").build()
    val dm = d.select(col("id").as("id", meta), col("s"))
    val backMeta = GraftFrame.fromArrowBatches(spark,
      GraftFrame(dm).asArrowBatches(), dm.schema.json)
    assert(backMeta.count === 3)
    // a genuinely different layout still fails fast
    intercept[IllegalArgumentException] {
      GraftFrame.fromArrowBatches(spark,
        GraftFrame(d.select("id", "s")).asArrowBatches(),
        d.select(col("id").cast("int"), col("s")).schema.json).count
    }
    // empty frame: zero or empty batches, round-trip keeps schema via json
    val empty = GraftFrame(d.filter("id > 99"))
    val eb = empty.asArrowBatches().toSeq
    val backEmpty = GraftFrame.fromArrowBatches(
      spark, eb.iterator, d.schema.json)
    assert(backEmpty.count === 0 && backEmpty.schema === d.schema)
  }

  test("round-trip: nulls in nested types survive conform") {
    val d = engine.toDF(
      Seq(Seq(1L, null, Seq(1, 2)), Seq(2L, Map("k" -> 7), null)),
      "id:long,m:<str,int>,xs:[int]")
    val got = GraftFrame(d).asArray.sortBy(_.head.toString)
    assert(got(0)(1) === null)
    assert(got(1)(2) === null)
    // conform to the same schema is identity
    val conformed = engine.conform(d, d.schema)
    assert(GraftFrame(conformed).count === 2)
  }
}
