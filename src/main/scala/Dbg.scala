object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("JVM tz: " + java.util.TimeZone.getDefault.getID)
    val out = java.nio.file.Files.createTempDirectory("dbg_orc").toString
    spark.range(100).selectExpr(
      "id AS doc_id",
      "timestamp_micros(id * 1000000 + (id % 1000) * 1000) AS ts",
      "date_add(DATE'1970-01-01', CAST(id % 20000 AS INT)) AS d",
      "CAST(concat('b', id) AS BINARY) AS bin",
      "CAST(id AS DECIMAL(12,2)) - 500.25 AS dec")
      .coalesce(1).write.mode("overwrite").orc(out)
    val f = new java.io.File(out).listFiles.filter(_.getName.endsWith(".orc")).head
    val b = java.nio.file.Files.readAllBytes(f.toPath)
    val t = graft.functions.Orc.parseTail(b).get
    println("typeKinds: " + t.typeKinds)
    println("rootFields: " + t.rootFieldNames)
    val sf = graft.functions.Orc.orcStripeFooters(
      graft.functions.Multimodal.loadBinaryFiles(spark, out, "*.orc")
        .selectExpr("monotonically_increasing_id() AS doc_id", "payload"),
      "doc_id", "payload")
    sf.show(20, false)
    spark.stop()
  }
}
