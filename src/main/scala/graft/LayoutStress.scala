package graft

import org.apache.spark.sql.functions._

/** Stress the Z-order layout (SCALE.md): 20M uniform 2D points written as
  * 64 files under (a) Morton clustering and (b) a single-column sort, then
  * count the files a selective predicate on each dimension must read
  * (file-level min/max overlap — the unit parquet skipping works in). */
object LayoutStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 20000000L
    val df = spark.range(n).select(
      ((col("id") * 48271L) % 10000).as("x"),
      ((col("id") * 16807L) % 10000).cast("double").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout_").toString
    val zDir = s"$base/zorder"; val sDir = s"$base/sorted"
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    val tZ = time { graft.operators.Layout.zorderBy(
      df, Seq("x", "y"), bits = 8, numPartitions = Some(64))
      .write.mode("overwrite").parquet(zDir) }
    val tS = time { df.repartitionByRange(64, col("x"))
      .sortWithinPartitions("x").write.mode("overwrite").parquet(sDir) }
    // per-file min/max, computed ONCE per layout → files each predicate
    // range cannot skip
    def stats(dir: String): Array[(Long, Long, Double, Double)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
        .map { f =>
          spark.read.parquet(f)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
            .as[(Long, Long, Double, Double)].collect().head
        }
    val (lo, hi) = (5000L, 5099L)
    def xOnly(s: Array[(Long, Long, Double, Double)]) =
      s.count { case (x0, x1, _, _) => x1 >= lo && x0 <= hi }
    def yOnly(s: Array[(Long, Long, Double, Double)]) =
      s.count { case (_, _, y0, y1) => y1 >= lo && y0 <= hi }
    def both(s: Array[(Long, Long, Double, Double)]) =
      s.count { case (x0, x1, y0, y1) =>
        x1 >= lo && x0 <= hi && y1 >= lo && y0 <= hi }
    val (zs, ss) = (stats(zDir), stats(sDir))
    println(s"LAYOUTSTRESS writeZ=${tZ.round}s writeSorted=${tS.round}s " +
      s"zorder: x=${xOnly(zs)}/64 y=${yOnly(zs)}/64 both=${both(zs)}/64 " +
      s"xsort: x=${xOnly(ss)}/64 y=${yOnly(ss)}/64 both=${both(ss)}/64")
    // WebDataset tar export throughput: 2M samples x ~1 KB payload into
    // 64 shards (~32 MB each), then the verify pass (full re-read + CRC).
    // The per-task write is streaming, so the cost model is bytes out,
    // not samples held
    val payload = "x" * 1000
    val docs = spark.range(2000000L).select(col("id"),
      concat(lit(payload), col("id").cast("string")).as("text"))
    val tarDir = s"$base/tar"
    var manifest: Seq[(Int, Long, Long, String)] = Seq.empty
    val tT = time { manifest = graft.operators.Layout.exportTarShards(
      docs, tarDir, "id", Seq("text" -> "txt"), nShards = 64) }
    val bytes = new java.io.File(tarDir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.length()).sum
    val tV = time {
      require(graft.operators.Layout.verifyTarShards(spark, tarDir).isEmpty)
    }
    println(f"TARSTRESS samples=${manifest.map(_._2).sum} shards=64 " +
      f"bytes=${bytes / 1e6}%.0fMB write=$tT%.1fs verify=$tV%.1fs")
    spark.stop()
  }
}
