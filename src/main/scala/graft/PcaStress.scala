package graft

import org.apache.spark.sql.functions._

/** Stress the distributed-PCA path (SCALE.md): 2M synthetic 64-dim
  * vectors — one treeAggregate moment pass + driver Jacobi fit, then the
  * full-corpus codegen'd projection, with the captured-variance ratio as
  * the quality readout (the data is full-rank noise + a planted dominant
  * plane, so top-2 capture must far exceed 2/64). */
object PcaStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 2000000L
    val dim = 64
    // noise in every coordinate plus a dominant planted plane on axes 0/1
    def u(i: Int) =
      pmod(xxhash64(col("id"), lit(i)), lit(2000L)).cast("double") / 1000.0 - 1.0
    val vec = array((0 until dim).map {
      case 0 => (u(0) * 20.0).cast("float")
      case 1 => (u(1) * 10.0).cast("float")
      case i => u(i).cast("float")
    }: _*)
    val corpus = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var model: graft.functions.Pca.PcaModel = null
    val tFit = time {
      model = graft.functions.Pca.fit(corpus, "embedding", 8)
    }
    var projRows = 0L
    val tProject = time {
      projRows = corpus.select(
        graft.functions.Pca.project(col("embedding"), model).as("p"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    val captured2 = model.explainedVariance.take(2).sum / model.totalVariance
    println(f"PCASTRESS n=$n dim=$dim fit=$tFit%.1f project=$tProject%.1f " +
      f"rows=$projRows captured2=$captured2%.3f")
    spark.stop()
  }
}
