package graft

import org.apache.spark.sql.functions._

/** Stress the PageRank path (SCALE.md): 10M synthetic edges over 1M
  * nodes (hash-scattered multigraph with a planted hub family), 10 power
  * iterations. The readouts are wall time, mass conservation, and the
  * planted hubs surfacing at the top of the ranking. */
object GraphStress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nEdges = 10000000L
    val nNodes = 1000000L
    // 10% of edges point at one of 10 hub nodes; the rest scatter
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
      when(pmod(xxhash64(col("id"), lit(2)), lit(10L)) === 0,
        pmod(xxhash64(col("id"), lit(3)), lit(10L)))
        .otherwise(pmod(xxhash64(col("id"), lit(4)), lit(nNodes))).as("dst"))
      .localCheckpoint(true)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    var top: Array[(Long, Double)] = null
    var total = 0.0
    val t = time {
      val ranks = graft.operators.Graph.pageRank(
        edges, "src", "dst", iterations = 10)
      val agg = ranks.agg(sum(col("rank"))).collect()(0).getDouble(0)
      total = agg
      top = ranks.orderBy(col("rank").desc).limit(10).collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
    }
    val hubsOnTop = top.map(_._1).count(_ < 10)
    println(f"GRAPHSTRESS edges=$nEdges nodes=$nNodes iters=10 " +
      f"time=$t%.1f mass=$total%.6f hubs_in_top10=$hubsOnTop/10")
    // triangle counting on the same graph — the 10 hub nodes receive 10%
    // of all edges (in-degree ~100k each), exactly the skew the
    // degree-ordered orientation must absorb: hubs sort HIGHEST, so all
    // their edges point toward them and their out-degree is ~0
    var nTri = 0L
    val tTri = time {
      nTri = graft.operators.Graph.triangleCount(edges, "src", "dst")
        .agg(sum(col("triangles"))).collect()(0).getLong(0) / 3
    }
    println(f"TRIANGLESTRESS edges=$nEdges nodes=$nNodes " +
      f"time=$tTri%.1f triangles=$nTri")
    // connected components on the same hub-skewed graph: 10M random
    // edges over 1M nodes are far past the percolation threshold, so the
    // bulk collapses into one giant component in a few hash-min+jump
    // rounds — the readout is rounds-to-converge wall time and the
    // component census
    var nComp = 0L; var giant = 0L
    val tCc = time {
      val cc = graft.operators.Graph.connectedComponents(
        edges, "src", "dst")
      val census = cc.groupBy(col("comp")).count()
        .agg(count(lit(1)), max(col("count"))).collect()(0)
      nComp = census.getLong(0); giant = census.getLong(1)
    }
    println(f"CCSTRESS edges=$nEdges nodes=$nNodes time=$tCc%.1f " +
      f"components=$nComp giant=$giant")
    // adversarial diameter: a single 1M-node PATH. Plain hash-min needs
    // 1M rounds (one hop per round); the pointer jump must close it
    // within the default 30-round budget — this is the O(log n) claim
    // measured, not asserted
    val chain = spark.range(999999L)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    var chainOk = false
    val tChain = time {
      val cc = graft.operators.Graph.connectedComponents(chain, "src", "dst")
      val census = cc.agg(countDistinct(col("comp")), count(lit(1))).collect()(0)
      chainOk = census.getLong(0) == 1L && census.getLong(1) == 1000000L
    }
    println(f"CCCHAINSTRESS nodes=1000000 diameter=999999 " +
      f"time=$tChain%.1f one_component=$chainOk")
    spark.stop()
  }
}
