package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import scala.util.Random

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Dense driver-side PageRank with identical semantics (multigraph
   * contributions, uniform dangling redistribution). */
  private def densePr(edges: Seq[(Long, Long)], iterations: Int,
      d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val idx = nodes.zipWithIndex.toMap
    val outDeg = edges.groupBy(_._1).map { case (s, es) => idx(s) -> es.length }
    var rank = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iterations) {
      val dangling = rank.indices
        .filterNot(outDeg.contains).map(rank).sum
      val next = Array.fill(n)((1.0 - d) / n + d * dangling / n)
      edges.foreach { case (s, t) =>
        next(idx(t)) += d * rank(idx(s)) / outDeg(idx(s))
      }
      rank = next
    }
    nodes.map(v => v -> rank(idx(v))).toMap
  }

  test("pageRank: two-node cycle converges to uniform; ranks sum to 1") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("pageRank: hub gains rank; dangling sink keeps mass conserved") {
    // 1→3, 2→3, 3 dangles: 3 must outrank 1 and 2, total mass 1
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 15)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(3L) > r(1L) && r(3L) > r(2L))
    assert(math.abs(r(1L) - r(2L)) < 1e-12, "symmetric sources tie")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank == dense driver model on random graphs (3 seeds)") {
    for (seed <- Seq(2L, 13L, 67L)) {
      val rnd = new Random(seed)
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 8)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val want = densePr(edges, 8, 0.85)
      assert(got.keySet === want.keySet, s"seed $seed")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-10, s"seed $seed node $v: $r vs ${want(v)}")
      }
    }
  }

  test("pageRank: parallel edges double the contribution; guards") {
    // 1→2 twice vs 1→3 once from a second source with equal rank
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // node 2 receives 2/3 of node 1's mass, node 3 receives 1/3
    assert(r(2L) > r(3L))
    // base includes the uniform dangling redistribution (nodes 2 and 3
    // hold 2/3 of the initial mass and have no out-edges)
    val base = (1.0 - 0.85) / 3 + 0.85 * (2.0 / 3) / 3
    assert(math.abs((r(2L) - base) / (r(3L) - base) - 2.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df(Seq(Seq(null, 2L)), "src:long,dst:long"), "src", "dst")
    }
  }
}
