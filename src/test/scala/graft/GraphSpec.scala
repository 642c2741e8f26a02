package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import scala.util.Random

class GraphSpec extends SparkTestBase {
  import spark.implicits._

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
      val want = Graph.densePageRank(edges, 8, 0.85)
      assert(got.keySet === want.keySet, s"seed $seed")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-10, s"seed $seed node $v: $r vs ${want(v)}")
      }
    }
  }

  test("pageRank weighted == weighted dense model; zero weights drop (3 seeds)") {
    for (seed <- Seq(4L, 29L, 83L)) {
      val rnd = new Random(seed)
      val edges = (1 to 120).map(_ => (rnd.nextInt(20).toLong,
        rnd.nextInt(20).toLong, rnd.nextInt(5).toDouble)) // weight 0..4
      val got = Graph.pageRank(
        edges.toDF("src", "dst", "w"), "src", "dst",
        iterations = 6, weightCol = Some("w"))
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val want = Graph.densePageRankWeighted(edges, 6)
      assert(got.keySet === want.keySet,
        s"seed $seed (zero-weight endpoints still rank)")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-10, s"seed $seed node $v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
    // doubling every weight changes nothing (scale invariance per source)
    val e1 = Seq((1L, 2L, 1.0), (1L, 3L, 3.0), (2L, 1L, 5.0))
    val r1 = Graph.densePageRankWeighted(e1, 8)
    val r2 = Graph.densePageRankWeighted(e1.map(t => (t._1, t._2, t._3 * 2)), 8)
    r1.foreach { case (v, r) => assert(math.abs(r - r2(v)) < 1e-12) }
  }

  test("pageRank: NaN/zero weights contribute nothing but endpoints still rank") {
    // NaN weight must not NaN every reachable rank (Spark's NaN > 0 is
    // true — the filter must exclude non-finite explicitly)
    val e = Seq((1L, 2L, 1.0), (1L, 3L, Double.NaN), (4L, 2L, 0.0))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(e, "src", "dst", iterations = 5,
      weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L),
      "nodes on weight-dropped edges still rank")
    assert(got.values.forall(r => !r.isNaN && r > 0))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    val want = Graph.densePageRankWeighted(
      Seq((1L, 2L, 1.0), (1L, 3L, Double.NaN), (4L, 2L, 0.0)), 5)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
  }

  test("pageRank frees each iteration's checkpoint (bounded executor storage)") {
    val e = (1 to 60).map(i => (i.toLong % 10, (i * 3).toLong % 10))
      .toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    Graph.pageRank(e, "src", "dst", iterations = 15).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // ONLY the returned ranks frame may remain: retired per-iteration
    // rank tables AND the edge-list-sized helper frames must be freed
    assert(after - before <= 1, s"leaked ${after - before} cached RDDs")
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
