package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Convergence-detection fixtures on graphs DEEPER than the old fixed
  * 8-round budget: the peel/relaxation loops must reach their true
  * fixed point by default, while an explicit cap still binds (the
  * driver entries pin 8 to match their unrolled/bounded oracles).
  */
class Round9GraphSpec extends SparkSpec {

  // an undirected 24-node path n00–n23: the 2-core is EMPTY, but the
  // peel strips only the two endpoints per round — 12 rounds to drain,
  // deeper than the old fixed 8
  private lazy val path24 = {
    import spark.implicits._
    (0 until 23).map(i => (f"n$i%02d", f"n${i + 1}%02d", 1L))
      .toDF("src", "dst", "w")
  }

  test("kCore: converges past the old 8-round horizon to the true core") {
    assert(Graph.kCore(path24, k = 2).count() == 0L,
      "the 2-core of a path is empty; a depth-bounded peel under-peels it")
  }

  test("kCore: an explicit round cap still binds") {
    // 8 rounds strip 16 of 24 nodes; the surviving middle path reports
    // its >=2-degree interior — nonempty, the documented capped contract
    assert(Graph.kCore(path24, k = 2, maxRounds = 8).count() > 0L)
  }

  test("shortestPaths: relaxes a 20-hop path fully on both routes") {
    import spark.implicits._
    val edges = (0 until 20).flatMap(i =>
        Seq((f"n$i%02d", f"n${i + 1}%02d", 1L),
          (f"n${i + 1}%02d", f"n$i%02d", 1L)))
      .toDF("src", "dst", "w")
    val nodes = (0 to 20).map(i => f"n$i%02d").toDF("node")
    val source = nodes.agg(min(col("node")).as("__src"))
    for (localMax <- Seq(10000L, 0L)) { // driver BFS route, then distributed
      val got = Graph.shortestPaths(edges, nodes, source,
          localMaxEdges = localMax)
        .orderBy(col("node")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got.length == 21, s"route localMax=$localMax lost nodes")
      assert(got.last == ("n20", 20L),
        s"route localMax=$localMax under-relaxed the 20-hop tail")
    }
  }

  test("shortestPaths: the hop cap still truncates when pinned") {
    import spark.implicits._
    val edges = (0 until 20).flatMap(i =>
        Seq((f"n$i%02d", f"n${i + 1}%02d", 1L),
          (f"n${i + 1}%02d", f"n$i%02d", 1L)))
      .toDF("src", "dst", "w")
    val nodes = (0 to 20).map(i => f"n$i%02d").toDF("node")
    val source = nodes.agg(min(col("node")).as("__src"))
    val got = Graph.shortestPaths(edges, nodes, source, maxHops = 8,
        localMaxEdges = 0L)
      .agg(max(col("hops"))).collect()(0).getLong(0)
    assert(got == 8L)
  }
}
