package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  // a small directed graph: 1→2→3→4, 1→3, 5→6 (disconnected), 4→1 (cycle)
  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 6L), (4L, 1L))
    .toDF("src", "dst")

  test("out-degree distribution") {
    val d = GraphOps.outDegreeDistribution(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 has degree 2; nodes 2,3,4,5 have degree 1
    assert(d === Map(2L -> 1L, 1L -> 4L))
  }

  test("top by in-degree, deterministic ties") {
    val top = GraphOps.topByInDegree(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.head === ((3L, 2L))) // in-degree 2
    assert(top.tail.toSet === Set((1L, 1L), (2L, 1L))) // ties broken by dst asc
    assert(top(1) === ((1L, 1L)))
  }

  test("bounded-hop BFS with cycle: minimum hop counts, no re-expansion") {
    val sources = Seq(1L).toDF("node")
    val got = GraphOps.reachable(edges, sources, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // hop limit respected
    val oneHop = GraphOps.reachable(edges, sources, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(oneHop === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("deep BFS (20+ hops) completes: per-wave checkpoints keep plans flat") {
    // 30-node chain: hop counts equal node ids. Without the per-wave
    // localCheckpoint this OOMs the *optimizer* (exponentially nested
    // union/join plans) long before the data is big.
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.reachable(chain, Seq(0L).toDF("node"), maxHops = 20)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === (0L to 20L).map(i => i -> i.toInt).toMap)
    // early termination when the frontier drains before maxHops
    val short = GraphOps.reachable(chain, Seq(27L).toDF("node"), maxHops = 20)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(short === Map(27L -> 0, 28L -> 1, 29L -> 2))
  }
}
