package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Analytics over the crawl's edge table — the queries the reference's
  * companion services answer against its graph store (degree stats,
  * bounded-hop reachability for "path between articles" lookups).
  *
  * Scale shapes: degree distribution is two hash aggregations on
  * 8-byte keys; k-hop reachability is k hash joins with the visited
  * set folded in (each wave anti-joins what is already reached, so a
  * wave never re-expands old nodes — frontier-style, same as the
  * crawler itself).
  */
object GraphOps {

  /** out-degree per src, then the distribution: degree → node count */
  def outDegreeDistribution(edges: DataFrame): DataFrame =
    edges
      .groupBy(col("src"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))

  /** top-k pages by in-degree (deterministic ties by dst) */
  def topByInDegree(edges: DataFrame, k: Int): DataFrame =
    edges
      .groupBy(col("dst"))
      .agg(count(lit(1)).as("in_degree"))
      .orderBy(col("in_degree").desc, col("dst").asc)
      .limit(k)

  /** Nodes reachable from `sources` within `maxHops` edges; returns
    * (node, hops) with the MINIMUM hop count (BFS layering).
    * `sources` needs a single column `node`.
    */
  def reachable(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    var visited = sources.select(col("node"), lit(0).as("hops"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .persist(StorageLevel.MEMORY_AND_DISK)
      visited = visited.unionByName(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontier = next
    }
    visited
  }
}
