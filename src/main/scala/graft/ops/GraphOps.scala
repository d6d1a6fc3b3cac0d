package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    *
    * Deep-BFS hygiene: each wave's persist is dropped once the next
    * wave is materialized, and `visited` is localCheckpoint'ed every
    * few hops — otherwise the union lineage grows linearly in depth
    * and the cache holds every historical wave (fine at 3 hops, fatal
    * at 20+).
    */
  def reachable(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val checkpointEvery = 4
    var visited = sources.select(col("node"), lit(0).as("hops"))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      // EAGER localCheckpoint per wave: materializes it and truncates
      // its plan to a leaf. Without this, wave k's logical plan nests
      // wave k-1's and the visited union tree — exponential plan
      // growth that OOMs the optimizer long before the data does.
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        // visited stays a flat union of checkpointed wave leaves;
        // re-checkpoint every few hops so even that stays shallow
        val grown = visited.unionByName(next)
        visited =
          if (hop % checkpointEvery == 0) grown.localCheckpoint(true) else grown
        frontier = next
      }
    }
    visited
  }
}
