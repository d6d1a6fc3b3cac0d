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

  test("pageRankWeighted: serial weighted recurrence; weight-1 ≡ unweighted") {
    // weighted: 1→10 w3, 1→11 w1 (1 passes 3/4 to 10), 2→10 w2;
    // duplicate (3,10) rows must collapse by SUM (w 1+2 = 3); 3→11 w1
    val we = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (2L, 10L, 2.0),
      (3L, 10L, 1.0), (3L, 10L, 2.0), (3L, 11L, 1.0))
      .toDF("src", "dst", "weight")
    val got = GraphOps.pageRankWeighted(we, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nodes = Seq(1L, 2L, 3L, 10L, 11L)
    val out = Map( // collapsed weights
      1L -> Seq((10L, 3.0), (11L, 1.0)),
      2L -> Seq((10L, 2.0)),
      3L -> Seq((10L, 3.0), (11L, 1.0)))
    val n = nodes.length.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to 3).foreach { _ =>
      val dm = nodes.filterNot(out.contains).map(r).sum
      val contrib = nodes.flatMap { s =>
        val w = out.getOrElse(s, Nil)
        val tot = w.map(_._2).sum
        w.map { case (d, x) => d -> r(s) * x / tot }
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(x => x ->
        (0.15 / n + 0.85 * (contrib.getOrElse(x, 0.0) + dm / n))).toMap
    }
    got.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-12, s"node $k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)

    // all-ones weights reproduce the unweighted op exactly
    val e1 = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val a = GraphOps.pageRank(e1, iters = 3)
      .collect().map(r2 => r2.getLong(0) -> r2.getDouble(1)).toMap
    val b = GraphOps.pageRankWeighted(
      e1.withColumn("weight", lit(1.0)), iters = 3)
      .collect().map(r2 => r2.getLong(0) -> r2.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-15, s"node $k") }
  }

  test("projectGraph: weighted group edges, self-loops dropped by default") {
    // groups: odd/even. edges 1→2 (odd→even), 2→3 ×2 via parallel rows
    // (even→odd), 1→3 (odd→odd: SELF-LOOP in group space), 4→2
    // (even→even: self-loop)
    val e = Seq((1L, 2L), (2L, 3L), (2L, 3L), (1L, 3L), (4L, 2L))
      .toDF("src", "dst")
    val groups = Seq(1L, 2L, 3L, 4L)
      .toDF("node").withColumn("grp", col("node") % 2)
    val got = GraphOps.projectGraph(e, groups)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 1L), (0L, 1L, 2L)))
    val withSelf = GraphOps.projectGraph(e, groups, dropSelf = false)
      .as[(Long, Long, Long)].collect().toSet
    assert(withSelf === Set(
      (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 1L), (0L, 0L, 1L)))
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

  test("pageRank matches a serial reference recurrence; mass conserved with dangling") {
    // order→part style graph: 1,2,3 link into 10,11; 10/11 dangling
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L), (3L, 10L))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(e, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // serial reference: same recurrence, plain Scala
    val nodes = Seq(1L, 2L, 3L, 10L, 11L)
    val out = Map(1L -> Seq(10L, 11L), 2L -> Seq(10L), 3L -> Seq(11L, 10L))
    val n = nodes.length.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to 4).foreach { _ =>
      val dm = nodes.filterNot(out.contains).map(r).sum
      val contrib = nodes.flatMap(s =>
        out.getOrElse(s, Nil).map(_ -> r(s) / out(s).length))
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(x => x ->
        (0.15 / n + 0.85 * (contrib.getOrElse(x, 0.0) + dm / n))).toMap
    }
    assert(got.keySet === r.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-12, s"node $k") }
    // dangling redistribution conserves total mass
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // dangling sinks accumulate more than sources
    assert(got(10L) > got(1L))
  }

  test("connectedComponents: star contraction converges in O(log n) rounds on a 512-chain") {
    // single chain 0—1—…—511: diameter 511. O(diameter) label
    // propagation would need >500 rounds; large-star/small-star must
    // finish inside 15 or the op's convergence require throws.
    val chain = (0L until 511L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = spark.range(0, 512L).select(col("id").as("node"))
    val labels = GraphOps.connectedComponents(chain, nodes, maxRounds = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 512)
    assert(labels.values.toSet === Set(0L))
  }

  test("connectedComponents: multiple blocks, isolated nodes, duplicate/reversed edges") {
    // two 8-node chains + one triangle + isolated nodes 100, 101;
    // edges deliberately duplicated and reversed
    val e = ((0L until 7L).map(i => (i, i + 1)) ++
      (10L until 17L).map(i => (i + 1, i)) ++ // reversed chain 10..17
      Seq((20L, 21L), (21L, 22L), (22L, 20L), (20L, 21L))).toDF("src", "dst")
    val nodes = (0L to 7L).union(10L to 17L).union(20L to 22L)
      .union(Seq(100L, 101L)).toDF("node")
    val labels = GraphOps.connectedComponents(e, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 7L).foreach(i => assert(labels(i) === 0L))
    (10L to 17L).foreach(i => assert(labels(i) === 10L))
    (20L to 22L).foreach(i => assert(labels(i) === 20L))
    assert(labels(100L) === 100L)
    assert(labels(101L) === 101L)
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

  test("feedback loop E2E: weighted host ranks drive the engine's fetch order") {
    import graft.engine.CrawlEngine
    import graft.model.CrawlConfig
    import graft.sites.{Sites, SyntheticWeb}
    import graft.state.Store

    val spec = SyntheticWeb.Spec("web", numPages = 40L, seed = 42L,
      numHosts = 4)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    // one candidate url per host actually present in the corpus
    val byHost = pages
      .select(col("url"), graft.functions.canon.host_of(col("url")).as("host"))
      .groupBy("host").agg(min(col("url")).as("url"))
      .as[(String, String)].collect().toMap
    assert(byHost.size >= 3, byHost.toString)

    // "previous crawl's" host graph: h2 and h3 get the in-weight
    val hostEdges = Seq((0L, 2L, 5.0), (1L, 2L, 7.0), (0L, 3L, 6.0),
      (1L, 3L, 4.0), (2L, 0L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "weight")
    val ranks = GraphOps.pageRankWeighted(hostEdges, iters = 3)
      .select(concat(lit("h"), col("node").cast("string"),
        lit(".web.test")).as("node"), col("rank"))
    val ranked = ranks.as[(String, Double)].collect().sortBy(-_._2)
    val rankedHosts = ranked.map(_._1).toSeq
    // distinct ranks ⇒ the 2-tier histogram cut puts exactly the top
    // two hosts in tier 0 (whichever the power iteration says they are)
    assert(ranked.map(_._2).distinct.length == ranked.length)

    // rank → tiers → prioritized seeds → the engine schedules hot first
    val candidates = byHost.values.toSeq.toDF("url")
    val seeds = GraphOps.rankToSeedTiers(ranks, candidates, nTiers = 2,
        quantize = r => r)
      .as[(String, Long)].collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val cfg = CrawlConfig(site = "web", batchSize = 2, numShards = 8,
      bloomItemsPerShard = 1 << 14, compactLogThreshold = 1L << 40)
    val eng = new CrawlEngine(spark, new Store(root, spark),
      Sites.all("web"), cfg, pages)
    eng.seedPrioritized(seeds)
    eng.step()
    val consumed = eng.store.read("frontier_log").get
      .filter(col("kind") === 0).select("canon").as[String].collect().toSet
    val expected = rankedHosts.take(2).flatMap(byHost.get)
      .toDF("url")
      .select(graft.functions.canon.canonical_url(col("url")))
      .as[String].collect().toSet
    assert(consumed == expected,
      s"batch 1 should fetch the two top-ranked hosts' urls: $consumed vs $expected")
  }

  test("rankToSeedTiers: equal-count histogram tiers, unknown-host default") {
    // 8 hosts with distinct integer ranks 8..1 → nTiers=4 ⇒ 2 per tier
    val ranks = (1 to 8).map(i => (s"h$i.test", (9 - i).toDouble))
      .toDF("node", "rank")
    val urls = ((1 to 8).map(i => s"https://h$i.test/p") :+
      "https://new.test/p").toDF("url")
    val got = GraphOps.rankToSeedTiers(ranks, urls, nTiers = 4,
        quantize = r => r)
      .as[(String, Long)].collect().toMap
    assert(got("https://h1.test/p") == 0 && got("https://h2.test/p") == 0)
    assert(got("https://h3.test/p") == 1 && got("https://h4.test/p") == 1)
    assert(got("https://h5.test/p") == 2 && got("https://h6.test/p") == 2)
    assert(got("https://h7.test/p") == 3 && got("https://h8.test/p") == 3)
    // never-ranked host lands in the middle tier by default
    assert(got("https://new.test/p") == 2)
    // tied ranks share a tier (the histogram cut, not row_number)
    val tied = GraphOps.rankToSeedTiers(
        Seq(("a.test", 5.0), ("b.test", 5.0), ("c.test", 1.0))
          .toDF("node", "rank"),
        Seq("https://a.test/x", "https://b.test/x", "https://c.test/x")
          .toDF("url"),
        nTiers = 3, quantize = r => r)
      .as[(String, Long)].collect().toMap
    assert(tied("https://a.test/x") == tied("https://b.test/x"))
    assert(tied("https://c.test/x") == 2)
  }
}
