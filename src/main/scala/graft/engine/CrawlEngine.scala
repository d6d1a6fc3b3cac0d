package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{canon, Extract}
import graft.model._
import graft.sites.{SiteProfile, Sites}
import graft.state.{Bloom, Store}

/** One micro-batch's outcome (driver-visible counters only). */
final case class BatchResult(
    batchId: Long,
    pagesFetched: Long,
    fetchErrors: Long,
    nodesAdded: Long,
    edgesAdded: Long,
    maxDepth: Int,
    frontierPending: Long)

/** The crawl loop — reference lifecycle E1 (SURVEY §3) re-expressed as
  * a driver-side micro-batch loop over Datasets:
  *
  *   frontier(ordered, per-host budgeted) ⋈ pages → extract/filter/
  *   canonicalize → anti-join dedup (nodes/edges) → append
  *   edges+nodes → bloom-update seen shards → append next frontier →
  *   metrics → atomic snapshot commit → stop-gate.
  *
  * Everything between driver decisions is declarative DataFrame
  * algebra: Catalyst does pushdown/pruning, AQE picks join strategies
  * and splits skewed partitions. Control returns to the driver only
  * for the stop-gate count and batch scheduling — the same
  * "approximate at batch granularity" contract as the reference's
  * post-page check (crawler/crawler.go:107-111).
  */
final class CrawlEngine(
    spark: SparkSession,
    val store: Store,
    profile: SiteProfile,
    cfg: CrawlConfig,
    pages: DataFrame,
    allowList: Option[DataFrame] = None,
    robots: Option[DataFrame] = None) {

  import spark.implicits._

  private val ordering: Seq[Column] =
    Seq(col("priority"), col("depth"), col("seq"))

  /** running total for the stop gate (reference totalNodesAdded,
    * crawler/metrics.go:70-77) — recovered from the metrics table on
    * resume.
    */
  private var totalNodesAdded: Long =
    store.read("metrics").map(
      _.filter(col("partition_id") === -1)
        .agg(coalesce(sum("nodes_added"), lit(0L))).as[Long].head()
    ).getOrElse(0L)

  def nodesTotal: Long = totalNodesAdded

  private def emptyFrontier: DataFrame =
    spark.emptyDataset[FrontierRow].toDF()

  private def emptyNodes: DataFrame = spark.emptyDataset[NodeRow].toDF()
  private def emptyEdges: DataFrame = spark.emptyDataset[EdgeRow].toDF()
  private def emptySeen: DataFrame = spark.emptyDataset[SeenShard].toDF()

  /** Bootstrap: seed URLs become frontier depth-0 rows; their names go
    * into `nodes` (the reference's twowaykv upsert assigns the seed an
    * id on its first AddEdges call; we do it eagerly), their canonical
    * urls into the seen shards.
    */
  def seed(urls: Seq[String]): Unit = {
    val seedDf = urls.zipWithIndex.toDF("url", "i")
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", lit(0))
      .withColumn("seq", col("i").cast("long"))
      .withColumn("priority", lit(0L))
      .withColumn("batch_id", lit(0L))
      .drop("i")
    val frontier0 = seedDf.select(
      col("url"), col("canon"), col("host"), col("depth"), col("seq"),
      col("priority"), col("batch_id"))
    val nodes0 = seedDf
      .select(profile.cleanName(col("url")).as("name"))
      .distinct()
      .withColumn("id", xxhash64(col("name")))
    val seen0 = Bloom.buildShards(
      frontier0.select(col("canon")), cfg.numShards,
      cfg.bloomItemsPerShard, cfg.bloomFpp)
    store.commit(0L,
      appends = Seq("nodes" -> nodes0),
      replaces = Seq("frontier" -> frontier0, "seen_shards" -> seen0))
  }

  /** Enqueue additional seed URLs into a live crawl (the streaming
    * ingestion path): rows the frontier or the node dictionary has
    * already seen are dropped, the rest join the frontier at depth 0.
    */
  def enqueue(urls: Seq[String]): Unit = {
    if (!store.exists("frontier")) { seed(urls); return }
    val frontier = store.readOr("frontier", emptyFrontier)
    val nodes = store.readOr("nodes", emptyNodes)
    val maxSeq = frontier.agg(coalesce(max("seq"), lit(0L))).as[Long].head()
    val batchId = store.batchId + 1
    val seedDf = urls.distinct.zipWithIndex.toDF("url", "i")
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", lit(0))
      .withColumn("seq", col("i").cast("long") + lit(maxSeq + 1))
      .withColumn("priority", lit(0L))
      .withColumn("batch_id", lit(batchId))
      .drop("i")
    val fresh = seedDf
      .join(frontier.select("canon"), Seq("canon"), "left_anti")
      .join(nodes.select(col("name")),
        profile.cleanName(col("url")) === col("name"), "left_anti")
      .select(col("url"), col("canon"), col("host"), col("depth"),
        col("seq"), col("priority"), col("batch_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (fresh.isEmpty) { fresh.unpersist(); return }
    val newNodes = fresh.select(profile.cleanName(col("url")).as("name"))
      .distinct()
      .join(nodes.select("name"), Seq("name"), "left_anti")
      .withColumn("id", xxhash64(col("name")))
    val delta = Bloom.buildShards(fresh.select("canon"), cfg.numShards,
      cfg.bloomItemsPerShard, cfg.bloomFpp)
    val seen = store.readOr("seen_shards", emptySeen)
    val mergedSeen =
      if (store.exists("seen_shards"))
        Bloom.mergeShards(seen, delta, cfg.bloomItemsPerShard, cfg.bloomFpp)
      else delta
    store.commit(batchId,
      appends = Seq("nodes" -> newNodes, "frontier" -> fresh),
      replaces = Seq("seen_shards" -> mergedSeen))
    fresh.unpersist()
  }

  /** A4: per-host politeness cap, salt-first to defuse hot-host skew
    * (north_rule). Phase 1 caps each (host, salt) bucket — a cheap
    * window whose partitions are S× finer than the hot host — so phase
    * 2's exact per-host window sees at most salt*budget rows per host,
    * not the host's full (possibly billions-deep) frontier backlog.
    */
  private def politenessCap(frontier: DataFrame): DataFrame =
    Politeness.capPerHost(frontier, cfg.hostBudget, cfg.salt, ordering)

  /** Deterministic global sequence numbers without a single-partition
    * window: range-partition by the order columns, then add per-
    * partition offsets (classic scalable zipWithIndex). The result
    * depends only on the total order of `orderCols`, not on the
    * partitioning.
    */
  private def withGlobalSeq(df: DataFrame, orderCols: Seq[Column],
      outName: String, offset: Long): DataFrame = {
    if (df.isEmpty) return df.withColumn(outName, lit(0L))
    val sorted = df.repartitionByRange(
        math.max(2, spark.sparkContext.defaultParallelism), orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsetMap: Map[Int, Long] = {
      var acc = offset
      counts.map { case (pid, c) => val r = pid -> acc; acc += c; r }.toMap
    }
    val mapExpr = map(offsetMap.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val out = sorted
      .withColumn(outName,
        element_at(mapExpr, col("__pid")) + row_number().over(w).cast("long") - 1L)
      .drop("__pid")
    out
  }

  /** Run one micro-batch. Returns None when the frontier is empty. */
  def step(): Option[BatchResult] = {
    val batchId = store.batchId + 1
    val frontier = store.readOr("frontier", emptyFrontier)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = store.readOr("nodes", emptyNodes)
    val edges = store.readOr("edges", emptyEdges)
    val seenShards = store.readOr("seen_shards", emptySeen)

    // --- schedule: politeness cap, then global priority-ordered take ---
    val eligible = politenessCap(frontier)
    val selected = eligible.orderBy(ordering: _*).limit(cfg.batchSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val selCount = selected.count()
    if (selCount == 0) { frontier.unpersist(); selected.unpersist(); return None }

    val deferred = frontier.join(selected.select("canon"), Seq("canon"), "left_anti")

    // --- fetch: frontier ⋈ pages (S1); misses → fetch_errors (F6) ---
    val fetched = selected.join(pages, Seq("url"), "inner")
    val errors = selected.join(pages.select(col("url")), Seq("url"), "left_anti")
      .select(col("url"), lit(batchId).as("batch_id"),
        lit("page not in corpus").as("reason"))

    // --- parse + extract + validate (S4/G1/D1-D5/F1-F4) ---
    val extracted = fetched
      .withColumn("__ex", Extract.extract_links(col("html"), lit(profile.name)))
      .select(
        col("url").as("src_url"),
        profile.cleanName(col("url")).as("src_name"),
        col("depth"), col("seq").as("src_seq"),
        col("__ex.links").as("links"), col("__ex.err").as("err"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val exploded = extracted
      .select(col("src_url"), col("src_name"), col("depth"), col("src_seq"),
        posexplode(col("links")).as(Seq("pos", "href")))
      .filter(profile.isValidLink(col("href")))
    val validLinks = allowList match {
      case Some(al) if profile.usesAllowList =>
        Sites.allowListSemiJoin(exploded, al, profile)
      case _ => exploded
    }

    // --- canonicalize; within-batch collapse by (page, clean name) —
    //     reference collapses dup hrefs per page via the name map
    //     (db/db.go:132-136, pinned db/db_test.go:283-287) ---
    val named = validLinks
      .withColumn("dst_name", profile.cleanName(col("href")))
      .dropDuplicates("src_url", "dst_name")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- node upsert (S6/J1): id = xxhash64(name) ---
    val batchNames = named.select(col("dst_name").as("name"))
      .union(extracted.select(col("src_name").as("name")))
      .distinct()
    val newNodes = batchNames
      .join(nodes.select("name"), Seq("name"), "left_anti")
      .withColumn("id", xxhash64(col("name")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- edges (J3/S5): candidates → anti-join → append-only dedup ---
    val nodesAll = nodes.select("name", "id").union(newNodes).persist(
      StorageLevel.MEMORY_AND_DISK)
    val candidates = named
      .join(nodesAll.withColumnRenamed("name", "src_name")
        .withColumnRenamed("id", "src"), Seq("src_name"))
      .join(nodesAll.withColumnRenamed("name", "dst_name")
        .withColumnRenamed("id", "dst"), Seq("dst_name"))
      .select(col("src"), col("dst")).distinct()
    val newEdges = candidates.join(edges, Seq("src", "dst"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- recursion set (S2): first discovery of each *newly created*
    //     node wins; children enqueued in (parent seq, DOM pos) order ---
    val discoveries = named
      .join(newNodes.select(col("name").as("dst_name")), Seq("dst_name"), "left_semi")
      .groupBy(col("dst_name"))
      .agg(min(struct(col("src_seq"), col("pos"), col("href"), col("depth")))
        .as("first"))
      .select(col("dst_name"), col("first.src_seq").as("src_seq"),
        col("first.pos").as("pos"), col("first.href").as("href"),
        col("first.depth").as("parent_depth"))
      .withColumn("url",
        when(col("href").startsWith("http"), col("href"))
          .otherwise(concat(lit(profile.base), col("href"))))
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", col("parent_depth") + 1)
      .withColumn("priority", col("depth").cast("long")) // BFS tier

    // robots.txt politeness (north_rule): disallowed (host, path
    // prefix) pairs never enter the frontier
    val allowedDiscoveries = robots match {
      case Some(rules) => graft.sites.Robots.filterAllowed(discoveries, rules)
      case None => discoveries
    }

    // URL-level guard (reference colly visited layer, J4): bloom
    // prefilter, exact anti-join vs pending frontier for maybes.
    val probed = Bloom.probeSeen(allowedDiscoveries, seenShards, cfg.numShards)
    val guarded = allowedDiscoveries.join(probed, Seq("canon"), "left")
      .withColumn("maybe_seen", coalesce(col("maybe_seen"), lit(false)))
    val definitelyNew = guarded.filter(!col("maybe_seen")).drop("maybe_seen")
    val confirmedNew = guarded.filter(col("maybe_seen")).drop("maybe_seen")
      .join(frontier.select("canon"), Seq("canon"), "left_anti")
    val newDiscoveries = definitelyNew.union(confirmedNew)

    val maxSeq = frontier.agg(coalesce(max("seq"), lit(0L))).as[Long].head()
    val newFrontier = withGlobalSeq(
      newDiscoveries, Seq(col("src_seq"), col("pos")), "seq", maxSeq + 1)
      .withColumn("batch_id", lit(batchId))
      .select(col("url"), col("canon"), col("host"), col("depth"),
        col("seq"), col("priority"), col("batch_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // --- seen-shard update (A5): delta blobs ∪ previous snapshot ---
    val delta = Bloom.buildShards(newFrontier.select("canon"),
      cfg.numShards, cfg.bloomItemsPerShard, cfg.bloomFpp)
    val mergedSeen =
      if (store.exists("seen_shards"))
        Bloom.mergeShards(seenShards, delta, cfg.bloomItemsPerShard, cfg.bloomFpp)
      else delta

    // --- metrics (A1-A3) with per-partition lineage (north_rule) ---
    val nodesAddedCount = newNodes.count()
    val edgesAddedCount = newEdges.count()
    val errorCount = errors.count()
    val maxDepthBatch = extracted.agg(coalesce(max("depth"), lit(0))).as[Int].head()
    val partMetrics = newFrontier
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("nodes_added"), max("depth").as("max_depth"))
      .select(lit(batchId).as("batch_id"), col("partition_id"),
        lit(0L).as("pages"), col("nodes_added"),
        col("max_depth"), current_timestamp().as("ts"))
    val batchMetrics = Seq(
      (batchId, -1, selCount, nodesAddedCount, maxDepthBatch))
      .toDF("batch_id", "partition_id", "pages", "nodes_added", "max_depth")
      .withColumn("ts", current_timestamp())
    val metrics = batchMetrics.unionByName(partMetrics)

    val pending = deferred.unionByName(newFrontier)
    // NOTE(scale): `frontier` is rewritten per batch here. At 10^10-URL
    // scale the pending set must be shard-partitioned and only touched
    // shards rewritten (same layout as seen_shards); the manifest
    // protocol already supports per-shard segment swap.

    store.commit(batchId,
      appends = Seq(
        "nodes" -> newNodes,
        "edges" -> newEdges,
        "metrics" -> metrics,
        "fetch_errors" -> errors),
      replaces = Seq(
        "frontier" -> pending,
        "seen_shards" -> mergedSeen))

    val pendingCount = store.readOr("frontier", emptyFrontier).count()
    totalNodesAdded += nodesAddedCount

    Seq(frontier, selected, extracted, named, newNodes, nodesAll, newEdges,
      newFrontier).foreach(_.unpersist())

    Some(BatchResult(batchId, selCount, errorCount, nodesAddedCount,
      edgesAddedCount, maxDepthBatch, pendingCount))
  }

  /** Loop until budget (F5) or empty frontier; approximate stop at
    * batch granularity like the reference's post-page check.
    */
  def run(): Seq[BatchResult] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BatchResult]
    var continue = true
    while (continue && out.length < cfg.maxBatches) {
      if (cfg.maxNodes != -1 && totalNodesAdded >= cfg.maxNodes) continue = false
      else step() match {
        case Some(r) => out += r
        case None => continue = false
      }
    }
    out.toSeq
  }
}
