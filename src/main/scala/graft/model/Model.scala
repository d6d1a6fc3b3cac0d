package graft.model

import java.sql.Timestamp

/** Input corpus row (BASELINE.json input_hint): Common-Crawl-style page. */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Frontier entry — the reference's implicit colly request queue made
  * explicit (crawler/crawler.go:66-74,113-118). Ordering contract:
  * (priority, depth, seq) lexicographic = deterministic BFS-ish
  * discovery order (SURVEY §2.8).
  */
final case class FrontierRow(
    url: String,
    canon: String,
    host: String,
    depth: Int,
    seq: Long,
    priority: Long,
    batch_id: Long)

/** Dictionary row — replaces the remote twowaykv id service
  * (db/db.go:65-105); id = xxhash64(name), collision-checked.
  */
final case class NodeRow(name: String, id: Long)

final case class EdgeRow(src: Long, dst: Long)

/** Per-batch, per-partition lineage + metrics (north_rule). */
final case class MetricsRow(
    batch_id: Long,
    partition_id: Int,
    pages: Long,
    nodes_added: Long,
    max_depth: Int,
    ts: Timestamp)

final case class FetchErrorRow(url: String, batch_id: Long, reason: String)

/** Serialized Bloom shard of the URL-seen set, keyed by
  * shard = pmod(xxhash64(canon_url), numShards) — explicit range
  * partitioning of the hash space (north_rule 10^10-URL scale).
  */
final case class SeenShard(shard: Int, bloom: Array[Byte], count: Long)

/** One LSM-log row for the frontier/seen state: kind 0 = canon was
  * consumed (selected) from the frontier; kind 1 = canon entered the
  * frontier (and the seen set). `batch` is the writing batch id — a
  * row is LIVE while batch > the fold watermark of its canon's shard
  * ([[LogWatermark]]); a staggered fold retires a shard's rows by
  * advancing the watermark (O(1)) instead of rewriting the log, and
  * a segment whose batch is ≤ every shard's watermark is dropped from
  * the manifest without I/O.
  */
final case class FrontierLogRow(canon: String, kind: Int, batch: Long)

/** Per-shard frontier-log fold watermark (the liveness boundary for
  * [[FrontierLogRow]]); persisted as the tiny `log_wm` table so
  * liveness survives any writer, journaled in manifest meta for the
  * O(1) open fast path.
  */
final case class LogWatermark(shard: Int, upto: Long)

/** Serialized cuckoo-filter shard of the recrawl tombstone set — the
  * DELETABLE exception set over the monotone url-seen Bloom (the
  * north_rule names both structures; deletion is the op a Bloom can't
  * do). Keyed by the same hash-space range partitioning as
  * [[SeenShard]].
  */
final case class CuckooShard(shard: Int, cuckoo: Array[Byte], count: Long)

/** Exact tombstone key (xxhash64 of the canonical url) — the truth
  * table behind the cuckoo prefilter: re-admission and deletion
  * confirm against it (cuckoo FPs never cause a spurious refetch, and
  * only really-inserted fingerprints are ever deleted — the safe
  * cuckoo-deletion contract), and it is the rebuild base when a shard
  * filter overflows.
  */
final case class RecrawlKey(h: Long)

/** Engine configuration (reference env surface, main.go:20-48). */
final case class CrawlConfig(
    site: String,
    maxNodes: Long = -1L, // MAX_APPROX_NODES; -1 = unlimited
    batchSize: Int = 10000, // frontier URLs fetched per micro-batch
    hostBudget: Int = Int.MaxValue, // politeness: pages/host/batch (A4)
    numShards: Int = 64, // bloom shards
    bloomItemsPerShard: Long = 1L << 20,
    bloomFpp: Double = 0.01,
    // FP budget for the PRESENCE families (edges_bloom / nodes_bloom),
    // priced separately from the url-seen family because their FP
    // costs differ by orders of magnitude: a url-seen FP widens an
    // exact confirm bounded by the PENDING frontier, while a presence
    // FP triggers an exact-confirm scan of the key's whole hash shard
    // of an UNBOUNDEDLY GROWING base table. At 1e-6 the expected
    // FP-triggered shard reads per batch stay < 1 even at
    // 10^6-candidate batches (≈28.8 bits/key vs 9.6 at 1%), so the
    // confirm's read volume tracks TRUE duplicates, not filter noise.
    presenceFpp: Double = 1e-6,
    maxBatches: Int = 1000,
    salt: Int = 8, // salting factor for the per-host cap
    // id width for the collision guard: 64 = real xxhash64 ids; tests
    // narrow it to force (and thus test) the loud-failure path
    idHashBits: Int = 64,
    // total-filter-state ceiling for the driver-resident seen mode;
    // above it the engine switches to the shard-shuffle probe +
    // distributed delta merge. Sized so the default config's three
    // families (url seen at bloomFpp + two presence families at the
    // denser presenceFpp ≈ 0.7 GiB total) stay broadcastable on the
    // multi-GiB executors that config models; deployments with small
    // executors lower it and get the shuffle probe.
    seenDriverStateLimit: Long = 1L << 30,
    // LSM compaction trigger: fold the frontier/seen log into the
    // sharded base tables once the log holds this many rows.
    // -1 = auto (max(4 × batchSize, pending/4)); a large value keeps
    // batches append-only (tests use this to pin the append path)
    compactLogThreshold: Long = -1L,
    // ceiling on the ESTIMATED BYTE size of the consumed-log side of
    // the frontier anti-join before the engine stops forcing a
    // broadcast and lets the plain (shuffle) anti-join run — a row
    // count alone lets millions of long canon URLs through the hint
    logBroadcastBytesLimit: Long = 64L << 20,
    // round-robin compaction width: a compaction batch folds at most
    // this many shards of each sharded base table, cycling through
    // the shard space across successive compactions (bounds the LSM
    // write-stall instead of rewriting the whole base in one batch).
    // -1 = fold everything in one batch
    compactShardsPerBatch: Int = -1,
    // minimum un-folded delta (in appended batches ≈ segment dirs /
    // numShards) before a compaction batch also folds the frozen
    // edge/node presence blobs and consolidates segments. In steady
    // state EVERY batch is a staggered compaction, and folding the
    // blobs each time meant ~60 MB of blob reads + broadcasts + two
    // table rewrites per batch — pure allocation churn that showed up
    // as GC-bound batch-time creep. The exact delta anti-join already
    // covers the un-folded window at any cadence; this only sets how
    // big that (bounded) window may grow.
    blobFoldDeltaBatches: Int = 4,
    // per-shard capacity of the recrawl-tombstone cuckoo filters —
    // sized for the active recrawl wave, not the corpus (tombstones
    // are deleted as they re-admit); overflow rebuilds from the exact
    // recrawl_keys table at a larger capacity
    recrawlItemsPerShard: Long = 1L << 16,
    // public-suffix rules for SITE-granularity politeness: when
    // non-empty, the A4 cap (and hostBudgets matching) keys on the
    // registrable domain (eTLD+1) instead of the raw host, so a site
    // fanning out over subdomains (cdn1./cdn2./www.) can't multiply
    // its budget; hosts with no registrable domain (bare TLDs, IPs)
    // keep their own key. Empty = per-host (the reference's shape).
    politenessSuffixRules: Seq[String] = Nil,
    // ignore the manifest-journaled driver ledger (per-tier pending
    // counts, log counters, rotation pointer) on open and rebuild it
    // by scanning the tables — the recovery escape hatch for a store
    // whose ledger is suspected corrupt. Normal opens trust the
    // journal: O(1) instead of an O(frontier) scan before batch 1.
    rebuildState: Boolean = false)
