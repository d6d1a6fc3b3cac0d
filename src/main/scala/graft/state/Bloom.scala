package graft.state

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Sharded Bloom URL-seen structure (SURVEY A5/J4, north_rule).
  *
  * The hash space of xxhash64(canonical_url) is range-partitioned into
  * `numShards` shards (shard = pmod(hash, S)); each shard owns one
  * serialized Bloom filter sized for its share of the frontier. The
  * two-phase membership contract (reference: colly's exact visited-set)
  * is bloom-prefilter → exact anti-join, so false positives never drop
  * a URL the reference would visit; false negatives are impossible.
  *
  * All merge work is distributed: per-batch delta blobs are built by a
  * typed Aggregator per shard, then OR-merged with the previous
  * snapshot's blobs via a second Aggregator — no driver-side state.
  */
/** per-executor deserialized-filter cache for the broadcast probe.
  *
  * Keyed by a per-broadcast UUID token minted where the broadcast is
  * created and shipped inside the UDF closure — NOT by broadcast id:
  * broadcast ids restart at 0 for every new SparkContext in the same
  * JVM (tests/bench spin up many local sessions), so an id-keyed
  * cache could serve a previous context's filters and silently return
  * wrong maybe_seen answers. Bounded LRU (a handful of generations)
  * so repeated sessions never leak filter sets.
  */
object BloomCache {
  private val maxEntries = 4
  private val cache =
    new java.util.LinkedHashMap[String, Map[Int, BloomFilter]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[Int, BloomFilter]]): Boolean =
        size() > maxEntries
    }
  def filters(token: String, blobs: => Map[Int, Array[Byte]]): Map[Int, BloomFilter] =
    cache.synchronized {
      val got = cache.get(token)
      if (got != null) got
      else {
        val built = blobs.map { case (s, b) => s -> Bloom.deserialize(b) }
        cache.put(token, built)
        built
      }
    }
}

object Bloom {

  /** Builds a serialized Bloom blob from the hashes of one shard. */
  final class BuildAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, hash: Long): BloomFilter = { b.putLong(hash); b }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** OR-merges serialized blobs (old snapshot ∪ batch delta). */
  final class MergeAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Array[Byte], BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, blob: Array[Byte]): BloomFilter = {
      b.mergeInPlace(deserialize(blob)); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** The key count a filter of `bitSize` bits was sized for at `fpp`
    * (inverse of spark's optimalNumOfBits(n, p) = -n·ln p/(ln 2)²).
    * Loading a filter past this is how bloom FP rates silently decay
    * toward 1 — the overflow test for [[foldShardsInto]].
    */
  def designCapacity(bitSize: Long, fpp: Double): Long = {
    val ln2sq = math.log(2) * math.log(2)
    math.max(1L, (bitSize * ln2sq / -math.log(fpp)).toLong)
  }

  /** Fold already-hashed keys (column `h`) INTO the existing per-shard
    * blobs — insertion is capacity-agnostic (works on blobs of ANY
    * size, unlike OR-merge, which requires bit-compatible filters), so
    * this is the fold that lets shards GROW: output rows carry an
    * `overflow` flag (inserted count exceeds the blob's design
    * capacity at `fpp`) and the caller rebuilds flagged shards from
    * their base table at a larger capacity.
    *
    * Scale shape: keys shuffle once by shard (8 bytes each) and
    * collapse to one row per shard; each blob moves once; a task holds
    * one shard's keys + one filter. Shards with no delta keys pass
    * through without a deserialize/serialize round-trip.
    */
  def foldShardsInto(hashes: DataFrame, old: DataFrame, numShards: Int,
      itemsPerShard: Long, fpp: Double): DataFrame = {
    val foldUdf = udf { (blob: Array[Byte], cnt: java.lang.Long, hs: Seq[Long]) =>
      val prev = if (cnt == null) 0L else cnt.longValue()
      if (hs == null || hs.isEmpty) {
        // untouched shard: blob passes through byte-identical
        val f = deserialize(blob)
        (blob, prev, prev > designCapacity(f.bitSize(), fpp))
      } else {
        val f = if (blob == null) BloomFilter.create(itemsPerShard, fpp)
                else deserialize(blob)
        hs.foreach(f.putLong)
        val n = prev + hs.size
        (serialize(f), n, n > designCapacity(f.bitSize(), fpp))
      }
    }
    val grouped = hashes
      .select(shardOfHash(col("h"), numShards).as("shard"), col("h"))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("h")).as("hs"))
    old.select(col("shard"), col("bloom"), col("count"))
      .join(grouped, Seq("shard"), "full_outer")
      .select(col("shard"),
        foldUdf(col("bloom"), col("count"), col("hs")).as("r"))
      .select(col("shard"), col("r._1").as("bloom"),
        col("r._2").as("count"), col("r._3").as("overflow"))
  }

  /** shard key column for a canonical-url column */
  def shardOf(canonUrl: Column, numShards: Int): Column =
    pmod(xxhash64(canonUrl), lit(numShards)).cast("int")

  /** shard key column for an already-hashed 64-bit key */
  def shardOfHash(h: Column, numShards: Int): Column =
    pmod(h, lit(numShards)).cast("int")

  /** Build per-shard delta blobs from 64-bit keys (column `h`) — the
    * long-keyed twin of [[buildShards]] for sets whose members are
    * already hashes (node ids, xxhash64(src, dst) edge keys).
    */
  def buildShardsFromHashes(hashes: DataFrame, numShards: Int,
      itemsPerShard: Long, fpp: Double): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val agg = udaf(new BuildAgg(itemsPerShard, fpp))
    hashes
      .select(shardOfHash(col("h"), numShards).as("shard"), col("h"))
      .repartition(numShards, $"shard")
      .groupBy($"shard")
      .agg(agg($"h").as("bloom"), count(lit(1)).as("count"))
  }

  /** [[blobsColumnBc]] for an already-hashed 64-bit key column. */
  def blobsColumnBcHash(bc: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]],
      numShards: Int, hCol: Column): Column = {
    val token = java.util.UUID.randomUUID().toString
    val probeUdf = udf { (h: Long, shard: Int) =>
      BloomCache.filters(token, bc.value).get(shard).exists(_.mightContainLong(h))
    }
    probeUdf(hCol, shardOfHash(hCol, numShards))
  }

  /** [[probeSeenShuffle]] for 64-bit keys: input column `h`, output
    * (h, maybe_seen). Same scale shape — one 8-byte-key shuffle, each
    * blob moves once, one task never holds more than one shard's state.
    */
  def probeSeenShuffleHash(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int): DataFrame = {
    val probeUdf = udf { (hs: Seq[Long], blob: Array[Byte]) =>
      val filter = if (blob == null) null else deserialize(blob)
      hs.map(h => (h, filter != null && filter.mightContainLong(h)))
    }
    val grouped = candidates.select(col("h")).distinct()
      .withColumn("shard", shardOfHash(col("h"), numShards))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("h")).as("hs"))
    grouped
      .join(seenShards.select(col("shard"), col("bloom")), Seq("shard"), "left")
      .select(explode(probeUdf(col("hs"), col("bloom"))).as("r"))
      .select(col("r._1").as("h"), col("r._2").as("maybe_seen"))
  }

  /** Build per-shard delta blobs for a batch of canonical urls.
    * Input df needs column `canon`; output (shard INT, bloom BINARY,
    * count BIGINT).
    *
    * Pre-repartitioned by shard so map-side partial aggregation sees
    * one or two shards per task — without this, every map task builds
    * (and shuffles) a full-size filter for *all* shards, turning an
    * 8-byte-per-row shuffle into numShards×blobSize per task.
    */
  def buildShards(urls: DataFrame, numShards: Int, itemsPerShard: Long,
      fpp: Double): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val agg = udaf(new BuildAgg(itemsPerShard, fpp))
    urls
      .select(shardOf(col("canon"), numShards).as("shard"),
        xxhash64(col("canon")).as("h"))
      .repartition(numShards, $"shard")
      .groupBy($"shard")
      .agg(agg($"h").as("bloom"), count(lit(1)).as("count"))
  }

  /** Merge previous snapshot shards with a batch delta (both
    * (shard, bloom, count)); shuffle is by shard — the hash-space
    * range partitioning that scales this to 10^10 URLs.
    */
  def mergeShards(old: DataFrame, delta: DataFrame, itemsPerShard: Long,
      fpp: Double): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val agg = udaf(new MergeAgg(itemsPerShard, fpp))
    old.unionByName(delta)
      .groupBy($"shard")
      .agg(agg($"bloom").as("bloom"), sum($"count").as("count"))
  }

  /** Two-phase membership, phase 1: probe distinct `canon` keys against
    * the sharded Bloom snapshot. Returns (canon STRING,
    * maybe_seen BOOLEAN): false ⇒ *definitely* unseen (no false
    * negatives); true ⇒ confirm with the exact anti-join (phase 2) so
    * bloom FPs never drop a URL the reference would visit.
    *
    * Scale shape: candidates shuffle once by shard (8-byte hashes) and
    * collapse to ONE row per shard; the 64-row join then moves each
    * blob exactly once and a single UDF call probes the whole shard's
    * candidate batch against one deserialized filter. No broadcast of
    * the (potentially GBs of) filter state, no per-row blob copies —
    * memory per task is one shard's candidates + one blob.
    */
  def probeSeen(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int): DataFrame =
    probeSeenAuto(candidates, seenShards, numShards)

  /** Strategy selection à la broadcast-vs-shuffle join: when the whole
    * filter state fits comfortably on executors, broadcast it and
    * probe per-row with zero shuffles; beyond the threshold, fall back
    * to the shard-shuffle probe that never materializes more than one
    * shard's state per task.
    */
  def probeSeenAuto(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int, broadcastThreshold: Long = 256L << 20): DataFrame = {
    val totalBytes = seenShards
      .agg(coalesce(sum(length(col("bloom"))), lit(0L)))
      .head().getLong(0)
    if (totalBytes <= broadcastThreshold)
      probeSeenBroadcast(candidates, seenShards, numShards)
    else probeSeenShuffle(candidates, seenShards, numShards)
  }

  /** Broadcast probe: ships the serialized shard map once per
    * executor (deserialized once, cached per broadcast id), then the
    * probe is a per-row UDF — no shuffle at all.
    */
  def probeSeenBroadcast(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int): DataFrame = {
    val spark = candidates.sparkSession
    val blobs: Map[Int, Array[Byte]] = seenShards
      .select(col("shard"), col("bloom")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val bc = spark.sparkContext.broadcast(blobs)
    val token = java.util.UUID.randomUUID().toString
    val probeUdf = udf { (canon: String, h: Long, shard: Int) =>
      val filters = BloomCache.filters(token, bc.value)
      filters.get(shard).exists(_.mightContainLong(h))
    }
    candidates.select(col("canon")).distinct()
      .withColumn("__h", xxhash64(col("canon")))
      .withColumn("__shard", pmod(col("__h"), lit(numShards)).cast("int"))
      .select(col("canon"),
        probeUdf(col("canon"), col("__h"), col("__shard")).as("maybe_seen"))
  }

  /** Inline broadcast probe as a Column — zero extra stages: callers
    * add `maybe_seen` directly to their plan. Only valid when the
    * filter state fits on executors (the caller checked, or state is
    * known-small); the 10^10-scale path is probeSeenShuffle.
    */
  def maybeSeenColumn(spark: org.apache.spark.sql.SparkSession,
      seenShards: DataFrame, numShards: Int, canonCol: Column): Column = {
    val blobs: Map[Int, Array[Byte]] = seenShards
      .select(col("shard"), col("bloom")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    blobsColumn(spark, blobs, numShards, canonCol)
  }

  /** maybeSeenColumn over an already-collected blob map (the engine
    * caches blobs across batches — no per-batch collect).
    */
  def blobsColumn(spark: org.apache.spark.sql.SparkSession,
      blobs: Map[Int, Array[Byte]], numShards: Int, canonCol: Column): Column =
    blobsColumnBc(spark.sparkContext.broadcast(blobs), numShards, canonCol)

  /** blobsColumn over a caller-managed broadcast — the caller can (and
    * the engine does) destroy the broadcast once the batch's jobs are
    * done, so per-batch filter broadcasts don't accumulate.
    */
  def blobsColumnBc(bc: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]],
      numShards: Int, canonCol: Column): Column = {
    val token = java.util.UUID.randomUUID().toString
    val probeUdf = udf { (h: Long, shard: Int) =>
      BloomCache.filters(token, bc.value).get(shard).exists(_.mightContainLong(h))
    }
    probeUdf(xxhash64(canonCol),
      pmod(xxhash64(canonCol), lit(numShards)).cast("int"))
  }

  /** Shard-shuffle probe: candidates shuffle once by shard (8-byte
    * hashes) and collapse to ONE row per shard; the numShards-row join
    * moves each blob exactly once and a single UDF call probes the
    * whole shard's candidate batch — memory per task is one shard's
    * candidates + one blob. The 10^10-URL path.
    */
  def probeSeenShuffle(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int): DataFrame = {
    val probeUdf = udf { (canons: Seq[String], hs: Seq[Long], blob: Array[Byte]) =>
      val filter = if (blob == null) null else deserialize(blob)
      canons.indices.map { i =>
        (canons(i), filter != null && filter.mightContainLong(hs(i)))
      }
    }
    val grouped = candidates.select(col("canon")).distinct()
      .withColumn("__h", xxhash64(col("canon")))
      .withColumn("shard", pmod(col("__h"), lit(numShards)).cast("int"))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("canon")).as("canons"),
        collect_list(col("__h")).as("hs"))
    grouped
      .join(seenShards.select(col("shard"), col("bloom")), Seq("shard"), "left")
      .select(explode(probeUdf(col("canons"), col("hs"), col("bloom"))).as("r"))
      .select(col("r._1").as("canon"), col("r._2").as("maybe_seen"))
  }
}
