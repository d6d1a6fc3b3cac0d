package graft.state

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better Than
  * Bloom", CoNEXT 2014) — the north_rule's second URL-seen option and
  * the one that supports DELETION.
  *
  * The engine's url-seen Bloom is monotone: once a canon URL is in the
  * blobs there is no way to un-see it, so change-rate recrawl seeds
  * ([[graft.sources.Cdx.toRecrawlSeeds]]) would be dropped by the
  * enqueue dedup forever. The cuckoo filter carries the non-monotone
  * part of the state as a bounded EXCEPTION set: fingerprints of URLs
  * marked for refetch. Admission is `!maybe_seen || tombstoned`, and a
  * re-admitted URL's fingerprint is deleted — deletion is what makes
  * the recrawl exactly-once instead of a permanent re-admit loop.
  *
  * Layout: `numBuckets` buckets × 4 slots × 16-bit fingerprints in one
  * Array[Short] (0 = empty; fingerprints are forced non-zero). A key's
  * two candidate buckets are i1 = H(key) and i2 = i1 XOR H'(fp) — the
  * partial-key cuckoo property: either index plus the stored fp
  * recovers the other, so same-shape filters merge and slots relocate
  * without the original keys. False-positive rate ≈ 2·4/2^16 ≈ 1.2e-4
  * at full load; no false negatives for successfully-inserted keys.
  *
  * Deliberate divergence from Bloom: inserts can FAIL once the table
  * is ~95% full AND the victim stash (Fan et al.'s eviction-victim
  * cache — it preserves no-false-negatives across exhausted eviction
  * chains) is full; a failing insert refuses BEFORE evicting, so it
  * never displaces a resident. Failure surfaces as an `overflow` flag
  * on the shard row, mirroring [[Bloom.foldShardsInto]]'s contract —
  * the caller rebuilds the shard larger from its base table (a cuckoo
  * filter cannot grow in place: fp alone does not recover the key's
  * hash, so re-bucketing needs the original keys).
  */
final class CuckooFilter private (val numBuckets: Int,
    private val table: Array[Short], private var count: Int,
    // victim stash (Fan et al. §4's eviction-victim cache): an
    // eviction chain that exhausts MaxKicks leaves one HOMELESS
    // fingerprint belonging to some earlier resident — dropping it
    // would be a silent false negative. The homeless (bucket, fp)
    // lands here instead; when the stash is full, insert fails CLEANLY
    // before any eviction starts, so a failed insert never corrupts
    // residents.
    private val stash: mutable.ArrayBuffer[(Int, Short)] =
      mutable.ArrayBuffer.empty) {

  import CuckooFilter._

  require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
    s"numBuckets must be a power of two, got $numBuckets")

  def size: Int = count

  /** load factor — shard folds flag overflow past ~0.95 even before an
    * insert fails, so rebuilds happen off the failure path */
  def load: Double = count.toDouble / (numBuckets.toLong * SlotsPerBucket)

  // numBuckets is always a power of two (see create) and indices mask,
  // not mod: altIdx must be an involution — altIdx(altIdx(i, fp), fp)
  // == i — or an evicted fingerprint becomes unfindable (a false
  // negative). (i ^ m) & mask with i < 2^k XORs only m's low bits, so
  // applying it twice cancels; remainder arithmetic would not.
  private val mask = numBuckets - 1

  private def idx1(hash: Long): Int = (mix(hash) & mask).toInt

  private def altIdx(i: Int, fp: Short): Int =
    ((i.toLong ^ mix(fp.toLong & 0xffffL)) & mask).toInt

  private def bucketInsert(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def bucketContains(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  private def bucketRemove(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  /** Insert an already-64-bit-hashed key. Idempotent by design choice:
    * a fingerprint already present in either candidate bucket is not
    * duplicated (the tombstone set is a SET — marking a URL twice must
    * not require deleting it twice). Returns false iff the table is too
    * full (eviction loop exhausted) — the overflow signal.
    */
  private def stashContains(i1: Int, i2: Int, fp: Short): Boolean =
    stash.exists { case (b, f) => f == fp && (b == i1 || b == i2) }

  def insert(hash: Long): Boolean = {
    val fp = fpOf(hash)
    val i1 = idx1(hash)
    val i2 = altIdx(i1, fp)
    if (bucketContains(i1, fp) || bucketContains(i2, fp) ||
      stashContains(i1, i2, fp)) return true
    if (bucketInsert(i1, fp)) { count += 1; return true }
    if (bucketInsert(i2, fp)) { count += 1; return true }
    // a full stash means an exhausted eviction chain could not park its
    // victim — refuse BEFORE evicting (no resident is ever displaced by
    // a failing insert)
    if (stash.size >= StashSize) return false
    // evict: deterministic LCG walk (reproducible folds — same keys in
    // the same order always yield the same blob bytes)
    var rng = mix(hash) | 1L
    var curFp = fp
    var i = if ((rng & 1L) == 0L) i1 else i2
    var kicks = 0
    while (kicks < MaxKicks) {
      rng = rng * 6364136223846793005L + 1442695040888963407L
      val base = i * SlotsPerBucket
      val slot = ((rng >>> 33) % SlotsPerBucket).toInt
      val evicted = table(base + slot)
      table(base + slot) = curFp
      curFp = evicted
      i = altIdx(i, curFp)
      if (bucketInsert(i, curFp)) { count += 1; return true }
      kicks += 1
    }
    // the homeless victim keeps its membership via the stash (i is one
    // of ITS valid buckets at this point in the walk)
    stash += ((i, curFp))
    count += 1
    true
  }

  def contains(hash: Long): Boolean = {
    val fp = fpOf(hash)
    val i1 = idx1(hash)
    val i2 = altIdx(i1, fp)
    bucketContains(i1, fp) || bucketContains(i2, fp) ||
      stashContains(i1, i2, fp)
  }

  /** Delete one copy of the key's fingerprint. Returns whether a slot
    * was cleared. Safe cuckoo-deletion contract: only delete keys that
    * were actually inserted (ours are — the engine deletes exactly the
    * tombstones it re-admits, and re-admission was gated on contains).
    */
  def remove(hash: Long): Boolean = {
    val fp = fpOf(hash)
    val i1 = idx1(hash)
    val i2 = altIdx(i1, fp)
    val removed = bucketRemove(i1, fp) || bucketRemove(i2, fp) || {
      val at = stash.indexWhere { case (b, f) => f == fp && (b == i1 || b == i2) }
      if (at >= 0) { stash.remove(at); true } else false
    }
    if (removed) count -= 1
    removed
  }

  /** Merge a same-shape filter in: every stored fingerprint sits in one
    * of its two buckets, and bucket index + fp is all the insert needs
    * (partial-key cuckooing). Returns false if any relocation failed.
    */
  def mergeInPlace(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets,
      s"cuckoo merge needs same shape: $numBuckets vs ${other.numBuckets}")
    var ok = true
    var i = 0
    while (i < numBuckets) {
      val base = i * SlotsPerBucket
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.table(base + s)
        if (fp != 0) ok &= insertFpAt(i, fp)
        s += 1
      }
      i += 1
    }
    other.stash.foreach { case (b, fp) => ok &= insertFpAt(b, fp) }
    ok
  }

  /** insert a bare (bucket, fp) pair — the merge/relocation primitive;
    * same stash discipline as [[insert]]
    */
  private def insertFpAt(i: Int, fp: Short): Boolean = {
    val ia = altIdx(i, fp)
    if (bucketContains(i, fp) || bucketContains(ia, fp) ||
      stashContains(i, ia, fp)) return true
    if (bucketInsert(i, fp)) { count += 1; return true }
    if (bucketInsert(ia, fp)) { count += 1; return true }
    if (stash.size >= StashSize) return false
    var rng = mix(fp.toLong & 0xffffL) | 1L
    var curFp = fp
    var cur = i
    var kicks = 0
    while (kicks < MaxKicks) {
      rng = rng * 6364136223846793005L + 1442695040888963407L
      val base = cur * SlotsPerBucket
      val slot = ((rng >>> 33) % SlotsPerBucket).toInt
      val evicted = table(base + slot)
      table(base + slot) = curFp
      curFp = evicted
      cur = altIdx(cur, curFp)
      if (bucketInsert(cur, curFp)) { count += 1; return true }
      kicks += 1
    }
    stash += ((cur, curFp))
    count += 1
    true
  }

  /** fixed little-endian layout: magic, numBuckets, count, table,
    * stash length + (bucket, fp) entries
    */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(16 + table.length * 2 + stash.size * 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).putInt(numBuckets).putInt(count)
    var i = 0
    while (i < table.length) { bb.putShort(table(i)); i += 1 }
    bb.putInt(stash.size)
    stash.foreach { case (b, fp) => bb.putInt(b).putShort(fp) }
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  val StashSize = 16
  private val Magic = 0x43554b46 // "CUKF"

  /** splitmix64 finalizer — decorrelates bucket index from fp bits */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 16-bit non-zero fingerprint of a 64-bit hash */
  def fpOf(hash: Long): Short = {
    val f = (mix(hash ^ 0x5bf03635L) >>> 48).toInt & 0xffff
    (if (f == 0) 1 else f).toShort
  }

  /** capacity-driven constructor: buckets sized so `expectedItems` fits
    * at ~84% load (the empirically safe bound for 4-slot tables is
    * ~95%; the margin keeps folds off the eviction-failure path)
    */
  def create(expectedItems: Long): CuckooFilter = {
    val needed = math.max(8L, (expectedItems / (SlotsPerBucket * 0.84)).toLong + 1L)
    val buckets = java.lang.Long.highestOneBit(needed - 1) * 2 // next pow2
    val b = math.min(buckets, 1L << 28).toInt
    new CuckooFilter(b, new Array[Short](b * SlotsPerBucket), 0)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == Magic, "not a cuckoo filter blob")
    val nb = bb.getInt()
    val count = bb.getInt()
    val table = new Array[Short](nb * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort(); i += 1 }
    val stash = mutable.ArrayBuffer.empty[(Int, Short)]
    val ns = bb.getInt()
    (0 until ns).foreach(_ => stash += ((bb.getInt(), bb.getShort())))
    new CuckooFilter(nb, table, count, stash)
  }
}

/** Sharded cuckoo state — [[Bloom]]'s dataflow contracts (one 8-byte
  * key shuffle, each blob moves once, one task holds one shard) with
  * insert AND delete folds. Shard rows are (shard INT, cuckoo BINARY,
  * count BIGINT).
  */
object Cuckoo {

  private def shardOfHash(h: Column, numShards: Int): Column =
    Bloom.shardOfHash(h, numShards)

  /** Build per-shard blobs from 64-bit keys (column `h`). Same
    * pre-repartition rationale as [[Bloom.buildShards]]: map-side
    * partials must not build a full-size table per task per shard.
    */
  def buildShards(hashes: DataFrame, numShards: Int,
      itemsPerShard: Long): DataFrame = {
    val buildUdf = udf { (hs: Seq[Long]) =>
      val f = CuckooFilter.create(math.max(itemsPerShard, hs.size.toLong))
      hs.foreach(f.insert)
      f.serialize()
    }
    hashes
      .select(shardOfHash(col("h"), numShards).as("shard"), col("h"))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("h")).as("hs"))
      .select(col("shard"), buildUdf(col("hs")).as("cuckoo"),
        size(col("hs")).cast("long").as("count"))
  }

  /** Fold keys INTO (delete = false) or OUT OF (delete = true) the
    * existing shard blobs. Untouched shards pass through byte-identical
    * (no deserialize round-trip — the LSM's untouched-shard identity
    * contract). Output (shard, cuckoo, count, overflow): overflow means
    * an insert failed or load passed 0.95 — rebuild that shard larger
    * from its base table, exactly the [[Bloom.foldShardsInto]] recipe.
    */
  def foldShardsInto(hashes: DataFrame, old: DataFrame, numShards: Int,
      itemsPerShard: Long, delete: Boolean = false): DataFrame = {
    val foldUdf = udf { (blob: Array[Byte], cnt: java.lang.Long, hs: Seq[Long]) =>
      val prev = if (cnt == null) 0L else cnt.longValue()
      if (hs == null || hs.isEmpty) {
        (blob, prev, false)
      } else {
        val f = if (blob == null)
          CuckooFilter.create(math.max(itemsPerShard, hs.size.toLong))
        else CuckooFilter.deserialize(blob)
        var overflow = false
        if (delete) hs.foreach(f.remove)
        else hs.foreach(h => overflow |= !f.insert(h))
        overflow |= f.load > 0.95
        (f.serialize(), f.size.toLong, overflow)
      }
    }
    val grouped = hashes
      .select(shardOfHash(col("h"), numShards).as("shard"), col("h"))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("h")).as("hs"))
    old.select(col("shard"), col("cuckoo"), col("count"))
      .join(grouped, Seq("shard"), "full_outer")
      .select(col("shard"), foldUdf(col("cuckoo"), col("count"), col("hs")).as("r"))
      .select(col("shard"), col("r._1").as("cuckoo"),
        col("r._2").as("count"), col("r._3").as("overflow"))
  }

  /** Broadcast membership probe as an inline Column over an
    * already-collected blob map — zero extra stages, the shape the
    * engine uses for its per-batch admission filter. The tombstone set
    * is bounded by the active recrawl wave, so broadcast is the normal
    * regime; [[probeShuffleHash]] is the blow-up escape hatch.
    */
  def blobsColumnBcHash(
      bc: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]],
      numShards: Int, hCol: Column): Column = {
    val token = java.util.UUID.randomUUID().toString
    val probeUdf = udf { (h: Long, shard: Int) =>
      CuckooCache.filters(token, bc.value).get(shard).exists(_.contains(h))
    }
    probeUdf(hCol, shardOfHash(hCol, numShards))
  }

  /** Shard-shuffle probe for 64-bit keys — (h, tombstoned). Same scale
    * shape as [[Bloom.probeSeenShuffleHash]].
    */
  def probeShuffleHash(candidates: DataFrame, shards: DataFrame,
      numShards: Int): DataFrame = {
    val probeUdf = udf { (hs: Seq[Long], blob: Array[Byte]) =>
      val f = if (blob == null) null else CuckooFilter.deserialize(blob)
      hs.map(h => (h, f != null && f.contains(h)))
    }
    candidates.select(col("h")).distinct()
      .withColumn("shard", shardOfHash(col("h"), numShards))
      .repartition(numShards, col("shard"))
      .groupBy(col("shard"))
      .agg(collect_list(col("h")).as("hs"))
      .join(shards.select(col("shard"), col("cuckoo")), Seq("shard"), "left")
      .select(explode(probeUdf(col("hs"), col("cuckoo"))).as("r"))
      .select(col("r._1").as("h"), col("r._2").as("tombstoned"))
  }
}

/** per-executor deserialized-filter cache — same token-keyed LRU
  * rationale as [[BloomCache]] (broadcast ids restart per context).
  */
object CuckooCache {
  private val maxEntries = 4
  private val cache =
    new java.util.LinkedHashMap[String, Map[Int, CuckooFilter]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[Int, CuckooFilter]]): Boolean =
        size() > maxEntries
    }
  def filters(token: String,
      blobs: => Map[Int, Array[Byte]]): Map[Int, CuckooFilter] =
    cache.synchronized {
      val got = cache.get(token)
      if (got != null) got
      else {
        val built = blobs.map { case (s, b) => s -> CuckooFilter.deserialize(b) }
        cache.put(token, built)
        built
      }
    }
}
