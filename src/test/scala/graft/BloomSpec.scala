package graft

import org.apache.spark.sql.functions._
import graft.state.Bloom

/** URL-seen structure contracts: no false negatives ever, bounded
  * false positives, strategy equivalence, incremental merge.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private val numShards = 16

  private def urls(from: Int, n: Int) =
    (from until from + n).map(i => s"https://h${i % 7}.test/page/$i")
      .toDF("canon")

  test("no false negatives: every inserted url probes maybe_seen") {
    val inserted = urls(0, 5000)
    val shards = Bloom.buildShards(inserted, numShards, 1024, 0.01).cache()
    for (probe <- Seq(
        Bloom.probeSeenBroadcast(inserted, shards, numShards),
        Bloom.probeSeenShuffle(inserted, shards, numShards))) {
      assert(probe.filter(!col("maybe_seen")).count() === 0L)
    }
  }

  test("false positive rate bounded on disjoint urls") {
    val shards = Bloom.buildShards(urls(0, 5000), numShards, 1024, 0.01).cache()
    val unseen = urls(100000, 5000)
    val fp = Bloom.probeSeenBroadcast(unseen, shards, numShards)
      .filter(col("maybe_seen")).count()
    assert(fp < 250, s"fp=$fp of 5000") // fpp 0.01 sized; 5% guard band
  }

  test("broadcast and shard-shuffle probes agree exactly") {
    val shards = Bloom.buildShards(urls(0, 3000), numShards, 1024, 0.01).cache()
    val mixed = urls(1500, 3000) // half seen, half not
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val a = asMap(Bloom.probeSeenBroadcast(mixed, shards, numShards))
    val b = asMap(Bloom.probeSeenShuffle(mixed, shards, numShards))
    assert(a === b)
  }

  test("incremental merge: union state == rebuilt state semantics") {
    val first = urls(0, 2000)
    val second = urls(2000, 2000)
    val s1 = Bloom.buildShards(first, numShards, 1024, 0.01)
    val delta = Bloom.buildShards(second, numShards, 1024, 0.01)
    val merged = Bloom.mergeShards(s1, delta, 1024, 0.01).cache()
    // counts accumulate per shard
    assert(merged.agg(sum("count")).head().getLong(0) === 4000L)
    // no false negatives across both generations
    val all = first.union(second)
    assert(Bloom.probeSeenBroadcast(all, merged, numShards)
      .filter(!col("maybe_seen")).count() === 0L)
  }

  test("shard key is stable hash-space range partitioning") {
    val df = urls(0, 1000)
      .select(col("canon"), Bloom.shardOf(col("canon"), numShards).as("shard"))
    val shards = df.select("shard").distinct().collect().map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s < numShards))
    // deterministic: same input → same shard
    val again = urls(0, 1000)
      .select(Bloom.shardOf(col("canon"), numShards).as("shard"))
    assert(df.select("shard").collect().map(_.getInt(0)).toSeq ===
      again.collect().map(_.getInt(0)).toSeq)
  }

  test("foldShardsInto: inserts are capacity-agnostic, untouched shards byte-identical, overflow flagged") {
    val fpp = 0.01
    val itemsPerShard = 64L
    def hashesOf(ks: Seq[Long]) = ks.toDF("h")
    val initial = hashesOf(1L to 5000L)
    val old = Bloom.buildShardsFromHashes(initial, numShards, itemsPerShard, fpp)
      .cache()

    // fold a delta touching ONLY the shards of keys 10_001..10_004
    val deltaKeys = (10001L to 10004L)
    val deltaShards = hashesOf(deltaKeys)
      .select(Bloom.shardOfHash(col("h"), numShards))
      .collect().map(_.getInt(0)).toSet
    val folded = Bloom.foldShardsInto(hashesOf(deltaKeys), old, numShards,
      itemsPerShard, fpp).cache()

    // no false negatives across old ∪ delta, probing the folded blobs
    // (shard arithmetic mirrors shardOfHash: pmod(h, numShards))
    def shardOf(h: Long): Int = (((h % numShards) + numShards) % numShards).toInt
    val all = (1L to 5000L) ++ deltaKeys
    val blobs = folded.select("shard", "bloom").collect()
      .map(r => r.getInt(0) -> Bloom.deserialize(r.getAs[Array[Byte]](1))).toMap
    all.foreach { h =>
      assert(blobs(shardOf(h)).mightContainLong(h), s"false negative for $h")
    }

    // untouched shards pass through BYTE-IDENTICAL (no deserialize/
    // serialize round-trip, no bit churn)
    val oldBlobs = old.select("shard", "bloom").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val newBlobs = folded.select("shard", "bloom").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    oldBlobs.keys.filterNot(deltaShards.contains).foreach { s =>
      assert(java.util.Arrays.equals(oldBlobs(s), newBlobs(s)),
        s"untouched shard $s blob changed")
    }

    // counts accumulate and overflow flags exactly the shards whose
    // load passed the design capacity of their CURRENT filter
    folded.collect().foreach { r =>
      val cnt = r.getAs[Long]("count")
      val cap = Bloom.designCapacity(
        Bloom.deserialize(r.getAs[Array[Byte]]("bloom")).bitSize(), fpp)
      assert(r.getAs[Boolean]("overflow") === (cnt > cap),
        s"shard ${r.getAs[Int]("shard")}: count=$cnt cap=$cap")
    }
    // 500 keys over 16 shards at 64 items/shard: some shards MUST
    // overflow — the flag actually fires
    assert(folded.filter(col("overflow")).count() > 0)
  }

  test("designCapacity inverts the filter sizing (create(n).bitSize -> ~n)") {
    for (n <- Seq(100L, 4096L, 1L << 17); fpp <- Seq(0.01, 0.001)) {
      val f = org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
      val cap = Bloom.designCapacity(f.bitSize(), fpp)
      assert(cap >= n * 95 / 100 && cap <= n * 105 / 100,
        s"designCapacity(${f.bitSize()}, $fpp) = $cap, want ~$n")
    }
  }
}
