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
}
