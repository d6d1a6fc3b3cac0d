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

  /** shard key column for a canonical-url column */
  def shardOf(canonUrl: Column, numShards: Int): Column =
    pmod(xxhash64(canonUrl), lit(numShards)).cast("int")

  /** Build per-shard delta blobs for a batch of canonical urls.
    * Input df needs column `canon`; output (shard INT, bloom BINARY,
    * count BIGINT).
    */
  def buildShards(urls: DataFrame, numShards: Int, itemsPerShard: Long,
      fpp: Double): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val agg = udaf(new BuildAgg(itemsPerShard, fpp))
    urls
      .select(shardOf(col("canon"), numShards).as("shard"),
        xxhash64(col("canon")).as("h"))
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
    * Scale shape: both sides shuffle by shard (explicit hash-space
    * range partitioning), rows are sorted by shard within each task,
    * and the probe deserializes each shard's blob exactly once per
    * task — no broadcast of the (potentially GBs) filter state, no
    * per-row deserialization.
    */
  def probeSeen(candidates: DataFrame, seenShards: DataFrame,
      numShards: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val keyed = candidates.select(col("canon")).distinct()
      .withColumn("__h", xxhash64(col("canon")))
      .withColumn("__shard", pmod(col("__h"), lit(numShards)).cast("int"))
    val joined = keyed
      .join(seenShards.select(col("shard").as("__shard"), col("bloom")),
        Seq("__shard"), "left")
      .select(col("__shard"), col("canon"), col("__h"), col("bloom"))
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"))
    joined.mapPartitions { rows =>
      var curShard = Int.MinValue
      var curFilter: BloomFilter = null
      rows.map { r =>
        val shard = r.getInt(0)
        val canon = r.getString(1)
        val h = r.getLong(2)
        val blob = if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3)
        if (shard != curShard) {
          curShard = shard
          curFilter = if (blob == null) null else deserialize(blob)
        }
        (canon, curFilter != null && curFilter.mightContainLong(h))
      }
    }.toDF("canon", "maybe_seen")
  }
}
