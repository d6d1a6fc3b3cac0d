package graft

import org.apache.spark.sql.functions._
import graft.state.{Cuckoo, CuckooFilter}

/** Cuckoo-filter contracts: no false negatives for inserted keys,
  * deletion actually removes, bounded false positives, merge and
  * serialization round-trips, and the sharded fold/probe dataflow.
  */
class CuckooSpec extends SparkSpec {

  import spark.implicits._

  private val numShards = 16

  // deterministic key stream (splitmix-style so keys are well spread)
  private def keys(from: Long, n: Int): Seq[Long] =
    (from until from + n).map { i =>
      var x = i + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x ^ (x >>> 27)
    }

  test("no false negatives: every inserted key is found (incl. evicted)") {
    // size the table tight (load ~0.8) so the eviction path actually
    // runs — the involution property is what keeps relocated keys
    // findable
    val ks = keys(0, 20000)
    val f = CuckooFilter.create(24000)
    val inserted = ks.filter(f.insert)
    assert(inserted.size === ks.size, "inserts failed below design load")
    assert(ks.forall(f.contains))
  }

  test("deletion removes inserted keys; set goes empty") {
    val ks = keys(1000, 5000)
    val f = CuckooFilter.create(8000)
    ks.foreach(f.insert)
    ks.foreach(k => assert(f.remove(k), s"remove failed for $k"))
    assert(f.size === 0)
    // a fingerprint can survive only via fp+bucket collision between
    // two inserted keys; with all keys removed the table must be clean
    assert(ks.count(f.contains) === 0)
  }

  test("false positive rate bounded on disjoint keys") {
    val f = CuckooFilter.create(10000)
    keys(0, 8000).foreach(f.insert)
    val fp = keys(1000000, 20000).count(f.contains)
    // 4-slot 16-bit-fp theory: ~2·4/2^16 ≈ 1.2e-4 at FULL load; allow
    // a generous 10× guard band → 25 of 20k
    assert(fp < 25, s"fp=$fp of 20000")
  }

  test("insert is idempotent: double-insert, single-remove → absent") {
    val f = CuckooFilter.create(1000)
    val k = 42L
    assert(f.insert(k) && f.insert(k))
    assert(f.size === 1)
    assert(f.remove(k))
    assert(!f.contains(k))
  }

  test("serialize round-trips bytes and behavior") {
    val ks = keys(77, 3000)
    val f = CuckooFilter.create(4000)
    ks.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize())
    assert(g.size === f.size)
    assert(ks.forall(g.contains))
    assert(java.util.Arrays.equals(g.serialize(), f.serialize()))
  }

  test("merge: union of two filters, every key still findable") {
    val a = CuckooFilter.create(8000)
    val b = CuckooFilter.create(8000)
    val ka = keys(0, 3000)
    val kb = keys(50000, 3000)
    ka.foreach(a.insert)
    kb.foreach(b.insert)
    assert(a.mergeInPlace(b))
    assert((ka ++ kb).forall(a.contains))
  }

  test("overflow surfaces as insert failure far past design capacity") {
    val f = CuckooFilter.create(256)
    // pow2 sizing gives real capacity ~4·buckets; push way past it
    val results = keys(0, 5000).map(f.insert)
    assert(results.contains(false), "expected at least one failed insert")
    // keys that DID insert are still all findable
    val ok = keys(0, 5000).zip(results).filter(_._2).map(_._1)
    assert(ok.forall(f.contains))
  }

  test("sharded build + broadcast probe + shuffle probe agree; fold deletes") {
    val ins = keys(0, 4000)
    val insDf = ins.toDF("h")
    val shards = Cuckoo.buildShards(insDf, numShards, 1024).cache()
    assert(shards.agg(sum("count")).head().getLong(0) === 4000L)

    val probeIn = Cuckoo.probeShuffleHash(insDf, shards, numShards)
    assert(probeIn.filter(!col("tombstoned")).count() === 0L)

    val blobs = shards.select(col("shard"), col("cuckoo")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val bc = spark.sparkContext.broadcast(blobs)
    val viaCol = insDf.withColumn("t",
      Cuckoo.blobsColumnBcHash(bc, numShards, col("h")))
    assert(viaCol.filter(!col("t")).count() === 0L)

    // fold-delete half the keys: deleted gone, kept still present
    val (del, keep) = ins.splitAt(2000)
    val folded = Cuckoo.foldShardsInto(del.toDF("h"), shards, numShards,
      1024, delete = true).cache()
    assert(folded.filter(col("overflow")).count() === 0L)
    assert(folded.agg(sum("count")).head().getLong(0) === 2000L)
    val probeDel = Cuckoo.probeShuffleHash(del.toDF("h"), folded, numShards)
    assert(probeDel.filter(col("tombstoned")).count() === 0L)
    val probeKeep = Cuckoo.probeShuffleHash(keep.toDF("h"), folded, numShards)
    assert(probeKeep.filter(!col("tombstoned")).count() === 0L)
  }

  test("fold-insert into existing shards; untouched shards byte-identical") {
    val shards = Cuckoo.buildShards(keys(0, 2000).toDF("h"), numShards, 2048)
      .cache()
    // delta keys all land in one shard: pick keys by shard residue
    val oneShard = keys(10000, 6000).filter(h =>
      java.lang.Math.floorMod(h, numShards.toLong) == 3L).take(100)
    assert(oneShard.nonEmpty)
    val folded = Cuckoo.foldShardsInto(oneShard.toDF("h"), shards,
      numShards, 2048).cache()
    val before = shards.collect().map(r => r.getInt(0) ->
      r.getAs[Array[Byte]](1)).toMap
    folded.collect().foreach { r =>
      val s = r.getInt(0)
      val blob = r.getAs[Array[Byte]]("cuckoo")
      if (s != 3)
        assert(java.util.Arrays.equals(blob, before(s)),
          s"untouched shard $s must pass through byte-identical")
    }
    val probe = Cuckoo.probeShuffleHash(oneShard.toDF("h"), folded, numShards)
    assert(probe.filter(!col("tombstoned")).count() === 0L)
  }
}
