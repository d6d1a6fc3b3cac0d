package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.state.Store

/** The sharded-read contracts the engine's O(batch) claims rest on:
  * `readShards` prunes to the requested shards' segments (plus plain
  * segments, which may hold any shard's rows), and `readNewerThan`
  * returns exactly the post-watermark LSM delta.
  */
class StoreSpec extends SparkSpec {

  import spark.implicits._

  private def freshStore(): Store =
    new Store(Files.createTempDirectory("graft-store").toString, spark)

  private def sharded(rows: Seq[(Long, Long)], numShards: Int) =
    rows.toDF("src", "dst")
      .withColumn("__shard",
        pmod(xxhash64(col("src"), col("dst")), lit(numShards)).cast("int"))

  test("readShards reads only the requested shards' sharded segments") {
    val store = freshStore()
    val staged = store.stage(0L)
    staged.appendSharded("edges", sharded((1L to 200L).map(i => (i, i + 1)), 8))
    staged.publish()

    val all = store.read("edges").get.select("src", "dst").as[(Long, Long)]
      .collect().toSet
    assert(all.size === 200)

    // the union over per-shard reads is a partition of the table
    val byShard = (0 until 8).map { s =>
      store.readShards("edges", Set(s))
        .map(_.select("src", "dst").as[(Long, Long)].collect().toSet)
        .getOrElse(Set.empty)
    }
    assert(byShard.map(_.size).sum === 200)
    assert(byShard.reduce(_ ++ _) === all)
    // and each single-shard read lists ONLY that shard's segment dirs
    (0 until 8).foreach { s =>
      val dirs = store.segmentDirs("edges")
        .filter(d => Store.shardOfDir(d).forall(Set(s).contains))
      assert(dirs.forall(_.endsWith(s"__shard=$s")))
    }
  }

  test("readShards never skips plain segments (correctness over pruning)") {
    val store = freshStore()
    val s0 = store.stage(0L)
    s0.append("edges", Seq((1000L, 2000L)).toDF("src", "dst")) // plain
    s0.publish()
    val s1 = store.stage(1L)
    s1.appendSharded("edges", sharded(Seq((1L, 2L)), 8))
    s1.publish()
    // whatever shard we ask for, the plain segment's row must be there
    (0 until 8).foreach { s =>
      val got = store.readShards("edges", Set(s)).get
        .select("src", "dst").as[(Long, Long)].collect().toSet
      assert(got.contains((1000L, 2000L)))
    }
  }

  test("readNewerThan returns exactly the post-watermark segments") {
    val store = freshStore()
    (0L to 3L).foreach { b =>
      val st = store.stage(b)
      st.appendSharded("edges", sharded(Seq((b, b + 100L)), 4))
      st.publish()
    }
    assert(store.maxSegmentBatch("edges") === 3L)
    val newer = store.readNewerThan("edges", 1L).get
      .select("src").as[Long].collect().toSet
    assert(newer === Set(2L, 3L))
    assert(store.readNewerThan("edges", 3L).isEmpty)
    // watermark −1 (no blobs yet): the delta is the whole table
    val allDelta = store.readNewerThan("edges", -1L).get.count()
    assert(allDelta === 4L)
  }
}
