package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  test("tiered append registers (tier, shard) leaves; readTiersUpTo prunes deep tiers, never plain segments") {
    val store = freshStore()
    val s0 = store.stage(0L)
    // tiers 0..2, sharded by src
    val df = (1L to 90L).map(i => (i, i % 3)).toDF("src", "t")
      .withColumn("__tier", col("t").cast("int")).drop("t")
      .withColumn("__shard", pmod(xxhash64(col("src")), lit(4)).cast("int"))
    s0.appendSharded("frontier", df)
    s0.publish()
    val s1 = store.stage(1L)
    s1.append("frontier", Seq(1000L).toDF("src")) // plain segment
    s1.publish()

    // leaf registration: every sharded dir is __tier=T/__shard=K
    val dirs = store.segmentDirs("frontier")
    assert(dirs.exists(_.matches(".*__tier=\\d+/__shard=\\d+$")))
    assert(store.tiers("frontier") === Seq(0, 1, 2))

    // tier pruning: tiers ≤ 1 plus the plain segment, nothing deeper
    val pruned = store.readTiersUpTo("frontier", 1).get
      .select("src").as[Long].collect().toSet
    val want = (1L to 90L).filter(i => i % 3 <= 1).toSet + 1000L
    assert(pruned === want)
    // full tier range ≡ read()
    assert(store.readTiersUpTo("frontier", 2).get.count() ===
      store.read("frontier").get.count())
    // shard reads still see all tiers of their shard
    val all = store.read("frontier").get.select("src").as[Long].collect().toSet
    val byShard = (0 until 4).map(s =>
      store.readShards("frontier", Set(s))
        .map(_.select("src").as[Long].collect().toSet).getOrElse(Set.empty))
    assert(byShard.reduce(_ ++ _) === all)
  }

  test("sweepOrphans keeps live tiered leaves and foreign dirs, drops superseded ones") {
    val store = freshStore()
    val s0 = store.stage(0L)
    val df = (1L to 40L).map(i => (i, i % 2)).toDF("src", "t")
      .withColumn("__tier", col("t").cast("int")).drop("t")
      .withColumn("__shard", pmod(xxhash64(col("src")), lit(4)).cast("int"))
    s0.appendSharded("frontier", df)
    s0.publish()
    val rootP = java.nio.file.Paths.get(store.root)
    val foreign = rootP.resolve("_checkpointish")
    Files.createDirectories(foreign)
    Files.write(foreign.resolve("state"), Array[Byte](1, 2))

    // replace shards 0,1 with a tiered rewrite; 2,3 stay
    val s1 = store.stage(1L)
    val repl = (100L to 120L).map(i => (i, 0L)).toDF("src", "t")
      .withColumn("__tier", col("t").cast("int")).drop("t")
      .withColumn("__shard", pmod(xxhash64(col("src")), lit(4)).cast("int"))
      .filter(col("__shard").isin(0, 1))
    s1.replaceShards("frontier", repl, Seq(0, 1))
    s1.publish()
    store.sweepOrphans()

    // live segment files all exist; superseded b0 shard-0/1 leaves gone
    store.segmentDirs("frontier").foreach { d =>
      assert(Files.isDirectory(rootP.resolve(d)), s"live segment $d swept")
    }
    val b0 = rootP.resolve("frontier/b0-0")
    Files.walk(b0).iterator().asScala.filter(Files.isDirectory(_)).foreach { p =>
      val name = p.getFileName.toString
      assert(!(name == "__shard=0" || name == "__shard=1"),
        s"superseded leaf $p survived the sweep")
    }
    assert(Files.exists(foreign.resolve("state")), "foreign dir destroyed")
    // contents still exact: untouched shards hold only old rows, the
    // replaced shards hold only the rewrite's rows
    val got = store.read("frontier").get.select("src").as[Long].collect().toSet
    val oldKept = store.readShards("frontier", Set(2, 3)).get
      .select("src").as[Long].collect().toSet
    val newPart = store.readShards("frontier", Set(0, 1)).get
      .select("src").as[Long].collect().toSet
    assert(oldKept.subsetOf((1L to 40L).toSet))
    assert(newPart.nonEmpty && newPart.subsetOf((100L to 120L).toSet))
    assert(got === oldKept ++ newPart)
  }

  test("manifest meta: journaled with the snapshot, cleared by a publish that omits it") {
    val store = freshStore()
    val s0 = store.stage(0L)
    s0.append("edges", sharded(Seq((1L, 2L)), 4).drop("__shard"))
    s0.putMeta("eng.pending_tiers" -> "0:5,3:2", "eng.log" -> "1,2,3")
    s0.publish()
    assert(store.meta == Map(
      "eng.pending_tiers" -> "0:5,3:2", "eng.log" -> "1,2,3"))
    // survives a re-open (it rides the manifest itself)
    val reopened = new Store(store.root, spark)
    assert(reopened.meta("eng.pending_tiers") == "0:5,3:2")
    // a publish that does NOT re-put the ledger clears it — a foreign
    // writer can never leave a stale ledger for the next open
    val s1 = store.stage(1L)
    s1.append("edges", sharded(Seq((3L, 4L)), 4).drop("__shard"))
    s1.publish()
    assert(store.meta.isEmpty)
    assert(new Store(store.root, spark).meta.isEmpty)
    // illegal characters are rejected loudly (no JSON escaping layer)
    val s2 = store.stage(2L)
    intercept[IllegalArgumentException] { s2.putMeta("k" -> "a\"b") }
    // legacy manifest without a meta object parses as empty
    assert(Store.parseMeta("""{"batchId":3,"tables":{}}""").isEmpty)
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

  test("size-tiered consolidation folds same-leaf same-tier runs into one segment, rows intact") {
    val store = freshStore()
    // 6 append batches of similar-size per-shard segments → every
    // shard accumulates 6 same-tier dirs (one per batch)
    val rows = (1L to 300L).map(i => (i, i + 1L))
    (0L until 6L).foreach { b =>
      val st = store.stage(b)
      st.appendSharded("edges",
        sharded(rows.filter(_._1 % 6 == b), 4))
      st.publish()
    }
    val before = store.segmentDirs("edges")
    val expected = store.read("edges").get
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val plan = store.consolidationPlan("edges", minRun = 4)
    assert(plan.nonEmpty, "same-tier runs must be planned")
    // every planned group shares one leaf path
    plan.foreach { g =>
      assert(g.map(_.split('/').drop(2).mkString("/")).distinct.size === 1)
      assert(g.size >= 4)
    }

    val st = store.stage(6L)
    st.consolidateSegments("edges", plan)
    st.publish()

    val after = store.segmentDirs("edges")
    assert(after.size < before.size,
      s"consolidation must shrink the dir count (${before.size} -> ${after.size})")
    // rewritten rows land under THIS batch's segment id (watermark
    // ordering: a blob fold advancing to 6 covers them)
    plan.flatten.foreach(d => assert(!after.contains(d)))
    after.filterNot(before.contains).foreach { d =>
      assert(Store.batchOfDir(d) === 6L)
      assert(Store.shardOfDir(d).isDefined)
    }
    val got = store.read("edges").get
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(got === expected)
    // shard-restricted reads still partition the table
    val byShard = (0 until 4).map { s =>
      store.readShards("edges", Set(s))
        .map(_.select("src", "dst").as[(Long, Long)].collect().toSet)
        .getOrElse(Set.empty)
    }
    assert(byShard.map(_.size).sum === expected.size)
    // superseded dirs die at the next sweep
    store.sweepOrphans()
    plan.flatten.foreach { d =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(store.root, d)), s"$d must be swept")
    }
    val afterSweep = store.read("edges").get.count()
    assert(afterSweep === expected.size)
  }
}
