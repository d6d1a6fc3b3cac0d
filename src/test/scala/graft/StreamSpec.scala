package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.CrawlEngine
import graft.model.CrawlConfig
import graft.sites.{Sites, SyntheticWeb}
import graft.state.Store
import graft.streaming.CrawlStream

class StreamSpec extends SparkSpec {

  import spark.implicits._

  test("seed-driven crawl: files consumed exactly once across restarts") {
    val spec = SyntheticWeb.Spec("wikipedia", numPages = 25L)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    val root = Files.createTempDirectory("graft-stream").toString
    val seedDir = Files.createTempDirectory("graft-seeds").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val cfg = CrawlConfig(site = "wikipedia", batchSize = 40,
      numShards = 8, bloomItemsPerShard = 4096)
    val engine = new CrawlEngine(spark, new Store(root, spark),
      Sites.wikipedia, cfg, pages)

    Files.writeString(Paths.get(seedDir, "s1.txt"),
      SyntheticWeb.pageUrl(spec, 0L) + "\n")
    val q1 = CrawlStream.seedDriven(spark, engine, seedDir, ckpt)
    q1.awaitTermination()

    val store = engine.store
    val edges1 = store.read("edges").get.count()
    val nodes1 = store.read("nodes").get.count()
    assert(edges1 > 0 && nodes1 > 0)

    // restart with no new files: checkpoint prevents reprocessing
    val q2 = CrawlStream.seedDriven(spark, engine, seedDir, ckpt)
    q2.awaitTermination()
    assert(store.read("edges").get.count() === edges1)
    assert(store.read("nodes").get.count() === nodes1)

    // a new seed file continues the crawl from the same state
    Files.writeString(Paths.get(seedDir, "s2.txt"),
      SyntheticWeb.pageUrl(spec, 13L) + "\n" +
        SyntheticWeb.pageUrl(spec, 0L) + "\n") // dup of crawled seed: ignored
    val q3 = CrawlStream.seedDriven(spark, engine, seedDir, ckpt)
    q3.awaitTermination()
    // already-connected graph: page 13 was reachable, so no new nodes,
    // and the duplicate seed adds nothing
    assert(store.read("nodes").get.count() === nodes1)
    assert(store.read("frontier").map(_.count()).getOrElse(0L) === 0L)
  }

  test("recrawl-driven stream: marks refetch exactly once, checkpoint-safe") {
    val spec = SyntheticWeb.Spec("wikipedia", numPages = 25L)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    val root = Files.createTempDirectory("graft-rcs").toString
    val rcDir = Files.createTempDirectory("graft-rc-seeds").toString
    val ckpt = Files.createTempDirectory("graft-rc-ckpt").toString
    val cfg = CrawlConfig(site = "wikipedia", batchSize = 40,
      numShards = 8, bloomItemsPerShard = 4096)
    val engine = new CrawlEngine(spark, new Store(root, spark),
      Sites.wikipedia, cfg, pages)
    engine.seed(Seq(SyntheticWeb.pageUrl(spec, 0L)))
    engine.run()
    val store = engine.store
    def pagesFetched: Long = store.read("metrics").get
      .filter(col("partition_id") === -1)
      .agg(coalesce(sum("pages"), lit(0L))).head().getLong(0)
    val base = pagesFetched
    val edges0 = store.read("edges").get.count()

    // one recrawl file: two crawled urls (one with an explicit tier)
    Files.writeString(Paths.get(rcDir, "r1.txt"),
      SyntheticWeb.pageUrl(spec, 1L) + "\n" +
        SyntheticWeb.pageUrl(spec, 2L) + "\t1\n")
    val q1 = CrawlStream.recrawlDriven(spark, engine, rcDir, ckpt)
    q1.awaitTermination()
    assert(pagesFetched === base + 2) // exactly the marked set refetched
    assert(store.read("edges").get.count() === edges0) // graph unchanged

    // restart with no new files: the checkpoint prevents re-marking
    val q2 = CrawlStream.recrawlDriven(spark, engine, rcDir, ckpt)
    q2.awaitTermination()
    assert(pagesFetched === base + 2)

    // a NEW file for the same url is a new change signal → one more
    Files.writeString(Paths.get(rcDir, "r2.txt"),
      SyntheticWeb.pageUrl(spec, 1L) + "\n")
    val q3 = CrawlStream.recrawlDriven(spark, engine, rcDir, ckpt)
    q3.awaitTermination()
    assert(pagesFetched === base + 3)
  }

  test("keyed-state host budget admits per-host quota across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SeedUrl
    val input = MemoryStream[SeedUrl]
    val admitted = CrawlStream.hostBudgetedStream(input.toDS(), budget = 5L)
    val q = admitted.writeStream.format("memory")
      .queryName("host_budget").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: h0 offers 7 (admit 5), h1 offers 3 (admit 3)
    input.addData((0 until 7).map(i => SeedUrl("h0", f"u$i%02d")) ++
      (0 until 3).map(i => SeedUrl("h1", f"u$i%02d")): _*)
    q.processAllAvailable()
    // batch 2: h0 exhausted (admit 0), h1 has 2 left of 3 offered
    input.addData((7 until 10).map(i => SeedUrl("h0", f"u$i%02d")) ++
      (3 until 6).map(i => SeedUrl("h1", f"u$i%02d")): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("host_budget")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byHost = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // per-host lifetime budget of 5, admitted deterministically in url order
    assert(byHost("h0") === (0 until 5).map(i => f"u$i%02d"))
    assert(byHost("h1") === (0 until 5).map(i => f"u$i%02d"))
  }

  test("windowed event counts with watermark drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = CrawlStream.windowedEventCounts(
      input.toDF().toDF("ts", "event_type"),
      windowLen = "10 minutes", watermark = "10 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    def ts(min: Int) = new Timestamp(3600L * 1000 * 24 + min * 60000L)
    input.addData((ts(1), "fetch"), (ts(2), "fetch"), (ts(3), "parse"))
    q.processAllAvailable()
    // advance event time far enough to close the first window
    input.addData((ts(40), "fetch"))
    q.processAllAvailable()
    // late row for the long-closed first window: dropped by watermark
    input.addData((ts(2), "fetch"))
    q.processAllAvailable()
    input.addData((ts(80), "fetch"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000 % 1440,
        r.getString(1), r.getLong(2))).toSet
    assert(rows.contains((0L, "fetch", 2L))) // late arrival NOT counted
    assert(rows.contains((0L, "parse", 1L)))
  }

  test("streaming near-dup service: within-batch + cross-batch dedup, checkpoint-safe") {
    import org.apache.spark.sql.DataFrame
    import graft.streaming.DedupStream
    val docsDir = Files.createTempDirectory("graft-nd-docs").toString
    val stateDir = Files.createTempDirectory("graft-nd-state").toString
    val ckpt = Files.createTempDirectory("graft-nd-ckpt").toString
    def parse(df: DataFrame) = df.select(
      split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
      split(col("value"), "\t").getItem(1).as("text"))
    val keptIds = collection.mutable.SortedMap[Long, Set[Long]]()
    val sink = (df: DataFrame, id: Long) => {
      keptIds(id) = df.select("doc_id").as[Long].collect().toSet; ()
    }
    def start() = DedupStream.nearDupDriven(
      parse(spark.readStream.text(docsDir)), stateDir, ckpt, sink,
      k = 16, bands = 8, shingleN = 3, threshold = 0.5)
    val base = "the quick brown fox jumps over the lazy dog while the band plays on tonight"
    val mut1 = base.replace("lazy", "sleepy")
    val mut2 = base.replace("band", "crowd")
    val other = "completely different content about rivers and mountains and various other natural things"
    val otherMut = other.replace("rivers", "streams")
    val fresh = "yet another unrelated document with a vocabulary that is entirely its own here"

    // batch 0: base + a mutant of it + an unrelated doc → within-batch
    // near-dup keeps the min-id canonical
    Files.writeString(Paths.get(docsDir, "f1.txt"),
      s"0\t$base\n1\t$mut1\n2\t$other\n")
    val q1 = start(); q1.awaitTermination()
    assert(keptIds.values.flatten.toSet == Set(0L, 2L))

    // restart; batch 1: a NEW mutant of the state's base doc is
    // dropped against the accumulated corpus, a fresh doc survives
    Files.writeString(Paths.get(docsDir, "f2.txt"), s"3\t$mut2\n4\t$fresh\n")
    val q2 = start(); q2.awaitTermination()
    assert(keptIds.values.flatten.toSet == Set(0L, 2L, 4L))

    // restart with nothing new: checkpoint prevents reprocessing
    val q3 = start(); q3.awaitTermination()
    assert(keptIds.values.flatten.toSet == Set(0L, 2L, 4L))

    // batch 2: a near-dup of state doc 2 and an EXACT copy of state
    // doc 4 — both dropped (LSH pass and digest pass respectively)
    Files.writeString(Paths.get(docsDir, "f3.txt"),
      s"5\t$otherMut\n6\t$fresh\n")
    val q4 = start(); q4.awaitTermination()
    assert(keptIds.values.flatten.toSet == Set(0L, 2L, 4L))

    // the committed state is exactly the kept docs
    val corpus = DedupStream.keptCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet
    assert(corpus == Set(0L, 2L, 4L))

    // compaction folds the per-batch partitions into one consolidated
    // partition; the service keeps deduping against it after restart
    DedupStream.compactState(spark, stateDir, upToBatch = 3)
    val afterCompact = DedupStream.keptCorpus(spark, stateDir)
    assert(afterCompact.select("doc_id").as[Long].collect().toSet ==
      Set(0L, 2L, 4L))
    assert(afterCompact.select("batch").distinct().as[Long].collect().toSeq ==
      Seq(-3L), "docs should live in exactly the consolidated partition")
    // idempotent re-run (the crash-recovery path)
    DedupStream.compactState(spark, stateDir, upToBatch = 3)
    assert(DedupStream.keptCorpus(spark, stateDir)
      .select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 4L))
    Files.writeString(Paths.get(docsDir, "f4.txt"),
      s"7\t${base.replace("fox", "wolf")}\n8\tcompletely standalone final text about something else entirely new\n")
    val q5 = start(); q5.awaitTermination()
    assert(keptIds.values.flatten.toSet == Set(0L, 2L, 4L, 8L))
  }

  test("streaming exact dedup: first arrival wins within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = graft.ops.Dedup.dropExactDupsStream(
      input.toDF().toDF("ts", "doc_id", "text"), watermark = "30 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
    // batch 1: A twice (within-batch dup) + B
    input.addData((ts(0), 0L, "alpha text"), (ts(1), 1L, "alpha text"),
      (ts(2), 2L, "beta text"))
    q.processAllAvailable()
    // batch 2: A again inside the horizon (dropped) + new C (kept)
    input.addData((ts(5), 3L, "alpha text"), (ts(6), 4L, "gamma text"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_dedup")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(got == Set((0L, "alpha text"), (2L, "beta text"),
      (4L, "gamma text")), got)
    // no content_key plumbing column leaks into the output schema
    assert(spark.table("stream_dedup").columns.toSeq == Seq("ts", "doc_id", "text"))
  }
}
