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
}
