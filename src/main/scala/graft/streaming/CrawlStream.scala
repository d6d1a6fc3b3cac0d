package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.engine.CrawlEngine

/** a candidate URL on the streaming ingestion path */
final case class SeedUrl(host: String, url: String)

/** keyed politeness state: per-host lifetime admission count */
final case class HostQuota(used: Long)

/** Structured Streaming surface (SURVEY §2.9).
  *
  * The crawl loop itself is a self-feeding work queue — a driver-side
  * micro-batch loop, not a source-driven stream (the reference's colly
  * queue has the same shape). What IS source-driven:
  *
  *   1. seed ingestion — new seed-list files land in a directory; the
  *      file source + checkpoint gives exactly-once consumption, and
  *      each micro-batch enqueues its new URLs into the live engine
  *      and drives the crawl (`foreachBatch` is the idiomatic bridge
  *      from a stream to arbitrary batch dataflow);
  *   2. monitoring — event-time windowed aggregation with a watermark
  *      over a metrics/event stream.
  */
object CrawlStream {

  /** Continuous crawl service: consume seed files from `seedDir`
    * (one URL per line), enqueue and crawl each micro-batch.
    * `Trigger.AvailableNow` drains what exists and stops — the
    * restartable "catch up then exit" mode; pass a processing-time
    * trigger for an always-on service.
    */
  def seedDriven(spark: SparkSession, engine: CrawlEngine, seedDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val seeds = spark.readStream
      .option("maxFilesPerTrigger", 16)
      .text(seedDir)
    seeds.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // driver-side collect is bounded by maxFilesPerTrigger, but a
        // single pathological seed file could still blow the driver —
        // fail loudly instead of OOMing silently
        val maxSeedsPerBatch = 5000000L
        val urls = batch.select(trim(col("value")).as("url"))
          .filter(col("url") =!= "")
          .limit(maxSeedsPerBatch.toInt + 1)
          .as[String].collect().toSeq
        require(urls.length <= maxSeedsPerBatch,
          s"seed micro-batch exceeds $maxSeedsPerBatch urls; split the seed files")
        if (urls.nonEmpty) {
          engine.enqueue(urls)
          engine.run()
        }
        ()
      }
      .start()
  }

  /** Continuous recrawl service — the streaming consumer of the
    * change-rate channel ([[graft.sources.Cdx.toRecrawlSeeds]] output
    * persisted as text): files of `url<TAB>tier` lines (tier optional,
    * default 0) land in `recrawlDir`; each micro-batch marks the urls
    * as tombstones ([[CrawlEngine.recrawl]] — re-admitted past the
    * seen set exactly once per mark, fingerprints deleted on
    * re-admission) and drives the refetch. The file-source checkpoint
    * makes each mark EVENT exactly-once: a restart never re-marks a
    * consumed file, while a genuinely new file for the same url is a
    * new change signal and correctly refetches again.
    */
  def recrawlDriven(spark: SparkSession, engine: CrawlEngine,
      recrawlDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 16)
      .text(recrawlDir)
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val maxPerBatch = 5000000L
        val rows = batch.select(trim(col("value")).as("line"))
          .filter(col("line") =!= "")
          .limit(maxPerBatch.toInt + 1)
          .as[String].collect().toSeq
        require(rows.length <= maxPerBatch,
          s"recrawl micro-batch exceeds $maxPerBatch urls; split the files")
        val seeds = rows.map { l =>
          val p = l.split("\t", 2)
          (p(0).trim, if (p.length > 1) p(1).trim.toLong else 0L)
        }.filter(_._1.nonEmpty)
        if (seeds.nonEmpty) {
          engine.recrawl(seeds)
          engine.run()
        }
        ()
      }
      .start()
  }

  /** Per-host admission budget over a URL stream — the politeness
    * budget expressed as KEYED STREAMING STATE
    * (`flatMapGroupsWithState`): each host's running admission count
    * lives in the state store, survives restarts via the checkpoint,
    * and updates exactly-once per micro-batch. Hosts are independent
    * state partitions, so the operator scales by host-hash shuffle
    * like every other keyed stage. Within a batch, candidates are
    * admitted in url order for determinism; once a host's lifetime
    * budget is spent, its later urls are dropped forever (the
    * streaming analogue of the engine's per-batch cap).
    */
  def hostBudgetedStream(urls: Dataset[SeedUrl], budget: Long): Dataset[SeedUrl] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.groupByKey(_.host)
      .flatMapGroupsWithState[HostQuota, SeedUrl](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[SeedUrl], state: GroupState[HostQuota]) =>
          val used = state.getOption.map(_.used).getOrElse(0L)
          val room = math.max(0L, budget - used)
          val admit = rows.toSeq.sortBy(_.url)
            .take(math.min(room, Int.MaxValue.toLong).toInt)
          state.update(HostQuota(used + admit.length))
          admit.iterator
      }
  }

  /** Event-time windowed counts with a watermark — the monitoring
    * aggregation over a (ts TIMESTAMP, event_type STRING) stream.
    * Late rows beyond the watermark are dropped; output is append-mode
    * finalized windows.
    */
  def windowedEventCounts(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
}
