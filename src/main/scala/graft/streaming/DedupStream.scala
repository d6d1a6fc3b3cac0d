package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** Streaming corpus deduplication services.
  *
  * [[Dedup.dropExactDupsStream]] is the in-query exact twin
  * (`dropDuplicatesWithinWatermark` — state bounded by the watermark
  * horizon). NEAR-dup dedup can't live in the state store the same
  * way: the LSH verify stage needs candidate documents' shingles, and
  * at corpus scale the accumulated signature/text state is a
  * persistent artifact, not executor memory. So the streaming shape
  * here is the repo's micro-batch-service pattern (foreachBatch +
  * checkpoint, like [[CrawlStream.seedDriven]]): per micro-batch,
  * dedup within the batch, then against the accumulated kept corpus,
  * then fold the survivors into the state — the streaming closure of
  * [[Dedup.dropDupsAgainst]]'s incremental contract.
  *
  * The state is three batch-partitioned parquet layouts under
  * `stateDir`: `docs/` (doc_id, text — the verify side), `bands/`
  * (doc_id, band, bucket — the ~20 B/row LSH candidate artifact) and
  * `digests/` (digest — 8-byte exact-dup keys). Each micro-batch's
  * candidate generation and exact pass read ONLY the two small
  * artifacts; corpus TEXT is touched solely for docs that share an
  * LSH bucket with the batch. Without the artifacts every micro-batch
  * would re-shingle and re-hash the whole accumulated corpus —
  * O(corpus) per batch, the exact anti-pattern the engine's two-phase
  * dedup families eliminate.
  */
object DedupStream {

  private def partitionsBelow(spark: SparkSession, root: String,
      batchId: Long): Boolean = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n.startsWith("batch=") &&
        scala.util.Try(n.stripPrefix("batch=").toLong)
          .toOption.exists(_ < batchId)
    }
  }

  private def readBelow(spark: SparkSession, root: String,
      batchId: Long): DataFrame =
    spark.read.option("basePath", root).parquet(root)
      .filter(col("batch") < batchId) // prunes replayed/current dirs

  /** Continuous near-dup dedup service over a streaming `(doc_id,
    * text, …)` source. Each micro-batch:
    *
    *   1. within-batch near-dup keep-pass ([[Dedup.dropNearDups]] —
    *      min-doc_id canonical per verified cluster);
    *   2. incremental pass against every PRIOR batch's kept docs:
    *      exact dups via the persisted digest artifact, near-dups via
    *      [[Dedup.minhashNearDupsAgainstBands]] over the persisted
    *      band-key artifact (batch × corpus only; corpus text read
    *      left-semi-restricted to bucket-sharing candidates);
    *   3. survivors land in `docs/bands/digests` under
    *      `batch=<id>/` partitions and flow to `sink`.
    *
    * Exactly-once state: every per-batch partition directory is
    * OVERWRITTEN on replay (a restarted batch id rewrites its own
    * dirs), and state reads exclude partitions ≥ the current batch
    * id — a half-written replay can never dedup a batch against
    * itself. `sink` gets the standard foreachBatch contract:
    * at-least-once per batch id, so pass an idempotent sink (write
    * keyed by the batch id it receives). Passthrough columns on the
    * stream survive to the sink; `doc_id` must be unique across the
    * stream's lifetime.
    */
  def nearDupDriven(docs: DataFrame, stateDir: String,
      checkpointDir: String, sink: (DataFrame, Long) => Unit,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val within = Dedup.dropNearDups(b, k, bands, shingleN,
              threshold, maxBucket)
            val kept = (if (partitionsBelow(spark, s"$stateDir/docs", batchId)) {
              val corpusDocs = readBelow(spark, s"$stateDir/docs", batchId)
                .select(col("doc_id"), col("text"))
              val corpusBands = readBelow(spark, s"$stateDir/bands", batchId)
                .select(col("doc_id"), col("band"), col("bucket"))
              val corpusDigests = readBelow(spark, s"$stateDir/digests", batchId)
                .select(col("digest")).distinct()
              val nearIds = Dedup.minhashNearDupsAgainstBands(within,
                  corpusBands, corpusDocs, k, bands, shingleN, threshold,
                  maxBucket)
                .select(col("new_id").as("doc_id")).distinct()
              within
                .join(corpusDigests,
                  xxhash64(within("text")) === col("digest"), "left_anti")
                .join(nearIds, Seq("doc_id"), "left_anti")
            } else within).persist()
            try {
              kept.select(col("doc_id"), col("text"))
                .write.mode("overwrite")
                .parquet(s"$stateDir/docs/batch=$batchId")
              Dedup.lshBandKeys(kept.select(col("doc_id"), col("text")),
                  k, bands, shingleN)
                .write.mode("overwrite")
                .parquet(s"$stateDir/bands/batch=$batchId")
              kept.select(xxhash64(col("text")).as("digest"))
                .write.mode("overwrite")
                .parquet(s"$stateDir/digests/batch=$batchId")
              sink(kept, batchId)
            } finally { kept.unpersist(); () }
          }
        } finally { b.unpersist(); () }
        ()
      }
      .start()
  }

  /** Fold every state partition below `upToBatch` into one
    * consolidated partition (id `-upToBatch`, which sorts below every
    * live batch id so service reads keep seeing it) — the LSM-style
    * hygiene pass that keeps the partition count bounded on a
    * long-running service. At-least-once safe: the consolidated
    * partition is renamed into place BEFORE the folded partitions are
    * deleted, and a crash in between leaves duplicates, which are
    * harmless to dedup semantics (the state is a presence set — every
    * consumer dedups ids/digests). Re-running with the same
    * `upToBatch` completes the interrupted cleanup.
    */
  def compactState(spark: SparkSession, stateDir: String,
      upToBatch: Long): Unit = {
    require(upToBatch > 0, "upToBatch must be positive")
    for (sub <- Seq("docs", "bands", "digests")) {
      val rootStr = s"$stateDir/$sub"
      val root = new Path(rootStr)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) {
        def foldable() = fs.listStatus(root).map(_.getPath).filter { p =>
          val n = p.getName
          n.startsWith("batch=") &&
            scala.util.Try(n.stripPrefix("batch=").toLong)
              .toOption.exists(id => id < upToBatch && id != -upToBatch)
        }
        val target = new Path(root, s"batch=${-upToBatch}")
        if (fs.exists(target)) {
          // a previous compaction to this point already renamed its
          // result in; the rest is (re-)deleting subsumed partitions
          foldable().foreach(p => fs.delete(p, true))
        } else if (foldable().length >= 2) {
          val tmp = new Path(root, s"__compact_tmp_$upToBatch")
          spark.read.option("basePath", rootStr).parquet(rootStr)
            .filter(col("batch") < upToBatch)
            .drop("batch")
            .write.mode("overwrite").parquet(tmp.toString)
          if (!fs.rename(tmp, target))
            throw new java.io.IOException(s"compactState: rename failed for $target")
          foldable().foreach(p => fs.delete(p, true))
        }
      }
    }
  }

  /** The accumulated kept corpus a [[nearDupDriven]] service has
    * committed so far — (batch, doc_id, text), the state a downstream
    * pipeline (or the next service incarnation) reads.
    */
  def keptCorpus(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.option("basePath", s"$stateDir/docs")
      .parquet(s"$stateDir/docs")
}
