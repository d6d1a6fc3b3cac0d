package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
  * dedup within the batch, then against the accumulated kept-corpus
  * state, then fold the survivors into the state — the streaming
  * closure of [[Dedup.dropDupsAgainst]]'s incremental contract.
  */
object DedupStream {

  /** Continuous near-dup dedup service over a streaming `(doc_id,
    * text, …)` source. Each micro-batch:
    *
    *   1. within-batch near-dup keep-pass ([[Dedup.dropNearDups]] —
    *      min-doc_id canonical per verified cluster);
    *   2. incremental pass against every PRIOR batch's kept docs
    *      ([[Dedup.dropDupsAgainst]] — exact digests + LSH-candidate
    *      + exact-Jaccard verify, new × corpus only);
    *   3. survivors land in the state layout
    *      `stateDir/docs/batch=<id>/` and flow to `sink`.
    *
    * Exactly-once state: the per-batch partition directory is
    * OVERWRITTEN on replay (a restarted batch id rewrites its own
    * dir), and the corpus read excludes partitions ≥ the current
    * batch id — a half-written replay can never dedup a batch
    * against itself. `sink` gets the standard foreachBatch contract:
    * at-least-once per batch id, so pass an idempotent sink (write
    * keyed by the batch id it receives).
    *
    * Scale shape: batch × corpus only, never corpus × corpus; the
    * corpus side of the candidate join is its (band, bucket) keys
    * (8-byte rows), and corpus TEXT is read only for docs that share
    * a bucket with the batch (left-semi restricted). Passthrough
    * columns on the stream survive to the sink; `doc_id` must be
    * unique across the stream's lifetime.
    */
  def nearDupDriven(docs: DataFrame, stateDir: String,
      checkpointDir: String, sink: (DataFrame, Long) => Unit,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val corpusPath = s"$stateDir/docs"
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
            val root = new Path(corpusPath)
            val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val priorBatches = fs.exists(root) &&
              fs.listStatus(root).exists { st =>
                val n = st.getPath.getName
                n.startsWith("batch=") &&
                  scala.util.Try(n.stripPrefix("batch=").toLong)
                    .toOption.exists(_ < batchId)
              }
            val kept = (if (priorBatches) {
              val corpus = spark.read.option("basePath", corpusPath)
                .parquet(corpusPath)
                .filter(col("batch") < batchId) // prune replayed/current dirs
                .select(col("doc_id"), col("text"))
              Dedup.dropDupsAgainst(within, corpus, k, bands, shingleN,
                threshold, maxBucket)
            } else within).persist()
            try {
              kept.select(col("doc_id"), col("text"))
                .write.mode("overwrite")
                .parquet(s"$corpusPath/batch=$batchId")
              sink(kept, batchId)
            } finally { kept.unpersist(); () }
          }
        } finally { b.unpersist(); () }
        ()
      }
      .start()
  }

  /** The accumulated kept corpus a [[nearDupDriven]] service has
    * committed so far — (batch, doc_id, text), the state a downstream
    * pipeline (or the next service incarnation) reads.
    */
  def keptCorpus(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.option("basePath", s"$stateDir/docs")
      .parquet(s"$stateDir/docs")
}
