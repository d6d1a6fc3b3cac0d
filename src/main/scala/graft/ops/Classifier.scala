package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — the quality/language-filter
  * model every production curation pipeline trains (CCNet's fastText
  * language filter, RefinedWeb/FineWeb's quality classifiers): a
  * logistic regression over hashed bag-of-n-gram features, trained by
  * full-batch gradient descent as a sequence of Spark aggregations.
  *
  * Everything is DETERMINISTIC and foreign-recomputable: features hash
  * through [[Curation.md5Bucket]] (the DSIR bucket arithmetic DuckDB
  * reproduces bit-identically, collisions included), the gradient is an
  * exact full-batch sum (no SGD sampling order to pin), and the only
  * float policy needed downstream is the repo-wide round-at-the-edge.
  *
  * Scale shape (100 TB corpus): the feature table is built ONCE (one
  * (doc_id, bucket) aggregation; gram strings never shuffle — they
  * collapse to 8-byte bucket ids in the projection right after the
  * explode) and persisted across iterations. Each iteration is then
  * one broadcast of the ≤`buckets`-row weight table onto the feature
  * rows, one (doc_id)-keyed margin aggregation and one (bucket)-keyed
  * gradient aggregation, both map-side combinable with 8-byte keys.
  * Nothing per-iteration scales with anything but the feature-row
  * count, and the model itself never exceeds `buckets` rows.
  */
object Classifier {

  /** (doc_id, bucket, x): per-doc hashed-n-gram features (whitespace
    * unigrams + bigrams), x = bucket occurrence count / total gram
    * count of the doc — the bag-of-grams mean that makes feature
    * vectors sum to 1 per doc (the fastText input layer). Docs with no
    * grams produce no rows.
    */
  def hashedFeatures(docs: DataFrame, text: Column = col("text"),
      buckets: Int = 1 << 18): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
    Curation.gramBuckets(docs, text, buckets)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("bucket"),
        (col("c") / sum(col("c")).over(w)).as("x"))
  }

  /** Full-batch gradient-descent logistic regression (no intercept —
    * the always-on bias can ride a reserved feature if a use case
    * needs it). Returns the weight table (bucket, w), one row per
    * feature bucket that occurs in the corpus.
    *
    * Update rule per iteration, over all labeled docs d and feature
    * buckets b:  w_b ← w_b − (lr/N) · Σ_d (σ(m_d) − y_d) · x_db with
    * m_d = Σ_b x_db·w_b and N = total labeled docs. The first
    * iteration is the closed form at w = 0 (every margin 0, σ = 0.5),
    * saving its broadcast-and-margin pass.
    */
  def trainLogistic(docs: DataFrame, label: Column,
      text: Column = col("text"), buckets: Int = 1 << 18,
      iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val labels = docs.select(col("doc_id"), label.cast("double").as("y"))
    val feats = hashedFeatures(docs, text, buckets)
      .join(labels, Seq("doc_id"))
      .persist()
    val n = labels.count().toDouble
    var weights = feats
      .groupBy(col("bucket"))
      .agg((sum((lit(0.5) - col("y")) * col("x")) * lit(-lr / n)).as("w"))
    for (_ <- 1 until iters) {
      val p = feats.join(broadcast(weights), Seq("bucket"))
        .groupBy(col("doc_id"), col("y"))
        .agg((lit(1.0) / (lit(1.0) + exp(-sum(col("x") * col("w"))))).as("p"))
      val grad = feats.join(p.select(col("doc_id"), col("p")), Seq("doc_id"))
        .groupBy(col("bucket"))
        .agg(sum((col("p") - col("y")) * col("x")).as("g"))
      // every feats bucket has a weight row from iteration 1, so the
      // inner join is total; the tiny weight table re-derives from the
      // persisted feats in ≤2 jobs per downstream action
      weights = weights.join(grad, Seq("bucket"))
        .select(col("bucket"), (col("w") - lit(lr / n) * col("g")).as("w"))
    }
    weights
  }

  /** σ(margin) per doc under a trained weight table. Features absent
    * from `weights` contribute 0 (inner-join semantics); docs with no
    * known feature at all produce no row — route them to a default
    * bucket at the call site if the pipeline needs totality.
    */
  def scoreLogistic(docs: DataFrame, weights: DataFrame,
      text: Column = col("text"), buckets: Int = 1 << 18): DataFrame =
    hashedFeatures(docs, text, buckets)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg((lit(1.0) / (lit(1.0) + exp(-sum(col("x") * col("w"))))).as("prob"))
}
