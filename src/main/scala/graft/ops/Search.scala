package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance search over the document corpus: BM25 top-k —
  * the retrieval primitive a training-data pipeline uses for targeted
  * corpus slicing (find documents about X) and for building retrieval
  * eval sets. Formula is the standard Okapi/Lucene BM25 (public):
  *
  *   score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
  *                            / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t) = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)
  *
  * Scale shape: the corpus is filtered to query-term hits PER-ROW
  * (`filter(toks, isInCollection)` — codegen, no shuffle) BEFORE
  * anything widens, so every downstream row count is proportional to
  * the number of matches, not the corpus. The only corpus-wide
  * shuffle is the (doc_id, term) tf aggregation with map-side partial
  * combine; df is at most |query| rows (broadcast), the (N, avgdl)
  * corpus stats ride a 1-row broadcast cross join (no driver trip),
  * and the final top-k is a TakeOrderedAndProject (per-partition heap
  * + driver merge of k rows, never a global sort).
  */
object Search {

  /** Top-k documents by BM25 for a bag-of-words query. Output
    * (doc_id, score) with score rounded to 4 dp; ordering and the
    * selected set are deterministic (rounded score desc, doc_id asc).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      text: Column = col("text")): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = TextOps.wsTokens(text)
    val base = docs.select(
      col("doc_id"),
      size(toks).cast("double").as("dl"),
      filter(toks, t => t.isInCollection(queryTerms)).as("hits"))

    // corpus stats: one tiny agg, joined back as a 1-row broadcast
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    // tf per (doc, query term): rows ∝ matches (hits filtered per-row)
    val tf = base
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).cast("double").as("tf"))

    // document frequency: ≤ |queryTerms| rows — always broadcast
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))

    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val termScore = idf * col("tf") * (k1 + 1.0) / norm

    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(termScore), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Materialized inverted index: (term, doc_id, tf, dl) postings —
    * the build-once serving artifact behind [[bm25TopKIndexed]].
    * [[bm25TopK]] re-tokenizes the corpus per query; a deployment
    * that serves many queries builds this ONCE (one corpus scan +
    * one (doc, term) map-side-combined aggregation) and persists it
    * bucketed/partitioned BY TERM, after which a query reads only
    * its own terms' buckets — O(postings of the query terms) per
    * query instead of O(corpus text). Document length rides on every
    * posting (8 extra bytes) so query time needs no doc-length join.
    */
  def buildIndex(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val toks = TextOps.wsTokens(text)
    docs.select(col("doc_id"), size(toks).cast("double").as("dl"),
        explode(toks).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
  }

  /** The index's 1-row corpus-stats artifact (n_docs, avgdl) —
    * computed once at build time next to [[buildIndex]]'s postings
    * (distinct-doc aggregation over the index), persisted with it.
    */
  def indexStats(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))

  /** BM25 top-k over the PRE-BUILT index — same formula, scores and
    * tie-breaks as [[bm25TopK]] (SearchSpec pins bit-equality), but
    * the per-query work is a term-filtered read of the postings
    * artifact: no tokenization, no corpus scan. Under a
    * term-partitioned layout the filter becomes partition pruning.
    */
  def bm25TopKIndexed(postings: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopKIndexed needs at least one query term")
    val tf = postings.filter(col("term").isInCollection(queryTerms))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val termScore = idf * col("tf") * (k1 + 1.0) / norm
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(termScore), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher, SIGIR 2009) of ranked result sets sharing an id
    * space — the standard way to combine a lexical run ([[bm25TopK]])
    * with a dense run ([[Similarity]]'s kNN/ANN ops) without score
    * calibration: rrf(d) = Σ_runs 1/(c + rank_run(d)).
    *
    * Scale shape: the inputs are TOP-K RESULT SETS — bounded by each
    * run's k, not by the corpus — so the per-run rank window runs
    * over ≤ k rows on a single partition BY DESIGN; the corpus-scale
    * work already happened inside the runs (bm25TopK's
    * TakeOrdered, the ANN ops' bucketed joins). Ranks come from
    * (score desc, id asc), so fusion is deterministic whenever the
    * runs are.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, c: Int = 60,
      id: String = "doc_id", score: String = "score"): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(score).desc, col(id).asc)
    runs.map(_.select(col(id).as("doc_id"),
        row_number().over(w).as("rank")))
      .reduce(_ unionAll _)
      .groupBy("doc_id")
      .agg(round(sum(lit(1.0) / (lit(c) + col("rank"))), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }
}
