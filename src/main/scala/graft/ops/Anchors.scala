package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Extract

/** Anchor-text aggregation — the classic web-graph quality signal a
  * training-data pipeline derives from a crawled corpus (anchor text
  * is the web's own human-written description of a target page;
  * search engines and LLM data pipelines both rank/label targets by
  * it). The reference crawler stores only the edge; these ops keep the
  * edge's TEXT and roll it up per target.
  *
  * Scale shape (100 TB lens): extraction is per-row (one DOM parse the
  * corpus build already pays — no shuffle); the rollup's first
  * aggregation keys on (href, text) with map-side combine, so what
  * shuffles is bounded by the DISTINCT pairs, not the corpus; the
  * second is a struct-max over href (again map-side combinable). No
  * window, no global sort, nothing scales with pages × anchors.
  */
object Anchors {

  /** Exploded (src_url, href, text) — one row per anchor occurrence,
    * document order lost by design (the rollups don't need it).
    */
  def anchorPairs(pages: DataFrame, url: Column = col("url"),
      html: Column = col("html")): DataFrame =
    pages
      .select(url.as("src_url"), explode(Extract.extract_anchors(html)).as("a"))
      .select(col("src_url"), col("a.href").as("href"), col("a.text").as("text"))

  /** Per-target anchor rollup: reference count, distinct source pages,
    * distinct texts, and the dominant anchor text (highest occurrence
    * count; ties broken by the lexicographically GREATEST text — the
    * struct-max order, deterministic and foreign-recomputable).
    * Returns (href, n_refs, n_srcs, n_texts, top_text, top_cnt).
    */
  def anchorTextStats(pages: DataFrame, url: Column = col("url"),
      html: Column = col("html")): DataFrame = {
    val pairs = anchorPairs(pages, url, html)
    val byText = pairs.groupBy(col("href"), col("text"))
      .agg(count(lit(1)).as("cnt"))
    val srcs = pairs.select(col("href"), col("src_url")).distinct()
      .groupBy(col("href")).agg(count(lit(1)).as("n_srcs"))
    byText.groupBy(col("href")).agg(
      sum(col("cnt")).as("n_refs"),
      count(lit(1)).as("n_texts"),
      max(struct(col("cnt"), col("text"))).as("m"))
      .join(srcs, Seq("href"))
      .select(col("href"), col("n_refs"), col("n_srcs"), col("n_texts"),
        col("m.text").as("top_text"), col("m.cnt").as("top_cnt"))
  }
}
