package graft

import org.apache.spark.sql.functions._

import graft.functions.Extract
import graft.ops.Anchors

/** Anchor-text extraction + per-target rollup semantics. */
class AnchorsSpec extends SparkSpec {

  import spark.implicits._

  test("anchorsOf: nested markup, entities, whitespace, exclusions") {
    val html =
      """<html><body>
        |<a href="/a">plain</a>
        |<a href="/b"> spaced <b>bold &amp; nested</b>
        |   tail </a>
        |<a name="no-href">skip me</a>
        |<a href="/empty"></a>
        |<script><a href="/fake">never</a></script>
        |<!-- <a href="/comment">no</a> -->
        |<a href="/a">plain again</a>
        |</body></html>""".stripMargin.getBytes("UTF-8")
    val got = Extract.anchorsOf(html)
    assert(got === Seq(
      Extract.Anchor("/a", "plain"),
      Extract.Anchor("/b", "spaced bold & nested tail"),
      Extract.Anchor("/empty", ""),
      Extract.Anchor("/a", "plain again")))
  }

  test("anchorsOf is total: null html yields empty, garbage never throws") {
    assert(Extract.anchorsOf(null) === Seq.empty)
    val garbage = Extract.anchorsOf(Array[Byte](-1, -2, 60, 97)) // no throw
    assert(garbage != null)
  }

  private def page(url: String, anchors: (String, String)*) : (String, Array[Byte]) =
    (url, anchors.map { case (h, t) => s"""<a href="$h">$t</a>""" }
      .mkString("<html><body>", "\n", "</body></html>").getBytes("UTF-8"))

  test("anchorTextStats matches a hand-computed rollup, deterministic ties") {
    val pages = Seq(
      page("u1", "/x" -> "alpha", "/x" -> "alpha", "/y" -> "beta"),
      page("u2", "/x" -> "alpha", "/y" -> "gamma"),
      // tie on /y: beta ×2 vs gamma ×2 → top = greatest text = gamma
      page("u3", "/y" -> "beta", "/y" -> "gamma")
    ).toDF("url", "html")
    val got = Anchors.anchorTextStats(pages)
      .as[(String, Long, Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      ("/x", 3L, 2L, 1L, "alpha", 3L),
      ("/y", 4L, 3L, 2L, "gamma", 2L)))
  }

  test("anchorPairs keeps per-occurrence rows with source attribution") {
    val pages = Seq(page("u1", "/x" -> "a", "/x" -> "a")).toDF("url", "html")
    val got = Anchors.anchorPairs(pages)
      .as[(String, String, String)].collect().toSeq
    assert(got === Seq(("u1", "/x", "a"), ("u1", "/x", "a")))
  }

  test("anchorTextStats plan: map-side partial aggs, no window, no sort") {
    val pages = Seq(page("u1", "/x" -> "a")).toDF("url", "html")
    val plan = Anchors.anchorTextStats(pages)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // both rollup stages are HashAggregates with partial_ phases
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_"), plan)
  }
}
