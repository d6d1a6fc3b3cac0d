package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.html.{Html, Node}

/** Main-content extraction (boilerplate removal) over the library's
  * own DOM engine — the step between "fetched HTML" and every text op
  * in this file's siblings: a training corpus built from raw pages is
  * mostly nav bars, footers, and link farms unless something like this
  * runs first.
  *
  * The algorithm is a deterministic simplification of jusText
  * (Pomikálek 2011, public): the DOM is flattened into paragraphs —
  * maximal text runs between block-level tag boundaries — and each
  * paragraph is kept iff it reads like prose: low link density, enough
  * words, enough stopwords. The full jusText adds a context-smoothing
  * pass over "near-good" paragraphs; this version classifies each
  * paragraph independently so the result is a pure per-block function
  * (trivially foreign-recomputable, which is how the driver oracle
  * pins it).
  *
  * Scale shape: one DOM parse per row inside a Scala UDF (the walk is
  * genuinely imperative — same budget as the engine's Extract path,
  * which already pays one parse per fetched page), zero shuffles; the
  * op streams over a 100 TB page table at parse speed and the output
  * is a per-row projection.
  */
object Boilerplate {

  /** tags that delimit paragraphs (block-level per HTML5 defaults) */
  private val blockTags = Set(
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd", "td", "th", "tr",
    "table", "thead", "tbody", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "article", "section", "header", "footer",
    "nav", "aside", "main", "form", "figure", "figcaption", "br", "hr",
    "body", "html")

  /** subtrees that contribute no prose at all */
  private val skipTags = Set("script", "style", "head", "noscript",
    "template", "title", "svg", "iframe")

  /** one flattened paragraph: normalized text + the raw char counts
    * the density features need
    */
  final case class Paragraph(text: String, chars: Int, linkChars: Int,
      words: Int, stopWords: Int) {
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
    def stopDensity: Double = if (words == 0) 0.0 else stopWords.toDouble / words
  }

  private val enStop: Set[String] = TextOps.stopwords("en").toSet

  /** Flatten a parsed document into paragraphs: DFS, flushing the text
    * buffer at every block-tag boundary; text under `<a>` counts into
    * linkChars. Whitespace inside a paragraph collapses to single
    * spaces; whitespace-only paragraphs vanish.
    */
  def paragraphs(html: String): Seq[Paragraph] = {
    val out = Seq.newBuilder[Paragraph]
    val buf = new StringBuilder
    var linkChars = 0
    def flush(): Unit = {
      val t = buf.toString.trim.replaceAll("\\s+", " ")
      if (t.nonEmpty) {
        val toks = t.split(' ')
        out += Paragraph(t, buf.count(!_.isWhitespace), linkChars,
          toks.length, toks.count(w => enStop(w.toLowerCase)))
      }
      buf.clear()
      linkChars = 0
    }
    def walk(n: Node, inLink: Boolean): Unit = {
      if (n.isText) {
        buf.append(n.text)
        if (inLink) linkChars += n.text.count(!_.isWhitespace)
      } else if (!skipTags.contains(n.tag)) {
        val isBlock = blockTags.contains(n.tag)
        if (isBlock) flush()
        n.children.foreach(walk(_, inLink || n.tag == "a"))
        if (isBlock) flush()
      }
    }
    walk(Html.parse(html), inLink = false)
    flush()
    out.result()
  }

  /** the per-paragraph prose gate (simplified jusText) */
  def isContent(p: Paragraph, maxLinkDensity: Double, minWords: Int,
      minStopDensity: Double): Boolean =
    p.linkDensity <= maxLinkDensity && p.words >= minWords &&
      p.stopDensity >= minStopDensity

  /** (main_text, n_blocks, n_content_blocks) for one page */
  def extractMain(html: String, maxLinkDensity: Double, minWords: Int,
      minStopDensity: Double): (String, Int, Int) = {
    if (html == null) return (null, 0, 0)
    val ps = try paragraphs(html) catch { case _: Exception => Seq.empty }
    val good = ps.filter(isContent(_, maxLinkDensity, minWords, minStopDensity))
    (good.map(_.text).mkString("\n"), ps.length, good.length)
  }

  /** DataFrame op: (doc_id, main_text, n_blocks, n_content_blocks) per
    * page. Defaults follow jusText's spirit (link-farm cut at 1/3,
    * short-block cut, prose needs function words) but are single
    * thresholds, not its two-band classifier.
    */
  def mainContent(df: DataFrame, html: Column = col("html"),
      maxLinkDensity: Double = 0.33, minWords: Int = 10,
      minStopDensity: Double = 0.1): DataFrame = {
    val ex = udf((h: String) =>
      extractMain(h, maxLinkDensity, minWords, minStopDensity))
    df.select(col("doc_id"), ex(html).as("m"))
      .select(col("doc_id"), col("m._1").as("main_text"),
        col("m._2").as("n_blocks"), col("m._3").as("n_content_blocks"))
  }
}
