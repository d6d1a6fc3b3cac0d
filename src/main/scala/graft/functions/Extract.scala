package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.html.Html
import graft.sites.{SiteProfile, Sites}

/** Extraction result per page (SURVEY G1/D1-D5): the filtered scope's
  * text (byte-identical invariant target), hrefs in document order,
  * and a non-null err when page filtering failed — the engine logs the
  * error but still processes the partial result
  * (crawler/crawler.go:84-87).
  */
final case class Extracted(text: String, links: Seq[String], err: String)

object Extract {

  /** One parse per page: filter scope + links + text in a single pass. */
  def extractPage(html: Array[Byte], siteName: String): Extracted = {
    if (html == null) return Extracted(null, Seq.empty, "null html")
    val profile = Sites.all.getOrElse(siteName, Sites.wikipedia)
    try {
      val doc = Html.parse(Html.decodeBytes(html))
      val scope = profile.filterPage(Seq(doc))
      Extracted(Html.textOf(scope), Html.links(scope), null)
    } catch {
      case e: Exception =>
        // D5: tolerated — engine records the error, keeps partial output
        Extracted("", Seq.empty, s"filter error: ${e.getMessage}")
    }
  }

  /** `extract_page(html, site)` → STRUCT<text, links ARRAY<STRING>, err> */
  val extractPageUdf = udf(extractPage _)

  def extract_page(html: Column, site: Column): Column = extractPageUdf(html, site)

  /** links + err only — skips the (expensive) whole-scope text concat;
    * the hot path for the crawl loop, which never re-derives `text`.
    */
  final case class LinksOnly(links: Seq[String], err: String)

  /** UTF-16 BOM ⇒ the raw-byte scan would see NUL-interleaved ASCII
    * and find no hrefs; such (rare) captures take the decode+DOM path.
    */
  private def utf16Bom(b: Array[Byte]): Boolean =
    b.length >= 2 &&
      ((b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ||
       (b(0) == 0xFF.toByte && b(1) == 0xFE.toByte))

  def extractLinksOnly(html: Array[Byte], siteName: String): LinksOnly = {
    if (html == null) return LinksOnly(Seq.empty, "null html")
    val profile = Sites.all.getOrElse(siteName, Sites.wikipedia)
    try {
      if (profile.wholePage && !utf16Bom(html))
        // identity page filter ⇒ byte-level scan: no document decode,
        // no DOM build — only hrefs ever become Strings
        LinksOnly(Html.scanLinksBytes(html), null)
      else {
        val doc = Html.parse(Html.decodeBytes(html))
        LinksOnly(Html.links(profile.filterPage(Seq(doc))), null)
      }
    } catch {
      case e: Exception => LinksOnly(Seq.empty, s"filter error: ${e.getMessage}")
    }
  }

  val extractLinksUdf = udf(extractLinksOnly _)

  def extract_links(html: Column, site: Column): Column = extractLinksUdf(html, site)

  /** Standalone link list (tests / ops that don't need text). */
  def links(html: Array[Byte], siteName: String): Seq[String] =
    extractPage(html, siteName).links

  /** Whole-document text irrespective of profile (for corpus `text`).
    * Bytes decode through [[Html.decodeBytes]] — BOM / `<meta
    * charset>` sniffing with U+FFFD-replacement fallback — so
    * non-UTF-8 captures (a few percent of any real crawl) extract
    * correctly instead of as mojibake.
    */
  def fullText(html: Array[Byte]): String =
    Html.parse(Html.decodeBytes(html)).textContent

  /** Whole-document (href, normalized anchor text) pairs in document
    * order — the raw material of anchor-text aggregation
    * ([[graft.ops.Anchors]]). Malformed pages yield the pairs the
    * parser can recover (tolerant, like every extract here).
    */
  final case class Anchor(href: String, text: String)

  def anchorsOf(html: Array[Byte]): Seq[Anchor] = {
    if (html == null) return Seq.empty
    try Html.anchors(Seq(Html.parse(Html.decodeBytes(html))))
      .map { case (h, t) => Anchor(h, t) }
    catch { case _: Exception => Seq.empty }
  }

  val anchorsUdf = udf(anchorsOf _)

  /** `extract_anchors(html)` → ARRAY<STRUCT<href, text>> */
  def extract_anchors(html: Column): Column = anchorsUdf(html)
}
