package graft.sites

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt politeness rules (north_rule: "per-host politeness
  * budgets and robots.txt rules").
  *
  * Simplified-but-standard semantics (public robots exclusion
  * protocol): `Disallow:` path prefixes under `User-agent: *`.
  * Rules live in a `(host, disallow)` table; enforcement is a
  * LEFT ANTI hash join on host with a startsWith residual — scales as
  * an ordinary shuffled equi join at millions-of-hosts corpus size,
  * or a broadcast join when the rule set is small.
  */
object Robots {

  /** parse one robots.txt body: Disallow prefixes for User-agent: * */
  def parse(content: String): Seq[String] = {
    if (content == null) return Seq.empty
    var inStar = false
    val out = Seq.newBuilder[String]
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" => inStar = value == "*"
          case "disallow" if inStar && value.nonEmpty => out += value
          case _ => ()
        }
      }
    }
    out.result().distinct
  }

  private val parseUdf = udf(parse _)

  /** Sitemap locations advertised by robots.txt (`Sitemap:` lines are
    * user-agent-independent per the protocol) — the discovery half of
    * the [[graft.sources.Sitemaps]] seed channel.
    */
  def parseSitemapUrls(content: String): Seq[String] = {
    if (content == null) return Seq.empty
    content.linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(colon + 1).trim).filter(_.nonEmpty)
      else None
    }.toSeq.distinct
  }

  private val parseSitemapUdf = udf(parseSitemapUrls _)

  /** (host, sitemap_url) pairs from the robots.txt pages in the corpus. */
  def sitemapsFromPages(pages: DataFrame): DataFrame = {
    import graft.functions.canon
    pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(canon.host_of(col("url")).as("host"),
        explode(parseSitemapUdf(decode(col("html"), "UTF-8"))).as("sitemap_url"))
  }

  /** Build the rules table from robots.txt pages present in the
    * corpus (url == scheme://host/robots.txt). Output (host, disallow).
    */
  def rulesFromPages(pages: DataFrame): DataFrame = {
    import graft.functions.canon
    pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(canon.host_of(col("url")).as("host"),
        explode(parseUdf(decode(col("html"), "UTF-8"))).as("disallow"))
  }

  /** Crawl-delay (seconds) under `User-agent: *` — the de-facto
    * extension honored by Bing/Yandex crawlers. First valid value
    * wins; non-positive / non-numeric values are ignored.
    */
  def parseCrawlDelay(content: String): Option[Double] = {
    if (content == null) return None
    var inStar = false
    var out: Option[Double] = None
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" => inStar = value == "*"
          case "crawl-delay" if inStar && out.isEmpty =>
            out = scala.util.Try(value.toDouble).toOption
              .filter(d => d > 0 && !d.isInfinite && !d.isNaN)
          case _ => ()
        }
      }
    }
    out
  }

  private val parseDelayUdf = udf(parseCrawlDelay _)

  /** (host, crawl_delay) from the robots.txt pages in the corpus —
    * the politeness-budget companion of [[rulesFromPages]]
    */
  def delaysFromPages(pages: DataFrame): DataFrame = {
    import graft.functions.canon
    pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(canon.host_of(col("url")).as("host"),
        parseDelayUdf(decode(col("html"), "UTF-8")).as("crawl_delay"))
      .filter(col("crawl_delay").isNotNull)
  }

  /** url path component ("" when absent), for prefix matching */
  def pathOf(url: Column): Column =
    regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")

  /** Drop rows whose (host, path) hits a disallow prefix. `df` must
    * carry `host` and `url` columns. Broadcasts the rules when small
    * enough (Catalyst decides via the usual threshold when we hint).
    */
  def filterAllowed(df: DataFrame, rules: DataFrame,
      broadcastRules: Boolean = true): DataFrame = {
    val r = if (broadcastRules) broadcast(rules) else rules
    df.join(r,
      df("host") === r("host") &&
        pathOf(df("url")).startsWith(r("disallow")),
      "left_anti")
  }
}
