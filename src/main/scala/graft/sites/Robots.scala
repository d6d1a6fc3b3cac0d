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

  // ---- RFC 9309 (full Robots Exclusion Protocol) ----

  /** One RFC 9309 rule: `allow` line kind, the raw path pattern, and
    * its precompiled Java regex (`*` → any run, trailing `$` → end
    * anchor, everything else literal).
    */
  final case class RobotRule(rule: String, allow: Boolean, regex: String)

  /** Compile an RFC 9309 path pattern to an anchored-prefix Java
    * regex: `*` matches any octet run, a TRAILING `$` anchors the
    * end, all other characters are literal (`Pattern.quote`d, so
    * dots and braces in real paths can't misfire).
    */
  def ruleToRegex(rule: String): String = {
    val (body, anchored) =
      if (rule.endsWith("$")) (rule.dropRight(1), true) else (rule, false)
    val parts = body.split("\\*", -1).map {
      case "" => ""
      case p => java.util.regex.Pattern.quote(p)
    }
    "^" + parts.mkString(".*") + (if (anchored) "$" else "")
  }

  /** Parse one robots.txt body under the FULL RFC 9309 semantics for
    * the `*` product token: `Allow` and `Disallow` lines, `*`/`$`
    * pattern syntax, and correct GROUP handling — consecutive
    * `User-agent` lines name one group together, so
    * `User-agent: a` / `User-agent: *` / `Disallow: /x` applies to
    * us (the simplified [[parse]] drops in-group agent lists). Empty
    * patterns are ignored per the RFC (an empty `Disallow:` allows
    * everything).
    */
  def parseRulesRfc(content: String): Seq[RobotRule] = {
    if (content == null) return Seq.empty
    var groupHasStar = false
    var lastWasUa = false
    val out = Seq.newBuilder[RobotRule]
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!lastWasUa) groupHasStar = false // a NEW group starts
            if (value == "*") groupHasStar = true
            lastWasUa = true
          case "allow" | "disallow" =>
            lastWasUa = false
            if (groupHasStar && value.nonEmpty)
              out += RobotRule(value, key == "allow", ruleToRegex(value))
          case _ => lastWasUa = false
        }
      }
    }
    out.result().distinct
  }

  private val parseRfcUdf = udf((s: String) =>
    parseRulesRfc(s).map(r => (r.rule, r.allow, r.regex)))

  /** (host, rule, allow, regex) rules table from the robots.txt pages
    * in the corpus — the RFC 9309 companion of [[rulesFromPages]].
    */
  def rfcRulesFromPages(pages: DataFrame): DataFrame = {
    import graft.functions.canon
    pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(canon.host_of(col("url")).as("host"),
        explode(parseRfcUdf(decode(col("html"), "UTF-8"))).as("r"))
      .select(col("host"), col("r._1").as("rule"),
        col("r._2").as("allow"), col("r._3").as("regex"))
  }

  /** RFC 9309 allow/deny filter: per (host, path) the LONGEST
    * matching pattern wins, `Allow` winning exact-length ties, and
    * no match means allowed — the full Robots Exclusion Protocol
    * precedence, not just disallow prefixes.
    *
    * Scale shape: decisions are computed once per DISTINCT
    * (host, path) — a crawl batch re-visits few distinct paths per
    * host — via an equi-join on host against the (broadcastable)
    * rules dimension with a `regexp_like` residual; the winning rule
    * is one `max(struct(pattern_len, allow))` aggregation (struct
    * ordering IS the RFC precedence), and the verdict joins back as
    * a (host, path)-keyed dimension. The corpus rows themselves
    * shuffle only if the verdict join isn't broadcastable.
    */
  def filterAllowedRfc(df: DataFrame, rules: DataFrame,
      broadcastRules: Boolean = true): DataFrame = {
    val prep = rules.select(col("host").as("r_host"), col("regex"),
      length(col("rule")).as("rlen"), col("allow"))
    val r = if (broadcastRules) broadcast(prep) else prep
    val hp = df.select(col("host"), pathOf(col("url")).as("__path")).distinct()
    val denied = hp
      .join(r, col("host") === col("r_host") &&
        regexp_like(col("__path"), col("regex")), "inner")
      .groupBy(col("host"), col("__path"))
      .agg(max(struct(col("rlen"), col("allow"))).as("m"))
      .filter(!col("m.allow"))
      .select(col("host"), col("__path"))
    df.withColumn("__path", pathOf(col("url")))
      .join(denied, Seq("host", "__path"), "left_anti")
      .drop("__path")
  }
}
