package graft.sites

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.canon
import graft.html.{Html, Node}

/** A site adapter as *data* — the reference's 4-function interface
  * (crawler/schema.go:9-24) becomes one row of configuration driving a
  * single Spark plan. Injection point mirrors main.go:51-69.
  *
  * @param name        CLI verb name (main.go:77-134)
  * @param base        base endpoint prepended to relative hrefs
  * @param altBase     second base stripped by CleanUrl ("" = none) —
  *                    the synonyms sites upgrade http→https
  *                    (synonyms/synonyms.go:44-46)
  * @param prefix      required link prefix (e.g. "/wiki/")
  * @param pageSelector DOM scope for link extraction ("" = whole page)
  * @param seedEnv     reference env var naming the seed word list
  */
final case class SiteProfile(
    name: String,
    base: String,
    altBase: String,
    prefix: String,
    pageSelector: String,
    seedEnv: String,
    rejectPrefix: String = "", // silent pre-reject (ar_synonyms)
    usesAllowList: Boolean = false) {

  /** CleanUrl for this site (P1-P4) as a codegen'd Column. The `web`
    * bench profile identifies nodes by full canonical URL (north_rule)
    * instead of a stripped title.
    */
  def cleanName(c: Column): Column =
    if (name == "web") canon.canonical_url(c)
    else canon.clean_name(c, base, altBase, prefix)

  /** IsValidCrawlLink (F1-F3) as pure Column algebra; the counties
    * allow-list part (F4) is a broadcast semi-join applied separately
    * because membership is data, not an expression.
    */
  def isValidLink(c: Column): Column = {
    val structural =
      if (name == "us_counties")
        // counties/counties.go:22-28: contains '_county,_' (case-insens.)
        contains(lower(c), lit("_county,_"))
      else if (name == "web")
        // bench profile: absolute multi-host corpus links
        c.startsWith("https://") && !contains(c, lit("#"))
      else
        c.startsWith(prefix) && !contains(c, lit(":")) && !contains(c, lit("#"))
    val notMain =
      if (name == "wikipedia") lower(c) =!= "/wiki/main_page" else lit(true)
    val notReject =
      if (rejectPrefix.nonEmpty) !c.startsWith(rejectPrefix) else lit(true)
    notReject && structural && notMain
  }

  /** identity page filter ⇒ link extraction may use the allocation-
    * light whole-document scanner instead of a DOM build
    */
  def wholePage: Boolean = pageSelector.isEmpty

  /** FilterPage (D1-D4): restrict a parsed DOM to this site's scope. */
  def filterPage(rootSel: Seq[Node]): Seq[Node] = name match {
    case "synonyms" => Html.find(rootSel, ".syns") // synonyms.go:58-61
    case "synonyms-ar" => Html.find(rootSel, ".word-opt") // ar_synonyms.go:62-65
    case "us_counties" =>
      // counties/counties.go:63-72
      Html.not(
        Html.nextUntil(
          Html.parentOf(Html.find(rootSel, "[id^='Adjacent_counties']")),
          "h3"),
        "p")
    case _ => rootSel // wikipedia/wiki.go:78-80 (identity)
  }
}

object Sites {
  val wikipedia: SiteProfile = SiteProfile(
    name = "wikipedia", base = "https://en.wikipedia.org", altBase = "",
    prefix = "/wiki/", pageSelector = "", seedEnv = "")

  val synonyms: SiteProfile = SiteProfile(
    name = "synonyms", base = "http://www.synonyms.com",
    altBase = "https://www.synonyms.com", prefix = "/synonym/",
    pageSelector = ".syns", seedEnv = "ENGLISH_WORD_LIST_PATH")

  val synonymsAr: SiteProfile = SiteProfile(
    name = "synonyms-ar", base = "https://synonyms.reverso.net",
    // ar_synonyms.go:48-50 computes ReplaceAll(base,"http","https") —
    // base is already https so altBase equals base (harmless no-op)
    altBase = "https://synonyms.reverso.net", prefix = "/synonym/ar/",
    pageSelector = ".word-opt", seedEnv = "ARABIC_WORD_LIST_PATH",
    rejectPrefix = "https://context.reverso.net/translation/")

  val usCounties: SiteProfile = SiteProfile(
    name = "us_counties", base = "https://en.wikipedia.org", altBase = "",
    prefix = "/wiki/", pageSelector = "[id^='Adjacent_counties']",
    seedEnv = "COUNTIES_LIST", usesAllowList = true)

  /** Benchmark/scale profile: multi-host absolute URLs over the
    * synthetic Common-Crawl-style corpus (zipfian host skew); names are
    * full canonical URLs rather than stripped titles.
    */
  val web: SiteProfile = SiteProfile(
    name = "web", base = "", altBase = "", prefix = "",
    pageSelector = "", seedEnv = "")

  val all: Map[String, SiteProfile] =
    Seq(wikipedia, synonyms, synonymsAr, usCounties, web).map(p => p.name -> p).toMap

  /** F4/J5: allow-list membership as a broadcast LEFT SEMI join.
    * `links` must expose `href`; allowList has one column `name`
    * (already-lowercased county names, as counties.go:31-46 lowercases
    * both sides). ~3k rows ⇒ always broadcast.
    */
  def allowListSemiJoin(links: DataFrame, allowList: DataFrame, profile: SiteProfile): DataFrame = {
    val keyed = links.withColumn(
      "__allow_key",
      lower(when(col("href").startsWith(profile.prefix),
        expr(s"substring(href, ${profile.prefix.length + 1})")).otherwise(col("href"))))
    keyed
      .join(broadcast(allowList.select(lower(col("name")).as("__allow_key"))),
        Seq("__allow_key"), "left_semi")
      .drop("__allow_key")
  }
}
