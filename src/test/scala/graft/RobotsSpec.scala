package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.CrawlEngine
import graft.model.CrawlConfig
import graft.sites.{Robots, Sites, SyntheticWeb}
import graft.state.Store

class RobotsSpec extends SparkSpec {

  import spark.implicits._

  test("robots.txt parser: * agent sections, comments, other agents") {
    val body =
      """# global rules
        |User-agent: *
        |Disallow: /private/
        |Disallow: /tmp   # trailing comment
        |Allow: /tmp/ok
        |
        |User-agent: special-bot
        |Disallow: /only-for-special
        |
        |User-Agent: *
        |Disallow: /also-blocked
        |Disallow:
        |""".stripMargin
    assert(Robots.parse(body) === Seq("/private/", "/tmp", "/also-blocked"))
    assert(Robots.parse("") === Seq.empty)
    assert(Robots.parse(null) === Seq.empty)
  }

  test("Crawl-delay: * section only, first value wins, garbage ignored") {
    val body =
      """User-agent: special-bot
        |Crawl-delay: 1
        |
        |User-agent: *
        |Disallow: /x
        |Crawl-delay: 2.5   # fractional allowed
        |Crawl-delay: 9
        |""".stripMargin
    assert(Robots.parseCrawlDelay(body) === Some(2.5))
    assert(Robots.parseCrawlDelay("User-agent: *\nCrawl-delay: -3") === None)
    assert(Robots.parseCrawlDelay("User-agent: *\nCrawl-delay: soon") === None)
    assert(Robots.parseCrawlDelay("User-agent: bot\nCrawl-delay: 4") === None)
    assert(Robots.parseCrawlDelay(null) === None)
    // delaysFromPages: robots pages only, null delays dropped
    val pages = Seq(
      ("https://a.test/robots.txt", "User-agent: *\nCrawl-delay: 4".getBytes("UTF-8")),
      ("https://b.test/robots.txt", "User-agent: *\nDisallow: /p".getBytes("UTF-8")),
      ("https://c.test/page", "User-agent: *\nCrawl-delay: 9".getBytes("UTF-8")))
      .toDF("url", "html")
    val got = Robots.delaysFromPages(pages).as[(String, Double)].collect().toMap
    assert(got === Map("a.test" -> 4.0))
  }

  test("filterAllowed drops disallowed (host, path-prefix) rows only") {
    val rows = Seq(
      ("https://a.test/private/x", "a.test"),
      ("https://a.test/public/x", "a.test"),
      ("https://b.test/private/x", "b.test"), // other host: allowed
      ("https://a.test/priv", "a.test")) // shorter than prefix: allowed
      .toDF("url", "host")
    val rules = Seq(("a.test", "/private/")).toDF("host", "disallow")
    val kept = Robots.filterAllowed(rows, rules)
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept === Set("https://a.test/public/x",
      "https://b.test/private/x", "https://a.test/priv"))
  }

  test("word-list seed source: deterministic pick, lowercase, fatal on empty") {
    val f = Files.createTempDirectory("graft-words").resolve("words.txt")
    Files.writeString(f, "Apple\nBanana\n\n  Cherry  \n")
    val words = graft.sites.Seeds.readWordList(spark, f.toString, toLower = true)
    assert(words.collect().map(_.getString(0)).toSet ===
      Set("apple", "banana", "cherry"))
    val p1 = graft.sites.Seeds.pickSeed(words)
    assert(p1 === graft.sites.Seeds.pickSeed(words)) // deterministic
    assert(Set("apple", "banana", "cherry").contains(p1))
    // different salt can move the pick; url assembly uses the profile
    val url = graft.sites.Seeds.seedUrl(Sites.wikipedia, p1)
    assert(url === s"https://en.wikipedia.org/wiki/$p1")
    val empty = Files.createTempDirectory("graft-words2").resolve("e.txt")
    Files.writeString(empty, "\n\n")
    intercept[IllegalArgumentException] {
      graft.sites.Seeds.pickSeed(
        graft.sites.Seeds.readWordList(spark, empty.toString))
    }
  }

  test("engine with robots rules never enqueues disallowed urls") {
    val spec = SyntheticWeb.Spec("web", numPages = 30L, seed = 11L, numHosts = 4)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    // block the /wiki/ path on the hottest host entirely
    val rules = Seq(("h0.web.test", "/wiki/")).toDF("host", "disallow")
    val root = Files.createTempDirectory("graft-robots").toString
    val cfg = CrawlConfig(site = "web", batchSize = 50,
      numShards = 8, bloomItemsPerShard = 4096)
    val eng = new CrawlEngine(spark, new Store(root, spark), Sites.web, cfg,
      pages, robots = Some(rules))
    val seed = (0L until 30L).map(i => SyntheticWeb.pageUrl(spec, i))
      .find(!_.startsWith("https://h0.")).get
    eng.seed(Seq(seed))
    eng.run()
    // robots blocks FETCHING, not naming: disallowed urls may appear
    // as edge targets (the page linked to them) but must never be
    // fetched, i.e. never appear as an edge source. Node names are
    // canonical urls under the web profile.
    val nodes = eng.store.read("nodes").get
    val srcNames = eng.store.read("edges").get
      .join(nodes.withColumnRenamed("name", "src_name")
        .withColumnRenamed("id", "src"), Seq("src"))
      .select("src_name").collect().map(_.getString(0))
    assert(srcNames.nonEmpty)
    assert(!srcNames.exists(_.startsWith("https://h0.web.test/wiki/")),
      "a disallowed url was fetched")
  }

  test("RFC 9309 parse: allow lines, wildcard compile, in-group agent lists") {
    val txt = "User-agent: a\nUser-agent: *\nDisallow: /private\n" +
      "Allow: /private/ok\nDisallow: /*.php$\nAllow:\n" +
      "User-agent: b\nDisallow: /only-for-b\n"
    val rules = Robots.parseRulesRfc(txt)
    // the first group names BOTH a and * (consecutive UA lines); the
    // second group (b) starts fresh and its rules don't apply to *
    assert(rules.map(r => (r.rule, r.allow)) == Seq(
      ("/private", false), ("/private/ok", true), ("/*.php$", false)))
    assert(Robots.ruleToRegex("/*.php$") == "^\\Q/\\E.*\\Q.php\\E$")
    assert(Robots.ruleToRegex("/a.b") == "^\\Q/a.b\\E")
    // the simplified parser's known gap, pinned: it misses the
    // in-group agent list (UA a resets it before UA *)
    assert(Robots.parse("User-agent: *\nUser-agent: a\nDisallow: /x\n").isEmpty)
    assert(Robots.parseRulesRfc("User-agent: *\nUser-agent: a\nDisallow: /x\n")
      .map(_.rule) == Seq("/x"))
  }

  test("filterAllowedRfc: longest match wins, allow wins ties, anchors hold") {
    val robotsTxt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n" +
      "Disallow: /*.php$\nDisallow: /dup\nAllow: /dup\n"
    val robotsPages = Seq(("https://h.test/robots.txt", robotsTxt))
      .toDF("url", "txt")
      .select(col("url"), col("txt").cast("binary").as("html"))
    val rules = Robots.rfcRulesFromPages(robotsPages)
    val urls = Seq(
      "https://h.test/public/a", // no match → keep
      "https://h.test/private/a", // /private → drop
      "https://h.test/private/ok/a", // Allow /private/ok is longer → keep
      "https://h.test/x/page.php", // /*.php$ → drop
      "https://h.test/x/page.phpx", // $ anchors: .phpx is NOT .php → keep
      "https://h.test/dup", // exact-length tie → allow wins → keep
      "https://other.test/private/a") // no rules for this host → keep
      .toDF("url")
      .withColumn("host", graft.functions.canon.host_of(col("url")))
    val kept = Robots.filterAllowedRfc(urls, rules)
      .select("url").as[String].collect().toSet
    assert(kept == Set(
      "https://h.test/public/a",
      "https://h.test/private/ok/a",
      "https://h.test/x/page.phpx",
      "https://h.test/dup",
      "https://other.test/private/a"), kept.toString)
  }
}
