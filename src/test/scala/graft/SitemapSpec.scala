package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sites.Robots
import graft.sources.{Cdx, Sitemaps}

/** Sitemap seed channel (urlset/sitemapindex parse, robots discovery,
  * frontier-priority mapping) + the streaming CDX parse.
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private val golden =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://a.test/full</loc>
      |    <lastmod>2024-03-05T10:20:30Z</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>https://a.test/bare</loc></url>
      |  <url>
      |    <loc>https://a.test/datemod</loc>
      |    <lastmod>2024-02-01</lastmod>
      |  </url>
      |</urlset>""".stripMargin

  test("parseUrlset: full, bare, and date-only entries") {
    val rows = Sitemaps.parseUrlset(Seq(golden).toDF("xml"), col("xml"))
      .orderBy("loc").collect()
    assert(rows.length == 3)
    val bare = rows(0)
    assert(bare.getAs[String]("loc") == "https://a.test/bare")
    assert(bare.isNullAt(bare.fieldIndex("lastmod")))
    assert(bare.isNullAt(bare.fieldIndex("changefreq")))
    assert(bare.getAs[Double]("priority") == 0.5) // spec default
    val dated = rows(1)
    assert(dated.getAs[java.sql.Timestamp]("lastmod").toInstant.toString ==
      "2024-02-01T00:00:00Z")
    val full = rows(2)
    assert(full.getAs[java.sql.Timestamp]("lastmod").toInstant.toString ==
      "2024-03-05T10:20:30Z")
    assert(full.getAs[String]("changefreq") == "daily")
    assert(full.getAs[Double]("priority") == 0.8)
  }

  test("parseIndex: child sitemap locations") {
    val dir = Files.createTempDirectory("graft-sitemaps").toString
    Sitemaps.writeSyntheticSitemaps(dir, nFiles = 3, perFile = 5)
    val idx = spark.read.option("wholetext", true)
      .text(s"$dir/sitemapindex.xml")
    val locs = Sitemaps.parseIndex(idx, col("value"))
      .select("loc").as[String].collect().toSeq.sorted
    assert(locs == (0 until 3).map(g => s"https://h0.test/sitemap-$g.xml"))
  }

  test("synthetic round-trip: parse matches the generator arithmetic") {
    val dir = Files.createTempDirectory("graft-sitemaps2").toString
    Sitemaps.writeSyntheticSitemaps(dir, nFiles = 2, perFile = 10)
    val docs = spark.read.option("wholetext", true)
      .text(s"$dir/sitemap-*.xml")
    val rows = Sitemaps.parseUrlset(docs, col("value"))
    assert(rows.count() == 20)
    val r15 = rows.filter(col("loc") === "https://h1.test/p15").collect().head
    assert(r15.getAs[java.sql.Timestamp]("lastmod").toInstant.toString ==
      "2024-01-01T00:15:00Z")
    assert(r15.isNullAt(r15.fieldIndex("changefreq"))) // 15 % 4 == 3
    assert(r15.getAs[Double]("priority") == 0.4) // (15 % 11) / 10
    val r17 = rows.filter(col("loc") === "https://h3.test/p17").collect().head
    assert(r17.getAs[Double]("priority") == 0.5) // absent when i%10==7
    assert(r17.getAs[String]("changefreq") == "weekly")
  }

  test("toSeeds: sitemap priority maps onto ascending frontier tiers") {
    val parsed = Seq(
      ("https://a.test/hot", 1.0),
      ("https://a.test/mid", 0.5),
      ("https://a.test/cold", 0.0))
      .toDF("loc", "priority")
    val seeds = Sitemaps.toSeeds(parsed).orderBy("priority")
      .as[(String, Long)].collect().toSeq
    assert(seeds == Seq(("https://a.test/hot", 0L),
      ("https://a.test/mid", 5L), ("https://a.test/cold", 10L)))
  }

  test("robots Sitemap: directives are discovered host-by-host") {
    assert(Robots.parseSitemapUrls(
      """User-agent: *
        |Disallow: /private
        |Sitemap: https://a.test/sitemap.xml
        |sitemap: https://a.test/sitemap2.xml  # case-insensitive
        |Sitemap: https://a.test/sitemap.xml
        |""".stripMargin) ==
      Seq("https://a.test/sitemap.xml", "https://a.test/sitemap2.xml"))
    val pages = Seq(
      ("https://a.test/robots.txt",
        "Sitemap: https://a.test/s.xml\nUser-agent: *\nDisallow: /x"),
      ("https://b.test/page", "Sitemap: https://decoy.test/s.xml"))
      .toDF("url", "body")
      .withColumn("html", encode(col("body"), "UTF-8"))
    val got = Robots.sitemapsFromPages(pages)
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("a.test", "https://a.test/s.xml")))
  }

  test("sitemap seeds drive the engine's tiered frontier: hot tiers fetch first") {
    import graft.engine.CrawlEngine
    import graft.model.CrawlConfig
    import graft.sites.{Sites, SyntheticWeb}
    import graft.state.Store

    val spec = SyntheticWeb.Spec("wikipedia", numPages = 30L, seed = 42L)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    val u = (i: Long) => SyntheticWeb.pageUrl(spec, i)
    // a real sitemap over three corpus urls: two hot (priority 1.0 →
    // tier 0), one cold (0.5 → tier 5)
    val xml =
      s"""<urlset>
         |<url><loc>${u(0)}</loc><priority>0.5</priority></url>
         |<url><loc>${u(1)}</loc><priority>1.0</priority></url>
         |<url><loc>${u(2)}</loc><priority>1.0</priority></url>
         |</urlset>""".stripMargin
    val seeds = Sitemaps.toSeeds(
      Sitemaps.parseUrlset(Seq(xml).toDF("xml"), col("xml")))
      .as[(String, Long)].collect().toSeq
    assert(seeds.map(_._2).sorted == Seq(0L, 0L, 5L))

    val root = java.nio.file.Files.createTempDirectory("graft-sm-eng").toString
    // append-path config (no compaction) so the consumed log records
    // exactly what the scheduler took
    val cfg = CrawlConfig(site = "wikipedia", batchSize = 2, numShards = 8,
      bloomItemsPerShard = 1 << 14, compactLogThreshold = 1L << 40)
    val eng = new CrawlEngine(spark, new Store(root, spark),
      Sites.wikipedia, cfg, pages)
    eng.seedPrioritized(seeds)
    eng.step()
    // batch 1 (size 2) must take the two tier-0 urls, not the cold one
    val consumed = eng.store.read("frontier_log").get
      .filter(col("kind") === 0).select("canon").as[String].collect().toSet
    val canonsHot = Seq(u(1), u(2)).toDF("url")
      .select(graft.functions.canon.canonical_url(col("url")))
      .as[String].collect().toSet
    assert(consumed == canonsHot)

    // live enqueue with priorities: dup url keeps its hottest tier
    eng.enqueuePrioritized(Seq((u(5), 7L), (u(5), 1L), (u(6), 3L)))
    val canon5 = Seq(u(5)).toDF("url")
      .select(graft.functions.canon.canonical_url(col("url")))
      .as[String].head()
    val row5 = eng.store.read("frontier").get
      .filter(col("canon") === canon5).select("priority")
      .as[Long].collect().toSeq
    assert(row5 == Seq(1L))
  }

  test("CDX parse works unchanged on a STREAMING lines frame") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val captures = Cdx.parseLines(input.toDF())
    assert(captures.isStreaming)
    val q = captures.writeStream.format("memory")
      .queryName("cdx_stream").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        """test,h0)/p0 20240101000000 {"url": "https://h0.test/p0", """ +
          """"mime": "text/html", "status": "200", "digest": "sha1:G", """ +
          """"length": "10", "offset": "0", "filename": "f.warc.gz"}""",
        "garbage")
      q.processAllAvailable()
      val rows = spark.table("cdx_stream").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("url") == "https://h0.test/p0")
      assert(rows.head.getAs[Long]("http_status") == 200L)
    } finally q.stop()
  }
}
