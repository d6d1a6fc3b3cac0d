package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Cdx

/** CDX capture-index source: CDXJ line parse, SURT key, newest-capture
  * pick, ranged-GET span coalescing, malformed-line tolerance.
  */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def tmpIndex(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-cdx").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "cdx-00000.txt")
    Files.write(f.toPath, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    f.deleteOnExit()
    dir.toString
  }

  test("readCaptures: golden CDXJ line — every field lands typed") {
    val line = """com,example)/path 20240305102030 {"url": "https://www.example.com/path", """ +
      """"mime": "text/html", "status": "200", "digest": "sha1:ABCDEF", """ +
      """"length": "2526", "offset": "887592", "filename": "crawl-data/CC-MAIN/seg/warcs/x.warc.gz"}"""
    val r = Cdx.readCaptures(spark, tmpIndex(Seq(line))).collect().head
    assert(r.getAs[String]("url") == "https://www.example.com/path")
    assert(r.getAs[String]("surt_key") == "com,example)/path")
    assert(r.getAs[java.sql.Timestamp]("capture_ts").toInstant.toString ==
      "2024-03-05T10:20:30Z")
    assert(r.getAs[String]("mime") == "text/html")
    assert(r.getAs[Long]("http_status") == 200L)
    assert(r.getAs[String]("digest") == "sha1:ABCDEF")
    assert(r.getAs[Long]("length") == 2526L)
    assert(r.getAs[Long]("offset") == 887592L)
    assert(r.getAs[String]("filename") == "crawl-data/CC-MAIN/seg/warcs/x.warc.gz")
  }

  test("readCaptures: malformed lines degrade, never fail the read") {
    val good = """test,h0)/p0 20240101000000 {"url": "https://h0.test/p0", """ +
      """"mime": "text/html", "status": "200", "digest": "sha1:G", """ +
      """"length": "10", "offset": "0", "filename": "f.warc.gz"}"""
    val out = Cdx.readCaptures(spark, tmpIndex(Seq(
      good,
      "garbage-no-spaces",
      """k)/x 2024 {"status": "200"}""", // no url → dropped
      // bad numerics + bad ts on a parseable line → NULLs, row kept
      """k)/y NOTATS {"url": "https://h.test/y", "status": "abc", "length": "x", "offset": "y"}"""
    )))
    val rows = out.orderBy("url").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("url") == "https://h.test/y")
    assert(rows(0).isNullAt(rows(0).fieldIndex("capture_ts")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("http_status")))
    assert(rows(1).getAs[String]("url") == "https://h0.test/p0")
    assert(rows(1).getAs[Long]("length") == 10L)
  }

  test("surtKey: goldens (reversed host, www-strip, lowercase, query kept)") {
    val cases = Seq(
      "https://www.Example.COM/A/b?Q=1" -> "com,example)/a/b?q=1",
      "https://h3.test/p17" -> "test,h3)/p17",
      "http://sub.dom.example.org/" -> "org,example,dom,sub)/",
      "https://example.com" -> "com,example)/",
      "https://example.com/x#frag" -> "com,example)/x")
    val got = cases.map(_._1).toDF("url")
      .select(Cdx.surtKey(col("url")).as("k")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("latestCaptures: newest ts wins; ties break by (offset, filename)") {
    val cdx = Seq(
      // url A: three captures, newest ts = 30
      ("https://a.test/1", "2024-01-01 00:00:10", 200L, 5L, 100L, "f1"),
      ("https://a.test/1", "2024-01-01 00:00:30", 404L, 6L, 200L, "f2"),
      ("https://a.test/1", "2024-01-01 00:00:20", 200L, 7L, 300L, "f1"),
      // url B: ts tie → larger offset wins
      ("https://b.test/2", "2024-01-01 00:01:00", 200L, 8L, 10L, "f1"),
      ("https://b.test/2", "2024-01-01 00:01:00", 200L, 9L, 50L, "f1"))
      .toDF("url", "ts", "http_status", "length", "offset", "filename")
      .withColumn("capture_ts", to_timestamp(col("ts"))).drop("ts")
      .withColumn("surt_key", lit("k"))
      .withColumn("mime", lit("text/html"))
      .withColumn("digest", lit("d"))
    val got = Cdx.latestCaptures(cdx).orderBy("url").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("http_status") == 404L)
    assert(got(0).getAs[Long]("offset") == 200L)
    assert(got(1).getAs[Long]("offset") == 50L)
  }

  test("fetchPlan: adjacent records coalesce; gaps and file boundaries split") {
    val caps = Seq(
      // f1: [0,100) [100,50) adjacent → one span [0,150);
      //     [200,10) gap → own span
      ("f1", 0L, 100L), ("f1", 100L, 50L), ("f1", 200L, 10L),
      // f2: same offsets as f1's head but a different file → separate span
      ("f2", 0L, 20L))
      .toDF("filename", "offset", "length")
    val got = Cdx.fetchPlan(caps)
      .orderBy("filename", "span_start")
      .select("filename", "span_start", "span_bytes", "n_records")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("f1", 0L, 150L, 2L), ("f1", 200L, 10L, 1L), ("f2", 0L, 20L, 1L)))
  }

  test("fetchPlan read-through: gapTolerance fuses nearby spans, gap bytes included") {
    val caps = Seq(("f1", 0L, 100L), ("f1", 150L, 50L), ("f1", 1000L, 10L))
      .toDF("filename", "offset", "length")
    val strict = Cdx.fetchPlan(caps)
      .select("span_start", "span_bytes", "n_records")
      .as[(Long, Long, Long)].collect().toSet
    assert(strict == Set((0L, 100L, 1L), (150L, 50L, 1L), (1000L, 10L, 1L)))
    val loose = Cdx.fetchPlan(caps, gapTolerance = 64L)
      .select("span_start", "span_bytes", "n_records")
      .as[(Long, Long, Long)].collect().toSet
    // the 50-byte gap fuses (span covers it); the 800-byte gap doesn't
    assert(loose == Set((0L, 200L, 2L), (1000L, 10L, 1L)))
  }

  test("changeStats + toRecrawlSeeds: digest diffs over capture history") {
    val cdx = Seq(
      // url A: 3 captures — d1, d1 (+10 min), d2 (+30 min): 1 change
      // over 2 intervals, gaps 10 and 20 → rate 0.5, avg gap 15
      ("https://a.test/1", "2024-01-01 00:00:00", 0L, "f1", "d1"),
      ("https://a.test/1", "2024-01-01 00:10:00", 10L, "f1", "d1"),
      ("https://a.test/1", "2024-01-01 00:30:00", 20L, "f1", "d2"),
      // url B: single capture → rate/gap NULL
      ("https://b.test/2", "2024-01-01 00:00:00", 0L, "f1", "d9"))
      .toDF("url", "ts", "offset", "filename", "digest")
      .withColumn("capture_ts", to_timestamp(col("ts"))).drop("ts")
    val stats = Cdx.changeStats(cdx).orderBy("url").collect()
    assert(stats.length == 2)
    val a = stats(0)
    assert(a.getAs[Long]("n_captures") == 3L)
    assert(a.getAs[Long]("n_changes") == 1L)
    assert(a.getAs[Double]("change_rate") == 0.5)
    assert(a.getAs[Double]("avg_gap_min") == 15.0)
    val b = stats(1)
    assert(b.getAs[Long]("n_captures") == 1L)
    assert(b.getAs[Long]("n_changes") == 0L)
    assert(b.isNullAt(b.fieldIndex("change_rate")))
    assert(b.isNullAt(b.fieldIndex("avg_gap_min")))
    // recrawl seeds: B (never revisited) excluded; A lands mid-tier
    val seeds = Cdx.toRecrawlSeeds(Cdx.changeStats(cdx))
      .as[(String, Long)].collect().toSeq
    assert(seeds == Seq(("https://a.test/1", 5L)))
  }

  test("surtOf (write-time scala mirror) ≡ surtKey (Column) on the goldens") {
    val urls = Seq(
      "https://www.Example.COM/A/b?Q=1",
      "https://h3.test/p17",
      "http://sub.dom.example.org/",
      "https://example.com",
      "https://example.com/x#frag",
      "https://example.com?a=1", // query-only: host ends at '?'
      "https://example.com:8080/y")
    val viaColumn = urls.toDF("url")
      .select(Cdx.surtKey(col("url"))).as[String].collect().toSeq
    assert(urls.map(Cdx.surtOf) == viaColumn)
  }

  test("index-then-ranged-fetch loop: spans decode to exactly the selected records, reading a fraction of the bytes") {
    val dir = Files.createTempDirectory("graft-warc-cdx").toString
    graft.sources.Warc.writeSyntheticIndexedArchive(dir, nFiles = 2, perFile = 20)
    val caps = Cdx.readCaptures(spark, s"$dir/cdx")
    assert(caps.count() == 40L)
    // write-time index locates what the full parse finds (urls agree)
    val fullUrls = graft.sources.Warc.readRecords(spark, dir).toDF()
      .filter(col("record_type") === "response")
      .select("url").as[String].collect().toSet
    assert(caps.select("url").as[String].collect().toSet == fullUrls)

    val plan = Cdx.fetchPlan(caps.filter(col("http_status") === 200))
    val ranged = graft.sources.Warc.readRecordsRanged(spark, dir, plan)
      .toDF().select("url", "http_status").as[(String, Long)].collect().toSet
    val expected = graft.sources.Warc.readRecords(spark, dir).toDF()
      .filter(col("record_type") === "response" && col("http_status") === 200)
      .select("url", "http_status").as[(String, Long)].collect().toSet
    assert(ranged == expected)
    assert(ranged.size == 36) // 40 records minus the 4 with i%10==9

    // the pruning is real: planned bytes < archive bytes (404 members
    // and warcinfo heads are never read)
    val plannedBytes = plan.agg(sum("span_bytes")).as[Long].head()
    val archiveBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.length()).sum
    assert(plannedBytes < archiveBytes, s"$plannedBytes vs $archiveBytes")
  }

  test("ranged decode works on PLAIN archives too (byte-exact record offsets)") {
    val dir = Files.createTempDirectory("graft-warc-plain").toString
    val recs = (0 until 5).map { i =>
      graft.sources.Warc.ResponseOut(s"https://p.test/$i",
        "2024-02-02T00:00:00Z", "200 OK", s"<html>doc $i</html>")
    }
    val entries = graft.sources.Warc.writeWarcFileIndexed(
      java.nio.file.Paths.get(dir, "a.warc"), "software: t", recs,
      memberGzip = false)
    // fetch just records 1 and 3 via their write-time offsets
    val plan = Seq(
      ("a.warc", entries(1).offset, entries(1).length),
      ("a.warc", entries(3).offset, entries(3).length))
      .toDF("filename", "span_start", "span_bytes")
    val got = graft.sources.Warc.readRecordsRanged(spark, dir, plan)
      .toDF().select("url").as[String].collect().toSet
    assert(got == Set("https://p.test/1", "https://p.test/3"))
  }

  test("synthetic index round-trip: parse-side arithmetic matches the generator") {
    val dir = Files.createTempDirectory("graft-cdx-synth").toString
    Cdx.writeSyntheticIndex(dir, nFiles = 2, perFile = 20) // N=40, U=20
    val caps = Cdx.readCaptures(spark, dir)
    assert(caps.count() == 40L)
    // every url captured exactly twice; latest pick = capture i = u+20
    val latest = Cdx.latestCaptures(caps)
    assert(latest.count() == 20L)
    val r = latest.filter(col("url") === "https://h0.test/p7").collect().head
    // i = 27 → file g=1 (records 20..39), ts = +27 min, len = 500+3*27
    assert(r.getAs[Long]("length") == 581L)
    assert(r.getAs[String]("filename") == "crawl-data/part-1.warc.gz")
    assert(r.getAs[java.sql.Timestamp]("capture_ts").toInstant.toString ==
      "2024-01-01T00:27:00Z")
    // offset = sum of len(i') for i' in [20, 27) = Σ 500+3*(i'%100)
    val expOff = (20 until 27).map(i => 500L + 3L * (i % 100)).sum
    assert(r.getAs[Long]("offset") == expOff)
    // surt key parses back to the url's own
    assert(r.getAs[String]("surt_key") ==
      Seq("https://h0.test/p7").toDF("u")
        .select(Cdx.surtKey(col("u"))).as[String].head())
  }
}
