package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC source: byte-level record walk (plain + gzip, multi-member),
  * HTTP split, malformed-tail tolerance, pages-table projection.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(url: String, date: String, body: String,
      status: String = "200 OK", rtype: String = "response"): Array[Byte] = {
    val http = s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body"
    val block = if (rtype == "response") http else body
    val head = Seq(
      "WARC/1.0",
      s"WARC-Type: $rtype",
      s"WARC-Target-URI: $url",
      s"WARC-Date: $date",
      s"Content-Length: ${block.getBytes(UTF_8).length}").mkString("\r\n")
    (head + "\r\n\r\n" + block + "\r\n\r\n").getBytes(UTF_8)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  test("parseWarcBytes: plain records — urls, timestamps, status, body") {
    val bytes = record("https://a.test/x", "2024-03-05T10:20:30Z",
      "<html><a href=\"/y\">y</a></html>") ++
      record("https://a.test/z", "2024-03-05T10:21:30Z", "<html>none</html>",
        status = "404 Not Found")
    val rs = Warc.parseWarcBytes(bytes)
    assert(rs.map(_.url) == Seq("https://a.test/x", "https://a.test/z"))
    assert(rs.map(_.http_status) == Seq(200, 404))
    assert(rs.head.warc_ts.toInstant.toString == "2024-03-05T10:20:30Z")
    assert(new String(rs.head.html, UTF_8) == "<html><a href=\"/y\">y</a></html>")
  }

  test("parseWarcBytes: gzip — single member AND record-per-member concatenation") {
    val r1 = record("https://g.test/1", "2024-01-01T00:00:00Z", "<html>1</html>")
    val r2 = record("https://g.test/2", "2024-01-01T00:01:00Z", "<html>2</html>")
    // single member over both records
    val single = Warc.parseWarcBytes(gz(r1 ++ r2))
    assert(single.map(_.url) == Seq("https://g.test/1", "https://g.test/2"))
    // Common-Crawl layout: one gzip member PER record, concatenated
    val multi = Warc.parseWarcBytes(gz(r1) ++ gz(r2))
    assert(multi.map(_.url) == Seq("https://g.test/1", "https://g.test/2"))
  }

  test("parseWarcBytes: malformed tails keep the parsed prefix") {
    val good = record("https://t.test/ok", "2024-01-01T00:00:00Z", "<html>ok</html>")
    // truncated second record (body shorter than Content-Length)
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://t.test/cut\r\nContent-Length: 9999\r\n\r\nshort")
      .getBytes(UTF_8)
    val rs = Warc.parseWarcBytes(good ++ bad)
    assert(rs.map(_.url) == Seq("https://t.test/ok"))
    // missing Content-Length is a structural break too
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody").getBytes(UTF_8)
    assert(Warc.parseWarcBytes(good ++ noLen).map(_.url) ==
      Seq("https://t.test/ok"))
    // non-HTTP payload block: kept whole, status 0
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://t.test/raw\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes(UTF_8)
    val rr = Warc.parseWarcBytes(raw)
    assert(rr.head.http_status == 0 && new String(rr.head.html, UTF_8) == "hello")
  }

  test("synthetic archive round-trip: every arithmetic field, both codecs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    Warc.writeSyntheticArchive(dir, nFiles = 4, perFile = 25)
    val rs = Warc.readRecords(spark, dir).collect()
    val info = rs.filter(_.record_type == "warcinfo")
    assert(info.length == 4) // one per file, plain and gzip alike
    val resp = rs.filter(_.record_type == "response")
    assert(resp.length == 100)
    val byUrl = resp.map(r => r.url -> r).toMap
    for (i <- 0 until 100) {
      val r = byUrl(s"https://h${i % 7}.test/p$i")
      assert(r.http_status == (if (i % 10 == 9) 404 else 200), s"rec $i")
      assert(r.warc_ts.toInstant.toString ==
        f"2024-01-01T${i / 60}%02d:${i % 60}%02d:00Z", s"rec $i")
      val links = graft.functions.Extract.links(r.html, "web")
      assert(links.length == 1 + i % 5, s"rec $i")
      assert(links.head == s"/p${i + 1}", s"rec $i")
    }
  }

  test("toPages: input_hint shape, 200-only, warcinfo dropped, text extracted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-p").toString
    Warc.writeSyntheticArchive(dir, nFiles = 2, perFile = 20)
    val pages = Warc.read(spark, dir)
    assert(pages.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = pages.select("url", "text", "lang").collect()
    assert(rows.length == 36) // 40 responses minus 4 i%10==9 404s
    assert(rows.forall(_.getString(1).contains("doc ")))
    assert(rows.forall(r => r.getString(2) != null && r.getString(2).nonEmpty))
    // whole-doc text carries body text and link anchors
    val p0 = pages.filter(col("url") === "https://h0.test/p0")
      .select("text").as[String].head()
    assert(p0.contains("doc 0") && p0.contains("l0"), p0)
  }

  test("dedup archive: one response per payload, spec-shaped revisits, exact resolve") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_dedup").toString
    // 60 pages, 9 distinct payloads
    val pages = spark.range(60).select(
      concat(lit("https://h"), pmod(col("id"), lit(4)).cast("string"),
        lit(".test/p"), col("id").cast("string")).as("url"),
      concat(lit("<html><body>pay-"), pmod(col("id"), lit(9)).cast("string"),
        lit("</body></html>")).cast("binary").as("html"))
    graft.sources.Warc.writeDedupArchive(pages, dir, 3)

    val recs = graft.sources.Warc.readRecords(spark, dir).collect()
    val resp = recs.filter(_.record_type == "response")
    val revs = recs.filter(_.record_type == "revisit")
    assert(resp.length == 9, s"full responses: ${resp.length}")
    assert(revs.length == 51, s"revisits: ${revs.length}")
    // every revisit points at the minimum url of its payload group and
    // carries the referent's sha1
    val byUrl = resp.map(r => r.url -> r).toMap
    revs.foreach { r =>
      assert(r.refers_to != null && byUrl.contains(r.refers_to), r.url)
      assert(r.html.isEmpty, "revisit stubs carry no payload")
    }
    // resolve reconstructs the original pages bit-for-bit
    val resolved = graft.sources.Warc.resolveRevisits(
        graft.sources.Warc.readRecords(spark, dir))
      .select(col("url"), decode(col("html"), "UTF-8").as("payload"))
      .as[(String, String)].collect().toMap
    val want = (0 until 60).map(i =>
      s"https://h${i % 4}.test/p$i" ->
        s"<html><body>pay-${i % 9}</body></html>").toMap
    assert(resolved == want)
  }

  test("WET text sidecar: conversion records round-trip UTF-8 text exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet").toString
    val pages = Seq(
      ("https://a.test/1", "plain ascii"),
      ("https://a.test/2", "naïve café — § ünïcode"),
      ("https://b.test/3", "multi\nline\ttext")).toDF("url", "text")
    graft.sources.Warc.writeTextArchive(pages, dir, 2)
    val got = graft.sources.Warc.readText(spark, dir)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "https://a.test/1" -> "plain ascii",
      "https://a.test/2" -> "naïve café — § ünïcode",
      "https://b.test/3" -> "multi\nline\ttext"), got.toString)
    // the records really are WARC conversion records, not responses
    val types = graft.sources.Warc.readRecords(spark, dir)
      .collect().map(_.record_type).toSet
    assert(types == Set("warcinfo", "conversion"), types.toString)
  }

  test("mergeSnapshots: canonical-url latest-wins, deterministic sha1 tie-break") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val rows = Seq(
      ("https://a.test/p?x=1&y=2", t1, "old"),
      ("HTTPS://A.test:443/p?y=2&x=1", t2, "new"), // same canonical, later wins
      ("https://b.test/q", t1, "tieA"),
      ("https://b.test/q", t1, "tieB"), // equal ts: larger payload sha1 wins
      ("https://c.test/r", t1, "only"))
      .toDF("url", "warc_ts", "payload")
      .select(col("url"), col("warc_ts"),
        col("payload").cast("binary").as("html"))
    val got = graft.sources.Warc.mergeSnapshots(rows)
      .select(col("url"), decode(col("html"), "UTF-8").as("p"))
      .as[(String, String)].collect().toMap
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tieWinner = if (sha("tieA") > sha("tieB")) "tieA" else "tieB"
    assert(got == Map(
      "HTTPS://A.test:443/p?y=2&x=1" -> "new",
      "https://b.test/q" -> tieWinner,
      "https://c.test/r" -> "only"), got.toString)
  }
}
