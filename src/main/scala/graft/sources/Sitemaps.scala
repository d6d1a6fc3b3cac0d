package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap source (sitemaps.org XML protocol — the crawl-seed channel
  * robots.txt advertises via `Sitemap:` lines; the reference's seed
  * sources S7/S8 are its ad-hoc cousins).
  *
  * A urlset document carries one `<url>` entry per page with optional
  * `<lastmod>`, `<changefreq>`, `<priority>`; a sitemapindex document
  * lists child sitemap locations. Parsing is pure Column algebra —
  * split on the closing entry tag, regexp-extract each field, try_*
  * casts — so it whole-stage-codegens and one malformed entry degrades
  * to NULLs instead of failing a fleet-wide ingest. (The subset
  * handled is the standard schema's plain-text values; CDATA and
  * exotic namespaces are out of scope and documented so.)
  *
  * Scale shape: sitemap XML is one document per row (a fetched page
  * body), so everything here is per-row and shuffle-free; a host's
  * 50k-entry sitemap explodes into 50k rows inside its partition.
  */
object Sitemaps {

  private def tagText(entry: Column, tag: String): Column =
    nullif(regexp_extract(entry, s"(?s)<$tag>\\s*([^<]*?)\\s*</$tag>", 1),
      lit(""))

  /** One row per `<url>` entry of each urlset document in `xml`.
    * Output: (loc, lastmod TIMESTAMP, changefreq, priority DOUBLE —
    * the spec's 0.5 default when absent).
    */
  def parseUrlset(docs: DataFrame, xml: Column): DataFrame =
    docs
      .select(explode(split(xml, "</url>")).as("__e"))
      .filter(col("__e").contains("<loc>"))
      .withColumn("__lm", tagText(col("__e"), "lastmod"))
      .withColumn("__pr", tagText(col("__e"), "priority"))
      .select(
        tagText(col("__e"), "loc").as("loc"),
        expr("try_to_timestamp(__lm)").as("lastmod"),
        tagText(col("__e"), "changefreq").as("changefreq"),
        coalesce(expr("try_cast(__pr AS DOUBLE)"), lit(0.5)).as("priority"))

  /** Child sitemap locations of each sitemapindex document. */
  def parseIndex(docs: DataFrame, xml: Column): DataFrame =
    docs
      .select(explode(split(xml, "</sitemap>")).as("__e"))
      .filter(col("__e").contains("<loc>"))
      .withColumn("__lm", tagText(col("__e"), "lastmod"))
      .select(tagText(col("__e"), "loc").as("loc"),
        expr("try_to_timestamp(__lm)").as("lastmod"))

  /** Frontier seeds from parsed urlset rows: the sitemap's priority
    * (1.0 = most important) maps onto the engine's ascending priority
    * tiers (0 = scheduled first): tier = round((1 − priority) · 10).
    */
  def toSeeds(parsed: DataFrame): DataFrame =
    parsed.select(col("loc").as("url"),
      round((lit(1.0) - col("priority")) * 10).cast("long").as("priority"))

  // ---- deterministic synthetic sitemaps (tests / driver oracle) ----

  /** Write `nFiles` urlset XML files of `perFile` entries under `dir`,
    * plus one sitemapindex naming them. Entry i (global) is arithmetic
    * in i: loc https://h{i%7}.test/p{i}; lastmod 2024-01-01T00:00Z +
    * i minutes; changefreq daily/weekly/monthly by i%4 (absent when
    * i%4==3); priority (i%11)/10 (absent when i%10==7 → parser default
    * 0.5).
    */
  def writeSyntheticSitemaps(dir: String, nFiles: Int, perFile: Int): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val freqs = Seq("daily", "weekly", "monthly")
    for (g <- 0 until nFiles) {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      for (i <- g * perFile until (g + 1) * perFile) {
        sb.append("  <url>\n")
        sb.append(s"    <loc>https://h${i % 7}.test/p$i</loc>\n")
        sb.append(f"    <lastmod>2024-01-01T${i / 60}%02d:${i % 60}%02d:00Z</lastmod>\n")
        if (i % 4 != 3)
          sb.append(s"    <changefreq>${freqs(i % 4)}</changefreq>\n")
        if (i % 10 != 7)
          sb.append(f"    <priority>${(i % 11) / 10.0}%.1f</priority>\n")
        sb.append("  </url>\n")
      }
      sb.append("</urlset>\n")
      val p = java.nio.file.Paths.get(dir, f"sitemap-$g%03d.xml")
      java.nio.file.Files.write(p, sb.toString.getBytes(UTF_8))
      p.toFile.deleteOnExit()
    }
    val idx = new StringBuilder
    idx.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<sitemapindex>\n")
    for (g <- 0 until nFiles) {
      idx.append(s"  <sitemap>\n    <loc>https://h0.test/sitemap-$g.xml</loc>\n")
      idx.append("    <lastmod>2024-01-01T00:00:00Z</lastmod>\n  </sitemap>\n")
    }
    idx.append("</sitemapindex>\n")
    val ip = java.nio.file.Paths.get(dir, "sitemapindex.xml")
    java.nio.file.Files.write(ip, idx.toString.getBytes(UTF_8))
    ip.toFile.deleteOnExit()
  }
}
