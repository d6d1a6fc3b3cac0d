package graft.sites

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PageRow

/** Deterministic synthetic web corpus generator (FIXTURES.md §1).
  *
  * Pages are generated distributed via `spark.range` — no driver-side
  * materialization — so the same generator scales from the 50-page
  * test fixtures to the multi-million-page bench corpus. All
  * randomness is splitmix64 on (seed, pageId, slot): byte-stable
  * across runs, partitionings and parallelism levels.
  *
  * Link-graph shape: page i always links to (i+1) mod N (keeps the
  * graph connected so BFS covers it) plus `extraDeg(i)` pseudo-random
  * targets; per-profile decoy links exercise each reference predicate
  * (wikipedia/wiki.go:24-29, ar_synonyms.go:20-32, counties.go:22-46).
  */
object SyntheticWeb {

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix(seed: Long, a: Long, b: Long): Long = mix64(mix64(seed ^ a) ^ b)

  private def pos(x: Long): Long = x & Long.MaxValue

  /** zipf-ish host id: host h occurs with probability ~2^-(h+1) —
    * h0 carries half the corpus, the designed hot-host skew case.
    */
  def hostOfPage(seed: Long, i: Long, numHosts: Int): Int = {
    val tz = java.lang.Long.numberOfTrailingZeros(mix(seed, i, 7777L))
    math.min(tz, numHosts - 1)
  }

  /** uniform host id — the no-skew control twin of [[hostOfPage]] */
  def uniformHostOfPage(seed: Long, i: Long, numHosts: Int): Int =
    (pos(mix(seed, i, 8888L)) % numHosts).toInt

  final case class Spec(
      site: String,
      numPages: Long,
      seed: Long = 42L,
      minDeg: Int = 2,
      maxDeg: Int = 8,
      numHosts: Int = 16, // web profile only
      fillerWords: Int = 0, // body text volume (real pages are ~10-100KB)
      // web profile host distribution: zipf-ish by default (h0 owns
      // ~half the corpus — the designed hot-host case); false = the
      // uniform control the skew bench compares against
      hostSkew: Boolean = true)

  def pageUrl(spec: Spec, i: Long): String = spec.site match {
    case "wikipedia" => s"https://en.wikipedia.org/wiki/Node_$i"
    case "synonyms" => s"http://www.synonyms.com/synonym/word$i"
    // corpus urls are percent-encoded like real WARC records — the
    // fetch join matches base+href byte-for-byte; CleanUrl decodes to
    // the Arabic name (ar_synonyms.go:44-59)
    case "synonyms-ar" => s"https://synonyms.reverso.net/synonym/ar/%D9%83%D9%84%D9%85%D8%A9$i"
    case "us_counties" =>
      s"https://en.wikipedia.org/wiki/${countyName(i)}"
    case _ =>
      val h =
        if (spec.hostSkew) hostOfPage(spec.seed, i, spec.numHosts)
        else uniformHostOfPage(spec.seed, i, spec.numHosts)
      s"https://h$h.web.test/wiki/Node_$i"
  }

  /** relative (or absolute, web) href from page i to page j */
  def linkHref(spec: Spec, j: Long): String = spec.site match {
    case "wikipedia" => s"/wiki/Node_$j"
    case "synonyms" => s"/synonym/word$j"
    case "synonyms-ar" => s"/synonym/ar/%D9%83%D9%84%D9%85%D8%A9$j" // percent-encoded كلمة
    case "us_counties" => s"/wiki/${countyName(j)}"
    case _ => pageUrl(spec, j)
  }

  def countyName(i: Long): String = {
    val states = Array("Alabama", "Virginia", "Texas", "Iowa", "Ohio",
      "Maine", "Utah", "Kansas", "Oregon", "Nevada")
    s"C${i}_County,_${states((i % states.length).toInt)}"
  }

  def degree(spec: Spec, i: Long): Int =
    spec.minDeg + (pos(mix(spec.seed, i, 1L)) % (spec.maxDeg - spec.minDeg + 1)).toInt

  /** target page ids of page i, document order, first is i+1 mod N */
  def targets(spec: Spec, i: Long): Seq[Long] = {
    val d = degree(spec, i)
    val extra = (0 until d).map(l => pos(mix(spec.seed, i, 100L + l)) % spec.numPages)
    ((i + 1) % spec.numPages) +: extra
  }

  /** Build the page HTML. Includes per-profile decoys that the valid-
    * link predicates / DOM scoping must reject.
    */
  private val fillerVocab = Array("lorem", "ipsum", "dolor", "amet",
    "consectetur", "adipiscing", "elit", "tempor", "incididunt", "labore",
    "magna", "aliqua", "veniam", "nostrud", "ullamco", "laboris")

  /** deterministic body filler, ~7 bytes/word; paragraphs of 40 words */
  def filler(spec: Spec, i: Long): String = {
    if (spec.fillerWords <= 0) return ""
    val sb = new java.lang.StringBuilder(spec.fillerWords * 8)
    var w = 0
    while (w < spec.fillerWords) {
      if (w % 40 == 0) sb.append(if (w == 0) "<p>" else "</p>\n<p>")
      else sb.append(' ')
      sb.append(fillerVocab((pos(mix(spec.seed, i, 5000L + w)) % fillerVocab.length).toInt))
      w += 1
    }
    sb.append("</p>")
    sb.toString
  }

  def htmlFor(spec: Spec, i: Long): String = {
    val ts = targets(spec, i)
    val anchors = ts.map(j => s"""<a href="${linkHref(spec, j)}">t$j</a>""").mkString("\n")
    val body = filler(spec, i)
    spec.site match {
      case "wikipedia" | "web" =>
        s"""<!doctype html><html><head><title>Node $i</title></head><body>
           |<h1>Node $i</h1>
           |<p>Synthetic page $i of ${spec.numPages}.</p>
           |$body
           |$anchors
           |<a href="/wiki/Category:Synth">cat</a>
           |<a href="/wiki/Main_Page">main</a>
           |<a href="/wiki/Node_$i#frag">self-frag</a>
           |<a href="https://other.example.org/offsite">off</a>
           |</body></html>""".stripMargin
      case "synonyms" =>
        s"""<html><body>
           |<div class="header"><a href="/synonym/outofscope$i">nav</a></div>
           |<div class="syns">
           |<h2>word$i</h2>
           |$anchors
           |<a href="/synonym/bad:colon">bad</a>
           |</div>
           |<div class="footer"><a href="/synonym/footer$i">foot</a></div>
           |</body></html>""".stripMargin
      case "synonyms-ar" =>
        s"""<html><body>
           |<div class="nav"><a href="/synonym/ar/nav$i">nav</a></div>
           |<div class="word-opt">
           |$anchors
           |<a href="https://context.reverso.net/translation/word$i">tr</a>
           |</div>
           |</body></html>""".stripMargin
      case "us_counties" =>
        // heading parent: <h3><span id="Adjacent_counties..."></span></h3>
        // then sibling divs with links, a <p> to exclude, then next <h3>
        s"""<html><body>
           |<h2>${countyName(i)}</h2>
           |<p>Intro paragraph with <a href="/wiki/${countyName((i + 3) % spec.numPages)}">early link</a></p>
           |<h3><span id="Adjacent_counties_${i}">Adjacent counties</span></h3>
           |<div>
           |$anchors
           |</div>
           |<p>Excluded paragraph <a href="/wiki/${countyName((i + 5) % spec.numPages)}">plink</a></p>
           |<ul><li><a href="/wiki/NotACounty_$i">bad format</a></li></ul>
           |<h3><span id="Other_section_$i">Other</span></h3>
           |<div><a href="/wiki/${countyName((i + 7) % spec.numPages)}">after section</a></div>
           |</body></html>""".stripMargin
      case other => sys.error(s"unknown site $other")
    }
  }

  /** The corpus as a Dataset[PageRow] (url, warc_ts, html, text, lang). */
  def pages(spark: SparkSession, spec: Spec): Dataset[PageRow] = {
    import spark.implicits._
    val specB = spark.sparkContext.broadcast(spec)
    spark.range(0, spec.numPages)
      .as[Long]
      .mapPartitions { it =>
        val sp = specB.value
        it.map { i =>
          val html = htmlFor(sp, i)
          PageRow(
            url = pageUrl(sp, i),
            warc_ts = new java.sql.Timestamp(1500000000000L + i * 1000L),
            html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            text = graft.functions.Extract.fullText(
              html.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            lang = if (sp.site == "synonyms-ar") "ar" else "en")
        }
      }
  }

  /** counties allow-list dim (FIXTURES.md §2): every even page id is
    * allowed; odd ids exercise the reject path.
    */
  def countiesAllowList(spark: SparkSession, spec: Spec): DataFrame = {
    import spark.implicits._
    spark.range(0, spec.numPages)
      .filter(col("id") % 2 === 0)
      .select(udf((i: Long) => countyName(i)).apply(col("id")).as("name"))
  }

  /** seeds table (site, word) — deterministic replacement for the
    * reference's random-line-from-file (util/util.go:15-44).
    */
  def seeds(spark: SparkSession, spec: Spec, n: Int = 50): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (spec.site, pageUrl(spec, i.toLong))).toDF("site", "url")
  }
}
