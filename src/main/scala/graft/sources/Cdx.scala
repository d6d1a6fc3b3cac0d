package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.canon

/** CDX capture-index source (the Common Crawl / pywb CDXJ format —
  * public spec; CC ships one such index per dump as `cc-index`).
  *
  * The index is how a 100 TB pipeline avoids READING 100 TB: each line
  * locates one capture inside a WARC file by (filename, byte offset,
  * record length), keyed by SURT + 14-digit timestamp. Query the index
  * first, then fetch only the byte ranges it names — `fetchPlan` below
  * turns a capture selection into per-file coalesced range lists, the
  * concrete artifact a ranged-GET fetcher consumes. Together with
  * [[Warc]] this closes the loop: CDX selects, WARC decodes.
  *
  * Line format (CDXJ):
  * {{{
  * <surt> <yyyyMMddHHmmss> {"url": "...", "mime": "...", "status": "200",
  *   "digest": "sha1:...", "length": "1234", "offset": "5678",
  *   "filename": "crawl-data/.../x.warc.gz"}
  * }}}
  * All JSON values are strings (CC's own encoding); numerics are cast
  * after parse with try_cast so one malformed line degrades to NULLs
  * instead of failing a 100k-file ingest.
  *
  * Scale shape: the index is plain text (splittable — unlike the WARC
  * members themselves), so `spark.read.text` parallelizes by HDFS
  * split; every transform below is built-in Column algebra (split /
  * from_json / casts), no UDFs.
  */
object Cdx {

  private val metaSchema = StructType(Seq(
    "url", "mime", "status", "digest", "length", "offset", "filename")
    .map(StructField(_, StringType)))

  /** SURT key (Sort-friendly URI Reordering Transform — public spec):
    * reversed comma-joined host + ")" + lowercased path[?query], with
    * a leading `www.` dropped, matching CC/pywb canonicalization:
    * `https://www.Example.COM/A/b?q=1` → `com,example)/a/b?q=1`.
    * Composed from codegen'd pieces (host_of + built-ins).
    */
  def surtKey(url: Column): Column = {
    val host = regexp_replace(canon.host_of(url), "^www\\.", "")
    val revHost = array_join(reverse(split(host, "\\.")), ",")
    val path = lower(coalesce(parse_url(url, lit("PATH")), lit("/")))
    val path1 = when(path === "", lit("/")).otherwise(path)
    val query = parse_url(url, lit("QUERY"))
    concat(revHost, lit(")"), path1,
      when(query.isNotNull, concat(lit("?"), lower(query))).otherwise(lit("")))
  }

  /** All captures of every CDXJ file under `path`. Lines that do not
    * parse (wrong arity, bad JSON) yield NULL url and are dropped —
    * same malformed-tail tolerance as the WARC reader.
    */
  def readCaptures(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** Parse CDXJ lines from any DataFrame with a `value` STRING column —
    * works unchanged on a STREAMING frame (`spark.readStream.text`):
    * a live index feed parses into typed captures per micro-batch,
    * since every step is stateless Column algebra.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), " ", 3)
    lines
      .filter(octet_length(col("value")) > 0)
      .select(
        // try_element_at: a line with fewer than 3 tokens yields NULLs
        // (ANSI element_at would fail the whole ingest on one line)
        try_element_at(parts, lit(1)).as("surt_key"),
        try_element_at(parts, lit(2)).as("__ts"),
        from_json(try_element_at(parts, lit(3)), metaSchema).as("__m"))
      .select(
        col("__m.url").as("url"),
        col("surt_key"),
        expr("try_to_timestamp(__ts, 'yyyyMMddHHmmss')").as("capture_ts"),
        col("__m.mime").as("mime"),
        expr("try_cast(__m.status AS BIGINT)").as("http_status"),
        col("__m.digest").as("digest"),
        expr("try_cast(__m.length AS BIGINT)").as("length"),
        expr("try_cast(__m.offset AS BIGINT)").as("offset"),
        col("__m.filename").as("filename"))
      .filter(col("url").isNotNull)
  }

  /** Newest capture per url (a dump carries many captures of hot
    * urls; training-data builds want one). One map-side-combinable
    * max_by aggregation on url — NO per-url window sort, so it holds
    * at 10^10 captures: the combiner reduces each partition to one
    * candidate row per url before the (8-byte-hashable key) shuffle.
    * Ties on capture_ts break by (offset, filename) so the pick is
    * total and deterministic.
    */
  def latestCaptures(cdx: DataFrame): DataFrame = {
    val payload = struct(cdx.columns.map(col).toIndexedSeq: _*)
    val ord = struct(col("capture_ts"), col("offset"), col("filename"))
    cdx.groupBy(col("url").as("__u"))
      .agg(max_by(payload, ord).as("__c"))
      .select(col("__c.*"))
  }

  /** Turn a (filtered) capture selection into a ranged-GET fetch plan:
    * per WARC file, adjacent selected records coalesce into one span
    * (one HTTP range request / one seek instead of per-record reads).
    * Emits (filename, span_start, span_bytes, n_records).
    *
    * `gapTolerance` > 0 enables READ-THROUGH merging (standard object-
    * store range practice): spans separated by at most that many bytes
    * fuse into one request — fewer, larger reads at the price of
    * fetching the gap bytes; the decoder will then also yield the
    * gap's records, so selective callers re-apply their filter after
    * the ranged decode.
    *
    * The window partitions by filename — bounded by construction: a
    * ~1 GB .warc.gz holds tens of thousands of records, never the
    * corpus; no global sort anywhere.
    */
  def fetchPlan(captures: DataFrame, gapTolerance: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col("filename")).orderBy(col("offset"))
    captures
      .select(col("filename"), col("offset"), col("length"))
      .withColumn("__prev_end", lag(col("offset") + col("length"), 1).over(w))
      .withColumn("__new", when(col("__prev_end").isNull ||
        col("offset") > col("__prev_end") + lit(gapTolerance), 1L)
        .otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("filename"), col("__span").as("span_id"))
      .agg(
        min(col("offset")).as("span_start"),
        (max(col("offset") + col("length")) - min(col("offset")))
          .as("span_bytes"),
        count(lit(1)).as("n_records"))
  }

  /** Per-url change statistics from consecutive captures: how often
    * the content digest differed between visits, and the mean gap
    * between visits — the signal an adaptive recrawl scheduler feeds
    * on (change-rate-driven revisit policies are classic crawl
    * science; the reference recrawls nothing, a 10^10-frontier
    * production crawler must choose). One url shuffle; per-url window
    * partitions are bounded by captures-per-url (a handful per dump),
    * never the corpus.
    *
    * Output: (url, n_captures, n_changes, change_rate ∈ [0,1] NULL for
    * single-capture urls, avg_gap_min).
    */
  def changeStats(cdx: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("capture_ts"), col("offset"), col("filename"))
    cdx
      .select(col("url"), col("capture_ts"), col("offset"),
        col("filename"), col("digest"))
      .withColumn("__prev_digest", lag(col("digest"), 1).over(w))
      .withColumn("__prev_ts", lag(col("capture_ts"), 1).over(w))
      .withColumn("__changed",
        when(col("__prev_digest").isNull, lit(null))
          .otherwise((col("__prev_digest") =!= col("digest")).cast("long")))
      .withColumn("__gap_min",
        when(col("__prev_ts").isNull, lit(null)).otherwise(
          (col("capture_ts").cast("long") - col("__prev_ts").cast("long"))
            / 60.0))
      .groupBy(col("url"))
      .agg(
        count(lit(1)).as("n_captures"),
        coalesce(sum(col("__changed")), lit(0L)).as("n_changes"),
        // intervals = n_captures - 1; guarded for single-capture urls
        when(count(col("__changed")) > 0,
          round(sum(col("__changed")) / count(col("__changed")), 4))
          .as("change_rate"),
        round(avg(col("__gap_min")), 4).as("avg_gap_min"))
  }

  /** Revisit seeds from [[changeStats]]: urls seen at least twice,
    * fast-changing content landing in the hottest frontier tiers
    * (0 = rescheduled first) — same tier convention as
    * [[Sitemaps.toSeeds]].
    */
  def toRecrawlSeeds(stats: DataFrame): DataFrame =
    stats
      .filter(col("n_captures") >= 2)
      .select(col("url"),
        round((lit(1.0) - col("change_rate")) * 10).cast("long")
          .as("priority"))

  /** Scala-side mirror of [[surtKey]] for write-time indexing (the
    * indexer runs where the archive writer runs, not in a plan).
    * CdxSpec pins equality against the Column form on the goldens.
    */
  def surtOf(url: String): String = {
    val afterScheme = url.indexOf("://") match {
      case -1 => url
      case i  => url.substring(i + 3)
    }
    // host ends at the first of '/', '?', '#' (query- or fragment-only
    // urls have no path) — a property test caught '#' being missed
    val cut = Seq(afterScheme.indexOf('/'), afterScheme.indexOf('?'),
      afterScheme.indexOf('#')).filter(_ >= 0).minOption.getOrElse(-1)
    val hostPort = (if (cut < 0) afterScheme
      else afterScheme.substring(0, cut)).toLowerCase
    val host = hostPort.takeWhile(_ != ':').stripPrefix("www.")
    val rest =
      if (cut < 0) "/"
      else {
        val r = afterScheme.substring(cut)
        if (r.startsWith("/")) r else "/" + r
      }
    val noFrag = rest.takeWhile(_ != '#') match { case "" => "/"; case p => p }
    host.split('.').reverse.mkString(",") + ")" + noFrag.toLowerCase
  }

  /** CDXJ lines for one written WARC file (write-time indexing — how
    * CC itself produces its index: the writer knows the offsets).
    * `entries` come from [[Warc.writeWarcFileIndexed]]; dates are the
    * records' ISO-8601 WARC-Dates.
    */
  def indexLines(entries: Seq[Warc.CaptureEntry],
      filename: String): Seq[String] =
    entries.map { e =>
      val ts14 = e.date.filter(_.isDigit).take(14)
      val status = e.status.takeWhile(_ != ' ')
      val json = s"""{"url": "${e.url}", "mime": "text/html", """ +
        s""""status": "$status", "digest": "sha1:W${e.offset}", """ +
        s""""length": "${e.length}", "offset": "${e.offset}", """ +
        s""""filename": "$filename"}"""
      s"${surtOf(e.url)} $ts14 $json"
    }

  // ---- deterministic synthetic index (tests / driver oracle) ----

  /** Write `nFiles` CDXJ text files of `perFile` capture lines under
    * `dir`. Capture i (global, 0-based) is arithmetic in i so a
    * foreign oracle recomputes every field:
    *   - url: https://h{u%7}.test/p{u} with u = i % (N/2) — every url
    *     is captured exactly TWICE (i = u and i = u + N/2), so
    *     latest-capture selection does real work;
    *   - ts: 2024-01-01T00:00Z + i minutes; status 404 when i%10==9
    *     else 200; length 500 + 3·(i%100);
    *   - digest: stable across both captures when u%3==0 (content
    *     never changed), distinct otherwise — so change-rate stats do
    *     real work;
    *   - offset: running sum of lengths within the named WARC file
    *     (records are physically adjacent, so status-filtered spans
    *     exercise real coalescing);
    *   - filename: crawl-data/part-{i / perFile}.warc.gz.
    * Index file g holds captures [g·perFile, (g+1)·perFile).
    */
  def writeSyntheticIndex(dir: String, nFiles: Int, perFile: Int): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val n = nFiles * perFile
    val urls = n / 2
    for (g <- 0 until nFiles) {
      val sb = new StringBuilder
      var offset = 0L
      for (i <- g * perFile until (g + 1) * perFile) {
        val u = i % urls
        val url = s"https://h${u % 7}.test/p$u"
        val surt = s"test,h${u % 7})/p$u"
        val ts = f"202401${1 + i / 1440}%02d${(i / 60) % 24}%02d${i % 60}%02d00"
        val status = if (i % 10 == 9) "404" else "200"
        val len = 500L + 3L * (i % 100)
        val digest = if (u % 3 == 0) s"sha1:C$u" else s"sha1:C$u-$i"
        val json = s"""{"url": "$url", "mime": "text/html", """ +
          s""""status": "$status", "digest": "$digest", """ +
          s""""length": "$len", "offset": "$offset", """ +
          s""""filename": "crawl-data/part-$g.warc.gz"}"""
        sb.append(s"$surt $ts $json\n")
        offset += len
      }
      val path = java.nio.file.Paths.get(dir, f"cdx-$g%05d.txt")
      java.nio.file.Files.write(path, sb.toString.getBytes(UTF_8))
      path.toFile.deleteOnExit()
    }
  }
}
