package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.Instant
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{canon, Extract}
import graft.ops.TextOps

/** WARC ingestion source: the format Common Crawl actually ships
  * (ISO 28500 / WARC 1.0 — public spec), parsed into the engine's
  * input table shape (url, warc_ts, html, text, lang).
  *
  * The reference crawls live HTTP; this library's corpus is a static
  * pages table (SURVEY S3) — this source is how that table gets BUILT
  * from real crawl archives. A WARC file is a sequence of records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <ISO-8601>\r\n
  * Content-Length: <n>\r\n
  * \r\n
  * <n bytes: an HTTP/1.1 message — status line, headers, \r\n\r\n, body>
  * \r\n\r\n
  * }}}
  *
  * Scale shape: Common Crawl ships ~1 GB .warc.gz files, ~100k of
  * them per dump — `spark.read.format("binaryFile")` gives one task
  * per file, which IS the right parallelism unit (records inside a
  * gzip member are not splittable), and the flatMap parser streams
  * records without materializing more than one at a time beyond the
  * file bytes themselves. This is a genuine per-partition imperative
  * source boundary — the one place `flatMap` over bytes beats Column
  * algebra. Gzip is detected per-file by magic bytes;
  * multi-member (record-per-member, how CC writes them) and
  * single-member streams both decode through the JDK's own
  * GZIPInputStream.
  *
  * Malformed tails are tolerated: a file yields every record up to
  * the first structural break (missing mandatory header, short body),
  * then stops — an ingest over 100k archive files must not fail the
  * job on one truncated tail.
  */
object Warc {

  /** One parsed WARC record (response records carry the HTTP payload
    * split into status + body; other types keep their raw block).
    */
  final case class WarcRecord(
      url: String,
      warc_ts: Timestamp,
      record_type: String,
      http_status: Int,
      html: Array[Byte],
      refers_to: String = null)

  private val CRLF2 = "\r\n\r\n".getBytes(UTF_8)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // buffers sized to the member: a ranged read decodes thousands of
    // KB-scale slices per task — fixed 64 KB buffers would be pure
    // allocation churn there, while whole-file reads still get 64 KB
    val bufSize = math.max(512, math.min(bytes.length, 1 << 16))
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), bufSize)
    val out = new ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 22))
    val buf = new Array[Byte](bufSize)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: EOFException => () } // truncated last member: keep prefix
    out.toByteArray
  }

  /** Parse one WARC file's bytes (gzip-detected) into records; stops
    * at the first structural break (returns the records before it).
    */
  def parseWarcBytes(raw: Array[Byte]): Seq[WarcRecord] = {
    if (raw == null || raw.length < 4) return Seq.empty
    val bytes =
      if ((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) gunzipAll(raw)
      else raw
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) ok = false
      else {
        val headEnd = indexOf(bytes, CRLF2, pos)
        if (headEnd < 0) ok = false
        else {
          val head = new String(bytes, pos, headEnd - pos, UTF_8)
          val lines = head.split("\r\n")
          if (lines.isEmpty || !lines(0).startsWith("WARC/")) ok = false
          else {
            val hdrs = lines.drop(1).flatMap { l =>
              val i = l.indexOf(':')
              if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase ->
                l.substring(i + 1).trim)
            }.toMap
            hdrs.get("content-length").flatMap(_.toLongOption) match {
              case None => ok = false // mandatory per spec
              case Some(len) =>
                val bodyStart = headEnd + 4
                if (bodyStart + len > bytes.length) ok = false // short body
                else {
                  val block = java.util.Arrays.copyOfRange(
                    bytes, bodyStart, bodyStart + len.toInt)
                  val rtype = hdrs.getOrElse("warc-type", "unknown")
                  val ts = hdrs.get("warc-date").flatMap { d =>
                    try Some(Timestamp.from(Instant.parse(d)))
                    catch { case _: Exception => None }
                  }.orNull
                  val url = hdrs.getOrElse("warc-target-uri", null)
                  val (status, body) =
                    if (rtype == "response") splitHttp(block) else (0, block)
                  val refersTo =
                    hdrs.getOrElse("warc-refers-to-target-uri", null)
                  out += WarcRecord(url, ts, rtype, status, body, refersTo)
                  pos = bodyStart + len.toInt
                }
            }
          }
        }
      }
    }
    out.result()
  }

  /** Split an HTTP/1.1 response block into (status code, body bytes);
    * a block without an HTTP status line is kept whole with status 0
    * (some archives store raw payloads).
    */
  private def splitHttp(block: Array[Byte]): (Int, Array[Byte]) = {
    val sep = indexOf(block, CRLF2, 0)
    if (sep < 0) return (0, block)
    val head = new String(block, 0, math.min(sep, 8192), UTF_8)
    val first = head.takeWhile(_ != '\r')
    if (!first.startsWith("HTTP/")) (0, block)
    else {
      val status = first.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(0)
      (status, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
    }
  }

  /** All records of every WARC file under `path` (non-splittable
    * per-file tasks — the Common-Crawl parallelism unit).
    */
  def readRecords(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(parseWarcBytes _)
  }

  /** The engine's input table (input_hint shape): HTTP-200 response
    * records → (url canonicalized downstream as-is, warc_ts, html,
    * text, lang). `text` is the whole-document extraction the corpus
    * carries (SURVEY §1.1 Page); `lang` the stopword language-ID.
    */
  def toPages(records: Dataset[WarcRecord]): DataFrame = {
    val fullTextUdf = udf((h: Array[Byte]) =>
      try Extract.fullText(h) catch { case _: Exception => "" })
    records.toDF()
      .filter(col("record_type") === "response" && col("http_status") === 200 &&
        col("url").isNotNull)
      .select(col("url"), col("warc_ts"), col("html"))
      .withColumn("text", fullTextUdf(col("html")))
      .withColumn("lang", TextOps.langId(col("text")))
  }

  /** pages-table read straight off an archive directory. */
  def read(spark: SparkSession, path: String): DataFrame =
    toPages(readRecords(spark, path))

  /** Per-batch RANGED page fetcher over an indexed archive — the plug
    * for [[graft.engine.CrawlEngine]]'s `fetcher` seam that makes the
    * engine's per-batch fetch cost track the BATCH, not the corpus:
    * the batch's urls semi-join the CDX index (index rows are ~100 B
    * against ~50 KB pages — the scan that stays cheap at corpus
    * scale, and the same join every cc-index consumer pays), the
    * matching captures coalesce into per-file spans
    * ([[Cdx.fetchPlan]]), and [[readRecordsRanged]] seek-reads ONLY
    * those byte ranges. The plain-corpus fetch join reads O(corpus
    * page bytes) per batch; this reads O(index) + O(batch page
    * bytes) — at a 500× index:page size ratio that is the difference
    * between re-scanning the web per batch and fetching the batch.
    *
    * `dir` must hold archives written with write-time indexing (the
    * cdx/ subdir of [[writeWarcFileIndexed]] + [[Cdx.indexLines]],
    * i.e. Common Crawl's own layout). The parsed index is cached
    * across batches. Returns (url, html) rows for 200-status urls
    * present in the index; multiple captures of a url resolve to the
    * latest ([[Cdx.latestCaptures]]), read-through records that ride
    * a fused span are dropped.
    */
  def rangedFetcher(spark: SparkSession, dir: String,
      gapTolerance: Long = 0L): DataFrame => DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cdx = Cdx.latestCaptures(Cdx.readCaptures(spark, s"$dir/cdx")
        .filter(col("http_status") === 200))
      .persist(StorageLevel.MEMORY_AND_DISK)
    urls => {
      val batchUrls = urls.select(col("url")).distinct()
      val caps = cdx.join(batchUrls, Seq("url"), "left_semi")
      val plan = Cdx.fetchPlan(caps, gapTolerance)
      readRecordsRanged(spark, dir, plan).toDF()
        .filter(col("record_type") === "response" &&
          col("http_status") === 200 && col("url").isNotNull)
        .join(batchUrls, Seq("url"), "left_semi")
        .dropDuplicates("url")
        .select(col("url"), col("html"))
    }
  }

  // ---- ranged decode (CDX-planned ingest) ----

  /** Decode ONLY the byte spans a [[Cdx.fetchPlan]] names — the read
    * side of the index-then-fetch loop: at 100 TB the executor seeks
    * to each span and reads `span_bytes`, never the file (Hadoop
    * FSDataInputStream seek — positioned reads on HDFS/S3A). Works on
    * plain archives (spans start at a record head) and on
    * record-per-member gzip archives (spans start at a member
    * boundary; the parser's multi-member gunzip decodes the slice),
    * the layout Common Crawl itself uses to make ranged GETs
    * possible. `plan` columns: (filename, span_start, span_bytes).
    */
  def readRecordsRanged(spark: SparkSession, dir: String,
      plan: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    // cluster + sort spans by file so a task opens each archive ONCE
    // and walks its spans in offset order (one handle, forward seeks —
    // the shape a ranged-GET fetcher batches requests in; thousands of
    // per-span opens would drown the read in connection setup)
    val spans = plan
      .select(col("filename"), col("span_start"), col("span_bytes"))
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("span_start"))
      .as[(String, Long, Long)]
    spans.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      var curName: String = null
      var curIn: org.apache.hadoop.fs.FSDataInputStream = null
      val records = it.flatMap { case (fname, start, len) =>
        require(len <= Int.MaxValue, s"span too large: $len")
        if (fname != curName) {
          if (curIn != null) curIn.close()
          val p = new org.apache.hadoop.fs.Path(dir, fname)
          // local files: skip the checksum wrapper — a ranged read
          // issues thousands of seeks and CRC re-sync makes each one
          // a read-amplified stutter (HDFS/S3A paths are unaffected)
          val fs = p.getFileSystem(conf) match {
            case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
            case f => f
          }
          curIn = fs.open(p)
          curName = fname
        }
        val buf = new Array[Byte](len.toInt)
        curIn.seek(start)
        curIn.readFully(buf)
        parseWarcBytes(buf)
      }
      new Iterator[WarcRecord] { // close the last handle at exhaustion
        def hasNext: Boolean = {
          val h = records.hasNext
          if (!h && curIn != null) { curIn.close(); curIn = null }
          h
        }
        def next(): WarcRecord = records.next()
      }
    }
  }

  // ---- archive writing (tests / corpus fixtures) ----

  /** One response record to serialize into an archive. */
  final case class ResponseOut(url: String, date: String, status: String,
      body: String)

  /** One write-time capture entry: where a response record landed in
    * the file as written — the raw material of a CDX index. For
    * member-gzip archives (offset, length) bound one independently
    * decompressible gzip member.
    */
  final case class CaptureEntry(url: String, date: String, status: String,
      offset: Long, length: Long)

  /** Serialize one WARC file (optionally gzipped) of response records
    * prefixed by a warcinfo record — the layout Common Crawl uses.
    */
  def writeWarcFile(path: java.nio.file.Path, warcinfoBody: String,
      records: Seq[ResponseOut], gzip: Boolean): Unit = {
    val sb = new ByteArrayOutputStream()
    def rec(headers: Seq[(String, String)], block: Array[Byte]): Unit = {
      val head = (Seq("WARC/1.0") ++
        headers.map { case (k, v) => s"$k: $v" } ++
        Seq(s"Content-Length: ${block.length}")).mkString("\r\n")
      sb.write((head + "\r\n\r\n").getBytes(UTF_8))
      sb.write(block)
      sb.write("\r\n\r\n".getBytes(UTF_8))
    }
    rec(Seq("WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2024-01-01T00:00:00Z"), warcinfoBody.getBytes(UTF_8))
    records.foreach { r =>
      val http = s"HTTP/1.1 ${r.status}\r\nContent-Type: text/html\r\n\r\n${r.body}"
      rec(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> r.url,
        "WARC-Date" -> r.date), http.getBytes(UTF_8))
    }
    val plain = sb.toByteArray
    if (!gzip) java.nio.file.Files.write(path, plain)
    else {
      val bo = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bo)
      gz.write(plain); gz.close()
      java.nio.file.Files.write(path, bo.toByteArray)
    }
  }

  /** Serialize one WARC file and return where each response record
    * landed (the raw material of a CDX index). `memberGzip = true`
    * writes one gzip member per record — Common Crawl's layout, in
    * which every (offset, length) slice is independently
    * decompressible and therefore ranged-GET-able; `false` writes
    * plain WARC with byte-exact record offsets. A warcinfo record
    * heads the file either way and is not indexed.
    */
  def writeWarcFileIndexed(path: java.nio.file.Path, warcinfoBody: String,
      records: Seq[ResponseOut], memberGzip: Boolean): Seq[CaptureEntry] = {
    val out = new ByteArrayOutputStream()
    def block(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
      val head = (Seq("WARC/1.0") ++
        headers.map { case (k, v) => s"$k: $v" } ++
        Seq(s"Content-Length: ${body.length}")).mkString("\r\n")
      val b = new ByteArrayOutputStream()
      b.write((head + "\r\n\r\n").getBytes(UTF_8))
      b.write(body)
      b.write("\r\n\r\n".getBytes(UTF_8))
      b.toByteArray
    }
    def emit(raw: Array[Byte]): Long = {
      if (!memberGzip) { out.write(raw); raw.length.toLong }
      else {
        val bo = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bo)
        gz.write(raw); gz.close()
        val member = bo.toByteArray
        out.write(member); member.length.toLong
      }
    }
    var offset = emit(block(Seq("WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2024-01-01T00:00:00Z"), warcinfoBody.getBytes(UTF_8)))
    val entries = records.map { r =>
      val http = s"HTTP/1.1 ${r.status}\r\nContent-Type: text/html\r\n\r\n${r.body}"
      val len = emit(block(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> r.url,
        "WARC-Date" -> r.date), http.getBytes(UTF_8)))
      val e = CaptureEntry(r.url, r.date, r.status, offset, len)
      offset += len
      e
    }
    java.nio.file.Files.write(path, out.toByteArray)
    entries
  }

  /** Write a pages table (url, html) as a member-gzip WARC archive
    * with write-time CDX indexing, one archive per partition, built
    * ON THE EXECUTORS (each task buffers only its own file). The
    * output is [[rangedFetcher]]'s input layout — used by tests and
    * the bench to put a whole synthetic web behind the ranged-fetch
    * loop.
    */
  def writePagesArchive(pages: DataFrame, dir: String, nFiles: Int): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    new java.io.File(dir, "cdx").mkdirs()
    pages.select(col("url"), col("html")).repartition(nFiles)
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val recs = it.map { r =>
          ResponseOut(r.getString(0), "2024-01-01T00:00:00Z", "200 OK",
            new String(r.getAs[Array[Byte]](1), UTF_8))
        }.toSeq
        if (recs.nonEmpty) {
          val name = f"part-$pid%05d.warc.gz"
          val entries = writeWarcFileIndexed(
            java.nio.file.Paths.get(dir, name), "software: graft-bench",
            recs, memberGzip = true)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, "cdx", name + ".cdx"),
            Cdx.indexLines(entries, name).mkString("\n").getBytes(UTF_8))
        }
        ()
      }
  }

  /** One revisit stub to serialize: a capture whose payload is
    * byte-identical to an earlier record, stored as a pointer
    * instead of a second copy (ISO 28500 `revisit` record,
    * identical-payload-digest profile — how Common Crawl and
    * Heritrix deduplicate storage ACROSS captures).
    */
  final case class RevisitOut(url: String, date: String,
      refersTo: String, digest: String)

  /** Serialize one WARC file of full responses + revisit stubs
    * (warcinfo record at the head, optional whole-file gzip).
    */
  def writeWarcFileRevisits(path: java.nio.file.Path, warcinfoBody: String,
      records: Seq[ResponseOut], revisits: Seq[RevisitOut],
      gzip: Boolean): Unit = {
    val sb = new ByteArrayOutputStream()
    def rec(headers: Seq[(String, String)], block: Array[Byte]): Unit = {
      val head = (Seq("WARC/1.0") ++
        headers.map { case (k, v) => s"$k: $v" } ++
        Seq(s"Content-Length: ${block.length}")).mkString("\r\n")
      sb.write((head + "\r\n\r\n").getBytes(UTF_8))
      sb.write(block)
      sb.write("\r\n\r\n".getBytes(UTF_8))
    }
    rec(Seq("WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2024-01-01T00:00:00Z"), warcinfoBody.getBytes(UTF_8))
    records.foreach { r =>
      val http = s"HTTP/1.1 ${r.status}\r\nContent-Type: text/html\r\n\r\n${r.body}"
      rec(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> r.url,
        "WARC-Date" -> r.date), http.getBytes(UTF_8))
    }
    revisits.foreach { r =>
      rec(Seq(
        "WARC-Type" -> "revisit",
        "WARC-Target-URI" -> r.url,
        "WARC-Date" -> r.date,
        "WARC-Refers-To-Target-URI" -> r.refersTo,
        "WARC-Payload-Digest" -> s"sha1:${r.digest}",
        "WARC-Profile" ->
          "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
        Array.emptyByteArray)
    }
    val plain = sb.toByteArray
    if (!gzip) java.nio.file.Files.write(path, plain)
    else {
      val bo = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bo)
      gz.write(plain); gz.close()
      java.nio.file.Files.write(path, bo.toByteArray)
    }
  }

  /** Write a pages table (url, html) as a WARC archive with
    * identical-payload-digest storage dedup: one full response per
    * distinct payload (the minimum-url capture is canonical —
    * deterministic under any partitioning), every other capture a
    * revisit stub pointing at it.
    *
    * Scale shape: the canonical pick shuffles (digest, url) pairs —
    * ~60 B per page against ~50 KB payloads — and page bytes move
    * ONLY for canonical rows (`when(is_canonical, html)` nulls the
    * payload before the writer repartition), so a dup-heavy crawl
    * (the common case: calendars, session-id spam, mirror farms)
    * writes and ships O(distinct payloads) page bytes, not O(pages).
    */
  def writeDedupArchive(pages: DataFrame, dir: String, nFiles: Int): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    new java.io.File(dir).mkdirs()
    val withDigest = pages.select(col("url"), col("html"),
      sha1(col("html")).as("digest"))
    val canon = withDigest.groupBy("digest")
      .agg(min(col("url")).as("canon_url"))
    withDigest.join(canon, "digest")
      .select(col("url"), col("digest"), col("canon_url"),
        when(col("url") === col("canon_url"), col("html")).as("html"))
      .repartition(nFiles)
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val full = Seq.newBuilder[ResponseOut]
        val stubs = Seq.newBuilder[RevisitOut]
        it.foreach { r =>
          val url = r.getString(0)
          val canonUrl = r.getString(2)
          if (url == canonUrl)
            full += ResponseOut(url, "2024-01-01T00:00:00Z", "200 OK",
              new String(r.getAs[Array[Byte]](3), UTF_8))
          else stubs += RevisitOut(url, "2024-01-01T00:00:00Z",
            canonUrl, r.getString(1))
        }
        val (fs, ss) = (full.result(), stubs.result())
        if (fs.nonEmpty || ss.nonEmpty)
          writeWarcFileRevisits(
            java.nio.file.Paths.get(dir, f"part-$pid%05d.warc.gz"),
            "software: graft-bench", fs, ss, gzip = true)
        ()
      }
  }

  /** Materialize revisit records back into full page rows: each
    * revisit joins its referred response and takes that payload
    * (keeping its OWN capture timestamp — the revisit is a real
    * capture, only its bytes are stored elsewhere). Returns
    * (url, warc_ts, http_status, html, is_revisit) for responses ∪
    * resolved revisits; a revisit whose referent is missing from the
    * archive set is dropped (the archives are self-contained by
    * construction of [[writeDedupArchive]]).
    *
    * Scale shape: the join key is the canonical url; the revisit side
    * is ~100 B stubs, and response payloads move once — under a
    * url-bucketed archive layout the join co-locates and ships
    * nothing.
    */
  def resolveRevisits(records: Dataset[WarcRecord]): DataFrame = {
    val df = records.toDF()
    val resp = df.filter(col("record_type") === "response")
      .select(col("url"), col("warc_ts"), col("http_status"), col("html"))
    val resolved = df.filter(col("record_type") === "revisit")
      .select(col("url"), col("warc_ts"), col("refers_to"))
      .join(resp.select(col("url").as("refers_to"),
        col("http_status"), col("html")), "refers_to")
      .select(col("url"), col("warc_ts"), col("http_status"), col("html"),
        lit(true).as("is_revisit"))
    resp.withColumn("is_revisit", lit(false)).union(resolved)
  }

  /** Write a (url, text) table as a WET-style text sidecar: WARC
    * `conversion` records whose body is the EXTRACTED TEXT (Common
    * Crawl's .wet companion to every .warc — the artifact most
    * text-pipeline consumers actually read, at ~1/10 the bytes of
    * the html). One whole-file-gzip archive per partition, built on
    * the executors.
    */
  def writeTextArchive(pages: DataFrame, dir: String, nFiles: Int): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    new java.io.File(dir).mkdirs()
    pages.select(col("url"), col("text")).repartition(nFiles)
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sb = new ByteArrayOutputStream()
        def rec(headers: Seq[(String, String)], block: Array[Byte]): Unit = {
          val head = (Seq("WARC/1.0") ++
            headers.map { case (k, v) => s"$k: $v" } ++
            Seq(s"Content-Length: ${block.length}")).mkString("\r\n")
          sb.write((head + "\r\n\r\n").getBytes(UTF_8))
          sb.write(block)
          sb.write("\r\n\r\n".getBytes(UTF_8))
        }
        rec(Seq("WARC-Type" -> "warcinfo",
          "WARC-Date" -> "2024-01-01T00:00:00Z"),
          "software: graft-wet".getBytes(UTF_8))
        var any = false
        it.foreach { r =>
          any = true
          rec(Seq(
            "WARC-Type" -> "conversion",
            "WARC-Target-URI" -> r.getString(0),
            "WARC-Date" -> "2024-01-01T00:00:00Z",
            "Content-Type" -> "text/plain"), r.getString(1).getBytes(UTF_8))
        }
        if (any) {
          val bo = new ByteArrayOutputStream()
          val gz = new GZIPOutputStream(bo)
          gz.write(sb.toByteArray); gz.close()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, f"part-$pid%05d.wet.gz"),
            bo.toByteArray)
        }
        ()
      }
  }

  /** Read a WET-style archive back to (url, text) rows. */
  def readText(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, path).toDF()
      .filter(col("record_type") === "conversion" && col("url").isNotNull)
      .select(col("url"), decode(col("html"), "UTF-8").as("text"))

  /** Merge pages from several crawl dumps into one latest-wins
    * snapshot: one row per CANONICAL url (north-rule
    * canonicalization, so `HTTP://h:80/p?b=2&a=1` and
    * `http://h/p?a=1&b=2` merge), keeping the row with the newest
    * `warc_ts`; equal timestamps break deterministically by payload
    * sha1 so reruns and repartitionings agree.
    *
    * Scale shape: one map-side-combinable `max_by` aggregation on the
    * canonical-url key — no window over the corpus, no per-dump
    * joins; U dumps of the same frontier collapse in a single
    * shuffle whose payload is one candidate row per (url, partition)
    * after partial aggregation.
    */
  def mergeSnapshots(pages: DataFrame): DataFrame = {
    val cols = pages.columns
    val ord = struct(col("warc_ts"), sha1(col("html")))
    pages
      .withColumn("curl", canon.canonical_url(col("url")))
      .groupBy("curl")
      .agg(max_by(struct(cols.map(col).toIndexedSeq: _*), ord).as("r"))
      .select(cols.map(c => col(s"r.$c")).toIndexedSeq: _*)
  }

  // ---- deterministic synthetic archive (tests / driver oracle) ----

  /** Write `nFiles` WARC files (alternating plain / gzip) of
    * `perFile` records each under `dir`. Record i (global) is
    * arithmetic in i so a foreign oracle recomputes every field:
    * url https://h{i%7}.test/p{i}, date 2024-01-01T00:00Z + i min,
    * status 404 when i%10==9 else 200, body an html page with
    * 1 + i%5 links (to p{i+1}..), one warcinfo record at the head of
    * each file (must be skipped by toPages). File f holds records
    * [f*perFile, (f+1)*perFile).
    */
  def writeSyntheticArchive(dir: String, nFiles: Int, perFile: Int): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    for (f <- 0 until nFiles) {
      val records = (f * perFile until (f + 1) * perFile).map { i =>
        val links = (0 until (1 + i % 5))
          .map(j => s"""<a href="/p${i + 1 + j}">l$j</a>""").mkString(" ")
        ResponseOut(
          url = s"https://h${i % 7}.test/p$i",
          date = f"2024-01-${1 + i / 1440}%02dT${(i / 60) % 24}%02d:${i % 60}%02d:00Z",
          status = if (i % 10 == 9) "404 Not Found" else "200 OK",
          body = s"<html><body><p>doc $i</p>$links</body></html>")
      }
      val gzip = f % 2 == 1 // even files plain, odd files gzip
      val path = java.nio.file.Paths.get(dir,
        f"part-$f%03d.warc" + (if (gzip) ".gz" else ""))
      writeWarcFile(path, s"software: graft-synthetic/$f", records, gzip)
      path.toFile.deleteOnExit()
    }
  }

  /** Write `nFiles` member-gzip WARC files of `perFile` response
    * records each under `dir`, PLUS the CDXJ index of every record
    * under `dir`/cdx — the integrated fixture for the
    * index-then-ranged-fetch loop. Record CONTENT is the same
    * arithmetic-in-i scheme as [[writeSyntheticArchive]] (url, date,
    * status, link count all recomputable by a foreign oracle);
    * offsets/lengths are real member boundaries measured at write
    * time, the way CC's own indexer records them.
    */
  /** deterministic low-compressibility filler (hex of a mixed hash —
    * gzip keeps most of it, so padded archives measure real decode
    * throughput instead of deflating to nothing)
    */
  private def fillerText(i: Long, n: Int): String = {
    val sb = new StringBuilder(n + 16)
    var h = graft.sites.SyntheticWeb.mix(0xC0FFEEL, i, 0L)
    while (sb.length < n) {
      sb.append(java.lang.Long.toHexString(h))
      h = graft.sites.SyntheticWeb.mix(h, i, sb.length.toLong)
    }
    sb.setLength(n)
    sb.toString
  }

  def writeSyntheticIndexedArchive(dir: String, nFiles: Int,
      perFile: Int, bodyPad: Int = 0): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val cdxDir = new java.io.File(dir, "cdx")
    cdxDir.mkdirs()
    // files are independent — write them in parallel (bench-scale
    // fixtures gzip ~100k members; single-threaded that is minutes)
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { f =>
      val records = (f * perFile until (f + 1) * perFile).map { i =>
        val links = (0 until (1 + i % 5))
          .map(j => s"""<a href="/p${i + 1 + j}">l$j</a>""").mkString(" ")
        val pad =
          if (bodyPad <= 0) "" else s"<p>${fillerText(i.toLong, bodyPad)}</p>"
        ResponseOut(
          url = s"https://h${i % 7}.test/p$i",
          date = f"2024-01-${1 + i / 1440}%02dT${(i / 60) % 24}%02d:${i % 60}%02d:00Z",
          status = if (i % 10 == 9) "404 Not Found" else "200 OK",
          body = s"<html><body><p>doc $i</p>$links$pad</body></html>")
      }
      val name = f"part-$f%03d.warc.gz"
      val path = java.nio.file.Paths.get(dir, name)
      val entries = writeWarcFileIndexed(path,
        s"software: graft-synthetic/$f", records, memberGzip = true)
      val cdxPath = java.nio.file.Paths.get(cdxDir.toString, f"cdx-$f%05d.txt")
      java.nio.file.Files.write(cdxPath,
        Cdx.indexLines(entries, name).mkString("", "\n", "\n").getBytes(UTF_8))
      path.toFile.deleteOnExit()
      cdxPath.toFile.deleteOnExit()
    }
  }
}
