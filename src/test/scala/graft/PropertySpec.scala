package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{GoUrl, TextKernel}
import graft.ops.Curation

/** scalacheck properties over the pure kernels (canonicalization,
  * decode error contract, shingle/repetition kernels, NFC, Bloom,
  * WARC framing) plus single-job properties for the salted politeness
  * cap and the LCG split — the property layer SURVEY §5 calls for on
  * top of the golden-table and oracle tests.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(label: String, p: Prop, cases: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))

  // ---- Go QueryUnescape port (P1 byte-exact contract) ----

  test("prop: queryUnescape inverts percent-encoding, either hex case") {
    val anyStr = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', 'é', '中', '%', '+')))
      .map(_.mkString)
    check("unescape-roundtrip", Prop.forAll(anyStr, Gen.oneOf(true, false)) {
      (s, lower) =>
        val hex = s.getBytes(UTF_8).map { b =>
          val h = f"%%${b & 0xff}%02X"
          if (lower) h.toLowerCase else h
        }.mkString
        GoUrl.queryUnescape(hex).contains(s)
    })
  }

  test("prop: queryUnescape rejects every malformed % escape with None (Go: error → \"\")") {
    val clean = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val nonHex = Gen.oneOf('g', 'z', '!', ' ', '-')
    check("unescape-error", Prop.forAll(clean, clean, nonHex) { (a, b, c) =>
      GoUrl.queryUnescape(s"$a%$c$b").isEmpty &&
        GoUrl.queryUnescape(s"$a%").isEmpty &&
        GoUrl.queryUnescape(s"$a%4").isEmpty
    })
  }

  // ---- canonicalizers ----

  test("prop: cleanName is the identity on its own fixed points, and idempotent off them") {
    val base = "https://en.wikipedia.org"
    val prefix = "/wiki/"
    val fixed = Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar,
      Gen.oneOf(' ', '.', '-'))).map(_.mkString)
    check("clean-fixedpoint", Prop.forAll(fixed) { s =>
      Prop.iff[String](s, {
        case x if !x.startsWith(prefix) && !x.startsWith("http") =>
          Prop(GoUrl.cleanName(x, base, "", prefix) == x)
        case _ => Prop.passed
      })
    })
    // general inputs: one more clean() is a no-op whenever the first
    // pass left no %/+ (re-decode) and no strippable prefix
    val anyLink = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('/', '_', '%', '+', ':', '#', 'É'))).map(_.mkString)
    check("clean-idempotent", Prop.forAll(anyLink) { x =>
      val y = GoUrl.cleanName(x, base, "", prefix)
      val stable = !y.contains('%') && !y.contains('+') &&
        !y.startsWith(prefix) && !y.startsWith("http")
      !stable || GoUrl.cleanName(y, base, "", prefix) == y
    })
  }

  test("prop: canonicalUrl is idempotent over generated URL shapes") {
    val seg = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.'))).map(_.mkString)
    val urls = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
      host <- Gen.oneOf("Example.COM", "a.b.test", "WWW.X.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- seg.map(s => if (s.isEmpty) "" else s"/$s")
      q <- Gen.oneOf("", "?b=2&a=1", "?z=9", "?")
      frag <- Gen.oneOf("", "#sec", "#")
    } yield s"$scheme://$host$port$path$q$frag"
    check("canon-idempotent", Prop.forAll(urls) { u =>
      val once = GoUrl.canonicalUrl(u)
      GoUrl.canonicalUrl(once) == once
    })
  }

  // ---- text kernels ----

  test("prop: shingleHashArray ≡ xxhash64 of space-joined token grams") {
    val doc = Gen.listOf(word).map(_.mkString(" "))
    check("shingle-kernel", Prop.forAll(doc, Gen.choose(1, 4)) { (text, n) =>
      val toks = text.split("\\s+", -1)
      val expected =
        if (toks.length < n) Array.empty[Long]
        else (0 to toks.length - n).map { i =>
          val g = toks.slice(i, i + n).mkString(" ").getBytes(UTF_8)
          XXH64.hashUnsafeBytes(g, Platform.BYTE_ARRAY_OFFSET, g.length, 42L)
        }.toArray
      TextKernel.shingleHashArray(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
        .sameElements(expected)
    })
  }

  test("prop: repetitionStats kernel ≡ driver multiset count") {
    val doc = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e")).map(_.mkString(" "))
    check("repetition-kernel", Prop.forAll(doc, Gen.choose(1, 3)) { (text, n) =>
      val row = TextKernel.repetitionStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
      val toks = text.split("\\s+", -1)
      val grams =
        if (toks.length < n) Seq.empty[String]
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val mx = if (counts.isEmpty) 0L else counts.values.max.toLong
      val dup = counts.values.filter(_ >= 2).map(_.toLong).sum
      row.getLong(0) == grams.size.toLong &&
        row.getLong(1) == mx && row.getLong(2) == dup
    })
  }

  test("prop: nfcNormalize ≡ java.text.Normalizer NFC on any unicode") {
    val uni = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('e', '́', 'Å', 'Å', 'ﬁ', '中')))
      .map(_.mkString)
    check("nfc", Prop.forAll(uni) { s =>
      TextKernel.nfcNormalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    })
  }

  // ---- Bloom (J4 two-phase contract: the prefilter may lie positive,
  //      never negative) ----

  test("prop: bloom filters have no false negatives across serialize boundaries") {
    val sets = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check("bloom-nofn", Prop.forAll(sets) { xs =>
      val f = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(64, xs.length.toLong), 0.03)
      xs.foreach(f.putLong)
      val back = graft.state.Bloom.deserialize(graft.state.Bloom.serialize(f))
      xs.forall(back.mightContainLong)
    }, cases = 60)
  }

  // ---- WARC framing round-trip (content-length framing must carry
  //      arbitrary bodies, including ones containing CRLFCRLF) ----

  test("prop: WARC write → parse round-trips records under both codecs") {
    val body = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', '\r', '\n', '<', '>', 'é'))).map(_.mkString)
    val rec = for {
      h <- Gen.choose(0, 6)
      p <- Gen.choose(0, 9999)
      ok <- Gen.oneOf(true, false)
      b <- body
    } yield graft.sources.Warc.ResponseOut(
      s"https://h$h.test/p$p", "2024-01-02T03:04:05Z",
      if (ok) "200 OK" else "404 Not Found", b)
    check("warc-roundtrip",
      Prop.forAll(Gen.nonEmptyListOf(rec), Gen.oneOf(true, false)) { (rs, gz) =>
        val f = java.nio.file.Files.createTempFile("graft-prop", if (gz) ".warc.gz" else ".warc")
        try {
          graft.sources.Warc.writeWarcFile(f, "software: prop", rs, gz)
          val got = graft.sources.Warc.parseWarcBytes(java.nio.file.Files.readAllBytes(f))
            .filter(_.record_type == "response")
          got.length == rs.length && got.zip(rs).forall { case (g, r) =>
            g.url == r.url && g.http_status == r.status.split(" ")(0).toInt &&
              new String(g.html, UTF_8) == r.body
          }
        } finally java.nio.file.Files.delete(f)
      }, cases = 40)
  }

  // ---- Spark single-job properties ----

  test("prop: salted politeness cap = exact driver top-budget per host") {
    val hostRows = Gen.nonEmptyListOf(for {
      h <- Gen.oneOf("hot", "hot", "hot", "warm", "cold") // skewed
      p <- Gen.choose(0L, 5L)
    } yield (h, p))
    check("politeness", Prop.forAll(hostRows, Gen.choose(1, 4), Gen.choose(1, 5)) {
      (rows, budget, salt) =>
        val df = rows.zipWithIndex
          .map { case ((h, p), i) => (h, s"u$i", p, i.toLong) }
          .toDF("host", "url", "priority", "seq")
        val got = graft.engine.Politeness
          .capPerHost(df, budget, salt, Seq(col("priority"), col("seq")))
          .select("host", "url").as[(String, String)].collect().toSet
        val expected = rows.zipWithIndex
          .map { case ((h, p), i) => (h, s"u$i", p, i.toLong) }
          .groupBy(_._1).values.flatMap(
            _.sortBy(r => (r._3, r._4)).take(budget).map(r => (r._1, r._2)))
          .toSet
        got == expected
    }, cases = 12)
  }

  test("prop: variable-budget politeness cap = exact driver top-budget_h per host") {
    val hostRows = Gen.nonEmptyListOf(for {
      h <- Gen.oneOf("hot", "hot", "hot", "warm", "cold") // skewed
      p <- Gen.choose(0L, 5L)
    } yield (h, p))
    // hot gets its own budget from the table; warm/cold fall back
    check("politeness-budgets",
      Prop.forAll(hostRows, Gen.choose(1, 3), Gen.choose(1, 4), Gen.choose(1, 5)) {
        (rows, hotBudget, defBudget, salt) =>
          val df = rows.zipWithIndex
            .map { case ((h, p), i) => (h, s"u$i", p, i.toLong) }
            .toDF("host", "url", "priority", "seq")
          val budgets = Seq(("hot", hotBudget)).toDF("host", "budget")
          val got = graft.engine.Politeness
            .capPerHostBudgets(df, budgets, defBudget, salt,
              Seq(col("priority"), col("seq")))
            .select("host", "url").as[(String, String)].collect().toSet
          val expected = rows.zipWithIndex
            .map { case ((h, p), i) => (h, s"u$i", p, i.toLong) }
            .groupBy(_._1).toSeq.flatMap { case (h, rs) =>
              val b = if (h == "hot") hotBudget else defBudget
              rs.sortBy(r => (r._3, r._4)).take(b).map(r => (r._1, r._2))
            }.toSet
          got == expected
      }, cases = 12)
  }

  test("prop: surtOf (write-time scala) ≡ surtKey (Column) over generated URLs") {
    val label = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https")
      www <- Gen.oneOf(true, false)
      labels <- Gen.nonEmptyListOf(label).map(_.take(4))
      hostCase <- Gen.oneOf(identity[String] _, (s: String) => s.toUpperCase)
      path <- Gen.listOf(label).map(_.take(3))
      query <- Gen.option(for (k <- label; v <- label) yield s"$k=$v")
      frag <- Gen.option(label)
    } yield {
      val host = (if (www) "www." else "") + hostCase(labels.mkString("."))
      scheme + "://" + host +
        (if (path.isEmpty) "" else path.mkString("/", "/", "")) +
        query.map("?" + _).getOrElse("") +
        frag.map("#" + _).getOrElse("")
    }
    check("surt-parity", Prop.forAll(Gen.listOfN(24, urlGen)) { urls =>
      val viaColumn = urls.toDF("url")
        .select(graft.sources.Cdx.surtKey(col("url"))).as[String]
        .collect().toSeq
      viaColumn == urls.map(graft.sources.Cdx.surtOf)
    }, cases = 12)
  }

  test("prop: fetchPlan spans partition adjacency runs exactly (disjoint, complete, byte-exact)") {
    // random non-overlapping ranges per file: lengths > 0, random gaps
    // (gap 0 = adjacent → must fuse)
    val rangesGen = Gen.nonEmptyListOf(
      for (gap <- Gen.oneOf(0L, 0L, 7L, 1000L); len <- Gen.choose(1L, 50L))
        yield (gap, len)).map(_.take(40))
    check("fetch-plan", Prop.forAll(rangesGen, Gen.choose(1, 3)) { (rl, nf) =>
      val rows = (0 until nf).flatMap { f =>
        var off = 0L
        rl.map { case (gap, len) =>
          val start = off + gap
          off = start + len
          (s"f$f", start, len)
        }
      }
      val got = graft.sources.Cdx.fetchPlan(rows.toDF("filename", "offset", "length"))
        .select("filename", "span_start", "span_bytes", "n_records")
        .as[(String, Long, Long, Long)].collect().toSeq
      // oracle: fold adjacency runs per file in scala
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (fn, rs) =>
        rs.sortBy(_._2).foldLeft(List.empty[(String, Long, Long, Long)]) {
          case ((f, st, by, n) :: tail, (_, o, l)) if st + by == o =>
            (f, st, by + l, n + 1) :: tail
          case (acc, (_, o, l)) => (fn, o, l, 1L) :: acc
        }
      }.toSet
      got.toSet == expected &&
        got.map(_._4).sum == rows.size && // every record in exactly one span
        got.map(_._3).sum >= rows.map(_._3).sum // spans cover all bytes
    }, cases = 12)
  }

  test("prop: LCG split assignment is total, in-range, and ~deterministic") {
    val ids = Gen.nonEmptyListOf(Gen.choose(0L, 1L << 40))
    check("splits", Prop.forAll(ids) { xs =>
      val df = xs.distinct.toDF("doc_id")
      val got = Curation.assignSplits(df)
        .select("doc_id", "bucket", "split").as[(Long, Long, String)]
        .collect()
      got.forall { case (id, b, s) =>
        val exp = ((((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) >> 16) % 100
        b == exp && b >= 0 && b < 100 &&
          s == (if (b < 80) "train" else if (b < 90) "val" else "test")
      }
    }, cases = 10)
  }

  // ---- GopherStats kernel vs an independent driver recompute ----

  /** reference implementation of the gopher_stats contract: tokens on
    * the Java-\s set, CODEPOINT char counts, full-string ROOT-locale
    * stopword lowercasing, space-only line trims — everything the
    * kernel documents.
    */
  private def gopherRef(text: String, minW: Long, maxW: Long)
      : (Long, Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    val ws = " \t\n\u000B\f\r"
    val toks = text.split("[ \t\n\u000B\f\r]+", -1).filter(_.nonEmpty)
    val nW = toks.length.toLong
    val noWs = text.filterNot(ws.contains(_))
    val wc = noWs.codePointCount(0, noWs.length).toLong
    val mean = if (nW > 0) wc * 100 / nW else 0L
    val nHash = text.count(_ == '#').toLong
    var nEll = 0L
    var i = 0
    while (i + 2 < text.length) {
      if (text(i) == '.' && text(i + 1) == '.' && text(i + 2) == '.') {
        nEll += 1; i += 3
      } else i += 1
    }
    def pw(x: Long) = if (nW > 0) x * 10000 / nW else 0L
    val lines = text.split("\n", -1)
      .map(_.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse)
      .filter(_.nonEmpty)
    val nL = lines.length.toLong
    val nB = lines.count(l => l.head == '•' ||
      (l.length >= 2 && (l.head == '-' || l.head == '*') && l(1) == ' ')).toLong
    val nEl = lines.count(_.endsWith("...")).toLong
    def pl(x: Long) = if (nL > 0) x * 10000 / nL else 0L
    val nA = toks.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val low = toks.map(_.toLowerCase(java.util.Locale.ROOT))
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .count(low.contains).toLong
    val keep = nW >= minW && nW <= maxW && mean >= 300 && mean <= 1000 &&
      pw(nHash) <= 1000 && pw(nEll) <= 1000 && pl(nB) <= 9000 &&
      pl(nEl) <= 3000 && pw(nA) >= 8000 && stops >= 2
    (nW, mean, pw(nHash), pw(nEll), pl(nB), pl(nEl), pw(nA), stops, keep)
  }

  test("prop: gopherStats kernel ≡ independent recompute on messy unicode text") {
    import org.apache.spark.unsafe.types.UTF8String
    val piece = Gen.frequency(
      3 -> Gen.oneOf(" ", "\n", "\t", "\u000B", "\f", "\r"),
      3 -> Gen.oneOf("#", ".", "..", "...", "....", "•", "- ", "* ",
        "é", "中", "😀"),
      3 -> Gen.oneOf("the", "BE", "To", "of", "AND", "that", "have",
        "with", "word", "a1", "123", "x"),
      2 -> Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
    val text = Gen.listOf(piece).map(_.mkString)
    check("gopher-kernel", Prop.forAll(text) { s =>
      val row = TextKernel.gopherStats(UTF8String.fromString(s), 3L, 50L)
      val got = (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6),
        row.getLong(7), row.getBoolean(8))
      got == gopherRef(s, 3L, 50L)
    }, cases = 500)
  }

  test("prop: stripTrackingParams is idempotent and never keeps a blocked param (single job)") {
    val rnd = new scala.util.Random(11)
    val blocked = Seq("utm_source", "utm_x9", "gclid", "fbclid", "_ga", "_gl", "spm")
    val clean = Seq("q", "page", "id", "_gat", "utm", "ref")
    val urls = (0 until 200).map { i =>
      val sess = if (rnd.nextBoolean()) s";jsessionid=S$i" else ""
      val nP = rnd.nextInt(5)
      val params = (0 until nP).map { _ =>
        val n = if (rnd.nextBoolean()) blocked(rnd.nextInt(blocked.length))
          else clean(rnd.nextInt(clean.length))
        val cased = if (rnd.nextBoolean()) n.toUpperCase else n
        if (rnd.nextBoolean()) s"$cased=v${rnd.nextInt(9)}" else cased
      }.mkString("&")
      val q = if (params.nonEmpty) s"?$params" else ""
      val frag = if (rnd.nextBoolean()) "#frag" else ""
      (i.toLong, s"https://h${i % 5}.test/p$i$sess$q$frag")
    }.toDF("doc_id", "url")
    val out = urls.select(col("doc_id"),
        Curation.stripTrackingParams(col("url")).as("once"))
      .withColumn("twice", Curation.stripTrackingParams(col("once")))
      .as[(Long, String, String)].collect()
    val pat = ("^(utm_[a-z0-9_]*|gclid|dclid|fbclid|msclkid|mc_cid|mc_eid|" +
      "igshid|yclid|_ga|_gl|spm|ref_src)(=|$)").r
    out.foreach { case (id, once, twice) =>
      assert(once == twice, s"doc $id not idempotent: $once vs $twice")
      assert(!once.toLowerCase.contains("jsessionid"), s"doc $id: $once")
      val q = once.indexOf('?')
      if (q >= 0) {
        val end = { val h = once.indexOf('#'); if (h >= 0) h else once.length }
        once.substring(q + 1, end).split("&").foreach { p =>
          assert(pat.findFirstIn(p.toLowerCase).isEmpty, s"doc $id kept $p")
        }
      }
    }
  }

  test("prop: c4Filter kept lines all satisfy the line rules (single job)") {
    val rnd = new scala.util.Random(23)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "javascript", "Lorem", "ipsum", "brace{")
    def line() = {
      val n = rnd.nextInt(9)
      val body = (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
      body + (rnd.nextInt(4) match {
        case 0 => "." case 1 => "!" case 2 => "?" case _ => ""
      })
    }
    val texts = (0 until 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(7)).map(_ => line()).mkString("\n"))
    }.toDF("doc_id", "text")
    val got = texts.select(col("doc_id"), col("text"),
        Curation.c4Filter(col("text")).as("c"))
      .select(col("doc_id"), col("text"), col("c.kept_text"),
        col("c.n_lines_kept"), col("c.n_sentences"), col("c.keep"))
      .as[(Long, String, String, Long, Long, Boolean)].collect()
    got.foreach { case (id, text, keptText, nKept, nSent, keep) =>
      val kept = if (keptText.isEmpty) Array.empty[String]
        else keptText.split("\n", -1)
      assert(kept.length.toLong == nKept, s"doc $id count")
      kept.foreach { l =>
        assert(l == l.trim && l.nonEmpty, s"doc $id line not trimmed: '$l'")
        assert("[.!?\"]$".r.findFirstIn(l).isDefined, s"doc $id '$l'")
        assert(l.split("\\s+").length >= 5, s"doc $id short line kept: '$l'")
        assert(!l.toLowerCase.contains("javascript"), s"doc $id '$l'")
      }
      assert(nSent == kept.map(_.count("[.!?\"]".contains(_))).sum,
        s"doc $id sentences")
      val expKeep = nSent >= 3 &&
        !text.toLowerCase.contains("lorem ipsum") && !text.contains("{")
      assert(keep == expKeep, s"doc $id keep flag")
    }
  }

  // ---- md5-arithmetic signature kernels (foreign-verifiable mode) ----

  /** driver-side md5 → first-5-hex-digits integer */
  private def md5Int20Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8))
    ((d(0) & 0xffL) << 12) | ((d(1) & 0xffL) << 4) | ((d(2) & 0xffL) >>> 4)
  }

  private val textGen: Gen[String] = {
    val tok = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(5)),
      Gen.oneOf("é", "中文", "a-b", "x%20y", ""))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, tok)
      seps <- Gen.listOfN(math.max(0, n - 1), sep)
      lead <- Gen.oneOf("", " ")
      trail <- Gen.oneOf("", " ")
    } yield lead + (toks, seps :+ "").zipped.map(_ + _).mkString + trail
  }

  test("prop: md5MinhashSig ≡ per-gram reference over arbitrary text") {
    val n = 3
    val k = 4
    check("md5-minhash", Prop.forAll(textGen) { text =>
      val got = TextKernel.md5MinhashSig(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), n, k)
        .toLongArray().toSeq
      val toks = text.split("\\s+", -1)
      val want =
        if (toks.length < n) Seq.fill(k)(1L << 20)
        else (0 until k).map { j =>
          val a = ((2L * j + 1L) * 2654435761L) % 1048576L
          val b = (40503L * j + 17L) % 1048576L
          (0 to toks.length - n).map { i =>
            val x = md5Int20Ref(toks.slice(i, i + n).mkString(" "))
            (x * a + b) % 1048576L
          }.min
        }
      got == want && got.forall(v => v >= 0L && v <= (1L << 20))
    })
  }

  test("prop: md5Simhash ≡ bit-majority reference over arbitrary text") {
    check("md5-simhash", Prop.forAll(textGen) { text =>
      val got = TextKernel.md5Simhash(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val votes = new Array[Long](64)
      text.split("\\s+", -1).foreach { t =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes(UTF_8))
        val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var i = 0
        while (i < 64) {
          val bit = if (i < 32) (lo >>> i) & 1L else (hi >>> (i - 32)) & 1L
          votes(i) += (if (bit == 1L) 1L else -1L)
          i += 1
        }
      }
      val want = (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
      got == want
    })
  }
}
