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
}
