package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, GraphOps}

/** Dataset-curation ops: deterministic splits, stratified sampling
  * (including the deterministic widen path), normalization, PII
  * redaction, triangle counting — each against a Scala oracle.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def lcg(x: Long): Long = ((x % 2147483648L) * 1103515245L + 12345L) % 2147483648L

  test("assignSplits matches the arithmetic oracle and is ~80/10/10") {
    val df = spark.range(10000).select(col("id").as("doc_id"))
    val got = Curation.assignSplits(df)
      .select("doc_id", "bucket", "split").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    got.foreach { case (id, bucket, split) =>
      val expB = (lcg(id) >> 16) % 100
      assert(bucket == expB, s"doc $id")
      val expS = if (expB < 80) "train" else if (expB < 90) "val" else "test"
      assert(split == expS, s"doc $id")
    }
    val byS = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byS("train") > 7800 && byS("train") < 8200, byS.toString)
    assert(byS("val") > 800 && byS("val") < 1200, byS.toString)
    assert(byS("test") > 800 && byS("test") < 1200, byS.toString)
  }

  test("assignSplits is stable under repartitioning (hash, not order)") {
    val df = spark.range(1000).select(col("id").as("doc_id"))
    val a = Curation.assignSplits(df).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Curation.assignSplits(df.repartition(13)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("stratifiedSample returns the exact k smallest (h, key) per stratum") {
    val rows = (0L until 500L).map(i => (i, "big")) ++
      (500L until 510L).map(i => (i, "tiny")) // n < k stratum
    val df = rows.toDF("doc_id", "lang")
    val got = Curation.stratifiedSample(df, "lang", k = 20)
      .select("doc_id", "lang", "rk").as[(Long, String, Long)]
      .collect().groupBy(_._2)
    val expBig = (0L until 500L).sortBy(i => (lcg(i), i)).take(20)
    assert(got("big").sortBy(_._3).map(_._1).toSeq == expBig)
    assert(got("big").map(_._3).sorted.toSeq == (1L to 20L))
    // the tiny stratum returns ALL its rows (min(k, n) semantics)
    assert(got("tiny").map(_._1).toSet == (500L until 510L).toSet)
  }

  test("stratifiedSample widen path: all-high-hash stratum stays exact") {
    // keys whose hashes all land in the top quarter of the space —
    // with margin=1, k=5, n=100 the prefilter threshold (~2^31/20)
    // deterministically keeps ZERO of them, forcing the widen
    val highKeys = (0L until 200000L)
      .filter(i => lcg(i) >= (1L << 29) * 3).take(100)
    assert(highKeys.size == 100)
    val df = highKeys.map((_, "hot")).toDF("doc_id", "lang")
    val got = Curation.stratifiedSample(df, "lang", k = 5, margin = 1)
      .select("doc_id", "rk").as[(Long, Long)].collect().sortBy(_._2)
    val exp = highKeys.sortBy(i => (lcg(i), i)).take(5)
    assert(got.map(_._1).toSeq == exp)
  }

  test("normalizeText: NFC composition, control strip, ws collapse, trim") {
    val df = Seq(
      "café du  parc",        // combining acute -> é
      "Ångström",       // ring + diaeresis compose
      "a\u0000b\u001fc\u007fd",     // control chars -> spaces
      "  x \t\n y  ",
      "plain ascii").toDF("text")
    val got = df.select(Curation.normalizeText(col("text"))).as[String].collect()
    assert(got(0) == "café du parc")
    assert(got(1) == "Ångström")
    assert(got(2) == "a b c d")
    assert(got(3) == "x y")
    assert(got(4) == "plain ascii")
  }

  test("redactPii: emails then IPs then long digit runs, in order") {
    val df = Seq(
      "mail bob.smith+x@sub.example.co.uk end",
      "ip 192.168.0.1 and 10.0.0.255 stay gone",
      "card 4111111111111111 acct 123456789 but 12345678 stays",
      "both a@b.io at 1.2.3.4").toDF("text")
    val got = df.select(Curation.redactPii(col("text"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> end")
    assert(got(1) == "ip <IP> and <IP> stay gone")
    assert(got(2) == "card <ID> acct <ID> but 12345678 stays")
    assert(got(3) == "both <EMAIL> at <IP>")
  }

  test("split/normalize/redact are shuffle-free codegen'd per-row plans") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("t"), col("id").cast("string")).as("text"))
    val p1 = Curation.assignSplits(df).queryExecution.executedPlan.toString
    val p2 = df.select(Curation.normalizeText(col("text")))
      .queryExecution.executedPlan.toString
    val p3 = df.select(Curation.redactPii(col("text")))
      .queryExecution.executedPlan.toString
    for (p <- Seq(p1, p2, p3)) {
      assert(!p.contains("Exchange"), p)
      assert(p.contains("*(1)"), p) // one whole-stage codegen span
      assert(!p.contains("ScalaUDF"), p)
    }
  }

  test("c4Filter/gopherQuality are shuffle-free per-row plans") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("some words here t"), col("id").cast("string")).as("text"))
    val p1 = df.select(Curation.c4Filter(col("text")))
      .queryExecution.executedPlan.toString
    val p2 = df.select(Curation.gopherQuality(col("text")))
      .queryExecution.executedPlan.toString
    for (p <- Seq(p1, p2)) {
      assert(!p.contains("Exchange"), p)
      assert(!p.contains("ScalaUDF"), p)
    }
  }

  test("topVocab: exact top-k per language, two-stage = naive oracle") {
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h", "zz", "yy")
    val docs = (0 until 200).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val text = (0 until 30).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i.toLong, lang, text)
    }
    val df = docs.toDF("doc_id", "lang", "text")
    // naive oracle: full count + sort per language
    val exp = docs.flatMap { case (_, l, t) => t.split("\\s+").map(w => (l, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((l, w), c) => (l, w, c) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5)
          .zipWithIndex.map { case ((l, w, c), i) => (l, w, c, i + 1L) }
      }.toSet
    val got = Curation.topVocab(df, k = 5, salt = 4)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == exp)
  }

  test("decontaminate: shared-gram counts vs a hand oracle") {
    val docs = Seq(
      (0L, "a b c d e"),          // shares "b c d" and "c d e"
      (1L, "x y z w v"),          // clean
      (2L, "q b c d q c d e q"),  // shares the same two grams
      (3L, "c d e")               // exactly one gram, shared
    ).toDF("doc_id", "text")
    val bench = Seq("p b c d e p").toDF("text") // grams incl. "b c d", "c d e"
    val got = Curation.decontaminate(docs, bench)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 2L -> 2L, 3L -> 1L)) // doc 1 absent (clean)
  }

  test("decontaminate: hashed-gram probe ≡ exact string membership") {
    val docs = (0L until 60L)
      .map(i => (i, s"tok$i tok${i % 9} tok${(i + 1) % 9} tok${(i + 2) % 9} end"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 12 === 0)
    val hashed = Curation.decontaminate(docs, bench, hashedGrams = true)
      .as[(Long, Long)].collect().toMap
    val exact = Curation.decontaminate(docs, bench, hashedGrams = false)
      .as[(Long, Long)].collect().toMap
    assert(hashed == exact && hashed.nonEmpty)
  }

  test("decontaminate: same result with and without the broadcast hint") {
    val docs = (0L until 40L)
      .map(i => (i, s"w$i w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w$i"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val a = Curation.decontaminate(docs, bench, broadcastBench = true)
      .as[(Long, Long)].collect().toMap
    val b = Curation.decontaminate(docs, bench, broadcastBench = false)
      .as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("decontaminate plan: broadcast probe, doc grams deduped per-row (no extra exchange)") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a b c"), col("id").cast("string"), lit("d e f")).as("text"))
    val p = Curation.decontaminate(docs, docs.limit(5))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // exchanges: benchmark-side distinct (2: partial/final around its
    // agg), the broadcast itself, and the final doc_id count agg (1) —
    // the corpus gram stream must NOT add a (doc_id, gram) dedup
    // exchange, that dedup happened per-row in array_distinct
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
    assert(!p.toLowerCase.contains("sortaggregate"), p)
  }

  test("mixSources: copy counts match the integer-threshold oracle exactly") {
    // two groups keeps the weight sum FP-exact (a+b is commutative)
    val docs = ((0L until 6L).map(i => (i, "big")) ++
      Seq((6L, "small"), (7L, "small"))).toDF("doc_id", "source")
    val alpha = 0.5
    val target = 8L
    val n = Map("big" -> 6L, "small" -> 2L)
    val wsum = math.pow(6, alpha) + math.pow(2, alpha)
    def copiesOf(id: Long, g: String): Long = {
      val p = math.pow(n(g).toDouble, alpha) / wsum * target / n(g)
      val thr = math.floor((p - math.floor(p)) * (1L << 31)).toLong
      val h = ((id % (1L << 31)) * 1103515245L + 12345L) % (1L << 31)
      math.floor(p).toLong + (if (h < thr) 1L else 0L)
    }
    val exp = (for {
      (id, g) <- (0L until 6L).map((_, "big")) ++ Seq((6L, "small"), (7L, "small"))
      c = copiesOf(id, g) if c > 0
    } yield (id, g) -> c).toMap
    val got = Curation.mixSources(docs, alpha = alpha, targetTotal = target)
      .groupBy("doc_id", "grp").count()
      .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == exp)
    // copy indices are 0..c-1
    val copies = Curation.mixSources(docs, alpha = alpha, targetTotal = target)
      .as[(Long, String, Long)].collect()
    copies.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong))
    }
  }

  test("mixSources: expected size near target, flattens skew, repartition-stable") {
    val docs = (0L until 1000L)
      .map(i => (i, if (i % 10 < 8) "huge" else if (i % 10 == 8) "mid" else "rare"))
      .toDF("doc_id", "source")
    val out = Curation.mixSources(docs, alpha = 0.3, targetTotal = 1000L)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    val total = byGrp.values.sum
    assert(math.abs(total - 1000L) < 100, s"total $total")
    // alpha 0.3 pulls shares toward uniform: rare ≫ its 10% raw share
    assert(byGrp("rare") > 200 && byGrp("huge") < 600, byGrp.toString)
    val again = Curation.mixSources(docs.repartition(13), alpha = 0.3,
      targetTotal = 1000L).groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(again == byGrp)
  }

  test("packSequences: per-shard concat-and-cut layout vs hand oracle") {
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = Seq(
      (0L, words(4)), (1L, words(5)), (2L, words(7)),
      (3L, words(3)), (4L, words(6)), (5L, words(8))
    ).toDF("doc_id", "text")
    val got = Curation.packSequences(docs, budget = 10L, shards = 2)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // shard 0: docs 0,2,4 (4,7,6 tokens) → starts 0,4,11
    assert(got(0L) === ((0L, 0L, 4L, 0L, 0L)))
    assert(got(2L) === ((2L, 0L, 7L, 0L, 4L)))
    assert(got(4L) === ((4L, 0L, 6L, 1L, 1L)))
    // shard 1: docs 1,3,5 (5,3,8 tokens) → starts 0,5,8
    assert(got(1L) === ((1L, 1L, 5L, 0L, 0L)))
    assert(got(3L) === ((3L, 1L, 3L, 0L, 5L)))
    assert(got(5L) === ((5L, 1L, 8L, 0L, 8L)))
  }

  test("dropDupParagraphs keeps first occurrences only, drops emptied docs") {
    val docs = Seq(
      (0L, "A\nB\nA"), // A repeats within the doc: second instance goes
      (1L, "B\nC"),    // B first seen at doc 0
      (2L, "A\nB"),    // nothing survives → doc absent
      (3L, "D")
    ).toDF("doc_id", "text")
    val got = Curation.dropDupParagraphs(docs)
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "A\nB", 1L -> "C", 3L -> "D"))
  }

  test("dropDupParagraphs: stable under repartitioning (global first = min (doc,pos))") {
    val docs = (0L until 50L).map(i => (i, s"common\nuniq$i\ncommon2"))
      .toDF("doc_id", "text")
    val a = Curation.dropDupParagraphs(docs).as[(Long, String)].collect().toMap
    val b = Curation.dropDupParagraphs(docs.repartition(13, col("text")))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a(0L) == "common\nuniq0\ncommon2") // doc 0 owns both commons
    assert(a(7L) == "uniq7")
  }

  test("unigramLogLik matches a hand-computed corpus LM score") {
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    // corpus counts: a=2, b=2, c=1, total=5
    val ll = (t: Double) => math.log(t / 5.0)
    val exp0 = BigDecimal((ll(2) + ll(2) + ll(2)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal((ll(2) + ll(1)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.unigramLogLik(docs).as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> exp0, 1L -> exp1))
  }

  test("bigramLogLik matches a hand-computed bigram model; short docs drop") {
    val docs = Seq((0L, "a b a b"), (1L, "b a c"), (2L, "solo"))
      .toDF("doc_id", "text")
    // bigram positions: doc0 (a,b)(b,a)(a,b); doc1 (b,a)(a,c)
    // c(a,b)=2 c(b,a)=2 c(a,c)=1; c(a,·)=3, c(b,·)=2
    val exp0 = BigDecimal((math.log(2.0 / 3) + math.log(2.0 / 2) +
        math.log(2.0 / 3)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal((math.log(2.0 / 2) + math.log(1.0 / 3)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.bigramLogLik(docs).as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> exp0, 1L -> exp1), got.toString) // doc 2 dropped
  }

  test("ngramLogLik: stupid backoff matches a hand-computed model") {
    // model corpus: one doc "a b c" — nTot = 3 unigrams, every k-gram
    // of the chain has count 1; scored docs exercise each backoff arm
    val model = Seq((100L, "a b c")).toDF("doc_id", "text")
    val scored = Seq(
      (0L, "a b c d"), // full-context hits, then a total (kstar=0) miss
      (1L, "b c"),     // unigram hit then bigram hit at kmax=2
      (2L, "zz"))      // single unseen token: kmax=1, floor
      .toDF("doc_id", "text")
    val alpha = 0.4
    val lnA = math.log(alpha)
    val nTot = 3.0
    val B = 65536.0
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: pos a → ln(1/3); pos b → k*=2, c(a b)/c(a)=1 → 0;
    // pos c → k*=3, c(a b c)/c(a b)=1 → 0;
    // pos d → kmax=4 total miss → 3·lnα + ln(1/(3+B))
    val exp0 = r4((math.log(1 / nTot) + 0.0 + 0.0 +
      (3 * lnA + math.log(1.0 / (nTot + B)))) / 4)
    // doc 1: pos b → ln(1/3); pos c → k*=2, c(b c)/c(b)=1 → 0
    val exp1 = r4((math.log(1 / nTot) + 0.0) / 2)
    // doc 2: kmax=1 miss → 0·lnα + ln(1/(3+B))
    val exp2 = r4(math.log(1.0 / (nTot + B)))
    val got = Curation.ngramLogLik(scored, model, n = 5)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> exp0, 1L -> exp1, 2L -> exp2), got.toString)
    // order cap: with n = 2 the same scoring degenerates to bigram
    // backoff — doc 0's pos c scores c(b c)/c(b) = 1 → 0, pos d backs
    // off one level only
    val got2 = Curation.ngramLogLik(scored, model, n = 2)
      .as[(Long, Double)].collect().toMap
    val exp0b = r4((math.log(1 / nTot) + 0.0 + 0.0 +
      (1 * lnA + math.log(1.0 / (nTot + B)))) / 4)
    assert(got2(0L) == exp0b, got2.toString)
  }

  test("triangleCounts matches a brute-force oracle on a seeded graph") {
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = (0 until 160).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val undSet = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val exp = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if undSet((a, b)) && undSet((a, c)) && undSet((b, c))
    } { exp(a) += 1; exp(b) += 1; exp(c) += 1 }
    val got = GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == exp.filter(_._2 > 0).toMap)
  }

  test("triangleCounts: known triangles, no cartesian in the plan") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (1L, 4L), (6L, 7L), (2L, 1L)).toDF("src", "dst")
    val df = GraphOps.triangleCounts(edges)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
    // triangles: {1,2,3}, {3,4,5}, {1,3,4} (via the 1-4 chord)
    val got = df.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  // ---- CCNet score bucketing ----

  test("scoreBuckets: equal-count tiers, ties share a bucket, per-lang") {
    // en: scores 9,8,7,6,5,4 (one each) → head {9,8}, middle {7,6},
    // tail {5,4}. de: 3 docs score 2.0 + 3 docs 1.0: the tie group
    // {2.0} has cum=0 → bucket 0; {1.0} has cum=3, n=6 → bucket 1 —
    // ties SHARE the bucket the rule assigns, never split
    val scored = (
      (0 to 5).map(i => (i.toLong, "en", 9.0 - i)) ++
        (10 to 12).map(i => (i.toLong, "de", 2.0)) ++
        (13 to 15).map(i => (i.toLong, "de", 1.0))
      ).toDF("doc_id", "lang", "score")
    val got = Curation.scoreBuckets(scored)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    assert(got === Map(
      0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2,
      10L -> 0, 11L -> 0, 12L -> 0, 13L -> 1, 14L -> 1, 15L -> 1))
    // partition-independence
    val got2 = Curation.scoreBuckets(scored.repartition(7))
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    assert(got2 === got)
  }

  test("scoreBuckets plan: windows run over the histogram, not the corpus") {
    val scored = (0 to 20).map(i => (i.toLong, "en", (i % 4).toDouble))
      .toDF("doc_id", "lang", "score")
    val plan = Curation.scoreBuckets(scored)
      .queryExecution.optimizedPlan.toString
    // the aggregate (histogram) sits BELOW every Window node: no
    // Window may consume the raw (doc_id, ...) rows
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window ["))
    val aggIdx = lines.lastIndexWhere(_.contains("Aggregate ["))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected Aggregate below Window:\n$plan")
  }

  // ---- DSIR importance resampling ----

  private val dsirTarget = Seq(
    (100L, "spark sql engine runs fast"),
    (101L, "spark sql window functions"),
    (102L, "sql engine query planner")).toDF("doc_id", "text")

  private val dsirRaw = Seq(
    (0L, "spark sql engine tutorial"),
    (1L, "sql window engine spark"),
    (2L, "cat videos and more cat videos"),
    (3L, "buy cheap pills online now"),
    (4L, "spark sql query planner notes"),
    (5L, "weather report rain tomorrow")).toDF("doc_id", "text")

  /** serial DSIR recompute: same md5 bucket, same bigram build, same
    * add-one estimates — the arithmetic oracle for importanceWeights
    */
  private def dsirOracle(raw: Seq[(Long, String)], target: Seq[(Long, String)],
      buckets: Int, smoothing: Double): Map[Long, Double] = {
    def bucketOf(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(3).map(b => f"$b%02x").mkString.take(5)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def grams(t: String): Seq[Long] = {
      val toks = t.split("\\s+").toSeq
      (toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .map(bucketOf)
    }
    val tc = target.flatMap(d => grams(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rc = raw.flatMap(d => grams(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (tc.values.sum.toDouble, rc.values.sum.toDouble)
    val denom = buckets * smoothing
    raw.map { case (id, t) =>
      val w = grams(t).map { b =>
        math.log((tc.getOrElse(b, 0L) + smoothing) / (tt + denom)) -
          math.log((rc.getOrElse(b, 0L) + smoothing) / (tr + denom))
      }.sum
      id -> BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
  }

  test("importanceWeights matches the serial DSIR recompute bit-for-bit") {
    val got = Curation.importanceWeights(dsirRaw, dsirTarget, buckets = 4096)
      .as[(Long, Double)].collect().toMap
    val exp = dsirOracle(
      dsirRaw.as[(Long, String)].collect().toSeq,
      dsirTarget.as[(Long, String)].collect().toSeq, 4096, 1.0)
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - exp(id)) < 1e-9, s"doc $id: $w vs ${exp(id)}")
    }
    // semantics: target-like docs outscore off-distribution docs
    val targetLike = Set(0L, 1L, 4L)
    val minIn = targetLike.map(got).min
    val maxOut = (got.keySet -- targetLike).map(got).max
    assert(minIn > maxOut, got.toString)
  }

  test("selectByImportance: deterministic top-k; gumbel variant reproducible") {
    val top3 = Curation.selectByImportance(dsirRaw, dsirTarget, k = 3,
      buckets = 4096)
      .select("doc_id").as[Long].collect().toSet
    assert(top3 == Set(0L, 1L, 4L))
    val g1 = Curation.selectByImportance(dsirRaw, dsirTarget, k = 4,
      buckets = 4096, gumbel = true).as[(Long, Double, Double)].collect()
    val g2 = Curation.selectByImportance(dsirRaw.repartition(5), dsirTarget,
      k = 4, buckets = 4096, gumbel = true).as[(Long, Double, Double)].collect()
    assert(g1.toSeq == g2.toSeq, "gumbel draw must be partition-independent")
  }

  test("importanceWeights plan: gram strings never shuffle, model broadcasts") {
    // finalize = false: the production path eagerly checkpoints (one
    // LogicalRDD scan — nothing to inspect); this keeps the plan lazy
    val df = Curation.importanceWeights(dsirRaw, dsirTarget,
      buckets = 1024, finalize = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
    // every exchange carries only integer keys (bucket / doc_id), never
    // the gram column
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    exchanges.foreach(l => assert(!l.contains("gram"), l))
  }

  test("blockedByDomain: exact, parent-domain, multi-match, case/port normalization") {
    val docs = Seq(
      (1L, "https://Ads.Tracker.Example:8080/x"),   // under tracker.example
      (2L, "https://tracker.example/y"),            // exact
      (3L, "https://sub.ads.tracker.example/z"),    // deeper subdomain
      (4L, "https://example.org/clean"),            // clean
      (5L, "https://nottracker.example/q"),         // STRING suffix but not a label suffix — no match
      (6L, "https://bad.example.net/r")             // under example.net AND bad.example.net
    ).toDF("doc_id", "url")
    val bl = Seq("Tracker.Example ", "example.net", "bad.example.net", "")
      .toDF("domain")
    val got = Curation.blockedByDomain(docs, bl)
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "ads.tracker.example", "tracker.example"),
      (2L, "tracker.example", "tracker.example"),
      (3L, "sub.ads.tracker.example", "tracker.example"),
      (6L, "bad.example.net", "example.net"),
      (6L, "bad.example.net", "bad.example.net")), got.toString)
  }

  test("dropBlockedDomains keeps exactly the unblocked docs") {
    val docs = Seq(
      (1L, "https://ads.tracker.example/x"),
      (2L, "https://ok.example.org/y"),
      (3L, "https://tracker.example/z")
    ).toDF("doc_id", "url")
    val bl = Seq("tracker.example").toDF("domain")
    val kept = Curation.dropBlockedDomains(docs, bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), kept.toString)
  }

  test("trapHosts: flags explosive-url hosts, spares healthy ones") {
    val pages = spark.range(600).select(
      when(col("id") % 2 === 0,
          concat(lit("https://trap.test/cal?d="), col("id").cast("string")))
        .otherwise(concat(lit("https://ok.test/p"), col("id").cast("string")))
        .as("url"),
      when(col("id") % 2 === 0,
          concat(lit("cal-"), (col("id") % 6).cast("string")))
        .otherwise(concat(lit("pg-"), col("id").cast("string")))
        .cast("binary").as("html"))
    val got = Curation.trapHosts(pages, minUrls = 100, minRatio = 10.0)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("trap.test", 300L, 3L, 100.0)), got.toString)
  }

  test("urlFeatures: hand goldens — no-query, no-path, digit share, spam, case") {
    val f = Curation.urlFeatures(col("url"), Seq("casino", "bet"))
    val got = Seq(
      "https://w1.h2.example.org/a/b12/c?x=1&y=2",
      "https://example.org",
      "https://bet365.test/casino",
      "HTTPS://UP.test/PATH?Q=9")
      .toDF("url").select(f.as("f")).select("f.*")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (41, 4, 3, 2, 1463L, 0),
      (19, 2, 0, 0, 0L, 0),
      (26, 2, 1, 0, 1153L, 2),
      (24, 2, 1, 1, 416L, 0)), got.mkString("\n"))
  }

  test("blockedByDomain plan: suffix equi-join, blocklist broadcasts, no cartesian") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("https://h"), col("id") % 7, lit(".example.org/p")).as("url"))
    val bl = Seq("h3.example.org").toDF("domain")
    val plan = Curation.blockedByDomain(docs, bl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("c4Filter: line rules and doc flags — hand goldens") {
    val doc1 = "This is a good first sentence here.\nshort one.\n" +
      "Please enable javascript to see this page today.\n" +
      "Another quite long proper line ends well!\n" +
      "no terminal punctuation on this line\n" +
      "A third long sentence ends with a question mark?"
    val doc2 = "Lorem Ipsum dolor sit amet consectetur adipiscing elit."
    val doc3 = "function f() { return one value and a result here.\n" +
      "This otherwise fine sentence is long enough to pass checks.\n" +
      "And a second one that would also normally pass fine.\n" +
      "And a third one that would also normally pass fine."
    val doc4 = "Only two good sentences are present here.\n" +
      "And here is the second good one."
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Curation.c4Filter(col("text")).as("c"))
      .select(col("doc_id"), col("c.kept_text"), col("c.n_lines_kept"),
        col("c.n_sentences"), col("c.keep"))
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((1L,
      "This is a good first sentence here.\n" +
        "Another quite long proper line ends well!\n" +
        "A third long sentence ends with a question mark?",
      3L, 3L, true)), got(0).toString)
    // doc 2: line survives the line rules, but "lorem ipsum"
    // (case-insensitive) and <3 sentences both kill the doc
    assert(got(1)._2 == doc2 && got(1)._3 == 1L && !got(1)._5, got(1).toString)
    // doc 3: 4 kept lines / 4 sentences, but the curly brace kills it
    assert(got(2)._3 == 4L && got(2)._4 == 4L && !got(2)._5, got(2).toString)
    // doc 4: clean lines, but only 2 sentences
    assert(got(3)._3 == 2L && got(3)._4 == 2L && !got(3)._5, got(3).toString)
  }

  /** Scala reference for gopherQuality (integer arithmetic identical
    * to the Column form).
    */
  private def gopherOracle(text: String, minWords: Long, maxWords: Long)
      : (Long, Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    val toks: Array[String] = text.split("\\s+").filter(_.nonEmpty)
    val nWords = toks.length.toLong
    val wordChars = text.replaceAll("\\s", "").length.toLong
    val mean = if (nWords > 0) wordChars * 100 / nWords else 0L
    val nHash = text.count(_ == '#').toLong
    val nEll = ((text.length - text.replace("...", "").length) / 3).toLong
    def pw(n: Long) = if (nWords > 0) n * 10000 / nWords else 0L
    val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
    val nLines = lines.length.toLong
    val nBullet = lines.count(l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")).toLong
    val nEllL = lines.count(_.endsWith("...")).toLong
    def pl(n: Long) = if (nLines > 0) n * 10000 / nLines else 0L
    val nAlpha = toks.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val low = toks.map(_.toLowerCase)
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .count(low.contains).toLong
    val keep = nWords >= minWords && nWords <= maxWords &&
      mean >= 300 && mean <= 1000 && pw(nHash) <= 1000 &&
      pw(nEll) <= 1000 && pl(nBullet) <= 9000 && pl(nEllL) <= 3000 &&
      pw(nAlpha) >= 8000 && stops >= 2
    (nWords, mean, pw(nHash), pw(nEll), pl(nBullet), pl(nEllL),
      pw(nAlpha), stops, keep)
  }

  test("gopherQuality matches the scala oracle over rule-hitting docs") {
    val docs = Seq(
      // clean doc: passes everything at minWords = 5
      "The cat and dog have fun with that ball of yarn to be sure.",
      // symbol spam: hash ratio trips
      "# # # # the of and one two three four five six seven",
      // ellipsis-heavy words and lines
      "read more... the of and then... still more... and even more...\n" +
        "second line also trails off here...",
      // bullet-dominated layout
      "• the first item\n• the second item\n• of the third\n- and a fourth",
      // numeric words: alpha fraction trips
      "111 222 333 444 555 the of 666 777 888 999 000 123 456",
      // stop-word-free technical text
      "colum nar vector ized execu tion ker nel oper ator pipe line",
      // word-length extremes
      "a b c d e f g h i j k the of",
      "Supercalifragilistic expialidocious pneumonoultramicroscopic " +
        "silicovolcanoconiosis the of and antidisestablishmentarianism",
      // empty and whitespace-only
      "", "   \n  \n ")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Curation.gopherQuality(col("text"), minWords = 5).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_wl_c100"),
        col("g.hash_bp"), col("g.ellipsis_bp"), col("g.bullet_line_bp"),
        col("g.ellipsis_line_bp"), col("g.alpha_word_bp"), col("g.stop_hits"),
        col("g.keep"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    docs.zipWithIndex.foreach { case (t, i) =>
      val e = gopherOracle(t, 5, 100000)
      val g = got(i)
      assert((g._2, g._3, g._4, g._5, g._6, g._7, g._8, g._9, g._10) == e,
        s"doc $i: got $g expected $e text=$t")
    }
    // the clean doc keeps, each spam doc fails
    assert(got(0)._10, "clean doc should keep")
    assert(!got(1)._10 && !got(2)._10 && !got(3)._10 && !got(4)._10 &&
      !got(5)._10, "rule-hitting docs should fail")
  }

  test("stripTrackingParams: session ids, campaign params, empty-query collapse") {
    val urls = Seq(
      (1L, "https://ex.test/p;jsessionid=ABC123?x=1&utm_source=feed&y=2#frag"),
      (2L, "https://ex.test/p?utm_campaign=a&UTM_Medium=b&gclid=z"),
      (3L, "https://ex.test/p?x=1"),
      (4L, "https://ex.test/p;JSESSIONID=DEF"),
      (5L, "https://ex.test/p?fbclid=1&ref_src=twsrc&keep=Yes&_ga=2.1"),
      // near-miss names survive: _gat is not _ga, bare utm is not utm_*
      (6L, "https://ex.test/p?_gat=1&utm=x"),
      // SPA hash routing: the only '?' lives INSIDE the fragment —
      // it is not a query string and must pass through untouched
      (7L, "https://ex.test/#/route?page=2&utm_source=x"),
      // real query + fragment that itself contains '?'
      (8L, "https://ex.test/p?utm_source=a&x=1#/r?y=2"))
      .toDF("doc_id", "url")
    val got = urls.select(col("doc_id"),
        Curation.stripTrackingParams(col("url")).as("u"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "https://ex.test/p?x=1&y=2#frag", got(1L))
    assert(got(2L) == "https://ex.test/p", got(2L))
    assert(got(3L) == "https://ex.test/p?x=1", got(3L))
    assert(got(4L) == "https://ex.test/p", got(4L))
    assert(got(5L) == "https://ex.test/p?keep=Yes", got(5L))
    assert(got(6L) == "https://ex.test/p?_gat=1&utm=x", got(6L))
    assert(got(7L) == "https://ex.test/#/route?page=2&utm_source=x", got(7L))
    assert(got(8L) == "https://ex.test/p?x=1#/r?y=2", got(8L))
    // extraParams extend the blocklist
    val extra = urls.filter(col("doc_id") === 3L)
      .select(Curation.stripTrackingParams(
        concat(col("url"), lit("&sid=9")), Seq("sid")).as("u"))
      .as[String].head()
    assert(extra == "https://ex.test/p?x=1", extra)
  }

  test("shuffleShards: arithmetic assignment, contiguous pos, stability, epochs") {
    val df = spark.range(500).select(col("id").as("doc_id"))
    def h2(id: Long, epoch: Long) = lcg(lcg(id) + epoch)
    val got = Curation.shuffleShards(df, shards = 8, epoch = 3)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    got.foreach { case (id, sh, _) =>
      assert(sh == ((h2(id, 3) >> 8) % 8), s"doc $id")
    }
    got.groupBy(_._2).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == rows.indices.map(_.toLong),
        s"shard $sh positions not contiguous")
      val expected = rows.map(_._1).sortBy(id => (h2(id, 3), id))
      assert(byPos.map(_._1).toSeq == expected.toSeq, s"shard $sh order")
    }
    val repart = Curation.shuffleShards(df.repartition(13), 8, epoch = 3)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(repart == got.map(r => r._1 -> (r._2, r._3)).toMap,
      "assignment must not depend on partitioning")
    val e0 = Curation.shuffleShards(df, 8, epoch = 0)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(e0 != got.map(r => r._1 -> (r._2, r._3)).toMap,
      "epochs must produce different permutations")
  }
}
