package graft

import org.apache.spark.sql.functions._

import graft.ops.Search

/** BM25 retrieval against a driver-side recompute of the published
  * formula, plus the plan shape that keeps it corpus-scale.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  private def bm25Oracle(corpus: Seq[(Long, String)],
      query: Seq[String]): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = query.map { t =>
      t -> toks.values.count(_.contains(t)).toDouble
    }.toMap
    corpus.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      val s = query.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      if (s > 0) Some(id -> BigDecimal(s)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }.toMap
  }

  test("bm25TopK matches the formula oracle, ordering and rounding included") {
    val corpus = Seq(
      (0L, "spark window merge spark"),
      (1L, "spark table"),
      (2L, "window window window window window window"),
      (3L, "other words only here"),
      (4L, "merge"))
    val query = Seq("spark", "window", "merge")
    val exp = bm25Oracle(corpus, query)
    val got = Search.bm25TopK(corpus.toDF("doc_id", "text"), query, 10)
      .as[(Long, Double)].collect()
    assert(got.toMap == exp)
    // deterministic order: rounded score desc, doc_id asc
    val expOrder = exp.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(got.map(_._1).toSeq == expOrder)
  }

  test("bm25TopK: k cuts the tail deterministically") {
    val corpus = (0L until 30L).map(i => (i, s"spark x$i")) // identical scores
    val got = Search.bm25TopK(corpus.toDF("doc_id", "text"), Seq("spark"), 7)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == (0L until 7L)) // doc_id tie-break
  }

  test("bm25TopK plan: broadcast df/stats, top-k heap, no global sort") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat_ws(" ", lit("spark window"), col("id").cast("string")).as("text"))
    val p = Search.bm25TopK(docs, Seq("spark", "window"), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("rrfFuse: hand-computed fusion, overlap boosted, deterministic order") {
    val lex = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("doc_id", "score")
    val den = Seq((2L, 0.9), (4L, 0.8)).toDF("doc_id", "score")
    val got = Search.rrfFuse(Seq(lex, den), k = 10)
      .as[(Long, Double)].collect().toSeq
    // ranks: lex 1→1 2→2 3→3; den 2→1 4→2; rrf = Σ 1/(60+rank)
    assert(got == Seq(
      (2L, 0.032522), // 1/62 + 1/61 — in both runs, beats every single-run doc
      (1L, 0.016393), // 1/61
      (4L, 0.016129), // 1/62
      (3L, 0.015873)), // 1/63
      got.toString)
  }

  test("bm25TopKIndexed over the built index ≡ bm25TopK on the corpus") {
    val docs = (0L until 60L).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "spark", "merge")
      val text = (0 until (5 + (i % 7)).toInt)
        .map(j => words(((i + j) % words.length).toInt)).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val direct = Search.bm25TopK(docs, Seq("spark", "merge"), k = 15)
      .as[(Long, Double)].collect().toSeq
    val postings = Search.buildIndex(docs)
    val stats = Search.indexStats(postings)
    val indexed = Search.bm25TopKIndexed(postings, stats,
        Seq("spark", "merge"), k = 15)
      .as[(Long, Double)].collect().toSeq
    assert(indexed == direct && direct.nonEmpty)
    // the index is reusable: a second query over the same artifact
    val q2d = Search.bm25TopK(docs, Seq("delta"), k = 5)
      .as[(Long, Double)].collect().toSeq
    val q2i = Search.bm25TopKIndexed(postings, stats, Seq("delta"), k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(q2i == q2d)
  }

  test("rrfFuse: top-k cut and rank-not-score sensitivity") {
    // same ranking, wildly different score scales — fusion identical
    val a1 = Seq((1L, 100.0), (2L, 50.0)).toDF("doc_id", "score")
    val a2 = Seq((1L, 0.8), (2L, 0.1)).toDF("doc_id", "score")
    val b = Seq((2L, 1.0)).toDF("doc_id", "score")
    val f1 = Search.rrfFuse(Seq(a1, b), k = 1).as[(Long, Double)].collect()
    val f2 = Search.rrfFuse(Seq(a2, b), k = 1).as[(Long, Double)].collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.head._1 == 2L) // rank 2 + rank 1 beats rank 1 alone
  }
}
