package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.canon
import graft.ops.{Dedup, TextOps}
import graft.sites.{Sites, SyntheticWeb}

/** Physical-plan discipline: the properties that keep these operators
  * viable at 100 TB — filter pushdown into the parquet scan, column
  * pruning, broadcast joins for dims, whole-stage codegen around the
  * custom canonicalization expressions, and shuffle-free per-row ops.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def formatted(df: DataFrame): String = {
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("filters and projection push into the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val f = formatted(df)
    assert(f.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), f)
    // pruned read schema: only the two referenced columns
    assert(f.contains("l_orderkey") && f.contains("l_quantity"))
    assert(!f.contains("l_extendedprice"), "scan reads unprojected columns")
  }

  test("counties allow-list membership is a broadcast semi join (F4/J5)") {
    val spec = SyntheticWeb.Spec("us_counties", numPages = 20L)
    val links = spark.range(10)
      .select(concat(lit("/wiki/"),
        udf((i: Long) => SyntheticWeb.countyName(i)).apply(col("id"))).as("href"))
    val allow = SyntheticWeb.countiesAllowList(spark, spec)
    val joined = Sites.allowListSemiJoin(links, allow, Sites.usCounties)
    val p = plan(joined)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("custom canon expressions stay inside WholeStageCodegen") {
    val df = spark.read.parquet(s"$sfDir/part.parquet")
      .select(canon.clean_name(col("p_name"),
        "https://en.wikipedia.org", "", "/wiki/").as("n"),
        canon.canonical_url(col("p_name")).as("u"),
        canon.host_of(col("p_name")).as("h"))
    val p = plan(df)
    // executedPlan toString marks WholeStageCodegen stages with "*(n)"
    assert(p.contains("*(1) Project"), p)
    // and they are codegen'd expressions, not wrapped UDF invocations
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("per-row text ops add no shuffle (simhash/fingerprint/quality)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.select(col("doc_id"),
      TextOps.simhash(col("text")).as("s"),
      TextOps.fingerprintMinShingle(col("text")).as("f"))
    assert(!plan(df).contains("Exchange"), plan(df))
  }

  test("exact dedup shuffles 8-byte digests, not documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = formatted(Dedup.exactGroups(docs))
    assert(p.contains("xxhash64"), p)
    assert(p.contains("hashpartitioning("), p)
    // map-side combine before the exchange
    assert(p.contains("partial_min"), p)
    // the exchange's input carries the digest + partial aggs, not text
    val ex = p.indexOf(") Exchange")
    assert(ex > 0, p)
    val exchangeDetail = p.substring(ex, math.min(p.length, ex + 250))
    assert(!exchangeDetail.contains("text#"),
      s"exchange shuffles document text: $exchangeDetail")
  }

  test("brute-force kNN broadcasts the query side, never the corpus") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val scored = graft.ops.Similarity.bruteForceTopK(queries, emb, 3)
    val p = plan(scored)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("cosine near-dup candidate generation shuffles ids, not embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = plan(graft.ops.Similarity.cosineNearDups(emb, 0.3,
      nBits = 4, tables = 4))
    // the bucket grouping exchange carries (table_id, bucket, vec_id)
    // partial lists — embeddings join back only for surviving pairs
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty, p)
    val bucketExchanges = exchanges.filter(e =>
      e.contains("bucket") || e.contains("table_id"))
    assert(bucketExchanges.nonEmpty, s"no bucket exchange found: $exchanges")
    assert(!bucketExchanges.exists(_.contains("embedding")),
      s"bucket exchange ships embeddings: $bucketExchanges")
  }

  test("pageRank step: dangling scalar rides a broadcast 1-row join, contribs shuffle dst only") {
    val e = spark.range(0, 1000)
      .select(col("id").as("src"), ((col("id") * 7) % 900).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val degged = nodes.join(outDeg, nodes("node") === outDeg("src"), "left")
      .select(col("node"), col("deg")).localCheckpoint(true)
    val ranks = degged.withColumn("rank", lit(1.0 / 1000))
    val p = plan(graft.ops.GraphOps.pageRankStep(degged, e, 1000.0, 0.85, ranks))
    // the 1-row dangling aggregate must broadcast, not shuffle or
    // cartesian with the full rank table
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the contribution aggregation exchanges on the 8-byte dst key
    assert(p.contains("hashpartitioning(dst"), p)
  }

  test("cc round: symmetric view via explode, no self-union in the plan") {
    val e = spark.range(0, 100)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
      .localCheckpoint(true)
    val p = plan(graft.ops.GraphOps.ccRound(e))
    // two-rows-per-edge emits are Generate(explode), NOT a self-union
    // with swapped aliases (one pass instead of two; also the shape
    // that avoids Catalyst's union constraint-rewrite runtime failure)
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Union"), p)
    // star-contraction aggregations exchange on the 8-byte u key
    assert(p.contains("hashpartitioning(u"), p)
  }

  test("politeness cap windows partition by (host, salt) then host") {
    val pages = SyntheticWeb.pages(spark,
      SyntheticWeb.Spec("web", numPages = 50L)).toDF()
    val frontier = pages.select(col("url"))
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", lit(1)).withColumn("priority", lit(1L))
      .withColumn("seq", xxhash64(col("url")))
    import org.apache.spark.sql.expressions.Window
    val salted = frontier.withColumn("s", pmod(xxhash64(col("url")), lit(4)))
    val w1 = Window.partitionBy(col("host"), col("s")).orderBy(col("seq"))
    val capped = salted.withColumn("rn", row_number().over(w1)).filter(col("rn") <= 5)
    val p = plan(capped)
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(host"), p)
  }

  test("cdx latestCaptures: map-side-combinable max_by, no per-url window sort") {
    val dir = "/tmp/graft_cdx_plan_spec"
    if (!new java.io.File(dir, "cdx-00000.txt").exists())
      graft.sources.Cdx.writeSyntheticIndex(dir, nFiles = 2, perFile = 20)
    val latest = graft.sources.Cdx.latestCaptures(
      graft.sources.Cdx.readCaptures(spark, dir))
    val p = plan(latest)
    // partial aggregation before the url shuffle (the combiner is what
    // keeps this viable at 10^10 captures), and no window anywhere
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      (p.contains("max_by") && p.contains("HashAggregate")), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("hashpartitioning(url"), p)
  }

  test("sitemap urlset parse is per-row: no exchange anywhere in the plan") {
    import spark.implicits._
    val docs = Seq("<urlset><url><loc>https://a.test/x</loc></url></urlset>")
      .toDF("xml")
    val p = plan(graft.sources.Sitemaps.parseUrlset(docs, col("xml")))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("indexed BM25 query path: term filter at the scan, df broadcast, heap top-k") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, s"alpha beta w$i spark merge")).toDF("doc_id", "text")
    val dir = "/tmp/graft_bm25_postings_plan"
    graft.ops.Search.buildIndex(docs).write.mode("overwrite").parquet(dir)
    val postings = spark.read.parquet(dir)
    val stats = graft.ops.Search.indexStats(postings)
    val p = plan(graft.ops.Search.bm25TopKIndexed(postings, stats,
      Seq("spark", "merge"), k = 10))
    // the per-query work starts from a term-FILTERED postings read —
    // PushedFilters reach the parquet scan — never a corpus tokenize
    assert(p.contains("PushedFilters: [In(term"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Generate"), p) // no explode/tokenize at query time
  }

  test("stripTrackingParams / c4Filter stay per-row: no exchange, no UDF") {
    import spark.implicits._
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("https://h.test/p;jsessionid=A?x=1&utm_source=s#f"),
        col("id").cast("string")).as("url"),
      concat(lit("Some line of text here."), col("id").cast("string")).as("text"))
    val p1 = plan(docs.select(
      graft.ops.Curation.stripTrackingParams(col("url"))))
    val p2 = plan(docs.select(graft.ops.Curation.c4Filter(col("text"))))
    for (p <- Seq(p1, p2)) {
      assert(!p.contains("Exchange"), p)
      assert(!p.contains("ScalaUDF"), p)
    }
  }

  test("cdx fetchPlan: one filename shuffle reused by the span window and agg") {
    val dir = "/tmp/graft_cdx_plan_spec"
    if (!new java.io.File(dir, "cdx-00000.txt").exists())
      graft.sources.Cdx.writeSyntheticIndex(dir, nFiles = 2, perFile = 20)
    val caps = graft.sources.Cdx.readCaptures(spark, dir)
    val planOut = graft.sources.Cdx.fetchPlan(
      caps.filter(col("http_status") === 200))
    val p = plan(planOut)
    // exactly one exchange: the window's (filename) partitioning also
    // satisfies the groupBy(filename, span) aggregation
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(filename"), p)
  }
}
