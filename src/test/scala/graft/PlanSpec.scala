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
}
