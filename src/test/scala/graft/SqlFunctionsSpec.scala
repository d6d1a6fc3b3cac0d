package graft

import org.apache.spark.sql.functions._

import graft.functions.{canon, texthash, SqlFunctions}
import graft.ops.Similarity

/** The SQL registration surface: every custom expression callable
  * from plain spark.sql must equal its Column-API twin.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  SqlFunctions.register(spark)

  test("SQL shingle_hash64 / nfc_normalize / repetition_stats ≡ Column API") {
    val df = Seq((0L, "a b a b c"), (1L, "x ﬁé"), (2L, "solo"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, shingle_hash64(text, 2) AS sh,
        | nfc_normalize(text) AS nfc,
        | repetition_stats(text, 2).n_grams AS ng,
        | repetition_stats(text, 2).dup AS dup
        |FROM sqlfn_docs""".stripMargin)
      .as[(Long, Seq[Long], String, Long, Long)].collect().toSet
    val viaCols = df.select(col("doc_id"),
        texthash.shingle_hash64(col("text"), 2).as("sh"),
        texthash.nfc_normalize(col("text")).as("nfc"),
        texthash.repetition_stats(col("text"), 2).getField("n_grams").as("ng"),
        texthash.repetition_stats(col("text"), 2).getField("dup").as("dup"))
      .as[(Long, Seq[Long], String, Long, Long)].collect().toSet
    assert(viaSql == viaCols && viaSql.nonEmpty)
  }

  test("SQL dot_product / clean_name / canonical_url / host_of ≡ Column API") {
    val df = Seq((
      Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f),
      "/wiki/Ab_C%C3%A9", "HTTP://ShOP.Example.COM:80/x?b=2&a=1#f"))
      .toDF("a", "b", "link", "url")
    df.createOrReplaceTempView("sqlfn_rows")
    val viaSql = spark.sql(
      """SELECT dot_product(a, b) AS dp,
        | clean_name(link, 'https://en.wikipedia.org', '', '/wiki/') AS nm,
        | canonical_url(url) AS cu, host_of(url) AS h
        |FROM sqlfn_rows""".stripMargin)
      .as[(Double, String, String, String)].head()
    val viaCols = df.select(
        Similarity.dot(col("a"), col("b")).as("dp"),
        canon.clean_name(col("link"), "https://en.wikipedia.org", "", "/wiki/").as("nm"),
        canon.canonical_url(col("url")).as("cu"),
        canon.host_of(col("url")).as("h"))
      .as[(Double, String, String, String)].head()
    assert(viaSql == viaCols)
    assert(viaSql._2 == "ab cé" && viaSql._4 == "shop.example.com")
  }

  test("literal-parameter contract: non-literal n is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hash64('a b', cast(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"),
      e.getMessage)
  }

  test("GraftExtensions injects the same function set at session build time") {
    // the extensions path can't rebuild the shared test session; assert
    // the injection list applies cleanly and covers every SQL function
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(SqlFunctions.all.map(_._1.funcName).sorted == Seq(
      "canonical_url", "clean_name", "dot_product", "gopher_stats",
      "host_of", "md5_minhash_sig", "md5_simhash", "min_md5_shingle",
      "nfc_normalize", "public_suffix", "reg_domain",
      "repetition_stats", "shingle_hash64"))
  }

  test("SQL md5_minhash_sig / md5_simhash ≡ Column API") {
    val df = Seq((0L, "a b c d e f"), (1L, "x"), (2L, "one two three"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sqlfn_md5")
    val viaSql = spark.sql(
      """SELECT doc_id, md5_minhash_sig(text, 3, 4) AS sig,
        | md5_simhash(text) AS fp FROM sqlfn_md5""".stripMargin)
      .as[(Long, Seq[Long], Long)].collect().toSet
    val viaCols = df.select(col("doc_id"),
        texthash.md5_minhash_sig(col("text"), 3, 4).as("sig"),
        texthash.md5_simhash(col("text")).as("fp"))
      .as[(Long, Seq[Long], Long)].collect().toSet
    assert(viaSql == viaCols && viaSql.nonEmpty)
  }

  test("SQL gopher_stats ≡ Column API") {
    val df = Seq((0L, "The cat and dog have fun with that ball of yarn."),
      (1L, "# # # short"), (2L, "")).toDF("doc_id", "text")
    df.createOrReplaceTempView("gopher_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, gopher_stats(text, 5, 100000).n_words AS nw,
        | gopher_stats(text, 5, 100000).hash_bp AS hb,
        | gopher_stats(text, 5, 100000).stop_hits AS sh,
        | gopher_stats(text, 5, 100000).keep AS k
        |FROM gopher_docs""".stripMargin)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val viaCols = df.select(col("doc_id"),
        texthash.gopher_stats(col("text"), 5, 100000).getField("n_words").as("nw"),
        texthash.gopher_stats(col("text"), 5, 100000).getField("hash_bp").as("hb"),
        texthash.gopher_stats(col("text"), 5, 100000).getField("stop_hits").as("sh"),
        texthash.gopher_stats(col("text"), 5, 100000).getField("keep").as("k"))
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(viaSql == viaCols && viaSql.nonEmpty)
  }

  test("SQL reg_domain / public_suffix ≡ Column API") {
    graft.functions.SqlFunctions.register(spark)
    val rules = Seq("com", "co.uk", "*.ck", "!www.ck")
    val hosts = Seq("a.example.com", "x.site.co.uk", "foo.w.ck",
      "sub.www.ck", "bar.zz")
    import spark.implicits._
    val df = hosts.toDF("host")
    df.createOrReplaceTempView("hosts_v")
    val viaSql = spark.sql(
      "SELECT reg_domain(host, 'com,co.uk,*.ck,!www.ck') AS r, " +
        "public_suffix(host, 'com,co.uk,*.ck,!www.ck') AS p FROM hosts_v")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val viaCol = df.select(
        graft.functions.canon.reg_domain(col("host"), rules).as("r"),
        graft.functions.canon.public_suffix(col("host"), rules).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaCol.toSeq == Seq(
      ("example.com", "com"), ("site.co.uk", "co.uk"),
      ("foo.w.ck", "w.ck"), ("www.ck", "ck"), ("bar.zz", "zz")))
  }
}
