package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.CrawlEngine
import graft.functions.{canon, Extract}
import graft.model.CrawlConfig
import graft.ops.{Bpe, Classifier, Curation, Dedup, Events, Multimodal, Search, Similarity, TextOps}
import graft.sites.{Sites, SyntheticWeb}
import graft.state.Store

/** Driver contract — one `queries` entry per operator from SURVEY.md
  * §2 (+ the training-data ops), each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible. Non-SQL ops (LSH, simhash,
  * crawl loop) get rows-only checks here and full oracles in the
  * ScalaTest suites (BFS oracle, recall-vs-exact checks).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: end-to-end crawl on the deterministic synthetic
    * corpus — edges joined back to node names. Corpus size is fixed
    * (independent of sf) so the driver smoke check is cheap; Bench has
    * its own scaled corpus.
    */
  private def crawlEdges(s: SparkSession, site: String, numPages: Long): DataFrame = {
    val spec = SyntheticWeb.Spec(site, numPages = numPages, seed = 42L)
    val profile = Sites.all(site)
    val pages = SyntheticWeb.pages(s, spec).toDF()
    val allowList =
      if (profile.usesAllowList) Some(SyntheticWeb.countiesAllowList(s, spec))
      else None
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = CrawlConfig(site = site, batchSize = 64,
      numShards = 8, bloomItemsPerShard = 1 << 14)
    val eng = new CrawlEngine(s, new Store(root, s), profile, cfg, pages, allowList)
    eng.seed(Seq(SyntheticWeb.pageUrl(spec, 0L)))
    eng.run()
    // id→name readout with the reference's reverse-lookup error
    // contract (db/db_test.go:339-368): a dangling edge endpoint
    // raises loudly instead of silently dropping the edge
    val nodes = eng.store.read("nodes").get
    eng.store.read("edges").get
      .join(nodes.withColumnRenamed("name", "src_name")
        .withColumnRenamed("id", "src"), Seq("src"), "left")
      .join(nodes.withColumnRenamed("name", "dst_name")
        .withColumnRenamed("id", "dst"), Seq("dst"), "left")
      .select(
        CrawlEngine.resolvedIdOrError(col("src_name"), col("src")).as("src_name"),
        CrawlEngine.resolvedIdOrError(col("dst_name"), col("dst")).as("dst_name"))
  }

  def entry(spark: SparkSession): DataFrame = crawlEdges(spark, "wikipedia", 60L)

  /** DuckDB oracle for the flagship crawls: the synthetic corpus's
    * valid-link list (extraction itself is oracled by ScanLinksSpec/
    * HtmlSpec against DOM semantics) is inlined as VALUES, and DuckDB
    * independently recomputes the crawl — reachability from the seed
    * as a recursive CTE, edge set as links whose source was fetched —
    * so the engine's frontier/dedup/first-discovery machinery is
    * checked by a foreign implementation, not by itself.
    */
  private def crawlOracle(site: String, numPages: Long): String = {
    val spec = SyntheticWeb.Spec(site, numPages = numPages, seed = 42L)
    val profile = Sites.all(site)
    def clean(s: String) =
      graft.functions.GoUrl.cleanName(s, profile.base, profile.altBase, profile.prefix)
    def lower(s: String) = graft.functions.GoUrl.goToLower(s)
    def isValid(h: String): Boolean = {
      val structural =
        if (site == "us_counties") lower(h).contains("_county,_")
        else h.startsWith(profile.prefix) && !h.contains(":") && !h.contains("#")
      val notMain = site != "wikipedia" || lower(h) != "/wiki/main_page"
      val notReject =
        profile.rejectPrefix.isEmpty || !h.startsWith(profile.rejectPrefix)
      notReject && structural && notMain
    }
    // allowListSemiJoin key (counties.go:31-46): href minus prefix, lowered
    def allowKey(h: String) =
      lower(if (h.startsWith(profile.prefix)) h.substring(profile.prefix.length) else h)
    val links = (0L until numPages).flatMap { i =>
      val html = SyntheticWeb.htmlFor(spec, i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val src = clean(SyntheticWeb.pageUrl(spec, i))
      graft.functions.Extract.links(html, site).filter(isValid)
        .map(h => (src, clean(h), allowKey(h)))
    }.distinct
    val linkValues = links
      .map { case (s, d, k) => s"('$s','$d','$k')" }.mkString(", ")
    val seedName = clean(SyntheticWeb.pageUrl(spec, 0L))
    val allowCte =
      if (!profile.usesAllowList) ""
      else {
        val names = (0L until numPages).filter(_ % 2 == 0)
          .map(i => s"('${lower(SyntheticWeb.countyName(i))}')").mkString(", ")
        s" a(name) AS (VALUES $names),\n"
      }
    val linkSource =
      if (profile.usesAllowList)
        "SELECT l0.src_name, l0.dst_name FROM l0 JOIN a ON l0.allow_key = a.name"
      else "SELECT src_name, dst_name FROM l0"
    s"""WITH RECURSIVE l0(src_name, dst_name, allow_key) AS (VALUES $linkValues),
       |$allowCte l AS ($linkSource),
       | r(name) AS (SELECT '$seedName' UNION
       |   SELECT l.dst_name FROM r JOIN l ON l.src_name = r.name)
       |SELECT DISTINCT l.src_name, l.dst_name FROM l JOIN r ON l.src_name = r.name"""
      .stripMargin
  }

  // ---- shared builders (Spark side and oracle side stay in sync) ----

  private val enStops = TextOps.stopwords("en")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1: CleanUrl canonicalization kernel (wikipedia/wiki.go:63-75)
    "q_clean_name" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        canon.clean_name(
          concat(lit("https://en.wikipedia.org/wiki/"),
            regexp_replace(col("p_name"), " ", "_")),
          "https://en.wikipedia.org", "", "/wiki/").as("name"))
    }),

    // north_rule URL canonicalization: lowercase scheme/host, strip
    // default port + fragment, sort query params
    "q_canonical_url" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        canon.canonical_url(
          concat(lit("HTTPS://ShOP.Example.COM:443/o/"),
            col("o_orderkey").cast("string"),
            lit("?z="), col("o_custkey").cast("string"), lit("&a=1#frag")))
          .as("url"))
    }),

    "q_host_of" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        canon.host_of(
          concat(lit("https://H"), (col("c_nationkey") % 7).cast("string"),
            lit(".Example.org:8080/path?q=1"))).as("host"))
    }),

    // F1: wikipedia IsValidCrawlLink predicate (wiki.go:24-29)
    "q_valid_link_wiki" -> ((s, dir) => {
      val profile = Sites.wikipedia
      val href = when(pmod(col("p_partkey"), lit(5)) === 0,
        concat(lit("/wiki/"), regexp_replace(col("p_name"), " ", "_")))
        .when(pmod(col("p_partkey"), lit(5)) === 1, lit("/wiki/Main_Page"))
        .when(pmod(col("p_partkey"), lit(5)) === 2,
          concat(lit("/wiki/Category:"), regexp_replace(col("p_name"), " ", "_")))
        .when(pmod(col("p_partkey"), lit(5)) === 3,
          concat(lit("/wiki/"), regexp_replace(col("p_name"), " ", "_"), lit("#sec")))
        .otherwise(lit("https://off.example.com/x"))
      t(s, dir, "part").select(col("p_partkey"), href.as("href"))
        .filter(profile.isValidLink(col("href")))
    }),

    // §2.8 frontier ordering: global sort + limit (TakeOrderedAndProject)
    "q_frontier_order" -> ((s, dir) => {
      t(s, dir, "events")
        .orderBy(col("value").desc, col("ts").asc, col("event_id").asc)
        .limit(100)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    }),

    // A4: per-host politeness cap as a grouped top-k window
    "q_politeness_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("ts"), col("rn"))
    }),

    // A4 variable: per-host budgets from robots Crawl-delay — the
    // exact salted cap with a per-host budget join, DuckDB-verified
    // (budgets are arithmetic in user_id so the oracle recomputes
    // them; the windowSec/delay clamp runs through budgetsFromDelays)
    "q_politeness_delay" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id").as("host"), col("event_id").as("url"),
          col("ts"), col("event_id"))
      val delays = ev.select(col("host")).distinct()
        .withColumn("crawl_delay", lit(1.0) + pmod(col("host"), lit(4)))
      val budgets = graft.engine.Politeness
        .budgetsFromDelays(delays, windowSec = 6.0, maxBudget = 3)
      graft.engine.Politeness
        .capPerHostBudgets(ev, budgets, defaultBudget = 3, salt = 4,
          ordering = Seq(col("ts").asc, col("event_id").asc))
        .select(col("host").as("user_id"), col("event_id"), col("ts"))
    }),

    // J3/S5: only-new-edges anti-join dedup (db/db_test.go:259-287)
    "q_edge_dedup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val candidates = li.select(col("l_orderkey").as("src"),
        col("l_partkey").as("dst")).distinct()
      val existing = li.filter(col("l_linenumber") === 1)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      candidates.join(existing, Seq("src", "dst"), "left_anti")
    }),

    // S6/J1: name-dictionary upsert — new names only (db/db.go:65-105)
    "q_node_upsert" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val existing = c.filter(col("c_custkey") <= 100).select(col("c_name"))
      c.filter(col("c_acctbal") > 0).select(col("c_name"))
        .join(existing, Seq("c_name"), "left_anti")
        .select(col("c_name").as("name")).distinct()
    }),

    // J6/S1: frontier ⋈ corpus fetch join
    "q_fetch_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
    }),

    // F6: unfetchable side of the fetch join → error sink. The frontier
    // carries both resolvable keys and synthetic misses (key+5000000)
    // so the anti side is provably non-empty.
    "q_fetch_errors" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val frontier = c.select(col("c_custkey"))
        .union(c.select((col("c_custkey") + 5000000).as("c_custkey")))
      frontier
        .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"))
    }),

    // S2: first-discovery-wins recursion (min struct per key)
    "q_first_discovery" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(min(struct(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))).as("f"))
        .select(col("l_partkey"), col("f.l_shipdate").as("l_shipdate"),
          col("f.l_orderkey").as("l_orderkey"),
          col("f.l_linenumber").as("l_linenumber"))
    }),

    // A1-A3: per-batch metrics aggregation shape
    "q_metrics_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("pages"),
          sum(col("l_quantity")).as("qty"),
          max(col("l_shipdate")).as("max_ship"))
    }),

    // S8: deterministic seed pick (ORDER BY digest LIMIT 1)
    "q_seed_pick" -> ((s, dir) => {
      t(s, dir, "customer")
        .orderBy(md5(col("c_name")), col("c_name"))
        .limit(1).select(col("c_name").as("word"))
    }),

    // streaming-surface shape: event-time hourly windows
    "q_event_windows" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
    }),

    // ---- training-data ops over documents/embeddings ----

    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"))
        .select(col("keep_id"), col("n_dups"))),

    "q_token_count" -> ((s, dir) => TextOps.tokenCounts(t(s, dir, "documents"))),

    "q_quality" -> ((s, dir) => TextOps.qualityScore(t(s, dir, "documents"))),

    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_guess"))),

    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.fingerprintMinShingle(col("text")).as("fp"))),

    "q_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), shingleN = 3, threshold = 0.8)),

    // ---- dataset-curation ops: deterministic splits / stratified
    //      sampling / normalization / PII redaction / rollups ----

    "q_split" -> ((s, dir) =>
      Curation.assignSplits(t(s, dir, "documents"))
        .select(col("doc_id"), col("bucket"), col("split"))),

    "q_sample_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(t(s, dir, "documents"), "lang", k = 20)
        .select(col("doc_id"), col("lang"), col("rk"))),

    // non-NFC input is synthesized in-query (the corpus text is ASCII,
    // where NFC is the identity) so the oracle checks real composition
    "q_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Curation.normalizeText(
          concat(col("text"), lit(" café  Å\tx "))).as("norm"))),

    // PII is synthesized in-query the same way — deterministic fake
    // emails/IPs/account numbers derived from doc_id on BOTH sides
    "q_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Curation.redactPii(concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.org from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".77 acct 9"),
          lpad(pmod(col("doc_id"), lit(100000)).cast("string"), 11, "0")))
          .as("redacted"))),

    // eTLD+1 extraction: five arithmetic host families hit each rule
    // type (exact, multi-label exact, wildcard, exception, implicit
    // default) — the oracle recomputes both columns by CASE arithmetic
    "q_reg_domain" -> ((s, dir) => {
      val rules = Seq("com", "co.uk", "*.ck", "!www.ck", "org")
      val k = col("c_custkey")
      val host = when(pmod(k, lit(5)) === 0,
          concat(lit("a"), k.cast("string"), lit(".example.com")))
        .when(pmod(k, lit(5)) === 1,
          concat(lit("b"), k.cast("string"), lit(".site.co.uk")))
        .when(pmod(k, lit(5)) === 2,
          concat(lit("c"), k.cast("string"), lit(".w"),
            pmod(k, lit(3)).cast("string"), lit(".ck")))
        .when(pmod(k, lit(5)) === 3, lit("sub.www.ck"))
        .otherwise(concat(lit("d"), k.cast("string"), lit(".foo.zz")))
      t(s, dir, "customer").select(k.as("doc_id"), host.as("host"),
        canon.public_suffix(host, rules).as("ps"),
        canon.reg_domain(host, rules).as("reg"))
    }),

    // domain-blocklist filter: hosts synthesized from customer keys on
    // BOTH sides; Spark runs the suffix-chain equi-join, the oracle a
    // plain suffix predicate join — every (doc, matched domain) row
    "q_domain_block" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "customer").select(
        col("c_custkey").as("doc_id"),
        concat(lit("https://W"), pmod(col("c_custkey"), lit(5)).cast("string"),
          lit(".h"), pmod(col("c_nationkey"), lit(7)).cast("string"),
          lit(".Example.org/p?x=1")).as("url"))
      val bl = Seq("h3.example.org", "w1.h5.example.org", "EXAMPLE.NET ")
        .toDF("domain")
      Curation.blockedByDomain(docs, bl)
    }),

    "q_domain_keep" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "customer").select(
        col("c_custkey").as("doc_id"),
        concat(lit("https://W"), pmod(col("c_custkey"), lit(5)).cast("string"),
          lit(".h"), pmod(col("c_nationkey"), lit(7)).cast("string"),
          lit(".Example.org/p?x=1")).as("url"))
      val bl = Seq("h3.example.org", "w1.h5.example.org").toDF("domain")
      Curation.dropBlockedDomains(docs, bl)
    }),

    // URL-level quality features: arithmetic urls on both sides;
    // every field integer-exact (digit share in basis points)
    "q_url_features" -> ((s, dir) => {
      val k = col("c_custkey")
      val url = concat(lit("https://w"), pmod(k, lit(5)).cast("string"),
        lit(".h"), pmod(k, lit(7)).cast("string"), lit(".example.org/d"),
        pmod(k, lit(9)).cast("string"),
        when(pmod(k, lit(11)) === 0, lit("/casino/bonus")).otherwise(lit("/page")),
        lit("?x="), pmod(k, lit(100)).cast("string"),
        when(pmod(k, lit(2)) === 0, lit("&y=1")).otherwise(lit("")))
      val f = Curation.urlFeatures(url, Seq("casino", "bet"))
      t(s, dir, "customer").select(k.as("doc_id"),
        f.getField("url_len").cast("long").as("url_len"),
        f.getField("host_labels").cast("long").as("host_labels"),
        f.getField("path_depth").cast("long").as("path_depth"),
        f.getField("n_params").cast("long").as("n_params"),
        f.getField("digit_bp").cast("long").as("digit_bp"),
        f.getField("spam_hits").cast("long").as("spam_hits"))
    }),

    // C4 line/doc filtering over arithmetically-constructed multi-line
    // text (the synthetic word-soup docs carry no lines/punctuation, so
    // both engines build the same rule-hitting document from doc_id)
    "q_c4_lines" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val text = concat(
        concat_ws("\n",
          concat(col("text").substr(lit(1), pmod(k, lit(60)) + lit(20)),
            when(pmod(k, lit(3)) === 0, lit("."))
              .when(pmod(k, lit(3)) === 1, lit("!")).otherwise(lit(""))),
          lit("too short."),
          lit("Please enable javascript to continue reading this page."),
          concat(col("text").substr(lit(1), pmod(k, lit(40)) + lit(15)),
            when(pmod(k, lit(5)) === 0, lit("?"))
              .when(pmod(k, lit(5)) === 1, lit("\"")).otherwise(lit(".")))),
        when(pmod(k, lit(17)) === 0, lit("\nLorem ipsum dolor sit amet."))
          .otherwise(lit("")),
        when(pmod(k, lit(19)) === 0, lit("\ncode { block }"))
          .otherwise(lit("")))
      val c = graft.ops.Curation.c4Filter(text)
      d.select(k.as("doc_id"),
        c.getField("kept_text").as("kept_text"),
        c.getField("n_lines_kept").as("n_lines_kept"),
        c.getField("n_sentences").as("n_sentences"),
        c.getField("keep").cast("long").as("keep"))
    }),

    // Gopher quality rules over constructed rule-hitting text: every
    // metric integer-exact (basis points / centi-chars)
    "q_gopher" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val text = concat(
        col("text").substr(lit(1), pmod(k, lit(200)) + lit(10)),
        when(pmod(k, lit(4)) === 0, lit(" the of and that have"))
          .when(pmod(k, lit(4)) === 1, lit(" the be")).otherwise(lit("")),
        when(pmod(k, lit(7)) === 0, lit(" # # price #")).otherwise(lit("")),
        when(pmod(k, lit(11)) === 0, lit(" read more... and more..."))
          .otherwise(lit("")),
        when(pmod(k, lit(13)) === 0,
          lit("\n• the first item\n• of the second\nthe closing line ..."))
          .otherwise(lit("")),
        when(pmod(k, lit(23)) === 0, lit(" 111 222 333 444 555 666 777"))
          .otherwise(lit("")))
      val g = graft.ops.Curation.gopherQuality(text, minWords = 10)
      d.select(k.as("doc_id"),
        g.getField("n_words").as("n_words"),
        g.getField("mean_wl_c100").as("mean_wl_c100"),
        g.getField("hash_bp").as("hash_bp"),
        g.getField("ellipsis_bp").as("ellipsis_bp"),
        g.getField("bullet_line_bp").as("bullet_line_bp"),
        g.getField("ellipsis_line_bp").as("ellipsis_line_bp"),
        g.getField("alpha_word_bp").as("alpha_word_bp"),
        g.getField("stop_hits").as("stop_hits"),
        g.getField("keep").cast("long").as("keep"))
    }),

    // tracking/session-id URL hygiene: jsessionid strip + campaign
    // param drop over arithmetically constructed urls
    "q_strip_tracking" -> ((s, dir) => {
      val k = col("c_custkey")
      val url = concat(
        lit("https://h"), pmod(k, lit(7)).cast("string"), lit(".test/p"),
        k.cast("string"),
        when(pmod(k, lit(3)) === 0,
          concat(lit(";jsessionid=S"), k.cast("string"))).otherwise(lit("")),
        // the k%9==5 rows carry NO real query — their only '?' lives
        // inside the fragment (the bug class the anchored regex fixes)
        when(pmod(k, lit(9)) === 5, lit("")).otherwise(concat(
          lit("?a="), pmod(k, lit(5)).cast("string"),
          when(pmod(k, lit(2)) === 0,
            concat(lit("&utm_source=s"), k.cast("string"))).otherwise(lit("")),
          when(pmod(k, lit(4)) === 1, lit("&gclid=g")).otherwise(lit("")),
          when(pmod(k, lit(6)) === 2, lit("&keep=v")).otherwise(lit("")))),
        when(pmod(k, lit(9)) === 0, lit("#sec"))
          .when(pmod(k, lit(9)) === 5, lit("#/r?page=2")) // SPA hash route: '?' inside fragment is NOT a query
          .otherwise(lit("")))
      t(s, dir, "customer").select(k.as("doc_id"),
        graft.ops.Curation.stripTrackingParams(url).as("url_clean"))
    }),

    // crawl-priority feedback: integer-valued host ranks → equal-count
    // frontier tiers; hosts h25..h29 are unranked → default tier
    "q_rank_tiers" -> ((s, dir) => {
      val ranks = t(s, dir, "nation").select(
        concat(lit("h"), col("n_nationkey").cast("string"), lit(".test"))
          .as("node"),
        (pmod(col("n_nationkey"), lit(7)) + lit(1)).cast("double").as("rank"))
      val urls = t(s, dir, "customer").select(
        concat(lit("https://h"), pmod(col("c_custkey"), lit(30)).cast("string"),
          lit(".test/p"), col("c_custkey").cast("string")).as("url"))
      graft.ops.GraphOps.rankToSeedTiers(ranks, urls, nTiers = 4,
        quantize = r => r)
    }),

    // deterministic epoch-keyed training shuffle: shard AND in-shard
    // position are pure LCG arithmetic a foreign engine recomputes
    "q_shuffle" -> ((s, dir) =>
      graft.ops.Curation.shuffleShards(
          t(s, dir, "documents").select(col("doc_id")), shards = 8, epoch = 1)
        .select(col("doc_id"), col("shard").cast("long").as("shard"),
          col("pos"))),

    // multi-dump latest-wins merge keyed by CANONICAL url: dump 1
    // re-captures urls 50..149 a day later under un-canonical
    // spellings (upper scheme/host, default port, permuted params) —
    // the merge must still collapse them onto dump 0's rows
    "q_merge_snapshots" -> ((s, _) => {
      val d0 = s.range(200).select(
        concat(lit("https://m"), pmod(col("id"), lit(4)).cast("string"),
          lit(".test/p"), col("id").cast("string"), lit("?a=1&b=2")).as("url"),
        expr("timestamp'2024-01-01 00:00:00' + id * interval 1 minute")
          .as("warc_ts"),
        concat(lit("v0-"), col("id").cast("string")).cast("binary").as("html"))
      val d1 = s.range(50, 150).select(
        concat(lit("HTTPS://M"), pmod(col("id"), lit(4)).cast("string"),
          lit(".test:443/p"), col("id").cast("string"), lit("?b=2&a=1")).as("url"),
        expr("timestamp'2024-01-02 00:00:00' + id * interval 1 minute")
          .as("warc_ts"),
        concat(lit("v1-"), col("id").cast("string")).cast("binary").as("html"))
      graft.sources.Warc.mergeSnapshots(d0.union(d1))
        .select(col("url"), col("warc_ts"),
          decode(col("html"), "UTF-8").as("payload"))
    }),

    "q_corpus_stats" -> ((s, dir) =>
      Curation.corpusStats(t(s, dir, "documents"))),

    "q_vocab" -> ((s, dir) =>
      Curation.topVocab(t(s, dir, "documents"), k = 20)),

    // benchmark decontamination: the "eval set" is the deterministic
    // doc_id % 50 == 0 slice of the corpus itself (no external data)
    "q_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.decontaminate(docs, docs.filter(pmod(col("doc_id"), lit(50)) === 0))
    }),

    "q_unigram_ll" -> ((s, dir) =>
      Curation.unigramLogLik(t(s, dir, "documents"))),

    "q_bigram_ll" -> ((s, dir) =>
      Curation.bigramLogLik(t(s, dir, "documents"))),

    // 5-gram stupid-backoff LM scoring (KenLM's order in CCNet):
    // model fit on the doc_id%7==0 reference slice — fitting on a
    // SEPARATE corpus is what makes backoff live — scored over the
    // full table; hashed grams (md5 buckets) keep it foreign-
    // recomputable and gram strings off the shuffle
    "q_ngram_ll" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.ngramLogLik(docs, docs.filter(col("doc_id") % 7 === 0),
        n = 5, buckets = 1 << 16, alpha = 0.4)
    }),

    // DSIR importance resampling: target = every 7th doc (a
    // deterministic "domain" both engines can name), raw = the rest
    // CCNet head/middle/tail tiers over the unigram-LM score
    "q_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = Curation.unigramLogLik(docs)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("avg_ll").as("score"))
      Curation.scoreBuckets(scored)
    }),

    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.importanceWeights(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0), buckets = 1 << 16)
    }),

    "q_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.selectByImportance(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0), k = 50,
        buckets = 1 << 16, gumbel = true)
    }),

    // hashed-feature logistic quality classifier: 2 full-batch GD
    // iterations (label: lang = 'en'); DuckDB re-runs the whole
    // training recurrence — feature hashing, closed-form first step,
    // sigmoid margins, gradient update — so the distributed GD is
    // pinned by a foreign implementation end-to-end
    "q_classifier_train" -> ((s, dir) =>
      Classifier.trainLogistic(t(s, dir, "documents"),
        (col("lang") === "en").cast("double"),
        buckets = 1 << 16, iters = 2, lr = 10.0)
        .select(col("bucket"), round(col("w"), 8).as("w_r"))),

    "q_classifier_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = Classifier.trainLogistic(docs,
        (col("lang") === "en").cast("double"),
        buckets = 1 << 16, iters = 2, lr = 10.0)
      Classifier.scoreLogistic(docs, w, buckets = 1 << 16)
        .select(col("doc_id"), round(col("prob"), 4).as("prob_r"))
    }),

    "q_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(t(s, dir, "documents"))),

    // hybrid retrieval: BM25 lexical run over documents + dense
    // cosine run over embeddings (one query vector), fused by
    // reciprocal rank — DuckDB recomputes both runs AND the fusion
    "q_hybrid_rrf" -> ((s, dir) => {
      val lex = Search.bm25TopK(t(s, dir, "documents"),
        Seq("spark", "window", "merge"), 30)
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") === 3)
            .select(col("vec_id").as("query_id"), col("embedding")),
          emb, k = 30)
        .select(col("vec_id").as("doc_id"), col("sim").as("score"))
      Search.rrfFuse(Seq(lex, dense), k = 20)
    }),

    // crawler-trap detection: one synthetic trap host (500 urls over
    // 5 payloads) against 7 healthy hosts (1 url per payload)
    "q_trap_hosts" -> ((s, dir) => {
      val k = col("c_custkey")
      val host = when(pmod(k, lit(3)) === 0, lit("trap.cal.test"))
        .otherwise(concat(lit("ok"), pmod(k, lit(7)).cast("string"),
          lit(".test")))
      val payload = when(pmod(k, lit(3)) === 0,
          concat(lit("cal-"), pmod(k, lit(5)).cast("string")))
        .otherwise(concat(lit("pg-"), k.cast("string")))
      val pages = t(s, dir, "customer").select(
        concat(lit("https://"), host, lit("/p"), k.cast("string")).as("url"),
        payload.cast("binary").as("html"))
      Curation.trapHosts(pages, minUrls = 100, minRatio = 10.0)
    }),

    "q_bm25" -> ((s, dir) =>
      Search.bm25TopK(t(s, dir, "documents"),
        Seq("spark", "window", "merge"), k = 20)),

    // same query through the materialized postings artifact — the
    // build-once serving path; oracle = the same BM25 SQL
    "q_bm25_indexed" -> ((s, dir) => {
      val postings = Search.buildIndex(t(s, dir, "documents"))
      Search.bm25TopKIndexed(postings, Search.indexStats(postings),
        Seq("spark", "window", "merge"), k = 20)
    }),

    // paragraph dedup needs multi-paragraph docs; derive them
    // deterministically by treating the filler token " a " as the
    // paragraph break (both engines apply the same replace)
    "q_para_dedup" -> ((s, dir) =>
      Curation.dropDupParagraphs(
        t(s, dir, "documents")
          .withColumn("text", regexp_replace(col("text"), " a ", "\n")))),

    "q_sessions" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), gapMinutes = 360)),

    "q_dup_windows" -> ((s, dir) =>
      Dedup.duplicatedWindowStats(t(s, dir, "documents"), n = 5)),

    // the removal side of exact-substring dedup: keep-first window
    // semantics, hash-verified — DuckDB recomputes keeper/removal
    // over gram STRINGS while Spark works over ShingleHash64 longs,
    // so the packed-key keeper pick, span merge, and token rebuild
    // are all pinned by a foreign implementation
    "q_drop_dup_spans" -> ((s, dir) =>
      Dedup.dropDuplicatedSpans(t(s, dir, "documents"), n = 5)),

    // boilerplate removal over REAL HTML, foreign-verified like the
    // WARC/media queries: the pages carry nav/footer link bars and a
    // short block around content paragraphs whose text is arithmetic
    // in the id, so DuckDB recomputes the expected extraction from
    // range() while Spark runs the actual DOM parse + jusText-style
    // paragraph classifier — a mis-parse, wrong block boundary, or
    // density misclassification breaks the hash
    "q_main_content" -> ((s, _) => {
      def para(j: Int) = concat(
        lit("<p>the quick brown fox of document "),
        col("id").cast("string"),
        lit(s" jumps over the lazy dog in section $j and the words" +
          " keep it prose</p>"))
      val pages = s.range(200).select(col("id").as("doc_id"),
        concat(
          lit("<html><head><title>t</title></head><body>" +
            "<nav><a href='/'>home</a> <a href='/about'>about us</a> " +
            "<a href='/contact'>contact page</a></nav>"),
          para(0),
          when(pmod(col("id"), lit(3)) >= 1, para(1)).otherwise(lit("")),
          when(pmod(col("id"), lit(3)) >= 2, para(2)).otherwise(lit("")),
          lit("<div>tiny</div><footer><a href='/terms'>terms</a> " +
            "<a href='/privacy'>privacy</a></footer></body></html>"))
          .as("html"))
      graft.ops.Boilerplate.mainContent(pages)
    }),

    // anchor-text rollup: Spark runs the REAL DOM parse (nested
    // markup flattened, &amp; decoded, whitespace normalized, the
    // href-less anchor and the script-wrapped anchor both excluded)
    // while DuckDB recomputes every (href, text) pair and the full
    // rollup arithmetically from range() — a mis-parse, a wrong
    // normalization, or a nondeterministic top-text tie-break breaks
    // the hash
    "q_anchor_stats" -> ((s, _) => {
      def tgt(k: Int) = pmod(col("id") + lit(1 + k), lit(200)).cast("string")
      def a(k: Int) = concat(lit("<a href=\"/p"), tgt(k),
        lit("\">t"), tgt(k), lit("</a>"))
      val hub = pmod(col("id"), lit(10)).cast("string")
      val pages = s.range(200).select(
        concat(lit("https://site.test/p"), col("id").cast("string")).as("url"),
        concat(
          lit("<html><body><a name=\"x\">skip</a>"),
          a(0),
          when(pmod(col("id"), lit(3)) >= 1, a(1)).otherwise(lit("")),
          when(pmod(col("id"), lit(3)) >= 2, a(2)).otherwise(lit("")),
          lit("<a href=\"/hub"), hub, lit("\"> A &amp;<b> B"), hub,
          lit("\n</b> </a><script><a href=\"/fake\">x</a></script>" +
            "</body></html>"))
          .cast("binary").as("html"))
      graft.ops.Anchors.anchorTextStats(pages)
    }),

    // temperature rebalance over the naturally-skewed lang column
    "q_source_mix" -> ((s, dir) =>
      Curation.mixSources(t(s, dir, "documents"), group = col("lang"),
        alpha = 0.5)),

    "q_packing" -> ((s, dir) =>
      Curation.packSequences(t(s, dir, "documents"), budget = 200L,
        shards = 8)),

    // REAL WARC parse, foreign-verified like the media queries: the
    // payloads are valid ISO-28500 archive files (half gzipped) whose
    // record fields are arithmetic in the record index — the parser
    // walks actual WARC+HTTP bytes here while the DuckDB oracle
    // recomputes every field from range(), so a mis-parse (header
    // split, content-length walk, gzip decode, status line, link
    // extraction from the carried body) breaks the hash
    "q_warc_ingest" -> ((s, _) => {
      val dir = "/tmp/graft_warc_synth_4x50"
      if (!new java.io.File(dir, "part-000.warc").exists())
        graft.sources.Warc.writeSyntheticArchive(dir, nFiles = 4, perFile = 50)
      graft.sources.Warc.readRecords(s, dir).toDF()
        .filter(col("record_type") === "response")
        .select(col("url"), col("warc_ts"),
          col("http_status").cast("long").as("http_status"),
          size(Extract.extract_links(col("html"), lit("web"))
            .getField("links")).cast("long").as("n_links"))
    }),

    // the full index-then-ranged-fetch loop: a real member-gzip WARC
    // archive is indexed at write time (CDXJ), the index is parsed
    // back, HTTP-200 captures coalesce into byte spans, and ONLY those
    // spans are seek-read and decoded — the 404 records' bytes are
    // never touched. DuckDB recomputes the decoded fields (url, ts,
    // status, link count) arithmetically, so a wrong span boundary, a
    // broken member decode, or a mis-indexed offset breaks the hash
    "q_warc_ranged" -> ((s, _) => {
      val dir = "/tmp/graft_warc_cdx_synth_4x50"
      if (!new java.io.File(dir, "part-000.warc.gz").exists())
        graft.sources.Warc.writeSyntheticIndexedArchive(dir, nFiles = 4, perFile = 50)
      val caps = graft.sources.Cdx.readCaptures(s, s"$dir/cdx")
      val plan = graft.sources.Cdx.fetchPlan(caps.filter(col("http_status") === 200))
      graft.sources.Warc.readRecordsRanged(s, dir, plan).toDF()
        .select(col("url"), col("warc_ts"),
          col("http_status").cast("long").as("http_status"),
          size(Extract.extract_links(col("html"), lit("web"))
            .getField("links")).cast("long").as("n_links"))
    }),

    // storage-dedup round trip: pages with arithmetically duplicated
    // payloads are written as a dedup archive (one full response per
    // distinct payload + identical-payload-digest revisit stubs), read
    // back as REAL WARC bytes, and revisits re-materialize through the
    // refers-to join. DuckDB recomputes the canonical pick (min url
    // per payload group) and every resolved field from range() — a
    // wrong canonical, a dangling refers-to, or a dropped capture
    // breaks the hash
    "q_warc_revisit" -> ((s, _) => {
      val dir = "/tmp/graft_warc_revisit_300"
      if (!new java.io.File(dir, "part-00000.warc.gz").exists()) {
        val pages = s.range(300).select(
          concat(lit("https://h"), pmod(col("id"), lit(7)).cast("string"),
            lit(".test/p"), col("id").cast("string")).as("url"),
          concat(lit("<html><body>payload-"),
            pmod(col("id"), lit(40)).cast("string"),
            lit("</body></html>")).cast("binary").as("html"))
        graft.sources.Warc.writeDedupArchive(pages, dir, 4)
      }
      graft.sources.Warc.resolveRevisits(
          graft.sources.Warc.readRecords(s, dir))
        .select(col("url"), col("is_revisit"),
          decode(col("html"), "UTF-8").as("payload"))
    }),

    // WET text sidecar round trip: (url, text) → conversion records →
    // real gzip WARC bytes → parse back; non-ASCII text pins UTF-8
    "q_wet_roundtrip" -> ((s, _) => {
      val dir = "/tmp/graft_wet_synth_250"
      if (!new java.io.File(dir, "part-00000.wet.gz").exists()) {
        val pages = s.range(250).select(
          concat(lit("https://w"), pmod(col("id"), lit(5)).cast("string"),
            lit(".test/p"), col("id").cast("string")).as("url"),
          concat(lit("doc "), col("id").cast("string"),
            lit(" café § token"), pmod(col("id"), lit(13)).cast("string"))
            .as("text"))
        graft.sources.Warc.writeTextArchive(pages, dir, 3)
      }
      graft.sources.Warc.readText(s, dir)
    }),

    // sitemap seed channel: Spark parses REAL urlset XML (optional
    // fields, spec's 0.5 priority default, date-only lastmod) while
    // DuckDB recomputes every field arithmetically from range()
    "q_sitemap" -> ((s, _) => {
      val dir = "/tmp/graft_sitemap_synth_4x50"
      if (!new java.io.File(dir, "sitemap-000.xml").exists())
        graft.sources.Sitemaps.writeSyntheticSitemaps(dir, nFiles = 4, perFile = 50)
      val docs = s.read.option("wholetext", true).text(s"$dir/sitemap-*.xml")
      graft.sources.Sitemaps.parseUrlset(docs, col("value"))
    }),

    // CDX capture index (the other half of the Common-Crawl IO story:
    // the index names the bytes, the WARC reader decodes them).
    // Foreign-verified like q_warc_ingest: Spark parses REAL CDXJ text
    // (SURT key, 14-digit timestamp, JSON blob, string→numeric casts)
    // and picks the newest capture per url via a map-side-combinable
    // max_by; DuckDB recomputes every field arithmetically from
    // range(), so a mis-parse or a wrong latest pick breaks the hash
    "q_cdx_latest" -> ((s, _) => {
      val dir = "/tmp/graft_cdx_synth_4x50_v2"
      if (!new java.io.File(dir, "cdx-00000.txt").exists())
        graft.sources.Cdx.writeSyntheticIndex(dir, nFiles = 4, perFile = 50)
      graft.sources.Cdx.latestCaptures(graft.sources.Cdx.readCaptures(s, dir))
        .select(col("url"), col("surt_key"), col("capture_ts"),
          col("http_status"), col("length").as("rec_bytes"),
          col("offset").as("rec_offset"), col("filename"))
    }),

    // adaptive-recrawl signal: per-url change rate from consecutive
    // captures' digest diffs (the synthetic index gives every url two
    // captures, content stable iff u%3==0). DuckDB recomputes the
    // stats arithmetically, so a wrong lag/gap/rate breaks the hash
    "q_cdx_change_rate" -> ((s, _) => {
      val dir = "/tmp/graft_cdx_synth_4x50_v2"
      if (!new java.io.File(dir, "cdx-00000.txt").exists())
        graft.sources.Cdx.writeSyntheticIndex(dir, nFiles = 4, perFile = 50)
      graft.sources.Cdx.changeStats(graft.sources.Cdx.readCaptures(s, dir))
    }),

    // ranged-GET fetch plan: HTTP-200 captures coalesced into per-file
    // byte spans (adjacent records merge — the scan-pruning artifact a
    // 100 TB ingest hands its fetcher). DuckDB rebuilds the same spans
    // with its own window island detection over the arithmetic index
    "q_cdx_plan" -> ((s, _) => {
      val dir = "/tmp/graft_cdx_synth_4x50_v2"
      if (!new java.io.File(dir, "cdx-00000.txt").exists())
        graft.sources.Cdx.writeSyntheticIndex(dir, nFiles = 4, perFile = 50)
      val caps = graft.sources.Cdx.readCaptures(s, dir)
      graft.sources.Cdx.fetchPlan(caps.filter(col("http_status") === 200))
    }),

    // incremental (cross-snapshot) dedup: the odd-doc_id half of the
    // corpus plays the "new dump", the even half the accumulated
    // corpus. Exact pass is hash-verified (plain SQL anti-join on
    // text); the near pass is LSH → rows-only (OpsSpec pins the
    // cross-pair semantics and the keep-pass)
    "q_dedup_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.dropExactDupsAgainst(
          d.filter(pmod(col("doc_id"), lit(2)) === 1),
          d.filter(pmod(col("doc_id"), lit(2)) === 0))
        .select(col("doc_id"))
    }),
    // md5 signature mode (r5): the cross-snapshot candidate join is
    // recomputed by the DuckDB oracle, corpus-side bucket cap included
    "q_dedup_incr_near" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.minhashNearDupsAgainstMd5(
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        k = 16, bands = 4, shingleN = 3, threshold = 0.8)
    }),

    // BPE tokenizer training: hash-verified (r5) — the oracle unrolls
    // all 30 merge rounds in SQL (pair-count + argmax per round, the
    // q_classifier_train unrolling pattern), applying each chosen
    // merge with a delimiter-exact string replace. BpeSpec separately
    // pins parity with an independent serial Sennrich implementation.
    "q_bpe_merges" -> ((s, dir) =>
      Bpe.trainMergesDF(t(s, dir, "documents"), nMerges = 30)
        .withColumn("rank", col("rank").cast("long"))),
    // greedy encoding: hash-verified (r5) — the oracle refits the 20
    // merges with the same unroll, then a recursive CTE replays
    // encodeWord's scan-merge-rescan loop per distinct word type
    // (lowest-ranked adjacent pair, first occurrence, until none
    // ranks) and documents join their words' terminal states
    "q_bpe_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Bpe.encode(d, Bpe.trainMerges(d, nMerges = 20))
        .select(col("doc_id"), col("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens"))
    }),

    // MinHash/LSH near-dup chain in md5-arithmetic signature mode
    // (r5): DuckDB recomputes signatures → bands → buckets → capped
    // candidate pairs → exact-Jaccard verify, so the flagship dedup
    // path itself is hash-verified. The xxhash64 production mode stays
    // OpsSpec-pinned (recall-vs-exact + signature equivalences).
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashNearDupsMd5(t(s, dir, "documents"), k = 16, bands = 4,
        shingleN = 3, threshold = 0.8)),

    // near-dup pairs closed under transitivity into keep/drop clusters
    // — md5-mode pairs + star-contraction components, hash-verified
    // against a recursive-CTE closure of the same recomputed pair list
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClustersMd5(t(s, dir, "documents"), k = 16, bands = 4,
        shingleN = 3, threshold = 0.8)
        .withColumn("is_canonical", col("is_canonical").cast("long"))),

    // the CLUSTERING half of q_dedup_clusters, hash-verified: the
    // star-contraction connected components run over the EXACT
    // n-gram-Jaccard pair list (SQL-expressible pair generation), and
    // DuckDB closes the same pairs with a recursive CTE — so the
    // transitive-closure operator itself is foreign-verified even
    // though LSH candidate generation is not
    "q_cluster_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, shingleN = 3, threshold = 0.8)
      graft.ops.GraphOps.connectedComponents(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")),
          docs.select(col("doc_id").as("node")))
        .select(col("node").as("doc_id"), col("component").as("cluster_id"),
          (col("node") === col("component")).cast("long").as("is_canonical"))
    }),

    // the KEEP DECISION half of q_dedup_incr_near, hash-verified: new
    // snapshot (odd ids) minus exact corpus dups minus docs with an
    // EXACT cross-snapshot Jaccard pair ≥ threshold — the same keep
    // rule dropDupsAgainst applies, with the SQL-expressible exact
    // pair generation standing in for the LSH candidates
    "q_dedup_incr_keep" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val newDocs = d.filter(pmod(col("doc_id"), lit(2)) === 1)
      val corpus = d.filter(pmod(col("doc_id"), lit(2)) === 0)
      val pairs = Dedup.jaccardPairs(d, shingleN = 3, threshold = 0.8)
      val crossNew = pairs
        .filter(pmod(col("doc_a"), lit(2)) =!= pmod(col("doc_b"), lit(2)))
        .select(when(pmod(col("doc_a"), lit(2)) === 1, col("doc_a"))
          .otherwise(col("doc_b")).as("doc_id"))
        .distinct()
      Dedup.dropExactDupsAgainst(newDocs, corpus)
        .join(crossNew, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    }),

    // md5-arithmetic fingerprint mode (r5): DuckDB recomputes all 64
    // majority votes and the reassembled fingerprint bit-identically
    "q_simhash" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.simhashMd5(col("text")).as("fp"))),

    // the full simhash near-dup chain over md5-mode fingerprints:
    // identical-fp star collapse + 16-bit-chunk candidate join +
    // exact Hamming ≤ 3 — every stage recomputed by the oracle
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDupsFromFps(
        t(s, dir, "documents").select(col("doc_id"),
          TextOps.simhashMd5(col("text")).as("fp")),
        maxDist = 3)
        .withColumn("dist", col("dist").cast("long"))),

    "q_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(queries, emb, k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("sim"), 4).as("sim_r"))
    }),

    // md5-mode hyperplanes (r5): DuckDB recomputes every plane
    // component, sign-bit bucket, candidate join and cosine rank
    "q_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopKMd5(queries, emb, k = 5, nBits = 6, tables = 6)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("sim"), 4).as("sim_r"))
    }),

    "q_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.ivfTopK(queries, emb, k = 5, nCentroids = 16, nprobe = 6)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("sim"), 4).as("sim_r"))
    }),

    "q_embed_norm" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
        round(Similarity.l2norm(col("embedding")), 4).as("norm_r"))),

    // embedding-cosine near-dup pairs: exact variant is oracle-checked;
    // LSH-bucketed variant (the 100 TB path) is rows-only here with a
    // recall-vs-exact oracle in OpsSpec. Thresholds fit the synthetic
    // near-orthogonal embeddings (max pairwise cos ≈ 0.46).
    "q_cosine_pairs" -> ((s, dir) =>
      Similarity.cosinePairsExact(t(s, dir, "embeddings"), 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim_r"))),

    // md5-mode hyperplanes (r5) — hash-verified like q_knn_lsh
    "q_cosine_pairs_lsh" -> ((s, dir) =>
      Similarity.cosineNearDupsMd5(t(s, dir, "embeddings"), 0.3,
        nBits = 4, tables = 8)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim_r"))),

    // SemDeDup kept set under the SQL-expressible axis-sign clustering
    // (the k-means variant is OpsSpec-verified against this kernel)
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDeDup(t(s, dir, "embeddings"),
        Similarity.axisSignBucket(col("embedding"), 4), 0.3)),

    // (q_media_meta retired in round 4: its generic decodeMeta path
    // kept the StubDecoder defaults while q_image/audio/video_meta
    // verify the REAL decoders below; the pluggable-decoder plumbing
    // itself stays pinned by MultimodalSpec)

    // REAL audio decode, foreign-verified: the payloads are valid
    // PCM WAV containers whose header parameters are arithmetic in
    // the row id — javax.sound parses the actual bytes here while the
    // DuckDB oracle recomputes the expectation from the id, so a
    // mis-parse (rate, channel count, frame count, duration) breaks
    // the hash
    "q_audio_meta" -> ((s, _) => {
      import s.implicits._
      Multimodal.decodeAudioMeta(Multimodal.syntheticAudio(s, 200L),
          Some(new Multimodal.JdkAvDecoder)).toDF()
        .select(col("media_id"), col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"), col("frames"),
          col("duration_ms"), col("format"))
    }),

    // REAL image decode, foreign-verified: payloads are valid PNG
    // containers (encoded by the JDK's PNG writer) whose dimensions
    // are arithmetic in the row id — javax.imageio parses the actual
    // bytes here while the DuckDB oracle recomputes the expectation
    // from the id, so a mis-parse (width, height, channels) breaks
    // the hash
    // image near-dup pairs over REAL decoded pixels: aHash per image,
    // banded hamming join — hash-verified (r5): the synthetic corpus's
    // md5-parity pixel pattern lets DuckDB recompute every expected
    // aHash and the full pair chain while Spark decodes actual PNGs
    "q_image_neardup" -> ((s, _) => {
      import s.implicits._
      Multimodal.imageNearDups(Multimodal.syntheticNearDupImages(s, 200L))
        .withColumn("dist", col("dist").cast("long"))
    }),

    "q_image_meta" -> ((s, _) => {
      import s.implicits._
      Multimodal.decodeMeta(Multimodal.syntheticImages(s, 200L),
          Some(new Multimodal.ImageIoDecoder)).toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"), col("format"))
    }),

    // REAL video-container parse, foreign-verified: payloads are
    // well-formed ISO-BMFF box trees (ftyp/moov/mvhd/trak/mdat) whose
    // movie-header parameters are arithmetic in the row id — the box
    // walker parses the actual big-endian container bytes here while
    // the DuckDB oracle recomputes the expectation from the id, so a
    // mis-parse (duration, timescale, track count, brand) breaks the
    // hash
    "q_video_meta" -> ((s, _) => {
      import s.implicits._
      Multimodal.decodeVideoMeta(Multimodal.syntheticVideo(s, 200L)).toDF()
        .select(col("media_id"), col("duration_ms"),
          col("timescale").cast("long").as("timescale"),
          col("tracks").cast("long").as("tracks"), col("brand"), col("format"))
    }),

    // REAL video SAMPLE decode, foreign-verified: payloads carry a
    // complete uncompressed `raw ` RGB24 track whose sample table
    // (stsd/stts/stsc/stsz/stco) the walker resolves to exact frame
    // timestamps, dimensions and byte sizes — all arithmetic in the
    // row id, recomputed by the DuckDB oracle, so a mis-walk of any
    // table breaks the hash. (Pixel CONTENT is cross-verified against
    // javax.imageio in OpsSpec — two independent decoders must
    // produce the same luminance histogram.)
    "q_video_frames" -> ((s, _) => {
      import s.implicits._
      Multimodal.decodeVideoFrames(Multimodal.syntheticRawVideo(s, 200L)).toDF()
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("ts_ms"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("sample_bytes"))
    }),

    // robots.txt rule enforcement: anti join on host + path prefix
    "q_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val pages = t(s, dir, "part").select(
        col("p_partkey"),
        concat(lit("https://h"), pmod(col("p_partkey"), lit(10)).cast("string"),
          lit(".test/"), col("p_type")).as("url"),
        concat(lit("h"), pmod(col("p_partkey"), lit(10)).cast("string"),
          lit(".test")).as("host"))
      val rules = Seq(("h0.test", "/STANDARD"), ("h1.test", "/SMALL"),
        ("h2.test", "/MEDIUM")).toDF("host", "disallow")
      graft.sites.Robots.filterAllowed(pages, rules)
        .select(col("p_partkey"), col("url"))
    }),

    // RFC 9309 robots filter: Allow/Disallow with '*' wildcards, '$'
    // end anchors and longest-match precedence — Spark parses REAL
    // robots.txt bytes and runs the precedence aggregation while the
    // oracle recomputes each family's verdict arithmetically
    "q_robots_rfc" -> ((s, dir) => {
      import s.implicits._
      val robotsPages = Seq(
        ("https://h0.test/robots.txt",
          "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
        ("https://h1.test/robots.txt",
          "User-agent: *\nDisallow: /*.php$\n"))
        .toDF("url", "txt")
        .select(col("url"), col("txt").cast("binary").as("html"))
      val rules = graft.sites.Robots.rfcRulesFromPages(robotsPages)
      val k = col("c_custkey")
      val url = when(pmod(k, lit(6)) === 0,
          concat(lit("https://h0.test/public/p"), k.cast("string")))
        .when(pmod(k, lit(6)) === 1,
          concat(lit("https://h0.test/private/p"), k.cast("string")))
        .when(pmod(k, lit(6)) === 2,
          concat(lit("https://h0.test/private/ok/p"), k.cast("string")))
        .when(pmod(k, lit(6)) === 3,
          concat(lit("https://h1.test/page"), k.cast("string"), lit(".php")))
        .when(pmod(k, lit(6)) === 4,
          concat(lit("https://h1.test/page"), k.cast("string"), lit(".phpx")))
        .otherwise(concat(lit("https://h2.test/any"), k.cast("string")))
      val docs = t(s, dir, "customer").select(k.as("doc_id"), url.as("url"))
        .withColumn("host", canon.host_of(col("url")))
      graft.sites.Robots.filterAllowedRfc(docs, rules)
        .select(col("doc_id"), col("url"))
    }),

    // ---- graph analytics over the edge table (the reference's
    //      companion-service queries) ----

    "q_out_degree" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
      graft.ops.GraphOps.outDegreeDistribution(edges)
    }),

    "q_top_indegree" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
      graft.ops.GraphOps.topByInDegree(edges, 20)
    }),

    // per-node triangle counts (degree-oriented compact-forward) on a
    // mod-folded projection of the order→part graph — bipartite graphs
    // have no triangles, so both key spaces fold into 0..199 first
    "q_triangles" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        pmod(col("l_orderkey"), lit(200)).as("src"),
        pmod(col("l_partkey"), lit(200)).as("dst"))
      graft.ops.GraphOps.triangleCounts(edges)
    }),

    // PageRank over the order→part graph, 3 power iterations with
    // dangling-mass redistribution (parts are never src, so the
    // dangling term is exercised for real); the DuckDB oracle runs
    // the same recurrence as chained CTEs. Output mean-normalized
    // (rank × N) and rounded so cross-engine float-sum order noise
    // (~1e-15 relative) sits 9 orders below the comparison grain.
    // host/domain-graph projection: page edges → weighted group edges
    // (grp = node % 50 stands in for the host map, which a foreign
    // engine recomputes arithmetically)
    "q_host_graph" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val groups = nodes.select(col("node"), pmod(col("node"), lit(50)).as("grp"))
      graft.ops.GraphOps.projectGraph(edges, groups)
    }),

    "q_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      val pr = graft.ops.GraphOps.pageRank(edges, iters = 3)
      pr.crossJoin(pr.agg(count(lit(1)).cast("double").as("nn")))
        .select(col("node"), round(col("rank") * col("nn"), 6).as("rank_n"))
    }),

    // weighted PageRank over the projected host graph — the CC-style
    // host ranking; DuckDB re-runs the weighted recurrence
    "q_host_rank" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val groups = nodes.select(col("node"), pmod(col("node"), lit(50)).as("grp"))
      val hg = graft.ops.GraphOps.projectGraph(edges, groups)
        .select(col("src_grp").as("src"), col("dst_grp").as("dst"),
          col("weight"))
      val pr = graft.ops.GraphOps.pageRankWeighted(hg, iters = 3)
      pr.crossJoin(pr.agg(count(lit(1)).cast("double").as("nn")))
        .select(col("node"), round(col("rank") * col("nn"), 6).as("rank_n"))
    }),

    // connected components via large-star/small-star over an
    // arithmetic block graph (64-node chains + in-block shortcuts):
    // the closed-form oracle (component = block head) verifies the
    // full O(log n) star-contraction machinery end-to-end
    "q_cc" -> ((s, _) => {
      val ids = s.range(0, 4000L)
      val chain = ids.filter(col("id") % 64 =!= 63)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val shortcuts = ids.filter(col("id") % 5 === 2)
        .select(col("id").as("src"),
          (col("id") - pmod(col("id"), lit(64L))).as("dst"))
      graft.ops.GraphOps.connectedComponents(
        chain.unionByName(shortcuts), ids.select(col("id").as("node")))
    }),

    "q_khop" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
        .distinct()
      val sources = s.range(1, 4).select(col("id").as("node"))
      graft.ops.GraphOps.reachable(edges, sources, maxHops = 3)
    }),

    // flagship crawl — now ALSO DuckDB-verified via the recursive-CTE
    // oracle (EngineSpec's scala BFS oracle remains as belt-and-braces)
    "q_crawl_edges" -> ((s, _) => crawlEdges(s, "wikipedia", 60L)),

    // counties adapter end-to-end: DOM scoping (D4) + allow-list
    // semi-join (F4/J5) wired through the live engine
    "q_crawl_edges_counties" -> ((s, _) => crawlEdges(s, "us_counties", 40L)),

    // synonyms adapter end-to-end: dual-base CleanUrl (P2,
    // synonyms.go:18-28) through the live engine, DuckDB-verified
    "q_crawl_edges_synonyms" -> ((s, _) => crawlEdges(s, "synonyms", 40L)),

    // synonyms-ar adapter end-to-end: UTF-8 percent-decode CleanUrl
    // (P3, ar_synonyms_test.go:44-48) pinned against the foreign
    // oracle over the whole engine
    "q_crawl_edges_ar" -> ((s, _) => crawlEdges(s, "synonyms-ar", 40L))
  )

  def oracleSql: Map[String, String] = Map(
    // recomputes the WAV generator's header arithmetic; the Spark side
    // parsed the actual container bytes with javax.sound
    "q_audio_meta" ->
      ("SELECT i AS media_id, " +
        "CAST(CASE i % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 " +
        "WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate, " +
        "1 + i % 2 AS channels, 300 + (i * 37) % 1000 AS frames, " +
        "(300 + (i * 37) % 1000) * 1000 // (CASE i % 4 WHEN 0 THEN 8000 " +
        "WHEN 1 THEN 16000 WHEN 2 THEN 22050 ELSE 44100 END) AS duration_ms, " +
        "'wav' AS format FROM range(200) t(i)"),

    // recomputes the PNG generator's dimension arithmetic; the Spark
    // side parsed the actual container bytes with javax.imageio
    "q_image_meta" ->
      ("SELECT i AS media_id, 8 + (i * 13) % 120 AS width, " +
        "8 + (i * 29) % 90 AS height, CAST(3 AS BIGINT) AS channels, " +
        "'png' AS format FROM range(200) t(i)"),

    // recomputes the MP4 generator's movie-header arithmetic; the
    // Spark side walked the actual ISO-BMFF box bytes
    "q_video_meta" ->
      ("SELECT i AS media_id, " +
        "(1200 + (i * 53) % 4800) * 1000 // (600 * (1 + i % 4)) AS duration_ms, " +
        "600 * (1 + i % 4) AS timescale, 1 + i % 3 AS tracks, " +
        "'isom' AS brand, 'mp4' AS format FROM range(200) t(i)"),

    // recomputes the raw-track generator's sample-table arithmetic
    // (frame count, stts timestamps, stsd dimensions, stsz sizes);
    // the Spark side walked the actual big-endian table bytes
    "q_video_frames" ->
      ("SELECT i AS media_id, f AS frame_idx, " +
        "f * (40 * (1 + i % 3)) * 1000 // (1000 * (1 + i % 2)) AS ts_ms, " +
        "8 + (i * 11) % 24 AS width, 8 + (i * 7) % 16 AS height, " +
        "(8 + (i * 11) % 24) * (8 + (i * 7) % 16) * 3 AS sample_bytes " +
        "FROM range(200) t(i) CROSS JOIN range(6) u(f) WHERE f < 2 + i % 4"),

    "q_clean_name" ->
      "SELECT p_partkey, lower(p_name) AS name FROM part",

    "q_canonical_url" ->
      ("SELECT o_orderkey, 'https://shop.example.com/o/' || CAST(o_orderkey AS VARCHAR) " +
        "|| '?a=1&z=' || CAST(o_custkey AS VARCHAR) AS url FROM orders"),

    "q_host_of" ->
      ("SELECT c_custkey, 'h' || CAST(c_nationkey % 7 AS VARCHAR) || '.example.org' AS host " +
        "FROM customer"),

    "q_valid_link_wiki" ->
      ("SELECT p_partkey, '/wiki/' || replace(p_name, ' ', '_') AS href " +
        "FROM part WHERE p_partkey % 5 = 0"),

    "q_frontier_order" ->
      ("SELECT event_id, user_id, ts, value FROM events " +
        "ORDER BY value DESC, ts ASC, event_id ASC LIMIT 100"),

    "q_politeness_cap" ->
      ("SELECT user_id, event_id, ts, rn FROM (SELECT user_id, event_id, ts, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events) WHERE rn <= 3"),

    "q_politeness_delay" ->
      ("""WITH b AS (SELECT user_id,
        |   greatest(1, least(3, CAST(floor(6.0 / (1.0 + user_id % 4)) AS INT))) AS budget
        |  FROM (SELECT DISTINCT user_id FROM events)),
        | r AS (SELECT user_id, event_id, ts,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT r.user_id, r.event_id, r.ts
        |FROM r JOIN b USING (user_id) WHERE rn <= budget"""
        .stripMargin),

    "q_edge_dedup" ->
      ("SELECT DISTINCT c.l_orderkey AS src, c.l_partkey AS dst FROM lineitem c " +
        "WHERE NOT EXISTS (SELECT 1 FROM lineitem e WHERE e.l_linenumber = 1 " +
        "AND e.l_orderkey = c.l_orderkey AND e.l_partkey = c.l_partkey)"),

    "q_node_upsert" ->
      ("SELECT DISTINCT c_name AS name FROM customer WHERE c_acctbal > 0 " +
        "AND c_name NOT IN (SELECT c_name FROM customer WHERE c_custkey <= 100)"),

    "q_fetch_join" ->
      ("SELECT o_orderkey, o_custkey, c_name FROM orders " +
        "JOIN customer ON o_custkey = c_custkey"),

    "q_fetch_errors" ->
      ("WITH f AS (SELECT c_custkey FROM customer UNION ALL " +
        "SELECT c_custkey + 5000000 AS c_custkey FROM customer) " +
        "SELECT c_custkey FROM f WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = f.c_custkey)"),

    "q_first_discovery" ->
      ("SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber FROM " +
        "(SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, " +
        "row_number() OVER (PARTITION BY l_partkey ORDER BY l_shipdate, " +
        "l_orderkey, l_linenumber) AS rn FROM lineitem) WHERE rn = 1"),

    "q_metrics_agg" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS pages, " +
        "sum(l_quantity) AS qty, max(l_shipdate) AS max_ship " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    "q_seed_pick" ->
      "SELECT c_name AS word FROM customer ORDER BY md5(c_name), c_name LIMIT 1",

    "q_event_windows" ->
      ("SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2"),

    "q_dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text",

    "q_dedup_incremental" ->
      ("SELECT doc_id FROM documents n WHERE doc_id % 2 = 1 AND NOT EXISTS " +
        "(SELECT 1 FROM documents o WHERE o.doc_id % 2 = 0 AND o.text = n.text)"),

    "q_token_count" ->
      ("SELECT doc_id, len(string_split_regex(text, '\\s+')) AS ws_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens " +
        "FROM documents"),

    "q_quality" -> qualityOracle,

    "q_lang_id" -> langIdOracle,

    "q_fingerprint" ->
      ("SELECT doc_id, min(md5(t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2])) AS fp " +
        "FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "(SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 2 GROUP BY doc_id"),

    "q_jaccard_pairs" -> jaccardOracle,

    "q_minhash_pairs" ->
      ("WITH " + minhashPairsCte + "\nSELECT doc_a, doc_b, jaccard FROM pr"),

    "q_dedup_clusters" -> dedupClustersOracle,

    "q_dedup_incr_near" -> incrNearOracle,

    "q_simhash" ->
      ("WITH " + simhashFpCte + "\nSELECT doc_id, fp FROM fp"),

    "q_simhash_pairs" -> simhashPairsOracle,

    "q_image_neardup" -> imageNearDupOracle,

    "q_bpe_merges" -> bpeMergesOracle(30),

    "q_bpe_encode" -> bpeEncodeOracle(20),

    "q_cluster_components" -> clusterComponentsOracle,

    "q_dedup_incr_keep" -> incrKeepOracle,

    "q_split" ->
      ("""SELECT doc_id, bucket,
        | CASE WHEN bucket < 80 THEN 'train'
        |      WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ((((doc_id%2147483648)*1103515245+12345)%2147483648) >> 16)%100 AS bucket
        |  FROM documents)"""
        .stripMargin),

    "q_sample_stratified" ->
      ("""SELECT doc_id, lang, rk FROM (
        | SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY ((doc_id%2147483648)*1103515245+12345)%2147483648, doc_id) AS BIGINT) AS rk
        | FROM documents) WHERE rk <= 20"""
        .stripMargin),

    "q_normalize" ->
      ("SELECT doc_id, trim(regexp_replace(regexp_replace(" +
        "nfc_normalize(text || ' cafe' || chr(769) || '  A' || chr(778) || chr(9) || 'x '), " +
        "'[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM documents"),

    "q_pii_redact" ->
      ("""SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.org from 10.0.'
        |    || CAST(doc_id % 256 AS VARCHAR) || '.77 acct 9'
        |    || lpad(CAST(doc_id % 100000 AS VARCHAR), 11, '0'),
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |  '\b\d{9,}\b', '<ID>', 'g') AS redacted
        |FROM documents"""
        .stripMargin),

    "q_reg_domain" ->
      ("""SELECT c_custkey AS doc_id,
        | CASE c_custkey % 5
        |  WHEN 0 THEN 'a' || CAST(c_custkey AS VARCHAR) || '.example.com'
        |  WHEN 1 THEN 'b' || CAST(c_custkey AS VARCHAR) || '.site.co.uk'
        |  WHEN 2 THEN 'c' || CAST(c_custkey AS VARCHAR) || '.w' || CAST(c_custkey % 3 AS VARCHAR) || '.ck'
        |  WHEN 3 THEN 'sub.www.ck'
        |  ELSE 'd' || CAST(c_custkey AS VARCHAR) || '.foo.zz' END AS host,
        | CASE c_custkey % 5
        |  WHEN 0 THEN 'com'
        |  WHEN 1 THEN 'co.uk'
        |  WHEN 2 THEN 'w' || CAST(c_custkey % 3 AS VARCHAR) || '.ck'
        |  WHEN 3 THEN 'ck'
        |  ELSE 'zz' END AS ps,
        | CASE c_custkey % 5
        |  WHEN 0 THEN 'example.com'
        |  WHEN 1 THEN 'site.co.uk'
        |  WHEN 2 THEN 'c' || CAST(c_custkey AS VARCHAR) || '.w' || CAST(c_custkey % 3 AS VARCHAR) || '.ck'
        |  WHEN 3 THEN 'www.ck'
        |  ELSE 'foo.zz' END AS reg
        |FROM customer"""
        .stripMargin),

    "q_url_features" ->
      ("""WITH u AS (SELECT c_custkey AS doc_id,
        |  'https://w' || CAST(c_custkey % 5 AS VARCHAR) || '.h' || CAST(c_custkey % 7 AS VARCHAR)
        |   || '.example.org/d' || CAST(c_custkey % 9 AS VARCHAR)
        |   || CASE WHEN c_custkey % 11 = 0 THEN '/casino/bonus' ELSE '/page' END
        |   || '?x=' || CAST(c_custkey % 100 AS VARCHAR)
        |   || CASE WHEN c_custkey % 2 = 0 THEN '&y=1' ELSE '' END AS url
        | FROM customer)
        |SELECT doc_id,
        | length(url) AS url_len,
        | len(string_split(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.')) AS host_labels,
        | len(string_split(regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1), '/')) - 1 AS path_depth,
        | CASE WHEN regexp_extract(url, '\?([^#]*)', 1) = '' THEN 0
        |      ELSE len(string_split(regexp_extract(url, '\?([^#]*)', 1), '&')) END AS n_params,
        | CAST(floor(length(regexp_replace(url, '[^0-9]', '', 'g')) * 10000.0 / length(url)) AS BIGINT) AS digit_bp,
        | CAST(CASE WHEN url LIKE '%casino%' THEN 1 ELSE 0 END
        |    + CASE WHEN url LIKE '%bet%' THEN 1 ELSE 0 END AS BIGINT) AS spam_hits
        |FROM u"""
        .stripMargin),

    "q_c4_lines" ->
      ("""WITH built AS (SELECT doc_id AS k,
        |  substr(text, 1, CAST(doc_id % 60 + 20 AS INT)) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.' WHEN doc_id % 3 = 1 THEN '!' ELSE '' END
        |  || chr(10) || 'too short.'
        |  || chr(10) || 'Please enable javascript to continue reading this page.'
        |  || chr(10) || substr(text, 1, CAST(doc_id % 40 + 15 AS INT)) ||
        |    CASE WHEN doc_id % 5 = 0 THEN '?' WHEN doc_id % 5 = 1 THEN '"' ELSE '.' END
        |  || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
        |  || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'code { block }' ELSE '' END AS txt
        | FROM documents),
        | kept AS (SELECT k, txt,
        |  list_filter(list_transform(string_split(txt, chr(10)), l -> trim(l)),
        |    l -> regexp_matches(l, '[.!?"]$')
        |         AND len(string_split_regex(l, '\s+')) >= 5
        |         AND NOT contains(lower(l), 'javascript')) AS kl
        | FROM built)
        |SELECT k AS doc_id,
        | coalesce(array_to_string(kl, chr(10)), '') AS kept_text,
        | CAST(len(kl) AS BIGINT) AS n_lines_kept,
        | CAST(len(regexp_extract_all(coalesce(array_to_string(kl, chr(10)), ''), '[.!?"]')) AS BIGINT) AS n_sentences,
        | CAST(CASE WHEN len(regexp_extract_all(coalesce(array_to_string(kl, chr(10)), ''), '[.!?"]')) >= 3
        |       AND NOT contains(lower(txt), 'lorem ipsum')
        |       AND NOT contains(txt, '{') THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM kept"""
        .stripMargin),

    "q_gopher" ->
      ("""WITH built AS (SELECT doc_id AS k,
        |  substr(text, 1, CAST(doc_id % 200 + 10 AS INT))
        |  || CASE WHEN doc_id % 4 = 0 THEN ' the of and that have'
        |          WHEN doc_id % 4 = 1 THEN ' the be' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' # # price #' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' read more... and more...' ELSE '' END
        |  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || '• the first item' || chr(10)
        |       || '• of the second' || chr(10) || 'the closing line ...' ELSE '' END
        |  || CASE WHEN doc_id % 23 = 0 THEN ' 111 222 333 444 555 666 777' ELSE '' END AS txt
        | FROM documents),
        | m AS (SELECT k, txt,
        |  list_filter(string_split_regex(txt, '\s+'), w -> len(w) > 0) AS toks,
        |  list_filter(list_transform(string_split(txt, chr(10)), l -> trim(l)),
        |    l -> len(l) > 0) AS lns,
        |  length(regexp_replace(txt, '\s', '', 'g')) AS wchars,
        |  length(txt) - length(replace(txt, '#', '')) AS nhash,
        |  (length(txt) - length(replace(txt, '...', ''))) // 3 AS nell
        | FROM built),
        | m2 AS (SELECT k, len(toks) AS nw, len(lns) AS nl, wchars, nhash, nell,
        |  len(list_filter(lns, l -> starts_with(l, '•') OR starts_with(l, '- ')
        |     OR starts_with(l, '* '))) AS nbullet,
        |  len(list_filter(lns, l -> ends_with(l, '...'))) AS nelll,
        |  len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
        |  (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'the') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'be') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'to') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'of') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'and') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'that') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'have') THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_contains(list_transform(toks, w -> lower(w)), 'with') THEN 1 ELSE 0 END)
        |  AS stops
        | FROM m),
        | f AS (SELECT k, nw,
        |  CASE WHEN nw > 0 THEN CAST(floor(wchars * 100.0 / nw) AS BIGINT) ELSE 0 END AS mean_wl,
        |  CASE WHEN nw > 0 THEN CAST(floor(nhash * 10000.0 / nw) AS BIGINT) ELSE 0 END AS hash_bp,
        |  CASE WHEN nw > 0 THEN CAST(floor(nell * 10000.0 / nw) AS BIGINT) ELSE 0 END AS ell_bp,
        |  CASE WHEN nl > 0 THEN CAST(floor(nbullet * 10000.0 / nl) AS BIGINT) ELSE 0 END AS bullet_bp,
        |  CASE WHEN nl > 0 THEN CAST(floor(nelll * 10000.0 / nl) AS BIGINT) ELSE 0 END AS ellline_bp,
        |  CASE WHEN nw > 0 THEN CAST(floor(nalpha * 10000.0 / nw) AS BIGINT) ELSE 0 END AS alpha_bp,
        |  stops
        | FROM m2)
        |SELECT k AS doc_id, CAST(nw AS BIGINT) AS n_words, mean_wl AS mean_wl_c100,
        | hash_bp, ell_bp AS ellipsis_bp, bullet_bp AS bullet_line_bp,
        | ellline_bp AS ellipsis_line_bp, alpha_bp AS alpha_word_bp,
        | CAST(stops AS BIGINT) AS stop_hits,
        | CAST(CASE WHEN nw BETWEEN 10 AND 100000 AND mean_wl BETWEEN 300 AND 1000
        |   AND hash_bp <= 1000 AND ell_bp <= 1000 AND bullet_bp <= 9000
        |   AND ellline_bp <= 3000 AND alpha_bp >= 8000 AND stops >= 2
        |   THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM f"""
        .stripMargin),

    "q_strip_tracking" ->
      ("""WITH built AS (SELECT c_custkey AS k,
        |  'https://h' || CAST(c_custkey % 7 AS VARCHAR) || '.test/p' || CAST(c_custkey AS VARCHAR)
        |  || CASE WHEN c_custkey % 3 = 0 THEN ';jsessionid=S' || CAST(c_custkey AS VARCHAR) ELSE '' END
        |  || CASE WHEN c_custkey % 9 = 5 THEN '' ELSE
        |       '?a=' || CAST(c_custkey % 5 AS VARCHAR)
        |       || CASE WHEN c_custkey % 2 = 0 THEN '&utm_source=s' || CAST(c_custkey AS VARCHAR) ELSE '' END
        |       || CASE WHEN c_custkey % 4 = 1 THEN '&gclid=g' ELSE '' END
        |       || CASE WHEN c_custkey % 6 = 2 THEN '&keep=v' ELSE '' END
        |     END
        |  || CASE WHEN c_custkey % 9 = 0 THEN '#sec'
        |          WHEN c_custkey % 9 = 5 THEN '#/r?page=2' ELSE '' END AS url
        | FROM customer),
        | s AS (SELECT k, regexp_replace(url, ';jsessionid=[^?#]*', '', 'i') AS u2 FROM built),
        | parts AS (SELECT k,
        |  regexp_extract(u2, '^[^?#]*') AS beforeq,
        |  regexp_extract(u2, '^[^#?]*\?([^#]*)', 1) AS q,
        |  regexp_extract(u2, '(#.*)$', 1) AS frag
        | FROM s),
        | kept AS (SELECT k, beforeq, frag,
        |  list_filter(string_split(q, '&'), p -> len(p) > 0 AND NOT regexp_matches(lower(p),
        |   '^(utm_[a-z0-9_]*|gclid|dclid|fbclid|msclkid|mc_cid|mc_eid|igshid|yclid|_ga|_gl|spm|ref_src)(=|$)')) AS kp
        | FROM parts)
        |SELECT k AS doc_id,
        | beforeq || CASE WHEN len(kp) > 0 THEN '?' || array_to_string(kp, '&') ELSE '' END || frag
        |   AS url_clean
        |FROM kept"""
        .stripMargin),

    "q_rank_tiers" ->
      ("""WITH r AS (SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.test' AS host,
        |   CAST(n_nationkey % 7 + 1 AS DOUBLE) AS s FROM nation),
        | hist AS (SELECT s, count(*) AS c FROM r GROUP BY s),
        | t AS (SELECT s, CAST(floor(4 * coalesce(sum(c) OVER
        |   (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   / (SELECT sum(c) FROM hist)) AS BIGINT) AS tier FROM hist),
        | ht AS (SELECT host, tier FROM r JOIN t USING (s)),
        | u AS (SELECT 'https://h' || CAST(c_custkey % 30 AS VARCHAR) || '.test/p'
        |   || CAST(c_custkey AS VARCHAR) AS url,
        |   'h' || CAST(c_custkey % 30 AS VARCHAR) || '.test' AS host FROM customer)
        |SELECT url, coalesce(tier, 2) AS priority FROM u LEFT JOIN ht USING (host)"""
        .stripMargin),

    "q_shuffle" ->
      ("""WITH h AS (SELECT doc_id,
        |  (((((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 + 1) % 2147483648)
        |    * 1103515245 + 12345) % 2147483648 AS h2
        | FROM documents),
        | s AS (SELECT doc_id, h2, (h2 // 256) % 8 AS shard FROM h)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id) - 1 AS BIGINT) AS pos
        |FROM s"""
        .stripMargin),

    "q_merge_snapshots" ->
      ("""SELECT CASE WHEN i BETWEEN 50 AND 149
        |   THEN 'HTTPS://M' || CAST(i % 4 AS VARCHAR) || '.test:443/p' || CAST(i AS VARCHAR) || '?b=2&a=1'
        |   ELSE 'https://m' || CAST(i % 4 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) || '?a=1&b=2' END AS url,
        | CASE WHEN i BETWEEN 50 AND 149
        |   THEN TIMESTAMP '2024-01-02 00:00:00' ELSE TIMESTAMP '2024-01-01 00:00:00' END
        |   + i * INTERVAL 1 MINUTE AS warc_ts,
        | CASE WHEN i BETWEEN 50 AND 149
        |   THEN 'v1-' || CAST(i AS VARCHAR) ELSE 'v0-' || CAST(i AS VARCHAR) END AS payload
        |FROM range(200) t(i)"""
        .stripMargin),

    "q_domain_block" ->
      ("""WITH u AS (SELECT c_custkey AS doc_id,
        |   'w' || CAST(c_custkey % 5 AS VARCHAR) || '.h'
        |       || CAST(c_nationkey % 7 AS VARCHAR) || '.example.org' AS host
        | FROM customer),
        | bl(domain) AS (VALUES ('h3.example.org'), ('w1.h5.example.org'), ('example.net'))
        |SELECT u.doc_id, u.host, b.domain
        |FROM u JOIN bl b ON u.host = b.domain OR u.host LIKE '%.' || b.domain"""
        .stripMargin),

    "q_domain_keep" ->
      ("""WITH u AS (SELECT c_custkey AS doc_id,
        |   'https://W' || CAST(c_custkey % 5 AS VARCHAR) || '.h'
        |       || CAST(c_nationkey % 7 AS VARCHAR) || '.Example.org/p?x=1' AS url,
        |   'w' || CAST(c_custkey % 5 AS VARCHAR) || '.h'
        |       || CAST(c_nationkey % 7 AS VARCHAR) || '.example.org' AS host
        | FROM customer),
        | bl(domain) AS (VALUES ('h3.example.org'), ('w1.h5.example.org'))
        |SELECT doc_id, url FROM u
        |WHERE NOT EXISTS (SELECT 1 FROM bl b
        |  WHERE u.host = b.domain OR u.host LIKE '%.' || b.domain)"""
        .stripMargin),

    "q_corpus_stats" ->
      ("SELECT source, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "round(avg(len(string_split_regex(text, '\\s+'))), 4) AS avg_tokens " +
        "FROM documents GROUP BY source, lang"),

    "q_vocab" ->
      ("""WITH c AS (SELECT lang, t.token AS token, count(*) AS cnt
        |  FROM documents, unnest(string_split_regex(text, '\s+')) t(token)
        |  GROUP BY lang, t.token)
        |SELECT lang, token, cnt, rk FROM (
        |  SELECT lang, token, cnt, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY cnt DESC, token ASC) AS BIGINT) AS rk FROM c)
        |WHERE rk <= 20"""
        .stripMargin),

    "q_contamination" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | g AS (SELECT DISTINCT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS gram
        |       FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 2),
        | b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT doc_id, count(*) AS n_shared FROM g JOIN b USING (gram) GROUP BY doc_id"""
        .stripMargin),

    "q_warc_ingest" ->
      ("SELECT 'https://h' || CAST(i % 7 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) AS url, " +
        "TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 MINUTE AS warc_ts, " +
        "CAST(CASE WHEN i % 10 = 9 THEN 404 ELSE 200 END AS BIGINT) AS http_status, " +
        "1 + i % 5 AS n_links FROM range(200) t(i)"),

    // ranged decode returns exactly the status-200 records of the
    // 200-record indexed archive, every field arithmetic in i
    "q_warc_ranged" ->
      ("SELECT 'https://h' || CAST(i % 7 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) AS url, " +
        "TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 MINUTE AS warc_ts, " +
        "CAST(200 AS BIGINT) AS http_status, " +
        "1 + i % 5 AS n_links FROM range(200) t(i) WHERE i % 10 <> 9"),

    "q_wet_roundtrip" ->
      ("""SELECT 'https://w' || CAST(i % 5 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) AS url,
        | 'doc ' || CAST(i AS VARCHAR) || ' café § token' || CAST(i % 13 AS VARCHAR) AS text
        |FROM range(250) t(i)"""
        .stripMargin),

    "q_warc_revisit" ->
      ("""WITH p AS (SELECT i,
        |    'https://h' || CAST(i % 7 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) AS url,
        |    '<html><body>payload-' || CAST(i % 40 AS VARCHAR) || '</body></html>' AS payload,
        |    i % 40 AS grp
        |  FROM range(300) t(i)),
        | c AS (SELECT grp, min(url) AS canon FROM p GROUP BY grp)
        |SELECT p.url, (p.url <> c.canon) AS is_revisit, p.payload
        |FROM p JOIN c USING (grp)"""
        .stripMargin),

    "q_sitemap" ->
      ("""SELECT 'https://h' || CAST(i % 7 AS VARCHAR) || '.test/p' || CAST(i AS VARCHAR) AS loc,
        |  TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 MINUTE AS lastmod,
        |  CASE i % 4 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' WHEN 2 THEN 'monthly' ELSE NULL END AS changefreq,
        |  CASE WHEN i % 10 = 7 THEN 0.5 ELSE (i % 11) / 10.0 END AS priority
        |FROM range(200) t(i)"""
        .stripMargin),

    // the synthetic index holds N=200 captures of U=100 urls (each url
    // captured at i=u and i=u+100 ⇒ the latest is always i=u+100);
    // offsets are running length sums within each 50-record file
    "q_cdx_latest" ->
      ("""WITH c AS (SELECT i, i % 100 AS u, i // 50 AS g,
        |    500 + 3 * (i % 100) AS len,
        |    CASE WHEN i % 10 = 9 THEN 404 ELSE 200 END AS status
        |  FROM range(200) t(i)),
        | o AS (SELECT *, COALESCE(SUM(len) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM c)
        |SELECT 'https://h' || CAST(u % 7 AS VARCHAR) || '.test/p' || CAST(u AS VARCHAR) AS url,
        |  'test,h' || CAST(u % 7 AS VARCHAR) || ')/p' || CAST(u AS VARCHAR) AS surt_key,
        |  TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 MINUTE AS capture_ts,
        |  CAST(status AS BIGINT) AS http_status,
        |  CAST(len AS BIGINT) AS rec_bytes,
        |  CAST(off AS BIGINT) AS rec_offset,
        |  'crawl-data/part-' || CAST(g AS VARCHAR) || '.warc.gz' AS filename
        |FROM o WHERE i >= 100"""
        .stripMargin),

    "q_cdx_change_rate" ->
      ("""SELECT 'https://h' || CAST(u % 7 AS VARCHAR) || '.test/p' || CAST(u AS VARCHAR) AS url,
        |  CAST(2 AS BIGINT) AS n_captures,
        |  CAST(CASE WHEN u % 3 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_changes,
        |  CAST(CASE WHEN u % 3 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE) AS change_rate,
        |  CAST(100.0 AS DOUBLE) AS avg_gap_min
        |FROM range(100) t(u)"""
        .stripMargin),

    "q_cdx_plan" ->
      ("""WITH c AS (SELECT i, i // 50 AS g, 500 + 3 * (i % 100) AS len,
        |    CASE WHEN i % 10 = 9 THEN 404 ELSE 200 END AS status
        |  FROM range(200) t(i)),
        | o AS (SELECT *, COALESCE(SUM(len) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM c),
        | sel AS (SELECT g, off, len FROM o WHERE status = 200),
        | m AS (SELECT g, off, len, CASE WHEN LAG(off + len) OVER
        |    (PARTITION BY g ORDER BY off) = off THEN 0 ELSE 1 END AS nw FROM sel),
        | sp AS (SELECT g, off, len, SUM(nw) OVER (PARTITION BY g ORDER BY off
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id FROM m)
        |SELECT 'crawl-data/part-' || CAST(g AS VARCHAR) || '.warc.gz' AS filename,
        |  CAST(span_id AS BIGINT) AS span_id,
        |  CAST(MIN(off) AS BIGINT) AS span_start,
        |  CAST(MAX(off + len) - MIN(off) AS BIGINT) AS span_bytes,
        |  count(*) AS n_records
        |FROM sp GROUP BY g, span_id"""
        .stripMargin),

    "q_unigram_ll" ->
      ("""WITH toks AS (SELECT doc_id, t.token AS token
        |   FROM documents, unnest(string_split_regex(text, '\s+')) t(token)),
        | v AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        | tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v)
        |SELECT doc_id, round(avg(ln(CAST(cnt AS DOUBLE) / (SELECT total FROM tot))), 4) AS avg_ll
        |FROM toks JOIN v USING (token) GROUP BY doc_id"""
        .stripMargin),

    "q_bigram_ll" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | bg AS (SELECT doc_id, t[i.i] AS u, t[i.i+1] AS v
        |        FROM toks, (SELECT unnest(range(1, 100000)) AS i) i
        |        WHERE i.i <= len(t) - 1),
        | cuv AS (SELECT u, v, count(*) AS cuv FROM bg GROUP BY u, v),
        | cu AS (SELECT u, CAST(sum(cuv) AS DOUBLE) AS cu FROM cuv GROUP BY u)
        |SELECT doc_id, round(avg(ln(CAST(cuv AS DOUBLE) / cu)), 4) AS avg_bll
        |FROM bg JOIN cuv USING (u, v) JOIN cu USING (u) GROUP BY doc_id"""
        .stripMargin),

    "q_ngram_ll" -> ngramLlOracle,

    "q_ppl_buckets" ->
      ("""WITH toks AS (SELECT doc_id, t.token AS token
        |   FROM documents, unnest(string_split_regex(text, '\s+')) t(token)),
        | v AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        | tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v),
        | sc AS (SELECT doc_id,
        |     round(avg(ln(CAST(cnt AS DOUBLE) / (SELECT total FROM tot))), 4) AS s
        |   FROM toks JOIN v USING (token) GROUP BY doc_id),
        | sl AS (SELECT sc.doc_id, d.lang, sc.s
        |   FROM sc JOIN documents d USING (doc_id)),
        | hist AS (SELECT lang, s, count(*) AS c FROM sl GROUP BY lang, s),
        | b AS (SELECT lang, s, CAST(floor(3 * coalesce(sum(c) OVER (
        |       PARTITION BY lang ORDER BY s DESC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |     / sum(c) OVER (PARTITION BY lang)) AS INT) AS bucket
        |   FROM hist)
        |SELECT sl.doc_id, sl.lang, sl.s AS score, b.bucket
        |FROM sl JOIN b USING (lang, s)"""
        .stripMargin),

    "q_classifier_train" -> (classifierCte + "\n" +
      "SELECT bucket, round(w, 8) AS w_r FROM w2"),

    "q_classifier_score" -> (classifierCte + "\n" +
      """, p3 AS (SELECT doc_id, 1.0 / (1.0 + exp(-sum(x * w))) AS p
        |         FROM f JOIN w2 USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, round(p, 4) AS prob_r FROM p3"""
        .stripMargin),

    "q_dsir_weights" -> (dsirWeightsCte + "\n" +
      """SELECT doc_id, round(sum(c * lr), 4) AS logw
        |FROM dc JOIN model USING (bucket) GROUP BY doc_id"""
        .stripMargin),

    "q_dsir_select" -> (dsirWeightsCte + "\n" +
      """, w AS (SELECT doc_id, round(sum(c * lr), 4) AS logw
        |        FROM dc JOIN model USING (bucket) GROUP BY doc_id),
        | s AS (SELECT doc_id, logw,
        |   round(logw - ln(-ln((CAST(((doc_id % 2147483648) * 1103515245 + 12345)
        |     % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0)), 4) AS score
        |   FROM w)
        |SELECT doc_id, logw, score FROM s
        |ORDER BY score DESC, doc_id LIMIT 50"""
        .stripMargin),

    "q_hybrid_rrf" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(avg(len(t)) AS DOUBLE) AS avgdl FROM toks),
        | m AS (SELECT doc_id, len(t) AS dl, u.tok AS term FROM toks, unnest(t) u(tok)
        |       WHERE u.tok IN ('spark', 'window', 'merge')),
        | tf AS (SELECT doc_id, term, CAST(max(dl) AS DOUBLE) AS dl, CAST(count(*) AS DOUBLE) AS tf
        |        FROM m GROUP BY doc_id, term),
        | df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        | sc AS (SELECT doc_id, round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
        |          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        |        FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY doc_id),
        | lex AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 30),
        | lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM lex),
        | sims AS (SELECT c.vec_id AS doc_id,
        |    list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
        |    / (sqrt(list_aggregate(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |     * sqrt(list_aggregate(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id = 3 AND c.vec_id <> 3),
        | den AS (SELECT doc_id, sim FROM sims ORDER BY sim DESC, doc_id LIMIT 30),
        | denr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS rank FROM den),
        | fused AS (SELECT doc_id, round(sum(CAST(1.0 AS DOUBLE) / (60 + rank)), 6) AS rrf
        |   FROM (SELECT * FROM lexr UNION ALL SELECT * FROM denr) GROUP BY doc_id)
        |SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 20"""
        .stripMargin),

    "q_trap_hosts" ->
      ("""WITH p AS (SELECT
        |   CASE WHEN c_custkey % 3 = 0 THEN 'trap.cal.test'
        |        ELSE 'ok' || CAST(c_custkey % 7 AS VARCHAR) || '.test' END AS host,
        |   'https://' || CASE WHEN c_custkey % 3 = 0 THEN 'trap.cal.test'
        |        ELSE 'ok' || CAST(c_custkey % 7 AS VARCHAR) || '.test' END
        |     || '/p' || CAST(c_custkey AS VARCHAR) AS url,
        |   CASE WHEN c_custkey % 3 = 0 THEN 'cal-' || CAST(c_custkey % 5 AS VARCHAR)
        |        ELSE 'pg-' || CAST(c_custkey AS VARCHAR) END AS payload
        | FROM customer)
        |SELECT host, count(DISTINCT url) AS n_urls,
        |  count(DISTINCT payload) AS n_payloads,
        |  round(count(DISTINCT url) * CAST(1.0 AS DOUBLE) / count(DISTINCT payload), 4) AS urls_per_payload
        |FROM p GROUP BY host
        |HAVING count(DISTINCT url) >= 100
        |   AND count(DISTINCT url) * CAST(1.0 AS DOUBLE) / count(DISTINCT payload) >= 10"""
        .stripMargin),

    "q_bm25" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(avg(len(t)) AS DOUBLE) AS avgdl FROM toks),
        | m AS (SELECT doc_id, len(t) AS dl, u.tok AS term FROM toks, unnest(t) u(tok)
        |       WHERE u.tok IN ('spark', 'window', 'merge')),
        | tf AS (SELECT doc_id, term, CAST(max(dl) AS DOUBLE) AS dl, CAST(count(*) AS DOUBLE) AS tf
        |        FROM m GROUP BY doc_id, term),
        | df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        | sc AS (SELECT doc_id, round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
        |          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        |        FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY doc_id)
        |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20"""
        .stripMargin),

    // the indexed path must produce byte-identical results, so its
    // oracle is the same BM25 recompute
    "q_bm25_indexed" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(avg(len(t)) AS DOUBLE) AS avgdl FROM toks),
        | m AS (SELECT doc_id, len(t) AS dl, u.tok AS term FROM toks, unnest(t) u(tok)
        |       WHERE u.tok IN ('spark', 'window', 'merge')),
        | tf AS (SELECT doc_id, term, CAST(max(dl) AS DOUBLE) AS dl, CAST(count(*) AS DOUBLE) AS tf
        |        FROM m GROUP BY doc_id, term),
        | df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        | sc AS (SELECT doc_id, round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
        |          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        |        FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY doc_id)
        |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20"""
        .stripMargin),

    "q_para_dedup" ->
      ("""WITH d AS (SELECT doc_id, regexp_replace(text, ' a ', chr(10), 'g') AS text FROM documents),
        | sp AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM d),
        | p AS (SELECT doc_id, i.i - 1 AS pos, arr[i.i] AS para
        |       FROM sp, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(arr)),
        | w AS (SELECT para, min(doc_id * 1048576 + pos) AS enc FROM p GROUP BY para),
        | kept AS (SELECT p.doc_id, p.pos, p.para FROM p JOIN w
        |          ON p.para = w.para AND p.doc_id * 1048576 + p.pos = w.enc)
        |SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text
        |FROM kept GROUP BY doc_id"""
        .stripMargin),

    "q_sessions" ->
      ("""WITH e AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts > lag(ts) OVER w + INTERVAL 360 MINUTE
        |         THEN 1 ELSE 0 END AS opens
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (SELECT user_id, ts, value,
        |    sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id FROM e)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, session_id"""
        .stripMargin),

    "q_dup_windows" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | g AS (SELECT doc_id, array_to_string(t[i.i:i.i+4], ' ') AS gram
        |       FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 4),
        | c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram),
        | s AS (SELECT doc_id, count(*) AS nw,
        |        sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS dup
        |       FROM g JOIN c USING (gram) GROUP BY doc_id)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows, CAST(dup AS BIGINT) AS dup_windows,
        |  round(CAST(dup AS DOUBLE) / nw, 4) AS dup_frac FROM s"""
        .stripMargin),

    "q_drop_dup_spans" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | g AS (SELECT doc_id, i.i - 1 AS pos, array_to_string(t[i.i:i.i+4], ' ') AS gram
        |       FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 4),
        | c AS (SELECT gram, count(*) AS cnt, min(doc_id * 1048576 + pos) AS keeper
        |       FROM g GROUP BY gram),
        | r AS (SELECT doc_id, pos FROM g JOIN c USING (gram)
        |       WHERE cnt >= 2 AND doc_id * 1048576 + pos <> keeper),
        | tk AS (SELECT doc_id, i.i - 1 AS ti, t[i.i] AS tok
        |        FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t)),
        | kept AS (SELECT tk.doc_id, tk.ti, any_value(tk.tok) AS tok,
        |          count(r.pos) > 0 AS rm
        |          FROM tk LEFT JOIN r ON r.doc_id = tk.doc_id
        |            AND r.pos <= tk.ti AND tk.ti < r.pos + 5
        |          GROUP BY tk.doc_id, tk.ti)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN NOT rm THEN tok END, ' ' ORDER BY ti), '') AS text,
        |  CAST(coalesce(sum(CASE WHEN rm THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_removed
        |FROM kept GROUP BY doc_id"""
        .stripMargin),

    "q_main_content" ->
      ("""WITH p AS (SELECT i.i AS doc_id,
        |  'the quick brown fox of document ' || i.i ||
        |  ' jumps over the lazy dog in section ' AS stem
        | FROM range(0, 200) i(i))
        |SELECT doc_id,
        |  stem || '0 and the words keep it prose' ||
        |  CASE WHEN doc_id % 3 >= 1
        |    THEN chr(10) || stem || '1 and the words keep it prose' ELSE '' END ||
        |  CASE WHEN doc_id % 3 >= 2
        |    THEN chr(10) || stem || '2 and the words keep it prose' ELSE '' END AS main_text,
        |  CAST(doc_id % 3 + 4 AS INT) AS n_blocks,
        |  CAST(doc_id % 3 + 1 AS INT) AS n_content_blocks
        |FROM p"""
        .stripMargin),

    "q_anchor_stats" ->
      ("""WITH p AS (SELECT i, 'https://site.test/p' || i AS src
        |   FROM range(200) t(i)),
        | main AS (SELECT i, '/p' || ((i + 1 + k) % 200) AS href,
        |     't' || ((i + 1 + k) % 200) AS text
        |   FROM range(200) t(i), range(3) u(k) WHERE k <= i % 3),
        | noise AS (SELECT i, '/hub' || (i % 10) AS href,
        |     'A & B' || (i % 10) AS text FROM range(200) t(i)),
        | pairs AS (
        |   SELECT p.src, m.href, m.text FROM main m JOIN p USING (i)
        |   UNION ALL
        |   SELECT p.src, n.href, n.text FROM noise n JOIN p USING (i)),
        | bt AS (SELECT href, text, count(*) AS cnt
        |   FROM pairs GROUP BY href, text),
        | top AS (SELECT href, text, cnt, row_number() OVER (
        |     PARTITION BY href ORDER BY cnt DESC, text DESC) AS rk FROM bt),
        | agg AS (SELECT href, CAST(sum(cnt) AS BIGINT) AS n_refs,
        |     count(*) AS n_texts FROM bt GROUP BY href),
        | s2 AS (SELECT href, count(DISTINCT src) AS n_srcs
        |   FROM pairs GROUP BY href)
        |SELECT a.href, a.n_refs, s2.n_srcs, a.n_texts,
        |  t.text AS top_text, t.cnt AS top_cnt
        |FROM agg a JOIN s2 USING (href)
        |JOIN top t ON t.href = a.href AND t.rk = 1"""
        .stripMargin),

    "q_source_mix" ->
      ("""WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
        | t AS (SELECT sum(pow(n, 0.5)) AS wsum, sum(n) AS ntotal FROM c),
        | p AS (SELECT lang, pow(n, 0.5) / wsum * ntotal / n AS p FROM c, t),
        | j AS (SELECT doc_id, d.lang AS grp, p.p AS p,
        |        ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        |       FROM documents d JOIN p ON d.lang = p.lang),
        | k AS (SELECT doc_id, grp, CAST(floor(p) AS BIGINT) +
        |        CASE WHEN h < CAST(floor((p - floor(p)) * 2147483648.0) AS BIGINT)
        |             THEN 1 ELSE 0 END AS copies FROM j)
        |SELECT doc_id, grp, CAST(u.c AS BIGINT) AS copy
        |FROM k, unnest(range(copies)) u(c)"""
        .stripMargin),

    "q_packing" ->
      ("""WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens FROM documents),
        | s AS (SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS st
        |   FROM d)
        |SELECT doc_id, shard, n_tokens, st // 200 AS chunk, st % 200 AS chunk_off FROM s"""
        .stripMargin),

    "q_repetition" ->
      ("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        | g AS (SELECT doc_id, t[i.i] || ' ' || t[i.i+1] AS gram
        |       FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 1),
        | c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
        | s AS (SELECT doc_id, sum(cnt) AS ng, max(cnt) AS mx,
        |        sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(ng AS BIGINT) AS n_grams, round(CAST(mx AS DOUBLE) / ng, 4) AS top_frac,
        |  round(CAST(dup AS DOUBLE) / ng, 4) AS dup_frac FROM s"""
        .stripMargin),

    "q_triangles" ->
      ("""WITH e AS (SELECT DISTINCT least(l_orderkey % 200, l_partkey % 200) AS u,
        |    greatest(l_orderkey % 200, l_partkey % 200) AS v
        |  FROM lineitem WHERE l_orderkey % 200 <> l_partkey % 200),
        | t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |   FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        | r AS (SELECT a AS node FROM t UNION ALL SELECT b AS node FROM t
        |   UNION ALL SELECT c AS node FROM t)
        |SELECT node, count(*) AS n_tri FROM r GROUP BY node"""
        .stripMargin),

    "q_knn_cosine" -> knnOracle,

    "q_knn_lsh" -> knnLshOracle,

    "q_knn_ivf" -> knnIvfOracle,

    "q_cosine_pairs_lsh" -> cosinePairsLshOracle,

    "q_robots_rfc" ->
      ("""SELECT c_custkey AS doc_id,
        | CASE c_custkey % 6
        |  WHEN 0 THEN 'https://h0.test/public/p' || CAST(c_custkey AS VARCHAR)
        |  WHEN 2 THEN 'https://h0.test/private/ok/p' || CAST(c_custkey AS VARCHAR)
        |  WHEN 4 THEN 'https://h1.test/page' || CAST(c_custkey AS VARCHAR) || '.phpx'
        |  ELSE 'https://h2.test/any' || CAST(c_custkey AS VARCHAR) END AS url
        |FROM customer WHERE c_custkey % 6 IN (0, 2, 4, 5)"""
        .stripMargin),

    "q_robots_filter" ->
      ("""WITH p AS (SELECT p_partkey,
        |  'https://h' || CAST(p_partkey % 10 AS VARCHAR) || '.test/' || p_type AS url,
        |  'h' || CAST(p_partkey % 10 AS VARCHAR) || '.test' AS host,
        |  '/' || p_type AS path FROM part),
        | r(host, disallow) AS (VALUES ('h0.test', '/STANDARD'),
        |   ('h1.test', '/SMALL'), ('h2.test', '/MEDIUM'))
        |SELECT p_partkey, url FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM r
        |  WHERE r.host = p.host AND starts_with(p.path, r.disallow))"""
        .stripMargin),

    "q_out_degree" ->
      ("SELECT degree, count(*) AS n_nodes FROM (SELECT l_orderkey, " +
        "count(DISTINCT l_partkey) AS degree FROM lineitem GROUP BY l_orderkey) " +
        "GROUP BY degree"),

    "q_top_indegree" ->
      ("SELECT dst, in_degree FROM (SELECT l_partkey AS dst, " +
        "count(DISTINCT l_orderkey) AS in_degree FROM lineitem GROUP BY l_partkey) " +
        "ORDER BY in_degree DESC, dst ASC LIMIT 20"),

    "q_khop" ->
      ("""WITH RECURSIVE e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
        | r(node, hops) AS (
        |   SELECT CAST(v.node AS BIGINT), v.hops FROM (VALUES (1, 0), (2, 0), (3, 0)) v(node, hops)
        |   UNION ALL
        |   SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node WHERE r.hops < 3)
        |SELECT node, min(hops) AS hops FROM r GROUP BY node"""
        .stripMargin),

    // the same 3-iteration dangling-aware recurrence as chained CTEs
    "q_host_graph" ->
      ("""WITH m AS (SELECT l_orderkey % 50 AS src_grp,
        |     l_partkey % 50 AS dst_grp FROM lineitem)
        |SELECT src_grp, dst_grp, count(*) AS weight
        |FROM m WHERE src_grp <> dst_grp GROUP BY src_grp, dst_grp"""
        .stripMargin),

    "q_host_rank" ->
      ("""WITH m AS (SELECT l_orderkey % 50 AS s, l_partkey % 50 AS d FROM lineitem),
        | e AS (SELECT s AS src, d AS dst, CAST(count(*) AS DOUBLE) AS w
        |   FROM m WHERE s <> d GROUP BY s, d),
        | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        | prm AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        | dg AS (SELECT src, sum(w) AS deg FROM e GROUP BY src),
        | r0 AS (SELECT node, deg, 1.0/(SELECT n FROM prm) AS r
        |   FROM nodes LEFT JOIN dg ON node = src),
        | c1 AS (SELECT e.dst AS node, SUM(r0.r * e.w / r0.deg) AS c FROM r0 JOIN e ON r0.node = e.src GROUP BY e.dst),
        | d1 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r0 WHERE deg IS NULL),
        | r1 AS (SELECT r0.node, r0.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c1.c, 0) + (SELECT dm FROM d1)/(SELECT n FROM prm)) AS r
        |   FROM r0 LEFT JOIN c1 ON r0.node = c1.node),
        | c2 AS (SELECT e.dst AS node, SUM(r1.r * e.w / r1.deg) AS c FROM r1 JOIN e ON r1.node = e.src GROUP BY e.dst),
        | d2 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r1 WHERE deg IS NULL),
        | r2 AS (SELECT r1.node, r1.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c2.c, 0) + (SELECT dm FROM d2)/(SELECT n FROM prm)) AS r
        |   FROM r1 LEFT JOIN c2 ON r1.node = c2.node),
        | c3 AS (SELECT e.dst AS node, SUM(r2.r * e.w / r2.deg) AS c FROM r2 JOIN e ON r2.node = e.src GROUP BY e.dst),
        | d3 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r2 WHERE deg IS NULL),
        | r3 AS (SELECT r2.node, r2.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c3.c, 0) + (SELECT dm FROM d3)/(SELECT n FROM prm)) AS r
        |   FROM r2 LEFT JOIN c3 ON r2.node = c3.node)
        |SELECT node, ROUND(r * (SELECT n FROM prm), 6) AS rank_n FROM r3"""
        .stripMargin),

    "q_pagerank" ->
      ("""WITH e AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem),
        | nd AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
        | prm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nd),
        | dg AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src),
        | r0 AS (SELECT nd.node, dg.deg, 1.0/(SELECT n FROM prm) AS r
        |   FROM nd LEFT JOIN dg ON nd.node = dg.node),
        | c1 AS (SELECT e.dst AS node, SUM(r0.r/r0.deg) AS c FROM r0 JOIN e ON r0.node = e.src GROUP BY e.dst),
        | d1 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r0 WHERE deg IS NULL),
        | r1 AS (SELECT r0.node, r0.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c1.c, 0) + (SELECT dm FROM d1)/(SELECT n FROM prm)) AS r
        |   FROM r0 LEFT JOIN c1 ON r0.node = c1.node),
        | c2 AS (SELECT e.dst AS node, SUM(r1.r/r1.deg) AS c FROM r1 JOIN e ON r1.node = e.src GROUP BY e.dst),
        | d2 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r1 WHERE deg IS NULL),
        | r2 AS (SELECT r1.node, r1.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c2.c, 0) + (SELECT dm FROM d2)/(SELECT n FROM prm)) AS r
        |   FROM r1 LEFT JOIN c2 ON r1.node = c2.node),
        | c3 AS (SELECT e.dst AS node, SUM(r2.r/r2.deg) AS c FROM r2 JOIN e ON r2.node = e.src GROUP BY e.dst),
        | d3 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r2 WHERE deg IS NULL),
        | r3 AS (SELECT r2.node, r2.deg, 0.15/(SELECT n FROM prm)
        |   + 0.85*(COALESCE(c3.c, 0) + (SELECT dm FROM d3)/(SELECT n FROM prm)) AS r
        |   FROM r2 LEFT JOIN c3 ON r2.node = c3.node)
        |SELECT node, ROUND(r * (SELECT n FROM prm), 6) AS rank_n FROM r3"""
        .stripMargin),

    // closed-form components of the arithmetic block graph
    "q_cc" ->
      "SELECT i AS node, (i // 64) * 64 AS component FROM range(4000) t(i)",

    "q_embed_norm" ->
      ("SELECT vec_id, round(sqrt(list_aggregate(list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS norm_r " +
        "FROM embeddings"),

    "q_cosine_pairs" ->
      ("""WITH s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
        |  / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |   * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, round(sim, 4) AS sim_r FROM s WHERE sim >= 0.35"""
        .stripMargin),

    // SemDeDup: within-cluster (axis-sign bits of the first 4 dims)
    // pairwise cosine; drop any vector with a lower-id ≥0.3 neighbor
    "q_semdedup" ->
      ("""WITH e AS (SELECT vec_id, embedding,
        |    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END +
        |     CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS cluster,
        |    sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
        |   FROM embeddings),
        | d AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b
        |       ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |       WHERE (CASE WHEN a.nrm * b.nrm = 0 THEN 0 ELSE
        |         list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
        |         / (a.nrm * b.nrm) END) >= 0.3)
        |SELECT e.vec_id, e.cluster FROM e LEFT JOIN d ON e.vec_id = d.vec_id
        |WHERE d.vec_id IS NULL"""
        .stripMargin),

    "q_crawl_edges" -> crawlOracle("wikipedia", 60L),

    "q_crawl_edges_counties" -> crawlOracle("us_counties", 40L),

    "q_crawl_edges_synonyms" -> crawlOracle("synonyms", 40L),

    "q_crawl_edges_ar" -> crawlOracle("synonyms-ar", 40L)
  )

  /** md5-hex digit i of `gram` as an integer — DuckDB spelling of
    * Spark's conv(substring(md5(gram), 1, 5), 16, 10) one digit at a
    * time (DuckDB has no base-conversion builtin)
    */
  private def hexDigit(i: Int): String =
    s"(strpos('0123456789abcdef', substr(md5(gram), $i, 1)) - 1)"

  /** DuckDB refit of the whole 5-gram stupid-backoff scorer
    * ([[graft.ops.Curation.ngramLogLik]]): k-grams per position,
    * md5-bucketed counts from the doc_id%7==0 model slice, widest
    * model-seen order per position, α-penalized backoff ratio —
    * the exact arithmetic, so the driver gate hash-verifies it.
    */
  private def ngramLlOracle: String = {
    def hd(c: String, i: Int) =
      s"(strpos('0123456789abcdef', substr(md5($c), $i, 1)) - 1)"
    def bucket(c: String) =
      s"((${hd(c, 1)} * 65536 + ${hd(c, 2)} * 4096 + " +
        s"${hd(c, 3)} * 256 + ${hd(c, 4)} * 16 + ${hd(c, 5)}) % 65536)"
    s"""WITH tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       | pos AS (SELECT doc_id, t, p.p AS pos FROM tok, unnest(range(0, len(t))) p(p)),
       | g AS (SELECT doc_id, pos, k.k AS k,
       |     array_to_string(list_slice(t, CAST(pos - k.k + 2 AS INT), CAST(pos + 1 AS INT)), ' ') AS gram,
       |     CASE WHEN k.k >= 2 THEN
       |       array_to_string(list_slice(t, CAST(pos - k.k + 2 AS INT), CAST(pos AS INT)), ' ')
       |     END AS pgram
       |   FROM pos, unnest(range(1, least(pos + 1, 5) + 1)) k(k)),
       | gb AS (SELECT doc_id, pos, k, ${bucket("gram")} AS bucket,
       |     CASE WHEN k >= 2 THEN ${bucket("pgram")} END AS pbucket FROM g),
       | mc AS (SELECT k, bucket, count(*) AS c FROM gb
       |        WHERE doc_id % 7 = 0 GROUP BY k, bucket),
       | nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tot FROM mc WHERE k = 1),
       | j2 AS (SELECT gb.doc_id, gb.pos, gb.k, m1.c AS cnum, m2.c AS cden
       |   FROM gb LEFT JOIN mc m1 ON m1.k = gb.k AND m1.bucket = gb.bucket
       |           LEFT JOIN mc m2 ON m2.k = gb.k - 1 AND m2.bucket = gb.pbucket),
       | best AS (SELECT doc_id, pos, max(k) AS kmax,
       |     max(CASE WHEN cnum IS NOT NULL THEN k END) AS kstar
       |   FROM j2 GROUP BY doc_id, pos),
       | pick AS (SELECT b.doc_id, b.pos, b.kmax, b.kstar, j.cnum, j.cden
       |   FROM best b LEFT JOIN j2 j
       |     ON j.doc_id = b.doc_id AND j.pos = b.pos AND j.k = b.kstar),
       | sc AS (SELECT doc_id,
       |     CASE WHEN kstar IS NULL THEN (kmax - 1) * ln(0.4) + ln(1.0 / (n_tot + 65536.0))
       |          WHEN kstar = 1 THEN (kmax - 1) * ln(0.4) + ln(CAST(cnum AS DOUBLE) / n_tot)
       |          ELSE (kmax - kstar) * ln(0.4) + ln(CAST(cnum AS DOUBLE) / CAST(cden AS DOUBLE))
       |     END AS l
       |   FROM pick CROSS JOIN nt)
       |SELECT doc_id, round(avg(l), 4) AS avg_nll FROM sc GROUP BY doc_id"""
      .stripMargin
  }

  /** Shared CTE for the DSIR oracles: hashed n-gram (unigram+bigram)
    * models over the deterministic target/raw partition of
    * `documents`; bucket = first 5 md5 hex digits mod 2^16 — the
    * exact arithmetic of [[graft.ops.Curation.md5Bucket]], so DuckDB
    * reproduces every bucket (including collisions) bit-identically.
    */
  private def dsirWeightsCte: String = {
    val bucket = s"((${hexDigit(1)} * 65536 + ${hexDigit(2)} * 4096 + " +
      s"${hexDigit(3)} * 256 + ${hexDigit(4)} * 16 + ${hexDigit(5)}) % 65536)"
    s"""WITH rtok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |   FROM documents WHERE doc_id % 7 <> 0),
       | ttok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |   FROM documents WHERE doc_id % 7 = 0),
       | rg AS (SELECT doc_id, u.tok AS gram FROM rtok, unnest(t) u(tok)
       |        UNION ALL
       |        SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
       |        FROM rtok, unnest(range(1, len(t))) r(i)),
       | tg AS (SELECT doc_id, u.tok AS gram FROM ttok, unnest(t) u(tok)
       |        UNION ALL
       |        SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
       |        FROM ttok, unnest(range(1, len(t))) r(i)),
       | rb AS (SELECT doc_id, $bucket AS bucket FROM rg),
       | tb AS (SELECT $bucket AS bucket FROM tg),
       | tc AS (SELECT bucket, count(*) AS ct FROM tb GROUP BY bucket),
       | rc AS (SELECT bucket, count(*) AS cr FROM rb GROUP BY bucket),
       | j AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
       |         coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
       |       FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
       | tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS tt,
       |                CAST(sum(cr) AS DOUBLE) AS tr FROM j),
       | model AS (SELECT bucket,
       |     ln((ct + 1.0) / (tt + 65536.0)) - ln((cr + 1.0) / (tr + 65536.0)) AS lr
       |   FROM j CROSS JOIN tot),
       | dc AS (SELECT doc_id, bucket, count(*) AS c FROM rb GROUP BY doc_id, bucket)"""
      .stripMargin
  }

  /** Shared CTE for the classifier oracles: the full 2-iteration
    * full-batch GD of [[graft.ops.Classifier.trainLogistic]] unrolled
    * in SQL — md5-bucketed unigram+bigram features x (normalized per
    * doc), label y = (lang = 'en'), closed-form first step at w = 0
    * (σ = 0.5 everywhere), then one sigmoid-margin pass and gradient
    * update. lr = 10, buckets = 2^16.
    */
  private def classifierCte: String = {
    val bucket = s"((${hexDigit(1)} * 65536 + ${hexDigit(2)} * 4096 + " +
      s"${hexDigit(3)} * 256 + ${hexDigit(4)} * 16 + ${hexDigit(5)}) % 65536)"
    s"""WITH tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |   FROM documents),
       | g AS (SELECT doc_id, u.tok AS gram FROM tok, unnest(t) u(tok)
       |        UNION ALL
       |        SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
       |        FROM tok, unnest(range(1, len(t))) r(i)),
       | b AS (SELECT doc_id, $bucket AS bucket FROM g),
       | c AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket),
       | f AS (SELECT doc_id, bucket,
       |        CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY doc_id) AS x FROM c),
       | y AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |       FROM documents),
       | nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       | w1 AS (SELECT bucket, -10.0 * sum((0.5 - y) * x) / (SELECT n FROM nn) AS w
       |        FROM f JOIN y USING (doc_id) GROUP BY bucket),
       | p2 AS (SELECT doc_id, 1.0 / (1.0 + exp(-sum(x * w))) AS p
       |        FROM f JOIN w1 USING (bucket) GROUP BY doc_id),
       | g2 AS (SELECT bucket, sum((p - y) * x) AS g
       |        FROM f JOIN p2 USING (doc_id) JOIN y USING (doc_id) GROUP BY bucket),
       | w2 AS (SELECT w1.bucket, w1.w - 10.0 * g2.g / (SELECT n FROM nn) AS w
       |        FROM w1 JOIN g2 USING (bucket))"""
      .stripMargin
  }

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private def stopLenSql(lang: String): String =
    s"len(list_filter(string_split_regex(text, '\\s+'), x -> x IN ${sqlList(TextOps.stopwords(lang))}))"

  private def qualityOracle: String = {
    val stops = stopLenSql("en")
    s"""SELECT doc_id, length(text) AS n_chars,
       | len(string_split_regex(text, '\\s+')) AS n_tokens,
       | CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       | CAST($stops AS DOUBLE) / len(string_split_regex(text, '\\s+')) AS stop_ratio,
       | CAST(length(text) - len(string_split_regex(text, '\\s+')) + 1 AS DOUBLE) / len(string_split_regex(text, '\\s+')) AS mean_tok_len,
       | (CASE WHEN len(string_split_regex(text, '\\s+')) >= 10 THEN 0.5 ELSE 0.0 END
       |  + CASE WHEN CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) <= 0.1 THEN 0.25 ELSE 0.0 END
       |  + CASE WHEN CAST($stops AS DOUBLE) / len(string_split_regex(text, '\\s+')) >= 0.05 THEN 0.25 ELSE 0.0 END) AS quality
       |FROM documents""".stripMargin
  }

  private def langIdOracle: String = {
    val scores = Seq("en", "de", "fr", "es")
      .map(l => l -> stopLenSql(l)).toMap
    val g = s"greatest(${scores.values.mkString(", ")})"
    s"""SELECT doc_id, CASE
       | WHEN ${scores("en")} = $g AND $g > 0 THEN 'en'
       | WHEN ${scores("de")} = $g AND $g > 0 THEN 'de'
       | WHEN ${scores("fr")} = $g AND $g > 0 THEN 'fr'
       | WHEN ${scores("es")} = $g AND $g > 0 THEN 'es'
       | ELSE 'und' END AS lang_guess
       |FROM documents""".stripMargin
  }

  /** exact 3-gram Jaccard pairs ≥ 0.8 as a reusable CTE tail (`pr`) —
    * shared by the pair, clustering and incremental-keep oracles
    */
  private def jaccardPairsCte: String =
    """toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      | g AS (SELECT DISTINCT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS gram
      |       FROM toks, (SELECT unnest(range(1, 100000)) AS i) i WHERE i.i <= len(t) - 2),
      | sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      | inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |   FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2),
      | pr AS (SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
      |   FROM inter JOIN sz s1 ON s1.doc_id = doc_a JOIN sz s2 ON s2.doc_id = doc_b
      |   WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.8)""".stripMargin

  private def jaccardOracle: String =
    "WITH " + jaccardPairsCte + "\nSELECT doc_a, doc_b, jaccard FROM pr"

  /** first-5-md5-hex-digits integer of SQL expression `c` — the DuckDB
    * spelling of Spark's conv(substring(md5(c), 1, 5), 16, 10), shared
    * by every md5-arithmetic signature oracle
    */
  private def md5Int20(c: String): String = {
    def hd(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5($c), $i, 1)) - 1)"
    s"(${hd(1)} * 65536 + ${hd(2)} * 4096 + ${hd(3)} * 256 + " +
      s"${hd(4)} * 16 + ${hd(5)})"
  }

  /** md5-mode MinHash band keys over `documents` — the foreign twin of
    * [[graft.ops.Dedup.lshBandKeysMd5]] (k=16, bands=4, shingleN=3):
    * x = first-5-md5-hex-digits integer of the 3-gram shingle, sig[j]
    * = min over shingles of the j-th affine permutation (A_j·x + B_j)
    * mod 2²⁰ (constants mirrored from Dedup.minhashPermA/B), bucket =
    * the band's 4 signature values comma-joined. Docs with no shingles
    * are absent here where Spark emits all-sentinel signatures — their
    * buckets can only pair empty docs with each other, and those pairs
    * die in the verify stage on both sides. Emits CTEs toks, sh, xs,
    * hs, bk.
    */
  private def minhashBandCte: String =
    s"""toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       | sh AS (SELECT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS s
       |        FROM toks, unnest(range(1, len(t) - 1)) i(i)),
       | xs AS (SELECT doc_id, ${md5Int20("s")} AS x FROM sh),
       | hs AS (SELECT doc_id, j.j AS j,
       |          min((x * (((2 * j.j + 1) * 2654435761) % 1048576)
       |               + ((40503 * j.j + 17) % 1048576)) % 1048576) AS sig
       |        FROM xs, unnest(range(0, 16)) j(j) GROUP BY doc_id, j.j),
       | bk AS (SELECT doc_id, CAST(j // 4 AS INT) AS band,
       |          string_agg(sig::VARCHAR, ',' ORDER BY j) AS bucket
       |        FROM hs GROUP BY doc_id, j // 4)""".stripMargin

  /** capped within-corpus candidate pairs + exact-Jaccard verify over
    * the md5 band keys — ends in CTE `pr` (doc_a, doc_b, jaccard ≥
    * 0.8), the foreign twin of Dedup.minhashNearDupsMd5's chain
    */
  private def minhashPairsCte: String =
    minhashBandCte + ",\n" +
      """ bsz AS (SELECT band, bucket, count(*) AS n FROM bk GROUP BY 1, 2),
        | cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
        |            AND a.doc_id < b.doc_id
        |          JOIN bsz z ON z.band = a.band AND z.bucket = a.bucket
        |          WHERE z.n <= 1000),
        | g AS (SELECT DISTINCT doc_id, s AS gram FROM sh),
        | sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        | inter AS (SELECT c.doc_a, c.doc_b, count(*) AS c
        |           FROM cand c JOIN g ga ON ga.doc_id = c.doc_a
        |           JOIN g gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
        |           GROUP BY 1, 2),
        | pr AS (SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
        |   FROM inter JOIN sz s1 ON s1.doc_id = doc_a JOIN sz s2 ON s2.doc_id = doc_b
        |   WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.8)""".stripMargin

  /** recursive-CTE closure of the md5-mode pair list — the foreign
    * twin of Dedup.nearDupClustersMd5 (pairs + star-contraction CC)
    */
  private def dedupClustersOracle: String =
    "WITH RECURSIVE " + minhashPairsCte + ",\n" +
      """ e AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |       UNION ALL SELECT doc_b, doc_a FROM pr),
        | reach(node, lbl) AS (
        |   SELECT doc_id, doc_id FROM documents
        |   UNION
        |   SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.node)
        |SELECT node AS doc_id, min(lbl) AS cluster_id,
        |  CAST(min(lbl) = node AS BIGINT) AS is_canonical
        |FROM reach GROUP BY node""".stripMargin

  /** cross-snapshot (odd = new, even = corpus) md5-mode candidate join
    * with the corpus-side bucket cap, then exact-Jaccard verify — the
    * foreign twin of Dedup.minhashNearDupsAgainstMd5
    */
  private def incrNearOracle: String =
    "WITH " + minhashBandCte + ",\n" +
      """ csz AS (SELECT band, bucket, count(*) AS n FROM bk
        |         WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        | cand AS (SELECT DISTINCT nb.doc_id AS new_id, cb.doc_id AS corpus_id
        |          FROM bk nb JOIN bk cb ON nb.band = cb.band AND nb.bucket = cb.bucket
        |          JOIN csz z ON z.band = cb.band AND z.bucket = cb.bucket
        |          WHERE nb.doc_id % 2 = 1 AND cb.doc_id % 2 = 0 AND z.n <= 1000),
        | g AS (SELECT DISTINCT doc_id, s AS gram FROM sh),
        | sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        | inter AS (SELECT c.new_id, c.corpus_id, count(*) AS c
        |           FROM cand c JOIN g ga ON ga.doc_id = c.new_id
        |           JOIN g gb ON gb.doc_id = c.corpus_id AND gb.gram = ga.gram
        |           GROUP BY 1, 2)
        |SELECT i.new_id, i.corpus_id,
        |  CAST(i.c AS DOUBLE) / (s1.n + s2.n - i.c) AS jaccard
        |FROM inter i JOIN sz s1 ON s1.doc_id = i.new_id
        |  JOIN sz s2 ON s2.doc_id = i.corpus_id
        |WHERE CAST(i.c AS DOUBLE) / (s1.n + s2.n - i.c) >= 0.8""".stripMargin

  /** md5-mode SimHash fingerprints — the foreign twin of
    * [[graft.ops.TextOps.simhashMd5]]: per-token-occurrence ±1 votes
    * on 64 bits (bit i = bit i%4 of md5 hex digit 16 - i/4), sign
    * bits reassembled with bit 63 wrapping negative like Java's
    * 1L << 63. Votes fold token MULTIPLICITY so each distinct token's
    * md5 is computed once. Ends in CTE fp (doc_id, fp).
    */
  private def simhashFpCte: String = {
    val dig = "(strpos('0123456789abcdef', " +
      "substr(md5(tok), CAST(16 - b.b // 4 AS INT), 1)) - 1)"
    s"""stoks AS (SELECT doc_id, u.tok AS tok
       |   FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |         FROM documents), unnest(t) u(tok)),
       | tcnt AS (SELECT doc_id, tok, count(*) AS m FROM stoks GROUP BY 1, 2),
       | votes AS (SELECT doc_id, b.b AS bit,
       |     sum(CASE WHEN ($dig >> CAST(b.b % 4 AS INT)) & 1 = 1
       |         THEN m ELSE -m END) AS v
       |   FROM tcnt, unnest(range(0, 64)) b(b) GROUP BY doc_id, b.b),
       | fp AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN
       |       CASE WHEN bit = 63 THEN -9223372036854775807 - 1
       |            ELSE (1::BIGINT << CAST(bit AS INT)) END
       |     ELSE 0 END) AS BIGINT) AS fp
       |   FROM votes GROUP BY doc_id)""".stripMargin
  }

  /** the 64-bit banded-hamming pair machinery over a CTE named
    * `fp($idCol, fp)` — the foreign twin of
    * Dedup.simhashNearDupsFromFps (identical-fp star collapse,
    * 16-bit-chunk buckets capped at 1000 distinct fps, exact
    * Hamming ≤ 3), shared by the text-simhash and image-aHash
    * oracles. Unsigned chunk extraction goes through HUGEINT division
    * (DuckDB's >> is arithmetic on negative BIGINT). Yields columns
    * (doc_a, doc_b, dist).
    */
  private def hammingPairsSql(idCol: String): String =
    s""" grp AS (SELECT fp, min($idCol) AS rep FROM fp GROUP BY fp),
       | within AS (SELECT g.rep AS doc_a, f.$idCol AS doc_b, 0::BIGINT AS dist
       |   FROM fp f JOIN grp g ON g.fp = f.fp WHERE f.$idCol <> g.rep),
       | ufp AS (SELECT rep, fp,
       |     CASE WHEN fp < 0 THEN CAST(fp AS HUGEINT) + 18446744073709551616
       |          ELSE CAST(fp AS HUGEINT) END AS u
       |   FROM grp),
       | chunks AS (SELECT rep, fp, p.p AS chunk_pos,
       |     CAST((u // (CASE p.p WHEN 0 THEN 1 WHEN 1 THEN 65536
       |       WHEN 2 THEN 4294967296 ELSE 281474976710656 END)) % 65536
       |       AS BIGINT) AS chunk
       |   FROM ufp, unnest(range(0, 4)) p(p)),
       | bsz AS (SELECT chunk_pos, chunk, count(*) AS n FROM chunks
       |         GROUP BY 1, 2),
       | crossp AS (SELECT DISTINCT least(a.rep, b.rep) AS doc_a,
       |     greatest(a.rep, b.rep) AS doc_b,
       |     CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |   FROM chunks a JOIN chunks b ON a.chunk_pos = b.chunk_pos
       |     AND a.chunk = b.chunk AND a.rep < b.rep
       |   JOIN bsz z ON z.chunk_pos = a.chunk_pos AND z.chunk = a.chunk
       |   WHERE z.n <= 1000)""".stripMargin

  /** the full simhash near-dup chain over md5-mode fingerprints */
  private def simhashPairsOracle: String =
    "WITH " + simhashFpCte + ",\n" + hammingPairsSql("doc_id") + "\n" +
      """SELECT doc_a, doc_b, dist FROM within
        |UNION ALL
        |SELECT doc_a, doc_b, dist FROM crossp WHERE dist <= 3""".stripMargin

  /** DuckDB refit of the image near-dup chain — the foreign twin of
    * Multimodal.imageNearDups over syntheticNearDupImages(200, seed 7):
    * the generative md5-parity pixel pattern yields each aHash cell
    * mean arithmetically (cells are 4×4 constant-luminance blocks; the
    * odd member's one-pixel nudge shifts cell 0 to (15v + 23)/16),
    * the global mean folds the 64 cell means in index order, bit c =
    * (mean_c > global), bit 63 wraps negative — then the shared
    * banded-hamming machinery emits the pairs. Spark decodes REAL PNG
    * bytes; the oracle recomputes the expectation, so a decode or
    * hash mis-step breaks the driver's compare.
    */
  private def imageNearDupOracle: String = {
    val bit = md5Int20("'img:7:' || (m.m // 2) || ':' || c.c")
    s"""WITH cells AS (SELECT m.m AS media_id, c.c AS cell,
       |     CASE WHEN $bit % 2 = 1 THEN 230 ELSE 20 END AS v
       |   FROM unnest(range(0, 200)) m(m), unnest(range(0, 64)) c(c)),
       | means AS (SELECT media_id, cell,
       |     CASE WHEN cell = 0 AND media_id % 2 = 1 THEN (15.0 * v + 23.0) / 16.0
       |          ELSE CAST(v AS DOUBLE) END AS mv
       |   FROM cells),
       | gm AS (SELECT media_id,
       |     list_aggregate(list(mv ORDER BY cell), 'sum') / 64.0 AS g
       |   FROM means GROUP BY media_id),
       | fp AS (SELECT media_id, CAST(sum(CASE WHEN mv > g THEN
       |       CASE WHEN cell = 63 THEN -9223372036854775807 - 1
       |            ELSE (1::BIGINT << CAST(cell AS INT)) END
       |     ELSE 0 END) AS BIGINT) AS fp
       |   FROM means JOIN gm USING (media_id) GROUP BY media_id),
       |""".stripMargin + hammingPairsSql("media_id") + "\n" +
      """SELECT doc_a AS media_a, doc_b AS media_b, dist FROM within
        |UNION ALL
        |SELECT doc_a AS media_a, doc_b AS media_b, dist FROM crossp
        |WHERE dist <= 3""".stripMargin
  }

  /** All `n` BPE merge rounds of [[graft.ops.Bpe.trainMerges]]
    * unrolled in SQL (the q_classifier_train unrolling pattern): each
    * round recounts adjacent symbol pairs over the evolving word-type
    * table, picks argmax with the (count DESC, left, right) binary-
    * collation tie-break, and applies the merge via delimiter-exact
    * string replace. Words are stored as symbols joined by TWO spaces
    * and padded with one space per side for the replace, so the
    * pattern ' a  b ' can neither match inside a symbol nor chain
    * into an overlapping occurrence — sequential leftmost replace
    * then equals Sennrich's left-to-right non-overlapping merge.
    */
  /** the shared merge-round CTE chain (wc, w0, p_i/m_i/w_i per round).
    * Every evolving CTE is MATERIALIZED: the default inlining expands
    * w30 into a plan that re-opens the documents parquet once per
    * round per reference and exhausts the process fd limit.
    */
  private def bpeRoundsCte(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""wc AS MATERIALIZED (SELECT word, count(*) AS cnt FROM
       |   (SELECT u.word AS word FROM
       |      (SELECT string_split_regex(text, '\\s+') AS t FROM documents),
       |      unnest(t) u(word))
       |  WHERE length(word) > 0 GROUP BY word),
       | w0 AS MATERIALIZED (SELECT array_to_string(
       |     list_append(regexp_extract_all(word, '.'), '</w>'), '  ') AS w,
       |   cnt FROM wc)""".stripMargin
    for (i <- 1 to nMerges) {
      sb ++= s""",
         | p$i AS MATERIALIZED (SELECT s[k.k] AS a, s[k.k + 1] AS b, sum(cnt) AS c
         |   FROM (SELECT string_split(w, '  ') AS s, cnt FROM w${i - 1}),
         |     unnest(range(1, len(s))) k(k)
         |   GROUP BY 1, 2),
         | m$i AS MATERIALIZED (SELECT a, b, c FROM p$i WHERE c >= 2
         |   ORDER BY c DESC, a, b LIMIT 1),
         | w$i AS MATERIALIZED (SELECT CASE WHEN NOT EXISTS (SELECT 1 FROM m$i) THEN w
         |     ELSE trim(replace(' ' || w || ' ',
         |       ' ' || (SELECT a FROM m$i) || '  ' || (SELECT b FROM m$i) || ' ',
         |       ' ' || (SELECT a || b FROM m$i) || ' ')) END AS w, cnt
         |   FROM w${i - 1})""".stripMargin
    }
    sb.toString
  }

  private def bpeMergesOracle(nMerges: Int): String =
    "WITH " + bpeRoundsCte(nMerges) + "\n" +
      (1 to nMerges).map(i =>
        s"""SELECT ${i - 1}::BIGINT AS "rank", a AS "left", b AS "right", """ +
          s"a || b AS merged, c::BIGINT AS pair_count FROM m$i")
        .mkString("\nUNION ALL\n")

  /** DuckDB refit of greedy BPE ENCODING (the GPT-2 encoder loop) —
    * the foreign twin of Bpe.encode over Bpe.trainMerges(nMerges=20):
    * the merge table comes from the same unrolled rounds as
    * q_bpe_merges, and each distinct word type is encoded by a
    * RECURSIVE CTE that, per step, ranks every adjacent symbol pair
    * against the merge list (unranked → 999999 sentinel), merges the
    * FIRST occurrence of the lowest-ranked pair, and stops when no
    * pair is ranked — exactly encodeWord's scan-merge-rescan loop.
    * Document rows then join their words (in position order) to the
    * terminal states; docs with no words survive via the final left
    * join.
    */
  private def bpeEncodeOracle(nMerges: Int): String =
    "WITH RECURSIVE " + bpeRoundsCte(nMerges) + s""",
      | mg AS (${(1 to nMerges).map(i =>
           s"SELECT a, b, ${i - 1} AS r FROM m$i").mkString(" UNION ALL ")}),
      | ml AS MATERIALIZED (SELECT list(a || ' ' || b ORDER BY r) AS l FROM mg),
      | enc(word, st) AS (
      |   SELECT word, array_to_string(
      |       list_append(regexp_extract_all(word, '.'), '</w>'), '  ')
      |   FROM wc
      |   UNION ALL
      |   SELECT word, array_to_string(list_concat(list_concat(
      |       list_slice(s, 1, ba - 1), [s[ba] || s[ba + 1]]),
      |       list_slice(s, ba + 2, len(s))), '  ')
      |   FROM (
      |     SELECT word, s, list_position(rks, list_aggregate(rks, 'min')) AS ba
      |     FROM (
      |       SELECT word, s, list_transform(range(1, len(s)),
      |           k -> coalesce(nullif(list_position(ml.l,
      |             s[k] || ' ' || s[k + 1]), 0), 999999)) AS rks
      |       FROM (SELECT word, string_split(st, '  ') AS s FROM enc), ml)
      |     WHERE len(s) > 1 AND list_aggregate(rks, 'min') < 999999)),
      | fin AS (SELECT word, st FROM (
      |     SELECT word, st, string_split(st, '  ') AS s FROM enc), ml
      |   WHERE NOT (len(s) > 1 AND
      |     coalesce(list_aggregate(list_transform(range(1, len(s)),
      |       k -> coalesce(nullif(list_position(ml.l,
      |         s[k] || ' ' || s[k + 1]), 0), 999999)), 'min'), 999999) < 999999)),
      | dwords AS (SELECT doc_id, p.p AS pos, t[p.p] AS word
      |   FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
      |         FROM documents),
      |     unnest(range(1, len(t) + 1)) p(p)
      |   WHERE length(t[p.p]) > 0),
      | dtoks AS (SELECT d.doc_id, d.pos, replace(f.st, '  ', ' ') AS toks,
      |     len(string_split(f.st, '  ')) AS ntok
      |   FROM dwords d JOIN fin f ON f.word = d.word),
      | agg AS (SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |     string_agg(toks, ' ' ORDER BY pos) AS tokens
      |   FROM dtoks GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
      |  coalesce(a.tokens, '') AS tokens
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** recursive-CTE min-label closure over the exact pair list — the
    * foreign twin of star-contraction connected components
    */
  private def clusterComponentsOracle: String =
    "WITH RECURSIVE " + jaccardPairsCte + ",\n" +
      """ e AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |       UNION ALL SELECT doc_b, doc_a FROM pr),
        | reach(node, lbl) AS (
        |   SELECT doc_id, doc_id FROM documents
        |   UNION
        |   SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.node)
        |SELECT node AS doc_id, min(lbl) AS cluster_id,
        |  CAST(min(lbl) = node AS BIGINT) AS is_canonical
        |FROM reach GROUP BY node""".stripMargin

  private def incrKeepOracle: String =
    "WITH " + jaccardPairsCte + ",\n" +
      """ cross_new AS (SELECT DISTINCT
        |     CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS doc_id
        |   FROM pr WHERE doc_a % 2 <> doc_b % 2)
        |SELECT n.doc_id FROM documents n
        |WHERE n.doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM documents o
        |                  WHERE o.doc_id % 2 = 0 AND o.text = n.text)
        |  AND n.doc_id NOT IN (SELECT doc_id FROM cross_new)""".stripMargin

  /** md5-mode hyperplane sign-bit buckets over `embeddings` — the
    * foreign twin of Similarity.hyperplanesMd5 + lshBucket: plane
    * component [t][b][d] = md5Int20('h:t:b:d') / 2¹⁹ − 1 (exact
    * power-of-two division, bit-identical doubles on both engines),
    * dot products fold the zipped lists left-to-right (the
    * established knnOracle summation), bucket = Σ 2^b over
    * non-negative dots. Emits CTEs pl, plv, dots, bkt.
    */
  private def lshBucketCte(nBits: Int, tables: Int): String =
    s"""pl AS (SELECT t.t AS tbl, b.b AS bit, d.d AS dim,
       |    ${md5Int20("'h:' || t.t || ':' || b.b || ':' || d.d")} / 524288.0 - 1.0 AS w
       |  FROM unnest(range(0, $tables)) t(t), unnest(range(0, $nBits)) b(b),
       |    unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) d(d)),
       | plv AS (SELECT tbl, bit, list(w ORDER BY dim) AS pw FROM pl GROUP BY 1, 2),
       | dots AS (SELECT e.vec_id, p.tbl, p.bit,
       |     list_aggregate(list_transform(list_zip(e.embedding, p.pw),
       |       z -> CAST(z[1] AS DOUBLE) * z[2]), 'sum') AS dp
       |   FROM embeddings e, plv p),
       | bkt AS (SELECT vec_id, tbl AS table_id,
       |     CAST(sum(CASE WHEN dp >= 0 THEN (1::BIGINT << CAST(bit AS INT))
       |              ELSE 0 END) AS BIGINT) AS bucket
       |   FROM dots GROUP BY 1, 2)""".stripMargin

  private val cosQC: String =
    """list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |  / (sqrt(list_aggregate(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |   * sqrt(list_aggregate(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"""
      .stripMargin

  /** the foreign twin of Similarity.lshTopKMd5 (k=5, nBits=6,
    * tables=6, queries = vec_id < 8)
    */
  private def knnLshOracle: String =
    "WITH " + lshBucketCte(6, 6) + ",\n" +
      s""" cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
        |   FROM bkt q JOIN bkt c ON q.table_id = c.table_id AND q.bucket = c.bucket
        |   WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        | sims AS (SELECT cd.query_id, cd.vec_id, $cosQC AS sim
        |   FROM cand cd JOIN embeddings q ON q.vec_id = cd.query_id
        |     JOIN embeddings c ON c.vec_id = cd.vec_id),
        | ranked AS (SELECT query_id, vec_id, sim,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY sim DESC, vec_id ASC) AS rank
        |   FROM sims)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
        |  round(sim, 4) AS sim_r
        |FROM ranked WHERE rank <= 5""".stripMargin

  /** DuckDB refit of the ENTIRE IVF quantizer + query path — the
    * foreign twin of Similarity.ivfTopK (nCentroids=16, nprobe=6,
    * k=5, 1 Lloyd iteration, queries = vec_id < 8): hash-ordered
    * sample init, one assignment pass (argmin of |c|² − 2·v·c with
    * lowest-index tie-break), per-(centroid, dim) means ROUNDED to
    * 6 decimals (the rounding is part of ivfCentroidsLloyd's contract
    * precisely so both engines' ulp-divergent partial sums collapse
    * to the same double), empty centroids kept, re-assignment, probe
    * of the 6 nearest centroids per query, exact cosine top-5.
    */
  private def knnIvfOracle: String = {
    val dim = "(SELECT max(len(embedding)) FROM embeddings)"
    def dotCw(e: String, c: String) =
      s"""list_aggregate(list_transform(list_zip($e, $c),
         |      z -> CAST(z[1] AS DOUBLE) * z[2]), 'sum')""".stripMargin
    s"""WITH ci AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cid,
       |     embedding
       |   FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
       | c0 AS (SELECT cid, d.d AS dim, CAST(embedding[d.d + 1] AS DOUBLE) AS w
       |   FROM ci, unnest(range(0, $dim)) d(d)),
       | c0n AS (SELECT cid, list(w ORDER BY dim) AS cw,
       |     list_aggregate(list_transform(list(w ORDER BY dim), x -> x * x), 'sum') AS c2
       |   FROM c0 GROUP BY cid),
       | a0 AS (SELECT e.vec_id, c.cid,
       |     c.c2 - 2 * ${dotCw("e.embedding", "c.cw")} AS dist
       |   FROM embeddings e, c0n c),
       | asg0 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |     row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |   FROM a0) WHERE rn = 1),
       | mn AS (SELECT a.cid, d.d AS dim,
       |     round(avg(CAST(e.embedding[d.d + 1] AS DOUBLE)), 6) AS m
       |   FROM asg0 a JOIN embeddings e USING (vec_id),
       |     unnest(range(0, $dim)) d(d)
       |   GROUP BY 1, 2),
       | c1 AS (SELECT c0.cid, c0.dim, coalesce(mn.m, c0.w) AS w
       |   FROM c0 LEFT JOIN mn ON mn.cid = c0.cid AND mn.dim = c0.dim),
       | c1n AS (SELECT cid, list(w ORDER BY dim) AS cw,
       |     list_aggregate(list_transform(list(w ORDER BY dim), x -> x * x), 'sum') AS c2
       |   FROM c1 GROUP BY cid),
       | a1 AS (SELECT e.vec_id, c.cid,
       |     c.c2 - 2 * ${dotCw("e.embedding", "c.cw")} AS dist
       |   FROM embeddings e, c1n c),
       | asg1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |     row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |   FROM a1) WHERE rn = 1),
       | probe AS (SELECT vec_id AS query_id, cid FROM (SELECT vec_id, cid,
       |     row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |   FROM a1 WHERE vec_id < 8) WHERE rn <= 6),
       | cand AS (SELECT DISTINCT p.query_id, x.vec_id
       |   FROM probe p JOIN asg1 x ON x.cid = p.cid
       |   WHERE x.vec_id <> p.query_id),
       | sims AS (SELECT cd.query_id, cd.vec_id, $cosQC AS sim
       |   FROM cand cd JOIN embeddings q ON q.vec_id = cd.query_id
       |     JOIN embeddings c ON c.vec_id = cd.vec_id),
       | ranked AS (SELECT query_id, vec_id, sim,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY sim DESC, vec_id ASC) AS rank
       |   FROM sims)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
       |  round(sim, 4) AS sim_r
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** the foreign twin of Similarity.cosineNearDupsMd5 (threshold 0.3,
    * nBits=4, tables=8, maxBucket=10000)
    */
  private def cosinePairsLshOracle: String =
    "WITH " + lshBucketCte(4, 8) + ",\n" +
      s""" bsz AS (SELECT table_id, bucket, count(*) AS n FROM bkt GROUP BY 1, 2),
        | cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |   FROM bkt a JOIN bkt b ON a.table_id = b.table_id
        |     AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        |   JOIN bsz z ON z.table_id = a.table_id AND z.bucket = a.bucket
        |   WHERE z.n <= 10000),
        | sims AS (SELECT cd.vec_a, cd.vec_b, $cosQC AS sim
        |   FROM cand cd JOIN embeddings q ON q.vec_id = cd.vec_a
        |     JOIN embeddings c ON c.vec_id = cd.vec_b)
        |SELECT vec_a, vec_b, round(sim, 4) AS sim_r FROM sims
        |WHERE sim >= 0.3""".stripMargin

  private def knnOracle: String =
    """WITH sims AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |    list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |    / (sqrt(list_aggregate(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |     * sqrt(list_aggregate(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
      | ranked AS (SELECT query_id, vec_id, sim,
      |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
      |   FROM sims)
      |SELECT query_id, rank, vec_id, round(sim, 4) AS sim_r FROM ranked WHERE rank <= 5""".stripMargin
}
