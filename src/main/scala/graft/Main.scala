package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.engine.CrawlEngine
import graft.model.CrawlConfig
import graft.sites.{Seeds, SiteProfile, Sites, SyntheticWeb}
import graft.state.Store

/** CLI entry — the reference's API of record (main.go:77-134: verbs
  * `wikipedia | synonyms | synonyms-ar | us_counties`, plus our `web`
  * bench profile) with the same env surface (main.go:20-48 +
  * util/util.go:15-44 + counties/counties.go:31-46):
  *
  *   MAX_APPROX_NODES   node budget; -1 = unlimited (required there,
  *                      defaulted here)
  *   PARALLELISM        local core count (colly Parallelism)
  *   STARTING_ENDPOINT  seed URL; beats any word list
  *   ENGLISH_WORD_LIST_PATH  synonyms seed words (lowercased — the
  *                      only site whose reader lowercases,
  *                      synonyms/synonyms.go:30-37)
  *   ARABIC_WORD_LIST_PATH   synonyms-ar seed words (NOT lowercased,
  *                      ar_synonyms/ar_synonyms.go:34-41)
  *   COUNTIES_LIST      counties allow-list AND seed words; REQUIRED
  *                      for us_counties — missing is fatal, the
  *                      reference panics (counties.go:34-38). The
  *                      sentinel value `synthetic` uses the generated
  *                      fixture list.
  *   WORD_LIST_PATH     generic fallback honored for any site
  *   HOST_BUDGET        pages per host per batch (politeness; the
  *                      LimitRule analogue — MS_DELAY wall-clock delay
  *                      is meaningless over a static corpus)
  *   CRAWL_STORE        state root (resume point); default under /tmp
  *   CORPUS_PAGES       synthetic corpus size
  *
  * The reference exits fatally on invalid env (parseEnv); we do the
  * same via require()/sys.error.
  */
object Main {

  /** numeric env parsing with the reference's validation
    * (main.go:37-47: integer, and ≥1 or exactly -1)
    */
  def envLong(env: Map[String, String], name: String, default: Long): Long =
    env.get(name).map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          sys.error(s"$name must be an integer, got '$v'")
      }
      require(n >= 1 || n == -1, s"$name must be >= 1 or -1")
      n
    }.getOrElse(default)

  /** Seed resolution order mirrors crawler/crawler.go:30-39:
    * explicit STARTING_ENDPOINT, else a word picked from the site's
    * OWN word-list env var (with the site's own lowercase rule,
    * util/util.go:15-44 call sites), else the synthetic page-0 seed
    * (replacing the reference's random-article API).
    */
  def resolveSeedUrl(spark: SparkSession, profile: SiteProfile,
      spec: SyntheticWeb.Spec, env: Map[String, String]): String =
    env.get("STARTING_ENDPOINT").filter(_.nonEmpty).getOrElse {
      val path = (if (profile.seedEnv.nonEmpty) env.get(profile.seedEnv) else None)
        .orElse(env.get("WORD_LIST_PATH"))
        .filter(p => p.nonEmpty && p != "synthetic")
      path match {
        case Some(p) =>
          val words = Seeds.readWordList(spark, p,
            toLower = profile.name == "synonyms")
          Seeds.seedUrl(profile, Seeds.pickSeed(words))
        case None => SyntheticWeb.pageUrl(spec, 0L)
      }
    }

  /** counties allow-list (counties.go:31-46): loaded from
    * COUNTIES_LIST; missing is FATAL (panic parity). Other sites: none.
    */
  def resolveAllowList(spark: SparkSession, profile: SiteProfile,
      spec: SyntheticWeb.Spec, env: Map[String, String]): Option[DataFrame] =
    if (!profile.usesAllowList) None
    else env.get("COUNTIES_LIST").filter(_.nonEmpty) match {
      case None =>
        sys.error("'COUNTIES_LIST' was not set — required for us_counties " +
          "(counties/counties.go:34-38 panics); use COUNTIES_LIST=synthetic " +
          "for the generated fixture list")
      case Some("synthetic") => Some(SyntheticWeb.countiesAllowList(spark, spec))
      case Some(p) =>
        Some(Seeds.readWordList(spark, p).select(col("word").as("name")))
    }

  def main(args: Array[String]): Unit = {
    val env = sys.env
    val verb = args.headOption.getOrElse("wikipedia")
    val profile = Sites.all.getOrElse(verb,
      sys.error(s"unknown site verb '$verb' (have: ${Sites.all.keys.mkString(", ")})"))

    val maxNodes = envLong(env, "MAX_APPROX_NODES", -1L)
    val cpus = envLong(env, "PARALLELISM", 8L).toInt
    val hostBudget = env.get("HOST_BUDGET").map(_.toInt).getOrElse(Int.MaxValue)
    val nPages = envLong(env, "CORPUS_PAGES", 2000L)
    val storeRoot = env.getOrElse("CRAWL_STORE",
      s"/tmp/graft_crawl_${verb}_$nPages")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-crawl-$verb")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spec = SyntheticWeb.Spec(verb, numPages = nPages, seed = 42L)
    val pages = SyntheticWeb.pages(spark, spec).toDF()
    val allowList = resolveAllowList(spark, profile, spec, env)

    // COMPACT_SHARDS_PER_BATCH bounds the LSM fold pause (K shards per
    // compacting batch, rotating); -1 = fold everything in one batch
    val cfg = CrawlConfig(site = verb, maxNodes = maxNodes,
      hostBudget = hostBudget, numShards = 32, bloomItemsPerShard = 1 << 16,
      compactShardsPerBatch =
        envLong(env, "COMPACT_SHARDS_PER_BATCH", -1L).toInt)
    val store = new Store(storeRoot, spark)
    val engine = new CrawlEngine(spark, store, profile, cfg, pages, allowList)

    // SEED_STREAM_DIR switches to streaming ingestion: seed files are
    // consumed exactly-once (checkpointed) and each batch crawls
    env.get("SEED_STREAM_DIR").filter(_.nonEmpty) match {
      case Some(seedDir) =>
        val ckpt = env.getOrElse("SEED_STREAM_CHECKPOINT",
          s"$storeRoot/_seed_checkpoint")
        println(s"[graft] streaming seeds from $seedDir (checkpoint $ckpt)")
        val q = graft.streaming.CrawlStream.seedDriven(spark, engine, seedDir, ckpt)
        q.awaitTermination()
        println(s"[graft] done: totalNodes=${engine.nodesTotal}")
        spark.stop()
        return
      case None => ()
    }

    // RECRAWL_STREAM_DIR: consume url<TAB>tier files as recrawl marks
    // (change-rate channel) against an EXISTING crawl store
    env.get("RECRAWL_STREAM_DIR").filter(_.nonEmpty) match {
      case Some(rcDir) =>
        require(store.exists("frontier"),
          "RECRAWL_STREAM_DIR needs an existing crawl store to mark against")
        val ckpt = env.getOrElse("RECRAWL_STREAM_CHECKPOINT",
          s"$storeRoot/_recrawl_checkpoint")
        println(s"[graft] streaming recrawl marks from $rcDir (checkpoint $ckpt)")
        val q = graft.streaming.CrawlStream.recrawlDriven(spark, engine, rcDir, ckpt)
        q.awaitTermination()
        println(s"[graft] done: totalNodes=${engine.nodesTotal}")
        spark.stop()
        return
      case None => ()
    }

    if (!store.exists("frontier")) {
      val seed = resolveSeedUrl(spark, profile, spec, env)
      engine.seed(Seq(seed))
      println(s"[graft] seeded $seed")
    } else println(s"[graft] resuming from batch ${store.batchId}")

    val results = engine.run()
    results.foreach { r =>
      println(s"[graft] batch=${r.batchId} pages=${r.pagesFetched} " +
        s"nodes+=${r.nodesAdded} edges+=${r.edgesAdded} depth=${r.maxDepth} " +
        s"pending=${r.frontierPending}")
    }
    println(s"[graft] done: totalNodes=${engine.nodesTotal} batches=${results.length}")
    spark.stop()
  }
}
