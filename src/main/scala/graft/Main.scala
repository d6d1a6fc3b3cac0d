package graft

import org.apache.spark.sql.SparkSession

import graft.engine.CrawlEngine
import graft.model.CrawlConfig
import graft.sites.{Sites, SyntheticWeb}
import graft.state.Store

/** CLI entry — the reference's API of record (main.go:77-134: verbs
  * `wikipedia | synonyms | synonyms-ar | us_counties`, plus our `web`
  * bench profile) with the same env surface (main.go:20-48):
  *
  *   MAX_APPROX_NODES   node budget; -1 = unlimited (required there,
  *                      defaulted here)
  *   PARALLELISM        local core count (colly Parallelism)
  *   STARTING_ENDPOINT  seed URL; empty ⇒ deterministic seed pick
  *                      (replaces the reference's random-article API /
  *                      random word line, crawler/crawler.go:30-39)
  *   HOST_BUDGET        pages per host per batch (politeness; the
  *                      LimitRule analogue — MS_DELAY wall-clock delay
  *                      is meaningless over a static corpus)
  *   CRAWL_STORE        state root (resume point); default under /tmp
  *   CORPUS_PAGES       synthetic corpus size
  *
  * The reference exits fatally on invalid env (parseEnv); we do the
  * same via require().
  */
object Main {
  def main(args: Array[String]): Unit = {
    val verb = args.headOption.getOrElse("wikipedia")
    val profile = Sites.all.getOrElse(verb,
      sys.error(s"unknown site verb '$verb' (have: ${Sites.all.keys.mkString(", ")})"))

    def envLong(name: String, default: Long): Long =
      sys.env.get(name).map { v =>
        val n = try v.toLong catch {
          case _: NumberFormatException =>
            sys.error(s"$name must be an integer, got '$v'")
        }
        require(n >= 1 || n == -1, s"$name must be >= 1 or -1")
        n
      }.getOrElse(default)

    val maxNodes = envLong("MAX_APPROX_NODES", -1L)
    val cpus = envLong("PARALLELISM", 8L).toInt
    val hostBudget = sys.env.get("HOST_BUDGET").map(_.toInt).getOrElse(Int.MaxValue)
    val nPages = envLong("CORPUS_PAGES", 2000L)
    val storeRoot = sys.env.getOrElse("CRAWL_STORE",
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
    val allowList =
      if (profile.usesAllowList) Some(SyntheticWeb.countiesAllowList(spark, spec))
      else None

    val cfg = CrawlConfig(site = verb, maxNodes = maxNodes,
      hostBudget = hostBudget, numShards = 32, bloomItemsPerShard = 1 << 16)
    val store = new Store(storeRoot, spark)
    val engine = new CrawlEngine(spark, store, profile, cfg, pages, allowList)

    // SEED_STREAM_DIR switches to streaming ingestion: seed files are
    // consumed exactly-once (checkpointed) and each batch crawls
    sys.env.get("SEED_STREAM_DIR").filter(_.nonEmpty) match {
      case Some(seedDir) =>
        val ckpt = sys.env.getOrElse("SEED_STREAM_CHECKPOINT",
          s"$storeRoot/_seed_checkpoint")
        println(s"[graft] streaming seeds from $seedDir (checkpoint $ckpt)")
        val q = graft.streaming.CrawlStream.seedDriven(spark, engine, seedDir, ckpt)
        q.awaitTermination()
        println(s"[graft] done: totalNodes=${engine.nodesTotal}")
        spark.stop()
        return
      case None => ()
    }

    if (!store.exists("frontier")) {
      // seed resolution order mirrors crawler/crawler.go:30-39:
      // explicit STARTING_ENDPOINT, else a word-list pick
      // (util/util.go:15-44, deterministic here), else page 0
      val seed = sys.env.get("STARTING_ENDPOINT").filter(_.nonEmpty)
        .orElse(sys.env.get("WORD_LIST_PATH").filter(_.nonEmpty).map { path =>
          val words = graft.sites.Seeds.readWordList(spark, path,
            toLower = profile.name == "synonyms")
          graft.sites.Seeds.seedUrl(profile, graft.sites.Seeds.pickSeed(words))
        })
        .getOrElse(SyntheticWeb.pageUrl(spec, 0L))
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
