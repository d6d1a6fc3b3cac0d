package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{canon, Extract}
import graft.sites.Sites

/** throwaway diagnostic: stage-by-stage CPU of the fetch→extract→name
  * pipeline on a fixed 20k-page slice. Not part of the driver contract.
  * Usage: runMain graft.PipeProfile <cpus> <corpusDir>
  */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val profile = Sites.web
    val pages = s.table(Bench.registerCorpus(s, corpusDir))

    // a deterministic ~20k-url "selected" batch
    val selected = pages.select(col("url"))
      .filter(pmod(xxhash64(col("url")), lit(60)) === 0)
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", lit(1)).withColumn("seq", xxhash64(col("url")))
      .persist()
    println(s"[pp] selected=${selected.count()}")

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[pp] $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }

    time("fetch-join-count-htmllen") {
      selected.join(pages, Seq("url"), "inner")
        .select(sum(length(col("html")))).head().getLong(0)
    }
    time("fetch+extract") {
      selected.join(pages, Seq("url"), "inner")
        .select(Extract.extract_links(col("html"), lit(profile.name)).as("__ex"))
        .select(sum(size(col("__ex.links")))).head().getLong(0)
    }
    time("fetch+extract+explode+valid") {
      selected.join(pages, Seq("url"), "inner")
        .withColumn("__ex", Extract.extract_links(col("html"), lit(profile.name)))
        .select(col("url"), posexplode(col("__ex.links")).as(Seq("pos", "href")))
        .filter(profile.isValidLink(col("href")))
        .count()
    }
    time("fetch+extract+explode+valid+clean+dedup") {
      selected.join(pages, Seq("url"), "inner")
        .withColumn("__ex", Extract.extract_links(col("html"), lit(profile.name)))
        .select(col("url"), posexplode(col("__ex.links")).as(Seq("pos", "href")))
        .filter(profile.isValidLink(col("href")))
        .withColumn("dst_name", profile.cleanName(col("href")))
        .dropDuplicates("url", "dst_name")
        .count()
    }
    time("full-scan-url-only") {
      pages.select(count(col("url"))).head().getLong(0)
    }
    time("full-scan-html-len") {
      pages.select(sum(length(col("html")))).head().getLong(0)
    }
    time("full-scan-extract-all") {
      pages.select(Extract.extract_links(col("html"), lit(profile.name)).as("__ex"))
        .select(sum(size(col("__ex.links")))).head().getLong(0)
    }
    // parse alone, no join: scan a corpus slice directly
    time("scan-extract-nojoin") {
      pages.filter(pmod(xxhash64(col("url")), lit(60)) === 0)
        .select(Extract.extract_links(col("html"), lit(profile.name)).as("__ex"))
        .select(sum(size(col("__ex.links")))).head().getLong(0)
    }
    s.stop()
  }
}
