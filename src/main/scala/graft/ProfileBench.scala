package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{canon, Extract}
import graft.sites.Sites
import graft.state.Bloom

/** throwaway cumulative profiler for the bench pipeline */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val profile = Sites.web
    val pages = spark.read.parquet(corpusDir)

    def frontier = pages.select(col("url"))
      .withColumn("canon", canon.canonical_url(col("url")))
      .withColumn("host", canon.host_of(col("url")))
      .withColumn("depth", lit(1)).withColumn("priority", lit(1L))
      .withColumn("seq", xxhash64(col("url")))

    val nUrls = pages.count()
    val seenSeed = frontier.filter(pmod(xxhash64(col("canon")), lit(2)) === 0)
      .select(col("canon"))
    val seenShards = Bloom.buildShards(seenSeed, 64,
      math.max(1024L, 2L * nUrls / 64), 0.01).persist()
    seenShards.count()

    def fresh = frontier
      .withColumn("maybe_seen",
        Bloom.maybeSeenColumn(spark, seenShards, 64, col("canon")))
      .filter(!col("maybe_seen")).drop("maybe_seen")
    def capped = {
      val salted = fresh.withColumn("__salt", pmod(xxhash64(col("url")), lit(16)))
      val w1 = Window.partitionBy(col("host"), col("__salt"))
        .orderBy(col("priority"), col("depth"), col("seq"))
      val w2 = Window.partitionBy(col("host"))
        .orderBy(col("priority"), col("depth"), col("seq"))
      salted.withColumn("__rn1", row_number().over(w1))
        .filter(col("__rn1") <= lit(Int.MaxValue / 2))
        .withColumn("__rn2", row_number().over(w2))
        .filter(col("__rn2") <= lit(Int.MaxValue / 2))
        .drop("__salt", "__rn1", "__rn2")
    }
    def joined = capped.join(pages.select(col("url"), col("html")), Seq("url"))
    def extracted = joined
      .withColumn("__ex", Extract.extract_links(col("html"), lit(profile.name)))
      .select(col("url").as("src_url"),
        posexplode(col("__ex.links")).as(Seq("pos", "href")))
      .filter(profile.isValidLink(col("href")))
      .withColumn("dst_name", profile.cleanName(col("href")))
      .select(xxhash64(canon.canonical_url(col("src_url"))).as("src"),
        xxhash64(col("dst_name")).as("dst"))
      .distinct()

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] cpus=$cpus $name%-16s r$r ${(System.nanoTime() - t0) / 1e9}%7.2f s (n=$n)")
      }
    }
    time("scan-only")(pages.select(col("url")).count())
    time("frontier")(frontier.count())
    time("fresh")(fresh.count())
    time("capped")(capped.count())
    time("joined")(joined.select(col("url")).count())
    time("join+extract")(extracted.count())
    spark.stop()
  }
}
