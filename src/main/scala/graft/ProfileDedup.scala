package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** diagnostic: stage-by-stage timing of the near-dup pipelines */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet").cache()
    println(s"[prof] docs=${docs.count()} " +
      docs.select(avg(length(col("text")))).head())

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    time("shingleHashes")(docs.select(explode(
      Dedup.shingleHashes(col("text"), 3))).count())
    time("signatures")(docs.select(
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), 16)).count())
    time("lshCandidates")(Dedup.lshCandidates(docs, 16, 4, 3).count())
    time("minhashNearDups")(Dedup.minhashNearDups(docs, 16, 4, 3, 0.8).count())
    time("jaccardPairs")(Dedup.jaccardPairs(docs, 3, 0.8).count())
    time("jaccard uncapped")(Dedup.jaccardPairs(docs, 3, 0.8, Long.MaxValue).count())
    s.stop()
  }
}
