package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** diagnostic: single-level throughput with GC accounting */
object BenchOne {
  def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val rounds = if (args.length > 2) args(2).toInt else 4
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SHUF","64"))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SMJ","true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.parquet.columnarReaderBatchSize", sys.env.getOrElse("BATCHSZ","512"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val stageLog = new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for { a <- si.completionTime; b <- si.submissionTime }
          yield a - b).getOrElse(-1L)
        stageLog.synchronized {
          stageLog += ((si.stageId,
            f"spill=${si.taskMetrics.memoryBytesSpilled >> 20}MB", si.numTasks,
            wall, si.taskMetrics.executorRunTime))
        }
      }
    })
    val state = Bench.buildSeenState(s, Bench.registerCorpus(s, corpusDir), 64)
    val mapOnly = sys.env.get("MAPONLY").isDefined
    def mapOnlyRun(): Long = {
      import org.apache.spark.sql.functions._
      val n = s.table(state.table)
        .select(explode(graft.functions.Extract.extract_links(col("html"),
          lit("web")).getField("links")).as("href"))
        .select(count(col("href"))).head().getLong(0)
      require(n > 0); 400000L
    }
    (1 to rounds).foreach { r =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val n = if (mapOnly) mapOnlyRun() else Bench.frontierPipeline(s, state)
      val dt = (System.nanoTime() - t0) / 1e9
      val g = gcMillis - g0
      println(f"[benchone] cpus=$cpus round=$r n=$n dt=$dt%.2f s tp=${n / dt}%.0f/s gc=${g}ms")
      if (r == rounds) stageLog.synchronized {
        val tail = stageLog.toSeq.sortBy(-_._4)
        tail.take(12).foreach { case (id, name, tasks, wall, run) =>
          println(f"[stage] r$r id=$id $name%-22s tasks=$tasks%3d wall=${wall}ms taskTime=${run}ms")
        }
      }
      stageLog.synchronized(stageLog.clear())
    }
    s.stop()
  }
}

/** one-off bucketed corpus generator: GenCorpus <nPages> <filler> */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val nPages = args(0).toLong
    val filler = args(1).toInt
    val dir = s"/tmp/graft_bench_corpus_${nPages}_f${filler}_b64"
    if (new java.io.File(dir).exists()) { println(s"exists: $dir"); return }
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SHUF","64"))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SMJ","true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val spec = graft.sites.SyntheticWeb.Spec("web", numPages = nPages,
      seed = 42L, minDeg = 15, maxDeg = 45, numHosts = 256, fillerWords = filler)
    graft.sites.SyntheticWeb.pages(s, spec).toDF()
      .repartition(64, org.apache.spark.sql.functions.col("url"))
      .write.mode("overwrite").bucketBy(64, "url").sortBy("url")
      .option("path", dir).saveAsTable("graft_bench_pages_build")
    println(s"wrote $dir")
    s.stop()
  }
}
