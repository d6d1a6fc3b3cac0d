package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.sites.{Sites, SyntheticWeb}

/** throwaway diagnostic: per-job wall time inside engine batches, to
  * locate the batch-time floor. Not part of the driver contract.
  * Usage: runMain graft.EngineProfile <cpus> <corpusDir> [batches]
  */
object EngineProfile {

  private def heapMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) >> 20
  }

  private def dirMb(path: String): Long = {
    def sz(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
    sz(new java.io.File(path)) >> 20
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val maxBatches = if (args.length > 2) args(2).toInt else 8
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var site: String = "", var stages: Int = 0, var tasks: Int = 0,
      var runMs: Long = 0L, var inBytes: Long = 0L, var shufRead: Long = 0L,
      var shufWrite: Long = 0L, var gcMs: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId, t0 = e.time,
          site = Seq("callSite.short", "spark.job.description", "spark.jobGroup.id")
            .flatMap(k => Option(e.properties.getProperty(k)))
            .headOption.getOrElse("").take(90).replace('\n', ' '))
        jobs(e.jobId) = j
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1; j.tasks += si.numTasks
            j.runMs += si.taskMetrics.executorRunTime
            j.inBytes += si.taskMetrics.inputMetrics.bytesRead
            j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.gcMs += si.taskMetrics.jvmGCTime
          }
        }
    })

    val pages = s.table(Bench.registerCorpus(s, corpusDir))
    val cfg = graft.model.CrawlConfig(site = "web", batchSize = 20000,
      numShards = 64, bloomItemsPerShard = 1L << 17, salt = 16,
      compactShardsPerBatch = 8)
    val store = new graft.state.Store(
      s"/dev/shm/graft-engineprof-${System.nanoTime()}", s)
    val eng = new graft.engine.CrawlEngine(s, store, Sites.web, cfg, pages)
    val spec = SyntheticWeb.Spec("web", numPages = 1200000, seed = 42L,
      minDeg = 15, maxDeg = 45, numHosts = 256, fillerWords = 1500)
    eng.seed(Seq(SyntheticWeb.pageUrl(spec, 0L)))
    var b = 0
    var go = true
    while (go && b < maxBatches) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val r = eng.step()
      val wall = (System.nanoTime() - t0) / 1e9
      r match {
        case Some(res) =>
          val segCounts = Seq("frontier", "frontier_log", "nodes", "edges",
            "seen_shards", "nodes_bloom", "edges_bloom")
            .map(t => s"$t=${store.segmentDirs(t).size}").mkString(" ")
          val gcTotalMs: Long = jobs.synchronized(jobs.values.map(_.gcMs).sum)
          println(s"== batch $b: " + f"${wall}%.2f" +
            s"s pending=${res.frontierPending} sel=${res.pagesFetched} " +
            s"edges+=${res.edgesAdded} heap=${heapMb()}MB " +
            s"shufdir=${dirMb("/dev/shm/graft-spark")}MB gc=${gcTotalMs / 1000}s")
          println(s"   segs: $segCounts")
          jobs.synchronized {
            jobs.values.toSeq.sortBy(_.id).foreach { j =>
              println(f"  job ${j.id}%3d ${(j.t1 - j.t0) / 1e3}%6.2fs run=${j.runMs / 1e3}%7.1fs " +
                f"gc=${j.gcMs / 1e3}%5.1fs tasks=${j.tasks}%4d in=${j.inBytes >> 20}%5dMB " +
                f"sr=${j.shufRead >> 20}%4dMB sw=${j.shufWrite >> 20}%4dMB  ${j.site}")
            }
          }
          go = res.frontierPending > 0 && res.frontierPending < 3000000L
        case None => go = false
      }
      b += 1
    }
    graft.state.Store.deleteRecursively(java.nio.file.Paths.get(store.root))
    s.stop()
  }
}
