package graft

import org.apache.spark.sql.SparkSession
import graft.sites.{Sites, SyntheticWeb}

/** throwaway diagnostic: why do `nodes` segments never meet the
  * size-tiered consolidation rule while `edges` segments do. Prints
  * each table's live segment dirs with bytes + tier per batch.
  * Usage: runMain graft.DebugConsolidate
  */
object DebugConsolidate {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val spec = SyntheticWeb.Spec("web", numPages = 200000, seed = 42L,
      minDeg = 15, maxDeg = 45, numHosts = 256, fillerWords = 200)
    val dir = s"/dev/shm/graft-dbg-corpus"
    if (!new java.io.File(dir).exists())
      SyntheticWeb.pages(s, spec).toDF()
        .repartition(16).write.mode("overwrite").parquet(dir)
    val pages = s.read.parquet(dir)
    val cfg = graft.model.CrawlConfig(site = "web", batchSize = 5000,
      numShards = 64, bloomItemsPerShard = 1L << 17, salt = 16,
      compactShardsPerBatch = 8)
    val store = new graft.state.Store("/dev/shm/graft-dbg-store", s)
    val eng = new graft.engine.CrawlEngine(s, store, Sites.web, cfg, pages)
    eng.seed(Seq(SyntheticWeb.pageUrl(spec, 0L)))
    def tierOf(b: Long): Int =
      if (b <= 0) 0 else (math.log(b.toDouble) / math.log(4.0)).toInt
    def dump(table: String): Unit = {
      val dirs = store.segmentDirs(table)
      val info = dirs.map { d =>
        val p = java.nio.file.Paths.get(store.root, d)
        val bytes =
          if (!java.nio.file.Files.isDirectory(p)) 0L
          else {
            val w = java.nio.file.Files.walk(p)
            try {
              import scala.jdk.CollectionConverters._
              w.iterator().asScala
                .filter(java.nio.file.Files.isRegularFile(_))
                .map(java.nio.file.Files.size(_)).sum
            } finally w.close()
          }
        (d, bytes, tierOf(bytes))
      }
      val byLeaf = info.groupBy(_._1.split('/').drop(2).mkString("/"))
      val sample = byLeaf.toSeq.sortBy(_._1).take(2)
      sample.foreach { case (leaf, xs) =>
        println(s"  $table $leaf: " + xs.map { case (d, b, t) =>
          s"${d.split('/')(1)}=$b(t$t)" }.mkString(" "))
      }
      val plan = store.consolidationPlan(table)
      println(s"  $table: segs=${dirs.size} planGroups=${plan.size} " +
        s"planDirs=${plan.map(_.size).sum}")
    }
    for (i <- 1 to 10) {
      eng.step() match {
        case Some(r) =>
          println(s"== batch $i pending=${r.frontierPending} nodes+=${r.nodesAdded} edges+=${r.edgesAdded}")
          dump("nodes"); dump("edges")
        case None => println("drained")
      }
    }
    graft.state.Store.deleteRecursively(java.nio.file.Paths.get(store.root))
    s.stop()
  }
}
