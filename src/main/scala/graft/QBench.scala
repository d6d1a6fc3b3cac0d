package graft

import org.apache.spark.sql.SparkSession

/** Local profiling helper: time individual SparkEntry queries with the
  * same session shape as Bench's per-query phase (local[32], 64 shuffle
  * partitions, AQE off). Usage:
  *   runMain graft.QBench <sfDir> <reps> <query> [query...]
  * Prints per-rep seconds per query; not part of the driver contract.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(s, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => fn(s, sfDir).count() }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name reps=${secs.map(x => f"$x%.3f").mkString(",")}")
    }
    s.stop()
  }
}
