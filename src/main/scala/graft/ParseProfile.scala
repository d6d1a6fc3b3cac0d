package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway diagnostic: single-thread scanLinksBytes timing on real
  * corpus pages (no Spark in the timed loop).
  */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val rows = s.read.parquet(corpusDir).select("html").limit(2000)
      .collect().map(_.getAs[Array[Byte]](0))
    s.stop()
    val bytes = rows.map(_.length.toLong).sum
    println(s"[parse] pages=${rows.length} avg=${bytes / rows.length}B")
    (1 to 4).foreach { rep =>
      val t0 = System.nanoTime()
      var links = 0L
      rows.foreach(h => links += graft.html.Html.scanLinksBytes(h).length)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[parse] rep$rep ${dt}%.3fs ${dt * 1e6 / rows.length}%.1fus/page links=$links ${bytes / dt / 1e6}%.0f MB/s")
    }
  }
}
