package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed multi-table store with atomic snapshot commits.
  *
  * The environment ships no Iceberg jar, so snapshot isolation is
  * provided by a tiny manifest protocol with the same observable
  * semantics the blueprint asks of Iceberg (SURVEY §2.9): a batch's
  * writes land in fresh directories, then a single atomic manifest
  * rename publishes them all. A killed job resumes from the last
  * published manifest; orphan directories from a dead batch are simply
  * never referenced (and are swept on open).
  *
  * Layout:
  *   {root}/_manifest.json            — current snapshot (atomic swap)
  *   {root}/{table}/b{batch}-{n}/     — appended parquet segment
  *   {root}/{table}/r{batch}/         — full replacement segment
  *
  * Manifest: {"batchId":N,"tables":{"edges":["edges/b0-0","edges/b1-0"]}}
  */
final class Store(val root: String, spark: SparkSession) {

  private val manifestPath: Path = Paths.get(root, "_manifest.json")

  Files.createDirectories(Paths.get(root))

  /** table -> list of live segment dirs (relative to root) */
  @volatile private var tables: Map[String, Vector[String]] = Map.empty
  @volatile private var batchIdLoaded: Long = -1L

  load()

  def batchId: Long = batchIdLoaded

  private def load(): Unit = {
    if (Files.exists(manifestPath)) {
      val json = new String(Files.readAllBytes(manifestPath), "UTF-8")
      val parsed = Store.parseManifest(json)
      batchIdLoaded = parsed._1
      tables = parsed._2
    }
  }

  def exists(table: String): Boolean = tables.get(table).exists(_.nonEmpty)

  def read(table: String): Option[DataFrame] =
    tables.get(table).filter(_.nonEmpty).map { dirs =>
      spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
    }

  def readOr(table: String, empty: => DataFrame): DataFrame =
    read(table).getOrElse(empty)

  /** Stage + atomically publish one batch: appends add segments,
    * replaces swap a table's full contents. All writes complete before
    * the manifest swap; a crash mid-commit leaves the previous
    * snapshot intact.
    */
  def commit(
      newBatchId: Long,
      appends: Seq[(String, DataFrame)] = Nil,
      replaces: Seq[(String, DataFrame)] = Nil): Unit = {
    var next = tables
    appends.zipWithIndex.foreach { case ((table, df), i) =>
      val rel = s"$table/b$newBatchId-$i"
      df.write.mode("overwrite").parquet(s"$root/$rel")
      next = next.updated(table, next.getOrElse(table, Vector.empty) :+ rel)
    }
    replaces.foreach { case (table, df) =>
      val rel = s"$table/r$newBatchId"
      df.write.mode("overwrite").parquet(s"$root/$rel")
      next = next.updated(table, Vector(rel))
    }
    val json = Store.renderManifest(newBatchId, next)
    val tmp = Paths.get(root, s"_manifest.tmp.$newBatchId")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    tables = next
    batchIdLoaded = newBatchId
  }

  /** Drop segment dirs no manifest references (dead-batch garbage). */
  def sweepOrphans(): Unit = {
    val live: Set[String] = tables.values.flatten.toSet
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return
    Files.list(rootPath).iterator().asScala
      .filter(Files.isDirectory(_))
      .foreach { tableDir =>
        Files.list(tableDir).iterator().asScala.toList.foreach { seg =>
          val rel = s"${tableDir.getFileName}/${seg.getFileName}"
          if (!live.contains(rel)) Store.deleteRecursively(seg)
        }
      }
  }
}

object Store {

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // Minimal JSON for the manifest shape we write (keys/paths contain no
  // characters needing escapes beyond the ones handled here).
  def renderManifest(batchId: Long, tables: Map[String, Vector[String]]): String = {
    val body = tables.toSeq.sortBy(_._1).map { case (t, dirs) =>
      "\"" + t + "\":[" + dirs.map(d => "\"" + d + "\"").mkString(",") + "]"
    }.mkString(",")
    s"""{"batchId":$batchId,"tables":{$body}}"""
  }

  def parseManifest(json: String): (Long, Map[String, Vector[String]]) = {
    val batchId = {
      val m = "\"batchId\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(-1L)
    }
    val tablesRe = "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val tables = tablesRe.findAllMatchIn(json).map { m =>
      val dirs = "\"([^\"]+)\"".r.findAllMatchIn(m.group(2)).map(_.group(1)).toVector
      m.group(1) -> dirs
    }.toMap - "batchId"
    (batchId, tables)
  }
}
