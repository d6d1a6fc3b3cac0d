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
  * Hash-sharded tables: a table may be maintained as S independent
  * shards (shard = pmod(xxhash64(key), S)); a batch replaces ONLY the
  * shards it touched — one partitioned write emits
  * `{table}/r{batch}/__shard=K/` per touched shard, the manifest keeps
  * untouched shards' previous directories byte-identical. This is the
  * per-partition-lineage layout that makes a 10^10-row frontier
  * maintainable: per-batch write cost is O(touched shards), never
  * O(table).
  *
  * Layout:
  *   {root}/_manifest.json            — current snapshot (atomic swap)
  *   {root}/{table}/b{batch}-{n}/     — appended parquet segment
  *   {root}/{table}/r{batch}/         — full replacement segment
  *   {root}/{table}/r{batch}/__shard=K/ — shard replacement segment
  *
  * Manifest: {"batchId":N,"tables":{"edges":["edges/b0-0","edges/b1-0"]}}
  */
final class Store(val root: String, spark: SparkSession) {

  private val manifestPath: Path = Paths.get(root, "_manifest.json")

  Files.createDirectories(Paths.get(root))

  /** table -> list of live segment dirs (relative to root) */
  @volatile private var tables: Map[String, Vector[String]] = Map.empty
  @volatile private var batchIdLoaded: Long = -1L
  @volatile private var metaLoaded: Map[String, String] = Map.empty

  load()

  def batchId: Long = batchIdLoaded

  /** Driver-side ledger journaled with the snapshot (tiny key→value
    * strings, e.g. the engine's per-tier pending counts): consistent
    * with `tables` BY CONSTRUCTION — both swap in the same atomic
    * manifest rename. CLEARED on any publish that does not re-put it
    * ([[Staged.putMeta]]), so a writer that doesn't maintain a ledger
    * can never leave a stale one behind for the next open to trust.
    */
  def meta: Map[String, String] = metaLoaded

  private def load(): Unit = {
    if (Files.exists(manifestPath)) {
      val json = new String(Files.readAllBytes(manifestPath), "UTF-8")
      val parsed = Store.parseManifest(json)
      batchIdLoaded = parsed._1
      tables = parsed._2
      metaLoaded = Store.parseMeta(json)
    }
  }

  /** true once the table has ever been committed — a sharded table
    * whose shards all drained to empty still exists (an empty frontier
    * after a finished crawl must read as "resume", not "seed afresh")
    */
  def exists(table: String): Boolean = tables.contains(table)

  def read(table: String): Option[DataFrame] =
    tables.get(table).filter(_.nonEmpty).map { dirs =>
      spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
    }

  def readOr(table: String, empty: => DataFrame): DataFrame =
    read(table).getOrElse(empty)

  /** live segment dirs (relative), for tests asserting untouched-shard
    * stability across commits
    */
  def segmentDirs(table: String): Vector[String] =
    tables.getOrElse(table, Vector.empty)

  /** Read only the segments that can contain the given shards: shard
    * segments with a matching `__shard=K` plus every plain
    * (unsharded) segment — a plain segment may hold any shard's rows,
    * so it is never skipped (correctness over pruning).
    */
  def readShards(table: String, shards: Set[Int]): Option[DataFrame] =
    tables.get(table)
      .map(_.filter(d => Store.shardOfDir(d).forall(shards.contains)))
      .filter(_.nonEmpty)
      .map(dirs => spark.read.parquet(dirs.map(d => s"$root/$d"): _*))

  /** distinct `__tier=T` values among a table's live segments, sorted —
    * the scheduler's view of which priority tiers exist on disk
    */
  def tiers(table: String): Seq[Int] =
    tables.getOrElse(table, Vector.empty)
      .flatMap(Store.tierOfDir).distinct.sorted

  /** Read only the segments that can contain rows of priority tiers
    * ≤ `tier`: `__tier=T` segments with T ≤ tier plus every segment
    * without a tier dimension (which may hold any tier's rows — never
    * skipped; correctness over pruning).
    */
  def readTiersUpTo(table: String, tier: Int): Option[DataFrame] =
    tables.get(table)
      .map(_.filter(d => Store.tierOfDir(d).forall(_ <= tier)))
      .filter(_.nonEmpty)
      .map(dirs => spark.read.parquet(dirs.map(d => s"$root/$d"): _*))

  /** highest batch id among a table's live segments (−1 if none) —
    * the watermark for "which appends does a derived snapshot cover"
    */
  def maxSegmentBatch(table: String): Long =
    tables.getOrElse(table, Vector.empty)
      .map(Store.batchOfDir).foldLeft(-1L)(math.max)

  /** segments of `table` written by batches AFTER `batch` (the LSM
    * delta a snapshot with watermark `batch` has not folded yet)
    */
  def readNewerThan(table: String, batch: Long): Option[DataFrame] =
    tables.get(table)
      .map(_.filter(d => Store.batchOfDir(d) > batch))
      .filter(_.nonEmpty)
      .map(dirs => spark.read.parquet(dirs.map(d => s"$root/$d"): _*))

  /** how many live segment dirs [[readNewerThan]] would read — the
    * LSM-delta size, surfaced for per-batch diagnostics
    */
  def segmentsNewerThan(table: String, batch: Long): Int =
    tables.getOrElse(table, Vector.empty)
      .count(d => Store.batchOfDir(d) > batch)

  /** live segment dir count (listing/footer tax proxy) */
  def segmentCount(table: String): Int =
    tables.getOrElse(table, Vector.empty).size

  /** Size-tiered segment-consolidation plan for a hash-sharded append
    * table: per leaf partition path (same `__shard=K`, and `__tier=T`
    * when present), fold runs of `minRun` SAME-MAGNITUDE segments —
    * the smallest-first windows where the largest member is ≤ 4× the
    * smallest. Merging only same-magnitude runs is the classic
    * size-tiered LSM policy: write amplification stays O(log n) per
    * row. An earlier formulation required an ABSOLUTE geometric tier
    * (⌊log₄ bytes⌋) to match across the run — but a crawl's per-batch
    * segment sizes drift (discovery counts decline as the graph
    * saturates), adjacent batches straddle tier boundaries, and runs
    * never formed: the `nodes` table grew one dir per shard per batch
    * FOREVER while `edges` (constant-size batches) folded fine — the
    * measured listing/footer creep. The relative window keeps the
    * amortization argument (a row re-merges only into a ≥2× larger
    * segment... within a constant) without the boundary brittleness,
    * and `maxLeafSegs` backstops pathological size sequences: a leaf
    * over budget folds its `minRun` smallest segments regardless.
    */
  def consolidationPlan(table: String, minRun: Int = 4,
      maxLeafSegs: Int = 8): Seq[Seq[String]] = {
    def dirBytes(rel: String): Long = {
      val p = Paths.get(root, rel)
      if (!Files.isDirectory(p)) 0L
      else {
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
        finally walk.close()
      }
    }
    def leafKey(rel: String): String = rel.split('/').drop(2).mkString("/")
    tables.getOrElse(table, Vector.empty)
      .filter(d => Store.shardOfDir(d).isDefined)
      .groupBy(leafKey)
      .values.flatMap { leafDirs =>
        val bySize = leafDirs.map(d => (d, dirBytes(d))).sortBy(_._2)
        val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        var i = 0
        while (i + minRun <= bySize.length) {
          val win = bySize.slice(i, i + minRun)
          if (win.last._2 <= 4L * math.max(win.head._2, 1L)) {
            groups += win.map(_._1)
            i += minRun
          } else i += 1
        }
        // over-budget leaf with no natural run: fold the smallest
        // minRun anyway — bounds the dir count, and folding the
        // smallest keeps the rewritten bytes minimal
        if (groups.isEmpty && bySize.length > maxLeafSegs)
          groups += bySize.take(minRun).map(_._1)
        groups
      }.toSeq
  }

  /** A staged batch: segments are written eagerly as each call runs
    * (so the caller can interleave driver work — e.g. reading
    * `Observation` metrics off a completed write — between them), and
    * nothing becomes visible until `publish()` swaps the manifest.
    * A crash before publish leaves the previous snapshot intact.
    */
  final class Staged private[Store] (newBatchId: Long) {
    private var next = tables
    private var nextMeta = Map.empty[String, String]
    private var appendIdx = 0
    private var published = false

    /** Journal driver-ledger entries with this snapshot. Starts EMPTY
      * every batch — the publisher must re-put everything it wants the
      * next open to trust (an un-maintained ledger disappears rather
      * than going stale). Keys and values must stay inside
      * `[A-Za-z0-9_.,:;\- ]` (no JSON escaping is performed).
      */
    def putMeta(kv: (String, String)*): Unit = {
      kv.foreach { case (k, v) =>
        require(Store.metaCharsOk(k) && Store.metaCharsOk(v),
          s"putMeta: illegal character in '$k' -> '$v'")
      }
      nextMeta ++= kv
    }

    /** tag the write's jobs so profilers/UIs can attribute batch time */
    private def described[T](df: DataFrame, label: String)(f: => T): T = {
      val sc = df.sparkSession.sparkContext
      sc.setJobDescription(label)
      try f finally sc.setJobDescription(null)
    }

    def append(table: String, df: DataFrame): Unit = {
      val rel = s"$table/b$newBatchId-$appendIdx"
      appendIdx += 1
      described(df, s"write:$table") {
        df.write.mode("overwrite").parquet(s"$root/$rel")
      }
      next = next.updated(table, next.getOrElse(table, Vector.empty) :+ rel)
    }

    /** Append `df` hash-sharded: one partitioned write emits
      * `{table}/b{batch}-{n}/__shard=K/` per materialized shard, and
      * each subdir registers as its OWN segment — so later reads can
      * be restricted to a shard subset ([[readShards]]). `df` must
      * carry an int column `__shard`; if it also carries an int
      * column `__tier`, the write partitions by (tier, shard) —
      * `{…}/__tier=T/__shard=K/` — and each leaf registers, so reads
      * can additionally be restricted to a tier prefix
      * ([[readTiersUpTo]], the scheduler's priority-range pruning).
      * This is what makes an append-only table's exact membership
      * confirm o(table): the probe reads only the shards its
      * candidate keys hash to.
      */
    def appendSharded(table: String, df: DataFrame): Unit = {
      val rel = s"$table/b$newBatchId-$appendIdx"
      appendIdx += 1
      val parts =
        if (df.columns.contains("__tier")) Seq("__tier", "__shard")
        else Seq("__shard")
      described(df, s"write-sharded:$table") {
        df.write.mode("overwrite").partitionBy(parts: _*).parquet(s"$root/$rel")
      }
      val written = Store.leafSegmentDirs(Paths.get(root, rel), rel)
      next = next.updated(table, next.getOrElse(table, Vector.empty) ++ written)
    }

    /** Fold groups of same-leaf segment dirs (a [[consolidationPlan]])
      * into ONE new segment per leaf, written in a single Spark job.
      * Each group's rows are re-read, tagged with their leaf's
      * partition values, and land under `{table}/b{batch}-{n}/…` — so
      * [[readNewerThan]] orders the rewritten rows WITH this batch.
      * Caller contract: consolidate only in a commit whose derived
      * snapshots (frozen blob watermarks) advance to this batch id,
      * otherwise previously-covered rows would reappear in the
      * watermark delta. The dropped dirs stay on disk until the next
      * [[sweepOrphans]]; a crash before publish leaves the previous
      * manifest (and every old dir) intact.
      */
    def consolidateSegments(table: String, groups: Seq[Seq[String]]): Unit = {
      if (groups.isEmpty) return
      val rel = s"$table/b$newBatchId-$appendIdx"
      appendIdx += 1
      def leafOf(d: String): String = d.split('/').drop(2).mkString("/")
      groups.foreach { dirs =>
        require(dirs.nonEmpty, s"consolidateSegments($table): empty group")
        require(dirs.forall(leafOf(_) == leafOf(dirs.head)),
          s"consolidateSegments($table): mixed leaf paths in $dirs")
      }
      val dims = leafOf(groups.head.head).split('/').map(_.split('=')(0)).toSeq
      require(groups.forall(
        g => leafOf(g.head).split('/').map(_.split('=')(0)).toSeq == dims),
        s"consolidateSegments($table): mixed partition dims across groups")
      // ONE read over every group's dirs (single file index — parallel
      // listing, one schema resolve) with the leaf partition values
      // recovered from the file path. The per-group spark.read form
      // paid a SEQUENTIAL driver file-index + footer read per leaf
      // (up to shards× per table per compacting batch) plus a
      // shards-way union plan — pure driver time that grew with the
      // shard count, dwarfing the actual merge I/O.
      val raw = spark.read.parquet(groups.flatten.map(d => s"$root/$d"): _*)
      val all = dims.foldLeft(raw) { (df, k) =>
        df.withColumn(k, org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.input_file_name(),
          s"/$k=(-?[0-9]+)/", 1).cast("int"))
      }
      described(all, s"consolidate:$table") {
        all.write.mode("overwrite").partitionBy(dims: _*).parquet(s"$root/$rel")
      }
      val written = Store.leafSegmentDirs(Paths.get(root, rel), rel)
      val dropped = groups.flatten.toSet
      next = next.updated(table,
        next.getOrElse(table, Vector.empty).filterNot(dropped) ++ written)
    }

    /** Drop (from the manifest only — no I/O; [[sweepOrphans]] deletes
      * the dirs later) every segment of `table` whose encoded batch id
      * is ≤ `batch`. The caller owns the proof that those segments'
      * rows are all dead (the frontier-log watermark GC: a log
      * segment's rows carry batch ids ≤ its dir batch, so dir batch ≤
      * min-over-shards watermark ⇒ every row is retired).
      */
    def dropSegmentsUpTo(table: String, batch: Long): Unit =
      next = next.updated(table,
        next.getOrElse(table, Vector.empty)
          .filterNot(d => Store.batchOfDir(d) <= batch))

    def replace(table: String, df: DataFrame): Unit = {
      val rel = s"$table/r$newBatchId"
      described(df, s"replace:$table") {
        df.write.mode("overwrite").parquet(s"$root/$rel")
      }
      next = next.updated(table, Vector(rel))
    }

    /** Replace ONLY `shards` of a hash-sharded table. `df` must hold
      * exactly those shards' new contents and carry an int column
      * `__shard`; a listed shard with no rows is replaced with
      * emptiness (its old segment is dropped). Untouched shards'
      * segments are not rewritten — or even read.
      *
      * @param dropUnsharded also retire the table's PLAIN (append)
      *   segments — a compaction that consolidated them into the new
      *   shard segments must drop them or their rows would double
      */
    def replaceShards(table: String, df: DataFrame, shards: Seq[Int],
        dropUnsharded: Boolean = false): Unit = {
      val rel = s"$table/r$newBatchId"
      val parts =
        if (df.columns.contains("__tier")) Seq("__tier", "__shard")
        else Seq("__shard")
      described(df, s"replace-shards:$table") {
        df.write.mode("overwrite").partitionBy(parts: _*).parquet(s"$root/$rel")
      }
      val replaced = shards.toSet
      val kept = next.getOrElse(table, Vector.empty).filterNot { d =>
        Store.shardOfDir(d) match {
          case Some(s) => replaced.contains(s)
          case None => dropUnsharded
        }
      }
      // reference only leaf dirs that materialized (empty shard ⇒
      // none); `df` must hold exactly `shards`' rows, asserted here
      val written = Store.leafSegmentDirs(Paths.get(root, rel), rel)
      written.foreach { d =>
        require(Store.shardOfDir(d).forall(replaced.contains),
          s"replaceShards($table) wrote undeclared shard dir $d")
      }
      next = next.updated(table, kept ++ written)
    }

    def publish(): Unit = {
      require(!published, "staged batch already published")
      val json = Store.renderManifest(newBatchId, next, nextMeta)
      val tmp = Paths.get(root, s"_manifest.tmp.$newBatchId")
      Files.write(tmp, json.getBytes("UTF-8"))
      Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      tables = next
      metaLoaded = nextMeta
      batchIdLoaded = newBatchId
      published = true
    }
  }

  def stage(newBatchId: Long): Staged = new Staged(newBatchId)

  /** Stage + atomically publish one batch: appends add segments,
    * replaces swap a table's full contents.
    */
  def commit(
      newBatchId: Long,
      appends: Seq[(String, DataFrame)] = Nil,
      replaces: Seq[(String, DataFrame)] = Nil): Unit = {
    val staged = stage(newBatchId)
    appends.foreach { case (t, df) => staged.append(t, df) }
    replaces.foreach { case (t, df) => staged.replace(t, df) }
    staged.publish()
  }

  /** Drop segment dirs no manifest references (dead-batch garbage).
    *
    * Scoped STRICTLY to directories of tables the manifest knows: the
    * store root legitimately hosts foreign state — the streaming seed
    * checkpoint defaults to `$root/_seed_checkpoint` (Main.scala), and
    * a deployment may park anything else beside the tables. Sweeping
    * an unknown directory would destroy it mid-run (the checkpoint
    * case breaks exactly-once seed ingestion), so unknown names are
    * never entered, let alone deleted.
    */
  def sweepOrphans(): Unit = {
    val live: Set[String] = tables.values.flatten.toSet
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return
    // a path survives iff it IS a live segment, or is an ancestor of
    // one (recursed into to sweep its dead siblings — handles both
    // `r{b}/__shard=K` and `r{b}/__tier=T/__shard=K` layouts)
    def sweep(p: Path, rel: String): Unit = {
      if (live.contains(rel)) return
      if (live.exists(_.startsWith(rel + "/")))
        Store.listDir(p)
          .foreach(c => sweep(c, s"$rel/${c.getFileName}"))
      else Store.deleteRecursively(p)
    }
    Store.listDir(rootPath)
      .filter(Files.isDirectory(_))
      .filter(d => tables.contains(d.getFileName.toString))
      .foreach { tableDir =>
        Store.listDir(tableDir).foreach { seg =>
          sweep(seg, s"${tableDir.getFileName}/${seg.getFileName}")
        }
      }
  }
}

object Store {

  /** Directory listing that CLOSES its stream. `Files.list` holds an
    * open directory fd until the stream is closed or GC'd — the
    * unclosed-iterator form leaked one fd per listed directory, and a
    * store teardown (deleteRecursively over thousands of segment
    * dirs) could exhaust the process fd limit between GCs.
    */
  private[state] def listDir(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** shard number of a shard-replacement segment dir, None for plain
    * segments
    */
  def shardOfDir(dir: String): Option[Int] =
    "__shard=(\\d+)$".r.findFirstMatchIn(dir).map(_.group(1).toInt)

  /** priority tier of a tier-partitioned segment dir, None when the
    * segment carries no tier dimension (and so may hold any tier)
    */
  def tierOfDir(dir: String): Option[Int] =
    "__tier=(\\d+)".r.findFirstMatchIn(dir).map(_.group(1).toInt)

  /** the registerable leaf partition dirs under a freshly-written
    * segment root: `__shard=K` children, or `__tier=T/__shard=K`
    * grandchildren when the write was tier-partitioned
    */
  def leafSegmentDirs(base: Path, rel: String): Vector[String] = {
    def children(p: Path): List[Path] =
      if (!Files.isDirectory(p)) Nil
      else listDir(p).filter(Files.isDirectory(_))
    children(base).flatMap { c =>
      val name = c.getFileName.toString
      if (name.startsWith("__shard=")) List(s"$rel/$name")
      else if (name.startsWith("__tier="))
        children(c).collect {
          case s if s.getFileName.toString.startsWith("__shard=") =>
            s"$rel/$name/${s.getFileName}"
        }
      else Nil
    }.toVector.sorted
  }

  /** batch id encoded in a segment dir name: the second path component
    * is always `b{batch}-{n}` (append) or `r{batch}` (replacement)
    */
  def batchOfDir(dir: String): Long = {
    val seg = dir.split('/')(1)
    "^[br](\\d+)".r.findFirstMatchIn(seg).map(_.group(1).toLong).getOrElse(-1L)
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private val metaCharRe = "^[A-Za-z0-9_.,:;\\- ]*$".r

  def metaCharsOk(s: String): Boolean = metaCharRe.matches(s)

  // Minimal JSON for the manifest shape we write (keys/paths contain no
  // characters needing escapes beyond the ones handled here).
  def renderManifest(batchId: Long, tables: Map[String, Vector[String]],
      meta: Map[String, String] = Map.empty): String = {
    val body = tables.toSeq.sortBy(_._1).map { case (t, dirs) =>
      "\"" + t + "\":[" + dirs.map(d => "\"" + d + "\"").mkString(",") + "]"
    }.mkString(",")
    val metaBody = meta.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":\"" + v + "\""
    }.mkString(",")
    s"""{"batchId":$batchId,"meta":{$metaBody},"tables":{$body}}"""
  }

  /** the `"meta":{…}` ledger of a manifest (absent/legacy → empty) */
  def parseMeta(json: String): Map[String, String] =
    "\"meta\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(json)
      .map { m =>
        "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(m.group(1))
          .map(kv => kv.group(1) -> kv.group(2)).toMap
      }.getOrElse(Map.empty)

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
