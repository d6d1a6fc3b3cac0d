package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Curation

/** WebDataset-style tar-shard export — the artifact format multimodal
  * training loaders actually consume (POSIX ustar members named
  * `<key>.<suffix>`, grouped per sample, many samples per `.tar`
  * shard; the layout published with the WebDataset library and used
  * by LAION-scale pipelines). This is the delivery end of the
  * multimodal column story: decode/feature ops upstream, fixed-layout
  * binary shards out.
  *
  * Determinism: sample→shard assignment and within-shard order come
  * from [[Curation.shuffleShards]] (epoch-keyed LCG arithmetic), so
  * shard CONTENT is a pure function of (corpus, shards, epoch) —
  * independent of partitioning, reruns, or which executor writes
  * which file. Headers pin mtime 0 / uid 0 / gid 0 / mode 0644, so
  * shard BYTES are reproducible end-to-end (byte-identity asserted in
  * tests).
  *
  * Scale shape: one repartition on the 8-byte shard key with a
  * within-partition (shard, pos) sort — rows stream through each
  * writer task once; a task holds one open shard file at a time and
  * O(64 KB) of buffer, never a shard in memory. Same
  * executor-parallel pattern as [[Warc.writePagesArchive]].
  */
object TarShards {

  private val BLOCK = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL-terminated (GNU/pax safe)
    val s = java.lang.Long.toOctalString(v)
    // a value wider than the field would silently truncate via
    // takeRight and desynchronize every later member offset — fail loud
    require(v >= 0 && s.length <= width - 1,
      s"tar field overflow: $v needs ${s.length} octal digits, field holds ${width - 1}")
    val pad = "0" * math.max(0, width - 1 - s.length) + s
    (pad.takeRight(width - 1) + "\u0000").getBytes(US_ASCII)
  }

  /** one ustar header block for a regular file */
  private[graft] def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(US_ASCII).length <= 100,
      s"tar member name too long: $name")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, name.getBytes(US_ASCII))
    put(100, octal(420, 8)) // mode 0644
    put(108, octal(0, 8)) // uid
    put(116, octal(0, 8)) // gid
    put(124, octal(size, 12))
    put(136, octal(0, 12)) // mtime: fixed for reproducible bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // typeflag: regular file
    put(257, "ustar\u000000".getBytes(US_ASCII)) // magic + version
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xff); i += 1 }
    val c = java.lang.Long.toOctalString(sum)
    val cs = ("0" * math.max(0, 6 - c.length) + c).takeRight(6)
    put(148, (cs + "\u0000 ").getBytes(US_ASCII))
    h
  }

  /** Write `df` as `shards` tar files under `dir`
    * (`shard-NNNNN.tar`). `entries` names each sample's members:
    * (suffix, binary column) — e.g. `Seq(("json", metaCol), ("img",
    * imageCol))` yields members `<key>.json`, `<key>.img` per sample,
    * adjacent and in entry order (the WebDataset grouping contract).
    * NULL member columns are skipped for that sample.
    */
  def writeTarShards(df: DataFrame, dir: String, shards: Int,
      entries: Seq[(String, Column)], key: Column = col("doc_id"),
      epoch: Int = 0): Unit = {
    require(entries.nonEmpty, "writeTarShards needs at least one entry column")
    new java.io.File(dir).mkdirs()
    val cols = col("__shard").cast("int").as("__shard") +:
      col("__pos") +: key.cast("string").as("__key") +:
      entries.zipWithIndex.map { case ((_, c), i) => c.cast("binary").as(s"__e$i") }
    val assigned = Curation.shuffleShards(df, shards, key, epoch)
      .withColumnRenamed("shard", "__shard").withColumnRenamed("pos", "__pos")
      .select(cols: _*)
    val suffixes = entries.map(_._1)
    assigned
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__pos"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var out: DataOutputStream = null
        var current = -1
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BLOCK)) // end-of-archive
          out.close(); out = null
        }
        try {
          rows.foreach { r =>
            val sh = r.getInt(0)
            if (sh != current) {
              close()
              current = sh
              out = new DataOutputStream(new BufferedOutputStream(
                new FileOutputStream(f"$dir/shard-$sh%05d.tar"), 1 << 16))
            }
            val k = r.getString(2)
            suffixes.indices.foreach { i =>
              if (!r.isNullAt(3 + i)) {
                val bytes = r.getAs[Array[Byte]](3 + i)
                out.write(header(s"$k.${suffixes(i)}", bytes.length.toLong))
                out.write(bytes)
                val rem = bytes.length % BLOCK
                if (rem != 0) out.write(new Array[Byte](BLOCK - rem))
              }
            }
          }
        } finally close()
      }
  }

  /** Read tar shards back as (shard, name, bytes) — one row per
    * member, in archive order (pos recoverable from the name's key).
    * Distributed: one task per shard file via `binaryFile`, the same
    * per-archive parallelism unit as the WARC reader.
    */
  def readTarShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shardOf = regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
      .cast("int").as("shard")
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(shardOf, col("content"))
      .as[(Int, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer[(Int, String, Array[Byte])]()
        var off = 0
        var done = false
        while (!done && off + BLOCK <= bytes.length) {
          if (bytes(off) == 0) done = true // end-of-archive zero block
          else {
            val name = new String(bytes, off, 100, US_ASCII)
              .takeWhile(_ != '\u0000')
            val sizeStr = new String(bytes, off + 124, 12, US_ASCII)
              .takeWhile(c => c != '\u0000' && c != ' ')
            val size = java.lang.Long.parseLong(sizeStr, 8).toInt
            val data = java.util.Arrays.copyOfRange(bytes,
              off + BLOCK, off + BLOCK + size)
            out += ((shard, name, data))
            off += BLOCK + ((size + BLOCK - 1) / BLOCK) * BLOCK
          }
        }
        out
      }
      .toDF("shard", "name", "bytes")
  }
}
