package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TarShards

/** WebDataset-style tar-shard export: ustar conformance, byte
  * reproducibility, deterministic shard/order assignment, round-trip.
  */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def lcg(x: Long): Long =
    ((x % 2147483648L) * 1103515245L + 12345L) % 2147483648L

  private lazy val docs = (0L until 100L).map { i =>
    val payload = (s"payload-$i-" + "x" * (i % 40).toInt).getBytes("UTF-8")
    val meta = s"""{"id":$i}""".getBytes("UTF-8")
    (i, payload, meta)
  }.toDF("doc_id", "bin", "json")

  test("round-trip: every member survives, grouped per sample, ordered by pos") {
    val dir = Files.createTempDirectory("graft-tar").toString
    TarShards.writeTarShards(docs, dir, shards = 4,
      entries = Seq(("json", col("json")), ("bin", col("bin"))), epoch = 1)
    val files = new java.io.File(dir).list().sorted.toSeq
    assert(files == (0 until 4).map(i => f"shard-$i%05d.tar"), files.toString)

    val back = TarShards.readTarShards(spark, dir)
      .as[(Int, String, Array[Byte])].collect()
    assert(back.length == 200) // 2 members × 100 samples
    val byName = back.map(r => r._2 -> r._3).toMap
    (0L until 100L).foreach { i =>
      assert(new String(byName(s"$i.json"), "UTF-8") == s"""{"id":$i}""")
      assert(new String(byName(s"$i.bin"), "UTF-8")
        .startsWith(s"payload-$i-"))
    }
    // shard assignment and within-shard order = the shuffleShards LCG
    def h2(id: Long) = lcg(lcg(id) + 1L)
    back.groupBy(_._1).foreach { case (shard, members) =>
      val keys = members.map(_._2.takeWhile(_ != '.').toLong)
      keys.foreach(k => assert(((h2(k) >> 8) % 4) == shard, s"doc $k"))
      // members arrive in archive order: (pos asc), json before bin
      val expected = keys.distinct.sortBy(k => (h2(k), k))
        .flatMap(k => Seq(s"$k.json", s"$k.bin"))
      assert(members.map(_._2).toSeq == expected.toSeq, s"shard $shard order")
    }
  }

  test("ustar conformance: magic, checksum, sizes parse independently") {
    val dir = Files.createTempDirectory("graft-tar-hdr").toString
    TarShards.writeTarShards(docs.limit(10), dir, shards = 1,
      entries = Seq(("bin", col("bin"))))
    val bytes = Files.readAllBytes(Paths.get(dir, "shard-00000.tar"))
    // magic "ustar\0" + version "00" at offset 257
    assert(new String(bytes, 257, 8, "US-ASCII") == "ustar\u000000")
    // recompute the first header's checksum with the field blanked
    val h = java.util.Arrays.copyOfRange(bytes, 0, 512)
    val stored = Integer.parseInt(
      new String(h, 148, 8, "US-ASCII").takeWhile(c => c >= '0' && c <= '7'), 8)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    assert(h.map(_ & 0xff).sum == stored, "checksum mismatch")
    // trailing end-of-archive: two zero blocks
    assert(bytes.takeRight(1024).forall(_ == 0))
  }

  test("header: oversized member fails loudly instead of truncating") {
    // 12-byte size field = 11 octal digits = max 8 GiB - 1; a silent
    // takeRight truncation would desynchronize every later offset
    intercept[IllegalArgumentException] {
      TarShards.header("big.bin", 1L << 33)
    }
    intercept[IllegalArgumentException] {
      TarShards.header("neg.bin", -1L)
    }
    // the boundary value still encodes
    assert(TarShards.header("max.bin", (1L << 33) - 1).length == 512)
  }

  test("foreign decoder: GNU tar lists and extracts a shard (when present)") {
    assume(new java.io.File("/usr/bin/tar").exists())
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft-tar-gnu").toString
    TarShards.writeTarShards(docs.limit(20), dir, shards = 1,
      entries = Seq(("json", col("json")), ("bin", col("bin"))))
    val shard = s"$dir/shard-00000.tar"
    val listed = Seq("/usr/bin/tar", "-tf", shard).!!.linesIterator.toSeq
    assert(listed.size == 40 && listed.forall(n =>
      n.endsWith(".json") || n.endsWith(".bin")), listed.take(5).toString)
    val outDir = Files.createTempDirectory("graft-tar-x").toString
    assert(Seq("/usr/bin/tar", "-xf", shard, "-C", outDir).! == 0)
    val someId = listed.head.takeWhile(_ != '.')
    val extracted = Files.readAllBytes(Paths.get(outDir, s"$someId.json"))
    assert(new String(extracted, "UTF-8") == s"""{"id":$someId}""")
  }

  test("byte-reproducible under repartitioning; null members skipped") {
    val d1 = Files.createTempDirectory("graft-tar-a").toString
    val d2 = Files.createTempDirectory("graft-tar-b").toString
    val entries = Seq(("json", col("json")), ("bin", col("bin")))
    TarShards.writeTarShards(docs, d1, shards = 3, entries = entries)
    TarShards.writeTarShards(docs.repartition(13), d2, shards = 3,
      entries = entries)
    (0 until 3).foreach { i =>
      val a = Files.readAllBytes(Paths.get(d1, f"shard-$i%05d.tar"))
      val b = Files.readAllBytes(Paths.get(d2, f"shard-$i%05d.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $i bytes differ")
    }
    // a sample with a NULL member writes only its non-null members
    val d3 = Files.createTempDirectory("graft-tar-n").toString
    val withNull = docs.withColumn("json",
      when(col("doc_id") === 7L, lit(null).cast("binary"))
        .otherwise(col("json")))
    TarShards.writeTarShards(withNull, d3, shards = 1, entries = entries)
    val names = TarShards.readTarShards(spark, d3)
      .select("name").as[String].collect().toSet
    assert(!names.contains("7.json") && names.contains("7.bin"))
    assert(names.size == 199)
  }
}
