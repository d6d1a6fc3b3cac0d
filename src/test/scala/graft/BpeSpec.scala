package graft

import graft.ops.Bpe

/** BPE training vs an independent serial implementation of Sennrich's
  * algorithm (the contract is iterative argmax — not ANSI-SQL —
  * so the driver check for q_bpe_* is rows-only and THIS is the
  * oracle).
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // serial reference: word-type counts → (merges, final segmentations)
  private def serialTrain(words: Map[String, Long], n: Int,
      minCount: Long): (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] =
      words.keys.map(w => w -> (w.map(_.toString).toVector :+ Bpe.Eow)).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + words(w)
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          merges += ((a, b, c))
          segs = segs.map { case (w, syms) =>
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += a + b; j += 2
              } else { out += syms(j); j += 1 }
            }
            w -> out.result()
          }
          i += 1
        case _ => done = true
      }
    }
    (merges.result(), segs)
  }

  private lazy val docs = Seq(
    (0L, "low lower lowest low low"),
    (1L, "new newer newest new"),
    (2L, "wide wider widest low new"),
    (3L, "low new lower newer")
  ).toDF("doc_id", "text")

  private lazy val wordFreqs: Map[String, Long] = Map(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 1L,
    "new" -> 4L, "newer" -> 2L, "newest" -> 1L,
    "wide" -> 1L, "wider" -> 1L, "widest" -> 1L)

  test("wordCounts matches the hand-counted type table") {
    val got = Bpe.wordCounts(docs).as[(String, Long)].collect().toMap
    assert(got == wordFreqs)
  }

  test("trainMerges ≡ serial Sennrich reference (ranks, pairs, counts)") {
    val (ref, _) = serialTrain(wordFreqs, n = 12, minCount = 2L)
    val got = Bpe.trainMerges(docs, nMerges = 12)
    assert(got.map(m => (m.left, m.right, m.pairCount)) == ref)
    assert(got.map(_.rank) == got.indices)
    // the early-stop bound held: no merge below minCount
    assert(got.forall(_.pairCount >= 2L))
  }

  test("driver-local merge loop ≡ the distributed job-per-merge loop, bit for bit") {
    // same corpus: every (rank, pair, count) identical — the local
    // incremental algorithm is a pure reimplementation, including the
    // UTF-8-byte-order tie break the distributed orderBy used
    val local = Bpe.trainMerges(docs, nMerges = 12)
    val dist = Bpe.trainMergesDistributedDocs(docs, nMerges = 12)
    assert(local == dist)
    // a wider corpus with heavy ties and repeated chars ("aaa…"
    // exercises the non-overlapping left-to-right merge rule)
    val tricky = (0L to 40L).map { i =>
      (i, s"abab abab${"a" * (i % 5).toInt} ${"z" * (i % 3).toInt}q zz ${i % 7}")
    }.toDF("doc_id", "text")
    val l2 = Bpe.trainMerges(tricky, nMerges = 25, minCount = 1L)
    val d2 = Bpe.trainMergesDistributedDocs(tricky, nMerges = 25, minCount = 1L)
    assert(l2 == d2)
    // the driver-memory guard: maxDriverTypes = 0 forces the
    // distributed fallback inside trainMerges itself — same merges,
    // no driver collect of the type table
    val guarded = Bpe.trainMerges(docs, nMerges = 12, maxDriverTypes = 0L)
    assert(guarded == local)
  }

  test("driver-local loop trains thousands of merges in seconds") {
    // a synthetic vocabulary large enough that the old loop's ~0.1 s
    // of scheduler overhead PER MERGE would take ~3 min; the local
    // loop must stay under a tight wall bound (generous vs the ~1 s
    // it actually takes, but a regression to per-merge jobs trips it)
    val words = (0 until 30000).map { i =>
      (s"w${i % 997}x${i % 89}y${i % 13}z$i".take(4 + i % 12), 1L + i % 50)
    }
    val t0 = System.nanoTime()
    val merges = Bpe.trainMergesLocal(words.toArray, nMerges = 2000,
      minCount = 2L)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 2000, s"only ${merges.length} merges")
    assert(sec < 60.0, f"2000 merges took $sec%.1f s")
    // ranks are dense and counts non-increasing never below minCount
    assert(merges.map(_.rank) == merges.indices)
    assert(merges.forall(_.pairCount >= 2L))
  }

  test("encode reproduces the training segmentation for seen words") {
    val merges = Bpe.trainMerges(docs, nMerges = 12)
    val (_, refSegs) = serialTrain(wordFreqs, n = 12, minCount = 2L)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    for ((w, seg) <- refSegs)
      assert(Bpe.encodeWord(w, ranks) == seg, s"word $w")
  }

  test("encode is per-row and round-trips token concatenation") {
    val merges = Bpe.trainMerges(docs, nMerges = 8)
    val enc = Bpe.encode(docs, merges)
    val rows = enc.as[(Long, Seq[String], Int)].collect()
    assert(rows.length == 4 && rows.forall(r => r._2.nonEmpty && r._3 == r._2.size))
    // stripping Eow markers reconstructs the original words
    val d0 = rows.find(_._1 == 0L).get._2
    assert(d0.mkString.replace(Bpe.Eow, " ").trim == "low lower lowest low low")
    // shuffle-free plan: no Exchange in the encode stage
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
