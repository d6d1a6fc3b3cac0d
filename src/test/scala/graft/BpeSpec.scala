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
