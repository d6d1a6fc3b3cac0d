package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** injected decoder for the pluggable-codec test (no-arg constructible,
  * Serializable per the MediaDecoder contract)
  */
class FixedTestDecoder extends Multimodal.MediaDecoder {
  override def decodeMeta(mediaId: Long, payload: Array[Byte]): Multimodal.ImageMeta =
    Multimodal.ImageMeta(mediaId, width = 7, height = 9, channels = 1, format = "fixed")
  override def feature(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i => (i + 1).toFloat)
}

/** Training-data operator semantics: scala-oracle checks for the ops
  * whose contracts aren't ANSI-SQL-expressible (LSH recall vs exact,
  * simhash locality, multimodal plumbing shape).
  */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = {
    // deterministic corpus: 40 base docs + near-dup copies of 10 of
    // them (one word changed) + 3 exact dups
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def text(i: Int, mutate: Boolean): String = {
      val words = (0 until 30).map { j =>
        vocab((SyntheticRnd.mix(i.toLong, j.toLong) % vocab.length).toInt)
      }
      val w = if (mutate) words.updated(15, "MUTANT") else words
      w.mkString(" ")
    }
    val base = (0 until 40).map(i => (i.toLong, text(i, mutate = false)))
    val near = (0 until 10).map(i => (100L + i, text(i, mutate = true)))
    val exact = (0 until 3).map(i => (200L + i, text(i, mutate = false)))
    (base ++ near ++ exact).toDF("doc_id", "text")
  }

  object SyntheticRnd {
    def mix(a: Long, b: Long): Long =
      graft.sites.SyntheticWeb.mix(99L, a, b) & Long.MaxValue
  }

  test("exact dedup keeps min doc_id per content, counts dups") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 50) // 53 docs, 3 exact dups collapse
    val dupGroups = groups.filter(_.getAs[Long]("n_dups") > 1)
    assert(dupGroups.length === 3)
    assert(dupGroups.forall(_.getAs[Long]("keep_id") < 40))
    assert(Dedup.dropExactDups(docs).count() === 50)
  }

  test("minhash LSH near-dups: full recall of exact jaccard pairs here") {
    val exact = Dedup.jaccardPairs(docs, shingleN = 3, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val lsh = Dedup.minhashNearDups(docs, k = 16, bands = 8, shingleN = 3,
      threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two-phase: lsh output is exact-verified ⇒ subset of exact pairs
    assert(lsh.subsetOf(exact))
    // recall: 8 bands of 2 rows at j≥0.5 ⇒ expect ≥90% here
    assert(lsh.size.toDouble / exact.size >= 0.9,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("incremental dedup: new snapshot vs corpus, never corpus × corpus") {
    // corpus = base docs 0-39; new dump = exact copies (200-202),
    // near-dup mutants (100-109), and genuinely novel docs
    val corpus = docs.filter(col("doc_id") < 40)
    val novel = Seq(
      (400L, "completely fresh content about rivers and mountains nowhere else"),
      (401L, "another unseen document with its own vocabulary entirely"))
      .toDF("doc_id", "text")
    val newDump = docs.filter(col("doc_id") >= 100).union(novel)

    // exact pass: only the 3 byte-identical copies drop
    val afterExact = Dedup.dropExactDupsAgainst(newDump, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(afterExact == (100L to 109L).toSet + 400L + 401L)

    // cross near-dup pairs ⊆ the union run's pairs, restricted to
    // (new, corpus) — and every pair really crosses the snapshot line
    val cross = Dedup.minhashNearDupsAgainst(newDump, corpus,
        k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(cross.forall { case (n, c) => n >= 100 && c < 40 })
    val unionPairs = Dedup.minhashNearDups(corpus.union(newDump),
        k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cross.forall { case (n, c) => unionPairs.contains((c, n)) })
    // the mutants pair with their corpus originals (j ≈ 0.8 ≥ 0.5)
    for (i <- 0L until 10L)
      assert(cross.contains((100L + i, i)), s"mutant ${100 + i}")

    // keep-pass: exact copies and mutants go, novel docs stay
    val kept = Dedup.dropDupsAgainst(newDump, corpus,
        k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(400L, 401L))

    // the PRE-COMPUTED band-key artifact path (what a streaming /
    // per-dump deployment persists) yields the identical pair set
    val viaArtifact = Dedup.minhashNearDupsAgainstBands(newDump,
        Dedup.lshBandKeys(corpus, k = 16, bands = 8, shingleN = 3),
        corpus, k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(viaArtifact == cross)

    // crash-window duplicates in the persisted artifact (DedupStream
    // compaction renames BEFORE deleting) must not inflate bucket
    // sizes past maxBucket and silently drop candidates: tripling
    // every band row while capping at the TRUE max bucket size still
    // yields the identical pair set
    val bands0 = Dedup.lshBandKeys(corpus, k = 16, bands = 8, shingleN = 3)
    val trueMax = bands0.groupBy(col("band"), col("bucket"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .agg(max(col("n"))).as[Long].head().toInt
    val dupBands = bands0.union(bands0).union(bands0)
    val viaDup = Dedup.minhashNearDupsAgainstBands(newDump, dupBands,
        corpus, k = 16, bands = 8, shingleN = 3, threshold = 0.5,
        maxBucket = trueMax)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(viaDup == cross, "duplicated band rows changed the pair set")
  }

  test("ShingleHash64 expression ≡ the Column-algebra shingle hash") {
    // the custom expression must be value-identical to the declarative
    // form it replaces (split \s+ / space joins / xxhash64 seed 42),
    // including whitespace edge cases
    val texts = docs.select(col("text")).collect().map(_.getString(0)) ++ Seq(
      "one two three four", "a  b\tc\nd e", " leading space", "trailing ",
      "", "short one", "exactly three words")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toSeq.toDF("i", "text")
    val ref = transform(TextOps.shingles(col("text"), 3), s => xxhash64(s))
    val rows = df.select(col("i"),
      Dedup.shingleHashes(col("text"), 3).as("fast"), ref.as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"row ${r.getInt(0)}")
    }
  }

  test("jaccard df-cap bounds hot-shingle blowup and is surfaced in stats") {
    // 20 docs: 12 unique words each + one shared 5-word boilerplate
    // tail — the tail's 3 interior 3-grams have df=20 (a miniature
    // boilerplate bomb: uncapped they alone join all 190 pairs)
    val tail = "copyright footer terms of service"
    val hotDocs = (0 until 20).map { i =>
      val uniq = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$uniq $tail")
    }.toDF("doc_id", "text")

    // uncapped: every pair shares the 3 boilerplate grams
    val uncapped = Dedup.jaccardPairs(hotDocs, shingleN = 3, threshold = 0.05)
    assert(uncapped.count() === 190) // all C(20,2) pairs — the blowup
    // capped at df≤5: boilerplate grams leave the universe; no doc
    // pair shares a content gram, so the pair output collapses
    assert(Dedup.jaccardPairs(hotDocs, shingleN = 3, threshold = 0.05,
      maxDf = 5L).count() === 0)
    // and the cap's blast radius is reported, not silent
    val st = Dedup.gramDfStats(hotDocs, shingleN = 3, maxDf = 5L).collect()(0)
    assert(st.getAs[Long]("n_hot_grams") === 3)
    assert(st.getAs[Long]("max_df") === 20)
    assert(st.getAs[Long]("n_postings_dropped") === 60)
    // default cap is far above any test corpus: identical to uncapped
    assert(Dedup.jaccardPairs(docs, shingleN = 3, threshold = 0.5).count() ===
      Dedup.jaccardPairs(docs, shingleN = 3, threshold = 0.5,
        maxDf = Long.MaxValue).count())
  }

  test("lsh maxBucket drop is quantified by lshBucketStats") {
    // maxBucket=1 drops every usable bucket (any dup bucket has ≥2 ids)
    assert(Dedup.lshCandidates(docs, k = 16, bands = 8, shingleN = 3,
      maxBucket = 1).count() === 0)
    val st = Dedup.lshBucketStats(docs, k = 16, bands = 8, shingleN = 3,
      maxBucket = 1).collect()(0)
    assert(st.getAs[Long]("n_capped_buckets") > 0)
    assert(st.getAs[Int]("max_bucket") >= 2)
    // at the default cap nothing is dropped on this corpus
    val st2 = Dedup.lshBucketStats(docs, k = 16, bands = 8, shingleN = 3)
      .collect()(0)
    assert(st2.getAs[Long]("n_capped_buckets") === 0)
  }

  test("nearDupClusters: pairs close under transitivity, canonical keep-pass") {
    val clusters = Dedup.nearDupClusters(docs, k = 16, bands = 8,
      shingleN = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(clusters.size === 53) // every doc labeled, singletons included
    // i, 100+i (near), 200+i (exact) collapse to ONE cluster rooted at i —
    // three pairwise pairs become one component, not three pair rows
    (0 until 3).foreach { i =>
      assert(clusters(i.toLong) === ((i.toLong, true)))
      assert(clusters(100L + i) === ((i.toLong, false)))
      assert(clusters(200L + i) === ((i.toLong, false)))
    }
    (3 until 10).foreach { i =>
      assert(clusters(100L + i) === ((i.toLong, false)))
    }
    // untouched base docs are their own canonical singletons
    (10 until 40).foreach(i => assert(clusters(i.toLong) === ((i.toLong, true))))
    assert(clusters.values.count(_._2) === 40)
    // the keep-pass retains exactly the canonical rows
    val kept = Dedup.dropNearDups(docs, k = 16, bands = 8,
      shingleN = 3, threshold = 0.5)
    assert(kept.count() === 40)
    assert(kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet ===
      (0L until 40L).toSet)
  }

  test("simhash: exact dups collide, near-dups within distance, far docs far") {
    val fps = docs.select(col("doc_id"), TextOps.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 3).foreach(i => assert(fps(i.toLong) === fps(200L + i)))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    // near-dup (1 word of 30 changed) stays within a small radius
    (0 until 10).foreach(i => assert(dist(i.toLong, 100L + i) <= 16))
    // unrelated docs are farther than near-dup pairs on average
    val nearAvg = (0 until 10).map(i => dist(i.toLong, 100L + i)).sum / 10.0
    val farAvg = (0 until 10).map(i => dist(i.toLong, 20L + i)).sum / 10.0
    assert(nearAvg < farAvg)
  }

  test("simhashNearDups finds the exact-dup pairs via chunk join") {
    val pairs = Dedup.simhashNearDups(docs, maxDist = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach(i => assert(pairs.contains((i.toLong, 200L + i))))
  }

  test("simhash hot chunk: bucket cap bounds pair output, stats report the drop") {
    // 12 distinct fps, each = base with one bit of chunk 3 (bits 48-59)
    // flipped: pairwise Hamming distance 2, and chunks 0-2 identical
    // across ALL fps — three 12-wide hot buckets by construction
    val base = 0x0123456789ABCDEFL
    val fps = (0 until 12).map(i => (i.toLong, base ^ (1L << (48 + i))))
      .toDF("doc_id", "fp")
    // uncapped: every pair is a candidate via the shared chunks and
    // passes the dist ≤ 3 verify ⇒ C(12,2) pairs
    assert(Dedup.simhashNearDupsFromFps(fps, maxDist = 3).count() === 66)
    // capped at 6: the three hot buckets are dropped, chunk-3 buckets
    // are singletons ⇒ bounded output (zero pairs), loudly quantified
    assert(Dedup.simhashNearDupsFromFps(fps, maxDist = 3, maxBucket = 6)
      .count() === 0)
    val st = Dedup.simhashBucketStatsFromFps(fps, maxBucket = 6).collect()(0)
    assert(st.getAs[Long]("n_buckets") === 15) // 3 hot + 12 singleton
    assert(st.getAs[Long]("n_capped_buckets") === 3)
    assert(st.getAs[Long]("n_fps_in_capped") === 36)
    assert(st.getAs[Int]("max_bucket") === 12)
  }

  test("simhash identical-fp groups pre-collapse to star pairs") {
    // 5 docs share one fp, 1 doc is far away: the group must surface
    // as 4 (rep, member, dist 0) rows — O(group), not the B² clique
    val fps = ((0 until 5).map(i => (10L + i, 0x00FF00FF00FF00FFL)) :+
      (99L, 0x7700770077007700L)).toDF("doc_id", "fp")
    val rows = Dedup.simhashNearDupsFromFps(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows === (1 until 5).map(i => (10L, 10L + i, 0)).toSet)
  }

  test("minhash signature of a sub-n-token doc is the MaxValue sentinel") {
    // shingleHashes of a doc with < n tokens is an EMPTY array; the
    // fold then yields [Long.MaxValue × k] (the nested array_min form
    // this replaced yielded [null × k] — divergence documented at
    // Dedup.minhashSignature)
    val df = Seq((1L, "one two")).toDF("doc_id", "text")
    val r = df.select(
      Dedup.shingleHashes(col("text"), 3).as("sh"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), 4).as("sig"))
      .collect()(0)
    assert(r.getSeq[Long](0).isEmpty)
    assert(r.getSeq[Long](1) === Seq.fill(4)(Long.MaxValue))
  }

  test("md5 signature mode: two-phase subset + recall parity with exact") {
    // the foreign-verifiable hash family must keep the production
    // contract: output ⊆ exact jaccard pairs (verify stage) and high
    // recall at matched band geometry
    val exact = Dedup.jaccardPairs(docs, shingleN = 3, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Pairs = Dedup.minhashNearDupsMd5(docs, k = 16, bands = 8,
        shingleN = 3, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md5Pairs.subsetOf(exact))
    assert(md5Pairs.size.toDouble / exact.size >= 0.9,
      s"recall ${md5Pairs.size}/${exact.size}")
    // clusters twin: canonical rows = one per component of the pairs
    val clusters = Dedup.nearDupClustersMd5(docs, k = 16, bands = 8,
      shingleN = 3, threshold = 0.5).collect()
    assert(clusters.length === docs.count())
    assert(clusters.forall(r =>
      r.getAs[Long]("cluster_id") <= r.getAs[Long]("doc_id")))
    // incremental twin crosses the snapshot line and finds the mutants
    val corpus = docs.filter(col("doc_id") < 40)
    val newDump = docs.filter(col("doc_id") >= 100)
    val cross = Dedup.minhashNearDupsAgainstMd5(newDump, corpus,
        k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(cross.forall { case (n, c) => n >= 100 && c < 40 })
    for (i <- 0L until 10L)
      assert(cross.contains((100L + i, i)), s"mutant ${100 + i}")
  }

  test("minhashSignatureMd5 ≡ independent nested-transform formulation") {
    val k = 4
    val edge = Seq((900L, "one two"), (901L, ""), (902L, " a b c d "))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).union(edge)
    val ref = transform(sequence(lit(0), lit(k - 1)), j => {
      val a = ((j.cast("long") * 2 + 1) * lit(2654435761L)) % 1048576L
      val b = (j.cast("long") * 40503L + 17L) % 1048576L
      coalesce(
        array_min(transform(TextOps.shingles(col("text"), 3), s =>
          (conv(substring(md5(s), 1, 5), 16, 10).cast("long") * a + b)
            % 1048576L)),
        lit(Dedup.md5SigSentinel))
    })
    val rows = all.select(
      Dedup.minhashSignatureMd5(col("text"), k, 3).as("got"),
      ref.as("want")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // every non-sentinel hash is inside the 20-bit domain
    rows.flatMap(_.getSeq[Long](0)).foreach(h =>
      assert(h >= 0 && h <= Dedup.md5SigSentinel))
  }

  test("simhashMd5 ≡ driver-side md5 bit-majority reference") {
    def ref(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Long](64)
      text.split("\\s+", -1).foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        val hi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        val lo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        var i = 0
        while (i < 64) {
          val bit = if (i < 32) (lo >> i) & 1L else (hi >> (i - 32)) & 1L
          votes(i) += (if (bit == 1L) 1L else -1L)
          i += 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
    }
    val edge = Seq((900L, "x"), (901L, " leading"), (902L, "trailing "),
      (903L, "a  b")).toDF("doc_id", "text")
    val rows = docs.union(edge)
      .select(col("text"), TextOps.simhashMd5(col("text")).as("fp"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === ref(r.getString(0)),
      s"fp mismatch for '${r.getString(0).take(40)}'"))
  }

  test("brute-force kNN matches a driver-side oracle") {
    val emb = spark.range(0, 60).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => sin(col("id") * (i + 1)).cast("float")).as("embedding"))
      .cache()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.bruteForceTopK(queries, emb, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val n = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0.0) 0.0 else d / n
    }
    val want = (0L until 3L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, s) => (-s, v) }
        .take(4).zipWithIndex
        .map { case ((v, _), i) => (q, i + 1, v) }
    }.toSet
    assert(got === want)
  }

  test("LSH kNN: recall ≥ 0.5 vs brute force on clustered vectors") {
    // clustered embeddings so LSH buckets are meaningful
    val emb = spark.range(0, 200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (sin((col("id") % 8) * (i + 1)) +
          sin(col("id") * (i + 3)) * 0.1).cast("float")).as("embedding"))
      .cache()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, k = 5, nBits = 6, tables = 8)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("semDeDup: kept set = brute-force within-cluster rule; cap keeps all") {
    // clustered vectors with exact duplicates: ids ≡ mod 8 share a
    // dominant direction, +0.05 id-specific noise; ids 100-103 are
    // exact copies of 0-3 (cos = 1 → must be dropped)
    val emb = spark.range(0, 120).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (sin((col("id") % 100 % 8 + 1) * (i + 1)) +
          sin((col("id") % 100 + 1) * (i + 3)) * 0.05).cast("float"))
        .as("embedding"))
      .filter(col("vec_id") < 104)
      .cache()

    val cents = Similarity.ivfCentroidsLloyd(emb, k = 6, iters = 1)
    val kept = Similarity
      .semDeDup(emb, Similarity.assignBucket(col("embedding"), cents), 0.9)
      .collect().map(_.getLong(0)).toSet

    // driver-side oracle over the same cluster assignment
    val assigned = emb.select(col("vec_id"),
      Similarity.assignBucket(col("embedding"), cents).as("cluster"),
      col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val n = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0.0) 0.0 else d / n
    }
    val wantKept = assigned.filter { case (id, cl, v) =>
      !assigned.exists { case (id2, cl2, v2) =>
        cl2 == cl && id2 < id && cos(v2, v) >= 0.9
      }
    }.map(_._1).toSet
    assert(kept === wantKept)
    // the exact copies of 0-3 can never survive (their originals are
    // lower-id, same cluster by construction, cos = 1)
    assert((100L to 103L).forall(!kept.contains(_)))
    assert((0L to 3L).forall(kept.contains))

    // cap excludes oversized clusters from pairing: everything kept
    val keptCapped = Similarity
      .semDeDup(emb, lit(0), 0.9, maxCluster = 10)
      .count()
    assert(keptCapped === 104)
    val stats = Similarity
      .semDeDupClusterStats(emb, lit(0), maxCluster = 10).collect()
    assert(stats.length === 1 && stats(0).getBoolean(2) &&
      stats(0).getLong(1) === 104)

    // axis-sign bucket: MSB-first sign bits of the leading dims
    val b = emb.select(col("vec_id"),
      Similarity.axisSignBucket(col("embedding"), 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = assigned.map { case (id, _, v) => id -> v }.toMap
    b.foreach { case (id, got) =>
      val v = vecs(id)
      val want = (0 until 4).map(j => if (v(j) > 0f) 1 << (3 - j) else 0).sum
      assert(got === want, s"vec $id")
    }
  }

  test("DotProduct expression ≡ zip_with/aggregate dot, bit for bit") {
    def ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val df = spark.range(0, 50).select(
      transform(sequence(lit(0), lit(7)),
        i => sin(col("id") * (i + 1)).cast("float")).as("a"),
      transform(sequence(lit(0), lit(7)),
        i => cos(col("id") * (i + 2)).cast("float")).as("b"),
      array((0 to 7).map(i => lit(0.1 * i)): _*).as("d"))
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("fast_ff"), ref(col("a"), col("b")).as("slow_ff"),
      Similarity.dot(col("a"), col("d")).as("fast_fd"), ref(col("a"), col("d")).as("slow_fd"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // length mismatch: both formulations yield NULL
    val mism = df.select(
      Similarity.dot(col("a"), slice(col("b"), 1, 3)).as("x"),
      ref(col("a"), slice(col("b"), 1, 3)).as("y")).collect()
    mism.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("cosine near-dup pairs: LSH output ⊆ exact, high recall on clusters") {
    // 8 tight clusters ⇒ intra-cluster cosine is high, cross-cluster low
    val emb = spark.range(0, 160).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (sin((col("id") % 8) * (i + 1)) +
          sin(col("id") * (i + 3)) * 0.05).cast("float")).as("embedding"))
      .cache()
    val exact = Similarity.cosinePairsExact(emb, 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val lsh = Similarity.cosineNearDups(emb, 0.9, nBits = 4, tables = 8)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // two-phase: exact verify ⇒ no false positives
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
    // maxBucket=1 drops every bucket ⇒ no pairs (cap is effective)
    assert(Similarity.cosineNearDups(emb, 0.9, nBits = 4, tables = 8,
      maxBucket = 1).count() === 0)
  }

  test("IVF kNN: recall vs brute force on clustered vectors") {
    val emb = spark.range(0, 200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (sin((col("id") % 8) * (i + 1)) +
          sin(col("id") * (i + 3)) * 0.1).cast("float")).as("embedding"))
      .cache()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, k = 5, nCentroids = 12, nprobe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    // determinism: same centroids, same result
    val ivf2 = Similarity.ivfTopK(queries, emb, k = 5, nCentroids = 12, nprobe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf === ivf2)

    // the pre-built artifact path (persisted quantizer + bucketed
    // index) is bit-identical, including after a centroid-table
    // round trip through the persistable DF form
    val cents = Similarity.ivfCentroidsLloyd(emb, 12, iters = 1)
    val reloaded = Similarity.centroidsOf(
      Similarity.centroidsDf(spark, cents))
    assert(reloaded.length == cents.length &&
      reloaded.zip(cents).forall { case (a, b) => a.sameElements(b) })
    val viaIndex = Similarity.ivfTopKIndexed(queries,
        Similarity.ivfIndex(emb, reloaded), reloaded, k = 5, nprobe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === ivf)
  }

  test("IVF Lloyd refinement: distortion strictly drops, recall never worse, deterministic") {
    val emb = spark.range(0, 200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (sin((col("id") % 8) * (i + 1)) +
          sin(col("id") * (i + 3)) * 0.1).cast("float")).as("embedding"))
      .cache()
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def distortion(cents: Array[Array[Double]]): Double =
      vecs.values.map { v =>
        cents.map { c =>
          v.indices.map(j => { val d = v(j) - c(j); d * d }).sum
        }.min
      }.sum
    val init = Similarity.ivfCentroids(emb, 12)
    val refined = Similarity.ivfCentroidsLloyd(emb, 12, iters = 1)
    assert(distortion(refined) < distortion(init),
      s"${distortion(refined)} !< ${distortion(init)}")
    // determinism: same corpus, same refined centroids
    val refined2 = Similarity.ivfCentroidsLloyd(emb, 12, iters = 1)
    assert(refined.map(_.toSeq).toSeq === refined2.map(_.toSeq).toSeq)
    // recall with the refined quantizer is at least the sample-init's
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(lloyd: Int): Double = {
      val got = Similarity.ivfTopK(queries, emb, k = 5, nCentroids = 12,
        nprobe = 4, lloydIters = lloyd)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    assert(recall(1) >= recall(0), s"${recall(1)} < ${recall(0)}")
  }

  test("media decoder is pluggable by class name via spark conf") {
    val media = Multimodal.syntheticMedia(spark, 5L)
    spark.conf.set(Multimodal.decoderConfKey, classOf[FixedTestDecoder].getName)
    try {
      val meta = Multimodal.decodeMeta(media).collect()
      assert(meta.forall(m => m.width === 7 && m.height === 9 &&
        m.channels === 1 && m.format === "fixed"))
      val frames = Multimodal.sampleFrames(media, strideMs = 1000L,
        maxFrames = 2, featureDim = 3).collect()
      assert(frames.forall(_.feature.toSeq === Seq(1f, 2f, 3f)))
    } finally spark.conf.unset(Multimodal.decoderConfKey)
    // default routes back to the stub
    val stubMeta = Multimodal.decodeMeta(media).collect()
    assert(stubMeta.map(_.format).toSet.subsetOf(Set("png", "jpeg", "mp4")))
  }

  test("averageHash64: checkerboard golden, scale invariance, perceptual near-dup pairs") {
    import java.awt.image.BufferedImage
    def checker(size: Int, invert: Boolean): BufferedImage = {
      val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
      val cellPx = size / 8
      for (y <- 0 until size; x <- 0 until size) {
        val on = ((y / cellPx + x / cellPx) % 2 == 0) != invert
        img.setRGB(x, y, if (on) 0xFFFFFF else 0x000000)
      }
      img
    }
    // golden: bit r*8+c set exactly where (r+c) even
    val expected = (0 until 64)
      .filter(i => (i / 8 + i % 8) % 2 == 0)
      .foldLeft(0L)((acc, i) => acc | (1L << i))
    assert(Multimodal.averageHash64(checker(32, invert = false)) == expected)
    // box averaging makes the hash resolution-invariant
    assert(Multimodal.averageHash64(checker(64, invert = false)) == expected)
    // inverted pattern is the bitwise complement (hamming 64)
    assert(Multimodal.averageHash64(checker(32, invert = true)) == ~expected)

    import spark.implicits._
    // constructed corpus: 5 pairs + one undecodable payload (dropped)
    val media = Multimodal.syntheticNearDupImages(spark, 10L).collect().toSeq :+
      Multimodal.MediaRow(99L, "png", Array[Byte](1, 2, 3))
    val hashes = Multimodal.imageHashes(media.toDS()).collect()
    assert(hashes.length == 10) // garbage payload dropped
    assert(hashes.groupBy(_.ahash).size == 5) // pairs collapse
    val pairs = Multimodal.imageNearDups(media.toDS())
      .orderBy("media_a").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == (0 until 5).map(g => (2L * g, 2L * g + 1, 0)))
  }

  test("ImageIoDecoder decodes real PNG dimensions and pixel features via the JDK codec") {
    import java.awt.image.BufferedImage
    // a real 37×21 PNG, all-black except one white row
    val img = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
    (0 until 37).foreach(x => img.setRGB(x, 10, 0xFFFFFF))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val pngBytes = baos.toByteArray
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(0L, "png", pngBytes),
      Multimodal.MediaRow(1L, "mp4", Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 9, 9))
    ).toDS()
    spark.conf.set(Multimodal.decoderConfKey,
      classOf[Multimodal.ImageIoDecoder].getName)
    try {
      val meta = Multimodal.decodeMeta(media).collect().sortBy(_.media_id)
      // real decode: exact dimensions, not the stub's hash-derived ones
      assert(meta(0) === Multimodal.ImageMeta(0L, 37, 21, 3, "png"))
      // non-image payload falls back to the (total) stub
      assert(meta(1) === Multimodal.stubDecodeMeta(1L, media.collect()(1).payload))
      // pixel feature: luminance histogram, L1-normalized; the white
      // row is 1/21 of the pixels and lands in the top bin
      val dec = new Multimodal.ImageIoDecoder
      val f = dec.feature(pngBytes, 4)
      assert(f.length === 4)
      assert(math.abs(f.sum - 1f) < 1e-4)
      assert(math.abs(f(3) - 1f / 21f) < 1e-4)
      assert(math.abs(f(0) - 20f / 21f) < 1e-4)
    } finally spark.conf.unset(Multimodal.decoderConfKey)
  }

  test("ImageIoDecoder decodes real PNG containers (synthetic image corpus)") {
    val dec = new Multimodal.ImageIoDecoder
    // i = 7 → 8 + 91 = 99 wide, 8 + 203 % 90 = 8 + 23 = 31 tall
    val png = Multimodal.syntheticPngBytes(7L, seed = 42L)
    assert(Multimodal.sniffFormat(png) === "png")
    assert(dec.decodeMeta(7L, png) === Multimodal.ImageMeta(7L, 99, 31, 3, "png"))
    // the luminance-histogram feature comes from REAL pixels: hash
    // pattern pixels spread across bins and L1-normalize to 1
    val f = dec.feature(png, 8)
    assert(math.abs(f.sum - 1f) < 1e-3, f.toSeq.toString)
    assert(f.count(_ > 0f) >= 4)
    assert(f.toSeq !== Multimodal.stubFeature(png, 8).toSeq)
    // the distributed operator decodes the same containers per partition
    val metas = Multimodal.decodeMeta(
      Multimodal.syntheticImages(spark, 12L), Some(dec)).collect()
    assert(metas.length === 12)
    metas.foreach { m =>
      val i = m.media_id
      assert(m.width === 8 + ((i * 13L) % 120L).toInt)
      assert(m.height === 8 + ((i * 29L) % 90L).toInt)
      assert(m.channels === 3)
      assert(m.format === "png")
    }
  }

  test("JdkAvDecoder decodes real WAV headers and PCM RMS features via javax.sound") {
    val dec = new Multimodal.JdkAvDecoder
    // i = 5 → 16000 Hz stereo, 300 + 185 = 485 frames, 30 ms
    val wav = Multimodal.syntheticWavBytes(5L, seed = 42L)
    assert(Multimodal.sniffFormat(wav) === "wav")
    assert(dec.decodeAudio(5L, wav) ===
      Multimodal.AudioMeta(5L, 16000, 2, 485L, 30L, "wav"))
    // real PCM feature: the generator writes a 0.4-amplitude sine
    // (+≤0.05 noise), so every RMS window sits near 0.4/√2 ≈ 0.283 —
    // nothing the content-hash stub could produce
    val f = dec.feature(wav, 4)
    assert(f.length === 4)
    assert(f.forall(v => v > 0.2f && v < 0.36f), f.toSeq.toString)
    assert(f.toSeq !== Multimodal.stubFeature(wav, 4).toSeq)
    // non-audio, non-image payload falls back to the (total) stub
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    assert(dec.decodeAudio(7L, junk) === Multimodal.stubDecodeAudio(7L, junk))
    assert(dec.feature(junk, 4).toSeq === Multimodal.stubFeature(junk, 4).toSeq)
    // the distributed operator runs the same decode per partition
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.syntheticAudio(spark, 12L), Some(dec)).collect()
    assert(metas.length === 12)
    metas.foreach { m =>
      val i = m.media_id
      assert(m.sample_rate === Seq(8000, 16000, 22050, 44100)((i % 4).toInt))
      assert(m.channels === 1 + (i % 2).toInt)
      assert(m.frames === 300L + (i * 37L) % 1000L)
      assert(m.duration_ms === m.frames * 1000L / m.sample_rate)
      assert(m.format === "wav")
    }
  }

  test("parseMp4Meta walks real ISO-BMFF box trees (v0/v1 mvhd, largesize, malformed)") {
    // hand-written fixture off the public spec: version-1 movie
    // header (64-bit duration) plus a largesize (size == 1) mdat —
    // the two layouts the arithmetic generator doesn't produce
    val b = java.nio.ByteBuffer.allocate(168)
    b.putInt(16).put("ftypmp42".getBytes("US-ASCII")).putInt(0)
    b.putInt(128).put("moov".getBytes("US-ASCII"))
    b.putInt(120).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000).putLong(0L).putLong(0L) // v1; ctime/mtime 64-bit
      .putInt(90000).putLong(123456L).put(new Array[Byte](80))
    b.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(24L)
      .putLong(0x0102030405060708L)
    val fixture = b.array()
    assert(Multimodal.parseMp4Meta(1L, fixture) ===
      Some(Multimodal.VideoMeta(1L, 1371L, 90000, 0, "mp42", "mp4")))
    // generated v0 corpus: i = 9 → timescale 1200, 1677 ticks, 1 trak
    val gen = Multimodal.syntheticMp4Bytes(9L, seed = 42L)
    assert(Multimodal.sniffFormat(gen) === "mp4")
    assert(Multimodal.parseMp4Meta(9L, gen) ===
      Some(Multimodal.VideoMeta(9L, 1397L, 1200, 1, "isom", "mp4")))
    // magic-bytes-plus-noise (no box tree) must NOT parse
    val junk = Array[Byte](0, 0, 0, 0x18) ++
      "ftyp".getBytes("US-ASCII") ++ Array.fill[Byte](40)(7)
    assert(Multimodal.parseMp4Meta(2L, junk) === None)
    // the distributed operator: real parse for the corpus, stub fallback
    val metas = Multimodal.decodeVideoMeta(
      Multimodal.syntheticVideo(spark, 12L)).collect()
    assert(metas.length === 12)
    metas.foreach { m =>
      val i = m.media_id
      val ts = 600 * (1 + (i % 4).toInt)
      assert(m.timescale === ts)
      assert(m.duration_ms === (1200L + (i * 53L) % 4800L) * 1000L / ts)
      assert(m.tracks === 1 + (i % 3).toInt)
      assert(m.brand === "isom")
    }
    // sampleFrames now uses the REAL mvhd duration for parseable
    // payloads: i = 0 → 2000 ms at stride 500 → exactly 4 frames
    val frames = Multimodal.sampleFrames(
      Multimodal.syntheticVideo(spark, 1L), strideMs = 500L, maxFrames = 100)
      .collect()
    assert(frames.length === 4)
    assert(frames.map(_.ts_ms).sorted.toSeq === Seq(0L, 500L, 1000L, 1500L))
  }

  test("parseRawVideoTrack resolves the full stts/stsc/stsz/stco sample table") {
    // generated corpus: i = 5 → 15×11 RGB24, 3 frames, media
    // timescale 2000, delta 120 ticks
    val gen = Multimodal.syntheticRawMp4Bytes(5L, seed = 42L)
    val t = Multimodal.parseRawVideoTrack(gen).get
    assert((t.codec, t.width, t.height, t.depth, t.timescale) ===
      (("raw ", 15, 11, 24, 2000L)))
    assert(t.ticks.toSeq === Seq(0L, 120L, 240L))
    assert(t.sizes.toSeq === Seq.fill(3)(15L * 11 * 3))
    assert(t.offsets.toSeq === (0 until 3).map(f => 579L + f * 15 * 11 * 3))
    // sample BYTES are addressed exactly: frame 1's slice equals the
    // generator's pixel stream for frame 1
    val off = t.offsets(1).toInt
    (0 until 8).foreach { p =>
      assert(gen(off + p) ===
        graft.sites.SyntheticWeb.mix(42L, 5L, (1L << 32) | p.toLong).toByte)
    }
    // the header-metadata walker reads the same container
    assert(Multimodal.parseMp4Meta(5L, gen).map(m => (m.tracks, m.brand)) ===
      Some((1, "isom")))
    // compressed-style corpus (no sample table) and junk must NOT parse
    assert(Multimodal.parseRawVideoTrack(
      Multimodal.syntheticMp4Bytes(5L, seed = 42L)) === None)
    assert(Multimodal.parseRawVideoTrack(Array[Byte](1, 2, 3, 4)) === None)
  }

  test("sample-table machinery: multi-chunk stsc runs, per-sample stsz, stts runs") {
    // hand-written fixture off the public spec: 5 samples of a 2×1
    // raw RGB24 track laid out as chunks of (2, 2, 1) samples via TWO
    // stsc runs, a PER-SAMPLE stsz table, and TWO stts runs — the
    // layouts the arithmetic generator doesn't produce
    val ascii = "US-ASCII"
    val b = java.nio.ByteBuffer.allocate(344)
    b.putInt(314).put("moov".getBytes(ascii))
    b.putInt(306).put("trak".getBytes(ascii))
    b.putInt(298).put("mdia".getBytes(ascii))
    b.putInt(32).put("mdhd".getBytes(ascii))
      .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(300)
      .putShort(0x55C4.toShort).putShort(0)
    b.putInt(258).put("minf".getBytes(ascii))
    b.putInt(250).put("stbl".getBytes(ascii))
    b.putInt(102).put("stsd".getBytes(ascii)).putInt(0).putInt(1)
      .putInt(86).put("raw ".getBytes(ascii))
      .putInt(0).putShort(0).putShort(1)
      .putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
      .putShort(2).putShort(1) // width 2, height 1
      .putInt(0x00480000).putInt(0x00480000).putInt(0).putShort(1)
      .put(new Array[Byte](32)).putShort(24).putShort(-1)
    b.putInt(32).put("stts".getBytes(ascii)).putInt(0).putInt(2)
      .putInt(2).putInt(100).putInt(3).putInt(50)
    b.putInt(40).put("stsc".getBytes(ascii)).putInt(0).putInt(2)
      .putInt(1).putInt(2).putInt(1)  // chunks 1-2: 2 samples each
      .putInt(3).putInt(1).putInt(1)  // chunk 3: 1 sample
    b.putInt(40).put("stsz".getBytes(ascii)).putInt(0).putInt(0)
      .putInt(5).putInt(6).putInt(6).putInt(6).putInt(6).putInt(6)
    b.putInt(28).put("stco".getBytes(ascii)).putInt(0).putInt(3)
      .putInt(314).putInt(326).putInt(338)
    // pixel bytes: samples 0-3 arbitrary, sample 4 = one white + one
    // black pixel (a known histogram)
    (0 until 24).foreach(j => b.put((j * 11).toByte))
    b.put(Array[Byte](-1, -1, -1, 0, 0, 0))
    val fixture = b.array()
    val t = Multimodal.parseRawVideoTrack(fixture).get
    assert(t.ticks.toSeq === Seq(0L, 100L, 200L, 250L, 300L))
    assert(t.sizes.toSeq === Seq.fill(5)(6L))
    assert(t.offsets.toSeq === Seq(314L, 320L, 326L, 332L, 338L))
    import spark.implicits._
    val frames = Multimodal.decodeVideoFrames(
      Seq(Multimodal.MediaRow(7L, "mp4", fixture)).toDS(), featureDim = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.ts_ms).toSeq === Seq(0L, 100L, 200L, 250L, 300L))
    assert(frames.forall(f => f.width == 2 && f.height == 1 && f.sample_bytes == 6L))
    // REAL pixels: the white/black frame's luminance histogram
    assert(frames(4).feature.toSeq === Seq(0.5f, 0.5f))
  }

  test("decodeVideoFrames: real pixels cross-verified against javax.imageio") {
    import spark.implicits._
    val frames = Multimodal.decodeVideoFrames(
      Multimodal.syntheticRawVideo(spark, 12L), featureDim = 8).collect()
    // fan-out and sample-table facts match the generator arithmetic
    val byId = frames.groupBy(_.media_id)
    assert(byId.size === 12)
    byId.foreach { case (i, fs) =>
      assert(fs.length === 2 + (i % 4).toInt)
      val delta = 40L * (1 + (i % 3))
      val mts = 1000L * (1 + (i % 2))
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (f, idx) =>
        assert(f.ts_ms === idx * delta * 1000L / mts)
        assert(f.width === 8 + ((i * 11L) % 24L).toInt)
        assert(f.height === 8 + ((i * 7L) % 16L).toInt)
      }
    }
    // pixel CONTENT: re-encode frame 0 of media 3 as a PNG from the
    // generator's own pixel stream and decode it with the INDEPENDENT
    // javax.imageio path — both real decoders must produce the same
    // luminance histogram (channel order or row-major mistakes break
    // this)
    val i = 3L
    val w = 8 + ((i * 11L) % 24L).toInt
    val h = 8 + ((i * 7L) % 16L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val p = (y * w + x) * 3
        def px(o: Int) = graft.sites.SyntheticWeb.mix(42L, i,
          (0L << 32) | (p + o).toLong).toInt & 0xFF
        img.setRGB(x, y, (px(0) << 16) | (px(1) << 8) | px(2))
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val viaImageIo = new Multimodal.ImageIoDecoder().feature(out.toByteArray, 8)
    val viaRawTrack = frames.find(f => f.media_id == i && f.frame_idx == 0).get.feature
    viaRawTrack.zip(viaImageIo).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6f, s"raw=$a imageio=$b")
    }
  }

  test("multimodal: sniffing real, stub decode deterministic, frame fan-out bounded") {
    val media = Multimodal.syntheticMedia(spark, 30L)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length === 30)
    assert(meta.map(_.format).toSet === Set("png", "jpeg", "mp4"))
    assert(meta.forall(m => m.width >= 64 && m.height >= 64 && m.channels == 3))
    // determinism
    val meta2 = Multimodal.decodeMeta(media).collect()
    assert(meta.sortBy(_.media_id).toSeq === meta2.sortBy(_.media_id).toSeq)

    val frames = Multimodal.sampleFrames(media, strideMs = 1000L, maxFrames = 5)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.size === 30)
    assert(byId.values.forall(f => f.length >= 1 && f.length <= 5))
    assert(byId.values.forall(_.forall(_.feature.length === 16)))
  }

  test("token counts / quality / lang-id / fingerprint shapes") {
    val tc = TextOps.tokenCounts(docs).collect()
    assert(tc.forall(_.getAs[Int]("ws_tokens") === 30))
    val q = TextOps.qualityScore(docs)
    assert(q.columns.toSet === Set("doc_id", "n_chars", "n_tokens",
      "punct_ratio", "stop_ratio", "mean_tok_len", "quality"))
    assert(q.filter(col("n_tokens") === 30).count() === docs.count())
    val lang = docs.select(TextOps.langId(col("text")).as("l"))
      .groupBy("l").count().collect()
    assert(lang.forall(_.getString(0) === "und")) // greek-letter vocab: no stopwords
    val fp = docs.select(col("doc_id"),
      TextOps.fingerprintMinShingle(col("text")).as("fp")).collect()
    val fpMap = fp.map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 3).foreach(i => assert(fpMap(i.toLong) === fpMap(200L + i)))
  }

  test("MinMd5Shingle kernel ≡ array_min(transform(shingles, md5)) Column algebra") {
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a  b\tc\nd e"),          // mixed whitespace runs
      (2L, "ﬁé naïve Ωmega über tokens here"), // non-ASCII grams
      (3L, "one two"),               // < 3 tokens → NULL
      (4L, ""),                      // empty → NULL (split gives [""])
      (5L, "x x x x x x")            // identical grams
    ).toDF("doc_id", "text")
    val kernel = df.select(col("doc_id"),
        TextOps.fingerprintMinShingle(col("text")).as("fp"))
      .as[(Long, Option[String])].collect().toMap
    val algebra = df.select(col("doc_id"),
        array_min(transform(TextOps.shingles(col("text"), 3), s => md5(s))).as("fp"))
      .as[(Long, Option[String])].collect().toMap
    assert(kernel == algebra)
    assert(kernel(3L).isEmpty && kernel(0L).nonEmpty)
  }

  test("repetitionStats: run-fold counts = hand oracle, short docs guarded") {
    val df = Seq(
      (0L, "a b a b a b"),   // bigrams: [a b]x3, [b a]x2 → top 3/5, dup 5/5
      (1L, "p q r s t"),     // 4 distinct bigrams → top 1/4, dup 0
      (2L, "x x x x"),       // [x x]x3 → top 3/3, dup 3/3
      (3L, "solo"),          // < n tokens → 0 grams, guarded fractions
      (4L, "m n m n o m n") // [m n]x3, [n m]x1, [n o]x1, [o m]x1 → top 3/6, dup 3/6
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 5L, 0.6, 1.0)))
    assert(got(1L) === ((1L, 4L, 0.25, 0.0)))
    assert(got(2L) === ((2L, 3L, 1.0, 1.0)))
    assert(got(3L) === ((3L, 0L, 0.0, 0.0)))
    assert(got(4L) === ((4L, 6L, 0.5, 0.5)))
  }

  test("duplicatedWindowStats: corpus-wide window multiplicity vs hand oracle") {
    val docs = Seq(
      (0L, "a b c"),  // windows "a b","b c" — "a b" shared with doc 1
      (1L, "a b x"),  // "a b","b x"
      (2L, "z z z"),  // "z z" twice WITHIN the doc: both instances dup
      (3L, "q")       // no 2-token window → absent
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedWindowStats(docs, n = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 2L, 1L, 0.5)))
    assert(got(1L) === ((1L, 2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 2L, 2L, 1.0)))
    assert(!got.contains(3L) && got.size == 3)
  }

  test("dropDuplicatedSpans: keep-first window removal vs hand oracle") {
    val docs = Seq(
      (0L, "a b c d"),  // owns the first "a b" → untouched
      (1L, "x a b y"),  // loses its "a b" instance → "x y"
      (2L, "z z z z"),  // in-doc repeats: keeper (2,0), spans merge
      (3L, "q"),        // no window → passes through
      (4L, "a b c d")   // exact copy of doc 0 → fully removed
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicatedSpans(docs, n = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, "a b c d", 0L)))
    assert(got(1L) === ((1L, "x y", 2L)))
    // windows (2,1) and (2,2) removable → merged span [1,4)
    assert(got(2L) === ((2L, "z", 3L)))
    assert(got(3L) === ((3L, "q", 0L)))
    assert(got(4L) === ((4L, "", 4L)))
    assert(got.size == 5)
  }

  test("Boilerplate.paragraphs: block segmentation + density features") {
    val html = "<html><head><title>skip me</title>" +
      "<script>var x = 'skip';</script></head><body>" +
      "<nav><a href='/'>home</a> <a href='/a'>about us</a></nav>" +
      "<p>the quick brown fox of it and the dog in the field</p>" +
      "<div>see <a href='/x'>this link</a> here</div>" +
      "<footer>tiny</footer></body></html>"
    val ps = graft.ops.Boilerplate.paragraphs(html)
    assert(ps.map(_.text) == Seq("home about us",
      "the quick brown fox of it and the dog in the field",
      "see this link here", "tiny"))
    val nav = ps(0)
    assert(nav.linkDensity == 1.0) // every non-ws char is inside <a>
    val prose = ps(1)
    assert(prose.linkDensity == 0.0 && prose.words == 12)
    assert(prose.stopWords == 7) // the×3, of, it, and, in
    val mixed = ps(2)
    // "thislink" linked (8 chars) of "seethislinkhere" (15)
    assert(math.abs(mixed.linkDensity - 8.0 / 15.0) < 1e-9)
  }

  test("Boilerplate.mainContent keeps prose, drops nav/footer/link farms") {
    val page = "<body><nav><a>home</a> <a>about</a> <a>contact</a></nav>" +
      "<p>the quick brown fox of document one jumps over the lazy dog in " +
      "section a and the words keep it prose</p>" +
      "<div>tiny</div>" +
      "<footer><a>terms</a> <a>privacy</a></footer></body>"
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val got = graft.ops.Boilerplate.mainContent(df)
      .as[(Long, String, Int, Int)].collect().head
    assert(got._2.startsWith("the quick brown fox") && !got._2.contains("home")
      && !got._2.contains("tiny") && !got._2.contains("terms"))
    assert(got._3 == 4 && got._4 == 1) // 4 paragraphs, 1 content
  }

  test("RepetitionStats kernel ≡ the sort+run-fold Column formulation") {
    // reference formulation: sort gram strings, fold run lengths
    val docs = (0L until 60L).map { i =>
      val words = (0 until 20).map(j => s"w${(i * 7 + j * j) % 9}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sorted = array_sort(TextOps.shingles(col("text"), 2))
    val folded = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("maxrun"), lit(0L).as("dup")),
      (a, g) => {
        val run = when(a.getField("prev") === g, a.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(a.getField("maxrun"), run).as("maxrun"),
          (a.getField("dup") +
            when(run === 2L, 2L).when(run > 2L, 1L).otherwise(0L)).as("dup"))
      })
    val ref = docs.select(col("doc_id"), size(sorted).cast("long"),
        folded.getField("maxrun"), folded.getField("dup"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val got = docs.select(col("doc_id"),
        graft.functions.texthash.repetition_stats(col("text"), 2).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.max_cnt"), col("st.dup"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got == ref)
  }

  test("repetitionStats is a shuffle-free per-row plan") {
    val df = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), col("id").cast("string"), lit("a b a b")).as("text"))
    val p = TextOps.repetitionStats(df).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }
}
