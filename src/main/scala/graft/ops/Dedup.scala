package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation at corpus scale.
  *
  * Scale shapes (the part that must survive 1000 executors / 100 TB):
  *   - exact dedup: one hash-shuffle on a 64-bit digest of the text —
  *     never shuffles the text itself.
  *   - MinHash signatures: per-row array algebra (no shuffle); the LSH
  *     band → bucket-join emits candidate pairs only, so the quadratic
  *     blowup is bounded per bucket (buckets over maxBucket lose their
  *     pairs — lshBucketStats quantifies the loss for a given cap).
  *   - SimHash: per-row fingerprint + band join on 16-bit chunks.
  */
object Dedup {

  /** Exact dedup groups: keyed by xxhash64(text) so the shuffle moves
    * 8-byte keys, not documents. Returns one row per distinct content
    * with the kept (minimum) doc_id and the duplicate count.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(xxhash64(col("text")).as("content_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the min-doc_id representative per content key. */
  def dropExactDups(docs: DataFrame): DataFrame = {
    val keep = exactGroups(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Streaming exact dedup: drop documents whose content digest was
    * already admitted within the watermark horizon — the
    * ingestion-time twin of [[dropExactDups]] for a live document
    * feed (readStream → this → writeStream), built on
    * `dropDuplicatesWithinWatermark` so the state store holds one
    * 8-byte xxhash64 digest per distinct content INSIDE the horizon
    * and evicts older keys: state tracks ingest rate × horizon, never
    * corpus size. Semantics differ from the batch op exactly where
    * streaming must: the FIRST arrival wins (not min doc_id), and a
    * duplicate whose twin aged past the watermark is re-admitted —
    * run the batch op over the accumulated corpus for the global
    * guarantee.
    */
  def dropExactDupsStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_key", xxhash64(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_key")
      .drop("content_key")

  /** normalization used before near-dup comparison */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** 64-bit hashes of a doc's word-n-gram shingles (per-row) — the
    * unit all near-dup ops work over, so the expensive string-level
    * shingle build happens exactly once per row and everything
    * downstream is long arithmetic. Backed by the single-pass
    * ShingleHash64 Catalyst expression — value-identical to
    * `transform(TextOps.shingles(text, n), s => xxhash64(s))`
    * (OpsSpec asserts the equivalence) at a fraction of the cost.
    */
  def shingleHashes(text: Column, shingleN: Int = 3): Column =
    graft.functions.texthash.shingle_hash64(text, shingleN)

  /** MinHash signature as k parallel min-hashes over the shingle
    * hashes: sig[j] = min over shingles of xxhash64(h, j) — hashing
    * the 64-bit shingle hash with per-row-independent seeds is a
    * standard hash family for min-wise sketching.
    *
    * Expressed as ONE fold over the shingle array (not k nested
    * transforms): `shingleHs` is usually an expensive expression
    * (tokenize→shingle→hash), and CollapseProject inlines it into
    * every lambda that references it — the nested form re-evaluated
    * the whole shingle build k times per row (measured 16× slowdown
    * at k=16). The fold produces signatures bit-identical to the
    * nested form for every NON-EMPTY shingle array; a doc with fewer
    * than n tokens (empty array) yields [Long.MaxValue × k] where the
    * nested array_min form yielded [null × k] — LSH band grouping is
    * unaffected (the sentinel is as constant as the null), and the
    * sentinel is the safer value to hash downstream. OpsSpec pins the
    * non-empty equivalence and this short-doc divergence.
    */
  def minhashSignature(shingleHs: Column, k: Int): Column =
    aggregate(shingleHs, array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (a, j) => least(a, xxhash64(h, j))))

  // ---- md5-arithmetic (foreign-verifiable) signature mode ----------
  // The xxhash64 family above is the production path (codegen'd, 64-bit
  // min-wise hashes) but no other engine reproduces Spark's xxhash64 —
  // so the LSH chain could only ever be rows-only at the driver's
  // DuckDB correctness gate. This mode is classic k-PERMUTATION
  // MinHash over a 20-bit md5-hashed shingle universe, built from the
  // repo's established md5-bucket arithmetic (Curation.md5Bucket /
  // q_ngram_ll / DSIR): x(gram) = first 5 md5 hex digits as an
  // integer, sig[j] = min over grams of the j-th affine permutation
  // (A_j·x + B_j) mod 2²⁰ — one md5 per gram, everything else integer
  // arithmetic below 2⁴⁰, all recomputable in ANSI SQL digit by digit.
  // The band bucket is the signature slice ITSELF (joined as a short
  // string) rather than a re-hash, so an oracle reproduces signatures,
  // bands, buckets, candidate pairs and verified pairs bit-
  // identically. The permuted-single-hash family is weaker than k
  // independent 64-bit hashes (two grams colliding in x collide for
  // every seed: per-doc collision mass ~|grams|/2²⁰), but collisions
  // are deterministic and identical on both sides, and recall-vs-
  // exact stays OpsSpec-pinned separately.

  /** empty-shingle sentinel: outside the 20-bit hash range, so a short
    * doc can never share a band bucket with a real signature
    */
  private[graft] val md5SigSentinel: Long = 1L << 20

  /** the j-th permutation's multiplier — odd, so x ↦ A_j·x + B_j is a
    * bijection on Z_2²⁰ (mirrored in SparkEntry's minhashBandCte SQL)
    */
  private[graft] def minhashPermA(j: Int): Long =
    ((2L * j + 1L) * 2654435761L) % 1048576L

  /** the j-th permutation's offset */
  private[graft] def minhashPermB(j: Int): Long =
    (40503L * j + 17L) % 1048576L

  /** MinHash signature in md5 mode — the single-pass
    * [[graft.functions.TextKernel.md5MinhashSig]] kernel (OpsSpec pins
    * it against the Column-algebra formulation over
    * [[TextOps.shingles]]).
    */
  def minhashSignatureMd5(text: Column, k: Int, shingleN: Int): Column =
    graft.functions.texthash.md5_minhash_sig(text, shingleN, k)

  /** [[lshBandKeys]] in md5 mode — bucket is the band's signature
    * slice joined as a comma string (no re-hash: what an ANSI oracle
    * can group on verbatim), so the column is STRING here vs LONG in
    * the production variant.
    */
  def lshBandKeysMd5(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    docs
      .select(col("doc_id"),
        minhashSignatureMd5(col("text"), k, shingleN).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => array_join(transform(slice(col("sig"), b * r + 1, lit(r)),
            _.cast("string")), ",")))
          .as(Seq("band", "bucket")))
  }

  /** LSH candidate pairs: signatures split into `bands` bands of
    * r = k/bands rows; docs sharing any band hash become a candidate
    * pair. Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    *
    * @param maxBucket ignore degenerate buckets larger than this (a
    *   bucket of B docs emits B²/2 pairs — a skew bomb at corpus
    *   scale). Capping SILENTLY loses the largest duplicate clusters'
    *   pairs — run [[lshBucketStats]] over the same corpus/params to
    *   see how many buckets (and docs) the cap dropped before trusting
    *   a capped run.
    */
  def lshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000): DataFrame =
    pairsFromBuckets(lshBuckets(docs, k, bands, shingleN), maxBucket)

  /** [[lshCandidates]] over md5-mode band keys (foreign-verifiable
    * candidate generation — see [[minhashSignatureMd5]]).
    */
  def lshCandidatesMd5(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000): DataFrame =
    pairsFromBuckets(
      bucketsOf(lshBandKeysMd5(docs, k, bands, shingleN)), maxBucket)

  /** bucket ids → all within-bucket pairs, capped (shared by both hash
    * modes)
    */
  private def pairsFromBuckets(buckets: DataFrame, maxBucket: Int): DataFrame =
    buckets
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), b ->
          |    struct(least(a, b) AS doc_a, greatest(a, b) AS doc_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()

  /** (doc_id, band, bucket) LSH band keys — the per-snapshot signature
    * state incremental dedup persists and joins against (8+4+8 bytes
    * per doc per band; a reusable artifact, recomputed never).
    */
  def lshBandKeys(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b)))
          .as(Seq("band", "bucket")))
  }

  /** (band, bucket, ids): the raw LSH buckets behind lshCandidates. */
  private def lshBuckets(docs: DataFrame, k: Int, bands: Int,
      shingleN: Int): DataFrame =
    bucketsOf(lshBandKeys(docs, k, bands, shingleN))

  private def bucketsOf(bandKeys: DataFrame): DataFrame =
    bandKeys
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))

  /** The cap's blast radius, surfaced: one row
    * (n_buckets, n_capped_buckets, n_docs_in_capped, max_bucket) for
    * the given params. The dedup pipeline's completeness check — a
    * capped run with n_capped_buckets > 0 is a *partial* near-dup
    * sweep over exactly the biggest duplicate clusters.
    */
  def lshBucketStats(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000): DataFrame =
    lshBuckets(docs, k, bands, shingleN)
      .select(size(col("ids")).as("b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("b") > maxBucket, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(when(col("b") > maxBucket, col("b").cast("long")).otherwise(0L))
          .as("n_docs_in_capped"),
        max(col("b")).as("max_bucket"))

  /** Per-doc distinct shingle-hash postings (doc_id, gram) with grams
    * above the document-frequency cap removed. The df cap is the exact
    * path's analogue of lshCandidates' maxBucket: one boilerplate
    * shingle shared by 10⁵ docs emits 10¹⁰ join pairs, so grams hotter
    * than `maxDf` are excluded from the similarity universe (both the
    * intersection AND the set sizes, keeping the ratio consistent).
    * [[gramDfStats]] surfaces what a given cap drops.
    */
  /** Eagerly materialize a pipeline result (localCheckpoint) and drop
    * its internal caches: the multi-use subplans inside the near-dup
    * ops need persisting, but a lazily returned DataFrame would pin
    * those caches forever. The checkpointed result is small (pairs),
    * self-contained, and replay-safe.
    */
  private def finalized(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    val out = result.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  /** (postings, cachesToRelease): postings persisted because they feed
    * the df-cap AND three downstream subplans (sizes + both join
    * sides) — recomputing the shingle explode per use is the dominant
    * cost otherwise.
    */
  private def cappedGrams(docs: DataFrame, shingleN: Int,
      maxDf: Long): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.storage.StorageLevel
    val grams = docs.select(
      col("doc_id"),
      explode(array_distinct(shingleHashes(col("text"), shingleN)))
        .as("gram"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (maxDf == Long.MaxValue) (grams, Seq(grams))
    else {
      // hot grams are by definition few (≤ totalGrams/maxDf distinct
      // values) — AQE broadcasts this anti-join side at scale
      val hot = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select(col("gram"))
      (grams.join(hot, Seq("gram"), "left_anti"), Seq(grams))
    }
  }

  /** The df cap's blast radius, surfaced: one row
    * (n_grams, n_hot_grams, n_postings_dropped, max_df). A run with
    * n_hot_grams > 0 measured similarity over the boilerplate-free
    * shingle universe — report it next to the pair output.
    */
  def gramDfStats(docs: DataFrame, shingleN: Int = 3,
      maxDf: Long = defaultMaxDf): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(shingleHashes(col("text"), shingleN))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_hot_grams"),
        sum(when(col("df") > maxDf, col("df")).otherwise(0L))
          .as("n_postings_dropped"),
        max(col("df")).as("max_df"))

  /** default df cap: far above any test corpus (so oracles see the
    * uncapped exact result) yet a real bound at web-corpus scale —
    * a gram in >100k docs is boilerplate, not content.
    */
  val defaultMaxDf: Long = 100000L

  /** Exact word-n-gram Jaccard similarity for all pairs above a
    * threshold — the verification stage behind LSH candidates (and the
    * small-scale oracle for them). Inverted-index join: explode
    * distinct shingles, self-join on shingle, count intersections,
    * then |A∪B| = |A|+|B|−|A∩B|. Grams with document frequency above
    * `maxDf` are dropped from the universe first (see cappedGrams) —
    * without that cap the self-join is quadratic in per-gram df and
    * detonates on corpus boilerplate.
    */
  def jaccardPairs(docs: DataFrame, shingleN: Int = 3,
      threshold: Double = 0.9, maxDf: Long = defaultMaxDf): DataFrame = {
    // hashed grams: the inverted-index join shuffles 8-byte keys, not
    // shingle strings (64-bit collisions are negligible for set sizes)
    val (grams, caches) = cappedGrams(docs, shingleN, maxDf)
    val sizes = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    val pairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    finalized(pairs, caches)
  }

  /** LSH candidates verified with exact Jaccard — the full near-dup
    * pipeline: candidates bound the joins, exact check kills LSH false
    * positives (two-phase, same contract as the Bloom URL-seen set).
    *
    * Verify stage is an inverted-index intersection count restricted
    * to the candidate doc set: grams of candidate docs explode to
    * (doc, gram) postings ONCE (persisted — signatures already cost
    * one shingle pass over the full corpus; the verify pass re-hashes
    * only candidates), pairs join their a-side postings to the b-side
    * by (doc_b, gram), and the match count per pair is the exact
    * intersection. Every shuffle moves 8-byte keys — no shingle
    * arrays ship with candidate pairs, which at corpus scale is the
    * difference between moving |pairs|·8B and |pairs|·|doc| bytes.
    */
  def minhashNearDups(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucket: Int = 1000): DataFrame =
    verifiedPairs(docs, lshCandidates(docs, k, bands, shingleN, maxBucket),
      shingleN, threshold)

  /** [[minhashNearDups]] with md5-mode candidate generation — the
    * variant the driver's DuckDB gate hash-verifies end-to-end
    * (signatures → bands → buckets → capped pairs → exact-Jaccard
    * verify). The verify stage is shared with the production path and
    * still counts intersections over 64-bit shingle hashes; an ANSI
    * oracle counts distinct shingle STRINGS instead, the same
    * negligible-collision equivalence q_jaccard_pairs already pins.
    */
  def minhashNearDupsMd5(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucket: Int = 1000): DataFrame =
    verifiedPairs(docs, lshCandidatesMd5(docs, k, bands, shingleN, maxBucket),
      shingleN, threshold)

  /** exact-Jaccard verification of candidate (doc_a, doc_b) pairs —
    * the second phase of both minhashNearDups modes
    */
  private def verifiedPairs(docs: DataFrame, cands0: DataFrame,
      shingleN: Int, threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cands = cands0.persist(StorageLevel.MEMORY_AND_DISK)
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    val grams = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(array_distinct(shingleHashes(col("text"), shingleN))).as("gram"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairGrams = cands
      .join(grams.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("gram"))
    val inter = pairGrams
      .join(grams.select(col("doc_id").as("doc_b"), col("gram")),
        Seq("doc_b", "gram"), "left_semi")
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    val pairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    finalized(pairs, Seq(cands, grams))
  }

  /** Near-duplicate CLUSTERS — the shape curation pipelines actually
    * consume: [[minhashNearDups]] pairs closed under TRANSITIVITY by
    * star-contraction connected components
    * ([[GraphOps.connectedComponents]]). A≈B and B≈C must collapse to
    * one cluster even when A and C share no LSH bucket and sit below
    * the pairwise threshold — pairs alone can't say which doc to keep.
    * Returns (doc_id, cluster_id, is_canonical) for EVERY doc:
    * cluster_id = min doc_id of the component, singletons are their
    * own cluster, and the canonical row is the one a dedup keep-pass
    * retains. Scale shape: the pair list is 8-byte-key rows and the
    * component step is logarithmic-round star contraction — no
    * per-cluster driver state, no union-find on one machine.
    */
  def nearDupClusters(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucket: Int = 1000): DataFrame =
    clustersFromPairs(docs,
      minhashNearDups(docs, k, bands, shingleN, threshold, maxBucket))

  /** [[nearDupClusters]] over md5-mode pairs (foreign-verifiable:
    * DuckDB recomputes the pair list and closes it with a recursive
    * CTE)
    */
  def nearDupClustersMd5(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucket: Int = 1000): DataFrame =
    clustersFromPairs(docs,
      minhashNearDupsMd5(docs, k, bands, shingleN, threshold, maxBucket))

  /** transitive closure of a (doc_a, doc_b) pair list into keep/drop
    * clusters over the full doc set — shared by both hash modes
    */
  def clustersFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame =
    GraphOps.connectedComponents(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")),
        docs.select(col("doc_id").as("node")))
      .select(col("node").as("doc_id"), col("component").as("cluster_id"),
        (col("node") === col("component")).as("is_canonical"))

  /** Keep one representative per near-dup cluster (the min-doc_id
    * canonical row) — the actual corpus-reduction pass.
    */
  def dropNearDups(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucket: Int = 1000): DataFrame =
    docs.join(
      nearDupClusters(docs, k, bands, shingleN, threshold, maxBucket)
        .filter(col("is_canonical")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  // ---- incremental (cross-snapshot) dedup -------------------------
  // A rolling crawl never re-dedups the accumulated corpus: each new
  // dump is checked AGAINST it. These variants compare new × corpus
  // only — never corpus × corpus — so a dump's dedup cost tracks the
  // dump, and the corpus side is a reusable 8-byte-key artifact
  // (content digests / lshBandKeys) that a deployment persists once
  // per snapshot.

  /** Exact incremental dedup: new docs whose content digest already
    * exists in the corpus are dropped. One anti-join on 8-byte
    * digests; document text never shuffles.
    */
  def dropExactDupsAgainst(newDocs: DataFrame, corpus: DataFrame): DataFrame =
    newDocs.join(
      corpus.select(xxhash64(col("text")).as("__k")).distinct(),
      xxhash64(newDocs("text")) === col("__k"), "left_anti")

  /** Near-dup pairs BETWEEN a new snapshot and the existing corpus:
    * (new_id, corpus_id, jaccard ≥ threshold). Candidates come from
    * joining the two sides' LSH band keys on (band, bucket) — the
    * corpus side pre-grouped per bucket and capped at `maxBucket`
    * (the cross twin of lshCandidates' cap; [[lshBucketStats]] over
    * the corpus surfaces what a cap drops) — then verified with the
    * same inverted-index exact-Jaccard restricted to candidate docs.
    * Shuffles move 8-byte keys throughout.
    */
  def minhashNearDupsAgainst(newDocs: DataFrame, corpus: DataFrame,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000): DataFrame =
    minhashNearDupsAgainstBands(newDocs,
      lshBandKeys(corpus, k, bands, shingleN), corpus,
      k, bands, shingleN, threshold, maxBucket)

  /** [[minhashNearDupsAgainst]] in md5 mode — both sides' band keys
    * come from [[lshBandKeysMd5]], so the driver's DuckDB gate
    * recomputes the cross-snapshot candidate generation too.
    */
  def minhashNearDupsAgainstMd5(newDocs: DataFrame, corpus: DataFrame,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000): DataFrame =
    nearDupsAgainstCore(newDocs,
      lshBandKeysMd5(newDocs, k, bands, shingleN),
      lshBandKeysMd5(corpus, k, bands, shingleN), corpus,
      shingleN, threshold, maxBucket)

  /** [[minhashNearDupsAgainst]] with the corpus side's band keys
    * supplied as a PRECOMPUTED artifact (the persisted output of
    * [[lshBandKeys]], ~20 B/row) instead of recomputed from corpus
    * text: candidate generation reads only the artifact, and corpus
    * TEXT is touched solely for docs that share a bucket with the
    * batch (the verify term). This is the call an incremental/
    * streaming deployment makes per dump or micro-batch — without it
    * every increment re-shingles the whole accumulated corpus.
    * `corpusDocs` must cover (at least) every doc_id in the artifact.
    */
  def minhashNearDupsAgainstBands(newDocs: DataFrame,
      corpusBands: DataFrame, corpusDocs: DataFrame,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000): DataFrame =
    nearDupsAgainstCore(newDocs, lshBandKeys(newDocs, k, bands, shingleN),
      corpusBands, corpusDocs, shingleN, threshold, maxBucket)

  /** cross-snapshot candidate join + exact-Jaccard verify over
    * precomputed band keys for BOTH sides — shared by the production
    * and md5 hash modes
    */
  private def nearDupsAgainstCore(newDocs: DataFrame, newBands: DataFrame,
      corpusBands: DataFrame, corpusDocs: DataFrame, shingleN: Int,
      threshold: Double, maxBucket: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val corpus = corpusDocs
    val corpusBuckets = corpusBands
      .groupBy(col("band"), col("bucket"))
      // collect_SET: a crashed state compaction can leave duplicate
      // band-key rows (rename-before-delete window, DedupStream);
      // duplicated ids must not inflate bucket sizes past maxBucket
      // and silently drop real near-dup candidates
      .agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= maxBucket)
    val cands = newBands
      .join(corpusBuckets, Seq("band", "bucket"))
      .select(col("doc_id").as("new_id"), explode(col("ids")).as("corpus_id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def gramsOf(docs: DataFrame, idName: String, side: DataFrame) =
      docs.join(side.select(col(idName).as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          explode(array_distinct(shingleHashes(col("text"), shingleN)))
            .as("gram"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    val gramsNew = gramsOf(newDocs, "new_id", cands)
    val gramsCorp = gramsOf(corpus, "corpus_id", cands)
    val sizesNew = gramsNew.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
    val sizesCorp = gramsCorp.groupBy(col("doc_id")).agg(count(lit(1)).as("nb"))
    val inter = cands
      .join(gramsNew.withColumnRenamed("doc_id", "new_id"), Seq("new_id"))
      .join(gramsCorp.select(col("doc_id").as("corpus_id"), col("gram")),
        Seq("corpus_id", "gram"), "left_semi")
      .groupBy(col("new_id"), col("corpus_id")).agg(count(lit(1)).as("c"))
    val pairs = inter
      .join(sizesNew.select(col("doc_id").as("new_id"), col("na")), "new_id")
      .join(sizesCorp.select(col("doc_id").as("corpus_id"), col("nb")), "corpus_id")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
    finalized(pairs, Seq(cands, gramsNew, gramsCorp))
  }

  /** The incremental keep-pass: the new snapshot minus exact corpus
    * dups minus near-dups of corpus docs. Within-snapshot duplicates
    * are NOT touched — run [[dropNearDups]] on the (much smaller) new
    * snapshot for that, or fold the survivors into the corpus and let
    * the next dump see them.
    */
  def dropDupsAgainst(newDocs: DataFrame, corpus: DataFrame,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.9, maxBucket: Int = 1000): DataFrame = {
    val nearIds = minhashNearDupsAgainst(newDocs, corpus, k, bands,
        shingleN, threshold, maxBucket)
      .select(col("new_id").as("doc_id")).distinct()
    dropExactDupsAgainst(newDocs, corpus)
      .join(nearIds, Seq("doc_id"), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints joined on 16-bit
    * chunks (any doc pair within Hamming distance 3 shares at least
    * one of 4 chunks — pigeonhole), verified by exact Hamming ≤ maxDist.
    *
    * Scale shape (same two guards as lshCandidates — without them the
    * chunk self-join is the one near-dup op that detonates at corpus
    * scale, ~n²/2¹⁶ candidate pairs):
    *
    *   1. identical fingerprints are PRE-COLLAPSED: each fp group
    *      contributes one representative (min doc_id) to the chunk
    *      join, and its members surface as (rep, member, dist 0) STAR
    *      pairs — O(group) rows whose connected components equal the
    *      old clique's (an exact-dup-heavy corpus concentrates into
    *      single fps; the clique was B² rows for zero extra
    *      information).
    *   2. a (chunk_pos, chunk) bucket larger than `maxBucket` DISTINCT
    *      fingerprints is dropped from the candidate join; run
    *      [[simhashBucketStats]] to see what a cap dropped before
    *      trusting a capped sweep.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    simhashNearDupsFromFps(
      docs.select(col("doc_id"), TextOps.simhash(col("text")).as("fp")),
      maxDist, maxBucket)

  /** [[simhashNearDups]] over precomputed (doc_id, fp) rows. */
  def simhashNearDupsFromFps(fps0: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(maxDist <= 3, "4-chunk split guarantees recall only to distance 3")
    val fps = fps0.persist(StorageLevel.MEMORY_AND_DISK)
    val groups = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // star pairs inside an identical-fp group (dist 0 by definition)
    val withinPairs = fps.join(groups, Seq("fp"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0).as("dist"))
    // cross-fp candidates: distinct fingerprints only, capped buckets
    val crossPairs = simhashBuckets(groups)
      .filter(size(col("items")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(items, (a, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1), b ->
          |    struct(least(a.rep, b.rep) AS doc_a,
          |           greatest(a.rep, b.rep) AS doc_b,
          |           bit_count(a.fp ^ b.fp) AS dist))))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
    finalized(withinPairs.unionByName(crossPairs), Seq(fps, groups))
  }

  /** (chunk_pos, chunk, items): distinct fingerprints bucketed by each
    * of their 4 16-bit chunks — the candidate structure behind
    * simhashNearDups.
    */
  private def simhashBuckets(groups: DataFrame): DataFrame =
    groups
      .select(col("rep"), col("fp"),
        posexplode(array((0 to 3).map(i =>
          shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("chunk_pos", "chunk")))
      .groupBy(col("chunk_pos"), col("chunk"))
      .agg(collect_list(struct(col("rep"), col("fp"))).as("items"))

  /** The simhash cap's blast radius, surfaced: one row (n_buckets,
    * n_capped_buckets, n_fps_in_capped, max_bucket). A capped run with
    * n_capped_buckets > 0 skipped the candidate pairs of exactly the
    * hottest chunk values — report it next to the pair output.
    */
  def simhashBucketStats(docs: DataFrame, maxBucket: Int = 1000): DataFrame =
    simhashBucketStatsFromFps(
      docs.select(col("doc_id"), TextOps.simhash(col("text")).as("fp")),
      maxBucket)

  /** [[simhashBucketStats]] over precomputed (doc_id, fp) rows. */
  def simhashBucketStatsFromFps(fps: DataFrame,
      maxBucket: Int = 1000): DataFrame =
    simhashBuckets(fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep")))
      .select(size(col("items")).as("b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("b") > maxBucket, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(when(col("b") > maxBucket, col("b").cast("long")).otherwise(0L))
          .as("n_fps_in_capped"),
        max(col("b")).as("max_bucket"))

  /** Per-document duplicated-window statistics — the measurement side
    * of exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — public): for each
    * document, how many of its n-token windows occur at least twice
    * anywhere in the corpus (including within the same document).
    * Returns (doc_id, n_windows, dup_windows, dup_frac) for every
    * document with at least one window; docs shorter than n tokens
    * have no windows and are absent.
    *
    * Scale shape: windows are reduced per-row to 64-bit ShingleHash64
    * values (single codegen pass, text never leaves the row), so the
    * corpus-wide multiplicity count shuffles (doc_id, hash) pairs —
    * 16 bytes per window instance — with map-side partial combine on
    * the 8-byte hash; the count joins back on the same 8-byte key and
    * folds into a per-doc agg. Unlike the full suffix-array dedup
    * this never compares strings: two different windows colliding in
    * 64 bits (~n²/2⁶⁵) is the accepted error.
    */
  def duplicatedWindowStats(docs: DataFrame, n: Int = 8): DataFrame = {
    val inst = docs.select(col("doc_id"),
      explode(shingleHashes(col("text"), n)).as("h"))
    val counts = inst.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    inst.join(counts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("dup_windows"),
        round(col("dup_windows").cast("double") / col("n_windows"), 4)
          .as("dup_frac"))
  }

  /** The REMOVAL side of exact-substring dedup (Lee et al. 2021's
    * dedup step, token-window approximation): every n-token window
    * that occurs at least twice anywhere in the corpus keeps exactly
    * its FIRST occurrence (minimal (doc_id, pos)); the tokens covered
    * by every other occurrence are cut from their documents.
    * Overlapping duplicated windows merge into one removed span, so a
    * long repeated passage disappears as a block rather than
    * window-by-window. Returns every input document as
    * (doc_id, text, n_removed) with the kept tokens re-joined by a
    * single space (whitespace is normalized as a consequence of
    * tokenization — same contract as [[Curation.dropDupParagraphs]]'s
    * delimiter rebuild).
    *
    * Scale shape (mirrors [[duplicatedWindowStats]]): windows reduce
    * per-row to 64-bit ShingleHash64 values, so the corpus-wide pass
    * shuffles (hash → packed(doc,pos)) pairs with map-side combine on
    * the 8-byte hash; the keeper decision is one min() per hash; only
    * the REMOVABLE instances (output ∝ duplication, not corpus size)
    * flow back, collapse to per-doc sorted span lists, and meet the
    * text in a single doc_id join — document text moves exactly once,
    * and not at all under a doc_id-bucketed layout. The per-row
    * rebuild merges spans with one fold and filters tokens against
    * the merged (disjoint, ≤ dup-windows-per-doc) span list. Like the
    * stats op this trusts 64-bit hashes in place of string compares;
    * a cross-window collision (~n²/2⁶⁵) is the accepted error.
    *
    * The packed (doc_id, pos) key reuses dropDupParagraphs' 43+20-bit
    * domain and raises in-plan on overflow rather than corrupting the
    * keep-first decision.
    */
  def dropDuplicatedSpans(docs: DataFrame, n: Int = 8,
      text: Column = col("text")): DataFrame = {
    val posLimit = 1L << 20
    val inst = docs.select(col("doc_id"),
      posexplode(shingleHashes(text, n)).as(Seq("pos", "h")))
    val enc = when(col("pos") >= posLimit || col("doc_id") >= (1L << 43),
        raise_error(lit("dropDuplicatedSpans: doc_id/pos outside the " +
          "43+20-bit packed-key domain")))
      .otherwise(col("doc_id") * posLimit + col("pos"))
    val keyed = inst.select(col("h"), enc.as("enc"))
    val perHash = keyed.groupBy(col("h"))
      .agg(min(col("enc")).as("keeper"), count(lit(1)).as("cnt"))
    // removable instances only — everything past this line is ∝ the
    // corpus's duplication, not its size
    val removable = keyed.join(perHash, "h")
      .filter(col("cnt") >= 2 && col("enc") =!= col("keeper"))
      .select(shiftright(col("enc"), 20).as("doc_id"),
        col("enc").bitwiseAND(lit(posLimit - 1)).cast("int").as("pos"))
    val spansOf = removable.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      // merge sorted window starts into disjoint [start, end) spans
      .select(col("doc_id"),
        aggregate(col("ps"),
          array().cast("array<struct<s:int,e:int>>"),
          (acc, p) => when(size(acc) > 0 &&
              element_at(acc, -1).getField("e") >= p,
              concat(slice(acc, lit(1), size(acc) - 1),
                array(struct(element_at(acc, -1).getField("s").as("s"),
                  (p + n).as("e")))))
            .otherwise(concat(acc,
              array(struct(p.as("s"), (p + n).as("e"))))))
          .as("spans"))
    val toks = TextOps.wsTokens(text)
    docs.join(spansOf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, array_join(toks, " "))
          .otherwise(array_join(
            filter(toks, (_, i) =>
              !exists(col("spans"),
                s => s.getField("s") <= i && i < s.getField("e"))),
            " ")).as("text"),
        when(col("spans").isNull, lit(0L))
          .otherwise(aggregate(col("spans"), lit(0L),
            (acc, s) => acc + (s.getField("e") - s.getField("s"))
              .cast("long"))).as("n_removed"))
  }
}
