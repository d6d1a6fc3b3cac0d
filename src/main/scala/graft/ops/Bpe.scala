package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et
  * al. 2016, public) — the step that turns a curated corpus into the
  * merge table every LLM tokenizer ships with.
  *
  * Scale shape: training never iterates over the corpus. One corpus
  * pass folds documents into the distinct WORD-TYPE table (Heap's law
  * puts that at ~10^7-10^8 rows for a 100 TB corpus — executor-sized,
  * not corpus-sized), and every merge iteration is one map-side-
  * combinable pair count over word types + a TakeOrdered(1) argmax.
  * The driver holds exactly one row per iteration (the chosen pair —
  * which IS a driver decision in BPE, the algorithm is sequential in
  * the merge rank), and the evolving symbol table is localCheckpointed
  * every few rounds so the plan doesn't deepen with the merge count.
  * The per-row merge application is a single Column fold (codegen'd,
  * no UDF in the distributed hot path).
  */
object Bpe {

  /** end-of-word marker (Sennrich's `</w>`) — makes merges word-
    * boundary-aware so "est" inside and at the end of words stay
    * distinct tokens
    */
  val Eow = "</w>"

  /** distinct word types with multiplicities — the unit all training
    * passes work over
    */
  def wordCounts(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(explode(TextOps.wsTokens(text)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** chars + end-of-word marker */
  private def initSyms(word: Column): Column =
    concat(split(word, ""), array(lit(Eow)))

  /** per-row adjacent symbol pairs as structs; fully-merged words
    * (one symbol) yield an empty array — the guard is explicit
    * because sequence(1, 0) is a DESCENDING sequence in Spark, not
    * empty (same gotcha as TextOps.shingles)
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b"))))

  /** left-to-right non-overlapping replacement of (a,b) with a+b —
    * the textbook merge step, as one codegen'd array fold
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** one learned merge */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pairCount: Long)

  /** Train `nMerges` BPE merges over the corpus. Stops early when no
    * pair occurs at least `minCount` times. Ties break
    * deterministically by (count desc, left asc, right asc) in UTF-8
    * byte order (= the engine's string ordering, so the ranks are
    * bit-identical to [[trainMergesDistributed]]).
    *
    * Scale shape: Spark does the ONE pass that is corpus-sized (fold
    * 100 TB of documents into the distinct word-TYPE table — Heap's
    * law bounds that at ~10^7-10^8 rows), the types collect ONCE to
    * the driver, and the sequential merge loop — BPE is inherently
    * serial in the merge rank — runs as Sennrich's incremental
    * pair-count algorithm in driver memory: each merge touches only
    * the words containing the chosen pair. The earlier shape ran a
    * full explode+groupBy+TakeOrdered Spark job PER MERGE plus a
    * localCheckpoint of the type table: correct, but a real 32-50k-
    * merge vocab meant ~50k sequential jobs of pure scheduler
    * overhead (~0.1 s each — days), for work a single core finishes
    * in seconds. Encoding (the corpus-sized direction) stays
    * distributed in [[encode]].
    */
  def trainMerges(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
      text: Column = col("text"),
      maxDriverTypes: Long = 20000000L): Seq[Merge] = {
    import org.apache.spark.storage.StorageLevel
    // guard the collect: a corpus whose distinct word-TYPE table
    // exceeds driver memory must fall back to the distributed loop
    // instead of OOMing where the pre-r4 default worked. The count
    // reuses the persisted groupBy, so the common (small) case pays
    // one cached read, not a recompute.
    val wc = wordCounts(docs, text).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (wc.count() > maxDriverTypes)
        trainMergesDistributed(wc, nMerges, minCount)
      else {
        val types = wc.select(col("word"), col("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        trainMergesLocal(types, nMerges, minCount)
      }
    } finally wc.unpersist()
  }

  /** unsigned lexicographic UTF-8 byte comparison — matches Spark's
    * UTF8String binary ordering, which the distributed loop's
    * `orderBy(left asc, right asc)` tie-break uses
    */
  private def utf8Cmp(x: String, y: String): Int = {
    val bx = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val by = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(bx.length, by.length)
    var i = 0
    while (i < n) {
      val c = (bx(i) & 0xFF) - (by(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    bx.length - by.length
  }

  /** left-to-right non-overlapping merge — the exact local twin of
    * the codegen'd [[applyMerge]] fold
    */
  private def applyMergeLocal(w: IndexedSeq[String], a: String,
      b: String): Vector[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val s = w(i)
      if (acc.nonEmpty && acc(acc.length - 1) == a && s == b)
        acc(acc.length - 1) = a + b
      else acc += s
      i += 1
    }
    acc.toVector
  }

  /** Sennrich's incremental merge loop over collected word types:
    * pair counts and a pair→words index are maintained incrementally,
    * so each merge costs O(words containing the pair), and the argmax
    * is a scan of the live pair table. 2,000 merges over a
    * 100k-type vocabulary run in seconds on one core.
    */
  private[graft] def trainMergesLocal(types: Array[(String, Long)],
      nMerges: Int, minCount: Long): Seq[Merge] = {
    import scala.collection.mutable
    // split by code point + end-of-word marker (initSyms's local twin)
    val syms: Array[Vector[String]] = types.map { case (w, _) =>
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      cps :+ Eow
    }
    val cnts: Array[Long] = types.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def foldPairs(i: Int, sign: Long, index: Boolean): Unit = {
      val w = syms(i)
      val c = cnts(i) * sign
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val nv = pairCount.getOrElse(p, 0L) + c
        if (nv == 0L) pairCount.remove(p) else pairCount(p) = nv
        if (index) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(foldPairs(_, 1L, index = true))
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      var bestP: (String, String) = null
      var bestN = 0L
      pairCount.foreach { case (p, n) =>
        if (bestP == null || n > bestN || (n == bestN && {
          val ca = utf8Cmp(p._1, bestP._1)
          ca < 0 || (ca == 0 && utf8Cmp(p._2, bestP._2) < 0)
        })) { bestP = p; bestN = n }
      }
      if (bestP == null || bestN < minCount) exhausted = true
      else {
        val (a, b) = bestP
        out += Merge(rank, a, b, a + b, bestN)
        // the index may hold stale entries (a word rewritten since it
        // was indexed) — cheap to skip via the live count fold
        val affected = pairWords.remove(bestP).map(_.toArray)
          .getOrElse(Array.empty[Int])
        java.util.Arrays.sort(affected)
        affected.foreach { i =>
          foldPairs(i, -1L, index = false)
          syms(i) = applyMergeLocal(syms(i), a, b)
          foldPairs(i, 1L, index = true)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** The original one-Spark-job-per-merge training loop, kept as the
    * distributed reference twin (BpeSpec pins trainMerges ≡ this ≡
    * serial Sennrich) — and as the PUBLIC path a deployment takes
    * when the word-TYPE table outgrows driver memory ([[trainMerges]]
    * auto-falls-back here past `maxDriverTypes`).
    */
  def trainMergesDistributedDocs(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L, text: Column = col("text")): Seq[Merge] =
    trainMergesDistributed(wordCounts(docs, text), nMerges, minCount)

  /** [[trainMergesDistributedDocs]] over a precomputed (word, cnt)
    * type table
    */
  def trainMergesDistributed(typeCounts: DataFrame, nMerges: Int,
      minCount: Long): Seq[Merge] = {
    var words = typeCounts
      .select(initSyms(col("word")).as("syms"), col("cnt"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val best = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("a").asc, col("b").asc)
        .limit(1) // TakeOrderedAndProject — no global sort
        .collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) exhausted = true
      else {
        val (a, b, n) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        out += Merge(rank, a, b, a + b, n)
        words = words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint()
        rank += 1
      }
    }
    out.result()
  }

  /** the merge table as a DataFrame (rank, left, right, merged, pair_count) */
  def trainMergesDF(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
      text: Column = col("text")): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, nMerges, minCount, text)
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Greedy BPE encode of one word given merge ranks — always merges
    * the LOWEST-rank adjacent pair first (the GPT-2 encoder loop).
    * Genuinely imperative per-word work, so this is the one place the
    * op family uses a Scala UDF; the ranks ride a broadcast.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var done = false
    while (syms.length > 1 && !done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Tokenize the corpus with a learned merge list:
    * (doc_id, tokens ARRAY<STRING>, n_tokens). Per-row, shuffle-free —
    * the merge table broadcasts as a plain Scala map inside the UDF
    * closure (it is tokenizer-sized: 10⁴-10⁵ rows, never data-sized).
    */
  def encode(docs: DataFrame, merges: Seq[Merge],
      text: Column = col("text")): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf((t: String) =>
      if (t == null) Seq.empty[String]
      else t.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, ranks)))
    docs.select(col("doc_id"), enc(text).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
