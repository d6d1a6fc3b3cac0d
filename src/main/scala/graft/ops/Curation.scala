package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.texthash

/** Dataset-curation operators for a training-data pipeline: the steps
  * between "deduped corpus" and "training shards" — deterministic
  * splits, stratified sampling, text normalization, PII redaction,
  * per-source rollups.
  *
  * Everything here is either per-row Column algebra (codegen, zero
  * shuffle) or a bounded two-phase plan, and every hash is plain
  * 64-bit arithmetic an ANSI-SQL oracle can recompute — no
  * Spark-private hash functions in anything the driver gate compares.
  */
object Curation {

  /** Deterministic mixing hash in [0, 2^31): one LCG step (Knuth/
    * glibc constants — public) on the key, high bits taken by the
    * consumers. Pure BIGINT arithmetic (the key is pre-reduced
    * mod 2^31 so the multiply cannot overflow at ANY key — ANSI mode
    * throws on silent wrap)
    * so DuckDB evaluates it bit-identically — that property, not hash
    * quality, is why this is not xxhash64: split/sample assignments
    * must be auditable by a foreign engine.
    */
  def lcgHash(key: Column): Column =
    ((key % lit(2147483648L)) * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  /** Deterministic train/val/test assignment: bucket = high bits of
    * lcgHash(key) mod 100, split by cumulative weights. Hash-based
    * (not random, not row_number) so the assignment is stable under
    * repartitioning, appends, and reruns — the property that matters
    * when the corpus is rewritten incrementally at 100 TB. Per-row,
    * no shuffle.
    */
  def assignSplits(df: DataFrame, key: Column = col("doc_id"),
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = (shiftright(lcgHash(key), 16) % 100).as("bucket")
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Exact deterministic k-per-stratum sample: the k rows with the
    * smallest (lcgHash(key), key) per stratum.
    *
    * Scale shape: the naive form is one window over the WHOLE corpus
    * partitioned by stratum — a full shuffle of 100 TB to keep k rows
    * per language. Instead: (1) per-stratum counts (tiny agg — one
    * row per stratum); (2) a hash threshold per stratum sized to pass
    * ~margin×k rows (uniform hash ⇒ the k-th smallest hash
    * concentrates at k/n·2^31), applied as a per-row filter at scan
    * time; (3) the exact window runs over only the ~margin×k
    * survivors per stratum. Strata where the prefilter could
    * under-select (count says so, deterministically — no probabilistic
    * failure path survives to the result) widen to the full stratum,
    * same widen-and-retry contract as the engine's tier scheduler.
    */
  def stratifiedSample(df: DataFrame, strata: String, k: Int,
      key: Column = col("doc_id"), margin: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val max31 = 2147483648L
    val hashed = df.withColumn("h", lcgHash(key)).withColumn("k", key)
    val counts = hashed.groupBy(col(strata)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    def thresholdOf(n: Long): Long =
      if (n <= margin.toLong * k) max31
      else math.min(max31, (max31 * margin.toLong * k) / n + 1)
    val thrExpr = counts.foldLeft(lit(max31): Column) { case (e, (s, n)) =>
      when(col(strata) === lit(s), lit(thresholdOf(n))).otherwise(e)
    }
    val pre = hashed.filter(col("h") < thrExpr)
    // deterministic safety: a stratum whose survivor count fell under
    // min(k, n) widens to the full stratum (prob ~e^-k, but the gate
    // compares hashes, so "almost never" must become "never")
    val survivors = pre.groupBy(col(strata)).agg(count(lit(1)).as("m"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val short = counts.collect {
      case (s, n) if survivors.getOrElse(s, 0L) < math.min(k.toLong, n) => s
    }.toSet
    val bounded =
      if (short.isEmpty) pre
      else hashed.filter(col("h") < thrExpr ||
        col(strata).isInCollection(short.toSeq))
    val w = Window.partitionBy(col(strata)).orderBy(col("h"), col("k"))
    bounded.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("h", "k")
  }

  /** Text normalization: Unicode NFC (custom codegen'd expression —
    * Spark has no built-in), control chars → space, whitespace runs
    * collapsed, trimmed. Per-row, no shuffle, ASCII rows never leave
    * the fast path inside [[graft.functions.TextKernel.nfcNormalize]].
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(texthash.nfc_normalize(text), "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))

  /** PII redaction: emails, IPv4 addresses, then long (9+) digit runs
    * (account/card-shaped), replaced in that order so an address
    * inside an email is already gone when the IP pass runs. Patterns
    * stay in the Java∩RE2 regex subset so the redaction is
    * oracle-checkable in DuckDB.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{9,}\\b", "<ID>")
  }

  /** Per-(source, language) corpus rollup — the curation dashboard
    * query (doc counts, byte volume, mean token length). One hash
    * aggregation on a tiny composite key; partial aggregation does the
    * heavy lifting map-side.
    */
  def corpusStats(df: DataFrame): DataFrame =
    df.groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(size(TextOps.wsTokens(col("text")))), 4).as("avg_tokens"))

  /** Benchmark decontamination: which corpus documents share at least
    * one word n-gram with an evaluation set — the standard pre-training
    * hygiene pass (the public WebText/GPT-2 and Llama recipes drop
    * train docs overlapping eval n-grams).
    *
    * Scale shape: per-document DISTINCT grams are computed per-row
    * (`array_distinct` before `explode` — no dedup shuffle over the
    * corpus); the benchmark gram set is tiny relative to the corpus
    * (eval suites, not web dumps), so the membership probe is a
    * broadcast inner join, and the only corpus-wide shuffle is the
    * final 8-byte-key count per doc_id with map-side partial
    * aggregation. With `broadcastBench = false` (a benchmark too big
    * for executor memory) the probe becomes an ordinary shuffled equi
    * join on the gram key — same result, one extra exchange of the
    * gram column only.
    *
    * By default the gram key is the codegen'd 64-bit shingle hash
    * (`ShingleHash64`), not the gram string: the corpus-side explode
    * never allocates gram strings, the broadcast ships 8 bytes per
    * eval gram instead of the text, and the probe hashes longs. Two
    * DIFFERENT grams colliding would add a phantom shared gram; with
    * B eval grams a given doc gram collides with probability B/2^64
    * (~5e-14 even for a 10^6-gram eval suite), negligible against the
    * false-match rate of n-gram overlap itself. `hashedGrams = false`
    * restores exact string membership.
    *
    * Returns one row per CONTAMINATED document: (doc_id, n_shared =
    * number of distinct shared grams). Clean documents are absent —
    * at corpus scale the output must be proportional to the
    * contamination, not the corpus.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      broadcastBench: Boolean = true, hashedGrams: Boolean = true): DataFrame = {
    def grams(text: Column): Column =
      if (hashedGrams) texthash.shingle_hash64(text, n)
      else TextOps.shingles(text, n)
    val docGrams = docs.select(col("doc_id"),
      explode(array_distinct(grams(col("text")))).as("gram"))
    val benchGrams = benchmark
      .select(explode(grams(col("text"))).as("gram"))
      .distinct()
    val probe = if (broadcastBench) broadcast(benchGrams) else benchGrams
    docGrams.join(probe, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /** Unigram-LM log-likelihood score per document: avg over tokens of
    * ln(corpus_count(token) / corpus_total_tokens) — the cheap
    * model-free stand-in for perplexity filtering (docs of rare/garble
    * tokens score low, stopword-heavy prose scores high).
    *
    * Scale shape: the vocabulary aggregation is map-side-partial over
    * (token) keys; the per-doc scoring joins tokens to the vocabulary
    * (broadcast when the vocab fits — a 10^6-type vocabulary is a few
    * tens of MB; web-scale tail vocabularies shuffle on the token
    * key) and folds into one 8-byte-key avg per doc. The corpus total
    * rides a 1-row broadcast cross join, not a driver round trip, so
    * the whole score is one job.
    */
  def unigramLogLik(df: DataFrame, text: Column = col("text")): DataFrame = {
    val toks = df.select(col("doc_id"), explode(TextOps.wsTokens(text)).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("total"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("cnt").cast("double") / col("total"))), 4)
        .as("avg_ll"))
  }

  /** Bigram-LM document score — the next LM order up from
    * [[unigramLogLik]] (CCNet's production filter is a 5-gram KenLM;
    * the bigram conditional is the first step of that ladder and
    * stays foreign-recomputable): avg over a doc's bigram positions
    * of ln p(v|u), with MLE p(v|u) = c(u,v)/c(u,·) estimated from
    * the corpus itself. Docs with fewer than 2 tokens have no bigram
    * positions and drop out (the caller left-joins if it wants
    * nulls). Feed the output's `avg_bll` into [[scoreBuckets]] for
    * the head/middle/tail cut.
    *
    * Scale shape mirrors the unigram op: the bigram model is one
    * map-side-partial (u, v) aggregation, the start counts fold from
    * the model (not the corpus), and scoring joins positions to the
    * model on the (u, v) key, ending in one 8-byte-key per-doc avg.
    */
  def bigramLogLik(df: DataFrame, text: Column = col("text")): DataFrame = {
    val pairs = df
      .select(col("doc_id"), TextOps.wsTokens(text).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS u, tk[i+1] AS v))"))
        .as("p"))
      .select(col("doc_id"), col("p.u").as("u"), col("p.v").as("v"))
    val bigrams = pairs.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cuv"))
    val starts = bigrams.groupBy(col("u")).agg(sum(col("cuv")).as("cu"))
    pairs.join(bigrams, Seq("u", "v")).join(starts, Seq("u"))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("cuv").cast("double") / col("cu").cast("double"))), 4)
        .as("avg_bll"))
  }

  /** Order-`n` (default 5 — KenLM's order in CCNet/RefinedWeb
    * filtering, Wenzek et al. 2020) hashed n-gram LM document score
    * with STUPID BACKOFF (Brants et al. 2007, the web-scale backoff
    * published exactly for this regime): per token position, S =
    * α^(K−k*) · c(k*-gram)/c(its (k*−1)-prefix), where K =
    * min(pos+1, n) is the widest context available and k* the widest
    * order the MODEL corpus has seen (k* = 1 falls back to the
    * unigram MLE c/N; a token unseen even as a unigram scores the
    * add-one floor 1/(N+buckets)). The doc score is avg ln S over
    * its positions, rounded to 4 places.
    *
    * The model fits on a SEPARATE reference corpus (CCNet fits on
    * Wikipedia and scores Common Crawl) — that is what makes backoff
    * live; self-scoring never backs off since every gram has count
    * ≥ 1. Feed the output into [[scoreBuckets]] for the CCNet
    * head/middle/tail cut.
    *
    * Scale shape: grams hash through [[md5Bucket]] (foreign-
    * recomputable, like DSIR's bag models) so no shuffle ever carries
    * gram STRINGS — the model is ≤ n·buckets integer-keyed rows
    * (map-side-combinable counts, broadcast back), and scoring is
    * two broadcast joins + one 8-byte-key per-doc avg. Hash
    * collisions conflate counts (bounded by `buckets`, same
    * documented approximation as DSIR).
    */
  def ngramLogLik(df: DataFrame, model: DataFrame, n: Int = 5,
      text: Column = col("text"), buckets: Int = 1 << 16,
      alpha: Double = 0.4): DataFrame = {
    require(n >= 2 && n <= 8, s"order must be in [2, 8], got $n")
    // every k-gram (k = 1..min(pos+1, n)) ENDING at each position,
    // with its (k−1)-prefix gram alongside — the backoff join unit
    def positions(src: DataFrame): DataFrame =
      src.select(col("doc_id"), TextOps.wsTokens(text).as("tk"))
        .filter(size(col("tk")) >= 1)
        .select(col("doc_id"), explode(expr(
          s"""flatten(transform(sequence(0, size(tk) - 1), p ->
             |  transform(sequence(1, least(p + 1, $n)), k ->
             |    struct(p AS pos, k AS k,
             |      array_join(slice(tk, p - k + 2, k), ' ') AS gram,
             |      CASE WHEN k >= 2
             |        THEN array_join(slice(tk, p - k + 2, k - 1), ' ')
             |      END AS pgram))))""".stripMargin)).as("g"))
        .select(col("doc_id"), col("g.pos").as("pos"), col("g.k").as("k"),
          md5Bucket(col("g.gram"), buckets).as("bucket"),
          when(col("g.k") >= 2, md5Bucket(col("g.pgram"), buckets))
            .as("pbucket"))
    val counts = positions(model)
      .groupBy(col("k"), col("bucket")).agg(count(lit(1)).as("c"))
    // the model is ≤ n·buckets integer-keyed rows (tokenizer-sized,
    // never corpus-sized): collect once, broadcast as a flat map, and
    // score each document in ONE per-row pass — the earlier
    // declarative scorer exploded a (pos × k) row per position and
    // paid a corpus-sized groupBy exchange plus 2× the md5 work (a
    // position's prefix bucket IS the previous position's (k−1)-gram
    // bucket, reusable only row-locally). Scoring stays bit-equal to
    // the DuckDB oracle: same buckets, same tie rules, same ln
    // arithmetic, positions averaged in document order.
    val modelRows = counts.collect()
    val cmap = new java.util.HashMap[Long, Long](modelRows.length * 2)
    var nTotL = 0L
    modelRows.foreach { r =>
      val k = r.getInt(0); val b = r.getLong(1); val c = r.getLong(2)
      cmap.put(k.toLong * (1L << 21) + b, c)
      if (k == 1) nTotL += c
    }
    val nTot = nTotL.toDouble
    val bc = df.sparkSession.sparkContext.broadcast(cmap)
    val lnAlpha = math.log(alpha)
    val nOrd = n
    val nBuckets = buckets
    val scoreUdf = udf((tokens: Seq[String]) => {
      val m = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucketOf(gram: String): Long = {
        md.reset()
        val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 5 hex digits = top 20 bits of the first 3 bytes
        val hex20 = ((d(0) & 0xFF).toLong << 12) |
          ((d(1) & 0xFF).toLong << 4) | ((d(2) & 0xF0).toLong >> 4)
        hex20 % nBuckets
      }
      val L = tokens.length
      if (L == 0) None
      else {
        var sum = 0.0
        var cnt = 0L
        var prev: Array[Long] = null // buckets of grams ending at i-1
        var i = 0
        while (i < L) {
          val kmax = math.min(i + 1, nOrd)
          val cur = new Array[Long](kmax + 1)
          var g = ""
          var k = 1
          while (k <= kmax) {
            g = if (k == 1) tokens(i) else tokens(i - k + 1) + " " + g
            cur(k) = bucketOf(g)
            k += 1
          }
          // widest model-seen order (argmax over k with a count)
          var kstar = 0
          var cnum = 0L
          k = kmax
          while (k >= 1 && kstar == 0) {
            val c = m.getOrDefault(k.toLong * (1L << 21) + cur(k), 0L)
            if (c != 0L) { kstar = k; cnum = c }
            k -= 1
          }
          val l: java.lang.Double =
            if (kstar == 0)
              (kmax - 1) * lnAlpha + math.log(1.0 / (nTot + nBuckets.toDouble))
            else if (kstar == 1)
              (kmax - 1) * lnAlpha + math.log(cnum / nTot)
            else {
              // the prefix (k−1)-gram ends at i−1: its bucket was
              // computed there. Present whenever the full gram is
              // (every full-gram occurrence counts into it).
              val cden = m.getOrDefault((kstar - 1).toLong * (1L << 21) + prev(kstar - 1), 0L)
              if (cden == 0L) null // unreachable; mirrors oracle NULL-skip
              else (kmax - kstar) * lnAlpha + math.log(cnum.toDouble / cden)
            }
          if (l != null) { sum += l; cnt += 1 }
          prev = cur
          i += 1
        }
        if (cnt == 0) None else Some(sum / cnt)
      }
    })
    df.select(col("doc_id"), TextOps.wsTokens(text).as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"), scoreUdf(col("tk")).as("l"))
      .filter(col("l").isNotNull)
      .select(col("doc_id"), round(col("l"), 4).as("avg_nll"))
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020): per language,
    * split the corpus into `nBuckets` equal-count tiers by an LM score
    * (head = best-scored third, middle, tail). CCNet sorts each
    * language by perplexity and cuts at tertiles; sorting a 100 TB
    * language inside one window partition is the classic skew trap,
    * so the cut here is computed on the (lang, score) HISTOGRAM —
    * scores arrive rounded to 4 places, so distinct values are
    * bounded and the window runs over the histogram, never the
    * corpus. bucket = floor(nBuckets · |{docs with strictly better
    * score}| / n_lang): ties share a bucket, deterministic under any
    * partitioning, and recomputable by a foreign engine.
    * Input: (doc_id, lang, score) with higher = better (avg log-lik);
    * output: (doc_id, lang, score, bucket), bucket 0 = head.
    */
  def scoreBuckets(scored: DataFrame, lang: Column = col("lang"),
      score: Column = col("score"), nBuckets: Int = 3): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val base = scored.select(col("doc_id"), lang.as("lang"), score.as("s"))
    val hist = base.groupBy(col("lang"), col("s")).agg(count(lit(1)).as("c"))
    val better = Window.partitionBy(col("lang")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val perLang = Window.partitionBy(col("lang"))
    val buckets = hist
      .withColumn("cum", coalesce(sum(col("c")).over(better), lit(0L)))
      .withColumn("n", sum(col("c")).over(perLang))
      .select(col("lang"), col("s"),
        floor(lit(nBuckets) * col("cum") / col("n")).cast("int").as("bucket"))
    base.join(buckets, Seq("lang", "s"))
      .select(col("doc_id"), col("lang"), col("s").as("score"), col("bucket"))
  }

  /** Temperature-based source mixing (the multilingual-corpus
    * rebalancing recipe published with mC4/XLM-R: sample group g with
    * probability ∝ n_g^alpha, alpha < 1 flattening the distribution).
    * Each document is kept 0+ times so the EXPECTED output size is
    * `targetTotal` with group shares ∝ n_g^alpha: per-doc copy count
    * = floor(p_g) plus one more when the doc's deterministic
    * 31-bit LCG hash falls under the fractional threshold — rare
    * groups with p_g > 1 genuinely upsample (repeat), exactly like
    * the published pipelines. Output one row per copy:
    * (doc_id, group, copy).
    *
    * Deterministic and foreign-recomputable: the keep decision is
    * integer arithmetic (LCG hash vs floor(frac(p)·2³¹)), so a
    * different engine reproduces the exact sample, and the result is
    * independent of partitioning.
    *
    * Scale shape: group counts are a tiny agg (groups ≪ corpus), the
    * per-group rate table broadcasts back, and the copy fan-out is a
    * per-row sequence explode — the corpus is scanned once with no
    * wide shuffle at all.
    */
  def mixSources(docs: DataFrame, group: Column = col("source"),
      alpha: Double = 0.5, targetTotal: Long = 0L,
      key: Column = col("doc_id")): DataFrame = {
    val base = docs.select(key.as("doc_id"), group.as("grp"))
    val counts = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(pow(col("n"), alpha)).as("wsum"),
      sum(col("n")).as("ntotal"))
    val rates = counts.crossJoin(broadcast(tot)).select(
      col("grp"),
      (pow(col("n"), alpha) / col("wsum") *
        (if (targetTotal > 0) lit(targetTotal.toDouble) else col("ntotal")) /
        col("n")).as("p"))
    val whole = floor(col("p")).cast("long")
    val thr = floor((col("p") - floor(col("p"))) * (1L << 31).toDouble)
      .cast("long")
    val h = pmod((col("doc_id") % (1L << 31)) * 1103515245L + 12345L, lit(1L << 31))
    base.join(broadcast(rates), "grp")
      .select(col("doc_id"), col("grp"),
        (whole + when(h < thr, 1L).otherwise(0L)).as("copies"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("grp"),
        explode(sequence(lit(0L), col("copies") - 1L)).as("copy"))
  }

  /** GPT-style sequence packing: concatenate documents in a fixed
    * order and cut every `budget` tokens, so each document lands at a
    * deterministic (chunk, offset) — documents may span a chunk
    * boundary, exactly like the published LM pre-training packing.
    * Packing is per shard (`doc_id % shards`, doc_id order within) so
    * a 100 TB corpus packs in `shards`-way parallelism instead of one
    * global sequential pass; each shard's layout is independent.
    * Returns (doc_id, shard, n_tokens, chunk, chunk_off).
    *
    * Scale shape: token counts are per-row; the only shuffle is the
    * shard hash partition, and the per-shard running sum is one
    * window pass. All arithmetic is integer — foreign engines
    * reproduce the layout bit-exactly.
    */
  def packSequences(docs: DataFrame, budget: Long, shards: Int = 64,
      text: Column = col("text")): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(TextOps.wsTokens(text)).cast("long").as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start DIV ${budget}L").as("chunk"),
        pmod(col("start"), lit(budget)).as("chunk_off"))
  }

  /** Cross-document paragraph deduplication (the CCNet / RefinedWeb
    * line-dedup pass — public recipes): every paragraph that occurs
    * more than once in the corpus is kept ONLY at its first occurrence
    * (minimum (doc_id, position)); each document's text is rebuilt
    * from its surviving paragraphs. Documents whose every paragraph
    * was seen earlier drop out entirely.
    *
    * Scale shape: the keep-decision never shuffles text. Paragraph
    * instances are reduced to (xxhash64(para), doc_id·2^20 + pos) —
    * two longs — and min-aggregated per hash with map-side partial
    * combine; the winners fold back to a per-doc sorted keep-position
    * array (a few ints per doc). The only shuffle that moves document
    * text is the final doc_id equi-join of that keep-array onto the
    * corpus (disappears entirely under a doc_id-bucketed layout), and
    * the rebuild is per-row: re-split, keep the flagged indices,
    * re-join. Positions are capped at 2^20 paragraphs per document so
    * the (doc, pos) order key packs into one long; 64-bit hash
    * collisions conflate unrelated paragraphs with negligible
    * probability (~n²/2^65).
    */
  def dropDupParagraphs(docs: DataFrame, delimRegex: String = "\n",
      delimOut: String = "\n", text: Column = col("text")): DataFrame = {
    val posLimit = 1L << 20
    val paras = docs.select(col("doc_id"),
      posexplode(split(text, delimRegex)).as(Seq("pos", "para")))
    val enc = when(col("pos") >= posLimit || col("doc_id") >= (1L << 43),
        raise_error(lit("dropDupParagraphs: doc_id/pos outside the 43+20-bit " +
          "packed-key domain")))
      .otherwise(col("doc_id") * posLimit + col("pos"))
    val winners = paras
      .select(xxhash64(col("para")).as("h"), enc.as("enc"))
      .groupBy(col("h"))
      .agg(min(col("enc")).as("enc"))
    val keepPos = winners
      .select(shiftright(col("enc"), 20).as("doc_id"),
        col("enc").bitwiseAND(lit(posLimit - 1)).cast("int").as("pos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("keep"))
    docs.join(keepPos, "doc_id")
      .select(col("doc_id"),
        concat_ws(delimOut,
          filter(split(text, delimRegex),
            (_, i) => array_contains(col("keep"), i))).as("text"))
  }

  /** Exact top-k vocabulary per language (count desc, token asc) —
    * the tokenizer-training / stopword-mining primitive.
    *
    * Scale shape: the naive plan windows over every distinct token of
    * a language — one sort of a 10^8-row vocabulary per partition key,
    * concentrated on whichever language dominates the corpus. Instead
    * the (lang, token) counts (map-side partial agg does the heavy
    * lifting) go through a TWO-STAGE top-k: stage 1 ranks within
    * (lang, hash-salt) — `salt` bounded sorts of vocab/salt rows —
    * and only each salt's top k survive; stage 2 ranks the ≤ salt×k
    * survivors per language. Exact because a global top-k row is a
    * fortiori in its own salt bucket's top k.
    */
  def topVocab(df: DataFrame, k: Int, salt: Int = 16,
      text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col("lang"), explode(TextOps.wsTokens(text)).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("cnt"))
    val order = Seq(col("cnt").desc, col("token").asc)
    val w1 = Window
      .partitionBy(col("lang"), pmod(xxhash64(col("token")), lit(salt)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col("lang")).orderBy(order: _*)
    counts
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rk", row_number().over(w2).cast("long")).filter(col("rk") <= k)
      .select(col("lang"), col("token"), col("cnt"), col("rk"))
  }

  /** Hashed-n-gram feature bucket, auditable by a foreign engine: the
    * first 5 hex chars of md5(gram) read as an integer, mod `buckets`
    * — 20 bits of hash, the cap on useful `buckets`. md5 (not
    * xxhash64) for the same reason as [[lcgHash]]: DuckDB computes it
    * bit-identically, so every bucket assignment — including
    * collisions, which perturb the fitted models — is recomputable by
    * the driver's oracle.
    */
  def md5Bucket(gram: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in (0, 2^20], got $buckets")
    conv(substring(md5(gram), 1, 5), 16, 10).cast("long") % buckets
  }

  /** (doc_id, bucket) per gram occurrence: whitespace unigrams plus
    * space-joined bigrams, hashed by [[md5Bucket]] — the feature
    * extraction shared by the DSIR model fit and the per-doc scoring.
    */
  private[ops] def gramBuckets(df: DataFrame, text: Column,
      buckets: Int): DataFrame = {
    val toks = TextOps.wsTokens(text)
    val bi = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    df.select(col("doc_id"), explode(concat(toks, bi)).as("gram"))
      .select(col("doc_id"), md5Bucket(col("gram"), buckets).as("bucket"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): fit
    * bag-of-hashed-n-gram unigram models over a small TARGET corpus
    * (the distribution you want more of) and the RAW corpus, then
    * score every raw document by its importance log-weight
    * Σ_b c_b · (ln θ_target[b] − ln θ_raw[b]) with add-`smoothing`
    * estimates. Returns (doc_id, logw) for every raw doc with ≥ 1
    * gram; logw rounded to 4 places (float-compare policy).
    *
    * Scale shape: each corpus is scanned once; the models are
    * map-side-combinable counts over ≤ `buckets` integer keys; the
    * ≤-buckets-row model table broadcasts back onto the per-doc
    * bucket counts (one (doc_id, bucket) agg). No shuffle ever
    * carries gram STRINGS — only 8-byte (doc_id, bucket) pairs —
    * and nothing scales with target × raw.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      text: Column = col("text"), buckets: Int = 1 << 18,
      smoothing: Double = 1.0, finalize: Boolean = true): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // the raw corpus's gram buckets feed BOTH the model fit and the
    // per-doc scoring — without the cache the md5-gram explode runs
    // twice over the whole corpus (the dominant cost)
    val rb = gramBuckets(raw, text, buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tc = gramBuckets(target, text, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val rc = rb
      .groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val joined = tc.join(rc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tots = joined.agg(
      sum(col("ct")).cast("double").as("tt"),
      sum(col("cr")).cast("double").as("tr"))
    val denom = lit(buckets.toDouble * smoothing)
    val model = joined.crossJoin(broadcast(tots)).select(
      col("bucket"),
      (log((col("ct") + smoothing) / (col("tt") + denom)) -
        log((col("cr") + smoothing) / (col("tr") + denom))).as("lr"))
    val result = rb
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c") * col("lr")), 4).as("logw"))
    // eager materialization releases the postings cache (same
    // finalize pattern as the Dedup ops); finalize = false keeps the
    // plan lazy for plan-inspection tests
    if (!finalize) result
    else {
      val out = result.localCheckpoint(true)
      rb.unpersist()
      out
    }
  }

  /** The resampling side of DSIR: keep the top `k` raw documents by
    * importance weight. `gumbel = true` adds the paper's Gumbel noise
    * — g = −ln(−ln(u)) with u = (lcgHash(doc_id) + 0.5) / 2³¹, a
    * DETERMINISTIC per-doc uniform, so the sample is the paper's
    * softmax-without-replacement draw yet bit-reproducible by a
    * foreign engine (same auditability contract as [[assignSplits]]).
    * Top-k via orderBy+limit = TakeOrderedAndProject — no global sort
    * materializes at any corpus size.
    */
  def selectByImportance(raw: DataFrame, target: DataFrame, k: Int,
      text: Column = col("text"), buckets: Int = 1 << 18,
      smoothing: Double = 1.0, gumbel: Boolean = false): DataFrame = {
    val w = importanceWeights(raw, target, text, buckets, smoothing)
    val u = (lcgHash(col("doc_id")).cast("double") + 0.5) /
      lit(2147483648.0)
    val scored =
      if (!gumbel) w.withColumn("score", col("logw"))
      else w.withColumn("score", round(col("logw") - log(-log(u)), 4))
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"), col("logw"), col("score"))
  }

  /** Domain-blocklist matching (the UT1-blacklist-style URL filter of
    * CCNet/RefinedWeb pipelines): a document is blocked when its
    * URL's host equals a blocklisted domain OR sits under one
    * ("ads.tracker.example" matches the entry "tracker.example").
    *
    * Scale shape: the suffix test becomes an EQUI-join. Each host
    * expands per-row into its dot-suffix chain — bounded by the
    * host's label count (≤ ~10), never by corpus or blocklist size —
    * and the chain joins the normalized blocklist on equality. Spark
    * broadcasts the blocklist when it fits (the usual case: public
    * blacklists are a few million short strings) and falls back to a
    * shuffled join of (doc_id, suffix) pairs otherwise; document text
    * never moves in either regime. A `host LIKE '%.'||domain`
    * predicate — the naive encoding — would be a cartesian filter
    * join at 10^8 docs × 10^6 domains; the suffix chain is what makes
    * it hash-partitionable.
    *
    * Output: one row per (doc, matched domain) — every match, so a
    * foreign engine can recompute it as a plain suffix join without
    * agreeing on a most-specific-match tie-break.
    */
  def blockedByDomain(docs: DataFrame, blocklist: DataFrame,
      url: Column = col("url"), domain: Column = col("domain")): DataFrame = {
    val bl = blocklist.select(lower(trim(domain)).as("domain"))
      .where(col("domain") =!= "").distinct()
    val host = graft.functions.canon.host_of(url)
    val labels = split(host, "\\.")
    val suffixes = transform(
      sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
    docs.select(col("doc_id"), host.as("host"),
        explode(suffixes).as("suffix"))
      .join(bl, col("suffix") === col("domain"))
      .select(col("doc_id"), col("host"), col("domain"))
  }

  /** Crawler-trap detection: hosts whose URL space explodes while
    * their payload space doesn't — calendar pages, session-id spam,
    * faceted-search loops; the classic traps a 10^10-URL frontier
    * must cut before they eat the politeness budget. Per host:
    * distinct urls, distinct payloads, urls-per-payload; a host is
    * flagged when it has ≥ `minUrls` distinct urls at ≥ `minRatio`
    * urls per distinct payload.
    *
    * Scale shape: pages reduce per-row to (host, xxhash64(url),
    * xxhash64(html)) — page bytes never shuffle — and the two exact
    * distinct counts aggregate with map-side partials; output ∝
    * flagged hosts.
    */
  def trapHosts(pages: DataFrame, minUrls: Long = 100,
      minRatio: Double = 10.0, url: Column = col("url")): DataFrame = {
    val host = graft.functions.canon.host_of(url)
    pages.select(host.as("host"), xxhash64(url).as("uh"),
        xxhash64(col("html")).as("ph"))
      .groupBy("host")
      .agg(countDistinct(col("uh")).as("n_urls"),
        countDistinct(col("ph")).as("n_payloads"))
      .withColumn("urls_per_payload",
        round(col("n_urls").cast("double") / col("n_payloads").cast("double"), 4))
      .filter(col("n_urls") >= minUrls &&
        col("urls_per_payload") >= minRatio)
  }

  /** Per-URL quality features (the URL-level filter of
    * RefinedWeb-style pipelines — scoring a page before fetching or
    * reading its body): length, host label count, path depth,
    * query-parameter count, digit share, and spam-word hits. Pure
    * per-row Column algebra — codegen'd, zero shuffle — and every
    * field is integer-exact (`digit_bp` is basis points,
    * floor(10^4·digits/len), so a foreign engine recomputes it
    * without float-rounding hazards). Composes with
    * [[blockedByDomain]] (host level) and the text-quality gates
    * (body level).
    */
  def urlFeatures(url: Column, spamWords: Seq[String]): Column = {
    val u = lower(url)
    val host = regexp_extract(u, "^[a-z]+://([^/?#]+)", 1)
    val path = regexp_extract(u, "^[a-z]+://[^/?#]+(/[^?#]*)", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val uLen = length(u)
    val digits = length(regexp_replace(u, "[^0-9]", ""))
    val spamHits = spamWords.map(w => when(u.contains(w), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    struct(
      uLen.as("url_len"),
      size(split(host, "\\.")).as("host_labels"),
      (size(split(path, "/")) - 1).as("path_depth"),
      when(query === "", 0).otherwise(size(split(query, "&"))).as("n_params"),
      when(uLen === 0, lit(0L)).otherwise(
        floor(digits.cast("double") * 10000d / uLen.cast("double")))
        .as("digit_bp"),
      spamHits.as("spam_hits"))
  }

  /** Tracking/session-id URL hygiene (the Heritrix-style
    * canonicalization rules every production crawler applies before
    * the seen-set): strips `;jsessionid=…` path suffixes (the classic
    * servlet session id that makes one page look like infinitely many
    * URLs) and the ubiquitous click/campaign query parameters
    * (`utm_*`, `gclid`, `fbclid`, …), then drops an emptied query.
    * Composes BEFORE `canonical_url` — session/tracking noise
    * collapses first, then the canonical form sorts what remains.
    *
    * Pure per-row regexp + array algebra (zero shuffle), patterns in
    * the Java∩RE2 subset so the driver gate hash-verifies the whole
    * rewrite against a foreign engine. Matching is case-insensitive;
    * surviving parameters keep their original spelling and order.
    */
  def stripTrackingParams(url: Column,
      extraParams: Seq[String] = Seq.empty): Column = {
    val names = Seq("utm_[a-z0-9_]*", "gclid", "dclid", "fbclid",
      "msclkid", "mc_cid", "mc_eid", "igshid", "yclid", "_ga", "_gl",
      "spm", "ref_src") ++ extraParams.map(_.toLowerCase)
    val pat = names.mkString("^(", "|", ")(=|$)")
    val noSession = regexp_replace(url, "(?i);jsessionid=[^?#]*", "")
    val beforeQ = regexp_extract(noSession, "^[^?#]*", 0)
    // anchor to the pre-fragment region: a '?' inside the fragment
    // (SPA hash routing, "…/#/path?page=2") is NOT a query string
    val query = regexp_extract(noSession, "^[^#?]*\\?([^#]*)", 1)
    val frag = regexp_extract(noSession, "(#.*)$", 1)
    val kept = filter(split(query, "&"),
      p => length(p) > 0 && !lower(p).rlike(pat))
    concat(beforeQ,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")),
      frag)
  }

  /** Keep-pass over [[blockedByDomain]]: drops every document whose
    * host is on (or under) the blocklist. The keep decision shuffles
    * only blocked doc_ids (8-byte keys, output ∝ blocked set); the
    * corpus subtracts them with one anti-join.
    */
  def dropBlockedDomains(docs: DataFrame, blocklist: DataFrame,
      url: Column = col("url"), domain: Column = col("domain")): DataFrame = {
    val blocked = blockedByDomain(docs, blocklist, url, domain)
      .select(col("doc_id")).distinct()
    docs.join(blocked, Seq("doc_id"), "left_anti")
  }

  /** C4-style line/document cleaning (Raffel et al. 2020, §2.2 —
    * the public C4 rule set). Line level: keep only lines that end
    * in a terminal punctuation mark (`.` `!` `?` `"`), contain at
    * least `minWords` whitespace words, and do not mention
    * "javascript". Document level: `keep` is false for docs whose
    * kept text carries fewer than `minSentences` terminal marks, or
    * that contain "lorem ipsum" or a curly brace anywhere (the
    * boilerplate/code tells C4 drops whole pages for).
    *
    * Returns struct(kept_text, n_lines_kept, n_sentences, keep).
    * Pure per-row algebra (split + array filter + regexp): zero
    * shuffle at any corpus size, and every rule stays inside the
    * Java∩RE2 regex subset so a foreign SQL engine recomputes the
    * whole decision — the driver gate hash-verifies it.
    */
  def c4Filter(text: Column, minWords: Int = 5,
      minSentences: Int = 3): Column = {
    val kept = filter(
      transform(split(text, "\n"), l => trim(l)),
      l => l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minWords &&
        !lower(l).contains("javascript"))
    val keptText = array_join(kept, "\n")
    val nSent = size(regexp_extract_all(keptText, lit("[.!?\"]"), lit(0)))
    struct(
      keptText.as("kept_text"),
      size(kept).cast("long").as("n_lines_kept"),
      nSent.cast("long").as("n_sentences"),
      (nSent >= minSentences &&
        !lower(text).contains("lorem ipsum") &&
        !text.contains("{")).as("keep"))
  }

  /** Gopher document-quality rules (Rae et al. 2021, table A1 — the
    * public heuristic gate most later pipelines inherit): word-count
    * bounds, mean word length in [3,10] chars, symbol-to-word ratios
    * for `#` and `...`, bullet-/ellipsis-line fractions, fraction of
    * words containing an alphabetic character, and ≥2 of the eight
    * canonical English stop words present.
    *
    * Every fractional metric is integer basis points
    * (floor(10^4·x/n); mean word length in centi-chars) so the
    * decision has no float-rounding hazard and a foreign engine
    * recomputes it bit-identically. Backed by the codegen'd
    * [[graft.functions.GopherStats]] expression — ONE pass over the
    * string per row. The first formulation was Column algebra whose
    * token array re-evaluated ~10× per row through interpreted array
    * lambdas (20-100 s at sf0.1); the kernel is value-identical
    * (CurationSpec's scala oracle pins every metric) at per-row
    * scan speed.
    */
  def gopherQuality(text: Column, minWords: Long = 50,
      maxWords: Long = 100000L): Column =
    texthash.gopher_stats(text, minWords, maxWords)

  /** Deterministic global training-order shuffle: every doc gets a
    * (shard, pos) — which output shard it lands in and its position
    * inside that shard — from pure LCG arithmetic on the key, with
    * `epoch` folded into the hash so each training epoch sees an
    * independent deterministic permutation of the same corpus.
    *
    * Scale shape: the naive global `orderBy(rand)` is one total sort
    * of 100 TB; here the only wide operation is a window per shard,
    * and `shards` is chosen so a shard's rows fit an executor
    * (10^4 shards ⇒ ~10 GB windows at 100 TB). Assignment is stable
    * under repartitioning/reruns (hash-based, not row_number over an
    * arbitrary order), and the arithmetic is foreign-recomputable —
    * the driver gate checks shard AND position against DuckDB.
    */
  def shuffleShards(df: DataFrame, shards: Int,
      key: Column = col("doc_id"), epoch: Int = 0): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = lcgHash(lcgHash(key) + lit(epoch.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), key)
    df.withColumn("h", h)
      .withColumn("shard", pmod(shiftright(col("h"), 8), lit(shards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("h")
  }
}
