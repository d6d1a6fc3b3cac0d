package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.texthash

/** Text-analysis operators for a large-scale training-data pipeline,
  * all expressed as per-row Column algebra (whole-stage codegen, zero
  * shuffle) so they stream over a 100 TB corpus at scan speed.
  */
object TextOps {

  /** whitespace tokens (split keeps no trailing empty for non-empty
    * docs; matches DuckDB string_split_regex on single-space text)
    */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish lexer: letter runs | digit runs | single non-space symbol */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCounts(df: DataFrame, text: Column = col("text")): DataFrame =
    df.select(
      col("doc_id"),
      size(wsTokens(text)).as("ws_tokens"),
      size(bpeTokens(text)).as("bpe_tokens"))

  /** tiny per-language stopword profiles (public-knowledge lists) */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"))

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID heuristic: argmax of per-language stopword hit counts;
    * 'und' (undetermined) when nothing matches. Deterministic ties:
    * language order en > de > fr > es (greatest()+when cascade).
    */
  def langId(text: Column): Column = {
    val toks = wsTokens(text)
    val scores = Seq("en", "de", "fr", "es").map { l =>
      l -> stopCount(toks, stopwords(l))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), e) =>
      when(s === best && best > 0, lit(l)).otherwise(e)
    }
  }

  /** Quality features + score (length / punctuation / stopword ratios,
    * mean token length) — the standard cheap pre-filters before
    * training-data inclusion.
    */
  def qualityScore(df: DataFrame, text: Column = col("text")): DataFrame = {
    val toks = wsTokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val punct = nChar - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    val stops = size(filter(toks, t => t.isInCollection(stopwords("en"))))
    df.select(
      col("doc_id"),
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      (punct.cast("double") / nChar).as("punct_ratio"),
      (stops.cast("double") / nTok).as("stop_ratio"),
      ((nChar - nTok + 1).cast("double") / nTok).as("mean_tok_len"))
      .withColumn("quality",
        when(col("n_tokens") >= 10, lit(0.5)).otherwise(lit(0.0)) +
          when(col("punct_ratio") <= 0.1, lit(0.25)).otherwise(lit(0.0)) +
          when(col("stop_ratio") >= 0.05, lit(0.25)).otherwise(lit(0.0)))
  }

  /** word n-gram shingles as an array column (per-row, no shuffle).
    * Short docs (< n tokens) yield an EMPTY array — the guard is
    * explicit because sequence(0, -1) is a DESCENDING two-element
    * sequence in Spark, not empty (it made slice throw on short docs).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Min-wise content fingerprint: min over md5(word-3-gram). Two docs
    * sharing their lowest shingle hash collide — a cheap locality-
    * sensitive fingerprint (1-hash MinHash), and md5 keeps it
    * oracle-checkable in ANSI SQL. Computed by the codegen'd
    * `MinMd5Shingle` kernel (single pass, raw-digest min, one hex
    * encode per row) — value-identical to the Column algebra
    * `array_min(transform(shingles(text, n), md5))` (OpsSpec-pinned).
    */
  def fingerprintMinShingle(text: Column, n: Int = 3): Column =
    texthash.min_md5_shingle(text, n)

  /** 64-bit SimHash over whitespace tokens, pure Column algebra:
    * per-token xxhash64 → per-bit ±1 votes folded with aggregate()/
    * zip_with() → sign bits reassembled. No shuffle, stays in codegen.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(wsTokens(text), t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(getbit(h, i) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** [[simhash]] in md5-arithmetic mode (foreign-verifiable): the
    * per-token 64-bit hash is the first 16 md5 hex digits read as a
    * big-endian integer instead of xxhash64, which no other engine
    * reproduces. An ANSI oracle recomputes every bit with
    * per-hex-digit arithmetic (bit i of the fingerprint = bit i%4 of
    * hex digit 16 - i/4), so the majority votes and the reassembled
    * fingerprint hash-verify at the driver's DuckDB gate. Same vote
    * semantics as the production variant: one ±1 vote per token
    * OCCURRENCE (including empty split artifacts), sign bit per
    * position, bit 63 wraps negative exactly like Java's 1L<<63.
    * Computed by the single-pass codegen'd
    * [[graft.functions.TextKernel.md5Simhash]] kernel (OpsSpec pins
    * it against an independent MessageDigest reference).
    */
  def simhashMd5(text: Column): Column =
    texthash.md5_simhash(text)

  /** Hamming distance between two simhash fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Gopher-style word n-gram repetition statistics, per document:
    *
    *   - `n_grams`   — total n-gram instances (len(tokens) - n + 1)
    *   - `top_frac`  — instances of the single most frequent n-gram /
    *                   n_grams ("fraction of text in the top n-gram")
    *   - `dup_frac`  — instances whose n-gram occurs ≥ 2 times /
    *                   n_grams ("fraction of text in duplicated
    *                   n-grams")
    *
    * These are the published repeated-n-gram quality filters (Gopher /
    * MassiveText, Rae et al. 2021 — public) used to drop
    * boilerplate/spam pages before training.
    *
    * Scale shape: entirely per-row — the gram multiset is counted
    * INSIDE the row (the `RepetitionStats` codegen expression: one
    * shingle-hash pass + an open-addressing count table per row), so
    * a 100 TB corpus streams at scan speed with zero shuffle (the
    * naive plan explodes every gram and aggregates on (doc_id, gram)
    * — two corpus-wide shuffles; the previous in-row formulation
    * sort-folded gram STRINGS through the interpreted `aggregate()`
    * HOF, ~5× slower). Counts are over 64-bit gram hashes — identical
    * to string counts unless two grams collide (~k²/2⁶⁵ per doc).
    * Short docs (< n tokens) report n_grams = 0 and 0.0 fractions;
    * the division is guarded because ANSI mode throws on x/0.
    */
  def repetitionStats(df: DataFrame, n: Int = 2,
      text: Column = col("text")): DataFrame = {
    val st = graft.functions.texthash.repetition_stats(text, n)
    df.select(col("doc_id"), st.as("__st"))
      .select(col("doc_id"), col("__st.n_grams").as("n_grams"),
        col("__st.max_cnt").as("__mx"), col("__st.dup").as("__dup"))
      .select(col("doc_id"), col("n_grams"),
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(round(col("__mx").cast("double") / col("n_grams"), 4))
          .as("top_frac"),
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(round(col("__dup").cast("double") / col("n_grams"), 4))
          .as("dup_frac"))
  }
}
