package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hashed word-n-gram shingling.
  *
  * Value-identical to the Column-algebra formulation
  * `transform(shingles(text, n), s => xxhash64(s))` (asserted by
  * OpsSpec): Java `split("\\s+", -1)` tokenization, single-space
  * joins, XXH64(seed 42) over the gram's UTF-8 bytes — but computed
  * in one pass with a reused byte buffer instead of materializing a
  * token array column, a per-gram `concat_ws` UTF8String, and k
  * intermediate arrays per row. The shingle build is the base cost of
  * every near-dup operator (MinHash signatures, LSH bands, Jaccard
  * postings), so this is the hot inner loop of dedup at corpus scale.
  */
object TextKernel {

  /** Unicode NFC normalization (java.text.Normalizer — the same
    * canonical composition DuckDB's `nfc_normalize` implements, which
    * is what makes the op foreign-oracle-checkable). ASCII fast path:
    * NFC is the identity on pure-ASCII bytes, and UTF8String exposes
    * that check without decoding — a 100 TB web corpus is mostly
    * ASCII, so the common row never allocates.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((text.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) text
    else UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC))
  }

  def shingleHash64(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashArray(text, n))

  /** the raw hash array behind [[shingleHash64]] (shared with the
    * repetition kernel)
    */
  def shingleHashArray(text: UTF8String, n: Int): Array[Long] = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return Array.empty[Long]
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val out = new Array[Long](toks.length - n + 1)
    var buf = new Array[Byte](128)
    i = 0
    while (i <= toks.length - n) {
      var len = 0
      var j = 0
      while (j < n) {
        val t = tb(i + j)
        val need = len + t.length + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, need << 1)
        if (j > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(t, 0, buf, len, t.length)
        len += t.length
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    out
  }

  /** Per-row n-gram multiset statistics: (n_grams, max_cnt, dup) where
    * max_cnt is the multiplicity of the most frequent gram and dup the
    * number of instances whose gram occurs ≥ 2 times. Counts 64-bit
    * gram hashes in a per-row open-addressing table (zero allocation
    * beyond the two flat arrays), replacing an interpreted
    * sort + aggregate() run-fold over gram STRINGS — same counts
    * unless two different grams collide in 64 bits (~k²/2⁶⁵ per doc).
    */
  def repetitionStats(text: UTF8String, n: Int): InternalRow = {
    val hs = shingleHashArray(text, n)
    val m = hs.length
    if (m == 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    var i = 0
    while (i < m) {
      val h = hs(i)
      var idx = ((h ^ (h >>> 32)).toInt) & mask
      while (cnts(idx) != 0 && keys(idx) != h) idx = (idx + 1) & mask
      keys(idx) = h
      cnts(idx) += 1
      i += 1
    }
    var mx = 0L
    var dup = 0L
    var j = 0
    while (j < cap) {
      val c = cnts(j)
      if (c > 0) {
        if (c > mx) mx = c.toLong
        if (c >= 2) dup += c
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, mx, dup))
  }

  private val gopherStopWords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** All Gopher document-quality metrics (Rae et al. 2021 table A1)
    * in ONE pass over the string — word count/chars, '#' and "..."
    * occurrences, bullet/ellipsis line classes, alpha-word and
    * stop-word hits — replacing a Column form whose token array was
    * re-evaluated ~10× per row through interpreted array lambdas
    * (CollapseProject inlines the split into every consumer; the
    * q_gopher driver query measured 20-100 s at sf0.1 against
    * sub-second for everything comparable). Value-identical by
    * construction: tokens are maximal runs of non-`\s` chars (Java
    * regex `\s` = space/tab/LF/VT/FF/CR exactly, NOT the Unicode
    * space set), char counts are CODEPOINT counts (matching Spark's
    * `length`), lines trim ASCII spaces only (matching Spark's
    * `trim`), "..." counts are non-overlapping left-to-right
    * (matching `replace`-based counting), and all ratios are the
    * same integer-division basis points. CurationSpec's scala oracle
    * pins the parity.
    */
  def gopherStats(text: UTF8String, minWords: Long,
      maxWords: Long): InternalRow = {
    val s = text.toString
    val n = s.length
    // --- single scan: words, word chars, alpha words, stop words,
    // '#' and "..." occurrences ---
    var nWords = 0L
    var wordChars = 0L // codepoints
    var nAlpha = 0L
    var stopMask = 0
    var nHash = 0L
    var nEll = 0L
    var i = 0
    var tokStart = -1
    var tokHasAlpha = false
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    def endToken(end: Int): Unit = {
      nWords += 1
      if (tokHasAlpha) nAlpha += 1
      val len = end - tokStart
      if (len >= 2 && len <= 4 && stopMask != 0xFF) {
        var w = 0
        while (w < gopherStopWords.length) {
          if ((stopMask & (1 << w)) == 0) {
            val sw = gopherStopWords(w)
            if (sw.length == len) {
              var j = 0
              var eq = true
              while (eq && j < len) {
                val c = s.charAt(tokStart + j)
                val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar
                  else if (c < 128) c
                  else Character.toLowerCase(c)
                if (lc != sw.charAt(j)) eq = false
                j += 1
              }
              if (eq) stopMask |= (1 << w)
            }
          }
          w += 1
        }
      }
      tokStart = -1
      tokHasAlpha = false
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (tokStart >= 0) endToken(i)
      } else {
        if (tokStart < 0) { tokStart = i; tokHasAlpha = false }
        if (!Character.isLowSurrogate(c)) wordChars += 1
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
          tokHasAlpha = true
        if (c == '#') nHash += 1
        if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' &&
            s.charAt(i + 2) == '.') {
          // non-overlapping left-to-right: consume all three dots;
          // the two extra consumed dots still count as word chars
          nEll += 1
          wordChars += 2
          i += 2
        }
      }
      i += 1
    }
    if (tokStart >= 0) endToken(n)
    // --- line scan: trim ASCII spaces, classify non-empty lines ---
    var nLines = 0L
    var nBullet = 0L
    var nEllLines = 0L
    var ls = 0
    while (ls <= n) {
      var le = s.indexOf('\n', ls)
      if (le < 0) le = n
      var a = ls
      var b = le
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        nLines += 1
        val c0 = s.charAt(a)
        if (c0 == '•' ||
            (b - a >= 2 && (c0 == '-' || c0 == '*') && s.charAt(a + 1) == ' '))
          nBullet += 1
        if (b - a >= 3 && s.charAt(b - 1) == '.' && s.charAt(b - 2) == '.' &&
            s.charAt(b - 3) == '.')
          nEllLines += 1
      }
      ls = le + 1
    }
    var stopHits = 0L
    var w = 0
    while (w < 8) { if ((stopMask & (1 << w)) != 0) stopHits += 1; w += 1 }
    val meanWl = if (nWords > 0) wordChars * 100 / nWords else 0L
    def pw(x: Long) = if (nWords > 0) x * 10000 / nWords else 0L
    def pl(x: Long) = if (nLines > 0) x * 10000 / nLines else 0L
    val hashBp = pw(nHash)
    val ellBp = pw(nEll)
    val bulletBp = pl(nBullet)
    val ellLineBp = pl(nEllLines)
    val alphaBp = pw(nAlpha)
    val keep = nWords >= minWords && nWords <= maxWords &&
      meanWl >= 300 && meanWl <= 1000 && hashBp <= 1000 && ellBp <= 1000 &&
      bulletBp <= 9000 && ellLineBp <= 3000 && alphaBp >= 8000 &&
      stopHits >= 2
    new GenericInternalRow(Array[Any](nWords, meanWl, hashBp, ellBp,
      bulletBp, ellLineBp, alphaBp, stopHits, keep))
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".getBytes

  /** Min-wise MD5 content fingerprint: min over md5(word-n-gram),
    * value-identical to `array_min(transform(shingles(text, n), md5))`
    * (and to ANSI `min(md5(gram))`, which keeps it foreign-oracle-
    * checkable) — but computed in one pass: grams build in a reused
    * byte buffer, digests compare as raw bytes (hex encoding is
    * nibble-order-preserving, so byte order ≡ hex-string order), and
    * only the winning digest hex-encodes. The Column form materialized
    * a token array, k gram strings, k 32-char hex strings and an
    * array_min scan per row. NULL for docs shorter than n tokens,
    * exactly like array_min over an empty array.
    */
  def minMd5Shingle(text: UTF8String, n: Int): UTF8String = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return null
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = md5Local.get()
    var buf = new Array[Byte](128)
    var best: Array[Byte] = null
    i = 0
    while (i <= toks.length - n) {
      var len = 0
      var j = 0
      while (j < n) {
        val t = tb(i + j)
        val need = len + t.length + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, need << 1)
        if (j > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(t, 0, buf, len, t.length)
        len += t.length
        j += 1
      }
      md.reset()
      md.update(buf, 0, len)
      val d = md.digest()
      if (best == null || {
        var k = 0
        var cmp = 0
        while (cmp == 0 && k < 16) {
          cmp = (d(k) & 0xff) - (best(k) & 0xff)
          k += 1
        }
        cmp < 0
      }) best = d
      i += 1
    }
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((best(i) & 0xf0) >>> 4)
      hex(2 * i + 1) = hexDigits(best(i) & 0x0f)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** md5-arithmetic MinHash signature — classic k-PERMUTATION MinHash
    * over a 20-bit md5-hashed shingle universe, in one pass:
    * x(gram) = first 5 md5 hex digits as an integer (the raw-digest
    * extraction below ≡ `conv(substring(md5(gram), 1, 5), 16, 10)`,
    * which an ANSI oracle recomputes digit by digit), and
    * sig[j] = min over grams of (A_j·x + B_j) mod 2²⁰ with
    * A_j = ((2j+1)·2654435761) mod 2²⁰ (odd ⇒ a bijection on Z_2²⁰)
    * and B_j = (40503·j + 17) mod 2²⁰ — one md5 per gram instead of k,
    * the rest integer arithmetic below 2⁴⁰ (no overflow on either
    * engine). Docs under n tokens yield [2²⁰ × k] sentinels (the value
    * is outside the hash range, so short docs only ever bucket with
    * each other). Formula changes here must be mirrored in
    * Dedup.minhashPermA/B and SparkEntry's minhashBandCte.
    */
  def md5MinhashSig(text: UTF8String, n: Int, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, 1L << 20)
    val toks = text.toString.split("\\s+", -1)
    if (toks.length >= n) {
      val tb = new Array[Array[Byte]](toks.length)
      var i = 0
      while (i < toks.length) {
        tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      val md = md5Local.get()
      var buf = new Array[Byte](128)
      i = 0
      while (i <= toks.length - n) {
        var len = 0
        var j = 0
        while (j < n) {
          val t = tb(i + j)
          val need = len + t.length + 1
          if (need > buf.length) buf = java.util.Arrays.copyOf(buf, need << 1)
          if (j > 0) { buf(len) = ' '; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          j += 1
        }
        md.reset()
        md.update(buf, 0, len)
        val d = md.digest()
        val x = ((d(0) & 0xffL) << 12) | ((d(1) & 0xffL) << 4) |
          ((d(2) & 0xffL) >>> 4)
        j = 0
        while (j < k) {
          val a = ((2L * j + 1L) * 2654435761L) % 1048576L
          val b = (40503L * j + 17L) % 1048576L
          val v = (x * a + b) % 1048576L
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** md5-arithmetic SimHash in one pass — value-identical to the
    * Column formulation it replaces (OpsSpec pins it against an
    * independent MessageDigest reference): per token OCCURRENCE
    * (including empty split artifacts) the 64-bit hash is the first 8
    * md5 bytes big-endian (hi = bytes 0-3 ≡ hex digits 1-8, lo =
    * bytes 4-7 ≡ hex digits 9-16; fp bit i = bit i of lo for i < 32,
    * bit i−32 of hi above), ±1 votes per bit, sign bits reassembled
    * with bit 63 wrapping negative exactly like Java's 1L << 63.
    */
  def md5Simhash(text: UTF8String): Long = {
    val toks = text.toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 64) {
        val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
        votes(b) += (if (bit == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** `shingle_hash64(text, n)` → ARRAY<BIGINT> of hashed n-gram
  * shingles; one static call in generated code.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernel.shingleHash64(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.shingleHash64($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHash64 =
    copy(child = c)
}

/** `nfc_normalize(text)` → STRING in Unicode Normalization Form C;
  * one static call in generated code, identity (no copy) on ASCII.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernel.nfcNormalize(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** `repetition_stats(text, n)` → STRUCT<n_grams, max_cnt, dup BIGINT>
  * — the Gopher repeated-n-gram counters in one codegen'd pass.
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextKernel.repetitionStats(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.repetitionStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** `min_md5_shingle(text, n)` → STRING: the min-wise MD5 n-gram
  * fingerprint in one codegen'd pass; NULL for docs under n tokens.
  */
case class MinMd5Shingle(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextKernel.minMd5Shingle(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextKernel.minMd5Shingle($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): MinMd5Shingle =
    copy(child = c)
}

/** `gopher_stats(text, minWords, maxWords)` → STRUCT<n_words,
  * mean_wl_c100, hash_bp, ellipsis_bp, bullet_line_bp,
  * ellipsis_line_bp, alpha_word_bp, stop_hits BIGINT, keep BOOLEAN>
  * — every Gopher quality metric and the keep decision in one
  * codegen'd pass.
  */
case class GopherStats(child: Expression, minWords: Long, maxWords: Long)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_wl_c100", LongType, nullable = false),
    StructField("hash_bp", LongType, nullable = false),
    StructField("ellipsis_bp", LongType, nullable = false),
    StructField("bullet_line_bp", LongType, nullable = false),
    StructField("ellipsis_line_bp", LongType, nullable = false),
    StructField("alpha_word_bp", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("keep", org.apache.spark.sql.types.BooleanType,
      nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextKernel.gopherStats(v.asInstanceOf[UTF8String], minWords, maxWords)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernel.gopherStats($c, ${minWords}L, ${maxWords}L)")
  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
}

/** `md5_minhash_sig(text, n, k)` → ARRAY<BIGINT> length k: the
  * foreign-verifiable k-permutation MinHash signature in one codegen'd
  * pass (see TextKernel.md5MinhashSig for the exact arithmetic).
  */
case class Md5MinhashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernel.md5MinhashSig(v.asInstanceOf[UTF8String], n, k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernel.md5MinhashSig($c, $n, $k)")
  override protected def withNewChildInternal(c: Expression): Md5MinhashSig =
    copy(child = c)
}

/** `md5_simhash(text)` → BIGINT: the foreign-verifiable SimHash
  * fingerprint in one codegen'd pass.
  */
case class Md5Simhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernel.md5Simhash(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.md5Simhash($c)")
  override protected def withNewChildInternal(c: Expression): Md5Simhash =
    copy(child = c)
}

object texthash {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def shingle_hash64(c: Column, n: Int): Column = column(ShingleHash64(expression(c), n))
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def repetition_stats(c: Column, n: Int): Column = column(RepetitionStats(expression(c), n))
  def min_md5_shingle(c: Column, n: Int): Column = column(MinMd5Shingle(expression(c), n))
  def md5_minhash_sig(c: Column, n: Int, k: Int): Column =
    column(Md5MinhashSig(expression(c), n, k))
  def md5_simhash(c: Column): Column = column(Md5Simhash(expression(c)))
  def gopher_stats(c: Column, minWords: Long, maxWords: Long): Column =
    column(GopherStats(expression(c), minWords, maxWords))
}
