package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  def shingleHash64(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
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
    new GenericArrayData(out)
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

object texthash {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def shingle_hash64(c: Column, n: Int): Column = column(ShingleHash64(expression(c), n))
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
}
