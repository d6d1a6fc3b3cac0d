package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the custom Catalyst expressions: `spark.sql` users
  * get the same codegen'd kernels the Column API exposes —
  * `shingle_hash64`, `nfc_normalize`, `repetition_stats`,
  * `min_md5_shingle`, `dot_product`, `clean_name`, `canonical_url`,
  * `host_of`.
  * Non-column parameters (gram size, site bases/prefixes) must be
  * foldable literals, exactly like Spark's own parameterized builtins.
  *
  * Register at session build time via
  * `spark.sql.extensions=graft.GraftExtensions`, or into a live
  * session with [[SqlFunctions.register]].
  */
object SqlFunctions {

  private def strLit(e: Expression, fn: String, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case Literal(null, StringType) => ""
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got $e")
  }

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $e")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (args: Seq[Expression]) => builder(args))

  /** every graft SQL function: (identifier, info, builder) */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    fn("shingle_hash64",
      "shingle_hash64(text, n) - xxhash64 values of the word n-gram shingles") { args =>
      arity("shingle_hash64", 2, args)
      ShingleHash64(args.head, intLit(args(1), "shingle_hash64", "n"))
    },
    fn("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC normalization (identity on ASCII)") { args =>
      arity("nfc_normalize", 1, args)
      NfcNormalize(args.head)
    },
    fn("repetition_stats",
      "repetition_stats(text, n) - struct(n_grams, max_cnt, dup) of the n-gram multiset") { args =>
      arity("repetition_stats", 2, args)
      RepetitionStats(args.head, intLit(args(1), "repetition_stats", "n"))
    },
    fn("min_md5_shingle",
      "min_md5_shingle(text, n) - min-wise MD5 word n-gram fingerprint") { args =>
      arity("min_md5_shingle", 2, args)
      MinMd5Shingle(args.head, intLit(args(1), "min_md5_shingle", "n"))
    },
    fn("dot_product",
      "dot_product(a, b) - dot product of two float/double array embeddings") { args =>
      arity("dot_product", 2, args)
      DotProduct(args.head, args(1))
    },
    fn("clean_name",
      "clean_name(link, base, alt_base, prefix) - the reference CleanUrl chain") { args =>
      arity("clean_name", 4, args)
      CleanName(args.head,
        strLit(args(1), "clean_name", "base"),
        strLit(args(2), "clean_name", "alt_base"),
        strLit(args(3), "clean_name", "prefix"))
    },
    fn("canonical_url",
      "canonical_url(url) - north-rule URL canonicalization") { args =>
      arity("canonical_url", 1, args)
      CanonicalUrl(args.head)
    },
    fn("host_of",
      "host_of(url) - lowercased host component") { args =>
      arity("host_of", 1, args)
      HostOf(args.head)
    },
    fn("reg_domain",
      "reg_domain(host, rules) - registrable domain (eTLD+1); rules is a " +
        "comma-joined public-suffix list ('com,co.uk,*.ck,!www.ck')") { args =>
      arity("reg_domain", 2, args)
      RegDomain(args.head,
        strLit(args(1), "reg_domain", "rules").split(',').toSeq)
    },
    fn("public_suffix",
      "public_suffix(host, rules) - matched public suffix (eTLD) under the " +
        "comma-joined rule list") { args =>
      arity("public_suffix", 2, args)
      PublicSuffix(args.head,
        strLit(args(1), "public_suffix", "rules").split(',').toSeq)
    },
    fn("gopher_stats",
      "gopher_stats(text, min_words, max_words) - Gopher quality metrics " +
        "struct + keep decision in one pass") { args =>
      arity("gopher_stats", 3, args)
      GopherStats(args.head,
        intLit(args(1), "gopher_stats", "min_words").toLong,
        intLit(args(2), "gopher_stats", "max_words").toLong)
    },
    fn("md5_minhash_sig",
      "md5_minhash_sig(text, n, k) - foreign-verifiable k-permutation " +
        "MinHash signature over 20-bit md5 shingle hashes") { args =>
      arity("md5_minhash_sig", 3, args)
      Md5MinhashSig(args.head, intLit(args(1), "md5_minhash_sig", "n"),
        intLit(args(2), "md5_minhash_sig", "k"))
    },
    fn("md5_simhash",
      "md5_simhash(text) - foreign-verifiable 64-bit SimHash over " +
        "md5 token hashes") { args =>
      arity("md5_simhash", 1, args)
      Md5Simhash(args.head)
    })

  /** Register into a live session (the config-free path; the
    * `spark.sql.extensions` path uses [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunctions(spark, all)
}
