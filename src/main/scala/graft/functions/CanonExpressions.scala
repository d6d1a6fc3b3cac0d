package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String-level adapters so generated code can call the kernel with
  * a single static method call (kept inside whole-stage codegen).
  */
object CanonKernel {
  def cleanName(link: UTF8String, base: String, altBase: String, prefix: String): UTF8String =
    if (link == null) null
    else UTF8String.fromString(GoUrl.cleanName(link.toString, base, altBase, prefix))

  def canonicalUrl(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(GoUrl.canonicalUrl(url.toString))

  def hostOf(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(GoUrl.hostOf(url.toString))
}

/** `clean_name(link)` — byte-exact reference CleanUrl
  * (wikipedia/wiki.go:63-75 and per-site variants), parameterized by
  * the site profile's prefixes. Codegen-friendly: emits one static
  * call, so it stays inside WholeStageCodegen spans.
  */
case class CleanName(child: Expression, base: String, altBase: String, prefix: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    CanonKernel.cleanName(v.asInstanceOf[UTF8String], base, altBase, prefix)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val baseRef = ctx.addReferenceObj("base", base, "java.lang.String")
    val altRef = ctx.addReferenceObj("altBase", altBase, "java.lang.String")
    val prefRef = ctx.addReferenceObj("prefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CanonKernel.cleanName($c, $baseRef, $altRef, $prefRef)")
  }
  override protected def withNewChildInternal(c: Expression): CleanName = copy(child = c)
}

/** `canonical_url(url)` — north_rule canonicalization: lowercase
  * scheme/host, strip fragment + default port, sort query params.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    CanonKernel.canonicalUrl(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonKernel.canonicalUrl($c)")
  override protected def withNewChildInternal(c: Expression): CanonicalUrl = copy(child = c)
}

/** `host_of(url)` — lowercased host component ("" for relative URLs). */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    CanonKernel.hostOf(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonKernel.hostOf($c)")
  override protected def withNewChildInternal(c: Expression): HostOf = copy(child = c)
}

/** A public-suffix rule list (publicsuffix.org format) compiled for
  * per-row lookup: exact rules, `*.` wildcard rules (the `*` matches
  * exactly one label) and `!` exception rules. The prevailing rule is
  * the exception if one matches, else the longest match, else the
  * implicit `*` default (the bare TLD is a public suffix). The real
  * list is ~10k short strings — it ships inside the expression as a
  * codegen reference object, so the lookup is a handful of hash
  * probes per row: no join, no shuffle, no broadcast variable.
  */
final class PublicSuffixRules(rules: Seq[String]) extends Serializable {
  private val exact = new java.util.HashSet[String]
  private val wildcard = new java.util.HashSet[String] // "*.ck" keyed as "ck"
  private val exception = new java.util.HashSet[String] // "!www.ck" keyed as "www.ck"
  rules.iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).foreach { r =>
    if (r.startsWith("!")) exception.add(r.substring(1))
    else if (r.startsWith("*.")) wildcard.add(r.substring(2))
    else exact.add(r)
  }

  /** Label index where the public suffix starts, or -1 for an empty
    * host. `chains(i)` is the dot-joined suffix starting at label i.
    */
  private def psStart(chains: Array[String]): Int = {
    val n = chains.length
    if (n == 0) return -1
    var i = 0
    while (i < n) { // exceptions prevail; ps = rule minus its first label
      if (exception.contains(chains(i))) return i + 1
      i += 1
    }
    i = 0
    while (i < n) { // longest match = smallest start index
      if (exact.contains(chains(i))) return i
      if (i + 1 < n && wildcard.contains(chains(i + 1))) return i
      i += 1
    }
    n - 1 // implicit "*" default rule
  }

  private def chainsOf(host: String): Array[String] = {
    if (host == null || host.isEmpty) return Array.empty
    val labels = host.split('.')
    val out = new Array[String](labels.length)
    var i = labels.length - 1
    var acc = ""
    while (i >= 0) {
      acc = if (acc.isEmpty) labels(i) else labels(i) + "." + acc
      out(i) = acc
      i -= 1
    }
    out
  }

  /** Registrable domain (eTLD+1) of a lowercased host; null when the
    * host is empty or is itself a public suffix. */
  def regDomainU(host: UTF8String): UTF8String = {
    val chains = chainsOf(host.toString)
    val start = psStart(chains)
    if (start <= 0) null else UTF8String.fromString(chains(start - 1))
  }

  /** The public suffix itself; null for an empty host. */
  def publicSuffixU(host: UTF8String): UTF8String = {
    val chains = chainsOf(host.toString)
    val start = psStart(chains)
    if (start < 0) null else UTF8String.fromString(chains(start))
  }
}

/** `reg_domain(host)` — registrable domain (eTLD+1) under a
  * public-suffix rule list. Input is a HOST (compose with
  * [[HostOf]] for URLs); NULL when the host is empty or is itself a
  * public suffix. Per-host politeness, host-graph projection and
  * dedup-by-site all want this granularity — one site, not one
  * subdomain — and as a per-row expression it costs no shuffle where
  * the equi-join encoding of the same lookup would repartition the
  * corpus.
  */
case class RegDomain(child: Expression, rules: Seq[String]) extends UnaryExpression {
  @transient private lazy val compiled = new PublicSuffixRules(rules)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    compiled.regDomainU(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psl", compiled, classOf[PublicSuffixRules].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.regDomainU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): RegDomain = copy(child = c)
}

/** `public_suffix(host)` — the matched public suffix (eTLD) itself,
  * under the same rule semantics as [[RegDomain]].
  */
case class PublicSuffix(child: Expression, rules: Seq[String]) extends UnaryExpression {
  @transient private lazy val compiled = new PublicSuffixRules(rules)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    compiled.publicSuffixU(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psl", compiled, classOf[PublicSuffixRules].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.publicSuffixU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): PublicSuffix = copy(child = c)
}

object canon {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def clean_name(c: Column, base: String, altBase: String, prefix: String): Column =
    column(CleanName(expression(c), base, altBase, prefix))
  def canonical_url(c: Column): Column = column(CanonicalUrl(expression(c)))
  def host_of(c: Column): Column = column(HostOf(expression(c)))
  def reg_domain(c: Column, rules: Seq[String]): Column =
    column(RegDomain(expression(c), rules))
  def public_suffix(c: Column, rules: Seq[String]): Column =
    column(PublicSuffix(expression(c), rules))
}
