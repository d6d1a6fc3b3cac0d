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

object canon {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def clean_name(c: Column, base: String, altBase: String, prefix: String): Column =
    column(CleanName(expression(c), base, altBase, prefix))
  def canonical_url(c: Column): Column = column(CanonicalUrl(expression(c)))
  def host_of(c: Column): Column = column(HostOf(expression(c)))
}
