package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `normalize_unicode(text, form)` → string: Unicode normalization via the
 * JDK's `java.text.Normalizer` (public API, no new dependency). The raw-web
 * companion of [[graft.functions.TextFunctions.cleanText]]: the same logical
 * text arrives from the web in composed (NFC) and decomposed (NFD) forms —
 * `café` vs `cafe` + U+0301 — and every downstream exact/fuzzy dedup,
 * fingerprint, token count, and vocabulary treats them as different bytes
 * unless the corpus is normalized first. NFC is the curation default;
 * NFKC additionally folds compatibility characters (ligatures, fullwidth
 * forms) into their plain equivalents, which changes rendering and is
 * opt-in.
 *
 * Native expression (not a UDF) so the normalization runs inside
 * whole-stage codegen next to the other text kernels. The JDK normalizer
 * implements the Unicode standard's canonical algorithm, so results agree
 * with any other conformant implementation (DuckDB's `nfc_normalize`
 * oracles the NFC path in conformance query t27).
 */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  NormalizeUnicode.requireForm(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode requires a string column, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    NormalizeUnicode.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.expressions.NormalizeUnicode$.MODULE$"
    // `form` is validated against the fixed enum set at construction, so
    // embedding it as a Java string literal is safe
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $obj.normalize($c, "$form");""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeUnicode {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def requireForm(form: String): Unit =
    require(Forms.contains(form),
      s"normalize_unicode: form must be one of ${Forms.mkString("/")}, got '$form'")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // the common case — already normalized ASCII/NFC text — costs one
    // quick-check scan and zero allocation
    if (Normalizer.isNormalized(str, Normalizer.Form.valueOf(form))) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.valueOf(form)))
  }
}
