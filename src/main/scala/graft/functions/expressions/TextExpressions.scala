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

/**
 * `fix_mojibake(text)` → string: repair the classic double-encoding
 * corruption of web text — UTF-8 bytes mis-decoded as Latin-1/Windows-1252
 * ("café" rendered as "cafÃ©"), the single most common mojibake class in
 * crawled corpora (what the public `ftfy` library calls "encoding repair";
 * reimplemented here from the encoding math, not ported).
 *
 * Algorithm: map the string's chars back to the bytes a Latin-1/cp1252
 * mis-decode would have produced (cp1252's 27 printable remappings in the
 * 0x80–0x9F block included — a pure-Latin-1 inverse misses "â€™"-class
 * mojibake, which contains U+20AC/U+2122-style chars), then STRICT-decode
 * those bytes as UTF-8. Only if every char maps to a byte AND the bytes
 * form valid UTF-8 that actually used a multi-byte sequence is the
 * repaired string returned; otherwise the input passes through unchanged.
 * The gate makes the repair conservative: genuine Latin-1 text ("résumé")
 * stays untouched because lone 0xC3/0xA9-class bytes don't form valid
 * UTF-8 sequences by accident in natural text, and pure-ASCII short-
 * circuits before any allocation. Applied iteratively (max 3 rounds) for
 * doubly-corrupted text.
 *
 * Native expression so the repair runs inside whole-stage codegen beside
 * the other text kernels.
 */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fix_mojibake requires a string column, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    FixMojibake.repair(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.expressions.FixMojibake$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""${ev.value} = $obj.repair($c);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `deflate_ratio(text)` → double: compressed-size / raw-size of the
 * string's UTF-8 bytes under raw DEFLATE at a fixed level (6). The
 * compression-ratio quality signal of web-corpus curation (one of the
 * Gopher/RefinedWeb-family heuristics): machine-generated or boilerplate-
 * heavy text compresses far better than natural prose, and binary noise
 * compresses worse, so pipelines drop documents outside a ratio band.
 *
 * Fixed parameters (level 6, raw/nowrap stream) make the signal stable
 * across runs; zlib's DEFLATE is deterministic for a given input, level,
 * and strategy. Empty strings define ratio = 1.0. Cost is O(bytes) per
 * row with a 32 KB window — a narrow, shuffle-free map.
 *
 * Native expression (not a UDF) so it runs inside whole-stage codegen;
 * one `Deflater` is allocated per evaluation and released in `finally`
 * (the JDK object carries native zlib state — leaking it would exhaust
 * native memory on a 100 TB scan).
 */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio requires a string column, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    DeflateRatio.ratio(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.expressions.DeflateRatio$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""${ev.value} = $obj.ratio($c);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DeflateRatio {
  private val Level = 6

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(Level, /*nowrap=*/ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

object FixMojibake {
  /** cp1252's printable remappings of the 0x80–0x9F block: char → the byte
   * that mis-decoded to it (the other 5 positions are undefined in cp1252
   * and pass through as their Latin-1 identity). Public table from the
   * Windows-1252 standard. */
  private val Cp1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  private val MaxRounds = 3

  def repair(s: UTF8String): UTF8String = {
    val orig = s.toString
    var cur = orig
    var rounds = 0
    var changed = true
    while (changed && rounds < MaxRounds) {
      changed = false
      repairOnce(cur) match {
        case Some(fixed) => cur = fixed; changed = true
        case None =>
      }
      rounds += 1
    }
    if (cur eq orig) s else UTF8String.fromString(cur)
  }

  /** One round of repair; None if the string is not mojibake. */
  private def repairOnce(str: String): Option[String] = {
    val n = str.length
    var hasHigh = false
    var i = 0
    while (i < n && !hasHigh) { if (str.charAt(i) > 0x7F) hasHigh = true; i += 1 }
    if (!hasHigh) return None // pure ASCII: nothing to repair
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      val b =
        if (c <= 0xFF) c.toInt
        else Cp1252Inverse.getOrElse(c, -1)
      if (b < 0) return None // char no mis-decode could produce
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // require an actual multi-byte sequence: a Latin-1 string whose high
      // bytes happen to be ASCII-free but decode-valid would be mangled
      if (out.length < n) Some(out) else None
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
    }
  }
}
