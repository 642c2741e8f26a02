package graft.schema

import org.apache.spark.sql.types._

/**
 * Parser for the schema expression language of the reference engine
 * (see /root/reference/fugue/sql/_visitors.py:139-165 and
 * /root/reference/triad Schema semantics), re-targeted at Spark's
 * [[StructType]].
 *
 * Grammar (whitespace-insensitive):
 * {{{
 *   schema   := field ("," field)*
 *   field    := name ":" type
 *   type     := simple | "[" type "]" | "{" schema "}" | "<" type "," type ">"
 *   simple   := bool|byte|short|int|long|float|double|decimal(p,s)|
 *               str|string|bytes|binary|date|datetime|timestamp|...
 * }}}
 *
 * Transformer schema *hints* additionally support wildcard ops relative to
 * an input schema (/root/reference/fugue/sql/_visitors.py:125-137):
 * `*` (all input columns), `+name:type` (append), `-name` (drop).
 */
object SchemaExpr {

  /** Parse a full schema expression into a StructType. */
  def parse(expr: String): StructType = {
    val p = new Parser(expr)
    val st = p.parseSchema()
    p.expectEnd()
    st
  }

  /** Parse a single type expression, e.g. `[int]` or `{a:int}`. */
  def parseType(expr: String): DataType = {
    val p = new Parser(expr)
    val t = p.parseType()
    p.expectEnd()
    t
  }

  /** Render a StructType back to the expression language (round-trip).
   * Names that are not plain identifiers are backtick-quoted, matching
   * the parser; a name containing a backtick itself is not representable
   * in the expression language (the parser has no escape) and errors. */
  def render(st: StructType): String =
    st.fields.map(f => s"${renderName(f.name)}:${renderType(f.dataType)}").mkString(",")

  private def renderName(n: String): String = {
    require(!n.contains('`'),
      s"field name '$n' contains a backtick — not representable in a schema expression")
    val plain = n.nonEmpty && (n.head.isLetter || n.head == '_') &&
      n.forall(ch => ch.isLetterOrDigit || ch == '_')
    if (plain) n else "`" + n + "`"
  }

  def renderType(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "byte"
    case ShortType => "short"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "str"
    case BinaryType => "bytes"
    case DateType => "date"
    case TimestampType => "datetime"
    case TimestampNTZType => "datetime_ntz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"[${renderType(e)}]"
    case MapType(k, v, _) => s"<${renderType(k)},${renderType(v)}>"
    case s: StructType => s"{${render(s)}}"
    case other => other.simpleString
  }

  /**
   * Apply a transformer schema hint against an input schema.
   * Supports: plain schema (replace), `*` (keep input cols),
   * `*,new:type` (append), `-col` / `-col1,col2` (drop), `+name:type`
   * (append/overwrite), and combinations separated by commas.
   */
  def applyHint(input: StructType, hint: String): StructType = {
    var fields = Vector.empty[StructField]
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    def add(f: StructField): Unit = seen.put(f.name, f)
    // split top-level commas honoring nesting
    topLevelSplit(hint).foreach { tokRaw =>
      val tok = tokRaw.trim
      if (tok == "*") {
        input.fields.foreach(add)
      } else if (tok.startsWith("-")) {
        // drop ops may name several cols: -a or -a:b? reference uses -col
        val name = tok.drop(1).trim
        seen.remove(name)
      } else if (tok.startsWith("+")) {
        val st = parse(tok.drop(1))
        st.fields.foreach(add)
      } else if (tok.nonEmpty) {
        val st = parse(tok)
        st.fields.foreach(add)
      }
    }
    fields = seen.values.toVector
    StructType(fields)
  }

  /** Split on commas that are not nested inside [], {}, <> or () and not
   * inside backtick-quoted names (a quoted name may contain commas and
   * bracket characters — they are literal there). */
  private[schema] def topLevelSplit(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var inQuote = false
    val cur = new StringBuilder
    s.foreach {
      case '`' => inQuote = !inQuote; cur += '`'
      case c @ ('[' | '{' | '<' | '(') if !inQuote => depth += 1; cur += c
      case c @ (']' | '}' | '>' | ')') if !inQuote => depth -= 1; cur += c
      case ',' if depth == 0 && !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  private final class Parser(input: String) {
    private var pos = 0
    private def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = { skipWs(); if (pos < input.length) input(pos) else '\u0000' }
    private def eat(c: Char): Unit = {
      skipWs()
      require(pos < input.length && input(pos) == c,
        s"schema parse error: expected '$c' at $pos in '$input'")
      pos += 1
    }

    def expectEnd(): Unit = {
      skipWs()
      require(pos >= input.length, s"schema parse error: trailing input at $pos in '$input'")
    }

    private def parseName(): String = {
      skipWs()
      if (peek == '`') { // backtick-quoted names (spaces, unicode, colons)
        eat('`')
        val sb = new StringBuilder
        while (pos < input.length && input(pos) != '`') { sb += input(pos); pos += 1 }
        eat('`')
        sb.toString
      } else {
        val start = pos
        while (pos < input.length && input(pos) != ':' && input(pos) != ',' &&
          input(pos) != '}' && !input(pos).isWhitespace) pos += 1
        require(pos > start, s"schema parse error: empty name at $start in '$input'")
        input.substring(start, pos)
      }
    }

    def parseSchema(): StructType = {
      val fields = Vector.newBuilder[StructField]
      var first = true
      while ({ skipWs(); pos < input.length && peek != '}' }) {
        if (!first) eat(',')
        first = false
        val name = parseName()
        eat(':')
        val dt = parseType()
        fields += StructField(name, dt, nullable = true)
      }
      StructType(fields.result())
    }

    def parseType(): DataType = {
      skipWs()
      peek match {
        case '[' =>
          eat('['); val e = parseType(); eat(']'); ArrayType(e, containsNull = true)
        case '{' =>
          eat('{'); val s = parseSchema(); eat('}'); s
        case '<' =>
          eat('<'); val k = parseType(); eat(','); val v = parseType(); eat('>')
          MapType(k, v, valueContainsNull = true)
        case _ =>
          val start = pos
          while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
          var word = input.substring(start, pos).toLowerCase
          if (peek == '(') { // decimal(p,s)
            val pstart = pos
            var depth = 0
            while (pos < input.length && { val c = input(pos); c != ')' || depth > 1 }) {
              if (input(pos) == '(') depth += 1
              pos += 1
            }
            eat(')')
            word = word + input.substring(pstart, pos)
          }
          simpleType(word)
      }
    }

    private def simpleType(name: String): DataType = name match {
      case "bool" | "boolean" => BooleanType
      case "byte" | "int8" | "tinyint" => ByteType
      case "short" | "int16" | "smallint" => ShortType
      case "int" | "int32" | "integer" => IntegerType
      case "long" | "int64" | "bigint" => LongType
      case "uint8" | "uint16" => IntegerType // Spark has no unsigned; widen
      case "uint32" | "uint64" => LongType
      case "float" | "float32" => FloatType
      case "double" | "float64" => DoubleType
      case "str" | "string" => StringType
      case "bytes" | "binary" => BinaryType
      case "date" => DateType
      case "datetime" | "timestamp" => TimestampType
      case "datetime_ntz" | "timestamp_ntz" => TimestampNTZType
      case "null" | "void" => NullType
      case d if d.startsWith("decimal") =>
        val inner = d.stripPrefix("decimal")
        if (inner.isEmpty) DecimalType.USER_DEFAULT
        else {
          val parts = inner.stripPrefix("(").stripSuffix(")").split(",").map(_.trim.toInt)
          if (parts.length == 2) DecimalType(parts(0), parts(1)) else DecimalType(parts(0), 0)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown type '$other' in schema expression")
    }
  }
}
