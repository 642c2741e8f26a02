package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Schema-driven Avro RECORD decode (m54) — the value rung of the Avro
 * ladder (m35 census → m49 block extraction + string records → here),
 * and the exact analog of what m50/m53 are for parquet/ORC: the
 * metadata walks locate blocks, this decodes the records inside them,
 * from first principles, for the FULL Avro type system:
 *
 *   - primitives `null boolean int long float double bytes string`
 *     (ints/longs zigzag-varint, floats/doubles little-endian IEEE
 *     754, strings strict REPORT-mode UTF-8 — invalid sequences are
 *     corruption evidence, never U+FFFD);
 *   - `enum` (varint symbol index, bounds-checked) and `fixed`;
 *   - `array` and `map` in full block form (a NEGATIVE item count is
 *     followed by a byte size per the spec — honored and strided);
 *   - unions (varint branch index, bounds-checked); for the DataFrame
 *     surface the branch set must be `null`+one type (a nullable
 *     column) — the only union shape with a faithful relational type;
 *   - nested `record`s, and NAMED-TYPE REFERENCES (a record/enum/fixed
 *     defined once and referenced by name later — the shape Iceberg
 *     manifest schemas use).
 *
 * The reader declares the schema it expects (the Avro reader-schema
 * concept) and the file's embedded writer schema must structurally
 * EQUAL it — schema resolution/evolution is out of scope, and a file
 * written under a different contract refuses rather than half-maps.
 * Strictness per the family: every block must decode EXACTLY its
 * declared record count and consume its payload exactly; any bounds
 * overrun, bad enum/union index, invalid UTF-8, or non-0/1 boolean
 * byte refuses the file (zero rows), never a partial row.
 *
 * Forged-count defense: a collection count is only believed if the
 * remaining payload could hold that many items (each item's minimum
 * encoded size from the schema); zero-minimum item types (records of
 * nulls) are capped outright — a crafted 1e9-element array of nulls
 * cannot balloon the heap.
 *
 * Schema JSON is parsed with Jackson's tree model (on every Spark
 * classpath, the [[Json]] precedent); datum decoding itself is all
 * from the Avro 1.11 binary-encoding spec. Narrow mapPartitions,
 * zero exchanges.
 */
object AvroRecord {

  // ---------------------------------------------------------------
  // Schema AST
  // ---------------------------------------------------------------

  sealed trait AvType
  case object ANull extends AvType
  case object ABool extends AvType
  case object AInt extends AvType
  case object ALong extends AvType
  case object AFloat extends AvType
  case object ADouble extends AvType
  case object ABytes extends AvType
  case object AString extends AvType
  final case class AEnum(name: String, symbols: IndexedSeq[String]) extends AvType
  final case class AFixed(name: String, size: Int) extends AvType
  final case class AArray(items: AvType) extends AvType
  final case class AMap(values: AvType) extends AvType
  final case class AUnion(branches: IndexedSeq[AvType]) extends AvType
  final case class ARecord(name: String,
      fields: IndexedSeq[(String, AvType)]) extends AvType

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse an Avro schema JSON document into the AST. None on
   * malformed JSON, unknown types, unresolved name references,
   * non-positive fixed sizes, or empty enums. Named types
   * (record/enum/fixed) are registered under both their full name
   * (`namespace.name`) and bare name and may be referenced later —
   * last definition wins on a bare-name collision. */
  def parseSchema(json: String): Option[AvType] = {
    if (json == null) return None
    val root =
      try mapper.readTree(json)
      catch { case _: com.fasterxml.jackson.core.JacksonException => return None }
    if (root == null) return None
    val env = scala.collection.mutable.Map.empty[String, AvType]
    parseNode(root, env, None)
  }

  private def primitive(s: String): Option[AvType] = s match {
    case "null" => Some(ANull)
    case "boolean" => Some(ABool)
    case "int" => Some(AInt)
    case "long" => Some(ALong)
    case "float" => Some(AFloat)
    case "double" => Some(ADouble)
    case "bytes" => Some(ABytes)
    case "string" => Some(AString)
    case _ => None
  }

  private def parseNode(n: com.fasterxml.jackson.databind.JsonNode,
      env: scala.collection.mutable.Map[String, AvType],
      ns: Option[String]): Option[AvType] = {
    if (n.isTextual) {
      val s = n.asText()
      primitive(s).orElse(env.get(s))
        .orElse(ns.flatMap(p => env.get(p + "." + s)))
    } else if (n.isArray) { // union
      val bs = scala.collection.mutable.ArrayBuffer.empty[AvType]
      val it = n.elements()
      while (it.hasNext) {
        parseNode(it.next(), env, ns) match {
          case Some(t) => bs += t
          case None => return None
        }
      }
      if (bs.isEmpty) None else Some(AUnion(bs.toIndexedSeq))
    } else if (n.isObject) {
      val tn = n.get("type")
      if (tn == null || !tn.isTextual) return None
      val myNs = Option(n.get("namespace")).filter(_.isTextual)
        .map(_.asText()).orElse(ns)
      def register(name: String, t: AvType): AvType = {
        env(name) = t
        myNs.foreach(p => env(p + "." + name) = t)
        t
      }
      tn.asText() match {
        case "record" =>
          val name = Option(n.get("name")).filter(_.isTextual).map(_.asText())
            .getOrElse(return None)
          val fn = n.get("fields")
          if (fn == null || !fn.isArray) return None
          val fields = scala.collection.mutable.ArrayBuffer.empty[(String, AvType)]
          val it = fn.elements()
          while (it.hasNext) {
            val f = it.next()
            val fname = Option(f.get("name")).filter(_.isTextual)
              .map(_.asText()).getOrElse(return None)
            val ft = f.get("type")
            if (ft == null) return None
            parseNode(ft, env, myNs) match {
              case Some(t) => fields += ((fname, t))
              case None => return None
            }
          }
          Some(register(name, ARecord(name, fields.toIndexedSeq)))
        case "enum" =>
          val name = Option(n.get("name")).filter(_.isTextual).map(_.asText())
            .getOrElse(return None)
          val sn = n.get("symbols")
          if (sn == null || !sn.isArray) return None
          val syms = scala.collection.mutable.ArrayBuffer.empty[String]
          val it = sn.elements()
          while (it.hasNext) {
            val s = it.next()
            if (!s.isTextual) return None
            syms += s.asText()
          }
          if (syms.isEmpty) None
          else Some(register(name, AEnum(name, syms.toIndexedSeq)))
        case "fixed" =>
          val name = Option(n.get("name")).filter(_.isTextual).map(_.asText())
            .getOrElse(return None)
          val sz = n.get("size")
          if (sz == null || !sz.canConvertToInt) return None
          val size = sz.asInt()
          if (size < 0 || size > (1 << 26)) None
          else Some(register(name, AFixed(name, size)))
        case "array" =>
          val in = n.get("items")
          if (in == null) None else parseNode(in, env, myNs).map(AArray(_))
        case "map" =>
          val vn = n.get("values")
          if (vn == null) None else parseNode(vn, env, myNs).map(AMap(_))
        case other => // {"type": "long", ...} wrapper form (logical types)
          primitive(other).orElse(env.get(other))
            .orElse(myNs.flatMap(p => env.get(p + "." + other)))
      }
    } else None
  }

  // ---------------------------------------------------------------
  // Binary datum decode (Avro 1.11 binary encoding)
  // ---------------------------------------------------------------

  /** Minimum encoded byte size of one datum of type `t` — the
   * forged-count guard's denominator. Recursive record types (via
   * named refs) bottom out at 0 through the visited set. */
  private[functions] def minSize(t: AvType,
      seen: Set[AvType] = Set.empty): Long = t match {
    case ANull => 0L
    case ABool => 1L
    case AInt | ALong => 1L
    case AFloat => 4L
    case ADouble => 8L
    case ABytes | AString => 1L // the length varint
    case AEnum(_, _) => 1L
    case AFixed(_, size) => size.toLong
    case AArray(_) | AMap(_) => 1L // the terminating 0 count
    case AUnion(bs) =>
      if (seen.contains(t)) 0L
      else 1L + bs.map(minSize(_, seen + t)).min
    case ARecord(_, fs) =>
      if (seen.contains(t)) 0L
      else fs.map(f => minSize(f._2, seen + t)).sum
  }

  /** Cap for collections whose item type has a zero minimum size. */
  private val ZeroSizeItemCap = 1L << 20

  /** Decoded scala value per type: null, Boolean, Int, Long, Float,
   * Double, Array[Byte] (bytes/fixed), String (string/enum symbol),
   * Vector[Any] (array), Vector[(String, Any)] in encounter order
   * (map), Vector[(String, Any)] (record fields). Returns
   * (value, nextPos) or null on any malformation. */
  def decodeDatum(b: Array[Byte], pos: Int, end: Int,
      t: AvType): (Any, Int) = t match {
    case ANull => (null, pos)
    case ABool =>
      if (pos >= end) null
      else b(pos) match {
        case 0 => (java.lang.Boolean.FALSE, pos + 1)
        case 1 => (java.lang.Boolean.TRUE, pos + 1)
        case _ => null // any other byte is corruption, not truthiness
      }
    case AInt =>
      val v = varlong(b, pos, end)
      if (v == null || v._1 < Int.MinValue || v._1 > Int.MaxValue) null
      else (Int.box(v._1.toInt), v._2)
    case ALong =>
      val v = varlong(b, pos, end)
      if (v == null) null else (Long.box(v._1), v._2)
    case AFloat =>
      if (end - pos < 4) null
      else {
        val bits = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
          ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
        (Float.box(java.lang.Float.intBitsToFloat(bits)), pos + 4)
      }
    case ADouble =>
      if (end - pos < 8) null
      else {
        var bits = 0L
        var i = 0
        while (i < 8) { bits |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
        (Double.box(java.lang.Double.longBitsToDouble(bits)), pos + 8)
      }
    case ABytes =>
      val l = varlong(b, pos, end)
      if (l == null || l._1 < 0 || l._1 > end - l._2) null
      else (java.util.Arrays.copyOfRange(b, l._2, l._2 + l._1.toInt),
        l._2 + l._1.toInt)
    case AString =>
      val l = varlong(b, pos, end)
      if (l == null || l._1 < 0 || l._1 > end - l._2) null
      else {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try (dec.decode(java.nio.ByteBuffer.wrap(b, l._2, l._1.toInt))
          .toString, l._2 + l._1.toInt)
        catch { case _: java.nio.charset.CharacterCodingException => null }
      }
    case AEnum(_, symbols) =>
      val v = varlong(b, pos, end)
      if (v == null || v._1 < 0 || v._1 >= symbols.size) null
      else (symbols(v._1.toInt), v._2)
    case AFixed(_, size) =>
      if (end - pos < size) null
      else (java.util.Arrays.copyOfRange(b, pos, pos + size), pos + size)
    case AUnion(branches) =>
      val v = varlong(b, pos, end)
      if (v == null || v._1 < 0 || v._1 >= branches.size) null
      else decodeDatum(b, v._2, end, branches(v._1.toInt))
    case AArray(items) =>
      decodeBlocks(b, pos, end, items, null)
    case AMap(values) =>
      decodeBlocks(b, pos, end, values, AString)
    case ARecord(_, fields) =>
      val out = Vector.newBuilder[(String, Any)]
      var p = pos
      var i = 0
      while (i < fields.size) {
        val d = decodeDatum(b, p, end, fields(i)._2)
        if (d == null) return null
        out += ((fields(i)._1, d._1))
        p = d._2
        i += 1
      }
      (out.result(), p)
  }

  /** Shared array/map block-sequence walk. `keyType` null → array
   * (yields Vector[Any]); non-null → map (yields
   * Vector[(String, Any)], encounter order). */
  private def decodeBlocks(b: Array[Byte], pos: Int, end: Int,
      itemType: AvType, keyType: AvType): (Any, Int) = {
    val isMap = keyType != null
    val arr = if (isMap) null else Vector.newBuilder[Any]
    val map = if (isMap) Vector.newBuilder[(String, Any)] else null
    val itemMin = minSize(itemType) + (if (isMap) 1L else 0L)
    var p = pos
    var total = 0L
    while (true) {
      val c = varlong(b, p, end)
      if (c == null) return null
      p = c._2
      var n = c._1
      if (n == 0L) {
        return (if (isMap) map.result() else arr.result(), p)
      }
      if (n < 0L) { // block-size form: a long byte size follows
        if (n == Long.MinValue) return null
        n = -n
        val sz = varlong(b, p, end)
        if (sz == null || sz._1 < 0 || sz._1 > end - sz._2) return null
        p = sz._2
      }
      // forged-count guard: the remaining payload must be able to
      // hold n items of the item type's minimum size
      if (itemMin > 0) { if (n > (end - p) / itemMin) return null }
      else if (total + n > ZeroSizeItemCap) return null
      var i = 0L
      while (i < n) {
        if (isMap) {
          val k = decodeDatum(b, p, end, AString)
          if (k == null) return null
          val v = decodeDatum(b, k._2, end, itemType)
          if (v == null) return null
          map += ((k._1.asInstanceOf[String], v._1))
          p = v._2
        } else {
          val v = decodeDatum(b, p, end, itemType)
          if (v == null) return null
          arr += v._1
          p = v._2
        }
        i += 1
      }
      total += n
    }
    null // unreachable
  }

  /** Zigzag varint (duplicated from [[Avro]]'s private form — kept
   * local so each walker stays self-contained). */
  private def varlong(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (p < end && shift <= 63) {
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return ((v >>> 1) ^ -(v & 1), p)
      shift += 7
    }
    null
  }

  /** Decode a block payload of EXACTLY `expected` records of `schema`;
   * the walk must consume the payload exactly. */
  def decodeRecordBlock(data: Array[Byte], expected: Long,
      schema: ARecord): Option[IndexedSeq[Vector[(String, Any)]]] = {
    if (data == null || expected < 0) return None
    val out = IndexedSeq.newBuilder[Vector[(String, Any)]]
    var pos = 0
    var n = 0L
    while (n < expected) {
      val d = decodeDatum(data, pos, data.length, schema)
      if (d == null) return None
      out += d._1.asInstanceOf[Vector[(String, Any)]]
      pos = d._2
      n += 1
    }
    if (pos != data.length) None else Some(out.result())
  }

  // ---------------------------------------------------------------
  // Spark surface
  // ---------------------------------------------------------------

  /** Faithful Spark type of an Avro type, or None where no single
   * relational type exists (general unions, null-only columns). */
  def sparkTypeOf(t: AvType): Option[DataType] = t match {
    case ANull => None
    case ABool => Some(BooleanType)
    case AInt => Some(IntegerType)
    case ALong => Some(LongType)
    case AFloat => Some(FloatType)
    case ADouble => Some(DoubleType)
    case ABytes => Some(BinaryType)
    case AString => Some(StringType)
    case AEnum(_, _) => Some(StringType)
    case AFixed(_, _) => Some(BinaryType)
    case AArray(items) => sparkTypeOf(items).map(ArrayType(_, true))
    case AMap(values) => sparkTypeOf(values).map(MapType(StringType, _, true))
    case AUnion(bs) =>
      val nonNull = bs.filter(_ != ANull)
      if (nonNull.size == 1) sparkTypeOf(nonNull.head) else None
    case ARecord(_, fields) =>
      val fts = fields.map { case (n, ft) => sparkTypeOf(ft).map(StructField(n, _, true)) }
      if (fts.exists(_.isEmpty)) None
      else Some(StructType(fts.map(_.get)))
  }

  /** Decoded Avro value → the Row-encoder value for its Spark type. */
  private def toSparkValue(v: Any, t: AvType): Any = v match {
    case null => null
    case vec: Vector[_] => t match {
      case AArray(items) =>
        vec.map(toSparkValue(_, items))
      case AMap(values) =>
        vec.asInstanceOf[Vector[(String, Any)]]
          .map { case (k, x) => (k, toSparkValue(x, values)) }.toMap
      case ARecord(_, fields) =>
        Row.fromSeq(vec.asInstanceOf[Vector[(String, Any)]]
          .zip(fields).map { case ((_, x), (_, ft)) => toSparkValue(x, ft) })
      case AUnion(bs) =>
        toSparkValue(v, bs.filter(_ != ANull).head)
      case _ => vec
    }
    case other => t match {
      case AUnion(bs) => toSparkValue(other, bs.filter(_ != ANull).head)
      case _ => other
    }
  }

  /**
   * One row per record of every block of every OCF payload, decoded
   * under `readerSchemaJson` — which must parse to a record whose
   * Spark projection exists, and which every file's embedded writer
   * schema must structurally equal. Output: (idCol, block_no, rec_no,
   * codec, record fields...). STRICT per file: any block that fails
   * to extract or decode, a schema mismatch, or an absent/unparseable
   * writer schema refuses the whole file (zero rows). Narrow
   * mapPartitions; blocks are re-fetched through
   * [[Avro.extractBlockAt]] — the ranged-GET path — so this is also a
   * continuous replay of the m49 locator contract.
   */
  def decodeRecords(df: DataFrame, idCol: String, payloadCol: String,
      readerSchemaJson: String): DataFrame = {
    val reader = parseSchema(readerSchemaJson) match {
      case Some(r: ARecord) => r
      case _ => throw new IllegalArgumentException(
        "reader schema must be an Avro record")
    }
    val projected = sparkTypeOf(reader) match {
      case Some(s: StructType) => s
      case _ => throw new IllegalArgumentException(
        "reader schema has no faithful relational projection")
    }
    val meta = Seq("block_no", "rec_no", "codec")
    require(projected.fieldNames.forall(f => !meta.contains(f) && f != idCol),
      s"record field names must not collide with ${idCol}/${meta.mkString("/")}")
    val outSchema = StructType(
      StructField(idCol, LongType) +:
      StructField("block_no", IntegerType) +:
      StructField("rec_no", IntegerType) +:
      StructField("codec", StringType) +:
      projected.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = if (r.isNullAt(pIdx)) null
          else r.get(pIdx).asInstanceOf[Array[Byte]]
        decodeFile(payload, reader) match {
          case Some((codec, recs)) =>
            recs.iterator.map { case (bi, ri, fields) =>
              Row.fromSeq(id.toLong +: bi +: ri +: codec +:
                fields.zip(reader.fields).map { case ((_, v), (_, ft)) =>
                  toSparkValue(v, ft)
                })
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------
  // Fixtures (real Avro library writer — the m49 differential posture)
  // ---------------------------------------------------------------

  /** The m54 record schema: every Avro type — primitives (`ver` goes
   * negative to pin zigzag), a nullable union, enum, bytes, fixed
   * (defined once, REFERENCED by name as `fp2`), array, map, and a
   * nested record. */
  val docSchemaJson: String =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"rid","type":"long"},
      |{"name":"ver","type":"int"},
      |{"name":"lang","type":["null","string"]},
      |{"name":"score","type":"double"},
      |{"name":"ratio","type":"float"},
      |{"name":"flag","type":"boolean"},
      |{"name":"cat","type":{"type":"enum","name":"Cat","symbols":["c0","c1","c2","c3","c4"]}},
      |{"name":"blob","type":"bytes"},
      |{"name":"fp","type":{"type":"fixed","name":"Fp","size":8}},
      |{"name":"fp2","type":"Fp"},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"props","type":{"type":"map","values":"long"}},
      |{"name":"pos","type":{"type":"record","name":"Pos","fields":[
      |{"name":"x","type":"long"},{"name":"y","type":"long"}]}}
      |]}""".stripMargin

  /** The contract-drift variant (no `ver` field) — files written under
   * it must REFUSE against the [[docSchemaJson]] reader. */
  val driftSchemaJson: String = docSchemaJson.replace(
    """{"name":"ver","type":"int"},""" + "\n", "")

  /**
   * Deterministic full-type-system OCF fixture written by the REAL
   * Avro `DataFileWriter` (codec rotating null/deflate/snappy/
   * zstandard/xz/bzip2 by `id%6`, deterministic sync, `1 + id%3`
   * blocks of `1 + (id+k)%3` records forced by `writer.sync()`).
   * Record j of block k:
   *
   *   - `rid` = `id*1000 + k*100 + j`; `ver` = `id%1000 - 500 + j`
   *     (negative for small ids — zigzag pinned);
   *   - `lang` = null when `(id+j)%3 == 2` else `l<(id+j)%7>`;
   *   - `score` = `id%100 + j*0.25`; `ratio` = `((id+j)%16)/4.0`
   *     (both exactly representable — float equality is exact);
   *   - `flag` = `(id+k+j)%2 == 0`; `cat` = `c<(id+j)%5>`;
   *   - `blob` = `id%5 + j%3` bytes, byte n = `(id + n*13) & 0xff`;
   *   - `fp` byte n = `(id*7 + j + n) & 0xff`; `fp2` byte n =
   *     `(id + j*3 + n*5) & 0xff`;
   *   - `tags` = `j%3` strings `t<(id+n)%9>`;
   *   - `props` = `(id+j)%3` entries `p<n>` → `id%50 + n*7`;
   *   - `pos` = record `(x = id+j, y = id-j)`.
   *
   * Negatives: `id%9 == 4` flips a final-sync byte (parseOcf refuses —
   * splice evidence); `id%11 == 6` writes under [[driftSchemaJson]]
   * (schema-contract drift — the typed decode must refuse, zero rows,
   * never a silently ver-less row).
   */
  def syntheticRecordAvro(id: Long): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val drifted = id % 11 == 6
    val schema = new org.apache.avro.Schema.Parser()
      .parse(if (drifted) driftSchemaJson else docSchemaJson)
    val catSchema = schema.getField("cat").schema()
    val fpSchema = schema.getField("fp").schema()
    val posSchema = schema.getField("pos").schema()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    (id % 6) match {
      case 0 => w.setCodec(org.apache.avro.file.CodecFactory.nullCodec())
      case 1 => w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      case 2 => w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      case 3 => w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
      case 4 => w.setCodec(org.apache.avro.file.CodecFactory.xzCodec(3))
      case _ => w.setCodec(org.apache.avro.file.CodecFactory.bzip2Codec())
    }
    val bo = new java.io.ByteArrayOutputStream()
    val sync = Array.tabulate(16)(j => ((id * 37 + j * 11) & 0xff).toByte)
    w.create(schema, bo, sync)
    val nBlocks = (1 + id % 3).toInt
    (0 until nBlocks).foreach { k =>
      (0 until (1 + (id + k) % 3).toInt).foreach { j =>
        val rec = new GenericData.Record(schema)
        rec.put("rid", id * 1000 + k * 100 + j)
        if (!drifted) rec.put("ver", (id % 1000).toInt - 500 + j)
        rec.put("lang",
          if ((id + j) % 3 == 2) null else s"l${(id + j) % 7}")
        rec.put("score", (id % 100).toDouble + j * 0.25)
        rec.put("ratio", ((id + j) % 16).toFloat / 4.0f)
        rec.put("flag", (id + k + j) % 2 == 0)
        rec.put("cat", new GenericData.EnumSymbol(catSchema, s"c${(id + j) % 5}"))
        rec.put("blob", java.nio.ByteBuffer.wrap(
          Array.tabulate((id % 5 + j % 3).toInt)(n => ((id + n * 13) & 0xff).toByte)))
        rec.put("fp", new GenericData.Fixed(fpSchema,
          Array.tabulate(8)(n => ((id * 7 + j + n) & 0xff).toByte)))
        rec.put("fp2", new GenericData.Fixed(fpSchema,
          Array.tabulate(8)(n => ((id + j * 3 + n * 5) & 0xff).toByte)))
        val tags = new java.util.ArrayList[CharSequence]()
        (0 until (j % 3)).foreach(n => tags.add(s"t${(id + n) % 9}"))
        rec.put("tags", tags)
        val props = new java.util.LinkedHashMap[CharSequence, java.lang.Long]()
        (0 until ((id + j) % 3).toInt).foreach(n =>
          props.put(s"p$n", Long.box(id % 50 + n * 7)))
        rec.put("props", props)
        val pos = new GenericData.Record(posSchema)
        pos.put("x", id + j)
        pos.put("y", id - j)
        rec.put("pos", pos)
        w.append(rec)
      }
      w.sync() // force the block boundary
    }
    w.close()
    val bytes = bo.toByteArray
    if (id % 9 == 4) // flip a final-sync byte: splice evidence
      bytes(bytes.length - 5) = (bytes(bytes.length - 5) ^ 0x21).toByte
    bytes
  }

  /** Executor-side record-OCF fixtures — the m54 oracle replays every
   * field formula. */
  def syntheticRecordAvros(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticRecordAvro)

  /** All records of all blocks as (block_no, rec_no, fields), plus
   * the file codec — or None per the strict contract above. */
  def decodeFile(payload: Array[Byte], reader: ARecord):
      Option[(String, IndexedSeq[(Int, Int, Vector[(String, Any)])])] = {
    Avro.parseOcf(payload).flatMap { o =>
      o.schema.flatMap(parseSchema) match {
        case Some(writer) if writer == reader =>
          val syncArr = o.sync.toArray
          val out = IndexedSeq.newBuilder[(Int, Int, Vector[(String, Any)])]
          var bi = 0
          while (bi < o.blocks.size) {
            val (off, nr, nb) = o.blocks(bi)
            Avro.extractBlockAt(payload, off, nr, nb, o.codec, syncArr)
              .flatMap(decodeRecordBlock(_, nr, reader)) match {
              case Some(recs) =>
                var ri = 0
                while (ri < recs.size) {
                  out += ((bi, ri, recs(ri)))
                  ri += 1
                }
              case None => return None
            }
            bi += 1
          }
          Some((o.codec, out.result()))
        case _ => None // absent/unparseable/mismatched writer schema
      }
    }
  }
}
