package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * JSON SHAPE census for semi-structured columns: one row per top-level
 * key with its value's JSON type (`string` / `int` / `float` / `bool` /
 * `null` / `object` / `array`) — the schema-inference primitive for a
 * lake of JSONL / event-props payloads. At 100 TB the question "what
 * keys exist, with what types, how consistently" precedes every typed
 * extraction (`get_json_object` casts blind without it); the census is
 * a narrow map emitting (key, type) pairs, and the aggregation over
 * them is an ordinary Catalyst groupBy — Spark plans the shuffle, the
 * operator never does.
 *
 * Parsing uses Jackson's STREAMING JsonParser (on every Spark
 * classpath — Spark itself depends on it): top-level field names and
 * value token types only, nested objects/arrays skipped with
 * `skipChildren` — O(bytes) per row, no tree materialization.
 *
 * Strict posture: a payload that is not EXACTLY one JSON object
 * (malformed, a bare scalar/array at top level, or trailing content
 * after the closing brace) contributes nothing — a half-parsed shape
 * poisons schema inference the same way a half-parsed container
 * poisons a media census.
 */
object Json {

  import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

  private val factory = new JsonFactory()

  /** Top-level (key, type) pairs in document order, or None as
   * documented above. Duplicate keys are emitted each time they appear
   * (a shape fact worth surfacing, not silently merging). */
  def topLevelShape(json: String): Option[IndexedSeq[(String, String)]] = {
    if (json == null) return None
    val p = factory.createParser(json)
    try {
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return None
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var done = false
        while (!done) {
          p.nextToken() match {
            case JsonToken.END_OBJECT => done = true
            case JsonToken.FIELD_NAME =>
              val key = p.currentName()
              val t = p.nextToken() match {
                case JsonToken.VALUE_STRING => "string"
                case JsonToken.VALUE_NUMBER_INT => "int"
                case JsonToken.VALUE_NUMBER_FLOAT => "float"
                case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => "bool"
                case JsonToken.VALUE_NULL => "null"
                case JsonToken.START_OBJECT => p.skipChildren(); "object"
                case JsonToken.START_ARRAY => p.skipChildren(); "array"
                case _ => return None
              }
              out += ((key, t))
            case _ => return None
          }
        }
        if (p.nextToken() != null) return None // trailing content
        Some(out.toIndexedSeq)
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => None
      }
    } finally p.close()
  }

  /** Output schema of [[jsonShape]]. */
  val shapeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("key", StringType),
    StructField("vtype", StringType)))

  /** One row per top-level (key, type) pair per document; non-object /
   * malformed payloads contribute nothing. Narrow mapPartitions — the
   * census aggregation (GROUP BY key, vtype) is left to Catalyst. */
  def jsonShape(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val jIdx = df.schema.fieldIndex(jsonCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val doc = if (r.isNullAt(jIdx)) null else r.getString(jIdx)
        topLevelShape(doc) match {
          case Some(ks) => ks.iterator.map { case (k, t) => Row(id, k, t) }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(shapeSchema))
  }

  /** Deterministic JSON fixture shared by the writer, the t44 oracle
   * and the spec — per id:
   *
   *   - `id` (int) and `name` (string `doc_<id%100>`) always;
   *   - `score`: float `<id%10>.5` when `id%3 != 1`;
   *   - `tags`: a 2-element array when `id%4 == 0`;
   *   - `meta`: a nested object when `id%5 == 2` (skipped by
   *     `skipChildren` — its inner keys must NOT appear);
   *   - `flag`: true/false by parity;
   *   - `opt`: null when `id%7 == 3`;
   *   - ids with `id%11 == 5` emit a TRUNCATED document (the closing
   *     brace missing) — malformed, zero rows.
   */
  def syntheticJson(id: Long): String = {
    val sb = new StringBuilder
    sb ++= s"""{"id": $id, "name": "doc_${id % 100}""""
    if (id % 3 != 1) sb ++= s""", "score": ${id % 10}.5"""
    if (id % 4 == 0) sb ++= s""", "tags": ["t${id % 6}", "t${id % 9}"]"""
    if (id % 5 == 2) sb ++= s""", "meta": {"lang": "l${id % 4}", "n": 1}"""
    sb ++= s""", "flag": ${id % 2 == 0}"""
    if (id % 7 == 3) sb ++= s""", "opt": null"""
    if (id % 11 == 5) sb.toString // truncated: no closing brace
    else { sb ++= "}"; sb.toString }
  }

  /** Executor-side JSON fixtures — the t44 oracle replays the key/type
   * formulas. */
  def syntheticJsons(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("json_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticJson(id))
      }
    }(Encoders.row(schema))
  }
}
