package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Shared executor-side synthetic-fixture wrapper for the media
 * conformance families (m13–m23): one `(doc_id, payload)` row per input
 * id, with the payload generated ON THE EXECUTOR by a deterministic
 * per-id writer — the fixture bytes never cross the driver or an
 * exchange, so the fixture frame scales exactly like the decode walk it
 * feeds (narrow mapPartitions, CPU-linear). One definition replaces the
 * eight per-codec copies (r11 verdict cleanup #4).
 */
object Fixtures {

  /** The `(doc_id, payload)` fixture schema every media family shares. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("payload", BinaryType)))

  /** One synthetic payload per id: `f` runs executor-side per row. `f`
   * must be a deterministic pure function of the id (the DuckDB oracles
   * recompute its closed form). */
  def syntheticPayloads(df: DataFrame, idCol: String)(
      f: Long => Array[Byte]): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r => val id = r.getLong(idIdx); Row(id, f(id)) }
    }(Encoders.row(payloadSchema))
  }
}
