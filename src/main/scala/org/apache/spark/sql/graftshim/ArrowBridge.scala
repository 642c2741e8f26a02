package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/**
 * Bridge into Spark's `private[sql]` Arrow interchange
 * (`org.apache.spark.sql.execution.arrow.ArrowConverters` — the engine
 * pyspark/Spark Connect use for `toPandas`/`createDataFrame`): export a
 * DataFrame as self-describing Arrow IPC stream batches and import them
 * back. The export is a DRIVER-SIDE locality boundary by design (the
 * JVM↔local-process interchange the reference exposes as `as_arrow`,
 * fugue/dataframe/dataframe.py:121) — rows stream through
 * `toLocalIterator` one partition at a time, never a whole-frame collect.
 */
object ArrowBridge {

  /** Arrow IPC stream batches (each carries the schema + one record
   * batch) covering the frame's rows in partition order. `maxRecords`
   * caps rows per batch — bounded driver memory for arbitrarily large
   * frames. */
  def toArrowBatches(df: DataFrame, maxRecords: Long = 10000L): Iterator[Array[Byte]] = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val tz = classic.sparkSession.sessionState.conf.sessionLocalTimeZone
    val schema = classic.schema
    // toLocalIterator on the internal-row plan: one partition resident at
    // a time (executeCollect would pull the whole frame into driver heap)
    val rows = classic.queryExecution.executedPlan.executeToIterator()
    ArrowConverters.toBatchWithSchemaIterator(
      rows, schema, maxRecords, Long.MaxValue, tz,
      true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
  }

  /** Rebuild a DataFrame from [[toArrowBatches]] output. Each batch is a
   * standalone IPC stream (schema + one record batch); `schemaJson`
   * (`df.schema.json` of the exporter) authoritatively types the result —
   * an empty batch list still yields a correctly-typed empty frame. Import
   * materializes driver-side by definition (this IS the local-interchange
   * boundary), then parallelizes. */
  def fromArrowBatches(
      spark: org.apache.spark.sql.SparkSession,
      batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    batches.foreach { b =>
      val (it, batchSchema) = ArrowConverters.fromIPCStream(b)
      // fail fast on a schema mismatch: the rows are UNSAFE — typing them
      // with the wrong layout silently yields garbage values, not errors.
      // equalsIgnoreNullability: Arrow tightens non-null flags per batch
      // AND drops StructField metadata (which never affects row layout) —
      // a strict == would reject legitimate round-trips of frames whose
      // schema carries metadata (VARCHAR columns, ML attributes)
      if (!org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
          batchSchema, schema)) {
        it.close()
        throw new IllegalArgumentException(
          s"Arrow batch schema ${batchSchema.simpleString} does not match " +
            s"the declared schema ${schema.simpleString}")
      }
      // copy: the iterator's rows are backed by Arrow buffers that free
      // on close
      try it.foreach(r => rows += r.copy())
      finally it.close()
    }
    classic.internalCreateDataFrame(
      classic.sparkContext.parallelize(rows.toSeq,
        math.max(1, math.min(rows.size, classic.sparkContext.defaultParallelism))),
      schema)
  }
}
