package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface — beyond the reference (fugue has only an
 * `is_bounded` flag and no streaming operators; SURVEY §1.1). The engine's
 * unbounded counterpart of the batch vocabulary: load → transform →
 * windowed aggregate / stateful sessionize → sink, with watermarks.
 *
 * The operators return plain streaming DataFrames so the whole batch
 * column/function layer composes unchanged — Catalyst plans both.
 */
object Streaming {

  /** Unbounded file-source load (the streaming `load_df`). Schema is
   * mandatory (Spark requirement for streaming file sources). */
  def loadStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format(format).options(options).schema(schema).load(path)

  /** Tumbling/sliding event-time windowed aggregation with a watermark —
   * the streaming `aggregate`. */
  def windowedAgg(
      df: DataFrame,
      timeCol: String,
      watermarkDelay: String,
      windowDuration: String,
      slideDuration: Option[String],
      groupBy: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = slideDuration match {
      case Some(s) => window(col(timeCol), windowDuration, s)
      case None => window(col(timeCol), windowDuration)
    }
    df.withWatermark(timeCol, watermarkDelay)
      .groupBy((w +: groupBy.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session window aggregation (gap-based) — native sessionization. */
  def sessionAgg(
      df: DataFrame,
      timeCol: String,
      watermarkDelay: String,
      gap: String,
      groupBy: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withWatermark(timeCol, watermarkDelay)
      .groupBy((session_window(col(timeCol), gap) +: groupBy.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /**
   * Custom stateful transform — the streaming analog of the per-key
   * transformer: `flatMapGroupsWithState` with a caller-managed state type.
   */
  def statefulTransform[T, K: Encoder, S: Encoder, U: Encoder](
      ds: Dataset[T], keyFn: T => K,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Dataset[U] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(f)

  /** Streaming exact dedup: keep the first arrival per key combination.
   * With `watermarkCol`/`delay` set, state for keys older than the
   * watermark is dropped (bounded state — REQUIRED for unbounded streams;
   * without it state grows with distinct keys, acceptable only for
   * bounded/conformance runs). */
  def dropDuplicatesStream(
      df: DataFrame, cols: Seq[String],
      watermarkCol: Option[String] = None,
      delay: String = "10 minutes"): DataFrame = {
    val base = watermarkCol.map(c => df.withWatermark(c, delay)).getOrElse(df)
    watermarkCol match {
      // the event-time column must NOT join the key: withinWatermark exists
      // precisely so rows with differing timestamps still dedup per key
      case Some(_) => base.dropDuplicatesWithinWatermark(cols)
      case None => base.dropDuplicates(cols)
    }
  }

  /** Stream-static enrichment join: each micro-batch joins against the
   * (batch) dimension frame — the streaming analog of a dimension lookup.
   * Spark supports inner and left-outer stream-static joins natively; no
   * stream-side state is kept. `broadcastStatic` (default true) hints the
   * typical broadcast-sized dimension; pass false for a large static side
   * so Catalyst plans a shuffle join instead of attempting (and failing) a
   * multi-GB broadcast build per micro-batch. */
  def enrichWithStatic(
      stream: DataFrame, static: DataFrame,
      keys: Seq[String], how: String = "left",
      broadcastStatic: Boolean = true): DataFrame = {
    require(stream.isStreaming, "left side must be a streaming frame")
    require(!static.isStreaming, "right side must be a static frame")
    require(Set("inner", "left", "left_outer").contains(how),
      s"stream-static join supports inner/left, got '$how'")
    stream.join(if (broadcastStatic) broadcast(static) else static, keys, how)
  }

  /**
   * Watermarked stream-stream interval join: rows match when their `keys`
   * are equal AND `rightTimeCol` falls in
   * `[leftTimeCol, leftTimeCol + maxLag]` — the attribution-join shape
   * (click → purchase within N minutes) run continuously.
   *
   * Scale design: BOTH sides carry the watermark and the join condition
   * carries the event-time range, so Spark derives a state watermark and
   * evicts buffered rows once they can no longer match — state is
   * bounded by (watermarkDelay + maxLag) of traffic per key, not by the
   * stream's history. Without the range condition a stream-stream join
   * buffers forever; this wrapper makes the bounded form the only form.
   * State is hash-partitioned by key (the same shuffle a batch join
   * would do), so skew guidance matches the batch path.
   *
   * The right side's key columns are dropped from the output (they equal
   * the left's); all other column names must be disjoint — renaming
   * before joining is the caller's contract, same as the batch engine's
   * join. Inner joins emit eagerly; outer joins emit nulls only after
   * the watermark closes a row's match window (AvailableNow/batch-like
   * runs see them at end-of-input).
   */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      watermarkDelay: String, maxLag: String,
      joinType: String = "inner"): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "both sides of a stream-stream join must be streaming frames")
    require(keys.nonEmpty, "stream-stream join needs >= 1 equality key")
    require(leftTimeCol != rightTimeCol,
      s"time columns must have distinct names, both are '$leftTimeCol'")
    val allowed = Set("inner", "left_outer", "right_outer", "full_outer")
    require(allowed.contains(joinType),
      s"stream-stream join supports ${allowed.mkString("/")}, got '$joinType'")
    val dup = (left.columns.toSet & right.columns.toSet) -- keys
    require(dup.isEmpty,
      s"non-key columns ${dup.mkString(", ")} exist on both sides — rename before joining")
    val l = left.withWatermark(leftTimeCol, watermarkDelay)
    val r = right.withWatermark(rightTimeCol, watermarkDelay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range = r(rightTimeCol) >= l(leftTimeCol) &&
      r(rightTimeCol) <= l(leftTimeCol) + expr(s"INTERVAL $maxLag")
    val joined = l.join(r, keyCond && range, joinType)
    // keep ONE key column per key, coalescing the two sides IN PLACE
    // (left schema order, then right non-key columns — the same layout
    // the plain drop-right-keys form produced): under right/full outer
    // an unmatched right row has a null left key, and dropping r(k)
    // would erase the very key that identifies it
    val leftCols = left.columns.map(c =>
      if (keys.contains(c)) coalesce(l(c), r(c)).as(c) else l(c))
    val rightCols = right.columns.filterNot(keys.contains).map(r(_))
    joined.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }

  /**
   * Per-micro-batch data-quality monitor: runs
   * [[graft.functions.Checks.validate]] over every micro-batch and hands
   * each (batchId, report rows) to `onReport` — the continuous form of
   * the batch quality gate ("alert the moment an ingest batch ships a
   * null surge", the observability layer a 100 TB streaming ingest needs
   * in the pipeline rather than bolted on after). The report is tiny
   * (#constraints rows) so the driver-side callback is bounded; the
   * per-batch cost is the same single aggregation pass as the batch gate.
   * Synchronous AvailableNow run, like [[foreachBatchSink]].
   */
  def qualityMonitorSink(df: DataFrame, checkpoint: String,
      checks: Seq[graft.functions.Checks.Check])(
      onReport: (Long, Array[org.apache.spark.sql.Row]) => Unit): StreamingQuery =
    foreachBatchSink(df, checkpoint) { (batch, id) =>
      onReport(id, graft.functions.Checks.validate(batch, checks).collect())
    }

  /** Streaming distribution-drift monitor: per micro-batch, PSI of the
   * batch against a STATIC reference snapshot
   * ([[graft.functions.Stats.populationStability]] — reference-range
   * buckets, eps-floored proportions), delivered to a driver callback as
   * (batchId, totalPsi, perBucketRows). The continuous form of the q100
   * drift gate: an ingest stream whose total PSI crosses ~0.25 is
   * shifting away from the corpus the thresholds were tuned on. The
   * reference snapshot is aggregated ONCE at sink construction
   * ([[graft.functions.Stats.psiReference]] — range + bucket counts);
   * each micro-batch costs one scan of the batch, never of the
   * reference. */
  def driftMonitorSink(df: DataFrame, checkpoint: String,
      reference: DataFrame, valueCol: String, bins: Int = 10)(
      onReport: (Long, Double, Array[org.apache.spark.sql.Row]) => Unit): StreamingQuery = {
    val ref = graft.functions.Stats.psiReference(reference, valueCol, bins)
    foreachBatchSink(df, checkpoint) { (batch, id) =>
      if (!batch.isEmpty) {
        val rows = graft.functions.Stats
          .populationStabilityAgainst(ref, batch, valueCol).collect()
        onReport(id, rows.map(_.getDouble(5)).sum, rows)
      }
    }
  }

  /** `foreachBatch` sink: apply an arbitrary batch-mode action to each
   * micro-batch (the escape hatch for sinks Structured Streaming lacks —
   * upserts, multi-table writes). Synchronous AvailableNow trigger. */
  def foreachBatchSink(df: DataFrame, checkpoint: String)(
      f: (DataFrame, Long) => Unit): StreamingQuery = {
    val q = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(f)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drive a streaming frame into an in-memory table synchronously (test /
   * bounded-input path): processes all available input then stops. */
  def runToMemory(df: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming sink to files with checkpointing (the streaming `save_df`). */
  def saveStream(df: DataFrame, path: String, checkpoint: String,
      format: String = "parquet", outputMode: String = "append"): StreamingQuery =
    df.writeStream.format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
}
