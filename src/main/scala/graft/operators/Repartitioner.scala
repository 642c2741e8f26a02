package graft.operators

import graft.PartitionSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.HashPartitioner

/**
 * Physical repartitioning strategies for [[graft.PartitionSpec]]
 * (behavioral reference: /root/reference/fugue_spark/_utils/partition.py:14-117).
 *
 * Scale notes (100 TB):
 *  - `hash` stays entirely in Catalyst (`RepartitionByExpression`) so AQE can
 *    coalesce/skew-split the exchange and downstream joins/aggs on the same
 *    keys reuse the partitioning — no extra pass, no driver involvement.
 *  - `rand` uses round-robin (`repartition(n)`), Spark's native balanced
 *    redistribution — one shuffle, no key computation.
 *  - `even` guarantees exact balance; it costs an extra job (count) plus an
 *    RDD shuffle keyed by row index. Only for small/medium frames where
 *    strict balance matters (e.g. feeding an expensive per-partition model).
 */
object Repartitioner {

  def apply(df: DataFrame, spec: PartitionSpec): DataFrame = {
    if (spec.isEmpty) return df
    val spark = df.sparkSession
    lazy val rowCount = df.count()
    val n = spec.evalNum(spark, rowCount)
    val partitioned = spec.algo.toLowerCase match {
      case "hash" | "default" | "coarse" =>
        if (spec.by.nonEmpty && spec.algo.toLowerCase != "coarse") {
          val cols = spec.by.map(col)
          if (n > 0) df.repartition(n, cols: _*) else df.repartition(cols: _*)
        } else if (n > 0) df.repartition(n)
        else df
      case "rand" =>
        if (spec.by.nonEmpty) {
          // with keys, rand delegates to hash — the reference does the same
          // (partition.py:26-31): round-robin would scatter a key's rows
          // across partitions and the downstream consecutive-key grouper
          // would visit each logical partition once per physical partition
          val cols = spec.by.map(col)
          if (n > 0) df.repartition(n, cols: _*) else df.repartition(cols: _*)
        }
        // round-robin redistribution: balanced without computing a key
        else if (n > 0) df.repartition(n)
        else df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      case "even" =>
        even(df, if (n > 0) n else spark.sparkContext.defaultParallelism, spec.by)
      case other =>
        throw new IllegalArgumentException(s"unknown partition algo '$other'")
    }
    if (spec.presort.nonEmpty)
      partitioned.sortWithinPartitions((spec.by.map(col) ++ spec.presortCols): _*)
    else partitioned
  }

  /**
   * Exact balanced repartition. Without keys: rows are dealt round-robin by
   * global index so every partition gets ceil(rows/n) or floor(rows/n) rows.
   * With keys: each distinct key group is assigned to exactly one partition,
   * groups spread evenly across partitions.
   */
  def even(df: DataFrame, n: Int, by: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    if (by.isEmpty) {
      val rdd = df.rdd.zipWithIndex().map { case (r, i) => (i, r) }
        .partitionBy(new HashPartitioner(n) {
          override def getPartition(key: Any): Int =
            (key.asInstanceOf[Long] % n).toInt
        })
        .values
      spark.createDataFrame(rdd, schema)
    } else {
      // one partition per key-group, groups balanced by dense index
      val keyCols = by.map(col)
      val keys = df.select(keyCols: _*).distinct()
        .rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      // key schema in `by` order — the order of the distinct() rows above
      val keySchema = StructType(by.map(name => schema(schema.fieldIndex(name))))
        .add("__graft_pno", "long")
      val keyDf = spark.createDataFrame(keys, keySchema)
      // key→index table is |distinct keys| rows; AQE auto-broadcasts when
      // small, falls back to shuffle join when the key space is huge.
      // NULL-SAFE equality (<=>): null keys are a valid group everywhere
      // else in this engine — a plain equi-join would silently DROP every
      // null-keyed row. Explicit condition join keeps both sides' columns;
      // re-select the ORIGINAL column order (positional consumers).
      val cond = by.map(k => df(k) <=> keyDf(k)).reduce(_ && _)
      val joined = df.join(keyDf, cond)
        .select((schema.fieldNames.map(df(_)) :+ keyDf("__graft_pno")).toIndexedSeq: _*)
      val pnoIdx = schema.fields.length
      val rdd = joined.rdd.map { r =>
        (r.getLong(pnoIdx), Row.fromSeq(r.toSeq.dropRight(1)))
      }.partitionBy(new HashPartitioner(n) {
        override def getPartition(key: Any): Int =
          (key.asInstanceOf[Long] % n).toInt
      }).values
      spark.createDataFrame(rdd, schema)
    }
  }
}
