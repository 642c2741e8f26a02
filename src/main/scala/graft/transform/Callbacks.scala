package graft.transform

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.CollectionAccumulator

/**
 * Worker→driver callback channel — the reference's RPC surface
 * (/root/reference/fugue/rpc/base.py) re-based on Spark accumulators:
 * transformers running on executors post small messages; the driver drains
 * them after (or during, for monitoring threads) an action. Accumulators
 * are Spark's native, fault-tolerant worker→driver channel — no extra
 * server, works on any cluster manager.
 *
 * For interactive early-stop the reference runs a Flask server; on Spark
 * the idiomatic equivalent is `sparkContext.cancelJobGroup` driven by a
 * driver-side monitor thread reading this channel.
 */
final class CallbackChannel private (
    acc: CollectionAccumulator[(String, String)]) extends Serializable {

  /** Callable from executor-side code (inside transform functions). */
  def post(topic: String, message: String): Unit = acc.add(topic -> message)

  /** Driver-side: all messages posted so far (across retries, dedup is the
   * caller's concern — Spark may re-run tasks). */
  def messages: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    acc.value.asScala.toSeq
  }

  def messages(topic: String): Seq[String] =
    messages.collect { case (t, m) if t == topic => m }
}

object CallbackChannel {
  def apply(spark: SparkSession, name: String = "graft_callbacks"): CallbackChannel =
    new CallbackChannel(spark.sparkContext.collectionAccumulator[(String, String)](name))
}
