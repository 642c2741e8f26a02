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

  /** Driver-side: messages from index `from` (exclusive of earlier ones) —
   * converts only the tail instead of re-materializing the full history
   * (the accumulator's `value` copy itself is unavoidable, but a monitor
   * polling 10x/s should not also re-convert every already-seen message). */
  private[transform] def messagesFrom(from: Int): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val v = acc.value
    if (from >= v.size) Nil
    else v.subList(from, v.size).asScala.toSeq
  }
}

object CallbackChannel {
  def apply(spark: SparkSession, name: String = "graft_callbacks"): CallbackChannel =
    new CallbackChannel(spark.sparkContext.collectionAccumulator[(String, String)](name))
}

/**
 * Driver-side live monitor over a [[CallbackChannel]]: polls the channel
 * WHILE an action runs and delivers each new message to `handler` exactly
 * once. This is the Spark-idiomatic replacement for the reference's Flask
 * RPC server (fugue/rpc/flask.py:19) — combined with
 * `sparkContext.cancelJobGroup` it implements interactive early stop
 * (reference builtin_suite early-stop tests): the handler inspects
 * progress messages and cancels the job group when a stop condition hits.
 *
 * Accumulator timing note: posts become visible when their task COMPLETES
 * (Spark's accumulator contract), so granularity of the monitor is one
 * task — right for per-partition progress, not per-row.
 */
final class CallbackMonitor private (
    thread: Thread, stopFlag: java.util.concurrent.atomic.AtomicBoolean) {
  /** Stop polling; drains remaining messages before returning. */
  def stop(): Unit = { stopFlag.set(true); thread.join(5000) }
}

object CallbackMonitor {
  def start(channel: CallbackChannel, intervalMs: Long = 100)(
      handler: (String, String) => Unit): CallbackMonitor = {
    val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      var seen = 0
      def drain(): Unit = {
        val fresh = channel.messagesFrom(seen)
        fresh.foreach { case (k, v) => handler(k, v) }
        seen += fresh.length
      }
      while (!stopFlag.get()) { drain(); Thread.sleep(intervalMs) }
      drain()
    }, "graft-callback-monitor")
    t.setDaemon(true)
    t.start()
    new CallbackMonitor(t, stopFlag)
  }
}
