package graft

import graft.functions.expressions._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session wiring: the graft function surface registered into Spark SQL
 * (usable from `spark.sql` and the dataflow dialect), plus a builder with
 * the scale-appropriate defaults.
 */
object GraftSession {

  /** Builder preconfigured for large-scale work: AQE (coalescing + skew
   * join), sane local shuffle parallelism, UTC. `cores` should be cluster
   * parallelism; shuffle partitions scale with it (at a real 1000-executor
   * deployment, set `spark.sql.shuffle.partitions` ≈ 2-3× total cores). */
  def builder(master: String = "local[32]", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Register the graft SQL functions on an existing session (the
   * non-extensions path). */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/**
 * `SparkSessionExtensions` hook — `.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions` makes the functions
 * available in every session of a cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** name → (info, expression builder). */
  val functions: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "vec_dot" -> (info("vec_dot",
      "vec_dot(a, b) - dot product of two array<double> vectors"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    "vec_l2_normalize" -> (info("vec_l2_normalize",
      "vec_l2_normalize(v) - unit-L2-norm copy of a float/double array"),
      (es: Seq[Expression]) => L2Normalize(es.head)),
    "minhash_sig" -> (info("minhash_sig",
      "minhash_sig(hashes, numHashes, seed) - minhash signature of a bigint array"),
      (es: Seq[Expression]) => MinHashSignature(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].longValue())),
    "simhash64" -> (info("simhash64",
      "simhash64(hashes) - 64-bit simhash of a bigint feature-hash array"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    "fingerprint64" -> (info("fingerprint64",
      "fingerprint64(text) - 64-bit whitespace-normalized rolling document fingerprint"),
      (es: Seq[Expression]) => Fingerprint64(es.head)),
    "hyperplane_keys" -> (info("hyperplane_keys",
      "hyperplane_keys(v, dim, nTables, nBits, seed[, probes]) - LSH sign-bucket keys"),
      (es: Seq[Expression]) => HyperplaneKeys(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue(),
        es(3).eval().asInstanceOf[Number].intValue(),
        es(4).eval().asInstanceOf[Number].longValue(),
        if (es.length > 5) es(5).eval().asInstanceOf[Number].intValue() else 0)),
  )
}
