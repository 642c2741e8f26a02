package graft.transform

import graft.PartitionSpec
import graft.schema.SchemaExpr
import org.apache.spark.sql.types.StructType

/**
 * Extension validation hooks — the reference's compile/runtime validation
 * rules on transformers (/root/reference/fugue/extensions/_utils.py:36-130,
 * exercised in fugue_test/builtin_suite.py:1403-1535). A transformer
 * declares requirements on how it is invoked; violations fail fast at
 * statement-build time with a clear message, before any job runs.
 *
 * Supported rule keys (values are strings, as in the reference comment
 * annotations):
 *  - `partitionby_has`: comma list — every named column must be a
 *    partition key of the invoking spec
 *  - `partitionby_is`: comma list — the partition keys must be exactly this
 *    set
 *  - `presort_has`: presort expression (`col [asc|desc],..`) — each pair
 *    must appear in the spec's presort with the same direction
 *  - `presort_is`: presort expression — the spec's presort must match
 *    exactly (same order)
 *  - `input_has`: comma list — the input schema must contain these columns
 *  - `input_is`: schema expression — the input schema must be exactly this
 */
object ExtensionValidation {

  val RuleKeys: Set[String] = Set("partitionby_has", "partitionby_is",
    "presort_has", "presort_is", "input_has", "input_is")

  def validate(
      rules: Map[String, String],
      spec: PartitionSpec,
      inputSchema: StructType): Unit = {
    rules.keys.find(!RuleKeys.contains(_)).foreach(k =>
      throw new IllegalArgumentException(s"unknown validation rule '$k'"))

    def cols(v: String): Seq[String] = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // column names compare case-insensitively throughout: execution
    // resolves columns case-insensitively (col()/sortArr/rowSorter), so
    // validation must not reject a spec that would run correctly
    def lc(s: String): String = s.toLowerCase
    def hasIn(xs: Seq[String], c: String): Boolean = xs.exists(x => lc(x) == lc(c))

    rules.get("partitionby_has").foreach { v =>
      cols(v).foreach(c => require(hasIn(spec.by, c),
        s"validation failed: required partition key '$c' is not in ${spec.by.mkString("[", ",", "]")}"))
    }
    rules.get("partitionby_is").foreach { v =>
      val want = cols(v)
      want.foreach(c => require(hasIn(spec.by, c),
        s"validation failed: required partition key '$c' is not in ${spec.by.mkString("[", ",", "]")}"))
      require(want.length == spec.by.length,
        s"validation failed: partition keys ${spec.by.mkString("[", ",", "]")} must be exactly ${want.mkString("[", ",", "]")}")
    }
    def presortPairs(v: String): Seq[(String, Boolean)] = PartitionSpec.parsePresort(v)
    rules.get("presort_has").foreach { v =>
      presortPairs(v).foreach { case (c, asc) =>
        val found = spec.presort.find(p => lc(p._1) == lc(c))
        require(found.isDefined,
          s"validation failed: required presort key '$c' is not in presort ${spec.presort}")
        require(found.get._2 == asc,
          s"validation failed: presort direction of '$c' must be ${if (asc) "ASC" else "DESC"}")
      }
    }
    rules.get("presort_is").foreach { v =>
      val want = presortPairs(v)
      require(want.length == spec.presort.length &&
        want.zip(spec.presort).forall { case ((wc, wa), (sc, sa)) =>
          lc(wc) == lc(sc) && wa == sa },
        s"validation failed: presort ${spec.presort} must be exactly $want")
    }
    rules.get("input_has").foreach { v =>
      val names = inputSchema.fieldNames.toSeq
      cols(v).foreach(c => require(hasIn(names, c),
        s"validation failed: input schema must contain column '$c' (has ${names.mkString(",")})"))
    }
    rules.get("input_is").foreach { v =>
      val want = SchemaExpr.parse(v)
      val got = StructType(inputSchema.fields.map(f => f.copy(metadata =
        org.apache.spark.sql.types.Metadata.empty, nullable = true)))
      val wantN = StructType(want.fields.map(_.copy(nullable = true)))
      require(got == wantN,
        s"validation failed: input schema ${inputSchema.simpleString} must be exactly ${want.simpleString}")
    }
  }
}
