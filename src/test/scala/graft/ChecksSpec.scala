package graft

import graft.functions.Checks
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0, "F"),
    (2L, Some("b"), 20.0, "O"),
    (3L, None, 30.0, "F"),
    (4L, Some("d"), -5.0, "P"),
    (4L, Some("e"), 45.0, "X")) // duplicate key, out-of-set status
    .toDF("id", "tag", "value", "status")

  test("validate: one report row per check, in order, with exact metrics") {
    val report = Checks.validate(df, Seq(
      Checks.rowCountBetween(5, 5),
      Checks.notNull("id"),
      Checks.notNull("tag"),
      Checks.completeness("tag", 0.7),
      Checks.unique("id"),
      Checks.unique("id", "tag"),
      Checks.minValue("value", 0.0),
      Checks.maxValue("value", 100.0),
      Checks.meanBetween("value", 19.0, 21.0),
      Checks.stddevBetween("value", 16.5, 17.5),
      Checks.inSet("status", Seq("F", "O", "P"), 0.8),
      Checks.matchesRegex("tag", "^[a-d]$", 0.75),
      Checks.distinctCountBetween("status", 4, 4),
      Checks.satisfies(col("value") > 0, "positive_value", 0.8)))
    val rows = report.collect()
    assert(rows.length === 14)
    val byName = rows.map(r =>
      (r.getString(0), (r.getString(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(byName("row_count[5,5]") === (("*", 5.0, true)))
    val notNullRows = rows.filter(_.getString(0) == "not_null")
    assert(notNullRows.map(r => (r.getString(1), r.getBoolean(3))).toSet ===
      Set(("id", true), ("tag", false))) // tag has 1 null
    assert(byName("completeness>=0.7") === (("tag", 0.8, true)))
    // id: 5 non-null, 4 distinct -> 1 duplicate -> fail
    val uniqueId = rows.filter(r =>
      r.getString(0) == "unique" && r.getString(1) == "id").head
    assert(uniqueId.getDouble(2) === 1.0 && !uniqueId.getBoolean(3))
    // (id, tag): the null-tag tuple is excluded; 4 non-null tuples distinct
    val uniquePair = rows.filter(r =>
      r.getString(0) == "unique" && r.getString(1) == "id,tag").head
    assert(uniquePair.getDouble(2) === 0.0 && uniquePair.getBoolean(3))
    assert(byName("min>=0.0") === (("value", -5.0, false)))
    assert(byName("max<=100.0") === (("value", 45.0, true)))
    assert(byName("mean[19.0,21.0]") === (("value", 20.0, true)))
    // population stddev of (10,20,30,-5,45) = sqrt(290) = 17.02938...
    assert(math.abs(byName("stddev[16.5,17.5]")._2 - math.sqrt(290.0)) < 1e-6)
    assert(byName("stddev[16.5,17.5]")._3)
    assert(byName("in_set>=0.8") === (("status", 0.8, true)))
    assert(byName("regex>=0.75") === (("tag", 0.75, true)))
    assert(byName("distinct[4,4]") === (("status", 4.0, true)))
    assert(byName("satisfies(positive_value)>=0.8") === (("*", 0.8, true)))
    // report row order follows check order
    assert(rows.head.getString(0) === "row_count[5,5]")
    assert(rows.last.getString(0) === "satisfies(positive_value)>=0.8")
  }

  test("vacuous bounds on all-null columns; approx distinct tracks exact") {
    val nulls = Seq((1L, Option.empty[java.lang.Double]),
      (2L, Option.empty[java.lang.Double])).toDF("id", "v")
    val rep = Checks.validate(nulls, Seq(
      Checks.minValue("v", 5.0), Checks.maxValue("v", 1.0),
      Checks.completeness("v", 0.5)))
      .collect()
    assert(rep(0).getBoolean(3) && rep(1).getBoolean(3)) // vacuously true
    assert(rep(2).getDouble(2) === 0.0 && !rep(2).getBoolean(3))
    val approx = Checks.validate(df,
      Seq(Checks.approxDistinctBetween("id", 3, 5))).collect().head
    assert(approx.getBoolean(3))
  }

  test("enforce: passes through on green, throws naming every failure") {
    val out = Checks.enforce(df, Seq(Checks.rowCountBetween(1, 100)))
    assert(out.count() === 5)
    val e = intercept[IllegalStateException] {
      Checks.enforce(df, Seq(Checks.unique("id"), Checks.minValue("value", 0.0)))
    }
    assert(e.getMessage.contains("unique on id"))
    assert(e.getMessage.contains("min>=0.0 on value"))
    intercept[IllegalArgumentException] { Checks.validate(df, Seq.empty) }
    intercept[IllegalArgumentException] { Checks.unique() }
  }

  test("parseRules round-trips the DSL and rejects junk loudly") {
    val checks = Checks.parseRules(
      "not_null:id,unique:id|tag,completeness:tag:0.7,min:value:0,max:value:100," +
        "mean:value:0:50,stddev:value:0:100,in_set:status:F|O|P:0.8," +
        "distinct:status:1:5,approx_distinct:id:1:10,row_count:1:99," +
        "regex:tag:0.5:^[a-z]+:suffix$")
    assert(checks.length === 12)
    assert(checks.map(_.name).contains("regex>=0.5"))
    // the regex pattern keeps its internal colon
    val rep = Checks.validate(df, checks).collect()
    assert(rep.length === 12)
    intercept[IllegalArgumentException] { Checks.parseRules("") }
    intercept[IllegalArgumentException] { Checks.parseRules("frobnicate:x") }
    intercept[IllegalArgumentException] { Checks.parseRules("mean:value:1") }
    // escaped comma: the {2,4} bounded-repetition quantifier is expressible
    val quant = Checks.parseRules("""regex:tag:1.0:^[a-z]{1\,2}$,not_null:id""")
    assert(quant.length === 2)
    val qrep = Checks.validate(df, quant.take(1)).collect().head
    assert(qrep.getDouble(2) === 1.0 && qrep.getBoolean(3)) // all tags 1-2 chars
  }

  test("mean/stddev metrics skip NaN and Infinity (count agrees with sums)") {
    val d = Seq(2.0, 2.0, Double.NaN, Double.PositiveInfinity)
      .toDF("v")
    val rep = Checks.validate(d, Seq(
      Checks.meanBetween("v", 1.9, 2.1),
      Checks.stddevBetween("v", 0.0, 0.1))).collect()
    assert(rep(0).getDouble(2) === 2.0, "mean over the two finite rows")
    assert(rep(0).getBoolean(3))
    assert(rep(1).getDouble(2) === 0.0 && rep(1).getBoolean(3))
    // all-non-finite column: null metric, failed, no crash
    val bad = Seq(Double.NaN, Double.NaN).toDF("v")
    val rep2 = Checks.validate(bad, Seq(Checks.meanBetween("v", 0, 1))).collect()
    assert(rep2.head.isNullAt(2) && !rep2.head.getBoolean(3))
  }

  test("parseRules: escaped backslash cannot swallow the following rule") {
    val rules = Checks.parseRules("""regex:tag:1.0:.*\\,not_null:id""")
    assert(rules.length === 2, "pattern ends in a literal backslash, rule 2 survives")
    assert(rules.map(_.name) === Seq("regex>=1.0", "not_null"))
  }

  test("enforce names the constraint even when its metric is null") {
    val allNull = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "status")
    val e = intercept[IllegalStateException] {
      Checks.enforce(allNull, Seq(Checks.inSet("status", Seq("A", "B"))))
    }
    assert(e.getMessage.contains("in_set>=1.0 on status"))
    assert(e.getMessage.contains("metric=null"))
  }

  test("single aggregation pass: report plan has exactly one scan of the input") {
    val report = Checks.validate(df, Seq(
      Checks.rowCountBetween(1, 10), Checks.completeness("tag", 0.5),
      Checks.meanBetween("value", 0, 100),
      Checks.satisfies(col("value") > 0, "pos", 0.5)))
    val scans = report.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => s
      case s: org.apache.spark.sql.execution.LogicalRDD => s
    }
    assert(scans.length === 1, "non-distinct checks must compile to one pass")
  }
}
