package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class SessionSpec extends SparkTestBase {

  test("graft SQL functions callable from spark.sql") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) === 11.0)
    val n = spark.sql(
      "SELECT vec_l2_normalize(array(3.0d, 4.0d)) AS v").head().getSeq[Double](0)
    assert(math.abs(n(0) - 0.6) < 1e-12 && math.abs(n(1) - 0.8) < 1e-12)
    val s = spark.sql(
      "SELECT simhash64(array(CAST(7 AS BIGINT))) AS h").head().getLong(0)
    assert(s === 7L)
    val m = spark.sql(
      "SELECT minhash_sig(array(CAST(42 AS BIGINT)), 4, 7) AS sig")
      .head().getSeq[Long](0)
    assert(m.length === 4)
    val nu = spark.sql(
      "SELECT normalize_unicode('café'), normalize_unicode('ﬁ', 'NFKC')")
      .head()
    assert(nu.getString(0) == "café" && nu.getString(1) == "fi")
    val err = intercept[Exception](spark.sql(
      "SELECT normalize_unicode('x', 'NFX')").head())
    assert(err.getMessage.contains("NFC"))
    val moj = spark.sql(
      "SELECT fix_mojibake('cafÃ©'), " +
        "canonicalize_url('HTTP://Example.COM:80/a?utm_source=x&q=1#f'), " +
        "url_host('https://Sub.Example.ORG/p')").head()
    assert(moj.getString(0) == "café")
    assert(moj.getString(1) == "http://example.com/a?q=1")
    assert(moj.getString(2) == "sub.example.org")
  }

  test("bucketed tables join without a shuffle exchange") {
    Seq("graft_bucket_a", "graft_bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val a = df((1 to 100).map(i => Seq(i.toLong, s"a$i")), "k:long,x:str")
    val b = df((1 to 100).map(i => Seq(i.toLong, i * 1.0)), "k:long,y:double")
    Bucketing.saveBucketed(a, "graft_bucket_a", Seq("k"), 4, sortBy = Seq("k"))
    Bucketing.saveBucketed(b, "graft_bucket_b", Seq("k"), 4, sortBy = Seq("k"))
    // force sort-merge (tiny test tables would auto-broadcast, which hides
    // the bucketing effect this test demonstrates)
    val joined = spark.table("graft_bucket_a").hint("merge")
      .join(spark.table("graft_bucket_b"), "k")
    assert(joined.count() === 100)
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString.take(600))
    spark.sql("DROP TABLE graft_bucket_a")
    spark.sql("DROP TABLE graft_bucket_b")
  }
}
