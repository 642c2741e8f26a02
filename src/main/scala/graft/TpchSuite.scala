package graft

/**
 * TPC-H-adapted SQL conformance suite (h01..h22), run through the engine's
 * SQL surface ([[graft.engine.SparkGraftEngine.sqlSelect]]) and oracled by
 * DuckDB executing the SAME text — every query below is written in the
 * dialect intersection both engines parse identically.
 *
 * The driver's testdata is TPC-H-ish, not TPC-H: there is no `partsupp`
 * table and several columns are absent (comment/phone/address/shipmode/
 * commitdate/receiptdate/supplycost/container/mfgr/shippriority/clerk).
 * Adaptations, disclosed per query:
 *   - partsupp is surrogated as `SELECT DISTINCT l_partkey, l_suppkey
 *     FROM lineitem` (h02, h11, h16, h20);
 *   - Q4/Q21's commit/receipt lateness becomes shipdate lateness
 *     (shipped > 60 days after the order date; last-to-ship supplier);
 *   - Q12's shipmode classes become order-priority classes;
 *   - Q14/Q8's part-type predicates use this generator's single-word
 *     p_type domain (PROMO/ECONOMY/...);
 *   - Q22's phone country codes become `c_nationkey % 5` and "no orders"
 *     becomes "no orders since 1999" (every customer here has orders).
 *
 * Engine-portability rules (same as the rest of SparkEntry's oracles):
 * monetary SUM/AVG bridge through DECIMAL so both engines aggregate
 * order-independently, then CAST back to DOUBLE; extract(...) is cast to
 * INTEGER (DuckDB returns BIGINT, Spark INT); every LIMIT has a
 * total-order ORDER BY. Correlated subqueries keep equality correlation
 * only (Spark's decorrelation handles those on every version we target);
 * non-equi correlation (Q4's lateness, Q21's "no later line") is
 * rewritten to the equivalent semi-join / max-join — which is also the
 * plan you'd WANT at 100 TB: one shuffle on the join key instead of a
 * per-row re-scan.
 */
object TpchSuite {

  /** Tables each query reads (the engine registers exactly these). */
  val tables: Map[String, Seq[String]] = Map(
    "h01" -> Seq("lineitem"),
    "h02" -> Seq("lineitem", "part", "supplier", "nation", "region"),
    "h03" -> Seq("customer", "orders", "lineitem"),
    "h04" -> Seq("orders", "lineitem"),
    "h05" -> Seq("customer", "orders", "lineitem", "supplier", "nation", "region"),
    "h06" -> Seq("lineitem"),
    "h07" -> Seq("supplier", "lineitem", "orders", "customer", "nation"),
    "h08" -> Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    "h09" -> Seq("part", "lineitem", "supplier", "orders", "nation"),
    "h10" -> Seq("customer", "orders", "lineitem", "nation"),
    "h11" -> Seq("lineitem", "part", "supplier", "nation"),
    "h12" -> Seq("orders", "lineitem"),
    "h13" -> Seq("customer", "orders"),
    "h14" -> Seq("lineitem", "part"),
    "h15" -> Seq("lineitem", "supplier"),
    "h16" -> Seq("lineitem", "part"),
    "h17" -> Seq("lineitem", "part"),
    "h18" -> Seq("customer", "orders", "lineitem"),
    "h19" -> Seq("lineitem", "part"),
    "h20" -> Seq("lineitem", "supplier", "nation", "part"),
    "h21" -> Seq("supplier", "lineitem", "orders", "nation"),
    "h22" -> Seq("customer", "orders"))

  private val DiscPrice = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"

  val sql: Map[String, String] = Map(
    // Q1: pricing summary report (verbatim columns)
    "h01" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         | CAST(SUM($DiscPrice) AS DOUBLE) AS sum_disc_price,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
         | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
         | CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
         | CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= DATE '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // Q2: min-cost supplier per part (acctbal stands in for supplycost;
    // partsupp surrogate; correlated scalar subquery with equality only)
    "h02" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_name, n_name,
        | CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM part JOIN ps ON p_partkey = l_partkey
        | JOIN eu ON l_suppkey = s_suppkey
        |WHERE p_size = 15 AND p_type = 'LARGE'
        | AND s_acctbal = (SELECT min(e2.s_acctbal)
        |   FROM ps ps2 JOIN eu e2 ON ps2.l_suppkey = e2.s_suppkey
        |   WHERE ps2.l_partkey = p_partkey)""".stripMargin,

    // Q3: shipping-priority candidates (no o_shippriority column)
    "h03" ->
      s"""SELECT l_orderkey,
         | CAST(SUM($DiscPrice) AS DOUBLE) AS revenue, o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         | AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    // Q4: order-priority checking; lateness = shipped > 60 days after the
    // order date; EXISTS decorrelated to a DISTINCT semi-join
    "h04" ->
      """WITH late AS (
        | SELECT DISTINCT l_orderkey
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders JOIN late ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        |GROUP BY o_orderpriority""".stripMargin,

    // Q5: local-supplier volume
    "h05" ->
      s"""SELECT n_name, CAST(SUM($DiscPrice) AS DOUBLE) AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         | AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
         |GROUP BY n_name""".stripMargin,

    // Q6: forecasting-revenue change
    "h06" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    // Q7: volume shipping between two nations
    "h07" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM (
        | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
        |  l_extendedprice * (1.0 - l_discount) AS volume
        | FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        | WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,

    // Q8: national market share within a region
    "h08" ->
      """SELECT o_year,
        | CAST(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
        |  / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (
        | SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  l_extendedprice * (1.0 - l_discount) AS volume,
        |  n2.n_name AS nation
        | FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        | WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |) all_nations
        |GROUP BY o_year""".stripMargin,

    // Q9: product-type profit (no ps_supplycost -> profit = net revenue)
    "h09" ->
      """SELECT nation, o_year,
        | CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM (
        | SELECT n_name AS nation,
        |  CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  l_extendedprice * (1.0 - l_discount) AS amount
        | FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        | WHERE p_name LIKE '%gear%'
        |) profit
        |GROUP BY nation, o_year""".stripMargin,

    // Q10: returned-item reporting (top 20 by lost revenue)
    "h10" ->
      s"""SELECT c_custkey, c_name, CAST(SUM($DiscPrice) AS DOUBLE) AS revenue,
         | CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
         |FROM customer JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         | JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
         | AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    // Q11: important stock (value = retail price of surrogate-partsupp
    // pairs held by one nation's suppliers; HAVING vs global aggregate)
    "h11" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |val AS (
        | SELECT l_partkey AS ps_partkey,
        |  SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS value_dec
        | FROM ps JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        | WHERE n_name = 'NATION_0'
        | GROUP BY l_partkey)
        |SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM val
        |WHERE CAST(value_dec AS DOUBLE) >
        | (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM val)""".stripMargin,

    // Q12: priority classes per return flag (no l_shipmode column)
    "h12" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    // Q13: customer order-count distribution
    "h13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin,

    // Q14: promotion effect (single-word p_type domain)
    "h14" ->
      s"""SELECT CAST(100.0 *
         | CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
         |   THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
         | / CAST(SUM($DiscPrice) AS DOUBLE) AS DOUBLE) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin,

    // Q15: top supplier (decimal-exact max equality)
    "h15" ->
      s"""WITH revenue AS (
         | SELECT l_suppkey AS supplier_no, SUM($DiscPrice) AS total_dec
         | FROM lineitem
         | WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
         | GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_dec = (SELECT max(total_dec) FROM revenue)""".stripMargin,

    // Q16: supplier count per part attribute (partsupp surrogate)
    "h16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        | AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    // Q17: small-quantity-order revenue (correlated avg, equality-only
    // correlation; the avg bridges through decimal for order independence)
    "h17" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 10
        | AND l_quantity < (SELECT 0.2 *
        |   (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |   FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q18: large-volume customers
    "h18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // Q19: discounted revenue, OR-of-ANDs (container -> size classes)
    "h19" ->
      s"""SELECT CAST(SUM($DiscPrice) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |   AND l_quantity >= 1 AND l_quantity <= 11)
         | OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |   AND l_quantity >= 10 AND l_quantity <= 20)
         | OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
         |   AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // Q20: suppliers holding excess share of a part's yearly volume
    "h20" ->
      """WITH partqty AS (
        | SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        | FROM lineitem
        | WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        | GROUP BY l_partkey, l_suppkey),
        |tot AS (SELECT l_partkey AS t_partkey, SUM(sq) AS tq FROM partqty GROUP BY l_partkey)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_4', 'NATION_5')
        | AND s_suppkey IN (
        |  SELECT pq.l_suppkey
        |  FROM partqty pq JOIN tot ON pq.l_partkey = t_partkey
        |   JOIN part ON p_partkey = pq.l_partkey
        |  WHERE p_name LIKE '%bolt%'
        |   AND CAST(pq.sq AS DOUBLE) > 0.4 * CAST(tq AS DOUBLE))""".stripMargin,

    // Q21: suppliers who shipped last in multi-supplier finished orders
    // (no commit/receipt dates; "kept waiting" = strictly latest shipdate,
    // max-join instead of non-equi NOT EXISTS — same set, one shuffle)
    "h21" ->
      """WITH mx AS (SELECT l_orderkey AS m_orderkey, max(l_shipdate) AS m_ship
        | FROM lineitem GROUP BY l_orderkey),
        |multi AS (SELECT l_orderkey AS q_orderkey FROM lineitem
        | GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        | JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        | JOIN orders ON o_orderkey = l1.l_orderkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN mx ON m_orderkey = l1.l_orderkey AND l1.l_shipdate = m_ship
        | JOIN multi ON q_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        | AND n_name IN ('NATION_6', 'NATION_7', 'NATION_8')
        |GROUP BY s_name""".stripMargin,

    // Q22: global-sales opportunity (country code -> c_nationkey % 5;
    // "never ordered" -> "no orders since 1999")
    "h22" ->
      """SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
        | CAST(count(*) AS BIGINT) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM customer c2 WHERE c2.c_acctbal > 0.0)
        | AND NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderdate >= DATE '1999-01-01')
        |GROUP BY c_nationkey % 5""".stripMargin)
}
