package graft

/** SQL-surface parity sweep (r5 verdict #8): the engine must be usable
  * SQL-first. Each case here states a registered query as ANSI SQL text
  * over the GraftCatalog views and asserts BITWISE equality with the
  * DataFrame formulation in SparkEntry.queries — same decimal-exact
  * expression trees, so every double must match to the last ulp, not just
  * approximately. This pins the catalog tier (view schemas, function
  * registration, type coercion) against drift.
  */
class SqlParitySpec extends SparkSpec {

  private lazy val registered = { GraftCatalog.register(spark, sf); true }

  private def check(name: String, sql: String): Unit = {
    assert(registered)
    val viaSql = spark.sql(sql).collect().map(_.toSeq).toSeq
    val viaDf = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    assert(viaSql.size == viaDf.size,
      s"$name: row count ${viaSql.size} (SQL) vs ${viaDf.size} (DataFrame)")
    viaSql.zip(viaDf).zipWithIndex.foreach { case ((s, d), i) =>
      assert(s == d, s"$name row $i: SQL $s vs DataFrame $d")
    }
  }

  // shared decimal-exact fragments mirroring graft.functions.Num
  private def dsum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  private def davg(c: String) = s"${dsum(c)} / CAST(COUNT(1) AS DOUBLE)"
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
  private def tsS(c: String) = s"date_format($c, 'yyyy-MM-dd HH:mm:ss')"

  test("q1_pricing_summary via SQL") {
    check("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty,
        |  ${dsum("l_extendedprice")} AS sum_base_price,
        |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
        |  ${davg("l_quantity")} AS avg_qty,
        |  ${davg("l_discount")} AS avg_disc,
        |  COUNT(1) AS count_order
        |FROM lineitem WHERE l_shipdate <= CAST('2001-06-01' AS TIMESTAMP)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q3_shipping_priority via SQL") {
    check("q3_shipping_priority",
      s"""SELECT l_orderkey, CAST(SUM($discPrice) AS DOUBLE) AS revenue,
        |  ${tsS("o_orderdate")} AS o_orderdate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > CAST('1998-06-01' AS TIMESTAMP)
        |  AND o_orderdate < CAST('1998-06-01' AS TIMESTAMP)
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
  }

  test("q5_local_supplier via SQL") {
    check("q5_local_supplier",
      s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= CAST('1997-01-01' AS TIMESTAMP)
        |  AND o_orderdate < CAST('1999-01-01' AS TIMESTAMP)
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
  }

  test("q6_revenue_forecast via SQL") {
    check("q6_revenue_forecast",
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= CAST('1997-01-01' AS TIMESTAMP)
        |  AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP)
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin)
  }

  test("q_window_running via SQL") {
    check("q_window_running",
      s"""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, running_qty,
        |  ${tsS("l_shipdate")} AS ship_ts
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_shipdate,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin)
  }

  test("q_rollup_returns via SQL") {
    check("q_rollup_returns",
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(1) AS n_rows, ${dsum("l_quantity")} AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  test("q_setops_nations via SQL") {
    check("q_setops_nations",
      """WITH cn AS (SELECT DISTINCT n_name FROM nation
        |    JOIN customer ON c_nationkey = n_nationkey WHERE c_acctbal > 7000),
        |  sn AS (SELECT DISTINCT n_name FROM nation
        |    JOIN supplier ON s_nationkey = n_nationkey WHERE s_acctbal > 5000)
        |SELECT n_name, set_op FROM (
        |  SELECT n_name, 'both' AS set_op
        |  FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        |  UNION ALL
        |  SELECT n_name, 'cust_only' AS set_op
        |  FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn))
        |ORDER BY set_op, n_name""".stripMargin)
  }

  test("q_order_stats via SQL") {
    check("q_order_stats",
      s"""SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  ${dsum("o_totalprice")} AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  test("q_topk_parts via SQL") {
    check("q_topk_parts",
      """SELECT p_partkey, p_name, p_type,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) + CAST(0.1 AS DECIMAL(18,2))) AS DOUBLE) AS adj_price
        |FROM part ORDER BY adj_price DESC, p_partkey LIMIT 20""".stripMargin)
  }

  test("q_anti_join via SQL (correlated NOT EXISTS)") {
    check("q_anti_join",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  test("q_semi_join via SQL (correlated EXISTS)") {
    check("q_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  test("q_cube_orders via SQL") {
    check("q_cube_orders",
      s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(1) AS n_orders, ${dsum("o_totalprice")} AS sum_price
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin)
  }

  test("q_grouping_sets via SQL") {
    check("q_grouping_sets",
      s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(1) AS n_orders, ${dsum("o_totalprice")} AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY priority, status""".stripMargin)
  }

  test("q_multiset_ops via SQL (EXCEPT ALL / INTERSECT ALL)") {
    check("q_multiset_ops",
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer),
        |  s AS (SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier),
        |  u AS (
        |    SELECT nk, 'except_all' AS op
        |    FROM (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s)
        |    UNION ALL
        |    SELECT nk, 'intersect_all' AS op
        |    FROM (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s))
        |SELECT op, nk, COUNT(1) AS multiplicity FROM u
        |GROUP BY op, nk ORDER BY op, nk""".stripMargin)
  }

  test("q_pivot via SQL (PIVOT clause)") {
    check("q_pivot",
      """SELECT l_returnflag, F AS qty_f, O AS qty_o FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q FROM lineitem)
        |PIVOT (CAST(SUM(q) AS DOUBLE) FOR l_linestatus IN ('F' AS F, 'O' AS O))
        |ORDER BY l_returnflag""".stripMargin)
  }

  test("q_above_avg_parts via SQL") {
    check("q_above_avg_parts",
      s"""WITH a AS (SELECT p_type, ${davg("p_retailprice")} AS avg_price
        |  FROM part GROUP BY p_type)
        |SELECT p_partkey, p_name, p.p_type, p_retailprice,
        |  avg_price AS type_avg_price
        |FROM part p JOIN a ON p.p_type = a.p_type
        |WHERE p_retailprice > avg_price * 1.02
        |ORDER BY p_partkey""".stripMargin)
  }

  test("q_large_orders via SQL (HAVING threshold + join back)") {
    check("q_large_orders",
      s"""WITH big AS (SELECT l_orderkey, ${dsum("l_quantity")} AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING ${dsum("l_quantity")} > 300.0)
        |SELECT c_name, o_orderkey, ${tsS("o_orderdate")} AS o_orderdate, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)
  }

  test("q12_priority_ship via SQL") {
    check("q12_priority_ship",
      """SELECT l_linestatus,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS high_line_count,
        |  SUM(CASE WHEN NOT o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
  }

  test("q14_promo_share via SQL") {
    check("q14_promo_share",
      s"""SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPrice
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM($discPrice) AS DOUBLE) AS promo_share,
        |  COUNT(1) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= CAST('1998-01-01' AS TIMESTAMP)
        |  AND l_shipdate < CAST('1999-01-01' AS TIMESTAMP)""".stripMargin)
  }

  test("q19_brand_bands via SQL (OR-of-AND filter groups)") {
    check("q19_brand_bands",
      s"""SELECT CAST(SUM($discPrice) AS DOUBLE) AS revenue, COUNT(1) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 30)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin)
  }

  test("q4_priority_exists via SQL") {
    check("q4_priority_exists",
      """SELECT o_orderpriority, COUNT(1) AS order_count
        |FROM orders
        |WHERE o_orderdate >= CAST('1997-01-01' AS TIMESTAMP)
        |  AND o_orderdate < CAST('1997-04-01' AS TIMESTAMP)
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }
}
