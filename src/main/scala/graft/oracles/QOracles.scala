package graft.oracles

/** DuckDB oracle SQL for the relational/TPC-H-shaped `q*` registrations — split out of
  * `SparkEntry` (r12: the registry file had grown past 5k lines; the
  * oracle map is the moved half, merged back verbatim in
  * `SparkEntry.oracleSql`, whose emitted oracle_sql.json is the contract
  * and is diff-checked byte-identical across the split).
  */
private[graft] object QOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, running_qty, ship_ts
        |FROM (
        |  SELECT l_suppkey,
        |    row_number() OVER w AS rn, l_orderkey, l_linenumber, l_quantity,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |    strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q_window_funcs" ->
      """SELECT l_suppkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn, l_orderkey, l_linenumber, l_quantity,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
        |  strftime(lag(l_shipdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS prev_ship,
        |  strftime(lead(l_shipdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS next_ship,
        |  strftime(first_value(l_shipdate) OVER w, '%Y-%m-%d %H:%M:%S') AS first_ship,
        |  strftime(last_value(l_shipdate) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), '%Y-%m-%d %H:%M:%S') AS last_ship,
        |  CAST(ntile(4) OVER (PARTITION BY l_suppkey ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS qty_quartile
        |FROM lineitem WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_rollup_returns" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_setops_nations" ->
      """WITH cn AS (SELECT DISTINCT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey WHERE c_acctbal > 7000),
        |     sn AS (SELECT DISTINCT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey WHERE s_acctbal > 5000)
        |SELECT n_name, set_op FROM (
        |  SELECT n_name, 'both' AS set_op FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        |  UNION ALL
        |  SELECT n_name, 'cust_only' AS set_op FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
        |) ORDER BY set_op, n_name""".stripMargin,
    "q_order_stats" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_topk_parts" ->
      """SELECT p_partkey, p_name, p_type,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(0.1 AS DECIMAL(18,2))) AS DOUBLE) AS adj_price
        |FROM part ORDER BY adj_price DESC, p_partkey LIMIT 20""".stripMargin,
    "q_cube_orders" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0)
        |SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_above_avg_parts" ->
      """WITH a AS (
        |  SELECT p_type,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price
        |  FROM part GROUP BY p_type)
        |SELECT p_partkey, p_name, part.p_type, p_retailprice, avg_price AS type_avg_price
        |FROM part JOIN a ON part.p_type = a.p_type
        |WHERE p_retailprice > avg_price * 1.02
        |ORDER BY p_partkey""".stripMargin,
    "q12_priority_ship" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_share,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'""".stripMargin,
    "q19_brand_bands" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY priority, status""".stripMargin,
    "q_multiset_ops" ->
      """WITH ea AS (SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier),
        |ia AS (SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier),
        |u AS (SELECT 'except_all' AS op, nk FROM ea UNION ALL SELECT 'intersect_all', nk FROM ia)
        |SELECT op, CAST(nk AS BIGINT) AS nk, COUNT(*) AS multiplicity
        |FROM u GROUP BY op, nk ORDER BY op, nk""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """WITH ext AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |    MAX(CAST(l_extendedprice AS DOUBLE)) AS mx FROM lineitem),
        |c AS (SELECT CASE WHEN mx = mn THEN 0
        |    ELSE LEAST(19, CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn)
        |      / (mx - mn) * 20) AS BIGINT)) END AS bucket, COUNT(*) AS n
        |  FROM lineitem, ext WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |grid AS (SELECT unnest(range(0, 20)) AS bucket, mn, mx FROM ext)
        |SELECT g.bucket, g.mn + CAST(g.bucket AS DOUBLE) * (g.mx - g.mn) / 20 AS lo,
        |  g.mn + CAST(g.bucket + 1 AS DOUBLE) * (g.mx - g.mn) / 20 AS hi,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n
        |FROM grid g LEFT JOIN c ON g.bucket = c.bucket
        |ORDER BY g.bucket""".stripMargin,
    "q_revenue_concentration" ->
      """WITH rev AS (SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rd
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        |tot AS (SELECT SUM(rd) AS td FROM rev),
        |top AS (SELECT o_custkey, rd,
        |    ROW_NUMBER() OVER (ORDER BY rd DESC, o_custkey) AS rank
        |  FROM rev ORDER BY rd DESC, o_custkey LIMIT 10),
        |cum AS (SELECT rank, o_custkey, rd,
        |    SUM(rd) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crd
        |  FROM top)
        |SELECT CAST(rank AS BIGINT) AS rank, o_custkey,
        |  CAST(CAST(rd AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(CAST(rd AS VARCHAR) AS DOUBLE) / CAST(CAST(td AS VARCHAR) AS DOUBLE)
        |    AS revenue_share,
        |  CAST(CAST(crd AS VARCHAR) AS DOUBLE) / CAST(CAST(td AS VARCHAR) AS DOUBLE)
        |    AS cum_share
        |FROM cum, tot ORDER BY rank""".stripMargin,
    "q_regression_by_flag" ->
      """WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd, sx, sy, sxy, sxx, syy FROM m)
        |SELECT l_returnflag, n, sx / nd AS mean_x, sy / nd AS mean_y,
        |  sxy / nd - (sx / nd) * (sy / nd) AS cov_xy,
        |  sxx / nd - (sx / nd) * (sx / nd) AS var_x,
        |  syy / nd - (sy / nd) * (sy / nd) AS var_y,
        |  (sxy / nd - (sx / nd) * (sy / nd)) / (sxx / nd - (sx / nd) * (sx / nd)) AS slope,
        |  sy / nd - ((sxy / nd - (sx / nd) * (sy / nd)) / (sxx / nd - (sx / nd) * (sx / nd))) * (sx / nd) AS intercept,
        |  (sxy / nd - (sx / nd) * (sy / nd))
        |    / sqrt((sxx / nd - (sx / nd) * (sx / nd)) * (syy / nd - (sy / nd) * (sy / nd))) AS corr
        |FROM d ORDER BY l_returnflag""".stripMargin,
    "q_regression" ->
      // decimal → double goes VIA VARCHAR: DuckDB's direct decimal cast is
      // not correctly rounded for wide values (observed 2 ulp off at sf0.1);
      // strtod on the exact decimal string is, matching Spark's BigDecimal
      // conversion bit-for-bit.
      """WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem),
        |d AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sxy, sxx, syy FROM m)
        |SELECT n, sx / nd AS mean_x, sy / nd AS mean_y,
        |  sxy / nd - (sx / nd) * (sy / nd) AS cov_xy,
        |  sxx / nd - (sx / nd) * (sx / nd) AS var_x,
        |  syy / nd - (sy / nd) * (sy / nd) AS var_y,
        |  (sxy / nd - (sx / nd) * (sy / nd)) / (sxx / nd - (sx / nd) * (sx / nd)) AS slope,
        |  sy / nd - ((sxy / nd - (sx / nd) * (sy / nd)) / (sxx / nd - (sx / nd) * (sx / nd))) * (sx / nd) AS intercept,
        |  (sxy / nd - (sx / nd) * (sy / nd))
        |    / sqrt((sxx / nd - (sx / nd) * (sx / nd)) * (syy / nd - (sy / nd) * (sy / nd))) AS corr
        |FROM d""".stripMargin,
    "q_column_stats" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey")
      cols.map { c =>
        s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(MIN($c) AS DOUBLE) AS min_val, CAST(MAX($c) AS DOUBLE) AS max_val,
           |  quantile_cont($c, 0.25) AS p25, quantile_cont($c, 0.5) AS p50,
           |  quantile_cont($c, 0.75) AS p75
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_extendedprice, 0.5) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_order_counts" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT MAX(total_revenue) AS m FROM rev)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey, mx
        |WHERE total_revenue = m ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty" ->
      """WITH bl AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#1'),
        |a AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM bl GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_rows
        |FROM bl JOIN a USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q22_global_sales" ->
      """WITH elig AS (SELECT * FROM customer WHERE c_nationkey IN (1,3,5,7,9)),
        |a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_bal
        |      FROM elig WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM elig, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY 1""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH elig AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |uc AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
        |  GROUP BY l_partkey, l_suppkey),
        |offered AS (SELECT uc.*, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name
        |            FROM uc JOIN elig e ON uc.l_suppkey = e.s_suppkey),
        |mc AS (SELECT l_partkey, MIN(unit_cost) AS min_cost FROM offered GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
        |FROM offered JOIN mc USING (l_partkey) JOIN part ON l_partkey = p_partkey
        |WHERE unit_cost = min_cost
        |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 50""".stripMargin,
    "q11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS stock_value
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3'))
        |  GROUP BY l_partkey),
        |t AS (SELECT CAST(SUM(CAST(stock_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value FROM v)
        |SELECT l_partkey, stock_value FROM v, t
        |WHERE stock_value > 0.001 * total_value
        |ORDER BY stock_value DESC, l_partkey""".stripMargin,
    "q8_market_share" ->
      """WITH asia_nk AS (SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |                 WHERE r_name = 'ASIA'),
        |v AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |    AND c_nationkey IN (SELECT n_nationkey FROM asia_nk))
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_nation_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q16_supplier_counts" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |kept AS (SELECT * FROM ps WHERE l_suppkey NOT IN
        |           (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, CAST(p_size % 10 AS BIGINT) AS size_band,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM kept JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |GROUP BY p_brand, p_type, p_size % 10
        |ORDER BY supplier_cnt DESC, p_brand, p_type, size_band LIMIT 30""".stripMargin,
    "q20_excess_supply" ->
      """WITH agg AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_ship,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_ship
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
        |  AND s_suppkey IN (SELECT l_suppkey FROM agg WHERE max_ship > 0.4 * total_ship)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH pos AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS supp_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |late AS (SELECT * FROM pos WHERE supp_late = 1),
        |waiting AS (
        |  SELECT l.l_orderkey, l.l_suppkey FROM late l
        |  WHERE EXISTS (SELECT 1 FROM pos o
        |                WHERE o.l_orderkey = l.l_orderkey AND o.l_suppkey <> l.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late o2
        |                    WHERE o2.l_orderkey = l.l_orderkey AND o2.l_suppkey <> l.l_suppkey))
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}
