package graft.oracles

/** DuckDB oracle SQL for the `ev_*` events-analytics registrations — split out of
  * `SparkEntry` (r12: the registry file had grown past 5k lines; the
  * oracle map is the moved half, merged back verbatim in
  * `SparkEntry.oracleSql`, whose emitted oracle_sql.json is the contract
  * and is diff-checked byte-identical across the split).
  */
private[graft] object EvOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "ev_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_resample_hourly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |ext AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |  date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |grid AS (SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |    (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM ext) g)
        |SELECT grid.event_type, strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
        |  COALESCE(sv, 0.0) AS sum_value,
        |  last_value(sv IGNORE NULLS) OVER (PARTITION BY grid.event_type
        |    ORDER BY grid.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS ffill_value
        |FROM grid LEFT JOIN hourly
        |  ON grid.event_type = hourly.event_type AND grid.h = hourly.h
        |ORDER BY 1, 2""".stripMargin,
    "ev_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts1
        |    AND epoch_us(e.ts) - epoch_us(s1.ts1) <= 43200000000
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.ts2
        |    AND epoch_us(e.ts) - epoch_us(s2.ts2) <= 43200000000
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s1.user_id,
        |  strftime(ts1, '%Y-%m-%d %H:%M:%S') AS t1,
        |  strftime(ts2, '%Y-%m-%d %H:%M:%S') AS t2,
        |  strftime(ts3, '%Y-%m-%d %H:%M:%S') AS t3
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "ev_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.ts2
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s1.user_id,
        |  strftime(ts1, '%Y-%m-%d %H:%M:%S') AS t1,
        |  strftime(ts2, '%Y-%m-%d %H:%M:%S') AS t2,
        |  strftime(ts3, '%Y-%m-%d %H:%M:%S') AS t3
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "ev_cohort_retention" ->
      """WITH signup AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |sz AS (SELECT cw, COUNT(*) AS cohort_size FROM signup GROUP BY 1),
        |act AS (SELECT DISTINCT s.cw,
        |    CAST(date_diff('day', s.cw, date_trunc('week', e.ts)) / 7 AS INT)
        |      AS week_offset,
        |    e.user_id
        |  FROM events e JOIN signup s ON e.user_id = s.user_id
        |  WHERE date_trunc('week', e.ts) >= s.cw),
        |ret AS (SELECT cw, week_offset, COUNT(*) AS n_active FROM act GROUP BY 1, 2)
        |SELECT CAST(ret.cw AS DATE) AS cohort_week, week_offset,
        |  CAST(n_active AS BIGINT) AS n_active,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
        |FROM ret JOIN sz ON ret.cw = sz.cw
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "ev_anomalous_hours" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ext AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |  date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |grid AS (SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |    (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM ext) g),
        |series AS (SELECT grid.event_type, grid.h, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
        |  FROM grid LEFT JOIN hourly
        |    ON grid.event_type = hourly.event_type AND grid.h = hourly.h),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(SUM(CAST(n_events AS DECIMAL(18,2))) AS DOUBLE) AS sc,
        |    CAST(SUM(CAST(n_events AS DECIMAL(18,2)) * CAST(n_events AS DECIMAL(18,2))) AS DOUBLE) AS scc
        |  FROM series GROUP BY 1),
        |zt AS (SELECT s.event_type, s.h, s.n_events,
        |    sc / CAST(n_hours AS DOUBLE) AS mean_events,
        |    sqrt(scc / CAST(n_hours AS DOUBLE)
        |      - (sc / CAST(n_hours AS DOUBLE)) * (sc / CAST(n_hours AS DOUBLE))) AS sd_events
        |  FROM series s JOIN st ON s.event_type = st.event_type)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts, n_events,
        |  mean_events, sd_events,
        |  (CAST(n_events AS DOUBLE) - mean_events) / sd_events AS z
        |FROM zt
        |WHERE sd_events > 0
        |  AND abs((CAST(n_events AS DOUBLE) - mean_events) / sd_events) >= 2.0
        |ORDER BY event_type, hour_ts""".stripMargin,
    "ev_rolling_wau" ->
      """WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |ext AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |grid AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM ext),
        |contrib AS (SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |    CAST(day + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day, user_id
        |  FROM daily)
        |SELECT g.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users
        |FROM grid g LEFT JOIN contrib c ON g.day = c.day
        |GROUP BY g.day ORDER BY g.day""".stripMargin,
    "ev_transition_matrix" ->
      """WITH seq AS (SELECT user_id, event_type AS a,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        |  FROM events),
        |c AS (SELECT a, b, COUNT(*) AS n FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT a, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.a AS from_type, c.b AS to_type, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
        |FROM c JOIN t ON c.a = t.a
        |ORDER BY from_type, to_type""".stripMargin,
    "ev_ab_test" ->
      """WITH u AS (SELECT user_id, user_id % 2 AS arm,
        |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS x FROM u GROUP BY arm),
        |w AS (SELECT
        |  (SELECT n FROM arms WHERE arm = 0) AS n_a,
        |  (SELECT x FROM arms WHERE arm = 0) AS x_a,
        |  (SELECT n FROM arms WHERE arm = 1) AS n_b,
        |  (SELECT x FROM arms WHERE arm = 1) AS x_b)
        |SELECT n_a, x_a, CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        |  n_b, x_b, CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        |  CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
        |    (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  ELSE NULL END AS z
        |FROM w""".stripMargin,
    "ev_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g
        |)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_sliding_qtr" ->
      """WITH e AS (SELECT *, TIMESTAMP '1970-01-01'
        |    + CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 * INTERVAL 1 SECOND AS b15 FROM events),
        |x AS (SELECT event_type, value, b15 - k * INTERVAL 15 MINUTE AS window_start
        |      FROM e CROSS JOIN range(0, 4) t(k))
        |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_json_buckets" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  COUNT(*) AS n_events, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_top_users" ->
      """SELECT user_id, c_name,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  COUNT(*) AS n_events
        |FROM events JOIN customer ON user_id + 1 = c_custkey
        |GROUP BY user_id, c_name ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    "ev_conversion_latency" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT DISTINCT user_id AS v_user, ts AS v_ts FROM events
        |      WHERE event_type = 'view'),
        |m AS (SELECT epoch_us(p.ts) - epoch_us(v.v_ts) AS lat_us
        |  FROM p ASOF JOIN v ON p.user_id = v.v_user AND p.ts >= v.v_ts)
        |SELECT CAST(0.5 AS DOUBLE) AS q, quantile_cont(lat_us, 0.5) AS latency_us FROM m
        |UNION ALL SELECT CAST(0.9 AS DOUBLE), quantile_cont(lat_us, 0.9) FROM m
        |UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_cont(lat_us, 0.99) FROM m
        |ORDER BY q""".stripMargin,
    "ev_asof_join" ->
"""WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(DATE '1995-01-01' + CAST(event_id % 2400 AS INT) AS TIMESTAMP) AS evt_ts FROM events),
        |o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |      FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.event_type,
        |  strftime(e.evt_ts, '%Y-%m-%d %H:%M:%S') AS evt_ts,
        |  o.o_orderkey AS asof_o_orderkey
        |FROM e ASOF LEFT JOIN o
        |  ON e.user_id + 1 = o.o_custkey AND e.evt_ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "ev_range_join" ->
      """WITH e AS (SELECT event_id, user_id,
        |    DATE '1995-01-01' + CAST(event_id % 2400 AS INT) AS evt_date FROM events),
        |o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, max(o_orderkey) AS o_orderkey
        |      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE))
        |SELECT e.event_id, o.o_orderkey,
        |  CAST(date_diff('day', o.o_date, e.evt_date) AS BIGINT) AS day_diff
        |FROM e JOIN o ON e.user_id + 1 = o.o_custkey
        |  AND abs(date_diff('day', o.o_date, e.evt_date)) <= 7
        |ORDER BY e.event_id, o.o_orderkey""".stripMargin,
    "ev_topk_per_user" ->
      """SELECT user_id, CAST(pos AS BIGINT) AS rank, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS pos
        |  FROM events) WHERE pos <= 3 ORDER BY user_id, pos""".stripMargin,
    // Oracle reads the RAW events table — the z-ordered layout must be a
    // content-identical rewrite.
    "ev_zorder_scan" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id BETWEEN 100 AND 163 AND value >= 50.0
        |ORDER BY event_id""".stripMargin,
  )
}
