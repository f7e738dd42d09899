package graft.oracles

/** DuckDB oracle SQL for the `vec_*` vector/ANN registrations — split out of
  * `SparkEntry` (r12: the registry file had grown past 5k lines; the
  * oracle map is the moved half, merged back verbatim in
  * `SparkEntry.oracleSql`, whose emitted oracle_sql.json is the contract
  * and is diff-checked byte-identical across the split).
  */
private[graft] object VecOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "vec_knn_l2" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank, vec_id, label,
        |  d2 AS dist_sq, 1.0 - d2/2.0 AS similarity
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_dim_extent" ->
      """SELECT i.i AS dim,
        |  MIN(CAST(embedding[i.i + 1] AS DOUBLE)) AS min_v,
        |  MAX(CAST(embedding[i.i + 1] AS DOUBLE)) AS max_v,
        |  CAST(SUM(CASE WHEN embedding[i.i + 1] <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonzero,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM embeddings, (SELECT CAST(unnest(range(0, 64)) AS INT) AS i) i
        |GROUP BY i.i ORDER BY dim""".stripMargin,
    "vec_prefix_rerank" ->
      s"""WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT e AS qe FROM n WHERE vec_id = 0),
        |pref AS (SELECT vec_id, label, e, ${l2sqSql("n.e[1:16]", "q.qe[1:16]")} AS pd2
        |         FROM n, q),
        |cand AS (SELECT * FROM pref ORDER BY pd2, vec_id LIMIT 50),
        |rr AS (SELECT vec_id, label, pd2, ${l2sqSql("cand.e", "q.qe")} AS d2
        |       FROM cand, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank, vec_id, label,
        |  pd2 AS prefix_dist_sq, d2 AS dist_sq
        |FROM (SELECT * FROM rr ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    // Banded SQ join is provably brute force — per-query top-k oracle.
    "vec_sq_knn_join" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS q_vec_id, e AS qe FROM emb WHERE vec_id % 37 = 0),
        |d AS (SELECT q.q_vec_id, emb.vec_id AS c_vec_id,
        |  ${l2sqSql("emb.e", "q.qe")} AS d2 FROM emb, q),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |  ORDER BY d2, c_vec_id) AS rn FROM d)
        |SELECT q_vec_id, CAST(rn AS BIGINT) AS rank, c_vec_id, d2 AS dist_sq
        |FROM r WHERE rn <= 10 ORDER BY q_vec_id, rank""".stripMargin,
    // Exact-config SQ8 must equal brute force — identical oracle to vec_knn_l2.
    "vec_sq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank, vec_id, label,
        |  d2 AS dist_sq, 1.0 - d2/2.0 AS similarity
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_knn_cosine" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label,
        |  ${dotSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} /
        |  (sqrt(${dotSql("CAST(e.embedding AS DOUBLE[])", "CAST(e.embedding AS DOUBLE[])")}) * sqrt(${dotSql("q.qe", "q.qe")})) AS cos
        |  FROM embeddings e, q)
        |SELECT vec_id, label, cos AS cos_sim
        |FROM d ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    // Brute-force top-k over the corpus minus the tombstoned ids — the
    // anti-join is the only piece the plain kNN oracle doesn't already pin.
    "vec_delete_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 41 <> 0)
        |SELECT vec_id, label, d2 AS dist_sq
        |FROM d ORDER BY d2, vec_id LIMIT 10""".stripMargin,
    "vec_range_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, label, d2 AS dist_sq FROM d
        |WHERE d2 <= 1.45 ORDER BY vec_id""".stripMargin,
    // The LAYOUT audit's oracle: the artifact builds at kmeansIters=0, so
    // the on-disk `cell=` assignment IS the deterministic seed rule —
    // replayed here — and centroid cells with no members surface as
    // zero rows (LEFT JOIN from the centroid list, the layout semantics).
    "vec_cell_balance" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |nc AS (SELECT GREATEST(8, LEAST(1024,
        |    CAST(CEIL(COUNT(*) / 256.0) AS BIGINT))) AS n_cells FROM emb),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb
        |  WHERE vec_id < (SELECT n_cells FROM nc)),
        |asn AS (SELECT vec_id, cid AS cell FROM (
        |    SELECT emb.vec_id, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |c AS (SELECT cent.cid AS cell, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_vectors
        |      FROM cent LEFT JOIN (SELECT cell, COUNT(*) AS n FROM asn GROUP BY cell) cnt
        |        ON cent.cid = cnt.cell),
        |tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS total FROM c)
        |SELECT cell, n_vectors,
        |  CAST((n_vectors * (SELECT n_cells FROM nc) * 1000000) // total AS BIGINT) AS load_ppm
        |FROM c, tot ORDER BY cell""".stripMargin,
    // Operator form at the fixed 1024-cell cap: seed assignment + counts +
    // BIGINT floor-div load factor, nonempty cells only (the groupBy form).
    "vec_cell_balance_cap" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 1024),
        |asn AS (SELECT vec_id, cid AS cell FROM (
        |    SELECT emb.vec_id, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM asn GROUP BY cell),
        |tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS total FROM c)
        |SELECT cell, n_vectors,
        |  CAST((n_vectors * 1024 * 1000000) // total AS BIGINT) AS load_ppm
        |FROM c, tot ORDER BY cell""".stripMargin,
    "vec_knn_join" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |nc AS (SELECT GREATEST(8, LEAST(1024,
        |    CAST(CEIL(COUNT(*) / 256.0) AS BIGINT))) AS n_cells FROM emb),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb
        |  WHERE vec_id < (SELECT n_cells FROM nc)),
        |corp AS (SELECT vec_id AS c_vec_id, e AS ce, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |qprobe AS (SELECT vec_id AS q_vec_id, e AS qe, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS prn
        |    FROM emb, cent WHERE emb.vec_id % 37 = 0) WHERE prn <= (SELECT GREATEST(4,
        |      CAST(CEIL(SQRT(n_cells)) AS BIGINT)) FROM nc)),
        |d AS (SELECT q.q_vec_id, c.c_vec_id, ${l2sqSql("q.qe", "c.ce")} AS d2
        |      FROM qprobe q JOIN corp c USING (cell)),
        |r AS (SELECT q_vec_id, c_vec_id, d2,
        |        row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rk
        |      FROM d)
        |SELECT q_vec_id, CAST(rk AS BIGINT) AS rank, c_vec_id, d2 AS dist_sq
        |FROM r WHERE rk <= 10 ORDER BY q_vec_id, rk""".stripMargin,
    // The blocked plan replayed with the different-label predicate between
    // candidate generation and the per-query top-k (rank over d2, id) —
    // anchors = the 256 lowest hash-draw vec_ids (the anchorSample rule).
    "vec_hard_negatives" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |-- autoCells: GREATEST(8, LEAST(1024, CEIL(n/256))) — /256.0 is a
        |-- power-of-two division, exact in both engines
        |nc AS (SELECT GREATEST(8, LEAST(1024,
        |    CAST(CEIL(COUNT(*) / 256.0) AS BIGINT))) AS n_cells FROM emb),
        |anch AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      substr(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8), vec_id) AS ar
        |    FROM emb) WHERE ar <= 256),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb
        |  WHERE vec_id < (SELECT n_cells FROM nc)),
        |corp AS (SELECT vec_id AS c_vec_id, label AS c_label, e AS ce, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.label, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |qprobe AS (SELECT vec_id AS q_vec_id, label AS q_label, e AS qe, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.label, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS prn
        |    FROM emb JOIN anch USING (vec_id), cent) WHERE prn <= (SELECT GREATEST(4,
        |      CAST(CEIL(SQRT(n_cells)) AS BIGINT)) FROM nc)),
        |d AS (SELECT q.q_vec_id, q.q_label, c.c_vec_id, c.c_label,
        |        ${l2sqSql("q.qe", "c.ce")} AS d2
        |      FROM qprobe q JOIN corp c USING (cell)
        |      WHERE q.q_label <> c.c_label),
        |r AS (SELECT q_vec_id, q_label, c_vec_id, c_label, d2,
        |        row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rk
        |      FROM d)
        |SELECT q_vec_id, q_label, CAST(rk AS BIGINT) AS rank, c_vec_id,
        |  c_label AS neg_label, d2 AS dist_sq
        |FROM r WHERE rk <= 5 ORDER BY q_vec_id, rk""".stripMargin,
    // Blocked-plan replay + the integer majority vote (count desc, label
    // asc argmax); the accuracy division is the single trailing double.
    // Votes run for the 256-anchor sample only (the anchorSample rule).
    "vec_label_audit" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |nc AS (SELECT GREATEST(8, LEAST(1024,
        |    CAST(CEIL(COUNT(*) / 256.0) AS BIGINT))) AS n_cells FROM emb),
        |anch AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      substr(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8), vec_id) AS ar
        |    FROM emb) WHERE ar <= 256),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb
        |  WHERE vec_id < (SELECT n_cells FROM nc)),
        |corp AS (SELECT vec_id AS c_vec_id, e AS ce, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |qprobe AS (SELECT vec_id AS q_vec_id, label AS q_label, e AS qe, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.label, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS prn
        |    FROM emb JOIN anch USING (vec_id), cent) WHERE prn <= (SELECT GREATEST(4,
        |      CAST(CEIL(SQRT(n_cells)) AS BIGINT)) FROM nc)),
        |d AS (SELECT q.q_vec_id, q.q_label, c.c_vec_id, ${l2sqSql("q.qe", "c.ce")} AS d2
        |      FROM qprobe q JOIN corp c USING (cell)
        |      WHERE q.q_vec_id <> c.c_vec_id),
        |r AS (SELECT q_vec_id, q_label, c_vec_id,
        |        row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rk
        |      FROM d),
        |lab AS (SELECT t.q_vec_id, t.q_label, e.label AS n_label
        |        FROM r t JOIN emb e ON e.vec_id = t.c_vec_id WHERE t.rk <= 5),
        |v AS (SELECT q_vec_id, q_label, n_label, count(*) AS votes
        |      FROM lab GROUP BY q_vec_id, q_label, n_label),
        |p AS (SELECT q_vec_id, q_label, n_label AS pred_label,
        |        row_number() OVER (PARTITION BY q_vec_id ORDER BY votes DESC, n_label) AS rn
        |      FROM v)
        |SELECT q_label AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(CASE WHEN q_label = pred_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  CAST(sum(CASE WHEN q_label = pred_label THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS acc
        |FROM p WHERE rn = 1 GROUP BY q_label ORDER BY label""".stripMargin,
    // Assignment replay + floor(x*1e6) quantization: multiply is one
    // correctly-rounded IEEE op and floor is exact, so the summed
    // microunits are bit-identical longs in both engines.
    "vec_kmeans_step" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |asn AS (SELECT vec_id, e, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |px AS (SELECT cell, unnest(list_transform(range(1, len(e)+1),
        |         i -> {'d': i, 'v': e[i]})) AS p FROM asn),
        |q AS (SELECT CAST(cell AS BIGINT) AS cell, CAST(p.d AS INT) AS dim,
        |        CAST(floor(p.v * 1000000.0) AS BIGINT) AS v_micro FROM px)
        |SELECT cell, dim, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(v_micro) AS BIGINT) AS sum_micro,
        |  CAST(sum(v_micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean
        |FROM q GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,
    // Two-round Lloyd replay: round-1 assignment + quantized means, the
    // float rounding via CAST(.. AS REAL) (IEEE round-to-nearest — equals
    // Scala .toFloat), empty cells carried from the seed (the LEFT JOIN
    // COALESCE), then round-2 assignment against the updated centroids
    // and the same microunit roll-up as vec_kmeans_step.
    "vec_kmeans_train2" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent0 AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |asn1 AS (SELECT vec_id, e, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent0.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent0.ce")}, cent0.cid) AS arn
        |    FROM emb, cent0) WHERE arn = 1),
        |px1 AS (SELECT cell, unnest(list_transform(range(1, len(e)+1),
        |         i -> {'d': i, 'v': e[i]})) AS p FROM asn1),
        |m1 AS (SELECT cell, p.d AS dim,
        |        CAST(sum(CAST(floor(p.v * 1000000.0) AS BIGINT)) AS BIGINT) AS sm,
        |        CAST(count(*) AS BIGINT) AS n
        |       FROM px1 GROUP BY cell, p.d),
        |cent1 AS (
        |  SELECT c0.cid, list(CAST(CAST(
        |      COALESCE(CAST(m.sm AS DOUBLE) / (CAST(m.n AS DOUBLE) * 1000000.0),
        |        c0.ce[d.i]) AS REAL) AS DOUBLE) ORDER BY d.i) AS ce
        |  FROM cent0 c0
        |  CROSS JOIN (SELECT DISTINCT dim AS i FROM m1) d
        |  LEFT JOIN m1 m ON m.cell = c0.cid AND m.dim = d.i
        |  GROUP BY c0.cid),
        |asn2 AS (SELECT vec_id, e, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.e, cent1.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent1.ce")}, cent1.cid) AS arn
        |    FROM emb, cent1) WHERE arn = 1),
        |px2 AS (SELECT cell, unnest(list_transform(range(1, len(e)+1),
        |         i -> {'d': i, 'v': e[i]})) AS p FROM asn2),
        |q AS (SELECT CAST(cell AS BIGINT) AS cell, CAST(p.d AS INT) AS dim,
        |        CAST(floor(p.v * 1000000.0) AS BIGINT) AS v_micro FROM px2)
        |SELECT cell, dim, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(v_micro) AS BIGINT) AS sum_micro,
        |  CAST(sum(v_micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean
        |FROM q GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,
    // Same assignment replay; the per-cell cap is the declarative
    // row_number window over (draw, vec_id) — the Spark side's bounded
    // top-k aggregate selects the identical rows (8-hex md5 numeric order
    // = lex order; ties fall to vec_id asc in both forms).
    "vec_cluster_sample" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |asn AS (SELECT vec_id, cid AS cell FROM (
        |    SELECT emb.vec_id, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |d AS (SELECT CAST(cell AS BIGINT) AS cell, vec_id,
        |        substr(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8) AS draw FROM asn),
        |r AS (SELECT cell, vec_id, draw,
        |        CAST(row_number() OVER (PARTITION BY cell ORDER BY draw, vec_id) AS BIGINT) AS rank
        |      FROM d)
        |SELECT cell, rank, vec_id, draw FROM r WHERE rank <= 64
        |ORDER BY cell, rank""".stripMargin,
    "vec_outlier_audit" ->
      """WITH v AS (SELECT vec_id, d.d AS dim, CAST(embedding[d.d + 1] AS DOUBLE) AS x
        |  FROM embeddings, range(64) d(d)),
        |med AS (SELECT dim, quantile_cont(x, 0.5) AS med FROM v GROUP BY dim),
        |dev AS (SELECT v.vec_id, v.dim, abs(v.x - med.med) AS ad
        |  FROM v JOIN med USING (dim)),
        |mad AS (SELECT dim, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY dim)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_dims,
        |  MAX(ad / mad.mad) AS max_ratio
        |FROM dev JOIN mad USING (dim)
        |WHERE mad.mad > 0 AND ad > 5.0 * mad.mad
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // The blocked plan replayed (the vec_hard_negatives precedent):
    // autoCells assignment, autoProbe candidacy for the 256-anchor
    // sample, then per-anchor label-masked top-1 on each arm with the
    // (d2, id) tie-break. Anchors missing either arm inside their probed
    // cells drop out in BOTH engines (the inner join) —
    // vec_triplets_exact is the coverage-complete pin.
    "vec_triplets" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |nc AS (SELECT GREATEST(8, LEAST(1024,
        |    CAST(CEIL(COUNT(*) / 256.0) AS BIGINT))) AS n_cells FROM emb),
        |anch AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      substr(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8), vec_id) AS ar
        |    FROM emb) WHERE ar <= 256),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM emb
        |  WHERE vec_id < (SELECT n_cells FROM nc)),
        |corp AS (SELECT vec_id AS c_vec_id, label AS c_label, e AS ce, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.label, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |qprobe AS (SELECT vec_id AS q_vec_id, label AS q_label, e AS qe, cid AS cell FROM (
        |    SELECT emb.vec_id, emb.label, emb.e, cent.cid,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS prn
        |    FROM emb JOIN anch USING (vec_id), cent) WHERE prn <= (SELECT GREATEST(4,
        |      CAST(CEIL(SQRT(n_cells)) AS BIGINT)) FROM nc)),
        |d AS (SELECT q.q_vec_id, q.q_label, c.c_vec_id, c.c_label,
        |        ${l2sqSql("q.qe", "c.ce")} AS d2
        |      FROM qprobe q JOIN corp c USING (cell)
        |      WHERE q.q_vec_id <> c.c_vec_id),
        |pp AS (SELECT q_vec_id, q_label, c_vec_id AS pos_id, d2 AS pos_d2 FROM (
        |    SELECT q_vec_id, q_label, c_vec_id, d2,
        |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rn
        |    FROM d WHERE c_label = q_label) WHERE rn = 1),
        |nn AS (SELECT q_vec_id, c_vec_id AS neg_id, d2 AS neg_d2 FROM (
        |    SELECT q_vec_id, c_vec_id, d2,
        |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rn
        |    FROM d WHERE c_label <> q_label) WHERE rn = 1)
        |SELECT pp.q_vec_id AS anchor_id, pp.q_label AS label, pos_id, pos_d2,
        |  neg_id, neg_d2, neg_d2 - pos_d2 AS margin
        |FROM pp JOIN nn USING (q_vec_id) ORDER BY anchor_id""".stripMargin,
    // PROBE-ALL ≡ brute force, so the oracle is the plain FaceNet
    // definition over (anchor × corpus) — no plan replay: hardest
    // same-label (self excluded by id) and hardest different-label
    // neighbor per anchor, (d2, id) tie-breaks. This entry pins the
    // budgeted entry's semantics AND its anchor coverage: every anchor
    // with both arms anywhere in the corpus must appear.
    "vec_triplets_exact" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |anch AS (SELECT vec_id, label, e FROM (
        |    SELECT vec_id, label, e, row_number() OVER (ORDER BY
        |      substr(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8), vec_id) AS ar
        |    FROM emb) WHERE ar <= 256),
        |d AS (SELECT a.vec_id AS q_vec_id, a.label AS q_label,
        |        c.vec_id AS c_vec_id, c.label AS c_label,
        |        ${l2sqSql("a.e", "c.e")} AS d2
        |      FROM anch a JOIN emb c ON c.vec_id <> a.vec_id),
        |pp AS (SELECT q_vec_id, q_label, c_vec_id AS pos_id, d2 AS pos_d2 FROM (
        |    SELECT q_vec_id, q_label, c_vec_id, d2,
        |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rn
        |    FROM d WHERE c_label = q_label) WHERE rn = 1),
        |nn AS (SELECT q_vec_id, c_vec_id AS neg_id, d2 AS neg_d2 FROM (
        |    SELECT q_vec_id, c_vec_id, d2,
        |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rn
        |    FROM d WHERE c_label <> q_label) WHERE rn = 1)
        |SELECT pp.q_vec_id AS anchor_id, pp.q_label AS label, pos_id, pos_d2,
        |  neg_id, neg_d2, neg_d2 - pos_d2 AS margin
        |FROM pp JOIN nn USING (q_vec_id) ORDER BY anchor_id""".stripMargin,
    "vec_recall_curve" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |asn AS (SELECT vec_id, e, cid FROM (
        |  SELECT emb.vec_id, emb.e, c.cid,
        |    row_number() OVER (PARTITION BY emb.vec_id ORDER BY ${l2sqSql("emb.e", "c.ce")}, c.cid) AS arn
        |  FROM emb, c) WHERE arn = 1),
        |q AS (SELECT vec_id AS qid, e AS qe FROM emb WHERE vec_id >= 10 AND vec_id < 18),
        |nq AS (SELECT COUNT(*) AS n FROM q),
        |brute AS (SELECT qid, vec_id FROM (
        |  SELECT q.qid, a.vec_id,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY ${l2sqSql("a.e", "q.qe")}, a.vec_id) AS rn
        |  FROM q, asn a) WHERE rn <= 10),
        |prank AS (SELECT qid, cid, pr FROM (
        |  SELECT q.qid, c.cid,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY ${l2sqSql("c.ce", "q.qe")}, c.cid) - 1 AS pr
        |  FROM q, c)),
        |budgets AS (SELECT * FROM (VALUES (1),(2),(4),(8)) b(p)),
        |cand AS (SELECT b.p, pk.qid, a.vec_id, ${l2sqSql("a.e", "q2.qe")} AS d2
        |  FROM budgets b, prank pk
        |  JOIN asn a ON a.cid = pk.cid
        |  JOIN q q2 ON q2.qid = pk.qid
        |  WHERE pk.pr < b.p),
        |topp AS (SELECT p, qid, vec_id FROM (
        |  SELECT p, qid, vec_id,
        |    row_number() OVER (PARTITION BY p, qid ORDER BY d2, vec_id) AS rn
        |  FROM cand) WHERE rn <= 10)
        |SELECT CAST(p AS BIGINT) AS n_probe,
        |  CAST(nq.n AS BIGINT) AS n_queries,
        |  CAST(COUNT(*) AS BIGINT) AS hits,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(10 * nq.n AS DOUBLE) AS recall
        |FROM topp JOIN brute USING (qid, vec_id), nq
        |GROUP BY p, nq.n ORDER BY n_probe""".stripMargin,
    "vec_ivf_search" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
        |q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
        |asn AS (SELECT vec_id, label, e, cid FROM (
        |  SELECT emb.vec_id, emb.label, emb.e, c.cid,
        |    row_number() OVER (PARTITION BY emb.vec_id ORDER BY ${l2sqSql("emb.e", "c.ce")}, c.cid) AS arn
        |  FROM emb, c) WHERE arn = 1),
        |probe AS (SELECT cid FROM (SELECT c.cid, ${l2sqSql("c.ce", "q.qe")} AS qd2 FROM c, q ORDER BY qd2, cid LIMIT 2))
        |SELECT vec_id, label, cid, d2 AS dist_sq FROM (
        |  SELECT a.vec_id, a.label, a.cid, ${l2sqSql("a.e", "q.qe")} AS d2
        |  FROM asn a JOIN probe USING (cid), q
        |  ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_dup_pairs" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n)
        |SELECT vec_id_a, vec_id_b, cos AS cos_sim FROM (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.42 ORDER BY vec_id_a, vec_id_b""".stripMargin,
    // Brute-force cross-side cosine (candidacy is total in the operator —
    // broadcast bench side — so this is recall-free); argmax = highest
    // cos then lowest bench_id, mirrored as row_number. The corpus-side
    // norm guard mirrors semanticDecontam's pass-through-unflagged rule
    // for degenerate (zero/NaN-norm) corpus vectors — pinned in the
    // contract rather than left data-dependent: without it a degenerate
    // corpus row would flag in DuckDB (NaN compares greater) but not in
    // Spark.
    "vec_decontam" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n),
        |p AS (SELECT c.vec_id, b.vec_id AS bench_id,
        |    ${dotSql("c.e", "b.e")} / (c.nrm * b.nrm) AS cos
        |  FROM m c JOIN m b ON c.vec_id % 97 <> 0 AND b.vec_id % 97 = 0
        |    AND c.nrm > 0 AND NOT isnan(c.nrm))
        |SELECT vec_id, bench_id, cos AS cos_sim FROM (
        |  SELECT vec_id, bench_id, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
        |  FROM p WHERE cos >= 0.35) WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // Sign-pattern regions over the raw floats, hashDraw order, cap 8 —
    // every piece is engine-portable, so the oracle mirrors the rule.
    "vec_diverse_sample" ->
      """WITH b AS (SELECT vec_id,
        |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
        |  (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
        |  (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
        |  (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket,
        |  substring(md5('graft|' || CAST(vec_id AS VARCHAR)), 1, 8) AS draw
        |  FROM embeddings),
        |r AS (SELECT bucket, vec_id,
        |  row_number() OVER (PARTITION BY bucket ORDER BY draw, vec_id) AS rk FROM b)
        |SELECT CAST(bucket AS INTEGER) AS bucket, CAST(rk AS BIGINT) AS draw_rank, vec_id
        |FROM r WHERE rk <= 8 ORDER BY bucket, draw_rank""".stripMargin,
    "vec_semantic_dedup" ->
      s"""WITH RECURSIVE n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n),
        |p AS (SELECT vec_id_a, vec_id_b FROM (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id) WHERE cos >= 0.42),
        |edges AS (SELECT vec_id_a AS src, vec_id_b AS dst FROM p
        |          UNION SELECT vec_id_b, vec_id_a FROM p),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS label FROM nodes
        |          UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
        |sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
        |SELECT emb.vec_id, COALESCE(s.cluster_size, 1) AS cluster_size
        |FROM embeddings emb
        |LEFT JOIN cc ON cc.id = emb.vec_id
        |LEFT JOIN sizes s ON s.cluster_id = emb.vec_id
        |WHERE cc.id IS NULL OR cc.cluster_id = emb.vec_id
        |ORDER BY emb.vec_id""".stripMargin,
    "vec_rplsh_pairs" ->
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, list_transform(embedding, x -> x + x) AS embedding
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM u),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n)
        |SELECT vec_id_a, vec_id_b, cos AS cos_sim FROM (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.9 ORDER BY vec_id_a, vec_id_b""".stripMargin,
    "vec_pq_build" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS n_codes
        |FROM embeddings""".stripMargin,
    "vec_pq_fast_build" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS n_codes
        |FROM embeddings""".stripMargin,
    "vec_pq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT vec_id, label, d2 AS dist_sq
        |FROM d ORDER BY d2, vec_id LIMIT 10""".stripMargin,
    "vec_pq_knn_join" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS q_vec_id, e AS qe FROM emb WHERE vec_id % 37 = 0),
        |d AS (SELECT q.q_vec_id, c.vec_id AS c_vec_id, ${l2sqSql("q.qe", "c.e")} AS d2
        |      FROM q, emb c),
        |r AS (SELECT q_vec_id, c_vec_id, d2,
        |        row_number() OVER (PARTITION BY q_vec_id ORDER BY d2, c_vec_id) AS rk
        |      FROM d)
        |SELECT q_vec_id, CAST(rk AS BIGINT) AS rank, c_vec_id, d2 AS dist_sq
        |FROM r WHERE rk <= 10 ORDER BY q_vec_id, rk""".stripMargin,
    // Budgeted IVF-PQ serve plan REPLAYED (probe 2 seed cells → residual
    // ADC over seed codebooks → refine 40 → exact top-10), against the
    // seed-sidecar artifact (kmeansIters = 0, pqIters = 0 — the one
    // training mode whose sidecars are cross-engine exact). Residuals are
    // f32 subtraction in BOTH engines (DuckDB REAL − REAL stays REAL);
    // every distance/LUT/ADC fold is sequential double arithmetic
    // (list_sum ≡ the Spark aggregate fold); codes and probes tie-break
    // (distance, id) exactly as the Scala argmin structs.
    "vec_pq_search_fast" ->
      s"""WITH emb AS (SELECT vec_id, label, embedding AS ef, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, embedding AS cef, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings WHERE vec_id < 8),
        |asn AS (SELECT vec_id, label, ef, e, cid AS cell, cef FROM (
        |    SELECT emb.vec_id, emb.label, emb.ef, emb.e, cent.cid, cent.cef,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY ${l2sqSql("emb.e", "cent.ce")}, cent.cid) AS arn
        |    FROM emb, cent) WHERE arn = 1),
        |res AS (SELECT vec_id, label, e, cell,
        |          CAST(list_transform(list_zip(ef, cef), x -> x[1] - x[2]) AS DOUBLE[]) AS rd
        |        FROM asn),
        |seeds AS (SELECT rd, row_number() OVER (ORDER BY vec_id) - 1 AS j
        |          FROM res ORDER BY vec_id LIMIT 16),
        |book AS (SELECT s.s, seeds.j, list_slice(seeds.rd, s.s*8 + 1, s.s*8 + 8) AS bv
        |         FROM seeds, range(8) s(s)),
        |codes AS (SELECT vec_id, list(code ORDER BY s) AS codes FROM (
        |    SELECT r.vec_id, b.s, b.j AS code,
        |      row_number() OVER (PARTITION BY r.vec_id, b.s
        |        ORDER BY ${l2sqSql("list_slice(r.rd, b.s*8+1, b.s*8+8)", "b.bv")}, b.j) AS rn
        |    FROM res r, book b) WHERE rn = 1 GROUP BY vec_id),
        |q AS (SELECT ef AS qf, e AS qe FROM emb WHERE vec_id = 0),
        |probe AS (SELECT cid, cef FROM (
        |    SELECT cent.cid, cent.cef,
        |      row_number() OVER (ORDER BY ${l2sqSql("cent.ce", "q.qe")}, cent.cid) AS pr
        |    FROM cent, q) WHERE pr <= 2),
        |qres AS (SELECT probe.cid,
        |    CAST(list_transform(list_zip(q.qf, probe.cef), x -> x[1] - x[2]) AS DOUBLE[]) AS qr
        |  FROM probe, q),
        |lut AS (SELECT cid, list(v ORDER BY s, j) AS lv FROM (
        |    SELECT qres.cid, b.s, b.j,
        |      ${l2sqSql("list_slice(qres.qr, b.s*8+1, b.s*8+8)", "b.bv")} AS v
        |    FROM qres, book b) GROUP BY cid),
        |adc AS (SELECT a.vec_id,
        |          list_sum(list_transform(range(0, 8), s -> l.lv[s*16 + c.codes[s+1] + 1])) AS adc_d2
        |        FROM asn a JOIN codes c USING (vec_id) JOIN lut l ON l.cid = a.cell),
        |cand AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY adc_d2, vec_id) AS rn FROM adc)
        |  WHERE rn <= 40),
        |d AS (SELECT a.vec_id, a.label, a.cell, ${l2sqSql("a.e", "q.qe")} AS d2
        |      FROM asn a JOIN cand USING (vec_id), q),
        |r AS (SELECT vec_id, label, cell, d2,
        |        row_number() OVER (ORDER BY d2, vec_id) AS rk FROM d)
        |SELECT vec_id, label, CAST(cell AS BIGINT) AS cell, d2 AS dist_sq
        |FROM r WHERE rk <= 10 ORDER BY d2, vec_id""".stripMargin,
    // Budgeted SQ8 serve plan REPLAYED over the trained per-dim (min, max)
    // bounds (exact in any engine): encode = clamp + round (HALF_UP ≡
    // away-from-zero on the non-negative clamped range), decode, ADC rank,
    // refine 80, exact top-10 + the verbatim 1 − d/2 similarity.
    "vec_sq_search_fast" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |b AS (SELECT d.d AS dim, MIN(e[d.d + 1]) AS lo, MAX(e[d.d + 1]) AS hi
        |      FROM emb, range(64) d(d) GROUP BY d.d),
        |ba AS (SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his FROM b),
        |q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
        |dec AS (SELECT emb.vec_id, emb.label,
        |          list_transform(range(1, 65), i ->
        |            ba.los[i] + ((CASE WHEN ba.his[i] - ba.los[i] > 0
        |              THEN round(least(255.0, greatest(0.0,
        |                ((emb.e[i] - ba.los[i]) * 255.0) / (ba.his[i] - ba.los[i]))))
        |              ELSE 0.0 END) * (ba.his[i] - ba.los[i])) / 255.0) AS de
        |        FROM emb, ba),
        |a AS (SELECT dec.vec_id, ${l2sqSql("dec.de", "q.qe")} AS adc FROM dec, q),
        |cand AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY adc, vec_id) AS rn FROM a)
        |  WHERE rn <= 80),
        |d AS (SELECT emb.vec_id, emb.label, ${l2sqSql("emb.e", "q.qe")} AS d2
        |      FROM emb JOIN cand USING (vec_id), q),
        |r AS (SELECT vec_id, label, d2, row_number() OVER (ORDER BY d2, vec_id) AS rk FROM d)
        |SELECT CAST(rk AS BIGINT) AS rank, vec_id, label, d2 AS dist_sq,
        |  1.0 - d2 / 2.0 AS similarity
        |FROM r WHERE rk <= 10 ORDER BY rank""".stripMargin,
    // Same trained-bounds encode→decode replay as vec_sq_search_fast; the
    // analytic bound mirrors decodeErrorBound's dim-ordered sum + 1e-4.
    "vec_quant_error" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |b AS (SELECT d.d AS dim, MIN(e[d.d + 1]) AS lo, MAX(e[d.d + 1]) AS hi
        |      FROM emb, range(64) d(d) GROUP BY d.d),
        |ba AS (SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his FROM b),
        |dec AS (SELECT emb.vec_id,
        |          list_transform(range(1, 65), i ->
        |            ba.los[i] + ((CASE WHEN ba.his[i] - ba.los[i] > 0
        |              THEN round(least(255.0, greatest(0.0,
        |                ((emb.e[i] - ba.los[i]) * 255.0) / (ba.his[i] - ba.los[i]))))
        |              ELSE 0.0 END) * (ba.his[i] - ba.los[i])) / 255.0) AS de
        |        FROM emb, ba),
        |e2 AS (SELECT emb.vec_id, ${l2sqSql("dec.de", "emb.e")} AS err2
        |       FROM emb JOIN dec USING (vec_id)),
        |bound AS (SELECT sqrt(list_sum(list_transform(range(1, 65), i ->
        |    ((ba.his[i] - ba.los[i]) / 510.0) * ((ba.his[i] - ba.los[i]) / 510.0))))
        |    + 0.0001 AS bnd FROM ba)
        |SELECT CAST(rank AS BIGINT) AS rank, vec_id, err2,
        |  sqrt(err2) <= bnd AS within_bound
        |FROM (SELECT vec_id, err2,
        |        row_number() OVER (ORDER BY err2 DESC, vec_id) AS rank FROM e2), bound
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "vec_index_prune" ->
      """WITH idx AS (SELECT vec_id, DATE '2024-01-01' + CAST(vec_id % 10 AS INT) AS ingest_date FROM embeddings),
        |mx AS (SELECT max(ingest_date) AS mxd FROM idx)
        |SELECT strftime(ingest_date, '%Y-%m-%d') AS ingest_day,
        |  COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
        |FROM idx, mx WHERE ingest_date > mxd - 7
        |GROUP BY ingest_date ORDER BY 1""".stripMargin,
    "vec_index_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    // Flat-index deletes: the retained window is vec_id % 10 >= 3 (dates
    // 2024-01-01 + vec_id % 10, anchored at the max present day, 7-day
    // window), minus the vec_id % 41 == 0 tombstones.
    "vec_flat_delete_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 3),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 10 >= 3 AND e.vec_id % 41 <> 0)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    // Microunit quantization + exact long pair sums — bit-identical in any
    // engine (floor(x·1e6): multiply is one correctly-rounded IEEE op,
    // floor is exact; everything after is integer).
    "vec_covariance" ->
      """WITH q AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM embeddings),
        |p AS (SELECT i.i AS dim_i, j.j AS dim_j, qv[i.i + 1] AS qi, qv[j.j + 1] AS qj
        |  FROM q, range(64) i(i), range(64) j(j) WHERE j.j >= i.i)
        |SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
        |  COUNT(*) AS n_rows, CAST(SUM(qi) AS BIGINT) AS sum_qi,
        |  CAST(SUM(qj) AS BIGINT) AS sum_qj,
        |  CAST(SUM(qi * qj) AS BIGINT) AS sum_qq
        |FROM p GROUP BY dim_i, dim_j ORDER BY dim_i, dim_j""".stripMargin,
    // The vector gate's three-tier decision replayed brute-force (probe-all
    // makes candidacy total): within-batch identical-embedding min-id →
    // cos ≥ 0.95 vs any resident → ingested. Every batch construction is
    // rounding-free (x+x, sign flip, reverse), so float→double casts agree.
    "vec_ivf_ingest" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (
        |  SELECT vec_id + 4000000 AS vec_id, v FROM e WHERE vec_id % 29 = 0
        |  UNION ALL SELECT vec_id + 5000000, list_transform(v, x -> x * 2)
        |    FROM e WHERE vec_id % 58 = 0
        |  UNION ALL SELECT vec_id + 6000000, list_transform(v, x -> x * 2)
        |    FROM e WHERE vec_id % 58 = 0
        |  UNION ALL SELECT vec_id + 7000000, [-v[1]] || v[2:]
        |    FROM e WHERE vec_id % 87 = 0
        |  UNION ALL SELECT vec_id + 8000000, list_reverse(v) FROM e WHERE vec_id % 29 = 0),
        |keep AS (SELECT v, MIN(vec_id) AS keep_id FROM b GROUP BY v),
        |near AS (
        |  SELECT DISTINCT b.vec_id FROM b, e
        |  WHERE ${dotSql("b.v", "e.v")} /
        |    (sqrt(${dotSql("b.v", "b.v")}) * sqrt(${dotSql("e.v", "e.v")})) >= 0.95)
        |SELECT b.vec_id,
        |  CASE WHEN b.vec_id > k.keep_id THEN 'batch_dup'
        |       WHEN n.vec_id IS NOT NULL THEN 'near_dup'
        |       ELSE 'ingested' END AS verdict
        |FROM b JOIN keep k ON k.v = b.v
        |LEFT JOIN near n ON n.vec_id = b.vec_id
        |ORDER BY b.vec_id""".stripMargin,
    // Each of the four kinds reorganizes the same retained window
    // (vec_id % 10 >= 3, the fromEmbeddings date spread); codes-per-row is
    // structural — 8 PQ subcodes (ivfpq/opq), d SQ8 codes (sq), none (ivf).
    "vec_serve_build" ->
      """WITH w AS (SELECT vec_id, len(embedding) AS d FROM embeddings
        |  WHERE vec_id % 10 >= 3)
        |SELECT k.kind, CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(count(DISTINCT vec_id) AS BIGINT) AS n_distinct_ids,
        |  CAST(sum(CASE k.kind WHEN 'ivf' THEN 0 WHEN 'sq' THEN d ELSE 8 END)
        |    AS BIGINT) AS n_codes
        |FROM (VALUES ('ivf'),('ivfpq'),('opq'),('sq')) k(kind) CROSS JOIN w
        |GROUP BY k.kind ORDER BY kind""".stripMargin,
    // Serve-sidecar probe-all = brute force over the retained window
    // (vec_id % 10 >= 3, the fromEmbeddings date spread) — recall-
    // independent because every cell is probed and the hot day is scanned.
    "vec_serve_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 5),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 10 >= 3)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    // PQ serve path, probe-all + window-covering refine ≡ brute force —
    // recall-independent like vec_pq_search: the ADC stage only SELECTS
    // candidates, the output distances are the exact float re-rank.
    "vec_serve_opq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 11),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 10 >= 3)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    "vec_serve_pq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 7),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 10 >= 3)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
    // SQ8 serve path, probe-all + window-covering refine ≡ brute force —
    // the dequantized ADC stage only SELECTS candidates; output distances
    // are the exact float re-rank (the vec_serve_pq_search rationale).
    "vec_serve_sq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 9),
        |d AS (SELECT e.vec_id, e.label, ${l2sqSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} AS d2
        |      FROM embeddings e, q WHERE e.vec_id % 10 >= 3)
        |SELECT CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank,
        |  1.0 - d2/2.0 AS similarity_score,
        |  'embedding' AS data_type,
        |  '{"vec_id":' || vec_id || ',"label":' || label || '}' AS data_json
        |FROM (SELECT * FROM d ORDER BY d2, vec_id LIMIT 10) ORDER BY d2, vec_id""".stripMargin,
  )
}
