package graft.oracles

/** DuckDB oracle SQL for the `doc_*` text-pipeline registrations — split out of
  * `SparkEntry` (r12: the registry file had grown past 5k lines; the
  * oracle map is the moved half, merged back verbatim in
  * `SparkEntry.oracleSql`, whose emitted oracle_sql.json is the contract
  * and is diff-checked byte-identical across the split).
  */
private[graft] object DocOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "doc_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM all_docs GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY keep_id""".stripMargin,
    "doc_minhash_pairs" ->
      s"""WITH $minhashCtes
        |SELECT doc_a, doc_b, n_shared_bands, jaccard FROM ($minhashScored)
        |WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""".stripMargin,
    "doc_dedup_report" ->
      s"""WITH $minhashCtes,
        |near AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs
        |  FROM ($minhashScored) WHERE jaccard >= 0.3),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |ex AS (SELECT
        |    CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
        |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
        |  FROM (SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY 1))
        |SELECT n_docs, n_exact_dup_docs, n_dup_groups, n_near_dup_pairs,
        |  CAST(n_exact_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS exact_dup_frac
        |FROM tot, ex, near""".stripMargin,
    "doc_vec_agreement" ->
      s"""WITH $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b, jaccard FROM ($minhashScored)
        |  WHERE jaccard >= 0.3),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |m AS (SELECT vec_id, ev, sqrt(${dotSql("ev", "ev")}) AS nrm FROM e)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        |  ${dotSql("a.ev", "b.ev")} / (a.nrm * b.nrm) AS cos_sim,
        |  ${dotSql("a.ev", "b.ev")} / (a.nrm * b.nrm) >= 0.42 AS vec_agrees
        |FROM pairs p JOIN m a ON p.doc_a = a.vec_id JOIN m b ON p.doc_b = b.vec_id
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "doc_split_leakage" ->
      s"""WITH $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b, jaccard FROM ($minhashScored)
        |  WHERE jaccard >= 0.3),
        |sp AS (SELECT doc_id,
        |  CASE WHEN substr(md5('graft|' || doc_id), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5('graft|' || doc_id), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split FROM documents)
        |SELECT doc_a, doc_b, a.split AS split_a, b.split AS split_b, jaccard
        |FROM pairs JOIN sp a ON doc_a = a.doc_id JOIN sp b ON doc_b = b.doc_id
        |WHERE a.split <> b.split ORDER BY doc_a, doc_b""".stripMargin,
    "doc_incr_dedup_build" ->
      """WITH rw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |rsh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM rw))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM rsh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_incr_dedup_query" ->
      """WITH batch AS (SELECT doc_id + 2000000 AS doc_id,
        |    CASE WHEN doc_id % 20 = 0 THEN text ELSE text || ' zz yy xx' END AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |rw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |rsh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM rw)),
        |rmh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
        |  FROM rsh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
        |rbands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key FROM rmh GROUP BY doc_id, h // 3),
        |bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM batch WHERE len(string_split(text, ' ')) >= 3),
        |bsh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM bw)),
        |bmh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
        |  FROM bsh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
        |bbands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key FROM bmh GROUP BY doc_id, h // 3),
        |cand AS (SELECT b.doc_id AS batch_doc_id, r.doc_id AS resident_doc_id, COUNT(*) AS n_shared_bands
        |  FROM bbands b JOIN rbands r ON b.band_id = r.band_id AND b.band_key = r.band_key AND b.doc_id <> r.doc_id
        |  GROUP BY 1, 2),
        |rsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM rsh GROUP BY doc_id),
        |bsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM bsh GROUP BY doc_id),
        |inter AS (SELECT c.batch_doc_id, c.resident_doc_id, c.n_shared_bands, COUNT(*) AS n_inter
        |  FROM cand c JOIN bsh sa ON sa.doc_id = c.batch_doc_id
        |  JOIN rsh sb ON sb.doc_id = c.resident_doc_id AND sa.shingle = sb.shingle
        |  GROUP BY 1, 2, 3),
        |scored AS (SELECT i.batch_doc_id, i.resident_doc_id, i.n_shared_bands,
        |    CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS jaccard
        |  FROM inter i JOIN bsizes na ON na.doc_id = i.batch_doc_id JOIN rsizes nb ON nb.doc_id = i.resident_doc_id)
        |SELECT s.batch_doc_id, s.resident_doc_id, s.n_shared_bands, s.jaccard,
        |  (md5(b.text) = md5(r.text)) AS is_exact
        |FROM scored s
        |JOIN batch b ON b.doc_id = s.batch_doc_id
        |JOIN documents r ON r.doc_id = s.resident_doc_id
        |WHERE s.jaccard >= 0.3
        |ORDER BY s.batch_doc_id, s.resident_doc_id""".stripMargin,
    // The four-tier ingest DECISION replayed: within-batch md5 groups
    // (min-id keeps), resident exact md5s, the LSH band + shingle-Jaccard
    // verify (the doc_incr_dedup_query construction over the remaining
    // candidates), then the winnow overlap tier (k=3/w=4 fingerprints,
    // resident df ≤ 1000, ≥ 3 shared) — coalesced exactly as the gate
    // coalesces.
    "doc_incr_dedup_ingest" ->
      """WITH res AS (SELECT doc_id, text FROM documents),
        |b0 AS (
        |  SELECT doc_id + 3000000 AS doc_id, text FROM documents WHERE doc_id % 40 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' zz yy xx' FROM documents WHERE doc_id % 40 = 10
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    array_to_string(string_split(text, ' ')[6:25], ' ') ||
        |    ' q' || doc_id || 'a q' || doc_id || 'b q' || doc_id || 'c q' || doc_id ||
        |    'd q' || doc_id || 'e q' || doc_id || 'f q' || doc_id || 'g q' || doc_id || 'h'
        |  FROM documents WHERE doc_id % 40 = 20
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    'u' || doc_id || 'a u' || doc_id || 'b u' || doc_id || 'c u' || doc_id ||
        |    'd u' || doc_id || 'e u' || doc_id || 'f'
        |  FROM documents WHERE doc_id % 40 = 30
        |  UNION ALL
        |  SELECT doc_id + 3500000, text FROM documents WHERE doc_id % 80 = 0),
        |bl AS (SELECT b.doc_id FROM b0 b
        |  JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM b0 GROUP BY 1) g
        |  ON md5(b.text) = g.h AND b.doc_id <> g.keep_id),
        |c1 AS (SELECT * FROM b0 WHERE doc_id NOT IN (SELECT doc_id FROM bl)),
        |ex AS (SELECT doc_id FROM c1 WHERE md5(text) IN (SELECT md5(text) FROM res)),
        |c2 AS (SELECT * FROM c1 WHERE doc_id NOT IN (SELECT doc_id FROM ex)),
        |rw AS (SELECT doc_id, string_split(text, ' ') AS w FROM res WHERE len(string_split(text, ' ')) >= 3),
        |rsh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM rw)),
        |rmh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
        |  FROM rsh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
        |rbands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key FROM rmh GROUP BY doc_id, h // 3),
        |bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM c2 WHERE len(string_split(text, ' ')) >= 3),
        |bsh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM bw)),
        |bmh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
        |  FROM bsh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
        |bbands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key FROM bmh GROUP BY doc_id, h // 3),
        |cand AS (SELECT b.doc_id AS bid, r.doc_id AS rid
        |  FROM bbands b JOIN rbands r ON b.band_id = r.band_id AND b.band_key = r.band_key AND b.doc_id <> r.doc_id
        |  GROUP BY 1, 2),
        |rsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM rsh GROUP BY doc_id),
        |bsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM bsh GROUP BY doc_id),
        |inter AS (SELECT c.bid, c.rid, COUNT(*) AS n_inter
        |  FROM cand c JOIN bsh sa ON sa.doc_id = c.bid
        |  JOIN rsh sb ON sb.doc_id = c.rid AND sa.shingle = sb.shingle
        |  GROUP BY 1, 2),
        |nd AS (SELECT DISTINCT i.bid AS doc_id FROM inter i
        |  JOIN bsizes na ON na.doc_id = i.bid JOIN rsizes nb ON nb.doc_id = i.rid
        |  WHERE CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) >= 0.3),
        |c3 AS (SELECT * FROM c2 WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        |rt AS (SELECT doc_id, string_split(text, ' ') AS w FROM res),
        |rg AS (SELECT doc_id, list_transform(range(1, len(w)-3+2), i -> md5(array_to_string(w[i:i+2], ' '))) AS gh FROM rt WHERE len(w) >= 3),
        |rf AS (SELECT doc_id, list_distinct(list_transform(range(1, len(gh)-4+2), j -> list_min(gh[j:j+3]))) AS fps FROM rg WHERE len(gh) >= 4),
        |re0 AS (SELECT doc_id, unnest(fps) AS fp FROM rf),
        |rare AS (SELECT fp FROM re0 GROUP BY fp HAVING COUNT(*) <= 1000),
        |ref AS (SELECT re0.doc_id, re0.fp FROM re0 JOIN rare USING (fp)),
        |bt AS (SELECT doc_id, string_split(text, ' ') AS w FROM c3),
        |bg AS (SELECT doc_id, list_transform(range(1, len(w)-3+2), i -> md5(array_to_string(w[i:i+2], ' '))) AS gh FROM bt WHERE len(w) >= 3),
        |bf AS (SELECT doc_id, list_distinct(list_transform(range(1, len(gh)-4+2), j -> list_min(gh[j:j+3]))) AS fps FROM bg WHERE len(gh) >= 4),
        |be0 AS (SELECT doc_id, unnest(fps) AS fp FROM bf),
        |ovp AS (SELECT b.doc_id AS bid, r.doc_id AS rid, COUNT(*) AS ns
        |  FROM be0 b JOIN ref r ON b.fp = r.fp GROUP BY 1, 2),
        |ov AS (SELECT DISTINCT bid AS doc_id FROM ovp WHERE ns >= 3)
        |SELECT b0.doc_id,
        |  CASE WHEN b0.doc_id IN (SELECT doc_id FROM bl) THEN 'batch_dup'
        |       WHEN b0.doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup'
        |       WHEN b0.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
        |       WHEN b0.doc_id IN (SELECT doc_id FROM ov) THEN 'overlap_dup'
        |       ELSE 'ingested' END AS verdict
        |FROM b0 ORDER BY doc_id""".stripMargin,
    // Same winnowing construction in DuckDB list functions: k-gram md5s,
    // window minima, distinct per doc, df-capped (MOSS boilerplate drop,
    // maxDf = 1000 mirroring the Spark default), shared-fp pair counts.
    "doc_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id,
        |    list_transform(range(1, len(w) - 3 + 2),
        |      i -> md5(array_to_string(w[i:i+2], ' '))) AS gh
        |  FROM t WHERE len(w) >= 3),
        |f AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(gh) - 4 + 2),
        |      j -> list_min(gh[j:j+3]))) AS fps
        |  FROM g WHERE len(gh) >= 4),
        |e0 AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        |rare AS (SELECT fp FROM e0 GROUP BY fp HAVING COUNT(*) <= 1000),
        |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN rare USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // Re-lining + C4 line surgery replayed in SQL: the same 7-word
    // chunking, punctuation/javascript planting, lorem/brace extra lines,
    // line-keep predicate, doc verdicts and kept-line re-join.
    "doc_par_ingest" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |l0 AS (
        |  SELECT doc_id, r.j,
        |    array_to_string(ws[CAST(r.j*7+1 AS BIGINT):CAST(r.j*7+7 AS BIGINT)], ' ') AS line
        |  FROM w, range(400) r(j) WHERE r.j*7 < len(ws)),
        |extra AS (
        |  SELECT doc_id, 1000 AS j, 'subscribe to our newsletter today.' AS line
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 1001,
        |    'copyright ' || CAST(2020 + doc_id % 5 AS VARCHAR) || ' all rights reserved.'
        |  FROM documents WHERE doc_id % 11 = 0),
        |lines AS (SELECT * FROM l0 UNION ALL SELECT * FROM extra),
        |univ AS (
        |  SELECT doc_id AS src, doc_id AS out_id FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, doc_id + 4000000 FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id, doc_id + 4500000 FROM documents WHERE doc_id % 10 = 0),
        |ulines AS (
        |  SELECT u.out_id, l.j, l.line,
        |    trim(regexp_replace(lower(l.line), '[^a-z ]', '', 'g')) AS norm
        |  FROM univ u JOIN lines l ON l.doc_id = u.src),
        |rn AS (SELECT out_id, j, line, norm,
        |    row_number() OVER (PARTITION BY norm ORDER BY out_id, j) AS r
        |  FROM ulines),
        |m AS (SELECT out_id AS doc_id, j, line, (norm = '' OR r = 1) AS keep
        |  FROM rn WHERE out_id >= 4000000)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pars,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) > 0
        |       THEN string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY j)
        |  END AS dedup_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_par_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |l0 AS (
        |  SELECT doc_id, r.j,
        |    array_to_string(ws[CAST(r.j*7+1 AS BIGINT):CAST(r.j*7+7 AS BIGINT)], ' ') AS line
        |  FROM w, range(400) r(j) WHERE r.j*7 < len(ws)),
        |extra AS (
        |  SELECT doc_id, 1000 AS j, 'subscribe to our newsletter today.' AS line
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 1001,
        |    'copyright ' || CAST(2020 + doc_id % 5 AS VARCHAR) || ' all rights reserved.'
        |  FROM documents WHERE doc_id % 11 = 0),
        |lines AS (SELECT * FROM l0 UNION ALL SELECT * FROM extra),
        |n AS (SELECT doc_id, j, line,
        |    trim(regexp_replace(lower(line), '[^a-z ]', '', 'g')) AS norm
        |  FROM lines),
        |rn AS (SELECT doc_id, j, line, norm,
        |    row_number() OVER (PARTITION BY norm ORDER BY doc_id, j) AS r
        |  FROM n),
        |m AS (SELECT doc_id, j, line, (norm = '' OR r = 1) AS keep FROM rn)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pars,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) > 0
        |       THEN string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY j)
        |  END AS dedup_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_c4_lines" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |l0 AS (
        |  SELECT doc_id, r.j,
        |    array_to_string(ws[CAST(r.j*7+1 AS BIGINT):CAST(r.j*7+7 AS BIGINT)], ' ')
        |      || CASE WHEN (doc_id*31 + r.j) % 13 = 0 THEN
        |           CASE WHEN (doc_id + r.j) % 2 = 0 THEN ' JavaScript' ELSE ' javascript' END
        |         ELSE '' END
        |      || CASE WHEN (doc_id + r.j) % 5 = 0 THEN '' ELSE '.' END AS line
        |  FROM w, range(400) r(j) WHERE r.j*7 < len(ws)),
        |extra AS (
        |  SELECT doc_id, 1000 AS j,
        |    CASE WHEN doc_id % 194 = 0 THEN 'Lorem Ipsum dolor sit amet.'
        |         ELSE 'lorem ipsum dolor sit amet.' END AS line
        |  FROM documents WHERE doc_id % 97 = 0
        |  UNION ALL
        |  SELECT doc_id, 1001, 'function() { return 1; }.'
        |  FROM documents WHERE doc_id % 89 = 0),
        |lines AS (SELECT * FROM l0 UNION ALL SELECT * FROM extra),
        |k AS (SELECT doc_id, j, line,
        |    CASE WHEN right(line, 1) IN ('.', '!', '?', '"')
        |      AND len(string_split(line, ' ')) >= 3
        |      AND NOT contains(lower(line), 'javascript') THEN 1 ELSE 0 END AS keep
        |  FROM lines),
        |agg AS (SELECT doc_id,
        |    COUNT(*) AS n_lines, SUM(keep) AS n_kept,
        |    MAX(CASE WHEN contains(lower(line), 'lorem ipsum') THEN 1 ELSE 0 END) AS has_lorem,
        |    MAX(CASE WHEN contains(line, '{') THEN 1 ELSE 0 END) AS has_brace,
        |    string_agg(CASE WHEN keep = 1 THEN line END, chr(10) ORDER BY j) AS clean
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(n_kept AS BIGINT) AS n_kept,
        |  CASE WHEN has_lorem = 1 THEN 'lorem_ipsum'
        |       WHEN has_brace = 1 THEN 'brace'
        |       WHEN n_kept < 5 THEN 'too_short' ELSE 'kept' END AS verdict,
        |  CASE WHEN has_lorem = 0 AND has_brace = 0 AND n_kept >= 5
        |       THEN clean END AS clean_text
        |FROM agg ORDER BY doc_id""".stripMargin,
    "doc_strip_markup" ->
      """WITH wrapped AS (SELECT doc_id,
        |  '<html><body><p id="' || doc_id || '">' ||
        |  replace(text, ' the ', ' &amp; the ') || '</p>' ||
        |  CASE WHEN doc_id % 3 = 0 THEN '<div>footer boilerplate</div>' ELSE '' END ||
        |  '</body></html>' AS text FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS n_tags,
        |  regexp_replace(text, '<[^>]*>', ' ', 'g') AS t FROM wrapped),
        |s2 AS (SELECT doc_id, n_tags,
        |  replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
        |  FROM s1)
        |SELECT doc_id, n_tags, trim(regexp_replace(t, '[ ]+', ' ', 'g')) AS text
        |FROM s2 ORDER BY doc_id""".stripMargin,
    "doc_split_repair" ->
      s"""WITH RECURSIVE $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashScored) WHERE jaccard >= 0.3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS label FROM nodes
        |          UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id),
        |sp AS (SELECT doc_id,
        |  CASE WHEN substr(md5('graft|' || doc_id), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5('graft|' || doc_id), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split FROM documents)
        |SELECT s.doc_id, s.split AS original_split,
        |  COALESCE(rs.split, s.split) AS split,
        |  COALESCE(cc.group_id, s.doc_id) AS group_id
        |FROM sp s LEFT JOIN cc ON cc.doc_id = s.doc_id
        |LEFT JOIN sp rs ON rs.doc_id = cc.group_id
        |ORDER BY s.doc_id""".stripMargin,
    "doc_dup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashScored) WHERE jaccard >= 0.3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS label FROM nodes
        |          UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id, COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY cluster_id, doc_id""".stripMargin,
    // Cluster closure (the doc_dup_clusters CTEs) + the quality pick:
    // per cluster, row_number over (n_chars desc, doc_id) = 1; singletons
    // via anti-join keep themselves.
    "doc_dup_survivors" ->
      s"""WITH RECURSIVE $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashScored) WHERE jaccard >= 0.3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS label FROM nodes
        |          UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id),
        |m AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars
        |      FROM cc JOIN documents d USING (doc_id)),
        |pick AS (SELECT doc_id, cluster_size FROM (
        |    SELECT doc_id, COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |      row_number() OVER (PARTITION BY cluster_id
        |        ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM m) WHERE rn = 1),
        |singles AS (SELECT d.doc_id, 1 AS cluster_size FROM documents d
        |            LEFT JOIN cc ON cc.doc_id = d.doc_id WHERE cc.doc_id IS NULL)
        |SELECT u.doc_id, CAST(u.cluster_size AS BIGINT) AS cluster_size,
        |  CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM (SELECT * FROM pick UNION ALL SELECT * FROM singles) u
        |JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Three integer-PageRank rounds unrolled: // is floor division and
    // every quantity positive, so DuckDB's integer ops equal Scala's
    // Long `div` exactly; the only double is the trailing /1e6.
    "doc_link_rank" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e AS (SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        |      UNION ALL
        |      SELECT doc_id, (3*doc_id + 7) % (SELECT n FROM nn) FROM documents),
        |od AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY src),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rm FROM nodes),
        |s1 AS (SELECT e.dst AS node, SUM(r0.rm // od.odeg) AS s
        |       FROM e JOIN od USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.node, CAST(150000 + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS rm
        |       FROM nodes LEFT JOIN s1 USING (node)),
        |s2 AS (SELECT e.dst AS node, SUM(r1.rm // od.odeg) AS s
        |       FROM e JOIN od USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.node, CAST(150000 + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS rm
        |       FROM nodes LEFT JOIN s2 USING (node)),
        |s3 AS (SELECT e.dst AS node, SUM(r2.rm // od.odeg) AS s
        |       FROM e JOIN od USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.node, CAST(150000 + (85 * COALESCE(s3.s, 0)) // 100 AS BIGINT) AS rm
        |       FROM nodes LEFT JOIN s3 USING (node))
        |SELECT node AS doc_id, rm AS rank_micro,
        |  CAST(rm AS DOUBLE) / 1000000.0 AS rank
        |FROM r3 ORDER BY doc_id""".stripMargin,
    // Distinct 3-grams per doc (the minhash shingle CTE shape), gram df,
    // df = 1 novelty roll-up; md5 on the Spark side only keys the shuffle
    // — counting on md5(g) ≡ counting on g.
    "doc_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws)-1),
        |        i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |      FROM w WHERE len(ws) >= 3),
        |df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
        |FROM g JOIN df USING (gram) GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // Quantile cuts (quantile_cont ≡ the distributed exact-quantile
    // engine bitwise), `len > cut` bucket assignment, all-long waste
    // arithmetic, single trailing double division.
    "doc_length_buckets" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT quantile_cont(n_tokens, 0.25) AS c1,
        |        quantile_cont(n_tokens, 0.50) AS c2,
        |        quantile_cont(n_tokens, 0.75) AS c3 FROM t),
        |a AS (SELECT doc_id, n_tokens,
        |        1 + (CASE WHEN CAST(n_tokens AS DOUBLE) > c.c1 THEN 1 ELSE 0 END)
        |          + (CASE WHEN CAST(n_tokens AS DOUBLE) > c.c2 THEN 1 ELSE 0 END)
        |          + (CASE WHEN CAST(n_tokens AS DOUBLE) > c.c3 THEN 1 ELSE 0 END) AS bucket
        |      FROM t, c),
        |u AS (
        |  SELECT bucket, COUNT(*) AS n_docs, MIN(n_tokens) AS min_tokens,
        |    MAX(n_tokens) AS max_tokens, SUM(n_tokens) AS sum_tokens
        |  FROM a GROUP BY bucket
        |  UNION ALL
        |  SELECT 0, COUNT(*), MIN(n_tokens), MAX(n_tokens), SUM(n_tokens) FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_docs AS BIGINT) AS n_docs,
        |  min_tokens, max_tokens, CAST(sum_tokens AS BIGINT) AS sum_tokens,
        |  CAST(n_docs * max_tokens - sum_tokens AS BIGINT) AS pad_waste,
        |  CAST(n_docs * max_tokens - sum_tokens AS DOUBLE)
        |    / CAST(n_docs * max_tokens AS DOUBLE) AS waste_frac
        |FROM u ORDER BY bucket""".stripMargin,
    "doc_clean_corpus" ->
      s"""WITH RECURSIVE $minhashCtes,
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashScored) WHERE jaccard >= 0.3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS label FROM nodes
        |          UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id),
        |losers AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id),
        |ls AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'le')) + len(list_filter(string_split(text,' '), x -> x = 'la')) + len(list_filter(string_split(text,' '), x -> x = 'les')) AS BIGINT) AS score_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'der')) + len(list_filter(string_split(text,' '), x -> x = 'die')) + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'el')) + len(list_filter(string_split(text,' '), x -> x = 'los')) + len(list_filter(string_split(text,' '), x -> x = 'una')) AS BIGINT) AS score_es
        |  FROM documents),
        |lp AS (SELECT doc_id,
        |  CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
        |       WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
        |       WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
        |       ELSE 'es' END AS pred_lang FROM ls),
        |qt AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |  len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) AS n_stop
        | FROM documents),
        |qu AS (SELECT doc_id, n_words,
        |  0.4*(CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE))
        |  + 0.3*(1.0 - CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
        |  + 0.3*least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS quality
        | FROM qt)
        |SELECT qu.doc_id, lp.pred_lang, qu.n_words, qu.quality
        |FROM qu JOIN lp USING (doc_id)
        |WHERE lp.pred_lang = 'en' AND qu.quality >= 0.55
        |  AND qu.doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY qu.doc_id""".stripMargin,
    "doc_simhash" ->
      """WITH wd AS (SELECT DISTINCT doc_id, wrd FROM (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS wrd FROM documents)),
        |bits AS (SELECT doc_id, bit,
        |    SUM(CASE WHEN substr(md5(wrd), CAST(bit + 1 AS INT), 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
        |  FROM wd CROSS JOIN range(0, 16) t(bit) GROUP BY doc_id, bit),
        |sig AS (SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS simhash
        |        FROM bits GROUP BY doc_id)
        |SELECT doc_id, simhash, COUNT(*) OVER (PARTITION BY simhash) AS n_bucket
        |FROM sig ORDER BY doc_id""".stripMargin,
    "doc_blocked_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM w)),
        |sh AS (SELECT sh0.doc_id, sh0.shingle, d.source FROM sh0 JOIN documents d USING (doc_id)),
        |bs AS (SELECT source, COUNT(*) AS block_n FROM documents GROUP BY source),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |small_ids AS (SELECT doc_id FROM documents JOIN bs USING (source) WHERE block_n <= 100),
        |big_ids AS (SELECT doc_id FROM documents JOIN bs USING (source) WHERE block_n > 100),
        |shs AS (SELECT sh.* FROM sh JOIN small_ids USING (doc_id)),
        |shb AS (SELECT sh.* FROM sh JOIN big_ids USING (doc_id)),
        |small_inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM shs a JOIN shs b ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |mh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
        |       FROM shb CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
        |bands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key
        |          FROM mh GROUP BY doc_id, h // 3),
        |bsrc AS (SELECT bands.*, d.source FROM bands JOIN documents d USING (doc_id)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bsrc a JOIN bsrc b ON a.source = b.source AND a.band_id = b.band_id
        |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |big_inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        |  FROM cand c JOIN shb sa ON sa.doc_id = c.doc_a
        |  JOIN shb sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        |  GROUP BY 1, 2),
        |uni AS (SELECT * FROM small_inter UNION ALL SELECT * FROM big_inter)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT u.doc_a, u.doc_b,
        |    CAST(u.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - u.n_inter AS DOUBLE) AS jaccard
        |  FROM uni u JOIN sizes na ON na.doc_id = u.doc_a JOIN sizes nb ON nb.doc_id = u.doc_b)
        |WHERE jaccard >= 0.25 ORDER BY doc_a, doc_b""".stripMargin,
    "doc_lang_confusion" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'le')) + len(list_filter(string_split(text,' '), x -> x = 'la')) + len(list_filter(string_split(text,' '), x -> x = 'les')) AS BIGINT) AS score_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'der')) + len(list_filter(string_split(text,' '), x -> x = 'die')) + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'el')) + len(list_filter(string_split(text,' '), x -> x = 'los')) + len(list_filter(string_split(text,' '), x -> x = 'una')) AS BIGINT) AS score_es
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
        |       WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
        |       WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
        |       ELSE 'es' END AS pred_lang
        |  FROM s),
        |cells AS (SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents d JOIN p USING (doc_id) GROUP BY d.lang, p.pred_lang),
        |tot AS (SELECT lang, SUM(n_docs) AS n_lang FROM cells GROUP BY lang)
        |SELECT c.lang, c.pred_lang, c.n_docs,
        |  CAST(c.n_docs AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS rate
        |FROM cells c JOIN tot t USING (lang)
        |ORDER BY c.lang, c.pred_lang""".stripMargin,
    "doc_langid" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'le')) + len(list_filter(string_split(text,' '), x -> x = 'la')) + len(list_filter(string_split(text,' '), x -> x = 'les')) AS BIGINT) AS score_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'der')) + len(list_filter(string_split(text,' '), x -> x = 'die')) + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'el')) + len(list_filter(string_split(text,' '), x -> x = 'los')) + len(list_filter(string_split(text,' '), x -> x = 'una')) AS BIGINT) AS score_es
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
        |       WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
        |       WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
        |       ELSE 'es' END AS pred_lang,
        |  greatest(score_en, score_fr, score_de, score_es) AS best_score,
        |  score_en, score_fr, score_de, score_es
        |FROM s ORDER BY doc_id""".stripMargin,
    "doc_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5('graft|' || doc_id), 1, 8) < '33333333'
        |ORDER BY doc_id""".stripMargin,
    "doc_splits" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('graft|' || doc_id), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5('graft|' || doc_id), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_rebalance" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 50
        |ORDER BY source, doc_id""".stripMargin,
    "doc_mix" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  substr(md5('graft|' || doc_id), 1, 8) AS draw
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY draw, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 600 ELSE 400 END
        |ORDER BY source, doc_id""".stripMargin,
    // Declarative one-window form of the bucketed prefix sum (Long
    // addition is associative — the doc_mix argument); shard arithmetic
    // is BIGINT floor division in both engines.
    "doc_shards" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  substr(md5('graft|' || doc_id), 1, 8) AS draw FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY draw, doc_id) AS BIGINT) AS cum_tokens FROM t)
        |SELECT CAST((cum_tokens - n_tokens) // 2000 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS min_doc_id
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "doc_len_quantiles" ->
      """SELECT source,
        |  quantile_cont(len(string_split(text, ' ')), 0.25) AS p25,
        |  quantile_cont(len(string_split(text, ' ')), 0.5) AS p50,
        |  quantile_cont(len(string_split(text, ' ')), 0.75) AS p75,
        |  quantile_cont(len(string_split(text, ' ')), 0.95) AS p95
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "doc_source_balance" ->
      """WITH per AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
        |    CAST(SUM(tokens * tokens) AS BIGINT) AS sum_sq FROM per)
        |SELECT source, tokens,
        |  CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  CAST(total * total AS DOUBLE) / CAST(sum_sq AS DOUBLE) AS effective_sources
        |FROM per, tot ORDER BY source""".stripMargin,
    "doc_temperature_mix" ->
      """WITH base AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tokens) AS t FROM base GROUP BY 1),
        |s AS (SELECT list_sum(list(sqrt(CAST(t AS DOUBLE)) ORDER BY source)) AS ss
        |  FROM tot),
        |bud AS (SELECT source,
        |    CAST(FLOOR(2000 * sqrt(CAST(t AS DOUBLE)) / ss) AS BIGINT) AS b
        |  FROM tot, s),
        |cum AS (SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY substr(md5('graft|' || doc_id), 1, 8), doc_id) AS BIGINT)
        |      AS cum_tokens
        |  FROM base)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, b.b AS source_budget
        |FROM cum c JOIN bud b ON c.source = b.source
        |WHERE c.cum_tokens <= b.b
        |ORDER BY c.source, c.doc_id""".stripMargin,
    "doc_mix_epochs" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  substr(md5('graft|' || doc_id), 1, 8) AS draw
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
        |cfg AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tot,
        |  CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2400 ELSE 1600 END AS b
        |  FROM t GROUP BY source),
        |fe AS (SELECT source, least(b // tot, 2) AS full_epochs,
        |  b - least(b // tot, 2) * tot AS rem FROM cfg),
        |full_passes AS (SELECT t.doc_id, t.source, t.n_tokens,
        |  unnest(range(0, fe.full_epochs)) AS epoch
        |  FROM t JOIN fe ON fe.source = t.source),
        |cum AS (SELECT doc_id, source, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY draw, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t),
        |partial AS (SELECT c.doc_id, c.source, c.n_tokens, fe.full_epochs AS epoch
        |  FROM cum c JOIN fe ON fe.source = c.source
        |  WHERE fe.full_epochs < 2 AND c.cum_tokens <= fe.rem)
        |SELECT doc_id, source, n_tokens, CAST(epoch AS BIGINT) AS epoch FROM (
        |  SELECT * FROM full_passes UNION ALL SELECT * FROM partial)
        |ORDER BY source, epoch, doc_id""".stripMargin,
    "doc_quality" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |  len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) AS n_stop
        | FROM documents),
        |u AS (SELECT doc_id, n_words, n_distinct,
        |  CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr,
        |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
        |  least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score
        | FROM t)
        |SELECT doc_id, n_words, n_distinct, ttr, stop_ratio,
        |  0.4*ttr + 0.3*(1.0 - stop_ratio) + 0.3*len_score AS quality
        |FROM u ORDER BY doc_id""".stripMargin,
    "doc_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_re_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """WITH f AS (SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n_same
        |FROM f ORDER BY doc_id""".stripMargin,
    "doc_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT word, n, t.total FROM c, t WHERE n * 30 > t.total
        |ORDER BY n DESC, word""".stripMargin,
    // PMI ratio as pure BIGINT floor division (DuckDB `//` ≡ Spark `DIV`
    // on non-negative longs); marginals re-aggregate the counted table.
    "doc_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
        |       FROM t WHERE len(w) >= 2),
        |bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy,
        |       string_split(bigram, ' ')[1] AS x, string_split(bigram, ' ')[2] AS y
        |       FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bc),
        |lft AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM bc GROUP BY 1),
        |rgt AS (SELECT y, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM bc GROUP BY 1)
        |SELECT bigram, c_xy, c_x, c_y,
        |  CAST((c_xy * n * 1000000) // (c_x * c_y) AS BIGINT) AS pmi_ratio_ppm
        |FROM bc JOIN lft USING (x) JOIN rgt USING (y) CROSS JOIN tot
        |WHERE c_xy >= 5
        |ORDER BY pmi_ratio_ppm DESC, bigram LIMIT 50""".stripMargin,
    // Tied-average ranks in the declarative one-window form (2·avg_rank =
    // 2·#smaller + #equal + 1 — rank() gives 1+#smaller); the Spark side's
    // bucketed engine equals this bit-for-bit because ranks are integers
    // and Long addition is associative. Everything downstream of the rank
    // sums is INTEGER arithmetic (HUGEINT here ≡ the Spark side's
    // DECIMAL(38,0) — both exact): rank products cast wide BEFORE the
    // multiply (a BIGINT r2a·r2b overflows past ~1.5·10⁹ rows per group),
    // and ρ ships as sign + ρ²·10⁶ floor-divided — no sqrt, no division,
    // nothing whose last bit depends on the oracle engine's FP build.
    // The emitted sums cast to BIGINT, matching the Spark projection:
    // every surfaced column is int64/utf8 (the hash-emission convention).
    "doc_signal_corr" ->
      """WITH s AS (SELECT * FROM (SELECT source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS a,
        |    n_chars AS b FROM documents)
        |  WHERE a IS NOT NULL AND b IS NOT NULL),
        |r AS (SELECT source,
        |    2*(rank() OVER (PARTITION BY source ORDER BY a) - 1)
        |      + COUNT(*) OVER (PARTITION BY source, a) + 1 AS r2a,
        |    2*(rank() OVER (PARTITION BY source ORDER BY b) - 1)
        |      + COUNT(*) OVER (PARTITION BY source, b) + 1 AS r2b
        |  FROM s),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(r2a AS HUGEINT) * CAST(r2b AS HUGEINT)) AS DECIMAL(38,0)) AS s_ab,
        |    CAST(SUM(CAST(r2a AS HUGEINT) * CAST(r2a AS HUGEINT)) AS DECIMAL(38,0)) AS s_aa,
        |    CAST(SUM(CAST(r2b AS HUGEINT) * CAST(r2b AS HUGEINT)) AS DECIMAL(38,0)) AS s_bb
        |  FROM r GROUP BY source),
        |d AS (SELECT source, n, s_ab, s_aa, s_bb,
        |    CAST(n AS HUGEINT) * CAST(s_ab AS HUGEINT)
        |      - (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1))
        |        * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1)) AS num,
        |    CAST(n AS HUGEINT) * CAST(s_aa AS HUGEINT)
        |      - (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1))
        |        * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1)) AS den_a,
        |    CAST(n AS HUGEINT) * CAST(s_bb AS HUGEINT)
        |      - (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1))
        |        * (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1)) AS den_b
        |  FROM g)
        |SELECT source, n,
        |  CAST(s_ab AS BIGINT) AS s_ab, CAST(s_aa AS BIGINT) AS s_aa,
        |  CAST(s_bb AS BIGINT) AS s_bb,
        |  CASE WHEN den_a > 0 AND den_b > 0 THEN
        |    CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS BIGINT)
        |  END AS corr_sign,
        |  CASE WHEN den_a > 0 AND den_b > 0 THEN
        |    CAST((num * num * 1000000) // (den_a * den_b) AS BIGINT)
        |  END AS rho2_ppm
        |FROM d ORDER BY source""".stripMargin,
    // Tied-average-rank percentile in the declarative window form; the
    // ppm arithmetic is BIGINT floor division in both engines.
    "doc_quality_pct" ->
      """WITH s AS (SELECT * FROM (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents)
        |  WHERE v IS NOT NULL),
        |r AS (SELECT doc_id, source, v,
        |    2*(rank() OVER (PARTITION BY source ORDER BY v) - 1)
        |      + COUNT(*) OVER (PARTITION BY source, v) + 1 AS r2,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM s)
        |SELECT doc_id, source, v AS n_tokens,
        |  CAST((r2 * 500000) // n AS BIGINT) AS pct_ppm,
        |  ((r2 * 500000) // n) > 700000 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "doc_domain_classify" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |vocab AS (SELECT w FROM (
        |  SELECT w, COUNT(*) AS c FROM tok GROUP BY w ORDER BY c DESC, w LIMIT 300)),
        |cnt AS (SELECT tok.w AS w, tok.source, COUNT(*) AS c
        |  FROM tok JOIN vocab ON tok.w = vocab.w GROUP BY tok.w, tok.source),
        |nv AS (SELECT COUNT(*) AS v FROM vocab),
        |fullc AS (SELECT v.w, s.source, COALESCE(c.c, 0) AS c
        |  FROM vocab v CROSS JOIN srcs s
        |  LEFT JOIN cnt c ON c.w = v.w AND c.source = s.source),
        |tots AS (SELECT source, SUM(c) AS tot FROM fullc GROUP BY source),
        |wscore AS (SELECT f.w, f.source,
        |    (1000000000 * (f.c + 1)) // (t.tot + nv.v) AS score
        |  FROM fullc f JOIN tots t USING (source), nv),
        |dsum AS (SELECT d.doc_id, s.source AS cand, COALESCE(SUM(ws.score), 0) AS sc
        |  FROM documents d CROSS JOIN srcs s
        |  LEFT JOIN tok dt ON dt.doc_id = d.doc_id
        |  LEFT JOIN wscore ws ON ws.w = dt.w AND ws.source = s.source
        |  GROUP BY d.doc_id, s.source),
        |ranked AS (SELECT doc_id, cand, sc,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, cand) AS rn
        |  FROM dsum),
        |best AS (SELECT doc_id, cand AS pred_source, sc AS bsc FROM ranked WHERE rn = 1),
        |second AS (SELECT doc_id, sc AS s2 FROM ranked WHERE rn = 2)
        |SELECT d.doc_id, d.source, b.pred_source,
        |  CAST(b.bsc - COALESCE(s.s2, b.bsc) AS BIGINT) AS margin
        |FROM documents d JOIN best b USING (doc_id)
        |LEFT JOIN second s USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "doc_quality_classifier" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |vocab AS (SELECT w FROM (
        |  SELECT w, COUNT(*) AS c FROM tok GROUP BY w ORDER BY c DESC, w LIMIT 300)),
        |cls AS (SELECT tok.w AS w,
        |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
        |    SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cb
        |  FROM tok JOIN vocab ON tok.w = vocab.w GROUP BY tok.w),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cb) AS BIGINT) AS tb,
        |    COUNT(*) AS v FROM cls),
        |wts AS (SELECT w,
        |    (1000000000 * (ct + 1)) // (tt + v) - (1000000000 * (cb + 1)) // (tb + v) AS wt
        |  FROM cls, tot),
        |sc AS (SELECT t.doc_id, t.source, COALESCE(SUM(wt), 0) AS score
        |  FROM tok t LEFT JOIN wts ON t.w = wts.w GROUP BY t.doc_id, t.source)
        |SELECT doc_id, source, CAST(score AS BIGINT) AS score, score > 0 AS pred_target
        |FROM sc ORDER BY doc_id""".stripMargin,
    "doc_threshold_calibration" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |vocab AS (SELECT w FROM (
        |  SELECT w, COUNT(*) AS c FROM tok GROUP BY w ORDER BY c DESC, w LIMIT 300)),
        |cls AS (SELECT tok.w AS w,
        |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
        |    SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cb
        |  FROM tok JOIN vocab ON tok.w = vocab.w GROUP BY tok.w),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cb) AS BIGINT) AS tb,
        |    COUNT(*) AS v FROM cls),
        |wts AS (SELECT w,
        |    (1000000000 * (ct + 1)) // (tt + v) - (1000000000 * (cb + 1)) // (tb + v) AS wt
        |  FROM cls, tot),
        |sc AS (SELECT t.doc_id, t.source, COALESCE(SUM(wt), 0) AS score
        |  FROM tok t LEFT JOIN wts ON t.w = wts.w GROUP BY t.doc_id, t.source),
        |per AS (SELECT score, SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS nn
        |  FROM sc GROUP BY score),
        |tt2 AS (SELECT CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n FROM per),
        |cum AS (SELECT score,
        |    CAST(SUM(np) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |    CAST(SUM(nn) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
        |  FROM per)
        |SELECT CAST(score AS BIGINT) AS threshold, tp, fp,
        |  CAST(t.p - tp AS BIGINT) AS fn, CAST(t.n - fp AS BIGINT) AS tn,
        |  (CAST(tp AS DOUBLE) / CAST(t.p AS DOUBLE)
        |    + CAST(t.n - fp AS DOUBLE) / CAST(t.n AS DOUBLE)) / 2.0 AS balanced_accuracy
        |FROM cum, tt2 t ORDER BY tp * t.n + (t.n - fp) * t.p DESC, score LIMIT 1""".stripMargin,
    "doc_norm_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, upper(text) FROM documents WHERE doc_id % 9 = 0),
        |n AS (SELECT doc_id, md5(text) AS raw_h,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g'))) AS h
        |  FROM corpus),
        |g AS (SELECT h, COUNT(*) AS n_docs, COUNT(DISTINCT raw_h) AS n_raw_variants,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
        |  FROM n GROUP BY 1)
        |SELECT h AS norm_hash, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_raw_variants AS BIGINT) AS n_raw_variants, doc_ids
        |FROM g WHERE n_docs > 1 ORDER BY norm_hash""".stripMargin,
    "doc_search" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf1,
        |  len(list_filter(string_split(text, ' '), x -> x = 'join')) AS tf2
        |  FROM documents)
        |SELECT doc_id, source, CAST(tf1 + tf2 AS BIGINT) AS total_tf
        |FROM t WHERE tf1 > 0 AND tf2 > 0
        |ORDER BY total_tf DESC, doc_id LIMIT 20""".stripMargin,
    "doc_phrase_search" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |h AS (SELECT doc_id, source,
        |  CASE WHEN len(ws) >= 2
        |    THEN len(list_filter(range(1, len(ws)), i -> ws[i] = 'fast' AND ws[i+1] = 'table'))
        |    ELSE 0 END AS n_hits
        |  FROM t)
        |SELECT doc_id, source, CAST(n_hits AS BIGINT) AS n_hits FROM h
        |WHERE n_hits > 0 ORDER BY n_hits DESC, doc_id LIMIT 20""".stripMargin,
    "doc_hybrid_search" ->
      s"""WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf1,
        |  len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf2
        |  FROM documents),
        |st AS (SELECT COUNT(*) AS n_docs,
        |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM t),
        |lex AS (SELECT doc_id,
        |  CAST(tf1 * ((1000000 * n_docs) // greatest(df1, 1))
        |     + tf2 * ((1000000 * n_docs) // greatest(df2, 1)) AS BIGINT) AS score
        |  FROM t, st WHERE tf1 > 0 OR tf2 > 0
        |  ORDER BY score DESC, doc_id LIMIT 20),
        |lexr AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
        |  FROM lex),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |cosd AS (SELECT e.vec_id,
        |  ${dotSql("CAST(e.embedding AS DOUBLE[])", "q.qe")} /
        |  (sqrt(${dotSql("CAST(e.embedding AS DOUBLE[])", "CAST(e.embedding AS DOUBLE[])")}) * sqrt(${dotSql("q.qe", "q.qe")})) AS cos
        |  FROM embeddings e, q),
        |den AS (SELECT vec_id, cos FROM cosd ORDER BY cos DESC, vec_id LIMIT 20),
        |denr AS (SELECT vec_id AS doc_id,
        |  CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS vec_rank
        |  FROM den)
        |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
        |  CAST(COALESCE(1000000000000 // (60 + l.lex_rank), 0)
        |     + COALESCE(1000000000000 // (60 + v.vec_rank), 0) AS BIGINT) AS rrf_score
        |FROM lexr l FULL OUTER JOIN denr v ON l.doc_id = v.doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    "doc_tfidf_search" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf1,
        |  len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf2
        |  FROM documents),
        |s AS (SELECT COUNT(*) AS n_docs,
        |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM t)
        |SELECT doc_id, source,
        |  CAST(tf1 * ((1000000 * n_docs) // greatest(df1, 1))
        |     + tf2 * ((1000000 * n_docs) // greatest(df2, 1)) AS BIGINT) AS score
        |FROM t, s WHERE tf1 > 0 OR tf2 > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "doc_source_overlap" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |g0 AS (SELECT source, unnest(list_transform(range(1, len(ws)-2),
        |  i -> array_to_string(ws[i:i+3], ' '))) AS gram FROM w),
        |g AS (SELECT DISTINCT source, md5(gram) AS gh FROM g0),
        |sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_grams
        |  FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(shared_grams AS BIGINT) AS shared_grams,
        |  CAST(shared_grams AS DOUBLE) / CAST(na.n + nb.n - shared_grams AS DOUBLE) AS jaccard
        |FROM inter JOIN sz na ON na.source = src_a JOIN sz nb ON nb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "doc_prefix_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+2], ' ')) AS gh
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM w)),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(x.s + y.s - n_inter AS BIGINT) AS n_union,
        |  CAST(n_inter AS DOUBLE) / CAST(x.s + y.s - n_inter AS DOUBLE) AS jaccard
        |FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
        |WHERE n_inter * 4 >= (x.s + y.s - n_inter)
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Exact substring dedup: rn = 1 is the gram's global first occurrence
    // under (doc_id, p) — the same min(struct) rule the Spark side uses;
    // every later occurrence's 8 covered positions are cut.
    "doc_span_removal" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents),
        |grams AS (
        |  SELECT doc_id, p, md5(array_to_string(ws[p+1:p+8], ' ')) AS gh
        |  FROM toks, LATERAL (SELECT unnest(range(0, len(ws) - 8 + 1)) AS p) t
        |  WHERE len(ws) >= 8),
        |ranked AS (
        |  SELECT doc_id, p, row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
        |  FROM grams),
        |rem AS (
        |  SELECT DISTINCT doc_id, p + o AS pos
        |  FROM ranked, LATERAL (SELECT unnest(range(0, 8)) AS o) s
        |  WHERE rn > 1),
        |remagg AS (SELECT doc_id, list(pos) AS rem, count(*) AS n_removed FROM rem GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CASE WHEN r.doc_id IS NULL THEN t.text
        |       -- coalesce: DuckDB's array_to_string on an EMPTY list (a
        |       -- fully-removed doc) is NULL where Spark's array_join is ''
        |       ELSE coalesce(array_to_string([t.ws[i+1] FOR i IN range(0, len(t.ws)) IF NOT list_contains(r.rem, i)], ' '), '')
        |  END AS clean_text,
        |  CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed_tokens,
        |  CAST(len(t.ws) AS BIGINT) AS n_tokens
        |FROM toks t LEFT JOIN remagg r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // The index-served search must reproduce the raw-corpus definition —
    // the oracle is doc_search's, verbatim.
    "doc_inverted_search" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf1,
        |  len(list_filter(string_split(text, ' '), x -> x = 'join')) AS tf2
        |  FROM documents)
        |SELECT doc_id, source, CAST(tf1 + tf2 AS BIGINT) AS total_tf
        |FROM t WHERE tf1 > 0 AND tf2 > 0
        |ORDER BY total_tf DESC, doc_id LIMIT 20""".stripMargin,
    // df/total_tf served from the built posting layout vs the raw corpus.
    "doc_inverted_build" ->
      """WITH u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(COUNT(*) AS BIGINT) AS total_tf
        |FROM u WHERE term IN ('spark', 'join', 'table', 'fast', 'merge')
        |GROUP BY term ORDER BY term""".stripMargin,
    "doc_corpus_card" ->
      """SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(len(text)) AS BIGINT) AS n_chars,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_frac
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // The declarative merge the physical bucketed upsert must equal.
    "doc_snapshot_upsert" ->
      """WITH up AS (
        |  SELECT doc_id, text || ' updated' AS text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 25 = 0),
        |del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0)
        |SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT * FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM up)
        |    AND doc_id NOT IN (SELECT doc_id FROM del)
        |  UNION ALL
        |  SELECT * FROM up WHERE doc_id NOT IN (SELECT doc_id FROM del))
        |ORDER BY doc_id""".stripMargin,
    "doc_snapshot_timetravel" ->
      """WITH up AS (
        |  SELECT doc_id, text || ' updated' AS text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 25 = 0),
        |del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
        |merged AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM up)
        |    AND doc_id NOT IN (SELECT doc_id FROM del)
        |  UNION ALL
        |  SELECT * FROM up WHERE doc_id NOT IN (SELECT doc_id FROM del))
        |SELECT CAST(1 AS BIGINT) AS version, doc_id, text, lang, source, n_chars
        |FROM documents
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS version, doc_id, text, lang, source, n_chars
        |FROM merged
        |ORDER BY version, doc_id""".stripMargin,
    "doc_target_select" ->
      """WITH tw AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents WHERE doc_id % 97 = 0),
        |tc AS (SELECT word, COUNT(*) AS t_count FROM tw GROUP BY word),
        |cw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents WHERE doc_id % 97 <> 0),
        |sc AS (SELECT cw.doc_id,
        |  CAST(SUM(COALESCE(tc.t_count, 0)) AS BIGINT) AS relevance,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens
        |  FROM cw LEFT JOIN tc ON tc.word = cw.word GROUP BY cw.doc_id)
        |SELECT doc_id, relevance, n_tokens,
        |  CAST(relevance AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS density
        |FROM sc ORDER BY density DESC, doc_id LIMIT 50""".stripMargin,
    "doc_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |k AS (SELECT doc_id, ws,
        |  1 + CAST(ceil(greatest(len(ws) - 32, 0) / 24.0) AS INT) AS n_chunks FROM w),
        |c AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_id FROM k)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(chunk_id * 24 + 1 AS BIGINT) AS start_tok,
        |  CAST(len(ws[(chunk_id*24+1):(chunk_id*24+32)]) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[(chunk_id*24+1):(chunk_id*24+32)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "doc_pipeline" ->
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars FROM documents WHERE doc_id % 10 = 0),
        |corpus AS (SELECT * FROM base WHERE doc_id % 97 <> 0),
        |bench AS (SELECT * FROM base WHERE doc_id % 97 = 0),
        |ded AS (SELECT * FROM (
        |  SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM corpus) WHERE doc_id = keep),
        |cg AS (SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))-2),
        |  i -> array_to_string(string_split(text,' ')[i:i+3], ' '))) AS ng FROM ded),
        |bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(string_split(text,' '))-2),
        |  i -> array_to_string(string_split(text,' ')[i:i+3], ' '))) AS ng FROM bench),
        |contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (ng)),
        |clean AS (SELECT * FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ls AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'le')) + len(list_filter(string_split(text,' '), x -> x = 'la')) + len(list_filter(string_split(text,' '), x -> x = 'les')) AS BIGINT) AS score_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'der')) + len(list_filter(string_split(text,' '), x -> x = 'die')) + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'el')) + len(list_filter(string_split(text,' '), x -> x = 'los')) + len(list_filter(string_split(text,' '), x -> x = 'una')) AS BIGINT) AS score_es
        |  FROM clean),
        |lp AS (SELECT doc_id,
        |  CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
        |       WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
        |       WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
        |       ELSE 'es' END AS pred_lang FROM ls),
        |qu AS (SELECT doc_id,
        |  0.4*(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
        |  + 0.3*(1.0 - CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
        |  + 0.3*least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS quality
        |  FROM clean),
        |gated AS (SELECT c.doc_id, c.source, c.text FROM clean c
        |  JOIN lp ON lp.doc_id = c.doc_id JOIN qu ON qu.doc_id = c.doc_id
        |  WHERE lp.pred_lang = 'en' AND qu.quality >= 0.55),
        |t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  substr(md5('graft|' || doc_id), 1, 8) AS draw
        |  FROM gated WHERE source IN ('src0', 'src1', 'src2')),
        |c2 AS (SELECT doc_id, source, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY draw, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c2
        |WHERE cum_tokens <= CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 600 ELSE 400 END
        |ORDER BY source, doc_id""".stripMargin,
    "doc_pii_redact" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN doc_id % 7 = 0 THEN text || ' reach me at user' || doc_id || '@example.com today'
        |      WHEN doc_id % 7 = 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
        |      WHEN doc_id % 7 = 2 THEN text || ' server at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' port'
        |      ELSE text END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text2, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text2,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |      '555-[0-9]{4}', '[PHONE]', 'g'),
        |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g')) AS redacted_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "doc_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-2),
        |        i -> array_to_string(ws[i:i+3], ' '))) AS ng FROM w),
        |b AS (SELECT DISTINCT ng FROM e WHERE doc_id % 97 = 0)
        |SELECT e.doc_id, CAST(COUNT(DISTINCT e.ng) AS BIGINT) AS n_shared
        |FROM e JOIN b USING (ng) WHERE e.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Span surgery in classic gaps-and-islands SQL: matched 4-gram
    // positions expand by the +/-2 margin into dirty token positions,
    // clean tokens island on pos - row_number, pieces >= 5 tokens kept.
    "doc_decontam_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |corpus AS (SELECT doc_id, ws FROM w WHERE doc_id % 97 <> 0),
        |bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(ws)-2),
        |        i -> array_to_string(ws[i:i+3], ' '))) AS ng
        |  FROM w WHERE doc_id % 97 = 0),
        |g AS (SELECT doc_id, i AS gpos, array_to_string(ws[i:i+3], ' ') AS ng
        |  FROM corpus, unnest(range(1, len(ws)-2)) AS t(i)),
        |dirty AS (SELECT DISTINCT g.doc_id, p
        |  FROM g JOIN bg USING (ng), unnest(range(g.gpos - 2, g.gpos + 6)) AS u(p)),
        |toks AS (SELECT doc_id, i AS pos, ws[i] AS tok
        |  FROM corpus, unnest(range(1, len(ws)+1)) AS t(i)),
        |clean AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
        |  LEFT JOIN dirty h ON t.doc_id = h.doc_id AND t.pos = h.p WHERE h.p IS NULL),
        |isl AS (SELECT doc_id, pos, tok,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM clean),
        |pieces AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS n_piece_tokens,
        |    CAST(MIN(pos) AS BIGINT) AS start_pos,
        |    string_agg(tok, ' ' ORDER BY pos) AS piece_text
        |  FROM isl GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) AS BIGINT) AS piece_idx,
        |  start_pos, n_piece_tokens, piece_text
        |FROM pieces ORDER BY doc_id, piece_idx""".stripMargin,
    // The bloom guard must not change the answer: identical oracle.
    "doc_decontam_bloom" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-2),
        |        i -> array_to_string(ws[i:i+3], ' '))) AS ng FROM w),
        |b AS (SELECT DISTINCT ng FROM e WHERE doc_id % 97 = 0)
        |SELECT e.doc_id, CAST(COUNT(DISTINCT e.ng) AS BIGINT) AS n_shared
        |FROM e JOIN b USING (ng) WHERE e.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "doc_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |        i -> ws[i] || ' ' || ws[i+1])) AS g FROM w),
        |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g FROM w),
        |btop AS (SELECT doc_id, max(c) AS top_bg FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
        |ttop AS (SELECT doc_id, max(c) AS top_tg FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2) GROUP BY 1)
        |SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_frac,
        |  CASE WHEN len(ws) >= 2 THEN CAST(top_bg AS DOUBLE) / (len(ws) - 1) END AS top_bigram_frac,
        |  CASE WHEN len(ws) >= 3 THEN CAST(top_tg AS DOUBLE) / (len(ws) - 2) END AS top_trigram_frac
        |FROM w LEFT JOIN btop USING (doc_id) LEFT JOIN ttop USING (doc_id) ORDER BY doc_id""".stripMargin,
    "doc_span_dup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, md5(unnest(list_transform(range(1, len(ws)-2),
        |        i -> array_to_string(ws[i:i+3], ' ')))) AS gh FROM w),
        |md AS (SELECT gh FROM (SELECT gh, count(*) AS n FROM (SELECT DISTINCT doc_id, gh FROM g) GROUP BY gh) WHERE n > 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (g.gh IN (SELECT gh FROM md)) AS BIGINT) AS n_dup_grams,
        |  CAST(count(*) FILTER (g.gh IN (SELECT gh FROM md)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_span_frac
        |FROM g GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "doc_tokenize" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |allw AS (SELECT unnest(ws) AS word FROM w),
        |v0 AS (SELECT word, count(*) AS cnt FROM allw GROUP BY word ORDER BY cnt DESC, word LIMIT 16),
        |v AS (SELECT word, CAST(row_number() OVER (ORDER BY cnt DESC, word) - 1 AS INT) AS tid FROM v0),
        |e0 AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS pos FROM w),
        |e AS (SELECT doc_id, pos, ws[pos] AS word FROM e0),
        |t AS (SELECT e.doc_id, e.pos, COALESCE(v.tid, 16) AS tid FROM e LEFT JOIN v USING (word))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(*) FILTER (tid = 16) AS BIGINT) AS n_unk,
        |  string_agg(tid, ' ' ORDER BY pos) AS token_str
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_oov_rate" ->
      """WITH w AS (SELECT source, doc_id, length(text) AS n_chars,
        |    string_split(text, ' ') AS ws FROM documents),
        |allw AS (SELECT unnest(ws) AS word FROM w),
        |v AS (SELECT word, count(*) AS cnt FROM allw GROUP BY word ORDER BY cnt DESC, word LIMIT 16),
        |e AS (SELECT source, doc_id, n_chars, unnest(ws) AS word FROM w),
        |per AS (SELECT source, doc_id, MIN(n_chars) AS n_chars,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) FILTER (v.word IS NULL) AS BIGINT) AS n_oov
        |  FROM e LEFT JOIN v USING (word) GROUP BY source, doc_id)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_oov) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS oov_rate,
        |  CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS chars_per_token
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    "doc_quality_gate" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |  len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) AS n_stop
        | FROM documents),
        |u AS (SELECT doc_id,
        |  CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr,
        |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
        |  least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score
        | FROM t),
        |s AS (SELECT doc_id, 0.4*ttr + 0.3*(1.0 - stop_ratio) + 0.3*len_score AS quality FROM u),
        |j AS (SELECT s.doc_id, d.source, s.quality,
        |  percent_rank() OVER (PARTITION BY d.source ORDER BY s.quality, s.doc_id) AS pr
        |  FROM s JOIN documents d USING (doc_id))
        |SELECT doc_id, source, quality, pr FROM j WHERE pr >= 0.1 ORDER BY doc_id""".stripMargin,
    // Integer-exact rule replay: every Gopher rule is a cross-multiplied
    // integer comparison, so the gate hashes with no float anywhere.
    "doc_gopher_gate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sum_word_chars,
        |  CAST(len(list_filter(ws, w -> w = '#' OR w = '...')) AS BIGINT) AS n_sym,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
        |  CAST((CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(ws, 'a') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(ws, 'table') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(ws, 'value') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        | FROM t)
        |SELECT doc_id, source, n_words, sum_word_chars, n_sym, n_alpha, n_stop,
        |  (n_words >= 50 AND n_words <= 100000) AS r_wordcount,
        |  (3 * n_words <= sum_word_chars AND sum_word_chars <= 10 * n_words) AS r_wordlen,
        |  (10 * n_sym <= n_words) AS r_symbol,
        |  (5 * n_alpha >= 4 * n_words) AS r_alpha,
        |  (n_stop >= 2) AS r_stop,
        |  ((n_words >= 50 AND n_words <= 100000)
        |    AND (3 * n_words <= sum_word_chars AND sum_word_chars <= 10 * n_words)
        |    AND (10 * n_sym <= n_words) AND (5 * n_alpha >= 4 * n_words)
        |    AND (n_stop >= 2)) AS pass
        |FROM s ORDER BY doc_id""".stripMargin,
    // Training replay alone: the pruned model (top-24 unigrams / top-300
    // vocab-interior bigrams, count-desc key-asc — the same total order the
    // Scala side collects and persists) rebuilt in SQL, emitted as the same
    // (kind, key, cnt) table the build query returns.
    "doc_lm_build" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM w),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM w),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300)
        |SELECT kind, key, cnt FROM (
        |  SELECT 'uni' AS kind, wd AS key, c AS cnt FROM uni
        |  UNION ALL SELECT 'big' AS kind, pr AS key, c AS cnt FROM big
        |  UNION ALL SELECT 'total' AS kind, '' AS key, (SELECT n FROM tot) AS cnt)
        |ORDER BY kind, key""".stripMargin,
    // Full training replay + stupid-backoff scoring rerun in fixed point
    // (`//` = Spark `div` on non-negative longs). The Spark side serves
    // from the persisted model, so a corrupt artifact would hash-mismatch
    // here — the end-to-end content check on the build.
    "doc_lm_score" ->
      """WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents),
        |tr AS (SELECT ws FROM w WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM tr),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM tr),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300),
        |pe AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM w),
        |px AS (SELECT doc_id, p.a AS a, p.b AS b FROM pe),
        |sc AS (SELECT px.doc_id,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN (1000000 * bg.c) // ua.c
        |         ELSE (400000 * COALESCE(ub.c, 0)) // (SELECT n FROM tot) END AS ppm,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM px LEFT JOIN big bg ON bg.pr = px.a || ' ' || px.b
        |          LEFT JOIN uni ua ON ua.wd = px.a
        |          LEFT JOIN uni ub ON ub.wd = px.b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
        |    CAST(sum(hit) AS BIGINT) AS n_hits, CAST(sum(ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY doc_id)
        |SELECT w.doc_id, w.lang, w.source, CAST(len(w.ws) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.n_scored, 0) AS BIGINT) AS n_scored,
        |  CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(COALESCE(a.sum_ppm, 0) AS BIGINT) AS sum_ppm,
        |  CAST(COALESCE(a.sum_ppm, 0) // greatest(COALESCE(a.n_scored, 0), 1) AS BIGINT) AS fit_ppm
        |FROM w LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Same scoring replay, rolled up by source — all-integer surface
    // (counts, long ppm sums, floor-division means), so the whole per-
    // domain quality table hashes cross-engine.
    "doc_lm_source_audit" ->
      """WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents),
        |tr AS (SELECT ws FROM w WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM tr),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM tr),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300),
        |pe AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM w),
        |px AS (SELECT doc_id, p.a AS a, p.b AS b FROM pe),
        |sc AS (SELECT px.doc_id,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN (1000000 * bg.c) // ua.c
        |         ELSE (400000 * COALESCE(ub.c, 0)) // (SELECT n FROM tot) END AS ppm,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM px LEFT JOIN big bg ON bg.pr = px.a || ' ' || px.b
        |          LEFT JOIN uni ua ON ua.wd = px.a
        |          LEFT JOIN uni ub ON ub.wd = px.b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
        |    CAST(sum(hit) AS BIGINT) AS n_hits, CAST(sum(ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY doc_id),
        |per AS (SELECT w.doc_id, w.source, CAST(len(w.ws) AS BIGINT) AS n_tokens,
        |    COALESCE(a.n_scored, 0) AS n_scored, COALESCE(a.n_hits, 0) AS n_hits,
        |    COALESCE(a.sum_ppm, 0) AS sum_ppm
        |  FROM w LEFT JOIN agg a USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_scored) AS BIGINT) AS n_scored,
        |  CAST(sum(n_hits) AS BIGINT) AS n_hits,
        |  CAST(sum(sum_ppm) AS BIGINT) AS sum_ppm,
        |  CAST(sum(sum_ppm) // greatest(sum(n_scored), 1) AS BIGINT) AS fit_ppm,
        |  CAST((1000 * sum(n_hits)) // greatest(sum(n_scored), 1) AS BIGINT) AS hits_per_1000
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // The selection gate: same scoring replay, per-doc 30/70 bucket
    // labels, tail dropped (keep head+middle ⇔ pr <= 0.7).
    "doc_lm_gate" ->
      """WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents),
        |tr AS (SELECT ws FROM w WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM tr),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM tr),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300),
        |pe AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM w),
        |px AS (SELECT doc_id, p.a AS a, p.b AS b FROM pe),
        |sc AS (SELECT px.doc_id,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN (1000000 * bg.c) // ua.c
        |         ELSE (400000 * COALESCE(ub.c, 0)) // (SELECT n FROM tot) END AS ppm
        |  FROM px LEFT JOIN big bg ON bg.pr = px.a || ' ' || px.b
        |          LEFT JOIN uni ua ON ua.wd = px.a
        |          LEFT JOIN uni ub ON ub.wd = px.b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, CAST(sum(ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY doc_id),
        |fin AS (SELECT w.doc_id, w.lang, w.source, CAST(len(w.ws) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(a.sum_ppm, 0) // greatest(COALESCE(a.n_scored, 0), 1) AS BIGINT) AS fit_ppm
        |  FROM w LEFT JOIN agg a USING (doc_id)),
        |bk AS (SELECT doc_id, lang, source, n_tokens, fit_ppm,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY fit_ppm DESC, doc_id) AS pr FROM fin)
        |SELECT doc_id, lang, source, n_tokens, fit_ppm,
        |  CASE WHEN pr <= 0.3 THEN 'head' WHEN pr <= 0.7 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM bk WHERE pr <= 0.7 ORDER BY doc_id""".stripMargin,
    // Same scoring replay, then the CCNet 30/70 cut per language on the
    // integer fit with doc_id tie-break (unique order -> percent_rank is
    // the same (rank-1)/(n-1) double both engines).
    // Same train+score replay as doc_lm_buckets, cut at the bucket floors.
    "doc_lm_cutoffs" ->
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |tr AS (SELECT ws FROM w WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM tr),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM tr),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300),
        |pe AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM w),
        |px AS (SELECT doc_id, p.a AS a, p.b AS b FROM pe),
        |sc AS (SELECT px.doc_id,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN (1000000 * bg.c) // ua.c
        |         ELSE (400000 * COALESCE(ub.c, 0)) // (SELECT n FROM tot) END AS ppm
        |  FROM px LEFT JOIN big bg ON bg.pr = px.a || ' ' || px.b
        |          LEFT JOIN uni ua ON ua.wd = px.a
        |          LEFT JOIN uni ub ON ub.wd = px.b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, CAST(sum(ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY doc_id),
        |fin AS (SELECT w.doc_id, w.lang,
        |    CAST(COALESCE(a.sum_ppm, 0) // greatest(COALESCE(a.n_scored, 0), 1) AS BIGINT) AS fit_ppm
        |  FROM w LEFT JOIN agg a USING (doc_id)),
        |bk AS (SELECT lang, fit_ppm,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY fit_ppm DESC, doc_id) AS pr FROM fin),
        |lab AS (SELECT lang,
        |    CASE WHEN pr <= 0.3 THEN 'head' WHEN pr <= 0.7 THEN 'middle' ELSE 'tail' END AS bucket,
        |    fit_ppm FROM bk)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(CASE WHEN bucket = 'head' THEN fit_ppm END) AS BIGINT) AS head_floor_ppm,
        |  CAST(min(CASE WHEN bucket != 'tail' THEN fit_ppm END) AS BIGINT) AS middle_floor_ppm
        |FROM lab GROUP BY lang ORDER BY lang""".stripMargin,
    "doc_lm_buckets" ->
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |tr AS (SELECT ws FROM w WHERE lang = 'en'),
        |u AS (SELECT unnest(ws) AS wd FROM tr),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY wd ORDER BY c DESC, wd LIMIT 24),
        |bp AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS pr FROM tr),
        |big AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM bp
        |        WHERE string_split(pr, ' ')[1] IN (SELECT wd FROM uni)
        |          AND string_split(pr, ' ')[2] IN (SELECT wd FROM uni)
        |        GROUP BY pr ORDER BY c DESC, pr LIMIT 300),
        |pe AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM w),
        |px AS (SELECT doc_id, p.a AS a, p.b AS b FROM pe),
        |sc AS (SELECT px.doc_id,
        |    CASE WHEN bg.c IS NOT NULL AND ua.c IS NOT NULL THEN (1000000 * bg.c) // ua.c
        |         ELSE (400000 * COALESCE(ub.c, 0)) // (SELECT n FROM tot) END AS ppm
        |  FROM px LEFT JOIN big bg ON bg.pr = px.a || ' ' || px.b
        |          LEFT JOIN uni ua ON ua.wd = px.a
        |          LEFT JOIN uni ub ON ub.wd = px.b),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, CAST(sum(ppm) AS BIGINT) AS sum_ppm
        |  FROM sc GROUP BY doc_id),
        |fin AS (SELECT w.doc_id, w.lang,
        |    CAST(COALESCE(a.sum_ppm, 0) // greatest(COALESCE(a.n_scored, 0), 1) AS BIGINT) AS fit_ppm
        |  FROM w LEFT JOIN agg a USING (doc_id)),
        |bk AS (SELECT lang, fit_ppm,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY fit_ppm DESC, doc_id) AS pr FROM fin),
        |lab AS (SELECT lang,
        |    CASE WHEN pr <= 0.3 THEN 'head' WHEN pr <= 0.7 THEN 'middle' ELSE 'tail' END AS bucket,
        |    fit_ppm FROM bk)
        |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(fit_ppm) AS BIGINT) AS sum_fit_ppm,
        |  CAST(min(fit_ppm) AS BIGINT) AS min_fit_ppm,
        |  CAST(max(fit_ppm) AS BIGINT) AS max_fit_ppm
        |FROM lab GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "doc_assemble" ->
      s"""WITH lng AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'le')) + len(list_filter(string_split(text,' '), x -> x = 'la')) + len(list_filter(string_split(text,' '), x -> x = 'les')) AS BIGINT) AS score_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'der')) + len(list_filter(string_split(text,' '), x -> x = 'die')) + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x = 'el')) + len(list_filter(string_split(text,' '), x -> x = 'los')) + len(list_filter(string_split(text,' '), x -> x = 'una')) AS BIGINT) AS score_es
        |  FROM documents),
        |langs AS (SELECT doc_id,
        |  CASE WHEN greatest(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
        |       WHEN score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
        |       WHEN score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
        |       WHEN score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
        |       ELSE 'es' END AS pred_lang FROM lng),
        |t AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |  len(list_filter(string_split(text,' '), x -> x = 'the')) + len(list_filter(string_split(text,' '), x -> x = 'a')) AS n_stop
        | FROM documents),
        |u AS (SELECT doc_id,
        |  CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr,
        |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
        |  least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score
        | FROM t),
        |qual AS (SELECT doc_id, 0.4*ttr + 0.3*(1.0 - stop_ratio) + 0.3*len_score AS quality FROM u),
        |tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |pck AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS seq_id
        |  FROM tok),
        |nrm AS (SELECT vec_id AS doc_id,
        |  sqrt(${dotSql("CAST(embedding AS DOUBLE[])", "CAST(embedding AS DOUBLE[])")}) AS emb_norm
        |  FROM embeddings)
        |SELECT d.doc_id, d.source, langs.pred_lang, qual.quality, pck.n_tokens, pck.seq_id,
        |  COALESCE(nrm.emb_norm, -1.0) AS emb_norm
        |FROM documents d JOIN langs USING (doc_id) JOIN qual USING (doc_id)
        |JOIN pck USING (doc_id) LEFT JOIN nrm USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "doc_pack" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(COALESCE(pre, 0) AS BIGINT) AS start_off,
        |  CAST(COALESCE(pre, 0) // 512 AS BIGINT) AS seq_id
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
