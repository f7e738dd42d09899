package graft.oracles

/** DuckDB oracle SQL for the `mm_*` multimodal registrations — split out of
  * `SparkEntry` (r12: the registry file had grown past 5k lines; the
  * oracle map is the moved half, merged back verbatim in
  * `SparkEntry.oracleSql`, whose emitted oracle_sql.json is the contract
  * and is diff-checked byte-identical across the split).
  */
private[graft] object MmOracles {

  import Sql._

  val sql: Map[String, String] = Map(
    "mm_media_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(320 + strlen(text) % 1280 AS BIGINT) AS width,
        |  CAST(240 + strlen(text) % 720 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 24 + strlen(text) % 240 END AS BIGINT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_dedup_stats" ->
      """WITH m AS (SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    md5(text) AS h, CAST(strlen(text) AS BIGINT) AS nb
        |  FROM documents),
        |b AS (SELECT media_type, h, COUNT(*) AS copies, MIN(nb) AS nb
        |  FROM m GROUP BY 1, 2)
        |SELECT media_type, CAST(SUM(copies) AS BIGINT) AS n_media,
        |  CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(copies * nb) AS BIGINT) AS bytes_total,
        |  CAST(SUM(nb) AS BIGINT) AS bytes_unique,
        |  CAST(SUM(nb) AS DOUBLE) / CAST(SUM(copies * nb) AS DOUBLE) AS dedup_ratio
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // Recompute the aHash from the pixel DEFINITION (the PNG bytes are a
    // JVM-side encoding detail): 16×16 pixels → 8×8 cells of 4 (floor-avg)
    // → mean threshold → 64-char bit string, all integer arithmetic.
    // The % 21 cross-format twins (same pixels as PNG and as baseline
    // JPEG) use the per-8×8-flat even-valued pixel class whose JPEG
    // decode provably equals the definition, so one pixel CTE covers all
    // three container encodings.
    "mm_phash_dedup" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id AS src, 0 AS blocky FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, doc_id, 0 FROM documents WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 6000000, doc_id, 1 FROM documents WHERE doc_id % 21 = 0
        |  UNION ALL
        |  SELECT doc_id + 7000000, doc_id, 1 FROM documents WHERE doc_id % 21 = 0),
        |px AS (
        |  SELECT i.doc_id, t.x, u.y,
        |    CASE WHEN i.blocky = 1
        |      THEN ((i.src * 31 + (t.x // 8) * 7 + (u.y // 8) * 13) % 128) * 2
        |      ELSE (i.src * 31 + t.x * 7 + u.y * 13) % 256 END AS v
        |  FROM imgs i, range(16) t(x), range(16) u(y)),
        |cells AS (
        |  SELECT doc_id, x // 2 AS cx, y // 2 AS cy, SUM(v) // 4 AS cell
        |  FROM px GROUP BY doc_id, x // 2, y // 2),
        |means AS (SELECT doc_id, SUM(cell) // 64 AS mean FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, '' ORDER BY cy, cx) AS ahash
        |  FROM cells c JOIN means USING (doc_id) GROUP BY c.doc_id)
        |SELECT ahash, COUNT(*) AS n_copies,
        |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        |FROM bits GROUP BY ahash HAVING COUNT(*) > 1 ORDER BY ahash""".stripMargin,
    // Brute-force Hamming ≤ 2 pairs over the sampled pixel-definition
    // hashes — the probe join must reproduce this set exactly.
    "mm_phash_near" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id AS src, 0 AS bump, 0 AS blocky FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, doc_id AS src, 6 AS bump, 0 AS blocky
        |  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 6000000, doc_id, 0, 1 FROM documents WHERE doc_id % 77 = 0
        |  UNION ALL
        |  SELECT doc_id + 7000000, doc_id, 0, 1 FROM documents WHERE doc_id % 77 = 0),
        |px AS (
        |  SELECT i.doc_id, t.x, u.y,
        |    CASE WHEN i.blocky = 1
        |      THEN ((i.src * 31 + (t.x // 8) * 7 + (u.y // 8) * 13) % 128) * 2
        |      ELSE (i.src * 31 + t.x * 7 + u.y * 13 +
        |        CASE WHEN t.x = 0 AND u.y = 0 THEN i.bump ELSE 0 END) % 256 END AS v
        |  FROM imgs i, range(16) t(x), range(16) u(y)),
        |cells AS (
        |  SELECT doc_id, x // 2 AS cx, y // 2 AS cy, SUM(v) // 4 AS cell
        |  FROM px GROUP BY doc_id, x // 2, y // 2),
        |means AS (SELECT doc_id, SUM(cell) // 64 AS mean FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, '' ORDER BY cy, cx) AS ahash
        |  FROM cells c JOIN means USING (doc_id) GROUP BY c.doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |    a.ahash AS ha, b.ahash AS hb
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id),
        |h AS (
        |  SELECT doc_id_a, doc_id_b,
        |    CAST(SUM(CASE WHEN substr(ha, r.i, 1) = substr(hb, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hamming
        |  FROM pairs, range(1, 65) r(i) GROUP BY doc_id_a, doc_id_b)
        |SELECT doc_id_a, doc_id_b, hamming FROM h
        |WHERE hamming <= 2 ORDER BY doc_id_a, doc_id_b""".stripMargin,
    // The image gate's four-tier decision replayed from the pixel
    // definitions: decodability → within-batch identical-hash min-id →
    // Hamming ≤ 2 vs the resident hash set → ingested, coalesced in gate
    // order (the doc_incr_dedup_ingest oracle pattern).
    "mm_phash_ingest" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id % 23 = 0),
        |imgs AS (
        |  SELECT doc_id, doc_id AS src, 0 AS kind, 1 AS resident, 1 AS decodable FROM base
        |  UNION ALL SELECT doc_id + 4000000, doc_id, 0, 0, 1 FROM base WHERE doc_id % 46 = 0
        |  UNION ALL SELECT doc_id + 5000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 92 = 0
        |  UNION ALL SELECT doc_id + 6000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 92 = 0
        |  UNION ALL SELECT doc_id + 7000000, doc_id, 3, 0, 1 FROM base WHERE doc_id % 69 = 0
        |  UNION ALL SELECT doc_id + 8000000, doc_id, 4, 0, 1 FROM base
        |  UNION ALL SELECT doc_id + 9000000, doc_id, -1, 0, 0 FROM base WHERE doc_id % 115 = 0),
        |px AS (
        |  SELECT i.doc_id, i.resident, t.x, u.y,
        |    CASE i.kind
        |      WHEN 0 THEN (i.src * 31 + t.x * 7 + u.y * 13) % 256
        |      WHEN 2 THEN (i.src * 41 + t.x * 9 + u.y * 5 + 1) % 256
        |      WHEN 3 THEN (i.src * 31 + t.x * 7 + u.y * 13 +
        |        CASE WHEN t.x = 0 AND u.y = 0 THEN 6 ELSE 0 END) % 256
        |      WHEN 4 THEN (i.src * 57 + t.x * 11 + u.y * 17 + 3) % 256
        |    END AS v
        |  FROM imgs i, range(16) t(x), range(16) u(y) WHERE i.decodable = 1),
        |cells AS (
        |  SELECT doc_id, x // 2 AS cx, y // 2 AS cy, SUM(v) // 4 AS cell
        |  FROM px GROUP BY doc_id, x // 2, y // 2),
        |means AS (SELECT doc_id, SUM(cell) // 64 AS mean FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, '' ORDER BY cy, cx) AS ahash
        |  FROM cells c JOIN means USING (doc_id) GROUP BY c.doc_id),
        |rh AS (SELECT b.doc_id, b.ahash FROM bits b JOIN imgs i USING (doc_id) WHERE i.resident = 1),
        |bh AS (SELECT b.doc_id, b.ahash FROM bits b JOIN imgs i USING (doc_id) WHERE i.resident = 0),
        |keep AS (SELECT ahash, MIN(doc_id) AS keep_id FROM bh GROUP BY ahash),
        |hp AS (
        |  SELECT p.bid, CAST(SUM(CASE WHEN substr(p.hb, r.i, 1) = substr(p.hr, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hd
        |  FROM (SELECT DISTINCT b.doc_id AS bid, b.ahash AS hb, rr.ahash AS hr
        |        FROM bh b, rh rr) p,
        |    range(1, 65) r(i)
        |  GROUP BY p.bid, p.hr),
        |near AS (SELECT DISTINCT bid FROM hp WHERE hd <= 2)
        |SELECT i.doc_id,
        |  CASE WHEN i.decodable = 0 THEN 'undecodable'
        |       WHEN i.doc_id > k.keep_id THEN 'batch_dup'
        |       WHEN n.bid IS NOT NULL THEN 'near_dup'
        |       ELSE 'ingested' END AS verdict
        |FROM imgs i
        |LEFT JOIN bh ON bh.doc_id = i.doc_id
        |LEFT JOIN keep k ON k.ahash = bh.ahash
        |LEFT JOIN near n ON n.bid = i.doc_id
        |WHERE i.resident = 0
        |ORDER BY i.doc_id""".stripMargin,
    // Brute-force Hamming ≤ 2 over fingerprints recomputed from the PCM
    // sample DEFINITION (the container bytes are invisible to SQL — which
    // is the point: Spark must decode byte-different containers to the
    // same signal). Frame f = (i*9)//576; E(f,b) = Σ|s[i]−s[i−b]|;
    // bit(f,b) = (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) > 0.
    "mm_audio_near" ->
      """WITH aud AS (
        |  SELECT doc_id, doc_id AS src, -1 AS bump_at FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000, doc_id, -1 FROM documents WHERE doc_id % 33 = 0
        |  UNION ALL
        |  SELECT doc_id + 5000000, doc_id, 570 FROM documents WHERE doc_id % 44 = 0),
        |sm AS (
        |  SELECT a.doc_id, r.i AS i,
        |    ((a.src * 37 + r.i * 11 -
        |      CASE WHEN a.bump_at >= 0 AND r.i IN (a.bump_at, a.bump_at + 1)
        |        THEN 1 ELSE 0 END) % 4096) - 2048 AS s
        |  FROM aud a, range(576) r(i)),
        |e AS (
        |  SELECT c.doc_id, (c.i * 9) // 576 AS f, lb.b AS b,
        |    CAST(SUM(ABS(c.s - p.s)) AS BIGINT) AS en
        |  FROM sm c
        |  JOIN range(1, 10) lb(b) ON c.i >= lb.b
        |  JOIN sm p ON p.doc_id = c.doc_id AND p.i = c.i - lb.b
        |  GROUP BY c.doc_id, (c.i * 9) // 576, lb.b),
        |bits AS (
        |  SELECT e1.doc_id,
        |    string_agg(CASE WHEN (e1.en - e2.en) - (e3.en - e4.en) > 0
        |      THEN '1' ELSE '0' END, '' ORDER BY e1.f, e1.b) AS h
        |  FROM e e1
        |  JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f AND e2.b = e1.b + 1
        |  JOIN e e3 ON e3.doc_id = e1.doc_id AND e3.f = e1.f - 1 AND e3.b = e1.b
        |  JOIN e e4 ON e4.doc_id = e1.doc_id AND e4.f = e1.f - 1 AND e4.b = e1.b + 1
        |  WHERE e1.f >= 1 AND e1.b <= 8
        |  GROUP BY e1.doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.h AS ha, b.h AS hb
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id),
        |h AS (
        |  SELECT doc_id_a, doc_id_b,
        |    CAST(SUM(CASE WHEN substr(ha, r.i, 1) = substr(hb, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hamming
        |  FROM pairs, range(1, 65) r(i) GROUP BY doc_id_a, doc_id_b)
        |SELECT doc_id_a, doc_id_b, hamming FROM h
        |WHERE hamming <= 2 ORDER BY doc_id_a, doc_id_b""".stripMargin,
    // Brute-force Hamming ≤ 2 over video fingerprints recomputed from the
    // frame-pixel DEFINITION (container bytes invisible to SQL — Spark must
    // decode byte-different AVIs to the same frames). t = (f*9)//18 time
    // segments × c = (y*3)//12*3 + (x*3)//12 spatial cells; E(t,c) = Σ px;
    // bit(t,c) = (E(t,c)−E(t,c+1)) − (E(t−1,c)−E(t−1,c+1)) > 0.
    "mm_video_near" ->
      """WITH vids AS (
        |  SELECT doc_id, doc_id AS src, 0 AS bump FROM documents WHERE doc_id % 17 = 0
        |  UNION ALL
        |  SELECT doc_id + 8000000, doc_id, 0 FROM documents WHERE doc_id % 51 = 0
        |  UNION ALL
        |  SELECT doc_id + 9000000, doc_id, 101 FROM documents WHERE doc_id % 68 = 0),
        |px AS (
        |  SELECT v.doc_id, fr.f, t.x, u.y,
        |    (v.src * 31 + fr.f * fr.f * 7 + t.x * 5 + u.y * 3 +
        |      CASE WHEN v.bump != 0 AND fr.f >= 16
        |          AND t.x BETWEEN 4 AND 7 AND u.y BETWEEN 4 AND 7
        |        THEN v.bump ELSE 0 END) % 256 AS val
        |  FROM vids v, range(18) fr(f), range(12) t(x), range(12) u(y)),
        |e AS (
        |  SELECT doc_id, (f * 9) // 18 AS t,
        |    ((y * 3) // 12) * 3 + ((x * 3) // 12) AS c,
        |    CAST(SUM(val) AS BIGINT) AS en
        |  FROM px GROUP BY doc_id, (f * 9) // 18, ((y * 3) // 12) * 3 + ((x * 3) // 12)),
        |bits AS (
        |  SELECT e1.doc_id,
        |    string_agg(CASE WHEN (e1.en - e2.en) - (e3.en - e4.en) > 0
        |      THEN '1' ELSE '0' END, '' ORDER BY e1.t, e1.c) AS h
        |  FROM e e1
        |  JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.t = e1.t AND e2.c = e1.c + 1
        |  JOIN e e3 ON e3.doc_id = e1.doc_id AND e3.t = e1.t - 1 AND e3.c = e1.c
        |  JOIN e e4 ON e4.doc_id = e1.doc_id AND e4.t = e1.t - 1 AND e4.c = e1.c + 1
        |  WHERE e1.t >= 1 AND e1.c <= 7
        |  GROUP BY e1.doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.h AS ha, b.h AS hb
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id),
        |h AS (
        |  SELECT doc_id_a, doc_id_b,
        |    CAST(SUM(CASE WHEN substr(ha, r.i, 1) = substr(hb, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hamming
        |  FROM pairs, range(1, 65) r(i) GROUP BY doc_id_a, doc_id_b)
        |SELECT doc_id_a, doc_id_b, hamming FROM h
        |WHERE hamming <= 2 ORDER BY doc_id_a, doc_id_b""".stripMargin,
    // Image hashes + per-frame video hashes + the cut segmentation + the
    // cross-modality Hamming pairs, all from the pixel definitions.
    "mm_still_pairs" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id % 41 = 0),
        |ipx AS (
        |  SELECT b.doc_id, t.x, u.y,
        |    (b.doc_id * 31 + t.x * 7 + u.y * 13) % 256 AS val
        |  FROM base b, range(12) t(x), range(12) u(y)),
        |icells AS (
        |  SELECT doc_id, (2 * y + 1) // 3 AS cy, (2 * x + 1) // 3 AS cx,
        |    SUM(val) // COUNT(*) AS cell
        |  FROM ipx GROUP BY doc_id, (2 * y + 1) // 3, (2 * x + 1) // 3),
        |imeans AS (SELECT doc_id, SUM(cell) // 64 AS mean FROM icells GROUP BY doc_id),
        |ibits AS (
        |  SELECT c.doc_id,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, '' ORDER BY cy, cx) AS h
        |  FROM icells c JOIN imeans USING (doc_id) GROUP BY c.doc_id),
        |vpx AS (
        |  SELECT b.doc_id, fr.f, t.x, u.y,
        |    CASE WHEN fr.f >= 6 AND fr.f < 12
        |        THEN (b.doc_id * 31 + t.x * 7 + u.y * 13) % 256
        |      WHEN fr.f < 6
        |        THEN ((b.doc_id * 47 + 13) % 128) + (11 - t.x) * 5 + u.y * 3 + fr.f % 4
        |      ELSE ((b.doc_id * 71 + 29) % 128) + t.x * 5 + (11 - u.y) * 3 + fr.f % 4
        |    END AS val
        |  FROM base b, range(18) fr(f), range(12) t(x), range(12) u(y)
        |  WHERE b.doc_id % 82 = 0),
        |vcells AS (
        |  SELECT doc_id, f, (2 * y + 1) // 3 AS cy, (2 * x + 1) // 3 AS cx,
        |    SUM(val) // COUNT(*) AS cell
        |  FROM vpx GROUP BY doc_id, f, (2 * y + 1) // 3, (2 * x + 1) // 3),
        |vmeans AS (SELECT doc_id, f, SUM(cell) // 64 AS mean
        |  FROM vcells GROUP BY doc_id, f),
        |vbits AS (
        |  SELECT c.doc_id, c.f,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, ''
        |      ORDER BY cy, cx) AS h
        |  FROM vcells c JOIN vmeans m ON m.doc_id = c.doc_id AND m.f = c.f
        |  GROUP BY c.doc_id, c.f),
        |vhd AS (
        |  SELECT a.doc_id, a.f,
        |    CAST(SUM(CASE WHEN substr(a.h, r.i, 1) = substr(p.h, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS d
        |  FROM vbits a JOIN vbits p ON p.doc_id = a.doc_id AND p.f = a.f - 1,
        |    range(1, 65) r(i)
        |  GROUP BY a.doc_id, a.f),
        |starts AS (
        |  SELECT b.doc_id, b.f, b.h,
        |    CAST(row_number() OVER (PARTITION BY b.doc_id ORDER BY b.f) AS BIGINT) AS shot_no
        |  FROM vbits b LEFT JOIN vhd ON vhd.doc_id = b.doc_id AND vhd.f = b.f
        |  WHERE b.f = 0 OR vhd.d > 16),
        |pairs AS (
        |  SELECT i.doc_id AS image_doc_id, s.doc_id + 2000000 AS video_doc_id,
        |    s.shot_no, i.h AS hi, s.h AS hk
        |  FROM ibits i, starts s),
        |hp AS (
        |  SELECT image_doc_id, video_doc_id, shot_no,
        |    CAST(SUM(CASE WHEN substr(hi, r.i, 1) = substr(hk, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hamming
        |  FROM pairs, range(1, 65) r(i)
        |  GROUP BY image_doc_id, video_doc_id, shot_no)
        |SELECT image_doc_id, video_doc_id, shot_no, hamming
        |FROM hp WHERE hamming <= 2
        |ORDER BY image_doc_id, video_doc_id, shot_no""".stripMargin,
    // Per-frame aHash replay (12×12 → 8×8 cells via the boundary-grid
    // inverse cx = (2x+1)//3, variable cell populations → SUM//COUNT),
    // consecutive-frame Hamming > 16 = a cut, shots = running cut count.
    "mm_video_shots" ->
      """WITH vids AS (
        |  SELECT doc_id, doc_id AS src,
        |    CASE WHEN doc_id % 62 = 0 THEN 1 ELSE 0 END AS has_cuts
        |  FROM documents WHERE doc_id % 31 = 0),
        |segs AS (
        |  SELECT v.doc_id, v.src, fr.f,
        |    CASE WHEN v.has_cuts = 0 THEN 0
        |         WHEN fr.f < 6 THEN 0 WHEN fr.f < 12 THEN 1 ELSE 2 END AS seg
        |  FROM vids v, range(18) fr(f)),
        |px AS (
        |  SELECT s.doc_id, s.f, t.x, u.y,
        |    ((s.src * 31 + s.seg * 97) % 128) + (s.f % 8) +
        |      CASE s.seg WHEN 0 THEN t.x * 5 + u.y * 3
        |        WHEN 1 THEN (11 - t.x) * 5 + u.y * 3
        |        ELSE t.x * 5 + (11 - u.y) * 3 END AS val
        |  FROM segs s, range(12) t(x), range(12) u(y)),
        |cells AS (
        |  SELECT doc_id, f, (2 * y + 1) // 3 AS cy, (2 * x + 1) // 3 AS cx,
        |    SUM(val) // COUNT(*) AS cell
        |  FROM px GROUP BY doc_id, f, (2 * y + 1) // 3, (2 * x + 1) // 3),
        |means AS (SELECT doc_id, f, SUM(cell) // 64 AS mean
        |  FROM cells GROUP BY doc_id, f),
        |bits AS (
        |  SELECT c.doc_id, c.f,
        |    string_agg(CASE WHEN cell > mean THEN '1' ELSE '0' END, ''
        |      ORDER BY cy, cx) AS h
        |  FROM cells c JOIN means m ON m.doc_id = c.doc_id AND m.f = c.f
        |  GROUP BY c.doc_id, c.f),
        |hd AS (
        |  SELECT a.doc_id, a.f,
        |    CAST(SUM(CASE WHEN substr(a.h, r.i, 1) = substr(p.h, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS d
        |  FROM bits a JOIN bits p ON p.doc_id = a.doc_id AND p.f = a.f - 1,
        |    range(1, 65) r(i)
        |  GROUP BY a.doc_id, a.f),
        |cut AS (
        |  SELECT b.doc_id, b.f,
        |    CASE WHEN hd.d > 16 THEN 1 ELSE 0 END AS is_cut
        |  FROM bits b LEFT JOIN hd ON hd.doc_id = b.doc_id AND hd.f = b.f),
        |shotof AS (
        |  SELECT doc_id, f,
        |    1 + SUM(COALESCE(is_cut, 0)) OVER (PARTITION BY doc_id ORDER BY f) AS shot_no
        |  FROM cut)
        |SELECT doc_id, CAST(shot_no AS BIGINT) AS shot_no,
        |  CAST(MIN(f) AS BIGINT) AS start_frame, CAST(MAX(f) AS BIGINT) AS end_frame,
        |  COUNT(*) AS n_frames
        |FROM shotof GROUP BY doc_id, shot_no ORDER BY doc_id, shot_no""".stripMargin,
    // The audio gate's four-tier decision from the PCM sample
    // definitions: fingerprint chain = mm_audio_near's; tier order =
    // mm_phash_ingest's.
    "mm_audio_ingest" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
        |aud AS (
        |  SELECT doc_id, doc_id AS src, 0 AS kind, 1 AS resident, 1 AS decodable FROM base
        |  UNION ALL SELECT doc_id + 4000000, doc_id, 0, 0, 1 FROM base WHERE doc_id % 26 = 0
        |  UNION ALL SELECT doc_id + 5000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 52 = 0
        |  UNION ALL SELECT doc_id + 6000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 52 = 0
        |  UNION ALL SELECT doc_id + 7000000, doc_id, 3, 0, 1 FROM base WHERE doc_id % 39 = 0
        |  UNION ALL SELECT doc_id + 8000000, doc_id, 4, 0, 1 FROM base
        |  UNION ALL SELECT doc_id + 9000000, doc_id, -1, 0, 0 FROM base WHERE doc_id % 65 = 0),
        |sm AS (
        |  SELECT a.doc_id, a.resident, r.i AS i,
        |    CASE a.kind
        |      WHEN 0 THEN ((a.src * 37 + r.i * 11) % 4096) - 2048
        |      WHEN 2 THEN ((a.src * 53 + r.i * 7 + 3) % 4096) - 2048
        |      WHEN 3 THEN ((a.src * 37 + r.i * 11 -
        |        CASE WHEN r.i IN (570, 571) THEN 1 ELSE 0 END) % 4096) - 2048
        |      WHEN 4 THEN ((a.src * 61 + r.i * 13 + 5) % 4096) - 2048
        |    END AS s
        |  FROM aud a, range(576) r(i) WHERE a.decodable = 1),
        |e AS (
        |  SELECT c.doc_id, c.resident, (c.i * 9) // 576 AS f, lb.b AS b,
        |    CAST(SUM(ABS(c.s - p.s)) AS BIGINT) AS en
        |  FROM sm c
        |  JOIN range(1, 10) lb(b) ON c.i >= lb.b
        |  JOIN sm p ON p.doc_id = c.doc_id AND p.i = c.i - lb.b
        |  GROUP BY c.doc_id, c.resident, (c.i * 9) // 576, lb.b),
        |bits AS (
        |  SELECT e1.doc_id, e1.resident,
        |    string_agg(CASE WHEN (e1.en - e2.en) - (e3.en - e4.en) > 0
        |      THEN '1' ELSE '0' END, '' ORDER BY e1.f, e1.b) AS h
        |  FROM e e1
        |  JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f AND e2.b = e1.b + 1
        |  JOIN e e3 ON e3.doc_id = e1.doc_id AND e3.f = e1.f - 1 AND e3.b = e1.b
        |  JOIN e e4 ON e4.doc_id = e1.doc_id AND e4.f = e1.f - 1 AND e4.b = e1.b + 1
        |  WHERE e1.f >= 1 AND e1.b <= 8
        |  GROUP BY e1.doc_id, e1.resident),
        |rh AS (SELECT doc_id, h FROM bits WHERE resident = 1),
        |bh AS (SELECT doc_id, h FROM bits WHERE resident = 0),
        |keep AS (SELECT h, MIN(doc_id) AS keep_id FROM bh GROUP BY h),
        |hp AS (
        |  SELECT p.bid, CAST(SUM(CASE WHEN substr(p.hb, r.i, 1) = substr(p.hr, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hd
        |  FROM (SELECT DISTINCT b.doc_id AS bid, b.h AS hb, rr.h AS hr
        |        FROM bh b, rh rr) p,
        |    range(1, 65) r(i)
        |  GROUP BY p.bid, p.hr),
        |near AS (SELECT DISTINCT bid FROM hp WHERE hd <= 2)
        |SELECT a.doc_id,
        |  CASE WHEN a.decodable = 0 THEN 'undecodable'
        |       WHEN a.doc_id > k.keep_id THEN 'batch_dup'
        |       WHEN n.bid IS NOT NULL THEN 'near_dup'
        |       ELSE 'ingested' END AS verdict
        |FROM aud a
        |LEFT JOIN bh ON bh.doc_id = a.doc_id
        |LEFT JOIN keep k ON k.h = bh.h
        |LEFT JOIN near n ON n.bid = a.doc_id
        |WHERE a.resident = 0
        |ORDER BY a.doc_id""".stripMargin,
    // The video gate's four-tier decision from the frame-pixel
    // definitions: fingerprint chain = mm_video_near's; tier order =
    // mm_phash_ingest's.
    "mm_video_ingest" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id % 19 = 0),
        |vids AS (
        |  SELECT doc_id, doc_id AS src, 0 AS kind, 1 AS resident, 1 AS decodable FROM base
        |  UNION ALL SELECT doc_id + 4000000, doc_id, 0, 0, 1 FROM base WHERE doc_id % 38 = 0
        |  UNION ALL SELECT doc_id + 5000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 76 = 0
        |  UNION ALL SELECT doc_id + 6000000, doc_id, 2, 0, 1 FROM base WHERE doc_id % 76 = 0
        |  UNION ALL SELECT doc_id + 7000000, doc_id, 3, 0, 1 FROM base WHERE doc_id % 57 = 0
        |  UNION ALL SELECT doc_id + 8000000, doc_id, 4, 0, 1 FROM base
        |  UNION ALL SELECT doc_id + 9000000, doc_id, -1, 0, 0 FROM base WHERE doc_id % 95 = 0),
        |px AS (
        |  SELECT v.doc_id, v.resident, fr.f, t.x, u.y,
        |    CASE v.kind
        |      WHEN 0 THEN (v.src * 31 + fr.f * fr.f * 7 + t.x * 5 + u.y * 3) % 256
        |      WHEN 2 THEN (v.src * 43 + fr.f * 11 + t.x * 7 + u.y * 5 + 2) % 256
        |      WHEN 3 THEN (v.src * 31 + fr.f * fr.f * 7 + t.x * 5 + u.y * 3 +
        |        CASE WHEN fr.f >= 16 AND t.x BETWEEN 4 AND 7 AND u.y BETWEEN 4 AND 7
        |          THEN 101 ELSE 0 END) % 256
        |      WHEN 4 THEN (v.src * 57 + fr.f * 13 + t.x * 9 + u.y * 7 + 5) % 256
        |    END AS val
        |  FROM vids v, range(18) fr(f), range(12) t(x), range(12) u(y)
        |  WHERE v.decodable = 1),
        |e AS (
        |  SELECT doc_id, resident, (f * 9) // 18 AS t,
        |    ((y * 3) // 12) * 3 + ((x * 3) // 12) AS c,
        |    CAST(SUM(val) AS BIGINT) AS en
        |  FROM px GROUP BY doc_id, resident, (f * 9) // 18,
        |    ((y * 3) // 12) * 3 + ((x * 3) // 12)),
        |bits AS (
        |  SELECT e1.doc_id, e1.resident,
        |    string_agg(CASE WHEN (e1.en - e2.en) - (e3.en - e4.en) > 0
        |      THEN '1' ELSE '0' END, '' ORDER BY e1.t, e1.c) AS h
        |  FROM e e1
        |  JOIN e e2 ON e2.doc_id = e1.doc_id AND e2.t = e1.t AND e2.c = e1.c + 1
        |  JOIN e e3 ON e3.doc_id = e1.doc_id AND e3.t = e1.t - 1 AND e3.c = e1.c
        |  JOIN e e4 ON e4.doc_id = e1.doc_id AND e4.t = e1.t - 1 AND e4.c = e1.c + 1
        |  WHERE e1.t >= 1 AND e1.c <= 7
        |  GROUP BY e1.doc_id, e1.resident),
        |rh AS (SELECT doc_id, h FROM bits WHERE resident = 1),
        |bh AS (SELECT doc_id, h FROM bits WHERE resident = 0),
        |keep AS (SELECT h, MIN(doc_id) AS keep_id FROM bh GROUP BY h),
        |hp AS (
        |  SELECT p.bid, CAST(SUM(CASE WHEN substr(p.hb, r.i, 1) = substr(p.hr, r.i, 1)
        |      THEN 0 ELSE 1 END) AS INT) AS hd
        |  FROM (SELECT DISTINCT b.doc_id AS bid, b.h AS hb, rr.h AS hr
        |        FROM bh b, rh rr) p,
        |    range(1, 65) r(i)
        |  GROUP BY p.bid, p.hr),
        |near AS (SELECT DISTINCT bid FROM hp WHERE hd <= 2)
        |SELECT v.doc_id,
        |  CASE WHEN v.decodable = 0 THEN 'undecodable'
        |       WHEN v.doc_id > k.keep_id THEN 'batch_dup'
        |       WHEN n.bid IS NOT NULL THEN 'near_dup'
        |       ELSE 'ingested' END AS verdict
        |FROM vids v
        |LEFT JOIN bh ON bh.doc_id = v.doc_id
        |LEFT JOIN keep k ON k.h = bh.h
        |LEFT JOIN near n ON n.bid = v.doc_id
        |WHERE v.resident = 0
        |ORDER BY v.doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |mm AS (SELECT *, CAST(CASE WHEN media_type = 'image' THEN 1 ELSE 24 + n % 240 END AS BIGINT) AS frames FROM m),
        |s AS (SELECT doc_id, media_type, frames, n, unnest(range(0, least(8, frames))) AS i FROM mm),
        |f AS (SELECT doc_id, media_type, n, frames, (i * frames) // least(8, frames) AS frame_no FROM s)
        |SELECT doc_id, media_type, frame_no,
        |  (frame_no * 1000) // 24 AS frame_ts_ms,
        |  (frame_no * n) // frames AS byte_off
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,
  )
}
