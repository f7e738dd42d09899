package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is a named operator from SURVEY.md §2 (or a scale
  * extension), implemented Spark-first in graft.ops / graft.crm /
  * graft.vector; each `oracleSql` entry is the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names and
  * output ordering match exactly on both sides; numeric aggregates are
  * decimal-exact (graft.functions.Num) so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = coreQueries ++ crmQueries

  /** Build-once on-disk artifacts per (kind, sf dir) — the amortized-index
    * contract. Production builds an index once and queries it many times,
    * so the registered `*_build` entries time a FRESH build on every call
    * while the `*_query` twins serve from this cache (building lazily only
    * if no `*_build` entry ran first, e.g. under SPARK_GRAFT_ONLY). The
    * content correctness of a cached build is checked END-TO-END: the query
    * twin reads only the built layout and must still hash-match its
    * engine-independent oracle.
    */
  private val artifactCache = new scala.collection.concurrent.TrieMap[String, String]
  private def cachedArtifact(kind: String, sfDir: String)(build: String => Unit): String =
    artifactCache.getOrElseUpdate(s"$kind|$sfDir", {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$kind").toString + "/idx"
      build(dir)
      dir
    })

  /** The shared seed-rule IVF layout (kmeansIters = 0 at the autoCells
    * default) that `vec_cell_balance` and the three `*_indexed` mining
    * registrations all serve from. ONE builder so the config can never
    * drift between them — their oracles replay exactly this seed
    * assignment, so a divergent copy would hash-mismatch confusingly.
    * Cache-keyed per sf dir; whichever query runs first pays the build
    * (alphabetically `vec_cell_balance` in a full run — the documented
    * cachedArtifact convention).
    */
  private def ivfBalDir(s: SparkSession, d: String): String = {
    val emb = Tables.embeddings(s, d)
    cachedArtifact("ivfbal", d)(p =>
      graft.vector.IvfIndex.build(s, emb, p,
        nCells = Similarity.autoCells(Similarity.memoCount(emb)), kmeansIters = 0))
  }

  private val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.2-2.8) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_shipping_priority" -> ((s, d) =>
      Relational.shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) =>
      Relational.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q6_revenue_forecast" -> ((s, d) => Relational.revenueForecast(Tables.lineitem(s, d))),
    "q_window_running" -> ((s, d) => Relational.supplierRunningShipments(Tables.lineitem(s, d))),
    "q_window_funcs" -> ((s, d) => Relational.supplierShipNavigation(Tables.lineitem(s, d))),
    "q_rollup_returns" -> ((s, d) => Relational.returnsRollup(Tables.lineitem(s, d))),
    "q_setops_nations" -> ((s, d) =>
      Relational.nationSetOps(Tables.nation(s, d), Tables.customer(s, d), Tables.supplier(s, d))),
    "q_order_stats" -> ((s, d) => Relational.orderStats(Tables.orders(s, d))),
    "q_topk_parts" -> ((s, d) => Relational.topExpensiveParts(Tables.part(s, d))),
    "q_cube_orders" -> ((s, d) => Relational.priorityStatusCube(Tables.orders(s, d))),
    "q_large_orders" -> ((s, d) =>
      Relational.largeOrders(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_above_avg_parts" -> ((s, d) => Relational.aboveAverageParts(Tables.part(s, d))),
    "q12_priority_ship" -> ((s, d) =>
      Relational.priorityShipSummary(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q14_promo_share" -> ((s, d) =>
      Relational.promoRevenueShare(Tables.part(s, d), Tables.lineitem(s, d))),
    "q19_brand_bands" -> ((s, d) =>
      Relational.brandBandRevenue(Tables.part(s, d), Tables.lineitem(s, d))),
    "q_anti_join" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_semi_join" -> ((s, d) =>
      Relational.customersWithUrgentOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q4_priority_exists" -> ((s, d) =>
      Relational.orderPriorityCheck(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q7_volume_shipping" -> ((s, d) =>
      Relational.volumeShipping(Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q10_returned_items" -> ((s, d) =>
      Relational.returnedItemRevenue(Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_quantiles" -> ((s, d) => Relational.quantiles(Tables.lineitem(s, d))),
    // ANALYZE-style stats: 5 lineitem columns profiled in one aggregation
    // (exact ndv via Expand; exact quartiles via percentile ≡ quantile_cont).
    "q_column_stats" -> ((s, d) => Relational.columnStats(Tables.lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey"))),
    // Decimal-exact moments → Pearson r + OLS of extendedprice on quantity
    // (built-in corr() can't oracle-bind: float accumulation order).
    "q_regression" -> ((s, d) =>
      Relational.regressionMoments(Tables.lineitem(s, d), "l_quantity", "l_extendedprice")),
    // 20-bucket equi-width distribution of extendedprice, empty buckets kept.
    "q_histogram" -> ((s, d) =>
      Relational.histogram(Tables.lineitem(s, d), "l_extendedprice")),
    // Top-10 customer revenue concentration with cumulative shares.
    "q_revenue_concentration" -> ((s, d) =>
      Relational.revenueConcentration(Tables.orders(s, d), Tables.lineitem(s, d))),
    // Per-returnflag regression: the GROUP BY twin of q_regression.
    "q_regression_by_flag" -> ((s, d) => Relational.regressionMomentsBy(
      Tables.lineitem(s, d), "l_returnflag", "l_quantity", "l_extendedprice")),
    "q13_order_counts" -> ((s, d) =>
      Relational.orderCountDistribution(Tables.customer(s, d), Tables.orders(s, d))),
    "q15_top_supplier" -> ((s, d) =>
      Relational.topSupplierRevenue(Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q17_small_qty" -> ((s, d) =>
      Relational.smallQtyRevenue(Tables.part(s, d), Tables.lineitem(s, d))),
    "q22_global_sales" -> ((s, d) =>
      Relational.globalSalesOpportunity(Tables.customer(s, d), Tables.orders(s, d))),
    "q8_market_share" -> ((s, d) =>
      Relational.marketShare(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d), Tables.part(s, d))),
    "q9_nation_profit" -> ((s, d) =>
      Relational.nationProfit(Tables.nation(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d), Tables.part(s, d))),
    "q16_supplier_counts" -> ((s, d) =>
      Relational.partSupplierCounts(Tables.part(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q20_excess_supply" -> ((s, d) =>
      Relational.excessSupplySuppliers(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.part(s, d), Tables.lineitem(s, d))),
    "q21_waiting_suppliers" -> ((s, d) =>
      Relational.waitingSuppliers(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d))),
    "q2_min_cost_supplier" -> ((s, d) =>
      Relational.minCostSupplier(Tables.region(s, d), Tables.nation(s, d),
        Tables.supplier(s, d), Tables.part(s, d), Tables.lineitem(s, d))),
    "q11_important_stock" -> ((s, d) =>
      Relational.importantStock(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.lineitem(s, d))),
    "q_grouping_sets" -> ((s, d) => Relational.priorityStatusGroupingSets(Tables.orders(s, d))),
    "q_multiset_ops" -> ((s, d) =>
      Relational.nationMultisetOps(Tables.customer(s, d), Tables.supplier(s, d))),
    "q_pivot" -> ((s, d) => Relational.returnflagStatusPivot(Tables.lineitem(s, d))),
    // ---- event analytics (SURVEY §2.10 batch forms) ----
    "ev_tumbling_hourly" -> ((s, d) => Events.tumblingHourly(Tables.events(s, d))),
    "ev_sessionize" -> ((s, d) => Events.sessionize(Tables.events(s, d))),
    "ev_sliding_qtr" -> ((s, d) => Events.slidingQuarterHourly(Tables.events(s, d))),
    "ev_json_buckets" -> ((s, d) => Events.jsonPropBuckets(Tables.events(s, d))),
    "ev_top_users" -> ((s, d) => Events.topUsers(Tables.events(s, d), Tables.customer(s, d))),
    "ev_asof_join" -> ((s, d) => AsOfJoin.eventOrderAsOf(Tables.events(s, d), Tables.orders(s, d))),
    // View→purchase conversion-latency quantiles: AsOfJoin to the latest
    // prior view, exact integer microsecond latencies, the distributed
    // exact-quantile engine (quantile_cont-parity interpolation).
    "ev_conversion_latency" -> ((s, d) => Events.conversionLatency(Tables.events(s, d))),
    "ev_range_join" -> ((s, d) =>
      RangeJoin.eventsNearOrders(Tables.events(s, d), Tables.orders(s, d))),
    // no oracleSql on purpose: HLL estimates are engine-specific; driver
    // records the weaker rows-only check for this one.
    "ev_approx_users" -> ((s, d) => Events.approxUserCounts(Tables.events(s, d))),
    // rows-only for the same reason (sketch estimates are engine-specific).
    "ev_approx_quantiles" -> ((s, d) => Events.approxValueQuantiles(Tables.events(s, d))),
    "ev_topk_per_user" -> ((s, d) => graft.functions.TopKAggregator.topEventsPerUser(Tables.events(s, d))),
    // Z-order layout roundtrip: events rewritten z-ordered on
    // (user_id, value), then a two-dimensional selective scan over the
    // layout — the oracle reads the RAW table, so any row the layout
    // dropped, duplicated, or altered hash-mismatches. The pruning teeth
    // (scan reads a fraction of the files) are asserted in ZOrderSpec.
    "ev_zorder_scan" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val dir = cachedArtifact("zorder", d) { p =>
        graft.sources.ZOrder.writeZOrdered(
          Tables.events(s, d).select(col("event_id"), col("user_id"), col("value")),
          p, "user_id", "value")
      }
      s.read.parquet(dir)
        .filter(col("user_id").between(100, 163) && col("value") >= 50.0)
        .orderBy(col("event_id"))
    }),
    // ---- similarity search / vector index (SURVEY §3.1, scale extensions) ----
    "vec_knn_l2" -> ((s, d) => Similarity.knnL2(Tables.embeddings(s, d))),
    // Matryoshka-style funnel: prefix-16-dim candidates (m=50), exact
    // full-vector re-rank. The rule is deterministic end to end, so the
    // oracle mirrors BOTH stages rather than binding only an exact config.
    "vec_prefix_rerank" -> ((s, d) => Similarity.prefixRerankKnn(Tables.embeddings(s, d))),
    // Per-dimension extent/dead-dim audit over the embedding corpus.
    "vec_dim_extent" -> ((s, d) => Similarity.dimExtent(Tables.embeddings(s, d))),
    "vec_knn_cosine" -> ((s, d) => Similarity.knnCosine(Tables.embeddings(s, d))),
    // SQ8 in the provably-exact configuration (refine covers the corpus —
    // the PQ-family oracle pattern): full encode→ADC→refine machinery,
    // brute-force answer, so the vec_knn_l2 oracle binds verbatim.
    "vec_sq_search" -> ((s, d) => graft.vector.SqIndex.searchExact(Tables.embeddings(s, d))),
    // Batch SQ join: the ADC band (± the analytic decode-error bound)
    // provably contains the true top-k, so the re-rank answer is exactly
    // brute force and the oracle is the plain per-query top-k SQL.
    "vec_sq_knn_join" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      graft.vector.SqIndex.knnJoin(emb.filter(col("vec_id") % 37 === 0), emb)
    }),
    // Exact range search (all neighbors within r): map-only distance +
    // filter — no shuffle at any scale; r² = 1.45 is the ~1-2% tail of
    // this generator's distance distribution from vec 0.
    "vec_range_search" -> ((s, d) => Similarity.rangeSearch(Tables.embeddings(s, d))),
    // Batch kNN join: top-k neighbors for EVERY row of a query table (the
    // deterministic vec_id % 37 slice), via IVF-cell blocking. The oracle
    // mirrors the BLOCKED plan itself (assignment + multi-probe + within-
    // cell top-k are all deterministic and SQL-expressible — the same
    // two-path-oracle precedent as doc_blocked_jaccard), so the hash check
    // is recall-independent; SimilaritySpec holds the algorithmic asserts
    // (probe-all ≡ brute force exactly; default probes hit a recall floor).
    "vec_knn_join" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      Similarity.knnJoin(emb.filter(col("vec_id") % 37 === 0), emb)
    }),
    // Hard-negative mining (contrastive-training data prep): the 5 nearest
    // DIFFERENT-label corpus neighbors for each of a BOUNDED 256-anchor
    // sample (hashDraw order — production mines a training batch, never
    // the corpus, so cost is flat in corpus size per anchor where the
    // full self-join form is ~n^1.5 under autoProbe). Candidates via the
    // same IVF-cell blocked join as vec_knn_join; oracle mirrors the
    // blocked plan + the anchor rule (recall-independent hash);
    // SimilaritySpec holds probe-all ≡ brute force on the full form.
    "vec_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegativesFor(Similarity.anchorSample(emb), emb)
    }),
    // Leave-one-out kNN label audit (embedding-quality probe): per-label
    // majority-vote accuracy over the 256-anchor sample's 5 nearest
    // corpus others (the stratified-audit posture — anchor-proportional
    // cost), blocked like vec_knn_join; integer vote with deterministic
    // argmax tie-break. Full-corpus audit stays the SimilaritySpec pin.
    "vec_label_audit" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnLabelAuditFor(Similarity.anchorSample(emb), emb)
    }),
    // One exact distributed Lloyd step (fixed-point microunit sums — all
    // long arithmetic through the shuffle, cross-engine exact; the double
    // division happens once at output). Seeds = vec_id < 8, argmin
    // assignment with cid tie-break, (cell, dim) roll-up.
    "vec_kmeans_step" -> ((s, d) =>
      Similarity.kmeansStep(Tables.embeddings(s, d))),
    // TWO exact Lloyd rounds through the training loop: round 1 updates
    // the centroids (quantized mean → one float rounding per coordinate,
    // empty cells keep their seed), round 2's (cell, dim) roll-up is the
    // output — so the oracle replays a genuine multi-round trajectory,
    // float-rounded centroids and all, in SQL. Pin for kmeansTrain /
    // IvfIndex.retrain beyond the spec-level bitwise Lloyd reference.
    "vec_kmeans_train2" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val (cents, _) = Similarity.kmeansTrain(emb, k = 8, rounds = 1)
      Similarity.kmeansStepWith(emb, cents)
    }),
    // Cluster-balanced sample: cap lowest-hash-draw members per seed cell
    // via the bounded native top-k aggregate (no per-cell window sort);
    // the oracle uses the row_number window form — same rows by the
    // numeric-order ≡ hex-lex-order argument.
    "vec_cluster_sample" -> ((s, d) =>
      Similarity.clusterSample(Tables.embeddings(s, d))),
    "vec_ivf_search" -> ((s, d) => Similarity.ivfSearch(Tables.embeddings(s, d))),
    // Recall@10 of the IVF probe trade across budgets 1/2/4/8 over a
    // deterministic 8-query window — the ANN tuning curve, oracle-bound:
    // every stage is engine-portable arithmetic with (d2, id) tie-breaks,
    // and the probe-all row pins recall = 1.0 exactly.
    "vec_recall_curve" -> ((s, d) => Similarity.ivfRecallCurve(Tables.embeddings(s, d))),
    // Contrastive triplet mining (hardest positive + hardest negative per
    // anchor, FaceNet posture) for the BOUNDED 256-anchor sample against
    // the corpus pool, at the BUDGETED autoProbe probe — the production
    // mining shape (a training batch of anchors; cost flat in corpus size
    // per anchor). The oracle mirrors the BLOCKED PLAN + anchor rule
    // (assignment + probe + label-masked top-1 per arm are all
    // deterministic and SQL-expressible), so the hash check is
    // recall-independent. Neighborhood-hardest semantics: anchors lacking
    // either arm inside their probed cells drop (documented inner-join
    // contract) — vec_triplets_exact below is the registered probe-all
    // entry whose mined arms ARE the global FaceNet definition, and
    // SimilaritySpec additionally pins the full-corpus probe-all form.
    "vec_triplets" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.tripletMineFor(Similarity.anchorSample(emb), emb)
    }),
    // The LAYOUT-BACKED mining forms over the kmeansIters=0 artifact (the
    // vec_cell_balance layout): corpus cells come off disk — no per-call
    // O(n·cells·d) assignment pass, and the anchors' probed-cell union
    // statically prunes the partitioned scan. The on-disk assignment IS
    // the seed rule, so these bind to the SAME oracles as the two-table
    // forms: indexed ≡ operator is driver-checked, not just spec-pinned.
    // This is the production mining shape on an indexed corpus — the 100×
    // probe measured the two-table forms at 17-23× wall (the unindexed
    // assignment term); these stay bounded by probed-cell row volume.
    "vec_triplets_indexed" -> ((s, d) =>
      graft.vector.IvfIndex.tripletMine(s, ivfBalDir(s, d),
        Similarity.anchorSample(Tables.embeddings(s, d)))),
    "vec_hard_negatives_indexed" -> ((s, d) =>
      graft.vector.IvfIndex.hardNegatives(s, ivfBalDir(s, d),
        Similarity.anchorSample(Tables.embeddings(s, d)))),
    "vec_label_audit_indexed" -> ((s, d) =>
      graft.vector.IvfIndex.knnLabelAudit(s, ivfBalDir(s, d),
        Similarity.anchorSample(Tables.embeddings(s, d)))),
    // PROBE-ALL triplet mining over the same bounded anchor sample:
    // candidacy is total (nProbe covers every cell), so each anchor's
    // mined positive/negative is the GLOBALLY hardest — the brute FaceNet
    // definition — and the oracle is the plain brute-force SQL, not a
    // plan replay. This is the registered anchor-coverage pin the budgeted
    // entry can't give: every anchor with both arms in the corpus is
    // present in the output. Cost is anchors × corpus (linear in n for
    // fixed anchors) — the exact-tier config, still bounded.
    "vec_triplets_exact" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.tripletMineFor(Similarity.anchorSample(emb), emb, nProbe = 1024)
    }),
    // Robust median/MAD outlier audit per dimension (Hampel identifier) —
    // both median passes through the distributed exact-quantile engine,
    // whose interpolation matched DuckDB quantile_cont bitwise.
    "vec_outlier_audit" -> ((s, d) => Similarity.madOutliers(Tables.embeddings(s, d))),
    // Blocked (IVF-cell) plan; the oracle stays the all-pairs definition —
    // the blocked plan must reproduce it exactly. NOTE: blocked ≡ all-pairs
    // is DATA-DEPENDENT recall, not a guarantee — at cos ≥ 0.42 a
    // qualifying pair is found iff the two vectors share one of their
    // autoProbe (max(4, √cells)) nearest cells, which holds on this
    // generator's geometry at every shipped SF (verified at sf0.001/0.01/0.1; the
    // algorithmic equivalence assert lives in SimilaritySpec). A different
    // embedding generator could need more probes; that would be a recall
    // tuning knob, not an operator bug.
    "vec_dup_pairs" -> ((s, d) => Similarity.cosineDupPairsBlocked(Tables.embeddings(s, d), 0.42)),
    // SemDeDup-shaped pruning over the same verified pair generation:
    // components of the cos >= 0.42 near-dup graph, min-id survivor each,
    // cluster_size = how many corpus vectors that survivor represents.
    // Oracle = all-pairs edges + recursive min-label reachability (the
    // doc_dup_clusters precedent) + the same survivor/size projection.
    "vec_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(Tables.embeddings(s, d), 0.42)),
    // Embedding-space benchmark decontamination — the semantic tier of the
    // decontam ladder (doc_decontam exact n-grams → doc_decontam_bloom →
    // this; paraphrased eval leakage shares no surface form). Benchmark =
    // every 97th vector (the doc_decontam split rule); threshold 0.35 sits
    // deliberately BELOW the corpus's 0.42 near-dup bar — decontamination
    // over-drops, never under-drops. Candidacy is total (broadcast bench,
    // map-only cosine) so the brute SQL oracle binds recall-free: 9 of 494
    // corpus vectors flag at sf0.01, 89 of 4,979 at sf0.1 — selective with
    // teeth at both shipped SFs.
    "vec_decontam" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      Similarity.semanticDecontam(
        emb.filter(col("vec_id") % 97 =!= 0), emb.filter(col("vec_id") % 97 === 0))
    }),
    // Region-balanced diversity sample: 16 sign-pattern regions (first 4
    // dims), cap 8 per region in stable hashDraw order — the embedding-
    // space twin of doc_rebalance. 16 regions over 500/5000 vectors means
    // the cap genuinely cuts at both shipped SFs.
    "vec_diverse_sample" -> ((s, d) =>
      Sampling.diverseSample(Tables.embeddings(s, d), 8, 4)),
    // Second cosine-LSH family (sign random projections), registered at
    // the CANDIDACY-BOUNDED config: 4 bands × 16 bits (keyspace 65,536
    // per band) + df-style bucket cap 256 — per-band candidacy is
    // ≤ 256·n by construction, linear at any corpus size (the round-8
    // probe measured the old exact-recall 2-bit config at 47.9× wall at
    // 10× data; that demonstration is now spec-level, the simhashDupPairs
    // precedent). Oracle = the all-pairs definition at cos ≥ 0.9: the raw
    // corpus has NO pairs at that threshold at the shipped SFs, so the
    // HARNESS plants deterministic near-pairs — every 25th vector
    // re-offered under id+100000, DOUBLED elementwise. Doubling a float
    // is exact (exponent bump, no rounding), so a twin's 64 sign bits are
    // bitwise its source's and candidacy is guaranteed in EVERY band, not
    // probabilistic; SimilaritySpec asserts the cap does not fire on this
    // fixture (capped ≡ uncapped), so the oracle binds recall-free. The
    // oracle mirrors the same union.
    "vec_rplsh_pairs" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => x + x).as("embedding"))
      Similarity.rpLshDupPairs(emb.unionByName(planted), 0.9,
        nBits = 64, bandBits = 16, maxBucket = 256)
    }),
    "vec_index_prune" -> ((s, d) => graft.vector.VectorIndex.pruneStats(Tables.embeddings(s, d))),
    // IVF-PQ build, timed as its own entry: a FRESH k-means + residual-PQ
    // train + partitioned write per call (the honest build cost), installed
    // into the artifact cache for the query twins. The returned summary is
    // the only cross-engine-expressible slice of a k-means artifact — the
    // build's CONTENT is verified end-to-end by the query twins below,
    // whose brute-force oracles bind on data read exclusively from this
    // layout.
    "vec_pq_build" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-q-ivfpq").toString + "/idx"
      graft.vector.IvfPqIndex.build(s, Tables.embeddings(s, d), dir)
      artifactCache.putIfAbsent(s"ivfpq|$d", dir)
      s.read.parquet(s"$dir/vectors")
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(col("vec_id")).as("n_distinct_ids"),
          sum(org.apache.spark.sql.functions.size(col("codes")).cast("long")).as("n_codes"))
    }),
    // PQ single-query search in the PROVABLY-EXACT configuration: probe all
    // cells, refine budget covering the whole corpus — IvfPqSpec proves this
    // config ≡ brute force bit-for-bit, so the DuckDB brute-force top-k
    // oracle binds (the vec_knn_l2 pattern). The fast approximate configs
    // (narrow probe, small refine) stay spec-level in PqIndexSpec/IvfPqSpec.
    // `cell` is dropped from the output: it is the one k-means-dependent
    // column, and exactness of (vec_id, label, dist_sq) is centroid-free.
    "vec_pq_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("ivfpq", d)(p => graft.vector.IvfPqIndex.build(s, emb, p))
      val qv = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
      val rf = ((emb.count() + 9) / 10).toInt
      graft.vector.IvfPqIndex.search(s, dir, qv, k = 10, nProbe = 8, refineFactor = rf)
        .select(col("vec_id"), col("label"), col("dist_sq"))
    }),
    // Batch ADC kNN join over the cached on-disk IVF-PQ layout, same
    // provably-exact configuration (probe-all + full refine ≡ brute force,
    // IvfPqSpec): per-(query, cell) residual LUTs in-plan, codes-only
    // candidate scoring, exact re-rank. Oracle = DuckDB brute-force
    // per-query top-k.
    "vec_pq_knn_join" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("ivfpq", d)(p => graft.vector.IvfPqIndex.build(s, emb, p))
      val rf = ((emb.count() + 9) / 10).toInt
      graft.vector.IvfPqIndex.knnJoin(s, dir, emb.filter(col("vec_id") % 37 === 0),
        k = 10, nProbe = 8, refineFactor = rf)
    }),
    // Budgeted (production) ANN configs, ORACLE-BOUND since round 10 by
    // replaying the deterministic budgeted PLAN (probe → ADC/decode rank →
    // bounded refine → exact re-rank) in SQL — the vec_triplets precedent:
    // the hash pins the plan's determinism, the recall floors for these
    // configs stay spec-asserted (IvfPqSpec "default narrow probe":
    // nProbe=2, refineFactor=4, knnJoin floor ≥ 0.5; SqIndexSpec "budgeted
    // config": refine = 8·k, recall ≥ 0.9). The PQ entry runs against a
    // SEED-SIDECAR artifact (kmeansIters = 0, pqIters = 0): trained
    // centroids/codebooks come from distributed float `avg`, whose
    // cross-engine summation order is not reproducible, while the serve
    // PLAN — probe count, codes-only ADC scan, refine budget, bytes
    // touched — is identical either way, so the timed number still
    // measures the production config (the trained artifact keeps its own
    // build/search entries above).
    // The seed-sidecar artifact build as its OWN timed entry (the
    // vec_serve_build / vec_pq_build precedent — "fast_build" sorts
    // before "search_fast", so the search entry measures the amortized
    // serve path, not a first-call build). Summary oracle = corpus
    // structure, artifact-independent; the build's CONTENT is what the
    // search entry's plan-replay oracle verifies end to end.
    "vec_pq_fast_build" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-q-ivfpq0").toString + "/idx"
      graft.vector.IvfPqIndex.build(s, Tables.embeddings(s, d), dir,
        kmeansIters = 0, pqIters = 0)
      artifactCache.putIfAbsent(s"ivfpq0|$d", dir)
      s.read.parquet(s"$dir/vectors")
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(col("vec_id")).as("n_distinct_ids"),
          sum(org.apache.spark.sql.functions.size(col("codes")).cast("long")).as("n_codes"))
    }),
    "vec_pq_search_fast" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("ivfpq0", d)(p =>
        graft.vector.IvfPqIndex.build(s, emb, p, kmeansIters = 0, pqIters = 0))
      val qv = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
      graft.vector.IvfPqIndex.search(s, dir, qv, k = 10, nProbe = 2, refineFactor = 4)
    }),
    // SQ8's train is per-dimension min/max — order-independent and exact
    // in any engine — so the fast config replays over the TRAINED bounds:
    // encode (clamp + round) → decode → ADC rank → refine 80 → exact
    // top-10, every step single-IEEE-op double arithmetic.
    "vec_sq_search_fast" -> ((s, d) =>
      graft.vector.SqIndex.search(Tables.embeddings(s, d), k = 10, refine = 80)),
    // SQ8 reconstruction-error audit: top-20 worst encode→decode vectors,
    // each checked against the analytic half-step bound (all pass on a
    // healthy corpus — the within_bound column is the contract the ADC
    // serving path rests on). Same exact train/encode/decode arithmetic
    // as vec_sq_search_fast, so the oracle replays it end to end.
    "vec_quant_error" -> ((s, d) =>
      graft.vector.SqIndex.quantErrorAudit(Tables.embeddings(s, d))),
    // IVF cell-occupancy balance audit in its PRODUCTION form — the
    // footer-only count over the physical layout's `cell=` partition
    // column (`IvfIndex.cellBalance`): an indexed corpus already carries
    // its assignment on disk, so the audit reads parquet metadata, not
    // vectors — linear in files, flat in d, no re-assignment pass (the
    // operator form's literal-centroid pass measured 20.9× wall at 100×
    // data pre-cap; it stays registered below at the FIXED-1024 post-cap
    // regime where it is linear, and as the unindexed-corpus fallback).
    // The artifact builds at kmeansIters=0 (the naive-seed layout), so
    // the on-disk assignment is the deterministic seed-cell rule the
    // oracle replays; load_ppm = n·cells·10⁶ DIV total, 10⁶ = balanced —
    // the retrain/salt decision signal. Centroid cells with zero
    // surviving rows report 0 (a hollowed cell is what the audit is FOR).
    "vec_cell_balance" -> ((s, d) =>
      graft.vector.IvfIndex.cellBalance(s, ivfBalDir(s, d))),
    // The operator (unindexed-corpus) form, pinned at the autoCells CAP
    // boundary (1024 fixed cells — the regime where the directory is
    // largest and the assignment pass is linear with a 1024·d constant):
    // a second oracle binding of the load-factor arithmetic, at a cell
    // count three decades above the default's 8/20.
    "vec_cell_balance_cap" -> ((s, d) =>
      Similarity.cellBalance(Tables.embeddings(s, d), nCells = 1024)),
    // Vector-tier point-delete lifecycle (takedown/GDPR), oracle-bound: the
    // cached IVF layout gets a deterministic tombstone set (every 41st
    // vec_id — including the query vector itself, so the nearest hit at
    // d=0 is tombstoned and must vanish) at artifact-build time. Exact-
    // config search (probe ALL cells) must then equal brute-force top-k
    // over the corpus MINUS the deleted ids. Compaction parity and the
    // knnJoin/rangeSearch/ingest-gate behaviors are IvfIndexSpec-pinned.
    "vec_delete_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("ivfdel", d) { p =>
        graft.vector.IvfIndex.build(s, emb, p)
        graft.vector.IvfIndex.delete(s, p,
          emb.filter(col("vec_id") % 41 === 0).select("vec_id"))
      }
      val qv = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
      graft.vector.IvfIndex.search(s, dir, qv, k = 10, nProbe = 8)
        .select(col("vec_id"), col("label"), col("dist_sq"))
    }),
    // Exact distributed covariance moments (the PCA/whitening front half —
    // the rotation stage FAISS applies before quantization): coordinates
    // quantize to floor(x·1e6) microunit longs, every cross-shuffle sum is
    // long arithmetic (the vec_kmeans_step discipline), one
    // map-side-combined aggregation over d(d+1)/2 keys. The d×d Jacobi
    // eigendecomposition consumes these exact sums on the driver
    // (PcaSpec pins it against a single-node reference bitwise).
    "vec_covariance" -> ((s, d) =>
      graft.vector.Pca.covarianceMicro(Tables.embeddings(s, d))),
    // The VECTOR gate's ingest decision oracle-bound (mm_phash_ingest's
    // sibling on the IvfIndex engine), in the probe-all configuration so
    // candidacy is total and the cosine tier is brute-force-replayable
    // (recall-independent, the vec_delete_search rationale): the batch
    // plants verbatim re-offers (cos = 1), SCALED copies (2v — cosine is
    // scale-invariant, the vector analog of a re-encode) twice for the
    // within-batch tier, first-dim-negated near twins (cos = 1 − 2v₁²/|v|²,
    // straddling the 0.95 threshold on this generator), and reversed
    // vectors as fresh content. Every construction is exact in both
    // engines (x+x, sign flip, permutation — no rounding anywhere).
    "vec_ivf_ingest" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("ivfgate", d)(p => graft.vector.IvfIndex.build(s, emb, p))
      def offers(off: Long, modCond: Long, vec: org.apache.spark.sql.Column) =
        emb.filter(col("vec_id") % modCond === 0)
          .select((col("vec_id") + off).as("vec_id"), col("label"), vec.as("embedding"))
      val doubled = transform(col("embedding"), x => x + x)
      val negFirst = transform(col("embedding"), (x, i) =>
        when(i === 0, -x).otherwise(x))
      val batch = offers(4000000L, 29L, col("embedding"))
        .unionByName(offers(5000000L, 58L, doubled))
        .unionByName(offers(6000000L, 58L, doubled))
        .unionByName(offers(7000000L, 87L, negFirst))
        .unionByName(offers(8000000L, 29L, reverse(col("embedding"))))
      graft.vector.IvfIndex.dedupIngest(s, dir, batch, threshold = 0.95, nProbe = 8)
        .orderBy(col("vec_id"))
    }),
    // ---- dedup + text analysis over documents (scale extensions) ----
    // The fixture corpus has no exact copies, so the HARNESS (not the
    // operator) unions a deterministic re-ingest (every 7th doc under a new
    // id) before calling the operator; the oracle SQL mirrors the same union.
    "doc_exact_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      val reIngested = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.exactDupGroups(docs.unionByName(reIngested))
    }),
    "doc_minhash_pairs" -> ((s, d) => Dedup.minhashDupPairs(Tables.documents(s, d))),
    // One-row executive dedup summary (data-card headline numbers).
    "doc_dedup_report" -> ((s, d) => Dedup.dedupReport(Tables.documents(s, d))),
    // Incremental-dedup BUILD, timed as its own entry: a fresh persisted
    // LSH index of the resident corpus per call, installed into the
    // artifact cache for the query twin. Returned artifact = the sizes
    // sidecar (per-doc distinct shingle counts) — md5-free and fully
    // SQL-expressible, so the oracle binds on the build itself.
    "doc_incr_dedup_build" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("graft-q-lsh").toString + "/lsh"
      graft.text.LshIndex.build(s, Tables.documents(s, d), dir)
      artifactCache.putIfAbsent(s"lsh|$d", dir)
      s.read.parquet(s"$dir/sizes").orderBy(col("doc_id"))
    }),
    // Incremental ingestion dedup QUERY: an arriving batch (every 10th doc
    // re-offered — half verbatim, half with a trailing perturbation)
    // dedups against the PERSISTED LSH index of the resident corpus —
    // served from the artifact cache, so the bench measures the amortized
    // query path the design argues for, not build+query. The oracle
    // mirrors the whole two-sided md5 pipeline, so the candidate sets
    // agree bit-for-bit. Nothing re-derives over the resident side.
    "doc_incr_dedup_query" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          when(col("doc_id") % 20 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" zz yy xx"))).as("text"))
      val dir = cachedArtifact("lsh", d)(p => graft.text.LshIndex.build(s, docs, p))
      graft.text.LshIndex.dedupBatch(s, dir, batch)
    }),
    // The FULL ingest gate, verdicts oracle-bound end to end (the build/
    // query twins above pin the pair reports; this pins the four-tier
    // DECISION itself): a crafted batch carries within-batch duplicate
    // twins, verbatim re-offers, suffix near-dups, resident-run SPLICES
    // (the winnow tier's prey) and fresh docs. Own artifact (one ingest
    // per JVM — Verify and Bench each call a query once), winnow tier on.
    // Every tier is md5-deterministic, so DuckDB replays the whole
    // decision procedure and the verdict column hashes cross-engine.
    "doc_incr_dedup_ingest" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      // The gate MUTATES its resident index, so it takes a PRIVATE COPY of
      // the pristine artifact doc_incr_dedup_build times and installs
      // (identical content by construction — same builder over the same
      // corpus). The recursive FS copy costs ~file IO, so BENCH charges
      // the one-time derivation to the build entry, not to this serving
      // decision (the vec_serve_build rationale).
      val dir = cachedArtifact("lshing", d) { p =>
        val src = cachedArtifact("lsh", d)(q => graft.text.LshIndex.build(s, docs, q))
        val conf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
        org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
          fs, new org.apache.hadoop.fs.Path(p), false, conf)
        ()
      }
      val exact = docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      val near = docs.filter(col("doc_id") % 40 === 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text"))
      val splice = docs.filter(col("doc_id") % 40 === 20)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          expr("""concat(array_join(slice(split(text, ' '), 6, 20), ' '),
            | ' q', doc_id, 'a q', doc_id, 'b q', doc_id, 'c q', doc_id,
            | 'd q', doc_id, 'e q', doc_id, 'f q', doc_id, 'g q', doc_id, 'h')"""
            .stripMargin.replaceAll("\n", "")).as("text"))
      val fresh = docs.filter(col("doc_id") % 40 === 30)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          expr("concat('u', doc_id, 'a u', doc_id, 'b u', doc_id, 'c u', " +
            "doc_id, 'd u', doc_id, 'e u', doc_id, 'f')").as("text"))
      val twin = docs.filter(col("doc_id") % 80 === 0)
        .select((col("doc_id") + 3500000L).as("doc_id"), col("text"))
      val batch = exact.unionByName(near).unionByName(splice)
        .unionByName(fresh).unionByName(twin)
      graft.text.LshIndex.ingestBatch(s, dir, batch, winnowMinShared = 3)
    }),
    // Winnowing fingerprints (Schleimer et al. SIGMOD'03 / MOSS): per-doc
    // sliding-window minima over k-gram md5s, pairs from one fingerprint-
    // keyed join — the LOCAL-overlap detector between SimHash (global
    // signature) and MinHash (whole-set similarity). minShared=3 keeps the
    // candidate set discriminative on this shared-vocab generator (25
    // pairs sf0.01 / 416 sf0.1).
    "doc_winnow_pairs" -> ((s, d) =>
      Dedup.winnowDupPairs(Tables.documents(s, d), minShared = 3)),
    // Near-dup clustering: LSH pairs -> connected components (min-label
    // propagation to fixpoint) -> (doc, cluster, size). Oracle = recursive
    // min-id closure over the SAME md5-deterministic pair set.
    "doc_dup_clusters" -> ((s, d) => Dedup.dupClusters(Tables.documents(s, d))),
    // Quality-aware canonical selection: each near-dup cluster keeps its
    // highest-n_chars member (doc_id asc tie-break) — the production
    // survivor rule (keep the BEST variant, not the crawl-order-first
    // one); singletons survive as themselves. Oracle replays the cluster
    // closure plus the same (n_chars desc, id) pick.
    "doc_dup_survivors" -> ((s, d) => Dedup.qualitySurvivors(Tables.documents(s, d))),
    // Integer PageRank over a harness-derived deterministic link graph
    // (d → d div 2, d → (3d+7) mod n — a tree spine plus a mixing ring):
    // the authority prior crawl curation ranks hosts/pages with (the
    // cc-webgraph practice). Fixed-point all-long arithmetic (contribution
    // = rank div out_degree), so THREE full rounds replay exactly in SQL.
    "doc_link_rank" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          expr("doc_id div 2").as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          ((col("doc_id") * 3 + 7) % n).as("dst")))
      graft.ops.Graph.linkRank(edges).withColumnRenamed("node", "doc_id")
    }),
    // Per-doc n-gram novelty: fraction of a doc's distinct 3-grams with
    // corpus df = 1 — the mosaic-duplication / unique-content-mass signal
    // (docs under 3 words drop out, the ngrams contract).
    "doc_novelty" -> ((s, d) => TextAnalysis.docNovelty(Tables.documents(s, d))),
    // Length-bucketed batching audit: quantile cuts on token counts,
    // per-bucket padding waste vs the single-global-bucket baseline
    // (bucket 0) — the dynamic-batching prep measurement. Cuts ride the
    // distributed exact-quantile engine (quantile_cont-bitwise).
    "doc_length_buckets" -> ((s, d) => Curation.lengthBuckets(Tables.documents(s, d))),
    // Composed training-corpus pipeline: language gate + quality gate +
    // cluster-loser drop, in production order (dedup before gates).
    "doc_clean_corpus" -> ((s, d) => TextAnalysis.cleanCorpus(Tables.documents(s, d))),
    "doc_simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    // NOTE: Dedup.simhashDupPairs (Hamming-radius pair search) is
    // spec-level only (DedupSpec: probed ≡ brute-force definition). This
    // generator's shared-vocabulary corpus makes simhash signatures
    // concentrate (~240k hamming-0 pairs at sf0.1 even at 32 bits), so a
    // registered radius query would emit an O(n²)-sized noise set — the
    // operator ships with its algorithmic proof instead of a bench query;
    // the minhash family is the discriminative near-dup tier here.
    // Capped plan: blocks over 100 docs route through within-block LSH
    // banding; the oracle mirrors BOTH paths (md5-deterministic), so the
    // fallback's candidate set is reproduced bit-for-bit by DuckDB.
    "doc_blocked_jaccard" -> ((s, d) => Dedup.blockedJaccardPairsCapped(Tables.documents(s, d))),
    "doc_langid" -> ((s, d) => TextAnalysis.languageId(Tables.documents(s, d))),
    // Confusion audit of the marker heuristic vs the labeled lang column
    // — per-(label, prediction) counts and within-label rates.
    "doc_lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(Tables.documents(s, d))),
    // Deterministic hash-threshold sampling / split assignment / per-group
    // cap — selection stages of the training pipeline (ops.Sampling).
    "doc_sample" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Sampling.hashSample(Tables.documents(s, d), col("doc_id"), "33333333")
        .select(col("doc_id"), col("lang"), col("source")).orderBy(col("doc_id"))
    }),
    "doc_splits" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Sampling.assignSplits(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))
    }),
    "doc_rebalance" -> ((s, d) =>
      Sampling.capPerGroup(Tables.documents(s, d), "source", "doc_id", 50)),
    // Static data-mixture: 3 sources at 50/30/20% of a 2000-token budget —
    // every source's budget is below its corpus share at both shipped SFs,
    // so the truncation arm of the selection genuinely binds.
    "doc_mix" -> ((s, d) => Sampling.mixCorpus(Tables.documents(s, d),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 2000L)),
    // Epoch-upsampled mixture, budget 8000 @ maxEpochs 2: at sf0.01 src0
    // hits the epoch cap (2 full passes, remainder discarded), src1/src2
    // get one full pass + a partial; at sf0.1 every source is partial-only
    // — all three arms of the semantics exercised across the shipped SFs.
    "doc_mix_epochs" -> ((s, d) => Sampling.mixCorpusEpochs(Tables.documents(s, d),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 8000L)),
    // Token-balanced training-shard manifest in stable hashDraw order
    // (deterministic global shuffle + greedy 2000-token cuts): ~14 shards
    // at sf0.01, ~133 at sf0.1 — the export step's balance audit.
    "doc_shards" -> ((s, d) => Sampling.shardAssign(Tables.documents(s, d))),
    "doc_quality" -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "doc_token_counts" -> ((s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    // k=30 over the 31-word generator vocabulary: roughly half the words
    // clear total/30 at each shipped SF, so the threshold genuinely
    // discriminates (and the rare words are far below it).
    "doc_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(Tables.documents(s, d))),
    // PMI-ranked bigram collocations over the bigram distribution's own
    // marginals — integer-exact ranking (⌊c_xy·N·10⁶/(c_x·c_y)⌋, Long
    // floor division in both engines; log is monotone so the ratio ranks
    // by PMI). min-count 5 bites (900 of 916 bigrams survive at sf0.01),
    // and the 31-word generator vocab makes the marginals genuinely
    // shared across pairs.
    "doc_collocations" -> ((s, d) => TextAnalysis.collocations(Tables.documents(s, d))),
    // Spearman rank agreement between two quality signals per source
    // (vocabulary richness vs document length) — the filter-agreement
    // audit, through the distributed average-rank engine (no per-source
    // single-reducer window; ties get the textbook tied-average rank).
    // Integer signals ⇒ every rank and sum is exact, and the registered
    // emission stays integer END TO END (corr_sign + rho2_ppm by DECIMAL
    // floor division over the exact sums): the earlier double-ρ emission
    // was bitwise-identical across engines on this host yet hash-fragile
    // by construction — a sqrt/÷ chain hangs the hash on cross-BUILD FP
    // reproducibility of the oracle engine. The double ρ itself is
    // RelationalSpec-pinned on the same sums.
    "doc_signal_corr" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val sig = Tables.documents(s, d).select(col("source"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("a"),
        col("n_chars").as("b"))
      Relational.rankCorrelationPpm(sig, "source", "a", "b")
    }),
    // Corpus-relative percentile selection per source ("keep the top 30%
    // by signal") — the generic gate whose LM-specific instance is the
    // CCNet 30/70 cut (doc_lm_gate). Exact integer pct_ppm from the
    // tied-average rank engine; boundary ties go in or out together in
    // both engines, so the keep flag hash-binds.
    "doc_quality_pct" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val sig = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Relational.percentileRanks(sig, "source", "n_tokens")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("pct_ppm"), col("keep"))
        .orderBy(col("doc_id"))
    }),
    // Per-source token shares + inverse-Simpson effective source count.
    "doc_source_balance" -> ((s, d) => TextAnalysis.sourceBalance(Tables.documents(s, d))),
    // Per-source document-length quantiles through the distributed exact
    // order-statistics engine (percentile ≡ quantile_cont bitwise).
    "doc_len_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val lens = Tables.documents(s, d).select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Relational.exactQuantilesDistributed(lens, "source", "n_tokens",
          Seq(0.25, 0.5, 0.75, 0.95))
        .groupBy(col("source")).agg(
          max(when(col("q") === 0.25, col("quantile"))).as("p25"),
          max(when(col("q") === 0.5, col("quantile"))).as("p50"),
          max(when(col("q") === 0.75, col("quantile"))).as("p75"),
          max(when(col("q") === 0.95, col("quantile"))).as("p95"))
        .orderBy(col("source"))
    }),
    // √-temperature source mixing (α=0.5 of the p^α smoothing rule):
    // budgets derived from the data, not hand-set weights.
    "doc_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(Tables.documents(s, d), 2000L)),
    // Dense hourly grid with zero-fill + LOCF forward-fill — the
    // time-series regularization op; empty hours must appear.
    "ev_resample_hourly" -> ((s, d) => Events.resampleHourly(Tables.events(s, d))),
    // view → click → purchase conversion funnel, strictly-ordered steps;
    // users carry NULLs from their drop-out stage onward.
    "ev_funnel" -> ((s, d) =>
      Events.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))),
    // The same funnel with a 12-hour conversion deadline per step —
    // long-dormant returns stop counting as conversions; the window
    // predicate is one exact integer microsecond comparison.
    "ev_funnel_windowed" -> ((s, d) =>
      Events.funnelWindowed(Tables.events(s, d), Seq("view", "click", "purchase"),
        maxGapMinutes = 720L)),
    // signup-week cohorts × any-activity retention by week offset.
    "ev_cohort_retention" -> ((s, d) => Events.cohortRetention(Tables.events(s, d))),
    // Exact trailing-7-day distinct users per calendar day.
    "ev_rolling_wau" -> ((s, d) => Events.rollingActiveUsers(Tables.events(s, d))),
    // Volume anomalies: hours >= 2σ from the type's hourly mean over the
    // gap-filled series (2σ so the driver-checked result is non-empty).
    "ev_anomalous_hours" -> ((s, d) => Events.anomalousHours(Tables.events(s, d), 2.0)),
    // Markov transition counts + conditional probabilities over per-user
    // event sequences (ts order, event_id tie-break).
    "ev_transition_matrix" -> ((s, d) => Events.transitionMatrix(Tables.events(s, d))),
    // Two-proportion z-test; arm = user_id parity (the deterministic
    // harness derivation, like the PII fixture); conversion = a purchase
    // over 150 — the threshold keeps both arms mixed at every SF, so the
    // statistic is non-degenerate wherever the driver checks it.
    "ev_ab_test" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Events.abTestConversion(Tables.events(s, d),
        pmod(col("user_id"), lit(2L)),
        col("event_type") === "purchase" && col("value") > 150.0)
    }),
    // Trained linear quality classifier: "reads like src0" vs the rest,
    // integer fixed-point probability-difference weights over a top-300
    // vocab, map-only scoring. Oracle retrains the same model in SQL.
    "doc_quality_classifier" -> ((s, d) =>
      TextAnalysis.qualityClassifier(Tables.documents(s, d), "src0")),
    // Multi-class domain router (fastText-supervised posture): per-source
    // add-one-smoothed integer word scores over the shared top-300 vocab,
    // map-only argmax scoring with a margin audit column. Oracle retrains
    // and re-routes the same integer model in SQL, ties broken toward the
    // lexicographically smallest source in both engines.
    "doc_domain_classify" -> ((s, d) =>
      TextAnalysis.domainClassifier(Tables.documents(s, d))),
    // ROC-sweep calibration of the classifier's cutoff: the balanced-
    // accuracy-maximizing threshold with its confusion counts.
    "doc_threshold_calibration" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val scored = TextAnalysis.qualityClassifier(Tables.documents(s, d), "src0")
      TextAnalysis.calibrateThreshold(scored, col("source") === "src0")
    }),
    // Normalized dedup over a derived corpus: every 9th doc re-ingested
    // UPPERCASED under id+3e6 (the PII fixture pattern) — raw-exact dedup
    // is blind to these; the canonical form must catch them.
    // Cross-tier dedup agreement: every TEXT near-dup pair re-scored by
    // the EMBEDDING tier (ids align across the two tables) — in a real
    // pipeline, text-dup pairs the embedding space calls distant are
    // paraphrase-suspects or an embedder-quality flag.
    "doc_vec_agreement" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      Dedup.minhashDupPairs(Tables.documents(s, d))
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .join(emb.select(col("vec_id").as("doc_a"), col("embedding").as("ea")), "doc_a")
        .join(emb.select(col("vec_id").as("doc_b"), col("embedding").as("eb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          graft.functions.VectorFunctions.cosine(col("ea"), col("eb")).as("cos_sim"))
        .withColumn("vec_agrees", col("cos_sim") >= 0.42)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // Eval-hygiene audit: near-dup pairs STRADDLING train/val/test — the
    // contamination a random split leaks when duplicates exist. Composes
    // the verified MinHash pair generation with the stable split rule.
    "doc_split_leakage" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val splits = graft.ops.Sampling.assignSplits(
        docs.select(col("doc_id")), col("doc_id"))
      Dedup.minhashDupPairs(docs)
        .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
        .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // C4 line-level cleaning (Raffel 2020 §2.2) over harness-derived
    // re-lining (the corpus has no newlines — the fixture chunks every 7
    // words into a line and plants exactly what C4's rules target): every
    // (id+j) % 5 == 0 line loses its terminal punctuation, every
    // (id·31+j) % 13 == 0 line gains the word "javascript", every 97th doc
    // a "lorem ipsum" line, every 89th a curly-brace code line. The oracle
    // replays the re-lining AND the surgery in SQL — line verdicts, doc
    // verdicts and the re-assembled clean text all hash cross-engine.
    // CCNet paragraph-level corpus dedup over a harness-derived multi-line
    // fixture (the doc_c4_lines re-lining, no surgery) with planted
    // cross-doc boilerplate: every 7th doc a newsletter line, every 11th a
    // copyright line whose YEAR varies (2020 + doc_id%5) — five surface
    // forms, ONE normalized class, so the digit-stripping normalization
    // has teeth. The oracle replays re-lining, normalization,
    // first-occurrence choice and text rebuild in SQL.
    "doc_par_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ws = split(col("text"), " ")
      val lineArr = transform(
        sequence(lit(0), floor((size(ws) + lit(6)) / lit(7)).cast("int") - 1),
        j => array_join(slice(ws, j * 7 + 1, lit(7)), " "))
      val withNews = when(col("doc_id") % 7 === 0,
        concat(lineArr, array(lit("subscribe to our newsletter today."))))
        .otherwise(lineArr)
      val withCr = when(col("doc_id") % 11 === 0,
        concat(withNews, array(concat(lit("copyright "),
          (col("doc_id") % 5 + 2020).cast("string"),
          lit(" all rights reserved.")))))
        .otherwise(withNews)
      val lined = Tables.documents(s, d)
        .select(col("doc_id"), array_join(withCr, "\n").as("text"))
      Curation.paragraphDedup(lined)
    }),
    // Incremental paragraph dedup — the CCNet shard posture: the resident
    // half (even doc ids) seeds the persisted ParagraphIndex; the offered
    // shard (odd ids re-id'd above every resident id, plus verbatim
    // re-offers of every 10th resident doc) cuts against resident
    // paragraph hashes AND its own earlier occurrences. Re-offers rebuild
    // to NULL (every paragraph already owned by a resident). The oracle
    // replays the union with resident-priority first-occurrence choice.
    "doc_par_ingest" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ws = split(col("text"), " ")
      val lineArr = transform(
        sequence(lit(0), floor((size(ws) + lit(6)) / lit(7)).cast("int") - 1),
        j => array_join(slice(ws, j * 7 + 1, lit(7)), " "))
      val withNews = when(col("doc_id") % 7 === 0,
        concat(lineArr, array(lit("subscribe to our newsletter today."))))
        .otherwise(lineArr)
      val withCr = when(col("doc_id") % 11 === 0,
        concat(withNews, array(concat(lit("copyright "),
          (col("doc_id") % 5 + 2020).cast("string"),
          lit(" all rights reserved.")))))
        .otherwise(withNews)
      val linedAll = Tables.documents(s, d)
        .select(col("doc_id"), array_join(withCr, "\n").as("text"))
      val dir = cachedArtifact("paring", d) { p =>
        graft.text.ParagraphIndex.build(s, linedAll.filter(col("doc_id") % 2 === 0), p)
      }
      val freshShard = linedAll.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text"))
      val reoffers = linedAll.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 4500000L).as("doc_id"), col("text"))
      graft.text.ParagraphIndex.ingestBatch(s, dir, freshShard.unionByName(reoffers))
    }),
    // Keyword plants alternate real-world capitalizations ("JavaScript",
    // "Lorem Ipsum") with the lowercase forms — the C4 keyword rules match
    // case-insensitively (Raffel 2020 §2.2 lowercases before matching),
    // and the mixed-case plants are what give that teeth here.
    "doc_c4_lines" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ws = split(col("text"), " ")
      val lineArr = transform(
        sequence(lit(0), floor((size(ws) + lit(6)) / lit(7)).cast("int") - 1),
        j => concat(
          array_join(slice(ws, j * 7 + 1, lit(7)), " "),
          when((col("doc_id") * 31 + j) % 13 === 0,
            when((col("doc_id") + j) % 2 === 0, " JavaScript").otherwise(" javascript"))
            .otherwise(""),
          when((col("doc_id") + j) % 5 === 0, "").otherwise(".")))
      val withLorem = when(col("doc_id") % 97 === 0,
        concat(lineArr, array(
          when(col("doc_id") % 194 === 0, lit("Lorem Ipsum dolor sit amet."))
            .otherwise(lit("lorem ipsum dolor sit amet.")))))
        .otherwise(lineArr)
      val withBrace = when(col("doc_id") % 89 === 0,
        concat(withLorem, array(lit("function() { return 1; }."))))
        .otherwise(withLorem)
      val lined = Tables.documents(s, d)
        .select(col("doc_id"), array_join(withBrace, "\n").as("text"))
      Curation.c4LineClean(lined)
    }),
    // Markup stripping over harness-derived HTML wrapping (the
    // doc_pii_redact fixture pattern): tags, entities, boilerplate div on
    // every 3rd doc — the oracle replays wrap + strip in SQL, so the
    // RE2-safe strip semantics bind cross-engine.
    "doc_strip_markup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val wrapped = Tables.documents(s, d).select(col("doc_id"), concat(
        lit("<html><body><p id=\""), col("doc_id"), lit("\">"),
        expr("replace(text, ' the ', ' &amp; the ')"),
        lit("</p>"),
        when(col("doc_id") % 3 === 0, "<div>footer boilerplate</div>").otherwise(""),
        lit("</body></html>")).as("text"))
      Curation.stripMarkup(wrapped)
    }),
    // Group-aware split REPAIR — closes the leak doc_split_leakage
    // measures: every near-dup cluster moves atomically to its min-id
    // representative's hash-assigned split; singletons keep their own.
    // DedupSpec asserts the repaired assignment leaks zero pairs.
    "doc_split_repair" -> ((s, d) =>
      Sampling.repairSplitLeakage(Tables.documents(s, d))),
    "doc_norm_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val variants = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), upper(col("text")).as("text"))
      TextAnalysis.normalizedDupGroups(
        docs.select(col("doc_id"), col("text")).unionByName(variants))
    }),
    // Conjunctive keyword search over two mid-frequency vocabulary words.
    "doc_search" -> ((s, d) =>
      TextAnalysis.searchDocs(Tables.documents(s, d), Seq("spark", "join"))),
    // Exact contiguous-phrase search; "fast table" hits 18 docs at sf0.01
    // / 273 at sf0.1 (max 2 occurrences), so the positional test, the
    // overlap counting, AND the top-k cut all have teeth at both SFs.
    "doc_phrase_search" -> ((s, d) =>
      TextAnalysis.phraseSearch(Tables.documents(s, d), Seq("fast", "table"))),
    // Scaled-integer tf-idf disjunctive retrieval over one mid-frequency
    // and one rare term — the idf weighting must dominate for the ranking
    // to differ from raw tf, which is what the oracle then checks.
    "doc_tfidf_search" -> ((s, d) =>
      TextAnalysis.tfidfSearch(Tables.documents(s, d), Seq("table", "spark"))),
    // Hybrid lexical+dense retrieval fused with integer-exact RRF: the
    // tf-idf top-20 and the cosine-kNN top-20 (query = vec 0's embedding)
    // fuse by floored 10^12/(60+rank) LONG sums — both arms and the
    // fusion replay exactly in SQL, so the whole hybrid ranking hashes
    // cross-engine (a float RRF would not).
    "doc_hybrid_search" -> ((s, d) =>
      TextAnalysis.hybridSearch(Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("table", "spark"))),
    // Cross-source 4-gram leakage matrix over all C(20,2) source pairs.
    "doc_source_overlap" -> ((s, d) =>
      TextAnalysis.sourceOverlap(Tables.documents(s, d))),
    // Prefix-filtered all-pairs Jaccard at tau = 1/4 over 3-gram shingles:
    // finds the same 25-pair near-dup population as doc_minhash_pairs at
    // sf0.01 (256 at sf0.1) but with a lossless-filter contract; the
    // oracle is the straight all-pairs definition, independent of the
    // prefix-filter derivation it checks.
    "doc_prefix_jaccard" -> ((s, d) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, d))),
    // Exact substring dedup (Lee et al. 2021): every duplicated 8-token
    // span keeps only its global first occurrence; later occurrences are
    // cut out and the text rebuilt. The removal complement of the
    // doc_span_dup measurement.
    "doc_span_removal" -> ((s, d) =>
      Curation.removeDupSpans(Tables.documents(s, d))),
    // Inverted-index-served conjunctive search: same contract and terms
    // as doc_search, but answered from the persisted posting-list layout
    // (the oracle binds the INDEX path to the raw-corpus definition).
    "doc_inverted_search" -> ((s, d) => {
      val dir = cachedArtifact("invidx", d) { p =>
        graft.text.InvertedIndex.build(s, Tables.documents(s, d), p)
      }
      graft.text.InvertedIndex.search(s, dir, Seq("spark", "join"))
    }),
    // Index build + df serving: times a FRESH posting build (artifact
    // cache install), then reads document frequencies for a term list
    // back off the built layout — content pinned by the raw-corpus oracle.
    "doc_inverted_build" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-invidx-fresh")
        .toString + "/idx"
      graft.text.InvertedIndex.build(s, Tables.documents(s, d), dir)
      artifactCache.put(s"invidx|$d", dir)
      graft.text.InvertedIndex.docFreq(s, dir,
        Seq("spark", "join", "table", "fast", "merge"))
    }),
    // One-pass per-source audit card (docs/tokens/chars/lang mix/exact-dup
    // rate) — the datasheet table a corpus release ships.
    "doc_corpus_card" -> ((s, d) => TextAnalysis.corpusCard(Tables.documents(s, d))),
    // Bucketed-snapshot CDC: init from the corpus, then ONE batch that
    // updates every 10th doc, inserts a copy of every 25th under id+1e6,
    // and deletes every 97th — only dirty buckets rewritten (spec-pinned);
    // the final snapshot must equal the declarative merge the oracle runs.
    "doc_snapshot_upsert" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val dir = java.nio.file.Files.createTempDirectory("graft-q-snap").toString + "/s"
      graft.sources.SnapshotStore.init(s, docs, dir)
      val ups = docs.filter(col("doc_id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" updated")))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val dels = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      graft.sources.SnapshotStore.upsert(s, dir, ups, dels)
      graft.sources.SnapshotStore.read(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    // Versioned twin of the same batch: immutable files + atomic manifest
    // commits, so version 1 stays byte-stable under the upsert and both
    // versions are served from one store — the time-travel read the
    // mutable SnapshotStore documents as needing a table format. Output =
    // v1 ∪ v2 tagged by version; oracle = the corpus itself (v1) plus the
    // declarative merge (v2).
    "doc_snapshot_timetravel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val dir = java.nio.file.Files.createTempDirectory("graft-q-vstore").toString + "/s"
      val v1 = graft.sources.VersionedStore.init(s, docs, dir)
      val ups = docs.filter(col("doc_id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" updated")))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val dels = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      val v2 = graft.sources.VersionedStore.upsert(s, dir, ups, dels)
      graft.sources.VersionedStore.read(s, dir, Some(v1)).withColumn("version", lit(1L))
        .unionByName(
          graft.sources.VersionedStore.read(s, dir, Some(v2)).withColumn("version", lit(2L)))
        .select(col("version"), col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("version"), col("doc_id"))
    }),
    // Target corpus = every 97th doc (the decontam holdout pattern);
    // corpus side = the rest. Top 50 by integer-exact relevance density.
    "doc_target_select" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      TextAnalysis.selectByRelevance(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), 50)
    }),
    // 32-token windows advancing by 24 (overlapping pretraining chunks);
    // the generator's ~50-word docs split into 1-2 windows each, so both
    // the single-chunk and tail-window arms fire at every SF.
    "doc_chunks" -> ((s, d) => Curation.chunkDocs(Tables.documents(s, d))),
    // Composed ingest pipeline over a derived crawl snapshot: every 10th
    // doc re-ingested verbatim under id+1000000 (exact-dup tier teeth),
    // every 97th doc held out as the benchmark (decontam teeth; a
    // re-ingested copy of a benchmark doc lands in the corpus and must
    // die at decontamination, not dedup), then lang/quality gate and the
    // doc_mix 50/30/20 budgets over the survivors.
    "doc_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      val reIngested = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val all = docs.unionByName(reIngested)
      Curation.curationPipeline(
        all.filter(col("doc_id") % 97 =!= 0),
        all.filter(col("doc_id") % 97 === 0),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 2000L)
    }),
    // ---- corpus curation (privacy / decontamination / repetition / packing) ----
    // The corpus has no PII, so the HARNESS (not the operator) derives a
    // PII-bearing text column deterministically from doc_id — the same
    // fixture-injection pattern as doc_exact_dedup; the oracle mirrors the
    // derivation. The operator itself (Curation.redactPii) takes any text.
    "doc_pii_redact" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val text2 = when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" reach me at user"), col("doc_id").cast("string"),
            lit("@example.com today")))
        .when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now")))
        .when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" server at 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"), lit(" port")))
        .otherwise(col("text"))
      Curation.redactPii(docs.withColumn("text", text2))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),
    // Benchmark set = every 97th doc (the held-out eval suite); report is
    // corpus docs sharing any word 4-gram with it. 4 is the discriminative
    // width on this generator (727 hits at sf0.1; 8-grams find nothing,
    // 3-grams flag a third of the corpus).
    "doc_decontam" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      Curation.contaminatedDocs(
        docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0))
    }),
    // Same contamination semantics, bloom-guarded plan (the
    // too-many-benchmarks-to-broadcast regime): output must be EXACT, so
    // the same oracle binds.
    "doc_decontam_bloom" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      Curation.contaminatedDocsBloom(
        docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0))
    }),
    // Span-surgery removal form (GPT-3 appendix C): cut the matched
    // window + margin out of contaminated docs, keep clean pieces
    // >= minPiece tokens. Same harness benchmark split as doc_decontam.
    "doc_decontam_spans" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      Curation.decontaminateSpans(
        docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0))
    }),
    "doc_repetition" -> ((s, d) => Curation.repetitionSignals(Tables.documents(s, d))),
    // Span-level duplication vs the WHOLE corpus (RefinedWeb-style): the
    // share of each doc's 4-gram occurrences also present in another doc.
    "doc_span_dup" -> ((s, d) => Curation.spanDupFractions(Tables.documents(s, d))),
    "doc_pack" -> ((s, d) => Curation.packSequences(Tables.documents(s, d))),
    // Vocab of 16 against this generator's ~31 distinct words so the UNK
    // path genuinely exercises (a production vocab is just a bigger map).
    "doc_tokenize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.tokenize(docs, Curation.buildVocab(docs, 16))
    }),
    // Vocabulary-coverage / fertility audit per source: OOV share under the
    // same 16-word frequency vocab as doc_tokenize (small enough that OOV
    // genuinely exercises), chars-per-token fertility.
    "doc_oov_rate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.vocabCoverage(docs, Curation.buildVocab(docs, 16))
    }),
    "doc_quality_gate" -> ((s, d) => TextAnalysis.qualityGate(Tables.documents(s, d))),
    // Gopher hand-rule bundle (published thresholds, integer-exact rule
    // comparisons); stop-word list = this generator's function words so
    // the stop rule genuinely splits the corpus.
    "doc_gopher_gate" -> ((s, d) =>
      TextAnalysis.gopherGate(Tables.documents(s, d),
        stopwords = Seq("the", "a", "table", "value"))),
    // CCNet-style pruned-bigram LM (stupid backoff, fixed-point ppm),
    // build/serve split (the vec_pq_build precedent): doc_lm_build times a
    // FRESH train + persist per call and returns the model table itself
    // (kind/key/cnt, a total order — the oracle replays the prune in SQL);
    // the three serving queries below read ONLY the persisted artifact.
    // vocab 24 / bigram cap 300 both BIND against this generator's ~31-word
    // vocabulary, so the deterministic prune order genuinely exercises.
    "doc_lm_build" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("graft-q-nglm").toString + "/idx"
      graft.text.NgramLm.buildAt(s, Tables.documents(s, d), dir)
      artifactCache.putIfAbsent(s"ngramlm|$d", dir)
      s.read.parquet(s"$dir/model").orderBy(col("kind"), col("key"))
    }),
    // Serve-from-artifact scoring — no retraining in the query. The
    // transcendental ppl column is spec-pinned (`NgramLmSpec`) and dropped
    // here — the oracle hashes the integer surface (the BM25/tfidf
    // precedent). The oracle replays train+score in SQL; content of the
    // persisted model is thereby verified end-to-end.
    "doc_lm_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = cachedArtifact("ngramlm", d)(p => graft.text.NgramLm.buildAt(s, docs, p))
      graft.text.NgramLm.scoreDocsFrom(s, docs, dir).drop("ppl")
    }),
    // CCNet head/middle/tail cut at 30%/70% per language on the integer
    // fit, deterministic tie-break — the keep-the-head curation gate.
    "doc_lm_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = cachedArtifact("ngramlm", d)(p => graft.text.NgramLm.buildAt(s, docs, p))
      graft.text.NgramLm.perplexityBucketsFrom(s, docs, dir)
    }),
    // Per-source LM quality audit (the CCNet per-domain perplexity table):
    // exact integer roll-up of the per-doc fit signals by source.
    "doc_lm_source_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = cachedArtifact("ngramlm", d)(p => graft.text.NgramLm.buildAt(s, docs, p))
      graft.text.NgramLm.lmSourceAuditFrom(s, docs, dir)
    }),
    // The OFFLINE calibration the streaming gate consumes: per-language
    // fit-ppm floors of the head (p30) and head∪middle (p70) buckets —
    // what curatedCorpusIngest's fixed minFitPpm threshold is derived
    // from. Serve-from-artifact like the other doc_lm_* queries.
    "doc_lm_cutoffs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = cachedArtifact("ngramlm", d)(p => graft.text.NgramLm.buildAt(s, docs, p))
      graft.text.NgramLm.lmCutoffsFrom(s, docs, dir)
    }),
    // The CCNet SELECTION applied: per-doc head/middle/tail labels from
    // the persisted model's fit, tail dropped — the gate a curation run
    // feeds downstream, oracle-bound per document.
    "doc_lm_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = cachedArtifact("ngramlm", d)(p => graft.text.NgramLm.buildAt(s, docs, p))
      graft.text.NgramLm.lmGateFrom(s, docs, dir)
    }),
    // End-of-pipeline assembly: language + quality + pack + embedding norm
    // in ONE plan (per-doc signals fuse into one scan; the embeddings join
    // is the only corpus-corpus shuffle).
    "doc_assemble" -> ((s, d) =>
      Curation.assembleExamples(Tables.documents(s, d), Tables.embeddings(s, d))),
    "mm_media_meta" -> ((s, d) => graft.multimodal.Multimodal.mediaMeta(Tables.documents(s, d))),
    "mm_frame_sample" -> ((s, d) => graft.multimodal.Multimodal.frameSamples(Tables.documents(s, d))),
    // Content-addressed dedup audit over the media payloads (CAS model):
    // copies per content hash, bytes saved per modality.
    "mm_dedup_stats" -> ((s, d) => graft.multimodal.Multimodal.dedupStats(Tables.documents(s, d))),
    // Perceptual (pixel-level) image near-dup — what byte-exact
    // mm_dedup_stats misses: the same picture re-encoded. HARNESS builds a
    // deterministic 16×16 gray PNG per doc (pixel(x,y) = (doc_id·31 + 7x +
    // 13y) mod 256) and RE-ENCODES every 9th doc's pixels under a new id
    // with a different PNG filter + deflate level (byte-different file,
    // identical pixels). The operator decodes REAL PNG bytes (Inflater +
    // scanline-filter reconstruction) and groups by integer-exact aHash;
    // the oracle recomputes the hash in SQL from the pixel DEFINITION —
    // binding the whole decode+downsample+hash path cross-engine.
    "mm_phash_dedup" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{JpegCodec, Multimodal, PngCodec}
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      val media = ids.flatMap { id =>
        def px(src: Long): Array[Int] =
          Array.tabulate(256)(p => ((src * 31 + (p % 16) * 7 + (p / 16) * 13) % 256).toInt)
        // per-8×8-flat EVEN pixels: the provably-exact JPEG class (DC-only
        // blocks, 16 | 8·(v−128)), so the oracle can replay decoded pixels
        def blocky(src: Long): Array[Int] = Array.tabulate(256) { p =>
          (((src * 31 + (p % 16 / 8) * 7 + (p / 16 / 8) * 13) % 128) * 2).toInt
        }
        val base = Multimodal.MediaRow(id, "image", PngCodec.encodeGray(px(id), 16, 16))
        val pngTwin =
          if (id % 9 == 0) Seq(Multimodal.MediaRow(id + 2000000L, "image",
            PngCodec.encodeGray(px(id), 16, 16, filterType = 1, level = 9)))
          else Seq.empty
        // cross-FORMAT twins: identical pixels once as PNG, once as real
        // baseline JPEG — byte-unrelated containers, one perceptual group
        val crossFormat =
          if (id % 21 == 0)
            Seq(Multimodal.MediaRow(id + 6000000L, "image",
                PngCodec.encodeGray(blocky(id), 16, 16)),
              Multimodal.MediaRow(id + 7000000L, "image",
                JpegCodec.encodeGray(blocky(id), 16, 16)))
          else Seq.empty
        base +: (pngTwin ++ crossFormat)
      }
      Multimodal.phashDupGroups(media)
    }),
    // Hamming-radius perceptual NEAR pairs (probe construction, radius ≤2),
    // oracle-bound on a deterministic SAMPLE (every 7th doc) so the DuckDB
    // brute-force pair definition stays tractable: every 13th sampled doc
    // gets a twin with ONE pixel bumped and a different PNG filter — close
    // in hash space but byte- and (usually) hash-different. The oracle
    // computes aHashes from the pixel definition and brute-forces all
    // sampled pairs at Hamming ≤ 2; the operator must find exactly those
    // via the probe join over real decoded PNGs.
    "mm_phash_near" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{JpegCodec, Multimodal, PngCodec}
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 7 == 0)
      val media = ids.flatMap { id =>
        def px(src: Long, bump: Int): Array[Int] =
          Array.tabulate(256) { p =>
            ((src * 31 + (p % 16) * 7 + (p / 16) * 13 +
              (if (p == 0) bump else 0)) % 256).toInt
          }
        // the provably-exact JPEG pixel class (see mm_phash_dedup)
        def blocky(src: Long): Array[Int] = Array.tabulate(256) { p =>
          (((src * 31 + (p % 16 / 8) * 7 + (p / 16 / 8) * 13) % 128) * 2).toInt
        }
        val base = Multimodal.MediaRow(id, "image", PngCodec.encodeGray(px(id, 0), 16, 16))
        val bumped =
          if (id % 13 == 0) Seq(Multimodal.MediaRow(id + 3000000L, "image",
            PngCodec.encodeGray(px(id, 6), 16, 16, filterType = 1)))
          else Seq.empty
        // cross-format Hamming-0 pair: identical pixels as PNG and as JPEG
        val crossFormat =
          if (id % 77 == 0)
            Seq(Multimodal.MediaRow(id + 6000000L, "image",
                PngCodec.encodeGray(blocky(id), 16, 16)),
              Multimodal.MediaRow(id + 7000000L, "image",
                JpegCodec.encodeGray(blocky(id), 16, 16)))
          else Seq.empty
        base +: (bumped ++ crossFormat)
      }
      Multimodal.phashNearPairs(media)
    }),
    // The perceptual ingest DECISION oracle-bound (the doc_incr_dedup_ingest
    // pattern applied to the image gate): residents = every 23rd doc's
    // deterministic 16×16 PNG; the offer batch plants verbatim re-encodes
    // (new filter bytes, same pixels → near_dup at Hamming 0), within-batch
    // identical twins (min-id survives, the other is batch_dup), one-pixel
    // near twins, fresh images and garbage payloads. DuckDB replays the
    // whole four-tier decision (decodability → batch min-id groups → probe
    // Hamming ≤ 2 vs residents → ingested) from the pixel definitions and
    // the verdict column hashes at both SFs.
    "mm_phash_ingest" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{Multimodal, PhashIndex, PngCodec}
      def pxA(src: Long, bump: Int): Array[Int] = Array.tabulate(256) { p =>
        ((src * 31 + (p % 16) * 7 + (p / 16) * 13 +
          (if (p == 0) bump else 0)) % 256).toInt
      }
      def pxB(src: Long): Array[Int] = Array.tabulate(256) { p =>
        ((src * 41 + (p % 16) * 9 + (p / 16) * 5 + 1) % 256).toInt
      }
      def pxC(src: Long): Array[Int] = Array.tabulate(256) { p =>
        ((src * 57 + (p % 16) * 11 + (p / 16) * 17 + 3) % 256).toInt
      }
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 23 == 0)
      val dir = cachedArtifact("phashgate", d) { p =>
        PhashIndex.build(s, ids.map(id =>
          Multimodal.MediaRow(id, "image", PngCodec.encodeGray(pxA(id, 0), 16, 16))), p)
      }
      val batch = ids.flatMap { id =>
        def img(off: Long, px: Array[Int], filterType: Int = 0) =
          Multimodal.MediaRow(id + off, "image",
            PngCodec.encodeGray(px, 16, 16, filterType = filterType))
        val reEnc = if (id % 46 == 0) Seq(img(4000000L, pxA(id, 0), filterType = 1)) else Seq.empty
        val twins = if (id % 92 == 0) Seq(img(5000000L, pxB(id)), img(6000000L, pxB(id))) else Seq.empty
        val near = if (id % 69 == 0) Seq(img(7000000L, pxA(id, 6))) else Seq.empty
        val garbage = if (id % 115 == 0)
          Seq(Multimodal.MediaRow(id + 9000000L, "image", s"junk$id".getBytes)) else Seq.empty
        (reEnc ++ twins ++ near) ++ Seq(img(8000000L, pxC(id))) ++ garbage
      }
      PhashIndex.dedupIngest(s, dir, batch)
    }),
    // Perceptual AUDIO near-dup (Haitsma–Kalker sign hash over lag-comb
    // band energies, integer-exact): every 11th doc renders to a REAL
    // PCM16 WAV from a deterministic sample definition; every 33rd gets a
    // re-encoded twin (stereo-duplicated channels + an extra LIST chunk —
    // byte-different container, identical signal → Hamming 0), every 44th
    // a one-sample-bumped near twin. The oracle recomputes fingerprints
    // from the sample definition and brute-forces Hamming ≤ 2; the
    // operator must find exactly those pairs via the probe join over real
    // decoded containers.
    "mm_audio_near" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{Multimodal, WavCodec}
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 11 == 0)
      val media = ids.flatMap { id =>
        // the near twin dips TWO adjacent samples: a uniform one-sample
        // shift cancels in the lag-comb differences (hamming 0), the
        // pairwise dip flips a couple of frame-8 sign bits
        def samples(bumpAt: Int): Array[Int] = Array.tabulate(576) { i =>
          val dip = if (bumpAt >= 0 && (i == bumpAt || i == bumpAt + 1)) 1L else 0L
          (((id * 37L + i.toLong * 11L - dip) % 4096L) - 2048L).toInt
        }
        val base = Multimodal.MediaRow(id, "audio",
          WavCodec.encodePcm16(samples(-1), 8000, 1))
        val reEnc =
          if (id % 33 == 0) Seq(Multimodal.MediaRow(id + 4000000L, "audio",
            WavCodec.encodePcm16(samples(-1).flatMap(v => Array(v, v)), 8000, 2,
              extraChunk = true)))
          else Seq.empty
        val bumped =
          if (id % 44 == 0) Seq(Multimodal.MediaRow(id + 5000000L, "audio",
            WavCodec.encodePcm16(samples(570), 8000, 1)))
          else Seq.empty
        base +: (reEnc ++ bumped)
      }
      Multimodal.audioNearPairs(media)
    }),
    // Perceptual VIDEO near-dup (Haitsma–Kalker sign hash over the
    // spatio-temporal block-luminance grid, integer-exact): every 17th doc
    // renders to a REAL uncompressed-DIB AVI (12×12 × 18 frames) from a
    // deterministic pixel definition; every 51st gets a re-containered
    // twin (8-bit palettized, top-down rows, junk chunk — byte-different
    // container, identical frames → Hamming 0), every 68th a twin with one
    // spatial cell of the last time segment perturbed. The oracle
    // recomputes fingerprints from the pixel definition and brute-forces
    // Hamming ≤ 2; the operator must find exactly those pairs via the
    // probe join over real decoded containers.
    "mm_video_near" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{AviCodec, Multimodal}
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 17 == 0)
      val media = ids.flatMap { id =>
        def frames(bump: Int): Array[Array[Int]] = Array.tabulate(18) { f =>
          Array.tabulate(144) { p =>
            val x = p % 12; val y = p / 12
            val b = if (bump != 0 && f >= 16 && x >= 4 && x < 8 && y >= 4 && y < 8) bump else 0
            ((id * 31L + f.toLong * f * 7L + x * 5L + y * 3L + b) % 256L).toInt
          }
        }
        val base = Multimodal.MediaRow(id, "video",
          AviCodec.encodeGray(frames(0), 12, 12))
        val reEnc =
          if (id % 51 == 0) Seq(Multimodal.MediaRow(id + 8000000L, "video",
            AviCodec.encodeGray(frames(0), 12, 12, bits = 8, topDown = true,
              extraChunk = true)))
          else Seq.empty
        val bumped =
          if (id % 68 == 0) Seq(Multimodal.MediaRow(id + 9000000L, "video",
            AviCodec.encodeGray(frames(101), 12, 12)))
          else Seq.empty
        base +: (reEnc ++ bumped)
      }
      Multimodal.videoNearPairs(media)
    }),
    // Shot-boundary detection over REAL decoded AVIs: every 31st doc
    // renders an 18-frame video; every 62nd plants HARD CUTS at frames 6
    // and 12 (the pixel definition switches per segment), the rest are
    // single-scene. Segmentation is row-local inside the decode pass
    // (map-only); the oracle replays per-frame aHashes from the pixel
    // definitions, thresholds consecutive-frame Hamming, and rebuilds the
    // shot spans with a running cut count.
    "mm_video_shots" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{AviCodec, Multimodal}
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 31 == 0)
      val media = ids.map { id =>
        val cuts = id % 62 == 0
        // within a scene: a wrap-free base + tiny per-frame drift (a global
        // shift the mean-relative hash ignores); at a cut the GRADIENT
        // DIRECTION flips — spatial structure changes, which is what a
        // perceptual hash keys on (a pure brightness jump would not)
        val frames = Array.tabulate(18) { f =>
          val seg = if (!cuts) 0 else if (f < 6) 0 else if (f < 12) 1 else 2
          Array.tabulate(144) { p =>
            val x = p % 12; val y = p / 12
            val grad = seg match {
              case 0 => x * 5 + y * 3
              case 1 => (11 - x) * 5 + y * 3
              case _ => x * 5 + (11 - y) * 3
            }
            (((id * 31L + seg * 97L) % 128L) + (f % 8) + grad).toInt
          }
        }
        Multimodal.MediaRow(id, "video", AviCodec.encodeGray(frames, 12, 12))
      }
      Multimodal.videoShots(media).toDF()
        .orderBy(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("shot_no"))
    }),
    // Cross-MODAL still search: every 41st doc is an image (12×12 PNG of a
    // per-src pixel pattern); every 82nd doc ALSO renders a video whose
    // MIDDLE shot shows exactly that image as a still (flanked by two
    // gradient scenes — the cuts segment it), so the shot-2 keyframe
    // collides with the image at Hamming 0. The operator must find exactly
    // the (image, video, shot) matches through one probe join over real
    // decoded PNGs and AVIs; the oracle replays image hashes, per-frame
    // video hashes, the cut segmentation, and the cross-modality pairs.
    "mm_still_pairs" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{AviCodec, Multimodal, PngCodec}
      def pImg(src: Long): Array[Int] = Array.tabulate(144) { p =>
        ((src * 31 + (p % 12) * 7 + (p / 12) * 13) % 256).toInt
      }
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 41 == 0)
      val media = ids.flatMap { id =>
        val img = Multimodal.MediaRow(id, "image", PngCodec.encodeGray(pImg(id), 12, 12))
        val vid = if (id % 82 == 0) {
          val frames = Array.tabulate(18) { f =>
            if (f >= 6 && f < 12) pImg(id)
            else Array.tabulate(144) { p =>
              val x = p % 12; val y = p / 12
              if (f < 6) (((id * 47 + 13) % 128) + (11 - x) * 5 + y * 3 + f % 4).toInt
              else (((id * 71 + 29) % 128) + x * 5 + (11 - y) * 3 + f % 4).toInt
            }
          }
          Seq(Multimodal.MediaRow(id + 2000000L, "video",
            AviCodec.encodeGray(frames, 12, 12)))
        } else Seq.empty
        img +: vid
      }
      Multimodal.videoStillOfImagePairs(media)
    }),
    // The AUDIO gate's ingest decision oracle-bound — completing the
    // verdict-level oracle family across every gate engine and modality
    // (text LshIndex, image/audio/video Hash64Index, vector IvfIndex):
    // re-mastered residents (stereo-duplicated + extra LIST chunk) die at
    // Hamming 0, within-batch identical signals keep min-id, two-sample
    // dips land within the probe radius, garbage is undecodable.
    "mm_audio_ingest" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{AudioHashIndex, Multimodal, WavCodec}
      def sm(src: Long, kind: Int): Array[Int] = Array.tabulate(576) { i =>
        val v = kind match {
          case 0 => (src * 37L + i.toLong * 11L) % 4096L
          case 2 => (src * 53L + i.toLong * 7L + 3L) % 4096L
          case 3 =>
            val dip = if (i == 570 || i == 571) 1L else 0L
            (src * 37L + i.toLong * 11L - dip) % 4096L
          case _ => (src * 61L + i.toLong * 13L + 5L) % 4096L
        }
        (v - 2048L).toInt
      }
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 13 == 0)
      val dir = cachedArtifact("audgate", d) { p =>
        AudioHashIndex.build(s, ids.map(id =>
          Multimodal.MediaRow(id, "audio", WavCodec.encodePcm16(sm(id, 0), 8000, 1))), p)
      }
      val batch = ids.flatMap { id =>
        def wav(off: Long, kind: Int, reMaster: Boolean = false) =
          Multimodal.MediaRow(id + off, "audio",
            if (reMaster) WavCodec.encodePcm16(sm(id, kind).flatMap(v => Array(v, v)),
              8000, 2, extraChunk = true)
            else WavCodec.encodePcm16(sm(id, kind), 8000, 1))
        val reEnc = if (id % 26 == 0) Seq(wav(4000000L, 0, reMaster = true)) else Seq.empty
        val twins = if (id % 52 == 0) Seq(wav(5000000L, 2), wav(6000000L, 2)) else Seq.empty
        val dipped = if (id % 39 == 0) Seq(wav(7000000L, 3)) else Seq.empty
        val garbage = if (id % 65 == 0)
          Seq(Multimodal.MediaRow(id + 9000000L, "audio", s"noaud$id".getBytes)) else Seq.empty
        (reEnc ++ twins ++ dipped) ++ Seq(wav(8000000L, 4)) ++ garbage
      }
      AudioHashIndex.dedupIngest(s, dir, batch)
    }),
    // The VIDEO gate's ingest decision oracle-bound (mm_phash_ingest's
    // sibling through the shared Hash64Index engine, with the video
    // fingerprint): residents = every 19th doc's deterministic AVI; the
    // batch plants re-containered residents (8-bit top-down + junk chunk →
    // Hamming 0), within-batch identical twins, segment-8 bumped twins
    // (the bit-dependency structure bounds them at Hamming ≤ 2 — ALWAYS
    // within the probe radius), fresh clips and garbage. DuckDB replays
    // the four-tier decision from the frame-pixel definitions.
    "mm_video_ingest" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{AviCodec, Multimodal, VideoHashIndex}
      def frames(src: Long, kind: Int): Array[Array[Int]] = Array.tabulate(18) { f =>
        Array.tabulate(144) { p =>
          val x = p % 12; val y = p / 12
          val v = kind match {
            case 0 => src * 31L + f.toLong * f * 7L + x * 5L + y * 3L
            case 2 => src * 43L + f * 11L + x * 7L + y * 5L + 2L
            case 3 => src * 31L + f.toLong * f * 7L + x * 5L + y * 3L +
              (if (f >= 16 && x >= 4 && x < 8 && y >= 4 && y < 8) 101L else 0L)
            case _ => src * 57L + f * 13L + x * 9L + y * 7L + 5L
          }
          (v % 256L).toInt
        }
      }
      val ids = Tables.documents(s, d)
        .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
        .filter((id: Long) => id % 19 == 0)
      val dir = cachedArtifact("vidgate", d) { p =>
        VideoHashIndex.build(s, ids.map(id =>
          Multimodal.MediaRow(id, "video", AviCodec.encodeGray(frames(id, 0), 12, 12))), p)
      }
      val batch = ids.flatMap { id =>
        def clip(off: Long, kind: Int, reContainer: Boolean = false) =
          Multimodal.MediaRow(id + off, "video",
            AviCodec.encodeGray(frames(id, kind), 12, 12,
              bits = if (reContainer) 8 else 24, topDown = reContainer,
              extraChunk = reContainer))
        val reEnc = if (id % 38 == 0) Seq(clip(4000000L, 0, reContainer = true)) else Seq.empty
        val twins = if (id % 76 == 0) Seq(clip(5000000L, 2), clip(6000000L, 2)) else Seq.empty
        val bumped = if (id % 57 == 0) Seq(clip(7000000L, 3)) else Seq.empty
        val garbage = if (id % 95 == 0)
          Seq(Multimodal.MediaRow(id + 9000000L, "video", s"novid$id".getBytes)) else Seq.empty
        (reEnc ++ twins ++ bumped) ++ Seq(clip(8000000L, 4)) ++ garbage
      }
      VideoHashIndex.dedupIngest(s, dir, batch)
    }),
    "vec_index_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
        .select("embedding").head.getSeq[Float](0)
      graft.vector.VectorIndex.search(graft.vector.VectorIndex.fromEmbeddings(emb), qv)
    }),
    // The FLAT daily index (the reference-parity serving store) with point
    // deletes, same artifact pattern as vec_delete_search on the IVF side:
    // the persisted layout gets every 41st vec_id tombstoned at build time;
    // serving (retention window + kNN) must then equal brute force over the
    // retained corpus MINUS the deleted ids — the takedown/GDPR contract.
    "vec_flat_delete_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("flatdel", d) { p =>
        graft.vector.VectorIndex.append(graft.vector.VectorIndex.fromEmbeddings(emb), p)
        graft.vector.VectorIndex.delete(s, p,
          emb.filter(col("vec_id") % 41 === 0).select("vec_id"))
      }
      val qv = emb.filter(col("vec_id") === 3L).select("embedding").head.getSeq[Float](0)
      val asOf = graft.vector.VectorIndex.maxIngestDate(s, dir).get
      graft.vector.VectorIndex.search(
        graft.vector.VectorIndex.loadRecent(s, dir, asOf), qv)
    }),
    // Serve-ladder BUILD, timed as its own entry (the vec_pq_build
    // precedent): a FRESH flat layout + sidecar build per kind per call —
    // the honest one-time reorganization cost — installed into the
    // artifact cache so the four vec_serve_*search entries below measure
    // the AMORTIZED serve path (Bench runs queries name-sorted, and
    // "vec_serve_build" < "vec_serve_opq_search"). The returned summary is
    // the cross-engine-expressible slice of each layout: row counts plus
    // total code bytes (m=8 PQ codes for ivfpq/opq, d SQ8 codes for sq,
    // none for ivf) over the retained window; the builds' CONTENT is
    // verified by the search twins, which read exclusively from these
    // layouts against brute-force oracles.
    "vec_serve_build" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      // The four kind-builds are independent job chains over separate
      // temp roots — run them on concurrent driver threads (Spark's
      // scheduler interleaves their stages across the executor pool; the
      // standard multi-tenant submission shape). Builds don't touch
      // session confs, so plain Futures are safe; summaries assemble
      // after the barrier.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val dirs = try Await.result(Future.sequence(
        Seq("ivf" -> "flatserve", "ivfpq" -> "flatservepq",
            "sq" -> "flatservesq", "opq" -> "flatserveopq").map { case (kind, key) =>
          Future {
            val dir = java.nio.file.Files
              .createTempDirectory(s"graft-q-serve-$kind").toString + "/idx"
            graft.vector.VectorIndex.append(
              graft.vector.VectorIndex.fromEmbeddings(Tables.embeddings(s, d)), dir)
            graft.vector.ServeIndex.build(s, dir, kind, nCells = 8)
            artifactCache.putIfAbsent(s"$key|$d", dir)
            kind -> dir
          }
        }), Duration.Inf)
      finally pool.shutdown()
      dirs.map { case (kind, dir) =>
        val vecs = s.read.parquet(
          graft.vector.ServeIndex.sidecarPath(dir) + "/vectors")
        val nCodes =
          if (kind == "ivf") sum(lit(0L)) // the ivf layout carries no codes column
          else sum(org.apache.spark.sql.functions.size(col("codes")).cast("long"))
        vecs.agg(count(lit(1)).as("n_vectors"),
            countDistinct(col("vec_id")).as("n_distinct_ids"),
            nCodes.as("n_codes"))
          .select(lit(kind).as("kind"), col("n_vectors"),
            col("n_distinct_ids"), col("n_codes"))
      }.reduce(_ unionByName _).orderBy(col("kind"))
    }),
    // The ANN serving sidecar over the flat daily index, probe-all (the
    // provably-exact configuration): sealed days answer via the IVF cell
    // layout, the hot watermark day brute-forces from the flat source of
    // truth, and the union must equal brute force over the whole retained
    // window — the same oracle shape as vec_index_search. The budgeted
    // configs and the fallback ladder are GraftApiSpec-pinned. Served from
    // the artifact cache (vec_serve_build installs it), so BENCH measures
    // the amortized serve path, not build+serve.
    "vec_serve_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("flatserve", d) { p =>
        graft.vector.VectorIndex.append(graft.vector.VectorIndex.fromEmbeddings(emb), p)
        graft.vector.ServeIndex.build(s, p, "ivf", nCells = 8)
      }
      val qv = emb.filter(col("vec_id") === 5L).select("embedding").head.getSeq[Float](0)
      graft.vector.ServeIndex.search(s, dir, "ivf", qv, k = 10, nProbe = 8)
        .getOrElse(sys.error("serve sidecar must answer the probe-all config"))
    }),
    // The IVF-PQ serve sidecar in the provably-exact configuration
    // (probe all cells, refine budget covering the sealed window): ADC
    // candidates from the codes column, exact re-rank, hot-day brute arm —
    // must equal brute force over the retained window, same oracle shape.
    "vec_serve_pq_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("flatservepq", d) { p =>
        graft.vector.VectorIndex.append(graft.vector.VectorIndex.fromEmbeddings(emb), p)
        graft.vector.ServeIndex.build(s, p, "ivfpq", nCells = 8)
      }
      val qv = emb.filter(col("vec_id") === 7L).select("embedding").head.getSeq[Float](0)
      val rf = ((emb.count() + 9) / 10).toInt
      graft.vector.ServeIndex.search(s, dir, "ivfpq", qv, k = 10, nProbe = 8,
          refineFactor = rf)
        .getOrElse(sys.error("serve sidecar must answer the probe-all config"))
    }),
    // The IVF-SQ8 serve sidecar in the provably-exact configuration
    // (probe all cells, refine budget covering the sealed window):
    // scalar-dequantized ADC candidates from the tinyint codes column,
    // exact float re-rank, hot-day brute arm — must equal brute force
    // over the retained window, completing the serve ladder
    // flat | ivf | ivfpq | sq.
    "vec_serve_sq_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("flatservesq", d) { p =>
        graft.vector.VectorIndex.append(graft.vector.VectorIndex.fromEmbeddings(emb), p)
        graft.vector.ServeIndex.build(s, p, "sq", nCells = 8)
      }
      val qv = emb.filter(col("vec_id") === 9L).select("embedding").head.getSeq[Float](0)
      val rf = ((emb.count() + 9) / 10).toInt
      graft.vector.ServeIndex.search(s, dir, "sq", qv, k = 10, nProbe = 8,
          refineFactor = rf)
        .getOrElse(sys.error("serve sidecar must answer the probe-all config"))
    }),
    // The OPQ serve sidecar (PCA-rotated residual PQ — FAISS
    // "PCAMatrix,IVF,PQ" posture) in the provably-exact configuration:
    // cells, residuals and ADC codes live in the decorrelated ROTATED
    // space, the stored embeddings and the exact re-rank stay original —
    // so probe-all + window-covering refine must equal brute force over
    // the retained window, independent of what the rotation did to the
    // candidate tier. Completes the serve ladder
    // flat | ivf | ivfpq | sq | opq.
    "vec_serve_opq_search" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = cachedArtifact("flatserveopq", d) { p =>
        graft.vector.VectorIndex.append(graft.vector.VectorIndex.fromEmbeddings(emb), p)
        graft.vector.ServeIndex.build(s, p, "opq", nCells = 8)
      }
      val qv = emb.filter(col("vec_id") === 11L).select("embedding").head.getSeq[Float](0)
      val rf = ((emb.count() + 9) / 10).toInt
      graft.vector.ServeIndex.search(s, dir, "opq", qv, k = 10, nProbe = 8,
          refineFactor = rf)
        .getOrElse(sys.error("serve sidecar must answer the probe-all config"))
    }),
  )

  // ---- CRM tool-equivalents (the reference's 9-tool surface, SURVEY §3) ----
  private val crmQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crm_active_companies" -> ((s, d) => graft.crm.CrmOps.activeCompanies(s, d)),
    "crm_active_contacts" -> ((s, d) => graft.crm.CrmOps.activeContacts(s, d)),
    "crm_tickets_default" -> ((s, d) => graft.crm.CrmOps.ticketsDefault(s, d)),
    "crm_tickets_closed" -> ((s, d) => graft.crm.CrmOps.ticketsClosed(s, d)),
    "crm_recent_conversations" -> ((s, d) => graft.crm.CrmOps.recentConversations(s, d)),
    "crm_company_activity" -> ((s, d) => graft.crm.CrmOps.companyActivity(s, d)),
    "crm_create_contacts" -> ((s, d) => graft.crm.CrmOps.createContactsDedup(s, d)),
    "crm_ticket_threads" -> ((s, d) => graft.crm.CrmOps.ticketConversationThreads(s, d)),
    "crm_create_companies" -> ((s, d) => graft.crm.CrmOps.createCompaniesDedup(s, d)),
    "crm_recent_emails" -> ((s, d) => graft.crm.CrmOps.recentEmails(s, d)),
  )

  // DuckDB-side macros mirroring graft.functions.VectorFunctions exactly
  // (sequential float64 folds — verified bitwise-identical to Spark's
  // aggregate/zip_with HOFs).
  private def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]*x[2]))"

  // MinHash-LSH candidate generation + exact-Jaccard verify (DuckDB side of
  // graft.ops.Dedup.minhashDupPairs) — shared by the pairs, clusters, and
  // clean-corpus oracles so all three see the identical candidate set.
  private val minhashCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) AS shingle FROM w)),
      |mh AS (SELECT doc_id, h, min(substr(md5((h // 4) || '|' || shingle), (h % 4) * 8 + 1, 8)) AS mh
      |       FROM sh CROSS JOIN range(0, 12) t(h) GROUP BY doc_id, h),
      |bands AS (SELECT doc_id, h // 3 AS band_id, md5(string_agg(mh, '|' ORDER BY h)) AS band_key
      |          FROM mh GROUP BY doc_id, h // 3),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
      |         FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.doc_a, c.doc_b, c.n_shared_bands, COUNT(*) AS n_inter
      |          FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
      |          JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
      |          GROUP BY 1, 2, 3)""".stripMargin
  private val minhashScored =
    """SELECT i.doc_a, i.doc_b, i.n_shared_bands,
      |    CAST(i.n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i.n_inter AS DOUBLE) AS jaccard
      |  FROM inter i JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b""".stripMargin

  // Shared CRM-view CTE bodies (DuckDB side of graft.crm.CrmViews).
  private val companiesCte =
    """companies AS (
      |  SELECT s_suppkey, CAST(s_suppkey AS VARCHAR) AS id, s_name AS name, n_name AS industry,
      |    lower(replace(s_name, '#', '')) || '.com' AS domain,
      |    lm.last_ship AS hs_lastmodifieddate
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN (SELECT l_suppkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY l_suppkey) lm
      |    ON lm.l_suppkey = s_suppkey)""".stripMargin
  private val contactsCte =
    """contacts AS (
      |  SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS id,
      |    substr(c_name, 1, 8) AS firstname, substr(c_name, 10, 9) AS lastname,
      |    substr(c_name, 10, 9) || '@' || lower(c_mktsegment) || '.example.com' AS email,
      |    '+' || c_nationkey || '-' || c_custkey AS phone,
      |    coalesce(lo.last_order, TIMESTAMP '1995-01-01') AS hs_lastmodifieddate
      |  FROM customer LEFT JOIN (SELECT o_custkey, max(o_orderdate) AS last_order FROM orders GROUP BY o_custkey) lo
      |    ON lo.o_custkey = c_custkey)""".stripMargin
  private val ticketsCte =
    """tickets AS (
      |  SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS id,
      |    'Order ' || o_orderkey AS subject,
      |    o_orderpriority AS hs_ticket_priority,
      |    CASE o_orderstatus WHEN 'F' THEN '4' WHEN 'P' THEN '2' ELSE '1' END AS hs_pipeline_stage,
      |    CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS hs_ticket_status,
      |    o_orderdate AS createdate,
      |    CASE WHEN o_orderstatus = 'F' THEN o_orderdate + INTERVAL 30 DAY END AS closedate,
      |    o_orderdate + INTERVAL 15 DAY AS hs_lastmodifieddate
      |  FROM orders)""".stripMargin
  private val messagesCte =
    """messages AS (
      |  SELECT l_orderkey AS thread_id,
      |    l_orderkey * 10 + l_linenumber AS message_id,
      |    CASE WHEN l_returnflag = 'N' THEN 'MESSAGE' WHEN l_returnflag = 'R' THEN 'SYSTEM_NOTICE' ELSE 'COMMENT' END AS msg_type,
      |    l_shipdate AS created_at,
      |    'part ' || l_partkey || ' qty ' || CAST(l_quantity AS INT) AS text,
      |    repeat('part ' || l_partkey || ' qty ' || CAST(l_quantity AS INT), 30) AS rich_text,
      |    CASE WHEN l_linestatus = 'F' THEN '0-1-' || l_suppkey ELSE '3-' || l_suppkey END AS actor_id,
      |    CASE WHEN l_linenumber % 3 = 0 THEN 'TO' ELSE 'FROM' END AS sender_field,
      |    l_linenumber
      |  FROM lineitem)""".stripMargin
  private val engagementsCte =
    """engagements AS (
      |  SELECT event_id AS engagement_id,
      |    CASE event_type WHEN 'view' THEN 'NOTE' WHEN 'click' THEN 'TASK'
      |      WHEN 'purchase' THEN 'MEETING' WHEN 'error' THEN 'CALL' ELSE 'EMAIL' END AS etype,
      |    ts, value, user_id, props,
      |    user_id % (SELECT count(*) FROM supplier) + 1 AS company_key
      |  FROM events)""".stripMargin
  private val fmtTs = "'%Y-%m-%d %H:%M:%S'"

  private val crmOracle: Map[String, String] = Map(
    "crm_active_companies" ->
      s"""WITH $companiesCte
        |SELECT id, name, industry, domain,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM companies ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, s_suppkey LIMIT 10""".stripMargin,
    "crm_active_contacts" ->
      s"""WITH $contactsCte
        |SELECT id, firstname, lastname, email, phone,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS lastmodifieddate
        |FROM contacts ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, c_custkey LIMIT 10""".stripMargin,
    "crm_tickets_default" ->
      s"""WITH $ticketsCte,
        |cut AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS cutoff FROM orders)
        |SELECT id, subject, hs_ticket_priority, hs_pipeline_stage, hs_ticket_status,
        |  strftime(createdate, $fmtTs) AS createdate,
        |  strftime(closedate, $fmtTs) AS closedate,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM tickets, cut
        |WHERE closedate > cutoff OR hs_lastmodifieddate > cutoff
        |ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 50""".stripMargin,
    "crm_tickets_closed" ->
      s"""WITH $ticketsCte
        |SELECT id, subject, hs_pipeline_stage, hs_ticket_status,
        |  strftime(closedate, $fmtTs) AS closedate,
        |  strftime(hs_lastmodifieddate, $fmtTs) AS hs_lastmodifieddate
        |FROM tickets
        |WHERE hs_pipeline_stage = '4' OR hs_ticket_status = 'closed'
        |ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 50""".stripMargin,
    "crm_recent_conversations" ->
      s"""WITH $messagesCte,
        |threads AS (SELECT o_orderkey AS thread_id, o_orderdate AS thread_created_at
        |            FROM orders ORDER BY o_orderkey DESC LIMIT 10),
        |m AS (SELECT *,
        |    CASE WHEN l_linenumber = 7 THEN 'UNKNOWN'
        |         WHEN sender_field = 'FROM' AND (actor_id LIKE '0-1%' OR actor_id LIKE '0-2%') THEN 'AGENT'
        |         ELSE 'CUSTOMER' END AS sender_type,
        |    substr(rich_text, 1, 200) AS truncated
        |  FROM messages WHERE msg_type = 'MESSAGE'),
        |fm AS (SELECT thread_id, truncated AS first_msg_truncated FROM (
        |    SELECT thread_id, truncated,
        |      row_number() OVER (PARTITION BY thread_id ORDER BY created_at, message_id) AS rn FROM m)
        |  WHERE rn = 1),
        |agg AS (SELECT t.thread_id, t.thread_created_at,
        |    COUNT(m.message_id) AS n_messages,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'AGENT' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_agent,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'CUSTOMER' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_customer,
        |    CAST(COALESCE(SUM(CASE WHEN m.sender_type = 'UNKNOWN' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unknown,
        |    MIN(m.created_at) AS first_ts, MAX(m.created_at) AS last_ts
        |  FROM threads t LEFT JOIN m ON m.thread_id = t.thread_id
        |  GROUP BY t.thread_id, t.thread_created_at)
        |SELECT a.thread_id, strftime(a.thread_created_at, $fmtTs) AS thread_created_at,
        |  n_messages, n_agent, n_customer, n_unknown,
        |  strftime(first_ts, $fmtTs) AS first_ts, strftime(last_ts, $fmtTs) AS last_ts,
        |  fm.first_msg_truncated
        |FROM agg a LEFT JOIN fm ON fm.thread_id = a.thread_id
        |ORDER BY a.thread_id DESC""".stripMargin,
    "crm_company_activity" ->
      s"""WITH $engagementsCte, $companiesCte,
        |e AS (SELECT *, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS vstr FROM engagements),
        |c2 AS (SELECT *, CASE etype
        |    WHEN 'NOTE' THEN 'note: k=' || json_extract_string(props, '$$.k')
        |    WHEN 'TASK' THEN 'task status ' || CASE WHEN value > 10 THEN 'DONE' ELSE 'PENDING' END
        |    WHEN 'MEETING' THEN 'meeting value ' || vstr
        |    WHEN 'CALL' THEN 'call ms ' || CAST(CAST(value AS DECIMAL(18,2)) * 1000 AS VARCHAR)
        |    ELSE 'email subject signup#' || engagement_id END AS content
        |  FROM e),
        |capped AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY company_key ORDER BY ts, engagement_id) AS rn
        |    FROM c2) WHERE rn <= 500)
        |SELECT company_key, name AS company_name, engagement_id, etype, content,
        |  strftime(ts, $fmtTs) AS ts
        |FROM capped JOIN companies ON company_key = s_suppkey
        |ORDER BY company_key, engagement_id""".stripMargin,
    "crm_create_contacts" ->
      s"""WITH $contactsCte,
        |cand AS (SELECT 'Customer' AS firstname,
        |    lpad(CAST(s_suppkey * 17 AS VARCHAR), 9, '0') AS lastname,
        |    s_suppkey AS cand_key FROM supplier)
        |SELECT cand_key, cand.firstname, cand.lastname,
        |  CASE WHEN ex.ex_lastname IS NOT NULL THEN 'exists' ELSE 'insert' END AS action
        |FROM cand LEFT JOIN (SELECT firstname AS ex_firstname, lastname AS ex_lastname FROM contacts) ex
        |  ON cand.firstname = ex.ex_firstname AND cand.lastname = ex.ex_lastname
        |ORDER BY cand_key""".stripMargin,
    "crm_ticket_threads" ->
      s"""WITH $ticketsCte, $messagesCte,
        |sel AS (SELECT o_orderkey AS ticket_key, id AS ticket_id, createdate
        |  FROM tickets
        |  WHERE hs_pipeline_stage = '4' OR hs_ticket_status = 'closed'
        |  ORDER BY strftime(hs_lastmodifieddate, $fmtTs) DESC, o_orderkey LIMIT 20),
        |selc AS (SELECT sel.*, o.o_custkey FROM sel JOIN orders o ON o.o_orderkey = sel.ticket_key),
        |edges AS (SELECT ticket_key, ticket_id, thread_id FROM (
        |    SELECT s.ticket_key, s.ticket_id, o.o_orderkey AS thread_id,
        |      row_number() OVER (PARTITION BY s.ticket_key
        |        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |    FROM selc s JOIN orders o ON o.o_custkey = s.o_custkey AND o.o_orderdate <= s.createdate)
        |  WHERE rn <= 3),
        |m AS (SELECT thread_id, message_id, created_at,
        |    CASE WHEN l_linenumber = 7 THEN 'UNKNOWN'
        |         WHEN sender_field = 'FROM' AND (actor_id LIKE '0-1%' OR actor_id LIKE '0-2%') THEN 'AGENT'
        |         ELSE 'CUSTOMER' END AS sender_type,
        |    text
        |  FROM messages WHERE msg_type = 'MESSAGE')
        |SELECT e.ticket_id, e.thread_id,
        |  COALESCE(m.message_id, -1) AS message_id,
        |  COALESCE(strftime(m.created_at, $fmtTs), '') AS created_at,
        |  COALESCE(m.sender_type, '') AS sender_type,
        |  COALESCE(m.text, '') AS text
        |FROM edges e LEFT JOIN m ON m.thread_id = e.thread_id
        |ORDER BY CAST(e.ticket_id AS BIGINT), e.thread_id, created_at, message_id""".stripMargin,
    "crm_create_companies" ->
      s"""WITH $companiesCte,
        |base AS (SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 100),
        |cand AS (
        |  SELECT s_suppkey AS cand_key, s_name AS name FROM base
        |  UNION ALL
        |  SELECT s_suppkey + 100000 AS cand_key, 'Startup#' || s_suppkey AS name FROM base)
        |SELECT cand_key, cand.name,
        |  CASE WHEN c.id IS NOT NULL THEN 'exists' ELSE 'insert' END AS action,
        |  COALESCE(c.id, '') AS existing_id
        |FROM cand LEFT JOIN companies c ON cand.name = c.name
        |ORDER BY cand_key""".stripMargin,
    "crm_recent_emails" ->
      s"""WITH eid AS (
        |  SELECT *, md5(l_orderkey || '|' || l_linenumber || '|' || l_suppkey || '|'
        |      || l_partkey || '|' || strftime(l_shipdate, $fmtTs)) AS email_id
        |  FROM lineitem),
        |email_ids AS (
        |  SELECT email_id, l_returnflag = 'A' AS archived, l_shipdate AS created_at FROM eid),
        |email_details AS (
        |  SELECT email_id,
        |    'Re: Order ' || l_orderkey AS subject,
        |    'supplier' || l_suppkey || '@corp.example.com' AS from_email,
        |    'buyer' || l_partkey || '@client.example.com' AS to_email,
        |    CASE WHEN l_linestatus = 'F' THEN 'shipped qty ' || CAST(l_quantity AS INT) END AS text,
        |    '<p>order ' || l_orderkey || ' line ' || l_linenumber || '</p>' AS html,
        |    l_shipdate + INTERVAL 3 DAY AS updated_at
        |  FROM eid)
        |SELECT i.email_id AS id, d.subject, d.from_email, d.to_email,
        |  COALESCE(d.text, d.html) AS body,
        |  strftime(i.created_at, $fmtTs) AS created_at,
        |  strftime(d.updated_at, $fmtTs) AS updated_at
        |FROM email_ids i JOIN email_details d ON d.email_id = i.email_id
        |WHERE NOT i.archived
        |ORDER BY strftime(i.created_at, $fmtTs) DESC, i.email_id LIMIT 50""".stripMargin,
  )

  def oracleSql: Map[String, String] = {
    val base = baseOracles
    // The layout-backed mining registrations run over the kmeansIters = 0
    // artifact, whose on-disk assignment IS the seed rule the two-table
    // oracles replay — so the indexed entries bind to the SAME SQL, making
    // "index-backed ≡ operator form" itself a driver-checked equality, not
    // just a spec assertion.
    base ++ crmOracle ++ Map(
      "vec_triplets_indexed" -> base("vec_triplets"),
      "vec_hard_negatives_indexed" -> base("vec_hard_negatives"),
      "vec_label_audit_indexed" -> base("vec_label_audit"))
  }

  private def baseOracles: Map[String, String] = Map(
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
    // cos then lowest bench_id, mirrored as row_number.
    "vec_decontam" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM n),
        |p AS (SELECT c.vec_id, b.vec_id AS bench_id,
        |    ${dotSql("c.e", "b.e")} / (c.nrm * b.nrm) AS cos
        |  FROM m c JOIN m b ON c.vec_id % 97 <> 0 AND b.vec_id % 97 = 0)
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
        |SELECT source, n, s_ab, s_aa, s_bb,
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
