package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data deduplication suite over the `documents` table — the scale
  * extension of the reference's dedup-before-insert anti-join (SURVEY.md
  * §2.4 J5, `clients/contact_client.py:100-150`), generalized to content
  * dedup the way a 100 TB corpus pipeline needs it.
  *
  * Scale notes: exact dedup is one hash-shuffle. MinHash/LSH replaces the
  * quadratic all-pairs comparison with a band-bucket equi-join whose shuffle
  * key is (band_id, band_key) — candidate generation is linear in corpus
  * size; only within-bucket pairs are scored. All hashing is md5-based so
  * any engine (and the DuckDB oracle) reproduces identical buckets.
  */
object Dedup {

  /** Default shingle width. The identical-text collapse in
    * [[minhashDupPairs]] keys its short-doc guard off this same constant:
    * a doc under `ShingleN` tokens produces no shingles, so `rawPairs`
    * can never emit it, and the collapse pre-filter must drop exactly the
    * same docs for the two plans to stay bit-for-bit equal.
    */
  val ShingleN = 3

  /** Distinct word n-gram shingles per doc (texts are single-space
    * tokenized; `split(' ')` is exact here). Seeds parallelism on the doc
    * stream first: every consumer (minhash signatures, band keys, the
    * exact-Jaccard verify, the persisted LSH index derivation) fans out
    * of this explode, and several checkpoint it — a single-split source
    * would otherwise serialize all of that into one task.
    */
  def shingles(docs: DataFrame, n: Int = ShingleN): DataFrame =
    Par.seed(docs, col("doc_id")).select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(w)-${n - 1}), i -> array_join(slice(w, i, $n), ' '))"))
          .as("shingle"))
      .distinct()

  /** Exact dedup: group by content hash, keep the lowest id (hash-groupBy —
    * one shuffle, no comparisons). Operates on the corpus as-is; test
    * fixtures that need duplicates inject them at the harness layer
    * (SparkEntry wires a deterministic re-ingest for the oracle query).
    */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("keep_id"))

  val NumHashes = 12
  val BandRows = 3 // 4 bands of 3 -> LSH threshold ~ (1/4)^(1/3) ~ 0.63

  /** MinHash signatures: hash `h` is an 8-hex-char (32-bit) slice of
    * md5((h/4) || '|' || shingle) — one md5 yields FOUR independent
    * min-wise hashes, so each shingle row pays 3 md5 evaluations instead of
    * 12 (md5 dominates signature cost; the slices of a cryptographic hash
    * are independent, and min over hex strings stays a valid min-wise
    * family — engine-portable, mirrored verbatim in the DuckDB oracle).
    * The salted md5s are projected ONCE per row before the aggregate so the
    * sharing is explicit, not left to subexpression elimination. Still ONE
    * wide aggregation: 12 min columns in a single groupBy, not a 12×
    * pre-shuffle explode.
    */
  def minhashWide(sh: DataFrame): DataFrame = {
    val nSalts = NumHashes / 4
    val withHashes = sh.select(
      col("doc_id") +: (0 until nSalts).map(s =>
        md5(concat(lit(s.toString), lit("|"), col("shingle"))).as(s"h$s")): _*)
    val aggs = (0 until NumHashes).map(h =>
      min(substring(col(s"h${h / 4}"), (h % 4) * 8 + 1, 8)).as(s"mh$h"))
    withHashes.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: md5 of the band's minhashes in h-order (one row per
    * (doc, band) via a post-aggregation explode — cheap: NumHashes/BandRows
    * rows per doc).
    */
  def bandKeys(sig: DataFrame): DataFrame = {
    val bandCols = (0 until NumHashes / BandRows).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*))
          .as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band_id").as("band_id"), col("bs.band_key").as("band_key"))
  }

  /** The LSH + exact-verify pair pipeline over a corpus as-given —
    * (doc_a, doc_b, n_shared_bands, jaccard), unordered. Shared by both
    * `minhashDupPairs` paths (direct, and over collapse representatives).
    */
  private def rawPairs(corpus: DataFrame, jaccardThreshold: Double): DataFrame = {
    // Materialized once: feeds the signature aggregation, doc sizes, and
    // both sides of the verify join (pruning defeats exchange reuse).
    val sh = shingles(corpus).localCheckpoint(true)
    val bands = bandKeys(minhashWide(sh)).localCheckpoint(true)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared_bands"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"), col("jaccard"))
  }

  /** MinHash+LSH near-dup detection, verified: band-bucket join produces
    * candidates, exact shingle-set Jaccard confirms. Output: confirmed
    * pairs with band support and Jaccard.
    *
    * Identical-text collapse (the simhash/phash/rplsh move): byte-identical
    * texts — the most common crawl duplicate — share every band key, so
    * the band join would pair each such group quadratically on its hottest
    * bucket AND re-verify each pair over full shingle sets. The whole
    * LSH + verify pipeline runs over ONE representative per distinct text;
    * identical-text pairs expand row-locally with the exact values the
    * per-member pipeline computes (all bands shared, jaccard 1.0 — n/n in
    * IEEE), and cross-text pairs expand from matched representatives,
    * whose md5-deterministic signatures/shingles are identical to every
    * member's — output bit-for-bit unchanged.
    *
    * NOT a lazy transformation: the adaptive route requires knowing whether
    * identical texts exist, so THIS CALL runs Spark jobs (the group-table
    * localCheckpoint + one emptiness probe) at plan-construction time —
    * same contract as the other checkpoint-backed pair generators
    * (`rpLshDupPairs`, `simhashDupPairs`). Callers that only want to
    * COMPOSE a plan without executing anything should reach for
    * `rawPairs`-shaped building blocks (`shingles`/`minhashWide`/
    * `bandKeys`), not this operator.
    */
  def minhashDupPairs(docs: DataFrame, jaccardThreshold: Double = 0.3): DataFrame = {
    val nBands = NumHashes / BandRows
    // the group row carries ONE copy of the text (identical within the
    // group by construction), so the representative corpus needs no join
    // back to `docs` — one corpus pass builds the whole collapse
    val groups = Par.seed(docs, col("doc_id"))
      .filter(size(split(col("text"), " ")) >= ShingleN) // shingles()'s own short-doc guard
      .groupBy(md5(col("text")).as("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        first(col("text")).as("text"))
      .select(col("ids"), element_at(col("ids"), 1).as("rep"), col("text"))
      .localCheckpoint(true)
    // ADAPTIVE: the groups table is already materialized, so one cheap
    // emptiness check routes a duplicate-free corpus (every group a
    // singleton — the benchmark fixtures, and any pre-exact-deduped
    // production corpus) through the ORIGINAL plan over `docs`, paying
    // zero expansion overhead; the collapse path runs only when identical
    // texts actually exist.
    val hasDups = !groups.filter(size(col("ids")) > 1).isEmpty
    if (!hasDups)
      return rawPairs(docs, jaccardThreshold).orderBy(col("doc_a"), col("doc_b"))
    val repDocs = groups.select(col("rep").as("doc_id"), col("text"))
    val repPairs = rawPairs(repDocs, jaccardThreshold)
    val cross = repPairs
      .join(groups.select(col("rep").as("doc_a"), col("ids").as("ids_a")), "doc_a")
      .join(groups.select(col("rep").as("doc_b"), col("ids").as("ids_b")), "doc_b")
      .select(explode(col("ids_a")).as("x"), col("ids_b"),
        col("n_shared_bands"), col("jaccard"))
      .select(col("x"), explode(col("ids_b")).as("y"),
        col("n_shared_bands"), col("jaccard"))
      .select(least(col("x"), col("y")).as("doc_a"), greatest(col("x"), col("y")).as("doc_b"),
        col("n_shared_bands"), col("jaccard"))
    val within = groups.filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"),
        lit(nBands.toLong).as("n_shared_bands"), lit(1.0).as("jaccard"))
      .filter(lit(1.0) >= jaccardThreshold)
    cross.unionByName(within)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Connected components over an undirected edge list → per-node minimum
    * reachable id as the component label. Each round is min-label
    * propagation over the edges (one shuffle: neighbor labels unioned with
    * own, min per node) FOLLOWED by a pointer-jumping step
    * (`label(x) := min(label(x), label(label(x)))` — one more join), with a
    * lineage cut per round and a fixpoint loop. Propagation alone is
    * O(diameter) rounds — a 10⁶-node chain would blow any round budget;
    * the jump step doubles the distance a label travels per round, giving
    * O(log n) convergence on ANY graph shape (the label-doubling idea
    * behind large-star/small-star). Near-clique dup graphs still converge
    * in 2-3 rounds; the driver-side work per round is a single scalar
    * `count` of changed labels.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .unionByName(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val viaEdges = sym
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
      // Materialized before the self-join below (fresh leaf attributes) and
      // because three consumers read it: the jump's two sides + the next
      // round. Two materializations per round is the same I/O shape as
      // large-star/small-star's two phases.
      val propagated = labels.unionByName(viaEdges)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      // Pointer jump: follow each node's label to THAT node's label, so a
      // minimum travels 2^round hops after `round` rounds, not `round`.
      val next = propagated
        .join(propagated.select(col("id").as("lid"), col("label").as("lbl2")),
          col("label") === col("lid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("lbl2"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") =!= col("prev")).count()
      labels = next
      round += 1
    }
    // Partially-converged labels are WRONG labels (downstream drops the
    // wrong survivors with no signal) — fail fast instead of returning them.
    // Pointer jumping makes this unreachable below ~2^maxRounds-diameter
    // graphs; hitting it means the budget genuinely needs raising.
    require(changed == 0,
      s"connectedComponents did not converge in $maxRounds rounds ($changed labels still moving)")
    labels
  }

  /** Near-dup clustering: MinHash-LSH pairs → connected components →
    * (doc, cluster, size). The canonical "pick one survivor per dup
    * cluster" step of a training-data pipeline: `cluster_id` is the
    * minimum doc id of the component (the survivor); every other member
    * is a drop candidate. Docs with no near-dup edge don't appear (they
    * are trivially their own cluster).
    */
  def dupClusters(docs: DataFrame, jaccardThreshold: Double = 0.3): DataFrame = {
    val pairs = minhashDupPairs(docs, jaccardThreshold).select(col("doc_a"), col("doc_b"))
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
    cc.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** Quality-aware canonical selection over the near-dup clusters — what a
    * production dedup actually keeps: not the minimum id (an arbitrary
    * crawl-order artifact) but the BEST variant of each duplicated
    * document. Survivor = the cluster member with the most content
    * (n_chars desc), doc_id asc as the deterministic tie-break; singleton
    * docs survive as themselves. One row per surviving doc with the mass
    * it represents — the `semanticDedup` output shape, quality-ranked.
    *
    * Composition of verified pieces: clustering is [[dupClusters]]
    * (MinHash-LSH pairs → pointer-jumping components); the per-cluster
    * pick is the bounded native top-1 aggregate (value desc, id asc — no
    * per-cluster window sort), so the whole selection adds one
    * cluster-keyed aggregation over the DUP SLICE only and one anti-join
    * for the singletons (broadcast-able whenever dups are sparse — the
    * semanticDedup scale note).
    */
  def qualitySurvivors(docs: DataFrame, jaccardThreshold: Double = 0.3): DataFrame = {
    val meta = docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
    val clustered = dupClusters(docs, jaccardThreshold)
      .select(col("doc_id"), col("cluster_id"))
    val picked = clustered.join(meta, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(graft.functions.TopKAggregator
          .topK(1, col("n_chars").cast("double"), col("doc_id")).as("top"),
        count(lit(1)).as("cluster_size"))
      .select(element_at(col("top.id"), 1).as("doc_id"), col("cluster_size"))
    val singletons = meta.join(clustered.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"))
    picked.unionByName(singletons)
      .join(meta, "doc_id")
      .select(col("doc_id"), col("cluster_size"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup pairs by SimHash HAMMING RADIUS (the Manku/Jain/Sarma
    * WWW'07 construction, radius 2): every DISTINCT signature probes with
    * itself plus its 16 one-bit flips; a candidate pair is any two
    * signatures sharing a probe key (one equi-join on the probe — never an
    * all-pairs compare); exact Hamming distance verifies each candidate,
    * and doc pairs expand from the matched signatures' member lists.
    * Recall within radius 2 is GUARANTEED, not data-dependent: for
    * hamming(a,b) ≤ 2, flipping one differing bit on each side (or fewer)
    * yields an equal intermediate signature, so the pair must share a
    * probe — which is why the oracle can be the pure all-pairs definition.
    * Probe volume is 17 rows/doc; a wider radius is more flips (radius 4 =
    * add the C(16,2) two-bit flips), the classic probes-vs-radius dial.
    */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming <= 2, "probe construction covers radius <= 2; widen flips for more")
    // Identical-signature collapse (the phashNearPairs move): a 16-bit
    // signature space has 65,536 values, so at corpus scale identical-sig
    // groups are GUARANTEED, and probe-joining the raw per-doc table pairs
    // each group quadratically on one shuffle key with a 17× probe fan-out
    // on top. After the collapse the probe join's input is one row per
    // DISTINCT signature (≤ 65,536 rows however large the corpus);
    // identical-sig pairs expand row-locally from each group's own sorted
    // id list, and cross-sig pairs expand from the two matched groups'
    // lists AFTER the Hamming verify. The expansions are output-volume
    // work; nothing quadratic crosses the probe join's shuffle.
    val groups = simhashSigs(docs)
      .groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .localCheckpoint(true)
    val within = groups
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"), lit(0L).as("hamming"))
    val flips = (0 until 16).map { i =>
      concat(substring(col("simhash"), 1, i),
        when(substring(col("simhash"), i + 1, 1) === "0", "1").otherwise("0"),
        substring(col("simhash"), i + 2, 16 - i - 1))
    }
    val probes = groups.select(col("simhash"),
      explode(array((col("simhash") +: flips): _*)).as("probe"))
    val sigPairs = probes.as("a").join(probes.as("b"),
        col("a.probe") === col("b.probe") && col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .distinct()
    val cross = sigPairs
      .withColumn("hamming",
        expr("size(filter(sequence(1, 16), i -> substr(sig_a, i, 1) <> substr(sig_b, i, 1)))")
          .cast("long"))
      .filter(col("hamming") <= maxHamming) // distinct sigs: hamming >= 1
      .join(groups.select(col("simhash").as("sig_a"), col("ids").as("ids_a")), "sig_a")
      .join(groups.select(col("simhash").as("sig_b"), col("ids").as("ids_b")), "sig_b")
      .select(explode(col("ids_a")).as("x"), col("ids_b"), col("hamming"))
      .select(col("x"), explode(col("ids_b")).as("y"), col("hamming"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"), col("hamming"))
    within.unionByName(cross)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The (doc_id, simhash) signature relation shared by `simhash` and the
    * Hamming-radius pair search.
    */
  def simhashSigs(docs: DataFrame): DataFrame = {
    val words = Par.seed(docs, col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("wd"))
    // Factor the per-word bit signs through a distinct-word dimension:
    // md5 runs once per vocabulary word instead of once per
    // (doc, word, bit). No broadcast hint: a web-scale vocabulary
    // (10^8+ tokens x 16 bits) would OOM executors if forced onto every
    // one of them — let AQE broadcast when the vocab side measures small
    // and fall back to a shuffled hash join when it doesn't.
    val wordBits = words.select(col("wd")).distinct()
      .select(col("wd"), explode(expr("sequence(0, 15)")).as("bit"))
      .withColumn("v", when(expr("substr(md5(wd), bit+1, 1)")
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
    val bits = words
      .join(wordBits, "wd")
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("v")).as("s"))
      .withColumn("b01", when(col("s") > 0, "1").otherwise("0"))
    bits.groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("bit"), col("b01")))), x => x.getField("b01")),
        "").as("simhash"))
  }

  /** 16-bit SimHash over a doc's distinct words (md5-nibble sign trick:
    * hex digit >= 8 contributes +1 to the bit, else -1). Near-identical
    * docs land in the same bucket; `n_bucket` surfaces collisions.
    */
  def simhash(docs: DataFrame): DataFrame =
    simhashSigs(docs)
      .withColumn("n_bucket",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("simhash"))))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): per doc, hash every k-token gram (md5 — lowercase
    * hex compares as the number, the engine-portable trick every dedup op
    * here uses), then keep the MINIMUM gram hash of each sliding window of
    * w consecutive grams; the distinct minima are the doc's fingerprints.
    * The published guarantee: any substring of ≥ w+k−1 shared tokens
    * forces at least one SHARED fingerprint (both docs' windows over the
    * shared run contain the same minimum) — local, position-robust
    * overlap detection that SimHash (global signature) and MinHash
    * (whole-set similarity) both miss, at ~|doc|/w fingerprints per doc
    * instead of every gram.
    *
    * Scale shape: fingerprint selection is entirely row-local (two array
    * transforms, no explode until the distinct minima — a ~w-fold volume
    * cut BEFORE the only shuffle); pairs come from one fingerprint-keyed
    * equi-join, never an all-pairs compare. Docs shorter than w+k−1
    * tokens emit no fingerprints (the `ngrams` short-doc guard).
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    // Both levels bind their input ONCE via the transform(array(x), v -> …)
    // wrapper: a lambda body referencing an OUTER expression re-evaluates
    // it per element (split(text) inside the gram lambda is a quadratic,
    // interpreted tokenize — measured 30× slower), while a lambda VARIABLE
    // is an evaluated value. tk = the token array, g = the gram-hash array.
    val fps = expr(s"""
      element_at(transform(array(split(text, ' ')), tk ->
        element_at(transform(array(CASE WHEN size(tk) >= $k
            THEN transform(sequence(1, size(tk) - ${k - 1}),
                           i -> md5(array_join(slice(tk, i, $k), ' ')))
            ELSE CAST(array() AS ARRAY<STRING>) END), g ->
          CASE WHEN size(g) >= $w
            THEN array_distinct(transform(sequence(1, size(g) - ${w - 1}),
                                          j -> array_min(slice(g, j, $w))))
            ELSE CAST(array() AS ARRAY<STRING>) END), 1)), 1)""")
    docs.select(col("doc_id"), fps.as("fps"))
  }

  /** Exploded (doc_id, fp) fingerprint table with ultra-common
    * fingerprints dropped: a fingerprint whose document frequency exceeds
    * `maxDf` is boilerplate ("terms of service…") shared by an unbounded
    * corpus fraction, and keeping it makes the fp-keyed candidate join
    * quadratic on that one key. MOSS-style systems drop high-df
    * fingerprints for exactly this reason. The df count is a groupBy
    * aggregate (map-side partial combine — the hot fp never concentrates
    * its raw rows in one task), and the join back onto the exploded table
    * builds against the one-row-per-kept-fp side, so every surviving fp
    * group is ≤ maxDf docs by construction.
    */
  private def winnowFpCapped(docs: DataFrame, k: Int, w: Int, maxDf: Int): DataFrame = {
    val fp = Par.seed(winnowFingerprints(docs, k, w), col("doc_id"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    // fps are distinct per doc (array_distinct in selection), so the plain
    // row count per fp IS its document frequency.
    val rareFp = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    fp.join(rareFp, "fp")
  }

  /** Candidate overlap pairs from shared winnowing fingerprints: docs
    * sharing ≥ `minShared` fingerprints, with the share count. By the
    * winnowing guarantee this catches every pair sharing a ≥ w+k−1-token
    * run (plus whatever shorter grams happen to be window-minima on both
    * sides — candidates, not verdicts; the exact-verify tier above it is
    * `prefixJaccardPairs`/`spanDupFractions`).
    *
    * Recall bound under the `maxDf` cap: a shared run contributes a pair
    * only through its shared window-minima, so a pair is LOST only when
    * EVERY fingerprint the two docs share has document frequency > maxDf —
    * i.e. the overlap is made entirely of corpus-wide boilerplate, the
    * precise content a dedup pipeline wants to ignore. Any pair sharing
    * ≥ minShared fingerprints of df ≤ maxDf is still emitted, and the
    * candidate join's per-key group size is capped at maxDf, so candidate
    * volume is ≤ Σ_fp min(df, maxDf)² ≤ maxDf · |exploded fps| — linear in
    * corpus size for fixed maxDf.
    *
    * BEHAVIORAL NOTE: `maxDf` defaults ON (1000), a change from the
    * original uncapped operator — pairs whose shared fingerprints are ALL
    * high-df (boilerplate-only overlap) are dropped BY DEFAULT, because the
    * uncapped form is quadratic on one corpus-wide footer and unusable at
    * scale. Callers who truly want boilerplate-only pairs must pass
    * `maxDf = Int.MaxValue` explicitly and accept the blow-up.
    */
  def winnowDupPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 1000): DataFrame = {
    val fp = winnowFpCapped(docs, k, w, maxDf)
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Blocked n-gram Jaccard: exact Jaccard over all pairs within a blocking
    * key (`source`) — the classic bounded all-pairs pattern when metadata
    * gives a natural block; complements the LSH path.
    */
  def blockedJaccardPairs(docs: DataFrame, threshold: Double = 0.25): DataFrame = {
    val sh = shingles(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") && col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Blocked Jaccard with a block-size guard — the scale-safe form. The
    * uncapped version is quadratic within a block, which is unbounded when
    * one `source` is huge (a web crawl's biggest domain). Here blocks up to
    * `maxBlockDocs` docs take the exact all-pairs path; oversized blocks
    * fall back to MinHash-LSH banding WITHIN the block (same 12-hash/4-band
    * family as `minhashDupPairs`) for candidate generation, then exact
    * shingle-intersection verify — so per-block work is bounded by band
    * bucket sizes, never |block|². Recall contract: within oversized blocks,
    * pairs are found iff they share an LSH band (~certain above Jaccard
    * ≈0.63 with this family, and deterministic either way — md5-based, so
    * any engine reproduces the same candidate set bit-for-bit).
    */
  def blockedJaccardPairsCapped(docs: DataFrame, threshold: Double = 0.25,
      maxBlockDocs: Int = 100): DataFrame = {
    // One tiny row per source; AQE broadcasts it when small, shuffles when
    // a web-scale source list measures big — no forced hint.
    val blockSizes = docs.groupBy(col("source")).agg(count(lit(1)).as("block_n"))
    val tagged = docs.select(col("doc_id"), col("source")).join(blockSizes, "source")
    val smallIds = tagged.filter(col("block_n") <= maxBlockDocs).select(col("doc_id"))
    val bigIds = tagged.filter(col("block_n") > maxBlockDocs).select(col("doc_id"))

    // The shingle table feeds BOTH paths in five places (sizes, the exact
    // pair join, band signatures, and both verify sides). Column pruning
    // specializes each consumer's subtree, so exchange reuse never fires
    // and the explode+distinct would recompute per consumer — materialize
    // it once (at 100 TB this is the staged shingle table you'd write
    // between pipeline stages).
    val sh = shingles(docs).join(docs.select(col("doc_id"), col("source")), "doc_id")
      .localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))

    // Exact path: within-block all-pairs via the (source, shingle) join.
    val shSmall = sh.join(smallIds, Seq("doc_id"), "left_semi")
    val smallInter = shSmall.as("a").join(shSmall.as("b"),
        col("a.source") === col("b.source") && col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))

    // LSH fallback: band-bucket equi-join (keyed by source + band) bounds
    // the candidate set; exact Jaccard verifies every candidate.
    val shBig = sh.join(bigIds, Seq("doc_id"), "left_semi")
    // Tiny (bands-per-doc rows) but consumed twice by the self-join, and
    // its lineage includes the whole signature aggregation — materialize.
    val bands = bandKeys(minhashWide(shBig.select(col("doc_id"), col("shingle"))))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .localCheckpoint(true)
    val candBig = bands.as("a").join(bands.as("b"),
        col("a.source") === col("b.source") && col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val bigInter = candBig
      .join(shBig.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(shBig.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))

    smallInter.unionByName(bigInter)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Prefix-filtered all-pairs Jaccard (the AllPairs / PPJoin family —
    * Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search", Xiao et
    * al. 2008): EXACT Jaccard-threshold pair enumeration over the whole
    * corpus with no blocking key and no probabilistic recall contract —
    * the third candidate-generation strategy of the near-dup family
    * (blocking = needs a metadata key; MinHash-LSH = tunable miss
    * probability; prefix filter = lossless). Under a global total order on
    * gram keys, two sets with J >= tau must share their SMALLEST common
    * element inside both prefixes of length |x| - ceil(tau*|x|) + 1 (if
    * all shared grams sat in x's suffix, inter <= ceil(tau*|x|) - 1 <
    * tau*|union| — contradiction), so only prefixes join. Ordering grams
    * by ascending document frequency makes every prefix the doc's RAREST
    * grams, so candidate lists stay short on skewed real corpora.
    *
    * Scale shape: one distinct over (doc_id, gh); df + per-doc rank are
    * one aggregation and one doc-keyed window over that table; the
    * candidate join runs on prefix rows only (rare keys by construction);
    * verification joins the two gram arrays per CANDIDATE pair — never
    * all pairs. The threshold keep-test is an integer cross-multiplication
    * (den*inter >= num*union), so the cut is exact rational arithmetic —
    * no float wobble at the boundary; the reported `jaccard` double is
    * display-only. ceil(tau*sz) is exact integer math ((num*sz + den-1)
    * DIV den).
    */
  def prefixJaccardPairs(docs: DataFrame, n: Int = 3,
      tauNum: Int = 1, tauDen: Int = 4): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum, "need a rational 0 < tau <= 1")
    import org.apache.spark.sql.expressions.Window
    // The gram table feeds four consumers (df counts, the ranked prefix,
    // both verify arrays) — materialize once, the staged-table pattern of
    // blockedJaccardPairsCapped.
    val grams = shingles(docs, n)
      .select(col("doc_id"), md5(col("shingle")).as("gh"))
      .localCheckpoint(true)
    val dfs = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    val byGlobalOrder = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gh"))
    val whole = Window.partitionBy(col("doc_id"))
    val ranked = grams.join(dfs, "gh")
      .select(col("doc_id"), col("gh"),
        row_number().over(byGlobalOrder).as("rk"),
        count(lit(1)).over(whole).as("sz"))
    val prefix = ranked.filter(
      col("rk") <= col("sz") - expr(s"($tauNum * sz + ${tauDen - 1}) DIV $tauDen") + 1)
    // Two further LOSSLESS cuts from the PPJoin family ride inside the
    // join condition (both pure integer arithmetic):
    //  - length filter: J >= tau forces min(sz)*den >= max(sz)*num
    //    (inter <= min and inter >= tau*union >= tau*max);
    //  - positional filter: for the pair's globally-first common gram at
    //    ranks (rk_a, rk_b), overlap <= 1 + min(sz_a-rk_a, sz_b-rk_b),
    //    which must reach the required o = ceil(tau/(1+tau)*(sz_a+sz_b))
    //    (from inter >= tau*(sz_a+sz_b-inter)). Keeping a pair when ANY
    //    shared-prefix occurrence passes is a superset of PPJoin's
    //    first-occurrence rule — still lossless, join-shaped.
    val tSum = tauNum + tauDen
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * tauDen >= col("b.sz") * tauNum &&
        col("b.sz") * tauDen >= col("a.sz") * tauNum &&
        (lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk"))) * tSum >=
          (col("a.sz") + col("b.sz")) * tauNum)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = grams.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("gh"))).as("ghs"), count(lit(1)).as("sz"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ghs").as("ga"), col("sz").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ghs").as("gb"), col("sz").as("nb")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_union") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union").cast("double")).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** One-row executive dedup report — the numbers a corpus release's data
    * card leads with: corpus size, exact-duplicate mass (docs beyond each
    * group's keeper + group count + fraction), and the verified near-dup
    * pair count. Three independent 1-row aggregates cross-joined; the
    * near tier reuses the full banded MinHash pipeline, so this is one
    * scan + the standard dedup shapes, no new machinery.
    */
  def dedupReport(docs: DataFrame, jaccardThreshold: Double = 0.3): DataFrame = {
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val exact = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("n_exact_dup_docs"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_groups"))
    val near = minhashDupPairs(docs, jaccardThreshold)
      .agg(count(lit(1)).as("n_near_dup_pairs"))
    total.crossJoin(exact).crossJoin(near)
      .withColumn("exact_dup_frac",
        col("n_exact_dup_docs").cast("double") / col("n_docs").cast("double"))
  }
}
