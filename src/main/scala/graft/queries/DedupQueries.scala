package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators over the `documents` table — the core of any
  * 100 TB training-data pipeline. Four families, mirroring production
  * dedup stacks (exact hash, MinHash+LSH banding, SimHash hamming,
  * verified n-gram Jaccard):
  *
  * Scale design: every candidate-generation step is a *bucketed* shuffle
  * join (band hash / simhash chunk), never an O(n²) cross join — the
  * quadratic work only happens inside buckets, which stay small because the
  * band keys are 60-bit hashes. The DuckDB oracles replay the identical
  * math but may use the naive pair join (the oracle only runs at sf0.01);
  * candidate-set semantics (band-collision conditions) are kept identical
  * so results match exactly.
  *
  * All hashes derive from md5 (cross-engine bit-identical); see
  * [[PipelineFns]].
  */
object DedupQueries extends QueryModule {
  import PipelineFns._

  // LSH geometry from the active GraftConfig (demo: 8 minhashes → 4 bands
  // × 2 rows; the 100 TB preset widens to 32 × 4 — see GraftConfig and
  // README "Capacity math"). Query code AND oracle SQL derive from the
  // same values, so the two sides cannot disagree.
  private val NumMinhash = graft.GraftConfig.active.numMinhash
  private val NumBands = graft.GraftConfig.active.numBands
  private val RowsPerBand = graft.GraftConfig.active.rowsPerBand
  private val JaccardThreshold = 0.5
  private val ContainmentThreshold = 0.6
  // d18 audit sample: 1/17 of the corpus by seeded hash, then PINNED to at
  // most `AuditSampleCap` docs by seeded-hash order (TakeOrderedAndProject —
  // per-partition top-k, cap-row driver merge). The cap is what makes the
  // audit's all-pairs stage O(cap²) — CONSTANT in corpus size — instead of
  // n²/289; the mod prefilter just keeps the top-k scan off the full
  // shingle sets at big n. The cap binds only above ~8.7k docs (17 × 512),
  // so the sf0.01/sf0.1 demo results are unchanged; the scale harness is
  // exactly where it engages (bench_scale d18 leg).
  private val AuditMod = 17L
  private val AuditSampleCap = 512
  // d17 broadcast-hint ceiling: (did, eid) candidate pairs above this
  // count fall back to a doc_id shuffle join instead of OOMing the driver
  // with a forced broadcast (4M pairs ≈ 64 MB packed — comfortably inside
  // the driver budget, far past anything a sane eval screen produces)
  private val MaxBroadcastCands = 4_000_000L

  /** Balanced `(a + b)` reduction for generated SQL: a left-deep fold of
    * the capacity preset's 128 minhash terms exceeds DuckDB's binder
    * recursion cap (128); a log-depth tree is identical arithmetic.
    */
  private def balSumSql(ts: Seq[String]): String =
    if (ts.size == 1) ts.head
    else { val (a, b) = ts.splitAt(ts.size / 2); s"(${balSumSql(a)} + ${balSumSql(b)})" }
  private val SimhashBits = 56 // 4 chunks × 14 bits; pigeonhole covers hamming ≤ 3
  private val HammingMax = 3

  /** doc_id + distinct 3-gram shingle DIGEST set (60-bit h60 per shingle).
    * Working in integer digest space makes every downstream op cheap:
    * Jaccard intersects longs and all eight minhashes are bit-shift slices
    * of the same digest. One fused codegen pass
    * ([[graft.functions.ShingleHashes]]) replaces the tokenize → shingle →
    * distinct → hash built-in chain (4 interpreted higher-order passes;
    * was ~6 s of the sf0.1 bench).
    */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.shingleHashes(col("text"), 3).as("sh")
    )

  /** [[shingleSets]] hash-partitioned by doc_id at the session's sizing
    * count — for the once-per-session shared-cache builds ONLY.
    *
    * The repartition is UNCONDITIONAL and its count is exactly
    * [[GraftSession.initialPartitions]] for this corpus dir, for two
    * reasons that each bit:
    *
    *  - Parallelism: CPU-dense per-row work (fused shingle scan, then the
    *    minhash family) must not inherit the scan's split count — byte-
    *    based file packing folds a synthesized ×N corpus (a handful of
    *    sub-MB files) into 1–2 partitions, serializing the build
    *    (measured: 77 s cold at ×10 capacity geometry, CPU-bound on 2 of
    *    32 cores).
    *  - Co-location: the cached InMemoryRelation keeps
    *    `hashpartitioning(doc_id, n)` as its output partitioning, and the
    *    six verify-family queries all join this frame on doc_id. Spark
    *    reuses that partitioning ONLY when `n` is at least the join's
    *    expected shuffle count — which under AQE is
    *    `initialPartitionNum`, the dir-sized value [[GraftSession
    *    .sizeShuffleFor]] sets. A round-17 ×10 audit caught the mismatch
    *    cost: the dir sizing put initialPartitionNum at 64 while the old
    *    core-width spread cached 32 partitions, so EVERY verify join
    *    re-shuffled the full cached shingle-set frame — ~2.5 GB written
    *    per query on 150–270 MB input, ×6 queries (shuffle_audit leg 3).
    *    Deriving the cache count from the same deterministic sizing rule
    *    (dir bytes × cores) makes cache and session agree at any scale,
    *    so only the skinny candidate side shuffles. This is the
    *    in-session form of the bucketed-parquet co-location the band-claim
    *    store documents for 100 TB (see [[incrementalNearDup]]).
    *
    * Per-query UNCACHED lineages keep the plain map-only [[shingleSets]]
    * scan — a per-execution corpus shuffle would be pure overhead at
    * production split counts, and the d17/v13 screens' map-only
    * training-side contract (ShuffleAuditSpec's bounded ceiling) depends
    * on its absence. The build's one corpus shuffle lands in the FIRST
    * cache consumer's ledger row (the ShuffleAudit attribution
    * convention) and is paid once per session.
    */
  private def shingleSetsWide(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val par = s.sparkContext.defaultParallelism
    val n = math.max(par, graft.GraftSession.initialPartitions(
      graft.GraftSession.dirBytes(d, Some(s.sparkContext.hadoopConfiguration)), par))
    docs.repartition(n, col("doc_id")).select(
      col("doc_id"),
      graft.functions.shingleHashes(col("text"), 3).as("sh")
    )
  }

  private val shingleSetSql =
    s"SELECT doc_id, list_distinct(list_transform(${shinglesSql("toks", 3)}, x -> ${h60Sql("x")})) AS sh FROM (SELECT doc_id, $tokensSql AS toks FROM documents)"

  /** Minhash signature columns mh0..mh{n-1} at the active geometry: the
    * demo's 8 digest-window slices, or (wide presets) the fused
    * independent-slice family — see [[signaturesFor]]. Slice correlation
    * in the demo windows only affects candidate recall; every candidate
    * is exact-Jaccard-verified downstream.
    */
  private def signatures(sets: DataFrame): DataFrame = signaturesFor(sets, NumMinhash)

  /** Signature columns mh0..mh{n-1} for an arbitrary signature length —
    * the geometry-generic core behind [[signatures]], package-visible so
    * the 100 TB-preset slice math is testable without swapping
    * `GraftConfig.active`.
    */
  private[queries] def signaturesFor(sets: DataFrame, numMinhash: Int): DataFrame = {
    // demo geometry (≤ 8 slices): the digest-window expression — the
    // catalog's checked values, one pass ([[graft.functions.MinHash8]]).
    // Wide geometry (> 8): EVERY slice from the fused 2-universal family
    // ([[graft.functions.MinHashN]], one integer pass for all slices) —
    // digest windows overlap at 4-bit stride and that correlation, benign
    // for 4 bands of 2, would bias a 32×4 banding, so the capacity preset
    // uses only independent slices. Both mirror exactly in the generated
    // oracle SQL.
    val base =
      if (numMinhash <= 8)
        sets.select(col("doc_id"), graft.functions.minhash8(col("sh")).as("mh"))
      else
        sets.select(col("doc_id"), graft.functions.minhashN(col("sh"), numMinhash).as("mh"))
    base.select(col("doc_id") +:
      (0 until numMinhash).map(j => element_at(col("mh"), j + 1).as(s"mh$j")): _*)
  }

  private def minhashColsSql: String =
    (0 until NumMinhash).map { j =>
      if (NumMinhash <= 8) s"list_min(list_transform(sh, h -> (h >> ${4 * j}) & 4294967295)) AS mh$j"
      else s"list_min(list_transform(sh, h -> ${graft.functions.MinHashN.sliceSql(NumMinhash, j)})) AS mh$j"
    }.mkString(", ")

  /** LSH band keys: md5 over `rowsPerBand` adjacent minhashes. */
  private def bandCols: Seq[Column] = bandColsFor(NumBands, RowsPerBand)

  private[queries] def bandColsFor(numBands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until numBands).map { b =>
      md5(concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}").cast("string")): _*)).as(s"band$b")
    }

  private def bandColsSql: String =
    (0 until NumBands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"CAST(mh${b * RowsPerBand + r} AS VARCHAR)").mkString(", '_', ")
      s"md5(concat($parts)) AS band$b"
    }.mkString(", ")

  /** `(l.band0 = r.band0 OR ...)` over all configured bands — oracle-side
    * any-shared-band join condition, generated so a preset change cannot
    * leave the SQL checking fewer bands than the plan.
    */
  private def bandOrSql(l: String, r: String): String =
    (0 until NumBands).map(b => s"$l.band$b = $r.band$b").mkString("(", " OR ", ")")

  /** UNION ALL explode of band columns into (doc_id, band_idx, band). */
  private def bandRowsSql(src: String): String =
    (0 until NumBands)
      .map(b => s"SELECT doc_id, $b AS band_idx, band$b AS band FROM $src")
      .mkString(" UNION ALL\n  ")

  /** Per-document LSH band rows `(band_idx, band, doc_id)` for an arbitrary
    * `(doc_id, text)` frame — the band-key math of this module exposed for
    * the streaming guard ([[graft.streaming.StreamingOps.nearDupBandRows]])
    * and incremental ingest ([[incrementalNearDup]]).
    */
  def docBandRows(docs: DataFrame): DataFrame =
    // ONE fused pass ([[graft.functions.BandKeys]]) — the stacked
    // signatures→bandCols projections collapse onto the raw minhash call
    // and re-evaluate the whole shingle→minhash pipeline PER BAND COLUMN
    // (the bandSigsCached hazard; profiled at 57–66 s of the incremental
    // legs' ×10 day-0 where one pass costs ~5 s)
    docs.select(col("doc_id"),
        posexplode(graft.functions.bandKeys(
          graft.functions.shingleHashes(col("text"), 3), NumMinhash, NumBands))
          .as(Seq("band_idx", "band")))
      .select(col("band_idx").cast("int").as("band_idx"), col("band"), col("doc_id"))

  /** Per-document `(doc_id, sh, bands)` — the band-key math of
    * [[docBandRows]] with the shingle digest set kept IN-ROW and the bands
    * as one positional array instead of exploded rows. Pure stateless
    * column expressions (shingle→minhash→band, the exact catalog math), so
    * it applies to streaming frames too — the shape the streaming fuzzy-
    * decontamination guard ([[graft.streaming.StreamingOps.screenDocsFuzzy]])
    * needs: band array for the broadcast eval-index lookup, shingle set
    * for the in-row Jaccard verify.
    */
  def docShinglesAndBands(docs: DataFrame): DataFrame =
    // fused band pass (see [[docBandRows]]); sh stays in-row for the
    // verify half
    docs.select(col("doc_id"), graft.functions.shingleHashes(col("text"), 3).as("sh"))
      .select(col("doc_id"), col("sh"),
        graft.functions.bandKeys(col("sh"), NumMinhash, NumBands).as("bands"))

  /** Incremental near-dup ingest against a persisted band-claim store.
    *
    * `store` rows are `(band_idx, band, rep)` — the first doc_id ever seen
    * in each LSH band bucket across prior batches. Returns
    * `(kept, updatedStore)`: a new doc is kept iff no band bucket of its is
    * already claimed (by the store, or by a lower-id doc in this batch);
    * the updated store adds this batch's first-claims. Folding batches
    * through this function reproduces the streaming keep-first result
    * ([[graft.streaming.StreamingOps.nearDupHits]]) exactly — spec'd in
    * IncrementalDedupSpec.
    *
    * Scale: the store join shuffles on the band key (even by construction);
    * at 100 TB the store lives as bucket-partitioned parquet so the join
    * co-locates without a shuffle, and each ingest batch touches only its
    * own band buckets.
    */
  def incrementalNearDup(newDocs: DataFrame, store: DataFrame): (DataFrame, DataFrame) = {
    // localCheckpoint, not cache(): the shingle→minhash→band pipeline is
    // the dominant per-doc cost and feeds three consumers (claims, dups,
    // updated store), so it must materialize once — but a cache() entry is
    // pinned by the CacheManager forever with no handle for the caller to
    // unpersist, leaking one lineage per ingest batch in a long session.
    // Checkpoint blocks are released by the context cleaner once the
    // returned frames go unreferenced.
    val rows = docBandRows(newDocs).localCheckpoint(eager = true)
    val claims = rows.groupBy(col("band_idx"), col("band")).agg(min(col("doc_id")).as("new_rep"))
    // effective claimant per touched bucket: earlier batches win, else the
    // batch's lowest doc_id
    val merged = claims.join(store, Seq("band_idx", "band"), "left")
      .select(col("band_idx"), col("band"), coalesce(col("rep"), col("new_rep")).as("rep"))
    val dups = rows.join(merged, Seq("band_idx", "band"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id")).distinct()
    val kept = newDocs.join(dups, Seq("doc_id"), "left_anti")
    // unionByName, not positional union: a store checkpointed as
    // band_idx-PARTITIONED parquet reads back with the partition column
    // moved to the end, and a positional union would silently misalign
    // (band under band_idx, rep under band → cast failure or corruption)
    val updated = store.unionByName(
      claims.join(store, Seq("band_idx", "band"), "left_anti")
        .select(col("band_idx"), col("band"), col("new_rep").as("rep")))
    (kept, updated)
  }

  /** Jaccard from a pre-computed intersection size — `array_intersect` is
    * the expensive half of verification, so callers compute it exactly once
    * and feed it to both numerator and denominator.
    */
  private def jaccardFrom(isect: Column, a: Column, b: Column): Column =
    isect.cast("double") / (size(a) + size(b) - isect)

  private val isectSql = "len(list_intersect(a.sh, b.sh))"
  private def jaccardFromSql(isect: String) =
    s"CAST($isect AS DOUBLE) / (len(a.sh) + len(b.sh) - $isect)"

  /** doc_id + 56-bit simhash (majority vote over distinct-token hashes).
    * Distinct token hashes are 1-gram shingle digests, so the fused
    * [[graft.functions.ShingleHashes]] scan produces them in one pass, and
    * [[graft.functions.SimHash56]] folds them in another — the all-built-in
    * formulation (regex tokens → distinct → md5 transform → 56 interpreted
    * `aggregate` folds, re-evaluated per bit) was ~20× slower at sf0.1.
    */
  private def simhashed(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.shingleHashes(col("text"), 1).as("hs"))
      .select(col("doc_id"), graft.functions.simhash56(col("hs")).as("simhash"))

  /** Connected components by iterative min-label propagation (hash-to-min)
    * over an undirected edge list `(a, b)`. Rounds = graph diameter; the
    * convergence probe is a one-row sum (labels only decrease). Returns
    * `(v, label)` for every vertex that appears in an edge.
    */
  /** Edge-count threshold below which connected components run as a single
    * partition-local union-find job. After exact-dup collapse + LSH banding
    * + Jaccard verification, the edge list is orders of magnitude smaller
    * than the corpus (it holds only confirmed near-dup PAIRS), so even at
    * 100 TB corpus scale it usually fits one executor; 5e6 edges ≈ 80 MB.
    * Above the threshold the distributed min-label loop takes over.
    */
  private val LocalCcMaxEdges = graft.GraftConfig.active.localCcMaxEdges

  private def minLabelComponents(undirected: DataFrame): DataFrame = {
    // Callers cache `undirected` (it is the output of the whole LSH
    // candidate + verification pipeline); the count() both sizes the graph
    // and materializes that cache before the CC passes reuse it.
    if (undirected.count() <= LocalCcMaxEdges) localUnionFind(undirected)
    else distributedMinLabel(undirected)
  }

  /** Single-job CC: coalesce the (small, verified) edge list to one
    * partition and run union-find with path compression, attaching the
    * larger root under the smaller so each component's root is its min
    * vertex id — identical semantics to min-label propagation, zero
    * iteration overhead. Executor-side (`mapPartitions`), not a driver
    * collect.
    */
  private[queries] def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        val vs = parent.keys.toArray
        vs.iterator.map(v => (v, find(v)))
      }
      .toDF("v", "label")
  }

  /** Distributed CC for edge lists too large for one executor: iterative
    * min-label propagation (hash-to-min); rounds = graph diameter, each one
    * shuffle join + aggregation, convergence probed by a 1-row label sum.
    */
  private[queries] def distributedMinLabel(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("a").as("v")).distinct()
      .withColumn("label", col("v")).cache()
    def labelSum(df: DataFrame): Long = df.agg(sum(col("label"))).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    val maxIters = 50 // safety cap only; rounds needed = graph diameter
    while (!converged && iter < maxIters) {
      val prop = edges.join(labels, col("a") === col("v"))
        .select(col("b").as("v"), col("label"))
      var next = labels.select(col("v"), col("label")).union(prop)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
      // Truncate lineage periodically: without this, round i's plan chains
      // every previous round, and a deep (high-diameter) graph re-plans an
      // ever-growing DAG even though the data is cached.
      if ((iter + 1) % 5 == 0) next = next.localCheckpoint(eager = false)
      next = next.cache()
      // Materialize `next` (the labelSum action) BEFORE dropping the old
      // cache — unpersisting first forces `next` to recompute its parent
      // from scratch, making iteration i pay for the whole chain up to i.
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"minLabelComponents did not converge within $maxIters rounds — " +
          "component diameter exceeds the cap; raise it or pre-collapse the graph")
    // Hand back a checkpoint, not the loop's cache: a returned .cache()
    // has no release path for callers (the CacheManager pins it for the
    // session), while localCheckpoint blocks are freed by the context
    // cleaner once the result goes unreferenced. The copy is label-table
    // sized (vertices in dup components), not corpus-sized.
    val out = labels.localCheckpoint(eager = true)
    labels.unpersist()
    out
  }

  /** Verified near-dup edge list `(a, b)` with `a < b`, built from the given
    * shingle sets (band-bucket candidates → first-shared-band dedup → exact
    * Jaccard verification).
    */
  /** Candidate pairs `(a, b)` with `a < b` sharing at least one LSH band,
    * emitted exactly once per pair. Input: wide signature frame
    * `(doc_id, band0..band{NumBands-1})`. Shared by [[verifiedEdges]] and
    * the d12 edit-distance verifier.
    *
    * Shape: explode to SKINNY band rows `(doc_id, band_idx, band)`,
    * equi-join per band bucket, then dedup the multi-band hits with one
    * `distinct()` over the pair stream. Earlier rounds deduped IN-ROW
    * (keep a pair only at its first shared band) to avoid that distinct —
    * but the in-row filter needs the full band signature on BOTH sides of
    * every exploded row, and at the capacity geometry (32 bands × 32-char
    * md5) that widens the self-join's exchange payload ~27× over the
    * input: the ×10 shuffle audit measured 2.5 GB written PER QUERY on
    * 150–270 MB input across the six verify-family queries, all of it
    * these two band-row exchanges (round-17 verdict's one perf_weak).
    * The skinny explode shuffles ~60 B/band-row instead — linear in
    * corpus × NumBands with a small constant — and the distinct shuffles
    * only the COLLISION-pair stream, whose rows were already join output
    * in either design (~16 B each vs the ~1.3 KB wide rows). The trade
    * reverses only if collisions outnumber corpus band rows ~80:1 —
    * a degenerate boilerplate corpus that the d8 exact-collapse is the
    * documented answer to (near-identical docs collapse to one
    * representative before any banding).
    */
  private def bandCandidatePairs(sigs: DataFrame, directed: Boolean = false): DataFrame = {
    val rows = sigs.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band")))
    val idCond =
      if (directed) col("x.doc_id") =!= col("y.doc_id") else col("x.doc_id") < col("y.doc_id")
    rows.as("x")
      .join(rows.as("y"), col("x.band_idx") === col("y.band_idx") && col("x.band") === col("y.band") && idCond)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** LSH-candidate → exact-Jaccard-verified edge set over `sets`.
    * `bands` supplies a precomputed `(doc_id, band0..N-1)` table covering
    * at least `sets`' doc_ids (the shared [[bandSigsCached]] handle,
    * optionally pre-filtered) — signing is per-row and deterministic, so
    * reusing the corpus-wide handle is row-identical to re-signing the
    * subset, and it skips the one genuinely expensive pass here (the
    * fused shingle→minhash pipeline; re-signing the rep subset cold was
    * 59 s of d13's first sample at the ×10 capacity leg).
    */
  private def verifiedEdges(sets: DataFrame, bands: Option[DataFrame] = None): DataFrame = {
    val sigs = bands.getOrElse(signatures(sets).select(col("doc_id") +: bandCols: _*))
    val cand = bandCandidatePairs(sigs)
    cand
      .join(sets.as("sa"), col("a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"), size(array_intersect(col("sa.sh"), col("sb.sh"))).as("isect"),
        size(col("sa.sh")).as("na"), size(col("sb.sh")).as("nb"))
      .filter(round(col("isect").cast("double") / (col("na") + col("nb") - col("isect")), 6) >= JaccardThreshold)
      .select(col("a"), col("b"))
  }

  private val simhashSql =
    s"""CAST(list_sum(list_transform(range(0, $SimhashBits), b ->
       |  CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin

  /** The production near-dup pipeline shape (d8, reused by d13): collapse
    * EXACT duplicates to one representative first (identical docs produce
    * identical shingle sets, so a cluster of k copies would otherwise emit
    * k²/2 trivial pairs — the dominant cost on real corpora), run LSH +
    * verification + connected components on representatives only, then
    * broadcast the group assignment back through the content-hash map.
    * Output: every document with its dedup group id.
    */
  private val dedupGroupsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Shared-cache registration — the generic registry lives in
    * [[SharedCaches]] (the IVF codebooks register there too); this module
    * contributes the shingle-set scan, band/simhash signatures, and the
    * d8/d13 pipeline intermediates.
    */
  private def sharedCache(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame =
    SharedCaches.get(s, d, key)(build)

  /** Full-corpus `(doc_id, band0..bandN-1)` — the LSH band table every
    * band-join family member consumes, SharedCaches-registered so the
    * signature pass (the family's dominant cost at the capacity geometry:
    * 128 fused minhash slices per doc) is signed ONCE per (session, dir)
    * and filtered per query. d3/d6/d12/d14/d17 all draw from this handle;
    * signing is per-row, so per-query side filters commute with it.
    */
  private def bandSigsCached(s: SparkSession, d: String): DataFrame =
    sharedCache(s, d, "bandSigs") {
      // Build THROUGH a materialized (doc_id, mh) boundary, not straight
      // off signatures(): CollapseProject folds the 128 element_at slices
      // AND the band expressions onto the raw minhash_n call, and when the
      // collapsed projection leaves whole-stage codegen (the cache-build
      // path at the 128-slice geometry), common-subexpression elimination
      // goes with it — the full shingle→minhash pipeline re-evaluates per
      // OUTPUT COLUMN, turning a 4 s signature pass into a 56 s cache
      // build (measured, ×10 capacity corpus). The InMemoryRelation
      // boundary pins minhash_n to exactly one evaluation per row; the
      // band projection above it reads a materialized array.
      val mhExpr =
        if (NumMinhash <= 8) graft.functions.minhash8(col("sh"))
        else graft.functions.minhashN(col("sh"), NumMinhash)
      val mh = sharedCache(s, d, "mhSigs")(
        shingleSetsWide(s, d).select(col("doc_id"), mhExpr.as("mh")))
      mh.select(col("doc_id") +:
          (0 until NumMinhash).map(j => element_at(col("mh"), j + 1).as(s"mh$j")): _*)
        .select(col("doc_id") +: bandCols: _*)
    }

  /** FUZZY benchmark decontamination (the d17 operator) — the
    * near-duplicate companion to the exact-overlap family (d9 exact
    * 5-grams, d10 hashed, d16 graded): a training doc that is a
    * near-duplicate of an eval doc (Jaccard >= 0.5 over shingles) is
    * contamination even when shuffled/fragmented overlap keeps any single
    * long n-gram below the exact detectors' radar. Candidates come from an
    * LSH band join BETWEEN the two sides (never all-pairs): the eval side
    * is eval-set-sized at any corpus scale, so its band rows AND its
    * shingle sets broadcast, and the training side streams map-only
    * through candidate generation and Jaccard verification — the d9
    * broadcast discipline applied to the d3 band machinery.
    * First-shared-band in-row dedup, as everywhere: no distinct() shuffle
    * of the candidate set.
    *
    * `evalCap` bounds the eval side's doc_id: the catalog runs unbounded
    * (the `%97` harness convention — eval grows 1/97th of the corpus), the
    * scale harness passes the ×1 corpus's id stride to pin the eval set at
    * its ×1 size while the training side grows — the PRODUCTION shape
    * (a fixed benchmark suite screened against an ever-growing corpus),
    * under which the whole job is linear in corpus size.
    */
  def fuzzyDecontaminate(s: SparkSession, d: String, evalCap: Long = Long.MaxValue): DataFrame = {
    val isEval = col("doc_id") % 97 === 0 && col("doc_id") < evalCap
    val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
    // signatures are PER-ROW (minhash slices + band md5 of one doc's
    // shingle set), so side-splitting commutes with signing: filter the
    // family's shared full-corpus band table instead of signing each side
    // separately — the 128-slice signature pass (the dominant cost at the
    // capacity geometry: 55 of 158 s in the ×10 catalog run before this)
    // is paid once per session by whichever family query touches the
    // cache first, and d17 pays only its band join + verify
    val allBands = bandSigsCached(s, d)
    val trainBands = allBands.filter(!isEval)
    val evalBands = allBands.filter(isEval)
    def bandRows(sigs: DataFrame) = sigs.select(
      col("doc_id") +: (0 until NumBands).map(b => col(s"band$b")) :+
        posexplode(array((0 until NumBands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band")): _*)
    val firstSharedBand = (0 until NumBands).reverse.foldLeft(lit(-1)) { (acc, bi) =>
      when(col(s"x.band$bi") === col(s"y.band$bi"), lit(bi)).otherwise(acc)
    }
    val cands = bandRows(trainBands).as("x")
      .join(broadcast(bandRows(evalBands).as("y")),
        col("x.band_idx") === col("y.band_idx") && col("x.band") === col("y.band"))
      .filter(col("x.band_idx") === firstSharedBand)
      .select(col("x.doc_id").as("did"), col("y.doc_id").as("eid"))
    val evalSets = sets.filter(isEval)
      .select(col("doc_id").as("eid"), col("sh").as("esh"))
    // payload-fetch direction, the d12 discipline: the CANDIDATE side
    // broadcasts (eval-bounded band collisions, tiny next to the corpus)
    // and the corpus-side shingle sets STREAM past it — left to stats,
    // Catalyst can shuffle the corpus side here, which at sf0.001 already
    // re-networks the whole sets table and at 100 TB is a full-corpus
    // shuffle per screen. The hint is GATED, not unconditional: a
    // collision-heavy corpus (boilerplate pathology inflating band hits
    // against the eval set) can blow the candidate set past driver
    // memory, so we count it first — `rdd.count()` is a map-only action
    // (driver-side partition-count reduce, zero shuffle bytes, so d17's
    // bounded-shuffle ledger contract holds) over the cached band
    // lineage — and past the ceiling we DROP the hint and let the verify
    // shuffle on doc_id. The property that scales is
    // fetch-only-candidate-payloads, not the broadcast itself.
    val candsSide =
      if (cands.rdd.count() <= MaxBroadcastCands) broadcast(cands) else cands
    val verified = candsSide
      .join(sets.as("sa"), col("did") === col("sa.doc_id"))
      .join(broadcast(evalSets), Seq("eid"))
      .select(col("did"), col("eid"),
        size(array_intersect(col("sa.sh"), col("esh"))).as("isect"),
        size(col("sa.sh")).as("na"), size(col("esh")).as("nb"))
      .withColumn("jaccard",
        round(col("isect").cast("double") / (col("na") + col("nb") - col("isect")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
    // per contaminated doc: match count + the strongest eval match
    // (max jaccard, ties to the lowest eval id — one max(struct))
    verified.groupBy(col("did"))
      .agg(count(lit(1)).as("n_eval_matches"),
        max(struct(col("jaccard"), (-col("eid")).as("nid"))).as("m"))
      .select(col("did").as("doc_id"), col("n_eval_matches"),
        (-col("m.nid")).as("eval_doc_id"), col("m.jaccard").as("max_jaccard"))
  }

  /** Handles currently registered for (session, dir) — test hook for the
    * lifecycle spec (storage-level assertions need the exact frames).
    */
  private[graft] def cachedHandles(s: SparkSession, d: String): Map[String, DataFrame] =
    SharedCaches.handles(s, d)

  /** Release every cached lineage registered for (session, dir) — the
    * shared caches of ALL modules (dedup sets/signatures/pipeline
    * intermediates, IVF codebooks) via [[SharedCaches.release]], plus this
    * module's memoized group pipeline so the next call rebuilds from
    * scratch. Verify/Bench mains skip this — session-lifetime caches are
    * the point there — but a long-lived production session calls it after
    * materializing downstream results, or storage accumulates one pipeline
    * per corpus dir touched.
    */
  def release(s: SparkSession, d: String): Unit = {
    SharedCaches.release(s, d)
    dedupGroupsMemo.remove((s, d))
  }

  /** Pre-materialize the dedup family's shared caches (shingle sets, the
    * 128-slice signature/band table, the memoized d8/d13/d20 group
    * pipeline) — the serving-bench analog of
    * [[EmbeddingQueries.warmIndexCaches]]: at a deployment the dedup
    * group assignment is a PERSISTED pipeline output, so serving samples
    * must not absorb its build. Without this, whichever d-family query
    * ran first paid the whole band-join + verify + CC build in its first
    * sample (the ×10 sweep's d13 showed a 13× max/mid tail from exactly
    * that).
    */
  def warmCaches(s: SparkSession, d: String): Unit = {
    bandSigsCached(s, d)
    dedupGroups(s, d)
  }

  private def dedupGroups(s: SparkSession, d: String): DataFrame = {
    // memoized per (session, dir): d8 and d13 then share the SAME cached
    // lineages, so the LSH band join + Jaccard verification + CC loop run
    // once per session, not once per query. The four caches (registered in
    // sharedCacheMemo, so [[release]] can unpersist them) are testdata-
    // scale and live until released.
    dedupGroupsMemo.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    dedupGroupsMemo.getOrElseUpdate((s, d),
      buildDedupGroups(s, d, (key, df) => sharedCache(s, d, key)(df),
        // reuse the corpus-wide shared handles: the rep subset's shingle
        // sets and signatures are row-identical filtered views of them,
        // and building them fresh here was the 59 s cold pathology
        corpusSets = Some(sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))),
        corpusBands = Some(bandSigsCached(s, d))))
  }

  /** Non-memoized pipeline builder. Exposed package-private so invariance
    * harnesses (DeterminismSpec's partition sweep) can force a FRESH
    * lineage per run — the memo would otherwise hand both runs the same
    * cached intermediates and make the comparison vacuous.
    */
  private[graft] def buildDedupGroups(s: SparkSession, d: String): DataFrame =
    buildDedupGroups(s, d, (_, df) => df.cache())

  private def buildDedupGroups(
      s: SparkSession, d: String, cacheAs: (String, DataFrame) => DataFrame,
      corpusSets: Option[DataFrame] = None,
      corpusBands: Option[DataFrame] = None): DataFrame = {
    val docsCh = cacheAs("d8.docsCh", Tables.documents(s, d)
      .select(col("doc_id"), md5(array_join(tokens(col("text")), " ")).as("ch"))
    ) // read twice: representative election + final group expansion
    val reps = docsCh.groupBy(col("ch")).agg(min(col("doc_id")).as("rep"))
    val repIds = reps.select(col("rep").as("doc_id"))
    val repSets = cacheAs("d8.repSets", corpusSets.getOrElse(shingleSets(s, d))
      .join(repIds, Seq("doc_id"), "left_semi"))
    val edges = cacheAs("d8.edges", verifiedEdges(repSets,
      corpusBands.map(_.join(repIds, Seq("doc_id"), "left_semi"))))
    val undirected = cacheAs("d8.undirected",
      edges.union(edges.select(col("b").as("a"), col("a").as("b"))))
    val comp = minLabelComponents(undirected)
    docsCh.join(reps, Seq("ch"))
      .join(comp, col("rep") === col("v"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("rep")).as("group_id"))
  }

  /** The d8 CTE chain up to a `groups(doc_id, group_id)` relation —
    * shared by the d8 and d13 oracles (caller supplies WITH RECURSIVE).
    */
  private def dedupGroupsSql: String =
    s"""ch AS (
       |  SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS ch FROM documents),
       |reps AS (SELECT ch, min(doc_id) AS rep FROM ch GROUP BY ch),
       |sets AS (SELECT * FROM ($shingleSetSql) WHERE doc_id IN (SELECT rep FROM reps)),
       |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sets)),
       |verified AS (
       |  SELECT sa.doc_id AS a, sb.doc_id AS b
       |  FROM sigs sa JOIN sigs sb ON sa.doc_id < sb.doc_id
       |    AND ${bandOrSql("sa", "sb")}
       |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id
       |  WHERE round(${jaccardFromSql(isectSql)}, 6) >= $JaccardThreshold),
       |edges AS (SELECT a, b FROM verified UNION ALL SELECT b, a FROM verified),
       |reach(v, m) AS (
       |  SELECT a AS v, a AS m FROM edges
       |  UNION
       |  SELECT e.b AS v, r.m FROM edges e JOIN reach r ON r.v = e.a),
       |comp AS (SELECT v, min(m) AS label FROM reach GROUP BY v),
       |groups AS (
       |  SELECT c.doc_id, coalesce(p.label, r.rep) AS group_id
       |  FROM ch c JOIN reps r ON c.ch = r.ch LEFT JOIN comp p ON p.v = r.rep)""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "d12_edit_distance_verify",
      (s, d) => {
        // Edit-distance verification of LSH candidates — the verifier used
        // for short-text/title dedup where Jaccard on shingles is too
        // coarse: candidates from any shared band (emitted once per pair
        // via the first-shared-band in-row filter — no distinct shuffle),
        // then exact levenshtein on the token-normalized strings,
        // similarity = 1 − lev/maxlen. Quadratic work only inside band
        // buckets, like every dedup stage.
        //
        // Payload-fetch direction matters: the CANDIDATE side broadcasts
        // (pairs are band-bounded and tiny next to the corpus) and the raw
        // text streams past it, so tokenization/normalization runs only on
        // the matched rows — never a corpus-side broadcast or a
        // full-corpus tokenize. (Left to stats, Catalyst broadcast the
        // whole tokenized corpus here: 2 corpus regex passes + 2 corpus
        // hash-build broadcasts, backwards at every scale.) The broadcast
        // hints are MANDATORY — Spark honors them regardless of size — so
        // past broadcastable candidate counts the scale adaptation is to
        // DROP the hints and let the same joins shuffle on doc_id; the
        // property that scales is fetch-only-candidate-payloads, not the
        // broadcast itself.
        val docs = Tables.documents(s, d)
        // cache: the band self-join consumes the signatures twice, and the
        // shingle md5 pass is the expensive part (same hygiene as d3)
        val sigs = bandSigsCached(s, d)
        val cand = bandCandidatePairs(sigs)
        val raw = docs.select(col("doc_id"), col("text"))
        val withA = broadcast(cand)
          .join(raw.select(col("doc_id").as("a"), col("text").as("xa")), Seq("a"))
        broadcast(withA)
          .join(raw.select(col("doc_id").as("b"), col("text").as("xb")), Seq("b"))
          // spread the pairs before the len² work: the streamed raw scan
          // is one split at demo scale, and file-level parallelism is the
          // wrong unit for per-PAIR quadratic cost — one cheap shuffle of
          // the skinny pair rows buys pair-level parallelism. The explicit
          // partition count matters: byte-based AQE coalescing would fold
          // this few-MB shuffle back into one task, but the cost here is
          // CPU per row (len² edit distance), not bytes — numbered
          // repartition is exempt from coalescing.
          .repartition(s.sparkContext.defaultParallelism, col("a"), col("b"))
          .select(col("a"), col("b"),
            array_join(tokens(col("xa")), " ").as("ta"),
            array_join(tokens(col("xb")), " ").as("tb"))
          .select(col("a"), col("b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("lev"),
            greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
          .withColumn("sim",
            when(col("max_len") > 0,
              round(lit(1.0) - col("lev").cast("double") / col("max_len"), 6)).otherwise(1.0))
          .withColumn("verified", col("sim") >= 0.5)
          .select(col("a"), col("b"), col("lev"), col("sim"), col("verified"))
      },
      Some(s"""WITH nt AS (SELECT doc_id, array_to_string($tokensSql, ' ') AS t FROM documents),
             |sh AS ($shingleSetSql),
             |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sh)),
             |bands AS (
             |  ${bandRowsSql("sigs")}),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |  FROM bands x JOIN bands y
             |  ON x.band_idx = y.band_idx AND x.band = y.band AND x.doc_id < y.doc_id)
             |SELECT a, b, CAST(levenshtein(na.t, nb.t) AS BIGINT) AS lev,
             |  CASE WHEN greatest(length(na.t), length(nb.t)) > 0
             |    THEN round(1.0 - CAST(levenshtein(na.t, nb.t) AS DOUBLE) / greatest(length(na.t), length(nb.t)), 6)
             |    ELSE 1.0 END AS sim,
             |  CASE WHEN greatest(length(na.t), length(nb.t)) > 0
             |    THEN round(1.0 - CAST(levenshtein(na.t, nb.t) AS DOUBLE) / greatest(length(na.t), length(nb.t)), 6)
             |    ELSE 1.0 END >= 0.5 AS verified
             |FROM cand JOIN nt na ON cand.a = na.doc_id JOIN nt nb ON cand.b = nb.doc_id""".stripMargin),
      "Edit-distance verification of LSH candidates (short-text dedup verifier): exact levenshtein on token-normalized strings, sim = 1 - lev/maxlen, banded candidates only."
    ),
    QueryDef(
      "d1_exact_dedup",
      (s, d) => {
        // keep = min doc_id per content hash; scales as one hash-partitioned
        // window (equivalently groupBy+join-back) on a 128-bit key.
        val w = Window.partitionBy(col("content_hash"))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(array_join(tokens(col("text")), " ")).as("content_hash"))
          .withColumn("keep_id", min(col("doc_id")).over(w))
          .withColumn("group_size", count(lit(1)).over(w))
          .withColumn("is_dup", (col("doc_id") =!= col("keep_id")).cast("int"))
      },
      Some(s"""SELECT doc_id, content_hash,
             |  min(doc_id) OVER (PARTITION BY content_hash) AS keep_id,
             |  count(*) OVER (PARTITION BY content_hash) AS group_size,
             |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS INTEGER) AS is_dup
             |FROM (SELECT doc_id, md5(array_to_string($tokensSql, ' ')) AS content_hash FROM documents)""".stripMargin),
      "Exact dedup on normalized content hash: representative (min doc_id) per group + dup flag."
    ),
    QueryDef(
      "d2_minhash_signatures",
      (s, d) =>
        signatures(shingleSets(s, d))
          .select(col("doc_id") +: (0 until NumMinhash).map(j => col(s"mh$j")) ++: bandCols: _*),
      Some(s"""WITH sets AS ($shingleSetSql)
             |SELECT doc_id, ${(0 until NumMinhash).map(j => s"mh$j").mkString(", ")}, $bandColsSql
             |FROM (SELECT doc_id, $minhashColsSql FROM sets)""".stripMargin),
      "MinHash signatures (8 32-bit digest-slice min-hashes over 3-gram shingles) + 4 LSH band keys per document."
    ),
    QueryDef(
      "d3_lsh_near_dup_pairs",
      (s, d) => {
        // shared cached handle: d6 and d7 consume the identical canonical
        // plan — independent .cache() calls would be CacheManager-warning
        // no-ops after the first
        val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
        val sigs = bandSigsCached(s, d)
        // bucketed candidate generation: explode band keys, equi-join per
        // (band index, band hash) bucket — the scale path; no cross join,
        // pairs kept only at their FIRST shared band (no distinct shuffle).
        // One definition of that machinery: bandCandidatePairs.
        val cands = bandCandidatePairs(sigs)
          .select(col("a").as("doc_a"), col("b").as("doc_b"))
        cands
          .join(sets.as("a"), col("doc_a") === col("a.doc_id"))
          .join(sets.as("b"), col("doc_b") === col("b.doc_id"))
          .select(col("doc_a"), col("doc_b"), size(array_intersect(col("a.sh"), col("b.sh"))).as("isect"), col("a.sh").as("sha"), col("b.sh").as("shb"))
          .select(col("doc_a"), col("doc_b"), round(jaccardFrom(col("isect"), col("sha"), col("shb")), 6).as("jaccard"))
          .filter(col("jaccard") >= JaccardThreshold)
      },
      Some(s"""WITH sets AS ($shingleSetSql),
             |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sets))
             |SELECT doc_a, doc_b, jaccard FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round(${jaccardFromSql(isectSql)}, 6) AS jaccard
             |  FROM sigs sa JOIN sigs sb ON sa.doc_id < sb.doc_id
             |    AND ${bandOrSql("sa", "sb")}
             |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id)
             |WHERE jaccard >= $JaccardThreshold""".stripMargin),
      "MinHash-LSH near-dup pairs: band-bucket join for candidates, exact Jaccard >= 0.5 verification."
    ),
    QueryDef(
      "d4_simhash",
      (s, d) => simhashed(s, d),
      Some(s"""SELECT doc_id, $simhashSql AS simhash
             |FROM (SELECT doc_id, list_transform(list_distinct(toks), t -> ${h60Sql("t")}) AS hs
             |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents))""".stripMargin),
      "SimHash: 56-bit locality-sensitive signature per document (majority vote over token-hash bits)."
    ),
    QueryDef(
      "d5_simhash_near_dup_pairs",
      (s, d) => {
        val sims = sharedCache(s, d, "simhashed")(simhashed(s, d))
        // hamming <= 3 over 56 bits ⇒ at least one of the 4 14-bit chunks is
        // identical (pigeonhole) — chunk equality is the bucketed join key.
        val chunks = sims.select(
          col("doc_id"),
          col("simhash"),
          posexplode(array((0 until 4).map(c => shiftright(col("simhash"), 14 * c).bitwiseAND(16383)): _*)).as(Seq("chunk_idx", "chunk"))
        )
        // a pair meets once per shared chunk; keep it only at its FIRST
        // shared chunk — computable in-row from the simhash xor, so no
        // distinct() (at scale that was a second full shuffle of the
        // candidate set).
        val xorCol = col("x.simhash").bitwiseXOR(col("y.simhash"))
        val firstSharedChunk = (0 until 4).reverse.foldLeft(lit(-1)) { (acc, c) =>
          when(shiftright(xorCol, 14 * c).bitwiseAND(16383) === 0, lit(c)).otherwise(acc)
        }
        chunks.as("x")
          .join(
            chunks.as("y"),
            col("x.chunk_idx") === col("y.chunk_idx") && col("x.chunk") === col("y.chunk") && col("x.doc_id") < col("y.doc_id")
          )
          .filter(col("x.chunk_idx") === firstSharedChunk)
          .select(
            col("x.doc_id").as("doc_a"),
            col("y.doc_id").as("doc_b"),
            bit_count(xorCol).as("hamming")
          )
          .filter(col("hamming") <= HammingMax)
      },
      Some(s"""WITH sims AS (
             |  SELECT doc_id, $simhashSql AS simhash
             |  FROM (SELECT doc_id, list_transform(list_distinct(toks), t -> ${h60Sql("t")}) AS hs
             |    FROM (SELECT doc_id, $tokensSql AS toks FROM documents)))
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
             |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax""".stripMargin),
      "SimHash near-dup pairs: 14-bit chunk buckets (pigeonhole-complete for hamming<=3) + hamming verify."
    ),
    QueryDef(
      "d6_jaccard_verified_groups",
      (s, d) => {
        // end-to-end dedup decision: LSH candidates → Jaccard >= 0.5 →
        // connected representative = min doc_id over each doc's neighbors
        // (single-link 1-hop approximation, deterministic).
        val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
        val sigs = bandSigsCached(s, d)
        // first-shared-band dedup, as in d3 — directed pairs here; one
        // definition of the machinery: bandCandidatePairs
        val cands = bandCandidatePairs(sigs, directed = true)
          .select(col("a").as("did"), col("b").as("nbr"))
        val verified = cands
          .join(sets.as("a"), col("did") === col("a.doc_id"))
          .join(sets.as("b"), col("nbr") === col("b.doc_id"))
          .select(col("did"), col("nbr"), size(array_intersect(col("a.sh"), col("b.sh"))).as("isect"), size(col("a.sh")).as("na"), size(col("b.sh")).as("nb"))
          .filter(round(col("isect").cast("double") / (col("na") + col("nb") - col("isect")), 6) >= JaccardThreshold)
          .select(col("did"), col("nbr"))
        verified
          .groupBy(col("did"))
          .agg(least(min(col("nbr")), col("did").cast("long")).as("rep_id"), count(lit(1)).as("n_neighbors"))
          .select(col("did").as("doc_id"), col("rep_id"), col("n_neighbors"))
      },
      Some(s"""WITH sets AS ($shingleSetSql),
             |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sets)),
             |verified AS (
             |  SELECT sa.doc_id AS doc_id, sb.doc_id AS nbr
             |  FROM sigs sa JOIN sigs sb ON sa.doc_id <> sb.doc_id
             |    AND ${bandOrSql("sa", "sb")}
             |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id
             |  WHERE round(${jaccardFromSql(isectSql)}, 6) >= $JaccardThreshold)
             |SELECT doc_id, least(min(nbr), CAST(doc_id AS BIGINT)) AS rep_id, count(*) AS n_neighbors
             |FROM verified GROUP BY doc_id""".stripMargin),
      "Near-dup group representatives: verified-neighbor min-id (deterministic 1-hop single-link)."
    ),
    QueryDef(
      "d7_dup_groups_cc",
      (s, d) => {
        // Full connected components over the verified near-dup graph —
        // transitive closure, where d6 stops at 1 hop. Iterative min-label
        // propagation (the hash-to-min pattern): each round joins labels
        // across edges and keeps the minimum; rounds needed = graph
        // diameter (dup clusters are near-cliques from band collisions, so
        // 2-3 in practice). Each round is one shuffle join + one
        // aggregation; the driver loop only reads a 1-row convergence
        // count.
        val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
        val edges = sharedCache(s, d, "fullEdges")(
          verifiedEdges(sets, Some(bandSigsCached(s, d))))
        val undirected = sharedCache(s, d, "fullUndirected")(
          edges.union(edges.select(col("b").as("a"), col("a").as("b"))))
        minLabelComponents(undirected)
          .select(col("v").as("doc_id"), col("label").as("group_id"))
      },
      Some(s"""WITH RECURSIVE sets AS ($shingleSetSql),
             |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sets)),
             |verified AS (
             |  SELECT sa.doc_id AS a, sb.doc_id AS b
             |  FROM sigs sa JOIN sigs sb ON sa.doc_id < sb.doc_id
             |    AND ${bandOrSql("sa", "sb")}
             |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id
             |  WHERE round(${jaccardFromSql(isectSql)}, 6) >= $JaccardThreshold),
             |edges AS (SELECT a, b FROM verified UNION ALL SELECT b, a FROM verified),
             |reach(v, m) AS (
             |  SELECT a AS v, a AS m FROM edges
             |  UNION
             |  SELECT e.b AS v, r.m FROM edges e JOIN reach r ON r.v = e.a)
             |SELECT v AS doc_id, min(m) AS group_id FROM reach GROUP BY v""".stripMargin),
      "Connected-components dup groups: iterative min-label propagation over verified near-dup edges (transitive closure)."
    ),
    QueryDef(
      "d14_containment_dedup",
      (s, d) => {
        // Asymmetric CONTAINMENT dedup — the excerpt/sub-document detector
        // Jaccard misses: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| is ~1 when A
        // is quoted inside B even though symmetric Jaccard is small.
        // Candidates come from the same LSH band machinery as d3/d6
        // (directed pairs, first-shared-band in-row dedup — no distinct
        // shuffle); exact containment verifies each direction separately.
        // Known recall bound, documented rather than hidden: minhash bands
        // collide by JACCARD, so containment pairs with a large size ratio
        // (tiny excerpt in a huge doc) may never band-collide — this
        // operator catches near-size containment; small-in-large detection
        // needs the t11 span-hash shapes.
        val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
        val sigs = bandSigsCached(s, d)
        val cands = bandCandidatePairs(sigs, directed = true)
          .select(col("a").as("did"), col("b").as("cid"))
        cands
          .join(sets.as("sa"), col("did") === col("sa.doc_id"))
          .join(sets.as("sb"), col("cid") === col("sb.doc_id"))
          .select(col("did"), col("cid"),
            size(array_intersect(col("sa.sh"), col("sb.sh"))).as("isect"),
            size(col("sa.sh")).as("na"))
          .withColumn("containment", round(col("isect").cast("double") / col("na"), 6))
          .filter(col("containment") >= ContainmentThreshold)
          .select(col("did").as("doc_id"), col("cid").as("container_id"), col("containment"))
      },
      Some(s"""WITH sets AS ($shingleSetSql),
             |sigs AS (SELECT doc_id, $bandColsSql FROM (SELECT doc_id, $minhashColsSql FROM sets))
             |SELECT doc_id, container_id, containment FROM (
             |  SELECT sa.doc_id AS doc_id, sb.doc_id AS container_id,
             |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS containment
             |  FROM sigs sa JOIN sigs sb ON sa.doc_id <> sb.doc_id
             |    AND ${bandOrSql("sa", "sb")}
             |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id)
             |WHERE containment >= $ContainmentThreshold""".stripMargin),
      "Asymmetric containment dedup: |A∩B|/|A| over banded candidates — flags documents largely contained in another (excerpts/quotes), which symmetric Jaccard under-scores."
    ),
    QueryDef(
      "d8_scalable_dedup",
      (s, d) => dedupGroups(s, d),
      Some(s"""WITH RECURSIVE $dedupGroupsSql
             |SELECT doc_id, group_id FROM groups""".stripMargin),
      "Scalable dedup: exact-dup collapse -> LSH near-dup CC on representatives -> group expansion (every doc labeled)."
    ),
    QueryDef(
      "d15_best_in_group",
      (s, d) => {
        // Quality-aware representative election — what production dedup
        // actually keeps: within each near-dup group (the d8 pipeline,
        // memoized, so d8/d13/d15 share one build), retain the HIGHEST
        // t3-quality member, not the arbitrary min-id. The t3 composite is
        // one shared expression ([[TextQueries.qualityScore]]) so the two
        // queries can never score differently. Deterministic tiebreak:
        // equal quality keeps the lower doc_id, via one max(struct) —
        // (quality, -doc_id) lexicographic max == ORDER BY quality DESC,
        // doc_id ASC — a partial-aggregating shape (no per-group sort).
        // Metadata-scale on top of d8: one scan for scores, one join, one
        // group agg, one join-back keyed on group_id.
        val groups = dedupGroups(s, d)
        // r19: spread the scoring scan — qualityScore's tokenize ran as the
        // scan's single task at demo file layouts (0.74 s of d15's 1.33 s
        // measured, stage-probe r19); no exchange at production split counts
        val scored = PipelineFns.spreadForCpuWork(s, d,
            Tables.documents(s, d).select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"), TextQueries.qualityScore.as("quality"))
        val jg = groups.join(scored, "doc_id")
        val best = jg
          .groupBy(col("group_id"))
          .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"))
          .select(col("group_id"), (-col("b.nid")).as("keep_id"))
        jg.join(best, "group_id")
          .select(col("doc_id"), col("group_id"), col("quality"), col("keep_id"),
            (col("doc_id") === col("keep_id")).as("keep"))
      },
      Some(s"""WITH RECURSIVE $dedupGroupsSql,
             |q AS (SELECT doc_id, ${TextQueries.qualityScoreSql} AS quality
             |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
             |jg AS (SELECT g.doc_id, g.group_id, q.quality FROM groups g JOIN q USING (doc_id)),
             |ranked AS (SELECT doc_id, group_id,
             |    row_number() OVER (PARTITION BY group_id ORDER BY quality DESC, doc_id ASC) AS rk
             |  FROM jg),
             |best AS (SELECT group_id, doc_id AS keep_id FROM ranked WHERE rk = 1)
             |SELECT jg.doc_id, jg.group_id, jg.quality, best.keep_id,
             |  jg.doc_id = best.keep_id AS keep
             |FROM jg JOIN best USING (group_id)""".stripMargin),
      "Quality-aware dedup representative election: within each d8 near-dup group keep the highest t3-quality member (min doc_id tiebreak) — the production keep rule, as one partial-aggregating max(struct)."
    ),
    QueryDef(
      "d13_leakage_safe_split",
      (s, d) => {
        // Leakage-safe train/test split: a near-dup GROUP must land wholly
        // in one split, or evaluation leaks training content through its
        // duplicates (the failure mode decontamination can't catch inside
        // one corpus). Reuses the d8 pipeline (exact collapse -> LSH CC on
        // representatives -> group expansion), then buckets each GROUP
        // representative's hash: every member inherits the group's split,
        // so the property holds by construction. Metadata-scale additions
        // on top of d8: one hash + one comparison per doc.
        val groups = dedupGroups(s, d)
        val bucket = pmod(h60(concat(lit("split1:"), col("group_id").cast("string"))), lit(10L))
        groups
          .select(col("doc_id"), col("group_id"), bucket.as("bucket"))
          .withColumn("split", when(col("bucket") < 8, lit("train")).otherwise(lit("test")))
      },
      Some(s"""WITH RECURSIVE $dedupGroupsSql
             |SELECT doc_id, group_id, bucket,
             |  CASE WHEN bucket < 8 THEN 'train' ELSE 'test' END AS split
             |FROM (SELECT doc_id, group_id,
             |    ${h60Sql("concat('split1:', CAST(group_id AS VARCHAR))")} % 10 AS bucket
             |  FROM groups)""".stripMargin),
      "Leakage-safe train/test split: dedup groups (d8 pipeline) bucketed by group-representative hash, so near-dup content can never straddle the split boundary."
    ),
    QueryDef(
      "d17_fuzzy_decontaminate",
      (s, d) => fuzzyDecontaminate(s, d),
      Some(s"""WITH sets AS ($shingleSetSql),
             |tsig AS (SELECT doc_id, $bandColsSql FROM (
             |  SELECT doc_id, $minhashColsSql FROM sets WHERE doc_id % 97 <> 0)),
             |esig AS (SELECT doc_id, $bandColsSql FROM (
             |  SELECT doc_id, $minhashColsSql FROM sets WHERE doc_id % 97 = 0)),
             |verified AS (
             |  SELECT sa.doc_id AS did, sb.doc_id AS eid,
             |    round(${jaccardFromSql(isectSql)}, 6) AS jaccard
             |  FROM tsig sa JOIN esig sb ON ${bandOrSql("sa", "sb")}
             |  JOIN sets a ON a.doc_id = sa.doc_id JOIN sets b ON b.doc_id = sb.doc_id
             |  WHERE round(${jaccardFromSql(isectSql)}, 6) >= $JaccardThreshold),
             |agg AS (SELECT did, count(*) AS n_eval_matches, max(jaccard) AS max_jaccard
             |  FROM verified GROUP BY did)
             |SELECT agg.did AS doc_id, agg.n_eval_matches, min(v.eid) AS eval_doc_id, agg.max_jaccard
             |FROM agg JOIN verified v ON v.did = agg.did AND v.jaccard = agg.max_jaccard
             |GROUP BY agg.did, agg.n_eval_matches, agg.max_jaccard""".stripMargin),
      "Fuzzy decontamination: LSH band join between training and eval sides (eval side broadcast), exact Jaccard verify >= 0.5 — catches near-duplicate contamination that fragmented overlap hides from exact n-gram detectors."
    ),
    QueryDef(
      "d18_lsh_geometry_audit",
      (s, d) => {
        // EMPIRICAL LSH geometry audit — the knob-tuning table a 100 TB
        // operator reads before committing a (minhash, bands, rows)
        // preset: per exact-Jaccard decile over a deterministic doc
        // SAMPLE, (a) the measured band-collision rate — the S-curve the
        // GraftConfigSpec property-checks analytically, observed on real
        // data — and (b) the minhash estimator's bias/error vs exact
        // Jaccard. All-pairs work happens ONLY inside the sample, and the
        // sample is PINNED: 1/17 by seeded hash, then the lowest
        // `AuditSampleCap` rows by the same hash — Limit(Sort) plans as
        // TakeOrderedAndProject (per-partition top-k, cap-row driver
        // merge), so the pair stage is O(cap²) — CONSTANT in corpus size —
        // and the broadcast side is cap-bounded, never a corpus cross
        // join (bench_scale's d18 leg measures the resulting linearity).
        // The top-k runs over a NARROW (doc_id, au) projection — the
        // TakeOrderedAndProject heaps then carry 16-byte rows, not whole
        // shingle sets — and the cap winners broadcast-semi-join back to
        // `sets` to fetch `sh` for exactly cap rows (same winners, same
        // determinism; the array payload is only ever touched cap times).
        // Determinism: per-pair values quantized to integer millionths
        // (jq, est_micro — the /NumMinhash divide is by a power of two,
        // so exact in IEEE), integer sums per decile, ONE double-divide
        // chain per output column, round 6 — the house contract.
        val sets = sharedCache(s, d, "shingleSets")(shingleSetsWide(s, d))
        val winners = sets
          .select(col("doc_id"),
            h60(concat(lit("aud:"), col("doc_id").cast("string"))).as("au"))
          .filter(pmod(col("au"), lit(AuditMod)) === 0)
          .orderBy(col("au").asc, col("doc_id").asc)
          .limit(AuditSampleCap)
          .select(col("doc_id"))
        val sample = sets.join(broadcast(winners), Seq("doc_id"))
        // r19: [[signatures]] is a pure projection over its input — the old
        // `sample.join(signatures(sample))` re-executed the cap-bounded
        // sample lineage (winners' corpus top-k + the semi-join against the
        // corpus-wide shingle cache) a second time and shuffled the join,
        // for columns derivable in-row. Project them directly: each join
        // side below now runs the corpus pass once (2 total, was 4).
        val mhArr =
          if (NumMinhash <= 8) graft.functions.minhash8(col("sh"))
          else graft.functions.minhashN(col("sh"), NumMinhash)
        val base = sample
          .withColumn("mh", mhArr)
          .select(col("doc_id") +: col("sh") +:
            (0 until NumMinhash).map(j => element_at(col("mh"), j + 1).as(s"mh$j")): _*)
          .select(col("doc_id") +: col("sh") +:
            (0 until NumMinhash).map(j => col(s"mh$j")) ++: bandCols: _*)
        val l = base.select(base.columns.map(c => col(c).as("l_" + c)).toIndexedSeq: _*)
        val r = base.select(base.columns.map(c => col(c).as("r_" + c)).toIndexedSeq: _*)
        // balanced reduction, not a left-deep fold: at the capacity preset
        // this is a 128-term sum, and depth-128 expression chains break
        // DuckDB's binder (recursion cap 128) and deepen Spark codegen for
        // nothing — a log-depth tree is identical arithmetic
        def balSum(ts: Seq[Column]): Column =
          if (ts.size == 1) ts.head
          else { val (a, b) = ts.splitAt(ts.size / 2); balSum(a) + balSum(b) }
        val estMatches = balSum((0 until NumMinhash)
          .map(j => when(col(s"l_mh$j") === col(s"r_mh$j"), 1L).otherwise(0L)))
        val bandHit = (0 until NumBands)
          .map(b => col(s"l_band$b") === col(s"r_band$b"))
          .reduce(_ || _)
        val pairs = l.join(broadcast(r), col("l_doc_id") < col("r_doc_id"))
          .withColumn("isect", size(array_intersect(col("l_sh"), col("r_sh"))))
          .withColumn("uni", size(col("l_sh")) + size(col("r_sh")) - col("isect"))
          .filter(col("uni") > 0)
          .withColumn("jq",
            round(col("isect").cast("double") / col("uni") * lit(1000000.0)).cast("long"))
          .withColumn("est_micro",
            round(estMatches * lit(1000000.0) / lit(NumMinhash)).cast("long"))
          .withColumn("collide", when(bandHit, 1L).otherwise(0L))
          .withColumn("decile",
            least(lit(9L), floor(col("jq").cast("double") / lit(100000.0)).cast("long")))
        pairs.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("collide")).as("hits"),
            sum(col("est_micro")).as("se"), sum(col("jq")).as("sx"),
            sum(abs(col("est_micro") - col("jq"))).as("serr"))
          .select(col("decile"), col("n_pairs"),
            round(col("hits").cast("double") / col("n_pairs").cast("double"), 6).as("band_hit_rate"),
            round(col("se").cast("double") / (col("n_pairs").cast("double") * lit(1000000.0)), 6).as("avg_est"),
            round(col("sx").cast("double") / (col("n_pairs").cast("double") * lit(1000000.0)), 6).as("avg_exact"),
            round(col("serr").cast("double") / (col("n_pairs").cast("double") * lit(1000000.0)), 6).as("avg_abs_err"))
      },
      Some(s"""WITH sets AS ($shingleSetSql),
             |samp AS (SELECT doc_id, sh FROM (
             |  SELECT doc_id, sh, ${h60Sql("concat('aud:', CAST(doc_id AS VARCHAR))")} AS au FROM sets)
             |  WHERE au % $AuditMod = 0
             |  ORDER BY au ASC, doc_id ASC LIMIT $AuditSampleCap),
             |sig AS (SELECT doc_id, sh, $minhashColsSql FROM samp),
             |sigb AS (SELECT doc_id, sh, ${(0 until NumMinhash).map(j => s"mh$j").mkString(", ")}, $bandColsSql FROM sig),
             |pairs AS (SELECT
             |    ${balSumSql((0 until NumMinhash).map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END"))} AS est_matches,
             |    CASE WHEN ${bandOrSql("a", "b")} THEN 1 ELSE 0 END AS collide,
             |    $isectSql AS isect, len(a.sh) AS na, len(b.sh) AS nb
             |  FROM sigb a JOIN sigb b ON a.doc_id < b.doc_id),
             |scored AS (SELECT collide,
             |    CAST(round(CAST(isect AS DOUBLE) / (na + nb - isect) * 1000000.0) AS BIGINT) AS jq,
             |    CAST(round(est_matches * 1000000.0 / $NumMinhash) AS BIGINT) AS est_micro
             |  FROM pairs WHERE (na + nb - isect) > 0),
             |agg AS (SELECT
             |    LEAST(9, CAST(floor(CAST(jq AS DOUBLE) / 100000.0) AS BIGINT)) AS decile,
             |    count(*) AS n_pairs, sum(collide) AS hits, sum(est_micro) AS se,
             |    sum(jq) AS sx, sum(abs(est_micro - jq)) AS serr
             |  FROM scored GROUP BY 1)
             |SELECT decile, n_pairs,
             |  round(CAST(hits AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6) AS band_hit_rate,
             |  round(CAST(se AS DOUBLE) / (CAST(n_pairs AS DOUBLE) * 1000000.0), 6) AS avg_est,
             |  round(CAST(sx AS DOUBLE) / (CAST(n_pairs AS DOUBLE) * 1000000.0), 6) AS avg_exact,
             |  round(CAST(serr AS DOUBLE) / (CAST(n_pairs AS DOUBLE) * 1000000.0), 6) AS avg_abs_err
             |FROM agg""".stripMargin),
      "Empirical LSH geometry audit on a deterministic doc sample: measured band-collision S-curve + minhash estimator bias/error per exact-Jaccard decile — the tuning table for committing a (minhash, bands, rows) preset."
    ),
    QueryDef(
      "d20_dedup_cluster_profile",
      (s, d) => {
        // Dedup-mass audit — the corpus-health report a 100 TB dedup run
        // emits alongside its output: duplicate-cluster size distribution
        // over the d8 group pipeline (exact-collapse → LSH near-dup CC),
        // bucketed by cluster size class, with the redundant-doc count
        // (what dedup removes) per class. Answers the two operational
        // questions: how much corpus mass is duplicated, and is it spread
        // thin (many small clusters — banding is doing the work) or
        // concentrated (few giant clusters — boilerplate/mirror pathology
        // that wants a skew guard). Reuses the MEMOIZED group pipeline —
        // d8/d13/d20 share one band join + verify + CC run per session —
        // and adds only a groups-count aggregate (group-count rows) plus a
        // 4-row bucket rollup: observability at the cost of a rollup, not
        // a second dedup.
        val sizes = dedupGroups(s, d)
          .groupBy(col("group_id")).agg(count(lit(1)).as("sz"))
        sizes
          .withColumn("bucket",
            when(col("sz") === 1, "1_unique")
              .when(col("sz") <= 4, "2_small_2_4")
              .when(col("sz") <= 16, "3_medium_5_16")
              .otherwise("4_large_17_plus"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_groups"),
            sum(col("sz")).as("n_docs"),
            sum(col("sz") - 1).as("n_redundant"))
      },
      Some(s"""WITH RECURSIVE $dedupGroupsSql,
             |gsz AS (SELECT group_id, count(*) AS sz FROM groups GROUP BY group_id)
             |SELECT bucket, count(*) AS n_groups, CAST(sum(sz) AS BIGINT) AS n_docs,
             |  CAST(sum(sz - 1) AS BIGINT) AS n_redundant
             |FROM (SELECT CASE WHEN sz = 1 THEN '1_unique'
             |    WHEN sz <= 4 THEN '2_small_2_4'
             |    WHEN sz <= 16 THEN '3_medium_5_16'
             |    ELSE '4_large_17_plus' END AS bucket, sz FROM gsz)
             |GROUP BY bucket""".stripMargin),
      "Dedup-mass audit: duplicate-cluster size distribution over the d8 group pipeline with per-class redundant-doc counts — the corpus-health report that distinguishes thin-spread duplication from mirror/boilerplate pathology."
    ),
    QueryDef(
      "d21_cross_source_overlap",
      (s, d) => {
        // Cross-source overlap MATRIX — the corpus-governance report a
        // multi-source 100 TB assembly runs before mixing: for every
        // source pair, the Jaccard similarity of their distinct 5-gram
        // shingle sets. High overlap between two sources means the mixer
        // is double-counting the same content under two names (a mirror,
        // a re-crawl, a filtered subset shipped as a new dataset) — the
        // duplication pressure dedup will pay for and the mixing weights
        // silently distort. Scale shape — ONE corpus-scale shuffle total
        // (the round-15 form shuffled the DISTINCT (shingle, source) set
        // three times — distinct + a self-join's two sides — and was the
        // catalog's one scale-killer: 1937× input→shuffle amplification,
        // 449 MB peak task at ×10): the exploded (source, shingle) rows
        // partial-aggregate map-side into per-shingle source SETS (each
        // bounded by |sources|, so collect_set state is tiny), pairs are
        // expanded IN-ROW from the sorted set (≤ |sources|²/2 per
        // shingle, never an O(n²) doc join), and the per-source distinct
        // counts fall out of the same aggregated frame — every post-
        // shuffle relation is metadata-scale. Output is |sources|²/2 rows
        // at any corpus size; per-source set sizes ride back on a
        // broadcast. The 100 TB governance path is d22's sketch (one
        // scan, |sources|×128 rows of shuffle); this exact form is the
        // small-corpus audit that calibrates it.
        // r18: spread the scan before the 5-gram shingle explode — the
        // whole tokenize+shingle+partial-collect pass ran as the scan
        // stage's single task at demo file layouts (4.8 of 5.7 s measured
        // at sf0.1/32 cores); at production split counts spreadForCpuWork
        // adds no exchange (see PipelineFns.spreadForCpuWork)
        // r19: ONE corpus pass, fused. The r18 form consumed srcSets from
        // TWO branches (per-source distinct counts + the pair expansion),
        // and an uncached diamond re-executes its lineage per consumer —
        // the corpus-scale string-shingle shuffle ran TWICE per execution
        // (the dominant ×10 cost). Fused: each shingle's sorted source set
        // emits its pair structs AND one (s, s) singleton struct per
        // member in the same in-row projection, one tiny groupBy counts
        // both (keys never collide — pairs have a < b), and two
        // |sources|²-row windows attach the per-source totals where the
        // old shape broadcast-joined a second corpus pass. Oracle SQL
        // unchanged — same rows out.
        val srcSets = PipelineFns.spreadForCpuWork(s, d,
            Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
            col("doc_id"))
          .select(col("source"),
            explode(array_distinct(shingles(tokens(col("text")), 5))).as("sg"))
          .groupBy(col("sg"))
          .agg(sort_array(collect_set(col("source"))).as("srcs"))
        val counts = srcSets
          .select(explode(concat(
            transform(col("srcs"), x => struct(x.as("source_a"), x.as("source_b"))),
            flatten(transform(col("srcs"), (x, i) =>
              transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
                y => struct(x.as("source_a"), y.as("source_b"))))))).as("p"))
          .select(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n"))
        val perA = max(when(col("source_a") === col("source_b"), col("n")))
          .over(Window.partitionBy(col("source_a")))
        val perB = max(when(col("source_a") === col("source_b"), col("n")))
          .over(Window.partitionBy(col("source_b")))
        counts
          .withColumn("n_a", perA)
          .withColumn("n_b", perB)
          .filter(col("source_a") =!= col("source_b"))
          .select(col("source_a"), col("source_b"), col("n").as("n_shared"),
            col("n_a"), col("n_b"),
            round(col("n").cast("double") /
              (col("n_a") + col("n_b") - col("n")), 6).as("jaccard"))
      },
      Some(s"""WITH sh AS (SELECT DISTINCT source, unnest(${shinglesSql("toks", 5)}) AS sg
             |  FROM (SELECT source, $tokensSql AS toks FROM documents)),
             |per AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
             |pairs AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
             |  FROM sh a JOIN sh b ON a.sg = b.sg AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT p.source_a, p.source_b, CAST(p.n_shared AS BIGINT) AS n_shared,
             |  CAST(pa.n_sh AS BIGINT) AS n_a, CAST(pb.n_sh AS BIGINT) AS n_b,
             |  round(CAST(p.n_shared AS DOUBLE) / (pa.n_sh + pb.n_sh - p.n_shared), 6) AS jaccard
             |FROM pairs p
             |JOIN per pa ON pa.source = p.source_a
             |JOIN per pb ON pb.source = p.source_b""".stripMargin),
      "Cross-source overlap matrix (exact): per source pair, Jaccard of distinct 5-gram shingle sets — the governance report that exposes mirrors/re-crawls double-counted under two source names; ONE corpus-scale shuffle (map-side partial collect_set into per-shingle source sets, in-row sorted-pair expansion bounded by |sources|), |sources|²-row output at any corpus size. The 100 TB path is d22's sketch; this is the exact small-corpus audit."
    ),
    QueryDef(
      "d22_overlap_sketch",
      // r19: spread before the fused shingle→minhash kernel — the 128-perm
      // signature pass ran as the scan's single task at demo file layouts
      // (t15/t18 rationale); the partial element-wise min still reduces to
      // |sources|×128 longs of shuffle at any corpus size, and no exchange
      // is added at production split counts. The incremental loop's
      // bounded source-add leg calls sourceSketchSignatures directly and
      // is unaffected.
      (s, d) => overlapSketchMatrix(PipelineFns.spreadForCpuWork(s, d,
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
        col("doc_id"))),
      Some(overlapSketchSql),
      "Cross-source overlap matrix (sketched, the 100 TB governance path): per-source 128-perm MinHash signatures built by min-aggregation in ONE corpus scan (the d2 fused signature kernel, partial-agg to |sources|×128 values of shuffle at ANY corpus size), pairwise Jaccard estimated from signature agreement — deterministic integer math, so the DuckDB oracle replays the identical mins; d21 stays the exact small-corpus audit that calibrates the estimator."
    )
  )

  // ------------------------------------------------ d22 sketch machinery
  // Exposed as library functions (not just the QueryDef body) because the
  // signature is MERGEABLE STATE: element-wise min over any partition of
  // the corpus equals the whole-corpus signature, which is what lets the
  // incremental loop fold a NEW source's signature into a persisted
  // signature table and emit the updated overlap row with bytes read
  // bounded by the new source (IncrementalDemo; fold == recompute pinned
  // in DedupSketchSpec).

  /** Signature length of the cross-source overlap sketch — fixed at 128
    * independent 2-universal slices ([[graft.functions.MinHashN]])
    * regardless of preset: the sketch is a governance estimator whose
    * ±1/√128 ≈ 9% standard error is the product contract, not an LSH
    * geometry knob. A CONSTANT VALUE DEFINITION (`final`, no type
    * ascription) on purpose: `defs` — an object-init `val` — builds the
    * d22 oracle SQL from it, and an ordinary field would still be 0 at
    * that point (declared below `defs`), silently generating a 0-perm
    * sketch; the constant is inlined at use sites instead.
    */
  final val SketchPerms = 128

  /** Per-source MinHash sketch signatures over distinct 5-gram shingle
    * digests: `(source, sig: array<long>[SketchPerms])`. One corpus scan
    * (fused shingle→minhash kernels), then a partial-aggregating
    * element-wise min to |sources| rows — min over docs of per-doc minima
    * IS the min over the source's distinct shingle set (min is duplicate-
    * blind and monotone under union), so the shuffle moves |sources|×128
    * longs at any corpus size.
    */
  def sourceSketchSignatures(docs: DataFrame): DataFrame = {
    val docSig = docs
      .select(col("source"), graft.functions.shingleHashes(col("text"), 5).as("sh"))
      .select(col("source"), graft.functions.minhashN(col("sh"), SketchPerms).as("mh"))
    val aggs = (0 until SketchPerms).map(j => min(element_at(col("mh"), j + 1)).as(s"mh$j"))
    docSig.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
      .select(col("source"),
        array((0 until SketchPerms).map(j => col(s"mh$j")): _*).as("sig"))
  }

  /** Fold signature frames `(source, sig)` into one: element-wise min per
    * source — the mergeable-state half of the incremental overlap matrix
    * (a source present in several frames merges; a new source lands as
    * its own row). Inputs are |sources|-row metadata frames.
    */
  def mergeSketchSignatures(sigs: DataFrame*): DataFrame = {
    val all = sigs.reduce(_ unionByName _)
    val aggs = (0 until SketchPerms).map(j => min(element_at(col("sig"), j + 1)).as(s"mh$j"))
    all.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
      .select(col("source"),
        array((0 until SketchPerms).map(j => col(s"mh$j")): _*).as("sig"))
  }

  /** Pairwise estimated Jaccard from signature agreement: the standard
    * MinHash estimator (fraction of agreeing components). Input is the
    * |sources|-row signature frame, so the i<j pair expansion is a
    * broadcast nested-loop over metadata — never corpus-scale.
    */
  def overlapMatrixFromSignatures(sigs: DataFrame): DataFrame = {
    val a = sigs.select(col("source").as("source_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("source").as("source_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .withColumn("n_agree", aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v))
      .select(col("source_a"), col("source_b"), col("n_agree"),
        round(col("n_agree").cast("double") / SketchPerms, 6).as("est_jaccard"))
  }

  /** The d22 operator: sketch signatures → estimated overlap matrix. */
  def overlapSketchMatrix(docs: DataFrame): DataFrame =
    overlapMatrixFromSignatures(sourceSketchSignatures(docs))

  private def overlapSketchSql: String = {
    val sigCols = (0 until SketchPerms).map(j =>
      s"min(list_min(list_transform(sh, h -> ${graft.functions.MinHashN.sliceSql(SketchPerms, j)}))) AS mh$j")
      .mkString(",\n    ")
    val agree = balSumSql((0 until SketchPerms).map(j =>
      s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END"))
    s"""WITH sh AS (SELECT source, list_distinct(list_transform(${shinglesSql("toks", 5)}, x -> ${h60Sql("x")})) AS sh
       |  FROM (SELECT source, $tokensSql AS toks FROM documents)),
       |sig AS (SELECT source,
       |    $sigCols
       |  FROM sh GROUP BY source)
       |SELECT source_a, source_b, n_agree,
       |  round(CAST(n_agree AS DOUBLE) / $SketchPerms, 6) AS est_jaccard
       |FROM (SELECT a.source AS source_a, b.source AS source_b,
       |    CAST($agree AS BIGINT) AS n_agree
       |  FROM sig a JOIN sig b ON a.source < b.source)""".stripMargin
  }
}
