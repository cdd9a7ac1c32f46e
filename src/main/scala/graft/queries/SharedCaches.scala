package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, corpus-dir) registry of cached lineages shared across
  * catalog queries — the in-session equivalent of a materialized artifact
  * (the dedup pipeline's shingle sets, the IVF codebooks).
  *
  * Why a registry instead of per-query `.cache()`: several catalog entries
  * consume the SAME canonical plan (d3/d6/d7 all start from the shingle-set
  * scan; v6/v7/v10/v12 all start from a centroid codebook) — an independent
  * `.cache()` in each would make every call after the first a CacheManager
  * no-op that still logs "Asked to cache already cached data", noise
  * indistinguishable from a real double-caching bug. One registry hands
  * every consumer the same cached handle and gives [[release]] the handles
  * it needs to unpersist. Entries of stopped sessions are evicted on access
  * so repeated create/stop cycles (test suites, repeated Verify mains in
  * one JVM) don't pin dead lineages.
  *
  * Why the codebooks NEED this (not just dedup): a k-row centroid table is
  * referenced several times inside one query (coarse slice, fine→group map,
  * two argmin joins), and when it is itself the output of unrolled Lloyd
  * rounds each reference re-executes the whole training lineage — the plan
  * tree multiplies per reference per round (the ×10 corpus probe measured a
  * 654-exchange / 352-scan single-query plan before this seam). Caching the
  * k rows collapses every reference to one in-memory scan — the in-session
  * analog of serving the codebook from its parquet ([[IvfCentroids.save]]),
  * which is what a real deployment does at 100 TB.
  */
object SharedCaches {

  /** When false, [[get]] registers lineages WITHOUT the eager
    * materialization pass — for plan-only audits (PlanAudit builds all
    * catalog queries just to inspect their plans; paying a real pipeline
    * job per corpus dir for that would dominate the audit). Leave true for
    * any JVM that EXECUTES catalog queries: the eager pass is what prevents
    * concurrent consumers racing to compute the same cached partitions.
    */
  @volatile private[graft] var eagerMaterialize: Boolean = true

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), scala.collection.concurrent.TrieMap[String, DataFrame]]

  def get(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame = {
    memo.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    val m = memo.getOrElseUpdate((s, d), scala.collection.concurrent.TrieMap.empty)
    // Fast path without locking; the build itself runs under the map's
    // lock because TrieMap.getOrElseUpdate does NOT evaluate its thunk
    // atomically — two driver threads first-touching the same key would
    // both build+cache+count (duplicate jobs AND the plan-identical
    // second .cache() logs the CacheManager warning this registry
    // exists to eliminate). Builds are rare; serializing them per
    // (session, dir) is free.
    // SELF-HEALING membership test: a memoized handle is only valid while
    // its plan is still registered with the CacheManager. An external
    // `spark.catalog.clearCache()` (harness hygiene, an operator clearing
    // storage on a long-lived session) drops the cached data WITHOUT
    // telling this registry — a stale memo would then hand every consumer
    // an uncached lineage that silently recomputes per execution, forever.
    // `df.storageLevel` asks the CacheManager, so a lost cache is detected
    // and rebuilt on next access (CacheLifecycleSpec pins both paths).
    // Truncated handles ([[getTruncated]]) are CacheManager-backed like
    // every other handle, so clearCache() invalidates them too and the
    // rebuild path below re-runs the build (re-checkpointing); the stale
    // handle's own storage — including the checkpointed RDD beneath a
    // truncated one, which clearCache() does NOT touch — is dropped
    // explicitly before the replacement lands, or its MEMORY_AND_DISK
    // blocks would stay pinned once per clearCache cycle.
    m.get(key) match {
      case Some(df) if live(df) => df
      case _ => m.synchronized {
        m.get(key).filter(live).getOrElse {
          m.get(key).foreach(dropStorage)
          val df = build.cache()
          // Materialize EAGERLY: every registered lineage is consumed by at
          // least two downstream stages (that's why it's cached), and when
          // those stages run concurrently inside one job they race to compute
          // the same cached partitions — one task wins the BlockManager write,
          // the rest log "Block already exists" after doing the work twice.
          // One up-front pass turns all consumers into pure cache readers.
          // Tradeoff, deliberate: the first CONSTRUCTION of a registered
          // query per (session, dir) runs this job — plan-only inspection
          // pays one materialization. The catalog is an execution surface
          // (Verify/Bench run everything they build); plan-only audits
          // (PlanAudit) flip [[eagerMaterialize]] off instead.
          // Truncated frames ([[getTruncated]]) ALSO go through this
          // cache: the InMemoryRelation recomputes ACCURATE statistics on
          // materialization (a bare LogicalRDD defaults to
          // defaultSizeInBytes = huge, which silently demoted every
          // stats-based auto-broadcast of the k-row codebooks to
          // sort-merge joins — caught by PlanSpec), and its cachedPlan is
          // the tiny LogicalRDD scan, so plan renders stay O(consumer).
          // The columnar copy over the checkpoint blocks is deliberate;
          // the frames registered truncated are codebook/assignment-scale.
          if (eagerMaterialize) df.count()
          m.put(key, df)
          df
        }
      }
    }
  }

  /** As [[get]], but in EXECUTING JVMs the built lineage is truncated to an
    * eager `localCheckpoint` before registration, so the registered frame's
    * plan is a LogicalRDD leaf instead of the full build tree.
    *
    * Why (r18, measured at the ×10 capacity preset): the embedding cache
    * CHAIN (seed → unrolled Lloyd rounds → trained codebook → assignment →
    * labeled → histogram) gives every consumer a ~3,900-node analyzed tree
    * and nested InMemoryRelations whose cachedPlans render each other —
    * and AQE posts a FULL `explainString` + SparkPlanInfo per stage
    * update, so v6 spent ~4.2 of its 4.9 s warm runtime in
    * `TreeNode.generateTreeString` (driver thread sampling; AQE-off A/B
    * 4.9 → 0.65 s). Truncating each link makes every render/canonicalize
    * walk O(consumer), not O(whole training history). The checkpointed
    * frame is then cached like every other handle — the InMemoryRelation
    * recomputes ACCURATE statistics (a bare LogicalRDD estimates
    * defaultSizeInBytes = huge, which demoted the k-row codebooks'
    * stats-based auto-broadcasts to sort-merge joins), at the cost of a
    * columnar copy over the checkpoint blocks — acceptable for the
    * codebook/assignment-scale frames registered this way.
    *
    * Plan-only JVMs ([[eagerMaterialize]] false — PlanAudit) register the
    * RAW lineage instead: under AQE, constructing a checkpoint's RDD
    * materializes the build's exchanges (stage jobs), exactly the cost a
    * plan-only audit must not pay. Those JVMs never execute, so the big
    * tree costs them only plan-print time.
    *
    * Trade-off, deliberate: a truncated handle loses lineage — an evicted
    * block is an error, not a recompute (acceptable for session-lifetime
    * serving state in one JVM, the same rationale as the incremental
    * band-claim localCheckpoint). Liveness is CacheManager-backed like any
    * other handle, so `spark.catalog.clearCache()` invalidates it and the
    * next access rebuilds (re-running the build and re-checkpointing);
    * the replaced handle's checkpoint RDD is unpersisted by the rebuild
    * path, and release() unpersists it explicitly.
    */
  def getTruncated(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame =
    get(s, d, key)(if (eagerMaterialize) build.localCheckpoint(true) else build)

  /** Liveness: every handle (truncated or not) is CacheManager-backed. */
  private def live(df: DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  /** Drop a handle's storage: the columnar cache, plus — for truncated
    * handles — the checkpointed RDD beneath it (unpersisting only the
    * cache would leave the checkpoint blocks pinned per release cycle).
    */
  private def dropStorage(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Handles currently registered for (session, dir) — lifecycle-spec hook
    * (storage-level assertions need the exact frames).
    */
  private[graft] def handles(s: SparkSession, d: String): Map[String, DataFrame] =
    memo.get((s, d)).map(_.toMap).getOrElse(Map.empty)

  /** Unpersist and evict every cached lineage registered for (session, dir).
    * Verify/Bench mains skip this — session-lifetime caches are the point
    * there — but a long-lived production session calls it (via
    * [[DedupQueries.release]]) after materializing downstream results, or
    * storage accumulates one pipeline per corpus dir touched.
    */
  def release(s: SparkSession, d: String): Unit =
    memo.remove((s, d)).foreach(_.values.foreach(dropStorage))
}
