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
    def live(df: DataFrame): Boolean =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    m.get(key) match {
      case Some(df) if live(df) => df
      case _ => m.synchronized {
        m.get(key).filter(live).getOrElse {
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
          if (eagerMaterialize) df.count()
          m.put(key, df)
          df
        }
      }
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
    memo.remove((s, d)).foreach(_.values.foreach(_.unpersist()))
}
