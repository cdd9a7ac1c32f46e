package graft.queries

import graft.SparkEntry
import graft.vlm.SparkSpec

/** The determinism contract, tested directly: query results must be
  * IDENTICAL under different shuffle partitionings (the engine's claim that
  * no checked output depends on merge order, tie luck, or partition count —
  * what makes results reproducible on any cluster size).
  *
  * Representative queries cover each risk class: float rounding after
  * aggregation (a5), top-k ties (v1, w1), LSH candidate generation (d3),
  * multi-stage dedup (d8), window prefix sums (t8), the PQ argmin (v8 —
  * min_by partial aggregation since round 4), the bucketed range-join
  * rewrite (j_range_rewrite), salted joins (j_salted), and the LM
  * surprisal trains (t14/t15: vocabulary aggregation + join-back).
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val names = Seq(
    "a5_stats_profile", "v1_knn_bruteforce", "w1_rank_topk",
    "d3_lsh_near_dup_pairs", "d8_scalable_dedup", "t8_token_packing", "v8_pq_codes",
    "j_range_rewrite", "j_salted_skew_join", "t14_unigram_surprisal", "t15_bigram_surprisal",
    "m9_decay_halflife",
    // round 6: pinned-vocab BPE encode (distinct-word cache join-back),
    // the AP sweep (nano-unit integer term sums are the invariance claim),
    // the two-level top-k rank join, and the ANN recall join
    "t16a_bpe_encode", "g22_ap_sweep", "t13_bpe_merge_candidates", "v11_ann_recall",
    // late round 6: the flipped-direction AP sweep, the in-row 9x9 ADD-S
    // min, the leakage-safe split (group assignment must not depend on
    // partitioning), PII scrub counts, and keyframe selection ties
    "g23_ap_add_sweep", "g24_add_sym", "d13_leakage_safe_split",
    "t17_pii_scrub", "mm6_keyframes",
    // round 7: containment dedup (directed band candidates + ratio round),
    // 8-gram novelty (digest-keyed document-frequency window), and the
    // azimuth-cosine viewpoint sweep
    "d14_containment_dedup", "t18_ngram_novelty", "g25_viewpoint_sweep",
    "g26_polar_sweep",
    // quality-aware representative election: the max(struct) tiebreak must
    // not depend on partitioning
    "d15_best_in_group")

  private def resultSet(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("results are identical under shuffle.partitions = 3 and 32") {
    for (name <- names) {
      val conf = spark.conf
      val prev = conf.get("spark.sql.shuffle.partitions")
      try {
        // Drop every materialized cache before each run: memoized pipelines
        // (d8/d13's shared dedup groups) and plan-identical .cache() calls
        // would otherwise hand the second run the FIRST run's materialized
        // intermediates (CacheManager matches canonicalized plans, not
        // DataFrame instances) and make the comparison vacuous.
        conf.set("spark.sql.shuffle.partitions", "3")
        spark.catalog.clearCache()
        val r3 = resultSet(name)
        conf.set("spark.sql.shuffle.partitions", "32")
        spark.catalog.clearCache()
        val r32 = resultSet(name)
        assert(r3 == r32, s"$name differs across partitionings")
        assert(r3.nonEmpty, s"$name returned no rows")
      } finally conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("d8's dedup pipeline is partition-invariant on a FRESH lineage") {
    // The catalog's d8/d13 share a memoized dedupGroups; the loop above
    // re-executes that one lineage (iteration count of the CC loop fixed at
    // build time). This builds the pipeline from scratch under each
    // partitioning, so LSH banding, Jaccard verification, AND the CC loop's
    // convergence path all run per-conf.
    def groups(): Seq[String] = {
      spark.catalog.clearCache()
      DedupQueries.buildDedupGroups(spark, sf)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "3")
      val r3 = groups()
      conf.set("spark.sql.shuffle.partitions", "32")
      val r32 = groups()
      assert(r3 == r32, "fresh dedupGroups differs across partitionings")
      assert(r3.nonEmpty)
    } finally { conf.set("spark.sql.shuffle.partitions", prev); spark.catalog.clearCache() }
  }
}
