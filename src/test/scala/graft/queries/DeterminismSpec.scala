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
    "t16a_bpe_encode", "g22_ap_sweep", "t13_bpe_merge_candidates", "v11_ann_recall")

  private def resultSet(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("results are identical under shuffle.partitions = 3 and 32") {
    for (name <- names) {
      val conf = spark.conf
      val prev = conf.get("spark.sql.shuffle.partitions")
      try {
        conf.set("spark.sql.shuffle.partitions", "3")
        val r3 = resultSet(name)
        conf.set("spark.sql.shuffle.partitions", "32")
        val r32 = resultSet(name)
        assert(r3 == r32, s"$name differs across partitionings")
        assert(r3.nonEmpty, s"$name returned no rows")
      } finally conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
