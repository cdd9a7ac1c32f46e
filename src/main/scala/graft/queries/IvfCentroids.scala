package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Offline IVF centroid trainer: deterministic sampled-Lloyd k-means over
  * quantized integer vectors.
  *
  * Every step is exact integer (or single-IEEE-op) arithmetic, so training
  * is bit-reproducible across engines, partitionings, and runs — the same
  * determinism contract as the rest of the embedding stack:
  *  - init: the k lowest-vec_id vectors (deterministic seed);
  *  - assign: nearest centroid by exact integer squared L2, ties broken by
  *    centroid id;
  *  - update: element-wise floor(sum / n) over the assigned sample (sums and
  *    counts are exact; the one divide is a single IEEE op on magnitudes far
  *    inside double exactness); empty cells keep their previous centroid;
  *  - sample: `vec_id % sampleMod == 0` — deterministic, and at 100 TB the
  *    sample is what makes Lloyd tractable (full-corpus assignment happens
  *    once at index-build time, not per iteration).
  *
  * At scale this runs as its own job ([[save]]) and the serving path loads
  * the codebook parquet ([[load]]) as a broadcast dimension; the v6 query
  * trains inline on the (tiny) sample so the DuckDB oracle can mirror the
  * unrolled iterations in SQL.
  */
object IvfCentroids {

  /** Exact integer squared L2 via ‖a−b‖² = ‖a‖² + ‖b‖² − 2·a·b (three
    * codegen'd LongDot loops, no per-row zipped array).
    */
  def l2(a: Column, b: Column): Column =
    graft.functions.longDot(a, a) + graft.functions.longDot(b, b) -
      lit(2L) * graft.functions.longDot(a, b)

  /** Train on `quantized` (`vec_id: long, q: array<long>`): k centroids as
    * (cid, cq). Plans `iters` unrolled assign+update rounds — iters is a
    * small constant (Lloyd on a sample converges in a few rounds; the plan
    * grows linearly with it).
    */
  def train(quantized: DataFrame, k: Int, iters: Int, sampleMod: Int): DataFrame =
    train(quantized,
      quantized.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("q").as("cq")),
      iters, sampleMod)

  /** Train from an explicit `(cid, cq)` seed — the entry point for
    * data-adaptive cell budgets (the caller caps the seed by corpus size).
    */
  def train(quantized: DataFrame, seed: DataFrame, iters: Int, sampleMod: Int): DataFrame = {
    val sample = quantized.filter(col("vec_id") % sampleMod === 0)
      .select(col("vec_id"), col("q"))
    var cent = seed
    for (_ <- 0 until iters) {
      // nearest-centroid argmin as a min_by AGGREGATION, not a row_number
      // window: partial aggregation collapses the k joined copies of each
      // vector map-side (they are co-located — the join is broadcast) and
      // drops the centroid vector before the shuffle, where a window would
      // shuffle+sort all k·n expanded rows. struct(dist, cid) is a total
      // order (cid unique), so the result is tie-free deterministic.
      val assigned = sample.join(broadcast(cent))
        .withColumn("dist", l2(col("q"), col("cq")))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("cid"), col("q")), struct(col("dist"), col("cid"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.q").as("q"))
      val means = assigned.groupBy(col("cid"))
        .agg(graft.functions.LongVecSum.column(col("q")).as("sv"), count(lit(1)).as("n"))
        .select(col("cid"),
          transform(col("sv"), x => floor(x.cast("double") / col("n")).cast("long")).as("mq"))
      cent = cent.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mq"), col("cq")).as("cq"))
    }
    // No .cache() here: train() runs at query-CONSTRUCTION time for every
    // build of v6 (Verify, Bench, plan sweeps), so a cache would leak a
    // CacheManager entry per build; measured benefit was nil (the rounds
    // are k-row plans). At real scale the codebook is persisted via
    // [[save]] and served from parquet, not recomputed per query.
    cent
  }

  /** First-`k` seed `(cid, cq)` capped at `least(k, max(1,
    * floor(sqrt(n / 2))))` — √-scaling, the cost-balance point for the
    * flat-codebook workloads this seam feeds. Cell count C trades the two
    * halves of every IVF-family query against each other: broadcast-argmin
    * assignment costs n·C distance terms, within-cell work (SemDeDup
    * pairs, probe rerank) costs ~n²/(2C), and n·C + n²/(2C) is minimized
    * at C = √(n/2), making BOTH halves O(n^1.5) instead of one of them
    * quadratic. The previous constant-occupancy cap (n/39) pinned cell
    * size instead — linear within-cell work, but C ∝ n made assignment
    * O(n²/39), and the ×10 full-catalog bench measured exactly that knee
    * (v7 ~50× for ×10 data; v6/v10/v12 inflated the same way). The faiss
    * guideline (4√n..16√n cells) is the same √ law shifted toward serving
    * throughput, where assignment is amortized per query, not paid over
    * the whole corpus per run.
    *
    * Also the small-corpus guard: without the cap, a capacity-sized `k`
    * against a small corpus seeds EVERY vector as a centroid and
    * assignment goes quadratic. Declarative (broadcast 1-row count;
    * `count(lit(1))` references no columns, so the parquet scan answers
    * from footer row counts). The configured budget `k` binds only past
    * n = 2k² (NumCells=1e5 → n = 2·10¹⁰), where the broadcast-size
    * ceiling takes over.
    */
  def cappedSeed(quantized: DataFrame, k: Int): DataFrame = {
    val cap = quantized.groupBy().agg(
      least(lit(k.toLong),
        greatest(lit(1L),
          floor(sqrt(count(lit(1)) / 2.0)).cast("long"))).as("cell_cap"))
    quantized.crossJoin(broadcast(cap))
      .filter(col("vec_id") < col("cell_cap"))
      .select(col("vec_id").as("cid"), col("q").as("cq"))
  }

  /** Offline job: train and persist the codebook parquet. The seed is
    * corpus-capped — the at-scale entry point must not reproduce the
    * quadratic first-k blowup the query layer guards against.
    */
  def save(quantized: DataFrame, path: String, k: Int, iters: Int, sampleMod: Int): Unit =
    train(quantized, cappedSeed(quantized, k), iters, sampleMod)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Serving path: load a trained codebook (broadcast it at the join site). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("cid"), col("cq"))
}
