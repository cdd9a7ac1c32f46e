package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** The d22 cross-source overlap sketch: per-source MinHash signatures are
  * MERGEABLE STATE (element-wise min over any partition of the corpus
  * equals the whole-corpus signature), and the agreement estimator tracks
  * exact Jaccard. These are the properties the incremental source-add leg
  * (IncrementalDemo.overlapLeg) and the 100 TB governance story rest on.
  */
class DedupSketchSpec extends SparkSpec {

  private def docsDF(rows: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("source", "text")
  }

  // three sources: a and b share half their sentences (high overlap),
  // c is disjoint content
  private val sharedLines = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a stitch in time saves nine and a rolling stone gathers no moss",
    "to be or not to be that is the question for the ages")
  private val aOnly = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    "one two three four five six seven eight nine ten eleven twelve")
  private val bOnly = Seq(
    "red green blue yellow purple orange cyan magenta white black silver gold",
    "north south east west up down left right forward backward inward outward")
  private val cOnly = Seq(
    "quantum chromodynamics predicts asymptotic freedom at short distances always",
    "the mitochondria is the powerhouse of the cell as everyone knows",
    "parquet footers carry row group statistics that scans use to skip pages")

  private val docs: Seq[(String, String)] =
    (sharedLines ++ aOnly).map("src_a" -> _) ++
      (sharedLines ++ bOnly).map("src_b" -> _) ++
      cOnly.map("src_c" -> _)

  private def canonSigs(df: org.apache.spark.sql.DataFrame): Seq[(String, Seq[Long])] =
    df.collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq

  test("per-source signature is the min over the source's shingle digests (partition-invariant)") {
    val whole = canonSigs(DedupQueries.sourceSketchSignatures(docsDF(docs)))
    // arbitrary 2-way split of the corpus, folded — must equal the whole
    val (p1, p2) = docs.zipWithIndex.partition(_._2 % 2 == 0)
    val folded = canonSigs(DedupQueries.mergeSketchSignatures(
      DedupQueries.sourceSketchSignatures(docsDF(p1.map(_._1))),
      DedupQueries.sourceSketchSignatures(docsDF(p2.map(_._1)))))
    assert(folded == whole, "fold over an arbitrary corpus split diverged from recompute")
    assert(whole.map(_._1) == Seq("src_a", "src_b", "src_c"))
    assert(whole.forall(_._2.size == DedupQueries.SketchPerms))
  }

  test("a NEW source folds in without touching resident signatures (the source-add shape)") {
    val resident = DedupQueries.sourceSketchSignatures(
      docsDF(docs.filterNot(_._1 == "src_c")))
    val folded = DedupQueries.mergeSketchSignatures(
      resident, DedupQueries.sourceSketchSignatures(docsDF(docs.filter(_._1 == "src_c"))))
    assert(canonSigs(folded) == canonSigs(DedupQueries.sourceSketchSignatures(docsDF(docs))))
    // fold is idempotent: re-folding the same source changes nothing
    val refolded = DedupQueries.mergeSketchSignatures(
      folded, DedupQueries.sourceSketchSignatures(docsDF(docs.filter(_._1 == "src_c"))))
    assert(canonSigs(refolded) == canonSigs(folded))
  }

  test("agreement estimator tracks exact Jaccard: shared > disjoint, bounds hold") {
    val est = DedupQueries.overlapSketchMatrix(docsDF(docs))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(est.size == 3) // 3 sources -> 3 pairs (matrix emits ALL pairs)
    val ab = est(("src_a", "src_b"))
    val ac = est(("src_a", "src_c"))
    val bc = est(("src_b", "src_c"))
    // src_a/src_b share 3 of ~5 docs' shingles; src_c is disjoint. The
    // 128-perm estimator has ~1/sqrt(128) ≈ 0.09 standard error — assert
    // the ordering and loose absolute bands, not exact values.
    assert(ab > ac + 0.15 && ab > bc + 0.15,
      s"shared-content pair must dominate: ab=$ab ac=$ac bc=$bc")
    assert(ac <= 0.2 && bc <= 0.2, s"disjoint pairs should estimate near zero: $ac, $bc")
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("estimate sits within estimator error of the exact d21 Jaccard") {
    val df = docsDF(docs)
    // exact per-pair Jaccard over distinct 5-gram shingle digest sets —
    // the same digest space the sketch draws its mins from
    val sh = df.select(col("source"),
        explode(graft.functions.shingleHashes(col("text"), 5)).as("sg"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = sh.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    def exact(a: String, b: String): Double = {
      val (sa, sb) = (bySrc(a), bySrc(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val est = DedupQueries.overlapSketchMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for (((a, b), e) <- est) {
      val x = exact(a, b)
      // 3 standard errors of the 128-perm Bernoulli estimator, floored for
      // the tiny-set regime of this fixture
      val tol = math.max(0.27, 3 * math.sqrt(x * (1 - x) / DedupQueries.SketchPerms))
      assert(math.abs(e - x) <= tol, s"pair ($a,$b): est $e vs exact $x (tol $tol)")
    }
  }
}
