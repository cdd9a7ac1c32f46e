package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[DomainQueries.apSweep]] to hand-computed VOC/Objectron AP values
  * (metrics.py:31-99 algorithm replayed by hand on a 3-prediction fixture),
  * including the sentinel-point semantics: the inserted (0,0) is the
  * lag-default first delta, the appended (1,0) contributes nothing.
  */
class ApSweepSpec extends SparkSpec {
  import spark.implicits._

  // frames in frame_id order: f1 has predictions with iou {1.0, 0.0},
  // f2 has {0.6}; bins=3 → thresholds {0, 0.5, 1}. Hand computation:
  //  t=0.0: every pred hits → recall walks 2/3→1 at precision 1 → AP 1
  //  t=0.5: f1 (tp1,fp1) p=1/2, f2 (tp2,fp1) p=2/3; monotone prec from
  //         the right = 2/3 at both steps; AP = 1/3·2/3 + 1/3·2/3 = 4/9
  //  t=1.0: f1 (tp1,fp1) p=1/2, f2 (tp1,fp2) p=1/3; recall only changes
  //         at f1; AP = 1/3·1/2 = 1/6
  private val fixture = Seq(
    (1L, 1.0), (1L, 0.0), (2L, 0.6)
  ).toDF("frame_id", "iou")

  test("apSweep matches the hand-computed reference AP at every threshold") {
    val got = DomainQueries.apSweep(fixture, 3)
      .orderBy("ti")
      .select("ti", "threshold", "n_instances", "tp_total", "fp_total", "ap")
      .as[(Long, Double, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 0.0, 3L, 3L, 0L, 1.0),
      (1L, 0.5, 3L, 2L, 1L, 0.444444),
      (2L, 1.0, 3L, 1L, 2L, 0.166667)))
  }

  test("greater=false flips the hit direction (the pixel/ADD error metric)") {
    // same fixture under metric <= t: at t=0.5 the hits are the 0.0 and
    // nothing else in f1, and nothing in f2 (0.6 > 0.5):
    //   f1 (tp1,fp1) p=1/2 r=1/3; f2 (tp1,fp2) p=1/3 r=1/3
    //   recall changes only at f1; monoprec there = 1/2 → AP = 1/6
    val got = DomainQueries.apSweep(fixture, 3, greater = false)
      .orderBy("ti").select("ap").as[Double].collect().toSeq
    // t=0: only iou=0.0 hits → same curve as above → 1/6
    // t=1: everything hits → AP 1
    assert(got === Seq(0.166667, 0.166667, 1.0))
  }

  test("all-miss predictions yield AP 0 (zero-precision curve integrates to zero)") {
    val scored = Seq((1L, 0.0), (2L, 0.0)).toDF("frame_id", "iou")
    val got = DomainQueries.apSweep(scored, 3)
      .filter(col("ti") > 0).select("ap").as[Double].collect().toSeq
    assert(got === Seq(0.0, 0.0))
  }

  test("g24 invariant: the symmetric distance never exceeds the 1:1 ADD (mod rounding)") {
    // nearest-GT-keypoint distance is bounded by the corresponding-keypoint
    // distance — the defining property of ADD-S. The two columns round
    // independently (add_sym through 1e-6-scaled integer sums, add straight
    // from the norm), so the comparison needs the double-rounding epsilon:
    // exact values obey <=, rounded ones can differ by one 1e-4 step.
    val df = graft.SparkEntry.queries("g24_add_sym")(spark, "/root/testdata/sf0.001")
    assert(df.filter(col("add_sym") > col("add") + 1e-4 + 1e-12).count() === 0)
    assert(df.count() > 0)
  }

  test("g24 keeps the staged coordinate-array projection (inlining guard)") {
    // The 9x9 nearest-keypoint lambda references each of the six 9-element
    // coordinate arrays from every iteration; if CollapseProject ever inlines
    // the array constructors into the lambda body (they are decimal-sourced
    // arithmetic, rebuilt per iteration when inlined), the per-row cost grows
    // ~80x — observed 9.2 s -> 0.8 s warm at sf0.1 when staged. Guard the
    // shape statically: the arrays must survive as their own projection and
    // the optimized expression tree must stay compact.
    val df = graft.SparkEntry.queries("g24_add_sym")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    val projects = plan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }
    assert(projects.size >= 2, "staged array projection was collapsed away")
    val exprNodes =
      plan.collect { case p => p.expressions.map(_.collect { case _ => 1 }.size).sum }.sum
    // staged plan measures 791 nodes (the staged projection carries the six
    // array constructors once); inlining substitutes a ~90-node constructor
    // at each of the 12 lambda use sites, pushing well past 1000
    assert(exprNodes < 1000,
      s"optimized plan holds $exprNodes expression nodes — coordinate arrays inlined into the 9x9 lambda")
  }

  test("perfect predictions yield AP 1 at every threshold") {
    val scored = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0)).toDF("frame_id", "iou")
    val got = DomainQueries.apSweep(scored, 21).select("ap").as[Double].collect().toSeq
    assert(got === Seq.fill(21)(1.0))
  }
}
