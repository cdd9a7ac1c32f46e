package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The segmented window programs claim EXACT equality with their
  * single-window forms — integers identical, IEEE doubles identical, not
  * approximately. The DuckDB oracle gates that on the testdata; this spec
  * gates it on adversarial shapes the testdata doesn't contain: extreme id
  * ranges (segment arithmetic near 2^62), tie-heavy metrics, all-hit /
  * all-miss sweeps, negative values in the running sum, id clusters that
  * leave most segments empty, and duplicate order keys across partitions.
  */
class SegmentedParitySpec extends SparkSpec {
  import spark.implicits._

  private def key(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  // ---- apSweep: segmented cumulative PR == single-task windows ----------

  private def scored(rows: Seq[(Long, Double)]): DataFrame =
    rows.toDF("frame_id", "iou")

  private val sweepCases: Seq[(String, Seq[(Long, Double)])] = Seq(
    "single frame" -> Seq((7L, 0.5)),
    "two far frames (id range ~2^61)" -> Seq((1L, 0.3), ((1L << 61) + 5, 0.9)),
    "tie-heavy" -> (1 to 40).map(i => (i.toLong, if (i % 2 == 0) 0.5 else 0.25)),
    "all hits" -> (1 to 20).map(i => (i.toLong, 1.0)),
    "all misses" -> (1 to 20).map(i => (i.toLong, 0.0)),
    "multi-prediction frames" -> (1 to 60).map(i => ((i % 7).toLong, (i % 11) / 10.0)),
    "clustered ids (most segments empty)" ->
      ((1 to 30).map(i => (i.toLong, i / 30.0)) ++ (1 to 30).map(i => (1000000L + i, 1.0 - i / 30.0))),
    "seeded random" -> {
      val r = new scala.util.Random(42)
      (1 to 200).map(_ => (r.nextInt(1000).toLong, math.rint(r.nextDouble() * 100) / 100))
    }
  )

  test("apSweep segmented == single-task on adversarial shapes (both hit directions)") {
    for ((label, rows) <- sweepCases; greater <- Seq(true, false)) {
      val single = key(DomainQueries.apSweep(scored(rows), 21, greater, segments = 1))
      for (segs <- Seq(3, 32)) {
        val seg = key(DomainQueries.apSweep(scored(rows), 21, greater, segments = segs))
        assert(seg == single, s"$label greater=$greater segments=$segs diverges")
      }
      assert(single.nonEmpty, label)
    }
  }

  test("non-integral frame ids fall back to the single-task path — never a silent empty result") {
    // string ids can't be range-bucketed; the pre-fallback behavior was a
    // null segment key that dropped EVERY row at the offset join
    val byName = Seq(("f001", 0.9), ("f002", 0.4), ("f003", 0.7)).toDF("frame_id", "iou")
    val out = key(DomainQueries.apSweep(byName, 21))
    assert(out.nonEmpty, "string frame ids yielded an empty sweep")
    assert(out == key(DomainQueries.apSweep(byName, 21, greater = true, segments = 1)))
    // same guarantee for the generic prefix sum
    val strOrd = Seq(("a", "x1", 3L), ("a", "x2", 4L)).toDF("part", "ord", "v")
    val cum = PipelineFns.segmentedCumSum(strOrd, Seq("part"), "ord", col("v"), "cum", 8)
      .select(col("ord"), col("cum")).collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(cum == Seq(("x1", 3L), ("x2", 7L)))
  }

  // ---- segmentedCumSum == single window ---------------------------------

  private val cumCases: Seq[(String, Seq[(String, Long, Long)])] = Seq(
    "negatives" -> Seq(("a", 1L, 5L), ("a", 2L, -7L), ("a", 3L, 2L), ("b", 1L, -1L)),
    "one row per partition" -> Seq(("a", 10L, 3L), ("b", 20L, 4L), ("c", 30L, 5L)),
    "extreme order range" -> Seq(("a", Long.MinValue / 4, 1L), ("a", 0L, 2L), ("a", Long.MaxValue / 4, 3L)),
    "full-range keys (max-min overflows: degrades to one segment, stays correct)" ->
      Seq(("a", Long.MinValue, 1L), ("a", -1L, 2L), ("a", 0L, 3L), ("a", Long.MaxValue, 4L)),
    "same order key in different partitions" ->
      (1 to 50).map(i => (s"s${i % 3}", (i / 3).toLong * 3 + i % 3, i.toLong)),
    "seeded random" -> {
      val r = new scala.util.Random(7)
      (1 to 300).map(i => (s"s${r.nextInt(4)}", i.toLong, r.nextInt(100).toLong - 50))
    }
  )

  test("segmentedCumSum segmented == single-window (negative values, sparse segments)") {
    for ((label, rows) <- cumCases) {
      val df = rows.toDF("part", "ord", "v")
      def run(segs: Int) = key(
        PipelineFns.segmentedCumSum(df, Seq("part"), "ord", col("v"), "cum", segs)
          .select(col("part"), col("ord"), col("v"), col("cum")))
      val single = run(1)
      for (segs <- Seq(2, 5, 64))
        assert(run(segs) == single, s"$label segments=$segs diverges")
      assert(single.nonEmpty, label)
    }
  }

  // ---- composite order key (m11's ranking shape) -------------------------

  private val multiCases: Seq[(String, Seq[(String, Long, Long, Long)])] = Seq(
    // the case the packed-long key got WRONG: ids past 1e9 with adjacent
    // quality values — doc_id − qi×1e9 collides ranks here
    "ids past 1e9 with adjacent qualities" ->
      Seq(("a", -500000L, 2500000000L, 7L), ("a", -499999L, 3L, 5L),
          ("a", -500000L, 12L, 11L), ("b", -1L, 4000000000L, 2L)),
    "duplicate head keys (ties broken by second column)" ->
      (1 to 60).map(i => ("s" + i % 2, -(i % 5).toLong, i.toLong, (i % 13).toLong)),
    "single distinct head value (all rows one segment)" ->
      (1 to 20).map(i => ("a", -3L, i.toLong * 1000000000L, i.toLong)),
    "seeded random with negative heads" -> {
      val r = new scala.util.Random(11)
      (1 to 250).map(i => (s"s${r.nextInt(3)}", -r.nextInt(1000000).toLong,
        r.nextLong(1L << 40) + (if (i % 2 == 0) 3000000000L else 0L), r.nextInt(50).toLong))
    }
  )

  test("segmentedCumSumMulti composite (head, tiebreak) == single-window, beyond any packed-key id bound") {
    for ((label, rows) <- multiCases) {
      val df = rows.toDF("part", "negq", "doc_id", "v")
      def run(segs: Int) = key(
        PipelineFns.segmentedCumSumMulti(df, Seq("part"), Seq("negq", "doc_id"), col("v"), "cum", segs)
          .select(col("part"), col("negq"), col("doc_id"), col("v"), col("cum")))
      val single = run(1)
      for (segs <- Seq(2, 7, 64))
        assert(run(segs) == single, s"$label segments=$segs diverges")
      // independent scala recompute of the composite-ordered prefix sums
      val want = rows.groupBy(_._1).flatMap { case (p, rs) =>
        val ranked = rs.sortBy(r => (r._2, r._3))
        ranked.zip(ranked.scanLeft(0L)(_ + _._4).tail).map { case (r, c) =>
          s"$p|${r._2}|${r._3}|${r._4}|$c"
        }
      }.toSeq.sorted
      assert(single == want, s"$label diverges from the scala recompute")
    }
  }
}
