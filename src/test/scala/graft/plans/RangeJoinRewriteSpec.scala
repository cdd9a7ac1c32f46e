package graft.plans

import graft.vlm.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed range-join rewrite must (a) compute exactly the naive
  * non-equi join's result — including bucket-edge values, nulls, and
  * negatives — and (b) actually replace the nested-loop join with an
  * equi-join on the bucket key.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points: DataFrame =
    Seq[(Long, java.lang.Double)](
      (1L, 0.0), (2L, 0.49999), (3L, 0.5), (4L, 1.0), (5L, 1.75),
      (6L, -0.25), (7L, -0.5), (8L, 490.0), (9L, null), (10L, 2.5)
    ).toDF("pid", "v")

  private def intervals: DataFrame =
    Seq[(Long, java.lang.Double, java.lang.Double)](
      (100L, 0.0, 0.5), (101L, 0.5, 1.0), (102L, -1.0, 0.0), (103L, 0.25, 2.0),
      (104L, 2.5, 2.5), (105L, null, 1.0), (106L, 1.0, null), (107L, 489.5, 500.0),
      // inverted bounds (dirty data): zero matches, and the rewrite must
      // not crash in Sequence on the reversed bucket range
      (108L, 5.0, 1.0)
    ).toDF("iid", "lo", "hi")

  private def resultSet(df: DataFrame): Set[(Long, Long)] =
    df.select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("rewrite matches the naive interval join exactly (edges, nulls, negatives)") {
    for (hiInclusive <- Seq(false, true); bin <- Seq(0.5, 0.3, 10.0)) {
      val naiveCond =
        if (hiInclusive) $"v" >= $"lo" && $"v" <= $"hi" else $"v" >= $"lo" && $"v" < $"hi"
      val naive = resultSet(points.join(intervals, naiveCond))
      val marked = resultSet(points.join(intervals,
        graft.functions.pointInInterval($"v", $"lo", $"hi", bin, hiInclusive)))
      assert(marked === naive, s"hiInclusive=$hiInclusive bin=$bin")
    }
  }

  test("each qualifying pair appears exactly once (no bucket-overlap dups)") {
    val joined = points.join(intervals,
      graft.functions.pointInInterval($"v", $"lo", $"hi", bin = 0.5))
    val rows = joined.select($"pid", $"iid").collect()
    assert(rows.length === rows.distinct.length)
  }

  test("marked join plans as an equi join on the bucket key, not a nested loop") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // without the rewrite a non-broadcastable interval side would force
      // a cartesian/BNLJ; with it, the join is hashable on the bucket
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = points.join(intervals,
        graft.functions.pointInInterval($"v", $"lo", $"hi", bin = 0.5))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_bucket"), optimized)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
      assert(!physical.contains("CartesianProduct"), physical)
      assert(physical.contains("SortMergeJoin") || physical.contains("ShuffledHashJoin"), physical)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("band self-join |a.v - b.v| <= w through the rewrite matches naive") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"value")
    val a = ev.as("a")
    val b = ev.select($"event_id".as("bid"), $"value".as("bv"),
      ($"value" - 0.3).as("blo"), ($"value" + 0.3).as("bhi")).as("b")
    val naive = a.join(b,
        $"a.value" >= $"blo" && $"a.value" <= $"bhi" && $"a.event_id" < $"bid")
      .select($"a.event_id", $"bid").as[(Long, Long)].collect().toSet
    val marked = a.join(b,
        graft.functions.pointInInterval($"a.value", $"blo", $"bhi", bin = 0.6, hiInclusive = true)
          && $"a.event_id" < $"bid")
      .select($"a.event_id", $"bid").as[(Long, Long)].collect().toSet
    assert(marked === naive && marked.nonEmpty)
  }

  test("a marker without range conjuncts is stripped; the join still computes") {
    val joined = points.join(intervals,
      $"pid" === $"iid" - 99L && graft.functions.rangeBin($"v", $"lo", 0.5))
    val naive = points.join(intervals, $"pid" === $"iid" - 99L)
    assert(resultSet(joined) === resultSet(naive))
    assert(!joined.queryExecution.optimizedPlan.toString.contains("range_bin"))
  }

  test("non-inner joins with a marker are left untouched (marker inert)") {
    val joined = points.join(intervals,
      graft.functions.pointInInterval($"v", $"lo", $"hi", bin = 0.5), "left_outer")
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi", "left_outer")
    val got = joined.select($"pid", $"iid").collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
    val want = naive.select($"pid", $"iid").collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
    assert(got === want)
    assert(!joined.queryExecution.optimizedPlan.toString.contains("graft_bucket"))
  }

  test("long-typed points (epoch timestamps) bucket correctly via cast monotonicity") {
    // epoch-micros magnitudes approach 2^53: the double cast is lossy, but
    // division by a positive bin and floor are monotone, so the bucket
    // containment that makes the rewrite lossless still holds
    val base = 1700000000000000L // ~1.7e15
    val evs = Seq((1L, base), (2L, base + 500000L), (3L, base + 999999L), (4L, base + 3600L * 1000000L))
      .toDF("eid", "ts")
    val wins = Seq((10L, base, base + 1000000L), (11L, base + 1000000L, base + 2000000L))
      .toDF("wid", "wlo", "whi")
    val naive = evs.join(wins, $"ts" >= $"wlo" && $"ts" < $"whi")
      .select($"eid", $"wid").as[(Long, Long)].collect().toSet
    val marked = evs.join(wins,
      graft.functions.pointInInterval($"ts", $"wlo", $"whi", bin = 1000000.0))
      .select($"eid", $"wid").as[(Long, Long)].collect().toSet
    assert(marked === naive && marked.nonEmpty)
  }

  test("the marker expression itself is constant true (inert without the rule)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val h = RangeBinHint(Literal(1.0), Literal(2.0), Literal(0.5))
    assert(h.eval(null) === true)
    assert(!h.foldable && h.deterministic && !h.nullable)
  }
}
