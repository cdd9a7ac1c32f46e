package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** Parity between the two connected-components execution paths: the
  * single-job union-find (taken when the verified edge list is small) and
  * the distributed min-label propagation loop (the >5e6-edge scale path,
  * which the sf oracles no longer exercise once the hybrid picks local).
  */
class CcSpec extends SparkSpec {

  private def components(edges: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val undirected = df.union(df.select(col("b").as("a"), col("a").as("b")))
    def toMap(res: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (toMap(DedupQueries.localUnionFind(undirected)),
     toMap(DedupQueries.distributedMinLabel(undirected)))
  }

  test("local union-find and distributed min-label agree on a mixed graph") {
    // two cliques, a bridge, a chain, and an isolated pair
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),        // clique {1,2,3}
      (3, 10),                       // bridge
      (10, 11), (11, 12),            // chain continues component of 1
      (20, 21), (21, 22),            // component min 20
      (30, 31)                       // pair
    )
    val (local, dist) = components(edges)
    assert(local == dist)
    assert(local(12) == 1L && local(22) == 20L && local(31) == 30L)
  }

  test("deep chain (diameter > 15) fully converges on both paths") {
    // a 40-vertex path graph: the old fixed 15-round cap would have
    // returned a partially merged labeling here
    val edges = (0L until 39L).map(i => (i, i + 1))
    val (local, dist) = components(edges)
    assert(local == dist)
    assert(local.values.toSet == Set(0L), "every vertex must reach label 0")
  }

  test("d13 leakage-safety invariant: every dedup group lands wholly in one split") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("d13_leakage_safe_split")(spark, "/root/testdata/sf0.001")
    val perGroup = df.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n_docs"))
    assert(perGroup.filter(col("n_splits") =!= 1).count() === 0)
    // both splits are populated and groups with >1 member exist (the
    // invariant is load-bearing, not vacuous, on this fixture)
    assert(df.select(col("split")).distinct().count() === 2)
    assert(perGroup.filter(col("n_docs") > 1).count() > 0)
  }
}
