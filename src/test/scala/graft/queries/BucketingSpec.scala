package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the strategy the docs claim for repeated
  * big-big joins at corpus scale (lineitem ⋈ orders on orderkey): bucketing
  * both sides on the join key at write time removes the per-query shuffle
  * entirely. This spec proves the property end-to-end on real testdata.
  */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the join key plans no shuffle exchange") {
    val s = spark
    // tables land in the default ./spark-warehouse (gitignored)
    s.sql("DROP TABLE IF EXISTS li_b")
    s.sql("DROP TABLE IF EXISTS ord_b")

    val d = "/root/testdata/sf0.001"
    s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    s.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_b")
        .join(s.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the join itself must not introduce a shuffle: bucket layout IS the
      // required partitioning on both sides
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("u6 snapshot diff over bucketed snapshots plans a full-outer merge with zero exchange") {
    // pins the u6_snapshot_delta scaladoc claim (RelationalQueries): with
    // yesterday's and today's snapshots both bucketed by doc_id, the daily
    // content-hash diff's full-outer join is a pure co-partitioned merge —
    // the SortMergeJoin reads the bucketed scans directly, no Exchange on
    // either side, so the diff costs one local merge pass at any scale.
    val s = spark
    s.sql("DROP TABLE IF EXISTS snap_cur")
    s.sql("DROP TABLE IF EXISTS snap_pri")

    val d = "/root/testdata/sf0.001"
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.select(col("doc_id"), md5(col("text")).as("ch"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_cur")
    docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("-v0"))))
          .otherwise(md5(col("text"))).as("ph"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_pri")

    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = s.table("snap_cur")
        .join(s.table("snap_pri"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("ph").isNull, "added")
            .when(col("ch").isNull, "removed")
            .when(col("ch") =!= col("ph"), "changed")
            .otherwise("unchanged").as("change_class"))
      val counts = diff.groupBy(col("change_class")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // the simulated prior makes every class non-empty on real testdata
      assert(counts.keySet === Set("added", "changed", "unchanged"),
        s"unexpected classes: $counts")
      val plan = diff.queryExecution.executedPlan.toString
      // the contract is exchange-free co-location on the bucket key; the
      // shuffle-join flavor (sort-merge vs shuffled-hash, r19's
      // preferSortMergeJoin=false) is the planner's size call
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS snap_cur")
      s.sql("DROP TABLE IF EXISTS snap_pri")
    }
  }
}
