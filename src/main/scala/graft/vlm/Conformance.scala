package graft.vlm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus schema-conformance report — the reference's data-quality
  * validator (`check_dataset_parameters.py:15-276`) as one aggregation
  * pass: per dataset, field-coverage percentages, box counts, and the
  * frames that would be silently dropped by downstream tasks. This is the
  * closest thing the reference has to a test oracle (SURVEY §5), kept here
  * as a first-class library op so ingest regressions surface as numbers,
  * not missing QA rows.
  */
object Conformance {

  private def pct(flag: org.apache.spark.sql.Column) =
    round(avg(flag.cast("int")) * 100, 2)

  /** One row per dataset with coverage statistics. */
  def report(frames: DataFrame): DataFrame =
    frames
      .groupBy(col("dataset"))
      .agg(
        count(lit(1)).as("n_frames"),
        pct(col("camera").isNotNull).as("pct_camera"),
        pct(col("camera.intrinsics").isNotNull).as("pct_intrinsics"),
        pct(col("camera.extrinsics").isNotNull).as("pct_extrinsics"),
        pct(col("depth_stats").isNotNull && col("depth_stats.present")).as("pct_depth"),
        sum(size(col("bounding_boxes_3d"))).as("n_boxes_3d"),
        sum(size(col("bounding_boxes_2d"))).as("n_boxes_2d"),
        sum((size(col("bounding_boxes_3d")) === 0 && size(col("bounding_boxes_2d")) === 0).cast("int")).as("n_boxless_frames"),
        round(avg(size(col("bounding_boxes_3d"))), 3).as("avg_boxes_3d_per_frame"),
        pct(col("scene_id").isNotNull).as("pct_scene_id"),
        pct(col("image_id").isNotNull && (col("image_id") =!= "")).as("pct_image_id")
      )

  /** Hard invariants every unified corpus must satisfy; returns violation
    * counts (all zeros = conformant). Camera-frame boxes must have sane
    * dimensions and normalized angles (SURVEY §1.2).
    */
  def violations(frames: DataFrame): DataFrame = {
    val b = frames.select(col("dataset"), explode(col("bounding_boxes_3d")).as("bbox"))
    b.groupBy(col("dataset")).agg(
      sum((col("bbox.xl") <= 0 || col("bbox.yl") <= 0 || col("bbox.zl") <= 0).cast("int")).as("nonpositive_dims"),
      sum((abs(col("bbox.pitch")) > 1 || abs(col("bbox.yaw")) > 1 || abs(col("bbox.roll")) > 1).cast("int")).as("unnormalized_angles"),
      sum(col("bbox.category").isNull.cast("int")).as("null_categories"),
      sum((isnan(col("bbox.x")) || isnan(col("bbox.y")) || isnan(col("bbox.z"))).cast("int")).as("nan_centers")
    )
  }
}
