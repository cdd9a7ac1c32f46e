package graft.vlm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Matterport J1–J3 join path over EmbodiedScan-landing-shaped tables. */
class MatterportSpec extends SparkSpec {

  private def tables() = {
    import spark.implicits._
    val images = Seq(
      // same frame listed under an earlier region: last sample_idx wins
      ("sceneA", "matterport3d/sceneA/region0", "f_i1_0", "matterport3d/sceneA/matterport_color_images/f_i1_0.jpg", Seq(1L)),
      ("sceneA", "matterport3d/sceneA/region1", "f_i1_0", "matterport3d/sceneA/matterport_color_images/f_i1_0.jpg", Seq(2L, 1L)),
      ("sceneA", "matterport3d/sceneA/region0", "f_i1_1", "matterport3d/sceneA/matterport_color_images/f_i1_1.jpg", Seq.empty[Long])
    ).toDF("scene_id", "sample_idx", "frame_id", "img_path", "visible_instance_ids")
    val instances = Seq(
      ("sceneA", "matterport3d/sceneA/region1", 1L, 1.0, 2.0, 3.0, 0.5, 0.6, 0.7, 90.0, 0.0, 0.0, 5L),
      ("sceneA", "matterport3d/sceneA/region1", 2L, 9.0, 8.0, 7.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 7L),
      // instance never visible in any image
      ("sceneA", "matterport3d/sceneA/region1", 3L, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 5L)
    ).toDF("scene_id", "sample_idx", "bbox_id", "cx", "cy", "cz", "dx", "dy", "dz", "rx", "ry", "rz", "label_id")
    val categories = Seq((5L, "chair")).toDF("label_id", "name") // 7 unmapped
    (images, instances, categories)
  }

  test("matterportFrames: explode-join boxes, label fallback, visible-id order (J1-J3; matterport_processor.py:43-133)") {
    val (images, instances, categories) = tables()
    val frames = MatterportSources.matterportFrames(images, instances, categories)
      .orderBy("frame_id").collect()
    assert(frames.length == 2)

    val f0 = frames(0)
    assert(f0.getAs[String]("image_id") == "sceneA_f_i1_0")
    assert(f0.getAs[String]("filename") == "f_i1_0.jpg")
    val boxes = f0.getSeq[Row](f0.fieldIndex("bounding_boxes_3d"))
    assert(boxes.length == 2)
    // visible order [2, 1] preserved
    assert(boxes(0).getAs[Long]("label_id") == 7L)
    assert(boxes(0).getAs[String]("category") == "class_7") // J3 fallback
    assert(boxes(1).getAs[String]("category") == "chair")
    assert(boxes(1).getAs[Double]("x") == 1.0 && boxes(1).getAs[Double]("zl") == 0.7)
    assert(boxes(1).getAs[Double]("pitch") == 0.5) // normalize_angle(90) = 0.5
    // frame with no visible ids survives with an empty box list
    assert(frames(1).getSeq[Row](frames(1).fieldIndex("bounding_boxes_3d")).isEmpty)
    // default camera
    val cam = f0.getStruct(f0.fieldIndex("camera"))
    assert(cam.getAs[Double]("fx") == 1000.0 && cam.getAs[Int]("image_height") == 1024)
    assert(cam.isNullAt(cam.fieldIndex("extrinsics")))
  }

  test("matterportFrames joins optional camera poses (J1)") {
    import spark.implicits._
    val (images, instances, categories) = tables()
    val poses = Seq(("sceneA", "f_i1_0", Seq(Seq(1.0, 0.0, 0.0, 5.0), Seq(0.0, 1.0, 0.0, 6.0),
      Seq(0.0, 0.0, 1.0, 7.0), Seq(0.0, 0.0, 0.0, 1.0))))
      .toDF("scene_id", "frame_id", "extrinsics")
    val frames = MatterportSources.matterportFrames(images, instances, categories, Some(poses))
      .orderBy("frame_id").collect()
    val cam = frames(0).getStruct(frames(0).fieldIndex("camera"))
    val ex = cam.getSeq[scala.collection.Seq[Double]](cam.fieldIndex("extrinsics"))
    assert(ex(0) == Seq(1.0, 0.0, 0.0, 5.0))
    assert(frames(1).getStruct(frames(1).fieldIndex("camera")).isNullAt(cam.fieldIndex("extrinsics")))
  }
}
