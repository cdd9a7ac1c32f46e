package graft.vlm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypersim end-to-end unified-frame processor (F15/S7;
  * hypersim_processor.py), over the all-HDF5 scene layout:
  *
  * {{{
  * root/<scene>/_detail/<cam>/camera_keyframe_{frame_indices,positions,orientations}.hdf5
  * root/<scene>/_detail/mesh/metadata_semantic_instance_bounding_box_object_aligned_2d_{positions,extents,orientations}.hdf5
  * root/<scene>/_detail/metadata_nodes.csv
  * root/<scene>/images/scene_<cam>_geometry_hdf5/frame.NNNN.{depth_meters,semantic_instance}.hdf5
  * }}}
  *
  * Scale shape: every raster decode emits AGGREGATES (depth stats, the
  * visible-instance id set) from the partition-local task; the metadata
  * sides (keyframes, bbox tables, node names) are tiny and join
  * relationally — nearest-keyframe pose resolution is a rank-1 window over
  * the per-camera (frame × keyframe) pairs, bounded by the keyframe count.
  */
object HypersimSources {

  // ---- decoded row shapes -------------------------------------------------

  final case class Keyframe(scene: String, cam: String, kf_pos: Int, kf_frame: Long,
      extrinsics: Seq[Seq[Double]])
  final case class SceneBox(scene: String, instance_id: Int,
      wx: Double, wy: Double, wz: Double,
      xl: Double, yl: Double, zl: Double,
      pitch_rad: Double, yaw_rad: Double, roll_rad: Double)
  final case class FrameRaster(scene: String, cam: String, frame_id: Long,
      image_width: Int, image_height: Int,
      depth_stats: FrameSchema.DepthStats,
      visible_ids: Seq[Int])

  /** Per-camera keyframe poses: groupBy the camera directory collects the
    * three small keyframe arrays; `[R | t]` per keyframe
    * (hypersim_processor.py:52-91).
    */
  def cameraKeyframes(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$root/*/_detail/*/camera_keyframe_*.hdf5")
      .select(
        regexp_extract(col("path"), "/([^/]+)/_detail/", 1).as("scene"),
        regexp_extract(col("path"), "/_detail/([^/]+)/", 1).as("cam"),
        regexp_extract(col("path"), "camera_keyframe_([a-z_]+)\\.hdf5$", 1).as("kind"),
        col("content"))
      .groupBy(col("scene"), col("cam"))
      .agg(map_from_entries(collect_list(struct(col("kind"), col("content")))).as("files"))
      .as[(String, String, Map[String, Array[Byte]])]
      .flatMap { case (scene, cam, files) =>
        try (for {
          idx <- files.get("frame_indices")
          pos <- files.get("positions")
          ori <- files.get("orientations")
        } yield {
          val indices = Hdf5Lite.readDataset(idx).data
          val p = Hdf5Lite.readDataset(pos).data       // (N, 3)
          val o = Hdf5Lite.readDataset(ori).data       // (N, 3, 3)
          indices.indices.map { i =>
            val ext = Seq(
              Seq(o(9 * i), o(9 * i + 1), o(9 * i + 2), p(3 * i)),
              Seq(o(9 * i + 3), o(9 * i + 4), o(9 * i + 5), p(3 * i + 1)),
              Seq(o(9 * i + 6), o(9 * i + 7), o(9 * i + 8), p(3 * i + 2)),
              Seq(0.0, 0.0, 0.0, 1.0))
            Keyframe(scene, cam, i, indices(i).toLong, ext)
          }
        }).getOrElse(Seq.empty)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[hypersim] skipping keyframes for $scene/$cam: ${e.getMessage}")
          Seq.empty
        }
      }
      .toDF()
  }

  /** Per-scene object-aligned boxes from the mesh metadata trio, inf rows
    * skipped, orientation matrix → ZYX radians (hypersim_processor.py:
    * 111-163, :166-186).
    */
  def sceneBoxes(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$root/*/_detail/mesh/metadata_semantic_instance_bounding_box_object_aligned_2d_*.hdf5")
      .select(
        regexp_extract(col("path"), "/([^/]+)/_detail/", 1).as("scene"),
        regexp_extract(col("path"), "object_aligned_2d_([a-z]+)\\.hdf5$", 1).as("kind"),
        col("content"))
      .groupBy(col("scene"))
      .agg(map_from_entries(collect_list(struct(col("kind"), col("content")))).as("files"))
      .as[(String, Map[String, Array[Byte]])]
      .flatMap { case (scene, files) =>
        try (for {
          pos <- files.get("positions")
          ext <- files.get("extents")
          ori <- files.get("orientations")
        } yield {
          val p = Hdf5Lite.readDataset(pos).data
          val e = Hdf5Lite.readDataset(ext).data
          val o = Hdf5Lite.readDataset(ori).data
          (0 until p.length / 3).flatMap { i =>
            val c = Array(p(3 * i), p(3 * i + 1), p(3 * i + 2))
            val d = Array(e(3 * i), e(3 * i + 1), e(3 * i + 2))
            if (c.exists(_.isInfinite) || d.exists(_.isInfinite)) None
            else {
              val r = Array(
                Array(o(9 * i), o(9 * i + 1), o(9 * i + 2)),
                Array(o(9 * i + 3), o(9 * i + 4), o(9 * i + 5)),
                Array(o(9 * i + 6), o(9 * i + 7), o(9 * i + 8)))
              val (pi, ya, ro) = Geo.matrixToEulerZYXRad(r)
              Some(SceneBox(scene, i, c(0), c(1), c(2), d(0), d(1), d(2), pi, ya, ro))
            }
          }
        }).getOrElse(Seq.empty)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[hypersim] skipping box metadata for $scene: ${e.getMessage}")
          Seq.empty
        }
      }
      .toDF()
  }

  /** `metadata_nodes.csv` → (scene, instance_id, category)
    * (hypersim_processor.py:95-108).
    */
  def nodeNames(spark: SparkSession, root: String): DataFrame =
    spark.read.option("header", true)
      .csv(s"$root/*/_detail/metadata_nodes.csv")
      .select(
        regexp_extract(input_file_name(), "/([^/]+)/_detail/", 1).as("scene"),
        col("node_id").cast("int").as("instance_id"),
        coalesce(col("object_name"), lit("unknown")).as("category"))
      .filter(col("instance_id").isNotNull)

  /** Frame rasters → per-frame aggregates: depth stats over the
    * (d > 0 ∧ finite) mask (utils.py:93-127) and the sorted visible
    * instance-id set (ids ≥ 0, :252-260). Exact median; one decode pass.
    */
  def frameRasters(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val scans = spark.read.format("binaryFile")
      .load(s"$root/*/images/scene_*_geometry_hdf5/frame.*.hdf5")
      .select(
        regexp_extract(col("path"), "/([^/]+)/images/", 1).as("scene"),
        regexp_extract(col("path"), "/scene_(.+)_geometry_hdf5/", 1).as("cam"),
        regexp_extract(col("path"), "/frame\\.(\\d+)\\.", 1).cast("long").as("frame_id"),
        regexp_extract(col("path"), "\\.(depth_meters|semantic_instance)\\.hdf5$", 1).as("kind"),
        col("content"))
      .filter(col("kind") =!= "")
    scans
      .groupBy(col("scene"), col("cam"), col("frame_id"))
      .agg(map_from_entries(collect_list(struct(col("kind"), col("content")))).as("files"))
      .as[(String, String, Long, Map[String, Array[Byte]])]
      .flatMap { case (scene, cam, frameId, files) =>
        try files.get("depth_meters").map { db =>
          val ds = Hdf5Lite.readDataset(db)
          val (h, w) = (ds.dims(0).toInt, ds.dims(1).toInt)
          val stats = LandingZone.statsOf(ds.data)
          val visible = files.get("semantic_instance")
            .map(sb => Hdf5Lite.readDataset(sb).data.map(_.toInt).filter(_ >= 0).distinct.sorted.toSeq)
            .getOrElse(Seq.empty)
          FrameRaster(scene, cam, frameId, w, h, stats, visible)
        }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[hypersim] skipping frame $scene/$cam/$frameId: ${e.getMessage}")
          None
        }
      }
      .toDF()
  }

  /** World→camera box-center transform with the OpenGL→CV flip and asset
    * unit scaling (hypersim_processor.py:292-320). Cold path: runs per
    * visible box, not per pixel.
    */
  private val toCameraUdf = udf {
    (ext: Seq[Seq[Double]], wx: Double, wy: Double, wz: Double, scale: Double) =>
      val m = Geo.invertRigid(ext.map(_.toArray).toArray)
      val p = Geo.transformPoints(m, Array(Array(wx, wy, wz)))(0)
      Seq(p(0) * scale, -p(1) * scale, -p(2) * scale)
  }

  /** The full composition: frame rasters ⋈ nearest keyframe pose ⋈ visible
    * boxes ⋈ node names → unified frames. Intrinsics from the 90° FOV
    * estimate (G13, :187-213).
    */
  def hypersimFrames(spark: SparkSession, root: String, metersPerAssetUnit: Double = 1.0): DataFrame = {
    val frames = frameRasters(spark, root)
    val kf = cameraKeyframes(spark, root)
    // nearest keyframe (exact match included): argmin |kf_frame − frame_id|,
    // first (lowest kf_pos) on ties — np.argmin semantics (:70-79)
    val w = Window.partitionBy(col("scene"), col("cam"), col("frame_id"))
      .orderBy(abs(col("kf_frame") - col("frame_id")).asc, col("kf_pos").asc)
    val posed = frames
      .join(kf, Seq("scene", "cam"), "left")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk", "kf_pos", "kf_frame")

    val boxes = sceneBoxes(spark, root)
    val named = nodeNames(spark, root)
    val visible = posed
      // box recovery needs the world→camera transform; frames whose camera
      // has no keyframe pose keep their row (left join below) but
      // contribute no boxes, instead of NPE-ing inside the transform UDF
      .filter(col("extrinsics").isNotNull)
      .select(col("scene"), col("cam"), col("frame_id"), col("extrinsics"),
        explode(col("visible_ids")).as("instance_id"))
      .join(boxes, Seq("scene", "instance_id")) // inner: ids without box rows drop (:275-277)
      .join(named, Seq("scene", "instance_id"), "left")
      .withColumn("cc",
        toCameraUdf(col("extrinsics"), col("wx"), col("wy"), col("wz"), lit(metersPerAssetUnit)))
      .select(
        col("scene"), col("cam"), col("frame_id"),
        struct(
          col("instance_id"),
          struct(
            col("cc")(0).as("x"), col("cc")(1).as("y"), col("cc")(2).as("z"),
            (col("xl") * metersPerAssetUnit).as("xl"),
            (col("yl") * metersPerAssetUnit).as("yl"),
            (col("zl") * metersPerAssetUnit).as("zl"),
            // the reference feeds radian eulers into its degree-based
            // normalize_angle (utils.py:78-88) — replayed for parity
            GeoFunctions.normalizeAngleCol(col("pitch_rad")).as("pitch"),
            GeoFunctions.normalizeAngleCol(col("yaw_rad")).as("yaw"),
            GeoFunctions.normalizeAngleCol(col("roll_rad")).as("roll"),
            coalesce(col("category"), lit("unknown")).as("category")
          ).as("box")).as("ordered"))
      .groupBy(col("scene"), col("cam"), col("frame_id"))
      .agg(sort_array(collect_list(col("ordered"))).as("ordered"))
      .select(col("scene"), col("cam"), col("frame_id"),
        transform(col("ordered"), x => x.getField("box")).as("bounding_boxes_3d"))

    val bbox3dDdl =
      "array<struct<x:double,y:double,z:double,xl:double,yl:double,zl:double," +
        "pitch:double,yaw:double,roll:double,category:string>>"
    val fx = col("image_width") / 2.0 // fovToFocal(w, 90°) = w / (2·tan45°) = w/2
    posed
      .join(visible, Seq("scene", "cam", "frame_id"), "left")
      .select(
        lit("hypersim").as("dataset"),
        col("scene").as("split"),
        col("scene").as("scene_id"),
        format_string("%s_%s_frame_%04d", col("scene"), col("cam"), col("frame_id")).as("image_id"),
        format_string("frame.%04d.color.hdf5", col("frame_id")).as("filename"),
        lit("depth_hdf5_meters").as("depth_type"),
        struct(
          fx.as("fx"), fx.as("fy"),
          (col("image_width") / 2.0).as("cx"), (col("image_height") / 2.0).as("cy"),
          col("image_width"), col("image_height"),
          array(
            array(fx, lit(0.0), col("image_width") / 2.0),
            array(lit(0.0), fx, col("image_height") / 2.0),
            array(lit(0.0), lit(0.0), lit(1.0))
          ).as("intrinsics"),
          col("extrinsics")
        ).as("camera"),
        col("depth_stats"),
        coalesce(col("bounding_boxes_3d"), array().cast(bbox3dDdl)).as("bounding_boxes_3d")
      )
  }
}
