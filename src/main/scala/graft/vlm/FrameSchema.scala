package graft.vlm

import org.apache.spark.sql.types._

/** The unified frame-record data model (SURVEY.md §1.2) as case classes +
  * an explicit StructType. The schema is *fixed* (schema-on-write), unlike
  * the reference's schema-on-read JSON probing — Catalyst prunes columns
  * against it and the JSON reader never has to infer.
  *
  * Canonical constructions in the reference: sunrgbd_processor.py:225-246,
  * matterport_processor.py:226-249, objectron_processor.py:214-239,
  * hypersim_processor.py:341-362, taskonomy_processor.py:385-406;
  * 9-DoF box: data_processing/utils.py:46-90.
  */
object FrameSchema {

  /** 9-DoF oriented box, camera frame (+X right, +Y down, +Z forward);
    * angles normalized to [-1, 1] (data_processing/utils.py:28-43).
    */
  case class Bbox3D(
      x: Double, y: Double, z: Double,
      xl: Double, yl: Double, zl: Double,
      pitch: Double, yaw: Double, roll: Double,
      category: String,
      object_id: Option[String] = None,
      label_id: Option[Int] = None,
      confidence: Option[Double] = None)

  /** 2D box, normalized to one encoding at ingest (SURVEY §7.4 item 5);
    * the reference's three raw encodings (geometry.py:272-335) are folded
    * into (x, y, w, h) + area by the readers.
    */
  case class Bbox2D(
      x: Double, y: Double, w: Double, h: Double,
      area: Option[Double],
      category: String,
      instance_id: Option[Long] = None,
      iscrowd: Option[Int] = None)

  case class Camera(
      fx: Double, fy: Double, cx: Double, cy: Double,
      image_width: Int, image_height: Int,
      intrinsics: Seq[Seq[Double]],
      extrinsics: Option[Seq[Seq[Double]]])

  /** Ref: data_processing/utils.py:93-127. */
  case class DepthStats(
      present: Boolean,
      valid_pixels: Long,
      total_pixels: Long,
      min: Option[Double], max: Option[Double],
      median: Option[Double], mean: Option[Double])

  case class FrameRecord(
      dataset: String,
      split: String,
      image_id: String,
      scene_id: Option[String],
      video_id: Option[String],
      frame_id: Option[String],
      filename: Option[String],
      rgb_path: Option[String],
      depth_path: Option[String],
      depth_type: String,
      camera: Camera,
      depth_stats: Option[DepthStats],
      bounding_boxes_2d: Seq[Bbox2D],
      bounding_boxes_3d: Seq[Bbox3D],
      timestamp: Option[Long])

  /** QA output row (QA_generation/utils/qa_base.py:39-66). `answer` is
    * stringified (the reference mixes numbers/letters/strings in one field);
    * `metadata` is a string map for the same reason — documented deviation,
    * values round-trip exactly.
    */
  case class QaPair(
      id: String,
      question: String,
      answer: String,
      answer_type: String,
      options: Option[Seq[String]],
      metadata: Map[String, String])

  import org.apache.spark.sql.{Encoder, Encoders}
  implicit val frameEncoder: Encoder[FrameRecord] = Encoders.product[FrameRecord]
  implicit val qaEncoder: Encoder[QaPair] = Encoders.product[QaPair]

  val bbox3dType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType), StructField("z", DoubleType),
    StructField("xl", DoubleType), StructField("yl", DoubleType), StructField("zl", DoubleType),
    StructField("pitch", DoubleType), StructField("yaw", DoubleType), StructField("roll", DoubleType),
    StructField("category", StringType),
    StructField("object_id", StringType), StructField("label_id", IntegerType),
    StructField("confidence", DoubleType)
  ))

  val bbox2dType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("w", DoubleType), StructField("h", DoubleType),
    StructField("area", DoubleType), StructField("category", StringType),
    StructField("instance_id", LongType), StructField("iscrowd", IntegerType)
  ))

  val cameraType: StructType = StructType(Seq(
    StructField("fx", DoubleType), StructField("fy", DoubleType),
    StructField("cx", DoubleType), StructField("cy", DoubleType),
    StructField("image_width", IntegerType), StructField("image_height", IntegerType),
    StructField("intrinsics", ArrayType(ArrayType(DoubleType))),
    StructField("extrinsics", ArrayType(ArrayType(DoubleType)))
  ))

  val depthStatsType: StructType = StructType(Seq(
    StructField("present", BooleanType),
    StructField("valid_pixels", LongType), StructField("total_pixels", LongType),
    StructField("min", DoubleType), StructField("max", DoubleType),
    StructField("median", DoubleType), StructField("mean", DoubleType)
  ))

  /** The scan schema for unified-JSON corpora (S1). */
  val frameType: StructType = StructType(Seq(
    StructField("dataset", StringType),
    StructField("split", StringType),
    StructField("image_id", StringType),
    StructField("scene_id", StringType),
    StructField("video_id", StringType),
    StructField("frame_id", StringType),
    StructField("filename", StringType),
    StructField("rgb_path", StringType),
    StructField("depth_path", StringType),
    StructField("depth_type", StringType),
    StructField("camera", cameraType),
    StructField("depth_stats", depthStatsType),
    StructField("bounding_boxes_2d", ArrayType(bbox2dType)),
    StructField("bounding_boxes_3d", ArrayType(bbox3dType)),
    StructField("timestamp", LongType)
  ))

  /** Align any per-dataset processor output to the canonical [[frameType]]:
    * missing columns become typed nulls, struct fields are matched BY NAME
    * (recursively, so each processor's camera/box structs may carry extra
    * fields or a different order), and arrays of structs are element-wise
    * aligned. The result of every `*ToFrames`/`*Frames` processor conforms
    * here and then runs through the QA engine unchanged — the F15 contract.
    */
  /** Ensure the `_source_file` S1 tag exists: corpora not read through
    * Ingest (the per-dataset processors) carry none — default it rather
    * than fail analysis. The one definition of this rule, shared by the QA
    * generators and the codebook pipeline.
    */
  def withSourceTag(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.columns.contains("_source_file")) df
    else df.withColumn("_source_file", org.apache.spark.sql.functions.lit(""))

  def conform(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, lit, struct, transform, when}

    def align(src: Column, srcType: DataType, target: DataType): Column =
      (srcType, target) match {
        case (s: StructType, t: StructType) =>
          // struct(...) is never null, so guard: a null source struct must
          // stay null, not become a non-null struct of all-null fields
          // (which would break isNotNull coverage checks and non-nullable
          // encoder fields downstream)
          when(src.isNotNull, struct(t.fields.map { f =>
            s.find(_.name == f.name) match {
              case Some(sf) => align(src.getField(f.name), sf.dataType, f.dataType).as(f.name)
              case None => lit(null).cast(f.dataType).as(f.name)
            }
          }.toIndexedSeq: _*))
        case (ArrayType(se: StructType, _), ArrayType(te: StructType, _)) =>
          transform(src, x => align(x, se, te))
        case _ => src.cast(target)
      }

    val out = frameType.fields.map { f =>
      df.schema.find(_.name == f.name) match {
        case Some(sf) => align(col(f.name), sf.dataType, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq
    val extras = df.columns.filterNot(c => frameType.fieldNames.contains(c))
      .map(col).toIndexedSeq // keep processor-specific columns (e.g. category, _source_file)
    df.select(out ++ extras: _*)
  }
}
