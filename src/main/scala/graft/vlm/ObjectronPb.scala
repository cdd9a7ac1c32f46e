package graft.vlm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Objectron `.pbdata` ingestion (SURVEY S9/G20) — a hand-rolled reader for
  * the protobuf *wire format* (the public encoding: varint / fixed32 /
  * fixed64 / length-delimited), so no codegen or protobuf runtime is
  * needed for read-only access.
  *
  * Message/field numbers follow the published Objectron schema
  * (objectron/schema/annotation_data.proto, a_r_capture_metadata.proto):
  * {{{
  * Sequence            { repeated FrameAnnotation frame_annotations = 2; }
  * FrameAnnotation     { int32 frame_id = 1; repeated ObjectAnnotation annotations = 2;
  *                       ARCamera camera = 3; double timestamp = 4; }
  * ObjectAnnotation    { int32 object_id = 1; repeated AnnotatedKeyPoint keypoints = 2;
  *                       float visibility = 3; }
  * AnnotatedKeyPoint   { int32 id = 1; Point3D point_3d = 2; NormalizedPoint2D point_2d = 3; }
  * Point3D             { float x = 1; float y = 2; float z = 3; }
  * NormalizedPoint2D   { float x = 1; float y = 2; float depth = 3; }
  * ARCamera            { repeated float transform = 3 [packed];
  *                       int32 image_resolution_width = 5; int32 image_resolution_height = 6;
  *                       repeated float intrinsics = 7 [packed];
  *                       repeated float view_matrix = 9 [packed]; }
  * }}}
  *
  * The frame generator mirrors objectron_processor.py:40-104 (parse +
  * 9-keypoint gate + frames-with-objects filter), :126-128 (every-Nth
  * sampling) and :158-196 (G20 keypoints → center/dims with the
  * OpenGL→CV axis conversion).
  */
object ObjectronPb {

  final case class Camera(
      intrinsics: Array[Float],
      viewMatrix: Array[Float],
      width: Option[Int],
      height: Option[Int])
  final case class ObjAnn(
      objectId: Int,
      visibility: Float,
      kp3d: Array[Array[Float]],
      kp2d: Array[Array[Float]])
  final case class Frame(
      frameId: Int,
      timestamp: Double,
      camera: Option[Camera],
      objects: Seq[ObjAnn])

  // ---- wire-format primitives --------------------------------------------

  private[vlm] final class Cur(val b: Array[Byte], var p: Int, val end: Int) {
    def hasNext: Boolean = p < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      var more = true
      while (more) {
        val x = b(p) & 0xff
        p += 1
        out |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      out
    }
    def fixed32(): Int = {
      val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      p += 4; v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      p += 8; v
    }
    /** Length-delimited payload: returns a sub-cursor and advances. */
    def sub(): Cur = {
      val len = varint().toInt
      val c = new Cur(b, p, p + len)
      p += len
      c
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => p += 8
      case 2 => p += varint().toInt
      case 5 => p += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  /** `repeated float [packed]` (wire 2) with unpacked (wire 5) fallback. */
  private[vlm] def readFloats(c: Cur, wire: Int, acc: scala.collection.mutable.ArrayBuffer[Float]): Unit =
    if (wire == 2) {
      val s = c.sub()
      while (s.hasNext) acc += java.lang.Float.intBitsToFloat(s.fixed32())
    } else acc += java.lang.Float.intBitsToFloat(c.fixed32())

  private def parsePoint(c: Cur, n: Int): Array[Float] = {
    val out = new Array[Float](n)
    while (c.hasNext) {
      val tag = c.varint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (f >= 1 && f <= n && w == 5) out(f - 1) = java.lang.Float.intBitsToFloat(c.fixed32())
      else c.skip(w)
    }
    out
  }

  private def parseKeypoint(c: Cur): (Option[Array[Float]], Option[Array[Float]]) = {
    var p3: Option[Array[Float]] = None
    var p2: Option[Array[Float]] = None
    while (c.hasNext) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (2, 2) => p3 = Some(parsePoint(c.sub(), 3))
        case (3, 2) => p2 = Some(parsePoint(c.sub(), 3)) // (x, y, depth)
        case (_, w) => c.skip(w)
      }
    }
    (p3, p2)
  }

  private def parseObject(c: Cur): ObjAnn = {
    var id = 0
    var vis = 0.0f
    val kp3 = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val kp2 = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (c.hasNext) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => id = c.varint().toInt
        case (2, 2) =>
          val (p3, p2) = parseKeypoint(c.sub())
          p3.foreach(kp3 += _)
          p2.foreach(kp2 += _)
        case (3, 5) => vis = java.lang.Float.intBitsToFloat(c.fixed32())
        case (_, w) => c.skip(w)
      }
    }
    ObjAnn(id, vis, kp3.toArray, kp2.toArray)
  }

  private def parseCamera(c: Cur): Camera = {
    val intr = scala.collection.mutable.ArrayBuffer.empty[Float]
    val view = scala.collection.mutable.ArrayBuffer.empty[Float]
    var w: Option[Int] = None
    var h: Option[Int] = None
    while (c.hasNext) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (5, 0)    => w = Some(c.varint().toInt)
        case (6, 0)    => h = Some(c.varint().toInt)
        case (7, wire) => readFloats(c, wire, intr)
        case (9, wire) => readFloats(c, wire, view)
        case (_, wire) => c.skip(wire)
      }
    }
    Camera(intr.toArray, view.toArray, w, h)
  }

  private def parseFrame(c: Cur): Frame = {
    var id = 0
    var ts = 0.0
    var cam: Option[Camera] = None
    val objs = scala.collection.mutable.ArrayBuffer.empty[ObjAnn]
    while (c.hasNext) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => id = c.varint().toInt
        case (2, 2) =>
          val o = parseObject(c.sub())
          // Objectron boxes need 9 keypoints: 1 center + 8 corners
          // (objectron_processor.py:85-88)
          if (o.kp3d.length >= 9) objs += o
        case (3, 2) => cam = Some(parseCamera(c.sub()))
        case (4, 1) => ts = java.lang.Double.longBitsToDouble(c.fixed64())
        case (_, w) => c.skip(w)
      }
    }
    Frame(id, ts, cam, objs.toSeq)
  }

  /** Parse a whole `.pbdata` payload into frame annotations. */
  def parseSequence(bytes: Array[Byte]): Seq[Frame] = {
    val c = new Cur(bytes, 0, bytes.length)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    while (c.hasNext) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (2, 2) => frames += parseFrame(c.sub())
        case (_, w) => c.skip(w)
      }
    }
    frames.toSeq
  }

  // ---- G20: keypoints → 9-DoF box ----------------------------------------

  final case class Box9(
      x: Double, y: Double, z: Double,
      xl: Double, yl: Double, zl: Double,
      pitch: Double, yaw: Double, roll: Double,
      category: String, object_id: String, visibility: Double)

  /** Center from keypoint 0 with the OpenGL→CV flip (y, z negated);
    * dimensions from corner distances: width = ‖c₂−c₁‖ (x), height =
    * ‖c₅−c₁‖ (y), depth = ‖c₃−c₁‖ (z); identity rotation — keypoints are
    * already world-space (objectron_processor.py:158-196).
    */
  def boxFromKeypoints(kp3d: Array[Array[Float]], category: String, objectId: String, visibility: Double): Box9 = {
    require(kp3d.length >= 9, s"need 9 keypoints, got ${kp3d.length}")
    def norm(a: Array[Float], b: Array[Float]): Double =
      math.sqrt((0 until 3).map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum)
    val c0 = kp3d(0)
    val corners = kp3d.slice(1, 9)
    Box9(
      x = c0(0), y = -c0(1), z = -c0(2),
      xl = norm(corners(1), corners(0)),
      yl = norm(corners(4), corners(0)),
      zl = norm(corners(2), corners(0)),
      pitch = 0.0, yaw = 0.0, roll = 0.0,
      category = category, object_id = objectId, visibility = visibility
    )
  }

  // ---- S9 source: one .pbdata file → many unified frame rows -------------

  final case class Camera9(
      fx: Option[Double], fy: Option[Double], cx: Option[Double], cy: Option[Double],
      image_width: Option[Int], image_height: Option[Int],
      intrinsics: Option[Seq[Seq[Double]]],
      extrinsics: Option[Seq[Seq[Double]]])
  final case class ObjectronFrameRow(
      dataset: String, split: String, video_id: String, category: String,
      frame_id: String, image_id: String, filename: String,
      timestamp: Double,
      camera: Camera9,
      bounding_boxes_3d: Seq[Box9])

  private def reshape(v: Array[Float], rows: Int, cols: Int): Option[Seq[Seq[Double]]] =
    if (v.length >= rows * cols)
      Some((0 until rows).map(r => (0 until cols).map(c => v(r * cols + c).toDouble)))
    else None

  /** `binaryFile` scan + flatMap generator: frames-with-objects filter,
    * every-Nth sampling (F12, objectron_processor.py:126-128), G20 box
    * recovery, unified-frame projection. The decode is partition-local —
    * one task per file split, no driver involvement.
    */
  def objectronFrames(
      spark: SparkSession,
      dir: String,
      category: String,
      split: String = "train",
      sampleRate: Int = 10): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val videoId = path.split('/').last.stripSuffix(".pbdata")
        // per-file fault isolation: a corrupt payload skips that file, the
        // job continues (objectron_processor.py:100-104 returns [] on
        // parse errors)
        val frames =
          try parseSequence(bytes)
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[objectron] skipping undecodable $path: ${e.getMessage}")
            Seq.empty[Frame]
          }
        frames
          .filter(_.objects.nonEmpty)
          .grouped(sampleRate).map(_.head) // frames[::sampleRate]
          .zipWithIndex
          .map { case (f, idx) =>
            val cam = f.camera match {
              case Some(c) =>
                val k = reshape(c.intrinsics, 3, 3)
                Camera9(
                  fx = k.map(_(0)(0)), fy = k.map(_(1)(1)),
                  cx = k.map(_(0)(2)), cy = k.map(_(1)(2)),
                  image_width = c.width, image_height = c.height,
                  intrinsics = k,
                  extrinsics = reshape(c.viewMatrix, 4, 4)
                )
              case None => Camera9(None, None, None, None, None, None, None, None)
            }
            ObjectronFrameRow(
              dataset = "objectron", split = split, video_id = videoId,
              category = category,
              frame_id = f.frameId.toString,
              image_id = f"${videoId}_frame_$idx%04d",
              filename = f"frame_$idx%04d.jpg",
              timestamp = f.timestamp,
              camera = cam,
              bounding_boxes_3d = f.objects.map(o =>
                boxFromKeypoints(o.kp3d, category, o.objectId.toString, o.visibility))
            )
          }
      }
      .toDF()
  }
}
