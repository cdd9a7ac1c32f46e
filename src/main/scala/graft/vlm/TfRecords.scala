package graft.vlm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Objectron TFRecord evaluation path (SURVEY S9 sibling): the
  * reference's eval loop reads TFRecord shards of serialized `tf.Example`s
  * and `ObjectronParser` decodes the label features
  * (`objectron/dataset/eval.py:99-112`, `parser.py:34-108`,
  * `schema/features.py:8-62`). This is that path without TensorFlow: the
  * TFRecord container and the Example/SequenceExample protos are both
  * public stable wire formats, read here with the same hand-rolled
  * varint/fixed primitives as the `.pbdata` reader ([[ObjectronPb]]).
  *
  * Container framing (TFRecord): per record
  * `[length: uint64 LE][masked crc32c(length): uint32 LE][data]
  * [masked crc32c(data): uint32 LE]`, mask
  * `((crc >>> 15) | (crc << 17)) + 0xa282ead8`. Both CRCs are VERIFIED —
  * a torn shard fails loudly instead of yielding garbage rows.
  *
  * Proto shapes (tensorflow/core/example/example.proto, feature.proto —
  * public):
  * {{{
  * Example         { Features features = 1; }
  * SequenceExample { Features context = 1; FeatureLists feature_lists = 2; }
  * Features        { map<string, Feature> feature = 1; }      // entry: 1=key 2=value
  * FeatureLists    { map<string, FeatureList> feature_list = 1; }
  * FeatureList     { repeated Feature feature = 1; }
  * Feature         { BytesList 1 | FloatList 2 | Int64List 3 }
  * BytesList       { repeated bytes value = 1; }
  * FloatList       { repeated float value = 1 [packed]; }
  * Int64List       { repeated int64 value = 1 [packed]; }
  * }}}
  */
object TfRecords {
  import ObjectronPb.{Cur, readFloats}

  // ---- TFRecord container ------------------------------------------------

  private val CrcMaskDelta = 0xa282ead8L

  private def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + CrcMaskDelta) & 0xffffffffL
  }

  private def u32le(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], p: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Iterate the records of one TFRecord shard, verifying both CRCs. */
  def records(bytes: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var p = 0
    override def hasNext: Boolean = p < bytes.length
    override def next(): Array[Byte] = {
      require(p + 12 <= bytes.length, s"truncated TFRecord header at $p")
      val len = u64le(bytes, p)
      // u64le yields the raw 64-bit value as a SIGNED long: a corrupt or
      // crafted length near 2^63 is negative (or huge), and `dataOff + len`
      // would wrap negative and slip past the bounds check below, failing
      // later with a confusing copyOfRange error instead of this message —
      // bound it BEFORE any arithmetic that can overflow
      require(len >= 0 && len <= bytes.length,
        s"corrupt TFRecord length $len at offset $p (shard is ${bytes.length} bytes)")
      require(maskedCrc32c(bytes, p, 8) == u32le(bytes, p + 8),
        s"TFRecord length CRC mismatch at offset $p")
      val dataOff = p + 12
      require(dataOff + len + 4 <= bytes.length, s"truncated TFRecord data at $p")
      val data = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
      require(maskedCrc32c(bytes, dataOff, len.toInt) == u32le(bytes, dataOff + len.toInt),
        s"TFRecord data CRC mismatch at offset $p")
      p = dataOff + len.toInt + 4
      data
    }
  }

  // ---- tf.Example / tf.SequenceExample wire parse ------------------------

  /** One decoded Feature: exactly one of the three lists is populated. */
  final case class Feature(
      bytes: Seq[Array[Byte]] = Nil,
      floats: Seq[Float] = Nil,
      int64s: Seq[Long] = Nil)

  /** Submessage read guarded on the wire type: a matching field number
    * with a non-length-delimited encoding means the payload is not the
    * message this parser expects — fail loudly (the container CRCs are
    * verified for exactly this contract) instead of misreading a varint
    * value as a byte length and yielding garbage rows.
    */
  private def delimited(c: Cur, wire: Int, what: String): Cur = {
    require(wire == 2, s"$what: expected length-delimited (wire 2), got wire type $wire")
    c.sub()
  }

  private def parseFeature(c: Cur): Feature = {
    // proto merge semantics: repeated occurrences of the same field in one
    // message CONCATENATE (a message split into chunks is legal wire data),
    // so every list appends to what earlier occurrences decoded
    var f = Feature()
    while (c.hasNext) {
      val tag = c.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => // BytesList
          val bl = delimited(c, wire, "Feature.bytes_list")
          val acc = Seq.newBuilder[Array[Byte]]
          while (bl.hasNext) {
            val t = bl.varint()
            if ((t >> 3).toInt == 1) {
              val s = delimited(bl, (t & 7).toInt, "BytesList.value")
              acc += java.util.Arrays.copyOfRange(s.b, s.p, s.end)
            } else bl.skip((t & 7).toInt)
          }
          f = f.copy(bytes = f.bytes ++ acc.result())
        case 2 => // FloatList (packed or not)
          val fl = delimited(c, wire, "Feature.float_list")
          val acc = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (fl.hasNext) {
            val t = fl.varint()
            if ((t >> 3).toInt == 1) readFloats(fl, (t & 7).toInt, acc)
            else fl.skip((t & 7).toInt)
          }
          f = f.copy(floats = f.floats ++ acc.toSeq)
        case 3 => // Int64List (packed varints or single)
          val il = delimited(c, wire, "Feature.int64_list")
          val acc = Seq.newBuilder[Long]
          while (il.hasNext) {
            val t = il.varint()
            if ((t >> 3).toInt == 1) {
              if ((t & 7).toInt == 2) { val s = il.sub(); while (s.hasNext) acc += s.varint() }
              else acc += il.varint()
            } else il.skip((t & 7).toInt)
          }
          f = f.copy(int64s = f.int64s ++ acc.result())
        case _ => c.skip(wire)
      }
    }
    f
  }

  /** map<string, Feature> — entries are messages with 1=key, 2=value. */
  private def parseFeatureMap(c: Cur): Map[String, Feature] = {
    val out = Map.newBuilder[String, Feature]
    while (c.hasNext) {
      val tag = c.varint()
      if ((tag >> 3).toInt == 1) {
        val entry = delimited(c, (tag & 7).toInt, "Features.feature entry")
        var key: String = null
        var value: Feature = Feature()
        while (entry.hasNext) {
          val t = entry.varint()
          (t >> 3).toInt match {
            case 1 =>
              val s = delimited(entry, (t & 7).toInt, "feature map key")
              key = new String(s.b, s.p, s.end - s.p, java.nio.charset.StandardCharsets.UTF_8)
            case 2 => value = parseFeature(delimited(entry, (t & 7).toInt, "feature map value"))
            case _ => entry.skip((t & 7).toInt)
          }
        }
        if (key != null) out += key -> value
      } else c.skip((tag & 7).toInt)
    }
    out.result()
  }

  /** Parse a serialized `tf.Example` into its feature map. */
  def parseExample(bytes: Array[Byte]): Map[String, Feature] = {
    val c = new Cur(bytes, 0, bytes.length)
    var fm = Map.empty[String, Feature]
    while (c.hasNext) {
      val tag = c.varint()
      // merge, don't replace: a Features message split across two field-1
      // occurrences is legal proto (map entries union, later keys win)
      if ((tag >> 3).toInt == 1)
        fm = fm ++ parseFeatureMap(delimited(c, (tag & 7).toInt, "Example.features"))
      else c.skip((tag & 7).toInt)
    }
    fm
  }

  /** Parse a serialized `tf.SequenceExample` into (context, feature_lists).
    * A feature list holds one Feature per sequence step, in order.
    */
  def parseSequenceExample(bytes: Array[Byte]): (Map[String, Feature], Map[String, Seq[Feature]]) = {
    val c = new Cur(bytes, 0, bytes.length)
    var context = Map.empty[String, Feature]
    var lists = Map.empty[String, Seq[Feature]]
    while (c.hasNext) {
      val tag = c.varint()
      (tag >> 3).toInt match {
        case 1 =>
          context = context ++ parseFeatureMap(
            delimited(c, (tag & 7).toInt, "SequenceExample.context"))
        case 2 => // FeatureLists
          val fls = delimited(c, (tag & 7).toInt, "SequenceExample.feature_lists")
          val out = Map.newBuilder[String, Seq[Feature]]
          while (fls.hasNext) {
            val t = fls.varint()
            if ((t >> 3).toInt == 1) {
              val entry = delimited(fls, (t & 7).toInt, "FeatureLists.feature_list entry")
              var key: String = null
              val feats = Seq.newBuilder[Feature]
              while (entry.hasNext) {
                val et = entry.varint()
                (et >> 3).toInt match {
                  case 1 =>
                    val s = delimited(entry, (et & 7).toInt, "feature list key")
                    key = new String(s.b, s.p, s.end - s.p, java.nio.charset.StandardCharsets.UTF_8)
                  case 2 => // FeatureList { repeated Feature feature = 1 }
                    val fl = delimited(entry, (et & 7).toInt, "feature list value")
                    while (fl.hasNext) {
                      val ft = fl.varint()
                      if ((ft >> 3).toInt == 1)
                        feats += parseFeature(delimited(fl, (ft & 7).toInt, "FeatureList.feature"))
                      else fl.skip((ft & 7).toInt)
                    }
                  case _ => entry.skip((et & 7).toInt)
                }
              }
              if (key != null) out += key -> feats.result()
            } else fls.skip((t & 7).toInt)
          }
          lists = lists ++ out.result()
        case _ => c.skip((tag & 7).toInt)
      }
    }
    (context, lists)
  }

  // ---- Objectron evaluation labels (parser.py semantics) -----------------

  /** One visible annotated instance: 9 keypoints, 2D (x,y pairs — the
    * parser drops the depth column) and 3D.
    */
  final case class EvalObj(visibility: Float, kp2d: Seq[Seq[Float]], kp3d: Seq[Seq[Float]])

  /** One frame's evaluation label, as `ObjectronParser.parse_example` +
    * `parse_camera` + `parse_plane` produce it: instances filtered to
    * `visibility > 0.1`, camera projection/view 4×4, ground plane.
    */
  final case class EvalFrame(
      path: String,
      record_idx: Int,
      image_id: Option[Long],
      timestamp: Option[Long],
      n_instances: Option[Long],
      visibilities: Seq[Float],
      objects: Seq[EvalObj],
      projection: Option[Seq[Seq[Float]]],
      view: Option[Seq[Seq[Float]]],
      plane_center: Seq[Float],
      plane_normal: Seq[Float],
      image_bytes: Long)

  private val VisThresh = 0.1f

  private def reshape(v: Seq[Float], cols: Int): Seq[Seq[Float]] =
    v.grouped(cols).toSeq

  /** `parser.py:34-66` on one decoded feature map. */
  def evalLabel(path: String, idx: Int, fm: Map[String, Feature]): EvalFrame = {
    val vis = fm.get("object/visibility").map(_.floats).getOrElse(Nil)
    val keep = vis.map(_ > VisThresh)
    def keepRows[T](rows: Seq[T]): Seq[T] =
      rows.zip(keep).collect { case (r, true) => r }
    // (-1, 9, 3): rows of 27 floats per instance; 2D keeps only (x, y)
    val p2 = fm.get("point_2d").map(f => reshape(f.floats, 27)).getOrElse(Nil)
      .map(inst => reshape(inst, 3).map(_.take(2)))
    val p3 = fm.get("point_3d").map(f => reshape(f.floats, 27)).getOrElse(Nil)
      .map(inst => reshape(inst, 3))
    val keptVis = vis.filter(_ > VisThresh)
    val kept2 = keepRows(p2)
    val kept3 = keepRows(p3)
    val objects = keptVis.zipWithIndex.map { case (v, i) =>
      EvalObj(v, kept2.lift(i).getOrElse(Nil), kept3.lift(i).getOrElse(Nil))
    }
    def mat4(name: String): Option[Seq[Seq[Float]]] =
      fm.get(name).map(_.floats).filter(_.size == 16).map(v => reshape(v, 4))
    EvalFrame(
      path = path, record_idx = idx,
      image_id = fm.get("image/id").flatMap(_.int64s.headOption),
      timestamp = fm.get("image/timestamp").flatMap(_.int64s.headOption),
      n_instances = fm.get("instance_num").flatMap(_.int64s.headOption),
      visibilities = vis,
      objects = objects,
      projection = mat4("camera/projection"),
      view = mat4("camera/view"),
      plane_center = fm.get("plane/center").map(_.floats).getOrElse(Nil),
      plane_normal = fm.get("plane/normal").map(_.floats).getOrElse(Nil),
      image_bytes = fm.get("image/encoded").flatMap(_.bytes.headOption).map(_.length.toLong).getOrElse(0L))
  }

  /** TFRecord shards of `tf.Example`s → evaluation-label frames — the
    * `eval.py` read path as a `binaryFile` scan + per-file record flatMap
    * (each task decodes its own shards; nothing but label rows shuffles).
    */
  def objectronEvalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        records(bytes).zipWithIndex.map { case (rec, i) =>
          evalLabel(path, i, parseExample(rec))
        }
      }
      .toDF()
  }
}
