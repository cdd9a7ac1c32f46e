package graft.vlm

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal read-only HDF5 decoder (SURVEY S7) for the subset the Hypersim
  * landing files use: superblock version 0, 8-byte offsets/lengths, v1
  * object headers (with continuations), v1 group B-trees + SNOD symbol
  * nodes, local heaps, and datasets with contiguous or compact layout of
  * little-endian fixed-point (1/2/4/8-byte) or IEEE float (4/8-byte)
  * elements. Follows the public HDF5 File Format Specification; chunked or
  * compressed data is out of scope (Hypersim's
  * `camera_keyframe_*.hdf5` / `metadata_*_bounding_box_*.hdf5` are small
  * contiguous arrays read via `f['dataset'][:]`,
  * hypersim_processor.py:55-69, :128-133).
  */
object Hdf5Lite {

  final case class Dataset(dims: Seq[Long], data: Array[Double])

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF

  private def buf(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def u16(b: ByteBuffer, p: Int): Int = b.getShort(p) & 0xffff
  private def u32(b: ByteBuffer, p: Int): Long = b.getInt(p) & 0xffffffffL
  private def u64(b: ByteBuffer, p: Int): Long = b.getLong(p)

  /** Object-header message: (type, body offset). */
  private final case class Msg(tpe: Int, off: Int, size: Int)

  /** Parse a version-1 object header, following continuation messages. */
  private def objectHeaderMessages(b: ByteBuffer, addr: Long): Seq[Msg] = {
    val p0 = addr.toInt
    require(b.get(p0) == 1, s"unsupported object header version ${b.get(p0)}")
    val nMsgs = u16(b, p0 + 2)
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Msg]
    // (pos, end) block stack; v1 prefix is 16 bytes (12 + 4 alignment pad)
    var blocks = List((p0 + 16, p0 + 16 + u32(b, p0 + 8).toInt))
    while (blocks.nonEmpty && msgs.length < nMsgs) {
      var (pos, end) = blocks.head
      blocks = blocks.tail
      while (pos + 8 <= end && msgs.length < nMsgs) {
        val tpe = u16(b, pos)
        val size = u16(b, pos + 2)
        val body = pos + 8
        if (tpe == 0x0010) { // continuation: offset + length
          blocks = (u64(b, body).toInt, u64(b, body).toInt + u64(b, body + 8).toInt) :: blocks
        } else if (tpe != 0x0000) {
          msgs += Msg(tpe, body, size)
        }
        pos = body + size
      }
    }
    msgs.toSeq
  }

  private def heapString(b: ByteBuffer, heapDataAddr: Long, off: Long): String = {
    var p = (heapDataAddr + off).toInt
    val sb = new StringBuilder
    while (b.get(p) != 0) { sb.append(b.get(p).toChar); p += 1 }
    sb.toString
  }

  /** Walk a v1 group B-tree collecting (linkNameOffset, objectHeaderAddr). */
  private def walkBtree(b: ByteBuffer, addr: Long): Seq[(Long, Long)] = {
    val p = addr.toInt
    require(b.getInt(p) == ByteBuffer.wrap("TREE".getBytes).order(ByteOrder.LITTLE_ENDIAN).getInt,
      "expected TREE node")
    val level = b.get(p + 5).toInt
    val n = u16(b, p + 6)
    val childBase = p + 24 // sig4 + type1 + level1 + used2 + left8 + right8
    (0 until n).flatMap { i =>
      val child = u64(b, childBase + 8 + i * 16) // key_i(8) child_i(8) pairs
      if (level > 0) walkBtree(b, child) else readSnod(b, child)
    }
  }

  private def readSnod(b: ByteBuffer, addr: Long): Seq[(Long, Long)] = {
    val p = addr.toInt
    require(b.getInt(p) == ByteBuffer.wrap("SNOD".getBytes).order(ByteOrder.LITTLE_ENDIAN).getInt,
      "expected SNOD node")
    val n = u16(b, p + 6)
    (0 until n).map { i =>
      val e = p + 8 + i * 40 // symbol table entry: nameOff8 + hdrAddr8 + cache4 + res4 + scratch16
      (u64(b, e), u64(b, e + 8))
    }
  }

  private def decodeDataset(b: ByteBuffer, headerAddr: Long): Dataset = {
    val msgs = objectHeaderMessages(b, headerAddr)
    // dataspace (0x0001), v1: ver, ndims, flags, 5 reserved, dims
    val space = msgs.find(_.tpe == 0x0001).getOrElse(sys.error("no dataspace message"))
    val ndims = b.get(space.off + 1).toInt
    val dims = (0 until ndims).map(i => u64(b, space.off + 8 + 8 * i))
    // datatype (0x0003): version<<4 | class, 3 bitfield bytes, size
    val dt = msgs.find(_.tpe == 0x0003).getOrElse(sys.error("no datatype message"))
    val cls = b.get(dt.off) & 0x0f
    val signed = (b.get(dt.off + 1) & 0x08) != 0
    val elemSize = u32(b, dt.off + 4).toInt
    // layout (0x0008) v3: class 0 compact (size2 + inline) or 1 contiguous
    val lay = msgs.find(_.tpe == 0x0008).getOrElse(sys.error("no layout message"))
    require(b.get(lay.off) == 3, s"unsupported layout version ${b.get(lay.off)}")
    val n = dims.product.toInt
    val dataOff = b.get(lay.off + 1).toInt match {
      case 0 => lay.off + 4 // compact: size(2) then raw data
      case 1 =>
        val a = u64(b, lay.off + 2)
        require(a != Undef, "contiguous dataset with undefined address")
        a.toInt
      case c => sys.error(s"unsupported layout class $c (chunked/compressed not in the landing subset)")
    }
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = dataOff + i * elemSize
      out(i) = (cls, elemSize) match {
        case (0, 1) => if (signed) b.get(p).toDouble else (b.get(p) & 0xff).toDouble
        case (0, 2) => if (signed) b.getShort(p).toDouble else u16(b, p).toDouble
        case (0, 4) => if (signed) b.getInt(p).toDouble else u32(b, p).toDouble
        case (0, 8) => b.getLong(p).toDouble
        case (1, 4) => b.getFloat(p).toDouble
        case (1, 8) => b.getDouble(p)
        case other  => sys.error(s"unsupported (class, size) $other")
      }
      i += 1
    }
    Dataset(dims, out)
  }

  /** All named datasets in the root group. */
  def readDatasets(bytes: Array[Byte]): Map[String, Dataset] = {
    require(bytes.length > 96 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not an HDF5 file")
    val b = buf(bytes)
    require(b.get(8) == 0, s"unsupported superblock version ${b.get(8)}")
    require(b.get(13) == 8 && b.get(14) == 8, "only 8-byte offsets/lengths supported")
    val rootHeaderAddr = u64(b, 56 + 8) // root symbol-table entry: nameOff(8), headerAddr(8)
    val rootMsgs = objectHeaderMessages(b, rootHeaderAddr)
    val symtab = rootMsgs.find(_.tpe == 0x0011).getOrElse(sys.error("root has no symbol table"))
    val btreeAddr = u64(b, symtab.off)
    val heapAddr = u64(b, symtab.off + 8)
    // local heap: sig4 + ver1 + res3, dataSegSize8, freeListOff8, dataSegAddr8
    require(b.getInt(heapAddr.toInt) == ByteBuffer.wrap("HEAP".getBytes).order(ByteOrder.LITTLE_ENDIAN).getInt,
      "expected HEAP")
    val heapDataAddr = u64(b, heapAddr.toInt + 24)
    walkBtree(b, btreeAddr).map { case (nameOff, hdrAddr) =>
      heapString(b, heapDataAddr, nameOff) -> decodeDataset(b, hdrAddr)
    }.toMap
  }

  /** One dataset by name (Hypersim convention: `"dataset"`). */
  def readDataset(bytes: Array[Byte], name: String = "dataset"): Dataset =
    readDatasets(bytes).getOrElse(name, sys.error(s"dataset '$name' not found"))
}
