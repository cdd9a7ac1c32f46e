package graft.vlm

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal read-only HDF5 decoder (SURVEY S7) for the subset the Hypersim
  * landing files use: superblock version 0, 8-byte offsets/lengths, v1
  * object headers (with continuations), v1 group B-trees + SNOD symbol
  * nodes, local heaps, and datasets with contiguous, compact, or chunked
  * layout of little-endian fixed-point (1/2/4/8-byte) or IEEE float
  * (2/4/8-byte) elements. Chunked datasets are indexed by the v1 chunk
  * B-tree and may carry a filter pipeline of DEFLATE (gzip, id 1) and/or
  * shuffle (id 2) — the combination libhdf5/h5py write for Hypersim's
  * raster `depth_meters` arrays (hypersim_processor.py:37-93); the small
  * `camera_keyframe_*` / `metadata_*_bounding_box_*` files stay on the
  * contiguous path (hypersim_processor.py:55-69, :128-133). Follows the
  * public HDF5 File Format Specification.
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

  private def decodeElem(b: ByteBuffer, p: Int, cls: Int, elemSize: Int, signed: Boolean): Double =
    (cls, elemSize) match {
      case (0, 1) => if (signed) b.get(p).toDouble else (b.get(p) & 0xff).toDouble
      case (0, 2) => if (signed) b.getShort(p).toDouble else u16(b, p).toDouble
      case (0, 4) => if (signed) b.getInt(p).toDouble else u32(b, p).toDouble
      case (0, 8) => b.getLong(p).toDouble
      case (1, 2) => halfToDouble(u16(b, p)) // float16 (Hypersim depth rasters)
      case (1, 4) => b.getFloat(p).toDouble
      case (1, 8) => b.getDouble(p)
      case other  => sys.error(s"unsupported (class, size) $other")
    }

  /** IEEE 754 binary16 → double (1 sign, 5 exponent, 10 mantissa bits). */
  private def halfToDouble(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1f
    val man = bits & 0x3ff
    if (exp == 0x1f) { if (man == 0) sign * Double.PositiveInfinity else Double.NaN }
    else if (exp == 0) sign * man * math.pow(2, -24) // subnormal
    else sign * (1024 + man) * math.pow(2, exp - 25)
  }

  /** Filter-pipeline message (0x000B), v1 or v2: ordered filter ids. */
  private def parseFilters(b: ByteBuffer, m: Msg): Seq[Int] = {
    val ver = b.get(m.off).toInt
    require(ver == 1 || ver == 2, s"unsupported filter pipeline version $ver")
    val nFilters = b.get(m.off + 1) & 0xff
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = if (ver == 1) m.off + 8 else m.off + 2
    var k = 0
    while (k < nFilters) {
      val id = u16(b, p)
      val hasName = ver == 1 || id >= 256
      val nameLen = if (hasName) u16(b, p + 2) else 0
      val base = if (hasName) p + 4 else p + 2
      val nClient = u16(b, base + 2)
      val namePadded = if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen
      p = base + 4 + namePadded + 4 * nClient
      if (ver == 1 && nClient % 2 == 1) p += 4 // client data padded to 8
      ids += id
      k += 1
    }
    ids.toSeq
  }

  /** Undo the filter pipeline on one chunk: filters apply in reverse
    * definition order on read; bit i of `mask` set means filter i was
    * skipped at write time. Supports DEFLATE (1) and shuffle (2). */
  private def defilter(raw: Array[Byte], filters: Seq[Int], mask: Long,
                       elemSize: Int, chunkBytes: Int): Array[Byte] = {
    var data = raw
    var i = filters.length - 1
    while (i >= 0) {
      if ((mask & (1L << i)) == 0) filters(i) match {
        case 1 => // DEFLATE (zlib stream)
          val inf = new java.util.zip.Inflater()
          inf.setInput(data)
          val out = new Array[Byte](chunkBytes)
          var off = 0
          while (!inf.finished() && off < chunkBytes) {
            val n = inf.inflate(out, off, chunkBytes - off)
            require(n > 0 || inf.finished(), "truncated DEFLATE chunk")
            off += n
          }
          inf.end()
          data = out
        case 2 => // shuffle: stored byte-plane-major; restore element-major
          val nElems = data.length / elemSize
          val out = new Array[Byte](data.length)
          var k = 0
          while (k < elemSize) {
            var e = 0
            while (e < nElems) { out(e * elemSize + k) = data(k * nElems + e); e += 1 }
            k += 1
          }
          data = out
        case f => sys.error(s"unsupported HDF5 filter id $f")
      }
      i -= 1
    }
    data
  }

  /** Walk a v1 chunk B-tree (node type 1): (storedSize, filterMask,
    * chunkOffsets, dataAddr) per chunk. Keys carry `dimensionality` 8-byte
    * offsets (the last is the trailing element-size dimension, always 0). */
  private def walkChunkTree(b: ByteBuffer, addr: Long, dimensionality: Int): Seq[(Int, Long, Array[Long], Long)] = {
    val p = addr.toInt
    require(b.getInt(p) == ByteBuffer.wrap("TREE".getBytes).order(ByteOrder.LITTLE_ENDIAN).getInt,
      "expected TREE node")
    require(b.get(p + 4) == 1, "expected a raw-data chunk B-tree (node type 1)")
    val level = b.get(p + 5).toInt
    val n = u16(b, p + 6)
    val keySize = 8 + 8 * dimensionality
    val base = p + 24
    (0 until n).flatMap { i =>
      val keyOff = base + i * (keySize + 8)
      val child = u64(b, keyOff + keySize)
      if (level > 0) walkChunkTree(b, child, dimensionality)
      else {
        val size = u32(b, keyOff).toInt
        val mask = u32(b, keyOff + 4)
        val offs = Array.tabulate(dimensionality - 1)(j => u64(b, keyOff + 8 + 8 * j))
        Seq((size, mask, offs, child))
      }
    }
  }

  /** Assemble a chunked dataset: defilter each chunk and scatter it into the
    * row-major output, clipping edge chunks that overhang the dataset dims
    * (HDF5 stores full-extent chunks). */
  private def readChunked(b: ByteBuffer, btAddr: Long, dims: Seq[Long], chunkDims: Array[Int],
                          filters: Seq[Int], cls: Int, signed: Boolean, elemSize: Int): Array[Double] = {
    val ndims = dims.length
    val out = new Array[Double](dims.product.toInt)
    val chunkElems = chunkDims.product
    val chunkBytes = chunkElems * elemSize
    val strides = new Array[Long](ndims)
    strides(ndims - 1) = 1L
    var s = ndims - 2
    while (s >= 0) { strides(s) = strides(s + 1) * dims(s + 1); s -= 1 }
    for ((size, mask, offs, addr) <- walkChunkTree(b, btAddr, ndims + 1)) {
      val raw = java.util.Arrays.copyOfRange(b.array(), addr.toInt, addr.toInt + size)
      val cb = buf(defilter(raw, filters, mask, elemSize, chunkBytes))
      val local = new Array[Int](ndims)
      var li = 0
      while (li < chunkElems) {
        var inBounds = true
        var g = 0L
        var j = 0
        while (j < ndims) {
          val gc = offs(j) + local(j)
          if (gc >= dims(j)) inBounds = false
          g += gc * strides(j)
          j += 1
        }
        if (inBounds) out(g.toInt) = decodeElem(cb, li * elemSize, cls, elemSize, signed)
        var k = ndims - 1 // odometer, last dim fastest (row-major chunk order)
        var moved = false
        while (k >= 0 && !moved) {
          local(k) += 1
          if (local(k) == chunkDims(k)) { local(k) = 0; k -= 1 } else moved = true
        }
        li += 1
      }
    }
    out
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
    // layout (0x0008) v3: class 0 compact, 1 contiguous, 2 chunked
    val lay = msgs.find(_.tpe == 0x0008).getOrElse(sys.error("no layout message"))
    require(b.get(lay.off) == 3, s"unsupported layout version ${b.get(lay.off)}")
    val n = dims.product.toInt
    b.get(lay.off + 1).toInt match {
      case 2 =>
        val dimensionality = b.get(lay.off + 2) & 0xff
        require(dimensionality == ndims + 1,
          s"chunk dimensionality $dimensionality != rank+1 ${ndims + 1}")
        val btAddr = u64(b, lay.off + 3)
        require(btAddr != Undef, "chunked dataset with undefined B-tree address")
        val chunkDims = Array.tabulate(ndims)(i => u32(b, lay.off + 11 + 4 * i).toInt)
        val filters = msgs.find(_.tpe == 0x000B).map(parseFilters(b, _)).getOrElse(Seq.empty)
        Dataset(dims, readChunked(b, btAddr, dims, chunkDims, filters, cls, signed, elemSize))
      case c =>
        val dataOff = c match {
          case 0 => lay.off + 4 // compact: size(2) then raw data
          case 1 =>
            val a = u64(b, lay.off + 2)
            require(a != Undef, "contiguous dataset with undefined address")
            a.toInt
          case other => sys.error(s"unsupported layout class $other")
        }
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          out(i) = decodeElem(b, dataOff + i * elemSize, cls, elemSize, signed)
          i += 1
        }
        Dataset(dims, out)
    }
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
