package graft.vlm

import java.nio.{ByteBuffer, ByteOrder}

/** Test-only HDF5 fixture writer following the same public File Format
  * Specification Hdf5Lite reads (superblock v0, v1 headers, local heap,
  * v1 B-tree + SNOD, contiguous/compact layouts).
  */
object Hdf5Fixtures {

  private val UNDEF = -1L

  /** Build a one-dataset HDF5 file.
    * @param dtClass 0 fixed-point, 1 float
    * @param writeElem writes one element at the buffer position
    */
  def makeHdf5(
      name: String, dims: Seq[Long], elemSize: Int, dtClass: Int,
      compact: Boolean, nElems: Int)(writeElem: (ByteBuffer, Int) => Unit): Array[Byte] = {
    val heapData = 168
    val treeAddr = 200L
    val snodAddr = 248L
    val dsetHdr = 296L
    def pad8(n: Int): Int = ((n + 7) / 8) * 8
    val dsBody = pad8(8 + 8 * dims.length)
    val dtBody = if (dtClass == 1) pad8(8 + 12) else pad8(8 + 8)
    val layBody = if (compact) pad8(4 + nElems * elemSize) else pad8(18)
    val hdrSize = (8 + dsBody) + (8 + dtBody) + (8 + layBody)
    val dataAddr = dsetHdr + 16 + hdrSize
    val total = (if (compact) dataAddr else dataAddr + nElems * elemSize).toInt
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)

    // superblock v0
    b.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // versions
    b.put(0.toByte); b.put(8.toByte); b.put(8.toByte); b.put(0.toByte) // shared, offsets, lengths
    b.putShort(4); b.putShort(16); b.putInt(0) // group k's, flags
    b.putLong(0); b.putLong(UNDEF); b.putLong(total.toLong); b.putLong(UNDEF)
    b.putLong(0); b.putLong(96); b.putInt(0); b.putInt(0); b.putLong(0); b.putLong(0) // root entry

    // root object header v1 @96: symbol table message
    b.position(96)
    b.put(1.toByte); b.put(0.toByte); b.putShort(1); b.putInt(1); b.putInt(24); b.putInt(0)
    b.putShort(0x0011); b.putShort(16); b.putInt(0)
    b.putLong(treeAddr); b.putLong(136L) // B-tree addr, local heap header addr

    // local heap @136
    b.position(136)
    b.put("HEAP".getBytes); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putLong(32); b.putLong(8L + name.length + 1); b.putLong(heapData.toLong)
    b.position(heapData + 8)
    b.put(name.getBytes); b.put(0.toByte) // name at heap offset 8

    // B-tree v1 @200: one SNOD child
    b.position(treeAddr.toInt)
    b.put("TREE".getBytes); b.put(0.toByte); b.put(0.toByte); b.putShort(1)
    b.putLong(UNDEF); b.putLong(UNDEF)
    b.putLong(8); b.putLong(snodAddr); b.putLong(8) // key0, child0, key1

    // SNOD @248: one entry
    b.position(snodAddr.toInt)
    b.put("SNOD".getBytes); b.put(1.toByte); b.put(0.toByte); b.putShort(1)
    b.putLong(8); b.putLong(dsetHdr); b.putInt(0); b.putInt(0); b.putLong(0); b.putLong(0)

    // dataset object header v1 @296; each message body padded to its
    // declared (8-aligned) size so the reader's size-based walk lands on
    // the next message header
    b.position(dsetHdr.toInt)
    b.put(1.toByte); b.put(0.toByte); b.putShort(3); b.putInt(1); b.putInt(hdrSize); b.putInt(0)
    def msg(tpe: Int, declared: Int)(body: => Unit): Unit = {
      b.putShort(tpe.toShort); b.putShort(declared.toShort); b.putInt(0)
      val start = b.position()
      body
      while (b.position() < start + declared) b.put(0.toByte)
    }
    msg(0x0001, dsBody) { // dataspace
      b.put(1.toByte); b.put(dims.length.toByte); b.put(0.toByte); b.put(Array.fill(5)(0.toByte))
      dims.foreach(b.putLong)
    }
    msg(0x0003, dtBody) { // datatype
      b.put(((1 << 4) | dtClass).toByte)
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // bit field (LE, unsigned)
      b.putInt(elemSize)
      if (dtClass == 1) { // float32 properties
        b.putShort(0); b.putShort(32); b.put(23.toByte); b.put(8.toByte)
        b.put(0.toByte); b.put(23.toByte); b.putInt(127)
      } else { // fixed-point properties
        b.putShort(0); b.putShort((elemSize * 8).toShort); b.putInt(0)
      }
    }
    msg(0x0008, layBody) { // layout v3
      if (compact) {
        b.put(3.toByte); b.put(0.toByte); b.putShort((nElems * elemSize).toShort)
        (0 until nElems).foreach(writeElem(b, _))
      } else {
        b.put(3.toByte); b.put(1.toByte); b.putLong(dataAddr); b.putLong(nElems.toLong * elemSize)
      }
    }
    if (!compact) {
      b.position(dataAddr.toInt)
      (0 until nElems).foreach(writeElem(b, _))
    }
    b.array()
  }

  /** Build a one-dataset HDF5 file with CHUNKED layout (class 2), a v1 chunk
    * B-tree index, and an optional filter pipeline. `filters` are pipeline
    * ids in definition order — e.g. Seq(2, 1) is shuffle-then-DEFLATE, the
    * h5py `compression="gzip", shuffle=True` combination. Edge chunks are
    * stored full-extent (zero-padded), as libhdf5 does.
    * @param writeElem writes the element with GLOBAL row-major index i at
    *                  the buffer's current position
    */
  def makeChunkedHdf5(
      name: String, dims: Seq[Long], chunkDims: Seq[Int], elemSize: Int, dtClass: Int,
      filters: Seq[Int] = Seq(1))(writeElem: (ByteBuffer, Int) => Unit): Array[Byte] = {
    require(dims.length == chunkDims.length)
    val ndims = dims.length
    val heapData = 168
    val treeAddr = 200L
    val snodAddr = 248L
    val dsetHdr = 296L
    def pad8(n: Int): Int = ((n + 7) / 8) * 8

    // --- build raw chunks (full extent, zero-padded), apply filters
    val chunkElems = chunkDims.product
    val nChunksPerDim = dims.zip(chunkDims).map { case (d, c) => ((d + c - 1) / c).toInt }
    val dimStrides = new Array[Long](ndims)
    dimStrides(ndims - 1) = 1L
    for (i <- (0 to ndims - 2).reverse) dimStrides(i) = dimStrides(i + 1) * dims(i + 1)
    def chunkGrid(idx: Int): Seq[Int] = { // chunk grid coords from rank
      var r = idx
      nChunksPerDim.reverse.map { n => val c = r % n; r /= n; c }.reverse
    }
    val chunks = (0 until nChunksPerDim.product).map { ci =>
      val grid = chunkGrid(ci)
      val origin = grid.zip(chunkDims).map { case (g, c) => g.toLong * c }
      val cb = ByteBuffer.allocate(chunkElems * elemSize).order(ByteOrder.LITTLE_ENDIAN)
      val local = new Array[Int](ndims)
      var li = 0
      while (li < chunkElems) {
        val global = origin.indices.map(j => origin(j) + local(j))
        if (global.indices.forall(j => global(j) < dims(j))) {
          val gIdx = global.indices.map(j => global(j) * dimStrides(j)).sum.toInt
          cb.position(li * elemSize)
          writeElem(cb, gIdx)
        } // else leave zero padding
        var k = ndims - 1
        var moved = false
        while (k >= 0 && !moved) {
          local(k) += 1
          if (local(k) == chunkDims(k)) { local(k) = 0; k -= 1 } else moved = true
        }
        li += 1
      }
      var data = cb.array()
      filters.foreach {
        case 2 => // shuffle: element-major → byte-plane-major
          val n = data.length / elemSize
          val out = new Array[Byte](data.length)
          for (k <- 0 until elemSize; e <- 0 until n) out(k * n + e) = data(e * elemSize + k)
          data = out
        case 1 => // DEFLATE
          val d = new java.util.zip.Deflater()
          d.setInput(data); d.finish()
          val out = new Array[Byte](data.length + 64)
          val n = d.deflate(out)
          require(d.finished(), "fixture chunk did not compress in one pass")
          d.end()
          data = java.util.Arrays.copyOf(out, n)
        case f => sys.error(s"fixture: unsupported filter $f")
      }
      (origin, data)
    }

    // --- message sizes
    val dsBody = pad8(8 + 8 * ndims)
    val dtBody = if (dtClass == 1) pad8(8 + 12) else pad8(8 + 8)
    // v1 pipeline: 8-byte header + per filter: id2+nameLen2+flags2+nclient2,
    // no name, one 4-byte client value + 4 pad = 16 bytes
    val pipeBody = if (filters.isEmpty) 0 else pad8(8 + filters.length * 16)
    val layBody = pad8(3 + 8 + 4 * (ndims + 1))
    val hdrSize = (8 + dsBody) + (8 + dtBody) +
      (if (filters.isEmpty) 0 else 8 + pipeBody) + (8 + layBody)

    val keySize = 8 + 8 * (ndims + 1)
    val btAddr = dsetHdr + 16 + hdrSize
    val btSize = 24 + chunks.length * (keySize + 8) + keySize
    val dataStart = btAddr + btSize
    val chunkAddrs = chunks.scanLeft(dataStart) { case (a, (_, d)) => a + d.length }
    val total = chunkAddrs.last.toInt
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)

    // superblock v0 + root entry (same as makeHdf5)
    b.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(0.toByte); b.put(8.toByte); b.put(8.toByte); b.put(0.toByte)
    b.putShort(4); b.putShort(16); b.putInt(0)
    b.putLong(0); b.putLong(UNDEF); b.putLong(total.toLong); b.putLong(UNDEF)
    b.putLong(0); b.putLong(96); b.putInt(0); b.putInt(0); b.putLong(0); b.putLong(0)

    // root object header v1 @96: symbol table message
    b.position(96)
    b.put(1.toByte); b.put(0.toByte); b.putShort(1); b.putInt(1); b.putInt(24); b.putInt(0)
    b.putShort(0x0011); b.putShort(16); b.putInt(0)
    b.putLong(treeAddr); b.putLong(136L)

    // local heap @136
    b.position(136)
    b.put("HEAP".getBytes); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putLong(32); b.putLong(8L + name.length + 1); b.putLong(heapData.toLong)
    b.position(heapData + 8)
    b.put(name.getBytes); b.put(0.toByte)

    // group B-tree v1 @200 + SNOD @248
    b.position(treeAddr.toInt)
    b.put("TREE".getBytes); b.put(0.toByte); b.put(0.toByte); b.putShort(1)
    b.putLong(UNDEF); b.putLong(UNDEF)
    b.putLong(8); b.putLong(snodAddr); b.putLong(8)
    b.position(snodAddr.toInt)
    b.put("SNOD".getBytes); b.put(1.toByte); b.put(0.toByte); b.putShort(1)
    b.putLong(8); b.putLong(dsetHdr); b.putInt(0); b.putInt(0); b.putLong(0); b.putLong(0)

    // dataset object header
    b.position(dsetHdr.toInt)
    val nMsgs = if (filters.isEmpty) 3 else 4
    b.put(1.toByte); b.put(0.toByte); b.putShort(nMsgs.toShort); b.putInt(1); b.putInt(hdrSize); b.putInt(0)
    def msg(tpe: Int, declared: Int)(body: => Unit): Unit = {
      b.putShort(tpe.toShort); b.putShort(declared.toShort); b.putInt(0)
      val start = b.position()
      body
      while (b.position() < start + declared) b.put(0.toByte)
    }
    msg(0x0001, dsBody) { // dataspace
      b.put(1.toByte); b.put(ndims.toByte); b.put(0.toByte); b.put(Array.fill(5)(0.toByte))
      dims.foreach(b.putLong)
    }
    msg(0x0003, dtBody) { // datatype
      b.put(((1 << 4) | dtClass).toByte)
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putInt(elemSize)
      if (dtClass == 1) {
        b.putShort(0); b.putShort(32); b.put(23.toByte); b.put(8.toByte)
        b.put(0.toByte); b.put(23.toByte); b.putInt(127)
      } else {
        b.putShort(0); b.putShort((elemSize * 8).toShort); b.putInt(0)
      }
    }
    if (filters.nonEmpty) msg(0x000B, pipeBody) { // filter pipeline v1
      b.put(1.toByte); b.put(filters.length.toByte)
      b.put(Array.fill(6)(0.toByte))
      filters.foreach { id =>
        b.putShort(id.toShort); b.putShort(0) // no name
        b.putShort(0) // flags
        b.putShort(1) // one client value
        b.putInt(if (id == 1) 6 else elemSize) // level / elem size
        b.putInt(0) // odd client count → 4-byte pad
      }
    }
    msg(0x0008, layBody) { // layout v3 class 2 (chunked)
      b.put(3.toByte); b.put(2.toByte); b.put((ndims + 1).toByte)
      b.putLong(btAddr)
      chunkDims.foreach(c => b.putInt(c))
      b.putInt(elemSize)
    }

    // chunk B-tree (node type 1, level 0): key_i child_i ... key_n
    b.position(btAddr.toInt)
    b.put("TREE".getBytes); b.put(1.toByte); b.put(0.toByte); b.putShort(chunks.length.toShort)
    b.putLong(UNDEF); b.putLong(UNDEF)
    chunks.zipWithIndex.foreach { case ((origin, data), i) =>
      b.putInt(data.length); b.putInt(0) // stored size, filter mask
      origin.foreach(b.putLong); b.putLong(0) // chunk offsets + elem-size dim
      b.putLong(chunkAddrs(i))
    }
    b.putInt(0); b.putInt(0); (0 to ndims).foreach(_ => b.putLong(0)) // final key (unused)

    chunks.zipWithIndex.foreach { case ((_, data), i) =>
      b.position(chunkAddrs(i).toInt); b.put(data)
    }
    b.array()
  }

}
