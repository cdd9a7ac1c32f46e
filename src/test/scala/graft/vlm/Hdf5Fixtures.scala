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

}
