package graft.vlm

import java.nio.{ByteBuffer, ByteOrder}

/** Round-trips Hdf5Lite against fixture files laid out per the public HDF5
  * File Format Specification (superblock v0, v1 object headers, local heap,
  * v1 B-tree + SNOD, contiguous and compact layouts).
  */
class Hdf5LiteSpec extends SparkSpec {

  private val UNDEF = -1L

  /** Build a one-dataset HDF5 file.
    * @param dtClass 0 fixed-point, 1 float
    * @param writeElem writes one element at the buffer position
    */
  private def makeHdf5(
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

  test("contiguous float32 dataset decodes with dims (S7; hypersim camera keyframes shape)") {
    val vals = Array(1.5f, -2f, 3f, 4f, 5.25f, 6f)
    val bytes = makeHdf5("dataset", Seq(2L, 3L), 4, dtClass = 1, compact = false, nElems = 6) {
      (b, i) => b.putFloat(vals(i))
    }
    val ds = Hdf5Lite.readDataset(bytes)
    assert(ds.dims == Seq(2L, 3L))
    assert(ds.data.toSeq == vals.map(_.toDouble).toSeq)
  }

  test("compact uint16 dataset decodes (S7 fixed-point path)") {
    val vals = Array(0, 1000, 65535)
    val bytes = makeHdf5("dataset", Seq(3L), 2, dtClass = 0, compact = true, nElems = 3) {
      (b, i) => b.putShort(vals(i).toShort)
    }
    val ds = Hdf5Lite.readDataset(bytes)
    assert(ds.dims == Seq(3L))
    assert(ds.data.toSeq == Seq(0.0, 1000.0, 65535.0))
  }

  test("unknown dataset name and non-hdf5 payloads fail loudly") {
    val bytes = makeHdf5("dataset", Seq(1L), 4, dtClass = 1, compact = false, nElems = 1) {
      (b, _) => b.putFloat(1f)
    }
    intercept[RuntimeException](Hdf5Lite.readDataset(bytes, "missing"))
    intercept[IllegalArgumentException](Hdf5Lite.readDatasets(new Array[Byte](200)))
  }

  test("hdf5DepthDecoder plugs into the landing-zone raster job (S7 -> A5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5")
    val vals = Array(1.0f, 2.0f, 3.0f)
    val bytes = makeHdf5("dataset", Seq(3L), 4, dtClass = 1, compact = false, nElems = 3) {
      (b, i) => b.putFloat(vals(i))
    }
    java.nio.file.Files.write(dir.resolve("depth.hdf5"), bytes)
    val stats = LandingZone.depthStats(
      LandingZone.depthSamples(spark, dir.toString, LandingZone.hdf5Decoder))
      .select("depth_stats.*").collect().head
    assert(stats.getAs[Long]("valid_pixels") == 3 && stats.getAs[Double]("mean") == 2.0)
  }
}
