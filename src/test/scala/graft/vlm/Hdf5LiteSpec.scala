package graft.vlm

import java.nio.ByteBuffer

/** Round-trips Hdf5Lite against fixture files laid out per the public HDF5
  * File Format Specification (superblock v0, v1 object headers, local heap,
  * v1 B-tree + SNOD, contiguous and compact layouts).
  */
class Hdf5LiteSpec extends SparkSpec {

  test("contiguous float32 dataset decodes with dims (S7; hypersim camera keyframes shape)") {
    val vals = Array(1.5f, -2f, 3f, 4f, 5.25f, 6f)
    val bytes = Hdf5Fixtures.makeHdf5("dataset", Seq(2L, 3L), 4, dtClass = 1, compact = false, nElems = 6) {
      (b, i) => b.putFloat(vals(i))
    }
    val ds = Hdf5Lite.readDataset(bytes)
    assert(ds.dims == Seq(2L, 3L))
    assert(ds.data.toSeq == vals.map(_.toDouble).toSeq)
  }

  test("compact uint16 dataset decodes (S7 fixed-point path)") {
    val vals = Array(0, 1000, 65535)
    val bytes = Hdf5Fixtures.makeHdf5("dataset", Seq(3L), 2, dtClass = 0, compact = true, nElems = 3) {
      (b, i) => b.putShort(vals(i).toShort)
    }
    val ds = Hdf5Lite.readDataset(bytes)
    assert(ds.dims == Seq(3L))
    assert(ds.data.toSeq == Seq(0.0, 1000.0, 65535.0))
  }

  test("unknown dataset name and non-hdf5 payloads fail loudly") {
    val bytes = Hdf5Fixtures.makeHdf5("dataset", Seq(1L), 4, dtClass = 1, compact = false, nElems = 1) {
      (b, _) => b.putFloat(1f)
    }
    intercept[RuntimeException](Hdf5Lite.readDataset(bytes, "missing"))
    intercept[IllegalArgumentException](Hdf5Lite.readDatasets(new Array[Byte](200)))
  }

  test("hdf5DepthDecoder plugs into the landing-zone raster job (S7 -> A5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5")
    val vals = Array(1.0f, 2.0f, 3.0f)
    val bytes = Hdf5Fixtures.makeHdf5("dataset", Seq(3L), 4, dtClass = 1, compact = false, nElems = 3) {
      (b, i) => b.putFloat(vals(i))
    }
    java.nio.file.Files.write(dir.resolve("depth.hdf5"), bytes)
    val stats = LandingZone.depthStats(
      LandingZone.depthSamples(spark, dir.toString, LandingZone.hdf5Decoder))
      .select("depth_stats.*").collect().head
    assert(stats.getAs[Long]("valid_pixels") == 3 && stats.getAs[Double]("mean") == 2.0)
  }
}
