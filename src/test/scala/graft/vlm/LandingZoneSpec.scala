package graft.vlm

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Landing-zone raster job: binaryFile scan + injectable decode + A5 stats. */
class LandingZoneSpec extends SparkSpec {

  test("depthSamples + depthStats: stub uint16-mm decode to valid-masked stats (S11/A5)") {
    val dir = Files.createTempDirectory("graft-raster")
    // depths: 1000mm, 2000mm, 3000mm, 0 (invalid), 60000mm (visible: 60m > 100? no, valid <100)
    val buf = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1000, 2000, 3000, 0, 60000).foreach(v => buf.putShort(v.toShort))
    Files.write(dir.resolve("frame0.png"), buf.array())

    val stats = LandingZone.depthStats(LandingZone.depthSamples(spark, dir.toString))
      .select("path", "depth_stats.*").collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Boolean]("present"))
    assert(r.getAs[Long]("valid_pixels") == 4) // 0mm masked out; 60m < 100m stays
    assert(r.getAs[Long]("total_pixels") == 5)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 60.0)
    assert(r.getAs[Double]("median") == 2.5)
  }

  test("run writes a parquet snapshot joinable on path") {
    val in = Files.createTempDirectory("graft-raster-in")
    val out = Files.createTempDirectory("graft-raster-out").resolve("stats")
    val buf = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(1500.toShort); buf.putShort(2500.toShort)
    Files.write(in.resolve("a.png"), buf.array())
    LandingZone.run(spark, in.toString, out.toString)
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 1)
    assert(back.select("depth_stats.mean").collect().head.getDouble(0) == 2.0)
  }
}
