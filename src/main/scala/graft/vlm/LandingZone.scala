package graft.vlm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone jobs for binary raster/scientific formats (SURVEY §2.1
  * S7/S11, §7.4 item 1): the Spark side — `binaryFile` scan, partition-local
  * decode, declared schema, partitioned parquet write — is real; the codec
  * is an injectable function because HDF5/PNG decoders are deployment
  * dependencies, not engine code. [[stubDecoder]] is the deterministic
  * stand-in: 16-bit little-endian millimeter depths, the SUN RGB-D
  * `depth_png_mm` convention (mm→m scaling, sunrgbd_processor.py:199-200).
  */
object LandingZone {

  /** Raw raster bytes → depth values in meters. Plug a real PNG/HDF5
    * reader here in deployment.
    */
  type RasterDecoder = Array[Byte] => Array[Double]

  /** STUB: consecutive little-endian uint16 millimeter values. */
  val stubDecoder: RasterDecoder = bytes => {
    val n = bytes.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val mm = ((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)
      out(i) = mm / 1000.0
      i += 1
    }
    out
  }

  /** One row per raster file: path + a bounded sample of decoded depths.
    * Sampling is a head-take (deterministic); at raster scale the sample
    * bound keeps row sizes inside executor memory budgets.
    */
  def depthSamples(
      spark: SparkSession,
      dir: String,
      decoder: RasterDecoder = stubDecoder,
      maxSamples: Int = 4096): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        (path, decoder(bytes).take(maxSamples).toSeq)
      })
      .toDF("path", "depths")
  }

  /** Landing output: per-frame depth_stats (A5) ready to join into the
    * unified frame corpus on the raster path.
    */
  def depthStats(samples: DataFrame): DataFrame =
    samples.select(
      col("path"),
      GeoFunctions.depthStatsCol(col("depths"), size(col("depths")).cast("long")).as("depth_stats")
    )

  /** Full landing job: rasters → depth stats parquet snapshot. */
  def run(spark: SparkSession, rasterDir: String, outDir: String,
          decoder: RasterDecoder = stubDecoder): Unit =
    depthStats(depthSamples(spark, rasterDir, decoder))
      .write.mode("overwrite").parquet(outDir)
}
