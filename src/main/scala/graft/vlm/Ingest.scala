package graft.vlm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frame-corpus sources and sinks (SURVEY.md §2.1 / §2.2).
  *
  * S1 — the unified-JSON corpus scan (QA_generation/utils/data_loader.py:
  * 18-53): recursive directory walk, `summary.json` exclusion, source-path
  * tagging, optional limit. Schema is *declared* ([[FrameSchema.frameType]]),
  * never inferred, so the reader is one pass and column-prunable.
  *
  * K1 — partitioned corpus write (data_processing/utils.py:181-185): the
  * reference's one-JSON-file-per-frame becomes per-partition JSON files
  * under dataset/split Hive-style directories — content parity, scalable
  * layout (SURVEY §4, "nonstandard physical concern").
  */
object Ingest {

  /** S1: read a unified-JSON corpus directory into frame records. */
  def readFrames(spark: SparkSession, dir: String, limit: Option[Int] = None): DataFrame = {
    val df = spark.read
      .schema(FrameSchema.frameType)
      .option("recursiveFileLookup", "true")
      .json(dir)
      .withColumn("_source_file", input_file_name())
      .filter(!input_file_name().endsWith("summary.json"))
    limit.fold(df)(df.limit)
  }

  /** S2: single-document load. */
  def readFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(FrameSchema.frameType).json(path)
      .withColumn("_source_file", input_file_name())

  /** F1: bbox-availability gate with the 2D→3D fallback policy
    * (data_loader.py:88-106; generate_qa.py:111-122).
    */
  def withUsableBoxes(frames: DataFrame): DataFrame =
    frames.filter(size(col("bounding_boxes_3d")) > 0 || size(col("bounding_boxes_2d")) > 0)

  /** K1: snapshot write partitioned by dataset/split. Partitioning uses
    * COPIES of the two columns (`dataset_p`/`split_p` directories):
    * `partitionBy` strips its columns from the payload, and the S1 reader
    * (declared schema + recursive lookup, which disables partition-column
    * inference) must recover every frame field from the JSON itself.
    * Selective reads therefore target partitions by PATH
    * (`readFrames(spark, s"$dir/dataset_p=coco")`), not by a filter on the
    * recovered columns.
    */
  def writeFrames(frames: DataFrame, outDir: String): Unit =
    frames
      .drop("_source_file")
      .withColumn("dataset_p", col("dataset"))
      .withColumn("split_p", col("split"))
      .write
      .mode("overwrite")
      .partitionBy("dataset_p", "split_p")
      .json(outDir)
}
