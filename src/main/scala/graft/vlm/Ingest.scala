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

  /** S1 under an explicit malformed-input policy: the default PERMISSIVE
    * read silently turns a corrupt document into an all-null row — at
    * corpus scale an unfindable data-loss mode (the reference's per-file
    * `json.load` would at least crash). This variant fails the job on the
    * first malformed document.
    */
  def readFramesStrict(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(FrameSchema.frameType)
      .option("recursiveFileLookup", "true")
      .option("mode", "FAILFAST")
      .json(dir)
      .withColumn("_source_file", input_file_name())
      .filter(!input_file_name().endsWith("summary.json"))

  /** Per-file corruption audit: `(file, rows, corrupt_rows)` for every file
    * in the corpus, one scan, aggregate-only output — the triage step
    * before deciding to quarantine or FAILFAST. Keeps the corrupt payload
    * out of the result (counts only), so the audit itself is metadata-scale
    * no matter how large the corpus.
    */
  def auditFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val withCorrupt = StructType(
      FrameSchema.frameType.fields :+ StructField("_corrupt_record", StringType))
    spark.read
      .schema(withCorrupt)
      .option("recursiveFileLookup", "true")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .filter(!input_file_name().endsWith("summary.json"))
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        count(col("_corrupt_record")).as("corrupt_rows"),
        // a real data column in the OUTPUT is load-bearing twice over: a
        // triage anchor for the flagged file, and the reason the scan is
        // legal at all (Spark rejects JSON scans whose referenced columns
        // are only the corrupt-record column; an unreferenced aggregate
        // would be pruned back into that error)
        first(col("image_id"), ignoreNulls = true).as("sample_image_id"))
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
