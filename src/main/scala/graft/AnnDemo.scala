package graft

import org.apache.spark.sql.functions._

/** End-to-end ANN serving demo — the IVF index lifecycle the query
  * catalog exercises piecewise, run as the three real jobs a production
  * deployment schedules:
  *
  *  1. INDEX BUILD: sampled-Lloyd codebook training persisted to parquet
  *     ([[graft.queries.IvfCentroids.save]]) + the corpus→cell assignment
  *     (preset-dispatched routing) — the expensive, once-per-corpus half.
  *  2. LAYOUT: the assigned corpus written as inverted lists
  *     ([[graft.layout.Layout.writeIvfClustered]] — disjoint per-file cell
  *     ranges), so probes have file-level locality.
  *  3. SERVING: nprobe=2 cells per query against the layout — candidate
  *     read confined to the probed cells' files, exact cosine rerank,
  *     top-3. The artifact records how many layout files actually
  *     contributed candidate rows vs the file total: the measured
  *     file-pruning claim behind the layout.
  *
  * One JSON line → `ann_demo_last.json` (SPARK_GRAFT_ANN_OUT to override).
  *
  *   runMain graft.AnnDemo [sfDir] [workDir]
  */
object AnnDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ann-demo").toString)
    GraftSession.quietStartupWarnings()
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.IvfCentroids
    import graft.layout.Layout

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val quantized = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), graft.functions.quantizeVec(col("embedding"), 1000).as("q"))

    // 1. index build: trained codebook parquet + corpus→cell assignment
    val (_, buildS) = timed {
      IvfCentroids.save(quantized, s"$workDir/codebook", k = 100000, iters = 2, sampleMod = 4)
    }
    val codebook = IvfCentroids.load(spark, s"$workDir/codebook").cache()
    val nCells = codebook.count()
    val (assigned, assignS) = timed {
      val a = IvfCentroids.assign(
        quantized.withColumn("n2", graft.functions.longDot(col("q"), col("q"))),
        codebook, Seq("q", "n2")).cache()
      a.count()
      a
    }

    // 2. inverted-list layout
    val nFiles = 32
    val (_, layoutS) = timed {
      Layout.writeIvfClustered(assigned, s"$workDir/lists", nFiles)
    }
    val lists = spark.read.parquet(s"$workDir/lists")
    val filesTotal = lists.select(input_file_name()).distinct().count()

    // 3. serving: nprobe=2 cells per probe query, candidates only from the
    // probed cells' inverted lists, exact cosine rerank, top-3
    val nProbe = 2
    val probes = quantized.filter(col("vec_id") < 10)
      .join(broadcast(codebook))
      .withColumn("dist", IvfCentroids.l2(col("q"), col("cq")))
      .withColumn("prk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cid").asc)))
      .filter(col("prk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        graft.functions.longDot(col("q"), col("q")).as("qn2"), col("cid").as("cell"))
      .cache()
    probes.count()
    val probeCells = probes.select("cell").distinct().count()

    val ((filesTouched, topk), probeS) = timed {
      // tag the source file before the join: input_file_name() resolves
      // against a single scan only
      val candidates = lists.withColumn("src_file", input_file_name())
        .join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
      val touched = candidates.select("src_file").distinct().count()
      val ranked = candidates
        .withColumn("cos", graft.functions.longDot(col("q"), col("qq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)))
        .filter(col("rk") <= 3)
        .count()
      (touched, ranked)
    }

    val preset = sys.env.getOrElse("GRAFT_PRESET", "demo")
    val line =
      s"""{"metric":"ann_serving","preset":"$preset","build_s":${fmt(buildS)},"assign_s":${fmt(assignS)},""" +
        s""""layout_s":${fmt(layoutS)},"probe_s":${fmt(probeS)},"cells":$nCells,""" +
        s""""files_total":$filesTotal,"probe_cells":$probeCells,"files_touched":$filesTouched,""" +
        s""""topk_rows":$topk,"sf":"$sfDir"}"""
    Artifacts.upsertLine(sys.env.getOrElse("SPARK_GRAFT_ANN_OUT", "ann_demo_last.json"),
      s""""preset":"$preset"""", line)
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
