package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management for large parquet tables: the write-side half of
  * scan performance. At 100 TB the difference between a full scan and a
  * pruned one is the file layout, not the query plan:
  *
  *  - [[writeRangeClustered]] — global range partitioning + in-file sort
  *    on a key: every file covers a disjoint key range, so parquet footer
  *    min/max stats prune point/range scans to O(matching files).
  *  - [[writeZClustered]] — Morton-interleaved two-column clustering:
  *    both columns get bounded per-file spans, so predicates on EITHER
  *    column prune (a 1-D sort prunes one and scatters the other).
  *  - [[compact]] — small-file compaction to a target file size: the
  *    file-count pathology of streaming/incremental ingest (N tiny files
  *    = N scheduler tasks + N footer reads + NameNode pressure) folded
  *    back to size-targeted files.
  *
  * Everything here is metadata-driven on the driver (file listings,
  * 4-row stat aggregates) plus one distributed shuffle/write — no
  * collect of data rows.
  */
object Layout {

  /** Write `df` range-clustered on `sortCols` into `numFiles` files:
    * repartitionByRange gives disjoint per-file key ranges (sampled range
    * bounds), sortWithinPartitions makes row groups internally ordered so
    * page-level stats prune too.
    */
  def writeRangeClustered(df: DataFrame, path: String, sortCols: Seq[Column], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Z-order column for two numeric columns, bucketized to `bits`-bit grid
    * coordinates against broadcast min/max stats. Use as a sort key to
    * co-locate rows close in both dimensions.
    */
  def zValue(a: Column, b: Column, aMin: Column, aMax: Column, bMin: Column, bMax: Column,
      bits: Int = 20): Column = {
    // Morton.interleave masks each coordinate to its low 31 bits — a wider
    // grid would WRAP silently, scattering far-apart rows into the same
    // z-neighborhood and quietly destroying the footer-stats pruning this
    // layout exists for (results stay correct, scans stop shrinking)
    require(bits >= 1 && bits <= 31, s"zValue bits must be in [1, 31], got $bits")
    val buckets = (1L << bits) - 1
    def gridCoord(c: Column, lo: Column, hi: Column): Column =
      least(lit(buckets), floor((c - lo).cast("double") / greatest(hi - lo, lit(1e-300)) * buckets).cast("long"))
    graft.functions.zInterleave(gridCoord(a, aMin, aMax), gridCoord(b, bMin, bMax))
  }

  /** Write `df` Z-clustered on two numeric columns into `numFiles` files.
    * One tiny stats aggregate (1 broadcast row) + one range shuffle on the
    * interleaved value; both columns end up with bounded per-file spans.
    */
  def writeZClustered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 20): Unit = {
    val stats = df.agg(
      min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
      min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))
    val z = df.crossJoin(broadcast(stats))
      .withColumn("graft_z", zValue(col(colA), col(colB),
        col("a_min"), col("a_max"), col("b_min"), col("b_max"), bits))
      .drop("a_min", "a_max", "b_min", "b_max")
    z.repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions(col("graft_z"))
      .drop("graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory to ~`targetFileBytes` files (driver-side
    * listing for sizes — metadata only). `coalesce` avoids a shuffle when
    * only merging; pass `shuffle=true` to also re-balance skewed files.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long, shuffle: Boolean = false): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out = if (shuffle) df.repartition(n) else df.coalesce(n)
    out.write.mode("overwrite").parquet(outPath)
    n
  }

  /** Write an assigned embedding corpus (`…, cell`) clustered by IVF cell
    * — the STORAGE half of the IVF index, i.e. the inverted lists
    * themselves: each parquet file covers a disjoint, contiguous cell
    * range (range shuffle + in-file sort on `cell`), so an nprobe-cell
    * query touches O(nprobe / cells-per-file) files through footer
    * min/max stats while every other file is skippable without reading a
    * row. Pair with the persisted codebook (`IvfCentroids.save`) and the
    * materialized corpus→cell assignment it clusters: at the capacity
    * geometry (1e10 vectors, 1e5 cells, ~512 MB files → ~6k files) a
    * 2-probe query maps to ≲ 2 files instead of a corpus scan — file
    * pruning does for ANN serving what partition pruning does for
    * date-ranged facts. Within a file, the `cell` sort keeps each
    * inverted list contiguous, so row-group stats prune inside the file
    * too.
    */
  def writeIvfClustered(assigned: DataFrame, path: String, numFiles: Int): Unit =
    writeRangeClustered(assigned, path, Seq(col("cell")), numFiles)

  /** Incrementally fold a DELTA of newly assigned vectors (e.g. the
    * streaming ingest path: `StreamingOps.assignVectors` → per-trigger
    * parquet) into an existing inverted-list layout, rewriting ONLY the
    * files whose cell span the delta lands in. At the capacity geometry
    * an ingest batch lands in a small cell subset; a full
    * [[writeIvfClustered]] re-run would rewrite the entire corpus (100 TB
    * of I/O for a GB of delta), while this touches
    * O(delta cells / cells-per-file) files + the delta itself — the same
    * economics [[compact]] gives the small-file pathology, applied to
    * index maintenance.
    *
    * Routing rule (driver-side, metadata-only): files sorted by their
    * min cell partition the cell axis into half-open spans
    * `[lo_i, lo_{i+1})` (the first span extended down, the last up); a
    * delta row joins the file owning its cell's span. The rewrite is ONE
    * distributed job regardless of how many files the delta touches: the
    * touched files' resident rows ∪ the whole delta, each row routed to
    * its owner span (binary search over the lo bounds — file rows map to
    * their own span because per-file cell ranges are disjoint), hash-
    * repartitioned by span, (span, cell)-sorted, and written as ONE
    * dynamic-partition job into a hidden swap dir (`graft_span=i/` → one
    * cell-sorted file per touched span). Only then does the driver commit:
    * per span, rename the merged file in and delete the original — pure
    * metadata. Per-file spans can only extend into the gap before the
    * next file's min, so the disjoint-ranges contract that footer pruning
    * relies on survives by construction, and untouched files are not read
    * and not rewritten (the spec pins byte-identity).
    *
    * Driver-side work: one listing + a per-file min-cell aggregate
    * (file-count rows) + the delta's distinct cells (≤ numCells rows) +
    * O(touched) renames. Data rows never collect.
    *
    * CONCURRENCY CONTRACT — single writer, no concurrent readers: the
    * commit is a sequence of rename-in-then-delete steps with no
    * manifest, so a crash mid-commit double-exposes a file's rows
    * (deliberately failing toward duplication, never loss — the swap is
    * fully staged before the first destructive step), and a reader
    * scanning mid-commit can observe one file's rows twice or a
    * just-deleted file missing. A production deployment commits the same
    * swap through a table-format manifest (one atomic metadata swap),
    * which removes both windows; this demo layout has no manifest, so
    * schedule merges exclusively. Returns (filesRewritten, filesTotal).
    */
  def mergeIvfDelta(spark: SparkSession, listsPath: String, delta: DataFrame): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(listsPath), spark.sparkContext.hadoopConfiguration)
    // per-file min cell from the data (one file-count-row aggregate; at
    // production scale this comes from footer stats / a manifest)
    val lows = spark.read.parquet(listsPath)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("cell")).as("lo"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
    val baseCols = spark.read.parquet(listsPath).columns.toIndexedSeq
    val deltaCells = delta.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    require(deltaCells.nonEmpty, "mergeIvfDelta: empty delta")
    // span owner: last file whose lo <= c (clamped to the first file)
    val loBounds = lows.map(_._2)
    def owner(c: Long): Int = {
      val idx = java.util.Arrays.binarySearch(loBounds, c)
      val i = if (idx >= 0) idx else -idx - 2 // insertion point - 1
      math.max(i, 0)
    }
    val touched = deltaCells.map(owner).distinct.sorted
    // the one distributed job: resident rows of touched files ∪ delta,
    // routed to owner spans executor-side by the same binary search
    val spanOf = udf { (c: Long) => owner(c) }
    val resident = spark.read.parquet(touched.map(lows(_)._1).toIndexedSeq: _*)
      .select(baseCols.map(col): _*)
    val combined = resident.unionByName(delta.select(baseCols.map(col): _*))
      .withColumn("graft_span", spanOf(col("cell")))
    val swap = s"$listsPath/.merge_swap" // dot-dir: invisible to parquet scans
    combined.repartition(touched.length, col("graft_span"))
      .sortWithinPartitions(col("graft_span"), col("cell"))
      .write.mode("overwrite").partitionBy("graft_span").parquet(swap)
    // commit (metadata-only; swap fully staged before the first rename):
    // rename each span's merged file in BEFORE deleting the original —
    // see the concurrency contract above
    for (i <- touched) {
      fs.listStatus(new Path(s"$swap/graft_span=$i"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, j) =>
          fs.rename(st.getPath, new Path(s"$listsPath/merged-${System.nanoTime()}-$i-$j.parquet"))
        }
      fs.delete(new Path(new java.net.URI(lows(i)._1).getPath), false)
    }
    fs.delete(new Path(swap), true)
    (touched.length, lows.length)
  }

  /** At-most-once wrapper for streaming index maintenance: fold a
    * micro-batch's delta into the layout keyed by its `batchId`, so a
    * foreachBatch sink that restarts from a checkpoint and re-delivers a
    * committed batch does NOT double-merge it. The ledger is a hidden
    * marker dir per batch (`_graft_merge_ledger/batch-N`, invisible to
    * parquet scans), checked before the merge and written after it —
    * a crash between merge and marker re-merges on replay (fail toward
    * duplication, the house stance; a table-format manifest would make
    * marker+merge one atomic commit). Returns true when the merge ran,
    * false when the ledger showed the batch already applied.
    */
  def mergeIvfDeltaOnce(spark: SparkSession, listsPath: String, delta: DataFrame,
      batchId: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(listsPath), spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$listsPath/_graft_merge_ledger/batch-$batchId")
    if (fs.exists(marker)) false
    else {
      mergeIvfDelta(spark, listsPath, delta)
      fs.mkdirs(marker)
      true
    }
  }
}
