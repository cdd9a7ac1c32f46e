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
  def writeIvfClustered(assigned: DataFrame, path: String, numFiles: Int): Unit = {
    writeRangeClustered(assigned, path, Seq(col("cell")), numFiles)
    // seed the manifest snapshot (v1): the file-name list readers consult
    // for a consistent view across incremental merges — see readIvfLists
    val spark = assigned.sparkSession
    val fs = fileSystem(spark, path)
    commitManifest(fs, path, 1L, dataFileNames(fs, path))
  }

  // ------------------------------------------------------------ manifest
  // Minimal table-format-style manifest for the inverted-list layout: a
  // versioned file-NAME list (`_graft_manifest-<v>`, underscore-prefixed
  // so raw parquet scans ignore it) committed via tmp-write + atomic
  // rename. Readers that resolve files through the manifest (readIvfLists)
  // get SNAPSHOT isolation across a concurrent mergeIvfDelta: every crash
  // window leaves either the old manifest (staged/renamed-in merged files
  // not yet listed) or the new one (replaced originals delisted before
  // they are deleted), never a state that lists a row twice or misses one.
  // LayoutSpec kills the writer at each stage boundary and pins this.

  private def fileSystem(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def dataFileNames(fs: org.apache.hadoop.fs.FileSystem, path: String): Seq[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toIndexedSeq.sorted

  private def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toIndexedSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("_graft_manifest-"))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("_graft_manifest-").toLong -> st.getPath).toOption)
      .sortBy(_._1)
  }

  /** Current manifest snapshot: (version, live data-file names), or None
    * for a layout that predates the manifest (readers fall back to a raw
    * dir listing — the pre-manifest behavior).
    */
  def currentManifest(spark: SparkSession, path: String): Option[(Long, Seq[String])] = {
    val fs = fileSystem(spark, path)
    manifestVersions(fs, path).lastOption.map { case (v, p) =>
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      v -> txt.split('\n').toIndexedSeq.filter(_.nonEmpty)
    }
  }

  /** Commit manifest version `v`: write the name list to a hidden tmp
    * file, then one atomic rename into place. A reader never observes a
    * half-written manifest — it sees version v-1 until the rename lands.
    */
  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem, path: String,
      v: Long, names: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(s"$path/.manifest_tmp-$v")
    val out = fs.create(tmp, true)
    try out.write((names.sorted.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(s"$path/_graft_manifest-$v")))
      sys.error(s"manifest commit failed: rename to _graft_manifest-$v")
  }

  /** Read the inverted-list layout through its manifest snapshot — the
    * reader half of the merge commit protocol. Falls back to a raw dir
    * scan when no manifest exists (pre-manifest layouts).
    */
  def readIvfLists(spark: SparkSession, path: String): DataFrame =
    currentManifest(spark, path) match {
      case Some((_, names)) => spark.read.parquet(names.map(n => s"$path/$n"): _*)
      case None => spark.read.parquet(path)
    }

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
    * CONCURRENCY CONTRACT — single writer; readers resolve files through
    * the MANIFEST ([[readIvfLists]]) and get snapshot isolation: the
    * commit sequence is (1) stage the merged span files in a hidden swap
    * dir, (2) rename them into the lists dir (not yet listed — manifest
    * readers still see the old snapshot), (3) commit manifest v+1 via one
    * atomic rename (the COMMIT POINT: readers atomically switch to the
    * new file set, which delists the replaced originals), (4) delete the
    * replaced originals and prune old manifests (garbage collection —
    * already invisible to manifest readers). A writer crash at any stage
    * boundary leaves a manifest that lists each row exactly once
    * (LayoutSpec kills the writer at each boundary and pins this); the
    * only residue is unreferenced garbage files, swept by the next
    * successful merge's GC or a manual prune. A RAW `spark.read.parquet
    * (dir)` scan keeps the pre-manifest caveat — between (2) and (4) it
    * can observe merged and original rows together — so concurrent
    * readers must use [[readIvfLists]]. Returns
    * (filesRewritten, filesTotal).
    */
  def mergeIvfDelta(spark: SparkSession, listsPath: String, delta: DataFrame): (Int, Int) =
    mergeIvfDeltaStaged(spark, listsPath, delta, _ => ())

  /** [[mergeIvfDelta]] with SUPERSEDE: fold the delta in AND drop the
    * superseded/removed vectors in the same staged commit. `tombstones`
    * is a `(vec_id, cell)` frame naming each victim row by primary key
    * plus the cell it RESIDES in — the coordinates the incremental
    * pipeline already has (the pk→cell catalog is a slim two-column
    * snapshot maintained beside the index, bucketed by vec_id like u6's
    * snapshots; a changed doc's victim cell is yesterday's assignment).
    * Carrying the cell keeps the victim lookup a file-local anti-join
    * inside the touched-span rewrite instead of a corpus-wide vec_id
    * probe: touched files = owners of delta cells ∪ tombstone cells,
    * still O(delta), and untouched files are still never read.
    *
    * Semantics: resident rows matching a tombstone (vec_id, cell) are
    * dropped; delta rows are appended UNFILTERED (a same-cell edit lands
    * as drop-old + add-new even though both share (vec_id, cell), because
    * only RESIDENT rows are anti-joined). An empty delta with non-empty
    * tombstones is a pure delete (a removed doc's retraction). The
    * commit/crash contract is [[mergeIvfDelta]]'s unchanged — tombstone
    * application happens inside the staged rewrite, so readers switch
    * from the full old snapshot to the full new one atomically
    * (LayoutSpec pins the upsert crash window too).
    */
  def mergeIvfDeltaUpsert(spark: SparkSession, listsPath: String, delta: DataFrame,
      tombstones: DataFrame): (Int, Int) =
    mergeIvfDeltaStaged(spark, listsPath, delta, _ => (), Some(tombstones))

  /** [[mergeIvfDelta]] with a stage hook for crash-window testing:
    * `onStage` fires at each commit-stage boundary ("staged",
    * "renamed_in", "manifest_committed", "gc_done"); a hook that throws
    * simulates a writer killed at exactly that boundary.
    */
  private[graft] def mergeIvfDeltaStaged(spark: SparkSession, listsPath: String,
      delta: DataFrame, onStage: String => Unit,
      tombstones: Option[DataFrame] = None): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = fileSystem(spark, listsPath)
    // live file set from the manifest snapshot (fallback: dir listing for
    // pre-manifest layouts); all reads below go through these names, so a
    // previous crashed merge's unreferenced garbage is never re-read
    val manifest = currentManifest(spark, listsPath)
    val liveNames = manifest.map(_._2).getOrElse(dataFileNames(fs, listsPath))
    val nextVersion = manifest.map(_._1 + 1).getOrElse(1L)
    val livePaths = liveNames.map(n => s"$listsPath/$n")
    // per-file min cell from the data (one file-count-row aggregate; at
    // production scale this comes from footer stats / the manifest)
    val lows = spark.read.parquet(livePaths: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("cell")).as("lo"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
    val baseCols = spark.read.parquet(livePaths: _*).columns.toIndexedSeq
    val deltaCells = delta.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    // tombstone cells join the touched set: a victim's file must be
    // rewritten even when no new vector lands in it (pure retraction)
    val tombCells = tombstones.map(_.select(col("cell")).distinct()
      .collect().map(_.getLong(0))).getOrElse(Array.empty[Long])
    require(deltaCells.nonEmpty || tombCells.nonEmpty,
      "mergeIvfDelta: empty delta" + (if (tombstones.isDefined) " and tombstones" else ""))
    // span owner: last file whose lo <= c (clamped to the first file)
    val loBounds = lows.map(_._2)
    def owner(c: Long): Int = {
      val idx = java.util.Arrays.binarySearch(loBounds, c)
      val i = if (idx >= 0) idx else -idx - 2 // insertion point - 1
      math.max(i, 0)
    }
    val touched = (deltaCells ++ tombCells).map(owner).distinct.sorted
    // the one distributed job: resident rows of touched files (minus any
    // tombstoned victims — a broadcast anti-join on the victim's exact
    // (vec_id, cell) coordinates; delta-sized, never corpus-sized) ∪
    // delta, routed to owner spans executor-side by the same binary search
    val spanOf = udf { (c: Long) => owner(c) }
    val residentRaw = spark.read.parquet(touched.map(lows(_)._1).toIndexedSeq: _*)
      .select(baseCols.map(col): _*)
    val resident = tombstones match {
      case Some(t) => residentRaw.join(
          broadcast(t.select(col("vec_id"), col("cell"))), Seq("vec_id", "cell"), "left_anti")
        .select(baseCols.map(col): _*) // join fronts its keys; keep file column order stable
      case None => residentRaw
    }
    val combined = resident.unionByName(delta.select(baseCols.map(col): _*))
      .withColumn("graft_span", spanOf(col("cell")))
    val swap = s"$listsPath/.merge_swap" // dot-dir: invisible to parquet scans
    combined.repartition(touched.length, col("graft_span"))
      .sortWithinPartitions(col("graft_span"), col("cell"))
      .write.mode("overwrite").partitionBy("graft_span").parquet(swap)
    onStage("staged")
    // (2) rename merged files in — present on disk, absent from the
    // manifest, so manifest readers still see the old snapshot
    val mergedNames = Seq.newBuilder[String]
    for (i <- touched) {
      // a span can legitimately produce NO merged file: every resident row
      // tombstoned and no delta landing there — the original is simply
      // delisted at the manifest commit below
      val spanDir = new Path(s"$swap/graft_span=$i")
      (if (fs.exists(spanDir)) fs.listStatus(spanDir) else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, j) =>
          val name = s"merged-${System.nanoTime()}-$i-$j.parquet"
          fs.rename(st.getPath, new Path(s"$listsPath/$name"))
          mergedNames += name
        }
    }
    onStage("renamed_in")
    // (3) COMMIT: manifest v+1 = live − replaced + merged, one atomic
    // rename — the instant readers switch snapshots
    val replacedNames = touched.map(i => new Path(new java.net.URI(lows(i)._1).getPath).getName).toSet
    val newNames = liveNames.filterNot(replacedNames) ++ mergedNames.result()
    commitManifest(fs, listsPath, nextVersion, newNames)
    onStage("manifest_committed")
    // (4) GC: every data file absent from the committed snapshot is
    // garbage — the replaced originals plus any residue a previously
    // crashed merge renamed in but never listed; prune old manifests and
    // the swap dir
    val live = newNames.toSet
    dataFileNames(fs, listsPath).filterNot(live)
      .foreach(n => fs.delete(new Path(s"$listsPath/$n"), false))
    manifestVersions(fs, listsPath).filter(_._1 < nextVersion)
      .foreach { case (_, p) => fs.delete(p, false) }
    fs.delete(new Path(swap), true)
    onStage("gc_done")
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
    *
    * LEDGER COMPACTION — the ledger stays O(1) entries, not one per
    * batch forever (a long-lived stream would otherwise accumulate
    * unbounded marker dirs — namenode/inode pressure at scale): batchIds
    * from a foreachBatch sink are MONOTONE, and a checkpoint restart can
    * only re-deliver the LAST committed batch, so after committing batch
    * N every marker < N is dead and is pruned in the same call. A caller
    * replaying batches out of order breaks this contract — monotone
    * delivery is part of the single-writer contract above.
    */
  def mergeIvfDeltaOnce(spark: SparkSession, listsPath: String, delta: DataFrame,
      batchId: Long): Boolean =
    ledgerGated(spark, listsPath, batchId) {
      mergeIvfDelta(spark, listsPath, delta); ()
    }

  /** [[mergeIvfDeltaOnce]] for a CDC/update stream: the at-most-once
    * ledger around [[mergeIvfDeltaUpsert]], so a foreachBatch sink that
    * folds UPDATES (new vectors + their victims' tombstones) into the
    * index survives a checkpoint replay without double-applying either
    * half — the supersede and the landing share one staged commit, and
    * the ledger gates that commit as a unit.
    */
  def mergeIvfDeltaUpsertOnce(spark: SparkSession, listsPath: String, delta: DataFrame,
      tombstones: DataFrame, batchId: Long): Boolean =
    ledgerGated(spark, listsPath, batchId) {
      mergeIvfDeltaUpsert(spark, listsPath, delta, tombstones); ()
    }

  /** The shared at-most-once gate: run `merge` only if `batchId` is not
    * yet committed per the ledger, then commit its marker and compact.
    * See [[mergeIvfDeltaOnce]] for the monotone-delivery contract.
    */
  private def ledgerGated(spark: SparkSession, listsPath: String,
      batchId: Long)(merge: => Unit): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(listsPath), spark.sparkContext.hadoopConfiguration)
    val ledger = new Path(s"$listsPath/_graft_merge_ledger")
    val marker = new Path(ledger, s"batch-$batchId")
    def batchOf(p: Path): Option[Long] =
      Option(p.getName).filter(_.startsWith("batch-"))
        .flatMap(n => scala.util.Try(n.stripPrefix("batch-").toLong).toOption)
    val applied = fs.exists(marker) ||
      // monotone contract: any surviving marker >= batchId proves this
      // batch was committed before a later one pruned its own marker
      (fs.exists(ledger) && fs.listStatus(ledger)
        .flatMap(st => batchOf(st.getPath)).exists(_ >= batchId))
    if (applied) false
    else {
      merge
      fs.mkdirs(marker)
      // compact: markers below the new high watermark are unreachable
      // under monotone replay — prune them so the ledger stays O(1)
      fs.listStatus(ledger).foreach { st =>
        if (batchOf(st.getPath).exists(_ < batchId)) fs.delete(st.getPath, true)
      }
      true
    }
  }
}
