package graft

import org.apache.spark.sql.functions._

/** Incremental dedup ingest, driven end-to-end — the batch-fold side of
  * the streaming band-claim guard ([[graft.queries.DedupQueries.incrementalNearDup]],
  * parity-spec'd in IncrementalDedupSpec) run as a real multi-batch ingest
  * with the claim store persisted to band-partitioned parquet between
  * batches, the way a production incremental pipeline checkpoints it.
  *
  * The corpus arrives in `nBatches` disjoint slices (doc_id mod), followed
  * by one REPLAY batch — the first slice's content re-crawled under fresh
  * doc_ids. Per batch the artifact records docs in, docs kept, store rows
  * before/after, and wall seconds. The claim it evidences: store growth
  * tracks NOVEL band buckets, not ingest volume — slices of fresh content
  * grow the store roughly with their distinct-content mass, and the replay
  * batch grows it by (near) zero while keeping (near) zero docs, because
  * every bucket it touches is already claimed. That is the sublinear-state
  * story that lets the guard run unbounded ingest at a bounded store.
  *
  *   runMain graft.IncrementalDemo [sfDir] [nBatches] [workDir]
  */
object IncrementalDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(3)
    val workDir = args.lift(2).getOrElse("/tmp/graft_incremental")
    GraftSession.quietStartupWarnings()
    val spark = GraftSession.builder()
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1

    val emptyStore = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band_idx", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rep", org.apache.spark.sql.types.LongType))))

    // batch b = fresh slice b; final batch = slice 0 replayed under new ids
    def batch(b: Int) =
      if (b < nBatches) docs.filter(col("doc_id") % nBatches === b)
      else docs.filter(col("doc_id") % nBatches === 0)
        .select((col("doc_id") + lit(maxId)).as("doc_id"), col("text"))

    val records = Seq.newBuilder[String]
    var storePath: Option[String] = None
    var storeRows = 0L
    for (b <- 0 to nBatches) {
      val t0 = System.nanoTime()
      val in = batch(b)
      // canonical column order + type on read-back: partition-column
      // inference returns band_idx last and as INT regardless of how the
      // store schema declares it
      val store = storePath
        .map(p => spark.read.parquet(p)
          .select(col("band_idx").cast("int"), col("band"), col("rep")))
        .getOrElse(emptyStore)
      val (kept, updated) = graft.queries.DedupQueries.incrementalNearDup(in, store)
      // checkpoint the store the production way: band-partitioned parquet,
      // so the next batch's claim join co-locates on the band key
      val nextPath = s"$workDir/store_b$b"
      updated.write.mode("overwrite").partitionBy("band_idx").parquet(nextPath)
      val nIn = in.count()
      val nKept = kept.count()
      val newRows = spark.read.parquet(nextPath).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val label = if (b < nBatches) "fresh" else "replay"
      records += f"""{"batch":$b,"kind":"$label","docs_in":$nIn,"kept":$nKept,"dropped":${nIn - nKept},"store_rows_before":$storeRows,"store_rows_after":$newRows,"store_growth":${newRows - storeRows},"sec":$sec%.2f}"""
      println(f"[incremental] batch $b ($label): in=$nIn kept=$nKept store $storeRows -> $newRows (${sec}%.2f s)")
      storePath = Some(nextPath)
      storeRows = newRows
    }
    val line =
      s"""{"metric":"incremental_dedup","sf":"$sfDir","batches":${nBatches + 1},"per_batch":[${records.result().mkString(",")}]}"""
    Artifacts.writeLine(
      sys.env.getOrElse("SPARK_GRAFT_INCR_OUT", "incremental_dedup_last.json"), line)
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
