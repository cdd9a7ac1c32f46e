package graft.vlm

import graft.vlm.Codebook._
import graft.vlm.FrameSchema._
import org.apache.spark.sql.functions._

/** Contract test for the §3.3 inference seam — the one pipeline stage where
  * a real per-partition model session (CLIP/SAM batch forward) plugs into
  * `mapPartitions`. A deployment swaps [[Codebook.stubLabeler]] for a hook
  * that amortizes model init per PARTITION and runs per BATCH, so the exact
  * batching semantics are load-bearing: batches must respect BatchSize,
  * never span partitions (a session is partition-local), deliver every
  * representative exactly once whatever the partitioning, and the rows a
  * labeler returns must join back losslessly at partition boundaries.
  * An instrumented fake model records (partition, batch size, payload)
  * inside the returned rows, so every property is asserted from the output
  * alone — no shared mutable state between driver and executors.
  */
class CodebookBatchContractSpec extends SparkSpec {

  private def reps(n: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => InstanceLoc(i.toLong, s"mem://f$i", i % 5)).toDS().repartition(parts)
  }

  /** Fake model that reports its calling context through the row fields:
    * label = the input payload (field-integrity probe), confidence = the
    * batch size it saw, method = the partition it ran in.
    */
  private val probe: Labeler = batch => {
    val pid = org.apache.spark.TaskContext.getPartitionId()
    batch.map(l =>
      CodebookRow(l.instance_id, s"${l.source_file}#${l.bbox_idx}", batch.size.toDouble, s"p$pid"))
  }

  test("batches are <= BatchSize, partition-local, with at most one short tail per partition") {
    for (parts <- Seq(1, 3, 7)) {
      val out = infer(reps(100, parts), probe).collect()
      // exactly-once delivery across batch boundaries, any partitioning
      assert(out.length == 100, s"parts=$parts lost or duplicated reps")
      assert(out.map(_.instance_id).toSet == (1 to 100).map(_.toLong).toSet)
      // payload fields arrive intact through the encoder + grouped() seam
      out.foreach { r =>
        assert(r.label == s"mem://f${r.instance_id}#${r.instance_id % 5}", r)
      }
      val sizes = out.map(_.confidence.toInt)
      assert(sizes.forall(s => s >= 1 && s <= BatchSize), s"parts=$parts sizes=${sizes.distinct.sorted}")
      // grouped() contract: within a partition every batch is full except
      // at most ONE tail. Rows carrying (partition, size) group into
      // rows/size batches of that size; a short size may appear once.
      out.groupBy(r => (r.method, r.confidence.toInt)).foreach { case ((pid, sz), rows) =>
        assert(rows.length % sz == 0, s"$pid: $sz-row batches do not tile ${rows.length} rows")
        if (sz < BatchSize)
          assert(rows.length / sz == 1, s"$pid has ${rows.length / sz} short batches of $sz")
      }
    }
  }

  test("a model session is created per partition, not per batch or per row") {
    // 40 reps in 2 partitions → ≥ 2 batches per partition; every batch of a
    // partition must report the SAME partition id (the session-affinity
    // property a per-partition model hook relies on), and the number of
    // distinct partitions seen must equal the input partitioning
    val out = infer(reps(40, 2), probe).collect()
    assert(out.map(_.method).distinct.length == 2)
    // 20 rows per partition → batch sizes 16 + 4 in each
    for ((_, rows) <- out.groupBy(_.method))
      assert(rows.map(_.confidence.toInt).sorted.distinct.toSeq == Seq(4, 16), rows.take(3).mkString(","))
  }

  private def camera = Camera(500, 500, 320, 240, 640, 480,
    Seq(Seq(500.0, 0, 320), Seq(0.0, 500, 240), Seq(0.0, 0, 1)), None)
  private def box(cat: String) = Bbox3D(0, 0, 2, 1, 1, 1, 0, 0, 0, cat)
  private def frame(id: String, cats: Seq[String]): FrameRecord =
    FrameRecord("taskonomy", "train", id, Some("scene0"), None, Some(id), None, None, None,
      "depth_png_encoded", camera, None, Seq.empty, cats.map(box), None)

  test("join-back integrity: the codebook and relabeled corpus are invariant to reps partitioning") {
    val s = spark
    import s.implicits._
    // 30 instances spread over 15 frames, two per frame, plus noise boxes
    val frames = (1 to 15).map { f =>
      frame(s"f$f", Seq(s"object_${2 * f - 1}", s"object_${2 * f}", "wall"))
    }.toDF().withColumn("_source_file", concat(lit("mem://"), col("image_id")))
    def codebookAt(parts: Int) =
      keptCodebook(infer(representatives(instanceCache(frames)).repartition(parts)))
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val cb1 = codebookAt(1)
    val cb8 = codebookAt(8)
    assert(key(cb1) == key(cb8), "codebook differs across partitionings")
    assert(key(applyCodebook(frames, cb1)) == key(applyCodebook(frames, cb8)),
      "relabeled corpus differs across partitionings")
    assert(cb1.count() > 0)
  }
}
