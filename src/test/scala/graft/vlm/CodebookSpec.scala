package graft.vlm

import graft.vlm.Codebook._
import graft.vlm.FrameSchema._
import org.apache.spark.sql.functions._

/** Codebook loop: cache/dedup/infer/join-back semantics on a synthetic
  * unlabeled corpus (§3.3 of SURVEY.md).
  */
class CodebookSpec extends SparkSpec {

  private def camera = Camera(500, 500, 320, 240, 640, 480, Seq(Seq(500.0, 0, 320), Seq(0.0, 500, 240), Seq(0.0, 0, 1)), None)
  private def box(cat: String) = Bbox3D(0, 0, 2, 1, 1, 1, 0, 0, 0, cat)

  private def frame(id: String, cats: Seq[String]): FrameRecord =
    FrameRecord("taskonomy", "train", id, Some("scene0"), None, Some(id), None, None, None,
      "depth_png_encoded", camera, None, Seq.empty, cats.map(box), None)

  private lazy val frames = {
    val s = spark
    import s.implicits._
    Seq(
      frame("f1", Seq("object_7", "object_12", "chair")), // 7 appears twice in corpus
      frame("f2", Seq("object_7", "object_999")),
      frame("f3", Seq("wall")) // no unlabeled instances: dropped by join-back
    ).toDF().withColumn("_source_file", concat(lit("mem://"), col("image_id")))
  }

  test("instanceCache collects every occurrence per instance (A12)") {
    val cache = instanceCache(frames).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(cache == Map(7L -> 2L, 12L -> 1L, 999L -> 1L))
  }

  test("representatives keep the first (file, idx) location per instance (J10)") {
    val reps = representatives(instanceCache(frames)).collect().sortBy(_.instance_id)
    assert(reps.map(_.instance_id).toSeq == Seq(7L, 12L, 999L))
    val r7 = reps.find(_.instance_id == 7).get
    assert(r7.source_file == "mem://f1" && r7.bbox_idx == 0)
  }

  test("infer batches deterministically; stages follow the tau thresholds") {
    val rows = infer(representatives(instanceCache(frames))).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val expected =
        if (r.confidence >= TauHigh) "stage_a"
        else if (r.confidence >= TauMid) "stage_b"
        else "discarded"
      assert(r.method == expected)
      assert(r.confidence >= 0 && r.confidence < 0.03)
    }
    // rerun identical (stub is hash-derived, not random)
    val again = infer(representatives(instanceCache(frames))).collect()
    assert(rows.map(r => (r.instance_id, r.label, r.confidence, r.method)).toSet ==
      again.map(r => (r.instance_id, r.label, r.confidence, r.method)).toSet)
  }

  test("applyCodebook relabels matched boxes, drops unmatched, keeps only frames with >=1 label (J7)") {
    val s = spark
    import s.implicits._
    val cb = Seq((7L, "chair", 0.02, "stage_a")).toDF("instance_id", "label", "confidence", "method")
    val out = applyCodebook(frames, cb)
    val byId = out.select(col("image_id"), col("bounding_boxes_3d"), col("labeling_info.labeled_boxes"))
      .collect().map(r => (r.getString(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.getAs[String]("category")), r.getLong(2)))
      .sortBy(_._1)
    // f3 (no unlabeled) and f1/f2's non-matching boxes are gone; both frames keep the pseudo label
    assert(byId.toSeq == Seq(
      ("f1", Seq("pseudo_chair_7"), 1L),
      ("f2", Seq("pseudo_chair_7"), 1L)
    ))
  }

  test("successRates tallies stages and success fraction (A15)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      CodebookRow(1, "a", 0.02, "stage_a"),
      CodebookRow(2, "b", 0.012, "stage_b"),
      CodebookRow(3, "c", 0.001, "discarded"),
      CodebookRow(4, "d", 0.02, "stage_a")
    ).toDS()
    val r = successRates(rows).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 0.75)
  }

  test("end-to-end build yields a broadcastable codebook with only kept rows") {
    val cb = build(frames)
    assert(cb.filter(col("method") === "discarded").count() == 0)
    assert(cb.count() <= 3)
  }
}
