package graft.vlm

import FrameSchema._
import org.apache.spark.sql.functions._

/** Conformance reporting (check_dataset_parameters.py re-expressed). */
class ConformanceSpec extends SparkSpec {
  import spark.implicits._

  private def cam(extr: Option[Seq[Seq[Double]]]) =
    Camera(500, 500, 320, 240, 640, 480, Seq(Seq(500.0, 0, 320), Seq(0, 500.0, 240), Seq(0.0, 0, 1)), extr)
  private val ident = Some(Seq(Seq(1.0, 0, 0, 0), Seq(0, 1.0, 0, 0), Seq(0, 0, 1.0, 0), Seq(0, 0, 0, 1.0)))

  private val frames = Seq(
    FrameRecord("dsA", "s", "i1", Some("sc"), None, None, None, None, None, "none",
      cam(ident), None, Seq.empty, Seq(Bbox3D(0, 0, 2, 1, 1, 1, 0, 0, 0, "chair")), None),
    FrameRecord("dsA", "s", "i2", None, None, None, None, None, None, "none",
      cam(None), None, Seq.empty, Seq.empty, None), // no boxes, no extrinsics
    FrameRecord("dsB", "s", "i3", Some("sc"), None, None, None, None, None, "none",
      cam(ident), None, Seq.empty,
      Seq(Bbox3D(0, 0, 2, -1, 1, 1, 0, 2.0, 0, "bad")), None) // violations
  ).toDF()

  test("report: per-dataset coverage percentages and box tallies") {
    val r = Conformance.report(frames).collect().map(x => x.getAs[String]("dataset") -> x).toMap
    val a = r("dsA")
    assert(a.getAs[Long]("n_frames") == 2)
    assert(a.getAs[Double]("pct_extrinsics") == 50.0)
    assert(a.getAs[Long]("n_boxes_3d") == 1)
    assert(a.getAs[Long]("n_boxless_frames") == 1)
    assert(r("dsB").getAs[Double]("pct_extrinsics") == 100.0)
  }

  test("violations: bad dims and unnormalized angles are counted, clean data is zero") {
    val v = Conformance.violations(frames).collect().map(x => x.getAs[String]("dataset") -> x).toMap
    val b = v("dsB")
    assert(b.getAs[Long]("nonpositive_dims") == 1)
    assert(b.getAs[Long]("unnormalized_angles") == 1)
    val a = v("dsA")
    assert(a.getAs[Long]("nonpositive_dims") == 0 && a.getAs[Long]("unnormalized_angles") == 0)
  }
}
