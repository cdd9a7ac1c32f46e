package graft.vlm

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  // deterministic pseudo-property loops (no scalatest-scalacheck bridge in
  // the offline cache); seeded so failures reproduce
  private def cases(n: Int)(f: scala.util.Random => Unit): Unit = {
    val rng = new scala.util.Random(42); (0 until n).foreach(_ => f(rng))
  }
  import Geo._

  private val eps = 1e-9

  private def approx(a: Double, b: Double, tol: Double = eps): Boolean = math.abs(a - b) <= tol

  test("normalizeAngle matches reference semantics (utils.py:28-43)") {
    assert(normalizeAngle(0) == 0.0)
    assert(normalizeAngle(180) == 1.0)
    assert(normalizeAngle(-180) == 1.0) // -180 % 360 = 180 in Python → 1.0
    assert(normalizeAngle(90) == 0.5)
    assert(normalizeAngle(-90) == -0.5)
    assert(normalizeAngle(270) == -0.5)
    assert(normalizeAngle(360) == 0.0)
    assert(normalizeAngle(540) == 1.0)
    assert(approx(normalizeAngle(45.5), 45.5 / 180))
  }

  test("normalizeAngle stays in [-1, 1] for all inputs") {
    cases(200) { rng =>
      val n = normalizeAngle((rng.nextDouble() - 0.5) * 2e6)
      assert(n >= -1.0 && n <= 1.0)
    }
  }

  test("rotationMatrix identity at zero angles") {
    val r = rotationMatrix(0, 0, 0)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(approx(r(i)(j), if (i == j) 1.0 else 0.0))
  }

  test("rotationMatrix is Rz·Ry·Rx: 90° yaw sends +X to -Z") {
    // R @ [1,0,0] with yaw=pi/2: Ry maps x→(cos, 0, -sin) = (0,0,-1)
    val r = rotationMatrix(0, math.Pi / 2, 0)
    val v = Array(r(0)(0), r(1)(0), r(2)(0))
    assert(approx(v(0), 0, 1e-12) && approx(v(1), 0, 1e-12) && approx(v(2), -1))
  }

  test("rotationMatrix is orthonormal (R·Rᵀ = I)") {
    cases(100) { rng =>
      def ang() = (rng.nextDouble() - 0.5) * 2 * math.Pi
      val r = rotationMatrix(ang(), ang(), ang())
      for (i <- 0 until 3; j <- 0 until 3) {
        val dot = (0 until 3).map(k => r(i)(k) * r(j)(k)).sum
        assert(approx(dot, if (i == j) 1.0 else 0.0, 1e-9))
      }
    }
  }

  test("bboxVertices of an axis-aligned unit box at origin") {
    val v = bboxVertices(0, 0, 0, 1, 1, 1, 0, 0, 0)
    assert(v.length == 8)
    // first local corner is (-dx,-dy,-dz)
    assert(v(0).sameElements(Array(-0.5, -0.5, -0.5)))
    assert(v(6).sameElements(Array(0.5, 0.5, 0.5)))
    // all vertices at distance sqrt(3)/2 from center
    v.foreach(p => assert(approx(math.sqrt(p.map(x => x * x).sum), math.sqrt(3) / 2)))
  }

  test("bboxVertices translates with center") {
    val v = bboxVertices(1, 2, 3, 2, 2, 2, 0, 0, 0)
    assert(v(0).sameElements(Array(0.0, 1.0, 2.0)))
    assert(v(6).sameElements(Array(2.0, 3.0, 4.0)))
  }

  test("minDistanceBetweenBoxes: two unit boxes 3 m apart on X → gap of 2") {
    val a = bboxVertices(0, 0, 0, 1, 1, 1, 0, 0, 0)
    val b = bboxVertices(3, 0, 0, 1, 1, 1, 0, 0, 0)
    assert(approx(minDistanceBetweenBoxes(a, b), 2.0))
  }

  test("minDistanceBetweenBoxes is symmetric and nonnegative") {
    cases(100) { rng =>
      def box() = bboxVertices(
        (rng.nextDouble() - 0.5) * 10, (rng.nextDouble() - 0.5) * 10, (rng.nextDouble() - 0.5) * 10,
        0.1 + rng.nextDouble() * 1.9, 0.1 + rng.nextDouble() * 1.9, 0.1 + rng.nextDouble() * 1.9,
        0, 0, 0)
      val (a, b) = (box(), box())
      val d1 = minDistanceBetweenBoxes(a, b)
      val d2 = minDistanceBetweenBoxes(b, a)
      assert(approx(d1, d2, 1e-12) && d1 >= 0)
    }
  }

  test("distanceCameraToBox: camera at origin, unit box at (0,0,5)") {
    val v = bboxVertices(0, 0, 5, 1, 1, 1, 0, 0, 0)
    val d = distanceCameraToBox(Array(0.0, 0.0, 0.0), v)
    // nearest vertices are the z=4.5 face corners at (±.5, ±.5, 4.5)
    assert(approx(d, math.sqrt(0.25 + 0.25 + 4.5 * 4.5)))
  }

  test("centerDistance = Euclidean norm") {
    assert(approx(centerDistance(3, 4, 0), 5.0))
    assert(approx(centerDistance(1, 2, 2), 3.0))
  }

  test("cameraPosition extracts translation column; rejects non-4x4") {
    val e = Array(
      Array(1.0, 0, 0, 10), Array(0, 1.0, 0, 20), Array(0, 0, 1.0, 30), Array(0, 0, 0, 1.0))
    assert(cameraPosition(e).get.sameElements(Array(10.0, 20.0, 30.0)))
    assert(cameraPosition(Array(Array(1.0, 0, 0))).isEmpty)
  }

  test("cameraOrientation basis vectors are the rotation columns (G8; geometry.py:367-398)") {
    // 90° yaw about +Z: camera right = world +Y, down = world -X, forward = +Z
    val e = Array(
      Array(0.0, -1.0, 0.0, 5.0),
      Array(1.0, 0.0, 0.0, 6.0),
      Array(0.0, 0.0, 1.0, 7.0),
      Array(0.0, 0.0, 0.0, 1.0))
    val o = cameraOrientation(e).get
    assert(o("right").toSeq == Seq(0.0, 1.0, 0.0))
    assert(o("down").toSeq == Seq(-1.0, 0.0, 0.0))
    assert(o("up").toSeq == Seq(1.0, -0.0, -0.0))
    assert(o("forward").toSeq == Seq(0.0, 0.0, 1.0))
    assert(o("back").toSeq.map(_ + 0.0) == Seq(0.0, 0.0, -1.0))
    assert(cameraOrientation(Array(Array(1.0))).isEmpty)
  }

  test("invertRigid inverts a rotation+translation transform") {
    val r = rotationMatrix(0.3, -0.5, 1.1)
    val m = Array(
      Array(r(0)(0), r(0)(1), r(0)(2), 4.0),
      Array(r(1)(0), r(1)(1), r(1)(2), -2.0),
      Array(r(2)(0), r(2)(1), r(2)(2), 7.0),
      Array(0.0, 0.0, 0.0, 1.0))
    val inv = invertRigid(m)
    val p = Array(1.5, -3.0, 2.5)
    val roundTrip = transformPoints(inv, transformPoints(m, Array(p)))(0)
    p.zip(roundTrip).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
  }

  test("enhancedRelativePosition thresholds (geometry.py:424-495)") {
    val a = bboxVertices(0, 0, 2, 0.5, 0.5, 0.5, 0, 0, 0)
    val b = bboxVertices(1, -1, 4, 0.5, 0.5, 0.5, 0, 0, 0)
    val (depth, horiz, vert, _) = enhancedRelativePosition(a, b)
    assert(depth == "Nearer") // a center z=2 < b center z=4
    assert(horiz == "Left") // a center x=0 < b center x=1
    assert(vert == "Below") // dy = 0 - (-1) = +1 → Below (+Y is down)
  }

  test("vertexExtremesRelativePosition: legacy G10 variant vs enhanced on the same boxes (geometry.py:222-269)") {
    // Same fixture boxes as the enhanced test: a at (0,0,2), b at (1,-1,4),
    // both 0.5-cubes → extents separated on every axis.
    val a = bboxVertices(0, 0, 2, 0.5, 0.5, 0.5, 0, 0, 0)
    val b = bboxVertices(1, -1, 4, 0.5, 0.5, 0.5, 0, 0, 0)
    val (d, h, v) = vertexExtremesRelativePosition(a, b)
    assert(d.contains("Near")) // max z_a = 2.25 < min z_b = 3.75 - 0.1
    assert(h.contains("Left")) // max x_a = 0.25 < min x_b = 0.75 - 0.1
    assert(v.contains("Down")) // min y_a = -0.25 > max y_b = -0.75 + 0.1 (+Y down)
    // Enhanced (center-diff) answers on the same boxes — the two variants
    // agree on separated boxes up to vocabulary (Near~Nearer, Down~Below).
    val (ed, eh, ev, _) = enhancedRelativePosition(a, b)
    assert(ed == "Nearer" && eh == "Left" && ev == "Below")
    // Divergence case: overlapping extents but offset centers — legacy
    // refuses to answer (None), enhanced still classifies by center diff.
    val c = bboxVertices(0.3, 0.2, 2.2, 1.0, 1.0, 1.0, 0, 0, 0)
    val (d2, h2, v2) = vertexExtremesRelativePosition(a, c)
    assert(d2.isEmpty && h2.isEmpty && v2.isEmpty)
    val (ed2, eh2, ev2, _) = enhancedRelativePosition(a, c)
    assert(ed2 == "Nearer" && eh2 == "Left" && ev2 == "Above")
    // Threshold boundary: separation exactly at t gives no relation (strict <)
    val far = bboxVertices(0, 0, 2.6, 0.5, 0.5, 0.5, 0, 0, 0) // gap = 0.1 exactly
    assert(vertexExtremesRelativePosition(a, far)._1.isEmpty)
    val farther = bboxVertices(0, 0, 2.61, 0.5, 0.5, 0.5, 0, 0, 0)
    assert(vertexExtremesRelativePosition(a, farther)._1.contains("Near"))
  }

  test("quaternion round-trip through rotation matrix") {
    // identity quaternion
    val (p0, y0, r0) = quaternionToEulerDeg(0, 0, 0, 1)
    assert(approx(p0, 0, 1e-9) && approx(y0, 0, 1e-9) && approx(r0, 0, 1e-9))
    // 90° about Z: q = (0,0,sin45,cos45) → roll=90°
    val (_, _, r90) = quaternionToEulerDeg(0, 0, math.sqrt(0.5), math.sqrt(0.5))
    assert(approx(r90, 90.0, 1e-9))
    // euler → matrix → euler round trip
    cases(100) { rng =>
      def deg() = (rng.nextDouble() - 0.5) * 160
      val (p, y, r) = (deg(), deg(), deg())
      val m = rotationMatrix(math.toRadians(p), math.toRadians(y), math.toRadians(r))
      val (p2, y2, r2) = matrixToEulerXYZDeg(m)
      assert(approx(p2, p, 1e-6) && approx(y2, y, 1e-6) && approx(r2, r, 1e-6))
    }
  }

  test("fovToFocal: 90° fov → fx = w/2") {
    assert(approx(fovToFocal(640, math.Pi / 2), 320.0))
  }

  test("parseClassCategory fallback chain (class_mapping.py:87-103)") {
    assert(parseClassCategory("class_84") == "object_84")
    assert(parseClassCategory("class_84", Map(84 -> "chair")) == "chair")
    assert(parseClassCategory("chair") == "chair")
    assert(parseClassCategory("class_abc") == "class_abc")
    assert(parseClassCategory("object_7") == "object_7")
  }

  test("projectTo2d: centered box projects around principal point") {
    val v = bboxVertices(0, 0, 5, 1, 1, 1, 0, 0, 0)
    val Some((xMin, yMin, xMax, yMax)) = projectTo2d(v, 500, 500, 320, 240, 640, 480)
    assert(xMin < 320 && xMax > 320 && yMin < 240 && yMax > 240)
    // behind-camera box → None
    assert(projectTo2d(bboxVertices(0, 0, -5, 1, 1, 1, 0, 0, 0), 500, 500, 320, 240, 640, 480).isEmpty)
  }

  test("unprojectPoint inverts projection at the principal point (G15)") {
    val p = unprojectPoint(320, 240, 3.0, 500, 500, 320, 240)
    assert(approx(p(0), 0) && approx(p(1), 0) && approx(p(2), 3.0))
    val q = unprojectPoint(420, 240, 5.0, 500, 500, 320, 240)
    assert(approx(q(0), 1.0)) // (420-320)*5/500
  }

  test("extrinsicsFromPositionEuler composes rotation + translation (G14)") {
    val m = extrinsicsFromPositionEuler(1, 2, 3, 0, 0, 0)
    assert(m(0)(3) == 1.0 && m(1)(3) == 2.0 && m(2)(3) == 3.0)
    assert(m(0)(0) == 1.0 && m(3).toSeq == Seq(0.0, 0.0, 0.0, 1.0))
    assert(cameraPosition(m).get.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("lift2dTo3d: center/dims from median ROI depth; sanity rejections (G19, coco_processor.py:121-232)") {
    // centered 100x100 box at depth 5 in a 640x480 image: fx=448, fy=336
    val Some((center, dims)) = lift2dTo3d(270, 190, 100, 100, 5.0, 0.1, 640, 480)
    assert(approx(center(2), 5.0) && approx(center(0), 0.0) && approx(center(1), 0.0))
    assert(approx(dims(0), 100 * 5.0 / 448) && approx(dims(1), 100 * 5.0 / 336))
    assert(approx(dims(2), math.min(dims(0), dims(1)) * 0.8)) // std contribution smaller here
    // depth std dominates when large
    val Some((_, dims2)) = lift2dTo3d(270, 190, 100, 100, 5.0, 2.0, 640, 480)
    assert(approx(dims2(2), 4.0))
    // rejections: unreasonable depth; tiny box
    assert(lift2dTo3d(270, 190, 100, 100, 0.4, 0.1, 640, 480).isEmpty)
    assert(lift2dTo3d(270, 190, 100, 100, 60.0, 0.1, 640, 480).isEmpty)
    assert(lift2dTo3d(318, 238, 2, 2, 5.0, 0.001, 640, 480).isEmpty)
  }
}
