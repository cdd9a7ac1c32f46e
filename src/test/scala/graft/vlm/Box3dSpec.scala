package graft.vlm

import org.scalatest.funsuite.AnyFunSuite

/** G21 box-eval kernels: fit round trip, volume, inside, exact IoU on
  * analytic cases, rotated IoU vs the seeded sampling estimator, ground
  * plane. Blueprint: objectron/dataset/box.py, iou.py.
  */
class Box3dSpec extends AnyFunSuite {
  import Box3d._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = math.abs(a - b) <= tol

  private def unitCubeAt(x: Double, y: Double = 0, z: Double = 0): Box =
    Box.fromCenterDimsEuler(x, y, z, 1, 1, 1, 0, 0, 0)

  test("fit recovers 9-DoF parameters from keypoints (box.py:123-156)") {
    val orig = Box.fromCenterDimsEuler(1.5, -2.0, 3.0, 0.8, 1.2, 2.0, 0.3, -0.7, 1.1)
    val fitted = Box.fromVertices(orig.vertices)
    (0 until 3).foreach { i =>
      assert(approx(fitted.scale(i), orig.scale(i), 1e-9))
      assert(approx(fitted.translation(i), orig.translation(i), 1e-9))
      (0 until 3).foreach(j => assert(approx(fitted.rotation(i)(j), orig.rotation(i)(j), 1e-9)))
    }
  }

  test("volume is the scale product for true boxes, rotation-invariant (box.py:207-224)") {
    assert(approx(unitCubeAt(0).volume, 1.0))
    assert(approx(Box.fromCenterDimsEuler(0, 0, 0, 2, 3, 4, 0, 0, 0).volume, 24.0))
    assert(approx(Box.fromCenterDimsEuler(5, 1, 2, 2, 3, 4, 0.4, 1.2, -0.8).volume, 24.0, 1e-9))
  }

  test("inside respects orientation (box.py:158-176)") {
    val b = Box.fromCenterDimsEuler(0, 0, 0, 2, 1, 1, 0, 0, math.Pi / 4) // roll 45° about z
    assert(b.inside(Array(0.0, 0.0, 0.0)))
    // point along the rotated long axis: (cos45, sin45) * 0.9 is inside ...
    val c = math.sqrt(0.5) * 0.9
    assert(b.inside(Array(c, c, 0.0)))
    // ... but the unrotated (0.9, 0, 0) is outside the rotated box
    // (local x = 0.9·cos45 ≈ 0.64 < 1, local y = -0.9·sin45 ≈ -0.64 > 0.5)
    assert(!b.inside(Array(0.9, 0.0, 0.0)))
    assert(!b.inside(Array(0.0, 0.0, 0.51)))
  }

  test("exact IoU: identical, disjoint, and analytic partial overlaps (iou.py:22-33)") {
    assert(approx(iou(unitCubeAt(0), unitCubeAt(0)), 1.0, 1e-9))
    assert(approx(iou(unitCubeAt(0), unitCubeAt(5)), 0.0))
    // touching faces: zero-volume intersection
    assert(approx(iou(unitCubeAt(0), unitCubeAt(1)), 0.0, 1e-9))
    // offset 0.5 in x: inter 0.5, union 1.5 → 1/3
    assert(approx(iou(unitCubeAt(0), unitCubeAt(0.5)), 1.0 / 3, 1e-9))
    // offset (0.5, 0.5, 0.5): inter 0.125, union 1.875 → 1/15
    val shifted = Box.fromCenterDimsEuler(0.5, 0.5, 0.5, 1, 1, 1, 0, 0, 0)
    assert(approx(iou(unitCubeAt(0), shifted), 1.0 / 15, 1e-9))
    // containment: 2-cube ⊃ unit cube → 1/8
    val big = Box.fromCenterDimsEuler(0, 0, 0, 2, 2, 2, 0, 0, 0)
    assert(approx(iou(unitCubeAt(0), big), 1.0 / 8, 1e-9))
  }

  test("rotated IoU: 45°-about-z unit cubes match the analytic octagon prism") {
    // Intersection of a unit square with its 45°-rotated copy (same center)
    // is a regular octagon of area 8·(√2−1)/2... computed: A = 8(√2−1)·(1/2)² ·2 = 2(√2−1)·... use known A = 8·(√2/2−1/2)·(1/2) + ... — assert via the
    // sampling estimator instead of a hand-derived constant, plus symmetry.
    val a = unitCubeAt(0)
    val b = Box.fromCenterDimsEuler(0, 0, 0, 1, 1, 1, 0, 0, math.Pi / 4)
    val exact = iou(a, b)
    assert(exact > 0.5 && exact < 1.0, s"exact=$exact")
    assert(approx(iou(b, a), exact, 1e-9)) // symmetry
    val sampled = iouSampling(a, b, numSamples = 200000, seed = 7)
    assert(math.abs(exact - sampled) < 0.01, s"exact=$exact sampled=$sampled")
    // analytic check: octagon area = 2(√2−1) for the unit square pair,
    // prism height 1 → inter = 2(√2−1) ≈ 0.8284, union = 2 − inter
    val inter = 2 * (math.sqrt(2) - 1)
    assert(approx(exact, inter / (2 - inter), 1e-9), s"exact=$exact expected=${inter / (2 - inter)}")
  }

  test("generic rotated pair: exact IoU within sampling tolerance") {
    val a = Box.fromCenterDimsEuler(0.1, -0.2, 0.3, 1.4, 0.9, 1.1, 0.5, -0.3, 0.9)
    val b = Box.fromCenterDimsEuler(0.4, 0.1, 0.0, 1.0, 1.3, 0.8, -0.2, 0.8, 0.1)
    val exact = iou(a, b)
    val sampled = iouSampling(a, b, numSamples = 200000, seed = 11)
    assert(exact > 0 && exact < 1)
    assert(math.abs(exact - sampled) < 0.01, s"exact=$exact sampled=$sampled")
  }

  test("IoU is translation-invariant far from the origin (tolerance scales with extent, not |d|)") {
    val far = 1e6
    val a = Box.fromCenterDimsEuler(far, far, far, 1, 1, 1, 0, 0, 0)
    val b = Box.fromCenterDimsEuler(far + 0.5, far, far, 1, 1, 1, 0, 0, 0)
    assert(math.abs(iou(a, b) - 1.0 / 3) < 1e-6, s"got ${iou(a, b)}")
    val cFar = Box.fromCenterDimsEuler(far, far, far, 1, 1, 1, 0, 0, math.Pi / 4)
    val cHome = Box.fromCenterDimsEuler(0, 0, 0, 1, 1, 1, 0, 0, math.Pi / 4)
    assert(math.abs(iou(a, cFar) - iou(unitCubeAt(0), cHome)) < 1e-6)
  }

  test("property: random pairs — bounds, symmetry, sampling agreement") {
    val rng = new scala.util.Random(1234)
    def randBox(): Box = Box.fromCenterDimsEuler(
      rng.nextDouble() * 2 - 1, rng.nextDouble() * 2 - 1, rng.nextDouble() * 2 - 1,
      0.3 + rng.nextDouble() * 1.5, 0.3 + rng.nextDouble() * 1.5, 0.3 + rng.nextDouble() * 1.5,
      (rng.nextDouble() - 0.5) * 2, (rng.nextDouble() - 0.5) * 2, (rng.nextDouble() - 0.5) * 2)
    (0 until 20).foreach { i =>
      val a = randBox(); val b = randBox()
      val x = iou(a, b)
      assert(x >= 0 && x <= 1 + 1e-12, s"case $i: iou=$x out of range")
      assert(approx(iou(b, a), x, 1e-9), s"case $i: asymmetric")
      assert(approx(iou(a, a), 1.0, 1e-9))
      val sampled = iouSampling(a, b, numSamples = 50000, seed = 1000 + i)
      assert(math.abs(x - sampled) < 0.02, s"case $i: exact=$x sampled=$sampled")
      // intersection can't exceed either volume
      val inter = intersectionVolume(a, b)
      assert(inter <= math.min(a.volume, b.volume) + 1e-9, s"case $i: inter=$inter")
    }
  }

  test("groundPlane picks the lower gravity-aligned face (box.py:236-287)") {
    val b = Box.fromCenterDimsEuler(0, 5, 0, 2, 4, 2, 0, 0, 0)
    val (center, normal) = b.groundPlane(gravityAxis = 1)
    assert(approx(center(1), 3.0, 1e-9)) // bottom face at y = 5 − 4/2
    assert(approx(center(0), 0.0, 1e-9) && approx(center(2), 0.0, 1e-9))
    // normal is gravity-aligned (x and z components vanish)
    assert(approx(normal(0), 0.0, 1e-9) && approx(normal(2), 0.0, 1e-9))
    assert(math.abs(normal(1)) > 0)
  }
}
