package graft.vlm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import Geo.{Mat3, Vec3}

/** Property-based invariants for the oriented-box kernels (Box3d): IoU
  * identity/symmetry/range, rigid-motion invariance, the containment
  * closed form, far-translation disjointness, and the 9-DoF fit
  * round-trip. These are the metamorphic relations the exact
  * half-space-intersection volume must satisfy for ANY pose, which the
  * hand-computed Box3dSpec fixtures can't sweep.
  */
object Box3dProps extends Properties("Box3d") {

  private val angle = Gen.choose(-math.Pi, math.Pi)
  private val dim = Gen.choose(0.2, 4.0)
  private val coord = Gen.choose(-8.0, 8.0)

  private val box: Gen[Box3d.Box] = for {
    cx <- coord; cy <- coord; cz <- coord
    xl <- dim; yl <- dim; zl <- dim
    p <- angle; y <- angle; r <- angle
  } yield Box3d.Box.fromCenterDimsEuler(cx, cy, cz, xl, yl, zl, p, y, r)

  // a second box near the first so intersections are actually exercised
  private val boxPair: Gen[(Box3d.Box, Box3d.Box)] = for {
    a <- box
    dx <- Gen.choose(-2.0, 2.0); dy <- Gen.choose(-2.0, 2.0); dz <- Gen.choose(-2.0, 2.0)
    xl <- dim; yl <- dim; zl <- dim
    p <- angle; y <- angle; r <- angle
  } yield (a, Box3d.Box.fromCenterDimsEuler(
    a.translation(0) + dx, a.translation(1) + dy, a.translation(2) + dz,
    xl, yl, zl, p, y, r))

  private def matMul(a: Mat3, b: Mat3): Mat3 =
    Array.tabulate(3, 3)((i, j) => a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j))
  private def matVec(a: Mat3, v: Vec3): Vec3 =
    Array.tabulate(3)(i => a(i)(0) * v(0) + a(i)(1) * v(1) + a(i)(2) * v(2))
  private def rigid(m: Mat3, t: Vec3, b: Box3d.Box): Box3d.Box =
    Box3d.Box(matMul(m, b.rotation),
      Array.tabulate(3)(i => matVec(m, b.translation)(i) + t(i)), b.scale)

  property("iou(a, a) = 1") = forAll(box) { a =>
    math.abs(Box3d.iou(a, a) - 1.0) < 1e-6
  }

  property("iou is symmetric and in [0, 1]") = forAll(boxPair) { case (a, b) =>
    val ab = Box3d.iou(a, b); val ba = Box3d.iou(b, a)
    math.abs(ab - ba) < 1e-6 && ab >= 0.0 && ab <= 1.0
  }

  property("iou is invariant under a shared rigid motion") =
    forAll(boxPair, angle, angle, angle, coord, coord, coord) {
      case ((a, b), p, y, r, tx, ty, tz) =>
        val m = Geo.rotationMatrix(p, y, r)
        val t = Array(tx, ty, tz)
        math.abs(Box3d.iou(rigid(m, t, a), rigid(m, t, b)) - Box3d.iou(a, b)) < 1e-5
    }

  property("same-pose shrunk box: iou is exactly the volume ratio f^3") =
    forAll(box, Gen.choose(0.3, 0.9)) { (a, f) =>
      val small = Box3d.Box(a.rotation, a.translation, a.scale.map(_ * f))
      math.abs(Box3d.iou(a, small) - f * f * f) < 1e-6
    }

  property("boxes farther apart than their diagonal sum never intersect") =
    forAll(box, box) { (a, b) =>
      def halfDiag(x: Box3d.Box) = math.sqrt(x.scale.map(s => s * s / 4).sum)
      val shift = halfDiag(a) + halfDiag(b) + 1e-3
      val moved = Box3d.Box(b.rotation,
        Array(a.translation(0) + shift, a.translation(1), a.translation(2)), b.scale)
      Box3d.iou(a, moved) == 0.0
    }

  property("fit round-trip: fromVertices(box.vertices) recovers the box") =
    forAll(box) { a =>
      val fit = Box3d.Box.fromVertices(a.vertices)
      fit.vertices.zip(a.vertices).forall { case (u, v) =>
        (0 until 3).forall(i => math.abs(u(i) - v(i)) < 1e-6)
      }
    }

  property("every strictly interior local point is inside; center always is") =
    forAll(box, Gen.choose(-0.45, 0.45), Gen.choose(-0.45, 0.45), Gen.choose(-0.45, 0.45)) {
      (a, u, v, w) =>
        val local = Array(u * a.scale(0), v * a.scale(1), w * a.scale(2))
        val world = Array.tabulate(3)(i =>
          a.rotation(i)(0) * local(0) + a.rotation(i)(1) * local(1) +
            a.rotation(i)(2) * local(2) + a.translation(i))
        a.inside(world) && a.inside(a.translation)
    }

  property("intersection volume never exceeds either volume") =
    forAll(boxPair) { case (a, b) =>
      val inter = Box3d.intersectionVolume(a, b)
      inter <= a.volume + 1e-9 && inter <= b.volume + 1e-9 && inter >= 0.0
    }
}
