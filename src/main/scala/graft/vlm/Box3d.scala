package graft.vlm

/** G21: the Objectron box-evaluation surface (oriented 3D boxes, exact IoU,
  * point-in-box, volume, 9-DoF `fit`, ground-plane detection) re-expressed
  * natively. Blueprint: the vendored eval library
  * `data_processing/objectron/dataset/box.py:41-287` and `iou.py:1-211`.
  *
  * The reference computes the intersection volume by Sutherland–Hodgman
  * clipping + `scipy.spatial.ConvexHull`. Neither is available on the JVM,
  * and a port would be the wrong shape anyway; this implementation computes
  * the SAME quantity by half-space intersection, which is simpler and more
  * robust for box∩box:
  *  - each box is 6 half-spaces `n·p ≤ d` (n = world-frame axis column of
  *    its rotation, d from its center/extent);
  *  - the intersection polytope's vertices are the triple-plane solutions
  *    that satisfy all (deduplicated) half-spaces;
  *  - its volume is the divergence-theorem surface sum `Σ d·area(face)/3`
  *    over the per-plane face polygons (vertices on each plane, ordered
  *    angularly) — no convex-hull code needed.
  * Plane deduplication makes coplanar-face cases (identical boxes, shared
  * faces) exact where naive clip-based boundary collection double-counts.
  *
  * A seeded Monte-Carlo estimator ([[iouSampling]]) mirrors the reference's
  * `iou_sampling` validation path and cross-checks the exact kernel in
  * Box3dSpec on rotated configurations.
  */
object Box3d {
  import Geo.{Mat3, Vec3}

  /** Objectron 9-keypoint layout: index 0 = center, 1–8 = corners in
    * (−−−, −−+, −+−, −++, +−−, +−+, ++−, +++) order (box.py:24-34). */
  val NumKeypoints = 9

  /** Edge quadruples per axis (1-based vertex ids, box.py:7-12). */
  val Edges: Array[(Int, Int)] = Array(
    (1, 5), (2, 6), (3, 7), (4, 8), // along x
    (1, 3), (5, 7), (2, 4), (6, 8), // along y
    (1, 2), (3, 4), (5, 6), (7, 8)) // along z

  /** Face vertex quadruples, normals pointing inward (box.py:15-22). */
  val Faces: Array[Array[Int]] = Array(
    Array(5, 6, 8, 7), Array(1, 3, 4, 2), // ±x
    Array(3, 7, 8, 4), Array(1, 2, 6, 5), // ±y
    Array(2, 4, 8, 6), Array(1, 5, 7, 3)) // ±z

  private def dot(a: Vec3, b: Vec3): Double = a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def sub(a: Vec3, b: Vec3): Vec3 = Array(a(0) - b(0), a(1) - b(1), a(2) - b(2))
  private def cross(a: Vec3, b: Vec3): Vec3 = Array(
    a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  private def norm(a: Vec3): Double = math.sqrt(dot(a, a))

  /** Axis-aligned 9-keypoint vertices for a scale vector (box.py:96-109). */
  def scaledAxisAlignedVertices(s: Vec3): Array[Vec3] = {
    val (w, h, d) = (s(0) / 2, s(1) / 2, s(2) / 2)
    Array(
      Array(0.0, 0.0, 0.0),
      Array(-w, -h, -d), Array(-w, -h, d), Array(-w, h, -d), Array(-w, h, d),
      Array(w, -h, -d), Array(w, -h, d), Array(w, h, -d), Array(w, h, d))
  }

  /** Oriented box: rotation (world-from-local), translation, full extents. */
  final case class Box(rotation: Mat3, translation: Vec3, scale: Vec3) {

    /** 9 world-frame keypoints (center + 8 corners). */
    lazy val vertices: Array[Vec3] = scaledAxisAlignedVertices(scale).map { v =>
      Array(
        rotation(0)(0) * v(0) + rotation(0)(1) * v(1) + rotation(0)(2) * v(2) + translation(0),
        rotation(1)(0) * v(0) + rotation(1)(1) * v(1) + rotation(1)(2) * v(2) + translation(1),
        rotation(2)(0) * v(0) + rotation(2)(1) * v(1) + rotation(2)(2) * v(2) + translation(2))
    }

    /** Parallelepiped volume via the edge-vector determinant (box.py:207-224). */
    lazy val volume: Double = {
      val i = sub(vertices(2), vertices(1))
      val j = sub(vertices(3), vertices(1))
      val k = sub(vertices(5), vertices(1))
      math.abs(dot(i, cross(j, k)))
    }

    /** Point-in-box: into the local frame, then per-axis extent check
      * (box.py:158-176). */
    def inside(p: Vec3): Boolean = {
      val rel = sub(p, translation)
      var axis = 0
      while (axis < 3) {
        val local = rotation(0)(axis) * rel(0) + rotation(1)(axis) * rel(1) + rotation(2)(axis) * rel(2)
        if (math.abs(local) > scale(axis) / 2) return false
        axis += 1
      }
      true
    }

    /** World-frame axis direction (column of the rotation). */
    private[Box3d] def axis(i: Int): Vec3 =
      Array(rotation(0)(i), rotation(1)(i), rotation(2)(i))

    /** Ground plane under the box (box.py:236-287): among the three
      * positive-side faces, pick the one whose normal is most
      * gravity-aligned, then of it and its parallel partner return the
      * lower (along the gravity axis) face's (center, normal).
      *
      * Fidelity note: the reference compares |gravity × n| on UNNORMALIZED
      * face normals (and seeds the best-error at 10.0), so face area biases
      * the selection for strongly non-cubic boxes. This implementation
      * reproduces that behavior bug-for-bug — matching the reference's
      * outputs is the contract; normalize `n` before comparing if you want
      * the doc-string semantics instead.
      */
    def groundPlane(gravityAxis: Int = 1): (Vec3, Vec3) = {
      val gravity = Array(0.0, 0.0, 0.0); gravity(gravityAxis) = 1.0
      def faceCenter(face: Array[Int]): Vec3 = {
        val c = Array(0.0, 0.0, 0.0)
        face.foreach { vi => val v = vertices(vi); c(0) += v(0); c(1) += v(1); c(2) += v(2) }
        c.map(_ / face.length)
      }
      def faceNormal(face: Array[Int], center: Vec3): Vec3 =
        cross(sub(vertices(face(0)), center), sub(vertices(face(1)), center))
      var bestId = 0
      var bestErr = 10.0
      Seq(0, 2, 4).foreach { i =>
        val c = faceCenter(Faces(i))
        val n = faceNormal(Faces(i), c)
        val err = norm(cross(gravity, n))
        if (err < bestErr) { bestErr = err; bestId = i }
      }
      val c1 = faceCenter(Faces(bestId))
      val n1 = faceNormal(Faces(bestId), c1)
      val c2 = faceCenter(Faces(bestId + 1))
      val n2 = faceNormal(Faces(bestId + 1), c2)
      if (c2(gravityAxis) < c1(gravityAxis)) (c2, n2) else (c1, n1)
    }
  }

  object Box {
    def fromCenterDimsEuler(
        cx: Double, cy: Double, cz: Double,
        xl: Double, yl: Double, zl: Double,
        pitch: Double, yaw: Double, roll: Double): Box =
      Box(Geo.rotationMatrix(pitch, yaw, roll), Array(cx, cy, cz), Array(xl, yl, zl))

    /** 9-DoF recovery from 9 keypoints (box.py:123-156): scale from the
      * per-axis edge-length averages, then orientation + translation from
      * the least-squares alignment of the scaled axis-aligned template —
      * solved via the 4×4 normal equations (the reference calls
      * `np.linalg.lstsq` on the same 9×4 system).
      */
    def fromVertices(v: Array[Vec3]): Box = {
      require(v.length == NumKeypoints, s"expected $NumKeypoints keypoints, got ${v.length}")
      val scale = Array(0.0, 0.0, 0.0)
      for (axis <- 0 until 3; e <- 0 until 4) {
        val (b, en) = Edges(axis * 4 + e)
        scale(axis) += norm(sub(v(b), v(en)))
      }
      (0 until 3).foreach(i => scale(i) /= 4)
      val template = scaledAxisAlignedVertices(scale)
      // Normal equations for [template | 1] x = v: M = AᵀA (4×4), rhs = Aᵀv (4×3)
      val m = Array.ofDim[Double](4, 4)
      val rhs = Array.ofDim[Double](4, 3)
      template.zip(v).foreach { case (a3, b3) =>
        val a = Array(a3(0), a3(1), a3(2), 1.0)
        for (i <- 0 until 4) {
          for (j <- 0 until 4) m(i)(j) += a(i) * a(j)
          for (j <- 0 until 3) rhs(i)(j) += a(i) * b3(j)
        }
      }
      // Gaussian elimination with partial pivoting on [M | rhs]
      for (colI <- 0 until 4) {
        val piv = (colI until 4).maxBy(r => math.abs(m(r)(colI)))
        if (piv != colI) { val t = m(piv); m(piv) = m(colI); m(colI) = t
          val tr = rhs(piv); rhs(piv) = rhs(colI); rhs(colI) = tr }
        require(math.abs(m(colI)(colI)) > 1e-12, "degenerate keypoint system")
        for (r <- 0 until 4 if r != colI) {
          val f = m(r)(colI) / m(colI)(colI)
          for (j <- 0 until 4) m(r)(j) -= f * m(colI)(j)
          for (j <- 0 until 3) rhs(r)(j) -= f * rhs(colI)(j)
        }
      }
      val x = Array.tabulate(4, 3)((i, j) => rhs(i)(j) / m(i)(i))
      val rotation = Array.tabulate(3, 3)((i, j) => x(j)(i)) // solutionᵀ
      Box(rotation, Array(x(3)(0), x(3)(1), x(3)(2)), scale)
    }
  }

  /** One box as 6 half-spaces n·p ≤ d with unit outward normals. */
  private def halfSpaces(b: Box): Array[(Vec3, Double)] =
    (0 until 3).flatMap { i =>
      val n = b.axis(i)
      val proj = dot(n, b.translation)
      val h = b.scale(i) / 2
      Seq((n, proj + h), (n.map(-_), -proj + h))
    }.toArray

  /** Exact IoU of two oriented boxes (iou.py:22-33 semantics). */
  def iou(a: Box, b: Box): Double = {
    val inter = intersectionVolume(a, b)
    val union = a.volume + b.volume - inter
    if (union <= 0) 0.0 else inter / union
  }

  /** Conservative world-AABB disjointness test: each box's world-frame
    * axis-aligned extent is |R·diag(s/2)| summed per row. Disjoint AABBs ⇒
    * disjoint boxes ⇒ zero intersection — the O(1) reject that skips the
    * half-space machinery for the (at pair-join scale, dominant) majority
    * of non-overlapping pairs.
    */
  private def aabbDisjoint(a: Box, b: Box): Boolean = {
    var axis = 0
    while (axis < 3) {
      val ra = math.abs(a.rotation(axis)(0)) * a.scale(0) / 2 +
        math.abs(a.rotation(axis)(1)) * a.scale(1) / 2 +
        math.abs(a.rotation(axis)(2)) * a.scale(2) / 2
      val rb = math.abs(b.rotation(axis)(0)) * b.scale(0) / 2 +
        math.abs(b.rotation(axis)(1)) * b.scale(1) / 2 +
        math.abs(b.rotation(axis)(2)) * b.scale(2) / 2
      if (math.abs(a.translation(axis) - b.translation(axis)) > ra + rb) return true
      axis += 1
    }
    false
  }

  /** Exact intersection volume by half-space intersection. */
  def intersectionVolume(a: Box, b: Box): Double = {
    if (aabbDisjoint(a, b)) return 0.0
    val all = halfSpaces(a) ++ halfSpaces(b)
    // Geometric tolerance scales with box EXTENT (the size of the polytope
    // being assembled) plus a small |d|-relative term absorbing the
    // precision loss of n·p for boxes far from the origin — never with |d|
    // alone, which would collapse sub-extent intersections of translated
    // boxes to a point.
    val maxExtent = (a.scale ++ b.scale).max
    val maxAbsD = all.map { case (_, d) => math.abs(d) }.max
    val tol = 1e-9 * (1.0 + maxExtent) + 1e-12 * maxAbsD
    // drop duplicate oriented planes (identical/shared faces)
    val planes = all.foldLeft(Vector.empty[(Vec3, Double)]) { case (acc, (n, d)) =>
      if (acc.exists { case (n2, d2) => dot(n, n2) > 1.0 - 1e-9 && math.abs(d - d2) <= tol }) acc
      else acc :+ ((n, d))
    }
    // candidate vertices: triple-plane solutions inside every half-space
    val pts = scala.collection.mutable.ArrayBuffer.empty[Vec3]
    val np = planes.length
    for (i <- 0 until np; j <- i + 1 until np; k <- j + 1 until np) {
      val (n1, d1) = planes(i); val (n2, d2) = planes(j); val (n3, d3) = planes(k)
      val det = dot(n1, cross(n2, n3))
      if (math.abs(det) > 1e-12) {
        val p = Array(0.0, 0.0, 0.0)
        val c1 = cross(n2, n3); val c2 = cross(n3, n1); val c3 = cross(n1, n2)
        var t = 0
        while (t < 3) { p(t) = (d1 * c1(t) + d2 * c2(t) + d3 * c3(t)) / det; t += 1 }
        if (planes.forall { case (n, d) => dot(n, p) <= d + tol } &&
            !pts.exists(q => norm(sub(q, p)) <= tol)) pts += p
      }
    }
    if (pts.length < 4) return 0.0
    // divergence theorem: V = Σ_faces d · area(face) / 3 (unit outward n)
    var vol = 0.0
    planes.foreach { case (n, d) =>
      val face = pts.filter(p => math.abs(dot(n, p) - d) <= tol).toArray
      if (face.length >= 3) {
        val c = Array(0.0, 0.0, 0.0)
        face.foreach { p => c(0) += p(0); c(1) += p(1); c(2) += p(2) }
        (0 until 3).foreach(i => c(i) /= face.length)
        // angular order in the plane's 2D basis
        val ref = if (math.abs(n(0)) < 0.9) Array(1.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0)
        val u0 = cross(n, ref); val u = u0.map(_ / norm(u0))
        val v = cross(n, u)
        val ordered = face.sortBy { p =>
          val r = sub(p, c); math.atan2(dot(v, r), dot(u, r))
        }
        var area2 = Array(0.0, 0.0, 0.0)
        for (i <- ordered.indices) {
          val p1 = sub(ordered(i), c)
          val p2 = sub(ordered((i + 1) % ordered.length), c)
          val cr = cross(p1, p2)
          area2 = Array(area2(0) + cr(0), area2(1) + cr(1), area2(2) + cr(2))
        }
        vol += d * norm(area2) / 2 / 3
      }
    }
    math.max(vol, 0.0)
  }

  /** Seeded Monte-Carlo IoU estimate (iou.py:36-70): n uniform samples in
    * each box, membership-tested against the other, volume-ratio corrected.
    * Deterministic for a given seed — the validation harness for the exact
    * kernel, and the reference's own cross-check.
    */
  def iouSampling(a: Box, b: Box, numSamples: Int = 10000, seed: Long = 42L): Double = {
    val rng = new scala.util.Random(seed)
    def sample(box: Box): Vec3 = {
      val local = Array.fill(3)(rng.nextDouble() - 0.5).zip(box.scale).map { case (r, s) => r * s }
      Array(
        box.rotation(0)(0) * local(0) + box.rotation(0)(1) * local(1) + box.rotation(0)(2) * local(2) + box.translation(0),
        box.rotation(1)(0) * local(0) + box.rotation(1)(1) * local(1) + box.rotation(1)(2) * local(2) + box.translation(1),
        box.rotation(2)(0) * local(0) + box.rotation(2)(1) * local(1) + box.rotation(2)(2) * local(2) + box.translation(2))
    }
    val inB = (0 until numSamples).count(_ => b.inside(sample(a)))
    val inA = (0 until numSamples).count(_ => a.inside(sample(b)))
    val interEst = (a.volume * inB + b.volume * inA) / 2.0
    val unionEst = (a.volume + b.volume) * numSamples - interEst
    if (unionEst <= 0) 0.0 else interEst / unionEst
  }
}
