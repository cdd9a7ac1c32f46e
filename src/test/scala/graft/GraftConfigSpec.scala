package graft

import org.scalatest.funsuite.AnyFunSuite

/** Band/bucket math must hold under BOTH presets — the demo geometry the
  * catalog is oracle-checked at, and the 100 TB preset README "Capacity
  * math" derives. These are the properties that make the dedup/ANN plans
  * scale, checked as numbers rather than prose.
  */
class GraftConfigSpec extends AnyFunSuite {

  private val presets = Seq(
    "demo" -> GraftConfig.Demo,
    "100tb" -> GraftConfig.Preset100TB)

  test("signature splits evenly into bands; PQ geometry covers the dim exactly") {
    for ((name, c) <- presets) {
      assert(c.numBands * c.rowsPerBand === c.numMinhash, name)
      assert(c.pqSub * c.pqSubDim === c.dim, name)
    }
  }

  test("LSH S-curve: near-dups (J=0.8) are candidates, unrelated docs (J=0.25) mostly aren't") {
    for ((name, c) <- presets) {
      assert(c.candidateProb(0.8) >= 0.95,
        s"$name recall at J=0.8: ${c.candidateProb(0.8)}")
      assert(c.candidateProb(0.25) <= 0.25,
        s"$name false-candidate rate at J=0.25: ${c.candidateProb(0.25)}")
      // monotone in similarity (sanity on the formula itself)
      val probs = (1 to 9).map(i => c.candidateProb(i / 10.0))
      assert(probs === probs.sorted, name)
    }
  }

  test("hyperplane buckets fit a long and bound per-bucket occupancy at target scale") {
    for ((name, c) <- presets) {
      assert(c.numHyperplanes <= 60, name)
      assert(c.numBuckets === (1L << c.numHyperplanes), name)
    }
    // at the 1e10-vector design point, expected bucket occupancy stays
    // small enough that within-bucket pair verification is bounded work
    val occupancy100tb = 1e10 / GraftConfig.Preset100TB.numBuckets
    assert(occupancy100tb < 100.0, s"vectors per bucket: $occupancy100tb")
  }

  test("broadcast sides stay metadata-scale at the 100 TB preset") {
    // IVF centroid table must broadcast (README: ~51 MB at 1e5 cells)
    assert(GraftConfig.Preset100TB.centroidBroadcastBytes < 200L * 1024 * 1024,
      s"centroid broadcast: ${GraftConfig.Preset100TB.centroidBroadcastBytes} B")
    // CC fast-path ceiling bounds executor-local memory: ~16 B/edge ≈ 80 MB
    assert(GraftConfig.Preset100TB.localCcMaxEdges * 16 < 200L * 1024 * 1024)
  }

  test("the active preset follows GRAFT_PRESET (demo when unset)") {
    // oracle SQL generates from the active config, so active must track the
    // launch selection exactly — and the suite stays runnable at BOTH
    // geometries (GRAFT_PRESET=100tb sbt test is a supported sweep)
    sys.env.get("GRAFT_PRESET") match {
      case None | Some("demo") => assert(GraftConfig.active === GraftConfig.Demo)
      case Some("100tb")       => assert(GraftConfig.active === GraftConfig.Preset100TB)
      case Some(other)         => fail(s"unexpected GRAFT_PRESET=$other")
    }
  }

  test("invalid geometries are rejected at construction") {
    intercept[IllegalArgumentException](GraftConfig.Demo.copy(numMinhash = 7)) // 7 % 4 != 0
    intercept[IllegalArgumentException](GraftConfig.Demo.copy(pqSub = 3)) // 3×8 != 64
    intercept[IllegalArgumentException](GraftConfig.Demo.copy(numHyperplanes = 61))
  }
}
