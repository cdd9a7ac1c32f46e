package graft.functions

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** [[BandKeys]] must be bit-exact with the built-in chain it fuses
  * (signature family → element_at slices → md5(concat_ws("_", …))) at BOTH
  * preset geometries, including the degenerate inputs whose semantics the
  * chain defines implicitly (null/empty shingle set → concat_ws skips null
  * slices → md5("") in every band; ≤8-slice family keeps MaxValue minima
  * for all-null elements).
  */
class BandKeysSpec extends SparkSpec {

  private def chainBands(sh: org.apache.spark.sql.Column,
      numMinhash: Int, numBands: Int): org.apache.spark.sql.Column = {
    val rpb = numMinhash / numBands
    val mh = if (numMinhash <= 8) graft.functions.minhash8(sh)
             else graft.functions.minhashN(sh, numMinhash)
    array((0 until numBands).map { b =>
      md5(concat_ws("_",
        (0 until rpb).map(r => element_at(mh, b * rpb + r + 1).cast("string")): _*))
    }: _*)
  }

  private def docsDF = {
    val s = spark
    import s.implicits._
    Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten eleven",
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      4L -> "short text here",
      5L -> "" // no tokens -> empty shingle set -> null signature
    ).toDF("doc_id", "text")
  }

  private def assertParity(numMinhash: Int, numBands: Int): Unit = {
    val sh = graft.functions.shingleHashes(col("text"), 3)
    val both = docsDF.select(col("doc_id"),
      graft.functions.bandKeys(sh, numMinhash, numBands).as("fused"),
      chainBands(sh, numMinhash, numBands).as("chain"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"geometry $numMinhash/$numBands diverged for doc ${r.getLong(0)}")
    }
  }

  test("parity with the built-in chain at the demo geometry (8 minhashes, 4 bands)") {
    assertParity(8, 4)
  }

  test("parity with the built-in chain at the capacity geometry (128 minhashes, 32 bands)") {
    assertParity(128, 32)
  }

  test("null / empty shingle sets band like the chain: md5 of the empty string") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq.empty[Long]), (2L, null.asInstanceOf[Seq[Long]]))
      .toDF("doc_id", "sh")
    val out = df.select(graft.functions.bandKeys(col("sh"), 8, 4).as("b")).collect()
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    out.foreach(r => assert(r.getSeq[String](0).forall(_ == emptyMd5)))
  }

  test("identical shingle sets collide in every band; distinct content does not collide in all bands") {
    val sh = graft.functions.shingleHashes(col("text"), 3)
    val bands = docsDF.select(col("doc_id"),
      graft.functions.bandKeys(sh, 8, 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bands(1L) == bands(3L), "byte-identical docs must share all bands")
    assert(bands(1L) != bands(2L), "distinct docs sharing all 4 bands is a fixture bug")
  }
}
