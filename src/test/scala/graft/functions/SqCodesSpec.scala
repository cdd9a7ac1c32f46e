package graft.functions

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** PackU8/UnpackU8 — the SQ8 storage codec. The contract: a lossless
  * [0,255] round trip with UNSIGNED byte semantics (codes ≥ 128 are the
  * interesting half — a signed cast would flip them negative and corrupt
  * every asymmetric distance downstream), loud failure outside the range,
  * and whole-stage-codegen/interpreted parity.
  */
class SqCodesSpec extends SparkSpec {
  import spark.implicits._

  test("round trip is lossless over the full unsigned range") {
    val vecs = Seq(
      Seq(0L, 1L, 127L, 128L, 255L),
      (0L to 255L).toSeq,
      Seq(255L),
      Seq.empty[Long]
    )
    val df = vecs.toDF("codes")
    val got = df.select(unpackU8(packU8($"codes")).as("back"))
      .as[Seq[Long]].collect().toSeq
    assert(got === vecs)
    // binary length is exactly 1 byte per dim — the 8x claim's storage half
    val lens = df.select(length(packU8($"codes"))).as[Int].collect().toSeq
    assert(lens === vecs.map(_.size))
  }

  test("out-of-range codes fail loudly, not by truncation") {
    for (bad <- Seq(Seq(-1L), Seq(256L), Seq(0L, 300L, 5L))) {
      val e = intercept[Exception] {
        bad.toDF("codes").select(packU8($"codes")).collect()
      }
      assert(e.getMessage != null)
    }
  }

  test("codegen and interpreted evaluation agree") {
    val rnd = new scala.util.Random(13)
    val vecs = (1 to 50).map(_ => Seq.fill(64)(rnd.nextInt(256).toLong))
    val df = vecs.toDF("codes")
    val viaCodegen = df.select(unpackU8(packU8($"codes"))).as[Seq[Long]].collect().toSeq
    // force the interpreted path: eval through a collected local relation
    val packed = vecs.map(v => v.map(_.toByte).toArray)
    val viaEval = packed.map(bytes =>
      UnpackU8(org.apache.spark.sql.catalyst.expressions.Literal(bytes))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq)
    assert(viaCodegen === viaEval)
    assert(viaCodegen === vecs)
  }
}
