package graft.queries

import graft.vlm.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Real image decode through the batched multimodal stage. */
class MediaDecodeSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int, value: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, value)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("imageFeatures decodes real PNG payloads and skips undecodable bytes (mm3 real-codec variant)") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(4, 2, 100)),
      (2L, pngBytes(3, 3, 7)),
      (3L, "not an image".getBytes)
    ).toDF("doc_id", "payload")
    val feats = MultimodalQueries.imageFeatures(rows, batchSize = 2)
      .orderBy("doc_id").collect()
    assert(feats.length == 2) // undecodable payload dropped
    val f1 = feats(0)
    assert(f1.getAs[Int]("width") == 4 && f1.getAs[Int]("height") == 2)
    assert(f1.getAs[Int]("n_bands") == 1)
    assert(f1.getAs[Double]("mean_luma") == 100.0)
    assert(feats(1).getAs[Double]("mean_luma") == 7.0)
  }
}
