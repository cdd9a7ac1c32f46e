package graft.functions

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** TopRunCount must equal the mode count a groupBy would compute. */
class TopRunCountSpec extends SparkSpec {

  test("mode count on hand-built arrays, empty and null handling") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Seq("a", "b", "a", "c", "a")), // a×3
      (2, Seq("x")),                     // 1
      (3, Seq.empty[String]),            // 0
      (4, Seq("t", "t", "t", "t")),      // 4
      (5, Seq("b", "a", "b", "a"))       // 2
    ).toDF("id", "arr")
      .select(col("id"), topRunCount(col("arr")).as("top"))
    assert(df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> 3L, 2 -> 1L, 3 -> 0L, 4 -> 4L, 5 -> 2L))
  }

  test("matches explode + groupBy mode count on seeded random token arrays") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(99)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val rows = (0 until 200).map(i => (i, Seq.fill(1 + rng.nextInt(40))(vocab(rng.nextInt(vocab.size)))))
    val df = rows.toDF("id", "arr").cache()
    val fused = df.select(col("id"), topRunCount(col("arr")).as("top"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viaGroup = df.select(col("id"), explode(col("arr")).as("t"))
      .groupBy("id", "t").count()
      .groupBy("id").agg(max("count").as("top"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fused == viaGroup)
  }
}
