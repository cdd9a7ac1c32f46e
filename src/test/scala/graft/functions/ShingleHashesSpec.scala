package graft.functions

import graft.queries.PipelineFns
import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** ShingleHashes must equal the composed built-in chain it replaces:
  * transform(array_distinct(shingles(tokens(text), n)), h60).
  */
class ShingleHashesSpec extends SparkSpec {

  private def builtinChain(text: org.apache.spark.sql.Column, n: Int) =
    transform(
      array_distinct(PipelineFns.shingles(PipelineFns.tokens(text), n)),
      x => PipelineFns.h60(x)
    )

  private val cases = Seq(
    "The quick brown fox jumps over the lazy dog",
    "a b c",
    "one-token",
    "x",
    "",
    "  punctuation!!! and   spaces\t\ttabs  ",
    "UPPER lower MiXeD 123 456",
    "répétition naïve café — unicode outside [a-z0-9] splits tokens",
    "dup dup dup dup dup dup",
    "a1b2 c3d4 e5f6 g7h8 i9j0 a1b2 c3d4 e5f6"
  )

  test("matches the built-in chain on edge-case texts for n=1,2,3") {
    val s = spark
    import s.implicits._
    for (n <- Seq(1, 2, 3)) {
      val df = cases.toDF("text").select(
        shingleHashes(col("text"), n).as("fused"),
        builtinChain(col("text"), n).as("builtin")
      )
      val rows = df.collect()
      rows.zip(cases).foreach { case (r, txt) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n text='$txt'")
      }
    }
  }

  test("matches the built-in chain on sf0.001 documents") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
      shingleHashes(col("text"), 3).as("fused"),
      builtinChain(col("text"), 3).as("builtin")
    )
    assert(df.filter(not(col("fused") === col("builtin"))).count() == 0)
    assert(df.count() > 0)
  }

  test("null text gives null") {
    val s = spark
    import s.implicits._
    val r = Seq(Option.empty[String]).toDF("text").select(shingleHashes(col("text"), 3)).collect()
    assert(r.head.isNullAt(0))
  }
}
