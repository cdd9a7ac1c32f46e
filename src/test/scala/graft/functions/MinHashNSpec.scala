package graft.functions

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** MinHashN: the fused wide-signature expression must equal the slice
  * formula computed independently, behave like MinHash8 on degenerate
  * input, and keep every intermediate below 2^62 (the no-wraparound
  * contract that lets DuckDB replay it in BIGINT SQL).
  */
class MinHashNSpec extends SparkSpec {
  import spark.implicits._

  private val P = MinHashN.P

  /** The slice formula, straight from the scaladoc, with no shared code. */
  private def reference(hashes: Seq[Long], slices: Int): Seq[Long] = {
    val (as, bs, cs) = MinHashN.coefficients(slices)
    (0 until slices).map { j =>
      hashes.map(h => (as(j) * (h & 0xFFFFFFFFL) + bs(j) * (h >>> 30) + cs(j)) % P).min
    }
  }

  private val fixtures: Seq[Seq[Long]] = Seq(
    Seq(0L),
    Seq(1L, 2L, 3L),
    Seq((1L << 60) - 1, 123456789L, 0x0FEDCBA987654321L & ((1L << 60) - 1)),
    (1 to 100).map(i => (i * 0x9E3779B97F4A7C15L) >>> 4)
  )

  test("matches the independent slice formula for 8, 16, and 128 slices") {
    for (slices <- Seq(8, 16, 128); hs <- fixtures) {
      val got = Seq(Tuple1(hs)).toDF("sh")
        .select(minhashN(col("sh"), slices).as("m"))
        .as[Seq[Long]].head()
      assert(got === reference(hs, slices), s"slices=$slices hs=${hs.take(5)}")
    }
  }

  test("empty array and all-null input yield null (the no-signature contract)") {
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("sh")
      .select(minhashN(col("sh"), 16)).collect().head
    assert(empty.isNullAt(0))
    // a non-empty array whose elements are ALL null must behave like empty
    // (null), not like a zero-shingle doc with a Long.MaxValue sentinel
    // signature that would band-collide with every other such doc
    val allNull = Seq(Tuple1(Seq[Option[Long]](None, None))).toDF("sh")
      .select(minhashN(col("sh"), 16)).collect().head
    assert(allNull.isNullAt(0), "all-null elements must yield null")
    // and a mixed array hashes only its non-null elements
    val mixed = Seq(Tuple1(Seq[Option[Long]](None, Some(7L), None))).toDF("sh")
      .select(minhashN(col("sh"), 16).as("m")).as[Seq[Long]].head()
    assert(mixed === reference(Seq(7L), 16))
  }

  test("coefficient bounds guarantee no signed-64 overflow") {
    val (as, bs, cs) = MinHashN.coefficients(4096)
    assert(as.forall(a => a >= 1 && a < (1L << 30)))
    assert(bs.forall(b => b >= 1 && b < (1L << 30)))
    assert(cs.forall(c => c >= 0 && c < (1L << 30)))
    // worst case: a·x1 + b·x2 + c with x1 < 2^32, x2 < 2^30
    val worst = ((1L << 30) - 1) * ((1L << 32) - 1) + ((1L << 30) - 1) * ((1L << 30) - 1) + ((1L << 30) - 1)
    assert(worst > 0 && worst < (1L << 63) - 1) // no wraparound happened computing it
  }

  test("sliceSql renders the identical formula (literal coefficients)") {
    val (as, bs, cs) = MinHashN.coefficients(16)
    val sql = MinHashN.sliceSql(16, 9)
    assert(sql === s"(${as(9)} * (h & 4294967295) + ${bs(9)} * (h >> 30) + ${cs(9)}) % $P")
  }
}
