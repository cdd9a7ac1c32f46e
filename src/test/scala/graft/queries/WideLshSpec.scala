package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB-preset LSH geometry actually executes: wide signatures from
  * the fused MinHashN independent-slice family, rowsPerBand-generic band
  * keys, and the invariants that make widened geometry correct —
  * determinism, equal-set agreement on every slice, and the near-dup
  * candidate property surviving the widening.
  */
class WideLshSpec extends SparkSpec {
  import spark.implicits._

  private val wide = 16 // 2× the fused slice count → exercises the re-hash path
  private def sets(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").select(
      col("doc_id"), graft.functions.shingleHashes(col("text"), 3).as("sh"))

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "the quick brown fox jumps over the lazy dog near the river bend", // near-dup of 1
    3L -> "completely unrelated content discussing spark shuffle partitioning at scale")

  test("16-slice signatures: all columns populated, deterministic, identical for identical shingle sets") {
    val sig = DedupQueries.signaturesFor(sets(docs), wide)
    assert(sig.columns.toSeq === ("doc_id" +: (0 until wide).map(i => s"mh$i")))
    val rows = sig.orderBy("doc_id").collect()
    assert(rows.length === 3)
    // every slice in 32-bit range, no nulls
    for (r <- rows; j <- 1 to wide) {
      val v = r.getLong(j)
      assert(v >= 0L && v <= 0xffffffffL, s"slice $j out of range: $v")
    }
    // determinism across independent evaluations
    val again = DedupQueries.signaturesFor(sets(docs), wide).orderBy("doc_id").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // an exact-duplicate text yields the identical full signature
    val dup = DedupQueries.signaturesFor(sets(Seq(9L -> docs.head._2)), wide).collect().head
    assert(rows.head.toSeq.tail === dup.toSeq.tail)
  }

  test("8 bands × 2 rows over 16 slices: near-dups share bands, unrelated docs don't") {
    val sig = DedupQueries.signaturesFor(sets(docs), wide)
    val banded = sig.select(col("doc_id") +: DedupQueries.bandColsFor(8, 2): _*)
    val bands = banded.collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    // near-dup pair: most slices agree (11-of-12-shingle overlap) → at
    // least one of the 8 band keys collides
    assert(bands(1L).zip(bands(2L)).exists { case (a, b) => a == b })
    // unrelated doc: zero shared shingles → no band collision with either
    assert(!bands(1L).zip(bands(3L)).exists { case (a, b) => a == b })
    assert(!bands(2L).zip(bands(3L)).exists { case (a, b) => a == b })
  }
}
