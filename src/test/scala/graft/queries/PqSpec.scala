package graft.queries

import graft.SparkEntry
import graft.vlm.SparkSpec

/** Invariants of the product-quantization queries over real testdata. */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("v8: codebook vectors self-quantize — zero error, identity nibbles") {
    val rows = SparkEntry.queries("v8_pq_codes")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 16)
    rows.foreach { case (id, code, err) =>
      assert(err == 0L, s"vec $id: codeword must have zero quantization error, got $err")
      // nearest codeword of codeword k is k in every subspace: the packed
      // code is k replicated across all 8 nibbles
      assert(code == id * 0x11111111L,
        s"vec $id: expected identity nibbles, got ${code.toHexString}")
    }
  }

  test("v8: every packed code is 8 nibbles in [0, 16) and error is non-negative") {
    val rows = SparkEntry.queries("v8_pq_codes")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val code = r.getLong(1); val err = r.getLong(2)
      assert(code >= 0 && code < (1L << 32), s"code out of 8-nibble range: $code")
      assert(err >= 0, s"negative quantization error: $err")
    }
  }

  test("v9: per-query top-3 is contiguous, distinct, self-excluded, with adist ascending and non-negative") {
    val rows = SparkEntry.queries("v9_pq_adc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, ns) =>
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"query $q: ranks not contiguous")
      assert(sorted.map(_._3).distinct.length == sorted.length, s"query $q: duplicate neighbors")
      assert(!sorted.exists(_._3 == q), s"query $q: self in neighbor list")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq, s"query $q: adist not ascending with rank")
      sorted.foreach { case (_, _, _, d) => assert(d >= 0) }
    }
  }
}
