package graft.queries

import graft.SparkEntry
import graft.vlm.SparkSpec

/** Semantic pin for m11_budget_select, independent of the DuckDB oracle:
  * a plain-Scala recompute of the quality ranking and tiered budgets,
  * asserting the kept set is exactly the per-source MAXIMAL prefix —
  * every kept doc fits the budget cumulatively, and the first unkept doc
  * in rank order would overflow it. The oracle hash pins the bytes; this
  * spec pins the meaning (so an oracle-and-engine-synchronized semantics
  * drift would still be caught).
  */
class BudgetSelectSpec extends SparkSpec {

  test("m11 keeps, per source, the maximal quality-ranked prefix under the tiered budget") {
    val sf = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("m11_budget_select")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet // (source, doc_id)

    // independent recompute in plain Scala: same tokenizer regex, same
    // integer-ppm quality, same tier rule, same floor arithmetic
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = "[a-z0-9]+".r.findAllIn(r.getString(2).toLowerCase).toSeq
        val nt = toks.size.toLong
        val qi = math.floor(toks.distinct.size.toDouble * 1000000 / nt).toLong
        (r.getLong(0), r.getString(1), nt, qi)
      }
    val perSource = docs.groupBy(_._2)
    val supply = perSource.view.mapValues(_.map(_._3).sum).toMap
    val tier = supply.keys.map(s => s -> (1L + s.drop(3).toLong % 3)).toMap
    val budget = math.floor(supply.values.sum.toDouble / 2)
    val totalTier = tier.values.sum
    val target = tier.map { case (s, t) =>
      s -> math.floor(budget * t / totalTier).toLong
    }

    for ((src, rows) <- perSource) {
      val ranked = rows.sortBy(r => (-r._4, r._1)) // quality desc, doc_id asc
      val cums = ranked.scanLeft(0L)(_ + _._3).tail
      val wantPrefix = ranked.zip(cums).takeWhile(_._2 <= target(src)).map(_._1._1)
      val got = ranked.map(_._1).filter(id => kept.contains((src, id)))
      assert(got.toSeq == wantPrefix.toSeq,
        s"$src: kept ${got.size} docs, expected the ${wantPrefix.size}-doc prefix")
      // maximality: the next-ranked doc (if any) would overflow the budget
      if (wantPrefix.size < ranked.size) {
        val overflow = cums(wantPrefix.size)
        assert(overflow > target(src),
          s"$src: prefix not maximal — next doc still fits ($overflow <= ${target(src)})")
      }
    }
    assert(kept.nonEmpty, "m11 kept nothing at sf0.001")
  }
}
