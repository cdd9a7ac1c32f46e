package graft.queries

import graft.streaming.StreamingOps
import graft.vlm.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Incremental near-dup ingest: folding batches through
  * `DedupQueries.incrementalNearDup` must reproduce the one-shot keep-first
  * result (and therefore the streaming state-store semantics, which share
  * the same band math via `docBandRows`).
  */
class IncrementalDedupSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val docs = Seq(
    0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    1L -> "one two three four five six seven eight nine ten eleven twelve",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // dup of 0
    3L -> "red green blue yellow purple orange cyan magenta white black",
    4L -> "one two three four five six seven eight nine ten eleven twelve" // dup of 1
  )

  private def emptyStore = spark.createDataFrame(
    new java.util.ArrayList[Row](),
    StructType(Seq(
      StructField("band_idx", IntegerType),
      StructField("band", StringType),
      StructField("rep", LongType))))

  test("two-batch incremental fold equals the one-shot keep-first result") {
    val (kept1, store1) = DedupQueries.incrementalNearDup(docsDF(docs.take(2)), emptyStore)
    val (kept2, store2) = DedupQueries.incrementalNearDup(docsDF(docs.drop(2)), store1)
    val keptIds = (kept1.select("doc_id").collect() ++ kept2.select("doc_id").collect())
      .map(_.getLong(0)).toSet

    val (keptOne, _) = DedupQueries.incrementalNearDup(docsDF(docs), emptyStore)
    val oneShot = keptOne.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(keptIds == Set(0L, 1L, 3L))
    assert(oneShot == keptIds)

    // the final store holds the min doc_id per touched bucket either way
    val reps = store2.select("band_idx", "band", "rep").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = StreamingOps.nearDupBandRows(docsDF(docs))
      .collect().groupBy(r => (r.band_idx, r.band))
      .map { case (k, rs) => k -> rs.map(_.doc_id).min }
    assert(reps == expected)
  }

  test("a batch against a pre-claimed store drops every colliding doc") {
    val (_, store1) = DedupQueries.incrementalNearDup(docsDF(docs.take(2)), emptyStore)
    // replay the same two docs under new ids: all bands already claimed
    val replay = Seq(10L -> docs(0)._2, 11L -> docs(1)._2)
    val (kept, store2) = DedupQueries.incrementalNearDup(docsDF(replay), store1)
    assert(kept.count() == 0)
    // no new claims: the store is unchanged
    assert(store2.count() == store1.count())
  }
}
