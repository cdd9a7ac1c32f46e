package graft.queries

import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._
  import BpeTokenizer._

  test("mergeAll merges left-to-right without overlap") {
    assert(mergeAll(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
    assert(mergeAll(Vector("a", "b", "a", "b"), "a", "b") === Vector("ab", "ab"))
    assert(mergeAll(Vector("x"), "a", "b") === Vector("x"))
  }

  test("encode applies merges by rank; uncovered chars stay single") {
    val ranks = ranksOf(Seq(("a", "b"), ("b", "c")))
    assert(encode("abc", ranks) === Vector("ab", "c"))
    assert(encode("bc", ranks) === Vector("bc"))
    assert(encode("xyz", ranks) === Vector("x", "y", "z"))
    assert(encode("", ranks) === Vector.empty)
  }

  test("learn reproduces the classic Sennrich example, tie-broken lexically") {
    // vocab {low:5, lower:2, newest:6, widest:3}:
    //   round 1: (e,s) and (s,t) tie at 9 -> (e,s) by pair order
    //   round 2: (es,t) at 9
    //   round 3: (l,o) and (o,w) tie at 7 -> (l,o)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    val merges = learn(words, 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val ranks = ranksOf(merges)
    assert(encode("newest", ranks) === Vector("n", "e", "w", "est"))
    assert(encode("lowest", ranks) === Vector("lo", "w", "est"))
  }

  test("learn stops early when no pair repeats") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "n")
    assert(learn(words, 5) === Seq.empty)
  }

  test("pieceCounts: vocabulary-cached encoding, counts add up per doc") {
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest"),
      (3L, "")
    ).toDF("doc_id", "text")
    val ranks = ranksOf(Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val got = pieceCounts(docs, ranks)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: low->(lo,w)=2, low->2, lower->(lo,w,e,r)=4 => 3 words, 8 pieces
    // doc 2: newest->(n,e,w,est)=4, widest->(w,i,d,est)=4 => 2 words, 8 pieces
    // doc 3: no words -> no row (explode drops empties)
    assert(got === Seq((1L, 3L, 8L), (2L, 2L, 8L)))
  }

  test("PinnedMerges is exactly learn(wordCounts(sf0.01), 8) — frozen table can't drift") {
    // the t16a catalog query encodes under PinnedMerges and its DuckDB
    // oracle replays the same table; this is the one assertion tying the
    // frozen literals back to the trainer over the corpus they came from
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    assert(learn(wordCounts(docs), 8) === PinnedMerges)
  }

  test("encodeOracleSql rejects an empty merge list") {
    intercept[IllegalArgumentException](encodeOracleSql(Seq.empty))
  }

  test("learn survives 256 merges: checkpointing bounds plan depth") {
    // 256 distinct two-char words over a 16-letter alphabet, each with
    // count 2: every word contributes exactly one mergeable pair, so learn
    // performs 256 rounds — 4× the CheckpointEvery interval — and the
    // argmax order is fully tie-broken (all counts equal) to lexicographic
    val abc = "abcdefghijklmnop"
    val words = (for (a <- abc; b <- abc) yield (s"$a$b", 2L)).toSeq.toDF("word", "n")
    val merges = learn(words, 256)
    val expected = (for (a <- abc; b <- abc) yield (a.toString, b.toString)).toSeq.sorted
    assert(merges === expected)
  }

  test("end-to-end on testdata: learned merges compress the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = learn(wordCounts(docs), 8)
    assert(merges.size === 8)
    val pc = pieceCounts(docs, ranksOf(merges))
      .agg(sum($"n_pieces").as("p"), sum($"n_words").as("w"))
      .as[(Long, Long)].head()
    val chars = docs.select(
      sum(size(PipelineFns.tokens($"text"))).as("w"),
      sum(aggregate(PipelineFns.tokens($"text"), lit(0), (a, t) => a + length(t))).as("c"))
      .as[(Long, Long)].head()
    // pieces strictly fewer than characters (merges fired), at least one
    // piece per word
    assert(pc._1 < chars._2, s"pieces ${pc._1} vs chars ${chars._2}")
    assert(pc._1 >= pc._2)
  }
}
